import numpy as np
import pytest

from opticalflow_tpu.core import stencils
from tests.oracles import derivative_oracle, mirror_edges_oracle

RULES = ["dx", "dy", "dxy", "dyx", "dxx", "dyy", "bar_x", "bar_y", "bar"]


@pytest.fixture
def field():
    rng = np.random.default_rng(0)
    return rng.standard_normal((17, 23))


@pytest.mark.parametrize("rule", RULES)
def test_interior_derivative_matches_oracle(field, rule):
    got = np.asarray(stencils.interior_derivative(field, rule))
    want = derivative_oracle(field, rule)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_dy_compat_reproduces_reference_defect(field):
    got = np.asarray(stencils.ddy(field, mode=stencils.DY_COMPAT))
    want = derivative_oracle(field, "dy", compat_dy=True)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    # and it really is the x-derivative
    np.testing.assert_allclose(got, np.asarray(stencils.ddx(field)), rtol=0, atol=0)


def test_mirror_edges(field):
    got = np.asarray(stencils.mirror_edges(field))
    want = mirror_edges_oracle(field)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_mirror_edges_movie(field):
    movie = np.stack([field, field * 2.0])
    got = np.asarray(stencils.mirror_edges_movie(movie))
    for k in range(2):
        np.testing.assert_allclose(got[k], mirror_edges_oracle(movie[k]), rtol=0, atol=0)
