"""Pallas fused matvec vs the XLA reference implementation (interpret mode
on the CPU test mesh; the real-TPU path is exercised by bench/verify runs,
where it measured bit-exact)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from opticalflow_tpu.core.synth import make_translating_blob_movie
from opticalflow_tpu.ops import elop
from opticalflow_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)


@pytest.mark.parametrize("shape", [(30, 40), (128, 254), (254, 254)])
def test_pallas_matvec_matches_xla(shape):
    m, n = shape
    movie, _ = make_translating_blob_movie(
        n_frames=2, dimension=max(m, n) + 2, width=10.0, sigma=3.0, v_x=0.2, v_y=0.1,
        dtype=jnp.float32,
    )
    movie = jnp.asarray(np.asarray(movie)[:, : m + 2, : n + 2] * 100.0, jnp.float32)
    pair = elop.compute_frame_pair_data(movie[0], movie[1], 800.0, 900.0, "compat")
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((3, m, n)), jnp.float32)

    y_ref = elop.el_matvec_reduced(pair.coeffs, u)
    y_pl = pk.make_pallas_matvec(pair.coeffs, m, n)(u)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-6, atol=1e-2)


def test_pallas_matvec_under_vmap():
    """The custom_vmap rule must route a batched call onto the kernel's
    native batch grid axis and match per-pair XLA results."""
    import jax

    m = n = 62
    movie, _ = make_translating_blob_movie(
        n_frames=4, dimension=m + 2, width=10.0, sigma=3.0, v_x=0.2, v_y=0.1,
        dtype=jnp.float32,
    )
    movie = jnp.asarray(np.asarray(movie) * 100.0, jnp.float32)
    rng = np.random.default_rng(7)
    us = jnp.asarray(rng.standard_normal((3, 3, m, n)), jnp.float32)

    def pallas_one(prev, cur, u):
        pair = elop.compute_frame_pair_data(prev, cur, 800.0, 900.0, "compat")
        return pk.el_matvec_reduced_pallas(pair.coeffs, u)

    def xla_one(prev, cur, u):
        pair = elop.compute_frame_pair_data(prev, cur, 800.0, 900.0, "compat")
        return elop.el_matvec_reduced(pair.coeffs, u)

    y_pl = jax.vmap(pallas_one)(movie[:-1], movie[1:], us)
    y_ref = jax.vmap(xla_one)(movie[:-1], movie[1:], us)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-6, atol=1e-2)
