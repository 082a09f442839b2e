"""Pallas fused matvec (v2: on-the-fly coefficients, padded-state
layouts) vs the XLA reference implementation.  Runs in interpret mode on
the CPU test mesh; the real-TPU path is exercised by bench/verify runs."""

import jax.numpy as jnp
import numpy as np
import pytest

from opticalflow_tpu.core.synth import make_translating_blob_movie
from opticalflow_tpu.ops import elop
from opticalflow_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)


def _pair(m, n, dy_mode="compat", seed=1):
    movie, _ = make_translating_blob_movie(
        n_frames=2, dimension=max(m, n) + 2, width=10.0, sigma=3.0, v_x=0.2, v_y=0.1,
        dtype=jnp.float32,
    )
    movie = jnp.asarray(np.asarray(movie)[:, : m + 2, : n + 2] * 100.0, jnp.float32)
    pair = elop.compute_frame_pair_data(movie[0], movie[1], 800.0, 900.0, dy_mode)
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((3, m, n)), jnp.float32)
    return movie, pair, u


@pytest.mark.parametrize("shape", [(30, 40), (128, 254), (254, 254)])
@pytest.mark.parametrize("dy_mode", ["compat", "fixed"])
def test_pallas_matvec_matches_xla(shape, dy_mode):
    m, n = shape
    movie, pair, u = _pair(m, n, dy_mode)
    y_ref = elop.el_matvec_reduced(pair.coeffs, u)
    y_pl = pk.el_matvec_reduced_pallas(movie[0], 800.0, 900.0, u, dy_mode)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-6, atol=1e-2)


def test_padded_layout_invariants():
    """R-layout outputs keep exact zeros in the padding, and the P/R
    round-trips are exact, so padded-state Krylov dot products are
    mask-free."""
    m, n = 100, 70
    movie, pair, u = _pair(m, n)
    ops = pk.make_padded_ops(movie[0], 800.0, 900.0, "compat")
    u_p = ops.extend_pad(u)
    # extension correctness: slice back recovers u exactly
    np.testing.assert_array_equal(np.asarray(ops.slice_solution(u_p)), np.asarray(u))
    y_r = ops.matvec(u_p)
    y_np = np.asarray(y_r)
    assert y_np.shape[1] % pk.BM == 0 and y_np.shape[2] % 128 == 0
    # padding region exactly zero
    assert (y_np[:, m:, :] == 0).all()
    assert (y_np[:, :, n:] == 0).all()
    # rhs padding round trip
    b = jnp.asarray(np.random.default_rng(0).standard_normal((3, m, n)), jnp.float32)
    b_r = ops.pad_rhs(b)
    np.testing.assert_array_equal(np.asarray(ops.slice_residual(b_r)), np.asarray(b))
    assert (np.asarray(b_r)[:, m:, :] == 0).all()


@pytest.mark.parametrize("shape", [(30, 40), (128, 254), (254, 254)])
@pytest.mark.parametrize("factory_name", ["make_aligned_ops", "make_hybrid_ops"])
def test_container_ops_match_xla(shape, factory_name):
    """v4 (in-kernel mirror fold) and v5 (plain kernel + XLA ring) container
    operator sets must both reproduce el_matvec_reduced exactly, including
    the boundary ring, and keep the container zero-padding invariant."""
    m, n = shape
    movie, pair, u = _pair(m, n)
    ops = getattr(pk, factory_name)(movie[0], 800.0, 900.0, "compat")
    y_c = ops.matvec(ops.pad_field(u))
    y = ops.slice_field(y_c)
    y_ref = elop.el_matvec_reduced(pair.coeffs, u)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-2)
    y_np = np.asarray(y_c)
    assert (y_np[:, m:, :] == 0).all()
    assert (y_np[:, :, n:] == 0).all()


def test_hybrid_ops_under_vmap():
    """The v5 hybrid matvec (custom_vmap kernel + vmapped XLA ring) must
    match per-pair XLA results under a frame-pair batch axis."""
    import jax

    m = n = 62
    movie, _ = make_translating_blob_movie(
        n_frames=4, dimension=m + 2, width=10.0, sigma=3.0, v_x=0.2, v_y=0.1,
        dtype=jnp.float32,
    )
    movie = jnp.asarray(np.asarray(movie) * 100.0, jnp.float32)
    rng = np.random.default_rng(7)
    us = jnp.asarray(rng.standard_normal((3, 3, m, n)), jnp.float32)

    def hybrid_one(prev, u):
        ops = pk.make_hybrid_ops(prev, 800.0, 900.0, "compat")
        return ops.slice_field(ops.matvec(ops.pad_field(u)))

    def xla_one(prev, cur, u):
        pair = elop.compute_frame_pair_data(prev, cur, 800.0, 900.0, "compat")
        return elop.el_matvec_reduced(pair.coeffs, u)

    y_h = jax.vmap(hybrid_one)(movie[:-1], us)
    y_ref = jax.vmap(xla_one)(movie[:-1], movie[1:], us)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_ref), rtol=1e-6, atol=1e-2)


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

    def pallas_one(prev, u):
        return pk.el_matvec_reduced_pallas(prev, 800.0, 900.0, u, "compat")

    def xla_one(prev, cur, u):
        pair = elop.compute_frame_pair_data(prev, cur, 800.0, 900.0, "compat")
        return elop.el_matvec_reduced(pair.coeffs, u)

    y_pl = jax.vmap(pallas_one)(movie[:-1], us)
    y_ref = jax.vmap(xla_one)(movie[:-1], movie[1:], us)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), rtol=1e-6, atol=1e-2)
