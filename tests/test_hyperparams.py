"""Hyperparameter sweeps: the vmapped/traced batched paths must match the
static per-value implementations exactly."""

import jax.numpy as jnp
import numpy as np

from opticalflow_tpu.analysis import hyperparams
from opticalflow_tpu.core.synth import make_translating_blob_movie
from opticalflow_tpu.flow.boxflow import conduct_optical_flow
from opticalflow_tpu.ops.blur import blur_movie
from opticalflow_tpu.ops.boxsum import box_sum, box_sum_dynamic


def _movie(n_frames=6, dim=48):
    movie, delta_x = make_translating_blob_movie(
        n_frames=n_frames, dimension=dim, width=10.0, sigma=2.0, v_x=0.2, v_y=0.1,
        dtype=jnp.float32,
    )
    return np.asarray(movie) * 100.0, delta_x


def test_box_sum_dynamic_matches_static():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 33, 47)), jnp.float32)
    for box in (3, 7, 15):
        ref = box_sum(x, box)
        dyn = box_sum_dynamic(x, box // 2, 9)
        np.testing.assert_allclose(np.asarray(dyn), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_boxsize_sweep_matches_serial_flow():
    movie, _ = _movie()
    delta_x, delta_t = 0.1, 0.5
    boxsizes = np.array([5, 9, 15])
    out = hyperparams.vary_boxsize(
        movie, boxsizes=boxsizes, frame_index=2, delta_x=delta_x, delta_t=delta_t,
        smoothing_sigma=1.3,
    )
    for k, box in enumerate(boxsizes):
        ref = conduct_optical_flow(
            movie[2:4], boxsize=int(box), delta_x=delta_x, delta_t=delta_t,
            smoothing_sigma=1.3,
        )
        np.testing.assert_allclose(
            out["mean_speeds"][k], float(np.mean(ref["speed"])), rtol=2e-4
        )
        np.testing.assert_allclose(
            out["speed_stds"][k], float(np.std(ref["speed"])), rtol=2e-3
        )


def test_blursize_sweep_matches_serial_flow():
    movie, _ = _movie()
    delta_x, delta_t = 0.1, 0.5
    blur_sizes = np.array([0.8, 1.3, 2.5])
    out = hyperparams.vary_blursize(
        movie, blur_sizes=blur_sizes, boxsize=9, frame_index=2,
        delta_x=delta_x, delta_t=delta_t,
    )
    for k, sigma in enumerate(blur_sizes):
        ref = conduct_optical_flow(
            movie[2:4], boxsize=9, delta_x=delta_x, delta_t=delta_t,
            smoothing_sigma=float(sigma),
        )
        np.testing.assert_allclose(
            out["mean_speeds"][k], float(np.mean(ref["speed"])), rtol=2e-4
        )


def test_traced_gaussian_matches_blur_movie():
    movie, _ = _movie(n_frames=2, dim=40)
    movie = jnp.asarray(movie, jnp.float32)
    for sigma in (0.7, 1.9, 3.2):
        max_radius = int(4.0 * 3.2 + 0.5)
        got = hyperparams._gaussian_blur_traced(movie, jnp.float32(sigma), max_radius)
        ref = blur_movie(movie, smoothing_sigma=sigma)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3)
