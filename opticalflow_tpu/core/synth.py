"""Synthetic ("fake") test-data generation.

Vectorized TPU-native equivalent of the reference's numba generator
``make_fake_data_frame`` (/root/reference/source/optical_flow.py:376-423):
a Gaussian hat exp(-((x-x0)^2 + (y-y0)^2)/sigma^2) sampled on a square
grid, optionally with tiny uniform noise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_fake_data_frame(
    x_position: float,
    y_position: float,
    sigma: float = 1.0,
    width: float = 20.0,
    include_noise: bool = False,
    dimension: int = 1000,
    key: Optional[jax.Array] = None,
    dtype=jnp.float64,
) -> Tuple[jnp.ndarray, float]:
    """Draw a Gaussian hat centred at (x_position, y_position).

    Returns ``(frame, delta_x)`` where ``delta_x`` is the pixel size in the
    same units as the positions, exactly like the reference helper.
    """
    coords = jnp.linspace(0.0, width, dimension, dtype=dtype)
    dx2 = (coords[:, None] - x_position) ** 2
    dy2 = (coords[None, :] - y_position) ** 2
    frame = jnp.exp(-(dx2 + dy2) / sigma**2)
    delta_x = float(width / (dimension - 1))
    if include_noise:
        if key is None:
            key = jax.random.PRNGKey(0)
        frame = jnp.abs(frame + jax.random.uniform(key, frame.shape, dtype=dtype) * 1e-7)
    return frame, delta_x


def make_translating_texture_movie(
    n_frames: int = 2,
    dimension: int = 1024,
    v_x: float = 0.15,
    v_y: float = 0.1,
    mean_intensity: float = 100.0,
    contrast: float = 0.8,
    dtype=jnp.float64,
) -> Tuple[np.ndarray, float]:
    """A full-field smooth positive texture translating at a known uniform
    velocity (in pixels per frame interval; delta_x = delta_t = 1).

    This is the workload-scale analogue of the reference's 1024^2 embryo
    movies (ref analysis/analyse_variational_optical_flow.py:201-272):
    unlike the tiny-blob synthetic, the intensity covers the whole frame,
    so the EL system's data term constrains the velocity everywhere —
    the conditioning regime of the real microscopy data.  The pattern is
    an analytic multi-frequency sinusoid mixture evaluated at
    sub-pixel-shifted coordinates, so the translation is exact.
    """
    ii = jnp.arange(dimension, dtype=dtype)[:, None]
    jj = jnp.arange(dimension, dtype=dtype)[None, :]

    def pattern(x, y):
        tau = 2.0 * jnp.pi
        p = (
            0.45 * jnp.sin(tau * x / 73.0) * jnp.cos(tau * y / 91.0)
            + 0.30 * jnp.cos(tau * (x + 0.7 * y) / 41.0)
            + 0.15 * jnp.sin(tau * (0.4 * x - y) / 157.0)
            + 0.10 * jnp.cos(tau * x / 23.0) * jnp.cos(tau * y / 19.0)
        )
        return mean_intensity * (1.0 + contrast * 0.5 * p)

    frames = [pattern(ii - v_x * t, jj - v_y * t) for t in range(n_frames)]
    return np.asarray(jnp.stack(frames, axis=0)), 1.0


def make_translating_blob_movie(
    n_frames: int = 2,
    dimension: int = 256,
    width: float = 20.0,
    sigma: float = 3.0,
    v_x: float = 0.1,
    v_y: float = 0.2,
    start: Tuple[float, float] = None,
    include_noise: bool = False,
    dtype=jnp.float64,
) -> Tuple[np.ndarray, float]:
    """A movie of a Gaussian blob translating at a known uniform velocity
    (the synthetic ground-truth workload of ref
    analysis/compare_rho_and_actin.py:302-375 ``check_error_of_method`` and
    analysis/analyse_variational_optical_flow.py:26-112).

    Velocities are in physical units per frame interval of 1.0; returns
    ``(movie, delta_x)`` with movie shape ``(n_frames, dimension, dimension)``.
    """
    if start is None:
        start = (width / 2.0, width / 2.0)
    frames = []
    delta_x = None
    for t in range(n_frames):
        frame, delta_x = make_fake_data_frame(
            start[0] + v_x * t,
            start[1] + v_y * t,
            sigma=sigma,
            width=width,
            include_noise=include_noise,
            dimension=dimension,
            key=jax.random.PRNGKey(t) if include_noise else None,
            dtype=dtype,
        )
        frames.append(frame)
    movie = jnp.stack(frames, axis=0)
    return np.asarray(movie), delta_x
