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
