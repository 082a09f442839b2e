"""Boundary-clipped box sums (uniform filters).

The reference's box-method kernel sums image products over a ``box_size``
neighbourhood clipped at the image boundary, per pixel
(/root/reference/source/optical_flow.py:102-117).  On TPU that per-pixel
loop becomes a separable windowed reduction: two 1-D
``lax.reduce_window`` passes with zero ("SAME") padding reproduce the
clipped sums exactly, in O(box) adds per pixel, fully fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def effective_window(box_size: int) -> int:
    """The reference clips the window to ``[i - b//2, i + b//2]`` inclusive
    (ref :105-108), which spans ``b`` pixels for odd ``b`` and ``b + 1``
    pixels for even ``b``.  We reproduce that."""
    half = box_size // 2
    return 2 * half + 1


def box_sum(x: jnp.ndarray, box_size: int) -> jnp.ndarray:
    """Sum of x over the clipped box window centred at every pixel.

    Works on the last two axes of ``x`` (supports a leading batch axis).
    """
    win = effective_window(box_size)
    pad = win // 2
    nd = x.ndim
    window = [1] * nd
    padding = [(0, 0)] * nd
    window[-2] = win
    padding[-2] = (pad, pad)
    out = lax.reduce_window(x, 0.0, lax.add, tuple(window), (1,) * nd, padding)
    window = [1] * nd
    padding = [(0, 0)] * nd
    window[-1] = win
    padding[-1] = (pad, pad)
    out = lax.reduce_window(out, 0.0, lax.add, tuple(window), (1,) * nd, padding)
    return out
