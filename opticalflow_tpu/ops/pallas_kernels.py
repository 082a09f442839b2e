"""Pallas TPU kernels for the hot stencil operations.

The EL matvec is the innermost loop of the whole engine (2 applications
per BiCGStab iteration + 5 fine-level applications per multigrid V-cycle).
This kernel fuses the whole 9-point / 3-field stencil into one VMEM-tiled
pass: per tile it DMAs the halo'd field rows and the 13 coefficient
planes once, does all arithmetic on the VPU, and writes the 3 output
planes — where the XLA lowering re-materialises shifted copies of the
field between fusions.

Tiling: grid ``(batch, row-blocks)``, full image width per tile (lane
halos then stay inside the tile, so only the *row* halo needs a manual
DMA).  TPU DMA slices must be aligned to the (8, 128) f32 tile, so the
extended field is stored with a 7-row top offset and each program copies
an aligned (BM + 16)-row superset that contains its halo.  Full-width
tiles bound the supported width to ~1100 pixels f32 (VMEM); wider images
fall back to the XLA matvec (see ``flow.variational``).

The batch dimension is native to the kernel (a leading grid axis), and
``el_matvec_fused`` carries a ``jax.custom_batching.custom_vmap`` rule
mapping ``vmap`` onto it — so the solver can use the fused kernel
unchanged inside the vmapped cold-start frame-pair batch.  One vmap level
only; the multigrid comb probing keeps the XLA matvec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opticalflow_tpu.ops import elop

BM = 128  # rows per tile
_ROW_OFFSET = 7  # zero rows above u_ext so aligned DMAs contain the halo
_LANE = 128
_SUB = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _el_matvec_kernel(scalars_ref, u_hbm, coeff_ref, out_ref, u_tile, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        u_hbm.at[b, :, pl.ds(i * BM, BM + 2 * _SUB), :],
        u_tile,
        sem,
    )
    copy.start()

    a_s = scalars_ref[b, 0]
    a_r = scalars_ref[b, 1]

    c = coeff_ref[0]  # (13, BM, NP)
    diag_x, diag_y, cross = c[0], c[1], c[2]
    adv_xm, adv_xp, adv_ym, adv_yp = c[3], c[4], c[5], c[6]
    gx, gy, quart, half_i = c[7], c[8], c[9], c[10]
    didx, didy = c[11], c[12]

    np_ = out_ref.shape[3]

    copy.wait()
    u = u_tile[:]  # (3, BM + 16, NP)
    ux, uy, g = u[0], u[1], u[2]

    def sh(f, di, dj):
        # output row k <- u_ext row i*BM + k + 1 + di  == tile row k + 8 + di
        # output col l <- u_ext col l + 1 + dj         == tile col l + 1 + dj
        r0 = 8 + di
        c0 = 1 + dj
        return f[r0 : r0 + BM, c0 : c0 + np_]

    y_ux = (
        diag_x * sh(ux, 0, 0)
        + cross * sh(uy, 0, 0)
        + adv_xm * sh(ux, -1, 0)
        + adv_xp * sh(ux, 1, 0)
        + a_s * (sh(ux, 0, -1) + sh(ux, 0, 1))
        + gx * (sh(uy, 0, 1) - sh(uy, 0, -1))
        + gy * (sh(uy, 1, 0) - sh(uy, -1, 0))
        + quart * (sh(uy, -1, -1) + sh(uy, 1, 1) - sh(uy, -1, 1) - sh(uy, 1, -1))
        + half_i * (sh(g, -1, 0) - sh(g, 1, 0))
    )
    y_uy = (
        diag_y * sh(uy, 0, 0)
        + cross * sh(ux, 0, 0)
        + adv_ym * sh(uy, 0, -1)
        + adv_yp * sh(uy, 0, 1)
        + a_s * (sh(uy, -1, 0) + sh(uy, 1, 0))
        + gy * (sh(ux, 1, 0) - sh(ux, -1, 0))
        + gx * (sh(ux, 0, 1) - sh(ux, 0, -1))
        + quart * (sh(ux, -1, -1) + sh(ux, 1, 1) - sh(ux, -1, 1) - sh(ux, 1, -1))
        + half_i * (sh(g, 0, -1) - sh(g, 0, 1))
    )
    y_g = (
        (-1.0 - 4.0 * a_r) * sh(g, 0, 0)
        + didx * sh(ux, 0, 0)
        + didy * sh(uy, 0, 0)
        + a_r * (sh(g, -1, 0) + sh(g, 1, 0) + sh(g, 0, -1) + sh(g, 0, 1))
        + half_i * (sh(ux, 1, 0) - sh(ux, -1, 0))
        + half_i * (sh(uy, 0, 1) - sh(uy, 0, -1))
    )

    out_ref[0, 0] = y_ux
    out_ref[0, 1] = y_uy
    out_ref[0, 2] = y_g


def stack_coefficients(coeffs: elop.ELCoefficients) -> jnp.ndarray:
    """(13, M, N) plane stack in the kernel's expected order."""
    return jnp.stack(
        [
            coeffs.diag_x,
            coeffs.diag_y,
            coeffs.cross,
            coeffs.adv_xm,
            coeffs.adv_xp,
            coeffs.adv_ym,
            coeffs.adv_yp,
            coeffs.gx,
            coeffs.gy,
            coeffs.quart,
            coeffs.half_I,
            coeffs.dIdx,
            coeffs.dIdy,
        ]
    )


# interpret mode lets the kernel run (emulated) on CPU for testing
INTERPRET = False


def _run_batched(coeff_padded, scalars, u_padded, interpret):
    """Grid (B, row-blocks) kernel invocation on pre-padded operands."""
    batch, _, mp, np_ = coeff_padded.shape
    grid_m = mp // BM
    lane_width = u_padded.shape[3]
    dtype = u_padded.dtype

    return pl.pallas_call(
        _el_matvec_kernel,
        grid=(batch, grid_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 2), indexed by program_id
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 13, BM, np_), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, BM, np_), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 3, mp, np_), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, BM + 2 * _SUB, lane_width), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scalars, u_padded, coeff_padded)


@jax.custom_batching.custom_vmap
def _padded_matvec(coeff_padded, scalars, u_padded):
    """Unbatched fused matvec on pre-padded operands -> (3, mp, np_)."""
    return _run_batched(coeff_padded[None], scalars[None], u_padded[None],
                        INTERPRET)[0]


@_padded_matvec.def_vmap
def _padded_matvec_vmap(axis_size, in_batched, coeff_padded, scalars, u_padded):
    cb, sb, ub = in_batched
    if not cb:
        coeff_padded = jnp.broadcast_to(
            coeff_padded[None], (axis_size,) + coeff_padded.shape)
    if not sb:
        scalars = jnp.broadcast_to(scalars[None], (axis_size,) + scalars.shape)
    if not ub:
        u_padded = jnp.broadcast_to(u_padded[None], (axis_size,) + u_padded.shape)
    return _run_batched(coeff_padded, scalars, u_padded, INTERPRET), True


def _pad_u_ext(u_ext, m: int, n: int):
    mp = _round_up(m, BM)
    np_ = _round_up(n + 2, _LANE)
    total_rows = mp + 2 * _SUB
    # one extra lane group so column-shifted slices stay in bounds
    lane_width = np_ + _LANE
    return jnp.pad(
        u_ext,
        (
            (0, 0),
            (_ROW_OFFSET, total_rows - _ROW_OFFSET - (m + 2)),
            (0, lane_width - (n + 2)),
        ),
    )


def max_supported_width(dtype=jnp.float32) -> int:
    """Width limit of the full-width tiling given ~16MB VMEM."""
    # (13 coeff + 3 out + 3 * (BM+16)/BM field) * BM * NP * itemsize <~ 14MB
    itemsize = jnp.dtype(dtype).itemsize
    budget = 14 * 1024 * 1024
    per_lane = (13 + 3) * BM * itemsize + 3 * (BM + 2 * _SUB) * itemsize
    return budget // per_lane


def pad_coefficients(coeffs: elop.ELCoefficients, m: int, n: int) -> jnp.ndarray:
    mp = _round_up(m, BM)
    np_ = _round_up(n + 2, _LANE)
    return jnp.pad(stack_coefficients(coeffs), ((0, 0), (0, mp - m), (0, np_ - n)))


def make_pallas_matvec(coeffs: elop.ELCoefficients, m: int, n: int):
    """Bind the (padded) coefficient stack once and return a matvec
    closure with the same signature as elop.el_matvec_reduced's partial.
    vmap-compatible (one level) via the custom_vmap rule above."""
    coeff_padded = pad_coefficients(coeffs, m, n)
    dtype = coeff_padded.dtype
    scalars = jnp.stack(
        [coeffs.speed_alpha.astype(dtype), coeffs.remodelling_alpha.astype(dtype)]
    )

    def matvec(u_int):
        u_ext = elop.extend_interior(u_int)
        out = _padded_matvec(coeff_padded, scalars, _pad_u_ext(u_ext, m, n))
        return out[:, :m, :n]

    return matvec


def el_matvec_reduced_pallas(coeffs: elop.ELCoefficients, u_int: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused-Pallas replacement for ops.elop.el_matvec_reduced."""
    m, n = u_int.shape[1], u_int.shape[2]
    return make_pallas_matvec(coeffs, m, n)(u_int)
