"""Pallas TPU kernels for the hot stencil operations.

The EL matvec is the innermost loop of the whole engine: 2 Krylov
applications per BiCGStab iteration plus ~4 fine-level applications per
multigrid V-cycle, so ~10 applications per iteration.  This kernel
replaces the reference's entire PETSc hot loop
(/root/reference/source/optical_flow.py:1080-1157) with one VMEM-tiled
fused pass per application.

v2 design (round 2) — two changes that make it beat the XLA lowering:

* **Coefficients on the fly.**  All 13 EL coefficient planes are local
  functions of the previous frame I and two scalars (ops.elop): instead
  of streaming 13 precomputed planes from HBM per application, the kernel
  DMAs the single I plane (with halo) and rebuilds the coefficients on
  the VPU.  HBM traffic per application drops from ~19 planes to ~7
  (I + 3 in-fields + 3 out-fields) — the kernel is memory-bound, so this
  is a direct speedup.

* **Padded-state layouts.**  The Krylov iteration keeps its vectors in
  the kernel's aligned layouts end-to-end (see ``PaddedOps``), so the
  per-application ``jnp.pad`` copies of the round-1 kernel vanish:
  - *solution space* ``P``: the mirror-extended field stored at row
    offset 8 / col offset 0 in an ``(3, mp+16, np_u)`` array
    (``mp = ceil(m/BM)*BM``, ``np_u = ceil((n+2)/128)*128``).  Extension
    is linear, so BiCGStab's x-updates stay in P without re-extension.
  - *residual space* ``R``: plain interior fields zero-padded to
    ``(3, mp, np_r)`` (``np_r = ceil(n/128)*128``).  The kernel masks its
    outputs so padding stays exactly zero and dot products need no mask.
  Only the preconditioner bridges R -> P (one fused extend+pad per
  application instead of two pads per matvec).

Tiling: grid ``(batch, row-blocks)``, full image width per tile.  The
row halo comes from an aligned DMA superset (tile rows ``[i*BM,
i*BM+BM+16)`` always cover the +-1 ext rows because of the offset-8
storage); the column halo from 128 slack lanes in the VMEM scratch only
(not in HBM — the DMA writes the true width and the slack lanes hold
don't-care values that are masked out of the result).

The batch dimension is a native leading grid axis and
``_padded_matvec`` carries a ``jax.custom_batching.custom_vmap`` rule,
so the solver can use the fused kernel unchanged inside the vmapped
cold-start frame-pair batch (one vmap level; the multigrid comb probing
keeps the XLA matvec).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM = 128  # rows per tile
_ROW_OFFSET = 8  # P layout: ext/full-frame row e lives at padded row e+8
_LANE = 128
_SUB = 8

# interpret mode lets the kernel run (emulated) on CPU for testing
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _el_matvec_kernel(scalars_ref, meta_ref, i_hbm, u_hbm, out_ref, i_tile, u_tile, sems):
    """One (batch, row-block) tile of the fused EL matvec.

    ``i_hbm``: (B, mp+16, np_u) previous-frame plane, full frame at row
    offset 8 / col offset 0.  ``u_hbm``: (B, 3, mp+16, np_u) mirror-
    extended field in the same offsets (P layout).  Output block:
    (1, 3, BM, np_r) interior result rows ``[i*BM, i*BM+BM)`` (R layout).

    Scratch tiles carry 128 slack lanes so the +-1 column shifts are
    plain static slices; the DMA only writes the true ``np_u`` columns.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    np_u = i_hbm.shape[2]

    cp_i = pltpu.make_async_copy(
        i_hbm.at[b, pl.ds(i * BM, BM + 2 * _SUB), :],
        i_tile.at[:, :np_u],
        sems.at[0],
    )
    cp_u = pltpu.make_async_copy(
        u_hbm.at[b, :, pl.ds(i * BM, BM + 2 * _SUB), :],
        u_tile.at[:, :, :np_u],
        sems.at[1],
    )
    cp_i.start()
    cp_u.start()

    a_s = scalars_ref[b, 0]
    a_r = scalars_ref[b, 1]
    m_valid = meta_ref[b, 0]
    n_valid = meta_ref[b, 1]
    compat = meta_ref[b, 2]

    np_r = out_ref.shape[3]

    cp_i.wait()
    cp_u.wait()

    u = u_tile[:]
    it = i_tile[:]
    ux, uy, g = u[0], u[1], u[2]

    def sh(f, a, bb):
        # interior output row k (tile-local) reads full-frame/ext row
        # (global k) + a at padded row k+a+8 -> tile row k + a + 8;
        # column l + bb at tile col l + bb.  a, bb in {0, 1, 2}.
        return f[8 + a : 8 + a + BM, bb : bb + np_r]

    # --- coefficients on the fly (ops.elop.compute_frame_pair_data) ---
    I = sh(it, 1, 1)
    dIdx = 0.5 * (sh(it, 2, 1) - sh(it, 0, 1))
    dIdy_fixed = 0.5 * (sh(it, 1, 2) - sh(it, 1, 0))
    dIdy = jnp.where(compat != 0, dIdx, dIdy_fixed)
    dIdxx = sh(it, 2, 1) + sh(it, 0, 1) - 2.0 * I
    dIdyy = sh(it, 1, 2) + sh(it, 1, 0) - 2.0 * I
    dIdxy = 0.25 * (sh(it, 2, 2) - sh(it, 2, 0) - sh(it, 0, 2) + sh(it, 0, 0))

    diag_x = I * (dIdxx - 2.0 * I) - 4.0 * a_s
    diag_y = I * (dIdyy - 2.0 * I) - 4.0 * a_s
    cross = I * dIdxy
    adv_xm = I * (-dIdx + I) + a_s
    adv_xp = I * (dIdx + I) + a_s
    adv_ym = I * (-dIdy + I) + a_s
    adv_yp = I * (dIdy + I) + a_s
    gx = I * dIdx * 0.5
    gy = I * dIdy * 0.5
    quart = I * I * 0.25
    half_i = I * 0.5

    # --- fused 9-point / 3-field stencil (ops.elop.interior_apply) ---
    y_ux = (
        diag_x * sh(ux, 1, 1)
        + cross * sh(uy, 1, 1)
        + adv_xm * sh(ux, 0, 1)
        + adv_xp * sh(ux, 2, 1)
        + a_s * (sh(ux, 1, 0) + sh(ux, 1, 2))
        + gx * (sh(uy, 1, 2) - sh(uy, 1, 0))
        + gy * (sh(uy, 2, 1) - sh(uy, 0, 1))
        + quart * (sh(uy, 0, 0) + sh(uy, 2, 2) - sh(uy, 0, 2) - sh(uy, 2, 0))
        + half_i * (sh(g, 0, 1) - sh(g, 2, 1))
    )
    y_uy = (
        diag_y * sh(uy, 1, 1)
        + cross * sh(ux, 1, 1)
        + adv_ym * sh(uy, 1, 0)
        + adv_yp * sh(uy, 1, 2)
        + a_s * (sh(uy, 0, 1) + sh(uy, 2, 1))
        + gy * (sh(ux, 2, 1) - sh(ux, 0, 1))
        + gx * (sh(ux, 1, 2) - sh(ux, 1, 0))
        + quart * (sh(ux, 0, 0) + sh(ux, 2, 2) - sh(ux, 0, 2) - sh(ux, 2, 0))
        + half_i * (sh(g, 1, 0) - sh(g, 1, 2))
    )
    y_g = (
        (-1.0 - 4.0 * a_r) * sh(g, 1, 1)
        + dIdx * sh(ux, 1, 1)
        + dIdy * sh(uy, 1, 1)
        + a_r * (sh(g, 0, 1) + sh(g, 2, 1) + sh(g, 1, 0) + sh(g, 1, 2))
        + half_i * (sh(ux, 2, 1) - sh(ux, 0, 1))
        + half_i * (sh(uy, 1, 2) - sh(uy, 1, 0))
    )

    # Zero the padding so residual-space (R) vectors keep exact zeros
    # outside the m x n interior and dot products need no masking.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BM, np_r), 0) + i * BM
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BM, np_r), 1)
    valid = (row_ids < m_valid) & (col_ids < n_valid)
    zero = jnp.zeros((), out_ref.dtype)
    out_ref[0, 0] = jnp.where(valid, y_ux, zero)
    out_ref[0, 1] = jnp.where(valid, y_uy, zero)
    out_ref[0, 2] = jnp.where(valid, y_g, zero)


def _run_batched(i_padded, scalars, meta, u_padded, interpret):
    """Grid (B, row-blocks) kernel invocation on pre-padded operands."""
    batch, rows, np_u = i_padded.shape
    mp = rows - 2 * _SUB
    grid_m = mp // BM
    np_r = _infer_np_r(np_u)
    dtype = u_padded.dtype

    return pl.pallas_call(
        _el_matvec_kernel,
        grid=(batch, grid_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (B, 2)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta (B, 3) int32
            pl.BlockSpec(memory_space=pl.ANY),  # I plane, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # field, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (1, 3, BM, np_r), lambda b, i: (b, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 3, mp, np_r), dtype),
        scratch_shapes=[
            pltpu.VMEM((BM + 2 * _SUB, np_u + _LANE), dtype),
            pltpu.VMEM((3, BM + 2 * _SUB, np_u + _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scalars, meta, i_padded, u_padded)


def _infer_np_r(np_u: int) -> int:
    """R-layout lane width from the P-layout lane width.

    P holds n+2 columns, R holds n; both round up to 128, so they agree
    unless n+2 just crossed a lane boundary — but since n is only known
    dynamically via meta, the kernel always emits np_u lanes' worth of
    output width rounded from the same bound.  Using np_u keeps the two
    layouts' lane counts equal (correct: np_r as used by PaddedOps is
    round_up(n,128) <= np_u, and the extra masked lanes are zero)."""
    return np_u


@jax.custom_batching.custom_vmap
def _padded_matvec(i_padded, scalars, meta, u_padded):
    """Unbatched fused matvec on pre-padded operands -> (3, mp, np_r)."""
    return _run_batched(
        i_padded[None], scalars[None], meta[None], u_padded[None], INTERPRET
    )[0]


@_padded_matvec.def_vmap
def _padded_matvec_vmap(axis_size, in_batched, i_padded, scalars, meta, u_padded):
    ib, sb, mb, ub = in_batched
    if not ib:
        i_padded = jnp.broadcast_to(i_padded[None], (axis_size,) + i_padded.shape)
    if not sb:
        scalars = jnp.broadcast_to(scalars[None], (axis_size,) + scalars.shape)
    if not mb:
        meta = jnp.broadcast_to(meta[None], (axis_size,) + meta.shape)
    if not ub:
        u_padded = jnp.broadcast_to(u_padded[None], (axis_size,) + u_padded.shape)
    return _run_batched(i_padded, scalars, meta, u_padded, INTERPRET), True


class PaddedOps(NamedTuple):
    """Fused-kernel operator set on aligned layouts for one frame pair.

    ``matvec``: P -> R application of the reduced EL operator (boundary
    rows folded in, identical semantics to ops.elop.el_matvec_reduced).
    ``extend_pad``: interior (3, m, n) -> P (mirror extension + aligned
    padding, one fused XLA copy).  ``pad_rhs``: interior -> R.
    ``slice_residual`` / ``slice_solution``: R / P -> interior.
    """

    matvec: Callable
    extend_pad: Callable
    pad_rhs: Callable
    slice_residual: Callable
    slice_solution: Callable
    m: int
    n: int


def max_supported_width(dtype=jnp.float32) -> int:
    """Width limit of the v2 (padded-layout) kernel's full-width tiling
    given ~16MB VMEM.  Informational since round 4: ``matvec='auto'``
    resolves to the XLA stencil (measured faster end-to-end, see
    flow.variational._resolve_matvec_impl), and the v4 interior kernel
    halves its row block at wide images instead (``_pick_bm``).

    Scratch: I tile (BM+16, np_u+128) + field tile 3x(BM+16, np_u+128),
    output block 3xBMxnp_r double-buffered, plus Mosaic temporaries for
    the rebuilt coefficient planes (~8 x BM x np_r live at once)."""
    itemsize = jnp.dtype(dtype).itemsize
    budget = 13 * 1024 * 1024
    per_lane = (4 * (BM + 2 * _SUB) + 6 * BM + 8 * BM) * itemsize
    return budget // per_lane - _LANE


def make_padded_ops(
    previous_frame: jnp.ndarray,
    speed_alpha,
    remodelling_alpha,
    dy_mode: str = "compat",
) -> PaddedOps:
    """Build the padded-layout fused operator set for one frame pair.

    ``previous_frame``: the (m+2, n+2) full frame whose intensity I
    defines every EL coefficient (ref optical_flow.py:843-962 — the
    assembled matrix entries are all local functions of I).
    """
    ni, nj = previous_frame.shape
    m, n = ni - 2, nj - 2
    mp = _round_up(m, BM)
    np_u = _round_up(n + 2, _LANE)
    np_r = np_u  # equal lane counts keep P/R conversions slice-only
    dtype = previous_frame.dtype

    i_padded = jnp.pad(
        previous_frame,
        ((_ROW_OFFSET, mp + 2 * _SUB - _ROW_OFFSET - ni), (0, np_u - nj)),
    )
    scalars = jnp.stack(
        [
            jnp.asarray(speed_alpha, dtype=dtype),
            jnp.asarray(remodelling_alpha, dtype=dtype),
        ]
    )
    meta = jnp.array([m, n, 1 if dy_mode == "compat" else 0], dtype=jnp.int32)

    def matvec(u_p):
        return _padded_matvec(i_padded, scalars, meta, u_p)

    def extend_pad(u_int):
        # mirror extension (ops.elop.extend_interior semantics: edges
        # mirror one interior value, corners take 2x the diagonal value)
        # fused with the aligned pad — one copy, concat/pad lowering
        # (safe under GSPMD, see ops.elop._extend_with_corners).
        from opticalflow_tpu.ops import elop

        ext = elop.extend_interior(u_int)  # (3, m+2, n+2)
        return jnp.pad(
            ext,
            (
                (0, 0),
                (_ROW_OFFSET, mp + 2 * _SUB - _ROW_OFFSET - ni),
                (0, np_u - nj),
            ),
        )

    def pad_rhs(b_int):
        return jnp.pad(b_int, ((0, 0), (0, mp - m), (0, np_r - n)))

    def slice_residual(r_pad):
        return r_pad[:, :m, :n]

    def slice_solution(x_p):
        # interior row k = ext row k+1 = padded row k+9; col l = padded col l+1
        return x_p[:, _ROW_OFFSET + 1 : _ROW_OFFSET + 1 + m, 1 : 1 + n]

    return PaddedOps(
        matvec=matvec,
        extend_pad=extend_pad,
        pad_rhs=pad_rhs,
        slice_residual=slice_residual,
        slice_solution=slice_solution,
        m=m,
        n=n,
    )


def el_matvec_reduced_pallas(
    previous_frame: jnp.ndarray,
    speed_alpha,
    remodelling_alpha,
    u_int: jnp.ndarray,
    dy_mode: str = "compat",
) -> jnp.ndarray:
    """Drop-in fused-Pallas equivalent of ops.elop.el_matvec_reduced on
    interior-layout fields (pays the layout conversions; the solver uses
    the PaddedOps closures directly to avoid them)."""
    ops = make_padded_ops(previous_frame, speed_alpha, remodelling_alpha, dy_mode)
    return ops.slice_residual(ops.matvec(ops.extend_pad(u_int)))


# ===========================================================================
# v3 kernel (round 4): mirror folding IN-KERNEL, one interior-aligned layout
#
# Round-3 profiling on-chip (bench/component_probe.py) showed the fused
# kernel itself costs ~85us per batched 256^2 application but the R -> P
# bridge (ops.elop.extend_interior + aligned pad, one per preconditioner
# update) costs ~445us — 5x the kernel.  The mirror extension is, however,
# a *static index remapping* plus a corner doubling: ext(-1) reads interior
# row/col 1, ext(m) reads interior m-2, global corners take 2x the diagonal
# value (ops.elop._extend_with_corners).  So the v3 kernel folds it into
# the stencil reads themselves as vectorised selects on the row/col index
# masks — and the whole Krylov iteration collapses to ONE layout:
#
#   container C: (3, mp, NW) with the interior field at the origin and
#   exact zeros outside (m, n); mp = ceil(m/BMv)*BMv, NW = ceil(n/128)*128.
#
# matvec is C -> C, every solution/residual vector lives in C, dot
# products need no masking (zeros preserved by the kernel's output mask),
# the preconditioner's fine-level block-Jacobi updates run directly on C
# (solve.multigrid.v_cycle_aligned), and no extension/pad copies remain
# anywhere in the iteration.
# ===========================================================================


def _pick_bm(nw: int) -> int:
    """Row-block size: 128 up to 512-wide images, 64 beyond (halves the
    VMEM footprint of the out block + coefficient temporaries at 1024^2)."""
    return 128 if nw <= 512 else 64


def _el_matvec_interior_kernel(
    scalars_ref, meta_ref, i_cur, i_next, u_prev, u_cur, u_next, out_ref, *, bm
):
    """One (batch, row-block) tile of the fused EL matvec, interior layout.

    v4 (round 4): PIPELINED — all operands arrive through BlockSpec views
    so Mosaic double-buffers the HBM traffic behind compute (the v3
    manual-DMA kernel serialised DMA -> wait -> compute per tile and
    measured only ~12% of HBM peak).  The row halo comes from 8-row
    *sliver views* of the same arrays at shifted block indices, so per
    application the true traffic stays ~7 planes (I + 3 in + 3 out).

    ``i_cur``/(1, bm, NI) + ``i_next``/(1, 8, NI): previous-frame plane
    rows [j*bm, j*bm+bm) and [j*bm+bm, +8).  ``u_prev``/``u_next``
    (1, 3, 8, NW): container C rows [j*bm-8, j*bm) / [j*bm+bm, +8)
    (clamped at the array ends — the clamped rows are only read where the
    mirror selects or the validity mask discard them).  ``u_cur``:
    (1, 3, bm, NW).  Output block: (1, 3, bm, NW) rows [j*bm, j*bm+bm).

    The reduced-system mirror semantics (ops.elop.extend_interior) are
    applied to the field reads in-kernel: reads of interior row -1 select
    row 1, row m selects m-2 (cols symmetric), and the four diagonal reads
    are doubled at the matching image corner.
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    NW = out_ref.shape[3]
    NI = i_cur.shape[2]

    a_s = scalars_ref[b, 0]
    a_r = scalars_ref[b, 1]
    m_valid = meta_ref[b, 0]
    n_valid = meta_ref[b, 1]
    compat = meta_ref[b, 2]

    # (bm+2, NI+2) window of I: rows [j*bm, j*bm+bm+2), 2 col slack so the
    # +1/+2 col reads stay static slices (values beyond n+1 are container
    # zeros, read only under the validity mask)
    Ei = jnp.concatenate([i_cur[0], i_next[0, :2]], axis=0)
    Ei = jnp.concatenate([Ei, jnp.zeros((bm + 2, 2), Ei.dtype)], axis=1)

    def shi(a, bb):
        # I(i+a, j+bb) for output pixel (i, j): full-frame layout, no
        # mirror needed (the frame exists at all stencil offsets)
        return Ei[a : a + bm, bb : bb + NW]

    # --- coefficients on the fly (ops.elop.compute_frame_pair_data) ---
    I = shi(1, 1)
    dIdx = 0.5 * (shi(2, 1) - shi(0, 1))
    dIdy_fixed = 0.5 * (shi(1, 2) - shi(1, 0))
    dIdy = jnp.where(compat != 0, dIdx, dIdy_fixed)
    dIdxx = shi(2, 1) + shi(0, 1) - 2.0 * I
    dIdyy = shi(1, 2) + shi(1, 0) - 2.0 * I
    dIdxy = 0.25 * (shi(2, 2) - shi(2, 0) - shi(0, 2) + shi(0, 0))

    diag_x = I * (dIdxx - 2.0 * I) - 4.0 * a_s
    diag_y = I * (dIdyy - 2.0 * I) - 4.0 * a_s
    cross = I * dIdxy
    adv_xm = I * (-dIdx + I) + a_s
    adv_xp = I * (dIdx + I) + a_s
    adv_ym = I * (-dIdy + I) + a_s
    adv_yp = I * (dIdy + I) + a_s
    gx = I * dIdx * 0.5
    gy = I * dIdy * 0.5
    quart = I * I * 0.25
    half_i = I * 0.5

    # --- mirror-folded field reads ---
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bm, NW), 0) + j * bm
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bm, NW), 1)
    row0 = row_ids == 0
    rowm = row_ids == m_valid - 1
    col0 = col_ids == 0
    coln = col_ids == n_valid - 1

    def mk_reads(q, need_diag):
        """The 9 mirror-folded reads P[a][bb] of one field (g skips the
        diagonals).  raw (a, bb) reads interior (i+a-1, j+bb-1): rows from
        the sliver-extended window, cols from the +-1 lane-shifted copies
        (their out-of-range lanes are garbage only where the mirror
        selects or the validity mask discard them)."""
        E = jnp.concatenate(
            [u_prev[0, q, 7:8], u_cur[0, q], u_next[0, q, :1]], axis=0
        )  # (bm+2, NW): rows [j*bm-1, j*bm+bm+1)
        zcol = jnp.zeros((bm + 2, 1), E.dtype)
        Lft = jnp.concatenate([zcol, E], axis=1)[:, :NW]     # col l-1
        Rgt = jnp.concatenate([E, zcol], axis=1)[:, 1:]      # col l+1
        by_col = {0: Lft, 1: E, 2: Rgt}

        def raw(a, bb):
            return by_col[bb][a : a + bm, :]

        # column-fixed planes C[a][bb]: interior col -1 -> col 1, col n -> n-2
        C = {}
        for a in range(3):
            r0, r1, r2 = raw(a, 0), raw(a, 1), raw(a, 2)
            C[(a, 0)] = jnp.where(col0, r2, r0)
            C[(a, 1)] = r1
            C[(a, 2)] = jnp.where(coln, r0, r2)
        # row-fixed planes: interior row -1 -> row 1, row m -> m-2
        P = {}
        bbs = (0, 1, 2)
        for bb in bbs:
            if not need_diag and bb != 1:
                P[(1, bb)] = C[(1, bb)]
                P[(0, bb)] = None
                P[(2, bb)] = None
                continue
            P[(0, bb)] = jnp.where(row0, C[(2, bb)], C[(0, bb)])
            P[(1, bb)] = C[(1, bb)]
            P[(2, bb)] = jnp.where(rowm, C[(0, bb)], C[(2, bb)])
        if not need_diag:
            # g still needs the 4 edge-centre reads (0,1),(2,1),(1,0),(1,2)
            P[(0, 1)] = jnp.where(row0, C[(2, 1)], C[(0, 1)])
            P[(2, 1)] = jnp.where(rowm, C[(0, 1)], C[(2, 1)])
            return P
        # corner doubling: the diagonal reads that mirrored BOTH indices
        two = jnp.asarray(2.0, out_ref.dtype)
        P[(0, 0)] = jnp.where(row0 & col0, two * P[(0, 0)], P[(0, 0)])
        P[(0, 2)] = jnp.where(row0 & coln, two * P[(0, 2)], P[(0, 2)])
        P[(2, 0)] = jnp.where(rowm & col0, two * P[(2, 0)], P[(2, 0)])
        P[(2, 2)] = jnp.where(rowm & coln, two * P[(2, 2)], P[(2, 2)])
        return P

    UX = mk_reads(0, need_diag=True)
    UY = mk_reads(1, need_diag=True)
    G = mk_reads(2, need_diag=False)

    # --- fused 9-point / 3-field stencil (ops.elop.interior_apply) ---
    y_ux = (
        diag_x * UX[(1, 1)]
        + cross * UY[(1, 1)]
        + adv_xm * UX[(0, 1)]
        + adv_xp * UX[(2, 1)]
        + a_s * (UX[(1, 0)] + UX[(1, 2)])
        + gx * (UY[(1, 2)] - UY[(1, 0)])
        + gy * (UY[(2, 1)] - UY[(0, 1)])
        + quart * (UY[(0, 0)] + UY[(2, 2)] - UY[(0, 2)] - UY[(2, 0)])
        + half_i * (G[(0, 1)] - G[(2, 1)])
    )
    y_uy = (
        diag_y * UY[(1, 1)]
        + cross * UX[(1, 1)]
        + adv_ym * UY[(1, 0)]
        + adv_yp * UY[(1, 2)]
        + a_s * (UY[(0, 1)] + UY[(2, 1)])
        + gy * (UX[(2, 1)] - UX[(0, 1)])
        + gx * (UX[(1, 2)] - UX[(1, 0)])
        + quart * (UX[(0, 0)] + UX[(2, 2)] - UX[(0, 2)] - UX[(2, 0)])
        + half_i * (G[(1, 0)] - G[(1, 2)])
    )
    y_g = (
        (-1.0 - 4.0 * a_r) * G[(1, 1)]
        + dIdx * UX[(1, 1)]
        + dIdy * UY[(1, 1)]
        + a_r * (G[(0, 1)] + G[(2, 1)] + G[(1, 0)] + G[(1, 2)])
        + half_i * (UX[(2, 1)] - UX[(0, 1)])
        + half_i * (UY[(1, 2)] - UY[(1, 0)])
    )

    # Keep the container's exact-zero padding invariant.
    valid = (row_ids < m_valid) & (col_ids < n_valid)
    zero = jnp.zeros((), out_ref.dtype)
    out_ref[0, 0] = jnp.where(valid, y_ux, zero)
    out_ref[0, 1] = jnp.where(valid, y_uy, zero)
    out_ref[0, 2] = jnp.where(valid, y_g, zero)


def _run_batched_interior(i_cont, scalars, meta, u_cont, interpret):
    batch, _, mp, NW = u_cont.shape
    NI = i_cont.shape[2]
    bm = _pick_bm(NW)
    grid_m = mp // bm
    sb = bm // _SUB  # sliver blocks per row block
    dtype = u_cont.dtype

    return pl.pallas_call(
        functools.partial(_el_matvec_interior_kernel, bm=bm),
        grid=(batch, grid_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars (B, 2)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta (B, 3) int32
            # I rows [j*bm, j*bm+bm) + next 8-row sliver (the I container
            # carries 8 tail rows, so the j+1 sliver never clamps)
            pl.BlockSpec((1, bm, NI), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, _SUB, NI), lambda b, j: (b, (j + 1) * sb, 0)),
            # field C: previous 8-row sliver, current block, next sliver
            # (slivers clamp at the array ends; clamped rows are read only
            # where the mirror selects / validity mask discard them)
            pl.BlockSpec(
                (1, 3, _SUB, NW),
                lambda b, j: (b, 0, jnp.maximum(j * sb - 1, 0), 0),
            ),
            pl.BlockSpec((1, 3, bm, NW), lambda b, j: (b, 0, j, 0)),
            pl.BlockSpec(
                (1, 3, _SUB, NW),
                lambda b, j: (b, 0, jnp.minimum((j + 1) * sb, grid_m * sb - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 3, bm, NW), lambda b, j: (b, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, 3, mp, NW), dtype),
        interpret=interpret,
    )(scalars, meta, i_cont, i_cont, u_cont, u_cont, u_cont)


@jax.custom_batching.custom_vmap
def _interior_matvec(i_cont, scalars, meta, u_cont):
    """Unbatched fused C -> C matvec on container operands."""
    return _run_batched_interior(
        i_cont[None], scalars[None], meta[None], u_cont[None], INTERPRET
    )[0]


@_interior_matvec.def_vmap
def _interior_matvec_vmap(axis_size, in_batched, i_cont, scalars, meta, u_cont):
    ib, sb, mb, ub = in_batched
    if not ib:
        i_cont = jnp.broadcast_to(i_cont[None], (axis_size,) + i_cont.shape)
    if not sb:
        scalars = jnp.broadcast_to(scalars[None], (axis_size,) + scalars.shape)
    if not mb:
        meta = jnp.broadcast_to(meta[None], (axis_size,) + meta.shape)
    if not ub:
        u_cont = jnp.broadcast_to(u_cont[None], (axis_size,) + u_cont.shape)
    return _run_batched_interior(i_cont, scalars, meta, u_cont, INTERPRET), True


class AlignedOps(NamedTuple):
    """v3 fused-kernel operator set: ONE layout for the whole iteration.

    ``matvec``: C -> C application of the reduced EL operator (identical
    semantics to ops.elop.el_matvec_reduced, mirror rows folded in-kernel).
    ``pad_field``: interior (3, m, n) -> C (plain zero pad).
    ``slice_field``: C -> interior.
    """

    matvec: Callable
    pad_field: Callable
    slice_field: Callable
    m: int
    n: int


# ===========================================================================
# v5 kernel (round 5): PLAIN stencil in-kernel + XLA boundary ring
#
# Round-4 measurement: the v4 kernel is VPU-compute-bound (~92us vs the
# XLA stencil's ~81us on the 12-pair 256^2 batch) and its VPU time is
# dominated not by the coefficient rebuild (~35 ops/point) but by the
# mirror-fold selects: ~38 jnp.where planes per application (~2x the
# 9-point stencil arithmetic itself).  The folds only MATTER on the
# one-pixel boundary ring of the output — every interior output reads
# in-range neighbours.  So v5 splits the work by where it is needed:
#
#   * the Pallas kernel computes the plain stencil with zero reads
#     outside the interior (no selects beyond the output validity mask);
#   * the boundary ring — O(m+n) pixels — is recomputed exactly in XLA
#     from thin strips (ops.elop.ring_apply) and overwritten into the
#     kernel output with four static slice updates.
#
# Ring values from the kernel are garbage (they read clamped slivers /
# zeros where the mirror should apply) and are never observed.  The
# container zero-padding invariant is preserved by the kernel's validity
# mask, and the ring overwrite touches only true interior pixels.
# Exactness vs el_matvec_reduced: tests/test_pallas.py.
#
# ROUND-5 VERDICT (measured, 12-pair 256^2, differenced chains): the
# fold-removal hypothesis was CORRECT — the plain core is the fastest
# kernel measured, 70.3us vs v4's 96.8 and XLA's 75-83 — but the ring
# overwrite eats the win: the four XLA dynamic-update-slice writes cost
# +36us for the two ROW strips alone and +318us with the two COLUMN
# strips (lane-dimension DUS forces a relayout pass), landing the full
# hybrid at 388us.  Lane rotates (jnp.roll) instead of concats for the
# column shifts were also tried: 79.0us — Mosaic's rotate is slower
# than its concat.  Together with the XLA-side variants (lean
# recompute-in-loop 74.9us, heavy-plane caching 77.8us, bf16 state
# 80.5us, bf16 coefficients 86.8us — see
# flow.variational._resolve_matvec_impl for the full table) this closes
# the investigation: every implementation lands at ~70-97us, i.e. the
# application is at its practical speed-of-light and 'auto' stays XLA.
# The hybrid remains selectable (matvec_impl='hybrid') because the core
# IS the fastest kernel — it pays off the moment a cheaper ring
# mechanism exists (in-kernel strip selects, or a Mosaic/XLA release
# that does lane-dim DUS in place).
# ===========================================================================


def _el_matvec_plain_kernel(
    scalars_ref, meta_ref, i_cur, i_next, u_prev, u_cur, u_next, out_ref, *, bm
):
    """One (batch, row-block) tile of the PLAIN fused EL matvec (v5).

    Identical operand/BlockSpec structure to the v4 interior kernel; the
    field reads are raw ±1 shifts (out-of-range reads are container zeros
    or clamped-sliver garbage that only lands on ring outputs, which the
    XLA ring pass overwrites)."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    NW = out_ref.shape[3]

    a_s = scalars_ref[b, 0]
    a_r = scalars_ref[b, 1]
    m_valid = meta_ref[b, 0]
    n_valid = meta_ref[b, 1]
    compat = meta_ref[b, 2]

    Ei = jnp.concatenate([i_cur[0], i_next[0, :2]], axis=0)
    Ei = jnp.concatenate([Ei, jnp.zeros((bm + 2, 2), Ei.dtype)], axis=1)

    def shi(a, bb):
        return Ei[a : a + bm, bb : bb + NW]

    # --- coefficients on the fly (ops.elop.compute_frame_pair_data) ---
    I = shi(1, 1)
    dIdx = 0.5 * (shi(2, 1) - shi(0, 1))
    dIdy_fixed = 0.5 * (shi(1, 2) - shi(1, 0))
    dIdy = jnp.where(compat != 0, dIdx, dIdy_fixed)
    dIdxx = shi(2, 1) + shi(0, 1) - 2.0 * I
    dIdyy = shi(1, 2) + shi(1, 0) - 2.0 * I
    dIdxy = 0.25 * (shi(2, 2) - shi(2, 0) - shi(0, 2) + shi(0, 0))

    diag_x = I * (dIdxx - 2.0 * I) - 4.0 * a_s
    diag_y = I * (dIdyy - 2.0 * I) - 4.0 * a_s
    cross = I * dIdxy
    adv_xm = I * (-dIdx + I) + a_s
    adv_xp = I * (dIdx + I) + a_s
    adv_ym = I * (-dIdy + I) + a_s
    adv_yp = I * (dIdy + I) + a_s
    gx = I * dIdx * 0.5
    gy = I * dIdy * 0.5
    quart = I * I * 0.25
    half_i = I * 0.5

    def mk_raw(q):
        """Raw ±1-shift reads of field q: (a, bb) -> interior (i+a-1, j+bb-1)."""
        E = jnp.concatenate(
            [u_prev[0, q, 7:8], u_cur[0, q], u_next[0, q, :1]], axis=0
        )  # (bm+2, NW): rows [j*bm-1, j*bm+bm+1)
        zcol = jnp.zeros((bm + 2, 1), E.dtype)
        Lft = jnp.concatenate([zcol, E], axis=1)[:, :NW]
        Rgt = jnp.concatenate([E, zcol], axis=1)[:, 1:]
        by_col = {0: Lft, 1: E, 2: Rgt}

        def raw(a, bb):
            return by_col[bb][a : a + bm, :]

        return raw

    UX = mk_raw(0)
    UY = mk_raw(1)
    G = mk_raw(2)

    # --- fused 9-point / 3-field stencil (ops.elop.interior_apply) ---
    y_ux = (
        diag_x * UX(1, 1)
        + cross * UY(1, 1)
        + adv_xm * UX(0, 1)
        + adv_xp * UX(2, 1)
        + a_s * (UX(1, 0) + UX(1, 2))
        + gx * (UY(1, 2) - UY(1, 0))
        + gy * (UY(2, 1) - UY(0, 1))
        + quart * (UY(0, 0) + UY(2, 2) - UY(0, 2) - UY(2, 0))
        + half_i * (G(0, 1) - G(2, 1))
    )
    y_uy = (
        diag_y * UY(1, 1)
        + cross * UX(1, 1)
        + adv_ym * UY(1, 0)
        + adv_yp * UY(1, 2)
        + a_s * (UY(0, 1) + UY(2, 1))
        + gy * (UX(2, 1) - UX(0, 1))
        + gx * (UX(1, 2) - UX(1, 0))
        + quart * (UX(0, 0) + UX(2, 2) - UX(0, 2) - UX(2, 0))
        + half_i * (G(1, 0) - G(1, 2))
    )
    y_g = (
        (-1.0 - 4.0 * a_r) * G(1, 1)
        + dIdx * UX(1, 1)
        + dIdy * UY(1, 1)
        + a_r * (G(0, 1) + G(2, 1) + G(1, 0) + G(1, 2))
        + half_i * (UX(2, 1) - UX(0, 1))
        + half_i * (UY(1, 2) - UY(1, 0))
    )

    # Keep the container's exact-zero padding invariant.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bm, NW), 0) + j * bm
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bm, NW), 1)
    valid = (row_ids < m_valid) & (col_ids < n_valid)
    zero = jnp.zeros((), out_ref.dtype)
    out_ref[0, 0] = jnp.where(valid, y_ux, zero)
    out_ref[0, 1] = jnp.where(valid, y_uy, zero)
    out_ref[0, 2] = jnp.where(valid, y_g, zero)


def _run_batched_plain(i_cont, scalars, meta, u_cont, interpret):
    batch, _, mp, NW = u_cont.shape
    NI = i_cont.shape[2]
    bm = _pick_bm(NW)
    grid_m = mp // bm
    sb = bm // _SUB
    dtype = u_cont.dtype

    return pl.pallas_call(
        functools.partial(_el_matvec_plain_kernel, bm=bm),
        grid=(batch, grid_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bm, NI), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, _SUB, NI), lambda b, j: (b, (j + 1) * sb, 0)),
            pl.BlockSpec(
                (1, 3, _SUB, NW),
                lambda b, j: (b, 0, jnp.maximum(j * sb - 1, 0), 0),
            ),
            pl.BlockSpec((1, 3, bm, NW), lambda b, j: (b, 0, j, 0)),
            pl.BlockSpec(
                (1, 3, _SUB, NW),
                lambda b, j: (b, 0, jnp.minimum((j + 1) * sb, grid_m * sb - 1), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 3, bm, NW), lambda b, j: (b, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, 3, mp, NW), dtype),
        interpret=interpret,
    )(scalars, meta, i_cont, i_cont, u_cont, u_cont, u_cont)


@jax.custom_batching.custom_vmap
def _plain_matvec(i_cont, scalars, meta, u_cont):
    """Unbatched plain C -> C matvec on container operands (v5 core)."""
    return _run_batched_plain(
        i_cont[None], scalars[None], meta[None], u_cont[None], INTERPRET
    )[0]


@_plain_matvec.def_vmap
def _plain_matvec_vmap(axis_size, in_batched, i_cont, scalars, meta, u_cont):
    ib, sb, mb, ub = in_batched
    if not ib:
        i_cont = jnp.broadcast_to(i_cont[None], (axis_size,) + i_cont.shape)
    if not sb:
        scalars = jnp.broadcast_to(scalars[None], (axis_size,) + scalars.shape)
    if not mb:
        meta = jnp.broadcast_to(meta[None], (axis_size,) + meta.shape)
    if not ub:
        u_cont = jnp.broadcast_to(u_cont[None], (axis_size,) + u_cont.shape)
    return _run_batched_plain(i_cont, scalars, meta, u_cont, INTERPRET), True


def make_hybrid_ops(
    previous_frame: jnp.ndarray,
    speed_alpha,
    remodelling_alpha,
    dy_mode: str = "compat",
) -> AlignedOps:
    """Build the v5 hybrid operator set: plain Pallas core + XLA ring.

    Same container layout and ``AlignedOps`` interface as the v4 kernel
    (drop-in for flow.variational and solve.multigrid.v_cycle_aligned);
    requires m, n >= 3.
    """
    from opticalflow_tpu.ops import elop

    ni, nj = previous_frame.shape
    m, n = ni - 2, nj - 2
    NW = _round_up(n, _LANE)
    bm = _pick_bm(NW)
    mp = _round_up(m, bm)
    NI = _round_up(nj, _LANE)
    dtype = previous_frame.dtype

    i_cont = jnp.pad(previous_frame, ((0, mp + 8 - ni), (0, NI - nj)))
    scalars = jnp.stack(
        [
            jnp.asarray(speed_alpha, dtype=dtype),
            jnp.asarray(remodelling_alpha, dtype=dtype),
        ]
    )
    meta = jnp.array([m, n, 1 if dy_mode == "compat" else 0], dtype=jnp.int32)
    # ring coefficient strips, sliced once per pair (current frame is not
    # needed for coefficients; rhs of this pair object is unused/DCE'd)
    rc = elop.ring_coeffs(
        elop.compute_frame_pair_data(
            previous_frame, previous_frame, speed_alpha, remodelling_alpha, dy_mode
        ).coeffs
    )

    def matvec(u_c):
        y = _plain_matvec(i_cont, scalars, meta, u_c)
        top, bottom, left, right = elop.ring_apply(rc, u_c[:, :m, :n])
        y = y.at[:, 0, :n].set(top)
        y = y.at[:, m - 1, :n].set(bottom)
        y = y.at[:, :m, 0].set(left)
        y = y.at[:, :m, n - 1].set(right)
        return y

    def pad_field(u_int):
        return jnp.pad(u_int, ((0, 0), (0, mp - m), (0, NW - n)))

    def slice_field(u_c):
        return u_c[:, :m, :n]

    return AlignedOps(
        matvec=matvec, pad_field=pad_field, slice_field=slice_field, m=m, n=n
    )


def make_aligned_ops(
    previous_frame: jnp.ndarray,
    speed_alpha,
    remodelling_alpha,
    dy_mode: str = "compat",
) -> AlignedOps:
    """Build the v3 interior-aligned fused operator set for one frame pair.

    ``previous_frame``: the (m+2, n+2) full frame whose intensity defines
    every EL coefficient (ref optical_flow.py:843-962)."""
    ni, nj = previous_frame.shape
    m, n = ni - 2, nj - 2
    NW = _round_up(n, _LANE)
    bm = _pick_bm(NW)
    mp = _round_up(m, bm)
    NI = _round_up(nj, _LANE)
    dtype = previous_frame.dtype

    i_cont = jnp.pad(previous_frame, ((0, mp + 8 - ni), (0, NI - nj)))
    scalars = jnp.stack(
        [
            jnp.asarray(speed_alpha, dtype=dtype),
            jnp.asarray(remodelling_alpha, dtype=dtype),
        ]
    )
    meta = jnp.array([m, n, 1 if dy_mode == "compat" else 0], dtype=jnp.int32)

    def matvec(u_c):
        return _interior_matvec(i_cont, scalars, meta, u_c)

    def pad_field(u_int):
        return jnp.pad(u_int, ((0, 0), (0, mp - m), (0, NW - n)))

    def slice_field(u_c):
        return u_c[:, :m, :n]

    return AlignedOps(
        matvec=matvec, pad_field=pad_field, slice_field=slice_field, m=m, n=n
    )
