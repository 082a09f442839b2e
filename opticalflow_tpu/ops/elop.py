"""Matrix-free Euler-Lagrange operator for variational optical flow.

This is the TPU-native replacement for the reference's host-side sparse
assembly + PETSc matrix (/root/reference/source/optical_flow.py:829-1104).
The reference builds an explicit ``3*Ni*Nj x 3*Ni*Nj`` sparse matrix whose
entries are all local functions of the previous frame I and its
derivatives; here those become ~12 precomputed *coefficient planes* and the
matvec is a fused 9-point, 3-field stencil — no assembly, no sparse
storage, no host round-trips.

State layout: ``u`` has shape ``(3, Ni, Nj)`` with fields ``(u_x, u_y,
gamma)``; conceptually equivalent to the reference's interleaved flat
vector ``3*Nj*i + 3*j + q`` (ref ``get_index_set``, :1241-1302).

Row semantics replicated exactly (verified against an assembled-matrix
oracle in tests/test_elop.py):

* interior rows (pixels ``1..N-2``): the coupled EL equations for
  (u_x, u_y, gamma) — ref :843-962;
* edge rows: mirror constraints ``q(0,j)=q(2,j)`` etc. — ref :964-1070;
* corner rows: the reference's top/bottom and left/right boundary writers
  overlap at corners, leaving rows of the form
  ``q(0,0) - q(2,0) - q(0,2) = 0`` — reproduced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from opticalflow_tpu.core import stencils


class ELCoefficients(NamedTuple):
    """Coefficient planes of the EL operator, all interior-shaped
    ``(Ni-2, Nj-2)``, plus scalars.  Derived once per frame pair from the
    previous frame; every matvec reuses them."""

    diag_x: jnp.ndarray  # I*(dIdxx - 2I) - 4*alpha_s      (u_x diagonal)
    diag_y: jnp.ndarray  # I*(dIdyy - 2I) - 4*alpha_s      (u_y diagonal)
    cross: jnp.ndarray  # I*dIdxy                          (u_x <-> u_y same pixel)
    adv_xm: jnp.ndarray  # I*(-dIdx + I) + alpha_s          (u_x eq, x-1 neighbour)
    adv_xp: jnp.ndarray  # I*(+dIdx + I) + alpha_s          (u_x eq, x+1 neighbour)
    adv_ym: jnp.ndarray  # I*(-dIdy + I) + alpha_s          (u_y eq, y-1 neighbour)
    adv_yp: jnp.ndarray  # I*(+dIdy + I) + alpha_s          (u_y eq, y+1 neighbour)
    gx: jnp.ndarray  # I*dIdx/2
    gy: jnp.ndarray  # I*dIdy/2
    quart: jnp.ndarray  # I^2/4                             (mixed-derivative corners)
    half_I: jnp.ndarray  # I/2                              (gamma couplings)
    dIdx: jnp.ndarray
    dIdy: jnp.ndarray
    speed_alpha: jnp.ndarray  # scalar
    remodelling_alpha: jnp.ndarray  # scalar


class FramePairData(NamedTuple):
    """Everything derived from one (previous, current) frame pair."""

    coeffs: ELCoefficients
    rhs: jnp.ndarray  # (3, Ni, Nj)
    # planes kept for functional evaluation
    dIdx: jnp.ndarray
    dIdy: jnp.ndarray
    dIdt: jnp.ndarray
    I_interior: jnp.ndarray


def compute_frame_pair_data(
    previous_frame: jnp.ndarray,
    current_frame: jnp.ndarray,
    speed_alpha,
    remodelling_alpha,
    dy_mode: str = stencils.DY_COMPAT,
) -> FramePairData:
    """Image-derivative planes + coefficient planes + RHS for one frame
    pair (ref :812-827 for the derivatives, :843-962 for the coefficients).
    """
    prev = previous_frame
    cur = current_frame
    I = prev[1:-1, 1:-1]

    dIdx = stencils.ddx(prev)
    dIdy = stencils.ddy(prev, mode=dy_mode)
    dIdxx = stencils.ddxx(prev)
    dIdyy = stencils.ddyy(prev)
    dIdxy = stencils.ddxy(prev)
    dIdx_t = stencils.ddx(cur) - stencils.ddx(prev)
    dIdy_t = stencils.ddy(cur, mode=stencils.DY_FIXED) - stencils.ddy(prev, mode=stencils.DY_FIXED)
    dIdt = (cur - prev)[1:-1, 1:-1]

    a_s = jnp.asarray(speed_alpha, dtype=I.dtype)
    a_r = jnp.asarray(remodelling_alpha, dtype=I.dtype)

    coeffs = ELCoefficients(
        diag_x=I * (dIdxx - 2.0 * I) - 4.0 * a_s,
        diag_y=I * (dIdyy - 2.0 * I) - 4.0 * a_s,
        cross=I * dIdxy,
        adv_xm=I * (-dIdx + I) + a_s,
        adv_xp=I * (dIdx + I) + a_s,
        adv_ym=I * (-dIdy + I) + a_s,
        adv_yp=I * (dIdy + I) + a_s,
        gx=I * dIdx * 0.5,
        gy=I * dIdy * 0.5,
        quart=I * I * 0.25,
        half_I=I * 0.5,
        dIdx=dIdx,
        dIdy=dIdy,
        speed_alpha=a_s,
        remodelling_alpha=a_r,
    )

    rhs = jnp.zeros((3,) + prev.shape, dtype=I.dtype)
    rhs = rhs.at[0, 1:-1, 1:-1].set(-I * dIdx_t)
    rhs = rhs.at[1, 1:-1, 1:-1].set(-I * dIdy_t)
    rhs = rhs.at[2, 1:-1, 1:-1].set(-dIdt)

    return FramePairData(coeffs=coeffs, rhs=rhs, dIdx=dIdx, dIdy=dIdy, dIdt=dIdt, I_interior=I)


def _shift(f: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """``f(i+di, j+dj)`` evaluated on the interior grid, given the full
    ``(Ni, Nj)`` plane.  |di|, |dj| <= 1."""
    ni, nj = f.shape
    return f[1 + di : ni - 1 + di, 1 + dj : nj - 1 + dj]


def interior_apply(coeffs: ELCoefficients, u: jnp.ndarray) -> jnp.ndarray:
    """Apply the interior EL equations to a full-grid field stack.

    ``u`` has shape ``(3, Ni, Nj)``; the result has interior shape
    ``(3, Ni-2, Nj-2)``.
    """
    ux, uy, g = u[0], u[1], u[2]
    c = coeffs
    a_s = c.speed_alpha
    a_r = c.remodelling_alpha

    # u_x equation (ref :843-889)
    y_ux = (
        c.diag_x * _shift(ux, 0, 0)
        + c.cross * _shift(uy, 0, 0)
        + c.adv_xm * _shift(ux, -1, 0)
        + c.adv_xp * _shift(ux, +1, 0)
        + a_s * (_shift(ux, 0, -1) + _shift(ux, 0, +1))
        + c.gx * (_shift(uy, 0, +1) - _shift(uy, 0, -1))
        + c.gy * (_shift(uy, +1, 0) - _shift(uy, -1, 0))
        + c.quart
        * (_shift(uy, -1, -1) + _shift(uy, +1, +1) - _shift(uy, -1, +1) - _shift(uy, +1, -1))
        + c.half_I * (_shift(g, -1, 0) - _shift(g, +1, 0))
    )

    # u_y equation (ref :892-938)
    y_uy = (
        c.diag_y * _shift(uy, 0, 0)
        + c.cross * _shift(ux, 0, 0)
        + c.adv_ym * _shift(uy, 0, -1)
        + c.adv_yp * _shift(uy, 0, +1)
        + a_s * (_shift(uy, -1, 0) + _shift(uy, +1, 0))
        + c.gy * (_shift(ux, +1, 0) - _shift(ux, -1, 0))
        + c.gx * (_shift(ux, 0, +1) - _shift(ux, 0, -1))
        + c.quart
        * (_shift(ux, -1, -1) + _shift(ux, +1, +1) - _shift(ux, -1, +1) - _shift(ux, +1, -1))
        + c.half_I * (_shift(g, 0, -1) - _shift(g, 0, +1))
    )

    # gamma equation (ref :940-962)
    y_g = (
        (-1.0 - 4.0 * a_r) * _shift(g, 0, 0)
        + c.dIdx * _shift(ux, 0, 0)
        + c.dIdy * _shift(uy, 0, 0)
        + a_r * (_shift(g, -1, 0) + _shift(g, +1, 0) + _shift(g, 0, -1) + _shift(g, 0, +1))
        + c.half_I * (_shift(ux, +1, 0) - _shift(ux, -1, 0))
        + c.half_I * (_shift(uy, 0, +1) - _shift(uy, 0, -1))
    )

    return jnp.stack([y_ux, y_uy, y_g])


def el_matvec(coeffs: ELCoefficients, u: jnp.ndarray) -> jnp.ndarray:
    """y = A u for the full EL operator including boundary rows.

    ``u`` and ``y`` have shape ``(3, Ni, Nj)``.
    """
    y_int = interior_apply(coeffs, u)
    y = jnp.zeros_like(u)
    y = y.at[:, 1:-1, 1:-1].set(y_int)

    # Boundary rows: mirror constraints (ref :964-1070).  Top/bottom edges,
    # then left/right columns on interior i; corners accumulate both mirror
    # terms (the reference's boundary writers overlap there).
    y = y.at[:, 0, :].set(u[:, 0, :] - u[:, 2, :])
    y = y.at[:, -1, :].set(u[:, -1, :] - u[:, -3, :])
    y = y.at[:, 1:-1, 0].set(u[:, 1:-1, 0] - u[:, 1:-1, 2])
    y = y.at[:, 1:-1, -1].set(u[:, 1:-1, -1] - u[:, 1:-1, -3])
    y = y.at[:, 0, 0].add(-u[:, 0, 2])
    y = y.at[:, 0, -1].add(-u[:, 0, -3])
    y = y.at[:, -1, 0].add(-u[:, -1, 2])
    y = y.at[:, -1, -1].add(-u[:, -1, -3])
    return y


def block_jacobi_inverse_apply(coeffs: ELCoefficients, r: jnp.ndarray) -> jnp.ndarray:
    """Apply the inverse of the per-pixel 3x3 diagonal block of A.

    This is the TPU-native analogue of PETSc's block-Jacobi with block size
    3 (ref :1104, :1090).  The interior block is

        [[a,     c,     0 ],
         [c,     b,     0 ],
         [dIdx,  dIdy,  gD]]

    (a = diag_x, b = diag_y, c = cross, gD = -1 - 4*alpha_r); boundary
    pixels have identity blocks.  The block is lower-block-triangular in
    (velocity | gamma), so the inverse is closed-form elementwise math.
    """
    c = coeffs
    r1, r2, r3 = r[0, 1:-1, 1:-1], r[1, 1:-1, 1:-1], r[2, 1:-1, 1:-1]
    a, b, cc = c.diag_x, c.diag_y, c.cross
    det = a * b - cc * cc
    gD = -1.0 - 4.0 * c.remodelling_alpha
    x1 = (b * r1 - cc * r2) / det
    x2 = (a * r2 - cc * r1) / det
    x3 = (r3 - c.dIdx * x1 - c.dIdy * x2) / gD

    out = r  # boundary entries pass through (identity blocks)
    out = out.at[0, 1:-1, 1:-1].set(x1)
    out = out.at[1, 1:-1, 1:-1].set(x2)
    out = out.at[2, 1:-1, 1:-1].set(x3)
    return out


# ---------------------------------------------------------------------------
# Reduced (interior-only) system
#
# The mirror-constraint boundary rows are *exactly* eliminable: every
# boundary unknown is a fixed linear combination of interior unknowns
# (edges mirror one interior value; corners are the sum of two edge mirrors,
# i.e. twice the diagonal interior value).  Folding them in turns the full
# system into a pure 9-point / 3-field stencil system on the interior grid
# — the natural form for multigrid and for Pallas tiling.  The reduction is
# verified exact against the assembled full system in tests/test_elop.py.
# ---------------------------------------------------------------------------


def _extend_with_corners(u_int: jnp.ndarray, corner_factor: float) -> jnp.ndarray:
    """Surround an interior stack with mirror boundary values, corners
    scaled by ``corner_factor``.  Built from concatenations of slices —
    deliberately NOT chained ``.at[].set`` updates, which the XLA SPMD
    partitioner miscompiles on sharded arrays (jax 0.9: chained scatters
    on a ('tx','ty')-sharded array silently produce wrong boundary values;
    concatenation lowers to pad/slice which partitions correctly —
    regression-tested in tests/test_parallel.py)."""
    left = u_int[:, :, 1:2]
    right = u_int[:, :, -2:-1]
    wide = jnp.concatenate([left, u_int, right], axis=2)
    top = jnp.concatenate(
        [corner_factor * u_int[:, 1:2, 1:2], u_int[:, 1:2, :],
         corner_factor * u_int[:, 1:2, -2:-1]],
        axis=2,
    )
    bottom = jnp.concatenate(
        [corner_factor * u_int[:, -2:-1, 1:2], u_int[:, -2:-1, :],
         corner_factor * u_int[:, -2:-1, -2:-1]],
        axis=2,
    )
    return jnp.concatenate([top, wide, bottom], axis=1)


def extend_interior(u_int: jnp.ndarray) -> jnp.ndarray:
    """Extend an interior field stack ``(3, Ni-2, Nj-2)`` to the full grid
    using the boundary constraints (edge mirror; corner = sum of both
    mirrors = 2x the diagonal interior value)."""
    return _extend_with_corners(u_int, 2.0)


def el_matvec_reduced(coeffs: ELCoefficients, u_int: jnp.ndarray) -> jnp.ndarray:
    """y = A_reduced u on the interior grid (boundary rows folded in)."""
    return interior_apply(coeffs, extend_interior(u_int))


def embed_interior(u_int: jnp.ndarray) -> jnp.ndarray:
    """Place an interior solution into the full grid and fill the boundary
    with the reference's post-solve mirror fix-up (ref :1163-1166) — note
    corners take the *single* mirror value here, matching
    ``apply_constant_boundary_condition``, not the doubled constraint value.
    """
    return _extend_with_corners(u_int, 1.0)


def diag_blocks(coeffs: ELCoefficients):
    """The per-pixel 3x3 diagonal blocks of the (reduced or full) interior
    operator, shape ``(Ni-2, Nj-2, 3, 3)``.  Boundary folding never touches
    same-pixel entries, so these serve both systems."""
    c = coeffs
    z = jnp.zeros_like(c.diag_x)
    gD = -1.0 - 4.0 * c.remodelling_alpha + z
    row0 = jnp.stack([c.diag_x, c.cross, z], axis=-1)
    row1 = jnp.stack([c.cross, c.diag_y, z], axis=-1)
    row2 = jnp.stack([c.dIdx, c.dIdy, gD], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def block_jacobi_inverse_apply_interior(coeffs: ELCoefficients, r: jnp.ndarray) -> jnp.ndarray:
    """Interior-grid block-Jacobi preconditioner apply: ``r`` is
    ``(3, Ni-2, Nj-2)``."""
    c = coeffs
    r1, r2, r3 = r[0], r[1], r[2]
    a, b, cc = c.diag_x, c.diag_y, c.cross
    det = a * b - cc * cc
    gD = -1.0 - 4.0 * c.remodelling_alpha
    x1 = (b * r1 - cc * r2) / det
    x2 = (a * r2 - cc * r1) / det
    x3 = (r3 - c.dIdx * x1 - c.dIdy * x2) / gD
    return jnp.stack([x1, x2, x3])
