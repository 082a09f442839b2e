"""Device meshes for distributed optical flow.

The reference is strictly serial (SURVEY.md section 2.4: sequential PETSc,
no MPI/NCCL anywhere).  The TPU engine's parallel axes are defined by the
workload's own structure:

* ``frames`` — frame-pair data parallelism (the reference's outer Python
  loops, ref optical_flow.py:83,791, become a sharded batch axis; across
  hosts this axis rides DCN);
* ``tx``, ``ty`` — 2-D spatial tiling of each image across chips (ICI).
  All stencils need <= 2-pixel halos; under ``jit`` the XLA SPMD
  partitioner inserts the halo collective-permutes automatically, and the
  Krylov dot products become cross-chip psums.

Pipeline/expert parallelism have no analogue in this workload (no layered
model, no experts) — spatial tiling + frame sharding are its "tensor
parallel" and "data parallel" equivalents; this is deliberate, not an
omission (SURVEY.md section 2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXES = ("frames", "tx", "ty")


def _factor(n: int) -> Tuple[int, int, int]:
    """Split n devices into (frames, tx, ty), preferring frame-pair
    parallelism first (it needs no halo traffic), then near-square tiles."""
    best = (n, 1, 1)
    # prefer a modest frames axis and square-ish tiling when n is large
    frames = n
    tx = ty = 1
    # peel factors of 2 into the tile axes once frames exceeds 4
    while frames % 2 == 0 and frames > 4:
        if tx <= ty:
            tx *= 2
        else:
            ty *= 2
        frames //= 2
    best = (frames, tx, ty)
    return best


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    frames: Optional[int] = None,
    tx: Optional[int] = None,
    ty: Optional[int] = None,
) -> Mesh:
    """Build a ('frames', 'tx', 'ty') mesh over the given devices.

    If the axis sizes are not given they are factored automatically.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if frames is None or tx is None or ty is None:
        frames, tx, ty = _factor(n)
    if frames * tx * ty != n:
        raise ValueError(f"mesh {frames}x{tx}x{ty} != {n} devices")
    dev_array = np.asarray(devices).reshape(frames, tx, ty)
    return Mesh(dev_array, AXES)


def pair_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-frame-pair image stacks (pairs, X, Y)."""
    return NamedSharding(mesh, PartitionSpec("frames", "tx", "ty"))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-pair field stacks (pairs, 3, X, Y)."""
    return NamedSharding(mesh, PartitionSpec("frames", None, "tx", "ty"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
