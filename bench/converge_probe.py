"""Diagnose large-grid convergence: iterations vs size, dtype, and dot
precision, on the CPU backend where f64 is available.

Usage: python bench/converge_probe.py <dim> <dtype:f32|f64> [hp:0|1] [refine:N] [method]
"""

import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R, RTOL


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        sys.argv[2] if len(sys.argv) > 2 else "f32"
    ]
    hp = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    refine = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    method = sys.argv[5] if len(sys.argv) > 5 else "bicgstab"

    from opticalflow_tpu.flow.variational import solve_frame_pair

    movie, _ = make_movie(2, dim, np.float64)
    prev = jnp.asarray(movie[0], dtype)
    cur = jnp.asarray(movie[1], dtype)
    u0 = jnp.zeros((3, dim, dim), dtype)

    t0 = time.perf_counter()
    u, info = jax.jit(
        lambda p, c: solve_frame_pair(
            p, c, u0, jnp.asarray(ALPHA_S, dtype), jnp.asarray(ALPHA_R, dtype),
            method=method, preconditioner="multigrid", rtol=RTOL, max_iterations=1000,
            high_precision_reductions=hp, refinement_restarts=refine,
            matvec_impl="xla",
        )
    )(prev, cur)
    jax.block_until_ready(u)
    print(
        f"method={method} dim={dim} dtype={np.dtype(dtype.dtype if hasattr(dtype,'dtype') else dtype).name} "
        f"hp={hp} refine={refine}: iters={int(info['iterations'])}, "
        f"res={float(info['residual_norm']):.3e}, conv={bool(info['converged'])}, "
        f"wall={time.perf_counter() - t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
