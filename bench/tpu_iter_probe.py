"""TPU-side iteration probe: main-solve iterations at a given size for a
chosen matvec implementation (refinement off, capped iterations).

Usage: python bench/tpu_iter_probe.py <dim> <matvec:xla|pallas> [max_it]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R, RTOL


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    matvec = sys.argv[2] if len(sys.argv) > 2 else "xla"
    max_it = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    method = sys.argv[4] if len(sys.argv) > 4 else "bicgstab"
    refine = int(sys.argv[5]) if len(sys.argv) > 5 else 0

    import jax
    import jax.numpy as jnp

    from opticalflow_tpu.flow.variational import solve_frame_pair

    movie, _ = make_movie(2, dim, np.float64)
    prev = jnp.asarray(movie[0], jnp.float32)
    cur = jnp.asarray(movie[1], jnp.float32)
    u0 = jnp.zeros((3, dim, dim), jnp.float32)

    t0 = time.perf_counter()
    u, info = jax.jit(
        lambda p, c: solve_frame_pair(
            p, c, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            method=method, preconditioner="multigrid", rtol=RTOL, max_iterations=max_it,
            high_precision_reductions=True, refinement_restarts=refine,
            matvec_impl=matvec,
        )
    )(prev, cur)
    jax.block_until_ready(u)
    print(
        f"dim={dim} matvec={matvec} method={method} refine={refine}: iters={int(info['iterations'])}, "
        f"res={float(info['residual_norm']):.3e}, conv={bool(info['converged'])}, "
        f"wall={time.perf_counter() - t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
