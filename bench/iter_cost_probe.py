"""Per-iteration cost split of the batched 256^2 solve (round 4).

Forces fixed iteration counts (rtol ~ 0) and differences wall times at two
max_iteration values to get the marginal per-iteration cost under each
preconditioner — separating matvec, V-cycle fine level, V-cycle coarse
levels, and fixed overhead (setup + refinement machinery off).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R

DIM = 256
N_PAIRS = 12


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import _solve_movie

    movie, _ = make_movie(N_PAIRS + 1, DIM, np.float64)
    mov = jax.device_put(jnp.asarray(movie, jnp.float32))
    u0 = jnp.zeros((3, DIM, DIM), jnp.float32)

    def run(precond, max_it, matvec_impl):
        all_u, infos = _solve_movie(
            mov, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            "compat", "bicgstab", precond, 1e-12, max_it, True, "cold",
            matvec_impl, 0, 1e-30, 0.2, 32, 0.25,
        )
        jax.block_until_ready(all_u)
        return infos

    for precond in ("multigrid", "block_jacobi"):
        for impl in ("pallas", "xla"):
            ts = {}
            for max_it in (10, 30):
                run(precond, max_it, impl)  # compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    run(precond, max_it, impl)
                    best = min(best, time.perf_counter() - t0)
                ts[max_it] = best
            per_iter = (ts[30] - ts[10]) / 20
            fixed = ts[10] - 10 * per_iter
            print(
                f"{precond:12s} {impl:6s} per-batched-iter {per_iter*1e3:7.2f} ms  "
                f"fixed {fixed*1e3:7.1f} ms  (t10={ts[10]:.3f} t30={ts[30]:.3f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
