"""Cold vs two-pass warm start on the bench workload (round 4, on-chip).

Measures device-resident throughput and per-pair iteration counts of the
12-pair 256^2 batch under warm_start='cold' vs 'two-pass', plus EPE of a
*batched* pair (pair 1) against its own f64 direct oracle — so the number
covers the vmapped refinement path, not the solo pass.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, _direct_f64_fields, ALPHA_S, ALPHA_R, RTOL

DIM = 256
N_PAIRS = 12
EXIT_FACTOR = 0.1


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import _solve_movie

    movie, _ = make_movie(N_PAIRS + 1, DIM, np.float64)
    t0 = time.time()
    ref1 = jax.device_put(jnp.asarray(_direct_f64_fields(movie, 1), jnp.float32))
    print(f"# oracle pair1 spsolve: {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    movs = [jax.device_put(jnp.asarray(movie, jnp.float32))]
    for _ in range(3):
        movs.append(jax.device_put(
            jnp.asarray(movie + rng.normal(0, 1e-4, movie.shape), jnp.float32)))
    u0 = jnp.zeros((3, DIM, DIM), jnp.float32)

    @jax.jit
    def epe_pair1(all_u, ref):
        d = all_u[1] - ref
        return jnp.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max()

    for ws in ("cold", "two-pass"):
        def run(mov):
            all_u, infos = _solve_movie(
                mov, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
                "compat", "bicgstab", "multigrid", RTOL, 1000, True, ws,
                "auto", 8, 300.0, 0.2, 32, EXIT_FACTOR,
            )
            return all_u, infos

        t0 = time.time()
        all_u, infos = run(movs[0])
        jax.block_until_ready(all_u)
        print(f"# {ws}: compile+first {time.time()-t0:.0f}s", flush=True)
        times = []
        for rep in range(6):
            mov = movs[rep % len(movs)]
            t0 = time.perf_counter()
            all_u, _ = run(mov)
            jax.block_until_ready(all_u)
            times.append(time.perf_counter() - t0)
        all_u, infos = run(movs[0])
        epe = float(epe_pair1(all_u, ref1))
        iters = np.asarray(infos["iterations"])
        conv = int(np.asarray(infos["converged"]).sum())
        med, best = float(np.median(times)), float(np.min(times))
        print(
            f"{ws:9s} pairs/s med={N_PAIRS/med:6.2f} best={N_PAIRS/best:6.2f} "
            f"epe_pair1={epe:.2e} iters={list(map(int, iters))} conv={conv}/{N_PAIRS}",
            flush=True,
        )


if __name__ == "__main__":
    main()
