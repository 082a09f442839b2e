"""On-chip tuning probe for the refinement exit factor (round 4).

Measures, on the session backend (the real TPU chip), the EPE-vs-throughput
trade of `refinement_exit_factor` on the exact bench workload (12-pair
vmapped 256^2 batch, pallas matvec, adaptive refinement), plus the solo
(unbatched) pair for comparison — closing VERDICT r3 item #2's blind spot.

Transfer-hygiene: the axon tunnel's device->host path is flaky (measured
sporadic multi-second stalls; 256KB fetches have taken 70 s), so every
heavy operand flows host->device (fast) and only scalars / tiny arrays
come back.  EPE is computed ON DEVICE against the uploaded f64-direct
oracle fields.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, _direct_f64_fields, ALPHA_S, ALPHA_R, RTOL

DIM = 256
N_PAIRS = 12


def main():
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import _solve_movie

    movie, _ = make_movie(N_PAIRS + 1, DIM, np.float64)

    t0 = time.time()
    u_ref0 = _direct_f64_fields(movie, 0)
    print(f"# oracle pair0 spsolve: {time.time() - t0:.1f}s", flush=True)

    # pre-upload: movie variants (perturbed so no layer can dedupe), oracle
    rng = np.random.default_rng(0)
    movs = [jax.device_put(jnp.asarray(movie, jnp.float32))]
    for _ in range(3):
        movs.append(
            jax.device_put(
                jnp.asarray(movie + rng.normal(0, 1e-4, movie.shape), jnp.float32)
            )
        )
    ref0 = jax.device_put(jnp.asarray(u_ref0, jnp.float32))
    u0 = jnp.zeros((3, DIM, DIM), jnp.float32)

    @jax.jit
    def epe_device(all_u, ref):
        d = all_u[0] - ref
        return jnp.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max()

    def run(mov, exit_factor):
        all_u, infos = _solve_movie(
            mov, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            "compat", "bicgstab", "multigrid", RTOL, 1000, True, "cold",
            "auto", 8, 300.0, 0.2, 32, exit_factor,
        )
        return all_u, infos

    # compile once (exit factor is traced — no recompiles across the sweep)
    t0 = time.time()
    all_u, infos = run(movs[0], 0.25)
    jax.block_until_ready(all_u)
    print(f"# compile+first run: {time.time() - t0:.1f}s", flush=True)

    for exit_factor in (0.25, 0.1, 0.05, 0.02, 0.01):
        times = []
        for rep in range(4):
            mov = movs[rep % len(movs)]
            t0 = time.perf_counter()
            all_u, infos = run(mov, exit_factor)
            jax.block_until_ready(all_u)
            times.append(time.perf_counter() - t0)
        all_u, infos = run(movs[0], exit_factor)
        epe = float(epe_device(all_u, ref0))
        iters = np.asarray(infos["iterations"])
        conv = int(np.asarray(infos["converged"]).sum())
        dt = float(np.median(times))
        print(
            f"exit={exit_factor:<5} pairs/s={N_PAIRS/dt:7.2f}  epe={epe:.2e}  "
            f"iters med/max={int(np.median(iters))}/{int(iters.max())}  "
            f"conv={conv}/{N_PAIRS}  times={[round(t,3) for t in times]}",
            flush=True,
        )

    # solo-pair comparison (the accuracy-gate configuration, on-chip)
    @jax.jit
    def solo(mov, exit_factor):
        from opticalflow_tpu.flow.variational import solve_frame_pair
        u, info = solve_frame_pair(
            mov[0], mov[1], u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            refinement_exit_factor=exit_factor,
        )
        return u, info

    u_solo, info = solo(movs[0], 0.25)
    jax.block_until_ready(u_solo)
    for exit_factor in (0.25, 0.05):
        u_solo, info = solo(movs[0], exit_factor)
        d = u_solo - ref0
        epe = float(jnp.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max())
        print(
            f"solo exit={exit_factor:<5} epe={epe:.2e} iters={int(info['iterations'])}",
            flush=True,
        )


if __name__ == "__main__":
    main()
