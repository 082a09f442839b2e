"""Accuracy/throughput experiment: EPE vs f64 direct as a function of the
f32 solver knobs (tol floor, refinement restarts, matvec impl).

Round-3 investigation of the VERDICT #1 regression: BENCH_r02 measured
EPE 3.0e-3 px at 37.3 pairs/s with tol_floor=1000*eps(f32) (~1.2e-4
effective rtol).  This sweep maps the (floor, restarts) plane so the
production default can be set to the fastest point under 1e-3 px.

Usage: python bench/accuracy_sweep.py [--dim 256] [--pairs 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import make_movie, numpy_pair_data, ALPHA_S, ALPHA_R, RTOL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--pairs", type=int, default=12)
    ap.add_argument("--floors", type=float, nargs="+", default=[1000.0, 300.0, 100.0, 30.0])
    ap.add_argument("--restarts", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--matvec", type=str, default="auto")
    ap.add_argument("--refine-rtol", type=float, default=0.05)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla

    from opticalflow_tpu.flow.variational import _solve_movie
    from opticalflow_tpu.solve.direct import assemble_el_matrix, fields_to_flat, flat_to_fields

    movie, _ = make_movie(args.pairs + 1, args.dim, np.float64)

    # f64 oracle solution for pair 0
    coeffs, rhs = numpy_pair_data(movie[0], movie[1], ALPHA_S, ALPHA_R)
    mat = assemble_el_matrix(coeffs, movie.shape[1], movie.shape[2]).tocsr()
    x = spla.spsolve(mat, fields_to_flat(rhs))
    u_ref = flat_to_fields(x, movie.shape[1], movie.shape[2])

    def run(floor, restarts):
        def solve(mov):
            all_u, infos = _solve_movie(
                jnp.asarray(mov, dtype=jnp.float32),
                jnp.zeros((3, movie.shape[1], movie.shape[2]), jnp.float32),
                jnp.float32(ALPHA_S),
                jnp.float32(ALPHA_R),
                "compat",
                "bicgstab",
                "multigrid",
                RTOL,
                1000,
                True,
                "cold",
                args.matvec,
                restarts,
                floor,
                args.refine_rtol,
            )
            jax.block_until_ready(all_u)
            return all_u, infos

        solve(movie)  # compile
        rng = np.random.default_rng(0)
        times = []
        for _ in range(3):
            mov = movie + rng.normal(0.0, 1e-4, movie.shape)
            t0 = time.perf_counter()
            solve(mov)
            times.append(time.perf_counter() - t0)
        all_u, infos = solve(movie)
        dt = float(np.median(times))
        fps = (movie.shape[0] - 1) / dt
        u = np.asarray(all_u)
        d = u[0] - u_ref
        epe = float(np.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max())
        iters = np.asarray(infos["iterations"])
        return fps, epe, iters

    print(f"dim={args.dim} pairs={args.pairs} matvec={args.matvec}")
    print(f"{'floor':>8} {'restarts':>8} {'pairs/s':>9} {'EPE px':>10} iters")
    for floor in args.floors:
        for restarts in args.restarts:
            fps, epe, iters = run(floor, restarts)
            print(f"{floor:8.0f} {restarts:8d} {fps:9.2f} {epe:10.2e} "
                  f"med={int(np.median(iters))} max={int(iters.max())}")


if __name__ == "__main__":
    main()
