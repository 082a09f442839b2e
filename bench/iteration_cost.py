"""Per-BiCGStab-iteration cost via the slope of solve time vs fixed
iteration count (rtol below the f32 floor so max_iterations is binding) —
amortizes compile/dispatch/tunnel overhead exactly as the real workload
does.  Uses the public API (``variational_optical_flow`` + ``SolverConfig``).

Run from the repo root: ``python bench/iteration_cost.py <dim> <batch>``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from opticalflow_tpu import SolverConfig, variational_optical_flow
from opticalflow_tpu.core.synth import make_translating_blob_movie

A_S = A_R = 1000.0


def solve_time(movie, matvec, precond, iters, reps=3):
    def run(mov):
        return variational_optical_flow(
            mov,
            speed_alpha=A_S,
            remodelling_alpha=A_R,
            warm_start="cold",
            solver=SolverConfig(
                matvec=matvec, preconditioner=precond, rtol=1e-30,
                max_iterations=iters, dtype_tol_floor=0.0,
                refinement_restarts=0,
            ),
            dtype=np.float32,
        )

    infos = run(movie)  # compile
    # vmapped while_loop runs until every lane's cond fails -> the max
    # over the batch is the runtime-determining iteration count
    its = int(np.asarray(infos["iterations"]).max())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(movie)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), its


def profile(dim, batch):
    movie, _ = make_translating_blob_movie(
        n_frames=batch + 1, dimension=dim, width=20.0, sigma=3.0,
        v_x=0.15, v_y=0.1, dtype=np.float32)
    movie = np.asarray(movie) * 100.0
    print(f"\n=== dim={dim} batch={batch} ===")
    for precond in ("multigrid",):
        for matvec in ("xla", "pallas"):
            lo, hi = 3, 9
            t_lo, i_lo = solve_time(movie, matvec, precond, lo)
            t_hi, i_hi = solve_time(movie, matvec, precond, hi)
            per_it = (t_hi - t_lo) / (i_hi - i_lo)
            fixed = t_lo - per_it * i_lo
            print(f"{precond:12s} {matvec:6s}: {per_it*1e3:8.2f} ms/iter "
                  f"(fixed {fixed*1e3:7.1f} ms; t[{i_lo}it]={t_lo*1e3:7.1f} t[{i_hi}it]={t_hi*1e3:7.1f})",
                  flush=True)


if __name__ == "__main__":
    profile(int(sys.argv[1]), int(sys.argv[2]))
