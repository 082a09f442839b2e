"""Pallas vs XLA matvec throughput at 256^2 and 1024^2, cold vs sequential
warm start, through the public API (``variational_optical_flow`` +
``SolverConfig(matvec=...)``).

Run from the repo root: ``python bench/matvec_compare.py``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from opticalflow_tpu import SolverConfig, variational_optical_flow
from opticalflow_tpu.core.synth import make_translating_blob_movie

ALPHA_S = ALPHA_R = 1000.0


def run_cfg(dim, n_pairs, matvec, warm="cold", n_rep=3):
    movie, _ = make_translating_blob_movie(
        n_frames=n_pairs + 1, dimension=dim, width=20.0, sigma=3.0,
        v_x=0.15, v_y=0.1, dtype=np.float32)
    movie = np.asarray(movie) * 100.0

    def run(mov):
        return variational_optical_flow(
            mov,
            speed_alpha=ALPHA_S,
            remodelling_alpha=ALPHA_R,
            warm_start=warm,
            solver=SolverConfig(matvec=matvec),
            dtype=np.float32,
        )

    t0 = time.perf_counter()
    res = run(movie)
    compile_t = time.perf_counter() - t0
    rng = np.random.default_rng(0)
    times = []
    for _ in range(n_rep):
        mov = movie + rng.normal(0.0, 1e-4, movie.shape).astype(np.float32)
        t0 = time.perf_counter()
        res = run(mov)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    iters = np.asarray(res["iterations"])
    print(f"dim={dim} pairs={n_pairs} matvec={matvec} warm={warm}: "
          f"{n_pairs/dt:.3f} pairs/s ({dt*1e3:.1f} ms), compile {compile_t:.1f}s, "
          f"iters={iters}", flush=True)
    return n_pairs / dt


if __name__ == "__main__":
    for matvec in ("xla", "pallas"):
        run_cfg(256, 12, matvec)
    for matvec in ("xla", "pallas"):
        run_cfg(1024, 2, matvec)
    # warm-start comparison at 256^2
    run_cfg(256, 12, "pallas", warm="sequential")
