"""Scratch: pallas vs xla matvec at 256^2 and 1024^2, cold vs sequential."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
import jax.numpy as jnp
from opticalflow_tpu.core.synth import make_translating_blob_movie
from opticalflow_tpu.flow.variational import _solve_movie

ALPHA_S = ALPHA_R = 1000.0


def run_cfg(dim, n_pairs, matvec, warm="cold", n_rep=3):
    movie, _ = make_translating_blob_movie(
        n_frames=n_pairs + 1, dimension=dim, width=20.0, sigma=3.0,
        v_x=0.15, v_y=0.1, dtype=np.float32)
    movie = np.asarray(movie) * 100.0
    def run(mov):
        all_u, infos = _solve_movie(
            jnp.asarray(mov, jnp.float32),
            jnp.zeros((3, dim, dim), jnp.float32),
            jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            "compat", "bicgstab", "multigrid", 1e-6, 1000, True, warm, matvec)
        jax.block_until_ready(all_u)
        return all_u, infos
    t0 = time.perf_counter()
    u, infos = run(movie)
    compile_t = time.perf_counter() - t0
    rng = np.random.default_rng(0)
    times = []
    for _ in range(n_rep):
        mov = movie + rng.normal(0.0, 1e-4, movie.shape).astype(np.float32)
        t0 = time.perf_counter()
        u, infos = run(mov)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    iters = np.asarray(infos["iterations"])
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
