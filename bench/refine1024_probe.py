"""Instrumented 1024^2 refinement-trajectory probe (round 4).

The bench's 1024^2 FGMRES+MG+df32-refinement solve converges only
marginally (residual plateau ~2e-3 abs, input-sensitive).  This probe
replays the solver's exact refinement loop from the host, printing the
df32 true-residual trajectory and each correction solve's iteration
count / achieved reduction — to see WHERE the contraction dies.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R

DIM = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SWEEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
RESTART = int(sys.argv[3]) if len(sys.argv) > 3 else 32
CORR_RTOL = float(sys.argv[4]) if len(sys.argv) > 4 else 0.2
PERTURB = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
WIDTH_SCALE = int(sys.argv[6]) if len(sys.argv) > 6 else 0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from opticalflow_tpu.ops import df32, elop
    from opticalflow_tpu.solve import krylov, multigrid

    if WIDTH_SCALE:
        from opticalflow_tpu.core.synth import make_translating_blob_movie
        movie, _ = make_translating_blob_movie(
            n_frames=2, dimension=DIM, width=20.0 * DIM / 256, sigma=3.0,
            v_x=0.15, v_y=0.1, dtype=np.float64)
        movie = np.asarray(np.asarray(movie, np.float64) * 100.0, np.float32).astype(np.float64)
    else:
        movie, _ = make_movie(2, DIM, np.float64)
    movie[0] += PERTURB
    prev = jax.device_put(jnp.asarray(movie[0], jnp.float32))
    cur = jax.device_put(jnp.asarray(movie[1], jnp.float32))
    m = n = DIM - 2

    with jax.default_matmul_precision("highest"):

        @jax.jit
        def main_solve(p, c):
            s = jnp.maximum(jnp.max(jnp.abs(p)), 1e-30)
            pair = elop.compute_frame_pair_data(
                p / s, c / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R),
                "compat")
            mv = functools.partial(elop.el_matvec_reduced, pair.coeffs)
            b = pair.rhs[:, 1:-1, 1:-1]
            h = multigrid.setup(mv, elop.diag_blocks(pair.coeffs), m, n, jnp.float32)
            pc = functools.partial(multigrid.v_cycle, h, sweeps=SWEEPS)
            res = krylov.fgmres(mv, b, precond=pc, rtol=1e-6,
                                max_iterations=1000, restart=RESTART)
            b_norm = jnp.sqrt(jnp.sum(b * b))
            return res.x, res.iterations, res.residual_norm, b_norm, s

        @jax.jit
        def df_resid(p, c, s, x_hi, x_lo):
            dfd = elop.compute_frame_pair_data_df(
                p, c, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R), "compat", s)
            r = elop.el_residual_df(dfd, x_hi, x_lo)
            return r, jnp.sqrt(jnp.sum(r.astype(jnp.float32) ** 2))

        @jax.jit
        def corr_solve(p, c, s, r):
            sn = jnp.maximum(jnp.max(jnp.abs(p)), 1e-30)
            pair = elop.compute_frame_pair_data(
                p / sn, c / sn, jnp.float32(ALPHA_S) / sn**2, jnp.float32(ALPHA_R),
                "compat")
            mv_f = functools.partial(elop.el_matvec_reduced, pair.coeffs)
            h = multigrid.setup(mv_f, elop.diag_blocks(pair.coeffs), m, n, jnp.float32)
            pc = functools.partial(multigrid.v_cycle, h, sweeps=SWEEPS)
            dfd = elop.compute_frame_pair_data_df(
                p, c, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R), "compat", s)
            mv_c = functools.partial(elop.el_matvec_df, dfd)
            res = krylov.fgmres(mv_c, r, precond=pc, rtol=CORR_RTOL,
                                max_iterations=1000, restart=RESTART)
            return res.x, res.iterations, res.residual_norm, jnp.sqrt(jnp.sum(r * r))

    t0 = time.time()
    x, iters, rnorm, b_norm, s = main_solve(prev, cur)
    jax.block_until_ready(x)
    tol = max(1e-6, 300 * 1.1920929e-07) * float(b_norm)
    print(f"main: {time.time()-t0:.0f}s iters={int(iters)} f32_res={float(rnorm):.3e} "
          f"||b||={float(b_norm):.3e} tol={tol:.3e}", flush=True)

    x_hi = x
    x_lo = jnp.zeros_like(x)
    for step in range(10):
        r, rn = df_resid(prev, cur, s, x_hi, x_lo)
        print(f"step {step}: df32 true residual {float(rn):.3e} "
              f"({float(rn)/tol:.2f}x tol)", flush=True)
        if float(rn) <= 0.1 * tol:
            print("CONVERGED (0.1x tol)", flush=True)
            break
        d, ci, crn, crn0 = corr_solve(prev, cur, s, r)
        print(f"  corr: iters={int(ci)} reduction {float(crn)/float(crn0):.3f} "
              f"(target {CORR_RTOL})", flush=True)
        shi, e = df32.two_sum(x_hi, d)
        x_hi, x_lo = df32.fast_two_sum(shi, x_lo + e)


if __name__ == "__main__":
    main()
