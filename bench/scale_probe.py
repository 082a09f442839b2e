"""One-off probe: solve times at 512^2 / 1024^2 on the session backend,
plus f64 spsolve oracle timing at 512^2.  Informs bench.py's
reference-scale workload parameters (VERDICT r2 item #2)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, numpy_pair_data, ALPHA_S, ALPHA_R, RTOL


def tpu_solve(movie, n_pairs, label):
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import _solve_movie

    mov = jnp.asarray(movie[: n_pairs + 1], jnp.float32)
    u0 = jnp.zeros((3, movie.shape[1], movie.shape[2]), jnp.float32)

    def run(m):
        all_u, infos = _solve_movie(
            m, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            "compat", "bicgstab", "multigrid", RTOL, 1000, True, "cold",
        )
        jax.block_until_ready(all_u)
        return all_u, infos

    t0 = time.perf_counter()
    all_u, infos = run(mov)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    all_u, infos = run(mov + 1e-4)
    dt = time.perf_counter() - t0
    print(f"{label}: compile+run {t_compile:.1f}s, steady {dt:.2f}s "
          f"({n_pairs / dt:.2f} pairs/s), iters={np.asarray(infos['iterations'])}, "
          f"res={np.asarray(infos['residual_norm'])}, conv={np.asarray(infos['converged'])}",
          flush=True)
    return np.asarray(all_u)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "512"):
        movie, _ = make_movie(3, 512, np.float64)
        u = tpu_solve(movie, 2, "512^2 x2")
    if which in ("all", "1024"):
        movie, _ = make_movie(2, 1024, np.float64)
        u = tpu_solve(movie, 1, "1024^2 x1")
    if which in ("all", "spsolve512"):
        import scipy.sparse.linalg as spla
        from opticalflow_tpu.solve.direct import assemble_el_matrix, fields_to_flat

        movie, _ = make_movie(2, 512, np.float64)
        t0 = time.perf_counter()
        coeffs, rhs = numpy_pair_data(movie[0], movie[1], ALPHA_S, ALPHA_R)
        mat = assemble_el_matrix(coeffs, 512, 512).tocsc()
        x = spla.spsolve(mat, fields_to_flat(rhs))
        print(f"spsolve 512^2: {time.perf_counter() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
