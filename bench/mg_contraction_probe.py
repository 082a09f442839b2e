"""Measure the raw contraction factor of the MG V-cycle as a stationary
iteration (Richardson: x += V(b - A x)) on the bench system, per dtype —
isolates 'is the f32 hierarchy still a contraction at scale?' from
BiCGStab recurrence effects.

Usage: python bench/mg_contraction_probe.py <dim> <f32|f64> [iters]
"""

import sys
import time

sys.path.insert(0, ".")

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import functools

import jax.numpy as jnp
import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        sys.argv[2] if len(sys.argv) > 2 else "f32"
    ]
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    from opticalflow_tpu.ops import elop
    from opticalflow_tpu.solve import multigrid

    movie, _ = make_movie(2, dim, np.float64)
    prev = jnp.asarray(movie[0], dtype)
    cur = jnp.asarray(movie[1], dtype)

    # mirror solve_frame_pair's normalisation
    s = jnp.max(jnp.abs(prev))
    pair = elop.compute_frame_pair_data(
        prev / s, cur / s, jnp.asarray(ALPHA_S, dtype) / s**2,
        jnp.asarray(ALPHA_R, dtype), "compat",
    )
    mv = functools.partial(elop.el_matvec_reduced, pair.coeffs)
    b = pair.rhs[:, 1:-1, 1:-1]
    m, n = b.shape[1], b.shape[2]

    @jax.jit
    def run():
        h = multigrid.setup(mv, elop.diag_blocks(pair.coeffs), m, n, b.dtype,
                            min_size=int(os.environ.get('MG_MIN_SIZE', '8')))
        x = jnp.zeros_like(b)

        def step(x, _):
            r = b - mv(x)
            x = x + multigrid.v_cycle(h, r)
            rn = jnp.sqrt(jnp.sum((r.astype(jnp.float64)) ** 2))
            return x, rn

        x, rns = jax.lax.scan(step, x, None, length=n_iters)
        return rns

    t0 = time.perf_counter()
    rns = np.asarray(run())
    print(f"dim={dim} dtype={sys.argv[2]}: wall={time.perf_counter()-t0:.1f}s")
    ratios = rns[1:] / rns[:-1]
    for k in range(0, n_iters, max(1, n_iters // 15)):
        print(f"  it {k:3d}: ||r||={rns[k]:.4e}"
              + (f"  ratio={ratios[k-1]:.3f}" if k else ""))
    print(f"  final ||r||={rns[-1]:.4e}, last-5 geo-mean ratio="
          f"{np.exp(np.mean(np.log(ratios[-5:]))):.3f}")


if __name__ == "__main__":
    main()


# extra knob via env: MG_MIN_SIZE truncates hierarchy depth
