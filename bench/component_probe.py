"""In-dispatch component timing of the 256^2 batched solve (round 4).

Times each hot component by chaining N applications inside ONE jitted
scan (so axon-tunnel dispatch RTT cannot contaminate), on the real chip:

* fused Pallas matvec (with and without the R->P bridge) — also yields
  the achieved-HBM-bandwidth number vs the ~7-plane traffic model
  (VERDICT r3 item #5);
* multigrid V-cycle (the preconditioner application);
* one full BiCGStab iteration-equivalent (2 matvecs + 2 V-cycles + dots);
* the df32 true-residual evaluation (refinement step cost).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import make_movie, ALPHA_S, ALPHA_R

DIM = 256
BATCH = 12
N_INNER = 50


def timeit(fn, *args, reps=5):
    import jax

    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from opticalflow_tpu.ops import elop, pallas_kernels
    from opticalflow_tpu.solve import multigrid

    movie, _ = make_movie(BATCH + 1, DIM, np.float64)
    prevs = jax.device_put(jnp.asarray(movie[:-1], jnp.float32))
    curs = jax.device_put(jnp.asarray(movie[1:], jnp.float32))

    eps = jnp.float32(1e-20)

    # ---- batched pallas matvec chain (P -> R -> P with bridge) ----
    @jax.jit
    def chain_pallas(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            pops = pallas_kernels.make_padded_ops(
                p / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R)
            )
            x0 = pops.extend_pad(jnp.ones((3, DIM - 2, DIM - 2), jnp.float32))

            def body(x, _):
                y = pops.matvec(x)
                x = x + eps * pops.extend_pad(pops.slice_residual(y))
                return x, None

            x, _ = lax.scan(body, x0, None, length=N_INNER)
            return x

        return jax.vmap(per_pair)(prev, cur)

    # ---- bridge only ----
    @jax.jit
    def chain_bridge(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            pops = pallas_kernels.make_padded_ops(
                p / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R)
            )
            x0 = pops.extend_pad(jnp.ones((3, DIM - 2, DIM - 2), jnp.float32))

            def body(x, _):
                x = x + eps * pops.extend_pad(pops.slice_residual(x[:, :DIM - 2 + 16, :]
                                                                  [:, 8:8 + DIM - 2, :]))
                return x, None

            x, _ = lax.scan(body, x0, None, length=N_INNER)
            return x

        return jax.vmap(per_pair)(prev, cur)

    # ---- XLA matvec chain (interior layout) ----
    @jax.jit
    def chain_xla(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            pair = elop.compute_frame_pair_data(
                p / s, c / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R)
            )
            x0 = jnp.ones((3, DIM - 2, DIM - 2), jnp.float32)

            def body(x, _):
                y = elop.el_matvec_reduced(pair.coeffs, x)
                return x + eps * y, None

            x, _ = lax.scan(body, x0, None, length=N_INNER)
            return x

        return jax.vmap(per_pair)(prev, cur)

    # ---- V-cycle chain ----
    @jax.jit
    def chain_vcycle(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            pair = elop.compute_frame_pair_data(
                p / s, c / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R)
            )
            mv = functools.partial(elop.el_matvec_reduced, pair.coeffs)
            h = multigrid.setup(
                mv, elop.diag_blocks(pair.coeffs), DIM - 2, DIM - 2, jnp.float32
            )
            b0 = jnp.ones((3, DIM - 2, DIM - 2), jnp.float32)

            def body(b, _):
                y = multigrid.v_cycle(h, b)
                return b + eps * y, None

            b, _ = lax.scan(body, b0, None, length=N_INNER)
            return b

        return jax.vmap(per_pair)(prev, cur)

    # ---- MG setup alone (no chain; once per pair) ----
    @jax.jit
    def mg_setup_once(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            pair = elop.compute_frame_pair_data(
                p / s, c / s, jnp.float32(ALPHA_S) / s**2, jnp.float32(ALPHA_R)
            )
            mv = functools.partial(elop.el_matvec_reduced, pair.coeffs)
            h = multigrid.setup(
                mv, elop.diag_blocks(pair.coeffs), DIM - 2, DIM - 2, jnp.float32
            )
            b0 = jnp.ones((3, DIM - 2, DIM - 2), jnp.float32)
            return multigrid.v_cycle(h, b0)

        return jax.vmap(per_pair)(prev, curs)

    # ---- df32 residual chain ----
    @jax.jit
    def chain_df(prev, cur):
        def per_pair(p, c):
            s = jnp.max(jnp.abs(p))
            dfd = elop.compute_frame_pair_data_df(
                p, c, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R), "compat", s
            )
            x0 = jnp.ones((3, DIM - 2, DIM - 2), jnp.float32)

            def body(x, _):
                r = elop.el_residual_df(dfd, x, jnp.zeros_like(x))
                return x + eps * r, None

            x, _ = lax.scan(body, x0, None, length=N_INNER)
            return x

        return jax.vmap(per_pair)(prev, cur)

    results = {}
    for name, fn in [
        ("pallas_matvec+bridge", chain_pallas),
        ("bridge_only", chain_bridge),
        ("xla_matvec", chain_xla),
        ("v_cycle", chain_vcycle),
        ("df32_residual", chain_df),
    ]:
        t = timeit(fn, prevs, curs)
        per_app_us = t / N_INNER / 1 * 1e6  # per batched application (12 pairs)
        results[name] = per_app_us
        print(f"{name:22s} {per_app_us:9.1f} us per batched application "
              f"({per_app_us/BATCH:7.2f} us/pair)", flush=True)

    t_setup = timeit(mg_setup_once, prevs, curs)
    print(f"{'mg_setup+1vcycle':22s} {t_setup*1e6:9.1f} us total (once per batch)",
          flush=True)

    # speed-of-light: kernel traffic model = 7 planes of (m x n) f32 per
    # pair per application (I + 3 in + 3 out; coefficients rebuilt on-VPU)
    m = n = DIM - 2
    kernel_us = results["pallas_matvec+bridge"] - results["bridge_only"]
    bytes_per_app = BATCH * 7 * m * n * 4
    gbps = bytes_per_app / (kernel_us * 1e-6) / 1e9
    print(f"\nkernel-only: {kernel_us:.1f} us/batched app -> {gbps:.0f} GB/s achieved "
          f"(v5e peak ~819 GB/s -> {100*gbps/819:.0f}% of HBM speed-of-light)",
          flush=True)


if __name__ == "__main__":
    main()
