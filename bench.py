"""Benchmark harness — prints ONE JSON line for the driver.

North-star metric (BASELINE.json): frame-pairs/sec on the flagship
variational solve, plus flow EPE vs the f64 reference solution.

Round-4 redesign (VERDICT r3 items #1-#5) — the harness must be
un-killable and tunnel-proof:

* **Budgeted.** Every section checks a wall-clock budget
  (``BENCH_BUDGET_S``, default 500 s) before starting and is skipped —
  and recorded as skipped — if it does not fit.  A SIGTERM/SIGALRM
  safety handler prints the JSON assembled so far, so even an external
  kill cannot destroy the round's metric (r3 lost its record to rc 124).
* **Transfer-hygiene.**  The axon tunnel's device->host path is flaky
  (measured: sporadic multi-second stalls; one 256 KB fetch took 70 s
  while upload ran at >40 MB/s).  All heavy operands flow host->device;
  EPE is computed ON DEVICE against an uploaded f64-oracle field and
  only scalars / tiny arrays come back.  Device-resident throughput
  (device inputs, timed to completion) is the headline; end-to-end
  (host array in) is reported alongside.
* **Compile-cache warm.**  jax's persistent compilation cache is pointed
  at ``.jax_cache/`` in the repo, so a bench run after any prior run (or
  after the test/dev sessions that built the cache) skips the ~2-3 min
  remote AOT compiles entirely.

Workload: config-3 analogue — a 12-pair batch of a 256^2 synthetic movie
(the repo ships no data; BASELINE.md: the CPU baseline must be measured,
not quoted), full variational solve at practice-scale regularisation,
compat dy mode, production defaults (warm_start='two-pass',
refinement_exit_factor=0.1 — both tuned on-chip, see bench/refine_tune.py
and bench/warmstart_probe.py).

The CPU baseline is a faithful re-run harness of the reference pipeline
(/root/reference/source/optical_flow.py:829-1157): per frame pair,
vectorized assembly of the same 3N^2 sparse system in float64 solved with
SuperLU spsolve — the reference's own ``use_direct_solver`` path (ref
:1147; scipy ILU hits structurally zero pivots on these systems, and
numba/petsc4py are not installed in this image).  The vectorized assembly
is *faster* than the reference's lil-matrix writes, so the reported
speedup is conservative.
"""

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DIM = 256
N_PAIRS = 12  # best measured throughput point (batch=8/32 hit XLA batch pathologies)
ALPHA_S = 1000.0
ALPHA_R = 1000.0
RTOL = 1e-6
CPU_BASELINE_PAIRS = 1
EXIT_FACTOR = 0.1  # refinement exit (SolverConfig default; tuned on-chip)
HBM_PEAK_GBPS = 819.0  # TPU v5e

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))
_T0 = time.time()

RESULT = {
    "metric": f"variational_flow_{DIM}x{DIM}_frame_pairs_per_sec",
    "value": None,
    "unit": "frame-pairs/s",
    "vs_baseline": None,
}


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _emit_and_exit(signum, frame):
    RESULT["interrupted_at_s"] = round(time.time() - _T0, 1)
    print(json.dumps(RESULT), flush=True)
    os._exit(0)


def _install_safety():
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGALRM, _emit_and_exit)
    signal.alarm(int(BUDGET_S) + 90)


def _log(msg):
    print(f"# [{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def make_movie(n_frames, dim, dtype):
    from opticalflow_tpu.core.synth import make_translating_blob_movie

    # Blob width scales with the grid (20 px at <= 256^2 — the headline
    # workload is unchanged) so signal coverage stays representative of
    # real microscopy at every size: a fixed-width blob on a 1024^2
    # otherwise-zero frame degenerates the velocity equations to a pure
    # Laplacian over most of the image (no data term), which is a
    # condition-number corner case rather than BASELINE config 2's
    # "native-resolution actin pair" (real frames have structure across
    # the field).  Measured at 1024^2: the width-scaled pair's df32
    # refinement contracts at the target rate to 0.03x tol, while the
    # fixed-20px pair's correction solves stall above tol
    # (bench/refine1024_probe.py).  Below 256^2 the width stays 20 px —
    # shrinking it further enters the same low-coverage corner from the
    # other side (at width 10 on 128^2, ~1 pair in 12 is f32-unsolvable
    # and reports converged=False).
    movie, delta_x = make_translating_blob_movie(
        n_frames=n_frames, dimension=dim, width=20.0 * max(dim, 256) / 256,
        sigma=3.0, v_x=0.15, v_y=0.1, dtype=dtype,
    )
    # Round the frames through f32 so the f64 oracle and the f32 engine see
    # the *same* data — real microscopy frames are integer-valued (uint16)
    # and exactly representable in f32, so this matches production; the EPE
    # then measures pure solver error, not synthetic-data rounding.
    movie = np.asarray(np.asarray(movie, np.float64) * 100.0, np.float32)
    return movie.astype(np.float64), delta_x


def numpy_pair_data(prev, cur, a_s, a_r):
    """Pure-numpy coefficient planes + RHS (f64) — avoids touching the JAX
    backend config for host-side baseline/oracle work."""
    from opticalflow_tpu.ops.elop import ELCoefficients

    prev = np.asarray(prev, np.float64)
    cur = np.asarray(cur, np.float64)
    I = prev[1:-1, 1:-1]
    dIdx = (prev[2:, 1:-1] - prev[:-2, 1:-1]) / 2
    dIdy = dIdx  # compat mode: the reference's dy rule duplicates dx
    dIdxx = prev[2:, 1:-1] + prev[:-2, 1:-1] - 2 * I
    dIdyy = prev[1:-1, 2:] + prev[1:-1, :-2] - 2 * I
    dIdxy = (prev[2:, 2:] - prev[2:, :-2] - prev[:-2, 2:] + prev[:-2, :-2]) / 4
    dIdx_t = (cur[2:, 1:-1] - cur[:-2, 1:-1] - prev[2:, 1:-1] + prev[:-2, 1:-1]) / 2
    dIdy_t = (cur[1:-1, 2:] - cur[1:-1, :-2] - prev[1:-1, 2:] + prev[1:-1, :-2]) / 2
    dIdt = (cur - prev)[1:-1, 1:-1]
    coeffs = ELCoefficients(
        diag_x=I * (dIdxx - 2 * I) - 4 * a_s,
        diag_y=I * (dIdyy - 2 * I) - 4 * a_s,
        cross=I * dIdxy,
        adv_xm=I * (-dIdx + I) + a_s,
        adv_xp=I * (dIdx + I) + a_s,
        adv_ym=I * (-dIdy + I) + a_s,
        adv_yp=I * (dIdy + I) + a_s,
        gx=I * dIdx / 2,
        gy=I * dIdy / 2,
        quart=I * I / 4,
        half_I=I / 2,
        dIdx=dIdx,
        dIdy=dIdy,
        speed_alpha=np.float64(a_s),
        remodelling_alpha=np.float64(a_r),
    )
    rhs = np.zeros((3,) + prev.shape)
    rhs[0, 1:-1, 1:-1] = -I * dIdx_t
    rhs[1, 1:-1, 1:-1] = -I * dIdy_t
    rhs[2, 1:-1, 1:-1] = -dIdt
    return coeffs, rhs


def _direct_f64_fields(movie, k=0):
    """f64 assembled spsolve oracle fields for pair k of ``movie``."""
    import scipy.sparse.linalg as spla

    from opticalflow_tpu.solve.direct import assemble_el_matrix, fields_to_flat, flat_to_fields

    coeffs, rhs = numpy_pair_data(movie[k], movie[k + 1], ALPHA_S, ALPHA_R)
    mat = assemble_el_matrix(coeffs, movie.shape[1], movie.shape[2]).tocsr()
    x = spla.spsolve(mat, fields_to_flat(rhs))
    return flat_to_fields(x, movie.shape[1], movie.shape[2])


def bench_cpu_reference(movie, n_pairs):
    """Reference-pipeline harness, f64: vectorized assembly + SuperLU
    spsolve per pair (see module docstring)."""
    import scipy.sparse.linalg as spla

    from opticalflow_tpu.solve.direct import assemble_el_matrix, fields_to_flat

    t0 = time.perf_counter()
    for k in range(n_pairs):
        coeffs, rhs = numpy_pair_data(movie[k], movie[k + 1], ALPHA_S, ALPHA_R)
        mat = assemble_el_matrix(coeffs, movie.shape[1], movie.shape[2]).tocsc()
        spla.spsolve(mat, fields_to_flat(rhs))
    return n_pairs / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# Core section (must complete): 12-pair 256^2 batch, production defaults
# ---------------------------------------------------------------------------


def _movie_runner(warm_start, gmres_restart=32):
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import _solve_movie

    def run(mov, u0):
        all_u, infos = _solve_movie(
            mov, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            "compat", "auto", "multigrid", RTOL, 1000, True, warm_start,
            "auto", 8, 300.0, 0.2, gmres_restart, EXIT_FACTOR,
        )
        return all_u, infos

    return run


def core_section(movie):
    import jax
    import jax.numpy as jnp

    run = _movie_runner("two-pass")
    u0 = jnp.zeros((3, movie.shape[1], movie.shape[2]), jnp.float32)

    # device-resident inputs, perturbed per-variant so no layer of the
    # remote-execution stack can dedupe repeated identical computations
    rng = np.random.default_rng(0)
    movs = [jax.device_put(jnp.asarray(movie, jnp.float32))]
    for _ in range(3):
        movs.append(jax.device_put(
            jnp.asarray(movie + rng.normal(0, 1e-4, movie.shape), jnp.float32)))

    t0 = time.perf_counter()
    all_u, infos = run(movs[0], u0)
    jax.block_until_ready(all_u)
    compile_s = time.perf_counter() - t0
    _log(f"core compile+first run: {compile_s:.1f}s")

    # device-resident throughput (the tunnel-independent number)
    times = []
    for rep in range(6):
        t0 = time.perf_counter()
        all_u, _ = run(movs[rep % len(movs)], u0)
        jax.block_until_ready(all_u)
        times.append(time.perf_counter() - t0)
    dev_med = float(np.median(times))
    dev_best = float(np.min(times))

    # end-to-end: host f64 array in (f32 convert + upload + solve)
    e2e_times = []
    for rep in range(2):
        mov_host = movie + rng.normal(0, 1e-4, movie.shape)
        t0 = time.perf_counter()
        all_u, _ = run(jnp.asarray(mov_host, jnp.float32), u0)
        jax.block_until_ready(all_u)
        e2e_times.append(time.perf_counter() - t0)
    e2e = float(np.median(e2e_times))

    all_u, infos = run(movs[0], u0)
    iters = np.asarray(infos["iterations"])
    conv = np.asarray(infos["converged"])

    n_pairs = movie.shape[0] - 1
    RESULT["value"] = round(n_pairs / dev_med, 3)
    RESULT["device_pairs_per_sec_best"] = round(n_pairs / dev_best, 3)
    RESULT["end_to_end_pairs_per_sec"] = round(n_pairs / e2e, 3)
    RESULT["warm_start"] = "two-pass"
    RESULT["iterations"] = [int(v) for v in iters]
    RESULT["converged_pairs"] = f"{int(conv.sum())}/{conv.size}"
    RESULT["compile_s"] = round(compile_s, 1)
    _log(f"core: {RESULT['value']} pairs/s device (best {RESULT['device_pairs_per_sec_best']}), "
         f"{RESULT['end_to_end_pairs_per_sec']} end-to-end, iters={RESULT['iterations']}")

    # EPE of a BATCHED pair (pair 1 — pair 0 is the two-pass solo pass)
    # against its own f64 assembled direct solve, computed on device
    u_ref1 = _direct_f64_fields(movie, 1)
    ref1 = jax.device_put(jnp.asarray(u_ref1, jnp.float32))

    @jax.jit
    def epe_dev(u, ref):
        d = u - ref
        return jnp.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max()

    epe = float(epe_dev(all_u[1], ref1))
    RESULT["epe_px_vs_f64_direct"] = epe
    RESULT["epe_pair"] = "pair1 (batched path)"
    _log(f"EPE (batched pair 1) vs f64 direct: {epe:.2e} px")
    return all_u


def cpu_baseline_section(movie):
    cpu_fps = bench_cpu_reference(movie, CPU_BASELINE_PAIRS)
    RESULT["cpu_baseline_pairs_per_sec"] = round(cpu_fps, 4)
    RESULT["vs_baseline"] = round(RESULT["value"] / cpu_fps, 2)
    _log(f"cpu reference harness: {cpu_fps:.3f} pairs/s -> "
         f"vs_baseline {RESULT['vs_baseline']}x")


# ---------------------------------------------------------------------------
# Extended sections (budget-gated, skipped-and-recorded if they don't fit)
# ---------------------------------------------------------------------------


def stencil_bandwidth_section(movie):
    """Speed-of-light check of the hot stencil matvec (VERDICT r3 #5).

    Method: chain ``x <- 1e-3 * A(A(x))`` inside one jitted scan at two
    lengths (100 / 500) and DIFFERENCE the wall times — the axon tunnel
    adds ~20 ms of fixed dispatch latency per call, which differencing
    cancels exactly.  Measured for BOTH implementations:

    * XLA fused stencil ('auto'): actual traffic ~19 planes/application
      (13 precomputed coefficient planes + 3 in + 3 out);
    * fused Pallas kernel: ~7 planes (coefficients rebuilt on the VPU).

    The headline ``stencil_bandwidth_utilization`` is the XLA stencil's
    achieved fraction of HBM peak on its actual traffic — the roofline
    evidence BASELINE config 4 asks for.  The Pallas kernel's number is
    reported against its own 7-plane model; it is VPU-compute-bound
    (coefficient rebuild + mirror-fold selects cost more VPU time than
    the saved HBM traffic), which is why 'auto' resolves to XLA."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from opticalflow_tpu.ops import elop, pallas_kernels

    batch = movie.shape[0] - 1
    rng = np.random.default_rng(7)
    prevs = [
        jax.device_put(jnp.asarray(
            movie[:-1] + rng.normal(0, 1e-4, (batch,) + movie.shape[1:]),
            jnp.float32))
        for _ in range(3)
    ]

    def chain_fn(impl, n_inner):
        @jax.jit
        def chain(prev):
            def per_pair(p):
                s = jnp.max(jnp.abs(p))
                a_sn = jnp.float32(ALPHA_S) / s**2
                if impl == "pallas":
                    aops = pallas_kernels.make_aligned_ops(
                        p / s, a_sn, jnp.float32(ALPHA_R))
                    mv = aops.matvec
                    x0 = aops.pad_field(
                        jnp.ones((3, DIM - 2, DIM - 2), jnp.float32))
                else:
                    pair = elop.compute_frame_pair_data(
                        p / s, p / s, a_sn, jnp.float32(ALPHA_R), "compat")
                    mv = lambda c: elop.el_matvec_reduced(pair.coeffs, c)
                    x0 = jnp.ones((3, DIM - 2, DIM - 2), jnp.float32)

                def body(x, _):
                    return 1e-3 * mv(mv(x)), None

                x, _ = lax.scan(body, x0, None, length=n_inner)
                return x

            return jax.vmap(per_pair)(prev)

        return chain

    plane = DIM * DIM * 4
    rec = {"hbm_peak_gbps": HBM_PEAK_GBPS,
           "method": "differenced 100/500-application chains (dispatch latency cancels)"}
    for impl, planes in (("xla", 19), ("pallas", 7)):
        times = {}
        for n_inner in (100, 500):
            ch = chain_fn(impl, n_inner)
            jax.block_until_ready(ch(prevs[0]))
            best = float("inf")
            for k in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready(ch(prevs[1 + k]))
                best = min(best, time.perf_counter() - t0)
            times[n_inner] = best
        per_app = (times[500] - times[100]) / (400 * 2)
        gbps = batch * planes * plane / per_app / 1e9
        rec[impl] = {
            "us_per_batched_application": round(per_app * 1e6, 1),
            "traffic_model_planes": planes,
            "achieved_gbps": round(gbps, 1),
            "fraction_of_peak": round(gbps / HBM_PEAK_GBPS, 3),
        }
        _log(f"stencil[{impl}]: {per_app*1e6:.1f} us/app -> {gbps:.0f} GB/s "
             f"= {100*gbps/HBM_PEAK_GBPS:.0f}% of v5e peak ({planes}-plane model)")
    RESULT["stencil_kernel"] = rec
    RESULT["stencil_bandwidth_utilization"] = rec["xla"]["fraction_of_peak"]


def embryo_1024_section():
    """BASELINE config-2 scale anchor: one 1024^2 pair (3.1M unknowns,
    /root/reference/analysis/analyse_variational_optical_flow.py:203-205),
    method='auto' -> FGMRES+MG (the measured-safe large-grid solver)."""
    import jax
    import jax.numpy as jnp
    from opticalflow_tpu.flow.variational import resolve_method, solve_frame_pair

    movie, _ = make_movie(2, 1024, np.float64)
    prev = jax.device_put(jnp.asarray(movie[0], jnp.float32))
    cur = jax.device_put(jnp.asarray(movie[1], jnp.float32))
    u0 = jnp.zeros((3, 1024, 1024), jnp.float32)

    @jax.jit
    def solve(p, c):
        return solve_frame_pair(
            p, c, u0, jnp.float32(ALPHA_S), jnp.float32(ALPHA_R),
            method="auto", refinement_exit_factor=EXIT_FACTOR,
        )

    t0 = time.perf_counter()
    u, info = solve(prev, cur)
    jax.block_until_ready(u)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    u, info = solve(prev + 1e-4, cur)
    jax.block_until_ready(u)
    solve_s = time.perf_counter() - t0
    rec = {
        "method": resolve_method("auto", 1022, 1022),
        "pairs_per_sec": round(1.0 / solve_s, 3),
        "iterations": int(info["iterations"]),
        "converged": bool(info["converged"]),
        "residual_rel": float(info["residual_norm"]),
        "compile_s": round(compile_s, 1),
    }
    # f64 spsolve at 3.1M unknowns can exhaust memory or run for hours —
    # only attempted when explicitly requested (ADVICE r3 #4's cutoff);
    # convergence is judged on the df32 true residual instead.
    if os.environ.get("BENCH_EPE_1024", "0") == "1":
        try:
            u_ref = _direct_f64_fields(movie, 0)
            d = np.asarray(u) - u_ref
            rec["epe_px_vs_f64_direct"] = float(
                np.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max())
        except Exception as err:  # noqa: BLE001 — host oracle is best-effort here
            rec["epe_px_vs_f64_direct"] = f"oracle failed: {type(err).__name__}"
    RESULT.setdefault("reference_scale", {})["embryo_1024x1024_single_pair"] = rec
    _log(f"1024^2: {rec}")


def stack_512_section():
    """BASELINE config-3 at reference scale: 50-pair 512^2 stack batched
    on one chip (method='auto' -> FGMRES at this size)."""
    import jax
    import jax.numpy as jnp

    movie, _ = make_movie(51, 512, np.float64)
    # restart 12: FGMRES keeps ~2*restart solution-size vectors per
    # concurrently solved pair — restart 32 would need ~10 GB of HBM for
    # the 50-pair 512^2 batch (the SolverConfig.gmres_restart guidance)
    run = _movie_runner("two-pass", gmres_restart=12)
    u0 = jnp.zeros((3, 512, 512), jnp.float32)
    mov = jax.device_put(jnp.asarray(movie, jnp.float32))

    t0 = time.perf_counter()
    all_u, infos = run(mov, u0)
    jax.block_until_ready(all_u)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    all_u, infos = run(mov + 1e-4, u0)
    jax.block_until_ready(all_u)
    solve_s = time.perf_counter() - t0
    iters = np.asarray(infos["iterations"])
    conv = np.asarray(infos["converged"])
    rec = {
        "pairs_per_sec": round(50 / solve_s, 3),
        "iterations_median": int(np.median(iters)),
        "iterations_max": int(iters.max()),
        "converged_pairs": f"{int(conv.sum())}/{conv.size}",
        "compile_s": round(compile_s, 1),
    }
    if _remaining() > 240:
        try:
            u_ref = _direct_f64_fields(movie, 1)
            ref1 = jax.device_put(jnp.asarray(u_ref, jnp.float32))
            d = all_u[1] - ref1
            rec["epe_px_vs_f64_direct_pair1"] = float(
                jnp.sqrt(d[0] ** 2 + d[1] ** 2)[1:-1, 1:-1].max())
        except Exception as err:  # noqa: BLE001
            rec["epe_px_vs_f64_direct_pair1"] = f"oracle failed: {type(err).__name__}"
    RESULT.setdefault("reference_scale", {})["stack_50pairs_512x512"] = rec
    _log(f"50x512^2: {rec}")


def sweep_section():
    """BASELINE config-5 analogue: a 300-solve regularisation sweep as one
    batched on-device computation (ref
    analyse_variational_optical_flow.py:292-296)."""
    from opticalflow_tpu.analysis.sweeps import vary_regularisation
    from opticalflow_tpu.core.types import SolverConfig

    movie, _ = make_movie(2, 128, np.float64)
    movie32 = np.asarray(movie, np.float32)
    a_s = np.logspace(1, 5, 15)
    a_r = np.logspace(1, 5, 20)
    cfg = SolverConfig(rtol=RTOL)
    vary_regularisation(movie32, a_s, a_r, batched=True, solver=cfg)  # compile
    t0 = time.perf_counter()
    res = vary_regularisation(movie32 + 1e-4, a_s, a_r, batched=True, solver=cfg)
    dt = time.perf_counter() - t0
    n_solves = len(a_s) * len(a_r)
    rec = {
        "n_solves": n_solves,
        "grid": f"{len(a_s)}x{len(a_r)} alphas, 128^2, 1 pair",
        "solves_per_sec": round(n_solves / dt, 2),
        "converged_cells": f"{int(np.sum(res['converged']))}/{n_solves}",
    }
    RESULT.setdefault("reference_scale", {})["sweep_300_solves_128x128"] = rec
    _log(f"sweep: {rec}")


def main():
    _install_safety()
    # warm persistent compile cache (works through the axon remote-compile
    # path — measured: second-process compile 0.1s vs 60s+ cold)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    movie, _ = make_movie(N_PAIRS + 1, DIM, np.float64)

    core_section(movie)
    cpu_baseline_section(movie)

    # extended sections, cheapest-first cost estimates (measured with a
    # warm compile cache; a cold cache inflates each by its compile time,
    # which the budget check absorbs by skipping later sections)
    skipped = []
    for name, fn, est in (
        ("stencil_kernel", lambda: stencil_bandwidth_section(movie), 45),
        ("embryo_1024", embryo_1024_section, 90),
        ("stack_512", stack_512_section, 120),
        ("sweep_300", sweep_section, 60),
    ):
        if _remaining() < est:
            skipped.append(name)
            _log(f"SKIP {name}: {_remaining():.0f}s left < {est}s estimate")
            continue
        try:
            fn()
        except Exception as err:  # noqa: BLE001 — never lose the core metric
            RESULT.setdefault("section_errors", {})[name] = repr(err)
            _log(f"ERROR in {name}: {err!r}")
        # drop cached executables + live buffers between sections — the
        # 1024^2 and 50x512^2 sections each pin multi-GB Krylov bases, and
        # letting them accumulate crashed the TPU worker (OOM) in testing
        jax.clear_caches()
    if skipped:
        RESULT["skipped_budget"] = skipped

    RESULT["elapsed_s"] = round(time.time() - _T0, 1)
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    main()
