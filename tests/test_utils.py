"""utils: observability spans, result cache, drivers CLI smoke."""

import numpy as np

from opticalflow_tpu.core.types import FlowResult
from opticalflow_tpu.utils.cache import ResultCache, config_hash
from opticalflow_tpu.utils.observability import (
    Timer,
    format_elapsed_time,
    reset_spans,
    span,
    span_statistics,
)


def test_format_elapsed_time_matches_reference_semantics():
    assert format_elapsed_time(125.25) == (2, 5, 250)
    assert format_elapsed_time(0.001) == (0, 0, 1)


def test_spans_registry():
    reset_spans()
    with span("phase_a"):
        pass
    with span("phase_a"):
        pass
    with Timer("phase_b") as t:
        pass
    stats = span_statistics()
    assert stats["phase_a"]["count"] == 2
    assert "phase_b" in stats
    assert "minutes" in t.report()


def test_result_cache_roundtrip(tmp_path):
    movie = np.arange(24.0).reshape(2, 3, 4)
    cache = ResultCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return FlowResult(v_x=np.ones((1, 3, 4)), v_y=np.zeros((1, 3, 4)),
                          speed=np.ones((1, 3, 4)), delta_x=1.0, delta_t=1.0)

    r1 = cache.get_or_compute(movie, compute, alpha=2.0)
    r2 = cache.get_or_compute(movie, compute, alpha=2.0)
    assert len(calls) == 1
    np.testing.assert_array_equal(r1["v_x"], r2["v_x"])
    # different config -> different key -> recompute
    cache.get_or_compute(movie, compute, alpha=3.0)
    assert len(calls) == 2
    assert config_hash(movie, alpha=2.0) != config_hash(movie, alpha=3.0)


def test_drivers_cli_synthetic(tmp_path):
    from opticalflow_tpu.analysis.drivers import main

    result, stats = main([
        "synthetic-box-error", "--output-dir", str(tmp_path), "--dimension", "128",
    ])
    assert (tmp_path / "fake_flow_result_without_noise.npy").exists()
    assert abs(stats["median_v_x"] - 0.1) < 0.05


def test_drivers_cli_file_experiment(tmp_path):
    """Drive the file-based variational experiment end to end via the CLI
    using a synthetic movie saved as an image sequence."""
    from PIL import Image

    from opticalflow_tpu.analysis.drivers import main
    from opticalflow_tpu.core.synth import make_translating_blob_movie

    movie, _ = make_translating_blob_movie(n_frames=3, dimension=24, width=10.0,
                                           sigma=2.5, v_x=0.2, v_y=0.1)
    movie = (np.asarray(movie) * 255).astype(np.uint8)
    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    for k, frame in enumerate(movie):
        Image.fromarray(frame).save(seq_dir / f"frame{k}.png")

    out_dir = tmp_path / "out"
    main([
        "variational", str(seq_dir), "--output-dir", str(out_dir),
        "--speed-alpha", "500", "--remodelling-alpha", "500",
    ])
    assert (out_dir / "variational_result.npy").exists()


def test_profile_solve_phases_smoke():
    """Per-phase solver profile: phases present, positive, and recorded
    into the span registry (VERDICT r2 item #8)."""
    from opticalflow_tpu.core.synth import make_translating_blob_movie
    from opticalflow_tpu.flow.variational import profile_solve_phases

    reset_spans()
    movie, _ = make_translating_blob_movie(
        n_frames=2, dimension=32, width=8.0, sigma=2.0, v_x=0.1, v_y=0.05,
        dtype=np.float32,
    )
    movie = np.asarray(movie, np.float32) * 100.0
    phases = profile_solve_phases(movie[0], movie[1], 1000.0, 1000.0, reps=1)
    for key in ("pair_data", "mg_setup", "krylov_main", "refinement",
                "host_transfer", "total"):
        assert key in phases and phases[key] >= 0.0
    assert phases["total"] > 0.0
    stats = span_statistics()
    assert stats["solve/krylov_main"]["count"] == 1
