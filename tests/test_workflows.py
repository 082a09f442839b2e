"""End-to-end tests of the composed analysis workflows and their CLI
registration (the reference's multi-step experiment recipes, run on tiny
synthetic inputs)."""

import os

import numpy as np
import pytest

from opticalflow_tpu.analysis import drivers
from opticalflow_tpu.core.synth import make_translating_blob_movie


@pytest.fixture(scope="module")
def tiny_movie_file(tmp_path_factory):
    movie, _ = make_translating_blob_movie(
        n_frames=6, dimension=40, width=10.0, sigma=2.0, v_x=0.2, v_y=0.1
    )
    movie = (np.asarray(movie) * 200.0).astype(np.float32)
    path = tmp_path_factory.mktemp("movies") / "tiny.tif"
    from PIL import Image

    frames = [Image.fromarray(frame, mode="F") for frame in movie]
    frames[0].save(str(path), save_all=True, append_images=frames[1:])
    return str(path), movie


def test_all_advertised_subcommands_registered():
    """Every experiment named in the module docstring must be a real
    subcommand (round-1 shipped docs advertising unregistered
    'synthetic-big'/'downsampled')."""
    import re

    names = set(re.findall(r"^\* ``([a-z-]+)``", drivers.__doc__, re.M))
    registered = set()
    parser = None
    # reconstruct the registered choices by parsing a bogus command
    import argparse

    try:
        drivers.main(["--help"])
    except SystemExit:
        pass
    # argparse stores choices on the subparser action
    parser = argparse.ArgumentParser(prog="x")
    # simpler: call main with an invalid name and inspect the error
    for name in names:
        try:
            drivers.main([name, "--help"])
        except SystemExit as e:
            assert e.code == 0, f"subcommand {name} not registered"
        registered.add(name)
    assert names == registered


def test_boxsize_sweep_cli(tiny_movie_file, tmp_path):
    path, _ = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "boxsize-sweep", path, "--output-dir", out, "--boxsizes", "5:12:4",
        "--delta-x", "0.25", "--frame-index", "2", "--smoothing-sigma", "1.0",
    ])
    assert os.path.exists(os.path.join(out, "boxsize_sweep.npy"))
    assert os.path.exists(os.path.join(out, "boxsize_velocities.pdf"))
    assert os.path.exists(os.path.join(out, "boxsize_local_velocities.pdf"))
    sweep = np.load(os.path.join(out, "boxsize_sweep.npy"), allow_pickle=True).item()
    assert np.isfinite(sweep["mean_speeds"]).all()


def test_blursize_sweep_cli(tiny_movie_file, tmp_path):
    path, _ = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "blursize-sweep", path, "--output-dir", out, "--blur-sizes", "0.8:2.2:0.6",
        "--boxsize", "7", "--delta-x", "0.25", "--frame-index", "2",
    ])
    sweep = np.load(os.path.join(out, "blursize_sweep.npy"), allow_pickle=True).item()
    assert sweep["mean_speeds"].shape == sweep["blur_sizes"].shape
    assert np.isfinite(sweep["mean_speeds"]).all()


def test_dual_channel_cli(tiny_movie_file, tmp_path):
    path, _ = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "dual-channel", path, path, "--output-dir", out, "--boxsize", "7",
        "--smoothing-sigma", "1.0", "--delta-x", "0.25",
    ])
    for artefact in (
        "actin_flow_result.npy",
        "rho_flow_result.npy",
        "joint_speed_histograms.pdf",
        "angle_value_histograms.pdf",
        "weighted_angle_value_histograms.pdf",
        "speed_correlation.png",
    ):
        assert os.path.exists(os.path.join(out, artefact)), artefact
    # identical channels -> angle between vectors = 0 wherever defined
    res = np.load(os.path.join(out, "actin_flow_result.npy"), allow_pickle=True).item()
    assert np.isfinite(res["speed"]).any()


def test_dual_channel_cache_resume(tiny_movie_file, tmp_path):
    """Second run must come from the ResultCache (per-movie resume units,
    the reference's np.save/reload pattern formalised)."""
    from opticalflow_tpu.analysis.workflows import run_dual_channel_comparison

    path, movie = tiny_movie_file
    out = str(tmp_path / "out")
    run_dual_channel_comparison(movie, movie, out, boxsize=7,
                                smoothing_sigma=1.0, delta_x=0.25, delta_t=1.0)
    cache_dir = os.path.join(out, "cache")
    entries = os.listdir(cache_dir)
    assert entries, "expected cache entries after first run"
    mtimes = {e: os.path.getmtime(os.path.join(cache_dir, e)) for e in entries}
    run_dual_channel_comparison(movie, movie, out, boxsize=7,
                                smoothing_sigma=1.0, delta_x=0.25, delta_t=1.0)
    for e, t in mtimes.items():
        assert os.path.getmtime(os.path.join(cache_dir, e)) == t, "cache not reused"


def test_piv_compare_workflow(tiny_movie_file, tmp_path):
    """Synthetic PIVlab-style .mat driven through the full comparison."""
    import scipy.io

    path, movie = tiny_movie_file
    out = str(tmp_path / "out")
    n_pairs = movie.shape[0] - 1
    gx, gy = np.meshgrid(np.arange(4, 40, 8), np.arange(4, 40, 8), indexing="ij")

    def cell(arrs):
        out_arr = np.empty((len(arrs), 1), dtype=object)
        for k, a in enumerate(arrs):
            out_arr[k, 0] = a
        return out_arr

    mat = {
        "x": cell([gx.astype(float)] * n_pairs),
        "y": cell([gy.astype(float)] * n_pairs),
        "u_original": cell([np.full(gx.shape, 0.2)] * n_pairs),
        "v_original": cell([np.full(gx.shape, 0.1)] * n_pairs),
    }
    mat_path = str(tmp_path / "piv.mat")
    scipy.io.savemat(mat_path, mat)

    from opticalflow_tpu.analysis.workflows import run_piv_comparison

    results = run_piv_comparison(
        mat_path, movie, out, method="box", intensity_threshold=1.0, boxsize=7,
    )
    assert "piv" in results and "box" in results
    assert os.path.exists(os.path.join(out, "PIV_optical_flow_result.npy"))
    assert os.path.exists(os.path.join(out, "PIV_speed_correlation.png"))


def test_ground_truth_workflow(tiny_movie_file, tmp_path):
    import pandas as pd

    path, movie = tiny_movie_file
    out = str(tmp_path / "out")
    table = pd.DataFrame({
        "x-position start": [10, 20],
        "x-position end": [12, 21],
        "y-position start": [15, 25],
        "y-position end": [16, 25],
    })
    # xlsx engines are not installed in this image; the loader accepts csv
    xlsx = str(tmp_path / "measurements.csv")
    table.to_csv(xlsx, index=False)

    from opticalflow_tpu.analysis.workflows import run_ground_truth_validation

    comparison = run_ground_truth_validation(
        movie, xlsx, out, method="box", frame=2, boxsize=7,
    )
    assert comparison["relative_errors"].shape == (2,)
    assert os.path.exists(os.path.join(out, "velocity_validation.pdf"))


def test_intensity_histograms_cli(tiny_movie_file, tmp_path):
    path, _ = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "intensity-histograms", path, path, "--output-dir", out,
        "--threshold-a", "20", "--threshold-b", "25",
    ])
    assert os.path.exists(os.path.join(out, "both_intensity_histograms.pdf"))
    assert os.path.exists(
        os.path.join(out, "both_intensity_histograms_blurred.pdf"))


def test_threshold_movies_cli(tiny_movie_file, tmp_path):
    path, movie = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "threshold-movies", path, path, "--output-dir", out,
        "--threshold", "30",
    ])
    made = os.listdir(out)
    assert any(f.startswith("joint_movie_thresholded") for f in made), made
    # masks follow the reference's fixed-threshold semantics on raw frames
    from opticalflow_tpu.analysis.drivers import run_threshold_movies

    masks = run_threshold_movies(path, output_dir=out, threshold=30.0)
    np.testing.assert_array_equal(
        masks[0], np.asarray(movie, np.float64) < 30.0)


def test_threshold_movies_adaptive_clahe_cli(tiny_movie_file, tmp_path):
    path, _ = tiny_movie_file
    out = str(tmp_path / "out")
    drivers.main([
        "threshold-movies", path, "--output-dir", out, "--adaptive",
        "--clahe", "100",
    ])
    made = os.listdir(out)
    assert any("_w_clahe" in f for f in made), made


def test_coexpression_cli(tiny_movie_file, tmp_path):
    path, movie = tiny_movie_file
    out = str(tmp_path / "out")
    # a saved flow result feeds the speed-histogram branch
    from opticalflow_tpu.flow.boxflow import conduct_optical_flow

    result = conduct_optical_flow(movie[:3], boxsize=7)
    result_path = str(tmp_path / "flow.npy")
    result.save(result_path)
    drivers.main([
        "coexpression", path, path, "--output-dir", out, "--normalised",
        "--flow-result-path", result_path,
    ])
    made = os.listdir(out)
    assert "coexpression_normalised.mp4" in made or \
        "coexpression_normalised.gif" in made, made
    assert "speed_histograms.csv" in made
    assert "actin_global_speed_histogram.pdf" in made


def test_vortex_pair_cli(tmp_path):
    out = str(tmp_path / "out")
    drivers.main(["vortex-pair", "--output-dir", out, "--dimension", "48"])
    made = os.listdir(out)
    assert "vortex_pair_comparison.pdf" in made
    assert "vortex_pair_result.npy" in made


def test_correct_intensity_flag_changes_flow(tmp_path):
    """--correct-intensity (ref analyse_short_timeinterval_data.py:395-469):
    on a movie with global illumination drift, the corrected variational
    flow must differ from the raw one — the drift otherwise masquerades as
    remodelling/flow."""
    movie, _ = make_translating_blob_movie(
        n_frames=4, dimension=32, width=10.0, sigma=2.5, v_x=0.2, v_y=0.1
    )
    movie = np.asarray(movie) * 200.0 + 30.0
    drift = 20.0 * np.arange(movie.shape[0])[:, None, None]
    drifted = movie + drift  # additive global brightening per frame

    from PIL import Image

    paths = {}
    for name, m in (("clean", movie), ("drift", drifted)):
        p = tmp_path / f"{name}.tif"
        frames = [Image.fromarray(f.astype(np.float32), mode="F") for f in m]
        frames[0].save(str(p), save_all=True, append_images=frames[1:])
        paths[name] = str(p)

    kwargs = dict(speed_alpha=500.0, remodelling_alpha=500.0)
    raw = drivers.run_variational(paths["drift"], str(tmp_path / "raw"), **kwargs)
    corrected = drivers.run_variational(
        paths["drift"], str(tmp_path / "corr"), correct_intensity=True, **kwargs
    )
    # a uniform additive intensity gain is absorbed verbatim into the
    # remodelling field; the correction removes the global component
    raw_rem = float(np.mean(np.asarray(raw["remodelling"])))
    corr_rem = float(np.mean(np.asarray(corrected["remodelling"])))
    assert abs(corr_rem) < 0.5 * abs(raw_rem)
    assert not np.allclose(np.asarray(raw["v_x"]), np.asarray(corrected["v_x"]))
