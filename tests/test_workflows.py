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
