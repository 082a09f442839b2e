import numpy as np
import pytest

from opticalflow_tpu.core.synth import make_translating_blob_movie
from opticalflow_tpu.flow.boxflow import conduct_optical_flow
from tests.oracles import box_flow_oracle


@pytest.fixture(scope="module")
def blob_movie():
    movie, delta_x = make_translating_blob_movie(
        n_frames=3, dimension=48, width=10.0, sigma=2.0, v_x=0.15, v_y=0.1
    )
    return movie, delta_x


@pytest.mark.parametrize("include_remodelling", [False, True])
def test_box_flow_matches_loop_oracle(blob_movie, include_remodelling):
    movie, delta_x = blob_movie
    result = conduct_optical_flow(
        movie, boxsize=7, delta_x=delta_x, delta_t=1.0,
        include_remodelling=include_remodelling, dtype=np.float64,
    )
    vx_o, vy_o, speed_o, gamma_o = box_flow_oracle(
        movie, 7, delta_x=delta_x, delta_t=1.0, include_remodelling=include_remodelling
    )
    np.testing.assert_allclose(result["v_x"], vx_o, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(result["v_y"], vy_o, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(result["speed"], speed_o, rtol=1e-9, atol=1e-11)
    if include_remodelling:
        np.testing.assert_allclose(result["net_remodelling"], gamma_o, rtol=1e-9, atol=1e-11)


def test_box_flow_recovers_known_velocity(blob_movie):
    """Synthetic ground-truth check in the style of the reference's
    check_error_of_method (ref analysis/compare_rho_and_actin.py:302-375)."""
    movie, delta_x = blob_movie
    result = conduct_optical_flow(movie, boxsize=15, delta_x=delta_x, delta_t=1.0,
                                  dtype=np.float64)
    # evaluate where the blob actually has signal
    mask = movie[1:] > 0.05
    vx_est = np.nanmedian(result["v_x"][mask])
    vy_est = np.nanmedian(result["v_y"][mask])
    assert abs(vx_est - 0.15) < 0.03
    assert abs(vy_est - 0.1) < 0.03


def test_even_boxsize_uses_enlarged_window(blob_movie):
    movie, delta_x = blob_movie
    res_even = conduct_optical_flow(movie, boxsize=8, delta_x=delta_x, dtype=np.float64)
    vx_o, vy_o, _, _ = box_flow_oracle(movie, 8, delta_x=delta_x)
    np.testing.assert_allclose(res_even["v_x"], vx_o, rtol=1e-9, atol=1e-11)


def test_background_subtraction_and_smoothing_run(blob_movie):
    movie, delta_x = blob_movie
    result = conduct_optical_flow(
        movie, boxsize=7, delta_x=delta_x, smoothing_sigma=1.5, background=0.01,
        dtype=np.float64,
    )
    assert result["v_x"].shape == (movie.shape[0] - 1, movie.shape[1], movie.shape[2])
    assert np.isfinite(result["blurred_data"]).all()
