"""Liu-Shen Jacobi path vs a loop oracle + the reference's one regression
value (ref analyse_variational_optical_flow.py:370-371)."""

import numpy as np
import pytest

from opticalflow_tpu.core.synth import make_fake_data_frame
from opticalflow_tpu.flow.liushen import (
    conduct_variational_optical_flow_deprecated,
    liu_shen_movie,
)


def liu_shen_oracle(movie, alpha, init_vx, init_vy, iterations):
    """Per-pixel loop implementation of the reference kernel semantics
    (ref optical_flow.py:426-673), pixel units."""
    movie = np.asarray(movie, dtype=np.float64)
    T, X, Y = movie.shape
    mb = np.zeros((T, X + 2, Y + 2))
    mb[:, 1:-1, 1:-1] = movie

    def bc(a):
        a[0, :] = a[2, :]
        a[-1, :] = a[-3, :]
        a[:, 0] = a[:, 2]
        a[:, -1] = a[:, -3]

    for t in range(T):
        bc(mb[t])

    out_vx = np.zeros((T - 1, X, Y))
    out_vy = np.zeros((T - 1, X, Y))
    for t in range(1, T):
        prev, cur = mb[t - 1], mb[t]
        vx = np.zeros((X + 2, Y + 2))
        vy = np.zeros((X + 2, Y + 2))
        vx[1:-1, 1:-1] = init_vx
        vy[1:-1, 1:-1] = init_vy
        for _ in range(iterations):
            bc(vx)
            bc(vy)
            nvx, nvy = vx.copy(), vy.copy()
            for i in range(1, X + 1):
                for j in range(1, Y + 1):
                    I = prev[i, j]
                    dIdx = (prev[i + 1, j] - prev[i - 1, j]) / 2
                    dIdy = (prev[i, j + 1] - prev[i, j - 1]) / 2
                    dIdx_t = (cur[i + 1, j] - cur[i - 1, j] - prev[i + 1, j] + prev[i - 1, j]) / 2
                    dIdy_t = (cur[i, j + 1] - cur[i, j - 1] - prev[i, j + 1] + prev[i, j - 1]) / 2
                    dIdxx = prev[i + 1, j] + prev[i - 1, j] - 2 * I
                    dIdyy = prev[i, j + 1] + prev[i, j - 1] - 2 * I
                    dIdxy = (
                        prev[i + 1, j + 1] - prev[i + 1, j - 1]
                        - prev[i - 1, j + 1] + prev[i - 1, j - 1]
                    ) / 4

                    def stats(v):
                        dxd = (v[i + 1, j] - v[i - 1, j]) / 2
                        dyd = (v[i, j + 1] - v[i, j - 1]) / 2
                        dxyd = (
                            v[i + 1, j + 1] - v[i + 1, j - 1]
                            - v[i - 1, j + 1] + v[i - 1, j - 1]
                        ) / 4
                        hood = v[i - 1 : i + 2, j - 1 : j + 2].copy()
                        if i == 1:
                            hood[0, :] = 0
                        elif i == X:
                            hood[2, :] = 0
                        if j == 1:
                            hood[:, 0] = 0
                        elif j == Y:
                            hood[:, 2] = 0
                        bar8 = hood.sum() - hood[1, 1]
                        return dxd, dyd, dxyd, bar8

                    dxdVx, dydVx, dxydVx, vx_bar8 = stats(vx)
                    dxdVy, dydVy, dxydVy, vy_bar8 = stats(vy)
                    vx_barx = vx[i + 1, j] + vx[i - 1, j]
                    vy_bary = vy[i, j + 1] + vy[i, j - 1]

                    pref = 8.0
                    if i in (1, X) and j in (1, Y):
                        pref = 3.0
                    elif i in (1, X) or j in (1, Y):
                        pref = 5.0

                    f1 = (
                        -I * dIdx_t
                        - I * (2 * dIdx * dxdVx + dIdy * dxdVy + dIdx * dydVy)
                        - I**2 * (vx_barx + dxydVy)
                        - alpha * vx_bar8
                    )
                    f2 = (
                        -I * dIdy_t
                        - I * (2 * dIdy * dydVy + dIdx * dydVx + dIdy * dxdVx)
                        - I**2 * (vy_bary + dxydVx)
                        - alpha * vy_bar8
                    )
                    A = np.array(
                        [
                            [I * dIdxx - 2 * I**2 - pref * alpha, I * dIdxy],
                            [I * dIdxy, I * dIdyy - 2 * I**2 - pref * alpha],
                        ]
                    )
                    new = np.linalg.inv(A).dot([f1, f2])
                    nvx[i, j], nvy[i, j] = new
            vx, vy = nvx, nvy
        out_vx[t - 1] = vx[1:-1, 1:-1]
        out_vy[t - 1] = vy[1:-1, 1:-1]
    return out_vx, out_vy


def test_liu_shen_matches_loop_oracle():
    rng = np.random.default_rng(5)
    movie = rng.random((3, 8, 9)) * 50.0
    init_vx = np.full((8, 9), 0.01)
    init_vy = np.full((8, 9), -0.02)
    v_x, v_y = liu_shen_movie(movie, init_vx, init_vy, alpha=5.0, iterations=3)
    ovx, ovy = liu_shen_oracle(movie, 5.0, init_vx, init_vy, 3)
    np.testing.assert_allclose(np.asarray(v_x), ovx, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_y), ovy, rtol=1e-10, atol=1e-12)


def test_reference_golden_regression_value():
    """Reproduce the repo's only regression constant: mean speed after 1000
    Liu-Shen iterations on the 50^2 synthetic pair
    (ref analyse_variational_optical_flow.py:309-371)."""
    first, _ = make_fake_data_frame(2.5, 2.5, sigma=3, width=5, dimension=50)
    second, _ = make_fake_data_frame(2.51, 2.51, sigma=3, width=5, dimension=50)
    first = np.asarray(first)
    second = np.asarray(second)
    movie = np.stack([first / first.max() * 255, second / second.max() * 255])

    result = conduct_variational_optical_flow_deprecated(
        movie, delta_x=1.0, delta_t=1.0, speed_alpha=1.0,
        v_x_guess=0.003, v_y_guess=0.003, remodelling_guess=0.05,
        max_iterations=1000, include_remodelling=False, use_liu_shen=True,
    )
    mean_speed = float(np.mean(result["speed"]))
    # The reference's assert is vacuous (elementwise bool mean, ref :371)
    # and its constant was produced by `conduct_variational_optical_flow`,
    # an API that no longer exists in the reference tree — the *current*
    # reference kernel is what the loop-oracle test above pins down
    # exactly.  We hold the recorded constant to 5%: close enough to catch
    # algorithmic drift, loose enough for the API-version gap.
    assert abs(mean_speed - 0.08600834591294404) / 0.08600834591294404 < 0.05


def test_iteration_recording_mode():
    rng = np.random.default_rng(6)
    movie = rng.random((2, 10, 10)) * 50.0
    result = conduct_variational_optical_flow_deprecated(
        movie, speed_alpha=2.0, max_iterations=6, iteration_stepsize=2,
        return_iterations=True, use_liu_shen=True,
        v_x_guess=0.0, v_y_guess=0.0,
    )
    assert result["v_x_steps"].shape == (1, 4, 10, 10)
    # the final recorded step equals the plain run
    plain = conduct_variational_optical_flow_deprecated(
        movie, speed_alpha=2.0, max_iterations=6, use_liu_shen=True,
        v_x_guess=0.0, v_y_guess=0.0,
    )
    np.testing.assert_allclose(result["v_x"], plain["v_x"], rtol=1e-12)
