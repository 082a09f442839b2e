"""Composed end-to-end analysis workflows.

Each function here reproduces one of the reference's multi-step
experiment recipes by composing the engine's primitives (flow solves,
interop loaders, statistics, plots) — the reference runs these as
hand-toggled script sections:

* dual-channel (Rho + actin) comparison —
  /root/reference/analysis/compare_rho_and_actin.py:616-767 (production
  runs, joint overlay movie, joint speed/angle histograms, angle-between
  histograms, speed correlation);
* PIV-vs-flow comparison —
  /root/reference/analysis/analyse_short_timeinterval_data.py:505-638
  (PIVlab .mat -> flow-result dict, threshold, side-by-side movie,
  speed correlation + angle histograms);
* hand-clicked ground-truth validation —
  /root/reference/analysis/analyse_short_timeinterval_data.py:128-239,
  640-745 (xlsx displacement endpoints vs inferred flow, relative
  errors, validation quiver figure).

Every workflow uses :class:`utils.cache.ResultCache` keyed by the movie
content + parameters so interrupted runs resume without re-solving
(the reference's ad-hoc ``np.save`` + commented-out reload lines,
e.g. compare_rho_and_actin.py:627,649), and wraps its phases in
:func:`utils.observability.span` so ``span_statistics()`` reports where
the time went.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from opticalflow_tpu.core.types import FlowResult
from opticalflow_tpu.utils.cache import ResultCache
from opticalflow_tpu.utils.observability import span, span_statistics


def _compute_flow(movie, method: str, *, boxsize=31, smoothing_sigma=None,
                  delta_x=1.0, delta_t=1.0, speed_alpha=1000.0,
                  remodelling_alpha=1000.0, **extra) -> FlowResult:
    """Dispatch to one of the engine's flow methods by name."""
    if method == "box":
        from opticalflow_tpu.flow.boxflow import conduct_optical_flow

        return conduct_optical_flow(
            movie, boxsize=boxsize, delta_x=delta_x, delta_t=delta_t,
            smoothing_sigma=smoothing_sigma, **extra,
        )
    if method == "variational":
        from opticalflow_tpu.flow.variational import variational_optical_flow

        return variational_optical_flow(
            movie, delta_x=delta_x, delta_t=delta_t, speed_alpha=speed_alpha,
            remodelling_alpha=remodelling_alpha, smoothing_sigma=smoothing_sigma,
            **extra,
        )
    if method == "farneback":
        from opticalflow_tpu.flow.farneback import conduct_opencv_flow

        return conduct_opencv_flow(
            movie, delta_x=delta_x, delta_t=delta_t,
            smoothing_sigma=smoothing_sigma, **extra,
        )
    raise ValueError(f"unknown flow method {method!r}")


def run_dual_channel_comparison(
    movie_a,
    movie_b,
    output_dir: str,
    label_a: str = "Actin",
    label_b: str = "Rho",
    method: str = "box",
    boxsize: int = 31,
    smoothing_sigma: Optional[float] = 3.0,
    delta_x: float = 0.0913,
    delta_t: float = 10.0,
    arrow_boxsize: int = 15,
    cache_dir: Optional[str] = None,
    **flow_kwargs,
) -> Dict[str, FlowResult]:
    """Dual-channel workflow (ref compare_rho_and_actin.py:616-767):
    flow on both channels, joint overlay movie, per-channel velocity
    movies, joint speed/angle histogram figure, angle-between histograms
    (plain + speed-weighted) and the cross-channel speed correlation.
    """
    os.makedirs(output_dir, exist_ok=True)
    cache = ResultCache(cache_dir or os.path.join(output_dir, "cache"))
    results = {}
    for label, movie in ((label_a, movie_a), (label_b, movie_b)):
        with span(f"flow:{label}"):
            results[label] = cache.get_or_compute(
                movie,
                lambda movie=movie: _compute_flow(
                    movie, method, boxsize=boxsize, smoothing_sigma=smoothing_sigma,
                    delta_x=delta_x, delta_t=delta_t, **flow_kwargs,
                ),
                method=method, boxsize=boxsize, smoothing_sigma=smoothing_sigma,
                delta_x=delta_x, delta_t=delta_t,
            )
            results[label].save(
                os.path.join(output_dir, f"{label.lower()}_flow_result.npy"))

    flow_a, flow_b = results[label_a], results[label_b]
    from opticalflow_tpu.viz import plots

    with span("viz:dual-channel"):
        plots.make_two_channel_overlay_movie(
            flow_a, flow_b, os.path.join(output_dir, "joint_overlay.mp4"),
            label_a=label_a, label_b=label_b, arrow_boxsize=arrow_boxsize,
        )
        for label, res in results.items():
            plots.make_velocity_overlay_movie(
                res, os.path.join(output_dir, f"{label.lower()}_velocities.mp4"),
                arrow_boxsize=arrow_boxsize,
            )
        plots.plot_joint_speed_and_angle_histograms(
            flow_a, flow_b, os.path.join(output_dir, "joint_speed_histograms.pdf"),
            label_a=label_a, label_b=label_b,
        )
        plots.plot_angle_between_histogram(
            flow_a, flow_b, os.path.join(output_dir, "angle_value_histograms.pdf"))
        plots.plot_angle_between_histogram(
            flow_a, flow_b,
            os.path.join(output_dir, "weighted_angle_value_histograms.pdf"),
            weighted=True,
        )
        plots.plot_speed_correlation(
            flow_a, flow_b, os.path.join(output_dir, "speed_correlation.png"),
            label_a=f"{label_a} speed [µm/s]", label_b=f"{label_b} speed [µm/s]",
        )
    print("phase timings:", span_statistics())
    return results


def run_piv_comparison(
    piv_mat_path: str,
    movie,
    output_dir: str,
    method: str = "farneback",
    intensity_threshold: float = 10.0,
    arrow_boxsize: int = 15,
    cache_dir: Optional[str] = None,
    **flow_kwargs,
) -> Dict[str, FlowResult]:
    """PIV-vs-flow workflow (ref analyse_short_timeinterval_data.py:505-638):
    load PIVlab vectors, upsample to the pixel grid, threshold, run our
    flow, and compare (side-by-side overlay movie, speed correlation,
    angle histograms)."""
    from opticalflow_tpu.io.interop import (
        convert_PIV_result, filter_PIV_flow_result, load_mat)

    os.makedirs(output_dir, exist_ok=True)
    cache = ResultCache(cache_dir or os.path.join(output_dir, "cache"))
    movie = np.asarray(movie)

    with span("piv:load+upsample"):
        piv_flow = convert_PIV_result(load_mat(piv_mat_path), movie)
        filter_PIV_flow_result(piv_flow, intensity_threshold=intensity_threshold)
        piv_flow.save(os.path.join(output_dir, "PIV_optical_flow_result.npy"))

    with span(f"flow:{method}"):
        own_flow = cache.get_or_compute(
            movie,
            lambda: _compute_flow(movie, method, **flow_kwargs),
            method=method, **{k: v for k, v in flow_kwargs.items()
                              if np.isscalar(v) or v is None},
        )
        own_flow.save(os.path.join(output_dir, f"{method}_flow_result.npy"))

    from opticalflow_tpu.viz import plots

    with span("viz:piv-compare"):
        plots.make_two_channel_overlay_movie(
            piv_flow, own_flow, os.path.join(output_dir, "PIV_joint_flow.mp4"),
            label_a="PIV", label_b=method, arrow_boxsize=arrow_boxsize,
            shared_movie=movie,
        )
        plots.plot_speed_correlation(
            piv_flow, own_flow, os.path.join(output_dir, "PIV_speed_correlation.png"),
            label_a="PIV speed", label_b=f"{method} speed",
        )
        plots.plot_angle_between_histogram(
            piv_flow, own_flow, os.path.join(output_dir, "PIV_angle_histogram.pdf"))
        plots.plot_polar_angle_histogram(
            piv_flow, own_flow,
            os.path.join(output_dir, "PIV_polar_angle_histogram.pdf"),
            title=f"Angle PIV vs {method}",
        )
    print("phase timings:", span_statistics())
    return {"piv": piv_flow, method: own_flow}


def run_ground_truth_validation(
    movie,
    measurements_path: str,
    output_dir: str,
    method: str = "farneback",
    frame: int = 8,
    cache_dir: Optional[str] = None,
    **flow_kwargs,
) -> Dict[str, np.ndarray]:
    """Hand-clicked ground-truth workflow
    (ref analyse_short_timeinterval_data.py:128-239, 640-745): compute
    flow (delta_x = delta_t = 1 so fields are displacements/frame),
    sample it at the measured start points, report relative errors and
    save the validation quiver figure."""
    from opticalflow_tpu.analysis.groundtruth import (
        compare_ground_truth_displacement, load_displacement_measurements)

    os.makedirs(output_dir, exist_ok=True)
    cache = ResultCache(cache_dir or os.path.join(output_dir, "cache"))
    movie = np.asarray(movie)

    with span(f"flow:{method}"):
        flow = cache.get_or_compute(
            movie,
            lambda: _compute_flow(movie, method, delta_x=1.0, delta_t=1.0,
                                  **flow_kwargs),
            method=method, ground_truth=True,
        )

    with span("ground-truth:compare"):
        measurements = load_displacement_measurements(measurements_path)
        comparison = compare_ground_truth_displacement(flow, measurements, frame=frame)

    from opticalflow_tpu.viz import plots

    with span("viz:ground-truth"):
        plots.plot_ground_truth_validation(
            flow, measurements, os.path.join(output_dir, "velocity_validation.pdf"),
            frame=frame,
        )
    np.save(os.path.join(output_dir, "ground_truth_comparison.npy"), comparison)
    print("relative errors:", comparison["relative_errors"])
    print("phase timings:", span_statistics())
    return comparison
