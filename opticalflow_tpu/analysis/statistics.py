"""Flow-field statistics and cross-channel / cross-method comparison.

Equivalents of the quantitative pieces of the reference's analysis layer:

* angle-to-y-axis of each velocity vector and its histogramming
  (ref analysis/compare_rho_and_actin.py:693-697);
* scalar-product angle between two channels' flow fields with
  speed-product weighting (ref :812-830... same file :744-767);
* speed correlation (2-D histogram inputs, ref :760-767);
* synthetic ground-truth error statistics
  (``check_error_of_method``-style, ref :302-375);
* illumination-change correction by subtracting the blurred inter-frame
  difference (ref analyse_short_timeinterval_data.py:241-301).

Compute is numpy/jnp array math (the host drives plotting; heavy inputs
arrive from device results).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from opticalflow_tpu.ops.blur import blur_movie


def velocity_angles(flow_result) -> np.ndarray:
    """Signed angle of each velocity vector to the y axis
    (arccos(v_y/speed) * sign(v_x), ref :693-697)."""
    v_x = np.asarray(flow_result["v_x"])
    v_y = np.asarray(flow_result["v_y"])
    speed = np.asarray(flow_result["speed"])
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.arccos(v_y / speed) * np.sign(v_x)


def angles_between(flow_a, flow_b) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel angle between two flow fields and the speed-product
    weights the reference uses for the weighted histogram (ref :744-758)."""
    dot = (
        np.asarray(flow_a["v_x"]) * np.asarray(flow_b["v_x"])
        + np.asarray(flow_a["v_y"]) * np.asarray(flow_b["v_y"])
    )
    speeds = np.asarray(flow_a["speed"]) * np.asarray(flow_b["speed"])
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = np.arccos(dot / speeds)
    return theta, speeds


def speed_pairs(flow_a, flow_b, threshold: float = 0.01) -> Tuple[np.ndarray, np.ndarray]:
    """Paired speeds where channel b moves faster than ``threshold`` —
    the inputs of the reference's speed-correlation hist2d (ref :760-767)."""
    a = np.asarray(flow_a["speed"])
    b = np.asarray(flow_b["speed"])
    # finite-only: PIV results upsampled with griddata are NaN outside the
    # convex hull of the vector grid (ref optical_flow.py:2196-2204)
    mask = (b > threshold) & np.isfinite(a) & np.isfinite(b)
    return a[mask].ravel(), b[mask].ravel()


def ground_truth_error_statistics(flow_result, true_v_x: float, true_v_y: float,
                                  mask: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Error statistics against a known uniform velocity (the synthetic
    accuracy check of ref :302-375, as numbers instead of prints)."""
    v_x = np.array(flow_result["v_x"], dtype=float, copy=True)
    v_y = np.array(flow_result["v_y"], dtype=float, copy=True)
    v_x[np.isinf(v_x)] = 0.0
    v_y[np.isinf(v_y)] = 0.0
    if mask is not None:
        v_x = v_x[mask]
        v_y = v_y[mask]
    return {
        "mean_v_x": float(np.nanmean(v_x)),
        "mean_v_y": float(np.nanmean(v_y)),
        "median_v_x": float(np.nanmedian(v_x)),
        "median_v_y": float(np.nanmedian(v_y)),
        "bias_v_x": float(np.nanmean(v_x) - true_v_x),
        "bias_v_y": float(np.nanmean(v_y) - true_v_y),
        "rmse": float(
            np.sqrt(np.nanmean((v_x - true_v_x) ** 2 + (v_y - true_v_y) ** 2))
        ),
        "epe_mean": float(
            np.nanmean(np.sqrt((v_x - true_v_x) ** 2 + (v_y - true_v_y) ** 2))
        ),
    }


def endpoint_error(flow_a, flow_b) -> Dict[str, float]:
    """EPE statistics between two flow results (golden-field regression
    metric, SURVEY.md section 4 strategy (c))."""
    d_x = np.asarray(flow_a["v_x"]) - np.asarray(flow_b["v_x"])
    d_y = np.asarray(flow_a["v_y"]) - np.asarray(flow_b["v_y"])
    epe = np.sqrt(d_x**2 + d_y**2)
    return {
        "epe_mean": float(np.nanmean(epe)),
        "epe_max": float(np.nanmax(epe)),
        "epe_median": float(np.nanmedian(epe)),
    }


def correct_intensity_change(movie, smoothing_sigma: float = 3.0,
                             correction_sigma: float = 5.0) -> np.ndarray:
    """Global illumination-change correction: subtract the
    ``correction_sigma``-blurred inter-frame difference from each frame so
    slow global intensity drift does not masquerade as remodelling/flow
    (the core computation of ref analyse_short_timeinterval_data.py:241-301,
    applied to every consecutive pair instead of one hand-picked pair)."""
    blurred = np.asarray(blur_movie(movie, smoothing_sigma=smoothing_sigma))
    corrected = blurred.copy()
    for k in range(1, blurred.shape[0]):
        difference = blurred[k] - corrected[k - 1]
        blurred_difference = np.asarray(
            blur_movie(difference[None], smoothing_sigma=correction_sigma)
        )[0]
        corrected[k] = blurred[k] - blurred_difference
    return corrected
