"""External-tool interop: PIVlab, Ncorr (DIC), Liu-Shen MATLAB results.

Equivalents of the reference's L4 interop layer:
``convert_PIV_result`` / ``filter_PIV_flow_result``
(/root/reference/source/optical_flow.py:2141-2251),
``postprocess_PIV.threshold_PIV_result`` (analysis/postprocess_PIV.py:39-59)
and the Ncorr loader (analysis/postprocess_ncorr.py:18-41).  All host-side
(.mat parsing + scipy griddata), converting external results into the
engine's FlowResult contract.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from opticalflow_tpu.core.types import FlowResult
from opticalflow_tpu.ops.blur import blur_movie


def load_mat(path: str) -> dict:
    """Load a MATLAB file, handling both classic (<=v7.2, scipy) and v7.3
    (HDF5) files; mat73 is optional and only needed for the latter."""
    import scipy.io

    try:
        return scipy.io.loadmat(path)
    except NotImplementedError:
        try:
            import mat73
        except ImportError as err:
            raise ImportError(
                f"{path} is a MATLAB v7.3 file; the mat73 package is required"
            ) from err
        return mat73.loadmat(path)


def _unwrap_cells(cell_array) -> np.ndarray:
    """PIVlab stores per-frame grids as object (cell) arrays; stack them."""
    n = len(cell_array)
    first = cell_array[0][0]
    out = np.zeros((n, first.shape[0], first.shape[1]))
    for k in range(n):
        out[k] = cell_array[k][0]
    return out


def convert_PIV_result(PIV_result, movie, delta_x: float = 1.0, delta_t: float = 1.0) -> FlowResult:
    """PIVlab .mat dict -> FlowResult with velocities cubic-upsampled to
    the pixel grid (ref optical_flow.py:2141-2230)."""
    import scipy.interpolate

    movie = np.asarray(movie)
    x_loc = _unwrap_cells(PIV_result["x"] * delta_x)
    y_loc = _unwrap_cells(PIV_result["y"] * delta_x)
    v_x = _unwrap_cells(PIV_result["u_original"] * delta_x / delta_t)
    v_y = _unwrap_cells(PIV_result["v_original"] * delta_x / delta_t)

    X, Y = np.meshgrid(np.arange(movie.shape[1]), np.arange(movie.shape[2]))
    n_pairs = movie.shape[0] - 1
    vx_up = np.zeros((n_pairs, movie.shape[1], movie.shape[2]))
    vy_up = np.zeros_like(vx_up)
    for k in range(n_pairs):
        ok = np.logical_and(~np.isnan(v_x[k]), ~np.isnan(v_y[k]))
        points = (x_loc[k][ok].ravel(), y_loc[k][ok].ravel())
        vx_up[k] = scipy.interpolate.griddata(points, v_x[k][ok].ravel(), (X, Y), method="cubic")
        vy_up[k] = scipy.interpolate.griddata(points, v_y[k][ok].ravel(), (X, Y), method="cubic")

    result = FlowResult(
        v_x=vx_up,
        v_y=vy_up,
        speed=np.sqrt(vx_up**2 + vy_up**2),
        original_data=movie,
        delta_x=delta_x,
        delta_t=delta_t,
    )
    result["x_locations"] = x_loc
    result["y_locations"] = y_loc
    result["PIV_v_x"] = v_x
    result["PIV_v_y"] = v_y
    return result


def filter_PIV_flow_result(flow_result, intensity_threshold: float = 10,
                           speed_threshold: float = 7) -> None:
    """Zero out velocities at dim pixels / unrealistic speeds, in place
    (ref :2232-2251; note the reference hard-codes 7 for the speed cut
    regardless of the argument — here the argument is honoured)."""
    blurred = np.asarray(blur_movie(flow_result["original_data"], 3))
    dim = blurred[:-1] < intensity_threshold
    flow_result["v_x"][dim] = 0.0
    flow_result["v_y"][dim] = 0.0
    fast = flow_result["speed"] > speed_threshold
    flow_result["v_x"][fast] = 0.0
    flow_result["v_y"][fast] = 0.0
    flow_result["speed"][fast] = 0.0


def threshold_PIV_vectors(x_locations, y_locations, v_x, v_y, speed, raw_movie,
                          delta_x: float, speed_band=(0.01, 0.08),
                          window_size: int = 151, threshold: float = -5) -> None:
    """Zero PIV vectors over background (inverse adaptive-threshold mask of
    the sigma-3 blurred movie) or outside a plausible speed band, in place
    (ref analysis/postprocess_PIV.py:39-59)."""
    from opticalflow_tpu.ops.threshold import apply_adaptive_threshold

    blurred = np.asarray(blur_movie(raw_movie, smoothing_sigma=3.0))
    masks = np.logical_not(
        np.asarray(apply_adaptive_threshold(blurred, window_size=window_size,
                                            threshold=threshold))
    )
    for k in range(x_locations.shape[0]):
        xi = np.int64(x_locations[k] / delta_x)
        yi = np.int64(y_locations[k] / delta_x)
        # note the reference indexes the mask [y, x] here (:51)
        background = masks[k, yi, xi]
        out_of_band = (speed[k] < speed_band[0]) | (speed[k] > speed_band[1])
        kill = background | out_of_band
        v_x[k][kill] = 0.0
        v_y[k][kill] = 0.0
        speed[k][kill] = 0.0


def convert_mudic_result(displacement_field, coordinates,
                         delta_x: float = 1.0, delta_t: float = 1.0) -> dict:
    """muDIC (digital image correlation) fields -> velocity/coordinate
    arrays in physical units (ref analysis/try_mu_dic.py:42-53).

    ``displacement_field`` / ``coordinates`` are muDIC ``Fields.disp()`` /
    ``Fields.coords()`` arrays of shape (1, 2, n_elx, n_ely, n_frames); the
    muDIC package itself is not required (it is absent from this image) —
    callers run the DIC job elsewhere and convert its arrays here.
    """
    displacement_field = np.asarray(displacement_field)
    coordinates = np.asarray(coordinates)
    n_frames = displacement_field.shape[-1]
    scale = delta_x / delta_t
    v_x = np.moveaxis(displacement_field[0, 0], -1, 0) * scale
    v_y = np.moveaxis(displacement_field[0, 1], -1, 0) * scale
    x_coords = np.moveaxis(coordinates[0, 0], -1, 0) * delta_x
    y_coords = np.moveaxis(coordinates[0, 1], -1, 0) * delta_x
    return {
        "v_x": v_x,
        "v_y": v_y,
        "speed": np.sqrt(v_x**2 + v_y**2),
        "x_coords": x_coords,
        "y_coords": y_coords,
        "x_start_coords": coordinates[0, 0, :, :, 0] * delta_x,
        "y_start_coords": coordinates[0, 1, :, :, 0] * delta_x,
        "n_frames": n_frames,
        "delta_x": delta_x,
        "delta_t": delta_t,
    }


def convert_ncorr_result(ncorr_result, delta_x: float = 1.0, delta_t: float = 1.0,
                         corrcoef_threshold: float = 0.3):
    """Ncorr (digital image correlation) .mat -> (v_x, v_y) with
    low-correlation vectors zeroed (ref analysis/postprocess_ncorr.py:18-41)."""
    displacements = ncorr_result["data_dic_save"]["displacements"]
    first = np.asarray(displacements[0]["plot_u_dic"])
    n = len(displacements)
    v_x = np.zeros((n,) + first.shape)
    v_y = np.zeros_like(v_x)
    scale = delta_x / delta_t
    for k, disp in enumerate(displacements):
        cc = np.asarray(disp["plot_corrcoef_dic"])
        vx = np.asarray(disp["plot_u_dic"]) * scale
        vy = np.asarray(disp["plot_v_dic"]) * scale
        vx[cc < corrcoef_threshold] = 0.0
        vy[cc < corrcoef_threshold] = 0.0
        v_x[k] = vx
        v_y[k] = vy
    return v_x, v_y


def convert_liu_result(
    liu_result,
    movie_shape=None,
    delta_x: float = 1.0,
    delta_t: float = 1.0,
) -> FlowResult:
    """Liu-Shen MATLAB ``.mat`` result -> FlowResult.

    Repaired port of the reference's ``postprocess_Liu.py`` loader, which
    ships broken (undefined variables / bad indentation at
    /root/reference/analysis/postprocess_Liu.py:38-59 — evidence the
    MATLAB comparison was done manually).  Semantics preserved from what
    that code *means*: the Liu-Shen MATLAB output stores single-pair pixel
    displacement fields under ``'ux'`` / ``'uy'`` (or per-frame cell
    arrays under ``'u_original'`` / ``'v_original'`` in PIVlab-style
    exports); velocities are scaled by ``delta_x / delta_t`` into physical
    units and packed into the standard flow-result contract.

    ``movie_shape``: optional ``(frames, X, Y)`` of the source movie —
    used to validate the field shape like the reference intended with its
    ``actin_movie``-shaped zero arrays (ref :38-41).
    """
    scale = delta_x / delta_t
    if "ux" in liu_result:
        v_x = np.asarray(liu_result["ux"], dtype=float)[None] * scale
        v_y = np.asarray(liu_result["uy"], dtype=float)[None] * scale
    elif "u_original" in liu_result:
        v_x = _unwrap_cells(liu_result["u_original"]) * scale
        v_y = _unwrap_cells(liu_result["v_original"]) * scale
    else:
        raise KeyError(
            "Liu-Shen result needs 'ux'/'uy' (single pair) or "
            "'u_original'/'v_original' (per-frame cells); got keys "
            f"{sorted(k for k in liu_result if not k.startswith('__'))}"
        )
    if movie_shape is not None and tuple(v_x.shape[1:]) != tuple(movie_shape[1:]):
        raise ValueError(
            f"Liu-Shen field shape {v_x.shape[1:]} does not match movie "
            f"frames {tuple(movie_shape[1:])}"
        )
    return FlowResult(
        v_x=v_x,
        v_y=v_y,
        speed=np.sqrt(v_x**2 + v_y**2),
        delta_x=delta_x,
        delta_t=delta_t,
    )
