"""OpenCV Farneback optical flow interop (host-side comparison baseline).

Equivalent of the reference's ``conduct_opencv_flow``
(/root/reference/source/optical_flow.py:220-279), kept as a CPU interop
path like PIV: Farneback is a pyramidal algorithm with data-dependent
control flow that belongs on the host, and its role in the reference is
cross-method comparison, not production compute.

Faithful details: per-pair ``cv2.calcOpticalFlowFarneback`` with
``OPTFLOW_FARNEBACK_GAUSSIAN``, the previous pair's (negated) flow carried
into the next call (ref :258-264), unit scaling at the end, and the
result-dict contract (note the reference stores the *blurred* movie under
``original_data`` here, :275 — reproduced).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from opticalflow_tpu.core.types import FlowResult
from opticalflow_tpu.ops.blur import blur_movie

_DEFAULTS = dict(
    pyr_scale=0.5, levels=5, winsize=10, iterations=40, poly_n=5, poly_sigma=10,
)


def conduct_opencv_flow(
    movie,
    delta_x: float = 1.0,
    delta_t: float = 1.0,
    smoothing_sigma: Optional[float] = None,
    **kwargs,
) -> FlowResult:
    try:
        import cv2
    except ImportError as err:  # pragma: no cover
        raise ImportError(
            "conduct_opencv_flow needs opencv-python (host-side interop path)"
        ) from err

    movie = np.asarray(movie)
    if smoothing_sigma is not None:
        movie_to_analyse = np.asarray(blur_movie(movie, smoothing_sigma=smoothing_sigma))
    else:
        movie_to_analyse = movie

    params = dict(_DEFAULTS)
    params.update(kwargs)
    flags = params.pop("flags", cv2.OPTFLOW_FARNEBACK_GAUSSIAN)

    n_pairs = movie.shape[0] - 1
    v_x = np.zeros((n_pairs, movie.shape[1], movie.shape[2]))
    v_y = np.zeros_like(v_x)
    flow = None
    for k in range(n_pairs):
        flow = cv2.calcOpticalFlowFarneback(
            movie_to_analyse[k].astype(np.float32),
            movie[k + 1].astype(np.float32),
            flow,
            flags=flags,
            **params,
        )
        v_x[k] = flow[:, :, 0]
        v_y[k] = flow[:, :, 1]
        flow = -flow  # ref :264

    scale = delta_x / delta_t
    v_x *= scale
    v_y *= scale
    return FlowResult(
        v_x=v_x,
        v_y=v_y,
        speed=np.sqrt(v_x**2 + v_y**2),
        original_data=movie_to_analyse,  # ref stores the blurred stack here (:275)
        delta_x=delta_x,
        delta_t=delta_t,
    )
