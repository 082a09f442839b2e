"""Hyperparameter tuning of the regularisation strengths.

Equivalent of the reference's ``optimize_regularisation_parameters``
(/root/reference/analysis/analyse_variational_optical_flow.py:617-724):
minimise the total functional (L1 + speed + remodelling) over
log10(alpha_s), log10(alpha_r) with scipy's shgo global optimizer.

Two objective backends:
* ``use_direct_solver=True`` — the reference's choice (robust at extreme
  alphas, CPU, small/downsampled movies only);
* device objective — the on-device Krylov solve (fast; recommended with
  bounds away from the degenerate low-alpha corner).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from opticalflow_tpu.core.types import SolverConfig
from opticalflow_tpu.flow.variational import variational_optical_flow


def total_functional(result) -> float:
    return float(
        result["L1_functional"]
        + result["speed_functional"]
        + result["remodelling_functional"]
    )


def optimize_regularisation_parameters(
    movie,
    delta_x: float = 1.0,
    delta_t: float = 1.0,
    bounds: Sequence[Tuple[float, float]] = ((-1, 8), (1, 8)),
    smoothing_sigma: Optional[float] = None,
    initial_v_x: float = 0.0,
    initial_v_y: float = 0.0,
    initial_remodelling: float = 0.0,
    use_direct_solver: bool = True,
    dy_mode: str = "compat",
    solver: Optional[SolverConfig] = None,
    shgo_kwargs: Optional[dict] = None,
    verbose: bool = False,
):
    """shgo over log10-regularisation bounds; returns (optimal alphas,
    minimum functional, scipy result)."""
    import scipy.optimize

    evaluations = []

    def objective(log10_params):
        a_s = float(np.power(10.0, log10_params[0]))
        a_r = float(np.power(10.0, log10_params[1]))
        result = variational_optical_flow(
            movie,
            delta_x=delta_x,
            delta_t=delta_t,
            speed_alpha=a_s,
            remodelling_alpha=a_r,
            smoothing_sigma=smoothing_sigma,
            initial_v_x=initial_v_x,
            initial_v_y=initial_v_y,
            initial_remodelling=initial_remodelling,
            use_direct_solver=use_direct_solver,
            dy_mode=dy_mode,
            solver=solver,
        )
        value = total_functional(result)
        evaluations.append((a_s, a_r, value))
        if verbose:
            print(f"alphas=({a_s:.4g}, {a_r:.4g}) functional={value:.6g}")
        return value

    opt = scipy.optimize.shgo(objective, bounds=list(bounds), **(shgo_kwargs or {}))
    optimal = np.power(10.0, opt.x)
    return optimal, float(opt.fun), opt
