"""Result caching / checkpoint-resume.

The reference's "poor-man's caching" is np.save of every expensive result
dict with commented-in/out reload toggles (ref
analysis/analyse_variational_optical_flow.py:235-238,
compare_rho_and_actin.py:627,649; SURVEY.md section 5).  The engine
formalises it: results are cached under a content hash of (movie, config),
so re-running an experiment with unchanged inputs is a load, and sweep /
movie runs can resume per frame pair.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Optional

import numpy as np

from opticalflow_tpu.core.types import FlowResult


def config_hash(movie, **config) -> str:
    """Stable hash of the movie contents + the configuration values."""
    hasher = hashlib.sha256()
    arr = np.ascontiguousarray(np.asarray(movie))
    hasher.update(str(arr.shape).encode())
    hasher.update(str(arr.dtype).encode())
    hasher.update(arr.tobytes())
    hasher.update(json.dumps(config, sort_keys=True, default=repr).encode())
    return hasher.hexdigest()[:16]


class ResultCache:
    """Directory-backed cache of FlowResults keyed by config hash."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def path_for(self, key: str) -> str:
        return os.path.join(self.cache_dir, f"flow_{key}.npy")

    def get(self, key: str) -> Optional[FlowResult]:
        path = self.path_for(key)
        if os.path.exists(path):
            return FlowResult.load(path)
        return None

    def put(self, key: str, result: FlowResult) -> str:
        path = self.path_for(key)
        tmp = path + ".tmp.npy"
        result.save(tmp)
        os.replace(tmp, path)
        return path

    def get_or_compute(self, movie, compute: Callable[[], FlowResult], **config) -> FlowResult:
        key = config_hash(movie, **config)
        cached = self.get(key)
        if cached is not None:
            return cached
        result = compute()
        self.put(key, result)
        return result
