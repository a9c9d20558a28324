"""On-disk cache for generated filter coefficient arrays.

Filter generation (spectral factorization, Gauss-Newton refinement) is exact
but can take seconds per family at high order; coefficients are tiny arrays,
so they are memoized to ``~/.cache/vectorwave_tpu/filters`` keyed by a schema
version + generator key.  Delete the directory to force regeneration.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

_SCHEMA_VERSION = 1


def _cache_dir() -> str:
    root = os.environ.get("VECTORWAVE_TPU_CACHE") or os.path.expanduser(
        "~/.cache/vectorwave_tpu"
    )
    path = os.path.join(root, f"filters_v{_SCHEMA_VERSION}")
    os.makedirs(path, exist_ok=True)
    return path


def cached_filter(key: str, generate: Callable[[], np.ndarray]) -> np.ndarray:
    """Return the cached array for ``key`` or generate-and-store it."""
    path = os.path.join(_cache_dir(), f"{key}.npy")
    try:
        return np.load(path)
    except (OSError, ValueError):
        pass
    arr = np.asarray(generate(), dtype=np.float64)
    # tmp name must END in .npy: np.save appends the suffix otherwise, which
    # silently broke the rename (and thus the whole cache) before
    tmp = f"{path}.{os.getpid()}.tmp.npy"
    try:
        np.save(tmp, arr)
        os.replace(tmp, path)
    except OSError:  # cache dir unwritable: still return the result
        pass
    return arr
