"""Iterative wavelet-domain optimization (sparse inverse problems)."""

from .sparse import (
    SparseRecovery,
    bpdn,
    fista,
    inpaint,
    inpaint2,
    sparse_recover,
)

__all__ = [
    "SparseRecovery",
    "bpdn",
    "fista",
    "inpaint",
    "inpaint2",
    "sparse_recover",
]
