"""Iterative wavelet-domain optimization (sparse inverse problems, deconvolution)."""

from .deconvolve import DeconvolutionResult, deconvolve
from .sparse import (
    SparseRecovery,
    bpdn,
    fista,
    inpaint,
    inpaint2,
    sparse_recover,
)

__all__ = [
    "DeconvolutionResult",
    "deconvolve",
    "SparseRecovery",
    "bpdn",
    "fista",
    "inpaint",
    "inpaint2",
    "sparse_recover",
]
