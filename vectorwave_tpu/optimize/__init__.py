"""Iterative wavelet-domain optimization (sparse inverse problems, deconvolution)."""

from .deconvolve import DeconvolutionResult, deconvolve, deconvolve2
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
    "deconvolve2",
    "SparseRecovery",
    "bpdn",
    "fista",
    "inpaint",
    "inpaint2",
    "sparse_recover",
]
