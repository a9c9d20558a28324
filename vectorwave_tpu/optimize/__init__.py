"""Iterative wavelet-domain optimization (sparse inverse problems, deconvolution, matching pursuit)."""

from .mp import MPResult, matching_pursuit
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
    "MPResult",
    "matching_pursuit",
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
