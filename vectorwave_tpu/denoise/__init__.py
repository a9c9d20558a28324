from .denoiser import (
    denoise,
    denoise_fixed,
    denoise_multilevel,
    threshold_coeffs,
)

__all__ = ["denoise", "denoise_fixed", "denoise_multilevel", "threshold_coeffs"]
