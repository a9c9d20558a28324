from .denoiser import (
    denoise,
    denoise_fixed,
    denoise_multilevel,
    threshold_coeffs,
)
from .packet import denoise_packet

__all__ = [
    "denoise",
    "denoise_fixed",
    "denoise_multilevel",
    "denoise_packet",
    "threshold_coeffs",
]
