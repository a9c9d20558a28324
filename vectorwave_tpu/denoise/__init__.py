from .denoiser import (
    denoise,
    denoise_block,
    denoise_fixed,
    denoise_multilevel,
    threshold_coeffs,
)
from .packet import denoise_packet, denoise_packet2
from .dtcwt_shrink import dtcwt2_denoise, dtcwt_denoise

__all__ = [
    "denoise",
    "denoise_block",
    "denoise_fixed",
    "denoise_multilevel",
    "dtcwt_denoise",
    "dtcwt2_denoise",
    "denoise_packet",
    "denoise_packet2",
    "threshold_coeffs",
]
