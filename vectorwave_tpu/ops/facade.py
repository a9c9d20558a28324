"""Operations facade: low-level MODWT convolution entry points + capability report.

TPU-native re-design of ``WaveletOperations``
(``/root/reference/vectorwave-core/.../wavelet/WaveletOperations.java:17-123``):
the scalar/FFT routing heuristic (``util/FftHeuristics.java:12-34``) is
replaced by a static rule — on TPU the strided roll formulation never
materializes à trous zeros, so the FFT path only wins for genuinely long
base filters; ``get_performance_info`` reports the platform capabilities the
way the reference reports Vector API availability.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .convolve import atrous_convolve, fft_circular_convolve

#: FFT threshold on the BASE filter length (reference heuristics key on the
#: upsampled length, FftHeuristics: N>=1024 && L > N/8; our kernels never
#: touch inserted zeros, so only the base-tap count matters).
FFT_MIN_SIGNAL = 1024
FFT_MIN_FILTER_RATIO = 8


def should_use_fft(signal_length: int, base_filter_length: int) -> bool:
    """FFT-vs-direct routing (FftHeuristics.shouldUseModwtFFT :30-34)."""
    return (
        signal_length >= FFT_MIN_SIGNAL
        and base_filter_length > signal_length / FFT_MIN_FILTER_RATIO
    )


def circular_convolve_modwt(
    x: jnp.ndarray, filt, *, spacing: int = 1
) -> jnp.ndarray:
    """Periodic MODWT convolution with automatic FFT routing
    (WaveletOperations.circularConvolveMODWT :29-39)."""
    filt = np.asarray(filt)
    if should_use_fft(x.shape[-1], len(filt)):
        return fft_circular_convolve(x, filt, spacing=spacing, sign=-1)
    return atrous_convolve(x, filt, spacing=spacing, boundary="periodic", sign=-1)


def zero_padding_convolve_modwt(
    x: jnp.ndarray, filt, *, spacing: int = 1
) -> jnp.ndarray:
    """Zero-extension MODWT convolution (ScalarOps.zeroPaddingConvolveMODWT)."""
    return atrous_convolve(x, filt, spacing=spacing, boundary="zero", sign=-1)


def symmetric_convolve_modwt(
    x: jnp.ndarray, filt, *, spacing: int = 1
) -> jnp.ndarray:
    """Symmetric-extension MODWT convolution (ScalarOps.symmetricConvolveMODWT)."""
    return atrous_convolve(x, filt, spacing=spacing, boundary="symmetric", sign=-1)


@dataclasses.dataclass(frozen=True)
class PerformanceInfo:
    """Platform capability report (WaveletOperations.getPerformanceInfo :68-90)."""

    platform: str
    device_kind: str
    device_count: int
    pallas_kernels: bool
    description: str


def get_performance_info() -> PerformanceInfo:
    devices = jax.devices()
    dev = devices[0]
    from ..kernels.modwt_pallas import pallas_available

    pallas = pallas_available()
    tier = "fused Pallas TPU kernels" if pallas else "portable XLA (jnp) kernels"
    return PerformanceInfo(
        platform=dev.platform,
        device_kind=dev.device_kind,
        device_count=len(devices),
        pallas_kernels=pallas,
        description=(
            f"{len(devices)}x {dev.device_kind} ({dev.platform}); compute tier: {tier}"
        ),
    )
