"""MODWT-based wavelet denoising.

TPU-native re-design of the reference's ``WaveletDenoiser``
(``/root/reference/vectorwave-core/.../wavelet/denoising/WaveletDenoiser.java:44-649``):
pure functions instead of a builder object, with the on-the-fly
"DenoisedMultiLevelResult" wrapper replaced by explicit functional editing of
the coefficient pytree.  All steps (MAD sigma, threshold selection, shrinkage,
reconstruction) are jnp ops, so an entire denoise is one fused jit graph; the
batch-parallel variant of the reference (``ParallelWaveletDenoiser``) is just
leading batch axes / ``vmap`` here.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.thresholds import (
    apply_threshold,
    block_shrink,
    mad_sigma,
    select_threshold,
)
from ..transforms.modwt import MODWTResult, imodwt, modwt
from ..transforms.multilevel import (
    MultiLevelMODWTResult,
    imodwt_multilevel,
    modwt_multilevel,
)


def denoise(
    x: jnp.ndarray,
    wavelet,
    *,
    method: str = "universal",
    mode: str = "soft",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """Single-level denoise (``WaveletDenoiser.denoise`` :124-142).

    sigma is estimated from the detail coefficients by MAD/0.6745, the
    threshold selected per ``method``, applied to the details only, and the
    signal reconstructed.
    """
    res = modwt(x, wavelet, boundary=boundary)
    sigma = mad_sigma(res.detail)
    threshold = select_threshold(res.detail, sigma, method)
    denoised = MODWTResult(res.approx, apply_threshold(res.detail, threshold, mode))
    return imodwt(denoised, wavelet, boundary=boundary)


def denoise_fixed(
    x: jnp.ndarray,
    wavelet,
    threshold,
    *,
    mode: str = "soft",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """Denoise with an explicit threshold (``denoiseFixed`` :354-364)."""
    res = modwt(x, wavelet, boundary=boundary)
    denoised = MODWTResult(res.approx, apply_threshold(res.detail, threshold, mode))
    return imodwt(denoised, wavelet, boundary=boundary)


def threshold_coeffs(
    result: MultiLevelMODWTResult,
    sigma,
    *,
    method: str = "universal",
    mode: str = "soft",
) -> MultiLevelMODWTResult:
    """Level-dependent thresholding of a multi-level decomposition.

    Mirrors ``DenoisedMultiLevelResult`` (:175-231): at level j the noise std
    scales as ``sigma / sqrt(2^j)`` under the per-stage MODWT filter scaling,
    each level's threshold is selected with that scaled sigma, and only detail
    coefficients are shrunk (the approximation passes through).
    """
    new_details = []
    for level, detail in enumerate(result.details, start=1):
        level_sigma = sigma / jnp.sqrt(2.0**level)
        threshold = select_threshold(detail, level_sigma, method)
        new_details.append(apply_threshold(detail, threshold, mode))
    return MultiLevelMODWTResult(tuple(new_details), result.approx)


def denoise_multilevel(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int | None = None,
    method: str = "universal",
    mode: str = "soft",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """Multi-level denoise with level-dependent thresholds
    (``denoiseMultiLevel`` :155-171)."""
    res = modwt_multilevel(x, wavelet, levels=levels, boundary=boundary)
    sigma = mad_sigma(res.details[0])  # finest scale estimates the noise floor
    denoised = threshold_coeffs(res, sigma, method=method, mode=mode)
    return imodwt_multilevel(denoised, wavelet, boundary=boundary)


def denoise_block(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int | None = None,
    boundary: str = "periodic",
    block_size: int | None = None,
) -> jnp.ndarray:
    """Multi-level NeighBlock denoise (beyond the reference's rules).

    Like :func:`denoise_multilevel` but each detail level is shrunk in
    blocks with :func:`~vectorwave_tpu.ops.thresholds.block_shrink` — a
    strong neighbour rescues weak coefficients inside a feature, which
    typically gains ~1 dB over term-by-term universal soft thresholding on
    signals with localized structure (doppler/bumps-type fixtures; see
    ``tests/test_block_fdr.py``).  The per-level noise floor follows the
    same ``sigma / sqrt(2^j)`` MODWT scaling as :func:`threshold_coeffs`.
    """
    res = modwt_multilevel(x, wavelet, levels=levels, boundary=boundary)
    sigma = mad_sigma(res.details[0])
    new_details = []
    for level, detail in enumerate(res.details, start=1):
        level_sigma = sigma / jnp.sqrt(2.0**level)
        new_details.append(
            block_shrink(detail, level_sigma, block_size=block_size)
        )
    denoised = MultiLevelMODWTResult(tuple(new_details), res.approx)
    return imodwt_multilevel(denoised, wavelet, boundary=boundary)
