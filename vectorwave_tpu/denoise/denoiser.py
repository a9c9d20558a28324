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
    (``denoiseMultiLevel`` :155-171).

    For sigma-only threshold rules (universal/minimax) on periodic/zero
    boundaries the whole pipeline runs as ONE fused kernel — the
    coefficient planes never touch HBM (8 B/sample of traffic instead of
    68; see tools/probe_write_wall.py for why that matters).  Sigma still
    comes from the exact MAD of the finest detail via a cheap single-level
    analysis.  Data-dependent rules (SURE/Bayes) and gradients take the
    materializing path.
    """
    fused = _try_fused_denoise(x, wavelet, levels, method, mode, boundary)
    if fused is not None:
        return fused
    res = modwt_multilevel(x, wavelet, levels=levels, boundary=boundary)
    sigma = mad_sigma(res.details[0])  # finest scale estimates the noise floor
    denoised = threshold_coeffs(res, sigma, method=method, mode=mode)
    return imodwt_multilevel(denoised, wavelet, boundary=boundary)


def _try_fused_denoise(x, wavelet, levels, method, mode, boundary):
    """Route sigma-only denoise rules through the one-pass fused kernel
    (kernels/modwt_mxu.run_denoise_composite); None = take the 3-call path."""
    from ..ops.thresholds import minimax_threshold, universal_threshold
    from ..transforms.multilevel import _pallas_eligible, _resolve_backend
    from ..transforms.modwt import _resolve_discrete

    if method not in ("universal", "minimax") or mode not in ("soft", "hard"):
        return None
    w = _resolve_discrete(wavelet)
    n = x.shape[-1]
    if levels is None:
        from ..transforms.multilevel import max_levels

        levels = max_levels(n, w)
    if levels < 2:
        return None
    if not _resolve_backend(
        None, lambda: _pallas_eligible(x, w, levels, boundary)
    ):
        return None
    from ..kernels.modwt_pallas import fused_denoise_multilevel

    # exact noise floor from the finest detail (single-level analysis is
    # ~4 B/sample of extra traffic)
    d1 = modwt(x, w, boundary=boundary).detail
    sigma = mad_sigma(d1)  # [..., 1]
    rule = universal_threshold if method == "universal" else minimax_threshold
    ths = jnp.concatenate(
        [
            jnp.asarray(
                rule(n, sigma / jnp.sqrt(2.0 ** level)), dtype=jnp.float32
            )
            for level in range(1, levels + 1)
        ],
        axis=-1,
    )  # [..., levels]
    return fused_denoise_multilevel(
        x, w, levels=levels, thresholds=ths, boundary=boundary, mode=mode
    )


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
