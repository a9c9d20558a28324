"""Bivariate shrinkage denoising on the dual-tree complex wavelet transform.

The Sendur-Selesnick estimator (IEEE SPL 2002): wavelet coefficients and
their PARENTS (same position, next coarser level) are strongly dependent;
modeling the pair with a circular-symmetric bivariate Laplacian gives the
MAP shrinkage

    w_hat = w * max(0, sqrt(|w|^2 + |w_parent|^2) - lam) / sqrt(...)
    lam   = sqrt(3) * sigma_n^2 / sigma_local

which zeroes coefficients only when child AND parent are small.  On the
DTCWT the rule acts on complex MAGNITUDES — shift-invariant envelopes — so
edges neither ring nor shift, the classic advantage over decimated-DWT
thresholding.  Noise sigma_n comes from the finest level's MAD; the local
signal sigma from a moving window of |w|^2 (7 samples / 7x7), floored by
the noise power.

Beyond the reference's denoisers (universal/SURE/minimax/Bayes on the
MODWT, ``denoise/denoiser.py``), and complementary: use this one when
shift-invariant edge quality matters more than strict thresholding theory.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ..transforms.dtcwt import DTCWTResult, dtcwt, idtcwt
from ..transforms.dtcwt2 import DTCWT2Result, dtcwt2, idtcwt2

__all__ = ["dtcwt_denoise", "dtcwt2_denoise"]

_MAD = 0.6745


def _local_power(mag2: jnp.ndarray, window: int, axes) -> jnp.ndarray:
    """Moving-average of ``mag2`` over ``window`` per listed axis (periodic)."""
    out = mag2
    for ax in axes:
        acc = None
        for offset in range(-(window // 2), window - window // 2):
            term = jnp.roll(out, offset, axis=ax) if offset else out
            acc = term if acc is None else acc + term
        out = acc / window
    return out


def _bivariate(child: jnp.ndarray, parent_mag2: jnp.ndarray,
               sigma_n2: jnp.ndarray, window: int, axes) -> jnp.ndarray:
    mag2 = jnp.abs(child) ** 2
    local = _local_power(mag2, window, axes)
    sigma_local = jnp.sqrt(jnp.maximum(local - sigma_n2, 1e-12))
    lam = math.sqrt(3.0) * sigma_n2 / sigma_local
    r = jnp.sqrt(mag2 + parent_mag2)
    gain = jnp.maximum(r - lam, 0.0) / jnp.maximum(r, 1e-12)
    return child * gain


def _upsample_parent(mag2: jnp.ndarray, target_shape, axes) -> jnp.ndarray:
    """Repeat the parent's |w|^2 onto the child grid (nearest neighbor)."""
    out = mag2
    for ax in axes:
        out = jnp.repeat(out, 2, axis=ax)
        if out.shape[ax] != target_shape[ax]:
            out = jnp.moveaxis(
                jnp.moveaxis(out, ax, -1)[..., : target_shape[ax]], -1, ax
            )
    return out


def dtcwt_denoise(
    x: jnp.ndarray,
    wavelet="sym8",
    *,
    levels: int = 5,
    window: int = 7,
    noise_sigma: float | None = None,
) -> jnp.ndarray:
    """Bivariate-shrinkage denoising of ``[..., N]`` signals."""
    res = dtcwt(x, wavelet, levels=levels)
    finest = res.highpasses[0]
    if noise_sigma is None:
        sigma_n = jnp.median(
            jnp.abs(jnp.real(finest) - jnp.median(jnp.real(finest), axis=-1, keepdims=True)),
            axis=-1, keepdims=True,
        ) / _MAD * math.sqrt(2.0)  # complex coeff total noise power
    else:
        sigma_n = jnp.asarray(noise_sigma)
    sigma_n2 = sigma_n**2
    new_hp = []
    for j, z in enumerate(res.highpasses, start=1):
        if j < res.levels:
            parent = res.highpasses[j]
            p2 = _upsample_parent(
                jnp.abs(parent) ** 2, z.shape, axes=(z.ndim - 1,)
            )
        else:
            p2 = jnp.zeros_like(jnp.abs(z))
        new_hp.append(_bivariate(z, p2, sigma_n2, window, (z.ndim - 1,)))
    return idtcwt(
        DTCWTResult(tuple(new_hp), res.lowpass_a, res.lowpass_b), wavelet
    )


def dtcwt2_denoise(
    image: jnp.ndarray,
    wavelet="sym8",
    *,
    levels: int = 4,
    window: int = 7,
    noise_sigma: float | None = None,
) -> jnp.ndarray:
    """Bivariate-shrinkage denoising of ``[..., H, W]`` images (all six
    oriented subbands, parent = same orientation one level coarser)."""
    res = dtcwt2(image, wavelet, levels=levels)
    finest = res.highpasses[0]
    if noise_sigma is None:
        re = jnp.real(finest)
        sigma_n = jnp.median(
            jnp.abs(re - jnp.median(re, axis=(-2, -1), keepdims=True)),
            axis=(-2, -1), keepdims=True,
        ) / _MAD * math.sqrt(2.0)
    else:
        sigma_n = jnp.asarray(noise_sigma)
    sigma_n2 = sigma_n**2
    new_hp = []
    for j, z in enumerate(res.highpasses, start=1):
        if j < res.levels:
            parent = res.highpasses[j]
            p2 = _upsample_parent(
                jnp.abs(parent) ** 2, z.shape, axes=(z.ndim - 2, z.ndim - 1)
            )
        else:
            p2 = jnp.zeros_like(jnp.abs(z))
        new_hp.append(
            _bivariate(z, p2, sigma_n2, window, (z.ndim - 2, z.ndim - 1))
        )
    return idtcwt2(DTCWT2Result(tuple(new_hp), res.lowpasses), wavelet)
