"""CWT significance testing against red-noise backgrounds (Torrence & Compo).

Beyond-reference capability completing the cross-wavelet toolkit: the
chi-squared significance test of wavelet power against an AR(1) ("red
noise") null, the lag-1 coefficient estimator, and the cone of influence —
the standard apparatus for deciding which scalogram features are real.

Design note — exact backgrounds instead of the textbook approximation:
Torrence & Compo evaluate the AR(1) spectrum at each scale's single
equivalent Fourier frequency, which assumes their particular wavelet
normalization and a narrow bandpass.  Here the null expectation is computed
EXACTLY for this package's own filter bank: the CWT row of a unit impulse
gives each scale's transfer function H_s, and for any stationary null with
PSD S(f),

    E|W(s, t)|^2 = mean_f S(f) |H_s(f)|^2

(one delta-CWT + one FFT at trace time, whatever the normalization or
wavelet).  ``|W|^2 / E|W|^2`` is then chi-squared: 2 dof for complex /
analytic coefficients, 1 for real ones.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..errors import ErrorCode, InvalidArgumentError
from .cwt import CWTResult, _resolve_continuous, cwt, validate_scales

__all__ = [
    "ar1_coefficient",
    "coherence_significance",
    "cone_of_influence",
    "phase_randomized_surrogates",
    "significance_levels",
    "significant_power",
    "SignificanceResult",
]


def ar1_coefficient(x: jnp.ndarray) -> jnp.ndarray:
    """Lag-1 autocorrelation (the red-noise null's ``a``), ``[...]``.

    Computed on the mean-removed series; clipped to [0, 1) so a slightly
    negative estimate on white-ish noise degrades to the white null.
    """
    xc = x - x.mean(axis=-1, keepdims=True)
    num = (xc[..., 1:] * xc[..., :-1]).sum(axis=-1)
    den = (xc**2).sum(axis=-1)
    return jnp.clip(num / jnp.maximum(den, 1e-30), 0.0, 1.0 - 1e-6)


def _chi2_quantile_scalar(q: float, dof: float) -> float:
    from statistics import NormalDist

    if abs(dof - 2.0) < 1e-9:
        return -2.0 * math.log(1.0 - q)  # exact for 2 dof
    if abs(dof - 1.0) < 1e-9:
        return NormalDist().inv_cdf((1.0 + q) / 2.0) ** 2  # exact for 1 dof
    z = NormalDist().inv_cdf(q)
    h = 2.0 / (9.0 * dof)
    return dof * (1.0 - h + z * math.sqrt(h)) ** 3


def _bank_power_response(
    scales: tuple[float, ...], wavelet, n: int, analytic: bool
) -> jnp.ndarray:
    """``|H_s(f)|^2`` of the package's own CWT filters, ``[S, N]``.

    The CWT of a centered unit impulse IS the bank's impulse-response
    matrix (periodic boundary keeps it exactly circular)."""
    delta = jnp.zeros((n,), jnp.result_type(float))
    delta = delta.at[n // 2].set(1.0)
    r = cwt(delta, scales, wavelet, analytic=analytic, boundary="periodic")
    return jnp.abs(jnp.fft.fft(r.coeffs, axis=-1)) ** 2


def significance_levels(
    scales: Sequence[float],
    wavelet="morl",
    *,
    n: int,
    lag1: jnp.ndarray | float,
    variance: jnp.ndarray | float = 1.0,
    confidence: float = 0.95,
    analytic: bool = True,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Per-scale power significance levels ``[..., S]`` for length-``n``
    signals under an AR(1) null.

    ``lag1``/``variance`` may be scalars or batched arrays (as returned by
    :func:`ar1_coefficient` / ``x.var(axis=-1)``).  ``analytic`` must match
    how the scalogram was computed (complex/analytic coefficients have
    2 dof, real ones 1).
    """
    scales = validate_scales(scales)
    if not (0.0 < confidence < 1.0):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"confidence must be in (0, 1), got {confidence}",
        )
    del dt  # scales and lag1 are both in sample units; dt only relabels axes
    h2 = _bank_power_response(scales, wavelet, n, analytic)  # [S, N]
    freqs = np.fft.fftfreq(n)  # cycles/sample
    a = jnp.asarray(lag1)[..., None, None]
    var = jnp.asarray(variance)[..., None]
    cosf = jnp.asarray(np.cos(2.0 * np.pi * freqs))  # [N]
    psd = (1.0 - a**2) / (1.0 + a**2 - 2.0 * a * cosf)  # [..., 1, N]
    expected = var * (psd * h2).mean(axis=-1)  # [..., S]
    dof = 2.0 if analytic else 1.0
    quant = _chi2_quantile_scalar(confidence, dof)
    return expected * (quant / dof)


class SignificanceResult(NamedTuple):
    """Per-scale levels ``[..., S]`` + boolean mask ``[..., S, N]``."""

    levels: jnp.ndarray
    mask: jnp.ndarray
    coi_scales: jnp.ndarray  # [N] max reliable scale per time


def cone_of_influence(
    n: int,
    *,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Max reliable scale per time position, ``[N]``.

    Edge effects at time t reach scales up to ``min(t, N-1-t) * dt /
    sqrt(2)``: the e-folding time of a Gaussian-envelope wavelet
    (Morlet/DOG families) is ``sqrt(2) * s`` in this package's scale
    convention; coefficients at larger scales overlap the signal edge.
    """
    if n < 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_TOO_SHORT, f"signal length must be >= 1, got {n}"
        )
    t = np.arange(n, dtype=np.float64)
    dist = np.minimum(t, n - 1 - t) * dt
    return jnp.asarray(dist / math.sqrt(2.0))


def significant_power(
    result: CWTResult,
    x: jnp.ndarray,
    wavelet="morl",
    *,
    confidence: float = 0.95,
    lag1: jnp.ndarray | float | None = None,
    dt: float = 1.0,
) -> SignificanceResult:
    """Test a scalogram against the AR(1) null fitted to ``x`` itself.

    Returns per-scale levels, the boolean significance mask (power above
    level AND inside the cone of influence), and the COI curve.
    ``wavelet`` must be the one that produced ``result``.
    """
    _resolve_continuous(wavelet)
    power = jnp.abs(result.coeffs) ** 2
    analytic = bool(jnp.iscomplexobj(result.coeffs))
    a = ar1_coefficient(x) if lag1 is None else jnp.asarray(lag1)
    var = x.var(axis=-1)
    n = power.shape[-1]
    levels = significance_levels(
        result.scales,
        wavelet,
        n=n,
        lag1=a,
        variance=var,
        confidence=confidence,
        analytic=analytic,
        dt=dt,
    )
    coi = cone_of_influence(n, dt=dt)
    scale_col = jnp.asarray(np.asarray(result.scales))[:, None]  # [S, 1]
    mask = (power > levels[..., None]) & (scale_col <= coi[None, :])
    return SignificanceResult(levels, mask, coi)


def phase_randomized_surrogates(
    x: jnp.ndarray, n_surrogates: int, *, key=None
) -> jnp.ndarray:
    """``[K, ..., N]`` surrogates with x's exact power spectrum but random
    phases — the standard null for coherence/phase-locking tests (same
    autocorrelation, no cross-coupling)."""
    import jax

    if n_surrogates < 1:
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"n_surrogates must be >= 1, got {n_surrogates}",
        )
    if key is None:
        key = jax.random.key(0)
    n = x.shape[-1]
    spec = jnp.fft.rfft(x, axis=-1)
    phases = jax.random.uniform(
        key, (n_surrogates, *spec.shape), minval=0.0, maxval=2.0 * math.pi
    )
    # keep DC (and Nyquist, if present) real: zero their random phase
    keep = np.zeros(spec.shape[-1])
    keep[0] = 1.0
    if n % 2 == 0:
        keep[-1] = 1.0
    phases = phases * (1.0 - jnp.asarray(keep))
    rot = jnp.cos(phases) + 1j * jnp.sin(phases)
    return jnp.fft.irfft(spec[None] * rot, n=n, axis=-1).astype(x.dtype)


def coherence_significance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: Sequence[float],
    wavelet="morl",
    *,
    n_surrogates: int = 64,
    confidence: float = 0.95,
    key=None,
    **coherence_kwargs,
) -> jnp.ndarray:
    """Per-scale coherence significance levels ``[S]`` by Monte Carlo.

    Computes the wavelet coherence of ``n_surrogates`` phase-randomized
    surrogate PAIRS (same spectra as x and y, independent phases) in ONE
    batched call — the surrogate axis is just a batch axis, so the whole
    null ensemble is a single fused device computation — and returns the
    per-scale ``confidence`` quantile of the time-averaged null coherence.
    Observed ``mean_coherence()`` above this level rejects independence.
    """
    import jax

    from .xwt import wavelet_coherence

    if not (0.0 < confidence < 1.0):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"confidence must be in (0, 1), got {confidence}",
        )
    if key is None:
        key = jax.random.key(7)
    kx, ky = jax.random.split(key)
    sx = phase_randomized_surrogates(x, n_surrogates, key=kx)
    sy = phase_randomized_surrogates(y, n_surrogates, key=ky)
    null = wavelet_coherence(
        sx, sy, scales, wavelet, **coherence_kwargs
    ).mean_coherence()  # [K, ..., S]
    return jnp.quantile(null, confidence, axis=0)
