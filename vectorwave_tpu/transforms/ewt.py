"""Empirical wavelet transform: data-adaptive band decomposition.

Gilles' EWT (IEEE TSP 2013 — method reference): instead of a fixed dyadic
ladder, SEGMENT the signal's own spectrum (boundaries between its dominant
peaks) and build a Meyer-style tight-frame filterbank on those segments.
The result is an adaptive mode decomposition with the guarantees empirical
mode decomposition lacks: exact reconstruction, a real filterbank, no mode
mixing from sifting heuristics.

Split into two stages to stay jit-friendly:

* :func:`ewt_boundaries` (host-side, data-dependent): smooth the mean
  amplitude spectrum, take the ``n_bands-1`` deepest minima between the
  strongest peaks — returns plain floats (static for tracing).
* :func:`ewt` / :func:`iewt` (jittable): Meyer windows with cosine
  transitions satisfy ``sum g_k(w)^2 = 1`` exactly (tight frame), so
  synthesis = re-filter + sum is EXACT.  Boundaries may be a static
  float tuple (validated, f64-accurate bank) or a TRACED jnp array —
  the bank then builds on device, one compiled program serves every
  boundary set of a band count, and the transform is differentiable in
  the boundaries.

``ewt_hilbert`` returns per-band analytic signals (instantaneous
amplitude/frequency per mode — the EWT counterpart of Hilbert-Huang
spectra).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import ErrorCode, InvalidArgumentError, InvalidSignalError

__all__ = ["ewt_boundaries", "ewt", "iewt", "ewt_hilbert", "ewt_filterbank"]


def ewt_boundaries(
    x,
    n_bands: int,
    *,
    smooth: int = 9,
) -> tuple[float, ...]:
    """Detect ``n_bands - 1`` spectral boundaries (cycles/sample, host-side).

    Peaks of the smoothed mean amplitude spectrum are ranked by prominence;
    boundaries sit at the spectrum's minimum between consecutive kept
    peaks — Gilles' "lowest minima" rule.
    """
    arr = np.asarray(x, dtype=np.float64)
    if arr.ndim > 1:
        arr = arr.reshape(-1, arr.shape[-1])
    else:
        arr = arr[None]
    n = arr.shape[-1]
    if n_bands < 2:
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG, f"n_bands must be >= 2, got {n_bands}"
        )
    spec = np.abs(np.fft.rfft(arr, axis=-1)).mean(axis=0)
    spec[0] = 0.0  # DC belongs to the first band regardless
    if smooth > 1:
        kernel = np.hanning(smooth + 2)[1:-1]
        spec = np.convolve(spec, kernel / kernel.sum(), mode="same")
    peaks = [
        k
        for k in range(1, len(spec) - 1)
        if spec[k] >= spec[k - 1] and spec[k] > spec[k + 1]
    ]
    if len(peaks) < n_bands:
        raise InvalidSignalError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"Spectrum has only {len(peaks)} peaks; cannot split into "
            f"{n_bands} bands",
            suggestions=("Reduce n_bands or smooth less",),
        )

    def _prominence(k: int) -> float:
        # scipy-style: walk each way to the nearest strictly-higher sample
        # (or the edge), tracking the minimum; prominence = height above the
        # HIGHER of the two bases.  Ranking by raw height instead would let
        # ripples riding one dominant hump crowd out genuine weaker bands.
        h = spec[k]
        left_min, j = h, k - 1
        while j >= 0 and spec[j] < h:
            left_min = min(left_min, spec[j])
            j -= 1
        right_min, j = h, k + 1
        while j < len(spec) and spec[j] < h:
            right_min = min(right_min, spec[j])
            j += 1
        return float(h - max(left_min, right_min))

    top = sorted(sorted(peaks, key=lambda k: -_prominence(k))[:n_bands])
    freqs = np.fft.rfftfreq(n)
    bounds = []
    for left, right in zip(top[:-1], top[1:]):
        k_min = left + int(np.argmin(spec[left : right + 1]))
        bounds.append(float(freqs[k_min]))
    return tuple(bounds)


def _meyer_windows(n: int, bounds: tuple[float, ...], dtype) -> np.ndarray:
    """[n_bands, n//2+1] Meyer-style windows with sum of squares == 1."""
    freqs = np.fft.rfftfreq(n)
    omegas = list(bounds) + [0.5]
    # transition half-width per boundary: largest gamma keeping transitions
    # disjoint (Gilles eq. 2.9)
    gammas = []
    prev = 0.0
    for i, wn in enumerate(bounds):
        nxt = omegas[i + 1]
        g = 0.45 * min((wn - prev) / max(wn + prev, 1e-12),
                       (nxt - wn) / (nxt + wn))
        gammas.append(max(g, 1e-6))
        prev = wn

    def beta(t):
        t = np.clip(t, 0.0, 1.0)
        return t**4 * (35 - 84 * t + 70 * t**2 - 20 * t**3)

    def rise(w, wn, g):  # 0 -> 1 across [(1-g)wn, (1+g)wn]
        return np.sin(
            0.5 * math.pi * beta((w - (1 - g) * wn) / (2 * g * wn))
        )

    def fall(w, wn, g):  # 1 -> 0 across the same transition
        return np.cos(
            0.5 * math.pi * beta((w - (1 - g) * wn) / (2 * g * wn))
        )

    wins = []
    for band in range(len(bounds) + 1):
        if band == 0:
            win = fall(freqs, bounds[0], gammas[0])
            win[freqs <= (1 - gammas[0]) * bounds[0]] = 1.0
            win[freqs >= (1 + gammas[0]) * bounds[0]] = 0.0
        else:
            lo = bounds[band - 1]
            glo = gammas[band - 1]
            win = rise(freqs, lo, glo)
            win[freqs <= (1 - glo) * lo] = 0.0
            win[freqs >= (1 + glo) * lo] = 1.0
            if band < len(bounds) + 1 - 1:
                hi = bounds[band]
                ghi = gammas[band]
                upper = fall(freqs, hi, ghi)
                upper[freqs <= (1 - ghi) * hi] = 1.0
                upper[freqs >= (1 + ghi) * hi] = 0.0
                win = win * upper
        wins.append(win)
    return np.stack(wins).astype(dtype)


def ewt_filterbank(n: int, boundaries: tuple[float, ...], dtype=np.float32):
    """The tight-frame windows ``[n_bands, n//2+1]`` (sum of squares = 1)."""
    bounds = tuple(float(b) for b in boundaries)
    if not bounds or any(
        not 0.0 < b < 0.5 for b in bounds
    ) or any(b2 <= b1 for b1, b2 in zip(bounds, bounds[1:])):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"boundaries must be strictly increasing in (0, 0.5): {bounds}",
        )
    return _meyer_windows(n, bounds, dtype)


def _meyer_windows_jnp(n: int, bounds: jnp.ndarray, dtype) -> jnp.ndarray:
    """TRACED-boundaries Meyer windows ``[n_bands, n//2+1]``.

    Same construction as :func:`_meyer_windows` but in jnp over a traced
    ``[n_bands-1]`` boundaries array: the piecewise clamps are exactly the
    ``clip`` inside ``beta`` (outside the transition ``beta`` saturates at
    0/1), so no masked assignments are needed — the windows, and therefore
    the whole EWT, are differentiable in the boundaries.
    """
    freqs = jnp.asarray(np.fft.rfftfreq(n), dtype)
    bounds = bounds.astype(dtype)
    nxt = jnp.concatenate([bounds[1:], jnp.asarray([0.5], dtype)])
    prev = jnp.concatenate([jnp.asarray([0.0], dtype), bounds[:-1]])
    g = 0.45 * jnp.minimum(
        (bounds - prev) / jnp.maximum(bounds + prev, 1e-12),
        (nxt - bounds) / (nxt + bounds),
    )
    gammas = jnp.maximum(g, 1e-6)

    def beta(t):
        t = jnp.clip(t, 0.0, 1.0)
        return t**4 * (35 - 84 * t + 70 * t**2 - 20 * t**3)

    def rise(wn, gm):  # [F] 0 -> 1 across [(1-g)wn, (1+g)wn]
        return jnp.sin(
            0.5 * math.pi * beta((freqs - (1 - gm) * wn) / (2 * gm * wn))
        )

    def fall(wn, gm):
        return jnp.cos(
            0.5 * math.pi * beta((freqs - (1 - gm) * wn) / (2 * gm * wn))
        )

    rises = jax.vmap(rise)(bounds, gammas)  # [K, F]
    falls = jax.vmap(fall)(bounds, gammas)
    wins = [falls[0]]
    k = bounds.shape[0]
    for band in range(1, k):
        wins.append(rises[band - 1] * falls[band])
    wins.append(rises[k - 1])
    return jnp.stack(wins)


def _resolve_bank(n: int, boundaries, dtype) -> jnp.ndarray:
    """Static tuple -> numpy-built bank (validated, f64-accurate); traced
    jnp array -> on-device bank (jittable, differentiable)."""
    if isinstance(boundaries, (jnp.ndarray, jax.core.Tracer)):
        return _meyer_windows_jnp(n, boundaries, dtype)
    return jnp.asarray(ewt_filterbank(n, boundaries, np.float64), dtype)


def ewt(x: jnp.ndarray, boundaries) -> jnp.ndarray:
    """Decompose ``[..., N]`` into ``[..., n_bands, N]`` adaptive modes.

    ``boundaries`` splits ``(0, 0.5)`` cycles/sample; band 0 holds
    DC..first boundary.  Modes sum to ``x`` after :func:`iewt` exactly
    (tight frame).  Pass a STATIC tuple of floats (from
    :func:`ewt_boundaries`) for the validated f64-accurate bank, or a
    TRACED ``[n_bands-1]`` jnp array to build the bank on device — one
    compiled program serves every boundary set of that band count (no
    per-signal recompiles for adaptive pipelines), and the transform is
    differentiable in the boundaries.
    """
    n = x.shape[-1]
    real_dtype = (
        x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    )
    bank = _resolve_bank(n, boundaries, real_dtype)
    spec = jnp.fft.rfft(x.astype(real_dtype), axis=-1)
    return jnp.fft.irfft(spec[..., None, :] * bank, n=n, axis=-1)


def iewt(components: jnp.ndarray, boundaries) -> jnp.ndarray:
    """Exact inverse: re-filter each mode and sum (tight-frame adjoint)."""
    n = components.shape[-1]
    bank = _resolve_bank(n, boundaries, components.dtype)
    spec = jnp.fft.rfft(components, axis=-1)
    return jnp.fft.irfft(jnp.sum(spec * bank, axis=-2), n=n, axis=-1)


def ewt_hilbert(x: jnp.ndarray, boundaries: tuple[float, ...]) -> jnp.ndarray:
    """Complex analytic modes ``[..., n_bands, N]``: ``abs`` gives each
    mode's instantaneous amplitude, the phase derivative its frequency
    (the Hilbert-Huang-style spectrum on EWT modes)."""
    comps = ewt(x, boundaries)
    n = comps.shape[-1]
    spec = jnp.fft.fft(comps, axis=-1)
    # scipy.signal.hilbert weights: DC and (even-n) Nyquist stay at 1 —
    # np.fft.fftfreq reports Nyquist as -0.5, so a freqs>0 test would
    # wrongly zero it and bias near-Nyquist modes.
    mult = np.zeros(n)
    mult[0] = 1.0
    if n % 2 == 0:
        mult[n // 2] = 1.0
        mult[1 : n // 2] = 2.0
    else:
        mult[1 : (n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(spec * jnp.asarray(mult, spec.dtype), axis=-1)
    return analytic
