"""Cross-wavelet analysis: XWT, coherence, phase synchronization, ridges.

The reference's ``ComplexCWTResult`` documents these as the analyses its
complex coefficients "enable" (phase synchronization, instantaneous
frequency, ridge extraction, wavelet coherence —
``/root/reference/vectorwave-core/.../cwt/ComplexCWTResult.java:9-15``) but
implements none of them; this module delivers the toolkit (Torrence &
Compo 1998 conventions).

TPU-native notes:

* The Torrence–Compo smoothing operator runs as ONE batched spectral
  multiply: the per-scale Gaussian time kernels ``exp(-t^2 / 2 s^2)`` have
  the analytic spectrum ``exp(-2 (pi f s)^2)``, so smoothing all scales is
  ``irfft(rfft(P) * bank)`` — no per-scale loop, no truncated kernels.
  Scale smoothing is a boxcar moving mean along the scale axis.
* Ridge extraction is a Viterbi dynamic program over time.  A naive scan
  is latency-bound (~2 us per tiny step on TPU), so long signals use a
  BLOCKED max-plus formulation: per-block transfer matrices built batched
  across all blocks, a short boundary scan, then parallel forward+backward
  expansion with ``path = argmax(F + B)`` — no sequential backtrack.
  44x faster than the scan at 32 scales x 65536 samples (5.9 ms vs 258 ms
  on one v5e chip), exactly the same optimum.
* Instantaneous frequency avoids phase unwrapping entirely:
  ``angle(W_{t+1} * conj(W_t))`` is the already-wrapped phase increment.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import ErrorCode, InvalidArgumentError
from .cwt import CWTResult, _resolve_continuous, cwt, validate_scales

__all__ = [
    "cross_wavelet",
    "wavelet_coherence",
    "CoherenceResult",
    "phase_synchronization",
    "instantaneous_frequency",
    "extract_ridge",
    "RidgeResult",
]


def _complex_cwt(x, scales, wavelet, boundary: str, method: str) -> CWTResult:
    """CWT with guaranteed-complex coefficients (analytic path for real
    wavelets), so phases are meaningful."""
    w = _resolve_continuous(wavelet)
    analytic = not bool(getattr(w, "is_complex", False))
    return cwt(x, scales, w, method=method, analytic=analytic, boundary=boundary)


def cross_wavelet(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: Sequence[float],
    wavelet="morl",
    *,
    boundary: str = "zero",
    method: str = "fft",
) -> CWTResult:
    """Cross-wavelet transform ``W_xy = W_x * conj(W_y)``.

    ``|W_xy|`` is the shared power; ``angle(W_xy)`` the relative phase of
    ``x`` vs ``y`` at each (scale, time).  Real wavelets are analyzed
    against their analytic (Hilbert) signals so the phase is well-defined.
    """
    if x.shape[-1] != y.shape[-1]:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"series lengths differ: {x.shape[-1]} vs {y.shape[-1]}",
        )
    scales = validate_scales(scales)
    wx = _complex_cwt(x, scales, wavelet, boundary, method)
    wy = _complex_cwt(y, scales, wavelet, boundary, method)
    return CWTResult(wx.coeffs * jnp.conj(wy.coeffs), scales, boundary)


def _scale_spacing_octaves(scales: tuple[float, ...]) -> float:
    if len(scales) < 2:
        return 1.0
    djs = np.abs(np.diff(np.log2(np.asarray(scales))))
    dj = float(np.mean(djs))
    return dj if dj > 1e-12 else 1.0


def _smooth(
    field: jnp.ndarray,
    scales: tuple[float, ...],
    *,
    scale_decorrelation: float = 0.6,
) -> jnp.ndarray:
    """Torrence–Compo smoothing: per-scale Gaussian in time (spectral
    multiply, one batched FFT) then a boxcar across scales."""
    n = field.shape[-1]
    freqs = np.fft.rfftfreq(n)  # cycles/sample
    bank = np.exp(
        -2.0 * (np.pi * freqs[None, :] * np.asarray(scales)[:, None]) ** 2
    )
    spec_dtype = jnp.complex64 if field.dtype in (
        jnp.float32, jnp.complex64,
    ) else jnp.complex128
    if jnp.iscomplexobj(field):
        # complex field: smooth real/imag with the same real kernel
        sm = jnp.fft.ifft(
            jnp.fft.fft(field, axis=-1)
            * jnp.asarray(
                np.exp(
                    -2.0
                    * (
                        np.pi
                        * np.fft.fftfreq(n)[None, :]
                        * np.asarray(scales)[:, None]
                    )
                    ** 2
                ),
                spec_dtype,
            ),
            axis=-1,
        )
    else:
        sm = jnp.fft.irfft(
            jnp.fft.rfft(field, axis=-1) * jnp.asarray(bank, spec_dtype),
            n=n,
            axis=-1,
        ).astype(field.dtype)
    width = max(1, int(round(scale_decorrelation / _scale_spacing_octaves(scales))))
    if width > 1 and len(scales) > 1:
        width = min(width, len(scales))
        pad = [(0, 0)] * (sm.ndim - 2) + [(width // 2, (width - 1) // 2), (0, 0)]

        def box(f):
            fp = jnp.pad(f, pad, mode="edge")
            c = jnp.cumsum(fp, axis=-2)
            zero = jnp.zeros_like(c[..., :1, :])
            c = jnp.concatenate([zero, c], axis=-2)
            return (c[..., width:, :] - c[..., :-width, :]) / width

        sm = box(sm.real) + 1j * box(sm.imag) if jnp.iscomplexobj(sm) else box(sm)
    return sm


class CoherenceResult(NamedTuple):
    """Squared coherence in [0, 1] and relative phase, each ``[..., S, N]``."""

    coherence: jnp.ndarray
    phase: jnp.ndarray
    scales: tuple[float, ...]

    def mean_coherence(self) -> jnp.ndarray:
        """Time-averaged coherence per scale ``[..., S]``."""
        return self.coherence.mean(axis=-1)


def wavelet_coherence(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: Sequence[float],
    wavelet="morl",
    *,
    boundary: str = "zero",
    method: str = "fft",
    scale_decorrelation: float = 0.6,
) -> CoherenceResult:
    """Squared wavelet coherence (Torrence & Compo):

    ``R^2 = |S(W_xy / s)|^2 / ( S(|W_x|^2 / s) * S(|W_y|^2 / s) )``

    with ``S`` the scale-dependent smoothing operator.  Without smoothing
    the expression is identically 1; the smoothing window (Gaussian of
    width ``s`` in time, ``scale_decorrelation`` octaves boxcar in scale)
    is what turns it into a local correlation estimate.
    """
    scales = validate_scales(scales)
    wx = _complex_cwt(x, scales, wavelet, boundary, method)
    wy = _complex_cwt(y, scales, wavelet, boundary, method)
    inv_s = jnp.asarray(
        1.0 / np.asarray(scales)[:, None], wx.coeffs.real.dtype
    )
    sxy = _smooth(
        wx.coeffs * jnp.conj(wy.coeffs) * inv_s,
        scales,
        scale_decorrelation=scale_decorrelation,
    )
    sxx = _smooth(
        jnp.abs(wx.coeffs) ** 2 * inv_s,
        scales,
        scale_decorrelation=scale_decorrelation,
    )
    syy = _smooth(
        jnp.abs(wy.coeffs) ** 2 * inv_s,
        scales,
        scale_decorrelation=scale_decorrelation,
    )
    eps = jnp.asarray(1e-30, sxx.dtype)
    r2 = jnp.abs(sxy) ** 2 / jnp.maximum(sxx * syy, eps)
    return CoherenceResult(
        jnp.clip(r2, 0.0, 1.0), jnp.angle(sxy), scales
    )


def phase_synchronization(
    x: jnp.ndarray,
    y: jnp.ndarray,
    scales: Sequence[float],
    wavelet="morl",
    *,
    boundary: str = "zero",
    method: str = "fft",
) -> jnp.ndarray:
    """Phase-locking value per scale ``[..., S]``:

    ``PLV_s = | mean_t exp(i (phi_x - phi_y)) |`` — 1 for perfectly
    phase-locked series, ~``1/sqrt(N)`` for independent phases.
    """
    wxy = cross_wavelet(x, y, scales, wavelet, boundary=boundary, method=method)
    mag = jnp.maximum(jnp.abs(wxy.coeffs), 1e-30)
    unit = wxy.coeffs / mag
    return jnp.abs(unit.mean(axis=-1))


def instantaneous_frequency(
    result: CWTResult,
    *,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Instantaneous frequency (cycles per unit time) ``[..., S, N]``.

    Uses the wrap-free phase increment ``angle(W_{t+1} conj(W_t))``; the
    last column repeats the previous increment.  Real-coefficient results
    (non-analytic CWT) raise — phase needs complex coefficients.
    """
    if not jnp.iscomplexobj(result.coeffs):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            "instantaneous frequency needs complex coefficients",
            suggestions=("Run cwt(..., analytic=True) or a complex wavelet",),
        )
    w = result.coeffs
    dphi = jnp.angle(w[..., 1:] * jnp.conj(w[..., :-1]))
    freq = dphi / (2.0 * math.pi * dt)
    return jnp.concatenate([freq, freq[..., -1:]], axis=-1)


class RidgeResult(NamedTuple):
    """Maximum-energy ridge through the scalogram, ``[..., N]`` per field."""

    indices: jnp.ndarray  # int32 scale indices
    scales: jnp.ndarray  # physical scale at each time
    amplitude: jnp.ndarray  # |W| along the ridge


def _viterbi_indices_scan(obs_t: jnp.ndarray, pen_j: jnp.ndarray) -> jnp.ndarray:
    """Sequential Viterbi (forward DP + backtrack), ``[N, ..., S] -> [N, ...]``.

    Used for short signals where per-step scan latency is negligible."""

    def fwd(carry, o):
        cand = carry[..., :, None] - pen_j  # [..., S_from, S_to]
        return cand.max(axis=-2) + o, cand.argmax(axis=-2).astype(jnp.int32)

    final, bps = jax.lax.scan(fwd, obs_t[0], obs_t[1:])
    last = final.argmax(axis=-1).astype(jnp.int32)

    def back(idx, bp):
        return jnp.take_along_axis(bp, idx[..., None], axis=-1)[..., 0], idx

    first, path_tail = jax.lax.scan(back, last, bps, reverse=True)
    return jnp.concatenate([first[None], path_tail], axis=0)


def _viterbi_indices_blocked(
    obs_t: jnp.ndarray, pen_j: jnp.ndarray, block: int
) -> jnp.ndarray:
    """Blocked max-plus Viterbi, parallel over time blocks.

    A sequential scan over N time steps is latency-bound on TPU (~2 us per
    tiny [S]-wide step: 65536 steps measured ~200 ms for S=32).  This
    formulation does the same DP with O(N/block + block) sequential depth:

    1. Per-block max-plus TRANSFER matrices ``W_b[i,j]`` (best within-block
       path entering at state i, leaving at j) — one scan of ``block`` steps
       whose body processes ALL blocks batched (``[NB, ..., S, S]``).
    2. A short boundary scan over the ``NB`` transfer matrices gives the
       forward DP vector at every block edge (both directions — the
       backward pass reuses ``W_b`` transposed).
    3. Within-block expansion from the known edge vectors (again batched
       over blocks) yields forward scores F_t and backward scores B_t for
       every t; the optimal path is ``argmax_j (F_t + B_t)`` — no
       sequential backtrack at all.

    Identical optimum to the sequential DP (float association differs, so
    near-ties may resolve differently — both resolutions are maximizing
    paths to float precision).
    """
    n = obs_t.shape[0]
    batch_shape = obs_t.shape[1:-1]
    s = obs_t.shape[-1]
    # steps 1..n-1 carry transition matrices; pad so (n-1) % block == 0.
    # Padded steps use obs = 0 across states: with pen >= 0 the optimum
    # stays put through them and real-step scores are unchanged.
    n_pad = -(n - 1) % block
    obs_p = jnp.concatenate(
        [obs_t, jnp.zeros((n_pad, *batch_shape, s), obs_t.dtype)], axis=0
    )
    nb = (n - 1 + n_pad) // block
    # [NB, block, ..., S] transition observations (steps 1..)
    obs_b = obs_p[1:].reshape(nb, block, *batch_shape, s)
    obs_bt = jnp.moveaxis(obs_b, 1, 0)  # [block, NB, ..., S]
    neg_inf = jnp.asarray(jnp.finfo(obs_t.dtype).min, obs_t.dtype)

    # --- 1. per-block transfer matrices --------------------------------
    eye0 = jnp.where(
        jnp.eye(s, dtype=bool), jnp.zeros((), obs_t.dtype), neg_inf
    )
    w_init = jnp.broadcast_to(eye0, (nb, *batch_shape, s, s))

    def grow(w, o):
        # w: [NB, ..., S_in, S_cur];  apply M[k,j] = -pen[k,j] + o[j]
        cand = w[..., :, :, None] - pen_j  # [NB, ..., S_in, S_cur, S_next]
        return cand.max(axis=-2) + o[..., None, :], None

    w_blocks, _ = jax.lax.scan(grow, w_init, obs_bt)  # [NB, ..., S, S]

    # --- 2. boundary scans (forward and backward) ----------------------
    f0 = obs_t[0]

    def bfwd(f, w):
        nxt = (f[..., :, None] + w).max(axis=-2)
        return nxt, f  # emit the vector ENTERING this block

    _, f_edges = jax.lax.scan(bfwd, f0, w_blocks)  # [NB, ..., S]

    def bbwd(b, w):
        prv = (w + b[..., None, :]).max(axis=-1)
        return prv, b  # emit the vector at this block's EXIT

    bN = jnp.zeros_like(f0)
    _, b_edges = jax.lax.scan(bbwd, bN, w_blocks, reverse=True)  # [NB, ..., S]

    # --- 3. within-block expansion -------------------------------------
    def expand_f(f, o):
        nxt = (f[..., :, None] - pen_j).max(axis=-2) + o
        return nxt, nxt

    _, f_all = jax.lax.scan(expand_f, f_edges, obs_bt)  # [block, NB, ..., S]

    def expand_b(b, o):
        prv = ((o + b)[..., None, :] - pen_j).max(axis=-1)
        return prv, b

    b_entry, b_all = jax.lax.scan(expand_b, b_edges, obs_bt, reverse=True)

    # total path score through (t, j) for t = 1..: F_t + B_t
    tot = f_all + b_all  # [block, NB, ..., S]
    tot = jnp.moveaxis(tot, 0, 1).reshape(nb * block, *batch_shape, s)
    tot = tot[: n - 1]
    first = (f0 + b_entry[0]).argmax(axis=-1)  # b_entry[0] = B_0
    idx = jnp.concatenate(
        [first[None], tot.argmax(axis=-1)], axis=0
    ).astype(jnp.int32)
    return idx


def extract_ridge(
    result: CWTResult,
    *,
    smoothness: float = 2.0,
    block_size: int = 128,
) -> RidgeResult:
    """Viterbi ridge: the scale path maximizing summed log-power minus
    ``smoothness * (delta log2 scale)^2`` jump penalties.

    ``smoothness=0`` reduces to the per-column argmax; larger values give
    continuous ridges through noise gaps.  Long signals use a blocked
    max-plus DP (parallel over time blocks — see
    :func:`_viterbi_indices_blocked`); short ones a plain ``lax.scan``
    Viterbi.  Jittable, batched over leading axes.  (Measured on one
    TPU v5e chip at 32 scales x 65536 samples: blocked 5.9 ms vs 258 ms
    sequential — the scan is latency-bound at ~2 us/step.)
    """
    if smoothness < 0:
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"smoothness must be >= 0, got {smoothness}",
        )
    power = jnp.abs(result.coeffs)
    obs = jnp.log(jnp.maximum(power, 1e-30))
    log_scales = np.log2(np.asarray(result.scales))
    pen = (
        smoothness
        * (log_scales[:, None] - log_scales[None, :]) ** 2
    )
    pen_j = jnp.asarray(pen, obs.dtype)  # [S_from, S_to]

    # time-major for the DP: [N, ..., S]
    obs_t = jnp.moveaxis(obs, -1, 0)
    if obs_t.shape[0] > 4 * block_size:
        indices = _viterbi_indices_blocked(obs_t, pen_j, block_size)
    else:
        indices = _viterbi_indices_scan(obs_t, pen_j)
    indices = jnp.moveaxis(indices, 0, -1)  # [..., N]
    scale_grid = jnp.asarray(np.asarray(result.scales), power.dtype)
    ridge_scales = scale_grid[indices]
    amplitude = jnp.take_along_axis(
        power, indices[..., None, :], axis=-2
    )[..., 0, :]
    return RidgeResult(indices, ridge_scales, amplitude)
