"""Band-limited decimated inverse for the CWT's FFT-path synthesis.

The FFT path's per-scale cost is one length-``fft_size`` inverse FFT per
scale (the reference's engine too: ``CWTTransform.java:223-313``).  On
this runtime a batched [20, 2^20] inverse costs ~14-18 ms by ANY full
route (XLA irfft, MXU-factorized four-step — tools/probe_irfft_mxu.py),
~30x above the path's output-write floor, and is ~90% of cfg5's latency.

But a CWT row at scale ``s`` is BAND-LIMITED by construction: the bank
multiply zeroes every bin outside ``|psi_hat(s w)| > eps`` — a contiguous
window of ``K ~ c*N/s`` bins.  The inverse of a K-bin spectrum does not
need an N-point FFT:

    W[n] = 2/N * Re{ e^{2pi i kc n / N} * v(n / M) },
    v(t) = sum_{|d| <= dmax} Y[kc + d] e^{2pi i d t / K'}

with ``K' = next_pow2(4K)``, ``M = N / K'``: ``v`` is K'-periodic and
band-limited to ``|d| <= dmax ~ K/2`` of K' bins, so

  1. ``v`` on the integer grid is ONE K'-point ifft (K' <= N/4, cheap);
  2. ``v(q + r/M)`` interpolates from ~24 neighbouring integer samples
     with per-offset least-squares filters (oversampling >= 4x makes a
     24-tap interpolator exact to ~1e-8 over the band — designed and
     residual-checked host-side at trace time);
  3. the modulation phases split as ``outer(e^{2pi i kc q/K'},
     e^{2pi i kc r/N})`` — two SMALL host-precomputed vectors.

Per-scale device work: one K'-point ifft + a [K', taps] x [taps, M]
matmul + O(N) elementwise — ~taps*N MACs instead of an N-point FFT, so
the synthesis runs at its HBM write floor instead of 30x above it.

Pure spectral math — correct for every boundary mode and batch shape;
exactness degrades only through the interpolation residual (checked
< 1e-6 at design time) and the band truncation ``eps`` (both ~f32 grade,
the same class as the full FFT path's rounding).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

#: interpolator taps (LS-designed per fractional offset); 24 taps at >=4x
#: oversampling leaves a <1e-7 band residual (asserted at design time)
_TAPS = 24

#: band-truncation threshold relative to the scale row's peak response.
#: The sampled bank is TIME-truncated at the half-support (psi cut at
#: ~4 sigma, `_sample_bank`), which floors its spectrum at ~1e-6..1e-5 of
#: peak EVERYWHERE — so any spectral truncation costs ~1e-5-grade parity
#: vs the full-inverse oracle.  That is the same accuracy class as the
#: kernel-direct small-scale tier (bf16_3x, ~1e-5 relative), and the
#: genuine (non-leakage) morlet band content below 1e-5 of peak is
#: negligible.  The truncated bank's DC response is REAL at large scales
#: (~e^{-(half/s)^2/2} of peak) and is carried exactly as a separate
#: rank-1 term, not dropped.
_BAND_EPS = 1e-5

#: eligibility guard: relative l2 mass of the dropped out-of-band bins
_MAX_DROPPED_MASS = 1e-4

#: require K' <= fft_size / _MIN_DECIMATION (else the full inverse is
#: already fine) and >= 4x oversampling of the kept band
_MIN_DECIMATION = 4


class BandPlan(NamedTuple):
    """Host-side per-scale plan for the banded inverse."""

    k_lo: int
    k_hi: int
    kc: int
    kprime: int
    m: int
    band_conj: np.ndarray  # [Kb] complex128: conj(psi_hat) on the band
    filters: np.ndarray  # [taps, M] f64 LS interpolators (includes 2K'/N)
    design_residual: float
    dc_conj: complex  # conj(psi_hat)[0]: the DC term, carried exactly
    dropped_mass: float  # relative l2 of the out-of-band bins dropped
    hermitian: bool  # True: real-output (rfft) synthesis; False: complex


def _next_pow2(v: int) -> int:
    return 1 << max(0, (v - 1)).bit_length()


@functools.lru_cache(maxsize=64)
def _ls_filters(kprime: int, m: int, dmax: int, taps: int):
    """[taps, m] least-squares interpolators for v(q + r/m).

    Solves, per fractional offset f = r/m, ``min_h max_nu |sum_j h[j]
    e^{2pi i nu j/K'} - e^{2pi i nu f/K'}|`` in the L2 sense over the band
    ``|nu| <= dmax`` (dense grid).  Symmetric grid -> real filters.
    Returns (filters[taps, m], worst residual).
    """
    j = np.arange(-(taps // 2) + 1, taps // 2 + 1, dtype=np.float64)
    nu = np.linspace(-dmax, dmax, 8 * taps + 1)
    w = 2.0 * np.pi * nu / kprime
    f = np.arange(m, dtype=np.float64) / m
    # SVD least squares on the complex system (the normal equations are
    # hopelessly ill-conditioned when the band is a tiny fraction of K' —
    # the taps are then nearly collinear; rcond truncation keeps only the
    # well-determined directions and the residual lands at ~1e-9)
    basis_d = np.exp(1j * w[:, None] * j[None, :])  # [G, taps]
    target_d = np.exp(1j * w[:, None] * f[None, :])  # [G, m]
    h_c, *_ = np.linalg.lstsq(basis_d, target_d, rcond=1e-11)
    h = np.real(h_c)  # symmetric grid -> real-part solution is optimal
    # residual check on a finer grid
    nu_f = np.linspace(-dmax, dmax, 16 * taps + 1)
    wf = 2.0 * np.pi * nu_f / kprime
    basis = np.exp(1j * wf[:, None] * j[None, :])  # [G, taps]
    target = np.exp(1j * wf[:, None] * f[None, :])  # [G, m]
    resid = float(np.max(np.abs(basis @ h - target)))
    return h, j.astype(np.int64), resid


def plan_banded(
    row_spec: np.ndarray,
    fft_size: int,
    *,
    eps: float = _BAND_EPS,
    taps: int = _TAPS,
    hermitian: bool = True,
) -> BandPlan | None:
    """Build a per-scale plan from the host-side bank spectrum row.

    ``row_spec``: ``conj(rfft(bank_row))`` values ([fft_size//2 + 1],
    ``hermitian=True`` — real-output synthesis doubles the band term) or
    ``conj(fft(bank_row))`` ([fft_size], ``hermitian=False`` — complex
    output; analytic/complex wavelets are one-sided, and any genuine
    negative-frequency content fails the dropped-mass gate).  Returns
    ``None`` when this scale is not banded-eligible (band too wide,
    touches DC/Nyquist, too much out-of-band mass, or design residual
    too large).
    """
    half = fft_size // 2
    mags = np.abs(row_spec)
    peak = float(mags.max())
    if peak == 0.0:
        return None
    keep = np.nonzero(mags > eps * peak)[0]
    # DC (bin 0) is carried exactly as a separate rank-1 term; Nyquist
    # content at these scales is leakage-floor and is part of the
    # dropped-mass budget below
    k_lo = max(1, int(keep[0]))
    k_hi = min(half - 1, int(keep[-1]))
    if k_hi <= k_lo:
        return None
    kb = k_hi - k_lo + 1
    kprime = max(_next_pow2(_MIN_DECIMATION * kb), 4 * taps)
    if kprime * _MIN_DECIMATION > fft_size:
        return None  # not narrow-band enough to be worth decimating
    total = float(np.sqrt(np.sum(mags**2)))
    inband = float(
        np.sqrt(np.sum(mags[k_lo : k_hi + 1] ** 2) + mags[0] ** 2)
    )
    dropped = math.sqrt(max(0.0, total**2 - inband**2)) / max(total, 1e-30)
    if dropped > _MAX_DROPPED_MASS:
        return None
    m = fft_size // kprime
    kc = (k_lo + k_hi) // 2
    dmax = max(kc - k_lo, k_hi - kc)
    h, _j, resid = _ls_filters(kprime, m, int(dmax), taps)
    if resid > 1e-6:
        return None
    band = np.asarray(row_spec[k_lo : k_hi + 1], dtype=np.complex128)
    filters = h * ((2.0 if hermitian else 1.0) * kprime / fft_size)
    return BandPlan(
        k_lo, k_hi, kc, kprime, m, band, filters, resid,
        complex(row_spec[0]), dropped, hermitian,
    )


def banded_row(
    spec_x: jnp.ndarray,
    plan: BandPlan,
    fft_size: int,
    n: int,
) -> jnp.ndarray:
    """One scale's real CWT row from the signal's rfft spectrum.

    ``spec_x``: [..., fft_size//2 + 1] complex; returns [..., n] f32.
    """
    kb = plan.k_hi - plan.k_lo + 1
    kprime, m = plan.kprime, plan.m
    taps = plan.filters.shape[0]
    j_off = np.arange(-(taps // 2) + 1, taps // 2 + 1)

    band = jnp.asarray(plan.band_conj.astype(np.complex64))
    yc = spec_x[..., plan.k_lo : plan.k_hi + 1].astype(jnp.complex64) * band
    split = plan.kc - plan.k_lo
    pad = jnp.zeros(yc.shape[:-1] + (kprime - kb,), dtype=yc.dtype)
    yp = jnp.concatenate([yc[..., split:], pad, yc[..., :split]], axis=-1)
    wv = jnp.fft.ifft(yp, axis=-1)
    wr = jnp.real(wv).astype(jnp.float32)
    wi = jnp.imag(wv).astype(jnp.float32)

    # [..., K', taps] shifted circular views; v is exactly K'-periodic
    shr = jnp.stack([jnp.roll(wr, -int(j), axis=-1) for j in j_off], axis=-1)
    shi = jnp.stack([jnp.roll(wi, -int(j), axis=-1) for j in j_off], axis=-1)
    hmat = jnp.asarray(plan.filters.astype(np.float32))
    hp = jax.lax.Precision.HIGHEST
    ur = jnp.einsum("...qt,tm->...qm", shr, hmat, precision=hp)
    ui = jnp.einsum("...qt,tm->...qm", shi, hmat, precision=hp)

    # modulation cos/sin(2 pi kc (q M + r) / N) as outer products
    q = np.arange(kprime, dtype=np.float64)
    r = np.arange(m, dtype=np.float64)
    aq = 2.0 * np.pi * ((plan.kc * q * m) % fft_size) / fft_size
    ar = 2.0 * np.pi * plan.kc * r / fft_size
    cq = jnp.asarray(np.cos(aq), jnp.float32)[:, None]
    sq = jnp.asarray(np.sin(aq), jnp.float32)[:, None]
    cr_ = jnp.asarray(np.cos(ar), jnp.float32)[None, :]
    sr_ = jnp.asarray(np.sin(ar), jnp.float32)[None, :]
    cosm = cq * cr_ - sq * sr_
    sinm = sq * cr_ + cq * sr_

    if plan.hermitian:
        out = ur * cosm - ui * sinm
        out = out.reshape(out.shape[:-2] + (kprime * m,))[..., :n]
        if plan.dc_conj != 0.0:
            # exact DC term of the hermitian inverse: (1/N) Re(X[0] B0*)
            dc = jnp.real(
                spec_x[..., :1] * jnp.asarray(plan.dc_conj, jnp.complex64)
            ).astype(jnp.float32) * np.float32(1.0 / fft_size)
            out = out + dc  # [..., 1] broadcasts over the n axis
        return out
    # complex output (analytic/complex wavelets): no hermitian doubling,
    # the modulated interpolant IS the coefficient row
    out_r = ur * cosm - ui * sinm
    out_i = ur * sinm + ui * cosm
    out = jax.lax.complex(out_r, out_i)
    out = out.reshape(out.shape[:-2] + (kprime * m,))[..., :n]
    if plan.dc_conj != 0.0:
        dc = spec_x[..., :1].astype(jnp.complex64) * jnp.asarray(
            plan.dc_conj / fft_size, jnp.complex64
        )
        out = out + dc
    return out


def banded_eligible_suffix(
    host_rows: list[np.ndarray], fft_size: int, *, hermitian: bool = True
) -> tuple[int, list[BandPlan]]:
    """Plans for the longest all-eligible SUFFIX of the given scale rows.

    Bands narrow as scale grows, so eligibility is (weakly) monotone in
    scale; serving a suffix keeps the output concat order trivial.
    Returns ``(start_index, plans)`` with ``plans[i]`` for scale
    ``start_index + i``.
    """
    plans: list[BandPlan | None] = [
        plan_banded(row, fft_size, hermitian=hermitian) for row in host_rows
    ]
    start = len(plans)
    while start > 0 and plans[start - 1] is not None:
        start -= 1
    return start, [p for p in plans[start:] if p is not None]


def banded_flops_per_scale(plan: BandPlan, fft_size: int) -> float:
    """Rough MAC count for one banded row (for cost-model context)."""
    taps = plan.filters.shape[0]
    fft = plan.kprime * max(1.0, math.log2(plan.kprime))
    return 2 * taps * fft_size + 4 * fft
