"""MXU-factorized inverse FFT for the CWT's per-scale synthesis.

The committed probe (``tools/probe_cwt_scales.py``; docs/PERFORMANCE.md)
shows XLA's batched ``irfft`` on this runtime costs ~0.79 ms/scale at
2^21 points — ~80x above its own HBM floor — and is 100% of the CWT FFT
path's latency (the reference's FFT engine:
``vectorwave-core/src/main/java/.../cwt/CWTTransform.java:223-313``).
The MXU can do better: a power-of-two DFT factors into radix-128 stages,
and each stage is a [128, 128] matmul over the whole array — exactly the
shape the systolic array wants.

Four-step decomposition (per stage, M = M1*M2, input index k = k1*M2+k2,
output index n = n1 + M1*n2):

    x[n1 + M1*n2] = sum_k2 e^{2pi i k2 n2 / M2} * e^{2pi i k2 n1 / M}
                    * sum_k1 Z[k1*M2 + k2] e^{2pi i k1 n1 / M1}

i.e. (a) ifft_M1 down the columns of Z viewed as [M1, M2] — ONE complex
[128,128] x [128, M2] matmul; (b) an elementwise twiddle; (c) recurse on
the rows (M2); (d) a transpose.  Total MXU work for M = 2^21 is
M*(128+128+128) complex MACs ~ 6.4 GFLOP/scale — ~0.04 ms at the chip's
measured composite-kernel efficiency, vs 0.79 ms for XLA's irfft.

Complex arrays travel as (re, im) f32 plane pairs (the axon runtime
rejects eager complex construction; planes also let each of the four real
matmuls hit the MXU at its native dtype).  Matmuls run at
``Precision.HIGHEST`` (3-pass bf16) — the relative error of the whole
3-stage pipeline is ~1e-7, the same grade as the f32 FFT path it
replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_RADIX = 128


@functools.lru_cache(maxsize=16)
def _dft_matrix(m: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    """[m, m] DFT matrix W[n, k] = exp(sign * 2pi i k n / m) as (re, im)."""
    k = np.arange(m)
    ang = sign * 2.0 * np.pi * np.outer(k, k) / m
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=32)
def _twiddle(m1: int, m2: int, sign: float) -> tuple[np.ndarray, np.ndarray]:
    """[m1, m2] twiddles exp(sign * 2pi i n1 k2 / (m1*m2)) as (re, im)."""
    n1 = np.arange(m1)[:, None]
    k2 = np.arange(m2)[None, :]
    ang = sign * 2.0 * np.pi * n1 * k2 / (m1 * m2)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cmatmul(wr, wi, zr, zi):
    """Complex [m,m] @ [..., m, t] contraction on axis -2, full f32 grade."""
    hp = jax.lax.Precision.HIGHEST

    def mm(w, z):
        return jnp.einsum("nk,...kt->...nt", w, z, precision=hp)

    return mm(wr, zr) - mm(wi, zi), mm(wr, zi) + mm(wi, zr)


def _split_m(m: int) -> int:
    """Leading factor for the four-step split (prefer the full radix)."""
    if m % _RADIX == 0:
        return _RADIX
    for cand in (64, 32, 16, 8):
        if m % cand == 0:
            return cand
    return m


def _fft_rec(zr, zi, m: int, sign: float):
    """Recursive four-step (i)fft along the LAST axis (unnormalized)."""
    if m <= _RADIX:
        wr, wi = (jnp.asarray(a) for a in _dft_matrix(m, sign))
        hp = jax.lax.Precision.HIGHEST

        def mm(w, z):
            return jnp.einsum("nk,...k->...n", w, z, precision=hp)

        return mm(wr, zr) - mm(wi, zi), mm(wr, zi) + mm(wi, zr)
    m1 = _RADIX if m % _RADIX == 0 else _split_m(m)
    m2 = m // m1
    lead = zr.shape[:-1]
    zr = zr.reshape(lead + (m1, m2))
    zi = zi.reshape(lead + (m1, m2))
    wr, wi = (jnp.asarray(a) for a in _dft_matrix(m1, sign))
    yr, yi = _cmatmul(wr, wi, zr, zi)  # ifft_m1 down columns
    tr, ti = (jnp.asarray(a) for a in _twiddle(m1, m2, sign))
    yr, yi = _cmul(yr, yi, tr, ti)
    yr, yi = _fft_rec(yr, yi, m2, sign)  # recurse along rows (last axis)
    # output index n = n1 + m1*n2: transpose [.., n1, n2] -> [.., n2, n1]
    yr = jnp.swapaxes(yr, -1, -2).reshape(lead + (m,))
    yi = jnp.swapaxes(yi, -1, -2).reshape(lead + (m,))
    return yr, yi


def mxu_ifft(zr: jnp.ndarray, zi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized inverse FFT of (re, im) planes along the last axis."""
    m = zr.shape[-1]
    yr, yi = _fft_rec(zr, zi, m, +1.0)
    inv = np.float32(1.0 / m)
    return yr * inv, yi * inv


def mxu_fft(zr: jnp.ndarray, zi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward FFT of (re, im) planes along the last axis."""
    return _fft_rec(zr, zi, zr.shape[-1], -1.0)


def mxu_rfft(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward real FFT -> (re, im) planes of the ``n//2 + 1`` rfft bins.

    Packed half-size: z[t] = x[2t] + i x[2t+1] is one length-n/2 complex
    signal; X[k] = Xe[k] + e^{-2pi i k/n} Xo[k] with Xe/Xo the even/odd
    DFTs recovered from Z = fft(z).  (The inverse of mxu_irfft's
    unpacking.)  Matches ``jnp.fft.rfft`` at f32 grade.
    """
    n = x.shape[-1]
    half = n // 2
    z = x.reshape(x.shape[:-1] + (half, 2))
    zr = z[..., 0]
    zi = z[..., 1]
    yr, yi = mxu_fft(zr, zi)
    # Z[k mod half] and Z[(half - k) mod half] for k in [0, half]
    yr_e = jnp.concatenate([yr, yr[..., :1]], axis=-1)
    yi_e = jnp.concatenate([yi, yi[..., :1]], axis=-1)
    fr = jnp.concatenate([yr[..., :1], yr[..., :0:-1], yr[..., :1]], axis=-1)
    fi = jnp.concatenate([yi[..., :1], yi[..., :0:-1], yi[..., :1]], axis=-1)
    er = (yr_e + fr) * np.float32(0.5)
    ei = (yi_e - fi) * np.float32(0.5)
    or_ = (yi_e + fi) * np.float32(0.5)   # Xo = (Z - conj(Zf)) / (2i):
    oi = (fr - yr_e) * np.float32(0.5)    # re = (zi + fi)/2, im = (fr - zr)/2
    k = np.arange(half + 1)
    ang = -2.0 * np.pi * k / n
    tr = np.cos(ang).astype(np.float32)
    ti = np.sin(ang).astype(np.float32)
    or_, oi = _cmul(or_, oi, jnp.asarray(tr), jnp.asarray(ti))
    return er + or_, ei + oi


def mxu_irfft(sr: jnp.ndarray, si: jnp.ndarray, n: int) -> jnp.ndarray:
    """Real inverse FFT from a hermitian half-spectrum (re, im) pair.

    ``(sr, si)``: [..., n//2 + 1] planes of ``rfft``-layout bins; returns
    the length-``n`` real signal (matches ``jnp.fft.irfft(spec, n)``).

    Uses the packed half-size trick: the even/odd interleave of a real
    signal is one complex signal of length n/2, so ONE c2c ifft of n/2
    replaces the length-n hermitian inverse — halving the matmul work on
    top of the four-step factorization.
    """
    half = n // 2
    # split the half-spectrum into even/odd DFTs:
    #   Xe[k] = (X[k] + conj(X[half-k])) / 2
    #   Xo[k] = (X[k] - conj(X[half-k])) / 2 * e^{+2pi i k / n}
    # then Z[k] = Xe[k] + i*Xo[k] is the fft of z = x_even + i*x_odd.
    xr = sr[..., :half]
    xi = si[..., :half]
    # X[half - k] for k in [0, half): [X[half] (Nyquist), X[half-1], .., X[1]]
    fr = jnp.concatenate([sr[..., half:half + 1], sr[..., half - 1:0:-1]],
                         axis=-1)
    fi = jnp.concatenate([si[..., half:half + 1], si[..., half - 1:0:-1]],
                         axis=-1)
    er = (xr + fr) * np.float32(0.5)
    ei = (xi - fi) * np.float32(0.5)
    or_ = (xr - fr) * np.float32(0.5)
    oi = (xi + fi) * np.float32(0.5)
    k = np.arange(half)
    ang = 2.0 * np.pi * k / n
    tr = np.cos(ang).astype(np.float32)
    ti = np.sin(ang).astype(np.float32)
    or_, oi = _cmul(or_, oi, jnp.asarray(tr), jnp.asarray(ti))
    zr = er - oi
    zi = ei + or_
    yr, yi = mxu_ifft(zr, zi)
    # x[2t] = Re z[t], x[2t+1] = Im z[t]
    out = jnp.stack([yr, yi], axis=-1).reshape(yr.shape[:-1] + (n,))
    return out
