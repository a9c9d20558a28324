"""Dual-tree complex wavelet transform (DTCWT), 1-D.

The practical middle ground the reference lacks between the decimated DWT
(critically sampled, badly shift-variant) and the MODWT/SWT (shift
invariant, (J+1)x redundant): two parallel decimated trees whose wavelets
form an approximate Hilbert pair give near-shift-invariant COMPLEX
coefficients (magnitude ~ local analytic envelope, phase ~ local position)
at only 2x redundancy — Kingsbury's q-shift construction.

Structure (all filters generated, none tabulated — see
``wavelets/qshift.py`` and ``tools/design_qshift.py``):

* level 1: both trees run the same orthonormal wavelet (default ``sym8``);
  tree b's analysis is offset one input sample (``offset=1`` in the
  decimated ops), i.e. a HALF-sample delay at the decimated rate.
* levels >= 2: tree a runs the q-shift pair (group delay ``(L-1)/2-1/4``),
  tree b the time-reversed pair (``+1/4``) — a further half-sample
  relative delay per stage, which is exactly the Hilbert-pair condition.
* complex coefficients ``z_j = (d_a - i d_b)/sqrt(2)`` (the sign that
  makes the pair analytic for this design; asserted by the spectrum test).

Each tree is orthonormal, so the inverse runs the exact adjoint cascade
per tree and averages — perfect reconstruction to machine precision, and
the averaging is what cancels the trees' opposite aliasing (the
shift-invariance mechanism).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..errors import ErrorCode, InvalidArgumentError
from ..ops.dwt import convolve_downsample, upsample_convolve
from ..wavelets.base import WaveletType
from ..wavelets.qshift import qshift_filters
from .modwt import _resolve_discrete, _validate_signal

__all__ = [
    "DTCWTResult",
    "dtcwt",
    "idtcwt",
    "dtcwt_max_levels",
    "coefficient_delay",
]


def coefficient_delay(level: int, wavelet="sym8") -> float:
    """Accumulated analysis group delay at ``level``, in units of that
    level's coefficient spacing (``2^level`` input samples).

    A feature at input position ``p`` lands at coefficient index
    ``(p - delay_samples) / 2^level`` (correlation-style analysis), so under
    periodic boundaries rolling a magnitude field by
    ``+round(coefficient_delay(j))`` aligns it with the signal (applies per
    axis for the 2-D transform).
    """
    h1, _ = _level1(wavelet)
    hq, _ = qshift_filters()
    delay = (len(h1) - 1) / 2.0  # level-1 stage, input samples
    for stage in range(2, level + 1):
        delay += (2 ** (stage - 1)) * (len(hq) - 1) / 2.0
    return delay / (1 << level)


class DTCWTResult(NamedTuple):
    """Complex highpasses (finest first, ``[..., N/2^j]``) + the two trees'
    final real lowpasses."""

    highpasses: tuple[jnp.ndarray, ...]
    lowpass_a: jnp.ndarray
    lowpass_b: jnp.ndarray

    @property
    def levels(self) -> int:
        return len(self.highpasses)

    def magnitudes(self) -> tuple[jnp.ndarray, ...]:
        """Shift-robust envelopes per level."""
        return tuple(jnp.abs(z) for z in self.highpasses)

    def level_energy(self) -> jnp.ndarray:
        """[..., J] energy per level (coefficient-domain)."""
        return jnp.stack(
            [jnp.sum(jnp.abs(z) ** 2, axis=-1) for z in self.highpasses],
            axis=-1,
        )


def _level1(wavelet):
    w = _resolve_discrete(wavelet)
    if w.wavelet_type is not WaveletType.ORTHOGONAL:
        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_WAVELET,
            f"DTCWT level-1 wavelet must be orthogonal, got {w.name}",
            suggestions=("Use sym8 (default), a dbN, or coifN",),
        )
    return np.asarray(w.dec_lo), np.asarray(w.dec_hi)


def dtcwt_max_levels(n: int, wavelet="sym8") -> int:
    """Deepest usable level: every stage needs an even input length."""
    levels = 0
    while n % 2 == 0 and n // 2 >= len(_level1(wavelet)[0]):
        n //= 2
        levels += 1
    return levels


# ---------------------------------------------------------------------------
# Kernel tier: the whole decimated tree as ONE full-rate composite bank call.
# A decimated cascade composes exactly like the a trous one (h(z)h(z^2)...),
# so level-j outputs are c_j[i] = (F_j *fwd x)[2^j i + phi_j] with F_j the
# upsampled-composed filter and phi_j the accumulated stage offsets.  The
# composite MXU analysis kernel (planes_override, backward reads) serves the
# forward-read bank via reversed taps + a per-plane roll; subsampling is a
# strided slice.  The inverse is the exact adjoint: zero-stuff each plane at
# its phase and run the synthesis bank with the same reversed taps (the
# synthesis kernel IS the transpose of the analysis kernel).  Wasteful in
# FLOPs vs decimation (full rate at every level) but runs at the composite
# kernel's rate class instead of the per-tap jnp roll cascade — the
# round-3 BENCH_BEYOND DTCWT row sat at 52 Ms/s for exactly that reason.
# ---------------------------------------------------------------------------


def _tree_stage_filters(wavelet, levels: int, tree: str):
    """[(h, g, offset)] per stage for tree 'a' or 'b'."""
    h1, g1 = _level1(wavelet)
    hq, gq = qshift_filters()
    if tree == "a":
        stages = [(h1, g1, 0)] + [(hq, gq, 0)] * (levels - 1)
    else:
        stages = [(h1, g1, 1)] + [
            (hq[::-1], gq[::-1], 0) for _ in range(levels - 1)
        ]
    return stages


def _composed_tree_planes(stages):
    """Composed full-rate plane filters [(taps, phi, level)] for
    [d1..dJ, aJ] of one decimated tree."""
    def up(f, s):
        arr = np.zeros(s * (len(f) - 1) + 1, dtype=np.float64)
        arr[::s] = f
        return arr

    acc = np.array([1.0])
    phi = 0
    planes = []
    for k, (h, g, off) in enumerate(stages, start=1):
        s = 1 << (k - 1)
        phi_k = phi + s * off
        planes.append((np.convolve(acc, up(g, s)), phi_k, k))
        acc = np.convolve(acc, up(h, s))
        phi = phi_k
    planes.append((acc, phi, len(stages)))
    return planes


def _dtcwt_kernel_eligible(n: int, dtype, span: int, batch: int = 1) -> bool:
    from ..config import get_backend
    from ..kernels.modwt_pallas import pallas_available

    backend = get_backend()
    if backend == "jnp":
        return False
    if dtype not in (jnp.float32,):
        return False
    if n % 128 != 0 or n < max(2 * span, 256):
        return False
    from .packets import _BANK_CALL_BUDGET, _bank_rows_per_call

    if n > _BANK_CALL_BUDGET:
        # merged-tree bank calls overflow Mosaic's scoped VMEM budget
        # beyond ~2^20 samples per call (remote compile HTTP 500); a
        # single SIGNAL beyond the budget cannot be chunked — fall back
        return False
    rows = _bank_rows_per_call(batch, n)
    if batch > rows and rows < 32:
        # row-chunking is a net loss for DTCWT below ~32 rows/call: the
        # full-rate bank already wastes FLOPs vs decimation, and the
        # zero-stuff/roll glue runs at full batch either way — measured
        # 382 Ms/s chunked vs 771 Ms/s decimated fallback at 128x64K
        return False
    if backend == "auto" and not pallas_available():
        return False
    return True


def _dtcwt_kernel_analysis(x, wavelet, levels: int):
    """Both trees' full decomposition in ONE composite bank call (the two
    trees share the input, so their composed planes just concatenate into
    one multi-output bank), or None when ineligible."""
    from ..config import get_fused_precision
    from ..kernels.modwt_pallas import pallas_available
    from .packets import _bank_ana_chunked

    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n)
    planes_ab = []
    for tree in ("a", "b"):
        planes = _composed_tree_planes(_tree_stage_filters(wavelet, levels, tree))
        span = max(len(t) for t, _, _ in planes) - 1
        if not _dtcwt_kernel_eligible(n, x2.dtype, span, x2.shape[0]):
            return None
        planes_ab.append(planes)
    dense_rev = tuple(
        tuple(t[::-1].tolist())
        for planes in planes_ab
        for t, _, _ in planes
    )
    y = _bank_ana_chunked(
        x2, dense_rev, True, get_fused_precision(), not pallas_available()
    )
    trees = {}
    for ti, tree in enumerate(("a", "b")):
        planes = planes_ab[ti]
        outs = []
        for (taps, phi, level), y_p in zip(
            planes, y[ti * (levels + 1) : (ti + 1) * (levels + 1)]
        ):
            psi = (phi + len(taps) - 1) % n
            outs.append(
                jnp.roll(y_p, -psi, axis=-1)[..., :: 1 << level].reshape(
                    lead + (n >> level,)
                )
            )
        trees[tree] = outs
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    highpasses = tuple(
        (trees["a"][j] - 1j * trees["b"][j]) * inv_sqrt2 for j in range(levels)
    )
    return DTCWTResult(highpasses, trees["a"][levels], trees["b"][levels])


def _dtcwt_kernel_synthesis(result: DTCWTResult, wavelet):
    """Adjoint of :func:`_dtcwt_kernel_analysis`: one synthesis bank per
    tree on zero-stuffed planes.  Returns None when ineligible."""
    from ..config import get_fused_precision
    from ..kernels.modwt_pallas import pallas_available
    from .packets import _bank_syn_chunked

    levels = result.levels
    lead = result.lowpass_a.shape[:-1]
    n = result.highpasses[0].shape[-1] * 2
    sqrt2 = math.sqrt(2.0)
    # one synthesis bank over BOTH trees' stuffed planes: the 0.5 tree
    # average is absorbed into the taps
    all_dense = []
    all_stuffed = []
    for tree in ("a", "b"):
        planes = _composed_tree_planes(_tree_stage_filters(wavelet, levels, tree))
        span = max(len(t) for t, _, _ in planes) - 1
        if not _dtcwt_kernel_eligible(
            n, result.lowpass_a.dtype, span,
            int(np.prod(result.lowpass_a.shape[:-1]) or 1),
        ):
            return None
        all_dense.extend(
            tuple((0.5 * t[::-1]).tolist()) for t, _, _ in planes
        )
        coeffs = [
            (sqrt2 * jnp.real(z)) if tree == "a" else (-sqrt2 * jnp.imag(z))
            for z in result.highpasses
        ] + [result.lowpass_a if tree == "a" else result.lowpass_b]
        for (taps, phi, level), c in zip(planes, coeffs):
            c2 = c.reshape(-1, c.shape[-1]).astype(jnp.float32)
            stride = 1 << level
            psi = (phi + len(taps) - 1) % n
            q, s0 = divmod(psi, stride)
            buf = jnp.zeros((c2.shape[0], n), jnp.float32)
            buf = buf.at[..., s0::stride].set(
                jnp.roll(c2, q % c2.shape[-1], axis=-1)
            )
            all_stuffed.append(buf)
    out = _bank_syn_chunked(
        tuple(all_stuffed), tuple(all_dense), True, get_fused_precision(),
        not pallas_available(),
    )
    return out.reshape(lead + (n,))


def _decimated_bank_ok(n: int, dtype) -> bool:
    """Per-level eligibility of the decimated BANK cascade tier: the
    stage's full-rate pair call must fit the bank kernel's shape rules
    (row chunking handles any batch)."""
    from ..config import get_backend
    from ..kernels.modwt_pallas import pallas_available
    from .packets import _BANK_CALL_BUDGET

    backend = get_backend()
    if backend == "jnp" or dtype not in (jnp.float32,):
        return False
    if backend == "auto" and not pallas_available():
        return False
    return n % 128 == 0 and 512 <= n <= _BANK_CALL_BUDGET


def _pad_pair(lo, hi):
    """Equal-length (lo, hi) taps (trailing zeros) so one roll serves
    both bank outputs."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    L = max(len(lo), len(hi))
    return (np.pad(lo, (0, L - len(lo))), np.pad(hi, (0, L - len(hi))), L)


def _bank_convolve_downsample_pair(cur, lo, hi, offset: int):
    """One decimated analysis stage for BOTH branches as ONE full-rate
    bank call + phase subsample.

    ``convolve_downsample`` is ``out[i] = sum_j f[j] x[(2i+j+offset) % n]``
    (forward reads); the bank reads backward, so reversed taps + a
    ``-(L-1+offset)`` roll restore the alignment before the ``::2`` phase
    pick.  At 128x64K this replaces 2*L XLA roll+fma passes per stage
    with one MXU pass (VERDICT r04 #6: the decimated fallback was the
    dispatch-shaped bottleneck at large batches, 773 Ms/s DTCWT).
    """
    from ..config import get_fused_precision
    from ..kernels.modwt_pallas import pallas_available
    from .packets import _bank_ana_chunked

    lead = cur.shape[:-1]
    n = cur.shape[-1]
    lo_p, hi_p, L = _pad_pair(lo, hi)
    dense = (tuple(lo_p[::-1].tolist()), tuple(hi_p[::-1].tolist()))
    y_lo, y_hi = _bank_ana_chunked(
        cur.reshape(-1, n), dense, True, get_fused_precision(),
        not pallas_available(),
    )
    sh = (L - 1 + offset) % n
    a = jnp.roll(y_lo, -sh, axis=-1)[..., ::2].reshape(lead + (n // 2,))
    d = jnp.roll(y_hi, -sh, axis=-1)[..., ::2].reshape(lead + (n // 2,))
    return a, d


def _bank_upsample_convolve_pair(a, d, lo, hi, n_out: int, offset: int):
    """Adjoint stage: ``upsample_convolve(a, lo) + upsample_convolve(d,
    hi)`` as ONE synthesis bank call on the zero-stuffed planes."""
    from ..config import get_fused_precision
    from ..kernels.modwt_pallas import pallas_available
    from .packets import _bank_syn_chunked

    lead = a.shape[:-1]
    lo_p, hi_p, L = _pad_pair(lo, hi)
    dense = (tuple(lo_p[::-1].tolist()), tuple(hi_p[::-1].tolist()))

    def stuff(c):
        c2 = c.reshape(-1, c.shape[-1])
        buf = jnp.zeros((c2.shape[0], n_out), c2.dtype)
        return buf.at[..., ::2].set(c2)

    y = _bank_syn_chunked(
        (stuff(a), stuff(d)), dense, True, get_fused_precision(),
        not pallas_available(),
    )
    return jnp.roll(y, (L - 1 + offset) % n_out, axis=-1).reshape(
        lead + (n_out,)
    )


def dtcwt(
    x: jnp.ndarray,
    wavelet="sym8",
    *,
    levels: int,
) -> DTCWTResult:
    """Forward DTCWT of ``[..., N]`` signals (periodic boundaries).

    ``N`` must be divisible by ``2**levels``.  Returns complex highpasses
    per level plus both trees' final lowpasses.
    """
    h1, g1 = _level1(wavelet)
    hq, gq = qshift_filters()
    _validate_signal(x, min_length=2)
    n = x.shape[-1]
    if levels < 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_LEVEL, f"levels must be >= 1, got {levels}"
        )
    if n % (1 << levels):
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"N={n} must be divisible by 2^levels={1 << levels}",
            suggestions=("Pad the signal or reduce levels",),
        )
    kernel_res = _dtcwt_kernel_analysis(x, wavelet, levels)
    if kernel_res is not None:
        return kernel_res
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    highpasses = []
    cur_a = cur_b = x
    for level in range(1, levels + 1):
        n_j = cur_a.shape[-1]
        ha, ga, hb, gb, off_b = (
            (h1, g1, h1, g1, 1) if level == 1
            else (hq, gq, hq[::-1], gq[::-1], 0)
        )
        if _decimated_bank_ok(n_j, cur_a.dtype):
            # decimated BANK cascade: one MXU pair call per tree-level
            a_a, d_a = _bank_convolve_downsample_pair(cur_a, ha, ga, 0)
            a_b, d_b = _bank_convolve_downsample_pair(cur_b, hb, gb, off_b)
        else:
            d_a = convolve_downsample(cur_a, ga)
            a_a = convolve_downsample(cur_a, ha)
            d_b = convolve_downsample(cur_b, gb, offset=off_b)
            a_b = convolve_downsample(cur_b, hb, offset=off_b)
        highpasses.append((d_a - 1j * d_b) * inv_sqrt2)
        cur_a, cur_b = a_a, a_b
    return DTCWTResult(tuple(highpasses), cur_a, cur_b)


def idtcwt(result: DTCWTResult, wavelet="sym8") -> jnp.ndarray:
    """Inverse DTCWT: exact adjoint cascade per tree, averaged."""
    kernel_out = _dtcwt_kernel_synthesis(result, wavelet)
    if kernel_out is not None:
        return kernel_out
    h1, g1 = _level1(wavelet)
    hq, gq = qshift_filters()
    sqrt2 = math.sqrt(2.0)
    cur_a, cur_b = result.lowpass_a, result.lowpass_b
    for level in range(result.levels, 0, -1):
        z = result.highpasses[level - 1]
        d_a = sqrt2 * jnp.real(z)
        d_b = -sqrt2 * jnp.imag(z)
        n_out = 2 * z.shape[-1]
        ha, ga, hb, gb, off_b = (
            (h1, g1, h1, g1, 1) if level == 1
            else (hq, gq, hq[::-1], gq[::-1], 0)
        )
        if _decimated_bank_ok(n_out, result.lowpass_a.dtype):
            cur_a = _bank_upsample_convolve_pair(cur_a, d_a, ha, ga, n_out, 0)
            cur_b = _bank_upsample_convolve_pair(
                cur_b, d_b, hb, gb, n_out, off_b
            )
        else:
            cur_a = upsample_convolve(cur_a, ha, n_out) + upsample_convolve(
                d_a, ga, n_out
            )
            cur_b = upsample_convolve(
                cur_b, hb, n_out, offset=off_b
            ) + upsample_convolve(d_b, gb, n_out, offset=off_b)
    return 0.5 * (cur_a + cur_b)
