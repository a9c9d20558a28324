"""Symmetric-boundary MODWT in the kernel tier: composite body + edge splice.

The reference serves SYMMETRIC in every tier (``ScalarOps.java:818-835``,
``MultiLevelMODWTTransform.java:602-642``).  The per-level mirror of the
EVOLVING approximation is not a filter composition, so a symmetric transform
cannot be a single composite kernel call — but only the first/last
boundary-span samples ever see a mirror.  This module exploits that split:

* **Interior** (everything beyond the cumulative filter span): identical to
  the ZERO-boundary composite transform, served by the same MXU kernels as
  periodic/zero (:mod:`.modwt_mxu`) — synthesis with the alignment-composed
  TWO-SIDED per-plane filters (each level's ``t + sign*2^(j-1)*l + offset``
  op composed across levels, rebased to non-negative taps via a global
  left-extension).
* **Edges**: the exact jnp symmetric cascade runs on a tiny head (analysis:
  the transform is causal, so ``span`` samples suffice) or head+tail window
  (synthesis: two-sided reads, window sized so the far mirror cannot
  contaminate the spliced region), and the first/last ``span`` outputs are
  spliced over the kernel result.

The splice construction is a plain JAX composition, so ``jax.grad`` works
through the symmetric path: analysis differentiates through the composite
kernel's existing VJP + jnp ops; synthesis gets an explicit custom VJP whose
backward pass runs the composite ANALYSIS kernel with the same plane
filters on a shifted cotangent (the transpose of a forward-reading filter
bank sum is the backward-reading filter bank split).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .modwt_mxu import (
    _auto_tiles,
    _composite_analysis_call,
    _composite_synthesis_call,
    _to_rows,
    _from_rows,
    composite_halo_samples,
)
from .modwt_pallas import _round_up

_LANES = 128
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Alignment-composed per-plane synthesis filters
# ---------------------------------------------------------------------------


def _op_filter(base: np.ndarray, spacing: int, sign: int, offset: int):
    """Dense (taps ascending by delta, start_delta) for the per-level op
    ``out[t] = sum_l base[l] * in[t + sign*spacing*l + offset]``."""
    arr = np.zeros(spacing * (len(base) - 1) + 1, dtype=np.float64)
    arr[::spacing] = base
    if sign == +1:
        return arr, offset
    return arr[::-1].copy(), offset - spacing * (len(base) - 1)


def _compose(f1, s1, f2, s2):
    return np.convolve(f1, f2), s1 + s2


def symmetric_synthesis_plane_filters(w, levels: int):
    """[(taps, start_delta)] for planes [d1..dJ, aJ]: the contribution of
    each coefficient plane to the reconstruction under the alignment-shifted
    symmetric inverse (``imodwt_multilevel`` symmetric semantics,
    cf. ``MultiLevelMODWTTransform.java:602-642``)."""
    from ..transforms.multilevel import _symmetric_alignment, _tau_j

    low = np.asarray(w.rec_lo, dtype=np.float64) * _INV_SQRT2
    high = np.asarray(w.rec_hi, dtype=np.float64) * _INV_SQRT2

    def a_op(j):
        dec = _symmetric_alignment(w, j)
        tau_h = _tau_j(w.rec_lo.shape[0], j) + dec.delta_approx
        sign = +1 if dec.approx_plus else -1
        return _op_filter(low, 1 << (j - 1), sign,
                          -tau_h if dec.approx_plus else tau_h)

    def d_op(j):
        dec = _symmetric_alignment(w, j)
        tau_g = _tau_j(w.rec_hi.shape[0], j) + dec.delta_detail
        sign = +1 if dec.detail_plus else -1
        return _op_filter(high, 1 << (j - 1), sign,
                          -tau_g if dec.detail_plus else tau_g)

    planes = []
    pre = (np.array([1.0]), 0)  # A_1 o ... o A_{j-1}
    for j in range(1, levels + 1):
        planes.append(_compose(*pre, *d_op(j)))
        pre = _compose(*pre, *a_op(j))
    planes.append(pre)
    return planes


def _rebase(plane_filters):
    """Global rebase to non-negative taps: returns (dense tuples, G, d_max)
    with ``f'_p[tau] = f_p[tau - G]`` and ``G = -min start`` so reads become
    ``plane'[t + tau] = plane[t + tau - G]`` (left-extend each plane by G)."""
    g = max(0, -min(s for _, s in plane_filters))
    d_max = max(s + len(a) - 1 for a, s in plane_filters)
    dense = []
    for arr, start in plane_filters:
        f = np.zeros(start + g + len(arr), dtype=np.float64)
        f[start + g:] = arr
        dense.append(tuple(f.tolist()))
    return tuple(dense), g, d_max


# ---------------------------------------------------------------------------
# Kernel calls (zero-boundary body)
# ---------------------------------------------------------------------------


def _ext_rows(x2: jnp.ndarray, left: int, total: int) -> jnp.ndarray:
    b, n = x2.shape
    pieces = []
    if left:
        pieces.append(jnp.zeros((b, left), x2.dtype))
    pieces.append(x2)
    if total - left - n:
        pieces.append(jnp.zeros((b, total - left - n), x2.dtype))
    return _to_rows(jnp.concatenate(pieces, axis=-1))


def _snug_tile_rows(rows_needed: int, tile_max: int) -> int:
    """Largest 8-aligned tile <= tile_max minimizing the round-up waste of
    ``rows_needed`` (the g-shifted symmetric operand is NOT a power of two;
    naive 512-row tiles round 64K+g up to 128K — 2x the kernel work)."""
    rows8 = _round_up(rows_needed, 8)
    best_tr, best_waste = tile_max, _round_up(rows8, tile_max) - rows8
    tr = tile_max
    while tr >= 8 and best_waste:
        waste = _round_up(rows8, tr) - rows8
        if waste < best_waste:
            best_tr, best_waste = tr, waste
        tr -= 8
    return best_tr


def _symsyn_kernel(planes2d, dense, g: int, d_max: int, levels: int,
                   precision: str, interpret: bool):
    """Zero-boundary synthesis with the rebased two-sided plane filters:
    out[t] = sum_p sum_tau f'_p[tau] plane_p[t + tau - G], t in [0, n)."""
    b, n = planes2d[0].shape
    tau_max = d_max + g
    halo_rows = _round_up(max(-(-tau_max // _LANES), 1), 8)
    halo_pad = halo_rows * _LANES
    rows_needed = -(-(g + n) // _LANES)
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, rows_needed, _round_up(rows_needed, 8),
        itemsize=4, scratch_windows=2 * (levels + 2),
    )
    tile_rows = _snug_tile_rows(rows_needed, tile_rows)
    n_pad = _round_up(g + n, tile_rows * _LANES)
    ext = tuple(
        _ext_rows(p, g, n_pad + halo_pad) for p in planes2d
    )
    out = _composite_synthesis_call(
        ext,
        None,
        levels=levels,
        filters=((1.0,), (1.0,)),  # unused under planes_override
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
        edge="zero",
        inline_halo=False,
        planes_override=dense,
    )
    return _from_rows(out)[..., :n]


def _symsyn_adjoint_kernel(g_cot, dense, g: int, d_max: int, levels: int,
                           precision: str, interpret: bool):
    """Transpose of :func:`_symsyn_kernel`: per-plane
    grad_p[q] = sum_tau f'_p[tau] g[q + tau - G] read BACKWARD as
    grad_p[q] = out_p[q + 2G] of the analysis kernel on z = [0_G | g]."""
    b, n = g_cot.shape
    tau_max = d_max + g
    halo_rows = _round_up(max(-(-tau_max // _LANES), 1), 8)
    halo_pad = halo_rows * _LANES
    rows_needed = -(-(n + 2 * g) // _LANES)
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, rows_needed, _round_up(rows_needed, 8),
        itemsize=4, scratch_windows=2,
    )
    tile_rows = _snug_tile_rows(rows_needed, tile_rows)
    n_pad = _round_up(n + 2 * g, tile_rows * _LANES)
    # Adjoint of out[t] = sum_tau f'_p[tau] plane_p[t + tau - G]:
    #   grad_p[q] = sum_tau f'_p[tau] cot[q + G - tau] = out_a[q + 2G]
    # where out_a is the BACKWARD-reading analysis kernel with the SAME
    # dense filters on z = [0_G | cot] (kernel halo supplies the rest of
    # the zero extension).  The non-inline analysis call expects its own
    # halo_pad prepended, so z is embedded after it.
    x_ext = _ext_rows(g_cot, halo_pad + g, halo_pad + n_pad)
    outs = _composite_analysis_call(
        x_ext,
        None,
        levels=levels,
        filters=((1.0,), (1.0,)),
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
        edge="zero",
        inline_halo=False,
        planes_override=dense,
    )
    return tuple(_from_rows(o)[..., 2 * g : 2 * g + n] for o in outs)


# ---------------------------------------------------------------------------
# Public entry points (kernel body + jnp edge splice)
# ---------------------------------------------------------------------------


def _jnp_symmetric_cascade(x, w, levels):
    from ..ops.convolve import atrous_analysis_pair

    # keep filters HOST-side numpy: a jnp.asarray here would stage a
    # convert_element_type under an enclosing jit trace (omnistaging) and
    # hand atrous_analysis_pair a tracer it must np.asarray
    low = (np.asarray(w.dec_lo, np.float64) * _INV_SQRT2).astype(x.dtype)
    high = (np.asarray(w.dec_hi, np.float64) * _INV_SQRT2).astype(x.dtype)
    cur = x
    details = []
    for j in range(1, levels + 1):
        approx, detail = atrous_analysis_pair(
            cur, low, high, spacing=1 << (j - 1), boundary="symmetric"
        )
        details.append(detail)
        cur = approx
    return details, cur


def _splice_head(body, head, cut):
    return jnp.concatenate([head[..., :cut], body[..., cut:]], axis=-1)


def fused_symmetric_analysis(x, w, *, levels: int, tile: int = 65536,
                             interpret: bool = False,
                             precision: str | None = None):
    """Symmetric J-level analysis -> (details tuple, approx); [B, N] inputs.

    Composite-zero kernel body + exact jnp head splice: the symmetric
    cascade is CAUSAL (filters read backward; only the signal head is
    mirrored), so outputs at ``p >= span`` equal the zero-boundary
    transform, and outputs ``p < span`` come from the jnp cascade on the
    first ``W = round_up(span, 128)`` samples.  Differentiable end to end.
    """
    from ..config import get_fused_precision
    from .modwt_pallas import _analysis_core, _kernel_filters

    prec = precision or get_fused_precision()
    b, n = x.shape
    span = composite_halo_samples(w.filter_length, levels)
    w_head = _round_up(span, _LANES)
    filters = _kernel_filters(w, synthesis=False)
    if n < max(2 * w_head, 2 * span) or n % _LANES != 0:
        details, approx = _jnp_symmetric_cascade(x, w, levels)
        return tuple(details), approx
    body = _analysis_core(x, levels, filters, False, tile, interpret, prec)
    # head window sliced in the row view (a flat slice of a pallas operand
    # makes XLA copy-insert the full input; see parallel/tiled.py)
    head_x = _from_rows(_to_rows(x)[:, : w_head // _LANES, :])
    head_d, head_a = _jnp_symmetric_cascade(head_x, w, levels)
    details = tuple(
        _splice_head(body[j], head_d[j], span) for j in range(levels)
    )
    approx = _splice_head(body[levels], head_a, span)
    return details, approx


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _symsyn_core(planes, dense, g, d_max, levels, precision, interpret):
    return _symsyn_kernel(planes, dense, g, d_max, levels, precision,
                          interpret)


def _symsyn_core_fwd(planes, dense, g, d_max, levels, precision, interpret):
    return _symsyn_kernel(planes, dense, g, d_max, levels, precision,
                          interpret), None


def _symsyn_core_bwd(dense, g, d_max, levels, precision, interpret, _, cot):
    return (_symsyn_adjoint_kernel(cot, dense, g, d_max, levels, precision,
                                   interpret),)


_symsyn_core.defvjp(_symsyn_core_fwd, _symsyn_core_bwd)


def fused_symmetric_synthesis(details, approx, w, *, tile: int = 65536,
                              interpret: bool = False,
                              precision: str | None = None):
    """Symmetric inverse from (details, approx); kernel body + edge splice.

    The alignment-shifted symmetric inverse reads two-sided per-level
    windows; composed across levels each plane contributes through ONE
    two-sided filter, so the interior is a single zero-boundary composite
    kernel pass with those filters.  The first ``spanL`` / last ``spanR``
    outputs (the only positions whose reads cross a mirror) are spliced
    from the exact jnp inverse on head/tail windows sized so the far-side
    mirror of the window cannot contaminate the spliced region.
    Differentiable: custom VJP runs the composite ANALYSIS kernel with the
    time-reversed plane filters.
    """
    from ..config import get_fused_precision
    from ..transforms.multilevel import (
        MultiLevelMODWTResult,
        imodwt_multilevel,
    )

    prec = precision or get_fused_precision()
    levels = len(details)
    planes = tuple(details) + (approx,)
    b_shape = approx.shape[:-1]
    n = approx.shape[-1]
    pf = symmetric_synthesis_plane_filters(w, levels)
    dense, g, d_max = _rebase(pf)
    span_l, span_r = g, max(d_max, 0)
    w_head = _round_up(span_l + 2 * span_r + 1, _LANES)
    w_tail = _round_up(span_r + 2 * span_l + 1, _LANES)
    if n < w_head + w_tail or n % _LANES != 0:
        return imodwt_multilevel(
            MultiLevelMODWTResult(tuple(details), approx), w,
            boundary="symmetric", backend="jnp",
        )
    p2 = tuple(p.reshape((-1, n)) for p in planes)
    body = _symsyn_core(p2, dense, g, d_max, levels, prec, interpret)

    def window(p, rows, side):
        r = _to_rows(p)
        sel = r[:, :rows, :] if side == "head" else r[:, -rows:, :]
        return _from_rows(sel)

    head_res = MultiLevelMODWTResult(
        tuple(window(p, w_head // _LANES, "head") for p in p2[:-1]),
        window(p2[-1], w_head // _LANES, "head"),
    )
    head = imodwt_multilevel(head_res, w, boundary="symmetric", backend="jnp")
    tail_res = MultiLevelMODWTResult(
        tuple(window(p, w_tail // _LANES, "tail") for p in p2[:-1]),
        window(p2[-1], w_tail // _LANES, "tail"),
    )
    tail = imodwt_multilevel(tail_res, w, boundary="symmetric", backend="jnp")
    out = jnp.concatenate(
        [
            head[..., :span_l],
            body[..., span_l : n - span_r],
            tail[..., w_tail - span_r :],
        ],
        axis=-1,
    )
    return out.reshape(b_shape + (n,))
