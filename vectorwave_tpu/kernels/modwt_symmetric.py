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
    _const_terms,
    _shift_rows,
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
# Two-sided one-pass synthesis kernel (v2): reads the UNEXTENDED planes with
# a [H | tile | H] window (zero-filled at both signal edges) and blends the
# jnp head/tail splice values IN-KERNEL — no g-shift plane extensions, no
# output concatenate: HBM traffic drops to read-planes + write-x, the same
# budget as the periodic synthesis kernel.  (Round 3's symmetric synthesis
# materialized a left-extended copy of every plane plus a full-size output
# splice; those copies were most of its 3.1x gap to periodic.)
# ---------------------------------------------------------------------------


def _band_single_offset(filt: np.ndarray, offset: int) -> dict[int, np.ndarray]:
    """{e: M_e[128, 128]} for out[p] = sum_tau f[tau] plane[p + offset + tau]
    (two-sided reads: ``offset`` may be negative, so e can be negative)."""
    blocks: dict[int, np.ndarray] = {}
    for tau, val in enumerate(np.asarray(filt, dtype=np.float64)):
        if val == 0.0:
            continue
        delta = offset + tau
        for i in range(_LANES):
            src = i + delta
            e = src // _LANES
            lane = src - e * _LANES
            m = blocks.setdefault(e, np.zeros((_LANES, _LANES), dtype=np.float64))
            m[lane, i] += val
    return blocks


@functools.partial(
    jax.jit,
    static_argnames=(
        "dense", "g", "levels", "span_l", "span_r", "b_tile", "tile_rows",
        "halo_rows", "precision", "interpret",
    ),
)
def _symsyn2_call(
    coeffs: tuple[jnp.ndarray, ...],  # n_planes x [B, R, 128], unextended
    head: jnp.ndarray,  # [B, hh8, 128] exact head values (pos < span_l used)
    tail: jnp.ndarray,  # [B, ht8, 128] exact tail values (last span_r used)
    *,
    dense: tuple,  # rebased plane filters (non-negative taps)
    g: int,  # rebase shift: reads are plane[p + tau - g]
    levels: int,
    span_l: int,
    span_r: int,
    b_tile: int,
    tile_rows: int,
    halo_rows: int,  # H, per side
    precision: str,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_planes = levels + 1
    plane_bands = [
        _band_single_offset(np.asarray(d, np.float64), -g) for d in dense
    ]
    all_e = sorted({e for pb in plane_bands for e in pb})
    e_min, e_max = all_e[0], all_e[-1]
    assert -halo_rows <= e_min and e_max <= halo_rows
    groups = []  # (shift, members, [M per member]) — roll-after-dot form
    for e in all_e:
        members = [pi for pi in range(n_planes) if e in plane_bands[pi]]
        groups.append((e_max - e, members,
                       [plane_bands[pi][e] for pi in members]))

    b, r, _ = coeffs[0].shape
    h = halo_rows
    window_rows = tile_rows + 2 * h
    num_t = r // tile_rows
    grid = (b // b_tile, num_t)
    total_steps = (b // b_tile) * num_t
    dtype = coeffs[0].dtype
    hh8 = head.shape[1]
    ht8 = tail.shape[1]
    group_consts: list[jnp.ndarray] = []
    n_mats = 0
    for _, _, ms in groups:
        for m in ms:
            group_consts.extend(_const_terms(m, precision))
            n_mats += 1
    cpg = len(group_consts) // n_mats

    def kernel(*refs):
        coeff_hbm = refs[:n_planes]
        head_ref = refs[n_planes]
        tail_ref = refs[n_planes + 1]
        off = n_planes + 2
        g_refs = refs[off : off + len(group_consts)]
        out_ref = refs[off + len(group_consts)]
        scratch, sems = refs[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        li = bi * num_t + t

        def window_dma(bi2, t2, slot, phase):
            bs2 = pl.ds(bi2 * b_tile, b_tile)

            def _interior():
                cs = [
                    pltpu.make_async_copy(
                        coeff_hbm[i].at[
                            bs2, pl.ds(t2 * tile_rows - h, window_rows), :
                        ],
                        scratch.at[slot, i],
                        sems.at[slot, i],
                    )
                    for i in range(n_planes)
                ]
                for c in cs:
                    c.start() if phase == 0 else c.wait()

            def _left():
                cs = [
                    pltpu.make_async_copy(
                        coeff_hbm[i].at[bs2, pl.ds(0, tile_rows + h), :],
                        scratch.at[slot, i, :, pl.ds(h, tile_rows + h), :],
                        sems.at[slot, i],
                    )
                    for i in range(n_planes)
                ]
                for c in cs:
                    c.start() if phase == 0 else c.wait()
                if phase == 0:
                    scratch[slot, :, :, :h, :] = jnp.zeros(
                        (n_planes, b_tile, h, _LANES), dtype
                    )

            def _right():
                cs = [
                    pltpu.make_async_copy(
                        coeff_hbm[i].at[
                            bs2, pl.ds(t2 * tile_rows - h, tile_rows + h), :
                        ],
                        scratch.at[slot, i, :, pl.ds(0, tile_rows + h), :],
                        sems.at[slot, i],
                    )
                    for i in range(n_planes)
                ]
                for c in cs:
                    c.start() if phase == 0 else c.wait()
                if phase == 0:
                    scratch[slot, :, :, tile_rows + h :, :] = jnp.zeros(
                        (n_planes, b_tile, h, _LANES), dtype
                    )

            def _single():
                cs = [
                    pltpu.make_async_copy(
                        coeff_hbm[i].at[bs2, pl.ds(0, tile_rows), :],
                        scratch.at[slot, i, :, pl.ds(h, tile_rows), :],
                        sems.at[slot, i],
                    )
                    for i in range(n_planes)
                ]
                for c in cs:
                    c.start() if phase == 0 else c.wait()
                if phase == 0:
                    scratch[slot, :, :, :h, :] = jnp.zeros(
                        (n_planes, b_tile, h, _LANES), dtype
                    )
                    scratch[slot, :, :, tile_rows + h :, :] = jnp.zeros(
                        (n_planes, b_tile, h, _LANES), dtype
                    )

            if num_t == 1:
                _single()
            else:
                pl.when(t2 == 0)(_left)
                pl.when(t2 == num_t - 1)(_right)
                if num_t > 2:
                    pl.when(jnp.logical_and(t2 != 0, t2 != num_t - 1))(
                        _interior
                    )

        @pl.when(li == 0)
        def _prologue():
            window_dma(bi, t, 0, phase=0)

        window_dma(bi, t, li % 2, phase=1)

        if total_steps > 1:
            @pl.when(li + 1 < total_steps)
            def _prefetch():
                li1 = li + 1
                window_dma(li1 // num_t, li1 % num_t, li1 % 2, phase=0)

        flats = [
            scratch[li % 2, i].reshape(b_tile * window_rows, _LANES)
            for i in range(n_planes)
        ]
        from .modwt_mxu import _dot_parts, _prep_operand

        parts = [_prep_operand(f, precision) for f in flats]
        acc = None
        ci = 0
        for shift, members, _ in groups:
            s = None
            for pi in members:
                term = _dot_parts(
                    parts[pi], g_refs[ci * cpg : (ci + 1) * cpg], precision
                )
                ci += 1
                s = term if s is None else s + term
            s = _shift_rows(s, shift)
            acc = s if acc is None else acc + s
        # out_tile[q] = acc[h + q + e_max]: roll by (h - e_max), slice [2h:)
        accd = _shift_rows(acc.astype(dtype), h - e_max)
        out3 = accd.reshape(b_tile, window_rows, _LANES)[:, 2 * h :, :]
        # in-kernel edge splice: first span_l samples (t == 0) come from the
        # exact jnp head inverse, last span_r (t == num_t-1) from the tail
        pos_h = (
            jax.lax.broadcasted_iota(jnp.int32, (hh8, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (hh8, _LANES), 1)
        )
        mask_h = jnp.logical_and(t == 0, pos_h < span_l)[None]
        head_part = jnp.where(mask_h, head_ref[:], out3[:, :hh8, :])
        pos_t = (
            jax.lax.broadcasted_iota(jnp.int32, (ht8, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (ht8, _LANES), 1)
        )
        mask_t = jnp.logical_and(
            t == num_t - 1, pos_t >= ht8 * _LANES - span_r
        )[None]
        tail_part = jnp.where(mask_t, tail_ref[:], out3[:, tile_rows - ht8 :, :])
        out_ref[:] = jnp.concatenate(
            [head_part, out3[:, hh8 : tile_rows - ht8, :], tail_part], axis=1
        )

    macs = sum(len(ms) * _LANES for _, _, ms in groups) * _LANES
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes
        + [
            pl.BlockSpec(
                (b_tile, hh8, _LANES), lambda bi, t: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (b_tile, ht8, _LANES), lambda bi, t: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(group_consts))],
        out_specs=pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n_planes, b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, n_planes)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs * b * r * _LANES,
            bytes_accessed=b * r * _LANES * (n_planes + 1) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*coeffs, head, tail, *group_consts)
    return out


def _symsyn2_tiles(b: int, r: int, levels: int, h: int, hh8: int, ht8: int):
    """(b_tile, tile_rows) for the two-sided kernel, or None when no 8-row
    tile divides R while covering the halo and both splice slabs."""
    b_tile, tile_max = _auto_tiles(
        b, levels, 2 * h, r, r, itemsize=4,
        scratch_windows=2 * (levels + 2),
    )
    tr = min(_round_up(tile_max, 8), r)
    need = max(h, hh8 + ht8, 8)
    while tr >= need:
        if r % tr == 0:
            return b_tile, tr
        tr -= 8
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _symsyn2_core(p2, head_slab, tail_slab, dense, g, d_max, levels, span_l,
                  span_r, tiles, precision_interpret):
    b_tile, tile_rows, h = tiles
    precision, interpret = precision_interpret
    return _from_rows(
        _symsyn2_call(
            tuple(_to_rows(p) for p in p2),
            head_slab,
            tail_slab,
            dense=dense,
            g=g,
            levels=levels,
            span_l=span_l,
            span_r=span_r,
            b_tile=b_tile,
            tile_rows=tile_rows,
            halo_rows=h,
            precision=precision,
            interpret=interpret,
        )
    )


def _symsyn2_fwd(p2, head_slab, tail_slab, dense, g, d_max, levels, span_l,
                 span_r, tiles, precision_interpret):
    return _symsyn2_core(
        p2, head_slab, tail_slab, dense, g, d_max, levels, span_l, span_r,
        tiles, precision_interpret,
    ), None


def _symsyn2_bwd(dense, g, d_max, levels, span_l, span_r, tiles,
                 precision_interpret, _, cot):
    """The kernel output is out = splice(body(planes), head, tail) with
    body linear: d_planes = body^T(cot . interior_mask) via the existing
    rebased adjoint kernel; d_head / d_tail are the masked cotangent slabs."""
    precision, interpret = precision_interpret
    n = cot.shape[-1]
    hh8 = _round_up(max(-(-span_l // _LANES), 1), 8)
    ht8 = _round_up(max(-(-span_r // _LANES), 1), 8)
    idx = jnp.arange(n)
    interior = jnp.logical_and(idx >= span_l, idx < n - span_r).astype(cot.dtype)
    grads = _symsyn_adjoint_kernel(
        cot * interior, dense, g, d_max, levels, precision, interpret
    )
    head_mask = (jnp.arange(hh8 * _LANES) < span_l).astype(cot.dtype)
    d_head = _to_rows(cot[..., : hh8 * _LANES] * head_mask)
    tail_mask = (
        jnp.arange(ht8 * _LANES) >= ht8 * _LANES - span_r
    ).astype(cot.dtype)
    d_tail = _to_rows(cot[..., n - ht8 * _LANES :] * tail_mask)
    return tuple(grads), d_head, d_tail


_symsyn2_core.defvjp(_symsyn2_fwd, _symsyn2_bwd)


def _jnp_symmetric_cascade(x, w, levels):
    low = np.asarray(w.dec_lo, np.float64) * _INV_SQRT2
    high = np.asarray(w.dec_hi, np.float64) * _INV_SQRT2
    return _jnp_symmetric_cascade_filters(x, low, high, levels)


def _jnp_symmetric_cascade_filters(x, low, high, levels):
    from ..ops.convolve import atrous_analysis_pair

    # keep filters HOST-side numpy: a jnp.asarray here would stage a
    # convert_element_type under an enclosing jit trace (omnistaging) and
    # hand atrous_analysis_pair a tracer it must np.asarray
    low = np.asarray(low, np.float64).astype(x.dtype)
    high = np.asarray(high, np.float64).astype(x.dtype)
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


#: row budget of the in-kernel head-splice slab (one 8-row block per plane);
#: spans beyond it (very long filters x deep levels) take the jnp splice path
_HEAD_ROWS = 8


def fused_symmetric_analysis(x, w, *, levels: int, tile: int = 65536,
                             interpret: bool = False,
                             precision: str | None = None):
    """Symmetric J-level analysis -> (details tuple, approx); [B, N] inputs.

    Composite-zero kernel body + exact head splice: the symmetric cascade
    is CAUSAL (filters read backward; only the signal head is mirrored), so
    outputs at ``p >= span`` equal the zero-boundary transform, and outputs
    ``p < span`` come from the jnp cascade on the first
    ``W = round_up(span, 128)`` samples.  For spans within one 8-row slab
    the splice happens INSIDE the kernel (``head_splice`` input of the
    composite analysis call) so no full-plane concatenate copies are
    materialized — round 3's symmetric tier lost ~2x of its throughput to
    exactly those copies.  Differentiable end to end (custom VJP below for
    the in-kernel tier; jnp composition for the fallback).
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
    if span <= _HEAD_ROWS * _LANES:
        outs = _symana_core(x, levels, filters, span, w_head, tile, prec,
                            interpret)
        return tuple(outs[:levels]), outs[levels]
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


def _head_slab(plane, hr8: int):
    """[B, >=?] head samples -> [B, hr8, 128] slab (zero-pad past the end;
    the in-kernel splice mask never reads beyond ``span``)."""
    need = hr8 * _LANES
    if plane.shape[-1] >= need:
        q = plane[..., :need]
    else:
        q = jnp.concatenate(
            [plane, jnp.zeros(plane.shape[:-1] + (need - plane.shape[-1],),
                              plane.dtype)],
            axis=-1,
        )
    return _to_rows(q)


def _symana_run(x, levels, filters, span, w_head, tile, precision, interpret):
    from .modwt_mxu import run_analysis_composite

    head_x = _from_rows(_to_rows(x)[:, : w_head // _LANES, :])
    head_d, head_a = _jnp_symmetric_cascade_filters(
        head_x, filters[0], filters[1], levels
    )
    head_slab = jnp.stack(
        [_head_slab(p, _HEAD_ROWS) for p in tuple(head_d) + (head_a,)]
    )
    return run_analysis_composite(
        x, levels, filters, False, tile, precision, interpret,
        head_splice=(head_slab, span),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _symana_core(x, levels, filters, span, w_head, tile, precision, interpret):
    return _symana_run(x, levels, filters, span, w_head, tile, precision,
                       interpret)


def _symana_fwd(x, levels, filters, span, w_head, tile, precision, interpret):
    return _symana_run(x, levels, filters, span, w_head, tile, precision,
                       interpret), x


def _symana_bwd(levels, filters, span, w_head, tile, precision, interpret, x,
                cots):
    """out_p = where(pos < span, head_p(x[:w_head]), body_p(x)) with
    body = zero-boundary composite analysis, so
    dx = body^T(g . [pos >= span]) + head^T(g . [pos < span]); body^T is the
    composite synthesis kernel with the same filters, head^T plain jnp AD."""
    from .modwt_mxu import run_synthesis_composite

    n = x.shape[-1]
    interior = (jnp.arange(n) >= span).astype(x.dtype)
    g_int = tuple(c * interior for c in cots)
    dx = run_synthesis_composite(
        g_int, levels, filters, False, tile, precision, interpret
    )
    head_x = _from_rows(_to_rows(x)[:, : w_head // _LANES, :])

    def head_fn(hx):
        d, a = _jnp_symmetric_cascade_filters(
            hx, filters[0], filters[1], levels
        )
        return tuple(d) + (a,)

    _, pull = jax.vjp(head_fn, head_x)
    head_mask = (jnp.arange(w_head) < span).astype(x.dtype)
    (dhx,) = pull(tuple(c[..., :w_head] * head_mask for c in cots))
    dx = dx.at[..., :w_head].add(dhx)
    return (dx,)


_symana_core.defvjp(_symana_fwd, _symana_bwd)


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

    # two-sided one-pass kernel (v2): unextended plane reads + in-kernel
    # splice — same HBM budget as the periodic synthesis kernel
    hh8 = _round_up(max(-(-span_l // _LANES), 1), 8)
    ht8 = _round_up(max(-(-span_r // _LANES), 1), 8)
    h = _round_up(max(-(-g // _LANES), -(-max(d_max, 1) // _LANES), 1), 8)
    r_rows = n // _LANES
    tiles = (
        _symsyn2_tiles(p2[0].shape[0], r_rows, levels, h, hh8, ht8)
        if hh8 <= _HEAD_ROWS and ht8 <= _HEAD_ROWS
        else None
    )
    if tiles is not None:
        def slab(full, rows8, side):
            need = rows8 * _LANES
            m = full.shape[-1]
            if side == "head":
                q = (
                    full[..., :need]
                    if m >= need
                    else jnp.concatenate(
                        [full,
                         jnp.zeros(full.shape[:-1] + (need - m,), full.dtype)],
                        axis=-1,
                    )
                )
            else:
                q = (
                    full[..., -need:]
                    if m >= need
                    else jnp.concatenate(
                        [jnp.zeros(full.shape[:-1] + (need - m,), full.dtype),
                         full],
                        axis=-1,
                    )
                )
            return _to_rows(q)

        b_tile, tile_rows = tiles
        out = _symsyn2_core(
            p2, slab(head, hh8, "head"), slab(tail, ht8, "tail"),
            dense, g, d_max, levels, span_l, span_r,
            (b_tile, tile_rows, h), (prec, interpret),
        )
        return out.reshape(b_shape + (n,))

    # fallback: rebased body kernel + jnp output splice (long filters)
    body = _symsyn_core(p2, dense, g, d_max, levels, prec, interpret)
    out = jnp.concatenate(
        [
            head[..., :span_l],
            body[..., span_l : n - span_r],
            tail[..., w_tail - span_r :],
        ],
        axis=-1,
    )
    return out.reshape(b_shape + (n,))
