"""True 2-D MODWT Pallas kernels: both separable passes inside VMEM.

Round-3's 2-D fast path (kernels/modwt2_mxu.py) is plain XLA: every axis
pass materializes half-GB fields in HBM, and the column passes transpose
them (measured on chip: ONE [8,2048,2048] swapaxes = 3.3 ms, a block-axis
roll = 4.2 ms, full db4 J=4 roundtrip = 180 ms, tools/probe_2d_breakdown.py
— transposes + rolls are most of it).  Here each grid step holds an image
tile (+ halos) in VMEM and runs BOTH axis passes before anything returns to
HBM:

* **W-axis** (lanes): the 1-D banded-matmul formulation on the flattened
  [rows x blocks, 128] view.  The periodic wrap rides as ``wb`` extra
  DMA'd blocks per row (analysis: left, from the row's far end), so block
  rolls never leak across image rows — the out-of-range blocks that a
  flat roll corrupts are exactly the halo blocks the output never keeps.
* **H-axis** (sublanes): LEFT matmuls ``out_block = sum_E L_E @ block[..]``
  contracting the 128-row block axis — the MXU absorbs what XLA could only
  express as a transpose.
* Subbands are written in STANDARD [B, H, W] layout directly from VMEM —
  no boundary transposes anywhere.

Halo budget: ``hb = ceil(span/128)`` 128-row / 128-lane blocks per side,
sized per call from the deepest level it serves (composite span
(L0-1)(2^J - 1)); the level-group split keeps shallow levels on the
1-block window.  hb <= 4 covers db4 to J=6 and sym8 to J=5; wider spans
fall back to the XLA path.  Periodic and zero boundaries.

Reference 2-D analogue: none (the reference is 1-D only); semantics are
transforms/twodim.py's, matched by tests against the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .modwt2_mxu import composite_planes_split
from .modwt_mxu import _dot

_LANES = 128


def _shift_rows(flat, shift: int):
    from jax.experimental.pallas import tpu as pltpu

    if shift == 0:
        return flat
    return pltpu.roll(flat, shift, 0)


def _w_band_mats(taps_list, sign: int) -> dict[int, np.ndarray]:
    """{e: M_e[128, P*128]} lane-axis band matrices for P filters at once
    (out[p] = sum f[tau] x[p + sign*tau]); e in {-hb..0} (analysis) or
    {0..hb} (synthesis) with hb = ceil(span/128) halo blocks."""
    blocks: dict[int, np.ndarray] = {}
    n_p = len(taps_list)
    for pi, taps in enumerate(taps_list):
        for tau, val in enumerate(np.asarray(taps, np.float64)):
            if val == 0.0:
                continue
            delta = sign * tau
            for i in range(_LANES):
                src = i + delta
                e = src // _LANES
                lane = src - e * _LANES
                m = blocks.setdefault(
                    e, np.zeros((_LANES, n_p * _LANES), np.float64)
                )
                m[lane, pi * _LANES + i] += val
    return blocks


def _h_band_mats(taps, sign: int) -> dict[int, np.ndarray]:
    """{E: L_E[128, 128]} sublane-axis band matrices for LEFT matmuls:
    out_rows[r'] = sum_E (L_E @ X_rowblock[r'_block - sign*E])[r' % 128]
    with out[r] = sum f[tau] X[r + sign*tau]."""
    blocks: dict[int, np.ndarray] = {}
    for tau, val in enumerate(np.asarray(taps, np.float64)):
        if val == 0.0:
            continue
        delta = sign * tau
        for i in range(_LANES):  # output row within block
            src = i + delta
            e = src // _LANES
            row = src - e * _LANES
            m = blocks.setdefault(e, np.zeros((_LANES, _LANES), np.float64))
            # out[i] += val * X[block e][row]: L_E[i, row]
            m[i, row] += val
    return blocks


def modwt2_pallas_eligible(x, w, levels: int, boundary: str) -> bool:
    from ..config import get_backend
    from .modwt_pallas import pallas_available

    b = boundary.lower()
    if not (b.startswith("per") or b.startswith("zero")):
        return False
    backend = get_backend()
    if backend == "jnp":
        return False
    if backend == "auto" and not pallas_available():
        return False
    if x.dtype not in (jnp.float32,):
        return False
    hb = _effective_hb(w.filter_length, levels)
    if hb > 4:  # beyond 4 halo blocks the windows crowd scoped VMEM
        return False
    h, w_ = x.shape[-2], x.shape[-1]
    if h % (2 * _LANES) != 0 or w_ % (2 * _LANES) != 0 or levels < 1:
        return False
    # per-k DMA guards make any wtile legal; just need hb halo row-blocks
    return h // _LANES >= hb


def _effective_hb(filter_length: int, levels: int) -> int:
    """Halo blocks the deepest level actually needs: composite span when
    shallow, SINGLE-STAGE span (L0-1)*2^(J-1) when the deep levels take
    the cascade tier (see :func:`_cascade_start`) — roughly half the
    composite's, which is what extends db4 J=6 to hb=2 windows and sym8
    J=6 into eligibility at all (composite hb=8)."""
    span_comp = (filter_length - 1) * ((1 << levels) - 1)
    hb_comp = max(1, -(-span_comp // _LANES))
    if hb_comp < 3:
        return hb_comp
    span_single = (filter_length - 1) * (1 << (levels - 1))
    return max(1, -(-span_single // _LANES))


def _cascade_start(filter_length: int, levels: int) -> int:
    """First level served by the per-level cascade tier (levels whose
    COMPOSITE span needs hb >= 3 halo blocks; levels+1 = none).

    Deep composite windows are the J=6 penalty (VERDICT r04 #7: 172 ms vs
    46 at J=4 — 3.7x for 1.5x the levels): an hb=4 window holds 5x128
    rows x (wtile+4) blocks live per plane.  A single à trous stage on
    the PREVIOUS approximation spans only (L0-1)*2^(j-1) — half the
    composite reach — at the cost of one extra LL round trip through HBM
    (~0.6 ms at 8x2048x2048, immaterial next to the window cost)."""
    for j in range(1, levels + 1):
        span = (filter_length - 1) * ((1 << j) - 1)
        if -(-span // _LANES) >= 3:
            return j
    return levels + 1


def _up_taps(f, s: int) -> tuple:
    from .modwt_exact import _upsample_taps

    return _upsample_taps(f, s)


@functools.partial(
    jax.jit,
    static_argnames=("levels", "filters", "wtile", "periodic", "precision",
                     "interpret", "level_range"),
)
def _modwt2_analysis_call(
    x4: jnp.ndarray,  # [B, H, Wk, 128]
    *,
    levels: int,
    filters: tuple,  # ((dec_lo...), (dec_hi...)) scaled
    wtile: int,
    periodic: bool,
    precision: str,
    interpret: bool,
    level_range: tuple | None = None,  # (j_lo, j_hi) 1-based inclusive —
    # splitting the level set across calls keeps the revolving output
    # blocks + per-level temporaries inside Mosaic's 16 MB scoped VMEM at
    # wtile=4 (one 13-output call compiled to 18.4 MB and was rejected)
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    low = np.asarray(filters[0], np.float64)
    high = np.asarray(filters[1], np.float64)
    ds, as_ = composite_planes_split(low, high, levels)
    b, h, wk, _ = x4.shape
    num_t = h // _LANES
    num_s = wk // wtile
    grid = (b, num_t, num_s)
    dtype = x4.dtype

    j_lo, j_hi = level_range if level_range is not None else (1, levels)
    js = list(range(j_lo - 1, j_hi))  # 0-based level indices served
    # halo depth in 128-blocks for THIS call's deepest served level: spans
    # beyond one block ride as extra wrap/halo blocks per side (both axes)
    span = max(len(ds[j]) - 1 for j in js)
    hb = max(1, -(-span // _LANES))
    win_rows = (hb + 1) * _LANES  # hb halo row-blocks + one output row-block
    win_blocks = hb + wtile  # hb wrap/halo blocks + wtile output blocks
    # constants: per-level W band mats for (D_j, A_j) pairs; H left mats
    w_mats = {}  # per j: {e: [128, 256]}
    h_d_mats = {}  # per j: {E: [128, 128]}
    h_a_mats = {}
    for j in js:
        w_mats[j] = _w_band_mats([ds[j], as_[j]], -1)
        h_d_mats[j] = _h_band_mats(ds[j], -1)
        h_a_mats[j] = _h_band_mats(as_[j], -1)
    consts = []
    const_index = {}
    for j in js:
        for e, m in sorted(w_mats[j].items()):
            const_index[("w", j, e)] = len(consts)
            consts.append(jnp.asarray(m, jnp.float32))
        for tag, mats in (("hd", h_d_mats[j]), ("ha", h_a_mats[j])):
            for e, m in sorted(mats.items()):
                const_index[(tag, j, e)] = len(consts)
                consts.append(jnp.asarray(m, jnp.float32))
    with_ll = j_hi == levels
    n_out = 3 * len(js) + (1 if with_ll else 0)

    def kernel(x_hbm, *rest):
        c_refs = rest[: len(consts)]
        out_refs = rest[len(consts) : len(consts) + n_out]
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        s = pl.program_id(2)
        li = (bi * num_t + t) * num_s + s

        def window_dma(bi2, t2, s2, slot, phase):
            # main region: rows [hb*128:], blocks [hb:]; halo row regions
            # ri in [0, hb) hold rows row0 - (hb-ri)*128; wrap/halo blocks
            # k in [0, hb) hold blocks s2*wtile - hb + k (wtile >= hb so
            # every source is in-range whenever s2 != 0)
            row0 = t2 * _LANES

            def copy(dst_rows, dst_blocks, src_rows, src_blocks, sem_i):
                c = pltpu.make_async_copy(
                    x_hbm.at[bi2, src_rows, src_blocks, :],
                    scratch.at[slot, dst_rows, dst_blocks, :],
                    sems.at[slot, sem_i],
                )
                c.start() if phase == 0 else c.wait()

            for ri in range(hb + 1):  # ri == hb: the main row region
                sem0 = ri * (hb + 1)
                back = (hb - ri) * _LANES  # 0 for the main region
                dst_r = pl.ds(ri * _LANES, _LANES)

                def _region(src_r, ri=ri, sem0=sem0, dst_r=dst_r):
                    copy(dst_r, pl.ds(hb, wtile),
                         pl.ds(src_r, _LANES), pl.ds(s2 * wtile, wtile),
                         sem0)
                    for k in range(hb):
                        if periodic:
                            src_b = (s2 * wtile - hb + k) % wk
                            copy(dst_r, pl.ds(k, 1),
                                 pl.ds(src_r, _LANES), pl.ds(src_b, 1),
                                 sem0 + 1 + k)
                        else:
                            # valid iff s2*wtile - hb + k >= 0 (static
                            # threshold per k, so wtile < hb is fine)
                            thr = -(-(hb - k) // wtile)

                            def _bh(k=k, src_r=src_r, dst_r=dst_r,
                                    sem0=sem0):
                                copy(dst_r, pl.ds(k, 1),
                                     pl.ds(src_r, _LANES),
                                     pl.ds(s2 * wtile - hb + k, 1),
                                     sem0 + 1 + k)

                            pl.when(s2 >= thr)(_bh)
                            if phase == 0:
                                def _bzk(k=k, ri=ri):
                                    scratch[
                                        slot,
                                        ri * _LANES : (ri + 1) * _LANES,
                                        k : k + 1, :,
                                    ] = jnp.zeros((_LANES, 1, _LANES),
                                                  dtype)

                                pl.when(s2 < thr)(_bzk)

                def _rzero(ri=ri):
                    if phase == 0:
                        scratch[slot, ri * _LANES : (ri + 1) * _LANES,
                                :, :] = jnp.zeros(
                            (_LANES, win_blocks, _LANES), dtype
                        )

                if ri == hb:
                    _region(row0)
                elif periodic:
                    _region((row0 - back) % h)
                else:
                    pl.when(t2 >= hb - ri)(
                        functools.partial(_region, row0 - back)
                    )
                    pl.when(t2 < hb - ri)(_rzero)

        @pl.when(li == 0)
        def _prologue():
            window_dma(bi, t, s, 0, phase=0)

        window_dma(bi, t, s, li % 2, phase=1)

        total_steps = b * num_t * num_s
        if total_steps > 1:
            @pl.when(li + 1 < total_steps)
            def _prefetch():
                li1 = li + 1
                s1 = li1 % num_s
                t1 = (li1 // num_s) % num_t
                b1 = li1 // (num_s * num_t)
                window_dma(b1, t1, s1, li1 % 2, phase=0)

        win = scratch[li % 2]  # [win_rows, win_blocks, 128]
        oi = 0
        for j in js:
            # W pass, PER 128-row region: the flattened-axis shift is
            # row-local (cross-row leakage lands only in the discarded
            # halo blocks), and per-region views keep the rolled copies at
            # [128*win_blocks, 128] instead of window-sized — a whole-
            # window pass held #e window copies live and blew Mosaic's
            # 16 MB scoped budget at hb=4 (26 MB)
            dwr, awr = [], []
            for ri in range(hb + 1):
                flat_r = win[
                    ri * _LANES : (ri + 1) * _LANES
                ].reshape(_LANES * win_blocks, _LANES)
                acc = None
                for e in sorted(w_mats[j].keys()):
                    view = _shift_rows(flat_r, -e)  # e in {-hb..0}
                    term = _dot(view, c_refs[const_index[("w", j, e)]][:],
                                precision)
                    acc = term if acc is None else acc + term
                dwr.append(acc[:, :_LANES])
                awr.append(acc[:, _LANES:])

            def h_apply(regions, tag):
                # LEFT dots: out rows = last row-block (region hb); E in
                # {-hb..0}: out = sum_E L_E @ region[hb + E]
                mats = h_d_mats[j] if tag == "hd" else h_a_mats[j]
                out = None
                for e in sorted(mats.keys()):
                    blk = regions[hb + e].reshape(
                        _LANES, win_blocks * _LANES
                    )
                    term = _dot_left(
                        c_refs[const_index[(tag, j, e)]][:], blk, precision
                    )
                    out = term if out is None else out + term
                return out.reshape(_LANES, win_blocks, _LANES)[:, hb:, :]

            def _flat_out(v):
                # 3-D output blocks: Mosaic requires the last two block
                # dims divisible by (8, 128) — (wtile, 128) is not, so
                # outputs are [B, H, W] with block (1, 128, wtile*128)
                return v.astype(dtype).reshape(_LANES, wtile * _LANES)[None]

            lh = h_apply(dwr, "ha")
            hh = h_apply(dwr, "hd")
            hl = h_apply(awr, "hd")
            out_refs[oi][:] = _flat_out(lh)
            out_refs[oi + 1][:] = _flat_out(hl)
            out_refs[oi + 2][:] = _flat_out(hh)
            oi += 3
            if with_ll and j == levels - 1:
                ll = h_apply(awr, "ha")
                out_refs[oi][:] = _flat_out(ll)

    out_shape = [
        jax.ShapeDtypeStruct((b, h, wk * _LANES), dtype) for _ in range(n_out)
    ]
    out_specs = [
        pl.BlockSpec(
            (1, _LANES, wtile * _LANES),
            lambda bi, t, s: (bi, t, s),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_out)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, win_blocks, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, (hb + 1) * (hb + 1))),
        ],
        interpret=interpret,
    )(x4, *consts)
    return outs


def _dot_left(l_const, x, precision: str):
    """[128, 128] constant @ [128, N] operand with the kernel precision."""
    dims = (((1,), (0,)), ((), ()))
    kw = {"preferred_element_type": jnp.float32}
    if precision == "float32":
        return jax.lax.dot_general(
            l_const, x, dims, precision=jax.lax.Precision.HIGHEST, **kw
        )
    if precision == "bf16":
        return jax.lax.dot_general(
            l_const, x, dims, precision=jax.lax.Precision.DEFAULT, **kw
        )
    # bf16_3x
    l_hi = l_const.astype(jnp.bfloat16)
    l_lo = (l_const - l_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jax.lax.dot_general(l_hi, x_hi, dims, **kw)
        + jax.lax.dot_general(l_hi, x_lo, dims, **kw)
        + jax.lax.dot_general(l_lo, x_hi, dims, **kw)
    )


@functools.partial(
    jax.jit,
    static_argnames=("levels", "filters", "wtile", "periodic", "precision",
                     "interpret", "pairs_override"),
)
def _modwt2_synthesis_call(
    planes: tuple,  # 3*levels+1 arrays [B, H, Wk, 128]
    *,
    levels: int,
    filters: tuple,  # ((rec_lo...), (rec_hi...)) scaled
    wtile: int,
    periodic: bool,
    precision: str,
    interpret: bool,
    pairs_override: tuple | None = None,  # ((w_taps, h_taps), ...) dense
    # per-plane separable taps — bypasses the composed multi-level pyramid
    # (the symmetric per-level inverse folds its alignment offsets here)
):
    """Forward-read synthesis: each plane's separable (H~, W~) contribution
    accumulated in VMEM, one plane window DMA'd at a time (prefetched)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if pairs_override is not None:
        pairs = [
            (np.asarray(wt, np.float64), np.asarray(ht, np.float64))
            for wt, ht in pairs_override
        ]
        n_planes = len(pairs)
    else:
        low = np.asarray(filters[0], np.float64)
        high = np.asarray(filters[1], np.float64)
        ds, as_ = composite_planes_split(low, high, levels)
        n_planes = 3 * levels + 1
        # per-plane (W~ taps, H~ taps): [lh, hl, hh] per j + ll
        pairs = []
        for j in range(levels):
            pairs.append((ds[j], as_[j]))  # lh: D~ along W, A~ along H
            pairs.append((as_[j], ds[j]))  # hl
            pairs.append((ds[j], ds[j]))  # hh
        pairs.append((as_[levels - 1], as_[levels - 1]))  # ll
    b, h, wk, _ = planes[0].shape
    num_t = h // _LANES
    num_s = wk // wtile
    grid = (b, num_t, num_s)
    # forward reads: halo blocks to the RIGHT / BELOW, deep enough for the
    # widest plane's span (hb = ceil(span/128), mirroring the analysis call)
    span = max(
        max(len(wt) for wt, _ in pairs), max(len(ht) for _, ht in pairs)
    ) - 1
    hb = max(1, -(-span // _LANES))
    win_rows = (hb + 1) * _LANES  # main + hb below-halo row-blocks
    win_blocks = wtile + hb  # main + hb right wrap/halo blocks
    dtype = planes[0].dtype

    consts = []
    const_index = {}
    for pi, (w_taps, h_taps) in enumerate(pairs):
        for e, m in sorted(_w_band_mats([w_taps], +1).items()):
            const_index[("w", pi, e)] = len(consts)
            consts.append(jnp.asarray(m, jnp.float32))
        for e, m in sorted(_h_band_mats(h_taps, +1).items()):
            const_index[("h", pi, e)] = len(consts)
            consts.append(jnp.asarray(m, jnp.float32))

    def kernel(*refs):
        plane_hbm = refs[:n_planes]
        c_refs = refs[n_planes : n_planes + len(consts)]
        out_ref = refs[n_planes + len(consts)]
        scratch, sems = refs[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        s = pl.program_id(2)
        li = (bi * num_t + t) * num_s + s
        total_steps = b * num_t * num_s

        def window_dma(pi, bi2, t2, s2, slot, phase):
            row0 = t2 * _LANES
            src = plane_hbm[pi]

            def copy(dst_rows, dst_blocks, src_rows, src_blocks, sem_i):
                c = pltpu.make_async_copy(
                    src.at[bi2, src_rows, src_blocks, :],
                    scratch.at[slot, dst_rows, dst_blocks, :],
                    sems.at[slot, sem_i],
                )
                c.start() if phase == 0 else c.wait()

            # row regions ri in [0, hb]: ri == 0 is the main region (rows
            # row0), ri >= 1 holds rows row0 + ri*128; wrap/halo blocks
            # k in [0, hb) hold blocks s2*wtile + wtile + k (wtile >= hb so
            # every source is in-range whenever s2 != num_s - 1)
            for ri in range(hb + 1):
                sem0 = ri * (hb + 1)
                dst_r = pl.ds(ri * _LANES, _LANES)

                def _region(src_r, ri=ri, sem0=sem0, dst_r=dst_r):
                    copy(dst_r, pl.ds(0, wtile),
                         pl.ds(src_r, _LANES), pl.ds(s2 * wtile, wtile),
                         sem0)
                    for k in range(hb):
                        if periodic:
                            src_b = (s2 * wtile + wtile + k) % wk
                            copy(dst_r, pl.ds(wtile + k, 1),
                                 pl.ds(src_r, _LANES), pl.ds(src_b, 1),
                                 sem0 + 1 + k)
                        else:
                            # valid iff s2*wtile + wtile + k <= wk - 1
                            # (static threshold per k; wtile < hb is fine)
                            thr = (wk - 1 - wtile - k) // wtile

                            def _bh(k=k, src_r=src_r, dst_r=dst_r,
                                    sem0=sem0):
                                copy(dst_r, pl.ds(wtile + k, 1),
                                     pl.ds(src_r, _LANES),
                                     pl.ds(s2 * wtile + wtile + k, 1),
                                     sem0 + 1 + k)

                            pl.when(s2 <= thr)(_bh)
                            if phase == 0:
                                def _bzk(k=k, ri=ri):
                                    scratch[
                                        slot,
                                        ri * _LANES : (ri + 1) * _LANES,
                                        wtile + k : wtile + k + 1, :,
                                    ] = jnp.zeros((_LANES, 1, _LANES),
                                                  dtype)

                                pl.when(s2 > thr)(_bzk)

                def _rzero(ri=ri):
                    if phase == 0:
                        scratch[slot, ri * _LANES : (ri + 1) * _LANES,
                                :, :] = jnp.zeros(
                            (_LANES, win_blocks, _LANES), dtype
                        )

                if ri == 0:
                    _region(row0)
                elif periodic:
                    _region((row0 + ri * _LANES) % h)
                else:
                    pl.when(t2 < num_t - ri)(
                        functools.partial(_region, row0 + ri * _LANES)
                    )
                    pl.when(t2 >= num_t - ri)(_rzero)

        def seq_dma(pi, li2, slot, phase):
            """Plane ``pi`` (STATIC python int) of grid step ``li2``."""
            s2 = li2 % num_s
            t2 = (li2 // num_s) % num_t
            b2 = li2 // (num_s * num_t)
            window_dma(pi, b2, t2, s2, slot, phase)

        @pl.when(li == 0)
        def _prologue():
            seq_dma(0, li, 0, 0)

        acc = None
        for pi in range(n_planes):
            slot = (li * n_planes + pi) % 2
            seq_dma(pi, li, slot, 1)  # wait for this plane's window
            win = scratch[slot]

            # prefetch the next item in the (step, plane) sequence
            nslot = (li * n_planes + pi + 1) % 2
            if pi + 1 < n_planes:
                seq_dma(pi + 1, li, nslot, 0)
            else:
                @pl.when(li + 1 < total_steps)
                def _prefetch():
                    seq_dma(0, li + 1, nslot, 0)

            # H~ pass: output rows = top block; E in {0, 1}
            h_out = None
            for e in sorted(_h_band_mats(pairs[pi][1], +1).keys()):
                blk = win[e * _LANES : (e + 1) * _LANES].reshape(
                    _LANES, win_blocks * _LANES
                )
                term = _dot_left(
                    c_refs[const_index[("h", pi, e)]][:], blk, precision
                )
                h_out = term if h_out is None else h_out + term
            # W~ pass on [128, win_blocks, 128]: acc_block[k] = out[k-1],
            # valid at blocks [1 : wtile+1)
            flatw = h_out.reshape(_LANES * win_blocks, _LANES)
            w_acc = None
            w_mats = _w_band_mats([pairs[pi][0]], +1)
            e_max = max(w_mats.keys())
            for e in sorted(w_mats.keys()):
                view = _shift_rows(flatw, e_max - e)
                term = _dot(view, c_refs[const_index[("w", pi, e)]][:],
                            precision)
                w_acc = term if w_acc is None else w_acc + term
            contrib = w_acc.reshape(_LANES, win_blocks, _LANES)[
                :, e_max : e_max + wtile, :
            ]
            acc = contrib if acc is None else acc + contrib
        out_ref[:] = acc.astype(dtype).reshape(_LANES, wtile * _LANES)[None]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_planes
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts],
        out_specs=pl.BlockSpec(
            (1, _LANES, wtile * _LANES),
            lambda bi, t, s: (bi, t, s),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wk * _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, win_blocks, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, (hb + 1) * (hb + 1))),
        ],
        interpret=interpret,
    )(*planes, *consts)
    return out


def imodwt2_multilevel_pallas(details, approx, w, boundary: str,
                              precision: str, interpret: bool = False):
    """Inverse of :func:`modwt2_multilevel_pallas` (standard layout in/out)."""
    lead = approx.shape[:-2]
    h, w_ = approx.shape[-2], approx.shape[-1]
    levels = len(details)
    inv = 1.0 / np.sqrt(2.0)
    filters = (
        tuple((np.asarray(w.rec_lo, np.float64) * inv).tolist()),
        tuple((np.asarray(w.rec_hi, np.float64) * inv).tolist()),
    )
    planes = []
    for lh, hl, hh in details:
        planes.extend([lh, hl, hh])
    planes.append(approx)
    p4 = tuple(
        p.reshape((-1, h, w_ // _LANES, _LANES)) for p in planes
    )
    wk = w_ // _LANES
    periodic = boundary.lower().startswith("per")

    # synthesis holds ONE plane window + a single output block, so a wide
    # tile fits: fewer grid steps amortize the per-plane DMA sequencing.
    # Deep spans (hb > 1) shrink the tile to keep the window in budget.
    def _wtile_for(hb_call: int) -> int:
        if hb_call == 1:
            return 8 if wk % 8 == 0 else (
                4 if wk % 4 == 0 else (2 if wk % 2 == 0 else 1))
        return 4 if wk % 4 == 0 else 2

    # deep levels (composite hb >= 3) invert through the CASCADE tier,
    # coarsest first: one single-stage synthesis per level rebuilds the
    # previous LL with span (L0-1)*2^(j-1) — the analysis-side split
    # mirrored (see _cascade_start); then one composite call finishes the
    # shallow levels.
    casc = _cascade_start(w.filter_length, levels)
    cur = p4[3 * levels]  # ll_J
    for j in range(levels, casc - 1, -1):
        s = 1 << (j - 1)
        a_up = _up_taps(filters[0], s)
        d_up = _up_taps(filters[1], s)
        span_j = (w.filter_length - 1) * s
        hb_j = max(1, -(-span_j // _LANES))
        cur = _modwt2_synthesis_call(
            (p4[3 * (j - 1)], p4[3 * (j - 1) + 1], p4[3 * (j - 1) + 2], cur),
            levels=1,
            filters=filters,
            wtile=_wtile_for(hb_j),
            periodic=periodic,
            precision=precision,
            interpret=interpret,
            pairs_override=(
                (d_up, a_up),  # lh
                (a_up, d_up),  # hl
                (d_up, d_up),  # hh
                (a_up, a_up),  # ll
            ),
        ).reshape((-1, h, wk, _LANES))
    shallow = casc - 1
    if shallow >= 1:
        span = (w.filter_length - 1) * ((1 << shallow) - 1)
        hb = max(1, -(-span // _LANES))
        cur = _modwt2_synthesis_call(
            p4[: 3 * shallow] + (cur,),
            levels=shallow,
            filters=filters,
            wtile=_wtile_for(hb),
            periodic=periodic,
            precision=precision,
            interpret=interpret,
        )
    return cur.reshape(lead + (h, w_))


def modwt2_multilevel_pallas(x, w, levels: int, boundary: str,
                             precision: str, interpret: bool = False):
    """[..., H, W] -> (((lh, hl, hh) per level), ll_J), standard layout."""
    lead = x.shape[:-2]
    h, w_ = x.shape[-2], x.shape[-1]
    inv = 1.0 / np.sqrt(2.0)
    filters = (
        tuple((np.asarray(w.dec_lo, np.float64) * inv).tolist()),
        tuple((np.asarray(w.dec_hi, np.float64) * inv).tolist()),
    )
    x4 = x.reshape((-1, h, w_ // _LANES, _LANES))
    wk = w_ // _LANES
    periodic = boundary.lower().startswith("per")
    # split level sets across calls: one 13-output wtile=4 call overflowed
    # Mosaic's 16 MB scoped VMEM (18.4 MB), and each call sizes its window
    # by its OWN deepest span (hb halo blocks) — grouping levels with equal
    # hb keeps shallow levels on the 1-block window.  Levels whose
    # composite span would need hb >= 3 take the CASCADE tier instead: a
    # single à trous stage on the previous LL (half the reach, hb <= 2 for
    # db4 J=6; one extra LL HBM round trip per level) — see _cascade_start.
    casc = _cascade_start(w.filter_length, levels)
    shallow = casc - 1
    spans = [
        (w.filter_length - 1) * ((1 << j) - 1) for j in range(1, shallow + 1)
    ]
    hbs = [max(1, -(-s // _LANES)) for s in spans]
    ranges = []
    start = 1
    for j in range(2, shallow + 2):
        if j > shallow or hbs[j - 1] != hbs[start - 1] or j - start >= 3:
            ranges.append((start, j - 1))
            start = j

    def _wtile_for(hb_call: int) -> int:
        # wtile=4 normally (8 overflows scoped VMEM even with split level
        # groups); deep-halo calls (hb >= 3) shrink to 2 (a 1-level hb=4
        # wtile=4 call compiled to 21.2 MB scoped > 16)
        cap = 4 if hb_call <= 2 else 2
        return min(cap, 4 if wk % 4 == 0 else (2 if wk % 2 == 0 else 1))

    outs = []
    for rng_ in ranges:
        outs.extend(_modwt2_analysis_call(
            x4,
            levels=shallow,  # the last shallow call emits LL_shallow
            filters=filters,
            wtile=_wtile_for(hbs[rng_[1] - 1]),
            periodic=periodic,
            precision=precision,
            interpret=interpret,
            level_range=rng_,
        ))
    if casc <= levels:
        # LL_shallow (or x itself); call outputs are [B, H, W] — restore
        # the [B, H, Wk, 128] block layout for the next call's input
        cur = (
            outs.pop().reshape((-1, h, wk, _LANES)) if shallow >= 1 else x4
        )
        for j in range(casc, levels + 1):
            s = 1 << (j - 1)
            fil_j = (
                _up_taps(filters[0], s),
                _up_taps(filters[1], s),
            )
            span_j = (w.filter_length - 1) * s
            hb_j = max(1, -(-span_j // _LANES))
            lh, hl, hh, ll = _modwt2_analysis_call(
                cur,
                levels=1,
                filters=fil_j,
                wtile=_wtile_for(hb_j),
                periodic=periodic,
                precision=precision,
                interpret=interpret,
            )
            outs.extend([lh, hl, hh])
            cur = ll.reshape((-1, h, wk, _LANES))
        outs.append(cur.reshape((-1, h, w_)))
    outs = [o.reshape(lead + (h, w_)) for o in outs]
    details = tuple(
        (outs[3 * j], outs[3 * j + 1], outs[3 * j + 2])
        for j in range(levels)
    )
    return details, outs[3 * levels]
