"""Fused multi-level MODWT kernels, MXU (banded-matmul) formulation.

Round-2 rewrite of the hot cascade (reference hot loops:
``/root/reference/vectorwave-extensions/.../modwt/BatchSIMDMODWT.java:383-508``).
The round-1 kernel expressed each à trous tap as a ``pltpu.roll`` along the
lane axis — 8 taps x 6 levels x 2 directions of VPU lane shuffles, which
measured ~23% of the chip's *measured* HBM roofline.  This version maps the
filtering onto the MXU instead:

* The time axis is viewed as rows of 128 lanes: ``x[B, N] -> X[B*R, 128]``
  with ``X[r, i] = x[r*128 + i]`` (a free row-major reshape).
* The à trous convolution ``out[p] = sum_k f[k] x[p - s*k]`` becomes a BANDED
  MATMUL: ``out_rows[r] = sum_e X[r + e] @ M_e`` where ``e`` ranges over the
  few 128-row blocks the filter support spans and ``M_e[i', i] = sum_k f[k]
  [i' == (i - s*k) mod 128, e == floor((i - s*k)/128)]`` are host-precomputed
  constants.  Both filters share the shifted views: ``M_e`` is ``[128, 256]``
  (low | high columns), so one matmul per block offset yields approx AND
  detail.  Row shifts are cheap sublane rolls (<= a few per level) instead
  of 8+ lane shuffles per tap.
* The whole J-level cascade still runs on one VMEM-resident window per grid
  step (HBM traffic = read x + write J+1 planes), with the halo row-quantized
  per level: ``halo_rows = sum_j ceil((L0-1)*2^(j-1)/128)``.
* Synthesis reads FORWARD (``p + s*k``), which would need near-full-wrap
  negative row shifts; instead it runs in accumulated-shift coordinates
  (``out'[r] = out[r - e_max]`` per level) so every roll is a small positive
  sublane shift — structurally identical to analysis, final slice offset by
  ``halo_rows``.  (Large wrap rolls faulted the TPU worker on this runtime.)
* The grid tiles batch x time so VMEM stays within budget at any batch size
  without degenerate (sub-8-row) time tiles.

Precision: the MXU multiplies bf16; ``precision`` picks the f32-emulation
depth per dot (``float32`` = Precision.HIGHEST ~ f32-exact, ``bf16_3x`` =
a manual 3-pass split (~1e-5 relative), ``bf16`` = raw one-pass).
Accuracy/throughput measured on chip in tools/perf_probe_mxu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .modwt_pallas import _round_up

_LANES = 128

PRECISIONS = ("float32", "bf16_3x", "bf16")


def level_halo_rows(filter_length: int, level: int) -> int:
    """Row-quantized halo consumed by level j: ceil((L0-1)*2^(j-1) / 128)."""
    return -(-((filter_length - 1) * (1 << (level - 1))) // _LANES)


def halo_rows_total(filter_length: int, levels: int) -> int:
    return sum(level_halo_rows(filter_length, j) for j in range(1, levels + 1))


def _band_matrices(
    filt_low: np.ndarray,
    filt_high: np.ndarray,
    spacing: int,
    sign: int,
) -> dict[int, np.ndarray]:
    """Band blocks for ``out[p] = sum_k f[k] x[p + sign*s*k]`` on 128-lane rows.

    Returns {e: M_e[128, 256]} with out_rows[r] = sum_e X[r+e] @ M_e and the
    low/high filter outputs in columns [0:128) / [128:256).
    """
    n_taps = len(filt_low)
    blocks: dict[int, np.ndarray] = {}
    for k in range(n_taps):
        delta = sign * spacing * k
        for i in range(_LANES):
            src = i + delta
            e = src // _LANES  # floor division
            lane = src - e * _LANES
            m = blocks.setdefault(e, np.zeros((_LANES, 2 * _LANES), dtype=np.float64))
            m[lane, i] += filt_low[k]
            m[lane, _LANES + i] += filt_high[k]
    return blocks


def _cascade_bands(
    low: np.ndarray, high: np.ndarray, levels: int, sign: int
) -> list[dict[int, np.ndarray]]:
    return [
        _band_matrices(low, high, 1 << (j - 1), sign) for j in range(1, levels + 1)
    ]


def _shift_rows(flat, shift: int):
    """view[r] = flat[r - shift] for small positive sublane shifts (garbage
    wrap rows land in invalid halo rows only; see validity accounting)."""
    from jax.experimental.pallas import tpu as pltpu

    if shift == 0:
        return flat
    assert shift > 0
    return pltpu.roll(flat, shift, 0)


def _split_bf16(a):
    """Error-free f32 -> (hi, lo) bf16 split: hi + lo reproduces the top
    ~16 mantissa bits; products of bf16 pairs are exact in f32."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _const_terms(m: np.ndarray, precision: str) -> list[jnp.ndarray]:
    """Band-matrix constants in the form the kernel dots consume: a
    trace-time (hi, lo) bf16 pair for bf16_3x (hoisting the constant split
    out of every grid step), else one f32 array."""
    m32 = jnp.asarray(m, dtype=jnp.float32)
    if precision == "bf16_3x":
        return list(_split_bf16(m32))
    return [m32]


def _dot_prepped(a, m_refs, precision: str):
    """Dot of an f32 operand against prepped constants (list of refs).

    The ``a`` split happens here, after the sublane shift — Mosaic has no
    sub-32-bit rotate, so views must shift in f32 and split per group.
    """
    return _dot_parts(_prep_operand(a, precision), m_refs, precision)


def _prep_operand(a, precision: str):
    """Split/route an f32 operand once so it can feed several dots (the
    synthesis kernels reuse one plane window across band offsets — hoisting
    the bf16 split out of the per-offset loop removes a VPU pass per dot)."""
    if precision == "bf16_3x":
        return _split_bf16(a)
    return (a,)


def _dot_parts(parts, m_refs, precision: str):
    dims = (((1,), (0,)), ((), ()))
    kw = {"preferred_element_type": jnp.float32}
    if precision == "float32":
        return jax.lax.dot_general(
            parts[0], m_refs[0][:], dims,
            precision=jax.lax.Precision.HIGHEST, **kw
        )
    if precision == "bf16":
        return jax.lax.dot_general(
            parts[0], m_refs[0][:], dims,
            precision=jax.lax.Precision.DEFAULT, **kw
        )
    if precision == "bf16_3x":
        a_hi, a_lo = parts
        m_hi = m_refs[0][:]
        m_lo = m_refs[1][:]
        return (
            jax.lax.dot_general(a_hi, m_hi, dims, **kw)
            + jax.lax.dot_general(a_hi, m_lo, dims, **kw)
            + jax.lax.dot_general(a_lo, m_hi, dims, **kw)
        )
    raise ValueError(f"unknown precision {precision!r}; use one of {PRECISIONS}")


def _dot(a, m, precision: str):
    dims = (((1,), (0,)), ((), ()))
    if precision == "float32":
        return jax.lax.dot_general(
            a, m, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if precision == "bf16":
        return jax.lax.dot_general(
            a, m, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    if precision == "bf16_3x":
        # manual 3-pass split: a = hi + lo (16-bit effective mantissa);
        # drop the lo@lo term (~2^-24 relative)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m_hi = m.astype(jnp.bfloat16)
        m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = {"preferred_element_type": jnp.float32}
        return (
            jax.lax.dot_general(a_hi, m_hi, dims, **kw)
            + jax.lax.dot_general(a_hi, m_lo, dims, **kw)
            + jax.lax.dot_general(a_lo, m_hi, dims, **kw)
        )
    raise ValueError(f"unknown precision {precision!r}; use one of {PRECISIONS}")


#: experiment overrides (None = auto); see tools/perf_sweep_mxu.py
_FORCE_B_TILE: int | None = None
_FORCE_TILE_ROWS: int | None = None


def _auto_tiles(b: int, levels: int, halo_rows: int, n_rows: int,
                requested_rows: int, itemsize: int = 4,
                scratch_windows: int = 2) -> tuple[int, int]:
    """(batch_tile, row_tile): fit the VMEM budget by shrinking the batch
    tile first (then the row tile), keeping tiles 8-row aligned.

    ``scratch_windows``: input scratch slots held live at once — 2 for the
    double-buffered analysis (one window in compute, one in flight), and
    ``2 * (levels + 2)`` for synthesis (two slots of levels+1 planes each).

    When the TOTAL output of the call is small (< ~14 MB), XLA may place the
    result buffers themselves in VMEM (observed: S(1) layouts on the
    custom-call results), and they then count against the same 16 MB scoped
    limit as the kernel's own buffers — so that space is reserved out of the
    budget here.
    """
    budget = 10 * 1024 * 1024
    per_plane = b * n_rows * _LANES * itemsize
    total_out = (levels + 1) * per_plane
    if per_plane < 5 * 1024 * 1024:
        # XLA stashes small result buffers on the VMEM stack PER PLANE
        # (observed S(1) layouts up to ~4 MB each, even when the total is
        # large — a 10-plane 1M-sample analysis OOM'd the 16 MB scoped
        # limit), so reserve whenever planes are individually small.
        budget = max(2 * 1024 * 1024,
                     budget - min(total_out, 6 * 1024 * 1024))
    tile_rows = max(8, min(_round_up(requested_rows, 8), _round_up(n_rows, 8)))
    tile_rows = max(tile_rows, _round_up(halo_rows, 8))
    min_rows = max(8, _round_up(halo_rows, 8))
    # live VMEM per batch row: scratch slots + compute temporaries (J+1
    # accumulator planes and ~5 shifted views/partials) + output blocks
    work_units = scratch_windows + (levels + 1) + 5 + (levels + 1)

    def per_batch(tr):
        return (tr + halo_rows) * _LANES * work_units * itemsize

    while per_batch(tile_rows) > budget and tile_rows // 2 >= min_rows:
        tile_rows //= 2
        tile_rows = _round_up(tile_rows, 8)
    if _FORCE_TILE_ROWS is not None:
        tile_rows = _FORCE_TILE_ROWS
    b_tile = max(1, min(b, budget // per_batch(tile_rows)))
    if b_tile > 8:
        b_tile = (b_tile // 8) * 8  # sublane-friendly batch tiles
    while b % b_tile != 0:  # keep the batch grid exact
        b_tile -= 1
    if _FORCE_B_TILE is not None:
        b_tile = _FORCE_B_TILE
    return b_tile, tile_rows


def _to_rows(x2d: jnp.ndarray) -> jnp.ndarray:
    b, n = x2d.shape
    return x2d.reshape(b, n // _LANES, _LANES)


def _from_rows(x3d: jnp.ndarray) -> jnp.ndarray:
    b, r, _ = x3d.shape
    return x3d.reshape(b, r * _LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "filters", "b_tile", "tile_rows", "halo_rows", "precision",
        "interpret", "symmetric",
    ),
)
def _mxu_analysis_call(
    x: jnp.ndarray,  # [B, R_total, 128], left halo_rows prepended
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    b_tile: int,
    tile_rows: int,
    halo_rows: int,
    precision: str,
    interpret: bool,
    symmetric: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    low = np.asarray(filters[0], dtype=np.float64)
    high = np.asarray(filters[1], dtype=np.float64)
    bands = _cascade_bands(low, high, levels, sign=-1)
    b, r_total, _ = x.shape
    r_out = r_total - halo_rows
    window_rows = tile_rows + halo_rows
    grid = (b // b_tile, r_out // tile_rows)
    dtype = x.dtype

    band_consts = [
        jnp.asarray(
            np.stack([m for _, m in sorted(bands[j - 1].items())]),
            dtype=jnp.float32,
        )
        for j in range(1, levels + 1)
    ]
    if symmetric:  # lane anti-identity for the edge mirror (no rev in Mosaic)
        band_consts = band_consts + [
            jnp.asarray(np.eye(_LANES, dtype=np.float32)[::-1].copy())
        ]
    n_band_inputs = len(band_consts)
    # analysis offsets e are <= 0; shift = -e is a small positive roll
    band_shifts = [[-e for e in sorted(bands[j - 1].keys())] for j in range(1, levels + 1)]

    def kernel(x_hbm, *rest):
        band_refs = rest[:levels]
        out_refs = rest[n_band_inputs : n_band_inputs + levels + 1]
        j_lane_ref = rest[n_band_inputs - 1] if symmetric else None
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        copy = pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(bi * b_tile, b_tile), pl.ds(t * tile_rows, window_rows), :
            ],
            scratch,
            sems.at[0],
        )
        copy.start()
        copy.wait()
        cur = scratch[:].reshape(b_tile * window_rows, _LANES)
        for level in range(1, levels + 1):
            if symmetric:
                # Per-level half-point mirror at the signal start (tile 0):
                # the evolving approximation's own head is reflected into the
                # halo slab before each level's convolution — the reference's
                # symmetric cascade semantics (mirror-ext of the CURRENT
                # level input, not of x; BatchStreamingMODWT.java:74-95).
                # Mosaic has no `rev` lowering, so the reversal is a lane
                # anti-identity matmul + per-row re-stack of the tiny slab.
                cur3 = cur.reshape(b_tile, window_rows, _LANES)
                slab = cur3[:, halo_rows : 2 * halo_rows, :]
                ls = (
                    jax.lax.dot_general(
                        slab.reshape(b_tile * halo_rows, _LANES),
                        j_lane_ref[:],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    .astype(dtype)
                    .reshape(b_tile, halo_rows, _LANES)
                )
                head = jnp.concatenate(
                    [ls[:, i : i + 1, :] for i in range(halo_rows - 1, -1, -1)],
                    axis=1,
                )
                is_edge = pl.program_id(1) == 0
                head_sel = jnp.where(is_edge, head, cur3[:, :halo_rows, :])
                cur = jnp.concatenate(
                    [head_sel, cur3[:, halo_rows:, :]], axis=1
                ).reshape(b_tile * window_rows, _LANES)
            acc = None
            for idx_e, shift in enumerate(band_shifts[level - 1]):
                view = _shift_rows(cur, shift)
                term = _dot(view, band_refs[level - 1][idx_e], precision)
                acc = term if acc is None else acc + term
            approx = acc[:, :_LANES].astype(dtype)
            detail = acc[:, _LANES:].astype(dtype)
            out_refs[level - 1][:] = detail.reshape(b_tile, window_rows, _LANES)[
                :, halo_rows:, :
            ]
            cur = approx
        out_refs[levels][:] = cur.reshape(b_tile, window_rows, _LANES)[:, halo_rows:, :]

    out_shape = [
        jax.ShapeDtypeStruct((b, r_out, _LANES), dtype) for _ in range(levels + 1)
    ]
    out_specs = [
        pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(levels + 1)
    ]
    n_dots = sum(len(s) for s in band_shifts)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_band_inputs)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_dots * b * r_out * _LANES * _LANES,
            bytes_accessed=b * r_out * _LANES * (levels + 2) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *band_consts)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "filters", "b_tile", "tile_rows", "halo_rows", "precision",
        "interpret",
    ),
)
def _mxu_synthesis_call(
    coeffs: tuple[jnp.ndarray, ...],  # each [B, R_total, 128], right halo appended
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    b_tile: int,
    tile_rows: int,
    halo_rows: int,
    precision: str,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    low = np.asarray(filters[0], dtype=np.float64)
    high = np.asarray(filters[1], dtype=np.float64)
    bands = _cascade_bands(low, high, levels, sign=+1)
    n_coeffs = levels + 1
    b, r_total, _ = coeffs[0].shape
    r_out = r_total - halo_rows
    window_rows = tile_rows + halo_rows
    grid = (b // b_tile, r_out // tile_rows)
    dtype = coeffs[0].dtype

    band_consts = [
        jnp.asarray(
            np.stack([m for _, m in sorted(bands[j - 1].items())]),
            dtype=jnp.float32,
        )
        for j in range(1, levels + 1)
    ]
    band_offsets = [sorted(bands[j - 1].keys()) for j in range(1, levels + 1)]
    e_maxes = [offs[-1] for offs in band_offsets]

    def kernel(*refs):
        coeff_hbm = refs[:n_coeffs]
        band_refs = refs[n_coeffs : n_coeffs + levels]
        out_ref = refs[n_coeffs + levels]
        scratch, sems = refs[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        copies = [
            pltpu.make_async_copy(
                coeff_hbm[i].at[
                    pl.ds(bi * b_tile, b_tile),
                    pl.ds(t * tile_rows, window_rows),
                    :,
                ],
                scratch.at[i],
                sems.at[i],
            )
            for i in range(n_coeffs)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        # accumulated-shift coordinates: after processing level j the value
        # rows satisfy cur[r] = true[r - cum]; every roll is small positive.
        cur = scratch[levels].reshape(b_tile * window_rows, _LANES)
        cum = 0
        for level in range(levels, 0, -1):
            detail = scratch[level - 1].reshape(b_tile * window_rows, _LANES)
            offsets = band_offsets[level - 1]
            e_max = e_maxes[level - 1]
            acc = None
            for idx_e, e in enumerate(offsets):
                m = band_refs[level - 1][idx_e]
                va = _shift_rows(cur, e_max - e)
                vd = _shift_rows(detail, cum + e_max - e)
                term = _dot(va, m[:, :_LANES], precision) + _dot(
                    vd, m[:, _LANES:], precision
                )
                acc = term if acc is None else acc + term
            cur = acc.astype(dtype)
            cum += e_max
        # align the accumulated shift to the (8-rounded) halo so the final
        # slice offset is sublane-aligned: true rows [0, tile) = [halo_rows:)
        cur = _shift_rows(cur, halo_rows - cum)
        out_ref[:] = cur.reshape(b_tile, window_rows, _LANES)[:, halo_rows:, :]

    n_dots = 2 * sum(len(o) for o in band_offsets)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_coeffs
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(levels)],
        out_specs=pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_out, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((n_coeffs, b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((n_coeffs,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_dots * b * r_out * _LANES * _LANES,
            bytes_accessed=b * r_out * _LANES * (n_coeffs + 1) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*coeffs, *band_consts)
    return out


def run_analysis_mxu(x, levels, filters, periodic, tile, precision, interpret,
                     symmetric=False):
    """[B, N] analysis through the cascade banded-matmul kernel; arbitrary N.

    ``symmetric=True`` (with ``periodic=False``): per-level half-point mirror
    of the evolving approximation at the signal start, matching the jnp
    symmetric cascade exactly.  The composite kernel cannot serve this mode
    (a per-level mirror is not a filter composition), so symmetric analysis
    keeps the cascade formulation.
    """
    b, n = x.shape
    filter_length = len(filters[0])
    # multiple of 8 so window reshapes and halo-offset slices stay
    # sublane-aligned (misaligned layouts faulted this TPU runtime)
    halo_rows = _round_up(max(halo_rows_total(filter_length, levels), 1), 8)
    halo_pad = halo_rows * _LANES
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, -(-n // _LANES), max(1, tile // _LANES),
        x.dtype.itemsize,
    )
    n_pad = _round_up(n, tile_rows * _LANES)
    if periodic:
        reps = -(-halo_pad // n)
        left = jnp.concatenate([x] * reps, axis=-1)[..., -halo_pad:]
    else:
        left = jnp.zeros((b, halo_pad), dtype=x.dtype)
    pieces = [left, x]
    if n_pad != n:
        pieces.append(jnp.zeros((b, n_pad - n), dtype=x.dtype))
    x_ext = _to_rows(jnp.concatenate(pieces, axis=-1))
    outs = _mxu_analysis_call(
        x_ext,
        levels=levels,
        filters=filters,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
        symmetric=symmetric,
    )
    outs = tuple(_from_rows(o)[..., :n] for o in outs)
    return outs


def run_synthesis_mxu(coeff_planes, levels, filters, periodic, tile, precision,
                      interpret):
    """Tuple of [B, N] planes -> reconstructed [B, N]; arbitrary N."""
    b, n = coeff_planes[0].shape
    filter_length = len(filters[0])
    halo_rows = _round_up(max(halo_rows_total(filter_length, levels), 1), 8)
    halo_pad = halo_rows * _LANES
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, -(-n // _LANES), max(1, tile // _LANES),
        coeff_planes[0].dtype.itemsize,
    )
    n_pad = _round_up(n, tile_rows * _LANES)

    def extend(plane):
        if periodic:
            reps = -(-halo_pad // n)
            right = jnp.concatenate([plane] * reps, axis=-1)[..., :halo_pad]
        else:
            right = jnp.zeros((b, halo_pad), dtype=plane.dtype)
        pieces = [plane, right]
        if n_pad != n:
            pieces.append(jnp.zeros((b, n_pad - n), dtype=plane.dtype))
        return _to_rows(jnp.concatenate(pieces, axis=-1))

    out = _mxu_synthesis_call(
        tuple(extend(p) for p in coeff_planes),
        levels=levels,
        filters=filters,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
    )
    return _from_rows(out)[..., :n]


# ---------------------------------------------------------------------------
# Composite-filter formulation (v3): every output plane computed DIRECTLY
# from x with a precomposed à trous filter, so there is no inter-level
# dependency to serialize the MXU — the whole analysis is ~5 wide
# independent banded matmuls (grouped by row-block offset), and synthesis is
# ~5 deep-contraction matmuls over the lane-concatenated planes.  Exact for
# periodic/zero (composition of linear/circular convolutions); symmetric
# stays on the cascade (per-level mirror is not a composition).
# FLOPs/sample also drop ~20% vs the cascade (shared block offsets).
# ---------------------------------------------------------------------------


def _upsample_filter(f: np.ndarray, s: int) -> np.ndarray:
    if s == 1:
        return np.asarray(f, dtype=np.float64)
    out = np.zeros((len(f) - 1) * s + 1, dtype=np.float64)
    out[::s] = f
    return out


def composite_plane_filters(
    low: np.ndarray, high: np.ndarray, levels: int
) -> list[np.ndarray]:
    """Causal composite filters [d1, ..., dJ, aJ]: d_j = g_j * h_{j-1} * ...
    * h_1 (à trous upsampled, np.convolve composition).  Inputs are the
    per-stage-scaled base filters, so the 2^{-j/2} scaling composes in."""
    comps = []
    acc = np.array([1.0])
    for j in range(1, levels + 1):
        s = 1 << (j - 1)
        comps.append(np.convolve(acc, _upsample_filter(high, s)))
        acc = np.convolve(acc, _upsample_filter(low, s))
    comps.append(acc)
    return comps


def composite_macs_per_sample(
    filters: tuple, levels: int
) -> dict[str, int]:
    """Exact MXU MACs per input sample for the composite kernels.

    Each band block is one [128, 128] matmul serving 128 output samples, so a
    direction with B total band blocks costs ``B * 128`` MACs/sample.  Used by
    bench.py to report MXU utilization: at the default 3-pass ``bf16_3x``
    precision the round trip is COMPUTE-bound on the MXU (the dot count, not
    HBM traffic, sets the throughput ceiling), which is why the single-pass
    ``bf16`` mode — same bytes, one third the dots — reaches the memory
    roofline while the default cannot.
    """
    low = np.asarray(filters[0], dtype=np.float64)
    high = np.asarray(filters[1], dtype=np.float64)
    planes = composite_plane_filters(low, high, levels)
    ana = sum(len(_band_single(p, -1)) for p in planes)
    syn = sum(len(_band_single(p, +1)) for p in planes)
    return {"analysis": ana * _LANES, "synthesis": syn * _LANES}


def _band_single(filt: np.ndarray, sign: int) -> dict[int, np.ndarray]:
    """{e: M_e[128, 128]} for out_rows[r] = sum_e X[r+e] @ M_e of
    ``out[p] = sum_tau f[tau] x[p + sign*tau]``."""
    blocks: dict[int, np.ndarray] = {}
    for tau, val in enumerate(np.asarray(filt, dtype=np.float64)):
        if val == 0.0:
            continue
        delta = sign * tau
        for i in range(_LANES):
            src = i + delta
            e = src // _LANES
            lane = src - e * _LANES
            m = blocks.setdefault(e, np.zeros((_LANES, _LANES), dtype=np.float64))
            m[lane, i] += val
    return blocks


def _resolve_planes(filters, levels: int, planes_override) -> list[np.ndarray]:
    """Composite per-plane filters: the standard cascade composition, or a
    caller-supplied tuple of dense tap tuples (the symmetric tier's
    alignment-composed two-sided filters, rebased to non-negative taps)."""
    if planes_override is not None:
        return [np.asarray(p, dtype=np.float64) for p in planes_override]
    low = np.asarray(filters[0], dtype=np.float64)
    high = np.asarray(filters[1], dtype=np.float64)
    return composite_plane_filters(low, high, levels)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "filters", "b_tile", "tile_rows", "halo_rows", "precision",
        "interpret", "edge", "inline_halo", "planes_override", "head_samples",
    ),
)
def _composite_analysis_call(
    x: jnp.ndarray,  # [B, R, 128]; halo prepended unless inline_halo
    halo: jnp.ndarray | None = None,  # [B, halo_rows, 128] when edge="external"
    head: jnp.ndarray | None = None,  # [n_planes, B, hr8, 128] head override
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    b_tile: int,
    tile_rows: int,
    halo_rows: int,
    precision: str,
    interpret: bool,
    edge: str = "wrap",
    inline_halo: bool = False,
    planes_override: tuple = None,
    head_samples: int = 0,
):
    """Composite analysis kernel (double-buffered DMA pipeline).

    ``inline_halo=True`` (N a tile multiple): ``x`` carries NO halo; edge
    tiles fetch the left boundary inside the kernel — ``edge`` picks the
    periodic wrap ("wrap"), a zero fill ("zero") or a caller-provided halo
    slab ("external": the distributed tier's ppermute output) — so the
    wrapper never materializes an extended copy of the input (the extend
    path measured as ~2.4 ms of pure XLA copies per roundtrip at the bench
    shape, over half the end-to-end time).

    Pipelining: the input window for grid step t+1 is DMA'd into the other
    scratch slot while step t's dot chain runs, so the HBM fetch overlaps
    MXU compute (the output write-back is pipelined by Pallas' revolving
    output buffers already).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes = _resolve_planes(filters, levels, planes_override)
    n_planes = len(planes)  # levels + 1
    plane_bands = [_band_single(p, sign=-1) for p in planes]
    all_e = sorted({e for pb in plane_bands for e in pb}, reverse=True)  # 0, -1, ...
    groups = []  # (shift, members, M_e concat)
    for e in all_e:
        members = [pi for pi in range(n_planes) if e in plane_bands[pi]]
        m_cat = np.concatenate([plane_bands[pi][e] for pi in members], axis=1)
        groups.append((-e, members, m_cat))

    b, r_total, _ = x.shape
    r_out = r_total if inline_halo else r_total - halo_rows
    window_rows = tile_rows + halo_rows
    num_t = r_out // tile_rows
    grid = (b // b_tile, num_t)
    total_steps = (b // b_tile) * num_t
    dtype = x.dtype
    group_consts: list[jnp.ndarray] = []
    for _, _, m in groups:
        group_consts.extend(_const_terms(m, precision))
    cpg = len(group_consts) // len(groups)  # const terms per group
    external = edge == "external"
    halo_inputs = (halo,) if external else ()
    # head_samples > 0: the first head_samples output samples of every plane
    # are replaced (t == 0 tiles) by the supplied ``head`` slab — the
    # symmetric tier's edge splice done IN-KERNEL, so no full-plane
    # concatenate copies on the output (round-3 symmetric lost ~2x to them)
    head_inputs = (head,) if head_samples else ()
    hr8 = head.shape[2] if head_samples else 0

    def kernel(x_hbm, *rest):
        halo_hbm = rest[0] if external else None
        rest = rest[1:] if external else rest
        head_ref = rest[0] if head_samples else None
        rest = rest[1:] if head_samples else rest
        g_refs = rest[: len(group_consts)]
        out_refs = rest[len(group_consts) : len(group_consts) + n_planes]
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        li = bi * num_t + t

        def window_dma(bi2, t2, slot, phase):
            """Issue (phase=0) or await (phase=1) the copies filling
            ``scratch[slot]`` with grid step (bi2, t2)'s input window."""
            bs2 = pl.ds(bi2 * b_tile, b_tile)
            if inline_halo:
                def _interior():
                    c = pltpu.make_async_copy(
                        x_hbm.at[
                            bs2,
                            pl.ds(t2 * tile_rows - halo_rows, window_rows),
                            :,
                        ],
                        scratch.at[slot],
                        sems.at[slot, 0],
                    )
                    c.start() if phase == 0 else c.wait()

                def _edge():
                    main = pltpu.make_async_copy(
                        x_hbm.at[bs2, pl.ds(0, tile_rows), :],
                        scratch.at[slot, :, pl.ds(halo_rows, tile_rows), :],
                        sems.at[slot, 0],
                    )
                    main.start() if phase == 0 else main.wait()
                    if edge == "wrap":
                        second = pltpu.make_async_copy(
                            x_hbm.at[bs2, pl.ds(r_out - halo_rows, halo_rows), :],
                            scratch.at[slot, :, pl.ds(0, halo_rows), :],
                            sems.at[slot, 1],
                        )
                        second.start() if phase == 0 else second.wait()
                    elif edge == "external":
                        second = pltpu.make_async_copy(
                            halo_hbm.at[bs2],
                            scratch.at[slot, :, pl.ds(0, halo_rows), :],
                            sems.at[slot, 1],
                        )
                        second.start() if phase == 0 else second.wait()
                    elif phase == 0:  # zero fill (compute-stream store)
                        scratch[slot, :, :halo_rows, :] = jnp.zeros(
                            (b_tile, halo_rows, _LANES), dtype
                        )

                if num_t > 1:  # single-tile grids have no interior (pl.when
                    # traces both branches, and the interior window would
                    # exceed the operand shape)
                    pl.when(t2 != 0)(_interior)
                    pl.when(t2 == 0)(_edge)
                else:
                    _edge()
            else:
                c = pltpu.make_async_copy(
                    x_hbm.at[bs2, pl.ds(t2 * tile_rows, window_rows), :],
                    scratch.at[slot],
                    sems.at[slot, 0],
                )
                c.start() if phase == 0 else c.wait()

        @pl.when(li == 0)
        def _prologue():
            window_dma(bi, t, 0, phase=0)

        window_dma(bi, t, li % 2, phase=1)

        if total_steps > 1:
            @pl.when(li + 1 < total_steps)
            def _prefetch():
                li1 = li + 1
                window_dma(li1 // num_t, li1 % num_t, li1 % 2, phase=0)

        flat = scratch[li % 2].reshape(b_tile * window_rows, _LANES)
        accs = [None] * n_planes
        for gi, (shift, members, _) in enumerate(groups):
            view = _shift_rows(flat, shift)
            out = _dot_prepped(view, g_refs[gi * cpg : (gi + 1) * cpg], precision)
            for slot, pi in enumerate(members):
                piece = out[:, slot * _LANES : (slot + 1) * _LANES]
                accs[pi] = piece if accs[pi] is None else accs[pi] + piece
        if head_samples:
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (hr8, _LANES), 0) * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (hr8, _LANES), 1)
            )
            splice = jnp.logical_and(t == 0, pos < head_samples)[None]
        for pi in range(n_planes):
            out3 = accs[pi].astype(dtype).reshape(b_tile, window_rows, _LANES)[
                :, halo_rows:, :
            ]
            if head_samples:
                blend = jnp.where(splice, head_ref[pi], out3[:, :hr8, :])
                out3 = jnp.concatenate([blend, out3[:, hr8:, :]], axis=1)
            out_refs[pi][:] = out3

    out_shape = [
        jax.ShapeDtypeStruct((b, r_out, _LANES), dtype) for _ in range(n_planes)
    ]
    out_specs = [
        pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_planes)
    ]
    macs = sum(m.shape[1] for _, _, m in groups) * _LANES
    head_specs = (
        [
            pl.BlockSpec(
                (n_planes, b_tile, hr8, _LANES),
                lambda bi, t: (0, bi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        if head_samples
        else []
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + len(halo_inputs))
        + head_specs
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(group_consts))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs * b * r_out,
            bytes_accessed=b * r_out * _LANES * (n_planes + 1) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *halo_inputs, *head_inputs, *group_consts)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "filters", "b_tile", "tile_rows", "halo_rows", "precision",
        "interpret", "edge", "inline_halo", "planes_override",
    ),
)
def _composite_synthesis_call(
    coeffs: tuple[jnp.ndarray, ...],  # each [B, R, 128]; right halo unless inline
    halo: jnp.ndarray | None = None,  # [n_planes, B, halo_rows, 128] external
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    b_tile: int,
    tile_rows: int,
    halo_rows: int,
    precision: str,
    interpret: bool,
    edge: str = "wrap",
    inline_halo: bool = False,
    planes_override: tuple = None,
):
    """Composite synthesis kernel (double-buffered DMA pipeline).

    Synthesis reads ``levels + 1`` coefficient planes per output plane, so its
    input traffic dominates; the double-buffered scratch (step t+1's plane
    windows DMA'd during step t's dot chain) matters even more than on the
    analysis side.  ``edge`` handles the RIGHT boundary of the last tile:
    periodic wrap, zero fill, or an external halo slab (distributed tier).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes = _resolve_planes(filters, levels, planes_override)
    n_planes = len(planes)
    plane_bands = [_band_single(p, sign=+1) for p in planes]
    all_e = sorted({e for pb in plane_bands for e in pb})  # 0, 1, 2, ...
    e_max = all_e[-1]
    # per-(offset, plane) matrices: the kernel dots each plane window
    # directly (operand split hoisted per plane) and rolls the f32 PARTIAL
    # SUM once per offset — roll and contraction commute, and this removes
    # the per-(offset, plane) view rolls + lane-concats that made the
    # kernel's fixed (precision-independent) VPU cost ~18% of its runtime
    groups = []  # (shift, members, [M_e per member])
    for e in all_e:
        members = [pi for pi in range(n_planes) if e in plane_bands[pi]]
        groups.append((e_max - e, members,
                       [plane_bands[pi][e] for pi in members]))

    b, r_total, _ = coeffs[0].shape
    r_out = r_total if inline_halo else r_total - halo_rows
    window_rows = tile_rows + halo_rows
    num_t = r_out // tile_rows
    grid = (b // b_tile, num_t)
    total_steps = (b // b_tile) * num_t
    dtype = coeffs[0].dtype
    group_consts: list[jnp.ndarray] = []
    n_mats = 0
    for _, _, ms in groups:
        for m in ms:
            group_consts.extend(_const_terms(m, precision))
            n_mats += 1
    cpg = len(group_consts) // n_mats
    external = edge == "external"
    halo_inputs = (halo,) if external else ()

    def kernel(*refs):
        coeff_hbm = refs[:n_planes]
        halo_hbm = refs[n_planes] if external else None
        off = n_planes + len(halo_inputs)
        g_refs = refs[off : off + len(group_consts)]
        out_ref = refs[off + len(group_consts)]
        scratch, sems = refs[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        li = bi * num_t + t

        def window_dma(bi2, t2, slot, phase):
            bs2 = pl.ds(bi2 * b_tile, b_tile)
            if inline_halo:
                def _interior():
                    cs = [
                        pltpu.make_async_copy(
                            coeff_hbm[i].at[
                                bs2, pl.ds(t2 * tile_rows, window_rows), :
                            ],
                            scratch.at[slot, i],
                            sems.at[slot, i],
                        )
                        for i in range(n_planes)
                    ]
                    for c in cs:
                        c.start() if phase == 0 else c.wait()

                def _edge():
                    mains = [
                        pltpu.make_async_copy(
                            coeff_hbm[i].at[
                                bs2, pl.ds(t2 * tile_rows, tile_rows), :
                            ],
                            scratch.at[slot, i, :, pl.ds(0, tile_rows), :],
                            sems.at[slot, i],
                        )
                        for i in range(n_planes)
                    ]
                    for c in mains:
                        c.start() if phase == 0 else c.wait()
                    if edge == "wrap":
                        seconds = [
                            pltpu.make_async_copy(
                                coeff_hbm[i].at[bs2, pl.ds(0, halo_rows), :],
                                scratch.at[
                                    slot, i, :, pl.ds(tile_rows, halo_rows), :
                                ],
                                sems.at[slot, n_planes + i],
                            )
                            for i in range(n_planes)
                        ]
                        for c in seconds:
                            c.start() if phase == 0 else c.wait()
                    elif edge == "external":
                        seconds = [
                            pltpu.make_async_copy(
                                halo_hbm.at[i, bs2],
                                scratch.at[
                                    slot, i, :, pl.ds(tile_rows, halo_rows), :
                                ],
                                sems.at[slot, n_planes + i],
                            )
                            for i in range(n_planes)
                        ]
                        for c in seconds:
                            c.start() if phase == 0 else c.wait()
                    elif phase == 0:  # zero fill (compute-stream store)
                        scratch[slot, :, :, tile_rows:, :] = jnp.zeros(
                            (n_planes, b_tile, halo_rows, _LANES), dtype
                        )

                if num_t > 1:  # see analysis kernel: avoid tracing an
                    # over-sized interior window on single-tile grids
                    pl.when(t2 != num_t - 1)(_interior)
                    pl.when(t2 == num_t - 1)(_edge)
                else:
                    _edge()
            else:
                cs = [
                    pltpu.make_async_copy(
                        coeff_hbm[i].at[
                            bs2, pl.ds(t2 * tile_rows, window_rows), :
                        ],
                        scratch.at[slot, i],
                        sems.at[slot, i],
                    )
                    for i in range(n_planes)
                ]
                for c in cs:
                    c.start() if phase == 0 else c.wait()

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
        parts = [_prep_operand(f, precision) for f in flats]
        # accumulated-shift coords: out'[r] = out[r - e_max]; all shifts >= 0
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
            s = _shift_rows(s, shift)  # roll the f32 partial AFTER the dots
            acc = s if acc is None else acc + s
        acc = _shift_rows(acc.astype(dtype), halo_rows - e_max)
        out_ref[:] = acc.reshape(b_tile, window_rows, _LANES)[:, halo_rows:, :]

    macs = sum(len(ms) for _, _, ms in groups) * _LANES * _LANES
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        * (n_planes + len(halo_inputs))
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(group_consts))],
        out_specs=pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_out, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n_planes, b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, 2 * n_planes)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs * b * r_out,
            bytes_accessed=b * r_out * _LANES * (n_planes + 1) * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*coeffs, *halo_inputs, *group_consts)
    return out


def composite_halo_samples(filter_length: int, levels: int) -> int:
    """Cumulative composite-filter support: (L0-1)(2^J - 1) samples."""
    return (filter_length - 1) * ((1 << levels) - 1)


def _composite_halo_rows(filter_length: int, levels: int) -> int:
    span = composite_halo_samples(filter_length, levels)
    return _round_up(max(-(-span // _LANES), 1), 8)


def _pad_halo_rows(halo, halo_pad: int, side: str):
    """[B, H] neighbor samples -> [B, halo_rows, 128] slab (zero-fill the
    unreachable far side of the row-quantized halo)."""
    b, h = halo.shape
    if h < halo_pad:
        z = jnp.zeros((b, halo_pad - h), dtype=halo.dtype)
        halo = jnp.concatenate([z, halo] if side == "left" else [halo, z],
                               axis=-1)
    elif h > halo_pad:
        halo = halo[..., -halo_pad:] if side == "left" else halo[..., :halo_pad]
    return _to_rows(halo)


def run_analysis_composite(x, levels, filters, periodic, tile, precision,
                           interpret, halo=None, head_splice=None,
                           planes_override=None):
    """[B, N] composite-filter analysis; arbitrary N; periodic/zero.

    When N is a whole number of row tiles the kernel fetches its own halos
    (edge-tile wrap DMAs) and NO extended copy of x is built — the extend
    path costs more than the kernel itself at bench shapes.

    ``halo``: optional [B, >=span] LEFT-neighbor samples (the distributed
    tier's ppermute output; samples just left of ``x[..., 0]``).  Overrides
    ``periodic`` — the boundary is the neighbor's data, zero beyond it.

    ``head_splice``: optional ``(slab, span)`` — ``slab`` is
    ``[levels+1, B, hr8, 128]`` precomputed plane values whose first
    ``span`` samples overwrite every plane's head in-kernel (the symmetric
    tier's edge splice; ``hr8`` must not exceed the row tile).

    ``planes_override``: optional tuple of dense causal tap tuples served
    DIRECTLY as the per-plane filters (one output plane per entry; the
    packet/DTCWT tier's single-stage à trous pairs).  ``levels`` must be
    ``len(planes_override) - 1`` so tiling/cost accounting stays right.
    """
    b, n = x.shape
    if planes_override is not None:
        span = max(len(p) for p in planes_override) - 1
        halo_rows = _round_up(max(-(-span // _LANES), 1), 8)
    else:
        filter_length = len(filters[0])
        span = composite_halo_samples(filter_length, levels)
        halo_rows = _composite_halo_rows(filter_length, levels)
    halo_pad = halo_rows * _LANES
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, -(-n // _LANES), max(1, tile // _LANES),
        x.dtype.itemsize,
    )
    head, head_samples = head_splice if head_splice else (None, 0)
    if head_samples:
        assert head.shape[2] <= tile_rows, "head slab exceeds the row tile"
    external = halo is not None
    edge = "external" if external else ("wrap" if periodic else "zero")
    inline = n % (tile_rows * _LANES) == 0 and n >= halo_pad
    if inline:
        outs = _composite_analysis_call(
            _to_rows(x),
            _pad_halo_rows(halo, halo_pad, "left") if external else None,
            head,
            levels=levels,
            filters=filters,
            b_tile=b_tile,
            tile_rows=tile_rows,
            halo_rows=halo_rows,
            precision=precision,
            interpret=interpret,
            edge=edge,
            inline_halo=True,
            head_samples=head_samples,
            planes_override=planes_override,
        )
        return tuple(_from_rows(o) for o in outs)
    n_pad = _round_up(n, tile_rows * _LANES)
    if external:
        left = _from_rows(_pad_halo_rows(halo, halo_pad, "left"))
    elif periodic:
        reps = -(-halo_pad // n)
        left = jnp.concatenate([x] * reps, axis=-1)[..., -halo_pad:]
    else:
        left = jnp.zeros((b, halo_pad), dtype=x.dtype)
    pieces = [left, x]
    if n_pad != n:
        pieces.append(jnp.zeros((b, n_pad - n), dtype=x.dtype))
    x_ext = _to_rows(jnp.concatenate(pieces, axis=-1))
    outs = _composite_analysis_call(
        x_ext,
        None,
        head,
        levels=levels,
        filters=filters,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
        edge="zero" if external else edge,
        inline_halo=False,
        head_samples=head_samples,
        planes_override=planes_override,
    )
    return tuple(_from_rows(o)[..., :n] for o in outs)


def run_synthesis_composite(coeff_planes, levels, filters, periodic, tile,
                            precision, interpret, halo=None,
                            planes_override=None):
    """Tuple of [B, N] planes -> [B, N]; arbitrary N; periodic/zero.

    ``halo``: optional tuple of [B, >=span] RIGHT-neighbor samples per plane
    (samples just right of each plane's end).  Overrides ``periodic``.
    ``planes_override``: dense causal per-plane filters (see the analysis
    wrapper) — the synthesis reads forward with the same taps.
    """
    b, n = coeff_planes[0].shape
    if planes_override is not None:
        span = max(len(pp) for pp in planes_override) - 1
        halo_rows = _round_up(max(-(-span // _LANES), 1), 8)
    else:
        filter_length = len(filters[0])
        halo_rows = _composite_halo_rows(filter_length, levels)
    halo_pad = halo_rows * _LANES
    b_tile, tile_rows = _auto_tiles(
        b, levels, halo_rows, -(-n // _LANES), max(1, tile // _LANES),
        coeff_planes[0].dtype.itemsize,
        scratch_windows=2 * (levels + 2),
    )
    external = halo is not None
    edge = "external" if external else ("wrap" if periodic else "zero")
    inline = n % (tile_rows * _LANES) == 0 and n >= halo_pad
    if inline:
        halo_stack = (
            jnp.stack([_pad_halo_rows(h, halo_pad, "right") for h in halo])
            if external
            else None
        )
        out = _composite_synthesis_call(
            tuple(_to_rows(p) for p in coeff_planes),
            halo_stack,
            levels=levels,
            filters=filters,
            b_tile=b_tile,
            tile_rows=tile_rows,
            halo_rows=halo_rows,
            precision=precision,
            interpret=interpret,
            edge=edge,
            inline_halo=True,
            planes_override=planes_override,
        )
        return _from_rows(out)
    n_pad = _round_up(n, tile_rows * _LANES)

    def extend(plane, ext_halo=None):
        if ext_halo is not None:
            right = _from_rows(_pad_halo_rows(ext_halo, halo_pad, "right"))
        elif periodic:
            reps = -(-halo_pad // n)
            right = jnp.concatenate([plane] * reps, axis=-1)[..., :halo_pad]
        else:
            right = jnp.zeros((b, halo_pad), dtype=plane.dtype)
        pieces = [plane, right]
        if n_pad != n:
            pieces.append(jnp.zeros((b, n_pad - n), dtype=plane.dtype))
        return _to_rows(jnp.concatenate(pieces, axis=-1))

    out = _composite_synthesis_call(
        tuple(
            extend(p, halo[i] if external else None)
            for i, p in enumerate(coeff_planes)
        ),
        None,
        levels=levels,
        filters=filters,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        precision=precision,
        interpret=interpret,
        edge="zero" if external else edge,
        inline_halo=False,
        planes_override=planes_override,
    )
    return _from_rows(out)[..., :n]


# ---------------------------------------------------------------------------
# Fused denoise: analysis -> threshold -> synthesis in ONE kernel pass.
# The separate-call round trip writes J+1 coefficient planes to HBM and
# reads them back (68 B/sample); when the planes are not a user-visible
# result that traffic is pure waste — and tools/probe_write_wall.py shows
# the plane write-back pattern is exactly where the round trip loses its
# last ~20% of MXU peak.  Here the planes live only in VMEM per grid step,
# so HBM traffic drops to x in + x_hat out (8 B/sample) and the kernel is
# purely compute-bound.  (Reference analogue: denoiseMultiLevel,
# WaveletDenoiser.java:155-171 — which materializes every level.)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "levels", "filters_dec", "filters_rec", "b_tile", "tile_rows",
        "halo_rows", "mode", "precision", "interpret", "zero_tail",
        "inline_halo", "periodic",
    ),
)
def _composite_denoise_call(
    x: jnp.ndarray,  # [B, R_total, 128]; halos prepended/appended UNLESS inline
    thresholds: jnp.ndarray,  # [B, levels] f32, per (signal, level)
    *,
    levels: int,
    filters_dec: tuple,
    filters_rec: tuple,
    b_tile: int,
    tile_rows: int,
    halo_rows: int,
    mode: str,
    precision: str,
    interpret: bool,
    zero_tail: bool = False,
    inline_halo: bool = False,
    periodic: bool = True,
):
    """One-pass denoise kernel (double-buffered input DMA).

    Window layout: ``[left analysis halo | tile | right synthesis halo]``
    (``halo_rows`` each side).  Analysis plane rows >= halo_rows are valid;
    synthesis output row g (window coords, g in [H, T+H)) reads plane rows
    g..g+e_max <= T+2H-1, all valid.  With the positive-shift roll trick
    (``acc[r] = out[r - e_max]``) the output tile is
    ``shift(acc, H - e_max)[2H : T+2H)`` — an 8-row-aligned slice.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_planes = levels + 1
    planes_a = _resolve_planes(filters_dec, levels, None)
    planes_s = _resolve_planes(filters_rec, levels, None)
    bands_a = [_band_single(p, sign=-1) for p in planes_a]
    bands_s = [_band_single(p, sign=+1) for p in planes_s]
    groups_a = []
    for e in sorted({e for pb in bands_a for e in pb}, reverse=True):
        members = [pi for pi in range(n_planes) if e in bands_a[pi]]
        m_cat = np.concatenate([bands_a[pi][e] for pi in members], axis=1)
        groups_a.append((-e, members, m_cat))
    all_es = sorted({e for pb in bands_s for e in pb})
    e_max = all_es[-1]
    groups_s = []  # (shift, members, [M per member]) — roll-after-dot form
    for e in all_es:
        members = [pi for pi in range(n_planes) if e in bands_s[pi]]
        groups_s.append((e_max - e, members,
                         [bands_s[pi][e] for pi in members]))

    b, r_total, _ = x.shape
    window_rows = tile_rows + 2 * halo_rows
    r_out = r_total if inline_halo else r_total - 2 * halo_rows
    num_t = r_out // tile_rows
    grid = (b // b_tile, num_t)
    total_steps = (b // b_tile) * num_t
    dtype = x.dtype
    group_consts: list[jnp.ndarray] = []
    for _, _, m in groups_a:
        group_consts.extend(_const_terms(m, precision))
    cpg = len(group_consts) // len(groups_a)
    n_a_consts = len(group_consts)
    for _, _, ms in groups_s:
        for m in ms:
            group_consts.extend(_const_terms(m, precision))

    def kernel(x_hbm, th_ref, *rest):
        g_refs = rest[: len(group_consts)]
        out_ref = rest[len(group_consts)]
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        li = bi * num_t + t

        def window_dma(bi2, t2, slot, phase):
            bs2 = pl.ds(bi2 * b_tile, b_tile)
            if not inline_halo:
                c = pltpu.make_async_copy(
                    x_hbm.at[bs2, pl.ds(t2 * tile_rows, window_rows), :],
                    scratch.at[slot],
                    sems.at[slot, 0],
                )
                c.start() if phase == 0 else c.wait()
                return

            # inline: window [left halo | tile | right halo] fetched from
            # the UNEXTENDED input — the wrapper's extend path was a full
            # read+write copy of x (~8 B/sample, about HALF of the fused
            # round trip's precision-independent overhead)
            def _copy(dst_off, src_row, rows, sem_i):
                c = pltpu.make_async_copy(
                    x_hbm.at[bs2, pl.ds(src_row, rows), :],
                    scratch.at[slot, :, pl.ds(dst_off, rows), :],
                    sems.at[slot, sem_i],
                )
                c.start() if phase == 0 else c.wait()

            def _left_fill():
                if periodic:
                    _copy(0, r_out - halo_rows, halo_rows, 1)
                elif phase == 0:
                    scratch[slot, :, :halo_rows, :] = jnp.zeros(
                        (b_tile, halo_rows, _LANES), dtype
                    )

            def _right_fill():
                if periodic:
                    _copy(tile_rows + halo_rows, 0, halo_rows, 2)
                elif phase == 0:
                    scratch[slot, :, tile_rows + halo_rows :, :] = jnp.zeros(
                        (b_tile, halo_rows, _LANES), dtype
                    )

            if num_t == 1:
                _copy(halo_rows, 0, tile_rows, 0)
                _left_fill()
                _right_fill()
                return

            def _interior():
                c = pltpu.make_async_copy(
                    x_hbm.at[
                        bs2, pl.ds(t2 * tile_rows - halo_rows, window_rows), :
                    ],
                    scratch.at[slot],
                    sems.at[slot, 0],
                )
                c.start() if phase == 0 else c.wait()

            def _first():
                _copy(halo_rows, 0, tile_rows + halo_rows, 0)
                _left_fill()

            def _last():
                _copy(0, t2 * tile_rows - halo_rows, tile_rows + halo_rows, 0)
                _right_fill()

            pl.when(t2 == 0)(_first)
            pl.when(t2 == num_t - 1)(_last)
            if num_t > 2:
                pl.when(jnp.logical_and(t2 != 0, t2 != num_t - 1))(_interior)

        @pl.when(li == 0)
        def _prologue():
            window_dma(bi, t, 0, phase=0)

        window_dma(bi, t, li % 2, phase=1)

        if total_steps > 1:
            @pl.when(li + 1 < total_steps)
            def _prefetch():
                li1 = li + 1
                window_dma(li1 // num_t, li1 % num_t, li1 % 2, phase=0)

        flat = scratch[li % 2].reshape(b_tile * window_rows, _LANES)
        accs = [None] * n_planes
        for gi, (shift, members, _) in enumerate(groups_a):
            view = _shift_rows(flat, shift)
            outd = _dot_prepped(view, g_refs[gi * cpg : (gi + 1) * cpg], precision)
            for slot_i, pi in enumerate(members):
                piece = outd[:, slot_i * _LANES : (slot_i + 1) * _LANES]
                accs[pi] = piece if accs[pi] is None else accs[pi] + piece
        # threshold the detail planes in VMEM (approx passes through);
        # garbage halo rows shrink to garbage, synthesis never reads them.
        # (thresholds ride as ONE whole-array lane-broadcast block — tiny —
        # because a (b_tile, levels) block violates Mosaic's (8,128)
        # divisibility and a (1,1,1)->(1,R,128) splat is an unimplemented
        # both-axes broadcast; lane-complete rows keep it sublane-only)
        # mode "none" = pure round trip: planes feed synthesis untouched,
        # turning the kernel into the 8 B/sample analysis->synthesis pass
        # (the reference's fused single-pass kernel, VectorOps.java:887).
        shrunk = []
        for pi in range(levels):
            d3 = accs[pi].reshape(b_tile, window_rows, _LANES)
            if mode != "none":
                tj = th_ref[pl.ds(bi * b_tile, b_tile), pi, :].reshape(
                    b_tile, 1, _LANES
                )
                if mode == "soft":
                    # d - clamp(d, -t, t) == sign(d) * max(|d| - t, 0)
                    # exactly, at half the VPU passes (the shrink runs on
                    # every detail element in VMEM)
                    d3 = d3 - jnp.clip(d3, -tj, tj)
                else:
                    d3 = jnp.where(jnp.abs(d3) > tj, d3, jnp.zeros_like(d3))
            shrunk.append(d3.reshape(b_tile * window_rows, _LANES))
        shrunk.append(accs[levels])
        if zero_tail:
            # ZERO boundary: the inverse zero-extends the COEFFICIENTS, but
            # the tail halo holds the analysis of zero-extended x (nonzero)
            # — mask plane rows beyond n in the last tile before synthesis
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (window_rows, _LANES), 0
            )
            keep = jnp.logical_or(
                t != num_t - 1, rows < tile_rows + halo_rows
            ).astype(jnp.float32)
            keep = jnp.tile(keep, (b_tile, 1))
            shrunk = [p * keep for p in shrunk]
        shrunk_parts = [_prep_operand(p, precision) for p in shrunk]
        acc = None
        ci = n_a_consts
        for shift, members, _ in groups_s:
            s = None
            for pi in members:
                term = _dot_parts(
                    shrunk_parts[pi], g_refs[ci : ci + cpg], precision
                )
                ci += cpg
                s = term if s is None else s + term
            s = _shift_rows(s, shift)
            acc = s if acc is None else acc + s
        acc = _shift_rows(acc.astype(dtype), halo_rows - e_max)
        out_ref[:] = acc.reshape(b_tile, window_rows, _LANES)[
            :, 2 * halo_rows :, :
        ]

    macs = (
        sum(m.shape[1] for _, _, m in groups_a)
        + sum(len(ms) * _LANES for _, _, ms in groups_s)
    ) * _LANES
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (b, levels, _LANES), lambda bi, t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(len(group_consts))],
        out_specs=pl.BlockSpec(
            (b_tile, tile_rows, _LANES),
            lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r_out, _LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, b_tile, window_rows, _LANES), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * macs * b * r_out,
            bytes_accessed=b * r_out * _LANES * 2 * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, thresholds, *group_consts)
    return out


def denoise_composite_tiles(
    b: int, n: int, levels: int, filters_dec: tuple, filters_rec: tuple,
    tile: int, itemsize: int = 4,
):
    """(span, halo_rows, b_tile, tile_rows) for the fused denoise kernel,
    or None when the shape cannot be served (pure shape math — the caller
    probes eligibility with this BEFORE entering the custom-vjp core)."""
    span = max(
        composite_halo_samples(len(filters_dec[0]), levels),
        composite_halo_samples(len(filters_rec[0]), levels),
    )
    halo_rows = _round_up(max(-(-span // _LANES), 1), 8)
    b_tile, tile_rows = _auto_tiles(
        b, levels, 2 * halo_rows, -(-n // _LANES), max(1, tile // _LANES),
        itemsize,
        scratch_windows=2 * (levels + 2),
    )
    if n % (tile_rows * _LANES) != 0 or n < span:
        return None
    return span, halo_rows, b_tile, tile_rows


def run_denoise_composite(
    x: jnp.ndarray,  # [B, N]
    thresholds: jnp.ndarray,  # [B, levels]
    levels: int,
    filters_dec: tuple,
    filters_rec: tuple,
    periodic: bool,
    tile: int,
    mode: str,
    precision: str,
    interpret: bool,
):
    """[B, N] fused analysis->threshold->synthesis; returns None when the
    shape cannot be served (caller falls back to the 3-call path)."""
    b, n = x.shape
    tiles = denoise_composite_tiles(
        b, n, levels, filters_dec, filters_rec, tile, x.dtype.itemsize
    )
    if tiles is None:
        return None
    span, halo_rows, b_tile, tile_rows = tiles
    th_lanes = jnp.broadcast_to(
        thresholds.astype(jnp.float32)[:, :, None], (b, levels, _LANES)
    )
    out = _composite_denoise_call(
        _to_rows(x),
        th_lanes,
        levels=levels,
        filters_dec=filters_dec,
        filters_rec=filters_rec,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        mode=mode,
        precision=precision,
        interpret=interpret,
        zero_tail=not periodic,
        inline_halo=True,
        periodic=periodic,
    )
    return _from_rows(out)


def run_denoise_composite_stream(
    x: jnp.ndarray,  # [B, N] block
    halo: jnp.ndarray,  # [B, H_raw] raw-x tail of the stream before x
    thresholds: jnp.ndarray,  # [B, levels]
    levels: int,
    filters_dec: tuple,
    filters_rec: tuple,
    tile: int,
    mode: str,
    precision: str,
    interpret: bool,
):
    """Streaming fused denoise: one analysis->threshold->synthesis pass over
    a block with the raw-x stream history as the kernel's external LEFT
    analysis halo and a zero right halo whose plane rows are masked
    (``zero_tail``), i.e. block-local zero-coefficient extension on the
    right — bit-matching the jnp streaming denoiser's reconstruction
    semantics (synthesis reads only forward, so the left edge needs no
    coefficient extension at all).  Returns None when the block shape
    cannot be served (caller falls back to the jnp cascade)."""
    b, n = x.shape
    tiles = denoise_composite_tiles(
        b, n, levels, filters_dec, filters_rec, tile, x.dtype.itemsize
    )
    if tiles is None:
        return None
    span, halo_rows, b_tile, tile_rows = tiles
    halo_pad = halo_rows * _LANES
    hist = halo.astype(x.dtype)
    if hist.shape[-1] < halo_pad:
        hist = jnp.concatenate(
            [jnp.zeros((b, halo_pad - hist.shape[-1]), x.dtype), hist],
            axis=-1,
        )
    elif hist.shape[-1] > halo_pad:
        hist = hist[..., -halo_pad:]
    x_ext = _to_rows(
        jnp.concatenate(
            [hist, x, jnp.zeros((b, halo_pad), x.dtype)], axis=-1
        )
    )
    th_lanes = jnp.broadcast_to(
        thresholds.astype(jnp.float32)[:, :, None], (b, levels, _LANES)
    )
    out = _composite_denoise_call(
        x_ext,
        th_lanes,
        levels=levels,
        filters_dec=filters_dec,
        filters_rec=filters_rec,
        b_tile=b_tile,
        tile_rows=tile_rows,
        halo_rows=halo_rows,
        mode=mode,
        precision=precision,
        interpret=interpret,
        zero_tail=True,
        inline_halo=False,
        periodic=False,
    )
    return _from_rows(out)
