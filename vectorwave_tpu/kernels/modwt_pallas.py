"""Fused multi-level MODWT Pallas kernels (the TPU "native tier").

Counterpart of the reference's SIMD hot loops
(``/root/reference/vectorwave-extensions/.../modwt/BatchSIMDMODWT.java:383-508``
``internal/VectorOps.java:560,827-945`` — vector-lane à trous convolution with
fused low+high passes and left-history halos).  On TPU the equivalent
"assembly tier" is a Pallas kernel, and the win is memory locality rather
than lanes: the WHOLE J-level cascade runs while the signal tile sits in
VMEM, so HBM traffic drops to exactly ``read x once + write J+1 coefficient
arrays`` — about 4 + 4(J+1) bytes/sample regardless of depth.

Layout: signals ``[B, N]`` (batch sublanes x time lanes).  Each grid step
DMAs its tile PLUS the cascade halo straight from the unmodified input
arrays — the halo piece is a second DMA whose start is computed modulo N, so
the periodic wrap costs nothing and no extended copy of the input is ever
materialized.  Analysis gathers the halo from the LEFT (causal (t - 2^(j-1)l)
indexing); synthesis from the RIGHT (adjoint (t + 2^(j-1)l)); zero boundaries
just zero the halo slab on the edge tile.  All levels then run on the VMEM
tile with circularly-rolled shifted reads (roll garbage stays outside the
output window).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def pallas_available() -> bool:
    """Whether the Pallas TPU path can run on the current default backend."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def total_halo(filter_length: int, levels: int) -> int:
    """Cumulative cascade halo: sum_j (L0-1) 2^(j-1) = (L0-1)(2^J - 1)."""
    return (filter_length - 1) * ((1 << levels) - 1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _auto_tile(b: int, n: int, levels: int, requested: int, halo_pad: int,
               itemsize: int = 4) -> int:
    """Power-of-two tile width that fits the VMEM budget.

    Per tile sample the kernel holds ~2*(J+1) output buffers (double
    buffered) plus ~5 working planes, all times the batch height.  The tile
    no longer needs to divide N — the wrappers zero-pad the (already
    halo-extended) input up to a tile multiple and slice the outputs back to
    N, so arbitrary-N signals stay inside the budget.  The tile is kept at
    least as wide as the halo so halo work stays a bounded fraction of each
    grid step; if the halo alone exceeds the budget the halo width wins
    (correctness over budget — the eligibility gate keeps such calls off
    this path in auto routing).
    """
    budget = 10 * 1024 * 1024
    per_sample = b * (2 * (levels + 1) + 5) * itemsize
    cap = max(256, budget // per_sample)
    tile = min(requested, 1 << (cap.bit_length() - 1))
    tile = max(tile, halo_pad, 256)
    return min(tile, _round_up(n, 128))


def _kernel_filters(w, synthesis: bool) -> tuple[tuple[float, ...], tuple[float, ...]]:
    if synthesis:
        return (
            tuple((w.rec_lo * _INV_SQRT2).tolist()),
            tuple((w.rec_hi * _INV_SQRT2).tolist()),
        )
    return (
        tuple((w.dec_lo * _INV_SQRT2).tolist()),
        tuple((w.dec_hi * _INV_SQRT2).tolist()),
    )


@functools.partial(
    jax.jit,
    static_argnames=("levels", "filters", "tile", "halo_pad", "interpret"),
)
def _fused_analysis_call(
    x: jnp.ndarray,
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    tile: int,
    halo_pad: int,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    low = np.asarray(filters[0], dtype=np.float32)
    high = np.asarray(filters[1], dtype=np.float32)
    b, n_ext = x.shape
    n = n_ext - halo_pad  # input arrives left-extended by the halo
    window = tile + halo_pad
    num_tiles = n // tile

    def kernel(x_hbm, *rest):
        out_refs, (scratch, sems) = rest[:-2], rest[-2:]
        t = pl.program_id(0)
        copy = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(t * tile, window)], scratch, sems.at[0]
        )
        copy.start()
        copy.wait()
        cur = scratch[:]
        for level in range(1, levels + 1):
            spacing = 1 << (level - 1)
            approx = None
            detail = None
            for k in range(low.shape[0]):
                shifted = pltpu.roll(cur, spacing * k, 1) if spacing * k else cur
                a_term = shifted * float(low[k])
                d_term = shifted * float(high[k])
                approx = a_term if approx is None else approx + a_term
                detail = d_term if detail is None else detail + d_term
            out_refs[level - 1][:] = detail[:, halo_pad:]
            cur = approx
        out_refs[levels][:] = cur[:, halo_pad:]

    out_shape = [jax.ShapeDtypeStruct((b, n), x.dtype) for _ in range(levels + 1)]
    out_specs = [
        pl.BlockSpec((b, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
        for _ in range(levels + 1)
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, window), x.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * window * low.shape[0] * levels,
            bytes_accessed=b * (n + (levels + 1) * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x)
    return tuple(outs)


def _run_analysis(x, levels, filters, periodic, tile, interpret):
    """Extend left + run the analysis kernel (2-D [B, N] input).

    Arbitrary N: the extended input is zero-padded on the right up to a tile
    multiple; analysis output t only reads positions <= t, so the padding is
    never seen by the first N (kept) outputs.
    """
    b, n = x.shape
    filter_length = len(filters[0])
    halo_pad = _round_up(max(total_halo(filter_length, levels), 1), 128)
    tile = _auto_tile(b, n, levels, tile, halo_pad, x.dtype.itemsize)
    n_pad = _round_up(n, tile)
    if periodic:
        reps = -(-halo_pad // n)
        left = jnp.concatenate([x] * reps, axis=-1)[..., -halo_pad:]
    else:
        left = jnp.zeros((b, halo_pad), dtype=x.dtype)
    pieces = [left, x]
    if n_pad != n:
        pieces.append(jnp.zeros((b, n_pad - n), dtype=x.dtype))
    x_ext = jnp.concatenate(pieces, axis=-1)
    outs = _fused_analysis_call(
        x_ext,
        levels=levels,
        filters=filters,
        tile=tile,
        halo_pad=halo_pad,
        interpret=interpret,
    )
    if n_pad != n:
        outs = tuple(o[..., :n] for o in outs)
    return outs


def _run_synthesis(coeff_planes, levels, filters, periodic, tile, interpret):
    """Extend right + run the synthesis kernel (tuple of 2-D planes).

    Arbitrary N: planes become [plane, halo, zeros-to-tile-multiple]; output
    t only reads positions in [t, t + halo], so kept outputs (< N) never see
    the zero padding.
    """
    b, n = coeff_planes[0].shape
    filter_length = len(filters[0])
    halo_pad = _round_up(max(total_halo(filter_length, levels), 1), 128)
    tile = _auto_tile(b, n, levels, tile, halo_pad, coeff_planes[0].dtype.itemsize)
    n_pad = _round_up(n, tile)

    def extend(plane):
        if periodic:
            reps = -(-halo_pad // n)
            right = jnp.concatenate([plane] * reps, axis=-1)[..., :halo_pad]
        else:
            right = jnp.zeros((b, halo_pad), dtype=plane.dtype)
        pieces = [plane, right]
        if n_pad != n:
            pieces.append(jnp.zeros((b, n_pad - n), dtype=plane.dtype))
        return jnp.concatenate(pieces, axis=-1)

    out = _fused_synthesis_call(
        tuple(extend(p) for p in coeff_planes),
        levels=levels,
        filters=filters,
        tile=tile,
        halo_pad=halo_pad,
        interpret=interpret,
    )
    if n_pad != n:
        out = out[..., :n]
    return out


# The analysis map A and synthesis map S are linear; for PERIODIC and ZERO
# boundaries the synthesis STRUCTURE with the analysis filters is exactly
# A^T (each level's (t+l) correlation is the transpose of the (t-l)
# convolution circulant), so the VJPs run the opposite kernel with the
# forward map's own filters — one fused kernel pass per gradient, making the
# Pallas tier fully differentiable (including biorthogonal wavelets, where
# dec and rec filters differ).


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _analysis_core(x, levels, filters, periodic, tile, interpret):
    return _run_analysis(x, levels, filters, periodic, tile, interpret)


def _analysis_core_fwd(x, levels, filters, periodic, tile, interpret):
    return _run_analysis(x, levels, filters, periodic, tile, interpret), None


def _analysis_core_bwd(levels, filters, periodic, tile, interpret, _, cotangents):
    grad_x = _run_synthesis(
        tuple(cotangents), levels, filters, periodic, tile, interpret
    )
    return (grad_x,)


_analysis_core.defvjp(_analysis_core_fwd, _analysis_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _synthesis_core(coeff_planes, levels, filters, periodic, tile, interpret):
    return _run_synthesis(coeff_planes, levels, filters, periodic, tile, interpret)


def _synthesis_core_fwd(coeff_planes, levels, filters, periodic, tile, interpret):
    return _run_synthesis(coeff_planes, levels, filters, periodic, tile, interpret), None


def _synthesis_core_bwd(levels, filters, periodic, tile, interpret, _, cotangent):
    grads = _run_analysis(cotangent, levels, filters, periodic, tile, interpret)
    return (tuple(grads),)


_synthesis_core.defvjp(_synthesis_core_fwd, _synthesis_core_bwd)


def fused_analysis(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
    tile: int = 8192,
    interpret: bool = False,
):
    """Fused J-level MODWT analysis: returns (details tuple, approx).

    ``x``: [B, N] (or [N]); periodic or zero boundaries (symmetric needs a
    per-level mirror of the evolving approximation — use the jnp path).
    Results are fp32-equivalent to ``modwt_multilevel`` (summation-order
    rounding only).  Differentiable: the VJP is one fused synthesis pass.
    """
    from ..transforms.modwt import _resolve_discrete

    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")):
        from ..errors import ErrorCode, InvalidArgumentError

        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            "Fused Pallas analysis supports periodic/zero boundaries",
            suggestions=("Use modwt_multilevel() for symmetric boundaries",),
        )
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    outs = _analysis_core(
        x,
        levels,
        _kernel_filters(w, synthesis=False),
        boundary_l.startswith("per"),
        tile,
        interpret,
    )
    details = outs[:levels]
    approx = outs[levels]
    if squeeze:
        details = tuple(d[0] for d in details)
        approx = approx[0]
    return details, approx


@functools.partial(
    jax.jit,
    static_argnames=("levels", "filters", "tile", "halo_pad", "interpret"),
)
def _fused_synthesis_call(
    coeffs: tuple[jnp.ndarray, ...],
    *,
    levels: int,
    filters: tuple[tuple[float, ...], tuple[float, ...]],
    tile: int,
    halo_pad: int,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    low = np.asarray(filters[0], dtype=np.float32)
    high = np.asarray(filters[1], dtype=np.float32)
    n_coeffs = levels + 1
    b, n_ext = coeffs[0].shape
    n = n_ext - halo_pad  # planes arrive right-extended by the halo
    window = tile + halo_pad
    num_tiles = n // tile
    dtype = coeffs[0].dtype

    def kernel(*refs):
        coeff_refs = refs[:n_coeffs]
        out_ref = refs[n_coeffs]
        scratch, sems = refs[n_coeffs + 1], refs[n_coeffs + 2]
        t = pl.program_id(0)
        copies = [
            pltpu.make_async_copy(
                coeff_refs[i].at[:, pl.ds(t * tile, window)],
                scratch.at[i],
                sems.at[i],
            )
            for i in range(n_coeffs)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        cur = scratch[levels]  # coarsest approx plane
        for level in range(levels, 0, -1):
            spacing = 1 << (level - 1)
            detail = scratch[level - 1]
            rec = None
            for k in range(low.shape[0]):
                # left-roll by s*k expressed as a right-roll by window - s*k
                # (pltpu.roll requires non-negative shifts)
                shift = (window - spacing * k) % window
                cur_s = pltpu.roll(cur, shift, 1) if shift else cur
                det_s = pltpu.roll(detail, shift, 1) if shift else detail
                term = cur_s * float(low[k]) + det_s * float(high[k])
                rec = term if rec is None else rec + term
            cur = rec
        out_ref[:] = cur[:, :tile]

    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_coeffs,
        out_specs=pl.BlockSpec((b, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), dtype),
        scratch_shapes=[
            pltpu.VMEM((n_coeffs, b, window), dtype),
            pltpu.SemaphoreType.DMA((n_coeffs,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * window * low.shape[0] * levels,
            bytes_accessed=(n_coeffs + 1) * b * n * dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*coeffs)
    return out


def fused_synthesis(
    details,
    approx: jnp.ndarray,
    wavelet,
    *,
    boundary: str = "periodic",
    tile: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused J-level inverse MODWT from (details, approx); adjoint of
    :func:`fused_analysis` (periodic / zero boundaries)."""
    from ..transforms.modwt import _resolve_discrete

    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")):
        from ..errors import ErrorCode, InvalidArgumentError

        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            "Fused Pallas synthesis supports periodic/zero boundaries",
            suggestions=("Use imodwt_multilevel() for symmetric boundaries",),
        )
    levels = len(details)
    squeeze = approx.ndim == 1
    if squeeze:
        details = tuple(d[None, :] for d in details)
        approx = approx[None, :]
    out = _synthesis_core(
        tuple(details) + (approx,),
        levels,
        _kernel_filters(w, synthesis=True),
        boundary_l.startswith("per"),
        tile,
        interpret,
    )
    if squeeze:
        out = out[0]
    return out
