"""Fused multi-level MODWT kernel tier: public API + routing.

Counterpart of the reference's SIMD hot loops
(``/root/reference/vectorwave-extensions/.../modwt/BatchSIMDMODWT.java:383-508``
``internal/VectorOps.java:560,827-945`` — vector-lane à trous convolution with
fused low+high passes and left-history halos).  On TPU the "assembly tier" is
a Pallas kernel; since round 2 the compute lives in
:mod:`vectorwave_tpu.kernels.modwt_mxu` — a composite-filter banded-matmul
formulation that runs the filtering on the MXU (see that module's docstring
for the design).  This module keeps the public surface: halo math,
eligibility helpers, the differentiable ``fused_analysis``/``fused_synthesis``
entry points (custom VJPs: the adjoint of analysis is synthesis with the
analysis filters, so each gradient is one fused kernel pass — including
biorthogonal wavelets where dec and rec filters differ), and the precision
knob (``config.set_fused_precision``: float32 / bf16_3x / bf16 — ~2.5 / ~4.8
/ ~10.8 Gsamples/s round trip on a v5e chip, ±15% chip-state variance;
the per-round measurement is BENCH_LATEST.json).
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


def _run_analysis(x, levels, filters, periodic, tile, interpret,
                  precision=None):
    """[B, N] analysis via the composite-filter MXU kernel (modwt_mxu)."""
    from ..config import get_fused_precision
    from .modwt_mxu import run_analysis_composite

    return run_analysis_composite(
        x, levels, filters, periodic, tile,
        precision or get_fused_precision(), interpret,
    )


def _run_synthesis(coeff_planes, levels, filters, periodic, tile, interpret,
                   precision=None):
    """Tuple of [B, N] planes -> [B, N] via the composite MXU kernel."""
    from ..config import get_fused_precision
    from .modwt_mxu import run_synthesis_composite

    return run_synthesis_composite(
        coeff_planes, levels, filters, periodic, tile,
        precision or get_fused_precision(), interpret,
    )


# The analysis map A and synthesis map S are linear; for PERIODIC and ZERO
# boundaries the synthesis STRUCTURE with the analysis filters is exactly
# A^T (each level's (t+l) correlation is the transpose of the (t-l)
# convolution circulant), so the VJPs run the opposite kernel with the
# forward map's own filters — one fused kernel pass per gradient, making the
# Pallas tier fully differentiable (including biorthogonal wavelets, where
# dec and rec filters differ).


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _analysis_core(x, levels, filters, periodic, tile, interpret, precision):
    return _run_analysis(x, levels, filters, periodic, tile, interpret, precision)


def _analysis_core_fwd(x, levels, filters, periodic, tile, interpret, precision):
    return (
        _run_analysis(x, levels, filters, periodic, tile, interpret, precision),
        None,
    )


def _analysis_core_bwd(levels, filters, periodic, tile, interpret, precision, _,
                       cotangents):
    grad_x = _run_synthesis(
        tuple(cotangents), levels, filters, periodic, tile, interpret, precision
    )
    return (grad_x,)


_analysis_core.defvjp(_analysis_core_fwd, _analysis_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _synthesis_core(coeff_planes, levels, filters, periodic, tile, interpret,
                    precision):
    return _run_synthesis(
        coeff_planes, levels, filters, periodic, tile, interpret, precision
    )


def _synthesis_core_fwd(coeff_planes, levels, filters, periodic, tile, interpret,
                        precision):
    return (
        _run_synthesis(
            coeff_planes, levels, filters, periodic, tile, interpret, precision
        ),
        None,
    )


def _synthesis_core_bwd(levels, filters, periodic, tile, interpret, precision, _,
                        cotangent):
    grads = _run_analysis(
        cotangent, levels, filters, periodic, tile, interpret, precision
    )
    return (tuple(grads),)


_synthesis_core.defvjp(_synthesis_core_fwd, _synthesis_core_bwd)


def fused_analysis(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
    tile: int = 65536,
    interpret: bool | None = None,
    precision: str | None = None,
):
    """Fused J-level MODWT analysis: returns (details tuple, approx).

    ``x``: [B, N] (or [N]); periodic or zero boundaries (symmetric needs a
    per-level mirror of the evolving approximation — use the jnp path).
    Results are fp32-equivalent to ``modwt_multilevel`` (summation-order
    rounding only).  Differentiable: the VJP is one fused synthesis pass.
    ``interpret=None`` auto-selects: compiled on TPU, interpreter elsewhere
    (so forced ``backend='pallas'`` stays portable).
    """
    from ..transforms.modwt import _resolve_discrete

    if interpret is None:
        interpret = not pallas_available()
    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")
            or boundary_l.startswith("sym")):
        from ..errors import ErrorCode, InvalidArgumentError

        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            f"Unknown boundary for fused analysis: {boundary!r}",
            suggestions=("Use 'periodic', 'zero' or 'symmetric'",),
        )
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    if boundary_l.startswith("sym"):
        # Symmetric = composite-zero kernel body + exact jnp head splice
        # (the cascade is causal; only the first span samples see the
        # mirror).  Differentiable: the splice composes the zero-boundary
        # kernel VJP with jnp autodiff.  Falls back to the pure jnp cascade
        # for short/unaligned signals inside fused_symmetric_analysis.
        from .modwt_symmetric import fused_symmetric_analysis

        details, approx = fused_symmetric_analysis(
            x, w, levels=levels, tile=tile, interpret=interpret,
            precision=precision,
        )
        if squeeze:
            details = tuple(d[0] for d in details)
            approx = approx[0]
        return details, approx
    outs = _analysis_core(
        x,
        levels,
        _kernel_filters(w, synthesis=False),
        boundary_l.startswith("per"),
        tile,
        interpret,
        precision,
    )
    details = outs[:levels]
    approx = outs[levels]
    if squeeze:
        details = tuple(d[0] for d in details)
        approx = approx[0]
    return details, approx


def fused_synthesis(
    details,
    approx: jnp.ndarray,
    wavelet,
    *,
    boundary: str = "periodic",
    tile: int = 65536,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Fused J-level inverse MODWT from (details, approx): the adjoint of
    :func:`fused_analysis` for periodic/zero, the alignment-shifted exact
    inverse for symmetric (kernels/modwt_symmetric.py).  ``interpret=None``
    auto-selects: compiled on TPU, interpreter elsewhere."""
    from ..transforms.modwt import _resolve_discrete

    if interpret is None:
        interpret = not pallas_available()
    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")
            or boundary_l.startswith("sym")):
        from ..errors import ErrorCode, InvalidArgumentError

        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            f"Unknown boundary for fused synthesis: {boundary!r}",
            suggestions=("Use 'periodic', 'zero' or 'symmetric'",),
        )
    levels = len(details)
    squeeze = approx.ndim == 1
    if squeeze:
        details = tuple(d[None, :] for d in details)
        approx = approx[None, :]
    if boundary_l.startswith("sym"):
        # Alignment-shifted symmetric inverse: composite kernel with the
        # two-sided composed plane filters + jnp edge splice; custom VJP.
        from .modwt_symmetric import fused_symmetric_synthesis

        out = fused_symmetric_synthesis(
            details, approx, w, tile=tile, interpret=interpret,
            precision=precision,
        )
        if squeeze:
            out = out[0]
        return out
    out = _synthesis_core(
        tuple(details) + (approx,),
        levels,
        _kernel_filters(w, synthesis=True),
        boundary_l.startswith("per"),
        tile,
        interpret,
        precision,
    )
    if squeeze:
        out = out[0]
    return out


def fused_denoise_multilevel(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    thresholds: jnp.ndarray,  # [..., levels] per (signal, level)
    boundary: str = "periodic",
    mode: str = "soft",
    tile: int = 65536,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray | None:
    """One-kernel denoise: analysis -> per-level threshold -> synthesis
    with the coefficient planes living only in VMEM (8 B/sample of HBM
    traffic instead of the separate-call path's 68).

    Returns None when the shape cannot be served (caller falls back to the
    3-call path).  Periodic/zero boundaries.  Differentiable: the custom
    VJP recomputes the shrink mask and runs the composite analysis/
    synthesis kernels as the adjoints (see ``_fused_denoise_bwd``).
    Reference semantics:
    ``WaveletDenoiser.denoiseMultiLevel`` (WaveletDenoiser.java:155-171).
    """
    from ..config import get_fused_precision
    from ..transforms.modwt import _resolve_discrete

    if interpret is None:
        interpret = not pallas_available()
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")):
        return None
    w = _resolve_discrete(wavelet)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
        thresholds = thresholds[None, :]
    b_shape = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    th2 = thresholds.reshape(-1, thresholds.shape[-1])
    filters_dec = _kernel_filters(w, synthesis=False)
    filters_rec = _kernel_filters(w, synthesis=True)
    periodic = boundary_l.startswith("per")
    prec = precision or get_fused_precision()
    # eligibility is pure shape math — probe it BEFORE entering the
    # custom-vjp core (which cannot conditionally return None)
    from .modwt_mxu import denoise_composite_tiles

    if denoise_composite_tiles(
        x2.shape[0], x2.shape[1], levels, filters_dec, filters_rec, tile,
        jnp.dtype(x2.dtype).itemsize,
    ) is None:
        return None
    out = _fused_denoise_core(
        x2, th2, levels, filters_dec, filters_rec, periodic, tile, mode,
        prec, interpret,
    )
    out = out.reshape(b_shape + (out.shape[-1],))
    return out[0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _fused_denoise_core(x2, th2, levels, filters_dec, filters_rec, periodic,
                        tile, mode, precision, interpret):
    from .modwt_mxu import run_denoise_composite

    out = run_denoise_composite(
        x2, th2, levels, filters_dec, filters_rec, periodic, tile, mode,
        precision, interpret,
    )
    assert out is not None  # eligibility probed by the caller
    return out


def _fused_denoise_fwd(x2, th2, levels, filters_dec, filters_rec, periodic,
                       tile, mode, precision, interpret):
    out = _fused_denoise_core(
        x2, th2, levels, filters_dec, filters_rec, periodic, tile, mode,
        precision, interpret,
    )
    return out, (x2, th2)


def _fused_denoise_bwd(levels, filters_dec, filters_rec, periodic, tile,
                       mode, precision, interpret, res, g):
    """Recompute-based adjoint: dx = A^T(mask ⊙ S^T g) via the existing
    composite kernels — S^T is the ANALYSIS kernel with the rec-filter
    composites (backward reads), A^T the SYNTHESIS kernel with the
    dec-filter composites (forward reads); the shrinkage mask comes from
    re-running the analysis.  d/dthreshold: soft = -Σ sign(d)·mask·(S^T g)
    per level, hard = 0 a.e."""
    from .modwt_mxu import run_analysis_composite, run_synthesis_composite

    x2, th2 = res
    gs = run_analysis_composite(
        g, levels, filters_rec, periodic, tile,
        precision, interpret,
    )
    if mode == "none":  # pure round trip: S^T then A^T, no shrink mask
        dx = run_synthesis_composite(
            tuple(gs), levels, filters_dec, periodic, tile,
            precision, interpret,
        )
        return dx, jnp.zeros_like(th2)
    d_planes = run_analysis_composite(
        x2, levels, filters_dec, periodic, tile,
        precision, interpret,
    )
    masks = [
        jnp.abs(d_planes[j]) > th2[..., j : j + 1] for j in range(levels)
    ]
    gd = tuple(
        jnp.where(masks[j], gs[j], jnp.zeros_like(gs[j]))
        for j in range(levels)
    ) + (gs[levels],)
    dx = run_synthesis_composite(
        gd, levels, filters_dec, periodic, tile,
        precision, interpret,
    )
    if mode == "soft":
        dth = jnp.concatenate(
            [
                jnp.sum(
                    jnp.where(
                        masks[j], -jnp.sign(d_planes[j]) * gs[j], 0.0
                    ),
                    axis=-1, keepdims=True,
                )
                for j in range(levels)
            ],
            axis=-1,
        ).astype(th2.dtype)
    else:
        dth = jnp.zeros_like(th2)
    return dx, dth


_fused_denoise_core.defvjp(_fused_denoise_fwd, _fused_denoise_bwd)


def modwt_roundtrip_fused(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
    tile: int = 65536,
    interpret: bool | None = None,
    precision: str | None = None,
) -> jnp.ndarray:
    """Fused analysis->synthesis round trip in ONE kernel pass (8 B/sample).

    The separate-call round trip (``fused_analysis`` + ``fused_synthesis``)
    writes J+1 coefficient planes to HBM and reads them back — 68 B/sample
    at the bench shape, which pins it to the HBM write wall at ~80% of MXU
    peak (tools/probe_write_wall.py).  Here the planes live only in VMEM per
    grid step (the ``mode="none"`` tier of the fused-denoise kernel), so the
    round trip is purely compute-bound.  Reference contract: the fused
    single-pass low+high kernel
    (``/root/reference/vectorwave-extensions/.../internal/VectorOps.java:887``).

    Falls back to the two-call composite path when the shape cannot be
    served by the one-pass kernel (short/unaligned signals).  Periodic/zero
    boundaries; differentiable (custom VJP: one analysis + one synthesis
    kernel pass).
    """
    squeeze = x.ndim == 1
    x2 = x[None, :] if squeeze else x
    lead = x2.shape[:-1]
    flat = x2.reshape(-1, x2.shape[-1])
    dummy = jnp.zeros(flat.shape[:-1] + (levels,), jnp.float32)
    out = fused_denoise_multilevel(
        flat, wavelet, levels=levels, thresholds=dummy, boundary=boundary,
        mode="none", tile=tile, interpret=interpret, precision=precision,
    )
    if out is None:
        details, approx = fused_analysis(
            flat, wavelet, levels=levels, boundary=boundary, tile=tile,
            interpret=interpret, precision=precision,
        )
        out = fused_synthesis(
            details, approx, wavelet, boundary=boundary, tile=tile,
            interpret=interpret, precision=precision,
        )
    out = out.reshape(lead + (out.shape[-1],))
    return out[0] if squeeze else out
