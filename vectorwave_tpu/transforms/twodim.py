"""2-D wavelet transforms (separable), beyond the reference's scope.

The reference is 1-D only; 2-D is a natural extension on TPU because the
separable construction is exactly two batched 1-D passes — the row pass
vectorizes over columns and vice versa, each a clean MXU/VPU-friendly
batched convolution.  Conventions follow the 1-D engine: undecimated
MODWT2 with per-stage 1/sqrt(2) scaling and the same three boundary modes;
decimated DWT2 with the `ops.dwt` indexing.

Subband convention (first letter = filter along H/rows, second = along
W/columns): ``ll`` low/low (smooth), ``lh`` low-H + high-W (responds to
VERTICAL edges — variation along W), ``hl`` high-H + low-W (horizontal
edges), ``hh`` high/high (diagonal).  Arrays are ``[..., H, W]``; leading
axes are batch.  Like the 1-D engine, only PERIODIC round trips are exact
to machine precision end-to-end; zero/symmetric are interior-exact with
edge effects within the filter support.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..errors import ErrorCode, InvalidArgumentError, InvalidSignalError
from ..ops.convolve import atrous_analysis_pair, atrous_convolve
from ..ops.dwt import dwt, idwt
from .modwt import MODWTResult, _resolve_discrete, imodwt, modwt
from .multilevel import _check_level_fits, _symmetric_alignment, _tau_j

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _check_2d(x: jnp.ndarray, name: str) -> None:
    if x.ndim < 2:
        raise InvalidSignalError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"{name} needs [..., H, W] input, got shape {tuple(x.shape)}",
        )


class MODWT2Result(NamedTuple):
    """Single-level 2-D MODWT subbands, each shaped like the input."""

    ll: jnp.ndarray
    lh: jnp.ndarray
    hl: jnp.ndarray
    hh: jnp.ndarray

    def energy(self) -> jnp.ndarray:
        return sum((b**2).sum(axis=(-1, -2)) for b in self)


def modwt2(x: jnp.ndarray, wavelet, *, boundary: str = "periodic") -> MODWT2Result:
    """Single-level separable 2-D MODWT: columns pass then rows pass."""
    _check_2d(x, "modwt2")
    w = _resolve_discrete(wavelet)
    col = modwt(x, w, boundary=boundary)          # along W
    a = _rows_pair(col.approx, w, boundary)       # along H: (low-H, high-H)
    d = _rows_pair(col.detail, w, boundary)
    return MODWT2Result(ll=a[0], lh=d[0], hl=a[1], hh=d[1])


def _rows_pair(x: jnp.ndarray, w, boundary: str):
    xt = jnp.swapaxes(x, -1, -2)
    res = modwt(xt, w, boundary=boundary)
    return (
        jnp.swapaxes(res.approx, -1, -2),
        jnp.swapaxes(res.detail, -1, -2),
    )


def imodwt2(result: MODWT2Result, wavelet, *, boundary: str = "periodic") -> jnp.ndarray:
    """Inverse separable 2-D MODWT (rows pass inverse, then columns)."""
    w = _resolve_discrete(wavelet)

    def inv_rows(a, d):
        at = jnp.swapaxes(a, -1, -2)
        dt = jnp.swapaxes(d, -1, -2)
        return jnp.swapaxes(imodwt(MODWTResult(at, dt), w, boundary=boundary), -1, -2)

    col_approx = inv_rows(result.ll, result.hl)   # low-W bands: (low-H, high-H)
    col_detail = inv_rows(result.lh, result.hh)   # high-W bands
    return imodwt(MODWTResult(col_approx, col_detail), w, boundary=boundary)


class MultiLevelMODWT2Result(NamedTuple):
    """J-level 2-D MODWT: per-level (lh, hl, hh) triples + final ll."""

    details: tuple  # ((lh, hl, hh), ...) level 1..J
    approx: jnp.ndarray

    @property
    def levels(self) -> int:
        return len(self.details)

    def detail_energy(self, level: int) -> jnp.ndarray:
        lh, hl, hh = self.details[level - 1]
        return (lh**2 + hl**2 + hh**2).sum(axis=(-1, -2))


def _h_pass_pair(x, low, high, spacing, boundary):
    """Analysis pair along the H (row) axis: returns (low-H, high-H)."""
    xt = jnp.swapaxes(x, -1, -2)
    a, d = atrous_analysis_pair(xt, low, high, spacing=spacing, boundary=boundary)
    return jnp.swapaxes(a, -1, -2), jnp.swapaxes(d, -1, -2)


def _analysis2_level(x, low, high, spacing, boundary):
    a_w, d_w = atrous_analysis_pair(x, low, high, spacing=spacing, boundary=boundary)
    ll, hl = _h_pass_pair(a_w, low, high, spacing, boundary)
    lh, hh = _h_pass_pair(d_w, low, high, spacing, boundary)
    return MODWT2Result(ll=ll, lh=lh, hl=hl, hh=hh)


def _modwt2_symmetric_fast(x, w, levels):
    """Symmetric-boundary 2-D analysis through the ZERO-boundary Pallas
    kernel, one call per level.

    Half-point symmetric extension is periodic over ``[x, flip(x)]``
    (ops/convolve.py module docstring) and is re-applied to the CURRENT
    level input at every stage, so one global pad cannot serve the whole
    cascade (verified: only level 1 matches).  Instead each level
    reflect-pads the current approximation TOP/LEFT by its own à trous
    span (analysis reads only backward — the zero region beyond the pad
    is never read by kept outputs), runs ONE single-level kernel call
    with the zero-stuffed level-j filters, and crops.  Returns None when
    ineligible (caller falls back to the jnp cascade)."""
    import numpy as np

    import jax

    from ..config import get_fused_precision
    from ..kernels.modwt2_pallas import (
        _modwt2_analysis_call,
        modwt2_pallas_eligible,
    )
    from ..kernels.modwt_pallas import pallas_available

    h, w_ = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    inv = 1.0 / math.sqrt(2.0)

    def up(f, s):
        arr = np.zeros(s * (len(f) - 1) + 1, dtype=np.float64)
        arr[::s] = np.asarray(f, np.float64)
        return arr

    # precheck every level before any compute
    pads = []
    for level in range(1, levels + 1):
        spacing = 1 << (level - 1)
        span = (w.filter_length - 1) * spacing
        pad_h = span + (-(h + span)) % 256
        pad_w = span + (-(w_ + span)) % 256
        if pad_h > h or pad_w > w_:  # jnp.pad symmetric cannot exceed dim
            return None
        probe = jax.ShapeDtypeStruct(
            lead + (h + pad_h, w_ + pad_w), x.dtype
        )
        if not modwt2_pallas_eligible(probe, w, 1, "zero"):
            return None
        # the single-level call's own span/halo check uses the STUFFED
        # filter length, which modwt2_pallas_eligible (levels=1) does not
        # see — mirror the kernel's hb <= 4 guard here
        if -(-span // 128) > 4:
            return None
        pads.append((spacing, pad_h, pad_w))

    prec = get_fused_precision()
    interp = not pallas_available()
    cur = x.reshape((-1,) + x.shape[-2:])
    details = []
    for (spacing, pad_h, pad_w) in pads:
        filters = (
            tuple((up(w.dec_lo, spacing) * inv).tolist()),
            tuple((up(w.dec_hi, spacing) * inv).tolist()),
        )
        curp = jnp.pad(
            cur, [(0, 0), (pad_h, 0), (pad_w, 0)], mode="symmetric"
        )
        x4 = curp.reshape(curp.shape[0], curp.shape[1], -1, 128)
        wk = x4.shape[2]
        # deep-halo calls cap the tile at 2, like the main Pallas path: a
        # 1-level hb=4 wtile=4 analysis call overflowed Mosaic's 16 MB
        # scoped budget (21.2 MB)
        hb_lvl = -(-((w.filter_length - 1) * spacing) // 128)
        cap = 4 if hb_lvl <= 2 else 2
        wtile = min(cap, 4 if wk % 4 == 0 else (2 if wk % 2 == 0 else 1))
        lh, hl, hh, ll = _modwt2_analysis_call(
            x4, levels=1, filters=filters, wtile=wtile, periodic=False,
            precision=prec, interpret=interp,
        )

        def crop(v, pad_h=pad_h, pad_w=pad_w):
            return v[..., pad_h:, pad_w:]

        details.append(tuple(
            crop(p).reshape(lead + (h, w_)) for p in (lh, hl, hh)
        ))
        cur = crop(ll)
    return MultiLevelMODWT2Result(
        tuple(details), cur.reshape(lead + (h, w_))
    )


def modwt2_multilevel(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
) -> MultiLevelMODWT2Result:
    """J-level separable 2-D MODWT with à trous spacing ``2^(j-1)`` at
    level j along BOTH axes (the 1-D cascade's convention,
    :func:`..multilevel.modwt_multilevel`), so level-j subbands isolate
    dyadic scale 2^j in H and W."""
    _check_2d(x, "modwt2_multilevel")
    if levels < 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_LEVEL, f"levels must be >= 1, got {levels}"
        )
    w = _resolve_discrete(wavelet)
    n_min = min(x.shape[-1], x.shape[-2])
    _check_level_fits(w, levels, n_min)
    from ..kernels.modwt2_pallas import modwt2_pallas_eligible

    if modwt2_pallas_eligible(x, w, levels, boundary):
        # true 2-D Pallas kernel: both separable passes in VMEM, subbands
        # written in standard layout (no transposes/rolls through HBM)
        from ..config import get_fused_precision
        from ..kernels.modwt2_pallas import modwt2_multilevel_pallas
        from ..kernels.modwt_pallas import pallas_available

        details, ll = modwt2_multilevel_pallas(
            x, w, levels, boundary, get_fused_precision(),
            interpret=not pallas_available(),
        )
        return MultiLevelMODWT2Result(details, ll)
    if boundary.lower().startswith("sym"):
        fast = _modwt2_symmetric_fast(x, w, levels)
        if fast is not None:
            return fast
    if _fast2_eligible(x, levels, boundary):
        from ..config import get_fused_precision
        from ..kernels.modwt2_mxu import modwt2_multilevel_fast

        details, ll = modwt2_multilevel_fast(
            x, w, levels, boundary, get_fused_precision()
        )
        return MultiLevelMODWT2Result(details, ll)
    low = w.dec_lo * _INV_SQRT2
    high = w.dec_hi * _INV_SQRT2
    details = []
    cur = x
    for level in range(1, levels + 1):
        spacing = 1 << (level - 1)
        res = _analysis2_level(cur, low, high, spacing, boundary)
        details.append((res.lh, res.hl, res.hh))
        cur = res.ll
    return MultiLevelMODWT2Result(tuple(details), cur)


def _fast2_eligible(x, levels: int, boundary: str) -> bool:
    """Route the separable pyramid through the banded-MXU-matmul composite
    path (kernels/modwt2_mxu.py) on the TPU backend; ``set_backend('jnp')``
    forces the portable per-level à trous path."""
    from ..config import get_backend
    from ..kernels.modwt_pallas import pallas_available
    from ..kernels.modwt2_mxu import modwt2_eligible

    backend = get_backend()
    if backend == "jnp":
        return False
    if backend != "pallas" and not pallas_available():
        return False
    return modwt2_eligible(x, levels, boundary)


def _inv_axis(a, d, low, high, spacing, boundary_l, w, level):
    """Per-level synthesis along the LAST axis, matching the 1-D multilevel
    conventions (adjoint indexing; symmetric uses the alignment table)."""
    if boundary_l.startswith("sym"):
        dec = _symmetric_alignment(w, level)
        tau_h = _tau_j(w.rec_lo.shape[0], level) + dec.delta_approx
        tau_g = _tau_j(w.rec_hi.shape[0], level) + dec.delta_detail
        rec_a = atrous_convolve(
            a, low, spacing=spacing, boundary="symmetric",
            sign=+1 if dec.approx_plus else -1,
            offset=-tau_h if dec.approx_plus else tau_h,
        )
        rec_d = atrous_convolve(
            d, high, spacing=spacing, boundary="symmetric",
            sign=+1 if dec.detail_plus else -1,
            offset=-tau_g if dec.detail_plus else tau_g,
        )
        return rec_a + rec_d
    rec_a = atrous_convolve(a, low, spacing=spacing, boundary=boundary_l, sign=+1)
    rec_d = atrous_convolve(d, high, spacing=spacing, boundary=boundary_l, sign=+1)
    return rec_a + rec_d


def _imodwt2_symmetric_fast(result, w):
    """Symmetric-boundary 2-D inverse through the Pallas synthesis kernel,
    one 4-plane call per level.

    Each level's separable inverse expands to
    ``W~low (x) H~low * cur + W~low (x) H~high * hl + W~high (x) H~low * lh
    + W~high (x) H~high * hh`` — exactly the synthesis kernel's per-plane
    (w_taps, h_taps) form (``pairs_override``).  The symmetric alignment's
    per-level sign/offset (:func:`_inv_axis`) folds into DENSE tap arrays:
    a read at ``t + sign*spacing*l + offset`` is a forward read at
    ``t + m`` with ``m = sign*(spacing*l - tau)``; shifting all taps by the
    global minimum ``M`` and cropping the output at ``pad_left + M`` makes
    every read forward.  Planes are reflect-padded (half-point symmetric =
    the 2N-periodic extension both ways) so the zero-boundary kernel never
    reads its zero region.  Returns None when ineligible."""
    import numpy as np

    from ..config import get_backend, get_fused_precision
    from ..kernels.modwt2_pallas import _modwt2_synthesis_call
    from ..kernels.modwt_pallas import pallas_available

    if get_backend() == "jnp":
        return None
    if get_backend() == "auto" and not pallas_available():
        return None
    approx = result.approx
    if approx.dtype != jnp.float32:
        return None
    levels = result.levels
    h, w_ = approx.shape[-2], approx.shape[-1]
    lead = approx.shape[:-2]
    low = np.asarray(w.rec_lo, np.float64) * _INV_SQRT2
    high = np.asarray(w.rec_hi, np.float64) * _INV_SQRT2

    def spec(filt, plus, tau, spacing):
        """{m: coeff} with m = sign*(spacing*l - tau)."""
        out = {}
        for l, v in enumerate(filt):
            m = (spacing * l - tau) if plus else (tau - spacing * l)
            out[m] = out.get(m, 0.0) + float(v)
        return out

    plans = []
    for level in range(levels, 0, -1):
        spacing = 1 << (level - 1)
        dec = _symmetric_alignment(w, level)
        tau_h = _tau_j(w.rec_lo.shape[0], level) + dec.delta_approx
        tau_g = _tau_j(w.rec_hi.shape[0], level) + dec.delta_detail
        a_spec = spec(low, dec.approx_plus, tau_h, spacing)
        d_spec = spec(high, dec.detail_plus, tau_g, spacing)
        m_min = min(min(a_spec), min(d_spec))
        m_max = max(max(a_spec), max(d_spec))
        span = m_max - m_min
        if span > 4 * 128:
            return None

        def dense(sp, m_min=m_min, m_max=m_max):
            arr = np.zeros(m_max - m_min + 1, np.float64)
            for m, v in sp.items():
                arr[m - m_min] = v
            return tuple(arr.tolist())

        a_t, d_t = dense(a_spec), dense(d_spec)
        pairs = ((a_t, a_t), (a_t, d_t), (d_t, a_t), (d_t, d_t))

        def pads(n):
            pl_ = max(0, -m_min)
            pr = max(0, m_max)
            pr += (-(n + pl_ + pr)) % 256
            return pl_, pr

        pl_h, pr_h = pads(h)
        pl_w, pr_w = pads(w_)
        if max(pl_h, pr_h) > h or max(pl_w, pr_w) > w_:
            return None  # jnp.pad symmetric cannot exceed the dim
        plans.append((level, pairs, m_min, pl_h, pr_h, pl_w, pr_w))

    prec = get_fused_precision()
    interp = not pallas_available()
    cur = approx.reshape((-1,) + approx.shape[-2:])
    for (level, pairs, m_min, pl_h, pr_h, pl_w, pr_w) in plans:
        lh, hl, hh = (
            p.reshape((-1,) + p.shape[-2:])
            for p in result.details[level - 1]
        )
        padded = []
        for p in (cur, hl, lh, hh):
            padded.append(jnp.pad(
                p, [(0, 0), (pl_h, pr_h), (pl_w, pr_w)], mode="symmetric"
            ))
        p4 = tuple(
            p.reshape(p.shape[0], p.shape[1], -1, 128) for p in padded
        )
        wk = p4[0].shape[2]
        hb = max(1, -(-(len(pairs[0][0]) - 1) // 128))
        wtile = (8 if hb == 1 and wk % 8 == 0 else
                 (4 if wk % 4 == 0 else (2 if wk % 2 == 0 else 1)))
        out = _modwt2_synthesis_call(
            p4, levels=1, filters=((1.0,), (1.0,)), wtile=wtile,
            periodic=False, precision=prec, interpret=interp,
            pairs_override=pairs,
        )
        r0, c0 = pl_h + m_min, pl_w + m_min
        cur = out[..., r0 : r0 + h, c0 : c0 + w_]
    return cur.reshape(lead + (h, w_))


def imodwt2_multilevel(
    result: MultiLevelMODWT2Result,
    wavelet,
    *,
    boundary: str = "periodic",
) -> jnp.ndarray:
    w = _resolve_discrete(wavelet)
    from ..kernels.modwt2_pallas import modwt2_pallas_eligible

    if boundary.lower().startswith("sym"):
        fast = _imodwt2_symmetric_fast(result, w)
        if fast is not None:
            return fast
    if modwt2_pallas_eligible(result.approx, w, result.levels, boundary):
        from ..config import get_fused_precision
        from ..kernels.modwt2_pallas import imodwt2_multilevel_pallas
        from ..kernels.modwt_pallas import pallas_available

        return imodwt2_multilevel_pallas(
            result.details, result.approx, w, boundary,
            get_fused_precision(), interpret=not pallas_available(),
        )
    if _fast2_eligible(result.approx, result.levels, boundary):
        from ..config import get_fused_precision
        from ..kernels.modwt2_mxu import imodwt2_multilevel_fast

        return imodwt2_multilevel_fast(
            result.details, result.approx, w, boundary,
            get_fused_precision(),
        )
    low = w.rec_lo * _INV_SQRT2
    high = w.rec_hi * _INV_SQRT2
    boundary_l = boundary.lower()
    cur = result.approx
    for level in range(result.levels, 0, -1):
        lh, hl, hh = result.details[level - 1]
        spacing = 1 << (level - 1)

        def inv_h(a, d):
            at = jnp.swapaxes(a, -1, -2)
            dt = jnp.swapaxes(d, -1, -2)
            return jnp.swapaxes(
                _inv_axis(at, dt, low, high, spacing, boundary_l, w, level),
                -1, -2,
            )

        col_a = inv_h(cur, hl)   # low-W bands: (low-H, high-H)
        col_d = inv_h(lh, hh)    # high-W bands
        cur = _inv_axis(col_a, col_d, low, high, spacing, boundary_l, w, level)
    return cur


class DWT2Result(NamedTuple):
    """Single-level decimated 2-D DWT: [..., H/2, W/2] subbands."""

    ll: jnp.ndarray
    lh: jnp.ndarray
    hl: jnp.ndarray
    hh: jnp.ndarray


def dwt2(x: jnp.ndarray, wavelet, *, boundary: str = "periodic") -> DWT2Result:
    """Single-level separable decimated DWT (H and W must be even)."""
    _check_2d(x, "dwt2")
    col = dwt(x, wavelet, boundary=boundary)

    def rows(v):
        r = dwt(jnp.swapaxes(v, -1, -2), wavelet, boundary=boundary)
        return (
            jnp.swapaxes(r.approx, -1, -2),
            jnp.swapaxes(r.detail, -1, -2),
        )

    a = rows(col.approx)   # (low-H, high-H) of low-W
    d = rows(col.detail)   # (low-H, high-H) of high-W
    return DWT2Result(ll=a[0], lh=d[0], hl=a[1], hh=d[1])


def idwt2(result: DWT2Result, wavelet, *, boundary: str = "periodic") -> jnp.ndarray:
    def inv_rows(a, d):
        at = jnp.swapaxes(a, -1, -2)
        dt = jnp.swapaxes(d, -1, -2)
        return jnp.swapaxes(idwt(at, dt, wavelet, boundary=boundary), -1, -2)

    col_approx = inv_rows(result.ll, result.hl)   # low-W bands: (low-H, high-H)
    col_detail = inv_rows(result.lh, result.hh)   # high-W bands
    return idwt(col_approx, col_detail, wavelet, boundary=boundary)


def wavedec2(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
):
    """J-level decimated 2-D pyramid; returns (details list, ll) with
    details[j-1] = (lh, hl, hh) at level j."""
    if levels < 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_LEVEL, f"levels must be >= 1, got {levels}"
        )
    _check_2d(x, "wavedec2")
    h_dim, w_dim = x.shape[-2], x.shape[-1]
    div = 1 << levels
    if h_dim % div or w_dim % div:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"Image dims {h_dim}x{w_dim} must be divisible by 2^levels = {div}",
            suggestions=("Reduce levels or pad the image",),
        )
    details = []
    cur = x
    for _ in range(levels):
        res = dwt2(cur, wavelet, boundary=boundary)
        details.append((res.lh, res.hl, res.hh))
        cur = res.ll
    return details, cur


def waverec2(details, ll, wavelet, *, boundary: str = "periodic") -> jnp.ndarray:
    cur = ll
    for lh, hl, hh in reversed(details):
        cur = idwt2(DWT2Result(cur, lh, hl, hh), wavelet, boundary=boundary)
    return cur


def denoise2(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int = 3,
    method: str = "universal",
    mode: str = "soft",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """2-D denoising: threshold each detail subband per level with the
    sigma-scaled rule of the 1-D engine (finest HH estimates the noise).

    Subband statistics are computed over the WHOLE [H, W] plane (flattened),
    so sigma is one estimate per image and the universal threshold uses
    N = H*W — the 2-D VisuShrink rule; the result is H/W-symmetric."""
    from ..ops.thresholds import apply_threshold, mad_sigma, select_threshold

    def _flat(b):
        return b.reshape(*b.shape[:-2], -1)

    res = modwt2_multilevel(x, wavelet, levels=levels, boundary=boundary)
    sigma = mad_sigma(_flat(res.details[0][2]))  # finest diagonal band
    new_details = []
    for level, (lh, hl, hh) in enumerate(res.details, start=1):
        level_sigma = sigma / (2.0**level)  # two 1/sqrt(2) stages per level
        bands = []
        for b in (lh, hl, hh):
            # select_threshold keeps one trailing singleton (from the
            # flattened plane); add one more to broadcast over [..., H, W]
            thr = select_threshold(_flat(b), level_sigma, method)
            bands.append(apply_threshold(b, thr[..., None], mode))
        new_details.append(tuple(bands))
    return imodwt2_multilevel(
        MultiLevelMODWT2Result(tuple(new_details), res.approx),
        wavelet,
        boundary=boundary,
    )
