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

from typing import NamedTuple

import jax.numpy as jnp

from ..errors import ErrorCode, InvalidArgumentError, InvalidSignalError
from ..ops.dwt import dwt, idwt
from .modwt import MODWTResult, _resolve_discrete, imodwt, modwt


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


def modwt2_multilevel(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    boundary: str = "periodic",
) -> MultiLevelMODWT2Result:
    """J-level separable 2-D MODWT: recurse on the LL band.

    Note: levels cascade by re-applying the level-1 transform to LL (the
    standard undecimated pyramid via recursion, not à trous spacing — each
    level's filters see the already-smoothed LL, so level j's effective
    scale is 2^j in both axes).
    """
    if levels < 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_LEVEL, f"levels must be >= 1, got {levels}"
        )
    details = []
    cur = x
    for _ in range(levels):
        res = modwt2(cur, wavelet, boundary=boundary)
        details.append((res.lh, res.hl, res.hh))
        cur = res.ll
    return MultiLevelMODWT2Result(tuple(details), cur)


def imodwt2_multilevel(
    result: MultiLevelMODWT2Result,
    wavelet,
    *,
    boundary: str = "periodic",
) -> jnp.ndarray:
    cur = result.approx
    for lh, hl, hh in reversed(result.details):
        cur = imodwt2(MODWT2Result(cur, lh, hl, hh), wavelet, boundary=boundary)
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
