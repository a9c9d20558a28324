"""2-D MODWT fast path: separable composite filters as banded MXU matmuls.

The separable 2-D à trous pyramid unrolls into PER-AXIS composite filters
(the same telescoping as the 1-D composite kernel, ``modwt_mxu``):

* level-j subbands are ``x *w F_j *h G_j`` where each axis filter is one of
  the 1-D cascade composites ``A_j = h_j∘...∘h_1`` / ``D_j = g_j∘A_{j-1}``
  (à trous upsampled, per-stage 1/sqrt2 scaling composed in);
* reconstruction telescopes exactly: with the 1-D operators
  ``P_j = D̃_jD_j``, ``Q_j = Ã_jA_j`` (PR: ``Q_{j-1} = Q_j + P_j``),
  ``Σ_j [Q_j⊗P_j + P_j⊗Q_j + P_j⊗P_j] + Q_J⊗Q_J = I``.

Each axis application is the banded-matmul formulation on the
``[..., R, 128]`` row view — ``out[r] = Σ_e X[r+e] @ M_e`` with 2-3 block
offsets per composite — expressed in PLAIN XLA (``jnp.roll`` handles the
periodic wrap exactly; no Pallas, because image axes are short and the
Pallas kernels' 8-row halo quantization would dominate signals of 4-16
rows).

Measured (TPU v5e, 8x2048x2048 db4 J=4): ANALYSIS alone 32 ms vs the
per-level à trous path's ~85 ms; the full ROUND TRIP through this XLA
path is ~180 ms, bound by transposes and block rolls through HBM
(tools/probe_2d_breakdown.py: one swapaxes = 3.3 ms).  Since round 4 the
hot path is the TRUE 2-D Pallas kernel (kernels/modwt2_pallas.py — both
separable passes in VMEM, 63.6 ms for the same round trip); this module
remains the portable fallback for spans > 128 / unaligned shapes and
defines the semantics the Pallas kernel is tested against.

Reference 2-D analogue: none (the reference is 1-D only); the jnp path in
``transforms/twodim.py`` defines the semantics these matmuls must match.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .modwt_mxu import _band_single, _dot, _upsample_filter

_LANES = 128


def composite_planes_split(low: np.ndarray, high: np.ndarray, levels: int):
    """([D_1..D_J], [A_1..A_J]) causal composite filters per level (the
    1-D ``composite_plane_filters`` keeps only A_J; 2-D needs every A_j)."""
    ds, as_ = [], []
    acc = np.array([1.0])
    for j in range(1, levels + 1):
        s = 1 << (j - 1)
        ds.append(np.convolve(acc, _upsample_filter(np.asarray(high), s)))
        acc = np.convolve(acc, _upsample_filter(np.asarray(low), s))
        as_.append(acc.copy())
    return ds, as_


@functools.lru_cache(maxsize=256)
def _axis_groups(plane_taps: tuple, sign: int, precision: str):
    """Banded-matmul groups for applying ``len(plane_taps)`` composite
    filters along the last axis: [(e, M[128, P*128] as jnp)] for analysis
    (sign=-1, outputs concatenated along lanes) or [(e, M[P*128, 128])] for
    synthesis (sign=+1, plane contributions summed inside the dot)."""
    bands = [
        _band_single(np.asarray(p, dtype=np.float64), sign)
        for p in plane_taps
    ]
    all_e = sorted({e for pb in bands for e in pb})
    n_planes = len(plane_taps)
    zeros = np.zeros((_LANES, _LANES))
    groups = []
    for e in all_e:
        mats = [pb.get(e, zeros) for pb in bands]
        m = np.concatenate(mats, axis=1 if sign < 0 else 0)
        # cache HOST numpy: a jnp constant built during a jit trace would
        # be a tracer and poison the lru_cache for later traces
        groups.append((e, np.asarray(m, np.float32)))
    return tuple(groups), n_planes


def _rolled(xr, e, boundary: str):
    """view[r] = X[r+e] on the row axis; periodic wrap via roll, zero
    boundary zeroes the wrapped rows."""
    if e == 0:
        return xr
    v = jnp.roll(xr, -e, axis=-2)
    if boundary == "zero":
        if e < 0:
            v = v.at[..., :(-e), :].set(0.0)
        else:
            v = v.at[..., -e:, :].set(0.0)
    return v


def _apply_axis(x, plane_taps: tuple, sign: int, boundary: str,
                precision: str):
    """Filter along the LAST axis with the composite planes.

    sign=-1 (analysis, backward reads): returns a tuple of per-plane
    arrays.  sign=+1 (synthesis, forward reads): ``x`` is a tuple of
    plane arrays; returns their summed reconstruction.
    """
    groups, n_planes = _axis_groups(plane_taps, sign, precision)
    if sign < 0:
        *lead, n = x.shape
        xr = x.reshape(*lead, n // _LANES, _LANES)
        acc = None
        for e, m in groups:
            term = _dot(
                _rolled(xr, e, boundary).reshape(-1, _LANES), m, precision
            )
            acc = term if acc is None else acc + term
        out = acc.reshape(*lead, n // _LANES, n_planes * _LANES)
        return tuple(
            out[..., :, pi * _LANES : (pi + 1) * _LANES].reshape(*lead, n)
            for pi in range(n_planes)
        )
    planes = x
    *lead, n = planes[0].shape
    cat = jnp.concatenate(
        [p.reshape(*lead, n // _LANES, _LANES) for p in planes], axis=-1
    )
    acc = None
    for e, m in groups:
        term = _dot(
            _rolled(cat, e, boundary).reshape(-1, n_planes * _LANES),
            m, precision,
        )
        acc = term if acc is None else acc + term
    return acc.reshape(*lead, n)


def _swap(a):
    return jnp.swapaxes(a, -1, -2)


def modwt2_eligible(x, levels: int, boundary: str) -> bool:
    """Serve when both axes are lane multiples, dtype is MXU-friendly and
    the boundary is periodic/zero (symmetric keeps the jnp path)."""
    b = boundary.lower()
    if not (b.startswith("per") or b.startswith("zero")):
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    h, w_ = x.shape[-2], x.shape[-1]
    return h % _LANES == 0 and w_ % _LANES == 0 and levels >= 1


def modwt2_multilevel_fast(x, w, levels: int, boundary: str,
                           precision: str):
    """J-level separable 2-D MODWT -> (details ((lh,hl,hh)...), ll_J).

    Orientation convention matches transforms/twodim.py: lh = high-W
    low-H, hl = low-W high-H, hh = high-W high-H.
    """
    b = "periodic" if boundary.lower().startswith("per") else "zero"
    inv = 1.0 / np.sqrt(2.0)
    low = np.asarray(w.dec_lo, np.float64) * inv
    high = np.asarray(w.dec_hi, np.float64) * inv
    ds, as_ = composite_planes_split(low, high, levels)
    row_planes = tuple(tuple(p.tolist()) for p in ds + as_)
    # one banded pass along W yields every D_j^w and A_j^w field
    rows = _apply_axis(x, row_planes, -1, b, precision)
    rd, ra = rows[:levels], rows[levels:]
    details = []
    ll = None
    for j in range(levels):
        pair = (tuple(ds[j].tolist()), tuple(as_[j].tolist()))
        # cols of A_j^w: (D_j^h -> hl, A_j^h -> ll at J)
        hl_t, ll_t = _apply_axis(_swap(ra[j]), pair, -1, b, precision)
        # cols of D_j^w: (D_j^h -> hh, A_j^h -> lh)
        hh_t, lh_t = _apply_axis(_swap(rd[j]), pair, -1, b, precision)
        details.append((_swap(lh_t), _swap(hl_t), _swap(hh_t)))
        if j == levels - 1:
            ll = _swap(ll_t)
    return tuple(details), ll


def imodwt2_multilevel_fast(details, approx, w, boundary: str,
                            precision: str):
    """Inverse of :func:`modwt2_multilevel_fast` (periodic/zero)."""
    b = "periodic" if boundary.lower().startswith("per") else "zero"
    levels = len(details)
    inv = 1.0 / np.sqrt(2.0)
    low = np.asarray(w.rec_lo, np.float64) * inv
    high = np.asarray(w.rec_hi, np.float64) * inv
    ds, as_ = composite_planes_split(low, high, levels)
    u_list, v_list = [], []
    for j in range(levels):
        lh, hl, hh = details[j]
        d_t = tuple(ds[j].tolist())
        a_t = tuple(as_[j].tolist())
        # U_j = D̃^h hl (+ Ã^h a at J): terms reconstructed with Ã^w_j
        if j == levels - 1:
            u_t = _apply_axis(
                (_swap(hl), _swap(approx)), (d_t, a_t), +1, b, precision
            )
        else:
            u_t = _apply_axis((_swap(hl),), (d_t,), +1, b, precision)
        # V_j = Ã^h lh + D̃^h hh: terms reconstructed with D̃^w_j
        v_t = _apply_axis((_swap(lh), _swap(hh)), (a_t, d_t), +1, b,
                          precision)
        u_list.append(_swap(u_t))
        v_list.append(_swap(v_t))
    syn_row_planes = tuple(
        tuple(p.tolist()) for p in as_ + ds
    )  # [Ã_1..Ã_J, D̃_1..D̃_J] matching (U..., V...)
    return _apply_axis(
        tuple(u_list) + tuple(v_list), syn_row_planes, +1, b, precision
    )
