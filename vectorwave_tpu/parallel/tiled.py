"""Long-signal MODWT tiled across chips with halo exchange.

This is the distributed centerpiece: the TPU-native analogue of the
reference's intra-signal parallelism — the SWT adapter's output-range
chunking (``swt/VectorWaveSwtAdapter.java:210-240``) and the streaming
kernels' left-history halos of ``L_j - 1 = (L0-1)*2^(j-1)`` samples
(``extensions/modwt/BatchSIMDMODWT.java:447-455``,
``BatchStreamingMODWT.java:13-17``).

A length-N signal is sharded along its last axis over a mesh axis; inside
``shard_map`` each level exchanges exactly the filter-support halo with its
ring neighbors via ``jax.lax.ppermute`` (ICI neighbor traffic, no
all-gather), then runs the same local à trous convolution as the
single-chip path.  PERIODIC uses the ring wrap link (global circular parity
is exact); ZERO drops the wrap link — ``ppermute`` zero-fills missing
sources, which IS the zero extension; SYMMETRIC mirrors the edge shards'
own data.  Halos wider than one shard (deep levels) are gathered hop-by-hop.

Multi-level cascades therefore match the single-device transform to
machine precision (op order inside the compiled program may differ):
config #5-style 1M-sample signals decompose across a slice with per-level
halos of (L0-1)*2^(j-1) samples — e.g. 224 samples/boundary for a 6-level
db4.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import ErrorCode, InvalidArgumentError
from ..ops.convolve import atrous_analysis_pair, atrous_convolve, effective_length
from ..transforms.modwt import _resolve_discrete
from ..transforms.multilevel import (
    MultiLevelMODWTResult,
    _check_level_fits,
    _symmetric_alignment,
    _tau_j,
)

_INV_SQRT2 = 1.0 / math.sqrt(2.0)

# One compiled program per static configuration.  Without this, every call
# re-executes the shard_map EAGERLY — per-op dispatch across all shards costs
# seconds on a virtual mesh; under jit the whole cascade is one XLA program.
from .._jitcache import BoundedCache

_PROGRAM_CACHE: BoundedCache = BoundedCache(256)


def _cached_program(key, build):
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = _PROGRAM_CACHE[key] = jax.jit(build())
    return fn


def _wavelet_key(w) -> tuple:
    return (w.name, w.dec_lo.tobytes(), w.dec_hi.tobytes(),
            w.rec_lo.tobytes(), w.rec_hi.tobytes())


def _ring_perms(axis: str, mesh: Mesh, wrap: bool):
    size = mesh.shape[axis]
    from_left = [(i, (i + 1) % size) for i in range(size)]
    from_right = [((i + 1) % size, i) for i in range(size)]
    if not wrap:
        from_left = [(a, b) for a, b in from_left if b != 0]
        from_right = [(a, b) for a, b in from_right if b != size - 1]
    return from_left, from_right


def _gather_halo(
    local: jnp.ndarray,
    halo_len: int,
    axis: str,
    perm,
    side: str,
) -> jnp.ndarray:
    """Fetch ``halo_len`` samples adjacent to this shard from ring neighbors,
    hop-by-hop for halos wider than one shard.

    For the common shallow case (halo within one shard) only the needed
    ``halo_len`` columns cross the interconnect — the traffic
    ``communication_report`` models; wide halos move whole blocks per hop
    (~the halo's own size, unavoidable)."""
    n_loc = local.shape[-1]
    if halo_len <= n_loc:
        send = local[..., -halo_len:] if side == "left" else local[..., :halo_len]
        return jax.lax.ppermute(send, axis, perm)
    hops = -(-halo_len // n_loc)
    blocks = []
    carried = local
    for _ in range(hops):
        carried = jax.lax.ppermute(carried, axis, perm)
        blocks.append(carried)
    if side == "left":
        # blocks[0] = left neighbor, blocks[1] = left-left, ...
        ext = jnp.concatenate(blocks[::-1], axis=-1)
        return ext[..., -halo_len:]
    ext = jnp.concatenate(blocks, axis=-1)
    return ext[..., :halo_len]


def _mirror_tail(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Half-point mirror of the HEAD of x, as a left extension of length
    ``length`` (global symmetric-boundary parity for the first shard)."""
    n = x.shape[-1]
    reps = -(-length // n)
    tiles = []
    flip = True
    src = x
    for _ in range(reps):
        tiles.append(jnp.flip(src, axis=-1) if flip else src)
        flip = not flip
    return jnp.concatenate(tiles[::-1], axis=-1)[..., -length:]


def _resolve_tiled_backend(backend: str, boundary_l: str) -> str:
    """'auto' routes shard-local compute through the composite MXU kernel on
    TPU for periodic/zero (the fast path — matching the reference's contract
    that the halo'd distributed blocks run the SAME fast kernel as the
    single-chip path, ``BatchSIMDMODWT.java:447-508``); symmetric and
    non-TPU backends keep the exact jnp cascade."""
    from ..kernels.modwt_pallas import pallas_available

    if backend == "auto":
        kernel_ok = boundary_l.startswith(("per", "zero"))
        return "pallas" if (kernel_ok and pallas_available()) else "jnp"
    if backend not in ("jnp", "pallas"):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG,
            f"Unknown tiled backend {backend!r}",
            suggestions=("Use 'auto', 'jnp' or 'pallas'",),
        )
    if backend == "pallas" and not boundary_l.startswith(("per", "zero")):
        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            "The tiled Pallas backend serves periodic/zero boundaries",
            suggestions=("Use backend='jnp' for symmetric tiling",),
        )
    return backend


def modwt_multilevel_tiled(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    mesh: Mesh,
    axis: str = "signal",
    boundary: str = "periodic",
    batch_axis: str | None = None,
    backend: str = "auto",
    precision: str | None = None,
) -> MultiLevelMODWTResult:
    """Multi-level MODWT of a signal sharded along its LAST axis.

    Machine-precision parity with the single-device ``modwt_multilevel``
    for every boundary mode; communication is one halo exchange per level
    over ICI.
    ``batch_axis`` optionally shards the FIRST axis over a second mesh axis
    (e.g. batch over a DCN "host" axis — see :mod:`.multihost`); halos only
    ever ``ppermute`` over ``axis``.

    ``backend='auto'`` runs shard-local compute through the composite-filter
    MXU kernel on TPU for periodic/zero: ONE cumulative halo of
    ``(L0-1)(2^J-1)`` samples is exchanged per shard (instead of one
    exchange per level) and the whole local cascade is a single
    zero-boundary kernel call fed the neighbor slab directly (the kernel's
    ``edge='external'`` DMA path), so per-chip throughput inside the
    sharded transform matches the single-chip kernel rate.  Parity with the
    single-device ``fused_analysis`` at the same ``precision`` is exact up
    to summation order.
    """
    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    n = x.shape[-1]
    size = mesh.shape[axis]
    if n % size != 0:
        raise InvalidArgumentError(
            ErrorCode.DIST_TILE_TOO_SMALL,
            f"Signal length {n} must divide evenly across {size} shards",
            suggestions=("Pad the signal to a multiple of the mesh axis size",),
        )
    _check_level_fits(w, levels, n)
    low = w.dec_lo * _INV_SQRT2
    high = w.dec_hi * _INV_SQRT2
    wrap = boundary_l.startswith("per")
    from_left, _ = _ring_perms(axis, mesh, wrap)
    resolved = _resolve_tiled_backend(backend, boundary_l)
    if resolved == "pallas":
        return _modwt_tiled_pallas(
            x, w, levels=levels, mesh=mesh, axis=axis, wrap=wrap,
            batch_axis=batch_axis, precision=precision,
        )

    def shard_fn(x_local):
        idx = jax.lax.axis_index(axis)
        if not boundary_l.startswith("sym"):
            # ONE cumulative raw-x halo of (L0-1)(2^J-1) samples, then the
            # whole local cascade zero-extended on [halo | x] — the same
            # structure as the kernel path (and the streaming carry): total
            # exchanged bytes equal the per-level halos, but J ppermute
            # sync points collapse to ceil(span/n_loc) (VERDICT r04 #5;
            # bytes/hops model in SCALING.md).  Periodic wrap and the
            # global zero edge both ride _gather_halo's hop chain.
            n_loc = x_local.shape[-1]
            span = (w.filter_length - 1) * ((1 << levels) - 1)
            halo = _gather_halo(x_local, span, axis, from_left, "left")
            cur = jnp.concatenate([halo, x_local], axis=-1)
            details = []
            for level in range(1, levels + 1):
                spacing = 1 << (level - 1)
                cur, detail = atrous_analysis_pair(
                    cur, low, high, spacing=spacing, boundary="zero"
                )
                details.append(detail[..., -n_loc:])
            return tuple(details), cur[..., -n_loc:]
        cur = x_local
        details = []
        for level in range(1, levels + 1):
            spacing = 1 << (level - 1)
            halo_len = effective_length(w.filter_length, level) - 1
            n_loc = cur.shape[-1]
            if halo_len > n_loc:
                # Deep-halo symmetric: the mirror of the global head spans
                # multiple shards, so neither shard 0's local mirror nor the
                # interior shards' zero-filled hop chains are correct.  The
                # shards are by definition narrower than the filter support
                # here, so an all_gather is cheap — run the exact
                # single-device op on the gathered signal and slice back.
                full = jax.lax.all_gather(cur, axis, axis=-1, tiled=True)
                a_full, d_full = atrous_analysis_pair(
                    full, low, high, spacing=spacing, boundary="symmetric"
                )
                start = idx * n_loc
                details.append(
                    jax.lax.dynamic_slice_in_dim(d_full, start, n_loc, axis=-1)
                )
                cur = jax.lax.dynamic_slice_in_dim(a_full, start, n_loc, axis=-1)
                continue
            halo = _gather_halo(cur, halo_len, axis, from_left, "left")
            if boundary_l.startswith("sym"):
                mirror = _mirror_tail(cur, halo_len)
                halo = jnp.where(idx == 0, mirror, halo)
            ext = jnp.concatenate([halo, cur], axis=-1)
            approx, detail = atrous_analysis_pair(
                ext, low, high, spacing=spacing, boundary="zero"
            )
            details.append(detail[..., -n_loc:])
            cur = approx[..., -n_loc:]
        return tuple(details), cur

    spec = _tile_spec(x.ndim, axis, batch_axis)
    fn = _cached_program(
        ("fwd", _wavelet_key(w), levels, mesh, axis, boundary_l, batch_axis,
         x.ndim),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(tuple(spec for _ in range(levels)), spec),
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, spec))
    details, approx = fn(x)
    return MultiLevelMODWTResult(tuple(details), approx)


def _tile_spec(ndim: int, axis: str, batch_axis: str | None) -> P:
    """PartitionSpec tiling the last axis; optionally batch over the first."""
    if batch_axis is None:
        return P(*([None] * (ndim - 1)), axis)
    if ndim < 2:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            "batch_axis sharding needs a leading batch dimension",
            suggestions=("Add a batch axis or drop batch_axis",),
        )
    return P(batch_axis, *([None] * (ndim - 2)), axis)


def _modwt_tiled_pallas(
    x: jnp.ndarray, w, *, levels: int, mesh: Mesh, axis: str, wrap: bool,
    batch_axis: str | None, precision: str | None,
) -> MultiLevelMODWTResult:
    """Shard-local analysis through the composite MXU kernel: one cumulative
    halo ppermute, then a single ``edge='external'`` kernel call."""
    from ..config import get_fused_precision
    from ..kernels.modwt_mxu import (
        _composite_halo_rows,
        run_analysis_composite,
    )
    from ..kernels.modwt_pallas import _kernel_filters, pallas_available

    prec = precision or get_fused_precision()
    interpret = not pallas_available()
    filters = _kernel_filters(w, synthesis=False)
    # Exchange the kernel's full row-quantized halo slab (a whole number of
    # 128-lane rows >= the (L0-1)(2^J-1) composite span): the slices and the
    # kernel-side padding then stay block-aligned — sub-row halo slices cost
    # more in strided DMA than the few extra columns cost on the wire.
    span = _composite_halo_rows(w.filter_length, levels) * 128
    from_left, _ = _ring_perms(axis, mesh, wrap)

    def shard_fn(x_local):
        lead = x_local.shape[:-1]
        n_loc = x_local.shape[-1]
        x2 = x_local.reshape((-1, n_loc))
        eff_span = min(span, n_loc * mesh.shape[axis])
        if eff_span <= n_loc and n_loc % 128 == 0 and eff_span % 128 == 0:
            # Slice the halo in the kernel's native [B, rows, 128] view:
            # slicing the flat [B, N] bitcast of a buffer that ALSO feeds the
            # pallas call makes XLA copy-insert the full planes (~0.1 ms per
            # 32 MB plane on chip); row-view slices alias cleanly.
            rows = x2.reshape(-1, n_loc // 128, 128)
            send = rows[:, -(eff_span // 128):, :].reshape(-1, eff_span)
            halo = jax.lax.ppermute(send, axis, from_left)
        else:
            halo = _gather_halo(x2, eff_span, axis, from_left, "left")
        outs = run_analysis_composite(
            x2, levels, filters, False, 65536, prec, interpret, halo=halo,
        )
        outs = tuple(o.reshape(lead + (n_loc,)) for o in outs)
        return outs[:levels], outs[levels]

    spec = _tile_spec(x.ndim, axis, batch_axis)
    fn = _cached_program(
        ("fwd-pallas", _wavelet_key(w), levels, mesh, axis, wrap, batch_axis,
         x.ndim, prec, interpret),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(tuple(spec for _ in range(levels)), spec),
            check_vma=False,  # pallas_call outputs carry no vma metadata
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, spec))
    details, approx = fn(x)
    return MultiLevelMODWTResult(tuple(details), approx)


def _imodwt_tiled_pallas(
    result: MultiLevelMODWTResult, w, *, mesh: Mesh, axis: str, wrap: bool,
    batch_axis: str | None, precision: str | None,
) -> jnp.ndarray:
    """Shard-local synthesis through the composite MXU kernel: one cumulative
    RIGHT halo ppermute per plane, then a single external-halo kernel call."""
    from ..config import get_fused_precision
    from ..kernels.modwt_mxu import (
        _composite_halo_rows,
        run_synthesis_composite,
    )
    from ..kernels.modwt_pallas import _kernel_filters, pallas_available

    prec = precision or get_fused_precision()
    interpret = not pallas_available()
    filters = _kernel_filters(w, synthesis=True)
    levels = result.levels
    # Full row-quantized slab, as in the forward path (block-aligned DMA).
    span = _composite_halo_rows(w.filter_length, levels) * 128
    _, from_right = _ring_perms(axis, mesh, wrap)

    def shard_fn(details, approx):
        planes = tuple(details) + (approx,)
        lead = approx.shape[:-1]
        n_loc = approx.shape[-1]
        p2 = tuple(p.reshape((-1, n_loc)) for p in planes)
        eff_span = min(span, n_loc * mesh.shape[axis])
        if eff_span <= n_loc and n_loc % 128 == 0 and eff_span % 128 == 0:
            # ONE collective for all planes, sliced in the kernel's native
            # [B, rows, 128] view — flat-view slices of pallas-call operands
            # make XLA copy-insert the full planes (see forward path).
            hr = eff_span // 128
            send = jnp.stack(
                [p.reshape(-1, n_loc // 128, 128)[:, :hr, :] for p in p2]
            ).reshape(len(p2), -1, eff_span)
            recv = jax.lax.ppermute(send, axis, from_right)
            halos = tuple(recv[i] for i in range(len(p2)))
        else:
            halos = tuple(
                _gather_halo(p, eff_span, axis, from_right, "right")
                for p in p2
            )
        out = run_synthesis_composite(
            p2, levels, filters, False, 65536, prec, interpret, halo=halos,
        )
        return out.reshape(lead + (n_loc,))

    ndim = result.approx.ndim
    spec = _tile_spec(ndim, axis, batch_axis)
    fn = _cached_program(
        ("inv-pallas", _wavelet_key(w), levels, mesh, axis, wrap, batch_axis,
         ndim, prec, interpret),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(tuple(spec for _ in range(levels)), spec),
            out_specs=spec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        ),
    )
    return fn(result.details, result.approx)


def imodwt_multilevel_tiled(
    result: MultiLevelMODWTResult,
    wavelet,
    *,
    mesh: Mesh,
    axis: str = "signal",
    boundary: str = "periodic",
    batch_axis: str | None = None,
    backend: str = "auto",
    precision: str | None = None,
) -> jnp.ndarray:
    """Inverse of :func:`modwt_multilevel_tiled`, all three boundary modes.

    PERIODIC/ZERO synthesis uses the adjoint ``(t + 2^(j-1) l)`` indexing, so
    halos come from the RIGHT ring neighbors.  SYMMETRIC's alignment-shifted
    inverse (``MultiLevelMODWTTransform.java:602-642`` semantics) reads
    ``t + sign*2^(j-1)*l + offset`` with per-level tau offsets, so it needs
    TWO-SIDED halos; the global mirror only affects the first/last shard,
    whose halos are rebuilt from their own edge data.  When a halo exceeds
    the shard width (shards narrower than the filter support) the level
    falls back to an exact all_gather — cheap by definition in that regime.
    """
    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    symmetric = boundary_l.startswith("sym")
    low = w.rec_lo * _INV_SQRT2
    high = w.rec_hi * _INV_SQRT2
    wrap = boundary_l.startswith("per")
    if _resolve_tiled_backend(backend, boundary_l) == "pallas":
        return _imodwt_tiled_pallas(
            result, w, mesh=mesh, axis=axis, wrap=wrap,
            batch_axis=batch_axis, precision=precision,
        )
    from_left, from_right = _ring_perms(axis, mesh, wrap)
    levels = result.levels
    size = mesh.shape[axis]

    def _two_sided_conv(plane, filt, spacing, sign, offset, idx):
        """One symmetric synthesis branch on a shard: gather two-sided halos,
        mirror-fix the global edges, convolve with the tau-offset indexing."""
        n_loc = plane.shape[-1]
        n_taps = filt.shape[0]
        deltas = [offset + sign * spacing * k for k in range(n_taps)]
        lh = max(0, -min(deltas))
        rh = max(0, max(deltas))
        if lh > n_loc or rh > n_loc:
            full = jax.lax.all_gather(plane, axis, axis=-1, tiled=True)
            out_full = atrous_convolve(
                full, filt, spacing=spacing, boundary="symmetric",
                sign=sign, offset=offset,
            )
            return jax.lax.dynamic_slice_in_dim(
                out_full, idx * n_loc, n_loc, axis=-1
            )
        pieces = []
        if lh:
            left = _gather_halo(plane, lh, axis, from_left, "left")
            # global head mirror: position -p-1 (p in 1..lh) -> plane[p-1]
            mirror_l = jnp.flip(plane[..., :lh], axis=-1)
            pieces.append(jnp.where(idx == 0, mirror_l, left))
        pieces.append(plane)
        if rh:
            right = _gather_halo(plane, rh, axis, from_right, "right")
            # global tail mirror: position N+q -> plane[n_loc-1-q]
            mirror_r = jnp.flip(plane[..., -rh:], axis=-1)
            pieces.append(jnp.where(idx == size - 1, mirror_r, right))
        ext = jnp.concatenate(pieces, axis=-1) if len(pieces) > 1 else plane
        out = atrous_convolve(
            ext, filt, spacing=spacing, boundary="zero", sign=sign, offset=offset
        )
        return out[..., lh : lh + n_loc]

    def shard_fn(details, approx):
        idx = jax.lax.axis_index(axis)
        cur = approx
        for level in range(levels, 0, -1):
            spacing = 1 << (level - 1)
            halo_len = effective_length(w.filter_length, level) - 1
            n_loc = cur.shape[-1]
            detail = details[level - 1]
            if symmetric:
                dec = _symmetric_alignment(w, level)
                tau_h = _tau_j(w.rec_lo.shape[0], level) + dec.delta_approx
                tau_g = _tau_j(w.rec_hi.shape[0], level) + dec.delta_detail
                rec_a = _two_sided_conv(
                    cur, low, spacing,
                    +1 if dec.approx_plus else -1,
                    -tau_h if dec.approx_plus else tau_h,
                    idx,
                )
                rec_d = _two_sided_conv(
                    detail, high, spacing,
                    +1 if dec.detail_plus else -1,
                    -tau_g if dec.detail_plus else tau_g,
                    idx,
                )
                cur = rec_a + rec_d
                continue
            cur_halo = _gather_halo(cur, halo_len, axis, from_right, "right")
            det_halo = _gather_halo(detail, halo_len, axis, from_right, "right")
            cur_ext = jnp.concatenate([cur, cur_halo], axis=-1)
            det_ext = jnp.concatenate([detail, det_halo], axis=-1)
            rec = atrous_convolve(
                cur_ext, low, spacing=spacing, boundary="zero", sign=+1
            ) + atrous_convolve(det_ext, high, spacing=spacing, boundary="zero", sign=+1)
            cur = rec[..., :n_loc]
        return cur

    ndim = result.approx.ndim
    spec = _tile_spec(ndim, axis, batch_axis)
    fn = _cached_program(
        ("inv", _wavelet_key(w), levels, mesh, axis, boundary_l, batch_axis,
         ndim),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(tuple(spec for _ in range(levels)), spec),
            out_specs=spec,
        ),
    )
    return fn(result.details, result.approx)


def tiled_roundtrip_check(
    mesh: Mesh,
    *,
    axis: str = "signal",
    wavelet: str = "db4",
    levels: int = 3,
    n: int = 1024,
    dtype=jnp.float32,
    seed: int = 0,
) -> float:
    """Round-trip a random signal through the tiled transform; returns the
    max abs error vs the input (driver/dryrun utility)."""
    import numpy as np

    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal(n), dtype=dtype
    )
    res = modwt_multilevel_tiled(
        x, wavelet, levels=levels, mesh=mesh, axis=axis, boundary="periodic"
    )
    xr = imodwt_multilevel_tiled(
        res, wavelet, mesh=mesh, axis=axis, boundary="periodic"
    )
    return float(jnp.max(jnp.abs(xr - x)))


# ---------------------------------------------------------------------------
# EXACT (<=1e-10) sharded tier: the double-float/Ozaki-sliced kernels of
# kernels/modwt_exact.py run shard-locally, with the halo exchanged over the
# ring exactly like the fast tier — the analysis halo is RAW f32 input
# (exact by construction), the synthesis halo is each plane's double-float
# (hi, lo) tail, so the sharded round trip keeps the single-chip parity
# contract (BASELINE.json's <=1e-10 gate; reference meets it in-process,
# ModwtPeriodicRoundTripTest.java:37).
# ---------------------------------------------------------------------------


def modwt_multilevel_tiled_exact(
    x: jnp.ndarray,
    wavelet,
    *,
    levels: int,
    mesh: Mesh,
    axis: str = "signal",
    boundary: str = "periodic",
    batch_axis: str | None = None,
    interpret: bool | None = None,
    profile: str = "balanced",
):
    """Sharded exact analysis: (details pairs tuple, approx pair), each
    plane a double-float ``(hi, lo)`` pair sharded like the input."""
    from ..kernels.modwt_exact import analysis_exact
    from ..kernels.modwt_mxu import _composite_halo_rows
    from ..kernels.modwt_pallas import _kernel_filters, pallas_available

    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    if not (boundary_l.startswith("per") or boundary_l.startswith("zero")):
        raise InvalidArgumentError(
            ErrorCode.CFG_UNSUPPORTED_BOUNDARY,
            "Exact tiled analysis supports periodic/zero boundaries",
        )
    wrap = boundary_l.startswith("per")
    if interpret is None:
        interpret = not pallas_available()
    filters = _kernel_filters(w, synthesis=False)
    span = _composite_halo_rows(w.filter_length, levels) * 128
    from_left, _ = _ring_perms(axis, mesh, wrap)

    def shard_fn(x_local):
        lead = x_local.shape[:-1]
        n_loc = x_local.shape[-1]
        x2 = x_local.reshape((-1, n_loc))
        n_glob = n_loc * mesh.shape[axis]
        if wrap and span >= n_glob:
            # periodic composite span >= global length: the extension
            # wraps MORE than once, which the single halo slab cannot
            # express — all_gather and run the single-device exact
            # transform (cheap by definition in that regime; mirrors
            # tiled2d's multi-wrap path)
            idx = jax.lax.axis_index(axis)
            full = jax.lax.all_gather(x2, axis, axis=-1, tiled=True)
            pairs = analysis_exact(
                full, levels, filters, True, interpret=interpret,
                profile=profile,
            )
            start = idx * n_loc

            def sl(v):
                return jax.lax.dynamic_slice_in_dim(v, start, n_loc, axis=-1)

            out = tuple(
                (sl(h).reshape(lead + (n_loc,)),
                 sl(l).reshape(lead + (n_loc,)))
                for h, l in pairs
            )
            return out[:levels], out[levels]
        eff_span = min(span, n_glob)
        if eff_span <= n_loc and n_loc % 128 == 0 and eff_span % 128 == 0:
            rows = x2.reshape(-1, n_loc // 128, 128)
            send = rows[:, -(eff_span // 128):, :].reshape(-1, eff_span)
            halo = jax.lax.ppermute(send, axis, from_left)
        else:
            halo = _gather_halo(x2, eff_span, axis, from_left, "left")
        pairs = analysis_exact(
            x2, levels, filters, False, interpret=interpret, halo=halo,
            profile=profile,
        )
        out = tuple(
            (h.reshape(lead + (n_loc,)), l.reshape(lead + (n_loc,)))
            for h, l in pairs
        )
        return out[:levels], out[levels]

    spec = _tile_spec(x.ndim, axis, batch_axis)
    pair_spec = (spec, spec)
    fn = _cached_program(
        ("fwd-exact", _wavelet_key(w), levels, mesh, axis, wrap, batch_axis,
         x.ndim, interpret, profile),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(spec,),
            out_specs=(tuple(pair_spec for _ in range(levels)), pair_spec),
            check_vma=False,
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, spec))
    return fn(x)


def imodwt_multilevel_tiled_exact(
    details,
    approx,
    wavelet,
    *,
    mesh: Mesh,
    axis: str = "signal",
    boundary: str = "periodic",
    batch_axis: str | None = None,
    interpret: bool | None = None,
    profile: str = "balanced",
):
    """Sharded exact synthesis from double-float plane pairs: returns the
    reconstructed ``(hi, lo)`` pair (combine in f64 on host to evaluate)."""
    from ..kernels.modwt_exact import synthesis_exact
    from ..kernels.modwt_mxu import _composite_halo_rows
    from ..kernels.modwt_pallas import _kernel_filters, pallas_available

    w = _resolve_discrete(wavelet)
    boundary_l = boundary.lower()
    wrap = boundary_l.startswith("per")
    if interpret is None:
        interpret = not pallas_available()
    levels = len(details)
    filters = _kernel_filters(w, synthesis=True)
    span = _composite_halo_rows(w.filter_length, levels) * 128
    _, from_right = _ring_perms(axis, mesh, wrap)

    def shard_fn(details_pairs, approx_pair):
        pairs = tuple(details_pairs) + (approx_pair,)
        lead = approx_pair[0].shape[:-1]
        n_loc = approx_pair[0].shape[-1]
        p2 = tuple(
            (h.reshape((-1, n_loc)), l.reshape((-1, n_loc))) for h, l in pairs
        )
        n_glob = n_loc * mesh.shape[axis]
        if wrap and span >= n_glob:
            # multi-wrap periodic extension — all_gather every plane pair
            # and run the single-device exact synthesis (see the analysis
            # counterpart above)
            idx = jax.lax.axis_index(axis)
            full_pairs = tuple(
                (jax.lax.all_gather(h, axis, axis=-1, tiled=True),
                 jax.lax.all_gather(l, axis, axis=-1, tiled=True))
                for h, l in p2
            )
            hi_f, lo_f = synthesis_exact(
                full_pairs, levels, filters, True, interpret=interpret,
                profile=profile,
            )
            start = idx * n_loc
            hi = jax.lax.dynamic_slice_in_dim(hi_f, start, n_loc, axis=-1)
            lo = jax.lax.dynamic_slice_in_dim(lo_f, start, n_loc, axis=-1)
            return hi.reshape(lead + (n_loc,)), lo.reshape(lead + (n_loc,))
        eff_span = min(span, n_glob)
        flat_planes = [p for pair in p2 for p in pair]
        if eff_span <= n_loc and n_loc % 128 == 0 and eff_span % 128 == 0:
            hr = eff_span // 128
            send = jnp.stack(
                [p.reshape(-1, n_loc // 128, 128)[:, :hr, :]
                 for p in flat_planes]
            ).reshape(len(flat_planes), -1, eff_span)
            recv = jax.lax.ppermute(send, axis, from_right)
            halos = tuple(
                (recv[2 * i], recv[2 * i + 1]) for i in range(len(p2))
            )
        else:
            gath = [
                _gather_halo(p, eff_span, axis, from_right, "right")
                for p in flat_planes
            ]
            halos = tuple(
                (gath[2 * i], gath[2 * i + 1]) for i in range(len(p2))
            )
        hi, lo = synthesis_exact(
            p2, levels, filters, False, interpret=interpret, halo=halos,
            profile=profile,
        )
        return hi.reshape(lead + (n_loc,)), lo.reshape(lead + (n_loc,))

    ndim = approx[0].ndim
    spec = _tile_spec(ndim, axis, batch_axis)
    pair_spec = (spec, spec)
    fn = _cached_program(
        ("inv-exact", _wavelet_key(w), levels, mesh, axis, wrap, batch_axis,
         ndim, interpret, profile),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(tuple(pair_spec for _ in range(levels)), pair_spec),
            out_specs=pair_spec,
            check_vma=False,
        ),
    )
    return fn(tuple(details), approx)
