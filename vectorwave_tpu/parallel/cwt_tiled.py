"""Long-signal CWT tiled across chips with support halos.

The distributed CWT of BASELINE config #5 ("CWT Morlet 64-scale on a
1M-sample signal, tiles + halo"): the signal shards along time over a mesh
axis; every shard gathers the maximum wavelet support as a halo from BOTH
ring neighbors (the CWT kernel is two-sided, unlike the causal MODWT) and
runs the standard batched-bank FFT convolution on its extended tile.  The
result equals the single-device linear-convolution CWT exactly — edge shards
see zeros beyond the signal, which IS the reference's zero-padded linear
convolution semantics (``CWTTransform.analyzeFFT``), while ``periodic``
wraps the ring.

Scale parallelism composes orthogonally: the scale axis of the bank can be
sharded over a second mesh axis by the caller (it is a plain array axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import ErrorCode, InvalidArgumentError
from ..transforms.cwt import (
    CWTResult,
    _half_support,
    _resolve_continuous,
    _sample_bank,
    validate_scales,
)
from .tiled import _cached_program, _gather_halo, _ring_perms

# device-resident (re, im) frequency banks, cached alongside the compiled
# programs so the multi-hundred-MB config-#5 bank is built and transferred once
_BANK_CACHE: dict = {}
_BANK_CACHE_MAX = 32


def _cwavelet_key(w) -> tuple:
    """Identify a continuous wavelet by its actual psi samples, not just its
    name — two custom wavelets sharing (name, fc, bw) must not share a
    cached program whose bank was baked from the other's psi."""
    probe = np.linspace(-4.0 * w.bandwidth, 4.0 * w.bandwidth, 1025)
    psi = np.asarray(w.psi(probe), dtype=np.complex128)
    return (w.name, w.center_frequency, w.bandwidth, psi.tobytes())


def _bank_device(w, wkey, scales, fft_size, real, real_dtype, mesh, spec):
    """Device-resident (re, im) conjugate frequency bank, cached.

    Host-built (numpy), split into real/imag (complex arrays cannot cross
    host<->device on some pinned-accelerator runtimes), device_put with the
    given sharding, and cached so multi-hundred-MB banks transfer once.
    Passing the bank as a RUNTIME argument also keeps it out of the jitted
    program body, where XLA constant folding would otherwise embed it as a
    giant literal (the _BAKED_BANK_MAX_FFT concern, transforms/cwt.py)."""
    key = (wkey, scales, fft_size, real, str(real_dtype), mesh, spec)
    cached = _BANK_CACHE.get(key)
    if cached is None:
        bank, _ = _sample_bank(w, scales, fft_size)
        if real:
            bank_spec_np = np.conj(np.fft.rfft(bank.real, axis=-1))
        else:
            bank_spec_np = np.conj(np.fft.fft(bank, axis=-1))
        sharding = NamedSharding(mesh, spec)
        bank_re = jax.device_put(
            np.ascontiguousarray(bank_spec_np.real, dtype=real_dtype), sharding
        )
        bank_im = jax.device_put(
            np.ascontiguousarray(bank_spec_np.imag, dtype=real_dtype), sharding
        )
        while len(_BANK_CACHE) >= _BANK_CACHE_MAX:  # FIFO eviction
            _BANK_CACHE.pop(next(iter(_BANK_CACHE)))
        cached = _BANK_CACHE[key] = (bank_re, bank_im)
    return cached


def cwt_tiled(
    x: jnp.ndarray,
    scales,
    wavelet="morl",
    *,
    mesh: Mesh,
    axis: str = "signal",
    boundary: str = "zero",
    analytic: bool = False,
) -> CWTResult:
    """CWT of a signal sharded along its LAST axis over ``mesh[axis]``.

    Exactly matches the single-device ``cwt(..., boundary=...)`` output
    (machine precision for real and complex wavelets); with ``analytic=True``
    on a REAL wavelet the Hilbert transform is computed per extended tile and
    is approximate near tile boundaries (~1e-4 relative — the Hilbert kernel
    decays only as 1/t; use a complex wavelet, e.g. ``cmor``, for exact
    distributed analytic coefficients).
    """
    w = _resolve_continuous(wavelet)
    scales = validate_scales(scales)
    n = x.shape[-1]
    size = mesh.shape[axis]
    if n % size != 0:
        raise InvalidArgumentError(
            ErrorCode.DIST_TILE_TOO_SMALL,
            f"Signal length {n} must divide evenly across {size} shards",
            suggestions=("Pad the signal to a multiple of the mesh axis size",),
        )
    halo = max(_half_support(s, w.bandwidth) for s in scales)
    local_n = n // size
    if halo > local_n * (size - 1) and size > 1:
        raise InvalidArgumentError(
            ErrorCode.DIST_TILE_TOO_SMALL,
            f"Wavelet support halo ({halo}) exceeds the reachable neighbor span",
            suggestions=("Use fewer shards or smaller maximum scale",),
        )
    wrap = boundary.lower().startswith("per")
    from_left, from_right = _ring_perms(axis, mesh, wrap)

    # Identical fft sizing to the single-device zero-boundary path applied
    # to the extended tile (what the previous inner cwt() call computed).
    from ..transforms.cwt import _next_pow2

    local_n = n // size
    ext_len = local_n + 2 * halo
    max_support = 2 * halo + 1
    fft_size = _next_pow2(ext_len + max_support - 1)
    real_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    complex_dtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    _, is_complex = _sample_bank(w, scales, 1)
    complex_out = is_complex or analytic
    wkey = _cwavelet_key(w)
    bank_re, bank_im = _bank_device(
        w, wkey, scales, fft_size, not complex_out, real_dtype, mesh, P(None, None)
    )

    def shard_fn(x_local, re_local, im_local):
        bank_local = jax.lax.complex(re_local, im_local).astype(complex_dtype)
        left = _gather_halo(x_local, halo, axis, from_left, "left") if halo else x_local[..., :0]
        right = _gather_halo(x_local, halo, axis, from_right, "right") if halo else x_local[..., :0]
        ext = jnp.concatenate([left, x_local, right], axis=-1)
        if complex_out:
            spec_x = jnp.fft.fft(ext.astype(real_dtype), n=fft_size, axis=-1)
            if analytic and not is_complex:
                freq = np.fft.fftfreq(fft_size)
                mult = np.where(freq > 0, 2.0, np.where(freq == 0, 1.0, 0.0))
                spec_x = spec_x * jnp.asarray(mult, dtype=real_dtype).astype(
                    complex_dtype
                )
            out = jnp.fft.ifft(spec_x[..., None, :] * bank_local, axis=-1)
        else:
            spec_x = jnp.fft.rfft(ext.astype(real_dtype), n=fft_size, axis=-1)
            out = jnp.fft.irfft(
                spec_x[..., None, :] * bank_local, n=fft_size, axis=-1
            ).astype(real_dtype)
        return out[..., halo : halo + x_local.shape[-1]]

    ndim = x.ndim
    in_spec = P(*([None] * (ndim - 1)), axis)
    out_spec = P(*([None] * (ndim - 1)), None, axis)  # scale axis replicated
    fn = _cached_program(
        ("cwt", wkey, scales, mesh, axis,
         boundary.lower(), analytic, ndim, n, str(x.dtype)),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(in_spec, P(None, None), P(None, None)),
            out_specs=out_spec,
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, in_spec))
    coeffs = fn(x, bank_re, bank_im)
    return CWTResult(coeffs, scales, boundary)


def cwt_tiled_2d(
    x: jnp.ndarray,
    scales,
    wavelet="morl",
    *,
    mesh: Mesh,
    signal_axis: str = "chip",
    scale_axis: str = "host",
    boundary: str = "zero",
) -> CWTResult:
    """CWT over a 2-axis mesh: scales shard over ``scale_axis``, the signal
    tiles over ``signal_axis`` with two-sided support halos.

    This is the multi-host layout for BASELINE config #5 ("CWT 64-scale on a
    1M-sample signal, tiles + halo over 2 hosts"): CWT scales are
    embarrassingly parallel (``CWTTransform.java:249-253`` runs them on a
    thread pool), so the axis crossing DCN carries the SCALE split — zero
    inter-host bytes during the transform — while the per-level halo
    exchange stays on ICI over ``signal_axis``.  See
    :func:`..multihost.make_multihost_mesh`.

    Each shard convolves its extended tile against its own rows of the
    host-precomputed frequency bank; output is sharded
    ``[scales x scale_axis, time x signal_axis]`` and matches the
    single-device ``cwt(x, scales, w, boundary=...)`` to float precision.
    """
    from ..transforms.cwt import _next_pow2

    w = _resolve_continuous(wavelet)
    scales = validate_scales(scales)
    if x.ndim != 1:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"cwt_tiled_2d expects a 1-D signal, got shape {tuple(x.shape)}",
            suggestions=("vmap over leading axes for batches",),
        )
    n = x.shape[-1]
    chips = mesh.shape[signal_axis]
    hosts = mesh.shape[scale_axis]
    if n % chips != 0:
        raise InvalidArgumentError(
            ErrorCode.DIST_TILE_TOO_SMALL,
            f"Signal length {n} must divide evenly across {chips} shards",
            suggestions=("Pad the signal to a multiple of the mesh axis size",),
        )
    if len(scales) % hosts != 0:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"{len(scales)} scales must divide evenly across {hosts} "
            f"'{scale_axis}' shards",
            suggestions=("Pad the scale list to a multiple of the host count",),
        )
    halo = max(_half_support(s, w.bandwidth) for s in scales)
    local_n = n // chips
    if halo > local_n * (chips - 1) and chips > 1:
        raise InvalidArgumentError(
            ErrorCode.DIST_TILE_TOO_SMALL,
            f"Wavelet support halo ({halo}) exceeds the reachable neighbor span",
            suggestions=("Use fewer shards or smaller maximum scale",),
        )
    wrap = boundary.lower().startswith("per")
    from_left, from_right = _ring_perms(signal_axis, mesh, wrap)

    # Host-precomputed conj frequency bank at the LOCAL tile's fft size
    # (identical math to the single-device fft path), sharded over scales.
    ext_len = local_n + 2 * halo
    max_support = 2 * halo + 1
    fft_size = _next_pow2(ext_len + max_support - 1)
    real_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    complex_dtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    _, is_complex = _sample_bank(w, scales, 1)
    wkey = _cwavelet_key(w)
    bank_re, bank_im = _bank_device(
        w, wkey, scales, fft_size, not is_complex, real_dtype, mesh,
        P(scale_axis, None),
    )

    def shard_fn(x_local, re_local, im_local):
        bank_local = jax.lax.complex(re_local, im_local).astype(complex_dtype)
        left = _gather_halo(x_local, halo, signal_axis, from_left, "left") if halo else x_local[..., :0]
        right = _gather_halo(x_local, halo, signal_axis, from_right, "right") if halo else x_local[..., :0]
        ext = jnp.concatenate([left, x_local, right], axis=-1)
        if is_complex:
            spec_x = jnp.fft.fft(ext.astype(real_dtype), n=fft_size).astype(
                complex_dtype
            )
            out = jnp.fft.ifft(spec_x[None, :] * bank_local, axis=-1)
        else:
            spec_x = jnp.fft.rfft(ext.astype(real_dtype), n=fft_size)
            out = jnp.fft.irfft(
                spec_x[None, :] * bank_local, n=fft_size, axis=-1
            ).astype(real_dtype)
        return out[..., halo : halo + x_local.shape[-1]]

    fn = _cached_program(
        ("cwt2d", wkey, scales, mesh, signal_axis, scale_axis,
         boundary.lower(), n, str(x.dtype)),
        lambda: jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(signal_axis), P(scale_axis, None), P(scale_axis, None)),
            out_specs=P(scale_axis, signal_axis),
        ),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(signal_axis)))
    return CWTResult(fn(x, bank_re, bank_im), scales, boundary)
