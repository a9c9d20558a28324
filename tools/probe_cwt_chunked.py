"""Probe: monolithic vs overlap-save chunked CWT for BASELINE config #5.

cfg5 = Morlet, 64 log scales (2..4096), N = 2^20, periodic boundary.
The monolithic path does a single 64-row 1M-point rfft/irfft pipeline;
TPUs execute few/huge FFTs poorly. Overlap-save splits the signal into
frames of F points (U useful + support-1 halo), runs batched medium FFTs
against a small cached bank, and discards the halos — identical linear
algebra, better-shaped for the chip.

Run on the real chip from a foreground shell:  python tools/probe_cwt_chunked.py

RESULT (measured, TPU v5e, 2026-08-17): NEGATIVE.  Monolithic 48.1 ms;
chunked F=2^16 48.8 ms, F=2^17..2^19 69-71 ms (rel_err ~1e-7 in all cases).
With the halo sized by the largest scale (max_half=16384) and U forced to a
power of two, every frame size carries exactly 2x byte waste, which eats the
medium-FFT shape advantage.  See probe_cwt_buckets.py for the follow-up
(scale-bucketed halos, waste 1.1x) — even more negative.  The monolithic
single-FFT path in transforms/cwt.py stays.
"""

from __future__ import annotations

import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.cwt import (
    _device_bank_spec,
    _half_support,
    _next_pow2,
    _resolve_continuous,
)

N = 1 << 20
SCALES = tuple(np.geomspace(2.0, 4096.0, 64).tolist())
W = _resolve_continuous("morl")
MAX_HALF = max(_half_support(s, W.bandwidth) for s in SCALES)


def monolithic(x):
    res = vw.cwt(x, SCALES, "morl", boundary="periodic")
    return 1e-3 * res.coeffs.sum(axis=-2).astype(x.dtype) + x


def make_chunked(frame_pow: int):
    """Overlap-save with F = 2**frame_pow, U = F - 2*MAX_HALF (rounded to
    divide N), periodic halos."""
    F = 1 << frame_pow
    support = 2 * MAX_HALF
    u_max = F - support
    if u_max <= 0:
        raise ValueError("frame too small for support")
    # pick U dividing N (N is a power of two: round U down to a power of two)
    U = 1 << (u_max.bit_length() - 1)
    U = min(U, N)
    n_frames = N // U
    # frame i covers x[i*U - MAX_HALF : i*U + U + MAX_HALF], wrapped
    idx = (np.arange(n_frames)[:, None] * U
           + np.arange(U + support)[None, :] - MAX_HALF) % N
    idx = jnp.asarray(idx, dtype=jnp.int32)
    # built under jit: this runtime cannot transfer complex constants eagerly
    bank = jax.jit(
        lambda: _device_bank_spec(W, SCALES, F, True, jnp.complex64)
    )()  # [S, F//2+1]

    def fn(x, bank=bank):
        frames = jnp.take(x, idx, axis=-1)  # [n_frames, U+support]
        spec = jnp.fft.rfft(frames, n=F, axis=-1)  # [n_frames, F//2+1]
        prod = bank[:, None, :] * spec[..., None, :, :]  # [S, n_frames, F//2+1]
        y = jnp.fft.irfft(prod, n=F, axis=-1)  # [S, n_frames, F]
        core = y[..., MAX_HALF:MAX_HALF + U]  # [S, n_frames, U]
        out = core.reshape(core.shape[:-2] + (N,))  # [S, N]
        return 1e-3 * out.sum(axis=-2).astype(x.dtype) + x

    return fn, F, U, n_frames


def measure_ms(fn, x0, iters=20, reps=3, extra=()):
    @jax.jit
    def rep1(y, *e):
        return jax.lax.fori_loop(0, 1, lambda _, z: fn(z, *e), y)

    @jax.jit
    def repN(y, *e):
        return jax.lax.fori_loop(0, iters, lambda _, z: fn(z, *e), y)

    np.asarray(rep1(x0, *extra)[:4]); np.asarray(repN(x0, *extra)[:4])
    t1s, tNs = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(rep1(x0, *extra)[:4])
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(repN(x0, *extra)[:4])
        tNs.append(time.perf_counter() - t0)
    return (np.median(tNs) - np.median(t1s)) / (iters - 1) * 1e3


def main():
    cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0].device_kind}, max_half={MAX_HALF}",
          flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    ms_mono = measure_ms(monolithic, x0)
    print(f"monolithic: {ms_mono:.3f} ms", flush=True)
    ref = np.asarray(jax.jit(monolithic)(x0))

    for frame_pow in (16, 17, 18, 19):
        if (1 << frame_pow) <= 2 * MAX_HALF:
            continue
        fn, F, U, n_frames = make_chunked(frame_pow)
        bank = fn.__defaults__[0]
        got = np.asarray(jax.jit(fn)(x0, bank))
        err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        ms = measure_ms(fn, x0, extra=(bank,))
        print(f"chunked F=2^{frame_pow} U={U} frames={n_frames}: "
              f"{ms:.3f} ms  rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
