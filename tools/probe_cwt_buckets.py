"""Probe: scale-BUCKETED overlap-save CWT for BASELINE config #5.

probe_cwt_chunked showed flat chunking ties monolithic (48 ms) while doing
2x the bytes (U forced to a power of two, halo sized by the LARGEST scale)
— i.e. medium batched FFTs are ~2x more byte-efficient than one 1M FFT.
This probe groups scales into buckets by their own support, gives each
bucket a frame size with small relative waste (U = F - support, tail
padded), and concatenates the per-bucket outputs.

Run on the real chip from a foreground shell: python tools/probe_cwt_buckets.py

RESULT (measured, TPU v5e, 2026-08-17): strongly NEGATIVE.  Monolithic
48.1 ms; bucketed 131-151 ms despite 1.12-1.34x waste (vs the flat probe's
2x).  The hypothesis that medium batched FFTs are ~2x more byte-efficient
than one 1M-point FFT was wrong: the flat F=2^16 tie came out of the frame
gather being cheap at one big contiguous-ish take, while 12 per-bucket
gathers + 12 separate rfft/irfft pipelines + concatenate fragment the
program and lose all fusion.  TPU XLA's monolithic batched FFT is the right
shape for config #5; transforms/cwt.py keeps the single-FFT design.
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
    _resolve_continuous,
)

N = 1 << 20
SCALES = tuple(np.geomspace(2.0, 4096.0, 64).tolist())
W = _resolve_continuous("morl")


def monolithic(x):
    res = vw.cwt(x, SCALES, "morl", boundary="periodic")
    return 1e-3 * res.coeffs.sum(axis=-2).astype(x.dtype) + x


def make_bucketed(frame_pow_for_support):
    """frame_pow_for_support(support) -> frame_pow; groups scales whose
    (frame_pow, support_bucket) agree."""
    buckets = {}
    for s in SCALES:
        half = _half_support(s, W.bandwidth)
        # round the halo up to a power of two so buckets stay coarse
        halo = 1 << (half - 1).bit_length()
        fp = frame_pow_for_support(2 * halo)
        buckets.setdefault((fp, halo), []).append(s)

    plans = []
    for (fp, halo), scales in sorted(buckets.items()):
        F = 1 << fp
        support = 2 * halo
        U = F - support
        assert U > 0
        n_frames = -(-N // U)  # ceil
        idx = (np.arange(n_frames)[:, None] * U
               + np.arange(F)[None, :] - halo) % N
        plans.append(dict(
            scales=tuple(scales), F=F, halo=halo, U=U, n_frames=n_frames,
            idx=jnp.asarray(idx, dtype=jnp.int32),
        ))

    banks = jax.jit(lambda: tuple(
        _device_bank_spec(W, p["scales"], p["F"], True, jnp.complex64)
        for p in plans
    ))()

    def fn(x, banks=banks):
        outs = []
        for p, bank in zip(plans, banks):
            frames = jnp.take(x, p["idx"], axis=-1)  # [n_frames, F]
            spec = jnp.fft.rfft(frames, axis=-1)
            prod = bank[:, None, :] * spec[..., None, :, :]
            y = jnp.fft.irfft(prod, n=p["F"], axis=-1)
            core = y[..., p["halo"]:p["halo"] + p["U"]]
            flat = core.reshape(core.shape[:-2] + (p["n_frames"] * p["U"],))
            outs.append(flat[..., :N])
        out = jnp.concatenate(outs, axis=-2) if len(outs) > 1 else outs[0]
        return 1e-3 * out.sum(axis=-2).astype(x.dtype) + x

    waste = sum(
        len(p["scales"]) * p["n_frames"] * p["F"] for p in plans
    ) / (len(SCALES) * N)
    return fn, banks, plans, waste


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
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)

    ms_mono = measure_ms(monolithic, x0)
    print(f"monolithic: {ms_mono:.3f} ms", flush=True)
    ref = np.asarray(jax.jit(monolithic)(x0))

    policies = {
        # frame = 8x support (waste 1.14x)
        "8x-support": lambda sup: min(20, (8 * sup - 1).bit_length()),
        # frame = 16x support, floor 2^13 (waste 1.07x)
        "16x-support-min13": lambda sup: min(
            20, max(13, (16 * sup - 1).bit_length())),
        # frame = 4x support (waste 1.33x, smaller FFTs)
        "4x-support": lambda sup: min(19, (4 * sup - 1).bit_length()),
    }
    for name, pol in policies.items():
        fn, banks, plans, waste = make_bucketed(pol)
        shapes = [(len(p["scales"]), p["n_frames"], p["F"]) for p in plans]
        got = np.asarray(jax.jit(fn)(x0, banks))
        err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
        ms = measure_ms(fn, x0, extra=(banks,))
        print(f"bucketed[{name}] waste={waste:.2f}x shapes={shapes}: "
              f"{ms:.3f} ms  rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
