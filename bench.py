"""Benchmark: db4 6-level MODWT analysis+synthesis throughput (Msamples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baseline (BASELINE.md): the reference's SIMD extensions do a 16K MODWT
round-trip in 0.76 ms ~= 21.5 Msamples/s on a 24-core AVX-512 CPU; the scalar
core does ~5.8 Msamples/s.  vs_baseline is measured against the SIMD figure.
Config #2 of BASELINE.json: db4, 6 levels, 65536 samples, PERIODIC.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw

BASELINE_MSAMPLES_PER_SEC = 21.5  # reference SIMD ext, 16K round-trip (README.md:329)

WAVELET = "db4"
LEVELS = 6
N = 65536
BATCH = 128


def _roundtrip(x):
    res = vw.modwt_multilevel(x, WAVELET, levels=LEVELS, boundary="periodic")
    return vw.imodwt_multilevel(res, WAVELET, boundary="periodic")


def main() -> None:
    import os

    cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    device = jax.devices()[0]
    on_tpu = device.platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, N)), dtype=dtype)

    import sys

    print(f"bench: compiling on {device.device_kind} ...", file=sys.stderr, flush=True)
    fn = jax.jit(_roundtrip)
    xr = fn(x)
    xr.block_until_ready()  # compile + warm-up
    print("bench: compiled; timing ...", file=sys.stderr, flush=True)

    # Accuracy check on the same config (round-trip RMSE)
    rmse = float(jnp.sqrt(jnp.mean((x - xr) ** 2)))

    # Timed runs: iterate ON-DEVICE inside one jit (fori_loop carries the
    # output back as input), so a single dispatch covers all iterations and
    # the measurement is immune to async-dispatch / remote-runtime quirks.
    n_iters = 20

    @jax.jit
    def repeat(x):
        return jax.lax.fori_loop(0, n_iters, lambda _, y: _roundtrip(y), x)

    warm = repeat(x)
    np.asarray(warm[0, :8])  # compile + warm-up + readback path
    start = time.perf_counter()
    out = repeat(x)
    np.asarray(out[0, :8])
    elapsed = time.perf_counter() - start

    samples = BATCH * N * n_iters
    msamples_per_sec = samples / elapsed / 1e6

    result = {
        "metric": "modwt_db4_6level_roundtrip_throughput",
        "value": round(msamples_per_sec, 3),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(msamples_per_sec / BASELINE_MSAMPLES_PER_SEC, 3),
        "roundtrip_rmse": rmse,
        "config": f"{WAVELET} {LEVELS}-level {BATCH}x{N} {str(dtype.dtype)} on {device.device_kind}",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
