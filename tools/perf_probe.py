"""On-chip perf probes: measured HBM bandwidth + current kernel throughput.

Establishes the *measured* roofline for BENCH reporting (VERDICT round-1 asked
for profiler/probe evidence rather than the paper 819 GB/s number).

Run in the foreground shell (axon tunnel quirk: background tasks lose the
PALLAS_AXON_* env).  All timing is on-device fori_loop chaining to dodge the
~1.3 s/dispatch tunnel cost and shared-chip noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def setup_cache():
    cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_loop(fn, x, iters, readback=lambda out: np.asarray(out[0, :8])):
    """Median-of-3 on-device chained timing."""

    @jax.jit
    def repeat(x):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), x)

    out = repeat(x)
    readback(out)  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = repeat(x)
        readback(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def probe_hbm_bw():
    """Sustained HBM read+write bandwidth: y = x * 1.0000001 on a 512 MB array."""
    n = 128 * 1024 * 1024  # 512 MB f32
    x = jnp.ones((n,), jnp.float32)
    iters = 20
    t = time_loop(lambda y: y * 1.0000001, x, iters, readback=lambda o: np.asarray(o[:8]))
    bytes_moved = 2 * n * 4 * iters  # read + write
    return bytes_moved / t / 1e9


def probe_current_kernel():
    import vectorwave_tpu as vw

    B, N, LV = 128, 65536, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    def roundtrip(y):
        res = vw.modwt_multilevel(y, "db4", levels=LV, boundary="periodic")
        return vw.imodwt_multilevel(res, "db4", boundary="periodic")

    t = time_loop(roundtrip, x, iters)
    return B * N * iters / t / 1e6


def probe_jnp_tier():
    import vectorwave_tpu as vw

    B, N, LV = 128, 65536, 6
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    def roundtrip(y):
        res = vw.modwt_multilevel(y, "db4", levels=LV, boundary="periodic", backend="jnp")
        return vw.imodwt_multilevel(res, "db4", boundary="periodic", backend="jnp")

    t = time_loop(roundtrip, x, iters)
    return B * N * iters / t / 1e6


def main():
    setup_cache()
    dev = jax.devices()[0]
    out = {"device": dev.device_kind}
    out["hbm_gbps"] = round(probe_hbm_bw(), 1)
    out["pallas_roundtrip_msamp"] = round(probe_current_kernel(), 1)
    out["jnp_roundtrip_msamp"] = round(probe_jnp_tier(), 1)
    # memory roofline for the fused round trip: 8 planes read + 8 written
    # (x in, 7 coeff planes out; 7+1 read, 1 out) = 64 B/sample
    out["roofline_msamp_64B"] = round(out["hbm_gbps"] * 1e9 / 64 / 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
