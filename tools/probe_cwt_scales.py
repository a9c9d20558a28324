"""CWT efficiency bound via a scale-count sweep (VERDICT r03 item 9).

Isolated rfft/irfft graphs hit axon-backend UNIMPLEMENTED quirks
(tools/probe_cwt_roofline.py), so the bound is derived through the public
path itself: cfg5's per-scale cost is the slope of latency vs scale count
(periodic boundary keeps fft_size = n, so every scale costs one identical
[n]-point complex pointwise + irfft).  The slope IS the XLA-FFT cost this
engine cannot go below; the intercept is everything else (one rfft +
coefficient assembly + dispatch).  Run: python -u tools/probe_cwt_scales.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.makedirs(os.path.expanduser("~/.cache/vectorwave_tpu_jax"), exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vectorwave_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw

N = 1 << 20
ALL_SCALES = np.geomspace(2.0, 4096.0, 64)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N), jnp.float32)

results = {}
for nsc in (16, 32, 64):
    sc = tuple(ALL_SCALES[:nsc].tolist())

    def fn(z):
        res = vw.cwt(z, sc, "morl", boundary="periodic")
        return 1e-3 * res.coeffs.sum(axis=-2).real.astype(z.dtype) + z

    iters = 20

    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    np.asarray(chain(x)[:2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[:2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    results[nsc] = ms
    print(f"cwt morl {nsc} scales 1M: {ms:.3f} ms", flush=True)

xs = np.asarray(sorted(results))
ys = np.asarray([results[k] for k in xs])
slope, intercept = np.polyfit(xs, ys, 1)
per_scale_us = slope * 1e3
pct_fft = 100 * slope * 64 / results[64]
print(f"per-scale cost {per_scale_us:.1f} us; intercept {intercept:.2f} ms; "
      f"{pct_fft:.1f}% of cfg5 scales with the per-scale irfft work",
      flush=True)
# HBM floor of the per-scale traffic (read c64 spectrum, write r32 field)
try:
    with open("/root/repo/BENCH_LATEST.json") as f:
        bw = json.load(f).get("measured_hbm_gbps", 850.0)
except Exception:
    bw = 850.0
floor_us = ((N // 2 + 1) * 8 + N * 4) / (bw * 1e9) * 1e6
print(json.dumps({
    "per_scale_us": round(per_scale_us, 2),
    "intercept_ms": round(intercept, 3),
    "pct_linear_in_scales": round(pct_fft, 1),
    "per_scale_hbm_floor_us": round(floor_us, 2),
    "xla_fft_vs_hbm_floor_x": round(per_scale_us / floor_us, 1),
}), flush=True)
