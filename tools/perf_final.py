"""Calibrated on-chip measurements: amortize the ~27 ms tunnel dispatch cost.

Round-1/2 probes timed `repeat()` calls with iters=10-20; the axon runtime
adds a fixed ~27 ms per dispatch, which inflated every number 2-9x.  Here:
iters=150 (overhead < 2%) + explicit overhead estimation via a 1-iter vs
301-iter pair on the same computation.
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


def chain(fn, x0, iters):
    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, iters, lambda _, v: fn(v), a)

    return run


def measure(fn, x0, readback, iters=150, reps=3):
    run = chain(fn, x0, iters)
    out = run(x0)
    readback(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0)
        readback(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def measure_pair(fn, x0, readback, lo=1, hi=301, reps=3):
    """(per-iter seconds, fixed overhead seconds) via two chain lengths."""
    r_lo, r_hi = chain(fn, x0, lo), chain(fn, x0, hi)
    readback(r_lo(x0)), readback(r_hi(x0))
    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); readback(r_lo(x0)); t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); readback(r_hi(x0)); t_hi.append(time.perf_counter() - t0)
    t_lo, t_hi = float(np.median(t_lo)), float(np.median(t_hi))
    per_iter = (t_hi - t_lo) / (hi - lo)
    return per_iter, t_lo - per_iter * lo


def main():
    cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vectorwave_tpu.kernels import modwt_mxu as mxu
    from vectorwave_tpu.kernels.modwt_pallas import (
        _kernel_filters, fused_analysis, fused_synthesis,
    )
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    report = {}

    # 1) true HBM bandwidth
    n = 64 * 1024 * 1024  # 256 MB
    big = jnp.ones((n,), jnp.float32)
    per_iter, overhead = measure_pair(
        lambda v: v * 1.0000001, big, lambda o: np.asarray(o[:4]), lo=1, hi=101
    )
    report["hbm_gbps"] = round(2 * n * 4 / per_iter / 1e9, 1)
    report["dispatch_overhead_ms"] = round(overhead * 1e3, 1)

    # 2) kernels at the flagship config
    B, N, LV = 128, 65536, 6
    w = _resolve_discrete("db4")
    fa = _kernel_filters(w, False)
    fs_ = _kernel_filters(w, True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, N)), jnp.float32)
    rb = lambda o: np.asarray(o[0, :8])

    def rt_v1(y):
        d, a = fused_analysis(y, "db4", levels=LV, boundary="periodic")
        return fused_synthesis(d, a, "db4", boundary="periodic")

    def make_comp(precision):
        def rt(y):
            outs = mxu.run_analysis_composite(y, LV, fa, True, 10**9, precision, False)
            return mxu.run_synthesis_composite(outs, LV, fs_, True, 10**9, precision, False)
        return rt

    mxu._FORCE_B_TILE, mxu._FORCE_TILE_ROWS = 1, 512
    for name, fn in {
        "v1_roll": rt_v1,
        "comp_bf16": make_comp("bf16"),
        "comp_bf16_3x": make_comp("bf16_3x"),
        "comp_float32": make_comp("float32"),
    }.items():
        try:
            t = measure(fn, x, rb)
            rmse = float(jnp.sqrt(jnp.mean((jax.jit(fn)(x) - x) ** 2)))
            report[name] = {
                "msamples_per_sec": round(B * N / t / 1e6, 1),
                "eff_gbps": round(B * N * 68 / t / 1e9, 1),
                "rmse": rmse,
            }
            print(name, report[name], file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  file=sys.stderr, flush=True)
    mxu._FORCE_B_TILE = None
    mxu._FORCE_TILE_ROWS = None
    roofline = report["hbm_gbps"] / 68 * 1e3  # Msamples/s at 68 B/sample
    report["roofline_msamples"] = round(roofline, 1)
    for k in ("v1_roll", "comp_bf16", "comp_bf16_3x", "comp_float32"):
        if k in report:
            report[k]["pct_roofline"] = round(
                100 * report[k]["msamples_per_sec"] / roofline, 1
            )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
