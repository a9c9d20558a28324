"""On-chip A/B: round-1 roll kernel vs round-2 MXU banded-matmul kernel.

Measures roundtrip throughput (db4 6-level, 128x65536 f32) and roundtrip RMSE
for each precision mode.  Interleaved repeats + on-device fori_loop chaining
(shared-chip timing discipline; see memory/axon-tpu-environment).
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


def main():
    cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vectorwave_tpu.kernels.modwt_pallas import (
        _kernel_filters, fused_analysis, fused_synthesis,
    )
    from vectorwave_tpu.kernels.modwt_mxu import run_analysis_mxu, run_synthesis_mxu
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    B, N, LV = 128, 65536, 6
    w = _resolve_discrete("db4")
    fa = _kernel_filters(w, synthesis=False)
    fs = _kernel_filters(w, synthesis=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    def rt_v1(y):
        details, approx = fused_analysis(y, "db4", levels=LV, boundary="periodic")
        return fused_synthesis(details, approx, "db4", boundary="periodic")

    def make_rt_mxu(precision):
        def rt(y):
            outs = run_analysis_mxu(y, LV, fa, True, 8192, precision, False)
            return run_synthesis_mxu(outs, LV, fs, True, 8192, precision, False)
        return rt

    variants = {"v1_roll": rt_v1}
    for p in ("float32", "bf16_3x", "bf16"):
        variants[f"mxu_{p}"] = make_rt_mxu(p)

    compiled = {}
    for name, fn in variants.items():
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()

        @jax.jit
        def repeat(y, fn=fn):
            return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

        try:
            out = repeat(x)
            rmse = float(jnp.sqrt(jnp.mean((jax.jit(fn)(x) - x) ** 2)))
            np.asarray(out[0, :8])
            compiled[name] = (repeat, rmse)
            print(f"  compiled in {time.perf_counter()-t0:.1f}s rmse={rmse:.3e}",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  FAILED: {type(exc).__name__}: {str(exc)[:300]}",
                  file=sys.stderr, flush=True)

    # interleaved timing, 3 rounds
    results = {name: [] for name in compiled}
    for _ in range(3):
        for name, (repeat, _) in compiled.items():
            t0 = time.perf_counter()
            out = repeat(x)
            np.asarray(out[0, :8])
            results[name].append(time.perf_counter() - t0)

    report = {}
    for name, times in results.items():
        t = float(np.median(times))
        report[name] = {
            "msamples_per_sec": round(B * N * iters / t / 1e6, 1),
            "rmse": compiled[name][1],
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
