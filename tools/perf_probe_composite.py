"""On-chip A/B: composite-filter MXU kernel vs cascade MXU vs v1 roll kernel."""

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
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vectorwave_tpu.kernels import modwt_mxu as mxu
    from vectorwave_tpu.kernels.modwt_pallas import (
        _kernel_filters, fused_analysis, fused_synthesis,
    )
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    B, N, LV = 128, 65536, 6
    w = _resolve_discrete("db4")
    fa = _kernel_filters(w, synthesis=False)
    fs_ = _kernel_filters(w, synthesis=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    def rt_v1(y):
        details, approx = fused_analysis(y, "db4", levels=LV, boundary="periodic")
        return fused_synthesis(details, approx, "db4", boundary="periodic")

    def make_comp(precision):
        def rt(y):
            outs = mxu.run_analysis_composite(y, LV, fa, True, 10**9, precision, False)
            return mxu.run_synthesis_composite(outs, LV, fs_, True, 10**9, precision, False)
        return rt

    variants = {"v1_roll": rt_v1}
    for p in ("bf16", "bf16_3x", "float32"):
        variants[f"comp_{p}"] = make_comp(p)

    compiled = {}
    for name, fn in variants.items():
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        try:
            @jax.jit
            def repeat(y, fn=fn):
                return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

            out = repeat(x)
            np.asarray(out[0, :8])
            rmse = float(jnp.sqrt(jnp.mean((jax.jit(fn)(x) - x) ** 2)))
            compiled[name] = (repeat, rmse)
            print(f"  compiled {time.perf_counter()-t0:.0f}s rmse {rmse:.2e}",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  FAILED {type(exc).__name__}: {str(exc)[:250]}",
                  file=sys.stderr, flush=True)

    results = {name: [] for name in compiled}
    for _ in range(3):
        for name, (repeat, _) in compiled.items():
            t0 = time.perf_counter()
            out = repeat(x)
            np.asarray(out[0, :8])
            results[name].append(time.perf_counter() - t0)
    report = {}
    for name, (repeat, rmse) in compiled.items():
        t = float(np.median(results[name]))
        report[name] = {
            "msamples_per_sec": round(B * N * iters / t / 1e6, 1),
            "rmse": rmse,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
