"""On-chip: composite kernel with in-kernel halos — tile sweep + precision."""

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
    from vectorwave_tpu.kernels.modwt_pallas import _kernel_filters
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    B, N, LV = 128, 65536, 6
    w = _resolve_discrete("db4")
    fa = _kernel_filters(w, synthesis=False)
    fs_ = _kernel_filters(w, synthesis=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    def make_rt(precision):
        def rt(y):
            outs = mxu.run_analysis_composite(y, LV, fa, True, 10**9, precision, False)
            return mxu.run_synthesis_composite(outs, LV, fs_, True, 10**9, precision, False)
        return rt

    cases = [
        ("bf16_b8r64", (8, 64), "bf16"),
        ("bf16_b4r128", (4, 128), "bf16"),
        ("bf16_b1r512", (1, 512), "bf16"),
        ("b3x_b8r64", (8, 64), "bf16_3x"),
        ("f32_b8r64", (8, 64), "float32"),
        ("b3x_b4r128", (4, 128), "bf16_3x"),
    ]
    compiled = {}
    for name, (bt, tr), prec in cases:
        mxu._FORCE_B_TILE = bt
        mxu._FORCE_TILE_ROWS = tr
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        rt = make_rt(prec)
        try:
            @jax.jit
            def repeat(y, rt=rt):
                return jax.lax.fori_loop(0, iters, lambda _, z: rt(z), y)

            out = repeat(x)
            np.asarray(out[0, :8])
            rmse = float(jnp.sqrt(jnp.mean((jax.jit(rt)(x) - x) ** 2)))
            compiled[name] = (repeat, rmse)
            print(f"  compiled {time.perf_counter()-t0:.0f}s rmse {rmse:.2e}",
                  file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"  FAILED {type(exc).__name__}: {str(exc)[:250]}",
                  file=sys.stderr, flush=True)
    mxu._FORCE_B_TILE = None
    mxu._FORCE_TILE_ROWS = None

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
        rate = B * N * iters / t / 1e6
        report[name] = {
            "msamples_per_sec": round(rate, 1),
            "eff_gbps": round(rate * 1e6 * 68 / 1e9, 1),  # 68 B/sample roundtrip
            "rmse": rmse,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
