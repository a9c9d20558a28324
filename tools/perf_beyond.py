"""On-chip latencies for the beyond-reference analysis modules (wave 1).

Measures (amortized fori chains, see bench.py's timing discipline):
  * MODWPT depth-4 roundtrip (sym8) — packets hot path
  * wavelet_variance 6-level db4 on 1M samples
  * wavelet_coherence morl 32 scales x 32768
  * extract_ridge (Viterbi scan) on a 32 x 65536 scalogram

Run from a foreground shell: python tools/perf_beyond.py
Merges its rows into BENCH_BEYOND.json (tools/perf_beyond2.py contributes
the second wave); bench_full.py renders PERF.md's beyond-reference table
from that artifact.
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


def _measure(fn, x, iters=150, reps=3):
    @jax.jit
    def repeat(y):
        return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

    np.asarray(repeat(x).ravel()[:4])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(repeat(x).ravel()[:4])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters * 1e3  # ms


def main() -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorwave_tpu_jax"),
    )
    import vectorwave_tpu as vw
    from vectorwave_tpu.transforms.cwt import cwt, scales_log
    from vectorwave_tpu.transforms.packets import imodwpt, modwpt

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    out: dict[str, float] = {"device": dev.device_kind}

    # 1. MODWPT depth-4 roundtrip, batch 8 x 16384
    x1 = jnp.asarray(rng.standard_normal((8, 16384)), jnp.float32)
    t = _measure(lambda z: imodwpt(modwpt(z, "sym8", 4), "sym8"), x1)
    out["modwpt4_roundtrip_8x16384_ms"] = round(t, 3)
    out["modwpt4_msamples_per_s"] = round(8 * 16384 / (t / 1e3) / 1e6, 1)
    # production-batch rate (tile-saturated; the 8x16K row is latency-class)
    x1b = jnp.asarray(rng.standard_normal((64, 16384)), jnp.float32)
    tb = _measure(lambda z: imodwpt(modwpt(z, "sym8", 4), "sym8"), x1b,
                  iters=100)
    out["modwpt4_roundtrip_64x16384_ms"] = round(tb, 3)
    out["modwpt4_msamples_per_s_64"] = round(64 * 16384 / (tb / 1e3) / 1e6, 1)
    # fast tier: the composed tree is BLOCK-MINIMAL (2 band blocks/node is
    # the floor), so its bf16_3x MXU ceiling is ~1.7 Gs/s for sym8 d4
    # (124 blocks/sample x 3 passes); 1-pass bf16 is the throughput lever
    vw.set_fused_precision("bf16")
    try:
        tf = _measure(lambda z: imodwpt(modwpt(z, "sym8", 4), "sym8"), x1b,
                      iters=100)
    finally:
        vw.set_fused_precision("bf16_3x")
    out["modwpt4_roundtrip_64x16384_bf16_ms"] = round(tf, 3)
    out["modwpt4_msamples_per_s_64_bf16"] = round(
        64 * 16384 / (tf / 1e3) / 1e6, 1
    )

    # 2. wavelet variance, 1M samples, 6 levels
    x2 = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)

    def var_chain(z):
        r = vw.wavelet_variance(z, "db4", 6)
        return z + 1e-20 * r.variance.sum()

    out["wavelet_variance_1M_6lvl_ms"] = round(_measure(var_chain, x2, iters=100), 3)

    # 3. coherence, 32 scales x 32768
    n3 = 32768
    x3 = jnp.asarray(rng.standard_normal(n3), jnp.float32)
    y3 = jnp.asarray(rng.standard_normal(n3), jnp.float32)
    scales = scales_log(2, 256, 32)

    def coh_chain(z):
        c = vw.wavelet_coherence(z, y3, scales, "morl")
        return z + 1e-20 * c.coherence.mean(axis=-2)

    out["coherence_32sc_32768_ms"] = round(_measure(coh_chain, x3, iters=100), 3)

    # 4. Viterbi ridge on a 32 x 65536 scalogram (carry the real magnitude —
    # complex buffers cannot cross the axon host boundary, and ridge
    # extraction only consumes |W| anyway)
    x4 = jnp.asarray(rng.standard_normal(65536), jnp.float32)
    mag4 = jax.jit(
        lambda z: jnp.abs(cwt(z, scales, "morl", analytic=True).coeffs)
    )(x4)

    def ridge_chain(p):
        ridge = vw.extract_ridge(vw.CWTResult(p, scales, "zero"), smoothness=2.0)
        return p + (1e-20 * ridge.amplitude)[..., None, :]

    out["ridge_32sc_65536_ms"] = round(_measure(ridge_chain, mag4, iters=100), 3)

    from _beyond_common import merge_rows

    merge_rows(
        [
            {"name": "MODWPT depth-4 roundtrip, 8x16384 sym8",
             "ms": out["modwpt4_roundtrip_8x16384_ms"],
             "note": f"{out['modwpt4_msamples_per_s']:.0f} Msamples/s "
                     "(latency-class shape); 64x16K batch: "
                     f"{out['modwpt4_msamples_per_s_64']:.0f} Ms/s "
                     "(bf16 fast tier: "
                     f"{out['modwpt4_msamples_per_s_64_bf16']:.0f} Ms/s; "
                     "the composed tree is block-minimal — 124 band "
                     "blocks/sample caps sym8-d4 bf16_3x at ~1.7 Gs/s)"},
            {"name": "wavelet_variance 1M samples, 6-level db4 + CIs",
             "ms": out["wavelet_variance_1M_6lvl_ms"], "note": ""},
            {"name": "wavelet_coherence morl 32 scales x 32768",
             "ms": out["coherence_32sc_32768_ms"],
             "note": "two CWTs + 3 smoothing fields"},
            {"name": "extract_ridge (Viterbi) 32 scales x 65536",
             "ms": out["ridge_32sc_65536_ms"],
             "note": "blocked max-plus DP; the naive scan takes 258 ms (44x)"},
        ],
        str(dev.device_kind),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
