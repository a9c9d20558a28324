"""A/B a merged-contraction bf16_3x dot against the 3-dot form.

Hypothesis tested: the default-precision kernel (bf16_3x, three K=128 MXU
dots per group) loses to per-dot fill/drain, so one K=384 dot carrying the
same MACs ([a_hi | a_hi | a_lo] @ [m_hi; m_lo; m_hi]) should be faster.

RESULT (2026-08-17, v5e, db4 6-level 128x65536 roundtrip):
    bf16_3x   4177 Msamples/s   rmse 6.77e-06
    bf16_3xk  4217 Msamples/s   rmse 6.77e-06   (+1.0% — noise level)

Conclusion: per-dot overhead is negligible; bf16_3x is MAC-bound at the
~130-TFLOP effective ceiling for these shapes.  The merged variant was NOT
kept in the kernel (same numerics, no measurable win, extra code path); the
experiment patch added a '_dot_k3' branch to modwt_mxu's composite kernels
that concatenated the hi/hi/lo views and used host-pre-split bf16 band
constants.  Running this probe against the clean tree times the bf16_3x arm
only and skips the merged arm.

Run from a foreground shell (TPU tunnel)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vectorwave_tpu.kernels import modwt_mxu as mk
from vectorwave_tpu.wavelets.registry import as_wavelet

BATCH, N, LEVELS, ITERS = 128, 65536, 6, 150
TILE = 512 * 128


def main():
    w = as_wavelet("db4")
    s = np.sqrt(2.0)
    filters = (
        tuple(np.asarray(w.dec_lo) / s),
        tuple(np.asarray(w.dec_hi) / s),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, N)), dtype=jnp.float32)

    for precision in ("bf16_3x", "bf16_3xk"):
        if precision == "bf16_3xk" and "_dot_k3" not in dir(mk):
            print("bf16_3xk   (skipped: merged-dot experiment patch not applied)")
            continue

        def rt(y):
            outs = mk.run_analysis_composite(
                y, LEVELS, filters, True, TILE, precision, False
            )
            return mk.run_synthesis_composite(
                outs, LEVELS, filters, True, TILE, precision, False
            )

        @jax.jit
        def chain(y):
            return jax.lax.fori_loop(0, ITERS, lambda _, z: rt(z), y)

        out = chain(x)
        np.asarray(out[0, :8])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(x)
            np.asarray(out[0, :8])
            times.append(time.perf_counter() - t0)
        per = float(np.median(times)) / ITERS
        ms = BATCH * N / per / 1e6
        rmse = float(jnp.sqrt(jnp.mean((jax.jit(rt)(x) - x) ** 2)))
        print(f"{precision:10s}  {ms:8.0f} Msamples/s  rmse {rmse:.2e}")


if __name__ == "__main__":
    main()
