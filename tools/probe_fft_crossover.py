"""Measure the roll-unroll vs FFT crossover for MODWT on chip.

The reference routes periodic MODWT convolutions to FFT when
N>=1024 && L > N/8 (FftHeuristics.java:30-34) — which for base filters is
unsatisfiable (L <= 62 implies N <= 496).  On TPU the à trous roll form
never touches inserted zeros, so the only question is the BASE tap count at
which the rfft/irfft pipeline beats L rolled FMAs.  This probe times both
forms for synthetic filters of increasing length and prints the crossover.
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
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vectorwave_tpu.ops.convolve import atrous_analysis_pair, fft_analysis_pair

    B, N = 16, 65536
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 30
    report = {}
    for taps in (8, 16, 24, 32, 48, 62):
        f = rng.standard_normal(taps)
        f = f / np.sqrt((f**2).sum())
        low = f.copy()
        high = f[::-1].copy()

        def roll_form(y, low=low, high=high):
            a, d = atrous_analysis_pair(y, low, high, spacing=1, boundary="periodic")
            return a + 0.001 * d

        def fft_form(y, low=low, high=high):
            a, d = fft_analysis_pair(y, low, high, spacing=1)
            return a + 0.001 * d

        row = {}
        for name, fn in (("roll", roll_form), ("fft", fft_form)):
            @jax.jit
            def repeat(y, fn=fn):
                return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

            out = repeat(x)
            np.asarray(out[0, :4])
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = repeat(x)
                np.asarray(out[0, :4])
                times.append(time.perf_counter() - t0)
            t = float(np.median(times))
            row[name] = round(B * N * iters / t / 1e6, 1)
        row["fft_wins"] = row["fft"] > row["roll"]
        report[taps] = row
        print(f"taps={taps}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
