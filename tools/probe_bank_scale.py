"""Scale dependence of the whole-tree bank-kernel tiers (MODWPT / DTCWT).

The BENCH_BEYOND rows pin tiny shapes (8x16K = 131K samples), where the
~0.1-0.2 ms per-dispatch floor of this tunneled runtime dominates: the
rows measure LATENCY, not the tier's rate class.  This probe measures the
same roundtrips at production batch sizes so PERF.md can state both.
iters=100: at iters<=20 the ~12 ms fixed readback overhead biased large
shapes up to 2.4 ms/iter low (see tools/probe_sigma_ladder.py).
Run: python -u tools/probe_bank_scale.py
"""
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
from vectorwave_tpu.transforms.packets import imodwpt, modwpt


def measure(label, fn, x, iters=100):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    try:
        np.asarray(chain(x)[0, :2])
    except Exception as exc:  # noqa: BLE001
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:140]}",
              flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    n = x.size
    print(f"{label}: {ms:.3f} ms  {n/ms/1e3:.0f} Ms/s", flush=True)


def wpt_rt(z):
    return imodwpt(modwpt(z, "sym8", 4), "sym8")


def dt_rt(z):
    return vw.idtcwt(vw.dtcwt(z, levels=5), "sym8")


rng = np.random.default_rng(0)
for b, n in ((8, 16384), (64, 16384), (128, 65536)):
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    measure(f"modwpt d4 rt {b}x{n//1024}K", wpt_rt, x,
            iters=100)
for b, n in ((8, 16384), (64, 16384), (128, 65536)):
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    measure(f"dtcwt 5L rt {b}x{n//1024}K", dt_rt, x,
            iters=100)
