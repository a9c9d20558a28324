"""Where do the 174 ms of the 2-D roundtrip go? (VERDICT r03 item 7 prep)

8x2048x2048 db4 J=4 roundtrip through kernels/modwt2_mxu's separable
banded-matmul path.  In ONE process, measures the primitive costs the path
is built from — transposes (_swap), block-axis rolls, one full W-axis
multi-plane pass, a single col pass — so the restructure (transpose-free
axis-rotating dot_generals vs a 2-D Pallas kernel) targets the real cost.
Run: python -u tools/probe_2d_breakdown.py
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
from vectorwave_tpu.kernels import modwt2_mxu as k2
from vectorwave_tpu.transforms.modwt import _resolve_discrete

B, H, W, LEVELS = 8, 2048, 2048, 4
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32)
w = _resolve_discrete("db4")


def measure(label, fn, arg, iters=5):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    try:
        np.asarray(chain(arg).reshape(-1)[:2])
    except Exception as exc:  # noqa: BLE001
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:140]}",
              flush=True)
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(arg).reshape(-1)[:2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def rt(z):
    det, ll = k2.modwt2_multilevel_fast(z, w, LEVELS, "periodic", "bf16_3x")
    return k2.imodwt2_multilevel_fast(det, ll, w, "periodic", "bf16_3x")


measure("full 2-D roundtrip", rt, x, iters=3)


def ana(z):
    det, ll = k2.modwt2_multilevel_fast(z, w, LEVELS, "periodic", "bf16_3x")
    acc = ll
    for lh, hl, hh in det:
        acc = acc + 1e-3 * (lh + hl + hh)
    return acc


measure("analysis only", ana, x, iters=3)

measure("one swapaxes", lambda z: jnp.swapaxes(z, -1, -2) * 0.999 + 1e-9, x,
        iters=10)
measure("one roll(axis=-2 blocks)",
        lambda z: jnp.roll(z.reshape(B, H, W // 128, 128), -1, axis=-2)
        .reshape(B, H, W) * 0.999, x, iters=10)

inv = 1.0 / np.sqrt(2.0)
low = np.asarray(w.dec_lo, np.float64) * inv
high = np.asarray(w.dec_hi, np.float64) * inv
ds, as_ = k2.composite_planes_split(low, high, LEVELS)
row_planes = tuple(tuple(p.tolist()) for p in ds + as_)
pair1 = (tuple(ds[0].tolist()), tuple(as_[0].tolist()))


def wpass(z):
    outs = k2._apply_axis(z, row_planes, -1, "periodic", "bf16_3x")
    acc = None
    for o in outs:
        acc = o if acc is None else acc + 1e-3 * o
    return acc


measure("W-pass all 8 planes", wpass, x, iters=3)


def colpass(z):
    a, b = k2._apply_axis(
        jnp.swapaxes(z, -1, -2), pair1, -1, "periodic", "bf16_3x"
    )
    return jnp.swapaxes(a + 1e-3 * b, -1, -2)


measure("one col pass (swap+2filt+swap)", colpass, x, iters=5)
