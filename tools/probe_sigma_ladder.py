"""In-context ladder: where do the 0.4 ms between fused roundtrip and fused
denoise actually go?  Each rung adds one piece, all in ONE process:

  L0 roundtrip (mode=none kernel)
  L1 denoise kernel, constant thresholds (adds shrink passes + th loads)
  L2 L1 + selection feeding the threshold (adds slices+dots, no median)
  L3 L1 + selection + median (the real sigma; adds 8 radix passes)
  L4 full production denoise (adds the 6-rule glue concat)

Run: cd /root/repo && python -u tools/probe_sigma_ladder.py
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
from vectorwave_tpu.denoise.denoiser import _fused_sigma
from vectorwave_tpu.kernels.modwt_mxu import _LANES, _band_single
from vectorwave_tpu.kernels.modwt_pallas import _INV_SQRT2, \
    fused_denoise_multilevel
from vectorwave_tpu.ops.thresholds import mad_sigma
from vectorwave_tpu.transforms.modwt import _resolve_discrete

B, N, LEVELS, ITERS = 128, 65536, 6, 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
w = _resolve_discrete("db4")

r = N // _LANES
n_sub = max(8, r // 64)
stride = r // n_sub
high = np.asarray(w.dec_hi, np.float64) * _INV_SQRT2
bands = _band_single(high, sign=-1)


def selection(z):
    x3 = z.reshape(-1, r, _LANES)
    acc = None
    for e, m in sorted(bands.items()):
        if e == 0:
            sel = x3[:, ::stride, :][:, :n_sub, :]
        else:
            body = x3[:, stride + e::stride, :][:, : n_sub - 1, :]
            first = x3[:, r + e : r + e + 1, :]
            sel = jnp.concatenate([first, body], axis=1)
        term = jax.lax.dot_general(
            sel.astype(jnp.float32), jnp.asarray(m, jnp.float32),
            (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST)
        acc = term if acc is None else acc + term
    return acc.reshape(-1, n_sub * _LANES)  # [B, 1024]


def l0(z):
    return vw.modwt_roundtrip_fused(z, "db4", levels=LEVELS)


TH0 = jnp.zeros((B, LEVELS), jnp.float32)


def l1(z):
    return fused_denoise_multilevel(z, "db4", levels=LEVELS, thresholds=TH0,
                                    mode="soft")


def l2(z):
    d1 = selection(z)
    s = jnp.mean(jnp.abs(d1), axis=-1, keepdims=True)  # stand-in, no median
    ths = jnp.broadcast_to(1e-30 * s, (B, LEVELS))
    return fused_denoise_multilevel(z, "db4", levels=LEVELS, thresholds=ths,
                                    mode="soft")


def l3(z):
    d1 = selection(z)
    s = mad_sigma(d1)
    ths = jnp.broadcast_to(1e-30 * s, (B, LEVELS))
    return fused_denoise_multilevel(z, "db4", levels=LEVELS, thresholds=ths,
                                    mode="soft")


def l4(z):
    return vw.denoise_multilevel(z, "db4", levels=LEVELS, method="universal",
                                 mode="soft")


def measure(label, fn, iters=ITERS):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    np.asarray(chain(x)[0, :2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms  ({B*N/ms/1e3:.0f} Ms/s)", flush=True)
    return ms


measure("L0 roundtrip            ", l0)
measure("L1 +shrink(const th)    ", l1)
measure("L2 +selection           ", l2)
measure("L3 +median              ", l3)
measure("L4 full denoise         ", l4, iters=50)

print("-- iters cross-check --", flush=True)
measure("L0 @50 ", l0, iters=50)
measure("L4 @100", l4, iters=100)
measure("L3 @50 ", l3, iters=50)
