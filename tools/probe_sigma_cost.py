"""Decompose the fused-denoise sigma overhead and A/B candidate fixes.

BENCH r04: fused roundtrip 5,080 Ms/s but fused denoise 4,089 — the sigma
estimate + threshold glue cost ~0.4 ms at 128x64K.  This probe times, in ONE
process (chip varies +-15% between processes, verify-skill rule):

  A. fused roundtrip (the no-sigma floor)
  B. fused denoise e2e (current production path)
  C. _fused_sigma current (strided slices + 2 dots + radix-16 median, R=2)
  D. median alone on the [128,1024] subsample (radix-16, 8 passes, R=2)
  E. median variant: radix-256 (4 passes, 255 candidates) R=2
  F. median variant: radix-16 single rank (R=1, lower middle)
  G. selection only (slices + dots, no median)

Run: cd /root/repo && python -u tools/probe_sigma_cost.py
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
from vectorwave_tpu.ops.thresholds import median_magnitude
from vectorwave_tpu.transforms.modwt import _resolve_discrete

B, N, LEVELS, ITERS = 128, 65536, 6, 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
sub = jnp.asarray(rng.standard_normal((B, 1024)), jnp.float32)
w = _resolve_discrete("db4")


def measure(label, fn, arg, iters=ITERS):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    try:
        np.asarray(chain(arg)[(0,) * (arg.ndim - 1) + (slice(2),)])
    except Exception as exc:  # noqa: BLE001
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
              flush=True)
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(arg)[(0,) * (arg.ndim - 1) + (slice(2),)])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms", flush=True)
    return ms


def radix_median(v, groups, ranks):
    """Generalized bitwise order-stat search: groups=[(pos, size)...]."""
    mag = jnp.abs(v).astype(jnp.float32)
    n = mag.shape[-1]
    bits = jax.lax.bitcast_convert_type(mag, jnp.int32)
    ks = (n // 2, n // 2 + 1) if ranks == 2 else (n // 2 + 1,)
    k_arr = jnp.asarray(ks, dtype=jnp.int32)
    cand = jnp.zeros(mag.shape[:-1] + (len(ks),), jnp.int32)
    for p, m in groups:
        js = jnp.arange(1, m, dtype=jnp.int32) << p
        trials = cand[..., :, None] | js
        cnt = jnp.sum(bits[..., :, None, None] < trials[..., None, :, :],
                      axis=-3, dtype=jnp.int32)
        nibble = jnp.sum(cnt < k_arr[..., :, None], axis=-1, dtype=jnp.int32)
        cand = cand | (nibble << p)
    vals = jax.lax.bitcast_convert_type(cand, jnp.float32)
    return jnp.mean(vals, axis=-1, keepdims=True)


G16 = ((28, 8),) + tuple((p, 16) for p in range(24, -1, -4))
G256 = ((24, 128),) + tuple((p, 256) for p in (16, 8, 0))


def sel_only(z):
    # replicate _fused_sigma's selection without the median
    from vectorwave_tpu.kernels.modwt_mxu import _LANES, _band_single
    from vectorwave_tpu.kernels.modwt_pallas import _INV_SQRT2

    r = N // _LANES
    n_sub = max(8, r // 64)
    stride = r // n_sub
    high = np.asarray(w.dec_hi, np.float64) * _INV_SQRT2
    bands = _band_single(high, sign=-1)
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
    d = acc.reshape(-1, n_sub * _LANES)
    return z + 1e-9 * jnp.mean(d, axis=-1, keepdims=True)


a = measure("A fused roundtrip        ", lambda z: vw.modwt_roundtrip_fused(
    z, "db4", levels=LEVELS), x)
b = measure("B fused denoise e2e      ", lambda z: vw.denoise_multilevel(
    z, "db4", levels=LEVELS, method="universal", mode="soft"), x, iters=50)
c = measure("C sigma current          ", lambda z: z + 1e-9 * _fused_sigma(
    z, w, "periodic"), x)
d = measure("D median r16 R2          ", lambda z: z + 1e-9 * radix_median(
    z, G16, 2), sub)
e = measure("E median r256 R2         ", lambda z: z + 1e-9 * radix_median(
    z, G256, 2), sub)
f = measure("F median r16 R1          ", lambda z: z + 1e-9 * radix_median(
    z, G16, 1), sub)
g = measure("G selection only         ", sel_only, x)
if a and b:
    print(f"\nsigma+glue cost (B-A): {b - a:.3f} ms", flush=True)
    print(f"Ms/s: A={B*N/a/1e3:.0f} B={B*N/b/1e3:.0f}", flush=True)
