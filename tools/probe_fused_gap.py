"""Where does the fused one-pass round trip lose its last ~18% of MXU peak?

BENCH r04 first cut: fused roundtrip 5,005 Ms/s = 81.9% of bf16 peak (vs
79.2% for the separate-call path) — far short of the ~100%-of-dot-rate hope.
This probe A/Bs, in ONE process (chip state varies ±15% between processes):

  1. fused roundtrip, default tiles (b_tile auto, tile_rows auto=512)
  2. fused roundtrip, forced tile_rows 1024 (fewer grid steps)
  3. fused roundtrip at bf16 (1-pass) and float32 (6-pass) — if the rate
     does not scale ~3x / ~0.5x vs the 3-pass default, a precision-
     independent overhead (DMA, rolls, grid) binds
  4. decimated sigma pass alone (strided-slice rewrite)
  5. fused denoise end-to-end (sigma + kernel)

Run: cd /root/repo && python -u tools/probe_fused_gap.py
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
from vectorwave_tpu.kernels import modwt_mxu
from vectorwave_tpu.transforms.modwt import _resolve_discrete
from vectorwave_tpu.denoise.denoiser import _fused_sigma

B, N, LEVELS, ITERS = 128, 65536, 6, 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
w = _resolve_discrete("db4")


def measure(label, fn, iters=ITERS):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    try:
        np.asarray(chain(x)[0, :2])
    except Exception as exc:  # noqa: BLE001
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:140]}",
              flush=True)
        return None
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms  {B*N/ms/1e3:.0f} Ms/s", flush=True)
    return ms


def frt(precision=None):
    def fn(z):
        return vw.modwt_roundtrip_fused(z, "db4", levels=LEVELS,
                                        precision=precision)
    return fn


print("=== fused roundtrip tile sweep (bf16_3x) ===", flush=True)
measure("default tiles", frt())
for tr in (256, 768, 1024):
    modwt_mxu._FORCE_TILE_ROWS = tr
    measure(f"tile_rows={tr}", frt())
    modwt_mxu._FORCE_TILE_ROWS = None
modwt_mxu._FORCE_B_TILE = 2
modwt_mxu._FORCE_TILE_ROWS = 256
measure("b_tile=2 tile_rows=256", frt())
modwt_mxu._FORCE_B_TILE = None
modwt_mxu._FORCE_TILE_ROWS = None

print("=== precision scaling ===", flush=True)
measure("fused rt bf16 (1-pass)", frt("bf16"))
measure("fused rt float32 (6-pass)", frt("float32"))

print("=== sigma + denoise ===", flush=True)


def sig_only(z):
    s = _fused_sigma(z, w, "periodic")
    return z + 1e-9 * s


measure("decimated sigma alone", sig_only)


def dn(z):
    return vw.denoise_multilevel(z, "db4", levels=LEVELS,
                                 method="universal", mode="soft")


measure("fused denoise e2e", dn, iters=50)

# separate-call roundtrip for in-process comparison
def rt_sep(z):
    res = vw.modwt_multilevel(z, "db4", levels=LEVELS)
    return vw.imodwt_multilevel(res, "db4")


measure("separate-call roundtrip", rt_sep)
