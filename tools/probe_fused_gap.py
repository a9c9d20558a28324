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


print("=== fused roundtrip batch-tile sweep (bf16_3x) ===", flush=True)
measure("default tiles (b1 x 512)", frt())
for bt, tr in ((2, 512), (2, 256), (4, 256)):
    modwt_mxu._FORCE_B_TILE = bt
    modwt_mxu._FORCE_TILE_ROWS = tr
    measure(f"b_tile={bt} tile_rows={tr}", frt())
    modwt_mxu._FORCE_B_TILE = None
    modwt_mxu._FORCE_TILE_ROWS = None

print("=== sigma + denoise ===", flush=True)


def sig_only(z):
    s = _fused_sigma(z, w, "periodic")
    return z + 1e-9 * s


measure("decimated sigma (bitwise median)", sig_only)

from vectorwave_tpu.denoise import denoiser as dn_mod

_orig_mad = dn_mod.mad_sigma
dn_mod.mad_sigma = lambda d: jnp.median(
    jnp.abs(d), axis=-1, keepdims=True
) / 0.6745
measure("decimated sigma (jnp.median)", sig_only)
dn_mod.mad_sigma = _orig_mad


def dn(z):
    return vw.denoise_multilevel(z, "db4", levels=LEVELS,
                                 method="universal", mode="soft")


measure("fused denoise e2e", dn, iters=50)

# separate-call roundtrip for in-process comparison (also uses the
# restructured synthesis kernel)
def rt_sep(z):
    res = vw.modwt_multilevel(z, "db4", levels=LEVELS)
    return vw.imodwt_multilevel(res, "db4")


measure("separate-call roundtrip", rt_sep)


def rt_sym(z):
    res = vw.modwt_multilevel(z, "db4", levels=LEVELS, boundary="symmetric")
    return vw.imodwt_multilevel(res, "db4", boundary="symmetric")


measure("symmetric v2 roundtrip", rt_sym)

print("=== bank-kernel tiers (MODWPT / DTCWT) ===", flush=True)
from vectorwave_tpu.transforms.packets import imodwpt, modwpt
from vectorwave_tpu.transforms.dtcwt import dtcwt, idtcwt

xb = jnp.asarray(rng.standard_normal((16, 16384)), jnp.float32)


def wpt_rt(z):
    tree = modwpt(z, "db4", 4)
    return imodwpt(tree, "db4")


def dt_rt(z):
    res = dtcwt(z, "sym8", levels=4)
    return idtcwt(res, "sym8")


@jax.jit
def wpt_chain(z):
    return jax.lax.fori_loop(0, 20, lambda _, y: wpt_rt(y), z)


@jax.jit
def dt_chain(z):
    return jax.lax.fori_loop(0, 20, lambda _, y: dt_rt(y), z)


for label, chain in (("modwpt d4 rt 16x16K", wpt_chain),
                     ("dtcwt 4L rt 16x16K", dt_chain)):
    try:
        np.asarray(chain(xb)[0, :2])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(xb)[0, :2])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) / 20 * 1e3
        print(f"{label}: {ms:.3f} ms  {16*16384/ms/1e3:.0f} Ms/s", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:140]}",
              flush=True)
