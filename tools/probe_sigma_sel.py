"""A/B: strided-slice row selection vs selection-by-matmul for the sigma pass.

probe_sigma_cost.py showed the sigma overhead is ~90% SELECTION (strided
slices + concat), not the median.  TPU-native alternative: bake the row
selection into 0/1 constant matrices S_e [n_sub, r] and compute

    d1_sub = sum_e (S_e @ x3) @ M_e        (two einsums, all MXU)

Run: cd /root/repo && python -u tools/probe_sigma_sel.py
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

from vectorwave_tpu.denoise.denoiser import _fused_sigma
from vectorwave_tpu.kernels.modwt_mxu import _LANES, _band_single
from vectorwave_tpu.kernels.modwt_pallas import _INV_SQRT2
from vectorwave_tpu.ops.thresholds import mad_sigma
from vectorwave_tpu.transforms.modwt import _resolve_discrete

B, N, ITERS = 128, 65536, 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
w = _resolve_discrete("db4")

r = N // _LANES
n_sub = max(8, r // 64)
stride = r // n_sub
high = np.asarray(w.dec_hi, np.float64) * _INV_SQRT2
bands = _band_single(high, sign=-1)
es = sorted(bands)
S = np.zeros((len(es), n_sub, r), np.float32)
for bi, e in enumerate(es):
    for i in range(n_sub):
        S[bi, i, (i * stride + e) % r] = 1.0
M = np.stack([np.asarray(bands[e], np.float32) for e in es])  # [E,128,128]
S_j = jnp.asarray(S)
M_j = jnp.asarray(M)


def sigma_matmul(z):
    x3 = z.reshape(-1, r, _LANES)
    sel = jnp.einsum("esr,brl->ebsl", S_j, x3,
                     precision=jax.lax.Precision.HIGHEST)
    d1 = jnp.einsum("ebsl,elc->bsc", sel, M_j,
                    precision=jax.lax.Precision.HIGHEST)
    return mad_sigma(d1.reshape(-1, n_sub * _LANES))


def measure(label, fn, iters=ITERS):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: y + 1e-30 * jnp.mean(
            fn(y)), z)

    np.asarray(chain(x)[0, :2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms", flush=True)
    return ms


got = np.asarray(sigma_matmul(x))
want = np.asarray(_fused_sigma(x, w, "periodic"))
print("max |matmul-sel - current|:", np.abs(got - want).max(), flush=True)

measure("sigma current (strided slices)", lambda z: _fused_sigma(
    z, w, "periodic"))
measure("sigma matmul-selection        ", sigma_matmul)
