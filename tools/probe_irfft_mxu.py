"""A/B: XLA irfft vs the MXU-factorized inverse (kernels/fft_mxu.py).

Both variants run in ONE process at equal iters (CLAUDE.md timing rules).
Measures (a) the isolated batched inverse at cfg5's shape ([S, 2^20]
half-spectra) and (b) cfg5 end-to-end with the router forced each way.
Run: python -u tools/probe_irfft_mxu.py
"""
import json
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
from vectorwave_tpu.kernels.fft_mxu import mxu_irfft
from vectorwave_tpu.transforms import cwt as cwt_mod

N = 1 << 20
S = 20  # cfg5's large-scale (FFT-path) row count
rng = np.random.default_rng(0)


def timeit(fn, x, iters, label):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    np.asarray(chain(x)[..., :2].ravel()[:2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[..., :2].ravel()[:2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms", flush=True)
    return ms


results = {}

# (a) isolated inverse, [S, N/2+1] spectrum -> [S, N] real; feed the carry
half = N // 2 + 1
sr = jnp.asarray(rng.standard_normal((S, half)), jnp.float32)
si = jnp.asarray(rng.standard_normal((S, half)), jnp.float32)
spec = jax.jit(lambda a, b: jax.lax.complex(a, b))(sr, si)


def xla_inv(z):
    # carry: fold the real output back into the complex spectrum with
    # lax.complex (a tiny n=2 rfft used here previously hits UNIMPLEMENTED
    # on the axon backend)
    out = jnp.fft.irfft(z, n=N, axis=-1)
    return z + 1e-6 * jax.lax.complex(out[..., :half], out[..., 1 : half + 1])


def mxu_inv(zr):
    out = mxu_irfft(zr, zr * np.float32(0.5), N)
    return zr + 1e-6 * out[..., : zr.shape[-1]]


results["xla_irfft_ms"] = timeit(xla_inv, spec, 10, f"XLA irfft [S={S}, {N}]")
results["mxu_irfft_ms"] = timeit(mxu_inv, sr, 10, f"MXU irfft [S={S}, {N}]")

# (b) cfg5 end-to-end, router forced each way
sc = tuple(np.geomspace(2.0, 4096.0, 64).tolist())
x = jnp.asarray(rng.standard_normal(N), jnp.float32)


def cfg5(z):
    res = vw.cwt(z, sc, "morl", boundary="periodic")
    return 1e-3 * res.coeffs.sum(axis=-2).real.astype(z.dtype) + z


saved = cwt_mod._MXU_IFFT_MIN_FFT
cwt_mod._MXU_IFFT_MIN_FFT = 1 << 62  # force XLA
results["cfg5_xla_ms"] = timeit(cfg5, x, 20, "cfg5 (XLA irfft)")
cwt_mod._MXU_IFFT_MIN_FFT = saved  # default: MXU route
results["cfg5_mxu_ms"] = timeit(cfg5, x, 20, "cfg5 (MXU irfft)")

# parity spot-check of the routed path on chip
got = jax.jit(lambda z: vw.cwt(z, sc, "morl", boundary="periodic").coeffs)(x)
cwt_mod._MXU_IFFT_MIN_FFT = 1 << 62
ref = jax.jit(lambda z: vw.cwt(z, sc, "morl", boundary="periodic").coeffs)(x)
cwt_mod._MXU_IFFT_MIN_FFT = saved
diff = float(jnp.max(jnp.abs(got - ref)))
mag = float(jnp.max(jnp.abs(ref)))
results["parity_max_rel"] = diff / mag
print(json.dumps({k: round(v, 4) for k, v in results.items()}), flush=True)
