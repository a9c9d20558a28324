"""CWT efficiency bound (VERDICT r03 item 9): what bounds cfg5?

cfg5 = morl, 64 scales, 1M samples.  The FFT path computes
``irfft(rfft(x, n_fft) * conj(bank))`` with n_fft = next_pow2(n + support),
so its floor is set by XLA's own FFT throughput at these shapes plus the
complex pointwise stage.  This probe measures, in ONE process:

  1. full cwt (cfg5)
  2. the isolated irfft stage at the same shape ([64, n_fft] c64 -> r32) —
     the dominant stage by construction (64x the forward rfft's work)
  3. the isolated forward rfft ([n_fft])
  4. the isolated complex pointwise multiply ([64, n_fft/2+1])
  5. an HBM roofline context: bytes moved by stages 2-4 at the measured
     mixed-stream bandwidth (from BENCH_LATEST.json)

If (2)+(3)+(4) ~= (1), the CWT engine adds nothing on top of XLA's FFT and
the engine is at ITS bound; any remaining headroom lives inside XLA's FFT
lowering, not in this package's code.  Run: python -u tools/probe_cwt_roofline.py
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

N = 1 << 20
SCALES = tuple(np.geomspace(2.0, 4096.0, 64).tolist())
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(N), jnp.float32)


def measure(label, fn, arg, iters=20, reader=None):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    try:
        out = chain(arg)
        (reader or (lambda o: np.asarray(o.reshape(-1)[:2])))(out)
    except Exception as exc:  # noqa: BLE001 - axon UNIMPLEMENTED quirks
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:120]}",
              flush=True)
        return 0.0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(arg)
        (reader or (lambda o: np.asarray(o.reshape(-1)[:2])))(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms", flush=True)
    return ms


# 1. full cwt (consume coeffs into a same-shaped carry)
def full_cwt(z):
    res = vw.cwt(z, SCALES, "morl", boundary="periodic")
    return 1e-3 * res.coeffs.sum(axis=-2).real.astype(z.dtype) + z


t_full = measure("full cwt cfg5", full_cwt, x)

# isolated stages at the exact cfg5 shapes (periodic boundary: fft_size = n,
# transforms/cwt.py:222)
fft_size = N
print(f"fft_size = {fft_size}", flush=True)

# bank built HOST-side (eager complex arithmetic is unimplemented on the
# axon backend; np constructs, device_put ships)
bank_np = (
    rng.standard_normal((64, fft_size // 2 + 1))
    + 1j * rng.standard_normal((64, fft_size // 2 + 1))
).astype(np.complex64)
bank = jnp.asarray(bank_np)


def rfft_stage(z):
    s = jnp.fft.rfft(z, n=fft_size)
    return z * 0.999 + 1e-30 * jnp.sum(jnp.real(s) + jnp.imag(s))


def fft_chain_stage(z):
    """rfft + 64-scale pointwise + 64-row irfft — the cwt engine's exact
    device work minus coefficient assembly."""
    s = jnp.fft.rfft(z, n=fft_size)
    prod = s[None, :] * bank
    out = jnp.fft.irfft(prod, n=fft_size, axis=-1)
    return z * 0.999 + 1e-9 * out.sum(axis=0)[:N]


t_ir = measure("rfft + pointwise + irfft[64]", fft_chain_stage, x, iters=10)
t_r = measure("rfft single row", rfft_stage, x, iters=20)
t_pw = 0.0

# HBM context
latest = {}
try:
    with open("/root/repo/BENCH_LATEST.json") as f:
        latest = json.load(f)
except Exception:
    pass
bw = latest.get("measured_hbm_gbps", 850.0)
# irfft minimum traffic: read c64 spectrum + write r32 output, x passes
bytes_ir = 64 * ((fft_size // 2 + 1) * 8 + fft_size * 4)
floor_ms = bytes_ir / (bw * 1e9) * 1e3
print(f"irfft stage HBM floor (1 read + 1 write at {bw} GB/s): "
      f"{floor_ms:.3f} ms", flush=True)
print(json.dumps({
    "full_ms": t_full, "fft_chain_ms": t_ir, "single_row_rfft_ms": t_r,
    "fft_size": fft_size,
    "irfft_hbm_floor_ms": floor_ms,
    "engine_overhead_ms": round(t_full - t_ir, 3) if t_ir else None,
}), flush=True)
