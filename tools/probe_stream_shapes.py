"""Probe: where does the streaming-denoise rate go at short blocks?

VERDICT r04 #4 hypothesized the per-block sigma update explained the
kernel streaming denoiser running ~2.9 Gs/s vs ~4.9 for batch fused
denoise.  Round-5 A/Bs (all in ONE process, equal iters) localize it
elsewhere; this probe reproduces the whole chain of evidence:

  1. full (mad) vs fixed-sigma streaming step     -> sigma is ~2%
  2. sequential scan vs ONE multiblock kernel call -> launches are ~0%
  3. batch fused denoise at [128,64K] / [256,32K] / [1024,8K]
     -> the SHORT-SIGNAL SHAPE is the whole gap (4.8 / 4.5 / 2.1 Gs/s):
     a 64-row window runs the composite kernel at ~45% of its 512-row
     rate, with b_tile forced 4/8/16 all neutral.

Run: python -u tools/probe_stream_shapes.py  (real TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw
from vectorwave_tpu.streaming import (
    kernel_streaming_denoiser_init,
    streaming_denoise_block_kernel,
    streaming_denoise_blocks_kernel,
)

vw.enable_compilation_cache()
rng = np.random.default_rng(0)
K, B, NB, LEV = 8, 128, 8192, 6


def chain_time(chain, x, iters, label, scale):
    np.asarray(chain(x).ravel()[:2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x).ravel()[:2])
        ts.append(time.perf_counter() - t0)
    t = min(ts) / iters
    print(f"{label}: {t*1e3:.3f} ms = {scale/t/1e6:.0f} Ms/s", flush=True)


blocks = jnp.asarray(rng.standard_normal((K, B, NB)), jnp.float32)
st0 = kernel_streaming_denoiser_init("db4", levels=LEV, batch_shape=(B,))

for label, kw in (
    ("streaming scan full (mad)", {}),
    ("streaming scan fixed-sigma",
     {"noise_estimation": "fixed", "fixed_sigma": 1.0}),
):
    def step(s, b, kw=kw):
        return streaming_denoise_block_kernel(s, b, "db4", levels=LEV, **kw)

    @jax.jit
    def chain(bl, step=step):
        def body(_, acc):
            def f(s, b):
                s2, o = step(s, b)
                return s2, o[..., :1]
            _, outs = jax.lax.scan(f, st0, bl + acc[None] * 1e-9)
            return acc + outs[0] * 1e-9
        return jax.lax.fori_loop(0, 30, body, jnp.zeros((B, 1), jnp.float32))

    chain_time(chain, blocks, 30, label, K * B * NB)


@jax.jit
def chain_mb(bl):
    def body(_, acc):
        _, outs = streaming_denoise_blocks_kernel(
            st0, bl + acc[None] * 1e-9, "db4", levels=LEV
        )
        return acc + outs[0, :, :1] * 1e-9
    return jax.lax.fori_loop(0, 30, body, jnp.zeros((B, 1), jnp.float32))


chain_time(chain_mb, blocks, 30, "ONE multiblock kernel call", K * B * NB)

for shape in ((128, 65536), (256, 32768), (1024, 8192)):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    @jax.jit
    def chain_dn(y):
        def dn(z):
            return vw.denoise_multilevel(
                z, "db4", levels=6, method="universal", mode="soft"
            )
        return jax.lax.fori_loop(0, 100, lambda _, z: dn(z), y)

    chain_time(chain_dn, x, 100, f"batch fused denoise {shape}",
               shape[0] * shape[1])
