"""Probe: MXU throughput of the b3x composite-kernel dot shapes.

Question: do three K=128 bf16 dots (the current bf16_3x split) run slower
than one K=384 dot carrying the same MACs ([a_hi | a_hi | a_lo] against
[m_hi; m_lo; m_hi])?  If per-dot fill/drain dominates at K=128, merging
along the contraction axis should lift the measured TFLOPs.

Run from a foreground shell (TPU tunnel).  Times whole-kernel chains via
lax.fori_loop; reports effective TFLOPs per variant.

CAVEAT (measured): at these operand sizes the fori_loop body is dominated
by a fixed ~87 us/iteration cost on this runtime — every variant times the
same and the per-dot differences are unresolvable.  Raw XLA microbenchmarks
over the tunnel are unreliable below ~1 ms of real work; A/B dot-shape
hypotheses inside the actual Pallas kernel instead (tools/probe_k3_merge.py,
which found the merged-K dot is +1% = noise).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

M = 1024  # rows (window size scale)
W = 896   # output cols (7 planes x 128)
ITERS = 300


def timed(name, fn, x, flops_per_iter):
    @jax.jit
    def chain(y):
        def body(_, z):
            out = fn(z)
            # feed a slice back so the loop is a real dependency chain
            return z * 0.999 + out[: z.shape[0], : z.shape[1]] * 1e-6

        return jax.lax.fori_loop(0, ITERS, body, y)

    out = chain(x)
    np.asarray(out[0, :4])  # warm
    t0 = time.perf_counter()
    out = chain(x)
    np.asarray(out[0, :4])
    t1 = time.perf_counter()
    per_iter = (t1 - t0) / ITERS
    tf = flops_per_iter / per_iter / 1e12
    print(f"{name:34s} {per_iter*1e6:9.1f} us/iter  {tf:7.1f} TFLOPs")
    return tf


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, 128)).astype(np.float32))
    m = jnp.asarray(rng.standard_normal((128, W)).astype(np.float32))
    dims = (((1,), (0,)), ((), ()))
    kw = {"preferred_element_type": jnp.float32}

    m_hi = m.astype(jnp.bfloat16)
    m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    m3 = jnp.concatenate(
        [m_hi.astype(jnp.float32), m_lo.astype(jnp.float32), m_hi.astype(jnp.float32)],
        axis=0,
    ).astype(jnp.bfloat16)  # [384, W]
    m2 = jnp.concatenate(
        [m_hi.astype(jnp.float32), m_hi.astype(jnp.float32)], axis=0
    ).astype(jnp.bfloat16)

    def three_dots(a):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jax.lax.dot_general(a_hi, m_hi, dims, **kw)
            + jax.lax.dot_general(a_hi, m_lo, dims, **kw)
            + jax.lax.dot_general(a_lo, m_hi, dims, **kw)
        )

    def one_dot_k384(a):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cat = jnp.concatenate([a_hi, a_hi, a_lo], axis=1)  # [M, 384]
        return jax.lax.dot_general(cat, m3, dims, **kw)

    def one_dot_k128(a):
        return jax.lax.dot_general(a.astype(jnp.bfloat16), m_hi, dims, **kw)

    def one_dot_k256_2g(a):
        # two "merged groups" of plain bf16 (models merging shift groups)
        a_h = a.astype(jnp.bfloat16)
        cat = jnp.concatenate([a_h, a_h], axis=1)
        return jax.lax.dot_general(cat, m2, dims, **kw)

    macs = 2 * M * 128 * W
    timed("1 dot K=128 bf16", one_dot_k128, x, macs)
    timed("2-group merge K=256 bf16", one_dot_k256_2g, x, 2 * macs)
    timed("3 dots K=128 (b3x today)", three_dots, x, 3 * macs)
    timed("1 dot K=384 (b3x merged)", one_dot_k384, x, 3 * macs)


if __name__ == "__main__":
    main()
