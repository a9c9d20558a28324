"""Probe: int8 MXU dots as a faster substrate for the exact tier.

The exact tier's balanced profile spends 19 bf16 slice-pair dots per
band group (`kernels/modwt_exact.py`); its MXU-bound ceiling is
~3/19 of the bf16_3x headline.  TPU v5e runs int8 matmuls at 2x the
bf16 rate (394 TOPS vs 197 TFLOPS), and an 8-bit-slice product is
EXACT in int32 accumulation (8+8+log2(K) bits < 31 for K=128*members),
which would also let whole diagonals accumulate as exact int32 adds
instead of `_df_add` chains.

Questions this probe answers on the real chip:
  1. Does `lax.dot_general(int8, int8, preferred_element_type=int32)`
     compile + run inside a Mosaic (Pallas TPU) kernel?
  2. What is its measured throughput vs an identical-shape bf16 dot?
  3. Is the int32 result bit-exact vs a float reference?

Shapes mirror the kernel's group dots: [rows, 128] x [128, 5*128].
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 2048
K = 128
NCOL = 5 * 128
DOTS = 19  # balanced-profile pair count, for a like-for-like chain


def _time(fn, *args, iters=50, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / iters


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    rng = np.random.default_rng(0)
    a_i8 = rng.integers(-128, 128, (ROWS, K), dtype=np.int8)
    b_i8 = rng.integers(-128, 128, (K, NCOL), dtype=np.int8)
    a_bf = jnp.asarray(a_i8, jnp.bfloat16)
    b_bf = jnp.asarray(b_i8, jnp.bfloat16)
    a_i = jnp.asarray(a_i8)
    b_i = jnp.asarray(b_i8)

    dims = (((1,), (0,)), ((), ()))

    # 1) exactness at the jnp level
    out_i = jax.jit(
        lambda x, y: jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.int32
        )
    )(a_i, b_i)
    ref = a_i8.astype(np.int64) @ b_i8.astype(np.int64)
    exact = bool(np.array_equal(np.asarray(out_i, np.int64), ref))
    print(f"jnp int8->int32 dot exact: {exact}")

    # 2) throughput, jnp level: chain DOTS dots in a fori body
    def chain(kind):
        if kind == "i8":
            aa, bb, pt = a_i, b_i, jnp.int32
        else:
            aa, bb, pt = a_bf, b_bf, jnp.float32

        @jax.jit
        def run(x):
            def body(_, acc):
                s = acc
                for _d in range(DOTS):
                    t = jax.lax.dot_general(
                        aa + x.astype(aa.dtype), bb, dims,
                        preferred_element_type=pt,
                    )
                    s = s + t
                return s

            init = jnp.zeros((ROWS, NCOL), pt)
            return jax.lax.fori_loop(0, 50, body, init)

        return run

    carry = jnp.zeros((ROWS, K), jnp.int8)
    t_bf = _time(chain("bf"), jnp.zeros((ROWS, K), jnp.bfloat16))
    t_i8 = _time(chain("i8"), carry)
    macs = ROWS * K * NCOL * DOTS
    print(f"bf16 chain: {t_bf*1e3:.3f} ms/iter  {2*macs/t_bf/1e12:.1f} TOPS")
    print(f"int8 chain: {t_i8*1e3:.3f} ms/iter  {2*macs/t_i8/1e12:.1f} TOPS")
    print(f"int8/bf16 speed ratio: {t_bf/t_i8:.2f}x")

    # 3) the same dot inside a Mosaic kernel
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(a_ref, b_ref, o_ref):
            acc = jnp.zeros((ROWS, NCOL), jnp.int32)
            for _d in range(DOTS):
                acc = acc + jax.lax.dot_general(
                    a_ref[:], b_ref[:], dims,
                    preferred_element_type=jnp.int32,
                )
            o_ref[:] = acc

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, NCOL), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        res = jax.jit(out)(a_i, b_i)
        ok = bool(np.array_equal(np.asarray(res, np.int64), ref * DOTS))
        print(f"pallas int8 dot: compiled, exact={ok}")

        t_pl = _time(jax.jit(lambda a, b: out(a, b)), a_i, b_i, iters=1)
        print(f"pallas int8 single call: {t_pl*1e3:.3f} ms")
    except Exception as exc:  # noqa: BLE001
        print(f"pallas int8 dot FAILED: {type(exc).__name__}: {str(exc)[:300]}")

    # 4) f32 -> int8 slice extraction cost inside Mosaic (the conversion
    #    the kernel would add): floor-divide against a power-of-two scale,
    #    cast to int32 then int8.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kex(x_ref, o_ref):
            x = x_ref[:]
            s0 = jnp.float32(2.0**15)
            q = jnp.floor(x / s0)
            r = x - q * s0
            o_ref[:] = q.astype(jnp.int32).astype(jnp.int8) + (
                jnp.floor(r / 128.0).astype(jnp.int32).astype(jnp.int8)
            )

        outx = pl.pallas_call(
            kex,
            out_shape=jax.ShapeDtypeStruct((ROWS, K), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        _ = jax.jit(outx)(jnp.asarray(rng.standard_normal((ROWS, K)) * 1e6,
                                      jnp.float32))
        print("pallas f32->int8 extraction: compiled ok")
    except Exception as exc:  # noqa: BLE001
        print(f"pallas f32->int8 extraction FAILED: "
              f"{type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
