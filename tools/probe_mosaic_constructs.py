"""Bisect which Pallas/Mosaic constructs fail on this TPU runtime."""
import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
jax.config.update("jax_compilation_cache_dir", cache)


def try_case(name, fn):
    try:
        out = fn()
        np.asarray(out).reshape(-1)[:2]
        print(f"{name}: OK", flush=True)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).replace("\n", " | ")[:400]
        print(f"{name}: FAIL {type(exc).__name__}: {msg}", flush=True)


# 1. sublane roll on [1024, 128]
def case_roll():
    def k(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 0)

    x = jnp.ones((1024, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# 2. in-kernel reshape [8, 64, 128] -> [512, 128] and back
def case_reshape():
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(8 * 64, 128) * 2.0
        o_ref[:] = v.reshape(8, 64, 128)

    x = jnp.ones((8, 64, 128), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


# 3. dot_general [512,128]@[128,256] with HIGHEST precision
def case_dot_highest():
    def k(x_ref, m_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], m_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    x = jnp.ones((512, 128), jnp.float32)
    m = jnp.ones((128, 256), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, m)


# 3b. dot_general DEFAULT precision
def case_dot_default():
    def k(x_ref, m_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], m_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = jnp.ones((512, 128), jnp.float32)
    m = jnp.ones((128, 256), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, m)


# 4. DMA slicing the middle dim of a 3-D HBM ref into 3-D scratch
def case_dma3d():
    def k(x_hbm, o_ref, scratch, sem):
        t = pl.program_id(0)
        c = pltpu.make_async_copy(x_hbm.at[:, pl.ds(t * 8, 16), :], scratch, sem.at[0])
        c.start()
        c.wait()
        o_ref[:] = scratch[:, :8, :] * 1.0

    x = jnp.ones((4, 64 + 8, 128), jnp.float32)
    return pl.pallas_call(
        k, grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, 8, 128), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 64, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, 16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
    )(x)


# 5. 3-D VMEM const input [3, 128, 256], indexing leading dim
def case_const3d():
    def k(m_ref, o_ref):
        o_ref[:] = m_ref[1] * 2.0

    m = jnp.ones((3, 128, 256), jnp.float32)
    return pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(m)


if __name__ == "__main__":
    try_case("sublane_roll", case_roll)
    try_case("reshape_3d_2d", case_reshape)
    try_case("dot_default", case_dot_default)
    try_case("dot_highest", case_dot_highest)
    try_case("dma_3d_middle", case_dma3d)
    try_case("const_3d_index", case_const3d)
