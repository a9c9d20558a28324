"""Measure the achievable HBM bandwidth of the fused kernels' memory pattern.

Variants:
- xla_copy: plain XLA elementwise (the 352 GB/s reference point)
- pallas_1to1: manual-DMA window in -> one blocked output
- pallas_1to7: manual-DMA window in -> seven blocked outputs (analysis fan-out)
- pallas_7to1: seven manual-DMA windows in -> one output (synthesis fan-in)

If 1to7/7to1 sustain far less than xla_copy, the kernels are memory-path
bound and the fix is DMA shape/overlap, not compute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, R, LANES = 128, 512, 128  # [128, 512, 128] f32 = 32 MB per plane
B_TILE, TILE_ROWS, HALO = 8, 64, 8
WINDOW = TILE_ROWS + HALO


def pallas_1to7(x):
    def kernel(x_hbm, *rest):
        outs = rest[:7]
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        c = pltpu.make_async_copy(
            x_hbm.at[pl.ds(bi * B_TILE, B_TILE), pl.ds(t * TILE_ROWS, WINDOW), :],
            scratch, sems.at[0])
        c.start()
        c.wait()
        v = scratch[:, HALO:, :]
        for o in outs:
            o[:] = v

    out_specs = [
        pl.BlockSpec((B_TILE, TILE_ROWS, LANES), lambda bi, t: (bi, t, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(7)
    ]
    return pl.pallas_call(
        kernel, grid=(B // B_TILE, R // TILE_ROWS),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((B, R, LANES), jnp.float32)] * 7,
        scratch_shapes=[pltpu.VMEM((B_TILE, WINDOW, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((1,))],
    )(x)


def pallas_7to1(planes):
    def kernel(*refs):
        hbm = refs[:7]
        out = refs[7]
        scratch, sems = refs[-2:]
        bi = pl.program_id(0)
        t = pl.program_id(1)
        cs = [pltpu.make_async_copy(
            hbm[i].at[pl.ds(bi * B_TILE, B_TILE), pl.ds(t * TILE_ROWS, WINDOW), :],
            scratch.at[i], sems.at[i]) for i in range(7)]
        for c in cs:
            c.start()
        for c in cs:
            c.wait()
        acc = None
        for i in range(7):
            v = scratch[i, :, HALO:, :]
            acc = v if acc is None else acc + v
        out[:] = acc

    return pl.pallas_call(
        kernel, grid=(B // B_TILE, R // TILE_ROWS),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=pl.BlockSpec((B_TILE, TILE_ROWS, LANES),
                               lambda bi, t: (bi, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((7, B_TILE, WINDOW, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((7,))],
    )(planes[0], planes[1], planes[2], planes[3], planes[4], planes[5], planes[6])


def timed_chain(step, x0, traffic_bytes, iters=100):
    """On-device fori_loop chaining (axon timing discipline): step must map
    a value to a same-shaped value."""

    @jax.jit
    def run(a):
        return jax.lax.fori_loop(0, iters, lambda _, v: step(v), a)

    out = run(x0)
    np.asarray(out[0, 0, :4])  # tiny on-device slice -> tunnel
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x0)
        np.asarray(out[0, 0, :4])
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    return traffic_bytes * iters / t / 1e9


def main():
    cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    plane_bytes = B * R * LANES * 4
    x = jnp.ones((B, R, LANES), jnp.float32)
    planes = tuple(jnp.ones((B, R, LANES), jnp.float32) for _ in range(7))
    report = {}
    report["xla_copy_gbps"] = round(
        timed_chain(lambda a: a * 1.0000001, x, 2 * plane_bytes), 1
    )
    report["pallas_1to7_gbps"] = round(
        timed_chain(lambda a: pallas_1to7(a)[0], x, 8 * plane_bytes), 1
    )
    report["pallas_7to1_gbps"] = round(
        timed_chain(lambda a: pallas_7to1((a,) * 7), x, 8 * plane_bytes), 1
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
