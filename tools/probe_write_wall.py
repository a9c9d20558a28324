"""Where the composite kernel's last ~20% of MXU peak actually goes.

Round-3 investigation of VERDICT item 2 ("bf16_3x >= 85% of MXU peak, or a
committed probe showing what wall remains").  Three measurements on the
real chip, at the bench geometry (db4, 6 levels, 128 x 65536, grid steps of
one 520-row window producing seven 512-row planes):

1. **Marginal dot passes are free-standing-MXU fast.**  Analysis at
   bf16 / bf16_3x / float32 differs by ~0.22 ms per extra dot pass — the
   ideal single-pass MXU time — so the dots themselves run at ~100%
   efficiency and the gap is a FIXED ~0.3 ms per direction.

2. **Rolls, bf16 splits and VPU accumulation are NOT the gap.**
   Monkeypatching `_shift_rows` to identity and `_split_bf16` to a cheap
   fake changes nothing (<1%).  A full deep-contraction restructure that
   eliminated all cross-offset VPU partial sums (clustered dots over a
   lane-concatenated view; lane-packed synthesis scratch) measured EQUAL at
   the headline shape and 7-25% SLOWER at smaller tiles (strided DMA
   destinations) — reverted, see git history.

3. **The wall is HBM write bandwidth at the plane write-back pattern.**
   This file's copy-only kernel — the analysis kernel's exact DMA geometry
   (1 input window DMA + 7 per-plane 256 KB output blocks per step) with
   no compute — sustains only ~480-510 GB/s, vs the 854 GB/s the
   2-stream read+write probe measures (bench.py) and the 819 GB/s v5e
   spec.  Variants measured: Pallas revolving outputs 0.558 ms, manual
   double-buffered output DMAs 0.529 ms, one stacked [7,B,R,128] output
   0.678 ms (strided, worse), dimension_semantics=("parallel",) 0.528 ms.
   Write-heavy traffic simply runs at ~60% of the mixed-stream figure.

Consequences (the numbers the docs cite):

* bf16 (1-pass) analysis = 0.526 ms vs the 224 MB / ~508 GB/s = 0.44 ms
  pure-write floor -> the memory-bound mode already runs at ~85% of the
  *achievable write wall*; the "87% of measured roofline" line in
  BENCH_r03 understates how close it is.
* bf16_3x analysis = 0.965 ms vs max(write 0.44, MXU 0.687) = 0.687 ms:
  the residual ~0.28 ms is write traffic that does not overlap the dot
  chain once compute is the long pole.  Both manual output DMAs and the
  Pallas epilogue leave this on the table, so it is a DMA-engine/VMEM-port
  contention effect, not a scheduling bug we can fix in the kernel.
* 79-80% of bf16 MXU peak is therefore the practical ceiling of the
  separate-call round trip at 68 B/sample; going further requires moving
  fewer bytes (the fused denoise kernel keeps the planes in VMEM and is
  the right tool when the planes are not a user-visible result).

Run: python tools/probe_write_wall.py   (real TPU; ~2 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, R, L, P = 128, 512, 128, 7
HALO = 8
W = R + HALO
ITERS = 100


def copy_kernel(n_out: int):
    """The analysis kernel's DMA geometry with the dots removed: one
    double-buffered input-window DMA per step, ``n_out`` per-plane output
    blocks through Pallas' revolving buffers."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_hbm, *rest):
        out_refs = rest[:n_out]
        scratch, sems = rest[-2:]
        bi = pl.program_id(0)

        def dma(bi2, slot, phase):
            c = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bi2, 1), pl.ds(0, W), :],
                scratch.at[slot],
                sems.at[slot],
            )
            c.start() if phase == 0 else c.wait()

        @pl.when(bi == 0)
        def _prologue():
            dma(bi, 0, 0)

        dma(bi, bi % 2, 1)

        @pl.when(bi + 1 < B)
        def _prefetch():
            dma(bi + 1, (bi + 1) % 2, 0)

        v = scratch[bi % 2]
        for i in range(n_out):
            out_refs[i][:] = (v + np.float32(i))[:, HALO:, :]

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, R, L), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        out_shape=[jax.ShapeDtypeStruct((B, R, L), jnp.float32)
                   for _ in range(n_out)],
        scratch_shapes=[
            pltpu.VMEM((2, 1, W, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def measure(n_out: int) -> tuple[float, float]:
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, W, L)), dtype=jnp.float32
    )
    f = copy_kernel(n_out)

    @jax.jit
    def chain(y):
        def body(_, z):
            outs = f(z)
            acc = outs[0]
            for o in outs[1:]:
                acc = acc + 1e-8 * o[:, :1, :]  # tiny read keeps o alive
            return jnp.concatenate([acc, acc[:, :HALO, :] * 0.5], axis=1)

        return jax.lax.fori_loop(0, ITERS, body, x)

    np.asarray(chain(x)[0, :2, :2])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2, :2])
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) / ITERS * 1e3
    gbps = (B * W * L * 4 + n_out * B * R * L * 4) / (ms * 1e-3) / 1e9
    return ms, gbps


def main() -> None:
    cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for n_out in (1, 2, 7):
        ms, gbps = measure(n_out)
        wr = n_out * B * R * L * 4 / 1e6
        print(f"copy-only kernel, {n_out} output planes "
              f"({wr:.0f} MB writes): {ms:.3f} ms  {gbps:.0f} GB/s")


if __name__ == "__main__":
    main()
