"""Parallel denoising: batched thresholds on one chip, sharded over a mesh.

Counterpart of the reference's ParallelDenoisingDemo
(vectorwave-examples/.../ParallelDenoisingDemo.java): denoise a batch of
signals concurrently.  The reference fans work across a thread pool; here
the batch axis IS the parallelism — one jit program vectorizes all
signals on a chip, and the same program shards over a device mesh for
more chips.  Run: python examples/parallel_denoising.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vectorwave_tpu.denoise.denoiser import denoise_multilevel
from vectorwave_tpu.parallel import make_mesh, shard_batch

BATCH, N, LEVELS = 16, 4096, 5


def main() -> None:
    rng = np.random.default_rng(5)
    t = np.arange(N) / N
    clean = np.stack([
        np.sin(2 * np.pi * (3 + b) * t) + 0.4 * np.sign(np.sin(2 * np.pi * 11 * t))
        for b in range(BATCH)
    ])
    noisy = clean + rng.normal(0.0, 0.3, (BATCH, N))
    x = jnp.asarray(noisy)

    # One jit program denoises the whole batch (leading axes are batch).
    den_fn = jax.jit(
        lambda v: denoise_multilevel(
            v, "sym8", levels=LEVELS, method="universal", mode="soft"
        )
    )
    den = den_fn(x)
    rmse_noisy = float(jnp.sqrt(jnp.mean((x - clean) ** 2)))
    rmse_den = float(jnp.sqrt(jnp.mean((den - clean) ** 2)))
    print(f"batch {BATCH}x{N}: RMSE {rmse_noisy:.4f} -> {rmse_den:.4f}")

    # Per-signal methods still vectorize: SURE chooses its own threshold
    # per signal, no Python loop.
    sure = jax.jit(
        lambda v: denoise_multilevel(v, "sym8", levels=LEVELS, method="sure")
    )(x)
    print(f"SURE per-signal RMSE: {float(jnp.sqrt(jnp.mean((sure - clean) ** 2))):.4f}")

    # Scale out: shard the batch axis over every attached device. The
    # program is unchanged — the sharding annotation is the whole story.
    n_dev = len(jax.devices())
    if n_dev > 1 and BATCH % n_dev == 0:
        mesh = make_mesh({"data": n_dev})
        xs = shard_batch(x, mesh)
        den_sharded = den_fn(xs)
        print(f"sharded over {n_dev} devices: max |Δ| vs single-device "
              f"{float(jnp.max(jnp.abs(den_sharded - den))):.2e}")
    else:
        print(f"(1 device attached — sharded run skipped; the same jit "
              f"program shards over any mesh)")


if __name__ == "__main__":
    main()
