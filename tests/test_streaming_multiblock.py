"""streaming_denoise_blocks_kernel == K sequential steps, bit for bit.

The multiblock entry point batches K buffered blocks into ONE fused
kernel call (the streaming carry is the raw-input tail, so the K kernel
passes are independent; only the noise-ring/sigma chain is sequential).
Reference contract: buffered-batch streaming semantics,
``BatchStreamingMODWT.java:181-258`` / ``MODWTStreamingDenoiser.java:94-199``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorwave_tpu.streaming import (
    kernel_streaming_denoiser_init,
    streaming_denoise_block_kernel,
    streaming_denoise_blocks_kernel,
)


@pytest.mark.parametrize("est,kw", [
    ("mad", {}),
    ("std", {}),
    ("fixed", {"fixed_sigma": 0.7}),
])
def test_multiblock_matches_sequential(est, kw):
    rng = np.random.default_rng(0)
    k, b, nb, lev = 5, 3, 2048, 4
    blocks = jnp.asarray(rng.standard_normal((k, b, nb)), jnp.float32)
    st0 = kernel_streaming_denoiser_init("db4", levels=lev, batch_shape=(b,))

    st_s = st0
    outs = []
    for i in range(k):
        st_s, o = streaming_denoise_block_kernel(
            st_s, blocks[i], "db4", levels=lev, noise_estimation=est, **kw
        )
        outs.append(np.asarray(o))
    st_m, out_m = streaming_denoise_blocks_kernel(
        st0, blocks, "db4", levels=lev, noise_estimation=est, **kw
    )
    assert np.array_equal(np.stack(outs), np.asarray(out_m))
    assert np.array_equal(np.asarray(st_s.history), np.asarray(st_m.history))
    assert np.array_equal(
        np.asarray(st_s.noise_window), np.asarray(st_m.noise_window)
    )
    assert int(st_s.window_pos) == int(st_m.window_pos)
    assert int(st_s.window_fill) == int(st_m.window_fill)


def test_multiblock_short_blocks_fallback():
    # blocks shorter than the history span: tails cross two blocks, the
    # multiblock path must fall back to the sequential step (and match it)
    rng = np.random.default_rng(1)
    k, b, nb, lev = 3, 2, 256, 6
    blocks = jnp.asarray(rng.standard_normal((k, b, nb)), jnp.float32)
    st0 = kernel_streaming_denoiser_init("db4", levels=lev, batch_shape=(b,))
    assert st0.history.shape[-1] > nb  # precondition: genuinely short

    st_s = st0
    outs = []
    for i in range(k):
        st_s, o = streaming_denoise_block_kernel(
            st_s, blocks[i], "db4", levels=lev
        )
        outs.append(np.asarray(o))
    st_m, out_m = streaming_denoise_blocks_kernel(
        st0, blocks, "db4", levels=lev
    )
    assert np.array_equal(np.stack(outs), np.asarray(out_m))
    assert np.array_equal(np.asarray(st_s.history), np.asarray(st_m.history))


def test_multiblock_streamed_equals_one_shot_denoise_semantics():
    # two consecutive multiblock calls == one call over all blocks
    rng = np.random.default_rng(2)
    k, b, nb, lev = 6, 2, 1024, 3
    blocks = jnp.asarray(rng.standard_normal((k, b, nb)), jnp.float32)
    st0 = kernel_streaming_denoiser_init("sym4", levels=lev, batch_shape=(b,))
    st_a, out_a = streaming_denoise_blocks_kernel(
        st0, blocks[:3], "sym4", levels=lev
    )
    st_a, out_b = streaming_denoise_blocks_kernel(
        st_a, blocks[3:], "sym4", levels=lev
    )
    st_c, out_c = streaming_denoise_blocks_kernel(
        st0, blocks, "sym4", levels=lev
    )
    assert np.array_equal(
        np.concatenate([np.asarray(out_a), np.asarray(out_b)]),
        np.asarray(out_c),
    )
    assert np.array_equal(np.asarray(st_a.history), np.asarray(st_c.history))
