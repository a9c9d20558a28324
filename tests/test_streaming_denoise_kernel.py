"""Kernel-tier streaming denoiser: fused one-pass kernel per block.

Parity contract: streaming_denoise_block_kernel must match the jnp
streaming denoiser (streaming_denoise_block, zero boundary) — identical
noise-ring state (the stratified level-1 samples are computed from raw x
with the scaled taps) and the same denoised output up to kernel precision.
Reference: MODWTStreamingDenoiser.java:36-504 served by the batch SIMD
kernel (BatchSIMDMODWT.java:447-508).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vectorwave_tpu.streaming import (
    KernelStreamingDenoiserState,
    StreamingDenoiser,
    kernel_streaming_denoiser_init,
    streaming_denoise_block,
    streaming_denoise_block_kernel,
    streaming_denoiser_init,
)


@pytest.mark.parametrize(
    "batch,nblk,levels,mode",
    [
        ((3,), 2048, 4, "soft"),
        ((), 1024, 3, "hard"),
        ((2,), 512, 2, "soft"),
    ],
)
def test_kernel_streaming_denoiser_matches_jnp(batch, nblk, levels, mode):
    rng = np.random.default_rng(0)
    st_j = streaming_denoiser_init("db4", levels=levels, batch_shape=batch)
    st_k = kernel_streaming_denoiser_init(
        "db4", levels=levels, batch_shape=batch
    )
    for i in range(3):
        blk = jnp.asarray(
            rng.standard_normal(batch + (nblk,)), jnp.float32
        )
        st_j, out_j = streaming_denoise_block(
            st_j, blk, "db4", boundary="zero", threshold_mode=mode
        )
        st_k, out_k = streaming_denoise_block_kernel(
            st_k, blk, "db4", levels=levels, threshold_mode=mode,
            precision="float32", interpret=True,
        )
        # the noise ring sees the SAME stratified samples (bit-exact: both
        # paths compute them in f32 from the same raw x)
        np.testing.assert_array_equal(
            np.asarray(st_j.noise_window), np.asarray(st_k.noise_window)
        )
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_j), atol=5e-5
        )


def test_kernel_streaming_denoiser_fallback_shape():
    """A block the fused kernel cannot serve (not a multiple of 128) takes
    the jnp fallback inside the kernel step — same state layout, same
    results."""
    rng = np.random.default_rng(1)
    st_j = streaming_denoiser_init("db4", levels=2)
    st_k = kernel_streaming_denoiser_init("db4", levels=2)
    for _ in range(2):
        blk = jnp.asarray(rng.standard_normal(200), jnp.float32)
        st_j, out_j = streaming_denoise_block(st_j, blk, "db4", boundary="zero")
        st_k, out_k = streaming_denoise_block_kernel(
            st_k, blk, "db4", levels=2, precision="float32", interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(st_j.noise_window), np.asarray(st_k.noise_window)
        )
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_j), atol=5e-5
        )


@pytest.mark.parametrize("est,kw", [("std", {}), ("fixed", {"fixed_sigma": 0.5})])
def test_kernel_streaming_denoiser_estimators(est, kw):
    rng = np.random.default_rng(2)
    st_j = streaming_denoiser_init("sym4", levels=3, batch_shape=(2,))
    st_k = kernel_streaming_denoiser_init("sym4", levels=3, batch_shape=(2,))
    blk = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float32)
    _, out_j = streaming_denoise_block(
        st_j, blk, "sym4", boundary="zero", noise_estimation=est, **kw
    )
    _, out_k = streaming_denoise_block_kernel(
        st_k, blk, "sym4", levels=3, noise_estimation=est,
        precision="float32", interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_j), atol=5e-5)


def test_streaming_denoiser_class_kernel_backend():
    """backend='pallas' routes the class through the kernel step (interpret
    on CPU); noise is reduced and reset preserves the kernel state type."""
    rng = np.random.default_rng(3)
    n, blk = 2048, 512
    clean = np.sin(np.linspace(0, 16 * np.pi, n))
    noisy = (clean + 0.4 * rng.standard_normal(n)).astype(np.float32)
    den = StreamingDenoiser(
        "db4", implementation="quality", backend="pallas"
    )
    assert isinstance(den.state, KernelStreamingDenoiserState)
    outs = [
        np.asarray(den.denoise(noisy[s : s + blk]))
        for s in range(0, n, blk)
    ]
    out = np.concatenate(outs)
    assert out.shape == (n,)
    # steady-state blocks: denoised closer to clean than noisy input
    err_out = np.mean((out[blk:] - clean[blk:]) ** 2)
    err_in = np.mean((noisy[blk:] - clean[blk:]) ** 2)
    assert err_out < err_in
    assert den.statistics["blocks_processed"] == n // blk
    den.reset()
    assert isinstance(den.state, KernelStreamingDenoiserState)
    assert den.statistics["samples_processed"] == 0


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,levels,nblk",
    [("sym8", 5, 4096), ("coif3", 3, 1536), ("db2", 6, 8192)],
)
def test_kernel_streaming_denoiser_family_sweep(name, levels, nblk):
    """Property sweep: ring-state and output parity across families,
    block sizes and depths (4 sequential blocks)."""
    rng = np.random.default_rng(7)
    st_j = streaming_denoiser_init(name, levels=levels, batch_shape=(2,))
    st_k = kernel_streaming_denoiser_init(name, levels=levels,
                                          batch_shape=(2,))
    for _ in range(4):
        blk = jnp.asarray(rng.standard_normal((2, nblk)), jnp.float32)
        st_j, out_j = streaming_denoise_block(st_j, blk, name,
                                              boundary="zero")
        st_k, out_k = streaming_denoise_block_kernel(
            st_k, blk, name, levels=levels, precision="float32",
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(st_j.noise_window), np.asarray(st_k.noise_window)
        )
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_j),
                                   atol=1e-4)


def test_kernel_streaming_denoiser_scan_compatible():
    """The step function threads through lax.scan (the serving pattern:
    one compiled program over all blocks) with results identical to the
    Python loop."""
    import jax

    rng = np.random.default_rng(11)
    blocks = jnp.asarray(rng.standard_normal((4, 2, 1024)), jnp.float32)
    st0 = kernel_streaming_denoiser_init("db4", levels=3, batch_shape=(2,))

    def step(st, blk):
        st, out = streaming_denoise_block_kernel(
            st, blk, "db4", levels=3, precision="float32", interpret=True
        )
        return st, out

    st_scan, outs_scan = jax.lax.scan(step, st0, blocks)

    st = st0
    outs = []
    for i in range(blocks.shape[0]):
        st, o = step(st, blocks[i])
        outs.append(o)
    np.testing.assert_allclose(
        np.asarray(outs_scan), np.asarray(jnp.stack(outs)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st_scan.noise_window), np.asarray(st.noise_window),
        atol=1e-6,
    )
