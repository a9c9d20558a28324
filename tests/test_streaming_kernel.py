"""Kernel-tier block streaming: the composite MXU kernel fed by the carry
as its external halo (streaming/stream.modwt_stream_block_kernel).

Parity oracle: the whole-signal transform (zero/symmetric) — the same
left-history contract as the jnp tier (reference:
BatchSIMDMODWT.java:447-508 serving BatchStreamingMODWT.java:19-458).
Runs in interpret mode on CPU; f32 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.streaming import (
    StreamingTransform,
    kernel_streaming_init,
    modwt_stream_block_kernel,
)


def _stream(x, name, levels, boundary, block_size, batch_shape=()):
    state = kernel_streaming_init(name, levels, batch_shape=batch_shape)
    outs = []
    n = x.shape[-1]
    for start in range(0, n, block_size):
        state, res = modwt_stream_block_kernel(
            state, x[..., start : start + block_size], name,
            levels=levels, boundary=boundary, interpret=True,
            precision="float32",
        )
        outs.append(res)
    details = tuple(
        jnp.concatenate([o.details[j] for o in outs], axis=-1)
        for j in range(levels)
    )
    approx = jnp.concatenate([o.approx for o in outs], axis=-1)
    return details, approx


@pytest.mark.parametrize("block_size", [512, 1024])
@pytest.mark.parametrize("name,levels", [("haar", 3), ("db4", 3), ("sym8", 2)])
def test_kernel_streaming_matches_whole_signal_zero(name, levels, block_size):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    whole = vw.modwt_multilevel(x, name, levels=levels, boundary="zero",
                                backend="jnp")
    details, approx = _stream(x, name, levels, "zero", block_size,
                              batch_shape=(2,))
    for j in range(levels):
        np.testing.assert_allclose(
            np.asarray(details[j]), np.asarray(whole.details[j]), atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(whole.approx), atol=2e-5
    )


def test_kernel_streaming_matches_whole_signal_symmetric():
    """First block head spliced from the exact symmetric cascade; later
    blocks are pure external-halo kernel calls."""
    rng = np.random.default_rng(1)
    levels, name = 3, "db4"
    x = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    whole = vw.modwt_multilevel(x, name, levels=levels, boundary="symmetric",
                                backend="jnp")
    details, approx = _stream(x, name, levels, "symmetric", 1024)
    for j in range(levels):
        np.testing.assert_allclose(
            np.asarray(details[j]), np.asarray(whole.details[j]), atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(whole.approx), atol=2e-5
    )


def test_kernel_streaming_symmetric_short_block_raises():
    state = kernel_streaming_init("db4", 4)
    with pytest.raises(Exception, match="blocks >="):
        modwt_stream_block_kernel(
            state, jnp.zeros(64, jnp.float32), "db4", levels=4,
            boundary="symmetric", interpret=True,
        )


def test_kernel_streaming_periodic_is_per_block():
    """Periodic treats each block circularly (stateless), matching the jnp
    tier's semantics."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 1024)), jnp.float32)
    state = kernel_streaming_init("db4", 2, batch_shape=(1,))
    _, res = modwt_stream_block_kernel(
        state, x, "db4", levels=2, boundary="periodic", interpret=True,
        precision="float32",
    )
    whole = vw.modwt_multilevel(x, "db4", levels=2, boundary="periodic",
                                backend="jnp")
    np.testing.assert_allclose(
        np.asarray(res.approx), np.asarray(whole.approx), atol=2e-5
    )


def test_kernel_streaming_scan_compatible():
    """The step must run under lax.scan (the on-device benchmark shape)."""
    rng = np.random.default_rng(3)
    levels = 3
    blocks = jnp.asarray(
        rng.standard_normal((4, 2, 1024)), jnp.float32
    )  # [n_blocks, B, block]
    state = kernel_streaming_init("db4", levels, batch_shape=(2,))

    def step(st, blk):
        st, res = modwt_stream_block_kernel(
            st, blk, "db4", levels=levels, boundary="zero", interpret=True,
            precision="float32",
        )
        return st, res.approx

    _, approxes = jax.lax.scan(step, state, blocks)
    whole = vw.modwt_multilevel(
        blocks.transpose(1, 0, 2).reshape(2, -1), "db4", levels=levels,
        boundary="zero", backend="jnp",
    )
    got = approxes.transpose(1, 0, 2).reshape(2, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(whole.approx), atol=2e-5
    )


def test_streaming_transform_kernel_backend_facade():
    """StreamingTransform(backend='pallas') routes through the kernel tier
    and still matches the whole-signal transform."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)
    st = StreamingTransform("db4", levels=2, boundary="zero",
                            backend="pallas")
    outs = [st.process(x[s : s + 512]) for s in range(0, 2048, 512)]
    whole = vw.modwt_multilevel(x, "db4", levels=2, boundary="zero",
                                backend="jnp")
    approx = jnp.concatenate([o.approx for o in outs], axis=-1)
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(whole.approx), atol=2e-5
    )
    assert st.statistics["blocks_processed"] == 4
