"""Sliding-window streaming parity (MODWTStreamingTransformImpl semantics).

Invariants (reference: overlap = filterLen-1 kept in place, consume
bufferSize-overlap new samples per transform, first emit when the buffer
fills):

* the emitted window coefficients equal the direct transform of the last
  ``buffer_size`` stream samples, bit-exactly;
* per-sample feeding and arbitrary-chunk feeding emit identical results at
  identical stream positions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.streaming import (
    SlidingStreamingTransform,
    sliding_init,
    sliding_push,
    step_size,
)

from .conftest import composite_sin


def test_step_size_matches_reference_overlap():
    # db4: filter length 8 -> overlap 7; consume bufferSize - 7 per transform
    assert step_size(512, "db4") == 512 - 7
    assert step_size(512, "haar") == 512 - 1
    # multi-level overlap: (L0-1)*(2^J-1) = 7*7 = 49 for db4 J=3
    assert step_size(512, "db4", levels=3) == 512 - 49
    with pytest.raises(vw.InvalidArgumentError):
        step_size(40, "db4", levels=3)  # overlap 49 >= buffer


def test_window_tracks_stream_tail():
    state = sliding_init(16)
    stream = jnp.arange(1.0, 41.0)
    state = sliding_push(state, stream[:16])
    np.testing.assert_array_equal(np.asarray(state.window), np.asarray(stream[:16]))
    state = sliding_push(state, stream[16:25])
    np.testing.assert_array_equal(np.asarray(state.window), np.asarray(stream[9:25]))
    assert int(state.samples_seen) == 25


def test_emitted_windows_match_direct_transform():
    buffer_size = 128
    t = SlidingStreamingTransform("db4", buffer_size=buffer_size, boundary="periodic")
    stream = composite_sin(1000, noise_std=0.2)
    results = t.process(stream)
    # first emit at buffer_size, then every step
    step = step_size(buffer_size, "db4")
    assert len(results) == 1 + (1000 - buffer_size) // step
    for i, res in enumerate(results):
        end = buffer_size + i * step
        window = jnp.asarray(stream[end - buffer_size : end], dtype=jnp.float32)
        direct = vw.modwt(window, "db4", boundary="periodic")
        np.testing.assert_allclose(
            np.asarray(res.approx), np.asarray(direct.approx), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.detail), np.asarray(direct.detail), atol=1e-6
        )


def test_per_sample_equals_chunked():
    buffer_size = 64
    stream = composite_sin(300, seed=3, noise_std=0.1)
    chunked = SlidingStreamingTransform("haar", buffer_size=buffer_size)
    per_sample = SlidingStreamingTransform("haar", buffer_size=buffer_size)
    res_a = chunked.process(stream)
    res_b = []
    for s in stream:
        out = per_sample.process_sample(float(s))
        if out is not None:
            res_b.append(out)
    assert len(res_a) == len(res_b)
    for a, b in zip(res_a, res_b):
        np.testing.assert_array_equal(np.asarray(a.approx), np.asarray(b.approx))


def test_multilevel_window_and_flush():
    t = SlidingStreamingTransform(
        "db4", buffer_size=256, levels=3, boundary="symmetric"
    )
    stream = composite_sin(400, seed=5)
    results = t.process(stream)
    assert len(results) >= 1
    assert results[-1].levels == 3
    tail = t.flush()
    assert tail is not None and tail.levels == 3
    stats = t.statistics
    assert stats["samples_processed"] == 400
    assert stats["windows_emitted"] == len(results) + 1
    t.reset()
    assert t.statistics["windows_emitted"] == 0
    assert t.process(stream[:10]) == []


def test_buffer_cap_enforced():
    with pytest.raises(vw.InvalidArgumentError):
        sliding_init(50_000_000)  # 200 MB of f32 > 100 MB cap


def test_batched_sliding():
    t = SlidingStreamingTransform("db2", buffer_size=64, batch_shape=(3,))
    block = np.stack([composite_sin(64, seed=s) for s in range(3)])
    (res,) = t.process(jnp.asarray(block))
    direct = vw.modwt(jnp.asarray(block, dtype=jnp.float32), "db2")
    np.testing.assert_allclose(
        np.asarray(res.detail), np.asarray(direct.detail), atol=1e-6
    )
