"""Empirical wavelet transform: boundary detection, tight frame, PR,
mode separation, Hilbert modes."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError
from vectorwave_tpu.transforms.ewt import ewt_filterbank


def _three_tone(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    parts = [
        np.sin(2 * np.pi * 0.03 * t),
        0.8 * np.sin(2 * np.pi * 0.11 * t),
        0.6 * np.sin(2 * np.pi * 0.3 * t),
    ]
    x = sum(parts) + 0.05 * rng.standard_normal(n)
    return x.astype(np.float32), parts


def test_boundaries_separate_known_tones():
    x, _ = _three_tone()
    b = vw.ewt_boundaries(x, 3)
    assert len(b) == 2
    assert 0.03 < b[0] < 0.11
    assert 0.11 < b[1] < 0.3


def test_tight_frame_and_perfect_reconstruction():
    x, _ = _three_tone()
    for bounds in [(0.05, 0.2), (0.01, 0.02, 0.4), (0.25,)]:
        bank = ewt_filterbank(4096, bounds, np.float64)
        ss = (bank**2).sum(axis=0)
        np.testing.assert_allclose(ss, 1.0, atol=1e-12)  # exact tight frame
        comps = vw.ewt(jnp.asarray(x), bounds)
        xr = vw.iewt(comps, bounds)
        assert float(jnp.max(jnp.abs(xr - x))) < 1e-5
        assert comps.shape == (len(bounds) + 1, 4096)


def test_modes_match_their_sources():
    x, parts = _three_tone()
    bounds = vw.ewt_boundaries(x, 3)
    comps = np.asarray(vw.ewt(jnp.asarray(x), bounds))
    for band, src in enumerate(parts):
        c = comps[band]
        corr = np.corrcoef(c, src)[0, 1]
        assert corr > 0.98, (band, corr)


def test_hilbert_modes_give_instantaneous_amplitude():
    x, _ = _three_tone()
    bounds = vw.ewt_boundaries(x, 3)
    analytic = np.asarray(vw.ewt_hilbert(jnp.asarray(x), bounds))
    # tone amplitudes 1.0 / 0.8 / 0.6 recovered as near-constant envelopes
    for band, amp in enumerate((1.0, 0.8, 0.6)):
        env = np.abs(analytic[band])[64:-64]
        assert abs(env.mean() - amp) < 0.08
        assert env.std() < 0.1


def test_batch_and_jit_with_static_boundaries():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 1024)).astype(np.float32))
    bounds = (0.1, 0.25)
    fn = jax.jit(lambda y: vw.ewt(y, bounds))
    comps = fn(x)
    assert comps.shape == (2, 3, 3, 1024)
    xr = vw.iewt(comps, bounds)
    assert float(jnp.max(jnp.abs(xr - x))) < 1e-5


def test_validation():
    with pytest.raises(VectorWaveError):
        vw.ewt(jnp.zeros(256), (0.3, 0.2))  # not increasing
    with pytest.raises(VectorWaveError):
        vw.ewt(jnp.zeros(256), (0.6,))  # out of range
    with pytest.raises(VectorWaveError):
        vw.ewt_boundaries(np.zeros(256), 1)  # n_bands < 2
    with pytest.raises(VectorWaveError):
        # white-flat spectrum after heavy smoothing: too few peaks
        vw.ewt_boundaries(np.ones(64), 5)


def test_ewt_hilbert_keeps_nyquist_even_length():
    """scipy-convention analytic weights (DC and Nyquist = 1): the real part
    of each analytic mode must reproduce the mode itself, including any
    energy at the Nyquist bin of an even-length signal."""
    t = np.arange(512)
    x = jnp.asarray(
        np.sin(2 * np.pi * 0.45 * t) + np.sin(2 * np.pi * 0.08 * t), jnp.float32
    )
    bounds = (0.25,)
    comps = np.asarray(vw.ewt(x, bounds))
    ana = vw.ewt_hilbert(x, bounds)
    np.testing.assert_allclose(np.asarray(ana.real), comps, atol=1e-5)


def test_ewt_boundaries_rank_by_prominence_not_height():
    """AM sidebands riding a dominant carrier are taller than a genuine weak
    second band; height ranking would spend both peak slots inside the
    carrier cluster, prominence keeps the real band."""
    rng = np.random.default_rng(0)
    n = 4096
    t = np.arange(n)
    strong = (1 + 0.35 * np.cos(2 * np.pi * 0.004 * t)) * np.sin(
        2 * np.pi * 0.10 * t
    )
    weak = 0.18 * np.sin(2 * np.pi * 0.35 * t)
    sig = strong + weak + 0.01 * rng.standard_normal(n)
    (bound,) = vw.ewt_boundaries(sig, 2, smooth=3)
    assert 0.11 < bound < 0.34


def test_ewt_traced_boundaries_match_static():
    """A traced jnp boundaries array builds the bank ON DEVICE: same
    windows as the static tuple path, one compiled program for every
    boundary set of a band count, and gradients flow through the
    boundaries."""
    import jax

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(4096), jnp.float32)
    bounds = (0.05, 0.15, 0.35)
    a = np.asarray(vw.ewt(x, bounds))
    b = np.asarray(vw.ewt(x, jnp.asarray(bounds)))
    np.testing.assert_allclose(a, b, atol=1e-5)

    rt = jax.jit(lambda z, bd: vw.iewt(vw.ewt(z, bd), bd))
    for bs in ((0.05, 0.15, 0.35), (0.08, 0.22, 0.4)):
        err = float(jnp.max(jnp.abs(rt(x, jnp.asarray(bs)) - x)))
        assert err < 1e-5, (bs, err)

    g = jax.grad(
        lambda bd: jnp.sum(vw.ewt(x, bd)[0] ** 2)
    )(jnp.asarray(bounds))
    assert np.isfinite(np.asarray(g)).all()


def test_ewt_concrete_array_boundaries_validated():
    """CONCRETE jnp boundary arrays get the same validation as tuples (a
    decreasing array would silently clamp gamma into a broken frame)."""
    import pytest

    x = jnp.zeros(1024, jnp.float32)
    with pytest.raises(vw.InvalidArgumentError):
        vw.ewt(x, jnp.asarray([0.3, 0.1]))
    with pytest.raises(vw.InvalidArgumentError):
        vw.ewt(x, jnp.asarray([0.7]))
