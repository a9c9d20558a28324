"""Denoising, SWT adapter and padding strategies.

Mirrors the reference's denoising tests (threshold methods, MAD sigma,
SNR-improvement checks) and the SWT adapter behaviors
(``VectorWaveSwtAdapter``: universal threshold, extractLevel band isolation).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from .conftest import composite_sin


def _noisy(n=512, noise=0.5, seed=3):
    rng = np.random.default_rng(seed)
    clean = composite_sin(n)
    return clean, clean + rng.normal(0, noise, n)


def test_soft_hard_threshold():
    c = jnp.asarray([-3.0, -1.0, -0.2, 0.0, 0.4, 1.5, 2.5])
    soft = np.asarray(vw.soft_threshold(c, 1.0))
    hard = np.asarray(vw.hard_threshold(c, 1.0))
    np.testing.assert_allclose(soft, [-2.0, 0.0, 0.0, 0.0, 0.0, 0.5, 1.5], atol=1e-15)
    np.testing.assert_allclose(hard, [-3.0, 0.0, 0.0, 0.0, 0.0, 1.5, 2.5], atol=1e-15)


def test_mad_sigma_estimates_noise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2.0, 4096))
    res = vw.modwt(x, "db4")
    sigma = float(vw.mad_sigma(res.detail)[..., 0])
    # MODWT detail coefficients carry sigma/sqrt(2) for white noise (the
    # 1/sqrt(2) filter scaling) — the reference's estimator has the same
    # convention, and its thresholds are calibrated to it.
    assert abs(sigma - 2.0 / np.sqrt(2.0)) < 0.15


@pytest.mark.parametrize("method", ["universal", "sure", "minimax", "bayes"])
@pytest.mark.parametrize("mode", ["soft", "hard"])
def test_denoise_multilevel_improves_snr(method, mode):
    clean, noisy = _noisy()
    fn = jax.jit(
        partial(vw.denoise_multilevel, wavelet="db4", levels=4, method=method, mode=mode)
    )
    den = np.asarray(fn(jnp.asarray(noisy)))
    mse_before = np.mean((noisy - clean) ** 2)
    mse_after = np.mean((den - clean) ** 2)
    assert mse_after < mse_before, (method, mode, mse_before, mse_after)


def test_denoise_single_level():
    clean, noisy = _noisy(noise=0.3)
    den = np.asarray(vw.denoise(jnp.asarray(noisy), "db4"))
    assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_denoise_fixed_zero_threshold_is_identity():
    _, noisy = _noisy()
    out = np.asarray(vw.denoise_fixed(jnp.asarray(noisy), "db4", 0.0))
    np.testing.assert_allclose(out, noisy, atol=1e-10)


def test_swt_roundtrip_and_threshold():
    clean, noisy = _noisy(noise=1.0)
    res = vw.swt(jnp.asarray(noisy), "sym8", levels=4)
    # round trip without modification
    back = np.asarray(vw.iswt(res, "sym8"))
    np.testing.assert_allclose(back, noisy, atol=1e-9)
    # universal threshold improves SNR
    den = np.asarray(vw.iswt(vw.apply_universal_threshold(res), "sym8"))
    assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)
    # per-level threshold is functional (input unchanged)
    res2 = vw.threshold_level(res, 1, 10.0)
    assert not np.allclose(np.asarray(res2.details[0]), np.asarray(res.details[0]))


def test_swt_denoise_convenience():
    clean, noisy = _noisy(noise=1.0)
    den = np.asarray(vw.swt_denoise(jnp.asarray(noisy), "db4", levels=4))
    assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_extract_level_bands_sum_to_signal():
    x = jnp.asarray(composite_sin(256, noise_std=0.1))
    levels = 3
    total = sum(
        np.asarray(vw.extract_level(x, "db4", levels, target))
        for target in range(0, levels + 1)
    )
    np.testing.assert_allclose(total, np.asarray(x), atol=1e-10)


def test_mra_bands_sum_to_signal():
    x = jnp.asarray(composite_sin(256, noise_std=0.1))
    bands = vw.mra(x, "db4", levels=3)
    assert len(bands) == 4
    np.testing.assert_allclose(sum(np.asarray(b) for b in bands), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize(
    "strategy",
    [
        "zero", "constant", "periodic", "symmetric", "reflect", "antisymmetric",
        "linear_extrapolation", "polynomial_extrapolation", "statistical", "composite",
    ],
)
def test_padding_strategies(strategy):
    x = jnp.asarray(composite_sin(50))
    out = vw.pad_signal(x, 64, strategy)
    assert out.shape == (64,)
    np.testing.assert_allclose(np.asarray(out[:50]), np.asarray(x), atol=1e-12)
    out_sym = vw.pad_signal(x, 64, strategy, align="symmetric")
    np.testing.assert_allclose(np.asarray(out_sym[7:57]), np.asarray(x), atol=1e-12)


def test_padding_semantics():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(vw.pad_signal(x, 5, "zero")), [1, 2, 3, 0, 0])
    np.testing.assert_allclose(np.asarray(vw.pad_signal(x, 5, "constant")), [1, 2, 3, 3, 3])
    np.testing.assert_allclose(np.asarray(vw.pad_signal(x, 5, "periodic")), [1, 2, 3, 1, 2])
    np.testing.assert_allclose(np.asarray(vw.pad_signal(x, 5, "symmetric")), [1, 2, 3, 3, 2])
    np.testing.assert_allclose(np.asarray(vw.pad_signal(x, 5, "reflect")), [1, 2, 3, 2, 1])
    np.testing.assert_allclose(
        np.asarray(vw.pad_signal(x, 5, "linear_extrapolation")), [1, 2, 3, 4, 5]
    )


def test_adaptive_padding_chooser():
    t = np.arange(128)
    periodic = np.sin(2 * np.pi * t / 16)
    assert vw.adaptive_strategy(periodic) == "periodic"
    trend = 0.5 * t + np.random.default_rng(0).normal(0, 0.1, 128)
    assert vw.adaptive_strategy(trend) == "linear_extrapolation"
    rough = np.random.default_rng(0).standard_normal(128)
    assert vw.adaptive_strategy(rough) == "symmetric"
    # jnp input and target shorter than signal error
    with pytest.raises(vw.InvalidArgumentError):
        vw.pad_signal(jnp.zeros(10), 5, "zero")


def test_batched_denoise():
    clean, noisy = _noisy()
    batch = jnp.asarray(np.stack([noisy, noisy * 0.5]))
    den = np.asarray(vw.denoise_multilevel(batch, "db4", levels=3))
    assert den.shape == (2, 512)
    single = np.asarray(vw.denoise_multilevel(jnp.asarray(noisy), "db4", levels=3))
    np.testing.assert_allclose(den[0], single, atol=1e-10)
