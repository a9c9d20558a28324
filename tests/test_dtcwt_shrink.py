"""Bivariate-shrinkage DTCWT denoising: SNR gains, identity behavior."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.denoise import dtcwt2_denoise, dtcwt_denoise


def _snr(clean, est):
    return 10 * np.log10(np.sum(clean**2) / np.sum((est - clean) ** 2))


def _doppler(n):
    t = np.linspace(1e-3, 1, n)
    x = np.sqrt(t * (1 - t)) * np.sin(2.1 * np.pi / (t + 0.05))
    return x / x.std()


@pytest.mark.slow
def test_1d_beats_noisy_and_universal_modwt():
    rng = np.random.default_rng(0)
    clean = _doppler(2048)
    noisy = (clean + 0.35 * rng.standard_normal(2048)).astype(np.float32)
    den = np.asarray(dtcwt_denoise(jnp.asarray(noisy), levels=6))
    den_uni = np.asarray(
        vw.denoise_multilevel(jnp.asarray(noisy), "sym8", levels=6)
    )
    assert _snr(clean, den) > _snr(clean, noisy) + 8
    assert _snr(clean, den) > _snr(clean, den_uni) + 1  # the point of it


@pytest.mark.slow
def test_2d_beats_separable_denoise():
    rng = np.random.default_rng(1)
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx - 64) ** 2 + (yy - 64) ** 2 < 1600).astype(np.float64)
    img += 0.5 * np.cos(2 * np.pi * 0.1 * (0.97 * xx + 0.26 * yy)) * (xx > 80)
    img /= img.std()
    noisy = (img + 0.4 * rng.standard_normal((h, w))).astype(np.float32)
    den = np.asarray(dtcwt2_denoise(jnp.asarray(noisy), levels=4))
    den_sep = np.asarray(vw.denoise2(jnp.asarray(noisy), "sym8", levels=4))
    assert _snr(img, den) > _snr(img, noisy) + 7
    assert _snr(img, den) > _snr(img, den_sep) + 1


def test_clean_signal_nearly_untouched():
    clean = jnp.asarray(_doppler(1024).astype(np.float32))
    den = dtcwt_denoise(clean, levels=5)
    # noise floor estimated from the (signal-bearing) finest level is small
    # relative to the signal: shrinkage must not destroy structure
    assert _snr(np.asarray(clean), np.asarray(den)) > 15


def test_local_power_window_is_uniform():
    from vectorwave_tpu.denoise.dtcwt_shrink import _local_power

    delta = jnp.zeros(32).at[16].set(7.0)
    out = np.asarray(_local_power(delta, 7, (0,)))
    # every tap inside the centered 7-window contributes exactly 1/7
    np.testing.assert_allclose(out[13:20], np.ones(7), rtol=1e-6)
    assert out[12] == 0 and out[20] == 0


@pytest.mark.slow
def test_batch_and_explicit_sigma():
    rng = np.random.default_rng(2)
    clean = np.stack([_doppler(1024), -_doppler(1024)])
    noisy = (clean + 0.3 * rng.standard_normal(clean.shape)).astype(np.float32)
    den = np.asarray(dtcwt_denoise(jnp.asarray(noisy), levels=5, noise_sigma=0.3))
    assert den.shape == noisy.shape
    for b in range(2):
        assert _snr(clean[b], den[b]) > _snr(clean[b], noisy[b]) + 6
