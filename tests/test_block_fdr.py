"""FDR threshold selection and NeighBlock block shrinkage."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.ops.thresholds import (
    block_shrink,
    fdr_threshold,
    mad_sigma,
    universal_threshold,
)


def _snr(clean, est):
    return 10 * np.log10(np.sum(clean**2) / np.sum((est - clean) ** 2))


def _doppler(n):
    t = np.linspace(1e-3, 1, n)
    x = np.sqrt(t * (1 - t)) * np.sin(2.1 * np.pi / (t + 0.05))
    return x / x.std()


def test_fdr_pure_noise_kills_everything():
    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    t = fdr_threshold(noise, 1.0, q=0.05)
    survivors = np.sum(np.abs(np.asarray(noise)) > np.asarray(t).item())
    # at most a handful of false discoveries out of 4096
    assert survivors <= 8


def test_fdr_adapts_below_universal_when_signal_is_dense():
    rng = np.random.default_rng(1)
    n = 4096
    clean = np.zeros(n)
    idx = rng.choice(n, size=n // 4, replace=False)
    clean[idx] = 6.0 * rng.choice([-1.0, 1.0], size=n // 4)
    coeffs = jnp.asarray((clean + rng.standard_normal(n)).astype(np.float32))
    t_fdr = np.asarray(fdr_threshold(coeffs, 1.0)).item()
    t_uni = np.asarray(universal_threshold(n, 1.0)).item()
    assert t_fdr < 0.75 * t_uni  # keeps far more of a dense signal
    kept = np.sum(np.abs(np.asarray(coeffs)) > t_fdr)
    assert kept >= n // 4 * 0.9  # nearly every true spike survives


def test_fdr_batch_shapes_and_dispatch():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32))
    sigma = mad_sigma(x)
    t = fdr_threshold(x, sigma)
    assert t.shape == (3, 1)
    # end-to-end through the method dispatcher
    den = vw.denoise_multilevel(x, "db4", levels=3, method="fdr")
    assert den.shape == x.shape
    assert np.all(np.isfinite(np.asarray(den)))


def test_block_shrink_preserves_strong_blocks_and_kills_noise():
    n = 1024
    c = np.zeros(n, dtype=np.float32)
    c[100:116] = 10.0  # one strong feature
    out = np.asarray(block_shrink(jnp.asarray(c), 1.0))
    # the feature survives nearly intact
    assert np.linalg.norm(out[100:116]) > 0.9 * np.linalg.norm(c[100:116])
    rng = np.random.default_rng(3)
    noise = rng.standard_normal(n).astype(np.float32)
    out_noise = np.asarray(block_shrink(jnp.asarray(noise), 1.0))
    assert np.sum(out_noise**2) < 0.05 * np.sum(noise**2)


def test_block_shrink_tiny_sigma_is_identity_like():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    out = np.asarray(block_shrink(x, 1e-6))
    assert np.allclose(out, np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("n", [1000, 1024])  # non-pow2 exercises the tail block
def test_denoise_block_beats_universal_on_doppler(n):
    rng = np.random.default_rng(5)
    clean = _doppler(n)
    noisy = jnp.asarray((clean + 0.3 * rng.standard_normal(n)).astype(np.float32))
    den_block = np.asarray(vw.denoise_block(noisy, "sym8", levels=5))
    den_uni = np.asarray(vw.denoise_multilevel(noisy, "sym8", levels=5))
    assert _snr(clean, den_block) > _snr(clean, np.asarray(noisy)) + 6
    assert _snr(clean, den_block) > _snr(clean, den_uni)


def test_denoise_block_batched():
    rng = np.random.default_rng(6)
    clean = np.stack([_doppler(512), -_doppler(512)])
    noisy = jnp.asarray(
        (clean + 0.25 * rng.standard_normal((2, 512))).astype(np.float32)
    )
    den = np.asarray(vw.denoise_block(noisy, "db4", levels=4))
    assert den.shape == (2, 512)
    for i in range(2):
        assert _snr(clean[i], den[i]) > _snr(clean[i], np.asarray(noisy)[i]) + 4


def test_fdr_exceeds_universal_for_nonsignificant_outlier():
    """A lone coefficient above VisuShrink whose p-value still fails the BH
    step-up must die: the FDR threshold is NOT capped at the universal
    threshold (that cap would make the 'sparse -> kills aggressively'
    behavior unreachable)."""
    rng = np.random.default_rng(0)
    noise = (rng.standard_normal(4096) * 0.999).astype(np.float32)
    noise[0] = 4.2  # p = 2.7e-5 > q/n = 1.2e-5: not a discovery
    t = np.asarray(fdr_threshold(jnp.asarray(noise), 1.0, q=0.05)).item()
    uni = np.asarray(universal_threshold(4096, 1.0)).item()
    assert t >= 4.2 - 1e-6
    assert t > uni
