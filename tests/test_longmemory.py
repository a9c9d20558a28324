"""Long-memory toolkit: Hurst estimation + variance change-point test.

Beyond-reference capability (the reference's finance analyzer has no
long-range-dependence estimator).  Tests pin the statistical ground truths:
white noise is H=0.5 fGn, a random walk is H=0.5 fBm, spectrally synthesized
fGn recovers its H, the Inclán–Tiao test localizes an injected variance
break and holds its size on homogeneous noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.errors import InvalidArgumentError
from vectorwave_tpu.transforms.longmemory import kolmogorov_critical_value


def _fgn(hurst: float, n: int, seed: int) -> np.ndarray:
    """Spectral synthesis of fractional Gaussian noise (f^-(2H-1) spectrum)."""
    rng = np.random.default_rng(seed)
    freqs = np.fft.rfftfreq(n)
    amp = np.zeros_like(freqs)
    amp[1:] = freqs[1:] ** (-(2.0 * hurst - 1.0) / 2.0)
    phases = np.exp(2j * np.pi * rng.random(freqs.shape))
    spec = amp * phases
    spec[0] = 0.0
    x = np.fft.irfft(spec, n=n)
    return x / x.std()


# ---------------------------------------------------------------------------
# Hurst exponent
# ---------------------------------------------------------------------------


def test_hurst_white_noise_is_half():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(2**15))
    r = vw.hurst_exponent(x, "db4", 8, model="fgn")
    assert abs(float(r.hurst) - 0.5) < 0.03
    assert abs(float(r.spectral_exponent)) < 0.06  # alpha = 0 for white noise
    assert float(r.stderr) < 0.05


def test_hurst_random_walk_is_half_fbm():
    """Fine octaves are biased for a random walk (its 1/(4 sin^2 pi f)
    spectrum matches f^-2 only at low f), so drop them via min_level —
    the documented Abry–Veitch practice the parameter exists for."""
    steps = np.random.default_rng(1).standard_normal(2**15)
    x = jnp.asarray(np.cumsum(steps))
    r = vw.hurst_exponent(x, "db4", 8, model="fbm", min_level=3)
    assert abs(float(r.hurst) - 0.5) < 0.05
    biased = vw.hurst_exponent(x, "db4", 8, model="fbm")
    assert abs(float(r.hurst) - 0.5) < abs(float(biased.hurst) - 0.5)


def test_hurst_recovers_synthesized_fgn():
    for h in (0.65, 0.85):
        x = jnp.asarray(_fgn(h, 2**15, seed=int(h * 100)))
        r = vw.hurst_exponent(x, "db4", 8, model="fgn")
        assert abs(float(r.hurst) - h) < 0.07, (h, float(r.hurst))


def test_hurst_batched_and_jittable():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 4096)), jnp.float32)
    r = jax.jit(lambda z: vw.hurst_exponent(z, "haar", 6))(x)
    assert r.hurst.shape == (4,) and r.variance.shape == (4, 6)
    assert np.all(np.abs(np.asarray(r.hurst) - 0.5) < 0.15)


def test_hurst_level_window_and_validation():
    x = jnp.asarray(np.random.default_rng(4).standard_normal(8192))
    full = vw.hurst_exponent(x, "db4", 6)
    windowed = vw.hurst_exponent(x, "db4", 6, min_level=2, max_level=5)
    assert abs(float(windowed.hurst) - 0.5) < 0.1
    assert full.variance.shape == windowed.variance.shape  # full table kept
    with pytest.raises(InvalidArgumentError):
        vw.hurst_exponent(x, "db4", 6, model="arfima")
    with pytest.raises(InvalidArgumentError):
        vw.hurst_exponent(x, "db4", 6, min_level=6)  # no 2-point fit
    with pytest.raises(InvalidArgumentError):
        vw.hurst_exponent(x, "db4", 6, min_level=0)


# ---------------------------------------------------------------------------
# variance change-point test
# ---------------------------------------------------------------------------


def test_variance_change_detects_break():
    rng = np.random.default_rng(5)
    n = 4096
    x = rng.standard_normal(n)
    x[n // 2 :] *= 3.0
    r = vw.variance_change_test(jnp.asarray(x), "db4", level=1)
    assert bool(r.reject)
    assert abs(int(r.location) - n // 2) < n // 10
    assert float(r.statistic) > r.critical_value


def test_variance_change_size_on_homogeneous_noise():
    """Monte-Carlo size: the 5% test rejects ~5% of homogeneous series.

    Detail correlation at level 1 makes the size approximate; accept a
    generous [0, 12%] band over 256 trials.
    """
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((256, 1024)), jnp.float32)
    r = vw.variance_change_test(x, "db4", level=1, confidence=0.95)
    assert r.statistic.shape == (256,)
    rate = float(jnp.mean(r.reject.astype(jnp.float32)))
    assert rate <= 0.12, rate


def test_variance_change_validation_and_kolmogorov():
    # Kolmogorov quantiles pinned to the published table.
    assert abs(kolmogorov_critical_value(0.95) - 1.358) < 2e-3
    assert abs(kolmogorov_critical_value(0.99) - 1.628) < 2e-3
    with pytest.raises(InvalidArgumentError):
        kolmogorov_critical_value(1.5)
    with pytest.raises(InvalidArgumentError):
        vw.variance_change_test(jnp.zeros(32), "db8", level=2)  # M too small
    with pytest.raises(InvalidArgumentError):
        vw.variance_change_test(jnp.zeros(1024), "db4", level=0)
