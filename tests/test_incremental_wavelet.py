"""Per-tick incremental wavelet analyzer (IncrementalFinancialAnalyzer role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.finance import (
    analyze_ticks_incremental,
    incremental_wavelet_init,
    incremental_wavelet_update,
)


def _walk(n, seed=0, drift=0.0005, vol=0.01):
    rng = np.random.default_rng(seed)
    return 100.0 * np.exp(np.cumsum(drift + vol * rng.standard_normal(n)))


def test_haar_detail_closed_form():
    prices = jnp.asarray([100.0, 102.0, 101.0, 101.0], dtype=jnp.float64)
    st = incremental_wavelet_init(dtype=jnp.float64)
    details = []
    for p in prices:
        st, m = incremental_wavelet_update(st, p)
        details.append(float(m.haar_detail))
    # (p_t - p_{t-1}) / 2, first tick zero
    np.testing.assert_allclose(details, [0.0, 1.0, -0.5, 0.0], atol=1e-12)


def test_scan_matches_loop():
    prices = jnp.asarray(_walk(200), dtype=jnp.float32)
    metrics = analyze_ticks_incremental(prices)
    st = incremental_wavelet_init()
    crash_last = None
    for p in prices:
        st, m = incremental_wavelet_update(st, p)
        crash_last = m.crash_score
    np.testing.assert_allclose(
        float(metrics.crash_score[-1]), float(crash_last), rtol=1e-5
    )
    assert metrics.base.ret.shape == (200,)


def test_crash_detection_fires_on_crash():
    n = 400
    prices = _walk(n, seed=3, vol=0.005)
    prices[300:] = prices[300:] * np.exp(
        -0.04 * np.arange(1, n - 300 + 1)
    )  # hard one-sided crash
    metrics = analyze_ticks_incremental(jnp.asarray(prices, dtype=jnp.float32))
    crash = np.asarray(metrics.crash_detected)
    assert crash[300:340].any(), "crash window should trigger detection"
    assert not crash[:250].any(), "calm period should not trigger"
    # risk rises during the crash
    risk = np.asarray(metrics.risk_level)
    assert risk[300:340].max() > risk[100:250].max()


def test_regime_codes():
    n = 300
    up = _walk(n, seed=5, drift=0.004, vol=0.003)
    metrics_up = analyze_ticks_incremental(jnp.asarray(up, dtype=jnp.float32))
    # steady bull market settles into regime 0 (bull/calm)
    assert int(np.median(np.asarray(metrics_up.regime_code)[100:])) == 0
    down = _walk(n, seed=6, drift=-0.004, vol=0.003)
    metrics_dn = analyze_ticks_incremental(jnp.asarray(down, dtype=jnp.float32))
    assert int(np.median(np.asarray(metrics_dn.regime_code)[100:])) >= 2


def test_macd_and_wavelet_vol_finite():
    prices = jnp.asarray(_walk(500, seed=7), dtype=jnp.float32)
    metrics = analyze_ticks_incremental(prices)
    assert np.isfinite(np.asarray(metrics.macd)).all()
    assert np.isfinite(np.asarray(metrics.wavelet_vol)).all()
    assert (np.asarray(metrics.wavelet_vol)[10:] >= 0).all()


def test_jit_single_update():
    st = incremental_wavelet_init()
    step = jax.jit(incremental_wavelet_update)
    st, m = step(st, jnp.float32(100.0))
    st, m = step(st, jnp.float32(101.0))
    assert float(m.haar_detail) == pytest.approx(0.5)
