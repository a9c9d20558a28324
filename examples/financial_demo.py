"""Financial wavelet analysis walkthrough.

Counterpart of the reference's finance demos (cwt/finance usage in
vectorwave-examples).  Run: python examples/financial_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from vectorwave_tpu import finance


def main() -> None:
    rng = np.random.default_rng(7)
    n = 1024
    rets = rng.normal(0.0004, 0.01, n)
    rets[700] = -0.11  # engineered crash
    rets[701] = -0.05
    prices = 100.0 * np.exp(np.cumsum(rets))

    sr = float(finance.sharpe_ratio(jnp.asarray(rets)))
    wsr = float(finance.wavelet_sharpe_ratio(jnp.asarray(rets)))
    print(f"Sharpe: {sr:.4f}   wavelet-denoised Sharpe: {wsr:.4f}")

    crashes = finance.detect_market_crashes(prices)
    near = [p for p in crashes.crash_points if 690 <= p <= 710]
    print(f"crash flagged near t=700: {near} (max severity {crashes.max_severity:.1f})")

    vol = finance.analyze_volatility(prices)
    print(f"volatility clusters: {len(vol.volatility_clusters)}, "
          f"avg {vol.average_volatility:.4f}, max {vol.max_volatility:.4f}")

    market = finance.analyze_market(prices)
    print(f"max drawdown: {market.max_drawdown:.1%}, "
          f"risk level: {market.current_risk_level:.2f}, "
          f"anomalies: {len(market.anomalies)}")

    signals = finance.generate_trading_signals(prices)
    kinds = {}
    for s in signals.signals:
        kinds[s.type.value] = kinds.get(s.type.value, 0) + 1
    print(f"signals: {kinds}, strategy Sharpe {signals.sharpe_ratio:.3f}, "
          f"win rate {signals.win_rate:.1%}")

    # O(1)-per-tick streaming metrics via lax.scan
    import jax

    state = finance.incremental_init(jnp.float32)
    state, metrics = jax.lax.scan(
        lambda c, p: finance.incremental_update(c, p), state, jnp.asarray(prices, dtype=jnp.float32)
    )
    print(f"incremental: final drawdown {float(state.max_drawdown):.1%}, "
          f"vol ratio tail {float(metrics.vol_ratio[-1]):.2f}")


if __name__ == "__main__":
    main()
