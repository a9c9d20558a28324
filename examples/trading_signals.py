"""Algorithmic trading signals from wavelet decompositions.

Counterpart of the reference's AlgorithmicTradingSignals example
(vectorwave-examples/.../AlgorithmicTradingSignals.java): multi-scale
trend/momentum signal generation, wavelet technical indicators, and a
toy walk-forward evaluation — one jit-batched pipeline instead of
per-window loops.  Run: python examples/trading_signals.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from vectorwave_tpu.finance.analyzer import (
    FinancialConfig,
    calculate_wavelet_indicators,
    generate_trading_signals,
)

N = 2048


def simulate_prices(rng: np.random.Generator) -> np.ndarray:
    drift = np.concatenate([
        np.full(N // 2, 0.0004),   # bull leg
        np.full(N // 4, -0.0008),  # correction
        np.full(N - N // 2 - N // 4, 0.0002),
    ])
    returns = drift + rng.normal(0, 0.01, N)
    return 100.0 * np.exp(np.cumsum(returns))


def main() -> None:
    rng = np.random.default_rng(11)
    prices = simulate_prices(rng)

    cfg = FinancialConfig()
    result = generate_trading_signals(prices, config=cfg)
    by_type: dict[str, int] = {}
    for s in result.signals:
        by_type[s.type.name] = by_type.get(s.type.name, 0) + 1
    print(f"signals generated: {len(result.signals)}  {by_type}")
    for s in result.signals[:5]:
        print(f"  t={s.time_index:5d}  {s.type.name:<5}  "
              f"confidence={s.confidence:.2f}  {s.rationale}")

    # Built-in walk-forward evaluation: position follows the signal stream.
    print(f"strategy Sharpe: {result.sharpe_ratio:+.3f}   "
          f"win rate: {result.win_rate:.1%}")

    # Indicator SERIES from the MODWT band split (one value per tick).
    ind = calculate_wavelet_indicators(prices)
    print(f"trend strength (last):    {ind.trend_strength[-1]:+.3f}")
    print(f"momentum (last):          {ind.momentum[-1]:+.4f}")
    print(f"volatility index (mean):  {ind.volatility_index.mean():.4f}")
    print(f"support/resistance gap:   {ind.support_resistance[-1]:+.3f}")


if __name__ == "__main__":
    main()
