"""Multi-asset portfolio risk analysis with batched wavelet transforms.

Counterpart of the reference's PortfolioRiskAnalyzer example
(vectorwave-examples/.../PortfolioRiskAnalyzer.java): per-asset wavelet
volatility decomposition, scale-wise cross-asset correlation, and
drawdown/crash screening — but batched over the asset axis in one jit
program instead of a thread pool.  Run: python examples/portfolio_risk.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from vectorwave_tpu import finance
from vectorwave_tpu.transforms.multilevel import modwt_multilevel

ASSETS = ["EQUITY", "BONDS", "GOLD", "CRYPTO"]
N = 2048
LEVELS = 5


def simulate_portfolio(rng: np.random.Generator) -> np.ndarray:
    """Correlated returns: a common market factor plus idiosyncratic noise."""
    market = rng.normal(0.0003, 0.008, N)
    betas = np.array([1.0, -0.25, 0.1, 1.8])
    vols = np.array([0.006, 0.003, 0.008, 0.03])
    idio = rng.normal(0.0, 1.0, (len(ASSETS), N)) * vols[:, None]
    rets = betas[:, None] * market[None, :] + idio
    rets[0, 1500:1504] -= 0.04  # equity drawdown event
    rets[3, 1500:1510] -= 0.06  # crypto follows, amplified
    return rets


def main() -> None:
    rng = np.random.default_rng(11)
    rets = simulate_portfolio(rng)
    prices = 100.0 * np.exp(np.cumsum(rets, axis=1))

    # One batched 5-level MODWT over all assets: leading axes are batch axes.
    res = modwt_multilevel(jnp.asarray(rets, jnp.float32), "db4", levels=LEVELS)
    details = jnp.stack(res.details)          # [levels, assets, N]

    # Scale-wise volatility profile per asset (std of each detail band).
    band_vol = np.asarray(jnp.std(details, axis=-1)).T  # [assets, levels]
    print("per-scale volatility (rows=assets, cols=levels 1..%d):" % LEVELS)
    for name, row in zip(ASSETS, band_vol):
        print(f"  {name:<7}" + "".join(f" {v:.5f}" for v in row))

    # Scale-wise correlation with the equity factor: short scales decouple,
    # long scales show the common market factor.
    eq = details[:, 0, :]
    print("correlation vs EQUITY by scale:")
    for j in range(LEVELS):
        cors = []
        for a in range(1, len(ASSETS)):
            c = np.corrcoef(np.asarray(eq[j]), np.asarray(details[j, a]))[0, 1]
            cors.append(f"{ASSETS[a]}={c:+.2f}")
        print(f"  level {j + 1}: " + "  ".join(cors))

    # Portfolio-level screening with the finance toolkit.
    weights = np.array([0.4, 0.3, 0.2, 0.1])
    port_prices = prices.T @ weights
    market = finance.analyze_market(port_prices)
    print(f"portfolio max drawdown: {market.max_drawdown:.1%}, "
          f"risk level {market.current_risk_level:.2f}")

    crashes = finance.detect_market_crashes(port_prices)
    print(f"crash points: {crashes.crash_points[:5]} "
          f"(max severity {crashes.max_severity:.1f})")

    # Risk decomposition: share of portfolio variance carried per scale.
    port_details = jnp.einsum("jan,a->jn", details, jnp.asarray(weights, jnp.float32))
    var_by_scale = np.asarray(jnp.var(port_details, axis=-1))
    share = var_by_scale / var_by_scale.sum()
    print("variance share by scale: " +
          "  ".join(f"L{j + 1}={s:.1%}" for j, s in enumerate(share)))


if __name__ == "__main__":
    main()
