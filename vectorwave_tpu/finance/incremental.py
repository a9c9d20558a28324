"""O(1)-per-tick incremental financial metrics.

TPU-native re-design of the reference's streaming analyzers
(``/root/reference/vectorwave-core/.../wavelet/cwt/finance/IncrementalFinancialAnalyzer.java``
and ``SimpleStreamingAnalyzer.java``): instead of a mutable object updated per
tick, the state is an explicit NamedTuple carry and the update is a pure
function — directly usable with ``jax.lax.scan`` to process a whole tick
stream in one fused device loop, or called tick-at-a-time from Python.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class IncrementalState(NamedTuple):
    """EWMA/rolling carry for the streaming metrics."""

    count: jnp.ndarray
    last_price: jnp.ndarray
    mean_return: jnp.ndarray  # EWMA of returns
    var_return: jnp.ndarray  # EWMA variance of returns
    ewma_vol_fast: jnp.ndarray
    ewma_vol_slow: jnp.ndarray
    peak_price: jnp.ndarray
    max_drawdown: jnp.ndarray


class IncrementalMetrics(NamedTuple):
    ret: jnp.ndarray
    volatility: jnp.ndarray
    sharpe: jnp.ndarray
    drawdown: jnp.ndarray
    max_drawdown: jnp.ndarray
    vol_ratio: jnp.ndarray  # fast/slow volatility regime indicator


def incremental_init(dtype=jnp.float32) -> IncrementalState:
    zero = jnp.zeros((), dtype=dtype)
    return IncrementalState(
        count=zero,
        last_price=zero,
        mean_return=zero,
        var_return=zero,
        ewma_vol_fast=zero,
        ewma_vol_slow=zero,
        peak_price=zero,
        max_drawdown=zero,
    )


def incremental_update(
    state: IncrementalState,
    price,
    *,
    alpha_mean: float = 0.05,
    alpha_fast: float = 0.2,
    alpha_slow: float = 0.02,
) -> tuple[IncrementalState, IncrementalMetrics]:
    """One tick -> (new_state, metrics); O(1) work, jit/scan friendly
    (IncrementalFinancialAnalyzer's EWMA scheme)."""
    price = jnp.asarray(price, dtype=state.last_price.dtype)
    first = state.count == 0
    ret = jnp.where(
        first, 0.0, jnp.log(jnp.maximum(price, 1e-30) / jnp.maximum(state.last_price, 1e-30))
    )
    mean = jnp.where(first, 0.0, (1 - alpha_mean) * state.mean_return + alpha_mean * ret)
    var = jnp.where(
        first, 0.0, (1 - alpha_mean) * state.var_return + alpha_mean * (ret - mean) ** 2
    )
    vol_fast = jnp.where(
        first, 0.0, (1 - alpha_fast) * state.ewma_vol_fast + alpha_fast * jnp.abs(ret)
    )
    vol_slow = jnp.where(
        first, 0.0, (1 - alpha_slow) * state.ewma_vol_slow + alpha_slow * jnp.abs(ret)
    )
    peak = jnp.maximum(state.peak_price, price)
    drawdown = (peak - price) / jnp.maximum(peak, 1e-30)
    max_dd = jnp.maximum(state.max_drawdown, drawdown)
    std = jnp.sqrt(jnp.maximum(var, 1e-30))
    metrics = IncrementalMetrics(
        ret=ret,
        volatility=std,
        sharpe=mean / std,
        drawdown=drawdown,
        max_drawdown=max_dd,
        vol_ratio=vol_fast / jnp.maximum(vol_slow, 1e-30),
    )
    new_state = IncrementalState(
        count=state.count + 1,
        last_price=price,
        mean_return=mean,
        var_return=var,
        ewma_vol_fast=vol_fast,
        ewma_vol_slow=vol_slow,
        peak_price=peak,
        max_drawdown=max_dd,
    )
    return new_state, metrics
