"""Real-time market monitoring: sliding-window transform + per-tick metrics.

Counterpart of the reference's RealTimeMarketMonitor and
StreamingFinancialDemo examples: ticks arrive one at a time, a
sliding-window MODWT keeps an overlap of L-1 samples so every window is
bit-identical to the whole-signal transform, and an O(1)-per-tick
incremental wavelet state tracks crash energy and denoised Sharpe without
re-transforming history.  Run: python examples/realtime_market_monitor.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from vectorwave_tpu.finance.incremental import (
    analyze_ticks_incremental,
    incremental_wavelet_init,
    incremental_wavelet_update,
)
from vectorwave_tpu.streaming.sliding import SlidingStreamingTransform


def main() -> None:
    rng = np.random.default_rng(3)
    n = 4096
    rets = rng.normal(0.0002, 0.006, n)
    rets[3000:3003] = (-0.08, -0.04, -0.02)  # flash crash mid-stream
    prices = 100.0 * np.exp(np.cumsum(rets))

    # --- sliding-window transform: per-tick feed, overlap = L-1 ---------
    mon = SlidingStreamingTransform("db4", buffer_size=256, levels=3)
    alerts = []
    for t, p in enumerate(prices):
        out = mon.process_sample(np.float32(np.log(p)))
        if out is None:
            continue
        d1 = np.asarray(out.details[0])
        spike = float(np.max(np.abs(d1[-mon.step :])))
        if spike > 0.02:
            alerts.append((t, spike))
    stats = mon.statistics
    print(f"sliding monitor: {stats['samples_processed']} ticks, "
          f"{stats['windows_emitted']} windows, step={mon.step}")
    # Each emitted window's fresh span is the last `step` ticks; the crash at
    # tick 3000 surfaces in the first window whose span covers it.
    hits = [t for t, _ in alerts if t - mon.step <= 3000 <= t]
    print(f"alert windows covering the crash: {hits} "
          f"(spike {max(s for _, s in alerts):.3f} vs quiet ~0.007)")

    # --- O(1)-per-tick incremental wavelet metrics (lax.scan over ticks) -
    metrics = analyze_ticks_incremental(prices)
    score = np.asarray(metrics.crash_score)
    peak = int(np.argmax(score))
    flagged = np.flatnonzero(np.asarray(metrics.crash_detected))
    print(f"incremental crash-score peak at tick {peak} "
          f"(event injected at 3000), value {score[peak]:.2f}; "
          f"{flagged.size} ticks flagged")
    print(f"final state: regime code {int(np.asarray(metrics.regime_code)[-1])}, "
          f"risk level {float(np.asarray(metrics.risk_level)[-1]):.2f}, "
          f"rolling Sharpe {float(np.asarray(metrics.base.sharpe)[-1]):.3f}")

    # --- the same state machine, driven tick-by-tick (live-loop shape) --
    st = incremental_wavelet_init()
    for p in prices[:16]:
        st, m = incremental_wavelet_update(st, np.float32(p))
    print(f"after 16 live ticks: haar detail {float(m.haar_detail):+.5f}, "
          f"wavelet vol {float(m.wavelet_vol):.5f}")


if __name__ == "__main__":
    main()
