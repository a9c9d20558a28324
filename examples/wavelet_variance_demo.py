"""Wavelet variance ANOVA: which time scales carry a series' variance?

Beyond-reference capability: the Percival–Walden scale-by-scale variance
decomposition with chi-squared confidence intervals, plus the cross-series
covariance/correlation split.  Classic use: separating fast microstructure
noise from slow trend variance in market data.

Run: python examples/wavelet_variance_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(11)
    n = 2**14
    t = np.arange(n)

    # fast noise + a slow cycle: variance should split across scales
    slow = 1.5 * np.sin(2 * np.pi * t / 512)
    x = jnp.asarray(slow + 0.8 * rng.standard_normal(n))

    r = vw.wavelet_variance(x, "db4", 8, confidence=0.95)
    print("level  scale  variance   95% CI            edof")
    for j in range(r.n_levels):
        print(f"  {j + 1}    {int(r.scales[j]):4d}  "
              f"{float(r.variance[j]):.4f}   "
              f"[{float(r.ci_low[j]):.4f}, {float(r.ci_high[j]):.4f}]  "
              f"{int(r.edof[j])}")
    peak = int(jnp.argmax(r.variance)) + 1
    print(f"dominant scale: level {peak} (tau ~ {int(r.scales[peak - 1])} samples; "
          f"the 512-sample cycle lives at levels 8-9)")

    # white noise halves its variance per level: nu_j^2 = sigma^2 / 2^j
    wn = jnp.asarray(rng.standard_normal(n))
    rw = vw.wavelet_variance(wn, "db4", 6)
    ratios = np.asarray(rw.variance) * 2.0 ** np.arange(1, 7)
    print(f"\nwhite-noise check (nu_j^2 * 2^j / sigma^2 ~ 1): "
          f"{np.round(ratios, 2)}")

    # cross-series: two assets sharing the slow factor, independent noise
    y = jnp.asarray(slow + 0.8 * rng.standard_normal(n))
    rho, scales = vw.wavelet_correlation(x, y, "db4", 8)
    print("\nper-scale correlation (shared slow factor):")
    for j, (s, p) in enumerate(zip(scales, np.asarray(rho)), start=1):
        bar = "#" * int(max(p, 0) * 30)
        print(f"  level {j} (tau {int(s):4d}): {p:+.2f} {bar}")
    print("short scales ~ 0 (independent noise), long scales -> 1 (shared cycle)")

    # streaming: fold arriving blocks into an O(J) accumulator — the result
    # EQUALS the whole-signal estimator (boundary-free coefficients only)
    from vectorwave_tpu.streaming import modwt_stream_block, streaming_init

    st = streaming_init("db4", 6)
    acc = vw.variance_stream_init("db4", 6)
    for i in range(0, n, 1024):
        st, res = modwt_stream_block(st, wn[i : i + 1024], "db4", boundary="zero")
        acc = vw.variance_stream_update(acc, res.details, "db4")
    streamed = vw.variance_stream_result(acc)
    drift = float(jnp.max(jnp.abs(streamed.variance - rw.variance)))
    print(f"\nstreamed-vs-batch wavelet variance max |diff|: {drift:.2e}")

    # long memory: Hurst exponent (white noise -> 0.5) + variance break test
    h = vw.hurst_exponent(wn, "db4", 8)
    print(f"Hurst of white noise: {float(h.hurst):.3f} "
          f"(+/- {float(h.stderr):.3f}, truth 0.5)")
    broke = np.asarray(wn).copy()
    broke[n // 2 :] *= 2.5
    tst = vw.variance_change_test(jnp.asarray(broke), "db4", level=1)
    print(f"variance break: stat {float(tst.statistic):.2f} vs crit "
          f"{tst.critical_value:.2f} -> reject={bool(tst.reject)}, "
          f"located at t~{int(tst.location)} (injected at {n // 2})")


if __name__ == "__main__":
    main()
