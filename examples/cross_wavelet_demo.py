"""Cross-wavelet analysis: coherence, lead/lag phase, ridges.

Beyond-reference capability — the reference's ComplexCWTResult docstring
lists phase synchronization, instantaneous frequency, ridge extraction and
wavelet coherence as analyses its coefficients "enable"
(ComplexCWTResult.java:9-15); this package implements them.

Run: python examples/cross_wavelet_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.cwt import cwt, scales_log


def main() -> None:
    rng = np.random.default_rng(2)
    n = 2048
    t = np.arange(n)
    scales = scales_log(2, 64, 32)

    # y follows x with a quarter-cycle lag at a 20-sample period
    f0 = 0.05
    x = jnp.asarray(np.sin(2 * np.pi * f0 * t) + 0.4 * rng.standard_normal(n))
    y = jnp.asarray(
        np.sin(2 * np.pi * f0 * (t - 5)) + 0.4 * rng.standard_normal(n)
    )

    wxy = vw.cross_wavelet(x, y, scales, "morl")
    si = int(np.argmax(np.asarray(wxy.magnitude()).mean(axis=-1)))
    lag_phase = float(np.median(np.angle(np.asarray(wxy.coeffs)[si, 256:-256])))
    lag_samples = lag_phase / (2 * np.pi * f0)
    print(f"cross-wavelet dominant scale: {wxy.scales[si]:.1f} "
          f"(period ~ {1 / f0:.0f} samples)")
    print(f"relative phase there: {lag_phase:+.2f} rad -> "
          f"x leads y by ~{lag_samples:.1f} samples (true lag: 5)")

    coh = vw.wavelet_coherence(x, y, scales, "morl")
    indep = jnp.asarray(rng.standard_normal(n))
    coh_i = vw.wavelet_coherence(x, indep, scales, "morl")
    print(f"\ncoherence at the shared tone: "
          f"{float(coh.mean_coherence()[si]):.2f} (locked pair) vs "
          f"{float(coh_i.mean_coherence()[si]):.2f} (independent noise)")

    plv = vw.phase_synchronization(x, y, scales, "morl")
    print(f"phase-locking value: {float(plv[si]):.3f}")

    # instantaneous frequency + Viterbi ridge on a chirp
    chirp = jnp.asarray(np.sin(2 * np.pi * (0.01 * t + 2e-5 * t**2)))
    r = cwt(chirp, scales, "morl", analytic=True)
    ridge = vw.extract_ridge(r, smoothness=2.0)
    inst = vw.instantaneous_frequency(r)
    f_start = float(np.asarray(inst)[int(ridge.indices[100]), 100])
    f_end = float(np.asarray(inst)[int(ridge.indices[-100]), n - 100])
    print(f"\nchirp ridge: scale {float(ridge.scales[0]):.1f} -> "
          f"{float(ridge.scales[-1]):.1f}; instantaneous frequency "
          f"{f_start:.3f} -> {f_end:.3f} cycles/sample "
          f"(true: {0.01 + 2 * 2e-5 * 100:.3f} -> {0.01 + 2 * 2e-5 * (n - 100):.3f})")


if __name__ == "__main__":
    main()
