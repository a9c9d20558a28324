"""Empirical wavelet transform: adaptive mode decomposition.

Separates a mixture whose component frequencies are unknown a priori —
the spectrum is segmented where THIS signal's peaks sit, then a tight-frame
Meyer bank extracts one mode per segment.  Includes a nonstationary case
(frequency-hopping tone) where instantaneous frequency from the analytic
modes tracks the hop.
Run: python examples/ewt_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(0)
    n = 4096
    t = np.arange(n)

    # --- stationary mixture -------------------------------------------------
    x = (np.sin(2 * np.pi * 0.021 * t)
         + 0.8 * np.sin(2 * np.pi * 0.13 * t)
         + 0.5 * np.sin(2 * np.pi * 0.34 * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    bounds = vw.ewt_boundaries(x, 3)
    print(f"detected boundaries: {[round(b, 3) for b in bounds]} cycles/sample")
    modes = np.asarray(vw.ewt(jnp.asarray(x), bounds))
    for b in range(3):
        f = np.fft.rfftfreq(n)[np.argmax(np.abs(np.fft.rfft(modes[b])))]
        print(f"  mode {b}: dominant frequency {f:.3f}, "
              f"energy share {np.sum(modes[b]**2) / np.sum(x**2):.2f}")
    xr = np.asarray(vw.iewt(jnp.asarray(modes), bounds))
    print(f"reconstruction error: {np.abs(xr - x).max():.2e}")

    # --- nonstationary: frequency hop tracked by the analytic mode ----------
    hop = np.where(t < n // 2, 0.08, 0.12)
    y = (np.sin(2 * np.pi * np.cumsum(hop))
         + 0.4 * np.sin(2 * np.pi * 0.3 * t)).astype(np.float32)
    b2 = vw.ewt_boundaries(y, 2)
    analytic = np.asarray(vw.ewt_hilbert(jnp.asarray(y), b2))
    phase = np.unwrap(np.angle(analytic[0]))
    inst_f = np.diff(phase) / (2 * np.pi)
    first = np.median(inst_f[200 : n // 2 - 200])
    second = np.median(inst_f[n // 2 + 200 : -200])
    print(f"\nfrequency hop: instantaneous f = {first:.3f} -> {second:.3f} "
          f"(true 0.080 -> 0.120)")


if __name__ == "__main__":
    main()
