"""Synchrosqueezing: sharpen a scalogram and pull individual modes out.

Beyond-reference capability (Daubechies–Lu–Wu SST).  A two-component
signal whose modes sit 0.6 octave apart smears across neighboring CWT
scales; reassigning each coefficient to its instantaneous frequency
collapses the energy onto two near-lines that can be inverted separately.

Run: python examples/synchrosqueezing_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.cwt import cwt, scales_log


def main() -> None:
    n = 2048
    t = np.arange(n)
    f1, f2 = 0.04, 0.06
    x = jnp.asarray(np.sin(2 * np.pi * f1 * t) + 0.8 * np.sin(2 * np.pi * f2 * t))
    scales = scales_log(2, 64, 48)

    res = vw.synchrosqueeze(x, scales, "morl")
    p_sst = np.asarray(res.power()).mean(axis=-1)
    p_cwt = np.asarray(
        jnp.abs(cwt(x, scales, "morl", analytic=True).coeffs) ** 2
    ).mean(axis=-1)

    def top4(p):
        return float(np.sort(p)[::-1][:4].sum() / p.sum())

    print(f"energy in top-4 rows: CWT {top4(p_cwt):.2f} -> SST {top4(p_sst):.2f}")
    peaks = sorted(res.freqs[np.argsort(p_sst)[::-1][:2]])
    print(f"SST peaks at {peaks[0]:.4f}, {peaks[1]:.4f} cycles/sample "
          f"(true: {f1}, {f2})")

    # invert everything, then each mode separately
    xr = vw.isst(res, "morl")
    interior = slice(256, -256)
    print(f"full inversion max err (interior): "
          f"{float(jnp.abs((xr - x)[interior]).max()):.3f}")

    m1 = vw.extract_mode(res, jnp.full(n, f1), "morl", bandwidth_octaves=0.4)
    m2 = vw.extract_mode(res, jnp.full(n, f2), "morl", bandwidth_octaves=0.4)
    tone1, tone2 = np.sin(2 * np.pi * f1 * t), 0.8 * np.sin(2 * np.pi * f2 * t)
    c1 = np.corrcoef(np.asarray(m1)[interior], tone1[interior])[0, 1]
    c2 = np.corrcoef(np.asarray(m2)[interior], tone2[interior])[0, 1]
    print(f"mode correlations with their own tones: {c1:.3f}, {c2:.3f}")

    # a chirp's dominant squeezed bin tracks its instantaneous frequency
    chirp = jnp.asarray(np.sin(2 * np.pi * (0.01 * t + 2e-5 * t**2)))
    rc = vw.synchrosqueeze(chirp, scales, "morl")
    dom = np.asarray(vw.dominant_frequencies(rc))[interior]
    true_if = (0.01 + 4e-5 * t)[interior]
    print(f"chirp IF tracking: median rel err "
          f"{float(np.median(np.abs(dom - true_if) / true_if)):.3f}")


if __name__ == "__main__":
    main()
