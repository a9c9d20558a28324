"""Dual-tree complex wavelet transform: shift-invariant envelopes (1-D)
and oriented subbands (2-D).

Shows the two properties that motivate the DTCWT over the plain DWT:
coefficient magnitudes that track features under shifts, and six
directionally-selective complex subbands for images.
Run: python examples/dtcwt_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.ops.dwt import wavedec


def main() -> None:
    # --- 1-D: envelope stability under shifts -------------------------------
    t = np.arange(1024)
    burst = np.exp(-0.5 * ((t - 512) / 40.0) ** 2) * np.cos(2 * np.pi * 0.05 * t)
    res = vw.dtcwt(jnp.asarray(burst.astype(np.float32)), levels=5)
    energies = [float(jnp.sum(jnp.abs(z) ** 2)) for z in res.highpasses]
    j = int(np.argmax(energies)) + 1
    print(f"burst concentrates at level {j} "
          f"({energies[j-1] / sum(energies):.0%} of detail energy)")

    def peak_mag(x, lvl):
        r = vw.dtcwt(jnp.asarray(x.astype(np.float32)), levels=5)
        return float(jnp.max(jnp.abs(r.highpasses[lvl - 1])))

    def peak_dwt(x, lvl):
        d = wavedec(jnp.asarray(x.astype(np.float32)), "sym8", levels=5)
        return float(jnp.max(jnp.abs(d.details[lvl - 1])))

    mags = [peak_mag(np.roll(burst, s), j) for s in range(8)]
    mags_d = [peak_dwt(np.roll(burst, s), j) for s in range(8)]
    print(f"peak |coeff| over 8 shifts: DTCWT varies "
          f"{max(mags)/min(mags)-1:.1%}, DWT varies {max(mags_d)/min(mags_d)-1:.1%}")

    xr = vw.idtcwt(res)
    print(f"reconstruction error: {float(jnp.max(jnp.abs(xr - burst))):.2e}")

    # --- 2-D: orientation analysis ------------------------------------------
    n = 128
    yy, xx = np.mgrid[0:n, 0:n]
    # two textures: +15 deg stripes left, -75 deg stripes right
    th1, th2 = np.deg2rad(15), np.deg2rad(-75)
    img = np.where(
        xx < n // 2,
        np.cos(2 * np.pi * 0.09 * (np.cos(th1) * xx + np.sin(th1) * yy)),
        np.cos(2 * np.pi * 0.09 * (np.cos(th2) * xx + np.sin(th2) * yy)),
    ).astype(np.float32)
    res2 = vw.dtcwt2(jnp.asarray(img), levels=3)
    names = ("-15", "+15", "-75", "+75", "+45", "-45")
    oe = np.asarray(res2.orientation_energy(3))
    print("orientation energy (level 3):",
          {nm: round(float(e / oe.sum()), 2) for nm, e in zip(names, oe)})
    # localize each texture from its band's magnitude (roll off the
    # accumulated filter delay so the coefficient grid aligns spatially)
    from vectorwave_tpu.transforms.dtcwt import coefficient_delay

    shift = round(coefficient_delay(3))
    mag = np.roll(
        np.asarray(jnp.abs(res2.highpasses[2])), (shift, shift), axis=(-2, -1)
    )  # [6, 16, 16]
    left_band, right_band = 1, 2  # +15 and -75
    left_frac = mag[left_band, :, :8].sum() / mag[left_band].sum()
    right_frac = mag[right_band, :, 8:].sum() / mag[right_band].sum()
    print(f"+15 band energy in left half: {left_frac:.0%}; "
          f"-75 band energy in right half: {right_frac:.0%}")
    rec = np.asarray(vw.idtcwt2(res2))
    print(f"2-D reconstruction error: {np.abs(rec - img).max():.2e}")


if __name__ == "__main__":
    main()
