"""Directional 2-D CWT: texture orientation mapping and selective
reconstruction.

Builds an image with two oriented textures, maps the dominant orientation
per pixel with a scale x angle Morlet bank, and reconstructs each texture
separately by zeroing the other's angle cells — all through cwt2/icwt2.
Run: python examples/directional_cwt2_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp

import vectorwave_tpu as vw


def main() -> None:
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w]
    theta_a, theta_b = 0.0, np.pi / 2  # horizontal vs vertical stripes
    f0 = 0.12
    left = np.cos(2 * np.pi * f0 * (np.cos(theta_a) * xx + np.sin(theta_a) * yy))
    right = np.cos(2 * np.pi * f0 * (np.cos(theta_b) * xx + np.sin(theta_b) * yy))
    img = np.where(xx < w // 2, left, right).astype(np.float32)
    img += 0.2 * np.random.default_rng(0).standard_normal((h, w)).astype(np.float32)
    img -= img.mean()

    scales = vw.scales_for_frequencies2("morl2", [f0 / 2, f0, 2 * f0])
    angles = tuple(np.linspace(0, np.pi, 8, endpoint=False))
    res = vw.cwt2(jnp.asarray(img), scales, "morl2", angles=angles)
    print(f"coefficients: {res.coeffs.shape}  (scales x angles x H x W)")

    orient = np.asarray(res.dominant_orientation())
    left_ok = np.mean(np.abs(orient[:, : w // 2 - 8] - theta_a) < np.pi / 8)
    right_ok = np.mean(np.abs(orient[:, w // 2 + 8 :] - theta_b) < np.pi / 8)
    print(f"orientation map accuracy: left {left_ok:.1%}, right {right_ok:.1%}")

    # selective reconstruction: keep only angle cells near theta_a
    keep = np.array([abs(a - theta_a) < np.pi / 8 for a in angles])
    masked = res.coeffs * jnp.asarray(keep, res.coeffs.dtype)[None, :, None, None]
    rec_a = np.asarray(vw.icwt2(res._replace(coeffs=masked), "morl2"))
    e_left = np.mean(rec_a[:, : w // 2 - 8] ** 2)
    e_right = np.mean(rec_a[:, w // 2 + 8 :] ** 2)
    print(f"horizontal-texture reconstruction energy: left {e_left:.3f} "
          f"vs right {e_right:.3f} ({e_left / max(e_right, 1e-9):.0f}x separation)")

    # full inversion quality (all cells kept)
    rec = np.asarray(vw.icwt2(res, "morl2"))
    resid = np.abs(rec - img).max() / np.abs(img).max()
    print(f"full-bank inversion relative error: {resid:.2e} "
          f"(noise outside the 3-scale band stays unexplained)")


if __name__ == "__main__":
    main()
