"""2-D DTCWT: perfect reconstruction, quadrant localization, orientation
discrimination, shift robustness."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError
from vectorwave_tpu.transforms.dtcwt2 import DTCWT2Result, dtcwt2, idtcwt2


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(64, 64), (2, 64, 96)])
def test_perfect_reconstruction(shape):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    res = dtcwt2(img, levels=3)
    rec = idtcwt2(res)
    assert float(jnp.max(jnp.abs(rec - img))) < 2e-5
    assert res.highpasses[0].shape == shape[:-2] + (6, shape[-2] // 2, shape[-1] // 2)
    assert res.lowpasses.shape == shape[:-2] + (4, shape[-2] // 8, shape[-1] // 8)


@pytest.mark.slow
def test_energy_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((128, 128)))
    res = dtcwt2(img, levels=3)
    hp = sum(float(jnp.sum(jnp.abs(z) ** 2)) for z in res.highpasses)
    lp = float(jnp.sum(res.lowpasses**2))
    # four orthonormal trees; complex bands carry half the 4-tree energy
    assert (2 * hp + lp) / 4 == pytest.approx(float(jnp.sum(img**2)), rel=1e-5)


def _effective_wavelet_spectrum(band, level=3, n=128):
    """FFT of the band's effective complex wavelet (via two inversions)."""
    res0 = dtcwt2(jnp.zeros((n, n)), levels=level)
    out = []
    for val in (1.0, 1j):
        hp = [jnp.zeros_like(z) for z in res0.highpasses]
        z = np.zeros(hp[level - 1].shape, np.complex64)
        z[band, 8, 8] = val
        hp[level - 1] = jnp.asarray(z)
        out.append(
            np.asarray(
                idtcwt2(
                    DTCWT2Result(tuple(hp), jnp.zeros_like(res0.lowpasses))
                )
            )
        )
    psi = out[0] - 1j * out[1]
    return np.abs(np.fft.fft2(psi)) ** 2


@pytest.mark.slow
def test_quadrant_localization():
    n = 128
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.fftfreq(n)[None, :]
    quads = [
        (fy < 0) & (fx > 0),  # band 0: -15 deg
        (fy > 0) & (fx > 0),  # band 1: +15
        (fy > 0) & (fx < 0),  # band 2: -75
        (fy < 0) & (fx < 0),  # band 3: +75
        (fy > 0) & (fx > 0),  # band 4: +45
        (fy < 0) & (fx > 0),  # band 5: -45
    ]
    for band in range(6):
        energy = _effective_wavelet_spectrum(band)
        frac = energy[quads[band]].sum() / energy.sum()
        # HH bands (both axes analytic) are near-perfect; LH/HL keep the
        # standard construction's ~15% soft mirror leakage
        assert frac > (0.97 if band >= 4 else 0.75), (band, frac)


@pytest.mark.slow
def test_oriented_gratings_pick_their_band():
    n = 128
    yy, xx = np.mgrid[0:n, 0:n]
    cases = [
        (-15, 0.09, 0), (15, 0.09, 1), (-75, 0.09, 2), (75, 0.09, 3),
        (45, 0.13, 4), (-45, 0.13, 5),
    ]
    for deg, f0, expected in cases:
        th = np.deg2rad(deg)
        gr = np.cos(
            2 * np.pi * f0 * (np.cos(th) * xx + np.sin(th) * yy)
        ).astype(np.float32)
        res = dtcwt2(jnp.asarray(gr), levels=3)
        oe = np.asarray(res.orientation_energy(3))
        assert int(np.argmax(oe)) == expected, (deg, oe / oe.sum())
        assert oe[expected] / oe.sum() > 0.45, (deg, oe / oe.sum())


def test_magnitude_shift_robustness():
    """|z| fields move WITH the image under translation (the separable DWT's
    subband energies churn instead)."""
    rng = np.random.default_rng(2)
    img = rng.standard_normal((128, 128)).astype(np.float32)
    base = dtcwt2(jnp.asarray(img), levels=3)
    base_mag = np.asarray(jnp.abs(base.highpasses[2]))
    devs = []
    for sy, sx in ((4, 0), (0, 4), (4, 4)):
        shifted = np.roll(img, (sy, sx), axis=(0, 1))
        mag = np.asarray(jnp.abs(dtcwt2(jnp.asarray(shifted), levels=3).highpasses[2]))
        # level-3 grid: 8 input samples per coefficient; a 4-sample input
        # shift is HALF a coefficient - the worst case for a decimated
        # transform. Compare energy profiles per band instead of samples.
        e0 = base_mag.reshape(6, -1).sum(axis=1)
        e1 = mag.reshape(6, -1).sum(axis=1)
        devs.append(np.max(np.abs(e1 - e0) / e0))
    assert max(devs) < 0.06, devs


def test_validation():
    with pytest.raises(VectorWaveError):
        dtcwt2(jnp.zeros(64), levels=2)  # 1-D input
    with pytest.raises(VectorWaveError):
        dtcwt2(jnp.zeros((60, 64)), levels=3)  # 60 % 8 != 0
    with pytest.raises(VectorWaveError):
        dtcwt2(jnp.zeros((64, 64)), levels=0)
