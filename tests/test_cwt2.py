"""2-D CWT: spatial-domain parity, oriented-feature detection, LS inversion.

Beyond-reference capability (the reference CWT is 1-D only); the oracle for
correctness is the defining integral evaluated directly in the spatial
domain, plus analytic localization predictions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError
from vectorwave_tpu.transforms.cwt2 import _l2_norm


def _bandlimited_image(h, w, lo, hi, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((h, w))
    ky, kx = np.meshgrid(np.fft.fftfreq(h), np.fft.fftfreq(w), indexing="ij")
    r = np.hypot(ky, kx)
    img = np.real(np.fft.ifft2(np.fft.fft2(img) * ((r > lo) & (r < hi))))
    img -= img.mean()
    return img.astype(dtype)


def _spatial_oracle(img, wavelet, scale, theta):
    """Direct evaluation: sample psi in space by inverse-FFT of its spectrum
    on a big periodic grid, then circular-convolve — an independent path
    through the defining integral."""
    h, w = img.shape
    ky, kx = np.meshgrid(
        2 * np.pi * np.fft.fftfreq(h), 2 * np.pi * np.fft.fftfreq(w), indexing="ij"
    )
    c, s = math.cos(theta), math.sin(theta)
    kxr = c * kx + s * ky
    kyr = -s * kx + c * ky
    g = np.conj(np.asarray(wavelet.psi_hat(scale * kxr, scale * kyr))) * (
        scale / _l2_norm(wavelet)
    )
    return np.fft.ifft2(np.fft.fft2(img) * g)


@pytest.mark.parametrize(
    "wavelet",
    [vw.morlet2(), vw.mexican_hat2(), vw.gaussian2(3, directional=True)],
    ids=["morl2", "mexh2", "gaus3d"],
)
def test_matches_spatial_oracle(wavelet):
    img = _bandlimited_image(64, 64, 0.03, 0.35, dtype=np.float64)
    theta = 0.0 if wavelet.isotropic else np.pi / 5
    res = vw.cwt2(
        jnp.asarray(img), (3.0,), wavelet,
        angles=(theta,) if not wavelet.isotropic else (0.0,),
    )
    oracle = _spatial_oracle(img, wavelet, 3.0, theta)
    got = np.asarray(res.coeffs[0, 0])
    if not jnp.iscomplexobj(res.coeffs):
        oracle = oracle.real
    np.testing.assert_allclose(got, oracle, atol=1e-5 * np.abs(oracle).max())


def test_oriented_stripes_peak_at_expected_scale_and_angle():
    h = w = 128
    theta0, f0 = np.pi / 3, 0.09
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.cos(
        2 * np.pi * f0 * (math.cos(theta0) * xx + math.sin(theta0) * yy)
    ).astype(np.float32)
    scales = tuple(np.geomspace(3, 30, 24))
    angles = tuple(np.linspace(0, np.pi, 12, endpoint=False))
    res = vw.cwt2(jnp.asarray(img), scales, "morl2", angles=angles)
    sg = np.asarray(res.scalogram())
    si, ai = np.unravel_index(np.argmax(sg), sg.shape)
    expected_scale = vw.morlet2().peak_freq / (2 * np.pi * f0)
    assert abs(math.log(scales[si] / expected_scale)) < math.log(1.3)
    assert abs(angles[ai] - theta0) <= np.pi / 12 + 1e-9
    # dominant orientation map agrees almost everywhere
    orient = np.asarray(res.dominant_orientation())
    assert np.mean(np.abs(orient - theta0) <= np.pi / 12 + 1e-9) > 0.95


def test_scale_frequency_helpers_roundtrip():
    for f in (0.02, 0.1, 0.3):
        (s,) = vw.scales_for_frequencies2("mexh2", [f])
        assert vw.scale_to_frequency2("mexh2", s) == pytest.approx(f)


@pytest.mark.parametrize("angles_mode", ["half", "full"])
def test_icwt2_morlet_near_exact_periodic(angles_mode):
    img = _bandlimited_image(128, 128, 0.03, 0.3)
    scales = tuple(np.geomspace(2.5, 30, 24))
    if angles_mode == "half":
        angles = tuple(np.linspace(0, np.pi, 8, endpoint=False))
    else:
        angles = tuple(np.linspace(0, 2 * np.pi, 16, endpoint=False))
    res = vw.cwt2(jnp.asarray(img), scales, "morl2", angles=angles)
    rec = np.asarray(vw.icwt2(res, "morl2"))
    assert np.abs(rec - img).max() < 1e-5 * np.abs(img).max()


def test_icwt2_mexh_real_path_and_mean():
    img = _bandlimited_image(96, 96, 0.05, 0.3) + 2.5
    res = vw.cwt2(jnp.asarray(img), tuple(np.geomspace(0.8, 6, 24)), "mexh2")
    assert not jnp.iscomplexobj(res.coeffs)
    rec = np.asarray(vw.icwt2(res, "mexh2", mean=float(img.mean())))
    assert np.abs(rec - img).max() < 1e-4 * np.abs(img - img.mean()).max()


@pytest.mark.slow
def test_icwt2_zero_boundary_interior():
    img = _bandlimited_image(128, 128, 0.05, 0.3)
    g = vw.gaussian2(2, directional=True)
    res = vw.cwt2(
        jnp.asarray(img), tuple(np.geomspace(1.2, 10, 20)), g,
        angles=tuple(np.linspace(0, np.pi, 6, endpoint=False)),
        boundary="zero",
    )
    rec = np.asarray(vw.icwt2(res, g))
    interior = np.abs(rec - img)[24:-24, 24:-24].max() / np.abs(img).max()
    assert interior < 5e-2  # non-periodic round trips approximate by design


def test_batch_axes_and_jit():
    imgs = np.stack(
        [_bandlimited_image(48, 48, 0.05, 0.3, seed=i) for i in range(3)]
    )
    fn = jax.jit(
        lambda x: vw.cwt2(x, (2.0, 4.0), "morl2", angles=(0.0, np.pi / 2)).coeffs
    )
    out = fn(jnp.asarray(imgs))
    assert out.shape == (3, 2, 2, 48, 48)
    single = vw.cwt2(jnp.asarray(imgs[1]), (2.0, 4.0), "morl2",
                     angles=(0.0, np.pi / 2)).coeffs
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(single), atol=2e-6
    )


def test_isotropic_rotation_invariance():
    img = _bandlimited_image(64, 64, 0.05, 0.3)
    base = vw.cwt2(jnp.asarray(img), (3.0,), "mexh2")
    w_rot = vw.ContinuousWavelet2D(
        "mexh2", vw.mexican_hat2().psi_hat, False, False, math.sqrt(2.0)
    )  # same formula, isotropy flag off so angles are allowed
    rot = vw.cwt2(jnp.asarray(img), (3.0,), w_rot, angles=(1.1,))
    np.testing.assert_allclose(
        np.asarray(base.coeffs[0, 0]), np.asarray(rot.coeffs[0, 0]), atol=1e-5
    )


def test_validation_errors():
    img = jnp.zeros((16, 16))
    with pytest.raises(VectorWaveError):
        vw.cwt2(img, (), "morl2")
    with pytest.raises(VectorWaveError):
        vw.cwt2(img, (-1.0,), "morl2")
    with pytest.raises(VectorWaveError):
        vw.cwt2(img, (2.0,), "mexh2", angles=(0.0, 1.0))  # isotropic
    with pytest.raises(VectorWaveError):
        vw.cwt2(jnp.zeros(16), (2.0,), "morl2")  # 1-D input
    with pytest.raises(VectorWaveError):
        vw.cwt2(img, (2.0,), "nosuch2")
    with pytest.raises(VectorWaveError):
        vw.cwt2(img, (2.0,), "morl2", boundary="reflect")
    with pytest.raises(VectorWaveError):
        vw.morlet2(omega0=1.0)
    with pytest.raises(VectorWaveError):
        vw.gaussian2(0)
