"""ForWaRD deconvolution: level responses oracle, recovery quality, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.optimize.deconvolve import _level_responses
from vectorwave_tpu.transforms.modwt import _resolve_discrete

from .conftest import composite_sin


def _gaussian_kernel(width: float, taps: int) -> np.ndarray:
    t = np.arange(taps) - taps // 2
    k = np.exp(-0.5 * (t / width) ** 2)
    k /= k.sum()
    return np.fft.ifftshift(np.pad(k, (0, 0)))  # peak near index 0 after shift


def _blur(x: np.ndarray, kernel: np.ndarray, n: int) -> np.ndarray:
    kf = np.fft.fft(kernel, n=n)
    return np.fft.ifft(np.fft.fft(x) * kf).real


def test_level_responses_match_impulse_oracle():
    """The DFT-dilation product formula equals the unit-impulse transform."""
    n, levels = 256, 4
    w = _resolve_discrete("db4")
    responses = _level_responses(n, w, levels)
    impulse = jnp.zeros(n, dtype=jnp.float64).at[0].set(1.0)
    tree = vw.modwt_multilevel(impulse, "db4", levels=levels, backend="jnp")
    for g_pow, detail in zip(responses, tree.details):
        oracle = np.abs(np.fft.fft(np.asarray(detail))) ** 2
        np.testing.assert_allclose(g_pow, oracle, atol=1e-12)


@pytest.mark.slow
def test_deconvolve_beats_blurred_input(rng):
    n = 2048
    clean = composite_sin(n)
    kernel = _gaussian_kernel(width=4.0, taps=33)
    blurred = _blur(clean, kernel, n)
    sigma = 0.05
    noisy = blurred + sigma * rng.standard_normal(n)

    res = vw.deconvolve(jnp.asarray(noisy), kernel, "sym8", levels=4)
    err_in = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    err_out = float(np.sqrt(np.mean((np.asarray(res.signal) - clean) ** 2)))
    assert err_out < 0.1 * err_in
    # Diagnostics present and coherent: colored-noise stds are positive and
    # the (hard) wavelet step never degrades the Fourier step materially.
    assert len(res.level_sigmas) == 4
    assert all(float(s.min()) > 0.0 for s in res.level_sigmas)
    err_wiener = float(np.sqrt(np.mean((np.asarray(res.wiener) - clean) ** 2)))
    assert err_out <= 1.05 * err_wiener


@pytest.mark.slow
def test_deconvolve_beats_naive_inverse(rng):
    n = 1024
    clean = composite_sin(n)
    kernel = _gaussian_kernel(width=6.0, taps=65)  # strong blur: tiny |H| tail
    sigma = 0.05
    noisy = _blur(clean, kernel, n) + sigma * rng.standard_normal(n)

    kf = np.fft.fft(kernel, n=n)
    naive = np.fft.ifft(np.fft.fft(noisy) / kf).real
    err_naive = float(np.sqrt(np.mean((naive - clean) ** 2)))
    res = vw.deconvolve(jnp.asarray(noisy), kernel, "sym8", sigma=sigma)
    err = float(np.sqrt(np.mean((np.asarray(res.signal) - clean) ** 2)))
    assert err < 0.1 * err_naive  # the naive inverse explodes


def test_noiseless_recovery_is_tight():
    n = 1024
    clean = composite_sin(n)
    kernel = _gaussian_kernel(width=2.0, taps=17)
    blurred = _blur(clean, kernel, n)
    res = vw.deconvolve(jnp.asarray(blurred), kernel, "sym8", sigma=1e-8)
    rel = float(
        np.linalg.norm(np.asarray(res.signal) - clean) / np.linalg.norm(clean)
    )
    assert rel < 1e-3


def test_identity_kernel_reduces_to_denoising(rng):
    n = 1024
    clean = composite_sin(n)
    noisy = clean + 0.3 * rng.standard_normal(n)
    res = vw.deconvolve(jnp.asarray(noisy), np.array([1.0]), "sym8")
    err_in = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    err_out = float(np.sqrt(np.mean((np.asarray(res.signal) - clean) ** 2)))
    assert err_out < err_in


def test_batched_and_jitted(rng):
    n = 512
    clean = np.stack([composite_sin(n), composite_sin(n, seed=9)])
    kernel = _gaussian_kernel(width=3.0, taps=17)
    noisy = np.stack([_blur(c, kernel, n) for c in clean])
    noisy += 0.05 * rng.standard_normal(noisy.shape)

    fn = jax.jit(lambda y: vw.deconvolve(y, kernel, "db4", levels=3).signal)
    out = np.asarray(fn(jnp.asarray(noisy)))
    assert out.shape == noisy.shape
    for i in range(2):
        err_in = np.sqrt(np.mean((noisy[i] - clean[i]) ** 2))
        err_out = np.sqrt(np.mean((out[i] - clean[i]) ** 2))
        assert err_out < err_in


def test_kernel_validation():
    y = jnp.zeros(128)
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve(y, np.zeros(5))  # all-zero kernel
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve(y, np.ones((3, 3)))  # not 1-D
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve(y, np.ones(256))  # longer than signal


def _gaussian_psf(width: float, taps: int) -> np.ndarray:
    t = np.arange(taps) - taps // 2
    g = np.exp(-0.5 * (t / width) ** 2)
    psf = np.outer(g, g)
    return psf / psf.sum()


def _blur2(img: np.ndarray, psf: np.ndarray):
    """Circularly blur with a centered psf; returns (blurred, peak-at-origin psf)."""
    h, w = img.shape
    pad = np.zeros((h, w))
    ph, pw = psf.shape
    pad[:ph, :pw] = psf
    pad = np.roll(pad, (-(ph // 2), -(pw // 2)), axis=(0, 1))
    return np.fft.ifft2(np.fft.fft2(img) * np.fft.fft2(pad)).real, pad


def _test_image(h: int = 64, w: int = 64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.sin(2 * np.pi * yy / 16) + 0.7 * np.cos(2 * np.pi * xx / 10)
    img[h // 2 :, :] += 1.2  # edge
    return img


def test_deconvolve2_beats_blurred_input(rng):
    clean = _test_image()
    psf = _gaussian_psf(1.8, 11)
    blurred, psf0 = _blur2(clean, psf)
    sigma = 0.05
    noisy = blurred + sigma * rng.standard_normal(clean.shape)

    res = vw.deconvolve2(jnp.asarray(noisy), psf0, "sym4", levels=3)
    err_in = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    err_out = float(np.sqrt(np.mean((np.asarray(res.signal) - clean) ** 2)))
    assert err_out < 0.5 * err_in
    assert len(res.level_sigmas) == 3
    assert all(len(t) == 3 for t in res.level_sigmas)  # (lh, hl, hh)


@pytest.mark.slow
def test_deconvolve2_batched_jit(rng):
    clean = _test_image(32, 32)
    psf = _gaussian_psf(1.2, 7)
    blurred, psf0 = _blur2(clean, psf)
    noisy = np.stack([blurred, blurred]) + 0.03 * rng.standard_normal((2, 32, 32))
    fn = jax.jit(lambda img: vw.deconvolve2(img, psf0, "db4", levels=2).signal)
    out = np.asarray(fn(jnp.asarray(noisy)))
    assert out.shape == (2, 32, 32)
    for i in range(2):
        err_in = np.sqrt(np.mean((noisy[i] - clean) ** 2))
        err_out = np.sqrt(np.mean((out[i] - clean) ** 2))
        assert err_out < err_in


def test_deconvolve2_kernel_validation():
    y = jnp.zeros((32, 32))
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve2(y, np.zeros((3, 3)))  # all-zero psf
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve2(y, np.ones(5))  # 1-D psf
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve2(y, np.ones((64, 64)))  # larger than image
    with pytest.raises(vw.InvalidArgumentError):
        vw.deconvolve2(jnp.zeros(32), np.ones((3, 3)))  # 1-D input
