"""MXU-factorized FFT kernels (kernels/fft_mxu.py) vs numpy.

These serve the CWT FFT path's per-scale inverse on TPU (the committed
probe shows XLA's irfft ~80x above its HBM floor there); parity here is
f32 grade — the same grade as the XLA FFT path they replace.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vectorwave_tpu.kernels.fft_mxu import (
    mxu_fft,
    mxu_ifft,
    mxu_irfft,
    mxu_rfft,
)


@pytest.mark.parametrize("m", [64, 128, 256, 8192, 1 << 16])
def test_c2c_ifft_matches_numpy(m):
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, m)) + 1j * rng.standard_normal((2, m))
    yr, yi = jax.jit(mxu_ifft)(
        jnp.asarray(z.real, jnp.float32), jnp.asarray(z.imag, jnp.float32)
    )
    ref = np.fft.ifft(z.astype(np.complex64))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(yr) + 1j * np.asarray(yi), ref, atol=3e-6 * max(scale, 1)
    )


def test_forward_inverse_compose():
    rng = np.random.default_rng(1)
    m = 4096
    z = rng.standard_normal((2, m)).astype(np.float32)
    fr, fi = jax.jit(mxu_fft)(jnp.asarray(z), jnp.zeros((2, m), jnp.float32))
    br, _bi = jax.jit(mxu_ifft)(fr, fi)
    np.testing.assert_allclose(np.asarray(br), z, atol=2e-4)


@pytest.mark.parametrize("n", [256, 8192, 1 << 17])
def test_packed_irfft_matches_numpy(n):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, n)).astype(np.float32)
    spec = np.fft.rfft(x)
    out = jax.jit(lambda a, b: mxu_irfft(a, b, n))(
        jnp.asarray(spec.real, jnp.float32),
        jnp.asarray(spec.imag, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=5e-6)


@pytest.mark.parametrize("n", [256, 8192, 1 << 17])
def test_packed_rfft_matches_numpy(n):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, n)).astype(np.float32)
    sr, si = jax.jit(mxu_rfft)(jnp.asarray(x))
    ref = np.fft.rfft(x)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(sr) + 1j * np.asarray(si), ref, atol=1e-6 * scale
    )


def test_rfft_irfft_roundtrip():
    rng = np.random.default_rng(4)
    n = 1 << 14
    x = rng.standard_normal((2, n)).astype(np.float32)
    sr, si = jax.jit(mxu_rfft)(jnp.asarray(x))
    back = jax.jit(lambda a, b: mxu_irfft(a, b, n))(sr, si)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)
