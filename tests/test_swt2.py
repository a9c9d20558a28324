"""2-D SWT facade (transforms/swt2.py): MODWT2-backed conventions."""

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)


def test_swt2_roundtrip_periodic(img):
    res = vw.swt2(img, "db4", levels=3)
    xr = vw.iswt2(res, "db4")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(img), atol=1e-4)


def test_swt2_equals_modwt2(img):
    a = vw.swt2(img, "sym4", levels=2, boundary="zero")
    b = vw.modwt2_multilevel(img, "sym4", levels=2, boundary="zero")
    np.testing.assert_array_equal(np.asarray(a.approx), np.asarray(b.approx))


def test_mra2_additivity(img):
    bands = vw.mra2(img, "db4", levels=3)
    assert len(bands) == 4  # 3 detail scales + smooth
    total = sum(np.asarray(b) for b in bands)
    np.testing.assert_allclose(total, np.asarray(img), atol=1e-4)


def test_extract_level2_bands_sum(img):
    parts = [
        vw.extract_level2(img, "haar", 2, t) for t in (0, 1, 2)
    ]
    total = sum(np.asarray(p) for p in parts)
    np.testing.assert_allclose(total, np.asarray(img), atol=1e-4)


def test_swt2_denoise_reduces_noise():
    rng = np.random.default_rng(1)
    yy, xx = np.meshgrid(np.linspace(0, 4 * np.pi, 64),
                         np.linspace(0, 4 * np.pi, 64))
    clean = np.sin(xx) * np.cos(yy)
    noisy = jnp.asarray(clean + 0.3 * rng.standard_normal((64, 64)),
                        jnp.float32)
    out = vw.swt2_denoise(noisy, "db4", levels=3)
    err_out = float(jnp.mean((out - clean) ** 2))
    err_in = float(jnp.mean((noisy - clean) ** 2))
    assert err_out < err_in
