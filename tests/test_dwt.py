"""Decimated DWT golden-oracle tests (ScalarOps.java:67-556 parity).

Oracle: an independent numpy loop implementing the reference spec
``out[i] = sum_j f[j] x[(2i+j) mod N]`` / adjoint scatter, plus Haar
closed forms, perfect reconstruction at 1e-12 (f64) and energy preservation
for orthogonal filters.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw

from .conftest import composite_sin


def oracle_down(x, f, boundary, offset=0):
    n = len(x)
    out = np.zeros(n // 2)
    for i in range(n // 2):
        for j, fj in enumerate(f):
            idx = 2 * i + j + offset
            if boundary == "periodic":
                out[i] += x[idx % n] * fj
            elif idx < n:
                out[i] += x[idx] * fj
    return out


def oracle_up(c, f, n_out, boundary):
    out = np.zeros(n_out)
    for i, ci in enumerate(c):
        for j, fj in enumerate(f):
            idx = 2 * i + j
            if boundary == "periodic":
                out[idx % n_out] += ci * fj
            elif idx < n_out:
                out[idx] += ci * fj
    return out


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
@pytest.mark.parametrize("name", ["haar", "db4", "sym8", "bior2.2"])
def test_dwt_matches_oracle(name, boundary):
    from vectorwave_tpu.ops.dwt import _bior_parities

    x = composite_sin(128, noise_std=0.3)
    w = vw.wavelet(name)
    p_h, p_g = _bior_parities(w)  # (0, 0) for orthogonal = reference indexing
    res = vw.dwt(jnp.asarray(x), name, boundary=boundary)
    np.testing.assert_allclose(
        np.asarray(res.approx), oracle_down(x, w.dec_lo, boundary, p_h), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.detail), oracle_down(x, w.dec_hi, boundary, p_g), atol=1e-12
    )


@pytest.mark.parametrize("name", ["bior1.3", "bior2.4", "bior3.1", "bior4.4",
                                  "bior6.8", "rbio2.2", "rbio4.4"])
def test_perfect_reconstruction_biorthogonal(name):
    """Parity-calibrated offsets give exact PR for every CDF pair (the
    reference's plain indexing cannot reconstruct these)."""
    x = jnp.asarray(composite_sin(256, noise_std=0.5, seed=9))
    res = vw.dwt(x, name)
    rec = vw.idwt(res.approx, res.detail, name)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_idwt_matches_oracle():
    x = composite_sin(64, seed=2)
    w = vw.wavelet("db4")
    res = vw.dwt(jnp.asarray(x), "db4")
    rec = vw.idwt(res.approx, res.detail, "db4")
    expected = oracle_up(np.asarray(res.approx), w.rec_lo, 64, "periodic") + oracle_up(
        np.asarray(res.detail), w.rec_hi, 64, "periodic"
    )
    np.testing.assert_allclose(np.asarray(rec), expected, atol=1e-12)


def test_haar_closed_form():
    x = composite_sin(32, seed=4)
    res = vw.dwt(jnp.asarray(x), "haar")
    s = 1.0 / np.sqrt(2.0)
    np.testing.assert_allclose(
        np.asarray(res.approx), s * (x[0::2] + x[1::2]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.detail), s * (x[0::2] - x[1::2]), atol=1e-12
    )


@pytest.mark.parametrize("name", ["haar", "db2", "db4", "sym8", "coif2", "bior2.2"])
def test_perfect_reconstruction_periodic(name):
    x = jnp.asarray(composite_sin(256, noise_std=0.5))
    res = vw.dwt(x, name)
    rec = vw.idwt(res.approx, res.detail, name)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


@pytest.mark.parametrize("name", ["haar", "db4", "sym8"])
def test_energy_preservation_orthogonal(name):
    x = jnp.asarray(composite_sin(512, noise_std=0.4))
    res = vw.dwt(x, name)
    e_coeffs = float((res.approx**2).sum() + (res.detail**2).sum())
    e_signal = float((x**2).sum())
    assert abs(e_coeffs - e_signal) / e_signal < 1e-12


def test_wavedec_waverec_roundtrip():
    x = jnp.asarray(composite_sin(256, noise_std=0.2))
    res = vw.wavedec(x, "db4", levels=4)
    assert res.levels == 4
    assert res.details[0].shape == (128,)
    assert res.details[3].shape == (16,)
    assert res.approx.shape == (16,)
    rec = vw.waverec(res, "db4")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_wavedec_default_levels_and_batch():
    x = jnp.asarray(
        np.stack([composite_sin(128, seed=s) for s in range(3)])
    )
    res = vw.wavedec(x, "db4")
    assert res.levels == vw.max_dwt_levels(128, "db4") == 4
    rec = vw.waverec(res, "db4")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_zero_boundary_interior_parity():
    """A signal with quiet tails: zero and periodic agree everywhere."""
    x = np.zeros(128)
    x[32:96] = composite_sin(64, noise_std=0.2)
    a_per = vw.dwt(jnp.asarray(x), "db4", boundary="periodic")
    a_zero = vw.dwt(jnp.asarray(x), "db4", boundary="zero")
    np.testing.assert_allclose(
        np.asarray(a_per.detail), np.asarray(a_zero.detail), atol=1e-12
    )


def test_dwt_validation():
    with pytest.raises(vw.InvalidArgumentError):
        vw.dwt(jnp.zeros(33), "db4")  # odd length
    with pytest.raises(vw.InvalidArgumentError):
        vw.dwt(jnp.zeros(64), "db4", boundary="symmetric")
    with pytest.raises(vw.InvalidArgumentError):
        vw.wavedec(jnp.zeros(72), "db4", levels=4)  # 72 % 16 != 0
    with pytest.raises(vw.InvalidArgumentError):
        vw.wavedec(jnp.zeros(64), "db4", levels=0)
