"""2-D separable transforms: round trips, separability oracle, denoising."""

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.twodim import (
    MODWT2Result,
    denoise2,
    dwt2,
    idwt2,
    imodwt2,
    imodwt2_multilevel,
    modwt2,
    modwt2_multilevel,
    wavedec2,
    waverec2,
)


def _image(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.sin(2 * np.pi * yy / 16) + np.cos(2 * np.pi * xx / 12)
    return img + 0.1 * rng.standard_normal((h, w))


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_modwt2_roundtrip(boundary):
    """Periodic: exact everywhere.  Zero: interior-exact, edge effects
    confined to the filter support (the 1-D engine's contract)."""
    x = jnp.asarray(_image())
    res = modwt2(x, "db4", boundary=boundary)
    xr = imodwt2(res, "db4", boundary=boundary)
    err = jnp.abs(xr - x)
    if boundary == "periodic":
        assert float(jnp.max(err)) < 1e-10
    else:
        m = 16  # 2*(L-1) margin for db4
        assert float(jnp.max(err[m:-m, m:-m])) < 1e-9


def test_modwt2_symmetric_matches_1d_contract():
    """SYMMETRIC round trips are approximate (the reference's own committed
    NRMSE baselines are ~0.8-1.6); the 2-D interior NRMSE must stay within
    the compounded 1-D level."""
    x = jnp.asarray(_image())
    res = modwt2(x, "haar", boundary="symmetric")
    xr = imodwt2(res, "haar", boundary="symmetric")
    m = 16
    interior = np.asarray(xr - x)[m:-m, m:-m]
    nrmse = float(np.sqrt(np.mean(interior**2)) / np.std(np.asarray(x)[m:-m, m:-m]))
    assert nrmse < 0.6  # haar 1-D baseline is ~0.2-0.3/axis (tests/baselines)


def test_modwt2_separability_oracle():
    """2-D == two explicit 1-D passes (column pass then row pass)."""
    x = jnp.asarray(_image(32, 48))
    res = modwt2(x, "haar")
    col = vw.modwt(x, "haar")
    row_of_approx = vw.modwt(jnp.swapaxes(col.approx, -1, -2), "haar")
    np.testing.assert_allclose(
        np.asarray(res.ll), np.asarray(jnp.swapaxes(row_of_approx.approx, -1, -2)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(res.hl), np.asarray(jnp.swapaxes(row_of_approx.detail, -1, -2)),
        atol=1e-12,
    )


def test_modwt2_subband_orientation():
    """A horizontal edge (variation along H) excites hl = high-H/low-W;
    a vertical edge excites lh = low-H/high-W."""
    img = np.zeros((64, 64))
    img[32:, :] = 1.0  # horizontal edge
    res = modwt2(jnp.asarray(img), "haar")
    lh_e = float((res.lh**2).sum())
    hl_e = float((res.hl**2).sum())
    assert hl_e > 100 * max(lh_e, 1e-30)

    img_v = np.zeros((64, 64))
    img_v[:, 32:] = 1.0  # vertical edge
    res_v = modwt2(jnp.asarray(img_v), "haar")
    assert float((res_v.lh**2).sum()) > 100 * max(float((res_v.hl**2).sum()), 1e-30)


def test_modwt2_energy_preserved_orthogonal():
    x = jnp.asarray(_image())
    res = modwt2(x, "db4")
    np.testing.assert_allclose(
        float(res.energy()), float((x**2).sum()), rtol=1e-10
    )


def test_modwt2_multilevel_roundtrip_and_batch():
    x = jnp.asarray(np.stack([_image(seed=s) for s in range(3)]))
    res = modwt2_multilevel(x, "sym4", levels=3)
    assert res.levels == 3
    assert res.details[0][0].shape == x.shape
    xr = imodwt2_multilevel(res, "sym4")
    assert float(jnp.max(jnp.abs(xr - x))) < 1e-9
    assert np.isfinite(float(res.detail_energy(2).sum()))


@pytest.mark.parametrize("wavelet", ["haar", "db4", "bior2.2"])
def test_dwt2_roundtrip(wavelet):
    x = jnp.asarray(_image(64, 64))
    res = dwt2(x, wavelet)
    assert res.ll.shape == (32, 32)
    xr = idwt2(res, wavelet)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-9)


def test_wavedec2_roundtrip():
    x = jnp.asarray(_image(64, 64))
    details, ll = wavedec2(x, "db2", levels=3)
    assert ll.shape == (8, 8) and len(details) == 3
    xr = waverec2(details, ll, "db2")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-9)


def test_denoise2_reduces_noise():
    rng = np.random.default_rng(3)
    clean = np.asarray(_image(64, 64)) - 0.1 * rng.standard_normal((64, 64))
    noisy = clean + 0.5 * rng.standard_normal((64, 64))
    den = denoise2(jnp.asarray(noisy), "sym4", levels=3)
    rmse_noisy = float(np.sqrt(np.mean((noisy - clean) ** 2)))
    rmse_den = float(np.sqrt(np.mean((np.asarray(den) - clean) ** 2)))
    assert rmse_den < 0.6 * rmse_noisy


def test_twodim_validation():
    with pytest.raises(vw.InvalidSignalError):
        modwt2(jnp.zeros(16), "db4")
    with pytest.raises(vw.InvalidArgumentError):
        modwt2_multilevel(jnp.zeros((8, 8)), "db4", levels=0)


def test_denoise2_orientation_invariant():
    """Whole-plane statistics: denoising must commute with transposition
    (per-row sigma would break this)."""
    rng = np.random.default_rng(9)
    noisy = np.asarray(_image(64, 96)) + 0.4 * rng.standard_normal((64, 96))
    a = np.asarray(denoise2(jnp.asarray(noisy), "sym4", levels=2))
    b = np.asarray(denoise2(jnp.asarray(noisy.T), "sym4", levels=2)).T
    np.testing.assert_allclose(a, b, atol=1e-10)
