"""Wavelet-leader multifractal analysis: oracle leaders, monofractal vs
multifractal discrimination, estimator conventions."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError
from vectorwave_tpu.ops.dwt import wavedec


def fbm(n, hurst, seed):
    """Exact fractional Brownian motion via circulant embedding of fGn."""
    rng = np.random.default_rng(seed)
    k = np.arange(n)
    gamma = 0.5 * (
        np.abs(k - 1) ** (2 * hurst)
        - 2 * np.abs(k) ** (2 * hurst)
        + np.abs(k + 1) ** (2 * hurst)
    )
    row = np.concatenate([gamma, gamma[1:-1][::-1]])
    lam = np.maximum(np.fft.fft(row).real, 0)
    m = len(row)
    z = rng.standard_normal(m) + 1j * rng.standard_normal(m)
    fgn = np.real(np.fft.fft(np.sqrt(lam / (2 * m)) * z))[:n]
    return np.cumsum(fgn)


def lognormal_cascade(n_levels, seed, sigma=0.35):
    """Mandelbrot multiplicative cascade (integrated measure)."""
    rng = np.random.default_rng(seed)
    m = np.ones(1)
    for _ in range(n_levels):
        w = np.exp(rng.normal(-sigma**2 / 2, sigma, 2 * len(m)))
        m = np.repeat(m, 2) * w
    return np.cumsum(m)


def brute_force_leaders(x, wavelet, levels):
    """Direct evaluation of the definition: sup of L1-normalized |c| over
    the dyadic descendants of the 3-neighborhood."""
    dec = wavedec(jnp.asarray(x), wavelet, levels=levels)
    cs = [np.abs(np.asarray(d)) * 2.0 ** (-(j + 1) / 2.0)
          for j, d in enumerate(dec.details)]
    out = []
    for j in range(1, levels + 1):
        n_j = cs[j - 1].shape[-1]
        lam = np.zeros(n_j)
        for k in range(n_j):
            sup = 0.0
            for nb in (k - 1, k, k + 1):  # periodic 3-neighborhood
                nbw = nb % n_j
                # descendants of node (j, nbw) at scale jp <= j
                for jp in range(j, 0, -1):
                    width = 2 ** (j - jp)
                    start = nbw * width
                    block = cs[jp - 1][start : start + width]
                    if block.size:
                        sup = max(sup, float(block.max()))
            lam[k] = sup
        out.append(lam)
    return out


def test_leaders_match_brute_force():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(256)
    got = vw.wavelet_leaders(jnp.asarray(x), "db2", levels=4)
    expected = brute_force_leaders(x, "db2", 4)
    for g, e in zip(got, expected):
        np.testing.assert_allclose(np.asarray(g), e, rtol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("hurst", [0.3, 0.7])
def test_fbm_is_monofractal_with_c1_near_h(hurst):
    x = jnp.asarray(np.stack([fbm(2**14, hurst, s) for s in range(8)]))
    res = vw.multifractal_spectrum(x, "db3", min_level=3)
    c1 = float(np.mean(np.asarray(res.c1)))
    c2 = float(np.mean(np.asarray(res.c2)))
    assert abs(c1 - hurst) < 0.1
    assert abs(c2) < 0.03  # no multifractality
    assert float(np.mean(np.asarray(res.spectrum_width()))) < 0.15
    # zeta(q) ~ q*H for a monofractal: check linearity across q
    zeta = np.asarray(res.zeta).mean(axis=0)
    qs = np.asarray(res.qs)
    slope = np.polyfit(qs, zeta, 1)[0]
    assert abs(slope - hurst) < 0.12
    resid = np.max(np.abs(zeta - np.polyval(np.polyfit(qs, zeta, 1), qs)))
    assert resid < 0.25


def test_cascade_is_multifractal():
    x = jnp.asarray(np.stack([lognormal_cascade(14, s) for s in range(8)]))
    res = vw.multifractal_spectrum(x, "db3", min_level=3)
    c2 = float(np.mean(np.asarray(res.c2)))
    assert c2 < -0.08  # strong multifractality, correct sign
    assert float(np.mean(np.asarray(res.spectrum_width()))) > 0.5
    h_mean = np.asarray(res.h).mean(axis=0)
    assert np.all(np.diff(h_mean) < 1e-6)  # h(q) decreasing in q
    assert float(np.asarray(res.D).max()) <= 1.0 + 0.1


@pytest.mark.slow
def test_batch_axes_shapes():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4096)))
    res = vw.multifractal_spectrum(x, "db2", qs=(-2, -1, 1, 2))
    assert res.zeta.shape == (2, 3, 4)
    assert res.h.shape == (2, 3, 4)
    assert res.c1.shape == (2, 3)
    assert res.spectrum_width().shape == (2, 3)
    assert res.levels[0] == 2


@pytest.mark.slow
def test_non_dyadic_length_default_levels():
    # N=1000: only 3 dyadic levels divide it; the default max_level must
    # clamp to that instead of crashing in wavedec
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1000))
    res = vw.multifractal_spectrum(x, "db2", min_level=1)
    assert res.levels[-1] <= 3
    assert np.all(np.isfinite(np.asarray(res.zeta)))


@pytest.mark.slow
def test_flat_segments_do_not_produce_nan():
    # long zero segments give exactly-zero leaders; negative-q moments must
    # stay finite (relative floor, not finfo.tiny)
    rng = np.random.default_rng(1)
    x = np.zeros(4096, np.float32)
    x[:1024] = rng.standard_normal(1024)
    res = vw.multifractal_spectrum(jnp.asarray(x), "db3", min_level=2)
    for leaf in (res.zeta, res.h, res.D, res.c1, res.c2):
        assert np.all(np.isfinite(np.asarray(leaf))), leaf


def test_validation():
    x = jnp.zeros(4096) + jnp.asarray(
        np.random.default_rng(0).standard_normal(4096)
    )
    with pytest.raises(VectorWaveError):
        vw.multifractal_spectrum(x, qs=())
    with pytest.raises(VectorWaveError):
        vw.multifractal_spectrum(x, qs=(0.0, 1.0))
    with pytest.raises(VectorWaveError):
        vw.multifractal_spectrum(jnp.zeros(32), min_level=2)  # too short
