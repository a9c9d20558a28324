"""Synchrosqueezing transform: concentration, inversion, mode extraction.

Beyond-reference capability (Daubechies–Lu–Wu SST).  Pins: the squeezed
spectrum is far more concentrated than the CWT scalogram, its peaks land on
the true tone frequencies, full inversion matches the equalized icwt,
per-mode extraction separates close tones, and the dominant-bin curve
tracks a chirp's instantaneous-frequency law.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.errors import InvalidArgumentError
from vectorwave_tpu.transforms.cwt import cwt, icwt, scales_log

_N = 2048
_T = np.arange(_N)
_SCALES = scales_log(2, 64, 48)


def _two_tone(f1=0.04, f2=0.06, a2=0.8):
    return jnp.asarray(np.sin(2 * np.pi * f1 * _T) + a2 * np.sin(2 * np.pi * f2 * _T))


def _top_frac(p, k=4):
    s = np.sort(p)[::-1]
    return s[:k].sum() / p.sum()


def test_sst_concentrates_energy():
    x = _two_tone()
    res = vw.synchrosqueeze(x, _SCALES, "morl")
    assert res.coeffs.shape == (48, _N) and res.n_bins == 48
    p_sst = np.asarray(res.power()).mean(axis=-1)
    p_cwt = np.asarray(
        jnp.abs(cwt(x, _SCALES, "morl", analytic=True).coeffs) ** 2
    ).mean(axis=-1)
    assert _top_frac(p_sst) > 0.9
    assert _top_frac(p_sst) > _top_frac(p_cwt) + 0.25


def test_sst_peaks_at_true_frequencies():
    res = vw.synchrosqueeze(_two_tone(), _SCALES, "morl")
    p = np.asarray(res.power()).mean(axis=-1)
    peaks = sorted(res.freqs[np.argsort(p)[::-1][:2]])
    assert abs(peaks[0] - 0.04) < 0.005 and abs(peaks[1] - 0.06) < 0.005


def test_isst_matches_icwt_quality():
    """Summing all bins reproduces the icwt accumulator, so inversion
    inherits the equalized inverse's accuracy."""
    x = _two_tone()
    res = vw.synchrosqueeze(x, _SCALES, "morl")
    xr_sst = vw.isst(res, "morl")
    xr_icwt = icwt(cwt(x, _SCALES, "morl", analytic=True), "morl")
    interior = slice(256, -256)
    err_sst = float(jnp.abs((xr_sst - x)[interior]).max())
    err_icwt = float(jnp.abs((xr_icwt - x)[interior]).max())
    assert err_sst < err_icwt + 0.02


def test_mode_extraction_separates_close_tones():
    x = _two_tone()
    res = vw.synchrosqueeze(x, _SCALES, "morl")
    m1 = vw.extract_mode(res, jnp.full(_N, 0.04), "morl", bandwidth_octaves=0.4)
    m2 = vw.extract_mode(res, jnp.full(_N, 0.06), "morl", bandwidth_octaves=0.4)
    tone1 = np.sin(2 * np.pi * 0.04 * _T)
    tone2 = 0.8 * np.sin(2 * np.pi * 0.06 * _T)
    i = slice(256, -256)
    rmse1 = float(np.sqrt(np.mean((np.asarray(m1)[i] - tone1[i]) ** 2)))
    rmse2 = float(np.sqrt(np.mean((np.asarray(m2)[i] - tone2[i]) ** 2)))
    assert rmse1 < 0.2 and rmse2 < 0.2
    # each mode contains ITS tone, not the other
    assert np.corrcoef(np.asarray(m1)[i], tone1[i])[0, 1] > 0.95
    assert np.corrcoef(np.asarray(m2)[i], tone2[i])[0, 1] > 0.95
    assert abs(np.corrcoef(np.asarray(m1)[i], tone2[i])[0, 1]) < 0.3


def test_dominant_frequencies_track_chirp():
    chirp = jnp.asarray(np.sin(2 * np.pi * (0.01 * _T + 2e-5 * _T**2)))
    res = vw.synchrosqueeze(chirp, _SCALES, "morl")
    dom = np.asarray(vw.dominant_frequencies(res))
    true_if = 0.01 + 4e-5 * _T
    i = slice(256, -256)
    rel = np.median(np.abs(dom[i] - true_if[i]) / true_if[i])
    assert rel < 0.05


def test_sst_batch_and_jit():
    xb = jnp.stack([_two_tone(), _two_tone(0.03, 0.09)])
    res = vw.synchrosqueeze(xb, _SCALES, "morl")
    assert res.coeffs.shape == (2, 48, _N)
    single = vw.synchrosqueeze(xb[0], _SCALES, "morl")
    np.testing.assert_allclose(
        np.asarray(res.coeffs[0]), np.asarray(single.coeffs), atol=1e-10
    )
    f = jax.jit(lambda y: vw.synchrosqueeze(y, _SCALES, "morl").coeffs)
    assert f(xb).shape == (2, 48, _N)


def test_sst_gamma_drops_small_coefficients():
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.sin(2 * np.pi * 0.05 * _T) + 0.01 * rng.standard_normal(_N))
    hard = vw.synchrosqueeze(x, _SCALES, "morl", gamma=1.0)
    soft = vw.synchrosqueeze(x, _SCALES, "morl", gamma=0.0)
    assert float(hard.power().sum()) <= float(soft.power().sum())


def test_sst_errors():
    x = _two_tone()
    with pytest.raises(InvalidArgumentError):
        vw.synchrosqueeze(x, _SCALES, "morl", gamma=-1.0)
    with pytest.raises(InvalidArgumentError):
        vw.synchrosqueeze(x, _SCALES, "morl", n_bins=1)
    res = vw.synchrosqueeze(x, _SCALES, "morl")
    with pytest.raises(InvalidArgumentError):
        vw.extract_mode(res, jnp.full(_N, 0.05), "morl", bandwidth_octaves=0.0)
