"""CWT correctness: ridge localization, inversion, path equivalence, scale tools.

Mirrors the reference's CWT test strategy (CWTTransform tests, InverseCWT
reconstruction-error tests, ScaleSpace/selector tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

import vectorwave_tpu as vw

ALL_CONTINUOUS = ["morl", "cmor", "mexh", "gaus1", "gaus2", "cgau2", "paul4",
                  "dog2", "shan", "cshanb", "shangabor", "fbsp", "meyr", "morse",
                  "herm2", "mexh_matlab", "cshan"]


def _two_tone(n=1024):
    t = np.arange(n)
    return np.sin(2 * np.pi * t / 32) + 0.5 * np.sin(2 * np.pi * t / 128)


def test_cwt_shape_and_ridge():
    x = jnp.asarray(_two_tone())
    scales = vw.scales_log(2, 256, 48)
    res = vw.cwt(x, scales, "morl")
    assert res.coeffs.shape == (48, 1024)
    mag = np.asarray(res.magnitude()).mean(axis=-1)
    # two ridges: near fc*32 and fc*128
    fc = vw.wavelet("morl").center_frequency
    ridge = scales[int(np.argmax(mag))]
    assert abs(ridge - fc * 32) / (fc * 32) < 0.25


@pytest.mark.parametrize("name", ALL_CONTINUOUS)
def test_wavelets_unit_energy_and_cwt_runs(name):
    w = vw.wavelet(name)
    t = np.linspace(-64, 64, 1 << 14)
    vals = w.psi(t)
    energy = np.trapezoid(np.abs(vals) ** 2, t)
    assert abs(energy - 1.0) < 0.05, energy
    res = vw.cwt(jnp.asarray(_two_tone(256)), (4.0, 8.0, 16.0), w)
    assert res.coeffs.shape == (3, 256)
    assert np.isfinite(np.asarray(res.coeffs)).all()


def test_direct_equals_fft():
    x = jnp.asarray(_two_tone(512))
    scales = vw.scales_log(2, 16, 8)
    res_d = vw.cwt(x, scales, "morl", method="direct")
    res_f = vw.cwt(x, scales, "morl", method="fft")
    np.testing.assert_allclose(
        np.asarray(res_d.coeffs), np.asarray(res_f.coeffs), atol=1e-12
    )


@pytest.mark.parametrize("name", ["morl", "mexh", "paul4", "cmor", "morse"])
def test_icwt_periodic_near_exact(name):
    """Equalized inversion of the circular CWT: machine-precision round trip
    (substantially tighter than the reference's approximate InverseCWT)."""
    x = _two_tone()
    scales = vw.scales_log(2, 256, 60)
    res = vw.cwt(jnp.asarray(x), scales, name, boundary="periodic")
    xr = np.asarray(vw.icwt(res, name))
    nrmse = np.sqrt(np.mean((xr - x) ** 2)) / np.std(x)
    assert nrmse < 1e-8, nrmse


def test_icwt_linear_reference_parity_quality():
    """Zero-padded (reference-parity) CWT inverts to a few percent — the
    reference documents 3-10% for its MODWT-based inverse."""
    x = _two_tone()
    scales = vw.scales_log(2, 256, 60)
    res = vw.cwt(jnp.asarray(x), scales, "mexh")
    xr = np.asarray(vw.icwt(res, "mexh"))
    nrmse = np.sqrt(np.mean((xr - x) ** 2)) / np.std(x)
    assert nrmse < 0.10, nrmse


def test_band_reconstruction_separates_components():
    n = 1024
    t = np.arange(n)
    lo = 0.5 * np.sin(2 * np.pi * t / 128)
    hi = np.sin(2 * np.pi * t / 32)
    x = lo + hi
    scales = vw.scales_log(2, 256, 60)
    res = vw.cwt(jnp.asarray(x), scales, "morl", boundary="periodic")
    fc = vw.wavelet("morl").center_frequency
    s_hi = fc * 32
    band_hi = np.asarray(vw.reconstruct_band(res, "morl", s_hi / 2, s_hi * 2))
    err = np.sqrt(np.mean((band_hi - hi) ** 2)) / np.std(hi)
    assert err < 0.15, err


def test_reconstruct_frequency_band():
    x = _two_tone()
    scales = vw.scales_log(2, 256, 60)
    res = vw.cwt(jnp.asarray(x), scales, "morl", boundary="periodic")
    band = np.asarray(vw.reconstruct_frequency_band(res, "morl", 1 / 48, 1 / 22))
    hi = np.sin(2 * np.pi * np.arange(1024) / 32)
    assert np.sqrt(np.mean((band - hi) ** 2)) / np.std(hi) < 0.1


def test_scale_tools():
    np.testing.assert_allclose(vw.scales_linear(1, 10, 10), np.linspace(1, 10, 10))
    logs = vw.scales_log(1, 16, 5)
    np.testing.assert_allclose(logs, [1, 2, 4, 8, 16])
    dyadic = vw.scales_dyadic(3)
    np.testing.assert_allclose(dyadic, [1, 2, 4, 8])
    f = vw.scale_to_frequency(2.0, "morl")
    s = vw.frequency_to_scale(f, "morl")
    assert abs(s - 2.0) < 1e-12
    opt = vw.select_scales_optimal(1024, "morl")
    assert len(opt) > 10 and all(a < b for a, b in zip(opt, opt[1:]))
    adaptive = vw.select_scales_signal_adaptive(_two_tone(), "morl", n_scales=16)
    assert len(adaptive) >= 4


def test_analytic_phase_tracks_oscillation():
    n = 512
    t = np.arange(n)
    x = np.sin(2 * np.pi * t / 32)
    res = vw.cwt(jnp.asarray(x), (vw.wavelet("morl").center_frequency * 32,), "morl",
                 analytic=True)
    phase = np.asarray(res.phase())[0]
    # unwrapped phase advances ~2pi per 32 samples in the interior
    interior = np.unwrap(phase[100:400])
    rate = np.mean(np.diff(interior))
    assert abs(rate - 2 * np.pi / 32) < 0.02


def test_cwt_batch():
    x = jnp.asarray(np.stack([_two_tone(), _two_tone() * 2]))
    res = vw.cwt(x, (4.0, 8.0), "morl")
    assert res.coeffs.shape == (2, 2, 1024)
    np.testing.assert_allclose(
        np.asarray(res.coeffs[1]), 2 * np.asarray(res.coeffs[0]), atol=1e-10
    )


def test_discrete_wavelet_rejected_for_cwt():
    with pytest.raises(vw.InvalidArgumentError):
        vw.cwt(jnp.zeros(64), (2.0,), "db4")
    with pytest.raises(vw.InvalidArgumentError):
        vw.cwt(jnp.zeros(64), (0.0,), "morl")


def test_adaptive_scale_selector():
    """AdaptiveScaleSelector port: config-driven selection (interface + config
    builder, cwt/AdaptiveScaleSelector.java:15-271)."""
    fs = 1000.0
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * 50 * t) + 0.5 * np.sin(2 * np.pi * 120 * t)
    cfg = vw.ScaleSelectionConfig(sampling_rate=fs)
    scales = vw.select_scales_adaptive(x, "morl", cfg)
    assert 1 <= len(scales) <= cfg.max_scales
    assert list(scales) == sorted(scales)
    lo, hi = vw.frequency_range_of_scales(scales, "morl", fs)
    # the selected band must cover the signal's two tones
    assert lo < 50 < hi and lo < 120 < hi


def test_adaptive_selector_spacings_and_count():
    fs = 100.0
    x = np.sin(2 * np.pi * 10 * np.arange(512) / fs)
    base = dict(sampling_rate=fs, min_frequency=2.0, max_frequency=40.0,
                use_signal_adaptation=False)
    log_s = vw.select_scales_adaptive(x, "morl", vw.ScaleSelectionConfig(**base))
    lin_s = vw.select_scales_adaptive(
        x, "morl", vw.ScaleSelectionConfig(**base, spacing="linear")
    )
    dy_s = vw.select_scales_adaptive(
        x, "morl", vw.ScaleSelectionConfig(**base, spacing="dyadic")
    )
    # fixed range -> count from octaves * scales_per_octave
    assert len(log_s) == vw.estimate_scale_count(2.0, 40.0, scales_per_octave=10)
    # linear spacing has constant differences
    diffs = np.diff(lin_s)
    np.testing.assert_allclose(diffs, diffs[0], rtol=1e-9)
    # dyadic scales are powers of two
    assert all(abs(np.log2(s) - round(np.log2(s))) < 1e-12 for s in dy_s)
    with pytest.raises(vw.InvalidArgumentError):
        vw.select_scales_adaptive(
            x, "morl", vw.ScaleSelectionConfig(sampling_rate=fs, spacing="weird")
        )
    with pytest.raises(vw.InvalidArgumentError):
        vw.estimate_scale_count(10.0, 5.0)


def test_adaptive_selector_max_scales_cap():
    fs = 1000.0
    x = np.random.default_rng(0).standard_normal(4096)
    cfg = vw.ScaleSelectionConfig(sampling_rate=fs, max_scales=16)
    scales = vw.select_scales_adaptive(x, "morl", cfg)
    assert len(scales) <= 16


def test_cwt_config_object():
    """CWTConfig (cwt/CWTConfig.java role): bundled engine options with
    auto FFT-vs-direct thresholding and fft_size validation."""
    x = jnp.asarray(_two_tone())
    cfg = vw.CWTConfig(boundary="zero", method="auto", fft_threshold=64)
    res = vw.cwt(x, (4.0, 8.0), "morl", config=cfg)
    base = vw.cwt(x, (4.0, 8.0), "morl", method="fft", boundary="zero")
    np.testing.assert_allclose(
        np.asarray(res.coeffs), np.asarray(base.coeffs), atol=1e-10
    )
    # tiny signal with auto -> direct path
    cfg_small = vw.CWTConfig(method="auto", fft_threshold=10**9)
    res_d = vw.cwt(jnp.asarray(_two_tone()[:64]), (2.0,), "morl", config=cfg_small)
    assert res_d.coeffs.shape == (1, 64)
    # explicit fft_size below the linear-convolution minimum is rejected
    with pytest.raises(vw.InvalidArgumentError):
        vw.cwt(x, (4.0, 8.0), "morl", config=vw.CWTConfig(fft_size=8))
    # analytic flag carried through the config
    res_a = vw.cwt(x, (8.0,), "morl", config=vw.CWTConfig(analytic=True))
    assert jnp.iscomplexobj(res_a.coeffs)
