"""Wavelet variance / covariance / correlation + cross-wavelet toolkit.

Beyond-reference analysis capabilities (the reference's ComplexCWTResult
docstring advertises coherence/phase/ridge/instantaneous-frequency analyses
without implementing them — ComplexCWTResult.java:9-15).  Tests pin the
statistical identities: white-noise variance levels, exact energy
decomposition, perfect (anti-)correlation, coherence separation of locked
vs independent pairs, phase recovery of a known lag, instantaneous
frequency of a pure tone, and Viterbi ridge tracking of a chirp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.errors import InvalidArgumentError
from vectorwave_tpu.streaming import modwt_stream_block, streaming_init
from vectorwave_tpu.transforms.cwt import cwt, scales_log


# ---------------------------------------------------------------------------
# wavelet variance
# ---------------------------------------------------------------------------


def test_white_noise_variance_halves_per_level():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(2**16) * 2.0)
    r = vw.wavelet_variance(x, "db4", 6)
    expect = 4.0 / 2.0 ** np.arange(1, 7)
    np.testing.assert_allclose(np.asarray(r.variance), expect, rtol=0.12)
    assert bool(jnp.all((r.ci_low <= r.variance) & (r.variance <= r.ci_high)))
    assert r.n_levels == 6 and list(r.scales) == [1, 2, 4, 8, 16, 32]


def test_biased_estimator_energy_identity():
    """sum_j nu_j^2 + mean(a_J^2) == mean(x^2) exactly (periodic MODWT)."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal(4096))
    r = vw.wavelet_variance(x, "sym5", 5, unbiased=False)
    res = vw.modwt_multilevel(x, "sym5", levels=5, boundary="periodic")
    total = float(r.variance.sum() + (res.approx**2).mean())
    assert total == pytest.approx(float((x**2).mean()), rel=1e-12)


def test_variance_ignores_mean_offset():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(4096))
    r1 = vw.wavelet_variance(x, "db4", 4)
    r2 = vw.wavelet_variance(x + 1000.0, "db4", 4)
    np.testing.assert_allclose(
        np.asarray(r1.variance), np.asarray(r2.variance), rtol=1e-6, atol=1e-9
    )


def test_correlation_identical_and_opposite():
    x = jnp.asarray(np.random.default_rng(3).standard_normal(4096))
    rho, scales = vw.wavelet_correlation(x, x, "db4", 4)
    np.testing.assert_allclose(np.asarray(rho), 1.0, rtol=1e-12)
    rho2, _ = vw.wavelet_correlation(x, -x, "db4", 4)
    np.testing.assert_allclose(np.asarray(rho2), -1.0, rtol=1e-12)
    assert list(scales) == [1, 2, 4, 8]


def test_covariance_of_independent_series_is_small():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(2**14))
    y = jnp.asarray(rng.standard_normal(2**14))
    cov, _ = vw.wavelet_covariance(x, y, "db4", 4)
    assert float(jnp.max(jnp.abs(cov))) < 0.05


def test_variance_batch_and_jit():
    xb = jnp.asarray(np.random.default_rng(5).standard_normal((3, 4096)))
    r = vw.wavelet_variance(xb, "db4", 4)
    assert r.variance.shape == (3, 4)
    single = vw.wavelet_variance(xb[1], "db4", 4)
    np.testing.assert_array_equal(
        np.asarray(r.variance[1]), np.asarray(single.variance)
    )
    f = jax.jit(lambda y: vw.wavelet_variance(y, "db4", 4).variance)
    np.testing.assert_allclose(np.asarray(f(xb)), np.asarray(r.variance))


def test_variance_errors():
    x = jnp.ones(64)
    with pytest.raises(InvalidArgumentError):
        vw.wavelet_variance(x, "db4", 0)
    with pytest.raises(InvalidArgumentError):
        vw.wavelet_variance(x, "db38", 6)  # no boundary-free coeffs
    with pytest.raises(InvalidArgumentError):
        vw.wavelet_covariance(jnp.ones(64), jnp.ones(128), "db4", 2)


# ---------------------------------------------------------------------------
# cross-wavelet toolkit
# ---------------------------------------------------------------------------

_N = 1024
_SCALES = scales_log(2, 64, 24)


def _tone_pair(lag=np.pi / 3, noise=0.0, seed=0, f0=0.05):
    rng = np.random.default_rng(seed)
    t = np.arange(_N)
    x = np.sin(2 * np.pi * f0 * t) + noise * rng.standard_normal(_N)
    y = np.sin(2 * np.pi * f0 * t - lag) + noise * rng.standard_normal(_N)
    return jnp.asarray(x), jnp.asarray(y)


def _dominant_scale(coeffs):
    return int(np.argmax(np.asarray(jnp.abs(coeffs)).mean(axis=-1)))


def test_cross_wavelet_recovers_phase_lag():
    x, y = _tone_pair(noise=0.0)
    wxy = vw.cross_wavelet(x, y, _SCALES, "morl")
    assert jnp.iscomplexobj(wxy.coeffs) and wxy.coeffs.shape == (24, _N)
    si = _dominant_scale(wxy.coeffs)
    interior = np.angle(np.asarray(wxy.coeffs)[si, _N // 4 : -_N // 4])
    assert abs(np.median(interior) - np.pi / 3) < 0.15


def test_coherence_separates_locked_from_independent():
    x, y = _tone_pair(noise=0.3)
    indep = jnp.asarray(np.random.default_rng(9).standard_normal(_N))
    coh = vw.wavelet_coherence(x, y, _SCALES, "morl")
    si = _dominant_scale(vw.cross_wavelet(x, y, _SCALES, "morl").coeffs)
    locked = float(coh.mean_coherence()[si])
    rand = float(vw.wavelet_coherence(x, indep, _SCALES, "morl").mean_coherence()[si])
    assert locked > 0.9 and rand < 0.7 and locked > rand + 0.25
    assert bool(jnp.all((coh.coherence >= 0.0) & (coh.coherence <= 1.0)))


def test_phase_synchronization_plv():
    x, y = _tone_pair(noise=0.3)
    indep = jnp.asarray(np.random.default_rng(10).standard_normal(_N))
    si = _dominant_scale(vw.cross_wavelet(x, y, _SCALES, "morl").coeffs)
    assert float(vw.phase_synchronization(x, y, _SCALES, "morl")[si]) > 0.95
    assert float(vw.phase_synchronization(x, indep, _SCALES, "morl")[si]) < 0.6


def test_instantaneous_frequency_of_tone():
    x, _ = _tone_pair(noise=0.0)
    r = cwt(x, _SCALES, "morl", analytic=True)
    si = _dominant_scale(r.coeffs)
    inst = np.asarray(vw.instantaneous_frequency(r))[si, _N // 4 : -_N // 4]
    assert abs(np.median(inst) - 0.05) < 0.002
    real = cwt(x, _SCALES, "morl")  # real coeffs
    with pytest.raises(InvalidArgumentError):
        vw.instantaneous_frequency(real)


def test_ridge_tracks_chirp():
    t = np.arange(_N)
    chirp = jnp.asarray(np.sin(2 * np.pi * (0.01 * t + 0.00005 * t**2)))
    r = cwt(chirp, _SCALES, "morl", analytic=True)
    ridge = vw.extract_ridge(r, smoothness=2.0)
    idx = np.asarray(ridge.indices, dtype=float)
    # rising frequency -> falling scale index (scales ascending)
    assert idx[0] > idx[-1]
    assert np.all(np.diff(idx) <= 0.0 + 1e-9) or np.mean(np.diff(idx) <= 0) > 0.95
    assert ridge.scales.shape == (_N,) and ridge.amplitude.shape == (_N,)
    # smoothness=0 reduces to per-column argmax
    ridge0 = vw.extract_ridge(r, smoothness=0.0)
    np.testing.assert_array_equal(
        np.asarray(ridge0.indices),
        np.asarray(jnp.abs(r.coeffs).argmax(axis=-2)),
    )
    with pytest.raises(InvalidArgumentError):
        vw.extract_ridge(r, smoothness=-1.0)


def test_xwt_batch_and_jit():
    x, y = _tone_pair(noise=0.2)
    xb = jnp.stack([x, y])
    yb = jnp.stack([y, x])
    wb = vw.cross_wavelet(xb, yb, _SCALES, "morl")
    assert wb.coeffs.shape == (2, 24, _N)
    single = vw.cross_wavelet(x, y, _SCALES, "morl")
    np.testing.assert_allclose(
        np.asarray(wb.coeffs[0]), np.asarray(single.coeffs), rtol=1e-10
    )
    ridge_b = vw.extract_ridge(cwt(xb, _SCALES, "morl", analytic=True))
    assert ridge_b.indices.shape == (2, _N)
    f = jax.jit(
        lambda a, b: vw.wavelet_coherence(a, b, _SCALES, "morl").coherence
    )
    assert f(x, y).shape == (24, _N)


def test_cross_wavelet_length_mismatch():
    with pytest.raises(InvalidArgumentError):
        vw.cross_wavelet(jnp.ones(64), jnp.ones(128), (2.0, 4.0), "morl")


@pytest.mark.slow
def test_ridge_blocked_matches_sequential():
    """The blocked max-plus Viterbi equals the sequential scan DP exactly
    (f64): same indices on random fields, batched, at awkward lengths."""
    from vectorwave_tpu.transforms.xwt import (
        _viterbi_indices_blocked,
        _viterbi_indices_scan,
    )

    rng = np.random.default_rng(21)
    log_scales = np.log2(np.geomspace(2, 64, 12))
    pen = jnp.asarray(1.5 * (log_scales[:, None] - log_scales[None, :]) ** 2)
    for n in (1025, 1153, 2048):
        obs = jnp.asarray(rng.standard_normal((n, 3, 12)) * 2)
        seq = np.asarray(_viterbi_indices_scan(obs, pen))
        blk = np.asarray(_viterbi_indices_blocked(obs, pen, 128))
        np.testing.assert_array_equal(seq, blk)
    # public API routes long signals through the blocked path
    coeffs = jnp.asarray(np.abs(rng.standard_normal((12, 2048))) + 0.01)
    r = vw.extract_ridge(
        type(cwt(jnp.ones(8), (2.0,), "morl"))(coeffs, tuple(np.geomspace(2, 64, 12)), "zero")
    )
    assert r.indices.shape == (2048,)


# ---------------------------------------------------------------------------
# significance testing
# ---------------------------------------------------------------------------


def test_white_noise_exceedance_calibrated():
    """~5% of white-noise power exceeds the 95% level at EVERY scale (the
    exact bank-response background, not the single-frequency textbook
    approximation)."""
    rng = np.random.default_rng(30)
    scales = scales_log(2, 64, 16)
    rates = []
    for _ in range(8):
        x = jnp.asarray(rng.standard_normal(2048))
        r = cwt(x, scales, "morl", analytic=True, boundary="periodic")
        sig = vw.significant_power(r, x, "morl", lag1=0.0)
        power = np.asarray(jnp.abs(r.coeffs) ** 2)
        rates.append((power > np.asarray(sig.levels)[:, None]).mean(axis=-1))
    rates = np.mean(rates, axis=0)
    assert np.all(rates > 0.01) and np.all(rates < 0.12)
    assert abs(float(np.mean(rates)) - 0.05) < 0.025


def test_ar1_estimate_and_red_noise_null():
    rng = np.random.default_rng(31)
    n = 4096
    eps = rng.standard_normal(4 * n)
    ar = np.empty(4 * n)
    ar[0] = eps[0]
    for i in range(1, 4 * n):
        ar[i] = 0.8 * ar[i - 1] + eps[i]
    x = jnp.asarray(ar[-n:])
    assert abs(float(vw.ar1_coefficient(x)) - 0.8) < 0.05
    scales = scales_log(2, 64, 16)
    r = cwt(x, scales, "morl", analytic=True, boundary="periodic")
    sig = vw.significant_power(r, x, "morl")
    rate = float(
        (np.asarray(jnp.abs(r.coeffs) ** 2) > np.asarray(sig.levels)[:, None]).mean()
    )
    assert rate < 0.12  # red noise is NOT flagged as signal


def test_tone_is_significant_at_its_scale():
    rng = np.random.default_rng(32)
    n = 2048
    x = jnp.asarray(
        np.sin(2 * np.pi * 0.05 * np.arange(n)) + 0.5 * rng.standard_normal(n)
    )
    r = cwt(x, scales_log(2, 64, 16), "morl", analytic=True)
    sig = vw.significant_power(r, x, "morl")
    si = int(np.argmax(np.asarray(jnp.abs(r.coeffs)).mean(axis=-1)))
    assert float(np.asarray(sig.mask)[si].mean()) > 0.8
    assert sig.coi_scales.shape == (n,)


def test_cone_of_influence_shape():
    coi = np.asarray(vw.cone_of_influence(101))
    assert coi[0] == 0.0 and coi[-1] == 0.0
    assert np.argmax(coi) in (50, 51) and np.all(np.diff(coi[:50]) > 0)


def test_significance_errors():
    with pytest.raises(InvalidArgumentError):
        vw.significance_levels((2.0, 4.0), "morl", n=128, lag1=0.0, confidence=1.5)
    with pytest.raises(InvalidArgumentError):
        vw.cone_of_influence(0)


def test_phase_randomized_surrogates_preserve_spectrum():
    x = jnp.asarray(np.random.default_rng(40).standard_normal(512))
    s = vw.phase_randomized_surrogates(x, 4)
    assert s.shape == (4, 512)
    for k in range(4):
        np.testing.assert_allclose(
            np.abs(np.fft.rfft(np.asarray(s[k]))),
            np.abs(np.fft.rfft(np.asarray(x))),
            atol=1e-9,
        )
    # surrogates differ from each other and the original
    assert float(jnp.abs(s[0] - s[1]).max()) > 0.1
    assert float(jnp.abs(s[0] - x).max()) > 0.1


@pytest.mark.slow
def test_coherence_significance_monte_carlo():
    """Independent broadband noise stays below the surrogate level at most
    scales; a phase-locked pair exceeds it at the shared-tone scale."""
    rng = np.random.default_rng(41)
    n = 1024
    t = np.arange(n)
    x = jnp.asarray(np.sin(2 * np.pi * 0.05 * t) + 0.4 * rng.standard_normal(n))
    y = jnp.asarray(np.sin(2 * np.pi * 0.05 * t - 1.0) + 0.4 * rng.standard_normal(n))
    indep = jnp.asarray(rng.standard_normal(n))
    scales = scales_log(2, 64, 16)
    lev = vw.coherence_significance(x, y, scales, "morl", n_surrogates=32)
    assert lev.shape == (16,) and bool(jnp.all((lev >= 0) & (lev <= 1)))
    obs = vw.wavelet_coherence(x, y, scales, "morl").mean_coherence()
    si = int(np.argmax(np.asarray(obs)))
    assert float(obs[si]) > float(lev[si])
    lev_i = vw.coherence_significance(x, indep, scales, "morl", n_surrogates=32)
    obs_i = vw.wavelet_coherence(x, indep, scales, "morl").mean_coherence()
    assert float((obs_i <= lev_i).mean()) > 0.7
    with pytest.raises(InvalidArgumentError):
        vw.coherence_significance(x, y, scales, "morl", confidence=2.0)
    with pytest.raises(InvalidArgumentError):
        vw.phase_randomized_surrogates(x, 0)


# ---------------------------------------------------------------------------
# streaming (online) wavelet variance
# ---------------------------------------------------------------------------


def test_variance_stream_matches_whole_signal():
    """Folding streamed zero-boundary blocks reproduces the Percival-Walden
    unbiased estimator exactly: the boundary-free coefficients (t >= L_j - 1)
    are identical between the zero-history streaming transform and the
    periodic whole-signal transform."""
    rng = np.random.default_rng(7)
    n, block = 1024, 128
    x = jnp.asarray(rng.standard_normal(n), jnp.float64)
    ref = vw.wavelet_variance(x, "db4", 4)

    st = streaming_init("db4", 4, dtype=jnp.float64)
    acc = vw.variance_stream_init("db4", 4, dtype=jnp.float64)
    for i in range(0, n, block):
        st, res = modwt_stream_block(st, x[i : i + block], "db4", boundary="zero")
        acc = vw.variance_stream_update(acc, res.details, "db4")
    out = vw.variance_stream_result(acc)

    np.testing.assert_allclose(out.variance, ref.variance, rtol=1e-12)
    np.testing.assert_allclose(out.edof, ref.edof, rtol=1e-12)
    np.testing.assert_allclose(out.ci_low, ref.ci_low, rtol=1e-10)
    np.testing.assert_allclose(out.ci_high, ref.ci_high, rtol=1e-10)
    assert int(acc.position) == n


def test_variance_stream_batched_and_jittable():
    rng = np.random.default_rng(8)
    n, block = 512, 64
    x = jnp.asarray(rng.standard_normal((3, n)), jnp.float32)
    ref = vw.wavelet_variance(x, "haar", 3)

    step = jax.jit(
        lambda st, acc, blk: (
            lambda st2, res: (st2, vw.variance_stream_update(acc, res.details, "haar"))
        )(*modwt_stream_block(st, blk, "haar", boundary="zero"))
    )
    st = streaming_init("haar", 3, batch_shape=(3,))
    acc = vw.variance_stream_init("haar", 3, batch_shape=(3,))
    for i in range(0, n, block):
        st, acc = step(st, acc, x[:, i : i + block])
    out = vw.variance_stream_result(acc)
    assert out.variance.shape == (3, 3)
    np.testing.assert_allclose(out.variance, ref.variance, rtol=2e-5)


def test_variance_stream_validation():
    with pytest.raises(InvalidArgumentError):
        vw.variance_stream_init("db4", 0)
    acc = vw.variance_stream_init("db4", 4)
    st = streaming_init("db4", 2)
    st, res = modwt_stream_block(st, jnp.zeros(64), "db4", boundary="zero")
    with pytest.raises(InvalidArgumentError):
        vw.variance_stream_update(acc, res.details, "db4")
