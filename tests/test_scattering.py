"""Scattering transform: invariance, frequency localization, AM detection."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError
from vectorwave_tpu.transforms.scattering import scattering_filterbank


def test_filterbank_partitions_the_spectrum():
    psis, xis, phi = scattering_filterbank(2048, J=6, Q=8)
    assert len(xis) == psis.shape[0]
    assert np.all(np.diff(xis) < 0)  # descending ladder
    # Littlewood-Paley-type covering: combined response has no deep holes
    # between the averaging band and the top wavelet
    freqs = np.fft.fftfreq(2048)
    total = (np.abs(psis) ** 2).sum(axis=0) + np.abs(phi) ** 2
    band = (freqs > 1.5 / 64) & (freqs < 0.4)
    assert total[band].min() > 0.2 * total[band].max()
    # every wavelet is analytic and DC-free
    assert np.abs(psis[:, freqs < 0]).max() == 0.0
    assert np.abs(psis[:, 0]).max() < 1e-12


def test_translation_invariance_of_features():
    rng = np.random.default_rng(0)
    n = 4096
    t = np.arange(n)
    x = (
        np.sin(2 * np.pi * 0.05 * t) * np.exp(-0.5 * ((t - 2000) / 300) ** 2)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    f0 = np.asarray(vw.scattering1d(jnp.asarray(x), J=7, Q=8).feature_vector())
    for shift in (8, 64):
        fs = np.asarray(
            vw.scattering1d(
                jnp.asarray(np.roll(x, shift)), J=7, Q=8
            ).feature_vector()
        )
        assert np.linalg.norm(fs - f0) / np.linalg.norm(f0) < 0.02


def test_s1_localizes_tone_frequency():
    t = np.arange(4096)
    for f in (0.04, 0.1, 0.22):
        tone = np.cos(2 * np.pi * f * t).astype(np.float32)
        res = vw.scattering1d(jnp.asarray(tone), J=6, Q=8)
        peak = res.xi1[int(np.argmax(np.asarray(res.s1).mean(-1)))]
        assert abs(np.log2(peak / f)) < 1.0 / 8 + 1e-6  # within one Q-step


def test_order2_detects_amplitude_modulation():
    t = np.arange(4096)
    carrier = np.cos(2 * np.pi * 0.1 * t)
    am = (carrier * (1 + 0.8 * np.cos(2 * np.pi * 0.004 * t))).astype(np.float32)
    pure = carrier.astype(np.float32)
    r_am = vw.scattering1d(jnp.asarray(am), J=8, Q=8)
    r_pu = vw.scattering1d(jnp.asarray(pure), J=8, Q=8)
    diff = np.asarray(r_am.s2).mean(-1) - np.asarray(r_pu.s2).mean(-1)
    i1, i2 = r_am.pairs[int(np.argmax(diff))]
    assert abs(np.log2(r_am.xi1[i1] / 0.1)) < 0.3  # carrier band
    assert r_am.xi2[i2] < 0.02  # slow-modulation band
    # modulation energy is significant relative to the pure tone's paths
    assert diff.max() > 3 * np.abs(np.asarray(r_pu.s2).mean(-1)).max() / 10


def test_shapes_batch_jit_and_nonnegativity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 3, 2048)).astype(np.float32))
    fn = jax.jit(lambda y: vw.scattering1d(y, J=5, Q=4).feature_vector())
    feats = fn(x)
    res = vw.scattering1d(x, J=5, Q=4)
    n1 = len(res.xi1)
    assert res.s0.shape == (2, 3, 2048 // 32)
    assert res.s1.shape == (2, 3, n1, 64)
    assert res.s2.shape[:-1] == (2, 3, len(res.pairs))
    assert feats.shape == (2, 3, 1 + n1 + len(res.pairs))
    assert float(jnp.min(res.s1)) >= 0 and float(jnp.min(res.s2)) >= 0
    # order-1 variant
    r1 = vw.scattering1d(x, J=5, Q=4, order=1)
    assert r1.s2 is None
    assert r1.feature_vector().shape == (2, 3, 1 + n1)


def test_validation():
    with pytest.raises(VectorWaveError):
        vw.scattering1d(jnp.zeros(32), J=6)  # too short
    with pytest.raises(VectorWaveError):
        vw.scattering1d(jnp.zeros(1024), J=5, order=3)
    with pytest.raises(VectorWaveError):
        vw.scattering1d(jnp.zeros(1000), J=5)  # stride must divide n
