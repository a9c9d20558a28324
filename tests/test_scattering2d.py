"""2-D scattering: translation invariance, orientation profiles, texture
discrimination."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

import vectorwave_tpu as vw
from vectorwave_tpu.errors import VectorWaveError


@pytest.mark.slow
def test_translation_invariance():
    rng = np.random.default_rng(0)
    n = 128
    yy, xx = np.mgrid[0:n, 0:n]
    img = (
        np.cos(2 * np.pi * 0.12 * (0.8 * xx + 0.6 * yy))
        + 0.2 * rng.standard_normal((n, n))
    ).astype(np.float32)
    f0 = np.asarray(vw.scattering2d(jnp.asarray(img), J=4, L=6).feature_vector())
    for s in (4, 8):
        shifted = np.roll(img, (s, s), axis=(0, 1))
        fs = np.asarray(
            vw.scattering2d(jnp.asarray(shifted), J=4, L=6).feature_vector()
        )
        assert np.linalg.norm(fs - f0) / np.linalg.norm(f0) < 0.01


@pytest.mark.slow
def test_angle_profile_follows_texture_orientation():
    n = 128
    yy, xx = np.mgrid[0:n, 0:n]
    for deg, expected_idx in ((0, 0), (45, 2), (90, 4), (135, 6)):
        th = np.deg2rad(deg)
        g = np.cos(
            2 * np.pi * 0.12 * (np.cos(th) * xx + np.sin(th) * yy)
        ).astype(np.float32)
        res = vw.scattering2d(jnp.asarray(g), J=3, L=8, order=1)
        energies = np.stack(
            [np.asarray(res.angle_energy(j, 8)) for j in range(3)]
        )
        j = int(np.argmax(energies.sum(axis=1)))
        assert int(np.argmax(energies[j])) == expected_idx, (deg, energies[j])


@pytest.mark.slow
def test_texture_discrimination_in_order2():
    """Same spectrum band, different spatial structure: stripes vs
    checkerboard-modulated stripes separate in the features."""
    rng = np.random.default_rng(1)
    n = 128
    yy, xx = np.mgrid[0:n, 0:n]
    base = np.cos(2 * np.pi * 0.15 * xx)
    mod = np.sign(np.cos(2 * np.pi * xx / 32) * np.cos(2 * np.pi * yy / 32))

    def feats(img, seed):
        noisy = (img + 0.1 * rng.standard_normal((n, n))).astype(np.float32)
        return np.asarray(
            vw.scattering2d(jnp.asarray(noisy), J=4, L=4).feature_vector()
        )

    fa = np.stack([feats(base, i) for i in range(4)])
    fb = np.stack([feats(base * mod, i) for i in range(4)])
    within = np.linalg.norm(fa - fa.mean(0), axis=1).mean() + np.linalg.norm(
        fb - fb.mean(0), axis=1
    ).mean()
    between = np.linalg.norm(fa.mean(0) - fb.mean(0))
    assert between > 2 * within


@pytest.mark.slow
def test_shapes_orders_and_validation():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64)).astype(np.float32))
    res = vw.scattering2d(x, J=3, L=4)
    assert res.s0.shape == (2, 8, 8)
    assert res.s1.shape == (2, 12, 8, 8)
    assert res.s2.shape[1] == len(res.pairs)
    assert float(jnp.min(res.s1)) >= 0
    r1 = vw.scattering2d(x, J=3, L=4, order=1)
    assert r1.s2 is None
    with pytest.raises(VectorWaveError):
        vw.scattering2d(jnp.zeros(64), J=2)
    with pytest.raises(VectorWaveError):
        vw.scattering2d(jnp.zeros((60, 64)), J=3)  # stride must divide
    with pytest.raises(VectorWaveError):
        vw.scattering2d(jnp.zeros((64, 64)), J=3, order=5)
