"""Matching pursuit: planted-atom recovery, energy decay, invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.optimize.mp import matching_pursuit
from vectorwave_tpu.transforms.cwt import _resolve_continuous, _sample_bank

SCALES = (2.0, 4.0, 8.0, 16.0, 32.0)


def _atom(n: int, scale_idx: int, shift: int) -> np.ndarray:
    w = _resolve_continuous("mexh")
    bank, _ = _sample_bank(w, SCALES, n)
    row = bank[scale_idx].real
    row = np.roll(row, shift)
    return row / np.linalg.norm(row)


def test_recovers_planted_atoms():
    n = 512
    x = 3.0 * _atom(n, 1, 100) - 2.0 * _atom(n, 3, 380)
    res = matching_pursuit(jnp.asarray(x), SCALES, "mexh", steps=6)
    picks = {
        (int(s), int(t))
        for s, t in zip(np.asarray(res.scale_indices), np.asarray(res.shifts))
    }
    assert any(s == 1 and abs(t - 100) <= 1 for s, t in picks)
    assert any(s == 3 and abs(t - 380) <= 1 for s, t in picks)
    # the two planted amplitudes dominate the coefficient list
    coeffs = np.sort(np.abs(np.asarray(res.coeffs)))[::-1]
    assert coeffs[0] == pytest.approx(3.0, rel=0.1)
    assert coeffs[1] == pytest.approx(2.0, rel=0.15)
    # near-complete energy capture
    assert float(res.energies[-1]) < 1e-2 * float((jnp.asarray(x) ** 2).sum())


def test_energy_monotone_and_split_invariant(rng):
    n = 256
    x = jnp.asarray(rng.standard_normal(n))
    res = matching_pursuit(x, SCALES, "mexh", steps=12)
    e = np.asarray(res.energies)
    assert (np.diff(e) <= 1e-9).all()  # monotone decrease
    np.testing.assert_allclose(
        np.asarray(res.approx + res.residual), np.asarray(x), atol=1e-10
    )
    assert float(e[-1]) < float((x**2).sum())


def test_batched_and_jitted(rng):
    n = 256
    x0 = 2.0 * _atom(n, 2, 60)
    x1 = 1.5 * _atom(n, 4, 200)
    batch = jnp.asarray(np.stack([x0, x1]))

    fn = jax.jit(lambda sig: matching_pursuit(sig, SCALES, "mexh", steps=3))
    res = fn(batch)
    assert res.coeffs.shape == (2, 3)
    assert int(res.scale_indices[0, 0]) == 2
    assert int(res.scale_indices[1, 0]) == 4
    assert abs(int(res.shifts[0, 0]) - 60) <= 1
    # atom_scales maps indices to values
    assert float(res.atom_scales()[0, 0]) == pytest.approx(8.0)


def test_validation():
    with pytest.raises(vw.InvalidArgumentError):
        matching_pursuit(jnp.zeros(64), SCALES, "cmor")  # complex wavelet
    with pytest.raises(vw.InvalidArgumentError):
        matching_pursuit(jnp.zeros(64), SCALES, "mexh", steps=0)
    with pytest.raises(vw.InvalidArgumentError):
        matching_pursuit(jnp.zeros(1), SCALES, "mexh")
