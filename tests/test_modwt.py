"""Single-level MODWT correctness.

Mirrors the reference's mathematical-invariant tests:
``ModwtPeriodicRoundTripTest`` (max|x-x_hat| < 1e-9, energy to 1e-8),
``MODWTPercivalWaldenValidationTest`` (hand-computed Haar values at 1e-12),
plus golden-oracle equivalence for every boundary mode and shift-invariance.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from .conftest import composite_sin
from .golden import imodwt_golden, modwt_golden


@partial(jax.jit, static_argnames=("name", "boundary"))
def _roundtrip(x, name, boundary):
    res = vw.modwt(x, name, boundary=boundary)
    return vw.imodwt(res, name, boundary=boundary)


@partial(jax.jit, static_argnames=("name", "boundary"))
def _forward(x, name, boundary):
    return vw.modwt(x, name, boundary=boundary)


@pytest.mark.parametrize("n", [128, 129, 256])
@pytest.mark.parametrize("name", ["haar", "db4"])
def test_periodic_roundtrip(name, n):
    """ModwtPeriodicRoundTripTest.java:24-41 — exact reconstruction, energy."""
    x = jnp.asarray(composite_sin(n, noise_std=0.3))
    xr = _roundtrip(x, name, "periodic")
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-9
    res = _forward(x, name, "periodic")
    energy_in = float((x**2).sum())
    energy_out = float(res.energy())
    assert abs(energy_in - energy_out) / energy_in < 1e-8


def test_haar_percival_walden_values():
    """Hand-derived Haar MODWT: W_t = (x_t - x_{t-1})/2, V_t = (x_t + x_{t-1})/2
    (Percival & Walden eq. 5.4 with h = {1/2, 1/2}, g = {1/2, -1/2};
    reference: MODWTPercivalWaldenValidationTest, EPSILON = 1e-12)."""
    x = np.array([1.0, 2.0, -3.0, 4.5, 0.25, -1.0, 7.0, 3.0])
    res = _forward(jnp.asarray(x), "haar", "periodic")
    n = len(x)
    expected_detail = np.array([(x[t] - x[t - 1]) / 2.0 for t in range(n)])
    expected_approx = np.array([(x[t] + x[t - 1]) / 2.0 for t in range(n)])
    np.testing.assert_allclose(np.asarray(res.detail), expected_detail, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.approx), expected_approx, rtol=0, atol=1e-12)


def test_impulse_response_is_scaled_filter():
    """Unit impulse at t=0 produces the (1/sqrt2-scaled) filters at the taps."""
    n = 32
    x = np.zeros(n)
    x[0] = 1.0
    w = vw.wavelet("db4")
    res = _forward(jnp.asarray(x), "db4", "periodic")
    detail = np.asarray(res.detail)
    expected = np.zeros(n)
    scaled = w.dec_hi / np.sqrt(2.0)
    for l, c in enumerate(scaled):
        expected[l % n] += c
    np.testing.assert_allclose(detail, expected, rtol=0, atol=1e-14)


@pytest.mark.parametrize("boundary", ["periodic", "zero", "symmetric"])
@pytest.mark.parametrize("name", ["haar", "db4"])
def test_golden_equivalence_forward(name, boundary):
    """JAX ops match the scalar-reference semantics exactly (all boundaries)."""
    n = 97  # odd, non-power-of-2
    x = composite_sin(n, noise_std=0.5)
    w = vw.wavelet(name)
    res = _forward(jnp.asarray(x), name, boundary)
    g_approx, g_detail = modwt_golden(x, w, boundary)
    np.testing.assert_allclose(np.asarray(res.approx), g_approx, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.detail), g_detail, rtol=0, atol=1e-12)


@pytest.mark.parametrize("boundary", ["periodic", "zero", "symmetric"])
def test_golden_equivalence_inverse(boundary):
    n = 64
    x = composite_sin(n)
    w = vw.wavelet("db4")
    res = _forward(jnp.asarray(x), "db4", boundary)
    xr = vw.imodwt(res, "db4", boundary=boundary)
    g = imodwt_golden(np.asarray(res.approx), np.asarray(res.detail), w, boundary)
    np.testing.assert_allclose(np.asarray(xr), g, rtol=0, atol=1e-12)


def test_shift_invariance_periodic():
    """MODWT is circular-shift equivariant under PERIODIC boundaries."""
    n = 128
    x = composite_sin(n, noise_std=0.2)
    shift = 13
    res = _forward(jnp.asarray(x), "db4", "periodic")
    res_shifted = _forward(jnp.asarray(np.roll(x, shift)), "db4", "periodic")
    np.testing.assert_allclose(
        np.asarray(res_shifted.detail), np.roll(np.asarray(res.detail), shift), atol=1e-12
    )


def test_batch_leading_axes():
    """Batch processing = leading axes (the BatchMODWT facade analogue)."""
    batch = np.stack([composite_sin(64, seed=s, noise_std=0.1) for s in range(5)])
    res = _forward(jnp.asarray(batch), "db4", "periodic")
    assert res.approx.shape == (5, 64)
    for i in range(5):
        single = _forward(jnp.asarray(batch[i]), "db4", "periodic")
        np.testing.assert_allclose(np.asarray(res.detail[i]), np.asarray(single.detail), atol=1e-14)


def test_continuous_wavelet_rejected():
    x = jnp.zeros(16)
    with pytest.raises(vw.InvalidArgumentError):
        vw.modwt(x, vw.ContinuousWavelet("fake", "Fake", lambda t: t, 1.0, 1.0))
