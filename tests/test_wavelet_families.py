"""Extended family coverage: Coiflets, biorthogonal splines, Meyer, Battle-Lemarié.

Counterpart of the reference's per-family verification
(``Coiflet.verifyCoefficients``, ``BiorthogonalSpline``,
``verification/WaveletCoefficientVerificationTest``) plus MODWT round-trips
through the non-orthogonal pairs.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from .conftest import composite_sin

COIF_ORDERS = list(range(1, 18))
BIOR_NAMES = [
    "bior1.1", "bior1.3", "bior1.5",
    "bior2.2", "bior2.4", "bior2.6", "bior2.8",
    "bior3.1", "bior3.3", "bior3.5", "bior3.7", "bior3.9",
    "bior4.4", "bior5.5", "bior6.8",
]


@pytest.mark.parametrize("order", COIF_ORDERS)
def test_coiflet_invariants(order):
    """All coiflet orders pass strict orthogonality — tighter than the
    reference, whose coif2 table is only 1e-4 accurate (Wavelet.java:125)."""
    w = vw.wavelet(f"coif{order}")
    h = w.dec_lo
    assert len(h) == 6 * order
    assert abs(h.sum() - math.sqrt(2.0)) < 1e-12
    assert abs((h * h).sum() - 1.0) < 1e-12
    for k in range(2, len(h), 2):
        assert abs(np.dot(h[:-k], h[k:])) < 1e-12


def test_coif1_closed_form():
    """coif1 has a closed form in sqrt(7) (Daubechies 1992): the refined
    filter must match it to machine precision."""
    s7 = math.sqrt(7.0)
    expected = np.array(
        [s7 - 3, 1 - s7, 14 - 2 * s7, 14 + 2 * s7, 5 + s7, 1 - s7]
    ) * (math.sqrt(2.0) / 32.0)
    h = vw.wavelet("coif1").dec_lo
    np.testing.assert_allclose(h, expected, rtol=0, atol=1e-14)


def test_coiflet_moments():
    """coif_K: 2K vanishing wavelet moments and 2K-1 scaling moments."""
    w = vw.wavelet("coif3")
    h, g = w.dec_lo, w.dec_hi
    n = np.arange(len(h), dtype=np.float64)
    tau = round(float((n * h).sum()) / math.sqrt(2.0))
    # wavelet moments via g
    for j in range(6):
        moment = float(np.sum(n**j * g))
        assert abs(moment) < 1e-7 * 10.0**j, (j, moment)
    # scaling moments about tau
    for j in range(1, 6):
        moment = float(np.sum((n - tau) ** j * h))
        assert abs(moment) < 1e-7 * 10.0**j, (j, moment)


@pytest.mark.parametrize("name", BIOR_NAMES)
def test_biorthogonal_validation(name):
    w = vw.wavelet(name)
    assert w.wavelet_type is vw.WaveletType.BIORTHOGONAL
    assert w.validate_perfect_reconstruction()
    rb = vw.wavelet(name.replace("bior", "rbio"))
    np.testing.assert_allclose(rb.dec_lo, w.rec_lo, atol=0)
    np.testing.assert_allclose(rb.rec_lo, w.dec_lo, atol=0)


def test_bior44_is_cdf97():
    """bior4.4's analysis filter is the JPEG2000 CDF 9/7 pair
    (reference cites this at BiorthogonalSpline.java:217)."""
    published = [
        0.03782845550726404, -0.023849465019556843, -0.11062440441843718,
        0.37740285561283066, 0.8526986790088938, 0.37740285561283066,
        -0.11062440441843718, -0.023849465019556843, 0.03782845550726404,
    ]
    np.testing.assert_allclose(vw.wavelet("bior4.4").dec_lo, published, atol=1e-11)


@partial(jax.jit, static_argnames=("name", "levels"))
def _roundtrip(x, name, levels):
    res = vw.modwt_multilevel(x, name, levels=levels, boundary="periodic")
    return vw.imodwt_multilevel(res, name, boundary="periodic")


@pytest.mark.parametrize("name", ["coif5", "bior2.4", "bior4.4", "rbio3.3", "dmey"])
def test_periodic_roundtrip_extended_families(name):
    n = 512
    x = jnp.asarray(composite_sin(n, noise_std=0.3))
    levels = min(3, vw.max_levels(n, name))
    xr = _roundtrip(x, name, levels)
    err = float(jnp.max(jnp.abs(x - xr)))
    tol = 1e-4 if name == "dmey" else 1e-10
    assert err < tol, (name, err)


def test_blem_roundtrip_quality():
    """Battle-Lemarié short truncations reconstruct to ~1e-2 (still far better
    than the reference's tables, which deviate by 5-20%)."""
    x = jnp.asarray(composite_sin(256, noise_std=0.2))
    xr = _roundtrip(x, "blem3", 2)
    rel = float(jnp.sqrt(jnp.mean((x - xr) ** 2)) / jnp.std(x))
    assert rel < 0.08, rel


def test_dmey_orthogonality():
    h = vw.wavelet("dmey").dec_lo
    assert len(h) == 62
    orth = max(abs(np.dot(h[:-k], h[k:])) for k in range(2, len(h), 2))
    assert orth < 1e-4  # reference tolerance is 3e-3 (Wavelet.java:126)


def test_registry_family_counts():
    names = vw.available_wavelets()
    assert sum(1 for n in names if n.startswith("coif")) == 17
    assert sum(1 for n in names if n.startswith("bior")) == 15
    assert sum(1 for n in names if n.startswith("rbio")) == 15
    assert sum(1 for n in names if n.startswith("blem")) == 5
    assert "dmey" in names
