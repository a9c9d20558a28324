"""Filter-table correctness: QMF invariants, published-value parity.

Mirrors the reference's verification tests
(``verification/WaveletCoefficientVerificationTest``,
``ValidatePerfectReconstructionTest``): sum/energy normalization, QMF relation,
even-shift orthogonality per family, plus literature parity for db2/db4/sym4
(values from Daubechies, "Ten Lectures on Wavelets", Table 6.1 — the same
source the reference cites at ``api/Daubechies.java:59``).
"""

import math

import numpy as np
import pytest

import vectorwave_tpu as vw

# Published Table-6.1 / PyWavelets values (decomposition low-pass, reference order)
DB2_PUBLISHED = [0.4829629131445341, 0.8365163037378079, 0.2241438680420134, -0.1294095225512603]
DB4_PUBLISHED = [
    0.23037781330885523, 0.7148465705525415, 0.6308807679295904, -0.02798376941698385,
    -0.18703481171888114, 0.030841381835986965, 0.032883011666982945, -0.010597401784997278,
]
SYM4_PUBLISHED = [
    -0.07576571478927333, -0.02963552764599851, 0.49761866763201545, 0.8037387518059161,
    0.29785779560527736, -0.09921954357684722, -0.012603967262037833, 0.0322231006040427,
]

ALL_ORTHOGONAL = (
    ["haar"]
    + [f"db{k}" for k in range(2, 39)]
    + [f"sym{k}" for k in range(2, 21)]
)


def test_haar_constants():
    w = vw.wavelet("haar")
    s = 1.0 / math.sqrt(2.0)
    np.testing.assert_allclose(w.dec_lo, [s, s], rtol=0, atol=1e-15)
    np.testing.assert_allclose(w.dec_hi, [s, -s], rtol=0, atol=1e-15)


@pytest.mark.parametrize("name,published", [("db2", DB2_PUBLISHED), ("db4", DB4_PUBLISHED)])
def test_daubechies_published_parity(name, published):
    w = vw.wavelet(name)
    np.testing.assert_allclose(w.dec_lo, published, rtol=0, atol=1e-11)


def test_sym4_published_parity():
    w = vw.wavelet("sym4")
    np.testing.assert_allclose(w.dec_lo, SYM4_PUBLISHED, rtol=0, atol=1e-9)


@pytest.mark.parametrize("name", ALL_ORTHOGONAL)
def test_orthogonal_invariants(name):
    w = vw.wavelet(name)
    h = w.dec_lo
    # sum(h) = sqrt(2), sum(h^2) = 1 (Wavelet.java:131-135)
    assert abs(h.sum() - math.sqrt(2.0)) < 1e-10
    assert abs((h * h).sum() - 1.0) < 1e-10
    # QMF: g[i] = (-1)^i h[L-1-i] (Wavelet.java:143-147)
    length = len(h)
    signs = np.where(np.arange(length) % 2 == 0, 1.0, -1.0)
    np.testing.assert_allclose(w.dec_hi, signs * h[::-1], rtol=0, atol=1e-15)
    # even-shift orthogonality (Wavelet.java:150-156)
    for k in range(2, length, 2):
        assert abs(np.dot(h[:-k], h[k:])) < 1e-10
    assert w.validate_perfect_reconstruction()


@pytest.mark.parametrize("name", ["db4", "db10", "sym8"])
def test_vanishing_moments(name):
    w = vw.wavelet(name)
    g = w.dec_hi
    n = np.arange(len(g), dtype=np.float64)
    for p in range(w.vanishing_moments):
        moment = float(np.sum(n**p * g))
        assert abs(moment) < 1e-8 * 10.0**p, (name, p, moment)


def test_registry_queries():
    assert "haar" in vw.available_wavelets()
    assert "db38" in vw.available_wavelets()
    assert vw.wavelet("DB4").name == "db4"  # case-insensitive
    assert vw.wavelet("db1").name == "haar"  # alias
    daubs = vw.wavelets_in_family("Daubechies")
    assert "db4" in daubs and "haar" not in daubs
    assert vw.is_compatible("db4", vw.TransformType.MODWT)
    assert not vw.is_compatible("db4", vw.TransformType.CWT)
    assert vw.recommended_transform("db4") is vw.TransformType.MODWT


def test_unknown_wavelet_error():
    with pytest.raises(vw.InvalidArgumentError) as exc_info:
        vw.wavelet("nosuchwavelet42")
    assert exc_info.value.code is vw.ErrorCode.CFG_UNSUPPORTED_WAVELET
