"""Lifting-scheme DWT: PR, convolution equivalence, lossless integer mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.lifting import (
    LIFTING_SCHEMES,
    effective_filters,
    get_lifting_scheme,
    lifting_dwt,
    lifting_dwt_int,
    lifting_idwt,
    lifting_idwt_int,
    lifting_wavedec,
    lifting_wavedec_int,
    lifting_waverec,
    lifting_waverec_int,
)

SCHEMES = sorted(LIFTING_SCHEMES)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_perfect_reconstruction(scheme, rng):
    x = jnp.asarray(rng.standard_normal((3, 64)))
    res = lifting_dwt(x, scheme)
    rec = lifting_idwt(res.approx, res.detail, scheme)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-12)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_multilevel_roundtrip(scheme, rng):
    x = jnp.asarray(rng.standard_normal(128))
    dec = lifting_wavedec(x, scheme, levels=4)
    assert dec.levels == 4
    assert dec.approx.shape[-1] == 8
    assert [d.shape[-1] for d in dec.details] == [64, 32, 16, 8]
    rec = lifting_waverec(dec, scheme)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-12)


def _best_row_alignment(eff: np.ndarray, filt: np.ndarray) -> float:
    """min over circular shift and sign of ||roll(eff, s)*sgn - row(filt)||_inf."""
    n = len(eff)
    row = np.zeros(n)
    row[: len(filt)] = filt
    best = np.inf
    for s in range(n):
        shifted = np.roll(eff, s)
        for sgn in (1.0, -1.0):
            best = min(best, float(np.max(np.abs(sgn * shifted - row))))
    return best


@pytest.mark.parametrize(
    "scheme,wavelet,tol",
    [("haar", "haar", 1e-12), ("db2", "db2", 1e-10), ("cdf97", "bior4.4", 1e-6)],
)
def test_equivalent_to_convolution_filters(scheme, wavelet, tol):
    """The lifting cascade IS the named wavelet's analysis bank (up to shift/sign)."""
    lo, hi = effective_filters(scheme, n=64)
    w = vw.as_wavelet(wavelet)
    assert _best_row_alignment(lo, np.asarray(w.dec_lo)) < tol
    assert _best_row_alignment(hi, np.asarray(w.dec_hi)) < tol


@pytest.mark.parametrize("scheme", ["haar", "db2"])
def test_orthonormal_energy_preserved(scheme, rng):
    x = jnp.asarray(rng.standard_normal(256))
    res = lifting_dwt(x, scheme)
    e = float((res.approx**2).sum() + (res.detail**2).sum())
    np.testing.assert_allclose(e, float((x**2).sum()), rtol=1e-12)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_integer_roundtrip_bit_exact(scheme, rng):
    x = jnp.asarray(rng.integers(-30000, 30000, size=(2, 128)), dtype=jnp.int32)
    res = lifting_dwt_int(x, scheme)
    assert res.approx.dtype == jnp.int32
    rec = lifting_idwt_int(res.approx, res.detail, scheme)
    assert (np.asarray(rec) == np.asarray(x)).all()


def test_integer_multilevel_lossless(rng):
    x = jnp.asarray(rng.integers(-(2**15), 2**15, size=512), dtype=jnp.int32)
    dec = lifting_wavedec_int(x, "legall53", levels=5)
    rec = lifting_waverec_int(dec, "legall53")
    assert (np.asarray(rec) == np.asarray(x)).all()


def test_integer_legall53_is_near_lossy_float_path(rng):
    """Unnormalised integer 5/3 approx tracks the float approx / sqrt(2)."""
    x = jnp.asarray(rng.integers(0, 255, size=256), dtype=jnp.int32)
    res_i = lifting_dwt_int(x, "legall53")
    res_f = lifting_dwt(x.astype(jnp.float64), "legall53")
    np.testing.assert_allclose(
        np.asarray(res_i.approx),
        np.asarray(res_f.approx) / np.sqrt(2.0),
        atol=1.0,  # rounding of each lifting step
    )


def test_jit_vmap_grad():
    x = jnp.asarray(np.linspace(-1.0, 1.0, 64))

    @jax.jit
    def detail_energy(sig):
        res = lifting_dwt(sig, "cdf97")
        return (res.detail**2).sum()

    g = jax.grad(detail_energy)(x)
    assert np.isfinite(np.asarray(g)).all()
    batch = jnp.stack([x, 2.0 * x])
    vb = jax.vmap(lambda s: lifting_dwt(s, "db2").approx)(batch)
    np.testing.assert_allclose(np.asarray(vb[1]), 2.0 * np.asarray(vb[0]), atol=1e-12)


def test_validation_errors():
    with pytest.raises(vw.InvalidArgumentError):
        lifting_dwt(jnp.zeros(63), "haar")  # odd length
    with pytest.raises(vw.InvalidArgumentError):
        lifting_dwt(jnp.zeros(64), "nosuch")
    with pytest.raises(vw.InvalidArgumentError):
        lifting_dwt(jnp.zeros(64), "haar", boundary="symmetric")
    with pytest.raises(vw.InvalidArgumentError):
        lifting_dwt_int(jnp.zeros(64), "haar")  # float input to int path
    with pytest.raises(vw.InvalidArgumentError):
        lifting_wavedec(jnp.zeros(40), levels=4)  # 40 % 16 != 0


def test_aliases_resolve():
    assert get_lifting_scheme("bior4.4").name == "cdf97"
    assert get_lifting_scheme("jpeg2000").name == "cdf97"
    assert get_lifting_scheme("bior2.2").name == "legall53"
    s = get_lifting_scheme("haar")
    assert get_lifting_scheme(s) is s
