"""Exact (double-float + sliced-MXU) kernels: the on-chip <=1e-10 tier.

The reference meets its 1e-12 parity gates in-process with Java doubles
(ModwtPeriodicRoundTripTest.java:37, MODWTPercivalWaldenValidationTest.java:
29-30); these tests pin the same grade for the TPU kernels (interpreter mode
here; bench.py measures the identical call compiled on the chip).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.kernels.modwt_exact import (
    analysis_exact,
    modwt_roundtrip_exact,
    synthesis_exact,
)
from vectorwave_tpu.kernels.modwt_pallas import _kernel_filters
from vectorwave_tpu.transforms.modwt import _resolve_discrete


def _combine(pair):
    return np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)


@pytest.mark.parametrize("wavelet,levels", [("db4", 4), ("sym8", 3)])
def test_exact_roundtrip_below_1e10(wavelet, levels):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1024)), dtype=jnp.float32)
    x64 = np.asarray(x, np.float64)
    # balanced (default) profile: 19 pairs, measured ~4e-12 (gate 1e-10)
    hi, lo = modwt_roundtrip_exact(x, wavelet, levels=levels, interpret=True)
    err = _combine((hi, lo)) - x64
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse < 1e-11, rmse
    # full profile: all-exact chains sit near 1e-13
    hi, lo = modwt_roundtrip_exact(x, wavelet, levels=levels, interpret=True,
                                   profile="full")
    err = _combine((hi, lo)) - x64
    assert float(np.sqrt(np.mean(err**2))) < 1e-12


def test_exact_analysis_matches_f64_cascade():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 512)), dtype=jnp.float32)
    x64 = jnp.asarray(np.asarray(x, np.float64))
    w = _resolve_discrete("db4")
    pairs = analysis_exact(
        x, 3, _kernel_filters(w, synthesis=False), True, interpret=True
    )
    ref = vw.modwt_multilevel(x64, "db4", levels=3, backend="jnp")
    ref_planes = tuple(ref.details) + (ref.approx,)
    for got_pair, ref_p in zip(pairs, ref_planes):
        np.testing.assert_allclose(
            _combine(got_pair), np.asarray(ref_p), atol=5e-13
        )


def test_exact_synthesis_inverts_exact_analysis_zero_boundary():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 512)), dtype=jnp.float32)
    w = _resolve_discrete("db4")
    pairs = analysis_exact(
        x, 2, _kernel_filters(w, synthesis=False), False, interpret=True
    )
    hi, lo = synthesis_exact(
        pairs, 2, _kernel_filters(w, synthesis=True), False, interpret=True
    )
    # zero boundary: interior samples (beyond the filter span) reconstruct
    span = (w.filter_length - 1) * (2**2 - 1)
    got = _combine((hi, lo))[:, span:-span]
    ref = np.asarray(x, np.float64)[:, span:-span]
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_public_exact_api_roundtrip_below_1e10():
    """vw.modwt_multilevel_exact / imodwt_multilevel_exact: the public
    exact-tier surface; hi+lo combined in f64 must round-trip <= 1e-10
    (BASELINE.json gate, interpret mode here; on-chip in bench.py)."""
    import numpy as np
    import jax.numpy as jnp
    import vectorwave_tpu as vw

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    details, approx = vw.modwt_multilevel_exact(
        x, "db4", levels=4, interpret=True
    )
    assert len(details) == 4 and len(approx) == 2
    hi, lo = vw.imodwt_multilevel_exact(details, approx, "db4",
                                        interpret=True)
    err = (np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
           - np.asarray(x, np.float64))
    rmse = float(np.sqrt(np.mean(err ** 2)))
    assert rmse <= 1e-10, rmse
    # 1-D squeeze path
    d1, a1 = vw.modwt_multilevel_exact(x[0], "sym8", levels=3,
                                       interpret=True)
    h1, l1 = vw.imodwt_multilevel_exact(d1, a1, "sym8", interpret=True)
    err1 = (np.asarray(h1, np.float64) + np.asarray(l1, np.float64)
            - np.asarray(x[0], np.float64))
    assert float(np.sqrt(np.mean(err1 ** 2))) <= 1e-10
