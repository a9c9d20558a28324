"""Fused Pallas kernel equivalence (interpreter mode on CPU).

The analogue of the reference's SIMD-vs-scalar equivalence suite
(vectorwave-extensions tests comparing BatchSIMDMODWT against ScalarOps):
the fused cascade kernels must match the portable jnp path to fp32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.kernels import fused_analysis, fused_synthesis
from vectorwave_tpu.kernels.modwt_pallas import total_halo
from .conftest import composite_sin


def _x32(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
@pytest.mark.parametrize("name,levels", [("haar", 4), ("db4", 6), ("sym8", 3)])
def test_fused_analysis_matches_jnp(name, levels, boundary):
    x = _x32((4, 2048))
    details, approx = fused_analysis(
        x, name, levels=levels, boundary=boundary, tile=1024, interpret=True
    )
    ref = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary, backend="jnp")
    for d, r in zip(details, ref.details):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(ref.approx), atol=2e-6)


@pytest.mark.parametrize("boundary", ["periodic"])
def test_fused_roundtrip(boundary):
    x = _x32((2, 4096), seed=1)
    details, approx = fused_analysis(
        x, "db4", levels=6, boundary=boundary, tile=2048, interpret=True
    )
    xr = fused_synthesis(
        details, approx, "db4", boundary=boundary, tile=2048, interpret=True
    )
    assert float(jnp.max(jnp.abs(xr - x))) < 5e-6


def test_fused_synthesis_matches_jnp_inverse():
    x = _x32((2, 2048), seed=2)
    res = vw.modwt_multilevel(x, "db4", levels=4, backend="jnp")
    fused = fused_synthesis(
        res.details, res.approx, "db4", boundary="periodic", tile=1024, interpret=True
    )
    ref = vw.imodwt_multilevel(res, "db4", backend="jnp")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-6)


def test_fused_1d_input():
    x = _x32(1024, seed=3)
    details, approx = fused_analysis(
        x, "haar", levels=3, boundary="periodic", tile=512, interpret=True
    )
    assert details[0].shape == (1024,)
    ref = vw.modwt_multilevel(x, "haar", levels=3, backend="jnp")
    np.testing.assert_allclose(np.asarray(details[2]), np.asarray(ref.details[2]), atol=2e-6)


def test_fused_symmetric_rejected():
    with pytest.raises(vw.InvalidArgumentError):
        fused_analysis(_x32((2, 512)), "db4", levels=3, boundary="symmetric", interpret=True)


def test_fused_synthesis_symmetric_rejected():
    """Round-1 fix: synthesis used to silently compute zero-extension for
    any non-periodic boundary; it must raise like analysis does."""
    x = _x32((2, 512), seed=7)
    res = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    with pytest.raises(vw.InvalidArgumentError):
        fused_synthesis(
            res.details, res.approx, "db4", boundary="symmetric", interpret=True
        )


@pytest.mark.parametrize("n", [1000, 97 * 64, 4097])
def test_fused_arbitrary_n(n):
    """Non-power-of-two N routes through pad-to-tile + output slicing."""
    x = _x32((2, n), seed=11)
    details, approx = fused_analysis(
        x, "db4", levels=3, boundary="periodic", tile=1024, interpret=True
    )
    assert approx.shape == (2, n)
    ref = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    for d, r in zip(details, ref.details):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(ref.approx), atol=2e-6)
    xr = fused_synthesis(
        details, approx, "db4", boundary="periodic", tile=1024, interpret=True
    )
    assert xr.shape == (2, n)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_auto_tile_respects_budget_for_non_pow2():
    """Round-1 fix: the divisor loop used to blow the VMEM budget by doubling
    the tile until it divided N (ultimately tile=N)."""
    from vectorwave_tpu.kernels.modwt_pallas import _auto_tile

    tile = _auto_tile(128, 1_000_000, 6, 8192, 448)
    assert tile * 128 * (2 * 7 + 5) * 4 <= 32 * 1024 * 1024  # far under VMEM
    assert tile >= 448
    # tiny signals clamp to the rounded-up signal length (single padded tile)
    assert _auto_tile(1, 300, 2, 8192, 128) == 384


def test_invalid_backend_param_rejected():
    x = jnp.asarray(composite_sin(256), dtype=jnp.float32)
    with pytest.raises(vw.InvalidArgumentError):
        vw.modwt_multilevel(x, "db4", levels=3, backend="palas")
    res = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    with pytest.raises(vw.InvalidArgumentError):
        vw.imodwt_multilevel(res, "db4", backend="cuda")


def test_explicit_auto_backend_param():
    """'auto' must behave like backend=None (eligibility routing), not
    silently fall through to jnp-only dispatch."""
    x = jnp.asarray(composite_sin(256), dtype=jnp.float32)
    a = vw.modwt_multilevel(x, "db4", levels=3, backend="auto")
    b = vw.modwt_multilevel(x, "db4", levels=3)
    np.testing.assert_array_equal(np.asarray(a.approx), np.asarray(b.approx))
    xr = vw.imodwt_multilevel(a, "db4", backend="auto")
    assert xr.shape == x.shape


def test_total_halo():
    assert total_halo(8, 6) == 7 * 63
    assert total_halo(2, 3) == 7


def test_backend_config():
    assert vw.get_backend() in ("auto", "jnp", "pallas")
    vw.set_backend("jnp")
    try:
        x = jnp.asarray(composite_sin(256), dtype=jnp.float32)
        res = vw.modwt_multilevel(x, "db4", levels=3)
        assert res.levels == 3
    finally:
        vw.set_backend("auto")
    with pytest.raises(vw.InvalidConfigurationError):
        vw.set_backend("cuda")


def test_explicit_jnp_backend_param():
    x = jnp.asarray(composite_sin(256), dtype=jnp.float32)
    a = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    b = vw.modwt_multilevel(x, "db4", levels=3)  # auto -> jnp on CPU
    np.testing.assert_array_equal(np.asarray(a.approx), np.asarray(b.approx))
