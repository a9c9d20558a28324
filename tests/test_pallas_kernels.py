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
        x, name, levels=levels, boundary=boundary, tile=1024, interpret=True,
        precision="float32",
    )
    ref = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary, backend="jnp")
    for d, r in zip(details, ref.details):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(ref.approx), atol=2e-6)


@pytest.mark.parametrize("boundary", ["periodic"])
def test_fused_roundtrip(boundary):
    x = _x32((2, 4096), seed=1)
    details, approx = fused_analysis(
        x, "db4", levels=6, boundary=boundary, tile=2048, interpret=True,
        precision="float32",
    )
    xr = fused_synthesis(
        details, approx, "db4", boundary=boundary, tile=2048, interpret=True,
        precision="float32",
    )
    assert float(jnp.max(jnp.abs(xr - x))) < 5e-6


def test_fused_synthesis_matches_jnp_inverse():
    x = _x32((2, 2048), seed=2)
    res = vw.modwt_multilevel(x, "db4", levels=4, backend="jnp")
    fused = fused_synthesis(
        res.details, res.approx, "db4", boundary="periodic", tile=1024,
        interpret=True, precision="float32",
    )
    ref = vw.imodwt_multilevel(res, "db4", backend="jnp")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=5e-6)


def test_fused_1d_input():
    x = _x32(1024, seed=3)
    details, approx = fused_analysis(
        x, "haar", levels=3, boundary="periodic", tile=512, interpret=True,
        precision="float32",
    )
    assert details[0].shape == (1024,)
    ref = vw.modwt_multilevel(x, "haar", levels=3, backend="jnp")
    np.testing.assert_allclose(np.asarray(details[2]), np.asarray(ref.details[2]), atol=2e-6)


@pytest.mark.parametrize("name,levels,n", [("db4", 4, 2048), ("sym8", 3, 1000),
                                           ("haar", 5, 4096)])
def test_fused_symmetric_analysis_matches_jnp(name, levels, n):
    """Round-2: symmetric analysis runs the cascade kernel with per-level
    edge mirrors and matches the jnp symmetric cascade exactly."""
    x = _x32((3, n), seed=13)
    details, approx = fused_analysis(
        x, name, levels=levels, boundary="symmetric", tile=1024, interpret=True,
        precision="float32",
    )
    ref = vw.modwt_multilevel(x, name, levels=levels, boundary="symmetric",
                              backend="jnp")
    for d, r in zip(details, ref.details):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(ref.approx),
                               atol=2e-6)


def test_fused_bogus_boundary_rejected():
    with pytest.raises(vw.InvalidArgumentError):
        fused_analysis(_x32((2, 512)), "db4", levels=3, boundary="nope",
                       interpret=True)


def test_fused_synthesis_unknown_boundary_rejected():
    """Round-1 fix: synthesis used to silently compute zero-extension for
    unknown boundaries; it must raise like analysis does.  (Symmetric is a
    SERVED mode since round 3 — kernels/modwt_symmetric.py.)"""
    x = _x32((2, 512), seed=7)
    res = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    with pytest.raises(vw.InvalidArgumentError):
        fused_synthesis(
            res.details, res.approx, "db4", boundary="reflect", interpret=True
        )
    xr = fused_synthesis(
        res.details, res.approx, "db4", boundary="symmetric", interpret=True,
        precision="float32",
    )
    ref = vw.imodwt_multilevel(res, "db4", boundary="symmetric", backend="jnp")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n", [1000, 97 * 64, 4097])
def test_fused_arbitrary_n(n):
    """Non-power-of-two N routes through pad-to-tile + output slicing."""
    x = _x32((2, n), seed=11)
    details, approx = fused_analysis(
        x, "db4", levels=3, boundary="periodic", tile=1024, interpret=True,
        precision="float32",
    )
    assert approx.shape == (2, n)
    ref = vw.modwt_multilevel(x, "db4", levels=3, backend="jnp")
    for d, r in zip(details, ref.details):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=2e-6)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(ref.approx), atol=2e-6)
    xr = fused_synthesis(
        details, approx, "db4", boundary="periodic", tile=1024, interpret=True,
        precision="float32",
    )
    assert xr.shape == (2, n)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_auto_tiles_respect_budget():
    """Tile selection must fit the VMEM budget at any batch/length combo
    (round-1's divisor loop could blow it for non-pow2 N)."""
    from vectorwave_tpu.kernels.modwt_mxu import _auto_tiles

    for b, n_rows in ((128, 8192), (1, 8192), (16, 31), (7, 513)):
        b_tile, tile_rows = _auto_tiles(b, 6, 8, n_rows, 512)
        assert b % b_tile == 0
        assert tile_rows % 8 == 0
        per = b_tile * (tile_rows + 8) * 128 * 20 * 4
        assert per <= 12 * 1024 * 1024


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



@pytest.mark.parametrize("precision,tol", [("float32", 5e-6), ("bf16_3x", 2e-4)])
def test_fused_precision_modes(precision, tol):
    """Precision ladder: float32 ~ f32-exact; bf16_3x ~ 1e-5 relative (the
    default; 1.7x faster on chip); bf16 coarser still (not CI-gated — the
    interpreter does not emulate MXU bf16 rounding faithfully)."""
    x = _x32((2, 2048), seed=21)
    details, approx = fused_analysis(
        x, "db4", levels=4, boundary="periodic", tile=1024, interpret=True,
        precision=precision,
    )
    xr = fused_synthesis(
        details, approx, "db4", boundary="periodic", tile=1024, interpret=True,
        precision=precision,
    )
    assert float(jnp.max(jnp.abs(xr - x))) < tol


def test_fused_precision_config_default():
    assert vw.get_fused_precision() in ("float32", "bf16_3x", "bf16")
    vw.set_fused_precision("float32")
    try:
        assert vw.get_fused_precision() == "float32"
    finally:
        vw.set_fused_precision("bf16_3x")
    with pytest.raises(vw.InvalidConfigurationError):
        vw.set_fused_precision("fp8")


def test_composite_macs_per_sample():
    """The cost model PERF.md cites: db4 x 6 levels costs exactly 21 analysis
    + 21 synthesis [128,128] band blocks per 128 samples (5,376 MACs/sample
    round trip), and every MAC count is a positive multiple of 128."""
    from vectorwave_tpu.kernels.modwt_mxu import composite_macs_per_sample

    w = vw.wavelet("db4")
    macs = composite_macs_per_sample((w.dec_lo, w.dec_hi), 6)
    assert macs == {"analysis": 21 * 128, "synthesis": 21 * 128}
    haar = vw.wavelet("haar")
    m1 = composite_macs_per_sample((haar.dec_lo, haar.dec_hi), 1)
    # single level haar: d1 and a1 each span 2 taps -> 2 blocks per plane
    # direction at most; counts are structural, just pin monotonicity
    m6 = composite_macs_per_sample((haar.dec_lo, haar.dec_hi), 6)
    assert m1["analysis"] < m6["analysis"]
    for m in (m1, m6):
        assert all(v % 128 == 0 and v > 0 for v in m.values())
