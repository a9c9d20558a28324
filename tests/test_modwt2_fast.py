"""2-D MODWT banded-MXU-matmul fast path (kernels/modwt2_mxu.py).

Parity oracle: the per-level à trous jnp path in transforms/twodim.py —
the fast path is the SAME pyramid expressed as per-axis composite filters
(telescoping PR identity in the module docstring), so subbands and
inverses must match to f32 round-off.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw


@pytest.fixture(autouse=True)
def _force_fast():
    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    yield
    vw.set_backend("auto")
    vw.set_fused_precision("bf16_3x")


def _jnp_ref(x, name, levels, boundary):
    vw.set_backend("jnp")
    try:
        res = vw.modwt2_multilevel(x, name, levels=levels, boundary=boundary)
        inv = vw.imodwt2_multilevel(res, name, boundary=boundary)
    finally:
        vw.set_backend("pallas")
    return res, inv


@pytest.mark.parametrize(
    "h,wd,name,levels,boundary",
    [
        (256, 128, "db4", 3, "periodic"),
        (128, 256, "sym8", 2, "zero"),
        (128, 128, "haar", 4, "periodic"),
        (256, 256, "bior2.2", 2, "periodic"),
    ],
)
def test_fast2_matches_jnp(h, wd, name, levels, boundary):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, wd)), jnp.float32)
    ref, ref_inv = _jnp_ref(x, name, levels, boundary)
    got = vw.modwt2_multilevel(x, name, levels=levels, boundary=boundary)
    for g3, r3 in zip(got.details, ref.details):
        for g, r in zip(g3, r3):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       atol=3e-6)
    np.testing.assert_allclose(np.asarray(got.approx),
                               np.asarray(ref.approx), atol=3e-6)
    got_inv = vw.imodwt2_multilevel(ref, name, boundary=boundary)
    np.testing.assert_allclose(np.asarray(got_inv), np.asarray(ref_inv),
                               atol=5e-6)
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(got_inv), np.asarray(x),
                                   atol=5e-6)


def test_fast2_ineligible_shapes_fall_back():
    """Non-lane-multiple axes and symmetric boundary must keep the jnp
    path (results still correct)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((100, 96)), jnp.float32)
    res = vw.modwt2_multilevel(x, "db4", levels=2)
    xr = vw.imodwt2_multilevel(res, "db4")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=1e-5)
    # symmetric stays on the jnp path (its multilevel inverse is the
    # reference's APPROXIMATE alignment-table reconstruction, so parity
    # with the jnp route — not tightness — is the contract here)
    x2 = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    res2 = vw.modwt2_multilevel(x2, "db4", levels=2, boundary="symmetric")
    xr2 = vw.imodwt2_multilevel(res2, "db4", boundary="symmetric")
    _, ref_inv = _jnp_ref(x2, "db4", 2, "symmetric")
    np.testing.assert_allclose(np.asarray(xr2), np.asarray(ref_inv),
                               atol=1e-6)


def test_fast2_energy_and_dtype_preserved():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)
    res = vw.modwt2_multilevel(x, "haar", levels=3)
    assert res.approx.dtype == jnp.float32
    total = float(res.approx.var())  # smoke: finite, sane
    assert np.isfinite(total)
