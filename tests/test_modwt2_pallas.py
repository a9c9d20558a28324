"""True 2-D Pallas analysis kernel (kernels/modwt2_pallas.py): both
separable passes in VMEM, subbands written in standard layout.

Parity oracle: the jnp/XLA banded path (kernels/modwt2_mxu.py), itself
guarded against transforms/twodim.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vectorwave_tpu.kernels import modwt2_mxu as k2
from vectorwave_tpu.kernels.modwt2_pallas import modwt2_multilevel_pallas
from vectorwave_tpu.transforms.modwt import _resolve_discrete


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
@pytest.mark.parametrize("name,levels", [("db4", 3), ("haar", 4), ("sym8", 2)])
def test_2d_pallas_analysis_matches_xla_path(name, levels, boundary):
    rng = np.random.default_rng(0)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    det_p, ll_p = modwt2_multilevel_pallas(
        x, w, levels, boundary, "float32", interpret=True
    )
    det_x, ll_x = k2.modwt2_multilevel_fast(x, w, levels, boundary, "float32")
    for j in range(levels):
        for got, want, tag in zip(det_p[j], det_x[j], ("lh", "hl", "hh")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5,
                err_msg=f"level {j+1} {tag} {boundary}",
            )
    np.testing.assert_allclose(
        np.asarray(ll_p), np.asarray(ll_x), atol=2e-5, err_msg="ll"
    )


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
@pytest.mark.parametrize(
    "name,levels,hw",
    [
        ("db4", 5, 512),   # span 217 -> hb=2 halo blocks
        ("sym8", 4, 256),  # span 225 -> hb=2 at the minimum wtile=2
        ("db4", 6, 512),   # span 441 -> hb=4
    ],
)
def test_2d_pallas_deep_span_matches_xla_path(name, levels, hw, boundary):
    """Spans beyond one 128-block (hb >= 2): the generalized halo windows
    must still match the XLA banded path level for level."""
    rng = np.random.default_rng(3)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((1, hw, hw)), jnp.float32)
    det_p, ll_p = modwt2_multilevel_pallas(
        x, w, levels, boundary, "float32", interpret=True
    )
    det_x, ll_x = k2.modwt2_multilevel_fast(x, w, levels, boundary, "float32")
    for j in (0, levels - 1):  # shallowest (hb=1 group) + deepest (hb>=2)
        for got, want, tag in zip(det_p[j], det_x[j], ("lh", "hl", "hh")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=4e-5,
                err_msg=f"level {j+1} {tag} {boundary}",
            )
    np.testing.assert_allclose(
        np.asarray(ll_p), np.asarray(ll_x), atol=4e-5, err_msg="ll"
    )


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_2d_pallas_deep_span_roundtrip(boundary):
    from vectorwave_tpu.kernels.modwt2_pallas import (
        imodwt2_multilevel_pallas,
    )

    rng = np.random.default_rng(4)
    w = _resolve_discrete("db4")
    x = jnp.asarray(rng.standard_normal((1, 512, 512)), jnp.float32)
    det, ll = modwt2_multilevel_pallas(
        x, w, 5, boundary, "float32", interpret=True
    )
    xr = imodwt2_multilevel_pallas(det, ll, w, boundary, "float32",
                                   interpret=True)
    ref_det, ref_ll = k2.modwt2_multilevel_fast(x, w, 5, boundary, "float32")
    ref = k2.imodwt2_multilevel_fast(ref_det, ref_ll, w, boundary, "float32")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=5e-5)
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=5e-5)


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_2d_pallas_roundtrip(boundary):
    from vectorwave_tpu.kernels.modwt2_pallas import (
        imodwt2_multilevel_pallas,
    )

    rng = np.random.default_rng(1)
    w = _resolve_discrete("db4")
    x = jnp.asarray(rng.standard_normal((1, 256, 256)), jnp.float32)
    det, ll = modwt2_multilevel_pallas(
        x, w, 3, boundary, "float32", interpret=True
    )
    xr = imodwt2_multilevel_pallas(det, ll, w, boundary, "float32",
                                   interpret=True)
    ref_det, ref_ll = k2.modwt2_multilevel_fast(x, w, 3, boundary, "float32")
    ref = k2.imodwt2_multilevel_fast(ref_det, ref_ll, w, boundary, "float32")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=3e-5)
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


@pytest.mark.parametrize("name,levels", [("db4", 3), ("sym8", 2)])
def test_2d_symmetric_analysis_fast_path(name, levels):
    """Symmetric analysis through per-level zero-boundary kernel calls
    (reflect-pad + crop) must match the jnp symmetric cascade exactly."""
    import vectorwave_tpu as vw
    from vectorwave_tpu.transforms.twodim import _modwt2_symmetric_fast

    rng = np.random.default_rng(5)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    try:
        got = _modwt2_symmetric_fast(x, w, levels)
        assert got is not None, "unexpectedly ineligible"
        vw.set_backend("jnp")
        want = vw.modwt2_multilevel(x, name, levels=levels,
                                    boundary="symmetric")
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")
    for j in range(levels):
        for g, r, tag in zip(got.details[j], want.details[j],
                             ("lh", "hl", "hh")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=3e-5,
                err_msg=f"level {j+1} {tag}",
            )
    np.testing.assert_allclose(
        np.asarray(got.approx), np.asarray(want.approx), atol=3e-5
    )


@pytest.mark.parametrize("name,levels", [("db4", 3), ("sym8", 2)])
def test_2d_symmetric_inverse_fast_path(name, levels):
    """Symmetric inverse via per-level 4-plane synthesis kernel calls with
    alignment offsets folded into dense taps must match the jnp inverse."""
    import vectorwave_tpu as vw
    from vectorwave_tpu.transforms.twodim import _imodwt2_symmetric_fast

    rng = np.random.default_rng(6)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    vw.set_backend("jnp")
    try:
        res = vw.modwt2_multilevel(x, name, levels=levels,
                                   boundary="symmetric")
        want = vw.imodwt2_multilevel(res, name, boundary="symmetric")
        vw.set_backend("pallas")
        vw.set_fused_precision("float32")
        got = _imodwt2_symmetric_fast(res, w)
        assert got is not None, "unexpectedly ineligible"
        # routed end to end as well
        routed = vw.imodwt2_multilevel(res, name, boundary="symmetric")
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(routed), np.asarray(want), atol=3e-5
    )


def test_public_routing_forced_pallas_matches_jnp():
    import vectorwave_tpu as vw

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    try:
        res = vw.modwt2_multilevel(x, "db4", levels=2)
        xr = vw.imodwt2_multilevel(res, "db4")
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")
    ref = vw.modwt2_multilevel(x, "db4", levels=2, )
    np.testing.assert_allclose(
        np.asarray(res.approx), np.asarray(ref.approx), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


@pytest.mark.slow
@pytest.mark.parametrize("boundary", ["periodic", "zero"])
@pytest.mark.parametrize(
    "name,levels,hw",
    [
        ("db6", 5, 512),    # span 5*31=155 -> hb=2
        ("sym6", 5, 512),   # span 155 -> hb=2
        ("coif2", 4, 512),  # span 11*15=165 -> hb=2
        ("db8", 5, 512),    # span 15*31=465 -> hb=4
    ],
)
def test_2d_deep_span_family_sweep(name, levels, hw, boundary):
    """Property sweep: generalized-halo windows across wavelet families."""
    rng = np.random.default_rng(11)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((1, hw, hw)), jnp.float32)
    det_p, ll_p = modwt2_multilevel_pallas(
        x, w, levels, boundary, "float32", interpret=True
    )
    det_x, ll_x = k2.modwt2_multilevel_fast(x, w, levels, boundary,
                                            "float32")
    j = levels - 1  # the deep (hb >= 2) group
    for got, want, tag in zip(det_p[j], det_x[j], ("lh", "hl", "hh")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4,
            err_msg=f"{name} level {j+1} {tag} {boundary}",
        )
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_x),
                               atol=1e-4)


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_2d_cascade_tier_sym8_j6_newly_eligible(boundary):
    """sym8 J=6 (composite span 945 -> hb=8, previously ineligible) rides
    the cascade tier: deep levels run single-stage on the previous LL
    (span (L0-1)*2^(j-1), hb<=4) — VERDICT r04 #7."""
    from vectorwave_tpu.kernels.modwt2_pallas import (
        _cascade_start,
        modwt2_pallas_eligible,
    )

    import vectorwave_tpu as vw

    w = _resolve_discrete("sym8")
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 1024, 512)), jnp.float32)
    vw.set_backend("pallas")
    try:
        assert modwt2_pallas_eligible(x, w, 6, boundary)
    finally:
        vw.set_backend("auto")
    assert _cascade_start(w.filter_length, 6) == 5
    det_p, ll_p = modwt2_multilevel_pallas(
        x, w, 6, boundary, "float32", interpret=True
    )
    det_x, ll_x = k2.modwt2_multilevel_fast(x, w, 6, boundary, "float32")
    for j in (4, 5):  # the cascaded levels
        for got, want, tag in zip(det_p[j], det_x[j], ("lh", "hl", "hh")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4,
                err_msg=f"sym8 level {j+1} {tag} {boundary}",
            )
    np.testing.assert_allclose(np.asarray(ll_p), np.asarray(ll_x), atol=2e-4)


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_2d_cascade_synthesis_roundtrip_db8_j5(boundary):
    """The cascade SYNTHESIS tier (imodwt2_multilevel_pallas per-level
    inverse for composite hb>=3) — round trip + parity vs the jnp path
    (code-review r5 finding: the branch had analysis-only coverage)."""
    from vectorwave_tpu.kernels.modwt2_pallas import (
        _cascade_start,
        imodwt2_multilevel_pallas,
    )

    w = _resolve_discrete("db8")
    levels = 5  # composite span 465 -> hb=4 -> cascade from level 5
    assert _cascade_start(w.filter_length, levels) == 5
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 512, 512)), jnp.float32)
    det_p, ll_p = modwt2_multilevel_pallas(
        x, w, levels, boundary, "float32", interpret=True
    )
    out = imodwt2_multilevel_pallas(
        det_p, ll_p, w, boundary, "float32", interpret=True
    )
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=5e-6)
    # parity vs jnp inverse on the same coefficients
    from vectorwave_tpu.transforms.twodim import (
        MultiLevelMODWT2Result,
        imodwt2_multilevel,
    )

    ref = imodwt2_multilevel(
        MultiLevelMODWT2Result(det_p, ll_p), w, boundary=boundary
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
