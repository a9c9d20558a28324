"""One-pass fused denoise kernel (analysis -> threshold -> synthesis in
VMEM; kernels/modwt_mxu.run_denoise_composite).

Parity oracle: the 3-call path with IDENTICAL thresholds (the kernel must
reproduce reference semantics, WaveletDenoiser.java:155-171 — analysis,
per-level shrink with sigma/sqrt(2^j) scaling, reconstruction).  The fused
path's HBM traffic is 8 B/sample vs the 3-call path's 68; see
tools/probe_write_wall.py for why that is the round trip's wall.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.kernels.modwt_pallas import fused_denoise_multilevel
from vectorwave_tpu.ops.thresholds import (
    apply_threshold,
    mad_sigma,
    universal_threshold,
)
from vectorwave_tpu.transforms.multilevel import MultiLevelMODWTResult


def _thresholds(res, n, levels):
    sigma = mad_sigma(res.details[0])
    return jnp.concatenate(
        [universal_threshold(n, sigma / jnp.sqrt(2.0**j))
         for j in range(1, levels + 1)],
        axis=-1,
    )


@pytest.mark.parametrize(
    "b,n,name,levels,boundary,mode",
    [
        (2, 2048, "db4", 4, "periodic", "soft"),
        (1, 4096, "sym8", 3, "zero", "soft"),
        (1, 4096, "sym8", 3, "zero", "hard"),
        (3, 4096, "haar", 5, "periodic", "soft"),
        (2, 2048, "bior2.2", 3, "periodic", "soft"),
    ],
)
def test_fused_denoise_matches_three_call_path(b, n, name, levels, boundary,
                                               mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    res = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary,
                              backend="jnp")
    ths = _thresholds(res, n, levels)
    got = fused_denoise_multilevel(
        x, name, levels=levels, thresholds=ths, boundary=boundary, mode=mode,
        interpret=True, precision="float32",
    )
    assert got is not None, "kernel unexpectedly fell back"
    nd = tuple(
        apply_threshold(d, ths[..., j:j + 1], mode)
        for j, d in enumerate(res.details)
    )
    ref = vw.imodwt_multilevel(
        MultiLevelMODWTResult(nd, res.approx), name, boundary=boundary,
        backend="jnp",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)


def test_fused_denoise_short_signal_falls_back():
    """Signals below the tile floor return None (the public API then takes
    the 3-call path)."""
    x = jnp.zeros((1, 512), jnp.float32)
    ths = jnp.ones((1, 5), jnp.float32)
    assert fused_denoise_multilevel(
        x, "haar", levels=5, thresholds=ths, interpret=True,
        precision="float32",
    ) is None


def test_fused_denoise_symmetric_falls_back():
    x = jnp.zeros((1, 4096), jnp.float32)
    ths = jnp.ones((1, 3), jnp.float32)
    assert fused_denoise_multilevel(
        x, "db4", levels=3, thresholds=ths, boundary="symmetric",
        interpret=True, precision="float32",
    ) is None


def test_public_api_routes_and_matches(monkeypatch):
    """denoise_multilevel with backend forced to pallas must agree with the
    jnp path end to end (thresholds computed internally both times)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    ref = vw.denoise_multilevel(x, "db4", levels=4, method="universal",
                                mode="soft")
    import importlib

    dn = importlib.import_module("vectorwave_tpu.denoise.denoiser")

    called = {}
    orig = dn._try_fused_denoise

    def spy(*a, **k):
        out = orig(*a, **k)
        called["fused"] = out is not None
        return out

    monkeypatch.setattr(dn, "_try_fused_denoise", spy)
    vw.set_backend("pallas")
    try:
        got = vw.denoise_multilevel(x, "db4", levels=4, method="universal",
                                    mode="soft")
    finally:
        vw.set_backend("auto")
    assert called.get("fused"), "pallas backend did not route to the fused kernel"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_denoise_gradients_match_jnp_path():
    """jax.grad through the fused kernel (custom VJP: recompute-based
    adjoints via the composite kernels) must match the jnp 3-call path,
    for both x and the thresholds — including the threshold's own
    dependence on x through the sort-free median's custom JVP."""
    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    n, levels = 2048, 3

    def loss_fused(y):
        res = vw.modwt_multilevel(y, "db4", levels=levels, backend="jnp")
        ths = _thresholds(res, n, levels)
        out = fused_denoise_multilevel(
            y, "db4", levels=levels, thresholds=ths, mode="soft",
            interpret=True, precision="float32",
        )
        w_ = jnp.arange(n, dtype=jnp.float32)
        return jnp.sum(out**2 * w_)

    def loss_jnp(y):
        res = vw.modwt_multilevel(y, "db4", levels=levels, backend="jnp")
        ths = _thresholds(res, n, levels)
        nd = tuple(
            apply_threshold(d, ths[..., j:j + 1], "soft")
            for j, d in enumerate(res.details)
        )
        out = vw.imodwt_multilevel(
            MultiLevelMODWTResult(nd, res.approx), "db4", backend="jnp"
        )
        w_ = jnp.arange(n, dtype=jnp.float32)
        return jnp.sum(out**2 * w_)

    gf = jax.grad(loss_fused)(x)
    gj = jax.grad(loss_jnp)(x)
    scale = float(jnp.max(jnp.abs(gj)))
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gj),
                               atol=3e-6 * scale)


def test_public_denoise_grad_end_to_end():
    """jax.grad(denoise_multilevel) works with the fused routing forced on
    (the round-2 API guarantee 'every transform is differentiable')."""
    import jax

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)

    def loss(y):
        return jnp.sum(
            vw.denoise_multilevel(y, "db4", levels=3, method="universal",
                                  mode="soft") ** 2
        )

    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    try:
        gk = jax.grad(loss)(x)
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")
    vw.set_backend("jnp")
    try:
        gj = jax.grad(loss)(x)
    finally:
        vw.set_backend("auto")
    scale = float(jnp.max(jnp.abs(gj)))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gj),
                               atol=5e-6 * scale)


def test_median_magnitude_matches_jnp_median_bitexact():
    """The sort-free bitwise order-statistic median must equal jnp.median
    of |v| exactly (it feeds mad_sigma, hence every denoise threshold)."""
    from vectorwave_tpu.ops.thresholds import median_magnitude

    rng = np.random.default_rng(3)
    for shape in [(3, 1024), (1, 65536), (5, 999), (2, 7), (4, 2), (1, 1)]:
        v = jnp.asarray(
            rng.standard_normal(shape) * rng.lognormal(0, 3, shape),
            jnp.float32,
        )
        got = np.asarray(median_magnitude(v))
        want = np.asarray(jnp.median(jnp.abs(v), axis=-1, keepdims=True))
        np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        np.asarray(median_magnitude(jnp.zeros((2, 8)))), np.zeros((2, 1))
    )


def test_sure_method_keeps_materializing_path():
    """SURE needs the detail planes; the router must not intercept it."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)
    vw.set_backend("pallas")
    try:
        out = vw.denoise_multilevel(x, "db4", levels=3, method="sure",
                                    mode="soft")
    finally:
        vw.set_backend("auto")
    assert out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_fused_denoise_property_sweep_across_families():
    """Fused-vs-3-call parity across a spread of the registry (orthogonal,
    least-asymmetric, coiflet, biorthogonal, long filters) x modes x
    boundaries, interpret mode."""
    rng = np.random.default_rng(9)
    cases = [
        ("db2", "periodic", "soft"), ("db8", "zero", "hard"),
        ("sym12", "periodic", "hard"), ("coif3", "zero", "soft"),
        ("bior4.4", "periodic", "soft"), ("rbio2.2", "periodic", "hard"),
        ("db16", "periodic", "soft"), ("coif5", "periodic", "soft"),
    ]
    for name, boundary, mode in cases:
        n, levels = 4096, 3
        x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
        res = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary,
                                  backend="jnp")
        ths = _thresholds(res, n, levels)
        got = fused_denoise_multilevel(
            x, name, levels=levels, thresholds=ths, boundary=boundary,
            mode=mode, interpret=True, precision="float32",
        )
        assert got is not None, name
        nd = tuple(
            apply_threshold(d, ths[..., j:j + 1], mode)
            for j, d in enumerate(res.details)
        )
        ref = vw.imodwt_multilevel(
            MultiLevelMODWTResult(nd, res.approx), name, boundary=boundary,
            backend="jnp",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5,
            err_msg=f"{name} {boundary} {mode}",
        )
