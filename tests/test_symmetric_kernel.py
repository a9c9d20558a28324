"""Symmetric kernel tier: composite body + edge splice (modwt_symmetric.py).

Parity vs the jnp symmetric cascade/inverse (the reference's semantics,
MultiLevelMODWTTransform.java:602-642) and gradient correctness through the
custom VJP.  Interpreter mode here; compiled path measured in bench_full.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.kernels.modwt_pallas import fused_analysis, fused_synthesis
from vectorwave_tpu.kernels.modwt_symmetric import (
    fused_symmetric_analysis,
    fused_symmetric_synthesis,
    symmetric_synthesis_plane_filters,
)
from vectorwave_tpu.transforms.modwt import _resolve_discrete
from vectorwave_tpu.transforms.multilevel import MultiLevelMODWTResult


@pytest.mark.parametrize("name,levels", [("db4", 3), ("sym8", 2), ("haar", 4),
                                         ("bior2.2", 3)])
def test_symmetric_kernel_parity_both_directions(name, levels):
    rng = np.random.default_rng(0)
    w = _resolve_discrete(name)
    x = jnp.asarray(rng.standard_normal((2, 2048)), dtype=jnp.float32)
    d, a = fused_symmetric_analysis(
        x, w, levels=levels, interpret=True, precision="float32"
    )
    ref = vw.modwt_multilevel(
        x, name, levels=levels, boundary="symmetric", backend="jnp"
    )
    for got, want in zip(d + (a,), ref.details + (ref.approx,)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)
    xr = fused_symmetric_synthesis(
        ref.details, ref.approx, w, interpret=True, precision="float32"
    )
    ref_inv = vw.imodwt_multilevel(ref, name, boundary="symmetric", backend="jnp")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref_inv), atol=5e-6)


def test_symmetric_fused_api_routes_and_short_fallback():
    """fused_analysis/fused_synthesis accept symmetric; short signals fall
    back to the exact jnp path inside the symmetric wrappers."""
    rng = np.random.default_rng(1)
    # 200 < 2*round_up(span,128) and 200 % 128 != 0 -> both wrappers take
    # the exact jnp fallback branch
    x = jnp.asarray(rng.standard_normal(200), dtype=jnp.float32)
    d, a = fused_analysis(x, "db4", levels=3, boundary="symmetric", interpret=True)
    ref = vw.modwt_multilevel(x, "db4", levels=3, boundary="symmetric", backend="jnp")
    for got, want in zip(d + (a,), ref.details + (ref.approx,)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    xr = fused_synthesis(d, a, "db4", boundary="symmetric", interpret=True)
    ref_inv = vw.imodwt_multilevel(ref, "db4", boundary="symmetric", backend="jnp")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref_inv), atol=1e-5)


def test_symmetric_gradients_match_jnp():
    rng = np.random.default_rng(2)
    w = _resolve_discrete("db4")
    x = jnp.asarray(rng.standard_normal((1, 2048)), dtype=jnp.float32)

    def loss_k(y):
        d, a = fused_symmetric_analysis(
            y, w, levels=3, interpret=True, precision="float32"
        )
        return sum(jnp.sum(p**2) for p in d) + 0.5 * jnp.sum(a**2)

    def loss_j(y):
        r = vw.modwt_multilevel(y, "db4", levels=3, boundary="symmetric",
                                backend="jnp")
        return sum(jnp.sum(p**2) for p in r.details) + 0.5 * jnp.sum(r.approx**2)

    gk = jax.grad(loss_k)(x)
    gj = jax.grad(loss_j)(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gj), atol=1e-5)

    res = vw.modwt_multilevel(x, "db4", levels=3, boundary="symmetric",
                              backend="jnp")
    weights = jnp.arange(x.shape[-1], dtype=jnp.float32)

    def sloss_k(ds, a):
        xr = fused_symmetric_synthesis(ds, a, w, interpret=True,
                                       precision="float32")
        return jnp.sum(xr**2 * weights)

    def sloss_j(ds, a):
        xr = vw.imodwt_multilevel(MultiLevelMODWTResult(ds, a), "db4",
                                  boundary="symmetric", backend="jnp")
        return jnp.sum(xr**2 * weights)

    gk = jax.grad(sloss_k, argnums=(0, 1))(res.details, res.approx)
    gj = jax.grad(sloss_j, argnums=(0, 1))(res.details, res.approx)
    scale = max(float(jnp.max(jnp.abs(b))) for b in gj[0] + (gj[1],))
    for a, b in zip(gk[0] + (gk[1],), gj[0] + (gj[1],)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6 * scale
        )


def test_symmetric_path_traces_under_jit():
    """Regression: the edge-splice cascade once jnp-ified the filter taps,
    staging them as tracers under an enclosing jit (omnistaging) and
    crashing atrous_analysis_pair's host-side np.asarray (bench_full cfg3
    failure).  The whole symmetric denoise pipeline must be jittable."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(4096), dtype=jnp.float32)

    def cfg3(z):
        res = vw.swt(z, "sym8", levels=3, boundary="symmetric")
        res = vw.apply_universal_threshold(res, mode="soft")
        return vw.iswt(res, "sym8", boundary="symmetric")

    vw.set_backend("pallas")
    try:
        out = jax.jit(cfg3)(x)
    finally:
        vw.set_backend("auto")
    ref = cfg3(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_composed_plane_filters_reproduce_jnp_inverse_interior():
    """The alignment-composed two-sided plane filters ARE the symmetric
    inverse away from the edges: apply them densely in f64 and compare."""
    rng = np.random.default_rng(3)
    w = _resolve_discrete("db4")
    levels = 3
    n = 1024
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float64)
    res = vw.modwt_multilevel(x, "db4", levels=levels, boundary="symmetric",
                              backend="jnp")
    ref = np.asarray(
        vw.imodwt_multilevel(res, "db4", boundary="symmetric", backend="jnp")
    )
    pf = symmetric_synthesis_plane_filters(w, levels)
    planes = [np.asarray(p, np.float64) for p in res.details + (res.approx,)]
    spans = [(max(0, -s), s + len(arr) - 1) for arr, s in pf]
    span_l = max(l for l, _ in spans)
    span_r = max(r for _, r in spans)
    out = np.zeros(n)
    for (arr, start), plane in zip(pf, planes):
        for k, v in enumerate(arr):
            if v == 0.0:
                continue
            delta = start + k
            lo = max(0, -delta)
            hi = min(n, n - delta)
            out[lo:hi] += v * plane[lo + delta : hi + delta]
    interior = slice(span_l, n - span_r)
    np.testing.assert_allclose(out[interior], ref[interior], atol=1e-10)
