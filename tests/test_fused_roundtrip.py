"""One-pass fused round trip (kernels/modwt_pallas.modwt_roundtrip_fused:
the mode="none" tier of the fused-denoise kernel) and the decimated
MAD-sigma estimator feeding the fused denoise router.

Parity oracle for the round trip: the input itself (MODWT is PR) and the
two-call composite path.  Reference contract: the fused single-pass kernel
(vectorwave-extensions/.../internal/VectorOps.java:887).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.denoise.denoiser import _fused_sigma
from vectorwave_tpu.ops.thresholds import mad_sigma
from vectorwave_tpu.transforms.modwt import _resolve_discrete, modwt


@pytest.mark.parametrize(
    "b,n,name,levels,boundary",
    [
        (2, 2048, "db4", 4, "periodic"),
        (1, 4096, "sym8", 3, "zero"),
        (3, 4096, "haar", 5, "periodic"),
        (2, 2048, "bior2.2", 3, "periodic"),
    ],
)
def test_roundtrip_fused_reconstructs(b, n, name, levels, boundary):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    got = vw.modwt_roundtrip_fused(
        x, name, levels=levels, boundary=boundary, interpret=True,
        precision="float32",
    )
    # zero boundary is not PR at the edges (coefficient mass leaks into the
    # zero extension) — the oracle is the materializing round trip, which
    # for periodic equals x
    res = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary,
                              backend="jnp")
    ref = vw.imodwt_multilevel(res, name, boundary=boundary, backend="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-6)
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=5e-6)


def test_roundtrip_fused_short_signal_falls_back():
    """Below the tile floor the public API must still reconstruct (via the
    two-call composite path)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 512)), jnp.float32)
    got = vw.modwt_roundtrip_fused(
        x, "db4", levels=3, interpret=True, precision="float32"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=5e-6)


def test_roundtrip_fused_1d_and_grad():
    """1-D squeeze works and jax.grad flows (custom VJP: one analysis + one
    synthesis kernel pass, no shrink mask)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)
    w_ = jnp.arange(2048, dtype=jnp.float32)

    def loss(y):
        out = vw.modwt_roundtrip_fused(
            y, "db4", levels=3, interpret=True, precision="float32"
        )
        return jnp.sum(out**2 * w_)

    g = jax.grad(loss)(x)
    # round trip ~ identity, so grad ~ 2 w x
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(2 * w_ * x), rtol=0, atol=2e-2
    )


def test_decimated_sigma_tracks_exact():
    """On white noise the decimated MAD sigma must sit within ~10% of the
    exact full-sample estimate (sampling error of a >=1024-sample median)."""
    rng = np.random.default_rng(3)
    w = _resolve_discrete("db4")
    x = jnp.asarray(rng.standard_normal((2, 65536)), jnp.float32)
    dec = _fused_sigma(x, w, "periodic")
    exact = mad_sigma(modwt(x, w, boundary="periodic").detail)
    np.testing.assert_allclose(
        np.asarray(dec), np.asarray(exact), rtol=0.1
    )
    assert dec.shape == exact.shape


def test_decimated_sigma_zero_boundary_and_config():
    rng = np.random.default_rng(4)
    w = _resolve_discrete("sym8")
    x = jnp.asarray(rng.standard_normal((1, 65536)), jnp.float32)
    dec = _fused_sigma(x, w, "zero")
    vw.config.set_sigma_estimator("exact")
    try:
        forced = _fused_sigma(x, w, "zero")
    finally:
        vw.config.set_sigma_estimator("auto")
    exact = mad_sigma(modwt(x, w, boundary="zero").detail)
    np.testing.assert_array_equal(np.asarray(forced), np.asarray(exact))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(exact), rtol=0.1)


def test_small_signals_keep_exact_sigma():
    """Below the decimation floor the estimator is bit-identical to the
    exact path (the round-3 contract is unchanged there)."""
    rng = np.random.default_rng(5)
    w = _resolve_discrete("db4")
    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    got = _fused_sigma(x, w, "periodic")
    exact = mad_sigma(modwt(x, w, boundary="periodic").detail)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_denoise_decimated_output_close_to_exact_sigma_output():
    """End-to-end: the default (auto, decimated) denoise at 64K must agree
    with the forced-exact-sigma denoise to within the threshold
    perturbation's effect (small relative MSE)."""
    rng = np.random.default_rng(6)
    t = np.linspace(0, 1, 65536, dtype=np.float32)
    clean = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sign(np.sin(2 * np.pi * 11 * t))
    x = jnp.asarray(clean + 0.3 * rng.standard_normal(65536), jnp.float32)[None]
    auto = vw.denoise_multilevel(x, "db4", levels=5, method="universal",
                                 mode="soft")
    vw.config.set_sigma_estimator("exact")
    try:
        exact = vw.denoise_multilevel(x, "db4", levels=5, method="universal",
                                      mode="soft")
    finally:
        vw.config.set_sigma_estimator("auto")
    rel = float(
        jnp.sqrt(jnp.mean((auto - exact) ** 2) / jnp.mean(exact**2))
    )
    assert rel < 0.02, rel
