"""Kernel-tier MODWPT and DTCWT: the composite MXU bank kernel with
``planes_override`` serving (a) a packet level as one batched à trous pair
and (b) a whole decimated dual tree as one full-rate composed bank call
(+ phase-aware subsample / zero-stuffing for the adjoint).

Parity oracle: the jnp cascades (backend='jnp') — bit-near at
precision='float32' in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.dtcwt import dtcwt, idtcwt
from vectorwave_tpu.transforms.packets import imodwpt, modwpt


@pytest.fixture
def pallas_backend():
    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    try:
        yield
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")


@pytest.mark.parametrize("boundary", ["periodic", "zero"])
def test_modwpt_kernel_matches_jnp(pallas_backend, boundary):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    got = modwpt(x, "db4", 3, boundary=boundary)
    vw.set_backend("jnp")
    want = modwpt(x, "db4", 3, boundary=boundary)
    vw.set_backend("pallas")
    for lvl in range(4):
        np.testing.assert_allclose(
            np.asarray(got.levels[lvl]), np.asarray(want.levels[lvl]),
            atol=2e-5, err_msg=f"level {lvl}",
        )


def test_imodwpt_kernel_roundtrip(pallas_backend):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)
    tree = modwpt(x, "sym8", 3)
    xr = imodwpt(tree, "sym8")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=2e-5)


def test_modwpt_kernel_grad_flows(pallas_backend):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(2048), jnp.float32)

    def loss(y):
        t = modwpt(y, "db4", 2)
        return jnp.sum(t.leaves ** 2)

    g = jax.grad(loss)(x)
    vw.set_backend("jnp")
    gj = jax.grad(loss)(x)
    vw.set_backend("pallas")
    scale = float(jnp.max(jnp.abs(gj)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gj),
                               atol=5e-6 * scale)


def test_dtcwt_kernel_matches_jnp(pallas_backend):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    got = dtcwt(x, "sym8", levels=4)
    vw.set_backend("jnp")
    want = dtcwt(x, "sym8", levels=4)
    vw.set_backend("pallas")
    for j in range(4):
        np.testing.assert_allclose(
            np.asarray(got.highpasses[j]), np.asarray(want.highpasses[j]),
            atol=3e-5, err_msg=f"level {j}",
        )
    np.testing.assert_allclose(np.asarray(got.lowpass_a),
                               np.asarray(want.lowpass_a), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got.lowpass_b),
                               np.asarray(want.lowpass_b), atol=3e-5)


def test_idtcwt_kernel_roundtrip(pallas_backend):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 2048)), jnp.float32)
    res = dtcwt(x, "sym8", levels=3)
    xr = idtcwt(res, "sym8")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


def test_dtcwt_short_signal_falls_back(pallas_backend):
    """Below the kernel floor the jnp cascade must serve transparently."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(256), jnp.float32)
    res = dtcwt(x, "sym8", levels=2)
    xr = idtcwt(res, "sym8")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)
