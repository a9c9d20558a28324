"""Sparse recovery (optimize/sparse.py): FISTA, BPDN, inpainting, CS.

Beyond-reference module; correctness gates are closed-form prox identities
and recovery quality on seeded fixtures (the suite's TestSignals analogue,
SURVEY.md §4 "Fixtures").
"""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.errors import InvalidArgumentError


def _sines(n=512, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n, endpoint=False)
    clean = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 13 * t + 0.7)
    return clean, clean + noise * rng.standard_normal(n)


def test_fista_matches_closed_form_prox():
    """min 0.5||c-b||^2 + lam||c||_1 has the exact solution soft(b, lam)."""
    b = jnp.asarray([3.0, -0.5, 0.2, -2.0, 0.05])
    lam = 0.4
    grad = jax.grad(lambda c: 0.5 * jnp.sum((c - b) ** 2))
    prox = lambda c, i: jnp.sign(c) * jnp.maximum(jnp.abs(c) - lam, 0.0)
    c = vw.fista(grad, prox, jnp.zeros_like(b), steps=200)
    expect = jnp.sign(b) * jnp.maximum(jnp.abs(b) - lam, 0.0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(expect), atol=1e-5)


def test_fista_rejects_bad_steps():
    with pytest.raises(InvalidArgumentError):
        vw.fista(lambda c: c, lambda c, i: c, jnp.zeros(4), steps=0)


@pytest.mark.slow
def test_bpdn_denoises_and_beats_one_shot():
    clean, noisy = _sines(noise=0.3)
    y = jnp.asarray(noisy, jnp.float32)
    r = vw.bpdn(y, "db8", steps=100)
    mse_in = np.mean((noisy - clean) ** 2)
    mse_out = np.mean((np.asarray(r.signal) - clean) ** 2)
    gain = 10 * np.log10(mse_in / mse_out)
    assert gain > 2.5  # measured 3.84 dB; one-shot denoise gives 3.47 dB
    one_shot = np.asarray(vw.denoise(y, "db8"))
    assert mse_out < np.mean((one_shot - clean) ** 2)


@pytest.mark.slow
def test_bpdn_batched_equals_individual():
    """Leading batch axis separable: default lam is per-signal (MAD keepdims)."""
    _, n0 = _sines(noise=0.3, seed=1)
    _, n1 = _sines(noise=0.5, seed=2)
    stacked = jnp.asarray(np.stack([n0, n1]), jnp.float32)
    rb = vw.bpdn(stacked, "db4", levels=4, steps=40)
    for k, sig in enumerate([n0, n1]):
        ri = vw.bpdn(jnp.asarray(sig, jnp.float32), "db4", levels=4, steps=40)
        np.testing.assert_allclose(
            np.asarray(rb.signal[k]), np.asarray(ri.signal), atol=2e-5
        )


def test_inpaint_fills_missing_and_keeps_observed():
    clean, _ = _sines()
    rng = np.random.default_rng(3)
    mask = (rng.random(512) > 0.4).astype(np.float32)
    y = jnp.asarray(clean * mask, jnp.float32)
    out = np.asarray(vw.inpaint(y, jnp.asarray(mask), "db8", steps=200))
    miss = mask == 0
    rel = np.sqrt(np.mean((out[miss] - clean[miss]) ** 2)) / np.std(clean)
    assert rel < 0.1  # measured 0.051
    np.testing.assert_array_equal(out[~miss], np.asarray(y)[~miss])


@pytest.mark.slow
def test_inpaint_no_enforce_stays_close_on_observed():
    clean, _ = _sines(n=256)
    rng = np.random.default_rng(4)
    mask = (rng.random(256) > 0.3).astype(np.float32)
    y = jnp.asarray(clean * mask, jnp.float32)
    out = np.asarray(
        vw.inpaint(y, jnp.asarray(mask), "db4", steps=150, enforce_data=False)
    )
    obs = mask == 1
    rel = np.sqrt(np.mean((out[obs] - clean[obs]) ** 2)) / np.std(clean)
    assert rel < 0.1


@pytest.mark.slow
def test_inpaint2_fills_missing_pixels():
    rng = np.random.default_rng(1)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij"
    )
    img = (
        np.sin(2 * np.pi * 2 * xx) * np.cos(2 * np.pi * yy)
        + 0.5 * np.sin(2 * np.pi * (xx + yy))
    )
    mask = (rng.random((32, 32)) > 0.3).astype(np.float32)
    out = np.asarray(
        vw.inpaint2(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(mask),
            "db4",
            levels=2,
            steps=80,
        )
    )
    miss = mask == 0
    rel = np.sqrt(np.mean((out[miss] - img[miss]) ** 2)) / np.std(img)
    assert rel < 0.1  # measured 0.043
    np.testing.assert_array_equal(out[~miss], img[~miss].astype(np.float32))


def test_sparse_recover_compressed_sensing():
    """Recover a wavelet-sparse signal from 2x-undersampled projections."""
    rng = np.random.default_rng(1)
    n, m, w = 256, 128, "db4"
    zero_c = vw.modwt_multilevel(jnp.zeros(n), w, levels=4)
    leaves, treedef = jtu.tree_flatten(zero_c)
    sparse_leaves = []
    for k in range(len(leaves)):
        v = np.zeros(n, np.float32)
        if k < 2:  # a handful of active coefficients in two subbands
            v[rng.choice(n, 3, replace=False)] = 2.0 * rng.standard_normal(3)
        sparse_leaves.append(jnp.asarray(v))
    x_true = vw.imodwt_multilevel(jtu.tree_unflatten(treedef, sparse_leaves), w)
    a_mat = jnp.asarray(
        rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(m)
    )
    forward = lambda x: a_mat @ x
    r = vw.sparse_recover(
        forward(x_true),
        forward,
        w,
        signal_shape=(n,),
        lam=1e-4,
        lam_init=1.0,
        steps=400,
        levels=4,
    )
    rel = float(jnp.linalg.norm(r.signal - x_true) / jnp.linalg.norm(x_true))
    assert rel < 0.15  # measured 0.087


def test_sparse_recover_rejects_bad_ndim():
    with pytest.raises(InvalidArgumentError):
        vw.sparse_recover(
            jnp.zeros(8),
            lambda x: x,
            "db4",
            signal_shape=(8,),
            lam=0.1,
            steps=2,
            levels=1,
            ndim=3,
        )


def test_inpaint_ignores_nan_at_missing_positions():
    """NaN is a common missing-sample encoding; the docstring promises the
    values at masked positions are ignored, so a NaN-encoded input must give
    EXACTLY the solve of the zero-encoded input (and stay finite)."""
    clean, _ = _sines(n=256)
    rng = np.random.default_rng(7)
    mask = (rng.random(256) > 0.4).astype(np.float32)
    y_nan = jnp.asarray(np.where(mask > 0, clean, np.nan), jnp.float32)
    y_zero = jnp.asarray(clean * mask, jnp.float32)
    out_nan = np.asarray(vw.inpaint(y_nan, jnp.asarray(mask), "db8", steps=60))
    out_zero = np.asarray(vw.inpaint(y_zero, jnp.asarray(mask), "db8", steps=60))
    assert np.isfinite(out_nan).all()
    np.testing.assert_array_equal(out_nan, out_zero)
