"""2-D wavelet packets: PR, separability, quadtree best basis, geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.transforms.packets import frequency_order, wpt
from vectorwave_tpu.transforms.packets2d import (
    _validate_basis2,
    basis_coefficients2,
    best_basis2,
    iwpt2,
    packet_frequency_bands2,
    reconstruct_basis2,
    wpt2,
)
from vectorwave_tpu.transforms.twodim import dwt2


@pytest.mark.slow
@pytest.mark.parametrize("wavelet", ["db4", "bior2.2"])
def test_quadtree_roundtrip(wavelet, rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32)))
    tree = wpt2(x, wavelet, 3, boundary="periodic")
    assert tree.depth == 3
    assert tree.leaves.shape == (2, 64, 4, 4)
    rec = iwpt2(tree, wavelet, boundary="periodic")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-10)


def test_quadtree_zero_boundary_interior(rng):
    """Zero padding affects only the trailing edge (reference indexing);
    haar's depth-2 spread is 3 samples, so all but the last rows/cols agree."""
    x = jnp.asarray(rng.standard_normal((32, 32)))
    tree = wpt2(x, "haar", 2, boundary="zero")
    rec = iwpt2(tree, "haar", boundary="zero")
    np.testing.assert_allclose(
        np.asarray(rec)[:28, :28], np.asarray(x)[:28, :28], atol=1e-10
    )


def test_level1_matches_dwt2(rng):
    x = jnp.asarray(rng.standard_normal((16, 16)))
    tree = wpt2(x, "db2", 1)
    res = dwt2(x, "db2")
    for k, band in enumerate(res):
        np.testing.assert_allclose(
            np.asarray(tree.node(1, k)), np.asarray(band), atol=1e-12
        )


def test_energy_conserved_orthogonal(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)))
    tree = wpt2(x, "db4", 2)
    for level in range(tree.depth + 1):
        np.testing.assert_allclose(
            float(tree.energy_map(level).sum()),
            float((x**2).sum()),
            rtol=1e-10,
        )


def test_separable_tensor_structure(rng):
    """wpt2 of a rank-1 image = outer product of the two 1-D packet nodes."""
    u = jnp.asarray(rng.standard_normal(32))
    v = jnp.asarray(rng.standard_normal(32))
    img = u[:, None] * v[None, :]
    tree2 = wpt2(img, "db3", 2)
    tree_u = wpt(u, "db3", 2)
    tree_v = wpt(v, "db3", 2)
    # digit mapping: idx digits (base 4, MSB first) -> (h_bit, w_bit)
    for idx in [0, 1, 5, 10, 15]:
        digits = [(idx >> 2) & 3, idx & 3]
        h_nat = (digits[0] >> 1) * 2 + (digits[1] >> 1)
        w_nat = (digits[0] & 1) * 2 + (digits[1] & 1)
        expect = (
            np.asarray(tree_u.node(2, h_nat))[:, None]
            * np.asarray(tree_v.node(2, w_nat))[None, :]
        )
        np.testing.assert_allclose(
            np.asarray(tree2.node(2, idx)), expect, atol=1e-10
        )


@pytest.mark.slow
def test_best_basis_admissible_and_minimal(rng):
    t = np.linspace(0.0, 1.0, 64)
    texture = np.sin(2 * np.pi * 24 * t)[:, None] * np.sin(2 * np.pi * 3 * t)[None, :]
    x = jnp.asarray(texture + 0.01 * rng.standard_normal((64, 64)))
    tree = wpt2(x, "db4", 2)
    basis = best_basis2(tree, "shannon")
    _validate_basis2(basis, tree.depth)  # raises if not a tiling
    rec = reconstruct_basis2(tree, basis, "db4")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-8)
    planes = basis_coefficients2(tree, basis)
    assert len(planes) == len(basis)


def test_leaf_and_root_bases_reconstruct(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)))
    tree = wpt2(x, "sym4", 2)
    leaves = tuple((2, i) for i in range(16))
    for basis in (((0, 0),), leaves):
        rec = reconstruct_basis2(tree, basis, "sym4")
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-9)


def test_transform_nodes_hook(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)))
    tree = wpt2(x, "db2", 2)
    basis = tuple((2, i) for i in range(16))
    rec = reconstruct_basis2(
        tree, basis, "db2", transform_nodes=lambda lvl, idx, c: jnp.zeros_like(c)
    )
    assert float(jnp.abs(rec).max()) == 0.0


def test_invalid_bases_rejected(rng):
    x = jnp.asarray(rng.standard_normal((16, 16)))
    tree = wpt2(x, "haar", 2)
    with pytest.raises(vw.InvalidArgumentError):  # overlap: root + a child
        reconstruct_basis2(tree, ((0, 0), (1, 0)), "haar")
    with pytest.raises(vw.InvalidArgumentError):  # gap: three of four children
        reconstruct_basis2(tree, ((1, 0), (1, 1), (1, 2)), "haar")
    with pytest.raises(vw.InvalidArgumentError):  # outside tree
        reconstruct_basis2(tree, ((3, 0),), "haar")
    with pytest.raises(vw.InvalidArgumentError):  # odd dims
        wpt2(jnp.zeros((15, 16)), "haar", 1)
    with pytest.raises(vw.InvalidArgumentError):  # depth too deep for dims
        wpt2(jnp.zeros((16, 16)), "haar", 5)


def test_frequency_bands_geometry():
    bands = packet_frequency_bands2(1, sampling_rate=2.0)
    # ll: low in both axes; hh: high in both; lh: low-H, high-W
    np.testing.assert_allclose(bands[0], [[0.0, 0.5], [0.0, 0.5]])
    np.testing.assert_allclose(bands[3], [[0.5, 1.0], [0.5, 1.0]])
    np.testing.assert_allclose(bands[1], [[0.0, 0.5], [0.5, 1.0]])
    np.testing.assert_allclose(bands[2], [[0.5, 1.0], [0.0, 0.5]])
    # level 2: each axis band ordering follows the 1-D sequency rule
    bands2 = packet_frequency_bands2(2, sampling_rate=2.0)
    inv = np.argsort(frequency_order(2))
    for idx in range(16):
        digits = [(idx >> 2) & 3, idx & 3]
        h_nat = (digits[0] >> 1) * 2 + (digits[1] >> 1)
        np.testing.assert_allclose(
            bands2[idx, 0], [inv[h_nat] * 0.25, (inv[h_nat] + 1) * 0.25]
        )
    # edges tile [0, 1) exactly on each axis over any admissible basis
    assert bands2.min() == 0.0 and bands2.max() == 1.0


def test_jit_and_batch(rng):
    x = jnp.asarray(rng.standard_normal((3, 2, 16, 16)))

    @jax.jit
    def roundtrip(img):
        tree = wpt2(img, "db2", 2)
        return iwpt2(tree, "db2")

    np.testing.assert_allclose(np.asarray(roundtrip(x)), np.asarray(x), atol=1e-10)


@pytest.mark.slow
def test_denoise_packet2_beats_noise(rng):
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    clean = np.sin(2 * np.pi * (21 * xx + 5 * yy) / w)  # high-freq texture
    noisy = clean + 0.4 * rng.standard_normal((h, w))
    den = np.asarray(vw.denoise_packet2(jnp.asarray(noisy), "sym8", 3))
    mse_in = float(np.mean((noisy - clean) ** 2))
    mse_out = float(np.mean((den - clean) ** 2))
    assert mse_out < 0.6 * mse_in


def test_denoise_packet2_beats_pyramid_on_texture(rng):
    """High-frequency weave: the quadtree isolates the texture band, the
    LL-spine pyramid (denoise2) dumps it into one noisy detail level."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    clean = np.sin(2 * np.pi * (27 * xx + 23 * yy) / w)
    noisy = jnp.asarray(clean + 0.5 * rng.standard_normal((h, w)))
    mse = lambda est: float(np.mean((np.asarray(est) - clean) ** 2))
    packet = mse(vw.denoise_packet2(noisy, "sym8", 3))
    pyramid = mse(vw.denoise2(noisy, "sym8", levels=3))
    assert packet < pyramid


def test_denoise_packet2_noiseless_near_identity(rng):
    yy, xx = np.mgrid[0:64, 0:64]
    clean = jnp.asarray(np.sin(2 * np.pi * yy / 16) * np.cos(2 * np.pi * xx / 8))
    den = vw.denoise_packet2(clean, "db4", 2)
    rel = float(jnp.linalg.norm(den - clean) / jnp.linalg.norm(clean))
    assert rel < 0.15


def test_best_basis_denoise2_matches_explicit_workflow(rng):
    """The single-program masked reconstruction must equal the explicit
    best_basis2 + reconstruct_basis2 composition node for node."""
    import jax.numpy as jnp

    from vectorwave_tpu.ops.thresholds import apply_threshold
    from vectorwave_tpu.transforms.packets2d import (
        best_basis2,
        best_basis_denoise2,
        reconstruct_basis2,
        wpt2,
    )

    x = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    got = best_basis_denoise2(
        x, "db4", 3, threshold=0.6, cost="shannon", cost_threshold=0.5,
        mode="soft",
    )
    tree = wpt2(x, "db4", 3)
    basis = best_basis2(tree, cost="shannon", threshold=0.5)
    want = reconstruct_basis2(
        tree, basis, "db4",
        transform_nodes=lambda _l, _i, p: apply_threshold(p, 0.6, "soft"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
