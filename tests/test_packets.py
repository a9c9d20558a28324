"""Wavelet packet transforms: PR, tight-frame energies, best basis, ordering.

Beyond-reference capability (no packet transforms exist in /root/reference);
tested to the same standard as the in-scope transforms: exact perfect
reconstruction, per-depth energy preservation, DP optimality of the
Coifman–Wickerhauser basis against brute-force enumeration, and empirical
verification of the sequency (frequency) ordering with pure tones.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.errors import InvalidArgumentError
from vectorwave_tpu.ops.dwt import dwt
from vectorwave_tpu.transforms.packets import _validate_basis


def _x(shape=(256,), seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


@pytest.mark.parametrize("wavelet", ["haar", "db4", "sym5", "coif3", "bior4.4"])
@pytest.mark.parametrize("transform,inverse", [(vw.wpt, vw.iwpt), (vw.modwpt, vw.imodwpt)])
def test_perfect_reconstruction_periodic(wavelet, transform, inverse):
    x = _x()
    tree = transform(x, wavelet, 3)
    xr = inverse(tree, wavelet)
    assert float(jnp.max(jnp.abs(xr - x))) < 1e-10


def test_wpt_depth1_is_dwt():
    x = _x()
    tree = vw.wpt(x, "db4", 1)
    ref = dwt(x, "db4")
    np.testing.assert_array_equal(np.asarray(tree.node(1, 0)), np.asarray(ref.approx))
    np.testing.assert_array_equal(np.asarray(tree.node(1, 1)), np.asarray(ref.detail))


def test_modwpt_depth1_is_modwt():
    x = _x()
    tree = vw.modwpt(x, "db4", 1)
    ref = vw.modwt(x, "db4")
    np.testing.assert_array_equal(np.asarray(tree.node(1, 0)), np.asarray(ref.approx))
    np.testing.assert_array_equal(np.asarray(tree.node(1, 1)), np.asarray(ref.detail))


@pytest.mark.parametrize("transform", [vw.wpt, vw.modwpt])
def test_energy_preserved_every_depth(transform):
    """Each depth of an orthogonal periodic packet bank is a tight frame."""
    x = _x(seed=3)
    tree = transform(x, "db6", 4)
    total = float((x**2).sum())
    for j in range(1, 5):
        assert float(tree.energy_map(j).sum()) == pytest.approx(total, rel=1e-12)


@pytest.mark.slow
def test_tree_shapes_and_flags():
    x = _x((5, 128))
    t = vw.wpt(x, "db4", 3)
    assert [l.shape for l in t.levels] == [(5, 1, 128), (5, 2, 64), (5, 4, 32), (5, 8, 16)]
    assert t.is_decimated and t.depth == 3
    m = vw.modwpt(x, "db4", 2)
    assert [l.shape for l in m.levels] == [(5, 1, 128), (5, 2, 128), (5, 4, 128)]
    assert not m.is_decimated


def test_batch_matches_single():
    xs = _x((4, 256), seed=9)
    batched = vw.modwpt(xs, "sym4", 3)
    for b in range(4):
        single = vw.modwpt(xs[b], "sym4", 3)
        np.testing.assert_array_equal(
            np.asarray(batched.leaves[b]), np.asarray(single.leaves)
        )


@pytest.mark.slow
@pytest.mark.parametrize("transform", [vw.wpt, vw.modwpt])
def test_frequency_order_monotone_tones(transform):
    peaks = []
    for f in np.linspace(0.02, 0.48, 8):
        tone = jnp.asarray(np.sin(2 * np.pi * f * np.arange(512)))
        tr = transform(tone, "db8", 3)
        energies = np.asarray(tr.energy_map())[vw.frequency_order(3)]
        peaks.append(int(np.argmax(energies)))
    assert peaks == sorted(peaks)
    assert peaks[0] == 0 and peaks[-1] == 7


def test_frequency_order_is_permutation():
    for level in range(6):
        order = vw.frequency_order(level)
        assert sorted(order.tolist()) == list(range(1 << level))


def test_packet_frequency_bands_tile_nyquist():
    bands = vw.packet_frequency_bands(3, sampling_rate=2.0)
    assert bands.shape == (8, 2)
    edges = bands[vw.frequency_order(3)]
    np.testing.assert_allclose(edges[:, 0], np.arange(8) / 8.0)
    np.testing.assert_allclose(edges[:, 1], (np.arange(8) + 1) / 8.0)


def _all_admissible_bases(depth):
    """Enumerate admissible bases of a depth-``depth`` binary tree."""
    if depth == 0:
        return [[(0, 0)]]

    def expand(level, idx, remaining):
        if remaining == 0:
            return [[(level, idx)]]
        splits = [
            a + b
            for a in expand(level + 1, 2 * idx, remaining - 1)
            for b in expand(level + 1, 2 * idx + 1, remaining - 1)
        ]
        return [[(level, idx)]] + splits

    return expand(0, 0, depth)


@pytest.mark.slow
@pytest.mark.parametrize("cost", ["shannon", "log_energy", "threshold", "l1"])
def test_best_basis_is_brute_force_optimal(cost):
    x = _x((192,), seed=11) * jnp.asarray(
        np.sin(2 * np.pi * 0.21 * np.arange(192))
    )  # structured signal so the optimum is non-trivial
    tree = vw.modwpt(x, "db4", 2)
    basis = vw.best_basis(tree, cost=cost, threshold=0.2)
    _validate_basis(basis, 2)

    def basis_cost(b):
        total = 0.0
        root_energy = float((x**2).sum()) + 1e-30
        for level, idx in b:
            c = np.asarray(tree.node(level, idx))
            p = c**2 / root_energy
            if cost == "shannon":
                total += float(-(p * np.log(p + 1e-30)).sum())
            elif cost == "log_energy":
                total += float(np.log(p + 1e-30).sum())
            elif cost == "threshold":
                total += float((np.abs(c) > 0.2).sum())
            else:
                total += float(np.abs(c).sum())
        return total

    best = min(basis_cost(b) for b in _all_admissible_bases(2))
    assert basis_cost(list(basis)) == pytest.approx(best, rel=1e-9)


def test_best_basis_callable_cost():
    tree = vw.wpt(_x(), "db4", 2)
    basis = vw.best_basis(tree, cost=lambda node: jnp.abs(node).sum())
    _validate_basis(basis, 2)


@pytest.mark.slow
@pytest.mark.parametrize("transform,inverse", [(vw.wpt, vw.iwpt), (vw.modwpt, vw.imodwpt)])
def test_reconstruct_from_best_basis_exact(transform, inverse):
    x = _x(seed=5)
    tree = transform(x, "sym6", 3)
    basis = vw.best_basis(tree, cost="shannon")
    xr = vw.reconstruct_basis(tree, basis, "sym6")
    assert float(jnp.max(jnp.abs(xr - x))) < 1e-10
    # mixed-depth handwritten basis too
    mixed = [(1, 0), (2, 2), (3, 6), (3, 7)]
    xr2 = vw.reconstruct_basis(tree, mixed, "sym6")
    assert float(jnp.max(jnp.abs(xr2 - x))) < 1e-10


def test_reconstruct_basis_node_hook_denoises():
    rng = np.random.default_rng(8)
    clean = np.sin(2 * np.pi * 0.03 * np.arange(512))
    x = jnp.asarray(clean + 0.3 * rng.standard_normal(512))
    tree = vw.modwpt(x, "sym8", 3)
    thr = 0.15

    def soft(level, idx, c):
        if level < 3:
            return c
        return jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr, 0.0)

    den = vw.reconstruct_basis(
        tree, [(3, i) for i in range(8)], "sym8", transform_nodes=soft
    )
    noise_in = float(((x - jnp.asarray(clean)) ** 2).mean())
    noise_out = float(((den - jnp.asarray(clean)) ** 2).mean())
    assert noise_out < 0.5 * noise_in


@pytest.mark.slow
def test_whole_pipeline_jits():
    x = _x()

    @jax.jit
    def roundtrip(y):
        return vw.imodwpt(vw.modwpt(y, "db4", 3), "db4")

    assert float(jnp.max(jnp.abs(roundtrip(x) - x))) < 1e-10


def test_basis_coefficients_order():
    tree = vw.wpt(_x(), "db4", 2)
    basis = ((1, 0), (2, 2), (2, 3))
    coeffs = vw.basis_coefficients(tree, basis)
    assert len(coeffs) == 3
    assert coeffs[0].shape[-1] == 128 and coeffs[1].shape[-1] == 64


def test_error_paths():
    x = _x()
    with pytest.raises(InvalidArgumentError):
        vw.wpt(x, "db4", 0)
    with pytest.raises(InvalidArgumentError):
        vw.wpt(jnp.ones(250), "db4", 3)  # not divisible by 8
    tree = vw.wpt(jnp.ones(64), "db4", 2)
    with pytest.raises(InvalidArgumentError):
        vw.reconstruct_basis(tree, [(1, 0)], "db4")  # gap
    with pytest.raises(InvalidArgumentError):
        vw.reconstruct_basis(tree, [(1, 0), (1, 1), (2, 3)], "db4")  # overlap
    with pytest.raises(InvalidArgumentError):
        vw.reconstruct_basis(tree, [(5, 0)], "db4")  # outside tree
    with pytest.raises(InvalidArgumentError):
        vw.best_basis(tree, cost="nope")


@pytest.mark.slow
def test_denoise_packet_beats_modwt_on_highband_tone():
    """Best-basis packet denoising preserves narrowband HF structure that
    the level-tiling MODWT denoiser destroys."""
    rng = np.random.default_rng(14)
    t = np.arange(2048)
    clean = np.sin(2 * np.pi * 0.41 * t) + np.sin(2 * np.pi * 0.02 * t)
    x = jnp.asarray(clean + 0.5 * rng.standard_normal(2048))
    c = jnp.asarray(clean)

    def mse(a):
        return float(((a - c) ** 2).mean())

    packet = mse(vw.denoise_packet(x, "sym8", 4))
    modwt = mse(vw.denoise_multilevel(x, "sym8", levels=4))
    assert packet < 0.75 * modwt


def test_denoise_packet_smooth_signal():
    rng = np.random.default_rng(15)
    t = np.arange(2048)
    clean = 2 * np.sin(2 * np.pi * 0.02 * t) * np.exp(-(((t - 1024) / 600) ** 2))
    x = jnp.asarray(clean + 0.5 * rng.standard_normal(2048))
    c = jnp.asarray(clean)
    den = vw.denoise_packet(x, "sym8", 4)
    assert float(((den - c) ** 2).mean()) < 0.2 * float(((x - c) ** 2).mean())


def test_denoise_packet_noiseless_near_identity():
    t = np.arange(1024)
    x = jnp.asarray(np.sin(2 * np.pi * 0.01 * t))
    den = vw.denoise_packet(x, "db4", 3)
    assert float(jnp.max(jnp.abs(den - x))) < 0.05
