"""Best-basis wavelet packet denoising.

Beyond-reference composition: pick a Coifman–Wickerhauser basis of an
undecimated packet tree, shrink each basis node with the standard threshold
selectors (universal / SURE / minimax / BayesShrink), reconstruct.  Against
the plain MODWT denoiser this adapts the frequency tiling to the signal —
narrowband structure in a HIGH band gets its own node instead of sharing a
whole detail level with the noise (on a two-tone test with one tone at 0.41
cycles/sample, packet denoising roughly halves the MODWT denoiser's MSE).

Noise model: per-stage 1/sqrt(2) filter scaling makes white noise of std
``sigma`` contribute ``sigma / sqrt(2^j)`` to every depth-``j`` packet node.
``sigma`` itself is estimated as the NOISE FLOOR across the deepest-level
nodes — the median of per-node MADs rescaled by ``sqrt(2^J)`` — which stays
honest when narrowband signal occupies some bands (a single-band MAD, the
MODWT denoiser's estimator, overestimates sigma ~2x there).  The DC-path
node ``(j, 0)`` passes through untouched (the approximation, as in the
MODWT denoiser).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..ops.thresholds import apply_threshold, mad_sigma, select_threshold
from ..transforms.packets import best_basis, modwpt, reconstruct_basis
from ..transforms.packets2d import best_basis2, reconstruct_basis2, wpt2

__all__ = ["denoise_packet", "denoise_packet2"]


def _noise_floor_sigma(tree) -> jnp.ndarray:
    """Median of depth-rescaled per-node MADs at the deepest level,
    ``[..., 1]`` (broadcastable against node coefficients)."""
    depth = tree.depth
    mads = mad_sigma(tree.levels[depth])[..., 0]  # [..., 2^J]
    return jnp.median(mads, axis=-1, keepdims=True) * math.sqrt(2.0**depth)


def denoise_packet(
    x: jnp.ndarray,
    wavelet,
    levels: int = 4,
    *,
    cost: str = "threshold",
    method: str = "universal",
    mode: str = "soft",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """Denoise via best-basis packet thresholding.

    ``cost`` picks the basis-selection criterion; the default "threshold"
    counts coefficients above the deepest level's noise-scaled universal
    threshold (a sparsity-relative-to-noise measure — the entropy costs
    tend to keep the root on noisy inputs, which would make the denoiser a
    no-op).  The basis search runs host-side on the node cost table
    (data-dependent structure selection); analysis, shrinkage and synthesis
    are jittable jnp graphs like every other denoiser in the package.
    """
    tree = modwpt(x, wavelet, levels, boundary=boundary)
    sigma = _noise_floor_sigma(tree)
    n = x.shape[-1]
    thr = float(
        jnp.mean(sigma)
        * math.sqrt(2.0 * math.log(n))
        / math.sqrt(2.0**levels)
    )
    basis = best_basis(tree, cost=cost, threshold=thr)

    def shrink(level: int, idx: int, coeffs: jnp.ndarray) -> jnp.ndarray:
        if idx == 0:  # DC path: pure approximation, pass through
            return coeffs
        level_sigma = sigma / jnp.sqrt(2.0**level)
        threshold = select_threshold(coeffs, level_sigma, method)
        return apply_threshold(coeffs, threshold, mode)

    return reconstruct_basis(
        tree, basis, wavelet, boundary=boundary, transform_nodes=shrink
    )


def denoise_packet2(
    x: jnp.ndarray,
    wavelet,
    levels: int = 3,
    *,
    cost: str = "risk",
    method: str = "universal",
    mode: str = "hard",
    boundary: str = "periodic",
) -> jnp.ndarray:
    """2-D best-basis packet denoising over the decimated quadtree.

    Default shrinkage is HARD: the basis concentrates texture into few
    large coefficients, and soft's constant-``t`` bias shaves exactly those
    (on the oscillatory-weave test hard roughly halves soft's MSE).

    The default basis cost is the Donoho-Johnstone threshold-risk proxy
    ``sum min(c^2, t^2)`` — the count-above-threshold cost is DEGENERATE for
    decimated denoising: a weak-per-sample texture spread below ``t`` at the
    root counts near zero, so the DP would "optimally" hide the signal in
    the noise and the denoiser would pass it through untouched.  The risk
    cost charges each surviving coefficient only ``t^2``, so concentrating
    the texture into a few large packet coefficients wins.

    The quadtree is ORTHONORMAL for orthogonal wavelets, so white noise of
    std ``sigma`` keeps std ``sigma`` in every node at every depth — no
    level rescaling.  ``sigma`` is the noise floor across the deepest-level
    nodes (median of per-node MADs), robust when texture occupies some
    bands; the universal threshold uses ``N = H*W`` (2-D VisuShrink).  The
    DC-path node ``(j, 0)`` passes through.  Decimated thresholding is not
    shift-invariant — use :func:`..transforms.twodim.denoise2` (MODWT-based)
    when shift invariance matters more than the adaptive tiling.
    """
    tree = wpt2(x, wavelet, levels, boundary=boundary)
    leaves = tree.leaves
    flat = leaves.reshape(leaves.shape[:-2] + (-1,))  # [..., 4^J, h*w]
    sigma = jnp.median(mad_sigma(flat)[..., 0], axis=-1, keepdims=True)

    n_total = x.shape[-1] * x.shape[-2]
    thr = float(jnp.mean(sigma) * math.sqrt(2.0 * math.log(n_total)))
    basis = best_basis2(tree, cost=cost, threshold=thr)

    def shrink(level: int, idx: int, plane: jnp.ndarray) -> jnp.ndarray:
        if idx == 0:  # DC path: pure approximation, pass through
            return plane
        vec = plane.reshape(plane.shape[:-2] + (-1,))
        if method.lower() == "universal":
            threshold = sigma * math.sqrt(2.0 * math.log(n_total))
        else:
            threshold = select_threshold(vec, sigma, method)
        return apply_threshold(vec, threshold, mode).reshape(plane.shape)

    return reconstruct_basis2(
        tree, basis, wavelet, boundary=boundary, transform_nodes=shrink
    )
