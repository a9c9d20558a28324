"""2-D wavelet scattering: translation-invariant texture features.

The image counterpart of :mod:`.scattering` (Mallat; the Bruna-Mallat
scattering network for texture/object classification — method reference):
oriented Morlet responses, modulus, and a ``2^J`` Gaussian average,

    S0        = x * phi_J
    S1(j,t)   = |x * psi_{j,t}| * phi_J          (J scales x L angles)
    S2(p1,p2) = ||x * psi_{p1}| * psi_{p2}| * phi_J,   j2 > j1

The filterbank reuses the 2-D Morlet spectrum of :mod:`.cwt2` (generated
on device; the anisotropy knob trades angular sharpness against gap-free
coverage of ``[0, pi)`` — see ``scattering2d``'s ``aniso`` doc); every
order is one batched ``fft2`` product over a stacked path axis.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..errors import ErrorCode, InvalidArgumentError, InvalidSignalError
from .cwt2 import _bank, morlet2

__all__ = ["Scattering2DResult", "scattering2d"]

#: mother Morlet peak is at omega0 rad -> place the finest band near 0.35
#: cycles/sample: scale0 = omega0 / (2 pi 0.35)
_OMEGA0 = 5.336


class Scattering2DResult(NamedTuple):
    """Scattering coefficients at stride ``2^J`` (spatial axes last)."""

    s0: jnp.ndarray  # [..., H', W']
    s1: jnp.ndarray  # [..., J*L, H', W']
    s2: jnp.ndarray | None  # [..., n2, H', W']
    meta1: tuple[tuple[int, int], ...]  # (scale j, angle index) per s1 path
    pairs: tuple[tuple[int, int], ...]  # (path1, path2) per s2 path

    def feature_vector(self) -> jnp.ndarray:
        """Spatially-averaged log features ``[..., 1 + n1 + n2]``."""
        eps = 1e-8
        feats = [
            jnp.log(jnp.mean(self.s0, axis=(-2, -1))[..., None] ** 2 + eps)
        ]
        feats.append(jnp.log(jnp.mean(self.s1, axis=(-2, -1)) + eps))
        if self.s2 is not None:
            feats.append(jnp.log(jnp.mean(self.s2, axis=(-2, -1)) + eps))
        return jnp.concatenate(feats, axis=-1)

    def angle_energy(self, scale: int, n_angles: int | None = None) -> jnp.ndarray:
        """[..., L] first-order energy per angle at dyadic ``scale``.

        ``n_angles`` defaults to the transform's own ``L`` (recovered from
        ``meta1``), so it cannot silently drift from the forward call.
        """
        if n_angles is None:
            n_angles = max(angle for _, angle in self.meta1) + 1
        sel = self.s1[..., scale * n_angles : (scale + 1) * n_angles, :, :]
        return jnp.sum(sel**2, axis=(-2, -1))


def scattering2d(
    image: jnp.ndarray,
    *,
    J: int = 3,
    L: int = 8,
    order: int = 2,
    stride: int | None = None,
    aniso: float = 0.5,
) -> Scattering2DResult:
    """Scattering coefficients of ``[..., H, W]`` images (periodic).

    Args:
      J: number of dyadic scales; averaging window ``2^J`` pixels.
      L: orientations per scale over ``[0, pi)``.
      order: 1 or 2.
      stride: output subsampling, default ``2^J``.
      aniso: Morlet anisotropy — multiplies the cross-carrier frequency in
        the envelope (``morlet2``), so ``> 1`` narrows the angular response
        (sharper orientation selectivity).  The default 0.5 *widens* each
        wedge so ``L`` orientations cover ``[0, pi)`` without
        Littlewood–Paley gaps between angles.
    """
    if image.ndim < 2:
        raise InvalidSignalError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"scattering2d expects [..., H, W], got {image.shape}",
        )
    h, w = image.shape[-2], image.shape[-1]
    if order not in (1, 2):
        raise InvalidArgumentError(
            ErrorCode.CFG_INVALID_CONFIG, f"order must be 1 or 2, got {order}"
        )
    if stride is None:
        stride = 1 << J
    if h % stride or w % stride:
        raise InvalidArgumentError(
            ErrorCode.VAL_INVALID_SHAPE,
            f"stride {stride} must divide H={h} and W={w}",
        )
    if min(h, w) < (1 << J):
        raise InvalidSignalError(
            ErrorCode.VAL_TOO_SHORT,
            f"Image {h}x{w} below the averaging scale 2^J={1 << J}",
        )
    real_dtype = (
        image.dtype if jnp.issubdtype(image.dtype, jnp.floating) else jnp.float32
    )
    cdtype = jnp.complex128 if real_dtype == jnp.float64 else jnp.complex64
    x = image.astype(real_dtype)

    wav = morlet2(_OMEGA0, aniso)
    scale0 = _OMEGA0 / (2.0 * math.pi * 0.35)
    scales = tuple(scale0 * (1 << j) for j in range(J))
    angles = tuple(math.pi * i / L for i in range(L))
    bank = _bank(wav, scales, angles, h, w, False, real_dtype)  # [J, L, h, w]
    bank = bank.reshape(J * L, h, w).astype(cdtype)
    meta1 = tuple((j, i) for j in range(J) for i in range(L))

    # Gaussian lowpass at spatial scale 2^J
    ky = 2.0 * jnp.pi * jnp.fft.fftfreq(h).astype(real_dtype)
    kx = 2.0 * jnp.pi * jnp.fft.rfftfreq(w).astype(real_dtype)
    kyg, kxg = jnp.meshgrid(ky, kx, indexing="ij")
    sigma_t = 0.55 * (1 << J)
    phi = jnp.exp(-0.5 * sigma_t**2 * (kyg**2 + kxg**2))

    def lowpass(u):
        spec = jnp.fft.rfft2(u)
        out = jnp.fft.irfft2(spec * phi, s=(h, w))
        return out[..., ::stride, ::stride]

    s0 = lowpass(x)
    spec_x = jnp.fft.fft2(x).astype(cdtype)
    u1 = jnp.abs(jnp.fft.ifft2(spec_x[..., None, :, :] * bank))
    s1 = lowpass(u1)

    if order == 1:
        return Scattering2DResult(s0, s1, None, meta1, ())

    pairs = [
        (p1, p2)
        for p1, (j1, _) in enumerate(meta1)
        for p2, (j2, _) in enumerate(meta1)
        if j2 > j1
    ]
    if pairs:
        u1_sel = u1[..., jnp.asarray([p[0] for p in pairs]), :, :]
        bank2 = bank[jnp.asarray([p[1] for p in pairs])]
        u2 = jnp.abs(jnp.fft.ifft2(jnp.fft.fft2(u1_sel).astype(cdtype) * bank2))
        s2 = lowpass(u2)
    else:
        s2 = jnp.zeros(
            x.shape[:-2] + (0, h // stride, w // stride), dtype=real_dtype
        )
    return Scattering2DResult(s0, s1, s2, meta1, tuple(pairs))
