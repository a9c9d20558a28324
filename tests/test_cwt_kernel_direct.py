"""Kernel-direct CWT tier: small-support scales through the banded-MXU
bank kernel (transforms/cwt._cwt_kernel_direct), hybrid with the FFT path.

Parity oracle: the pure FFT path (backend='jnp' disables the tier).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import vectorwave_tpu as vw


@pytest.fixture
def pallas_f32():
    vw.set_backend("pallas")
    vw.set_fused_precision("float32")
    try:
        yield
    finally:
        vw.set_backend("auto")
        vw.set_fused_precision("bf16_3x")


def test_hybrid_matches_fft_path(pallas_f32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(16384), jnp.float32)
    scales = tuple(np.geomspace(2.0, 64.0, 8).tolist())
    got = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("jnp")
    ref = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("pallas")
    scale_mag = np.abs(np.asarray(ref.coeffs)).max()
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.coeffs),
        atol=2e-5 * scale_mag,
    )


def test_hybrid_split_mixed_scales(pallas_f32):
    """Scales straddling the support cap: leading ones go kernel-direct,
    the tail stays on the FFT path; rows must line up in order."""
    from vectorwave_tpu.transforms.cwt import (
        _KERNEL_DIRECT_MAX_HALF,
        _half_support,
        _kernel_direct_split,
        _resolve_continuous,
    )

    w = _resolve_continuous("morl")
    big_scale = (_KERNEL_DIRECT_MAX_HALF // 4) * 4  # beyond the cap
    scales = (4.0, 16.0, float(big_scale))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(16384), jnp.float32)
    n_small = _kernel_direct_split(x, w, scales, "periodic", jnp.float32)
    assert n_small == 2
    assert _half_support(scales[2], w.bandwidth) > _KERNEL_DIRECT_MAX_HALF
    got = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("jnp")
    ref = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("pallas")
    scale_mag = np.abs(np.asarray(ref.coeffs)).max()
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.coeffs),
        atol=2e-5 * scale_mag,
    )


def test_batched_rows_chunk_under_bank_budget(pallas_f32, monkeypatch):
    """A batched CWT whose rows*n exceeds the per-call bank budget must
    row-chunk (2^21-sample bank calls HTTP-500 the remote compiler) and
    still match the FFT path bit-for-policy."""
    from vectorwave_tpu.transforms import packets

    calls = []
    real_core = packets._bank_ana_core

    def spy_core(flat, dense, periodic, precision, interpret):
        calls.append(flat.shape)
        return real_core(flat, dense, periodic, precision, interpret)

    monkeypatch.setattr(packets, "_BANK_CALL_BUDGET", 8192)
    monkeypatch.setattr(packets, "_bank_ana_core", spy_core)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 8192)), jnp.float32)
    scales = (4.0, 16.0)
    got = vw.cwt(x, scales, "morl", boundary="periodic")
    assert calls and all(s[0] * s[1] <= 8192 for s in calls)
    vw.set_backend("jnp")
    ref = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("pallas")
    scale_mag = np.abs(np.asarray(ref.coeffs)).max()
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.coeffs),
        atol=2e-5 * scale_mag,
    )


def test_single_row_over_budget_stands_down(pallas_f32, monkeypatch):
    """One signal longer than the bank budget cannot be row-chunked — the
    tier must return 0 and leave everything on the FFT path."""
    from vectorwave_tpu.transforms import packets
    from vectorwave_tpu.transforms.cwt import (
        _kernel_direct_split,
        _resolve_continuous,
    )

    monkeypatch.setattr(packets, "_BANK_CALL_BUDGET", 8192)
    w = _resolve_continuous("morl")
    x = jnp.zeros((16384,), jnp.float32)
    assert _kernel_direct_split(x, w, (4.0, 16.0), "periodic", jnp.float32) == 0


def test_unsorted_scales_keep_fft_path(pallas_f32):
    """A descending scale list cannot prefix-split — tier must stand down
    and results still match."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(16384), jnp.float32)
    scales = (64.0, 8.0, 2.0)
    got = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("jnp")
    ref = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("pallas")
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.coeffs), atol=1e-5
    )


def test_mxu_irfft_synthesis_matches_fft_path(pallas_f32, monkeypatch):
    """Large-scale rows through the MXU-factorized inverse FFT must match
    the XLA irfft path at f32 grade (kernels/fft_mxu.py)."""
    from vectorwave_tpu.transforms import cwt as cwt_mod

    monkeypatch.setattr(cwt_mod, "_MXU_IFFT_MIN_FFT", 1 << 12)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(16384), jnp.float32)
    big = float((cwt_mod._KERNEL_DIRECT_MAX_HALF // 4) * 4)
    scales = (4.0, 16.0, big, big * 1.5)  # two kernel-direct + two FFT-path
    assert cwt_mod._use_mxu_ifft(1 << 15, jnp.float32)
    got = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("jnp")
    ref = vw.cwt(x, scales, "morl", boundary="periodic")
    vw.set_backend("pallas")
    scale_mag = np.abs(np.asarray(ref.coeffs)).max()
    np.testing.assert_allclose(
        np.asarray(got.coeffs), np.asarray(ref.coeffs),
        atol=2e-5 * scale_mag,
    )
