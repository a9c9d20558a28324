"""Parity tests for the band-limited decimated CWT synthesis tier.

kernels/cwt_banded.py replaces the FFT path's per-scale full inverse with
a small ifft + LS-interpolation matmul for narrow-band (large) scales.
Its documented grade is ~1e-5 relative to the full-inverse oracle (the
band truncation drops the sampled bank's time-truncation leakage floor;
cf. the reference engine `CWTTransform.java:223-313` whose band content
is identical).  Gate is TPU-only in production; tests force it on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.kernels import cwt_banded as cb
from vectorwave_tpu.transforms import cwt as cm

N = 16384
SCALES = tuple(np.geomspace(2.0, 1024.0, 24).tolist())


@pytest.fixture()
def banded_on(monkeypatch):
    monkeypatch.setattr(
        cm, "_use_banded",
        lambda fft_size, real_dtype: real_dtype == jnp.float32
        and fft_size >= 2048,
    )


def _oracle_rows(xnp, scales, n, boundary):
    """Full-spectrum f64 numpy synthesis (the exact FFT-path result)."""
    w = cm._resolve_continuous("morl")
    fft_size = n if boundary == "periodic" else cm._next_pow2(2 * n)
    rows = cm._host_real_bank_rows(w, scales, fft_size)
    spec = np.fft.rfft(xnp.astype(np.float64), n=fft_size)
    return np.stack(
        [np.fft.irfft(spec * r, n=fft_size)[:n] for r in rows]
    )


def test_plans_cover_large_scales():
    w = cm._resolve_continuous("morl")
    rows = cm._host_real_bank_rows(w, SCALES, N)
    start, plans = cb.banded_eligible_suffix(rows, N)
    assert start < len(SCALES)  # large scales are eligible
    for p in plans:
        assert p.design_residual < 1e-6
        assert p.dropped_mass < cb._MAX_DROPPED_MASS
        assert p.kprime * cb._MIN_DECIMATION <= N


def test_banded_matches_oracle_periodic(banded_on):
    rng = np.random.default_rng(0)
    xnp = rng.standard_normal(N).astype(np.float32)
    out = np.asarray(
        vw.cwt(jnp.asarray(xnp), SCALES, "morl", boundary="periodic").coeffs
    )
    ref = _oracle_rows(xnp, SCALES, N, "periodic")
    for i in range(len(SCALES)):
        scale_err = np.max(np.abs(out[i] - ref[i])) / (
            np.max(np.abs(ref[i])) + 1e-30
        )
        assert scale_err < 2e-4, (i, SCALES[i], scale_err)


def test_banded_matches_oracle_zero_boundary(banded_on):
    rng = np.random.default_rng(1)
    n = 12000  # non-power-of-two: padded fft_size path
    xnp = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(
        vw.cwt(jnp.asarray(xnp), SCALES, "morl", boundary="zero").coeffs
    )
    ref = _oracle_rows(xnp, SCALES, n, "zero")
    for i in range(len(SCALES)):
        scale_err = np.max(np.abs(out[i] - ref[i])) / (
            np.max(np.abs(ref[i])) + 1e-30
        )
        assert scale_err < 2e-4, (i, SCALES[i], scale_err)


def test_banded_batch_dims(banded_on):
    rng = np.random.default_rng(2)
    xnp = rng.standard_normal((3, N)).astype(np.float32)
    out = np.asarray(
        vw.cwt(jnp.asarray(xnp), SCALES, "morl", boundary="periodic").coeffs
    )
    assert out.shape == (3, len(SCALES), N)
    for b in range(3):
        ref = _oracle_rows(xnp[b], SCALES, N, "periodic")
        err = np.max(np.abs(out[b] - ref)) / np.max(np.abs(ref))
        assert err < 2e-4


def test_dc_term_carried_exactly(banded_on):
    # constant signal: every coefficient is the bank row's DC response
    xnp = np.full(N, 2.5, np.float32)
    out = np.asarray(
        vw.cwt(jnp.asarray(xnp), SCALES, "morl", boundary="periodic").coeffs
    )
    ref = _oracle_rows(xnp, SCALES, N, "periodic")
    # relative to the TYPICAL coefficient magnitude of a unit signal (the
    # DC rows are themselves tiny; compare absolutely against the bank
    # peak response x signal amplitude)
    w = cm._resolve_continuous("morl")
    rows = cm._host_real_bank_rows(w, SCALES, N)
    for i in range(len(SCALES)):
        bound = 2.5 * np.abs(rows[i]).max() / N * 1e-3 + 1e-9
        assert np.max(np.abs(out[i] - ref[i])) < bound, (i, SCALES[i])


def test_gate_off_on_jnp_backend():
    import vectorwave_tpu.config as cfg

    cfg.set_backend("jnp")
    try:
        assert not cm._use_banded(1 << 20, jnp.float32)
    finally:
        cfg.set_backend("auto")
