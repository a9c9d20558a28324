"""Explicit coverage of the five BASELINE.json benchmark configurations
(correctness side; throughput is bench.py's job)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.parallel import (
    cwt_tiled,
    imodwt_multilevel_tiled,
    make_mesh,
    modwt_multilevel_sharded_batch,
    modwt_multilevel_tiled,
)
from .conftest import composite_sin


def test_config1_haar_1level_1024_periodic():
    x = jnp.asarray(composite_sin(1024, noise_std=0.3))
    res = vw.modwt(x, "haar", boundary="periodic")
    xr = vw.imodwt(res, "haar", boundary="periodic")
    assert float(jnp.max(jnp.abs(x - xr))) < 1e-10


def test_config2_db4_6level_65536_periodic():
    x = jnp.asarray(composite_sin(65536, noise_std=0.3))
    res = vw.modwt_multilevel(x, "db4", levels=6, boundary="periodic")
    xr = vw.imodwt_multilevel(res, "db4", boundary="periodic")
    rmse = float(jnp.sqrt(jnp.mean((x - xr) ** 2)))
    assert rmse < 1e-10  # "bit-parity grade" per BASELINE.json


def test_config3_swt_sym8_4level_symmetric_denoise_roundtrip():
    rng = np.random.default_rng(0)
    clean = composite_sin(2048)
    noisy = clean + rng.normal(0, 1.0, 2048)
    x = jnp.asarray(noisy)
    # plain SWT round trip under SYMMETRIC: interior must be faithful
    res = vw.swt(x, "sym8", levels=4, boundary="symmetric")
    back = np.asarray(vw.iswt(res, "sym8", boundary="symmetric"))
    sl = slice(512, 1536)
    nrmse = np.sqrt(np.mean((noisy[sl] - back[sl]) ** 2)) / np.std(noisy[sl])
    assert nrmse < 1.2
    # threshold-denoise round trip improves SNR
    den = np.asarray(
        vw.swt_denoise(x, "sym8", levels=4, boundary="symmetric")
    )
    assert np.mean((den[sl] - clean[sl]) ** 2) < np.mean((noisy[sl] - clean[sl]) ** 2)


def test_config4_batch_256x16k_sharded():
    mesh = make_mesh({"data": 8})
    rng = np.random.default_rng(1)
    batch = jnp.asarray(rng.standard_normal((256, 16384)), dtype=jnp.float32)
    res = modwt_multilevel_sharded_batch(
        batch, "db4", levels=4, mesh=mesh, axis="data"
    )
    # batch facade parity: a few rows vs single-device transforms
    for row in (0, 100, 255):
        single = vw.modwt_multilevel(batch[row], "db4", levels=4)
        np.testing.assert_allclose(
            np.asarray(res.details[0][row]), np.asarray(single.details[0]), atol=1e-5
        )


def test_config5_cwt_morlet_64scale_tiled():
    mesh = make_mesh({"signal": 8})
    n = 1 << 14  # scaled-down proxy of the 1M config for the CPU mesh
    t = np.arange(n)
    x = jnp.asarray(np.sin(2 * np.pi * t / 512) + 0.5 * np.sin(2 * np.pi * t / 64))
    scales = vw.scales_log(2, 128, 64)
    tiled = cwt_tiled(x, scales, "morl", mesh=mesh)
    single = vw.cwt(x, scales, "morl")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-10
    )
