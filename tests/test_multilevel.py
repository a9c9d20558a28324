"""Multi-level MODWT cascade correctness.

Mirrors ``MultiLevelMODWTPeriodicRMSETest``, ``MultiLevelModwtCorrectnessTest``
and the symmetric-boundary interior-NRMSE policy (assert interior closeness for
SYMMETRIC, exactness only for PERIODIC — reference README.md:97-98).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from .conftest import composite_sin
from .golden import modwt_multilevel_golden


@partial(jax.jit, static_argnames=("name", "levels", "boundary"))
def _roundtrip(x, name, levels, boundary):
    ml = vw.modwt_multilevel(x, name, levels=levels, boundary=boundary)
    return vw.imodwt_multilevel(ml, name, boundary=boundary)


@partial(jax.jit, static_argnames=("name", "levels", "boundary"))
def _decompose(x, name, levels, boundary):
    return vw.modwt_multilevel(x, name, levels=levels, boundary=boundary)


@pytest.mark.parametrize(
    "name,levels,n",
    [("haar", 5, 512), ("db4", 6, 1024), ("sym8", 4, 512), ("db8", 5, 1024)],
)
def test_periodic_multilevel_roundtrip(name, levels, n):
    x = jnp.asarray(composite_sin(n, noise_std=0.4))
    xr = _roundtrip(x, name, levels, "periodic")
    rmse = float(jnp.sqrt(jnp.mean((x - xr) ** 2)))
    assert rmse < 1e-10, rmse


@pytest.mark.parametrize("boundary", ["periodic", "zero", "symmetric"])
def test_golden_equivalence_multilevel(boundary):
    n = 80
    levels = 3
    x = composite_sin(n, noise_std=0.3)
    w = vw.wavelet("db4")
    res = _decompose(jnp.asarray(x), "db4", levels, boundary)
    g_details, g_approx = modwt_multilevel_golden(x, w, levels, boundary)
    for j in range(levels):
        np.testing.assert_allclose(
            np.asarray(res.details[j]), g_details[j], rtol=0, atol=1e-12
        )
    np.testing.assert_allclose(np.asarray(res.approx), g_approx, rtol=0, atol=1e-12)


def test_energy_distribution_sums_to_one():
    x = jnp.asarray(composite_sin(256, noise_std=0.2))
    res = _decompose(x, "db4", 4, "periodic")
    dist = np.asarray(res.relative_energy_distribution())
    assert dist.shape == (5,)
    assert abs(dist.sum() - 1.0) < 1e-12
    assert (dist >= 0).all()


def test_energy_preservation_periodic():
    """MODWT preserves energy across the multi-level decomposition."""
    x = jnp.asarray(composite_sin(512, noise_std=0.4))
    res = _decompose(x, "db4", 5, "periodic")
    total = float(res.total_energy())
    expected = float((x**2).sum())
    assert abs(total - expected) / expected < 1e-10


def test_max_levels():
    """(L0-1)*2^(J-1)+1 <= N rule, capped at 10 (calculateMaxLevels :455-501)."""
    assert vw.max_levels(1024, "db4") == 8  # 7*2^7+1=897 <= 1024 < 7*2^8+1
    assert vw.max_levels(8, "db4") == 0  # N <= L0
    assert vw.max_levels(1 << 20, "haar") == vw.MAX_DECOMPOSITION_LEVELS - 1 or \
        vw.max_levels(1 << 20, "haar") in (9, 10)
    assert vw.max_levels(16, "haar") == 4  # 1*2^4+1=17 > 16 at J=5


def test_too_deep_raises():
    x = jnp.zeros(64)
    with pytest.raises(vw.InvalidArgumentError) as exc_info:
        vw.modwt_multilevel(x, "db4", levels=6)  # eff len 7*32+1=225 > 64
    assert exc_info.value.code is vw.ErrorCode.VAL_TOO_LARGE


def _interior_nrmse(name: str, n: int, levels: int) -> float:
    x_np = composite_sin(n, noise_std=0.3)
    xr = np.asarray(_roundtrip(jnp.asarray(x_np), name, levels, "symmetric"))
    eff = (vw.wavelet(name).filter_length - 1) * (1 << (levels - 1)) + 1
    margin = min(n // 4, eff // 2)
    interior = slice(margin, n - margin)
    err = x_np[interior] - xr[interior]
    return float(np.sqrt(np.mean(err**2)) / np.std(x_np[interior]))


@pytest.mark.parametrize("name,n,levels", [("haar", 257, 5), ("db4", 257, 4), ("sym8", 257, 4)])
def test_symmetric_interior_nrmse_guard(name, n, levels):
    """SYMMETRIC is approximate at edges; interior NRMSE must not regress.

    Analogue of the reference's committed-baseline regression guard
    (``SymmetricNRMSEBaselineGuardTest.java:19-70``; interior margin
    min(N/4, L_j/2); +10% headroom over the committed baseline)."""
    import json
    import pathlib

    baselines = json.loads(
        (pathlib.Path(__file__).parent / "baselines" / "symmetric_nrmse_baseline.json").read_text()
    )
    baseline = baselines[f"{name},{n},{levels}"]
    nrmse = _interior_nrmse(name, n, levels)
    assert nrmse <= baseline * 1.10, (nrmse, baseline)


def test_multilevel_batch():
    batch = np.stack([composite_sin(128, seed=s) for s in range(4)])
    res = _decompose(jnp.asarray(batch), "db4", 3, "periodic")
    assert res.approx.shape == (4, 128)
    assert len(res.details) == 3
