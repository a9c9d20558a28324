"""Sharded 2-D MODWT (parallel/tiled2d.py): H-axis tiling with one
cumulative-span slab exchange must match the single-device transform to
machine precision on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import vectorwave_tpu as vw
from vectorwave_tpu.parallel import (
    imodwt2_multilevel_tiled,
    modwt2_multilevel_tiled,
)


def _mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return Mesh(np.array(devs[:4]), ("rows",))


@pytest.mark.parametrize("boundary", ["periodic", "zero", "symmetric"])
@pytest.mark.parametrize("name,levels", [("db4", 3), ("haar", 4)])
def test_tiled2d_analysis_matches_single_device(name, levels, boundary):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 128, 96)), jnp.float32)
    got = modwt2_multilevel_tiled(
        x, name, levels=levels, mesh=mesh, boundary=boundary
    )
    want = vw.modwt2_multilevel(x, name, levels=levels, boundary=boundary)
    for j in range(levels):
        for g, wref, tag in zip(got.details[j], want.details[j],
                                ("lh", "hl", "hh")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(wref), atol=2e-5,
                err_msg=f"level {j+1} {tag} {boundary}",
            )
    np.testing.assert_allclose(
        np.asarray(got.approx), np.asarray(want.approx), atol=2e-5
    )


@pytest.mark.parametrize("boundary", ["periodic", "zero", "symmetric"])
def test_tiled2d_roundtrip_matches_single_device(boundary):
    mesh = _mesh()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    res = modwt2_multilevel_tiled(
        x, "db4", levels=3, mesh=mesh, boundary=boundary
    )
    xr = imodwt2_multilevel_tiled(res, "db4", mesh=mesh, boundary=boundary)
    ref_res = vw.modwt2_multilevel(x, "db4", levels=3, boundary=boundary)
    ref = vw.imodwt2_multilevel(ref_res, "db4", boundary=boundary)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(ref), atol=3e-5)
    if boundary == "periodic":
        np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


def test_tiled2d_deep_halo_spans_multiple_shards():
    """Cumulative span wider than one shard: the hop-by-hop gather path."""
    mesh = _mesh()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    # db4 J=3: span = 7*7 = 49 > 64/4 = 16 rows per shard
    res = modwt2_multilevel_tiled(
        x, "db4", levels=3, mesh=mesh, boundary="periodic"
    )
    want = vw.modwt2_multilevel(x, "db4", levels=3, boundary="periodic")
    np.testing.assert_allclose(
        np.asarray(res.approx), np.asarray(want.approx), atol=2e-5
    )
    xr = imodwt2_multilevel_tiled(res, "db4", mesh=mesh, boundary="periodic")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


def test_tiled2d_periodic_multiwrap_span():
    """Cumulative span >= global H under periodic boundary needs the
    extension to wrap MORE than once — served by the exact gather path
    (the zero-filled slab silently diverged before the r4 review fix)."""
    mesh = _mesh()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    # db4 J=4: span = 7*15 = 105 > H = 64
    res = modwt2_multilevel_tiled(
        x, "db4", levels=4, mesh=mesh, boundary="periodic"
    )
    want = vw.modwt2_multilevel(x, "db4", levels=4, boundary="periodic")
    for j in range(4):
        for g, r in zip(res.details[j], want.details[j]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-5,
                err_msg=f"level {j+1}",
            )
    xr = imodwt2_multilevel_tiled(res, "db4", mesh=mesh, boundary="periodic")
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


def test_tiled2d_batch_axis():
    mesh_devs = jax.devices()
    if len(mesh_devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(mesh_devs[:8]).reshape(2, 4), ("batch", "rows"))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 64, 96)), jnp.float32)
    res = modwt2_multilevel_tiled(
        x, "haar", levels=2, mesh=mesh, boundary="periodic",
        batch_axis="batch",
    )
    want = vw.modwt2_multilevel(x, "haar", levels=2, boundary="periodic")
    np.testing.assert_allclose(
        np.asarray(res.approx), np.asarray(want.approx), atol=2e-5
    )
    xr = imodwt2_multilevel_tiled(
        res, "haar", mesh=mesh, boundary="periodic", batch_axis="batch"
    )
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), atol=3e-5)


def test_tiled2d_under_outer_jit():
    """The facade composes under an outer jit (device_put on tracers
    lowers to a sharding annotation) — the serving-path usage."""
    mesh = _mesh()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)

    @jax.jit
    def rt(v):
        res = modwt2_multilevel_tiled(
            v, "db4", levels=2, mesh=mesh, boundary="periodic"
        )
        return imodwt2_multilevel_tiled(
            res, "db4", mesh=mesh, boundary="periodic"
        )

    np.testing.assert_allclose(np.asarray(rt(x)), np.asarray(x), atol=3e-5)
