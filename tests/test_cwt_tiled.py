"""Distributed (tiled) CWT equivalence on the virtual 8-device mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu.parallel import cwt_tiled, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"signal": 8})


def _signal(n=2048):
    t = np.arange(n)
    return jnp.asarray(np.sin(2 * np.pi * t / 32) + 0.5 * np.sin(2 * np.pi * t / 128))


def test_tiled_cwt_matches_single_device(mesh):
    x = _signal()
    scales = vw.scales_log(2, 32, 16)
    tiled = cwt_tiled(x, scales, "morl", mesh=mesh)
    single = vw.cwt(x, scales, "morl")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-12
    )


def test_tiled_cwt_complex_wavelet_exact(mesh):
    x = _signal()
    scales = vw.scales_log(2, 16, 8)
    tiled = cwt_tiled(x, scales, "cmor", mesh=mesh)
    single = vw.cwt(x, scales, "cmor")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-12
    )


def test_tiled_cwt_multihop_halo(mesh):
    """Max scale's support (4*48=192) wider than one 128-sample shard."""
    x = _signal(1024)
    scales = (8.0, 48.0)
    tiled = cwt_tiled(x, scales, "mexh", mesh=mesh)
    single = vw.cwt(x, scales, "mexh")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-12
    )


def test_tiled_cwt_analytic_approximation(mesh):
    x = _signal()
    scales = vw.scales_log(2, 32, 8)
    tiled = cwt_tiled(x, scales, "morl", mesh=mesh, analytic=True)
    single = vw.cwt(x, scales, "morl", analytic=True)
    rel = float(
        jnp.max(jnp.abs(tiled.coeffs - single.coeffs))
        / jnp.max(jnp.abs(single.coeffs))
    )
    assert rel < 5e-3  # tile-local Hilbert: documented approximation


def test_tiled_cwt_uneven_rejected(mesh):
    with pytest.raises(vw.InvalidArgumentError):
        cwt_tiled(jnp.zeros(1001), (4.0,), "morl", mesh=mesh)


def test_cwt_tiled_2d_matches_single_device():
    """Scales over 'host' (zero DCN bytes), signal over 'chip' (ICI halos):
    must match the single-device fft-path CWT (BASELINE cfg5 layout)."""
    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled_2d, make_multihost_mesh

    mesh = make_multihost_mesh(n_hosts=2, chips_per_host=4)
    x = jnp.asarray(_signal(1024), dtype=jnp.float64)
    scales = vw.scales_log(2.0, 16.0, 8)
    tiled = cwt_tiled_2d(x, scales, "morl", mesh=mesh)
    single = vw.cwt(x, scales, "morl", boundary="zero")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-10
    )
    spec = tiled.coeffs.sharding.spec
    assert spec == ("host", "chip")


def test_cwt_tiled_2d_complex_wavelet():
    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled_2d, make_multihost_mesh

    mesh = make_multihost_mesh(n_hosts=2, chips_per_host=4)
    x = jnp.asarray(_signal(512), dtype=jnp.float64)
    scales = (2.0, 4.0, 6.0, 8.0)
    tiled = cwt_tiled_2d(x, scales, "cmor", mesh=mesh)
    single = vw.cwt(x, scales, "cmor", boundary="zero")
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs.real), np.asarray(single.coeffs.real), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(tiled.coeffs.imag), np.asarray(single.coeffs.imag), atol=1e-10
    )


def test_cwt_tiled_2d_validation():
    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled_2d, make_multihost_mesh

    mesh = make_multihost_mesh(n_hosts=2, chips_per_host=4)
    with pytest.raises(vw.InvalidArgumentError):  # 2-D input
        cwt_tiled_2d(jnp.zeros((2, 512)), (2.0, 4.0), "morl", mesh=mesh)
    with pytest.raises(vw.InvalidArgumentError):  # scales not divisible
        cwt_tiled_2d(jnp.zeros(512), (2.0, 4.0, 6.0), "morl", mesh=mesh)
    with pytest.raises(vw.InvalidArgumentError):  # N not divisible
        cwt_tiled_2d(jnp.zeros(510), (2.0, 4.0), "morl", mesh=mesh)


def test_cwt_tiled_2d_cache_keys_on_shape_and_dtype():
    """Back-to-back calls with different signal lengths must not reuse a
    stale compiled program (the fft size is baked into the closure)."""
    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled_2d, make_multihost_mesh

    mesh = make_multihost_mesh(n_hosts=2, chips_per_host=4)
    scales = (2.0, 4.0)
    for n in (1024, 4096):
        x = jnp.asarray(_signal(n), dtype=jnp.float64)
        tiled = cwt_tiled_2d(x, scales, "morl", mesh=mesh)
        single = vw.cwt(x, scales, "morl", boundary="zero")
        np.testing.assert_allclose(
            np.asarray(tiled.coeffs), np.asarray(single.coeffs), atol=1e-10
        )


def test_cwt_tiled_scale_validation():
    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled, cwt_tiled_2d, make_mesh, make_multihost_mesh

    smesh = make_mesh({"signal": 8})
    hmesh = make_multihost_mesh(n_hosts=2, chips_per_host=4)
    for bad in ((), (-2.0, 4.0)):
        with pytest.raises(vw.InvalidArgumentError):
            cwt_tiled(jnp.zeros(512), bad, "morl", mesh=smesh)
        with pytest.raises(vw.InvalidArgumentError):
            cwt_tiled_2d(jnp.zeros(512), bad, "morl", mesh=hmesh)


def test_cwt_tiled_program_cache_keys_on_psi():
    """Two custom wavelets sharing (name, fc, bw) but different psi must not
    share a cached program."""
    import numpy as onp

    import vectorwave_tpu as vw
    from vectorwave_tpu.parallel import cwt_tiled, make_mesh
    from vectorwave_tpu.wavelets.base import ContinuousWavelet

    def mk(width):
        return ContinuousWavelet(
            name="custom-x", family="Custom",
            psi=lambda t, wdt=width: onp.exp(-(t / wdt) ** 2) * onp.cos(5 * t),
            center_frequency=0.8, bandwidth=1.0,
        )

    mesh = make_mesh({"signal": 8})
    x = jnp.asarray(_signal(512), dtype=jnp.float64)
    a = cwt_tiled(x, (2.0, 4.0), mk(1.0), mesh=mesh)
    b = cwt_tiled(x, (2.0, 4.0), mk(0.5), mesh=mesh)
    assert float(jnp.max(jnp.abs(a.coeffs - b.coeffs))) > 1e-3
