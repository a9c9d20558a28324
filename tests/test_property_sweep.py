"""Seeded property sweep: randomized (wavelet, N, levels, boundary, batch)
configurations hammer the invariants the golden-oracle tests pin at fixed
shapes.  Catches shape/broadcast/caching bugs that only appear for odd
lengths, deep levels, or unusual batch ranks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

import vectorwave_tpu as vw

WAVELETS = ["haar", "db2", "db4", "db7", "sym5", "coif2", "bior2.4", "rbio3.1"]
BOUNDARIES = ["periodic", "zero", "symmetric"]


def _configs(n_cases=24, seed=1234):
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        w = WAVELETS[rng.integers(len(WAVELETS))]
        n = int(rng.integers(48, 700))
        boundary = BOUNDARIES[rng.integers(len(BOUNDARIES))]
        batch = () if rng.random() < 0.5 else tuple(
            int(b) for b in rng.integers(1, 4, size=rng.integers(1, 3))
        )
        yield pytest.param(w, n, boundary, batch, i, id=f"{i}-{w}-{n}-{boundary}-{batch}")


@pytest.mark.parametrize("wavelet,n,boundary,batch,seed", _configs())
def test_modwt_multilevel_properties(wavelet, n, boundary, batch, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(batch + (n,)))
    levels = max(1, min(vw.max_levels(n, wavelet), int(rng.integers(1, 6))))
    res = vw.modwt_multilevel(x, wavelet, levels=levels, boundary=boundary)

    # shape invariants: undecimated — every plane matches the input shape
    assert res.approx.shape == x.shape
    assert all(d.shape == x.shape for d in res.details)
    assert bool(jnp.isfinite(res.approx).all())

    xr = vw.imodwt_multilevel(res, wavelet, boundary=boundary)
    assert xr.shape == x.shape
    if boundary == "periodic":
        # exact reconstruction for every wavelet family, any N, any batch rank
        assert float(jnp.max(jnp.abs(xr - x))) < 1e-8
    elif boundary == "zero":
        # interior-exact: edge loss confined to the cascade support
        halo = (vw.wavelet(wavelet).filter_length - 1) * (2**levels - 1)
        if n - 2 * halo > 8:
            err = jnp.abs(xr - x)[..., halo:-halo]
            assert float(jnp.max(err)) < 1e-8


@pytest.mark.parametrize(
    "wavelet,n,seed",
    [("haar", 128, 0), ("db3", 250, 1), ("sym4", 96, 2), ("bior3.3", 64, 3)],
)
def test_dwt_pyramid_properties(wavelet, n, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(n))
    levels = min(3, vw.max_dwt_levels(n, wavelet))
    dec = vw.wavedec(x, wavelet, levels=levels)
    rec = vw.waverec(dec, wavelet)
    assert float(jnp.max(jnp.abs(rec - x))) < 1e-8


def test_denoise_shapes_across_ranks():
    rng = np.random.default_rng(7)
    for shape in [(256,), (3, 256), (2, 2, 128)]:
        x = jnp.asarray(rng.standard_normal(shape))
        for method in ("universal", "sure", "minimax", "bayes"):
            out = vw.denoise_multilevel(x, "sym4", levels=3, method=method)
            assert out.shape == shape
            assert bool(jnp.isfinite(out).all())


def test_swt_editing_across_ranks():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 200)))
    res = vw.swt(x, "db4", levels=3)
    thr = vw.apply_universal_threshold(res, mode="hard")
    back = vw.iswt(thr, "db4")
    assert back.shape == x.shape
    assert bool(jnp.isfinite(back).all())


# ---- new-transform sweeps (DTCWT 1-D/2-D, cwt2, scattering, leaders) ------


def _dyadic_configs(n_cases=10, seed=77):
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        levels = int(rng.integers(1, 5))
        n = (1 << levels) * int(rng.integers(4, 40))
        batch = () if rng.random() < 0.5 else (int(rng.integers(1, 4)),)
        yield pytest.param(n, levels, batch, i, id=f"{i}-n{n}-J{levels}-{batch}")


@pytest.mark.parametrize("n,levels,batch,seed", _dyadic_configs())
def test_dtcwt_properties(n, levels, batch, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(batch + (n,)).astype(np.float32))
    res = vw.dtcwt(x, levels=levels)
    xr = vw.idtcwt(res)
    assert xr.shape == x.shape
    assert float(jnp.max(jnp.abs(xr - x))) < 1e-4
    total = sum(float(jnp.sum(jnp.abs(z) ** 2)) for z in res.highpasses)
    total += 0.5 * float(jnp.sum(res.lowpass_a**2) + jnp.sum(res.lowpass_b**2))
    assert total == pytest.approx(float(jnp.sum(x**2)), rel=1e-4)


def _dyadic2d_configs(n_cases=6, seed=78):
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        levels = int(rng.integers(1, 4))
        h = (1 << levels) * int(rng.integers(4, 12))
        w = (1 << levels) * int(rng.integers(4, 12))
        yield pytest.param(h, w, levels, i, id=f"{i}-{h}x{w}-J{levels}")


@pytest.mark.parametrize("h,w,levels,seed", _dyadic2d_configs())
def test_dtcwt2_properties(h, w, levels, seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    res = vw.dtcwt2(img, levels=levels)
    rec = vw.idtcwt2(res)
    assert float(jnp.max(jnp.abs(rec - img))) < 2e-4
    hp = sum(float(jnp.sum(jnp.abs(z) ** 2)) for z in res.highpasses)
    lp = float(jnp.sum(res.lowpasses**2))
    assert (2 * hp + lp) / 4 == pytest.approx(float(jnp.sum(img**2)), rel=1e-4)


def _cwt2_configs(n_cases=6, seed=79):
    rng = np.random.default_rng(seed)
    wavelets = ["morl2", "mexh2", "gaus2"]
    for i in range(n_cases):
        h = int(rng.integers(24, 96))
        w = int(rng.integers(24, 96))
        n_scales = int(rng.integers(1, 6))
        wname = wavelets[rng.integers(3)]
        yield pytest.param(h, w, n_scales, wname, i, id=f"{i}-{h}x{w}-{wname}")


@pytest.mark.parametrize("h,w,n_scales,wname,seed", _cwt2_configs())
def test_cwt2_properties(h, w, n_scales, wname, seed):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    scales = tuple(np.geomspace(1.5, 8, n_scales))
    wav = vw.morlet2() if wname == "morl2" else (
        vw.mexican_hat2() if wname == "mexh2" else vw.gaussian2(2)
    )
    angles = (0.0,) if wav.isotropic else (0.0, np.pi / 3)
    res = vw.cwt2(img, scales, wav, angles=angles)
    assert res.coeffs.shape == (n_scales, len(angles), h, w)
    assert bool(jnp.isfinite(jnp.abs(res.coeffs)).all())
    rec = vw.icwt2(res, wav)
    assert rec.shape == (h, w)
    assert bool(jnp.isfinite(rec).all())


def _scatter_configs(n_cases=6, seed=80):
    rng = np.random.default_rng(seed)
    for i in range(n_cases):
        J = int(rng.integers(3, 8))
        Q = int(rng.integers(1, 9))
        n = (1 << J) * int(rng.integers(2, 20))
        order = int(rng.integers(1, 3))
        yield pytest.param(n, J, Q, order, i, id=f"{i}-n{n}-J{J}-Q{Q}-o{order}")


@pytest.mark.parametrize("n,J,Q,order,seed", _scatter_configs())
def test_scattering_properties(n, J, Q, order, seed):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    res = vw.scattering1d(x, J=J, Q=Q, order=order)
    t = n // (1 << J)
    assert res.s0.shape == (2, t)
    assert res.s1.shape[0] == 2 and res.s1.shape[-1] == t
    assert float(jnp.min(res.s1)) >= 0
    feats = res.feature_vector()
    assert bool(jnp.isfinite(feats).all())
    if order == 2:
        assert res.s2.shape[-1] == t
        if res.s2.shape[-2]:  # small J can leave no valid second-order path
            assert float(jnp.min(res.s2)) >= 0


def test_multifractal_random_lengths_finite():
    rng = np.random.default_rng(81)
    for n in (1000, 1536, 4096, 5000):
        x = jnp.asarray(np.cumsum(rng.standard_normal(n)).astype(np.float32))
        res = vw.multifractal_spectrum(x, "db2", min_level=1)
        for leaf in (res.zeta, res.h, res.D, res.c1, res.c2):
            assert bool(jnp.isfinite(jnp.asarray(leaf)).all()), n
