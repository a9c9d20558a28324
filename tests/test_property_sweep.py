"""Seeded property sweep: randomized (wavelet, N, levels, boundary, batch)
configurations hammer the invariants the golden-oracle tests pin at fixed
shapes.  Catches shape/broadcast/caching bugs that only appear for odd
lengths, deep levels, or unusual batch ranks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

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
