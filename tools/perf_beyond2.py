"""On-chip latencies for the second wave of beyond-reference modules.

Companion to tools/perf_beyond.py (same amortized fori-chain timing
discipline — each workload is iterated ON-DEVICE with the output folded
back into the carry, so the ~30 ms/dispatch tunnel overhead amortizes
away).  Complex buffers never cross the host boundary (axon cannot
transfer them): every chain carries a real array.

Measures:
  * DTCWT 1-D roundtrip (8 x 16384, 5 levels, generated q-shift filters)
  * DTCWT 2-D roundtrip (512 x 512, 4 levels)
  * cwt2 scale x orientation bank (256 x 256, 8 scales x 8 angles)
  * scattering1d order-2 features (8 x 16384, J=6 Q=8)
  * scattering2d order-2 features (128 x 128, J=3 L=6)
  * EWT roundtrip (16384, 4 adaptive bands, fixed boundaries)
  * synchrosqueeze (32 scales x 16384)
  * multifractal_spectrum (1M samples, wavelet leaders + WLS fits)
  * inpaint (512 samples, 40% missing, 200 FISTA iterations — one solve)

Run from a foreground shell: python tools/perf_beyond2.py
Prints one JSON line for PERF.md curation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _measure(fn, x, iters=150, reps=3):
    @jax.jit
    def repeat(y):
        return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

    np.asarray(repeat(x).ravel()[:4])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(repeat(x).ravel()[:4])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters * 1e3  # ms


def main() -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorwave_tpu_jax"),
    )
    import vectorwave_tpu as vw
    from vectorwave_tpu.transforms.cwt import scales_log

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    out: dict[str, float | str] = {"device": dev.device_kind}

    # 1. DTCWT 1-D roundtrip, 8 x 16384, 5 levels
    x1 = jnp.asarray(rng.standard_normal((8, 16384)), jnp.float32)
    t = _measure(lambda z: vw.idtcwt(vw.dtcwt(z, levels=5)), x1)
    out["dtcwt5_roundtrip_8x16384_ms"] = round(t, 3)
    out["dtcwt5_msamples_per_s"] = round(8 * 16384 / (t / 1e3) / 1e6, 1)
    x1b = jnp.asarray(rng.standard_normal((64, 16384)), jnp.float32)
    tb = _measure(lambda z: vw.idtcwt(vw.dtcwt(z, levels=5)), x1b, iters=100)
    out["dtcwt5_roundtrip_64x16384_ms"] = round(tb, 3)
    out["dtcwt5_msamples_per_s_64"] = round(64 * 16384 / (tb / 1e3) / 1e6, 1)

    # 2. DTCWT 2-D roundtrip, 512 x 512, 4 levels
    x2 = jnp.asarray(rng.standard_normal((512, 512)), jnp.float32)
    t = _measure(lambda z: vw.idtcwt2(vw.dtcwt2(z, levels=4)), x2, iters=100)
    out["dtcwt2_roundtrip_512x512_ms"] = round(t, 3)

    # 2b. 2-D MODWT roundtrip, 8 x 2048 x 2048 db4 J=4 (true 2-D Pallas
    # kernel since r4; the XLA banded path measured 180 ms in-process,
    # tools/probe_2d_breakdown.py)
    x2b = jnp.asarray(rng.standard_normal((8, 2048, 2048)), jnp.float32)

    def m2rt(z):
        res = vw.modwt2_multilevel(z, "db4", levels=4)
        return vw.imodwt2_multilevel(res, "db4")

    t = _measure(m2rt, x2b, iters=30)
    out["modwt2_roundtrip_8x2048_ms"] = round(t, 3)

    # 2c. deep-span + full-pipeline rows on the same images: db4 J=6
    # roundtrip (hb=4 halo windows) and denoise2 (sigma + per-subband
    # thresholds + synthesis, all through the 2-D Pallas kernels)
    def m2rt6(z):
        res = vw.modwt2_multilevel(z, "db4", levels=6)
        return vw.imodwt2_multilevel(res, "db4")

    t = _measure(m2rt6, x2b, iters=5)
    out["modwt2_roundtrip_J6_8x2048_ms"] = round(t, 3)

    def dn2(z):
        return vw.denoise2(z, "db4", levels=4, method="universal",
                           mode="soft")

    t = _measure(dn2, x2b, iters=30)
    out["denoise2_8x2048_ms"] = round(t, 3)

    # 3. cwt2 bank, 256 x 256, 8 scales x 8 angles (complex stays on device)
    x3 = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    angles = tuple(np.linspace(0, np.pi, 8, endpoint=False))
    sc2 = tuple(np.geomspace(2, 32, 8))

    def cwt2_chain(z):
        r = vw.cwt2(z, sc2, "morl2", angles=angles)
        return z + 1e-20 * jnp.abs(r.coeffs).sum(axis=(-4, -3))

    out["cwt2_8x8_256x256_ms"] = round(_measure(cwt2_chain, x3, iters=100), 3)

    # 4. scattering1d, 8 x 16384, J=6 Q=8 order-2
    def scat1_chain(z):
        r = vw.scattering1d(z, J=6, Q=8)
        return z + 1e-20 * r.feature_vector().sum(axis=-1, keepdims=True)

    out["scattering1d_8x16384_ms"] = round(_measure(scat1_chain, x1, iters=100), 3)

    # 5. scattering2d, 128 x 128, J=3 L=6 order-2
    x5 = jnp.asarray(rng.standard_normal((128, 128)), jnp.float32)

    def scat2_chain(z):
        r = vw.scattering2d(z, J=3, L=6)
        return z + 1e-20 * r.feature_vector().sum(axis=-1, keepdims=True)[..., None]

    out["scattering2d_128x128_ms"] = round(_measure(scat2_chain, x5, iters=100), 3)

    # 6. EWT roundtrip, 16384 samples, 4 bands (boundaries fixed / static)
    x6 = jnp.asarray(rng.standard_normal(16384), jnp.float32)
    bounds = (0.05, 0.15, 0.35)  # cycles/sample, in (0, 0.5)
    t = _measure(lambda z: vw.iewt(vw.ewt(z, bounds), bounds), x6)
    out["ewt_roundtrip_16384_ms"] = round(t, 3)

    # 7. synchrosqueeze, 32 scales x 16384
    scales = scales_log(2, 256, 32)

    def sst_chain(z):
        r = vw.synchrosqueeze(z, scales, "morl")
        return z + 1e-20 * jnp.abs(r.coeffs).sum(axis=-2)

    out["sst_32sc_16384_ms"] = round(_measure(sst_chain, x6, iters=100), 3)

    # 8. multifractal spectrum, 1M samples
    x8 = jnp.asarray(rng.standard_normal(1 << 20), jnp.float32)

    def mf_chain(z):
        r = vw.multifractal_spectrum(z, "db3")
        return z + 1e-20 * r.zeta.sum()

    out["multifractal_1M_ms"] = round(_measure(mf_chain, x8, iters=30), 3)

    # 9. inpaint 512 samples, 40% missing, 200 FISTA iterations (one solve)
    mask = jnp.asarray(rng.random(512) > 0.4, jnp.float32)
    x9 = jnp.asarray(rng.standard_normal(512), jnp.float32) * mask

    def inpaint_chain(z):
        return vw.inpaint(z, mask, "db8", steps=200) * mask

    out["inpaint_512_200it_ms"] = round(_measure(inpaint_chain, x9, iters=5), 3)

    # 10. FISTA inpaint at 1M samples, 30% missing, 200 iterations (one
    # solve; VERDICT r02 item 9 — the latency-shaped modules need on-chip
    # rows at production sizes)
    n10 = 1 << 20
    mask10 = jnp.asarray(rng.random(n10) > 0.3, jnp.float32)
    tt = np.arange(n10)
    smooth = (np.sin(2 * np.pi * tt / 4096) +
              0.4 * np.sin(2 * np.pi * tt / 512 + 1.0)).astype(np.float32)
    x10 = jnp.asarray(smooth) * mask10

    def inpaint1m_chain(z):
        return vw.inpaint(z, mask10, "db8", steps=200) * mask10

    out["inpaint_1M_200it_ms"] = round(_measure(inpaint1m_chain, x10, iters=2), 3)

    # 11. packets2d best-basis denoise, 256x256 depth-3 — ONE jitted
    # program since r4 (on-device Coifman–Wickerhauser DP + masked
    # reconstruction), so the standard amortized fori chain applies
    x11 = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)

    def pk2_denoise(z):
        return vw.best_basis_denoise2(
            z, "db4", 3, threshold=0.8, cost="shannon", cost_threshold=0.5,
            mode="soft",
        )

    out["packets2d_bestbasis_denoise_256_ms"] = round(
        _measure(pk2_denoise, x11, iters=100), 3
    )

    from _beyond_common import merge_rows

    merge_rows(
        [
            {"name": "DTCWT 1-D roundtrip 8x16384, 5 levels",
             "ms": out["dtcwt5_roundtrip_8x16384_ms"],
             "note": f"{out['dtcwt5_msamples_per_s']:.0f} Msamples/s "
                     "(latency-class shape); 64x16K batch: "
                     f"{out['dtcwt5_msamples_per_s_64']:.0f} Ms/s; "
                     "generated q-shift filters"},
            {"name": "DTCWT 2-D roundtrip 512x512, 4 levels",
             "ms": out["dtcwt2_roundtrip_512x512_ms"], "note": ""},
            {"name": "2-D MODWT roundtrip 8x2048x2048 db4 J=4",
             "ms": out["modwt2_roundtrip_8x2048_ms"],
             "note": "true 2-D Pallas kernel (both passes in VMEM)"},
            {"name": "2-D MODWT roundtrip 8x2048x2048 db4 J=6",
             "ms": out["modwt2_roundtrip_J6_8x2048_ms"],
             "note": "deep-span windows (hb=4 halo blocks per side)"},
            {"name": "denoise2 8x2048x2048 db4 J=4 universal-soft",
             "ms": out["denoise2_8x2048_ms"],
             "note": "full pipeline through the 2-D Pallas kernels"},
            {"name": "cwt2 bank 256x256, 8 scales x 8 angles",
             "ms": out["cwt2_8x8_256x256_ms"], "note": "complex stays on device"},
            {"name": "scattering1d order-2, 8x16384, J=6 Q=8",
             "ms": out["scattering1d_8x16384_ms"], "note": ""},
            {"name": "scattering2d order-2, 128x128, J=3 L=6",
             "ms": out["scattering2d_128x128_ms"], "note": ""},
            {"name": "EWT roundtrip 16384, 4 bands",
             "ms": out["ewt_roundtrip_16384_ms"], "note": "fixed boundaries"},
            {"name": "synchrosqueeze 32 scales x 16384",
             "ms": out["sst_32sc_16384_ms"], "note": ""},
            {"name": "multifractal_spectrum 1M samples",
             "ms": out["multifractal_1M_ms"],
             "note": "wavelet leaders + WLS fits"},
            {"name": "FISTA inpaint 512, 40% missing, 200 it",
             "ms": out["inpaint_512_200it_ms"], "note": "one solve"},
            {"name": "FISTA inpaint 1M, 30% missing, 200 it",
             "ms": out["inpaint_1M_200it_ms"],
             "note": "one solve; the 200-step FISTA loop is one lax.fori"},
            {"name": "packets2d best-basis denoise 256x256 depth-3",
             "ms": out["packets2d_bestbasis_denoise_256_ms"],
             "note": "ONE jitted program: on-device CW DP + masked reconstruction (r4)"},
        ],
        str(dev.device_kind),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
