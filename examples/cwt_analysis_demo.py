"""CWT workflow: scale selection, time-frequency analysis, reconstruction.

Counterpart of the reference's CWT demos (CWTDemo, ScaleSelectionDemo,
InverseCWTDemo).  Run: python examples/cwt_analysis_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    fs = 1000.0
    t = np.arange(4096) / fs
    # chirp + a burst: classic time-frequency test signal
    x_np = np.sin(2 * np.pi * (20 + 30 * t) * t)
    x_np[2000:2200] += 0.8 * np.sin(2 * np.pi * 180 * t[2000:2200])
    x = jnp.asarray(x_np, dtype=jnp.float32)

    # --- adaptive scale selection (the 4th selector) -----------------------
    cfg = vw.ScaleSelectionConfig(sampling_rate=fs, scales_per_octave=8)
    scales = vw.select_scales_adaptive(x_np, "morl", cfg)
    lo, hi = vw.frequency_range_of_scales(scales, "morl", fs)
    print(f"adaptive selection: {len(scales)} scales covering "
          f"{lo:.1f}-{hi:.1f} Hz")

    # --- transform + ridge extraction --------------------------------------
    res = vw.cwt(x, scales, "morl", config=vw.CWTConfig(boundary="zero"))
    # small on-device reductions before pulling anything to the host
    power_cols = np.asarray(res.power()[:, 960:1040].mean(axis=-1))
    freqs = np.asarray(vw.scale_to_frequency(np.asarray(scales), "morl")) * fs
    in_band = (freqs > 10) & (freqs < 400)  # ignore drift-scale leakage
    ridge = float(freqs[in_band][power_cols[in_band].argmax()])
    print(f"chirp ridge frequency at t=1s: {ridge:.0f} Hz "
          f"(instantaneous f = 20 + 60t -> ~80)")
    burst_band = np.asarray(res.power()[:, 2050:2150].mean(axis=-1))
    f_burst = float(freqs[in_band][burst_band[in_band].argmax()])
    print(f"burst detected near {f_burst:.0f} Hz (expect ~180)")

    # --- analytic (Hilbert) coefficients for phase -------------------------
    res_c = vw.cwt(x, (8.0,), "morl", analytic=True)
    # pull real/imag separately (some remote runtimes cannot transfer
    # complex arrays to the host)
    seg = res_c.coeffs[0, 500:1500]
    cvals = np.asarray(seg.real) + 1j * np.asarray(seg.imag)
    inst_phase = np.unwrap(np.angle(cvals))
    print(f"analytic path: phase advances monotonically: "
          f"{bool(np.median(np.diff(inst_phase)) > 0)}")

    # --- reconstruction (periodic mode round-trips exactly when the scale
    # grid covers DC..Nyquist; burst edges are broadband, so go to ~1.2) ----
    sc = vw.scales_log(1.2, 1024, 128)
    res_p = vw.cwt(x, sc, "morl", boundary="periodic")
    xr = vw.icwt(res_p, "morl")
    err = float(jnp.max(jnp.abs(xr - x)))
    print(f"equalized icwt round-trip error: {err:.2e}")

    # band-limited reconstruction isolates the burst
    band = vw.reconstruct_frequency_band(res_p, "morl", 150 / fs, 220 / fs)
    ratio = float(
        jnp.abs(band[2050:2150]).mean() / (jnp.abs(band[:1000]).mean() + 1e-12)
    )
    print(f"150-220 Hz band energy concentrates at the burst: {ratio:.0f}x")


if __name__ == "__main__":
    main()
