"""Runtime performance learning: prediction, calibration, backend routing.

Counterpart of the reference's RuntimeLearningDemo /
PerformanceCalibrationDemo / AdaptiveThresholdTuner examples: predict a
transform's cost with a confidence interval, tighten the interval by
measuring the actual device, and inspect how the backend router uses the
cost model to pick the Pallas/jnp/FFT paths.
Run: python examples/calibration_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

from vectorwave_tpu import cost_model
from vectorwave_tpu.ops.facade import get_performance_info, should_use_fft
from vectorwave_tpu.wavelets.registry import wavelet


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})")
    info = get_performance_info()
    print(f"  {info.description}")
    print(f"  devices: {info.device_count}, pallas kernels: {info.pallas_kernels}")

    # --- prediction BEFORE calibration: wide platform-default interval ---
    pred = cost_model.estimate_processing_time(65536, levels=6, batch=8)
    print(f"\npredicted 8x64K 6-level round-trip: "
          f"{pred.estimated_seconds * 1e3:.2f} ms "
          f"[{pred.lower_seconds * 1e3:.2f}, {pred.upper_seconds * 1e3:.2f}] "
          f"(calibrated={pred.calibrated})")

    # --- calibrate: measure this device, persist the sustained rate ------
    rate = cost_model.calibrate(sizes=(16384,), batch=4, persist=True)
    print(f"calibrated sustained rate: {rate / 1e6:.1f} Msamples/s")

    pred2 = cost_model.estimate_processing_time(65536, levels=6, batch=8)
    print(f"after calibration: {pred2.estimated_seconds * 1e3:.2f} ms "
          f"[{pred2.lower_seconds * 1e3:.2f}, {pred2.upper_seconds * 1e3:.2f}] "
          f"(calibrated={pred2.calibrated})")

    # --- FFT-vs-unrolled routing (the FftHeuristics counterpart) ---------
    # The measured on-chip crossover favors the unrolled à trous form for
    # every builtin filter; FFT wins only for >=64-tap custom filters.
    print("\nFFT routing decisions (filter taps -> use FFT?):")
    for name in ("db4", "sym8", "dmey"):
        taps = len(wavelet(name).dec_lo)
        print(f"  {name:<5} ({taps:>2} taps, N=65536): "
              f"{should_use_fft(65536, taps)}")
    print(f"  custom 96-tap filter, N=65536: {should_use_fft(65536, 96)}")


if __name__ == "__main__":
    main()
