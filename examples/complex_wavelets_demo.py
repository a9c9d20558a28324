"""Complex continuous wavelets: phase, instantaneous frequency, ridges.

Counterpart of the reference's ComplexGaussianFixDemo and the
analyzeComplex CWT path (vectorwave-examples/.../ComplexGaussianFixDemo.java,
CWTTransform.analyzeComplex): complex Gaussian (cgau) and Morlet
transforms carry phase, so a chirp's instantaneous frequency can be read
off the transform ridge.  Run: python examples/complex_wavelets_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from vectorwave_tpu.transforms.cwt import cwt, scale_to_frequency, scales_log
from vectorwave_tpu.wavelets.registry import wavelet

N = 2048


def main() -> None:
    # Linear chirp: frequency sweeps 0.01 -> 0.08 cycles/sample.
    t = np.arange(N)
    f0, f1 = 0.01, 0.08
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t**2 / (2 * N))
    x = jnp.asarray(np.sin(phase))
    true_freq = f0 + (f1 - f0) * t / N

    # cgau filters are intrinsically complex — the result carries phase.
    w = wavelet("cgau4")
    print(f"{w.name}: complex-valued={w.is_complex}, center freq "
          f"{w.center_frequency:.3f}")

    scales = scales_log(4.0, 64.0, 48)
    res = cwt(x, scales, "cgau4", boundary="zero")
    assert jnp.iscomplexobj(res.coeffs)

    # Ridge = argmax |W(scale, t)| per time; map scale -> frequency.
    mag = np.asarray(res.magnitude())
    ridge = mag.argmax(axis=0)
    freqs = np.array([scale_to_frequency(s, "cgau4") for s in scales])
    est = freqs[ridge]
    sl = slice(N // 8, -N // 8)  # ignore cone-of-influence edges
    err = np.median(np.abs(est[sl] - true_freq[sl]) / true_freq[sl])
    print(f"chirp ridge tracking, median relative error: {err:.1%}")

    # Real wavelets gain phase through the analytic (Hilbert) path.
    res_m = cwt(x, scales, "morl", analytic=True)
    dphi = np.unwrap(np.asarray(res_m.phase()), axis=1)
    inst = np.take_along_axis(
        np.diff(dphi, axis=1) / (2 * np.pi), ridge[None, :-1], axis=0
    )[0]
    sl2 = slice(N // 8, N - N // 8 - 1)
    err_m = np.median(np.abs(inst[sl2] - true_freq[sl2]) / true_freq[sl2])
    print(f"analytic-Morlet instantaneous frequency, median error: {err_m:.1%}")


if __name__ == "__main__":
    main()
