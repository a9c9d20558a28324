"""Padding strategies + adaptive selection.

Counterpart of the reference's padding demos (AdaptivePaddingDemo; 12
strategies in wavelet/padding/).  Run: python examples/padding_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    print(f"strategies: {', '.join(vw.PADDING_STRATEGIES)}")

    rng = np.random.default_rng(0)
    t = np.arange(300)

    # the adaptive chooser inspects smoothness/trend/periodicity
    cases = {
        "pure tone": np.sin(2 * np.pi * t / 25.0),
        "linear trend": 0.02 * t + 0.05 * rng.standard_normal(len(t)),
        "white noise": rng.standard_normal(len(t)),
    }
    for name, sig in cases.items():
        choice = vw.adaptive_strategy(sig)
        print(f"  adaptive choice for {name}: {choice}")

    # pad to a pow2 length with a few strategies and compare edge behavior
    x = np.sin(2 * np.pi * t / 40.0) + 0.1
    for strategy in ("zero", "symmetric", "periodic", "linear_extrapolation"):
        padded = np.asarray(vw.pad_signal(x, 512, strategy=strategy))
        print(
            f"  {strategy:22s}: len {len(padded)}, "
            f"edge continuity |x[299]-pad[300]| = "
            f"{abs(float(padded[300]) - x[-1]):.3f}"
        )


if __name__ == "__main__":
    main()
