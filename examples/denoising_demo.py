"""Wavelet denoising: batch and streaming.

Counterpart of the reference's denoising demos (vectorwave-examples demo/*).
Run: python examples/denoising_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw
from vectorwave_tpu.streaming import StreamingDenoiser


def main() -> None:
    rng = np.random.default_rng(1)
    t = np.arange(4096)
    clean = np.sin(2 * np.pi * t / 128) + 0.5 * np.sin(2 * np.pi * t / 32)
    noisy = clean + rng.normal(0, 0.8, len(t))
    x = jnp.asarray(noisy)

    def snr(den):
        return 10 * np.log10(np.var(clean) / np.mean((np.asarray(den) - clean) ** 2))

    print(f"input SNR: {snr(noisy):5.1f} dB")
    for method in ("universal", "sure", "minimax", "bayes"):
        den = vw.denoise_multilevel(x, "sym8", levels=5, method=method)
        print(f"  {method:9s}: {snr(den):5.1f} dB")

    # streaming: 256-sample blocks with running MAD noise tracking
    denoiser = StreamingDenoiser("db4", implementation="quality")
    blocks = [denoiser.denoise(noisy[i : i + 256]) for i in range(0, len(t), 256)]
    streamed = np.concatenate([np.asarray(b) for b in blocks])
    print(f"  streaming: {snr(streamed):5.1f} dB  ({denoiser.statistics})")


if __name__ == "__main__":
    main()
