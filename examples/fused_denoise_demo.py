"""One-pass fused denoise: the coefficient planes never touch HBM.

``denoise_multilevel`` with a sigma-only rule (universal/minimax) routes
through a single Pallas kernel that does analysis -> per-level soft/hard
threshold -> synthesis with every coefficient plane resident in VMEM —
8 B/sample of HBM traffic instead of the materializing path's 68 (see
tools/probe_write_wall.py for why that traffic is the round trip's wall).
The noise floor still comes from the exact MAD of the finest detail,
computed with the sort-free bitwise order-statistic median.

Gradients work end to end (custom VJP; the median has an exact custom
JVP), so the denoiser can sit inside a training loss.

Run: python examples/fused_denoise_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(7)
    t = np.arange(8192)
    clean = np.sin(2 * np.pi * t / 256) + 0.4 * np.sin(2 * np.pi * t / 48)
    noisy = (clean + rng.normal(0, 0.6, len(t))).astype(np.float32)
    x = jnp.asarray(noisy)

    # the router picks the fused kernel automatically on a TPU backend;
    # force it here so the demo exercises the same path everywhere
    vw.set_backend("pallas")
    try:
        den = vw.denoise_multilevel(x, "db4", levels=5, method="universal",
                                    mode="soft")
        snr_in = 10 * np.log10(np.var(clean) / np.var(noisy - clean))
        snr_out = 10 * np.log10(
            np.var(clean) / np.mean((np.asarray(den) - clean) ** 2)
        )
        print(f"fused one-pass denoise: {snr_in:5.1f} dB -> {snr_out:5.1f} dB")

        # differentiable: gradient of a denoised-output loss w.r.t. input
        def loss(y):
            return jnp.mean(
                vw.denoise_multilevel(y, "db4", levels=5,
                                      method="universal", mode="soft") ** 2
            )

        g = jax.grad(loss)(x)
        print(f"grad through the fused kernel: shape {g.shape}, "
              f"|g| max {float(jnp.max(jnp.abs(g))):.3e}")
    finally:
        vw.set_backend("auto")

    # batch throughput shape: every signal denoised in one kernel sweep
    xb = jnp.asarray(rng.standard_normal((16, 8192)), jnp.float32)
    den_b = vw.denoise_multilevel(xb, "db4", levels=5, method="minimax",
                                  mode="hard")
    print(f"batched 16x8192 minimax-hard: output {den_b.shape}, "
          f"finite={bool(jnp.all(jnp.isfinite(den_b)))}")


if __name__ == "__main__":
    main()
