"""SWT workflows: transform, thresholding, level extraction, MRA.

Counterpart of the reference's SWTDemo and SWTBestPracticesDemo
(vectorwave-examples/.../SWTDemo.java, SWTBestPracticesDemo.java): the
shift-invariant transform as a denoising and analysis tool, with the
best-practice rules — universal threshold for quick cleanup, per-level
thresholds for control, MRA when you need additive components.
Run: python examples/swt_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from vectorwave_tpu.transforms.swt import (
    apply_universal_threshold,
    extract_level,
    iswt,
    mra,
    swt,
    swt_denoise,
    threshold_level,
)

N, LEVELS = 1024, 4


def main() -> None:
    rng = np.random.default_rng(3)
    t = np.arange(N) / N
    clean = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 40 * t)
    noisy = clean + rng.normal(0.0, 0.35, N)
    x = jnp.asarray(noisy)

    # 1. Round trip: SWT is shift-invariant and perfectly invertible.
    res = swt(x, "db4", levels=LEVELS)
    xr = iswt(res, "db4")
    print(f"round-trip max error: {float(jnp.max(jnp.abs(xr - x))):.2e}")

    # 2. Quick cleanup: one universal threshold across all levels.
    den = iswt(apply_universal_threshold(res, mode="soft"), "db4")
    rmse = float(jnp.sqrt(jnp.mean((den - clean) ** 2)))
    print(f"universal-threshold denoise RMSE vs clean: {rmse:.4f}")

    # 3. Fine control: threshold only the two finest (noisiest) levels.
    shaped = res
    for lvl in (1, 2):
        shaped = threshold_level(shaped, lvl, 0.8, mode="hard")
    print(f"selective-threshold RMSE: "
          f"{float(jnp.sqrt(jnp.mean((iswt(shaped, 'db4') - clean) ** 2))):.4f}")

    # 4. One-call facade (the reference's denoise(signal, wavelet, levels)).
    one_call = swt_denoise(x, "db4", levels=LEVELS, mode="soft")
    print(f"swt_denoise RMSE: {float(jnp.sqrt(jnp.mean((one_call - clean) ** 2))):.4f}")

    # 5. Analysis: isolate one scale band / additive MRA components.
    d2 = extract_level(x, "db4", LEVELS, 2)
    comps = mra(x, "db4", levels=LEVELS)
    recon = sum(comps)
    print(f"level-2 band energy: {float(jnp.sum(d2 ** 2)):.2f}")
    print(f"MRA components: {len(comps)}, additive residual "
          f"{float(jnp.max(jnp.abs(recon - x))):.2e}")


if __name__ == "__main__":
    main()
