"""Basic MODWT / SWT / CWT usage.

Counterpart of the reference's vectorwave-examples Main.java walkthrough.
Run: python examples/basic_transforms.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(0)
    t = np.arange(2048)
    signal = np.sin(2 * np.pi * t / 64) + 0.3 * rng.standard_normal(len(t))
    x = jnp.asarray(signal, dtype=jnp.float32)

    # --- single-level MODWT: shift-invariant, any length -------------------
    res = vw.modwt(x, "db4")
    xr = vw.imodwt(res, "db4")
    print(f"single-level round-trip error: {float(jnp.max(jnp.abs(x - xr))):.2e}")

    # --- multi-level decomposition with energy summary ---------------------
    levels = vw.max_levels(len(t), "db4")
    multi = vw.modwt_multilevel(x, "db4", levels=min(levels, 6))
    dist = np.asarray(multi.relative_energy_distribution())
    for j, frac in enumerate(dist[:-1], start=1):
        print(f"  level {j} detail energy: {frac:6.1%}")
    print(f"  approximation energy:  {dist[-1]:6.1%}")

    # --- SWT band extraction ----------------------------------------------
    band = vw.extract_level(x, "sym8", 4, target_level=2)
    print(f"level-2 band energy: {float((band**2).sum()):.2f}")

    # --- CWT scalogram -----------------------------------------------------
    scales = vw.scales_log(2, 128, 32)
    cwt_res = vw.cwt(x, scales, "morl")
    ridge = scales[int(np.argmax(np.asarray(cwt_res.magnitude()).mean(axis=-1)))]
    fc = vw.wavelet("morl").center_frequency
    print(f"dominant CWT scale {ridge:.1f} -> period {ridge / fc:.1f} samples "
          f"(true period 64)")

    # --- everything is jittable -------------------------------------------
    @jax.jit
    def pipeline(x):
        res = vw.modwt_multilevel(x, "db4", levels=5)
        return vw.imodwt_multilevel(res, "db4")

    print(f"jitted round-trip error: {float(jnp.max(jnp.abs(pipeline(x) - x))):.2e}")


if __name__ == "__main__":
    main()
