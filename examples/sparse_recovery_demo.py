"""Sparse recovery: inpainting, iterative denoising, compressed sensing.

Three inverse problems solved by the same engine — FISTA over the MODWT
tight frame (`vectorwave_tpu.optimize`), entirely on device:

1. inpaint: restore 40% missing samples of a smooth signal,
2. bpdn: iterative L1 denoising that out-cleans the one-shot threshold,
3. sparse_recover: rebuild a wavelet-sparse signal from 2x undersampled
   random projections (compressed sensing).
Run: python examples/sparse_recovery_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax.numpy as jnp
import jax.tree_util as jtu

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(0)
    n = 512
    t = np.linspace(0, 1, n, endpoint=False)
    clean = np.sin(2 * np.pi * 5 * t) + 0.5 * np.sin(2 * np.pi * 13 * t + 0.7)

    # --- 1. inpainting ------------------------------------------------------
    mask = (rng.random(n) > 0.4).astype(np.float32)  # 1 = observed
    y = jnp.asarray(clean * mask, jnp.float32)
    filled = np.asarray(vw.inpaint(y, jnp.asarray(mask), "db8", steps=200))
    miss = mask == 0
    rel = np.sqrt(np.mean((filled[miss] - clean[miss]) ** 2)) / np.std(clean)
    print(f"inpaint: {int(miss.sum())}/{n} samples missing, "
          f"relative RMSE on the gaps = {rel:.3f}")

    # --- 2. iterative denoising (BPDN) vs one-shot threshold ----------------
    noisy = clean + 0.3 * np.random.default_rng(0).standard_normal(n)
    yn = jnp.asarray(noisy, jnp.float32)
    mse_in = np.mean((noisy - clean) ** 2)
    one_shot = np.asarray(vw.denoise(yn, "db8"))
    res = vw.bpdn(yn, "db8", steps=100)
    for label, est in [("one-shot", one_shot), ("bpdn", np.asarray(res.signal))]:
        gain = 10 * np.log10(mse_in / np.mean((est - clean) ** 2))
        print(f"denoise [{label:8s}]: SNR gain {gain:+.2f} dB")

    # --- 3. compressed sensing ----------------------------------------------
    # Build a signal that is genuinely sparse in the db4 MODWT frame...
    zero_c = vw.modwt_multilevel(jnp.zeros(n), "db4", levels=4)
    leaves, treedef = jtu.tree_flatten(zero_c)
    sparse = []
    for k in range(len(leaves)):
        v = np.zeros(n, np.float32)
        if k < 2:
            v[rng.choice(n, 3, replace=False)] = 2.0 * rng.standard_normal(3)
        sparse.append(jnp.asarray(v))
    x_true = vw.imodwt_multilevel(jtu.tree_unflatten(treedef, sparse), "db4")

    # ...measure it with m = n/2 Gaussian projections, and recover.
    m = n // 2
    a_mat = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32)
                        / np.sqrt(m))
    forward = lambda x: a_mat @ x
    rec = vw.sparse_recover(forward(x_true), forward, "db4",
                            signal_shape=(n,), lam=1e-4, lam_init=1.0,
                            steps=400, levels=4)
    rel = float(jnp.linalg.norm(rec.signal - x_true)
                / jnp.linalg.norm(x_true))
    print(f"compressed sensing: {m} measurements for {n} samples, "
          f"relative error = {rel:.3f}")


if __name__ == "__main__":
    main()
