"""Wavelet packets: full-tree analysis, best basis, packet-domain denoising.

Beyond-reference capability (VectorWave has no packet transforms): the
binary filter-bank tree refines the HIGH-frequency side too, so narrowband
structure that MODWT lumps into one detail level gets its own node.

Run: python examples/wavelet_packets_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    rng = np.random.default_rng(4)
    n = 1024
    t = np.arange(n)
    # two narrowband tones, one in a HIGH band where plain MODWT cannot separate
    sig = np.sin(2 * np.pi * 0.071 * t) + 0.8 * np.sin(2 * np.pi * 0.41 * t)
    x = jnp.asarray(sig + 0.25 * rng.standard_normal(n))

    # --- full undecimated tree, frequency-ordered energy map ---------------
    depth = 4
    tree = vw.modwpt(x, "sym8", depth)
    energies = np.asarray(tree.energy_map())[vw.frequency_order(depth)]
    bands = vw.packet_frequency_bands(depth)[vw.frequency_order(depth)]
    print(f"depth-{depth} MODWPT, {len(energies)} leaves (frequency order):")
    top = np.argsort(energies)[::-1][:3]
    for i in sorted(top):
        print(f"  band [{bands[i][0]:.3f}, {bands[i][1]:.3f}) cycles/sample: "
              f"energy {energies[i]:.1f}")
    # energy is preserved at every depth (tight frame)
    print(f"energy check: leaves {float(energies.sum()):.3f} "
          f"vs signal {float((x ** 2).sum()):.3f}")

    # --- best basis adapts the tiling to the signal ------------------------
    basis = vw.best_basis(tree, cost="shannon")
    print(f"\nbest basis: {len(basis)} nodes "
          f"(vs {1 << depth} leaves / 1 root): {list(basis)[:6]} ...")
    xr = vw.reconstruct_basis(tree, basis, "sym8")
    print(f"best-basis reconstruction max err: "
          f"{float(jnp.max(jnp.abs(xr - x))):.2e}")

    # --- packet-domain denoising via the node-editing hook -----------------
    sigma = 0.25
    thr = sigma * float(np.sqrt(2 * np.log(n)))

    def soft(level, idx, c):
        return jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr * 2.0 ** (-level / 2), 0.0)

    den = vw.reconstruct_basis(tree, [(depth, i) for i in range(1 << depth)],
                               "sym8", transform_nodes=soft)
    clean = jnp.asarray(sig)
    mse_in = float(((x - clean) ** 2).mean())
    mse_out = float(((den - clean) ** 2).mean())
    print(f"\npacket-domain soft threshold: noise MSE {mse_in:.4f} -> {mse_out:.4f}")

    # the packaged best-basis denoiser does this in one call (and estimates
    # sigma from the noise floor across deepest-level nodes)
    auto = vw.denoise_packet(x, "sym8", depth)
    print(f"denoise_packet: MSE {float(((auto - clean) ** 2).mean()):.4f} "
          f"(MODWT denoiser on the same signal: "
          f"{float(((vw.denoise_multilevel(x, 'sym8', levels=depth) - clean) ** 2).mean()):.4f})")

    # --- decimated WPT round trip ------------------------------------------
    dt = vw.wpt(x, "db4", 3)
    print(f"\ndecimated WPT leaf block: {dt.leaves.shape} "
          f"(8 bands x {n // 8} coeffs), round-trip err "
          f"{float(jnp.max(jnp.abs(vw.iwpt(dt, 'db4') - x))):.2e}")


if __name__ == "__main__":
    main()
