"""Wavelet registry tour: families, generation quality, compatibility.

Counterpart of the reference's registry/family demos (WaveletRegistryDemo,
coefficient-verification examples).  Every filter here is GENERATED from its
defining equations (spectral factorization, Newton refinement, CDF splits,
Fourier sampling) — not hardcoded tables.
Run: python examples/registry_tour.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import vectorwave_tpu as vw


def main() -> None:
    names = vw.available_wavelets()
    print(f"registered wavelets: {len(names)}")
    for family in ("db", "sym", "coif", "bior", "rbio"):
        members = vw.wavelets_in_family(family)
        print(f"  {family}: {len(members)} members")

    # every discrete family satisfies perfect-reconstruction invariants
    worst = ("", 0.0)
    checked = 0
    for name in ("haar", "db8", "db20", "sym12", "coif5", "bior4.4", "dmey"):
        w = vw.wavelet(name)
        ok = w.validate_perfect_reconstruction()
        h = w.dec_lo
        err = abs(float(np.sum(h)) - np.sqrt(2.0))
        checked += 1
        if err > worst[1]:
            worst = (name, err)
        assert ok, name
    print(f"PR validation passed for {checked} families; "
          f"worst sum(h)-sqrt(2): {worst[0]} at {worst[1]:.2e}")

    # transform-compatibility matrix (WaveletRegistry.getSupportedTransforms)
    for name in ("db4", "morl", "bior2.2"):
        kinds = vw.supported_transforms(name)
        rec = vw.recommended_transform(name)
        print(f"  {name}: supports {sorted(k.name for k in kinds)}, "
              f"recommended {rec.name}")
    assert not vw.is_compatible("morl", vw.TransformType.MODWT)

    # register a custom wavelet and use it immediately
    from vectorwave_tpu.wavelets.base import orthogonal_wavelet

    taps = np.asarray(vw.wavelet("db2").dec_lo)  # reuse db2 taps for the demo
    vw.register_wavelet(
        "mydb2", lambda: orthogonal_wavelet("mydb2", "custom", taps, 2)
    )
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).standard_normal(256), jnp.float32)
    res = vw.modwt(x, "mydb2")
    ref = vw.modwt(x, "db2")
    dev = float(jnp.max(jnp.abs(res.detail - ref.detail)))
    print(f"custom-registered wavelet matches its source family: {dev:.1e}")


if __name__ == "__main__":
    main()
