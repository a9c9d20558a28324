"""On-TPU smoke: compiled Pallas tier vs jnp parity at real shapes.

The CI suite exercises the kernels in interpreter mode on CPU; this is the
committed on-silicon check (VERDICT round-1 ask).  Run from a foreground
shell: python tools/tpu_smoke.py — prints one JSON line, exit 1 on failure.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vectorwave_tpu_jax"),
    )
    import vectorwave_tpu as vw
    from vectorwave_tpu.kernels import fused_analysis, fused_synthesis

    if jax.devices()[0].platform == "cpu":
        print(json.dumps({"ok": False, "reason": "no TPU backend"}))
        return 1

    rng = np.random.default_rng(0)
    checks = {}
    ok = True

    def record(name, dev, tol):
        nonlocal ok
        checks[name] = {"dev": float(dev), "tol": tol, "ok": bool(dev < tol)}
        ok = ok and dev < tol

    # parity vs jnp on chip, f32 precision, all three boundaries
    x = jnp.asarray(rng.standard_normal((4, 16384)), dtype=jnp.float32)
    for boundary in ("periodic", "zero", "symmetric"):
        d, a = fused_analysis(
            x, "db4", levels=5, boundary=boundary, precision="float32"
        )
        ref = vw.modwt_multilevel(x, "db4", levels=5, boundary=boundary,
                                  backend="jnp")
        dev = max(
            float(jnp.max(jnp.abs(dd - rr))) for dd, rr in zip(d, ref.details)
        )
        dev = max(dev, float(jnp.max(jnp.abs(a - ref.approx))))
        record(f"analysis_{boundary}", dev, 5e-5)

    # synthesis + roundtrip, periodic, odd N (arbitrary-N path)
    y = jnp.asarray(rng.standard_normal((2, 100_000)), dtype=jnp.float32)
    d, a = fused_analysis(y, "sym8", levels=4, boundary="periodic",
                          precision="float32")
    yr = fused_synthesis(d, a, "sym8", boundary="periodic", precision="float32")
    record("roundtrip_oddN_sym8", float(jnp.max(jnp.abs(yr - y))), 5e-5)

    # precision ladder sanity
    for precision, tol in (("bf16_3x", 5e-4), ("bf16", 5e-2)):
        d, a = fused_analysis(x, "db4", levels=5, precision=precision)
        xr = fused_synthesis(d, a, "db4", precision=precision)
        record(f"roundtrip_{precision}", float(jnp.max(jnp.abs(xr - x))), tol)

    checks["ok"] = ok
    print(json.dumps(checks))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
