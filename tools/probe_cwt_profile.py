"""Per-op device-time profile of the cfg5 CWT (morl, 64 scales, 1M, periodic)."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import vectorwave_tpu as vw

N = 1 << 20
SCALES = tuple(np.geomspace(2.0, 4096.0, 64).tolist())


def fn(x):
    res = vw.cwt(x, SCALES, "morl", boundary="periodic")
    return 1e-3 * res.coeffs.sum(axis=-2).astype(x.dtype) + x


@jax.jit
def chain(x):
    return jax.lax.fori_loop(0, 10, lambda _, z: fn(z), x)


def main():
    cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(N), dtype=jnp.float32)
    np.asarray(chain(x0)[:4])  # warm

    logdir = "/tmp/cwt_prof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        np.asarray(chain(x0)[:4])

    # parse the trace: sum device-time per op name
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only TPU device lanes (pid names containing 'TPU' / 'Device')
    names = {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    per_op = {}
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + e["dur"]
        total += e["dur"]
    print(f"pids seen: {sorted(set(names.values()))[:8]}", flush=True)
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3/10:9.3f} ms/iter  {dur/total*100:5.1f}%  {name[:110]}",
              flush=True)
    print(f"total device: {total/1e3/10:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
