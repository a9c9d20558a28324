"""On-chip check that the tiled (shard_map) MODWT path runs shard-local
compute through the composite MXU kernel at the full single-chip rate.
SCALING.md cites this probe.  Run on the real TPU: python tools/probe_tiled_chip.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.makedirs(os.path.expanduser("~/.cache/vectorwave_tpu_jax"), exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/vectorwave_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
import vectorwave_tpu as vw
from vectorwave_tpu.parallel.tiled import (
    modwt_multilevel_tiled, imodwt_multilevel_tiled,
)

B, N, ITERS, LEVELS = 128, 65536, 100, 6
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
mesh = Mesh(np.array(jax.devices()[:1]), ("signal",))


def rt_tiled(z):
    res = modwt_multilevel_tiled(z, "db4", levels=LEVELS, mesh=mesh)
    return imodwt_multilevel_tiled(res, "db4", mesh=mesh)


def rt_plain(z):
    res = vw.modwt_multilevel(z, "db4", levels=LEVELS)
    return vw.imodwt_multilevel(res, "db4")


def measure(label, fn, iters=ITERS):
    @jax.jit
    def chain(z):
        return jax.lax.fori_loop(0, iters, lambda _, y: fn(y), z)

    np.asarray(chain(x)[0, :2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x)[0, :2])
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / iters * 1e3
    print(f"{label}: {ms:.3f} ms  {B*N/ms/1e3:.0f} Ms/s", flush=True)
    return ms

t_p = measure("plain composite 128x64K", rt_plain)
t_t = measure("tiled 1-dev mesh 128x64K", rt_tiled)
print(f"tiled/plain ratio: {t_t/t_p:.3f}", flush=True)
# parity
a = jax.jit(rt_tiled)(x[:2]); b = jax.jit(rt_plain)(x[:2])
print("tiled-vs-plain maxdiff:", float(jnp.max(jnp.abs(a - b))), flush=True)
