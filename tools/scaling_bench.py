"""Strong/weak scaling of the tiled + sharded-batch transforms on the
virtual CPU device mesh (the analogue of the reference's thread-scaling table,
/root/reference/docs/BENCHMARK-RESULTS.md:153-171).

Runs on CPU with 8 virtual devices and SINGLE-THREADED intra-op execution
(xla_cpu_multi_thread_eigen=false), so each device is one compute thread and
up to the physical core count the efficiency is a genuine parallel-scaling
measurement; beyond it, an overhead measurement (documented in the output).

Writes SCALING.md + prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # one thread per virtual device: without this a SINGLE XLA CPU device
    # already uses every core via intra-op (eigen) threading, and the
    # "scaling" baseline is silently multi-threaded
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_multi_thread_eigen=false"
    )
    os.environ["OMP_NUM_THREADS"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vectorwave_tpu.parallel import (
    make_mesh,
    modwt2_multilevel_tiled,
    modwt_multilevel_tiled,
)
from vectorwave_tpu.parallel.batch import modwt_multilevel_sharded_batch

WAVELET = "db4"
LEVELS = 6


def _time(fn, *args, reps=7):
    jitted = jax.jit(fn)
    out = jitted(*args)  # compile + warm (eager shard_map would otherwise
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)  # re-trace
    times = []                                                    # per call)
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    # MIN, not median: host-scheduler interference on the shared 4-core
    # box only ever ADDS time (2-dev weak efficiency swung 0.45-0.84
    # across identical runs at median); the minimum is the contention-
    # robust statistic for a deterministic program
    return float(min(times))


def bench_tiled(n_devices: int, n: int) -> float:
    mesh = make_mesh({"signal": n_devices})
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), dtype=jnp.float32
    )

    def run(x):
        res = modwt_multilevel_tiled(
            x, WAVELET, levels=LEVELS, mesh=mesh, boundary="periodic"
        )
        return res.approx

    return _time(run, x)


def bench_tiled2d(n_devices: int, rows_per: int, w_dim: int) -> float:
    """2-D MODWT tiled along image rows (weak scaling: rows/device
    constant)."""
    mesh = make_mesh({"rows": n_devices})
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((n_devices * rows_per, w_dim)), jnp.float32
    )

    def run(v):
        res = modwt2_multilevel_tiled(
            v, WAVELET, levels=3, mesh=mesh, boundary="periodic"
        )
        return res.approx

    return _time(run, x)


def bench_tiled_nocomm(n_devices: int, n: int) -> float:
    """CONTROL: the tiled jnp path's exact per-shard compute (cumulative
    zero-extended cascade) with the halo replaced by local zeros — zero
    collectives, identical FLOPs.  full - control = collective + sync
    cost, separated from CPU contention (which hits both equally)."""
    from jax.sharding import PartitionSpec as P

    from vectorwave_tpu.parallel.tiled import (
        _INV_SQRT2,
        atrous_analysis_pair,
    )
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    mesh = make_mesh({"signal": n_devices})
    w = _resolve_discrete(WAVELET)
    low = w.dec_lo * _INV_SQRT2
    high = w.dec_hi * _INV_SQRT2
    span = (w.filter_length - 1) * ((1 << LEVELS) - 1)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(n), dtype=jnp.float32
    )

    def shard_fn(xl):
        n_loc = xl.shape[-1]
        cur = jnp.concatenate(
            [jnp.zeros(xl.shape[:-1] + (span,), xl.dtype), xl], axis=-1
        )
        details = []
        for level in range(1, LEVELS + 1):
            cur, d = atrous_analysis_pair(
                cur, low, high, spacing=1 << (level - 1), boundary="zero"
            )
            details.append(d[..., -n_loc:])
        return tuple(details), cur[..., -n_loc:]

    spec = P("signal")
    fn = jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(spec,),
        out_specs=(tuple(spec for _ in range(LEVELS)), spec),
    )
    x = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, spec)
    )
    return _time(lambda v: fn(v)[1], x)


def bench_batch(n_devices: int, batch: int, n: int) -> float:
    mesh = make_mesh({"data": n_devices})
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((batch, n)), dtype=jnp.float32
    )

    def run(x):
        res = modwt_multilevel_sharded_batch(
            x, WAVELET, levels=LEVELS, mesh=mesh, axis="data"
        )
        return res.approx

    return _time(run, x)


def bench_multihost(hosts: int, chips: int, batch: int, n: int) -> float:
    """Per-transform time of the ("host","chip") facade: batch over hosts,
    signal tiled over chips (DCN-free layout)."""
    from vectorwave_tpu.parallel import make_multihost_mesh, modwt_multilevel_multihost

    mesh = make_multihost_mesh(n_hosts=hosts, chips_per_host=chips)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, n)), dtype=jnp.float32
    )

    def run(v):
        res = modwt_multilevel_multihost(v, WAVELET, levels=LEVELS, mesh=mesh)
        return res.approx

    return _time(run, x)


def bench_cwt_2d(hosts: int, chips: int, n_scales: int, n: int) -> float:
    """CWT multihost layout: scales over hosts, signal over chips."""
    from vectorwave_tpu.parallel import cwt_tiled_2d, make_multihost_mesh

    mesh = make_multihost_mesh(n_hosts=hosts, chips_per_host=chips)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), dtype=jnp.float32)
    scales = tuple(2.0 * 2 ** (4 * i / max(1, n_scales - 1)) for i in range(n_scales))

    def run(v):
        return cwt_tiled_2d(v, scales, "morl", mesh=mesh).coeffs

    return _time(run, x)


def main() -> None:
    cores = os.cpu_count() or 1
    devices = [1, 2, 4, 8]
    n_strong = 1 << 23  # 8M samples, fixed (strong scaling)
    n_weak_per = 1 << 20  # per-device (weak scaling)
    batch_strong = 64

    strong, weak, batch_rows = {}, {}, {}
    for p in devices:
        strong[p] = bench_tiled(p, n_strong)
        weak[p] = bench_tiled(p, n_weak_per * p)
        batch_rows[p] = bench_batch(p, batch_strong, 1 << 14)

    nocomm = {p: bench_tiled_nocomm(p, n_weak_per * p) for p in devices}

    tiled2d = {p: bench_tiled2d(p, 128, 512) for p in devices}

    # multihost weak scaling: per-host work constant, hosts double
    mh = {h: bench_multihost(h, 4, 8 * h, 1 << 19) for h in (1, 2)}
    mh_cwt = {h: bench_cwt_2d(h, 4, 8 * h, 1 << 19) for h in (1, 2)}

    def eff_strong(t1, tp, p):
        return t1 / (p * tp)

    lines = [
        "# Scaling",
        "",
        "## Tiled path on real TPU silicon (1-device mesh)",
        "",
        "The distributed tier's shard-local compute routes through the",
        "composite MXU kernel (one cumulative-halo exchange per direction,",
        "then a zero-boundary kernel call on the extended shard —",
        "`parallel/tiled.py`).  On the real chip this is a DRIVER ARTIFACT",
        "row: `BENCH_FULL_r04.json` \"tiled 1-dev mesh roundtrip 128x64K",
        "db4 6-level\" runs within ~5% of the plain composite kernel",
        "(outputs bitwise identical; reproduce with",
        "tools/probe_tiled_chip.py).  The EXACT (<=1e-10) tier also runs",
        "sharded (`modwt_multilevel_tiled_exact`) and is asserted <=1e-10",
        "by `dryrun_multichip` on every driver run.  2-D images shard the",
        "same way (`parallel/tiled2d.py`, one cumulative-span row-slab",
        "exchange; weak-scaling table below).",
        "",
        "A TRUE 2-process run (jax.distributed + Gloo, separate OS",
        "processes, 2x4 virtual devices) reproduces the DCN-free layout",
        "end to end: tools/multiproc_dcn_check.py.",
        "",
        "# Scaling on the virtual CPU device mesh",
        "",
        f"Host: {cores} physical cores; mesh uses up to 8 XLA CPU devices "
        "(one compute thread each).  Efficiency beyond the physical core "
        "count measures sharding/collective overhead, not parallel speedup — "
        "the honest scaling window here is <= "
        f"{cores} devices.  Config: {WAVELET} {LEVELS}-level tiled MODWT "
        "(ppermute halo exchange per level).",
        "",
        "## Strong scaling — 8M-sample signal tiled across devices",
        "",
        "| devices | time (ms) | speedup | efficiency |",
        "|---|---|---|---|",
    ]
    for p in devices:
        lines.append(
            f"| {p} | {strong[p]*1e3:.2f} | {strong[1]/strong[p]:.2f}x | "
            f"{eff_strong(strong[1], strong[p], p):.2f} |"
        )
    lines += [
        "",
        "## Weak scaling — 1M samples per device",
        "",
        "| devices | total samples | time (ms) | efficiency |",
        "|---|---|---|---|",
    ]
    for p in devices:
        lines.append(
            f"| {p} | {n_weak_per*p} | {weak[p]*1e3:.2f} | "
            f"{weak[1]/weak[p]:.2f} |"
        )
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    w0 = _resolve_discrete(WAVELET)
    span = (w0.filter_length - 1) * ((1 << LEVELS) - 1)
    lines += [
        "",
        "## Collective cost decomposition (weak rows, 1M samples/device)",
        "",
        "Bytes/hops model (analysis direction): the jnp tiled path now",
        "exchanges ONE cumulative raw-x halo of span = (L0-1)(2^J-1) ="
        f" {span} samples ({span*4} B/boundary f32) in ceil(span/n_loc)",
        "ppermute hops (1 here), identical to the kernel path — previously",
        "J per-level exchanges moved the SAME total bytes across J sync",
        "points.  (Synthesis keeps per-level halos: 2 per level totaling",
        f"~{2*span*4} B/boundary; the kernel synthesis instead ships all",
        f"J+1 plane tails of span at once, {(LEVELS+1)*span*4} B/boundary —",
        "3.5x the bytes for 1/(2J) the sync points; on ICI, sync dominates",
        "at these halo sizes, so both choices are documented and the",
        "kernel path keeps the single exchange.)  Against 1M samples/device",
        f"of local compute, {span*4} B over ICI (~45 GB/s/link) is ~40 ns —",
        "the model predicts ZERO measurable collective cost on real chips;",
        "any virtual-mesh loss below is executor sync, not bytes.",
        "",
        "Measured control: the SAME per-shard compute with the halo",
        "replaced by local zeros (no collectives at all,",
        "tools/scaling_bench.bench_tiled_nocomm):",
        "",
        "| devices | tiled (ms) | no-comm control (ms) | collective+sync share |",
        "|---|---|---|---|",
    ] + [
        f"| {p} | {weak[p]*1e3:.2f} | {nocomm[p]*1e3:.2f} | "
        f"{max(0.0, 1 - nocomm[p]/weak[p]):.0%} |"
        for p in devices
    ] + [
        "",
        "The residual weak-scaling loss in the no-comm control is host",
        "contention (shared DRAM + 4 physical cores), which will not",
        "transfer to real multi-chip hardware; the collective+sync share",
        "is the part the sharding design owns.  Run-to-run NOTE: the",
        "2-device weak efficiency swings 0.45-0.84 across identical",
        "min-of-7 runs of this script (background harness load on the",
        "shared box); the control RATIO above is the stable, meaningful",
        "statistic — the analytic bytes model (~40 ns of ICI time per",
        "boundary) is what transfers to silicon.",
    ]

    lines += [
        "",
        "## 2-D tiled weak scaling — 128 image rows x 512 per device",
        "",
        "| devices | image | time (ms) | efficiency |",
        "|---|---|---|---|",
    ]
    for p in devices:
        lines.append(
            f"| {p} | {128*p}x512 | {tiled2d[p]*1e3:.2f} | "
            f"{tiled2d[1]/tiled2d[p]:.2f} |"
        )
    lines += [
        "",
        "At 128 rows/device the db4 J=3 cumulative halo (49 rows) is a 38%",
        "per-shard overcompute — production shards should be several times",
        "the composite span (the halo cost amortizes as rows/device grow).",
        "",
        f"## Batch sharding — {batch_strong} x 16K signals over the data axis",
        "",
        "| devices | time (ms) | speedup | efficiency |",
        "|---|---|---|---|",
    ]
    for p in devices:
        lines.append(
            f"| {p} | {batch_rows[p]*1e3:.2f} | "
            f"{batch_rows[1]/batch_rows[p]:.2f}x | "
            f"{eff_strong(batch_rows[1], batch_rows[p], p):.2f} |"
        )
    lines += [
        "",
        "## Multihost weak scaling — (host, chip) mesh, per-host work constant",
        "",
        "DCN-free layouts (batch/scales over the host axis): doubling hosts "
        "doubles total work with ZERO extra transform communication, so ideal "
        "weak efficiency is 1.0.",
        "",
        "| layout | 1x4 (ms) | 2x4 (ms) | weak efficiency |",
        "|---|---|---|---|",
        f"| MODWT batch x host, signal x chip (8/host x 512K) | "
        f"{mh[1]*1e3:.2f} | {mh[2]*1e3:.2f} | {mh[1]/mh[2]:.2f} |",
        f"| CWT scales x host, signal x chip (8 scales/host, 512K) | "
        f"{mh_cwt[1]*1e3:.2f} | {mh_cwt[2]*1e3:.2f} | "
        f"{mh_cwt[1]/mh_cwt[2]:.2f} |",
        "",
        "On this host the 2x4 run oversubscribes the physical cores, so "
        "the compute-ideal weak efficiency is 0.5; measured values near "
        "0.5 mean the host axis adds no communication cost at all.  The "
        "zero-DCN property is also verified structurally: the partitioned "
        "HLO's collective-permutes never cross host rows "
        "(tests/test_parallel.py::test_multihost_collectives_stay_on_ici).",
    ]

    lines += [
        "",
        "Caveats, measured: (1) the virtual devices share ONE socket and "
        "memory controller: the 8M-sample strong-scaling baseline is DRAM-"
        "bandwidth-bound on a single device (8x the data of the 1M weak row "
        "costs 16.8x the time), so adding devices divides compute but NOT "
        "memory bandwidth — the table's ceiling is the host's shared DRAM, "
        "a limit real TPU chips (private HBM per chip) do not share.  "
        "(2) a CONTROL experiment (trivial sharded tanh+matmul, no "
        "communication at all) shows the same flat/anti scaling for the "
        "batch rows on this runtime's virtual-device executor — XLA:CPU "
        "dispatches per-device programs with overhead comparable to the "
        "work itself at these sizes, so the batch rows measure the "
        "executor, not the sharding design (the batch transform has zero "
        "collectives by construction; its partitioned HLO contains no "
        "communication ops).  (3) The sharding design itself is verified "
        "structurally, not by these timings: halo ppermutes move exactly "
        "the modeled bytes (parallel/multihost.communication_report) and "
        "never cross host rows "
        "(tests/test_parallel.py::test_multihost_collectives_stay_on_ici).  "
        "On real multi-chip TPU hardware the halo exchange is "
        "(L0-1)*2^(j-1) samples/boundary/level over ICI (~bytes) against "
        "O(N/P) local compute in private HBM; the CPU numbers are a lower "
        "bound on TPU scaling efficiency.",
        "",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as f:
        f.write("\n".join(lines))

    honest = min(cores, 4)
    print(
        json.dumps(
            {
                "strong_eff_at_4dev": round(eff_strong(strong[1], strong[4], 4), 3),
                "strong_eff_at_8dev": round(eff_strong(strong[1], strong[8], 8), 3),
                "weak_eff_at_4dev": round(weak[1] / weak[4], 3),
                "batch_eff_at_4dev": round(
                    eff_strong(batch_rows[1], batch_rows[4], 4), 3
                ),
                "multihost_weak_eff_2hosts": round(mh[1] / mh[2], 3),
                "multihost_cwt_weak_eff_2hosts": round(mh_cwt[1] / mh_cwt[2], 3),
                "physical_cores": cores,
                "honest_window_devices": honest,
            }
        )
    )


if __name__ == "__main__":
    main()
