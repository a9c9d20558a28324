"""Full benchmark parity table vs the reference's published rows.

Covers every row class of BASELINE.md (reference: 24-core CPU, GraalVM —
docs/BENCHMARK-RESULTS.md:22-107) on the real TPU chip, single-transform
latency shaped like the reference's JMH benchmarks.

Artifacts (VERDICT r02 item 6 — driver-grade perf evidence):

* ``BENCH_FULL_r{N}.json`` — every measured row (latency table, BASELINE
  configs, streaming, host ingest), written by this script.
* ``PERF.md`` — regenerated VERBATIM from that JSON plus ``BENCH_LATEST.json``
  (written by bench.py: precision ladder, HBM probe, MXU utilization) and
  ``BENCH_BEYOND.json`` (written by tools/perf_beyond.py: beyond-reference
  module rows).  No hand-edited numbers.

Round number: --round N, else 1 + the highest committed BENCH_r{NN}.json.

Timing: on-device fori_loop chains with enough iterations to amortize the
~30 ms tunnel dispatch overhead (see bench.py); every chained step consumes
all outputs so XLA cannot dead-code-eliminate half the transform.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _infer_round() -> int:
    rounds = [
        int(re.search(r"BENCH_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    ]
    return (max(rounds) + 1) if rounds else 1


def _measure_ms(fn, x0, iters, readback, reps=3):
    """Returns (median, min, max) ms/iter over ``reps`` chain runs — the
    range lets artifact diffs separate the documented ±15% chip-throughput
    swing from real regressions (VERDICT r04 #9)."""
    import jax

    @jax.jit
    def repeat(y):
        return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

    out = repeat(x0)
    readback(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = repeat(x0)
        readback(out)
        times.append(time.perf_counter() - t0)
    scale = 1e3 / iters
    return (float(np.median(times)) * scale, float(min(times)) * scale,
            float(max(times)) * scale)


def _hbm_bw_gbps() -> float:
    """Measured HBM bandwidth from the committed headline artifact."""
    try:
        with open(os.path.join(REPO, "BENCH_LATEST.json")) as f:
            return float(json.load(f).get("measured_hbm_gbps", 844.0))
    except Exception:  # noqa: BLE001
        return 844.0


def _cwt_floor_ms(n_scales: int, n: int) -> float:
    """HBM floor of a real-CWT synthesis: per scale, read the complex
    half-spectrum and write the real row (the probe's model,
    tools/probe_cwt_scales.py)."""
    per_scale = (n // 2 + 1) * 8 + n * 4
    return n_scales * per_scale / (_hbm_bw_gbps() * 1e9) * 1e3


def measure_all() -> dict:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vectorwave_tpu as vw
    from vectorwave_tpu.streaming import SlidingStreamingTransform, sliding_step

    device = jax.devices()[0]
    rng = np.random.default_rng(0)

    def sig(n, b=None):
        shape = (n,) if b is None else (b, n)
        return jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)

    rb1 = lambda o: np.asarray(o.reshape(-1)[:4])

    def fwd(wavelet):
        def fn(x):
            res = vw.modwt(x, wavelet, boundary="periodic")
            return res.approx + 1e-3 * res.detail

        return fn

    def ml(wavelet, levels):
        def fn(x):
            res = vw.modwt_multilevel(x, wavelet, levels=levels)
            acc = res.approx
            for d in res.details:
                acc = acc + 1e-3 * d
            return acc

        return fn

    def rt(wavelet, levels):
        def fn(x):
            res = vw.modwt_multilevel(x, wavelet, levels=levels)
            return vw.imodwt_multilevel(res, wavelet)

        return fn

    def dn(levels):
        def fn(x):
            return vw.denoise_multilevel(
                x, "db4", levels=levels, method="universal", mode="soft"
            )

        return fn

    def cwt_fn(scales):
        sc = tuple(np.geomspace(2.0, 64.0, scales).tolist())

        def fn(x):
            res = vw.cwt(x, sc, "morl")
            return 1e-3 * res.coeffs.sum(axis=-2).real.astype(x.dtype) + x

        return fn

    def sharpe_fn(x):
        import vectorwave_tpu.finance as fin

        s = fin.wavelet_sharpe_ratio(x, wavelet="db4", levels=4)
        return x + 1e-9 * s

    # (name, fn, signal, iters, ref_core_ms, ref_ext_ms, source)
    rows = [
        ("MODWT fwd 1K haar", fwd("haar"), sig(1024), 2000, 0.047, 0.022, "BR:22"),
        ("MODWT fwd 4K db4", fwd("db4"), sig(4096), 2000, 0.358, 0.117, "BR:26"),
        ("MODWT fwd 16K db4", fwd("db4"), sig(16384), 1000, 1.624, 0.465, "BR:29"),
        ("MODWT fwd 16K db8", fwd("db8"), sig(16384), 1000, 2.156, 0.578, "BR:30"),
        ("MODWT fwd 64K haar", fwd("haar"), sig(65536), 1000, 4.892, 1.398, "BR:31"),
        ("MODWT fwd 64K db4", fwd("db4"), sig(65536), 1000, 7.264, 1.862, "BR:32"),
        ("MODWT fwd 64K db8", fwd("db8"), sig(65536), 1000, 9.648, 2.314, "BR:33"),
        ("MODWT roundtrip 16K db4", rt("db4", 1), sig(16384), 1000, 2.84,
         0.76, "README:329"),
        ("Batch 16x4K db4 fwd", fwd("db4"), sig(4096, 16), 1000, 4.264, 0.982, "BR:42"),
        ("5-level decomp 4K db4", ml("db4", 5), sig(4096), 1000, 1.79, 0.58, "BR:60"),
        ("5-level decomp 16K db4", ml("db4", 5), sig(16384), 500, 8.12, 2.32, "BR:61"),
        ("5-level decomp 64K db4", ml("db4", 5), sig(65536), 500, 36.45, 9.31, "BR:62"),
        ("Denoise 16K 5-level", dn(5), sig(16384), 500, 14.26, 3.68, "BR:98"),
        ("Denoise 64K 6-level", dn(6), sig(65536), 300, 68.42, 15.84, "BR:99"),
        ("CWT 32 scales 8K", cwt_fn(32), sig(8192), 100, 92.6, 28.4, "BR:71"),
        ("CWT 32 scales 32K", cwt_fn(32), sig(32768), 100, 486.2, 114.8, "BR:72"),
        ("Wavelet Sharpe 10K", sharpe_fn, sig(10240), 300, 8.42, 2.14, "BR:107"),
    ]

    results = []
    for name, fn, x0, iters, ref_core, ref_ext, src in rows:
        try:
            ms, ms_min, ms_max = _measure_ms(fn, x0, iters, rb1)
            results.append(
                {"name": name, "ms": round(ms, 4),
                 "ms_min": round(ms_min, 4), "ms_max": round(ms_max, 4),
                 "ref_core_ms": ref_core,
                 "ref_ext_ms": ref_ext, "source": src}
            )
            print(f"{name}: {ms:.4f} ms (ref ext {ref_ext} ms, "
                  f"{ref_ext/ms:.1f}x)", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  file=sys.stderr, flush=True)
            results.append(
                {"name": name, "ms": None, "ref_core_ms": ref_core,
                 "ref_ext_ms": ref_ext, "source": src}
            )

    # --- BASELINE.json config rows not shaped like a reference table row ---
    def swt_denoise_cfg3(x):  # config #3: sym8 4-level SYMMETRIC + denoise
        res = vw.swt(x, "sym8", levels=4, boundary="symmetric")
        res = vw.apply_universal_threshold(res, mode="soft")
        return vw.iswt(res, "sym8", boundary="symmetric")

    def batch_cfg4(x):  # config #4: 256 x 16K batch MODWT
        res = vw.modwt_multilevel(x, "db4", levels=6)
        return vw.imodwt_multilevel(res, "db4")

    def cwt_cfg5(x):  # config #5: Morlet 64-scale on a 1M-sample signal
        sc = tuple(np.geomspace(2.0, 4096.0, 64).tolist())
        res = vw.cwt(x, sc, "morl", boundary="periodic")
        return 1e-3 * res.coeffs.sum(axis=-2).astype(x.dtype) + x

    def sym_roundtrip(x):  # symmetric kernel tier, both directions
        res = vw.modwt_multilevel(x, "db4", levels=6, boundary="symmetric")
        return vw.imodwt_multilevel(res, "db4", boundary="symmetric")

    def fused_denoise_row(x):  # one-pass kernel (planes stay in VMEM)
        return vw.denoise_multilevel(x, "db4", levels=6, method="universal",
                                     mode="soft")

    def fused_roundtrip_row(x):  # one-pass roundtrip (8 B/sample)
        return vw.modwt_roundtrip_fused(x, "db4", levels=6,
                                        boundary="periodic")

    # batched kernel-tier block streaming: the composite kernel fed by the
    # carry as its external halo (streaming/stream.modwt_stream_block_kernel)
    from vectorwave_tpu.streaming import (
        kernel_streaming_init,
        modwt_stream_block_kernel,
    )

    STREAM_B, STREAM_BLK, STREAM_NBLK = 128, 8192, 8

    def stream_kernel_row(x):  # x: [B, nblk*blk]
        blocks = x.reshape(STREAM_B, STREAM_NBLK, STREAM_BLK).transpose(1, 0, 2)
        state = kernel_streaming_init("db4", 6, batch_shape=(STREAM_B,))

        def step(st, blk):
            st, res = modwt_stream_block_kernel(
                st, blk, "db4", levels=6, boundary="zero"
            )
            acc = res.approx
            for d in res.details:
                acc = acc + 1e-3 * d
            return st, acc

        _, accs = jax.lax.scan(step, state, blocks)
        return accs.transpose(1, 0, 2).reshape(STREAM_B, -1)

    # kernel-tier streaming DENOISER: the fused one-pass kernel per block
    # (carry as analysis halo, masked right halo, ring-driven thresholds)
    from vectorwave_tpu.streaming import (
        kernel_streaming_denoiser_init,
        streaming_denoise_block_kernel,
    )

    def stream_denoise_row(x):  # x: [B, nblk*blk]
        blocks = x.reshape(STREAM_B, STREAM_NBLK, STREAM_BLK).transpose(1, 0, 2)
        state = kernel_streaming_denoiser_init(
            "db4", levels=6, batch_shape=(STREAM_B,)
        )

        def step(st, blk):
            st, out = streaming_denoise_block_kernel(
                st, blk, "db4", levels=6
            )
            return st, out

        _, outs = jax.lax.scan(step, state, blocks)
        return outs.transpose(1, 0, 2).reshape(STREAM_B, -1)

    # tiled (shard_map) path on a 1-device mesh: guards the distributed
    # tier's shard-local kernel rate (VERDICT r03 item 10 — previously only
    # in SCALING.md prose via tools/probe_tiled_chip.py)
    from jax.sharding import Mesh
    from vectorwave_tpu.parallel.tiled import (
        imodwt_multilevel_tiled,
        modwt_multilevel_tiled,
    )

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("signal",))

    def tiled_roundtrip_row(x):
        res = modwt_multilevel_tiled(x, "db4", levels=6, mesh=mesh1)
        return imodwt_multilevel_tiled(res, "db4", mesh=mesh1)

    baseline_rows = []
    for name, fn, x0, iters, samples in (
        ("cfg3 SWT sym8 4-level symmetric denoise 16K", swt_denoise_cfg3,
         sig(16384), 300, None),
        ("cfg4 batch 256x16K db4 6-level roundtrip", batch_cfg4,
         sig(16384, 256), 150, 256 * 16384),
        ("cfg5 CWT morl 64-scale 1M samples", cwt_cfg5, sig(1 << 20), 20,
         None),
        ("symmetric kernel-tier roundtrip 128x64K db4 6-level",
         sym_roundtrip, sig(65536, 128), 100, 128 * 65536),
        ("fused one-pass denoise 128x64K db4 6-level universal-soft",
         fused_denoise_row, sig(65536, 128), 150, 128 * 65536),
        ("fused one-pass roundtrip 128x64K db4 6-level",
         fused_roundtrip_row, sig(65536, 128), 100, 128 * 65536),
        ("kernel block streaming 128 streams x 8x8K blocks db4 6-level zero",
         stream_kernel_row, sig(STREAM_NBLK * STREAM_BLK, STREAM_B), 30,
         STREAM_B * STREAM_NBLK * STREAM_BLK),
        ("kernel streaming denoise 128 streams x 8x8K blocks db4 6-level",
         stream_denoise_row, sig(STREAM_NBLK * STREAM_BLK, STREAM_B), 30,
         STREAM_B * STREAM_NBLK * STREAM_BLK),
        ("tiled 1-dev mesh roundtrip 128x64K db4 6-level",
         tiled_roundtrip_row, sig(65536, 128), 100, 128 * 65536),
    ):
        try:
            ms, ms_min, ms_max = _measure_ms(fn, x0, iters, rb1)
            row = {"name": name, "ms": round(ms, 4),
                   "ms_min": round(ms_min, 4), "ms_max": round(ms_max, 4)}
            if samples:
                row["msamples_per_s"] = round(samples / ms / 1e3, 0)
            baseline_rows.append(row)
            print(f"{name}: {ms:.4f} ms", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:160]}",
                  file=sys.stderr, flush=True)
            baseline_rows.append({"name": name, "ms": None})

    # bound-relative context for the CWT rows (VERDICT r03 item 9 / r04
    # #8): each carries the HBM floor of its own synthesis traffic
    cwt_shapes = {
        "CWT 32 scales 8K": (32, 8192),
        "CWT 32 scales 32K": (32, 32768),
        "cfg5 CWT morl 64-scale 1M samples": (64, 1 << 20),
    }
    for r in results + baseline_rows:
        sh = cwt_shapes.get(r["name"])
        if sh and r.get("ms"):
            r["floor_ms"] = round(_cwt_floor_ms(*sh), 4)

    # streaming per-sample latency: one sliding window step per
    # buffer_size-overlap new samples
    buffer_size, wavelet = 512, "db4"
    t = SlidingStreamingTransform(wavelet, buffer_size=buffer_size)
    from vectorwave_tpu.streaming import sliding_init

    state0 = sliding_init(buffer_size)
    block = sig(t.step)

    def stream_step(carry):
        st, blk = carry
        st, res = sliding_step(st, blk, wavelet)
        return (st, blk + 1e-6 * res.detail[..., -t.step:])

    @jax.jit
    def stream_chain(carry):
        return jax.lax.fori_loop(0, 500, lambda _, c: stream_step(c), carry)

    out = stream_chain((state0, block))
    np.asarray(out[1][:4])
    t0 = time.perf_counter()
    out = stream_chain((state0, block))
    np.asarray(out[1][:4])
    per_window = (time.perf_counter() - t0) / 500
    per_sample_us = per_window / t.step * 1e6
    print(f"streaming: {per_sample_us:.4f} us/sample", file=sys.stderr,
          flush=True)

    # host ingest: C++ SPSC ring, push + overlapping frame assembly
    ingest = _measure_ingest()
    print(f"ingest: {ingest['cpp_mticks_per_s']} Mticks/s C++ / "
          f"{ingest['numpy_mticks_per_s']} Mticks/s NumPy",
          file=sys.stderr, flush=True)

    return {
        "round": None,  # filled by main()
        "device": device.device_kind,
        "rows": results,
        "baseline_configs": baseline_rows,
        "streaming_us_per_sample": round(per_sample_us, 4),
        "streaming_buffer": buffer_size,
        "ingest": ingest,
    }


def _measure_ingest() -> dict:
    """Producer-side throughput: push + pop_frames of 512-tick windows
    (hop = 407, the sliding transform's step), single thread.

    Runs in a FRESH subprocess: inside the long-lived TPU process the
    tunnel's helper threads steal enough host CPU to collapse the C++ ring
    to ~22 Mticks/s (standalone it measures ~200)."""
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r); "
        "from bench_full import _measure_ingest_inproc; "
        "print(json.dumps(_measure_ingest_inproc()))" % REPO
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:  # noqa: BLE001
        return _measure_ingest_inproc()


def _measure_ingest_inproc() -> dict:
    from vectorwave_tpu.native import RingBuffer, native_available

    frame, hop = 512, 407
    nticks = 1 << 22

    def run(backend: str) -> float:
        rb = RingBuffer(capacity=1 << 16, channels=1, backend=backend)
        chunk = np.random.default_rng(0).standard_normal(
            (4096, 1)).astype(np.float32)
        pushed = 0
        frames = 0
        t0 = time.perf_counter()
        while pushed < nticks:
            rb.push(chunk)
            pushed += len(chunk)
            while rb.available >= frame:
                got = rb.pop_frames(frame, hop, max_frames=8)
                frames += got.shape[0] if got.size else 0
                if not got.size:
                    break
        dt = time.perf_counter() - t0
        rb.close()
        return pushed / dt / 1e6

    out = {"numpy_mticks_per_s": round(run("python"), 0)}
    out["cpp_mticks_per_s"] = (
        round(run("native"), 0) if native_available() else None
    )
    out["frame"], out["hop"] = frame, hop
    return out


# ---------------------------------------------------------------------------
# PERF.md rendering (from JSON artifacts only)
# ---------------------------------------------------------------------------


def render_perf_md(full: dict, latest: dict | None,
                   beyond: dict | None) -> str:
    rnd = full["round"]
    lines = [
        "# PERF — measured on-chip latencies vs the reference's published rows",
        "",
        f"Generated by bench_full.py from `BENCH_FULL_r{rnd:02d}.json` "
        "(this table), `BENCH_LATEST.json` (precision ladder / roofline) and "
        "`BENCH_BEYOND.json` (beyond-reference modules); no hand-edited "
        "numbers.",
        "",
        f"Hardware: 1x {full['device']} (axon); reference: 24-core CPU "
        "+ GraalVM (docs/BENCHMARK-RESULTS.md:7-14).  Single-transform "
        "latency per row (batch=1 except the batch row), f32, fused-MXU "
        "default precision (bf16_3x).  Timing: on-device fori chains, "
        "dispatch overhead amortized (see bench.py docstring).",
        "",
        "| Benchmark | ref core (ms) | ref SIMD ext (ms) | ours (ms, median (min-max)) | speedup vs ext | % of HBM floor | source |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in full["rows"]:
        if r["ms"] is None:
            lines.append(
                f"| {r['name']} | {r['ref_core_ms']} | {r['ref_ext_ms']} "
                f"| FAILED | — | — | {r['source']} |"
            )
            continue
        ours = f"{r['ms']:.4f}"
        if r.get("ms_min") is not None:
            ours += f" ({r['ms_min']:.4f}-{r['ms_max']:.4f})"
        floor = (
            f"{100 * r['floor_ms'] / r['ms']:.0f}%"
            if r.get("floor_ms") else "—"
        )
        lines.append(
            f"| {r['name']} | {r['ref_core_ms']} | {r['ref_ext_ms']} | "
            f"{ours} | {r['ref_ext_ms']/r['ms']:.1f}x | {floor} | "
            f"{r['source']} |"
        )
    ing = full["ingest"]
    lines += [
        "",
        f"Streaming (sliding window {full['streaming_buffer']}, db4): "
        f"**{full['streaming_us_per_sample']:.3f} µs/sample** (reference "
        "fast-mode target < 1 µs/sample, docs/ARCHITECTURE.md:110).",
        "",
        f"Host ingest (`native.RingBuffer`, push + overlapping frame "
        f"assembly of {ing['frame']}-tick windows, hop {ing['hop']}, single "
        f"thread): "
        + (f"**{ing['cpp_mticks_per_s']:.0f} Mticks/s** C++ backend, "
           if ing["cpp_mticks_per_s"] is not None
           else "C++ backend unavailable, ")
        + f"{ing['numpy_mticks_per_s']:.0f} Mticks/s NumPy fallback — the "
        "producer side never gates the chip.",
        "",
        "## BASELINE.json configs (on-chip latency per transform)",
        "",
        "| config | ours (ms, median (min-max)) | % of HBM floor |",
        "|---|---|---|",
    ]
    for r in full["baseline_configs"]:
        val = "FAILED" if r["ms"] is None else f"{r['ms']:.4f}"
        if r["ms"] is not None and r.get("ms_min") is not None:
            val += f" ({r['ms_min']:.4f}-{r['ms_max']:.4f})"
        if r.get("msamples_per_s"):
            val += f" ({r['msamples_per_s']:.0f} Msamples/s)"
        floor = (
            f"{100 * r['floor_ms'] / r['ms']:.0f}%"
            if r.get("floor_ms") and r["ms"] else "—"
        )
        lines.append(f"| {r['name']} | {val} | {floor} |")
    if latest:
        rl = latest["roofline_msamples"]
        ladder = [
            ("bf16_3x (default)", "bf16_3x", "**MXU compute** — "
             f"{latest['mxu_eff_tflops_default']} effective TFLOPS = "
             f"{latest['pct_mxu_peak_default']}% of the chip's 197 TFLOPS "
             "bf16 peak; the HBM roofline would need ~2.6x peak at 3 passes"),
            ("bf16 (fast)", "bf16", "**HBM bandwidth** — "
             f"{latest['pct_roofline_fast']}% of the measured mixed-stream "
             "roofline, and ~85% of the write-pattern wall "
             "(tools/probe_write_wall.py); 1/3 the dots of the default"),
            ("float32", "float32", "MXU compute (HIGHEST-precision passes)"),
            ("exact (f32 double-float)", "exact", "MXU compute (sliced "
             "error-free dots, kernels/modwt_exact.py) — closes the "
             "<=1e-10 BASELINE gate ON-CHIP"),
        ]
        lines += [
            "",
            "## Where the headline sits on the roofline (and why)",
            "",
            "The composite-filter round trip costs exactly "
            f"**{latest['mxu_macs_per_sample_roundtrip']} MXU MACs/sample** "
            "(`kernels.modwt_mxu.composite_macs_per_sample`) and moves ~68 "
            "HBM bytes/sample.  Measured HBM bandwidth "
            f"{latest['measured_hbm_gbps']} GB/s (2-stream dependent-carry "
            f"probe; v5e spec {latest.get('hbm_spec_gbps', 819)} GB/s) puts "
            f"the memory roofline at {rl:,.0f} Ms/s.  The precision ladder "
            f"(batch 128 x 64K, BENCH_LATEST.json):",
            "",
            "| precision | Msamples/s | round-trip rmse | bound by |",
            "|---|---|---|---|",
        ]
        for label, key, bound in ladder:
            ms_key, rmse_key = f"{key}_msamples", f"{key}_rmse"
            if ms_key not in latest:
                continue
            lines.append(
                f"| {label} | {latest[ms_key]:,.0f} | "
                f"{latest[rmse_key]:.2e} | {bound} |"
            )
        lines += [
            "",
            "The default mode is compute-bound at "
            f"{latest['pct_mxu_peak_default']}% of MXU peak.  The remaining "
            "gap is NOT schedulable slack: tools/probe_write_wall.py shows "
            "a copy-only kernel with the same DMA geometry sustains only "
            "~480-510 GB/s on the plane write-back pattern (write-heavy "
            "traffic runs at ~60% of the mixed-stream probe), and once "
            "compute is the long pole that residual write time no longer "
            "fully overlaps.  ~80% of bf16 peak is the practical ceiling "
            "of the separate-call round trip at 68 B/sample; workloads "
            "that do not need the planes in HBM should use the fused "
            "one-pass tier instead.",
        ]
        if "fused_roundtrip_msamples" in latest:
            lines += [
                "",
                "## The fused one-pass round trip (8 B/sample)",
                "",
                f"`modwt_roundtrip_fused` keeps the planes in VMEM: "
                f"**{latest['fused_roundtrip_msamples']:,.0f} Ms/s** = "
                f"{latest['pct_mxu_peak_fused_roundtrip']}% of bf16 MXU peak "
                f"(rmse {latest['fused_roundtrip_rmse']:.1e}), vs "
                f"{latest['bf16_3x_msamples']:,.0f} for the materializing "
                "path.  tools/probe_fused_gap.py decomposes the residual: "
                "the dot chain runs at ~96.5% of peak PER PASS (fitting "
                "rate vs pass count across bf16/bf16_3x/float32), and a "
                "~0.036 ns/sample precision-INDEPENDENT floor — per-sample "
                "VPU work (sublane rolls, partial-sum adds, plane slices), "
                "invariant under roll-after-dot restructuring and "
                "batch-tile sweeps — accounts for the rest.  Production "
                f"denoise (decimated-MAD sigma + fused kernel): "
                f"**{latest['denoise_fused_msamples']:,.0f} Ms/s**.",
            ]
    if beyond and beyond.get("rows"):
        lines += [
            "",
            "## Beyond-reference modules (on-chip latency, tools/perf_beyond.py)",
            "",
            "| Workload | ours (ms) | % of HBM floor | note |",
            "|---|---|---|---|",
        ]
        for r in beyond["rows"]:
            ms = "FAILED" if r["ms"] is None else f"{r['ms']:.2f}"
            floor = (
                f"{100 * r['floor_ms'] / r['ms']:.0f}%"
                if r.get("floor_ms") and r["ms"] else "—"
            )
            lines.append(
                f"| {r['name']} | {ms} | {floor} | {r.get('note', '')} |"
            )
    lines.append("")
    return "\n".join(lines)


def main():
    rnd = None
    render_only = "--render-only" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--round":
            rnd = int(sys.argv[i + 1])
    if rnd is None:
        rnd = _infer_round()
    path = os.path.join(REPO, f"BENCH_FULL_r{rnd:02d}.json")

    def _load(name):
        p = os.path.join(REPO, name)
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return None

    if render_only:  # regenerate PERF.md from existing artifacts
        with open(path) as f:
            full = json.load(f)
    else:
        full = measure_all()
        full["round"] = rnd
        with open(path, "w") as f:
            json.dump(full, f, indent=1)

    md = render_perf_md(full, _load("BENCH_LATEST.json"),
                        _load("BENCH_BEYOND.json"))
    with open(os.path.join(REPO, "PERF.md"), "w") as f:
        f.write(md)
    summary = {r["name"]: r["ms"] for r in full["rows"]}
    summary["streaming_us_per_sample"] = full["streaming_us_per_sample"]
    summary["artifact"] = os.path.basename(path)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
