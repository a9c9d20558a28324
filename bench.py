"""Benchmark: db4 6-level MODWT analysis+synthesis throughput (Msamples/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline config (#2 of BASELINE.json): db4, 6 levels, 65536 samples, batch
128, PERIODIC, through the composite-filter MXU kernel at the default
precision (bf16_3x ~ 1e-5 relative).  Extras report the full precision
ladder — fast (bf16), f32, and the EXACT tier (double-float planes +
sliced error-free MXU dots, kernels/modwt_exact.py) whose on-chip round
trip closes BASELINE.json's <=1e-10 parity gate — plus the measured HBM
bandwidth and %-of-measured-roofline (round trip moves 68 B/sample: x in,
7 planes out, 7 planes in, x_hat out + re-read of x for the RMSE check
amortized away).

vs_baseline compares against the reference's CPU SIMD extensions
(BASELINE.md: 16K round-trip in 0.76 ms ~ 21.5 Msamples/s on a 24-core
AVX-512 CPU).

Timing discipline (axon-tunneled chip): one jit dispatch costs ~30 ms, so
iterate ON-DEVICE via lax.fori_loop with enough iterations that the fixed
overhead is <2%, then read back a tiny slice.  (Round-1 bench used 20
iterations and under-reported throughput ~4x.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MSAMPLES_PER_SEC = 21.5  # reference SIMD ext (README.md:329)

WAVELET = "db4"
LEVELS = 6
N = 65536
BATCH = 128
ITERS = 150
ROUNDTRIP_BYTES_PER_SAMPLE = 68


# Tunnel-acquisition retry schedule: (probe timeout s, sleep after failure s).
# Worst case ~25.5 min of probing before any CPU fallback — sized to outlast
# the 20+ min tunnel-down phases CLAUDE.md documents as transient.  One 180 s
# probe forfeited the round-4 scoreboard to a 0.3 Ms/s CPU row (VERDICT r04).
PROBE_SCHEDULE = [(120, 30), (180, 60), (240, 120), (300, 180), (300, 0)]


def _probe_tunnel_subprocess(timeout_s: float) -> bool:
    """Probe the TPU tunnel in a FRESH subprocess, killed on timeout.

    A hung ``jax.devices()`` cannot be retried in-process — the stuck
    plugin holds JAX's backend-init lock — so each retry must be a new
    process.  The child inherits the PALLAS_AXON env and exits 0 only if
    it sees a non-CPU device.
    """
    code = (
        "import jax, sys\n"
        "ds = jax.devices()\n"
        "sys.exit(0 if ds and ds[0].platform != 'cpu' else 3)\n"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _reexec(extra_env: dict, keep_axon: bool) -> None:
    env = {
        k: v
        for k, v in os.environ.items()
        if keep_axon or not k.startswith("PALLAS_AXON")
    }
    env.update(extra_env)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def _acquire_device():
    """Return ``(device, degraded)``, retrying a down tunnel before CPU.

    The driver's scoreboard is this script's one JSON line, so a transient
    tunnel-congestion phase must not turn into a CPU row that reads as the
    result: probe in fresh subprocesses with escalating waits (~25 min
    total), and only then fall back — re-exec'd on CPU with
    VW_BENCH_DEGRADED=1 so the JSON carries ``"degraded": true``.
    """
    if os.environ.get("VW_BENCH_CPU_FALLBACK") == "1":
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0], os.environ.get("VW_BENCH_DEGRADED") == "1"

    schedule = PROBE_SCHEDULE
    if os.environ.get("VW_BENCH_PROBE_BUDGET_S"):  # test hook
        schedule = [(float(os.environ["VW_BENCH_PROBE_BUDGET_S"]), 0)]

    for attempt, (probe_timeout, sleep_after) in enumerate(schedule, 1):
        if _probe_tunnel_subprocess(probe_timeout):
            # Tunnel verified up by a fresh process; init in-process under
            # a watchdog (it could still drop between probe and init).
            probe: dict = {}

            def _init():
                try:
                    probe["devices"] = jax.devices()
                except RuntimeError as exc:
                    probe["error"] = exc

            th = threading.Thread(target=_init, daemon=True)
            th.start()
            th.join(timeout=300.0)
            if "devices" in probe and probe["devices"][0].platform != "cpu":
                return probe["devices"][0], False
            # In-process init hung, raised, or yielded a CPU backend AFTER
            # a successful probe.  JAX caches backend init process-wide,
            # so ANY of these outcomes is permanent for this process —
            # re-exec fresh (keeping the axon env) and retry.
            n = int(os.environ.get("VW_BENCH_REEXEC_COUNT", "0"))
            if n < 2:
                print("bench: in-process TPU init failed after probe "
                      "success; re-exec'ing fresh", file=sys.stderr,
                      flush=True)
                _reexec({"VW_BENCH_REEXEC_COUNT": str(n + 1)},
                        keep_axon=True)
            break  # re-exec budget exhausted -> degraded fallback
        print(f"bench: tunnel probe {attempt}/{len(schedule)} failed "
              f"({probe_timeout:.0f}s timeout); sleeping {sleep_after}s",
              file=sys.stderr, flush=True)
        time.sleep(sleep_after)

    print("bench: TPU tunnel unavailable after full retry budget; "
          "falling back to CPU (DEGRADED row)", file=sys.stderr, flush=True)
    # The stuck plugin may hold the backend-init lock, so an in-process
    # platform switch can hang too — re-exec WITHOUT the axon env (the
    # site hook then never registers the plugin).
    _reexec(
        {
            "VW_BENCH_CPU_FALLBACK": "1",
            "VW_BENCH_DEGRADED": "1",
            "JAX_PLATFORMS": "cpu",
        },
        keep_axon=False,
    )


def _measure(fn, x, iters=ITERS, reps=3):
    @jax.jit
    def repeat(y):
        return jax.lax.fori_loop(0, iters, lambda _, z: fn(z), y)

    out = repeat(x)
    np.asarray(out[0, :8])  # compile + warm + readback path
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = repeat(x)
        np.asarray(out[0, :8])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters


def main() -> None:
    import vectorwave_tpu as vw

    vw.enable_compilation_cache()

    # a DOWN tunnel can make jax.devices() HANG (not raise) — acquire the
    # chip via subprocess probes with a ~25 min retry budget; any CPU
    # fallback row is marked "degraded" so it can never read as a result
    device, degraded = _acquire_device()
    on_tpu = device.platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, N)), dtype=dtype)

    def make_roundtrip(precision):
        def rt(y):
            res = vw.modwt_multilevel(y, WAVELET, levels=LEVELS, boundary="periodic")
            return vw.imodwt_multilevel(res, WAVELET, boundary="periodic")

        def wrapped(y):
            vw.set_fused_precision(precision)
            try:
                return rt(y)
            finally:
                vw.set_fused_precision("bf16_3x")

        return wrapped

    print(f"bench: compiling on {device.device_kind} ...", file=sys.stderr, flush=True)

    extras = {}
    rates = {}
    modes = ("bf16_3x", "bf16", "float32") if on_tpu else ("float32",)
    for precision in modes:
        fn = make_roundtrip(precision)
        t = _measure(fn, x, iters=ITERS if on_tpu else 3)
        rmse = float(jnp.sqrt(jnp.mean((jax.jit(fn)(x) - x) ** 2)))
        rates[precision] = BATCH * N / t / 1e6
        extras[f"{precision}_msamples"] = round(rates[precision], 1)
        extras[f"{precision}_rmse"] = rmse
        print(f"bench: {precision}: {rates[precision]:.0f} Msamples/s "
              f"rmse {rmse:.2e}", file=sys.stderr, flush=True)

    if on_tpu:
        # exact tier (double-float planes + sliced exact MXU dots): the
        # on-chip <=1e-10 round trip (BASELINE.json parity gate), RMSE
        # evaluated in f64 on the host against the f32-representable input
        from vectorwave_tpu.kernels.modwt_exact import modwt_roundtrip_exact

        exact_iters = 30

        def measure_exact(profile, tag):
            @jax.jit
            def exact_chain(y):
                def body(_, z):
                    h, _l = modwt_roundtrip_exact(
                        z, WAVELET, levels=LEVELS, profile=profile
                    )
                    return h
                return jax.lax.fori_loop(0, exact_iters, body, y)

            np.asarray(exact_chain(x)[0, :8])
            ex_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(exact_chain(x)[0, :8])
                ex_times.append(time.perf_counter() - t0)
            t_exact = float(np.median(ex_times)) / exact_iters
            hi, lo = jax.jit(
                lambda y: modwt_roundtrip_exact(
                    y, WAVELET, levels=LEVELS, profile=profile
                )
            )(x)
            err = (
                np.asarray(hi, np.float64)
                + np.asarray(lo, np.float64)
                - np.asarray(x, np.float64)
            )
            extras[f"{tag}_msamples"] = round(BATCH * N / t_exact / 1e6, 1)
            extras[f"{tag}_rmse"] = float(np.sqrt(np.mean(err**2)))
            print(
                f"bench: {tag}: {extras[f'{tag}_msamples']:.0f} Msamples/s "
                f"rmse {extras[f'{tag}_rmse']:.2e} (on-chip)",
                file=sys.stderr, flush=True,
            )

        # 'exact' = the balanced profile (the <=1e-10 contract tier the
        # tolerance router serves); 'exact_full' = the ~1e-13 geometry
        measure_exact("balanced", "exact")
        measure_exact("full", "exact_full")

        # measured HBM bandwidth -> roofline context.  TWO independent
        # 3-stream dependent-carry chains in one fori body: carries prevent
        # algebraic folding of the loop, independence lets the DMA engines
        # overlap (a single-stream copy probe under-reads achievable
        # bandwidth by ~40% and made the fast mode report >100% of
        # "roofline" in round 2).
        nbig = 64 * 1024 * 1024
        big = jnp.ones((nbig,), jnp.float32)
        addend1 = jnp.full((nbig,), 0.5, jnp.float32)
        addend2 = jnp.full((nbig,), 0.25, jnp.float32)

        @jax.jit
        def bw_chain(v):
            def body(_, ys):
                a, b = ys
                return (a + addend1) * 0.75, (b + addend2) * 0.8

            return jax.lax.fori_loop(0, 100, body, (v, v * 0.9))

        np.asarray(bw_chain(big)[0][:4])
        bw_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(bw_chain(big)[0][:4])
            bw_times.append(time.perf_counter() - t0)
        bw = 100 * 6 * nbig * 4 / float(np.median(bw_times)) / 1e9
        V5E_HBM_SPEC_GBPS = 819.0
        extras["measured_hbm_gbps"] = round(bw, 1)
        extras["hbm_spec_gbps"] = V5E_HBM_SPEC_GBPS
        roofline = bw * 1e9 / ROUNDTRIP_BYTES_PER_SAMPLE / 1e6
        extras["roofline_msamples"] = round(roofline, 1)
        extras["pct_roofline_default"] = round(100 * rates["bf16_3x"] / roofline, 1)
        extras["pct_roofline_fast"] = round(100 * rates["bf16"] / roofline, 1)

        # MXU-utilization context: the default (3-pass bf16_3x) round trip is
        # COMPUTE-bound, so its ceiling is MXU peak, not the HBM roofline —
        # reaching the memory roofline at 3 passes would need ~2.6x the
        # chip's 197 TFLOPS bf16 peak at the new 12.5 Gs/s roofline.  The
        # 1-pass bf16 mode (same HBM bytes, 1/3 the dots) is the
        # memory-bound point of the ladder (~86% of measured roofline).
        from vectorwave_tpu.kernels.modwt_mxu import composite_macs_per_sample

        w = vw.wavelet(WAVELET)
        macs = composite_macs_per_sample((w.dec_lo, w.dec_hi), LEVELS)
        rt_macs = macs["analysis"] + macs["synthesis"]
        eff_tflops = rates["bf16_3x"] * 1e6 * rt_macs * 2 * 3 / 1e12
        extras["mxu_macs_per_sample_roundtrip"] = rt_macs
        extras["mxu_eff_tflops_default"] = round(eff_tflops, 1)
        V5E_BF16_PEAK_TFLOPS = 197.0
        extras["pct_mxu_peak_default"] = round(
            100 * eff_tflops / V5E_BF16_PEAK_TFLOPS, 1
        )

    if on_tpu:
        # fused ONE-PASS round trip (mode="none" tier of the fused-denoise
        # kernel; planes never leave VMEM, 8 B/sample of HBM traffic): the
        # compute-bound point of the design — the 68 B/sample separate-call
        # path above is pinned to the HBM write wall at ~80% of MXU peak
        # (tools/probe_write_wall.py); this row shows the kernel freed of it
        def frt(y):
            return vw.modwt_roundtrip_fused(
                y, WAVELET, levels=LEVELS, boundary="periodic"
            )

        t_frt = _measure(frt, x)
        fused_rate = BATCH * N / t_frt / 1e6
        rmse_frt = float(jnp.sqrt(jnp.mean((jax.jit(frt)(x) - x) ** 2)))
        extras["fused_roundtrip_msamples"] = round(fused_rate, 1)
        extras["fused_roundtrip_rmse"] = rmse_frt
        fused_tflops = fused_rate * 1e6 * rt_macs * 2 * 3 / 1e12
        extras["mxu_eff_tflops_fused_roundtrip"] = round(fused_tflops, 1)
        extras["pct_mxu_peak_fused_roundtrip"] = round(
            100 * fused_tflops / V5E_BF16_PEAK_TFLOPS, 1
        )
        print(f"bench: fused roundtrip: {fused_rate:.0f} Msamples/s "
              f"rmse {rmse_frt:.2e} "
              f"({extras['pct_mxu_peak_fused_roundtrip']}% MXU peak)",
              file=sys.stderr, flush=True)

        # fused SINGLE-PASS bf16 tier — the fast end of the ladder.  At
        # 8 B/sample its HBM traffic is trivial and one dot pass leaves
        # the MXU idle-rich, so the measured precision-INDEPENDENT VPU
        # floor (~0.036 ns/sample, tools/probe_fused_gap.py) is the
        # binding limit here, not a memory or compute wall.
        def frt_fast(y):
            return vw.modwt_roundtrip_fused(
                y, WAVELET, levels=LEVELS, boundary="periodic",
                precision="bf16",
            )

        t_ff = _measure(frt_fast, x)
        ff_rate = BATCH * N / t_ff / 1e6
        extras["fused_roundtrip_bf16_msamples"] = round(ff_rate, 1)
        extras["fused_roundtrip_bf16_rmse"] = float(
            jnp.sqrt(jnp.mean((jax.jit(frt_fast)(x) - x) ** 2))
        )
        print(f"bench: fused roundtrip bf16: {ff_rate:.0f} Msamples/s "
              f"rmse {extras['fused_roundtrip_bf16_rmse']:.2e} "
              "(VPU-floor-bound)", file=sys.stderr, flush=True)

        # fused one-pass denoise (analysis -> threshold -> synthesis in
        # VMEM, kernels/modwt_mxu._composite_denoise_call): the production
        # denoise rate at the headline shape (sigma via the decimated MAD
        # estimator, denoise/denoiser._fused_sigma)
        def dn(y):
            return vw.denoise_multilevel(
                y, WAVELET, levels=LEVELS, method="universal", mode="soft"
            )

        # full ITERS: at iters=50 the fixed per-readback tunnel overhead
        # (~12 ms) biased this row ~15% low (tools/probe_sigma_ladder.py —
        # in one process, denoise@100 iters == roundtrip@100 iters)
        t_dn = _measure(dn, x)
        extras["denoise_fused_msamples"] = round(BATCH * N / t_dn / 1e6, 1)
        print(f"bench: fused denoise: {extras['denoise_fused_msamples']:.0f} "
              "Msamples/s", file=sys.stderr, flush=True)

    if on_tpu:
        # f64 bit-parity evidence (BASELINE.json's <=1e-10 gate): the jnp
        # path in float64 on the host CPU backend (TPUs have no f64 units)
        try:
            jax.config.update("jax_enable_x64", True)
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                x64 = jnp.asarray(
                    rng.standard_normal(16384), dtype=jnp.float64
                )
                res64 = vw.modwt_multilevel(
                    x64, WAVELET, levels=LEVELS, backend="jnp"
                )
                xr64 = vw.imodwt_multilevel(res64, WAVELET, backend="jnp")
                extras["float64_cpu_rmse"] = float(
                    jnp.sqrt(jnp.mean((x64 - xr64) ** 2))
                )
        except Exception as exc:  # noqa: BLE001
            extras["float64_cpu_rmse_error"] = str(exc)[:120]

    headline = rates[modes[0]]
    result = {
        "metric": "modwt_db4_6level_roundtrip_throughput",
        "value": round(headline, 1),
        "unit": "Msamples/sec/chip",
        "vs_baseline": round(headline / BASELINE_MSAMPLES_PER_SEC, 3),
        "config": (
            f"{WAVELET} {LEVELS}-level {BATCH}x{N} {jnp.dtype(dtype).name} "
            f"on {device.device_kind}; fused MXU kernel, precision={modes[0]}"
        ),
        **extras,
    }
    if not on_tpu:
        # A CPU row is NEVER a result at this metric (the baseline is a
        # 24-core AVX-512 CPU; this host is 4 cores) — mark it so the
        # scoreboard can discount it (VERDICT r04 "what's missing" #1).
        result["degraded"] = True
        result["reason"] = (
            "tpu_tunnel_unavailable" if degraded else "cpu_requested"
        )
    print(json.dumps(result))
    if on_tpu:
        # persist for doc generation: bench_full.py renders PERF.md's
        # roofline section from this artifact (committed per round)
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LATEST.json"), "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
