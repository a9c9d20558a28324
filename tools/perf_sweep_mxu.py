"""On-chip sweep: MXU kernel tile shapes x baked-vs-input band constants.

Hypothesis: whole-array VMEM inputs are re-copied every grid step, so the
band matrices (1.7 MB) dominate HBM traffic at small tiles; baking them as
Mosaic constants (or bigger tiles) should restore memory-bound behavior.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache = os.path.expanduser("~/.cache/vectorwave_tpu_jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import vectorwave_tpu.kernels.modwt_mxu as mxu
    from vectorwave_tpu.kernels.modwt_pallas import _kernel_filters
    from vectorwave_tpu.transforms.modwt import _resolve_discrete

    B, N, LV = 128, 65536, 6
    w = _resolve_discrete("db4")
    fa = _kernel_filters(w, synthesis=False)
    fs_ = _kernel_filters(w, synthesis=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N)), dtype=jnp.float32)
    iters = 10

    variants = []
    for baked in (True, False):
        for b_tile, tile_rows in ((8, 64), (8, 128), (16, 128), (4, 256)):
            variants.append((baked, b_tile, tile_rows))

    def make_rt(precision):
        def rt(y):
            outs = mxu.run_analysis_mxu(y, LV, fa, True, 10**9, precision, False)
            return mxu.run_synthesis_mxu(outs, LV, fs_, True, 10**9, precision, False)
        return rt

    report = {}
    compiled = []
    for baked, b_tile, tile_rows in variants:
        name = f"{'baked' if baked else 'input'}_b{b_tile}_r{tile_rows}"
        mxu._FORCE_B_TILE = b_tile
        mxu._FORCE_TILE_ROWS = tile_rows
        # patch default baked flag through the private calls
        orig_an, orig_sy = mxu._mxu_analysis_call, mxu._mxu_synthesis_call
        rt = make_rt("bf16_3x")
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()

        def run_variant(y, rt=rt, baked=baked):
            return rt(y)

        try:
            # thread baked via a wrapper: temporarily wrap the jitted calls
            import functools

            an = functools.partial(orig_an)  # placeholder; baked passed below
            # simplest: monkeypatch run_* to pass baked
            def run_analysis(y, lv, f, per, t, p, i, baked=baked):
                b_, n_ = y.shape
                fl = len(f[0])
                halo_rows = mxu._round_up(max(mxu.halo_rows_total(fl, lv), 1), 8)
                halo_pad = halo_rows * mxu._LANES
                bt, tr = mxu._auto_tiles(b_, lv, halo_rows, -(-n_ // 128), 10**9)
                n_pad = mxu._round_up(n_, tr * 128)
                reps = -(-halo_pad // n_)
                left = jnp.concatenate([y] * reps, axis=-1)[..., -halo_pad:]
                pieces = [left, y]
                if n_pad != n_:
                    pieces.append(jnp.zeros((b_, n_pad - n_), dtype=y.dtype))
                x_ext = mxu._to_rows(jnp.concatenate(pieces, axis=-1))
                outs = mxu._mxu_analysis_call(
                    x_ext, levels=lv, filters=f, b_tile=bt, tile_rows=tr,
                    halo_rows=halo_rows, precision=p, interpret=False, baked=baked,
                )
                return tuple(mxu._from_rows(o)[..., :n_] for o in outs)

            def run_synthesis(planes, lv, f, per, t, p, i, baked=baked):
                b_, n_ = planes[0].shape
                fl = len(f[0])
                halo_rows = mxu._round_up(max(mxu.halo_rows_total(fl, lv), 1), 8)
                halo_pad = halo_rows * mxu._LANES
                bt, tr = mxu._auto_tiles(b_, lv, halo_rows, -(-n_ // 128), 10**9)
                n_pad = mxu._round_up(n_, tr * 128)

                def extend(plane):
                    reps = -(-halo_pad // n_)
                    right = jnp.concatenate([plane] * reps, axis=-1)[..., :halo_pad]
                    pieces = [plane, right]
                    if n_pad != n_:
                        pieces.append(
                            jnp.zeros((b_, n_pad - n_), dtype=plane.dtype)
                        )
                    return mxu._to_rows(jnp.concatenate(pieces, axis=-1))

                out = mxu._mxu_synthesis_call(
                    tuple(extend(pl_) for pl_ in planes), levels=lv, filters=f,
                    b_tile=bt, tile_rows=tr, halo_rows=halo_rows, precision=p,
                    interpret=False, baked=baked,
                )
                return mxu._from_rows(out)[..., :n_]

            def rt2(y):
                outs = run_analysis(y, LV, fa, True, 0, "bf16_3x", False)
                return run_synthesis(outs, LV, fs_, True, 0, "bf16_3x", False)

            @jax.jit
            def repeat(y):
                return jax.lax.fori_loop(0, iters, lambda _, z: rt2(z), y)

            out = repeat(x)
            np.asarray(out[0, :8])
            rmse = float(jnp.sqrt(jnp.mean((jax.jit(rt2)(x) - x) ** 2)))
            print(f"  compiled {time.perf_counter()-t0:.0f}s rmse {rmse:.2e}",
                  file=sys.stderr, flush=True)
            compiled.append((name, repeat, rmse))
        except Exception as exc:  # noqa: BLE001
            print(f"  FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  file=sys.stderr, flush=True)

    mxu._FORCE_B_TILE = None
    mxu._FORCE_TILE_ROWS = None

    results = {name: [] for name, _, _ in compiled}
    for _ in range(3):
        for name, repeat, _ in compiled:
            t0 = time.perf_counter()
            out = repeat(x)
            np.asarray(out[0, :8])
            results[name].append(time.perf_counter() - t0)
    for name, repeat, rmse in compiled:
        t = float(np.median(results[name]))
        report[name] = {
            "msamples_per_sec": round(B * N * iters / t / 1e6, 1),
            "rmse": rmse,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
