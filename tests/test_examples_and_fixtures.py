"""Docs-as-tests + real-world-style fixtures.

Mirrors the reference's ``documentation/`` package (README snippets must
compile and run) and the ``realworld/TickDataLoader`` tick-data tests.
"""

import pathlib
import runpy

import jax.numpy as jnp
import numpy as np
import pytest

import vectorwave_tpu as vw
from vectorwave_tpu import finance

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples").glob("*.py")
)


@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(script, capsys):
    """Every example script runs end-to-end (the docs-as-tests analogue)."""
    runpy.run_path(str(script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script.name} produced no output"
    # exceptions propagate through runpy; this only catches printed ones
    assert "traceback" not in out.lower()


def _synthetic_ticks(n=5000, seed=21):
    """Seeded tick-style series: lognormal trade sizes, jump-diffusion mid
    price with microstructure noise (the TickDataLoader fixture analogue)."""
    rng = np.random.default_rng(seed)
    rets = rng.normal(0, 2e-4, n)
    jumps = rng.random(n) < 0.001
    rets[jumps] += rng.normal(0, 5e-3, jumps.sum())
    mid = 100 * np.exp(np.cumsum(rets))
    noise = rng.normal(0, 5e-4, n)
    price = mid * (1 + noise)
    volume = rng.lognormal(3, 1, n)
    return price, volume


@pytest.mark.slow
def test_tick_data_denoising_recovers_mid_price():
    price, _ = _synthetic_ticks()
    mid_est = np.asarray(
        vw.denoise_multilevel(jnp.asarray(price), "sym8", levels=5, method="universal")
    )
    # microstructure noise (5e-4 relative) should shrink substantially
    raw_noise = np.std(np.diff(np.log(price)))
    den_noise = np.std(np.diff(np.log(np.maximum(mid_est, 1e-9))))
    assert den_noise < 0.5 * raw_noise


def test_tick_data_incremental_stream():
    price, _ = _synthetic_ticks(2000)
    import jax

    state = finance.incremental_init(jnp.float64)
    state, metrics = jax.lax.scan(
        lambda c, p: finance.incremental_update(c, p), state, jnp.asarray(price)
    )
    assert np.isfinite(np.asarray(metrics.volatility)).all()
    assert float(state.max_drawdown) < 0.2  # calm synthetic series


def test_streaming_state_checkpoint_roundtrip(tmp_path):
    """Streaming carries are plain pytrees: serializable checkpoint/resume
    (SURVEY §5 checkpoint/resume analogue)."""
    from vectorwave_tpu.streaming import modwt_stream_block, streaming_init

    price, _ = _synthetic_ticks(1024)
    x = price.astype(np.float64)
    state = streaming_init("db4", 3, dtype=jnp.float64)
    state, _ = modwt_stream_block(state, jnp.asarray(x[:512]), "db4")
    # checkpoint to disk as plain arrays
    np.savez(
        tmp_path / "ckpt.npz",
        *[np.asarray(h) for h in state.histories],
        blocks=np.asarray(state.blocks_processed),
    )
    loaded = np.load(tmp_path / "ckpt.npz")
    restored = type(state)(
        histories=tuple(
            jnp.asarray(loaded[f"arr_{i}"]) for i in range(len(state.histories))
        ),
        blocks_processed=jnp.asarray(loaded["blocks"]),
    )
    s1, out1 = modwt_stream_block(state, jnp.asarray(x[512:]), "db4")
    s2, out2 = modwt_stream_block(restored, jnp.asarray(x[512:]), "db4")
    np.testing.assert_array_equal(np.asarray(out1.approx), np.asarray(out2.approx))
