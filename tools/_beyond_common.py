"""Shared artifact writer for the perf_beyond* tools: merge measured rows
into BENCH_BEYOND.json (keyed by row name) so bench_full.py can render the
beyond-reference table of PERF.md from a committed, re-runnable artifact."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_BEYOND.json")


#: HBM-traffic models (total bytes moved) for bound-relative context in
#: PERF.md's beyond table (VERDICT r04 #8).  Roundtrip traffic counts
#: input read + every materialized plane out + planes re-read + output
#: write, all f32.  Rows without a clean bytes model carry no floor.
_FLOOR_BYTES = {
    # 8x16384 samples; full tree (2+4+8+16=30 planes) out, 16 leaves
    # re-read, x in + x_hat out: (1+30+16+1)*4 B/sample
    "MODWPT depth-4 roundtrip, 8x16384 sym8": 8 * 16384 * 192,
    # decimated: coefficient samples total ~2N per tree pair; x in +
    # coeffs out + coeffs in + x_hat out = 6N * 4 B
    "DTCWT 1-D roundtrip 8x16384, 5 levels": 8 * 16384 * 24,
    # (x in + (3J+1) planes out + planes in + x_hat out)*4 B/pixel
    "2-D MODWT roundtrip 8x2048x2048 db4 J=4": 8 * 2048 * 2048 * 112,
    "2-D MODWT roundtrip 8x2048x2048 db4 J=6": 8 * 2048 * 2048 * 160,
    "denoise2 8x2048x2048 db4 J=4 universal-soft": 8 * 2048 * 2048 * 112,
}


def _hbm_bw_gbps() -> float:
    try:
        with open(os.path.join(REPO, "BENCH_LATEST.json")) as f:
            return float(json.load(f).get("measured_hbm_gbps", 844.0))
    except Exception:  # noqa: BLE001
        return 844.0


def merge_rows(rows: list[dict], device: str) -> None:
    """rows: [{"name", "ms", "note"}]; replaces same-name rows, keeps the
    rest, preserves insertion order.  Rows with a bytes model in
    _FLOOR_BYTES get ``floor_ms`` attached (measured-bandwidth HBM floor,
    rendered as %%-of-floor by bench_full.render_perf_md)."""
    bw = _hbm_bw_gbps()
    for r in rows:
        nbytes = _FLOOR_BYTES.get(r["name"])
        if nbytes and r.get("ms"):
            r["floor_ms"] = round(nbytes / (bw * 1e9) * 1e3, 4)
    data = {"device": device, "rows": []}
    if os.path.exists(PATH):
        with open(PATH) as f:
            data = json.load(f)
        data["device"] = device
    by_name = {r["name"]: r for r in data.get("rows", [])}
    for r in rows:
        by_name[r["name"]] = r
    order = [r["name"] for r in data.get("rows", [])]
    order += [r["name"] for r in rows if r["name"] not in order]
    data["rows"] = [by_name[n] for n in order]
    with open(PATH, "w") as f:
        json.dump(data, f, indent=1)
