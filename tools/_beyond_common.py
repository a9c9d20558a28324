"""Shared artifact writer for the perf_beyond* tools: merge measured rows
into BENCH_BEYOND.json (keyed by row name) so bench_full.py can render the
beyond-reference table of PERF.md from a committed, re-runnable artifact."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "BENCH_BEYOND.json")


def merge_rows(rows: list[dict], device: str) -> None:
    """rows: [{"name", "ms", "note"}]; replaces same-name rows, keeps the
    rest, preserves insertion order."""
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
