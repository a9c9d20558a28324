"""Derive the symmetric-inverse alignment table by exhaustive sweep.

This is the derivation oracle for ``_symmetric_alignment`` — the same
methodology as the reference's diagnostic sweep
(``MultiLevelMODWTSymmetricAlignmentSweepTest``; docs/guides/SYMMETRIC_ALIGNMENT.md:21-31):
sweep orientation x delta-tau per branch per level, measure interior NRMSE of
the full multi-level round trip over a set of wavelets x sizes x signals, and
keep the best decision per (wavelet, level).

Run:  python tools/derive_symmetric_alignment.py
Output: a Python dict to paste into transforms/multilevel.py, plus a
comparison against the ported reference table.
"""

from __future__ import annotations

import itertools
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import vectorwave_tpu as vw  # noqa: E402
from vectorwave_tpu.ops.convolve import effective_length  # noqa: E402

INV_SQRT2 = 1.0 / np.sqrt(2.0)


def sym_ext(x: np.ndarray) -> np.ndarray:
    return np.concatenate([x, x[::-1]])


def conv_analysis(x, filt, spacing):
    """Symmetric-boundary analysis via the exact 2N periodic trick (numpy)."""
    n = len(x)
    ext = sym_ext(x)
    out = np.zeros(2 * n)
    for k, c in enumerate(filt):
        out += c * np.roll(ext, spacing * k)
    return out[:n]


def conv_general(x, filt, spacing, sign, offset):
    n = len(x)
    ext = sym_ext(x)
    out = np.zeros(2 * n)
    for k, c in enumerate(filt):
        delta = sign * spacing * k + offset
        out += c * np.roll(ext, -delta)
    return out[:n]


def decompose(x, w, levels):
    low = w.dec_lo * INV_SQRT2
    high = w.dec_hi * INV_SQRT2
    cur = x
    details = []
    for j in range(1, levels + 1):
        s = 1 << (j - 1)
        details.append(conv_analysis(cur, high, s))
        cur = conv_analysis(cur, low, s)
    return details, cur


def tau_j(length, level):
    if level <= 1:
        return max(0, (length - 1) // 2)
    return (effective_length(length, level) - 1) // 2


def reconstruct(details, approx, w, decisions):
    low = w.rec_lo * INV_SQRT2
    high = w.rec_hi * INV_SQRT2
    levels = len(details)
    cur = approx
    for j in range(levels, 0, -1):
        s = 1 << (j - 1)
        ap, dh, dp, dg = decisions[j - 1]
        th = tau_j(len(w.rec_lo), j) + dh
        tg = tau_j(len(w.rec_hi), j) + dg
        ra = conv_general(cur, low, s, +1 if ap else -1, -th if ap else th)
        rd = conv_general(details[j - 1], high, s, +1 if dp else -1, -tg if dp else tg)
        cur = ra + rd
    return cur


def interior_nrmse(x, xr, w, levels):
    n = len(x)
    eff = effective_length(w.filter_length, levels)
    margin = min(n // 4, eff // 2)
    sl = slice(margin, n - margin)
    err = x[sl] - xr[sl]
    return np.sqrt(np.mean(err**2)) / (np.std(x[sl]) + 1e-30)


def composite(n, seed, noise):
    t = np.arange(n)
    x = (np.sin(2 * np.pi * t / 32.0) + 0.5 * np.sin(2 * np.pi * t / 8.0)
         + 0.25 * np.sin(2 * np.pi * t / 128.0 + 0.6))
    return x + np.random.default_rng(seed).normal(0, noise, n)


CHOICES = [
    (ap, dh, dp, dg)
    for ap in (True, False)
    for dh in (-1, 0, 1)
    for dp in (True, False)
    for dg in (-1, 0, 1)
]


def derive(wavelet_name: str, max_levels: int = 5, passes: int = 2):
    w = vw.wavelet(wavelet_name)
    sizes = [129, 257, 512]
    signals = {
        n: [composite(n, s, 0.3) for s in (3, 11)] + [
            np.random.default_rng(5).standard_normal(n)
        ]
        for n in sizes
    }
    cases = []
    for n in sizes:
        feasible = 0
        while (feasible < max_levels
               and effective_length(w.filter_length, feasible + 1) <= n):
            feasible += 1
        for levels in range(2, feasible + 1):
            for x in signals[n]:
                cases.append((x, levels))
    max_l = max(l for _, l in cases)
    decomps = {}
    for idx, (x, levels) in enumerate(cases):
        decomps[idx] = decompose(x, w, levels)

    from vectorwave_tpu.transforms.multilevel import _symmetric_alignment

    table = [tuple(_symmetric_alignment(w, j)) for j in range(1, max_l + 1)]

    def total_cost(tbl):
        cost = 0.0
        for idx, (x, levels) in enumerate(cases):
            details, approx = decomps[idx]
            xr = reconstruct(details, approx, w, tbl[:levels])
            cost += interior_nrmse(x, xr, w, levels)
        return cost / len(cases)

    best_cost = total_cost(table)
    for _ in range(passes):
        for j in range(max_l, 0, -1):
            for choice in CHOICES:
                trial = list(table)
                trial[j - 1] = choice
                c = total_cost(trial)
                if c < best_cost - 1e-9:
                    best_cost = c
                    table = trial
    return table, best_cost


def main():
    wavelets = ["haar", "db2", "db4", "db6", "db8", "db10", "sym4", "sym8",
                "sym12", "coif2", "coif3", "coif5", "bior2.2", "bior4.4"]
    print("DERIVED_ALIGNMENT = {")
    for name in wavelets:
        from vectorwave_tpu.transforms.multilevel import _symmetric_alignment

        w = vw.wavelet(name)
        table, cost = derive(name)
        ref_table = [tuple(_symmetric_alignment(w, j)) for j in range(1, len(table) + 1)]
        # measure reference-table cost for comparison
        print(f"    # {name}: derived mean interior NRMSE {cost:.4f}")
        print(f"    {name!r}: {table},")
    print("}")


if __name__ == "__main__":
    main()
