"""Normalized cross-round bench comparison.

Reads two bench captures (bench_full.json shape: queries dict +
anchor_s) and prints the like-for-like comparison in ANCHOR-NORMALIZED
units (query_time / anchor_s): the VM's day-to-day throughput swing
moves the anchor and every query alike, so the normalized ratio
isolates real plan regressions from VM weather (README "Reading bench
numbers").

Usage: python tools/bench_delta.py OLD.json NEW.json [--top N] [--md]
       [--raw]
Prints total/per-family normalized deltas and the N worst per-query
ratios; --md emits a markdown table for PLANS.md/README; --raw skips
anchor normalization and compares RAW seconds. Use --raw whenever the
captures disagree on what the anchor measures: the r7→r8 session saw
the single-core anchor HALVE while 32-core query throughput moved
only ~1.3× (single-core turbo vs parallel throughput are different
physical quantities), which made every untouched query read 1.4×
"slower" normalized while raw like-for-like was 0.745× (faster).
Cross-check both views; when they disagree, trust raw on a capture
whose contention_suspect flag is False and investigate the anchors.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d.get("parsed"), dict):  # BENCH_r{N}.json wrapper
        d = d["parsed"]
    return d


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 8
    for i, a in enumerate(sys.argv):
        if a == "--top" and i + 1 < len(sys.argv):
            top = int(sys.argv[i + 1])
    old, new = load(args[0]), load(args[1])
    raw = "--raw" in sys.argv
    ao, an = old.get("anchor_s"), new.get("anchor_s")
    if raw:
        ao = an = 1.0
    elif not ao or not an:
        print("missing anchor_s — raw seconds only, deltas not weather-corrected")
        ao = an = 1.0
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for q in shared:
        no, nn = old["queries"][q] / ao, new["queries"][q] / an
        rows.append((q, no, nn, nn / no if no else float("nan")))
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    md = "--md" in sys.argv
    unit = "RAW seconds" if raw else "query/anchor"
    anote = "" if raw else f"; anchors {ao:.4f} → {an:.4f} s"
    hdr = (
        f"{'Raw' if raw else 'Normalized'} bench delta ({len(shared)} shared queries; "
        f"units = {unit}{anote}): total {tot_o:.1f} → {tot_n:.1f} "
        f"= **{tot_n / tot_o:.2f}×**"
    )
    print(hdr)
    rows.sort(key=lambda r: r[3], reverse=True)
    if md:
        print()
        print("| query | old (norm) | new (norm) | ratio |")
        print("|---|---|---|---|")
        for q, no, nn, r in rows[:top]:
            print(f"| `{q}` | {no:.2f} | {nn:.2f} | {r:.2f}× |")
    else:
        for q, no, nn, r in rows[:top]:
            print(f"  {q:36s} {no:7.2f} -> {nn:7.2f}  {r:.2f}x")
    new_only = sorted(set(new["queries"]) - set(old["queries"]))
    if new_only:
        add = sum(new["queries"][q] / an for q in new_only)
        print(
            f"\n{len(new_only)} queries new this round (not in the like-for-like total): "
            + ", ".join(new_only)
            + f" — {add:.1f} {'raw s' if raw else 'normalized units'}"
        )


if __name__ == "__main__":
    main()
