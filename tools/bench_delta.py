"""Normalized cross-round bench comparison.

Reads two bench captures (bench_full.json shape: queries dict +
anchors) and prints the like-for-like comparison in ANCHOR-NORMALIZED
units (query_time / anchor): the VM's day-to-day throughput swing
moves the anchor and every query alike, so the normalized ratio
isolates real plan regressions from VM weather (README "Reading bench
numbers").

Anchor choice (r8 verdict item 2): the MULTI-CORE anchor
(`anchor_mc_s`, the same xxhash64 fold run on all cores) is the
default denominator whenever BOTH captures carry it, because the
queries themselves run on all cores — the r7→r8 session saw the
single-core anchor HALVE (turbo behavior) while 32-core query
throughput moved only ~1.3×, which made every untouched query read
1.4× "slower" single-core-normalized while raw like-for-like was
0.745× (faster). mc-normalization of the same captures agreed with
raw to within 5%. Captures without `anchor_mc_s` (pre-r8) fall back
to `anchor_s`, with a warning.

Usage: python tools/bench_delta.py OLD.json NEW.json [--top N] [--md]
       [--raw] [--sc]
Prints total/per-family normalized deltas and the N worst per-query
ratios; --md emits a markdown table for PLANS.md/README; --raw skips
anchor normalization and compares RAW seconds; --sc forces the legacy
single-core anchor. Cross-check --raw against the default; when they
disagree, trust raw on a capture whose contention_suspect flag is
False and investigate the anchors.
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


def pick_anchors(old: dict, new: dict, sc: bool) -> tuple[float | None, float | None, str]:
    """Prefer the multi-core anchor when both captures carry it."""
    if not sc and old.get("anchor_mc_s") and new.get("anchor_mc_s"):
        return old["anchor_mc_s"], new["anchor_mc_s"], "anchor_mc_s"
    ao, an = old.get("anchor_s"), new.get("anchor_s")
    if ao and an and not sc:
        print(
            "note: one capture lacks anchor_mc_s — normalizing by the SINGLE-CORE "
            "anchor, which diverges from 32-core throughput under turbo; "
            "cross-check with --raw"
        )
    return ao, an, "anchor_s"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 8
    for i, a in enumerate(sys.argv):
        if a == "--top" and i + 1 < len(sys.argv):
            top = int(sys.argv[i + 1])
    old, new = load(args[0]), load(args[1])
    # action gate (r11 wave 2): captures before the count()->noop_write
    # action fix measured PRUNED plans for some queries — a mixed-action
    # delta confounds the action change with real regressions.
    act_old = old.get("action", "count")
    act_new = new.get("action", "count")
    if act_old != act_new:
        if "--mixed-action" in sys.argv:
            print(
                f"WARNING: mixed bench actions ({act_old} vs {act_new}), proceeding "
                "on --mixed-action — formerly count()-pruned queries will read as "
                "artifact regressions (see README 'Reading bench numbers')."
            )
        else:
            print(
                f"REFUSED: mixed bench actions ({act_old} vs {act_new}) — affected "
                "queries read slower under noop_write because count() under-measured "
                "them (pruned plans), so the per-query table would show artifact "
                "regressions. Compare same-action captures, read the transition "
                "table in README 'Reading bench numbers', or pass --mixed-action "
                "to proceed anyway."
            )
            raise SystemExit(2)
    raw = "--raw" in sys.argv
    anchor_field = "none"
    if raw:
        ao = an = 1.0
    else:
        ao, an, anchor_field = pick_anchors(old, new, "--sc" in sys.argv)
        if not ao or not an:
            print("missing anchors — raw seconds only, deltas not weather-corrected")
            ao = an = 1.0
            anchor_field = "none"
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for q in shared:
        no, nn = old["queries"][q] / ao, new["queries"][q] / an
        rows.append((q, no, nn, nn / no if no else float("nan")))
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    md = "--md" in sys.argv
    unit = "RAW seconds" if raw else f"query/{anchor_field}"
    anote = "" if raw else f"; anchors {ao:.4f} → {an:.4f} s"
    hdr = (
        f"{'Raw' if raw else 'Normalized'} bench delta ({len(shared)} shared queries; "
        f"units = {unit}{anote}): total {tot_o:.1f} → {tot_n:.1f} "
        f"= **{tot_n / tot_o:.2f}×**"
    )
    print(hdr)
    # Anchor/raw disagreement gate (r14, automating the capture-1
    # arbitration): when the normalized total and the raw total
    # disagree by >10%, the anchor moved differently from query
    # throughput (turbo/regime split — the r7→r8 and r13→r14 pattern)
    # and the normalized number is an artifact. Flag it and point at
    # raw; the README rule is "trust raw on an unflagged capture and
    # investigate the anchors".
    if not raw and anchor_field != "none":
        raw_o = sum(old["queries"][q] for q in shared)
        raw_n = sum(new["queries"][q] for q in shared)
        if raw_o > 0 and tot_o > 0:
            norm_ratio, raw_ratio = tot_n / tot_o, raw_n / raw_o
            if max(norm_ratio, raw_ratio) / min(norm_ratio, raw_ratio) > 1.10:
                print(
                    f"WARNING: normalized total ({norm_ratio:.2f}x) and RAW total "
                    f"({raw_ratio:.2f}x) disagree by >10% — the anchor moved "
                    "differently from query throughput (regime split). TRUST RAW "
                    "and investigate the anchors; do not publish the normalized "
                    "number (README 'Reading bench numbers')."
                )
    # Per-axis drift check (r14 verdict item 2): when both captures
    # carry the shuffle-axis anchor, compare its drift against the CPU
    # axis's. Same 1.25 gate as bench.regime_split — the ratio of
    # drifts divides out common weather, so >1.25 means the two axes
    # genuinely decoupled and ONE normalization denominator cannot be
    # right for both CPU-bound and shuffle-bound queries.
    if old.get("anchor_sh_s") and new.get("anchor_sh_s") and old.get("anchor_mc_s") and new.get("anchor_mc_s"):
        drift_cpu = new["anchor_mc_s"] / old["anchor_mc_s"]
        drift_sh = new["anchor_sh_s"] / old["anchor_sh_s"]
        axis_ratio = drift_sh / drift_cpu
        if max(axis_ratio, 1 / axis_ratio) > 1.25:
            print(
                f"WARNING: per-axis regime split — CPU-anchor drift {drift_cpu:.2f}x "
                f"vs shuffle-anchor drift {drift_sh:.2f}x (ratio {axis_ratio:.2f}). "
                "No single normalization is valid across query classes; arbitrate "
                "per-axis or re-capture in matching weather."
            )
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
