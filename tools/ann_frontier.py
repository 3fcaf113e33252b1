"""ANN recall/latency frontier at a given sf dir (default sf0.1).

Runs the five ANN registry queries (exact brute force as ground truth,
then sign-LSH single-probe, Hamming-1 multiprobe, IVF, SQ8), measures
min-of-3 wall time and recall@k against the exact result, and prints a
markdown table. With --update-plans, rewrites the block between the
ANN-FRONTIER markers in PLANS.md so the tuning history lives in-repo.

Usage: python tools/ann_frontier.py [sf_dir] [--update-plans]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("emb_knn_bruteforce", "exact cosine (baseline)"),
    ("emb_ann_lsh", "sign-LSH, variance-selected bits, Hamming-2 shell"),
    ("emb_ann_multiprobe", "sign-LSH, variance-selected bits, Hamming-1 probes"),
    ("emb_ann_ivf", "trained IVF (16 cells), nprobe=2"),
    ("emb_ann_sq8", "int8 scalar-quantized rerank"),
    ("emb_ann_pq_adc", "PQ-ADC shortlist + exact re-rank"),
    ("emb_ann_ivfpq", "IVFPQ: cell pruning + in-list ADC + re-rank"),
]

BEGIN = "<!-- ANN-FRONTIER:BEGIN -->"
END = "<!-- ANN-FRONTIER:END -->"


def run(sf_dir: str) -> list[tuple[str, str, float, float]]:
    import __spark_entry__ as entry
    from lakehouse_architecture_transaction_spark.session import get_spark

    spark = get_spark()
    qs = entry.queries()
    truth: dict[int, set[int]] = {}
    rows_out = []
    for name, desc in VARIANTS:
        fn = qs[name]
        best = float("inf")
        rows = None
        for _ in range(3):
            t0 = time.time()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if name == "emb_knn_bruteforce":
            truth = got
            recall = 1.0
        else:
            hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
            total = sum(len(t) for t in truth.values())
            recall = hits / total if total else float("nan")
        rows_out.append((name, desc, recall, best))
    return rows_out


def table(results: list[tuple[str, str, float, float]], sf_dir: str) -> str:
    k = max(len(r[0]) for r in results)
    lines = [
        f"ANN frontier at `{sf_dir}` (recall@5 vs exact, min-of-3 seconds; "
        "index builds are session-memoized — build once, query many — so "
        "times are SEARCH latency with the build amortized):",
        "",
        "| variant | strategy | recall@5 | time (s) |",
        "|---|---|---|---|",
    ]
    for name, desc, recall, t in results:
        lines.append(f"| `{name:<{k}}` | {desc} | {recall:.3f} | {t:.2f} |")
    return "\n".join(lines)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    md = table(run(sf_dir), sf_dir)
    print(md)
    if "--update-plans" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
        with open(path) as f:
            text = f.read()
        block = f"{BEGIN}\n{md}\n{END}"
        if BEGIN in text:
            pre = text.split(BEGIN)[0]
            post = text.split(END)[1]
            text = pre + block + post
        else:
            text = text.rstrip() + "\n\n## ANN recall/latency frontier\n\n" + block + "\n"
        with open(path, "w") as f:
            f.write(text)
        print(f"\nPLANS.md updated ({path})")


if __name__ == "__main__":
    main()
