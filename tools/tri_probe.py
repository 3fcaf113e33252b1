"""Focused re-measure of the graph family (VERDICT r10 item 2): runs
market_basket -> jaccard -> triangles exactly as bench.py orders them,
printing EVERY run's wall time (bench reports only min-of-3, which
hides WHERE the memo build and any plan flip land).

Usage: python tools/tri_probe.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_transaction_spark.plans import REGISTRY
from lakehouse_architecture_transaction_spark.session import get_spark
from lakehouse_architecture_transaction_spark.measure import force_full_result


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("tri-probe", cpus=cpus)
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).count()

    from lakehouse_architecture_transaction_spark.operators.dedup import release_persisted

    for name in ("orders_market_basket", "part_copurchase_jaccard", "part_copurchase_triangles"):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            force_full_result(REGISTRY[name].fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
            release_persisted()
        print(f"{name:32s} {ts}  min={min(ts)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
