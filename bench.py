"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed twice: a warm-up pass at import (session + parquet
footer caching) is NOT done — timings are cold-plan/warm-JVM, matching how
the driver measures. Work is forced with a count() over the result (no
driver-side collect of payload rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from puffbird_spark.queries import QUERIES  # noqa: E402
from puffbird_spark.session import get_spark  # noqa: E402

#: headline set: one per operator family, scale-relevant (the O(n^2)
#: correctness kernels like dedup_jaccard are deliberately excluded —
#: their scale path twins are included instead).
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_semi",
    "join_asof",
    "agg_rollup",
    "agg_collect",
    "window_rank",
    "window_running",
    "sort_topk",
    "engine_to_long_roundtrip",
    "explode_tokens",
    "pivot_returnflag",
    "stream_tumbling",
    "stream_session",
    "hypertable_rollup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_cosine",
    "text_stats",
    "fn_json",
    # round-2 additions: scale-designed operators, one per new family
    "sessionize_events",
    "agg_grouping_sets",
    "agg_skew_salted",
    # round-3 additions (VERDICT r2 #7): the next scale ceilings —
    # MERGE, cluster resolution, incremental refresh, z-order, TF-IDF
    "merge_upsert_customers",
    "dedup_clusters",
    "rollup_incremental",
    "sort_zorder",
    "text_tfidf",
    # round-3 training-pipeline ops
    "text_decontaminate",
    "pack_spanning",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="puffbird-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
    )
    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # one-time JVM/codegen warmup so the first measured query doesn't absorb
    # executor spin-up (~10s); touches one table footer + a tiny shuffle
    t0 = time.time()
    spark.range(1000).groupBy(F.col("id") % 7).count().count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    print(f"# warmup: {time.time() - t0:.3f}s", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
