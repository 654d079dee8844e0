"""Skew utilities: salted aggregation / replicated join must be exactly
equivalent to their unsalted counterparts; partitioned writes must prune."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from puffbird_spark import plans as P
from puffbird_spark.operators.skew import (
    key_histogram,
    replicated_join,
    salted_agg,
)
from puffbird_spark.sources import write_parquet


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one hot key."""
    hot = spark.range(0, 900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(0, 100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_key_histogram_finds_hot_key(skewed):
    top = key_histogram(skewed, ["k"], top=1).collect()
    assert top[0]["k"] == "HOT" and top[0]["count"] == 900


def test_salted_agg_equals_plain(skewed):
    plain = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        (r["k"]): (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            skewed, ["k"],
            {
                "n": (lambda: F.count(F.lit(1)), lambda c: F.sum(c)),
                "total": (lambda: F.sum(F.col("v")), lambda c: F.sum(c)),
                "mx": (lambda: F.max(F.col("v")), lambda c: F.max(c)),
            },
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_replicated_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("HOT", "hot-label")] + [(f"c{i}", f"label{i}") for i in range(10)],
        ["k", "label"],
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in replicated_join(skewed, dim, ["k"], salt_buckets=4).collect()
    )
    assert salted == plain


def test_partitioned_write_prunes(spark, sf_dir):
    """partitionBy layout -> partition pruning on re-read: the filtered scan
    must show PartitionFilters and read fewer rows without a data filter."""
    d = tempfile.mkdtemp(prefix="pbs-part-")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
            "status", F.col("o_orderstatus")
        )
        write_parquet(orders, f"{d}/orders_by_status", partition_by=["status"])
        back = spark.read.parquet(f"{d}/orders_by_status")
        filtered = back.filter(F.col("status") == "O")
        plan = P.formatted_plan(filtered)
        assert "PartitionFilters" in plan and "status" in plan
        n_all = back.count()
        n_open = filtered.count()
        assert 0 < n_open < n_all
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Co-bucketed tables join without an exchange (broadcast disabled to
    force the comparison); results equal the plain join."""
    from puffbird_spark.sources import write_bucketed

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
        write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"])
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        j = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy(
            "o_orderstatus").count()
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).groupBy(
            "o_orderstatus").count()
        # plain plan shuffles both join inputs + the agg; bucketed only aggs
        assert P.count_exchanges(j) < P.count_exchanges(plain)
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_key_skew_stats_constructed(spark):
    from pyspark.sql import functions as F

    from puffbird_spark.operators.skew import key_skew_stats

    # key "hot" has 6 rows; "a"/"b"/"z" have 2 each -> 12 rows, 4 keys
    rows = [("hot",)] * 6 + [("a",)] * 2 + [("b",)] * 2 + [("z",)] * 2
    df = spark.createDataFrame(rows, ["k"])
    r = key_skew_stats(df, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (12, 4, 6)
    assert r["top_key"] == "hot"
    assert r["p50_key_rows"] == 2.0
    assert r["heavy_ratio"] == 2.0  # 6 / (12/4)

    # tie on the max -> smallest key string wins deterministically
    tied = spark.createDataFrame([("x",)] * 3 + [("m",)] * 3, ["k"])
    assert key_skew_stats(tied, "k").collect()[0]["top_key"] == "m"


def test_join_cardinality_predicts_exactly(spark):
    from puffbird_spark.operators.skew import join_cardinality

    left = spark.createDataFrame(
        [(k, i) for k, n in [("a", 3), ("b", 1), ("c", 2)]
         for i in range(n)] + [("only_left", 0)], ["k", "i"])
    right = spark.createDataFrame(
        [(k, i) for k, n in [("a", 4), ("c", 5), ("z", 9)]
         for i in range(n)], ["k", "j"])
    r = join_cardinality(left, right, "k", "k").collect()[0]
    # a: 3*4=12, c: 2*5=10 -> 22 pairs over 2 joint keys, max a=12
    assert r["n_pairs_predicted"] == 22
    assert r["n_keys_joint"] == 2
    assert r["max_key_pairs"] == 12 and r["top_key"] == "a"
    # blowup over the larger side (right: 18 rows)
    assert abs(r["blowup_ratio"] - 22 / 18) < 1e-6
    # the prediction is exact, not an estimate
    assert left.join(right, "k").count() == 22


def test_join_cardinality_disjoint_keys_reads_zero(spark):
    """ADVICE r7: disjoint key sets must predict an honest 0, not NULL."""
    from puffbird_spark.operators.skew import join_cardinality

    left = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "i"])
    right = spark.createDataFrame([("x", 1), ("y", 2)], ["k", "j"])
    r = join_cardinality(left, right, "k", "k").collect()[0]
    assert r["n_pairs_predicted"] == 0
    assert r["n_keys_joint"] == 0
    assert r["max_key_pairs"] == 0
    assert r["blowup_ratio"] == 0.0
