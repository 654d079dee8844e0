"""Source/sink formats (SURVEY §2.2 scans/sinks rows) + remaining engine
ops (R5 expand_col, R11 to_puffy) exercised in the correctness gate.

Format queries materialize a table once to /tmp in the target format, read
it back through the engine's source readers, and aggregate — the oracle
computes the same aggregate from the original parquet, so any
read/write/schema bug breaks the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..engine import FrameEngine
from ..operators.splits import hash_hex_threshold
from ..sources import read_csv, read_json
from .base import dec, load, query


def _materialize(df, path: str, fmt: str, **options) -> str:
    """Write once, reuse thereafter; a partial/corrupt directory (missing
    _SUCCESS or no data files) is rewritten, not silently scanned as empty."""
    def _complete() -> bool:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            return False
        return any(
            f.startswith("part-") and not f.endswith(".crc")
            for f in os.listdir(path)
        )

    if not _complete():
        df.write.mode("overwrite").options(**options).format(fmt).save(path)
    return path


@query("scan_csv", oracle="""
SELECT p_brand, COUNT(*) AS n,
  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM part GROUP BY p_brand
""")
def scan_csv(spark, sf_dir):
    """CSV sink + schema'd CSV scan round-trip: results must equal the
    parquet original."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = _materialize(
        load(spark, sf_dir, "part"), f"/tmp/pbs_fmt{tag}/part_csv", "csv",
        header="true",
    )
    schema = ("p_partkey long, p_name string, p_brand string, p_type string, "
              "p_size int, p_retailprice double")
    df = read_csv(spark, path, schema=schema)
    return df.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("p_retailprice")).cast("double").alias("sum_price"),
    )


@query("scan_json", oracle="""
SELECT c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY c_mktsegment
""")
def scan_json(spark, sf_dir):
    """JSON-lines sink + schema'd JSON scan round-trip."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = _materialize(
        load(spark, sf_dir, "customer"), f"/tmp/pbs_fmt{tag}/customer_json",
        "json",
    )
    schema = ("c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string")
    df = read_json(spark, path, schema=schema)
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


@query("engine_to_puffy", oracle="""
SELECT l_orderkey,
  array_to_string(list_transform(
    list(l_quantity ORDER BY l_linenumber, l_quantity),
    x -> CAST(x AS VARCHAR)), ',') AS qtys
FROM lineitem GROUP BY l_orderkey
""")
def engine_to_puffy(spark, sf_dir):
    """R11 to_puffy in the gate: nest quantities per order in linenumber
    order, canonicalized to a string for cross-engine hashing."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    eng = FrameEngine(li, indexcols=["l_orderkey", "l_linenumber"], validate=False)
    puffy = eng.to_puffy("l_orderkey", sort_by=["l_linenumber"])
    return puffy.table.select(
        "l_orderkey",
        F.array_join(
            F.transform(F.col("l_quantity"), lambda x: x.cast("string")), ","
        ).alias("qtys"),
    )


@query("engine_expand_col", oracle="""
SELECT l_orderkey,
  CAST(row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_quantity) - 1 AS INT)
    AS items_level0,
  l_linenumber, l_quantity
FROM lineitem
""")
def engine_expand_col(spark, sf_dir):
    """R5 expand_col in the gate: frame-valued cells (array<struct>)
    vertically expanded with the element position as a new index column."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("items")
    )
    eng = FrameEngine(nested, indexcols=["l_orderkey"], validate=False)
    out = eng.expand_col("items")
    return out.table.select(
        "l_orderkey", "items_level0", "l_linenumber", "l_quantity"
    )


@query("engine_zip_explode", oracle="""
SELECT l_orderkey,
  CAST(row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_quantity,
                                   l_extendedprice) - 1 AS INT) AS pos,
  l_quantity, l_extendedprice
FROM lineitem
""")
def engine_zip_explode(spark, sf_dir):
    """Fused shared-axis explosion (arrays_zip + one posexplode, no join):
    nest two parallel arrays per order, zip-explode them back — positions
    and pairs must reproduce the originals."""
    from ..explode import zip_explode

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity",
                                    "l_extendedprice"))
        ).alias("items")
    ).select(
        "l_orderkey",
        F.transform("items", lambda s: s["l_quantity"]).alias("l_quantity"),
        F.transform("items", lambda s: s["l_extendedprice"])
        .alias("l_extendedprice"),
    )
    return zip_explode(
        nested, ["l_orderkey"], ["l_quantity", "l_extendedprice"], "pos"
    )


@query("sample_fraction", oracle="""
SELECT n_total,
  CAST(floor(CAST(0.1 AS DOUBLE) * n_total
             - 6 * sqrt(n_total * CAST(0.09 AS DOUBLE))) AS BIGINT) AS lo,
  CAST(ceil(CAST(0.1 AS DOUBLE) * n_total
            + 6 * sqrt(n_total * CAST(0.09 AS DOUBLE))) AS BIGINT) AS hi,
  TRUE AS within
FROM (SELECT COUNT(*) AS n_total FROM lineitem)
""")
def sample_fraction(spark, sf_dir):
    """Seeded Bernoulli sample, SELF-CHECKING (round-3 VERDICT #5): exact
    membership is partitioning-dependent by design, so the gate emits the
    statistical *bound* — the 6-sigma binomial window [lo, hi] computed
    from the exact total on BOTH engines (identical double arithmetic =>
    identical floor/ceil), plus ``within`` = sampled count inside the
    window. A broken sampler (wrong fraction, double-sampling) lands
    outside 6 sigma and flips the boolean (observed 5971 in [5559,
    6441])."""
    li = load(spark, sf_dir, "lineitem")
    totals = li.agg(F.count(F.lit(1)).alias("n_total"))
    sampled = li.sample(fraction=0.1, seed=42).agg(
        F.count(F.lit(1)).alias("n_samp")
    )
    n = F.col("n_total")
    lo = F.floor(0.1 * n - 6 * F.sqrt(n * 0.09)).cast("long")
    hi = F.ceil(0.1 * n + 6 * F.sqrt(n * 0.09)).cast("long")
    return totals.crossJoin(sampled).select(
        "n_total", lo.alias("lo"), hi.alias("hi"),
        ((F.col("n_samp") >= lo) & (F.col("n_samp") <= hi)).alias("within"),
    )


@query("engine_to_long_fused", oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_quantity, l_extendedprice,
    CAST(row_number() OVER (PARTITION BY l_orderkey
         ORDER BY l_linenumber, l_quantity, l_extendedprice) - 1 AS INT) AS pos
  FROM lineitem)
SELECT q.l_orderkey,
  q.pos AS l_quantity_level0, q.l_quantity,
  p.pos AS l_extendedprice_level0, p.l_extendedprice
FROM ranked q JOIN ranked p USING (l_orderkey)
""")
def engine_to_long_fused(spark, sf_dir):
    """Multi-column to_long under the FUSED strategy (sequential
    generators, zero joins): two nested columns explode to the per-order
    cartesian product — the oracle replays it as a self-join of ranked
    rows."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity",
                                    "l_extendedprice"))
        ).alias("items")
    ).select(
        "l_orderkey",
        F.transform("items", lambda s: s["l_quantity"]).alias("l_quantity"),
        F.transform("items", lambda s: s["l_extendedprice"])
        .alias("l_extendedprice"),
    )
    eng = FrameEngine(nested, indexcols=["l_orderkey"], validate=False)
    return eng.to_long("l_quantity", "l_extendedprice", strategy="fused")


@query("multimodal_meta", oracle="""
SELECT CAST(doc_id AS VARCHAR) AS path,
  CAST(strlen(text) AS BIGINT) AS size_bytes,
  md5(text) AS digest,
  CAST(strlen(text) AS BIGINT) AS meta_size
FROM documents
""")
def multimodal_meta(spark, sf_dir):
    """Multimodal plumbing in the gate: an opaque binary column (utf-8
    document bytes standing in for media blobs) flows through
    with_media_meta and the Arrow-batched mapInPandas decode stage;
    byte length and md5 digest are hash-checked against DuckDB (the
    feature kernel itself is a deterministic stub, unit-tested)."""
    from ..operators.multimodal import decode_features, with_media_meta

    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    meta = with_media_meta(docs, media_type="text", fmt="utf8")
    decoded = decode_features(meta)
    sizes = meta.select("path", F.col("meta.size_bytes").alias("meta_size"))
    return (
        decoded.join(sizes, on="path")
        .select("path", "size_bytes", "digest", "meta_size")
    )


@query("multimodal_decode", oracle="""
SELECT CAST(doc_id AS VARCHAR) AS path, 'png' AS fmt,
  CAST(1 + doc_id % 16 AS INT) AS width,
  CAST(1 + doc_id % 12 AS INT) AS height
FROM documents
""")
def multimodal_decode(spark, sf_dir):
    """REAL image decode in the gate: every document gets a genuine PNG
    blob (stdlib-zlib encoder, CRC-correct chunks) with dimensions derived
    from doc_id; the mapInPandas decode stage parses the PNG IHDR header
    back (pure Python, ``parse_image_header``) and the recovered
    (format, width, height) hash-match the closed-form oracle. The former
    decode stub is gone — this exercises the real 100 TB media path:
    synth/ingest -> Arrow batches -> header decode, zero shuffles."""
    import pandas as pd

    from ..operators.multimodal import decode_features, encode_png

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_png(1 + int(i) % 16, 1 + int(i) % 12,
                                 seed=int(i) % 251)
        )

    # no annotations: postponed-annotations mode breaks signature inference
    make_png = F.pandas_udf(_make, returnType="binary")

    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_png(F.col("doc_id")).alias("content"),
    )
    decoded = decode_features(docs)
    return decoded.select(
        "path", F.col("format").alias("fmt"), "width", "height"
    )


@query("to_xarray_guarded", oracle="""
SELECT c_nationkey, c_mktsegment,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal)
    AS c_acctbal
FROM customer GROUP BY c_nationkey, c_mktsegment
""")
def to_xarray_guarded(spark, sf_dir):
    """The distributed half of the xarray bridge (exact-decimal mean over
    the dim grid + the driver-OOM size guard — the guard's bounded count
    RUNS in this gate); only the final collect/convert is driver-side."""
    cust = load(spark, sf_dir, "customer")
    eng = FrameEngine(cust, indexcols=["c_custkey"], validate=False)
    return eng.to_xarray_frame("c_acctbal", "c_nationkey", "c_mktsegment")


@query("scan_parquet_partitioned", oracle="""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY c_mktsegment, c_nationkey
""")
def scan_parquet_partitioned(spark, sf_dir):
    """Hive-partitioned parquet sink + scan round-trip: write customer
    partitioned by segment, read it back, aggregate per (partition col,
    data col) — any partition-encoding or pruning bug breaks the hash.
    The filter-less read still exercises partition-column reconstruction
    (segment comes from directory names, not file data)."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/customer_part_parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load(spark, sf_dir, "customer").write.mode("overwrite").partitionBy(
            "c_mktsegment"
        ).parquet(path)
    df = spark.read.parquet(path)
    return df.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


def _zvalue_oracle(bits: int = 8) -> str:
    """DuckDB twin of the unrolled Morton interleave (2 columns)."""
    terms = []
    for i in range(bits):
        terms.append(f"((a >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((b >> {i}) & 1) * {1 << (2 * i + 1)}")
    expr = "\n    + ".join(terms)
    return f"""
WITH t AS (SELECT l_orderkey, l_linenumber,
             l_partkey % 256 AS a, l_suppkey % 256 AS b
           FROM lineitem)
SELECT l_orderkey, l_linenumber,
  CAST({expr} AS BIGINT) AS z
FROM t
"""


@query("sort_zorder", oracle=_zvalue_oracle())
def sort_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key: the bit-interleave that makes a
    range-partitioned write skippable on EVERY interleaved column
    (operators/layout.py). The interleave itself is closed-form bit
    arithmetic — hash-checked per row against the oracle's unrolled
    twin."""
    from ..operators.layout import z_value

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        (F.col("l_partkey") % 256).alias("a"),
        (F.col("l_suppkey") % 256).alias("b"),
    )
    return li.select(
        "l_orderkey", "l_linenumber",
        z_value(["a", "b"], bits=8).alias("z"),
    )


@query("sample_stratified", oracle="""
WITH t AS (
  SELECT l_returnflag, COUNT(*) AS n_total,
    CAST(CASE l_returnflag WHEN 'A' THEN 0.05 WHEN 'N' THEN 0.02
         ELSE 0.1 END AS DOUBLE) AS f
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n_total,
  CAST(floor(f * n_total - 6 * sqrt(n_total * f * (1 - f))) AS BIGINT) AS lo,
  CAST(ceil(f * n_total + 6 * sqrt(n_total * f * (1 - f))) AS BIGINT) AS hi,
  TRUE AS within
FROM t
""")
def sample_stratified(spark, sf_dir):
    """Per-stratum Bernoulli sampling (sampleBy), SELF-CHECKING (round-3
    VERDICT #5): like sample_fraction, but the 6-sigma binomial window is
    computed per stratum at that stratum's rate — the class-rebalancing
    primitive verified per class. ``within`` flips if any stratum's
    sampled count leaves its window (a swapped rate map would)."""
    li = load(spark, sf_dir, "lineitem")
    fractions = {"A": 0.05, "N": 0.02, "R": 0.1}
    f = (
        F.when(F.col("l_returnflag") == "A", F.lit(0.05))
        .when(F.col("l_returnflag") == "N", F.lit(0.02))
        .otherwise(F.lit(0.1))
    )
    totals = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total")
    ).withColumn("f", f)
    sampled = (
        li.sampleBy("l_returnflag", fractions=fractions, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_samp"))
    )
    n, fr = F.col("n_total"), F.col("f")
    lo = F.floor(fr * n - 6 * F.sqrt(n * fr * (1 - fr))).cast("long")
    hi = F.ceil(fr * n + 6 * F.sqrt(n * fr * (1 - fr))).cast("long")
    return totals.join(sampled, "l_returnflag").select(
        "l_returnflag", "n_total", lo.alias("lo"), hi.alias("hi"),
        ((F.col("n_samp") >= lo) & (F.col("n_samp") <= hi)).alias("within"),
    )


@query("join_bucketed", oracle="""
SELECT o.o_custkey AS o_custkey, c.c_name AS c_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey, c.c_name
""")
def join_bucketed(spark, sf_dir):
    """Co-located fact-fact join via bucketing: both sides pre-bucketed
    (16 buckets, sorted) on the join key, so the sort-merge join AND the
    downstream per-customer aggregate run with ZERO Exchange — the write
    pays the shuffle once, every later join on the key is shuffle-free.
    Plan-asserted (no Exchange, SMJ engaged via merge hint so the result
    exercises co-location rather than a small-side broadcast)."""
    from ..operators.layout import bucketed_table

    tag = sf_dir.rstrip("/").replace("/", "_").replace(".", "_")
    ob = bucketed_table(
        spark, load(spark, sf_dir, "orders"),
        f"pbs_orders_bkt{tag}", "o_custkey", buckets=16,
    )
    cb = bucketed_table(
        spark, load(spark, sf_dir, "customer"),
        f"pbs_customer_bkt{tag}", "c_custkey", buckets=16,
    )
    o = spark.table(ob)
    c = spark.table(cb).hint("merge")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------- #
# deterministic corpus splits (operators/splits.py) — the md5 draw is
# bit-for-bit reproducible in DuckDB, so membership, quota mixtures and
# the global shuffle rank are all hash-matched END TO END (the module's
# round-3 "oracle-checkable" claim, now actually gated).
# --------------------------------------------------------------------- #

_SPLIT_T80 = hash_hex_threshold(0.8)
_SPLIT_T90 = hash_hex_threshold(0.8 + 0.1)


def _enc_sql(expr: str) -> str:
    """DuckDB replay of splits._len_prefixed: the length-prefixed salt
    component ``v<len>:<value>`` (round-5: retired the NUL-byte NULL
    sentinel). The gate keys are primary-key columns, never NULL, so the
    SQL skips the ``n`` branch the Spark side would take for NULL."""
    v = f"CAST({expr} AS VARCHAR)"
    return f"'v' || CAST(length({v}) AS VARCHAR) || ':' || {v}"


@query("split_hash_membership", oracle=f"""
SELECT o_orderkey,
  CASE
    WHEN substr(md5('split:' || {_enc_sql('o_orderkey')}), 1, 16)
         < '{_SPLIT_T80}' THEN 'train'
    WHEN substr(md5('split:' || {_enc_sql('o_orderkey')}), 1, 16)
         < '{_SPLIT_T90}' THEN 'val'
    ELSE 'test'
  END AS split
FROM orders
""")
def split_hash_membership(spark, sf_dir):
    """Content-deterministic train/val/test assignment (80/10/10) keyed on
    o_orderkey: a pure scan-local projection, zero shuffles, append-stable.
    The oracle replays the identical md5-prefix threshold cascade, so every
    row's membership is hash-checked bit-for-bit."""
    from ..operators.splits import hash_split

    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    return hash_split(
        orders, "o_orderkey",
        weights={"train": 0.8, "val": 0.1, "test": 0.1}, seed="split",
    )


_QUOTA_FULL = hash_hex_threshold(1.0)
_QUOTA_T30 = hash_hex_threshold(0.3)
_QUOTA_T05 = hash_hex_threshold(0.05)
_QUOTA_T0 = hash_hex_threshold(0.0)


@query("split_quota_mixture", oracle=f"""
SELECT doc_id, source
FROM documents
WHERE substr(md5('quota:' || {_enc_sql('doc_id')}), 1, 16) <
  CASE source
    WHEN 'src0' THEN '{_QUOTA_FULL}'
    WHEN 'src1' THEN '{_QUOTA_T30}'
    WHEN 'src2' THEN '{_QUOTA_T05}'
    ELSE '{_QUOTA_T0}'
  END
""")
def split_quota_mixture(spark, sf_dir):
    """Mixture-weight sampling ("keep 100% of src0, 30% of src1, 5% of
    src2, drop the rest"): one deterministic filter, no shuffle. The
    src0 rate of 1.0 gates the round-3 boundary bug (fraction=1.0 used
    to keep ~1/16) — the oracle's CASE compares against the same 'g'
    sentinel, so a regression breaks both the row count and the hash."""
    from ..operators.splits import quota_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return quota_sample(
        docs, key="doc_id", domain="source",
        rates={"src0": 1.0, "src1": 0.3, "src2": 0.05},
        seed="quota", default_rate=0.0,
    )


_STRATA_T50 = hash_hex_threshold(0.5)


@query("split_stratified", oracle=f"""
SELECT c_custkey, c_mktsegment, c_nationkey
FROM customer
WHERE substr(md5(
    'strata:'
    || {_enc_sql('c_mktsegment')}
    || {_enc_sql('c_nationkey')}
    || ':' || {_enc_sql('c_custkey')}), 1, 16) < '{_STRATA_T50}'
""")
def split_stratified(spark, sf_dir):
    """Equal-rate deterministic sample within every (segment, nation)
    stratum. The stratum salt is length-prefixed per component (round-3
    ADVICE: raw '|' delimiters alias strata and NULLs vanish), and the
    oracle rebuilds the exact same salt string — membership hash-checked
    end to end."""
    from ..operators.splits import stratified_quota

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    return stratified_quota(
        cust, key="c_custkey", strata=["c_mktsegment", "c_nationkey"],
        fraction=0.5, seed="strata",
    )


@query("split_shuffle_order", oracle=f"""
SELECT o_orderkey,
  CAST(row_number() OVER (
    ORDER BY substr(md5('shuffle:' || {_enc_sql('o_orderkey')}), 1, 16),
             o_orderkey) AS BIGINT) AS shuffle_rank
FROM orders
""")
def split_shuffle_order(spark, sf_dir):
    """Global deterministic shuffle rank. Scale shape (round-3 ADVICE fix):
    range-partition on the draw, per-partition row_number, broadcast
    per-partition offsets — two balanced exchanges, NO unpartitioned
    window over the data. The oracle computes the same total order with a
    single-threaded row_number, proving the distributed two-phase rank is
    bit-identical to the naive one."""
    from ..operators.splits import shuffle_order

    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    return shuffle_order(orders, key="o_orderkey", seed="shuffle")


@query("split_token_budget", oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
    substr(md5('budget:' || {_enc_sql('doc_id')}), 1, 16) AS draw
  FROM documents),
c AS (
  SELECT doc_id, source, n_chars,
    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY draw, doc_id)
         AS BIGINT) AS cum_tokens
  FROM d)
SELECT doc_id, source, n_chars, cum_tokens
FROM c
WHERE cum_tokens <= CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2500
                    ELSE 1500 END
""")
def split_token_budget(spark, sf_dir):
    """Per-domain TOKEN budget mixture ("4000 tokens of src0, 2500 of
    src1, 1500 of everything else"): documents taken in deterministic
    hash order until each domain's running token total reaches its
    budget. The running sum is a grouped prefix-sum in the two-exchange
    shape (range partition + local window + broadcast offsets) — a
    dominant domain never becomes a single task, unlike
    Window.partitionBy(domain). The oracle replays the identical order
    and running sum single-threaded; membership AND the cumulative total
    are hash-checked row by row."""
    from ..operators.splits import token_budget_sample

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = token_budget_sample(
        docs, key="doc_id", domain="source", tokens_col="n_chars",
        budgets={"src0": 4000, "src1": 2500}, seed="budget",
        default_budget=1500,
    )
    return out.select("doc_id", "source", "n_chars", "cum_tokens")


@query("split_cap_per_group", oracle=f"""
WITH d AS (
  SELECT o_orderkey, o_custkey,
    substr(md5('cap:' || {_enc_sql('o_orderkey')}), 1, 16) AS draw
  FROM orders),
r AS (
  SELECT o_orderkey, o_custkey,
    CAST(row_number() OVER (PARTITION BY o_custkey
                            ORDER BY draw, o_orderkey) AS BIGINT) AS rk
  FROM d)
SELECT o_orderkey, o_custkey, rk FROM r WHERE rk <= 3
""")
def split_cap_per_group(spark, sf_dir):
    """Deterministic k-per-group cap ("at most 3 orders per customer" —
    the per-host page cap of a crawl pipeline): rank over the seeded
    hash draw within each group, keep rank <= k. Append-stable and
    layout-independent; membership AND the hash-order rank are replayed
    row by row by the oracle's row_number."""
    from ..operators.splits import cap_per_group

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return cap_per_group(
        orders, key="o_orderkey", group_cols=["o_custkey"], k=3,
        seed="cap", rank_col="rk",
    ).select("o_orderkey", "o_custkey", F.col("rk").cast("long").alias("rk"))


@query("scan_schema_evolution", oracle="""
SELECT doc_id, n_chars, CAST(NULL AS VARCHAR) AS lang_up
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, n_chars, upper(lang) AS lang_up
FROM documents WHERE doc_id % 2 = 1
""")
def scan_schema_evolution(spark, sf_dir):
    """Schema-evolution scan: two parquet shards written at different
    pipeline generations — the second gained a ``lang_up`` column — read
    back as ONE table with ``mergeSchema=true``; old-shard rows surface
    NULL for the new column. This is the append-only reality of a
    100 TB corpus (schemas grow; historical shards are never
    rewritten): the reader must reconcile footers per file, not trust
    the first one. Row content is hash-checked per shard half against
    the originating table. mergeSchema costs a per-file footer read at
    planning time, so production tables should pin the union schema in
    the catalog — the gate exercises the reconciliation path itself."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_evolving_parquet"
    if not os.path.exists(os.path.join(path, "gen2", "_SUCCESS")):
        docs = load(spark, sf_dir, "documents")
        docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "n_chars"
        ).write.mode("overwrite").parquet(f"{path}/gen1")
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "n_chars", F.upper("lang").alias("lang_up")
        ).write.mode("overwrite").parquet(f"{path}/gen2")
    return spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen1", f"{path}/gen2"
    ).select("doc_id", "n_chars", "lang_up")


@query("split_weighted_sample", oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
    (('0x' || substr(md5('wsample:' || {_enc_sql('doc_id')}), 1, 16))
       ::UBIGINT::DOUBLE + 0.5) / 18446744073709551616.0 AS u
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
r AS (
  SELECT doc_id, source, n_chars,
    CAST(row_number() OVER (PARTITION BY source
                            ORDER BY ln(u) / n_chars DESC, doc_id)
         AS BIGINT) AS rk
  FROM d)
SELECT doc_id, source, n_chars FROM r WHERE rk <= 25
""")
def split_weighted_sample(spark, sf_dir):
    """Deterministic weighted 25-per-source sample WITHOUT replacement
    (Efraimidis-Spirakis exponential keys, weight = n_chars): inclusion
    odds proportional to document length within each source, yet
    membership is a pure function of (doc_id, n_chars) — append-stable
    and layout-independent like every split draw. The oracle replays the
    identical uniform (md5-prefix -> double) and the ln(u)/w ranking, so
    every selected row is hash-checked. The ES key itself is not emitted
    (its last-ulp float digits are libm-specific; the ORDER it induces
    is not)."""
    from ..operators.splits import weighted_sample

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    return weighted_sample(
        docs, key="doc_id", weight_col="n_chars", k=25,
        group_cols=["source"], seed="wsample",
    )


@query("split_token_budget_weighted", oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars, (n_chars % 97) + 1 AS quality,
    (('0x' || substr(md5('wbudget:' || {_enc_sql('doc_id')}), 1, 16))
       ::UBIGINT::DOUBLE + 0.5) / 18446744073709551616.0 AS u
  FROM documents),
c AS (
  SELECT doc_id, source, n_chars, quality,
    CAST(SUM(n_chars) OVER (
      PARTITION BY source
      ORDER BY ln(u) / quality DESC, doc_id) AS BIGINT) AS cum_tokens
  FROM d)
SELECT doc_id, source, n_chars, CAST(quality AS BIGINT) AS quality,
       cum_tokens
FROM c
WHERE cum_tokens <= CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2500
                    ELSE 1500 END
""")
def split_token_budget_weighted(spark, sf_dir):
    """Quality-weighted per-domain token budget (the
    token_budget x weighted_sample fusion, round-6 NOTES candidate):
    each source's token budget fills in DESCENDING Efraimidis-Spirakis
    key order over a synthetic quality score ((n_chars % 97) + 1 — any
    positive column works), so high-quality documents are preferentially
    retained while the budget is still never exceeded. One grouped
    prefix-sum over the ES order (two balanced exchanges — a dominant
    source never becomes one task) + a scan-local CASE filter. The
    oracle replays the identical uniform draw, ES ordering, and running
    total, hash-checking membership AND cumulative token counts row by
    row."""
    from ..operators.splits import token_budget_weighted

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).withColumn("quality", F.col("n_chars") % 97 + 1)
    out = token_budget_weighted(
        docs, key="doc_id", domain="source", tokens_col="n_chars",
        weight_col="quality", budgets={"src0": 4000, "src1": 2500},
        seed="wbudget", default_budget=1500,
    )
    return out.select(
        "doc_id", "source", "n_chars",
        F.col("quality").cast("long").alias("quality"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


@query("pack_token_budget", oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
    substr(md5('pack:' || {_enc_sql('doc_id')}), 1, 16) AS draw
  FROM documents WHERE n_chars > 0),
c AS (
  SELECT doc_id, source, n_chars,
    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY draw, doc_id)
         AS BIGINT) AS cum_tokens
  FROM d),
k AS (
  SELECT * FROM c
  WHERE cum_tokens <= CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2500
                      ELSE 1500 END)
SELECT doc_id, source, n_chars AS n_tokens, cum_tokens,
  cum_tokens - n_chars AS start_offset,
  CAST(floor((cum_tokens - n_chars) / 512.0) AS BIGINT) AS first_pack,
  CAST(floor((cum_tokens - 1) / 512.0) AS BIGINT) AS last_pack,
  CAST(floor((cum_tokens - 1) / 512.0)
       - floor((cum_tokens - n_chars) / 512.0) + 1 AS BIGINT)
    AS n_packs_spanned
FROM k
""")
def pack_token_budget(spark, sf_dir):
    """FUSED per-domain token-budget mixture + spanning sequence packing
    (round-5 NOTES candidate): because the budget filter is prefix-closed
    in hash order, ONE grouped prefix-sum (two balanced exchanges, no
    per-domain task) yields both the budget cutoff and every selected
    document's packing offset / seq_len-context span — where the unfused
    pipeline (token_budget_sample then pack_spanning) pays a second
    prefix-sum structure and a reshuffle. Membership, running totals, and
    pack spans are all hash-checked against the single-threaded oracle."""
    from ..operators.packing import pack_token_budget as ptb

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = ptb(
        docs, key="doc_id", domain="source", tokens_col="n_chars",
        budgets={"src0": 4000, "src1": 2500}, seq_len=512, seed="pack",
        default_budget=1500,
    )
    return out.select(
        "doc_id", "source", "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("start_offset").cast("long").alias("start_offset"),
        "first_pack", "last_pack",
        F.col("n_packs_spanned").cast("long").alias("n_packs_spanned"),
    )


@query("split_length_batches", oracle=f"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN n_chars <= 200 THEN 0 WHEN n_chars <= 350 THEN 1
         WHEN n_chars <= 500 THEN 2 ELSE 3 END AS bucket,
    substr(md5('batch:' || {_enc_sql('doc_id')}), 1, 16) AS draw
  FROM documents),
r AS (
  SELECT doc_id, bucket,
    row_number() OVER (PARTITION BY bucket ORDER BY draw, doc_id) AS rk
  FROM d)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
  CAST(floor((rk - 1) / 8) AS BIGINT) AS batch_idx,
  CAST((rk - 1) % 8 AS BIGINT) AS pos_in_batch
FROM r
""")
def split_length_batches(spark, sf_dir):
    """Length-bucketed batch assignment: sequences bucketed by length
    (edges 200/350/500 chars) and dealt into batches of 8 in
    deterministic hash order — the padding-minimizing batching step of a
    training data loader. The per-bucket rank is a grouped prefix COUNT
    (two balanced exchanges, no per-bucket single task); bucket, batch id
    and position are all hash-checked against the single-threaded
    row_number oracle."""
    from ..operators.splits import length_bucket_batches

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = length_bucket_batches(
        docs, key="doc_id", length_col="n_chars", batch_size=8,
        bucket_edges=[200, 350, 500], seed="batch",
    )
    return out.select(
        "doc_id", F.col("bucket").cast("int").alias("bucket"),
        "batch_idx", "pos_in_batch",
    )


@query("scan_orc", oracle="""
SELECT s_nationkey, COUNT(*) AS n,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM supplier GROUP BY s_nationkey
""")
def scan_orc(spark, sf_dir):
    """ORC sink + scan round-trip (columnar sibling of the parquet path;
    Spark's ORC reader has the same pushdown/pruning surface). DuckDB
    cannot read ORC, so the oracle aggregates the ORIGINAL parquet — any
    write/read/schema bug on the ORC path breaks the hash."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = _materialize(
        load(spark, sf_dir, "supplier"), f"/tmp/pbs_fmt{tag}/supplier_orc",
        "orc",
    )
    df = spark.read.orc(path)
    return df.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("s_acctbal")).cast("double").alias("sum_bal"),
    )


@query("sink_compact_small_files", oracle="""
SELECT doc_id, source, n_chars, TRUE AS compact_ok
FROM documents
""")
def sink_compact_small_files(spark, sf_dir):
    """Small-file compaction round-trip (`compact_small_files`,
    operators/layout.py): the documents table is first written as 64
    tiny files (a streaming sink's accumulation pattern), then compacted
    to a file count derived from total input bytes — listing metadata
    only, no data read. The gate hash-checks that every row survives
    compaction byte-identically and self-checks ``compact_ok``: the
    rewrite actually reduced the file count to the computed target."""
    import os

    from ..operators.layout import compact_small_files

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = f"/tmp/pbs_fmt{tag}/compact"
    frag, packed = f"{base}/frag", f"{base}/packed"
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    marker = f"{base}/_DONE"
    if not os.path.exists(marker):
        docs.repartition(64).write.mode("overwrite").parquet(frag)
        stats = compact_small_files(
            spark, frag, packed, target_file_bytes=1 << 20)
        ok = (stats["n_files_in"] == 64
              and stats["n_files_out"] < stats["n_files_in"])
        with open(marker, "w") as fh:
            fh.write("1" if ok else "0")
    with open(marker) as fh:
        ok = fh.read().strip() == "1"
    return spark.read.parquet(packed).select(
        "doc_id", "source", "n_chars", F.lit(ok).alias("compact_ok"))


@query("scan_time_travel", oracle="""
SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 = 0
""")
def scan_time_travel(spark, sf_dir):
    """Manifest-based snapshot time travel (`operators/layout.py`):
    version 1 of the table holds one third of the documents; version 2
    APPENDS another third (one new shard + one manifest JSON — no data
    rewrite, the Iceberg/Delta mechanism reduced to its essentials).
    The gate reads AS OF version 1 *after* version 2 was committed and
    hash-checks it against the original v1 row set — proving the pinned
    manifest isolates the snapshot from later appends. At 100 TB this
    is what makes "train run X used corpus snapshot v12" a metadata
    statement instead of a table copy."""
    from ..operators.layout import (
        read_snapshot, snapshot_versions, write_snapshot)

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_snapshots"
    if len(snapshot_versions(spark, path)) < 2:
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars")
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 0), path)
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 1), path)
    return read_snapshot(spark, path, version=1).select(
        "doc_id", "source", "n_chars")


@query("table_vacuum", oracle="""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       TRUE AS retention_ok
FROM documents WHERE doc_id % 3 IN (1, 2)
GROUP BY source
""")
def table_vacuum(spark, sf_dir):
    """Snapshot retention (`vacuum_snapshots`, operators/layout.py —
    the VACUUM half of table maintenance, compaction being OPTIMIZE):
    the fixture commits v1 (doc_id%3==0), v2 append (%3==1), v3
    OVERWRITE (%3==2), v4 append (%3==1); vacuum with keep_last=2
    deletes the v1/v2 manifests and the shards only they referenced —
    a metadata decision plus per-dead-shard recursive deletes, no data
    read, manifests deleted first so a crash strands orphans rather
    than dangling manifests. The gate then aggregates the LATEST
    version read back from the vacuumed table (%3 in {1,2} — the
    overwrite semantics must survive retention) and pins
    `retention_ok`: exactly the last two versions remain and the
    vacuumed v1 is unreadable. Stateless booleans, so replays (bench
    warm runs) see the already-vacuumed table and still hash-match."""
    from ..operators.layout import (
        read_snapshot, snapshot_versions, vacuum_snapshots, write_snapshot)

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_vacuum_snapshots"
    if not snapshot_versions(spark, path):
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars")
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 0), path)
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 1), path)
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 2), path,
                       mode="overwrite")
        write_snapshot(spark, docs.filter(F.col("doc_id") % 3 == 1), path)
    vacuum_snapshots(spark, path, keep_last=2)
    versions = snapshot_versions(spark, path)
    v1_unreadable = False
    try:
        read_snapshot(spark, path, version=1)
    except ValueError:
        v1_unreadable = True
    ok = versions == [3, 4] and v1_unreadable
    return (
        read_snapshot(spark, path)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("n_chars").cast("long").alias("sum_chars"))
        .withColumn("retention_ok", F.lit(ok))
    )


@query("scan_bloom_skipping", oracle="""
SELECT CAST(1 AS BIGINT) AS probe_id,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
  TRUE AS files_pruned_ok
FROM documents WHERE doc_id = 1
UNION ALL
SELECT CAST(100 AS BIGINT) AS probe_id,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
  TRUE AS files_pruned_ok
FROM documents WHERE doc_id = 100
UNION ALL
SELECT CAST(400 AS BIGINT) AS probe_id,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
  TRUE AS files_pruned_ok
FROM documents WHERE doc_id = 400
UNION ALL
SELECT CAST(999999999 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE
""")
def scan_bloom_skipping(spark, sf_dir):
    """Per-file Bloom-index skipping (`file_bloom_index` /
    `bloom_pruned_lookup`, operators/layout.py): documents written
    hash-scattered by doc_id across 8 files — the layout where min/max
    skipping keeps EVERYTHING (every file spans the full id range) —
    then point lookups read only the files whose Bloom words contain
    all k probe bits. No false negatives (results equal the full-scan
    filter — the row contents are in the hash), false positives only
    cost reads; `files_pruned_ok` pins that present keys read FEWER
    than all files and the absent key reads NONE. Probe literals cast
    to the column type before hashing (xxhash64 is type-dependent —
    an int-vs-bigint probe is a silent false negative, caught during
    development). The index is file-count-sized metadata, refreshed
    per-append for new files only."""
    import os

    from ..operators.layout import bloom_pruned_lookup, file_bloom_index

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_bloom_scatter"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load(spark, sf_dir, "documents").repartition(
            8, "doc_id").write.mode("overwrite").parquet(path)
    index = file_bloom_index(spark, path, "doc_id").localCheckpoint(
        eager=True)
    out = []
    for probe in (1, 100, 400, 999999999):
        df, n_read, n_total = bloom_pruned_lookup(
            spark, path, "doc_id", probe, index=index)
        row = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long")
            .alias("sum_chars"),
        ).collect()[0]
        pruned_ok = (n_read < n_total) if row["n_rows"] > 0 else (n_read == 0)
        out.append((probe, row["n_rows"], row["sum_chars"], bool(pruned_ok)))
    return spark.createDataFrame(
        out, "probe_id long, n_rows long, sum_chars long, "
             "files_pruned_ok boolean")


@query("scan_schema_diff", oracle="""
SELECT * FROM (VALUES
  ('lang', 'added', CAST(NULL AS VARCHAR), 'string'),
  ('n_chars', 'type_changed', 'bigint', 'int'),
  ('source', 'removed', 'string', CAST(NULL AS VARCHAR)))
  AS t("column", change, type_from, type_to)
""")
def scan_schema_diff(spark, sf_dir):
    """Schema drift between snapshot versions (`snapshot_schema_diff`,
    operators/layout.py): v1 carries (doc_id, source, n_chars bigint),
    v2 OVERWRITES with (doc_id, lang, n_chars int) — the diff must
    report lang added, source removed, n_chars type-changed, and stay
    silent on the unchanged doc_id. Metadata-only both ways: schemas
    come from parquet footers via mergeSchema reconciliation and the
    comparison is column-count-sized — the migration audit run before
    pointing consumers at a new corpus version, at any table size."""
    from ..operators.layout import (
        snapshot_schema_diff, snapshot_versions, write_snapshot)

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_schema_diff_snapshots"
    if len(snapshot_versions(spark, path)) < 2:
        docs = load(spark, sf_dir, "documents")
        write_snapshot(
            spark, docs.select("doc_id", "source", "n_chars"), path)
        write_snapshot(
            spark,
            docs.select("doc_id", "lang",
                        F.col("n_chars").cast("int").alias("n_chars")),
            path, mode="overwrite")
    return snapshot_schema_diff(spark, path, 1, 2)


@query("scan_data_skipping", oracle="""
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       TRUE AS files_pruned_ok
FROM lineitem
WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-02-28'
GROUP BY l_returnflag
""")
def scan_data_skipping(spark, sf_dir):
    """File-level min/max data skipping (`file_stats`/`pruned_read`,
    operators/layout.py — the Delta/Iceberg stats-manifest mechanism):
    lineitem is written range-partitioned + sorted on l_shipdate (8
    files with tight date ranges), a file-count-sized stats table is
    built in ONE grouped scan, and a two-month predicate reads ONLY the
    overlapping files — skipped files never get a task, pruning above
    parquet's row-group stats. The pruned read's aggregate must equal
    the full-table filter (the oracle), and `files_pruned_ok` pins that
    the scan really touched fewer files than the table has. At 100 TB
    the stats table lives next to the manifest and turns a full-corpus
    scan into a handful of file reads."""
    from ..operators.layout import file_stats, pruned_read

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/lineitem_shipdate_ranged"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load(spark, sf_dir, "lineitem")
         .select("l_shipdate", "l_returnflag", "l_quantity")
         .repartitionByRange(8, "l_shipdate")
         .sortWithinPartitions("l_shipdate")
         .write.mode("overwrite").parquet(path))
    import datetime

    # the testdata stores l_shipdate as a timestamp; midnight bounds
    # coerce identically to the oracle's DATE literals
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 2, 28)
    stats = file_stats(spark, path, ["l_shipdate"])
    df, n_read, n_total = pruned_read(spark, path, "l_shipdate", lo, hi,
                                      stats=stats)
    return (
        df.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("l_quantity").cast("double").alias("sum_qty"))
        .withColumn("files_pruned_ok", F.lit(n_read < n_total))
    )


@query("snapshot_diff_cdc", oracle="""
SELECT doc_id,
  CASE WHEN doc_id % 4 = 0 THEN 'delete'
       WHEN doc_id % 4 = 3 THEN 'insert'
       ELSE 'update' END AS change
FROM documents WHERE doc_id % 4 IN (0, 2, 3)
""")
def snapshot_diff_cdc(spark, sf_dir):
    """Change-data feed between snapshot versions (`snapshot_diff`,
    operators/layout.py): v1 holds doc_id % 4 in {0,1,2}; v2 OVERWRITES
    with % 4 in {1,2,3} and bumps n_chars for the % 4 == 2 rows. The
    diff must classify % 4 == 0 as delete, == 3 as insert, == 2 as
    update, and keep the untouched == 1 rows OUT of the feed — the
    general path's full-outer join + null-safe payload compare, all
    replayed from the raw table in SQL. (The manifest-level append fast
    path — new shards only, no join — is plan-asserted in unit tests.)
    Incremental consumers read this feed instead of rescanning the
    table; at 100 TB the normal append diff never touches old data."""
    from ..operators.layout import (
        snapshot_diff, snapshot_versions, write_snapshot)

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_cdc_snapshots"
    if len(snapshot_versions(spark, path)) < 2:
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars")
        write_snapshot(
            spark, docs.filter(F.col("doc_id") % 4 < 3), path)
        v2 = docs.filter(F.col("doc_id") % 4 > 0).withColumn(
            "n_chars",
            F.when(F.col("doc_id") % 4 == 2, F.col("n_chars") + 1)
            .otherwise(F.col("n_chars")))
        write_snapshot(spark, v2, path, mode="overwrite")
    return snapshot_diff(spark, path, 1, 2, ["doc_id"])


@query("split_leakage_safe", oracle=f"""
WITH d AS (SELECT doc_id, md5(text) AS dg FROM documents
           WHERE text IS NOT NULL),
s AS (SELECT doc_id, dg,
        CASE
          WHEN substr(md5('lsplit:' || {_enc_sql('dg')}), 1, 16)
               < '{hash_hex_threshold(0.8)}' THEN 'train'
          WHEN substr(md5('lsplit:' || {_enc_sql('dg')}), 1, 16)
               < '{hash_hex_threshold(0.9)}' THEN 'val'
          ELSE 'test' END AS split
      FROM d)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT dg) AS BIGINT) AS n_digests,
       TRUE AS groups_intact
FROM s GROUP BY split
""")
def split_leakage_safe(spark, sf_dir):
    """Content-keyed leakage-safe split (`leakage_safe_split`,
    operators/splits.py): the 80/10/10 draw keys on md5(text), not the
    row id, so exact duplicates can NEVER straddle train/val/test — the
    eval-contamination failure id-keyed splits have on imperfectly
    deduped corpora. Same zero-shuffle md5-threshold cascade as
    `split_hash_membership`. The gate emits per-split doc and digest
    counts plus `groups_intact`, computed Spark-side as "every digest
    maps to exactly one split" and pinned TRUE by the oracle — a split
    that scattered a duplicate group flips the boolean and breaks the
    hash."""
    from ..operators.splits import leakage_safe_split

    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    s = leakage_safe_split(
        docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).withColumn("dg", F.md5("text"))
    intact = (
        s.groupBy("dg").agg(F.countDistinct("split").alias("k"))
        .agg((F.max("k") == 1).alias("groups_intact"))
    )
    return (
        s.groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.countDistinct("dg").cast("long").alias("n_digests"))
        .crossJoin(F.broadcast(intact))
        .select("split", "n_docs", "n_digests", "groups_intact")
    )


@query("multimodal_framesample", oracle="""
WITH f AS (SELECT CAST(doc_id AS VARCHAR) AS path, text,
             unnest([0, 2, 4, 6]) AS frame_idx
           FROM documents WHERE text IS NOT NULL)
SELECT path, CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 64 AS BIGINT) AS "offset",
       CAST(len(substr(text, frame_idx * 64 + 1, 64)) AS INT)
         AS frame_bytes,
       md5(substr(text, frame_idx * 64 + 1, 64)) AS digest
FROM f WHERE frame_idx * 64 < len(text)
""")
def multimodal_framesample(spark, sf_dir):
    """Frame sampling over video-standing blobs (`sample_frames`,
    operators/multimodal.py): every document's bytes play a video;
    64-byte "frames" sampled at stride 2 up to 4 frames fan out to one
    row each with offset + digest. The codec is an explicitly-marked
    deterministic stub (no ffmpeg in this container) — the REAL part
    under test is the 100 TB plumbing: Arrow-batched mapInPandas with
    bounded batches, a rows-out > rows-in frame schema, zero shuffle,
    digests ready for downstream exact dedup. The corpus is ASCII, so
    the oracle replays the byte slicing with string substr + md5 and
    every frame row hash-matches."""
    from ..operators.multimodal import sample_frames

    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()).select(
        F.col("doc_id").cast("string").alias("path"),
        F.col("text").cast("binary").alias("content"),
    )
    return sample_frames(
        docs, frame_bytes=64, stride=2, max_frames=4, codec="bytes")


@query("split_negative_samples", oracle="""
WITH a AS (SELECT doc_id AS anchor_id, source FROM documents
           WHERE doc_id % 10 = 0),
c AS (SELECT doc_id AS cand_id, source,
        substr(md5('neg:c:' || CAST(doc_id AS VARCHAR)), 1, 1) AS b
      FROM documents),
p AS (SELECT a.anchor_id, a.source, CAST(t.range + 1 AS INT) AS draw,
        substr(md5('neg:p:' || CAST(a.anchor_id AS VARCHAR) || ':' ||
                   CAST(t.range + 1 AS VARCHAR)), 1, 1) AS b
      FROM a, range(0, 4) t),
pair AS (SELECT p.anchor_id, p.draw, c.cand_id
         FROM p JOIN c ON p.b = c.b
         WHERE c.cand_id != p.anchor_id AND c.source != p.source)
SELECT anchor_id, draw, cand_id AS neg_id
FROM pair
QUALIFY row_number() OVER (PARTITION BY anchor_id, draw
  ORDER BY md5('neg:r:' || CAST(anchor_id AS VARCHAR) || ':' ||
               CAST(draw AS VARCHAR) || ':' || CAST(cand_id AS VARCHAR)),
           cand_id) = 1
""")
def split_negative_samples(spark, sf_dir):
    """Deterministic contrastive negative sampling (`negative_samples`,
    operators/splits.py): every 10th doc is an anchor drawing 4
    negatives from the whole corpus, EXCLUDING same-source candidates
    (the stand-in for known positives) — via hash bucketing, never an
    anchors x pool cross join: candidates bucket by a seeded md5
    prefix, each anchor's draws probe md5-chosen buckets, and the
    winner per draw is the min-md5 candidate — content-deterministic,
    append-stable, and exactly replayed by the oracle (bucket, probe,
    exclusion filter, QUALIFY argmin). Every sampled pair is in the
    hash."""
    from ..operators.splits import negative_samples

    docs = load(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % 10 == 0)
    same_source = anchors.select(
        F.col("doc_id").alias("__a"), "source").join(
        docs.select(F.col("doc_id").alias("__c"), "source"), "source"
    ).select("__a", "__c")
    return negative_samples(
        anchors, docs, "doc_id", "doc_id", k=4, bucket_hex=1,
        exclusions=same_source, seed="neg")


@query("multimodal_framesample_gif", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             1 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
             2 + doc_id % 5 AS n_frames, doc_id % 97 AS seed
           FROM documents),
f AS (SELECT d.*, CAST(t.range * 2 AS INT) AS frame_idx
      FROM d, range(0, 3) t
      WHERE t.range * 2 < d.n_frames),
px AS (SELECT path, frame_idx, w, h,
         flatten([[CAST((x * 31 + y * 17 + seed + 13 * frame_idx) % 256
                        AS VARCHAR)
                   FOR x IN range(0, CAST(w AS BIGINT))]
                  FOR y IN range(0, CAST(h AS BIGINT))]) AS vals
       FROM f)
SELECT path, frame_idx, CAST(w * h AS INT) AS frame_bytes,
       md5(array_to_string(vals, ',')) AS digest
FROM px
""")
def multimodal_framesample_gif(spark, sf_dir):
    """REAL frame sampling — the codec is no longer a stub for this
    container format: every document becomes a genuine ANIMATED GIF
    (2-6 full-canvas frames, real LZW streams), and `sample_frames`
    (codec='auto') LZW-DECODES every sampled frame's raster
    (`decode_gif_frames`, operators/multimodal.py) — stride 2, up to 3
    frames — emitting the decoded pixel digest per frame. The oracle
    replays every frame's pixels CLOSED-FORM from the generator
    formula ((x*31 + y*17 + seed + 13*frame) % 256), so the hash only
    matches if the per-frame LZW decode, frame walk, and sampling are
    all exactly right. Byte offsets are compression-dependent and
    excluded from the gate projection (asserted in unit tests
    instead). Completes the media quartet 4/4 real for GIF:
    metadata, header decode, full-image decode+resize, frame
    sampling."""
    import pandas as pd

    from ..operators.multimodal import encode_gif_animated, sample_frames

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_gif_animated(
                1 + int(i) % 7, 1 + int(i) % 5, 2 + int(i) % 5,
                seed=int(i) % 97))

    make_gif = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_gif(F.col("doc_id")).alias("content"),
    )
    return sample_frames(docs, stride=2, max_frames=3).select(
        "path", "frame_idx", "frame_bytes", "digest")


@query("sink_training_shards", oracle=f"""
WITH r AS (SELECT doc_id,
             row_number() OVER (
               ORDER BY substr(md5('shard:' || {_enc_sql('doc_id')}), 1, 16),
                        doc_id) AS rk
           FROM documents)
SELECT CAST((rk - 1) % 8 AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(rk) AS BIGINT) AS min_rank,
       CAST(MAX(rk) AS BIGINT) AS max_rank,
       TRUE AS round_robin_ok
FROM r GROUP BY 1
""")
def sink_training_shards(spark, sf_dir):
    """Deterministic interleaved corpus sink (`write_training_shards`,
    operators/layout.py): the end-of-pipeline writer — content-keyed
    global shuffle rank (two balanced exchanges, no single-task
    window), round-robin shard assignment balanced to +-1 with NO
    total-count pass, one hash exchange + in-partition sort so every
    shard directory reads back rank-ascending. The gate reads the
    WRITTEN FILES back (sink round-trip, not the in-memory frame) and
    emits per-shard counts + rank spans + `round_robin_ok` (every rank
    congruent to its shard id mod 8, computed from the files); the
    oracle replays the whole order in SQL."""
    from ..operators.layout import write_training_shards

    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/documents_training_shards"
    if not os.path.exists(path) or not os.listdir(path):
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        write_training_shards(docs, path, key="doc_id", n_shards=8,
                              seed="shard")
    back = spark.read.parquet(path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("shuffle_rank").cast("long").alias("min_rank"),
            F.max("shuffle_rank").cast("long").alias("max_rank"),
            F.min(
                ((F.col("shuffle_rank") - 1) % 8) == F.col("shard")
            ).alias("round_robin_ok"),
        )
        .select("shard", "n_docs", "min_rank", "max_rank",
                "round_robin_ok")
    )


@query("multimodal_resize", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             1 + doc_id % 16 AS w, 1 + doc_id % 12 AS h,
             doc_id % 251 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((CAST(floor(x * w / 4.0) AS INT) * 31
                         + CAST(floor(y * h / 3.0) AS INT) * 17
                         + seed) % 256 AS VARCHAR)
                   FOR x IN range(0, 4)]
                  FOR y IN range(0, 3)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize(spark, sf_dir):
    """REAL image decode + resize (`decode_png_gray`/`resize_images`,
    operators/multimodal.py): every document becomes a genuine PNG
    (stdlib encoder, dims from doc_id), the pipeline zlib-inflates it,
    strips scanline filters, and nearest-neighbor-resamples to 4x3 —
    all pure stdlib, no image libraries, in the standard media-stage
    shape (Arrow mapInPandas, bounded batches, zero shuffle). The
    oracle recomputes every resized pixel CLOSED-FORM from the
    generator formula, so the digest only matches if decode AND
    resampling are both exactly right. This completes the north-star
    media quartet: metadata, header decode, frame sampling, resize."""
    import pandas as pd

    from ..operators.multimodal import encode_png, resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_png(1 + int(i) % 16, 1 + int(i) % 12,
                                 seed=int(i) % 251))

    make_png = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_png(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=4, out_h=3)


@query("multimodal_resize_gif", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             1 + doc_id % 13 AS w, 1 + doc_id % 9 AS h,
             doc_id % 241 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((CAST(floor(x * w / 5.0) AS INT) * 31
                         + CAST(floor(y * h / 4.0) AS INT) * 17
                         + seed) % 256 AS VARCHAR)
                   FOR x IN range(0, 5)]
                  FOR y IN range(0, 4)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(5 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize_gif(spark, sf_dir):
    """REAL GIF decode + resize (`decode_gif_gray`/`resize_images`,
    operators/multimodal.py — VERDICT r6 #7's second real media
    codec): every document becomes a genuine GIF89a (stdlib encoder:
    grayscale global color table, real LZW-compressed index stream),
    the pipeline LZW-DECOMPRESSES it (variable-width codes, cScSc
    corner case, mid-stream clears), maps indices through the color
    table, and nearest-neighbor-resamples to 5x4 — pure stdlib, no
    image libraries, Arrow mapInPandas with bounded batches, zero
    shuffle. The oracle recomputes every resized pixel CLOSED-FORM
    from the shared generator formula, so the digest only matches if
    the full LZW decode AND resampling are exactly right (the decoder
    is additionally pinned against a real-world encoder's 1x1 GIF in
    unit tests)."""
    import pandas as pd

    from ..operators.multimodal import encode_gif, resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_gif(1 + int(i) % 13, 1 + int(i) % 9,
                                 seed=int(i) % 241))

    make_gif = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_gif(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=5, out_h=4)


@query("scan_xml", oracle="""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""")
def scan_xml(spark, sf_dir):
    """XML sink + schema'd XML scan round-trip (Spark 4's built-in XML
    source — new surface this engine exposes alongside
    CSV/JSON/ORC/parquet): supplier materializes as row-tagged XML,
    reads back through an explicit schema, joins nation, aggregates —
    the oracle computes the same aggregate from the parquet original,
    so any XML write/read/schema bug breaks the hash."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/supplier_xml"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (load(spark, sf_dir, "supplier")
         .write.mode("overwrite")
         .option("rootTag", "suppliers").option("rowTag", "supplier")
         .format("xml").save(path))
    schema = ("s_suppkey long, s_name string, s_nationkey int, "
              "s_acctbal double")
    df = (spark.read.option("rowTag", "supplier")
          .schema(schema).format("xml").load(path))
    nation = load(spark, sf_dir, "nation")
    return (
        df.join(nation, df["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(dec("s_acctbal")).cast("double").alias("sum_bal"))
    )


@query("scan_json_corrupt", oracle="""
SELECT CAST(COUNT(*) FILTER (c_custkey % 10 != 0) AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (c_custkey % 10 = 0) AS BIGINT) AS n_corrupt,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
            FILTER (c_custkey % 10 != 0) AS DOUBLE) AS sum_bal
FROM customer
""")
def scan_json_corrupt(spark, sf_dir):
    """Malformed-record ingest handling — the data-quality reality of
    100 TB crawl ingestion (some fraction of every JSONL feed is
    truncated/garbled): every 10th customer row is written DELIBERATELY
    truncated mid-record; the PERMISSIVE read must route exactly those
    rows to `_corrupt_record` (no exception, no silent drop, no
    misparse) while the valid rows aggregate exactly. A reader that
    crashes (FAILFAST-style), drops corrupt rows silently, or
    half-parses them breaks the count or the hash."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/pbs_fmt{tag}/customer_corrupt_jsonl"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        cust = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_acctbal")
        line = F.to_json(F.struct("c_custkey", "c_acctbal"))
        corrupted = F.when(
            F.col("c_custkey") % 10 == 0,
            F.substring(line, 1, 12),   # truncated mid-record
        ).otherwise(line)
        cust.select(corrupted.alias("value")).write.mode(
            "overwrite").text(path)
    df = spark.read.schema(
        "c_custkey long, c_acctbal double, _corrupt_record string"
    ).json(path)
    df = df.cache()  # SPARK-21610: corrupt-column queries need the raw rows
    return df.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1))
        .cast("long").alias("n_valid"),
        F.count(F.when(F.col("_corrupt_record").isNotNull(), 1))
        .cast("long").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(),
                     dec("c_acctbal"))).cast("double").alias("sum_bal"),
    )


@query("multimodal_audio_decode", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             120 + doc_id % 80 AS n, doc_id % 997 AS seed
           FROM documents),
s AS (SELECT path, n, seed, unnest(range(0, CAST(n AS BIGINT))) AS i
      FROM d),
v AS (SELECT path, n, i,
        ((i * 2657 + seed * 7919) % 4001) - 2000 AS samp
      FROM s)
SELECT path,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  CAST(n AS BIGINT) AS n_frames,
  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(i // 50 AS INT) AS window_idx,
  CAST(COUNT(*) AS INT) AS n_in_window,
  CAST(MAX(ABS(samp)) AS INT) AS peak,
  ROUND(SQRT(SUM(samp * samp) / COUNT(*)), 6) AS rms
FROM v GROUP BY path, n, i // 50
""")
def multimodal_audio_decode(spark, sf_dir):
    """REAL audio decode + per-window stats (`decode_wav_pcm`/
    `audio_stats`, operators/multimodal.py — VERDICT r7 #3, the third
    real media codec): every document becomes a genuine RIFF/WAVE file
    (stdlib encoder, 16-bit PCM mono, frame count and waveform seed
    from doc_id; the decoder is additionally cross-checked against the
    stdlib `wave` writer in unit tests), the pipeline walks the RIFF
    chunk list, unpacks the PCM payload, and computes per-50-frame
    windows of peak and RMS plus duration — pure stdlib, no audio
    libraries, in the standard media-stage shape (Arrow mapInPandas,
    bounded batches, fan-out schema, zero shuffle). The oracle
    recomputes every sample CLOSED-FORM from the generator formula, so
    peak/RMS only match if the chunk walk, sign decode, and windowing
    are all exactly right."""
    from ..operators.multimodal import audio_stats, encode_wav

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(120 + int(i) % 80, 8000,
                                 seed=int(i) % 997))

    make_wav = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    return audio_stats(docs, window=50)


@query("multimodal_audio_resample", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             100 + doc_id % 60 AS n, doc_id % 811 AS seed
           FROM documents),
j AS (SELECT path, n, seed,
        unnest(range(0, CAST(2 * n AS BIGINT))) AS j
      FROM d),
v AS (SELECT path, n, j,
        (((j // 2) * 2657 + seed * 7919) % 4001) - 2000 AS s0,
        CASE WHEN j % 2 = 0 OR j // 2 + 1 >= n THEN NULL
             ELSE (((j // 2 + 1) * 2657 + seed * 7919) % 4001) - 2000
        END AS s1
      FROM j),
x AS (SELECT path, n,
        CASE WHEN s1 IS NULL THEN 2 * s0 ELSE s0 + s1 END AS v2
      FROM v)
SELECT path, CAST(8000 AS INT) AS src_rate, CAST(16000 AS INT) AS dst_rate,
  CAST(n AS BIGINT) AS n_frames, CAST(2 * n AS BIGINT) AS n_out,
  CAST(SUM(v2) AS BIGINT) AS sum_x2,
  CAST(SUM(v2 * v2) AS BIGINT) AS sum_sq_x4
FROM x GROUP BY path, n
""")
def multimodal_audio_resample(spark, sf_dir):
    """REAL linear-interpolation audio resampling (`resample_audio`,
    operators/multimodal.py): WAV fixtures decode and upsample 8 kHz ->
    16 kHz, so every odd output sample is the exact midpoint of its
    neighbors (rational positioning: idx = (j*src)//dst, frac =
    ((j*src)%dst)/dst — here 0 or exactly 1/2, so doubled samples are
    exact integers). The gate flattens the resampled array to two
    exact-integer aggregates (sum of 2x samples, sum of squared 2x
    samples) the oracle recomputes closed-form per document — any
    off-by-one in index mapping, edge extension, or interpolation
    weight breaks both sums."""
    from ..operators.multimodal import encode_wav, resample_audio

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(100 + int(i) % 60, 8000,
                                 seed=int(i) % 811))

    make_wav = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    r = resample_audio(docs, dst_rate=16000)
    return r.select(
        "path", "src_rate", "dst_rate", "n_frames", "n_out",
        F.aggregate(
            "samples", F.lit(0).cast("long"),
            lambda a, x: a + (x * 2).cast("long")).alias("sum_x2"),
        F.aggregate(
            "samples", F.lit(0).cast("long"),
            lambda a, x: a + ((x * 2) * (x * 2)).cast("long"),
        ).alias("sum_sq_x4"),
    )


@query("multimodal_framesample_y4m", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             1 + doc_id % 9 AS w, 1 + doc_id % 7 AS h,
             2 + doc_id % 5 AS n_frames, doc_id % 199 AS seed
           FROM documents),
f AS (SELECT d.*, CAST(t.range * 2 AS INT) AS frame_idx
      FROM d, range(0, 3) t
      WHERE t.range * 2 < d.n_frames),
px AS (SELECT path, frame_idx, w, h,
         flatten([[CAST((x * 31 + y * 17 + frame_idx * 29 + seed) % 256
                        AS VARCHAR)
                   FOR x IN range(0, CAST(w AS BIGINT))]
                  FOR y IN range(0, CAST(h AS BIGINT))]) AS vals
       FROM f)
SELECT path, frame_idx, CAST(w * h AS INT) AS frame_bytes,
       md5(array_to_string(vals, ',')) AS digest
FROM px
""")
def multimodal_framesample_y4m(spark, sf_dir):
    """REAL VIDEO frame sampling (round 8): every document becomes a
    genuine YUV4MPEG2 stream (`encode_y4m` — the raw-frame video
    container ffmpeg pipes; mono colourspace, 2-6 frames), and
    `sample_frames` (codec='auto') parses the stream header and
    extracts every sampled frame's raster
    (`decode_y4m_frames`, operators/multimodal.py) — stride 2, up to 3
    frames — emitting decoded pixel digests. This retires the
    byte-block stub for an actual video container: the video row of
    the media matrix now has a real codec alongside GIF animation
    (compressed) and Y4M (raw) — only inter-frame-compressed codecs
    (H.26x; genuinely needs ffmpeg) remain header-stubbed. The oracle
    replays every frame's pixels CLOSED-FORM from the generator
    formula ((x*31 + y*17 + 29*frame + seed) % 256); byte offsets are
    header-length-dependent and asserted in unit tests instead."""
    from ..operators.multimodal import encode_y4m, sample_frames

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_y4m(
                1 + int(i) % 9, 1 + int(i) % 7,
                n_frames=2 + int(i) % 5, seed=int(i) % 199))

    make_y4m = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_y4m(F.col("doc_id")).alias("content"),
    )
    return sample_frames(docs, stride=2, max_frames=3).select(
        "path", "frame_idx", "frame_bytes", "digest")


@query("multimodal_resize_jpeg", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             9 + doc_id % 16 AS w, 9 + doc_id % 12 AS h,
             doc_id % 211 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((((CAST(floor(x * w / 4.0) AS INT) // 8) * 31
                         + (CAST(floor(y * h / 3.0) AS INT) // 8) * 17
                         + seed) % 256) AS VARCHAR)
                   FOR x IN range(0, 4)]
                  FOR y IN range(0, 3)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize_jpeg(spark, sf_dir):
    """REAL JPEG decode + resize (`decode_jpeg_gray`,
    operators/jpeg.py — round 8, the THIRD real image codec): every
    document becomes a genuine baseline grayscale JPEG (standard
    huffman tables, real DCT + quantization + entropy coding), and the
    pipeline performs the FULL decode — marker walk, DHT/DQT parse,
    huffman entropy decode with byte unstuffing, DC prediction,
    dezigzag, dequant, float IDCT — then nearest-neighbor-resamples to
    4x3. Fixtures are block-constant (all AC exactly zero, DC exactly
    representable), so the decode is bit-exact and the oracle
    recomputes every resized pixel CLOSED-FORM from the per-block
    generator formula — while the decoder itself handles arbitrary
    baseline grayscale JPEGs (lossily, like every JPEG decoder; the
    random-pixel roundtrip is unit-bounded). Retires the 'JPEG is
    header-only' partial."""
    from ..operators.jpeg import encode_jpeg_gray
    from ..operators.multimodal import resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_jpeg_gray(9 + int(i) % 16, 9 + int(i) % 12,
                                       seed=int(i) % 211))

    make_jpeg = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_jpeg(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=4, out_h=3)


@query("multimodal_resize_jpeg_color", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             17 + doc_id % 16 AS w, 17 + doc_id % 12 AS h,
             doc_id % 223 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((((CAST(floor(x * w / 4.0) AS INT) // 8) * 31
                         + (CAST(floor(y * h / 3.0) AS INT) // 8) * 17
                         + seed) % 256) AS VARCHAR)
                   FOR x IN range(0, 4)]
                  FOR y IN range(0, 3)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize_jpeg_color(spark, sf_dir):
    """REAL COLOR JPEG decode (round 8, `decode_jpeg_gray` on
    3-component input): every document becomes a genuine baseline
    YCbCr JPEG with 4:2:0 luma sampling, interleaved MCUs, and a
    restart interval (`encode_jpeg_color420`, DRI=2) — the shape of a
    real camera/web JPEG — and the pipeline performs the full
    interleaved scan decode (per-component huffman tables and DC
    predictors, RSTn re-sync with predictor reset, chroma blocks
    entropy-decoded and discarded) to extract the LUMA plane, then
    resizes. Block-constant luma + constant chroma keep the decode
    bit-exact, so the oracle recomputes every resized pixel
    closed-form. With this, only progressive JPEG remains
    unimplemented on the image side."""
    from ..operators.jpeg import encode_jpeg_color420
    from ..operators.multimodal import resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_jpeg_color420(
                17 + int(i) % 16, 17 + int(i) % 12,
                seed=int(i) % 223, restart_interval=2))

    make_jpeg = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_jpeg(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=4, out_h=3)


@query("multimodal_resize_jpeg_progressive", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             11 + doc_id % 14 AS w, 11 + doc_id % 10 AS h,
             doc_id % 227 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((((CAST(floor(x * w / 4.0) AS INT) // 8) * 31
                         + (CAST(floor(y * h / 3.0) AS INT) // 8) * 17
                         + seed) % 256) AS VARCHAR)
                   FOR x IN range(0, 4)]
                  FOR y IN range(0, 3)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize_jpeg_progressive(spark, sf_dir):
    """PROGRESSIVE JPEG decode (round 8, `decode_jpeg_gray` on SOF2
    input): every document becomes a genuine 4-scan progressive JPEG
    (`encode_jpeg_progressive`: DC first scan at Al=1, DC refinement,
    two spectral-selection AC bands with real EOB-run accumulation and
    a declared custom progressive AC huffman table), and the pipeline
    accumulates coefficients across all four scans before one IDCT —
    the multi-scan machinery real progressive photos use. Fixtures are
    block-constant so the decode is bit-exact and the oracle
    recomputes every resized pixel closed-form (the all-zero AC bands
    make the EOB-run path carry maximal runs); random-pixel
    progressive-equals-sequential parity and a handcrafted AC
    successive-approximation refinement stream are unit-pinned. With
    this, the image codec family has no header-only formats left."""
    from ..operators.jpeg import encode_jpeg_progressive
    from ..operators.multimodal import resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_jpeg_progressive(
                11 + int(i) % 14, 11 + int(i) % 10, seed=int(i) % 227))

    make_jpeg = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_jpeg(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=4, out_h=3)


@query("multimodal_image_stats", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             doc_id % 3 AS fmt,
             9 + doc_id % 11 AS w, 9 + doc_id % 9 AS h,
             doc_id % 193 AS seed
           FROM documents),
px AS (SELECT path, fmt, w, h,
         unnest(range(0, CAST(w * h AS BIGINT))) AS i, seed
       FROM d),
v AS (SELECT path, fmt, w, h,
        CASE WHEN fmt = 2
             THEN (((i % w) // 8) * 31 + ((i // w) // 8) * 17 + seed) % 256
             ELSE ((i % w) * 31 + (i // w) * 17 + seed) % 256
        END AS g
      FROM px)
SELECT path,
  CASE fmt WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(w * h AS INT) AS n_pixels,
  CAST(MIN(g) AS INT) AS min_gray, CAST(MAX(g) AS INT) AS max_gray,
  ROUND(SUM(g) / (w * h), 6) AS mean_gray
FROM v GROUP BY path, fmt, w, h
""")
def multimodal_image_stats(spark, sf_dir):
    """Cross-codec pixel statistics (`image_pixel_stats`,
    operators/multimodal.py, round 8): each document becomes a PNG, an
    animated-free GIF, or a baseline JPEG by doc_id % 3 — three
    DIFFERENT real decoders (zlib scanlines, LZW, huffman+IDCT) feed
    one stage that computes exact min/max/mean gray. The oracle
    recomputes every pixel closed-form per format (per-pixel generator
    for PNG/GIF, block-constant for JPEG), so the hash only matches if
    ALL THREE codecs decode exactly and the stats arithmetic is
    replayed bit-for-bit. The curation story: brightness/black-frame
    filters need decoded pixels, not byte histograms."""
    from ..operators.jpeg import encode_jpeg_gray
    from ..operators.multimodal import (
        encode_gif, encode_png, image_pixel_stats)

    def _make(doc_id):
        def one(i):
            i = int(i)
            w, h, seed = 9 + i % 11, 9 + i % 9, i % 193
            if i % 3 == 0:
                return encode_png(w, h, seed=seed)
            if i % 3 == 1:
                return encode_gif(w, h, seed=seed)
            return encode_jpeg_gray(w, h, seed=seed)
        return doc_id.map(one)

    make = F.pandas_udf(_make, returnType="binary")
    from ..operators.dedup import widen_parallelism

    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make(F.col("doc_id")).alias("content"),
    )
    return image_pixel_stats(docs)


@query("multimodal_audio_g711", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             60 + doc_id % 50 AS n, doc_id % 739 AS seed,
             doc_id % 2 = 0 AS is_u
           FROM documents),
s AS (SELECT path, n, is_u, seed,
        unnest(range(0, CAST(n AS BIGINT))) AS i
      FROM d),
b AS (SELECT path, n, is_u, i,
        CASE WHEN is_u THEN xor((i * 2657 + seed * 7919) % 256, 255)
             ELSE xor((i * 2657 + seed * 7919) % 256, 85) END AS u
      FROM s),
v AS (SELECT path, n, is_u, i,
        CASE WHEN is_u THEN
          CASE WHEN u >= 128
               THEN 132 - (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)))
               ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132
          END
        ELSE
          (CASE WHEN u >= 128 THEN 1 ELSE -1 END) *
          (CASE WHEN (u // 16) % 8 = 0 THEN (u % 16) * 16 + 8
                ELSE ((u % 16) * 16 + 264) * (1 << (((u // 16) % 8) - 1))
           END)
        END AS samp
      FROM b)
SELECT path,
  CASE WHEN is_u THEN 'ulaw' ELSE 'alaw' END AS codec,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  CAST(n AS BIGINT) AS n_frames,
  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(i // 40 AS INT) AS window_idx,
  CAST(COUNT(*) AS INT) AS n_in_window,
  CAST(MAX(ABS(samp)) AS INT) AS peak,
  ROUND(SQRT(SUM(samp * samp) / COUNT(*)), 6) AS rms
FROM v GROUP BY path, is_u, n, i // 40
""")
def multimodal_audio_g711(spark, sf_dir):
    """REAL G.711 companded-audio decode (`decode_wav_pcm` format tags
    7/6, operators/multimodal.py) — telephony μ-law and A-law, the two
    8-bit companding codecs every VoIP/callcenter corpus arrives in.
    Even docs become μ-law WAVs, odd docs A-law; the stored companded
    byte stream is the closed-form generator formula, the pipeline
    expands each byte to 16-bit linear via the public Sun/CCITT
    segment formulas (cross-checked byte-for-byte against the stdlib
    `audioop` tables in unit tests) and computes per-40-frame
    peak/RMS windows. The oracle replays the EXPANSION ITSELF in SQL
    (XOR, segment shift, bias — pure integer ops), so the hash only
    matches if both companding laws decode exactly. Same Arrow
    mapInPandas shape as every media stage; zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import audio_stats, encode_wav

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(
                60 + int(i) % 50, 8000, seed=int(i) % 739,
                fmt_tag=7 if int(i) % 2 == 0 else 6))

    make_wav = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    return audio_stats(docs, window=40).select(
        "path",
        F.when(F.col("path").cast("long") % 2 == 0, F.lit("ulaw"))
        .otherwise(F.lit("alaw")).alias("codec"),
        "sample_rate", "n_channels", "n_frames", "duration_ms",
        "window_idx", "n_in_window", "peak", "rms")


@query("multimodal_framesample_mjpeg", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             8 * (1 + doc_id % 3) AS w, 8 * (1 + doc_id % 2) AS h,
             2 + doc_id % 5 AS n_frames, doc_id % 97 AS seed
           FROM documents),
f AS (SELECT d.*, CAST(t.range * 2 AS INT) AS frame_idx
      FROM d, range(0, 3) t
      WHERE t.range * 2 < d.n_frames),
px AS (SELECT path, frame_idx, w, h,
         flatten([[CAST(((x // 8) * 31 + (y // 8) * 17 + seed
                         + 13 * frame_idx) % 256 AS VARCHAR)
                   FOR x IN range(0, CAST(w AS BIGINT))]
                  FOR y IN range(0, CAST(h AS BIGINT))]) AS vals
       FROM f)
SELECT path, frame_idx, CAST(w * h AS INT) AS frame_bytes,
       md5(array_to_string(vals, ',')) AS digest
FROM px
""")
def multimodal_framesample_mjpeg(spark, sf_dir):
    """REAL compressed-video frame sampling — AVI/Motion-JPEG
    (`decode_avi_frames`, operators/multimodal.py): every document
    becomes a genuine AVI file (RIFF hdrl/strl/movi tree, 2-6 real
    baseline JPEGs in '00dc' chunks), and `sample_frames`
    (codec='auto') walks the RIFF tree and runs the FULL JPEG entropy
    decode (huffman + dequant + IDCT, operators/jpeg.py) on every
    sampled frame — stride 2, up to 3 frames — emitting the decoded
    pixel digest. Block-constant frame content (seed advanced 13 per
    frame) makes the JPEG decode bit-exact, so the oracle replays
    every pixel CLOSED-FORM; the hash only matches if the container
    walk, per-frame entropy decode, and sampling are all exactly
    right. Third real video container after animated GIF and Y4M —
    and the first COMPRESSED one."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_avi_mjpeg, sample_frames

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_avi_mjpeg(
                8 * (1 + int(i) % 3), 8 * (1 + int(i) % 2),
                2 + int(i) % 5, seed=int(i) % 97))

    make_avi = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_avi(F.col("doc_id")).alias("content"),
    )
    return sample_frames(docs, stride=2, max_frames=3).select(
        "path", "frame_idx", "frame_bytes", "digest")


@query("multimodal_resize_bmp", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             1 + doc_id % 16 AS w, 1 + doc_id % 12 AS h,
             doc_id % 251 AS seed
           FROM documents),
px AS (SELECT path, w, h,
         flatten([[CAST((CAST(floor(x * w / 4.0) AS INT) * 31
                         + CAST(floor(y * h / 3.0) AS INT) * 17
                         + seed) % 256 AS VARCHAR)
                   FOR x IN range(0, 4)]
                  FOR y IN range(0, 3)]) AS vals
       FROM d)
SELECT path, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
       CAST(4 AS INT) AS out_w, CAST(3 AS INT) AS out_h,
       md5(array_to_string(vals, ',')) AS pix_csv_digest
FROM px
""")
def multimodal_resize_bmp(spark, sf_dir):
    """REAL BMP decode + resize (`decode_bmp_gray`/`resize_images`,
    operators/multimodal.py — round-8 cont.): every document becomes a
    genuine 8-bit palettized BMP (identity gray palette, 4-byte-padded
    BOTTOM-UP rows — the padding and row-flip are exactly what a naive
    decoder gets wrong), decoded through the palette and
    nearest-neighbor-resampled to 4x3. Completes FULL pixel decode for
    all four self-describing image headers (PNG/GIF/JPEG/BMP). Same
    closed-form generator oracle as `multimodal_resize` — the digest
    only matches if padding, row order, palette mapping, and
    resampling are all exactly right."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_bmp_gray, resize_images

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_bmp_gray(
                1 + int(i) % 16, 1 + int(i) % 12, seed=int(i) % 251))

    make_bmp = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_bmp(F.col("doc_id")).alias("content"),
    )
    return resize_images(docs, out_w=4, out_h=3)


@query("multimodal_audio_adpcm", oracle="""
WITH RECURSIVE
steps(si, sv) AS (SELECT range, [7,8,9,10,11,12,13,14,16,17,19,21,23,25,
 28,31,34,37,41,45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,
 209,230,253,279,307,337,371,408,449,494,544,598,658,724,796,876,963,
 1060,1166,1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,
 4026,4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,
 13899,15289,16818,18500,20350,22385,24623,27086,29794,32767][range + 1]
 FROM range(0, 89)),
d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
        40 + doc_id % 30 AS n, doc_id % 601 AS seed
      FROM documents),
r AS (
  SELECT doc_id, path, n, seed, 0 AS j,
         ((seed * 4001 + 123) % 4001) - 2000 AS pred,
         seed % 89 AS idx
  FROM d
  UNION ALL
  SELECT r.doc_id, r.path, r.n, r.seed, r.j + 1,
    greatest(-32768, least(32767,
      CASE WHEN nv >= 8 THEN r.pred - diff ELSE r.pred + diff END)),
    greatest(0, least(88, r.idx +
      [-1,-1,-1,-1,2,4,6,8][(nv % 8) + 1]))
  FROM (SELECT r.*, (r.j * 2657 + r.seed * 7919) % 16 AS nv
        FROM r) r
  JOIN steps ON steps.si = r.idx
  CROSS JOIN LATERAL (SELECT (sv // 8)
      + CASE WHEN nv % 8 >= 4 THEN sv ELSE 0 END
      + CASE WHEN nv % 4 >= 2 THEN sv // 2 ELSE 0 END
      + CASE WHEN nv % 2 = 1 THEN sv // 4 ELSE 0 END AS diff) t
  WHERE r.j < r.n - 1
)
SELECT path,
  CAST(8000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  CAST(n AS BIGINT) AS n_frames,
  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(0 AS INT) AS window_idx,
  CAST(COUNT(*) AS INT) AS n_in_window,
  CAST(MAX(ABS(pred)) AS INT) AS peak,
  ROUND(SQRT(SUM(pred * pred) / COUNT(*)), 6) AS rms
FROM r GROUP BY path, n
""")
def multimodal_audio_adpcm(spark, sf_dir):
    """REAL IMA ADPCM decode (`decode_ima_adpcm`/`decode_wav_pcm` fmt
    0x11, operators/multimodal.py) — the 4-bit adaptive-differential
    codec telephony and game audio shipped for decades, and the first
    STATEFUL audio decode in the suite: every nibble advances a
    (predictor, step-index) machine through the spec's 89-entry step
    table with shift-add reconstruction and clamping. The oracle
    replays the ENTIRE state machine as a recursive CTE over the
    closed-form nibble stream — step table as an array literal, the
    same clamps, the same index walk — so per-doc peak and RMS only
    hash-match if every one of the ~27k state transitions agrees
    sample-for-sample. Same Arrow mapInPandas stage as every audio
    path; blocks decode independently, so a sharded corpus
    parallelizes per block at scale."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import audio_stats, encode_wav

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(
                40 + int(i) % 30, 8000, seed=int(i) % 601,
                fmt_tag=0x11))

    make_wav = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    return audio_stats(docs, window=100)


@query("dedup_images_crossformat", oracle="""
WITH d AS (SELECT doc_id, doc_id % 50 AS s,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                             ELSE 'bmp' END AS fmt
           FROM documents),
g AS (SELECT s, 6 + s % 5 AS w, 5 + s % 4 AS h
      FROM (SELECT DISTINCT s FROM d)),
px AS (SELECT s, w, h,
         md5(array_to_string(
           flatten([[CAST((x * 31 + y * 17 + s) % 256 AS VARCHAR)
                     FOR x IN range(0, CAST(w AS BIGINT))]
                    FOR y IN range(0, CAST(h AS BIGINT))]), ','))
           AS pix_digest
       FROM g)
SELECT px.pix_digest,
  CAST(COUNT(*) AS BIGINT) AS n_copies,
  CAST(COUNT(DISTINCT d.fmt) AS BIGINT) AS n_formats,
  CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
FROM d JOIN px ON d.s = px.s
GROUP BY px.pix_digest
""")
def dedup_images_crossformat(spark, sf_dir):
    """Cross-format IMAGE dedup (`image_content_digest`,
    operators/multimodal.py → exact dedup on the decoded-pixel
    digest): every 50th-seed picture appears ~10 times, encoded
    round-robin as PNG, GIF, and BMP — three byte-distinct blobs that
    no byte-level dedup would relate. The pipeline FULLY DECODES each
    blob through its codec and groups on the pixel digest, so
    duplicates resolve by CONTENT: each group reports copy count,
    distinct formats (3 — proof the codecs agree pixel-for-pixel),
    and the min-id canonical. The oracle rebuilds every digest
    closed-form from the generator formula; any codec disagreement on
    any pixel splits a group and breaks the hash."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        encode_bmp_gray, encode_gif, encode_png, image_content_digest)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 50
            w, h = 6 + s % 5, 5 + s % 4
            enc = (encode_png, encode_gif, encode_bmp_gray)[i % 3]
            return enc(w, h, seed=s)
        return doc_id.map(one)

    make = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make(F.col("doc_id")).alias("content"),
    )
    return (
        image_content_digest(docs)
        .groupBy("pix_digest")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.countDistinct("format").cast("long").alias("n_formats"),
            F.min(F.col("path").cast("long")).cast("long")
            .alias("canonical_id"),
        )
    )


@query("sink_expectations", oracle="""
WITH e AS (SELECT o_orderkey,
        o_totalprice > 1000 AS ok_price,
        o_orderpriority IS NOT NULL
          AND o_orderpriority != '' AS ok_priority,
        o_orderdate < DATE '1998-08-01' AS ok_date
      FROM orders),
s AS (SELECT COUNT(*) AS n,
        SUM(CASE WHEN NOT ok_price THEN 1 ELSE 0 END) AS v_price,
        SUM(CASE WHEN NOT ok_priority THEN 1 ELSE 0 END) AS v_priority,
        SUM(CASE WHEN NOT ok_date THEN 1 ELSE 0 END) AS v_date,
        SUM(CASE WHEN NOT (ok_price AND ok_priority AND ok_date)
                 THEN 1 ELSE 0 END) AS v_total
      FROM e)
SELECT rule, CAST(n AS BIGINT) AS n_rows,
       CAST(v AS BIGINT) AS n_violations,
       round(CAST(v AS DOUBLE) / n, 6) AS violation_rate
FROM (
  SELECT 'min_price' AS rule, n, v_price AS v FROM s
  UNION ALL SELECT 'nonempty_priority', n, v_priority FROM s
  UNION ALL SELECT 'order_date_bound', n, v_date FROM s
  UNION ALL SELECT '__total', n, v_total FROM s)
""")
def sink_expectations(spark, sf_dir):
    """Sink-side data-quality expectations (`apply_expectations`,
    operators/expectations.py — the Delta-Live-Tables pattern): three
    named predicate rules over orders evaluate in ONE scan-local
    pass, rows split into passed / quarantined (the dead-letter side
    carries the failed-rule names), and the gate emits the per-rule
    scorecard the pipeline would alert on — counts, violations, 6-dp
    rates, plus the all-rules __total row. Counts, never rows, reach
    the driver; the oracle replays every predicate and rate. The
    split itself is pinned in unit tests (passed + quarantined
    partition the input; violation arrays name exactly the failed
    rules)."""
    from ..operators.expectations import apply_expectations

    orders = load(spark, sf_dir, "orders")
    passed, quarantined, scorecard = apply_expectations(
        orders,
        {
            "min_price": F.col("o_totalprice") > 1000,
            "nonempty_priority":
                F.col("o_orderpriority").isNotNull()
                & (F.col("o_orderpriority") != ""),
            "order_date_bound":
                F.col("o_orderdate") < F.lit("1998-08-01").cast("date"),
        },
    )
    return scorecard


@query("split_group_kfold", oracle=f"""
WITH f AS (SELECT user_id,
    CAST(floor(CAST(('0x' || substr(
          md5('kfold:' || {_enc_sql('user_id')}), 1, 4))::UBIGINT
        AS BIGINT) * 5 / 65536) AS BIGINT) AS fold
  FROM events WHERE user_id IS NOT NULL)
SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_groups
FROM f GROUP BY fold ORDER BY fold
""")
def split_group_kfold(spark, sf_dir):
    """Group-aware 5-fold assignment (`group_kfold`,
    operators/splits.py) keyed on user_id: per-fold row and group
    counts. All of a user's events share a fold by construction —
    the oracle replays the md5 bucket arithmetic (explicit floor:
    Spark's long cast truncates, DuckDB's rounds), so fold membership
    is pinned bit-for-bit."""
    from ..operators.splits import group_kfold

    ev = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    folds = group_kfold(ev, "user_id", k=5, seed="kfold")
    return (
        folds.groupBy("fold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.count_distinct("user_id").cast("long").alias("n_groups"))
        .orderBy("fold")
    )


def _hilbert_oracle(bits: int = 8) -> str:
    """Level-chained CTE replay of the Hilbert xy→d walk (one CTE per
    bit level — reassignment needs nesting, not one expression)."""
    parts = ["""
WITH l0 AS (SELECT l_orderkey, l_linenumber,
    l_partkey % 256 AS x, l_suppkey % 256 AS y,
    CAST(0 AS BIGINT) AS d
  FROM lineitem)"""]
    for i, level in enumerate(range(bits - 1, -1, -1)):
        s = 1 << level
        parts.append(f""",
l{i + 1} AS (SELECT l_orderkey, l_linenumber,
    CASE WHEN ry = 0 THEN yr ELSE xr END AS x,
    CASE WHEN ry = 0 THEN xr ELSE yr END AS y,
    d + CAST({s * s} AS BIGINT) * xor(3 * rx, ry) AS d
  FROM (SELECT *,
      CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
      CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry,
      CASE WHEN (y & {s}) = 0 AND (x & {s}) > 0
           THEN {s - 1} - x ELSE x END AS xr,
      CASE WHEN (y & {s}) = 0 AND (x & {s}) > 0
           THEN {s - 1} - y ELSE y END AS yr
    FROM l{i}))""")
    parts.append(f"""
SELECT l_orderkey, l_linenumber, d AS h FROM l{bits}""")
    return "".join(parts)


@query("sort_hilbert", oracle=_hilbert_oracle())
def sort_hilbert(spark, sf_dir):
    """Hilbert-curve clustering key (`with_hilbert`,
    operators/layout.py) — the locality upgrade to `sort_zorder`:
    consecutive cells are always grid-adjacent (bijection + unit-step
    property pinned on a full 16×16 grid in tests), so 2-D range
    predicates prune tighter file sets after a
    `hilbert_repartition` write. Pure unrolled integer bit
    arithmetic; the oracle replays every reflect/swap level."""
    from ..operators.layout import with_hilbert

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"))
    return with_hilbert(li, "x", "y", bits=8, h_col="h").select(
        "l_orderkey", "l_linenumber", "h")


@query("scan_binary_files", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       substr(text, 1, 12) AS head
FROM documents WHERE doc_id < 40
""")
def scan_binary_files(spark, sf_dir):
    """Whole-file binary ingest via Spark's `binaryFile` source — the
    entry point of every multimodal pipeline (images/audio arrive as
    FILES; the engine's decode operators take over from the `content`
    column this source produces). The fixture materializes 40 docs as
    one .bin file each (utf-8 of `text`, plus a .tmp decoy the
    pathGlobFilter must skip); the gate reads them back whole-file,
    parses the id out of the path, and emits byte length, md5 digest,
    and a decoded head — all recomputed by the oracle from the
    original table, so a truncated read, glob leak, or encoding bug
    breaks the hash. Scale: binaryFile splits per FILE (never inside
    one), so partition parallelism = file count; the decode stages
    downstream are Arrow-batched mapInPandas."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    root = f"/tmp/pbs_bin{tag}"
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    if not (
        os.path.isdir(root)
        and sum(f.endswith(".bin") for f in os.listdir(root)) == 40
    ):
        os.makedirs(root, exist_ok=True)
        for r in docs.select("doc_id", "text").collect():
            with open(f"{root}/doc_{r.doc_id:05d}.bin", "wb") as fh:
                fh.write(r.text.encode("utf-8"))
        with open(f"{root}/decoy.tmp", "wb") as fh:
            fh.write(b"not a doc")
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(root)
    )
    return bin_df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long").alias("doc_id"),
        F.col("length").cast("long").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
        F.substring(F.decode(F.col("content"), "utf-8"), 1, 12)
        .alias("head"),
    )


def _audio_wht_oracle() -> str:
    from ..operators.multimodal import WHT_BINS

    coeff_cols = ", ".join(
        f"CAST(SUM(samp * (CASE WHEN bit_count(CAST(i % 64 AS BIGINT)"
        f" & {k}) % 2 = 0 THEN 1 ELSE -1 END)) AS BIGINT) AS c{r}"
        for r, k in enumerate(WHT_BINS)
    )
    energy = " + ".join(f"c{r} * c{r}" for r in range(len(WHT_BINS)))
    return f"""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             120 + doc_id % 80 AS n, doc_id % 997 AS seed
           FROM documents),
s AS (SELECT path, n, seed,
        unnest(range(0, ((CAST(n AS BIGINT) + 63) // 64) * 64)) AS i
      FROM d),
v AS (SELECT path, n, i,
        CASE WHEN i < n
             THEN ((i * 2657 + seed * 7919) % 4001) - 2000
             ELSE 0 END AS samp
      FROM s),
c AS (SELECT path, CAST(n AS BIGINT) AS n_frames,
        CAST(i // 64 AS INT) AS window_idx,
        CAST(SUM(CASE WHEN i < n THEN 1 ELSE 0 END) AS INT) AS n_in_window,
        {coeff_cols}
      FROM v GROUP BY path, n, i // 64)
SELECT *, CAST({energy} AS BIGINT) AS energy FROM c
"""


@query("multimodal_audio_wht", oracle=_audio_wht_oracle())
def multimodal_audio_wht(spark, sf_dir):
    """Walsh-Hadamard audio fingerprint (`audio_wht`,
    operators/multimodal.py): per 64-frame window of each decoded WAV,
    the 8 sequency-probe coefficients and exact energy — the
    +-1-basis spectral feature audio hashing uses because it is pure
    INTEGER arithmetic (a float DFT could never hash-match across
    libm implementations). WAV fixtures are the `encode_wav`
    generator-formula files of `multimodal_audio_decode`; the oracle
    rebuilds every sample closed-form, applies the same popcount sign
    rule with `bit_count`, and sums — so the RIFF walk, sign decode,
    zero-pad, AND the transform must all be exactly right. Standard
    media shape: Arrow mapInPandas, bounded batches, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import audio_wht, encode_wav

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(120 + int(i) % 80, 8000,
                                 seed=int(i) % 997))

    make_wav = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    return audio_wht(docs, window=64)


@query("dedup_image_phash", oracle="""
WITH d AS (SELECT doc_id, doc_id % 40 AS s,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                             ELSE 'bmp' END AS fmt
           FROM documents),
g AS (SELECT s, 13 + s % 7 AS w, 9 + s % 5 AS h
      FROM (SELECT DISTINCT s FROM d)),
px AS (SELECT s, w, h, x.x AS px, y.y AS py,
         (x.x * 31 + y.y * 17 + s) % 256 AS gray
       FROM g, LATERAL (SELECT unnest(range(0, CAST(w AS BIGINT))) AS x) x,
              LATERAL (SELECT unnest(range(0, CAST(h AS BIGINT))) AS y) y),
bl AS (SELECT px.s, px.gray, u.u, v.v
       FROM px
       JOIN range(0, 8) u(u)
         ON px.px >= u.u * px.w // 8 AND px.px < (u.u + 1) * px.w // 8
       JOIN range(0, 8) v(v)
         ON px.py >= v.v * px.h // 8 AND px.py < (v.v + 1) * px.h // 8),
sm AS (SELECT s, u, v, SUM(gray) // COUNT(*) AS small
       FROM bl GROUP BY s, u, v),
co AS (SELECT sm.s, f.u2, f.v2,
         SUM(sm.small * (CASE WHEN (bit_count(CAST(f.u2 & sm.u AS BIGINT))
                                    + bit_count(CAST(f.v2 & sm.v AS BIGINT)))
                                   % 2 = 0
                              THEN 1 ELSE -1 END)) AS c
       FROM sm, LATERAL (SELECT a.a AS u2, b.b AS v2
                         FROM range(0, 8) a(a), range(0, 8) b(b)) f
       GROUP BY sm.s, f.u2, f.v2),
idxd AS (SELECT s, u2 * 8 + v2 AS idx, c FROM co),
med AS (SELECT s, c AS m
        FROM (SELECT s, c, row_number() OVER (PARTITION BY s
                                              ORDER BY c, idx) AS rn
              FROM idxd WHERE idx > 0)
        WHERE rn = 32),
ph AS (SELECT idxd.s,
         CAST(SUM(CASE WHEN idxd.idx > 0 AND idxd.c > med.m
                       THEN 1::BIGINT << (idxd.idx - 1) ELSE 0 END)
              AS BIGINT) AS phash
       FROM idxd JOIN med ON idxd.s = med.s GROUP BY idxd.s)
SELECT ph.phash,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT d.fmt) AS BIGINT) AS n_formats,
       CAST(MIN(d.doc_id) AS BIGINT) AS canonical_id
FROM d JOIN ph ON d.s = ph.s
GROUP BY ph.phash
""")
def dedup_image_phash(spark, sf_dir):
    """Perceptual-hash image dedup (`image_phash`,
    operators/multimodal.py): every blob decodes through its real
    codec (PNG/GIF/BMP round-robin, RAGGED sizes 13-19 x 9-13 so the
    floor-range block resize is exercised off the easy multiples),
    downsamples to 8x8 integer block means, 2-D Walsh-Hadamard
    transforms, and hashes one bit per non-DC coefficient against the
    fixed-index median — then groups by the 63-bit hash. Cross-format
    copies collapse by PERCEPTION (the near-dup robustness to in-block
    pixel tweaks is unit-pinned — an oracle can only replay what is
    deterministic end-to-end). The oracle rebuilds the entire pipeline
    closed-form in SQL: formula pixels -> block partition join ->
    popcount-sign transform -> windowed median -> bit assembly; one
    wrong pixel, block boundary, sign, or tie-break anywhere breaks
    the hash."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        encode_bmp_gray, encode_gif, encode_png, image_phash)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 40
            w, h = 13 + s % 7, 9 + s % 5
            if i % 3 == 0:
                return encode_png(w, h, seed=s)
            if i % 3 == 1:
                return encode_gif(w, h, seed=s)
            return encode_bmp_gray(w, h, seed=s)

        return doc_id.map(one)

    make_img = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("doc_id"),
        F.col("doc_id").cast("string").alias("path"),
        make_img(F.col("doc_id")).alias("content"),
    )
    hashed = image_phash(docs, grid=8).select(
        F.col("path").cast("long").alias("doc_id"), "format", "phash"
    )
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies"),
        F.countDistinct("format").cast("long").alias("n_formats"),
        F.min("doc_id").cast("long").alias("canonical_id"),
    )


@query("multimodal_scene_cuts", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             10 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
             doc_id % 97 AS seed
           FROM documents),
px AS (SELECT d.path, d.w, d.h, f.f, x.x, y.y,
         (x.x * 31 + y.y * 17 + f.f * 2 + d.seed
          + CASE WHEN f.f >= 3 THEN 128 ELSE 0 END) % 256 AS cur,
         (x.x * 31 + y.y * 17 + (f.f - 1) * 2 + d.seed
          + CASE WHEN f.f - 1 >= 3 THEN 128 ELSE 0 END) % 256 AS prv
       FROM d
       JOIN range(1, 6) f(f) ON TRUE
       JOIN LATERAL (SELECT unnest(range(0, CAST(d.w AS BIGINT))) AS x) x
         ON TRUE
       JOIN LATERAL (SELECT unnest(range(0, CAST(d.h AS BIGINT))) AS y) y
         ON TRUE),
sad AS (SELECT path, CAST(f AS INT) AS frame_idx,
          CAST(w * h AS INT) AS n_pixels,
          CAST(SUM(abs(cur - prv)) AS BIGINT) AS sad
        FROM px GROUP BY path, f, w, h),
m AS (SELECT *, round(CAST(sad AS DOUBLE) / n_pixels, 6) AS mad FROM sad),
c AS (SELECT *, mad >= 64.0 AS is_cut FROM m)
SELECT path, frame_idx, n_pixels, sad, mad, is_cut,
  CAST(SUM(CASE WHEN is_cut THEN 1 ELSE 0 END)
       OVER (PARTITION BY path ORDER BY frame_idx) AS INT) AS scene_id
FROM c
""")
def multimodal_scene_cuts(spark, sf_dir):
    """Scene-change detection (`video_scene_cuts`,
    operators/multimodal.py): every document becomes a real 6-frame
    YUV4MPEG2 stream whose scene schedule drifts +2/frame with a +128
    luma jump at frame 3; the pipeline decodes the stream, computes
    the exact per-pair sum of absolute differences, flags cuts at
    per-pixel MAD >= 64, and numbers scenes with a running cut count —
    the segmentation that makes frame sampling per-SCENE instead of
    per-stride. The oracle rebuilds both frames of every pair
    closed-form and replays SAD, the rounded MAD, the flag, and the
    scene numbering; a one-pixel decode error or an off-by-one in the
    pair indexing breaks the hash. Arrow mapInPandas, zero shuffle
    (scene ids are per-file running counts inside the kernel)."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_y4m, video_scene_cuts

    def _make(doc_id):
        def one(i):
            i = int(i)
            seeds = [-27 * f + (128 if f >= 3 else 0) for f in range(6)]
            return encode_y4m(
                10 + i % 5, 8 + i % 3, n_frames=6, seed=i % 97,
                scene_seeds=seeds)

        return doc_id.map(one)

    make_v = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_v(F.col("doc_id")).alias("content"),
    )
    return video_scene_cuts(docs, threshold=64.0)


@query("split_stratified_kfold", oracle=f"""
WITH d AS (SELECT event_type, event_id,
    substr(md5('skfold:' || {_enc_sql('event_id')}), 1, 16) AS draw
  FROM events),
f AS (SELECT event_type,
        CAST((row_number() OVER (PARTITION BY event_type
                                 ORDER BY draw, event_id) - 1) % 5 AS INT)
          AS fold
      FROM d)
SELECT event_type, fold, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM f GROUP BY 1, 2
""")
def split_stratified_kfold(spark, sf_dir):
    """Stratified 5-fold assignment (`stratified_kfold`,
    operators/splits.py): within each event_type class, rows rank by
    their md5 draw and fold = rank % 5, so per-class fold sizes
    differ by at most one — the class-balance guarantee hash folds
    only give in expectation. The oracle replays draw, rank, and
    modulo; per-(class, fold) counts pin the balance exactly."""
    from ..operators.splits import stratified_kfold

    ev = load(spark, sf_dir, "events")
    folds = stratified_kfold(ev, "event_type", "event_id", k=5)
    return folds.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"))


@query("scan_csv_quoted", oracle="""
WITH m AS (SELECT doc_id,
    substr(text, 1, 10) || ',"x' || chr(10) || 'y",' || lang AS tricky
  FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       md5(string_agg(tricky, '|' ORDER BY doc_id)) AS content_digest,
       CAST(SUM(length(tricky)) AS BIGINT) AS total_chars
FROM m
""")
def scan_csv_quoted(spark, sf_dir):
    """CSV quoting robustness: a column whose every value embeds the
    delimiter, double quotes, AND a raw newline round-trips through a
    CSV sink and a multiLine schema'd scan. The digest orders by id
    and hashes the reassembled values — one swallowed quote, one
    split record, or one mangled embedded newline changes it. (The
    naive single-line CSV reader CANNOT parse this file; multiLine
    scanning trades input split parallelism for correctness — at
    scale, prefer escaping newlines at WRITE time, which restores
    per-line splits.) The oracle recomputes from the origin table."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    docs = load(spark, sf_dir, "documents")
    tricky = F.concat(
        F.substring("text", 1, 10), F.lit(',"x\ny",'), F.col("lang"))
    src = docs.select("doc_id", tricky.alias("tricky"))
    path = f"/tmp/pbs_fmt{tag}/docs_quoted_csv"
    # escape must be the quote char on BOTH sides: the writer then
    # doubles embedded quotes (RFC 4180) instead of backslash-escaping,
    # which the multiLine reader would mis-split on
    _materialize(src, path, "csv", header="true", quoteAll="true",
                 escape='"')
    back = (
        spark.read.schema("doc_id long, tricky string")
        .options(header="true", multiLine="true", quote='"', escape='"')
        .csv(path)
    )
    # id-sorted struct collect: collect_list order under partial aggs
    # is NOT the input order — sort after collecting
    vals = F.array_sort(
        F.collect_list(F.struct("doc_id", "tricky"))
    ).getField("tricky")
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.md5(F.concat_ws("|", vals)).alias("content_digest"),
        F.sum(F.length("tricky")).cast("long").alias("total_chars"),
    )


@query("dedup_phash_near", oracle="""
WITH d AS (SELECT doc_id, doc_id // 2 AS s, doc_id % 2 AS v
           FROM documents WHERE doc_id < 60),
px AS (SELECT d.doc_id, x.x AS px, y.y AS py,
         (x.x * 31 + y.y * 17 + d.s
          + CASE WHEN d.v = 1
                 THEN CASE WHEN (x.x + y.y) % 2 = 0 THEN 1 ELSE 255 END
                 ELSE 0 END) % 256 AS gray
       FROM d
       JOIN range(0, 16) x(x) ON TRUE
       JOIN range(0, 8) y(y) ON TRUE),
sm AS (SELECT doc_id, px // 2 AS u, py AS vb,
         SUM(gray) // COUNT(*) AS small
       FROM px GROUP BY doc_id, px // 2, py),
co AS (SELECT sm.doc_id, f.u2, f.v2,
         SUM(sm.small * (CASE WHEN (bit_count(CAST(f.u2 & sm.u AS BIGINT))
                                    + bit_count(CAST(f.v2 & sm.vb AS BIGINT)))
                                   % 2 = 0
                              THEN 1 ELSE -1 END)) AS c
       FROM sm, LATERAL (SELECT a.a AS u2, b.b AS v2
                         FROM range(0, 8) a(a), range(0, 8) b(b)) f
       GROUP BY sm.doc_id, f.u2, f.v2),
idxd AS (SELECT doc_id, u2 * 8 + v2 AS idx, c FROM co),
med AS (SELECT doc_id, c AS m
        FROM (SELECT doc_id, c, row_number() OVER (PARTITION BY doc_id
                                                   ORDER BY c, idx) AS rn
              FROM idxd WHERE idx > 0)
        WHERE rn = 32),
ph AS (SELECT idxd.doc_id,
         CAST(SUM(CASE WHEN idxd.idx > 0 AND idxd.c > med.m
                       THEN 1::BIGINT << (idxd.idx - 1) ELSE 0 END)
              AS BIGINT) AS phash
       FROM idxd JOIN med ON idxd.doc_id = med.doc_id
       GROUP BY idxd.doc_id),
bands AS (SELECT doc_id, phash, i.i AS band_idx,
            (phash >> (16 * CAST(i.i AS INT))) & 65535 AS band_val
          FROM ph JOIN range(0, 4) i(i) ON TRUE),
cand AS (SELECT DISTINCT CAST(a.doc_id AS VARCHAR) AS id_a,
                CAST(b.doc_id AS VARCHAR) AS id_b,
                a.phash AS ha, b.phash AS hb
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_val = b.band_val
          AND CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR))
SELECT id_a, id_b,
       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 16
""")
def dedup_phash_near(spark, sf_dir):
    """Near-dup image pairing on perceptual hashes
    (`phash_hamming_pairs`, operators/multimodal.py — SimHash banding
    applied to `image_phash`): 30 base pictures each appear clean AND
    with alternating +-1 pixel noise (a recompression stand-in,
    encoded through the real BMP codec via its explicit-raster
    fixture path); hashes band into 4x16 bits, candidates share an
    exact band (equi-join, never all-pairs), verification is one
    bit_count(xor) <= 16 filter. The oracle replays the ENTIRE
    pipeline — noisy pixels, block means, WHT, median bits, banding,
    Hamming — in SQL. 22 of the 30 noisy variants pair with their
    clean twin by PERCEPTION while every byte-level digest differs;
    the rest sit beyond the radius because the +-1 noise cancels
    inside most 2x1 blocks but WRAPS (0 -> 255) spike the remainder —
    all deterministic, all replayed."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        encode_bmp_gray, image_phash, phash_hamming_pairs)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s, v = i // 2, i % 2
            if v == 0:
                return encode_bmp_gray(16, 8, seed=s)
            pix = bytes(
                (x * 31 + y * 17 + s
                 + (1 if (x + y) % 2 == 0 else 255)) % 256
                for y in range(8) for x in range(16))
            return encode_bmp_gray(16, 8, pixels=pix)

        return doc_id.map(one)

    make_img = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    ).select(
        F.col("doc_id").cast("string").alias("path"),
        make_img(F.col("doc_id")).alias("content"),
    )
    hashed = image_phash(docs, grid=8)
    return phash_hamming_pairs(
        hashed, id_col="path", hash_col="phash",
        max_distance=16, band_bits=16,
    )


@query("multimodal_audio_segments", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             120 + doc_id % 80 AS n, doc_id % 997 AS seed
           FROM documents),
s AS (SELECT path, n, seed, unnest(range(0, CAST(n AS BIGINT))) AS i
      FROM d),
v AS (SELECT path, n, i, CAST(i // 50 AS INT) AS w,
        ((i * 2657 + seed * 7919) % 4001) - 2000 AS samp
      FROM s),
wn AS (SELECT path, n, w,
         round(sqrt(SUM(samp * samp) / COUNT(*)), 6) AS rms,
         MAX(ABS(samp)) AS pk,
         MIN(i) AS w_lo, MAX(i) AS w_hi
       FROM v GROUP BY path, n, w),
act AS (SELECT path, n, w, pk, w_lo, w_hi,
          rms >= 1150.0 AS active,
          LAG(rms >= 1150.0) OVER (PARTITION BY path ORDER BY w) AS prev_a
        FROM wn),
isl AS (SELECT path, n, w, pk, w_lo, w_hi,
          SUM(CASE WHEN active AND (prev_a IS NULL OR NOT prev_a)
                   THEN 1 ELSE 0 END)
            OVER (PARTITION BY path ORDER BY w) - 1 AS seg
        FROM act WHERE TRUE QUALIFY active),
segs AS (SELECT path, CAST(seg AS INT) AS segment_id,
           CAST(COUNT(*) AS INT) AS n_windows,
           CAST(MIN(w) * 50 AS BIGINT) AS start_frame,
           CAST(least((MAX(w) + 1) * 50, MIN(n)) AS BIGINT) AS end_frame,
           CAST(MAX(pk) AS INT) AS peak
         FROM isl GROUP BY path, seg)
SELECT * FROM segs
""")
def multimodal_audio_segments(spark, sf_dir):
    """Activity segmentation (`audio_activity_segments`,
    operators/multimodal.py — the VAD-shaped silence trimmer): decoded
    WAV windows whose exact-integer RMS clears 1150 merge into runs,
    one row per segment with window count, frame span, and peak. The
    threshold sits inside the generator waveform's natural RMS band,
    so windows straddle it and segment boundaries exercise the run
    logic; the oracle rebuilds every sample, every RMS, and the
    island numbering closed-form. In-kernel run-length — zero
    shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        audio_activity_segments, encode_wav)

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(120 + int(i) % 80, 8000,
                                 seed=int(i) % 997))

    make_wav = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"),
    )
    return audio_activity_segments(docs, rms_threshold=1150.0, window=50)


@query("multimodal_image_patches", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             doc_id % 40 AS s,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                             ELSE 'bmp' END AS fmt
           FROM documents WHERE doc_id < 120),
g AS (SELECT path, s, 9 + s % 6 AS w, 8 + s % 5 AS h FROM d),
t AS (SELECT path, s, w, h, pr.pr, pc.pc
      FROM g
      JOIN LATERAL (SELECT unnest(range(0, CAST(h // 4 AS BIGINT))) AS pr) pr
        ON TRUE
      JOIN LATERAL (SELECT unnest(range(0, CAST(w // 4 AS BIGINT))) AS pc) pc
        ON TRUE),
vals AS (SELECT path, w, h, pr, pc,
    flatten([[ (CAST(pc * 4 + dx AS BIGINT) * 31
                + CAST(pr * 4 + dy AS BIGINT) * 17 + s) % 256
               FOR dx IN range(0, 4)] FOR dy IN range(0, 4)]) AS vv
  FROM t)
SELECT path, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       md5(array_to_string(vv, ',')) AS patch_digest,
       round(CAST(list_sum(vv) AS DOUBLE) / 16, 6) AS patch_mean
FROM vals
""")
def multimodal_image_patches(spark, sf_dir):
    """ViT-style patch extraction (`image_patches`,
    operators/multimodal.py): 120 images (PNG/GIF/BMP round-robin,
    ragged sizes) decode and emit one row per non-overlapping 4x4
    tile — digest + exact mean — the patch-token grid vision models
    train on, with the digest making tile-level dedup a plain groupBy.
    Ragged edges drop (the ViT convention). The oracle rebuilds every
    tile's pixels closed-form; a decoder or tiling off-by-one breaks
    the hash."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        encode_bmp_gray, encode_gif, encode_png, image_patches)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 40
            w, h = 9 + s % 6, 8 + s % 5
            enc = (encode_png, encode_gif, encode_bmp_gray)[i % 3]
            return enc(w, h, seed=s)

        return doc_id.map(one)

    make_img = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    ).select(
        F.col("doc_id").cast("string").alias("path"),
        make_img(F.col("doc_id")).alias("content"),
    )
    return image_patches(docs, patch=4)


@query("multimodal_image_augment", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             doc_id % 40 AS s,
             9 + (doc_id % 40) % 6 AS w, 8 + (doc_id % 40) % 5 AS h
           FROM documents WHERE doc_id < 120),
f AS (SELECT path, 'flip_h' AS aug, CAST(w AS INT) AS width,
        CAST(h AS INT) AS height,
        md5(array_to_string(flatten(
          [[ (CAST(w - 1 - x AS BIGINT) * 31 + CAST(y AS BIGINT) * 17 + s)
             % 256
             FOR x IN range(0, CAST(w AS BIGINT))]
            FOR y IN range(0, CAST(h AS BIGINT))]), ',')) AS aug_digest
      FROM d),
r AS (SELECT path, 'rot90' AS aug, CAST(h AS INT) AS width,
        CAST(w AS INT) AS height,
        md5(array_to_string(flatten(
          [[ (CAST(i AS BIGINT) * 31 + CAST(h - 1 - j AS BIGINT) * 17 + s)
             % 256
             FOR j IN range(0, CAST(h AS BIGINT))]
            FOR i IN range(0, CAST(w AS BIGINT))]), ',')) AS aug_digest
      FROM d),
c AS (SELECT path, 'center_crop' AS aug, CAST(w // 2 AS INT) AS width,
        CAST(h // 2 AS INT) AS height,
        md5(array_to_string(flatten(
          [[ (CAST(w // 4 + x AS BIGINT) * 31
              + CAST(h // 4 + y AS BIGINT) * 17 + s) % 256
             FOR x IN range(0, CAST(w // 2 AS BIGINT))]
            FOR y IN range(0, CAST(h // 2 AS BIGINT))]), ',')) AS aug_digest
      FROM d)
SELECT * FROM f UNION ALL SELECT * FROM r UNION ALL SELECT * FROM c
""")
def multimodal_image_augment(spark, sf_dir):
    """Deterministic augmentation stage (`augment_images`,
    operators/multimodal.py): 120 ragged-size images (PNG/GIF/BMP
    round-robin) each emit horizontal-flip, clockwise-rotate-90, and
    center-crop variants with transformed dims + pixel digest — the
    corpus-side exact augs a pipeline materializes (stochastic jitter
    belongs on the training loader). All three are pure index
    remaps, so the oracle rebuilds every variant closed-form from the
    generator formula; a transposed axis or off-by-one crop origin
    breaks the hash."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        augment_images, encode_bmp_gray, encode_gif, encode_png)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 40
            w, h = 9 + s % 6, 8 + s % 5
            enc = (encode_png, encode_gif, encode_bmp_gray)[i % 3]
            return enc(w, h, seed=s)

        return doc_id.map(one)

    make_img = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    ).select(
        F.col("doc_id").cast("string").alias("path"),
        make_img(F.col("doc_id")).alias("content"),
    )
    return augment_images(docs)


@query("multimodal_video_thumbnail", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             10 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
             doc_id % 97 AS seed
           FROM documents),
px AS (SELECT d.path, d.w, d.h, f.f, x.x, y.y,
         (x.x * 31 + y.y * 17 + f.f * 29 + d.seed) % 256 AS p
       FROM d
       JOIN range(0, 5) f(f) ON TRUE
       JOIN LATERAL (SELECT unnest(range(0, CAST(d.w AS BIGINT))) AS x) x
         ON TRUE
       JOIN LATERAL (SELECT unnest(range(0, CAST(d.h AS BIGINT))) AS y) y
         ON TRUE),
sc AS (SELECT path, f, w, h,
         COUNT(*) * SUM(p * p) - SUM(p) * SUM(p) AS score
       FROM px GROUP BY path, f, w, h),
pick AS (SELECT path, f, w, h, score
         FROM sc
         QUALIFY row_number() OVER (PARTITION BY path
                                    ORDER BY score DESC, f) = 1),
dig AS (SELECT pick.path, pick.f, pick.score,
          md5(array_to_string(flatten(
            [[ (CAST(x AS BIGINT) * 31 + CAST(y AS BIGINT) * 17
                + pick.f * 29
                + (CAST(pick.path AS BIGINT) % 97)) % 256
               FOR x IN range(0, CAST(pick.w AS BIGINT))]
              FOR y IN range(0, CAST(pick.h AS BIGINT))]), ','))
            AS thumb_digest
        FROM pick)
SELECT path, CAST(5 AS INT) AS n_frames, CAST(f AS INT) AS chosen_idx,
       CAST(score AS BIGINT) AS variance_x16, thumb_digest
FROM dig
""")
def multimodal_video_thumbnail(spark, sf_dir):
    """Poster-frame selection (`video_thumbnail`,
    operators/multimodal.py): every document becomes a 5-frame Y4M
    stream; each frame scores the EXACT integer n*sumsq - sum^2
    (variance times n^2 — no division, so the argmax is exact), the
    busiest frame wins with lowest-index tie-break, and its pixel
    digest ships as the thumbnail identity. Oracle replays per-frame
    scores, the windowed argmax, and the chosen frame's digest
    closed-form. Zero shuffle — per-file selection inside the
    kernel."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_y4m, video_thumbnail

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_y4m(10 + int(i) % 5, 8 + int(i) % 3,
                                 n_frames=5, seed=int(i) % 97))

    make_v = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_v(F.col("doc_id")).alias("content"),
    )
    return video_thumbnail(docs)


@query("scan_text_lines", oracle="""
WITH m AS (SELECT doc_id,
             CAST(doc_id AS VARCHAR) || '|' || substr(text, 1, 40) AS line
           FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       md5(string_agg(line, chr(10) ORDER BY line)) AS digest,
       CAST(SUM(length(line)) AS BIGINT) AS total_chars
FROM m
""")
def scan_text_lines(spark, sf_dir):
    """Line-oriented text source round-trip (`spark.read.text` — the
    rawest ingest format; WET dumps and log files arrive this way):
    one line per doc (id-prefixed so lines are unique) written via the
    text sink and read back line-per-row; the digest aggregates the
    LINE-SORTED content (text files carry no row order across
    part-files — sorting by content is the only portable identity).
    The oracle recomputes from the origin table."""
    tag = sf_dir.rstrip("/").replace("/", "_")
    docs = load(spark, sf_dir, "documents")
    src = docs.select(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"),
                 F.substring("text", 1, 40)).alias("value"))
    path = f"/tmp/pbs_fmt{tag}/docs_text_lines"
    _materialize(src, path, "text")
    back = spark.read.text(path)
    vals = F.array_sort(F.collect_list("value"))
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.md5(F.concat_ws("\n", vals)).alias("digest"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
    )


@query("pipeline_multimodal_intake", oracle="""
WITH d AS (SELECT doc_id, doc_id % 30 AS s,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                             ELSE 'bmp' END AS fmt
           FROM documents WHERE doc_id < 90),
g AS (SELECT DISTINCT s, 13 + s % 7 AS w, 9 + s % 5 AS h FROM d),
px AS (SELECT s, w, h, x.x AS px, y.y AS py,
         (x.x * 31 + y.y * 17 + s) % 256 AS gray
       FROM g, LATERAL (SELECT unnest(range(0, CAST(w AS BIGINT))) AS x) x,
              LATERAL (SELECT unnest(range(0, CAST(h AS BIGINT))) AS y) y),
bl AS (SELECT px.s, px.gray, u.u, v.v
       FROM px
       JOIN range(0, 8) u(u)
         ON px.px >= u.u * px.w // 8 AND px.px < (u.u + 1) * px.w // 8
       JOIN range(0, 8) v(v)
         ON px.py >= v.v * px.h // 8 AND px.py < (v.v + 1) * px.h // 8),
sm AS (SELECT s, u, v, SUM(gray) // COUNT(*) AS small
       FROM bl GROUP BY s, u, v),
co AS (SELECT sm.s, f.u2, f.v2,
         SUM(sm.small * (CASE WHEN (bit_count(CAST(f.u2 & sm.u AS BIGINT))
                                    + bit_count(CAST(f.v2 & sm.v AS BIGINT)))
                                   % 2 = 0
                              THEN 1 ELSE -1 END)) AS c
       FROM sm, LATERAL (SELECT a.a AS u2, b.b AS v2
                         FROM range(0, 8) a(a), range(0, 8) b(b)) f
       GROUP BY sm.s, f.u2, f.v2),
idxd AS (SELECT s, u2 * 8 + v2 AS idx, c FROM co),
med AS (SELECT s, c AS m
        FROM (SELECT s, c, row_number() OVER (PARTITION BY s
                                              ORDER BY c, idx) AS rn
              FROM idxd WHERE idx > 0)
        WHERE rn = 32),
ph AS (SELECT idxd.s,
         CAST(SUM(CASE WHEN idxd.idx > 0 AND idxd.c > med.m
                       THEN 1::BIGINT << (idxd.idx - 1) ELSE 0 END)
              AS BIGINT) AS phash
       FROM idxd JOIN med ON idxd.s = med.s GROUP BY idxd.s)
SELECT d.fmt,
  CAST(COUNT(*) AS BIGINT) AS n_images,
  CAST(COUNT(DISTINCT ph.phash) AS BIGINT) AS n_perceptual,
  CAST(COUNT(DISTINCT d.s) AS BIGINT) AS n_exact,
  CAST(SUM(13 + d.s % 7) AS BIGINT) AS total_width
FROM d JOIN ph ON ph.s = d.s
GROUP BY d.fmt
""")
def pipeline_multimodal_intake(spark, sf_dir):
    """Multimodal intake report — the composition over this round's
    image stack: 90 blobs (PNG/GIF/BMP round-robin over 30 base
    pictures) decode through `image_phash`, and the per-FORMAT report
    counts images, distinct perceptual identities, distinct exact
    pictures, and total decoded width — the dashboard a curation run
    publishes before images enter training. Every number derives from
    the real codec path; the oracle replays the full WHT-hash pipeline
    plus the report rollup."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import (
        encode_bmp_gray, encode_gif, encode_png, image_phash)

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 30
            w, h = 13 + s % 7, 9 + s % 5
            enc = (encode_png, encode_gif, encode_bmp_gray)[i % 3]
            return enc(w, h, seed=s)

        return doc_id.map(one)

    make_img = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 90)
    ).select(
        F.col("doc_id").cast("string").alias("path"),
        (F.col("doc_id") % 30).alias("s"),
        make_img(F.col("doc_id")).alias("content"),
    )
    hashed = image_phash(docs, grid=8).select(
        F.col("path").cast("long").alias("doc_id"), "format",
        "width", "phash",
    ).withColumn("s", F.col("doc_id") % 30)
    return hashed.groupBy(F.col("format").alias("fmt")).agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.countDistinct("phash").cast("long").alias("n_perceptual"),
        F.countDistinct("s").cast("long").alias("n_exact"),
        F.sum("width").cast("long").alias("total_width"),
    )


def _neyman_oracle() -> str:
    """Full replay of neyman_sample: quantized exact moments, the IEEE
    variance identity, floor + largest-remainder allocation with the
    population clamp, and bottom-n_h PRF membership per stratum."""
    enc = ("'v' || CAST(length(CAST(o_orderkey AS VARCHAR)) AS VARCHAR)"
           " || ':' || CAST(o_orderkey AS VARCHAR)")
    return f"""
WITH r AS (SELECT o_orderstatus AS st, o_orderkey AS k,
             o_totalprice AS v,
             CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS xq,
             substr(md5('neyman:' || {enc}), 1, 16) AS draw
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND o_orderstatus IS NOT NULL),
st AS (SELECT st, COUNT(*) AS n, SUM(xq) AS s1,
         SUM(CAST(xq * xq AS DECIMAL(30,0))) AS s2
       FROM r GROUP BY 1),
w AS (SELECT st, n,
        CAST(n AS DOUBLE)
        * (sqrt(greatest(
            (CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE), 0.0))
           / 100.0) AS w
      FROM st),
tot AS (SELECT SUM(w) AS tw, SUM(n) AS tn FROM w),
sh AS (SELECT w.st, w.n,
         CASE WHEN tot.tw > 0 THEN 300.0 * w.w / tot.tw
              ELSE 300.0 * CAST(w.n AS DOUBLE) / CAST(tot.tn AS DOUBLE)
         END AS share
       FROM w CROSS JOIN tot),
al AS (SELECT st, n, CAST(floor(share) AS BIGINT) AS base,
         share - floor(share) AS rem
       FROM sh),
al2 AS (SELECT st, n, base,
          300 - SUM(base) OVER () AS leftover,
          row_number() OVER (ORDER BY rem DESC, st) AS pos
        FROM al),
alloc AS (SELECT st,
            least(n, base + CASE WHEN pos <= leftover THEN 1 ELSE 0 END)
              AS n_target
          FROM al2),
ranked AS (SELECT st, k, v,
             row_number() OVER (PARTITION BY st ORDER BY draw, k) AS rn
           FROM r)
SELECT ranked.st AS o_orderstatus, ranked.k AS o_orderkey,
       ranked.v AS o_totalprice, alloc.n_target
FROM ranked JOIN alloc USING (st)
WHERE ranked.rn <= alloc.n_target
"""


@query("sample_neyman", oracle=_neyman_oracle())
def sample_neyman(spark, sf_dir):
    """Stratified sampling under Neyman 1934 OPTIMAL allocation
    (`neyman_sample`, operators/splits.py): a 300-row budget splits
    across order-status strata proportional to N_h·sigma_h of the
    order value — the allocation that minimizes the stratified-mean
    variance at fixed budget. Deterministic end to end: exact
    quantized moments (order-free long/decimal sums), IEEE variance
    identity, floor + largest-remainder integer allocation clamped at
    the stratum population, bottom-n_h md5-PRF membership. One input
    aggregation + one per-stratum rank window; allocation arithmetic
    is strata-bounded. The oracle replays moments, shares, remainders
    and membership exactly."""
    from ..operators.splits import neyman_sample

    orders = load(spark, sf_dir, "orders")
    return neyman_sample(
        orders, "o_orderstatus", "o_totalprice", "o_orderkey",
        total_n=300)


@query("multimodal_audio_spectral", oracle="""
WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS path,
             120 + doc_id % 80 AS n, doc_id % 997 AS seed
           FROM documents),
s AS (SELECT path, n, seed, unnest(range(0, CAST(n AS BIGINT))) AS i
      FROM d),
v AS (SELECT path, i,
        ((i * 2657 + seed * 7919) % 4001) - 2000 AS samp
      FROM s),
w AS (SELECT path, CAST(i // 64 AS INT) AS window_idx,
        CAST(COUNT(*) AS INT) AS n_in_window,
        CAST(SUM(samp) AS BIGINT) AS dc,
        CAST(SUM(samp * samp) AS BIGINT) AS energy,
        SUM(CASE i % 4 WHEN 0 THEN samp WHEN 2 THEN -samp
            ELSE 0 END) AS re4,
        -SUM(CASE i % 4 WHEN 1 THEN samp WHEN 3 THEN -samp
             ELSE 0 END) AS im4,
        SUM(CASE WHEN i % 2 = 0 THEN samp ELSE -samp END) AS alt
      FROM v GROUP BY 1, 2)
SELECT path, window_idx, n_in_window, dc, energy,
  CAST(re4 * re4 + im4 * im4 AS BIGINT) AS m_fs4_sq,
  CAST(alt * alt AS BIGINT) AS m_fs2_sq,
  CASE WHEN energy > 0 THEN round(
    CAST(alt * alt AS DOUBLE) / (n_in_window * energy), 6)
  END AS hf_ratio
FROM w
""")
def multimodal_audio_spectral(spark, sf_dir):
    """Per-window exact-arithmetic spectral probes
    (`audio_spectral_probe`, operators/multimodal.py): the DFT at the
    three integer-twiddle bins — DC sum, |X[N/4]|^2, the Nyquist
    alternating-sign |X[N/2]|^2 — plus Parseval-side energy and the
    released high-frequency ratio, over REAL RIFF/WAVE decodes of the
    closed-form fixture waveform (the multimodal_audio_decode
    fixture). The oracle recomputes every sample and every strided
    sign-sum closed-form, so the chunk walk, PCM sign decode,
    windowing, AND the bin arithmetic must all be exactly right.
    Same Arrow mapInPandas media shape, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import audio_spectral_probe, encode_wav

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_wav(120 + int(i) % 80, 8000,
                                 seed=int(i) % 997))

    make_wav = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_wav(F.col("doc_id")).alias("content"))
    return audio_spectral_probe(docs, window=64)


_PNM_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id % 997 AS s,
    doc_id % 4 AS f,
    CASE WHEN doc_id % 2 = 0 THEN 255 ELSE 1023 END AS mv,
    4 + (doc_id % 997) % 13 AS w, 3 + (doc_id % 997) % 9 AS h
  FROM documents),
xs AS (SELECT path, s, f, mv, w, h, unnest(range(w)) AS x FROM d),
pix AS (SELECT path, s, f, mv, w, h, x, unnest(range(h)) AS y FROM xs),
v AS (SELECT path, f, mv, w, h,
    CASE WHEN f IN (0, 2) THEN (s + 3 * x + 7 * y) % (mv + 1)
         ELSE (s + x + y) % (mv + 1) + (2 * s + 2 * x + y) % (mv + 1)
              + (3 * s + x + 2 * y) % (mv + 1) END AS sv
  FROM pix)
SELECT path,
  CASE MAX(f) WHEN 0 THEN 'P2' WHEN 1 THEN 'P3'
              WHEN 2 THEN 'P5' ELSE 'P6' END AS format,
  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
  CAST(MAX(mv) AS INT) AS maxval,
  CAST(CASE WHEN MAX(f) IN (0, 2) THEN 1 ELSE 3 END AS INT)
    AS channels,
  CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM(sv) AS BIGINT) AS sum_v
FROM v GROUP BY path
"""


@query("multimodal_pnm", oracle=_PNM_ORACLE)
def multimodal_pnm(spark, sf_dir):
    """PNM/Netpbm decode (`decode_pnm` + `pnm_stats`,
    operators/multimodal.py; pgm(5)/ppm(5)) — REAL parses of
    spec-faithful P2/P3 (ASCII) and P5/P6 (binary) files rotating by
    doc id, half at maxval 255 and half at 1023 (the 2-byte
    BIG-endian binary branch and multi-digit ASCII tokens), each with
    a comment line in the header (the grammar corner naive parsers
    drop). Per-file all-channel sample sums replay closed-form, so
    header tokenization, raster addressing, byte order, and the
    maxval branch must all be exactly right. Arrow mapInPandas media
    shape, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_pnm, pnm_stats

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_pnm(
                ("P2", "P3", "P5", "P6")[int(i) % 4],
                4 + int(i) % 997 % 13, 3 + int(i) % 997 % 9,
                seed=int(i) % 997,
                maxval=255 if int(i) % 2 == 0 else 1023))

    make_pnm = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_pnm(F.col("doc_id")).alias("content"))
    return pnm_stats(docs)


_QOI_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id % 997 AS s,
    8 + (doc_id % 997) % 24 AS w, 8 + (doc_id % 997) % 16 AS h
  FROM documents),
xs AS (SELECT path, s, w, h, unnest(range(w)) AS x FROM d),
pix AS (SELECT path, s, w, h, x, unnest(range(h)) AS y FROM xs),
v AS (SELECT path, w, h,
    CASE WHEN y % 5 = 0 THEN
      CASE (x // 3) % 4 WHEN 0 THEN 255 WHEN 1 THEN 0
           WHEN 2 THEN 0 ELSE 128 END
    ELSE (s * 3 + x // 3 + y) % 256 END AS r,
    CASE WHEN y % 5 = 0 THEN
      CASE (x // 3) % 4 WHEN 0 THEN 0 WHEN 1 THEN 255
           WHEN 2 THEN 0 ELSE 128 END
    ELSE (s * 5 + x // 3 + 2 * y) % 256 END AS g,
    CASE WHEN y % 5 = 0 THEN
      CASE (x // 3) % 4 WHEN 0 THEN 0 WHEN 1 THEN 0
           WHEN 2 THEN 255 ELSE 128 END
    ELSE (s * 7 + 2 * (x // 3) + y) % 256 END AS b
  FROM pix)
SELECT path, CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
  CAST(3 AS INT) AS channels, CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g,
  CAST(SUM(b) AS BIGINT) AS sum_b
FROM v GROUP BY path
"""


@query("multimodal_qoi", oracle=_QOI_ORACLE)
def multimodal_qoi(spark, sf_dir):
    """QOI image decode (`decode_qoi` + `qoi_stats`,
    operators/multimodal.py; the 2022 qoiformat.org spec) — REAL
    decodes of spec-faithful QOI files exercising all five chunk ops
    (RUN from the horizontal triples, DIFF/LUMA from the +1/+1/+2
    cross-triple deltas, INDEX from the recurring stripe palette, RGB
    at row seams): per-file channel sums the oracle replays pixel-by-
    pixel closed-form, so the header walk, the running 64-entry index,
    wraparound deltas, AND run expansion must all be exactly right.
    Arrow mapInPandas media shape, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_qoi, qoi_stats

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_qoi(
                8 + int(i) % 997 % 24, 8 + int(i) % 997 % 16,
                int(i) % 997))

    make_qoi = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_qoi(F.col("doc_id")).alias("content"))
    return qoi_stats(docs)


@query("multimodal_ico", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id % 997 AS s,
    2 + doc_id % 2 AS cnt, doc_id AS did
  FROM documents),
e AS (SELECT path, s, did, CAST(unnest(range(cnt)) AS INT) AS i
  FROM d),
ent AS (SELECT path, i,
    CASE WHEN (did + i) % 2 = 0 THEN 'png' ELSE 'bmp' END AS storage,
    4 + (s + 5 * i) % 12 AS w, 3 + (s + 3 * i) % 9 AS h,
    s + 11 * i AS es
  FROM e),
xs AS (SELECT path, i, storage, w, h, es, unnest(range(w)) AS x
  FROM ent),
pix AS (SELECT path, i, storage, w, h, es, x, unnest(range(h)) AS y
  FROM xs)
SELECT path, i AS entry_idx, MAX(storage) AS storage,
  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
  CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM((x * 31 + y * 17 + es) % 256) AS BIGINT) AS sum_v,
  CAST(SUM(CASE WHEN storage = 'bmp'
                AND (x + y + es) % 7 = 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_masked
FROM pix GROUP BY path, i
""")
def multimodal_ico(spark, sf_dir):
    """ICO container decode (`decode_ico` + `ico_stats`,
    operators/multimodal.py; the win32 ICONDIR resource format) —
    REAL parses of mixed-payload icons rotating by doc id: 2-3
    entries each, alternating complete-PNG-stream payloads (delegated
    to `decode_png_gray`) and doubled-height headerless DIBs
    (rebuilt into standalone BMPs for `decode_bmp_gray`, then the
    1-bpp 32-bit-padded bottom-up AND mask walked separately). The
    per-entry pixel sums AND mask counts replay closed-form, so the
    directory arithmetic, payload dispatch, height split, palette
    rebuild, and mask stride must all be exactly right — genuine
    codec COMPOSITION, the container pattern. Arrow mapInPandas,
    zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_ico, ico_stats

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 997
            cnt = 2 + i % 2
            return encode_ico(
                [("png" if (i + k) % 2 == 0 else "bmp",
                  4 + (s + 5 * k) % 12, 3 + (s + 3 * k) % 9)
                 for k in range(cnt)], seed=s)
        return doc_id.map(one)

    make_ico = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_ico(F.col("doc_id")).alias("content"))
    return ico_stats(docs)


@query("multimodal_tiff_raster", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id % 997 AS s,
    doc_id AS i,
    CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS bo,
    CASE WHEN (doc_id // 2) % 2 = 0 THEN 8 ELSE 16 END AS bits,
    4 + (doc_id % 997) % 9 AS w, 3 + (doc_id % 997) % 7 AS h
  FROM documents),
xs AS (SELECT path, s, bo, bits, w, h, unnest(range(w)) AS x FROM d),
pix AS (SELECT path, s, bo, bits, w, h, x, unnest(range(h)) AS y
  FROM xs)
SELECT path, MAX(bo) AS byte_order,
  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
  CAST(MAX(bits) AS INT) AS bits,
  CAST((MAX(h) + 2) // 3 AS INT) AS n_strips,
  CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM((x * 31 + y * 17 + s)
           % (CASE WHEN bits = 8 THEN 256 ELSE 65536 END))
    AS BIGINT) AS sum_v,
  CAST(MAX(s % (CASE WHEN bits = 8 THEN 256 ELSE 65536 END))
    AS INT) AS first_v
FROM pix GROUP BY path
""")
def multimodal_tiff_raster(spark, sf_dir):
    """Baseline-TIFF grayscale RASTER decode (`decode_tiff_gray` +
    `tiff_stats`, operators/multimodal.py; TIFF 6.0 baseline) —
    extends the r14 EXIF metadata walk to actual pixels, composing
    the same IFD machinery: multi-strip assembly (rows_per_strip=3,
    so every file exercises StripOffsets/StripByteCounts arrays),
    8- AND 16-bit samples in the FILE's byte order (16-bit-MM is
    where naive decoders ship garbage), and WhiteIsZero→BlackIsZero
    photometric normalization (files alternate photometric but all
    decode to the same closed-form, so the inversion is
    hash-checked). Arrow mapInPandas, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_tiff_gray, tiff_stats

    def _make(doc_id):
        def one(i):
            i = int(i)
            s = i % 997
            return encode_tiff_gray(
                4 + s % 9, 3 + s % 7, s,
                byte_order="II" if i % 2 == 0 else "MM",
                bits=8 if (i // 2) % 2 == 0 else 16,
                photometric=(i // 4) % 2)
        return doc_id.map(one)

    make_tiff = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_tiff(F.col("doc_id")).alias("content"))
    return tiff_stats(docs)


@query("source_warc_records", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id AS did,
    doc_id % 997 AS s, 2 + doc_id % 3 AS nrec
  FROM documents),
r AS (SELECT path, did, s, CAST(unnest(range(nrec)) AS INT) AS rec
  FROM d),
recs AS (SELECT path, did, rec, s + 11 * rec AS rs,
    20 + (s + 3 * rec) % 40 AS blen
  FROM r),
bytes AS (SELECT path, rec, rs, blen, unnest(range(blen)) AS i
  FROM recs)
SELECT b.path, b.rec AS rec_idx,
  CASE b.rec % 3 WHEN 0 THEN 'response' WHEN 1 THEN 'request'
                 ELSE 'metadata' END AS warc_type,
  'http://ex.test/' || CAST(r2.did AS VARCHAR) || '/'
    || CAST(b.rec AS VARCHAR) AS target_uri,
  CAST(MAX(b.blen) AS BIGINT) AS content_length,
  CAST(SUM((b.rs + 7 * b.i) % 95 + 32) AS BIGINT) AS block_sum,
  CAST(4 AS INT) AS n_headers
FROM bytes b JOIN d r2 ON b.path = r2.path
GROUP BY b.path, b.rec, r2.did
""")
def source_warc_records(spark, sf_dir):
    """Common Crawl-layout WARC ingest (`split_gzip_members` +
    `parse_warc_record` + `warc_stats`, operators/warc.py; RFC 1952 +
    ISO 28500) — REAL parses of multi-member gzip streams where each
    WARC/1.0 record is its own gzip member (the crawl random-access
    framing): member headers walked field-by-field (every third
    member carries FNAME), CRC32 + ISIZE trailers VERIFIED against
    the inflated payload, the WARC version/header/Content-Length
    grammar enforced, one row per record. Per-record block byte sums
    replay closed-form, so member boundaries, inflate, framing, and
    header parsing all hash-check. Arrow mapInPandas, zero shuffle —
    the 100 TB crawl-ingest shape."""
    from ..operators.dedup import widen_parallelism
    from ..operators.warc import encode_warc_gz, warc_stats

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_warc_gz(
                int(i), 2 + int(i) % 3, seed=int(i) % 997))

    make_warc = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_warc(F.col("doc_id")).alias("content"))
    return warc_stats(docs)


@query("source_zip_entries", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id AS did,
    doc_id % 997 AS s, 2 + doc_id % 4 AS nent
  FROM documents),
e AS (SELECT path, did, s, CAST(unnest(range(nent)) AS INT) AS ei
  FROM d),
ents AS (SELECT path, did, ei, s + 11 * ei AS es,
    16 + (s + 5 * ei) % 48 AS plen
  FROM e),
bytes AS (SELECT path, ei, es, plen, unnest(range(plen)) AS i
  FROM ents)
SELECT b.path, b.ei AS entry_idx,
  'doc' || CAST(d2.did AS VARCHAR) || '/part'
    || CAST(b.ei AS VARCHAR) || '.txt' AS name,
  CAST(CASE WHEN b.ei % 2 = 1 THEN 8 ELSE 0 END AS INT) AS method,
  CAST(MAX(b.plen) AS BIGINT) AS uncomp_size,
  CAST(SUM((b.es + 7 * b.i) % 95 + 32) AS BIGINT) AS byte_sum
FROM bytes b JOIN d d2 ON b.path = d2.path
GROUP BY b.path, b.ei, d2.did
""")
def source_zip_entries(spark, sf_dir):
    """ZIP archive ingest (`list_zip_entries` + `zip_stats`,
    operators/archive.py; PKWARE APPNOTE 4.3) — REAL central-
    directory walks: EOCD found by scanning BACK past the archive
    comment (no fixed position — the naive-parser trap), every
    central entry CROSS-VALIDATED against its local header, payloads
    inflated (alternating stored/deflate) and VERIFIED against the
    recorded CRC32 and size. comp_size is deliberately NOT released
    (zlib compressed bytes are library-version-dependent; the
    verified plaintext is the contract). Per-entry byte sums replay
    closed-form. Arrow mapInPandas container shape, zero shuffle."""
    from ..operators.archive import encode_zip, zip_stats
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_zip(
                int(i), 2 + int(i) % 4, seed=int(i) % 997))

    make_zip = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_zip(F.col("doc_id")).alias("content"))
    return zip_stats(docs).drop("comp_size")


@query("source_targz_entries", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id AS did,
    doc_id % 997 AS s, 2 + doc_id % 3 AS nf
  FROM documents),
dirs AS (SELECT path, 0 AS entry_idx,
    'doc' || CAST(did AS VARCHAR) || '/' AS name,
    5 AS typeflag, 0 AS size, 0 AS byte_sum
  FROM d),
e AS (SELECT path, did, s, CAST(unnest(range(nf)) AS INT) AS ei
  FROM d),
ents AS (SELECT path, did, ei, s + 11 * ei AS es,
    16 + (s + 5 * ei) % 48 AS plen
  FROM e),
bytes AS (SELECT path, did, ei, es, plen, unnest(range(plen)) AS i
  FROM ents),
files AS (SELECT b.path, b.ei + 1 AS entry_idx,
    'doc' || CAST(b.did AS VARCHAR) || '/file'
      || CAST(b.ei AS VARCHAR) || '.txt' AS name,
    0 AS typeflag, CAST(MAX(b.plen) AS BIGINT) AS size,
    CAST(SUM((b.es + 7 * b.i) % 95 + 32) AS BIGINT) AS byte_sum
  FROM bytes b GROUP BY b.path, b.did, b.ei)
SELECT path, CAST(entry_idx AS INT) AS entry_idx, name,
  CAST(typeflag AS INT) AS typeflag, CAST(size AS BIGINT) AS size,
  CAST(byte_sum AS BIGINT) AS byte_sum
FROM (SELECT * FROM dirs UNION ALL SELECT * FROM files)
""")
def source_targz_entries(spark, sf_dir):
    """Gzipped-tarball ingest (`list_tar_entries` + `targz_stats`,
    operators/archive.py; POSIX ustar + RFC 1952) — the dataset-
    shipping format, decoded by genuine COMPOSITION: the WARC
    module's CRC-verified gzip member walk feeds the ustar walk,
    whose 512-byte headers are CHECKSUM-verified (the spec
    self-check naive parsers skip), octal fields parsed, prefix
    long-names joined, directory + regular entries released in
    stream order, links/PAX honestly refused. Per-file payload sums
    replay closed-form through BOTH layers. Arrow mapInPandas
    container shape, zero shuffle."""
    from ..operators.archive import encode_tar_gz, targz_stats
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_tar_gz(
                int(i), 2 + int(i) % 3, seed=int(i) % 997))

    make_tgz = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_tgz(F.col("doc_id")).alias("content"))
    return targz_stats(docs)


@query("source_tfrecords", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path,
    doc_id % 997 AS s, 2 + doc_id % 4 AS nrec
  FROM documents),
r AS (SELECT path, s, CAST(unnest(range(nrec)) AS INT) AS rec
  FROM d),
recs AS (SELECT path, rec, s + 11 * rec AS rs,
    24 + (s + 5 * rec) % 56 AS plen
  FROM r),
bytes AS (SELECT path, rec, rs, plen, unnest(range(plen)) AS i
  FROM recs)
SELECT path, rec AS rec_idx,
  CAST(MAX(plen) AS BIGINT) AS length,
  CAST(SUM((rs + 7 * i) % 251) AS BIGINT) AS byte_sum
FROM bytes GROUP BY path, rec
""")
def source_tfrecords(spark, sf_dir):
    """TFRecord stream ingest (`list_tfrecords` + `tfrecord_stats`,
    operators/archive.py; the TensorFlow data framing) — REAL walks
    with BOTH masked CRC-32C checksums verified per record using the
    genuine Castagnoli polynomial (table-driven `crc32c`, pinned to
    the RFC 3720 test vector — zlib's CRC-32 is a DIFFERENT
    polynomial and the classic silent-corruption confusion), 8-byte
    length framing, one row per record. Per-record byte sums replay
    closed-form. Arrow mapInPandas container shape, zero shuffle —
    the other major training-shard format beside the parquet
    sinks."""
    from ..operators.archive import encode_tfrecords, tfrecord_stats
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_tfrecords(
                int(i), 2 + int(i) % 4, seed=int(i) % 997))

    make_tfr = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_tfr(F.col("doc_id")).alias("content"))
    return tfrecord_stats(docs)


@query("source_msgpack_fields", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path,
    doc_id % 997 AS s FROM documents),
p AS (SELECT path, s, 2 + s % 3 AS al, 32 + s % 16 AS sl,
    8 + s % 8 AS bl FROM d),
arr AS (SELECT path, SUM((7 * j + s) % 128) AS asum
  FROM (SELECT path, s, unnest(range(al)) AS j FROM p) GROUP BY 1),
st AS (SELECT path, SUM(97 + (s + 5 * i) % 26) AS ssum
  FROM (SELECT path, s, unnest(range(sl)) AS i FROM p) GROUP BY 1),
bn AS (SELECT path, SUM((s + 7 * i) % 251) AS bsum
  FROM (SELECT path, s, unnest(range(bl)) AS i FROM p) GROUP BY 1)
SELECT p.path,
  CAST(19 + p.al AS INT) AS n_items,
  CAST(4 + p.al AS INT) AS n_ints,
  CAST((p.s % 128) + (256 + (3 * p.s) % 60000) + (-1 - (p.s % 32))
       + (4294967296 + p.s) + arr.asum AS BIGINT) AS int_sum,
  CAST(10 AS INT) AS n_strs,
  CAST(909 + st.ssum AS BIGINT) AS str_bytes_sum,
  CAST(1 AS INT) AS n_bins,
  CAST(bn.bsum AS BIGINT) AS bin_bytes_sum,
  CAST(1 AS INT) AS n_floats,
  CAST(p.s % 2 AS INT) AS n_bools,
  CAST(1 - p.s % 2 AS INT) AS n_nils,
  CAST(0 AS INT) AS n_exts,
  CAST(1 AS INT) AS n_arrays,
  CAST(1 AS INT) AS n_maps,
  CAST(3 AS INT) AS depth
FROM p JOIN arr ON p.path = arr.path
JOIN st ON p.path = st.path JOIN bn ON p.path = bn.path
""")
def source_msgpack_fields(spark, sf_dir):
    """MessagePack structural walk (`parse_msgpack` +
    `msgpack_stats`, operators/archive.py; the msgpack spec, every
    format family) — the schema-free census for the other compact
    binary record format pipelines ship beside protobuf: fix/8/16/32
    str and bin framing, multi-byte big-endian uint16/uint64 above
    2³², SIGNED int8 two's-complement, nested containers with a
    depth fence, nil/bool, float64 counted-never-summed (the float
    policy), reserved-0xc1 and trailing-byte refusals. Integer,
    string-byte, and bin-byte sums replay closed-form. Arrow
    mapInPandas, zero shuffle."""
    from ..operators.archive import encode_msgpack_doc, msgpack_stats
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_msgpack_doc(int(i)))

    mk = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        mk(F.col("doc_id")).alias("content"))
    return msgpack_stats(docs)


@query("source_proto_fields", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path,
    doc_id % 997 AS s, 3 + doc_id % 6 AS nf
  FROM documents),
f AS (SELECT path, s, nf, 1 + CAST(unnest(range(nf)) AS INT) AS fn
  FROM d),
vint AS (SELECT path, SUM(128 + (200 * fn + s) % 10000) AS vs,
    COUNT(*) AS nv
  FROM f WHERE fn % 3 = 1 GROUP BY path),
lens AS (SELECT path, s, fn, 4 + (s + 3 * fn) % 12 AS ln
  FROM f WHERE fn % 3 = 2),
lbytes AS (SELECT path, s, fn, ln, unnest(range(ln)) AS i FROM lens),
lsum AS (SELECT path, SUM((s + 11 * fn + 7 * i) % 251) AS ls,
    COUNT(DISTINCT fn) AS nl
  FROM lbytes GROUP BY path),
fx AS (SELECT path, COUNT(*) AS nfx FROM f WHERE fn % 3 = 0
  GROUP BY path)
SELECT d.path, CAST(d.nf AS INT) AS n_fields,
  CAST(d.nf AS INT) AS max_field_no,
  CAST(COALESCE(vint.nv, 0) AS INT) AS n_varint,
  CAST(COALESCE(lsum.nl, 0) AS INT) AS n_len,
  CAST(COALESCE(fx.nfx, 0) AS INT) AS n_fixed,
  CAST(COALESCE(vint.vs, 0) AS BIGINT) AS varint_sum,
  CAST(COALESCE(lsum.ls, 0) AS BIGINT) AS len_bytes_sum
FROM d LEFT JOIN vint ON d.path = vint.path
LEFT JOIN lsum ON d.path = lsum.path
LEFT JOIN fx ON d.path = fx.path
""")
def source_proto_fields(spark, sf_dir):
    """Protobuf wire-format structural walk (`parse_proto_fields` +
    `proto_stats`, operators/archive.py; the protobuf encoding spec)
    — schema-free decode of what a TFRecord payload actually holds:
    tag varints split into (field, wire type), REAL multi-byte
    varint continuation (fixture values always >= 128 so the path is
    never skipped, bounded at the 10-byte 64-bit max),
    length-delimited framing, fixed32/64, deprecated-group refusal.
    Varint and payload-byte sums replay closed-form. Arrow
    mapInPandas, zero shuffle."""
    from ..operators.archive import encode_proto_message, proto_stats
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_proto_message(
                int(i), 3 + int(i) % 6, seed=int(i) % 997))

    make_pb = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_pb(F.col("doc_id")).alias("content"))
    return proto_stats(docs)


@query("source_avro_blocks", oracle="""
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id AS did,
    doc_id % 997 AS s, 2 + doc_id % 3 AS nb
  FROM documents),
b AS (SELECT path, did, s, CAST(unnest(range(nb)) AS INT) AS blk
  FROM d),
blks AS (SELECT path, did, blk, s + 11 * blk AS bs,
    20 + (s + 5 * blk) % 40 AS plen
  FROM b),
bytes AS (SELECT path, did, blk, bs, plen, unnest(range(plen)) AS i
  FROM blks)
SELECT path, blk AS block_idx,
  CASE WHEN did % 2 = 0 THEN 'null' ELSE 'deflate' END AS codec,
  CAST(1 + blk % 3 AS BIGINT) AS n_records,
  CAST(MAX(plen) AS BIGINT) AS payload_len,
  CAST(SUM((bs + 7 * i) % 251) AS BIGINT) AS byte_sum
FROM bytes GROUP BY path, did, blk
""")
def source_avro_blocks(spark, sf_dir):
    """Avro Object Container File ingest (`list_avro_blocks` +
    `avro_stats`, operators/archive.py; Avro 1.x spec) — REAL
    container walks: the file-metadata map in genuine Avro encoding
    (ZIGZAG varints — the other varint; confusing them with
    protobuf's plain varints silently halves every count), codec
    dispatch (even docs null, odd deflate — both paths hash-checked),
    and EVERY data block's 16-byte sync marker verified against the
    header's (the spec's corruption fence). Record decode is
    deliberately out of scope — this is the container layer.
    Per-block payload sums replay closed-form. Arrow mapInPandas,
    zero shuffle."""
    from ..operators.archive import avro_stats, encode_avro_ocf
    from ..operators.dedup import widen_parallelism

    def _make(doc_id):
        return doc_id.map(
            lambda i: encode_avro_ocf(
                int(i), 2 + int(i) % 3, seed=int(i) % 997))

    make_avro = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_avro(F.col("doc_id")).alias("content"))
    return avro_stats(docs)
