"""Data-layout operators: z-order (Morton) clustering for multi-column
data skipping.

A range-partitioned, sorted write clusters on ONE leading column; filters
on any other column read everything. Interleaving the bits of several
columns into one z-value and range-partitioning on THAT gives every
interleaved column locality, so parquet min/max stats prune row groups for
filters on any of them — the standard lakehouse OPTIMIZE ZORDER BY.

Everything is closed-form bit arithmetic in Column expressions (unrolled
shifts/masks, whole-stage codegen); no UDFs, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of each column into one long.

    Columns must be non-negative integers (clip/normalize first — e.g.
    ``pmod(xxhash64(c), 2**bits)`` for arbitrary types). With k columns,
    bit i of column j lands at position ``i*k + j``; total bits ``k*bits``
    must fit in a signed long (``k*bits <= 62``).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("z_value needs at least 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
          for c in cols]
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            out = out + (bit * F.lit(1 << (i * k + j)).cast("long"))
    return out


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` for multi-column skipping: compute the z-value,
    range-partition + sort on it, drop the helper column. Writing the
    result to parquet yields files whose min/max stats are selective on
    EVERY interleaved column."""
    with_z = df.withColumn(z_col, z_value(cols, bits))
    if num_partitions:
        parted = with_z.repartitionByRange(num_partitions, F.col(z_col))
    else:
        parted = with_z.repartitionByRange(F.col(z_col))
    return parted.sortWithinPartitions(z_col).drop(z_col)


def bucketed_table(
    spark,
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 16,
    path: str | None = None,
) -> str:
    """Write ``df`` as a bucketed, bucket-sorted table and return its name
    (idempotent: an existing table is reused).

    Bucketing is the co-located-join primitive: both sides of a join
    pre-hashed into the same number of buckets on the join key read
    bucket-aligned splits, so the sort-merge join runs with ZERO Exchange
    — at 100 TB this removes the largest shuffle of a fact-fact join and
    is the difference between an hours-long stage and none. The write
    itself pays one shuffle ONCE; every subsequent join on the key is
    shuffle-free (plan-asserted in tests/test_plans.py).
    """
    if spark.catalog.tableExists(name):
        return name
    # the in-memory catalog dies with the session but the warehouse dir
    # survives: a stale managed-table location fails saveAsTable
    # (LOCATION_ALREADY_EXISTS) — remove it and rebuild deterministically
    if path is None:
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:"):]
        if wh:
            shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    return name


def compact_small_files(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction — the OPTIMIZE half of table maintenance: a
    streaming/incremental sink accumulates thousands of tiny parquet
    files (one per micro-batch/epoch), and every downstream scan then
    pays a task + footer read per file. Rewrite the directory into
    ~``target_file_bytes`` files.

    File count derives from the TOTAL INPUT BYTES (driver-side listing
    metadata, no data read), not a row count — so the decision costs
    nothing at 100 TB. ``sort_cols`` additionally range-partitions and
    sorts within files (restoring clustering that accumulation
    destroyed; pair with :func:`z_value` for multi-column skipping).
    Uses ``repartition(n)`` (round-robin) when unsorted — balanced
    output files regardless of input skew.

    Returns {"n_files_in", "n_files_out", "bytes_in"} (the write runs
    eagerly). Row content is preserved exactly — gate-checked by hash.
    """
    import math

    jvm = spark.sparkContext._jvm
    hadoop_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = hadoop_path.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration())
    files = [
        (f.getPath().getName(), f.getLen())
        for f in fs.listStatus(hadoop_path)
        if f.getPath().getName().endswith(".parquet")
    ]
    bytes_in = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(bytes_in / float(target_file_bytes)))
    df = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    out_hadoop = jvm.org.apache.hadoop.fs.Path(out_path)
    n_files_out = sum(
        1 for f in fs.listStatus(out_hadoop)
        if f.getPath().getName().endswith(".parquet"))
    return {"n_files_in": len(files), "n_files_out": n_files_out,
            "bytes_in": bytes_in}


def file_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max statistics for ``cols`` — the data-skipping index
    every lakehouse keeps next to its manifest (Delta's stats JSON,
    Iceberg's manifest metrics), computed as ONE scan grouped by
    ``input_file_name()``. The result is file-count-sized (metadata
    scale, not data scale); persist it next to the table and refresh
    per-append — new shards only."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def pruned_read(
    spark,
    path: str,
    col: str,
    lo,
    hi,
    stats: DataFrame | None = None,
) -> tuple[DataFrame, int, int]:
    """Read ``path`` for the predicate ``col BETWEEN lo AND hi`` touching
    only the files whose [min, max] interval overlaps — file-level data
    skipping ABOVE parquet's row-group stats (planner-level pruning:
    skipped files never even get a task; on a clustered layout — see
    :func:`zorder_repartition` — that is most of them).

    Returns ``(df, n_files_read, n_files_total)``; ``df`` already has
    the exact predicate applied, so the result equals a full-scan
    filter regardless of pruning quality. The file-list collect is
    bounded by the FILE count (manifest scale), never by rows.
    """
    if stats is None:
        stats = file_stats(spark, path, [col])
    rows = stats.select("file", f"min_{col}", f"max_{col}").collect()
    keep = [
        r["file"] for r in rows
        if r[f"min_{col}"] is not None
        and not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
    ]
    total = len(rows)
    if not keep:  # degenerate: nothing overlaps — empty frame, 0 files
        df = spark.read.parquet(path).filter(F.lit(False))
        return df, 0, total
    df = spark.read.parquet(*keep).filter(F.col(col).between(lo, hi))
    return df, len(keep), total


# --------------------------------------------------------------------- #
# Manifest-based snapshots: O(1) time travel for an append-mostly table
# (the core mechanism of Iceberg/Delta, reduced to its essentials: an
# immutable shard directory per write + a JSON manifest per version
# listing exactly which shards belong to that version).
# --------------------------------------------------------------------- #


def _hadoop_fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def snapshot_versions(spark, table_path: str) -> list[int]:
    """All committed versions of a snapshot table, ascending (empty if the
    table does not exist yet). Metadata-only: one directory listing."""
    fs, jvm = _hadoop_fs(spark, table_path)
    man_dir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/manifests")
    if not fs.exists(man_dir):
        return []
    out = []
    for f in fs.listStatus(man_dir):
        name = f.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(spark, table_path: str, version: int) -> dict:
    import json

    fs, jvm = _hadoop_fs(spark, table_path)
    p = jvm.org.apache.hadoop.fs.Path(
        f"{table_path}/manifests/v{version:05d}.json")
    if not fs.exists(p):
        # a vacuumed or never-written version must read as the same
        # clean error everywhere (r11 probe: snapshot_diff against a
        # vacuumed base surfaced a raw Java FileNotFoundException
        # while read_snapshot raised the ValueError below)
        raise ValueError(
            f"version {version} not in "
            f"{snapshot_versions(spark, table_path)}")
    stream = fs.open(p)
    try:
        # commons-io ships on every Spark classpath; py4j byte[] buffers
        # are pass-by-value, so a read(buf) loop would see no data
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def write_snapshot(
    spark, df: DataFrame, table_path: str, mode: str = "append",
    extra: dict | None = None,
) -> int:
    """Commit ``df`` as the next version of a snapshot table and return
    the new version number.

    Mechanics: the rows land in a fresh immutable shard directory
    (``shards/shard-vNNNNN``, written with mode=error so a shard is
    never silently overwritten); the commit is ONE manifest JSON listing
    the version's full shard set — the parent's shards plus the new one
    for ``mode="append"``, just the new one for ``mode="overwrite"``.
    The manifest is written to a temp name and renamed, so readers never
    observe a half-written commit (rename is atomic on HDFS and
    local FS; single-writer assumed — this is a batch-pipeline
    versioning primitive, not a transaction log with conflict
    detection).

    Why it matters at 100 TB: time travel and reproducibility become
    METADATA operations. "Train run X used corpus snapshot v12" pins an
    immutable shard list forever; appending a day's crawl is one shard
    write + one manifest, never a table rewrite; rolling back is
    reading an older manifest. Old shards are garbage-collectable by
    subtracting live manifests' shard sets from the directory listing.
    """
    import json

    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if extra and not set(extra).isdisjoint({"version", "mode", "shards"}):
        raise ValueError("extra metadata must not shadow manifest fields")
    fs, jvm = _hadoop_fs(spark, table_path)
    versions = snapshot_versions(spark, table_path)
    cur = versions[-1] if versions else 0
    new_v = cur + 1
    shard = f"shards/shard-v{new_v:05d}"
    shard_path = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{shard}")
    # crash recovery: a shard directory for the NEXT version with no
    # manifest referencing it is an orphan of a write that died between
    # shard write and manifest rename — delete it so the retry (e.g. a
    # replayed streaming epoch) can commit instead of tripping the
    # mode=error guard
    if fs.exists(shard_path):
        fs.delete(shard_path, True)
    df.write.mode("error").parquet(f"{table_path}/{shard}")
    parent_shards = (
        _read_manifest(spark, table_path, cur)["shards"]
        if (mode == "append" and cur) else []
    )
    manifest = {"version": new_v, "mode": mode,
                "shards": [*parent_shards, shard], **(extra or {})}
    man_dir = f"{table_path}/manifests"
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(man_dir))
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{man_dir}/.v{new_v:05d}.json.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{man_dir}/v{new_v:05d}.json")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        stream.close()
    if not fs.rename(tmp, final):
        raise IOError(f"manifest commit failed for version {new_v}")
    return new_v


def snapshot_diff(
    spark,
    table_path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
    check_existing_keys: bool = False,
) -> DataFrame:
    """Change-data feed between two committed snapshot versions: one row
    per changed key with ``change`` in ``insert | delete | update``
    (keys whose non-key payload is identical in both versions are
    absent). This is what downstream incremental consumers (index
    refresh, dedup-state maintenance, rollup deltas) read instead of
    re-scanning the table.

    Two physical paths, picked from the MANIFESTS (metadata, no data
    read):

    - **append fast path** — when ``v_from``'s shard set is a subset of
      ``v_to``'s (the normal append-only history), the diff is exactly
      the rows of the new shards: read ONLY those, emit ``insert``, no
      join at all. Diff cost scales with the delta, never the table.
      This ASSUMES appended keys are new (the append-only contract —
      an append never re-adds an existing key; re-adding one creates a
      duplicate-key row, not an update, in this shard format). If the
      writer can violate that, pass ``check_existing_keys=True``: new-
      shard keys are then left-joined against the base snapshot's key
      columns (column-pruned scan — keys only, never payloads) and
      re-added keys are reported as ``update``, matching the general
      path's classification. One keyed shuffle, but the probe side is
      still only the delta.
    - **general path** — otherwise (overwrite/compaction rewrote
      shards), a key-keyed full-outer join of the two snapshots with a
      null-safe payload-struct compare. One co-keyed shuffle; AQE
      handles skew.
    """
    if not key_cols:
        raise ValueError("snapshot_diff: key_cols must be non-empty — "
                         "a keyless table diff has no row identity")
    man_from = _read_manifest(spark, table_path, v_from)["shards"]
    man_to = _read_manifest(spark, table_path, v_to)["shards"]
    if set(man_from) <= set(man_to):
        new_shards = [s for s in man_to if s not in set(man_from)]
        base = read_snapshot(spark, table_path, v_from)
        if not new_shards:
            return base.select(*key_cols).filter(F.lit(False)).withColumn(
                "change", F.lit("insert"))
        new_rows = spark.read.parquet(
            *[f"{table_path}/{s}" for s in new_shards]
        ).select(*key_cols)
        if not check_existing_keys:
            return new_rows.withColumn("change", F.lit("insert"))
        base_keys = (
            base.select(*key_cols).dropDuplicates(key_cols)
            .withColumn("__in_base", F.lit(True))
        )
        return new_rows.join(base_keys, key_cols, "left").select(
            *key_cols,
            F.when(F.col("__in_base").isNotNull(), F.lit("update"))
            .otherwise(F.lit("insert")).alias("change"),
        )
    a = read_snapshot(spark, table_path, v_from)
    b = read_snapshot(spark, table_path, v_to)
    val_cols = [c for c in a.columns if c not in key_cols]
    av = a.select(*key_cols, F.struct(*val_cols).alias("__va"))
    bv = b.select(*key_cols, F.struct(*val_cols).alias("__vb"))
    change = (
        F.when(F.col("__va").isNull(), "insert")
        .when(F.col("__vb").isNull(), "delete")
        .when(~F.col("__va").eqNullSafe(F.col("__vb")), "update")
    )
    return (
        av.join(bv, key_cols, "full_outer")
        .select(*key_cols, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def read_snapshot(
    spark, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot table AS OF ``version`` (default: latest). The
    version's manifest pins the exact shard list, so the same version
    returns the same rows forever, regardless of later appends,
    overwrites, or compactions that created new shards."""
    versions = snapshot_versions(spark, table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshot manifests at {table_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in {versions}")
    man = _read_manifest(spark, table_path, v)
    return spark.read.parquet(
        *[f"{table_path}/{s}" for s in man["shards"]])


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 8,
    seed: str = "shard",
    rank_col: str = "shuffle_rank",
) -> None:
    """The writer at the END of the curation pipeline: materialize the
    corpus as ``n_shards`` deterministic, interleaved, internally-ordered
    shards — what a multi-host data loader actually consumes (each host
    reads its shard directory; global shuffle quality comes from the
    rank, reproducibility from everything being content-keyed).

    Mechanics: the two-exchange :func:`~.splits.shuffle_order` global
    rank (content-keyed md5 draw — re-running on the same corpus
    reproduces the same order bit-for-bit), round-robin shard
    assignment ``(rank-1) % n_shards`` (balanced to +-1 row by
    construction, no total-count pass), then ONE hash exchange on the
    shard id with an in-partition sort so every shard directory's rows
    come out rank-ascending. The rank column is written with the data —
    downstream loaders can verify or resume from it.
    """
    from .splits import shuffle_order

    ranked = shuffle_order(df, key=key, seed=seed, rank_col=rank_col)
    sharded = ranked.withColumn(
        "shard", ((F.col(rank_col) - 1) % n_shards).cast("int"))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(rank_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def vacuum_snapshots(
    spark,
    table_path: str,
    keep_last: int = 1,
) -> dict:
    """Snapshot retention — the VACUUM half of table maintenance
    (:func:`compact_small_files` is the OPTIMIZE half): delete every
    manifest older than the newest ``keep_last`` versions, then delete
    every shard directory referenced ONLY by the deleted manifests.
    Kept versions keep time-traveling exactly as before; the reclaimed
    space is the whole point — an append-mostly table's dead overwritten
    shards otherwise accumulate forever.

    Metadata-only decision path (the 100 TB shape): manifests are read
    (bytes each), the live-shard set is a union over kept manifests,
    and deletion is one recursive remove per dead shard dir — no data
    is ever read. Crash-safe ordering: manifests delete FIRST, so a
    failure mid-vacuum leaves orphan shard dirs (harmless, retried by
    the next vacuum) rather than manifests pointing at deleted data.

    Returns ``{"kept_versions", "deleted_manifests", "deleted_shards",
    "live_shards"}``.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = snapshot_versions(spark, table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshot manifests at {table_path}")
    kept = versions[-keep_last:]
    dead = [v for v in versions if v not in kept]
    live_shards: set[str] = set()
    for v in kept:
        live_shards.update(_read_manifest(spark, table_path, v)["shards"])
    fs, jvm = _hadoop_fs(spark, table_path)

    def _p(rel: str):
        return jvm.org.apache.hadoop.fs.Path(f"{table_path}/{rel}")

    for v in dead:  # manifests first: crash leaves orphans, never danglers
        fs.delete(_p(f"manifests/v{v:05d}.json"), False)
    deleted_shards = 0
    shards_dir = _p("shards")
    if fs.exists(shards_dir):
        for st in fs.listStatus(shards_dir):
            rel = f"shards/{st.getPath().getName()}"
            if rel not in live_shards:
                fs.delete(st.getPath(), True)
                deleted_shards += 1
    return {
        "kept_versions": kept,
        "deleted_manifests": len(dead),
        "deleted_shards": deleted_shards,
        "live_shards": len(live_shards),
    }


def snapshot_schema_diff(
    spark, table_path: str, v_from: int, v_to: int
) -> DataFrame:
    """Schema drift between two snapshot versions — the migration
    audit run before pointing consumers at a new corpus version: one
    row per changed column, ``change`` in ``added | removed |
    type_changed`` with both type strings. Unchanged columns are
    absent; identical versions diff to zero rows.

    Metadata-only: each version's schema comes from its shards' parquet
    FOOTERS (``mergeSchema`` reconciliation — the same mechanism the
    `scan_schema_evolution` gate proves), and the comparison itself is
    a driver-side walk over two column lists, returned as a
    column-count-sized DataFrame. No data is read at any size.
    """
    def schema_of(version: int) -> dict[str, str]:
        man = _read_manifest(spark, table_path, version)
        df = spark.read.option("mergeSchema", "true").parquet(
            *[f"{table_path}/{s}" for s in man["shards"]])
        return {f.name: f.dataType.simpleString() for f in df.schema.fields}

    a, b = schema_of(v_from), schema_of(v_to)
    rows = []
    for name in sorted(set(a) | set(b)):
        ta, tb = a.get(name), b.get(name)
        if ta is None:
            rows.append((name, "added", None, tb))
        elif tb is None:
            rows.append((name, "removed", ta, None))
        elif ta != tb:
            rows.append((name, "type_changed", ta, tb))
    return spark.createDataFrame(
        rows, "column string, change string, type_from string, type_to string")


def file_bloom_index(
    spark,
    path: str,
    col: str,
    m_bits: int = 1 << 14,
    k: int = 5,
    seed: str = "fbloom",
) -> DataFrame:
    """Per-file Bloom index over a HIGH-CARDINALITY column — the
    skipping mechanism for the case min/max statistics can't help:
    point lookups of a key that is hash-scattered across files (every
    file spans the full value range, so :func:`pruned_read` keeps
    everything; a Bloom filter per file prunes to ~the one file that
    holds the key, plus false positives). This is Parquet's column
    bloom filter / the Delta bloom index, built as table-side metadata.

    One scan grouped by ``input_file_name()``: the k bit positions per
    value are ``pmod(xxhash64(seed_i, col), m)`` (computed IN Spark, so
    probes use the identical hash), distinct positions collect per
    file, and the packed ``m/64`` long words build as one Column fold.
    Output is file-count-sized: ``(file, words array<long>)`` — persist
    it next to the table, refresh per-append for new files only."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos_cols = F.array(*[
        F.pmod(F.xxhash64(F.lit(f"{seed}:{i}"), F.col(col)), F.lit(m_bits))
        for i in range(k)
    ])
    n_words = m_bits // 64
    positions = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"),
                F.explode(pos_cols).alias("p"))
        .groupBy("file")
        .agg(F.collect_set("p").alias("ps"))
    )
    words = F.expr(
        f"transform(sequence(0, {n_words - 1}), w -> "
        "aggregate(filter(ps, p -> CAST(p / 64 AS INT) = w), "
        "CAST(0 AS BIGINT), (acc, p) -> acc | shiftleft(CAST(1 AS BIGINT), "
        "CAST(p % 64 AS INT))))")
    return positions.select("file", words.alias("words"))


def bloom_pruned_lookup(
    spark,
    path: str,
    col: str,
    value,
    index: DataFrame | None = None,
    m_bits: int = 1 << 14,
    k: int = 5,
    seed: str = "fbloom",
) -> tuple[DataFrame, int, int]:
    """Point lookup ``col == value`` reading ONLY the files whose Bloom
    words contain all k probe bits (no false negatives — every file
    that holds the value is read, so the result EQUALS the full-scan
    filter; false positives only cost extra reads). Returns
    ``(df, n_files_read, n_files_total)``.

    The probe positions compute through the same in-Spark xxhash64 as
    the index build (one literal-row job, with the probe literal CAST
    to the column's exact type — xxhash64 is type-dependent, and an
    int-vs-bigint probe is a silent false NEGATIVE, caught by the
    first smoke test); the membership test walks the collected index —
    bounded by FILE count, manifest scale."""
    if index is None:
        index = file_bloom_index(spark, path, col, m_bits, k, seed)
    col_type = spark.read.parquet(path).schema[col].dataType
    probe_df = spark.range(1).select(*[
        F.pmod(F.xxhash64(F.lit(f"{seed}:{i}"),
                          F.lit(value).cast(col_type)),
               F.lit(m_bits)).alias(f"p{i}")
        for i in range(k)
    ])
    probe = probe_df.collect()[0]
    positions = [probe[f"p{i}"] for i in range(k)]
    rows = index.collect()
    total = len(rows)
    keep = []
    for r in rows:
        w = r["words"]
        if all(w[p // 64] & (1 << (p % 64)) for p in positions):
            keep.append(r["file"])
    if not keep:
        return spark.read.parquet(path).filter(F.lit(False)), 0, total
    return (
        spark.read.parquet(*keep).filter(F.col(col) == F.lit(value)),
        len(keep), total,
    )


def committed_epochs(spark, table_path: str) -> set[int]:
    """The set of streaming epoch ids already committed to a snapshot
    table (manifests carrying an ``epoch`` field — see
    ``streaming.snapshot_epoch_sink``). Metadata-only: one directory
    listing plus one small JSON read per version; at 100 TB this is the
    exactly-once ledger, never a data scan."""
    out: set[int] = set()
    for v in snapshot_versions(spark, table_path):
        man = _read_manifest(spark, table_path, v)
        if "epoch" in man:
            out.add(int(man["epoch"]))
    return out


def hilbert_value(xcol, ycol, bits: int = 8) -> Column:
    """Hilbert-curve index of two non-negative integer columns (Hilbert
    1891; the xy→d walk of Warren's Hacker's Delight formulation) — the
    locality-clustering key that beats :func:`z_value` when range scans
    matter: consecutive Hilbert cells are always GRID-ADJACENT (unit
    Manhattan step, pinned in tests), while Morton order takes long
    diagonal jumps at power-of-two boundaries, so a range of Hilbert
    values covers a tighter spatial blob and parquet min/max skipping
    prunes more files for 2-D range predicates.

    Closed-form integer arithmetic per bit level (quadrant code +
    conditional reflect/swap rotation). The rotation REASSIGNS x and y,
    so the single-Column unroll re-embeds prior levels ~7× per level —
    exponential expression growth (8 levels OOMed the planner). This
    Column form is therefore capped at 5 levels for literal inline use;
    :func:`with_hilbert` is the production path — one Generate fence
    per level keeps the plan LINEAR in ``bits``. Inputs must fit
    ``bits`` bits (clip/normalize first, as with ``z_value``)."""
    if bits < 1 or bits > 5:
        raise ValueError(
            f"bits must be in [1, 5] for the Column form (expression "
            f"size grows ~7^bits), got {bits}; use with_hilbert")
    x = (xcol if not isinstance(xcol, str) else F.col(xcol)).cast("long")
    y = (ycol if not isinstance(ycol, str) else F.col(ycol)).cast("long")
    d = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        d = d + F.lit(s).cast("long") * F.lit(s) * (
            (3 * rx).bitwiseXOR(ry))
        # rotate the frame: reflect when rx=1∧ry=0, then swap when ry=0
        xr = F.when((ry == 0) & (rx == 1), F.lit(s - 1) - x).otherwise(x)
        yr = F.when((ry == 0) & (rx == 1), F.lit(s - 1) - y).otherwise(y)
        x, y = (
            F.when(ry == 0, yr).otherwise(xr),
            F.when(ry == 0, xr).otherwise(yr),
        )
    return d


def hilbert_repartition(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    num_partitions: int | None = None,
    h_col: str = "__h",
) -> DataFrame:
    """Cluster ``df`` along the Hilbert curve of two columns — the
    drop-in locality upgrade to :func:`zorder_repartition` for 2-D
    range workloads; same write-once/skip-forever economics."""
    with_h = with_hilbert(df, xcol, ycol, bits, h_col)
    if num_partitions:
        parted = with_h.repartitionByRange(num_partitions, F.col(h_col))
    else:
        parted = with_h.repartitionByRange(F.col(h_col))
    return parted.sortWithinPartitions(h_col).drop(h_col)


def with_hilbert(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    h_col: str = "__h",
) -> DataFrame:
    """Production Hilbert index: same walk as :func:`hilbert_value`, but
    each bit level materializes (x, y, d) as BOUND ATTRIBUTES behind a
    `plans.fence` Generate — downstream levels reference attributes
    instead of re-inlining the defining expressions, so plan size is
    LINEAR in ``bits`` (the single-Column unroll grows ~7^bits and
    OOMs the planner at 8). All passthrough columns survive; adds
    ``h_col``. Scan-local, zero shuffle, stays in codegen."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    from ..plans import fence

    keys = list(df.columns)
    cur = df.select(
        *keys,
        F.col(xcol).cast("long").alias("__hx"),
        F.col(ycol).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias(h_col))
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        x, y, d = F.col("__hx"), F.col("__hy"), F.col(h_col)
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        xr = F.when((ry == 0) & (rx == 1), F.lit(s - 1) - x).otherwise(x)
        yr = F.when((ry == 0) & (rx == 1), F.lit(s - 1) - y).otherwise(y)
        cur = fence(
            cur, keys,
            **{
                "__hx": F.when(ry == 0, yr).otherwise(xr),
                "__hy": F.when(ry == 0, xr).otherwise(yr),
                h_col: d + F.lit(s).cast("long") * F.lit(s)
                * (3 * rx).bitwiseXOR(ry),
            })
    return cur.drop("__hx", "__hy")
