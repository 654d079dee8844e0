"""Variant-column explosion: ragged / per-cell-heterogeneous nesting.

The reference explodes *any* Python object because pandas cells are dynamic
(tutorial columns ``c``/``f``/``g`` mix dicts, lists, scalars, Series per
cell — ``frame.py:35-47`` dispatches per cell at runtime). A Spark column
has one static type, so the engine's canonical encoding for such columns is
a **JSON string** (SURVEY §7 risk 1), and this module explodes it level by
level with *per-row* dynamic dispatch — entirely in native expressions:

- object cell  → ``from_json(v, 'map<string,string>')`` (nested values stay
  raw JSON text) → one row per key, level = key
- array cell   → ``from_json(v, 'array<string>')`` → one row per element,
  level = stringified position
- scalar cell  → single row, level = NULL, value unquoted — the reference's
  scalar rule (``frame.py:38``: ``pd.Series({np.nan: x})``), including the
  "NULL levels where scalars stop early" behavior of tutorial cell 33.

Level columns are strings (a cell may be a dict in one row and a list in
the next). Limitation (documented): a *string leaf* whose text is itself
valid JSON ('[1]') is indistinguishable from nesting — inherent to the
JSON-variant encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .errors import PuffbirdSparkError
from .naming import level_column


def variant_entries(v: Column) -> Column:
    """Entries of one explosion level: array<struct<k: string, v: string>>
    with per-row object/array/scalar dispatch."""
    obj = F.from_json(v, "map<string,string>")
    arr = F.from_json(v, "array<string>")
    scalar = F.coalesce(F.get_json_object(v, "$"), v)
    return (
        F.when(
            obj.isNotNull(),
            F.transform(
                F.map_entries(obj),
                lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
            ),
        )
        .when(
            arr.isNotNull(),
            F.transform(
                arr,
                lambda x, i: F.struct(i.cast("string").alias("k"), x.alias("v")),
            ),
        )
        .otherwise(
            F.array(F.struct(F.lit(None).cast("string").alias("k"),
                             scalar.alias("v")))
        )
    )


#: memoized depth-inference results keyed by (analyzed-plan semantic hash,
#: input-file list hash, column, sample size) — repeated
#: ``to_long(variant_cols=...)`` calls over the same plan re-use the
#: sampled depth instead of re-collecting. Bounded: at
#: ``_DEPTH_CACHE_MAX`` entries the cache is cleared (cap-and-clear — the
#: workload is "same frame re-exploded", not a working set worth LRU).
_DEPTH_CACHE: dict[tuple, int] = {}
_DEPTH_CACHE_MAX = 256


def _plan_key(df: DataFrame, col: str, sample: int) -> tuple | None:
    """Stable cache key for a DataFrame's analyzed plan; None when the
    semantic hash is unavailable (Connect mode, API drift) — callers then
    simply skip memoization.

    The key includes the resolved input-file list: appending new files
    under the same path changes the key, so a re-read after ingest
    re-samples instead of returning a stale (shallower) depth (ADVICE
    r2). Caveat: an in-place rewrite of the SAME file names is not
    detected — the stale depth is still lossless (deeper rows keep raw
    JSON at the cutoff leaf), just shallower than requested."""
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
        files = df.inputFiles()
        return (h, hash(tuple(sorted(files))), col, sample)
    except Exception:
        return None


def infer_variant_depth(df: DataFrame, col: str, sample: int = 1000) -> int:
    """Planning-time utility: measure the maximum JSON nesting depth over
    a bounded sample so variant explosions need no hand-picked
    ``max_depth``. One small job (limit + collect of ONE string column) —
    this sizes the PLAN (how many generator levels to emit), not the data
    pass, so its cost is unchanged at 100 TB. Unparseable/scalar cells
    count as depth 0; the result is floored at 1 so a plan always exists.
    A sample can undercount a rare deeper row — such rows keep raw JSON
    text at the cutoff leaf (documented explode_variant semantics), so
    the result is still lossless. Memoized per (plan, col, sample): a
    second call on the same plan issues no job."""
    import json

    key = _plan_key(df, col, sample)
    if key is not None and key in _DEPTH_CACHE:
        return _DEPTH_CACHE[key]

    rows = (
        df.select(F.col(col).alias("v"))
        .filter(F.col("v").isNotNull())
        .limit(sample)
        .collect()
    )

    def depth(x) -> int:
        if isinstance(x, dict):
            return 1 + max((depth(v) for v in x.values()), default=0)
        if isinstance(x, (list, tuple)):
            return 1 + max((depth(v) for v in x), default=0)
        return 0

    best = 0
    for r in rows:
        try:
            best = max(best, depth(json.loads(r["v"])))
        except (ValueError, TypeError):
            continue
    result = max(best, 1)
    if key is not None:
        if len(_DEPTH_CACHE) >= _DEPTH_CACHE_MAX:
            _DEPTH_CACHE.clear()
        _DEPTH_CACHE[key] = result
    return result


def explode_variant(
    df: DataFrame,
    key_cols: list[str],
    col: str,
    max_depth: int | None = 3,
    dropna: bool = True,
) -> tuple[DataFrame, list[str]]:
    """Explode a JSON-variant string column to ``max_depth`` levels.

    Returns ``(long_df, level_cols)`` like ``explode.explode_column``; the
    value column holds decoded scalar text at the leaves (raw JSON where
    ``max_depth`` cut deeper nesting). Rows whose cell bottoms out early
    carry NULL in the remaining level columns (reference semantics).
    ``max_depth=None`` infers the depth from a bounded sample
    (:func:`infer_variant_depth`).
    """
    if col not in df.columns:
        raise PuffbirdSparkError(f"no such column: {col!r}")
    from pyspark.sql import types as T

    dtype = df.schema[col].dataType
    if not isinstance(dtype, T.StringType):
        raise PuffbirdSparkError(
            f"variant column {col!r} must be a JSON string column, got "
            f"{dtype.simpleString()} — nested Spark types explode natively "
            f"via to_long without variant_cols"
        )
    if max_depth is None:
        max_depth = infer_variant_depth(df, col)
    out = df.select(*key_cols, col)
    if dropna:
        out = out.filter(
            F.col(col).isNotNull() & (F.col(col) != F.lit("null"))
        )
    levels: list[str] = []
    for depth in range(max_depth):
        lvl = level_column(col, depth)
        if lvl in out.columns:
            raise PuffbirdSparkError(
                f"generated level column {lvl!r} collides with an existing column"
            )
        carried = [c for c in out.columns if c != col]
        # a cell is "exhausted" when the previous level already emitted it
        # as a scalar (NULL level) — emit it unchanged instead of re-wrapping
        if depth == 0:
            entries = variant_entries(F.col(col))
        else:
            prev = levels[-1]
            entries = F.when(
                F.col(prev).isNull(),
                F.array(F.struct(
                    F.lit(None).cast("string").alias("k"),
                    F.col(col).alias("v"),
                )),
            ).otherwise(variant_entries(F.col(col)))
        gen = F.explode(entries) if dropna else F.explode_outer(entries)
        out = out.select(*carried, gen.alias("__e")).select(
            *carried,
            F.col("__e.k").alias(lvl),
            F.col("__e.v").alias(col),
        )
        if dropna:
            out = out.filter(
                F.col(col).isNotNull() & (F.col(col) != F.lit("null"))
            )
        levels.append(lvl)
    return out, levels
