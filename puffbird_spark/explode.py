"""Schema-driven explosion planner: the Spark-native core of ``to_long``.

The reference (``puffbird/frame.py:334-600``) discovers nesting *per cell at
runtime* with a type-dispatch table (``frame.py:35-47``) and peels one level
per ``_superstack_series`` call. Spark columns carry a static schema, so the
whole explosion chain is *planned from the DataType* before execution and
compiles to native Catalyst generators — no Python boundary at all:

=====================  ==============================  =====================
cell type (reference)  Spark column type               generator emitted
=====================  ==============================  =====================
list/tuple/ndarray/set ``ArrayType(T)``                ``posexplode(_outer)`` →
                                                       position level column
dict / pd.Series       ``MapType(K, V)``               ``explode(_outer)`` →
                                                       key level column
pd.DataFrame/recarray  ``StructType`` (in array)       field-name ``stack`` →
                                                       name level column
scalar                 primitive                       stop (no level column)
=====================  ==============================  =====================

Level columns are named ``{datacol}_level{n}`` (or a shared-axis name — see
``shared_axes`` in :func:`explode_column`), matching reference
``frame.py:1104-1110``. The stop condition of the reference
(``utils.py:9-20``: stop when the series holds hashable scalars) becomes
"stop when the type is primitive", and ``max_depth`` bounds the chain
identically (``frame.py:511-521``).

Everything here is pure plan construction: Catalyst sees only
``posexplode_outer`` / ``explode_outer`` / ``stack`` and keeps the chain
pipelined inside one whole-stage-codegen span (no shuffle is introduced by
explosion itself).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .errors import PuffbirdSparkError
from .naming import level_column

#: default recursion bound, reference ``frame.py:341`` (max_depth=3)
DEFAULT_MAX_DEPTH = 3

StopCond = Callable[[T.DataType], bool]


def default_stop(dtype: T.DataType) -> bool:
    """True when a column of this type should not explode further.

    Spark-static analogue of ``series_is_hashable`` (reference
    ``utils.py:9-20``): primitives (and binary) are "hashable scalars".
    """
    return not isinstance(dtype, (T.ArrayType, T.MapType, T.StructType))


def type_depth(dtype: T.DataType, _acc: int = 0) -> int:
    """Nesting depth of a Spark type (number of explosion levels needed)."""
    if isinstance(dtype, T.ArrayType):
        return type_depth(dtype.elementType, _acc + 1)
    if isinstance(dtype, T.MapType):
        return type_depth(dtype.valueType, _acc + 1)
    if isinstance(dtype, T.StructType):
        inner = max((type_depth(f.dataType) for f in dtype.fields), default=0)
        return _acc + 1 + inner
    return _acc


def _struct_common_type(struct: T.StructType) -> T.DataType:
    """Common value type when stacking struct fields into rows.

    Homogeneous fields keep their type; all-numeric promotes to double;
    anything else canonicalizes to string (the reference, being pandas,
    silently produced ``object`` columns here — a string column is the
    schema-stable Spark equivalent).
    """
    dtypes = [f.dataType for f in struct.fields]
    if not dtypes:
        return T.NullType()
    first = dtypes[0]
    if all(dt == first for dt in dtypes):
        return first
    numeric = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType)
    if all(isinstance(dt, numeric) for dt in dtypes):
        return T.DoubleType()
    return T.StringType()


def explode_column(
    df: DataFrame,
    key_cols: list[str],
    datacol: str,
    max_depth: int = DEFAULT_MAX_DEPTH,
    dropna: bool = True,
    shared_axes: dict[int, str] | None = None,
    stop: StopCond = default_stop,
) -> tuple[DataFrame, list[str]]:
    """Explode one data column to long format.

    Returns ``(long_df, level_cols)`` where ``long_df`` has columns
    ``key_cols + level_cols + [datacol]`` and each level column records the
    position (arrays), key (maps) or field name (structs) at that depth.

    ``dropna=True`` mirrors reference semantics (``frame.py:505-506``,
    ``frame.py:583``, ``frame.py:597``): null cells are dropped before
    explosion and null leaves after — i.e. inner generators; ``dropna=False``
    uses the ``_outer`` variants so rows with missing cells survive with NULL
    level/value.
    """
    if datacol in key_cols:
        raise PuffbirdSparkError(f"{datacol!r} is a key column, not a data column")
    if datacol not in df.columns:
        raise PuffbirdSparkError(f"no such column: {datacol!r}")

    out = df.select(*key_cols, datacol)
    levels: list[str] = []
    depth = 0
    while depth < max_depth:
        dtype = out.schema[datacol].dataType
        if stop(dtype):
            break
        lvl = level_column(datacol, depth, shared_axes)
        if lvl in out.columns:
            raise PuffbirdSparkError(
                f"generated level column {lvl!r} collides with an existing column"
            )
        carried = [c for c in out.columns if c != datacol]
        col = F.col(datacol)
        if isinstance(dtype, T.ArrayType):
            gen = F.posexplode(col) if dropna else F.posexplode_outer(col)
            out = out.select(*carried, gen.alias(lvl, datacol))
        elif isinstance(dtype, T.MapType):
            gen = F.explode(col) if dropna else F.explode_outer(col)
            out = out.select(*carried, gen.alias(lvl, datacol))
        elif isinstance(dtype, T.StructType):
            out = _stack_struct(out, carried, datacol, lvl, dtype)
            if dropna:
                out = out.filter(F.col(datacol).isNotNull())
        else:  # pragma: no cover — stop() handles primitives
            break
        levels.append(lvl)
        depth += 1
    if dropna:
        out = out.filter(F.col(datacol).isNotNull())
    return out, levels


def _stack_struct(
    df: DataFrame,
    carried: list[str],
    datacol: str,
    lvl: str,
    struct: T.StructType,
) -> DataFrame:
    """Pivot struct fields into (field_name, value) rows with ``stack``.

    This is the Spark analogue of the reference's one-iteration
    ``DataFrame.stack(level=all)`` on frame-valued cells
    (``frame.py:39-47``): the field name becomes the level column.
    """
    common = _struct_common_type(struct)
    args: list[Column] = []
    for f in struct.fields:
        args.append(F.lit(f.name))
        args.append(F.col(datacol).getField(f.name).cast(common))
    gen = F.stack(F.lit(len(struct.fields)), *args).alias(lvl, datacol)
    return df.select(*carried, gen)


def _array_pairs_or_null(c: Column) -> Column:
    """Array cell -> array<struct<p,v>> of (original position, value) with
    null leaves removed, or NULL when nothing remains. Positions are
    assigned BEFORE dropping nulls — matching pandas stack() and therefore
    the join path (a null leaf at index 1 leaves survivors at 0 and 2)."""
    pairs = F.filter(
        F.transform(c, lambda x, i: F.struct(i.alias("p"), x.alias("v"))),
        lambda s: s["v"].isNotNull(),
    )
    return F.when(F.size(pairs) > 0, pairs)


def _map_or_null(c: Column) -> Column:
    """Map cell with null values removed, NULL when nothing remains."""
    filtered = F.map_filter(c, lambda k, v: v.isNotNull())
    return F.when(F.size(F.map_keys(filtered)) > 0, filtered)


def _struct_as_map(c: Column, struct: T.StructType) -> Column:
    """Struct cell -> map(field_name -> value cast to the common type), so
    the fused path can use explode_outer uniformly (the generator-safe
    equivalent of the join path's stack())."""
    common = _struct_common_type(struct)
    pairs: list[Column] = []
    for f in struct.fields:
        pairs.append(F.lit(f.name))
        pairs.append(c.getField(f.name).cast(common))
    return F.when(c.isNotNull(), F.create_map(*pairs))


class FusionUnsupported(PuffbirdSparkError):
    """Raised when the fused planner cannot express a request (map-typed
    shared level, unreachable axis depth, interleaved axis deadlock) — the
    engine falls back to the join strategy under ``strategy='auto'``."""


def _advance_type(dtype: T.DataType) -> T.DataType:
    if isinstance(dtype, T.ArrayType):
        return dtype.elementType
    if isinstance(dtype, T.MapType):
        return dtype.valueType
    if isinstance(dtype, T.StructType):
        return _struct_common_type(dtype)
    return dtype


def fused_axes_supported(
    df: DataFrame,
    cols: list[str],
    axes_by_col: dict[str, dict[int, str]],
    depth_map: dict[str, int],
    stop_map: dict[str, StopCond],
) -> bool:
    """The fused planner zips shared axes positionally. That equals the
    join-based assembly EXACTLY iff every level above each zip is itself a
    join key AND the zip multiplies a frame whose per-key multiplicity is
    exactly the first member's frame. Statically: all declared axes form
    ONE group over the SAME member columns, each axis sits at one depth
    common to all members, the depths are the contiguous prefix 0..K,
    levels 0..K are arrays (zip is positional; map-keyed shared levels
    need key-equality joins), and — the round-8 tightening — the members
    occupy the LEADING positions of the requested column order, so the
    group folds BEFORE anything else expands.

    The prefix condition is load-bearing, not cosmetic: the join
    assembly folds frames in column order, and a non-first member joins
    on (key, axes) against the ACCUMULATED frame. If another column has
    already expanded (``to_long('b', 's', 'd', ax={'b':0,'d':0})`` — a
    plain column BETWEEN the members), a position only the later member
    holds joins nothing and lands as ONE standalone row per key, while a
    positional zip would replicate it across the earlier expansion —
    different multiplicities (caught by differential test
    ``test_fused_interleaved_plain_column_falls_back``). The same
    argument rules out a second disjoint group under this machinery:
    its members fold after the first group expanded, so its
    member-only positions collapse to once-per-key standalone rows the
    zip cannot express."""
    member_set = frozenset(axes_by_col)
    # members must lead the fold order: the group zips against nothing
    if frozenset(cols[:len(member_set)]) != member_set:
        return False
    axis_depths: dict[str, set[int]] = {}
    for c, m in axes_by_col.items():
        for depth, axis in m.items():
            axis_depths.setdefault(axis, set()).add(depth)
    for axis, depths in axis_depths.items():
        if len(depths) != 1:
            return False  # per-member depths → inconsistent join keys
        members = frozenset(
            c for c, m in axes_by_col.items() if axis in m.values()
        )
        if members != member_set:
            return False  # partial groups pad across foreign rows
    top = len(axis_depths)
    for c, m in axes_by_col.items():
        if sorted(m) != list(range(top)):
            return False  # free level above a shared level
        dtype = df.schema[c].dataType
        for depth in range(top):
            if depth >= depth_map[c] or stop_map[c](dtype):
                return False  # declared axis depth unreachable
            if not isinstance(dtype, T.ArrayType):
                return False
            dtype = dtype.elementType
    return True


def explode_fused(
    df: DataFrame,
    key_cols: list[str],
    cols: list[str],
    depth_map: dict[str, int],
    dropna: bool,
    stop_map: dict[str, StopCond],
    axes_by_col: dict[str, dict[int, str]] | None = None,
) -> DataFrame:
    """Fused multi-column explosion: ONE frame, sequential outer
    generators, NO joins (SURVEY §4.2 fusion; §7 risk 2).

    Equivalent to the join-based assembly: sequential generators produce
    exactly the per-index cartesian product for independent columns, cells
    that contribute nothing become a single all-NULL combination member,
    and a final filter drops index rows where EVERY exploded column
    contributed nothing — the rows the outer join would never have created.
    Declared shared axes (``axes_by_col``: {col: {depth: axis_name}}) are
    zipped positionally (``arrays_zip`` + one generator) once every member
    column has exploded down to its declared depth — the positional
    full-outer join of the reference, without the join. Wall-cost:
    scan -> generate, one codegen pipeline, zero shuffles.
    """
    axes_by_col = axes_by_col or {}
    out = df.select(*key_cols, *cols)
    cur = {c: 0 for c in cols}

    def active(c: str) -> bool:
        if cur[c] >= depth_map[c]:
            return False
        return not stop_map[c](out.schema[c].dataType)

    def new_level(c: str, depth: int) -> str:
        lvl = level_column(c, depth, axes_by_col.get(c))
        if lvl in out.columns:
            raise PuffbirdSparkError(
                f"generated level column {lvl!r} collides with an existing column"
            )
        return lvl

    def explode_one(c: str) -> None:
        nonlocal out
        dtype = out.schema[c].dataType
        lvl = new_level(c, cur[c])
        carried = [x for x in out.columns if x != c]
        cell = F.col(c)
        if isinstance(dtype, T.StructType):
            cell = _struct_as_map(cell, dtype)
            dtype = T.MapType(T.StringType(), _struct_common_type(dtype))
        if isinstance(dtype, T.ArrayType):
            if dropna:
                gen = F.explode_outer(_array_pairs_or_null(cell))
                out = out.select(*carried, gen.alias("__pv")).select(
                    *carried,
                    F.col("__pv").getField("p").alias(lvl),
                    F.col("__pv").getField("v").alias(c),
                )
            else:
                out = out.select(*carried, F.posexplode_outer(cell).alias(lvl, c))
        else:
            if dropna:
                cell = _map_or_null(cell)
            out = out.select(*carried, F.explode_outer(cell).alias(lvl, c))
        cur[c] += 1

    def zip_axis(members: list[str], axis: str) -> None:
        """Positional zip of all members' current arrays: one generator
        emits (axis_pos, member values) — the positional full-outer join
        of the reference (frame.py:531) without the join.

        ``dropna=True``: the join path's per-side inner generators mean a
        position exists iff some member holds a value there; an all-empty
        zip keeps one axis-NULL row ONLY at depth 0 (deeper, the position
        itself would never have existed in any member frame).

        ``dropna=False``: each member cell that is null-or-empty AND "real"
        (an element that actually existed upstream, not padding this zip
        chain introduced) adds one standalone axis-NULL row — the
        ``posexplode_outer`` NULL row of that member's frame, which joins
        nothing (NULL keys never match). Realness is threaded through
        hidden ``__real_{c}`` columns between consecutive zips."""
        nonlocal out
        if axis in out.columns:
            raise PuffbirdSparkError(
                f"shared axis column {axis!r} collides with an existing column"
            )
        depth = cur[members[0]]
        real_cols = {c: f"__real_{c}" for c in members}
        drop = set(members) | set(real_cols.values())
        carried = [x for x in out.columns if x not in drop]

        if dropna:
            zipped = F.arrays_zip(
                *[F.coalesce(F.col(c), F.array()).alias(c) for c in members]
            )
            gen = F.posexplode_outer(zipped)
            out = out.select(*carried, gen.alias(axis, "__z")).select(
                *carried, axis,
                *[F.col("__z").getField(c).alias(c) for c in members],
            )
            # a zip position survives iff ANY member holds a value there
            # (each side's null leaves were dropped before the outer join)
            pred = F.lit(False)
            if depth == 0:
                # all-empty cells at depth 0: keep one NULL row — other
                # frames keep the index row alive through the outer join
                pred = F.col(axis).isNull()
            for c in members:
                pred = pred | F.col(c).isNotNull()
            out = out.filter(pred)
        else:
            real = {
                c: (F.col(real_cols[c]) if real_cols[c] in out.columns
                    else F.lit(True))
                for c in members
            }
            lens = {
                c: F.size(F.coalesce(F.col(c), F.array())) for c in members
            }
            elem = {
                c: out.schema[c].dataType.elementType for c in members
            }
            entry_type = T.StructType(
                [T.StructField("__ax", T.IntegerType())]
                + [T.StructField(c, elem[c]) for c in members]
                + [T.StructField(real_cols[c], T.BooleanType())
                   for c in members]
            )
            zipped = F.arrays_zip(
                *[F.coalesce(F.col(c), F.array()).alias(c) for c in members]
            )
            entries = F.transform(
                zipped,
                lambda s, i: F.struct(
                    i.cast(T.IntegerType()).alias("__ax"),
                    *[s.getField(c).alias(c) for c in members],
                    *[(real[c] & (i < lens[c])).alias(real_cols[c])
                      for c in members],
                ),
            )
            for m in members:
                null_entry = F.struct(
                    F.lit(None).cast(T.IntegerType()).alias("__ax"),
                    *[F.lit(None).cast(elem[c]).alias(c) for c in members],
                    *[F.lit(c == m).alias(real_cols[c]) for c in members],
                )
                entries = F.concat(
                    entries,
                    F.when(real[m] & (lens[m] <= 0), F.array(null_entry))
                    .otherwise(F.array().cast(T.ArrayType(entry_type))),
                )
            out = out.select(*carried, F.explode_outer(entries).alias("__e"))
            out = out.select(
                *carried,
                F.col("__e").getField("__ax").alias(axis),
                *[F.col("__e").getField(c).alias(c) for c in members],
                *[F.col("__e").getField(real_cols[c]).alias(real_cols[c])
                  for c in members],
            )
        for c in members:
            cur[c] += 1

    pending = {c for c in cols}
    while True:
        progressed = False
        # 1. explode every column whose NEXT level is unshared
        for c in list(pending):
            while active(c) and cur[c] not in axes_by_col.get(c, {}):
                explode_one(c)
                progressed = True
            if not active(c) and cur[c] not in axes_by_col.get(c, {}):
                pending.discard(c)
        # 2. fire every shared axis whose members have all arrived
        waiting_axes: dict[str, list[str]] = {}
        for c in pending:
            axis = axes_by_col.get(c, {}).get(cur[c])
            if axis is not None:
                waiting_axes.setdefault(axis, []).append(c)
        declared_members = {
            axis: sorted(c for c, m in axes_by_col.items() if axis in m.values())
            for axis in waiting_axes
        }
        for axis, waiting in waiting_axes.items():
            if sorted(waiting) == declared_members[axis]:
                zip_axis(declared_members[axis], axis)
                progressed = True
        if not pending:
            break
        if not progressed:
            if waiting_axes:
                raise FusionUnsupported(
                    f"shared axes {sorted(waiting_axes)} cannot be scheduled "
                    f"(interleaved declarations) — use strategy='join'"
                )
            break

    leftover_real = [
        x for c in axes_by_col for x in (f"__real_{c}",) if x in out.columns
    ]
    if leftover_real:
        out = out.drop(*leftover_real)
    if dropna and cols:
        # a row survives iff ANY requested datacol contributed a value —
        # including non-exploded primitives (the join path keeps an index
        # row whenever at least one per-column frame has it)
        contributed = [F.col(c).isNotNull() for c in cols]
        pred = contributed[0]
        for p in contributed[1:]:
            pred = pred | p
        out = out.filter(pred)
    return out


def zip_explode(
    df: DataFrame,
    key_cols: list[str],
    cols: list[str],
    axis_name: str = "pos",
    dropna: bool = True,
) -> DataFrame:
    """Fused shared-axis explosion for parallel arrays: ONE
    ``posexplode(arrays_zip(...))`` instead of per-column explodes joined
    back on the axis (SURVEY §4.2's fusion optimization, exposed as an
    explicit operator for the common "these arrays are aligned" case).

    Equivalent to ``to_long(*cols, axis={c: 0 for c in cols})`` when every
    column is a same-length top-level array, but with zero joins and zero
    shuffles — the plan is scan → generate, pipelined in one codegen stage.
    Ragged lengths follow ``arrays_zip`` semantics (shorter arrays pad with
    NULL), which matches the full-outer positional join of the reference.
    """
    for c in cols:
        if not isinstance(df.schema[c].dataType, T.ArrayType):
            raise PuffbirdSparkError(
                f"zip_explode requires top-level array columns; {c!r} is "
                f"{df.schema[c].dataType.simpleString()}"
            )
    zipped = F.arrays_zip(*[F.col(c) for c in cols])
    gen = F.posexplode(zipped) if dropna else F.posexplode_outer(zipped)
    out = df.select(*key_cols, gen.alias(axis_name, "__z"))
    return out.select(
        *key_cols, axis_name,
        *[F.col("__z").getField(c).alias(c) for c in cols],
    )


def assemble_long(
    frames: list[tuple[str, DataFrame, list[str]]],
    key_cols: list[str],
) -> DataFrame:
    """Fold per-column long frames with full-outer joins.

    Each element is ``(datacol, long_frame, level_cols)``. Join keys are the
    new frame's key + level columns that already exist on the accumulated
    frame — the Spark rendering of the reference's
    ``on = list(names & set(df.columns))`` (``frame.py:531``) where ``names``
    are the index-level names of the per-column long series. Independent
    explosions therefore combine as a per-row cartesian product (their level
    columns are disjoint), while shared-axis level columns become join keys
    → positional alignment. A value column colliding with an existing non-key
    column gets the reference's ``_{datacol}`` suffix (``frame.py:533``).
    """
    out: DataFrame | None = None
    for datacol, frame, levels in frames:
        if out is None:
            out = frame
            continue
        keyish = set(key_cols) | set(levels)
        join_keys = [c for c in frame.columns if c in keyish and c in out.columns]
        for c in [c for c in frame.columns
                  if c not in join_keys and c in out.columns]:
            frame = frame.withColumnRenamed(c, f"{c}_{datacol}")
        if not join_keys:
            out = out.crossJoin(frame)
        else:
            out = out.join(frame, on=join_keys, how="full")
    if out is None:
        raise PuffbirdSparkError("no data columns to explode")
    return out
