"""``FrameEngine`` — the puffy-table engine, Spark-native.

Wraps an immutable :class:`pyspark.sql.DataFrame` plus explicit
``index_cols`` metadata (Spark has no row index; the reference keeps index
columns in a pandas MultiIndex, ``puffbird/frame.py:188-194``). All methods
return **new** engines / DataFrames — the reference mutates ``self._table``
in place (``frame.py:831-948``); immutability is the Spark-idiomatic
replacement and keeps the same fluent chaining surface.

Method parity map (reference ``puffbird/frame.py``):

===================  =======================================================
``__init__``         R1  construction/normalization     frame.py:147-213
``to_long``          R2  recursive explode + join       frame.py:334-542
``shared_axes``      R4  aligned explosion              frame.py:401-413
``expand_col``       R5  concat of frame-cells          frame.py:627-698
``__getitem__``      R6  projection                     frame.py:602-625
``col_apply``        R7  scalar UDF on one column       frame.py:700-747
``apply``            R8  row-wise multi-column UDF      frame.py:749-803
``drop``             R9                                 frame.py:831-899
``rename``           R10                                frame.py:901-948
``to_puffy``         R11 group-nest aggregation         frame.py:950-1016
``multid_pivot``     R12 pivot                          frame.py:1018-1075
===================  =======================================================

Known reference bugs intentionally *not* replicated (SURVEY §2.1):
- ``frame.py:793`` ``self._substitue_col`` typo breaks ``apply(map_kws=…)``;
  we implement the documented behavior.
- ``frame.py:1244-1246`` unpacking crash when ``handle_column_types=False``;
  we implement the documented no-op.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import explode as _explode
from .dispatch import CallableContainer
from .errors import PuffbirdSparkError
from .naming import (
    DEFAULT_INDEX_COL,
    check_collisions,
    check_reserved,
    level_column,
    sanitize_identifier,
)

_DEFAULT_KEY = "_default"  # per-column parameter-map default key (frame.py:1171-1186)


def _per_col(arg: Any, cols: list[str], default: Any) -> dict[str, Any]:
    """Normalize a per-column parameter map (R16, frame.py:1171-1186).

    ``arg`` may be a scalar (applies to all), or a dict ``{col: value}`` with
    optional ``"_default"``; unknown keys are rejected.
    """
    if arg is None:
        return {c: default for c in cols}
    if isinstance(arg, Mapping):
        unknown = set(arg) - set(cols) - {_DEFAULT_KEY}
        if unknown:
            raise PuffbirdSparkError(
                f"unknown columns in parameter mapping: {sorted(unknown)}"
            )
        d = arg.get(_DEFAULT_KEY, default)
        return {c: arg.get(c, d) for c in cols}
    return {c: arg for c in cols}


class FrameEngine:
    """Engine over a Spark DataFrame with declared key (index) columns."""

    def __init__(
        self,
        table: DataFrame | "FrameEngine",
        datacols: list[str] | None = None,
        indexcols: list[str] | None = None,
        handle_column_types: bool = True,
        enforce_identifier_string: bool = False,
        validate: bool | str = "lazy",
    ):
        """``validate`` controls the key-uniqueness assertion
        (frame.py:204-207): ``"eager"`` (or ``True``) runs the check job at
        construction — reference semantics, a full pass over the table;
        ``"lazy"`` (default) defers it to the first key-dependent operation
        (``to_long``, index-column mutation) and runs it at most once —
        at 100 TB constructing an engine is then plan-only, no job;
        ``False`` disables it (the scale path for keys already known
        unique, e.g. ingest-generated surrogate ids).
        """
        if isinstance(table, FrameEngine):
            if indexcols is None:
                indexcols = table.indexcols
            table = table.table
        if not isinstance(table, DataFrame):
            raise PuffbirdSparkError(
                f"table must be a pyspark DataFrame or FrameEngine, got {type(table)}"
            )

        # -- column-name normalization (R1; frame.py:1240-1325) -----------
        if handle_column_types:
            renames = {}
            for c in table.columns:
                new = sanitize_identifier(c) if enforce_identifier_string else str(c)
                if new != c:
                    renames[c] = new
            if renames:
                table = table.withColumnsRenamed(renames)
            self._rename_map = renames
        else:
            self._rename_map = {}

        cols = table.columns

        # -- split data / index columns (frame.py:1207-1237) --------------
        if indexcols is None and datacols is None:
            indexcols = []
            datacols = list(cols)
        elif indexcols is None:
            datacols = [str(c) for c in datacols]
            indexcols = [c for c in cols if c not in set(datacols)]
        elif datacols is None:
            indexcols = [str(c) for c in indexcols]
            datacols = [c for c in cols if c not in set(indexcols)]
        else:
            indexcols = [str(c) for c in indexcols]
            datacols = [str(c) for c in datacols]

        missing = (set(indexcols) | set(datacols)) - set(cols)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")

        # -- surrogate key when the table has no index (SURVEY §7 risk 3):
        # generated ONCE at ingest, never regenerated.
        if not indexcols:
            table = table.withColumn(
                DEFAULT_INDEX_COL, F.monotonically_increasing_id()
            )
            indexcols = [DEFAULT_INDEX_COL]

        check_reserved(datacols)
        # Only nested datacols can generate level columns, so only they can
        # collide with index-column names (the reference checks all datacols,
        # frame.py:1347-1352, because pandas can't see types statically —
        # here a primitive datacol provably never explodes, which keeps
        # to_long output re-ingestable for to_puffy round-trips).
        nested = [
            c for c in datacols
            if isinstance(table.schema[c].dataType,
                          (T.ArrayType, T.MapType, T.StructType))
        ]
        check_collisions(nested, indexcols)

        self._df = table
        self._indexcols = list(indexcols)
        self._datacols = list(datacols)

        # -- key uniqueness (frame.py:204-207) as a Spark assertion job ---
        if validate not in (True, False, "eager", "lazy"):
            raise PuffbirdSparkError(
                f"validate must be 'eager'/'lazy'/True/False, got {validate!r}"
            )
        if validate is False or indexcols == [DEFAULT_INDEX_COL]:
            self._validated = True  # trusted / surrogate keys: nothing to check
        elif validate in (True, "eager"):
            self._validated = True
            self._check_key_uniqueness(table, indexcols)
        else:
            self._validated = False  # checked at first key-dependent op

    @staticmethod
    def _check_key_uniqueness(df: DataFrame, keys: list[str]) -> None:
        dupes = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1)
        if dupes.count() > 0:
            raise PuffbirdSparkError(
                "Each row for all index columns must be a unique set."
            )

    def validate_keys(self) -> "FrameEngine":
        """Run the deferred key-uniqueness assertion now (no-op if already
        validated). Returns self for chaining."""
        if not self._validated:
            self._check_key_uniqueness(self._df, self._indexcols)
            self._validated = True
        return self

    def _ensure_valid(self) -> None:
        if not self._validated:
            self.validate_keys()

    # ------------------------------------------------------------------ #
    # properties
    # ------------------------------------------------------------------ #

    @property
    def table(self) -> DataFrame:
        return self._df

    @property
    def indexcols(self) -> list[str]:
        return list(self._indexcols)

    @property
    def datacols(self) -> list[str]:
        return list(self._datacols)

    @property
    def cols(self) -> list[str]:
        """Data + index columns (reference frame.py:244-249)."""
        return list(self._datacols) + list(self._indexcols)

    def _rename_view(self, current: list[str]) -> dict[str, str]:
        """Original -> current-name mapping restricted to live columns
        (reference frame.py:257-293): entries whose renamed value is no
        longer a column, or whose original name is itself a column again,
        fall out of the view."""
        live = set(self.cols)
        return {
            orig: new for orig, new in self._rename_map.items()
            if new in current and orig not in live
        }

    @property
    def datacols_rename(self) -> dict[str, str]:
        return self._rename_view(self._datacols)

    @property
    def indexcols_rename(self) -> dict[str, str]:
        return self._rename_view(self._indexcols)

    @property
    def cols_rename(self) -> dict[str, str]:
        return {**self.datacols_rename, **self.indexcols_rename}

    def __repr__(self) -> str:  # pragma: no cover
        return (f"FrameEngine(indexcols={self._indexcols}, "
                f"datacols={self._datacols})")

    def _replace(self, df: DataFrame, indexcols: list[str],
                 datacols: list[str]) -> "FrameEngine":
        eng = object.__new__(FrameEngine)
        eng._df = df
        eng._indexcols = list(indexcols)
        eng._datacols = list(datacols)
        eng._rename_map = dict(self._rename_map)
        eng._validated = self._validated
        return eng

    # ------------------------------------------------------------------ #
    # R6 — projection
    # ------------------------------------------------------------------ #

    def __getitem__(self, cols):
        """Select a subset of data columns → new engine (frame.py:602-625)."""
        if isinstance(cols, str):
            cols = [cols]
        cols = list(cols)
        missing = set(cols) - set(self._datacols)
        if missing:
            raise PuffbirdSparkError(f"not data columns: {sorted(missing)}")
        df = self._df.select(*self._indexcols, *cols)
        return self._replace(df, self._indexcols, cols)

    # ------------------------------------------------------------------ #
    # R2/R3/R4/R15/R17 — to_long
    # ------------------------------------------------------------------ #

    def to_long(
        self,
        *cols: str,
        max_depth: int | Mapping[str, int] = _explode.DEFAULT_MAX_DEPTH,
        dropna: bool = True,
        cond: Callable[[T.DataType], bool] | Mapping | None = None,
        expand_cols: list[str] | None = None,
        expand_index_fields: Mapping[str, Sequence[str]] | None = None,
        variant_cols: list[str] | None = None,
        strategy: str = "auto",
        reindex: bool = False,
        **shared_axes: Mapping[str, int],
    ) -> DataFrame:
        """Explode data columns into a long (tidy) DataFrame.

        Semantics follow reference ``to_long`` (frame.py:334-542): each data
        column is exploded independently to its leaves, emitting
        ``{col}_level{n}`` position/key columns, then the per-column long
        frames are full-outer-joined on shared columns — a per-row cartesian
        product unless ``shared_axes`` aligns depths across columns.

        ``shared_axes``: keyword args ``name={'colA': depthA, 'colB': depthB}``
        declare that depth ``depthX`` of each column is the same logical axis;
        the level column takes the shared ``name`` and becomes a join key
        (positional zip instead of cross product; frame.py:401-413).

        ``expand_index_fields``: per expand column, the struct fields that
        encode the frame-cell's *named inner index* — they surface bare
        (reference merge suffixes ``_{datacol}`` on collision) and replace
        the synthetic ``{col}_level0`` position column; all other fields
        get the ``{col}_`` prefix (frame.py:489-533, tutorial cell 23).

        ``variant_cols``: JSON-string columns with ragged / per-cell
        heterogeneous nesting, exploded with per-row dynamic dispatch (see
        ``variant.py`` — the Spark rendering of the reference's per-cell
        type dispatch, frame.py:35-47).

        ``strategy``: ``"join"`` explodes each column separately and
        full-outer-joins the long frames (always available); ``"fused"``
        runs sequential generators in one frame — zero joins/shuffles,
        same result — and is what ``"auto"`` picks when no shared axes,
        expand or variant columns are requested with >= 2 columns.

        ``reindex`` (reference frame.py:536-542) re-sets the pandas row
        index after assembly — meaningless without a row index; accepted
        for drop-in compatibility and ignored with a warning.
        """
        if reindex:
            import warnings

            warnings.warn(
                "to_long(reindex=...) is a pandas-index concept; Spark "
                "DataFrames have no row index — ignored (key and level "
                "columns are ordinary columns in the result)",
                stacklevel=2,
            )
        datacols = list(cols) if cols else list(self._datacols)
        missing = set(datacols) - set(self._datacols)
        if missing:
            raise PuffbirdSparkError(f"not data columns: {sorted(missing)}")
        # join-assembly correctness relies on key uniqueness; run the
        # deferred check (at most once) before planning
        self._ensure_valid()
        expand_cols = list(expand_cols or [])
        expand_index_fields = dict(expand_index_fields or {})
        stray_idx = set(expand_index_fields) - set(expand_cols)
        if stray_idx:
            raise PuffbirdSparkError(
                f"expand_index_fields keys not in expand_cols: {sorted(stray_idx)}"
            )
        variant_cols = list(variant_cols or [])
        stray = set(variant_cols) - set(datacols)
        if stray:
            raise PuffbirdSparkError(
                f"variant_cols not among the exploded data columns: {sorted(stray)}"
            )

        axes_by_col = self._check_shared_axes(shared_axes, datacols)
        depth_map = _per_col(max_depth, datacols, _explode.DEFAULT_MAX_DEPTH)
        cond_map = _per_col(cond, datacols, _explode.default_stop)

        if strategy not in ("auto", "join", "fused"):
            raise PuffbirdSparkError(
                f"strategy must be 'auto', 'join' or 'fused', got {strategy!r}"
            )
        zip_fusable = not axes_by_col or _explode.fused_axes_supported(
            self._df, datacols, axes_by_col, depth_map, cond_map)
        fold_fusable = bool(axes_by_col) and not zip_fusable and (
            _explode.fold_exact_supported(
                self._df, datacols, axes_by_col, depth_map, cond_map))
        fusable = (
            not expand_cols
            and not variant_cols
            and (zip_fusable or fold_fusable)
        )
        if strategy == "fused" and not fusable:
            raise PuffbirdSparkError(
                "strategy='fused' does not support expand_cols / variant_cols"
                ", and shared axes only as identical-chain groups (same "
                "member columns per axis chain, one depth per axis, "
                "contiguous array-typed depths from 0) — use 'join' (or "
                "'auto')"
            )
        if strategy == "fused" or (
            strategy == "auto" and fusable and len(datacols) >= 2
        ):
            try:
                if fold_fusable:
                    # order-sensitive fold semantics compiled to
                    # generators (disjoint groups / interleaved members)
                    return _explode.explode_fold_exact(
                        self._df, self._indexcols, datacols,
                        depth_map=depth_map, dropna=dropna,
                        stop_map=cond_map, axes_by_col=axes_by_col,
                    )
                return _explode.explode_fused(
                    self._df, self._indexcols, datacols,
                    depth_map=depth_map, dropna=dropna, stop_map=cond_map,
                    axes_by_col=axes_by_col,
                )
            except _explode.FusionUnsupported:
                if strategy == "fused":
                    raise
                # auto: fall back to the always-correct join assembly

        frames: list[tuple[str, DataFrame, list[str]]] = []
        for c in datacols:
            if c in expand_cols:
                frames.append(self._expand_frame(
                    c, dropna, index_fields=expand_index_fields.get(c)))
            elif c in variant_cols:
                from .variant import explode_variant

                frame, levels = explode_variant(
                    self._df, self._indexcols, c,
                    max_depth=depth_map[c], dropna=dropna,
                )
                frames.append((c, frame, levels))
            else:
                frame, levels = _explode.explode_column(
                    self._df,
                    self._indexcols,
                    c,
                    max_depth=depth_map[c],
                    dropna=dropna,
                    shared_axes=axes_by_col.get(c),
                    stop=cond_map[c],
                )
                frames.append((c, frame, levels))
        return _explode.assemble_long(frames, self._indexcols)

    def _check_shared_axes(
        self, shared_axes: Mapping[str, Mapping[str, int]], datacols: list[str]
    ) -> dict[str, dict[int, str]]:
        """Validate shared-axes kwargs (frame.py:1358-1384) and invert to
        per-column ``{depth: axis_name}`` maps."""
        axes_by_col: dict[str, dict[int, str]] = {}
        for axis_name, mapping in shared_axes.items():
            if not isinstance(mapping, Mapping) or len(mapping) < 2:
                raise PuffbirdSparkError(
                    f"shared axis {axis_name!r} must map >=2 data columns to depths"
                )
            for col, depth in mapping.items():
                if col not in datacols:
                    raise PuffbirdSparkError(
                        f"shared axis {axis_name!r} references {col!r}, "
                        f"which is not an exploded data column"
                    )
                if not isinstance(depth, int) or depth < 0:
                    raise PuffbirdSparkError(
                        f"shared axis depth must be a non-negative int, "
                        f"got {depth!r} for {col!r}"
                    )
                by_depth = axes_by_col.setdefault(col, {})
                if depth in by_depth:
                    raise PuffbirdSparkError(
                        f"column {col!r} declares two shared axes at depth {depth}"
                    )
                by_depth[depth] = axis_name
        return axes_by_col

    # ------------------------------------------------------------------ #
    # R5 — expand_col
    # ------------------------------------------------------------------ #

    def _expand_frame(
        self, col: str, dropna: bool,
        index_fields: Sequence[str] | None = None,
    ) -> tuple[str, DataFrame, list[str]]:
        """``to_long(expand_cols=[col])`` inner path: inline the struct array
        and prefix field names with ``{col}_`` (frame.py:489-503).

        ``index_fields`` models the reference frame-cell's *named inner
        index*: in pandas the inner index levels reach the merged long
        frame under their bare names (the ``{datacol}_`` prefix rename at
        frame.py:499-502 runs before ``reset_index``), and a bare name
        colliding with an existing column picks up the merge's
        ``_{datacol}`` suffix (frame.py:533; tutorial cell 23 ``a`` →
        ``a_e``). Declared fields therefore stay unprefixed (collision
        handling falls to ``assemble_long``), replace the synthetic
        position column (the inner index IS the position), and the
        remaining value fields keep the ``{col}_`` prefix."""
        dtype = self._df.schema[col].dataType
        struct = self._expandable_struct(col, dtype)
        idx = list(index_fields or [])
        known = {f.name for f in struct.fields}
        missing = set(idx) - known
        if missing:
            raise PuffbirdSparkError(
                f"expand_index_fields for {col!r} not in its struct: "
                f"{sorted(missing)}"
            )
        pos_col = level_column(col, 0)
        gen = F.posexplode(F.col(col)) if dropna else F.posexplode_outer(F.col(col))
        df = self._df.select(*self._indexcols, gen.alias(pos_col, col))
        if idx:
            out_cols = [*self._indexcols] + [
                F.col(col).getField(f.name).alias(
                    f.name if f.name in idx else f"{col}_{f.name}")
                for f in struct.fields
            ]
            # levels=[] so bare inner-index names are NOT join keys: the
            # reference computes merge keys from the OUTER index names only
            # (frame.py:491 `names` precedes expand) — a collision suffixes
            # instead of aligning.
            return col, df.select(*out_cols), []
        out_cols = [*self._indexcols, pos_col] + [
            F.col(col).getField(f.name).alias(f"{col}_{f.name}")
            for f in struct.fields
        ]
        return col, df.select(*out_cols), [pos_col]

    def expand_col(self, col: str, dropna: bool = True) -> "FrameEngine":
        """Vertically expand a column of frame-like cells (array<struct>).

        Reference ``expand_col`` (frame.py:627-698) concatenates
        DataFrame-cells, prefixing the outer key; colliding field names are
        suffix-renamed ``{field}_{col}`` (tutorial cell 24 ``a`` → ``a_e``).
        The element position becomes a new index column ``{col}_level0``.
        """
        dtype = self._df.schema[col].dataType
        struct = self._expandable_struct(col, dtype)
        pos_col = level_column(col, 0)
        others = [c for c in self._df.columns if c != col]
        gen = F.posexplode(F.col(col)) if dropna else F.posexplode_outer(F.col(col))
        df = self._df.select(*others, gen.alias(pos_col, col))
        existing = set(others) | {pos_col}
        field_cols = []
        new_datacols = [c for c in self._datacols if c != col]
        for f in struct.fields:
            name = f.name if f.name not in existing else f"{f.name}_{col}"
            field_cols.append(F.col(col).getField(f.name).alias(name))
            new_datacols.append(name)
        df = df.select(*others, pos_col, *field_cols)
        return self._replace(df, self._indexcols + [pos_col], new_datacols)

    @staticmethod
    def _expandable_struct(col: str, dtype: T.DataType) -> T.StructType:
        if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
            return dtype.elementType
        if isinstance(dtype, T.StructType):
            # a bare struct column expands as a single-row frame-cell
            return dtype
        raise PuffbirdSparkError(
            f"expand_col requires array<struct> or struct cells; "
            f"{col!r} is {dtype.simpleString()}"
        )

    # ------------------------------------------------------------------ #
    # R7 — col_apply
    # ------------------------------------------------------------------ #

    def col_apply(
        self,
        func: Callable | Column,
        col: str,
        new_col_name: str | None = None,
        return_type: T.DataType | str = "string",
        assign_to_index: bool | None = None,
        vectorized: bool = False,
        arrow: bool = True,
        **kwargs: Any,
    ) -> "FrameEngine":
        """Apply ``func`` to one column (frame.py:700-747).

        ``func`` may be a pyspark ``Column`` expression (preferred — stays
        JVM-side), a plain Python callable, or, with ``vectorized=True``,
        a ``pandas.Series -> pandas.Series`` callable (Arrow-batched
        pandas UDF — the fastest Python path).

        A plain callable is BY DEFAULT wrapped in an Arrow-batched
        per-element map (``pandas_udf`` + ``Series.map``) rather than a
        row-at-a-time ``F.udf`` — Arrow batch transfer amortizes the
        Python round-trip ~10-100x, so naive callers don't land on the
        slow path at scale (VERDICT r5 #4). Caveat: Arrow hands the
        callable NaN (not None) for NULLs in numeric columns; pass
        ``arrow=False`` to fall back to ``F.udf``'s exact
        None-per-row semantics.
        """
        if col not in self._df.columns:
            raise PuffbirdSparkError(f"no such column: {col!r}")
        target = new_col_name or col
        if isinstance(func, Column):
            expr = func
        elif vectorized:
            expr = F.pandas_udf(lambda s: func(s, **kwargs), return_type)(F.col(col))
        elif arrow:
            expr = F.pandas_udf(
                lambda s: s.map(lambda x: func(x, **kwargs)), return_type
            )(F.col(col))
        else:
            expr = F.udf(lambda x: func(x, **kwargs), return_type)(F.col(col))
        df = self._df.withColumn(target, expr)
        return self._assign_output(df, target, assign_to_index, replaced=col)

    # ------------------------------------------------------------------ #
    # R8 — apply
    # ------------------------------------------------------------------ #

    def apply(
        self,
        func: Callable,
        new_col_name: str | None = None,
        *args: str,
        return_type: T.DataType | str = "string",
        assign_to_index: bool = False,
        map_kws: Mapping[str, str] | None = None,
        arrow: bool = True,
        **kwargs: Any,
    ) -> "FrameEngine":
        """Row-wise multi-column UDF (frame.py:749-803).

        Positional ``args`` and ``map_kws`` values name table columns whose
        row values are passed to ``func``; extra ``kwargs`` pass through.
        (The reference's ``map_kws`` path is broken by the ``_substitue_col``
        typo at frame.py:793 — this implements the documented behavior.)

        The callable is BY DEFAULT dispatched through an Arrow-batched
        ``pandas_udf`` that zips the column batches and maps the function
        per row — same per-row signature, ~10-100x less serialization
        overhead than row-at-a-time ``F.udf`` (VERDICT r5 #4). NULLs in
        numeric columns arrive as NaN under Arrow; ``arrow=False``
        restores ``F.udf``'s exact None semantics.
        """
        new_col_name = new_col_name or "apply_result"  # frame.py:787-788
        map_kws = dict(map_kws or {})
        cols = list(args) + list(map_kws.values())
        missing = set(cols) - set(self._df.columns)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")
        n_pos = len(args)
        kw_names = list(map_kws.keys())

        def _wrapped(*vals):
            pos = vals[:n_pos]
            kw = dict(zip(kw_names, vals[n_pos:]))
            return func(*pos, **kw, **kwargs)

        if arrow:
            def _batched(*series: pd.Series) -> pd.Series:
                return pd.Series(
                    [_wrapped(*vals) for vals in zip(*series)],
                    index=series[0].index if series else None,
                )

            expr = F.pandas_udf(_batched, return_type)(
                *[F.col(c) for c in cols])
        else:
            expr = F.udf(_wrapped, return_type)(*[F.col(c) for c in cols])
        df = self._df.withColumn(new_col_name, expr)
        return self._assign_output(df, new_col_name, assign_to_index)

    def _assign_output(
        self,
        df: DataFrame,
        target: str,
        assign_to_index: bool | None,
        replaced: str | None = None,
    ) -> "FrameEngine":
        """Place a computed column into data or index cols (frame.py:805-829)."""
        indexcols = list(self._indexcols)
        datacols = list(self._datacols)
        if target in indexcols or target in datacols:
            pass  # replaced in place
        elif assign_to_index:
            indexcols.append(target)
        else:
            datacols.append(target)
        eng = self._replace(df, indexcols, datacols)
        if assign_to_index and target not in self._indexcols:
            # appending an index col must preserve key uniqueness
            self._check_key_uniqueness(df, indexcols)
            eng._validated = True
        return eng

    # ------------------------------------------------------------------ #
    # R9/R10 — drop / rename
    # ------------------------------------------------------------------ #

    def drop(self, *cols: str, validate: bool = True) -> "FrameEngine":
        """Drop data and/or index columns (frame.py:831-899). Dropping index
        columns re-checks key uniqueness unless ``validate=False``."""
        cols_set = set(cols)
        missing = cols_set - set(self._df.columns)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")
        indexcols = [c for c in self._indexcols if c not in cols_set]
        datacols = [c for c in self._datacols if c not in cols_set]
        if not indexcols:
            raise PuffbirdSparkError("cannot drop all index columns")
        df = self._df.drop(*cols)
        dropped_index = len(indexcols) != len(self._indexcols)
        eng = self._replace(df, indexcols, datacols)
        if dropped_index and validate:
            self._check_key_uniqueness(df, indexcols)
            eng._validated = True
        return eng

    def rename(self, **mapping: str) -> "FrameEngine":
        """Rename data/index columns (frame.py:901-948)."""
        missing = set(mapping) - set(self._df.columns)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")
        df = self._df.withColumnsRenamed(dict(mapping))
        indexcols = [mapping.get(c, c) for c in self._indexcols]
        datacols = [mapping.get(c, c) for c in self._datacols]
        eng = self._replace(df, indexcols, datacols)
        # track original -> current for the *_rename views, composing with
        # earlier renames (a->b then b->c records a->c)
        renames = dict(self._rename_map)
        inverse = {v: k for k, v in renames.items()}
        for old, new in mapping.items():
            renames[inverse.pop(old, old)] = new
        eng._rename_map = renames
        return eng

    # ------------------------------------------------------------------ #
    # R11 — to_puffy
    # ------------------------------------------------------------------ #

    def to_puffy(
        self,
        *indexcols: str,
        aggfunc: Any = None,
        dropna: bool = True,
        keep_missing_idcs: bool = True,
        sort_by: list[str] | None = None,
    ) -> "FrameEngine":
        """Inverse of ``to_long``: group by ``indexcols`` and nest every other
        column into a list (frame.py:950-1016).

        ``aggfunc`` may be: None (collect into list — the reference default,
        frame.py:31), a string Spark agg name (``"sum"``/``"avg"``/...), a
        callable ``Column -> Column``, a :class:`CallableContainer`, or a
        per-column dict of any of these.

        Because Spark rows are unordered, deterministic list order needs
        ``sort_by`` (e.g. the level columns produced by ``to_long``): values
        are collected as structs and sorted by those columns inside each
        group. Without ``sort_by`` lists are sorted by value for determinism
        (documented deviation: pandas preserves encounter order).
        """
        indexcols = [str(c) for c in indexcols]
        if not indexcols:
            raise PuffbirdSparkError("to_puffy requires at least one index column")
        missing = set(indexcols) - set(self._df.columns)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")
        sort_by = list(sort_by or [])
        value_cols = [
            c for c in self._df.columns
            if c not in set(indexcols) and c not in set(sort_by)
        ]
        if not keep_missing_idcs:
            # demoted index cols are dropped instead of aggregated
            # (frame.py:991-994)
            value_cols = [c for c in value_cols if c not in self._indexcols]
        df = self._df
        if dropna:
            df = df.na.drop(subset=indexcols)

        agg_map = _per_col(aggfunc, value_cols, None)
        aggs = []
        for c in value_cols:
            fn = agg_map[c]
            aggs.append(self._make_agg(c, fn, sort_by).alias(c))
        out = df.groupBy(*indexcols).agg(*aggs)
        return FrameEngine(out, indexcols=indexcols, validate=False)

    @staticmethod
    def _make_agg(col: str, fn: Any, sort_by: list[str]) -> Column:
        if fn is None:
            if sort_by:
                # order-preserving nest: collect (sort_keys..., value) structs,
                # sort within the group, project the value back out.
                struct = F.struct(
                    *[F.col(s).alias(f"__o{i}") for i, s in enumerate(sort_by)],
                    F.col(col).alias("__v"),
                )
                return F.transform(
                    F.array_sort(F.collect_list(struct)), lambda s: s["__v"]
                )
            return F.array_sort(F.collect_list(F.col(col)))
        if isinstance(fn, str):
            return getattr(F, fn)(F.col(col))
        if isinstance(fn, CallableContainer):
            return fn(F.col(col))
        if callable(fn):
            # Arbitrary Python aggregation callables (np.mean, builtins —
            # the reference's aggfunc contract, frame.py:31) can't be probed
            # with a Column (numpy operator overloads would "succeed" with a
            # non-aggregating expression): route them straight to the Arrow
            # GROUPED_AGG slow path. Only callables NOT from numpy/builtins
            # are tried as Column -> Column expressions first.
            mod = getattr(fn, "__module__", "") or ""
            if not (mod.startswith("numpy") or mod == "builtins"):
                # The probe must not propagate: callables that reject a
                # Column (statistics.median iterates; a Series-style lambda
                # calls .mean()) belong on the GROUPED_AGG slow path, not in
                # the user's face as a TypeError.
                try:
                    out = fn(F.col(col))
                except Exception:
                    out = None
                if isinstance(out, Column):
                    return out
            return FrameEngine._grouped_agg_udf(fn)(F.col(col))
        raise PuffbirdSparkError(f"invalid aggfunc for {col!r}: {fn!r}")

    @staticmethod
    def _grouped_agg_udf(fn: Callable) -> Callable[[Column], Column]:
        """Wrap an arbitrary ``values -> scalar`` Python callable (np.mean,
        statistics.median, ...) as an Arrow-batched GROUPED_AGG pandas UDF —
        the documented slow path for the reference's per-cell callable
        contract (callables.py:45-52). Result type is double."""

        def _agg(s: pd.Series) -> float:
            return float(fn(s))

        return F.pandas_udf(_agg, "double")

    # ------------------------------------------------------------------ #
    # R12 — multid_pivot
    # ------------------------------------------------------------------ #

    @staticmethod
    def _exact_mean(v: str) -> Column:
        """Mean as exact-sum / non-null-count: on decimal inputs this is
        deterministic across engines and aggregation orders, unlike a
        native double avg (see queries/base.py float policy). Shared by
        ``multid_pivot`` and ``to_xarray`` so the two surfaces can never
        disagree on the same request."""
        return F.sum(F.col(v)).cast("double") / F.count(F.col(v))

    def multid_pivot(
        self,
        values: str | list[str],
        *dims: str,
        pivot_values: list | None = None,
    ) -> DataFrame:
        """Mean-pivot over dimensions (frame.py:1018-1075).

        Two dims → ``groupBy(d1).pivot(d2).avg(values)``; otherwise
        ``groupBy(*dims).avg(values)`` (dense n-D tensor materialization is a
        driver-side concern — see ``to_xarray``).

        ``pivot_values``: explicit distinct values of the second dim. Without
        it Spark runs an extra distinct job to discover them — fine at small
        SF, a full pass at 100 TB; pass the known domain to skip it.
        """
        if isinstance(values, str):
            values = [values]
        if not dims:
            raise PuffbirdSparkError("multid_pivot requires at least one dim")
        missing = (set(values) | set(dims)) - set(self._df.columns)
        if missing:
            raise PuffbirdSparkError(f"no such columns: {sorted(missing)}")
        mean = self._exact_mean

        if len(dims) == 2 and len(values) == 1:
            grouped = self._df.groupBy(dims[0])
            piv = (grouped.pivot(dims[1], pivot_values) if pivot_values
                   else grouped.pivot(dims[1]))
            return piv.agg(mean(values[0])).orderBy(dims[0])
        aggs = [mean(v).alias(v) for v in values]
        return self._df.groupBy(*dims).agg(*aggs).orderBy(*dims)

    #: refuse to collect more than this many aggregated rows to the driver
    #: without an explicit override
    XARRAY_MAX_ROWS = 100_000

    def to_xarray_frame(self, values: str | list[str], *dims: str,
                        allow_large: bool = False) -> DataFrame:
        """The distributed half of :meth:`to_xarray`: the exact-mean
        aggregate plus the size guard, WITHOUT the driver-side collect.
        Returned as a DataFrame so it can feed a sink (or the correctness
        gate) directly; ``to_xarray`` collects it into a dense tensor.

        Refuses to certify an aggregate larger than ``XARRAY_MAX_ROWS``
        unless ``allow_large=True`` — the dense tensor lives on the driver,
        so an unbounded collect is an OOM footgun at scale. Uses the same
        exact-decimal mean as ``multid_pivot`` (float-determinism policy).
        """
        if isinstance(values, str):
            values = [values]
        agg = self._df.groupBy(*dims).agg(
            *[self._exact_mean(v).alias(v) for v in values]
        )
        if not allow_large:
            # the count job runs on the aggregate (post-shuffle, one row per
            # dim combination) — cheap relative to the collect it guards
            n = agg.limit(self.XARRAY_MAX_ROWS + 1).count()
            if n > self.XARRAY_MAX_ROWS:
                raise PuffbirdSparkError(
                    f"to_xarray would collect > {self.XARRAY_MAX_ROWS} "
                    f"aggregated rows to the driver; pass allow_large=True "
                    f"to override, or reduce the dims' cardinality"
                )
        return agg

    def to_xarray(self, values: str | list[str], *dims: str,
                  allow_large: bool = False):
        """Driver-side dense-tensor bridge for ``multid_pivot`` output
        (reference returns xarray, frame.py:1070-1075). Guard + aggregate
        live in :meth:`to_xarray_frame`; this adds only the collect and
        the xarray conversion."""
        try:
            import xarray as xr  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise PuffbirdSparkError(
                "xarray is not installed; to_xarray_frame() returns the "
                "aggregated DataFrame instead"
            ) from e
        if isinstance(values, str):
            values = [values]
        agg = self.to_xarray_frame(values, *dims, allow_large=allow_large)
        pdf = agg.toPandas().set_index(list(dims))
        ds = pdf.to_xarray()
        if len(values) == 1:
            return ds[values[0]]
        return ds
