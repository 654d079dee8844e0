"""UDF surface (SURVEY §2.2 UDF rows; generalizes R7/R8) + variant
explosion over real JSON data.

The Python-boundary rules at scale: Arrow-batched pandas UDFs only, integer
or decimal arithmetic inside the kernel so results are order-independent and
oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..variant import explode_variant
from .base import load, query


@query("udf_pandas_scalar", oracle="""
SELECT l_orderkey, l_linenumber,
  CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net_price
FROM lineitem
""")
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar pandas UDF (Arrow path, R7 generalization):
    decimal-exact net price computed in pandas."""
    from decimal import Decimal

    @F.pandas_udf("double")
    def net(price: pd.Series, disc: pd.Series) -> pd.Series:
        one = Decimal(1)
        return pd.Series(
            float(Decimal(str(p)) * (one - Decimal(str(d))))
            for p, d in zip(price, disc)
        )

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        net(F.col("l_extendedprice"), F.col("l_discount")).alias("net_price"),
    )


@query("udf_grouped_agg", oracle="""
SELECT l_returnflag,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem GROUP BY l_returnflag
""")
def udf_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDF — integer arithmetic so group order doesn't
    matter."""

    @F.pandas_udf("long")
    def total_qty(qty: pd.Series) -> int:
        return int(qty.astype("int64").sum())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        total_qty(F.col("l_quantity")).alias("total_qty")
    )


@query("udf_apply_in_pandas", oracle="""
SELECT o_custkey,
  COUNT(*) AS n_orders,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_custkey
""")
def udf_apply_in_pandas(spark, sf_dir):
    """Grouped-map applyInPandas (R8+R11 fusion): whole-group pandas kernel
    per customer."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [len(pdf)],
            "min_price": [pdf["o_totalprice"].min()],
            "max_price": [pdf["o_totalprice"].max()],
        })

    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").applyInPandas(
        per_group,
        "o_custkey long, n_orders long, min_price double, max_price double",
    )


@query("variant_props", oracle="""
WITH t AS (SELECT event_id, props FROM events WHERE props IS NOT NULL)
SELECT event_id,
  unnest(json_keys(props)) AS props_level0,
  json_extract_string(props, '$.' || unnest(json_keys(props))) AS props
FROM t
""")
def variant_props(spark, sf_dir):
    """Variant explosion (per-row dynamic dispatch) over the real JSON
    props column — the ragged-nesting path of to_long on relational data."""
    ev = load(spark, sf_dir, "events").select("event_id", "props")
    out, _ = explode_variant(ev, ["event_id"], "props", max_depth=1)
    return out


@query("udf_udtf", oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 50)
SELECT doc_id,
  CAST(unnest(range(0, len(toks))) AS INT) AS pos,
  unnest(toks) AS token,
  CAST(unnest(list_transform(toks, x -> length(x))) AS INT) AS token_len
FROM t
""")
def udf_udtf(spark, sf_dir):
    """Python UDTF (table function) via LATERAL — the arbitrary-arity
    row-generator escape hatch. Deliberately bounded input (50 docs): a
    row-based Python UDTF is the SLOW path; the native twin is
    explode_tokens. Gate-checked so the UDTF surface has oracle evidence."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, token_len int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield i, w, len(w)

    spark.udtf.register("pbs_split_words", SplitWords)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("pbs_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.pos, s.token, s.token_len
        FROM pbs_udtf_docs d, LATERAL pbs_split_words(d.text) s
    """)
