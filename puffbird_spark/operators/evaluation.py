"""Retrieval-evaluation metrics — the scorecard for every similarity /
search operator in this engine (exact, LSH, IVF, SQ, PQ, RP): given a
ranked result set and a relevance-truth table, compute per-query
recall@k, MRR@k, and nDCG@k and their macro averages, distributed.

The ANN gates assert a recall floor inline; real retrieval work needs
the full scorecard over big query sets, where the eval itself must be
distributed: millions of queries x k results join a relevance table —
two keyed joins and two keyed aggregations here, nothing driver-side.

Determinism policy (the house rules): ranks are explicit and
deterministic (callers derive them with a score-desc + id tie-break
window), per-query metrics are rounded to 9 dp and decimal-snapped so
macro sums are exact and partitioning-independent, macro means round
to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def ir_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    doc_col: str = "cand_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Macro-averaged retrieval metrics over the queries of ``truth``:

    - ``recall_at_k`` — relevant retrieved in the top k / total
      relevant (plain recall@k: queries with more than k relevant docs
      cannot reach 1.0 — documented, standard);
    - ``mrr_at_k`` — 1 / rank of the first relevant hit (0 if none);
    - ``ndcg_at_k`` — binary-relevance DCG over the hits divided by
      the ideal DCG of ``min(k, n_relevant)`` front-loaded hits.

    ``results`` carries (query, doc, rank 1..k); ``truth`` carries
    (query, doc) relevant pairs. Queries present in ``truth`` but
    absent from ``results`` score 0 on every metric — a retrieval
    system that answers nothing must not be graded only on what it
    answered. Returns ONE row: ``(n_queries, recall_at_k, mrr_at_k,
    ndcg_at_k)``.
    """
    r = results.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__rank"),
    ).filter(F.col("__rank") <= k)
    t = truth.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"))
    rel = t.groupBy("__q").agg(F.count(F.lit(1)).alias("__rel"))
    hits = (
        r.join(t, ["__q", "__d"])
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("__hits"),
            F.min("__rank").alias("__first"),
            F.sum(1.0 / F.log2(F.col("__rank") + 1)).alias("__dcg"),
        )
    )
    m = F.least(F.col("__rel"), F.lit(k))
    idcg = F.aggregate(
        F.sequence(F.lit(1), m),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i + 1),
    )
    dec = "decimal(20,9)"
    per_q = (
        rel.join(hits, "__q", "left")
        .select(
            "__q",
            F.round(
                F.coalesce(F.col("__hits"), F.lit(0)) / F.col("__rel"), 9
            ).cast(dec).alias("__recall"),
            F.round(
                F.coalesce(1.0 / F.col("__first"), F.lit(0.0)), 9
            ).cast(dec).alias("__mrr"),
            F.round(
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg, 9
            ).cast(dec).alias("__ndcg"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.sum("__recall").cast("double") / F.count(F.lit(1)), 6)
        .alias("recall_at_k"),
        F.round(F.sum("__mrr").cast("double") / F.count(F.lit(1)), 6)
        .alias("mrr_at_k"),
        F.round(F.sum("__ndcg").cast("double") / F.count(F.lit(1)), 6)
        .alias("ndcg_at_k"),
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Precision/recall/F1 at a fixed threshold grid — the operating-
    point companion of the threshold-free AUC scorecard: one row per
    threshold with exact integer TP/FP/FN and the derived ratios.

    Shape: ONE aggregation pass over the scored frame computing every
    threshold's counts as conditional sums (no per-threshold scan, no
    sort — an exact-sorted PR curve needs a global rank; a fixed grid
    is what monitoring dashboards pin anyway), then a tiny literal
    threshold table cross-joined against the 1-row totals. All counts
    integral, ratios exact divisions rounded at ``round_dp``;
    zero-denominator cells read NULL (no predictions / no positives is
    "undefined", not 0)."""
    ts = thresholds or [round(0.1 * i, 1) for i in range(1, 10)]
    s = F.col(score_col)
    y = F.col(label_col).cast("long")
    aggs = [F.sum(y).alias("__pos"), F.count(F.lit(1)).alias("__n")]
    for i, t in enumerate(ts):
        pred = (s >= F.lit(float(t))).cast("long")
        aggs.append(F.sum(pred * y).alias(f"__tp{i}"))
        aggs.append(F.sum(pred).alias(f"__pp{i}"))
    tot = scored.agg(*aggs)
    structs = []
    for i, t in enumerate(ts):
        tp = F.col(f"__tp{i}")
        pp = F.col(f"__pp{i}")
        pos = F.col("__pos")
        prec = F.when(pp > 0, F.round(tp.cast("double") / pp, round_dp))
        rec = F.when(pos > 0, F.round(tp.cast("double") / pos, round_dp))
        f1 = F.when(
            (pp + pos) > 0,
            F.round(2.0 * tp.cast("double") / (pp + pos), round_dp),
        )
        structs.append(F.struct(
            F.lit(float(t)).alias("threshold"),
            tp.cast("long").alias("tp"),
            (pp - tp).cast("long").alias("fp"),
            (pos - tp).cast("long").alias("fn"),
            prec.alias("precision"),
            rec.alias("recall"),
            f1.alias("f1"),
        ))
    # one explode over the single aggregated row — NOT a per-threshold
    # union, which would rescan the input once per grid point
    return tot.select(
        F.explode(F.array(*structs)).alias("__r")
    ).select("__r.*")
