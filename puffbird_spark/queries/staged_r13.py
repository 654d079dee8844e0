"""ROUND-13 STAGED GATES — written, oracle'd, and validated in round 12
but deliberately NOT imported by ``queries/__init__`` yet (the r11/r12
staging pattern): the r12 window already carries 17 never-checked
entries, and these two keep the r13 opener mechanical — add
``staged_r13`` to the import list, re-run ``tools/next_window.py
--write``, rehearse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import load, query

_FLEISS_ORACLE = """
WITH base AS (SELECT event_id // 4 AS u, event_type AS c FROM events),
uc AS (SELECT u, c, COUNT(*) AS nuc FROM base GROUP BY 1, 2),
pu AS (SELECT u, SUM(nuc) AS n,
         SUM(CAST(nuc AS HUGEINT) * CAST(nuc AS HUGEINT)) AS sq
       FROM uc GROUP BY 1),
obs AS (SELECT COUNT(*) AS nu,
    SUM(CAST(round((CAST(sq AS DOUBLE) - 4) / (4 * 3), 9)
        AS DECIMAL(20,9))) AS pusum
  FROM pu),
cat AS (SELECT c, SUM(nuc) AS nc FROM uc GROUP BY 1),
esq AS (SELECT SUM(CAST(nc AS HUGEINT) * CAST(nc AS HUGEINT)) AS s
        FROM cat),
f AS (SELECT nu, CAST(pusum AS DOUBLE) / nu AS pbar,
    CAST(s AS DOUBLE) / ((CAST(nu AS DOUBLE) * 4)
                         * (CAST(nu AS DOUBLE) * 4)) AS pe
  FROM obs, esq)
SELECT CAST(nu AS BIGINT) AS n_units, CAST(4 AS BIGINT) AS n_raters,
  round(pbar, 6) AS p_bar, round(pe, 6) AS p_e,
  CASE WHEN pe < 1 THEN round((pbar - pe) / (1 - pe), 6) END AS kappa
FROM f
"""


@query("eval_fleiss_kappa", oracle=_FLEISS_ORACLE)
def eval_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa over a fixed 4-rater panel (`fleiss_kappa`,
    operators/evaluation.py; Fleiss 1971): per-unit agreement from
    category count squares vs squared category marginals. Fixture:
    every 4 consecutive events form one unit (event_id // 4 — the
    panel-size contract holds exactly at both driver SFs), rated with
    their event_type. One count aggregation + two tiny folds."""
    from ..operators.evaluation import fleiss_kappa

    # integer `div`, never double division (the round-9 hour-bucket
    # lesson): exact at any id magnitude; event_id is non-negative in
    # every driver table, where `div` and the oracle's `//` coincide
    ev = load(spark, sf_dir, "events").select(
        F.expr("event_id div 4").alias("unit"),
        F.col("event_type").alias("value"))
    return fleiss_kappa(ev, "unit", "value")


_MCC_ORACLE = """
WITH b AS (SELECT value > 10 AS y, value > 8 AS p FROM events
           WHERE value IS NOT NULL),
t AS (SELECT
    SUM(CASE WHEN y AND p THEN 1 ELSE 0 END) AS tp,
    SUM(CASE WHEN NOT y AND p THEN 1 ELSE 0 END) AS fp,
    SUM(CASE WHEN NOT y AND NOT p THEN 1 ELSE 0 END) AS tn,
    SUM(CASE WHEN y AND NOT p THEN 1 ELSE 0 END) AS fn
  FROM b)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
  CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
  CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
        AND tn + fn > 0
       THEN round(CAST(CAST(tp AS HUGEINT) * tn
                       - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                  / sqrt(CAST(tp + fp AS DOUBLE)
                         * CAST(tp + fn AS DOUBLE)
                         * CAST(tn + fp AS DOUBLE)
                         * CAST(tn + fn AS DOUBLE)), 6)
  END AS mcc
FROM t
"""


@query("eval_mcc", oracle=_MCC_ORACLE)
def eval_mcc(spark, sf_dir):
    """Matthews correlation coefficient (`mcc_binary`,
    operators/evaluation.py; Matthews 1975) — the imbalance-honest
    confusion-matrix summary: exact long cells from one aggregation
    pass, IEEE-exact sqrt, NULL on a degenerate marginal. Fixture: a
    threshold 'classifier' (value > 8) scored against a stricter
    truth (value > 10) — all four cells populated, MCC strongly
    positive."""
    from ..operators.evaluation import mcc_binary

    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull())
    return mcc_binary(
        ev, F.col("value") > 10, F.col("value") > 8)
