"""ROUND-15 STAGED GATES — written, oracle'd, and validated in round
14 but deliberately NOT imported by ``queries/__init__`` yet (the
r11..r14 staging pattern keeps each round's driver window clean): the
r15 opener is mechanical — add ``staged_r15`` to the import list,
re-run ``tools/next_window.py --write``, rehearse.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import load, query

_TGA_ORACLE = """
WITH d AS (SELECT CAST(doc_id AS VARCHAR) AS path, doc_id % 997 AS s,
    doc_id % 2 = 0 AS gray,
    (doc_id // 2) % 2 = 1 AS rle,
    doc_id % 2 = 1 AND (doc_id // 8) % 2 = 1 AS alpha,
    5 + (doc_id % 997) % 12 AS w, 4 + (doc_id % 997) % 8 AS h
  FROM documents),
xs AS (SELECT *, unnest(range(w)) AS x FROM d),
pix AS (SELECT *, unnest(range(h)) AS y FROM xs),
v AS (SELECT path, gray, rle, alpha, w, h, s,
    CASE WHEN gray THEN (s + 3 * x + 7 * y) % 256
         ELSE (s + x + y) % 256 END AS r,
    CASE WHEN gray THEN (s + 3 * x + 7 * y) % 256
         ELSE (2 * s + 2 * x + y) % 256 END AS g,
    CASE WHEN gray THEN (s + 3 * x + 7 * y) % 256
         ELSE (3 * s + x + 2 * y) % 256 END AS b
  FROM pix)
SELECT path,
  CAST(MAX(w) AS INT) AS width, CAST(MAX(h) AS INT) AS height,
  CAST(CASE WHEN MAX(CAST(gray AS INT)) = 1 THEN 1
            WHEN MAX(CAST(alpha AS INT)) = 1 THEN 4
            ELSE 3 END AS INT) AS channels,
  MAX(rle) AS rle,
  CAST(COUNT(*) AS BIGINT) AS n_px,
  CAST(SUM(r) AS BIGINT) AS sum_r,
  CAST(SUM(g) AS BIGINT) AS sum_g,
  CAST(SUM(b) AS BIGINT) AS sum_b,
  CAST(MAX(s) % 256 AS INT) AS first_r,
  CAST(CASE WHEN MAX(CAST(gray AS INT)) = 1 THEN MAX(s) % 256
            ELSE (2 * MAX(s)) % 256 END AS INT) AS first_g,
  CAST(CASE WHEN MAX(CAST(gray AS INT)) = 1 THEN MAX(s) % 256
            ELSE (3 * MAX(s)) % 256 END AS INT) AS first_b
FROM v GROUP BY path
"""


@query("multimodal_tga", oracle=_TGA_ORACLE)
def multimodal_tga(spark, sf_dir):
    """TGA/TARGA decode (`decode_tga` + `tga_stats`,
    operators/multimodal.py; Truevision TGA 2.0) — REAL decodes
    rotating gray/truecolor x raw/RLE x alpha x BOTH vertical
    origins by doc-id bits: the decoder must normalize BGR(A)→RGB(A)
    and bottom-up→top-down, and the released top-left pixel is what
    makes the row flip and channel swap hash-detectable (channel
    sums alone are order-agnostic). RLE fixtures alternate run and
    raw packets. Arrow mapInPandas media shape, zero shuffle."""
    from ..operators.dedup import widen_parallelism
    from ..operators.multimodal import encode_tga, tga_stats

    def _make(doc_id):
        def one(i):
            i = int(i)
            gray = i % 2 == 0
            return encode_tga(
                5 + i % 997 % 12, 4 + i % 997 % 8, seed=i % 997,
                gray=gray, rle=(i // 2) % 2 == 1,
                alpha=(not gray) and (i // 8) % 2 == 1,
                top_down=(i // 4) % 2 == 1)
        return doc_id.map(one)

    make_tga = F.pandas_udf(_make, returnType="binary")
    docs = widen_parallelism(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("string").alias("path"),
        make_tga(F.col("doc_id")).alias("content"))
    return tga_stats(docs)


_COCHRAN_ORACLE = """
WITH b AS (SELECT doc_id % 100 AS blk, doc_id // 100 AS trt,
    CASE WHEN length(text) % 2 = 0 THEN 1 ELSE 0 END AS y
  FROM documents WHERE doc_id < 300 AND text IS NOT NULL),
cj AS (SELECT trt, SUM(CAST(y AS HUGEINT)) AS c FROM b GROUP BY trt),
ri AS (SELECT blk, SUM(CAST(y AS HUGEINT)) AS r FROM b GROUP BY blk),
cc AS (SELECT SUM(c * c) AS csq, SUM(c) AS t1 FROM cj),
rr AS (SELECT SUM(r * r) AS rsq, COUNT(*) AS nb FROM ri)
SELECT CAST(nb AS BIGINT) AS n_blocks, CAST(3 AS BIGINT) AS k,
  CASE WHEN 3 * t1 - rsq > 0
       THEN round(CAST(2 * (3 * csq - t1 * t1) AS DOUBLE)
                  / CAST(3 * t1 - rsq AS DOUBLE), 6) END AS q_stat
FROM cc, rr
"""


@query("diag_cochran_q", oracle=_COCHRAN_ORACLE)
def diag_cochran_q(spark, sf_dir):
    """Cochran's Q (`cochran_q`, operators/drift.py; Cochran 1950) —
    the binary repeated-measures k-treatment test (`diag_friedman`
    for pass/fail outcomes: k models judged on the same prompts).
    Fixture: the shared doc_id<300 COMPLETE 100x3 design with
    outcome = even text length. All-integer expanded form
    (k−1)(kΣC² − T²)/(kT − ΣR²) in decimal(38,0); the completeness
    contract validates up front."""
    from ..operators.drift import cochran_q

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300)
    fx = docs.select(
        (F.col("doc_id") % 100).alias("blk"),
        F.floor(F.col("doc_id") / 100).cast("long").alias("trt"),
        (F.length("text") % 2 == 0).alias("y"))
    return cochran_q(fx, "blk", "trt", "y")


_ISOTONIC_ORACLE = """
WITH RECURSIVE src AS (SELECT value - floor(value) AS p,
    CASE WHEN event_type IN ('purchase', 'signup') THEN 1 ELSE 0 END
      AS y
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
    AND NOT isnan(value)),
pb AS (SELECT LEAST(CAST(floor(
          GREATEST(LEAST(p, 1.0), 0.0) * 20) AS INT), 19) AS bin,
    COUNT(*) AS n, SUM(y) AS pos
  FROM src GROUP BY 1),
ob AS (SELECT bin, n, pos, row_number() OVER (ORDER BY bin) AS o
       FROM pb),
init AS (SELECT list(pos ORDER BY bin) AS posl,
                list(n ORDER BY bin) AS nl,
                [1 FOR x IN range(0, count(*))] AS cntl
         FROM ob),
r AS (
  SELECT 0 AS step, posl, nl, cntl FROM init
  UNION ALL
  SELECT step + 1,
    CASE WHEN v IS NULL THEN posl
         ELSE posl[1:v-1] || [posl[v] + posl[v+1]] || posl[v+2:] END,
    CASE WHEN v IS NULL THEN nl
         ELSE nl[1:v-1] || [nl[v] + nl[v+1]] || nl[v+2:] END,
    CASE WHEN v IS NULL THEN cntl
         ELSE cntl[1:v-1] || [cntl[v] + cntl[v+1]] || cntl[v+2:] END
  FROM (
    SELECT step, posl, nl, cntl,
      list_position(
        [posl[i] * nl[i+1] > posl[i+1] * nl[i]
         FOR i IN range(1, len(posl))], true) AS v
    FROM r WHERE step < 20)
),
fin AS (SELECT posl, nl, cntl FROM r WHERE step = 20),
pools AS (SELECT j, posl[j] AS ppos, nl[j] AS pn,
    CASE WHEN j = 1 THEN 0 ELSE list_sum(cntl[1:j-1]) END AS lo,
    list_sum(cntl[1:j]) AS hi
  FROM fin, (SELECT unnest(range(1, 21)) AS j)
  WHERE j <= len(posl))
SELECT ob.bin, CAST(ob.n AS BIGINT) AS n,
  CAST(ob.pos AS BIGINT) AS pos,
  round(CAST(ob.pos AS DOUBLE) / ob.n, 6) AS rate_raw,
  round(CAST(p.ppos AS DOUBLE) / p.pn, 6) AS rate_iso
FROM ob JOIN pools p ON ob.o > p.lo AND ob.o <= p.hi
"""


@query("eval_isotonic_calibration", oracle=_ISOTONIC_ORACLE)
def eval_isotonic_calibration(spark, sf_dir):
    """Isotonic (PAV) calibration over 20 score bins
    (`isotonic_calibration`, operators/evaluation.py; Ayer 1955,
    Zadrozny & Elkan KDD'02) — the recalibration map beside
    `eval_calibration_bins`' reliability diagram, over the
    `eval_probabilistic` fixture (fractional event value as p,
    conversion types as y). One keyed agg collapses the corpus to
    ≤20 integer triples; PAV pools driver-side with EXACT
    integer-fraction comparisons (unique weighted-L2 solution, so
    merge order is immaterial); the oracle replays the pooling as a
    leftmost-violation recursive CTE on the same integers and both
    releases round HALF_UP on the double."""
    from ..operators.evaluation import isotonic_calibration

    ev = load(spark, sf_dir, "events")
    return isotonic_calibration(
        ev, F.col("value") - F.floor("value"),
        F.col("event_type").isin("purchase", "signup"), n_bins=20)


_PAGE_ORACLE = """
WITH b AS (SELECT doc_id % 100 AS blk, doc_id // 100 AS trt,
    length(text) AS v
  FROM documents WHERE doc_id < 300 AND text IS NOT NULL),
r AS (SELECT blk, trt,
    2 * rank() OVER (PARTITION BY blk ORDER BY v)
      + count(*) OVER (PARTITION BY blk, v) - 1 AS u
  FROM b),
pt AS (SELECT trt, SUM(CAST(u AS HUGEINT)) AS uj FROM r GROUP BY 1),
o AS (SELECT uj, row_number() OVER (ORDER BY trt) AS ordr FROM pt)
SELECT CAST(100 AS BIGINT) AS n_blocks, CAST(3 AS BIGINT) AS k,
  CAST(SUM(ordr * uj) AS DOUBLE) / 2.0 AS l_stat,
  1200.0 AS l_expect
FROM o
"""


@query("diag_page_trend", oracle=_PAGE_ORACLE)
def diag_page_trend(spark, sf_dir):
    """Page's ordered-alternative trend test (`page_test`,
    operators/drift.py; Page 1963) — does text length INCREASE
    across the three ordered treatments of the shared 100x3 design
    (diag_friedman asks "any difference", Page buys power from the
    order): L = Σ order_j·R_j over tie-general doubled midranks
    (exact integers, one halving at release), plus the tabulated
    null expectation n·k(k+1)²/4; all friedman contracts
    inherited."""
    from ..operators.drift import page_test

    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 300) & F.col("text").isNotNull())
    return page_test(
        docs.select(
            (F.col("doc_id") % 100).alias("blk"),
            (F.col("doc_id") / 100).cast("long").alias("trt"),
            F.length("text").alias("score")),
        "blk", "trt", "score")


_MASE_ORACLE = """
WITH b AS (SELECT user_id AS e,
    CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS HUGEINT) AS y,
    CAST(CAST(floor(value / 50 + 0.5) * 50 AS DECIMAL(20,6))
      * 1000000 AS HUGEINT) AS f,
    ts, event_id
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
s AS (SELECT e, y, f, lag(y, 1) OVER w AS p
  FROM b WINDOW w AS (PARTITION BY e ORDER BY ts, event_id)),
a AS (SELECT e, CAST(COUNT(*) AS HUGEINT) AS n,
    SUM(abs(y - f)) AS se,
    SUM(CASE WHEN p IS NOT NULL THEN abs(y - p) END) AS sd
  FROM s GROUP BY 1)
SELECT e AS user_id, CAST(n AS BIGINT) AS n,
  CASE WHEN n >= 2 AND n * sd > 0
       THEN CAST((n - 1) * se AS DOUBLE) / CAST(n * sd AS DOUBLE)
  END AS mase
FROM a
"""


@query("timeseries_mase", oracle=_MASE_ORACLE)
def timeseries_mase(spark, sf_dir):
    """Per-entity Mean Absolute Scaled Error (`mase`,
    operators/timeseries.py; Hyndman & Koehler 2006) — how much
    better than lag-1 persistence the 50-unit quantizer "forecast"
    tracks each user's event values: the scale-free forecast metric
    as one exact integer ratio (n−1)·Σ|e| / (n·Σ|Δy|) over scaled
    integers, raw-double release, the ACF ordering contract; NULL
    for constant series (nothing to scale by)."""
    from ..operators.timeseries import mase

    ev = load(spark, sf_dir, "events")
    return mase(
        ev.select(
            "user_id", "ts", "event_id",
            F.col("value").alias("actual"),
            (F.floor(F.col("value") / 50 + 0.5) * 50)
            .cast("double").alias("fc")),
        "user_id", "ts", "actual", "fc", order_tiebreak="event_id")
