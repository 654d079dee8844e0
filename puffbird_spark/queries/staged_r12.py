"""ROUND-12 STAGED GATES — written, oracle'd, and builder-validated in
round 11 but deliberately NOT imported by ``queries/__init__`` yet: the
r11 window is exactly the 50 never-driver-checked gates, so registering
these two would have left a never-checked backlog at round end (NOTES
r11 second session). The r12 opening move: add ``staged_r12`` to the
import list in ``queries/__init__.py``, re-run ``tools/next_window.py
--write``, and rehearse — both gates then head the window as
never-checked entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import load, query
from .llm_q import _bleu_oracle, _eval_pair_fixture  # noqa: F401

#: event-time TTL for the streaming inactivity gate (6 h in seconds):
#: at both driven SFs a healthy fraction of users have a trailing
#: inactivity gap above it (sf0.001: 9 of 15) and the rest below.
_TTL_SEC = 6 * 3600


def _corpus_bleu_oracle(max_n: int = 4) -> str:
    """Pooled replay of corpus_bleu over the same dropped-token fixture
    as eval_bleu: per-order matches and candidate totals sum over ALL
    pairs before the ratio; BP compares total lengths."""
    # reuse the per-order clipped-match CTEs from the sentence oracle by
    # rebuilding them here (import keeps one source of truth for the
    # fixture CTE; the match CTEs are regenerated with the same helper)
    from .llm_q import _EVAL_PAIR_SQL, _clip_match_sql

    tok_gram = ("[array_to_string({col}[i:i+{n}-1], ' ') "
                "FOR i IN range(1, len({col}) - {n} + 2)]")
    orders = ",".join(
        _clip_match_sql("b", "ct", "rt", n, tok_gram)
        for n in range(1, max_n + 1))
    munion = " UNION ALL ".join(
        f"SELECT {n} AS n, doc_id, mt FROM m{n}"
        for n in range(1, max_n + 1))
    ncols = ",".join(str(n) for n in range(1, max_n + 1))
    pcols = ",\n    ".join(
        f"MAX(CASE WHEN n = {n} THEN round(p, 6) END) AS p{n}"
        for n in range(1, max_n + 1))
    psel = ", ".join(f"p{n}" for n in range(1, max_n + 1))
    return f"""
WITH {_EVAL_PAIR_SQL},{orders},
mall AS (SELECT n, SUM(mt) AS m FROM ({munion}) GROUP BY n),
tall AS (SELECT n.n,
    SUM(GREATEST(len(b.ct) - n.n + 1, 0)) AS t,
    COUNT(*) AS pairs, SUM(len(b.ct)) AS sc, SUM(len(b.rt)) AS sr
  FROM b CROSS JOIN (SELECT unnest([{ncols}]) AS n) n GROUP BY 1),
pern AS (SELECT tall.n, tall.t, COALESCE(mall.m, 0) AS m,
    tall.pairs, tall.sc, tall.sr
  FROM tall LEFT JOIN mall ON mall.n = tall.n),
p AS (SELECT n, pairs, sc, sr,
    CASE WHEN t > 0 THEN CAST(m AS DOUBLE) / t ELSE 0.0 END AS p
  FROM pern),
agg AS (SELECT MAX(pairs) AS n_pairs, MAX(sc) AS sc, MAX(sr) AS sr,
    MIN(p) AS pmin,
    SUM(CASE WHEN p > 0
             THEN CAST(round(ln(p), 9) AS DECIMAL(20,9)) END) AS slog,
    {pcols}
  FROM p),
fin AS (SELECT n_pairs, sc, sr, {psel}, pmin, slog,
    CASE WHEN sc = 0 THEN 0.0
         WHEN sc >= sr THEN 1.0
         ELSE round(exp(1.0 - CAST(sr AS DOUBLE) / sc), 9) END AS bp
  FROM agg)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
  CAST(sc AS BIGINT) AS cand_tokens, CAST(sr AS BIGINT) AS ref_tokens,
  {psel}, round(bp, 6) AS bp,
  CASE WHEN pmin > 0 AND sc > 0
       THEN round(bp * exp(CAST(slog AS DOUBLE) / {max_n}.0), 6)
       ELSE 0.0 END AS bleu
FROM fin
"""


@query("eval_corpus_bleu", oracle=_corpus_bleu_oracle())
def eval_corpus_bleu(spark, sf_dir):
    """Corpus-level BLEU (`corpus_bleu`, operators/evaluation.py;
    Papineni et al. ACL 2002 exact micro-average) over the same
    dropped-token fixture as eval_bleu: matches and candidate totals
    pool over all 500 pairs before the per-order ratio, BP compares
    total lengths — one short pair dilutes instead of zeroing (the
    sentence/corpus distinction, unit- and property-pinned). One row;
    the oracle replays the pooled sums, the log ladder, and BP."""
    from ..operators.evaluation import corpus_bleu

    return corpus_bleu(
        _eval_pair_fixture(spark, sf_dir), "__cand", "__ref",
        id_col="doc_id", max_n=4)


@query("stream_state_ttl", oracle=f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
           WHERE user_id IS NOT NULL),
cut AS (SELECT (MIN(us) + MAX(us)) // 2 AS c, MAX(us) AS mx,
               (SELECT MAX(us) FROM e WHERE us < (SELECT (MIN(us) + MAX(us)) // 2 FROM e)) AS mxb0
        FROM e),
per AS (SELECT user_id, MIN(us) AS first_us, MAX(us) AS last_us,
               COUNT(*) AS n FROM e GROUP BY 1)
SELECT per.user_id,
  per.first_us AS first_seen_us, per.last_us AS last_seen_us,
  CAST(per.n AS BIGINT) AS n_events,
  CAST(CASE WHEN per.last_us // 1000 + {_TTL_SEC * 1000}
                 < cut.mxb0 // 1000
            THEN cut.mxb0 // 1000
            ELSE cut.mx // 1000 END AS BIGINT) AS expired_at_wm_ms
FROM per CROSS JOIN cut
WHERE per.last_us // 1000 + {_TTL_SEC * 1000} < cut.mx // 1000
""")
def stream_state_ttl(spark, sf_dir):
    """TRUE streaming event-time state TTL (`ttl_inactivity_tracker`,
    streaming/stateful.py): per-user activity state expires when the
    watermark passes last-activity + 6 h, emitting one final row per
    expired user — the dormant-entity emission. Replay: two
    deterministic halves cut at the LITERAL midpoint timestamp
    (oracle-computable, unlike a sampled range partitioner); after the
    last file the engine's automatic no-data micro-batch
    (spark.sql.streaming.noDataMicroBatches, default on) advances the
    watermark to the final event time and fires the remaining eligible
    timeouts — no sentinel needed (a far-future sentinel would push
    the final watermark past EVERY user and evict all of them). The
    oracle's visibility rule: a user is emitted iff last_ms + ttl_ms <
    final watermark (ms-floored, strict — the engine's event-time
    timeout predicate), with state always the user's FULL history (a
    mid-stream evictee has no later events by construction; an
    active-in-both-halves user cannot time out at the half boundary);
    the recorded watermark is the half-boundary one for early
    evictions, the global one otherwise."""
    import os
    import shutil
    import time as _time

    from ..sources import normalize_nano_ts
    from ..streaming import write_foreach_batch
    from ..streaming.stateful import ttl_inactivity_tracker

    tag = sf_dir.rstrip("/").replace("/", "_")
    base = f"/tmp/pbs_strttl{tag}"
    out_dir = f"{base}/out"
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        shutil.rmtree(base, ignore_errors=True)
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        ev = normalize_nano_ts(raw, ["ts"]).filter(
            F.col("user_id").isNotNull()
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        lo, hi = ev.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).collect()[0]
        cut = (int(lo) + int(hi)) // 2
        stages = [
            ev.filter(F.unix_micros("ts") < cut),
            ev.filter(F.unix_micros("ts") >= cut),
        ]
        os.makedirs(f"{base}/in", exist_ok=True)
        for i, sdf in enumerate(stages):
            tmp = f"{base}/stage{i}"
            sdf.coalesce(1).write.parquet(tmp)
            part = next(f for f in os.listdir(tmp)
                        if f.endswith(".parquet"))
            shutil.copy(f"{tmp}/{part}", f"{base}/in/b{i}.parquet")
            _time.sleep(1.1)  # distinct whole-second mtimes
        src = (spark.readStream.schema("user_id long, ts timestamp")
               .option("maxFilesPerTrigger", 1).parquet(f"{base}/in"))
        expired = ttl_inactivity_tracker(
            src, key="user_id", ts_col="ts", ttl_sec=_TTL_SEC)

        def sink(df, epoch_id):
            df.write.mode("append").parquet(out_dir)

        q = write_foreach_batch(
            expired, sink, checkpoint=f"{base}/ckpt", trigger_once=True,
            output_mode="append").start()
        q.awaitTermination(300)
    return spark.read.parquet(out_dir).select(
        "user_id", "first_seen_us", "last_seen_us", "n_events",
        "expired_at_wm_ms")
