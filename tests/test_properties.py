"""Property-based tests (SURVEY §5.3) with hypothesis: explode/nest
round-trip invariants over randomized nested tables."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from puffbird_spark import FrameEngine

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10 ** 6),          # k (unique-ified below)
        st.lists(st.integers(min_value=-100, max_value=100),  # xs
                 max_size=6),
        st.dictionaries(st.sampled_from(["a", "b", "c"]),     # m
                        st.integers(min_value=0, max_value=9),
                        max_size=3),
    ),
    min_size=1,
    max_size=12,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("xs", T.ArrayType(T.LongType())),
    T.StructField("m", T.MapType(T.StringType(), T.LongType())),
])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_explode_counts_and_roundtrip(spark, rows):
    # unique keys (hypothesis may duplicate k)
    rows = [(i, xs, m) for i, (_, xs, m) in enumerate(rows)]
    df = spark.createDataFrame(rows, SCHEMA)
    eng = FrameEngine(df, indexcols=["k"], validate=False)

    # invariant 1: explode row count = sum of cell cardinalities
    long_xs = eng.to_long("xs")
    assert long_xs.count() == sum(len(xs) for _, xs, _ in rows)
    long_m = eng.to_long("m", max_depth=1)
    assert long_m.count() == sum(len(m) for _, _, m in rows)

    # invariant 2: key columns functionally determine original rows —
    # re-nesting recovers the original multisets (empty cells drop)
    back = FrameEngine(long_xs, indexcols=["k", "xs_level0"], validate=False)
    rt = back.to_puffy("k", sort_by=["xs_level0"])
    got = {r["k"]: list(r["xs"]) for r in rt.table.collect()}
    expected = {k: xs for k, xs, _ in rows if xs}
    assert got == expected

    # invariant 3: map explode preserves key->value pairs exactly
    pairs = {(r["k"], r["m_level0"], r["m"]) for r in long_m.collect()}
    expected_pairs = {(k, mk, mv) for k, _, m in rows for mk, mv in m.items()}
    assert pairs == expected_pairs


PACK_ROWS = st.lists(
    st.integers(min_value=1, max_value=120),  # token counts
    min_size=1, max_size=40,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=PACK_ROWS, budget=st.integers(min_value=16, max_value=96))
def test_pack_greedy_invariants(spark, toks, budget):
    """Greedy packing invariants on random corpora: pack ids are
    contiguous from 0 per shard; fill never exceeds the budget except for
    a single oversized doc alone in its pack; docs stay in id order
    within packs."""
    from puffbird_spark.operators.packing import pack_greedy
    from pyspark.sql import functions as F

    rows = [(i, "w " * n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_greedy(df, F.split("text", " "), budget=budget,
                      shards=3).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        packs = {}
        for r in docs:
            packs.setdefault(r["pack_id"], []).append(r)
        # contiguous pack ids from 0
        assert sorted(packs) == list(range(len(packs)))
        prev_max_doc = -1
        for pid in sorted(packs):
            members = packs[pid]
            total = sum(m["n_tokens"] for m in members)
            # over-budget packs may only be a single oversized doc
            if total > budget:
                assert len(members) == 1 and members[0]["n_tokens"] > budget
            # final member's pack_fill equals the pack total
            assert members[-1]["pack_fill"] == total
            # id order: every doc in this pack comes after the previous pack
            for m in members:
                assert m["doc_id"] > prev_max_doc
            prev_max_doc = max(m["doc_id"] for m in members)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.one_of(st.none(), st.integers(min_value=0, max_value=200)),
    min_size=1, max_size=25))
def test_filter_audit_partitions_any_corpus(spark, vals):
    """Invariants: first-fail counts always partition the corpus;
    survivors == rows passing every rule; n_fail_any >= n_first_fail."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.filters import (
        KEPT, apply_filters, filter_audit)

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    rules = [
        ("low", F.col("v") >= 20),
        ("high", F.col("v") <= 150),
        ("odd", F.col("v") % 2 == 1),
    ]
    audit = {r["rule"]: (r["n_first_fail"], r["n_fail_any"])
             for r in filter_audit(df, rules).collect()}
    assert sum(v[0] for v in audit.values()) == len(rows)
    assert all(v[1] >= v[0] for k, v in audit.items() if k != KEPT)
    expect_kept = [
        i for i, v in rows
        if v is not None and 20 <= v <= 150 and v % 2 == 1]
    assert audit[KEPT][0] == len(expect_kept)
    got = sorted(r["id"] for r in apply_filters(df, rules).collect())
    assert got == expect_kept


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(digits=st.lists(
    st.text(alphabet="0123456789", min_size=1, max_size=20),
    min_size=1, max_size=15))
def test_luhn_matches_reference_on_any_digits(spark, digits):
    from puffbird_spark.functions.text import luhn_valid

    def ref(s):
        total = 0
        for i, ch in enumerate(reversed(s)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - 9 if d * 2 > 9 else d * 2
            total += d
        return total % 10 == 0

    df = spark.createDataFrame([(s,) for s in digits], ["s"])
    got = {r["s"]: r["v"] for r in df.select(
        "s", luhn_valid("s").alias("v")).collect()}
    for s in digits:
        assert got[s] == ref(s), s


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=-1000, max_value=1000,
              allow_nan=False, allow_infinity=False),
    min_size=4, max_size=40, unique=True))
def test_quantile_buckets_monotone_and_total(spark, vals):
    """Every row gets exactly one bucket; buckets are monotone in the
    value; all four buckets are within one of n/4 in size."""
    from puffbird_spark.operators.splits import quantile_buckets

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"]: r["phase"]
           for r in quantile_buckets(df, "v", bucket_col="phase").collect()}
    assert len(got) == len(rows)
    ordered = sorted(rows, key=lambda t: t[1])
    phases = [got[i] for i, _ in ordered]
    assert phases == sorted(phases)          # monotone in value
    assert set(phases) <= {1, 2, 3, 4}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(
    st.tuples(st.integers(min_value=0, max_value=2),      # key
              st.integers(min_value=0, max_value=5000),   # minute offset
              st.floats(min_value=-10, max_value=10,
                        allow_nan=False)),
    min_size=1, max_size=30))
def test_gap_fill_grid_contiguous_and_total(spark, events):
    """For any event set: each key's hourly grid is contiguous from its
    first to last bucket, every bucket has a filled value, and observed
    bucket count equals the key's distinct event hours."""
    import datetime as dt

    from puffbird_spark.operators.timeseries import gap_fill

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, k, t0 + dt.timedelta(minutes=m), v)
            for i, (k, m, v) in enumerate(events)]
    df = spark.createDataFrame(rows, ["event_id", "k", "ts", "v"])
    out = gap_fill(df, ["k"], "ts", "v", step="hour",
                   tiebreak_cols=["event_id"]).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["k"], []).append(r)
    for k, rs in per_key.items():
        hours = sorted(r["bucket_ts"] for r in rs)
        spans = [(b - a) for a, b in zip(hours, hours[1:])]
        assert all(s == dt.timedelta(hours=1) for s in spans), k
        assert all(r["filled_value"] is not None for r in rs)
        expect_obs = {
            (m // 60) for kk, m, _ in events if kk == k}
        assert sum(1 for r in rs if r["is_observed"]) == len(expect_obs)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(
    st.one_of(st.none(),
              st.text(alphabet="ab ", min_size=0, max_size=12)),
    min_size=1, max_size=15))
def test_dedup_weights_mass_equals_distinct_contents(spark, texts):
    from puffbird_spark.operators.dedup import dedup_weights

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_weights(df, "text", "doc_id").collect()
    assert len(out) == len(rows)                       # nothing dropped
    total = sum(r["weight"] for r in out)
    n_distinct = len({t for t in texts})               # None is one bucket
    assert abs(total - n_distinct) < 1e-4 * max(1, len(rows))


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(perm_seed=st.integers(min_value=0, max_value=1000))
def test_funnel_depth_invariant_to_row_order(spark, perm_seed):
    """Funnel depth is a function of (ts, tiebreak)-ordered events —
    shuffling input row order must not change it."""
    import datetime as dt
    import random

    from puffbird_spark.operators.sessionize import funnel_depths

    t0 = dt.datetime(2024, 1, 1)
    base = [(i, 1, t0 + dt.timedelta(minutes=m), ty) for i, (m, ty) in
            enumerate([(0, "view"), (2, "click"), (1, "view"),
                       (3, "error"), (4, "purchase"), (5, "click")])]
    rng = random.Random(perm_seed)
    shuffled = base[:]
    rng.shuffle(shuffled)
    steps = ["view", "click", "purchase"]
    d1 = funnel_depths(
        spark.createDataFrame(base, ["event_id", "k", "ts", "ty"]),
        "k", "ts", "ty", steps, tiebreak_col="event_id").collect()
    d2 = funnel_depths(
        spark.createDataFrame(shuffled, ["event_id", "k", "ts", "ty"]),
        "k", "ts", "ty", steps, tiebreak_col="event_id").collect()
    assert d1[0]["depth"] == d2[0]["depth"] == 3


@settings(max_examples=30, deadline=None)
@given(data=st.binary(min_size=0, max_size=3000),
       min_code=st.integers(min_value=2, max_value=8))
def test_lzw_roundtrip_any_bytes(data, min_code):
    """GIF LZW must round-trip ANY byte stream whose symbols fit the
    code size — not just the deterministic fixture fills."""
    from puffbird_spark.operators.multimodal import _lzw_decode, _lzw_encode

    alphabet = 1 << min_code
    clipped = bytes(b % alphabet for b in data)
    assert _lzw_decode(_lzw_encode(clipped, min_code), min_code) == clipped


@settings(max_examples=15, deadline=None)
@given(w=st.integers(min_value=1, max_value=40),
       h=st.integers(min_value=1, max_value=30),
       seed=st.integers(min_value=0, max_value=255))
def test_gif_roundtrip_any_dims(w, h, seed):
    from puffbird_spark.operators.multimodal import decode_gif_gray, encode_gif

    wd, hd, px = decode_gif_gray(encode_gif(w, h, seed))
    assert (wd, hd) == (w, h)
    assert px == bytes((x * 31 + y * 17 + seed) % 256
                       for y in range(h) for x in range(w))


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=0, max_value=10**6),
                     min_size=1, max_size=60))
def test_ewma_exact_on_any_int_series(spark, vals):
    """Dyadic-weight EWMA over ints must equal the direct Python weighted
    sum EXACTLY (no float tolerance) for arbitrary series."""
    import datetime as dt

    from puffbird_spark.operators.timeseries import ewma_smooth

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=i), i, v)
         for i, v in enumerate(vals)], ["k", "ts", "eid", "c"])
    got = {r["eid"]: r["ewma_cents"]
           for r in ewma_smooth(df, ["k"], "ts", "c",
                                tiebreak_cols=["eid"]).collect()}
    for t in range(len(vals)):
        frame = vals[max(0, t - 15):t + 1]
        m = len(frame)
        expect = sum(
            v * (0.5 ** (m - 1) if i == 1 else 0.5 ** (m - i + 1))
            for i, v in enumerate(frame, start=1))
        assert got[t] == expect, t


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.tuples(st.floats(min_value=-100, max_value=100,
                        allow_nan=False, width=32),
              st.booleans()),
    min_size=4, max_size=30))
def test_mann_whitney_group_flip_identity(spark, vals):
    """U_a + U_b = n_a * n_b on ANY sample (the rank-sum identity),
    and z flips sign exactly under a group swap."""
    from puffbird_spark.operators.drift import mann_whitney_u

    if not (any(a for _, a in vals) and any(not a for _, a in vals)):
        return
    df = spark.createDataFrame(
        [(float(v), a) for v, a in vals], "v double, a boolean")
    fwd = mann_whitney_u(df, "a", "v").collect()
    rev = mann_whitney_u(df.withColumn("a", ~df.a), "a", "v").collect()
    if not fwd:           # zero variance (all tied) — both sides omit
        assert not rev
        return
    f, r = fwd[0], rev[0]
    assert (f.n_a, f.n_b) == (r.n_b, r.n_a)
    assert f.u_stat + r.u_stat == f.n_a * f.n_b
    assert abs(f.z + r.z) < 2e-6


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]),
              st.integers(min_value=0, max_value=1)),
    min_size=3, max_size=40),
    m=st.floats(min_value=0.5, max_value=20, allow_nan=False))
def test_target_encoding_bounded_and_leak_free(spark, rows, m):
    """LOO encodings of a 0/1 target stay inside [0, 1] and match the
    closed form computed in plain Python for every row."""
    from puffbird_spark.operators.classifier import target_encode_loo

    df = spark.createDataFrame(rows, "cat string, y long")
    got = target_encode_loo(df, "cat", "y", smoothing=m).collect()
    n = len(rows)
    prior = sum(y for _, y in rows) / n
    import collections
    s = collections.Counter()
    c = collections.Counter()
    for cat, y in rows:
        s[cat] += y
        c[cat] += 1
    assert len(got) == n
    for r in got:
        expect = round((s[r.cat] - r.y + m * prior) / (c[r.cat] - 1 + m), 6)
        assert abs(r.target_enc - expect) < 1e-9
        assert 0.0 <= r.target_enc <= 1.0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(bits=st.integers(min_value=1, max_value=4))
def test_hilbert_bijection_any_width(spark, bits):
    """with_hilbert is a bijection onto [0, 4^bits) with unit Manhattan
    steps at EVERY grid width, and equals the Column form."""
    from puffbird_spark.operators.layout import hilbert_value, with_hilbert

    n = 1 << bits
    grid = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long")
    rows = with_hilbert(grid, "x", "y", bits=bits, h_col="d").collect()
    ds = sorted(r.d for r in rows)
    assert ds == list(range(n * n))
    pos = {r.d: (r.x, r.y) for r in rows}
    assert all(
        abs(pos[i][0] - pos[i + 1][0]) + abs(pos[i][1] - pos[i + 1][1]) == 1
        for i in range(n * n - 1))
    col = grid.select("x", "y",
                      hilbert_value("x", "y", bits).alias("d")).collect()
    assert {(r.x, r.y): r.d for r in col} == {(r.x, r.y): r.d for r in rows}


TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=24),
    min_size=1, max_size=8)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=TEXTS)
def test_chrf_swap_symmetry_and_identity(spark, texts):
    """chrF invariants on random texts: swapping candidate and
    reference swaps precision and recall EXACTLY (clipped matches are
    symmetric; totals trade places); identical pairs score exactly 1
    unless both sides are empty (all orders vacuous -> 0); every
    metric stays in [0, 1]."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import chrf

    rows = [(i, t, texts[(i + 1) % len(texts)])
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, c string, r string")
    fwd = {r["doc_id"]: r for r in
           chrf(df, "c", "r", id_col="doc_id").collect()}
    rev = {r["doc_id"]: r for r in
           chrf(df, "r", "c", id_col="doc_id").collect()}
    for i in fwd:
        assert fwd[i]["chrp"] == rev[i]["chrr"], (i, texts)
        assert fwd[i]["chrr"] == rev[i]["chrp"], (i, texts)
        for m in ("chrp", "chrr", "chrf"):
            assert 0.0 <= fwd[i][m] <= 1.0

    ident = {r["doc_id"]: r for r in chrf(
        df.select("doc_id", "c", F.col("c").alias("r2")),
        "c", "r2", id_col="doc_id").collect()}
    for i, t in enumerate(texts):
        expect = 0.0 if t.replace(" ", "") == "" else 1.0
        assert ident[i]["chrf"] == expect, (t,)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=TEXTS)
def test_sentence_bleu_bounds_and_identity(spark, texts):
    """BLEU invariants on random token streams: identical pairs score
    exactly 1 (empty pairs 0); every p_n, bp, and bleu stays in
    [0, 1]; bleu is 0 whenever p1 is 0 and never exceeds bp."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import sentence_bleu

    rows = [(i, t, texts[(i + 1) % len(texts)])
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, c string, r string")
    tok = lambda col: F.filter(  # noqa: E731
        F.split(F.col(col), " "), lambda x: x != F.lit(""))
    out = {r["doc_id"]: r for r in sentence_bleu(
        df.select("doc_id", tok("c").alias("ct"), tok("r").alias("rt")),
        "ct", "rt", id_col="doc_id").collect()}
    for i in out:
        r = out[i]
        for m in ("p1", "p2", "p3", "p4", "bp", "bleu"):
            assert 0.0 <= r[m] <= 1.0, (m, r, texts)
        if r["p1"] == 0.0:
            assert r["bleu"] == 0.0
        assert r["bleu"] <= r["bp"] + 1e-9

    ident = {r["doc_id"]: r for r in sentence_bleu(
        df.select("doc_id", tok("c").alias("ct"),
                  tok("c").alias("rt2")),
        "ct", "rt2", id_col="doc_id").collect()}
    for i, t in enumerate(texts):
        expect = 0.0 if t.split() == [] or t.replace(" ", "") == "" else 1.0
        got = ident[i]["bleu"]
        assert got == expect, (t, got)


def _ref_bleu(c_toks, r_toks, max_n=4):
    """Independent pure-Python BLEU+1 reference (mirrors the documented
    semantics, not the Spark code) for the differential pin."""
    import math
    from collections import Counter

    def ngrams(toks, n):
        return [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    clen, rlen = len(c_toks), len(r_toks)
    ps, logs, pmin = [], [], 1.0
    for n in range(1, max_n + 1):
        cc, rc = Counter(ngrams(c_toks, n)), Counter(ngrams(r_toks, n))
        m = sum(min(v, rc[g]) for g, v in cc.items())
        t, s = max(clen - n + 1, 0), (0 if n == 1 else 1)
        p = ((m + s) / (t + s)) if (t + s) > 0 else 0.0
        ps.append(round(p, 6))
        pmin = min(pmin, p)
        if p > 0:
            logs.append(round(math.log(p), 9))
    bp = (0.0 if clen == 0
          else (1.0 if clen >= rlen
                else round(math.exp(1 - rlen / clen), 9)))
    bleu = (round(bp * math.exp(sum(logs) / max_n), 6)
            if (pmin > 0 and clen > 0) else 0.0)
    return ps, round(bp, 6), bleu


def _ref_chrf(cs, rs, max_n=6, beta=2.0):
    """Independent pure-Python chrF reference for the differential."""
    import re
    from collections import Counter

    cs, rs = re.sub(r"\s", "", cs), re.sub(r"\s", "", rs)
    sp = sr = k = 0
    for n in range(1, max_n + 1):
        cg = Counter(cs[i:i + n] for i in range(len(cs) - n + 1))
        rg = Counter(rs[i:i + n] for i in range(len(rs) - n + 1))
        m = sum(min(v, rg[g]) for g, v in cg.items())
        tc, tr = max(len(cs) - n + 1, 0), max(len(rs) - n + 1, 0)
        if tc > 0 or tr > 0:
            k += 1
            sp += round(m / tc if tc > 0 else 0.0, 9)
            sr += round(m / tr if tr > 0 else 0.0, 9)
    chrp = round(sp / k, 9) if k else 0.0
    chrr = round(sr / k, 9) if k else 0.0
    b2 = beta * beta
    den = b2 * chrp + chrr
    f = (1 + b2) * chrp * chrr / den if den > 0 else 0.0
    return round(chrp, 6), round(chrr, 6), round(f, 6)


PAIR_TEXTS = st.lists(
    st.tuples(st.text(alphabet="abc d", min_size=0, max_size=30),
              st.text(alphabet="abc d", min_size=0, max_size=30)),
    min_size=1, max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=PAIR_TEXTS)
def test_bleu_chrf_match_pure_python_reference(spark, pairs):
    """Full randomized differential: the distributed BLEU/chrF kernels
    must agree value-for-value (6 dp, same rounding ladder) with
    independent single-process Python references on arbitrary
    candidate/reference pairs — clipping, smoothing, vacuous orders,
    emptiness, and the brevity penalty all exercised by the fuzzer."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import chrf, sentence_bleu

    rows = [(i, c, r) for i, (c, r) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "doc_id int, c string, r string")
    tok = lambda col: F.filter(  # noqa: E731
        F.split(F.col(col), " "), lambda x: x != F.lit(""))
    got_b = {r["doc_id"]: r for r in sentence_bleu(
        df.select("doc_id", tok("c").alias("ct"), tok("r").alias("rt")),
        "ct", "rt", id_col="doc_id").collect()}
    got_c = {r["doc_id"]: r for r in
             chrf(df, "c", "r", id_col="doc_id").collect()}
    for i, (c, r) in enumerate(pairs):
        ps, bp, bleu = _ref_bleu(c.split(), r.split())
        g = got_b[i]
        assert [g["p1"], g["p2"], g["p3"], g["p4"]] == ps, (c, r)
        assert (g["bp"], g["bleu"]) == (bp, bleu), (c, r)
        chrp, chrr, f = _ref_chrf(c, r)
        assert (got_c[i]["chrp"], got_c[i]["chrr"],
                got_c[i]["chrf"]) == (chrp, chrr, f), (c, r)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=PAIR_TEXTS)
def test_corpus_bleu_matches_pure_python_reference(spark, pairs):
    """Randomized differential for the pooled (corpus) BLEU: exact
    agreement with an independent single-process micro-average
    reference, including the no-grams-at-order-n and empty-corpus
    edges the fuzzer reaches."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import corpus_bleu

    def ref(prs, max_n=4):
        def ngrams(toks, n):
            return [tuple(toks[i:i + n])
                    for i in range(len(toks) - n + 1)]

        sc = sum(len(c.split()) for c, _ in prs)
        sr = sum(len(r.split()) for _, r in prs)
        ps, logs, pmin = [], [], 1.0
        for n in range(1, max_n + 1):
            m = t = 0
            for c, r in prs:
                cc = Counter(ngrams(c.split(), n))
                rc = Counter(ngrams(r.split(), n))
                m += sum(min(v, rc[g]) for g, v in cc.items())
                t += max(len(c.split()) - n + 1, 0)
            p = m / t if t > 0 else 0.0
            ps.append(round(p, 6))
            pmin = min(pmin, p)
            if p > 0:
                logs.append(round(math.log(p), 9))
        bp = (0.0 if sc == 0
              else (1.0 if sc >= sr else round(math.exp(1 - sr / sc), 9)))
        bleu = (round(bp * math.exp(sum(logs) / max_n), 6)
                if (pmin > 0 and sc > 0) else 0.0)
        return sc, sr, ps, round(bp, 6), bleu

    rows = [(i, c, r) for i, (c, r) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "doc_id int, c string, r string")
    tok = lambda col: F.filter(  # noqa: E731
        F.split(F.col(col), " "), lambda x: x != F.lit(""))
    g = corpus_bleu(
        df.select("doc_id", tok("c").alias("ct"), tok("r").alias("rt")),
        "ct", "rt", id_col="doc_id").collect()[0]
    sc, sr, ps, bp, bleu = ref(pairs)
    assert (g["cand_tokens"], g["ref_tokens"]) == (sc, sr), pairs
    assert [g["p1"], g["p2"], g["p3"], g["p4"]] == ps, pairs
    assert (g["bp"], g["bleu"]) == (bp, bleu), pairs


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.one_of(st.none(), st.floats(min_value=-5, max_value=5,
                                   allow_nan=False)),
    min_size=1, max_size=20))
def test_expectations_three_way_partition(spark, vals):
    """apply_expectations invariants on random (NULL-bearing) inputs:
    passed + quarantined is EXACTLY the input (no row lost or
    duplicated), every quarantined row names at least one failed rule
    in sorted order, NULL evaluates as a violation (the SQL-constraint
    convention), and the scorecard's __total equals the quarantine
    count."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.expectations import apply_expectations

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    rules = {"nonneg": F.col("v") >= 0, "small": F.col("v") < 3}
    p, q, s = apply_expectations(df, rules)
    got_p = {r["id"] for r in p.collect()}
    got_q = {r["id"]: list(r["__violations"]) for r in q.collect()}
    assert got_p | set(got_q) == set(range(len(vals)))
    assert got_p & set(got_q) == set()
    for i, v in enumerate(vals):
        expect = sorted(
            n for n, ok in (("nonneg", v is not None and v >= 0),
                            ("small", v is not None and v < 3))
            if not ok)
        if expect:
            assert got_q[i] == expect, (i, v)
        else:
            assert i in got_p
    total = {r["rule"]: r for r in s.collect()}["__total"]
    assert total["n_violations"] == len(got_q)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(keys=st.lists(st.integers(min_value=0, max_value=10 ** 9),
                     min_size=1, max_size=30, unique=True))
def test_hash_split_total_and_repartition_stable(spark, keys):
    """hash_split invariants on random key sets: every row lands in
    exactly one named split, assignment is a pure function of the key
    (identical after an adversarial repartition), and weights
    normalize (a 2:1:1 spec behaves like 0.5/0.25/0.25)."""
    from puffbird_spark.operators.splits import hash_split

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    w = {"train": 2.0, "val": 1.0, "test": 1.0}
    a = {r["k"]: r["split"] for r in hash_split(df, "k", w).collect()}
    assert set(a) == set(keys)
    assert set(a.values()) <= {"train", "val", "test"}
    b = {r["k"]: r["split"] for r in
         hash_split(df.repartition(7), "k", w).collect()}
    assert a == b
    c = {r["k"]: r["split"] for r in hash_split(
        df, "k", {"train": 0.5, "val": 0.25, "test": 0.25}).collect()}
    assert a == c


def _ref_rouge(ct, rt, max_n=2):
    """Independent pure-Python ROUGE-N reference for the differential."""
    from collections import Counter

    out = []
    for n in range(1, max_n + 1):
        cg = Counter(tuple(ct[i:i + n]) for i in range(len(ct) - n + 1))
        rg = Counter(tuple(rt[i:i + n]) for i in range(len(rt) - n + 1))
        m = sum(min(v, rg[g]) for g, v in cg.items())
        tc, tr = max(len(ct) - n + 1, 0), max(len(rt) - n + 1, 0)
        p = round(m / tc, 9) if tc > 0 else 0.0
        r = round(m / tr, 9) if tr > 0 else 0.0
        f = 2 * p * r / (p + r) if p + r > 0 else 0.0
        out.append((round(p, 6), round(r, 6), round(f, 6)))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=PAIR_TEXTS)
def test_rouge_matches_pure_python_reference(spark, pairs):
    """Randomized differential: the distributed ROUGE-N kernel agrees
    value-for-value (6 dp, same rounding ladder) with an independent
    single-process reference — clipping, gramless sides, and the F1
    zero-denominator branch all fuzzer-exercised."""
    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import rouge_n

    rows = [(i, c, r) for i, (c, r) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "doc_id int, c string, r string")
    tok = lambda col: F.filter(  # noqa: E731
        F.split(F.col(col), " "), lambda x: x != F.lit(""))
    got = {r["doc_id"]: r for r in rouge_n(
        df.select("doc_id", tok("c").alias("ct"), tok("r").alias("rt")),
        "ct", "rt", id_col="doc_id", max_n=2).collect()}
    for i, (c, r) in enumerate(pairs):
        ref = _ref_rouge(c.split(), r.split())
        g = got[i]
        for n, (p, rr, f) in enumerate(ref, start=1):
            assert (g[f"rouge{n}_p"], g[f"rouge{n}_r"],
                    g[f"rouge{n}_f"]) == (p, rr, f), (c, r, n)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(groups=st.lists(
    st.tuples(st.integers(min_value=1, max_value=40),
              st.integers(min_value=0, max_value=40)),
    min_size=1, max_size=8))
def test_pass_at_k_matches_comb_formula(spark, groups):
    """Randomized differential: the ordered-product estimator equals
    the exact binomial-coefficient formula 1 - C(n-c,k)/C(n,k) at the
    release precision for every (n, c) the fuzzer draws."""
    import math

    from pyspark.sql import functions as F

    from puffbird_spark.operators.evaluation import pass_at_k

    rows = []
    for pid, (n, c_raw) in enumerate(groups):
        c = min(c_raw, n)
        rows += [(str(pid), i < c) for i in range(n)]
    df = spark.createDataFrame(rows, "problem string, ok boolean")
    ks = (1, 3, 7)
    got = {r["problem"]: r for r in
           pass_at_k(df, "problem", F.col("ok"), ks=ks).collect()}
    for pid, (n, c_raw) in enumerate(groups):
        c = min(c_raw, n)
        for k in ks:
            if n < k:
                expect = None
            elif n - c < k:
                expect = 1.0
            else:
                expect = round(1 - math.comb(n - c, k) / math.comb(n, k), 6)
            assert got[str(pid)][f"pass_at_{k}"] == expect, (n, c, k)
