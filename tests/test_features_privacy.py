"""Unit tests for the md5-derived deterministic-randomness stack:
functions/hashing.py, operators/privacy.dp_noisy_counts,
operators/features.{hashed_features,woe_encoding}, and the new
text screens (readability, code-likeness, PII masking)."""

import math

import pytest
from pyspark.sql import functions as F

from puffbird_spark.functions.hashing import (
    laplace_noise,
    md5_bucket,
    md5_sign,
    md5_uniform,
)
from puffbird_spark.functions.text import (
    code_likeness,
    flesch_reading_ease,
    mask_pii,
)
from puffbird_spark.operators.features import hashed_features, woe_encoding
from puffbird_spark.operators.privacy import dp_noisy_counts


def _keys(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )


def test_md5_uniform_open_interval_and_spread(spark):
    rows = _keys(spark).select(md5_uniform("key").alias("u")).collect()
    us = [r.u for r in rows]
    assert all(0.0 < u < 1.0 for u in us)
    # 200 md5 uniforms: mean within 6 sigma of 0.5 (sigma = 1/sqrt(12n))
    mean = sum(us) / len(us)
    assert abs(mean - 0.5) < 6 * (1 / math.sqrt(12 * len(us)))


def test_md5_uniform_matches_python_md5(spark):
    import hashlib

    row = (
        spark.range(1)
        .select(md5_uniform(F.lit("k42")).alias("u"))
        .collect()[0]
    )
    expected = (int(hashlib.md5(b"k42").hexdigest()[:8], 16) + 0.5) / 16**8
    assert row.u == pytest.approx(expected, abs=0)


def test_md5_bucket_and_sign_ranges(spark):
    rows = (
        _keys(spark)
        .select(
            md5_bucket("key", 16).alias("b"), md5_sign("key").alias("s")
        )
        .collect()
    )
    assert {r.b for r in rows} <= set(range(16))
    assert {r.s for r in rows} <= {-1, 1}
    assert len({r.b for r in rows}) > 8  # spread, not constant


def test_laplace_noise_centered_and_scaled(spark):
    rows = (
        _keys(spark, 400)
        .select(laplace_noise("key", scale=2.0).alias("z"))
        .collect()
    )
    zs = [r.z for r in rows]
    n = len(zs)
    mean = sum(zs) / n
    # Laplace(0, 2): sd = 2*sqrt(2); mean of 400 draws within 6 sigma
    assert abs(mean) < 6 * 2 * math.sqrt(2) / math.sqrt(n)
    assert any(z < 0 for z in zs) and any(z > 0 for z in zs)


SALT_A = "test-secret-prf-key-epoch1"
SALT_B = "test-secret-prf-key-epoch2"


def test_dp_noisy_counts_deterministic_and_floored(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("v")
    )
    a = dp_noisy_counts(df, ["g"], salt=SALT_A, epsilon=1.0).collect()
    b = dp_noisy_counts(
        df.repartition(7), ["g"], salt=SALT_A, epsilon=1.0
    ).collect()
    assert sorted((r.g, r.noisy_count) for r in a) == sorted(
        (r.g, r.noisy_count) for r in b
    )
    assert all(r.noisy_count >= 0.0 for r in a)
    # the release withholds the exact count unless the audit flag is set
    assert "exact_count" not in a[0].asDict()
    audit = dp_noisy_counts(
        df, ["g"], salt=SALT_A, epsilon=1.0, include_exact=True).collect()
    assert "exact_count" in audit[0].asDict()
    # different secret salt -> a different release draw
    c = dp_noisy_counts(df, ["g"], salt=SALT_B, epsilon=1.0).collect()
    assert sorted(r.noisy_count for r in a) != sorted(
        r.noisy_count for r in c
    )


def test_dp_noisy_counts_validates_args(spark):
    df = spark.range(3).select(F.col("id").alias("g"))
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], salt=SALT_A, epsilon=1.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], salt=SALT_A, epsilon=0.0)
    # a short/public-looking salt is rejected: the PRF key IS the privacy
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], salt="dp", epsilon=1.0)


def test_hashed_features_no_vocabulary_determinism(spark):
    df = spark.createDataFrame(
        [(1, ["alpha", "beta", "alpha"]), (2, ["beta", "gamma"])],
        ["doc_id", "toks"],
    )
    out = hashed_features(df, "doc_id", "toks", n_buckets=8)
    rows = {(r.doc_id, r.bucket): (r.weight, r.n_tokens) for r in out.collect()}
    # same token -> same bucket in both docs; doc 1's 'alpha' count is 2
    assert sum(n for (_, n) in rows.values()) == 5
    assert all(0 <= b < 8 for (_, b) in rows)
    # signed weights never exceed the token count
    assert all(abs(w) <= n for (w, n) in rows.values())


def test_woe_encoding_single_class_finite(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 0), ("b", 1)], ["cat", "y"]
    )
    rows = {r.cat: r.woe for r in woe_encoding(df, "cat", "y").collect()}
    assert all(math.isfinite(v) for v in rows.values())
    assert rows["a"] > rows["b"]  # all-positive category scores higher


def test_flesch_orders_simple_before_dense(spark):
    df = spark.createDataFrame(
        [("simple", "The cat sat. The dog ran. It was fun."),
         ("dense", "Incomprehensibility characterizes bureaucratic "
                   "organizational internationalization phenomena.")],
        ["k", "t"],
    )
    rows = {
        r.k: r.f
        for r in df.select("k", flesch_reading_ease("t").alias("f")).collect()
    }
    assert rows["simple"] > rows["dense"]


def test_code_likeness_flags_code_not_prose(spark):
    df = spark.createDataFrame(
        [("code", "def f(x):\n  return x; { } (y) = [z];\n  if x { }"),
         ("prose", "the quick brown fox jumps over a lazy dog near town")],
        ["k", "t"],
    )
    feats = code_likeness("t")
    rows = {
        r.k: r.s
        for r in df.select("k", feats["code_score"].alias("s")).collect()
    }
    assert rows["code"] > 0.5 > rows["prose"]


def test_mask_pii_types_and_order(spark):
    txt = "mail bob@x10.0.0.1.example.org or 10.0.0.1 tel +1 212 555-0100 ok"
    row = (
        spark.createDataFrame([(txt,)], ["t"])
        .select(mask_pii("t").alias("m"))
        .collect()[0]
    )
    # the email (whose domain embeds a dotted quad) masked as ONE email,
    # the standalone IP as an IP, the phone as a phone
    assert row.m == "mail <EMAIL> or <IP> tel <PHONE> ok"


def test_dp_noisy_mean_clamped_and_deterministic(spark):
    from puffbird_spark.operators.privacy import dp_noisy_mean

    df = spark.range(300).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    a = dp_noisy_mean(
        df, ["g"], "v", clamp=50.0, salt=SALT_A, epsilon=1.0).collect()
    b = dp_noisy_mean(
        df.repartition(7), ["g"], "v",
        clamp=50.0, salt=SALT_A, epsilon=1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0.0 <= r.noisy_mean <= 50.0 for r in a)
    # the release withholds exact_n unless the audit flag is set
    assert "exact_n" not in a[0].asDict()
    audit = dp_noisy_mean(
        df, ["g"], "v", clamp=50.0, salt=SALT_A, epsilon=1.0,
        include_exact=True).collect()
    assert "exact_n" in audit[0].asDict()
    # tighter budget -> different (noisier) release
    c = dp_noisy_mean(
        df, ["g"], "v", clamp=50.0, salt=SALT_A, epsilon=0.1).collect()
    assert sorted(r.noisy_mean for r in a) != sorted(
        r.noisy_mean for r in c)


def test_dp_noisy_mean_validates(spark):
    from puffbird_spark.operators.privacy import dp_noisy_mean

    df = spark.range(3).select(F.col("id").alias("g"),
                               F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        dp_noisy_mean(df, ["g"], "v", clamp=0.0, salt=SALT_A)
    with pytest.raises(ValueError):
        dp_noisy_mean(df, [], "v", clamp=1.0, salt=SALT_A)
    with pytest.raises(ValueError):
        dp_noisy_mean(df, ["g"], "v", clamp=1.0, salt="dpm")


def test_dp_quantiles_accuracy_determinism_and_guards(spark):
    """Exponential-mechanism quantiles: with a large epsilon the
    mechanism concentrates on the true grid quantile (Gumbel noise is
    O(1), score steps are O(eps*bin_count)); same salt replays
    identically; out-of-domain values clamp into edge bins; parameter
    guards reject bad domains and non-secret salts."""
    import pytest as _pt

    from puffbird_spark.operators.privacy import dp_quantiles

    df = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "v double")
    got = {r["quantile"]: r["value"] for r in dp_quantiles(
        df, "v", [0.25, 0.5, 0.9], salt="unit-test-secret-salt",
        epsilon=400.0, lo=0.0, hi=1000.0, n_bins=100).collect()}
    # rank(c_j) = 10*j exactly; argmax at the true quantile line
    assert got == {0.25: 250.0, 0.5: 500.0, 0.9: 900.0}

    a = sorted(map(tuple, dp_quantiles(
        df, "v", [0.5], salt="unit-test-secret-salt", epsilon=0.05,
        lo=0.0, hi=1000.0, n_bins=100).collect()))
    b = sorted(map(tuple, dp_quantiles(
        df, "v", [0.5], salt="unit-test-secret-salt", epsilon=0.05,
        lo=0.0, hi=1000.0, n_bins=100).collect()))
    assert a == b  # pure function of (salt, qi, j)

    # clamping: values far outside [lo, hi] land in edge bins, ranks
    # stay well-defined (no NULL bins, no lost rows)
    wild = spark.createDataFrame(
        [(-1e9,), (1e9,), (5.0,)], "v double")
    out = dp_quantiles(
        wild, "v", [0.5], salt="unit-test-secret-salt",
        epsilon=100.0, lo=0.0, hi=10.0, n_bins=10).collect()
    assert len(out) == 1 and 0.0 <= out[0]["value"] <= 10.0

    with _pt.raises(ValueError):
        dp_quantiles(df, "v", [0.5], salt="short", epsilon=1.0,
                     lo=0.0, hi=1.0)
    with _pt.raises(ValueError):
        dp_quantiles(df, "v", [1.5], salt="unit-test-secret-salt",
                     lo=0.0, hi=1.0)
    with _pt.raises(ValueError):
        dp_quantiles(df, "v", [0.5], salt="unit-test-secret-salt",
                     lo=1.0, hi=1.0)
    with _pt.raises(ValueError):
        dp_quantiles(df, "v", [0.5], salt="unit-test-secret-salt",
                     lo=0.0, hi=1.0, n_bins=10000)
