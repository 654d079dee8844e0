"""Scalar-function surface: string, date/time, math, conditional, array,
map, JSON (SURVEY §2.2 scalar fns). Each query projects a battery of
functions with results made engine-portable (see base.py float policy).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import dec, load, query


@query("fn_string", oracle="""
SELECT p_partkey,
  upper(p_name) AS up_name,
  lower(p_brand) AS low_brand,
  CAST(length(p_name) AS INT) AS name_len,
  substr(p_type, 1, 4) AS type4,
  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
  concat(p_brand, '|', p_type) AS brand_type,
  replace(p_name, ' ', '_') AS name_us,
  string_split(p_name, ' ')[2] AS second_word,
  (p_name LIKE '%red%') AS is_red,
  ltrim(rtrim(concat('  ', p_name, ' '))) AS trimmed
FROM part
""")
def fn_string(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.split("p_name", " ").getItem(1).alias("second_word"),
        F.col("p_name").like("%red%").alias("is_red"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
    )


@query("fn_date", oracle="""
SELECT o_orderkey,
  CAST(date_part('year', o_orderdate) AS INT) AS yr,
  CAST(date_part('month', o_orderdate) AS INT) AS mo,
  CAST(date_part('quarter', o_orderdate) AS INT) AS qtr,
  CAST(date_part('day', o_orderdate) AS INT) AS dom,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
  date_trunc('month', o_orderdate) AS month_start,
  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
    AS days_since,
  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
  strftime(o_orderdate, '%Y-%m-%d') AS iso_day
FROM orders
""")
def fn_date(spark, sf_dir):
    """Date/time battery. DoW conventions differ (Spark 1=Sunday, DuckDB
    0=Sunday) — the oracle shifts by one."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate"),
            F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"),
        ).alias("days_since"),
        F.add_months(F.col("o_orderdate"), 2).alias("plus2m"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query("fn_math", oracle="""
SELECT l_orderkey, l_linenumber,
  abs(l_quantity - 25.0) AS qty_dev,
  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2)), 2) AS DOUBLE) AS disc_amt,
  CAST(pow(2.0, l_linenumber) AS DOUBLE) AS pow2,
  round(sqrt(l_quantity), 6) AS sqrt_qty,
  round(ln(l_extendedprice), 6) AS ln_price,
  CAST(sign(l_discount - 0.05) AS INT) AS disc_sign
FROM lineitem
""")
def fn_math(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
        F.round(dec("l_extendedprice") * dec("l_discount"), 2)
        .cast("double").alias("disc_amt"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query("fn_bitwise", oracle="""
SELECT o_orderkey,
  CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
  CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
  CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
  CAST(o_orderkey << 3 AS BIGINT) AS shl3,
  CAST(o_orderkey >> 2 AS BIGINT) AS shr2,
  CAST(bit_count(o_orderkey) AS INT) AS popcount,
  CAST(~o_orderkey AS BIGINT) AS inverted
FROM orders
""")
def fn_bitwise(spark, sf_dir):
    """Bitwise surface battery: AND/OR/XOR, shifts, popcount, NOT —
    the primitives under bucket masks, bloom probes, and bit-packed
    flags, all JVM codegen. DuckDB twins exactly (two's-complement
    semantics on BIGINT both sides)."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("inverted"),
    )


@query("fn_cond", oracle="""
SELECT o_orderkey,
  CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
       ELSE 'partial' END AS status_label,
  COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNSPECIFIED') AS prio,
  GREATEST(o_totalprice, 150000.0) AS capped_hi,
  LEAST(o_totalprice, 150000.0) AS capped_lo,
  (o_totalprice BETWEEN 100000 AND 200000) AS mid_range,
  (o_orderstatus IN ('O','P')) AS is_openish
FROM orders
""")
def fn_cond(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("partial").alias("status_label"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("UNSPECIFIED"),
        ).alias("prio"),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("capped_hi"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("capped_lo"),
        F.col("o_totalprice").between(100000, 200000).alias("mid_range"),
        F.col("o_orderstatus").isin("O", "P").alias("is_openish"),
    )


@query("fn_array", oracle="""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  list_contains(toks, 'spark') AS has_spark,
  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
  array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3,
  CAST(length(replace(text, ' ', '')) AS BIGINT) AS total_chars,
  array_to_string(list_transform(toks[1:2], x -> upper(x)), ' ') AS head_upper
FROM t
""")
def fn_array(spark, sf_dir):
    """Array/higher-order-function battery over tokenized text (size,
    contains, distinct, sort, slice, transform, aggregate)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",")
        .alias("first3"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 2), lambda x: F.upper(x)), " "
        ).alias("head_upper"),
    )


@query("fn_map", oracle="""
SELECT l_returnflag || '|' || l_linestatus AS grp,
  CAST(map_extract(map {'A': 1, 'N': 2, 'R': 3}, l_returnflag)[1] AS INT)
    AS flag_code
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def fn_map(spark, sf_dir):
    """Map column ops: literal map lookup + keys canonicalization."""
    li = load(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("A"), F.lit(1), F.lit("N"), F.lit(2), F.lit("R"), F.lit(3)
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            F.concat_ws("|", "l_returnflag", "l_linestatus").alias("grp"),
            m.getItem(F.col("l_returnflag")).cast("int").alias("flag_code"),
        )
    )


@query("fn_json", oracle="""
SELECT event_id, event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  json_extract_string(props, '$.missing') AS missing_field
FROM events
""")
def fn_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query("fn_to_json", oracle="""
SELECT event_id,
  to_json(struct_pack(event_id := event_id, event_type := event_type))
    AS packed
FROM events
""")
def fn_to_json(spark, sf_dir):
    """to_json round of struct packing (byte-identical serialization on
    both engines for integer/string fields)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
    )


@query("text_tokens_bpe", oracle="""
WITH t AS (SELECT doc_id,
             regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS toks
           FROM documents)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_bpe_tokens,
  array_to_string(toks[1:5], ' ') AS head5
FROM t
""")
def text_tokens_bpe(spark, sf_dir):
    """BPE-ish regex tokenization (letters / digits / single punctuation as
    separate tokens) — the subword-style token counting of the north star,
    next to whitespace counting in text_stats."""
    docs = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
    )


@query("fn_struct", oracle="""
WITH s AS (
  SELECT c_custkey, c_acctbal,
    struct_pack(nation := c_nationkey, segment := c_mktsegment,
                bal := c_acctbal) AS profile,
    struct_pack(lo := least(c_nationkey, 12),
                hi := greatest(c_nationkey, 12)) AS clamp
  FROM customer)
SELECT c_custkey,
  profile.nation AS profile_nation,
  profile.segment AS profile_segment,
  profile.bal AS profile_bal,
  profile.nation AS nation_again,
  (c_acctbal > 0) AS positive_bal,
  clamp.lo AS clamp_lo,
  clamp.hi AS clamp_hi
FROM s
""")
def fn_struct(spark, sf_dir):
    """Struct battery: creation, field re-projection, nested construction
    — the typed-record surface engines use for multimodal metadata.

    Output columns are the struct's fields re-extracted as flat scalars:
    the struct round-trip (construct → getField) is exercised on both
    engines, while result cells stay hashable for the driver canonicalizer
    (dict cells broke the r2 compare; VERDICT r2 item 1)."""
    cust = load(spark, sf_dir, "customer")
    profile = F.struct(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("bal"),
    )
    clamp = F.struct(
        F.least(F.col("c_nationkey"), F.lit(12)).alias("lo"),
        F.greatest(F.col("c_nationkey"), F.lit(12)).alias("hi"),
    )
    return cust.select(
        "c_custkey",
        profile.getField("nation").alias("profile_nation"),
        profile.getField("segment").alias("profile_segment"),
        profile.getField("bal").alias("profile_bal"),
        profile.getField("nation").alias("nation_again"),
        (F.col("c_acctbal") > 0).alias("positive_bal"),
        clamp.getField("lo").alias("clamp_lo"),
        clamp.getField("hi").alias("clamp_hi"),
    )


@query("fn_url_mask", oracle="""
WITH u AS (
  SELECT doc_id,
    'https://' || source || '.example.com/docs/' || doc_id
      || '?lang=' || lang AS url,
    'user' || doc_id || '@' || source || '.com says ' || substr(text, 1, 20)
      AS msg
  FROM documents)
SELECT doc_id,
  regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
  regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
  regexp_extract(url, '\\?(.*)$', 1) AS query,
  regexp_replace(msg, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                 '<EMAIL>', 'g') AS msg_redacted,
  regexp_replace(regexp_replace(regexp_replace(
      msg, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
    AS msg_masked
FROM u
""")
def fn_url_mask(spark, sf_dir):
    """URL parsing (native parse_url) + PII masking (native mask +
    regexp email redaction) — the privacy-filtering surface of a training
    pipeline. URLs/emails are synthesized deterministically from columns;
    the oracle replays parse_url with portable regexes."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"),
    )
    msg = F.concat(
        F.lit("user"), F.col("doc_id"), F.lit("@"), F.col("source"),
        F.lit(".com says "), F.substring("text", 1, 20),
    )
    u = docs.select("doc_id", url.alias("url"), msg.alias("msg"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.regexp_replace(
            F.col("msg"), r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"
        ).alias("msg_redacted"),
        F.mask(F.col("msg")).alias("msg_masked"),
    )


@query("fn_array_hof", oracle="""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
t AS (SELECT vec_id, v,
        list_transform(list_slice(list_reverse_sort(v), 1, 3),
                       x -> round(x, 6)) AS top3
      FROM e)
SELECT vec_id,
  round(list_aggregate(v, 'sum'), 6) AS v_sum,
  CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
  (len(list_filter(v, x -> x > 0.5)) > 0) AS has_big,
  round(v[1] + v[len(v)], 6) AS ends_sum,
  top3[1] AS top1, top3[2] AS top2, top3[3] AS top3
FROM t
""")
def fn_array_hof(spark, sf_dir):
    """Higher-order array functions (transform/filter/exists/aggregate/
    zip_with/sort/slice) — the JVM-side vector toolkit every embedding
    kernel here builds on, hash-checked elementwise.

    The top-3 array is computed with transform+slice+sort_array and then
    unpacked into scalar columns so every result cell is hashable by the
    driver canonicalizer (list cells broke the r2 compare; VERDICT r2
    item 1)."""
    from ..functions.vectors import as_double

    emb = load(spark, sf_dir, "embeddings")
    v = as_double("embedding")
    top3 = F.transform(
        F.slice(F.sort_array(v, asc=False), 1, 3), lambda x: F.round(x, 6)
    )
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("v_sum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.exists(v, lambda x: x > 0.5).alias("has_big"),
        F.round(
            F.zip_with(v, F.reverse(v), lambda x, y: x + y).getItem(0), 6
        ).alias("ends_sum"),
        top3.getItem(0).alias("top1"),
        top3.getItem(1).alias("top2"),
        top3.getItem(2).alias("top3"),
    )


@query("fn_luhn_mask", oracle="""
WITH p AS (SELECT doc_id,
             lpad(CAST(400000000000000 + (doc_id * 7919) % 100000000
                       AS VARCHAR), 15, '0') AS pay
           FROM documents),
c AS (SELECT doc_id, pay,
        list_sum([CASE WHEN i % 2 = 1
            THEN CASE WHEN (ascii(reverse(pay)[i]) - 48) * 2 > 9
                      THEN (ascii(reverse(pay)[i]) - 48) * 2 - 9
                      ELSE (ascii(reverse(pay)[i]) - 48) * 2 END
            ELSE ascii(reverse(pay)[i]) - 48 END
          FOR i IN range(1, 16)]) AS s15
      FROM p),
m AS (SELECT doc_id,
        pay || CAST((10 - s15 % 10) % 10 AS VARCHAR) AS vc,
        pay || CAST(((10 - s15 % 10) % 10 + 5) % 10 AS VARCHAR) AS ic
      FROM c),
msgs AS (SELECT doc_id, vc,
           'pay ' || vc || ' ref ' || ic || ' end' AS msg
         FROM m)
SELECT doc_id,
       CAST(len(regexp_extract_all(msg, '[0-9]{16}')) AS INT)
         AS n_candidates,
       CAST(1 AS INT) AS n_valid,
       replace(msg, vc, '<CARD>') AS msg_masked
FROM msgs
""")
def fn_luhn_mask(spark, sf_dir):
    """Checksum-validated PII masking (`luhn_valid`/`mask_valid_cards`,
    functions/text.py): each doc gets a synthetic message holding TWO
    16-digit runs — one with a correct Luhn check digit, one with it
    shifted by 5 — and the masker must redact ONLY the valid one.
    Regex alone cannot make that distinction (it would mask order ids
    and timestamps too); the Luhn fold is a pure codegen expression,
    so validation costs nothing at scale. The oracle replays the
    check-digit construction AND the selective replacement; candidate
    count, valid count, and the masked message all hash-checked."""
    from ..functions.text import luhn_valid, mask_valid_cards

    docs = load(spark, sf_dir, "documents")
    pay = F.lpad(
        (F.lit(400000000000000) + (F.col("doc_id") * 7919) % 100000000)
        .cast("string"), 15, "0")
    rev = F.reverse(pay)
    digit = lambda i: F.ascii(rev.substr(i, F.lit(1))) - 48  # noqa: E731
    term = lambda i: F.when(  # noqa: E731
        i % 2 == 1,
        F.when(digit(i) * 2 > 9, digit(i) * 2 - 9)
        .otherwise(digit(i) * 2),
    ).otherwise(digit(i))
    s15 = F.aggregate(
        F.sequence(F.lit(1), F.lit(15)), F.lit(0),
        lambda acc, i: acc + term(i))
    check = (10 - s15 % 10) % 10
    vc = F.concat(pay, check.cast("string"))
    ic = F.concat(pay, ((check + 5) % 10).cast("string"))
    msg = F.concat(F.lit("pay "), vc, F.lit(" ref "), ic, F.lit(" end"))
    d = docs.select("doc_id", msg.alias("msg"))
    cands = F.regexp_extract_all(F.col("msg"), F.lit(r"[0-9]{16}"), 0)
    return d.select(
        "doc_id",
        F.size(cands).alias("n_candidates"),
        F.size(F.filter(cands, luhn_valid)).alias("n_valid"),
        mask_valid_cards("msg").alias("msg_masked"),
    )


@query("fn_edit_distance", oracle="""
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 50)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
  round(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        / greatest(length(a.p_name), length(b.p_name)), 6) AS similarity
FROM p a JOIN p b ON a.p_partkey < b.p_partkey
ORDER BY dist, id_a, id_b LIMIT 25
""")
def fn_edit_distance(spark, sf_dir):
    """Levenshtein battery: pairwise edit distance + normalized
    similarity over the first 50 part names (both engines implement
    the identical Wagner-Fischer integer DP), top-25 closest pairs —
    the builtin-distance surface under the `join_fuzzy_del1`
    deletion-neighborhood join."""
    p = load(spark, sf_dir, "part").filter(
        F.col("p_partkey") <= 50).select("p_partkey", "p_name")
    a = p.select(F.col("p_partkey").alias("id_a"),
                 F.col("p_name").alias("na"))
    b = p.select(F.col("p_partkey").alias("id_b"),
                 F.col("p_name").alias("nb"))
    d = F.levenshtein("na", "nb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", d.cast("int").alias("dist"),
            F.round(
                1.0 - d.cast("double")
                / F.greatest(F.length("na"), F.length("nb")), 6)
            .alias("similarity"))
        .orderBy("dist", "id_a", "id_b")
        .limit(25)
    )


@query("fn_encryption_roundtrip", oracle="""
SELECT c_custkey,
  TRUE AS ecb_roundtrip_ok,
  TRUE AS cbc_roundtrip_ok,
  TRUE AS ecb_deterministic,
  CAST(length(c_name) AS INT) AS plain_len
FROM customer ORDER BY c_custkey
""")
def fn_encryption_roundtrip(spark, sf_dir):
    """Column-level encryption surface (`aes_encrypt`/`aes_decrypt` —
    the at-rest PII protection sibling of the masking gates): per
    customer name, ECB and CBC(fixed-IV) roundtrips must recover the
    plaintext and ECB must be deterministic (same input, same
    ciphertext — the property that keeps encrypted columns joinable,
    and the leak that bans ECB for anything else). AES itself is not
    SQL-replayable, so the gate emits the CHECK BITS; a broken
    key-path, padding, or IV regression flips them against the
    oracle's expected-true rows."""
    cust = load(spark, sf_dir, "customer")
    key = "0123456789abcdef"
    return cust.selectExpr(
        "c_custkey",
        f"aes_decrypt(aes_encrypt(c_name, '{key}', 'ECB'),"
        f" '{key}', 'ECB') = CAST(c_name AS BINARY)"
        " AS ecb_roundtrip_ok",
        f"aes_decrypt(aes_encrypt(c_name, '{key}', 'CBC', 'DEFAULT',"
        f" CAST('0000000000000000' AS BINARY)),"
        f" '{key}', 'CBC') = CAST(c_name AS BINARY)"
        " AS cbc_roundtrip_ok",
        f"base64(aes_encrypt(c_name, '{key}', 'ECB'))"
        f" = base64(aes_encrypt(c_name, '{key}', 'ECB'))"
        " AS ecb_deterministic",
        "CAST(length(c_name) AS INT) AS plain_len",
    ).orderBy("c_custkey")


#: LPM gate fixture: a mix of prefix lengths, the four /2 blocks cover
#: the whole address space so every synthesized IP matches something and
#: the narrower blocks must WIN via longest-prefix, not mere membership.
CIDR_BLOCKS = [
    "0.0.0.0/2", "64.0.0.0/2", "128.0.0.0/2", "192.0.0.0/2",
    "200.0.0.0/6", "10.0.0.0/8", "100.64.0.0/10", "172.16.0.0/12",
    "192.168.0.0/16", "8.8.8.0/24",
]


def _cidr_oracle() -> str:
    def net_sh(cidr: str) -> tuple[int, int]:
        net_txt, plen = cidr.split("/")
        a, b, c, d = (int(x) for x in net_txt.split("."))
        net = (a << 24) | (b << 16) | (c << 8) | d
        return net >> (32 - int(plen)), int(plen)

    vals = ", ".join(
        f"('{c}', {net_sh(c)[0]}, {net_sh(c)[1]})" for c in CIDR_BLOCKS
    )
    return f"""
WITH ev AS (SELECT event_id, user_id,
                   (event_id * 2654435761) % 4294967296 AS ip
            FROM events),
b(cidr, net_sh, plen) AS (VALUES {vals}),
m AS (SELECT e.event_id, e.user_id, e.ip, b.cidr, b.plen
      FROM ev e JOIN b ON (e.ip >> (32 - b.plen)) = b.net_sh
      QUALIFY row_number()
        OVER (PARTITION BY e.event_id ORDER BY b.plen DESC, b.cidr) = 1)
SELECT cidr, CAST(plen AS INT) AS prefix_len,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(MIN(ip) >> 24 AS VARCHAR) || '.' ||
       CAST((MIN(ip) >> 16) & 255 AS VARCHAR) || '.' ||
       CAST((MIN(ip) >> 8) & 255 AS VARCHAR) || '.' ||
       CAST(MIN(ip) & 255 AS VARCHAR) AS min_ip
FROM m GROUP BY 1, 2
"""


@query("fn_ip_cidr", oracle=_cidr_oracle())
def fn_ip_cidr(spark, sf_dir):
    """IPv4 parse/format + CIDR longest-prefix-match join
    (`operators/net.py` — the origin-network bucketing of a crawl
    pipeline: blocklist joins, private/CGNAT filtering, per-block rate
    stats). IPs are synthesized from event_id (Knuth multiplicative
    hash mod 2^32), FORMATTED to dotted-quad text, then the operator
    parses them back and LPM-matches against a mixed-length block
    table: one broadcast equi-join per distinct prefix length plus one
    coalesce — no nested loop, no shuffle, no window. The oracle
    replays hash, shift-probe, and QUALIFY-row_number LPM in SQL; the
    /2 fallbacks guarantee full coverage so narrower blocks must win
    by LENGTH, which is exactly what a between-join bug would break."""
    from ..operators.net import cidr_lpm_match, long_to_ipv4

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        long_to_ipv4(
            (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
        ).alias("ip_text"),
    )
    blocks = spark.createDataFrame(
        [(c,) for c in CIDR_BLOCKS], ["cidr"]
    )
    matched = cidr_lpm_match(ev, "ip_text", blocks)
    return matched.groupBy("cidr", "prefix_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        long_to_ipv4(F.min("ip_long")).alias("min_ip"),
    )


@query("fn_pii_mask", oracle="""
WITH m AS (SELECT doc_id,
    'contact user' || doc_id || '@' || source || '.org or 10.'
      || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
      || ' tel +49 30 ' || CAST(1000 + doc_id % 9000 AS VARCHAR)
      || '-' || CAST(100 + doc_id % 900 AS VARCHAR)
      || ' ref ' || substr(text, 1, 24) AS msg
  FROM documents)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(msg,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
      '\\+\\d{1,3}[ -]\\d{2,4}[ -]\\d{3,4}[ -]\\d{3,4}\\b', '<PHONE>', 'g')
    AS redacted,
  CAST(len(regexp_extract_all(msg,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_emails,
  CAST(len(regexp_extract_all(msg,
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ips
FROM m
""")
def fn_pii_mask(spark, sf_dir):
    """Typed PII redaction (`mask_pii`, functions/text.py): emails,
    IPv4 literals, and international phone numbers replaced by typed
    tokens in precedence order (emails first — their domains can
    embed dotted quads), plus per-doc hit counts for a redaction
    audit. PII is synthesized deterministically from columns; the
    patterns are the RE2/Java common subset (lookaround-free — the
    checksum-gated card masker is the separate `fn_luhn_mask`).
    Zero shuffles, pure codegen scans."""
    docs = load(spark, sf_dir, "documents")
    msg = F.concat(
        F.lit("contact user"), F.col("doc_id"), F.lit("@"),
        F.col("source"), F.lit(".org or 10."),
        (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" tel +49 30 "),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit("-"), (F.lit(100) + F.col("doc_id") % 900).cast("string"),
        F.lit(" ref "), F.substring("text", 1, 24),
    )
    m = docs.select("doc_id", msg.alias("msg"))
    from ..functions.text import EMAIL_PATTERN, IPV4_PATTERN, mask_pii

    return m.select(
        "doc_id",
        mask_pii("msg").alias("redacted"),
        F.regexp_count("msg", F.lit(EMAIL_PATTERN)).cast("long")
        .alias("n_emails"),
        F.regexp_count("msg", F.lit(IPV4_PATTERN)).cast("long")
        .alias("n_ips"),
    )


@query("fn_arg_extremes", oracle="""
WITH k AS (SELECT c_mktsegment, c_name, c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) * 10000000
               + c_custkey AS ord
           FROM customer)
SELECT c_mktsegment,
  arg_min(c_name, ord) AS poorest,
  arg_max(c_name, ord) AS richest,
  CAST(arg_max(c_custkey, ord) AS BIGINT) AS richest_key,
  min(c_name) AS first_name
FROM k GROUP BY c_mktsegment
""")
def fn_arg_extremes(spark, sf_dir):
    """Argument-extremum aggregates (max_by/min_by <-> DuckDB
    arg_max/arg_min): per segment the names at the balance extremes.
    Bare max_by over a non-unique ordering key is NONDETERMINISTIC on
    both engines — the deterministic idiom packs (balance, tie-break
    key) into ONE exact integer ordering key (cents * 1e7 + custkey;
    DuckDB 1.0's arg_min rejects struct keys, so a scalar composite
    is also the portable spelling). One shuffle, partial-aggregated."""
    cust = load(spark, sf_dir, "customer")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("long") * 10000000
        + F.col("c_custkey")
    )
    return cust.groupBy("c_mktsegment").agg(
        F.min_by("c_name", key).alias("poorest"),
        F.max_by("c_name", key).alias("richest"),
        F.max_by("c_custkey", key).cast("long").alias("richest_key"),
        F.min("c_name").alias("first_name"),
    )
