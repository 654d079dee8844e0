"""Privacy re-identification audits: k-anonymity and l-diversity.

EXT training-pipeline coverage (the reference ships none): before a
table with quasi-identifiers leaves a curation pipeline, the release
gate is Sweeney's k-anonymity — every quasi-identifier combination must
be shared by >= k rows — and Machanavajjhala's l-diversity — each such
equivalence class must carry >= l distinct values of the sensitive
attribute (a k-anonymous class with ONE sensitive value still leaks it).

Scale design: one groupBy over the quasi-identifier tuple computing
class size and exact distinct sensitive count — a single shuffle on the
QI key, partial-aggregated map-side; no window, no self-join. The audit
output is class-grain (bounded by QI cardinality, far smaller than the
input), so the suppression decision joins back broadcast-style.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_audit",
    "suppress_small_classes",
    "dp_noisy_counts",
    "dp_noisy_mean",
    "dp_quantiles",
]


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    ell: int = 2,
) -> DataFrame:
    """One row per equivalence class (distinct quasi-identifier tuple):
    ``class_size``, ``l_distinct`` (exact distinct sensitive values),
    and the two violation flags. A released table satisfies
    (k, l)-anonymity iff no row has either flag set."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    agg = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct(sensitive_col).cast("long").alias("l_distinct"),
    )
    return agg.withColumn(
        "k_violation", F.col("class_size") < F.lit(int(k))
    ).withColumn("l_violation", F.col("l_distinct") < F.lit(int(ell)))


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    ell: int = 2,
) -> DataFrame:
    """The enforcement sibling: drop every row belonging to a violating
    class. The class audit is tiny (QI-cardinality rows) so the
    anti-join broadcasts."""
    bad = (
        k_anonymity_audit(df, quasi_cols, sensitive_col, k=k, ell=ell)
        .filter(F.col("k_violation") | F.col("l_violation"))
        .select(*quasi_cols)
    )
    return df.join(F.broadcast(bad), on=quasi_cols, how="left_anti")


_MIN_SALT_LEN = 16


def _require_secret_salt(salt: str) -> None:
    """The Laplace draw is a PRF of ``salt || group key``. Anyone who
    knows the salt can recompute the draw and subtract it, recovering
    the exact value — so the DP guarantee holds ONLY while the salt is
    a secret, high-entropy key (treat it exactly like an HMAC key; a
    public or guessable salt voids the guarantee entirely). There is
    deliberately no default, and a short salt is rejected outright
    (ADVICE r8 #2)."""
    if not isinstance(salt, str) or len(salt) < _MIN_SALT_LEN:
        raise ValueError(
            "salt must be a caller-supplied secret of at least "
            f"{_MIN_SALT_LEN} characters (a PRF key — the DP guarantee "
            "fails if it is public, guessable, or reused across "
            "releases); got "
            + (f"{len(salt)} chars" if isinstance(salt, str) else
               type(salt).__name__)
        )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    salt: str,
    epsilon: float = 1.0,
    round_dp: int = 6,
    include_exact: bool = False,
) -> DataFrame:
    """Differentially-private group counts (Dwork 2006): count per
    group plus Laplace(1/epsilon) noise — sensitivity 1 for a count —
    released as ``noisy_count`` (floored at 0).

    The noise is NOT drawn from RNG state: a retried Spark task would
    redraw and double-release. It is a pure function of the group key —
    ``laplace_noise(salt || key)`` inverts the Laplace CDF over an
    md5-derived uniform (functions/hashing.py) — so the release is
    reproducible across retries, partitionings, and engines. The flip
    side (ADVICE r8 #2): ``salt`` is the entire secret. It must be a
    caller-supplied high-entropy key, kept as secret as the raw data;
    with a known salt anyone recomputes the draw and recovers the exact
    count. Determinism also means re-releasing the SAME table redraws
    nothing (no budget burn-down across re-runs); use a fresh secret
    salt per release epoch, and account epsilon per DISTINCT salt.

    ``exact_count`` is withheld unless ``include_exact=True`` — that
    flag is for in-house accuracy audits only, never for a frame that
    leaves the pipeline (releasing it alongside the noisy value defeats
    the mechanism trivially).

    Scale: one shuffle (the groupBy, map-side partial), noise computed
    group-grain (output-sized, not input-sized)."""
    from ..functions.hashing import laplace_noise

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    _require_secret_salt(salt)
    key = F.concat_ws(
        "|", F.lit(salt), *[F.col(c).cast("string") for c in group_cols]
    )
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    noise = laplace_noise(key, scale=1.0 / float(epsilon), round_dp=round_dp)
    released = agg.select(
        *group_cols,
        "exact_count",
        F.round(
            F.greatest(
                F.col("exact_count").cast("double") + noise, F.lit(0.0)
            ),
            round_dp,
        ).alias("noisy_count"),
    )
    if include_exact:
        return released
    return released.drop("exact_count")


def dp_noisy_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    clamp: float,
    salt: str,
    epsilon: float = 1.0,
    round_dp: int = 6,
    include_exact: bool = False,
) -> DataFrame:
    """Differentially-private group means via the clamp-and-noise
    recipe: values clamp to ``[0, clamp]`` (bounding the sensitivity
    — an unbounded value makes DP impossible), the clamped sum gets
    Laplace(clamp/eps_half) noise and the count Laplace(1/eps_half)
    noise with the budget split evenly, and the released mean is
    their ratio (clamped back into ``[0, clamp]``). Same retry-safe
    determinism — and the same secret-salt contract — as
    :func:`dp_noisy_counts`: both draws are pure functions of the
    group key on disjoint suffixes of the caller's secret salt, so a
    public salt voids the guarantee (ADVICE r8 #2). ``exact_n`` is
    withheld unless ``include_exact=True`` (in-house audits only).
    Exact decimal sums under the clamp keep the pre-noise value
    engine-identical. One shuffle; noise at output grain."""
    from ..functions.hashing import laplace_noise

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if epsilon <= 0 or clamp <= 0:
        raise ValueError("epsilon and clamp must be > 0")
    _require_secret_salt(salt)
    eps_half = float(epsilon) / 2.0
    v = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clamp)),
    )
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.round(v, 6).cast("decimal(28,6)")).alias("__sum"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    key_sum = F.concat_ws(
        "|", F.lit(salt + "s"),
        *[F.col(c).cast("string") for c in group_cols])
    key_cnt = F.concat_ws(
        "|", F.lit(salt + "c"),
        *[F.col(c).cast("string") for c in group_cols])
    noisy_sum = (
        F.col("__sum").cast("double")
        + laplace_noise(key_sum, scale=float(clamp) / eps_half,
                        round_dp=round_dp)
    )
    noisy_n = F.greatest(
        F.col("__n").cast("double")
        + laplace_noise(key_cnt, scale=1.0 / eps_half,
                        round_dp=round_dp),
        F.lit(1.0),
    )
    mean = F.least(
        F.greatest(noisy_sum / noisy_n, F.lit(0.0)), F.lit(float(clamp)))
    released = agg.select(
        *group_cols,
        F.col("__n").alias("exact_n"),
        F.round(mean, round_dp).alias("noisy_mean"),
    )
    if include_exact:
        return released
    return released.drop("exact_n")


def dp_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    salt: str,
    epsilon: float = 1.0,
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 256,
    round_dp: int = 6,
) -> DataFrame:
    """Differentially-private quantiles via the EXPONENTIAL MECHANISM
    over a fixed candidate grid (McSherry & Talwar 2007; Smith 2011
    for the quantile utility): candidate grid lines
    ``c_j = lo + j·(hi-lo)/n_bins`` (j = 0..n_bins) score

        u_j = -| rank(c_j) - q·n |,   rank(c_j) = #{v : bin(v) < j}

    (sensitivity 1 under add/remove-one), and the released quantile is
    sampled with probability ∝ exp(ε'·u/2) where ``ε' = ε/len(quantiles)``
    (sequential composition across the requested quantiles).

    Sampling is the GUMBEL-MAX trick, deterministic: argmax of
    ``ε'·u_j/2 + Gumbel(md5(salt|qi|j))`` is an exact softmax sample,
    is a pure function of (salt, quantile index, candidate index) — a
    retried task redraws NOTHING — and replays exactly in a SQL
    oracle. As with `dp_noisy_counts`, the salt IS the secret: with a
    known salt the draw is recomputable and the guarantee void; use a
    fresh high-entropy secret per release epoch.

    ``lo``/``hi`` MUST be caller-supplied domain bounds (data-derived
    bounds would leak); values outside clamp into the edge bins. The
    selection key rounds at 9 dp before the argmax (cross-engine libm
    policy), ties break on the smaller candidate index.

    Scale shape: ONE input-sized aggregation (the bin histogram —
    map-side combined, ≤ ``n_bins`` rows out); everything after is
    candidate-grain: the rank join is n_bins² ≤ ~10⁷ tiny rows, the
    argmax a window over n_bins·Q rows. ``n_bins`` caps at 4096.

    Returns one row per requested quantile:
    ``(quantile DOUBLE, value DOUBLE)``."""
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if any(not (0.0 <= q <= 1.0) for q in quantiles):
        raise ValueError(f"quantiles must lie in [0, 1], got {quantiles}")
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    if not (1 <= n_bins <= 4096):
        raise ValueError(f"n_bins must be in [1, 4096], got {n_bins}")
    _require_secret_salt(salt)
    from ..functions.hashing import gumbel_noise

    spark = df.sparkSession
    nb = int(n_bins)
    lo_f, hi_f = float(lo), float(hi)
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(
            F.floor((v - F.lit(lo_f)) / (F.lit(hi_f) - F.lit(lo_f))
                    * F.lit(float(nb))).cast("long"),
            F.lit(0)),
        F.lit(nb - 1))
    cnt = (
        df.filter(v.isNotNull()).select(bin_.alias("__bin"))
        .groupBy("__bin").agg(F.count(F.lit(1)).alias("__c"))
    )
    total = cnt.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
    cand = spark.range(0, nb + 1).select(F.col("id").alias("__j"))
    ranks = (
        cand.join(cnt, cnt["__bin"] < cand["__j"], "left")
        .groupBy("__j")
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__rank"))
    )
    eps_q = float(epsilon) / len(quantiles)
    scored = (
        ranks.crossJoin(F.broadcast(total))
        .select(
            "__j", "__rank", "__n",
            F.posexplode(F.array(*[
                F.lit(float(q)) for q in quantiles])).alias("__qi", "__q"))
    )
    prf = F.concat_ws(
        "|", F.lit(salt), F.col("__qi").cast("string"),
        F.col("__j").cast("string"))
    key = F.round(
        F.lit(-eps_q / 2.0)
        * F.abs(F.col("__rank").cast("double")
                - F.col("__q") * F.col("__n").cast("double"))
        + gumbel_noise(prf), 9)
    from pyspark.sql.window import Window

    w = Window.partitionBy("__qi").orderBy(F.desc("__key"), F.asc("__j"))
    return (
        scored.select("__qi", "__q", "__j", key.alias("__key"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__q").alias("quantile"),
            F.round(
                F.lit(lo_f) + F.col("__j").cast("double")
                * (F.lit(hi_f) - F.lit(lo_f)) / F.lit(float(nb)),
                round_dp).alias("value"))
    )
