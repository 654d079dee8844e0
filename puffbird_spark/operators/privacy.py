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
