"""Connected components over candidate-pair edges — the cluster-resolution
stage of a fuzzy-dedup pipeline (MinHash/SimHash pairs in, one canonical
cluster id per document out).

Algorithm: iterative min-label propagation. Every vertex starts labeled
with itself; each round a vertex takes the minimum of its own label and its
neighbors' labels; at fixpoint the label is the component's minimum vertex
id. Rounds needed = graph diameter (duplicate clusters are near-cliques, so
2-3 rounds in practice; ``max_iter`` bounds pathological chains).

Scale design:
- each round is ONE join (edges ⋈ labels, both keyed) + one groupBy min —
  no all-pairs step, partitioning stable on the vertex key across rounds;
- ``localCheckpoint`` after every round truncates the lineage — without it
  the plan doubles per iteration and the job dies on planning time long
  before data size matters;
- convergence is detected with a count of changed labels (one cheap action
  per round on the already-materialized checkpoint).

Each round ends with a path-halving shortcut (relabel through the label
table itself: ``comp ← label(comp)``), so convergence is O(log diameter)
rather than O(diameter) — 20 rounds cover any graph a dedup pipeline can
produce. If the budget is still exhausted without a fixpoint the operator
warns instead of returning silently split components (ADVICE r2).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    assume_distinct: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve undirected edges into components.

    Returns (vertex, component) where ``component`` is the minimum vertex
    id reachable from ``vertex``. Only vertices that appear in an edge are
    returned (isolated docs are their own cluster by definition — join
    back with a coalesce if the full corpus mapping is needed).

    ``assume_distinct``: skip the edge-dedup shuffle when the caller
    guarantees unique (src, dst) pairs with src != dst — true for LSH
    candidate pairs, which end in ``dropDuplicates`` with ``id_a < id_b``.
    Duplicate edges would not corrupt results (min is idempotent), only
    inflate the per-round join, so this is a pure optimization knob.
    """
    # both directions via ONE explode, not a self-union: a union's two
    # branches each re-evaluate the whole upstream pipeline (for LSH
    # candidate pairs that doubled the MinHash stage — measured 14s → 8s
    # end-to-end at 100k docs/1M pairs), while the explode doubles rows in
    # a single pass over one evaluation.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
            )
        ).alias("__e")
    ).select("__e.s", "__e.d")
    if not assume_distinct:
        edges = edges.distinct()
    edges = edges.localCheckpoint(eager=True)
    # round-0 fold (r14, guide §2.4): starting from identity labels,
    # the loop's first round reduces to comp = min(v, min of DIRECT
    # neighbors) — so compute that directly as ONE keyed aggregation
    # over the materialized edges instead of checkpointing identity
    # labels and paying the first round's two joins + convergence
    # count against them. (The skipped round-1 path-halving jump is
    # label∘label over identity labels' propagation — on deep chains
    # this can cost one extra LATE round, but near-dup components are
    # stars/cliques that now finish in the fold itself: dedup_clusters
    # converges in 1 loop round instead of 2 at the driven SFs.) The
    # min-label fixpoint is unique and the loop still runs to
    # changed == 0, so results are identical by construction.
    labels = (
        edges.groupBy("s")
        .agg(F.least(F.col("s"), F.min("d")).alias("comp"))
        .select(F.col("s").alias("v"), "comp")
        .localCheckpoint(eager=True)
    )
    if stats is not None:
        stats["edges"] = edges.count()
        stats["rounds"] = 0
    changed = 0
    for _ in range(max_iter):
        if stats is not None:
            stats["rounds"] += 1
        neighbor_min = (
            edges.join(labels, edges.d == labels.v)
            .groupBy("s")
            .agg(F.min("comp").alias("nmin"))
        )
        propagated = labels.join(
            neighbor_min, labels.v == neighbor_min.s, "left"
        ).select(
            "v",
            F.col("comp").alias("__old"),
            F.least(
                F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
            ).alias("comp"),
        )
        # path halving: comp ← label(comp). Labels only decrease and
        # label(x) ≤ x, so this jump is always valid; combined with the
        # neighbor step it makes long chains converge in O(log d) rounds.
        relabel = propagated.select(
            F.col("v").alias("__cv"), F.col("comp").alias("__cc")
        )
        new_labels = (
            propagated.join(relabel, propagated.comp == relabel.__cv, "left")
            .select(
                "v",
                "__old",
                F.coalesce(F.col("__cc"), F.col("comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        # labels only decrease, so "comp < __old" IS the change set.
        # LAZY checkpoint + full count: the count computes every
        # partition of the marked RDD, so ONE job materializes the
        # round's labels (persisting blocks + truncating lineage,
        # exactly like the eager form) AND returns the convergence
        # signal — the r13 shape paid a checkpoint job plus a separate
        # count job per round (guide §1.2: at bench SF the iterative
        # operators are driver-job-bound, not data-bound).
        changed = new_labels.filter(
            F.col("comp") < F.col("__old")).count()
        labels = new_labels.drop("__old")
        if changed == 0:
            break
    if changed != 0:
        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds — labels may split one component into several; raise "
            "max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("v").alias("vertex"), F.col("comp").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
    algorithm; no equivalent in the reference, which has no graph surface).

    Per round, every vertex u with neighborhood Γ(u) and
    ``m = min(Γ(u) ∪ {u})``:

    - large-star: re-attach every STRICTLY LARGER neighbor to m —
      edges {(v, m) : v ∈ Γ(u), v > u};
    - small-star: re-attach every smaller-or-equal neighbor and u itself
      to m — edges {(v, m) : v ∈ Γ(u), v ≤ u} ∪ {(u, m)}.

    Both operations preserve connectivity and never increase the edge
    count; at fixpoint the edge set is a star forest (v, component-min).
    The draw over min-label propagation: the EDGE LIST ITSELF CONTRACTS
    each round — a k-clique collapses toward k-1 star edges after one
    alternation — so later rounds join shrinking inputs, where min-label
    re-joins the full original edge list every round. On the near-clique
    graphs dedup actually produces that is the dominant cost term.
    Fixpoint test is edge-set stability (one anti-join on the contracted
    list per round). Differentially tested bit-equal to
    :func:`connected_components` (tests/test_operators.py)."""
    edges = pairs.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
    ).filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    vertices = (
        edges.select(F.explode(F.array("a", "b")).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star_pass(e: DataFrame, large: bool) -> DataFrame:
        adj = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("w")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("w")),
                )
            ).alias("__e")
        ).select("__e.u", "__e.w")
        mins = adj.groupBy("u").agg(F.min("w").alias("__mn")).select(
            "u", F.least(F.col("__mn"), F.col("u")).alias("m"))
        j = adj.join(mins, "u")
        if large:
            out = j.filter(F.col("w") > F.col("u")).select(
                F.col("w").alias("x"), F.col("m").alias("y"))
        else:
            out = j.filter(F.col("w") <= F.col("u")).select(
                F.col("w").alias("x"), F.col("m").alias("y")
            ).unionByName(
                mins.select(F.col("u").alias("x"), F.col("m").alias("y"))
            )
        return (
            out.filter(F.col("x") != F.col("y"))
            .select(
                F.least(F.col("x"), F.col("y")).alias("a"),
                F.greatest(F.col("x"), F.col("y")).alias("b"),
            )
            .distinct()
        )

    if stats is not None:
        stats["edges"] = edges.count()
        stats["rounds"] = 0
        stats["edges_per_round"] = []
    converged = False
    for _ in range(max_iter):
        new_edges = star_pass(star_pass(edges, large=True), large=False)
        new_edges = new_edges.localCheckpoint(eager=True)
        if stats is not None:
            stats["rounds"] += 1
            stats["edges_per_round"].append(new_edges.count())
        grew = new_edges.join(
            edges, ["a", "b"], "left_anti").limit(1).count()
        shrank = edges.join(
            new_edges, ["a", "b"], "left_anti").limit(1).count()
        edges = new_edges
        if grew == 0 and shrank == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components_star: no fixpoint after max_iter="
            f"{max_iter} rounds — labels may split one component into "
            "several; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    # star forest: every edge is (component-min a, member b); vertices
    # absent from the b side are component minima labeling themselves.
    # The groupBy-min keeps the output one-row-per-vertex even when the
    # budget was exhausted mid-contraction (a non-fixpoint edge set can
    # hold two (smaller, b) edges for one b — without the fold the
    # vertex would surface twice with conflicting labels).
    member = (
        edges.select(F.col("b").alias("vertex"), F.col("a").alias("component"))
        .groupBy("vertex")
        .agg(F.min("component").alias("component"))
    )
    roots = vertices.join(
        edges.select(F.col("b").alias("v")), "v", "left_anti"
    ).select(F.col("v").alias("vertex"), F.col("v").alias("component"))
    return member.unionByName(roots)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "minlabel",
) -> DataFrame:
    """Candidate pairs → (doc_id, cluster_id, is_canonical): the keep/drop
    decision of a fuzzy-dedup pipeline. ``cluster_id`` is the minimum
    doc id in the component; that doc is the canonical survivor.

    LSH candidate pairs are unique with id_a < id_b by construction
    (``minhash_candidate_pairs`` ends in dropDuplicates), so the CC edge
    list skips its dedup shuffle.

    ``algorithm``: ``minlabel`` (default — fewest Spark jobs per round,
    wins on the shallow near-clique graphs dedup produces at gate SF) or
    ``star`` (edge-contracting alternation — the round-count/edge-volume
    numbers for both are in NOTES.md round 5; star's contraction pays off
    as cluster sizes and diameters grow). Both produce identical output
    under differential test."""
    if algorithm == "star":
        comp = connected_components_star(pairs, id_a, id_b, max_iter)
    elif algorithm == "minlabel":
        comp = connected_components(pairs, id_a, id_b, max_iter,
                                    assume_distinct=True)
    else:
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    return comp.select(
        F.col("vertex").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("vertex") == F.col("component")).alias("is_canonical"),
    )


def incremental_components(
    new_pairs: DataFrame,
    state: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """INCREMENTAL connected components — fold a batch of new edges into
    an existing ``(vertex, component)`` mapping WITHOUT re-running CC
    over history (round 8; the cluster-resolution twin of the
    incremental dedup family): at 100 TB the dedup pair graph grows by
    append batches, and re-resolving the full graph per batch is the
    cost this operator deletes.

    Mechanics (all keyed joins, batch-sized except the final label
    update):

    1. relabel the batch's endpoints through the state (unknown
       vertices keep their own id) — two equi-joins on the BATCH;
    2. drop self-loops; the surviving CONTRACTED edges connect
       component representatives and brand-new vertices only — a graph
       bounded by the batch size, not the corpus;
    3. run the proven min-label CC on that contracted graph;
    4. one join relabels the state through the new roots (components
       are min-vertex labels, so the contracted minimum IS the global
       minimum), and the batch's unseen vertices append with their
       resolved roots.

    Replaying batches in any order equals one-shot CC over the union of
    all edges (unit-pinned; label = min vertex id of the component
    either way). Returns the NEW state — same schema, ready for the
    next batch."""
    sa = state.select(
        F.col("vertex").alias("__va"), F.col("component").alias("__ca"))
    sb = state.select(
        F.col("vertex").alias("__vb"), F.col("component").alias("__cb"))
    e = (
        new_pairs.select(F.col(id_a).alias("__a"), F.col(id_b).alias("__b"))
        .join(sa, F.col("__a") == F.col("__va"), "left")
        .join(sb, F.col("__b") == F.col("__vb"), "left")
        .select(
            F.coalesce("__ca", "__a").alias("__ra"),
            F.coalesce("__cb", "__b").alias("__rb"))
    )
    contracted = (
        e.filter(F.col("__ra") != F.col("__rb"))
        .select(
            F.least("__ra", "__rb").alias("id_a"),
            F.greatest("__ra", "__rb").alias("id_b"))
        .distinct()
    )
    roots = connected_components(
        contracted, "id_a", "id_b", max_iter, assume_distinct=True
    ).select(F.col("vertex").alias("__l"), F.col("component").alias("__r"))
    # the roots table is label-count-sized (only components being merged
    # this batch); both relabel joins consume it — materialize once
    roots = roots.localCheckpoint(eager=True)
    updated = (
        state.join(roots, state["component"] == F.col("__l"), "left")
        .select(
            "vertex", F.coalesce("__r", "component").alias("component"))
    )
    batch_vertices = (
        new_pairs.select(F.col(id_a).alias("vertex"))
        .unionByName(new_pairs.select(F.col(id_b).alias("vertex")))
        .distinct()
    )
    added = (
        batch_vertices.join(
            state.select("vertex"), "vertex", "left_anti")
        .join(roots, F.col("vertex") == F.col("__l"), "left")
        .select("vertex", F.coalesce("__r", "vertex").alias("component"))
    )
    return updated.unionByName(added)


def canonical_by_priority(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    priority_col: str = "priority",
    dp: int = 6,
) -> DataFrame:
    """Re-elect each dedup cluster's canonical survivor by QUALITY
    instead of min-id (round 8): production dedup keeps the BEST
    duplicate (highest quality score, longest text, preferred source),
    not the lowest id — min-id is only the deterministic default of the
    resolution step. Joins the cluster mapping to a per-doc priority
    and flags, per cluster, the row with the highest 6-dp-rounded
    priority (ties break to the smallest id, keeping determinism).

    Cost: one keyed join (id) + one cluster-keyed argmax — both shuffle
    id/score pairs only. Returns ``(id_col, cluster_col, priority_col,
    is_canonical)``."""
    p = F.round(F.col(priority_col).cast("double"), dp)
    j = clusters.select(id_col, cluster_col).join(
        scores.select(id_col, p.alias("__p")), id_col)
    best = j.groupBy(cluster_col).agg(
        F.max(F.struct(
            F.col("__p").alias("p"),
            (-F.col(id_col)).alias("negid"))).alias("__b"))
    return (
        j.join(best, cluster_col)
        .select(
            id_col, cluster_col,
            F.col("__p").alias(priority_col),
            ((F.col("__p") == F.col("__b.p"))
             & (-F.col(id_col) == F.col("__b.negid"))
             ).alias("is_canonical"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 8,
    damping: float = 0.85,
    dp: int = 9,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank (Brin & Page) over a directed edge list — the classic
    link-quality prior a web-scale curation pipeline feeds into
    document quality scores (domain/page authority as a filter or
    mixture feature).

    Power iteration, ``n_iter`` fixed rounds:
    ``r'(v) = (1-d)·t(v) + d·(Σ_{u→v} r(u)/outdeg(u) + dangling·t(v))``
    where ``dangling`` is the total rank parked on vertices without
    out-edges and ``t`` is the teleport distribution — uniform ``1/N``
    by default, or PERSONALIZED (Haveliwala 2002) when ``seeds`` is
    given: a one-column DataFrame of seed vertex ids, teleporting
    uniformly over the seeds only, so rank measures proximity to the
    trusted seed set (the standard seed-expansion selector for
    harvesting domain-relevant documents from a link graph).
    Vertices are everything appearing as source OR target.

    Engine-portable float policy: each iteration's rank rounds at
    ``dp`` (HALF_UP via ``F.round``), and every ORDER-FREE SUM — the
    per-vertex inflow and the dangling total — adds 1e12-scaled LONG
    terms, not raw doubles (ADVICE r8 #4: a raw double sum is
    partial-aggregation-order dependent, the same hazard the
    ewma/anova gates fixed; exact integer addition is the portability
    rule of NOTES.md, and long sums stay inside whole-stage codegen
    where a decimal snap measured 1.4× slower). Overflow-free by
    construction: both sums are bounded by the total rank mass ≈ 1.
    An oracle unrolling the same ``n_iter`` rounds in SQL replays
    value-for-value at any parallelism.

    Scale shape: per round ONE join (contributions = ranks ⋈ edges on
    the source key) + one groupBy sum on the target key — partitioning
    alternates between the two vertex keys, nothing is ever all-pairs;
    the dangling total and N ride one-row broadcast cross joins;
    ``localCheckpoint`` per round truncates the lineage (the
    connected-components lesson — planning time, not data, kills
    un-checkpointed iteration). Returns ``(vertex, rank)``.
    """
    if n_iter <= 0:
        raise ValueError("n_iter must be positive")
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # vertex table carries outdeg once (0 = dangling). The r13 shape
    # materialized base, then base+tel, then base+rank as THREE
    # sequential eager checkpoints; the last two are projections of the
    # first (n rides a broadcast one-row subquery over the checkpointed
    # verts), so ONE materialization carries all of it — two fewer
    # driver jobs before the first iteration (guide §1.2: job count is
    # the setup cost at bench SF, and nothing here changes per-round
    # work).
    base = verts.join(outdeg, verts.vertex == outdeg.src, "left").select(
        "vertex", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
    if seeds is None:
        n = verts.agg(F.count(F.lit(1)).alias("n"))
        base = (
            base.crossJoin(F.broadcast(n))
            .select("vertex", "outdeg",
                    (F.lit(1.0) / F.col("n")).alias("tel"))
        )
    else:
        seed_col = seeds.columns[0]
        s = seeds.select(
            F.col(seed_col).alias("vertex")).distinct()
        ns = s.agg(F.count(F.lit(1)).alias("ns"))
        base = (
            base.join(s.withColumn("__seed", F.lit(1)), "vertex", "left")
            .crossJoin(F.broadcast(ns))
            .select(
                "vertex", "outdeg",
                (F.coalesce("__seed", F.lit(0)).cast("double")
                 / F.col("ns")).alias("tel"))
        )
    base = base.select(
        "vertex", "outdeg", "tel", F.round("tel", dp).alias("rank")
    ).localCheckpoint(eager=True)
    ranks = base
    # Order-free sums via 1e12-scaled LONG arithmetic (ADVICE r8 #4):
    # each term snaps to the nearest integer multiple of 1e-12 BEFORE the
    # keyed sum, so addition is exact integer math — partial-agg-order
    # free at any parallelism — while staying inside whole-stage codegen
    # (a decimal(18,12) snap was value-identical but measured 1.4× slower
    # on the bench gate; long sums recover it). No overflow by
    # construction: a vertex's inflow and the dangling total are both
    # bounded by the TOTAL rank mass ≈ 1, i.e. ≤ ~1e12 after scaling,
    # independent of graph size.
    scale = F.lit(float(10 ** 12))
    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("outdeg") == 0)
            .agg((F.coalesce(
                F.sum(F.round(F.col("rank") * scale, 0).cast("long")),
                F.lit(0)) / scale).alias("dangling"))
        )
        contrib = (
            ranks.filter(F.col("outdeg") > 0)
            .join(e, ranks.vertex == e.src)
            .select(
                F.col("dst").alias("vertex"),
                F.round(F.col("rank") / F.col("outdeg") * scale, 0)
                .cast("long").alias("c"))
            .groupBy("vertex")
            .agg((F.sum("c") / scale).alias("inflow"))
        )
        ranks = (
            base.join(contrib, "vertex", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vertex", "outdeg", "tel",
                F.round(
                    (1.0 - damping) * F.col("tel")
                    + damping * (F.coalesce("inflow", F.lit(0.0))
                                 + F.col("dangling") * F.col("tel")),
                    dp).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("vertex", "rank")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 4,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) — community
    detection over an UNDIRECTED edge list, the cheap complement to
    :func:`connected_components` when components are too coarse
    (one giant connected web graph still has communities). Each vertex
    starts labeled with itself; per round every vertex adopts the most
    frequent label among its neighbors, ties broken to the SMALLEST
    label (the determinism the usual random tie-break forfeits —
    every round is exactly replayable, so a fixed-round unrolled SQL
    oracle can hash-match it). Vertices are edge endpoints (isolated
    vertices are their own community by definition, as in
    :func:`connected_components`); self-loops are dropped. Pure
    integer arithmetic — no float policy needed anywhere.

    Scale shape: edges symmetrize once (distinct, checkpointed); each
    round is one labels ⋈ edges join + one (vertex, label) count + one
    per-vertex top-1 window — all keyed on vertex ids, nothing
    all-pairs; ``localCheckpoint`` per round truncates lineage (the
    iterative-operator rule). Fixed ``n_iter`` rounds: synchronous LPA
    can oscillate on bipartite structures, so callers pick the round
    budget and read the labels as "communities after k rounds" —
    deterministic, not a fixpoint claim. Returns ``(vertex, label)``.
    """
    from pyspark.sql.window import Window

    if n_iter <= 0:
        raise ValueError("n_iter must be positive")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        und.select(F.col("a").alias("vertex")).distinct()
        .localCheckpoint(eager=True)
    )
    labels = verts.select("vertex", F.col("vertex").alias("label"))
    w = Window.partitionBy("vertex").orderBy(
        F.desc("n"), F.asc("label"))
    for _ in range(n_iter):
        neigh = (
            und.join(labels, und.b == labels.vertex)
            .select(F.col("a").alias("vertex"), "label")
            .groupBy("vertex", "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("vertex", F.col("label").alias("__new"))
        )
        labels = (
            labels.join(neigh, "vertex", "left")
            .select("vertex",
                    F.coalesce("__new", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 4,
    dp: int = 9,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list — the complement to :func:`pagerank` when the question is
    "what CURATES well" (hubs: pages whose outlinks concentrate on
    good content — link-list/index pages a crawl seeds from) vs "what
    IS good" (authorities).

    Classic mutual recursion, ``n_iter`` fixed rounds with L1
    normalization (sum-to-one — no cross-engine ``sqrt`` chains):

        a(v) ← Σ_{u→v} h(u), then a ← a / Σa
        h(u) ← Σ_{u→v} a(v), then h ← h / Σh

    Each normalized score rounds at ``dp`` (the engine-portable float
    policy — inflow addition order is unguaranteed everywhere, the
    :func:`pagerank` rule), so a SQL oracle unrolling the same rounds
    replays value-for-value. Returns ``(vertex, hub, authority)``.

    Scale shape: two keyed join+sum passes per round (alternating
    partitioning between the two vertex keys), the two normalizers
    ride one-row broadcast cross joins, ``localCheckpoint`` per round
    truncates lineage. Nothing all-pairs, nothing collected."""
    if n_iter <= 0:
        raise ValueError("n_iter must be positive")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.agg(F.count(F.lit(1)).alias("n"))
    scores = (
        verts.crossJoin(F.broadcast(n))
        .select("vertex",
                F.round(F.lit(1.0) / F.col("n"), dp).alias("hub"),
                F.round(F.lit(1.0) / F.col("n"), dp).alias("auth"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        # 12-dp decimal snap before every order-free sum (the pagerank
        # portability rule, ADVICE r8 #4): the summed scores are 9-dp
        # rounded doubles, so the snap is exact and the sums engine-free
        a_raw = (
            scores.join(e, scores.vertex == e.src)
            .groupBy("dst").agg(
                F.sum(F.col("hub").cast("decimal(18,12)")).alias("ar"))
            .select(F.col("dst").alias("vertex"), "ar")
        )
        a_tot = a_raw.agg(F.sum("ar").alias("at"))
        dec0 = F.lit(0).cast("decimal(18,12)")
        auth = (
            scores.select("vertex", "hub")
            .join(a_raw, "vertex", "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "vertex", "hub",
                F.round(
                    F.coalesce(F.col("ar"), dec0).cast("double")
                    / F.col("at").cast("double"), dp
                ).alias("auth"))
            .localCheckpoint(eager=True)
        )
        h_raw = (
            auth.join(e, auth.vertex == e.dst)
            .groupBy("src").agg(
                F.sum(F.col("auth").cast("decimal(18,12)")).alias("hr"))
            .select(F.col("src").alias("vertex"), "hr")
        )
        h_tot = h_raw.agg(F.sum("hr").alias("ht"))
        scores = (
            auth.select("vertex", "auth")
            .join(h_raw, "vertex", "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "vertex",
                F.round(
                    F.coalesce(F.col("hr"), dec0).cast("double")
                    / F.col("ht").cast("double"), dp
                ).alias("hub"),
                "auth")
            .localCheckpoint(eager=True)
        )
    return scores.select("vertex", "hub", F.col("auth").alias("authority"))


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list — the
    classic distributed-graph benchmark and a real curation signal
    (triangle density separates organic link neighborhoods from link
    farms; clustering coefficient = triangles / wedges).

    The DEGREE-ORIENTATION algorithm (Chiba-Nishizeki / the standard
    MapReduce formulation): orient every edge from the lower-ranked
    endpoint to the higher, ranking vertices by ``(degree, id)`` —
    every triangle then has exactly ONE wedge whose center precedes
    both ends, so the wedge self-join's fan-out is bounded by the
    ORIENTED out-degree (<= O(sqrt(|E|)) on any graph — the reason
    this survives power-law hubs: a celebrity vertex of degree 10^6
    contributes wedges only toward its few higher-ranked peers, not
    10^12 pairs). One wedge join + one edge-existence semi-join +
    one explode-and-count; everything equi-keyed, nothing cartesian.
    Returns ``(vertex, n_triangles)`` for every vertex incident to at
    least one edge (0 rows included via the vertex table)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge toward the (degree, id)-higher endpoint
    ranked = (
        und.join(deg.select(F.col("v").alias("a"),
                            F.col("d").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"),
                         F.col("d").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db"))
                   & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")))
            .otherwise(
                F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e"))
        .select("e.lo", "e.hi")
        .localCheckpoint(eager=True)
    )
    w1 = ranked.select(F.col("lo").alias("c"), F.col("hi").alias("x"))
    w2 = ranked.select(F.col("lo").alias("c"), F.col("hi").alias("y"))
    wedges = (
        w1.join(w2, "c")
        .filter(F.col("x") < F.col("y"))
    )
    closing = und.select(
        F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    per_vertex = (
        tris.select(F.explode(F.array("c", "x", "y")).alias("vertex"))
        .groupBy("vertex").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    verts = deg.select(F.col("v").alias("vertex"))
    return (
        verts.join(per_vertex, "vertex", "left")
        .select(
            "vertex",
            F.coalesce("n_triangles", F.lit(0)).cast("long")
            .alias("n_triangles"))
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dp: int = 6,
) -> DataFrame:
    """Local clustering coefficient — ``2·T(v) / (d(v)·(d(v)−1))``,
    the fraction of a vertex's neighbor pairs that are themselves
    connected (Watts-Strogatz): the per-vertex ratio form of
    :func:`triangle_count`, and the standard link-farm/organic-
    neighborhood discriminator (farms interlink densely; organic
    hubs do not). Vertices with degree < 2 read 0 (no wedge to
    close). Exact integer counts, one ``dp``-rounded division.
    Returns ``(vertex, degree, n_triangles, coefficient)``."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("vertex"))
        .groupBy("vertex").agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count(edges)
    return (
        deg.join(tri, "vertex")
        .select(
            "vertex", "degree", "n_triangles",
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0 * F.col("n_triangles")
                    / (F.col("degree") * (F.col("degree") - 1)), dp))
            .otherwise(F.lit(0.0)).alias("coefficient"))
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 4,
) -> DataFrame:
    """Multi-source BFS over an undirected edge list: exact hop
    distance from the nearest seed, up to ``max_depth`` — the
    DISCRETE twin of personalized PageRank for seed-expansion
    selection ("everything within k links of the trusted set"), and
    the crawl-frontier primitive. Returns ``(vertex, dist)`` for
    every vertex reached within the budget (seeds at 0); unreached
    vertices are absent — the caller's filter IS the selection.

    Scale shape: classic frontier expansion — per round ONE join
    (frontier ⋈ edges) + one distinct + one anti-join against the
    settled set (only NEWLY reached vertices survive, so frontiers
    shrink as the ball saturates); ``localCheckpoint`` per round
    (the iterative rule). Rounds = ``max_depth``, not diameter —
    the budget is the caller's radius, never a convergence hope."""
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed_col = seeds.columns[0]
    dist = seeds.select(
        F.col(seed_col).alias("vertex"), F.lit(0).alias("dist")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist
    for k in range(1, max_depth + 1):
        nxt = (
            frontier.join(und, frontier.vertex == und.a)
            .select(F.col("b").alias("vertex"),
                    F.lit(k).alias("dist"))
            .distinct()
            .join(dist.select("vertex"), "vertex", "left_anti")
            .localCheckpoint(eager=True)
        )
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def k_core_peel(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """Vertices surviving ``rounds`` peels of the ``k``-core
    reduction: repeatedly delete vertices whose degree (within the
    surviving subgraph) is below ``k`` — the density filter web
    curation uses to separate tightly-linked cores from tendrils and
    spam chains (Seidman 1983). Fixed rounds, the :func:`label_propagation`
    truncation convention: the result is "after N peels", exactly
    replayable by an unrolled oracle — on most graphs the peel
    reaches fixpoint far earlier and further rounds are no-ops.

    Per round: one degree aggregation over the surviving edge set +
    one semi-join filter — everything keyed, lineage checkpointed.
    Returns ``(vertex, degree)`` of the surviving subgraph."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = und
    for _ in range(rounds):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("v"))
            .groupBy("v").agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.explode(F.array("a", "b")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def adamic_adar_links(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top: int = 20,
    max_center_degree: int | None = None,
    dp: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) — score every
    NON-adjacent pair by its common neighbors, each weighted by how
    exclusive it is::

        AA(x, y) = Σ_{z ∈ N(x) ∩ N(y)}  1 / ln(deg(z))

    the related-items / who-to-follow primitive (rare shared
    neighbors say more than celebrity hubs — that is the 1/ln).
    Returns the global ``top`` pairs: ``(id_a, id_b, score)``.

    Per-neighbor weights snap to 9-dp decimal before the per-pair sum
    (order-independent, the float policy); a wedge center always has
    degree >= 2, so ln never hits zero. Scale shape: one wedge
    self-join keyed on the center + one anti-join against the edge
    set — hub centers are the quadratic term, and
    ``max_center_degree`` drops them loudly (the documented recall
    trade every production common-neighbor job makes; celebrity hubs
    contribute ~0 weight anyway)."""
    import warnings as _w

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    # degree-1 centers have a single neighbor — no wedge to form, and
    # their 1/ln(1) would divide by zero under ANSI; drop them early
    centers = und.join(deg, "a").filter(F.col("d") >= 2).select(
        F.col("a").alias("z"), F.col("b").alias("n"), "d")
    if max_center_degree is not None:
        _w.warn(
            f"adamic_adar_links: centers over degree {max_center_degree} "
            "are dropped — scores on pairs only connected through "
            "super-hubs are lost (each contributes < "
            f"{1.0 / __import__('math').log(max_center_degree):.3f})")
        centers = centers.filter(F.col("d") <= max_center_degree)
    weight = F.round(1.0 / F.log(F.col("d")), 9).cast("decimal(20,9)")
    w1 = centers.select("z", F.col("n").alias("x"), weight.alias("__w"))
    w2 = centers.select("z", F.col("n").alias("y"))
    pairs = (
        w1.join(w2, "z")
        .filter(F.col("x") < F.col("y"))
        .join(
            und.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"], "left_anti")
        .groupBy(F.col("x").alias("id_a"), F.col("y").alias("id_b"))
        .agg(F.round(F.sum("__w").cast("double"), dp).alias("score"))
    )
    return pairs.orderBy(
        F.desc("score"), F.asc("id_a"), F.asc("id_b")).limit(top)


def jaccard_links(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top: int = 20,
    max_center_degree: int | None = None,
    dp: int = 6,
) -> DataFrame:
    """Jaccard-coefficient link prediction — score every NON-adjacent
    pair by neighborhood overlap::

        J(x, y) = |N(x) ∩ N(y)| / |N(x) ∪ N(y)|

    the size-normalized twin of :func:`adamic_adar_links` (Liben-Nowell
    & Kleinberg 2003 benchmark both): Adamic-Adar rewards *rare* shared
    neighbors, Jaccard penalizes unbalanced degrees — a pair sharing 3
    of 4 neighbors outranks a pair sharing 3 of 400. Returns the global
    ``top`` pairs as ``(id_a, id_b, common_neighbors, score)``.

    Everything is integer arithmetic until one final division
    (intersection via the wedge self-join, union via
    ``deg(x) + deg(y) - inter``), so the score is bit-identical across
    engines before the 6-dp round. Scale shape is the Adamic-Adar one:
    wedge self-join keyed on the center + anti-join against the edge
    set; ``max_center_degree`` drops super-hub centers loudly (the
    standard common-neighbor recall trade — a celebrity hub inflates
    the candidate set quadratically while its Jaccard contribution is
    diluted by the union term anyway)."""
    import warnings as _w

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    centers = und.select(F.col("a").alias("z"), F.col("b").alias("n"))
    if max_center_degree is not None:
        _w.warn(
            f"jaccard_links: centers over degree {max_center_degree} are "
            "dropped — pairs only connected through super-hubs lose those "
            "intersection contributions")
        centers = centers.join(
            deg.filter(F.col("d") <= max_center_degree)
            .select(F.col("a").alias("z")),
            "z", "left_semi")
    w1 = centers.select("z", F.col("n").alias("x"))
    w2 = centers.select("z", F.col("n").alias("y"))
    inter = (
        w1.join(w2, "z")
        .filter(F.col("x") < F.col("y"))
        .join(
            und.select(F.col("a").alias("x"), F.col("b").alias("y")),
            ["x", "y"], "left_anti")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
    )
    dx = deg.select(F.col("a").alias("x"), F.col("d").alias("__dx"))
    dy = deg.select(F.col("a").alias("y"), F.col("d").alias("__dy"))
    scored = (
        inter.join(dx, "x").join(dy, "y")
        .select(
            F.col("x").alias("id_a"),
            F.col("y").alias("id_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("__dx") + F.col("__dy")
                   - F.col("common_neighbors")),
                dp).alias("score"),
        )
    )
    return scored.orderBy(
        F.desc("score"), F.asc("id_a"), F.asc("id_b")).limit(top)


def modularity_communities(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "vertex",
    label_col: str = "label",
    dp: int = 6,
) -> DataFrame:
    """Newman-Girvan modularity per community (Newman & Girvan 2004)
    — the quality score OF a partition (from
    :func:`label_propagation`, :func:`connected_components`, or any
    labeling)::

        Q = Σ_c [ m_c/m − (d_c / 2m)² ]

    emitted as one row per community with its additive contribution
    ``(2m_c·2m − d_c²) / (2m)²`` — INTEGER numerator and denominator
    (2m = directed edge-row count, 2m_c = within-community rows,
    d_c = community degree sum), one division at the end, so the
    score replays exactly; Q itself is the plain sum of the rounded
    contributions. Edges symmetrize/dedup like every operator in this
    module; vertices missing from ``labels`` keep their own id as a
    singleton label (the LPA initial state). Two keyed joins + two
    grouped counts — nothing all-pairs. Returns
    ``(community, n_vertices, internal_edges, degree_sum,
    contribution)`` ordered by community."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lab = labels.select(
        F.col(vertex_col).alias("v"), F.col(label_col).alias("lbl"))
    verts = und.select(F.col("a").alias("v")).distinct()
    lab_full = (
        verts.join(lab, "v", "left")
        .select("v", F.coalesce("lbl", F.col("v")).alias("lbl"))
    )
    twom = und.agg(F.count(F.lit(1)).alias("__t"))
    degs = und.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("__d"))
    la = lab_full.select(F.col("v").alias("a"), F.col("lbl").alias("__la"))
    lb = lab_full.select(F.col("v").alias("b"), F.col("lbl").alias("__lb"))
    within = (
        und.join(la, "a").join(lb, "b")
        .filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("lbl"))
        .agg(F.count(F.lit(1)).alias("__mc2"))
    )
    comm = (
        lab_full.join(degs, "v")
        .groupBy("lbl")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"),
             F.sum("__d").alias("__dc"))
    )
    return (
        comm.join(within, "lbl", "left")
        .withColumn("__mc2", F.coalesce("__mc2", F.lit(0)))
        .crossJoin(F.broadcast(twom))
        .select(
            F.col("lbl").alias("community"),
            "n_vertices",
            (F.col("__mc2") / 2).cast("long").alias("internal_edges"),
            F.col("__dc").cast("long").alias("degree_sum"),
            F.round(
                (F.col("__mc2") * F.col("__t")
                 - F.col("__dc") * F.col("__dc")).cast("double")
                / (F.col("__t") * F.col("__t")), dp)
            .alias("contribution"),
        )
        .orderBy("community")
    )


def shortest_paths_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_hops: int = 4,
    validate_weights: bool = True,
) -> DataFrame:
    """Multi-source WEIGHTED shortest paths (Bellman-Ford, ``max_hops``
    relaxation rounds) over an undirected edge list with non-negative
    integer weights — the cost-aware sibling of :func:`bfs_distances`
    (crawl-cost budgets, weighted seed expansion). Returns
    ``(vertex, dist)`` = the minimum total weight over paths of at most
    ``max_hops`` edges from the nearest seed; unreached vertices are
    absent.

    Scale shape: per round ONE join from the IMPROVED frontier into the
    edge list, then a keyed min-merge with the settled table — the
    delta-relaxation cut keeps round cost proportional to the changing
    set, and is EXACT for the <=k-edge metric (any <=k-edge shortest
    path has a strictly-improving prefix chain, so every link is
    relaxed from a frontier member the round after its prefix settles).
    ``localCheckpoint`` per round (the iterative-plan rule); integer
    weights keep the min-merge engine-exact.

    ``validate_weights=False`` skips the eager non-negativity probe
    (one early-exit cluster round-trip per call) for hot paths whose
    edges are pre-validated — the contract still holds, it just isn't
    re-checked (ADVICE r11).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    # the delta-relaxation cut below is only exact for NON-NEGATIVE
    # weights (with a negative edge a <=k-edge shortest path need not
    # have a strictly-improving prefix chain, so the improved-frontier
    # pruning silently misses relaxations) — enforce the documented
    # contract with a limit-1 probe instead of computing garbage
    # (probe batch 7; the scd2_apply early-exit precedent)
    if validate_weights:
        bad = edges.filter(F.col(weight) < 0).limit(1).collect()
        if bad:
            raise ValueError(
                "shortest_paths_weighted requires non-negative weights "
                f"(found {bad[0][weight]!r}) — Bellman-Ford's "
                "delta-relaxation pruning is wrong under negative edges")
    und = (
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"),
            F.col(weight).cast("long").alias("w"))
        .union(edges.select(
            F.col(dst).alias("a"), F.col(src).alias("b"),
            F.col(weight).cast("long").alias("w")))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b").agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    seed_col = seeds.columns[0]
    dist = seeds.select(
        F.col(seed_col).alias("vertex"), F.lit(0).cast("long").alias("dist")
    ).distinct().localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_hops):
        cand = (
            frontier.join(und, frontier.vertex == und.a)
            .select(F.col("b").alias("vertex"),
                    (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("vertex").agg(F.min("dist").alias("dist"))
        )
        merged = (
            dist.unionByName(cand)
            .groupBy("vertex").agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = (
            merged.join(
                dist.withColumnRenamed("dist", "__old"), "vertex", "left")
            .filter(F.col("__old").isNull()
                    | (F.col("dist") < F.col("__old")))
            .select("vertex", "dist")
            .localCheckpoint(eager=True)
        )
        dist = merged
    return dist


def bipartite_projection(
    edges: DataFrame,
    left_col: str,
    right_col: str,
    weight_col: str | None = None,
    cap_per_left: int = 8,
    min_support: int = 2,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite graph (Newman 2001,
    co-occurrence networks): right-nodes become vertices, connected
    when they share a left-node, edge weight = number of shared
    left-nodes. The co-purchase / co-citation / co-occurrence builder
    behind item-item recommenders and related-entity graphs.

    Scale design — the naive projection explodes: a left-node with f
    neighbors emits C(f, 2) pairs, and real degree distributions are
    heavy-tailed (one customer with 10^4 items emits 5*10^7 pairs).
    The cap is therefore load-bearing, not cosmetic: each left-node
    keeps only its top-``cap_per_left`` right-neighbors (highest
    ``weight_col`` sum, id tie-break — deterministic), bounding
    per-left fan-out at C(cap, 2). Stages: one groupBy (left, right),
    one window top-k on the left key, one self-join on the left key
    (both sides identically partitioned — AQE plans a single
    exchange), one pair-grain count. ``min_support`` prunes the long
    noise tail at output grain."""
    w = (
        F.sum(F.col(weight_col)).alias("__w")
        if weight_col
        else F.count(F.lit(1)).cast("long").alias("__w")
    )
    lr = edges.groupBy(left_col, right_col).agg(w)
    win = Window.partitionBy(left_col).orderBy(
        F.desc("__w"), F.asc(right_col)
    )
    top = (
        lr.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= int(cap_per_left))
        .select(left_col, right_col)
    )
    a = top.withColumnRenamed(right_col, "item_a")
    b = top.withColumnRenamed(right_col, "item_b")
    pairs = a.join(b, on=left_col).filter(
        F.col("item_a") < F.col("item_b")
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_support))
    )


def random_walks(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    starts: DataFrame,
    start_col: str,
    n_steps: int = 3,
    salt: str = "walk",
) -> DataFrame:
    """Deterministic random walks (DeepWalk/node2vec corpus generation,
    Perozzi 2014) — the sequence generator that turns a graph into
    skip-gram training text. Each walk's step-i neighbor choice is
    ``md5(salt|walk|i|node) % out_degree`` (functions/hashing.py): a
    pure function of the walk state, so retried tasks, different
    partitionings, and the SQL oracle all draw the SAME walks — the
    exactly-once property RNG walks cannot give.

    Shape: out-edges ranked once per source (one window keyed on the
    source), then per step TWO keyed joins (state -> degree, then
    (node, pick) -> ranked edge) — both sides keyed on the current
    node, no fan-out join (never join-all-neighbors-then-filter).
    Dead ends propagate NULL hops (left joins). Returns one row per
    walk: ``(walk_id, hop1..hopN)``. Unrolled plan: n_steps is a
    small constant (walk length, not data size)."""
    from ..functions.hashing import md5_hex_int

    ranked = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct()
    w = Window.partitionBy("__s").orderBy("__d")
    ranked = ranked.select(
        "__s", "__d", (F.row_number().over(w) - 1).alias("__rnk"))
    deg = ranked.groupBy("__s").agg(
        F.count(F.lit(1)).cast("long").alias("__deg"))

    state = starts.select(
        F.col(start_col).alias("walk_id"),
        F.col(start_col).alias("__cur"),
    )
    out_cols = []
    for step in range(1, n_steps + 1):
        key = F.concat_ws(
            "|", F.lit(salt), F.col("walk_id").cast("string"),
            F.lit(str(step)), F.col("__cur").cast("string"))
        with_deg = state.join(
            deg, state["__cur"] == deg["__s"], "left"
        ).drop("__s")
        picked = with_deg.select(
            "walk_id", *out_cols,
            F.col("__cur").alias("__prev"),
            F.when(
                F.col("__deg").isNotNull(),
                md5_hex_int(key, 1, 8) % F.col("__deg"),
            ).alias("__pick"),
        )
        nxt = picked.join(
            ranked,
            (picked["__prev"] == ranked["__s"])
            & (picked["__pick"] == ranked["__rnk"]),
            "left",
        ).select(
            "walk_id", *out_cols,
            F.col("__d").alias(f"hop{step}"),
            F.col("__d").alias("__cur"),
        )
        out_cols.append(f"hop{step}")
        state = nxt
    return state.select("walk_id", *out_cols)


def degree_assortativity(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees across UNDIRECTED edges — positive
    means hubs link hubs (social nets), negative means hubs link leaves
    (the internet). The one-number mixing summary a graph-health check
    reports beside modularity and clustering coefficient.

    Shape: symmetrize + distinct, one degree aggregation, two
    broadcast-size degree joins onto the edge list, then ONE exact-sum
    aggregation (degrees are integers, so every moment is an exact
    decimal — the correlation-matrix float policy) with the Pearson
    closed form over the directed-both-ways edge multiset (each
    undirected edge contributes both orientations — the standard
    symmetric estimator)."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = e.unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    deg = sym.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    j = (
        sym.join(deg.withColumnRenamed("a", "__x")
                 .withColumnRenamed("deg", "dx"),
                 F.col("a") == F.col("__x"))
        .join(deg.withColumnRenamed("a", "__y")
              .withColumnRenamed("deg", "dy"),
              F.col("b") == F.col("__y"))
    )
    dx = F.col("dx").cast("decimal(18,0)")
    dy = F.col("dy").cast("decimal(18,0)")
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum(dx).alias("sx"), F.sum(dy).alias("sy"),
        F.sum(dx * dy).alias("sxy"),
        F.sum(dx * dx).alias("sxx"), F.sum(dy * dy).alias("syy"),
    )
    n = F.col("m2").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return s.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.when(den > 0, F.round(num / den, round_dp))
        .alias("assortativity"),
    )
