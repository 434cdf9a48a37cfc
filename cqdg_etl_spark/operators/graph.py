"""Connected components — duplicate-cluster resolution over pair graphs.

Near-dup detection (dedup.py) emits *pairs*; deduplication needs
*clusters* (keep one doc per component). This is the canonical iterative
Spark algorithm, expressed with DataFrame ops only:

min-label propagation: every node starts labeled with its own id; each
iteration every node takes the min label among itself and its
neighbors; fixpoint = components labeled by their min member.

Scale design:
- each iteration is one shuffle join (edges x labels on node id) + one
  groupBy — both hash on the node id, so AQE reuses the partitioning;
- iteration count is the graph diameter. Dup clusters are
  near-cliques (diameter 2-3), so convergence is fast; for adversarial
  long-chain graphs switch to the large-star/small-star contraction
  (Kiveris et al., "Connected Components in MapReduce", SOCC'14),
  which converges in O(log n) rounds — same join/groupBy building
  blocks, just alternating star operations.
- lineage is truncated every round — without it the plan doubles per
  iteration and the driver OOMs planning round ~15. The strategy is the
  ``checkpoint`` parameter: ``"local"`` (default, executor-local
  blocks — right for local mode) or ``"reliable"``
  (``sparkContext.setCheckpointDir`` + ``checkpoint()`` — right on a
  real cluster, where executor loss must not kill round 14 of 20).
- ``connected_components_auto`` picks min-label vs star contraction by
  edge count so unknown graphs default to the O(log n) bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _truncate(df: DataFrame, checkpoint: str) -> DataFrame:
    """Per-round lineage truncation for iterative algorithms.

    - ``"local"``: ``localCheckpoint`` — executor-local blocks, fine in
      local mode / short jobs; blocks are LOST on executor failure.
    - ``"reliable"``: ``checkpoint`` — requires
      ``spark.sparkContext.setCheckpointDir`` on durable storage; the
      right mode on a real cluster where a 1000-executor job must
      survive preemption.
    """
    if checkpoint == "local":
        return df.localCheckpoint()
    if checkpoint == "reliable":
        return df.checkpoint()
    raise ValueError(f"unknown checkpoint mode {checkpoint!r}")


def connected_components_auto(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    star_edge_threshold: int = 5_000_000,
    checkpoint: str = "local",
) -> DataFrame:
    """Pick the CC algorithm by edge count: min-label propagation for
    small pair graphs (near-clique dup clusters, diameter 2-3 — fewer,
    cheaper rounds), large/small-star contraction above the threshold —
    its O(log n) round bound holds for ANY topology, so an unknown
    100-TB pair graph can't stall on a long chain the way O(diameter)
    min-label can.

    The edge frame is materialized (checkpoint/localCheckpoint) BEFORE
    the count: edges typically arrive as an expensive candidate-pair
    plan (e.g. the full ngram-Jaccard shingle self-join), and a naive
    count() would execute that plan once for the dispatch decision and
    again inside the chosen algorithm — roughly doubling candidate
    generation. Materializing first pays the scan once; both the count
    and every CC round read the stored blocks."""
    edges = _truncate(edges.select(src, dst), checkpoint)
    n_edges = edges.count()
    if n_edges > star_edge_threshold:
        return connected_components_star(edges, src, dst, checkpoint=checkpoint)
    return connected_components(edges, src, dst, checkpoint=checkpoint)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """Component label (min member id) per node of the undirected graph.

    Returns (node, component). Nodes are those appearing in edges;
    callers wanting singleton components union isolated ids afterward.
    Raises if max_iter rounds don't converge (diameter > max_iter).
    """
    sym = _truncate(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct(),
        checkpoint,
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = _truncate(
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component")) < F.col("component"))
                .cast("int")
                .alias("_changed"),
            ),
            checkpoint,
        )
        changed = new_labels.agg(F.sum("_changed")).collect()[0][0] or 0
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(graph diameter too large — use star-contraction)"
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint: str = "local",
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SOCC'14) — O(log n) rounds regardless of graph
    diameter, where min-label propagation (connected_components) needs
    O(diameter) rounds. Use this for long-chain/deep graphs; min-label
    wins on the near-clique graphs dedup produces (fewer, cheaper
    rounds).

    Each round is two (groupBy + join) passes over the edge list, all
    hashing on the center node; lineage truncated per round.

    large-star(u): connect every neighbor v > u to m = min(N(u) + {u})
    small-star(u): connect every neighbor v <= u, and u, to that min

    At fixpoint every component is a star rooted at its min node.
    Returns (node, component).
    """

    def _center_min(sym: DataFrame) -> DataFrame:
        return sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    cur = _truncate(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        checkpoint,
    )
    prev_sig = None
    for _ in range(max_iter):
        sym = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        # large-star
        mins = _center_min(sym)
        cur = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the large-star output
        sym2 = cur.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            cur.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        small = sym2.filter(F.col("v") <= F.col("u"))
        smins = small.groupBy("u").agg(F.min("v").alias("m"))
        cur = _truncate(
            small.join(smins, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct(),
            checkpoint,
        )
        sig = cur.agg(
            F.count("*").alias("n"),
            # xor, not sum: edge hashes span the full long range and a
            # sum overflows under ANSI; xor over the distinct edge set
            # is an order-independent, overflow-free set signature.
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).collect()[0]
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds"
        )
    # fixpoint: edges are (child, root); roots need their self row
    return (
        cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .unionByName(
            cur.select(F.col("b").alias("node"), F.col("b").alias("component"))
        )
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: str = "local",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list → (node,
    rank_rel) where rank_rel = rank × N (so a uniform graph scores 1.0
    per node regardless of size).

    Deterministic and engine-portable by construction, like the rest of
    the iterative family: per-target contribution sums accumulate in
    exact DECIMAL(38,18) (double summation is partitioning-order-
    dependent; decimal addition is associative), and the damping update
    ``d/N + damping·Σ`` is the same left-to-right chain of correctly-
    rounded IEEE ops the SQL oracle evaluates — so a fixed iteration
    count yields bit-identical ranks on any engine. Callers supply a
    symmetric edge list when they mean an undirected graph; nodes with
    no out-edges (dangling) contribute nothing (the classic
    simplification — callers who need mass conservation add the
    dangling term upstream).

    Scale shape (the Pregel plan): the adjacency (src, dst, out_deg)
    frame is built once — one groupBy for degrees, one join — and
    persisted; each iteration is join(ranks) on src + groupBy dst with
    map-side partial decimal sums: exactly 2 shuffles per round, both
    keyed on node ids. Rank frames are lineage-truncated per round
    (local/reliable checkpoint, same contract as connected_components)
    so the plan doesn't deepen, and the previous round's persist is
    released. No driver collect anywhere — N rides along as a
    broadcast 1-row frame.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    adj = e.join(deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_row = F.broadcast(nodes.agg(F.count("*").alias("n")))
    # NOTE: 1 - 0.85 in IEEE double is 0.15000000000000002, not 0.15 —
    # the oracle must embed repr(1 - damping) verbatim or ranks drift
    # in the last ulp and the value hash flips.
    teleport = 1.0 - damping
    ranks = _truncate(
        nodes.crossJoin(n_row).select(
            "node",
            (F.lit(1.0) / F.col("n").cast("double")).alias("rank"),
            "n",
        ),
        checkpoint,
    )
    for _ in range(iterations):
        msgs = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("out_deg").cast("double")).alias("c"),
        )
        sums = msgs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).alias("sumc")
        )
        # left join from the node set: a node with no in-edges keeps
        # receiving the teleport term instead of silently vanishing.
        new_ranks = (
            nodes.join(sums, "node", "left")
            .crossJoin(n_row)
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("n").cast("double")
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("sumc"), F.lit(0).cast("decimal(38,18)")
                    ).cast("double")
                ).alias("rank"),
                "n",
            )
        )
        old = ranks
        ranks = _truncate(new_ranks, checkpoint)
        old.unpersist()
    adj.unpersist()
    out = ranks.select(
        "node",
        F.round(F.col("rank") * F.col("n").cast("double"), 6).alias("rank_rel"),
    )
    nodes.unpersist()
    return out


def triangle_counts(
    pairs: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph given
    as canonical distinct pairs (a < b) → (node, n_triangles).

    Uses the FORWARD algorithm (degree orientation — Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11): every edge is directed from its lower-(degree,
    id) endpoint to the higher, so a vertex's out-degree is bounded by
    O(√m) on any graph — the wedge join's fan-out is bounded by
    arboricity instead of by the max degree. This is THE fix for the
    hot-celebrity-vertex skew that kills the naive two-hop join at
    scale: the 10M-degree hub receives edges instead of emitting
    10M² wedges. Each triangle is then found exactly once, at its
    orientation-minimal vertex.

    Plan (r12 adjacency-array variant): one degree aggregate, one
    orientation projection, ONE collect_list aggregate building the
    per-vertex out-neighbor array, and one equi-join attaching the
    destination vertex's array to each oriented edge — the triangles
    through edge (u, v) are ``array_intersect(N+(u), N+(v))``, each
    found exactly once at its orientation-minimal vertex. N+(u)
    attaches with ZERO joins (the edge list is re-derived by exploding
    the adjacency array it rides with). Versus the r11 wedge-join form
    (wedge self-join on u + closing equi-join on (p, q)): the same
    O(Σ d⁺²) wedge work moves as primitive array payloads on an
    m-row exchange instead of as O(Σ d⁺²) shuffled wedge ROWS that the
    closing sort-merge join must also sort — one wide exchange fewer,
    and per-wedge cost drops from join machinery to a hash-set probe
    inside one codegen stage. Out-degrees stay O(√m)-bounded by the
    orientation, so no adjacency array exceeds O(√m) elements (no
    giant-row risk at the collect_list).

    Persist discipline: ``e`` feeds the degree aggregate AND the
    orientation join; ``nbrs`` feeds both sides of the attach join —
    without persists the caller's whole pair-generation subtree (for
    the registered query: a lineitem self-join + distinct) re-evaluates
    per consumer (exchange reuse verified absent across the differing
    keys). Both are skinny frames, the same footprint class as
    pagerank's persisted adjacency. They must outlive this call (the
    result is lazy and their lineage stays reachable from the returned
    plan); callers running many operators per session clear them with
    ``spark.catalog.clearCache()`` after the consuming action.
    """
    from pyspark import StorageLevel

    e = pairs.select(F.col(a).alias("x"), F.col(b).alias("y")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .union(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
    ranked = e.join(dx, "x").join(dy, "y")
    # orient lower (degree, id) → higher; out-degree becomes O(√m)
    oriented = ranked.select(
        F.when(
            (F.col("dx") < F.col("dy"))
            | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))),
            F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
        )
        .otherwise(F.struct(F.col("y").alias("u"), F.col("x").alias("v")))
        .alias("o")
    ).select("o.u", "o.v")
    # per-vertex out-neighbor sets (sorted for determinism; the edge
    # set is distinct so the arrays are sets)
    nbrs = oriented.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nv")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    left = nbrs.select("u", F.col("nv").alias("nu"), F.explode("nv").alias("v"))
    right = nbrs.select(F.col("u").alias("v"), F.col("nv").alias("nv2"))
    per_edge = (
        left.join(right, "v")
        .select("u", "v", F.array_intersect("nu", "nv2").alias("cm"))
        .filter(F.size("cm") > 0)
    )
    # (u, p, q) triples — identical to the wedge-join form's output:
    # edge u→p plus q ∈ N+(u) ∩ N+(p) means edges u→q and p→q exist.
    tris = per_edge.select(
        "u", F.col("v").alias("p"), F.explode("cm").alias("q")
    )
    return (
        tris.select(F.explode(F.array("u", "p", "q")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


def adamic_adar(
    pairs: DataFrame,
    a: str = "a",
    b: str = "b",
    max_center_degree: int = 64,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected simple graph
    given as canonical distinct pairs (a < b): score every NON-adjacent
    pair (u < v) sharing ≥ 1 neighbor by

        AA(u,v) = Σ_{w ∈ N(u) ∩ N(v)}  1 / ln(deg(w))

    → (u, v, n_common, aa_score). Existing edges are excluded (the
    point of link prediction is NEW links); rare shared neighbors
    dominate the score, which is why AA beats raw common-neighbor
    counts (Adamic & Adar, Social Networks 2003).

    Scale shape: the wedge enumeration at center w is C(deg(w), 2) —
    the same last-reducer hub problem triangle counting has, but AA
    cannot use degree orientation (every wedge must be seen, not each
    triangle once). The standard exact-enough fix is the
    ``max_center_degree`` guard: hubs above the cap are EXCLUDED as
    centers — their per-wedge weight 1/ln(deg) is the smallest signal
    in the sum (a w connected to everything certifies nothing about
    u,v), so the cap removes the quadratic term while perturbing
    scores least. Same role (and same oracle-mirrored semantics) as
    ``max_df`` in the dedup inverted indexes; at 100 TB set it as a
    degree-distribution quantile.

    Determinism: each center weight is round(1/ln(d), 6) (the libm
    convention) and per-pair sums accumulate the rounded terms in
    DECIMAL(38,6) — associative, partition-order-proof.
    """
    from pyspark import StorageLevel

    # e feeds the symmetrized adjacency (twice) AND the final
    # existing-edge anti-join; adj feeds the degree aggregate AND the
    # center join; half feeds both wedge sides. All are skinny 2-3
    # column frames — persisted (r11) so the caller's pair-generation
    # subtree evaluates once instead of up to 5× (exchange reuse does
    # not fire across the differing projections/keys).
    e = pairs.select(F.col(a).alias("x"), F.col(b).alias("y")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    adj = e.select(F.col("x").alias("w"), F.col("y").alias("n")).union(
        e.select(F.col("y").alias("w"), F.col("x").alias("n"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = adj.groupBy("w").agg(F.count("*").alias("d"))
    centers = deg.filter(
        (F.col("d") >= 2) & (F.col("d") <= max_center_degree)
    ).select("w", F.round(F.lit(1.0) / F.log(F.col("d")), 6).alias("wt"))
    half = adj.join(centers, "w").persist(StorageLevel.MEMORY_AND_DISK)
    p1 = half.select("w", F.col("n").alias("u"), "wt")
    p2 = half.select("w", F.col("n").alias("v"))
    wedges = p1.join(p2, "w").filter(F.col("u") < F.col("v"))
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").alias("n_common"),
        F.round(
            F.sum(F.col("wt").cast("decimal(38,6)")).cast("double"), 6
        ).alias("aa_score"),
    )
    return scores.join(
        e,
        (F.col("u") == F.col("x")) & (F.col("v") == F.col("y")),
        "left_anti",
    )


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    checkpoint: str = "local",
) -> DataFrame:
    """Semi-supervised label propagation with seed clamping (Zhu &
    Ghahramani '02, majority-vote form): seeds keep their labels;
    every other node adopts, each round, the most common label among
    its currently-labeled neighbors (ties → smallest label). After a
    FIXED number of rounds the labeling is fully deterministic —
    integer votes, total-order tiebreak — so even this iterative
    algorithm is hash-matchable against an unrolled SQL oracle, the
    same contract as ``pagerank``.

    The weak-supervision primitive for corpus curation: propagate a
    small hand-labeled seed set (topic, quality tier, license class)
    over a similarity/co-occurrence graph to label the rest.

    Inputs: ``edges`` (src, dst) with BOTH directions present for an
    undirected graph; ``seeds`` (node, label). Scale shape per round:
    one hash join edges⋈labels (labels is the small side early on —
    broadcastable; by later rounds both are node-scale, a plain
    shuffled join) + one (node, label) vote aggregate + one
    row_number window — 3 shuffles per round, lineage truncated per
    round like every iterative operator here.
    """
    labels = seeds.select("node", "label")
    for _ in range(iterations):
        votes = (
            edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = W.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        winners = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        labels = _truncate(
            seeds.select("node", "label").unionByName(
                winners.join(seeds.select("node"), "node", "left_anti")
            ),
            checkpoint,
        )
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: str = "local",
) -> DataFrame:
    """Personalized PageRank: the teleport step returns to the SEED
    set (uniformly) instead of to every node, so rank mass measures
    proximity to the seeds — the recommendation / related-item /
    trust-propagation variant of pagerank(). ``seeds`` is a one-column
    (``node``) frame; initial rank is uniform over seeds, zero
    elsewhere, and each round computes
    ``(node ∈ S ? (1-d)/|S| : 0) + d·Σ contrib``.

    Same engine-portable determinism contract as pagerank(): exact
    DECIMAL(38,18) contribution sums (associative), then one
    fixed-order chain of correctly-rounded IEEE double ops identical
    to the SQL oracle's, so a fixed iteration count is bit-exact on
    any engine. Dangling mass is dropped (same documented
    simplification). Output rank_rel = rank × N (N = node count) for
    cross-size comparability; non-seed nodes beyond the iteration
    horizon report 0.

    Scale shape is pagerank()'s Pregel plan: adjacency built once
    (one groupBy + one join, persisted); 2 shuffles per round; seed
    membership is a left-join flag on the node frame; |S| and N ride
    as broadcast 1-row frames; lineage truncated per round.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    adj = e.join(deg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            seeds.select(F.col(seeds.columns[0]).alias("node"))
            .distinct()
            .withColumn("_is_seed", F.lit(1)),
            "node",
            "left",
        )
        .select("node", F.coalesce("_is_seed", F.lit(0)).alias("is_seed"))
        .persist()
    )
    n_row = F.broadcast(
        nodes.agg(
            F.count("*").alias("n"),
            F.sum("is_seed").alias("s"),
        )
    )
    teleport = 1.0 - damping  # repr() of this goes in the oracle
    ranks = _truncate(
        nodes.crossJoin(n_row).select(
            "node",
            "is_seed",
            F.when(
                F.col("is_seed") == 1,
                F.lit(1.0) / F.col("s").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("rank"),
            "n",
            "s",
        ),
        checkpoint,
    )
    for _ in range(iterations):
        msgs = adj.join(ranks, adj["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("out_deg").cast("double")).alias("c"),
        )
        sums = msgs.groupBy("node").agg(
            F.sum(F.col("c").cast("decimal(38,18)")).alias("sumc")
        )
        new_ranks = (
            nodes.join(sums, "node", "left")
            .crossJoin(n_row)
            .select(
                "node",
                "is_seed",
                (
                    F.when(
                        F.col("is_seed") == 1,
                        F.lit(teleport) / F.col("s").cast("double"),
                    ).otherwise(F.lit(0.0))
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("sumc"), F.lit(0).cast("decimal(38,18)")
                    ).cast("double")
                ).alias("rank"),
                "n",
                "s",
            )
        )
        old = ranks
        ranks = _truncate(new_ranks, checkpoint)
        old.unpersist()
    adj.unpersist()
    out = ranks.select(
        "node",
        F.round(F.col("rank") * F.col("n").cast("double"), 6).alias(
            "rank_rel"
        ),
    )
    nodes.unpersist()
    return out
