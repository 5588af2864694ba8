"""Host-graph centrality operators for web-corpus curation.

Web-scale training-data intake weighs pages by the standing of their
host in the link graph (Common Crawl publishes exactly this as its
host-level ranks; FineWeb/RefinedWeb-style pipelines consume such
ranks as a quality prior next to the URL heuristics in
``zoi_spark.urls``). The reference engine (phcurado/zoi) has no graph
surface — this module is part of the LLM-pipeline inventory (SURVEY
§8), not a port.

Design stance (same as ``dedup.duplicate_clusters``): the graph lives
in an EDGE TABLE ``(src, dst, weight)``; every iteration is a keyed
aggregation + equi-join — no neighbor lists, no driver-side adjacency,
nothing that grows with a hub's degree beyond a wide groupBy key. At
10^12 pages the HOST graph is ~10^8 nodes / ~10^9 edges: the rank
frame is small relative to the corpus and broadcast-joins into the
edge scan, so one iteration costs one shuffle of the edge table on
``dst`` (and that shuffle reuses the same partitioning every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits"]


def pagerank(edges: DataFrame, *, src_col: str = "src",
             dst_col: str = "dst", weight_col: str | None = None,
             iters: int = 5, damping: float = 0.85,
             checkpoint: bool = True,
             broadcast_ranks: bool = True) -> DataFrame:
    """Fixed-iteration weighted PageRank over an edge table.

    Returns ``(node, rank)`` with one row per distinct node appearing
    as a source OR destination. Semantics (the standard power
    iteration, Page et al. 1999, with the uniform dangling-mass
    redistribution used by GraphX's ``staticPageRank``):

    * ranks start uniform at ``1/N``;
    * each round every node keeps ``(1-d)/N`` teleport mass plus ``d ×``
      (the weighted in-contributions ``rank(src)·w/out(src)`` plus an
      equal share of the total rank parked on dangling nodes — nodes
      with no out-edges — so total rank stays 1 and the result is a
      probability distribution);
    * exactly ``iters`` rounds — deterministic output, no convergence
      test (a fixed-round power iteration is also what makes the
      DuckDB oracle twin expressible as an unrolled CTE chain).

    Plan shape per round: ranks ⋈ out-weights (node-keyed, tiny) →
    broadcast into the edge table → groupBy ``dst`` (ONE shuffle of
    the edges, partial aggregation map-side) → outer-join back onto
    the node frame. ``localCheckpoint(eager=True)`` truncates the
    lineage each round — the same guard ``duplicate_clusters`` uses;
    without it round k replays rounds 1..k-1 and the plan tower
    re-scans the edges O(iters²) times.

    Edge weights (``weight_col=None`` ⇒ every edge weighs 1) are
    summed per (src, dst) first, so parallel edges behave as one
    weighted edge.

    ``broadcast_ranks`` (default True) hints the rank-frame side of
    the edge join for broadcast — right for HOST graphs, whose node
    count is orders of magnitude below the corpus. For graphs whose
    rank frame exceeds executor broadcast budgets (page-level graphs,
    ~10^12 nodes), pass False: the join falls back to a shuffled
    equi-join and both sides hash-partition on the node key, which AQE
    then keeps co-partitioned across rounds.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"),
        (F.col(weight_col) if weight_col is not None
         else F.lit(1.0)).cast("double").alias("__w"))
    e = (e.where(F.col("__src").isNotNull() & F.col("__dst").isNotNull())
         .groupBy("__src", "__dst").agg(F.sum("__w").alias("__w")))
    e = e.persist()

    nodes = (e.select(F.col("__src").alias("node"))
             .union(e.select(F.col("__dst")))
             .distinct().persist())
    n_nodes = nodes.count()  # also materializes both persists
    if n_nodes == 0:
        out = nodes.withColumn("rank", F.lit(None).cast("double"))
        out._zoi_persisted = [e, nodes]
        return out

    out_w = e.groupBy(F.col("__src").alias("node")).agg(
        F.sum("__w").alias("__out_w"))
    # node frame with out-weight; __out_w NULL ⇔ dangling node
    base = nodes.join(out_w, "node", "left").persist()
    base.count()
    nodes.unpersist()

    ranks = base.select("node", F.lit(1.0 / n_nodes).alias("rank"),
                        "__out_w")
    for _ in range(iters):
        # dangling mass stays IN-PLAN: a one-row aggregate broadcast
        # into the update projection — no per-round driver collect
        dangling = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("__out_w").isNull(),
                                    F.col("rank"))),
                       F.lit(0.0)).alias("__dm"))
        sources = ranks.where(F.col("__out_w").isNotNull())
        if broadcast_ranks:
            sources = F.broadcast(sources)
        contrib = (e.join(sources, e["__src"] == F.col("node"))
                   .groupBy(F.col("__dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("__w")
                              / F.col("__out_w")).alias("__in")))
        ranks = (base.join(contrib, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit((1.0 - damping) / n_nodes)
                          + F.lit(damping)
                          * (F.coalesce(F.col("__in"), F.lit(0.0))
                             + F.col("__dm") / F.lit(float(n_nodes))))
                         .alias("rank"),
                         "__out_w"))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("rank").cast("double"))
    out._zoi_persisted = [e, base]
    return out


def hits(edges: DataFrame, *, src_col: str = "src",
         dst_col: str = "dst", weight_col: str | None = None,
         iters: int = 4, checkpoint: bool = True,
         broadcast_scores: bool = True) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999, "Authoritative sources in
    a hyperlinked environment") over an edge table — the second
    classical link-centrality prior next to :func:`pagerank`.
    Authorities are pages good hubs point AT (content); hubs are pages
    pointing at good authorities (directories/link farms) — web intake
    uses the authority score as a quality prior and a HIGH hub score
    with low authority as a spam/link-farm signal.

    Returns ``(node, hub, authority)`` for every distinct node. Update
    rule, max-normalized (each half-step divides by the step's maximum
    score, keeping values in [0,1] without the sqrt an L2 norm needs):

        auth_t(v) = Σ_{(u,v)∈E} hub_{t-1}(u)·w   then  /= max
        hub_t(u)  = Σ_{(u,v)∈E} auth_t(v)·w      then  /= max

    starting from hub ≡ 1. Exactly ``iters`` rounds — deterministic,
    oracle-expressible as an unrolled CTE chain. Edge weights must be
    positive (``weight_col=None`` ⇒ 1.0; parallel edges sum); a node
    with no out-edges has hub 0, no in-edges authority 0.

    Plan shape per round: two (score ⋈ edges → groupBy) halves — two
    shuffles of the edge table on dst then src — plus two broadcast
    one-row maxima folded in-plan (no driver collect).
    ``localCheckpoint(eager=True)`` per round truncates lineage exactly
    as :func:`pagerank` does; ``broadcast_scores`` hints the score side
    of each edge join (right for host graphs, pass False for
    page-level graphs beyond broadcast budgets).
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"),
        (F.col(weight_col) if weight_col is not None
         else F.lit(1.0)).cast("double").alias("__w"))
    e = (e.where(F.col("__src").isNotNull() & F.col("__dst").isNotNull())
         .groupBy("__src", "__dst").agg(F.sum("__w").alias("__w")))
    e = e.persist()

    nodes = (e.select(F.col("__src").alias("node"))
             .union(e.select(F.col("__dst")))
             .distinct().persist())
    n_nodes = nodes.count()  # materializes both persists
    if n_nodes == 0:
        out = (nodes.withColumn("hub", F.lit(None).cast("double"))
               .withColumn("authority", F.lit(None).cast("double")))
        out._zoi_persisted = [e, nodes]
        return out

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(iters):
        hub_side = F.broadcast(hub) if broadcast_scores else hub
        ar = (e.join(hub_side, e["__src"] == F.col("node"))
              .groupBy(F.col("__dst").alias("node"))
              .agg(F.sum(F.col("hub") * F.col("__w")).alias("__v")))
        amax = ar.agg(F.max("__v").alias("__m"))
        auth = (nodes.join(ar, "node", "left")
                .crossJoin(F.broadcast(amax))
                .select("node",
                        F.coalesce(F.col("__v") / F.col("__m"),
                                   F.lit(0.0)).alias("authority")))
        auth_side = F.broadcast(auth) if broadcast_scores else auth
        hr = (e.join(auth_side, e["__dst"] == F.col("node"))
              .groupBy(F.col("__src").alias("node"))
              .agg(F.sum(F.col("authority") * F.col("__w")).alias("__v")))
        hmax = hr.agg(F.max("__v").alias("__m"))
        hub = (nodes.join(hr, "node", "left")
               .crossJoin(F.broadcast(hmax))
               .select("node",
                       F.coalesce(F.col("__v") / F.col("__m"),
                                  F.lit(0.0)).alias("hub")))
        if checkpoint:
            state = hub.join(auth, "node").localCheckpoint(eager=True)
            hub = state.select("node", "hub")
            auth = state.select("node", "authority")
    out = hub.join(auth, "node").select(
        "node", F.col("hub").cast("double"),
        F.col("authority").cast("double"))
    out._zoi_persisted = [e, nodes]
    return out


def degree_stats(edges: DataFrame, *, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Per-node degree profile over the DISTINCT edge set: ``out_deg``,
    ``in_deg``, ``n_reciprocal`` (out-edges whose reverse edge exists)
    and ``reciprocity`` (n_reciprocal/out_deg) — the web-graph QC that
    separates organic link neighborhoods (reciprocity > 0) from link
    farms and scraper rings (high out_deg, zero reciprocity), next to
    pagerank/hits which need the same edge table.

    Self-loops are excluded. Shape at 10^10 edges: one distinct (the
    only full-width shuffle), two key-local aggregations, the
    reciprocal check as a self-equi-join on the reversed key, and
    node-keyed outer joins — every stage is hash-partitioned on node
    ids, no windows, no driver state."""
    e = (edges.select(F.col(src_col).alias("s"),
                      F.col(dst_col).alias("d"))
         .where(F.col("s").isNotNull() & F.col("d").isNotNull()
                & (F.col("s") != F.col("d")))
         .distinct())
    out_deg = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("out_deg"))
    in_deg = e.groupBy(F.col("d").alias("node")).agg(
        F.count("*").alias("in_deg"))
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = (e.join(rev, ["s", "d"])
             .groupBy(F.col("s").alias("node"))
             .agg(F.count("*").alias("n_reciprocal")))
    return (out_deg.join(in_deg, "node", "full")
            .join(recip, "node", "left")
            .select("node",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
                    F.coalesce("n_reciprocal", F.lit(0))
                    .alias("n_reciprocal"))
            .withColumn("reciprocity",
                        F.when(F.col("out_deg") > 0, F.round(
                            F.col("n_reciprocal") / F.col("out_deg"), 6))
                        .otherwise(F.lit(0.0))))


def _sym_edges(edges: "DataFrame", src_col: str, dst_col: str
               ) -> "DataFrame":
    """Shared edge hygiene for the undirected-graph operators: drop
    NULL endpoints and self-loops, symmetrize, distinct — returning the
    (a, b) table every round-based algorithm iterates over. Kept in ONE
    place so LPA / assortativity / k-core / BFS cannot drift on what
    counts as an edge."""
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b"))))
    return e.unionAll(e.select(F.col("b").alias("a"),
                               F.col("a").alias("b"))).distinct()


def lpa_communities(edges: DataFrame, *, src_col: str = "src",
                    dst_col: str = "dst", iters: int = 3) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the UNDIRECTED distinct edge set: every node starts as its own
    label; each round it adopts the most frequent label among its
    neighbors (ties → smallest label; isolated nodes keep their label).
    Fixed iteration count and deterministic tie-breaks make the whole
    recursion value-checkable — unlike the async/randomized textbook
    variant. Communities are denser than connected components
    (duplicate_clusters): a bridge edge joins two CCs but LPA keeps the
    two dense sides apart.

    Shape at 10^10 edges: per round, one join of the edge table against
    the label table (both hash-partitioned on node id), one
    (node, label) count aggregation with map-side combine, one
    per-node argmax window over its OWN candidate labels (bounded by
    the node's distinct neighbor-label count, not the graph), plus a
    left join back for isolated nodes. localCheckpoint per round
    truncates the lineage exactly like pagerank/duplicate_clusters."""
    sym = _sym_edges(edges, src_col, dst_col).localCheckpoint(
        eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("dst").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(int(iters)):
        msgs = (sym.join(labels, sym["a"] == labels["node"])
                .select(F.col("b").alias("dst"), "label")
                .groupBy("dst", "label").agg(F.count("*").alias("n")))
        new = (msgs.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1)
               .select(F.col("dst").alias("node"),
                       F.col("label").alias("__new")))
        labels = (labels.join(new, "node", "left")
                  .select("node", F.coalesce("__new", "label")
                          .alias("label"))
                  .localCheckpoint(eager=True))
    return labels.withColumnRenamed("label", "community")


def triangle_stats(edges: DataFrame, *, src_col: str = "src",
                   dst_col: str = "dst") -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    distinct undirected edge set — the link-farm / community-density
    profile (organic neighborhoods close triangles; spray-link spam
    does not). Output: (node, degree, n_triangles, clustering) with
    clustering = 2T / (deg·(deg−1)), 0.0 for degree < 2.

    Node-iterator with canonical ordering: edges are canonicalized to
    (u < v) once, so each triangle a<b<c is materialized exactly once
    by two equi-joins (wedge a−b−c, then the closing probe a−c) and
    never re-counted. At 10^10 edges this is two shuffles of the
    canonical edge table on node keys — no neighbor-set explosion, no
    per-node adjacency list; skew is bounded by the wedge count of the
    hottest node, the standard distributed triangle-count shape."""
    e = (edges.select(F.col(src_col).alias("s"),
                      F.col(dst_col).alias("d"))
         .where(F.col("s").isNotNull() & F.col("d").isNotNull()
                & (F.col("s") != F.col("d"))))
    # the canonical table feeds THREE joins — persist it so the wedge
    # and closing probes read one materialized edge set instead of
    # re-scanning (and re-distincting) the input three times
    canon = (e.select(F.least("s", "d").alias("u"),
                      F.greatest("s", "d").alias("v"))
             .distinct().persist())
    e1 = canon.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = canon.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = canon.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (e1.join(e2, e1["b"] == e2["b2"])
           .join(e3, (F.col("a") == F.col("a3"))
                 & (F.col("c") == F.col("c3")))
           .select("a", "b", "c"))
    corners = (tri.select(F.col("a").alias("node"))
               .unionAll(tri.select(F.col("b").alias("node")))
               .unionAll(tri.select(F.col("c").alias("node")))
               .groupBy("node").agg(F.count("*").alias("n_triangles")))
    deg = (canon.select(F.col("u").alias("node"))
           .unionAll(canon.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("degree")))
    t = F.coalesce("n_triangles", F.lit(0))
    cc = F.when(F.col("degree") >= 2,
                F.round(2.0 * t / (F.col("degree")
                                   * (F.col("degree") - 1)), 6)) \
        .otherwise(F.lit(0.0))
    out = (deg.join(corners, "node", "left")
           .select("node", "degree",
                   t.cast("long").alias("n_triangles"),
                   cc.alias("clustering")))
    out._zoi_persisted = [canon]  # release after materialization
    return out


def degree_assortativity(edges: DataFrame, *, src_col: str = "src",
                         dst_col: str = "dst") -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over the undirected distinct edge set — the one
    statistic that separates social-ish graphs (assortative, r > 0)
    from web/link-farm topologies (disassortative hubs, r < 0). Each
    undirected edge contributes both orientations, which is what makes
    the coefficient symmetric. Output is one row: ``n_edges``
    (undirected), ``assortativity`` (round 6, NULL for a
    degree-regular graph where the variance is 0).

    All five moments are accumulated as exact integer sums (degrees
    are integers), so the coefficient is bit-deterministic — no
    float-summation-order wobble. One degree aggregation + two joins
    of the edge table against the (node, degree) table, shuffling on
    node keys only."""
    sym = _sym_edges(edges, src_col, dst_col).persist()
    deg = sym.groupBy("a").agg(F.count("*").alias("d")).persist()
    dx = deg.select(F.col("a").alias("__x"), F.col("d").alias("x"))
    dy = deg.select(F.col("a").alias("__y"), F.col("d").alias("y"))
    pairs = (sym.join(dx, sym["a"] == dx["__x"])
             .join(dy, sym["b"] == dy["__y"])
             .select("x", "y"))
    # moments as DECIMAL(38,0): the long sums are safe, but their
    # PRODUCTS (m·sxy, sx², …) blow past 2^63 around 10^9 edges —
    # decimal keeps the five-sum formula exact to 38 digits instead of
    # aborting with ARITHMETIC_OVERFLOW under ANSI mode
    def dec(c):
        return c.cast("decimal(38,0)")

    s = pairs.agg(dec(F.count("*")).alias("m"),
                  dec(F.sum("x")).alias("sx"),
                  dec(F.sum("y")).alias("sy"),
                  dec(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
                  dec(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
                  dec(F.sum(F.col("y") * F.col("y"))).alias("syy"))
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when((vx > 0) & (vy > 0),
               F.round(num.cast("double")
                       / F.sqrt(vx.cast("double")
                                * vy.cast("double")), 6))
    out = s.select((F.col("m") / 2).cast("long").alias("n_edges"),
                   r.alias("assortativity"))
    out._zoi_persisted = [sym, deg]  # release after materialization
    return out


def kcore(edges: DataFrame, *, k: int, rounds: int,
          src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop every
    node whose degree (over the surviving subgraph) is below *k* until
    the subgraph is stable — the standard "dense nucleus" extractor
    (spam rings and boilerplate mills live in deep cores; pendant
    chains and crawl frontier noise peel off). Fixed *rounds* keeps the
    recursion value-checkable; peeling converges monotonically, so
    extra rounds past convergence are no-ops (each costs one count +
    two semi-joins on an already-stable frame). Output: the surviving
    (node, degree) rows, degree measured in the final subgraph —
    all ≥ k once converged.

    Per round: one degree aggregation and two semi-joins of the
    symmetric edge table against the survivor set — all hash-keyed on
    node ids, no neighbor lists; localCheckpoint per round truncates
    the lineage exactly like pagerank/duplicate_clusters."""
    if k < 1 or rounds < 1:
        raise ValueError("kcore: k and rounds must be >= 1")
    sym = _sym_edges(edges, src_col, dst_col).localCheckpoint(
        eager=True)
    for _ in range(int(rounds)):
        deg = sym.groupBy("a").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= k).select("a")
        sym = (sym.join(keep, "a", "left_semi")
               .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
               .localCheckpoint(eager=True))
    return (sym.groupBy(F.col("a").alias("node"))
            .agg(F.count("*").cast("long").alias("degree")))


def cooccurrence_pairs(df: DataFrame, *, entity_col: str,
                       item_col: str) -> DataFrame:
    """Item co-occurrence projection of the (entity, item) bipartite
    graph: for every unordered item pair, how many DISTINCT entities
    touch both, plus the Jaccard affinity co/(nₐ+n_b−co) — the
    market-basket / topic-affinity matrix (which event types share
    users, which hosts share readers). Output:
    (item_a, item_b, n_both, n_a, n_b, affinity round 6), item_a <
    item_b.

    The (entity, item) set is deduplicated first, then self-joined on
    the entity key — work is Σ per-entity deg², so a hot entity is
    quadratic: cap or sample hyper-connected entities upstream (the
    minhash bucket-cap precedent) when entities can touch thousands of
    items. Shuffles ride the entity key, then the pair key; item
    marginals broadcast back onto the (small) pair table."""
    ei = (df.select(F.col(entity_col).alias("e"),
                    F.col(item_col).alias("i"))
          .where(F.col("e").isNotNull() & F.col("i").isNotNull())
          .distinct().persist())
    a = ei.select("e", F.col("i").alias("item_a"))
    b = ei.select(F.col("e").alias("e2"), F.col("i").alias("item_b"))
    both = (a.join(b, (a["e"] == b["e2"])
                   & (F.col("item_a") < F.col("item_b")))
            .groupBy("item_a", "item_b")
            .agg(F.count("*").alias("n_both")))
    sizes = ei.groupBy(F.col("i")).agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("i").alias("item_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("i").alias("item_b"),
                      F.col("n").alias("n_b"))
    aff = F.round(F.col("n_both")
                  / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6)
    out = (both.join(F.broadcast(sa), "item_a")
           .join(F.broadcast(sb), "item_b")
           .select("item_a", "item_b",
                   F.col("n_both").cast("long").alias("n_both"),
                   F.col("n_a").cast("long").alias("n_a"),
                   F.col("n_b").cast("long").alias("n_b"),
                   aff.alias("affinity")))
    out._zoi_persisted = [ei]  # release after materialization
    return out


def seed_distance(edges: DataFrame, seeds: DataFrame, *,
                  src_col: str = "src", dst_col: str = "dst",
                  seed_col: str = "node",
                  max_hops: int = 3) -> DataFrame:
    """Multi-source BFS over the undirected edge set: hop distance from
    the nearest seed, capped at *max_hops* — the TrustRank-style
    "distance from a trusted/spam seed set" feature (unreached nodes
    are simply absent; cap the hops, not the frontier). Output:
    (node, distance).

    Per hop: one join of the CURRENT FRONTIER (only nodes first reached
    last hop, not the whole reached set) against the edge table, one
    anti-join against reached — so total work is O(edges incident to
    newly reached nodes) per hop, the textbook frontier BFS;
    localCheckpoint per hop truncates lineage."""
    sym = _sym_edges(edges, src_col, dst_col).localCheckpoint(
        eager=True)
    reached = (seeds.select(F.col(seed_col).alias("node")).distinct()
               .withColumn("distance", F.lit(0))
               .localCheckpoint(eager=True))
    frontier = reached
    for hop in range(1, int(max_hops) + 1):
        nxt = (sym.join(frontier.select(F.col("node").alias("a")), "a")
               .select(F.col("b").alias("node")).distinct()
               .join(reached.select("node"), "node", "left_anti")
               .withColumn("distance", F.lit(hop))
               .localCheckpoint(eager=True))
        reached = reached.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return reached


def adamic_adar(edges: DataFrame, *, src_col: str = "src",
                dst_col: str = "dst",
                max_hub_degree: int | None = None,
                include_connected: bool = False) -> DataFrame:
    """Common-neighbor link prediction over the undirected distinct
    edge set: for every node pair (a < b) sharing ≥1 neighbor, emit
    ``common_neighbors`` and the Adamic–Adar index Σ_z 1/ln(deg(z))
    over shared neighbors z (Adamic & Adar 2003) — the standard
    "which hosts are about to link" / "which mirror farms belong
    together" signal on a web host graph.

    The score is reported as ``aa_micro`` — per-neighbor contribution
    ``round(1e6/ln(deg(z)))`` summed as a BIGINT — so it is exactly
    reproducible across engines (integer sums commute; float sums
    don't). deg(z) ≥ 2 for any shared neighbor, so ln is never 0.

    Plan: symmetrize → degree table (node-keyed agg) → join degree
    onto the shared-neighbor column → self-equi-join on z with a < b →
    groupBy (a, b). The only quadratic term is Σ_z deg(z)², driven by
    hub nodes: ``max_hub_degree`` EXCLUDES nodes above the cap from
    the shared-neighbor role (their per-pair contribution 1/ln(deg)
    is the smallest in the graph, and a 10^6-degree hub would alone
    emit 10^12 pairs — the same mega-bucket contract as the dedup
    blockers). Existing edges are anti-joined away by default (link
    prediction scores NEW links); ``include_connected=True`` keeps
    them (community-affinity use).
    """
    # sym feeds the degree agg, the neighbor list AND the final
    # anti-join; nbrs feeds both sides of the self-join — persist so
    # the symmetrize-distinct shuffle runs once, not 5×
    sym = _sym_edges(edges, src_col, dst_col).persist()
    deg = sym.groupBy(F.col("a").alias("z")) \
             .agg(F.count("*").alias("__deg"))
    if max_hub_degree is not None:
        deg = deg.where(F.col("__deg") <= int(max_hub_degree))
    # a degree-1 node can never be a SHARED neighbor, but its ln(1)=0
    # would still evaluate in the projection below (ANSI divide-by-
    # zero) — pruning it is semantics-preserving and saves join work
    deg = deg.where(F.col("__deg") >= 2)
    contrib = F.round(F.lit(1e6) / F.log(F.col("__deg"))) \
               .cast("long").alias("__c")
    nbrs = (sym.select(F.col("b").alias("z"), F.col("a").alias("n"))
            .join(deg, "z")
            .select("z", "n", contrib)).persist()
    pairs = (nbrs.alias("l")
             .join(nbrs.alias("r"),
                   (F.col("l.z") == F.col("r.z"))
                   & (F.col("l.n") < F.col("r.n")))
             .select(F.col("l.n").alias("node_a"),
                     F.col("r.n").alias("node_b"),
                     F.col("l.__c").alias("__c")))
    scored = (pairs.groupBy("node_a", "node_b")
              .agg(F.count("*").alias("common_neighbors"),
                   F.sum("__c").alias("aa_micro")))
    if not include_connected:
        scored = scored.join(
            sym.select(F.col("a").alias("node_a"),
                       F.col("b").alias("node_b")),
            ["node_a", "node_b"], "left_anti")
    scored._zoi_persisted = [sym, nbrs]
    return scored


def trust_rank(edges: DataFrame, seeds: DataFrame, *,
               src_col: str = "src", dst_col: str = "dst",
               seed_col: str = "node", weight_col: str | None = None,
               iters: int = 4, damping: float = 0.85,
               checkpoint: bool = True,
               broadcast_ranks: bool = True) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): PageRank
    whose teleport vector is uniform over a hand-vetted SEED set
    instead of uniform over all nodes — trust flows out of the seeds
    along links and decays with distance, so spam farms with no
    inbound path from the trusted core score ~0 however densely they
    interlink. The standard web-intake complement to
    :func:`pagerank`: rank says "important", trust says "reachable
    from known-good".

    Semantics: s(v) = 1/|S| on seed nodes (seeds not present in the
    graph are ignored), 0 elsewhere; r_0 = s; each round

        r(v) = (1−d)·s(v) + d·(Σ_in rank·w/out_w + dm·s(v))

    with dangling mass dm redistributed BY s (back to the trusted
    core, per the paper), not uniformly — total mass stays 1. Exactly
    *iters* rounds, deterministic, oracle-expressible as an unrolled
    CTE chain.

    Plan shape per round is identical to :func:`pagerank` (one edge
    shuffle, in-plan one-row dangling broadcast, per-round
    localCheckpoint); the seed flag is one extra column on the
    persisted node frame. ``broadcast_ranks`` follows the same
    host-vs-page guidance as :func:`pagerank`.
    """
    if iters < 1:
        raise ValueError("trust_rank: iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"),
        (F.col(weight_col) if weight_col is not None
         else F.lit(1.0)).cast("double").alias("__w"))
    e = (e.where(F.col("__src").isNotNull() & F.col("__dst").isNotNull())
         .groupBy("__src", "__dst").agg(F.sum("__w").alias("__w")))
    e = e.persist()

    nodes = (e.select(F.col("__src").alias("node"))
             .union(e.select(F.col("__dst")))
             .distinct())
    seed_nodes = (seeds.select(F.col(seed_col).alias("node"))
                  .distinct()
                  .join(nodes, "node", "left_semi").persist())
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("trust_rank: no seed appears in the graph")

    out_w = e.groupBy(F.col("__src").alias("node")).agg(
        F.sum("__w").alias("__out_w"))
    base = (nodes.join(out_w, "node", "left")
            .join(seed_nodes.withColumn("__is_seed", F.lit(True)),
                  "node", "left")
            .select("node", "__out_w",
                    F.when(F.col("__is_seed"), F.lit(1.0 / n_seeds))
                     .otherwise(F.lit(0.0)).alias("__s"))).persist()
    base.count()
    seed_nodes.unpersist()

    ranks = base.select("node", F.col("__s").alias("rank"),
                        "__out_w", "__s")
    for _ in range(iters):
        dangling = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("__out_w").isNull(),
                                    F.col("rank"))),
                       F.lit(0.0)).alias("__dm"))
        sources = ranks.where(F.col("__out_w").isNotNull()) \
                       .select("node", "rank", "__out_w")
        if broadcast_ranks:
            sources = F.broadcast(sources)
        contrib = (e.join(sources, e["__src"] == F.col("node"))
                   .groupBy(F.col("__dst").alias("node"))
                   .agg(F.sum(F.col("rank") * F.col("__w")
                              / F.col("__out_w")).alias("__in")))
        ranks = (base.join(contrib, "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit(1.0 - damping) * F.col("__s")
                          + F.lit(damping)
                          * (F.coalesce(F.col("__in"), F.lit(0.0))
                             + F.col("__dm") * F.col("__s")))
                         .alias("rank"),
                         "__out_w", "__s"))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("node", F.col("rank").cast("double"))
    out._zoi_persisted = [e, base]
    return out


def resolve_chains(edges: DataFrame, *, src_col: str = "src",
                   dst_col: str = "dst", rounds: int = 6) -> DataFrame:
    """Alias/redirect-chain resolution by pointer doubling: every
    source follows its chain for exactly ``2^rounds`` steps (64 by
    default) and reports where it landed — the scale-out way to
    collapse HTTP redirect chains, canonical-link aliases, or merged-id
    mappings before deduplication. A node with no outgoing edge stays
    put (chains terminate), so after ``k`` doublings every chain of
    length ≤ 2^k is fully resolved; ``is_terminal`` is False exactly
    for the survivors of longer chains or cycles (a redirect loop —
    report it, don't spin on it).

    The input must be FUNCTIONAL (≤1 outgoing edge per source) — the
    map is deduplicated to the min dst per src first so the result is
    deterministic and any SQL twin can replay the identical walk.

    Scale shape: ``rounds`` self-joins on the current mapping (each a
    hash join on the id key), ``localCheckpoint(eager=True)`` per
    round truncating lineage exactly like `pagerank`; log₂(longest
    chain) rounds instead of chain-length rounds is the whole point —
    a 64-hop chain costs 6 joins, not 64."""
    cur = (edges.where(F.col(src_col).isNotNull()
                       & F.col(dst_col).isNotNull())
           .groupBy(F.col(src_col).alias("src"))
           .agg(F.min(dst_col).alias("dst"))
           .localCheckpoint(eager=True))
    base = cur
    for _ in range(rounds):
        b = cur.select(F.col("src").alias("__s"),
                       F.col("dst").alias("__d"))
        cur = (cur.join(b, cur["dst"] == b["__s"], "left")
               .select(F.col("src"),
                       F.coalesce(F.col("__d"), F.col("dst"))
                       .alias("dst"))
               .localCheckpoint(eager=True))
    srcs = base.select(F.col("src").alias("__t"))
    return (cur.join(srcs, cur["dst"] == srcs["__t"], "left")
            .select("src", F.col("dst").alias("resolved"),
                    F.col("__t").isNull().alias("is_terminal")))


def rich_club(edges: DataFrame, *, src_col: str = "src",
              dst_col: str = "dst", thresholds=(2, 4, 8, 16),
              round_to: int = 6) -> DataFrame:
    """Rich-club coefficient (Zhou–Mondragón 2004) on the
    undirected simple graph: for each degree threshold k, the
    density φ(k) = 2·E_k / (N_k(N_k−1)) among nodes of degree > k —
    φ rising with k reads "the hubs form their own tightly-wired
    club" (a link-exchange cartel in a host graph), φ falling reads
    hub-and-spoke. The density-among-elites axis that
    assortativity (one global correlation) and k-core (peeling
    order) don't measure.

    One degree aggregation, then per threshold a broadcast
    membership filter over the edge table — edges are scanned once
    per threshold, thresholds are few. Returns ``(k, n_nodes,
    n_edges, phi)``.
    """
    e = (edges.select(F.col(src_col).alias("a"),
                      F.col(dst_col).alias("b"))
         .where(F.col("a") != F.col("b"))
         .select(F.least("a", "b").alias("u"),
                 F.greatest("a", "b").alias("v"))
         .distinct().persist())
    deg = (e.select(F.col("u").alias("n"))
           .unionByName(e.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
           .persist())
    rows = None
    for k in thresholds:
        elite = deg.where(F.col("d") > int(k)).select("n")
        nk = (e.join(elite.select(F.col("n").alias("u")), "u")
              .join(elite.select(F.col("n").alias("v")), "v")
              .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        cnt = elite.agg(F.count(F.lit(1)).cast("long")
                        .alias("n_nodes"))
        t = cnt.crossJoin(F.broadcast(nk)).select(
            F.lit(int(k)).cast("long").alias("k"),
            "n_nodes", "n_edges",
            F.round(F.when(F.col("n_nodes") >= 2,
                           2.0 * F.col("n_edges")
                           / (F.col("n_nodes")
                              * (F.col("n_nodes") - 1))),
                    round_to).alias("phi"))
        rows = t if rows is None else rows.unionByName(t)
    out = rows.orderBy("k")
    out._zoi_persisted = [e, deg]
    return out
