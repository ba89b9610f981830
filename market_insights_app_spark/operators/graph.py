"""Iterative graph analytics on DataFrames: PageRank.

PageRank (Page et al. 1999) is the canonical link-graph centrality of
a web-crawl pipeline — at 100 TB it ranks hosts/pages so that crawl
frontier scheduling, per-domain quality priors (e.g. the Common Crawl
host-level ranking shipped alongside the crawls) and spam demotion all
have a signal.  The repo already covers *component* structure
(operators/dedup.duplicate_clusters); this adds *importance*
structure — the second classic message-passing family.

Spark-first shape: each iteration is one equi-join (ranks onto the
out-edge list, key = src) followed by one map-side-combinable groupBy
(sum of contributions, key = dst) and a left join back onto the node
set — no RDDs, no driver-side graph.  At scale the edge list is
pre-partitioned by ``src`` ONCE and every iteration reuses that
partitioning for its join; only the contribution sum shuffles.  The
rank frame is a handful of longs per node.  Lineage is cut with an
eager ``localCheckpoint`` EVERY iteration (see the note above
``pagerank``) — the same lineage-cutting idea as the
connected-components loop (dedup.py), at a cadence measurement chose.

Cross-engine determinism: ranks live on an INTEGER grid (parts per
``grid``, default 1e9 — the same 10⁻⁹ fixed-point contract as the
market-analytics lane, operators/market.py).  Each contribution is an
integer floor-division ``rank_grid div outdeg``, the damped sum is
``(damping_pct * Σ) div 100``, and the teleport term is
``(100 - damping_pct) * grid div (100 * n)`` — every operation is
exact int64 arithmetic, so the result is bit-identical across Spark
partitionings, engines (the DuckDB twin replays the same integers) and
cluster sizes.  int64 headroom: total mass ≤ grid = 1e9, so the worst
per-node damped product is ≤ 85 * 1e9 ≪ 2^63.

Dangling nodes (out-degree 0) keep receiving rank but forward none —
their outbound mass evaporates instead of being redistributed (the
"remove dangling mass" PageRank variant; totals then sum to < 1).
This keeps every iteration one join + one aggregate; the
redistribution variant (``redistribute_dangling=True``) pays an extra
global scalar + eager lineage cut per iteration to conserve mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Eager lineage cut EVERY iteration: counter-intuitively ~2× faster
# end-to-end than batching 4 iterations into one plan (measured 20.0 s
# → 10.5 s at 1M nodes / 3M edges / 10 iters, SCALE_NOTES r9) — a
# deep iterated join plan pays superlinear planning + sort cost, while
# per-iteration checkpoints keep each job flat over a materialized
# rank frame of 2 longs/node.

# Cut cadence in the collapsed-to-1-partition regime, where the loop is
# job-scheduling-bound and stacking a few iterations per cut beats the
# at-width rule above (paired A/B in SCALE_NOTES r10).  Module-level so
# probes/tests can pair the two cadences inside one session.
_TINY_CUT_EVERY = 3


def _pagerank_tiny(
    e: DataFrame,
    iterations: int,
    damping_pct: int,
    grid: int,
    tol_grid: int | None,
    redistribute_dangling: bool,
) -> DataFrame:
    """Single-Arrow-task PageRank for graphs under ``tiny_threshold``
    nodes (see :func:`pagerank`): the canonical-form edge list
    (distinct, self-loops dropped) collapses to one partition and one
    mapInPandas task replays the exact int64 grid recurrence in numpy.
    Every arithmetic step mirrors the distributed lane operation for
    operation — floor divisions on non-negative int64 match SQL
    ``div``, the damped sum and teleport term are the same integers,
    tol stops after the update exactly like the driver-scalar branch,
    and the dangling mass is summed over out-degree-0 nodes BEFORE the
    update — so the two lanes are bit-identical by construction (and
    pinned so in tests/test_graph.py)."""
    schema = "node long, rank_grid long, pagerank double"

    def task(batches):
        import numpy as np
        import pandas as pd

        parts = [p for p in batches]
        pdf = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"src": [], "dst": []})
        )
        src = pdf["src"].to_numpy(dtype=np.int64, copy=False)
        dst = pdf["dst"].to_numpy(dtype=np.int64, copy=False)
        node_ids = np.unique(np.concatenate([src, dst]))
        m = len(node_ids)
        if m == 0:
            yield pd.DataFrame(
                {"node": [], "rank_grid": [], "pagerank": []}
            ).astype({"node": "int64", "rank_grid": "int64",
                      "pagerank": "float64"})
            return
        si = np.searchsorted(node_ids, src)
        di = np.searchsorted(node_ids, dst)
        out = np.bincount(si, minlength=m).astype(np.int64)
        teleport = ((100 - damping_pct) * grid) // (100 * m)
        rank = np.full(m, grid // m, dtype=np.int64)
        dangling = out == 0
        for i in range(iterations):
            share = (
                int(rank[dangling].sum()) // m
                if redistribute_dangling
                else 0
            )
            contrib = rank[si] // out[si]
            s = np.zeros(m, dtype=np.int64)
            np.add.at(s, di, contrib)
            new = teleport + (damping_pct * (s + share)) // 100
            delta = (
                int(np.abs(new - rank).sum())
                if tol_grid is not None and i + 1 < iterations
                else None
            )
            rank = new
            if delta is not None and delta <= tol_grid:
                break
        yield pd.DataFrame(
            {
                "node": node_ids,
                "rank_grid": rank,
                "pagerank": rank.astype(np.float64) / float(grid),
            }
        )

    return e.repartition(1).mapInPandas(task, schema=schema)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
    grid: int = 10**9,
    tol_grid: int | None = None,
    redistribute_dangling: bool = False,
    tiny_threshold: int = 0,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list.

    Parallel edges are collapsed (an edge either exists or not —
    unweighted PageRank); self-loops are dropped.  Returns one row per
    node: (node, rank_grid BIGINT, pagerank DOUBLE) where
    ``pagerank = rank_grid / grid`` and ``rank_grid`` is the exact
    integer the iteration produced (the hash-gateable value).

    ``damping_pct`` is the damping factor in integer percent (85 =
    the classic 0.85) so the damped sum stays on the integer grid.

    ``tol_grid`` enables early convergence: stop once the L1 rank
    delta Σ|new − old| (grid units — exact int64, so the stopping
    decision is engine- and partitioning-deterministic, unlike a
    float-ε test) drops to ``tol_grid`` or below.  Costs one driver
    scalar per iteration; ``iterations`` stays the hard cap, so the
    result equals the fixed-iteration run with however many rounds
    convergence actually took.

    ``tiny_threshold`` (r11, opt-in: 0 = off) collapses the WHOLE
    iteration into one Arrow task when the node count — the same
    driver scalar the partition-sizing logic already pays — is at or
    below it: at small graph sizes the distributed loop is pure
    job-scheduling overhead (10 iterations × join+agg+cut ≈ 30 jobs
    for a result a single numpy pass computes in milliseconds), while
    past the threshold nothing changes.  The task replays the exact
    int64 grid arithmetic (floor-div contributions, damped integer
    sum, same teleport term, same tol/dangling semantics), so ranks
    are BIT-IDENTICAL to the distributed lane — pinned cross-lane and
    against the pure-Python reference in tests/test_graph.py.  Memory
    bound: one task holds the tiny edge list + two int64 vectors of
    length n ≤ tiny_threshold.

    ``redistribute_dangling`` opts into the mass-conserving variant:
    each iteration adds the dangling nodes' rank mass back uniformly
    (``new = teleport + (damping_pct · (s + D div n)) div 100`` with
    ``D`` = Σ rank over out-degree-0 nodes), so ranks sum to ~1·grid
    up to integer-division dust — what host-ranking consumers usually
    expect.  Cost: ONE extra global scalar (and an eager lineage cut)
    per iteration, exactly the trade the default avoids; the default
    (False) keeps the evaporating-mass variant the registered oracle
    replays.

    The edge-list cache is dropped (``unpersist``) before returning:
    the returned frame is cut from the iteration lineage, so repeated
    calls in one session don't accumulate executor cache residency.
    """
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # The gate's node count and the tiny lane's Arrow task EACH
    # evaluate the edge upstream once (two total).  That is the right
    # default: a gate-side persist was measured at fixture scale as a
    # net PESSIMIZATION for cheap upstreams (+0.7 s on pagerank_links'
    # synthetic projection — cache write + blocking release cost more
    # than the saved recompute, r12 bench).  Callers whose edge
    # derivation is expensive materialize it THEMSELVES before calling
    # (host_pagerank eagerly checkpoints the host edge list, which its
    # name join needs anyway — pipelines/crawl_corpus.py).
    default_parts = edges.sparkSession.sparkContext.defaultParallelism
    nodes_plain = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    # one driver scalar, same bound as a k-means k.  r14: the count
    # runs on the PLAIN distinct — no wide repartition, no persist.
    # Both of those only pay off in the distributed iteration below
    # (nodes anchors every iteration's left join), so the tiny lane —
    # where the gate count is the ONLY job this function runs — no
    # longer writes a 32-partition cache it immediately drops, and the
    # distributed lane can lay ``nodes`` out at its final
    # data-adaptive width directly instead of persisting wide and
    # re-persisting slim (the r9-r13 relayout dance paid an extra
    # materialization job whenever the graph was small).
    n = nodes_plain.count()
    if n == 0:
        return nodes_plain.select(
            F.col("node"),
            F.lit(0).cast("long").alias("rank_grid"),
            F.lit(0.0).alias("pagerank"),
        )
    if 0 < tiny_threshold and n <= tiny_threshold:
        return _pagerank_tiny(
            e, iterations, damping_pct, grid, tol_grid,
            redistribute_dangling,
        )
    # DATA-ADAPTIVE partition count for the iteration working set: at
    # small graph sizes the 10-iteration loop is pure task-scheduling
    # overhead, and full-width layouts more than double it (sf0.1
    # fixture: 32 parts 6.3 s vs 8 parts 2.8 s best-of-2, SCALE_NOTES
    # r9).  ≥ ~10k nodes/partition before going wide; big graphs keep
    # every core (parts = defaultParallelism) and pay NOTHING extra.
    # nodes is persisted like elist: it anchors EVERY iteration's left
    # join, and unpersisted it re-runs its 2·|E|-row distinct once per
    # iteration inside each action — measured 19.6 s → 15.5 s
    # end-to-end at 1M nodes / 3M edges / 10 iters (SCALE_NOTES r9).
    # Partitioned by the join key once so the per-iteration join
    # reuses the layout; dropped with elist before return.
    parts = max(1, min(default_parts, n // 10_000))
    nodes = nodes_plain.repartition(parts, "node").persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    # one edge-list frame carrying the out-degree, partitioned by the
    # join key once so all `iterations` joins reuse the layout.
    # persist(), deliberately NOT localCheckpoint: a checkpointed
    # RDD-backed frame loses size statistics and the planner demotes
    # every iteration's join to a sorted SMJ — measured ~2.6× slower
    # at 1M nodes / 10 iterations (r8 probe; its timer undercounted
    # absolute cost — SCALE_NOTES r9 correction — but both variants
    # equally, so the relative conclusion stands).  The cache-residency
    # trade is bounded (edges × ~3 longs) and released before return.
    elist = (
        e.join(outdeg, "src")
        .repartition(parts, "src")
        .persist()
    )
    teleport = ((100 - damping_pct) * grid) // (100 * n)
    pr = nodes.select(
        "node", F.lit(grid // n).cast("long").alias("rank_grid")
    )
    dangling = (
        nodes.join(elist.select(F.col("src").alias("node")), "node", "left_anti")
        if redistribute_dangling
        else None
    )
    # exactly ONE eager lineage cut per iteration frame (r9 ADVICE: the
    # default+tol lane paid two back-to-back localCheckpoints — a full
    # extra materialization of the rank frame per iteration).  pr_cut
    # tracks whether the CURRENT pr is already checkpointed.
    #
    # DATA-ADAPTIVE cut cadence (r10, values unaffected — checkpoint
    # placement is resource lifecycle): at big widths the per-iteration
    # cut is load-bearing (1M nodes: cadence-1 10.5 s vs cadence-2
    # 14.2 s — plan depth costs superlinear planning + sort there,
    # SCALE_NOTES r9), but in the collapsed-to-1-partition regime the
    # loop is pure job-scheduling overhead and stacking 3 iterations
    # per cut is measurably cheaper (sf0.1 fixture best-of-3: cadence-1
    # 3.25 s, cadence-3 2.78 s, cadence-10 worse again — SCALE_NOTES
    # r10).  Lanes that run a per-iteration ACTION on pr (tol delta,
    # dangling-mass scalar) stay at cadence 1: an un-cut pr would
    # recompute its whole stacked chain inside every such action.
    cut_every = (
        _TINY_CUT_EVERY
        if parts == 1 and tol_grid is None and not redistribute_dangling
        else 1
    )
    pr_cut = False
    for i in range(iterations):
        if redistribute_dangling:
            # the mass-conserving variant's extra cost is ONE global
            # scalar per iteration; the lineage cut doubles as the
            # loop's standard per-iteration checkpoint — skipped when
            # the tol branch already cut this frame last iteration
            if not pr_cut:
                pr = pr.localCheckpoint(eager=True)
            d_mass = (
                pr.join(dangling, "node").agg(F.sum("rank_grid")).first()[0]
                or 0
            )
            share = d_mass // n
        else:
            share = 0
        contribs = (
            elist.join(pr, elist["src"] == pr["node"])
            .select(
                F.col("dst"),
                F.expr("rank_grid div out").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        prev = pr
        pr = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(s, 0) + {share})) div 100"
                    )
                ).cast("long").alias("rank_grid"),
            )
        )
        pr_cut = False
        if (
            i + 1 < iterations
            and (not redistribute_dangling or tol_grid is not None)
            and (i + 1) % cut_every == 0
        ):
            # one cut, reused by the tol delta scan AND the next
            # iteration's join (and, on the redistribute lane, by the
            # next iteration's dangling-mass scan)
            pr = pr.localCheckpoint(eager=True)
            pr_cut = True
        if tol_grid is not None and i + 1 < iterations:
            delta = (
                pr.join(
                    prev.select(
                        "node", F.col("rank_grid").alias("__old")
                    ),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("rank_grid") - F.col("__old"))))
                .first()[0]
            )
            if delta is not None and delta <= tol_grid:
                break
    # cut the returned frame from the iteration lineage, then drop the
    # edge-list cache: repeated pagerank() calls in one session must
    # not accumulate executor cache blocks (the persist is an
    # iteration-internal working set, not part of the result).
    # blocking=True makes the release deterministic — the checkpoint
    # above already paid the materialization, so there is no work to
    # overlap with, and the guard test can assert the exact residue
    # (one checkpointed result RDD, nothing else).
    if not pr_cut:
        pr = pr.localCheckpoint(eager=True)
    elist.unpersist(blocking=True)
    nodes.unpersist(blocking=True)
    out = pr.select(
        "node",
        "rank_grid",
        (F.col("rank_grid").cast("double") / F.lit(float(grid))).alias(
            "pagerank"
        ),
    )
    return out


def synthetic_link_graph(docs: DataFrame) -> DataFrame:
    """Deterministic, SKEWED link graph over the documents table.

    Three arms per doc ``i`` (n = corpus size): a quadratic arm
    ``((i mod n)² + 1) mod n`` (residue collisions vary in-degree), a
    permutation arm ``(i · 31 + 7) mod n`` (keeps every node
    reachable), and a hub arm ``i mod max(n/50, 1)`` (the first ~2 %
    of ids collect ~50 in-links each — the power-law head a real link
    graph has).

    Id bound (the bit-identical cross-engine contract): the quadratic
    arm reduces ``i`` mod n BEFORE squaring, so it stays exact int64
    for any ids as long as the corpus COUNT n ≤ ~3.04e9 ((n-1)² <
    2^63); past that, Spark would wrap silently while DuckDB raises on
    BIGINT overflow, so the twin contract breaks — a 128-bit modmul
    would be needed in both engines.  The permutation arm's ``i·31``
    is exact for ids up to ~2.97e17.  Self-loops are dropped by :func:`pagerank`.  At
    sf0.01 the resulting ranks span ~100× min-to-max with hundreds of
    distinct values, so the PageRank gate is actually discriminating
    (a permutation-only graph yields the uniform vector — a vacuous
    gate).  ``n`` rides a broadcast scalar subquery, never a driver
    round-trip."""
    cnt = docs.groupBy().agg(F.count(F.lit(1)).alias("n"))
    base = docs.select(F.col("doc_id").alias("src")).crossJoin(
        F.broadcast(cnt)
    )
    arms = [
        base.select(
            "src",
            (
                ((F.col("src") % F.col("n")) * (F.col("src") % F.col("n")) + 1)
                % F.col("n")
            ).alias("dst"),
        ),
        base.select(
            "src", ((F.col("src") * 31 + 7) % F.col("n")).alias("dst")
        ),
        base.select(
            "src",
            (
                F.col("src")
                % F.greatest(F.expr("n div 50"), F.lit(1).cast("long"))
            ).alias("dst"),
        ),
    ]
    out = arms[0]
    for a in arms[1:]:
        out = out.union(a)
    return out


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED view of ``edges``
    (direction and duplicates collapse; self-loops drop) — the classic
    degree-ordered enumeration (Schank & Wagner 2005; the
    MapReduce/Spark formulation in Suri & Vassilvitskii, WWW'11):

    1. canonicalize each edge to (a < b), distinct;
    2. orient every edge from its lower-(degree, id) endpoint to the
       higher one — a total order, so each undirected edge appears
       exactly once and each node's ORIENTED out-degree is O(sqrt m)
       even at power-law hubs (a hub's edges point INTO it from its
       lower-degree neighbors);
    3. wedges = per-source pairs of out-neighbors (ordered by the same
       total order, so each wedge enumerates once);
    4. a wedge (u, v, w) closes into a triangle iff the (v, w) edge
       exists — oriented v→w by construction — one left-semi join;
    5. per-node counts = explode the three corners, one groupBy.

    Scale shape: steps 2-5 are equi-joins and aggregations only (no
    cartesian, no driver state); the degree orientation is what keeps
    the wedge fan-out O(m^1.5) total instead of sum(deg²) — at a
    power-law 100 TB link graph the hub arm would otherwise dominate
    quadratically.  Every step is exact integer arithmetic, so a SQL
    twin enumerating triangles the naive a<b<c way hash-matches.

    Returns (node, triangles) for every node in at least one triangle.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # und feeds THREE consumers (degree agg ×2 via the union, the
    # orientation join) and o feeds three more (both wedge sides, the
    # closure semi-join) — without lineage cuts every consumer
    # re-derives the whole upstream edge expression (measured on the
    # synthetic fixture: 30 re-evaluations of the arm subtree, i.e.
    # 30 corpus scans at 100 TB).  Eager localCheckpoints materialize
    # each ONCE; the ContextCleaner frees the blocks when the result
    # frame drops (the pagerank/dedup in-repo standard).
    und = (
        e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        und.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("db")),
            "b",
        )
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)
    o1, o2 = o.alias("o1"), o.alias("o2")
    rank_lt = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = o1.join(
        o2, (F.col("o1.u") == F.col("o2.u")) & rank_lt
    ).select(
        F.col("o1.u").alias("tu"),
        F.col("o1.v").alias("tv"),
        F.col("o2.v").alias("tw"),
    )
    tri = wedges.join(
        o.select(F.col("u").alias("tv"), F.col("v").alias("tw")),
        ["tv", "tw"],
        "left_semi",
    )
    return (
        tri.select(
            F.explode(F.array("tu", "tv", "tw")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def link_predict_common_neighbors(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int = 32,
    min_common: int = 2,
) -> DataFrame:
    """Friend-of-friend link prediction by common-neighbor count
    (Liben-Nowell & Kleinberg 2003's strongest simple baseline) over
    an UNDIRECTED view of ``edges``: for every NON-adjacent pair
    (a < b) sharing at least ``min_common`` neighbors, the count of
    shared neighbors — the fourth graph primitive after PageRank,
    connected components and triangles, and the one a recommendation
    / related-items surface runs nightly.

    Scale contract — the degree cap IS the semantics, not a fallback:
    a pair's wedges through a center z cost C(deg(z), 2), so an
    uncapped enumeration is sum(deg²) — the power-law hub arm makes
    that quadratic exactly where the signal is weakest (sharing a
    mega-hub neighbor carries ~zero evidence two nodes are related;
    the same reasoning Adamic-Adar formalizes by down-weighting
    1/log deg, and sublinear-wedge samplers exploit).  Centers with
    degree > ``max_center_degree`` therefore contribute NO wedges, by
    definition, in BOTH engines — total wedge work is bounded by
    cap·m, linear in the edge count.  Raising the cap trades cost for
    recall on hub-mediated pairs; the default keeps per-center work
    ≤ C(32,2) = 496 pairs.

    Shape: canonicalize → degree → cap-filtered full adjacency →
    per-center out-pair join (the triangle wedge join with the center
    kept) → one anti-join against the edge set (predicted links must
    be NEW) → one groupBy count.  Equi-joins and aggregations only;
    pure int64; no driver state.  Returns (node_a, node_b,
    common_neighbors), node_a < node_b.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    # und feeds four consumers (degree union ×2, adjacency union ×2,
    # the final anti-join) — same lineage-cut rationale as
    # triangle_count: materialize the canonical edge set ONCE.
    und = (
        e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    centers = deg.filter(F.col("deg") <= max_center_degree).select("node")
    adj = und.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).union(und.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
    cadj = adj.join(centers, "node", "left_semi").localCheckpoint(eager=True)
    a1, a2 = cadj.alias("a1"), cadj.alias("a2")
    pairs = a1.join(
        a2,
        (F.col("a1.node") == F.col("a2.node"))
        & (F.col("a1.nbr") < F.col("a2.nbr")),
    ).select(F.col("a1.nbr").alias("a"), F.col("a2.nbr").alias("b"))
    fresh = pairs.join(und, ["a", "b"], "left_anti")
    return (
        fresh.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            "common_neighbors",
        )
    )


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 8,
) -> DataFrame:
    """Synchronized k-core peeling over an UNDIRECTED view of
    ``edges`` (Seidman 1983; the Batagelj–Zaveršnik sequential peel
    re-expressed as the bulk-synchronous variant every distributed
    engine uses): each round simultaneously deletes EVERY node whose
    degree in the current surviving subgraph is < ``k``, for a FIXED
    ``rounds`` — the :func:`pagerank` iterations contract, so the
    output is deterministic and twin-replayable whether or not the
    peel has converged (when it has, the survivors are exactly the
    k-core: the maximal subgraph of minimum degree ≥ k).  Rounds
    needed in practice is the peeling DEPTH, typically O(log n) on
    power-law graphs — a chain construction can force Θ(n), which is
    why rounds is a parameter and not a convergence loop.

    Returns (node, degree) for surviving nodes, degree measured in
    the surviving subgraph.

    Scale shape: per round, one degree aggregate + two left-semi
    joins, all equi-keyed on the node — linear in surviving edges,
    shrinking monotonically; each round's edge set is eagerly
    checkpointed (the pagerank lineage-cut standard — without it
    round r's plan re-derives all r−1 predecessors and the upstream
    scan 2^r times).  Pure int64; no driver state beyond the loop
    counter."""
    if k < 1 or rounds < 0:
        raise ValueError("k must be ≥ 1 and rounds ≥ 0")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    alive = (
        e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        deg = (
            alive.select(F.col("a").alias("node"))
            .union(alive.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        alive = (
            alive.join(
                keep.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        alive.select(F.col("a").alias("node"))
        .union(alive.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def synthetic_clique(docs: DataFrame, target: int = 20) -> DataFrame:
    """Deterministic ~``target``-node clique over the documents table
    (members: doc_id ≡ 0 mod max(n/target, 1)) — the fixture arm that
    gives :func:`kcore` a non-trivial STABLE core: the skewed link
    graph alone is too homogeneous (k=4 peels everything within 8
    rounds, k=3 peels nothing — measured at staging), while a clique
    of size ≥ k+1 survives any k-core peel by construction.  Member
    count is ~target at EVERY corpus size (the modulus scales with n),
    so the clique contributes a CONSTANT ≤ C(target,2) edges — the
    pair join below is a tiny bounded nested-loop, never a scale
    term."""
    cnt = docs.groupBy().agg(F.count(F.lit(1)).alias("n"))
    step = F.greatest(F.expr("n div 20"), F.lit(1).cast("long"))
    sel = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(cnt))
        .filter(F.col("doc_id") % step == 0)
        .select("doc_id")
    )
    c1 = sel.select(F.col("doc_id").alias("src"))
    c2 = sel.select(F.col("doc_id").alias("dst"))
    return c1.join(F.broadcast(c2), F.col("src") < F.col("dst"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007, the bulk-synchronous min-tie variant the
    GraphX/Pregel implementations use): every node starts labeled with
    itself; each round every node SIMULTANEOUSLY adopts the most
    frequent label among its neighbors, ties broken by MIN label — so
    each round is a pure function of the previous labeling and the
    output is deterministic and twin-replayable.  Fixed ``rounds`` (the
    :func:`pagerank` iterations contract): synchronous LPA is known to
    oscillate on bipartite-ish structures rather than converge, which
    is precisely why the distributed formulation runs a fixed budget
    and never a convergence loop.  Undirected view of ``edges``;
    self-loops dropped.  Returns (node, label).

    Scale shape: the symmetric adjacency is materialized ONCE and
    checkpointed; per round one equi-join (labels onto neighbor ids),
    one (node, label) count, and one per-node argmax via max(struct) —
    all shuffles on the node key, linear in edges, no driver state.
    Each round's labeling is eagerly checkpointed (the pagerank
    lineage-cut standard — without it round r's plan re-derives all
    r−1 predecessors and the upstream scan 2^r times).  The sixth
    graph primitive (after PageRank, connected components, triangles,
    link prediction, k-core): CC gives reachability classes, LPA
    splits them into densely-linked communities — the grouping a crawl
    pipeline samples by when one host-authority class is too coarse.
    Pure int64."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = adj.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(rounds):
        counts = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # most frequent neighbor label, tie -> smallest label:
        # max(struct(c, -label)) maximizes c then minimizes label
        labels = (
            counts.groupBy("node")
            .agg(
                (
                    -F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl")))
                    .getField("nl")
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", "label")


def bfs_distance(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    rounds: int = 6,
) -> DataFrame:
    """Multi-source BFS over an UNDIRECTED view of ``edges``: distance
    from the nearest seed, the frontier-relaxation bulk-synchronous
    form (each round relaxes dist(v) = min(dist(v), min over neighbors
    + 1) simultaneously — Bellman-Ford restricted to unit weights).
    Fixed ``rounds`` (the :func:`pagerank` iterations contract):
    deterministic and twin-replayable whether or not the frontier has
    drained; a converged graph stops changing, an unconverged one
    reports distances ≤ rounds, both exactly reproducible.  The crawl
    scheduler's primitive: depth-from-seed-hosts decides fetch
    priority and politeness budgets.

    Returns (node, dist) for nodes within ``rounds`` hops of any seed
    (seeds at dist 0).  Unreached nodes are absent, not NULL.

    Scale shape: per round one equi-join (frontier onto adjacency) +
    one min-aggregate, both node-keyed; the distance table is eagerly
    checkpointed per round (lineage cut).  Adjacency materialized
    once.  Pure int64."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
        .union(e.select(F.col("b").alias("node"), F.col("a").alias("nbr")))
        .localCheckpoint(eager=True)
    )
    dist = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).cast("long").alias("dist")
    ).distinct()
    for _ in range(rounds):
        relaxed = (
            adj.join(
                dist.select(F.col("node").alias("nbr"), "dist"), "nbr"
            )
            .select("node", (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist
