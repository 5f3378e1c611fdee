"""Iterative graph analytics done Spark-shaped: PageRank over the part
co-occurrence graph (parts are connected when co-ordered at least
MIN_COOCCUR times), with EXACT cross-engine parity.

Iterative algorithms are where naive Spark ports die at scale (lineage
blow-up, re-computed inputs, float drift). The discipline here:

- The edge relation is built once, persisted, and pre-partitioned on the
  join key, so each of the K iterations joins against the SAME cached,
  co-located frame — the fact self-join is paid exactly once.
- The rank chain is linear (iteration k+1 reads only iteration k), so the
  lazy plan stays a pipeline of K join+agg stages — no exponential lineage.
- All arithmetic is scaled-integer with explicit floor division
  (`(85 * rank) div (100 * outdeg)`): BIGINT sums are order-independent,
  so the result is bit-identical across partitionings AND across engines —
  the DuckDB oracle unrolls the same K steps as chained CTEs.

Dangling-node mass is a non-issue by construction: co-occurrence edges are
symmetric, so every node has outdegree >= 1.

No reference citation: the reference (SURVEY §2.1, two pandas/boto3
scripts) has no graph surface; extension per the §2.6 mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import default_parallelism
from ..sources.tables import load_table
from .registry import query, scoped_persist

#: Fixed iteration count (unrolled identically in the SQL oracle).
PR_ITERS = 5
#: Rank scale: ranks live in units of 1e-9 (r0 = 1.0 → RANK_SCALE).
RANK_SCALE = 10**9
#: Damping factor 0.85 as a ratio (exact in integer arithmetic).
DAMP_NUM, DAMP_DEN = 85, 100
#: Keep only edges whose parts were co-ordered at least this many times.
#: Raw co-occurrence is quadratically dense (every basket is a clique, so
#: one-off pairings dominate: 2.39M raw vs 7.7k significant edges at
#: sf0.1); thresholding keeps the graph's signal and makes iteration cost
#: O(significant edges), the same pruning a production co-view/co-purchase
#: graph applies before any ranking pass.
MIN_COOCCUR = 2

#: Minimum useful rows per iteration-frame task: below this, task-launch
#: overhead (~5-20 ms each) exceeds the per-partition compute, and K
#: rounds multiply the waste. Only bites on SMALL relations — any
#: corpus-scale edge frame divides to the core-count cap long before it.
ITER_ROWS_PER_TASK = 2000


def _iter_parallelism(spark: SparkSession, n_rows: int | None = None) -> int:
    """Partition count for PERSISTED iteration relations and per-round
    localCheckpoint frames: the cluster's core count, NOT the session's
    shuffle-partition default — capped further by the relation's actual
    size when known.  Three reasons. (1) ``localCheckpoint``
    materializes through the RDD path, which AQE's partition coalescing
    never touches — under a vanilla 200-partition session every
    per-round frame otherwise carries 200 (mostly empty) partitions
    into every subsequent round, and task-scheduling overhead dominates
    the iteration (measured ~9x on hits_purchase_graph at sf1).
    (2) The edge relation is scanned once per round, so its partition
    count should equal the machine's parallelism — one wave of tasks —
    rather than whatever the session default happens to be.  On a real
    cluster defaultParallelism is the total executor-core count, so the
    same sizing holds at 1000 executors.  (3) A SMALL graph (the
    significant-edge relation at sf0.1 is 7.7k rows) doesn't deserve a
    full wave: K rounds x 32 near-empty tasks is pure scheduler floor
    (measured: pagerank 2.9 s -> 1.5 s at sf0.1 by sizing to rows /
    ITER_ROWS_PER_TASK), while at sf1+ the row count pushes the value
    back to the core-count cap — the knob only trims the small end."""
    cores = max(8, default_parallelism(spark))
    if n_rows is None:
        return cores
    return max(4, min(cores, int(n_rows) // ITER_ROWS_PER_TASK))


#: Memoized row counts of persisted iteration relations, keyed by the
#: frame's semantic hash — back-to-back graph queries over the same
#: corpus share one count job (the frames themselves are shared through
#: scoped_persist, so the count is a cached-scan aggregate either way).
_FRAME_ROWS_CACHE: dict[object, int] = {}
_MAX_FRAME_ROWS_CACHE = 32


def _frame_rows(frame: DataFrame) -> int:
    try:
        key: object = frame.semanticHash()
    except Exception:  # pragma: no cover - defensive
        key = None
    if key is not None and key in _FRAME_ROWS_CACHE:
        return _FRAME_ROWS_CACHE[key]
    n = frame.count()
    if key is not None:
        _FRAME_ROWS_CACHE[key] = n
        while len(_FRAME_ROWS_CACHE) > _MAX_FRAME_ROWS_CACHE:
            _FRAME_ROWS_CACHE.pop(next(iter(_FRAME_ROWS_CACHE)))
    return n


def edge_parallelism(spark: SparkSession, frame: DataFrame) -> int:
    """Size-aware _iter_parallelism for a (persisted) edge relation: one
    memoized count prices the iteration partitioning. The count doubles
    as the materialization of the shared edge cache, which every round
    would otherwise pay inside its first stage."""
    return _iter_parallelism(spark, _frame_rows(frame))


def _oracle() -> str:
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # (1-d)·S
    steps = [
        f"""pr0 AS (
          SELECT node, CAST({RANK_SCALE} AS BIGINT) AS rank FROM nodes
        )"""
    ]
    for k in range(PR_ITERS):
        steps.append(f"""pr{k + 1} AS MATERIALIZED (
          SELECT n.node,
                 CAST({base} + COALESCE(SUM(
                   ({DAMP_NUM} * p.rank) // ({DAMP_DEN} * e.outdeg)
                 ), 0) AS BIGINT) AS rank
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN pr{k} p ON p.node = e.src
          GROUP BY n.node
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), deg AS MATERIALIZED (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
          FROM pairs GROUP BY src
        ), edges AS MATERIALIZED (
          SELECT p.src, p.dst, d.outdeg FROM pairs p JOIN deg d USING (src)
        ), nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM pairs
        ), {", ".join(steps)}
        SELECT node AS part_key, rank AS pagerank
        FROM pr{PR_ITERS}
    """


def significant_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed significant co-occurrence edges (both orientations).

    Basket-bounded self-join on l_orderkey (Σ basket² rows, linear in
    orders), aggregated to pair multiplicities, thresholded. Persisted
    through scoped_persist, so back-to-back graph queries over the same
    corpus (pagerank, triangle count) share one materialization."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    return scoped_persist(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n_coorders"))
        .where(F.col("n_coorders") >= MIN_COOCCUR)
        .select("src", "dst", "n_coorders")
        # The persisted frame is re-scanned once per round by every
        # iterative consumer (SSSP, triangle, link prediction), so its
        # partition count must track the cluster's core count, not the
        # session's shuffle default — under a vanilla 200-partition
        # session the cached 200-way layout made each SSSP relaxation
        # round a 200-task stage over ~thousands of rows.  coalesce
        # (not repartition): it folds the aggregate's reduce stage into
        # p_iter tasks without a second shuffle.
        .coalesce(_iter_parallelism(spark))
    )


def partitioned_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The significant edge relation joined with out-degrees, persisted
    and pre-partitioned on src — the ONE materialization all iterative
    graph queries (pagerank, BFS) join against; scoped_persist shares it
    across back-to-back queries over the same corpus."""
    pairs = significant_pairs(spark, sf_dir)
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return scoped_persist(
        pairs.join(deg, "src").repartition(
            edge_parallelism(spark, pairs), "src"
        )
    )


@query("pagerank_part_graph", oracle=_oracle())
def pagerank_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=5 PageRank iterations over the significant part co-occurrence
    graph (parts co-ordered >= MIN_COOCCUR times); returns every node's
    scaled-integer rank (units of 1e-9).

    The edge relation is paid once behind scoped_persist, pre-partitioned
    on src so every iteration's rank join is co-located — only the rank
    frame (2 longs/node) moves per iteration. At 100 TB the identical loop
    runs with the edge frame hash-partitioned across the cluster; the
    per-iteration shuffle is O(|nodes|), never O(|edges|)."""
    edges = partitioned_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = nodes.select("node", F.lit(RANK_SCALE).cast("long").alias("rank"))
    for _ in range(PR_ITERS):
        contribs = edges.join(
            ranks, edges["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.expr(
                f"({DAMP_NUM} * rank) div ({DAMP_DEN} * outdeg)"
            ).alias("contrib"),
        )
        # Aggregate per-dst BEFORE touching nodes: the O(|edges|) rows
        # collapse map-side to O(|nodes|), and the nodes left join (for
        # in-degree-0 nodes) then moves only two longs per node.
        contrib_agg = contribs.groupBy("dst").agg(
            F.sum("contrib").alias("incoming")
        )
        ranks = nodes.join(
            contrib_agg, nodes["node"] == contrib_agg["dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.coalesce(F.col("incoming"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    return ranks.select(
        F.col("node").alias("part_key"), F.col("rank").alias("pagerank")
    )


_TRIANGLE_ORACLE = f"""
    WITH pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
    ), oriented AS (
      SELECT src AS a, dst AS b FROM pairs WHERE src < dst
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM oriented) AS BIGINT) AS n_edges
    FROM oriented e1
    JOIN oriented e2 ON e2.a = e1.b
    JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@query("triangle_count_part_graph", oracle=_TRIANGLE_ORACLE)
def triangle_count_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the significant co-occurrence graph (the
    clustering signal behind community detection / recommender sanity
    checks).

    Standard oriented wedge-closure: undirected edges are oriented
    low-id -> high-id (each triangle counted exactly once), wedges come
    from one equi-join of the oriented edge list with itself, and a
    second equi-join closes them. Both joins are hash joins on node ids —
    at 100 TB-scale graphs the classic refinement is degree-ordered
    orientation (orient toward the higher-degree endpoint) which bounds
    wedge fan-out by sqrt(|E|) per node; id-orientation is kept here
    because the thresholded graph's degrees are already tame and the
    id order matches the SQL oracle exactly. The significant-edge
    relation is shared with pagerank_part_graph through scoped_persist,
    so back-to-back graph queries reuse one materialization. The edge
    count rides along as a second 1-row aggregate cross-joined into the
    result — no driver-side action anywhere."""
    pairs = significant_pairs(spark, sf_dir)
    oriented = pairs.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    e3 = oriented.alias("e3")
    wedges = e1.join(e2, F.col("e2.a") == F.col("e1.b"))
    closed = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    )
    triangles = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    edge_count = oriented.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return triangles.crossJoin(edge_count)


#: Multi-source BFS: seed set = nodes whose part key is divisible by
#: SEED_MOD (deterministic, scales with the graph), expanded for a fixed
#: number of rounds (unrolled identically in the SQL oracle).
BFS_ROUNDS = 4
SEED_MOD = 50


def _bfs_oracle() -> str:
    steps = [
        f"""l0 AS (
          SELECT node,
                 CASE WHEN node % {SEED_MOD} = 0
                      THEN CAST(0 AS BIGINT) END AS level
          FROM nodes
        )"""
    ]
    for k in range(BFS_ROUNDS):
        steps.append(f"""l{k + 1} AS MATERIALIZED (
          SELECT n.node, least(n.level, m.cand) AS level
          FROM l{k} n LEFT JOIN (
            SELECT p.dst AS node, MIN(l.level) + 1 AS cand
            FROM pairs p JOIN l{k} l
              ON l.node = p.src AND l.level IS NOT NULL
            GROUP BY p.dst
          ) m ON m.node = n.node
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM pairs
        ), {", ".join(steps)}
        SELECT node AS part_key, level AS bfs_level
        FROM l{BFS_ROUNDS} WHERE level IS NOT NULL
    """


@query("bfs_reach_part_graph", oracle=_bfs_oracle())
def bfs_reach_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS levels (hop distance to the nearest seed part)
    over the significant co-occurrence graph — the reachability /
    influence-radius primitive behind "related products within N hops".

    Same iterative discipline as pagerank_part_graph: the persisted edge
    relation is shared via scoped_persist, each of the K rounds joins the
    frontier against it and min-combines, and the per-round shuffle
    carries only (node, level) pairs — O(|nodes|) longs, never the edge
    list. Levels propagate monotonically (least() keeps the smallest
    non-NULL), so the K-round unrolling is exactly the oracle's chained
    CTEs and the result is engine-exact integer arithmetic throughout.
    Frontier-only joins (filtering to nodes whose level changed last
    round) are the standard refinement when K grows; at K=4 the full
    min-combine is one co-located join per round."""
    edges = partitioned_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    p_iter = edge_parallelism(spark, edges)
    levels = nodes.select(
        "node",
        F.when(F.col("node") % SEED_MOD == 0, F.lit(0))
        .cast("long")
        .alias("level"),
    )
    for _ in range(BFS_ROUNDS):
        # levels feeds BOTH the frontier aggregate and the min-combine
        # join; without truncation each round would duplicate the whole
        # prior-round subplan (2^K copies by round K — measured 3.8 s at
        # sf0.1, 1.5 s with the per-round localCheckpoint). The frame is
        # (node, level) longs — O(|nodes|) — so materializing it per
        # round is the cheap side of that trade at any scale.
        levels = levels.coalesce(p_iter).localCheckpoint(eager=True)
        frontier = (
            edges.join(levels, edges["src"] == levels["node"])
            .where(F.col("level").isNotNull())
            .groupBy("dst")
            .agg((F.min("level") + F.lit(1)).alias("cand"))
        )
        levels = levels.join(
            frontier, levels["node"] == frontier["dst"], "left"
        ).select("node", F.least(F.col("level"), F.col("cand")).alias("level"))
    return levels.where(F.col("level").isNotNull()).select(
        F.col("node").alias("part_key"), F.col("level").alias("bfs_level")
    )


# --------------------------------------------------------------------------
# E100: label-propagation community detection
# --------------------------------------------------------------------------

#: Synchronous label-propagation rounds (unrolled identically in SQL).
LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    steps = [
        f"""lp0 AS (
          SELECT node, CAST(node AS BIGINT) AS label FROM nodes
        )"""
    ]
    for k in range(LPA_ROUNDS):
        steps.append(f"""votes{k} AS MATERIALIZED (
          SELECT e.dst AS node, l.label, COUNT(*) AS cnt
          FROM edges e JOIN lp{k} l ON e.src = l.node
          GROUP BY e.dst, l.label
        ), pick{k} AS MATERIALIZED (
          SELECT node, label,
                 row_number() OVER (
                   PARTITION BY node ORDER BY cnt DESC, label
                 ) AS rn
          FROM votes{k}
        ), lp{k + 1} AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(p.label, n.node) AS BIGINT) AS label
          FROM lp{k} n LEFT JOIN (SELECT node, label FROM pick{k}
                                  WHERE rn = 1) p
            ON n.node = p.node
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), edges AS MATERIALIZED (SELECT src, dst FROM pairs),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM pairs),
        {", ".join(steps)}
        SELECT label AS community, count(*) AS n_members
        FROM lp{LPA_ROUNDS} GROUP BY label
    """


@query("lpa_communities_part_graph", oracle=_lpa_oracle())
def lpa_communities_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E100: community detection by synchronous label propagation over
    the significant co-occurrence graph — LPA_ROUNDS rounds of "adopt
    the most common neighbor label", the near-linear-time community
    algorithm co-purchase graphs actually use. Completes the iterative
    graph pack (PageRank ranks, triangles cluster, BFS reaches, LPA
    partitions).

    Determinism is the hard part: classic LPA breaks vote ties randomly,
    which can never hash-match an oracle. Here ties break by (count
    DESC, label ASC) — a total order — and rounds are synchronous, so
    the fixed-point after K rounds is a pure function of the graph,
    unrolled identically in the SQL oracle. Isolated-in-round nodes
    (no incoming votes) keep their own id via the left join.

    Scale: same discipline as PageRank/BFS — the persisted,
    src-partitioned edge relation is shared via scoped_persist; each
    round shuffles (node, label) longs only, collapsed map-side to the
    per-node label vocabulary; labels localCheckpoint per round (the
    frame is referenced by both the vote join and the carry-through left
    join — the same 2^K lazy-plan hazard BFS hit). Output is
    |communities| rows."""
    edges = partitioned_edges(spark, sf_dir).select("src", "dst")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    p_iter = edge_parallelism(spark, edges)
    labels = nodes.select("node", F.col("node").cast("long").alias("label"))
    for _ in range(LPA_ROUNDS):
        labels = labels.coalesce(p_iter).localCheckpoint(eager=True)
        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("vnode"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("vnode").orderBy(
            F.desc("cnt"), F.asc("label")
        )
        picked = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vnode", F.col("label").alias("new_label"))
        )
        labels = labels.join(
            picked, labels["node"] == picked["vnode"], "left"
        ).select(
            "node",
            F.coalesce(F.col("new_label"), F.col("node").cast("long")).alias(
                "label"
            ),
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


# --------------------------------------------------------------------------
# E120: k-core decomposition (data-dependent fixpoint peel)
# --------------------------------------------------------------------------

K_CORE = 3  # minimum within-subgraph degree


@query("kcore_part_graph")  # rows-only: data-dependent fixpoint, no SQL oracle
def kcore_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E120: the K_CORE-core of the significant co-occurrence graph —
    the maximal subgraph in which EVERY node keeps degree ≥ k after all
    lower-degree nodes are (transitively) removed. Degree alone
    over-reports cohesion (a hub of one-off neighbors has high degree
    but no core); the k-core is the standard dense-region primitive
    under community/fraud mining (Seidman '83, Batagelj–Zaveršnik '03).

    Unlike the pack's fixed-K iterations (PageRank) this is a
    DATA-DEPENDENT fixpoint: peel all nodes with current degree < k,
    recompute degrees on the survivors, repeat until a round removes
    nothing. Iteration discipline matches the CC loop in dedup:
    per-round localCheckpoint truncates lineage (plans stay O(1) deep),
    the driver sees one count per round, and each round is two
    semi-joins against the persisted pre-partitioned edge relation plus
    one map-side-combinable degree count. Round count is the graph's
    degeneracy-peel depth — O(log n) for the co-occurrence shapes here,
    worst-case linear for a path (the honest caveat; production caps
    rounds and reports the cap, as capped_sessions does for sessions).

    The final answer is the unique maximal fixpoint — independent of
    peel order and partitioning — pinned in tests against a
    pure-Python reference peel and planted clique/star graphs.
    Rows-only by design: no ANSI-SQL fixpoint (aggregation over the
    recursive relation is not legal in WITH RECURSIVE)."""
    edges = partitioned_edges(spark, sf_dir).select("src", "dst")
    p_iter = edge_parallelism(spark, edges)
    alive = edges.select(F.col("src").alias("node")).distinct()
    alive = alive.coalesce(p_iter).localCheckpoint(eager=True)
    n_alive = alive.count()
    while n_alive > 0:
        deg = (
            edges.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        survivors = (
            deg.filter(F.col("deg") >= K_CORE)
            .select(F.col("src").alias("node"), "deg")
        )
        survivors = survivors.coalesce(p_iter).localCheckpoint(eager=True)
        n_next = survivors.count()
        if n_next == n_alive:
            return survivors.select("node", F.col("deg").alias("core_degree"))
        alive = survivors.select("node")
        n_alive = n_next
    return alive.select(
        "node", F.lit(None).cast("long").alias("core_degree")
    )


_KCORE_AUDIT_ORACLE = f"""
    WITH pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
    ), deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY src
    )
    SELECT CAST({K_CORE} AS INT) AS k,
           CAST((SELECT COUNT(*) FROM deg WHERE d >= {K_CORE}) AS BIGINT)
             AS n_deg_ge_k,
           TRUE AS min_degree_ok,
           TRUE AS degree_report_ok,
           TRUE AS maximal_ok,
           TRUE AS size_bound_ok
"""


@query("kcore_invariant_audit", oracle=_KCORE_AUDIT_ORACLE)
def kcore_invariant_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E120 companion: driver-visible, hash-checked INVARIANT contract
    for the (rows-only, data-dependent) k-core fixpoint — the same
    contract style as the ANN recall floors.  The peel can't be
    unrolled into a static CTE oracle (no a-priori round bound; the
    measured peel depth is already 9 at sf0.01), but the k-core's
    DEFINING properties are independently checkable from the edge
    relation plus the output:

      * min_degree_ok  — every output node has ≥ k neighbors INSIDE the
        output set (within-core degree recomputed from the edges, not
        read back from the loop);
      * degree_report_ok — the reported core_degree equals that
        recomputed within-core degree for every node;
      * maximal_ok     — no peeled node could re-enter: no node outside
        the core has ≥ k neighbors in it (one augment-and-recheck pass;
        any such node would extend the core, contradicting maximality);
      * size_bound_ok  — |core| ≤ #nodes with FULL-graph degree ≥ k
        (global degree only shrinks when restricted to the core), with
        that bound — n_deg_ge_k — recomputed exactly by the DuckDB
        oracle as the data-carrying column.

    The oracle pins every boolean TRUE, so a future break of the peel
    loop turns a driver-sampled hash red instead of only a pytest red.

    Scale: three aggregates over the scoped-persisted pre-partitioned
    edge relation (shared with the peel itself) — two semi/anti-join
    degree counts and one full-degree count, all map-side combinable;
    driver traffic is ONE 3-row collect (the three 1-row aggregates ride
    a tagged union, so the post-fixpoint driver pays one job instead of
    three — each was mostly scheduler floor; the semdedup flag-frame
    rule applied here)."""
    edges = partitioned_edges(spark, sf_dir).select("src", "dst")
    core = kcore_part_graph(spark, sf_dir).localCheckpoint(eager=True)
    core_nodes = core.select("node")
    in_core_deg = (
        edges.join(
            core_nodes.withColumnRenamed("node", "src"), "src", "left_semi"
        )
        .join(core_nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("rdeg"))
    )
    s_core = (
        core.join(in_core_deg, core["node"] == in_core_deg["src"], "left")
        .select(
            "core_degree", F.coalesce("rdeg", F.lit(0)).alias("rdeg")
        )
        .agg(
            F.count(F.lit(1)).alias("core_size"),
            F.bool_and(F.col("rdeg") >= K_CORE).alias("mdok"),
            F.bool_and(F.col("rdeg") == F.col("core_degree")).alias("rpok"),
        )
        .select(
            F.lit("core").alias("tag"),
            F.col("core_size").cast("long").alias("v"),
            "mdok",
            "rpok",
        )
    )
    s_max_into = (
        edges.join(
            core_nodes.withColumnRenamed("node", "dst"), "dst", "left_semi"
        )
        .join(core_nodes.withColumnRenamed("node", "src"), "src", "left_anti")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("cdeg"))
        .agg(F.max("cdeg").alias("v"))
        .select(
            F.lit("max_into").alias("tag"),
            F.col("v").cast("long"),
            F.lit(None).cast("boolean").alias("mdok"),
            F.lit(None).cast("boolean").alias("rpok"),
        )
    )
    s_deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") >= K_CORE)
        .agg(F.count(F.lit(1)).alias("v"))
        .select(
            F.lit("n_deg_ge_k").alias("tag"),
            F.col("v").cast("long").alias("v"),
            F.lit(None).cast("boolean").alias("mdok"),
            F.lit(None).cast("boolean").alias("rpok"),
        )
    )
    by_tag = {
        r["tag"]: r
        for r in s_core.unionByName(s_max_into).unionByName(s_deg).collect()
    }
    row = by_tag["core"]
    core_size = int(row["v"])
    # empty core -> NULL bool_and: both invariants are vacuously true
    min_degree_ok = bool(row["mdok"]) if row["mdok"] is not None else True
    degree_report_ok = bool(row["rpok"]) if row["rpok"] is not None else True
    max_into = by_tag["max_into"]["v"]
    maximal_ok = max_into is None or int(max_into) < K_CORE
    n_deg_ge_k = int(by_tag["n_deg_ge_k"]["v"])
    return spark.createDataFrame(
        [
            (
                int(K_CORE),
                int(n_deg_ge_k),
                min_degree_ok,
                degree_report_ok,
                bool(maximal_ok),
                bool(core_size <= n_deg_ge_k),
            )
        ],
        "k int, n_deg_ge_k long, min_degree_ok boolean, "
        "degree_report_ok boolean, maximal_ok boolean, "
        "size_bound_ok boolean",
    )


# --------------------------------------------------------------------------
# E129: link prediction — neighborhood Jaccard over distance-2 pairs
# --------------------------------------------------------------------------

LP_TOPK = 3


@query(
    "link_prediction_jaccard",
    oracle=f"""
        WITH e AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= 2
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        wedge AS (
          SELECT e1.src AS a, e2.dst AS b2, COUNT(*) AS common
          FROM e e1 JOIN e e2 ON e1.dst = e2.src AND e1.src < e2.dst
          GROUP BY 1, 2
        ),
        cand AS (
          SELECT w.a, w.b2, w.common
          FROM wedge w
          WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.src = w.a AND e.dst = w.b2
          )
        ),
        scored AS (
          SELECT c.a, c.b2, c.common,
                 CAST(c.common AS DOUBLE)
                   / (da.d + db.d - c.common) AS jaccard
          FROM cand c
          JOIN deg da ON da.src = c.a
          JOIN deg db ON db.src = c.b2
        )
        SELECT a AS node, b2 AS predicted, CAST(common AS BIGINT)
                 AS common_neighbors,
               jaccard, CAST(rk AS INTEGER) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY jaccard DESC, b2
          ) AS rk FROM scored
        ) WHERE rk <= {LP_TOPK}
    """,
)
def link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E129: link prediction (Liben-Nowell & Kleinberg '03) — for every
    node, the LP_TOPK non-adjacent nodes with the highest neighborhood
    Jaccard |N(a)∩N(b)| / |N(a)∪N(b)|: the "these parts are bought
    with the same things but never together" recommender signal, one
    level up from item-item CF (which scores DIRECT co-occurrence).

    Plan: candidate pairs come from a wedge join (edges ⋈ edges on the
    shared middle node — only distance-2 pairs ever materialize, never
    node²), common-neighbor counts from its groupBy, existing edges
    removed by an anti join, union size by inclusion–exclusion from the
    degree frame (no second neighborhood pass). Wedge cost is
    Σ_w deg(w)² over the SIGNIFICANT graph — the standard hub hazard,
    already bounded here by the MIN_COOCCUR edge cut (and at web scale
    by a hub-degree cap, as in every production who-to-follow
    pipeline). Integer counts + one divide ⇒ hash-gated; reuses the
    scoped-persisted edge relation."""
    pairs = significant_pairs(spark, sf_dir)  # directed both ways
    e1 = pairs.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = pairs.select(F.col("src").alias("w"), F.col("dst").alias("b2"))
    wedge = (
        e1.join(e2, "w")
        .filter(F.col("a") < F.col("b2"))
        .groupBy("a", "b2")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedge.join(
        pairs.select(F.col("src").alias("a"), F.col("dst").alias("b2")),
        ["a", "b2"],
        "left_anti",
    )
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    scored = (
        cand.join(deg.select(F.col("src").alias("a"),
                             F.col("d").alias("da")), "a")
        .join(deg.select(F.col("src").alias("b2"),
                         F.col("d").alias("db")), "b2")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("da") + F.col("db") - F.col("common")),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("jaccard"), F.asc("b2"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= LP_TOPK)
        .select(
            F.col("a").alias("node"),
            F.col("b2").alias("predicted"),
            F.col("common").alias("common_neighbors"),
            "jaccard",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# E133: HITS hubs & authorities over the bipartite purchase graph
# --------------------------------------------------------------------------

#: HITS iteration count (unrolled identically in the SQL oracle).
HITS_ITERS = 4
#: Score scale: max-normalized scores live in units of 1e-6. Chosen so the
#: worst per-node raw sum (SCALE x in-degree) times SCALE stays far inside
#: BIGINT even for a part bought by every customer at sf1; at true 100 TB
#: in-degrees (1e7+ buyers) the same chain runs with DECIMAL(38,0) sums —
#: the algebra is unchanged.
HITS_SCALE = 10**6


def _hits_oracle() -> str:
    steps = [
        f"h0 AS MATERIALIZED (SELECT cust, CAST({HITS_SCALE} AS BIGINT)"
        f" AS h FROM custs)"
    ]
    for k in range(HITS_ITERS):
        steps.append(f"""ar{k + 1} AS MATERIALIZED (
          SELECT e.part, CAST(SUM(h.h) AS BIGINT) AS a
          FROM edges e JOIN h{k} h ON h.cust = e.cust
          GROUP BY e.part
        )""")
        steps.append(f"""a{k + 1} AS MATERIALIZED (
          SELECT part, (a * {HITS_SCALE}) // m.mx AS a
          FROM ar{k + 1}, (SELECT MAX(a) AS mx FROM ar{k + 1}) m
        )""")
        steps.append(f"""hr{k + 1} AS MATERIALIZED (
          SELECT e.cust, CAST(SUM(a.a) AS BIGINT) AS h
          FROM edges e JOIN a{k + 1} a ON a.part = e.part
          GROUP BY e.cust
        )""")
        steps.append(f"""h{k + 1} AS MATERIALIZED (
          SELECT cust, (h * {HITS_SCALE}) // m.mx AS h
          FROM hr{k + 1}, (SELECT MAX(h) AS mx FROM hr{k + 1}) m
        )""")
    return f"""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), custs AS MATERIALIZED (SELECT DISTINCT cust FROM edges),
        {", ".join(steps)}
        SELECT 'part' AS node_type, part AS node_key, a AS score
        FROM a{HITS_ITERS}
        UNION ALL
        SELECT 'customer' AS node_type, cust AS node_key, h AS score
        FROM h{HITS_ITERS}
    """


@query("hits_purchase_graph", oracle=_hits_oracle())
def hits_purchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E133: HITS (Kleinberg JACM'99) over the bipartite customer->part
    purchase graph — customers are hubs ("whose baskets point at the good
    stuff"), parts are authorities ("what the good baskets point at").
    The co-occurrence graph the pagerank family uses is symmetric, which
    collapses HITS (hub == authority there); the bipartite purchase
    relation is the natural asymmetric graph where the two scores carry
    DIFFERENT information.

    K=4 alternating power-iteration steps: a <- A^T h, h <- A a, each
    followed by max-normalization via scaled-integer floor division —
    BIGINT sums are order-independent, so the fixed point prefix is
    bit-identical across partitionings and engines (the DuckDB oracle
    unrolls the same 4 steps as chained CTEs).

    Scale shape: the DISTINCT (cust, part) edge relation is paid once
    behind scoped_persist and pre-partitioned on BOTH join keys (one
    copy by cust, one by part); each iteration
    moves only the 2-long score frames (O(|custs|) / O(|parts|) rows —
    never O(|edges|), the per-part/per-cust sums collapse map-side), and
    each normalization broadcasts a single 1-row MAX. Lineage stays a
    linear K-stage pipeline — no exponential plan growth."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    p_iter = _iter_parallelism(spark)
    # TWO persisted copies of the DISTINCT (cust, part) edge relation,
    # hash-partitioned at the cluster's core count on each join key:
    # the a-step joins by cust, the h-step by part, so with both copies
    # pre-partitioned the per-round exchanges move ONLY the score
    # frames (shuffled to match the cached side's p_iter partitioning)
    # — the edge bytes never re-shuffle during iteration, under ANY
    # session's shuffle-partition default.  The second copy is derived
    # from the first (one extra shuffle paid once, at p_iter width).
    edges_by_cust = scoped_persist(
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
        .repartition(p_iter, "cust")
    )
    edges_by_part = scoped_persist(edges_by_cust.repartition(p_iter, "part"))
    h = (
        edges_by_cust.select("cust")
        .distinct()
        .select("cust", F.lit(HITS_SCALE).cast("long").alias("h"))
    )
    a = None
    for _ in range(HITS_ITERS):
        # ONE job per half-round (8 driver barriers per query, down
        # from 16): the score frame is marked for LAZY localCheckpoint
        # and the 1-row max aggregate is the action that materializes
        # it — the checkpoint happens as a side effect of the max job,
        # and the max comes back as a driver scalar folded into the
        # normalization as a LITERAL, which removes both the old
        # eager-checkpoint job and the BroadcastExchange that collected
        # the crossJoin'd agg(max). Checkpointing (not persist) stays
        # load-bearing: it truncates lineage so every round's plan is
        # O(1) deep — a persist()-based variant of this same fusion
        # re-measured SLOWER (4.5-6 s vs 3.1 s at sf0.1: columnar cache
        # build cost plus K-deep plans re-analyzed every job). On this
        # box the wall is unchanged (~3.1 s, the per-stage-wave floor ×
        # the oracle-pinned K — job count 16 vs 8 measures equal), but
        # on a real cluster each driver barrier is a network round
        # trip, so halving them is the at-scale win. The checkpointed
        # frames are 2 longs per node, coalesced to p_iter so the
        # round's task count never inherits the session's shuffle
        # default. (r10 note, still true of lazier cadences: skipping
        # the ar materialization re-derives it inside the hr job
        # (5.0 s vs 3.5 s at sf0.1), and a fully lazy K=4 unroll
        # explodes to tens of thousands of tasks because exchange reuse
        # does not survive the per-round normalization rewrite.)
        ar = (
            edges_by_cust.join(h, "cust")
            .groupBy("part")
            .agg(F.sum("h").alias("a"))
            .coalesce(p_iter)
            .localCheckpoint(eager=False)
        )
        mx_a = ar.agg(F.max("a")).collect()[0][0]
        mx_a = int(mx_a) if mx_a is not None else 1  # empty graph guard
        a = ar.select(
            "part", F.expr(f"(a * {HITS_SCALE}) div {mx_a}").alias("a")
        )
        hr = (
            edges_by_part.join(a, "part")
            .groupBy("cust")
            .agg(F.sum("a").alias("h"))
            .coalesce(p_iter)
            .localCheckpoint(eager=False)
        )
        mx_h = hr.agg(F.max("h")).collect()[0][0]
        mx_h = int(mx_h) if mx_h is not None else 1
        h = hr.select(
            "cust", F.expr(f"(h * {HITS_SCALE}) div {mx_h}").alias("h")
        )
    return a.select(
        F.lit("part").alias("node_type"),
        F.col("part").alias("node_key"),
        F.col("a").alias("score"),
    ).unionAll(
        h.select(
            F.lit("customer").alias("node_type"),
            F.col("cust").alias("node_key"),
            F.col("h").alias("score"),
        )
    )


# --------------------------------------------------------------------------
# E150: weighted single-source shortest paths (bounded min-plus relaxation)
# --------------------------------------------------------------------------

#: Relaxation rounds — distances are exact for every node whose shortest
#: path uses at most this many hops (Bellman-Ford truncation, the bounded
#: -iteration contract every distributed SSSP ships with).
_SSSP_ROUNDS = 6


def _sssp_oracle() -> str:
    steps = [
        """d0 AS (
          SELECT (SELECT src FROM deg
                  ORDER BY outdeg DESC, src LIMIT 1) AS node,
                 CAST(0 AS BIGINT) AS dist
        )"""
    ]
    for k in range(_SSSP_ROUNDS):
        steps.append(f"""d{k + 1} AS (
          SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{k}
            UNION ALL
            SELECT e.dst AS node, d.dist + e.cost AS dist
            FROM d{k} d JOIN edges e ON e.src = d.node
          ) GROUP BY node
        )""")
    return f"""
        WITH pairs AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst,
                 CAST(COUNT(*) AS BIGINT) AS n_coorders
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), deg AS MATERIALIZED (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
          FROM pairs GROUP BY src
        ), edges AS MATERIALIZED (
          SELECT src, dst, CAST(1 + 100 // n_coorders AS BIGINT) AS cost
          FROM pairs
        ), {", ".join(steps)}
        SELECT node AS part_key, dist
        FROM d{_SSSP_ROUNDS}
    """


@query("weighted_sssp_part_graph", oracle=_sssp_oracle())
def weighted_sssp_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E150: weighted single-source shortest paths over the significant
    part co-occurrence graph — edge cost 1 + 100//n_coorders (stronger
    affinity = cheaper hop, integer so relaxation is exact), source = the
    graph's highest-out-degree hub (ties -> smallest key; a degree-1
    fringe node would see almost nothing of a sparse graph), distances
    after K=6 Bellman-Ford relaxation rounds (exact for all <=6-hop
    shortest paths; the bounded truncation every distributed SSSP
    declares). Complements bfs_reach_part_graph (hop counts) with true
    weighted distances.

    Scale: reuses the graph pack's scoped-persisted edge relation
    (significant_pairs — back-to-back graph queries pay the basket
    self-join once); each round joins the CURRENT frontier frame
    (2 longs/node) against it and collapses map-side via min — per-round
    traffic is O(|reached nodes|), never O(|edges|)."""
    pairs = significant_pairs(spark, sf_dir)
    edges = pairs.select(
        "src",
        "dst",
        F.expr("CAST(1 + 100 div n_coorders AS BIGINT)").alias("cost"),
    )
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    hub = deg.orderBy(F.desc("outdeg"), F.asc("src")).limit(1)
    src0 = hub.select(
        F.col("src").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    dist = src0
    p_iter = edge_parallelism(spark, edges)
    for _ in range(_SSSP_ROUNDS):
        # dist feeds BOTH the relaxation join and the min-combine union;
        # truncate lineage per round (the BFS/LPA discipline) or each
        # round duplicates the whole prior subplan — 2^K copies by
        # round K (measured 18 s at sf0.1 without, ~1 s with). The frame
        # is (node, dist) longs — O(|reached|) — cheap to materialize.
        dist = dist.coalesce(p_iter).localCheckpoint(eager=True)
        relaxed = dist.join(edges, dist["node"] == edges["src"]).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col("cost")).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(F.col("node").alias("part_key"), "dist")


# --------------------------------------------------------------------------
# E152: personalized PageRank (restart mass pinned to one source node)
# --------------------------------------------------------------------------


def _ppr_oracle() -> str:
    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    steps = [
        f"""pr0 AS (
          SELECT node,
                 CASE WHEN node = (SELECT src FROM deg
                                   ORDER BY outdeg DESC, src LIMIT 1)
                      THEN CAST({RANK_SCALE} AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS rank
          FROM nodes
        )"""
    ]
    for k in range(PR_ITERS):
        steps.append(f"""pr{k + 1} AS MATERIALIZED (
          SELECT n.node,
                 CAST(CASE WHEN n.node = (SELECT src FROM deg
                                          ORDER BY outdeg DESC, src LIMIT 1)
                           THEN {base} ELSE 0 END
                      + COALESCE(SUM(
                          ({DAMP_NUM} * p.rank) // ({DAMP_DEN} * e.outdeg)
                        ), 0) AS BIGINT) AS rank
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN pr{k} p ON p.node = e.src
          GROUP BY n.node
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), deg AS MATERIALIZED (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
          FROM pairs GROUP BY src
        ), edges AS MATERIALIZED (
          SELECT p.src, p.dst, d.outdeg FROM pairs p JOIN deg d USING (src)
        ), nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM pairs
        ), {", ".join(steps)}
        SELECT node AS part_key, rank AS ppr
        FROM pr{PR_ITERS}
        WHERE rank > 0
    """


@query("ppr_part_graph", oracle=_ppr_oracle())
def ppr_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E152: PERSONALIZED PageRank — the restart distribution is a point
    mass on one source node (the graph's highest-out-degree hub, ties to
    the smallest key) instead of
    uniform, so rank measures proximity TO THAT NODE: the
    related-products / similar-item primitive (Pinterest Pixie, YouTube
    co-view PPR) rather than global importance. Same damping, scaled-int
    arithmetic, and K=5 power iterations as pagerank_part_graph; only
    nodes with nonzero mass are returned.

    Scale: identical loop shape to pagerank (shared src-partitioned edge
    materialization via scoped_persist); the rank frame starts at 1 row
    and grows with the source's reach, so early iterations move LESS data
    than global PageRank — at 100 TB the per-iteration shuffle stays
    O(|reached nodes|)."""
    edges = partitioned_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    # restart at the graph's highest-out-degree hub (ties -> smallest
    # key): a degree-1 fringe source sees almost nothing of a sparse
    # graph, a hub's neighborhood is the meaningful related-items set
    src0 = (
        edges.select("src", "outdeg")
        .distinct()
        .orderBy(F.desc("outdeg"), F.asc("src"))
        .limit(1)
        .select(F.col("src").alias("s"))
    )

    base = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = nodes.crossJoin(F.broadcast(src0)).select(
        "node",
        F.when(F.col("node") == F.col("s"), F.lit(RANK_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    for _ in range(PR_ITERS):
        contribs = edges.join(
            ranks, edges["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.expr(
                f"({DAMP_NUM} * rank) div ({DAMP_DEN} * outdeg)"
            ).alias("contrib"),
        )
        contrib_agg = contribs.groupBy("dst").agg(
            F.sum("contrib").alias("incoming")
        )
        ranks = (
            nodes.join(contrib_agg, nodes["node"] == contrib_agg["dst"], "left")
            .crossJoin(F.broadcast(src0))
            .select(
                "node",
                (
                    F.when(F.col("node") == F.col("s"), F.lit(base)).otherwise(
                        F.lit(0)
                    )
                    + F.coalesce(F.col("incoming"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
        )
    return ranks.where(F.col("rank") > 0).select(
        F.col("node").alias("part_key"), F.col("rank").alias("ppr")
    )


# --------------------------------------------------------------------------
# E167: per-source closeness centrality (bounded-radius, sampled sources)
# --------------------------------------------------------------------------


def _closeness_oracle() -> str:
    steps = [
        f"""c0 AS (
          SELECT node AS src, node, CAST(0 AS BIGINT) AS dist
          FROM nodes WHERE node % {SEED_MOD} = 0
        )"""
    ]
    for k in range(BFS_ROUNDS):
        steps.append(f"""c{k + 1} AS (
          SELECT src, node, MIN(dist) AS dist FROM (
            SELECT src, node, dist FROM c{k}
            UNION ALL
            SELECT c.src, p.dst AS node, c.dist + 1 AS dist
            FROM c{k} c JOIN pairs p ON p.src = c.node
          ) GROUP BY src, node
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM pairs
        ), {", ".join(steps)}, tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes
        )
        SELECT c.src AS part_key,
               CAST(COUNT(*) AS BIGINT) AS n_reached,
               CAST(SUM(c.dist) AS BIGINT) AS sum_dist,
               CASE WHEN SUM(c.dist) > 0 THEN
                 CAST((COUNT(*) - 1) * (COUNT(*) - 1) AS DOUBLE)
                   / (CAST(t.n_nodes - 1 AS DOUBLE) * SUM(c.dist))
               END AS closeness
        FROM c{BFS_ROUNDS} c CROSS JOIN tot t
        GROUP BY c.src, t.n_nodes
    """


@query("hub_closeness_centrality", oracle=_closeness_oracle())
def hub_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E167: Wasserman-Faust normalized closeness centrality for the
    sampled source set (part keys divisible by SEED_MOD — the same
    deterministic seeds as bfs_reach), within a BFS_ROUNDS-hop radius:
    C(s) = ((r-1)/(n-1)) * ((r-1)/Sigma dist), r = nodes reached —
    the "how central is this item" readout that completes the pack's
    centrality family (degree->PageRank->PPR->HITS->closeness). The
    bounded radius is the declared truncation contract (exact for
    everything within K hops), which is also what makes the state
    O(|seeds| x |reached|) instead of all-pairs.

    Exactness: per-(source, node) hop distances are exact integer
    min-plus; the centrality is ONE double division of exact integers,
    NULL for isolated sources.

    Scale: the frontier carries (src, node, dist) triples — per round
    one co-located join against the shared persisted edge relation and a
    map-side min-combine; per-round localCheckpoint keeps the
    double-referenced frame's plan O(1) deep (the E150 discipline)."""
    edges = partitioned_edges(spark, sf_dir).select("src", "dst")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    tot = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    p_iter = edge_parallelism(spark, edges)
    dist = nodes.where(F.col("node") % SEED_MOD == 0).select(
        F.col("node").alias("source"),
        "node",
        F.lit(0).cast("long").alias("dist"),
    )
    for _ in range(BFS_ROUNDS):
        dist = dist.coalesce(p_iter).localCheckpoint(eager=True)
        relaxed = dist.join(edges, dist["node"] == edges["src"]).select(
            "source",
            F.col("dst").alias("node"),
            (F.col("dist") + 1).alias("dist"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("source", "node")
            .agg(F.min("dist").alias("dist"))
        )
    per_src = dist.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("sum_dist"),
    )
    r1 = (F.col("n_reached") - 1).cast("double")
    return per_src.crossJoin(F.broadcast(tot)).select(
        F.col("source").alias("part_key"),
        "n_reached",
        "sum_dist",
        F.when(
            F.col("sum_dist") > 0,
            (r1 * r1)
            / ((F.col("n_nodes") - 1).cast("double") * F.col("sum_dist")),
        ).alias("closeness"),
    )


# --------------------------------------------------------------------------
# E174: degree assortativity of the co-occurrence graph
# --------------------------------------------------------------------------

_ASSORT_R = (
    "CAST(m * sxy - sx * sy AS DOUBLE)"
    " / NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE)"
    " * CAST(m * syy - sy * sy AS DOUBLE)), 0.0)"
)


@query(
    "degree_assortativity_part_graph",
    oracle=f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), deg AS MATERIALIZED (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
          FROM pairs GROUP BY src
        ), j AS (
          SELECT dx.deg AS x, dy.deg AS y
          FROM pairs p
          JOIN deg dx ON dx.src = p.src
          JOIN deg dy ON dy.src = p.dst
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 SUM(CAST(x AS HUGEINT)) AS sx,
                 SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM j
        )
        SELECT m AS n_edges_directed, {_ASSORT_R} AS assortativity
        FROM agg
    """,
)
def degree_assortativity_part_graph(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E174: degree assortativity coefficient of the significant
    co-occurrence graph — the Pearson correlation of endpoint degrees
    over the (symmetric) directed edge list (Newman, "Assortative mixing
    in networks", PRL 2002). One scalar that says whether hub parts
    co-order with other hubs (r>0, social-network shape) or with
    peripheral parts (r<0, the hub-and-spoke shape typical of
    catalog/co-purchase graphs) — the structural summary the pack's
    centrality family (degree → PageRank → HITS → closeness, E28/E150/
    E152/E167) doesn't answer.

    Exactness: degrees are exact integers off the shared thresholded
    edge relation; all five moments accumulate as decimal(38,0)/HUGEINT
    (degree products bounded by |V|² per edge); r is one shared-literal
    double chain, NULL for a degree-regular graph (zero variance).

    Scale: reuses the scoped-persisted significant_pairs relation (one
    basket-bounded self-join); the degree frame is |V| rows joined twice
    against the O(significant edges) list — both keyed hash joins; the
    moment pass is a single map-side-combinable aggregate to ONE row.
    By symmetry of the edge list sx==sy and sxx==syy, but both are
    computed rather than assumed so the formula stays the textbook one."""
    pairs = significant_pairs(spark, sf_dir)
    deg = pairs.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    dx = deg.select(F.col("src").alias("sk"), F.col("deg").alias("x"))
    dy = deg.select(F.col("src").alias("dk"), F.col("deg").alias("y"))
    e = pairs.select("src", "dst")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = (
        e.join(dx, e["src"] == dx["sk"])
        .join(dy, e["dst"] == dy["dk"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(dec("x")).alias("sx"),
            F.sum(dec("y")).alias("sy"),
            F.sum(dec("x") * F.col("y")).alias("sxy"),
            F.sum(dec("x") * F.col("x")).alias("sxx"),
            F.sum(dec("y") * F.col("y")).alias("syy"),
        )
    )
    return agg.select(
        F.col("m").alias("n_edges_directed"),
        F.expr(_ASSORT_R).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# E179: link prediction — resource-allocation index (the no-log Adamic-Adar)
# --------------------------------------------------------------------------

#: 1/deg quantizes to floor(RA_SCALE / deg) — an exact integer division
#: both engines share, so wedge contributions SUM exactly under any
#: partitioning (a double 1/deg accumulation would be order-dependent,
#: and Adamic-Adar's 1/log(deg) would hit libm).
RA_SCALE = 10**9


@query(
    "link_prediction_resource_alloc",
    oracle=f"""
        WITH e AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= {MIN_COOCCUR}
        ),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
        wedge AS (
          SELECT e1.src AS a, e2.dst AS b2,
                 CAST(SUM({RA_SCALE} // dm.d) AS BIGINT) AS ra_scaled,
                 CAST(COUNT(*) AS BIGINT) AS common
          FROM e e1
          JOIN e e2 ON e1.dst = e2.src AND e1.src < e2.dst
          JOIN deg dm ON dm.src = e1.dst
          GROUP BY 1, 2
        ),
        cand AS (
          SELECT w.a, w.b2, w.ra_scaled, w.common
          FROM wedge w
          WHERE NOT EXISTS (
            SELECT 1 FROM e WHERE e.src = w.a AND e.dst = w.b2
          )
        )
        SELECT a AS node, b2 AS predicted, common AS common_neighbors,
               ra_scaled, CAST(rk AS INTEGER) AS rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY ra_scaled DESC, b2
          ) AS rk FROM cand
        ) WHERE rk <= {LP_TOPK}
    """,
)
def link_prediction_resource_alloc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """E179: resource-allocation link prediction (Zhou/Lü/Zhang, EPJ B
    2009) — RA(a,b) = Σ_{z∈N(a)∩N(b)} 1/deg(z): E129's Jaccard treats
    every common neighbor equally, RA discounts promiscuous middles —
    sharing an ultra-hub says almost nothing, sharing a rare part says a
    lot. RA is the strongest of the classic local indices on
    co-purchase-shaped graphs and is the no-libm stand-in for
    Adamic-Adar (1/log deg): same hub discount, exact arithmetic.

    Exactness: each middle contributes the INTEGER floor(1e9/deg(z)) —
    one shared integer division — so per-pair sums are exact under any
    partitioning; ranking ties break on the exact integer then node id.
    Fully integer output: nothing to round, trivially hash-gated.

    Scale: identical wedge shape to E129/triangle count — distance-2
    pairs only, cost Σ_w deg(w)² over the thresholded graph, middle
    degrees joined BEFORE the wedge groupBy so the 1/deg weight rides
    the same shuffle; anti join removes existing edges; per-node top-k
    is a keyed WindowGroupLimit."""
    pairs = significant_pairs(spark, sf_dir)  # directed both ways
    deg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    e1 = pairs.select(F.col("src").alias("a"), F.col("dst").alias("w"))
    e2 = pairs.select(F.col("src").alias("w"), F.col("dst").alias("b2"))
    wedge = (
        e1.join(e2, "w")
        .filter(F.col("a") < F.col("b2"))
        .join(deg.select(F.col("src").alias("w"), "d"), "w")
        .groupBy("a", "b2")
        .agg(
            F.sum(F.expr(f"{RA_SCALE} div d")).cast("long").alias(
                "ra_scaled"
            ),
            F.count(F.lit(1)).cast("long").alias("common"),
        )
    )
    cand = wedge.join(
        pairs.select(F.col("src").alias("a"), F.col("dst").alias("b2")),
        ["a", "b2"],
        "left_anti",
    )
    w = Window.partitionBy("a").orderBy(F.desc("ra_scaled"), F.asc("b2"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= LP_TOPK)
        .select(
            F.col("a").alias("node"),
            F.col("b2").alias("predicted"),
            F.col("common").alias("common_neighbors"),
            "ra_scaled",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# E191: k-truss decomposition (triangle-support edge pruning)
# --------------------------------------------------------------------------

#: 4-truss: every surviving edge must sit in >= k-2 = 2 triangles among
#: surviving edges.
TRUSS_K = 4
#: Fixed prune rounds — the declared truncation that makes the oracle an
#: unrollable CTE chain (the BFS_ROUNDS convention); the fixture graphs
#: converge in <= 2.
TRUSS_ROUNDS = 3


def _truss_oracle() -> str:
    steps = [f"""e0 AS (
          SELECT src, dst FROM pairs WHERE src < dst
        )"""]
    for r in range(TRUSS_ROUNDS):
        steps.append(f"""a{r} AS (
          SELECT src, dst FROM e{r}
          UNION ALL SELECT dst, src FROM e{r}
        ), s{r} AS (
          SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS support
          FROM e{r} e
          JOIN a{r} x ON x.src = e.src
          JOIN a{r} y ON y.src = e.dst AND y.dst = x.dst
          GROUP BY e.src, e.dst
        ), e{r + 1} AS (
          SELECT src, dst, support FROM s{r}
          WHERE support >= {TRUSS_K - 2}
        )""")
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}
        ), {", ".join(steps)}
        SELECT src AS part_a, dst AS part_b, support
        FROM e{TRUSS_ROUNDS}
    """


@query("ktruss_part_graph", oracle=_truss_oracle())
def ktruss_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E191: 4-truss of the co-occurrence graph — iteratively delete
    every edge in fewer than k−2 triangles until (here: for a declared
    TRUSS_ROUNDS) the survivors form the truss (Cohen 2008). The truss
    is the EDGE-centric cohesion ladder rung between E29's triangle
    count (a census) and E125's k-core (vertex degrees can fake
    cohesion; triangles cannot) — the standard community-core extractor
    on co-purchase graphs.

    Per round: adjacency = survivors in both orientations; each edge's
    support = |N(a)∩N(b)| via two keyed joins (the E129 wedge shape
    restricted to existing edges — zero-support edges drop out of the
    join, which IS their prune); filter, localCheckpoint, repeat.
    Output = round-3 survivors with their round-3 support. All-integer
    ⇒ hash-gated against the unrolled-CTE oracle.

    Scale: per round two keyed equi-joins on the CURRENT edge set (
    monotonically shrinking) — cost Σ_w deg(w)² like the triangle
    census, on an ever-smaller graph; per-round localCheckpoint caps
    lineage exactly as the dedup Pregel loop does."""
    pairs = significant_pairs(spark, sf_dir)
    e = pairs.where(F.col("src") < F.col("dst")).select("src", "dst")
    for _ in range(TRUSS_ROUNDS):
        e = e.select("src", "dst").localCheckpoint(eager=True)
        adj = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        x = adj.select(F.col("src").alias("xa"), F.col("dst").alias("w"))
        y = adj.select(F.col("src").alias("yb"), F.col("dst").alias("w2"))
        sup = (
            e.join(x, e["src"] == x["xa"])
            .join(y, (e["dst"] == y["yb"]) & (x["w"] == y["w2"]))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )
        e = sup.where(F.col("support") >= TRUSS_K - 2)
    return e.select(
        F.col("src").alias("part_a"),
        F.col("dst").alias("part_b"),
        "support",
    )
