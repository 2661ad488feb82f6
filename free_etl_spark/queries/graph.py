"""Graph analytics expressed relationally (SURVEY.md §2B extension,
alongside the connected-components operator in
free_etl_spark/operators/components.py): iterative algorithms as
join+aggregate rounds over an edge relation — no GraphX/GraphFrames
dependency, so the same code runs on any Spark cluster.

The 100 TB shape is aggregate-then-iterate: the expensive part is
distilling the raw event log (the 100 TB side) into a weighted edge
relation — one window pass plus one groupBy shuffle; the rank
iterations then run over the aggregated edges, which are orders of
magnitude smaller but still a distributed DataFrame (node sets like
URLs or users don't fit a driver). Each iteration is one
broadcast-or-shuffle join + one groupBy — the standard Pregel-as-SQL
lowering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from free_etl_spark.registry import query
from free_etl_spark.tables import load_table

_D = 0.85  # damping factor


def transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted directed edges src→dst = consecutive event_type pairs
    per user (ordered by ts, event_id for a total order). Persisted
    per (session, corpus mtime) via the shared relation cache — the
    rank loop takes several actions over the same distilled edges."""
    from free_etl_spark.queries.dedup import _cached_relation

    def build() -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "event_type"
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        seq = ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        ).filter(F.col("dst").isNotNull())
        return seq.groupBy("src", "dst").agg(
            F.count(F.lit(1)).cast("double").alias("w")
        )

    return _cached_relation(
        spark, sf_dir, "graph_edges", build, src_table="events.parquet"
    )


def pagerank(edges: DataFrame, iterations: int) -> DataFrame:
    """Power-iteration PageRank over a weighted edge list.

    r_{i+1}(v) = (1-d)/N + d * Σ_u r_i(u) * w(u,v) / out(u), dangling
    mass redistributed uniformly (a node with no outgoing edges spreads
    its rank to every node). Pure DataFrame ops: each iteration is one
    join on src + one groupBy on dst; the rank relation stays
    distributed (node sets at corpus scale are URLs/users, not a
    driver-side list).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # scalar: one number on the driver, by design
    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized transition weight per edge, reused every iteration
    norm = edges.join(outw, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    # the dangling-node SET is static (nodes with no outgoing edges);
    # only its rank mass changes per iteration
    dangling_nodes = nodes.join(outw, nodes.node == outw.src, "left_anti")
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for i in range(iterations):
        contrib = (
            norm.join(ranks, norm.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("r")).alias("inflow"))
        )
        # dangling mass leaks — fold it back in as a one-row broadcast
        # (stays inside the plan: no per-iteration driver action)
        dangling = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - _D) / n)
                    + F.lit(_D)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / n
                    )
                ).alias("r"),
            )
        )
        # each iteration references the previous ranks plan TWICE
        # (contrib + dangling), so a fully lazy chain doubles the
        # embedded plan per round (~2^iterations analysis cost).
        # Fine for the registered 2-iteration query; for deeper runs,
        # truncate the lineage each round — the materialized relation
        # is node-set-sized, the cheapest thing in the job.
        if iterations > 3 and i < iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


@query(
    "graph_pagerank_2iter",
    oracle="""
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    edges AS (
      SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION
      SELECT DISTINCT dst FROM edges
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    norm AS (
      SELECT e.src, e.dst, e.w / o.outw AS p
      FROM edges e
      JOIN (SELECT src, SUM(w) AS outw FROM edges GROUP BY src) o
        ON o.src = e.src
    ),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
    d0 AS (
      SELECT COALESCE(SUM(r), 0.0) AS mass FROM r0
      WHERE node NOT IN (SELECT src FROM edges)
    ),
    r1 AS (
      SELECT nodes.node,
             (1.0 - 0.85) / nn.n
             + 0.85 * (COALESCE(fl.inflow, 0.0) + d0.mass / nn.n) AS r
      FROM nodes CROSS JOIN nn CROSS JOIN d0
      LEFT JOIN (
        SELECT norm.dst, SUM(norm.p * r0.r) AS inflow
        FROM norm JOIN r0 ON r0.node = norm.src
        GROUP BY norm.dst
      ) fl ON fl.dst = nodes.node
    ),
    d1 AS (
      SELECT COALESCE(SUM(r), 0.0) AS mass FROM r1
      WHERE node NOT IN (SELECT src FROM edges)
    ),
    r2 AS (
      SELECT nodes.node,
             (1.0 - 0.85) / nn.n
             + 0.85 * (COALESCE(fl.inflow, 0.0) + d1.mass / nn.n) AS r
      FROM nodes CROSS JOIN nn CROSS JOIN d1
      LEFT JOIN (
        SELECT norm.dst, SUM(norm.p * r1.r) AS inflow
        FROM norm JOIN r1 ON r1.node = norm.src
        GROUP BY norm.dst
      ) fl ON fl.dst = nodes.node
    )
    SELECT node AS event_type, ROUND(r, 6) AS pagerank FROM r2
    """,
)
def graph_pagerank_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power iterations of PageRank over the event-type transition
    graph distilled from the events log. The distillation (window +
    groupBy over the full log) is the at-scale cost; the iterations
    are broadcast joins over the aggregated edge relation. The oracle
    replays both iterations as SQL CTEs."""
    edges = transition_edges(spark, sf_dir)
    ranks = pagerank(edges, iterations=2)
    return ranks.select(
        F.col("node").alias("event_type"), F.round("r", 6).alias("pagerank")
    )


@query(
    "graph_reachability_rcte",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    edges AS (
      SELECT DISTINCT src, dst FROM seq
      WHERE dst IS NOT NULL AND dst <> src
    ),
    start AS (SELECT MIN(src) AS node FROM edges),
    reach(node, depth) AS (
      SELECT node, 0 FROM start
      UNION ALL
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.depth < 3
    )
    SELECT node AS event_type,
           CAST(MIN(depth) AS INT) AS min_depth,
           CAST(COUNT(*) AS BIGINT) AS n_walks
    FROM reach GROUP BY node
    """,
)
def graph_reachability_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth reachability over the event-type transition graph
    via WITH RECURSIVE (in-engine recursion, new in Spark 4) — shortest
    hop distance and bounded-walk counts from the lexicographically
    first source node. The recursion runs over the distilled distinct
    edge relation; the events scan (the 100 TB side) happens once in
    the seed CTE. The identical recursive SQL runs on DuckDB as the
    oracle. Complements the DataFrame-loop PageRank above: same
    aggregate-then-iterate shape, but the iteration is expressed in
    SQL and executed by the engine's recursion operator.

    The edge distillation is materialized BEFORE the recursion (the
    persisted transition_edges relation, registered as a view) — left
    inline as a CTE, the engine re-evaluates the full-log window scan
    on every recursion step, which the 10x scale probe measured at
    ~4x the query's whole runtime. Distill-once-then-recurse is the
    scale-correct shape for any recursive query whose step joins a
    derived relation."""
    edges = transition_edges(spark, sf_dir).filter(
        F.col("dst") != F.col("src")
    )
    edges.select("src", "dst").createOrReplaceTempView("rcte_edges_in")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT src, dst FROM rcte_edges_in
        ),
        start AS (SELECT MIN(src) AS node FROM edges),
        reach(node, depth) AS (
          SELECT node, 0 FROM start
          UNION ALL
          SELECT e.dst, r.depth + 1
          FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.depth < 3
        )
        SELECT node AS event_type,
               CAST(MIN(depth) AS INT) AS min_depth,
               CAST(COUNT(*) AS BIGINT) AS n_walks
        FROM reach GROUP BY node
        """
    )
