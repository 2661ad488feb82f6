"""Distributed connected components via min-label propagation — the
clustering step of a dedup pipeline (near-dup *pairs* → duplicate
*groups* → one canonical doc per group).

Each node starts labeled with itself; every iteration each node takes
the minimum label among itself and its neighbors; converged when no
label changes. Iteration count is the graph diameter (near-dup graphs
are shallow — dozens of iterations at most), and each iteration is one
join + one aggregate, all shuffles keyed on node id. The driver-side
loop only reads a single convergence scalar per iteration — the data
never leaves the cluster, which is what keeps this shape valid at
100 TB (this is the standard label-propagation construction, cf.
GraphFrames/Pregel-style iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (``node_col``, component) where component is the minimum
    node id reachable from the node (nodes absent from ``edges`` form
    singleton components).
    """
    # edges may sit on an expensive lineage (e.g. the whole near-dup
    # pair pipeline) — checkpoint the symmetrized edge list ONCE so the
    # per-iteration join re-reads materialized edges instead of
    # re-running the upstream pipeline every round
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(node_col).alias("a"), F.col(node_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("a", "b2"), sym.b == F.col("b2"))
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the did-anything-change flag ON the label rows: the
        # convergence probe is then a cheap aggregate over the freshly
        # checkpointed result, not another join against the old labels
        new_labels = (
            labels.join(neighbor_min, "a", "left")
            .select(
                "a",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label"))
                .cast("int")
                .alias("__chg"),
            )
        )
        # truncate lineage each round (iterative plans grow exponentially
        # otherwise) and check convergence with one scalar action
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(F.max("__chg")).first()[0]
        labels = new_labels.drop("__chg")
        if not changed:
            break

    return labels.select(F.col("a").alias(node_col), F.col("label").alias("component"))
