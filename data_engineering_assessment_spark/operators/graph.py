"""Iterative graph operators: connected components for dedup clustering.

Near-dup *pairs* (any dedup tier) become duplicate *clusters* by
connected components; the canonical document of a cluster is its
minimum id.  This is the one genuinely iterative algorithm in the
engine — expressed as a driver-controlled loop of joins + min-aggs
(label propagation), each iteration a bounded Spark job:

    label(v) ← min(label(v), min over neighbors u of label(u))

converges in O(component diameter) rounds.  Scale properties:

- state per round is one (node, label) table, hash-partitioned on
  node; each round is join(edges) + groupBy(min) — two shuffles over
  data proportional to |E| + |V|, never materializing paths;
- lineage is truncated with localCheckpoint every round, so plans
  stay O(1) deep regardless of iteration count (without it, round k
  re-plans k nested joins and the job DAG explodes);
- convergence check is a count of changed labels (a scalar action per
  round, not a collect of data).

Near-dup graphs have tiny diameters (duplicate cliques/chains), so
rounds ≈ 3-5 in practice; `max_iter` bounds the pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from the node."""
    # undirected: symmetrize once
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # min neighbor label per node, merged with own label
        nbr = (
            e.join(labels, e.v == labels.node)
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("new_label") < F.col("label")).count()
        labels = new_labels.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_cluster_assignments(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """Cluster near-dup pairs; canonical id = min doc in the cluster.
    Returns (doc_id, canonical_id, is_canonical)."""
    cc = connected_components(pairs, src=a_col, dst=b_col)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
