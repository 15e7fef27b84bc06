"""Connected components — canonicalization of coreferent surface forms.

The reference's paraphrase graph is an undirected phrase-equivalence
graph (/root/reference/ppdb.py:36-76, bidirectional insert at
ppdb.py:72-73); generalized here to the KG canonicalization step the
north rule requires. Implemented as iterative min-label propagation over
an edge DataFrame — pure DataFrame joins so Catalyst/AQE handle skew and
partitioning; ``localCheckpoint`` truncates the growing lineage per
round. Converges in O(log(diameter)) rounds with the large-star-ish
label doubling below; our alias graphs have tiny diameter (≤3).
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
    """(src, dst) undirected edges → (node, component) with
    component = min node id (string-ordered) in the component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # neighbor minimum: min over own label and all neighbors' labels
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                F.col("component").alias("old"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("component") != F.col("old")).limit(1).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
        # pointer-doubling: re-point each label at its label's label,
        # collapsing chains in O(log n) rounds
        labels = (
            labels.alias("l")
            .join(
                labels.select(
                    F.col("node").alias("component"),
                    F.col("component").alias("parent"),
                ).alias("p"),
                on="component",
                how="left",
            )
            .select("node", F.coalesce("parent", "component").alias("component"))
        ).localCheckpoint()
    return labels
