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
        # joined EVERY round: without this the whole upstream lineage
        # (e.g. the tagging/linking UDF chain feeding the edges) re-runs
        # per iteration — measured 3x on the canonicalization tail
    ).localCheckpoint()
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al. 2014) — the
    web-graph-scale path.

    Same (node, component=min id) contract as
    :func:`connected_components` (differential-tested equal), different
    scaling shape: each round is one groupBy-min + re-emit, edges
    monotonically re-point toward component minima, and the FIXED POINT
    is already the answer (the edge set becomes the star node→min).
    Label propagation needs O(diameter) rounds — fine for alias graphs
    (diameter ≤ 3), hopeless on web-graph chains; the star rounds
    converge in O(log²) regardless of diameter. Convergence is detected
    by an (edge count, xxhash64 checksum) fingerprint of the canonical
    undirected edge set — no expensive set-difference per round.
    ``checkpoint_dir`` switches lineage truncation to reliable storage
    checkpoints (what a 100-round web-graph job needs); ``None`` uses
    localCheckpoint.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None \
            else df.localCheckpoint()

    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    # checkpoint FIRST, derive all_nodes from the checkpointed set — the
    # upstream lineage (possibly a whole UDF pipeline) runs exactly once.
    # all_nodes keeps self-loop-only nodes (u == v rows) so the output
    # contract matches connected_components, which emits (node, node)
    # for them; only the star iteration drops self-loops.
    base = _ckpt(und)
    all_nodes = (
        base.select(F.col("u").alias("node"))
        .union(base.select("v")).distinct()
    ).localCheckpoint()
    cur = base.filter(F.col("u") != F.col("v"))

    def _large_star(pairs: DataFrame) -> DataFrame:
        # per node u over the FULL neighborhood: m = min(Γ(u) ∪ {u});
        # every strictly-larger neighbor re-points at m
        sym = pairs.select("u", "v").union(
            pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        return (
            sym.join(mins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(pairs: DataFrame) -> DataFrame:
        # direct edges larger→smaller; per node u over its SMALLER
        # neighborhood: m = min; u itself AND every other smaller
        # neighbor re-point at m (the u→m self-emit is what keeps local
        # maxima in the edge set)
        d = pairs.select(F.greatest("u", "v").alias("u"),
                         F.least("u", "v").alias("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))
        nbr = (d.join(mins, on="u")
               .filter(F.col("v") != F.col("m"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))
        self_ = mins.select("u", F.col("m").alias("v"))
        return nbr.union(self_).filter(F.col("u") != F.col("v")).distinct()

    def _fingerprint(pairs: DataFrame) -> tuple:
        row = (
            pairs.select(F.least("u", "v").alias("a"),
                         F.greatest("u", "v").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"),
                 # decimal(38,0) sum: ANSI mode overflows a long sum of
                 # 64-bit hashes
                 F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"))
            .first()
        )
        return (row["n"], row["h"])

    fp = _fingerprint(cur)
    for _ in range(max_iter):
        cur = _ckpt(_small_star(_large_star(cur)))
        new_fp = _fingerprint(cur)
        if new_fp == fp:
            break
        fp = new_fp
    # fixed point: every edge is (node, component-min); roots and
    # isolated-in-star nodes label themselves. The min-aggregate keeps
    # the one-row-per-node contract even if max_iter exhausted before
    # the star fixed point (labels then merely unconverged, like
    # label propagation's, never duplicated/conflicting).
    child = (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .groupBy("node").agg(F.min("component").alias("component"))
    )
    roots = (
        all_nodes.join(child.select("node"), on="node", how="left_anti")
        .withColumn("component", F.col("node"))
    )
    return child.unionByName(roots)
