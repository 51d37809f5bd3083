"""Connected-components canonicalization (north-star extension: GraphFrames-
style label propagation before materializing triples; no reference
counterpart, SURVEY.md §7.4).

Algorithm: iterative min-label propagation to fixpoint —
    label(v) <- min(label(v), min over neighbors u of label(u))
expressed as DataFrame joins/aggregations, driver loop with
``localCheckpoint`` every iteration to cut lineage (SURVEY.md §7.4.4).

Skew (north_rule: "salted repartitioning for skewed hot entities"): a hub
node with millions of edges makes ``groupBy(node)`` a hot key.  The
aggregation is min(), so it runs in TWO phases: groupBy((node, salt)) for
the partial min, then groupBy(node) over <=n_salts rows per node — the
classic salted two-phase reduction.  (AQE also splits skewed joins at
runtime; salting covers the aggregation side.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iters: int = 50,
                         n_salts: int = 8) -> DataFrame:
    """edges(src string, dst string) -> (node string, component string)
    where component = lexicographic min node id in the component."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr_label = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), F.col("component"))
        # salted two-phase min: partial min per (node, salt), then final
        salted = nbr_label.withColumn(
            "salt", F.pmod(F.xxhash64("component"), F.lit(n_salts))
        )
        partial = salted.groupBy("node", "salt").agg(
            F.min("component").alias("component")
        )
        nbr_min = partial.groupBy("node").agg(
            F.min("component").alias("nbr_component")
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonicalize_triples(triples: DataFrame, same_as: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the component map built from SAME_AS-style
    equivalence edges; entities outside any component map to themselves."""
    comp = connected_components(same_as)
    c1 = comp.withColumnRenamed("node", "subj").withColumnRenamed(
        "component", "subj_canon")
    c2 = comp.withColumnRenamed("node", "obj").withColumnRenamed(
        "component", "obj_canon")
    return (
        triples.join(F.broadcast(c1), "subj", "left")
        .join(F.broadcast(c2), "obj", "left")
        .withColumn("subj_canon", F.coalesce("subj_canon", "subj"))
        .withColumn("obj_canon", F.coalesce("obj_canon", "obj"))
    )
