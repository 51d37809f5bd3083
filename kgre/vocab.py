"""Vocabulary aggregation (A1, reference build_dataset load_data.py:106-131).

Count every feature occurrence corpus-wide, prune below ``occur_count``
(reference uses 100 for feed-forward vocabularies), and assign dense ids by
(count desc, feature asc) — a deterministic tie-break replacing Python
``Counter`` insertion order (SURVEY.md A1 note; acceptable because model
weights are keyed by feature *string*, never dense id, SURVEY.md §7.4.2).

Counts include BOTH forward and reverse instances regardless of
gene_to_gene (the reference always feeds both into the vocab lists,
load_data.py:201-208, even though only gene-gene reverse instances are
scored).

Plan shape: four projections of the candidates table union into one
groupBy — a single shuffle keyed by (kind, feature) with map-side partial
aggregation; the ranking window partitions by kind (3 tiny partitions
after the count filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _kf(kind, feature):
    return F.struct(F.lit(kind).alias("kind"), feature.alias("feature"))


def vocab_counts(candidates: DataFrame) -> DataFrame:
    """candidates -> (kind, feature, cnt); occurrence counts (duplicates
    within an instance count individually, mirroring Counter.update).

    Single scan of the candidates table: the four feature projections are
    concatenated row-locally into one exploded (kind, feature) stream —
    no 4-branch union (which would read the table four times and, on a
    freshly persisted upstream, race to recompute it 4x)."""
    kf = F.concat(
        F.array(_kf("dep_path", F.col("dep_path_string"))),
        F.transform("sdp_words", lambda x: _kf("dep_word", x)),
        F.transform("sdp_elements", lambda x: _kf("element", x)),
        F.transform("between_words", lambda x: _kf("between", x)),
    )
    return (
        candidates.select(F.explode(kf).alias("kf"))
        .select("kf.kind", "kf.feature")
        .groupBy("kind", "feature").agg(F.count("*").alias("cnt"))
    )


def build_vocab(candidates: DataFrame, occur_count: int) -> DataFrame:
    """(kind, feature, cnt, id) with min-count pruning and deterministic
    dense ids per kind."""
    counts = vocab_counts(candidates).filter(F.col("cnt") >= occur_count)
    w = Window.partitionBy("kind").orderBy(F.desc("cnt"), F.asc("feature"))
    return counts.withColumn("id", F.row_number().over(w) - 1)


def collect_vocab_sets(vocab: DataFrame) -> dict[str, set]:
    """vocab table -> {kind: set(feature)} for broadcast into the scorer.
    Arrow-path collect (toPandas) — row-at-a-time collect() costs seconds
    at 10^5 features."""
    out: dict[str, set] = {"dep_path": set(), "dep_word": set(),
                           "element": set(), "between": set()}
    pdf = vocab.select("kind", "feature").toPandas()
    for kind, grp in pdf.groupby("kind"):
        out[kind] = set(grp["feature"])
    return out
