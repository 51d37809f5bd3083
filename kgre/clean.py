"""Clean-corpus composition (engine extension; no reference
counterpart): exact dedup -> near-dup collapse -> quality/language
filters, the standard hygiene pass a training-data pipeline runs before
KG construction.

Every stage is an individually-tested operator (kgre.dedup /
kgre.canon / kgre.textstats); this module is the documented composition
so the CLI mode (kgre/cli.py clean) and the oracle-checked driver query
(q_clean_corpus) share one implementation.

Scale shape: one md5-keyed shuffle for the exact collapse; LSH banding
over the exact survivors with the r4 hot-bucket guards; connected
components over the (tiny relative to corpus) near-dup pair graph with
salted min-aggregation; pure-Catalyst quality/language expressions.
Nothing corpus-sized is ever collected.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgre import dedup, textstats
from kgre.canon import connected_components


def clean_documents(docs: DataFrame, neardup_threshold: float = 0.6,
                    min_quality: float = 0.1,
                    lang_threshold: float = 0.08,
                    manifest: list | None = None) -> DataFrame:
    """documents -> surviving documents (same schema).

    1. exact dedup — keep the min doc_id per identical raw text;
    2. near-dup collapse — MinHash-LSH pairs over the survivors,
       connected components over the pair graph (zero-padded string ids
       so the CC lexicographic min == numeric min), keep each
       component's min doc_id;
    3. quality + language — composite stopword/vowel score >=
       ``min_quality`` AND stopword-density language-ID == 'en' at
       ``lang_threshold``.

    ``manifest``: optional list receiving one
    ``(stage, rows_in, rows_out, wall_ms)`` tuple per stage (forces a
    count per stage; leave None to keep the plan fully lazy apart from
    the CC iteration)."""

    def note(stage, rows_in, rows_out, t0):
        if manifest is not None:
            manifest.append((stage, rows_in, rows_out,
                             int((time.time() - t0) * 1000)))

    n0 = docs.count() if manifest is not None else None
    t0 = time.time()
    # lazy localCheckpoint, not persist: reps is consumed twice (pair
    # graph + anti-join) but must leave nothing in the CacheManager —
    # a bench re-run of the same plan would warn "already cached" and
    # the entry would outlive the call (same reasoning as
    # vocab.two_phase_dense_ids, ADVICE r3); checkpoint blocks free on GC
    reps = dedup.collapse_exact_docs(docs).localCheckpoint(eager=False)
    n1 = reps.count() if manifest is not None else None
    note("exact_dedup", n0, n1, t0)

    t0 = time.time()
    pairs = dedup.minhash_near_dups(reps, threshold=neardup_threshold,
                                    collapse_exact=False)

    def pad(c):
        return F.lpad(F.col(c).cast("string"), 12, "0")

    comp = connected_components(
        pairs.select(pad("d1").alias("src"), pad("d2").alias("dst")))
    drop = (comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").cast("bigint").alias("doc_id")))
    deduped = reps.join(drop, "doc_id", "left_anti")
    n2 = deduped.count() if manifest is not None else None
    note("near_dedup", n1, n2, t0)

    t0 = time.time()
    clean = (
        deduped
        .join(textstats.quality_score(deduped).select("doc_id", "quality"),
              "doc_id")
        .join(textstats.lang_id(deduped, threshold=lang_threshold)
              .select("doc_id", "lang_pred"), "doc_id")
        .filter((F.col("quality") >= min_quality)
                & (F.col("lang_pred") == "en"))
        .drop("quality", "lang_pred"))
    if manifest is not None:
        n3 = clean.count()
        note("quality_lang", n2, n3, t0)
    return clean
