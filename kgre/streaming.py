"""Incremental (Structured Streaming) ingest of the pages table.

The reference is a batch corpus pipeline with a file-existence resume
check (relation_extraction.py:393-399) — it has no streaming semantics
(SURVEY.md §2.12).  At Common-Crawl scale, however, new WARC drops arrive
continuously, so the engine exposes an incremental path:

  readStream(pages parquet dir)
    -> same fused extract/parse/candidates stage (pages_to_candidates is
       plan-compatible with streaming DataFrames: filter/select/mapInPandas
       only, no repartition on the streaming side)
    -> foreachBatch: distant-label + score each micro-batch against the
       broadcast KB and a FROZEN vocab (exactly the reference's TEST mode:
       dictionaries are loaded from the pickle of a prior training pass,
       relation_extraction.py:185-187, never updated online)
    -> IDEMPOTENT per-batch sink: each micro-batch overwrites its own
       out_dir/batch=<batch_id> partition, so a crash between the sink
       write and the streaming offset commit replays the batch into the
       same directory instead of appending a duplicate — end-to-end
       exactly-once (foreachBatch itself is only at-least-once; the
       batch_id-keyed overwrite is what upgrades it).

Checkpointing is Spark's streaming offset log layered on the same
lineage-manifest model used by the batch path (kgre/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgre import kb as kbmod
from kgre.candidates import CANDIDATES_SCHEMA
from kgre.score import emitted_triples, score_candidates
from kgre.synthgen import PAGES_SCHEMA


def read_page_stream(spark: SparkSession, pages_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a pages parquet directory (new files = new
    micro-batches; at production scale this is the Iceberg/warc drop
    directory)."""
    reader = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger or 4))
    return reader.parquet(pages_dir)


def batch_processor(out_dir: str, vocabs, key_order, fwd, rev):
    """foreachBatch body: score a candidates micro-batch and OVERWRITE its
    batch_id-keyed output partition.  Replaying the same batch_id (crash
    after sink write, before offset commit) rewrites identical content
    instead of appending duplicates — this is what makes the pipeline
    exactly-once end-to-end (tests call this directly to simulate a
    mid-batch replay)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = score_candidates(batch_df, vocabs, key_order, fwd, rev,
                                  emit_threshold=0.5)
        (emitted_triples(scored)
         .write.mode("overwrite").partitionBy("rel")
         .parquet(f"{out_dir}/batch={batch_id}"))

    return process_batch


def stream_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    kb_rows_list,
    onto_rows,
    stop_ids,
    vocabs: dict[str, set],
    entity_a: str = "GENE",
    entity_b: str = "ONTOLOGY",
    available_now: bool = True,
):
    """Start the incremental pages->triples job; returns the StreamingQuery.

    ``vocabs`` is the frozen vocabulary of a prior batch ``build`` run
    (mode_build in kgre/cli.py) — scoring state is broadcast once, never
    mutated by the stream."""
    from kgre.pipeline import pages_to_candidates

    closure = kbmod.ontology_closure_dict(onto_rows)
    fwd, rev = kbmod.load_kb_sets(kb_rows_list, closure)
    key_order = sorted(fwd)

    stream = read_page_stream(spark, pages_dir)
    cands = pages_to_candidates(stream, entity_a, entity_b, stop_ids,
                                min_partitions=0)
    process_batch = batch_processor(out_dir, vocabs, key_order, fwd, rev)
    writer = (cands.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        # drain everything currently in the directory, then stop — the
        # batch-equivalent trigger used by tests and backfills
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["read_page_stream", "stream_triples", "CANDIDATES_SCHEMA"]
