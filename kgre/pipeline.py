"""End-to-end KG-construction pipeline: pages -> scored triples.

Physical plan (SURVEY.md §4.3):

  scan pages (lang filter pushed to scan, html pruned into extract only)
   -> [optional repartition(url-hash)] even work units before Python
   -> mapInPandas: extract html->text + sentence split/parse + candidate
      features  (ONE fused Arrow stage — a single JVM->Python crossing for
      the whole per-row path; parse.py / candidates.py remain separately
      composable + tested)
   -> checkpoint: candidates parquet (the reference's TFRecord boundary,
      S10) — consumed twice (vocab agg + scoring) without recompute
   -> groupBy vocab counts (single shuffle, map-side partial agg)
   -> mapInPandas score over broadcast {weights, vocab, KB} -> triples
   -> triples sink partitioned by rel
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgre import kb as kbmod
from kgre import nlp
from kgre.candidates import (CANDIDATES_SCHEMA, rows_to_pdf,
                             sentence_candidates)
from kgre.extract import extract_text_from_html
from kgre.score import score_candidates
from kgre.util import ensure_min_partitions
from kgre.vocab import build_vocab, collect_vocab_sets


def pages_to_candidates(pages: DataFrame, entity_a: str, entity_b: str,
                        stop_ids, lang: str = "en",
                        min_partitions: int | None = None,
                        allow1=None, allow2=None) -> DataFrame:
    """Fused extract+parse+candidate stage (1 Python crossing).

    ``min_partitions``: the Python stage is the expensive one, so its
    parallelism must never be capped by the input file layout (a small
    parquet arrives as 1 split; at 100 TB the scan already yields thousands
    of splits and the repartition is skipped). Defaults to 2x the session's
    defaultParallelism; the shuffle moves only (url, html) once, after the
    lang filter.

    ``allow1``/``allow2``: optional entity-id allowlists (S5/F3,
    load_data.py:436-453, :553-567) applied inside the fused stage —
    broadcast-sized sets shipped in the closure, a map-side semi+anti join.
    """
    stop = frozenset(stop_ids)
    a1 = frozenset(allow1) if allow1 is not None else None
    a2 = frozenset(allow2) if allow2 is not None else None

    def run(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text_from_html(html)
                for s in nlp.parse_text(text):
                    rows.extend(
                        sentence_candidates(
                            url, s["sent_id"], s["tokens"], s["deps"],
                            entity_a, entity_b, stop, a1, a2,
                            sent_text=s["sent_text"],
                        )
                    )
            yield rows_to_pdf(rows)

    # lang filter first => predicate pushdown to the scan; only url+html
    # survive into the Python stage (column pruning keeps the blob out of
    # every later exchange)
    slim = pages.filter(F.col("lang") == lang).select("url", "html")
    slim = ensure_min_partitions(slim, cols=("url",), target=min_partitions)
    return slim.mapInPandas(run, schema=CANDIDATES_SCHEMA)


MENTIONS_SCHEMA = "url string, side string, entity_key string"


def pages_to_mentions(pages: DataFrame, entity_a: str, entity_b: str,
                      lang: str = "en",
                      min_partitions: int | None = None) -> DataFrame:
    """Fused extract+parse+mention stage for EVAL_DATA (S15/X5,
    load_data.py:828-871): one row per counted mention occurrence;
    ``entity_a``/``entity_b`` are EXACT NER keys here (the reference's
    dict-membership test), unlike the substring match of pair generation."""
    from kgre.candidates import sentence_mention_rows

    def run(batches):
        cols = ("url", "side", "entity_key")
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text_from_html(html)
                for s in nlp.parse_text(text):
                    rows.extend(sentence_mention_rows(url, s["tokens"],
                                                      entity_a, entity_b))
            if rows:
                yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object)
                                    for c in cols})

    slim = pages.filter(F.col("lang") == lang).select("url", "html")
    slim = ensure_min_partitions(slim, cols=("url",), target=min_partitions)
    return slim.mapInPandas(run, schema=MENTIONS_SCHEMA)


def sentences_to_mentions(sentences: DataFrame, entity_a: str,
                          entity_b: str) -> DataFrame:
    """EVAL_DATA mention rows from pre-parsed sentences (the CoreNLP-XML
    ingest path of ``pages_to_mentions`` — same ``sentence_mention_rows``
    core, no extract/parse stage)."""
    from kgre.candidates import sentence_mention_rows

    def run(batches):
        cols = ("url", "side", "entity_key")
        for pdf in batches:
            rows = []
            for url, toks in zip(pdf["url"], pdf["tokens"]):
                rows.extend(sentence_mention_rows(url, toks,
                                                  entity_a, entity_b))
            if rows:
                yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object)
                                    for c in cols})

    return sentences.select("url", "tokens").mapInPandas(
        run, schema=MENTIONS_SCHEMA)


class KgPipeline:
    """Orchestrates the flagship job. KB/ontology/stop inputs are
    dictionary-sized DataFrames; corpus inputs are arbitrarily large."""

    def __init__(self, spark: SparkSession, entity_a: str = "GENE",
                 entity_b: str = "ONTOLOGY", occur_count: int = 5):
        self.spark = spark
        self.entity_a = entity_a
        self.entity_b = entity_b
        self.occur_count = occur_count

    def prepare_kb(self, kb_rows_list, onto_rows):
        # dictionary-sized inputs -> pure driver-side prep, zero Spark jobs
        # (kb.ontology_closure_df / expand_kb remain the declarative twins)
        closure = kbmod.ontology_closure_dict(onto_rows)
        fwd, rev = kbmod.load_kb_sets(kb_rows_list, closure)
        return fwd, rev, sorted(fwd)

    def run(self, pages: DataFrame, kb_rows_list, onto_rows, stop_ids,
            checkpoint_dir: str | None = None,
            repartition: int | None = None,
            allow1=None, allow2=None, with_sentence: bool = False,
            emit_threshold: float | None = None):
        """pages -> (scored triples DF, vocab DF, key_order).

        ``emit_threshold=0.5`` pushes the emitted-triple gate into the
        scoring UDF (TEST mode); leave None to keep every row (predict)."""
        if repartition:
            pages = pages.repartition(repartition, "url")
        cands = pages_to_candidates(pages, self.entity_a, self.entity_b,
                                    stop_ids, allow1=allow1, allow2=allow2)
        return self.run_from_candidates(
            cands, kb_rows_list, onto_rows, checkpoint_dir=checkpoint_dir,
            with_sentence=with_sentence, emit_threshold=emit_threshold)

    def run_from_candidates(self, cands: DataFrame, kb_rows_list, onto_rows,
                            checkpoint_dir: str | None = None,
                            with_sentence: bool = False,
                            emit_threshold: float | None = None):
        """candidates -> (scored triples DF, vocab DF, key_order) — the
        vocab + scoring tail of ``run``, exposed so pre-parsed corpora
        (CoreNLP XML via kgre.corenlp -> candidates_from_sentences) enter
        the same plan after the ingest stage."""
        fwd, rev, key_order = self.prepare_kb(kb_rows_list, onto_rows)
        if checkpoint_dir:
            # materialized stage boundary (reference: per-file TFRecord
            # shards, load_data.py:640-662) — vocab agg and scoring both
            # read the parquet, never recompute the Python stage
            cands.write.mode("overwrite").parquet(checkpoint_dir)
            cands = self.spark.read.parquet(checkpoint_dir)
        else:
            # cache is materialized by the (single-scan) vocab job and
            # reused by the scoring job
            cands = cands.persist()
        vocab_df = build_vocab(cands, self.occur_count)
        vocabs = collect_vocab_sets(vocab_df)
        scored = score_candidates(cands, vocabs, key_order, fwd, rev,
                                  with_sentence=with_sentence,
                                  emit_threshold=emit_threshold)
        return scored, vocab_df, key_order


def write_triples(scored: DataFrame, path: str) -> None:
    """S13 sink: partitioned by relation (the reference writes one TSV per
    relation key, relation_extraction.py:21-47)."""
    scored.write.mode("overwrite").partitionBy("rel").parquet(path)
