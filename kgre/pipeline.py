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
from kgre.candidates import (CANDIDATES_SCHEMA, SLIM_CANDIDATES_SCHEMA,
                             SLIM_COLS, rows_to_pdf, sentence_candidates)
from kgre.extract import extract_text_from_html
from kgre.score import score_candidates
from kgre.util import ensure_min_partitions
from kgre.vocab import collect_vocab_sets, two_phase_dense_ids, vocab_counts


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


def documents_to_candidates(docs: DataFrame, entity_a: str, entity_b: str,
                            stop_ids, lang: str = "en",
                            min_partitions: int | None = None,
                            allow1=None, allow2=None,
                            with_sentence: bool = True) -> DataFrame:
    """Fused documents -> candidates stage: ONE Python crossing for the
    synthetic-corpus path (guide §4: derive page text + sentence parse +
    candidate features in the same task, so neither the html blob nor the
    derived text ever crosses the Arrow boundary).

    Equivalent by construction to
    ``pages_to_candidates(pages_from_documents(docs, lang), ...)`` — the
    html render + re-extract between those stages is the identity on the
    derived text (``extract_text_from_html(HTML_TEMPLATE.format(text=t))
    == t`` unless ``t`` contains the article close tag, in which case
    this falls back to the render+extract round-trip); equality is
    pinned by tests/test_fused.py.  The REAL html ingest path
    (``pages_to_candidates`` over a pages table) is unchanged and still
    what production, the CLI, and the scaling bench run — this fusion
    only removes the render->unrender round-trip where the input is the
    driver's documents table.

    ``with_sentence=False`` additionally drops (sent_text, start_tok,
    end_tok) from the OUTPUT schema, so the widest column never crosses
    the Arrow boundary when the consumer is the TEST-mode scorer.
    """
    from kgre.extract import extract_text_from_html
    from kgre.webtext import doc_to_page, page_text

    stop = frozenset(stop_ids)
    a1 = frozenset(allow1) if allow1 is not None else None
    a2 = frozenset(allow2) if allow2 is not None else None
    cols = None if with_sentence else SLIM_COLS

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, dtext in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                url = "https://docs.example/d%d" % doc_id
                text = page_text(doc_id, dtext)
                if "</p></article>" in text:   # pragma: no cover
                    page = doc_to_page(doc_id, dtext, "")
                    text = extract_text_from_html(page["html"])
                for s in nlp.parse_text(text):
                    rows.extend(
                        sentence_candidates(
                            url, s["sent_id"], s["tokens"], s["deps"],
                            entity_a, entity_b, stop, a1, a2,
                            sent_text=s["sent_text"],
                        )
                    )
            yield rows_to_pdf(rows, cols=cols)

    slim = docs.select("doc_id", "text", "lang")
    if lang is not None:
        slim = slim.filter(F.col("lang") == lang)
    slim = slim.select("doc_id", "text")
    slim = ensure_min_partitions(slim, cols=("doc_id",),
                                 target=min_partitions)
    schema = CANDIDATES_SCHEMA if with_sentence else SLIM_CANDIDATES_SCHEMA
    return slim.mapInPandas(run, schema=schema)


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
            emit_threshold: float | None = None,
            need_vocab_ids: bool = True):
        """pages -> (scored triples DF, vocab DF, key_order).

        ``emit_threshold=0.5`` pushes the emitted-triple gate into the
        scoring UDF (TEST mode); leave None to keep every row (predict)."""
        if repartition:
            pages = pages.repartition(repartition, "url")
        cands = pages_to_candidates(pages, self.entity_a, self.entity_b,
                                    stop_ids, allow1=allow1, allow2=allow2)
        return self.run_from_candidates(
            cands, kb_rows_list, onto_rows, checkpoint_dir=checkpoint_dir,
            with_sentence=with_sentence, emit_threshold=emit_threshold,
            need_vocab_ids=need_vocab_ids)

    def run_from_candidates(self, cands: DataFrame, kb_rows_list, onto_rows,
                            checkpoint_dir: str | None = None,
                            with_sentence: bool = False,
                            emit_threshold: float | None = None,
                            need_vocab_ids: bool = True):
        """candidates -> (scored triples DF, vocab DF, key_order) — the
        vocab + scoring tail of ``run``, exposed so pre-parsed corpora
        (CoreNLP XML via kgre.corenlp -> candidates_from_sentences) enter
        the same plan after the ingest stage.

        ``need_vocab_ids=False`` (r6): scoring only needs the vocabulary
        feature SETS (weights are keyed by feature string, kgre/model.py)
        — the dense-id RANKING (two-phase rank: range shuffle + eager
        checkpoint + count job + window) is built only when the caller
        consumes the vocab table (CLI vocab sink, CV folds).  With False
        the returned vocab DF is the pruned (kind, feature, cnt) counts
        without ids, and the flagship scoring path runs two jobs instead
        of four."""
        fwd, rev, key_order = self.prepare_kb(kb_rows_list, onto_rows)
        if checkpoint_dir:
            # materialized stage boundary (reference: per-file TFRecord
            # shards, load_data.py:640-662) — vocab agg and scoring both
            # read the parquet, never recompute the Python stage
            cands.write.mode("overwrite").parquet(checkpoint_dir)
            cands = self.spark.read.parquet(checkpoint_dir)
        else:
            if not with_sentence and "sent_text" in cands.columns:
                # TEST mode over a full-schema candidates table: the S14
                # sentence columns (the widest ones) stay out of the
                # cached batches.  When the input is already the slim
                # fused stage there is nothing to drop — and adding an
                # identity projection here would break analyzed-plan
                # equality with other consumers of the same candidates
                # plan, losing the in-session cache match.
                cands = cands.select(*[c for c in SLIM_COLS
                                       if c in cands.columns])
            # cache is materialized by the (single-scan) vocab job and
            # reused by the scoring job
            cands = cands.persist()
        counts = vocab_counts(cands).filter(
            F.col("cnt") >= self.occur_count)
        if need_vocab_ids:
            vocab_df = two_phase_dense_ids(
                counts, ["kind"], [F.desc("cnt"), F.asc("feature")])
        else:
            vocab_df = counts
        # collect_vocab_sets only reads (kind, feature): with ids it
        # reads the two-phase checkpoint; without, the pruned counts
        vocabs = collect_vocab_sets(vocab_df)
        scored = score_candidates(cands, vocabs, key_order, fwd, rev,
                                  with_sentence=with_sentence,
                                  emit_threshold=emit_threshold)
        return scored, vocab_df, key_order


def write_triples(scored: DataFrame, path: str) -> None:
    """S13 sink: partitioned by relation (the reference writes one TSV per
    relation key, relation_extraction.py:21-47)."""
    scored.write.mode("overwrite").partitionBy("rel").parquet(path)
