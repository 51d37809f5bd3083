"""spark-submit entry point mirroring the reference CLI's mode dispatch
(reference ``relation_extraction.py:430-565`` — TRAIN_* / TEST / PREDICT /
EVAL_DATA via ``sys.argv[1]``).

Usage (north_rule: "run via spark-submit --py-files"):

    zip -r kgre.zip kgre
    spark-submit --py-files kgre.zip -m kgre.cli <mode> [options]
    # or: spark-submit --py-files kgre.zip path/to/kgre/cli.py <mode> ...

Modes:
  build      corpus pass: pages -> candidates checkpoint + vocab table
             (reference TRAIN_FEED_FORWARD's two corpus passes collapsed to
             one materialized candidates table, relation_extraction.py:336-427)
  score      candidates/pages -> scored triples partitioned by rel
             (reference TEST, relation_extraction.py:508-537; sink S13 :21-47)
  predict    like score but keeps every pair (label=-1 semantics) and adds
             the ***entity*** highlighted sentence column
             (reference PREDICT, relation_extraction.py:539-562, S14)
  eval-data  entity distribution sinks (reference EVAL_DATA,
             relation_extraction.py:217-250, S15)

Input pages: --pages <parquet dir> with columns
(url, warc_ts, html, text, lang), or --synth N for the deterministic
generator corpus (no external data).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from kgre import kb as kbmod
from kgre import synthgen, webtext
from kgre.pipeline import KgPipeline, pages_to_candidates, write_triples
from kgre.score import emitted_triples
from kgre.session import get_spark
from kgre.vocab import build_vocab


def _load_pages(spark, args):
    if args.pages:
        # S2 directory-walk + F5 file-suffix predicate as scan options
        # (reference: os.walk + endswith('.txt'), load_data.py:457-475):
        # both evaluated at file listing, before any bytes are read
        reader = spark.read
        if args.pages_glob:
            reader = reader.option("pathGlobFilter", args.pages_glob)
        if args.recursive:
            reader = reader.option("recursiveFileLookup", "true")
        return reader.parquet(args.pages)
    if args.documents:
        return webtext.pages_from_documents(spark.read.parquet(args.documents))
    return synthgen.pages_df(spark, args.synth)


def _pipe(spark, args) -> KgPipeline:
    return KgPipeline(spark, entity_a=args.entity_a, entity_b=args.entity_b,
                      occur_count=args.occur_count)


def _allowlists(args):
    """S5 id-list scans (reference CLI passes optional entity-id TSVs,
    load_data.py:436-453); None disables the F3 filter for that side."""
    a1 = kbmod.load_id_list(args.allow1_file) if args.allow1_file else None
    a2 = kbmod.load_id_list(args.allow2_file) if args.allow2_file else None
    return a1, a2


def _load_candidates(spark, args, a1, a2):
    """Candidates frame from either ingest path: --corenlp-xml (S1-compat
    reader over the reference's real input format, load_data.py:352-396)
    or the pages path (html extract+parse fused stage)."""
    if args.corenlp_xml:
        from kgre.candidates import candidates_from_sentences
        from kgre.corenlp import read_corenlp_xml
        sents = read_corenlp_xml(spark, args.corenlp_xml,
                                 glob=args.pages_glob or "*.txt",
                                 recursive=args.recursive)
        return candidates_from_sentences(sents, args.entity_a,
                                         args.entity_b,
                                         synthgen.stop_entity_ids(),
                                         allow1=a1, allow2=a2)
    return pages_to_candidates(_load_pages(spark, args), args.entity_a,
                               args.entity_b, synthgen.stop_entity_ids(),
                               allow1=a1, allow2=a2)


def mode_build(spark, args):
    a1, a2 = _allowlists(args)
    cands = _load_candidates(spark, args, a1, a2)
    cands.write.mode("overwrite").parquet(args.out + "/candidates")
    cands = spark.read.parquet(args.out + "/candidates")
    build_vocab(cands, args.occur_count).write.mode("overwrite").parquet(
        args.out + "/vocab")
    print("BUILD ok: candidates=%d vocab=%d" % (
        cands.count(), spark.read.parquet(args.out + "/vocab").count()))


def mode_score(spark, args):
    pipe = _pipe(spark, args)
    a1, a2 = _allowlists(args)
    if args.corenlp_xml:
        if args.resume:
            raise SystemExit(
                "--resume buckets by page url; not supported with "
                "--corenlp-xml (run without --resume)")
        cands = _load_candidates(spark, args, a1, a2)
        scored, _, key_order = pipe.run_from_candidates(
            cands, synthgen.kb_rows(), synthgen.ontology_rows(),
            checkpoint_dir=(args.out + "/candidates") if args.checkpoint
            else None,
            emit_threshold=0.5)
        write_triples(emitted_triples(scored), args.out + "/triples")
        n = spark.read.parquet(args.out + "/triples").count()
        print("SCORE ok: emitted=%d rels=%d" % (n, len(key_order)))
        return
    pages = _load_pages(spark, args)
    if args.resume:
        # lineage-manifest resume (north_rule): the candidates stage runs
        # per url-hash bucket; a rerun recomputes ONLY buckets missing
        # from the manifest, then vocab/scoring read the materialized
        # stage output (the reference's skip-if-.tfrecord-exists,
        # relation_extraction.py:393-399, made per-partition + crash-safe)
        from kgre.lineage import run_stage_with_resume
        from kgre.score import score_candidates
        from kgre.vocab import build_vocab, collect_vocab_sets

        fwd, rev, key_order = pipe.prepare_kb(synthgen.kb_rows(),
                                              synthgen.ontology_rows())
        stop = synthgen.stop_entity_ids()
        cands = run_stage_with_resume(
            spark, pages, "candidates",
            lambda part: pages_to_candidates(part, args.entity_a,
                                             args.entity_b, stop,
                                             min_partitions=0,
                                             allow1=a1, allow2=a2),
            args.out + "/candidates", args.out + "/manifest",
            n_buckets=args.buckets)
        vocabs = collect_vocab_sets(build_vocab(cands, args.occur_count))
        scored = score_candidates(cands, vocabs, key_order, fwd, rev,
                                  emit_threshold=0.5)
    else:
        scored, vocab_df, key_order = pipe.run(
            pages, synthgen.kb_rows(), synthgen.ontology_rows(),
            synthgen.stop_entity_ids(),
            checkpoint_dir=(args.out + "/candidates") if args.checkpoint
            else None,
            allow1=a1, allow2=a2, emit_threshold=0.5)
    write_triples(emitted_triples(scored), args.out + "/triples")
    n = spark.read.parquet(args.out + "/triples").count()
    print("SCORE ok: emitted=%d rels=%d" % (n, len(key_order)))


def mode_predict(spark, args):
    from kgre.score import highlight_sentences

    pages = _load_pages(spark, args)
    pipe = _pipe(spark, args)
    a1, a2 = _allowlists(args)
    scored, _, _ = pipe.run(pages, synthgen.kb_rows(),
                            synthgen.ontology_rows(),
                            synthgen.stop_entity_ids(),
                            allow1=a1, allow2=a2, with_sentence=True)
    # rich sink S14: all pairs with probabilities, no 0.5 gate; label is
    # -1 in predict mode (build_instances_predict, load_data.py:336-338),
    # and each row carries the ***entity***-highlighted sentence in the
    # reference's TSV layout PMID/E1/E2/LABEL/PROB/SENTENCE
    # (relation_extraction.py:548-562)
    out = highlight_sentences(scored).withColumn("label", F.lit(-1))
    out = out.withColumn(
        "display",
        F.concat_ws("\t", "url", "subj", "obj",
                    F.col("label").cast("string"),
                    F.round("prob", 6).cast("string"), "sentence"))
    out.drop("sent_text").write.mode("overwrite").partitionBy("rel").parquet(
        args.out + "/predictions")
    print("PREDICT ok: rows=%d" %
          spark.read.parquet(args.out + "/predictions").count())


def mode_eval_data(spark, args):
    from kgre.pipeline import pages_to_mentions

    pages = _load_pages(spark, args)
    cands = pages_to_candidates(pages, args.entity_a, args.entity_b,
                                synthgen.stop_entity_ids())
    # S15 (relation_extraction.py:217-250): per-side entity occurrence
    # distribution, count ascending
    for side in ("subj", "obj"):
        (cands.groupBy(side).agg(F.count("*").alias("cnt"))
         .orderBy("cnt", side)
         .write.mode("overwrite").parquet(f"{args.out}/dist_{side}"))
    # X5 (load_data.py:828-871): mention-level norm|lemma-phrase
    # distribution; entity types are EXACT NER keys here (the reference
    # dict-membership test), e.g. HUMAN_GENE, not the GENE substring
    mentions = pages_to_mentions(pages, args.eval_ner_a, args.eval_ner_b)
    (mentions.groupBy("side", "entity_key").agg(F.count("*").alias("cnt"))
     .orderBy("cnt", "entity_key")
     .write.mode("overwrite").parquet(f"{args.out}/dist_phrases"))
    print("EVAL_DATA ok")


def mode_train(spark, args):
    """Reference TRAIN_FEED_FORWARD (relation_extraction.py:336-427):
    candidates -> vocab -> offline Adam logistic fit -> weights table."""
    from kgre import train
    from kgre.vocab import collect_vocab_sets

    pages = _load_pages(spark, args)
    cands = pages_to_candidates(pages, args.entity_a, args.entity_b,
                                synthgen.stop_entity_ids()).persist()
    vocab_df = build_vocab(cands, args.occur_count)
    vocab_df.write.mode("overwrite").parquet(args.out + "/vocab")
    vocabs = collect_vocab_sets(vocab_df)
    closure = kbmod.ontology_closure_dict(synthgen.ontology_rows())
    fwd, rev = kbmod.load_kb_sets(synthgen.kb_rows(), closure)
    key_order = sorted(fwd)
    wt, losses = train.train_model(cands, vocabs, key_order, fwd, rev,
                                   epochs=args.epochs)
    train.weights_to_df(spark, wt, key_order).write.mode(
        "overwrite").parquet(args.out + "/weights")
    print("TRAIN ok: loss %.4f -> %.4f, weights=%d" % (
        losses[0], losses[-1],
        spark.read.parquet(args.out + "/weights").count()))


def mode_train_lstm(spark, args):
    """Reference TRAIN_LSTM (M4, tf_lstm.py:75-368): candidates -> LSTM
    vocabs (min-count 0, load_data.py:605-610) -> offline numpy Adam+BPTT
    fit -> weights table keyed by feature/relation string."""
    from kgre import lstm, lstm_train

    pages = _load_pages(spark, args)
    a1, a2 = _allowlists(args)
    cands = pages_to_candidates(pages, args.entity_a, args.entity_b,
                                synthgen.stop_entity_ids(),
                                allow1=a1, allow2=a2).persist()
    # bounded distributed vocab build — no unbounded driver collect
    dep_vocab, word_vocab = lstm.lstm_vocab_features(
        cands, max_words=args.lstm_max_words)
    closure = kbmod.ontology_closure_dict(synthgen.ontology_rows())
    fwd, rev = kbmod.load_kb_sets(synthgen.kb_rows(), closure)
    key_order = sorted(fwd)
    params, losses = lstm_train.train_lstm_model(
        cands, dep_vocab, word_vocab, key_order, fwd, rev,
        epochs=args.epochs)
    lstm_train.lstm_weights_to_df(
        spark, params, dep_vocab, word_vocab, key_order
    ).write.mode("overwrite").parquet(args.out + "/lstm_weights")
    print("TRAIN_LSTM ok: loss %.4f -> %.4f" % (losses[0], losses[-1]))


MODES = {"build": mode_build, "score": mode_score, "predict": mode_predict,
         "eval-data": mode_eval_data, "train": mode_train,
         "train-lstm": mode_train_lstm}


def main(argv=None):
    p = argparse.ArgumentParser(prog="kgre", description=__doc__)
    p.add_argument("mode", choices=sorted(MODES))
    p.add_argument("--pages", help="parquet dir of pages")
    p.add_argument("--pages-glob", default=None,
                   help="pathGlobFilter for --pages (F5 file-suffix "
                        "predicate, e.g. '*.parquet')")
    p.add_argument("--recursive", action="store_true",
                   help="recursiveFileLookup for --pages (S2 directory walk)")
    p.add_argument("--documents", help="parquet file of driver documents")
    p.add_argument("--corenlp-xml", default=None,
                   help="directory of Stanford-CoreNLP XML .txt files "
                        "(the reference's real input format) — S1-compat "
                        "ingest bypassing the html extract/parse stage")
    p.add_argument("--synth", type=int, default=200,
                   help="generate N synthetic pages when no input given")
    p.add_argument("--out", default="/tmp/kgre_cli_out")
    p.add_argument("--entity-a", default="GENE")
    p.add_argument("--entity-b", default="ONTOLOGY")
    p.add_argument("--occur-count", type=int, default=5,
                   help="vocab min count (reference uses 100 at corpus scale)")
    p.add_argument("--allow1-file", default=None,
                   help="entity-id allowlist TSV for side 1 (S5/F3, "
                        "load_data.py:436-453, :553-567)")
    p.add_argument("--allow2-file", default=None,
                   help="entity-id allowlist TSV for side 2")
    p.add_argument("--eval-ner-a", default="HUMAN_GENE",
                   help="exact NER key for eval-data phrase counts (X5)")
    p.add_argument("--eval-ner-b", default="ONTOLOGY",
                   help="exact NER key for eval-data phrase counts, side 2")
    p.add_argument("--epochs", type=int, default=40,
                   help="training epochs (reference default is 250)")
    p.add_argument("--lstm-max-words", type=int, default=500_000,
                   help="LSTM word-vocab bound: keep the top-N corpus "
                        "words by count (min-count-0 reference semantics "
                        "but bounded driver collect)")
    p.add_argument("--resume", action="store_true",
                   help="run the candidates stage per url-hash bucket with "
                        "a lineage manifest; reruns skip completed buckets")
    p.add_argument("--buckets", type=int, default=8,
                   help="lineage bucket count for --resume")
    p.add_argument("--checkpoint", action="store_true",
                   help="materialize the candidates stage to parquet "
                        "(the reference's TFRecord boundary)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    spark = get_spark("kgre-" + args.mode, master=args.master)
    MODES[args.mode](spark, args)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
