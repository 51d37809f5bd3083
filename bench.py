#!/usr/bin/env python
"""Benchmark harness for the kgre engine (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink so the full plan
(including Arrow/pandas UDF stages) executes distributed, without the
driver-side collect dominating the measurement.

Scaling protocol (BASELINE.md): run ``python bench.py --scaling`` to time
the flagship KG scoring job at N vs 4N cores (default local[4] vs
local[16], override via $SPARK_GRAFT_SCALE_LEVELS) on the same input and
report triples/sec at both plus efficiency = (thr_4N / thr_N) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# local-mode bench: the one driver JVM hosts all executor threads, so its
# heap is the cluster memory — size it like one (measured in r1: an 8g
# heap degrades a 5M-page run 1.75x vs 48g via GC pressure).  Library
# default stays 8g; only the bench opts into the big heap.
os.environ.setdefault("KGRE_DRIVER_MEM", "32g")

import __spark_entry__ as entry_mod  # noqa: E402
from kgre.session import get_spark  # noqa: E402

# Headline set: the KG-construction hot path plus one representative per
# operator family that scales with sf (SURVEY.md §2).
BENCH_QUERIES = [
    "q_kg_flagship",        # full pages->triples pipeline (the workload)
    "q_kg_candidates",      # extract+parse+SDP stage alone
    "q_vocab_topk",         # A1 count+prune+rank
    "q_label_join",         # J1 broadcast label join
    "q_sessionize",         # W-family window/sequence
    "q_window_tumbling",    # tumbling-window agg
    "q_tpch_pricing",       # wide scan agg
    "q_tpch_top_orders",    # 3-way join + top-k
    "q_dedup_exact",        # hash-groupBy dedup
    "q_ann_cosine_topk",    # brute-force cosine top-k
    "q_token_count",        # text analysis
    "q_fingerprint",        # rolling-hash fingerprint
]


# Documents-driven subset for the big-docs run (--big-docs): sf0.1 is
# tiny enough that the headline table mostly times per-query session
# overhead; replicating the documents table Nx gives a compute-dominant
# per-query table for the corpus-pass operators.  Queries over other
# tables (events/TPC-H/embeddings) keep their sf0.1 rows.
DOC_BENCH_QUERIES = [
    "q_kg_flagship", "q_kg_candidates", "q_vocab_topk", "q_label_join",
    "q_dedup_exact", "q_token_count", "q_fingerprint",
    # the replicated table is ~90% exact duplicates — exercises the
    # clean composition's collapse guards in the regime they exist for
    "q_clean_corpus",
]


# Round-5 training-data additions (--data-ops): benched under their own
# metric so the cross-round headline total stays comparable.
DATA_OPS_QUERIES = [
    "q_url_canonical",      # parse_url canonicalization, map-only
    "q_pii_scrub",          # 3-regex redaction, map-only
    "q_decontaminate",      # 5-gram overlap vs broadcast benchmark set
    "q_repetition",         # Gopher dup/top n-gram fractions
    "q_split_sample",       # md5 hash-bucket split + subsample, map-only
    "q_host_stats",         # per-host partial-agg groupBy
    "q_cap_per_host",       # domain balancing, hash-prefiltered rank
    "q_cross_doc_spans",    # span-level cross-doc dup, no pair explosion
    "q_lm_perplexity",      # CCNet-style bigram-LM bits-per-token
    "q_token_budget",       # per-source token quotas, two-phase cumsum
    "q_line_dedup",         # C4 line-level corpus dedup + reassembly
    "q_quality_classifier", # closed-form log-odds ref-vs-crawl scorer
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _min_of_passes(spark, qs, names, sf_dir,
                   passes: int = 2) -> tuple[dict, dict]:
    """Returns (min-per-query, all-passes-per-query).  The min is the
    headline (heap-preheat protocol, BENCH/BASELINE.md); the raw passes
    ride along in the JSON so variance-shaped regressions stay visible
    (ADVICE r3)."""
    all_passes: dict[str, list] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            all_passes[name].append(round(time.perf_counter() - t0, 3))
    return {n: min(w) for n, w in all_passes.items()}, all_passes


def run_bench() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kgre-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entry_mod.queries()
    # warm the JVM/Arrow path AND the python workers once so q1 doesn't
    # absorb session startup (q_kg_candidates has mapInPandas stages;
    # a pure-Catalyst warm-up would leave worker spawn on the flagship)
    _force(qs["q_kg_candidates"](spark, sf_dir))
    # Two full passes over the list, min per query: (a) this sandbox
    # shares a physical host and single degraded windows have produced
    # 20x per-query outliers; (b) lazily faulting in fresh driver-heap
    # pages stalls whichever stage first grows the heap (measured via
    # REST metrics: runTime 2114s vs cpuTime 66s on one such stage) — by
    # the second pass the heap is at max footprint, which is the steady
    # state of a long-running cluster job.
    timings, all_passes = _min_of_passes(spark, qs, BENCH_QUERIES, sf_dir)
    total = round(sum(timings.values()), 3)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = sf_dir
    print(json.dumps({
        "metric": "kgre_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "passes": all_passes,
        "sf": sf,
        "agg": "min-of-2",
    }))
    spark.stop()


def _materialize_big_docs(sf_dir: str, factor: int) -> str:
    """Replicate the documents table ``factor``x under fresh doc_ids
    (deterministic: doc i reuses base doc i % n_base's text/lang/source)
    and copy the other sf tables alongside, so queries() run unchanged.
    INPUT DATA, not engine work — written once, reused."""
    import shutil

    from kgre.webtext import WEBTEXT_VERSION

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/kgre_bigdocs_{WEBTEXT_VERSION}_{tag}_{factor}x"
    if os.path.exists(out + "/documents.parquet/_SUCCESS"):
        return out
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            dst = os.path.join(out, f)
            if not os.path.exists(dst):
                if os.path.isdir(os.path.join(sf_dir, f)):
                    shutil.copytree(os.path.join(sf_dir, f), dst)
                else:
                    shutil.copy(os.path.join(sf_dir, f), dst)
    spark = get_spark("kgre-bigdocs-gen", master="local[32]",
                      shuffle_partitions=32)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    base = base.sort_values("doc_id").reset_index(drop=True)
    bc = spark.sparkContext.broadcast(
        list(zip(base["text"], base["lang"], base["source"])))

    def run(batches):
        import pandas as pd
        rows_base = bc.value
        nb = len(rows_base)
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            texts, langs, sources = zip(*(rows_base[i % nb] for i in ids)) \
                if ids else ((), (), ())
            yield pd.DataFrame({
                "doc_id": ids, "text": list(texts), "lang": list(langs),
                "source": list(sources),
                "n_chars": [len(t) for t in texts]})

    n = len(base) * factor
    (spark.range(0, n, 1, 64)
     .mapInPandas(run, schema="doc_id long, text string, lang string, "
                              "source string, n_chars long")
     .write.mode("overwrite").parquet(out + "/documents.parquet"))
    spark.stop()
    return out


def run_big_docs() -> None:
    """Per-query bench over a factor-x documents table (compute-dominant
    regime for the corpus-pass operators)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_DOCS_FACTOR", "10"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big = _materialize_big_docs(sf_dir, factor)
    spark = get_spark("kgre-bench-big", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entry_mod.queries()
    _force(qs["q_kg_candidates"](spark, big))   # warm python workers
    # two full passes, min per query — see run_bench for why
    timings, all_passes = _min_of_passes(spark, qs, DOC_BENCH_QUERIES, big)
    # per-stage walls for the clean composition (VERDICT r4 #5): the
    # manifest forces one count per stage, so each stage's wall is
    # attributable (exact collapse / LSH+CC near-dup / quality+lang)
    # rather than folded into one lazy plan
    from kgre.clean import clean_documents
    docs = (spark.read.parquet(big + "/documents.parquet")
            .select("doc_id", "text"))
    stages: list = []
    t0 = time.perf_counter()
    clean_documents(docs, min_quality=0.1, lang_threshold=0.02,
                    manifest=stages)
    clean_wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "kgre_bigdocs_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "passes": all_passes,
        "clean_stages": {
            s[0]: {"rows_in": s[1], "rows_out": s[2],
                   "wall_s": round(s[3] / 1000, 3)}
            for s in stages},
        "clean_total_s": round(clean_wall, 3),
        "sf": f"{os.path.basename(sf_dir.rstrip('/'))}x{factor}",
        "n_docs": spark.read.parquet(big + "/documents.parquet").count(),
        "agg": "min-of-2",
    }))
    spark.stop()


def run_clean_full() -> None:
    """Per-stage walls for the FULL clean composition (every r5 optional
    stage on) at the big-docs scale: exact/near-dup -> quality/lang ->
    repetition -> perplexity (self-trained bigram LM) -> decontaminate
    (bench = every 997th doc) -> host cap (synthetic 97-host layout) ->
    per-source token budget.  Thresholds are chosen to measure the
    stages' cost, not to maximize drops."""
    from pyspark.sql import functions as F

    from kgre.clean import clean_documents

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_DOCS_FACTOR", "10"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big = _materialize_big_docs(sf_dir, factor)
    spark = get_spark("kgre-bench-cleanfull", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    d = F.col("doc_id")
    docs = (spark.read.parquet(big + "/documents.parquet")
            .withColumn("url", F.concat(
                F.lit("https://big"), (d % 97).cast("string"),
                F.lit(".example.com/p"), d.cast("string"))))
    bench_docs = docs.filter(d % 997 == 0).select("doc_id", "text")
    stages: list = []
    t0 = time.perf_counter()
    out = clean_documents(
        docs, min_quality=0.1, lang_threshold=0.02, manifest=stages,
        url_col="url", max_rep_frac=0.9, max_bits=20.0,
        decontam_bench=bench_docs, host_cap=100, token_budget=100_000)
    n_final = out.count()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "kgre_cleanfull_total",
        "value": round(wall, 3),
        "unit": "sec",
        "stages": {s[0]: {"rows_in": s[1], "rows_out": s[2],
                          "wall_s": round(s[3] / 1000, 3)}
                   for s in stages},
        "n_docs": docs.count(),
        "n_final": n_final,
        "sf": f"{os.path.basename(sf_dir.rstrip('/'))}x{factor}",
    }))
    spark.stop()


# bump when the XML serialization or page derivation changes
CORENLP_FIXTURE_V = "v1"


def _materialize_corenlp_fixture(n_docs: int) -> str:
    """Write ~``n_docs`` CoreNLP-XML .txt files (one per en page of the
    deterministic generator corpus) plus the same pages as parquet, so
    the two ingest paths read comparable on-disk inputs.  INPUT DATA,
    generated once and reused."""
    import pandas as pd

    from kgre import synthgen

    out = f"/tmp/kgre_corenlp_fixture_{CORENLP_FIXTURE_V}_{n_docs}"
    if (os.path.exists(out + "/xml/_DONE")
            and os.path.exists(out + "/pages.parquet/_SUCCESS")):
        return out
    spark = get_spark("kgre-corenlp-gen", master="local[32]",
                      shuffle_partitions=32)
    pages = synthgen.pages_df(spark, n_docs).filter("lang = 'en'")
    pages.write.mode("overwrite").parquet(out + "/pages.parquet")

    def run(batches):
        from kgre import nlp
        from kgre.corenlp import sentence_rows_to_xml
        from kgre.extract import extract_text_from_html
        for pdf in batches:
            urls, blobs = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text_from_html(html)
                rows = [{"url": url, "sent_id": s["sent_id"],
                         "tokens": s["tokens"], "deps": s["deps"]}
                        for s in nlp.parse_text(text)]
                urls.append(url)
                blobs.append(sentence_rows_to_xml(rows))
            yield pd.DataFrame({"url": urls, "xml": blobs})

    rows = (spark.read.parquet(out + "/pages.parquet")
            .select("url", "html")
            .mapInPandas(run, schema="url string, xml binary").collect())
    os.makedirs(out + "/xml", exist_ok=True)
    for i, r in enumerate(sorted(rows, key=lambda r: r["url"])):
        with open(f"{out}/xml/d{i}.txt", "wb") as f:
            f.write(bytes(r["xml"]))
    with open(out + "/xml/_DONE", "w") as f:
        f.write("ok")
    spark.stop()
    return out


def run_corenlp() -> None:
    """Time the CoreNLP-XML ingest (binaryFile scan + one mapInPandas XML
    parse -> candidates) against the native pages path (html extract +
    parse -> candidates) over the SAME corpus — both paths yield the
    same sentences, so the wall ratio IS the per-sentence ratio."""
    from kgre import synthgen
    from kgre.corenlp import read_corenlp_candidates, read_corenlp_xml
    from kgre.pipeline import pages_to_candidates

    n = int(os.environ.get("SPARK_GRAFT_CORENLP_DOCS", "5000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    fix = _materialize_corenlp_fixture(n)
    spark = get_spark("kgre-bench-corenlp", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    stop = synthgen.stop_entity_ids()

    def xml_job():
        return read_corenlp_candidates(spark, fix + "/xml",
                                       "GENE", "ONTOLOGY", stop)

    def pages_job():
        pages = spark.read.parquet(fix + "/pages.parquet")
        return pages_to_candidates(pages, "GENE", "ONTOLOGY", stop)

    n_sents = read_corenlp_xml(spark, fix + "/xml").count()
    _force(xml_job())
    _force(pages_job())   # warm python workers + heap on both paths
    t = {}
    for name, job in (("corenlp_xml", xml_job), ("pages_html", pages_job)):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _force(job())
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        t[name] = round(best, 3)
    print(json.dumps({
        "metric": "kgre_corenlp_ingest",
        "value": t["corenlp_xml"],
        "unit": "sec",
        "queries": t,
        "n_docs": n,
        "n_sents": n_sents,
        "xml_vs_pages_ratio": round(t["corenlp_xml"] / t["pages_html"], 3),
        "agg": "min-of-2",
    }))
    spark.stop()


def _corpus_dir(sf_dir: str, n_docs: int) -> str:
    from kgre.webtext import WEBTEXT_VERSION

    # version token guards against a stale cached corpus after a change
    # to the page-derivation semantics (bump WEBTEXT_VERSION there); the
    # sf tag keeps corpora generated from different source sf dirs apart
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    return os.environ.get(
        "SPARK_GRAFT_CORPUS_DIR",
        f"/tmp/kgre_scale_corpus_{WEBTEXT_VERSION}_{sf_tag}_{n_docs}")


def _materialize_corpus(sf_dir: str, n_docs: int) -> str:
    """Write the deterministic scaled corpus to parquet ONCE (64 files so
    every parallelism level scans without a repartition).  This is INPUT
    DATA, not engine work: in production the pages arrive as an
    Iceberg/parquet table, so the timed job is scan -> extract/parse/
    candidates -> vocab -> score, the north_rule shape.  Generating
    in-line instead would chain two mapInPandas stages (generator +
    candidates = 2 python workers per task), which oversubscribes cores
    at high parallelism and measures the generator, not the engine."""
    out = _corpus_dir(sf_dir, n_docs)
    if os.path.exists(out + "/_SUCCESS"):
        return out
    from kgre import webtext

    spark = get_spark("kgre-scale-gen", master="local[32]",
                      shuffle_partitions=32)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (webtext.scaled_corpus(docs, n_docs).repartition(64)
     .write.mode("overwrite").parquet(out))
    spark.stop()
    return out


def _triples_throughput(master: str, sf_dir: str, n_docs: int) -> dict:
    """Time the flagship KG job end-to-end at one parallelism level over
    the materialized corpus (identical bytes at every level)."""
    from kgre import synthgen
    from kgre.pipeline import KgPipeline
    from kgre.score import emitted_triples

    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(f"kgre-scale-{cores}", master=master,
                      shuffle_partitions=cores)
    corpus = _corpus_dir(sf_dir, n_docs)

    def job() -> int:
        pages = spark.read.parquet(corpus)
        pipe = KgPipeline(spark, occur_count=2)
        scored, _, _ = pipe.run(pages, synthgen.kb_rows(),
                                synthgen.ontology_rows(),
                                synthgen.stop_entity_ids(),
                                emit_threshold=0.5)
        return emitted_triples(scored).count()

    # Measure steady state: the first pass pays one-time python-worker
    # spawn + module imports + JIT (~10s regardless of data size —
    # amortized to nothing over a long-running cluster job); then take the
    # best of three timed passes (this sandbox is a VM on a shared host —
    # wall time for an identical job varies up to 3x between quiet and
    # noisy windows, so min-of-reps is the only stable estimator).
    job()
    wall, n = None, 0
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = job()
        w = time.perf_counter() - t0
        wall = w if wall is None else min(wall, w)
    spark.stop()
    return {"cores": cores, "docs": n_docs, "triples": n,
            "wall_s": round(wall, 2),
            "triples_per_s": round(n / wall, 1),
            "docs_per_s": round(n_docs / wall, 1)}


def _throughput_subprocess(master: str, sf_dir: str, n_docs: int) -> dict:
    """Run one parallelism level in a FRESH python process: a second
    SparkSession created in the same JVM after spark.stop() is measurably
    degraded (reproducibly up to ~8x slower stages), so each level gets a
    clean process."""
    import subprocess
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-one",
         master, str(n_docs)],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_scaling() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "1200000"))
    lo_n, hi_n = (int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALE_LEVELS", "4,16").split(","))
    _materialize_corpus(sf_dir, n_docs)   # untimed; shared by both levels
    lo = _throughput_subprocess(f"local[{lo_n}]", sf_dir, n_docs)
    hi = _throughput_subprocess(f"local[{hi_n}]", sf_dir, n_docs)
    eff = round((hi["triples_per_s"] / lo["triples_per_s"])
                / (hi_n / lo_n), 3)
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}",
        "value": eff,
        "unit": "ratio",
        "low": lo,
        "high": hi,
        "sf": sf_dir,
    }))


def run_data_ops() -> None:
    """Bench the r5 training-data additions at the headline sf on the
    headline protocol (warm session, min-of-2)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kgre-dataops-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = entry_mod.queries()
    _force(qs["q_url_canonical"](spark, sf_dir))  # warm workers/JVM
    timings, all_passes = _min_of_passes(spark, qs, DATA_OPS_QUERIES,
                                         sf_dir)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = sf_dir
    print(json.dumps({
        "metric": "kgre_dataops_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "passes": all_passes,
        "sf": sf,
        "agg": "min-of-2",
    }))
    spark.stop()


if __name__ == "__main__":
    if "--scaling-one" in sys.argv:
        i = sys.argv.index("--scaling-one")
        _sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        _n = int(sys.argv[i + 2])
        # no-op when the parent already materialized (the normal path);
        # direct invocation pays a one-time generation session first
        _materialize_corpus(_sf, _n)
        print(json.dumps(_triples_throughput(sys.argv[i + 1], _sf, _n)))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--big-docs" in sys.argv:
        run_big_docs()
    elif "--data-ops" in sys.argv:
        run_data_ops()
    elif "--clean-full" in sys.argv:
        run_clean_full()
    elif "--corenlp" in sys.argv:
        run_corenlp()
    else:
        run_bench()
