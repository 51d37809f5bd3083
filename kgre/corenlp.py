"""S1-compat ingest: Stanford-CoreNLP XML -> ``sentences`` rows.

The reference's actual input is a directory of ``.txt`` files each
holding CoreNLP XML (load_data.py:352-396 ``load_xml``: document ->
``sentence`` elements -> ``token`` elements + ``dependencies``
elements).  The engine's native S1 path parses synthetic web pages; this
module makes a real parsed corpus a drop-in by emitting the exact
``parse.SENTENCES_SCHEMA`` rows the candidates stage consumes.

Reference-faithful field mapping (load_data.py:367-387):
  * ``url``   <- the sentence's ``PMID`` child TAG text (the reference
    reads PMID with ``.find`` "because its a tag");
  * ``sent_id`` <- the sentence's ``id`` ATTRIBUTE;
  * token    <- id attribute + ``word``/``lemma``/``POS``/``NER``
    children; ``NormalizedNER`` is optional and maps to ``norm_ner``
    None when absent (NER and NormalizedNER stay pipe-delimited
    multi-value strings, split downstream);
  * deps     <- the FIRST ``dependencies`` element only (the
    reference's ``dependencies[0]`` = basic dependencies), each ``dep``
    contributing (type attr, governor idx, dependent idx);
  * ``CharacterOffsetBegin/End`` are parsed by the reference but carried
    unused (SURVEY.md §1.2) — dropped here;
  * ``sent_text`` <- token words joined by single spaces, which is
    exactly the whitespace-normalized form every downstream consumer
    (tokenizer-aligned highlighting, S14) expects.

The reference keeps only sentences whose ``generate_entity_pairs`` finds
both entity types; that filter lives in the candidates stage here
(sentences without both types simply produce zero candidate rows), so
the reader emits every sentence — same end-to-end result, and the
sentences table stays reusable for other entity-type pairs.

Scale shape: ``binaryFile`` scan (file listing prunes by glob before any
bytes are read, like S2/F5) -> one ``mapInPandas`` XML parse (Arrow
batches; each file is parsed once, sentence rows stream out columnar).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kgre.parse import SENTENCES_SCHEMA


def sentences_from_corenlp_xml(content: bytes | str) -> list[dict]:
    """One CoreNLP XML document -> list of sentence-row dicts
    (url, sent_id, sent_text, tokens, deps).  Pure function; see module
    docstring for the load_data.py:352-396 field mapping."""
    if isinstance(content, (bytes, bytearray)):
        root = ET.fromstring(bytes(content))
    else:
        root = ET.fromstring(content)
    rows = []
    for sentence in root.iter("sentence"):
        pmid_el = sentence.find("PMID")
        pmid = pmid_el.text if pmid_el is not None else None
        sent_id = int(sentence.get("id"))
        tokens = []
        for token in sentence.iter("token"):
            norm_el = token.find("NormalizedNER")
            ner_el = token.find("NER")
            tokens.append({
                "id": int(token.get("id")),
                "word": token.find("word").text,
                "lemma": token.find("lemma").text,
                "pos": token.find("POS").text,
                # CoreNLP emits 'O' for non-entities; tolerate an empty
                # element in malformed files
                "ner": (ner_el.text if ner_el is not None
                        and ner_el.text is not None else "O"),
                "norm_ner": (norm_el.text if norm_el is not None
                             else None),
            })
        deps = []
        dep_blocks = list(sentence.iter("dependencies"))
        if dep_blocks:                      # dependencies[0] = basic
            for d in dep_blocks[0].iter("dep"):
                deps.append({
                    "type": d.get("type"),
                    "gov": int(d.find("governor").get("idx")),
                    "dep": int(d.find("dependent").get("idx")),
                })
        rows.append({
            "url": pmid,
            "sent_id": sent_id,
            "sent_text": " ".join(t["word"] for t in tokens),
            "tokens": tokens,
            "deps": deps,
        })
    return rows


def sentence_rows_to_xml(rows: list[dict]) -> bytes:
    """Serialize sentence rows (the reader's output shape) back to the
    CoreNLP XML layout ``sentences_from_corenlp_xml`` consumes — the
    export/fixture/bench inverse.  (The pytest fixture writer in
    tests/test_corenlp.py stays independent of this function so
    roundtrip tests can't cancel a shared bug.)"""
    root = ET.Element("root")
    doc = ET.SubElement(root, "document")
    sents = ET.SubElement(doc, "sentences")
    for r in rows:
        s = ET.SubElement(sents, "sentence", id=str(r["sent_id"]))
        ET.SubElement(s, "PMID").text = r["url"]
        toks = ET.SubElement(s, "tokens")
        for t in r["tokens"]:
            te = ET.SubElement(toks, "token", id=str(t["id"]))
            ET.SubElement(te, "word").text = t["word"]
            ET.SubElement(te, "lemma").text = t["lemma"]
            ET.SubElement(te, "POS").text = t["pos"]
            ET.SubElement(te, "NER").text = t["ner"]
            if t.get("norm_ner") is not None:
                ET.SubElement(te, "NormalizedNER").text = t["norm_ner"]
        deps = ET.SubElement(s, "dependencies", type="basic-dependencies")
        for d in r["deps"]:
            de = ET.SubElement(deps, "dep", type=d["type"])
            ET.SubElement(de, "governor", idx=str(d["gov"]))
            ET.SubElement(de, "dependent", idx=str(d["dep"]))
    return ET.tostring(root)


def corenlp_xml_to_sentences(files: DataFrame) -> DataFrame:
    """(path, content) file rows -> sentences rows (one mapInPandas)."""

    def run(batches):
        cols = ("url", "sent_id", "sent_text", "tokens", "deps")
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(sentences_from_corenlp_xml(content))
            if rows:
                yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object)
                                    for c in cols})

    return files.select("content").mapInPandas(run, schema=SENTENCES_SCHEMA)


def _binary_reader(spark: SparkSession, glob: str, recursive: bool):
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader


def read_corenlp_xml(spark: SparkSession, path: str, glob: str = "*.txt",
                     recursive: bool = False) -> DataFrame:
    """Directory of CoreNLP-XML ``.txt`` files -> sentences DataFrame.

    S2 directory walk + F5 suffix predicate both evaluate at file listing
    (``pathGlobFilter``/``recursiveFileLookup``), before any bytes move —
    the reference's ``os.walk`` + ``endswith('.txt')``
    (load_data.py:457-475) pushed into the scan."""
    return corenlp_xml_to_sentences(
        _binary_reader(spark, glob, recursive).load(path))


def corenlp_corrupt_files(files: DataFrame) -> DataFrame:
    """(path, error) for every file the XML parser rejects — the audit
    twin of ``on_error='skip'``: a web-scale corpus always carries some
    truncated/garbled files, and silently skipping without an audit path
    hides ingest loss.  Distributed (one mapInPandas attempt per file);
    empty result == clean corpus."""

    def run(batches):
        for pdf in batches:
            paths, errs = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    sentences_from_corenlp_xml(content)
                except Exception as exc:  # noqa: BLE001 — audit surface
                    paths.append(path)
                    errs.append("%s: %s" % (type(exc).__name__, exc))
            yield pd.DataFrame({"path": pd.Series(paths, dtype=object),
                                "error": pd.Series(errs, dtype=object)})

    return files.select("path", "content").mapInPandas(
        run, schema="path string, error string")


def corenlp_files_to_candidates(files: DataFrame, entity_a: str,
                                entity_b: str, stop_ids,
                                allow1=None, allow2=None,
                                on_error: str = "fail") -> DataFrame:
    """FUSED XML parse + candidate generation — the CoreNLP twin of
    ``pipeline.pages_to_candidates``: one Python crossing for the whole
    per-file path.  Chaining ``corenlp_xml_to_sentences`` into
    ``candidates_from_sentences`` instead costs a second mapInPandas
    stage whose (tokens, deps) array-of-struct rows round-trip through
    Arrow — measured 2.4x the pages path on a 5k-doc corpus, vs ~1.2x
    fused.  The composable sentence reader stays for sentence-level
    consumers (eval-data mentions, ad-hoc analysis).

    ``on_error``: 'fail' (default — reference parity, one bad file kills
    the job with its path in the error) or 'skip' (permissive web-scale
    mode: unparseable files contribute zero rows; audit what was dropped
    with ``corenlp_corrupt_files``)."""
    from kgre.candidates import (CANDIDATES_SCHEMA, rows_to_pdf,
                                 sentence_candidates)

    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")
    stop = frozenset(stop_ids)
    a1 = frozenset(allow1) if allow1 is not None else None
    a2 = frozenset(allow2) if allow2 is not None else None

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    sents = sentences_from_corenlp_xml(content)
                except Exception as exc:
                    if on_error == "fail":
                        raise ValueError(
                            "corenlp ingest failed on %s" % path) from exc
                    continue
                for s in sents:
                    rows.extend(
                        sentence_candidates(
                            s["url"], s["sent_id"], s["tokens"], s["deps"],
                            entity_a, entity_b, stop, a1, a2,
                            sent_text=s["sent_text"],
                        )
                    )
            yield rows_to_pdf(rows)

    return files.select("path", "content").mapInPandas(
        run, schema=CANDIDATES_SCHEMA)


def read_corenlp_candidates(spark: SparkSession, path: str, entity_a: str,
                            entity_b: str, stop_ids, glob: str = "*.txt",
                            recursive: bool = False,
                            allow1=None, allow2=None,
                            on_error: str = "fail") -> DataFrame:
    """binaryFile scan -> fused parse+candidates (the CLI ingest path)."""
    return corenlp_files_to_candidates(
        _binary_reader(spark, glob, recursive).load(path),
        entity_a, entity_b, stop_ids, allow1=allow1, allow2=allow2,
        on_error=on_error)
