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


def read_corenlp_xml(spark: SparkSession, path: str, glob: str = "*.txt",
                     recursive: bool = False) -> DataFrame:
    """Directory of CoreNLP-XML ``.txt`` files -> sentences DataFrame.

    S2 directory walk + F5 suffix predicate both evaluate at file listing
    (``pathGlobFilter``/``recursiveFileLookup``), before any bytes move —
    the reference's ``os.walk`` + ``endswith('.txt')``
    (load_data.py:457-475) pushed into the scan."""
    reader = spark.read.format("binaryFile").option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return corenlp_xml_to_sentences(reader.load(path))
