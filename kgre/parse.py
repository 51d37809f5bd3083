"""Sentence split + deterministic parse stub -> ``sentences`` rows.

Spark analog of the reference's CoreNLP-XML scan (S1, load_data.py:352-396):
one output row per sentence with 1-based tokens (implicit ROOT=0) and the
dependency edge list.  FIXTURES.md §2 schema.

Runs as a single ``mapInPandas`` (1 page row -> N sentence rows, Arrow
batches).  The language filter is applied *before* this stage so Catalyst
pushes it into the parquet scan (predicate pushdown — never parse pages we
won't use).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from kgre import nlp

SENTENCES_SCHEMA = (
    "url string, sent_id int, sent_text string, "
    "tokens array<struct<id:int,word:string,lemma:string,pos:string,"
    "ner:string,norm_ner:string>>, "
    "deps array<struct<type:string,gov:int,dep:int>>"
)


def parse_sentences(extracted: DataFrame, lang: str = "en") -> DataFrame:
    """extracted(url, text, lang, ...) -> sentences rows (lang-filtered)."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "sent_id": [], "sent_text": [], "tokens": [],
                   "deps": []}
            for url, text in zip(pdf["url"], pdf["text"]):
                for s in nlp.parse_text(text):
                    out["url"].append(url)
                    out["sent_id"].append(s["sent_id"])
                    out["sent_text"].append(s["sent_text"])
                    out["tokens"].append(s["tokens"])
                    out["deps"].append(s["deps"])
            yield pd.DataFrame(out)

    return (
        extracted.filter(extracted.lang == lang)
        .select("url", "text")
        .mapInPandas(run, schema=SENTENCES_SCHEMA)
    )
