"""Bridge from the driver's ``documents`` table to the pipeline's
``pages`` input: deterministically inject entity surface forms and
sentence breaks into document text, wrap in the synthetic HTML template.

Pure function of (doc_id, text): the oracle can reproduce the exact same
pages driver-side for parity checks at small scale.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame

from kgre.synthgen import HTML_TEMPLATE, N_GENES, N_GO, PAGES_SCHEMA
from kgre.util import hrange

_TS_BASE = datetime(2024, 1, 1)


def doc_to_page(doc_id: int, text: str, lang: str) -> dict:
    words = text.split()
    out = []
    for j, w in enumerate(words):
        out.append(w)
        r = hrange("inj|%d|%d" % (doc_id, j), 23)
        if r == 0:
            out.append("GENE%d" % (1 + hrange("g|%d|%d" % (doc_id, j), N_GENES)))
        elif r == 1:
            out.append("GO%d" % (1 + hrange("o|%d|%d" % (doc_id, j), N_GO)))
        elif r == 2:
            out.append("VGENE%d" % (1 + hrange("v|%d|%d" % (doc_id, j), N_GENES)))
        if j % 12 == 11:
            out.append(".")
    new_text = " ".join(out) + " ."
    url = "https://docs.example/d%d" % doc_id
    return {
        "url": url,
        "warc_ts": _TS_BASE + timedelta(seconds=int(doc_id)),
        "html": HTML_TEMPLATE.format(title="doc %d" % doc_id, text=new_text,
                                     footer=doc_id).encode("utf-8"),
        "text": new_text,
        "lang": lang,
    }


def pages_from_documents(docs: DataFrame) -> DataFrame:
    def run(batches):
        for pdf in batches:
            rows = [
                doc_to_page(int(d), t, l)
                for d, t, l in zip(pdf["doc_id"], pdf["text"], pdf["lang"])
            ]
            yield pd.DataFrame(rows,
                               columns=["url", "warc_ts", "html", "text", "lang"])

    return docs.select("doc_id", "text", "lang").mapInPandas(
        run, schema=PAGES_SCHEMA
    )
