"""Distant labeling + model scoring -> scored triples.

Fuses J1 (distant label membership, load_data.py:275-286) and M1 (logistic
forward pass — the reference's shipped feed-forward config degenerates to
per-relation logistic regression, relation_extraction.py:405,
tf_feed_forward.py:32-63) into ONE ``mapInPandas`` stage over broadcast
state:

  * KB forward/reverse tuple sets (broadcast — the reference keeps them in
    driver RAM; here they ship once per executor)
  * vocabulary feature sets and a precomputed weight table
    {(kind, feature) -> np.float64[n_rel]} — weights are materialized once
    on the driver from the frozen feature-string-keyed model (kgre/model.py)
    so the hot loop does dict lookups + vector adds, no hashing.

Output: one row per (instance x relation) in the reference's write_output
layout (relation_extraction.py:21-47): (url=pmid, subj, obj, rel,
distant label, probability); emitted-triple set = prob > 0.5
(tf_feed_forward.py:163).

Reverse instances are scored only for gene-gene pairs
(load_data.py:288-290); the candidates table carries both so the vocab
builder sees reverse features (load_data.py:201-208).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgre.model import KINDS, bias, feature_weight

TRIPLES_SCHEMA = (
    "url string, sent_id int, pair_idx int, is_reverse boolean, "
    "subj string, obj string, rel string, label int, prob double"
)


def build_weight_table(vocabs: dict[str, set], key_order: list[str]):
    """{(kind, feature): np.float64[n_rel]} + bias vector, driver-side."""
    table = {}
    for kind in KINDS:
        for feat in vocabs[kind]:
            table[(kind, feat)] = np.array(
                [feature_weight(kind, rel, feat) for rel in key_order],
                dtype=np.float64,
            )
    bias_vec = np.array([bias(rel) for rel in key_order], dtype=np.float64)
    return table, bias_vec


def score_candidates(
    candidates: DataFrame,
    vocabs: dict[str, set],
    key_order: list[str],
    fwd_kb: dict[str, set],
    rev_kb: dict[str, set],
) -> DataFrame:
    """candidates -> scored triples (one row per instance x relation)."""
    spark = candidates.sparkSession
    weight_table, bias_vec = build_weight_table(vocabs, key_order)
    b_state = spark.sparkContext.broadcast(
        {
            "weights": weight_table,
            "bias": bias_vec,
            "vocabs": vocabs,
            "key_order": key_order,
            "fwd": fwd_kb,
            "rev": rev_kb,
        }
    )
    n_rel = len(key_order)

    def run(batches):
        st = b_state.value
        weights, bias_v = st["weights"], st["bias"]
        vocab_path = st["vocabs"]["dep_path"]
        vocab_word = st["vocabs"]["dep_word"]
        vocab_elem = st["vocabs"]["element"]
        vocab_betw = st["vocabs"]["between"]
        keys, fwd, rev = st["key_order"], st["fwd"], st["rev"]
        sym = np.array(["SYMMETRIC" in k for k in keys])
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            probs = np.empty((n, n_rel), dtype=np.float64)
            labels = np.zeros((n, n_rel), dtype=np.int32)
            it = zip(
                pdf["is_reverse"], pdf["pair_e1_ids"], pdf["pair_e2_ids"],
                pdf["dep_path_string"], pdf["sdp_words"],
                pdf["sdp_elements"], pdf["between_words"],
            )
            for r, (is_rev, pe1, pe2, path_s, words, elems, betw) in enumerate(it):
                z = bias_v.copy()
                if path_s in vocab_path:
                    z += weights[("dep_path", path_s)]
                for f in set(words) & vocab_word:
                    z += weights[("dep_word", f)]
                for f in set(elems) & vocab_elem:
                    z += weights[("element", f)]
                for f in set(betw) & vocab_betw:
                    z += weights[("between", f)]
                probs[r] = 1.0 / (1.0 + np.exp(-z))
                combos = set(itertools.product(pe1, pe2))
                for k, key in enumerate(keys):
                    if sym[k]:
                        if combos & fwd[key] or combos & rev[key]:
                            labels[r, k] = 1
                    elif not is_rev:
                        if combos & fwd[key]:
                            labels[r, k] = 1
                    else:
                        # reference if/elif (load_data.py:283-286): the
                        # reverse instance is labeled only when the forward
                        # set did NOT match
                        if not (combos & fwd[key]) and combos & rev[key]:
                            labels[r, k] = 1
            out = pd.DataFrame(
                {
                    "url": np.repeat(pdf["url"].to_numpy(), n_rel),
                    "sent_id": np.repeat(pdf["sent_id"].to_numpy(), n_rel),
                    "pair_idx": np.repeat(pdf["pair_idx"].to_numpy(), n_rel),
                    "is_reverse": np.repeat(pdf["is_reverse"].to_numpy(), n_rel),
                    "subj": np.repeat(pdf["subj"].to_numpy(), n_rel),
                    "obj": np.repeat(pdf["obj"].to_numpy(), n_rel),
                    "rel": np.tile(np.array(keys, dtype=object), n),
                    "label": labels.ravel(),
                    "prob": probs.ravel(),
                }
            )
            yield out

    scorable = candidates.filter(
        (~F.col("is_reverse")) | F.col("gene_to_gene")
    )
    return scorable.mapInPandas(run, schema=TRIPLES_SCHEMA)


def emitted_triples(scored: DataFrame) -> DataFrame:
    """Triples the pipeline asserts true: prob > 0.5 (tf_feed_forward.py:163)."""
    return scored.filter(F.col("prob") > 0.5)
