"""Offline training (M2, reference feed_forward_train
tf_feed_forward.py:66-288) — deliberately OUT of the Spark hot path
(SURVEY.md §2.10: train once on one node, broadcast weights).

The reference materializes int8 feature matrices to TFRecords and trains a
single-node TF graph: Adam, sigmoid cross-entropy, 250 epochs, batch 128,
seed 10 (tf_feed_forward.py:7-11, :96-97).  Its shipped configuration is
``hidden_array=[]`` so the model IS multi-label logistic regression; this
module fits exactly that with numpy Adam, consuming the distributed
candidates table in two steps:

  1. distributed: distant labels + per-instance feature hit lists
     (broadcast vocab index) computed in Spark, then collected — bounded
     by ``sample`` the same way the reference is bounded by what fits in
     TFRecords on one box;
  2. driver: dense gradient steps over the sparse hit lists.

Output is a weight table keyed by feature STRING (never dense id,
SURVEY.md §7.4.2): (idx, W, bias) consumable by score_candidates, plus a
writable (kind, feature, rel, weight) DataFrame so the trained model is a
table like every other artifact (the reference pickles its dictionaries,
relation_extraction.py:374-385; we persist parquet).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgre.model import KINDS

SEED = 10          # tf_feed_forward.py:7-8
BATCH = 128        # tf_feed_forward.py:97
EPOCHS = 250       # tf_feed_forward.py:96
LR = 0.001         # Adam default, tf.train.AdamOptimizer


def _feature_index(vocabs: dict[str, set]):
    idx: dict[str, dict[str, int]] = {}
    r = 0
    for kind in KINDS:
        d = {}
        for feat in sorted(vocabs[kind]):
            d[feat] = r
            r += 1
        idx[kind] = d
    return idx, r


def collect_training_set(candidates: DataFrame, vocabs: dict[str, set],
                         key_order: list[str], fwd_kb, rev_kb,
                         sample: int = 100_000):
    """candidates -> (feature-hit lists, distant-label matrix) on the
    driver.  ``sample`` caps driver memory (the reference is equally
    bounded by TFRecords on one box); sampling is deterministic (hash of
    the instance key).  Labels use the shared truth-table logic
    (pyoracle.label_instance == the scorer's J1 join)."""
    import itertools

    from kgre.pyoracle import label_instance

    idx, n_feat = _feature_index(vocabs)
    inst = (
        candidates.filter((~F.col("is_reverse")) | F.col("gene_to_gene"))
        .withColumn("_h", F.pmod(F.xxhash64("url", "sent_id", "pair_idx",
                                            "is_reverse"), F.lit(1 << 20)))
        .orderBy("_h", "url", "sent_id", "pair_idx", "is_reverse")
        .limit(sample)
        .select("is_reverse", "pair_e1_ids", "pair_e2_ids",
                "dep_path_string", "sdp_words", "sdp_elements",
                "between_words")
    )
    rows = inst.collect()
    hits: list[list[int]] = []
    y = np.zeros((len(rows), len(key_order)))
    for r, row in enumerate(rows):
        h = []
        i = idx["dep_path"].get(row["dep_path_string"])
        if i is not None:
            h.append(i)
        for kind, col in (("dep_word", "sdp_words"),
                          ("element", "sdp_elements"),
                          ("between", "between_words")):
            d = idx[kind]
            for f in set(row[col]):
                j = d.get(f)
                if j is not None:
                    h.append(j)
        hits.append(h)
        combos = set(itertools.product(row["pair_e1_ids"],
                                       row["pair_e2_ids"]))
        fwd_l, rev_l = label_instance(combos, key_order, fwd_kb, rev_kb)
        y[r] = rev_l if row["is_reverse"] else fwd_l
    return idx, hits, y


def fit_logistic(hits, y, n_feat: int, epochs: int = EPOCHS,
                 batch: int = BATCH, lr: float = LR, seed: int = SEED):
    """Multi-label logistic regression via Adam on sigmoid cross-entropy
    (the reference graph with hidden_array=[]).  Returns (W, b, losses)."""
    rng = np.random.RandomState(seed)
    n, n_rel = y.shape
    w = np.zeros((n_feat, n_rel))
    b = np.zeros(n_rel)
    mw = np.zeros_like(w); vw = np.zeros_like(w)
    mb = np.zeros_like(b); vb = np.zeros_like(b)
    b1, b2, eps = 0.9, 0.999, 1e-8
    t = 0
    losses = []
    order = np.arange(n)
    for _ in range(epochs):
        rng.shuffle(order)
        ep_loss = 0.0
        for s in range(0, n, batch):
            sel = order[s:s + batch]
            z = b + np.stack([w[hits[i]].sum(axis=0) if hits[i] else
                              np.zeros(n_rel) for i in sel])
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -60, 60)))
            err = p - y[sel]                      # dL/dz for sigmoid-CE
            ep_loss += float(
                -(y[sel] * np.log(p + 1e-12)
                  + (1 - y[sel]) * np.log(1 - p + 1e-12)).sum())
            gw = np.zeros_like(w)
            for r, i in enumerate(sel):
                if hits[i]:
                    gw[hits[i]] += err[r]
            gw /= len(sel)
            gb = err.mean(axis=0)
            t += 1
            for g, wt, m, v in ((gw, w, mw, vw), (gb, b, mb, vb)):
                m *= b1; m += (1 - b1) * g
                v *= b2; v += (1 - b2) * g * g
                wt -= lr * (m / (1 - b1**t)) / (np.sqrt(v / (1 - b2**t)) + eps)
        losses.append(ep_loss / max(n, 1))
    return w, b, losses


def train_model(candidates: DataFrame, vocabs: dict[str, set],
                key_order: list[str], fwd_kb, rev_kb,
                epochs: int = EPOCHS, sample: int = 100_000):
    """-> ((idx, W, bias) for score_candidates(weight_table=...), losses)."""
    _, n_feat = _feature_index(vocabs)
    idx, hits, y = collect_training_set(candidates, vocabs, key_order,
                                        fwd_kb, rev_kb, sample)
    w, b, losses = fit_logistic(hits, y, n_feat, epochs=epochs)
    return (idx, w, b), losses


def weights_to_df(spark, weight_table, key_order: list[str]) -> DataFrame:
    """(kind, feature, rel, weight) rows — the persisted-model artifact."""
    idx, w, b = weight_table
    rows = []
    for kind, d in idx.items():
        for feat, r in d.items():
            for k, rel in enumerate(key_order):
                rows.append((kind, feat, rel, float(w[r, k])))
    for k, rel in enumerate(key_order):
        rows.append(("__bias__", "", rel, float(b[k])))
    return spark.createDataFrame(
        rows, "kind string, feature string, rel string, weight double")


def weights_from_df(df: DataFrame, vocabs: dict[str, set],
                    key_order: list[str]):
    """Inverse of weights_to_df (weights keyed by feature string survive
    any re-assignment of dense ids)."""
    idx, n_feat = _feature_index(vocabs)
    w = np.zeros((n_feat, len(key_order)))
    b = np.zeros(len(key_order))
    kpos = {rel: k for k, rel in enumerate(key_order)}
    for row in df.collect():
        k = kpos[row["rel"]]
        if row["kind"] == "__bias__":
            b[k] = row["weight"]
            continue
        r = idx.get(row["kind"], {}).get(row["feature"])
        if r is not None:
            w[r, k] = row["weight"]
    return idx, w, b
