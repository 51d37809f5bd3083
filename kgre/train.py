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


_HASH_BITS = 20


def hash_range_sample(df: DataFrame, sample: int,
                      oversample: float = 1.3, max_iters: int = 4) -> DataFrame:
    """Deterministic ~``sample``-row subset WITHOUT ranking the full table:
    keep rows whose 20-bit instance-key hash falls below a cutoff sized
    from a cheap count, then order/limit only the ~1.3x-sample survivors.

    The previous implementation ranked every candidate row by ``_h`` to
    take the top ``sample`` (a cluster-wide top-k over the widest table in
    the job); here the heavy table only flows through a map-side filter,
    and the top-k sees a bounded subset (VERDICT r1 'what's wrong' #3).
    Callers should pass a persisted DataFrame — the sizing count and the
    final collect share the materialization."""
    h = F.pmod(F.xxhash64("url", "sent_id", "pair_idx", "is_reverse"),
               F.lit(1 << _HASH_BITS))
    total = df.count()
    if total <= sample:
        return df
    cutoff = int((1 << _HASH_BITS) * sample * oversample / total) + 1
    sub = df.withColumn("_h", h).filter(F.col("_h") < cutoff)
    for _ in range(max_iters):
        if cutoff >= (1 << _HASH_BITS) or sub.count() >= sample:
            break
        cutoff *= 2
        sub = df.withColumn("_h", h).filter(F.col("_h") < cutoff)
    return (sub.orderBy("_h", "url", "sent_id", "pair_idx", "is_reverse")
            .limit(sample).drop("_h"))


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
    inst = hash_range_sample(
        candidates.filter((~F.col("is_reverse")) | F.col("gene_to_gene")),
        sample,
    ).select("is_reverse", "pair_e1_ids", "pair_e2_ids",
             "dep_path_string", "sdp_words", "sdp_elements",
             "between_words")
    # Arrow-path collect (toPandas): row-at-a-time collect() pickles each
    # Row object — seconds slower at the 100k sample cap
    pdf = inst.toPandas()
    n = len(pdf)
    hits: list[list[int]] = []
    y = np.zeros((n, len(key_order)))
    cols = {"dep_word": "sdp_words", "element": "sdp_elements",
            "between": "between_words"}
    feats = {k: pdf[c] for k, c in cols.items()}
    for r in range(n):
        h = []
        i = idx["dep_path"].get(pdf["dep_path_string"].iat[r])
        if i is not None:
            h.append(i)
        for kind in cols:
            d = idx[kind]
            for f in set(feats[kind].iat[r]):
                j = d.get(f)
                if j is not None:
                    h.append(j)
        hits.append(h)
        combos = set(itertools.product(pdf["pair_e1_ids"].iat[r],
                                       pdf["pair_e2_ids"].iat[r]))
        fwd_l, rev_l = label_instance(combos, key_order, fwd_kb, rev_kb)
        y[r] = rev_l if pdf["is_reverse"].iat[r] else fwd_l
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


def _adam_step(state, grads, params, lr, t):
    b1, b2, eps = 0.9, 0.999, 1e-8
    for g, wt, m, v in zip(grads, params, state["m"], state["v"]):
        m *= b1; m += (1 - b1) * g
        v *= b2; v += (1 - b2) * g * g
        wt -= lr * (m / (1 - b1**t)) / (np.sqrt(v / (1 - b2**t)) + eps)


def fit_ff(hits, y, n_feat: int, hidden_array, epochs: int = EPOCHS,
           batch: int = BATCH, lr: float = LR, seed: int = SEED,
           keep_prob: float = 0.5):
    """General feed-forward training (tf_feed_forward.py:66-288):
    ``hidden_array`` ReLU layers with inverted dropout (keep_prob 0.5 at
    train, :194) + linear output, sigmoid cross-entropy reduce_mean, Adam
    defaults, all weights/biases init N(0, 0.1) (:150-158), no L2 (the FF
    graph has none — only the LSTM adds it).  Returns
    ``(layers, losses)`` where layers = [(W1,b1),...,(Wout,bout)]
    consumable by score_candidates via (idx, layers)."""
    rng = np.random.RandomState(seed)
    n, n_rel = y.shape
    dims = [n_feat] + list(hidden_array) + [n_rel]
    layers = [(rng.normal(0.0, 0.1, size=(dims[i], dims[i + 1])),
               rng.normal(0.0, 0.1, size=dims[i + 1]))
              for i in range(len(dims) - 1)]
    params = [p for wb in layers for p in wb]
    state = {"m": [np.zeros_like(p) for p in params],
             "v": [np.zeros_like(p) for p in params]}
    t = 0
    losses = []
    order = np.arange(n)
    for _ in range(epochs):
        rng.shuffle(order)
        ep_loss = 0.0
        for s in range(0, n, batch):
            sel = order[s:s + batch]
            bsz = len(sel)
            # first layer from sparse hit lists (multi-hot x W1)
            w1, b1 = layers[0]
            z = np.tile(b1, (bsz, 1))
            for r, i in enumerate(sel):
                if hits[i]:
                    z[r] += w1[hits[i]].sum(axis=0)
            acts = [z]        # pre-activations per layer
            drops = []        # dropout masks on hidden activations
            h = z
            for w, b in layers[1:]:
                a = np.maximum(h, 0.0)
                mask = (rng.random_sample(a.shape) < keep_prob) / keep_prob
                a = a * mask
                drops.append((a, mask))
                h = a @ w + b
                acts.append(h)
            p = 1.0 / (1.0 + np.exp(-np.clip(h, -60, 60)))
            ep_loss += float(
                -(y[sel] * np.log(p + 1e-12)
                  + (1 - y[sel]) * np.log(1 - p + 1e-12)).sum())
            # dL/dlogits for mean sigmoid-CE over all B*n_rel elements
            d = (p - y[sel]) / (bsz * n_rel)
            grads = [None] * len(layers)
            for li in range(len(layers) - 1, 0, -1):
                a_in, mask = drops[li - 1]
                w, b = layers[li]
                grads[li] = (a_in.T @ d, d.sum(axis=0))
                d = (d @ w.T) * mask * (acts[li - 1] > 0)
            gw1 = np.zeros_like(layers[0][0])
            for r, i in enumerate(sel):
                if hits[i]:
                    gw1[hits[i]] += d[r]
            grads[0] = (gw1, d.sum(axis=0))
            t += 1
            _adam_step(state, [g for wb in grads for g in wb], params, lr, t)
        losses.append(ep_loss / max(n, 1))
    return layers, losses


def train_model(candidates: DataFrame, vocabs: dict[str, set],
                key_order: list[str], fwd_kb, rev_kb,
                epochs: int = EPOCHS, sample: int = 100_000,
                hidden_array=()):
    """-> (weight_table for score_candidates(weight_table=...), losses).

    ``hidden_array=[]`` (the reference's shipped config) fits the logistic
    model and returns the legacy (idx, W, bias) triple; a non-empty stack
    (e.g. [256, 64]) fits the general ReLU+dropout network
    (tf_feed_forward.py:32-63) and returns (idx, layers)."""
    _, n_feat = _feature_index(vocabs)
    idx, hits, y = collect_training_set(candidates, vocabs, key_order,
                                        fwd_kb, rev_kb, sample)
    if hidden_array:
        layers, losses = fit_ff(hits, y, n_feat, hidden_array, epochs=epochs)
        return (idx, layers), losses
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


FF_WEIGHTS_SCHEMA = ("layer int, kind string, feature string, i int, "
                     "rel string, j int, weight double")


def ff_weights_to_df(spark, weight_table, key_order: list[str]) -> DataFrame:
    """Persist a general FF stack: layer-0 rows keyed by FEATURE STRING,
    output columns keyed by RELATION STRING (id-assignment independent,
    SURVEY.md §7.4.2); interior dims are structural integers."""
    from kgre.score import ff_layers

    idx, layers = ff_layers(weight_table)
    last = len(layers) - 1
    inv0 = [None] * layers[0][0].shape[0]
    for kind, d in idx.items():
        for feat, r in d.items():
            inv0[r] = (kind, feat)
    rows = []
    for li, (w, b) in enumerate(layers):
        for r in range(w.shape[0]):
            kind, feat, i = (("__dense__", "", r) if li
                             else (*inv0[r], -1))
            for c in range(w.shape[1]):
                rel, j = (key_order[c], -1) if li == last else ("", c)
                rows.append((li, kind, feat, i, rel, j, float(w[r, c])))
        for c in range(b.shape[0]):
            rel, j = (key_order[c], -1) if li == last else ("", c)
            rows.append((li, "__bias__", "", -1, rel, j, float(b[c])))
    return spark.createDataFrame(rows, FF_WEIGHTS_SCHEMA)


def ff_weights_from_df(df: DataFrame, vocabs: dict[str, set],
                       key_order: list[str]):
    """Inverse of ff_weights_to_df; layer-0 rows for features no longer in
    the vocab are dropped, new features get zero rows."""
    idx, n_feat = _feature_index(vocabs)
    rows = df.collect()
    n_layers = max(r["layer"] for r in rows) + 1
    kpos = {rel: k for k, rel in enumerate(key_order)}
    dout = {}
    for r in rows:
        c = kpos[r["rel"]] if r["j"] == -1 else r["j"]
        dout[r["layer"]] = max(dout.get(r["layer"], 0), c + 1)
    din = {0: n_feat}
    for li in range(1, n_layers):
        din[li] = dout[li - 1]
    layers = [(np.zeros((din[li], dout[li])), np.zeros(dout[li]))
              for li in range(n_layers)]
    for r in rows:
        li = r["layer"]
        c = kpos[r["rel"]] if r["j"] == -1 else r["j"]
        if r["kind"] == "__bias__":
            layers[li][1][c] = r["weight"]
        elif li == 0:
            ri = idx.get(r["kind"], {}).get(r["feature"])
            if ri is not None:
                layers[li][0][ri, c] = r["weight"]
        else:
            layers[li][0][r["i"], c] = r["weight"]
    return idx, layers


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
