"""LSTM scoring path (reference M3/M5/M6 + X11, SURVEY.md §2.10-2.11).

Mirrors the reference's tf_lstm graph (tf_lstm.py:160-229) as pure numpy
inside a ``mapInPandas`` stage over broadcast weights:

  * X11 encode (instances.py:199-219): SDP type list and lowercased SDP
    word list -> int id sequences padded to 100 with PADDING, unknown ->
    UNKNOWN; lengths appended.
  * embeddings (tf_lstm.py:160-188): word rows carry [emb_200 | zeros_50],
    dep rows carry [zeros_200 | emb_50]; the PADDING row of each table is
    all-zeros (the reference concats a zeros row last).
  * interleave (tf_lstm.py:194-195): sequence = word0, dep0, word1, dep1,
    ... reshaped to 200 steps of 250-d vectors; effective length =
    word_len + dep_len (tf_lstm.py:197) — the reference's quirk of mixing
    padded steps into the active window is preserved.
  * fused LSTM cell, state 250 (tf_lstm.py:205-210): gate order [i g f o]
    with forget_bias 1.0 (LSTMBlockFusedCell semantics); steps past the
    sequence length leave the state untouched.
  * dense 100 -> sigmoid multi-label (tf_lstm.py:214-229); triple emitted
    at prob > 0.5.

The reference ships no trained weights, so default weights are a frozen
deterministic function of (layer, shape key) — identical in the Spark
engine and the single-process oracle (tests/test_lstm.py checks the
batched forward against the per-instance oracle loop bit-for-bit within
float tolerance).  A real word2vec .bin drops in via kgre.w2v
(S8/M6, tf_lstm.py:13-48: same UNKNOWN/PADDING tail convention), and
trained weights via kgre.lstm_train's string-keyed weight table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from kgre.util import hfloats

WORD_DIM = 200
DEP_DIM = 50
STATE = WORD_DIM + DEP_DIM          # 250 (tf_lstm.py:205)
HIDDEN = 100
PAD_LEN = 100
SEQ = 2 * PAD_LEN                   # 200 interleaved steps
_W_SCALE = 0.08

LSTM_TRIPLES_SCHEMA = (
    "url string, sent_id int, pair_idx int, is_reverse boolean, "
    "subj string, obj string, rel string, prob double"
)


# ------------------------------------------------------------- vocabularies


def lstm_vocabs(type_features, word_features):
    """(dep_type_vocab, word_vocab): {feature: id} with UNKNOWN/PADDING
    appended last (load_data.py:605-610; ids by (count-ish) sorted order is
    irrelevant here — the engine keys weights by feature string, so plain
    sorted order is used for determinism)."""
    dep = {f: i for i, f in enumerate(sorted(set(type_features)))}
    word = {f.lower(): None for f in word_features}
    word = {f: i for i, f in enumerate(sorted(word))}
    for d in (dep, word):
        n = len(d)
        d["UNKNOWN_WORD"] = n
        d["PADDING_WORD"] = n + 1
    return dep, word


def lstm_vocab_features(candidates: DataFrame, max_words: int = 500_000,
                        w2v_words=None):
    """Bounded distributed LSTM vocab build (load_data.py:605-616).

    The reference's LSTM vocab min-count is 0 (load_data.py:605-610), so
    a naive ``distinct().collect()`` drags every distinct corpus word to
    the driver — unbounded at corpus scale (472k words already at the
    5M-page stress run).  Instead: aggregate counts distributedly
    (map-side partial agg), optionally left-semi-join against the
    word2vec vocabulary (the embedding table bounds the usable words
    anyway; everything else scores as UNKNOWN, tf_lstm.py:42-48), and
    collect only the top ``max_words`` lowercased words by
    (count desc, word asc).  Dep types are a closed set (dozens) and
    collected whole.  Returns (dep_vocab, word_vocab) like
    ``lstm_vocabs``."""
    from pyspark.sql import functions as F

    spark = candidates.sparkSession
    types = [r["f"] for r in candidates.select(
        F.explode("sdp_types").alias("f")).distinct().collect()]
    words = (candidates.select(F.explode("sdp_words").alias("w"))
             .select(F.lower("w").alias("f"))
             .groupBy("f").agg(F.count("*").alias("cnt")))
    if w2v_words is not None:
        w2v_df = spark.createDataFrame(
            [(w.lower(),) for w in w2v_words], "f string").distinct()
        words = words.join(F.broadcast(w2v_df), "f", "left_semi")
    top = (words.orderBy(F.desc("cnt"), F.asc("f"))
           .limit(int(max_words)).collect())
    return lstm_vocabs(types, [r["f"] for r in top])


def encode_instance(sdp_types, sdp_words, dep_vocab, word_vocab):
    """X11: -> (type_ids[100], word_ids[100], len_types, len_words)."""
    t_ids = [dep_vocab["PADDING_WORD"]] * PAD_LEN
    w_ids = [word_vocab["PADDING_WORD"]] * PAD_LEN
    unk_t, unk_w = dep_vocab["UNKNOWN_WORD"], word_vocab["UNKNOWN_WORD"]
    for i, t in enumerate(sdp_types[:PAD_LEN]):
        t_ids[i] = dep_vocab.get(t, unk_t)
    for i, w in enumerate(sdp_words[:PAD_LEN]):
        w_ids[i] = word_vocab.get(w.lower(), unk_w)
    return t_ids, w_ids, min(len(sdp_types), PAD_LEN), min(len(sdp_words), PAD_LEN)


# ------------------------------------------------------------------ weights


def embedding_tables(dep_vocab, word_vocab):
    """Embedding matrices with the reference's zeros-PADDING-row tail
    (tf_lstm.py:162-163, :185-186)."""
    n_dep, n_word = len(dep_vocab), len(word_vocab)
    dep_emb = np.empty((n_dep, DEP_DIM))
    for f, i in dep_vocab.items():
        dep_emb[i] = hfloats("demb|" + f, DEP_DIM) * _W_SCALE
    dep_emb[dep_vocab["PADDING_WORD"]] = 0.0
    word_emb = np.empty((n_word, WORD_DIM))
    for f, i in word_vocab.items():
        word_emb[i] = hfloats("wemb|" + f, WORD_DIM) * _W_SCALE
    word_emb[word_vocab["PADDING_WORD"]] = 0.0
    return dep_emb, word_emb


def lstm_weights(key_order):
    """Frozen deterministic cell + dense weights (keyed by relation string
    for the output layer, never by dense id)."""
    kernel = hfloats("lstm|kernel", (STATE + STATE) * 4 * STATE).reshape(
        STATE + STATE, 4 * STATE) * _W_SCALE
    bias = hfloats("lstm|bias", 4 * STATE) * _W_SCALE
    w1 = hfloats("lstm|dense1", STATE * HIDDEN).reshape(STATE, HIDDEN) * _W_SCALE
    b1 = hfloats("lstm|bias1", HIDDEN) * _W_SCALE
    w2 = np.stack([hfloats("lstm|out|" + rel, HIDDEN) for rel in key_order],
                  axis=1) * _W_SCALE
    b2 = (hfloats("lstm|outb", len(key_order))
          if key_order else np.zeros(0)) * _W_SCALE
    return {"kernel": kernel, "bias": bias, "w1": w1, "b1": b1,
            "w2": w2, "b2": b2}


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))


def lstm_forward_batch(seq, seq_len, weights):
    """Batched fused-LSTM forward: seq [B, SEQ, STATE], seq_len [B] ->
    final hidden state [B, STATE].  Gate order [i g f o], forget_bias 1.0;
    steps at or past seq_len leave c/h untouched (fused-cell
    sequence_length semantics)."""
    kernel, bias = weights["kernel"], weights["bias"]
    n = seq.shape[0]
    c = np.zeros((n, STATE))
    h = np.zeros((n, STATE))
    max_t = int(seq_len.max()) if n else 0
    for t in range(min(max_t, seq.shape[1])):
        active = (seq_len > t)[:, None]
        z = np.concatenate([seq[:, t, :], h], axis=1) @ kernel + bias
        i = _sigmoid(z[:, 0:STATE])
        g = np.tanh(z[:, STATE:2 * STATE])
        f = _sigmoid(z[:, 2 * STATE:3 * STATE] + 1.0)
        o = _sigmoid(z[:, 3 * STATE:4 * STATE])
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        c = np.where(active, c_new, c)
        h = np.where(active, h_new, h)
    return h


def lstm_logits(h, weights):
    hidden = h @ weights["w1"] + weights["b1"]
    return hidden @ weights["w2"] + weights["b2"]


# ----------------------------------------------------------------- scoring


def score_candidates_lstm(candidates: DataFrame, dep_vocab, word_vocab,
                          key_order, params=None) -> DataFrame:
    """candidates -> per-(instance x relation) LSTM probabilities.
    Everything ships once per executor as a broadcast; the UDF is pure
    batched numpy (no per-row Python beyond the id encode).

    ``params``: optional trained weight dict from kgre.lstm_train (M4) —
    keys word_emb/dep_emb/kernel/bias/w1/b1/w2/b2; defaults to the frozen
    deterministic weights + embedding tables."""
    spark = candidates.sparkSession
    if params is None:
        dep_emb, word_emb = embedding_tables(dep_vocab, word_vocab)
        weights = lstm_weights(key_order)
    else:
        dep_emb, word_emb = params["dep_emb"], params["word_emb"]
        weights = {k: params[k] for k in ("kernel", "bias", "w1", "b1",
                                          "w2", "b2")}
    b = spark.sparkContext.broadcast({
        "dep_vocab": dep_vocab, "word_vocab": word_vocab,
        "dep_emb": dep_emb, "word_emb": word_emb,
        "weights": weights, "key_order": key_order,
    })
    n_rel = len(key_order)

    # the seq tensor is the memory hot spot: a full Arrow batch padded to
    # SEQ=200 steps is ~1.6 GB at 4096 rows x 200 x 250 float64, PER
    # python worker.  Process fixed-size row chunks and size the buffer
    # to the chunk's true max step count (SDP sequences are almost always
    # far shorter than the 100-token pad) — peak drops to
    # CHUNK x 2*ceil(max_len/2) x 250.
    CHUNK = 256

    def run(batches):
        st = b.value
        dv, wv = st["dep_vocab"], st["word_vocab"]
        de, we = st["dep_emb"], st["word_emb"]
        weights, keys = st["weights"], st["key_order"]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            for lo in range(0, n, CHUNK):
                part = pdf.iloc[lo:lo + CHUNK]
                k = len(part)
                t_ids = np.empty((k, PAD_LEN), dtype=np.int64)
                w_ids = np.empty((k, PAD_LEN), dtype=np.int64)
                lens = np.empty(k, dtype=np.int64)
                for r, (types, words) in enumerate(zip(part["sdp_types"],
                                                       part["sdp_words"])):
                    ti, wi, lt, lw = encode_instance(list(types),
                                                     list(words), dv, wv)
                    t_ids[r], w_ids[r] = ti, wi
                    lens[r] = lt + lw
                # word steps: [emb | 0]; dep steps: [0 | emb]; interleaved;
                # buffer covers only the chunk's effective window (rounded
                # up to a whole word/dep step pair)
                half = min(PAD_LEN, (int(lens.max()) + 1) // 2) if k else 0
                seq = np.zeros((k, 2 * half, STATE))
                seq[:, 0::2, :WORD_DIM] = we[w_ids[:, :half]]
                seq[:, 1::2, WORD_DIM:] = de[t_ids[:, :half]]
                h = lstm_forward_batch(seq, lens, weights)
                probs = _sigmoid(lstm_logits(h, weights))
                out = pd.DataFrame({
                    "url": np.repeat(part["url"].to_numpy(), n_rel),
                    "sent_id": np.repeat(part["sent_id"].to_numpy(), n_rel),
                    "pair_idx": np.repeat(part["pair_idx"].to_numpy(), n_rel),
                    "is_reverse": np.repeat(part["is_reverse"].to_numpy(),
                                            n_rel),
                    "subj": np.repeat(part["subj"].to_numpy(), n_rel),
                    "obj": np.repeat(part["obj"].to_numpy(), n_rel),
                    "rel": np.tile(np.array(keys, dtype=object), k),
                    "prob": probs.ravel(),
                })
                yield out

    from pyspark.sql import functions as F
    # explicit projection: mapInPandas ships every input column through
    # Arrow — keep sentence text and unused feature columns off the
    # boundary
    scorable = candidates.filter(
        (~F.col("is_reverse")) | F.col("gene_to_gene")
    ).select("url", "sent_id", "pair_idx", "is_reverse", "subj", "obj",
             "sdp_types", "sdp_words")
    return scorable.mapInPandas(run, schema=LSTM_TRIPLES_SCHEMA)


# ------------------------------------------------------------------ oracle


def oracle_score_instance(sdp_types, sdp_words, dep_vocab, word_vocab,
                          dep_emb, word_emb, weights):
    """Single-instance, per-step forward (independent code path from the
    batched kernel; used by tests to validate the batch math)."""
    t_ids, w_ids, lt, lw = encode_instance(sdp_types, sdp_words,
                                           dep_vocab, word_vocab)
    c = np.zeros(STATE)
    h = np.zeros(STATE)
    kernel, bias = weights["kernel"], weights["bias"]
    for t in range(lt + lw):
        if t % 2 == 0:
            x = np.concatenate([word_emb[w_ids[t // 2]], np.zeros(DEP_DIM)])
        else:
            x = np.concatenate([np.zeros(WORD_DIM), dep_emb[t_ids[t // 2]]])
        z = np.concatenate([x, h]) @ kernel + bias
        i = _sigmoid(z[0:STATE])
        g = np.tanh(z[STATE:2 * STATE])
        f = _sigmoid(z[2 * STATE:3 * STATE] + 1.0)
        o = _sigmoid(z[3 * STATE:4 * STATE])
        c = f * c + i * g
        h = o * np.tanh(c)
    hidden = h @ weights["w1"] + weights["b1"]
    return _sigmoid(hidden @ weights["w2"] + weights["b2"])
