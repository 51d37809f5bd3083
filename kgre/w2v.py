"""S8: real word2vec .bin loader (reference ``load_bin_vec``,
tf_lstm.py:13-48) — binary word2vec format: an ascii header
``"<vocab_size> <dim>\\n"``, then per entry the word bytes terminated by
``' '`` (newlines skipped) followed by ``dim`` little-endian float32s.

Faithful to the reference conventions:
  * UNKNOWN_WORD appended with a random vector, PADDING_WORD with zeros,
    in that order, ids ``n`` and ``n+1`` (tf_lstm.py:40-46) — the same
    tail convention as the deterministic stand-in tables in kgre/lstm.py,
    so a real PubMed-w2v.bin drops in wherever ``embedding_tables`` was
    used (M6).
  * the UNKNOWN row is random; here it is DETERMINISTIC (hfloats keyed by
    the word) so pipeline re-runs score identically — the reference's
    np.random.rand made it run-dependent.

Driver-side by design: the embedding matrix is dictionary-sized and is
broadcast into the scoring UDF (SURVEY.md §2.1 S8).
"""

from __future__ import annotations

import numpy as np

from kgre.util import hfloats


def load_bin_vec(fname: str):
    """-> (words, vectors ndarray [n+2, dim], {word: index}) with the
    UNKNOWN/PADDING tail rows appended."""
    words: list[str] = []
    vecs: list[np.ndarray] = []
    word_dict: dict[str, int] = {}
    with open(fname, "rb") as f:
        header = f.readline()
        vocab_size, dim = map(int, header.split())
        binary_len = np.dtype("float32").itemsize * dim
        for index in range(vocab_size):
            chars = []
            while True:
                ch = f.read(1)
                if ch == b" ":
                    break
                if ch == b"":
                    raise ValueError("truncated word2vec file: %s" % fname)
                if ch != b"\n":
                    chars.append(ch)
            word = b"".join(chars).decode("utf-8", errors="replace")
            vecs.append(np.frombuffer(f.read(binary_len), dtype="<f4")
                        .astype(np.float64))
            words.append(word)
            word_dict[word] = index
    n = len(words)
    words.append("UNKNOWN_WORD")
    words.append("PADDING_WORD")
    word_dict["UNKNOWN_WORD"] = n
    word_dict["PADDING_WORD"] = n + 1
    vecs.append((hfloats("w2v|UNKNOWN_WORD", dim) + 1.0) / 2.0)  # ~rand()
    vecs.append(np.zeros(dim))
    return words, np.stack(vecs), word_dict


def write_bin_vec(fname: str, words, vectors) -> None:
    """Write the word2vec binary format (test fixtures; inverse of
    load_bin_vec minus the UNKNOWN/PADDING tail)."""
    vectors = np.asarray(vectors, dtype="<f4")
    with open(fname, "wb") as f:
        f.write(b"%d %d\n" % (len(words), vectors.shape[1]))
        for w, v in zip(words, vectors):
            f.write(w.encode("utf-8") + b" ")
            f.write(v.tobytes())


def embedding_tables_from_bin(fname: str, word_vocab: dict,
                              dep_vocab: dict, dep_dim: int):
    """M6: map a loaded .bin onto the pipeline's word vocab: vocab words
    found in the .bin take their pretrained row, missing words take the
    UNKNOWN row, PADDING stays zeros (load_data.py:611-616 semantics).
    Dep-type embeddings stay the deterministic tables (the reference
    trains those from scratch).  Returns (dep_emb, word_emb) shaped like
    kgre.lstm.embedding_tables."""
    from kgre.lstm import embedding_tables

    _, vecs, w2i = load_bin_vec(fname)
    dep_emb, word_emb = embedding_tables(dep_vocab, word_vocab)
    dim = vecs.shape[1]
    if dim != word_emb.shape[1]:
        raise ValueError("embedding dim %d != expected %d"
                         % (dim, word_emb.shape[1]))
    unk = vecs[w2i["UNKNOWN_WORD"]]
    for word, i in word_vocab.items():
        if word == "PADDING_WORD":
            continue  # stays zeros
        j = w2i.get(word)
        word_emb[i] = vecs[j] if j is not None else unk
    return dep_emb, word_emb
