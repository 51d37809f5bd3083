"""K-fold cross-validation by document id (reference
``cross_validation.py:11-106``).

The reference module documents the intended evaluation protocol but is
DEAD CODE — it calls ``feed_forward_train``/``neural_network_test_tfrecord``
with signatures that no longer exist (SURVEY.md §5.1).  This module
implements the protocol it intended, working:

  * folds are CONTIGUOUS chunks of the pmid list, chunk length
    ``len // k`` (cross_validation.py:14-16); when ``len % k != 0`` the
    remainder forms extra chunk(s) that are never a test fold and always
    train — the reference's quirk, preserved;
  * per fold, the feature dictionaries are rebuilt from the TRAINING
    sentences only (cross_validation.py:38-45 — no vocab leakage), the
    model is trained on the training folds and applied to the held-out
    fold;
  * per-relation F1 against the distant labels per epoch/fold
    (tf_feed_forward.py:235-240 semantics) comes back as a DataFrame.

Spark shape: the candidates table is computed ONCE and persisted; each
fold is a pair of url-membership filters over it (broadcast literal
list), one vocab aggregation over the training side, a driver-side fit
(kgre/train.py — deliberately off the hot path) and one distributed
scoring pass over the held-out side.  At corpus scale prefer the J5
hash-fold split (``pmod(xxhash64(url), k)``) — list-chunk folds exist
for reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgre import train as train_mod
from kgre.score import score_candidates
from kgre.vocab import build_vocab, collect_vocab_sets


def pmid_fold_chunks(pmids: list, k: int) -> list[list]:
    """cross_validation.py:14-16: ``[pmids[i:i+n//k] for i in
    range(0, n, n//k)]`` — contiguous chunks; may yield MORE than k
    chunks (the tail never becomes a test fold)."""
    n = len(pmids)
    length = max(1, n // k)
    return [pmids[i:i + length] for i in range(0, n, length)]


def fold_f1(scored: DataFrame, fold: int) -> DataFrame:
    """(fold, rel, tp, fp, fn, f1) against distant labels at the 0.5
    class threshold (tf_feed_forward.py:163, :235-240)."""
    agg = scored.groupBy("rel").agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("prob") > 0.5), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("prob") > 0.5), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("prob") <= 0.5), 1)
              .otherwise(0)).alias("fn"),
    )
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    return agg.select(
        F.lit(fold).alias("fold"), "rel", "tp", "fp", "fn",
        F.when(denom > 0, F.round(2.0 * F.col("tp") / denom, 4))
        .otherwise(F.lit(0.0)).alias("f1"))


def k_fold_cv(candidates: DataFrame, k: int, key_order, fwd_kb, rev_kb,
              occur_count: int = 5, epochs: int = 40,
              sample: int = 100_000) -> DataFrame:
    """candidates -> per-(fold, relation) F1 DataFrame.

    ``candidates`` should be persisted by the caller (each fold filters
    it twice)."""
    spark = candidates.sparkSession
    pmids = [r["url"] for r in
             candidates.select("url").distinct().orderBy("url").collect()]
    if len(pmids) < k:
        raise ValueError(
            f"k_fold_cv: need at least k={k} distinct documents, "
            f"got {len(pmids)}")
    chunks = pmid_fold_chunks(pmids, k)
    results = None
    for fold in range(k):
        test_set = set(chunks[fold])
        is_test = F.col("url").isin(sorted(test_set))
        train_c = candidates.filter(~is_test)
        test_c = candidates.filter(is_test)
        # per-fold dictionaries from TRAINING sentences only
        vocabs = collect_vocab_sets(build_vocab(train_c, occur_count))
        wt, _ = train_mod.train_model(train_c, vocabs, key_order, fwd_kb,
                                      rev_kb, epochs=epochs, sample=sample)
        scored = score_candidates(test_c, vocabs, key_order, fwd_kb,
                                  rev_kb, weight_table=wt)
        r = fold_f1(scored, fold)
        results = r if results is None else results.union(r)
    return results
