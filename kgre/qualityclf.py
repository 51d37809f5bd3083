"""Reference-vs-corpus quality classification (engine extension): the
"quality classifier" stage of the GPT-3/LLaMA-style pipelines (Brown et
al. 2020 Appendix A: score every crawl page by a classifier trained to
separate a trusted reference corpus from raw crawl; keep high scorers).

Instead of an SGD-trained fastText model (opaque weights, not
reproducible cross-engine), the classifier here is the closed-form
naive-Bayes/log-odds token model: every token's weight is the smoothed
log-odds of appearing in the reference corpus versus the background
corpus, and a document scores the MEAN weight of its tokens.  That is
exactly the linear scorer a bag-of-words classifier learns, but every
weight is a ratio of integer counts — DuckDB recomputes identical
scores, so the whole stage is value-oracle-checkable.

Scale shape: training is two partial-agg token counts (vocabulary-sized
output) + one full-outer join by token; scoring joins the token stream
against the weight table by key (broadcast when the vocabulary is
small) and rolls up per doc.  Zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "")
    return docs.select("doc_id", F.explode(toks).alias("t"))


def train_log_odds(ref_docs: DataFrame, bg_docs: DataFrame,
                   alpha: float = 1.0, text_col: str = "text"
                   ) -> tuple[DataFrame, DataFrame]:
    """Closed-form classifier "training": per-token smoothed log-odds
    ``w(t) = ln((c_ref+α)/(N_ref+αV)) − ln((c_bg+α)/(N_bg+αV))`` over
    the union vocabulary V.  Returns ``(weights(t, w), unseen(w_unseen)
    — one row)``; tokens absent from both corpora at score time get the
    constant ``w_unseen = ln((N_bg+αV)/(N_ref+αV))``."""
    rc = _token_stream(ref_docs, text_col).groupBy("t") \
        .agg(F.count("*").alias("cr"))
    bc = _token_stream(bg_docs, text_col).groupBy("t") \
        .agg(F.count("*").alias("cb"))
    from kgre.session import stage_checkpoint
    joined = (rc.join(bc, "t", "full_outer")
              .select("t",
                      F.coalesce("cr", F.lit(0)).alias("cr"),
                      F.coalesce("cb", F.lit(0)).alias("cb")))
    # the count table is referenced three times downstream (weights, the
    # scalars inside weights, the scalars inside unseen) and Spark does
    # not share common subplans — without this cut the scoring query
    # recomputes BOTH corpus token-count aggregations three times (r6:
    # 6 corpus-stream aggs -> 2).  The table is vocabulary-sized (it IS
    # the model), so the lazy checkpoint stores a dictionary, not a
    # corpus; first action materializes it, every reference reuses the
    # blocks.
    joined = stage_checkpoint(joined, eager=False)
    scal = joined.agg(F.sum("cr").alias("nr"), F.sum("cb").alias("nb"),
                      F.count("*").alias("v"))
    a = F.lit(float(alpha))
    weights = (joined.crossJoin(F.broadcast(scal))
               .select("t",
                       (F.log((F.col("cr") + a)
                              / (F.col("nr") + a * F.col("v")))
                        - F.log((F.col("cb") + a)
                                / (F.col("nb") + a * F.col("v"))))
                       .alias("w")))
    unseen = scal.select(
        F.log((F.col("nb") + a * F.col("v"))
              / (F.col("nr") + a * F.col("v"))).alias("w_unseen"))
    return weights, unseen


def log_odds_score(docs: DataFrame, weights: DataFrame,
                   unseen: DataFrame, text_col: str = "text"
                   ) -> DataFrame:
    """Per-doc mean token log-odds under the trained table: positive =
    reference-like, negative = background-like.  Returns ``(doc_id,
    n_tokens, quality_lr)``; zero-token docs emit no row."""
    # the weight table IS the trained model — vocabulary-sized and
    # bounded like any model artifact, exactly like the flagship's
    # broadcast weight table.  Without the hint the planner's estimates
    # chose a sort-merge join here, which shuffles the ENTIRE corpus
    # token stream by token (r6; guide §3.1) — the one scale-killer in
    # this stage.  For an unbounded raw-token vocabulary, prune the
    # table by min count before scoring rather than shuffling the
    # stream.
    scored = (_token_stream(docs, text_col)
              .join(F.broadcast(weights), "t", "left")
              .crossJoin(F.broadcast(unseen))
              .select("doc_id",
                      F.coalesce(F.col("w"), F.col("w_unseen"))
                      .alias("w")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("w"), 4).alias("quality_lr")))
