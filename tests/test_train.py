"""Offline training (M2): Adam logistic fit on distantly-labeled
candidates — loss decreases, the trained model predicts distant labels far
better than the frozen init, and the persisted weight table round-trips."""

import numpy as np

from kgre import kb as kbmod
from kgre import synthgen, train
from kgre.pipeline import pages_to_candidates
from kgre.score import emitted_triples, score_candidates
from kgre.vocab import build_vocab, collect_vocab_sets


def _setup(spark, n_pages=150):
    pages = synthgen.pages_df(spark, n_pages)
    stop = synthgen.stop_entity_ids()
    cands = pages_to_candidates(pages, "GENE", "ONTOLOGY", stop).persist()
    vocabs = collect_vocab_sets(build_vocab(cands, 2))
    closure = kbmod.ontology_closure_dict(synthgen.ontology_rows())
    fwd, rev = kbmod.load_kb_sets(synthgen.kb_rows(), closure)
    return cands, vocabs, sorted(fwd), fwd, rev


def test_training_reduces_loss_and_beats_frozen_model(spark):
    cands, vocabs, key_order, fwd, rev = _setup(spark)
    wt, losses = train.train_model(cands, vocabs, key_order, fwd, rev,
                                   epochs=40)
    assert losses[-1] < losses[0] * 0.7, "loss must drop substantially"

    def f1_vs_distant(weight_table):
        scored = score_candidates(cands, vocabs, key_order, fwd, rev,
                                  weight_table=weight_table)
        agg = scored.selectExpr(
            "sum(case when label = 1 and prob > 0.5 then 1 else 0 end) tp",
            "sum(case when label = 0 and prob > 0.5 then 1 else 0 end) fp",
            "sum(case when label = 1 and prob <= 0.5 then 1 else 0 end) fn",
        ).collect()[0]
        denom = 2 * agg["tp"] + agg["fp"] + agg["fn"]
        return 2.0 * agg["tp"] / denom if denom else 0.0

    trained_f1 = f1_vs_distant(wt)
    frozen_f1 = f1_vs_distant(None)
    # the synthetic distant labels hinge on entity IDs, which SDP features
    # deliberately mask — so absolute F1 is capped; what training must
    # show is a large improvement over the frozen init
    assert trained_f1 > 1.5 * frozen_f1, (trained_f1, frozen_f1)
    assert trained_f1 > 0.25, trained_f1
    cands.unpersist()


def test_weight_table_roundtrip(spark):
    cands, vocabs, key_order, fwd, rev = _setup(spark, n_pages=60)
    wt, _ = train.train_model(cands, vocabs, key_order, fwd, rev, epochs=5)
    df = train.weights_to_df(spark, wt, key_order)
    idx2, w2, b2 = train.weights_from_df(df, vocabs, key_order)
    idx, w, b = wt
    np.testing.assert_allclose(w2, w, atol=1e-12)
    np.testing.assert_allclose(b2, b, atol=1e-12)
    assert idx2 == idx
    # triples scored through the round-tripped table are identical
    a = emitted_triples(score_candidates(cands, vocabs, key_order, fwd, rev,
                                         weight_table=wt)).count()
    b_ = emitted_triples(score_candidates(cands, vocabs, key_order, fwd, rev,
                                          weight_table=(idx2, w2, b2))).count()
    assert a == b_
    cands.unpersist()
