"""Frozen scoring model: multi-label logistic regression.

The reference's shipped configuration is ``hidden_array=[]``
(``relation_extraction.py:405``), i.e. the feed-forward network
(``tf_feed_forward.py:32-63``) degenerates to per-relation logistic
regression ``sigmoid(x . W + b)`` over binary features.  Training stays
out of the Spark hot path (SURVEY.md §2.10): the model here is a frozen,
deterministic weight assignment **keyed by feature string** — never by
dense vocabulary id — so scores are independent of id-assignment order
(SURVEY.md §7.4 item 2).

Feature kinds mirror ``Instance.build_features`` (``instances.py:171-196``):
  dep_path   : the whole dependency-type path string, exact-match one-hot
  dep_word   : set of masked lemmas interior to the SDP
  element    : word+deptype+word strings per SDP edge
  between    : set of masked lemmas strictly between the entity pair

A feature contributes only when present in the trained vocabulary
(min-count pruning, ``load_data.py:106-131``).
"""

from __future__ import annotations

from kgre.util import hunif

KINDS = ("dep_path", "dep_word", "element", "between")

_W_SCALE = 0.9


def feature_weight(kind: str, rel: str, feature: str) -> float:
    """Deterministic weight in (-0.9, 0.9) for (kind, rel, feature)."""
    return (hunif("w|%s|%s|%s" % (kind, rel, feature)) * 2.0 - 1.0) * _W_SCALE


def bias(rel: str) -> float:
    return (hunif("b|%s" % rel) * 2.0 - 1.0) * 0.5 - 0.2


def score_logit(
    rel: str,
    dep_path_string: str,
    dep_words: list,
    elements: list,
    between_words: list,
    vocabs: dict,
) -> float:
    """Logit for one instance and one relation.

    ``vocabs`` maps kind -> set of in-vocabulary feature strings.  Set
    semantics (each distinct present feature counts once) mirror the
    intersection logic of ``instances.py:177-196``.
    """
    z = bias(rel)
    if dep_path_string in vocabs["dep_path"]:
        z += feature_weight("dep_path", rel, dep_path_string)
    for f in set(dep_words) & vocabs["dep_word"]:
        z += feature_weight("dep_word", rel, f)
    for f in set(elements) & vocabs["element"]:
        z += feature_weight("element", rel, f)
    for f in set(between_words) & vocabs["between"]:
        z += feature_weight("between", rel, f)
    return z
