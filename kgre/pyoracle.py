"""Single-process oracle: a faithful transliteration of the reference
semantics, used as (a) the correctness oracle for the P/R >= 0.95 parity
gate and (b) the single-node throughput baseline (BASELINE.md — the
reference publishes no numbers, so the oracle's triples/sec on the same
corpus is the measured stand-in).

Every method mirrors a reference code path (cited file:line into
/root/reference/relation_extraction/).  This module is deliberately
row-at-a-time and driver-local, like the reference; the Spark pipeline in
kgre/{parse,candidates,kb,vocab,score}.py is an independent vectorized
implementation checked against this one in tests/.
"""

from __future__ import annotations

import itertools
from collections import Counter

from kgre import nlp
from kgre.model import KINDS, score_logit
from kgre.util import sigmoid

_INF = 1 << 60


# --------------------------------------------------------------- sentence


class OSentence:
    """Mirror of Sentence (sentence_structure.py:67-197)."""

    def __init__(self, pmid: str, sent_id: int, tokens: list[dict], deps: list[dict]):
        self.pmid = pmid
        self.sentence_id = sent_id
        # ROOT token at index 0 (sentence_structure.py:80-81)
        self.tokens = [
            {"id": 0, "word": "ROOT", "lemma": "ROOT", "pos": None, "ner": None,
             "norm_ner": None}
        ] + tokens
        self.entities: dict[str, list[list[int]]] = {}
        self.pairs = None
        self.deps = deps
        self.matrix = None
        for t in tokens:
            self._add_token_entities(t)
        self._build_dependency_matrix()

    def _add_token_entities(self, token: dict) -> None:
        """Mention chunking (sentence_structure.py:86-104): consecutive
        tokens with identical (string-equal) norm_ner merge; pipe-split
        NER registers the token under every type."""
        # previous token in add order is tokens[id-1] (ROOT for the first
        # real token), matching get_last_token() at sentence_structure.py:88
        previous = self.tokens[token["id"] - 1]
        for ner in (token["ner"] or "").split("|"):
            lst = self.entities.setdefault(ner, [])
            if token["norm_ner"] is not None:
                if token["norm_ner"] != previous["norm_ner"]:
                    lst.append([token["id"]])
                elif lst:
                    lst[-1].append(token["id"])
                else:
                    lst.append([token["id"]])
            else:
                lst.append([token["id"]])

    def _build_dependency_matrix(self) -> None:
        """sentence_structure.py:177-186 — forward cell overwritten
        unconditionally; reverse '-'+type only fills empty cells; edge
        iteration order therefore matters."""
        n = len(self.tokens)
        m = [["" for _ in range(n)] for _ in range(n)]
        for d in self.deps:
            g, dp, t = d["gov"], d["dep"], d["type"]
            m[g][dp] = t
            if m[dp][g] == "":
                m[dp][g] = "-" + t
        self.matrix = m

    def get_dependency_index(self, entity_list) -> int:
        """Most-connected token of a mention (sentence_structure.py:113-122);
        first max wins, iteration order supplied by caller (forward or
        reversed)."""
        count, index = -1, -1
        for l in entity_list:
            dep_sum = sum(a != "" for a in self.matrix[l])
            if dep_sum > count:
                count, index = dep_sum, l
        return index

    def generate_entity_pairs(self, type1: str, type2: str) -> None:
        """sentence_structure.py:124-152.  Substring NER-type match; pair
        endpoints = (between-boundary token, most-connected token)."""
        t1 = sorted(e for e in self.entities if type1 in e)
        t2 = sorted(e for e in self.entities if type2 in e)
        if t1 and t2:
            self.pairs = []
            for z in itertools.product(t1, t2):
                for pair in itertools.product(self.entities[z[0]], self.entities[z[1]]):
                    if pair[0] == pair[1]:
                        continue
                    if max(pair[0]) > max(pair[1]):
                        p0 = (pair[0][0], self.get_dependency_index(pair[0]))
                        p1 = (pair[1][-1], self.get_dependency_index(reversed(pair[1])))
                    else:
                        p0 = (pair[0][-1], self.get_dependency_index(reversed(pair[0])))
                        p1 = (pair[1][0], self.get_dependency_index(pair[1]))
                    self.pairs.append((p0, p1))
        else:
            self.pairs = None


# ---------------------------------------------------------------- dijkstra


def dijkstra(matrix, source: int) -> list[int]:
    """Transliteration of instances.py:4-26 — unit weights, node selection
    = lowest index among minimum distance, strict relaxation (so a node's
    parent is its lowest-index neighbor in the previous BFS level)."""
    n = len(matrix)
    distance = [_INF] * n
    previous = [-1] * n
    distance[source] = 0
    unreached = list(range(n))
    while unreached:
        u = distance.index(min(distance))
        if distance[u] == _INF:
            break
        unreached.remove(u)
        for v in unreached:
            if matrix[u][v] != "":
                alt = distance[u] + 1
                if alt < distance[v]:
                    distance[v] = alt
                    previous[v] = u
        distance[u] = _INF
    return previous


# ---------------------------------------------------------------- instance


def _mask(token: dict, word: str) -> str:
    """Entity masking (instances.py:111-128, :155-161)."""
    if token["norm_ner"] is not None:
        if "GENE" in token["ner"]:
            return "GENE"
        if "ONTOLOGY" in token["ner"]:
            return "ONTOLOGY"
        return token["ner"]
    return word


class OInstance:
    """Mirror of Instance (instances.py:31-196)."""

    def __init__(self, sentence: OSentence, start, end, label):
        self.sentence = sentence
        self.start = start
        self.end = end
        self.label = list(label)
        self.between_words = self._build_between()
        self.path_indexes = self._build_path_indexes()
        (
            self.dependency_path_string,
            self.dependency_path_list,
            self.dependency_words,
            self.dependency_elements,
        ) = self._build_feature_elements()

    def _build_between(self) -> list[str]:
        """instances.py:150-163 (lemma-masked words strictly between)."""
        out = []
        for i in range(min(self.start[0], self.end[0]) + 1,
                       max(self.start[0], self.end[0])):
            tok = self.sentence.tokens[i]
            out.append(_mask(tok, tok["lemma"]))
        return out

    def _build_path_indexes(self) -> list[int]:
        """instances.py:80-91."""
        source, target = self.start[1], self.end[1]
        previous = dijkstra(self.sentence.matrix, source)
        if previous[target] == -1:
            return []
        prev = previous[target]
        path = [prev, target]
        while prev != source:
            prev = previous[prev]
            path.insert(0, prev)
        return path

    def _build_feature_elements(self):
        """instances.py:99-137 — type path, masked word path with
        START/END_ENTITY overrides, word+type+word elements; interior
        word path = word_path[1:-1]."""
        path_elements, type_path, word_path = [], [], []
        idx = self.path_indexes
        for i in range(len(idx) - 1):
            a, b = idx[i], idx[i + 1]
            dep_type = self.sentence.matrix[a][b]
            ta, tb = self.sentence.tokens[a], self.sentence.tokens[b]
            start_word = _mask(ta, ta["lemma"])
            end_word = _mask(tb, tb["lemma"])
            if i == 0:
                start_word = "START_ENTITY"
            if i + 1 == len(idx) - 1:
                end_word = "END_ENTITY"
            path_elements.append(start_word + dep_type + end_word)
            if start_word != "":
                word_path.append(start_word)
            type_path.append(dep_type)
        return " ".join(type_path), type_path, word_path[1:-1], path_elements


# ------------------------------------------------------------ KB / closure


# canonical driver-side implementations live in kgre.kb (shared by the
# Spark pipeline's prepare_kb); re-exported here under the oracle's names
from kgre.kb import load_kb_sets as load_kb  # noqa: E402
from kgre.kb import ontology_closure_dict as ontology_closure  # noqa: E402


# ------------------------------------------------------------ full pipeline


def parse_pages(pages: list[dict], entity_a: str, entity_b: str) -> list[OSentence]:
    sentences = []
    for p in pages:
        if p["lang"] != "en":
            continue
        for s in nlp.parse_text(p["text"]):
            sent = OSentence(p["url"], s["sent_id"], s["tokens"], s["deps"])
            sent.generate_entity_pairs(entity_a, entity_b)
            if sent.pairs is not None:
                sentences.append(sent)
    return sentences


def _instances_for_sentence(sent: OSentence, stop: set, n_rel: int,
                            allow1=None, allow2=None):
    """Common pair loop of build_instances_* (load_data.py:167-212,
    251-290): stop filter, entity-id allowlist with cross-contamination
    rule (load_data.py:553-567), gene_to_gene flag, forward + reverse
    instance."""
    from kgre.candidates import allowlist_keep

    for pair in sent.pairs:
        tok1 = sent.tokens[pair[0][0]]
        tok2 = sent.tokens[pair[1][0]]
        e1 = set(tok1["norm_ner"].split("|"))
        e2 = set(tok2["norm_ner"].split("|"))
        if e1 & stop or e2 & stop:
            continue
        if not allowlist_keep(e1, e2, allow1, allow2):
            continue
        gene_to_gene = "GENE" in tok1["ner"] and "GENE" in tok2["ner"]
        fwd_inst = OInstance(sent, pair[0], pair[1], [0] * n_rel)
        rev_inst = OInstance(sent, pair[1], pair[0], [0] * n_rel)
        yield pair, e1, e2, gene_to_gene, fwd_inst, rev_inst


def build_vocabs(sentences, stop: set, key_order, occur_count: int,
                 allow1=None, allow2=None):
    """Training vocabulary pass (load_data.py:162-220): both forward and
    reverse instances always feed the vocab counters; build_dataset keeps
    features with count >= occur_count (load_data.py:106-131)."""
    counters = {k: Counter() for k in KINDS}
    for sent in sentences:
        for (_, _, _, _, fwd_inst, rev_inst) in _instances_for_sentence(
            sent, stop, len(key_order), allow1, allow2
        ):
            for inst in (fwd_inst, rev_inst):
                counters["dep_word"].update(inst.dependency_words)
                counters["between"].update(inst.between_words)
                counters["element"].update(inst.dependency_elements)
                counters["dep_path"].update([inst.dependency_path_string])
    return {
        k: {f for f, c in counters[k].items() if c >= occur_count}
        for k in KINDS
    }


def label_instance(entity_combos, key_order, fwd_kb, rev_kb):
    """Distant label join truth table (load_data.py:275-286)."""
    fwd_label = [0] * len(key_order)
    rev_label = [0] * len(key_order)
    for i, key in enumerate(key_order):
        if "SYMMETRIC" in key:
            if entity_combos & fwd_kb[key] or entity_combos & rev_kb[key]:
                fwd_label[i] = 1
                rev_label[i] = 1
        else:
            if entity_combos & fwd_kb[key]:
                fwd_label[i] = 1
            elif entity_combos & rev_kb[key]:
                rev_label[i] = 1
    return fwd_label, rev_label


def score_instances(sentences, stop, key_order, fwd_kb, rev_kb, vocabs,
                    allow1=None, allow2=None):
    """Testing pass (load_data.py:232-300) + logistic scoring + triple
    emission in write_output layout (relation_extraction.py:21-47):
    (pmid, subj_norm, obj_norm, rel, distant_label, probability)."""
    triples = []
    for sent in sentences:
        for (pair, e1, e2, g2g, fwd_inst, rev_inst) in _instances_for_sentence(
            sent, stop, len(key_order), allow1, allow2
        ):
            combos = set(itertools.product(e1, e2))
            fwd_label, rev_label = label_instance(combos, key_order, fwd_kb, rev_kb)
            emit = [(fwd_inst, fwd_label)]
            if g2g:
                emit.append((rev_inst, rev_label))
            for inst, label in emit:
                subj = inst.sentence.tokens[inst.start[0]]["norm_ner"]
                obj = inst.sentence.tokens[inst.end[0]]["norm_ner"]
                for i, rel in enumerate(key_order):
                    z = score_logit(
                        rel,
                        inst.dependency_path_string,
                        inst.dependency_words,
                        inst.dependency_elements,
                        inst.between_words,
                        vocabs,
                    )
                    triples.append(
                        {
                            "url": sent.pmid,
                            "subj": subj,
                            "obj": obj,
                            "rel": rel,
                            "label": label[i],
                            "prob": sigmoid(z),
                        }
                    )
    return triples


def run_pipeline(pages, kb_rows_list, onto_rows, stop_ids, entity_a="GENE",
                 entity_b="ONTOLOGY", occur_count=5, allow1=None, allow2=None):
    """pages -> scored triples, end to end, single process."""
    closure = ontology_closure(onto_rows)
    fwd_kb, rev_kb = load_kb(kb_rows_list, closure)
    key_order = sorted(fwd_kb)
    stop = set(stop_ids)
    sentences = parse_pages(pages, entity_a, entity_b)
    vocabs = build_vocabs(sentences, stop, key_order, occur_count, allow1, allow2)
    triples = score_instances(sentences, stop, key_order, fwd_kb, rev_kb,
                              vocabs, allow1, allow2)
    return triples, vocabs, key_order
