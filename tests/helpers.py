"""Shared test helpers: hand-built sentences and an oracle-side candidate
row builder mirroring the reference pair loop (for row-level comparison
against kgre.candidates.sentence_candidates)."""

from __future__ import annotations

from kgre import pyoracle
from kgre.nlp import tag_word


def tok(i: int, word: str, ner: str | None = None, norm: str | None = None):
    """Build a token dict; ner/norm default from the deterministic tagger."""
    lemma, pos, tner, tnorm = tag_word(word)
    return {
        "id": i,
        "word": word,
        "lemma": lemma,
        "pos": pos,
        "ner": ner if ner is not None else tner,
        "norm_ner": norm if norm is not None else tnorm,
    }


def dep(typ: str, gov: int, dpt: int):
    return {"type": typ, "gov": gov, "dep": dpt}


def chain_deps(n: int):
    """Simple connected tree: ROOT->1, i-1 -> i."""
    deps = [dep("root", 0, 1)]
    for i in range(2, n + 1):
        deps.append(dep("conj", i - 1, i))
    return deps


def oracle_candidate_rows(url, sent_id, tokens, deps, entity_a, entity_b,
                          stop=frozenset(), allow1=None, allow2=None):
    """Reference-transliteration twin of sentence_candidates (same row
    layout) for exact comparison."""
    from kgre.candidates import allowlist_keep

    sent = pyoracle.OSentence(url, sent_id, tokens, deps)
    sent.generate_entity_pairs(entity_a, entity_b)
    rows = []
    if sent.pairs is None:
        return rows
    pair_idx = 0
    for pair in sent.pairs:
        tok1 = sent.tokens[pair[0][0]]
        tok2 = sent.tokens[pair[1][0]]
        e1 = set(tok1["norm_ner"].split("|"))
        e2 = set(tok2["norm_ner"].split("|"))
        if e1 & stop or e2 & stop:
            pair_idx += 1
            continue
        if not allowlist_keep(e1, e2, allow1, allow2):
            pair_idx += 1
            continue
        g2g = "GENE" in tok1["ner"] and "GENE" in tok2["ner"]
        sent_text = " ".join(t["word"] for t in tokens)
        for is_rev, (s, e) in ((False, (pair[0], pair[1])),
                               (True, (pair[1], pair[0]))):
            inst = pyoracle.OInstance(sent, s, e, [0])
            rows.append(
                {
                    "url": url,
                    "sent_id": sent_id,
                    "pair_idx": pair_idx,
                    "is_reverse": is_rev,
                    "gene_to_gene": g2g,
                    "subj": sent.tokens[s[0]]["norm_ner"],
                    "obj": sent.tokens[e[0]]["norm_ner"],
                    "pair_e1_ids": tok1["norm_ner"].split("|"),
                    "pair_e2_ids": tok2["norm_ner"].split("|"),
                    "sent_text": sent_text,
                    "start_tok": s[0],
                    "end_tok": e[0],
                    "dep_path_string": inst.dependency_path_string,
                    "sdp_types": inst.dependency_path_list,
                    "sdp_words": inst.dependency_words,
                    "sdp_elements": inst.dependency_elements,
                    "between_words": inst.between_words,
                }
            )
        pair_idx += 1
    return rows
