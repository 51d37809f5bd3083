"""Property-based cross-checks (SURVEY.md §5.2 item 4): random small
sentence graphs -> the independent Spark-side candidate implementation must
produce byte-identical rows to the reference transliteration."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgre.candidates import sentence_candidates
from tests.helpers import oracle_candidate_rows, tok

_WORDS = ["alpha", "beta", "gamma", "GENE1", "GENE2", "GENE7", "VGENE1",
          "GO1", "GO2", "GO9"]
_TYPES = ["nsubj", "dobj", "amod", "conj", "root"]


@st.composite
def sentence(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    words = [draw(st.sampled_from(_WORDS)) for _ in range(n)]
    tokens = [tok(i + 1, w) for i, w in enumerate(words)]
    n_edges = draw(st.integers(min_value=0, max_value=2 * n))
    deps = []
    for _ in range(n_edges):
        gov = draw(st.integers(min_value=0, max_value=n))
        dpt = draw(st.integers(min_value=1, max_value=n))
        if gov == dpt:
            continue
        typ = draw(st.sampled_from(_TYPES))
        deps.append({"type": typ, "gov": gov, "dep": dpt})
    return tokens, deps


@settings(max_examples=300, deadline=None)
@given(sentence(), st.sampled_from([("GENE", "ONTOLOGY"), ("GENE", "GENE"),
                                    ("ONTOLOGY", "GENE")]))
def test_candidates_match_oracle_on_random_graphs(s, types):
    tokens, deps = s
    ea, eb = types
    got = sentence_candidates("u", 0, tokens, deps, ea, eb, frozenset())
    want = oracle_candidate_rows("u", 0, tokens, deps, ea, eb, frozenset())
    assert got == want


@settings(max_examples=100, deadline=None)
@given(sentence())
def test_sdp_path_invariants(s):
    """Path (when present) starts/ends at the selected heads and its
    types come from the adjacency; empty iff unreachable."""
    tokens, deps = s
    rows = sentence_candidates("u", 0, tokens, deps, "GENE", "ONTOLOGY",
                               frozenset())
    for r in rows:
        assert len(r["sdp_elements"]) == len(r["sdp_types"])
        if r["sdp_types"]:
            assert r["sdp_elements"][0].startswith("START_ENTITY")
            assert r["sdp_elements"][-1].endswith("END_ENTITY")
            # interior word list is exactly 2 shorter than the edge count
            assert len(r["sdp_words"]) == max(0, len(r["sdp_types"]) - 2)
