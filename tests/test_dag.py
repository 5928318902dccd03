"""DAG ops on the synthetic mini-ontology (SURVEY.md §5 item 1)."""

from phenobert_ray.assets.mini_hpo import ORACLE_PHRASES, mini_dag


def test_subtree_membership(mini):
    assert mini.in_abnormality("HP:0001250")
    assert not mini.in_abnormality("HP:0000006")  # mode-of-inheritance branch
    assert not mini.in_abnormality("HP:0000118")  # root excluded from NT set


def test_layer1(mini):
    assert "HP:0000707" in mini.layer1
    assert mini.hpo2idx_l1["HP:0000707"] >= 0


def test_depths(mini):
    assert mini.depth["HP:0000118"] == 0
    assert mini.depth["HP:0000707"] == 1
    assert mini.depth["HP:0001250"] == 3  # 118→707→12638→1250
    # multi-parent min depth: 648 via 478(d1) = 2, via 12638 = 3 → 2
    assert mini.depth["HP:0000648"] == 2


def test_ancestors_multi_parent(mini):
    anc = mini.ancestors["HP:0000648"]
    assert {"HP:0000478", "HP:0012638", "HP:0000707", "HP:0000118"} <= anc


def test_alt_id(mini):
    assert mini.canonical("HP:0010520") == "HP:0001250"
    assert mini.canonical("HP:0001250") == "HP:0001250"


def test_phrase_match(mini):
    assert mini.match_phrase("Febrile seizure") == "HP:0002373"
    assert mini.match_phrase("seizure febrile") == "HP:0002373"  # bag key
    assert mini.match_phrase("Broad-Thumb") == "HP:0011304"
    assert mini.match_phrase("nothing here") == ""


def test_lemma_fallback(mini):
    # "hypotonias" is not a synonym but lemmatizes to the name
    assert mini.match_phrase("hypotonias") == "HP:0001252"


def test_lcs_similarity(mini):
    # nystagmus / strabismus share HP:0000478 at depth 1
    assert mini.lcs_depth("HP:0000639", "HP:0000486") == 1
    assert mini.node_sim("HP:0000639", "HP:0000639") == 1.0
    s = mini.node_sim("HP:0000639", "HP:0000486")
    assert 0 < s < 1
    # blindness vs visual impairment: LCS = visual impairment (ancestor)
    assert mini.lcs_depth("HP:0000618", "HP:0000505") == mini.depth["HP:0000505"]


def test_set_sim_bounds(mini):
    a = {"HP:0000639"}
    assert mini.set_sim(a, a) == 1.0
    assert mini.set_sim(set(), set()) == 1.0
    assert mini.set_sim(a, set()) == 0.0


def test_is_a_edges(mini):
    edges = set(mini.is_a_edges())
    assert ("HP:0002373", "HP:0001250") in edges
    # edges crossing out of the abnormality subtree are excluded
    assert all(p != "HP:0000001" for _, p in edges)


def test_oracle_phrases_resolve(mini):
    for p, h in ORACLE_PHRASES:
        assert mini.match_phrase(p) == h, p
        assert mini.in_abnormality(h), h


def test_oracle_phrases_disjoint_from_base_vocab():
    base = {
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
        "patient", "shows", "today", "exam", "reveals", "no",
    }
    for p, _ in ORACLE_PHRASES:
        assert not (set(p.split()) & base), p


def test_set_sim_reference_formula(mini):
    """Pins the getHPO_set_similarity_max semantics (util.py:504-537):
    shared concepts are SKIPPED and the score is 1 - shortfall/|union|.
    With pred={A,B}, gold={A} and sim(A,B)=0 the reference gives
    1 - (1-0)/2 = 0.5 (the old symmetrized-mean formula gave 0.75)."""
    a, b = "HP:0001250", "HP:0001513"  # seizure vs obesity: disjoint branches
    assert mini.node_sim(a, b) == 0.0
    assert mini.set_sim({a, b}, {a}) == 0.5
    # partial credit through the DAG: febrile seizure vs {seizure}
    fs = "HP:0002373"
    expect = 1 - (1 - mini.node_sim(fs, a)) / 2
    assert abs(mini.set_sim({fs, a}, {a}) - expect) < 1e-12
