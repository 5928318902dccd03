"""Stand-in scorer stack + API parity layer tests."""

import pandas as pd

from phenobert_ray import api
from phenobert_ray.config import PipelineConfig
from phenobert_ray.standins import StandInScorer
from phenobert_ray.textops import process_str


def test_scorer_deterministic(mini):
    s1 = StandInScorer(mini)
    s2 = StandInScorer(mini)
    v1 = s1.emb.phrase(["febrile", "seizure"])
    v2 = s2.emb.phrase(["febrile", "seizure"])
    assert (v1 == v2).all()
    assert abs(float(v1 @ v1) - 1.0) < 1e-5  # float32 embeddings


def test_matcher_identity_scores_high(mini):
    s = StandInScorer(mini)
    vec = s.emb.phrase(process_str(mini.name_of["HP:0000639"]))
    assert s.match_score(vec, "HP:0000639") >= 0.99


def test_subtree_scorer_ranks_exact_name_first(mini):
    s = StandInScorer(mini, PipelineConfig(param2=0.0))
    vec = s.emb.phrase(process_str("Nystagmus"))
    cands = s.subtree_candidates(vec, "HP:0000478")
    assert cands and cands[0][0] == "HP:0000639"


def test_scorer_chain_links_exact_surface_form(mini):
    """A candidate equal to a concept name must link to that concept when
    the thresholds allow; unrelated word salad must link to nothing."""
    from phenobert_ray.candidates import Candidate

    s = StandInScorer(mini, PipelineConfig(param1=0.5, param2=0.05, param3=0.9))
    good = Candidate(tokens=["nystagmus"], starts=[0], start=0, end=9)
    junk = Candidate(tokens=["zzqqy", "wwxk"], starts=[0, 6], start=0, end=10)
    out = s([good, junk])
    linked = {c.tokens[0]: h for c, h, _ in out}
    assert linked.get("nystagmus") == "HP:0000639"
    assert "zzqqy" not in linked


def test_api_annotate_tsv(mini):
    tsv = api.annotate_text("patient shows no febrile seizure today.", mini, as_tsv=True)
    line = tsv.strip().split("\t")
    assert line[2] == "febrile seizure"
    assert line[3] == "HP:0002373"
    assert line[4] == "1.00"
    assert line[5] == "Neg"


def test_api_get_most_related(mini):
    out = api.get_most_related_HPO_term(["febrile seizure", "zzqqy wwxk"], mini)
    assert out[0] == "HP:0002373"  # dictionary hit
    assert out[1] == "None"


def test_api_l1_route(mini):
    routes = api.get_L1_HPO_term(["nystagmus"], mini)
    assert isinstance(routes[0], list)


def test_api_match(mini):
    assert api.is_phrase_match_BERT("febrile seizure", "febrile seizure", mini) == 2
    assert api.is_phrase_match_BERT("febrile seizure", "table scan merge", mini) == 0


def test_pipeline_with_standins_superset(mini, sf_small):
    """With stand-in scorers on, the pipeline still reproduces every
    dictionary mention (model stages only ADD candidates that dictionary
    matching skipped)."""
    from phenobert_ray.stages.annotate import annotate_turns
    from phenobert_ray.transcripts import read_turns

    dict_only = annotate_turns(read_turns(sf_small), mini).to_pandas()
    with_model = annotate_turns(
        read_turns(sf_small), mini, PipelineConfig(use_model_standins=True)
    ).to_pandas()
    # span boundaries may widen (the scorer can link a LONGER overlapping
    # span to the same concept and keep-longest wins — reference behavior),
    # but the per-turn concept set must be a superset of the dict-only set
    key = ["conv_id", "turn_idx", "hpo_id"]
    d = set(map(tuple, dict_only[key].itertuples(index=False)))
    w = set(map(tuple, with_model[key].itertuples(index=False)))
    assert d <= w


def test_nb_mode_survives_empty_subtree_pool(mini):
    """-nb (use_step_3=False): a candidate that routes past the L1 gate
    but whose subtree pool empties at the param2 threshold must be
    skipped, not crash max() on an empty dict (review r4, reproduced)."""
    from phenobert_ray.config import PipelineConfig
    from phenobert_ray.standins import StandInScorer

    # param1=0 admits every subtree; param2 > 1 empties every pool
    from phenobert_ray.candidates import Candidate

    cfg = PipelineConfig(param1=0.0, param2=1.01, use_step_3=False,
                         use_model_standins=True)
    scorer = StandInScorer(mini, cfg)
    cand = Candidate(tokens=["totally", "novel", "junk"],
                     starts=[0, 8, 14], start=0, end=18)
    out = scorer([cand])
    assert out == []
