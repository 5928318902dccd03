"""Entity linking + per-turn finalization (operators L1-L2, L7-L9, M11).

Mirrors the control flow of the reference's ``annotate_phrases``
(/root/reference/phenobert/utils/util.py:1020-1213):

  Step 1  exact dictionary match on the sorted-token-bag key, accepted only
          inside the phenotypic-abnormality subtree, score 1.0
          (util.py:1045-1052)
  L2      subsumption skip: candidates strictly inside an already-matched
          span never reach the model stages (util.py:1054-1061)
  Step 2/3 (model scoring) is pluggable — see standins.py; the scorer
          receives the surviving candidates and returns (candidate, hpo,
          score) results
  L7      overlap resolution: keep-longest (default) or keep-all-unless-same
          -HPO-then-shortest (util.py:1171-1194)
  L8      sort by span start (util.py:1193-1194)
  L9      alt-ID canonicalization (util.py:308,319-323)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from .assets.hpo_dag import HpoDag
from .candidates import Candidate, generate_candidates
from .textops import (
    canonicalize_for_segmentation,
    lemma_bag_key,
    bag_key,
    normalize_type_notation,
)


@dataclass
class Annotation:
    start: int
    end: int
    mention: str
    hpo_id: str
    score: float
    negated: bool


# scorer: candidates -> [(candidate, hpo_id, score)]
Scorer = Callable[[Sequence[Candidate]], list[tuple[Candidate, str, float]]]


def dict_link(
    candidates: Sequence[Candidate],
    dag: HpoDag,
) -> tuple[list[tuple[Candidate, str, float]], list[Candidate]]:
    """Step 1 + L2.  Returns (matched results, survivors for model stages).

    Candidate tokens are already normalized (simplified lowercase), so the
    dictionary key is just the sorted bag + lemma fallback — no re-running
    of process_str per probe (vectorization-friendly).
    """
    results: list[tuple[Candidate, str, float]] = []
    matched_locs: list[frozenset] = []
    survivors: list[Candidate] = []
    p2h = dag.phrase2hpo
    for cand in candidates:
        hit = p2h.get(bag_key(cand.tokens), "")
        if not hit:
            hit = p2h.get(lemma_bag_key(cand.tokens), "")
        if hit and dag.in_abnormality(hit):
            results.append((cand, hit, 1.0))
            matched_locs.append(cand.locs)
        else:
            locs = cand.locs
            if not any(locs.issubset(m) for m in matched_locs):
                survivors.append(cand)
    return results, survivors


def resolve_overlaps(
    results: list[tuple[Candidate, str, float]],
    use_longest: bool = True,
) -> list[tuple[Candidate, str, float]]:
    """L7 pairwise overlap dedup on locs-subset relations (util.py:1171-1194)."""
    # Loop structure replicated exactly from util.py:1171-1192, including the
    # quirk that a span removed mid-inner-loop keeps participating in later
    # comparisons within the same pass.
    removed: set[int] = set()
    n = len(results)
    for i in range(n):
        if i in removed:
            continue
        ci = results[i][0]
        for j in range(i + 1, n):
            if j in removed:
                continue
            cj = results[j][0]
            if ci.locs <= cj.locs or ci.locs >= cj.locs:
                if use_longest:
                    if len(ci.tokens) > len(cj.tokens):
                        removed.add(j)
                    else:
                        removed.add(i)
                else:
                    if results[i][1] == results[j][1]:
                        if len(ci.tokens) > len(cj.tokens):
                            removed.add(i)
                        else:
                            removed.add(j)
    return sorted(
        (r for k, r in enumerate(results) if k not in removed),
        key=lambda r: r[0].start,
    )


def annotate_text(
    text: str,
    dag: HpoDag,
    scorer: Scorer | None = None,
    use_longest: bool = True,
    ner_segments: list[tuple[int, int]] | None = None,
) -> list[Annotation]:
    """Full per-turn annotate: normalize → candidates → link → finalize.

    Equivalent of the reference's per-document
    ``process_text2phrases`` + ``annotate_phrases`` chain
    (annotate.py:61-67), returning structured rows instead of TSV lines.
    """
    t_norm = normalize_type_notation(text)
    canon = canonicalize_for_segmentation(t_norm)
    cands = generate_candidates(canon, ner_segments)
    results, survivors = dict_link(cands, dag)
    if scorer is not None and survivors:
        results = results + list(scorer(survivors))
    results = resolve_overlaps(results, use_longest=use_longest)
    return [
        Annotation(
            start=c.start,
            end=c.end,
            mention=t_norm[c.start:c.end],
            hpo_id=dag.canonical(hpo),
            score=round(score, 2),
            negated=c.negated,
        )
        for c, hpo, score in results
    ]
