"""Offline training-set producers (reference retrain hooks, SURVEY.md
§2.10: produce_trainSet.py / produce_data4train_new.py formats).

These generate the two training-file formats from an ontology asset:
- phrase pairs ``phrase\\tHPO`` (models/train.txt format,
  produce_trainSet.py) — the dictionary/CNN training dump
- match pairs ``a::b\\tlabel`` with label ∈ {0 unrelated, 1 related/
  ancestor, 2 match} (produce_data4train_new.py:116-143) — the matcher's
  3-class training data

Deterministic (seeded); at ontology scale these are driver-side tables, at
corpus scale the same functions run inside ``map_batches`` with
``ds.random_sample`` feeding the negatives.
"""

from __future__ import annotations

import random

import pyarrow as pa

from .hpo_dag import HpoDag


def produce_phrase_pairs(dag: HpoDag) -> pa.Table:
    """All (name|synonym, hpo) pairs for abnormality concepts — the
    train.txt dump."""
    phrases, hpos = [], []
    for h in dag.hpo_list:
        n = dag.nodes.get(h, {})
        for p in sorted(set(list(n.get("name", [])) + list(n.get("synonym", [])))):
            phrases.append(p)
            hpos.append(h)
    return pa.table({"phrase": pa.array(phrases, pa.string()),
                     "hpo_id": pa.array(hpos, pa.string())})


def produce_match_pairs(dag: HpoDag, seed: int = 42, n_per_class: int = 200) -> pa.Table:
    """3-class phrase-pair training set:
    2 = synonym ↔ name of the same concept, 1 = name ↔ direct-ancestor
    name, 0 = names of concepts with no ancestor relation."""
    rng = random.Random(seed)
    a_list, b_list, labels = [], [], []

    with_syn = [
        h for h in dag.hpo_list
        if dag.nodes.get(h, {}).get("synonym") and dag.nodes.get(h, {}).get("name")
    ]
    for _ in range(n_per_class):
        if not with_syn:
            break
        h = rng.choice(with_syn)
        node = dag.nodes[h]
        a_list.append(rng.choice(node["synonym"]))
        b_list.append(node["name"][0])
        labels.append(2)

    with_parent = [
        h for h in dag.hpo_list
        if (dag.parents.get(h, set()) & dag.abnormality_nt)
    ]
    for _ in range(n_per_class):
        if not with_parent:
            break
        h = rng.choice(with_parent)
        p = rng.choice(sorted(dag.parents[h] & dag.abnormality_nt))
        a_list.append(dag.name_of[h])
        b_list.append(dag.name_of[p])
        labels.append(1)

    pool = dag.hpo_list
    made = 0
    while made < n_per_class and len(pool) > 2:
        a, b = rng.sample(pool, 2)
        related = (
            b in dag.ancestors.get(a, set())
            or a in dag.ancestors.get(b, set())
            or a == b
        )
        if not related:
            a_list.append(dag.name_of[a])
            b_list.append(dag.name_of[b])
            labels.append(0)
            made += 1

    return pa.table(
        {
            "phrase_a": pa.array(a_list, pa.string()),
            "phrase_b": pa.array(b_list, pa.string()),
            "label": pa.array(labels, pa.int32()),
        }
    )


def write_train_files(dag: HpoDag, out_dir: str, seed: int = 42) -> dict:
    """Write both files in the reference's exact TSV formats."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pairs = produce_phrase_pairs(dag)
    with open(os.path.join(out_dir, "train.txt"), "w", encoding="utf-8") as f:
        for p, h in zip(pairs.column("phrase").to_pylist(),
                        pairs.column("hpo_id").to_pylist()):
            f.write(f"{p}\t{h}\n")
    match = produce_match_pairs(dag, seed)
    with open(os.path.join(out_dir, "bert_pairs.tsv"), "w", encoding="utf-8") as f:
        for a, b, l in zip(match.column("phrase_a").to_pylist(),
                           match.column("phrase_b").to_pylist(),
                           match.column("label").to_pylist()):
            f.write(f"{a}::{b}\t{l}\n")
    return {"phrase_pairs": pairs.num_rows, "match_pairs": match.num_rows}
