"""Graph materialize: annotations → (subj, pred, obj) triples.

Two triple families (SURVEY.md §1.2, FIXTURES.md §4):
- ``has_phenotype``: one triple per distinct ``(conv_id, hpo_id)`` —
  the per-conversation dedup shuffle of the north rule (set semantics of
  the reference's per-doc HPO sets, eval_all.py:90-118).
- ``is_a``: the ontology's direct child→parent edges (broadcast-side, tiny).

Scale notes: the dedup shuffle is a two-phase aggregate — a per-block
combiner inside ``map_batches`` first collapses duplicates locally (hot HPO
terms appearing in most turns of a conversation collapse before the
exchange), then a ``groupby`` merges partials.  The groupby key is the
composite ``(conv_id, hpo_id)`` so cardinality stays high and no single
reducer sees a hot key; the combiner is what bounds skew from hot *rows*.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Max, Min, Sum

from ..assets.hpo_dag import HpoDag
from ..config import PipelineConfig

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("score", pa.float32()),
        ("n_mentions", pa.int64()),
    ]
)


def _partial_dedup(batch: pa.Table) -> pa.Table:
    """Per-block combiner: collapse (conv_id, hpo_id) duplicates before the
    shuffle, keeping min turn_idx / max score / mention count partials."""
    df = batch.select(["conv_id", "hpo_id", "turn_idx", "score"]).to_pandas()
    g = (
        df.groupby(["conv_id", "hpo_id"], as_index=False, sort=False)
        .agg(turn_idx=("turn_idx", "min"), score=("score", "max"), n=("turn_idx", "size"))
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def dedup_conv_hpo(annotations_ds, cfg: PipelineConfig | None = None,
                   drop_negated: bool = True):
    """annotations → one row per (conv_id, hpo_id): min turn_idx, max score,
    total mention count.  Two-phase (combiner + groupby) aggregate."""
    ds = annotations_ds
    if drop_negated:
        ds = ds.map_batches(
            lambda b: b.filter(pc.invert(b.column("negated"))),
            batch_format="pyarrow",
        )
    partial = ds.map_batches(_partial_dedup, batch_format="pyarrow")

    merged = partial.groupby(["conv_id", "hpo_id"]).aggregate(
        Min("turn_idx"), Max("score"), Sum("n")
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["conv_id", "hpo_id", "first_turn", "max_score", "n_mentions"]
        )

    return merged.map_batches(_rename, batch_format="pyarrow")


def has_phenotype_triples(annotations_ds, cfg: PipelineConfig | None = None):
    cfg = cfg or PipelineConfig()
    deduped = dedup_conv_hpo(annotations_ds, cfg, drop_negated=cfg.triples_drop_negated)

    def _to_triples(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj": batch["conv_id"] + ":" + batch["first_turn"].astype(str),
                "pred": "has_phenotype",
                "obj": batch["hpo_id"],
                "score": batch["max_score"].astype("float32"),
                "n_mentions": batch["n_mentions"].astype("int64"),
            }
        )

    return deduped.map_batches(_to_triples, batch_format="pandas")


def is_a_triples(dag: HpoDag):
    """Ontology edges as triples — small table built driver-side."""
    edges = dag.is_a_edges()
    tbl = pa.Table.from_arrays(
        [
            pa.array([c for c, _ in edges], pa.string()),
            pa.array(["is_a"] * len(edges), pa.string()),
            pa.array([p for _, p in edges], pa.string()),
            pa.array([1.0] * len(edges), pa.float32()),
            pa.array([1] * len(edges), pa.int64()),
        ],
        schema=TRIPLES_SCHEMA,
    )
    return ray.data.from_arrow(tbl)


def materialize_triples(annotations_ds, dag: HpoDag, cfg: PipelineConfig | None = None):
    """Full KG: has_phenotype ∪ is_a."""
    return has_phenotype_triples(annotations_ds, cfg).union(is_a_triples(dag))
