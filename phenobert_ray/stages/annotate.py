"""Ray Data stage: turns → annotations (the fused per-turn recognizer).

One stateful ``map_batches`` callable class runs the whole per-turn chain
(candidate generation C1-C4 → dict link L1/L2 → optional stand-in scorers
L4-L6 → finalize L2/L7/L8) because every one of those operators needs *turn
locality* (subsumption/overlap work on all of a turn's candidates, SURVEY.md
§7 hard-part (b)).  Fusing them means zero shuffles before the triple
materialize step, and turn-level rows keep blocks balanced.

The ontology (HpoDag, ~50k-key phrase dict at production scale) is broadcast
once via ``ray.put`` on the driver and fetched once per actor in
``__init__`` — never re-shipped per batch (SURVEY.md §2.5).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..assets.hpo_dag import HpoDag
from ..config import PipelineConfig
from ..linker import annotate_text

ANNOTATIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("mention", pa.string()),
        ("hpo_id", pa.string()),
        ("score", pa.float32()),
        ("negated", pa.bool_()),
    ]
)


class AnnotateTurns:
    """``map_batches`` actor: setup (dict/ontology/scorer) once in
    ``__init__``, per-batch work in ``__call__`` (flat_map-shaped: one turn
    row fans out to 0..n annotation rows)."""

    def __init__(self, dag_ref, cfg: PipelineConfig | None = None):
        self.dag: HpoDag = ray.get(dag_ref) if isinstance(dag_ref, ray.ObjectRef) else dag_ref
        self.cfg = cfg or PipelineConfig()
        self.scorer = None
        if self.cfg.use_model_standins:
            from ..standins import StandInScorer

            self.scorer = StandInScorer(self.dag, self.cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()

        out_conv, out_tidx = [], []
        starts, ends, mentions, hpos, scores, negs = [], [], [], [], [], []
        for c, t, text in zip(conv, tidx, texts):
            for a in annotate_text(
                text,
                self.dag,
                scorer=self.scorer,
                use_longest=self.cfg.use_longest,
            ):
                out_conv.append(c)
                out_tidx.append(t)
                starts.append(a.start)
                ends.append(a.end)
                mentions.append(a.mention)
                hpos.append(a.hpo_id)
                scores.append(a.score)
                negs.append(a.negated)

        return pa.Table.from_arrays(
            [
                pa.array(out_conv, pa.string()),
                pa.array(out_tidx, pa.int32()),
                pa.array(starts, pa.int32()),
                pa.array(ends, pa.int32()),
                pa.array(mentions, pa.string()),
                pa.array(hpos, pa.string()),
                pa.array(scores, pa.float32()),
                pa.array(negs, pa.bool_()),
            ],
            schema=ANNOTATIONS_SCHEMA,
        )


def annotate_turns(turns_ds, dag: HpoDag, cfg: PipelineConfig | None = None):
    """turns Dataset → annotations Dataset (lazy, streaming)."""
    cfg = cfg or PipelineConfig()
    dag_ref = ray.put(dag)
    concurrency = cfg.annotate_concurrency
    if concurrency is None:
        # autoscaling actor pool sized to the cluster; each actor holds one
        # copy of the broadcast ontology
        total = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(2, int(total // max(cfg.annotate_num_cpus, 0.25))))
    return turns_ds.map_batches(
        AnnotateTurns,
        batch_format="pyarrow",
        batch_size=cfg.annotate_batch_size,
        fn_constructor_kwargs={"dag_ref": dag_ref, "cfg": cfg},
        num_cpus=cfg.annotate_num_cpus,
        concurrency=concurrency,
    )
