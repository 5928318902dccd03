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


# Per-worker-process broadcast cache: Ray reuses worker processes across
# tasks, so each worker deserializes the ontology from the object store
# exactly once (actor-like state residency without actor-pool sizing —
# a fixed pool the size of the cluster starves upstream operators, and an
# autoscaling pool ramps slower than short jobs run).
_STATE_CACHE: dict = {}


def _load_state(dag_ref, cfg: PipelineConfig, fingerprint: str | None = None):
    # key on the ontology's content fingerprint (passed driver-side) so the
    # same dag re-broadcast under a new ObjectRef (one per pipeline) reuses
    # the worker-local copy
    # EVERY config field that changes scorer construction or annotation
    # output must be in this key, or a reused worker silently serves state
    # (and memoized rows) built under different thresholds
    key = (
        fingerprint or (dag_ref.hex() if isinstance(dag_ref, ray.ObjectRef) else id(dag_ref)),
        cfg.use_model_standins,
        cfg.use_longest,
        cfg.model_dir,
        cfg.ner_path,
        cfg.param1,
        cfg.param2,
        cfg.param3,
        cfg.use_step_3,
    )
    state = _STATE_CACHE.get(key)
    if state is None:
        dag = ray.get(dag_ref) if isinstance(dag_ref, ray.ObjectRef) else dag_ref
        scorer = None
        if cfg.model_dir:
            from ..standins import load_torch_scorer

            scorer = load_torch_scorer(cfg.model_dir, dag, cfg)
        elif cfg.use_model_standins:
            from ..standins import StandInScorer

            scorer = StandInScorer(dag, cfg)
        ner = None
        if cfg.ner_path:
            from ..ner_np import NerTagger

            ner = NerTagger.load(cfg.ner_path)
        # memo: turn text → annotation rows.  Web-scale transcripts repeat
        # short turns constantly ("ok", tool boilerplate); identical text ⇒
        # identical annotations, so this is pure dedup of CPU work.
        state = (dag, scorer, {}, ner)
        _STATE_CACHE.clear()  # hold at most one ontology per worker
        _STATE_CACHE[key] = state
    return state


_MEMO_MAX = 200_000  # per-worker entries; annotations are tiny rows
# Only short turns are memoized: the memo targets verbatim-repeated turns
# ("ok", tool boilerplate), which are short; admitting arbitrary-length
# texts let a corpus of unique 50 KB turns grow the memo to ~10 GB per
# worker before the entry cap bound (review r4 w8).  Worst case is now
# _MEMO_MAX × _MEMO_MAX_TEXT_LEN ≈ 200 MB of keys per worker.
_MEMO_MAX_TEXT_LEN = 1024


def _annotate_batch(batch: pa.Table, dag: HpoDag, scorer, cfg: PipelineConfig,
                    memo: dict | None = None, ner=None) -> pa.Table:
    conv = batch.column("conv_id").to_pylist()
    tidx = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()

    out_conv, out_tidx = [], []
    starts, ends, mentions, hpos, scores, negs = [], [], [], [], [], []
    for c, t, text in zip(conv, tidx, texts):
        rows = memo.get(text) if memo is not None else None
        if rows is None:
            rows = [
                (a.start, a.end, a.mention, a.hpo_id, a.score, a.negated)
                for a in annotate_text(
                    text, dag, scorer=scorer, use_longest=cfg.use_longest,
                    ner=ner,
                )
            ]
            if (memo is not None and len(memo) < _MEMO_MAX
                    and len(text) <= _MEMO_MAX_TEXT_LEN):
                memo[text] = rows
        for st, en, m, h, sc, ng in rows:
            out_conv.append(c)
            out_tidx.append(t)
            starts.append(st)
            ends.append(en)
            mentions.append(m)
            hpos.append(h)
            scores.append(sc)
            negs.append(ng)

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


class AnnotateTurns:
    """Actor-pool form of the stage (used when heavy model state is
    attached, e.g. stand-in scorers): setup once in ``__init__``, per-batch
    work in ``__call__``."""

    def __init__(self, dag_ref, cfg: PipelineConfig | None = None,
                 fingerprint: str | None = None):
        self.cfg = cfg or PipelineConfig()
        self.dag, self.scorer, self.memo, self.ner = _load_state(
            dag_ref, self.cfg, fingerprint)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _annotate_batch(batch, self.dag, self.scorer, self.cfg,
                               self.memo, self.ner)


def _annotate_task(batch: pa.Table, dag_ref=None, cfg: PipelineConfig | None = None,
                   fingerprint: str | None = None) -> pa.Table:
    # the advertised default was a guaranteed AttributeError: _load_state
    # and _annotate_batch both dereference cfg fields (review r4 w8)
    cfg = cfg or PipelineConfig()
    dag, scorer, memo, ner = _load_state(dag_ref, cfg, fingerprint)
    return _annotate_batch(batch, dag, scorer, cfg, memo, ner)


def annotate_turns(turns_ds, dag: HpoDag, cfg: PipelineConfig | None = None):
    """turns Dataset → annotations Dataset (lazy, streaming).

    Dict-only mode runs as a task pool with the ontology broadcast via
    ``ray.put`` + per-worker cache; stand-in-model mode runs as an
    autoscaling actor pool (models load in ``__init__``)."""
    cfg = cfg or PipelineConfig()
    dag_ref = ray.put(dag)
    # the task pool (with per-worker state cache) is the default even for
    # the stand-in model mode — workers are reused, so state residency is
    # actor-like without actor-pool sizing pathologies; set
    # annotate_concurrency (or annotate_num_gpus > 0) to force a real
    # actor pool, where num_gpus is reserved per actor for GPU-resident
    # scorers (ref auto-selects cuda: util.py:24, model.py:7)
    if cfg.annotate_concurrency or cfg.annotate_num_gpus > 0:
        if cfg.annotate_num_gpus > 0 and not cfg.annotate_gpu_wait and \
                ray.cluster_resources().get("GPU", 0) <= 0:
            # an actor requesting num_gpus on a GPU-less FIXED cluster is an
            # infeasible resource demand: Ray would park the pipeline
            # forever behind periodic warnings — fail fast instead.  An
            # autoscaling cluster whose GPU group is scaled to zero reports
            # 0 here too; annotate_gpu_wait=True opts out of the check so
            # the demand can trigger provisioning (review r4 w8).
            raise ValueError(
                f"annotate_num_gpus={cfg.annotate_num_gpus} but the cluster "
                "reports 0 GPUs; drop --gpus-per-actor, add GPU nodes, or "
                "set annotate_gpu_wait=True on an autoscaling cluster")
        concurrency = cfg.annotate_concurrency
        if concurrency is None:
            if cfg.annotate_num_gpus > 0:
                total = ray.cluster_resources().get("GPU", 0)
                concurrency = (1, max(1, int(total // cfg.annotate_num_gpus) or 1))
            else:
                total = int(ray.cluster_resources().get("CPU", 8))
                concurrency = (1, max(2, int(total // max(cfg.annotate_num_cpus, 0.25))))
        kwargs = {}
        if cfg.annotate_num_gpus > 0:
            kwargs["num_gpus"] = cfg.annotate_num_gpus
        return turns_ds.map_batches(
            AnnotateTurns,
            batch_format="pyarrow",
            batch_size=cfg.annotate_batch_size,
            fn_constructor_kwargs={"dag_ref": dag_ref, "cfg": cfg,
                                   "fingerprint": getattr(dag, "fingerprint", None)},
            num_cpus=cfg.annotate_num_cpus,
            concurrency=concurrency,
            **kwargs,
        )
    return turns_ds.map_batches(
        _annotate_task,
        batch_format="pyarrow",
        batch_size=cfg.annotate_batch_size,
        fn_kwargs={"dag_ref": dag_ref, "cfg": cfg,
                   "fingerprint": getattr(dag, "fingerprint", None)},
        num_cpus=cfg.annotate_num_cpus,
    )
