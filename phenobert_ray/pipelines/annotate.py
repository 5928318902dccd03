"""Flagship pipeline: transcript turns → annotations → KG triples.

Lifecycle (SURVEY.md §3, re-expressed Ray-Data-first):
  driver builds/broadcasts the ontology asset →
  ``read_parquet`` (column-pruned) → fused annotate actor pool
  (``map_batches``) → two-phase (combiner + groupby) per-conv dedup shuffle →
  triples ∪ is_a edges → partitioned parquet + lineage manifests.

Everything is lazy/streaming until a sink consumes it.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray

from ..assets.hpo_dag import HpoDag
from ..config import PipelineConfig
from ..stages.annotate import annotate_turns
from ..state.manifest import shard_done, write_manifest
from ..transcripts import read_turns, synthesize_turns_batch
from .triples import has_phenotype_triples, is_a_triples, materialize_triples


def annotations_from_turns(turns_ds, dag: HpoDag, cfg: PipelineConfig | None = None):
    return annotate_turns(turns_ds, dag, cfg)


def kg_from_turns(turns_ds, dag: HpoDag, cfg: PipelineConfig | None = None):
    return materialize_triples(annotate_turns(turns_ds, dag, cfg), dag, cfg)


def run_job(
    sf_dir: str,
    out_dir: str,
    dag: HpoDag,
    cfg: PipelineConfig | None = None,
    num_shards: int = 4,
) -> dict:
    """Resumable KG build over ``{sf_dir}/documents.parquet``-derived turns.

    Input fragments are hashed into ``num_shards`` groups; each group runs as
    its own streaming pipeline writing ``out_dir/shard=K/`` + a lineage
    manifest.  A killed run resumes by skipping completed shards
    (deterministic stages ⇒ identical triples; see tests/test_resume.py).
    """
    cfg = cfg or PipelineConfig()
    import pyarrow.dataset as pads

    src = pads.dataset(os.path.join(sf_dir, "documents.parquet"))
    frags = sorted(f.path for f in src.get_fragments())

    # shard spec: groups of fragments when there are enough files (the 100 TB
    # layout), else contiguous doc_id ranges within the single file (pushed
    # down as a parquet read filter).
    shard_specs: list[tuple[list[str], str, object]] = []
    if len(frags) >= num_shards:
        groups: list[list[str]] = [[] for _ in range(num_shards)]
        for i, p in enumerate(frags):
            groups[i % num_shards].append(p)
        shard_specs = [(g, "", None) for g in groups if g]
    else:
        import pyarrow.compute as pc_

        lo = src.to_table(columns=["doc_id"]).column("doc_id")
        mn, mx = pc_.min(lo).as_py(), pc_.max(lo).as_py()
        step = (mx - mn + num_shards) // num_shards
        for k in range(num_shards):
            a, b = mn + k * step, mn + (k + 1) * step
            expr = (pads.field("doc_id") >= a) & (pads.field("doc_id") < b)
            shard_specs.append((frags, f"range:{a}:{b}", expr))

    stats = {"shards_run": 0, "shards_skipped": 0, "rows": 0}
    # ontology edges are shard-independent: write once (not per shard —
    # a per-shard union would both duplicate edges and break streaming)
    isa_dir = os.path.join(out_dir, "ontology")
    if not os.path.isdir(isa_dir):
        is_a_triples(dag).write_parquet(isa_dir)
    for k, (paths, spec, expr) in enumerate(shard_specs):
        if shard_done(out_dir, k, paths, spec):
            stats["shards_skipped"] += 1
            continue
        read_kwargs = {"columns": ["doc_id", "text"]}
        if expr is not None:
            read_kwargs["filter"] = expr
        turns = ray.data.read_parquet(paths, **read_kwargs).map_batches(
            synthesize_turns_batch, batch_format="pyarrow"
        )
        from ..stages.annotate import annotate_turns

        triples = has_phenotype_triples(annotate_turns(turns, dag, cfg), cfg)
        shard_dir = os.path.join(out_dir, f"shard={k}")
        triples.write_parquet(shard_dir)
        # content hash: order-insensitive over (subj, pred, obj)
        tbl = ray.data.read_parquet(shard_dir).select_columns(["subj", "pred", "obj"]).to_arrow_refs()
        h = 0
        rows = 0
        for ref in tbl:
            t = ray.get(ref)
            rows += t.num_rows
            for s, p, o in zip(*(t.column(c).to_pylist() for c in ("subj", "pred", "obj"))):
                h ^= int.from_bytes(
                    hashlib.blake2b(f"{s}|{p}|{o}".encode(), digest_size=8).digest(), "big"
                )
        write_manifest(out_dir, k, paths, rows, f"{h:016x}", spec)
        stats["shards_run"] += 1
        stats["rows"] += rows
    return stats
