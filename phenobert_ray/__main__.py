"""CLI entry point — the reference ``annotate.py`` surface, Ray-Data-native.

Mirrors the reference's flags (annotate.py:15-30): ``-i/-o`` input/output,
``-p1/-p2/-p3`` thresholds, ``-al`` keep-overlaps, ``-nb`` no-BERT — plus
engine flags for dictionary asset, sharded resumable runs and output format.
Designed to run under ``ray job submit -- python -m phenobert_ray ...`` on a
cluster; locally it owns the Ray session (guarded init).

Examples:
    python -m phenobert_ray -i /path/turns_parquet_dir -o /tmp/kg
    python -m phenobert_ray -i corpus_dir --input-format textdir \\
        --dict /root/reference/phenobert/models/train.txt -o /tmp/out \\
        --output-format tsv
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="phenobert_ray")
    p.add_argument("-i", "--input", required=True,
                   help="turns parquet file/dir, or a directory of text files")
    p.add_argument("-o", "--output", required=True, help="output directory")
    p.add_argument("--input-format", choices=["parquet", "textdir", "jsonl"],
                   default="parquet")
    p.add_argument("--output-format", choices=["parquet", "tsv", "kg"], default="kg",
                   help="kg = resumable sharded triples; parquet/tsv = annotations")
    p.add_argument("-p1", type=float, default=None,
                   help="L1 router threshold (default 0.8; 0.95 with -m builtin)")
    p.add_argument("-p2", type=float, default=None,
                   help="subtree scorer threshold (default 0.6; 0.9 with -m builtin)")
    p.add_argument("-p3", type=float, default=0.9, help="matcher threshold")
    p.add_argument("-al", action="store_true",
                   help="keep overlapping spans (reference -al)")
    p.add_argument("-nb", action="store_true",
                   help="skip the matcher step (reference -nb)")
    p.add_argument("--use-standins", action="store_true",
                   help="enable the deterministic stand-in model stages")
    p.add_argument("-m", "--model-dir", default=None,
                   help="dir with reference-format checkpoints (l1.pt, "
                        "sub_*.pt, bert.pt, embedding.pt) for the numpy "
                        "inference path; the literal 'builtin' selects the "
                        "packaged hermetically-trained weights (pair with "
                        "-p1 0.95 -p2 0.9, see assets.loader.trained_model_dir)")
    p.add_argument("--ner", dest="ner_path", default=None,
                   help="C1 span-seeder checkpoint (ner.pt; the literal "
                        "'builtin' selects the packaged tagger); default "
                        "pseudo-seeding")
    p.add_argument("--dict", dest="dict_path", default=None,
                   help="phrase dictionary: train.txt pairs, hpo.json or .obo "
                        "(default: built-in mini ontology)")
    p.add_argument("--simplified-keys", action="store_true",
                   help="also index stopword-free dictionary keys (+recall)")
    p.add_argument("--shards", type=int, default=4, help="resumable shard count")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--gpus-per-actor", type=float, default=0.0,
                   help="reserve this many GPUs per scorer actor (>0 forces "
                        "the actor-pool path; fractional packs several "
                        "actors per device)")
    p.add_argument("--concurrency", type=int, default=None,
                   help="fixed scorer actor-pool size (default: task pool, "
                        "or GPU-count-derived when --gpus-per-actor is set)")
    p.add_argument("-t", "--threads", type=float, default=1.0,
                   help="CPUs reserved per annotate task (reference -t sets "
                        "torch intra-op threads, annotate.py:23; here the "
                        "numpy kernels are single-threaded so this is the "
                        "Ray num_cpus reservation per batch task)")
    return p


def load_dag(args):
    if not args.dict_path:
        from .assets.mini_hpo import mini_dag

        return mini_dag()
    path = args.dict_path
    if path.endswith(".json"):
        from .assets.loader import dag_from_hpo_json

        return dag_from_hpo_json(path)
    if path.endswith(".obo"):
        from .assets.loader import dag_from_obo

        return dag_from_obo(path)
    from .assets.hpo_dag import dag_from_phrase_pairs
    from .sources.loaders import read_phrase_pairs

    return dag_from_phrase_pairs(read_phrase_pairs(path),
                                 simplified_keys=args.simplified_keys)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    builtin = args.model_dir == "builtin"
    if builtin or args.ner_path == "builtin":
        from .assets.loader import resolve_builtin

        try:
            args.model_dir, args.ner_path = resolve_builtin(
                args.model_dir, args.ner_path)
        except FileNotFoundError as e:
            print(str(e), file=sys.stderr)
            return 2
    # reference defaults (annotate.py:15-30) assume its fastText-based
    # weights; the packaged hashing-embedding weights operate at 0.95/0.9
    # (BASELINE.md sweep) — explicit flags always win
    if args.p1 is None:
        args.p1 = 0.95 if builtin else 0.8
    if args.p2 is None:
        args.p2 = 0.9 if builtin else 0.6

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False)

    from .config import PipelineConfig
    from .stages.annotate import annotate_turns

    cfg = PipelineConfig(
        param1=args.p1, param2=args.p2, param3=args.p3,
        use_longest=not args.al, use_step_3=not args.nb,
        use_model_standins=args.use_standins or bool(args.model_dir),
        model_dir=args.model_dir,
        ner_path=args.ner_path,
        annotate_batch_size=args.batch_size,
        annotate_num_gpus=args.gpus_per_actor,
        annotate_concurrency=args.concurrency,
        annotate_num_cpus=args.threads,
    )
    dag = load_dag(args)
    t0 = time.time()

    if args.input_format == "textdir":
        from .sources.loaders import read_text_dir_as_turns

        turns = ray.data.from_arrow(read_text_dir_as_turns(args.input))
    elif args.input_format == "jsonl":
        from .sources.loaders import read_turns_jsonl
        from .stages.shuffle import drop_null_rows

        turns = drop_null_rows(read_turns_jsonl(args.input),
                               columns=["conv_id", "turn_idx", "text"])
    else:
        from .stages.shuffle import drop_null_rows

        # the engine-wide read-boundary null contract: only the
        # load-bearing turn columns may drop a row (run_kg_job applies
        # this internally; the direct parquet/tsv output paths read the
        # turns here and must apply it too — a NULL text otherwise
        # crashes the annotate kernel on one bad row, review r4 w9)
        turns = drop_null_rows(ray.data.read_parquet(args.input),
                               columns=["conv_id", "turn_idx", "text"])

    if args.output_format == "kg":
        if args.input_format in ("textdir", "jsonl"):
            # the resumable sharded runner shards by PARQUET fragment —
            # non-parquet inputs run as one streaming (unsharded) job
            from .pipelines.triples import write_kg

            write_kg(annotate_turns(turns, dag, cfg), dag, args.output, cfg)
            stats = {"mode": f"kg (unsharded: {args.input_format} input)"}
        else:
            from .pipelines.annotate import run_kg_job

            stats = run_kg_job(args.input, args.output, dag, cfg,
                               num_shards=args.shards)
    elif args.output_format == "parquet":
        from .sources.writers import write_annotations_parquet

        write_annotations_parquet(annotate_turns(turns, dag, cfg), args.output)
        stats = {"mode": "annotations parquet"}
    else:
        from .sources.writers import write_annotations_tsv

        n = write_annotations_tsv(annotate_turns(turns, dag, cfg), args.output)
        stats = {"mode": "tsv", "files": n}

    print(f"done in {time.time() - t0:.1f}s: {stats} -> {args.output}")
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
