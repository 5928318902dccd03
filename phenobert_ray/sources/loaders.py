"""Sources S1/S3/S5 (SURVEY.md §2.1): corpus/gold/dictionary readers.

These read the reference's own test inputs (corpus + expert gold
annotations + the name/synonym dictionary dump) for the conformance
harness.  Formats per /root/reference/phenobert/utils/eval_all.py:89-108
and models/train.txt.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

from ..textops import sentence_spans


def read_text_dir_as_turns(corpus_dir: str, sentences_per_turn: int = 3) -> pa.Table:
    """S1: directory-of-text-files → turns table (input_hint shape).

    Each document becomes one conversation; sentence groups become turns
    (split points are sentence boundaries, so no candidate segment ever
    crosses a turn — the distribution-invariance the E2E test checks).
    """
    convs, tidxs, roles, texts, tools, tss = [], [], [], [], [], []
    epoch = 1767225600000000  # 2026-01-01 in µs
    for i, name in enumerate(sorted(os.listdir(corpus_dir))):
        with open(os.path.join(corpus_dir, name), encoding="utf-8") as f:
            doc = f.read()
        spans = sentence_spans(doc)
        if not spans:
            continue
        groups = [
            spans[g:g + sentences_per_turn]
            for g in range(0, len(spans), sentences_per_turn)
        ]
        for t, grp in enumerate(groups):
            convs.append(name)
            tidxs.append(t)
            roles.append("user" if t % 2 == 0 else "assistant")
            texts.append(doc[grp[0][0]:grp[-1][1]])
            tools.append("")
            tss.append(epoch + i * 1_000_000 + t)
    return pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(tidxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


_GSC_LINE = re.compile(r"\[(\d+)::(\d+)\]\t(HP_\d+) \| (.*)")


def read_gold_gsc(ann_dir: str) -> pa.Table:
    """S3a: GSC+ gold ``[s::e]\\tHP_x | text`` (eval_all.py:93-97)."""
    rows = []
    for name in sorted(os.listdir(ann_dir)):
        with open(os.path.join(ann_dir, name), encoding="utf-8") as f:
            for line in f:
                m = _GSC_LINE.match(line.strip())
                if m:
                    rows.append(
                        (name, int(m.group(1)), int(m.group(2)),
                         m.group(4), m.group(3).replace("HP_", "HP:"))
                    )
    return _gold_table(rows)


def read_gold_tsv(ann_dir: str) -> pa.Table:
    """S3b: ID-68/GeneReviews/val gold ``s\\te\\ttext\\tHP:x``
    (eval_all.py:98-100)."""
    rows = []
    for name in sorted(os.listdir(ann_dir)):
        with open(os.path.join(ann_dir, name), encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 4 and parts[3].startswith("HP:"):
                    rows.append((name, int(parts[0]), int(parts[1]), parts[2], parts[3]))
    return _gold_table(rows)


def _gold_table(rows) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "start": pa.array([r[1] for r in rows], pa.int32()),
            "end": pa.array([r[2] for r in rows], pa.int32()),
            "mention": pa.array([r[3] for r in rows], pa.string()),
            "hpo_id": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def read_phrase_pairs(path: str) -> list[tuple[str, str]]:
    """S5: ``phrase\\tHPO`` pairs (format of models/train.txt — the
    name+synonym dump the reference's dictionary is built from)."""
    pairs = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2 and parts[1].startswith("HP:"):
                pairs.append((parts[0], parts[1]))
    return pairs


def read_gold_level_csv(ann_dir: str) -> pa.Table:
    """S3c: ``level*`` gold — per-doc lines of comma-separated HPO ids
    (eval_all.py:101-103); no spans, so start/end are -1."""
    rows = []
    for name in sorted(os.listdir(ann_dir)):
        with open(os.path.join(ann_dir, name), encoding="utf-8") as f:
            for line in f:
                for hpo in line.strip().split(","):
                    hpo = hpo.strip()
                    if hpo.startswith("HP:"):
                        rows.append((name, -1, -1, "", hpo))
    return _gold_table(rows)
