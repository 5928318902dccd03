"""Deterministic synthetic transcript (turns) table.

``BASELINE.json.input_hint`` mandates input shaped
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  The sandbox test data has no turns table, so we synthesize
one deterministically from the driver-provided ``documents`` table with a
transformation that is *exactly expressible in ANSI SQL* — this is what makes
the DuckDB oracle for the whole KG pipeline possible (every injected
phenotype mention is a pure function of ``doc_id``).

Layout per document row (doc_id, text):
    conv_id  = 'conv-' || (doc_id // 4)          (4 turns per conversation)
    turn_idx = doc_id % 4
    role     = ['user','assistant','tool'][doc_id % 3]
    tool     = 'search' when role == 'tool' else ''
    ts       = 2026-01-01T00:00:00 + doc_id seconds
    text     = base_text
               || '. patient shows ' || ('no ' if doc_id % 7 == 3) || P1 || ' today.'
               || (' exam reveals ' || P2 || '.' if doc_id % 5 == 0)
    P1 = ORACLE_PHRASES[doc_id % 30].phrase
    P2 = ORACLE_PHRASES[(doc_id * 3 + 1) % 30].phrase

The matching SQL is produced by :func:`turns_sql` and reused as a CTE by
every oracle query in ``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .assets.mini_hpo import N_ORACLE_PHRASES, ORACLE_PHRASES

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

TURNS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = np.array(["user", "assistant", "tool"])
_PHRASES = np.array([p for p, _ in ORACLE_PHRASES])


def synthesize_turns_batch(batch: pa.Table) -> pa.Table:
    """Vectorized documents→turns transform (numpy over Arrow columns)."""
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)

    p1 = _PHRASES[doc_id % N_ORACLE_PHRASES]
    p2 = _PHRASES[(doc_id * 3 + 1) % N_ORACLE_PHRASES]
    neg = doc_id % 7 == 3
    extra = doc_id % 5 == 0
    # fully vectorized text build (this runs once per document for EVERY
    # KG/eval query — a per-row f-string loop dominated the batch here):
    # base + ". patient shows " + ("no "|"") + p1 + " today." + suffix
    suffix = np.where(
        extra, np.char.add(np.char.add(" exam reveals ", p2), "."), ""
    )
    text = pc.binary_join_element_wise(
        pc.cast(batch.column("text"), pa.string()),
        ". patient shows ",
        pa.array(np.where(neg, "no ", ""), pa.string()),
        pa.array(p1, pa.string()),
        " today.",
        pa.array(suffix, pa.string()),
        "",  # separator: plain concatenation
    )

    role = _ROLES[doc_id % 3]
    return pa.Table.from_arrays(
        [
            pa.array(np.char.add("conv-", (doc_id // 4).astype(str)), pa.string()),
            pa.array((doc_id % 4).astype(np.int32), pa.int32()),
            pa.array(role, pa.string()),
            pc.cast(text, pa.string()),
            pa.array(np.where(role == "tool", "search", ""), pa.string()),
            pa.array(EPOCH + doc_id.astype("timedelta64[us]") * 1_000_000, pa.timestamp("us")),
        ],
        schema=TURNS_SCHEMA,
    )


def read_turns(sf_dir: str, **read_kwargs) -> "ray.data.Dataset":
    """documents.parquet → turns Dataset.  Column-pruned read (only doc_id,
    text leave storage) + zero-copy Arrow batches throughout.  Rows with a
    NULL doc_id or text are dropped at the read (the engine-wide null
    contract, stages/shuffle.py drop_null_rows)."""
    from .stages.shuffle import drop_null_rows

    return drop_null_rows(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"], **read_kwargs
    )).map_batches(synthesize_turns_batch, batch_format="pyarrow")


def turns_sql() -> str:
    """The same transform as ANSI SQL over the pre-registered ``documents``
    view — used as a CTE by every oracle query."""
    phrase_rows = ",\n      ".join(
        f"({i}, '{p}', '{h}')" for i, (p, h) in enumerate(ORACLE_PHRASES)
    )
    n = N_ORACLE_PHRASES
    return f"""
    oracle_phrases(p_idx, phrase, hpo_id) AS (
      VALUES
      {phrase_rows}
    ),
    turns AS (
      SELECT
        'conv-' || CAST(d.doc_id // 4 AS VARCHAR)            AS conv_id,
        CAST(d.doc_id % 4 AS INTEGER)                        AS turn_idx,
        (CASE d.doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END) AS role,
        d.text || '. patient shows '
               || (CASE WHEN d.doc_id % 7 = 3 THEN 'no ' ELSE '' END)
               || p1.phrase || ' today.'
               || (CASE WHEN d.doc_id % 5 = 0 THEN ' exam reveals ' || p2.phrase || '.' ELSE '' END)
                                                             AS text,
        (CASE WHEN d.doc_id % 3 = 2 THEN 'search' ELSE '' END) AS tool,
        TIMESTAMP '2026-01-01 00:00:00' + d.doc_id * INTERVAL 1 SECOND AS ts
      FROM documents d
      JOIN oracle_phrases p1 ON p1.p_idx = d.doc_id % {n}
      JOIN oracle_phrases p2 ON p2.p_idx = (d.doc_id * 3 + 1) % {n}
    )"""


def expected_mentions_sql() -> str:
    """CTE: the oracle's expected (conv_id, turn_idx, mention, hpo_id,
    negated) rows — one per injected phrase occurrence (overlap resolution
    keeps exactly the injected span; see tests for why sub-phrase dictionary
    hits are always subsumed)."""
    n = N_ORACLE_PHRASES
    return f"""
    expected_mentions AS (
      SELECT 'conv-' || CAST(d.doc_id // 4 AS VARCHAR) AS conv_id,
             CAST(d.doc_id % 4 AS INTEGER) AS turn_idx,
             p1.phrase AS mention, p1.hpo_id AS hpo_id,
             (d.doc_id % 7 = 3) AS negated
      FROM documents d JOIN oracle_phrases p1 ON p1.p_idx = d.doc_id % {n}
      UNION ALL
      SELECT 'conv-' || CAST(d.doc_id // 4 AS VARCHAR),
             CAST(d.doc_id % 4 AS INTEGER),
             p2.phrase, p2.hpo_id, FALSE
      FROM documents d JOIN oracle_phrases p2 ON p2.p_idx = (d.doc_id * 3 + 1) % {n}
      WHERE d.doc_id % 5 = 0
    )"""
