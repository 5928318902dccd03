"""SFT / instruction-tuning dataset construction over the ``turns`` table —
the transcript-native training-data ops (task brief axes A+B: the payload IS
multi-turn conversations): render whole conversations into training
documents, and cut per-turn context windows for next-turn-prediction pairs.

Scale notes (10^12 turns):

- Both ops need the turns of one conversation CO-LOCATED and ordered — the
  one genuine partitioning requirement of transcript assembly.  They run as
  a single ``groupby(conv_id)`` exchange; the text crosses the wire exactly
  once, and per-group state is bounded by CONVERSATION length (thousands of
  turns at worst), never by corpus size.  A hot conv_id therefore bounds a
  task, not a node: there is no cross-conversation state at all.
- ``dialog_windows`` emits ~1 row per turn with a K-turn context — output
  amplification is a fixed ×(K ctx lines), not quadratic; K is a constant.
- Rendering is plain string assembly per group (pandas/python inside
  ``map_groups``); no model, no lookup tables, nothing broadcast.
"""

from __future__ import annotations

import pandas as pd
import ray

from ..transcripts import read_turns, turns_sql

WINDOW_K = 2  # context turns per prediction target


def _turn_rows(sf_dir: str):
    return read_turns(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    )


def render_conversations(sf_dir: str):
    """(conv_id, n_turns, n_tokens, rendered) — each conversation rendered
    into one 'role: text' per-line training document, turns in turn_idx
    order.  One groupby(conv_id) exchange; see module scale notes."""

    def render(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        rendered = "\n".join(
            r + ": " + t for r, t in zip(df["role"], df["text"])
        )
        return pd.DataFrame(
            {
                "conv_id": [df["conv_id"].iloc[0]],
                "n_turns": pd.array([len(df)], dtype="int64"),
                "n_tokens": pd.array([len(rendered.split(" "))], dtype="int64"),
                "rendered": [rendered],
            }
        )

    return _turn_rows(sf_dir).groupby("conv_id").map_groups(
        render, batch_format="pandas"
    )


def dialog_windows(sf_dir: str, k: int = WINDOW_K):
    """(conv_id, turn_idx, context, target) — for every turn with at least
    one predecessor, the previous min(k, turn_idx) turns rendered as
    'role: text' lines joined by newline, plus the turn's own text as the
    prediction target.  The next-turn-prediction pair generator for SFT."""

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        lines = [r + ": " + t for r, t in zip(df["role"], df["text"])]
        rows = {"conv_id": [], "turn_idx": [], "context": [], "target": []}
        for i in range(1, len(df)):
            rows["conv_id"].append(df["conv_id"].iloc[0])
            rows["turn_idx"].append(int(df["turn_idx"].iloc[i]))
            rows["context"].append("\n".join(lines[max(0, i - k) : i]))
            rows["target"].append(df["text"].iloc[i])
        if not rows["conv_id"]:
            # single-turn conversation: an untyped empty frame would give
            # Arrow-null columns (the documented empty-block footgun) when
            # a partition holds only such convs (review r4)
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="string"),
                "turn_idx": pd.Series([], dtype="int32"),
                "context": pd.Series([], dtype="string"),
                "target": pd.Series([], dtype="string"),
            })
        out = pd.DataFrame(rows)
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out

    return _turn_rows(sf_dir).groupby("conv_id").map_groups(
        windows, batch_format="pandas"
    )


def role_transition_counts(sf_dir: str):
    """(role_from, role_to, n) — corpus-wide counts of consecutive-turn
    role transitions within conversations (turn_idx order): the
    agent-behavior profile of a transcript corpus (user→assistant,
    assistant→tool call, tool→assistant hand-backs...), the first thing an
    agent-data audit looks at.

    Same single groupby(conv_id) exchange as the other transcript ops,
    but WITHOUT the text column — only (conv_id, turn_idx, role) int/enum
    rows cross the wire; per-group state is bounded by conversation
    length.  A second combiner-first exchange reduces the ≤|roles|²
    transition matrix."""
    from ..stages.shuffle import from_pandas_clean, two_phase_groupby

    def pairs(df: pd.DataFrame) -> "pd.DataFrame":
        df = df.sort_values("turn_idx")
        r = df["role"].to_numpy()
        out = pd.DataFrame({"role_from": r[:-1], "role_to": r[1:]})
        if out.empty:
            import pyarrow as pa

            return pa.table(
                {
                    "role_from": pa.array([], pa.string()),
                    "role_to": pa.array([], pa.string()),
                }
            )
        return from_pandas_clean(out)

    per_conv = (
        read_turns(sf_dir)
        .select_columns(["conv_id", "turn_idx", "role"])
        .groupby("conv_id")
        .map_groups(pairs, batch_format="pandas")
    )
    return two_phase_groupby(
        per_conv,
        keys=["role_from", "role_to"],
        aggs={"n": (None, "size", "sum")},
    )


# ---------------------------------------------------------------------------


def queries():
    return {
        "render_conversations": render_conversations,
        "dialog_windows": dialog_windows,
        "role_transition_counts": role_transition_counts,
    }


def oracles():
    return {
        "role_transition_counts": "WITH " + turns_sql() + """
        SELECT role_from, role_to, count(*) AS n FROM (
          SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS role_from,
                 role AS role_to
          FROM turns
        ) WHERE role_from IS NOT NULL
        GROUP BY role_from, role_to
        """,
        "render_conversations": "WITH " + turns_sql() + """
        , agg AS (
          SELECT conv_id, count(*) AS n_turns,
                 string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
                   AS rendered
          FROM turns GROUP BY conv_id
        )
        SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns,
               CAST(len(string_split(rendered, ' ')) AS BIGINT) AS n_tokens,
               rendered
        FROM agg
        """,
        "dialog_windows": "WITH " + turns_sql() + f"""
        , w AS (
          SELECT conv_id, turn_idx,
                 string_agg(role || ': ' || text, chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN {WINDOW_K} PRECEDING AND 1 PRECEDING
                 ) AS context,
                 text AS target
          FROM turns
        )
        SELECT conv_id, turn_idx, context, target FROM w
        WHERE context IS NOT NULL
        """,
    }
