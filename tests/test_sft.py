"""SFT dataset construction ops (functions/sft.py): brute-force oracles on
the synthesized turns table, plus the long-conversation boundary (context
window clipped at the conversation start, never crossing conversations)."""

import pandas as pd
import pytest

from phenobert_ray.functions.sft import (
    WINDOW_K,
    dialog_windows,
    render_conversations,
)
from phenobert_ray.transcripts import read_turns


@pytest.fixture(scope="module")
def turns_df(sf_small):
    return (
        read_turns(sf_small)
        .select_columns(["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )


def test_render_conversations_bruteforce(sf_small, turns_df):
    got = render_conversations(sf_small).to_pandas().set_index("conv_id")
    for conv_id, g in turns_df.groupby("conv_id"):
        rendered = "\n".join(r + ": " + t for r, t in zip(g["role"], g["text"]))
        assert got.loc[conv_id, "rendered"] == rendered
        assert got.loc[conv_id, "n_turns"] == len(g)
        assert got.loc[conv_id, "n_tokens"] == len(rendered.split(" "))
    assert len(got) == turns_df["conv_id"].nunique()


def test_dialog_windows_bruteforce(sf_small, turns_df):
    got = (
        dialog_windows(sf_small)
        .to_pandas()
        .set_index(["conv_id", "turn_idx"])
        .sort_index()
    )
    n_expected = 0
    for conv_id, g in turns_df.groupby("conv_id"):
        lines = [r + ": " + t for r, t in zip(g["role"], g["text"])]
        for i in range(1, len(g)):
            n_expected += 1
            key = (conv_id, g["turn_idx"].iloc[i])
            assert got.loc[key, "context"] == "\n".join(
                lines[max(0, i - WINDOW_K) : i]
            )
            assert got.loc[key, "target"] == g["text"].iloc[i]
    assert len(got) == n_expected
    # context never longer than K lines, and turn 0 never emitted
    assert got["context"].str.count("\n").max() <= WINDOW_K - 1
    assert (got.index.get_level_values("turn_idx") >= 1).all()


def test_windows_never_cross_conversations(sf_small):
    # every context line's role prefix must belong to the same conversation:
    # reconstruct from the turns table and check the first context turn of
    # each window matches the turn at index max(0, i-K) of THAT conv
    got = dialog_windows(sf_small).to_pandas()
    turns = (
        read_turns(sf_small)
        .select_columns(["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
    )
    lookup = {
        (c, i): r + ": " + t
        for c, i, r, t in zip(
            turns["conv_id"], turns["turn_idx"], turns["role"], turns["text"]
        )
    }
    for _, row in got.head(200).iterrows():
        first_line = row["context"].split("\n")[0]
        i = int(row["turn_idx"])
        assert lookup[(row["conv_id"], max(0, i - WINDOW_K))] == first_line


def test_role_transitions_count_and_no_cross_conv(sf_small):
    from phenobert_ray.functions.sft import role_transition_counts
    from phenobert_ray.transcripts import read_turns

    got = role_transition_counts(sf_small).to_pandas()
    turns = read_turns(sf_small).to_pandas()
    # total transitions == sum over convs of (len - 1): windows never
    # cross conversation boundaries
    want_total = (turns.groupby("conv_id").size() - 1).sum()
    assert got["n"].sum() == want_total
    # brute-force the full matrix serially
    want = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["role"]
        .apply(lambda r: list(zip(r[:-1], r[1:])))
        .explode()
        .dropna()
        .value_counts()
    )
    for (a, b), n in want.items():
        assert got.set_index(["role_from", "role_to"]).loc[(a, b), "n"] == n
