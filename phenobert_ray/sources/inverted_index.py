"""Inverted index hpo_id → conversation postings (S7/A5, SURVEY.md §2.1/§2.6).

Re-creates the GeneReviews search engine semantics
(/root/reference/phenobert/utils/gene_reviews_search_engine.py:8-43): build
``hpo → set(doc)`` postings from annotations, then probe with AND/OR set
semantics.

Scale notes: ``groupby("hpo_id")`` alone is skew-prone (a hot phenotype can
appear in most conversations), so the build pre-aggregates per block — each
block contributes at most one partial row per hpo — before the shuffle, and
the reducer merges small sorted lists instead of raw annotation rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..stages.shuffle import from_pandas_clean


def build_inverted_index(annotations_ds, include_negated: bool = False):
    """annotations → Dataset[(hpo_id, n_convs, convs:list<string>)]."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["hpo_id", "conv_id", "negated"]).to_pandas()
        if not include_negated:
            df = df[~df.negated]
        g = (
            df.groupby("hpo_id")["conv_id"]
            .agg(lambda s: sorted(set(s)))
            .reset_index()
            .rename(columns={"conv_id": "convs"})
        )
        return from_pandas_clean(g)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        convs = sorted({c for lst in df["convs"] for c in lst})
        return pd.DataFrame(
            {"hpo_id": [df.hpo_id.iloc[0]], "n_convs": [len(convs)], "convs": [convs]}
        )

    return (
        annotations_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hpo_id")
        .map_groups(merge, batch_format="pandas")
    )


def search(index_df: pd.DataFrame, terms: list[str], mode: str = "and") -> list[str]:
    """Driver-side probe with AND/OR semantics over the (small) index
    (gene_reviews_search_engine.py:31-43)."""
    postings = []
    lut = dict(zip(index_df["hpo_id"], index_df["convs"]))
    for t in terms:
        postings.append(set(lut.get(t, [])))
    if not postings:
        return []
    acc = postings[0]
    for s in postings[1:]:
        acc = acc & s if mode == "and" else acc | s
    return sorted(acc)


def search_convs_with_all(annotations_ds, hpo_ids: list[str]):
    """Distributed AND-probe (gene_reviews_search_engine.py:31-39 semantics
    without collecting the index): conversations containing EVERY id in
    ``hpo_ids`` — per-conv flag aggregation via the bucketed exchange."""
    import pyarrow.compute as pc

    from ..stages.shuffle import two_phase_groupby

    wanted = list(hpo_ids)

    def flags(b: pa.Table) -> pa.Table:
        b = b.filter(pc.invert(b.column("negated")))
        df = b.select(["conv_id", "hpo_id"]).to_pandas()
        for i, h in enumerate(wanted):
            df[f"f{i}"] = (df["hpo_id"] == h).astype("int64")
        return from_pandas_clean(df.drop(columns=["hpo_id"]))

    aggs = {f"f{i}": (f"f{i}", "max", "max") for i in range(len(wanted))}
    per_conv = two_phase_groupby(
        annotations_ds.map_batches(flags, batch_format="pyarrow"),
        keys=["conv_id"],
        aggs=aggs,
    )

    def keep_all(df: pd.DataFrame) -> pd.DataFrame:
        mask = pd.Series(True, index=df.index)
        for i in range(len(wanted)):
            mask &= df[f"f{i}"] == 1
        return df.loc[mask, ["conv_id"]]

    return per_conv.map_batches(keep_all, batch_format="pandas")
