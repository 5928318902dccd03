"""Checkpoint/resume invariant: a killed run resumed from manifests
produces identical triples (north rule; BASELINE.md targets)."""

import os
import shutil

import pandas as pd
import pyarrow.dataset as pads

from phenobert_ray.pipelines.annotate import run_job
from phenobert_ray.state.manifest import read_manifests


def _triples(out_dir):
    import glob

    files = sorted(
        glob.glob(os.path.join(out_dir, "shard=*", "*.parquet"))
        + glob.glob(os.path.join(out_dir, "ontology", "*.parquet"))
    )
    t = pads.dataset(files).to_table(columns=["subj", "pred", "obj"])
    return (
        t.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    )


def test_resume_identical(mini, sf_small, tmp_path):
    full = str(tmp_path / "full")
    run_job(sf_small, full, mini, num_shards=2)
    assert len(read_manifests(full)) == 2
    ref = _triples(full)

    # simulate a crash: run shard 0 only (kill before shard 1), then resume
    partial = str(tmp_path / "partial")
    run_job(sf_small, partial, mini, num_shards=2)
    # drop shard 1's output + manifest → the "crash"
    shutil.rmtree(os.path.join(partial, "shard=1"))
    os.remove(os.path.join(partial, "_MANIFEST", "shard-1.json"))
    stats = run_job(sf_small, partial, mini, num_shards=2)
    assert stats["shards_skipped"] == 1 and stats["shards_run"] == 1

    pd.testing.assert_frame_equal(ref, _triples(partial))


def test_manifest_contents(mini, sf_small, tmp_path):
    out = str(tmp_path / "m")
    run_job(sf_small, out, mini, num_shards=1)
    (m,) = read_manifests(out)
    assert m["row_count"] > 0
    assert m["input_fingerprint"]
    assert m["content_hash"]
    # second run is a full skip
    stats = run_job(sf_small, out, mini, num_shards=1)
    assert stats == {
        "shards_run": 0, "shards_skipped": 1, "rows": 0, "shards_pruned": 0
    }


def test_resume_cleans_partial_shard(mini, sf_small, tmp_path):
    """A mid-shard kill leaves output files WITHOUT a manifest; the re-run
    must clear them (not append next to them) or the shard doubles up."""
    full = str(tmp_path / "full")
    run_job(sf_small, full, mini, num_shards=2)
    ref = _triples(full)

    crashed = str(tmp_path / "crashed")
    run_job(sf_small, crashed, mini, num_shards=2)
    # simulate: shard 1 was mid-write when killed — manifest missing, a
    # stale (complete-looking) parquet file still present
    os.remove(os.path.join(crashed, "_MANIFEST", "shard-1.json"))
    stats = run_job(sf_small, crashed, mini, num_shards=2)
    assert stats["shards_run"] == 1 and stats["shards_skipped"] == 1
    pd.testing.assert_frame_equal(ref, _triples(crashed))


def test_rerun_with_fewer_shards_prunes_stale(mini, sf_small, tmp_path):
    """Re-running with a smaller --shards must remove the previous run's
    higher-indexed shard dirs + manifests, or readers of out_dir see the
    same triples twice (stale shard=K next to the fresh layout)."""
    out = str(tmp_path / "shrink")
    run_job(sf_small, out, mini, num_shards=4)
    ref4 = _triples(out)
    stats = run_job(sf_small, out, mini, num_shards=2)
    assert stats["shards_pruned"] == 2
    assert not os.path.isdir(os.path.join(out, "shard=2"))
    assert not os.path.exists(os.path.join(out, "_MANIFEST", "shard-3.json"))
    assert len(read_manifests(out)) == 2
    # triples identical regardless of shard count
    pd.testing.assert_frame_equal(ref4, _triples(out))


def test_modified_input_same_size_invalidates(mini, sf_small, tmp_path):
    """An input file rewritten in place with the SAME byte length must not
    be silently skipped on resume (fingerprint folds in mtime_ns)."""
    src = str(tmp_path / "data")
    shutil.copytree(sf_small, src)
    out = str(tmp_path / "out")
    run_job(src, out, mini, num_shards=1)
    doc_path = os.path.join(src, "documents.parquet")
    os.utime(doc_path, ns=(os.stat(doc_path).st_atime_ns,
                           os.stat(doc_path).st_mtime_ns + 1_000_000))
    stats = run_job(src, out, mini, num_shards=1)
    assert stats["shards_run"] == 1 and stats["shards_skipped"] == 0


def test_generic_sharded_write_resumable(sf_small, tmp_path):
    """run_sharded works for NON-KG operator output too: a dedup result
    written in doc_id-range shards resumes identically after a crash."""
    import pyarrow.dataset as pads

    from phenobert_ray.state.sharded import run_sharded

    def specs():
        out = []
        for k, (a, b) in enumerate([(0, 250), (250, 10_000)]):
            expr = (pads.field("doc_id") >= a) & (pads.field("doc_id") < b)
            out.append(([f"{sf_small}/documents.parquet"], f"r:{a}:{b}", expr))
        return out

    def build(paths, expr):
        import hashlib

        import pandas as pd_
        import ray as _ray

        ds = _ray.data.read_parquet(paths, filter=expr,
                                    columns=["doc_id", "text"])

        def f(df: pd_.DataFrame) -> pd_.DataFrame:
            return pd_.DataFrame(
                {"doc_id": df["doc_id"].astype("int64"),
                 "text_md5": df["text"].map(
                     lambda t: hashlib.md5(t.encode()).hexdigest())}
            )

        return ds.map_batches(f, batch_format="pandas")

    out = str(tmp_path / "dedup_shards")
    stats = run_sharded(specs(), build, out, content_cols=["doc_id", "text_md5"])
    assert stats["shards_run"] == 2 and stats["rows"] == 500
    def read_all(base):
        import pyarrow as pa_

        tables = [pads.dataset(os.path.join(base, d)).to_table()
                  for d in sorted(os.listdir(base)) if d.startswith("shard=")]
        return (pa_.concat_tables(tables).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    ref = read_all(out)

    # crash shard 1 (manifest gone, stale files present) and resume
    os.remove(os.path.join(out, "_MANIFEST", "shard-1.json"))
    stats = run_sharded(specs(), build, out, content_cols=["doc_id", "text_md5"])
    assert stats == {"shards_run": 1, "shards_skipped": 1, "rows": 250,
                     "shards_pruned": 0}
    pd.testing.assert_frame_equal(ref, read_all(out))
