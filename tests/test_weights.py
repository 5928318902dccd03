"""Weight-format loading path (VERDICT r1 item 7): a tiny random state dict
written in the torch.save zip layout must load through load_torch_scorer
(torch-free reader) and drive one annotate_turns batch end-to-end."""

import numpy as np
import pandas as pd
import pytest
import ray


def test_ckpt_roundtrip(tmp_path):
    from phenobert_ray.state.torch_ckpt import read_state_dict, write_state_dict

    rng = np.random.default_rng(3)
    state = {
        "embedding.weight": rng.standard_normal((7, 256)).astype(np.float32),
        "fc.bias": rng.standard_normal(5).astype(np.float64),
        "steps": np.array(12345, dtype=np.int64),
    }
    p = str(tmp_path / "m.pt")
    write_state_dict(p, state)
    back = read_state_dict(p)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(np.asarray(back[k]), state[k])
        assert np.asarray(back[k]).dtype == state[k].dtype


def test_ckpt_refuses_malicious_globals(tmp_path):
    """The restricted unpickler must refuse non-tensor globals."""
    import io
    import pickle
    import zipfile

    from phenobert_ray.state.torch_ckpt import read_state_dict

    evil = pickle.dumps(print)  # GLOBAL builtins.print
    p = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", evil)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        read_state_dict(p)


def test_loaded_weights_drive_annotate_batch(mini, tmp_path):
    """load_torch_scorer on a reference-layout fixture, end-to-end through
    one annotate_turns batch with the model stages active."""
    from phenobert_ray.config import PipelineConfig
    from phenobert_ray.stages.annotate import _annotate_batch
    from phenobert_ray.standins import DIM, LoadedEmbeddingCache, load_torch_scorer
    from phenobert_ray.state.torch_ckpt import write_state_dict

    vocab = ["seizure", "febrile", "obesity", "blindness", "impairment"]
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((len(vocab), DIM)).astype(np.float32)
    write_state_dict(str(tmp_path / "embedding.pt"), {"embedding.weight": mat})
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))

    cfg = PipelineConfig(use_model_standins=True)
    scorer = load_torch_scorer(str(tmp_path), mini, cfg)
    assert isinstance(scorer.emb, LoadedEmbeddingCache)
    # in-vocab token uses the loaded row
    v = scorer.emb.phrase(["seizure"])
    np.testing.assert_allclose(v, mat[0] / np.linalg.norm(mat[0]), rtol=1e-6)

    import pyarrow as pa

    batch = pa.table(
        {
            "conv_id": ["c-1", "c-1", "c-2"],
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "text": [
                "patient reports a febrile seizure today",
                "no signs of obesity",
                "total blindness in the left eye",
            ],
        }
    )
    out = _annotate_batch(batch, mini, scorer, cfg)
    assert out.num_rows >= 1
    assert set(out.column("hpo_id").to_pylist()) <= set(
        h for h in mini.abnormality
    ) | {"HP:0000001"}


def test_missing_weights_raise(mini, tmp_path):
    from phenobert_ray.config import PipelineConfig
    from phenobert_ray.standins import load_torch_scorer

    with pytest.raises(NotImplementedError, match="weight files"):
        load_torch_scorer(str(tmp_path), mini, PipelineConfig())
