"""Unit tests for the hermetic numpy trainer (train_np).

Fast synthetic fits only — the full-corpus fit is exercised offline and
its packaged result is gated by tests/test_trained_model.py.
"""

import numpy as np


def _toy_subtree():
    """3 members with disjoint, distinctive token phrases + junk Nones."""
    members = ["HP:0000001", "HP:0000002", "HP:0000003"]
    phrases = {
        0: [["crimson", "falcon"], ["crimson", "raptor"], ["scarlet", "falcon"]],
        1: [["basalt", "ridge"], ["basalt", "plateau"], ["granite", "ridge"]],
        2: [["velvet", "lantern"], ["velvet", "beacon"], ["silk", "lantern"]],
    }
    nones = [["random", "verbiage"], ["unrelated", "prose"],
             ["generic", "filler"], ["nothing", "here"]]
    samples = [(toks, y) for y, ps in phrases.items() for toks in ps]
    samples += [(toks, 3) for toks in nones]
    samples *= 8  # enough rows for the split/oversample logic
    return samples, members


def test_train_subtree_learns_separation():
    from phenobert_ray.models_np import SubtreeModelNP
    from phenobert_ray.train_np import (HashEmbedder, batch_tensor,
                                        train_subtree)

    samples, members = _toy_subtree()
    n = len(members)
    L = np.eye(n + 1, dtype=np.float32)  # flat toy ontology
    state = train_subtree(samples, n, L, dims=(32, 32, 16), epochs=30,
                          seed=3, patience=30)

    # score through the REAL inference module (checkpoint-layout state)
    class _Dag:
        pass

    emb = HashEmbedder(32)
    x = batch_tensor([t for t, _ in samples[:13]], emb)
    # SubtreeModelNP needs a dag for hpo_of; build the minimal surface
    import types

    dag = types.SimpleNamespace(descendants={}, abnormality=set(members),
                                layer1=[members[0]])
    sub = SubtreeModelNP.__new__(SubtreeModelNP)
    from phenobert_ray.models_np import CnnEncoderNP

    sub.encoder = CnnEncoderNP(state, "Encoder.")
    sub.G = (L @ np.asarray(state["H0"], np.float32)
             + np.asarray(state["GCNNet.gcn1.bias"], np.float32))
    logits = sub.encoder(x) @ sub.G.T
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    top = probs.argmax(axis=1)
    want = np.array([y for _, y in samples[:13]])
    acc = float((top == want).mean())
    assert acc >= 0.9, f"toy subtree fit accuracy {acc}"
    # calibration scales logits toward the p2 decision bar: the correct
    # member must dominate the ranking with real margin (toy-scale data is
    # too small to pin the absolute 0.6 softmax bar itself)
    memrows = want < len(members)
    conf = probs[np.arange(len(want)), want]
    assert float(conf[memrows].mean()) >= 0.5


def test_train_l1_router_learns_routing():
    from phenobert_ray.models_np import L1RouterNP
    from phenobert_ray.train_np import (HashEmbedder, batch_tensor,
                                        train_l1_router)

    # 2 L1 classes + None; multi-label targets (class 0 phrases also route
    # to class 1 sometimes — exercise the BCE multi-label path)
    cls0 = [["crimson", "falcon"], ["scarlet", "falcon"], ["crimson", "raptor"]]
    cls1 = [["basalt", "ridge"], ["granite", "ridge"], ["basalt", "plateau"]]
    nones = [["random", "verbiage"], ["generic", "filler"]]
    samples = ([(t, [0]) for t in cls0] + [(t, [1]) for t in cls1]
               + [(t, [2]) for t in nones]) * 8
    state = train_l1_router(samples, n_class=2, dims=(32, 32, 16),
                            epochs=30, seed=5, patience=30)
    router = L1RouterNP(state)
    emb = HashEmbedder(32)
    y = router(batch_tensor(cls0 + cls1 + nones, emb))
    # routed slots: sigmoid >= 0.5 on the right class, None stays low on
    # member phrases; junk rows prefer the None slot over both classes
    assert (y[:3, 0] >= 0.5).all() and (y[3:6, 1] >= 0.5).all()
    assert (y[:6, 2] < 0.5).all()
    assert (y[6:, 2] > y[6:, 0]).all() and (y[6:, 2] > y[6:, 1]).all()


def test_simplified_tokens_matches_inference_stream():
    from phenobert_ray.train_np import simplified_tokens

    # stopwords and numbers drop, NUM words map — the same stream
    # inference candidates carry (util.py:239-252 semantics)
    assert simplified_tokens("atrial septal defect") == [
        "atrial", "septal", "defect"]
    assert simplified_tokens("defect of the atrium") == ["defect", "atrium"]
    assert "3" not in simplified_tokens("type 3 seizure")


def test_quantize_ckpt_dir_roundtrip(tmp_path):
    from phenobert_ray.state.torch_ckpt import read_state_dict, write_state_dict
    from phenobert_ray.train_np import quantize_ckpt_dir

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    rng = np.random.default_rng(0)
    st = {"w": rng.standard_normal((4, 3)).astype(np.float32),
          "b": np.arange(3, dtype=np.int64)}
    write_state_dict(str(src / "l1.pt"), st)
    (src / "DAG.json").write_text("{}")
    quantize_ckpt_dir(str(src), str(dst))
    out = read_state_dict(str(dst / "l1.pt"))
    assert out["w"].dtype == np.float16
    assert out["b"].dtype == np.int64  # non-float tensors pass through
    np.testing.assert_allclose(out["w"].astype(np.float32), st["w"],
                               atol=1e-3)
    assert (dst / "DAG.json").read_text() == "{}"


def test_router_learns_embedding_table():
    from phenobert_ray.train_np import (TableEmbedder, hash_init_table,
                                        train_l1_router)

    cls0 = [["crimson", "falcon"], ["scarlet", "falcon"], ["crimson", "raptor"]]
    cls1 = [["basalt", "ridge"], ["granite", "ridge"], ["basalt", "plateau"]]
    nones = [["random", "verbiage"], ["generic", "filler"]]
    samples = ([(t, [0]) for t in cls0] + [(t, [1]) for t in cls1]
               + [(t, [2]) for t in nones]) * 8
    state = train_l1_router(samples, n_class=2, dims=(32, 32, 16),
                            epochs=20, seed=5, patience=20,
                            learn_embeddings=True)
    vocab_list = state.pop("_vocab")
    table = state.pop("embedding.weight")
    assert table.shape == (len(vocab_list), 32)
    vocab = {t: i for i, t in enumerate(vocab_list)}
    # training moved the rows off their hash init
    init = hash_init_table(vocab, 32)
    assert float(np.abs(table - init).max()) > 1e-4
    # TableEmbedder: in-vocab row vs OOV hash fallback
    emb = TableEmbedder(table, vocab)
    np.testing.assert_array_equal(emb("falcon"), table[vocab["falcon"]])
    assert emb("zzzqq").shape == (32,)


def test_train_all_mutual_exclusion_leaves_no_stray_bin(tmp_path):
    """fasttext_bin + learn_embeddings must fail BEFORE copying the bin:
    a stray fasttext.bin in out_dir would silently win over a
    subsequently-trained embedding table in load_torch_scorer's branch
    order (review r4)."""
    import os

    import pytest

    from phenobert_ray.train_np import train_all

    bin_path = tmp_path / "vec.bin"
    bin_path.write_bytes(b"not read before validation")
    out = tmp_path / "out"
    with pytest.raises(ValueError, match="mutually exclusive"):
        train_all("/root/reference/phenobert/models", str(out),
                  fasttext_bin=str(bin_path), learn_embeddings=True,
                  log=lambda *a: None)
    assert not os.path.exists(out / "fasttext.bin")
