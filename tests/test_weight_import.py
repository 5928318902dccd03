"""Reference-weight importer (tools/import_reference_weights.py): builds
release-shaped WHOLE-model pickles (torch.save(model) zip AND legacy
formats, the ModelSaver shape of util.py:600-611), runs the importer, and
checks the converted model dir is bit-identical and drives the scorer.

The last test is the real-artifact gate: it runs only on a machine where
the reference's released weights exist (they are Google-Drive downloads,
absent here) and asserts the imported pipeline hits the P/R ≥ 0.95
north-rule target on GSC+.
"""

import os

import numpy as np
import pytest

from phenobert_ray.assets.mini_hpo import mini_dag
from phenobert_ray.state.torch_ckpt import (
    ModuleSpec,
    read_state_dict,
    write_module_tree,
)

E, C, D = 32, 16, 16  # fastText dim / conv channels / encoder output dim


def _cnn_encoder(rng):
    return ModuleSpec("model.CNNEncoder", modules={
        "conv": ModuleSpec("torch.nn.modules.conv.Conv1d", params={
            "weight": rng.standard_normal((C, E, 1)).astype(np.float32),
            "bias": rng.standard_normal(C).astype(np.float32),
        }),
        "linear": ModuleSpec("torch.nn.modules.linear.Linear", params={
            "weight": rng.standard_normal((D, C)).astype(np.float32),
            "bias": rng.standard_normal(D).astype(np.float32),
        }),
    })


def _build_reference_release(tmp_path, rng, dag):
    """Write models/ + fasttext.bin exactly as the reference releases them."""
    mdir = tmp_path / "models" / "HPOModel_H"
    mdir.mkdir(parents=True)
    n_class = len(dag.layer1)
    write_module_tree(str(mdir / "model_layer1.pkl"), ModuleSpec(
        "model.HPO_model_Layer1",
        modules={
            "Encoder": _cnn_encoder(rng),
            "linear": ModuleSpec("torch.nn.modules.linear.Linear", params={
                "weight": rng.standard_normal((n_class + 1, D)).astype(np.float32),
                "bias": rng.standard_normal(n_class + 1).astype(np.float32),
            }),
        },
        extra={"n_class": n_class},
    ))
    for i, l1 in enumerate(dag.layer1):
        members = sorted({l1} | (dag.descendants.get(l1, set()) & dag.abnormality))
        write_module_tree(
            str(mdir / f"model_l1_{i}.pkl"),
            ModuleSpec(
                "model.HPOModel",
                params={"H0": rng.standard_normal(
                    (len(members) + 1, D)).astype(np.float32)},
                modules={
                    "Encoder": _cnn_encoder(rng),
                    "GCNNet": ModuleSpec("model.GraphConvNet", modules={
                        "gcn1": ModuleSpec("model.GraphConvolution", params={
                            "bias": rng.standard_normal(D).astype(np.float32),
                        }),
                    }),
                },
            ),
            legacy=(i % 2 == 1),  # cover BOTH torch serialization formats
        )

    # BertForSentenceMatching: bert.model.encoder.* (standard BertModel)
    # + top-level classifier + the tokenizer vocab buried in the wrapper
    H, FF, V, S = 8, 16, 24, 32
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + [f"tok{i}" for i in range(V - 4)])}
    lin = lambda o, i: {  # noqa: E731
        "weight": rng.standard_normal((o, i)).astype(np.float32),
        "bias": rng.standard_normal(o).astype(np.float32)}
    ln = lambda h: {"weight": np.ones(h, np.float32),  # noqa: E731
                    "bias": np.zeros(h, np.float32)}
    layer0 = ModuleSpec("torch.nn.modules.module.BertLayer", modules={
        "attention": ModuleSpec("m.BertAttention", modules={
            "self": ModuleSpec("m.BertSelfAttention", modules={
                k: ModuleSpec("torch.nn.modules.linear.Linear",
                              params=lin(H, H))
                for k in ("query", "key", "value")}),
            "output": ModuleSpec("m.BertSelfOutput", modules={
                "dense": ModuleSpec("torch.nn.modules.linear.Linear",
                                    params=lin(H, H)),
                "LayerNorm": ModuleSpec("m.LayerNorm", params=ln(H))}),
        }),
        "intermediate": ModuleSpec("m.BertIntermediate", modules={
            "dense": ModuleSpec("torch.nn.modules.linear.Linear",
                                params=lin(FF, H))}),
        "output": ModuleSpec("m.BertOutput", modules={
            "dense": ModuleSpec("torch.nn.modules.linear.Linear",
                                params=lin(H, FF)),
            "LayerNorm": ModuleSpec("m.LayerNorm", params=ln(H))}),
    })
    bert_model = ModuleSpec("m.BertModel", modules={
        "embeddings": ModuleSpec("m.BertEmbeddings", modules={
            "word_embeddings": ModuleSpec("m.Embedding", params={
                "weight": rng.standard_normal((V, H)).astype(np.float32)}),
            "position_embeddings": ModuleSpec("m.Embedding", params={
                "weight": rng.standard_normal((S, H)).astype(np.float32)}),
            "token_type_embeddings": ModuleSpec("m.Embedding", params={
                "weight": rng.standard_normal((2, H)).astype(np.float32)}),
            "LayerNorm": ModuleSpec("m.LayerNorm", params=ln(H)),
        }),
        "encoder": ModuleSpec("m.BertEncoder", modules={
            "layer": ModuleSpec("torch.nn.modules.container.ModuleList",
                                modules={"0": layer0}),
        }),
    })
    write_module_tree(str(tmp_path / "models" / "bert_model_max_triple.pkl"),
                      ModuleSpec(
        "fastNLP.models.Mybert.BertForSentenceMatching",
        modules={
            "bert": ModuleSpec("fastNLP.embeddings.BertEmbedding", modules={
                "model": ModuleSpec("fastNLP._WordBertModel",
                                    modules={"encoder": bert_model},
                                    extra={"tokenzier": {"vocab": vocab}}),
            }),
            "classifier": ModuleSpec("torch.nn.modules.linear.Linear",
                                     params=lin(3, H)),
        },
    ))

    from phenobert_ray.state.fasttext_bin import write_fasttext_bin

    words = ["</s>", "seizure", "ataxia", "obesity"]
    bucket = 64
    write_fasttext_bin(
        str(tmp_path / "fasttext_pubmed.bin"), words,
        rng.standard_normal((len(words) + bucket, E)).astype(np.float32),
        bucket)
    return vocab


def test_import_reference_release(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import import_reference_weights as irw

    dag = mini_dag()
    rng = np.random.default_rng(7)
    _build_reference_release(tmp_path, rng, dag)
    out = tmp_path / "converted"
    rc = irw.main([
        "--models-dir", str(tmp_path / "models"),
        "--fasttext", str(tmp_path / "fasttext_pubmed.bin"),
        "--out", str(out),
    ])
    assert rc == 0

    # every expected artifact exists
    names = set(os.listdir(out))
    assert {"l1.pt", "bert.pt", "bert_vocab.txt", "fasttext.bin",
            "DAG.json"} <= names
    subs = {n for n in names if n.startswith("sub_HP_")}
    assert len(subs) == len(dag.layer1)

    # bit-exact round trip: whole-model pickle -> state dict file
    l1 = read_state_dict(str(out / "l1.pt"))
    assert set(l1) == {"Encoder.conv.weight", "Encoder.conv.bias",
                       "Encoder.linear.weight", "Encoder.linear.bias",
                       "linear.weight", "linear.bias"}
    assert l1["linear.weight"].shape == (len(dag.layer1) + 1, D)

    bert = read_state_dict(str(out / "bert.pt"))
    assert "embeddings.word_embeddings.weight" in bert  # prefix stripped
    assert "classifier.weight" in bert
    assert bert["classifier.weight"].shape == (3, 8)
    vocab_lines = (out / "bert_vocab.txt").read_text().splitlines()
    assert vocab_lines[:4] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]

    # the converted dir loads through the standard path and scores spans,
    # with fastText (not hash) token vectors driving the CNNs
    from phenobert_ray.candidates import Candidate
    from phenobert_ray.config import PipelineConfig
    from phenobert_ray.standins import load_torch_scorer

    scorer = load_torch_scorer(str(out), dag, PipelineConfig(param1=0.0))
    from phenobert_ray.state.fasttext_bin import FastTextBin

    ft = FastTextBin(str(tmp_path / "fasttext_pubmed.bin"))
    np.testing.assert_allclose(scorer.token_vec("seizure"),
                               ft.get_word_vector("seizure"), atol=1e-6)
    res = scorer([Candidate(tokens=["seizure"], starts=[0], start=0, end=7)])
    assert isinstance(res, list)
    assert scorer.bert is not None


def test_legacy_and_zip_formats_agree(tmp_path):
    from phenobert_ray.state.torch_ckpt import (
        flatten_module_state, read_module_tree)

    rng = np.random.default_rng(9)
    spec = ModuleSpec("model.X", modules={"Encoder": _cnn_encoder(rng)},
                      params={"H0": rng.standard_normal((5, D)).astype(np.float32)})
    write_module_tree(str(tmp_path / "zip.pkl"), spec)
    write_module_tree(str(tmp_path / "legacy.pkl"), spec, legacy=True)
    a = flatten_module_state(read_module_tree(str(tmp_path / "zip.pkl")))
    b = flatten_module_state(read_module_tree(str(tmp_path / "legacy.pkl")))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_module_unpickler_is_inert(tmp_path):
    """Globals in a whole-model pickle resolve to attribute-holder stubs —
    no class code from the pickle can run (os.system here would fire at
    REDUCE time if the unpickler resolved real globals)."""
    import io
    import pickle
    import zipfile

    from phenobert_ray.state.torch_ckpt import read_module_tree

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned > " + str(tmp_path / "pwned"),))

    payload = io.BytesIO()
    # craft GLOBAL os.system REDUCE by hand (pickle of Evil would resolve
    # os.system through OUR unpickler, which must stub it out)
    pickle.dump(Evil(), payload)
    p = str(tmp_path / "evil.pkl")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", payload.getvalue())
    obj = read_module_tree(p)
    assert not (tmp_path / "pwned").exists()
    assert obj.__class__.__name__ == "system"  # inert stub, nothing ran


REAL_MODELS = os.environ.get("PHENOBERT_REFERENCE_MODELS", "")


@pytest.mark.skipif(
    not (REAL_MODELS and os.path.exists(
        os.path.join(REAL_MODELS, "HPOModel_H", "model_layer1.pkl"))),
    reason="reference release weights not present (Google-Drive artifacts; "
           "set PHENOBERT_REFERENCE_MODELS to the downloaded models dir)",
)
def test_real_weights_north_rule_gate(tmp_path):
    """With the actual released weights: import, annotate GSC+, and gate
    micro P/R ≥ 0.95 vs the reference annotations (BASELINE.json metric)."""
    import subprocess
    import sys as _sys

    out = str(tmp_path / "real_converted")
    args = ["--models-dir", REAL_MODELS, "--out", out]
    ft = os.environ.get("PHENOBERT_REFERENCE_FASTTEXT", "")
    if ft:
        args += ["--fasttext", ft]
    hpo = os.environ.get("PHENOBERT_REFERENCE_HPO_JSON", "")
    if hpo:
        args += ["--hpo-json", hpo]
    import import_reference_weights as irw

    assert irw.main(args) == 0
    gsc = os.environ.get("PHENOBERT_GSC_DIR", "")
    if not gsc:
        pytest.skip("PHENOBERT_GSC_DIR not set")
    r = subprocess.run(
        [_sys.executable, "tools/eval_corpus.py", os.path.join(gsc, "corpus"),
         os.path.join(gsc, "ann"), "--model-dir", out, "--json"],
        capture_output=True, text=True, check=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    import json

    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["micro_p"] >= 0.95 and m["micro_r"] >= 0.95


def test_legacy_header_pickles_are_restricted(tmp_path):
    """The legacy (non-zip) stream's FOUR header pickles (magic, protocol,
    sysinfo, storage keys) must go through the primitives-only unpickler:
    a malicious header must raise, never execute (review r4 — they went
    through plain pickle.load before)."""
    import pickle

    import pytest as _pytest

    from phenobert_ray.state.torch_ckpt import read_module_tree

    class Evil:
        def __reduce__(self):
            return (os.system, ("echo pwned > " + str(tmp_path / "pwned"),))

    p = str(tmp_path / "evil_legacy.pkl")
    with open(p, "wb") as f:
        pickle.dump(Evil(), f, protocol=2)  # first header object = payload
    with _pytest.raises(pickle.UnpicklingError, match="refusing"):
        read_module_tree(p)
    assert not (tmp_path / "pwned").exists()
