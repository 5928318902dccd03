"""Hermetic numpy trainer for the Step-3 BERT matcher.

Re-creates the reference's third training recipe (my_bert_match.py:91-170:
BertForSentenceMatching over ``a::b\\tlabel`` rows, 3 classes, Adam lr 2e-5,
CE loss) without torch/fastNLP/BioBERT:

- training rows come from ``assets.train_pairs.produce_match_pairs`` (the
  produce_data4train_new.py reconstruction) over the SAME train-source
  ontology the CNN stack trains on — the reference's
  ``models/all4bert_new_triple.txt`` is not shipped (external pipeline),
  so the producer regenerates its format from the shipped dictionary;
- the WordPiece vocab is built from the dictionary phrases (whole words
  seen ≥ min_freq, plus single-char and ``##``-char pieces so every OOV
  word still tokenizes instead of collapsing to [UNK]);
- the model is a standard-layout BERT state dict (the exact keys
  ``bert_np.BertNP`` loads) sized for the task (default L=2, H=128,
  heads=4, I=512) — NOT BioBERT-base: with ~60k synthetic pairs a 110M
  model is pure overfit, and the checkpoint must ship in-repo;
- exact backprop through the ``bert_np`` forward (embeddings+LN, MHA,
  erf-GELU FFN, residual+LN per layer, CLS classifier), Adam, early
  stopping on a held-out split.

Input prep parity: pairs are encoded EXACTLY as inference encodes them
(``textops.addwords_tokens`` per side → ``[CLS] a [SEP] b [SEP]`` with
token types 0/0/1 — BertMatcherNP._encode_pair), so train and inference
distributions match by construction.
"""

from __future__ import annotations

import numpy as np

from .train_np import Adam, _batches

_SQRT2 = np.float32(np.sqrt(2.0))
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


# --------------------------------------------------------------------------
# vocab

SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]


def build_wordpiece_vocab(phrases, min_freq: int = 1) -> dict[str, int]:
    """Word-level vocab + char/##char fallback pieces from an iterable of
    already-addwords-tokenized word lists."""
    from collections import Counter

    words = Counter()
    chars = set()
    for toks in phrases:
        for w in toks:
            words[w] += 1
            chars.update(w)
    vocab: dict[str, int] = {}
    for s in SPECIALS:
        vocab[s] = len(vocab)
    for c in sorted(chars):
        vocab[c] = len(vocab)
        vocab["##" + c] = len(vocab)
    for w, n in sorted(words.items()):
        if n >= min_freq and w not in vocab:
            vocab[w] = len(vocab)
    return vocab


# --------------------------------------------------------------------------
# init (torch BERT defaults: trunc-normal 0.02, LN at 1/0)

def init_bert(rng: np.random.Generator, V: int, H: int = 128, L: int = 2,
              I: int = 512, n_labels: int = 3, max_pos: int = 64) -> dict:
    def tn(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    p = {
        "embeddings.word_embeddings.weight": tn(V, H),
        "embeddings.position_embeddings.weight": tn(max_pos, H),
        "embeddings.token_type_embeddings.weight": tn(2, H),
        "embeddings.LayerNorm.weight": np.ones(H, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(H, np.float32),
        "classifier.weight": tn(n_labels, H),
        "classifier.bias": np.zeros(n_labels, np.float32),
    }
    for i in range(L):
        pre = f"encoder.layer.{i}."
        for name, shape in (
            ("attention.self.query", (H, H)),
            ("attention.self.key", (H, H)),
            ("attention.self.value", (H, H)),
            ("attention.output.dense", (H, H)),
            ("intermediate.dense", (I, H)),
            ("output.dense", (H, I)),
        ):
            p[pre + name + ".weight"] = tn(*shape)
            p[pre + name + ".bias"] = np.zeros(shape[0], np.float32)
        for name in ("attention.output.LayerNorm", "output.LayerNorm"):
            p[pre + name + ".weight"] = np.ones(H, np.float32)
            p[pre + name + ".bias"] = np.zeros(H, np.float32)
    return p


# --------------------------------------------------------------------------
# forward/backward kernels

def _ln_fwd(x, w, b, eps=1e-12):
    mu = x.mean(axis=-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xhat = xc * inv
    return xhat * w + b, (xhat, inv, w)


def _ln_bwd(dout, cache):
    xhat, inv, w = cache
    H = xhat.shape[-1]
    dw = (dout * xhat).sum(axis=tuple(range(dout.ndim - 1)))
    db = dout.sum(axis=tuple(range(dout.ndim - 1)))
    dxhat = dout * w
    dx = inv * (
        dxhat
        - dxhat.mean(axis=-1, keepdims=True)
        - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True)
    )
    return dx, dw, db


def _lin_fwd(x, w, b):
    return x @ w.T + b, x


def _lin_bwd(dout, x, w):
    flat_d = dout.reshape(-1, dout.shape[-1])
    flat_x = x.reshape(-1, x.shape[-1])
    dw = flat_d.T @ flat_x
    db = flat_d.sum(axis=0)
    dx = dout @ w
    return dx, dw, db


def _gelu_fwd(x):
    from .bert_np import _erf

    cdf = 0.5 * (1.0 + _erf(x / _SQRT2))
    return x * cdf, (x, cdf)


def _gelu_bwd(dout, cache):
    x, cdf = cache
    pdf = _INV_SQRT2PI * np.exp(-0.5 * x * x)
    return dout * (cdf + x * pdf)


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


# --------------------------------------------------------------------------
# full model forward/backward (mirrors bert_np.BertNP.encode exactly)

def bert_forward(p: dict, ids, types, mask, num_heads: int):
    B, S = ids.shape
    H = p["embeddings.word_embeddings.weight"].shape[1]
    nh, dh = num_heads, H // num_heads
    x = (
        p["embeddings.word_embeddings.weight"][ids]
        + p["embeddings.position_embeddings.weight"][:S][None, :, :]
        + p["embeddings.token_type_embeddings.weight"][types]
    )
    x, emb_ln_cache = _ln_fwd(x, p["embeddings.LayerNorm.weight"],
                              p["embeddings.LayerNorm.bias"])
    att_bias = (1.0 - mask[:, None, None, :]) * -1e9
    caches = []
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in p:
        pre = f"encoder.layer.{i}."
        x_in = x
        q, _ = _lin_fwd(x, p[pre + "attention.self.query.weight"],
                        p[pre + "attention.self.query.bias"])
        k, _ = _lin_fwd(x, p[pre + "attention.self.key.weight"],
                        p[pre + "attention.self.key.bias"])
        v, _ = _lin_fwd(x, p[pre + "attention.self.value.weight"],
                        p[pre + "attention.self.value.bias"])
        qh = q.reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
        att = _softmax(qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh) + att_bias)
        ctx = (att @ vh).transpose(0, 2, 1, 3).reshape(B, S, H)
        ao, _ = _lin_fwd(ctx, p[pre + "attention.output.dense.weight"],
                         p[pre + "attention.output.dense.bias"])
        x1, ln1_cache = _ln_fwd(x_in + ao,
                                p[pre + "attention.output.LayerNorm.weight"],
                                p[pre + "attention.output.LayerNorm.bias"])
        hmid, _ = _lin_fwd(x1, p[pre + "intermediate.dense.weight"],
                           p[pre + "intermediate.dense.bias"])
        hact, gelu_cache = _gelu_fwd(hmid)
        out, _ = _lin_fwd(hact, p[pre + "output.dense.weight"],
                          p[pre + "output.dense.bias"])
        x, ln2_cache = _ln_fwd(x1 + out, p[pre + "output.LayerNorm.weight"],
                               p[pre + "output.LayerNorm.bias"])
        caches.append((x_in, qh, kh, vh, att, ctx, x1, hact, gelu_cache,
                       ln1_cache, ln2_cache))
        i += 1
    cls = x[:, 0]
    logits, _ = _lin_fwd(cls, p["classifier.weight"], p["classifier.bias"])
    return logits, (ids, types, x, cls, caches, emb_ln_cache, nh, dh)


def bert_backward(p: dict, fwd_cache, dlogits) -> dict:
    ids, types, x_final, cls, caches, emb_ln_cache, nh, dh = fwd_cache
    B, S = ids.shape
    H = cls.shape[1]
    g: dict[str, np.ndarray] = {}

    dcls, g["classifier.weight"], g["classifier.bias"] = _lin_bwd(
        dlogits, cls, p["classifier.weight"]
    )
    dx = np.zeros_like(x_final)
    dx[:, 0] = dcls

    for i in reversed(range(len(caches))):
        pre = f"encoder.layer.{i}."
        (x_in, qh, kh, vh, att, ctx, x1, hact, gelu_cache,
         ln1_cache, ln2_cache) = caches[i]

        dres2, dw, db = _ln_bwd(dx, ln2_cache)
        g[pre + "output.LayerNorm.weight"] = dw
        g[pre + "output.LayerNorm.bias"] = db
        # residual: x1 + out
        dout = dres2
        dhact, dw, db = _lin_bwd(dout, hact, p[pre + "output.dense.weight"])
        g[pre + "output.dense.weight"] = dw
        g[pre + "output.dense.bias"] = db
        dhmid = _gelu_bwd(dhact, gelu_cache)
        dx1_ffn, dw, db = _lin_bwd(dhmid, x1,
                                   p[pre + "intermediate.dense.weight"])
        g[pre + "intermediate.dense.weight"] = dw
        g[pre + "intermediate.dense.bias"] = db
        dx1 = dres2 + dx1_ffn

        dres1, dw, db = _ln_bwd(dx1, ln1_cache)
        g[pre + "attention.output.LayerNorm.weight"] = dw
        g[pre + "attention.output.LayerNorm.bias"] = db
        # residual: x_in + attention_output
        dctx, dw, db = _lin_bwd(dres1, ctx,
                                p[pre + "attention.output.dense.weight"])
        g[pre + "attention.output.dense.weight"] = dw
        g[pre + "attention.output.dense.bias"] = db

        dctx_h = dctx.reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
        datt = dctx_h @ vh.transpose(0, 1, 3, 2)
        dvh = att.transpose(0, 1, 3, 2) @ dctx_h
        # softmax backward (per row of att)
        dscores = att * (datt - (datt * att).sum(axis=-1, keepdims=True))
        dscores /= np.sqrt(dh)
        dqh = dscores @ kh
        dkh = dscores.transpose(0, 1, 3, 2) @ qh

        dq = dqh.transpose(0, 2, 1, 3).reshape(B, S, H)
        dk = dkh.transpose(0, 2, 1, 3).reshape(B, S, H)
        dv = dvh.transpose(0, 2, 1, 3).reshape(B, S, H)
        dx_q, dw, db = _lin_bwd(dq, x_in, p[pre + "attention.self.query.weight"])
        g[pre + "attention.self.query.weight"] = dw
        g[pre + "attention.self.query.bias"] = db
        dx_k, dw, db = _lin_bwd(dk, x_in, p[pre + "attention.self.key.weight"])
        g[pre + "attention.self.key.weight"] = dw
        g[pre + "attention.self.key.bias"] = db
        dx_v, dw, db = _lin_bwd(dv, x_in, p[pre + "attention.self.value.weight"])
        g[pre + "attention.self.value.weight"] = dw
        g[pre + "attention.self.value.bias"] = db
        dx = dres1 + dx_q + dx_k + dx_v

    demb, dw, db = _ln_bwd(dx, emb_ln_cache)
    g["embeddings.LayerNorm.weight"] = dw
    g["embeddings.LayerNorm.bias"] = db
    g["embeddings.word_embeddings.weight"] = np.zeros_like(
        p["embeddings.word_embeddings.weight"]
    )
    np.add.at(g["embeddings.word_embeddings.weight"], ids, demb)
    g["embeddings.position_embeddings.weight"] = np.zeros_like(
        p["embeddings.position_embeddings.weight"]
    )
    g["embeddings.position_embeddings.weight"][:S] = demb.sum(axis=0)
    g["embeddings.token_type_embeddings.weight"] = np.zeros_like(
        p["embeddings.token_type_embeddings.weight"]
    )
    np.add.at(g["embeddings.token_type_embeddings.weight"], types, demb)
    return g


# --------------------------------------------------------------------------
# pair encoding (identical layout to BertMatcherNP._encode_pair)

def encode_pairs(pairs, tok, pad_id: int, cls_id: int, sep_id: int,
                 max_len: int = 64):
    """pairs: [(a_words, b_words)] → (ids, types, mask) int/float arrays."""
    encoded = []
    for a, b in pairs:
        ia, ib = tok.ids(a), tok.ids(b)
        seq = [cls_id, *ia, sep_id, *ib, sep_id][:max_len]
        tp = [0] * min(2 + len(ia), len(seq))
        tp = tp + [1] * (len(seq) - len(tp))
        encoded.append((seq, tp))
    S = max(len(s) for s, _ in encoded)
    B = len(encoded)
    ids = np.full((B, S), pad_id, np.int64)
    types = np.zeros((B, S), np.int64)
    mask = np.zeros((B, S), np.float32)
    for i, (seq, tp) in enumerate(encoded):
        ids[i, : len(seq)] = seq
        types[i, : len(tp)] = tp
        mask[i, : len(seq)] = 1.0
    return ids, types, mask


# --------------------------------------------------------------------------
# fit

def train_bert_matcher(
    samples: list[tuple[list[str], list[str], int]],
    vocab: dict[str, int],
    H: int = 128,
    L: int = 2,
    I: int = 512,
    num_heads: int = 4,
    epochs: int = 10,
    lr: float = 2e-5,
    batch: int = 64,
    seed: int = 0,
    val_frac: float = 0.1,
    patience: int = 3,
    max_len: int = 64,
    log=None,
) -> dict:
    """samples: (a_words, b_words, label∈{0,1,2}) with addwords-prep sides.
    Returns the bert.pt state dict (my_bert_match.py:91-170 recipe: CE fit,
    Adam — reference lr 2e-5 is tuned for a pretrained 110M model; a
    from-scratch small model needs the standard 1e-4..3e-4 band, so lr
    here defaults to 2e-5 only for recipe parity and train_all_bert
    passes 2e-4)."""
    from .bert_np import WordPieceTokenizer

    rng = np.random.default_rng(seed)
    p = init_bert(rng, len(vocab), H=H, L=L, I=I, max_pos=max_len)
    opt = Adam(p, lr=lr)
    tok = WordPieceTokenizer(vocab)
    pad_id, cls_id, sep_id = vocab["[PAD]"], vocab["[CLS]"], vocab["[SEP]"]

    ids, types, mask = encode_pairs(
        [(a, b) for a, b, _ in samples], tok, pad_id, cls_id, sep_id, max_len
    )
    labels = np.asarray([y for _, _, y in samples], np.int64)

    n_val = max(1, int(len(samples) * val_frac)) if len(samples) > 20 else 0
    order = np.random.default_rng(seed + 1).permutation(len(samples))
    val_idx, train_idx = order[:n_val], order[n_val:]

    def ce_and_acc(sel):
        logits, _ = bert_forward(p, ids[sel], types[sel], mask[sel], num_heads)
        probs = _softmax(logits)
        t = labels[sel]
        ce = float(-np.log(np.clip(probs[np.arange(len(sel)), t], 1e-9, None)).mean())
        return ce, float((probs.argmax(axis=1) == t).mean())

    best, best_state, bad = np.inf, None, 0
    for ep in range(epochs):
        for sel in _batches(len(train_idx), batch, rng):
            sel = train_idx[sel]
            logits, cache = bert_forward(p, ids[sel], types[sel], mask[sel],
                                         num_heads)
            probs = _softmax(logits)
            dlogits = probs
            dlogits[np.arange(len(sel)), labels[sel]] -= 1.0
            dlogits /= len(sel)
            opt.step(bert_backward(p, cache, dlogits))
        cur, acc = ce_and_acc(val_idx if n_val else train_idx[:256])
        if log:
            log(f"bert epoch {ep}: val CE {cur:.5f} acc {acc:.3f}")
        if cur < best - 1e-5:
            best, bad = cur, 0
            best_state = {k: v.copy() for k, v in p.items()}
        else:
            bad += 1
            if bad >= patience:
                break
    return best_state or p


def train_all_bert(
    models_dir: str,
    out_dir: str,
    n_per_class: int = 8000,
    epochs: int = 10,
    lr: float = 2e-4,
    seed: int = 0,
    log=print,
) -> dict:
    """Fit the matcher from the train-source ontology's generated 3-class
    pairs and write ``bert.pt`` + ``bert_vocab.txt`` that
    ``bert_np.load_bert_matcher`` / ``load_torch_scorer`` load directly."""
    import os

    from .assets.loader import dag_from_train_source
    from .assets.train_pairs import produce_match_pairs
    from .state.torch_ckpt import write_state_dict
    from .textops import addwords_tokens

    os.makedirs(out_dir, exist_ok=True)
    dag = dag_from_train_source(models_dir)
    t = produce_match_pairs(dag, seed=seed, n_per_class=n_per_class)
    samples = [
        (addwords_tokens(a), addwords_tokens(b), int(y))
        for a, b, y in zip(t.column("phrase_a").to_pylist(),
                           t.column("phrase_b").to_pylist(),
                           t.column("label").to_pylist())
        if addwords_tokens(a) and addwords_tokens(b)
    ]
    vocab = build_wordpiece_vocab((w for a, b, _ in samples for w in (a, b)))
    log(f"bert matcher: {len(samples)} pairs, vocab {len(vocab)}")
    state = train_bert_matcher(samples, vocab, epochs=epochs, lr=lr,
                               seed=seed, log=log)
    write_state_dict(os.path.join(out_dir, "bert.pt"), state)
    with open(os.path.join(out_dir, "bert_vocab.txt"), "w",
              encoding="utf-8") as f:
        for w in sorted(vocab, key=vocab.get):
            f.write(w + "\n")
    return {"pairs": len(samples), "vocab": len(vocab)}
