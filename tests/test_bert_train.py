"""Unit tests for the numpy BERT matcher trainer (bert_train_np).

The full-corpus fit runs offline (train_all_bert); these gate the
machinery: exact backprop (finite-difference check), learnability on a
tiny synthetic 3-class task, and state-dict compatibility with the
inference module (bert_np.BertNP)."""

import numpy as np


def test_bert_backward_matches_finite_differences():
    from phenobert_ray.bert_train_np import (_softmax, bert_backward,
                                             bert_forward, init_bert)

    rng = np.random.default_rng(0)
    V, H, L, I, nh, S, B = 11, 8, 2, 16, 2, 5, 3
    p = init_bert(rng, V, H=H, L=L, I=I, max_pos=8)
    for k in p:  # non-trivial LN weights so their grads are exercised
        if "LayerNorm.weight" in k:
            p[k] = (1.0 + 0.1 * rng.standard_normal(p[k].shape)).astype(
                np.float32)
    p = {k: v.astype(np.float64) for k, v in p.items()}

    ids = rng.integers(0, V, (B, S))
    types = rng.integers(0, 2, (B, S)).astype(np.int64)
    mask = np.ones((B, S))
    mask[0, -2:] = 0.0  # exercise the attention mask path
    labels = np.array([0, 1, 2])

    def loss_of():
        logits, _ = bert_forward(p, ids, types, mask, nh)
        probs = _softmax(logits)
        return -np.log(probs[np.arange(B), labels]).mean()

    logits, cache = bert_forward(p, ids, types, mask, nh)
    probs = _softmax(logits)
    d = probs
    d[np.arange(B), labels] -= 1.0
    d /= B
    g = bert_backward(p, cache, d)

    eps = 1e-6
    check_rng = np.random.default_rng(7)
    for k in sorted(g):
        flat = p[k].reshape(-1)
        for i in check_rng.choice(flat.size, size=min(3, flat.size),
                                  replace=False):
            old = flat[i]
            flat[i] = old + eps
            lp = loss_of()
            flat[i] = old - eps
            lm = loss_of()
            flat[i] = old
            num = (lp - lm) / (2 * eps)
            ana = g[k].reshape(-1)[i]
            rel = abs(num - ana) / max(1e-8, abs(num) + abs(ana))
            assert rel < 1e-4 or abs(num - ana) < 1e-7, (
                f"{k}[{i}]: num={num:.8g} ana={ana:.8g}")


def test_trained_matcher_learns_and_loads_in_inference_module():
    from phenobert_ray.bert_np import BertNP, WordPieceTokenizer
    from phenobert_ray.bert_train_np import (build_wordpiece_vocab,
                                             encode_pairs,
                                             train_bert_matcher)

    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def mk(n):
        out = []
        for _ in range(n):
            a = [rng.choice(words) for _ in range(3)]
            kind = int(rng.integers(0, 3))
            if kind == 2:
                b = list(a)
            elif kind == 1:
                b = a[:2] + [rng.choice(words)]
            else:
                b = [rng.choice(words) for _ in range(3)]
            out.append((a, b, kind))
        return out

    samples = mk(400)
    vocab = build_wordpiece_vocab((w for a, b, _ in samples for w in (a, b)))
    state = train_bert_matcher(samples, vocab, H=32, L=2, I=64, num_heads=2,
                               epochs=40, lr=1e-3, batch=32, seed=1,
                               patience=40)
    # the trained dict loads straight into the INFERENCE forward
    bert = BertNP(state, num_heads=2)
    tok = WordPieceTokenizer(vocab)
    ids, types, mask = encode_pairs(
        [(a, b) for a, b, _ in samples[:150]], tok,
        vocab["[PAD]"], vocab["[CLS]"], vocab["[SEP]"])
    probs = bert.classify(ids, types, mask)
    want = np.array([y for _, _, y in samples[:150]])
    acc = float((probs.argmax(1) == want).mean())
    # task has label noise (random 'unrelated' pairs can share prefixes);
    # chance is 0.33, the measured fit reaches ~0.8
    assert acc >= 0.6, f"matcher fit acc {acc}"


def test_wordpiece_vocab_covers_oov_by_chars():
    from phenobert_ray.bert_np import WordPieceTokenizer
    from phenobert_ray.bert_train_np import build_wordpiece_vocab

    vocab = build_wordpiece_vocab([["seizure", "febrile"]])
    tok = WordPieceTokenizer(vocab)
    # in-vocab word: single piece; OOV word: char pieces, never [UNK]
    assert tok.tokenize_word("seizure") == ["seizure"]
    pieces = tok.tokenize_word("fez")  # chars all seen
    assert pieces[0] == "f" and all(x.startswith("##") for x in pieces[1:])
    assert "[UNK]" not in pieces
