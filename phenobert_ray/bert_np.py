"""Numpy BERT forward for the L6 matcher (Step 3).

The reference's Step-3 matcher is a BertForSequenceClassification over
sentence pairs ``phrase :: concept-name`` with 3 labels (0 = unrelated,
1 = related, 2 = exact), accepting class-2 (else class-1) probability ≥ p3
(fastNLP/models/Mybert.py:60-90, util.py:773-833, my_bert_match.py).

This module implements, dependency-free:

- greedy longest-match WordPiece tokenization (``##`` continuations)
- the full BERT encoder forward (embeddings + LayerNorm, multi-head
  self-attention, GELU FFN, residual + LayerNorm per layer) over a state
  dict in the standard BERT parameter layout (huggingface/fastNLP key
  names, optionally under a prefix)
- the pair-classification head and the reference's accept logic

Callers must pre-process both sides with ``textops.addwords_tokens``
(lowercase + every punctuation char → space — my_bert_match.addWords);
``models_np.NumpyModelScorer`` does.  The classification feature is the raw
last-layer [CLS] hidden (the reference's BertForSentenceMatching uses
``hidden[:, 0]`` with ``pooled_cls`` left False — Mybert.py:116-125), which
``classify`` reproduces.

Weights load through the torch-free checkpoint reader; with the
reference's trained BioBERT matcher exported as a state dict, this runs
its Step-3 scoring without torch.  Config (layers, heads, dims) is
inferred from the weight shapes.
"""

from __future__ import annotations

import numpy as np


def _gelu(x: np.ndarray) -> np.ndarray:
    # erf-based GELU (the BERT original)
    return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))


def _erf(x: np.ndarray) -> np.ndarray:
    # Abramowitz-Stegun 7.1.26 rational approximation (vectorized, |err| <
    # 1.5e-7 — far below fp32 noise for inference)
    sign = np.sign(x)
    x = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = 1.0 - (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736)
        * t
        + 0.254829592
    ) * t * np.exp(-x * x)
    return sign * y


def _layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray,
                eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece (the BERT tokenizer's second
    stage, applied to already-split words)."""

    def __init__(self, vocab: dict[str, int], unk: str = "[UNK]",
                 max_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk = unk
        self.max_chars = max_chars_per_word

    def tokenize_word(self, word: str) -> list[str]:
        if len(word) > self.max_chars:
            return [self.unk]
        out, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            out.append(cur)
            start = end
        return out

    def ids(self, words: list[str]) -> list[int]:
        return [
            self.vocab.get(p, self.vocab.get(self.unk, 0))
            for w in words
            for p in self.tokenize_word(w)
        ]


class BertNP:
    """BERT encoder + pair-classification head over a numpy state dict.

    Expected keys (standard BERT layout; ``prefix`` is stripped first):
    ``embeddings.{word_embeddings,position_embeddings,token_type_embeddings}
    .weight``, ``embeddings.LayerNorm.{weight,bias}``,
    ``encoder.layer.{i}.attention.self.{query,key,value}.{weight,bias}``,
    ``encoder.layer.{i}.attention.output.dense.{weight,bias}``,
    ``encoder.layer.{i}.attention.output.LayerNorm.{weight,bias}``,
    ``encoder.layer.{i}.{intermediate,output}.dense.{weight,bias}``,
    ``encoder.layer.{i}.output.LayerNorm.{weight,bias}``, and
    ``classifier.{weight,bias}``.
    """

    def __init__(self, state: dict[str, np.ndarray], prefix: str = "",
                 num_heads: int | None = None):
        g = lambda k: np.asarray(state[prefix + k], np.float32)  # noqa: E731
        self.word_emb = g("embeddings.word_embeddings.weight")
        self.pos_emb = g("embeddings.position_embeddings.weight")
        self.type_emb = g("embeddings.token_type_embeddings.weight")
        self.emb_ln = (g("embeddings.LayerNorm.weight"), g("embeddings.LayerNorm.bias"))
        self.hidden = self.word_emb.shape[1]
        self.layers = []
        i = 0
        while f"{prefix}encoder.layer.{i}.attention.self.query.weight" in state:
            L = {
                name: (
                    g(f"encoder.layer.{i}.{name}.weight"),
                    g(f"encoder.layer.{i}.{name}.bias"),
                )
                for name in (
                    "attention.self.query", "attention.self.key",
                    "attention.self.value", "attention.output.dense",
                    "attention.output.LayerNorm", "intermediate.dense",
                    "output.dense", "output.LayerNorm",
                )
            }
            self.layers.append(L)
            i += 1
        if not self.layers:
            raise ValueError("no encoder layers found in state dict")
        # the classifier head lives OUTSIDE the bert. prefix in the standard
        # BertForSequenceClassification layout
        ckey = "classifier.weight" if "classifier.weight" in state else prefix + "classifier.weight"
        cb = ckey.replace("weight", "bias")
        self.classifier = (
            np.asarray(state[ckey], np.float32),
            np.asarray(state[cb], np.float32),
        )
        # heads: standard BERT uses hidden/64; overridable for tiny fixtures
        self.num_heads = num_heads or max(1, self.hidden // 64)
        if self.hidden % self.num_heads:
            raise ValueError(
                f"hidden {self.hidden} not divisible by heads {self.num_heads}"
            )

    def encode(self, ids: np.ndarray, types: np.ndarray,
               mask: np.ndarray) -> np.ndarray:
        """(B, S) int ids/types + (B, S) {0,1} mask → (B, S, H) hiddens."""
        B, S = ids.shape
        x = (
            self.word_emb[ids]
            + self.pos_emb[:S][None, :, :]
            + self.type_emb[types]
        )
        x = _layer_norm(x, *self.emb_ln)
        H, nh = self.hidden, self.num_heads
        dh = H // nh
        att_bias = (1.0 - mask[:, None, None, :]) * -1e9  # (B,1,1,S)
        for L in self.layers:
            def lin(name, v):
                w, b = L[name]
                return v @ w.T + b

            q = lin("attention.self.query", x).reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
            k = lin("attention.self.key", x).reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
            v = lin("attention.self.value", x).reshape(B, S, nh, dh).transpose(0, 2, 1, 3)
            att = _softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + att_bias)
            ctx = (att @ v).transpose(0, 2, 1, 3).reshape(B, S, H)
            x = _layer_norm(x + lin("attention.output.dense", ctx),
                            *L["attention.output.LayerNorm"])
            h = _gelu(lin("intermediate.dense", x))
            x = _layer_norm(x + lin("output.dense", h), *L["output.LayerNorm"])
        return x

    def classify(self, ids: np.ndarray, types: np.ndarray,
                 mask: np.ndarray) -> np.ndarray:
        """→ (B, n_labels) softmax probabilities from the CLS hidden."""
        cls = self.encode(ids, types, mask)[:, 0]
        w, b = self.classifier
        return _softmax(cls @ w.T + b)


class BertMatcherNP:
    """Reference Step-3 accept logic (produceCandidateTriple,
    util.py:817-833) over the numpy BERT: for one phrase and its candidate
    (hpo, concept-name) list, return (hpo, prob, grade) where grade 2 =
    exact-match class accepted at ≥ threshold, grade 1 = related class,
    else None."""

    CLS, SEP, PAD = "[CLS]", "[SEP]", "[PAD]"

    def __init__(self, bert: BertNP, tokenizer: WordPieceTokenizer,
                 max_len: int = 64):
        self.bert = bert
        self.tok = tokenizer
        self.max_len = max_len
        v = tokenizer.vocab
        self.cls_id = v[self.CLS]
        self.sep_id = v[self.SEP]
        self.pad_id = v.get(self.PAD, 0)

    def _encode_pair(self, ids_a: list[int], ids_b: list[int]):
        # Verified equal to the reference's wire format: addWords emits
        # "phrase [SEP] name" as words (my_bert_match.py:67), the embedding
        # prepends [CLS] / appends [SEP] (My_bert_embedding.py:302-305), and
        # token types are derived from [SEP] positions by the
        # flip-cumsum-fmod trick (My_bert_embedding.py:305-311), which
        # assigns 0 to [CLS]+phrase+middle-[SEP] (two SEPs at-or-after →
        # even), 1 to name+final-[SEP], 0 to padding — exactly the layout
        # below.  One divergence: the reference RAISES on sequences past
        # BERT's position limit (auto_truncate=False); we truncate at
        # max_len (phrases/names are ≤ a few words, never reached).
        ids = [self.cls_id, *ids_a, self.sep_id, *ids_b, self.sep_id][: self.max_len]
        types = [0] * min(2 + len(ids_a), len(ids))
        types = types + [1] * (len(ids) - len(types))
        return ids, types

    def probs(self, pairs: list[tuple[list[str], list[str]]]) -> np.ndarray:
        # tokenize each distinct side ONCE (the phrase side repeats across
        # every candidate of a best_match call — the Step-3 hot loop)
        cache: dict[tuple[str, ...], list[int]] = {}

        def ids_of(words):
            k = tuple(words)
            v = cache.get(k)
            if v is None:
                v = self.tok.ids(list(words))
                cache[k] = v
            return v

        encoded = [self._encode_pair(ids_of(a), ids_of(b)) for a, b in pairs]
        S = max(len(ids) for ids, _ in encoded)
        B = len(encoded)
        ids = np.full((B, S), self.pad_id, dtype=np.int64)
        types = np.zeros((B, S), dtype=np.int64)
        mask = np.zeros((B, S), dtype=np.float32)
        for i, (seq, tp) in enumerate(encoded):
            ids[i, : len(seq)] = seq
            types[i, : len(tp)] = tp
            mask[i, : len(seq)] = 1.0
        return self.bert.classify(ids, types, mask)

    def best_match(self, phrase_tokens: list[str],
                   candidates: list[tuple[str, list[str]]],
                   threshold: float):
        """candidates: [(hpo_id, name_tokens)] → (hpo, prob, grade) | None."""
        if not candidates:
            return None
        p = self.probs([(phrase_tokens, name) for _, name in candidates])
        exact, related = p[:, 2], p[:, 1]
        if exact.max() >= threshold:
            i = int(exact.argmax())
            return (candidates[i][0], float(exact[i]), 2)
        if related.max() >= threshold:
            i = int(related.argmax())
            return (candidates[i][0], float(related[i]), 1)
        return None


def load_bert_matcher(model_dir: str, max_len: int = 64,
                      num_heads: int | None = None) -> BertMatcherNP:
    """``{model_dir}/bert.pt`` (state dict, torch.save format) +
    ``{model_dir}/bert_vocab.txt`` (one WordPiece per line)."""
    import os

    from .state.torch_ckpt import read_state_dict

    state = read_state_dict(os.path.join(model_dir, "bert.pt"))
    # tolerate a leading "bert." prefix on encoder/embedding keys
    prefix = "bert." if any(k.startswith("bert.embeddings.") for k in state) else ""
    with open(os.path.join(model_dir, "bert_vocab.txt"), encoding="utf-8") as f:
        vocab = {ln.rstrip("\n"): i for i, ln in enumerate(f) if ln.strip()}
    bert = BertNP(state, prefix=prefix, num_heads=num_heads)
    return BertMatcherNP(bert, WordPieceTokenizer(vocab), max_len=max_len)
