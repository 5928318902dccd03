"""Torch/fasttext-free reader for the public fastText ``.bin`` format.

The reference embeds candidate tokens with fastText
(``fasttext.load_model(fasttext_model_path)`` at annotate.py:45, queried
per token via ``get_word_vector`` in util.py's PhraseDataSet classes).
The released ``fasttext_pubmed.bin`` is a standard fastText binary — the
on-disk layout is public (fastText C++ ``FastText::saveModel`` /
``Dictionary::save`` / ``DenseMatrix::save``):

    int32  magic   = 793712314
    int32  version = 11 | 12
    args:  dim ws epoch minCount neg wordNgrams loss model bucket minn
           maxn lrUpdateRate (int32 each) + t (float64)
    dict:  size nwords nlabels (int32) ntokens pruneidx_size (int64);
           per entry: NUL-terminated utf-8 word, count (int64), type (int8);
           pruneidx pairs (int32,int32)
    int8   quant flag, then the INPUT matrix: rows cols (int64) +
           rows*cols float32
    int8   qout flag, then the output matrix (same shape header)

``get_word_vector`` reproduces fastText's composition exactly: the mean
of the word's own input row (in-vocab only) and the rows of its hashed
character n-grams (FNV-1a with *signed*-char XOR, ``h % bucket + nwords``),
n-grams drawn from ``<word>`` at utf-8 character granularity between
``minn`` and ``maxn`` — so OOV tokens get real subword vectors, the
property the reference's recall depends on.

``write_fasttext_bin`` emits the same layout (fixture/interchange only)
so the import path is testable without the released artifact.
"""

from __future__ import annotations

import struct

import numpy as np

FASTTEXT_MAGIC = 793712314
_BOW, _EOW = "<", ">"


def _subword_hash(ngram: str) -> int:
    """fastText's FNV-1a over utf-8 bytes with the C++ ``int8_t`` cast
    (bytes ≥ 0x80 sign-extend before the XOR)."""
    h = 2166136261
    for b in ngram.encode("utf-8"):
        # int8_t cast then uint32 promotion: bytes ≥ 0x80 sign-extend
        h ^= b if b < 128 else (b - 256) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def compute_subwords(word: str, minn: int, maxn: int) -> list[str]:
    """Character n-grams of ``<word>``, exactly fastText's
    Dictionary::computeSubwords: every n-gram with minn ≤ n ≤ maxn except
    bare boundary 1-grams (``n == 1 && (i == 0 || j == end)`` — only
    reachable when minn == 1); the full ``<word>`` n-gram IS included when
    it fits maxn.  Python str iteration == the C++ byte loop with its
    utf-8 continuation-byte skip (both step per character)."""
    w = _BOW + word + _EOW
    n_chars = len(w)
    out: list[str] = []
    for i in range(n_chars):
        for n in range(max(1, minn), maxn + 1):
            j = i + n
            if j > n_chars:
                break
            if not (n == 1 and (i == 0 or j == n_chars)):
                out.append(w[i:j])
    return out


class FastTextBin:
    """Parsed fastText binary: vocab + input matrix + subword params."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            magic, version = struct.unpack("<ii", f.read(8))
            if magic != FASTTEXT_MAGIC:
                raise ValueError(f"{path}: not a fastText .bin (magic {magic})")
            if version > 12:
                raise ValueError(f"{path}: unsupported fastText version {version}")
            (self.dim, self.ws, self.epoch, self.min_count, self.neg,
             self.word_ngrams, self.loss, self.model, self.bucket,
             self.minn, self.maxn, self.lr_update_rate) = struct.unpack(
                "<12i", f.read(48))
            (self.t,) = struct.unpack("<d", f.read(8))
            size, nwords, nlabels = struct.unpack("<3i", f.read(12))
            ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
            self.nwords = nwords
            words: list[str] = []
            buf = bytearray()
            for _ in range(size):
                buf.clear()
                while True:
                    c = f.read(1)
                    if c == b"\x00":
                        break
                    buf.extend(c)
                f.read(9)  # count int64 + entry-type int8
                words.append(buf.decode("utf-8"))
            if pruneidx_size > 0:
                # a pruned dictionary remaps hashed subword rows through
                # pruneidx_ — silently ignoring it would mis-address every
                # OOV vector, so refuse (released pubmed .bins are unpruned)
                raise NotImplementedError(
                    f"{path}: pruned fastText dictionary "
                    f"(pruneidx_size={pruneidx_size}) not supported")
            self.words = words
            self.vocab = {w: i for i, w in enumerate(words)}
            (quant,) = struct.unpack("<b", f.read(1))
            if quant:
                raise NotImplementedError(
                    "quantized (.ftz-style) fastText input matrices are not "
                    "supported — release the plain .bin")
            rows, cols = struct.unpack("<2q", f.read(16))
            self.input = np.fromfile(f, dtype="<f4", count=rows * cols).reshape(
                rows, cols)
        if self.input.shape[1] != self.dim:
            raise ValueError("input matrix width != args.dim")

    def subword_ids(self, word: str) -> list[int]:
        """Input-matrix row ids composing ``word`` (own row if in-vocab,
        plus hashed n-gram rows when buckets exist)."""
        ids: list[int] = []
        wid = self.vocab.get(word, -1)
        if wid >= 0:
            ids.append(wid)
        if self.maxn > 0 and self.bucket > 0 and word != "</s>":
            for g in compute_subwords(word, self.minn, self.maxn):
                ids.append(self.nwords + _subword_hash(g) % self.bucket)
        return ids

    def get_word_vector(self, word: str) -> np.ndarray:
        ids = self.subword_ids(word)
        if not ids:
            return np.zeros(self.dim, dtype=np.float32)
        return self.input[ids].mean(axis=0)


def write_fasttext_bin(path: str, words: list[str], matrix: np.ndarray,
                       bucket: int, minn: int = 3, maxn: int = 6) -> None:
    """Fixture writer: a valid v12 .bin with ``matrix`` as the input matrix
    (``len(words) + bucket`` rows) and a zero output matrix."""
    dim = matrix.shape[1]
    if matrix.shape[0] != len(words) + bucket:
        raise ValueError("matrix rows must be len(words) + bucket")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC, 12))
        f.write(struct.pack("<12i", dim, 5, 5, 1, 5, 1, 1, 1, bucket,
                            minn, maxn, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", len(words), len(words), 0))
        f.write(struct.pack("<2q", 0, 0))
        for w in words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 1, 0))
        f.write(struct.pack("<b", 0))
        f.write(struct.pack("<2q", matrix.shape[0], dim))
        np.ascontiguousarray(matrix, dtype="<f4").tofile(f)
        f.write(struct.pack("<b", 0))
        out = np.zeros((1, dim), dtype="<f4")
        f.write(struct.pack("<2q", 1, dim))
        out.tofile(f)
