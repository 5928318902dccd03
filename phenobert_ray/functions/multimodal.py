"""Multimodal column stages (task brief): image/audio/video as opaque
``binary`` columns + typed metadata.

Codec story: REAL decoders for the stdlib-decodable formats — RIFF/WAVE
PCM audio (``wave`` module + numpy) and binary PPM (P6) images — run in
the feature pipeline end-to-end; compressed formats (jpeg/png/mp4) raise
``NotImplementedError`` at the documented boundary (their libraries are
not in this container) and a deployment passes a PIL/libav ``decode_fn``.
The driver query synthesizes genuine WAV/PPM payloads from the documents
table, so the decode path exercised per-round is a real parse, not a hash
stub.

Scale notes: binary payloads are large, so these stages use SMALL
``batch_size`` (default 16) and an actor pool (decoder/model state loads
once per actor in ``__init__``) — the payload never leaves Arrow until the
kernel runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.large_binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # typed metadata (−1 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=512 + (i % 7) * 128, dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind])
        rows["width"].append(64 if kind != "audio" else -1)
        rows["height"].append(48 if kind != "audio" else -1)
        rows["duration_ms"].append(-1 if kind == "image" else 1000 + i)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


# --- real stdlib codecs ----------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] → 16-bit mono PCM RIFF/WAVE bytes."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def encode_wav_pcm(pcm: np.ndarray, rate: int = 8000) -> bytes:
    """int16 samples → 16-bit mono PCM RIFF/WAVE bytes (no float rescale;
    the integer-exact synthesis path the media_decode_stats oracle pins)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (float32 samples in [-1, 1] per channel
    interleaved, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"PCM width {width} not supported")
    return x, rate


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (H, W, 3) → binary PPM (P6) bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → uint8 (H, W, 3)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM supported")
    data = parts[3][: w * h * 3]
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


_REAL_MIMES = {"audio/wav", "image/x-portable-pixmap"}
_COMPRESSED_MIMES = {"image/jpeg", "image/png", "video/mp4", "audio/mpeg"}


def auto_decode(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch on mime: real stdlib decode for WAV/PPM, the documented
    NotImplementedError boundary for compressed formats, deterministic
    fake for anything else (keeps the pipeline shape testable)."""
    if mime == "audio/wav":
        samples, _rate = decode_wav(payload)
        return samples
    if mime == "image/x-portable-pixmap":
        return decode_ppm(payload).astype(np.float32).ravel() / 255.0
    if mime in _COMPRESSED_MIMES:
        raise NotImplementedError(
            f"codec for {mime} requires PIL/libav (not in this container); "
            f"pass a real decode_fn"
        )
    return _fake_decode(payload, mime)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes → fixed-size float
    'pixels/samples' derived from a content hash.  A real deployment
    replaces this with PIL / libav decode — NotImplementedError marks the
    boundary."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
    return np.tile(base, 8)  # 256-dim


def decode_for_features(payload: bytes, mime: str) -> np.ndarray:
    """Mime-dispatching decoder for the ORACLED feature query: real WAV/PPM
    parse (same as auto_decode), and for the fake-codec kind a SQL-derivable
    text decode — first 512 code points, clipped to 65535, scaled by 1/65536,
    zero-padded to exactly 512 values.

    The fixed 512 length makes the pooling window width 512/32 = 16 (a power
    of two), so the float32 mean over a window is EXACT: each value is a
    dyadic rational k/2^16 with k < 2^16, every partial sum is K/2^16 with
    K < 2^20 (representable in float32's 24-bit mantissa), and dividing by
    16 only shifts the exponent.  round(feature_j * 16 * 65536) therefore
    recovers the integer window code-point sum bit-exactly, which DuckDB
    can recompute from ``documents.text`` (media_features_sql)."""
    if mime in ("audio/wav", "image/x-portable-pixmap"):
        return auto_decode(payload, mime)
    txt = payload.decode("utf-8")[:512]
    out = np.zeros(512, dtype=np.float32)
    if txt:
        cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
        out[: len(cp)] = np.minimum(cp, 65535).astype(np.float32) / 65536.0
    return out


class MediaFeatureExtractor:
    """Actor-pool ``map_batches`` stage: decode → feature-extract.

    ``__init__`` is where a real decoder/model would load (once per actor);
    ``__call__`` processes one small batch of payloads."""

    def __init__(self, decode_fn=None, feature_dim: int = 32):
        # default: mime-dispatching auto_decode (REAL wav/ppm parse,
        # NotImplementedError boundary for compressed formats)
        self.decode = decode_fn or auto_decode
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        mimes = (
            batch.column("mime").to_pylist()
            if "mime" in batch.schema.names
            else kinds
        )
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p, k in zip(payloads, mimes):
            raw = self.decode(p, k)
            # pooled feature: fixed-dim mean-pool (vectorized).  Media
            # shorter than feature_dim values is zero-padded — reshape of
            # an empty slice would mean-pool to all-NaN and silently
            # corrupt downstream norms (review r4)
            if len(raw) < self.feature_dim:
                raw = np.pad(np.asarray(raw, dtype=np.float32),
                             (0, self.feature_dim - len(raw)))
            f = raw[: (len(raw) // self.feature_dim) * self.feature_dim]
            feats.append(f.reshape(self.feature_dim, -1).mean(axis=1).astype(np.float32))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload → k evenly-spaced 'frames' (stub:
    payload slices), one output row per frame (flat_map-shaped)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "frame": []}
        for mid, kind, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                out["media_id"].append(mid)
                out["frame_idx"].append(f)
                out["frame"].append(payload[f * step:(f + 1) * step])
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame": pa.array(out["frame"], pa.large_binary()),
            }
        )


def extract_features(media_ds, concurrency=(1, 4), batch_size: int = 16,
                     decode_fn=None):
    """media table → per-item pooled features (actor pool, small batches —
    payload × batch × concurrency must fit worker heaps)."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decode_fn": decode_fn},
    )


def sample_frames(media_ds, n_frames: int = 4, concurrency=(1, 4), batch_size: int = 16):
    return media_ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"n_frames": n_frames},
    )


def media_from_documents(sf_dir: str):
    """Deterministic media table derived from the documents table (payload =
    utf-8 bytes of the text, kind by doc_id % 3) — ties the multimodal
    plumbing to the driver's data for the rows-only correctness check."""
    import pandas as pd

    from ..stages.shuffle import drop_null_rows

    ds = drop_null_rows(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))

    def to_media(df: pd.DataFrame) -> pa.Table:
        kinds = np.array(["image", "audio", "video"])[df["doc_id"].to_numpy() % 3]
        payloads, mimes, widths, heights, durs = [], [], [], [], []
        for doc_id, text, kind in zip(df["doc_id"], df["text"], kinds):
            seed = int(doc_id)
            if kind == "image":
                # deterministic 8×8 RGB gradient keyed by doc_id → REAL PPM
                g = (np.arange(8 * 8 * 3, dtype=np.int64) * (seed % 251 + 1)) % 256
                payloads.append(encode_ppm(g.reshape(8, 8, 3).astype(np.uint8)))
                mimes.append("image/x-portable-pixmap")
                widths.append(8); heights.append(8); durs.append(-1)
            elif kind == "audio":
                # deterministic integer sawtooth keyed by doc_id → REAL
                # 16-bit PCM WAV; pure-integer formula so the decoded
                # content is exactly SQL-derivable (media_decode_stats)
                k = seed % 977 + 3
                pcm = (np.arange(400, dtype=np.int64) * k + seed) % 65536 - 32768
                payloads.append(encode_wav_pcm(pcm))
                mimes.append("audio/wav")
                widths.append(-1); heights.append(-1); durs.append(50)
            else:
                payloads.append(text.encode())  # opaque; fake decoder path
                mimes.append("x/fake")
                widths.append(-1); heights.append(-1); durs.append(-1)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(df["doc_id"], pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(mimes, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durs, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(to_media, batch_format="pandas")


class MediaDecodeStats:
    """Actor-pool stage: REAL decode → integer-exact content facts
    (value count + value sum per item).  This is the SQL-verifiable shadow
    of the decode path: the DuckDB oracle recomputes both numbers from the
    synthesis formulas over ``documents``, so one corrupted byte anywhere
    in the RIFF/PPM encode→decode roundtrip flips the value hash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, ns, sums = [], [], [], []
        for mid, kind, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime == "audio/wav":
                samples, _rate = decode_wav(payload)
                # float32 n/32768 is exact for |n| < 2^15 → recover the
                # int16 values losslessly from the decoder's float output
                ints = np.round(samples.astype(np.float64) * 32768.0).astype(np.int64)
                n, s = len(ints), int(ints.sum())
            elif mime == "image/x-portable-pixmap":
                px = decode_ppm(payload)
                n, s = int(px.size), int(px.astype(np.int64).sum())
            else:
                # fake-codec kind: n = payload BYTES (oracle octet_length),
                # sum = CODE POINTS of the decoded text (oracle unicode(x))
                # — summing raw utf-8 bytes instead would diverge from the
                # SQL the moment a non-ASCII character appears (review r4)
                txt = payload.decode("utf-8")
                n, s = len(payload), sum(map(ord, txt))
            ids.append(mid)
            kinds.append(kind)
            ns.append(n)
            sums.append(s)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "n_values": pa.array(ns, pa.int64()),
                "value_sum": pa.array(sums, pa.int64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: REAL PPM decode → nearest-neighbor resize to
    (out_h × out_w) → integer-exact facts about the RESIZED pixels.  The
    brief's 'resize' media transform with a SQL-verifiable shadow: source
    row/col of output (r, c) is (floor(r·H/out_h), floor(c·W/out_w)), so
    every resized pixel is one exact source pixel and the DuckDB oracle
    re-derives the sum from the synthesis formula — a one-pixel layout
    or decode bug flips the hash."""

    def __init__(self, out_h: int = 4, out_w: int = 4):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, sums = [], [], []
        for mid, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime != "image/x-portable-pixmap":
                continue
            px = decode_ppm(payload)
            h, w = px.shape[0], px.shape[1]
            rows = (np.arange(self.out_h) * h) // self.out_h
            cols = (np.arange(self.out_w) * w) // self.out_w
            small = px[rows][:, cols]
            ids.append(mid)
            ns.append(int(small.size))
            sums.append(int(small.astype(np.int64).sum()))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_values": pa.array(ns, pa.int64()),
                "value_sum": pa.array(sums, pa.int64()),
            }
        )


def media_resize_stats_query(sf_dir: str):
    """(media_id, n_values, value_sum) over the 4×4 nearest-neighbor
    resize of every image item — actor-pool map over the media table,
    fully SQL-oracled via media_resize_stats_sql."""
    return media_from_documents(sf_dir).map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )


def media_resize_stats_sql() -> str:
    """DuckDB oracle for media_resize_stats: output pixel (r, c, ch) of
    the 8×8→4×4 nearest-neighbor resize reads source linear index
    ((2r)·8 + 2c)·3 + ch of the gradient formula (media_from_documents),
    so the resized sum is 48 exact integer terms per image."""
    return """
    SELECT d.doc_id AS media_id, CAST(48 AS BIGINT) AS n_values,
           CAST(SUM((((2 * r.r * 8 + 2 * c.c) * 3 + ch.ch)
                     * (d.doc_id % 251 + 1)) % 256) AS BIGINT) AS value_sum
    FROM documents d,
         generate_series(0, 3) r(r),
         generate_series(0, 3) c(c),
         generate_series(0, 2) ch(ch)
    WHERE d.doc_id % 3 = 0
    GROUP BY d.doc_id
    """


def media_decode_stats_query(sf_dir: str):
    """(media_id, kind, n_values, value_sum) — integer-exact facts about
    the DECODED media content (real WAV/PPM parse; raw payload bytes for
    the fake-codec kind), fully SQL-oracled via media_decode_stats_sql."""
    return media_from_documents(sf_dir).map_batches(
        MediaDecodeStats,
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )


def media_decode_stats_sql() -> str:
    """DuckDB oracle for media_decode_stats: re-derives the decoded pixel /
    PCM / code-point sums from the same integer synthesis formulas
    media_from_documents uses (video rows: n = payload bytes, sum = text
    code points — both sides computed on the same definitions, so
    non-ASCII text stays hash-identical)."""
    return """
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(192 AS BIGINT) AS n_values,
           CAST((SELECT SUM((i * (doc_id % 251 + 1)) % 256)
                 FROM generate_series(0, 191) AS g(i)) AS BIGINT) AS value_sum
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'audio', CAST(400 AS BIGINT),
           CAST((SELECT SUM((i * (doc_id % 977 + 3) + doc_id) % 65536 - 32768)
                 FROM generate_series(0, 399) AS g(i)) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'video', CAST(octet_length(encode(text)) AS BIGINT),
           -- filter '' first: string_split('', '') is [''] and
           -- unicode('') is -1 in DuckDB, which would score empty text -1
           CAST(COALESCE(list_aggregate(
                  list_transform(
                    list_filter(string_split(text, ''), x -> x <> ''),
                    x -> unicode(x)),
                  'sum'), 0) AS BIGINT)
    FROM documents WHERE doc_id % 3 = 2
    """


# per-kind (pooling window width, value scale): the decoded values are
# pixels/255 (192 values), PCM/32768 (400→384 values) and clipped code
# points/65536 (512 values), so feature_j * cols * scale is the integer sum
# of the j-th window of raw integers — exactly what the SQL oracle rebuilds.
_FEATQ = {"image": (6, 255.0), "audio": (12, 32768.0), "video": (16, 65536.0)}


def media_features_query(sf_dir: str):
    """(media_id, kind, j, feat_q) — REAL wav/ppm decode + 32-dim pooled
    feature per item, exploded to one row per feature component and
    integer-quantized so DuckDB can recompute every component from the
    synthesis formulas / document text (media_features_sql).  The float32
    pooling arithmetic is inside the verified loop: one wrong decoded byte
    or a pooling-layout change flips feat_q."""
    import pandas as pd

    feats = extract_features(
        media_from_documents(sf_dir), decode_fn=decode_for_features)

    def quantize(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "media_id": pd.Series([], dtype="int64"),
                "kind": pd.Series([], dtype="object"),
                "j": pd.Series([], dtype="int64"),
                "feat_q": pd.Series([], dtype="int64"),
            })
        F = np.stack(df["feature"].to_numpy()).astype(np.float64)  # (n, 32)
        mult = df["kind"].map({k: c * s for k, (c, s) in _FEATQ.items()}).to_numpy()
        K = np.rint(F * mult[:, None]).astype(np.int64)
        return pd.DataFrame({
            "media_id": np.repeat(df["media_id"].to_numpy(), F.shape[1]),
            "kind": np.repeat(df["kind"].to_numpy(), F.shape[1]),
            "j": np.tile(np.arange(F.shape[1], dtype=np.int64), n),
            "feat_q": K.ravel(),
        })

    return feats.map_batches(quantize, batch_format="pandas")


def media_features_sql() -> str:
    """DuckDB oracle for media_features: recomputes every quantized feature
    component as the integer sum of its pooling window — pixels from the
    PPM gradient formula, PCM samples from the sawtooth formula, clipped
    code points from the document text (window = 16 code points starting
    at position 16*j+1; windows past the text sum to 0, matching the
    zero-padded 512-value decode)."""
    return """
    SELECT doc_id AS media_id, 'image' AS kind, j,
           CAST((SELECT SUM(((6 * j + t) * (doc_id % 251 + 1)) % 256)
                 FROM generate_series(0, 5) AS s(t)) AS BIGINT) AS feat_q
    FROM documents CROSS JOIN generate_series(0, 31) AS g(j)
    WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'audio', j,
           CAST((SELECT SUM(((12 * j + t) * (doc_id % 977 + 3) + doc_id)
                            % 65536 - 32768)
                 FROM generate_series(0, 11) AS s(t)) AS BIGINT)
    FROM documents CROSS JOIN generate_series(0, 31) AS g(j)
    WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'video', j,
           CAST(COALESCE(list_aggregate(
                  list_transform(
                    list_filter(string_split(substr(text, 16 * j + 1, 16), ''),
                                x -> x <> ''),
                    x -> least(unicode(x), 65535)),
                  'sum'), 0) AS BIGINT)
    FROM documents CROSS JOIN generate_series(0, 31) AS g(j)
    WHERE doc_id % 3 = 2
    """
