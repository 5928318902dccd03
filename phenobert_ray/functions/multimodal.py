"""Multimodal column stages (task brief): image/audio/video as opaque
``binary`` columns + typed metadata.

The Ray-side plumbing — schema, actor-pool signature, batch sizing, output
layout — is real and tested; the codec kernels themselves are STUBS (the
image/audio libraries are not in this container): ``decode_fn=None`` uses a
deterministic fake decoder so the pipeline shape is exercisable end-to-end,
and a real deployment passes e.g. a PIL/torchaudio-backed ``decode_fn``.

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


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes → fixed-size float
    'pixels/samples' derived from a content hash.  A real deployment
    replaces this with PIL / libav decode — NotImplementedError marks the
    boundary."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
    return np.tile(base, 8)  # 256-dim


class MediaFeatureExtractor:
    """Actor-pool ``map_batches`` stage: decode → feature-extract.

    ``__init__`` is where a real decoder/model would load (once per actor);
    ``__call__`` processes one small batch of payloads."""

    def __init__(self, decode_fn=None, feature_dim: int = 32):
        if decode_fn == "real":  # the documented not-in-this-container path
            raise NotImplementedError(
                "real media codecs are not available in this container; "
                "pass a callable decode_fn or use the deterministic fake"
            )
        self.decode = decode_fn or _fake_decode
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p, k in zip(payloads, kinds):
            raw = self.decode(p, k)
            # pooled feature: fixed-dim mean-pool (vectorized)
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


def extract_features(media_ds, concurrency=(1, 4), batch_size: int = 16):
    """media table → per-item pooled features (actor pool, small batches —
    payload × batch × concurrency must fit worker heaps)."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_media(df: pd.DataFrame) -> pa.Table:
        kinds = np.array(["image", "audio", "video"])[df["doc_id"].to_numpy() % 3]
        payloads = [t.encode() for t in df["text"]]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(df["doc_id"], pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(["x/fake"] * len(df), pa.string()),
                "width": pa.array([-1] * len(df), pa.int32()),
                "height": pa.array([-1] * len(df), pa.int32()),
                "duration_ms": pa.array([-1] * len(df), pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(to_media, batch_format="pandas")


def media_features_query(sf_dir: str):
    """(media_id, kind, feat_norm) — decode-stub + pooled feature per item;
    rows-only query (no SQL can decode media; determinism checked in
    pytest)."""
    import pandas as pd

    feats = extract_features(media_from_documents(sf_dir))

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "media_id": df["media_id"].astype("int64"),
                "kind": df["kind"],
                "feat_norm": df["feature"].map(
                    lambda f: round(float(np.linalg.norm(f)), 6)
                ),
            }
        )

    return feats.map_batches(summarize, batch_format="pandas")
