"""Multimodal stage plumbing tests (decode kernel is a deterministic stub;
the Ray-side schema/actor/batching layout is the thing under test)."""

import numpy as np
import pytest
import ray

from phenobert_ray.functions.multimodal import (
    MediaFeatureExtractor,
    extract_features,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media_ds():
    return ray.data.from_arrow(synthesize_media(48))


def test_schema(media_ds):
    names = [f.name for f in media_ds.schema().base_schema]
    assert names == ["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]


def test_feature_extraction_deterministic(media_ds):
    a = extract_features(media_ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = extract_features(media_ds).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(a) == 48
    assert all(len(f) == 32 for f in a.feature)
    for x, y in zip(a.feature, b.feature):
        assert np.allclose(x, y)


def test_frame_sampling(media_ds):
    frames = sample_frames(media_ds, n_frames=4).to_pandas()
    vids = media_ds.to_pandas()
    n_videos = (vids.kind == "video").sum()
    assert len(frames) == 4 * n_videos
    assert set(frames.frame_idx) == {0, 1, 2, 3}
    assert frames.frame.map(len).gt(0).all()


def test_real_codec_path_is_marked():
    """WAV/PPM decode is REAL (stdlib); the NotImplementedError boundary
    now sits at the compressed formats whose codecs need PIL/libav."""
    from phenobert_ray.functions.multimodal import auto_decode

    with pytest.raises(NotImplementedError):
        auto_decode(b"\x89PNG", "image/png")


def test_wav_roundtrip():
    """Real RIFF/WAVE PCM encode → decode recovers the samples."""
    import numpy as np

    from phenobert_ray.functions.multimodal import decode_wav, encode_wav

    t = np.arange(200, dtype=np.float32) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(x, rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    got, rate = decode_wav(payload)
    assert rate == 8000
    # 16-bit quantization (scale 32767, dequant 32768, truncating cast)
    # bounds the error at ~1.5 LSB
    np.testing.assert_allclose(got, x, rtol=0, atol=1.6 / 32768)


def test_ppm_roundtrip():
    """Real binary PPM (P6) encode → decode recovers the pixels."""
    import numpy as np

    from phenobert_ray.functions.multimodal import decode_ppm, encode_ppm

    px = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(6, 4, 3)
    payload = encode_ppm(px)
    assert payload.startswith(b"P6\n4 6\n255\n")
    np.testing.assert_array_equal(decode_ppm(payload), px)


def test_compressed_mime_raises():
    from phenobert_ray.functions.multimodal import auto_decode

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PIL/libav"):
        auto_decode(b"\xff\xd8\xff", "image/jpeg")


def test_media_decode_stats_matches_sql_oracle(sf_small):
    """The integer-exact decode-stats query (REAL WAV/PPM parse) must match
    DuckDB recomputing the synthesis formulas from documents — the same
    compare the driver's correctness gate runs."""
    import duckdb

    from phenobert_ray.functions.multimodal import (
        media_decode_stats_query,
        media_decode_stats_sql,
    )

    mine = (
        media_decode_stats_query(sf_small)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_small}/documents.parquet')"
    )
    oracle = (
        con.execute(media_decode_stats_sql())
        .df()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(mine) == len(oracle) > 0
    for col in ("media_id", "kind", "n_values", "value_sum"):
        assert (mine[col].to_numpy() == oracle[col].to_numpy()).all(), col


def test_media_features_use_real_codecs(sf_small):
    """The driver query's image/audio rows decode REAL PPM/WAV payloads:
    the quantized feature components must match a direct decode of the
    same payload through the same pooling."""
    import numpy as np

    from phenobert_ray.functions.multimodal import (
        _FEATQ,
        auto_decode,
        media_from_documents,
        media_features_query,
    )

    media = media_from_documents(sf_small).to_pandas()
    wav_rows = media[media["mime"] == "audio/wav"]
    ppm_rows = media[media["mime"] == "image/x-portable-pixmap"]
    assert len(wav_rows) > 0 and len(ppm_rows) > 0

    feats = media_features_query(sf_small).to_pandas()
    for _, row in list(wav_rows.iterrows())[:3] + list(ppm_rows.iterrows())[:3]:
        raw = auto_decode(row["payload"], row["mime"])
        f = raw[: (len(raw) // 32) * 32].reshape(32, -1).mean(axis=1)
        cols, scale = _FEATQ[row["kind"]]
        expect = np.rint(f.astype(np.float64) * cols * scale).astype(np.int64)
        got = (feats[feats["media_id"] == row["media_id"]]
               .sort_values("j")["feat_q"].to_numpy())
        np.testing.assert_array_equal(got, expect)


def test_media_features_match_sql_oracle(sf_small):
    """Every quantized feature component (real PPM/WAV decode + float32
    pooling inside the loop) must match DuckDB recomputing the integer
    window sums — the same compare the driver's correctness gate runs."""
    import duckdb

    from phenobert_ray.functions.multimodal import (
        media_features_query,
        media_features_sql,
    )

    mine = (media_features_query(sf_small).to_pandas()
            .sort_values(["media_id", "j"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_small}/documents.parquet')")
    oracle = (con.execute(media_features_sql()).df()
              .sort_values(["media_id", "j"]).reset_index(drop=True))
    assert len(mine) == len(oracle) > 0
    for col in ("media_id", "kind", "j", "feat_q"):
        assert (mine[col].to_numpy() == oracle[col].to_numpy()).all(), col


def test_media_features_oracle_non_ascii_text(tmp_path):
    """Video-kind features sum CLIPPED code points per 16-char window on
    both sides — non-ASCII, supplementary-plane (clipped at 65535), empty
    and >512-char texts must all hash-match."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.multimodal import (
        media_features_query,
        media_features_sql,
    )

    t = pa.table({
        "doc_id": pa.array([2, 5, 8, 11], pa.int64()),
        "text": pa.array(
            ["café émigré 😀🎉 naïve", "", "x" * 700, "short"], pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    mine = (media_features_query(str(d)).to_pandas()
            .sort_values(["media_id", "j"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = (con.execute(media_features_sql()).df()
              .sort_values(["media_id", "j"]).reset_index(drop=True))
    assert len(mine) == 4 * 32
    for col in ("media_id", "j", "feat_q"):
        assert (mine[col].to_numpy() == oracle[col].to_numpy()).all(), col
    # the emoji row actually exercised the 65535 clip
    assert mine[mine["media_id"] == 2]["feat_q"].max() >= 65535


def test_short_media_features_are_finite(tmp_path):
    """Media shorter than feature_dim must zero-pad, never mean-pool an
    empty slice into all-NaN features (review r4)."""
    import pyarrow as pa

    from phenobert_ray.functions.multimodal import MediaFeatureExtractor

    ext = MediaFeatureExtractor(feature_dim=32)
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["video", "video"], pa.string()),
        "mime": pa.array(["x/fake", "x/fake"], pa.string()),
        "payload": pa.array([b"abc", b""], pa.large_binary()),  # 3 and 0 values
    })
    out = ext(batch)
    for f in out.column("feature").to_pylist():
        assert len(f) == 32
        assert all(np.isfinite(v) for v in f)


def test_decode_stats_non_ascii_and_empty_text_match_oracle(tmp_path):
    """Video-kind stats must hash-match the SQL oracle on non-ASCII and
    empty text too: n = payload BYTES, sum = text CODE POINTS on both
    sides (review r4 — byte-sum vs unicode() diverged on 'é')."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phenobert_ray.functions.multimodal import (
        media_decode_stats_query,
        media_decode_stats_sql,
    )

    # doc_id % 3 == 2 -> video kind; include non-ASCII and empty text
    t = pa.table({
        "doc_id": pa.array([2, 5, 8], pa.int64()),
        "text": pa.array(["café émigré", "", "plain ascii"], pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    mine = (media_decode_stats_query(str(d)).to_pandas()
            .sort_values("media_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = (con.execute(media_decode_stats_sql()).df()
              .sort_values("media_id").reset_index(drop=True))
    assert len(mine) == 3
    for col in ("media_id", "n_values", "value_sum"):
        assert (mine[col].to_numpy() == oracle[col].to_numpy()).all(), col
    # non-ASCII row: bytes != code points, so this asserts the definitions
    assert mine.loc[0, "n_values"] > len("café émigré")


# ---------------------------------------------------------------------------
# decode_fn seam (VERDICT r4 item 8): prove a REAL optional-dependency codec
# plugs into the actor-pool stage unchanged.  Skips hermetically when PIL is
# absent (this container); runs the actual jpeg/png path when present.

def _have_pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _have_pil(), reason="PIL not installed (expected in this container)")
def test_pil_decode_fn_hook():
    """With PIL available, a decode_fn built on PIL.Image decodes real
    PNG/JPEG payloads through extract_features — the documented seam at
    functions/multimodal.py (auto_decode raises for compressed mimes;
    deployments pass decode_fn)."""
    import io

    import PIL.Image
    import pyarrow as pa

    from phenobert_ray.functions.multimodal import auto_decode

    def pil_decode(payload: bytes, mime: str):
        if mime in ("image/png", "image/jpeg"):
            img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.float32).ravel() / 255.0
        return auto_decode(payload, mime)

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payloads, mimes = [], []
    for fmt, mime in (("PNG", "image/png"), ("JPEG", "image/jpeg")):
        buf = io.BytesIO()
        PIL.Image.fromarray(pixels).save(buf, format=fmt)
        payloads.append(buf.getvalue())
        mimes.append(mime)

    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "mime": pa.array(mimes, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    }))
    rows = extract_features(ds, decode_fn=pil_decode).take_all()
    assert len(rows) == 2
    for r in rows:
        f = np.asarray(r["feature"], dtype=np.float32)
        assert f.shape == (32,) and np.isfinite(f).all() and f.max() > 0


def test_custom_decode_fn_seam_hermetic():
    """The same seam exercised with a stdlib-only decode_fn: proves
    fn_constructor_kwargs wiring and per-actor construction without PIL."""
    import pyarrow as pa

    calls = {"n": 0}

    def fake_png_decode(payload: bytes, mime: str):
        assert mime == "image/png"
        return np.frombuffer(payload, dtype=np.uint8).astype(np.float32)

    ds = ray.data.from_arrow(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "mime": pa.array(["image/png"], pa.string()),
        "payload": pa.array([bytes(range(64))], pa.large_binary()),
    }))
    rows = extract_features(ds, decode_fn=fake_png_decode).take_all()
    assert len(rows) == 1
    f = np.asarray(rows[0]["feature"], dtype=np.float32)
    # 64 bytes mean-pooled pairwise into 32 dims: (0+1)/2, (2+3)/2, ...
    assert np.allclose(f, (np.arange(0, 64, 2) + 0.5).astype(np.float32))


def test_image_resizer_nearest_neighbor_exact():
    """4×4 NN resize of the 8×8 synthesis gradient picks source pixels
    (2r, 2c) exactly — verified against a direct numpy computation."""
    import numpy as np
    import pyarrow as pa

    from phenobert_ray.functions.multimodal import ImageResizer, encode_ppm

    seed = 7
    k = seed % 251 + 1
    g = ((np.arange(8 * 8 * 3, dtype=np.int64) * k) % 256).reshape(8, 8, 3)
    batch = pa.Table.from_pydict({
        "media_id": pa.array([seed], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([encode_ppm(g.astype(np.uint8))],
                            pa.large_binary()),
        "mime": pa.array(["image/x-portable-pixmap"], pa.string()),
    })
    out = ImageResizer()(batch)
    want = g[::2, ::2]
    assert out.column("n_values").to_pylist() == [48]
    assert out.column("value_sum").to_pylist() == [int(want.sum())]
