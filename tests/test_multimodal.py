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
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode_fn="real")
