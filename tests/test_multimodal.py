"""Multimodal operators: codec round trips (pure numpy) + Spark plumbing."""

import numpy as np
import pytest

from doctor_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    decode_image_pillow,
    decode_video,
    encode_audio,
    encode_image,
    encode_video,
    generate_media,
    image_resize,
    media_dataframe,
    media_features,
    media_kind_stats,
    video_frame_sample,
)

N = 30


class TestCodecs:
    def test_image_roundtrip(self):
        px = np.arange(48, dtype=np.uint8).reshape(6, 8)
        assert np.array_equal(decode_image(encode_image(px)), px)

    def test_audio_roundtrip(self):
        s = np.array([-3, 0, 1000, -32768, 32767], dtype=np.int16)
        out, rate = decode_audio(encode_audio(s, 8000))
        assert rate == 8000 and np.array_equal(out, s)

    def test_video_roundtrip(self):
        fr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        assert np.array_equal(decode_video(encode_video(fr)), fr)

    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_image(b"JUNK" * 8)

    def test_real_codec_is_honest_stub(self):
        with pytest.raises(NotImplementedError):
            decode_image_pillow(b"\x89PNG\r\n\x1a\n")

    def test_generator_deterministic(self):
        a, b = generate_media(5), generate_media(5)
        assert a["payload"] == b["payload"] and a["expected_mean"] == b["expected_mean"]


class TestSparkOperators:
    @pytest.fixture(scope="class")
    def media(self, spark):
        return media_dataframe(spark, N, partitions=3).cache()

    def test_features_match_goldens(self, spark, media):
        feats = media_features(media)
        joined = feats.join(media.select("media_id", "expected_mean"), "media_id")
        bad = joined.where(
            ~joined.mean_value.eqNullSafe(joined.expected_mean)
        ).count()
        assert bad == 0
        assert feats.count() == N

    def test_audio_duration(self, media):
        rows = media_features(media).where("kind = 'audio'").collect()
        assert rows and all(abs(r.duration_sec - 0.25) < 1e-9 for r in rows)

    def test_image_resize_bounds(self, media):
        from doctor_spark.operators.multimodal import decode_image_any

        thumbs = image_resize(media, max_dim=16).collect()
        assert thumbs
        for t in thumbs:
            assert max(t.width, t.height) == 16
            px = decode_image_any(bytes(t.thumbnail))
            assert px.shape[:2] == (t.height, t.width)

    def test_video_frame_sample(self, media):
        frames = video_frame_sample(media, every_k=2)
        rows = frames.collect()
        assert rows
        # frame payloads decode as images, means match
        for r in rows[:5]:
            px = decode_image(bytes(r.frame))
            assert round(float(px.mean()), 4) == r.frame_mean
        # every video contributes ceil(n_frames / 2) rows
        metas = {m.media_id: m.meta.n_frames for m in media.where("kind='video'").collect()}
        per = {}
        for r in rows:
            per[r.media_id] = per.get(r.media_id, 0) + 1
        assert all(per[mid] == (nf + 1) // 2 for mid, nf in metas.items())

    def test_kind_stats_relational(self, media):
        stats = {r.kind: r for r in media_kind_stats(media).collect()}
        assert set(stats) == {"image", "audio", "video"}
        assert stats["image"].max_width is not None
        assert stats["video"].max_frames is not None
