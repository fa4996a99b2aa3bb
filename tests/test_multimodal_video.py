"""PV61 video container: round-trip, seek-exactness, frame sampling, and
per-video summary features through the Arrow-batched Spark stages."""

import numpy as np
import pytest

from pagerank_spark.operators.multimodal import (
    _pool8,
    decode_video_frame,
    encode_video,
    extract_video_features,
    sample_frames,
)


def _frames(mid, n, w=9, h=6):
    out = []
    for fi in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        out.append((((yy * 13 + xx * 7 + mid * 31 + fi * 5) % 256).astype(np.uint8)[:, :, None].repeat(3, axis=2)))
    return out


def test_video_roundtrip_seek():
    frames = _frames(3, 5)
    payload = encode_video(frames, fps=24)
    for fi in (0, 2, 4):
        got = decode_video_frame(payload, fi)
        assert got.shape == (6, 9, 3)
        assert np.array_equal(got.astype(np.uint8), frames[fi])
    with pytest.raises(ValueError, match="out of range"):
        decode_video_frame(payload, 5)
    with pytest.raises(ValueError, match="PV61"):
        decode_video_frame(b"garbage", 0)


def test_sample_frames_spark(spark):
    rows = [(mid, bytearray(encode_video(_frames(mid, 4 + mid), fps=10))) for mid in range(3)]
    rows.append((99, bytearray(b"not a video")))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(media, every_k=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # media m has 4+m frames -> sampled indices 0,2,(4)
    assert sorted(r["frame_idx"] for r in by_id[0]) == [0, 2]
    assert sorted(r["frame_idx"] for r in by_id[1]) == [0, 2, 4]
    assert sorted(r["frame_idx"] for r in by_id[2]) == [0, 2, 4]
    # sampled features equal the direct per-frame pooling
    for r in by_id[1]:
        expect = _pool8(decode_video_frame(bytes(encode_video(_frames(1, 5), fps=10)), r["frame_idx"]).mean(axis=2))
        assert np.allclose(r["feature"], expect, atol=1e-6)
    # undecodable payload -> single sentinel row
    assert [(r["frame_idx"], r["decode_ok"]) for r in by_id[99]] == [(-1, False)]


def test_extract_video_features_spark(spark):
    rows = [(mid, bytearray(encode_video(_frames(mid, 6), fps=30))) for mid in range(2)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_video_features(media, every_k=3).collect()}
    for mid in range(2):
        r = got[mid]
        assert (r["n_frames"], r["fps"], r["decode_ok"]) == (6, 30, True)
        payload = encode_video(_frames(mid, 6), fps=30)
        expect = np.mean(
            [_pool8(decode_video_frame(payload, fi).mean(axis=2)) for fi in (0, 3)], axis=0
        )
        assert np.allclose(r["feature"], expect, atol=1e-6)
