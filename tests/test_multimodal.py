"""Multimodal plumbing: decode/feature/resize/frame-sample over binary
payload columns (deterministic fake codec; real-codec hook raises)."""

import struct

import numpy as np
import pytest

from geoproc_spark.operators import multimodal as mm


def test_features_match_numpy_oracle(spark):
    got = sorted(map(tuple, mm.extract_features(mm.assets_df(spark, 120)).collect()))
    want = sorted(mm.numpy_oracle_features(120))
    assert got == want


def test_features_partition_invariant(spark):
    a = mm.assets_df(spark, 90)
    one = sorted(map(tuple, mm.extract_features(a.repartition(1)).collect()))
    many = sorted(map(tuple, mm.extract_features(a.repartition(16)).collect()))
    assert one == many


def test_resize_shapes_and_determinism(spark):
    a = mm.assets_df(spark, 60)
    r = mm.resize_images(a, 4, 4).collect()
    n_images = a.filter("kind = 'image'").count()
    assert len(r) == n_images
    for row in r:
        w, h, f = struct.unpack(">III", bytes(row.payload[:12]))
        assert (w, h, f) == (4, 4, 1)
        assert len(row.payload) == 12 + 16
    # resized features still decode through the standard path
    feats = mm.extract_features(spark.createDataFrame(r, mm.ASSET_SCHEMA)).collect()
    assert all(x.width == 4 and x.height == 4 for x in feats)


def test_frame_sampling(spark):
    a = mm.assets_df(spark, 60)
    frames = mm.sample_frames(a, every_k=2).collect()
    vids = {r.asset_id: r for r in a.filter("kind = 'video'").collect()}
    by_asset = {}
    for fr in frames:
        by_asset.setdefault(fr.asset_id, []).append(fr.frame_idx)
    assert set(by_asset) == set(vids)
    for aid, idxs in by_asset.items():
        w, h, f = struct.unpack(">III", bytes(vids[aid].payload[:12]))
        assert sorted(idxs) == list(range(0, f, 2))
        # sampled frame bytes match the right slice of the original body
        frame0 = next(fr for fr in frames if fr.asset_id == aid and fr.frame_idx == 0)
        body = np.frombuffer(bytes(vids[aid].payload)[12:], dtype=np.uint8)
        np.testing.assert_array_equal(
            np.frombuffer(bytes(frame0.payload)[12:], dtype=np.uint8),
            body[: w * h],
        )


def test_real_codec_raises(spark):
    with pytest.raises(NotImplementedError, match="plug a real decoder"):
        mm._decode_fake("JPEG", b"\x00" * 16)
