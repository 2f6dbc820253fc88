"""S5 PNG tile sink: real PNG bytes, round-trip decoded against the numpy
render oracle; deterministic across partitionings."""

import numpy as np

from geoproc_spark import synth
from geoproc_spark.functions import png as P
from geoproc_spark.image import Image
from geoproc_spark.oracle import numpy_oracle as O


def test_png_encoder_roundtrip():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    alpha = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    d2, a2 = P.decode_png(P.encode_gray_png(data, alpha))
    np.testing.assert_array_equal(d2, data)
    np.testing.assert_array_equal(a2, alpha)
    d3, a3 = P.decode_png(P.encode_gray_png(data))
    np.testing.assert_array_equal(d3, data)
    assert a3 is None


def test_render_png_matches_numpy_oracle(spark):
    """Decoded PNG planes == select -> clamped rescale -> opacity -> uint8
    from the single-process oracle, tile for tile."""
    a = Image.from_df(synth.tiles_df(spark, "A"), synth.TILE_BANDS["A"], synth.TILE_PX)
    rows = a.render_png("B1", (10.0, 70.0), opacity=0.5).collect()
    na = synth.tile_pixels_np("A")
    sel = {k: (d[0:1], m) for k, (d, m) in na.items()}
    want = O.render_uint8(O.opacity(O.rescale(sel, [(10.0, 70.0)]), 0.5))
    side = 16
    assert len(rows) == len(want)
    for r in rows:
        wd, wm = want[(r["z"], r["x"], r["y"])]
        data, alpha = P.decode_png(bytes(r["png"]))
        np.testing.assert_array_equal(data, wd[0].reshape(side, side).astype(np.uint8))
        np.testing.assert_array_equal(alpha, wm.reshape(side, side).astype(np.uint8))


def test_render_png_bytes_partition_invariant(spark):
    a = Image.from_df(synth.tiles_df(spark, "A"), synth.TILE_BANDS["A"], synth.TILE_PX)
    one = {
        (r["z"], r["x"], r["y"]): bytes(r["png"])
        for r in Image.from_df(a.df.repartition(1), 2, synth.TILE_PX)
        .render_png("B1", (0.0, 96.0))
        .collect()
    }
    many = {
        (r["z"], r["x"], r["y"]): bytes(r["png"])
        for r in Image.from_df(a.df.repartition(7), 2, synth.TILE_PX)
        .render_png("B1", (0.0, 96.0))
        .collect()
    }
    assert one == many


def test_rgb_png_roundtrip_and_render():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (3, 16, 16)).astype(np.uint8)
    alpha = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    d, a = P.decode_png(P.encode_rgb_png(rgb, alpha))
    np.testing.assert_array_equal(d, rgb)
    np.testing.assert_array_equal(a, alpha)
    d2, a2 = P.decode_png(P.encode_rgb_png(rgb))
    np.testing.assert_array_equal(d2, rgb)
    assert a2 is None


def test_render_png_three_band(spark):
    """3-band truecolor path (VisualizationParams bands contract): image A
    only has 2 bands, so render B1,B2,B1 — decode must give the clamped
    rescaled uint8 planes in order."""
    a = Image.from_df(synth.tiles_df(spark, "A"), synth.TILE_BANDS["A"], synth.TILE_PX)
    rows = a.render_png(["B1", "B2", "B1"], (0.0, 96.0)).collect()
    na = synth.tile_pixels_np("A")
    side = 16
    for r in rows:
        d, m = na[(r["z"], r["x"], r["y"])]
        sel = np.stack([d[0], d[1], d[0]])
        want = (np.clip(sel, 0.0, 96.0) / 96.0 * 255.0).astype(np.uint8)
        rgb, alpha = P.decode_png(bytes(r["png"]))
        np.testing.assert_array_equal(rgb, want.reshape(3, side, side))
        np.testing.assert_array_equal(alpha, m.reshape(side, side).astype(np.uint8))
    import pytest

    with pytest.raises(ValueError):
        a.render_png(["B1", "B2"], (0.0, 96.0))
