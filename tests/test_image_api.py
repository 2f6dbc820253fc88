"""Client-API parity tests, mirroring the reference's plan-construction
suite (/root/reference/tests/test_image.py asserts the call-graph JSON per
operator; here the analog is: each operator builds the expected lazy plan —
schema, band names, dtype — WITHOUT running a job)."""

import pytest

from geoproc_spark import synth
from geoproc_spark.image import Image


@pytest.fixture(scope="module")
def img(spark):
    return Image.from_df(synth.tiles_df(spark, "A"), 2, synth.TILE_PX)


@pytest.fixture(scope="module")
def img_b(spark):
    return Image.from_df(synth.tiles_df(spark, "B"), 1, synth.TILE_PX)


def _assert_lazy_image(result, band_names, dtype="float64"):
    assert isinstance(result, Image)
    assert result.band_names == band_names
    assert result.dtype == dtype
    # lazy: building the op must not have triggered a job — the DataFrame
    # is unevaluated lineage (analysis only)
    assert result.df.schema is not None


ARITH = ["__add__", "__sub__", "__mul__", "__truediv__", "__floordiv__"]
COMPARE = ["__lt__", "__le__", "__eq__", "__ne__", "__gt__", "__ge__"]


@pytest.mark.parametrize("op", ARITH + COMPARE)
def test_binary_ops_build_lazy_float64(img, img_b, op):
    # image op image: left operand's band names, float64 result
    _assert_lazy_image(getattr(img, op)(img_b), ["B1", "B2"])


@pytest.mark.parametrize("op", ARITH)
def test_scalar_ops_build_lazy(img, op):
    _assert_lazy_image(getattr(img, op)(2), img.band_names)


def test_reverse_scalar_ops(img):
    _assert_lazy_image(2 + img, img.band_names)
    _assert_lazy_image(2.0 * img, img.band_names)
    _assert_lazy_image(2 - img, img.band_names)
    _assert_lazy_image(2 / img, img.band_names)
    _assert_lazy_image(2 // img, img.band_names)


def test_abs_keeps_dtype(img):
    # unary abs does NOT force float64 (reference image.py:243-257 vs :311)
    i2 = Image.from_df(synth.tiles_df(img.df.sparkSession, "A"), 2, synth.TILE_PX, dtype="uint8")
    _assert_lazy_image(abs(i2), i2.band_names, dtype="uint8")


def test_constant_is_boundless():
    c = Image.constant(7.5)
    assert c.scalar == 7.5 and c.df is None
    assert c.info["boundless"] is True


def test_two_constants_rejected():
    with pytest.raises(ValueError, match="tiles"):
        Image.constant(1) + Image.constant(2)


def test_select_narrows_schema(img):
    s = img.select(["B2"])
    assert s.band_names == ["B2"]
    s2 = img.select([0])
    assert s2.band_names == ["B1"]


def test_info_is_driver_side(img):
    info = img.info
    assert info == {
        "band_names": ["B1", "B2"],
        "dtype": "float64",
        "n_px": synth.TILE_PX,
        "boundless": False,
        "min_zoom": None,  # unknown until with_zoom_range derives it (F10)
        "max_zoom": None,
    }


def test_chained_expression_stays_lazy(img, img_b):
    # the reference's notebook idiom: fold ops over images
    expr = abs((img + img_b) * 2 - 1) / (img_b + 0.5)
    _assert_lazy_image(expr, ["B1", "B2"])
    # and it evaluates when asked
    assert expr.df.limit(1).count() == 1

def test_boundless_export_guard(tmp_path):
    """P5 (reference server/image.py:171-178): exporting a boundless
    constant image raises before any job."""
    import pytest

    from geoproc_spark.image import Image

    c = Image.constant(3.0, n_px=16)
    with pytest.raises(ValueError, match="boundless"):
        c.export(str(tmp_path / "nope"))
