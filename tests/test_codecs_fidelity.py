"""Codec roundtrips + sampled PSNR fidelity pass (SURVEY.md §5 fidelity
invariant; BASELINE input_hint: decoded-pixel allclose + caption equality).
"""

from __future__ import annotations

import numpy as np
import pytest

from jsonschema_spark import fixtures as FX
from jsonschema_spark.functions import imagecodecs as codecs
from jsonschema_spark.passes.fidelity import fidelity_violations, phash_udf


def _px(w, h, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (16, 16), (33, 17), (64, 63)])
def test_png_roundtrip_bit_exact(w, h):
    px = _px(w, h)
    assert np.array_equal(codecs.png_decode(codecs.png_encode(px)), px)


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (16, 16), (33, 17)])
def test_bmp_roundtrip_bit_exact(w, h):
    # odd widths exercise the 4-byte row padding
    px = _px(w, h)
    assert np.array_equal(codecs.bmp_decode(codecs.bmp_encode(px)), px)


def test_raw_roundtrip():
    px = _px(12, 9)
    assert np.array_equal(codecs.raw_decode(codecs.raw_encode(px), 12, 9), px)


def test_psnr_semantics():
    px = _px(32, 32)
    assert codecs.psnr(px, px) == float("inf")
    noisy = px.copy()
    noisy[0, 0, 0] ^= 0xFF
    p = codecs.psnr(px, noisy)
    assert 20 < p < 60
    assert codecs.psnr(px, 255 - px) < 20


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.png_decode(b"not a png at all")
    with pytest.raises(ValueError):
        codecs.bmp_decode(b"XXgarbage")


CFG = FX.FixtureConfig(n=500, n_parts=8, with_bytes=True)


def test_phash_udf_matches_generator(spark):
    """B27: the vectorized phash recompute from encoded bytes equals the
    generator's phash for unplanted rows."""
    from pyspark.sql import functions as F

    clean_cfg = FX.FixtureConfig(n=200, n_parts=8, plants=False, with_bytes=True)
    df = FX.generate_images_df(spark, clean_cfg)
    # jpeg-fmt rows store RAW payloads; decode with the actual stored format
    stored_fmt = F.when(F.col("fmt").isin("png", "bmp"), F.col("fmt")).otherwise(F.lit("raw"))
    got = df.select(
        "image_id", "phash",
        phash_udf()(F.col("bytes"), stored_fmt, F.col("w"), F.col("h")).alias("re"),
    )
    bad = got.where(F.col("phash") != F.col("re")).count()
    assert bad == 0


def test_fidelity_pass_finds_exactly_the_plants(spark):
    """Full-fraction fidelity over a planted table: violations must be exactly
    the rows whose bytes/caption can't match the generator —
    dup-id rows (bytes belong to a different index), bad-id rows
    (unparseable), and null-caption rows (caption mismatch)."""
    plan = FX.build_plan(CFG)
    df = FX.generate_images_df(spark, CFG)
    v = fidelity_violations(df, CFG, fraction=1.0).collect()
    got = {(r.row_key, r.path) for r in v}
    got_keys = {r.row_key for r in v}

    # category guarantees
    for i in plan.bad_id:
        assert (f"IMG_{i}", "/image_id") in got
    for i in plan.null_caption:
        assert (f"img-{i:012d}", "/caption") in got
    for i, j in plan.dup_id.items():
        # row i carries row j's id but row i's pixels → bytes can't verify
        assert (f"img-{j:012d}", "/bytes") in got
    for i in plan.orphan_fmt:
        # fmt overwritten to webp after encoding → stored payload can't be
        # decoded under the declared format unless it was raw to begin with
        if FX.fmt_for(i) in ("png", "bmp"):
            assert (f"img-{i:012d}", "/bytes") in got

    # and nothing BUT planted rows is ever flagged (bit-exact codecs)
    allowed = (
        {f"IMG_{i}" for i in plan.bad_id}
        | {f"img-{i:012d}" for i in plan.null_caption}
        | {f"img-{j:012d}" for j in plan.dup_id.values()}
        | {f"img-{i:012d}" for i in plan.orphan_fmt}
    )
    assert got_keys <= allowed
    assert all(r.keyword == "fidelity" for r in v)


def test_fidelity_sampling_bounds_cost(spark):
    """The sampled pass must read ~fraction of rows (scale guarantee)."""
    df = FX.generate_images_df(spark, FX.FixtureConfig(n=400, n_parts=8, with_bytes=True))
    full = fidelity_violations(df, CFG, fraction=1.0)
    # sampled plan contains a Sample node before the Python stage
    plan = full.sample(0.01)._jdf.queryExecution().optimizedPlan().toString()
    assert "Sample" in plan
