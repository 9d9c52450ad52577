"""PNG codec (gooselite.png) + the q_image_decode probe.  Cross-engine
value equality vs DuckDB is covered by test_relational_probes."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gooselite.png import (UnsupportedImage, read_png, read_png_safe,
                           write_png_gray)


def _rows(w, h, fn):
    return [bytes((fn(x, y)) & 0xFF for x in range(w)) for y in range(h)]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter_type(ftype):
    rows = _rows(23, 11, lambda x, y: x * 7 + y * 13)
    png = write_png_gray(rows, filters=[ftype])
    w, h, dec = read_png(png)
    assert (w, h) == (23, 11) and dec == rows


def test_roundtrip_cycling_filters_gradient_and_noise():
    import random

    rnd = random.Random(7)
    rows = [bytes(rnd.randrange(256) for _ in range(64)) for _ in range(40)]
    assert read_png(write_png_gray(rows))[2] == rows
    rows = _rows(64, 40, lambda x, y: (x * x + 3 * y) // 2)
    assert read_png(write_png_gray(rows))[2] == rows


def test_single_pixel_and_single_row():
    assert read_png(write_png_gray([b"\x7f"]))[2] == [b"\x7f"]
    assert read_png(write_png_gray([bytes(range(200, 240))]))[2] \
        == [bytes(range(200, 240))]


def test_crc_corruption_rejected():
    png = bytearray(write_png_gray(_rows(8, 8, lambda x, y: x ^ y)))
    png[len(png) // 2] ^= 0xFF  # somewhere in IDAT payload or its CRC
    with pytest.raises(ValueError):
        read_png(bytes(png))
    assert read_png_safe(bytes(png)) is None


def test_unsupported_color_type_raises_unsupported():
    # hand-build an RGB IHDR: valid PNG, out of codec scope
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(UnsupportedImage):
        read_png(sig + chunk)
    assert read_png_safe(sig + chunk) is None


def test_geometry_mismatch_rejected():
    rows = _rows(8, 4, lambda x, y: x)
    png = write_png_gray(rows)
    # claim height 5 in IHDR (CRC recomputed) — scanline count now wrong
    ihdr = struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0)
    patched = (png[:8] + struct.pack(">I", 13) + b"IHDR" + ihdr
               + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
               + png[8 + 12 + 13:])
    with pytest.raises(ValueError):
        read_png(patched)


def test_hostile_inputs_total():
    assert read_png_safe(None) is None
    assert read_png_safe(b"") is None
    assert read_png_safe(b"\x89PNG\r\n\x1a\n") is None
    assert read_png_safe(b"not a png at all") is None


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=1024))
def test_fuzz_total(data):
    # must never raise; any successful decode must be well-formed
    res = read_png_safe(b"\x89PNG\r\n\x1a\n" + data)
    if res is not None:
        w, h, rows = res
        assert len(rows) == h and all(len(r) == w for r in rows)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 20), st.integers(0, 2**32 - 1))
def test_fuzz_roundtrip(w, h, seed):
    import random

    rnd = random.Random(seed)
    rows = [bytes(rnd.randrange(256) for _ in range(w)) for _ in range(h)]
    assert read_png(write_png_gray(rows)) == (w, h, rows)


# ------------------------------------------------------------ Spark level --
def test_image_probe_plan_single_python_pass(spark):
    from goose_spark.imageops import q_image_decode

    df = q_image_decode(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "Exchange" not in tree
