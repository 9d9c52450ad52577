"""AVI container (gooselite.avi) + frame sampling.  Cross-engine value
equality of the q_video_frames probe vs DuckDB is covered by
test_relational_probes."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gooselite.avi import (AviData, read_avi, read_avi_safe, sample_frames,
                           write_avi)


def _frames(n, seed=7):
    return [bytes(((seed + i * 13 + j) % 256 for j in range(20 + i)))
            for i in range(n)]


def test_roundtrip_geometry_and_frames():
    frames = _frames(6)
    got = read_avi(write_avi(frames, 320, 240, fps=25))
    assert (got.width, got.height, got.fps) == (320, 240, 25)
    assert got.frames == frames


def test_junk_chunks_and_odd_sizes_skipped():
    frames = [b"x" * 7, b"y" * 13]  # odd sizes: pad-byte path
    avi = write_avi(frames, 8, 8, fps=10, extra_chunks=True)
    assert b"JUNK" in avi
    assert read_avi(avi).frames == frames


def test_empty_clip_roundtrips():
    got = read_avi(write_avi([], 8, 8, fps=25))
    assert got.frames == []


def test_frame_count_mismatch_rejected():
    avi = bytearray(write_avi(_frames(3), 8, 8))
    # corrupt avih dwTotalFrames (5th u32 of the avih payload)
    at = avi.find(b"avih") + 8 + 16
    struct.pack_into("<I", avi, at, 99)
    with pytest.raises(ValueError):
        read_avi(bytes(avi))
    assert read_avi_safe(bytes(avi)) is None


def test_bad_magic_and_truncation_rejected():
    avi = write_avi(_frames(2), 8, 8)
    assert read_avi_safe(b"RIFX" + avi[4:]) is None
    assert read_avi_safe(avi[:8] + b"IVA " + avi[12:]) is None
    assert read_avi_safe(avi[: len(avi) // 2]) is None
    with pytest.raises(ValueError):
        read_avi(b"")


def test_sample_frames_stride():
    avi = AviData(8, 8, 25, _frames(7))
    assert sample_frames(avi, 2) == avi.frames[::2]
    assert sample_frames(avi, 3) == avi.frames[::3]
    assert len(sample_frames(avi, 1)) == 7
    with pytest.raises(ValueError):
        sample_frames(avi, 0)


def test_png_frames_decode_through_container():
    from gooselite.png import read_png, write_png_gray

    rows = [bytes((r * 8 + c) % 256 for c in range(8)) for r in range(8)]
    avi = write_avi([write_png_gray(rows)] * 3, 8, 8)
    for fb in sample_frames(read_avi(avi), 2):
        w, h, got = read_png(fb)
        assert (w, h) == (8, 8) and got == rows


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600))
def test_read_avi_safe_total_over_garbage(b):
    read_avi_safe(b)  # must never raise


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200), st.integers(0, 400))
def test_read_avi_safe_total_over_corrupted_valid(prefix, cut):
    avi = write_avi(_frames(3), 16, 16)
    mutated = avi[:cut] + prefix + avi[cut + len(prefix):]
    read_avi_safe(mutated)  # must never raise
