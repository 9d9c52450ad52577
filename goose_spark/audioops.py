"""Audio modality as a Spark operator: real WAV decode, oracle-backed.

Counterpart of `goose_spark.imageops` (PNG) for the audio column of a
multimodal table.  Each document gets a deterministic PCM-16 signal —
sample[i] = ((doc_id*7919 + i*104729) % 65536) - 32768 over the flat
interleaved index — serialized to a real RIFF/WAVE container by
`gooselite.wav.write_wav` (mono/stereo and extra LIST/junk chunks vary
by doc_id so the reader's chunk-skipping and channel handling are on
the gated path), then DECODED back and reduced to exact-integer
features (peak |s|, Σs, Σs²).  The DuckDB oracle recomputes the same
features straight from the closed-form signal, so the value hash
matches iff RIFF framing, chunk walk, pad bytes, int16 endianness and
interleaving all decoded correctly.

Scale shape (100 TB): one linear mapInPandas pass — no shuffle, no
collect; numpy does the per-batch feature math.  On a real multimodal
table the synth half drops out and `audio_bytes` arrives as a column;
the decode+featurize half is unchanged.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from goose_spark.queries import load

_A, _B = 7919, 104729  # synth multipliers; also baked into the oracle SQL


def _features_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from gooselite.wav import read_wav, write_wav

    for batch in it:
        rows = {k: [] for k in ("doc_id", "sr", "n_channels", "n_frames",
                                "peak_abs", "sum_sq", "sum_samples")}
        for doc_id in batch["doc_id"]:
            d = int(doc_id)
            n_channels = 1 if d % 2 == 0 else 2
            sr = 8000 + (d % 4) * 4000
            n_frames = 128 + (d % 64)
            i = np.arange(n_frames * n_channels, dtype=np.int64)
            synth = ((d * _A + i * _B) % 65536) - 32768
            wav = write_wav(synth.tolist(), sr, n_channels,
                            extra_chunks=(d % 3 == 0))
            got = read_wav(wav)  # raises on any framing bug: probe fails loudly
            s = np.asarray(got.samples, dtype=np.int64)
            rows["doc_id"].append(d)
            rows["sr"].append(got.sample_rate)
            rows["n_channels"].append(got.n_channels)
            rows["n_frames"].append(len(s) // got.n_channels)
            rows["peak_abs"].append(int(np.abs(s).max()))
            rows["sum_sq"].append(int((s * s).sum()))
            rows["sum_samples"].append(int(s.sum()))
        yield pd.DataFrame({k: pd.Series(v, dtype="int64")
                            for k, v in rows.items()})


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic PCM synth → real WAV container → decode → exact
    integer features, one shuffle-free mapInPandas pass."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        _features_batches,
        schema="doc_id long, sr long, n_channels long, n_frames long, "
               "peak_abs long, sum_sq long, sum_samples long")


# Recomputes the closed-form signal; every feature is exact BIGINT math,
# so the hash gate carries no float-rounding risk.  generate_series
# cannot take a lateral bound in DuckDB 1.0 — cross-join the max length
# (384) and filter.
ORACLE_AUDIO_FEATURES = """
WITH p AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT) AS n_channels,
         CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sr,
         CAST(128 + (doc_id % 64) AS BIGINT) AS n_frames
  FROM documents
),
s AS (
  SELECT p.*, ((p.doc_id * 7919 + g.i * 104729) % 65536) - 32768 AS v
  FROM p, generate_series(0, 383) AS g(i)
  WHERE g.i < p.n_frames * p.n_channels
)
SELECT doc_id, sr, n_channels, n_frames,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
       CAST(SUM(v * v) AS BIGINT)  AS sum_sq,
       CAST(SUM(v) AS BIGINT)     AS sum_samples
FROM s
GROUP BY doc_id, sr, n_channels, n_frames
"""
