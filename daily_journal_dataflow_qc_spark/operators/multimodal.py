"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, partition-preserving UDF shape, batch
iteration, metadata propagation) is real and tested; the actual media
decode is STUBBED — the container has no image/audio codecs — behind
``decoder="fake"`` (deterministic hash-derived features) or
``decoder="real"`` (raises NotImplementedError at the decode call site,
marking exactly where a codec library would plug in).

Feature math is vectorized across the Arrow batch (one np.stack + axis-wise
mean/std for the whole batch); only the per-blob hash/decode — inherently
per-item — runs in a Python loop over the column.

Upstream reference analogue: the audio-QC feature extraction
(audio_diary_qc.py:122-168, soundfile+librosa) — same shape: binary blob in,
small typed feature row out, vectorized per Arrow batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feat_mean double, feat_std double, n_frames int"
)

SIGNAL_LEN = 256


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes -> pseudo-signal."""
    seed = int(hashlib.sha256(content).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(SIGNAL_LEN)


def extract_features(
    media: DataFrame, decoder: str = "fake", frame_sample_every: int = 32
) -> DataFrame:
    """binary -> typed feature rows, one Arrow batch at a time.

    ``decoder='real'`` marks the integration point for an actual codec
    (PIL/soundfile/pyav) — deliberately NotImplemented in this container.
    ``digest`` is sha256 of the raw bytes (exactly DuckDB's
    ``sha256(<text>)`` when content is UTF-8-encoded text, which makes the
    plumbing oracle-checkable end to end).
    """
    if decoder == "real":
        # fail fast at plan time, not per row inside the executor loop
        def run_real(batches):
            raise NotImplementedError(
                "media codecs unavailable in this container; plug a decoder "
                "in here (PIL / soundfile / pyav)"
            )
            yield  # pragma: no cover — marks this as a generator

        return media.mapInPandas(run_real, FEATURE_SCHEMA)

    n_frames = len(range(0, SIGNAL_LEN, frame_sample_every))

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            # per-blob work (hash-seeded decode) is inherently per-item; the
            # FEATURE math is vectorized across the whole batch below
            signals = np.stack([_fake_decode(b) for b in blobs])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": np.fromiter((len(b) for b in blobs), dtype=np.int64),
                    "digest": [hashlib.sha256(b).hexdigest() for b in blobs],
                    "feat_mean": np.round(signals.mean(axis=1), 6),
                    "feat_std": np.round(signals.std(axis=1), 6),
                    "n_frames": np.full(len(blobs), n_frames, dtype=np.int32),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


AUDIO_METRIC_SCHEMA = "media_id long, overall_db double, mean_flatness double"
_REF_RMS = 2e-5  # reference pressure (audio_diary_qc.py:81)


def audio_metrics(
    media: DataFrame, decoder: str = "fake", frame_length: int = 64, hop: int = 32
) -> DataFrame:
    """M1/M2: RMS loudness in dB and mean spectral flatness of the decoded
    signal (audio_diary_qc.py:160-168).

    * dB: ``round(20*log10(rms / 2e-5), 2)`` — the reference's exact
      formula including its 2e-5 reference pressure,
    * flatness: per-frame geometric/arithmetic mean ratio of the power
      spectrum (the librosa spectral_flatness definition re-derived on
      numpy rfft), mean over frames, rounded to 4 — the reference reports
      only the mean ("max and min were never really informative").

    All math is vectorized across the Arrow batch: one np.stack, one
    batched rfft over (batch, n_frames, frame_length).
    """
    if decoder == "real":
        def run_real(batches):
            raise NotImplementedError(
                "media codecs unavailable in this container; plug a decoder "
                "in here (soundfile / librosa)"
            )
            yield  # pragma: no cover

        return media.mapInPandas(run_real, AUDIO_METRIC_SCHEMA)

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            blobs = [bytes(c) if c is not None else b"" for c in pdf["content"]]
            sig = np.stack([_fake_decode(b) for b in blobs])  # (n, SIGNAL_LEN)
            rms = np.sqrt(np.square(sig).mean(axis=1))
            vol = np.round(20.0 * np.log10(rms / _REF_RMS), 2)
            starts = range(0, SIGNAL_LEN - frame_length + 1, hop)
            frames = np.stack([sig[:, s : s + frame_length] for s in starts], axis=1)
            power = np.abs(np.fft.rfft(frames, axis=2)) ** 2  # (n, frames, bins)
            amin = 1e-10
            gmean = np.exp(np.log(power + amin).mean(axis=2))
            amean = power.mean(axis=2) + amin
            flat = np.round((gmean / amean).mean(axis=1), 4)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "overall_db": vol,
                    "mean_flatness": flat,
                }
            )

    return media.mapInPandas(run, AUDIO_METRIC_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table (text
    bytes as the opaque payload) — the oracle-checkable ingest path."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit(640).cast("int").alias("width"),
            F.lit(480).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length("text") * 100).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads + typed metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8))
        meta = {
            "width": 640 if kind != "audio" else None,
            "height": 480 if kind != "audio" else None,
            "sample_rate": 16000 if kind != "image" else None,
            "duration_ms": int(rng.integers(500, 60000)) if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, content, meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
