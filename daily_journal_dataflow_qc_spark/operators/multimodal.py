"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, partition-preserving UDF shape, batch
iteration, metadata propagation) is real and tested; the actual media
decode is STUBBED — the container has no image/audio codecs — behind
``decoder="fake"`` (deterministic hash-derived features) or
``decoder="real"`` (raises NotImplementedError at the decode call site,
marking exactly where a codec library would plug in).

Upstream reference analogue: the audio-QC feature extraction
(audio_diary_qc.py:122-168, soundfile+librosa) — same shape: binary blob in,
small typed feature row out, vectorized per Arrow batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
    "media_id long, kind string, n_bytes long, sha1 string, "
    "feat_mean double, feat_std double, n_frames int"
)


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: bytes -> pseudo-signal."""
    seed = int(hashlib.sha1(content).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(256)


def extract_features(
    media: DataFrame, decoder: str = "fake", frame_sample_every: int = 32
) -> DataFrame:
    """binary -> typed feature rows, one Arrow batch at a time.

    ``decoder='real'`` marks the integration point for an actual codec
    (PIL/soundfile/pyav) — deliberately NotImplemented in this container.
    """

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for r in pdf.itertuples():
                content = bytes(r.content) if r.content is not None else b""
                if decoder == "real":
                    raise NotImplementedError(
                        "media codecs unavailable in this container; plug a "
                        "decoder in here (PIL / soundfile / pyav)"
                    )
                sig = _fake_decode(content)
                frames = sig[::frame_sample_every]
                rows.append(
                    (
                        r.media_id,
                        r.kind,
                        len(content),
                        hashlib.sha1(content).hexdigest(),
                        float(np.round(sig.mean(), 6)),
                        float(np.round(sig.std(), 6)),
                        int(len(frames)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "sha1",
                    "feat_mean", "feat_std", "n_frames",
                ],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


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
