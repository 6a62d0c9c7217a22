"""Multimodal column plumbing: image/audio/video as opaque BinaryType
payloads with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container): a
clearly-marked seam where PIL/librosa/ffmpeg-style decoding plugs in. The
Spark-side contract — schema, batch iteration, partition sizing — is real
and tested (tests/test_llm.py).

Scale notes: payloads ride in parquet binary columns; mapInPandas
processes Arrow batches so peak memory is one batch of payloads per task
(cap with spark.sql.execution.arrow.maxRecordsPerBatch when payloads are
large); feature extraction is a narrow map — no shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema of the featurize output
FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, feat array<double>"
)


def attach_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata
    struct. (Fixtures have no real media, so the payload is the UTF-8
    text bytes — the plumbing is identical for JPEG/PCM/MP4 bytes.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )
    return docs.select(
        F.col(id_col), payload.alias("payload"), meta.alias("meta")
    )


def decode_media(payload: bytes, mime: str) -> object:
    """STUB — real decoders (PIL.Image.open, librosa.load, frame
    samplers) are not available in this container."""
    raise NotImplementedError(
        "media decoding is stubbed in this environment; "
        "plug a real decoder into extract_features()._featurize"
    )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas featurizer. Uses a deterministic fake in place of
    decode_media so the pipeline is testable end-to-end: feature =
    [byte length, first byte, last byte] as doubles."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # decode_media(p, mime) would run here; deterministic
                    # stand-in keeps the batch shape honest:
                    "feat": [
                        [float(len(p)), float(p[0]), float(p[-1])]
                        if len(p)
                        else [0.0, 0.0, 0.0]
                        for p in payloads
                    ],
                }
            )
            yield out

    return with_payload.mapInPandas(_featurize, FEATURE_SCHEMA)
