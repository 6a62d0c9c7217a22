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


#: schema of resize_images output — payload out plus the new dims
RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int"
)

#: schema of sample_frames output — one row PER SAMPLED FRAME (1:N)
FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame binary, ts_ms bigint"
)


def _load_pil():
    """Import-guarded decoder lookup: returns PIL's Image module when
    the environment ships it, else None (this container does not; a
    production cluster image would). Module-level so tests can inject a
    stand-in and exercise the real-decode branch deterministically."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


def resize_images(
    with_payload: DataFrame,
    width: int = 224,
    height: int = 224,
    use_decoder: bool | None = None,
) -> DataFrame:
    """Image resize over mapInPandas (1:1 rows), with TWO pixel paths:

    - real decode (taken when PIL imports, or forced via
      ``use_decoder=True``): ``Image.open(BytesIO(p)).resize((w, h))``,
      grayscale raw bytes out; a payload that fails to decode falls back
      to the stand-in rather than poisoning the batch (the reference's
      log-and-continue posture for malformed frames);
    - stand-in (codec-less environments): truncate/pad the payload to
      width*height bytes.

    Both paths honor the same contract — output schema, declared dims,
    exact payload size, Arrow batch iteration — and both are covered by
    tests (the real branch via an injected fake decoder, since PIL is
    absent in this container)."""
    # resolve the decoder ON THE DRIVER so the chosen object rides into
    # the closure (cloudpickle ships a real module by reference and an
    # injected fake by value — either way the workers run what the
    # driver selected, not a per-worker re-import)
    image_mod = _load_pil() if use_decoder in (None, True) else None
    if use_decoder is True and image_mod is None:
        raise RuntimeError("use_decoder=True but PIL is not importable")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        n = width * height

        def standin(p: bytes) -> bytes:
            return bytes(p[:n]).ljust(n, b"\0")

        def one(p: bytes) -> bytes:
            if image_mod is None:
                return standin(p)
            try:
                img = image_mod.open(io.BytesIO(p))
                return img.convert("L").resize((width, height)).tobytes()
            except Exception:
                return standin(p)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [one(bytes(p)) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return with_payload.mapInPandas(_resize, RESIZE_SCHEMA)


def sample_frames(
    with_payload: DataFrame, every_n_bytes: int = 32, max_frames: int = 8
) -> DataFrame:
    """Video frame sampling over mapInPandas (1:N rows — the shape that
    matters: one input row explodes to up to `max_frames` output rows,
    which mapInPandas supports natively where a scalar pandas_udf
    cannot). Frame extraction is stubbed (ffmpeg absent): the stand-in
    slices the payload every `every_n_bytes`; timestamps are derived
    deterministically from the frame index."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, tss = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                # ffmpeg frame-sample would run here
                for i in range(min(max_frames, max(len(p), 1) // every_n_bytes)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes])
                    )
                    tss.append(i * 1000)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "ts_ms": pd.Series(tss, dtype="int64"),
                }
            )

    return with_payload.mapInPandas(_sample, FRAME_SCHEMA)
