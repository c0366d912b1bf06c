"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake or ``NotImplementedError``), but everything Spark-side
is real and tested: the schema, the Arrow batch shape, the
``mapInPandas`` plumbing, and the partitioning story.

Design for 100 TB of media:
- media rows are (id, modality, payload binary, meta struct) — payloads
  never pass through Python except inside the Arrow batch that the
  extractor actually needs (column pruning means a metadata-only query
  never ships bytes);
- feature extraction is a narrow ``mapInPandas`` stage: no shuffle, the
  output schema is declared up front, batches stream with
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- frame sampling / resize would run per-batch inside the UDF; here they
  are deterministic fakes gated behind ``decode_real=False``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, payload_bytes long, sha256 string, "
    "feature array<float>"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat ``documents.text`` bytes as fake payloads so the
    multimodal plumbing is exercisable on the driver's tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("image/x-fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - real codec absent
    """Real image decode — requires an image library not present in this
    container.  The Spark plumbing calls :func:`fake_feature` instead when
    ``decode_real=False``."""
    raise NotImplementedError(
        "image decoding requires an image codec library; "
        "wire one in here (payload -> HxWxC array) and set decode_real=True"
    )


def fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: sha256-derived unit-free floats.
    Keeps the batch shape / schema identical to a real extractor."""
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)
    ]


def extract_features(media: DataFrame, decode_real: bool = False) -> DataFrame:
    """Feature-extraction stage: Arrow-batched ``mapInPandas``, narrow
    (no shuffle).  Output: one row per media row with byte size, content
    hash, and an 8-dim feature vector."""

    def run(batches) -> Iterator:
        import hashlib as _hl

        import pandas as pd

        for pdf in batches:
            feats, sizes, shas = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if decode_real:
                    decode_image(raw)
                sizes.append(len(raw))
                shas.append(_hl.sha256(raw).hexdigest())
                feats.append(fake_feature(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": sizes,
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: tags the
    payload with the target geometry so output bytes are reproducible
    and size-bounded.  A real implementation decodes to HxWxC, resamples,
    and re-encodes — same rows in, same rows out, which is all the Spark
    plumbing cares about."""
    digest = hashlib.sha256(payload or b"").digest()
    return b"RSZ:%dx%d:" % (width, height) + digest


def resize_images(media: DataFrame, width: int, height: int,
                  decode_real: bool = False) -> DataFrame:
    """Resize stage for image rows: Arrow-batched ``mapInPandas``, narrow
    (no shuffle), emitting the same media schema with updated geometry
    metadata — so resize stages compose with extract_features /
    sample_frames.  The pixel work is a deterministic fake unless
    ``decode_real`` (no codec in this container; see :func:`decode_image`)."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                if decode_real:
                    decode_image(raw)
                out_payloads.append(fake_resize(raw, width, height))
            meta = pd.DataFrame(
                {
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out_payloads,
                    "meta": meta.to_dict("records"),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: explodes deterministic
    frame timestamps from metadata (decode itself is stubbed).  Real
    implementation would emit one payload slice per frame inside the
    extractor UDF."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )
