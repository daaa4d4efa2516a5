"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata extracted by Arrow-batched ``mapInPandas`` decoders.  The decode
libraries (PIL/ffmpeg/librosa) are not in this container, so the actual
codec step is stubbed (`decode_image` raises), but the Spark-side plumbing
— schema, batch shape, UDF signature, partition behavior — is real and
tested: `payload_meta` runs a deterministic byte-level "decoder" over the
binary column and is oracle-checked against SQL byte arithmetic.

At 100 TB: binary columns ride the same parquet/Iceberg scan as text
(column pruning keeps them unread unless selected); decode stages are
embarrassingly parallel mapInPandas with no shuffle; per-batch memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = "doc_id long, n_bytes int, width int, height int, n_frames int"


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real codec hook. Container has no image libs; see module docstring."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("image decoding requires PIL; not in container") from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column (utf-8 bytes of text stand in for an
    encoded media blob — deterministic, schema-correct)."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def payload_meta(docs: DataFrame) -> DataFrame:
    """Deterministic fake 'decode': byte-derived metadata per payload.

    width = n_bytes mod 256, height = (n_bytes div 256) mod 256,
    n_frames = n_bytes mod 7 + 1 — stands in for (and has the exact
    call shape of) a real image/video header parse.
    """
    payloads = with_payload(docs)

    def decode(batches):
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int32"),
                "width": (n % 256).astype("int32"),
                "height": ((n // 256) % 256).astype("int32"),
                "n_frames": (n % 7 + 1).astype("int32"),
            })

    return payloads.mapInPandas(decode, schema=META_SCHEMA)


PAYLOAD_META_SQL = """
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents)
    SELECT doc_id, n_bytes::INT AS n_bytes, (n_bytes % 256)::INT AS width,
           ((n_bytes // 256) % 256)::INT AS height, (n_bytes % 7 + 1)::INT AS n_frames
    FROM p
"""
