"""Multimodal binary-column plumbing (BASELINE.json §2.11).

Images/audio/video are opaque ``BinaryType`` payload columns with
typed metadata travelling beside them — the same co-location model as
the reference's vector+payload store (SURVEY §1.1). Decode /
feature-extract run as ``mapInPandas`` so each Arrow batch crosses
the JVM↔Python boundary once and heavy per-item work stays
vectorized.

The actual codec step is STUBBED: this container has no image/audio
libraries, so :func:`decode_image_meta` raises NotImplementedError
and the pipelines use :func:`fake_decode_meta`, a deterministic
byte-arithmetic stand-in (oracle-expressible via octet_length). The
Spark-side contract — schema, batch iteration, partition sizing —
is real and tested; swapping in PIL/ffmpeg touches only the inner
function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_btc_spark._pickle import ensure_serializable

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_image_meta(payload: bytes) -> dict:
    """Real decoder hook (PIL.Image.open(BytesIO(payload)) etc.).
    Not available in this environment by design."""
    raise NotImplementedError(
        "image/audio codecs are not installed; inject a decoder or use fake_decode_meta"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in decode: derives pseudo width/height/
    frame-count from the byte length so every downstream operator
    (and the DuckDB oracle) can verify the plumbing end-to-end."""
    n = len(payload)
    return {
        "byte_len": n,
        "width": 64 + (n % 640),
        "height": 64 + ((n * 7) % 480),
        "n_frames": 1 + (n % 30),
        "format": "fake/%d" % (n % 3),
    }


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the document text's UTF-8 bytes as the opaque media
    payload (the fixtures carry no real blobs)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_media_meta(df: DataFrame, decode=fake_decode_meta) -> DataFrame:
    """mapInPandas decode: batch-iterate Arrow record batches, run the
    decoder per payload, emit typed metadata rows. At 100 TB, pair
    with ``spark.sql.files.maxPartitionBytes`` sizing so one task's
    batch of blobs fits executor memory."""
    ensure_serializable()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.mapInPandas(gen, MEDIA_META_SCHEMA)
