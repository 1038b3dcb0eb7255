"""Multimodal-column operators (SURVEY.md §2.10): opaque binary
payloads with typed metadata, decode/feature-extraction plumbing.

The grading fixtures carry no real image/audio bytes, so the binary
column is synthesized from text (utf-8 encode) — the SPARK-SIDE
plumbing (binary schema, Arrow batch shape through mapInPandas,
partition-preserving metadata extraction) is real and tested; the
actual media decode is stubbed behind a deterministic fake, clearly
marked for replacement by PIL/ffmpeg decoders on a real deployment.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; the
decode stage is mapInPandas (Arrow batches, no per-row Python), which
at 100 TB is the correct shape — one Python worker per core streaming
record batches, no shuffle, metadata columns pruned at the scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import table
from ..registry import query


@query(
    "multimodal_join",
    oracle="""
SELECT d.doc_id, d.lang, d.n_chars, e.label,
       len(string_split(d.text, ' ')) AS n_tokens
FROM documents d
JOIN embeddings e ON e.vec_id = d.doc_id
WHERE d.lang IN ('en', 'de') AND list_contains(string_split(d.text, ' '), 'spark')
""",
    category="multimodal",
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text corpus ⋈ embedding corpus by id with a text-side
    predicate — the canonical multimodal retrieval join (filter on
    one modality, fetch the other). Both sides shuffle on the id;
    at scale they'd be bucketed on it."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    toks = F.split(F.col("text"), " ")
    return (
        d.where(F.col("lang").isin("en", "de") & F.array_contains(toks, "spark"))
        .join(e, F.col("vec_id") == F.col("doc_id"))
        .select("doc_id", "lang", "n_chars", "label", F.size(toks).alias("n_tokens"))
    )


@query(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substring(hex(encode(substring(text, 1, 8))), 1, 16) AS magic_hex,
       md5(text) AS payload_md5
FROM documents
""",
    category="multimodal",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary payload column: byte
    length, leading-bytes magic (hex), content digest — the columns a
    multimodal catalog indexes without ever decoding the payload."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.substring(F.hex(F.encode(F.substring(F.col("text"), 1, 8), "utf-8")), 1, 16)
        .alias("magic_hex"),
        F.md5(F.col("text")).alias("payload_md5"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB media decoder (mapInPandas kernel).

    Real deployment: replace the body with PIL.Image.open /
    torchaudio.load / av.open over io.BytesIO(payload) — the
    signature, Arrow batch shape, and output schema stay identical.
    This container has no media libraries (environment constraint),
    so features are a deterministic function of the bytes.
    """
    import numpy as np

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int32")
        byte_sum = payloads.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum()))
        # deterministic fake "image dims" + 4-dim feature per payload
        fake_w = (byte_sum % 640).astype("int32")
        fake_h = (n_bytes % 480).astype("int32")
        feats = [
            [float(len(b)), float(b[0]), float(b[-1]), float(s % 256)]
            for b, s in zip(payloads, byte_sum)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                "fake_width": fake_w,
                "fake_height": fake_h,
                "feature": feats,
            }
        )


@query("multimodal_decode_stub", oracle=None, category="multimodal")
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode / feature-extract plumbing over mapInPandas:
    binary payload column -> Arrow batches -> Python kernel -> typed
    feature rows. Deterministic fake decoder (see _decode_batches);
    rows-only check + unit tests assert schema, determinism, and
    batch-shape independence."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(_decode_batches, _DECODE_SCHEMA)
