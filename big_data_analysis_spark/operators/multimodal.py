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


_FRAME_BYTES = 16  # fake "frame" size within the payload
_FRAME_STRIDE = 4  # sample every 4th frame

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler (mapInPandas kernel).

    Real deployment: replace the slicing with av.open(BytesIO(
    payload)) keyframe iteration / ffmpeg -vf select; signature,
    Arrow batch shape and output schema stay identical. Here a
    "frame" is a fixed 16-byte slice and we keep every 4th one —
    deterministic, so the DuckDB oracle can recompute it exactly."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_BYTES
            for k in range(0, n_frames, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(k)
                frames.append(payload[k * _FRAME_BYTES : (k + 1) * _FRAME_BYTES])
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(frames, dtype=object),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(n_chars // {_FRAME_BYTES} AS INT) - 1)) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       {_FRAME_BYTES} AS n_bytes,
       md5(substring(text, frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES}))
         AS frame_md5
FROM f
WHERE frame_idx % {_FRAME_STRIDE} = 0
""",
    category="multimodal",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped binary payloads: payload ->
    fixed-size frames -> keep every 4th -> per-frame digest. The
    decode kernel is an honest stub (no ffmpeg in this container);
    the Spark plumbing is the real production shape — mapInPandas
    fan-OUT (one input row yields many frame rows) with Arrow
    binary columns, a pure map stage with no shuffle, then JVM-side
    digest/length over the emitted frames.

    Oracle: frames are deterministic byte slices of the ASCII
    payload, so DuckDB recomputes every sampled frame's md5 with
    substring arithmetic — the whole Python fan-out path is
    value-checked end to end."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = d.mapInPandas(_frame_sample_batches, _FRAME_SCHEMA)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").alias("n_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


def _le_hex(col, nbytes: int):
    """Little-endian hex string of an int column, nbytes wide —
    byte-reversed lpad'ed hex, built from pure JVM expressions."""
    parts = [
        F.lpad(F.hex((col / (256 ** i)).cast("long") % 256), 2, "0")
        for i in range(nbytes)
    ]
    return F.concat(*parts)


def _le_int(bin_col, pos: int, nbytes: int):
    """Parse an unsigned little-endian integer out of a binary
    column at 1-based byte offset pos."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        byte = F.conv(F.hex(F.substring(bin_col, pos + i, 1)), 16, 10).cast("long")
        out = out + byte * (256 ** i)
    return out


def _le_hex_sql(x: str, nbytes: int) -> str:
    """SQL-string twin of _le_hex. The WAV synth/parse expressions
    are assembled as ONE SQL string handed to a single F.expr call:
    building them Column-by-Column costs hundreds of py4j round
    trips PER QUERY CONSTRUCTION (~0.7 s of driver-side Python,
    measured r8 — bench.py reconstructs the DataFrame every run, so
    that chatter dominated multimodal_audio_rms's benched time while
    actual execution stayed at baseline). Identical resulting plan;
    `div` replaces the float-divide-then-cast byte extraction (equal
    for these non-negative header ints)."""
    return "concat(" + ", ".join(
        f"lpad(hex((({x}) div {256 ** i}) % 256), 2, '0')"
        for i in range(nbytes)
    ) + ")"


def _le_int_sql(b: str, pos: int, nbytes: int) -> str:
    """SQL-string twin of _le_int (see _le_hex_sql for why)."""
    return "(" + " + ".join(
        f"CAST(conv(hex(substring({b}, {pos + i}, 1)), 16, 10) AS BIGINT)"
        f" * {256 ** i}"
        for i in range(nbytes)
    ) + ")"


def _synth_wavs(d) -> DataFrame:
    """Synthesize the canonical mono 16-bit RIFF/WAVE binaries for
    doc_id < 64 (formula-driven hex layout, shared by
    multimodal_wav_parse and multimodal_audio_rms — the oracle knows
    only this generator formula). Assembled as one F.expr string —
    see _le_hex_sql for the construction-cost rationale."""
    d = d.where(F.col("doc_id") < 64)
    sr = "(8000 * (1 + doc_id % 4))"
    ns = "(64 + doc_id % 32)"
    data_size = f"({ns} * 2)"  # mono, 16-bit
    byte_rate = f"({sr} * 2)"
    samp16 = "((doc_id * 31 + k * 17) % 2003 - 1001 + 65536) % 65536"
    samples_hex = (
        f"array_join(transform(sequence(0, CAST({ns} - 1 AS INT)), "
        f"k -> {_le_hex_sql(samp16, 2)}), '')"
    )
    wav_hex = "concat(" + ", ".join([
        "'52494646'",                     # 'RIFF'
        _le_hex_sql(f"({data_size} + 36)", 4),
        "'57415645'",                     # 'WAVE'
        "'666D7420'",                     # 'fmt '
        _le_hex_sql("16", 4),             # PCM fmt chunk size
        _le_hex_sql("1", 2),              # audio format = PCM
        _le_hex_sql("1", 2),              # channels = 1
        _le_hex_sql(sr, 4),
        _le_hex_sql(byte_rate, 4),
        _le_hex_sql("2", 2),              # block align
        _le_hex_sql("16", 2),             # bits per sample
        "'64617461'",                     # 'data'
        _le_hex_sql(data_size, 4),
        samples_hex,
    ]) + ")"
    return d.select("doc_id", F.unhex(F.expr(wav_hex)).alias("wav"))


def _parsed_pcm(bin_sql: str):
    """Signed int16 sample array parsed from the WAV bytes alone
    (two's complement, little-endian), pure JVM expressions.
    Takes the binary column as a SQL expression STRING and builds
    one F.expr — see _le_hex_sql for the construction-cost
    rationale."""
    p_ch = _le_int_sql(bin_sql, 23, 2)
    p_bits = _le_int_sql(bin_sql, 35, 2)
    p_data = _le_int_sql(bin_sql, 41, 4)
    p_ns = f"CAST({p_data} / ({p_ch} * ({p_bits} / 8)) AS BIGINT)"
    raw = (
        f"(CAST(conv(hex(substring({bin_sql}, 45 + k * 2, 1)), 16, 10)"
        f" AS BIGINT)"
        f" + CAST(conv(hex(substring({bin_sql}, 46 + k * 2, 1)), 16, 10)"
        f" AS BIGINT) * 256)"
    )
    return F.expr(
        f"transform(sequence(0, CAST({p_ns} - 1 AS INT)), "
        f"k -> CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END)"
    )


def wav_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """PUBLIC generic RIFF/WAVE PCM statistics over a caller-
    supplied binary column holding canonical 44-byte-header WAV
    bytes (what the stdlib wave module and every PCM muxer
    write): header fields plus exact int16 sample sum/min/max and
    the single-division mean, all parsed from the bytes alone in
    JVM codegen.  Authenticated in tests against a genuine
    wave-module file."""
    b = F.col(bin_col)
    p_sr = _le_int(b, 25, 4)
    p_ch = _le_int(b, 23, 2)
    p_bits = _le_int(b, 35, 2)
    p_data = _le_int(b, 41, 4)
    p_ns = (p_data / (p_ch * (p_bits / 8))).cast("long")
    pcm = _parsed_pcm(bin_col)
    return df.select(
        F.col(id_col),
        p_sr.alias("sample_rate"),
        p_ch.alias("n_channels"),
        p_bits.alias("bits_per_sample"),
        p_ns.alias("n_samples"),
        F.aggregate(pcm, F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_pcm"),
        F.array_min(pcm).alias("min_pcm"),
        F.array_max(pcm).alias("max_pcm"),
        (
            F.aggregate(pcm, F.lit(0).cast("long"), lambda a, x: a + x).cast("double")
            / F.size(pcm)
        ).alias("mean_pcm"),
    )


@query(
    "multimodal_wav_parse",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
s AS (
  SELECT ids.doc_id, g.k,
         ((ids.doc_id * 31 + g.k * 17) % 2003) - 1001 AS v
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 63 + CAST(ids.doc_id % 32 AS INT))) AS k
  ) g
)
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 4) AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(16 AS BIGINT) AS bits_per_sample,
       CAST(64 + doc_id % 32 AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sum_pcm,
       CAST(MIN(v) AS BIGINT) AS min_pcm,
       CAST(MAX(v) AS BIGINT) AS max_pcm,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_pcm
FROM s
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_wav_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free audio analytics: canonical 44-byte RIFF/WAVE PCM
    files are synthesized as a real binary column (unhex of a
    formula-driven hex layout — mono 16-bit, sample_rate and length
    varying per doc), then EVERYTHING is parsed back from the bytes
    alone: header fields as little-endian integers
    (hex(substring)->conv chains), and every int16 sample decoded
    two's-complement from the data section to exact integer
    sum/min/max and a single-division mean. Unlike
    multimodal_decode_stub (which fakes the decoder), this is a real
    wire-format parser running entirely in JVM codegen — the oracle
    knows only the generator formula, so a parser bug cannot cancel
    out. At 100 TB: a pure map stage over parquet BYTE_ARRAY
    payloads, no Python, no shuffle before the per-file aggregate."""
    synth = _synth_wavs(table(spark, sf_dir, "documents"))
    return wav_stats(synth, "doc_id", "wav")


def _synth_bmps(d) -> DataFrame:
    """Synthesize the canonical uncompressed 24-bit BMPs for
    doc_id < 48 (width 4 -> no row padding; formula-driven pixels,
    shared by multimodal_bmp_parse and multimodal_image_histogram —
    the oracle knows only this generator formula)."""
    d = d.where(F.col("doc_id") < 48)
    i = F.col("doc_id")
    width = F.lit(4).cast("long")
    height = (F.lit(2) + i % 6).cast("long")
    n_px = width * height
    img_size = n_px * 3
    file_size = img_size + 54
    px_r = lambda p: (i + (p % 4) * 7 + (p / 4).cast("long") * 13) % 256
    px_g = lambda p: (i * 3 + (p % 4) * 5 + (p / 4).cast("long") * 11) % 256
    px_b = lambda p: (i * 7 + (p % 4) * 3 + (p / 4).cast("long") * 17) % 256
    pixels_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_px - 1).cast("int")),
            lambda p: F.concat(
                _le_hex(px_b(p), 1), _le_hex(px_g(p), 1), _le_hex(px_r(p), 1)
            ),
        ),
        "",
    )
    bmp_hex = F.concat(
        F.lit("424D"),                # 'BM'
        _le_hex(file_size, 4),
        _le_hex(F.lit(0), 4),         # reserved
        _le_hex(F.lit(54), 4),        # pixel-array offset
        _le_hex(F.lit(40), 4),        # info-header size
        _le_hex(width, 4),
        _le_hex(height, 4),
        _le_hex(F.lit(1), 2),         # planes
        _le_hex(F.lit(24), 2),        # bits per pixel
        _le_hex(F.lit(0), 4),         # BI_RGB (uncompressed)
        _le_hex(img_size, 4),
        _le_hex(F.lit(2835), 4),      # 72 DPI
        _le_hex(F.lit(2835), 4),
        _le_hex(F.lit(0), 4),         # palette colors
        _le_hex(F.lit(0), 4),         # important colors
        pixels_hex,
    )
    return d.select("doc_id", F.unhex(bmp_hex).alias("bmp"))


def bmp_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """PUBLIC generic uncompressed 24-bit BMP statistics over a
    caller-supplied binary column: header geometry + exact
    per-channel pixel sums read from the bytes alone (JVM
    codegen).  Supports row-padding-free files (width*3 divisible
    by 4 — otherwise the per-pixel walk would take in pad bytes;
    sums are row-order-invariant, so BMP's bottom-up storage
    doesn't matter).  Authenticated in tests against genuine
    struct-packed bytes."""
    b = F.col(bin_col)
    p_off = _le_int(b, 11, 4)
    p_w = _le_int(b, 19, 4)
    p_h = _le_int(b, 23, 4)
    p_bpp = _le_int(b, 29, 2)
    p_n = p_w * p_h
    byte_at = lambda pos: F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("long")
    pix = F.sequence(F.lit(0), (p_n - 1).cast("int"))
    chan = lambda c_off: F.transform(
        pix, lambda p: byte_at((p_off + 1).cast("int") + p * 3 + c_off)
    )
    ssum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(
        F.col(id_col),
        p_w.alias("width"),
        p_h.alias("height"),
        p_bpp.alias("bits_per_pixel"),
        p_n.alias("n_pixels"),
        ssum(chan(2)).alias("sum_r"),
        ssum(chan(1)).alias("sum_g"),
        ssum(chan(0)).alias("sum_b"),
        (ssum(chan(2)).cast("double") / p_n).alias("mean_r"),
    )


@query(
    "multimodal_bmp_parse",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
px AS (
  SELECT ids.doc_id, g.p,
         (ids.doc_id + (g.p % 4) * 7 + (g.p // 4) * 13) % 256 AS r,
         (ids.doc_id * 3 + (g.p % 4) * 5 + (g.p // 4) * 11) % 256 AS g_,
         (ids.doc_id * 7 + (g.p % 4) * 3 + (g.p // 4) * 17) % 256 AS b
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 4 * (2 + CAST(ids.doc_id % 6 AS INT)) - 1)) AS p
  ) g
)
SELECT doc_id,
       CAST(4 AS BIGINT) AS width,
       CAST(2 + doc_id % 6 AS BIGINT) AS height,
       CAST(24 AS BIGINT) AS bits_per_pixel,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g_) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(r) AS DOUBLE) / COUNT(*) AS mean_r
FROM px
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_bmp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image twin of multimodal_wav_parse: uncompressed 24-bit BMPs
    (BITMAPFILEHEADER + BITMAPINFOHEADER + BGR pixel array; width 4
    so rows are 4-byte aligned with no padding) are synthesized as a
    binary column, then width/height/bpp are parsed from the header
    and every pixel's B,G,R bytes decoded from the pixel array —
    exact per-channel sums and a single-division mean, all from the
    bytes alone in JVM codegen. Oracle recomputes from the generator
    formula. Together with the WAV parser this gives the multimodal
    tier real wire-format coverage for both audio and image
    payloads without any codec dependency."""
    synth = _synth_bmps(table(spark, sf_dir, "documents"))
    return bmp_stats(synth, "doc_id", "bmp")


@query(
    "multimodal_audio_rms",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
s AS (
  SELECT ids.doc_id, g.k,
         ((ids.doc_id * 31 + g.k * 17) % 2003) - 1001 AS v
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 63 + CAST(ids.doc_id % 32 AS INT))) AS k
  ) g
)
SELECT doc_id, CAST(k // 16 AS INT) AS frame,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v * v) AS BIGINT) AS energy_sq,
       sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)) AS rms
FROM s
GROUP BY doc_id, frame
""",
    category="multimodal",
)
def multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over the parsed WAV samples — the first
    real audio FEATURE on top of the wire parser (silence detection /
    loudness normalization / VAD pre-filter in a training-data audio
    pipeline): 16-sample frames, exact integer sum-of-squares per
    frame (|v| <= 1001 -> frame energy <= 1.6e7, no overflow at any
    scale), one IEEE sqrt per frame for the RMS. The samples come
    from the SAME byte-level parse as multimodal_wav_parse (shared
    _parsed_pcm expression) — the oracle still knows only the
    generator formula, so parser and feature bugs cannot cancel.
    Plan shape: synth -> parse -> posexplode -> (doc, frame)
    hash-agg; a pure map + one bounded-key aggregate."""
    synth = _synth_wavs(table(spark, sf_dir, "documents"))
    pcm = _parsed_pcm("wav")
    exploded = synth.select(
        "doc_id", F.posexplode(pcm).alias("k", "v")
    )
    return (
        exploded.groupBy(
            "doc_id", (F.col("k") / 16).cast("int").alias("frame")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("v")).alias("energy_sq"),
        )
        .select(
            "doc_id",
            "frame",
            "n",
            "energy_sq",
            F.sqrt(
                F.col("energy_sq").cast("double") / F.col("n").cast("double")
            ).alias("rms"),
        )
    )


@query(
    "multimodal_image_histogram",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
px AS (
  SELECT ids.doc_id, g.p,
         (ids.doc_id + (g.p % 4) * 7 + (g.p // 4) * 13) % 256 AS r,
         (ids.doc_id * 3 + (g.p % 4) * 5 + (g.p // 4) * 11) % 256 AS g_,
         (ids.doc_id * 7 + (g.p % 4) * 3 + (g.p // 4) * 17) % 256 AS b
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 4 * (2 + CAST(ids.doc_id % 6 AS INT)) - 1)) AS p
  ) g
),
long_px AS (
  SELECT doc_id, 'r' AS channel, r AS v FROM px
  UNION ALL SELECT doc_id, 'g', g_ FROM px
  UNION ALL SELECT doc_id, 'b', b FROM px
)
SELECT doc_id, channel, CAST(v // 64 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM long_px
GROUP BY doc_id, channel, bucket
""",
    category="multimodal",
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel intensity HISTOGRAM over the byte-parsed BMP
    pixels (4 buckets of 64 levels) — the image twin of
    multimodal_audio_rms: the first image FEATURE on the wire parser
    (exposure/contrast profiling, dark-frame detection in an image
    training-data pipeline). The pixels come from the SAME byte-level
    parse as multimodal_bmp_parse (shared _synth_bmps + offset
    arithmetic), so the oracle — which knows only the generator
    formula — cross-checks parser and feature together.

    Shape: synth -> parse -> per-channel posexplode (3x pixel
    fan-out) -> bounded-key (doc, channel, bucket) hash-agg; a pure
    map plus one small aggregate, scan-speed at any corpus size."""
    synth = _synth_bmps(table(spark, sf_dir, "documents"))
    b = F.col("bmp")
    p_off = _le_int(b, 11, 4)
    p_n = _le_int(b, 19, 4) * _le_int(b, 23, 4)
    byte_at = lambda pos: F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("long")
    pix = F.sequence(F.lit(0), (p_n - 1).cast("int"))
    chan = lambda c_off: F.transform(
        pix, lambda p: byte_at((p_off + 1).cast("int") + p * 3 + c_off)
    )
    long_px = synth.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit("r").alias("channel"), chan(2).alias("vs")),
                F.struct(F.lit("g").alias("channel"), chan(1).alias("vs")),
                F.struct(F.lit("b").alias("channel"), chan(0).alias("vs")),
            )
        ).alias("cv"),
    ).select("doc_id", F.col("cv.channel").alias("channel"), F.explode("cv.vs").alias("v"))
    return (
        long_px.groupBy(
            "doc_id", "channel", (F.col("v") / 64).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "multimodal_image_resize",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
px AS (
  SELECT ids.doc_id, g.p,
         (ids.doc_id + (g.p % 4) * 7 + (g.p // 4) * 13) % 256 AS r,
         (ids.doc_id * 3 + (g.p % 4) * 5 + (g.p // 4) * 11) % 256 AS g_,
         (ids.doc_id * 7 + (g.p % 4) * 3 + (g.p // 4) * 17) % 256 AS b
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 4 * (2 + CAST(ids.doc_id % 6 AS INT)) - 1)) AS p
  ) g
  WHERE (g.p % 4) % 2 = 0 AND (g.p // 4) % 2 = 0
)
SELECT doc_id,
       CAST(2 AS BIGINT) AS out_w,
       CAST((2 + doc_id % 6 + 1) // 2 AS BIGINT) AS out_h,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g_) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(SUM(r) AS DOUBLE) / COUNT(*) AS mean_r
FROM px
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 2x downsample over the byte-parsed BMP pixel
    array — the image RESIZE plumbing of a multimodal training
    pipeline (thumbnailing / fixed-resolution normalization before
    feature extraction), done entirely on the wire bytes: keep every
    even column of every even stored row (exact NN with floor
    coordinates), emit the resized geometry and per-channel sums.
    Same shared _synth_bmps + offset arithmetic as the parse/
    histogram queries, so the formula-only oracle cross-checks
    parser, sampling grid, and feature together.

    Shape: pure map (per-image array filter over the pixel index
    sequence, JVM codegen) — no explode, no shuffle; scan-speed at
    any corpus size. A real decoder for compressed formats would
    slot in as a mapInPandas stage with this exact output contract."""
    synth = _synth_bmps(table(spark, sf_dir, "documents"))
    b = F.col("bmp")
    p_off = _le_int(b, 11, 4)
    p_w = _le_int(b, 19, 4)
    p_h = _le_int(b, 23, 4)
    p_n = p_w * p_h
    byte_at = lambda pos: F.conv(F.hex(F.substring(b, pos, 1)), 16, 10).cast("long")
    sampled = F.filter(
        F.sequence(F.lit(0), (p_n - 1).cast("int")),
        lambda p: ((p % 4) % 2 == 0) & (((p / 4).cast("long")) % 2 == 0),
    )
    chan = lambda c_off: F.transform(
        sampled, lambda p: byte_at((p_off + 1).cast("int") + p * 3 + c_off)
    )
    ssum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    n_out = F.size(sampled).cast("long")
    return synth.select(
        "doc_id",
        (p_w / 2).cast("long").alias("out_w"),
        ((p_h + 1) / 2).cast("long").alias("out_h"),
        n_out.alias("n_out"),
        ssum(chan(2)).alias("sum_r"),
        ssum(chan(1)).alias("sum_g"),
        ssum(chan(0)).alias("sum_b"),
        (ssum(chan(2)).cast("double") / n_out).alias("mean_r"),
    )


@query(
    "multimodal_audio_downsample",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 64),
s AS (
  SELECT ids.doc_id, g.k,
         ((ids.doc_id * 31 + g.k * 17) % 2003) - 1001 AS v
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 63 + CAST(ids.doc_id % 32 AS INT))) AS k
  ) g
  WHERE g.k % 2 = 0
)
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 4) // 2 AS BIGINT) AS out_sr,
       CAST(COUNT(*) AS BIGINT) AS n_out,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       CAST(SUM(v * v) AS BIGINT) AS energy_sq
FROM s
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x decimation over the byte-parsed PCM samples — the audio
    RESAMPLE plumbing of a multimodal pipeline (sample-rate
    normalization before feature extraction): keep every even sample,
    halve the header's sample rate, emit exact integer audit sums.
    Same shared _synth_wavs + _parsed_pcm as the parse/RMS queries,
    so the formula-only oracle cross-checks parser, decimation grid,
    and header arithmetic together (the audio twin of
    multimodal_image_resize).

    Pure map stage (per-row array filter in JVM codegen, no explode,
    no shuffle) — scan-speed at any corpus size; a real polyphase
    resampler for compressed codecs would slot in as mapInPandas
    with this output contract."""
    synth = _synth_wavs(table(spark, sf_dir, "documents"))
    b = F.col("wav")
    sr = _le_int(b, 25, 4)
    pcm = _parsed_pcm("wav")
    evens = F.transform(
        F.filter(
            F.transform(pcm, lambda x, i: F.struct(x.alias("v"), i.alias("k"))),
            lambda s: s.k % 2 == 0,
        ),
        lambda s: s.v,
    )
    ssum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    return synth.select(
        "doc_id",
        (sr / 2).cast("long").alias("out_sr"),
        F.size(evens).cast("long").alias("n_out"),
        ssum(evens).alias("sum_v"),
        ssum(F.transform(evens, lambda v: F.abs(v))).alias("sum_abs"),
        ssum(F.transform(evens, lambda v: v * v)).alias("energy_sq"),
    )


def _synth_avis(d) -> DataFrame:
    """Synthesize canonical minimal RIFF/AVI containers for
    doc_id < 48: 'RIFF..AVI ' + a 'hdrl' LIST holding the 56-byte
    avih main header + a 'movi' LIST of '00db' uncompressed-frame
    chunks (8-bit gray, width 4 x height 2+doc_id%3, 3+doc_id%5
    frames, formula-driven pixel bytes). Pure JVM expressions —
    the oracle knows only the generator formula."""
    d = d.where(F.col("doc_id") < 48)
    i = F.col("doc_id")
    usec = (
        F.when(i % 3 == 0, 40000).when(i % 3 == 1, 50000).otherwise(100000)
    ).cast("long")
    width = F.lit(4).cast("long")
    height = (F.lit(2) + i % 3).cast("long")
    fs = width * height                       # bytes per gray frame
    nf = (F.lit(3) + i % 5).cast("long")      # total frames
    px = lambda k, j: (i * 13 + k * 7 + j * 3) % 256
    frame_hex = lambda k: F.concat(
        F.lit("30306462"),                    # '00db'
        _le_hex(fs, 4),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (fs - 1).cast("int")),
                lambda j: _le_hex(px(k, j), 1),
            ),
            "",
        ),
    )
    movi_size = F.lit(4) + nf * (8 + fs)
    hdrl_size = F.lit(68).cast("long")        # 'hdrl' + avih chunk
    riff_size = F.lit(4 + 12 + 8 + 56 + 8) + movi_size - 4
    avi_hex = F.concat(
        F.lit("52494646"), _le_hex(riff_size, 4), F.lit("41564920"),
        F.lit("4C495354"), _le_hex(hdrl_size, 4), F.lit("6864726C"),
        F.lit("61766968"), _le_hex(F.lit(56), 4),
        _le_hex(usec, 4),                     # dwMicroSecPerFrame
        _le_hex(F.lit(0), 4),                 # dwMaxBytesPerSec
        _le_hex(F.lit(0), 4),                 # dwPaddingGranularity
        _le_hex(F.lit(0), 4),                 # dwFlags
        _le_hex(nf, 4),                       # dwTotalFrames
        _le_hex(F.lit(0), 4),                 # dwInitialFrames
        _le_hex(F.lit(1), 4),                 # dwStreams
        _le_hex(F.lit(0), 4),                 # dwSuggestedBufferSize
        _le_hex(width, 4), _le_hex(height, 4),
        _le_hex(F.lit(0), 8), _le_hex(F.lit(0), 8),   # dwReserved[4]
        F.lit("4C495354"), _le_hex(movi_size, 4), F.lit("6D6F7669"),
        F.array_join(
            F.transform(F.sequence(F.lit(0), (nf - 1).cast("int")), frame_hex),
            "",
        ),
    )
    return d.select("doc_id", F.unhex(avi_hex).alias("avi"))


@query(
    "multimodal_avi_parse",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
fr AS (
  SELECT ids.doc_id, f.k
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 2 + CAST(ids.doc_id % 5 AS INT))) AS k
  ) f
),
px AS (
  SELECT fr.doc_id, fr.k, p.j,
         (fr.doc_id * 13 + fr.k * 7 + p.j * 3) % 256 AS v
  FROM fr, LATERAL (
    SELECT unnest(generate_series(
      0, CAST(4 * (2 + fr.doc_id % 3) - 1 AS INT))) AS j
  ) p
)
SELECT doc_id,
       CAST(CASE doc_id % 3 WHEN 0 THEN 40000 WHEN 1 THEN 50000
            ELSE 100000 END AS BIGINT) AS usec_per_frame,
       CAST(1000000 // CASE doc_id % 3 WHEN 0 THEN 40000 WHEN 1 THEN 50000
            ELSE 100000 END AS BIGINT) AS fps,
       CAST(3 + doc_id % 5 AS BIGINT) AS total_frames,
       CAST(4 AS BIGINT) AS width,
       CAST(2 + doc_id % 3 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_streams,
       CAST(3 + doc_id % 5 AS BIGINT) AS n_chunks,
       CAST(SUM(v) AS BIGINT) AS sum_frame_bytes
FROM px
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_avi_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free VIDEO-container analytics — the third wire-format
    parser next to WAV (RIFF/PCM) and BMP: minimal RIFF/AVI files
    are synthesized as real binary columns, then EVERYTHING is
    parsed back from the bytes alone — the avih main header
    (frame interval, total frames, stream count, dimensions) as
    little-endian field reads, fps derived by integer division, and
    the 'movi' payload WALKED STRUCTURALLY: each '00db' chunk's
    offset is computed from the parsed geometry, its fourcc
    validated byte-for-byte (n_chunks counts only frames whose
    magic matches — a mis-walk yields 0, not a lucky pass), its
    size field read, and every frame byte summed. Real codecs are
    out of scope per the container-stub policy (no imageio/ffmpeg
    in the env); the CONTAINER layer — what a 100 TB video corpus
    scan actually does before dispatching frames to a decoder UDF
    (multimodal_frame_sample) — is fully real, pure JVM codegen,
    zero Python, zero shuffle before the per-file rollup."""
    synth = _synth_avis(table(spark, sf_dir, "documents"))
    b = F.col("avi")
    usec = _le_int(b, 33, 4)
    nf = _le_int(b, 49, 4)
    streams = _le_int(b, 57, 4)
    width = _le_int(b, 65, 4)
    height = _le_int(b, 69, 4)
    fs = width * height
    frame_off = lambda k: F.lit(101) + k.cast("long") * (8 + fs)
    ks = F.sequence(F.lit(0), (nf - 1).cast("int"))
    is_00db = lambda k: (
        F.hex(F.substring(b, frame_off(k).cast("int"), 4)) == F.lit("30306462")
    ).cast("long")
    frame_sum = lambda k: F.aggregate(
        F.transform(
            F.sequence(F.lit(0), (_le_int_dyn(b, frame_off(k) + 4) - 1).cast("int")),
            lambda j: _byte_at(b, frame_off(k) + 8 + j),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return synth.select(
        "doc_id",
        usec.alias("usec_per_frame"),
        nf.alias("total_frames"),
        width.alias("width"),
        height.alias("height"),
        streams.alias("n_streams"),
        F.aggregate(
            F.transform(ks, is_00db), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("n_chunks"),
        F.aggregate(
            F.transform(ks, frame_sum), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_frame_bytes"),
    ).select(
        "doc_id",
        "usec_per_frame",
        F.expr("CAST(1000000 div usec_per_frame AS BIGINT)").alias("fps"),
        "total_frames",
        "width",
        "height",
        "n_streams",
        "n_chunks",
        "sum_frame_bytes",
    )


def _byte_at(bin_col, pos_col):
    """Unsigned byte at a DYNAMIC 1-based offset column."""
    return F.conv(
        F.hex(F.substring(bin_col, pos_col.cast("int"), 1)), 16, 10
    ).cast("long")


def _le_int_dyn(bin_col, pos_col, nbytes: int = 4):
    """_le_int with a dynamic (column) offset."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        out = out + _byte_at(bin_col, pos_col + i) * (256 ** i)
    return out


@query(
    "multimodal_video_motion",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
fr AS (
  SELECT ids.doc_id, f.k
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, 2 + CAST(ids.doc_id % 5 AS INT))) AS k
  ) f
),
px AS (
  SELECT fr.doc_id, fr.k, p.j,
         (fr.doc_id * 13 + fr.k * 7 + p.j * 3) % 256 AS v
  FROM fr, LATERAL (
    SELECT unnest(generate_series(
      0, CAST(4 * (2 + fr.doc_id % 3) - 1 AS INT))) AS j
  ) p
),
fsum AS (
  SELECT doc_id, k, CAST(SUM(v) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS npx
  FROM px GROUP BY doc_id, k
),
delta AS (
  SELECT a.doc_id, a.k,
         ABS(a.s - b.s) AS d
  FROM fsum a JOIN fsum b ON b.doc_id = a.doc_id AND b.k = a.k - 1
)
SELECT f.doc_id,
       CAST(COUNT(DISTINCT f.k) AS BIGINT) AS n_frames,
       CAST(SUM(DISTINCT f.npx) * COUNT(DISTINCT f.k) AS BIGINT) AS n_pixels,
       CAST(MIN(f.s) AS BIGINT) AS min_frame_sum,
       CAST(MAX(f.s) AS BIGINT) AS max_frame_sum,
       CAST((SELECT SUM(d) FROM delta WHERE delta.doc_id = f.doc_id)
            AS BIGINT) AS motion_l1,
       CAST((SELECT MAX(d) FROM delta WHERE delta.doc_id = f.doc_id)
            AS BIGINT) AS motion_peak
FROM fsum f
GROUP BY f.doc_id
""",
    category="multimodal",
)
def multimodal_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO feature extraction over the parsed AVI frames — the
    video sibling of multimodal_audio_rms: per-frame brightness sums
    read straight out of the container bytes, then the
    frame-to-frame L1 delta (the classic cheap motion/scene-cut
    proxy: total and peak inter-frame change per file). A real
    decoder is out of scope (container-stub policy); everything up
    to the codec boundary — chunk walk, per-frame reduction,
    temporal differencing — runs as one pure-codegen map stage, the
    exact shape a 100 TB video triage scan needs BEFORE spending
    decoder cycles (route only high-motion files to the expensive
    UDF)."""
    synth = _synth_avis(table(spark, sf_dir, "documents"))
    b = F.col("avi")
    nf = _le_int(b, 49, 4)
    width, height = _le_int(b, 65, 4), _le_int(b, 69, 4)
    fs = width * height
    frame_off = lambda k: F.lit(101) + k.cast("long") * (8 + fs)
    frame_sum = lambda k: F.aggregate(
        F.transform(
            F.sequence(F.lit(0), (fs - 1).cast("int")),
            lambda j: _byte_at(b, frame_off(k) + 8 + j),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    sums = F.transform(F.sequence(F.lit(0), (nf - 1).cast("int")), frame_sum)
    deltas = F.transform(
        F.sequence(F.lit(1), (nf - 1).cast("int")),
        lambda k: F.abs(
            F.element_at(sums, k + 1) - F.element_at(sums, k)
        ),
    )
    lsum = lambda arr: F.aggregate(
        arr, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return synth.select(
        "doc_id",
        F.size(sums).cast("long").alias("n_frames"),
        (fs * nf).alias("n_pixels"),
        F.array_min(sums).alias("min_frame_sum"),
        F.array_max(sums).alias("max_frame_sum"),
        lsum(deltas).alias("motion_l1"),
        F.array_max(deltas).alias("motion_peak"),
    )


def _be_hex(col, nbytes: int):
    """Big-endian hex string of an unsigned int column, nbytes
    wide (lpad'ed hex — the network-byte-order twin of _le_hex)."""
    return F.lpad(F.hex(col.cast("long")), 2 * nbytes, "0")


def _be_int_dyn(bin_col, pos_col, nbytes: int = 4):
    """Unsigned BIG-endian integer at a dynamic 1-based offset —
    PNG (and most network formats) are big-endian, unlike RIFF."""
    out = F.lit(0).cast("long")
    for i in range(nbytes):
        out = out + _byte_at(bin_col, pos_col + i) * (256 ** (nbytes - 1 - i))
    return out


def _synth_pngs(d) -> DataFrame:
    """Synthesize minimal PNG files (signature + IHDR + pHYs +
    1..3 IDAT chunks + IEND) as real binary columns for doc_id < 48.
    Geometry/payload are formula-driven (the oracle knows only the
    formulas); each chunk carries its REAL CRC-32 over type+data
    (F.crc32 at synth time), so the parser's integrity re-check is
    against genuine PNG framing, not a planted constant.  IDAT holds
    the pre-compression byte stream (no zlib in pure codegen —
    decode is out of scope per the container-stub policy; the
    structural layer a corpus scan runs is fully real)."""
    d = d.where(F.col("doc_id") < 48)
    i = F.col("doc_id")
    w = (F.lit(4) + i % 5).cast("long")
    h = (F.lit(2) + i % 3).cast("long")
    n_idat = (F.lit(1) + i % 3).cast("long")

    def chunk_hex(length_col, td_hex):
        # length(BE4) + type+data + CRC32(type+data)(BE4)
        return F.concat(
            _be_hex(length_col, 4), td_hex, _be_hex(F.crc32(F.unhex(td_hex)), 4)
        )

    ihdr_td = F.concat(
        F.lit("49484452"), _be_hex(w, 4), _be_hex(h, 4), F.lit("0800000000")
    )
    phys_td = F.concat(
        F.lit("70485973"),
        _be_hex(F.lit(2835).cast("long") + i, 4),
        _be_hex(F.lit(5670), 4),
        F.lit("01"),
    )
    idat_td = lambda c: F.concat(
        F.lit("49444154"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.lit(5) + (i + c) % 7).cast("int")),
                lambda j: F.lpad(F.hex((i * 7 + c * 11 + j * 5) % 256), 2, "0"),
            ),
            "",
        ),
    )
    idats = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_idat - 1).cast("int")),
            lambda c: chunk_hex((F.lit(6) + (i + c) % 7).cast("long"), idat_td(c)),
        ),
        "",
    )
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A"),
        chunk_hex(F.lit(13), ihdr_td),
        chunk_hex(F.lit(9), phys_td),
        idats,
        chunk_hex(F.lit(0), F.lit("49454E44")),
    )
    return d.select("doc_id", F.unhex(png_hex).alias("png"))


def png_stats(
    df: DataFrame, id_col: str, bin_col: str, *, max_chunks: int = 8
) -> DataFrame:
    """PUBLIC generic PNG structural statistics over a caller-
    supplied binary column holding real PNG bytes: signature
    check, chunk inventory (first ``max_chunks`` chunks — raise
    for deep files; the fold is O(max_chunks) per row), IHDR
    geometry, pHYs density, IDAT byte accounting, and a per-chunk
    CRC-32 RE-VERIFICATION against the stored field.  Works on
    genuine files (tests craft a real zlib-compressed PNG with
    binascii CRCs and parse it back).  Pure JVM codegen."""
    # The chunk-walk fold is assembled as ONE SQL string handed to a
    # single F.expr (the multimodal_audio_rms lesson: building the
    # ~200-node step expression Column-by-Column cost ~1.0 s of py4j
    # round trips per construction, r8 audit). Field-for-field
    # identical to the previous Column build.
    b = bin_col
    flen_sql = f"CAST(octet_length({b}) AS BIGINT)"

    def byte_at(pos: str) -> str:
        return (
            f"CAST(conv(hex(substring({b}, CAST({pos} AS INT), 1)), 16, 10)"
            f" AS BIGINT)"
        )

    def be4(pos: str) -> str:
        return "(" + " + ".join(
            f"{byte_at(f'({pos}) + {i}')} * {256 ** (3 - i)}" for i in range(4)
        ) + ")"

    zero = "CAST(0 AS BIGINT)"
    fields = [
        "off", "n_chunks", "n_idat", "idat_bytes", "crc_ok",
        "width", "height", "bit_depth", "color_type", "ppu_x",
    ]
    init = "named_struct(" + ", ".join(
        f"'{f}', " + ("CAST(9 AS BIGINT)" if f == "off" else zero)
        for f in fields
    ) + ")"
    off = "acc.off"
    has = f"(({off}) + 11) <= {flen_sql}"
    ln = be4(off)
    t = f"hex(substring({b}, CAST(({off}) + 4 AS INT), 4))"
    is_ihdr = f"{t} = '49484452'"
    is_phys = f"{t} = '70485973'"
    is_idat = f"{t} = '49444154'"
    crc_field = be4(f"({off}) + 8 + {ln}")
    crc_calc = (
        f"crc32(substring({b}, CAST(({off}) + 4 AS INT),"
        f" CAST({ln} + 4 AS INT)))"
    )
    dsum = (
        f"aggregate(sequence(0, CAST({ln} - 1 AS INT)), {zero},"
        f" (a, j) -> a + {byte_at(f'({off}) + 8 + j')})"
    )
    flag = lambda c: f"CAST(CASE WHEN {c} THEN 1 ELSE 0 END AS BIGINT)"
    keep = lambda c, new, old: f"CAST(CASE WHEN {c} THEN {new} ELSE {old} END AS BIGINT)"
    step_fields = {
        "off": keep(has, f"({off}) + 12 + {ln}", off),
        "n_chunks": f"acc.n_chunks + {flag(has)}",
        "n_idat": f"acc.n_idat + {flag(f'({has}) AND ({is_idat})')}",
        "idat_bytes": (
            f"acc.idat_bytes + "
            + keep(f"({has}) AND ({is_idat}) AND ({ln} > 0)", dsum, zero)
        ),
        "crc_ok": f"acc.crc_ok + {flag(f'({has}) AND ({crc_calc} = {crc_field})')}",
        "width": keep(f"({has}) AND ({is_ihdr})", be4(f"({off}) + 8"), "acc.width"),
        "height": keep(f"({has}) AND ({is_ihdr})", be4(f"({off}) + 12"), "acc.height"),
        "bit_depth": keep(
            f"({has}) AND ({is_ihdr})", byte_at(f"({off}) + 16"), "acc.bit_depth"
        ),
        "color_type": keep(
            f"({has}) AND ({is_ihdr})", byte_at(f"({off}) + 17"), "acc.color_type"
        ),
        "ppu_x": keep(f"({has}) AND ({is_phys})", be4(f"({off}) + 8"), "acc.ppu_x"),
    }
    step = "named_struct(" + ", ".join(
        f"'{f}', {step_fields[f]}" for f in fields
    ) + ")"
    walked = F.expr(
        f"aggregate(sequence(1, {int(max_chunks)}), {init}, (acc, x) -> {step})"
    )
    b = F.col(bin_col)
    flen = F.octet_length(b).cast("long")
    return df.select(
        F.col(id_col),
        (F.hex(F.substring(b, 1, 8)) == F.lit("89504E470D0A1A0A"))
        .cast("long")
        .alias("sig_ok"),
        walked["width"].alias("width"),
        walked["height"].alias("height"),
        walked["bit_depth"].alias("bit_depth"),
        walked["color_type"].alias("color_type"),
        walked["ppu_x"].alias("ppu_x"),
        walked["n_chunks"].alias("n_chunks"),
        walked["n_idat"].alias("n_idat"),
        walked["idat_bytes"].alias("idat_bytes"),
        walked["crc_ok"].alias("crc_ok_chunks"),
        flen.alias("file_bytes"),
    )


@query(
    "multimodal_png_parse",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
idat AS (
  SELECT ids.doc_id, c.c, 6 + (ids.doc_id + c.c) % 7 AS len_c
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, CAST(ids.doc_id % 3 AS INT))) AS c
  ) c
),
bytes AS (
  SELECT i.doc_id, (i.doc_id * 7 + i.c * 11 + j.j * 5) % 256 AS v
  FROM idat i, LATERAL (
    SELECT unnest(generate_series(0, CAST(i.len_c - 1 AS INT))) AS j
  ) j
),
per AS (
  SELECT doc_id, CAST(SUM(len_c) AS BIGINT) AS idat_len,
         CAST(COUNT(*) AS BIGINT) AS n_idat
  FROM idat GROUP BY doc_id
),
bsum AS (
  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS idat_bytes
  FROM bytes GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(1 AS BIGINT) AS sig_ok,
       CAST(4 + p.doc_id % 5 AS BIGINT) AS width,
       CAST(2 + p.doc_id % 3 AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type,
       CAST(2835 + p.doc_id AS BIGINT) AS ppu_x,
       CAST(3 + p.n_idat AS BIGINT) AS n_chunks,
       p.n_idat AS n_idat,
       b.idat_bytes AS idat_bytes,
       CAST(3 + p.n_idat AS BIGINT) AS crc_ok_chunks,
       CAST(66 + p.n_idat * 12 + p.idat_len AS BIGINT) AS file_bytes
FROM per p JOIN bsum b USING (doc_id)
""",
    category="multimodal",
)
def multimodal_png_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free IMAGE-container analytics, BIG-endian edition —
    the fourth wire-format parser (WAV/BMP/AVI are little-endian
    RIFF family; PNG is the network-byte-order counterpart).
    Minimal PNGs with REAL CRC-32 fields are synthesized as binary
    columns, then everything is re-derived from the bytes alone:
    the 8-byte signature is verified, and the chunk stream is
    WALKED STRUCTURALLY with a fold (F.aggregate over a bounded
    step sequence, struct accumulator carrying the moving offset) —
    each step reads the big-endian length, matches the chunk fourcc
    (IHDR geometry fields, pHYs density, IDAT payload byte-sum),
    RECOMPUTES CRC-32 over the walked type+data range and compares
    it to the stored CRC field (a mis-walk desynchronizes the CRC
    check, so crc_ok_chunks < n_chunks — structural bugs cannot
    cancel), and advances offset by 12+len.  Pure JVM codegen: zero
    Exchange before the output, zero Python.  At 100 TB this is the
    narrow-waist scan a vision corpus runs before dispatching bytes
    to a real decoder UDF (multimodal_frame_sample)."""
    synth = _synth_pngs(table(spark, sf_dir, "documents"))
    return png_stats(synth, "doc_id", "png")


def _srt_ts(ms_col):
    """HH:MM:SS,mmm formatting of a millisecond count — pure
    integer div/mod + lpad, no date functions."""
    h = (ms_col / 3600000).cast("long")
    m = (ms_col / 60000).cast("long") % 60
    s = (ms_col / 1000).cast("long") % 60
    ms = ms_col % 1000
    pad = lambda c, n: F.lpad(c.cast("string"), n, "0")
    return F.concat(
        pad(h, 2), F.lit(":"), pad(m, 2), F.lit(":"), pad(s, 2),
        F.lit(","), pad(ms, 3),
    )


def _synth_srts(d) -> DataFrame:
    """Synthesize SubRip (SRT) caption files for doc_id < 48:
    2..5 cues per doc, formula-driven timing, caption text drawn
    from the document's own tokens.  The oracle knows only these
    formulas — the regex re-parse must reproduce them."""
    d = d.where(F.col("doc_id") < 48)
    i = F.col("doc_id")
    n_cues = (F.lit(2) + i % 4).cast("long")
    toks = F.split(F.col("text"), " ")
    start = lambda c: c.cast("long") * (120 + (i % 5) * 10)
    end = lambda c: start(c) + 90 + c.cast("long") * 30
    cap = lambda c: F.concat(
        F.lit("c"), c.cast("string"), F.lit(" "),
        F.array_join(F.slice(toks, c * 3 + 1, 3), " "),
    )
    block = lambda c: F.concat(
        (c + 1).cast("string"), F.lit("\n"),
        _srt_ts(start(c)), F.lit(" --> "), _srt_ts(end(c)), F.lit("\n"),
        cap(c), F.lit("\n\n"),
    )
    srt = F.array_join(
        F.transform(F.sequence(F.lit(0), (n_cues - 1).cast("int")), block), ""
    )
    return d.select("doc_id", srt.alias("srt"))


@query(
    "multimodal_caption_align",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
cues AS (
  SELECT d.doc_id, c.c,
         c.c * (120 + (d.doc_id % 5) * 10) AS s_ms,
         c.c * (120 + (d.doc_id % 5) * 10) + 90 + c.c * 30 AS e_ms,
         length('c' || c.c || ' ' ||
                COALESCE(array_to_string(list_slice(
                  string_split(dd.text, ' '), c.c * 3 + 1, c.c * 3 + 3), ' '),
                  '')) AS cap_len
  FROM ids d
  JOIN documents dd ON dd.doc_id = d.doc_id,
  LATERAL (
    SELECT unnest(generate_series(0, 1 + CAST(d.doc_id % 4 AS INT))) AS c
  ) c
),
geo AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 40000 WHEN 1 THEN 50000
              ELSE 100000 END AS usec,
         3 + doc_id % 5 AS nf
  FROM ids
),
aligned AS (
  SELECT cu.doc_id, cu.c, cu.s_ms, cu.e_ms, cu.cap_len,
         GREATEST(0,
           LEAST((cu.e_ms * 1000 - 1) // g.usec, g.nf - 1)
           - GREATEST((cu.s_ms * 1000 + g.usec - 1) // g.usec, 0) + 1)
             AS n_frames
  FROM cues cu JOIN geo g USING (doc_id)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_cues,
       CAST(SUM(e_ms - s_ms) AS BIGINT) AS total_cue_ms,
       CAST(MIN(s_ms) AS BIGINT) AS first_start_ms,
       CAST(MAX(e_ms) AS BIGINT) AS last_end_ms,
       CAST(SUM(cap_len) AS BIGINT) AS caption_chars,
       CAST(SUM(n_frames) AS BIGINT) AS cue_frame_pairs
FROM aligned
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-to-frame alignment — the step that turns a video
    corpus plus its subtitle sidecars into supervised (frame span,
    text) training pairs.  Three real parsers compose: (1) SRT files
    are synthesized per doc and RE-PARSED from the text alone —
    regexp_extract_all pulls every HH:MM:SS,mmm timestamp (split
    into starts/ends by the index-aware filter lambda) and every
    caption line, and cue millis are rebuilt from fixed-position
    substrings; (2) the matching AVI container contributes the frame
    clock (dwMicroSecPerFrame, dwTotalFrames) parsed from the BYTES
    (little-endian reads, as in multimodal_avi_parse); (3) an
    integer interval intersection maps each cue's [start, end) onto
    frame indices k*usec — ceil/floor divisions done exactly in
    int64, clamped to the frame range.  One equi-join on doc_id
    (co-partitionable at scale), all parsing in JVM codegen, zero
    Python.  The oracle knows only the generator formulas, so a
    regex slip or an off-by-one in the clock math cannot cancel."""
    d = table(spark, sf_dir, "documents")
    srt = _synth_srts(d)
    avi = _synth_avis(d)
    b = F.col("avi")
    geo = avi.select(
        "doc_id", _le_int(b, 33, 4).alias("usec"), _le_int(b, 49, 4).alias("nf")
    )
    tss = F.regexp_extract_all(
        F.col("srt"), F.lit(r"(\d{2}:\d{2}:\d{2},\d{3})"), 1
    )
    caps = F.regexp_extract_all(
        F.col("srt"), F.lit(r" --> [^\n]*\n([^\n]+)\n"), 1
    )
    ms = lambda x: (
        F.substring(x, 1, 2).cast("long") * 3600000
        + F.substring(x, 4, 2).cast("long") * 60000
        + F.substring(x, 7, 2).cast("long") * 1000
        + F.substring(x, 10, 3).cast("long")
    )
    starts = F.transform(
        F.filter(tss, lambda x, i: i % 2 == 0), lambda x: ms(x)
    )
    ends = F.transform(
        F.filter(tss, lambda x, i: i % 2 == 1), lambda x: ms(x)
    )
    parsed = srt.select(
        "doc_id",
        starts.alias("s"),
        ends.alias("e"),
        F.transform(caps, lambda x: F.length(x)).alias("cl"),
    )
    j = parsed.join(geo, "doc_id")
    usec, nf = F.col("usec"), F.col("nf")
    lsum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
    # exact int64 floor division: (a - a % b) / b has an exactly
    # divisible numerator, so the double divide is exact and the
    # docstring's "integer intersection" claim holds bit-for-bit
    # (a bare a/b double + cast could in principle truncate across
    # the integer boundary).
    idiv = lambda a, b: ((a - a % b) / b).cast("long")
    frames_per_cue = F.zip_with(
        F.col("s"),
        F.col("e"),
        lambda s, e: F.greatest(
            F.lit(0).cast("long"),
            F.least(idiv(e * 1000 - 1, usec), nf - 1).cast("long")
            - F.greatest(idiv(s * 1000 + usec - 1, usec), F.lit(0).cast("long"))
            + 1,
        ),
    )
    return j.select(
        "doc_id",
        F.size("s").cast("long").alias("n_cues"),
        lsum(F.zip_with(F.col("s"), F.col("e"), lambda s, e: e - s)).alias(
            "total_cue_ms"
        ),
        F.array_min("s").alias("first_start_ms"),
        F.array_max("e").alias("last_end_ms"),
        lsum(F.col("cl")).alias("caption_chars"),
        lsum(frames_per_cue).alias("cue_frame_pairs"),
    )


def _synth_mp4s(d) -> DataFrame:
    """Synthesize minimal ISO-BMFF (MP4) files for doc_id < 48:
    ftyp (brand isom, per-doc minor version) + moov{mvhd v0 with
    per-doc timescale/duration} + a variable-length free box + mdat
    with formula-driven payload bytes.  Box sizes/fields are all
    BIG-endian; the oracle knows only these formulas."""
    d = d.where(F.col("doc_id") < 48)
    i = F.col("doc_id")
    ts = (F.lit(600).cast("long") + i)
    dur = (F.lit(1200).cast("long") + i * 3)
    free_len = (i % 5).cast("long")
    mdat_len = (F.lit(16) + i % 9).cast("long")
    mdat_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (mdat_len - 1).cast("int")),
            lambda j: F.lpad(F.hex((i * 11 + j * 3) % 256), 2, "0"),
        ),
        "",
    )
    mvhd = F.concat(
        _be_hex(F.lit(108), 4), F.lit("6D766864"),      # 'mvhd', v0 full box
        F.lit("00000000"),                              # version + flags
        _be_hex(F.lit(0), 4), _be_hex(F.lit(0), 4),     # creation, modification
        _be_hex(ts, 4),                                 # timescale
        _be_hex(dur, 4),                                # duration
        F.lit("00010000"), F.lit("0100"),               # rate 1.0, volume 1.0
        F.repeat(F.lit("0"), 2 * (108 - 8 - 4 - 8 - 8 - 6)),  # reserved tail
    )
    mp4_hex = F.concat(
        _be_hex(F.lit(20), 4), F.lit("66747970"),       # 'ftyp' size 20
        F.lit("69736F6D"),                              # major brand 'isom'
        _be_hex(i, 4),                                  # minor version
        F.lit("6D703431"),                              # compat brand 'mp41'
        _be_hex(F.lit(116), 4), F.lit("6D6F6F76"),      # 'moov' = 8 + mvhd(108)
        mvhd,
        _be_hex(free_len + 8, 4), F.lit("66726565"),    # 'free'
        F.repeat(F.lit("00"), free_len.cast("int")),
        _be_hex(mdat_len + 8, 4), F.lit("6D646174"),    # 'mdat'
        mdat_hex,
    )
    return d.select("doc_id", F.unhex(mp4_hex).alias("mp4"))


def mp4_stats(
    df: DataFrame, id_col: str, bin_col: str, *, max_boxes: int = 6
) -> DataFrame:
    """PUBLIC generic ISO-BMFF (MP4) structural statistics over a
    caller-supplied binary column: walk the first ``max_boxes``
    top-level boxes, verify the ftyp major brand, read the nested
    mvhd (version-0) timescale/duration at the walked moov offset
    (mvhd must be moov's first child — true of muxer output),
    and account mdat payload bytes.  Works on genuine files
    (tests craft a real struct-packed MP4 and parse it back).
    Pure JVM codegen."""
    b = F.col(bin_col)
    flen = F.octet_length(b).cast("long")
    be4 = lambda pos: _be_int_dyn(b, pos, 4)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(1).cast("long").alias("off"),
        zero.alias("n_boxes"),
        zero.alias("ftyp_ok"),
        zero.alias("minor_version"),
        zero.alias("timescale"),
        zero.alias("duration"),
        zero.alias("mdat_len"),
        zero.alias("mdat_sum"),
    )

    def step(acc, _):
        off = acc["off"]
        has = (off + 7) <= flen
        size = be4(off)
        t = F.hex(F.substring(b, (off + F.lit(4)).cast("int"), 4))
        is_ftyp = t == F.lit("66747970")
        is_moov = t == F.lit("6D6F6F76")
        is_mdat = t == F.lit("6D646174")
        brand_ok = F.hex(
            F.substring(b, (off + F.lit(8)).cast("int"), 4)
        ) == F.lit("69736F6D")
        # mvhd is the first child box of moov: header at off+8,
        # payload (v0) starts at off+8+8+4; timescale/duration are
        # the 3rd/4th BE32 fields after creation/modification.
        mv = off + 8 + 8 + 4
        payload_len = size - 8
        dsum = F.aggregate(
            F.sequence(F.lit(0), (payload_len - 1).cast("int")),
            zero,
            lambda a, j: a + _byte_at(b, off + 8 + j),
        )
        flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")
        keep = lambda c, new_v, old: F.when(c, new_v).otherwise(old).cast("long")
        return F.struct(
            keep(has, off + size, off).alias("off"),
            (acc["n_boxes"] + flag(has)).alias("n_boxes"),
            (acc["ftyp_ok"] + flag(has & is_ftyp & brand_ok)).alias("ftyp_ok"),
            keep(has & is_ftyp, be4(off + 12), acc["minor_version"]).alias(
                "minor_version"
            ),
            keep(has & is_moov, be4(mv + 8), acc["timescale"]).alias("timescale"),
            keep(has & is_moov, be4(mv + 12), acc["duration"]).alias("duration"),
            keep(has & is_mdat, payload_len, acc["mdat_len"]).alias("mdat_len"),
            keep(has & is_mdat & (payload_len > 0), dsum, acc["mdat_sum"]).alias(
                "mdat_sum"
            ),
        )

    walked = F.aggregate(F.sequence(F.lit(1), F.lit(int(max_boxes))), init, step)
    return df.select(
        F.col(id_col),
        walked["ftyp_ok"].alias("ftyp_ok"),
        walked["minor_version"].alias("minor_version"),
        walked["timescale"].alias("timescale"),
        walked["duration"].alias("duration"),
        (
            walked["duration"].cast("double") / walked["timescale"]
        ).alias("duration_s"),
        walked["n_boxes"].alias("n_boxes"),
        walked["mdat_len"].alias("mdat_len"),
        walked["mdat_sum"].alias("mdat_sum"),
        flen.alias("file_bytes"),
    )


@query(
    "multimodal_mp4_parse",
    oracle="""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 48),
mdat AS (
  SELECT ids.doc_id, (ids.doc_id * 11 + j.j * 3) % 256 AS v
  FROM ids, LATERAL (
    SELECT unnest(generate_series(0, CAST(15 + ids.doc_id % 9 AS INT))) AS j
  ) j
),
ms AS (
  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS mdat_sum,
         CAST(COUNT(*) AS BIGINT) AS mdat_len
  FROM mdat GROUP BY doc_id
)
SELECT m.doc_id,
       CAST(1 AS BIGINT) AS ftyp_ok,
       CAST(m.doc_id AS BIGINT) AS minor_version,
       CAST(600 + m.doc_id AS BIGINT) AS timescale,
       CAST(1200 + m.doc_id * 3 AS BIGINT) AS duration,
       CAST(1200 + m.doc_id * 3 AS DOUBLE) / (600 + m.doc_id)
           AS duration_s,
       CAST(4 AS BIGINT) AS n_boxes,
       m.mdat_len AS mdat_len,
       m.mdat_sum AS mdat_sum,
       CAST(20 + 116 + 8 + (m.doc_id % 5) + 8 + m.mdat_len AS BIGINT)
           AS file_bytes
FROM ms m
""",
    category="multimodal",
)
def multimodal_mp4_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF (MP4) container analytics — the FIFTH wire-format
    parser, and the one covering the dominant real-world video
    container: minimal MP4s are synthesized as binary columns (ftyp
    + moov{mvhd} + free + mdat, all big-endian), then re-derived
    from the bytes alone.  The top-level BOX STREAM is walked with
    the same struct-accumulator fold as the PNG chunk walk (each
    step reads the BE32 size + fourcc, classifies the box, advances
    by size), the nested mvhd is parsed at its walked offset
    (version-0 layout: timescale and duration as BE32 field reads),
    the ftyp major brand is byte-verified, mdat payload bytes are
    summed through the walk, and the presentation duration surfaces
    as ONE exact double division duration/timescale.  Pure JVM
    codegen, zero Exchange, zero Python — at 100 TB this is the
    header-triage scan a video lake runs to route files before any
    demux/decode dispatch."""
    synth = _synth_mp4s(table(spark, sf_dir, "documents"))
    return mp4_stats(synth, "doc_id", "mp4")


# --- TAR archive indexing (sixth wire format: POSIX ustar) ---------

_TAR_DOCS = 40
_TAR_MEMBERS = 3
# constant byte-sum of the fixed ustar header fields (mode 0000644,
# uid/gid 0000000, mtime zeros, chksum-as-spaces, typeflag '0',
# magic "ustar\0" + version "00"; NULs contribute 0)
_TAR_CONST_SUM = 2509


def _ascii_sum(scol):
    """Byte sum of an ASCII string column (pure codegen fold)."""
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(scol)),
            lambda i: F.ascii(F.substr(scol, i, F.lit(1))),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x.cast("long"),
    )


def _synth_tars(d) -> DataFrame:
    """Synthesize a real POSIX-ustar archive per doc_id < 40: three
    members "doc{d}/part{i}.txt" with formula-driven sizes
    100 + (d*97 + i*131) % 900 (spanning 1 or 2 data blocks, so the
    member walk genuinely depends on the parsed size field) and
    printable content bytes 32 + ((d + 3i + j) % 64); correct octal
    size/chksum fields; two zero blocks terminate the archive. The
    oracle knows only these formulas."""
    d = d.where(F.col("doc_id") < _TAR_DOCS).select("doc_id")

    # Assembled as ONE SQL string per archive (single F.expr) — the
    # Column-by-Column build cost ~0.7 s of py4j round trips per
    # construction (r8 audit; the multimodal_audio_rms lesson).
    def ascii_sum_sql(s: str) -> str:
        return (
            f"aggregate(transform(sequence(1, length({s})),"
            f" i -> ascii(substr({s}, i, 1))),"
            f" CAST(0 AS BIGINT), (a, x) -> a + CAST(x AS BIGINT))"
        )

    def member_hex_sql(m: int) -> str:
        name = f"concat('doc', CAST(doc_id AS STRING), '/part{m}.txt')"
        size = f"CAST(100 + (doc_id * 97 + {m} * 131) % 900 AS BIGINT)"
        size_oct = f"lpad(conv(CAST({size} AS STRING), 10, 8), 11, '0')"
        size_field = f"concat({size_oct}, chr(0))"
        total = (
            f"({ascii_sum_sql(name)} + {ascii_sum_sql(size_oct)}"
            f" + {_TAR_CONST_SUM})"
        )
        chksum_field = (
            f"concat(lpad(conv(CAST({total} AS STRING), 10, 8), 6, '0'),"
            f" chr(0), ' ')"
        )
        header_str = (
            "concat("
            f"rpad({name}, 100, chr(0)), "
            "'0000644', chr(0), "              # mode
            "'0000000', chr(0), "              # uid
            "'0000000', chr(0), "              # gid
            f"{size_field}, "
            "'00000000000', chr(0), "          # mtime
            f"{chksum_field}, "
            "'0', "                            # typeflag: regular file
            "rpad('', 100, chr(0)), "          # linkname
            "'ustar', chr(0), '00')"           # magic + version
        )
        # header_str is 265 bytes (100+8+8+8+12+12+8+1+100+8); the
        # remaining 247 (uname 32 + gname 32 + devmajor 8 + devminor 8
        # + prefix 155 + pad 12) are NUL
        header_hex = (
            f"concat(hex(encode({header_str}, 'utf-8')),"
            f" repeat('00', {512 - 265}))"
        )
        content_hex = (
            f"array_join(transform(sequence(0, CAST({size} - 1 AS INT)),"
            f" j -> lpad(hex(32 + (doc_id + 3 * {m} + CAST(j AS BIGINT))"
            f" % 64), 2, '0')), '')"
        )
        n_blocks = f"CAST(floor(({size} + 511) / 512) AS BIGINT)"
        pad_hex = f"repeat('00', CAST({n_blocks} * 512 - {size} AS INT))"
        return f"concat({header_hex}, {content_hex}, {pad_hex})"

    tar_hex = (
        "concat("
        + ", ".join(member_hex_sql(m) for m in range(_TAR_MEMBERS))
        + ", repeat('00', 1024))"  # end-of-archive zero blocks
    )
    return d.select("doc_id", F.unhex(F.expr(tar_hex)).alias("tar"))


def tar_index(df: DataFrame, id_col: str, bin_col: str, max_members: int = 8) -> DataFrame:
    """PUBLIC generic POSIX-ustar member index over a caller-supplied
    binary column, walked FROM THE BYTES ALONE in one codegen fold:
    at each step the member's octal size field decides the next
    offset ((size+511) div 512 data blocks), the stored octal
    checksum is verified against a recomputation over all 512 header
    bytes (chksum field as spaces — a mis-walk yields 0 valid
    checksums, not a lucky pass), and the walk stops at the
    zero-block terminator or after ``max_members``.  Emits per
    archive: member count, total content bytes, summed name lengths,
    checksum-valid count, and the byte sum of every member's
    content.  At 100 TB: archives are opaque parquet BYTE_ARRAY
    cells; the index is a pure map stage (zero Exchange, zero
    Python) that routes members to downstream decode UDFs."""
    b = F.col(bin_col)

    # The member-walk fold is assembled as ONE SQL string handed to
    # a single F.expr (the multimodal_audio_rms lesson — the
    # Column-by-Column build cost ~0.65 s of py4j round trips per
    # construction, r8 audit). Field-for-field identical semantics.
    bs = bin_col

    def byte_at_sql(pos: str) -> str:
        return (
            f"CAST(conv(hex(substring({bs}, CAST({pos} AS INT), 1)), 16, 10)"
            f" AS BIGINT)"
        )

    def parse_octal_sql(pos: str, width: int) -> str:
        return (
            f"CAST(conv(substring_index(decode(substring({bs},"
            f" CAST({pos} AS INT), {width}), 'utf-8'), chr(0), 1), 8, 10)"
            f" AS BIGINT)"
        )

    zero_s = "CAST(0 AS BIGINT)"
    off = "acc.off"
    size = parse_octal_sql(f"({off}) + 125", 12)
    name = (
        f"substring_index(decode(substring({bs}, CAST(({off}) + 1 AS INT),"
        f" 100), 'utf-8'), chr(0), 1)"
    )
    header_sum = (
        f"aggregate(transform(sequence(0, 511),"
        f" j -> CASE WHEN j >= 148 AND j < 156 THEN CAST(32 AS BIGINT)"
        f" ELSE {byte_at_sql(f'({off}) + 1 + j')} END),"
        f" {zero_s}, (a, x) -> a + x)"
    )
    content_sum = (
        f"aggregate(transform(sequence(1, CAST({size} AS INT)),"
        f" j -> {byte_at_sql(f'({off}) + 512 + j')}),"
        f" {zero_s}, (a, x) -> a + x)"
    )
    cs_ok = (
        f"CAST({parse_octal_sql(f'({off}) + 149', 8)} = {header_sum}"
        f" AS BIGINT)"
    )
    done = (
        f"(({off}) < 0) OR (({off}) + 512 > octet_length({bs}))"
        f" OR ({byte_at_sql(f'({off}) + 1')} = 0)"
    )
    advanced = (
        "named_struct("
        f"'off', ({off}) + 512 + CAST(floor(({size} + 511) / 512) AS BIGINT) * 512, "
        f"'n', acc.n + 1, "
        f"'tot', acc.tot + {size}, "
        f"'names', acc.names + CAST(length({name}) AS BIGINT), "
        f"'csok', acc.csok + {cs_ok}, "
        f"'fsum', acc.fsum + {content_sum})"
    )
    ended = (
        "named_struct('off', CAST(-1 AS BIGINT), 'n', acc.n, 'tot', acc.tot,"
        " 'names', acc.names, 'csok', acc.csok, 'fsum', acc.fsum)"
    )
    init = (
        "named_struct('off', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT),"
        " 'tot', CAST(0 AS BIGINT), 'names', CAST(0 AS BIGINT),"
        " 'csok', CAST(0 AS BIGINT), 'fsum', CAST(0 AS BIGINT))"
    )
    walked = F.expr(
        f"aggregate(sequence(1, {int(max_members)}), {init},"
        f" (acc, x) -> CASE WHEN {done} THEN {ended} ELSE {advanced} END)"
    )
    return df.select(
        F.col(id_col),
        walked["n"].alias("n_members"),
        walked["tot"].alias("total_content_bytes"),
        walked["names"].alias("sum_name_chars"),
        walked["csok"].alias("n_checksum_valid"),
        walked["fsum"].alias("content_byte_sum"),
        F.octet_length(b).cast("long").alias("archive_bytes"),
    )


@query(
    "multimodal_tar_index",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_TAR_DOCS}),
mem AS (
  SELECT ids.doc_id, g.m,
         100 + (ids.doc_id * 97 + g.m * 131) % 900 AS sz
  FROM ids, LATERAL (SELECT unnest(generate_series(0, {_TAR_MEMBERS - 1})) AS m) g
),
bytes AS (
  SELECT mem.doc_id, mem.m, j.j,
         32 + ((mem.doc_id + 3 * mem.m + j.j) % 64) AS v
  FROM mem, LATERAL (
    SELECT unnest(generate_series(0, CAST(mem.sz - 1 AS INT))) AS j) j
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(sz) AS BIGINT) AS total_content_bytes,
         CAST(SUM(13 + len(CAST(doc_id AS VARCHAR))) AS BIGINT)
           AS sum_name_chars,
         CAST(COUNT(*) AS BIGINT) AS n_checksum_valid,
         CAST(SUM(CAST((sz + 511) // 512 AS BIGINT) * 512 + 512) + 1024
              AS BIGINT) AS archive_bytes
  FROM mem GROUP BY doc_id
),
content AS (
  SELECT doc_id, CAST(SUM(v) AS BIGINT) AS content_byte_sum
  FROM bytes GROUP BY doc_id
)
SELECT p.doc_id, p.n_members, p.total_content_bytes, p.sum_name_chars,
       p.n_checksum_valid, c.content_byte_sum, p.archive_bytes
FROM per_doc p JOIN content c ON c.doc_id = p.doc_id
""",
    category="multimodal",
)
def multimodal_tar_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive indexing — the SIXTH wire format (POSIX ustar TAR, the
    container WARC/data-dump corpora arrive in): real tar archives
    (correct octal size fields, real header checksums, zero-block
    terminators, members spanning 1-2 data blocks) are synthesized
    as binary cells, then the member table is re-derived from the
    BYTES ALONE by ``tar_index`` — a structural walk where each next
    offset comes from the previous member's parsed octal size, and
    every header checksum is re-summed over all 512 bytes and
    matched against the stored field (n_checksum_valid == n_members
    is the self-authentication; a single mis-stepped offset zeroes
    it).  The oracle knows only the generator formulas.  Pure JVM
    codegen, zero Exchange, zero Python (plan-tested like the other
    five parsers)."""
    synth = _synth_tars(table(spark, sf_dir, "documents"))
    return tar_index(synth, "doc_id", "tar")


# --- GIF header + palette parsing (seventh wire format) ------------

_GIF_DOCS = 48


def _synth_gifs(d) -> DataFrame:
    """Synthesize canonical GIF89a prefixes for doc_id < 48:
    signature, logical-screen descriptor (width 3 + d%6, height
    2 + d%4, global-color-table flag set, color resolution 7, GCT
    size bits k = d%3 -> 2^(k+1) RGB entries), formula-driven
    palette bytes, and the 0x3B trailer. The oracle knows only the
    formulas."""
    d = d.where(F.col("doc_id") < _GIF_DOCS).select("doc_id")
    i_ = F.col("doc_id")
    width = (3 + i_ % 6).cast("long")
    height = (2 + i_ % 4).cast("long")
    k = (i_ % 3).cast("long")
    n_entries = F.pow(F.lit(2.0), (k + 1).cast("double")).cast("long")  # 2^(k+1)
    packed = (F.lit(0xF0) + k).cast("long")  # 1|111|0|kkk
    palette_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (n_entries - 1).cast("int")),
            lambda e: F.concat(
                _le_hex((i_ * 5 + e.cast("long") * 7) % 256, 1),
                _le_hex((i_ * 11 + e.cast("long") * 3) % 256, 1),
                _le_hex((i_ * 13 + e.cast("long") * 17) % 256, 1),
            ),
        ),
        "",
    )
    gif_hex = F.concat(
        F.hex(F.encode(F.lit("GIF89a"), "utf-8")),
        _le_hex(width, 2),
        _le_hex(height, 2),
        _le_hex(packed, 1),
        F.lit("0000"),  # background color index, aspect ratio
        palette_hex,
        F.lit("3B"),    # trailer
    )
    return d.select("doc_id", F.unhex(gif_hex).alias("gif"))


def gif_stats(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """PUBLIC generic GIF89a header/palette statistics over a
    caller-supplied binary column, from the bytes alone in JVM
    codegen: signature validation, logical-screen geometry
    (little-endian uint16), packed-field bit slicing (GCT flag,
    color resolution, table size 2^(k+1)) and exact per-channel
    palette sums.  Authenticated in tests against a genuine
    Pillow-convention GIF byte layout built with struct."""
    b = F.col(bin_col)
    sig_ok = (
        F.decode(F.substring(b, 1, 6), "utf-8") == "GIF89a"
    ).cast("long")
    width = _le_int(b, 7, 2)
    height = _le_int(b, 9, 2)
    packed = _le_int(b, 11, 1)
    gct_flag = F.floor(packed / 128).cast("long")
    color_res = (F.floor(packed / 16).cast("long") % 8) + 1
    # 2^((packed & 7) + 1) — exact in double for exponents <= 8
    n_entries = F.pow(F.lit(2.0), ((packed % 8) + 1).cast("double")).cast("long")
    chan = lambda off: F.aggregate(
        F.transform(
            F.sequence(F.lit(0), (n_entries - 1).cast("int")),
            lambda e: _byte_at(b, F.lit(14).cast("long") + e.cast("long") * 3 + off),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    trailer_ok = (
        F.hex(F.substring(b, (13 + n_entries * 3 + 1).cast("int"), 1)) == "3B"
    ).cast("long")
    return df.select(
        F.col(id_col),
        sig_ok.alias("sig_ok"),
        width.alias("width"),
        height.alias("height"),
        gct_flag.alias("gct_flag"),
        color_res.alias("color_resolution"),
        n_entries.alias("palette_entries"),
        chan(0).alias("sum_r"),
        chan(1).alias("sum_g"),
        chan(2).alias("sum_b"),
        trailer_ok.alias("trailer_ok"),
    )


@query(
    "multimodal_gif_parse",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_GIF_DOCS}),
pal AS (
  SELECT ids.doc_id, e.e,
         (ids.doc_id * 5 + e.e * 7) % 256 AS r,
         (ids.doc_id * 11 + e.e * 3) % 256 AS g,
         (ids.doc_id * 13 + e.e * 17) % 256 AS b
  FROM ids, LATERAL (
    SELECT unnest(generate_series(
      0, CAST(2 * (1 << (ids.doc_id % 3)) - 1 AS INT))) AS e) e
)
SELECT doc_id,
       CAST(1 AS BIGINT) AS sig_ok,
       CAST(3 + doc_id % 6 AS BIGINT) AS width,
       CAST(2 + doc_id % 4 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS gct_flag,
       CAST(8 AS BIGINT) AS color_resolution,
       CAST(2 * (1 << (doc_id % 3)) AS BIGINT) AS palette_entries,
       CAST(SUM(r) AS BIGINT) AS sum_r,
       CAST(SUM(g) AS BIGINT) AS sum_g,
       CAST(SUM(b) AS BIGINT) AS sum_b,
       CAST(1 AS BIGINT) AS trailer_ok
FROM pal
GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_gif_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Palette-image analytics — the SEVENTH wire format (GIF89a, the
    indexed-color family the BMP/PNG parsers don't cover): canonical
    GIF prefixes (signature, logical-screen descriptor, global color
    table, trailer) synthesized as binary cells, then geometry,
    bit-packed GCT fields, per-channel palette sums, and the trailer
    byte all re-derived from the BYTES ALONE — the packed byte is
    bit-sliced with integer div/mod (flag=bit7, color resolution =
    bits 6-4 + 1, table size 2^((packed&7)+1)), so a one-bit layout
    error shifts every downstream offset and zeroes trailer_ok
    rather than passing by luck.  Oracle knows only the generator
    formulas.  Pure JVM codegen, zero Exchange, zero Python."""
    synth = _synth_gifs(table(spark, sf_dir, "documents"))
    return gif_stats(synth, "doc_id", "gif")


# --- ZIP local-header walk + EOCD (eighth wire format) --------------

_ZIP_DOCS = 40
_ZIP_MEMBERS = 3


def _le_hex_sql(value_sql: str, nbytes: int) -> str:
    """Hex string of ``value_sql`` as ``nbytes`` LITTLE-ENDIAN bytes —
    ZIP is the first LE format in the parser series (PNG/MP4/AVI are
    BE or chunked): big-endian lpad-hex, then byte pairs reversed."""
    h = f"lpad(hex(CAST({value_sql} AS BIGINT)), {2 * nbytes}, '0')"
    pairs = ", ".join(
        f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
    )
    return f"concat({pairs})"


def _synth_zips(d) -> DataFrame:
    """Synthesize a real stored-method (no compression) ZIP per
    doc_id < 40: three members "doc{d}_f{i}.txt" with sizes
    60 + (d*53 + i*77) % 140 and printable content bytes
    32 + ((d + 5i + j) % 64), REAL CRC-32s (F.crc32 at synth time,
    like the PNG chunks), a full central directory, and a correct
    end-of-central-directory record.  All multi-byte fields
    little-endian per the spec.  The oracle knows only these
    formulas."""
    d = d.where(F.col("doc_id") < _ZIP_DOCS).select("doc_id")

    def name_sql(m: int) -> str:
        return f"concat('doc', CAST(doc_id AS STRING), '_f{m}.txt')"

    def size_sql(m: int) -> str:
        return f"CAST(60 + (doc_id * 53 + {m} * 77) % 140 AS BIGINT)"

    def content_hex_sql(m: int) -> str:
        return (
            f"array_join(transform(sequence(0, CAST({size_sql(m)} - 1 AS INT)),"
            f" j -> lpad(hex(32 + (doc_id + 5 * {m} + CAST(j AS BIGINT))"
            f" % 64), 2, '0')), '')"
        )

    def crc_sql(m: int) -> str:
        return f"crc32(unhex({content_hex_sql(m)}))"

    def name_len_sql(m: int) -> str:
        return f"CAST(length({name_sql(m)}) AS BIGINT)"

    def local_off_sql(m: int) -> str:
        """Byte offset of member m's local header (0-based)."""
        terms = ["CAST(0 AS BIGINT)"]
        for i in range(m):
            terms.append(f"(30 + {name_len_sql(i)} + {size_sql(i)})")
        return "(" + " + ".join(terms) + ")"

    def local_hex_sql(m: int) -> str:
        return (
            "concat("
            "'504B0304', "                       # PK\\x03\\x04
            f"{_le_hex_sql('20', 2)}, "          # version needed
            f"{_le_hex_sql('0', 2)}, "           # flags
            f"{_le_hex_sql('0', 2)}, "           # method: stored
            f"{_le_hex_sql('24608', 2)}, "       # mod time (12:01:00)
            f"{_le_hex_sql('22561', 2)}, "       # mod date (2024-01-01)
            f"{_le_hex_sql(crc_sql(m), 4)}, "
            f"{_le_hex_sql(size_sql(m), 4)}, "   # compressed == stored
            f"{_le_hex_sql(size_sql(m), 4)}, "   # uncompressed
            f"{_le_hex_sql(name_len_sql(m), 2)}, "
            f"{_le_hex_sql('0', 2)}, "           # extra len
            f"hex(encode({name_sql(m)}, 'utf-8')), "
            f"{content_hex_sql(m)})"
        )

    def central_hex_sql(m: int) -> str:
        return (
            "concat("
            "'504B0102', "                       # PK\\x01\\x02
            f"{_le_hex_sql('20', 2)}, "          # version made by
            f"{_le_hex_sql('20', 2)}, "          # version needed
            f"{_le_hex_sql('0', 2)}, "           # flags
            f"{_le_hex_sql('0', 2)}, "           # method
            f"{_le_hex_sql('24608', 2)}, "
            f"{_le_hex_sql('22561', 2)}, "
            f"{_le_hex_sql(crc_sql(m), 4)}, "
            f"{_le_hex_sql(size_sql(m), 4)}, "
            f"{_le_hex_sql(size_sql(m), 4)}, "
            f"{_le_hex_sql(name_len_sql(m), 2)}, "
            f"{_le_hex_sql('0', 2)}, "           # extra len
            f"{_le_hex_sql('0', 2)}, "           # comment len
            f"{_le_hex_sql('0', 2)}, "           # disk number
            f"{_le_hex_sql('0', 2)}, "           # internal attrs
            f"{_le_hex_sql('0', 4)}, "           # external attrs
            f"{_le_hex_sql(local_off_sql(m), 4)}, "
            f"hex(encode({name_sql(m)}, 'utf-8')))"
        )

    cd_off = local_off_sql(_ZIP_MEMBERS)
    cd_size = "(" + " + ".join(
        f"(46 + {name_len_sql(i)})" for i in range(_ZIP_MEMBERS)
    ) + ")"
    eocd_hex = (
        "concat("
        "'504B0506', "
        f"{_le_hex_sql('0', 2)}, "              # this disk
        f"{_le_hex_sql('0', 2)}, "              # cd start disk
        f"{_le_hex_sql(str(_ZIP_MEMBERS), 2)}, "
        f"{_le_hex_sql(str(_ZIP_MEMBERS), 2)}, "
        f"{_le_hex_sql(cd_size, 4)}, "
        f"{_le_hex_sql(cd_off, 4)}, "
        f"{_le_hex_sql('0', 2)})"               # comment len
    )
    zip_hex = (
        "concat("
        + ", ".join(local_hex_sql(m) for m in range(_ZIP_MEMBERS))
        + ", "
        + ", ".join(central_hex_sql(m) for m in range(_ZIP_MEMBERS))
        + f", {eocd_hex})"
    )
    return d.select("doc_id", F.unhex(F.expr(zip_hex)).alias("zipf"))


def zip_index(df: DataFrame, id_col: str, bin_col: str, max_members: int = 8) -> DataFrame:
    """PUBLIC generic ZIP member index over a caller-supplied binary
    column — stored-method archives walked FROM THE BYTES ALONE in
    one codegen fold: each step verifies the PK\\x03\\x04 local
    signature, reads the little-endian size/name-length fields to
    find the next header, and RECOMPUTES each member's CRC-32 over
    the stored data against the header field (the same
    self-authentication as png_parse/tar_index: a single mis-stepped
    offset zeroes n_crc_valid).  The end-of-central-directory record
    (fixed 22-byte tail when comment-free) cross-checks the walk:
    entry count and central-directory offset come from the OTHER end
    of the file.  At 100 TB: archives are opaque parquet BYTE_ARRAY
    cells; the index is a pure map stage (zero Exchange, zero
    Python) routing members to downstream decode UDFs."""
    b = F.col(bin_col)
    bs = bin_col

    def le_read(pos: str, nbytes: int) -> str:
        h = f"hex(substring({bs}, CAST({pos} AS INT), {nbytes}))"
        pairs = ", ".join(
            f"substr({h}, {2 * i + 1}, 2)" for i in range(nbytes - 1, -1, -1)
        )
        return f"CAST(conv(concat({pairs}), 16, 10) AS BIGINT)"

    off = "acc.off"  # 0-based offset of the current local header
    sig_ok = f"hex(substring({bs}, CAST(({off}) + 1 AS INT), 4)) = '504B0304'"
    usize = le_read(f"({off}) + 23", 4)
    nlen = le_read(f"({off}) + 27", 2)
    elen = le_read(f"({off}) + 29", 2)
    crc_field = le_read(f"({off}) + 15", 4)
    crc_calc = (
        f"crc32(substring({bs}, CAST(({off}) + 31 + {nlen} + {elen} AS INT),"
        f" CAST({usize} AS INT)))"
    )
    done = f"(({off}) < 0) OR (({off}) + 30 > octet_length({bs})) OR NOT ({sig_ok})"
    advanced = (
        "named_struct("
        f"'off', ({off}) + 30 + {nlen} + {elen} + {usize}, "
        "'n', acc.n + 1, "
        f"'tot', acc.tot + {usize}, "
        f"'names', acc.names + {nlen}, "
        f"'crcok', acc.crcok + CAST({crc_calc} = {crc_field} AS BIGINT))"
    )
    ended = (
        "named_struct('off', CAST(-1 AS BIGINT), 'n', acc.n, 'tot', acc.tot,"
        " 'names', acc.names, 'crcok', acc.crcok)"
    )
    init = (
        "named_struct('off', CAST(0 AS BIGINT), 'n', CAST(0 AS BIGINT),"
        " 'tot', CAST(0 AS BIGINT), 'names', CAST(0 AS BIGINT),"
        " 'crcok', CAST(0 AS BIGINT))"
    )
    walked = F.expr(
        f"aggregate(sequence(1, {int(max_members)}), {init},"
        f" (acc, x) -> CASE WHEN {done} THEN {ended} ELSE {advanced} END)"
    )
    eocd = f"(octet_length({bs}) - 22)"
    eocd_sig = f"hex(substring({bs}, CAST(({eocd}) + 1 AS INT), 4)) = '504B0506'"
    return df.select(
        F.col(id_col),
        walked["n"].alias("n_members"),
        walked["tot"].alias("total_uncompressed"),
        walked["names"].alias("sum_name_chars"),
        walked["crcok"].alias("n_crc_valid"),
        F.expr(
            f"CASE WHEN {eocd_sig} THEN {le_read(f'({eocd}) + 11', 2)}"
            f" ELSE CAST(-1 AS BIGINT) END"
        ).alias("n_entries_eocd"),
        F.expr(
            f"CASE WHEN {eocd_sig} THEN {le_read(f'({eocd}) + 17', 4)}"
            f" ELSE CAST(-1 AS BIGINT) END"
        ).alias("cd_offset"),
        F.octet_length(b).cast("long").alias("archive_bytes"),
    )


@query(
    "multimodal_zip_index",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_ZIP_DOCS}),
mem AS (
  SELECT ids.doc_id, g.m,
         60 + (ids.doc_id * 53 + g.m * 77) % 140 AS sz,
         10 + len(CAST(ids.doc_id AS VARCHAR)) AS nlen
  FROM ids, LATERAL (SELECT unnest(generate_series(0, {_ZIP_MEMBERS - 1})) AS m) g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(sz) AS BIGINT) AS total_uncompressed,
       CAST(SUM(nlen) AS BIGINT) AS sum_name_chars,
       CAST(COUNT(*) AS BIGINT) AS n_crc_valid,
       CAST({_ZIP_MEMBERS} AS BIGINT) AS n_entries_eocd,
       CAST(SUM(30 + nlen + sz) AS BIGINT) AS cd_offset,
       CAST(SUM(30 + nlen + sz) + SUM(46 + nlen) + 22 AS BIGINT)
         AS archive_bytes
FROM mem GROUP BY doc_id
""",
    category="multimodal",
)
def multimodal_zip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive indexing — the EIGHTH wire format (ZIP, and the first
    LITTLE-ENDIAN one; WAV/BMP/PNG/AVI/MP4/TAR/GIF came before):
    real stored-method ZIPs (correct LE fields, REAL CRC-32s, full
    central directory, end-of-central-directory record) are
    synthesized as binary cells, then the member table is re-derived
    from the BYTES ALONE by ``zip_index`` — a structural walk where
    each next offset comes from the previous member's parsed LE
    size/name-length fields, every member's CRC-32 is RECOMPUTED
    over the stored bytes against the header field, and the EOCD
    record at the opposite end of the file independently confirms
    the entry count and central-directory offset (n_crc_valid ==
    n_members == n_entries_eocd is the three-way self-
    authentication; a mis-walk or endianness slip zeroes it).  The
    oracle knows only the generator formulas.  Pure JVM codegen,
    zero Exchange, zero Python."""
    synth = _synth_zips(table(spark, sf_dir, "documents"))
    return zip_index(synth, "doc_id", "zipf")


_WARC_DOCS = 40
_WARC_RECORDS = 3
_WARC_PATTERN = "abcdefghijklmnopqrstuvwxyz" * 12  # 312 chars


def _warc_len_sql(d: str, r: str) -> str:
    return f"(50 + ({d} * 31 + {r} * 17) % 200)"


@query(
    "multimodal_warc_parse",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_WARC_DOCS}),
recs AS (
  SELECT ids.doc_id, g.r,
         {_warc_len_sql('ids.doc_id', 'g.r')} AS cl,
         1 + (ids.doc_id + g.r) % 26 AS pstart
  FROM ids, LATERAL (SELECT unnest(generate_series(0, {_WARC_RECORDS - 1}))
                     AS r) g
),
built AS (
  SELECT doc_id, r, cl,
         CAST(doc_id AS VARCHAR) || '-' || CAST(r AS VARCHAR) AS rid,
         substring('{_WARC_PATTERN}', pstart, 1) AS head_char,
         substring('{_WARC_PATTERN}', pstart + cl - 1, 1) AS tail_char,
         length('WARC/1.0' || chr(13) || chr(10)
                || 'WARC-Type: response' || chr(13) || chr(10)
                || 'WARC-Record-ID: <urn:uuid:'
                || CAST(doc_id AS VARCHAR) || '-' || CAST(r AS VARCHAR)
                || '>' || chr(13) || chr(10)
                || 'Content-Length: ' || CAST(cl AS VARCHAR)
                || chr(13) || chr(10) || chr(13) || chr(10))
           + cl + 4 AS rec_len
  FROM recs
),
offs AS (
  SELECT *,
         1 + COALESCE(SUM(rec_len) OVER (PARTITION BY doc_id ORDER BY r
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS rec_offset,
         SUM(rec_len) OVER (PARTITION BY doc_id) AS file_bytes
  FROM built
)
SELECT doc_id, CAST(r AS BIGINT) AS rec, rid,
       CAST(cl AS BIGINT) AS content_length,
       CAST(rec_offset AS BIGINT) AS rec_offset,
       head_char, tail_char,
       CAST(file_bytes AS BIGINT) AS file_bytes
FROM offs
""",
    category="multimodal",
)
def multimodal_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 record walk — the wire format of web-crawl corpora
    (Common Crawl), the ninth from-spec structural parser: each doc
    synthesizes a deterministic 3-record WARC file (response records
    with WARC-Record-ID and Content-Length headers, CRLF framing,
    double-CRLF terminators), and the parser walks it the way a WARC
    reader must — locate the header/payload boundary, regexp the
    Content-Length out of the HEADER BYTES, slice exactly that many
    payload bytes, and let the PARSED length drive the next record's
    offset (the tar lesson: offsets must come from the parse, not
    the generative law). Emitted per record: the parsed record id,
    content length, byte offset, first/last payload chars — all
    recomputed independently by the oracle from the generative law
    with a window cumsum for offsets. Pure JVM codegen: concat /
    locate / regexp_extract / substring, no UDF, no shuffle beyond
    the final posexplode projection."""
    crlf = "\r\n"
    ids = table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _WARC_DOCS
    ).select("doc_id")

    def rec_expr(r: int) -> str:
        cl = _warc_len_sql("doc_id", str(r))
        pstart = f"(1 + (doc_id + {r}) % 26)"
        return (
            f"concat('WARC/1.0', '{crlf}', 'WARC-Type: response', '{crlf}',"
            f" 'WARC-Record-ID: <urn:uuid:', CAST(doc_id AS STRING), '-{r}>',"
            f" '{crlf}', 'Content-Length: ', CAST({cl} AS STRING),"
            f" '{crlf}', '{crlf}',"
            f" substring('{_WARC_PATTERN}', {pstart}, {cl}),"
            f" '{crlf}', '{crlf}')"
        )

    f = ids.select(
        "doc_id",
        F.expr(
            "concat(" + ", ".join(rec_expr(r) for r in range(_WARC_RECORDS)) + ")"
        ).alias("file"),
    )
    # structural walk: each record's offset comes from the previous
    # record's PARSED Content-Length
    cur = f.withColumn("o_0", F.lit(1))
    for r in range(_WARC_RECORDS):
        cur = (
            cur.withColumn(f"he_{r}", F.expr(f"locate('{crlf}{crlf}', file, o_{r})"))
            .withColumn(
                f"hdr_{r}", F.expr(f"substring(file, o_{r}, he_{r} - o_{r})")
            )
            .withColumn(
                f"cl_{r}",
                F.expr(
                    f"CAST(regexp_extract(hdr_{r},"
                    f" 'Content-Length: ([0-9]+)', 1) AS INT)"
                ),
            )
            .withColumn(
                f"rid_{r}",
                F.expr(
                    f"regexp_extract(hdr_{r},"
                    f" 'WARC-Record-ID: <urn:uuid:([0-9-]+)>', 1)"
                ),
            )
            .withColumn(
                f"pay_{r}", F.expr(f"substring(file, he_{r} + 4, cl_{r})")
            )
            .withColumn(f"o_{r + 1}", F.expr(f"he_{r} + 4 + cl_{r} + 4"))
        )
    per_rec = cur.select(
        "doc_id",
        F.length("file").cast("long").alias("file_bytes"),
        F.posexplode(
            F.array(
                *[
                    F.struct(
                        F.col(f"rid_{r}").alias("rid"),
                        F.col(f"cl_{r}").cast("long").alias("content_length"),
                        F.col(f"o_{r}").cast("long").alias("rec_offset"),
                        F.substring(F.col(f"pay_{r}"), 1, 1).alias("head_char"),
                        F.expr(f"substring(pay_{r}, cl_{r}, 1)").alias(
                            "tail_char"
                        ),
                    )
                    for r in range(_WARC_RECORDS)
                ]
            )
        ).alias("rec", "s"),
    )
    return per_rec.select(
        "doc_id",
        F.col("rec").cast("long").alias("rec"),
        F.col("s.rid").alias("rid"),
        F.col("s.content_length").alias("content_length"),
        F.col("s.rec_offset").alias("rec_offset"),
        F.col("s.head_char").alias("head_char"),
        F.col("s.tail_char").alias("tail_char"),
        "file_bytes",
    )


_ICO_DOCS = 40
_ICO_ENTRIES = 3


@query(
    "multimodal_ico_parse",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_ICO_DOCS}),
ent AS (
  SELECT ids.doc_id, g.m,
         CAST(16 * (1 << g.m) AS BIGINT) AS dim,
         CAST(40 + (ids.doc_id * 19 + g.m * 23) % 100 AS BIGINT) AS sz
  FROM ids, LATERAL (SELECT unnest(generate_series(0, {_ICO_ENTRIES - 1}))
                     AS m) g
),
offs AS (
  SELECT *,
         6 + 16 * {_ICO_ENTRIES}
           + COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY m
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS off,
         6 + 16 * {_ICO_ENTRIES} + SUM(sz) OVER (PARTITION BY doc_id)
           AS file_bytes
  FROM ent
),
bytes AS (
  SELECT offs.doc_id, offs.m,
         CAST(SUM((offs.doc_id + offs.m + j.j) % 256) AS BIGINT) AS bsum
  FROM offs, LATERAL (
    SELECT unnest(generate_series(0, CAST(offs.sz - 1 AS INT))) AS j) j
  GROUP BY offs.doc_id, offs.m
)
SELECT offs.doc_id, CAST(offs.m AS BIGINT) AS entry,
       offs.dim AS width, offs.dim AS height,
       CAST(1 AS BIGINT) AS planes, CAST(32 AS BIGINT) AS bpp,
       offs.sz AS bytes_in_res, CAST(offs.off AS BIGINT) AS img_offset,
       bytes.bsum AS img_byte_sum,
       CAST(offs.file_bytes AS BIGINT) AS file_bytes,
       TRUE AS chain_ok
FROM offs JOIN bytes ON bytes.doc_id = offs.doc_id AND bytes.m = offs.m
""",
    category="multimodal",
)
def multimodal_ico_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICO icon-container walk — the TENTH from-spec wire format
    (and the second little-endian one after ZIP): real .ico files
    (ICONDIR: reserved 0 / type 1 / count, then 16-byte
    ICONDIRENTRYs with LE u16 planes/bpp and LE u32 size/offset,
    then the image blobs) are synthesized as hex strings per doc,
    and the entry table is re-derived from the BYTES ALONE — count
    parsed from the header drives the directory walk, each entry's
    parsed LE size/offset locate its image blob, the blob's byte sum
    is recomputed FROM THE PARSED OFFSET (a mis-walk or an
    endianness slip lands the checksum in the wrong bytes), and
    chain_ok verifies offset_m + size_m == offset_{{m+1}} (the last
    against the parsed file end). The oracle knows only the
    generator formulas. Pure JVM codegen: hex/substring/conv chains,
    no UDF, no shuffle beyond the final projection."""
    ids = table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _ICO_DOCS
    ).select("doc_id")

    def size_sql(m: int) -> str:
        return f"CAST(40 + (doc_id * 19 + {m} * 23) % 100 AS BIGINT)"

    def le16(v: str) -> str:
        # little-endian u16 as 4 hex chars
        return (
            f"concat(lpad(hex(({v}) % 256), 2, '0'),"
            f" lpad(hex(({v}) DIV 256), 2, '0'))"
        )

    def le32(v: str) -> str:
        return (
            f"concat(lpad(hex(({v}) % 256), 2, '0'),"
            f" lpad(hex((({v}) DIV 256) % 256), 2, '0'),"
            f" lpad(hex((({v}) DIV 65536) % 256), 2, '0'),"
            f" lpad(hex((({v}) DIV 16777216) % 256), 2, '0'))"
        )

    def off_sql(m: int) -> str:
        base = f"{6 + 16 * _ICO_ENTRIES}"
        prior = " + ".join([size_sql(k) for k in range(m)]) or "0"
        return f"({base} + {prior})"

    def entry_hex(m: int) -> str:
        dim = 16 << m
        return (
            f"concat(lpad(hex({dim % 256}), 2, '0'),"  # width (u8)
            f" lpad(hex({dim % 256}), 2, '0'),"  # height (u8)
            f" '00', '00',"  # colorCount, reserved
            f" {le16('1')}, {le16('32')},"  # planes, bpp
            f" {le32(size_sql(m))}, {le32(off_sql(m))})"
        )

    def blob_hex(m: int) -> str:
        return (
            f"array_join(transform(sequence(0, CAST({size_sql(m)} - 1 AS INT)),"
            f" j -> lpad(hex((doc_id + {m} + CAST(j AS BIGINT)) % 256), 2,"
            f" '0')), '')"
        )

    hexf = (
        "concat('0000', '0100', "
        + le16(str(_ICO_ENTRIES))
        + ", "
        + ", ".join(entry_hex(m) for m in range(_ICO_ENTRIES))
        + ", "
        + ", ".join(blob_hex(m) for m in range(_ICO_ENTRIES))
        + ")"
    )
    f = ids.select("doc_id", F.expr(hexf).alias("hexf")).localCheckpoint(
        eager=True
    )

    # --- parse from bytes alone ---
    def rd_u8(byte_off: str) -> str:
        return f"CAST(conv(substring(hexf, 2 * ({byte_off}) + 1, 2), 16, 10) AS BIGINT)"

    def rd_le16(byte_off: str) -> str:
        return (
            f"CAST(conv(concat(substring(hexf, 2 * ({byte_off}) + 3, 2),"
            f" substring(hexf, 2 * ({byte_off}) + 1, 2)), 16, 10) AS BIGINT)"
        )

    def rd_le32(byte_off: str) -> str:
        return (
            f"CAST(conv(concat("
            f"substring(hexf, 2 * ({byte_off}) + 7, 2),"
            f" substring(hexf, 2 * ({byte_off}) + 5, 2),"
            f" substring(hexf, 2 * ({byte_off}) + 3, 2),"
            f" substring(hexf, 2 * ({byte_off}) + 1, 2)), 16, 10) AS BIGINT)"
        )

    p = f.select(
        "doc_id",
        "hexf",
        F.expr(rd_le16("4")).alias("count_parsed"),
        (F.length("hexf") / 2).cast("long").alias("file_bytes"),
    )
    entries = []
    for m in range(_ICO_ENTRIES):
        base = str(6 + 16 * m)
        sz = rd_le32(f"{6 + 16 * m + 8}")
        off = rd_le32(f"{6 + 16 * m + 12}")
        bsum = (
            f"aggregate(sequence(0, CAST(({sz}) - 1 AS INT)), 0L,"
            f" (acc, j) -> acc + CAST(conv(substring(hexf,"
            f" 2 * (({off}) + j) + 1, 2), 16, 10) AS BIGINT))"
        )
        nxt_off = (
            rd_le32(f"{6 + 16 * (m + 1) + 12}")
            if m + 1 < _ICO_ENTRIES
            else "CAST(length(hexf) DIV 2 AS BIGINT)"
        )
        entries.append(
            F.struct(
                F.expr(rd_u8(base)).alias("width"),
                F.expr(rd_u8(f"{6 + 16 * m + 1}")).alias("height"),
                F.expr(rd_le16(f"{6 + 16 * m + 4}")).alias("planes"),
                F.expr(rd_le16(f"{6 + 16 * m + 6}")).alias("bpp"),
                F.expr(sz).alias("bytes_in_res"),
                F.expr(off).alias("img_offset"),
                F.expr(bsum).alias("img_byte_sum"),
                F.expr(f"({off}) + ({sz}) = {nxt_off}").alias("chain_ok"),
            )
        )
    per = p.select(
        "doc_id",
        "file_bytes",
        "count_parsed",
        F.posexplode(F.array(*entries)).alias("entry", "s"),
    )
    return per.select(
        "doc_id",
        F.col("entry").cast("long").alias("entry"),
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        F.col("s.planes").alias("planes"),
        F.col("s.bpp").alias("bpp"),
        F.col("s.bytes_in_res").alias("bytes_in_res"),
        F.col("s.img_offset").alias("img_offset"),
        F.col("s.img_byte_sum").alias("img_byte_sum"),
        "file_bytes",
        F.col("s.chain_ok").alias("chain_ok"),
    )


# ------------------------------------------------------------------ #
# r10 wave 8: JPEG marker-segment walk (11th wire format) and TIFF
# IFD walk (12th — BOTH endiannesses in one format)
# ------------------------------------------------------------------ #

_JPEG_DOCS = 30


@query(
    "multimodal_jpeg_parse",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_JPEG_DOCS}),
g AS (
  SELECT doc_id,
         CAST(10 + doc_id % 20 AS BIGINT) AS comment_len,
         CAST(100 + doc_id % 400 AS BIGINT) AS height,
         CAST(200 + doc_id % 300 AS BIGINT) AS width,
         CAST(30 + doc_id % 40 AS BIGINT) AS entropy_bytes
  FROM ids
),
es AS (
  SELECT g.doc_id,
         CAST(SUM((g.doc_id * 3 + j.j) % 255) AS BIGINT) AS entropy_sum
  FROM g, LATERAL (SELECT unnest(generate_series(0,
                    CAST(g.entropy_bytes - 1 AS INT))) AS j) j
  GROUP BY g.doc_id
)
SELECT g.doc_id, g.height, g.width,
       CAST(8 AS BIGINT) AS precision_bits,
       CAST(3 AS BIGINT) AS n_components,
       g.comment_len, g.entropy_bytes, es.entropy_sum,
       CAST(2 + (2 + 16) + (2 + 2 + g.comment_len) + (2 + 17)
            + (2 + 12) + g.entropy_bytes + 2 AS BIGINT) AS file_bytes,
       TRUE AS markers_ok
FROM g JOIN es ON es.doc_id = g.doc_id
""",
    category="multimodal",
)
def multimodal_jpeg_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG/JFIF marker-segment walk — the ELEVENTH from-spec wire
    format: real SOI + APP0(JFIF) + COM + SOF0 + SOS + entropy data
    + EOI streams are synthesized per doc (variable-length COM and
    entropy segments; entropy bytes drawn mod 255 so 0xFF stuffing
    never arises), and everything is re-derived from the BYTES
    ALONE: each segment's big-endian length field drives the hop to
    the next marker (a mis-read length derails every downstream
    offset), frame dimensions/precision/component count come out of
    the SOF0 found by the walk, the entropy byte sum is recomputed
    from the SOS-derived start, and markers_ok certifies all four
    expected markers plus SOI/EOI framing.  The hop chain rides as
    chained columns (o1 -> l1 -> o2 -> ...) so codegen sees linear
    expressions.  Pure hex/conv arithmetic, no UDF; one row per
    container."""
    ids = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _JPEG_DOCS)
        .select("doc_id")
    )

    def be16(v: str) -> str:
        return f"lpad(hex({v}), 4, '0')"

    cl = "(10 + doc_id % 20)"
    h = "(100 + doc_id % 400)"
    w = "(200 + doc_id % 300)"
    en = "(30 + doc_id % 40)"
    com_hex = (
        f"array_join(transform(sequence(0, CAST({cl} - 1 AS INT)),"
        f" j -> lpad(hex((doc_id + CAST(j AS BIGINT)) % 255), 2, '0')), '')"
    )
    ent_hex = (
        f"array_join(transform(sequence(0, CAST({en} - 1 AS INT)),"
        f" j -> lpad(hex((doc_id * 3 + CAST(j AS BIGINT)) % 255), 2, '0')),"
        f" '')"
    )
    hexf = (
        "concat('FFD8',"
        f" 'FFE0', {be16('16')}, '4A46494600', '0102', '00',"
        " '0048', '0048', '00', '00',"
        f" 'FFFE', {be16(f'{cl} + 2')}, {com_hex},"
        f" 'FFC0', {be16('17')}, '08', {be16(h)}, {be16(w)}, '03',"
        " '011100', '021101', '031101',"
        f" 'FFDA', {be16('12')}, '03', '010002110311', '003F00',"
        f" {ent_hex}, 'FFD9')"
    )
    f = ids.select("doc_id", F.expr(hexf).alias("hexf")).localCheckpoint(
        eager=True
    )

    def rd8(off: str) -> str:
        return (
            f"CAST(conv(substring(hexf, 2 * ({off}) + 1, 2), 16, 10)"
            " AS BIGINT)"
        )

    def rd16(off: str) -> str:
        return (
            f"CAST(conv(substring(hexf, 2 * ({off}) + 1, 4), 16, 10)"
            " AS BIGINT)"
        )

    def mk(off: str) -> str:  # marker hex at byte offset
        return f"substring(hexf, 2 * ({off}) + 1, 4)"

    p = f.withColumn("file_bytes", (F.length("hexf") / 2).cast("long"))
    p = p.withColumn("o1", F.lit(2).cast("long"))
    p = p.withColumn("l1", F.expr(rd16("o1 + 2")))
    p = p.withColumn("o2", F.col("o1") + 2 + F.col("l1"))
    p = p.withColumn("l2", F.expr(rd16("o2 + 2")))
    p = p.withColumn("o3", F.col("o2") + 2 + F.col("l2"))
    p = p.withColumn("l3", F.expr(rd16("o3 + 2")))
    p = p.withColumn("o4", F.col("o3") + 2 + F.col("l3"))
    p = p.withColumn("l4", F.expr(rd16("o4 + 2")))
    p = p.withColumn("ent_start", F.col("o4") + 2 + F.col("l4"))
    p = p.withColumn(
        "entropy_bytes", F.col("file_bytes") - F.col("ent_start") - 2
    )
    p = p.withColumn(
        "entropy_sum",
        F.expr(
            "aggregate(sequence(0, CAST(entropy_bytes - 1 AS INT)), 0L,"
            " (acc, j) -> acc + CAST(conv(substring(hexf,"
            " 2 * (ent_start + j) + 1, 2), 16, 10) AS BIGINT))"
        ),
    )
    markers_ok = F.expr(
        f"substring(hexf, 1, 4) = 'FFD8' AND {mk('o1')} = 'FFE0'"
        f" AND {mk('o2')} = 'FFFE' AND {mk('o3')} = 'FFC0'"
        f" AND {mk('o4')} = 'FFDA'"
        " AND substring(hexf, length(hexf) - 3, 4) = 'FFD9'"
    )
    return p.select(
        "doc_id",
        F.expr(rd16("o3 + 5")).alias("height"),
        F.expr(rd16("o3 + 7")).alias("width"),
        F.expr(rd8("o3 + 4")).alias("precision_bits"),
        F.expr(rd8("o3 + 9")).alias("n_components"),
        (F.col("l2") - 2).cast("long").alias("comment_len"),
        F.col("entropy_bytes").cast("long").alias("entropy_bytes"),
        F.col("entropy_sum").alias("entropy_sum"),
        "file_bytes",
        markers_ok.alias("markers_ok"),
    )


_TIFF_DOCS = 40
_TIFF_TAGS = (256, 257, 273, 279)  # width, height, strip off, strip bytes
_TIFF_STRIP_OFF = 8 + 2 + 4 * 12 + 4  # header + count + entries + next-IFD


@query(
    "multimodal_tiff_parse",
    oracle=f"""
WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < {_TIFF_DOCS}),
g AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
         CAST(64 + doc_id % 100 AS BIGINT) AS width,
         CAST(32 + doc_id % 50 AS BIGINT) AS height,
         CAST(50 + doc_id % 60 AS BIGINT) AS strip_bytes
  FROM ids
),
ss AS (
  SELECT g.doc_id,
         CAST(SUM((g.doc_id * 7 + j.j) % 256) AS BIGINT) AS strip_sum
  FROM g, LATERAL (SELECT unnest(generate_series(0,
                    CAST(g.strip_bytes - 1 AS INT))) AS j) j
  GROUP BY g.doc_id
)
SELECT g.doc_id, g.byte_order,
       CAST(42 AS BIGINT) AS magic,
       CAST(4 AS BIGINT) AS ifd_entries,
       g.width, g.height,
       CAST({_TIFF_STRIP_OFF} AS BIGINT) AS strip_offset,
       g.strip_bytes, ss.strip_sum,
       CAST(0 AS BIGINT) AS next_ifd,
       TRUE AS header_ok
FROM g JOIN ss ON ss.doc_id = g.doc_id
""",
    category="multimodal",
)
def multimodal_tiff_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF IFD walk — the TWELFTH from-spec wire format and the
    first to carry BOTH byte orders in one dataset: even docs are
    little-endian ('II'), odd docs big-endian ('MM'), so every
    multi-byte read in the parser BRANCHES ON THE PARSED ORDER FLAG
    — the defining TIFF hazard (readers that assume one order parse
    garbage dimensions on half the files).  Real structure: order
    flag + magic 42 + IFD pointer, a 4-entry IFD (ImageWidth,
    ImageLength, StripOffsets, StripByteCounts as LONG tags, tag ids
    ascending per spec) + next-IFD 0, then the strip bytes.  The
    parser re-derives the IFD location from the parsed pointer,
    matches tags by parsed id (not position assumptions), recomputes
    the strip byte sum from the parsed StripOffsets/ByteCounts, and
    header_ok certifies flag/magic/tag-order/next-IFD.  One hex map
    per doc, chained-column hops, zero UDFs."""
    ids = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _TIFF_DOCS)
        .select("doc_id")
    )
    w = "(64 + doc_id % 100)"
    h = "(32 + doc_id % 50)"
    sb = "(50 + doc_id % 60)"

    def num(v: str, nbytes: int) -> str:
        """Hex of `v` in the doc's byte order (doc_id parity)."""
        be = f"lpad(hex({v}), {2 * nbytes}, '0')"
        le_parts = ", ".join(
            f"lpad(hex(({v}) DIV {256 ** k} % 256), 2, '0')"
            for k in range(nbytes)
        )
        return f"IF(doc_id % 2 = 0, concat({le_parts}), {be})"

    def entry(tag: int, val: str) -> str:
        return (
            f"concat({num(str(tag), 2)}, {num('4', 2)},"
            f" {num('1', 4)}, {num(val, 4)})"
        )

    strip_hex = (
        f"array_join(transform(sequence(0, CAST({sb} - 1 AS INT)),"
        f" j -> lpad(hex((doc_id * 7 + CAST(j AS BIGINT)) % 256), 2, '0')),"
        f" '')"
    )
    hexf = (
        "concat(IF(doc_id % 2 = 0, '4949', '4D4D'),"
        f" {num('42', 2)}, {num('8', 4)},"
        f" {num('4', 2)},"
        f" {entry(256, w)}, {entry(257, h)},"
        f" {entry(273, str(_TIFF_STRIP_OFF))}, {entry(279, sb)},"
        f" {num('0', 4)}, {strip_hex})"
    )
    f = ids.select("doc_id", F.expr(hexf).alias("hexf")).localCheckpoint(
        eager=True
    )

    # --- parse from bytes alone: every read branches on the flag ---
    flag = "substring(hexf, 1, 4)"

    def rd(off: str, nbytes: int) -> str:
        be = f"substring(hexf, 2 * ({off}) + 1, {2 * nbytes})"
        le = "concat(" + ", ".join(
            f"substring(hexf, 2 * ({off}) + {2 * (nbytes - 1 - k) + 1}, 2)"
            for k in range(nbytes)
        ) + ")"
        return (
            f"CAST(conv(IF({flag} = '4949', {le}, {be}), 16, 10) AS BIGINT)"
        )

    p = f.withColumn(
        "byte_order",
        F.expr(f"IF({flag} = '4949', 'II', 'MM')"),
    )
    p = p.withColumn("magic", F.expr(rd("2", 2)))
    p = p.withColumn("ifd_off", F.expr(rd("4", 4)))
    p = p.withColumn("n_entries", F.expr(rd("ifd_off", 2)))

    def tag_val(tag: int) -> str:
        """Value of the IFD entry whose PARSED tag id matches."""
        cases = " ".join(
            f"WHEN {rd(f'ifd_off + 2 + 12 * {m}', 2)} = {tag}"
            f" THEN {rd(f'ifd_off + 2 + 12 * {m} + 8', 4)}"
            for m in range(4)
        )
        return f"CASE {cases} END"

    p = (
        p.withColumn("width", F.expr(tag_val(256)))
        .withColumn("height", F.expr(tag_val(257)))
        .withColumn("strip_offset", F.expr(tag_val(273)))
        .withColumn("strip_bytes", F.expr(tag_val(279)))
        .withColumn("next_ifd", F.expr(rd("ifd_off + 2 + 12 * 4", 4)))
    )
    p = p.withColumn(
        "strip_sum",
        F.expr(
            "aggregate(sequence(0, CAST(strip_bytes - 1 AS INT)), 0L,"
            " (acc, j) -> acc + CAST(conv(substring(hexf,"
            " 2 * (strip_offset + j) + 1, 2), 16, 10) AS BIGINT))"
        ),
    )
    tags_ascending = " AND ".join(
        f"({rd(f'ifd_off + 2 + 12 * {m}', 2)})"
        f" < ({rd(f'ifd_off + 2 + 12 * {m + 1}', 2)})"
        for m in range(3)
    )
    header_ok = F.expr(
        f"({flag} = '4949' OR {flag} = '4D4D') AND magic = 42"
        f" AND next_ifd = 0 AND {tags_ascending}"
        " AND strip_offset + strip_bytes = length(hexf) DIV 2"
    )
    return p.select(
        "doc_id",
        "byte_order",
        "magic",
        F.col("n_entries").alias("ifd_entries"),
        "width",
        "height",
        "strip_offset",
        "strip_bytes",
        "strip_sum",
        "next_ifd",
        header_ok.alias("header_ok"),
    )
