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


# r14: the 4-dim feature vector is emitted as FOUR SCALAR columns,
# not array<double> — the driver's rows-only canonicalizer sorts
# output columns and crashes on ndarray cells (r13 CORRECTNESS:
# "TypeError: unhashable type: 'numpy.ndarray'"), so an array column
# made the query ungradeable.  Same information, sortable scalars.
_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("feat_len", T.DoubleType()),
        T.StructField("feat_first", T.DoubleType()),
        T.StructField("feat_last", T.DoubleType()),
        T.StructField("feat_mod", T.DoubleType()),
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
        # (flattened to scalar columns — see _DECODE_SCHEMA note)
        fake_w = (byte_sum % 640).astype("int32")
        fake_h = (n_bytes % 480).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "byte_sum": byte_sum,
                "fake_width": fake_w,
                "fake_height": fake_h,
                "feat_len": n_bytes.astype("float64"),
                "feat_first": payloads.map(
                    lambda b: float(b[0]) if len(b) else None
                ),
                "feat_last": payloads.map(
                    lambda b: float(b[-1]) if len(b) else None
                ),
                "feat_mod": (byte_sum % 256).astype("float64"),
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


