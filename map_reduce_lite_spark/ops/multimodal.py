"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns + typed metadata structs; all heavy
per-item work (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` so a 100 TB corpus streams through Python
in columnar batches with zero driver involvement. The decode kernels
themselves are STUBS here (no image/audio libs in this container):
``decode_image_stub`` produces a deterministic fake decode so the
Spark-side plumbing — schema, batch iteration, partition sizing — is
real and tested end-to-end; swap `_fake_decode` for PIL/librosa in a
real deployment.

Scale notes: binary payloads make row-group sizing the dominant knob —
keep ``spark.sql.files.maxPartitionBytes`` at/below 128 MB so a task's
Arrow batches fit executor memory; never groupBy a binary column
(fingerprint first: text.doc_fingerprint / registry.md5_60bit).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from map_reduce_lite_spark.registry import Query, md5_60bit, sql_md5_60bit
from map_reduce_lite_spark.relational.tables import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table from documents: the utf-8 bytes of
    text stand in for an encoded payload (schema-faithful plumbing)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image_stub(media: DataFrame, batch_hint: int = 0) -> DataFrame:
    """mapInPandas decode pipeline (the real-deployment shape).

    NOTE: a production decoder raises NotImplementedError on payloads it
    cannot parse; the stub accepts everything deterministically.

    The batch function is fully self-contained (no references to this
    module) so cloudpickle ships it by VALUE — executor Python workers
    do not have the engine package on sys.path when the driver runs
    from outside the repo."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_decode(payload):
            # deterministic stand-in for a real decoder: 4 moments of
            # the byte histogram; swap for PIL/librosa + model features
            if payload is None:
                return []
            n = len(payload)
            if n == 0:
                return [0.0, 0.0, 0.0, 0.0]
            s = sum(payload)
            mean = s / n
            var = sum((b - mean) ** 2 for b in payload) / n
            return [float(n), float(s), mean, var]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "mime": pdf["meta"].map(lambda m: m["mime"] if m is not None else None),
                    "feature": pdf["payload"].map(fake_decode),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end plumbing demo: synth media → Arrow-batched decode."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    decoded = decode_image_stub(media)
    return decoded.select(
        "media_id",
        "n_bytes",
        "mime",
        F.floor(F.element_at("feature", 3) * 1e6).cast("long").alias("mean_byte_e6"),
    )


def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM binary-column metrics (no Python) — the oracle-checkable
    core of the multimodal plumbing."""
    media = synthesize_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
    )


MULTIMODAL_BYTES_SQL = """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       'application/octet-stream' AS mime
FROM documents
"""


FRAME_LEN = 256  # chars per sampled "frame"
FRAME_STRIDE = 1024  # sample one frame every this many chars

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("n_chars", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("thumb_md5", T.StringType(), True),
    ]
)


def sample_frames_stub(documents: DataFrame) -> DataFrame:
    """Video-style frame sampling as 1→N mapInPandas: one ``FRAME_LEN``
    "frame" every ``FRAME_STRIDE`` units of the stream.

    The fake decoder treats the document text as the stream (chars ≈
    presentation timestamps) so the operator is fully deterministic and
    the DuckDB oracle can replay it with substring math — a FULL
    value-level correctness check on a Python batch operator, not just
    a rows-only smoke. Real deployment: swap the slicing for
    pyav/ffmpeg keyframe extraction; the 1→N batch shape, schema and
    partition behavior are exactly this."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        flen, stride = 256, 1024  # keep in sync with FRAME_LEN/FRAME_STRIDE
        for pdf in batches:
            mids, idxs, lens, md5s = [], [], [], []
            for mid, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(text) == 0:
                    continue
                n_frames = (len(text) + stride - 1) // stride
                for i in range(n_frames):
                    chunk = text[i * stride : i * stride + flen]
                    mids.append(mid)
                    idxs.append(i)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield _pd.DataFrame(
                {
                    "media_id": _pd.Series(mids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int32"),
                    "n_chars": _pd.Series(lens, dtype="int64"),
                    "frame_md5": _pd.Series(md5s, dtype="object"),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        frame_batches, schema=FRAMES_SCHEMA
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames_stub(load_table(spark, sf_dir, "documents"))


FRAME_SAMPLE_SQL = f"""
WITH frames AS (
  SELECT doc_id AS media_id, i.f AS frame_idx,
         substring(text, 1 + i.f * {FRAME_STRIDE}, {FRAME_LEN}) AS chunk
  FROM documents,
       LATERAL unnest(generate_series(0,
         CAST((length(text) - 1) // {FRAME_STRIDE} AS INT))) AS i(f)
  WHERE length(text) > 0
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(length(chunk) AS BIGINT) AS n_chars, md5(chunk) AS frame_md5
FROM frames
"""


def resize_image_stub(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Image-resize plumbing: Arrow-batched mapInPandas, deterministic
    fake kernel (dimensions derived from payload size, thumb hash of the
    payload head). Swap the kernel for PIL ``Image.thumbnail`` in a real
    deployment — schema and batch shape are the production ones."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        import pandas as _pd

        side = max_side

        def fake_resize(payload):
            if payload is None or len(payload) == 0:
                return None, None, None
            n = len(payload)
            w = max(1, int(math.isqrt(n)))
            h = (n + w - 1) // w
            scale = min(1.0, side / max(w, h))
            return (
                max(1, int(w * scale)),
                max(1, int(h * scale)),
                hashlib.md5(bytes(payload[:64])).hexdigest(),
            )

        for pdf in batches:
            out = [fake_resize(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": _pd.Series([o[0] for o in out], dtype="Int32"),
                    "height": _pd.Series([o[1] for o in out], dtype="Int32"),
                    "thumb_md5": _pd.Series([o[2] for o in out], dtype="object"),
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end: synthetic media → Arrow-batched
    mapInPandas thumbnail kernel (see resize_image_stub). The fake
    kernel is integer/md5 math over the payload, so DuckDB replays it
    exactly — the Python path gets a full value oracle."""
    d = load_table(spark, sf_dir, "documents")
    return resize_image_stub(synthesize_media(d))


# Oracle for the fake resize kernel. Exactness notes: math.isqrt(n) ==
# floor(sqrt(CAST(n AS DOUBLE))) for n ≤ 2^52 (doc payloads are KB);
# Python's int(w * scale) truncates toward zero == floor for positive
# doubles, and w*scale is the same IEEE double product both sides; the
# corpus is ASCII so md5 of the first 64 payload BYTES == md5 of the
# first 64 CHARS of text.
RESIZE_STUB_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n,
         md5(substr(text, 1, 64)) AS head_md5
  FROM documents
), dims AS (
  SELECT media_id, n, head_md5,
         GREATEST(1, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)) AS w
  FROM b
), full_dims AS (
  SELECT media_id, n, head_md5, w, (n + w - 1) // w AS h FROM dims
), scaled AS (
  SELECT media_id, n, head_md5, w, h,
         LEAST(1.0::DOUBLE, 64.0::DOUBLE / GREATEST(w, h)) AS scale
  FROM full_dims
)
SELECT media_id,
       CASE WHEN n = 0 THEN NULL
            ELSE CAST(GREATEST(1, CAST(floor(w * scale) AS BIGINT)) AS INT)
       END AS width,
       CASE WHEN n = 0 THEN NULL
            ELSE CAST(GREATEST(1, CAST(floor(h * scale) AS BIGINT)) AS INT)
       END AS height,
       CASE WHEN n = 0 THEN NULL ELSE head_md5 END AS thumb_md5
FROM scaled
"""


# The fake decoder's features are pure byte math over the UTF-8 payload,
# so DuckDB can replay it with per-char ord() sums (corpus is ASCII, so
# char code == byte value and octet_length == length): the Python
# mapInPandas path gets a FULL value oracle, not just a rows-only check.
# Python's s/n and the SQL CAST(s AS DOUBLE)/n are the same IEEE
# division → floor(mean*1e6) is bit-identical.
DECODE_STUB_SQL = """
WITH b AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n,
         list_sum(list_transform(range(1, length(text) + 1),
                                 i -> ord(substr(text, i, 1)))) AS s
  FROM documents
)
SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
       'application/octet-stream' AS mime,
       CAST(floor((CAST(s AS DOUBLE) / n) * 1e6) AS BIGINT) AS mean_byte_e6
FROM b
"""


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-dedup pipeline shape: normalize → perceptual hash → group.

    A production image deduper decodes, downscales to a canonical
    grid, and hashes the result so re-encoded/resized copies collide;
    here the normalize step's stand-in is lowercase + whitespace-
    collapse of the payload bytes (no codecs in this container), the
    hash is the engine's portable 60-bit md5, and the grouping is the
    real thing: groupBy on the 8-byte hash (NEVER on the binary column
    itself — the module-doc rule), emitting every group with its copy
    count and the canonical (minimum) media_id a curation pass would
    keep (the n_copies >= 2 slice is the duplicate set; singletons stay
    so the output is the full keep-table, non-vacuous at any SF).

    Scale shape: one map pass (normalize + hash, constant per-item
    work), one 8-byte-key groupBy with map-side combine, output
    bounded by the number of distinct GROUPS.

    The whitespace class is spelled out explicitly ([ \\t\\n\\r\\f\\x0B])
    rather than \\s because Java regex (Spark) includes vertical tab in
    \\s while RE2 (DuckDB) does not — a payload containing \\x0B would
    hash differently across engines under \\s."""
    d = load_table(spark, sf_dir, "documents")
    media = synthesize_media(d)
    norm = F.trim(
        F.regexp_replace(
            F.lower(F.decode(F.col("payload"), "UTF-8")), "[ \t\n\r\f\x0B]+", " "
        )
    )
    return (
        media.select("media_id", md5_60bit(norm).alias("phash"))
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("media_id").alias("keep_media_id"),
        )
    )


# synthesize_media's payload is encode(text, 'utf-8'), so decoding it
# back is exactly `text` — the oracle normalizes the text directly.
# explicit class, not \s: RE2's \s excludes \x0B, Java's includes it
_SQL_NORM = r"trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))"
PHASH_DEDUP_SQL = f"""
WITH hashed AS (
  SELECT doc_id AS media_id,
         {sql_md5_60bit(_SQL_NORM)}
           AS phash
  FROM documents
)
SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(media_id) AS keep_media_id
FROM hashed GROUP BY phash
"""


MULTIMODAL_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("multimodal_bytes", multimodal_bytes, MULTIMODAL_BYTES_SQL, "binary column metrics"),
        Query(
            "multimodal_phash_dedup",
            multimodal_phash_dedup,
            PHASH_DEDUP_SQL,
            "normalize→hash→group image-dedup shape over the binary payload",
        ),
        Query(
            "multimodal_decode_stub",
            multimodal_decode_stub,
            DECODE_STUB_SQL,
            "mapInPandas decode plumbing (value-checked)",
        ),
        Query(
            "multimodal_frame_sample",
            multimodal_frame_sample,
            FRAME_SAMPLE_SQL,
            "1→N frame sampling (mapInPandas, value-checked)",
        ),
        Query(
            "multimodal_resize_stub",
            multimodal_resize_stub,
            RESIZE_STUB_SQL,
            "thumbnail-resize plumbing (mapInPandas, value-checked)",
        ),
    ]
}
