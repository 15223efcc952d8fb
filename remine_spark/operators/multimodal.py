"""Multimodal-column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked; `decode_image_real` raises
NotImplementedError unless PIL is importable) — but everything Spark-side is
real and tested: schema, binary column handling, Arrow batch shape,
partitioning, and the UDF signatures a production decoder would drop into.

Payloads here are the utf-8 bytes of ``documents.text`` (deterministic), so
the DuckDB oracle can verify the full plumbing arithmetically from
octet_length(encode(text)).

Scale notes: mapInPandas streams Arrow batches — binary payloads never
materialize on the driver; spark.sql.execution.arrow.maxRecordsPerBatch
bounds batch memory (set it so batch_bytes ≈ 64 MB for real images).
Downstream joins key on url/doc_id, not payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from remine_spark.catalog import query, table

FRAME_BYTES = 64       # stub: bytes per "video frame"
FRAME_STRIDE = 8       # sample every 8th frame


def decode_image_real(payload: bytes):
    """Real image decode — requires PIL, absent in this container. The stub
    path (`_decode_meta_batches`) mirrors its output schema exactly."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "use the deterministic stub decoder") from exc
    import io
    from PIL import Image
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return {"width": img.width, "height": img.height, "mode": img.mode}


_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("mode", T.StringType()),
])


def _decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: deterministic fake metadata from payload bytes.
    Vectorized per Arrow batch — the exact shape a real decoder plugs into."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n,
            "width": 256 + (n % 256),
            "height": 128 + (n * 7) % 256,
            "mode": "RGB",
        })


def with_payload(df: DataFrame) -> DataFrame:
    """documents → (doc_id, payload BINARY): the opaque multimodal column."""
    return df.select("doc_id", F.encode("text", "utf-8").alias("payload"))


@query("mm_decode_meta", """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           256 + (octet_length(encode(text)) % 256) AS width,
           128 + (octet_length(encode(text)) * 7) % 256 AS height,
           'RGB' AS mode
    FROM documents
""")
def mm_decode_meta(spark, sf_dir):
    """Binary decode → typed metadata via mapInPandas (Arrow batches).
    The oracle recomputes the stub's arithmetic from octet_length — the
    check covers the whole binary-column → UDF → struct path."""
    d = table(spark, sf_dir, "documents")
    return with_payload(d).mapInPandas(_decode_meta_batches, _META_SCHEMA)


_FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_sampled", T.LongType()),
    T.StructField("first_frame_off", T.LongType()),
])


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler: treat payload as FRAME_BYTES-sized frames, sample
    every FRAME_STRIDE-th; emits offsets a real demuxer would."""
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        n_frames = n_bytes // FRAME_BYTES
        n_sampled = (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_frames": n_frames,
            "n_sampled": n_sampled,
            "first_frame_off": (n_frames > 0).astype("int64") * 0,
        })


@query("mm_frame_sample", f"""
    SELECT doc_id,
           octet_length(encode(text)) // {FRAME_BYTES} AS n_frames,
           (octet_length(encode(text)) // {FRAME_BYTES} + {FRAME_STRIDE - 1})
               // {FRAME_STRIDE} AS n_sampled,
           0 AS first_frame_off
    FROM documents
""")
def mm_frame_sample(spark, sf_dir):
    """Video-style frame sampling over the opaque binary column (stub
    demuxer; real plumbing). Output is per-doc frame inventory."""
    d = table(spark, sf_dir, "documents")
    return with_payload(d).mapInPandas(_frame_sample_batches, _FRAME_SCHEMA)


_EMB_DIM = 16

_EMBED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.DoubleType())),
])


def _embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB image-embedding model: deterministic 16-dim vector from the
    payload's md5 digest — component i is byte i centered at 0
    (b_i − 127.5, a half-integer, so every dot product / squared norm is
    an EXACT multiple of 0.25 and the DuckDB oracle reproduces the cosine
    bit-for-bit: exact sums in any order, then one correctly-rounded
    sqrt + division). A real model (CLIP etc.) drops into this exact
    Arrow batch signature; at scale set arrow.maxRecordsPerBatch so one
    batch of decoded images fits the accelerator."""
    import hashlib

    for pdf in batches:
        vecs = [[float(b) - 127.5 for b in hashlib.md5(p).digest()]
                for p in pdf["payload"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"],
                            "embedding": pd.Series(vecs, dtype="object")})


@query("mm_embed_neighbors", """
    WITH e AS (
      SELECT doc_id,
             list_transform(range(0, 16),
                 i -> CAST('0x' || substr(md5(text), 2*i + 1, 2) AS BIGINT)
                      - 127.5) AS v
      FROM documents
    ),
    n AS (SELECT doc_id, v,
                 list_sum(list_transform(v, x -> x * x)) AS nn FROM e),
    s AS (
      SELECT q.doc_id AS q_id, c.doc_id AS cand_id,
             round(list_sum(list_transform(range(0, 16),
                   i -> q.v[i + 1] * c.v[i + 1])) / sqrt(q.nn * c.nn), 6)
               AS cos
      FROM n q JOIN n c ON c.doc_id <> q.doc_id
      WHERE q.doc_id < 5
    )
    SELECT q_id, cand_id, cos, rnk FROM (
      SELECT q_id, cand_id, cos,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, cand_id) AS rnk
      FROM s
    ) WHERE rnk <= 3
""")
def mm_embed_neighbors(spark, sf_dir):
    """End-to-end multimodal retrieval path: binary payload → Arrow-batched
    embedding UDF → brute-force cosine top-3 per query doc. The plumbing
    (binary column, batch shape, join + window) is the production shape;
    only the encoder is stubbed — and the stub's md5-byte arithmetic is
    SQL-expressible, so the oracle verifies the WHOLE path hash-exactly
    (the cosine is computed from exact integer-scaled sums; ranking uses
    the rounded cosine on both sides so tie order is deterministic)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    emb = with_payload(d).mapInPandas(_embed_batches, _EMBED_SCHEMA)
    v = emb.select(
        "doc_id", F.col("embedding").alias("v"),
        F.expr("aggregate(embedding, 0D, (a, x) -> a + x * x)").alias("nn"))
    q = v.filter("doc_id < 5").select(
        F.col("doc_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nn").alias("qn"))
    s = (
        v.crossJoin(F.broadcast(q))
        .filter("doc_id <> q_id")
        .select("q_id", F.col("doc_id").alias("cand_id"),
                F.round(
                    F.expr("aggregate(zip_with(qv, v, (x, y) -> x * y), "
                           "0D, (a, x) -> a + x)")
                    / F.sqrt(F.col("qn") * F.col("nn")), 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return s.withColumn("rnk", F.row_number().over(w)).filter("rnk <= 3")
