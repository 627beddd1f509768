"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata (brief-mandated; SURVEY.md §2.6 "LLM-data ops").

The container has no image/audio codecs, so the DECODE step is stubbed:
``decode_features`` uses a clearly-marked deterministic fake (byte-value
histogram) unless a real decoder is injected. Everything around it — the
schema (binary + metadata struct), Arrow batching via ``mapInPandas``,
partition-sized batches, one-row-in/many-rows-out frame sampling — is
real Spark plumbing and is tested.

Scale notes: payloads never enter a shuffle key; metadata (small) is
what joins/groupBys touch. ``mapInPandas`` processes Arrow batches of
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows so executor memory
is bounded by batch_size × payload_size.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_payload",
    "payload_metadata",
    "decode_features",
    "frame_sample",
    "resize_payload",
    "payload_byte_entropy",
    "FAKE_FEATURE_DIM",
]

FAKE_FEATURE_DIM = 16


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "application/octet-stream") -> DataFrame:
    """Materialize an opaque binary payload column + metadata struct.

    On the synthetic tables the payload is the UTF-8 encoding of a text
    column (the only bytes available in-container); in production this
    is the raw image/audio blob read from object storage. Metadata is
    computed JVM-side: byte length, sha256 content id, mime tag.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.octet_length(payload).alias("byte_len"),
            F.sha2(payload, 256).alias("content_sha256"),
            F.lit(mime).alias("mime"),
        ),
    )


def payload_metadata(df: DataFrame) -> DataFrame:
    """Flatten the metadata struct for relational consumption (what a
    catalog/manifest table would store — never the payload itself)."""
    return df.select(
        *[c for c in df.columns if c not in ("payload", "media_meta")],
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_sha256").alias("content_sha256"),
        F.col("media_meta.mime").alias("mime"),
    )


def decode_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Decode payloads to fixed-width feature vectors via
    ``mapInPandas`` (Arrow batches; only id + payload are scanned —
    column pruning keeps the batch narrow).

    ``decoder`` defaults to the deterministic fake; a real implementation
    (PIL/librosa/ffmpeg) plugs in with no change to the Spark plumbing.
    """
    if decoder is None:
        # DETERMINISTIC FAKE decoder — byte-value histogram, 16 bins,
        # L1-normalized; stands in for image decode + feature extraction
        # until real codecs plug in. No rounding: plain IEEE division is
        # bit-for-bit reproducible (the DuckDB oracle relies on this).
        # Deliberately a CLOSURE: cloudpickle serializes module-level
        # functions by reference, which breaks on executors that don't
        # have this package on PYTHONPATH (the driver's vanilla-session
        # harness); a closure ships by value.
        dim = FAKE_FEATURE_DIM

        def decoder(payload: bytes) -> list[float]:
            counts = [0] * dim
            for byte in payload:
                counts[byte % dim] += 1
            total = len(payload) or 1
            return [c / total for c in counts]

    fn = decoder
    out_schema = f"{id_col} long, features array<double>"
    narrow = df.select(id_col, payload_col)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [fn(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return narrow.mapInPandas(_decode, schema=out_schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Frame sampling shape: one input payload → ``n_frames`` output
    rows, each a contiguous byte-range "frame" with its offset and
    sha256. Models video frame extraction (the codec is the fake: real
    frame decode replaces the byte slicing only)."""
    import hashlib

    out_schema = f"{id_col} long, frame_idx int, frame_offset long, frame_len long, frame_sha256 string"
    narrow = df.select(id_col, payload_col)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[payload_col])
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    chunk = data[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    rows.append(
                        (r[id_col], i, i * step, len(chunk), hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_offset", "frame_len", "frame_sha256"])

    return narrow.mapInPandas(_sample, schema=out_schema)


def resize_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 32,
    target_h: int = 32,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize shape: payload in → resized payload + (width, height)
    out, via ``mapInPandas``. The default resizer is a DETERMINISTIC
    FAKE — nearest-neighbor byte sampling to exactly target_w*target_h
    bytes (this container ships no image codecs); a real PIL/opencv
    ``resizer(payload, w, h) -> bytes`` plugs in without touching the
    Spark plumbing. Output payload length is part of the contract and
    is what the tests pin."""
    if target_w < 1 or target_h < 1:
        raise ValueError(f"target dims must be >= 1, got {target_w}x{target_h}")

    def _fake_resize(data: bytes, w: int, h: int) -> bytes:
        n = w * h
        if not data:
            return bytes(n)
        step = len(data) / n
        return bytes(data[min(int(i * step), len(data) - 1)] for i in range(n))

    fn = resizer or _fake_resize
    out_schema = f"{id_col} long, payload binary, width int, height int"
    narrow = df.select(id_col, payload_col)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [fn(bytes(p), target_w, target_h) for p in pdf[payload_col]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return narrow.mapInPandas(_resize, schema=out_schema)


def payload_byte_entropy(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Byte-level Shannon entropy of each binary payload — the
    content-type/corruption screen a multimodal ingest runs before
    decode (near-zero entropy = padding/constant fill; ~8 bits/byte =
    already-compressed or encrypted; text sits in between). Pure
    Catalyst: positions explode map-side (bounded by payload length),
    the per-(payload, byte) histogram is an exact BIGINT aggregate
    keyed by the byte's HEX string (portable across engines — no
    binary collation in the group key), and each cell's
    (c/n)·log2(n/c) term is snapped to integer micro-bits BEFORE the
    per-doc total (the JSD/entropy determinism scheme). Output:
    (id, n_bytes, n_distinct_bytes, entropy_microbits)."""
    # Bytes are addressed through the payload's HEX string (2 chars per
    # byte) — the one byte-accessor both engines share (DuckDB has no
    # BLOB substring), and hex() is uppercase in both. The gram array
    # comes from ONE regexp_extract_all pass, not per-position
    # substring over an exploded sequence — Catalyst inlines the hex()
    # into every positional reference (the n-gram re-split trap,
    # SCALE.md round 7), turning O(len) into O(len²) per payload.
    cells = (
        df.select(F.col(id_col).alias("_id"), F.col(payload_col).alias("_p"))
        .filter(F.octet_length("_p") > 0)
        .select(
            "_id",
            F.explode(
                F.regexp_extract_all(F.hex(F.col("_p")), F.lit(".."), 0)
            ).alias("_b"),
        )
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    totals = cells.groupBy("_id").agg(F.sum("_c").cast("long").alias("_n"))
    c = F.col("_c").cast("double")
    n = F.col("_n").cast("double")
    term = F.round(c / n * F.log2(n / c) * 1000000).cast("long")
    return (
        cells.join(totals, "_id")
        .select("_id", "_n", term.alias("_t"))
        .groupBy("_id")
        .agg(
            F.max("_n").cast("long").alias("n_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_bytes"),
            F.sum("_t").cast("long").alias("entropy_microbits"),
        )
        .withColumnRenamed("_id", id_col)
    )
