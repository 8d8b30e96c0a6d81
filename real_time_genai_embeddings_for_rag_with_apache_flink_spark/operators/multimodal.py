"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas.

The reference is text-only (SURVEY.md §1.3: no binary type anywhere), so
this is pure engine surface for training-data pipelines: images/audio/
video ride along as ``binary`` columns with a metadata struct, and every
per-payload transform is a mapInPandas over Arrow batches — one
JVM→Python crossing per batch, never per row.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode step is split:
- the *plumbing* (schemas, batch iteration, partitioning, UDF signatures)
  is real and tested;
- the *codec* is pluggable: ``decode_image(real_codec=True)`` raises
  NotImplementedError until a codec backend is installed, while the
  default deterministic fake derives plausible dimensions from the bytes
  themselves (pure arithmetic on byte length, so the DuckDB oracle can
  verify the full Spark-side dataflow end to end).

At 100 TB: binary payloads dominate row size — keep them in their own
parquet column chunk (columnar pruning skips them unless selected), size
``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits in
worker memory, and never collect payload columns to the driver.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Payload + typed metadata, the multimodal row shape.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

_DECODED = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_FEATURES = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal rows: the UTF-8 text bytes stand in for an
    encoded media payload (deterministic, so tests and oracle agree);
    media_type cycles by doc_id."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
    )


def decode_media(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode payloads to (width, height, n_frames) via mapInPandas.

    The fake codec derives dimensions from byte length only (SQL-mirrored
    by the oracle); a real codec would do PIL.Image.open / ffprobe on
    ``payload`` inside the same batch loop — identical plumbing, one
    library call swapped in.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_codec:
            raise NotImplementedError(
                "no media codec in this container; install PIL/ffmpeg and "
                "replace the fake dimension derivation below"
            )
        for pdf in batches:
            n = pdf["n_bytes"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": (32 + n % 608).astype("int32"),
                    "height": (32 + (n // 7) % 608).astype("int32"),
                    "n_frames": pd.Series(
                        [1] * len(pdf), index=pdf.index, dtype="int32"
                    ).where(pdf["media_type"] != "video", (1 + n % 240).astype("int32")),
                }
            )

    return media.mapInPandas(decode, schema=_DECODED)


def sample_frames(decoded: DataFrame, stride: int = 30) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (0, stride, 2*stride, ...). Pure Catalyst explode — the frame
    *extraction* would join these indices back against the payload in a
    codec-backed mapInPandas."""
    vids = decoded.filter(F.col("media_type") == "video")
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(stride)
    )
    return vids.select(
        "doc_id", "n_frames", F.explode(idx).alias("frame_idx")
    )


def resize_media(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning: clamp the longer side to ``max_side`` preserving
    aspect ratio (integer arithmetic, so the oracle mirrors it exactly).
    A codec-backed deployment applies these target dimensions to the
    payload inside the same mapInPandas loop as decode_media."""
    w, h = F.col("width"), F.col("height")
    longer = F.greatest(w, h)
    scale_num = F.least(longer, F.lit(max_side))
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.floor(w * scale_num / longer).cast("int").alias("target_width"),
        F.floor(h * scale_num / longer).cast("int").alias("target_height"),
    )


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Per-payload feature vector via mapInPandas: a deterministic byte
    histogram folded into ``dim`` buckets (crc of position-tagged chunks).
    Same Arrow-batched shape a real image/audio encoder would use."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                buckets = [0.0] * dim
                if payload is not None:
                    for i in range(0, len(payload), 64):
                        chunk = bytes(payload[i : i + 64])
                        h = zlib.crc32(chunk)
                        buckets[h % dim] += 1.0
                    total = sum(buckets)
                    if total > 0:
                        buckets = [b / total for b in buckets]
                feats.append(buckets)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(featurize, schema=_FEATURES)


_MEDIA_EMB = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


class DeterministicMediaEmbedder:
    """Payload-side encoder into the SAME space as the text-side
    ``operators.embed.DeterministicEmbedder`` — the two-tower /
    CLIP-style contract (Radford et al. 2021): modalities are encoded
    separately but land in one shared embedding space, so a text query
    retrieves media by plain cosine. A real deployment swaps this class
    for an image/audio encoder checkpoint (same ``embed_batch(payloads)
    -> vectors`` surface, the m01-m05 pluggable-codec pattern); the
    deterministic stand-in decodes the payload bytes — which ARE UTF-8
    text in the engine's synthetic media fixture
    (``attach_fake_payload``) — and runs the shared hashed
    bag-of-tokens, so the cross-modal alignment is exact by
    construction and the retrieval path can be pinned against a dense
    numpy reference (tests/test_multimodal.py)."""

    def __init__(self, dim: int = 64):
        from .embed import DeterministicEmbedder

        self._text = DeterministicEmbedder(dim)

    def embed_batch(self, payloads):
        texts = [
            None if p is None else bytes(p).decode("utf-8", errors="replace")
            for p in payloads
        ]
        return self._text.embed_batch(texts)


class Md5BowMediaEmbedder:
    """The payload-side twin of ``operators.embed.Md5BowEmbedder`` —
    same two-tower contract as DeterministicMediaEmbedder, but every
    arithmetic step (md5 bucket hash, explicit ASCII-whitespace
    tokenizer, exact integer bucket weights) has an ANSI-SQL twin, so
    the WHOLE cross-modal serving path is value-certifiable against a
    second engine (the m06 oracle). A real deployment swaps in an
    image/audio encoder checkpoint behind the same ``embed_batch``
    surface; the certification then degrades to the rows-only +
    fixture-pin class, which is exactly what the pluggable seam is
    for."""

    def __init__(self, dim: int = 32):
        from .embed import Md5BowEmbedder

        self._text = Md5BowEmbedder(dim)

    def embed_batch(self, payloads):
        texts = [
            None if p is None else bytes(p).decode("utf-8", errors="replace")
            for p in payloads
        ]
        return self._text.embed_batch(texts)


def embed_media(
    media: DataFrame,
    embedder_factory=DeterministicMediaEmbedder,
    dim: int = 64,
    real_codec: bool = False,
) -> DataFrame:
    """(doc_id, payload) -> (doc_id, embedding): the media half of the
    cross-modal retrieval closure (m06). Arrow-batched mapInPandas —
    one JVM->Python crossing per batch, the embedder built once per
    batch iterator (never per row); payload columns never reach the
    driver. ``real_codec=True`` is the import gate for a real encoder
    backend (not in this container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_codec:
            raise NotImplementedError(
                "no media encoder in this container; install one and pass "
                "an embedder_factory wrapping it"
            )
        emb = embedder_factory(dim)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": emb.embed_batch(pdf["payload"]),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=_MEDIA_EMB)
