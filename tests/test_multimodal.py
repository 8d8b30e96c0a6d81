"""m06 cross-modal retrieval: the two-tower shared-space contract and
an EXACT pin of the whole pipeline (text embedder + media embedder +
cosine + per-query top-k) against a dense numpy reference. Since round
10 the catalog entry runs on the engine-portable md5-BoW towers and is
oracle-certified hash-exact; the numpy pin stays as the fast local
regression, and the crc32 DeterministicEmbedder pair keeps its own
shared-space contract test."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
    DeterministicMediaEmbedder,
    Md5BowMediaEmbedder,
    attach_fake_payload,
    embed_media,
)
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans import get_spec
from real_time_genai_embeddings_for_rag_with_apache_flink_spark.sources.batch import (
    load_table,
)

_WS = re.compile(r"[ \t\n\f\r]+")


def _ref_embed_md5(text: str, dim: int = 32) -> np.ndarray | None:
    """Dense replica of operators/embed.Md5BowEmbedder (the m06 towers):
    md5 bucket hash, explicit ASCII-whitespace tokens, exact integer
    weights, no normalization."""
    stripped = text.strip(" \t\n\f\r")
    toks = _WS.split(stripped) if stripped else []
    if not toks:
        return None
    vec = np.zeros(dim, dtype=np.int64)
    for tok in toks:
        h = int(hashlib.md5(f"m06:{tok}".encode()).hexdigest()[:8], 16)
        vec[h % dim] += 1 + (h >> 8) % 7
    return vec.astype(np.float32)


def _round_half_up6(x: float) -> float:
    # Spark F.round is HALF_UP (away from zero); np.round is half-even
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def test_media_embedder_shares_text_space():
    """The CLIP-style contract: encoding a payload lands exactly where
    encoding its text does — cross-modal cosine is meaningful. Both
    tower pairs (crc32 Deterministic*, md5 Md5Bow*) honor it."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.embed import (
        DeterministicEmbedder,
        Md5BowEmbedder,
    )

    text = "an image caption with several tokens"
    t = DeterministicEmbedder(64).embed_batch([text, None])
    m = DeterministicMediaEmbedder(64).embed_batch([text.encode("utf-8"), None])
    assert m[0] == t[0]
    assert m[1] is None and t[1] is None

    t2 = Md5BowEmbedder(32).embed_batch([text, None, "   "])
    m2 = Md5BowMediaEmbedder(32).embed_batch(
        [text.encode("utf-8"), None, b"   "]
    )
    assert m2[0] == t2[0]
    # md5-BoW vectors are integer bucket weights (exact in any engine)
    assert all(v == int(v) for v in t2[0]) and sum(t2[0]) > 0
    # None and all-whitespace both embed to None (zero vector has no
    # cosine; both engines drop the row)
    assert t2[1] is None and m2[1] is None
    assert t2[2] is None and m2[2] is None


def test_embed_media_real_codec_is_gated(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = attach_fake_payload(docs)
    with pytest.raises(Exception) as ei:
        embed_media(media, real_codec=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_m06_matches_dense_numpy_reference(spark):
    """Recall 1.0 vs the reference: the catalog entry's (q_id, doc_id,
    rnk) triples — and the rounded sims — equal a dense numpy replay of
    both md5-BoW towers, cosine, HALF_UP rounding, and (sim desc,
    doc_id) tie-broken top-5 with self-matches excluded."""
    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.length("text") > 0)
        .select("doc_id", "text")
        .collect()
    )
    vecs = {
        r.doc_id: v
        for r in rows
        if (v := _ref_embed_md5(r.text)) is not None
    }

    expected = {}
    q_ids = [d for d in vecs if d % 100 == 0]
    for q in q_ids:
        qv = vecs[q].astype(np.float64)
        qn = float(np.linalg.norm(qv))
        scored = []
        for d, v in vecs.items():
            if d == q:
                continue
            dv = v.astype(np.float64)
            denom = qn * float(np.linalg.norm(dv))
            if denom == 0.0:
                continue  # zero vectors never make it into vecs
            scored.append((_round_half_up6(float(dv @ qv) / denom), d))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rnk, (sim, d) in enumerate(scored[:5], start=1):
            expected[(q, d)] = (rnk, sim)

    got = {
        (r.q_id, r.doc_id): (r.rnk, r.sim)
        for r in get_spec("m06_crossmodal_retrieval")
        .build(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == expected[k][0], (k, got[k], expected[k])
        assert abs(got[k][1] - expected[k][1]) < 1e-9, (k, got[k], expected[k])


# ---------------------------------------------------------------------------
# Pure-Python BMP/WAV codecs (r10 verdict #4 — the m03 un-gating)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_flips_bottom_up_rows():
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # 2 rows x 4 px (stride 12, 4-aligned): stored bottom-up, so the
    # FIRST stored row must come back as the LAST decoded row
    bottom = bytes(range(12))
    top = bytes(range(100, 112))
    bmp = encode_bmp(bottom + top, 4, 2)
    w, h, px = decode_bmp(bmp)
    assert (w, h) == (4, 2)
    assert px == top + bottom


def test_bmp_stride_padding_is_removed():
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    # width 3 -> 9 pixel bytes, stride 12: three pad bytes per row must
    # not appear in the decoded pixels
    row = bytes(range(9)) + b"\xff\xff\xff"
    bmp = encode_bmp(row, 3, 1)
    w, h, px = decode_bmp(bmp)
    assert (w, h, px) == (3, 1, bytes(range(9)))


def test_bmp_decoder_rejects_non_bmp_and_wrong_variant():
    import pytest as _pytest

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG!" + b"\x00" * 60)
    bmp = bytearray(encode_bmp(bytes(12), 4, 1))
    bmp[28] = 8  # bpp 24 -> 8
    with _pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bmp))
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(bytes(12), 4, 1)[:-4])


def test_wav_roundtrip():
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    samples = bytes(range(64))  # 32 frames of 16-bit mono
    wav = encode_wav(samples, n_channels=1, sample_rate=8000, bits=16)
    assert decode_wav(wav) == (1, 8000, 16, 32)
    stereo = encode_wav(samples, n_channels=2, sample_rate=44100, bits=16)
    assert decode_wav(stereo) == (2, 44100, 16, 16)


def test_wav_decoder_rejects_non_pcm():
    import struct

    import pytest as _pytest

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    with _pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"OggS" + b"\x00" * 60)
    wav = bytearray(encode_wav(bytes(8)))
    struct.pack_into("<H", wav, 20, 3)  # format tag 1 (PCM) -> 3 (float)
    with _pytest.raises(ValueError, match="not PCM"):
        decode_wav(bytes(wav))


def test_decode_media_real_codec_runs_on_bmp_and_wav(spark):
    """The real_codec path now DECODES the two header-described
    containers instead of raising; unknown formats still gate."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
        encode_wav,
    )

    rows = [
        (1, encode_bmp(bytes(48 * 2), 16, 2), "image", 54 + 96),
        (2, encode_wav(bytes(100), 1, 8000, 16), "audio", 144),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string, n_bytes long"
    )
    got = {r.doc_id: r for r in decode_media(media, real_codec=True).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (16, 2, 1)
    assert (got[2].width, got[2].height, got[2].n_frames) == (1, 16, 50)


def test_bmp_features_match_hand_computation(spark):
    """End-to-end m03 kernel on a controlled two-doc corpus: features of
    the decoded pixels equal hand-computed values, including the
    row-order-sensitive corner bytes."""
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        attach_bmp_payload,
        bmp_features,
    )

    short = "ab"  # 2 bytes -> one 16x1 row, padded with 46 zeros
    long = "x" * 48 + "Qtail"  # 53 bytes -> height 2; byte 48 = 'Q'
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r for r in bmp_features(attach_bmp_payload(docs)).collect()
    }
    assert (got[1].width, got[1].height) == (16, 1)
    assert got[1].byte_sum == ord("a") + ord("b")
    # single row: top-left == bottom-left == first text byte
    assert got[1].topleft_b == got[1].bottomleft_b == ord("a")
    assert (got[2].width, got[2].height) == (16, 2)
    assert got[2].byte_sum == 48 * ord("x") + sum(ord(c) for c in "Qtail")
    # decoded row 0 (top) is the file's LAST stored row -> text byte 48
    assert got[2].topleft_b == ord("Q")
    assert got[2].bottomleft_b == ord("x")


def test_png_roundtrip_exercises_all_five_filters():
    """encode_png filters scanline r with type r % 5, so a 10-row image
    routes every spec filter (None/Sub/Up/Average/Paeth) through both
    directions; the decode must reproduce the pixels bit-for-bit and
    report the filter types it actually read from the inflated
    stream."""
    import os
    import random

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = random.Random(42)
    w, h = 16, 10
    px = bytes(rng.randrange(256) for _ in range(w * 3 * h))
    payload = encode_png(px, w, h)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    w2, h2, px2, filters = decode_png(payload)
    assert (w2, h2) == (w, h)
    assert px2 == px, "unfilter must reconstruct the exact pixel bytes"
    assert filters == [r % 5 for r in range(h)]
    # and the container really is compressed (compressible input)
    flat = encode_png(bytes(w * 3 * h), w, h)
    assert len(flat) < w * 3 * h

    # os.urandom-free determinism: same input -> same file bytes
    assert encode_png(px, w, h) == payload
    del os


def test_png_decoder_rejects_corruption_and_variants():
    import struct
    import zlib as _zlib

    import pytest as _pytest

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    payload = bytearray(encode_png(bytes(48 * 2), 16, 2))
    # flip one byte inside the IDAT chunk body -> CRC mismatch
    idat_at = bytes(payload).index(b"IDAT")
    corrupt = bytearray(payload)
    corrupt[idat_at + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + bytes(payload[2:]))
    # unsupported variant: grayscale IHDR (color type 0), CRC valid
    ihdr = struct.pack(">IIBBBBB", 16, 2, 8, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr))
    )
    with _pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_decode_media_real_codec_handles_png(spark):
    from conftest import SF_SMOKE

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        attach_png_payload,
        decode_media,
    )
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.plans.catalog import (
        load_table,
    )

    docs = load_table(spark, SF_SMOKE, "documents").filter(
        "doc_id < 20 AND length(text) > 0"
    )
    rows = decode_media(attach_png_payload(docs), real_codec=True).collect()
    assert rows and all(r.width == 16 and r.n_frames == 1 for r in rows)
    assert all(r.height >= 1 for r in rows)


def test_gif_lzw_roundtrip_growth_resets_and_kwkwk():
    """The GIF89a LZW pair (spec appendix F): variable code width grows
    in lockstep (decoder lags the encoder's table by one entry), forced
    CLEAR codes reset the dictionary mid-stream, the table-full 4096
    reset fires on low-entropy input, and runs exercise the KwKwK
    self-reference case."""
    import random

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(1)
    cases = [
        b"a",
        b"aaaaaaaaaaaaaaaa",  # KwKwK immediately
        bytes(rng.randrange(256) for _ in range(20_000)),  # width growth
        b"the quick brown fox " * 3000,  # dictionary hits 4096 -> reset
        bytes(5000),  # all-zero run
    ]
    for data in cases:
        for clear_every in (0, 7, 64):
            assert _gif_lzw_decode(
                _gif_lzw_encode(data, clear_every=clear_every), 8
            ) == data, (len(data), clear_every)


def test_gif_roundtrip_and_published_fixture():
    """encode_gif -> decode_gif is the identity on the index raster, and
    the decoder accepts a REAL third-party artifact: the ubiquitous
    published 1x1 transparent GIF (GCE extension block, 2-entry color
    table, mcs=2, and NO explicit EOI code — the block terminator ends
    the stream, which real decoders must tolerate)."""
    import base64

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    data = "synthetic text payload for the gif raster".encode()
    height = -(-len(data) // 16)
    padded = data + b"\x00" * (16 * height - len(data))
    w, h, idx, gct = decode_gif(encode_gif(padded, 16, height))
    assert (w, h) == (16, height)
    assert idx == padded
    assert gct[65] == (65, 65, 65)  # grayscale palette: entry i = (i,i,i)

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, idx, gct = decode_gif(tiny)
    assert (w, h) == (1, 1)
    assert idx == b"\x00"
    assert gct[0] == (0, 0, 0) and gct[1] == (255, 255, 255)


def test_gif_decoder_rejects_corruption_and_variants():
    import base64

    import pytest

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"BM" + bytes(60))
    for cut in (20, 30, 38):
        with pytest.raises(ValueError):
            decode_gif(tiny[:cut])
    with pytest.raises(ValueError):  # image descriptor byte corrupted
        decode_gif(tiny.replace(b"\x2c", b"\x2d"))
    # interlace flag set -> explicitly unsupported, never wrong pixels
    good = encode_gif(bytes(range(16)), 16, 1)
    desc_at = 6 + 7 + 768  # header + LSD + 256-entry GCT
    assert good[desc_at] == 0x2C
    interlaced = (
        good[: desc_at + 9]
        + bytes([good[desc_at + 9] | 0x40])
        + good[desc_at + 10 :]
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(interlaced)
    # pixel-count mismatch (truncated LZW payload) is caught even when
    # the lenient no-EOI path returns a short raster
    short = encode_gif(bytes(64), 16, 4)
    with pytest.raises(ValueError):
        decode_gif(short[:-6] + b"\x00\x3b")


def test_gif_features_match_hand_computation(spark):
    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        attach_gif_payload,
        gif_features,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, "z" * 40)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r for r in gif_features(attach_gif_payload(docs)).collect()
    }
    a = out[1]
    assert (a.width, a.height) == (16, 1)
    assert a.index_sum == ord("a") + ord("b") + ord("c")
    assert a.topleft_idx == ord("a") and a.topleft_gray == ord("a")
    assert a.bottomleft_idx == ord("a")  # one row: bottom == top
    z = out[2]
    assert (z.width, z.height) == (16, 3)
    assert z.index_sum == 40 * ord("z")
    assert z.bottomleft_idx == ord("z")  # byte 32 starts the last row


def test_gif_lzw_roundtrip_property():
    """Property-based: LZW encode->decode is the identity for arbitrary
    byte strings at every clear cadence (hypothesis drives the corpus;
    the explicit cases above pin the named edge paths)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=4000),
        clear_every=st.sampled_from([0, 1, 3, 64]),
    )
    def check(data: bytes, clear_every: int):
        assert _gif_lzw_decode(
            _gif_lzw_encode(data, clear_every=clear_every), 8
        ) == data

    check()
