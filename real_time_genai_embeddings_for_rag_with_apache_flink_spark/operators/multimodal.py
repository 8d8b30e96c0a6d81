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


# ---------------------------------------------------------------------------
# Pure-Python codecs for two trivial containers (r10 verdict #4): BMP
# (24-bit uncompressed, BITMAPINFOHEADER) and WAV (PCM RIFF). Both
# formats are public and header-described, so a dependency-free decoder
# is ~30 lines each — enough to run a REAL decode path in this
# container and value-certify the media plumbing end to end (m03).
# Two genuinely COMPRESSED codecs joined them: PNG (r12 — zlib/DEFLATE
# + the five-filter suite) and GIF (r13 — variable-width LZW from the
# GIF89a spec appendix). JPEG/MP3/H.264/... still require external
# codecs and keep the NotImplementedError gate.
# ---------------------------------------------------------------------------

_BMP_WIDTH = 16  # fixture width: stride 16*3 = 48 bytes, already 4-aligned


def encode_bmp(pixel_rows_bottom_up: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit uncompressed BMP writer. ``pixel_rows_bottom_up``
    must already be row-padded to the 4-byte stride and ordered as BMP
    stores rows (bottom row first)."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    if len(pixel_rows_bottom_up) != stride * height:
        raise ValueError(
            f"pixel buffer {len(pixel_rows_bottom_up)} != stride*height "
            f"{stride * height}"
        )
    offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", offset + stride * height, 0, 0, offset
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    return header + pixel_rows_bottom_up


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP: returns (width, height,
    top-down row-major BGR pixel bytes, stride padding removed). Raises
    ValueError on anything that isn't one (magic, bpp, compression)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    top_down = height < 0
    height = abs(height)
    stride = ((width * 3 + 3) // 4) * 4
    if offset + stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = [
        payload[offset + r * stride : offset + r * stride + width * 3]
        for r in range(height)
    ]
    if not top_down:
        rows.reverse()  # stored bottom-up -> returned top-down
    return width, height, b"".join(rows)


def _png_paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor exactly as the PNG spec defines it (left,
    up, upper-left; ties resolve left -> up -> upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter(ftype: int, raw: bytes, prior: bytes, bpp: int = 3) -> bytes:
    """Apply PNG scanline filter ``ftype`` (encode direction)."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - bpp] if i >= bpp else 0
        up = prior[i]
        upleft = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _png_paeth(left, up, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter(ftype: int, flt: bytes, prior: bytes, bpp: int = 3) -> bytes:
    """Invert PNG scanline filter ``ftype`` (decode direction) —
    reconstruction feeds back into the left/upper-left references, so
    this runs in scan order like the spec requires."""
    recon = bytearray(len(flt))
    for i in range(len(flt)):
        left = recon[i - bpp] if i >= bpp else 0
        up = prior[i]
        upleft = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _png_paeth(left, up, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        recon[i] = (flt[i] + pred) & 0xFF
    return bytes(recon)


def encode_png(pixel_rows_top_down: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit RGB (color type 2, non-interlaced) PNG writer over
    stdlib zlib — a genuinely COMPRESSED container, unlike the
    header-described BMP/WAV pair. Scanline ``r`` uses filter type
    ``r % 5``, so a decoder must implement the complete filter suite
    (None/Sub/Up/Average/Paeth) to recover the pixels — the m03b oracle
    fails on any filter shortcut."""
    import struct

    stride = width * 3
    if len(pixel_rows_top_down) != stride * height:
        raise ValueError(
            f"pixel buffer {len(pixel_rows_top_down)} != width*3*height "
            f"{stride * height}"
        )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    prior = bytes(stride)
    stream = bytearray()
    for r in range(height):
        raw = pixel_rows_top_down[r * stride : (r + 1) * stride]
        ftype = r % 5
        stream.append(ftype)
        stream += _png_filter(ftype, raw, prior)
        prior = raw
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, bytes, list[int]]:
    """Parse an 8-bit RGB non-interlaced PNG: signature, chunk walk
    with CRC-32 verification, IDAT concatenation + zlib inflate, and
    per-scanline UNFILTERING (all five spec filter types). Returns
    (width, height, top-down row-major RGB bytes, per-row filter types
    as read from the stream). Raises ValueError on anything that isn't
    one (signature, CRC, color type, depth, interlace, stream size)."""
    import struct

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, dims, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype != 2 or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth} color={ctype} "
                    f"interlace={interlace})"
                )
            if w <= 0 or h <= 0:
                raise ValueError(f"bad PNG dimensions {w}x{h}")
            dims = (w, h)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if dims is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h = dims
    stream = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(stream) != (stride + 1) * h:
        raise ValueError(
            f"PNG pixel stream {len(stream)} != (stride+1)*height "
            f"{(stride + 1) * h}"
        )
    prior = bytes(stride)
    rows: list[bytes] = []
    filters: list[int] = []
    for r in range(h):
        base = r * (stride + 1)
        ftype = stream[base]
        recon = _png_unfilter(ftype, stream[base + 1 : base + 1 + stride], prior)
        rows.append(recon)
        filters.append(ftype)
        prior = recon
    return w, h, b"".join(rows), filters


# ---------------------------------------------------------------------------
# GIF (LZW) — the second compressed codec (r12 verdict #8). PNG/zlib
# exercises DEFLATE; GIF exercises a fundamentally different
# decompressor: variable-width LZW codes packed LSB-first into 255-byte
# sub-blocks, with dictionary growth, in-band CLEAR resets, and the
# KwKwK self-reference case. Both directions are implemented from the
# public GIF89a specification (appendix F defines the LZW variant).
# ---------------------------------------------------------------------------

_GIF_MCS = 8  # 256-entry palette: pixel index == byte value
_GIF_MAX_WIDTH = 12  # the spec's hard code-width ceiling


def _gif_lzw_encode(data: bytes, clear_every: int = 64) -> bytes:
    """GIF-variant LZW: variable code width starting at mcs+1, LSB-first
    bit packing, CLEAR emitted at the start, every ``clear_every`` data
    codes (forcing decoders through the reset path), and whenever the
    table fills at 4096. Width grows when the next free code would
    exceed the current width's capacity (encoder rule: next == (1 <<
    width) + 1 — the decoder's table lags one entry, so its paired rule
    is next == 1 << width)."""
    mcs = _GIF_MCS
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    cur = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(1 << mcs)}, eoi + 1, mcs + 1

    table, nxt, width = fresh()
    emit(clear, width)
    w = b""
    emitted = 0
    for byte in data:
        c = bytes([byte])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        emitted += 1
        table[w + c] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < _GIF_MAX_WIDTH:
            width += 1
        w = c
        if nxt == (1 << _GIF_MAX_WIDTH) or (
            clear_every and emitted % clear_every == 0
        ):
            emit(clear, width)
            table, nxt, width = fresh()
            # w stays: its single-byte code survives the reset
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif_lzw_decode(stream: bytes, mcs: int) -> bytes:
    """Inverse of the spec's LZW: LSB-first variable-width code reader,
    CLEAR/EOI handling, dictionary growth with the decoder's one-entry
    lag (width grows at next == 1 << width), and the KwKwK case (a code
    equal to the next unassigned entry)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    pos = cur = nbits = 0
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while True:
        while nbits < width:
            if pos >= len(stream):
                # Real-world GIFs routinely omit the explicit EOI code
                # and let the zero-length block terminator end the
                # stream (the published 1x1 fixture in
                # tests/test_multimodal.py does) — tolerate it; the
                # caller's pixel-count check still rejects genuine
                # truncation.
                return bytes(out)
            cur |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << width) - 1)
        cur >>= width
        nbits -= width
        if code == clear:
            table = table[: eoi + 1]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW: first code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _GIF_MAX_WIDTH:
                width += 1
        prev = entry


def encode_gif(indices_top_down: bytes, width: int, height: int) -> bytes:
    """Minimal GIF89a writer: one non-interlaced frame over a 256-entry
    grayscale global color table (palette index i -> RGB(i,i,i)), pixel
    indices LZW-compressed (min code size 8) into 255-byte sub-blocks.
    The forced periodic CLEAR codes make any decoder run its dictionary
    reset path, not just the happy growth path."""
    import struct

    if len(indices_top_down) != width * height:
        raise ValueError(
            f"index buffer {len(indices_top_down)} != width*height "
            f"{width * height}"
        )
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        # the logical screen descriptor packs dimensions as uint16 —
        # out-of-range values must fail as a clear ValueError here, not
        # as struct.error inside an executor
        raise ValueError(
            f"GIF dimensions must be in [1, 65535]: got {width}x{height}"
        )
    gct = bytes(v for i in range(256) for v in (i, i, i))
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    img = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    lzw = _gif_lzw_encode(indices_top_down)
    blocks = bytearray([_GIF_MCS])
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    return b"GIF89a" + lsd + gct + img + bytes(blocks) + b"\x3b"


def decode_gif(payload: bytes) -> tuple[int, int, bytes, list[tuple[int, int, int]]]:
    """Parse a GIF87a/89a single-frame image: header + logical screen
    descriptor, global color table, extension-block skipping (GCE etc.),
    image descriptor, sub-block reassembly, and the full LZW inflate.
    Returns (width, height, top-down row-major palette-index bytes, the
    global color table as RGB triples). Raises ValueError on anything
    that isn't one (magic, interlace, local color tables, truncation,
    LZW stream errors, pixel-count mismatch)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated GIF payload") from e


def _decode_gif_body(payload: bytes):
    import struct

    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos : pos + 3 * n]
        if len(raw) != 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = [tuple(raw[i : i + 3]) for i in range(0, len(raw), 3)]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x80:
                raise ValueError("unsupported GIF variant (local color table)")
            if ipacked & 0x40:
                raise ValueError("unsupported GIF variant (interlaced)")
            if w <= 0 or h <= 0 or w > sw or h > sh:
                raise ValueError(f"bad GIF frame dimensions {w}x{h}")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                part = payload[pos + 1 : pos + 1 + ln]
                if len(part) != ln:
                    raise ValueError("truncated GIF data sub-block")
                lzw += part
                pos += 1 + ln
            indices = _gif_lzw_decode(bytes(lzw), mcs)
            if len(indices) != w * h:
                raise ValueError(
                    f"GIF decoded {len(indices)} pixels != {w}x{h}"
                )
            return w, h, indices, gct
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF missing image descriptor")


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a PCM RIFF/WAVE header: returns (n_channels, sample_rate,
    bits_per_sample, n_frames). Raises ValueError if not PCM WAV."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        chunk_len = struct.unpack_from("<I", payload, pos + 4)[0]
        if chunk_id == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if audio_fmt != 1:
                raise ValueError(f"not PCM (format tag {audio_fmt})")
            fmt = (n_ch, rate, bits)
        elif chunk_id == b"data":
            data_len = min(chunk_len, len(payload) - pos - 8)
        pos += 8 + chunk_len + (chunk_len & 1)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    n_ch, rate, bits = fmt
    n_frames = data_len // (n_ch * (bits // 8))
    return n_ch, rate, bits, n_frames


def encode_wav(samples: bytes, n_channels: int = 1, sample_rate: int = 8000,
               bits: int = 16) -> bytes:
    """Minimal PCM WAV writer (``samples`` are raw little-endian PCM)."""
    import struct

    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * bits // 8, n_channels * bits // 8, bits,
    )
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        + fmt
        + data
    )


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal rows whose payloads are REAL 24-bit BMP
    files (not stand-in text bytes): the UTF-8 text bytes become the
    pixel area of a 16-wide image (stride 48, so no alignment padding),
    zero-padded to fill the last row, stored bottom-up per the format.
    Deterministic, dependency-free, and byte-level SQL-derivable — the
    m03 oracle re-computes every decoded feature from the text."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride = _BMP_WIDTH * 3
        for pdf in batches:
            payloads, nbytes = [], []
            for text in pdf["text"]:
                b = text.encode("utf-8")
                height = max(1, -(-len(b) // stride))
                padded = b + b"\x00" * (stride * height - len(b))
                bmp = encode_bmp(padded, _BMP_WIDTH, height)
                payloads.append(bmp)
                nbytes.append(len(bmp))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["image"] * len(pdf),
                    "n_bytes": nbytes,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(build, schema=MEDIA_SCHEMA)


def attach_png_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal rows whose payloads are REAL compressed
    PNG files: the UTF-8 text bytes become the pixel area of a 16-wide
    RGB image (48 bytes/row), zero-padded to fill the last row, stored
    top-down per the format, each scanline filtered with type row % 5
    and the whole stream zlib-deflated. Deterministic and byte-level
    SQL-derivable — the m03b oracle re-computes every decoded feature
    from the text."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stride = _BMP_WIDTH * 3
        for pdf in batches:
            payloads, nbytes = [], []
            for text in pdf["text"]:
                b = text.encode("utf-8")
                height = max(1, -(-len(b) // stride))
                padded = b + b"\x00" * (stride * height - len(b))
                png = encode_png(padded, _BMP_WIDTH, height)
                payloads.append(png)
                nbytes.append(len(png))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["image"] * len(pdf),
                    "n_bytes": nbytes,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(build, schema=MEDIA_SCHEMA)


_GIF_WIDTH = 16  # fixture width: one palette index per pixel, stride 16


def attach_gif_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal rows whose payloads are REAL LZW-compressed
    GIF89a files: the UTF-8 text bytes become the palette-index raster of
    a 16-wide frame over a 256-entry grayscale color table (index i ->
    RGB(i,i,i)), zero-padded to fill the last row, stored top-down
    non-interlaced, LZW-encoded with forced periodic CLEAR resets.
    Deterministic and byte-level SQL-derivable — the m07 oracle
    re-computes every decoded feature from the text."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, nbytes = [], []
            for text in pdf["text"]:
                b = text.encode("utf-8")
                height = max(1, -(-len(b) // _GIF_WIDTH))
                padded = b + b"\x00" * (_GIF_WIDTH * height - len(b))
                gif = encode_gif(padded, _GIF_WIDTH, height)
                payloads.append(gif)
                nbytes.append(len(gif))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["image"] * len(pdf),
                    "n_bytes": nbytes,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(build, schema=MEDIA_SCHEMA)


_GIF_FEATURES = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("index_sum", LongType()),
        StructField("topleft_idx", IntegerType()),
        StructField("bottomleft_idx", IntegerType()),
        StructField("topleft_gray", IntegerType()),
    ]
)


def gif_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction over the LZW codec (m07): walk
    each GIF payload with the pure-Python decoder — header, global
    color table, sub-block reassembly, full variable-width LZW inflate
    with CLEAR resets and the KwKwK case — and emit integer features of
    the decoded raster: dimensions, the sum of every decoded palette
    index (unreachable without real decompression), the top-left and
    bottom-left indices (row-order sensitive), and the top-left pixel's
    red value via the PARSED color table (proves the palette walk, not
    just the raster). Arrow-batched mapInPandas; payloads never leave
    their scan partition."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, idx, gct = decode_gif(bytes(payload))
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(sum(idx)),
                        int(idx[0]),
                        int(idx[(h - 1) * w]),
                        int(gct[idx[0]][0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "index_sum",
                    "topleft_idx", "bottomleft_idx", "topleft_gray",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        featurize, schema=_GIF_FEATURES
    )


_PNG_FEATURES = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("topleft_r", IntegerType()),
        StructField("bottomleft_r", IntegerType()),
        StructField("filter_sum", LongType()),
    ]
)


def png_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction over a COMPRESSED codec (m03b):
    inflate + unfilter each PNG payload with the pure-Python decoder
    and emit integer features of the decoded pixel matrix — dimensions,
    total pixel-byte sum, the red channel of the top-left and
    bottom-left pixels (row-order sensitive: PNG is top-down where BMP
    is bottom-up, so a decoder confusing the two fails the oracle), and
    the SUM OF PER-ROW FILTER TYPES as read back from the inflated
    stream (proves the decoder walked the real scanline structure, not
    header arithmetic). Arrow-batched mapInPandas; payloads never leave
    their scan partition."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px, filters = decode_png(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(arr.sum(dtype=np.int64)),
                        int(arr[0, 0, 0]),
                        int(arr[h - 1, 0, 0]),
                        int(sum(filters)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "byte_sum",
                    "topleft_r", "bottomleft_r", "filter_sum",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        featurize, schema=_PNG_FEATURES
    )


_BMP_FEATURES = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("topleft_b", IntegerType()),
        StructField("bottomleft_b", IntegerType()),
    ]
)


def bmp_features(media: DataFrame) -> DataFrame:
    """REAL-decode feature extraction (m03): parse each BMP payload with
    the pure-Python decoder — header validation, stride removal, the
    bottom-up row flip — and emit integer features of the DECODED pixel
    matrix: dimensions, total pixel-byte sum, and the blue channel of
    the top-left and bottom-left pixels (row-order sensitive, so a
    decoder that skipped the flip fails the oracle). Same Arrow-batched
    mapInPandas shape as every other media transform; payloads never
    leave their scan partition."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_bmp(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        int(arr.sum(dtype=np.int64)),
                        int(arr[0, 0, 0]),
                        int(arr[h - 1, 0, 0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "byte_sum",
                    "topleft_b", "bottomleft_b",
                ],
            )

    return media.select("doc_id", "payload").mapInPandas(
        featurize, schema=_BMP_FEATURES
    )


def decode_media(media: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode payloads to (width, height, n_frames) via mapInPandas.

    The fake codec derives dimensions from byte length only (SQL-mirrored
    by the oracle). ``real_codec=True`` now runs the REAL pure-Python
    parsers for the two header-described containers (BMP images: width,
    height, 1 frame; PCM WAV audio: channels as width, bits as height,
    sample count as n_frames) and still raises NotImplementedError for
    formats that need an external codec (PNG/JPEG/MP4/...), preserving
    the import gate where it is genuinely required.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_codec:
            for pdf in batches:
                rows = []
                for doc_id, payload, mtype in zip(
                    pdf["doc_id"], pdf["payload"], pdf["media_type"]
                ):
                    raw = bytes(payload)
                    if raw[:2] == b"BM":
                        w, h, _ = decode_bmp(raw)
                        rows.append((int(doc_id), mtype, w, h, 1))
                    elif raw[:8] == b"\x89PNG\r\n\x1a\n":
                        w, h, _, _ = decode_png(raw)
                        rows.append((int(doc_id), mtype, w, h, 1))
                    elif raw[:4] == b"RIFF":
                        n_ch, _rate, bits, n_frames = decode_wav(raw)
                        rows.append((int(doc_id), mtype, n_ch, bits, n_frames))
                    else:
                        raise NotImplementedError(
                            f"no pure-Python codec for this {mtype} payload; "
                            "install PIL/ffmpeg for compressed formats"
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "media_type", "width", "height", "n_frames",
                    ],
                )
            return
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


def resize_media(
    decoded: DataFrame, max_side: int = 256, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Resize planning: clamp the longer side to ``max_side`` preserving
    aspect ratio (integer arithmetic, so the oracle mirrors it exactly).
    ``keep`` carries extra input columns through (m03b rides its decoded
    features alongside the plan in ONE pass — no second decode). A
    codec-backed deployment applies these target dimensions to the
    payload inside the same mapInPandas loop as decode_media."""
    w, h = F.col("width"), F.col("height")
    longer = F.greatest(w, h)
    scale_num = F.least(longer, F.lit(max_side))
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        *keep,
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
