"""Multimodal (image/audio/video) column plumbing.

Policy: media travels as opaque ``binary`` columns + typed metadata structs;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` (the one
place Python is the right tool — per-byte work on blobs, not relational
logic). Batch shape, schema evolution, and partitioning are real and tested.

The codec is a pluggable ``bytes -> dict`` function. Built-ins, in the
order ``auto_decode`` (the default) tries them:

- ``py_decode`` — REAL pure-Python PNG + BMP decode (stdlib zlib only):
  header parse, IDAT inflate, scanline de-filter, per-channel means, and
  the 8x8 average-hash; plus JPEG HEADER parse (SOFn marker walk → real
  width/height/channels, null pixel stats). Magic-byte gated; corrupt
  container bytes → None (null meta row). This is a validation/metadata
  decoder — correct, not fast; swap in ``pil_decode`` via the plug-in
  point for production-rate pixel work.
- ``pil_decode`` — PIL-backed decode when PIL is importable (covers JPEG
  et al.). Not present in this container; driven by a stub in tests.
- ``fake_decode`` — clearly-marked deterministic fake for bytes that are
  no known container (the test shim: synthetic tables carry text, not
  blobs). Every value is a pure function of the bytes, so oracles are
  stable.

Transforms: ``resize_images`` (nearest-neighbor thumbnail/normalize —
real pure-Python for PNG/BMP via the shared pixel core, PIL plug-in for
production rate, pluggable ``(bytes, w, h) -> bytes``),
``decode_audio_metadata`` (real stdlib WAV chunk-walk: sample rate /
channels / bit depth / duration), ``decode_video_metadata`` (real
ISO-BMFF/MP4 box walk: brand / duration / track dimensions) — each with
a pluggable decoder for other containers — and ``frame_sample_plan``
(relational frame-window scaffold).

At 100 TB: mapInPandas is a narrow transformation — no shuffle; throughput
scales with executors × Arrow batch size. Keep blobs out of shuffle keys;
extract features first, then drop the binary column before any wide op.
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "attach_binary",
    "decode_image_metadata",
    "auto_decode",
    "fake_decode",
    "pil_decode",
    "libwebp_decode",
    "py_decode",
    "png_decode",
    "bmp_decode",
    "gif_decode",
    "gif_frame_count",
    "encode_gif",
    "webp_decode",
    "jpeg_decode",
    "encode_png",
    "encode_bmp",
    "encode_jpeg_header",
    "encode_jpeg",
    "jpeg_pixel_decode",
    "wav_decode",
    "mp3_decode",
    "encode_mp3",
    "flac_decode",
    "encode_flac_header",
    "ogg_decode",
    "encode_ogg",
    "audio_decode",
    "mp4_decode",
    "encode_mp4_header",
    "avi_decode",
    "encode_avi_header",
    "mkv_decode",
    "encode_mkv_header",
    "video_decode",
    "decode_video_metadata",
    "encode_wav",
    "decode_audio_metadata",
    "py_pixels",
    "resize_nearest",
    "pil_resize",
    "resize_images",
    "image_near_dup_pairs",
    "phash_to_long",
    "frame_sample_plan",
    # r12: frame pixel tiers + video near-dup
    "avi_frame_stats",
    "encode_avi_mjpeg",
    "gif_frame_stats",
    "encode_gif_anim",
    "webp_frame_stats",
    "encode_webp_anim",
    "video_frame_stats",
    "decode_video_frames",
    "video_near_dup_pairs",
    # r12: EXIF / image-PII tier
    "jpeg_exif",
    "strip_jpeg_metadata",
    "strip_png_metadata",
    "strip_image_metadata_bytes",
    "extract_exif",
    "strip_image_metadata",
    "encode_exif_app1",
]

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def attach_binary(df: DataFrame, source_col: str, out_col: str = "content") -> DataFrame:
    """Treat an existing column's bytes as the media payload (test shim:
    the synthetic tables carry no real blobs, so we cast text → binary)."""
    return df.withColumn(out_col, F.col(source_col).cast("binary"))


_META_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("channel_means", T.ArrayType(T.DoubleType())),
    T.StructField("phash", T.StringType()),
]


def fake_decode(b: bytes) -> dict | None:
    """DETERMINISTIC FAKE decode (for bytes that are no known container):
    every derived value is a pure function of the bytes, so tests and
    oracles are stable."""
    digest = hashlib.md5(b).hexdigest()
    return {
        "byte_len": len(b),
        "format": ["jpeg", "png", "webp"][len(b) % 3],
        "width": 64 + (len(b) % 1024),
        "height": 64 + (int(digest[:4], 16) % 1024),
        "channels": 3,
        "channel_means": [float(len(b) % 256)] * 3,
        "phash": digest[:16],
    }


def _avg_hash(luma_rows: list[list[float]]) -> str:
    """8x8 average-hash over a luma matrix: nearest-pixel downsample to
    8x8 (deterministic — no interpolation), threshold at the mean, pack
    row-major MSB-first into 16 hex chars."""
    h, w = len(luma_rows), len(luma_rows[0])
    px = [
        luma_rows[(i * h) // 8][(j * w) // 8]
        for i in range(8)
        for j in range(8)
    ]
    # fsum: exactly-rounded sum, so a uniform image ties p == avg exactly
    # (naive sum drifts a ulp above for non-representable lumas like 275/3,
    # flipping every bit to 0)
    avg = math.fsum(px) / 64.0
    bits = 0
    for p in px:
        bits = (bits << 1) | (1 if p >= avg else 0)
    return f"{bits:016x}"


def _pixel_stats(rows: list[list[tuple]], channels: int) -> tuple[list[float], str]:
    """(per-channel means, average-hash) from decoded pixel rows."""
    n = len(rows) * len(rows[0])
    sums = [0] * channels
    luma_rows: list[list[float]] = []
    for row in rows:
        lr = []
        for px in row:
            for c in range(channels):
                sums[c] += px[c]
            if channels >= 3:
                lr.append((px[0] + px[1] + px[2]) / 3.0)
            else:
                lr.append(float(px[0]))
        luma_rows.append(lr)
    return [s / n for s in sums], _avg_hash(luma_rows)


def _png_pixels(b: bytes) -> tuple | None:
    """(width, height, channels, pixel rows) for a PNG, or None — the
    shared de-filter core behind :func:`png_decode` (metadata/stats) and
    :func:`resize_nearest` (pixel access)."""
    if not b.startswith(_PNG_SIG):
        return None
    try:
        pos = len(_PNG_SIG)
        width = height = None
        channels = 0
        idat = bytearray()
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos:pos + 4])
            ctype = b[pos + 4:pos + 8]
            data = b[pos + 8:pos + 8 + length]
            pos += 12 + length  # len + type + data + crc
            if ctype == b"IHDR":
                width, height, depth, color, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", data)
                )
                if depth != 8 or interlace != 0:
                    return None
                channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color, 0)
                if channels == 0:
                    return None
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if not width or not height or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        if len(raw) < height * (stride + 1):
            return None
        rows: list[list[tuple]] = []
        prev = bytearray(stride)
        p = 0
        for _ in range(height):
            ft = raw[p]
            line = bytearray(raw[p + 1:p + 1 + stride])
            p += 1 + stride
            if ft == 1:  # Sub
                for i in range(channels, stride):
                    line[i] = (line[i] + line[i - channels]) & 0xFF
            elif ft == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(stride):
                    left = line[i - channels] if i >= channels else 0
                    line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = line[i - channels] if i >= channels else 0
                    up = prev[i]
                    c = prev[i - channels] if i >= channels else 0
                    pp = a + up - c
                    pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            elif ft != 0:
                return None
            prev = line
            rows.append([tuple(line[i:i + channels])
                         for i in range(0, stride, channels)])
        return int(width), int(height), int(channels), rows
    except (struct.error, zlib.error, IndexError, ValueError):
        return None


def png_decode(b: bytes) -> dict | None:
    """Pure-Python PNG decode (stdlib zlib): IHDR parse, IDAT inflate,
    scanline de-filter (None/Sub/Up/Average/Paeth), per-channel means and
    average-hash. Supports bit depth 8, color types 0/2/4/6, no interlace.
    Anything else / corrupt → None."""
    px = _png_pixels(b)
    if px is None:
        return None
    width, height, channels, rows = px
    means, phash = _pixel_stats(rows, channels)
    return {
        "byte_len": len(b),
        "format": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "channel_means": means,
        "phash": phash,
    }


def _bmp_pixels(b: bytes) -> tuple | None:
    """(width, height, channels, pixel rows) for a BMP, or None — shared
    core behind :func:`bmp_decode` and :func:`resize_nearest`."""
    if not b.startswith(b"BM") or len(b) < 54:
        return None
    try:
        (data_off,) = struct.unpack_from("<I", b, 10)
        width, height = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
        (compression,) = struct.unpack_from("<I", b, 30)
        if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
            return None
        top_down = height < 0
        height = abs(height)
        nch = bpp // 8
        stride = ((nch * width + 3) // 4) * 4
        if len(b) < data_off + stride * height:
            return None
        rows: list[list[tuple]] = []
        for r in range(height):
            src = r if top_down else height - 1 - r
            base = data_off + src * stride
            row = []
            for x in range(width):
                o = base + x * nch
                bl, g, rch = b[o], b[o + 1], b[o + 2]
                row.append((rch, g, bl, b[o + 3]) if nch == 4 else (rch, g, bl))
            rows.append(row)
        return int(width), int(height), int(nch), rows
    except (struct.error, IndexError):
        return None


def bmp_decode(b: bytes) -> dict | None:
    """Pure-Python BMP decode: BITMAPINFOHEADER, uncompressed 24/32 bpp.
    Rows are bottom-up (top-down when height < 0), 4-byte aligned, BGR(A)
    order — reordered to RGB(A) for stats. Anything else → None."""
    px = _bmp_pixels(b)
    if px is None:
        return None
    width, height, nch, rows = px
    means, phash = _pixel_stats(rows, nch)
    return {
        "byte_len": len(b),
        "format": "bmp",
        "width": width,
        "height": height,
        "channels": nch,
        "channel_means": means,
        "phash": phash,
    }


def _gif_lzw_decode(data: bytes, min_code_size: int,
                    max_pixels: int) -> bytearray | None:
    """GIF LZW decompress (T.81 app. / GIF89a spec §22): variable-width
    codes 3..12 bits packed LSB-first, clear/end codes, dictionary
    rebuild on clear. ``max_pixels`` bounds the output (forged streams
    must not allocate unbounded memory — the pixel-budget philosophy of
    the JPEG tier). Returns index bytes or None on a corrupt stream."""
    if not 2 <= min_code_size <= 8:
        return None  # GIF palettes cap at 256 entries (mcs <= 8)
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    code_size = min_code_size + 1
    next_code = end + 1
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # stream ends without END code: keep pixels
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = init_table()
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # code beyond the dictionary: corrupt
        out += entry
        if len(out) > max_pixels:
            return None  # forged stream: more pixels than the image
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _gif_frames(b: bytes, wanted: frozenset | set) -> tuple | None:
    """(frame_count_walked, {frame_no: (iw, ih, rows)}) decoding only
    the frames in ``wanted`` — frames outside it skip their LZW
    sub-blocks without decompressing (r12: the animated-GIF sampling
    walk; r11 first-frame decode is the ``wanted={0}`` case). Frames
    decode INDEPENDENTLY (the stored rectangle as-is — no disposal
    compositing; the honest tier for near-dup hashing). Returns None
    for non-GIF bytes or when a WANTED frame is corrupt; a corrupt
    tail after all wanted frames decoded keeps the walked count."""
    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        return None
    decoded: dict[int, tuple] = {}
    frame_no = 0
    try:
        sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
        pos = 13
        gct = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = [tuple(b[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        while pos < len(b):
            blk = b[pos]
            if blk == 0x3B:  # trailer
                break
            if blk == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
                continue
            if blk != 0x2C:  # not an image descriptor: corrupt
                return None if frame_no == 0 else (frame_no, decoded)
            if pos + 10 > len(b):
                break  # descriptor truncated: don't count the frame
            _ix, _iy, iw, ih, lfl = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            if not iw or not ih or iw * ih > 64_000_000:
                return None
            pal = gct
            if lfl & 0x80:
                n = 2 << (lfl & 0x07)
                pal = [tuple(b[pos + 3 * i:pos + 3 * i + 3])
                       for i in range(n)]
                pos += 3 * n
            mcs = b[pos]
            pos += 1
            want = frame_no in wanted
            data = bytearray() if want else None
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                if want:
                    data += b[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1  # block terminator
            if want and pal is not None and 2 <= mcs <= 8:
                idx = _gif_lzw_decode(bytes(data), mcs, iw * ih)
                if idx is None or len(idx) < iw * ih:
                    frame_no += 1
                    continue  # corrupt wanted frame: NULL slot, walk on
                npal = len(pal)
                raster = [idx[r * iw:(r + 1) * iw] for r in range(ih)]
                if lfl & 0x40:  # interlaced: 4-pass row order
                    rows_out: list = [None] * ih
                    src = 0
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                        for r in range(start, ih, step):
                            rows_out[r] = raster[src]
                            src += 1
                    raster = rows_out
                rows = [[pal[v] if v < npal else (0, 0, 0) for v in line]
                        for line in raster]
                decoded[frame_no] = (int(iw), int(ih), rows)
            frame_no += 1
        if not frame_no:
            return None
        return frame_no, decoded
    except (struct.error, IndexError):
        # corrupt tail: keep what was walked (undecoded wanted frames
        # surface as NULL slots / a None first-frame, never garbage)
        return None if frame_no == 0 else (frame_no, decoded)


def _gif_pixels(b: bytes) -> tuple | None:
    """(width, height, 3, pixel rows) for the FIRST frame of a
    GIF87a/GIF89a, or None — real LZW decode on the shared pixel-core
    plumbing (r11; r12 rides :func:`_gif_frames`). Supports global +
    local color tables and interlace; transparent pixels keep their
    palette color (means are over the stored frame)."""
    got = _gif_frames(b, {0})
    if got is None or 0 not in got[1]:
        return None
    iw, ih, rows = got[1][0]
    return iw, ih, 3, rows


def gif_frame_stats(b: bytes, n_sample: int = 3) -> dict | None:
    """Animated-GIF FRAME SAMPLING tier (r12, verdict r11 next #5):
    count frames (descriptor walk, no LZW), decode up to ``n_sample``
    evenly-spaced frames (first/middle/last) independently — the
    stored rectangle per frame, honoring disposal only as "independent
    frames" (no compositing; the honest tier, same convention as
    :func:`avi_frame_stats`) — and emit per-frame average-hashes for
    video-style near-dup plus pooled channel means. A sampled frame
    that fails to decode keeps a NULL phash slot. Non-GIF or
    frameless bytes → None."""
    n = gif_frame_count(b)
    if not n:
        return None
    k = min(n_sample, n)
    idx = sorted({(i * (n - 1)) // (k - 1) if k > 1 else 0
                  for i in range(k)})
    got = _gif_frames(b, set(idx))
    frames = got[1] if got else {}
    phashes: list[str | None] = []
    means_acc: list[list[float]] = []
    width = height = None
    for i in idx:
        f = frames.get(i)
        if f is None:
            phashes.append(None)
            continue
        iw, ih, rows = f
        means, ph = _pixel_stats(rows, 3)
        phashes.append(ph)
        means_acc.append(means)
        if width is None:
            width, height = iw, ih
    pooled = ([sum(c) / len(means_acc) for c in zip(*means_acc)]
              if means_acc else None)
    return {
        "byte_len": len(b),
        "format": "gif-frames",
        "frame_count": n,
        "width": width,
        "height": height,
        "sampled_frames": [int(i) for i in idx],
        "frame_phashes": phashes,
        "channel_means": pooled,
    }


def gif_frame_count(b: bytes) -> int | None:
    """Number of image frames in a GIF — the static-vs-animated
    classifier a crawl-curation pipeline wants BEFORE deciding whether
    to treat a blob as an image or a video-like asset. Pure descriptor
    walk: skips extensions, local color tables, and LZW sub-blocks
    WITHOUT decompressing anything, so it is O(blocks) over the bytes.
    None for non-GIF bytes; a corrupt tail returns the frames counted
    up to it (matching the tolerant-parser convention)."""
    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        return None
    frames = 0
    try:
        if len(b) < 13:
            return 0  # truncated before the logical screen descriptor
        flags = b[10]
        pos = 13
        if flags & 0x80:
            pos += 3 * (2 << (flags & 0x07))
        while pos < len(b):
            blk = b[pos]
            if blk == 0x3B:
                break
            if blk == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
                continue
            if blk != 0x2C:
                break  # corrupt: report frames seen so far
            if pos + 10 > len(b):
                break  # descriptor truncated mid-frame: don't count it
            lfl = b[pos + 9]
            pos += 10
            if lfl & 0x80:
                pos += 3 * (2 << (lfl & 0x07))
            pos += 1  # LZW min code size
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            frames += 1
        return frames
    except IndexError:
        return frames


def gif_decode(b: bytes) -> dict | None:
    """Pure-Python GIF decode (first frame): LZW decompress, palette
    lookup, interlace reorder — channel means + average-hash over real
    pixels, same contract as :func:`png_decode`. Corrupt → None."""
    px = _gif_pixels(b)
    if px is None:
        return None
    width, height, nch, rows = px
    means, phash = _pixel_stats(rows, nch)
    return {
        "byte_len": len(b),
        "format": "gif",
        "width": width,
        "height": height,
        "channels": nch,
        "channel_means": means,
        "phash": phash,
    }


def _gif_palette(frames_pixels: list[list[list[tuple]]]):
    """(palette bytes padded to a power of two, color→index map, depth)
    over the union of colors in all frames."""
    colors: list[tuple] = []
    cmap: dict[tuple, int] = {}
    for pixels in frames_pixels:
        for row in pixels:
            for px in row:
                if px not in cmap:
                    cmap[px] = len(colors)
                    colors.append(px)
    if len(colors) > 256:
        raise ValueError("encode_gif: > 256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())
    n = 1 << depth
    pal = b"".join(bytes(c) for c in colors) + b"\x00\x00\x00" * (
        n - len(colors))
    return pal, cmap, depth


def _gif_lzw_encode(indices: list[int], mcs: int) -> bytes:
    """LZW-compress an index raster into GIF sub-blocks (variable-width
    codes, dictionary reset at 4096)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    code_size = mcs + 1
    emit(clear, code_size)
    w = b""
    for v in indices:
        k = w + bytes([v])
        if k in table:
            w = k
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            # width bump BEFORE the insert (the GIFLIB ordering): the
            # decoder's table lags one code behind the encoder's, so it
            # bumps after adding THIS entry — i.e. before reading the
            # next code — exactly when next_code has reached 2^code_size
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            table[k] = next_code
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = end + 1
            code_size = mcs + 1
        w = bytes([v])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return bytes(blocks)


def _gif_image_block(pixels: list, cmap: dict, mcs: int, width: int,
                     height: int, interlace: bool) -> bytes:
    rows = list(range(height))
    if interlace:
        rows = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for r in range(start, height, step)]
    indices = [cmap[px] for r in rows for px in pixels[r]]
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    return imgd + bytes([mcs]) + _gif_lzw_encode(indices, mcs) + b"\x00"


def encode_gif(width: int, height: int, pixels: list,
               interlace: bool = False) -> bytes:
    """Synthesize a REAL GIF89a for tests (the encode_png pattern):
    builds a palette from the distinct colors (≤ 256), LZW-compresses
    the index raster (variable-width codes, dictionary reset at 4096),
    optional interlace. ``pixels`` is rows of (r, g, b) tuples."""
    pal, cmap, depth = _gif_palette([pixels])
    mcs = max(2, depth)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    return (b"GIF89a" + lsd + pal
            + _gif_image_block(pixels, cmap, mcs, width, height, interlace)
            + b"\x3B")


def encode_gif_anim(width: int, height: int,
                    frames: list[list[list[tuple]]],
                    delay_cs: int = 10) -> bytes:
    """Synthesize a REAL animated GIF89a (r12 fixture generator): one
    GLOBAL palette over the union of all frames' colors, a NETSCAPE
    loop extension, and per-frame graphic-control extensions + image
    blocks — the layout real encoders emit, exercising the frame walk,
    extension skipping, and per-frame LZW decode."""
    pal, cmap, depth = _gif_palette(frames)
    mcs = max(2, depth)
    lsd = struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    netscape = (b"\x21\xff\x0bNETSCAPE2.0"
                + b"\x03\x01\x00\x00\x00")
    out = bytearray(b"GIF89a" + lsd + pal + netscape)
    for pixels in frames:
        out += (b"\x21\xf9\x04\x04"
                + struct.pack("<H", delay_cs) + b"\x00\x00")
        out += _gif_image_block(pixels, cmap, mcs, width, height, False)
    out += b"\x3B"
    return bytes(out)


def _webp_vp8l_pixels(b: bytes) -> tuple | None:
    """(width, height, channels, rows) for a WebP container whose
    first image chunk is VP8L (r12 lossless pixel tier) or VP8 (r13
    lossy pixel tier, :mod:`.vp8` — RFC 6386 intra decode, verified
    bit-exact against libwebp) — the ``_png_pixels`` contract; None
    for extended/corrupt WebP."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    try:
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            if cid == b"VP8L":
                from .vp8l import vp8l_pixels
                return vp8l_pixels(b[pos + 8:pos + 8 + clen],
                                   max_pixels=JPEG_PIXEL_BUDGET)
            if cid == b"VP8 ":
                from .vp8 import vp8_pixels
                return vp8_pixels(b[pos + 8:pos + 8 + clen],
                                  max_pixels=JPEG_PIXEL_BUDGET)
            if cid == b"VP8X":
                # r13: extended STILL images (ALPH + VP8/VP8L) decode;
                # animated ones stay with the frame tier
                return _webp_vp8x_still_pixels(b)
            pos += 8 + clen + (clen & 1)
        return None
    except (struct.error, IndexError):
        return None


def _alph_unfilter(flat: list, w: int, h: int, method: int) -> list:
    """Inverse of the ALPH chunk's per-row prediction filters
    (container spec; semantics of the deployed unfilters: the first
    pixel of a horizontally-filtered row predicts from the pixel
    ABOVE, vertical/gradient rows fall back to horizontal on row 0,
    gradient clips a+b-c to [0, 255])."""
    if method == 0:
        return flat
    out: list = [0] * (w * h)
    prev_base = None
    for r in range(h):
        base = r * w
        if method == 1 or prev_base is None:
            pred = out[prev_base] if prev_base is not None else 0
            for i in range(w):
                pred = (pred + flat[base + i]) & 0xFF
                out[base + i] = pred
        elif method == 2:
            for i in range(w):
                out[base + i] = (out[prev_base + i] + flat[base + i]) & 0xFF
        else:  # gradient
            left = top_left = out[prev_base]
            for i in range(w):
                top = out[prev_base + i]
                g = left + top - top_left
                g = 0 if g < 0 else 255 if g > 255 else g
                left = (flat[base + i] + g) & 0xFF
                top_left = top
                out[base + i] = left
        prev_base = base
    return out


def _alph_plane(body: bytes, w: int, h: int) -> list | None:
    """Flat w*h alpha values from an ALPH chunk body (r13), or None —
    raw or lossless-compressed (headerless VP8L stream via
    :func:`.vp8l.alpha_plane`) with the four prediction filters
    inverted; level-reduction preprocessing is honestly unsupported
    (returns None, header tier)."""
    if not body:
        return None
    hdr = body[0]
    comp = hdr & 3
    filt = (hdr >> 2) & 3
    pre = (hdr >> 4) & 3
    if pre != 0 or comp > 1:
        return None
    if comp == 0:
        if len(body) - 1 < w * h:
            return None
        flat = list(body[1:1 + w * h])
    else:
        from .vp8l import alpha_plane
        flat = alpha_plane(body[1:], w, h, max_pixels=JPEG_PIXEL_BUDGET)
        if flat is None:
            return None
    return _alph_unfilter(flat, w, h, filt)


def _webp_vp8x_still_pixels(b: bytes) -> tuple | None:
    """Pixels for an EXTENDED (VP8X) STILL WebP (r13): walks the
    chunks after VP8X for the base VP8/VP8L image and an optional
    ALPH plane; a lossy base + ALPH combines to RGBA rows (alpha
    decode per the container spec). Animated files return None (the
    frame tier owns them); corrupt sub-chunks return None (header
    tier)."""
    try:
        pos = 12
        alph = None
        base = None  # ("vp8"|"vp8l", body)
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8:pos + 8 + clen]
            if cid in (b"ANIM", b"ANMF"):
                return None
            if cid == b"ALPH":
                alph = body
            elif cid == b"VP8 " and base is None:
                base = ("vp8", body)
            elif cid == b"VP8L" and base is None:
                base = ("vp8l", body)
            pos += 8 + clen + (clen & 1)
        if base is None:
            return None
        kind, body = base
        if kind == "vp8l":
            # VP8L carries its own alpha; a stray ALPH is ignored
            from .vp8l import vp8l_pixels
            return vp8l_pixels(body, max_pixels=JPEG_PIXEL_BUDGET)
        from .vp8 import vp8_pixels
        px = vp8_pixels(body, max_pixels=JPEG_PIXEL_BUDGET)
        if px is None:
            return None
        w, h, _nch, rows = px
        if alph is None:
            return w, h, 3, rows
        plane = _alph_plane(alph, w, h)
        if plane is None:
            return None
        out = [[rows[y][x] + (plane[y * w + x],) for x in range(w)]
               for y in range(h)]
        return w, h, 4, out
    except (struct.error, IndexError):
        return None


def _webp_anmf_frames(b: bytes) -> list[tuple[int, int, bytes]] | None:
    """(frame_w, frame_h, image-chunk payload) per ANMF frame of an
    ANIMATED WebP (VP8X + ANIM + ANMF chunks), or None when the bytes
    are not an animated WebP. Strictly bounds-checked (the AVI-walk
    convention: forged sizes end the walk, never over-read); each
    frame's payload is its VP8L/VP8 chunk body (a leading ALPH chunk
    is skipped — alpha rides the honest-tier NULL for lossy)."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    frames: list[tuple[int, int, bytes]] = []
    saw_vp8x = False
    try:
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body_at = pos + 8
            if body_at + clen > len(b):
                break  # truncated tail: keep frames walked so far
            if cid == b"VP8X":
                saw_vp8x = True
            elif cid == b"ANMF" and clen >= 16:
                fw = 1 + int.from_bytes(b[body_at + 6:body_at + 9],
                                        "little")
                fh = 1 + int.from_bytes(b[body_at + 9:body_at + 12],
                                        "little")
                sub = body_at + 16
                sub_end = body_at + clen
                payload = b""
                while sub + 8 <= sub_end:
                    scid = b[sub:sub + 4]
                    (slen,) = struct.unpack_from("<I", b, sub + 4)
                    if sub + 8 + slen > sub_end:
                        break
                    if scid in (b"VP8L", b"VP8 "):
                        payload = b[sub + 8:sub + 8 + slen]
                        break
                    sub += 8 + slen + (slen & 1)
                frames.append((fw, fh, payload))
            pos = body_at + clen + (clen & 1)
    except (struct.error, IndexError):
        pass
    return frames if (saw_vp8x and frames) else None


def webp_frame_stats(b: bytes, n_sample: int = 3) -> dict | None:
    """ANIMATED-WebP FRAME SAMPLING tier (r12): walk the VP8X/ANMF
    container, decode up to ``n_sample`` evenly-spaced frames — each
    independently through the VP8L kernel, or (r13) the real VP8 intra
    decoder for lossy subframes (the honest tier: no canvas
    compositing/blending; an undecodable subframe keeps a NULL phash
    slot, the same convention as undecodable MJPEG chunks) — and emit
    per-frame average-hashes + pooled channel means for video-style
    near-dup. Non-animated or frameless WebP → None (static VP8L is
    an image; :func:`webp_decode` owns it)."""
    from .vp8 import vp8_pixels
    from .vp8l import vp8l_pixels

    frames = _webp_anmf_frames(b)
    if not frames:
        return None
    n = len(frames)
    k = min(n_sample, n)
    idx = sorted({(i * (n - 1)) // (k - 1) if k > 1 else 0
                  for i in range(k)})
    phashes: list[str | None] = []
    means_acc: list[list[float]] = []
    width = height = None
    for i in idx:
        fw, fh, payload = frames[i]
        px = (vp8l_pixels(payload, max_pixels=JPEG_PIXEL_BUDGET)
              if payload[:1] == b"\x2f"
              else vp8_pixels(payload, max_pixels=JPEG_PIXEL_BUDGET))
        if px is None:
            phashes.append(None)
            continue
        w_, h_, nch, rows = px
        means, ph = _pixel_stats(rows, nch)
        phashes.append(ph)
        means_acc.append(means[:3])
        if width is None:
            width, height = w_, h_
    pooled = ([sum(c) / len(means_acc) for c in zip(*means_acc)]
              if means_acc else None)
    return {
        "byte_len": len(b),
        "format": "webp-anim",
        "frame_count": n,
        "width": width,
        "height": height,
        "sampled_frames": [int(i) for i in idx],
        "frame_phashes": phashes,
        "channel_means": pooled,
    }


def encode_webp_anim(
    width: int, height: int,
    frames: list[list[list[tuple]]],
    duration_ms: int = 100,
    lossy_frame_at: int | None = None,
    lossy_payloads: dict[int, bytes] | None = None,
) -> bytes:
    """Synthesize an ANIMATED WebP (fixture generator): VP8X with the
    animation flag, ANIM, and one ANMF per frame carrying a real VP8L
    bitstream (``lossy_frame_at`` substitutes an INTER-frame VP8
    header at that index — undecodable without reference-frame state,
    exercising the NULL-slot path now that intra VP8 subframes decode
    for real via :mod:`.vp8`). ``lossy_payloads`` maps a frame index
    to a raw VP8 chunk body (e.g. from :func:`.vp8.encode_vp8`) so a
    REAL lossy intra subframe rides the animation (r13)."""
    from .vp8l import encode_vp8l

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + len(payload).to_bytes(4, "little") + payload
                + (b"\x00" if len(payload) & 1 else b""))

    vp8x = (bytes([0x02]) + bytes(3)
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little"))
    anim = bytes(4) + (0).to_bytes(2, "little")
    out = bytearray(chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim))
    for i, rows in enumerate(frames):
        if lossy_payloads is not None and i in lossy_payloads:
            img = chunk(b"VP8 ", lossy_payloads[i])
        elif lossy_frame_at is not None and i == lossy_frame_at:
            img = chunk(b"VP8 ", b"\x01\x00\x00" + b"\x9d\x01\x2a"
                        + width.to_bytes(2, "little")
                        + height.to_bytes(2, "little"))
        else:
            img = chunk(b"VP8L", encode_vp8l(width, height, rows))
        anmf = (bytes(3) + bytes(3)
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little")
                + duration_ms.to_bytes(3, "little") + bytes([0]) + img)
        out += chunk(b"ANMF", anmf)
    payload = b"WEBP" + bytes(out)
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def webp_decode(b: bytes) -> dict | None:
    """WebP metadata + pixel tier. RIFF container walk to the first
    VP8/VP8L/VP8X chunk for real dimensions — VP8 lossy (frame tag +
    14-bit dims), VP8L lossless (bit-packed 14-bit dims), VP8X
    extended (24-bit canvas). r12: VP8L chunks get a REAL pixel decode
    (canonical prefix codes, LZ77 + plane-code distances, color cache,
    all four transforms — :mod:`.vp8l`). r13 (verdict r12 missing #3):
    VP8 *lossy* chunks get a REAL intra-frame decode too (RFC 6386
    boolean coder, segmentation, B_PRED, token partitions, loop
    filter — :mod:`.vp8`, differentially verified bit-exact against
    libwebp), so channel means/phash come from decoded pixels for both
    codings; a corrupt bitstream falls back to this header parse with
    NULL stats (the JPEG-tier convention)."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    px = _webp_vp8l_pixels(b)
    if px is not None:
        width, height, nch, rows = px
        means, phash = _pixel_stats(rows, nch)
        return {
            "byte_len": len(b),
            "format": "webp",
            "width": width,
            "height": height,
            "channels": nch,
            "channel_means": means,
            "phash": phash,
        }
    try:
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = b[pos + 8:pos + 8 + clen]
            if cid == b"VP8 " and len(body) >= 10:
                # lossy: 3-byte frame tag, sync 9D 012A, 14-bit w/h
                if body[3:6] != b"\x9d\x01\x2a":
                    return None
                w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
                h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
                ch = 3
            elif cid == b"VP8L" and len(body) >= 5:
                if body[0] != 0x2F:
                    return None
                bits = struct.unpack_from("<I", body, 1)[0]
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                ch = 4 if (bits >> 28) & 1 else 3
            elif cid == b"VP8X" and len(body) >= 10:
                w = (body[4] | (body[5] << 8) | (body[6] << 16)) + 1
                h = (body[7] | (body[8] << 8) | (body[9] << 16)) + 1
                ch = 4 if body[0] & 0x10 else 3
            else:
                pos += 8 + clen + (clen & 1)
                continue
            if not w or not h:
                return None
            return {
                "byte_len": len(b),
                "format": "webp",
                "width": int(w),
                "height": int(h),
                "channels": int(ch),
                "channel_means": None,
                "phash": None,
            }
        return None
    except (struct.error, IndexError):
        return None


_JPEG_SIG = b"\xff\xd8\xff"
# SOFn frame-header markers: 0xC0-0xCF minus DHT (C4), JPG (C8), DAC (CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_decode(b: bytes) -> dict | None:
    """Pure-Python JPEG decode. r9 (verdict #4): baseline/extended-
    sequential streams (SOF0/SOF1) get a REAL pixel decode —
    ``jpeg_pixel_decode``: DHT-driven Huffman entropy decode, dequant,
    IDCT, sampling-factor upsample, YCbCr→RGB, channel means + average-
    hash — and so do progressive streams (SOF2, r10 verdict #6: the
    spectral-selection / successive-approximation scans accumulate
    quantized coefficients, reconstructed once at EOI through the SAME
    dequant/IDCT/upsample/color tail). Anything it can't decode
    (arithmetic-coded, lossless, hierarchical,
    corrupt/absent scan data) falls back to the r5 HEADER parse below:
    walk the marker segments to the first SOFn frame header and read
    real width/height/channels with ``channel_means``/``phash`` null —
    header metadata is never fabricated into pixel stats. Corrupt/
    truncated marker stream → None (null meta row)."""
    if not b.startswith(_JPEG_SIG):
        return None
    px = jpeg_pixel_decode(b)
    if px is not None:
        return px
    try:
        pos = 2  # past SOI
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None  # lost marker sync
            while pos < len(b) and b[pos] == 0xFF:
                pos += 1  # fill bytes before a marker are legal
            if pos >= len(b):
                return None
            marker = b[pos]
            pos += 1
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue  # standalone markers: no length field
            if marker == 0xD9:  # EOI before any SOF
                return None
            (seg_len,) = struct.unpack_from(">H", b, pos)
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                # SOF payload: precision(1) height(2) width(2) ncomp(1)
                _prec, height, width, ncomp = struct.unpack_from(
                    ">BHHB", b, pos + 2)
                if not width or not height or ncomp not in (1, 3, 4):
                    return None
                return {
                    "byte_len": len(b),
                    "format": "jpeg",
                    "width": int(width),
                    "height": int(height),
                    "channels": int(ncomp),
                    "channel_means": None,
                    "phash": None,
                }
            if marker == 0xDA:
                return None  # SOS before SOF: not a valid frame
            pos += seg_len
        return None
    except struct.error:
        return None


def _tiff_num(b: bytes, off: int, n: int, le: bool) -> int:
    if off + n > len(b):
        raise IndexError("tiff field out of bounds")
    return int.from_bytes(b[off:off + n], "little" if le else "big")


def _tiff_ifd_entries(t: bytes, ifd_off: int, le: bool):
    """Yield (tag, type, count, value_or_offset_field_offset) for the
    IFD at ``ifd_off`` of a TIFF block ``t``; bounds-checked."""
    n = _tiff_num(t, ifd_off, 2, le)
    if n > 512:
        raise IndexError("implausible IFD entry count")
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        yield (_tiff_num(t, e, 2, le), _tiff_num(t, e + 2, 2, le),
               _tiff_num(t, e + 4, 4, le), e + 8)


def _tiff_ascii(t: bytes, count: int, field_off: int, le: bool) -> str | None:
    off = field_off if count <= 4 else _tiff_num(t, field_off, 4, le)
    if off + count > len(t):
        return None
    return t[off:off + count].split(b"\x00")[0].decode(
        "ascii", "replace") or None


# IFD0 tags a curation pipeline cares about
_EXIF_MAKE, _EXIF_MODEL = 0x010F, 0x0110
_EXIF_ORIENTATION, _EXIF_DATETIME = 0x0112, 0x0132
_EXIF_GPS_IFD = 0x8825


def jpeg_exif(b: bytes) -> dict | None:
    """EXIF metadata from a JPEG's APP1 segment (r12) — the PII tier
    for image corpora: real crawled photos carry camera make/model,
    capture timestamps, and GPS COORDINATES that must not survive into
    training data. Parses the TIFF block (both byte orders) for the
    IFD0 tags that matter (orientation, datetime, make, model) and
    detects the GPS sub-IFD (``has_gps`` + its tag count — presence is
    the curation signal; the coordinates themselves are deliberately
    not extracted). A JPEG with no Exif APP1 returns ``has_exif:
    False`` with NULL fields (a real answer, distinct from corrupt
    bytes → None)."""
    if not b.startswith(_JPEG_SIG):
        return None
    out = {"byte_len": len(b), "format": "jpeg", "has_exif": False,
           "orientation": None, "datetime": None, "make": None,
           "model": None, "has_gps": False, "n_gps_tags": 0}
    try:
        pos = 2
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None  # lost sync pre-SOS: unparseable, not "no EXIF"
            while pos < len(b) and b[pos] == 0xFF:
                pos += 1
            if pos >= len(b):
                return None
            marker = b[pos]
            pos += 1
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                continue
            if marker in (0xD9, 0xDA):
                return out  # entropy data / end: no (more) APP1
            (seg_len,) = struct.unpack_from(">H", b, pos)
            if seg_len < 2:
                return None
            if marker == 0xE1 and b[pos + 2:pos + 8] == b"Exif\x00\x00":
                t = b[pos + 8:pos + seg_len]
                le = t[:2] == b"II"
                if not (le or t[:2] == b"MM") or _tiff_num(t, 2, 2, le) != 42:
                    return out  # malformed TIFF block: keep has_exif False
                out["has_exif"] = True
                gps_off = None
                for tag, typ, count, foff in _tiff_ifd_entries(
                        t, _tiff_num(t, 4, 4, le), le):
                    if tag == _EXIF_ORIENTATION and typ == 3:
                        out["orientation"] = _tiff_num(t, foff, 2, le)
                    elif tag == _EXIF_DATETIME and typ == 2:
                        out["datetime"] = _tiff_ascii(t, count, foff, le)
                    elif tag == _EXIF_MAKE and typ == 2:
                        out["make"] = _tiff_ascii(t, count, foff, le)
                    elif tag == _EXIF_MODEL and typ == 2:
                        out["model"] = _tiff_ascii(t, count, foff, le)
                    elif tag == _EXIF_GPS_IFD and typ == 4:
                        gps_off = _tiff_num(t, foff, 4, le)
                if gps_off is not None:
                    n = sum(1 for _ in _tiff_ifd_entries(t, gps_off, le))
                    out["has_gps"] = n > 0
                    out["n_gps_tags"] = n
                return out
            pos += seg_len
        return None  # truncated before SOS/EOI: unparseable
    except (struct.error, IndexError):
        return None


def strip_jpeg_metadata(b: bytes, keep_jfif: bool = True) -> bytes | None:
    """JPEG bytes with every APP1–APP13/APP15 and COM segment removed
    (APP0 JFIF kept by default; APP14 Adobe ALWAYS kept — it carries
    the color-transform flag that governs decoding of Adobe CMYK/YCCK
    JPEGs, so dropping it changes pixel interpretation, r12 ADVICE) —
    LOSSLESS byte surgery: the entropy-coded image data from SOS
    onward passes through verbatim, so pixels are bit-identical
    (differential-tested) while EXIF (GPS, serials, timestamps), XMP,
    ICC and comments disappear. None when the pre-SOS marker structure
    can't be parsed — a PII-stripping pipeline must QUARANTINE what it
    cannot verify, never pass it through silently."""
    if not b.startswith(_JPEG_SIG):
        return None
    out = bytearray(b[:2])
    pos = 2
    try:
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None  # unparseable pre-SOS structure
            mstart = pos
            while pos < len(b) and b[pos] == 0xFF:
                pos += 1
            if pos >= len(b):
                return None
            marker = b[pos]
            pos += 1
            if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
                out += b[mstart:pos]
                continue
            if marker == 0xD9:
                out += b[mstart:pos]
                return bytes(out)
            if marker == 0xDA:
                out += b[mstart:]  # entropy data verbatim to EOF
                return bytes(out)
            (seg_len,) = struct.unpack_from(">H", b, pos)
            if seg_len < 2 or pos + seg_len > len(b):
                return None
            drop = (0xE1 <= marker <= 0xEF and marker != 0xEE) \
                or marker == 0xFE \
                or (marker == 0xE0 and not keep_jfif)
            if not drop:
                out += b[mstart:pos + seg_len]
            pos += seg_len
        return None  # ended before SOS/EOI: truncated
    except struct.error:
        return None


# PNG chunks that affect pixel decoding; everything else (eXIf, tEXt,
# iTXt, zTXt, tIME, pHYs, ...) is metadata a curation pipeline strips
_PNG_KEEP = {b"IHDR", b"PLTE", b"IDAT", b"IEND", b"tRNS"}


def strip_png_metadata(b: bytes) -> bytes | None:
    """PNG bytes with every non-pixel chunk removed (keeps IHDR/PLTE/
    IDAT/IEND/tRNS verbatim — CRCs preserved, pixels bit-identical);
    drops eXIf, text, and time chunks. None for corrupt structure
    (quarantine contract, as :func:`strip_jpeg_metadata`)."""
    if not b.startswith(_PNG_SIG):
        return None
    out = bytearray(_PNG_SIG)
    pos = len(_PNG_SIG)
    saw_end = False
    try:
        while pos + 8 <= len(b):
            (length,) = struct.unpack(">I", b[pos:pos + 4])
            ctype = b[pos + 4:pos + 8]
            end = pos + 12 + length
            if end > len(b):
                return None
            if ctype in _PNG_KEEP:
                out += b[pos:end]
            if ctype == b"IEND":
                saw_end = True
                break
            pos = end
        return bytes(out) if saw_end else None
    except struct.error:
        return None


def strip_image_metadata_bytes(b: bytes) -> bytes | None:
    """Metadata-stripping dispatch (JPEG APP/COM segments, PNG
    ancillary chunks). None for formats we cannot parse AND VERIFY —
    the quarantine contract: a PII pipeline routes None rows to review
    instead of shipping bytes whose metadata state is unknown."""
    if b.startswith(_JPEG_SIG):
        return strip_jpeg_metadata(b)
    if b.startswith(_PNG_SIG):
        return strip_png_metadata(b)
    return None


_EXIF_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("has_exif", T.BooleanType()),
    T.StructField("orientation", T.IntegerType()),
    T.StructField("datetime", T.StringType()),
    T.StructField("make", T.StringType()),
    T.StructField("model", T.StringType()),
    T.StructField("has_gps", T.BooleanType()),
    T.StructField("n_gps_tags", T.IntegerType()),
]


def extract_exif(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "exif_meta",
) -> DataFrame:
    """EXIF metadata from a JPEG binary column — the same narrow
    Arrow-batched plumbing as the other decoders (r12). GPS presence
    (``exif_meta.has_gps``) is the filter/redaction signal."""
    return _map_binary_column(
        df, content_col, out_col, jpeg_exif, T.StructType(_EXIF_FIELDS))


def strip_image_metadata(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "clean_content",
) -> DataFrame:
    """Append a metadata-stripped copy of an image binary column
    (JPEG/PNG; pixels bit-identical, EXIF/XMP/ICC/text gone). NULL
    out rows are the quarantine set — bytes whose metadata state
    could not be verified."""
    return _map_binary_column(
        df, content_col, out_col, strip_image_metadata_bytes,
        T.BinaryType())


def encode_exif_app1(
    orientation: int = 1,
    datetime: str | None = None,
    make: str | None = None,
    model: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """A complete APP1 Exif segment (marker + length + TIFF block) for
    splicing after SOI in any JPEG fixture — both byte orders; ``gps``
    (lat, lon) writes a real GPS sub-IFD (ref + 3-rational coordinate
    per axis), so the PII-detection path sees authentic structure."""
    le = byte_order == "II"

    def num(v, n):
        return v.to_bytes(n, "little" if le else "big")

    entries = []   # (tag, type, count, inline4_or_None, outofline_bytes)

    def ascii_entry(tag, s):
        raw = s.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            entries.append((tag, 2, len(raw), raw.ljust(4, b"\x00"), b""))
        else:
            entries.append((tag, 2, len(raw), None, raw))

    if make:
        ascii_entry(_EXIF_MAKE, make)
    if model:
        ascii_entry(_EXIF_MODEL, model)
    entries.append((_EXIF_ORIENTATION, 3, 1,
                    num(orientation, 2) + b"\x00\x00", b""))
    if datetime:
        ascii_entry(_EXIF_DATETIME, datetime)

    gps_blob = b""
    if gps is not None:
        entries.append((_EXIF_GPS_IFD, 4, 1, None, b"GPSIFD"))

    entries.sort(key=lambda e: e[0])
    ifd0_off = 8
    data_off = ifd0_off + 2 + 12 * len(entries) + 4
    body = bytearray()
    ifd = bytearray(num(len(entries), 2))
    for tag, typ, count, inline, out_of_line in entries:
        ifd += num(tag, 2) + num(typ, 2) + num(count, 4)
        if inline is not None:
            ifd += inline
        elif out_of_line == b"GPSIFD":
            ifd += num(data_off + len(body) + len(gps_blob), 4)
            # GPS IFD: ref strings + 3-rational lat/lon
            lat, lon = gps
            g = []

            def rat3(v):
                d, m = divmod(abs(v) * 3600, 3600)
                mm, s = divmod(m, 60)
                return ((int(d), 1), (int(mm), 1),
                        (int(round(s * 100)), 100))

            rats = rat3(lat) + rat3(lon)
            gps_n = 4
            gps_data_off = (data_off + len(body) + 2 + 12 * gps_n + 4)
            gifd = bytearray(num(gps_n, 2))
            gifd += (num(1, 2) + num(2, 2) + num(2, 4)
                     + (b"N\x00" if lat >= 0 else b"S\x00") + b"\x00\x00")
            gifd += num(2, 2) + num(5, 2) + num(3, 4) + num(gps_data_off, 4)
            gifd += (num(3, 2) + num(2, 2) + num(2, 4)
                     + (b"E\x00" if lon >= 0 else b"W\x00") + b"\x00\x00")
            gifd += (num(4, 2) + num(5, 2) + num(3, 4)
                     + num(gps_data_off + 24, 4))
            gifd += num(0, 4)  # next IFD
            for nu, de in rats:
                g.append(num(nu, 4) + num(de, 4))
            gps_blob = bytes(gifd) + b"".join(g)
        else:
            ifd += num(data_off + len(body), 4)
            body += out_of_line
    ifd += num(0, 4)  # next-IFD pointer
    tiff = ((b"II" if le else b"MM") + num(42, 2) + num(ifd0_off, 4)
            + bytes(ifd) + bytes(body) + gps_blob)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload


def py_decode(b: bytes) -> dict | None:
    """Real pure-Python decode for known containers (PNG, BMP, GIF full
    decode; JPEG baseline/progressive pixel decode with header fallback;
    WebP VP8L — r12 — AND lossy VP8 — r13 — pixel decode with header
    fallback for corrupt streams), magic-byte dispatched; None for
    unknown/corrupt bytes."""
    if b.startswith(_PNG_SIG):
        return png_decode(b)
    if b.startswith(b"BM"):
        return bmp_decode(b)
    if b.startswith(_JPEG_SIG):
        return jpeg_decode(b)
    if b.startswith(b"GIF87a") or b.startswith(b"GIF89a"):
        return gif_decode(b)
    if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
        return webp_decode(b)
    return None


def pil_decode(b: bytes) -> dict | None:
    """PIL codec branch: metadata, per-band means, 8×8 average-hash.
    Undecodable blobs → None (null meta row), mirroring the reference's
    skip-bad-media behavior."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(b)) as im:
            width, height = im.size
            fmt = (im.format or "unknown").lower()
            bands = im.getbands()
            means = []
            for band in im.split():
                data = list(band.getdata())
                means.append(sum(data) / len(data))
            gray = im.convert("L").resize((8, 8))
            px = list(gray.getdata())
    except Exception:
        return None
    avg = sum(px) / len(px)
    bits = 0
    for p in px:
        bits = (bits << 1) | (1 if p >= avg else 0)
    return {
        "byte_len": len(b),
        "format": fmt,
        "width": int(width),
        "height": int(height),
        "channels": len(bands),
        "channel_means": means,
        "phash": f"{bits:016x}",
    }


_LIBWEBP = "unloaded"


def _load_libwebp():
    """Lazy per-process handle to the system libwebp (executor-side:
    each Python worker loads it once). None when absent."""
    global _LIBWEBP
    if _LIBWEBP == "unloaded":
        import ctypes
        import ctypes.util
        _LIBWEBP = None
        for name in ("libwebp.so.7", "libwebp.so",
                     ctypes.util.find_library("webp")):
            if not name:
                continue
            try:
                lw = ctypes.CDLL(name)
            except OSError:
                continue
            lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lw.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lw.WebPFree.argtypes = [ctypes.c_void_p]
            _LIBWEBP = lw
            break
    return _LIBWEBP


def libwebp_decode(b: bytes) -> dict | None:
    """NATIVE-codec plug-in for the ``decoder=`` escape hatch (r13):
    decodes WebP (lossy, lossless, animated first frame) through the
    system libwebp via ctypes — the production-shaped "real codec
    library" branch the media tiers document, shipped rather than just
    documented now that this container carries libwebp. Returns the
    standard meta dict (RGBA means + 8x8 average-hash over the
    mean-of-RGB luma, the :func:`_pixel_stats` convention); None for
    non-WebP bytes, undecodable streams, or when the library is
    absent (callers fall back to :func:`py_decode`).

    Note the phash/means are computed from libwebp's OWN RGB
    conversion (fancy chroma upsampling), so they intentionally may
    differ from the pure-Python tier's documented BT.601
    nearest-neighbor mapping — plug-in decoders own their color
    pipeline."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    lw = _load_libwebp()
    if lw is None:
        return None
    import ctypes
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = lw.WebPDecodeRGBA(b, len(b), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        return None
    try:
        width, height = w.value, h.value
        if not width or not height or width * height > JPEG_PIXEL_BUDGET:
            return None
        raw = ctypes.string_at(buf, width * height * 4)
    finally:
        lw.WebPFree(buf)
    rows = [[tuple(raw[(y * width + x) * 4:(y * width + x) * 4 + 4])
             for x in range(width)] for y in range(height)]
    means, phash = _pixel_stats(rows, 4)
    return {
        "byte_len": len(b),
        "format": "webp",
        "width": int(width),
        "height": int(height),
        "channels": 4,
        "channel_means": means,
        "phash": phash,
    }


def auto_decode(b: bytes) -> dict | None:
    """Default decoder chain: real pure-Python decode for known containers
    (PNG/BMP/GIF full pixels — corrupt container bytes stay None, never
    faked); PIL for other formats when importable; else the real JPEG
    pixel/header tiers and the WebP header tier, then the deterministic
    fake (test-shim path for non-media bytes)."""
    if (b.startswith(_PNG_SIG) or b.startswith(b"BM")
            or b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        return py_decode(b)
    if HAVE_PIL:  # pragma: no cover - PIL not in this container
        return pil_decode(b)
    if b.startswith(_JPEG_SIG):
        # no PIL: real header parse (dims/channels) beats the fake; pixel
        # stats stay null rather than fabricated
        return jpeg_decode(b)
    if b.startswith(b"RIFF") and b[8:12] == b"WEBP":
        return webp_decode(b)
    return fake_decode(b)


def encode_png(width: int, height: int, pixel) -> bytes:
    """Minimal pure-Python PNG writer (color type 2 / RGB8, filter 0) for
    synthesizing REAL image bytes in tests and oracles. ``pixel`` is either
    an (r, g, b) tuple (solid fill) or a ``(x, y) -> (r, g, b)`` function."""
    fn = pixel if callable(pixel) else (lambda x, y: pixel)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        for x in range(width):
            raw.extend(fn(x, y))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


_AUDIO_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
]


def wav_decode(b: bytes) -> dict | None:
    """Pure-Python WAV (RIFF) metadata parse: fmt chunk → sample rate /
    channels / bit depth, data chunk → frame count and duration. PCM and
    IEEE-float formats; corrupt/truncated chunk streams → None. The audio
    analogue of :func:`jpeg_decode` — real container metadata without a
    sample decoder (resampling/feature work plugs in via the decoder
    hook)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        pos = 12
        rate = channels = bits = None
        fmt_tag = None
        data_len = None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            if cid == b"fmt " and clen >= 16:
                fmt_tag, channels, rate, _br, block, bits = struct.unpack_from(
                    "<HHIIHH", b, body)
                if fmt_tag not in (1, 3) or not channels or not rate or not bits:
                    return None  # PCM / IEEE float only
                if block != channels * bits // 8:
                    return None
            elif cid == b"data":
                data_len = min(clen, len(b) - body)
            pos = body + clen + (clen & 1)  # chunks are word-aligned
        if rate is None or data_len is None:
            return None
        frame_bytes = channels * bits // 8
        n_frames = data_len // frame_bytes if frame_bytes else 0
        return {
            "byte_len": len(b),
            "format": "wav-float" if fmt_tag == 3 else "wav-pcm",
            "sample_rate": int(rate),
            "channels": int(channels),
            "bits_per_sample": int(bits),
            "n_frames": int(n_frames),
            "duration_s": round(n_frames / rate, 6),
        }
    except struct.error:
        return None


def encode_wav(
    sample_rate: int = 16000, channels: int = 1, bits: int = 16,
    n_frames: int = 0, tone_hz: float | None = None,
    amplitude: float = 0.5, samples=None,
) -> bytes:
    """Synthesize a structurally-valid PCM WAV for tests: the chunk walk
    sees real fmt/data metadata. Default payload is silence;
    ``tone_hz`` writes a real sine tone (late r10 — the
    :func:`audio_features` fixtures need actual signal), ``samples=`` a
    numpy float array in [-1, 1] (mono; replicated across channels).
    16-bit PCM only for non-silent payloads."""
    frame_bytes = channels * bits // 8
    if samples is not None or tone_hz is not None:
        import numpy as np

        if bits != 16:
            raise ValueError("non-silent fixtures are 16-bit PCM only")
        if samples is None:
            t = np.arange(n_frames, dtype=np.float64) / sample_rate
            samples = amplitude * np.sin(2.0 * math.pi * tone_hz * t)
        samples = np.clip(np.asarray(samples, dtype=np.float64), -1, 1)
        n_frames = len(samples)
        pcm = np.rint(samples * 32767.0).astype("<i2")
        if channels > 1:
            pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
        data = pcm.tobytes()
    else:
        data = bytes(n_frames * frame_bytes)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * frame_bytes,
        frame_bytes, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# MPEG audio (Layer III) header tables — version code: 3=MPEG1,
# 2=MPEG2, 0=MPEG2.5 (1 is reserved)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}
_MP3_BR = {3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320),
           2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
               160)}
_MP3_BR[0] = _MP3_BR[2]


def _mp3_frame(b: bytes, p: int):
    """Parse one MPEG Layer III frame header at offset ``p``:
    (rate, kbps, samples_per_frame, frame_len, channels) or None."""
    if p + 4 > len(b):
        return None
    h = b[p:p + 4]
    if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    ver = (h[1] >> 3) & 3
    layer = (h[1] >> 1) & 3
    if ver == 1 or layer != 1:  # reserved version / not Layer III
        return None
    bi = (h[2] >> 4) & 15
    si = (h[2] >> 2) & 3
    pad = (h[2] >> 1) & 1
    if bi in (0, 15) or si == 3:  # free-format / bad indexes
        return None
    rate = _MP3_RATES[ver][si]
    kbps = _MP3_BR[ver][bi]
    spf = 1152 if ver == 3 else 576
    flen = (spf // 8) * kbps * 1000 // rate + pad
    mode = (h[3] >> 6) & 3
    return rate, kbps, spf, flen, (1 if mode == 3 else 2)


def mp3_decode(b: bytes) -> dict | None:
    """MP3 HEADER-TIER metadata (r11, verdict next #7 — MP3/FLAC are
    the majority of crawled audio and previously got no tier at all):
    skip an ID3v2 envelope, locate the first MPEG Layer III frame sync
    (scanning ≤ 2 KiB of leading junk, validated by a SECOND chained
    frame — a lone 11-bit sync in random bytes is too weak), then WALK
    the frame chain summing samples-per-frame — exact duration for CBR
    and VBR alike, no Xing estimate. ``bits_per_sample`` is NULL
    (lossy); ``n_frames`` is total PCM samples, the :func:`wav_decode`
    convention. Corrupt / non-MP3 bytes → None."""
    if len(b) < 8:
        return None
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + size
    start = None
    for p in range(pos, min(pos + 2048, len(b))):
        f = _mp3_frame(b, p)
        if f and _mp3_frame(b, p + f[3]):
            start = p
            break
    if start is None:
        return None
    rate0 = ch0 = None
    total = nfr = 0
    p = start
    while True:
        f = _mp3_frame(b, p)
        if f is None:
            break
        rate, _kbps, spf, flen, nch = f
        if rate0 is None:
            rate0, ch0 = rate, nch
        total += spf
        nfr += 1
        p += flen
        if p >= len(b):
            break
    if nfr < 2:
        return None
    return {
        "byte_len": len(b),
        "format": "mp3",
        "sample_rate": int(rate0),
        "channels": int(ch0),
        "bits_per_sample": None,
        "n_frames": int(total),
        "duration_s": round(total / rate0, 6),
    }


def encode_mp3(sample_rate: int = 44100, bitrate_kbps: int = 128,
               n_frames: int = 10, channels: int = 2,
               id3: bool = False) -> bytes:
    """Synthesize a structurally-valid MPEG-1 Layer III stream for
    tests: real frame headers with correct frame lengths and zeroed
    payloads (the header walk never reads the entropy data); optional
    10-byte ID3v2 envelope."""
    si = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    bi = _MP3_BR[3].index(bitrate_kbps)
    out = bytearray()
    if id3:
        out += b"ID3\x03\x00\x00" + bytes([0, 0, 0, 10]) + bytes(10)
    hdr = bytes([0xFF, 0xFB, (bi << 4) | (si << 2),
                 0x00 if channels > 1 else 0xC0])
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    for _ in range(n_frames):
        out += hdr + bytes(flen - 4)
    return bytes(out)


def flac_decode(b: bytes) -> dict | None:
    """FLAC HEADER-TIER metadata (r11): walk the metadata blocks to
    STREAMINFO (type 0, 34 bytes) for sample rate (20 bits), channels
    (3 + 1), bits per sample (5 + 1), and the 36-bit total-sample
    count (0 = unknown → NULL duration). Corrupt → None."""
    if len(b) < 8 or b[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(b):
        last = b[pos] & 0x80
        btype = b[pos] & 0x7F
        blen = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + blen]
        if btype == 0:
            if len(body) < 34:
                return None
            packed = int.from_bytes(body[10:18], "big")
            rate = packed >> 44
            chs = ((packed >> 41) & 7) + 1
            bps = ((packed >> 36) & 31) + 1
            total = packed & ((1 << 36) - 1)
            if not rate:
                return None
            return {
                "byte_len": len(b),
                "format": "flac",
                "sample_rate": int(rate),
                "channels": int(chs),
                "bits_per_sample": int(bps),
                "n_frames": int(total),
                "duration_s": round(total / rate, 6) if total else None,
            }
        if btype == 127 or last:
            return None  # invalid type / stream ends without STREAMINFO
        pos += 4 + blen
    return None


def encode_flac_header(sample_rate: int = 44100, channels: int = 2,
                       bits: int = 16, total_samples: int = 0) -> bytes:
    """Synthesize a fLaC signature + STREAMINFO block for tests."""
    info = struct.pack(">HH", 4096, 4096) + bytes(6)
    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | (total_samples & ((1 << 36) - 1)))
    info += packed.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + info


def _ogg_page_granule(b: bytes, p: int, serial: bytes | None = None):
    """Granule position of a STRUCTURALLY VALID Ogg page header at
    offset ``p``, else None: version must be 0, header-type flags fit
    in 3 bits, the segment table must fit, and the granule must be
    non-negative (-1 marks a continuation page). When ``serial`` is
    given the page's bitstream serial (bytes 14-18) must match it, so
    a multiplexed/chained Ogg never reports another logical stream's
    granule at the id stream's rate (r12 advisory). CRCs are not
    checked (metadata tier), but the structural gate rejects the
    common false sync — 'OggS' occurring inside compressed payload
    bytes (r11 review: an unvalidated rfind match decoded payload
    bytes as a granule, silently poisoning durations)."""
    if p + 27 > len(b) or b[p + 4] != 0 or b[p + 5] & 0xF8:
        return None
    if p + 27 + b[p + 26] > len(b):
        return None
    if serial is not None and b[p + 14:p + 18] != serial:
        return None
    g = int.from_bytes(b[p + 6:p + 14], "little", signed=True)
    return g if g >= 0 else None


def ogg_decode(b: bytes) -> dict | None:
    """OGG HEADER-TIER metadata (r11): parse the first page's codec
    identification header (Vorbis ``\\x01vorbis`` or Opus ``OpusHead``)
    for rate/channels, and the LAST structurally-valid page's granule
    position for total samples — the standard O(1) Ogg duration read.
    Vorbis granules are PCM samples at the stream rate. Opus granules
    run at 48 kHz (including pre-skip) and Opus always decodes at
    48 kHz, so ``sample_rate`` is reported as 48000 — the OpusHead
    input-rate field is informational and may legitimately be 0 (RFC
    7845 §5.1) — keeping the ``duration_s == n_frames / sample_rate``
    convention every audio tier follows. Corrupt / non-audio Ogg →
    None."""
    if len(b) < 28 or b[:4] != b"OggS" or b[4] != 0:
        return None
    try:
        nseg = b[26]
        hdr_len = 27 + nseg
        if hdr_len > len(b):
            return None
        payload = b[hdr_len:hdr_len + sum(b[27:27 + nseg])]
        pre = 0
        if payload.startswith(b"\x01vorbis") and len(payload) >= 16:
            fmt = "ogg-vorbis"
            ch = payload[11]
            rate = int.from_bytes(payload[12:16], "little")
        elif payload.startswith(b"OpusHead") and len(payload) >= 19:
            fmt = "ogg-opus"
            ch = payload[9]
            pre = int.from_bytes(payload[10:12], "little")
            rate = 48000  # decode rate; header input-rate is advisory
        else:
            return None
        if not rate or not ch:
            return None
        # last page granule: scan rfind candidates BACKWARDS until one
        # validates structurally (payload bytes can contain 'OggS') AND
        # carries the id stream's serial — chained/multiplexed files
        # interleave pages from other logical streams whose granules
        # run at a different rate.
        serial = b[14:18]
        granule = None
        p = b.rfind(b"OggS")
        while p >= 0:
            g = _ogg_page_granule(b, p, serial)
            if g is not None:
                granule = g
                break
            p = b.rfind(b"OggS", 0, p)
        if fmt == "ogg-opus":
            total = max(0, (granule or 0) - pre)
        else:
            total = granule or 0
        dur = round(total / rate, 6) if granule is not None else None
        return {
            "byte_len": len(b),
            "format": fmt,
            "sample_rate": int(rate),
            "channels": int(ch),
            "bits_per_sample": None,
            "n_frames": int(total),
            "duration_s": dur,
        }
    except (IndexError, struct.error):
        return None


def encode_ogg(codec: str = "vorbis", sample_rate: int = 44100,
               channels: int = 2, total_samples: int = 0,
               pre_skip: int = 0) -> bytes:
    """Synthesize a minimal two-page Ogg stream (id-header page + one
    data page carrying the final granule) for tests."""
    if codec == "vorbis":
        idh = (b"\x01vorbis" + (0).to_bytes(4, "little")
               + bytes([channels]) + sample_rate.to_bytes(4, "little")
               + bytes(16))
        final_granule = total_samples
    elif codec == "opus":
        idh = (b"OpusHead" + bytes([1, channels])
               + pre_skip.to_bytes(2, "little")
               + sample_rate.to_bytes(4, "little") + bytes(5))
        final_granule = total_samples + pre_skip
    else:
        raise ValueError(f"codec must be 'vorbis' or 'opus', got {codec!r}")

    def page(payload: bytes, granule: int, seq: int, htype: int) -> bytes:
        segs = []
        rem = len(payload)
        while rem >= 255:
            segs.append(255)
            rem -= 255
        segs.append(rem)
        return (b"OggS\x00" + bytes([htype])
                + granule.to_bytes(8, "little")
                + (1).to_bytes(4, "little") + seq.to_bytes(4, "little")
                + bytes(4) + bytes([len(segs)]) + bytes(segs) + payload)

    return page(idh, 0, 0, 2) + page(bytes(10), final_granule, 1, 4)


def audio_decode(b: bytes) -> dict | None:
    """Default audio metadata chain (r11): WAV (full chunk walk), FLAC
    STREAMINFO, OGG (Vorbis/Opus id header + last-page granule), then
    the MP3 frame-walk (which safely rejects non-MPEG bytes via the
    chained-sync validation). The pluggable-decoder slot of
    :func:`decode_audio_metadata`."""
    if b[:4] == b"RIFF":
        return wav_decode(b)
    if b[:4] == b"fLaC":
        return flac_decode(b)
    if b[:4] == b"OggS":
        return ogg_decode(b)
    return mp3_decode(b)


def wav_pcm(b: bytes, with_meta: bool = False):
    """Decode a PCM/IEEE-float WAV's samples to a mono float64 numpy
    array in [-1, 1] (channels averaged) plus the sample rate:
    ``(samples, rate)`` — or None for anything :func:`wav_decode`
    rejects or a non-integer-byte layout. ``with_meta=True`` returns
    ``(samples, rate, meta)`` with the :func:`wav_decode` dict it
    already walked, so callers needing both don't parse the blob twice
    (verdict r10 advisory #3). The real sample decoder behind
    :func:`audio_features` (pure numpy frombuffer, no audio libs)."""
    import numpy as np

    meta = wav_decode(b)
    if meta is None or not meta["n_frames"]:
        return None
    try:
        pos = 12
        raw = None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            if cid == b"data":
                raw = b[pos + 8:pos + 8 + min(clen, len(b) - pos - 8)]
                break
            pos += 8 + clen + (clen & 1)
        if raw is None:
            return None
        bits, ch = meta["bits_per_sample"], meta["channels"]
        if meta["format"] == "wav-float" and bits == 32:
            x = np.frombuffer(raw[:len(raw) // 4 * 4], dtype="<f4") \
                .astype(np.float64)
        elif bits == 16:
            x = np.frombuffer(raw[:len(raw) // 2 * 2], dtype="<i2") \
                .astype(np.float64) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8)
                 .astype(np.float64) - 128.0) / 128.0
        else:
            return None
        if ch > 1:
            x = x[:len(x) // ch * ch].reshape(-1, ch).mean(axis=1)
        if with_meta:
            return x, meta["sample_rate"], meta
        return x, meta["sample_rate"]
    except (struct.error, ValueError):
        return None


_AUDIO_N_BANDS = 16
# fingerprint-internal grid (r11, verdict next #2): every clip is
# resampled to this rate before band analysis so the SAME content
# re-encoded at 22.05/44.1/48 kHz lands on the SAME band trajectories
# (Haitsma & Kalker 2002 downsample to a fixed internal rate — they use
# 5 kHz; 8 kHz keeps content to 4 kHz, covering speech + most music
# fundamentals). Frame is fixed in SAMPLES of that grid, i.e. fixed in
# TIME (128 ms), not in file-native samples.
_AFP_RATE = 8000
_AFP_FRAME = 1024


def _band_loge_from_spec(spec, freqs, rate: float, n_bands: int,
                         lo: float = 60.0):
    """Per-frame log10 band energies over log-spaced edges lo..Nyquist
    from an existing (n_frames, n_bins) power spectrum. The relative
    (per-frame-total) floor keeps near-empty bands from being dominated
    by an absolute epsilon at low amplitude — that would break the
    fingerprint's amplitude invariance (tested)."""
    import numpy as np

    hi = rate / 2.0
    edges = lo * (hi / lo) ** (np.arange(n_bands + 1) / n_bands)
    band = np.zeros((spec.shape[0], n_bands))
    for i in range(n_bands):
        sel = (freqs >= edges[i]) & (freqs < edges[i + 1])
        band[:, i] = spec[:, sel].sum(axis=1) if sel.any() else 0.0
    return np.log10(band + 1e-10 * band.sum(axis=1, keepdims=True)
                    + 1e-300)


def _band_loge(x, rate: float, frame: int, n_bands: int):
    """(n_frames, n_bands) log band energies of ``x`` framed at
    ``frame`` samples, or None if < one frame."""
    import numpy as np

    nfr = len(x) // frame
    if nfr < 1:
        return None
    frames = x[:nfr * frame].reshape(nfr, frame)
    spec = np.abs(np.fft.rfft(frames * np.hanning(frame), axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    return _band_loge_from_spec(spec, freqs, rate, n_bands)


def _afp_bits(x, rate: float, n_bands: int = _AUDIO_N_BANDS):
    """Rate-invariant Haitsma-Kalker-style fingerprint: linear-interp
    resample to the fixed ``_AFP_RATE`` mono grid, then sign of the
    time-and-frequency band-energy deltas (plus first-frame frequency-
    axis anchor bits). All relative measures → amplitude-invariant; the
    fixed grid → the same clip at any source rate fingerprints alike
    (content above ``_AFP_RATE``/2 is discarded by design, the standard
    fingerprint tradeoff). Returns a hex string or None (< one frame)."""
    import numpy as np

    if rate != _AFP_RATE:
        n_out = int(round(len(x) * _AFP_RATE / float(rate)))
        if n_out < 2:
            return None
        x = np.interp(np.arange(n_out) * (float(rate) / _AFP_RATE),
                      np.arange(len(x)), x)
    if len(x) < _AFP_FRAME:
        # short clip (audio_features already required >= one NATIVE
        # analysis frame, i.e. real spectral evidence): zero-pad to one
        # fixed-grid frame so a 50 ms clip at 44.1/48 kHz keeps its
        # anchor-bits fingerprint instead of dropping out of near-dup
        # pairing (r11 review — the pre-resample code fingerprinted it)
        x = np.concatenate([x, np.zeros(_AFP_FRAME - len(x))])
    loge = _band_loge(x, _AFP_RATE, _AFP_FRAME, n_bands)
    if loge is None:
        return None
    d = loge[:, :-1] - loge[:, 1:]
    # anchor bits = sign of the FIRST frame's frequency-axis energy
    # delta (discriminates stationary content — a pure tone has no
    # temporal variation), then sign of E(t,b)−E(t,b+1)−(E(t−1,b)−
    # E(t−1,b+1)) per (frame, band-pair) — the Haitsma & Kalker 2002
    # bit derivation
    bits = [(d[0] > 0).reshape(-1)]
    if d.shape[0] >= 2:
        bits.append(((d[1:] - d[:-1]) > 0).reshape(-1))
    allbits = np.concatenate(bits)[:256]
    h = 0
    for v in allbits:
        h = (h << 1) | int(v)
    return f"{h:x}"


def audio_features(b: bytes, n_bands: int = _AUDIO_N_BANDS,
                   frame: int = 2048) -> dict | None:
    """REAL audio feature extraction (late r10 — the audio analogue of
    the JPEG pixel tier): decode PCM, then per-frame FFT → log-spaced
    band energies → rms loudness, zero-crossing rate, spectral centroid
    (Hz), per-band mean log-energies, and a Haitsma-Kalker-style bit
    fingerprint (band-energy DELTAS across time and frequency on a
    FIXED resampled grid — relative measures, so the fingerprint is
    amplitude-invariant, and the fixed grid makes it RATE-invariant:
    the same clip encoded at 22.05/44.1/48 kHz pairs, r11). Pure numpy;
    corrupt/silent input degrades honestly (None / null features).
    Shape contract mirrors the image tier: a production deployment
    swaps a soundfile/librosa decoder into the same slot."""
    import numpy as np

    pcm = wav_pcm(b, with_meta=True)
    if pcm is None:
        meta = wav_decode(b)
        if meta is None:
            return None
        # structurally valid but no samples: metadata with null features
        return {"byte_len": len(b), "sample_rate": meta["sample_rate"],
                "duration_s": meta["duration_s"], "rms": None,
                "zcr": None, "centroid_hz": None, "band_energies": None,
                "afp": None}
    x, rate, meta = pcm
    rms = float(np.sqrt(np.mean(x * x)))
    out = {"byte_len": len(b), "sample_rate": int(rate),
           "duration_s": meta["duration_s"],
           "rms": round(rms, 6)}
    if rms == 0.0 or len(x) < frame:
        # silence or sub-frame clip: no spectral evidence — honest nulls
        out.update({"zcr": round(0.0, 6) if rms == 0.0 else None,
                    "centroid_hz": None, "band_energies": None,
                    "afp": None})
        return out
    out["zcr"] = round(float(np.mean(np.signbit(x[1:]) !=
                                     np.signbit(x[:-1]))), 6)
    nfr = len(x) // frame
    frames = x[:nfr * frame].reshape(nfr, frame)
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    tot = spec.sum()
    out["centroid_hz"] = round(
        float((spec * freqs[None, :]).sum() / tot) if tot else 0.0, 6)
    # descriptive band energies stay on the NATIVE grid (they describe
    # this file's spectrum up to its own Nyquist); only the fingerprint
    # moves to the fixed grid — log-spaced edges ~60 Hz..Nyquist
    # (Haitsma & Kalker 2002 use 33 log bands; n_bands=16 keeps the
    # fixture fingerprint compact)
    loge = _band_loge_from_spec(spec, freqs, rate, n_bands)
    out["band_energies"] = [round(float(v), 6)
                            for v in loge.mean(axis=0)]
    out["afp"] = _afp_bits(x, rate, n_bands)
    return out


_AUDIO_FEATURE_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
    T.StructField("centroid_hz", T.DoubleType()),
    T.StructField("band_energies", T.ArrayType(T.DoubleType())),
    T.StructField("afp", T.StringType()),
]


def afp_to_long(afp: Column) -> Column:
    """Audio-fingerprint hex → signed 64-bit long over the fingerprint's
    LAST 64 bits (the temporally-richest section; fingerprints are
    LSB-aligned ints, so the low bits line up across same-length clips).
    Shorter fingerprints zero-pad — the phash_to_long two-half recombine
    avoids the conv() overflow."""
    h = F.lpad(F.right(afp, F.lit(16)), 16, "0")
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.when(afp.isNotNull(),
                  F.shiftleft(hi, 32).bitwiseOR(lo))


def audio_near_dup_pairs(
    df: DataFrame,
    afp_col: str = "afp",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bucket_cap: int = 200,
) -> DataFrame:
    """Near-duplicate AUDIO pairs by fingerprint hamming distance (late
    r10) — the audio complement of :func:`image_near_dup_pairs`:
    re-encoded / re-leveled copies of one clip land within a few bit
    flips of the Haitsma-Kalker-style fingerprint (amplitude shifts
    measured ≤ 4 bits). Candidates come from the SAME pigeonhole chunk
    machinery serving SimHash text and pHash image near-dup
    (``dedup.hamming_near_dup_pairs`` — chunk equi-joins, never
    all-pairs); matching runs on the fingerprint's last-64-bit block
    (``afp_to_long``), the standard sub-fingerprint matching shape.
    Returns (id_a, id_b, hamming); NULL fingerprints (silence/corrupt)
    never pair."""
    fp = (df.select(F.col(id_col).alias("id"),
                    afp_to_long(F.col(afp_col)).alias("fp"))
          .filter(F.col("fp").isNotNull()))
    from .dedup import hamming_near_dup_pairs

    return hamming_near_dup_pairs(
        fp, fp_col="fp", id_col="id", bits=64,
        max_hamming=max_hamming, bucket_cap=bucket_cap)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "audio_features",
    extractor=None,
) -> DataFrame:
    """Per-blob audio feature extraction over a binary column — the same
    Arrow-batched mapInPandas plumbing as :func:`decode_image_metadata`
    (narrow, no shuffle, scales with the scan); ``extractor`` is any
    ``bytes -> dict|None`` with the _AUDIO_FEATURE_FIELDS keys (default
    :func:`audio_features`)."""
    return _map_binary_column(
        df, content_col, out_col, extractor or audio_features,
        T.StructType(_AUDIO_FEATURE_FIELDS))


def _map_binary_column(
    df: DataFrame, content_col: str, out_col: str, fn, out_type,
) -> DataFrame:
    """Shared plumbing for every per-blob transform in this module
    (image/audio/video metadata decode, resize): append ``out_col`` of
    ``out_type`` computed by ``fn(bytes) -> value|None`` over the binary
    column, as an Arrow-batched narrow ``mapInPandas`` (NULL blobs -> NULL
    out). The per-modality entries differ only in ``fn`` and the output
    type — one copy of the batch loop, not four (review r6)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, out_type)]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                None if blob is None else fn(bytes(blob))
                for blob in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(work, schema=out_schema)


def decode_audio_metadata(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "audio_meta",
    decoder=None,
) -> DataFrame:
    """Decode audio metadata from a binary column via Arrow-batched
    mapInPandas — same narrow no-shuffle plumbing as
    :func:`decode_image_metadata`; ``decoder`` is any ``bytes ->
    dict|None`` with the _AUDIO_FIELDS keys (default
    :func:`audio_decode`: WAV chunk walk, FLAC STREAMINFO, MP3
    frame-walk — r11; unknown bytes → null row — plug in a
    soundfile/librosa-backed decoder for compressed-sample work)."""
    return _map_binary_column(
        df, content_col, out_col, decoder or audio_decode,
        T.StructType(_AUDIO_FIELDS))


_VIDEO_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("brand", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_tracks", T.IntegerType()),
]


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the ISO-BMFF boxes in
    b[start:end]; stops on a malformed size rather than looping."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < body - pos or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def mp4_decode(b: bytes) -> dict | None:
    """Pure-Python MP4/ISO-BMFF metadata parse: box walk to ftyp (brand)
    and moov → mvhd (timescale/duration, v0 + v1) and per-track tkhd
    (16.16 fixed-point width/height — the max over tracks, since audio
    tracks carry 0×0). The video analogue of :func:`jpeg_decode` /
    :func:`wav_decode`: real container metadata, no sample decode (frame
    pixels need a codec — compose :func:`frame_sample_plan` + a PIL/ffmpeg
    plug-in for that). Corrupt/truncated box trees → None."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    try:
        brand = b[8:12].decode("ascii", "replace")
        duration_s = None
        width = height = 0
        n_tracks = 0
        for btype, s, e in _mp4_boxes(b, 0, len(b)):
            if btype != b"moov":
                continue
            for ctype, cs, ce in _mp4_boxes(b, s, e):
                if ctype == b"mvhd" and ce - cs >= 4:
                    ver = b[cs]
                    if ver == 1 and ce - cs >= 28 + 4:
                        (scale,) = struct.unpack_from(">I", b, cs + 20)
                        (dur,) = struct.unpack_from(">Q", b, cs + 24)
                    elif ver == 0 and ce - cs >= 20 + 4:
                        scale, dur = struct.unpack_from(">II", b, cs + 12)
                    else:
                        continue
                    if scale:
                        duration_s = round(dur / scale, 6)
                elif ctype == b"trak":
                    n_tracks += 1
                    for t, ts, te in _mp4_boxes(b, cs, ce):
                        if t == b"tkhd" and te - ts >= 4:
                            # width/height (16.16 fixed) follow ver+flags(4)
                            # + times/id/reserved/duration (20 v0 / 32 v1)
                            # + reserved(8) + layer/group/volume(8)
                            # + matrix(36)
                            ver = b[ts]
                            off = ts + (88 if ver == 1 else 76)
                            if off + 8 <= te:
                                w16, h16 = struct.unpack_from(">II", b, off)
                                width = max(width, w16 >> 16)
                                height = max(height, h16 >> 16)
        if duration_s is None:
            return None
        return {
            "byte_len": len(b),
            "format": "mp4",
            "brand": brand,
            "duration_s": duration_s,
            "width": int(width),
            "height": int(height),
            "n_tracks": int(n_tracks),
        }
    except (struct.error, IndexError):
        return None


def encode_mp4_header(
    duration_s: float = 1.0, width: int = 640, height: int = 360,
    timescale: int = 1000, brand: bytes = b"isom",
) -> bytes:
    """Synthesize a structurally-valid MP4 metadata skeleton (ftyp +
    moov[mvhd + trak[tkhd]]) for tests: the box walk sees real duration
    and dimensions; there is no mdat, so a sample decoder would reject
    it — the header-only contract :func:`mp4_decode` implements."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    dur = int(round(duration_s * timescale))
    mvhd = (bytes(4)                     # version 0 + flags
            + struct.pack(">II", 0, 0)   # ctime, mtime
            + struct.pack(">II", timescale, dur)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + bytes(36)      # reserved + identity matrix slot
            + bytes(24) + struct.pack(">I", 2))
    tkhd = (bytes(4)
            + struct.pack(">III", 0, 0, 1)   # times, track id
            + bytes(4) + struct.pack(">I", dur)
            + bytes(8) + bytes(8) + bytes(36)
            + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    return ftyp + moov


def avi_decode(b: bytes) -> dict | None:
    """AVI HEADER-TIER metadata (r11): RIFF walk to ``LIST hdrl`` →
    ``avih`` (MainAVIHeader) for microseconds-per-frame, total frames,
    stream count, and dimensions. Corrupt / non-AVI RIFF → None."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    try:
        pos = 12
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            if cid == b"LIST" and b[body:body + 4] == b"hdrl":
                p = body + 4
                end = min(body + clen, len(b))
                while p + 8 <= end:
                    sid = b[p:p + 4]
                    (slen,) = struct.unpack_from("<I", b, p + 4)
                    if sid == b"avih" and slen >= 40:
                        (usec, _mb, _pad, _fl, total, _init, streams,
                         _buf, w, h) = struct.unpack_from(
                            "<10I", b, p + 8)
                        if not w or not h:
                            return None
                        dur = (round(total * usec / 1e6, 6)
                               if usec else None)
                        return {
                            "byte_len": len(b),
                            "format": "avi",
                            "brand": "AVI ",
                            "duration_s": dur,
                            "width": int(w),
                            "height": int(h),
                            "n_tracks": int(streams),
                        }
                    p += 8 + slen + (slen & 1)
                return None
            pos = body + clen + (clen & 1)
        return None
    except (struct.error, IndexError):
        return None


def encode_avi_header(duration_s: float = 1.0, fps: float = 25.0,
                      width: int = 640, height: int = 360,
                      streams: int = 1) -> bytes:
    """Synthesize a RIFF/AVI metadata skeleton (LIST hdrl → avih) for
    tests."""
    usec = int(round(1e6 / fps))
    total = int(round(duration_s * fps))
    avih = struct.pack("<10I", usec, 0, 0, 0, total, 0, streams, 0,
                       width, height) + bytes(16)
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def _avi_video_chunk_offsets(b: bytes) -> list[tuple[int, int]]:
    """(payload_offset, payload_len) of every VIDEO frame chunk
    (``NNdc``/``NNdb``) inside ``LIST movi``, in stream order — the
    index pass of the MJPEG frame tier (r12). Strictly bounds-checked:
    a chunk whose declared size over-runs the buffer ends the walk
    (truncated-tail convention; a FORGED size can therefore never make
    a later slice over-read — the r11-verdict #8 adversarial case).
    One level of ``LIST rec `` grouping (interleaved AVIs) is
    descended. O(chunks) over the bytes, no decompression."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return []
    out: list[tuple[int, int]] = []

    def walk(pos: int, end: int, depth: int) -> None:
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            truncated = body + clen > end
            if cid == b"LIST":
                ltype = b[body:body + 4]
                if ltype == b"movi" or (depth > 0 and ltype == b"rec "):
                    # a truncated-tail LIST still yields the frames it
                    # holds — children are bounds-checked individually,
                    # so clamping a CONTAINER never over-reads
                    walk(body + 4, min(body + clen, end), depth + 1)
            elif truncated:
                return  # forged/short DATA chunk: stop, never over-read
            elif (depth > 0 and cid[2:4] in (b"dc", b"db")
                  and cid[:2].isdigit()):
                out.append((body, clen))
            if truncated:
                return
            pos = body + clen + (clen & 1)

    try:
        walk(12, len(b), 0)
    except struct.error:
        pass
    return out


def avi_frame_stats(
    b: bytes, n_sample: int = 3,
    pixel_budget: int | None = None,
) -> dict | None:
    """MJPEG-in-AVI FRAME PIXEL TIER (r12, verdict r11 next #3): walk
    ``LIST movi`` for video frame chunks, decode up to ``n_sample``
    frames at evenly-spaced indices (first/middle/last for the default
    3) through the real JPEG kernel (:func:`jpeg_pixel_decode` —
    MJPEG stores each frame as a bare baseline JPEG), and emit
    per-frame average-hashes for video near-dup plus pooled channel
    means. A sampled chunk that is not a decodable JPEG contributes a
    NULL phash slot (honest-tier convention: positions are kept so the
    near-dup explode can skip them without renumbering). Non-AVI or
    frameless bytes → None."""
    offsets = _avi_video_chunk_offsets(b)
    if not offsets:
        return None
    n = len(offsets)
    k = min(n_sample, n)
    idx = sorted({(i * (n - 1)) // (k - 1) if k > 1 else 0
                  for i in range(k)})
    budget = JPEG_PIXEL_BUDGET if pixel_budget is None else pixel_budget
    phashes: list[str | None] = []
    means_acc: list[list[float]] = []
    width = height = None
    for i in idx:
        off, ln = offsets[i]
        frame = b[off:off + ln]
        meta = (jpeg_pixel_decode(frame, pixel_budget=budget)
                if frame.startswith(_JPEG_SIG) else None)
        if meta is None:
            phashes.append(None)
            continue
        phashes.append(meta["phash"])
        means_acc.append(meta["channel_means"])
        if width is None:
            width, height = meta["width"], meta["height"]
    pooled = ([sum(c) / len(means_acc) for c in zip(*means_acc)]
              if means_acc else None)
    return {
        "byte_len": len(b),
        "format": "avi-mjpeg",
        "frame_count": n,
        "width": width,
        "height": height,
        "sampled_frames": [int(i) for i in idx],
        "frame_phashes": phashes,
        "channel_means": pooled,
    }


def encode_avi_mjpeg(
    frames: list[bytes], fps: float = 25.0,
    width: int = 0, height: int = 0,
    interleave_rec: bool = False,
) -> bytes:
    """Synthesize a complete MJPEG AVI (fixture generator): LIST hdrl
    (avih + LIST strl with a ``vids``/``MJPG`` strh and a
    BITMAPINFOHEADER strf) + LIST movi carrying each JPEG as a
    ``00dc`` chunk (``interleave_rec=True`` wraps each frame in a
    ``LIST rec `` group, the interleaved-AVI layout). The header-tier
    :func:`avi_decode` reads the same bytes."""
    usec = int(round(1e6 / fps))

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return (cid + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return (b"LIST" + struct.pack("<I", 4 + len(payload))
                + ltype + payload)

    avih = struct.pack("<10I", usec, 0, 0, 0, len(frames), 0, 1, 0,
                       width, height) + bytes(16)
    strh = (b"vids" + b"MJPG" + bytes(12)
            + struct.pack("<II", 1, int(round(fps)))  # scale, rate
            + struct.pack("<II", 0, len(frames)) + bytes(16))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = (chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = b"".join(
        lst(b"rec ", chunk(b"00dc", f)) if interleave_rec
        else chunk(b"00dc", f)
        for f in frames)
    body = lst(b"hdrl", hdrl) + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


# Matroska/WebM EBML element ids (marker bits kept)
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TSCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE
_MKV_VIDEO = 0xE0
_MKV_PIXELW = 0xB0
_MKV_PIXELH = 0xBA
_MKV_DOCTYPE = 0x4282


def _ebml_vint(b: bytes, pos: int, keep_marker: bool):
    """Parse one EBML variable-length integer at ``pos``:
    (value, next_pos, n_bytes) or None. IDs keep the length-marker bit
    (the conventional id form); sizes strip it."""
    if pos >= len(b) or b[pos] == 0:
        return None
    first = b[pos]
    length = 9 - first.bit_length()
    if pos + length > len(b):
        return None
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | b[pos + i]
    return val, pos + length, length


def _ebml_children(b: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) for EBML elements in
    b[pos:end]; unknown-size elements extend to ``end``; stops on a
    malformed stream rather than looping."""
    while pos < end:
        r = _ebml_vint(b, pos, True)
        if r is None:
            return
        eid, p2, _ = r
        r = _ebml_vint(b, p2, False)
        if r is None:
            return
        size, body, nb = r
        if size == (1 << (7 * nb)) - 1:  # unknown size: to end
            size = end - body
        if body + size > end:
            return
        yield eid, body, body + size
        pos = body + size


def mkv_decode(b: bytes) -> dict | None:
    """Matroska/WebM HEADER-TIER metadata (r11): EBML walk to Segment →
    Info (TimestampScale, Duration) and Tracks (TrackEntry count, first
    Video PixelWidth/Height). WebM is Matroska with DocType "webm" —
    the #2 crawled video container. Corrupt / non-Matroska → None."""
    if b[:4] != b"\x1aE\xdf\xa3":
        return None
    try:
        r = _ebml_vint(b, 4, False)
        if r is None:
            return None
        hsize, hbody, _ = r
        hend = min(hbody + hsize, len(b))
        doctype = "matroska"
        for eid, s, e in _ebml_children(b, hbody, hend):
            if eid == _MKV_DOCTYPE:
                doctype = b[s:e].split(b"\x00")[0].decode(
                    "ascii", "replace")
        duration = None
        tscale = 1_000_000  # ns per timestamp tick (spec default)
        width = height = 0
        n_tracks = 0
        seen_segment = False
        for eid, s, e in _ebml_children(b, hend, len(b)):
            if eid != _MKV_SEGMENT:
                continue
            seen_segment = True
            for cid, cs, ce in _ebml_children(b, s, e):
                if cid == _MKV_INFO:
                    for iid, is_, ie in _ebml_children(b, cs, ce):
                        if iid == _MKV_TSCALE:
                            tscale = int.from_bytes(b[is_:ie], "big")
                        elif iid == _MKV_DURATION:
                            raw = b[is_:ie]
                            if len(raw) == 4:
                                (duration,) = struct.unpack(">f", raw)
                            elif len(raw) == 8:
                                (duration,) = struct.unpack(">d", raw)
                elif cid == _MKV_TRACKS:
                    for tid, ts, te in _ebml_children(b, cs, ce):
                        if tid != _MKV_TRACKENTRY:
                            continue
                        n_tracks += 1
                        for vid, vs, ve in _ebml_children(b, ts, te):
                            if vid != _MKV_VIDEO:
                                continue
                            for pid, ps, pe in _ebml_children(
                                    b, vs, ve):
                                if pid == _MKV_PIXELW:
                                    width = max(width, int.from_bytes(
                                        b[ps:pe], "big"))
                                elif pid == _MKV_PIXELH:
                                    height = max(height,
                                                 int.from_bytes(
                                                     b[ps:pe], "big"))
        if not seen_segment:
            return None
        dur_s = (round(duration * tscale / 1e9, 6)
                 if duration is not None and tscale else None)
        return {
            "byte_len": len(b),
            "format": "webm" if doctype == "webm" else "mkv",
            "brand": doctype,
            "duration_s": dur_s,
            "width": int(width),
            "height": int(height),
            "n_tracks": int(n_tracks),
        }
    except (struct.error, IndexError):
        return None


def _ebml_encode_size(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            bits = n | (1 << (7 * length))
            return bits.to_bytes(length, "big")
    raise ValueError("size too large")


def _ebml_elt(eid: int, payload: bytes) -> bytes:
    return (eid.to_bytes((eid.bit_length() + 7) // 8, "big")
            + _ebml_encode_size(len(payload)) + payload)


def encode_mkv_header(doctype: str = "matroska",
                      duration_s: float = 1.0,
                      timescale_ns: int = 1_000_000,
                      width: int = 640, height: int = 360,
                      extra_audio_track: bool = False) -> bytes:
    """Synthesize a Matroska/WebM metadata skeleton (EBML header +
    Segment[Info, Tracks]) for tests."""
    header = _ebml_elt(0x1A45DFA3,
                       _ebml_elt(_MKV_DOCTYPE, doctype.encode()))
    duration_ticks = duration_s * 1e9 / timescale_ns
    info = _ebml_elt(_MKV_INFO,
                     _ebml_elt(_MKV_TSCALE,
                               timescale_ns.to_bytes(8, "big"))
                     + _ebml_elt(_MKV_DURATION,
                                 struct.pack(">d", duration_ticks)))
    video = _ebml_elt(_MKV_VIDEO,
                      _ebml_elt(_MKV_PIXELW, width.to_bytes(2, "big"))
                      + _ebml_elt(_MKV_PIXELH,
                                  height.to_bytes(2, "big")))
    tracks = _ebml_elt(_MKV_TRACKENTRY, video)
    if extra_audio_track:
        tracks += _ebml_elt(_MKV_TRACKENTRY, b"")
    segment = _ebml_elt(_MKV_SEGMENT,
                        info + _ebml_elt(_MKV_TRACKS, tracks))
    return header + segment


def video_decode(b: bytes) -> dict | None:
    """Default video metadata chain (r11): ISO-BMFF/MP4, Matroska/WebM
    (EBML), AVI (RIFF) — magic-byte dispatched; None for unknown/
    corrupt bytes. The pluggable-decoder slot of
    :func:`decode_video_metadata`."""
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return mp4_decode(b)
    if b[:4] == b"\x1aE\xdf\xa3":
        return mkv_decode(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return avi_decode(b)
    return None


def decode_video_metadata(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "video_meta",
    decoder=None,
) -> DataFrame:
    """Decode video metadata from a binary column — the same narrow
    Arrow-batched plumbing as the image/audio decoders; ``decoder`` is any
    ``bytes -> dict|None`` with the _VIDEO_FIELDS keys (default
    :func:`video_decode`: MP4 box walk, Matroska/WebM EBML walk, AVI
    RIFF walk — r11; plug in an ffprobe/pyav-backed decoder for sample
    work)."""
    return _map_binary_column(
        df, content_col, out_col, decoder or video_decode,
        T.StructType(_VIDEO_FIELDS))


_VIDEO_FRAME_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("frame_count", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sampled_frames", T.ArrayType(T.IntegerType())),
    T.StructField("frame_phashes", T.ArrayType(T.StringType())),
    T.StructField("channel_means", T.ArrayType(T.DoubleType())),
]


def video_frame_stats(b: bytes, n_sample: int = 3) -> dict | None:
    """Default frame-sampling chain (r12): MJPEG-in-AVI
    (:func:`avi_frame_stats`), animated GIF (:func:`gif_frame_stats`),
    and animated WebP (:func:`webp_frame_stats` — VP8L subframes
    through the lossless kernel, lossy intra subframes through the
    real VP8 decoder since r13) — magic-byte dispatched; None for
    containers without a pure-Python frame tier (MP4/MKV stay
    metadata-only: H.264/VP9 need a real video stack; static WebP
    is an image, not a video)."""
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return avi_frame_stats(b, n_sample=n_sample)
    if b.startswith(b"GIF87a") or b.startswith(b"GIF89a"):
        return gif_frame_stats(b, n_sample=n_sample)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return webp_frame_stats(b, n_sample=n_sample)  # animated only
    return None


def decode_video_frames(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "frame_meta",
    decoder=None,
    n_sample: int = 3,
) -> DataFrame:
    """Sampled FRAME PIXEL stats from a video binary column (r12) —
    the same narrow Arrow-batched plumbing as the metadata decoders;
    ``decoder`` is any ``bytes -> dict|None`` with the
    ``_VIDEO_FRAME_FIELDS`` keys (default :func:`video_frame_stats`:
    MJPEG-in-AVI through the real JPEG kernel, animated GIF through
    the LZW kernel; plug in an ffprobe/pyav decoder for other
    codecs). Emits per-frame average-hashes, which
    :func:`video_near_dup_pairs` feeds to the shared hamming
    engine."""
    dec = decoder or (lambda blob: video_frame_stats(blob, n_sample=n_sample))
    return _map_binary_column(
        df, content_col, out_col, dec, T.StructType(_VIDEO_FRAME_FIELDS))


def video_near_dup_pairs(
    df: DataFrame,
    phashes_col: str = "frame_phashes",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    min_matching_frames: int = 1,
    bucket_cap: int = 200,
) -> DataFrame:
    """Near-duplicate VIDEO pairs from sampled per-frame perceptual
    hashes (r12): two videos are near-dups when at least
    ``min_matching_frames`` of their SAME-POSITION sampled frames land
    within ``max_hamming`` bit flips — re-encoded/resized copies keep
    per-frame visual structure. Explodes (video, sample_pos, phash),
    rides the shared pigeonhole engine per position
    (``dedup.hamming_near_dup_pairs`` with the position folded into
    the fingerprint id — equi-join candidates, never all-pairs), then
    aggregates positions per video pair. NULL phash slots (undecodable
    sampled chunks) drop before the join. Returns
    (id_a, id_b, n_frames_matched, min_hamming)."""
    from .dedup import hamming_near_dup_pairs

    fp = (df.select(F.col(id_col).alias("vid"),
                    F.posexplode(phashes_col).alias("pos", "ph"))
          .filter(F.col("ph").isNotNull())
          .select(F.struct("vid", "pos").alias("id"),
                  phash_to_long(F.col("ph")).alias("fp")))
    pairs = hamming_near_dup_pairs(
        fp, fp_col="fp", id_col="id", bits=64,
        max_hamming=max_hamming, bucket_cap=bucket_cap)
    # same-position frames of DIFFERENT videos only
    cross = pairs.filter(
        (F.col("id_a.pos") == F.col("id_b.pos"))
        & (F.col("id_a.vid") != F.col("id_b.vid")))
    a, b = F.col("id_a.vid"), F.col("id_b.vid")
    return (cross
            .select(F.least(a, b).alias("id_a"),
                    F.greatest(a, b).alias("id_b"),
                    "hamming")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_frames_matched"),
                 F.min("hamming").alias("min_hamming"))
            .filter(F.col("n_frames_matched") >= min_matching_frames))


def py_pixels(b: bytes) -> tuple | None:
    """(width, height, channels, pixel rows) for known containers (PNG,
    BMP, GIF, lossless WebP — r12, lossy WebP — r13), magic-byte
    dispatched; None for unknown/corrupt bytes."""
    if b.startswith(_PNG_SIG):
        return _png_pixels(b)
    if b.startswith(b"BM"):
        return _bmp_pixels(b)
    if b.startswith(b"GIF87a") or b.startswith(b"GIF89a"):
        return _gif_pixels(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _webp_vp8l_pixels(b)
    return None


def resize_nearest(b: bytes, width: int, height: int) -> bytes | None:
    """Pure-Python nearest-neighbor resize of a PNG/BMP/GIF container
    (r11: GIF rides the shared pixel core), re-encoded as RGB8 PNG
    (gray replicates to RGB, alpha is dropped) — the same deterministic
    ``(i·h)//H`` sampling the average-hash uses, so results are
    bit-stable across runs. Unknown/corrupt bytes → None; pixel-rate
    JPEG needs the PIL plug-in (header-only here)."""
    px = py_pixels(b)
    if px is None:
        return None
    w, h, ch, rows = px

    def rgb(p: tuple) -> tuple:
        if ch >= 3:
            return (p[0], p[1], p[2])
        return (p[0], p[0], p[0])

    grid = [
        [rgb(rows[(i * h) // height][(j * w) // width]) for j in range(width)]
        for i in range(height)
    ]
    return encode_png(width, height, lambda x, y: grid[y][x])


def pil_resize(b: bytes, width: int, height: int) -> bytes | None:  # pragma: no cover - PIL absent here
    """PIL-backed resize (covers JPEG et al.); RGB8 PNG out like
    :func:`resize_nearest`."""
    import io

    from PIL import Image

    try:
        im = Image.open(io.BytesIO(b)).convert("RGB").resize(
            (width, height), resample=0)  # NEAREST, matching the py path
        out = io.BytesIO()
        im.save(out, format="PNG")
        return out.getvalue()
    except Exception:
        return None


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    out_col: str = "resized",
    resizer=None,
) -> DataFrame:
    """Resize a binary image column via Arrow-batched ``mapInPandas`` —
    the thumbnail/normalize step of an image-curation pipeline (every
    vision-training recipe resizes to a fixed grid before featurizing).

    ``resizer`` is the plug-in point: any ``(bytes, w, h) -> bytes|None``.
    Default: :func:`pil_resize` when PIL is importable (production rate,
    all formats), else the REAL pure-Python :func:`resize_nearest`
    (PNG/BMP). Output column is nullable binary (None for undecodable
    bytes); like the metadata decoder this is a narrow transformation —
    no shuffle, and blobs should be dropped before any wide op.
    """
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    fn = resizer or (pil_resize if HAVE_PIL else resize_nearest)
    return _map_binary_column(
        df, content_col, out_col, lambda b: fn(b, width, height),
        T.BinaryType())


def encode_jpeg_header(
    width: int, height: int, channels: int = 3, progressive: bool = False,
) -> bytes:
    """Synthesize a structurally-valid JPEG header byte string (SOI + JFIF
    APP0 + DQT + SOF0/SOF2 + EOI) for tests and oracles: the marker walk
    sees real dimensions; there is no entropy-coded image data, so a pixel
    decoder would reject it — exactly the header-only contract
    ``jpeg_decode`` implements."""
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00"
    dqt = bytes([0]) + bytes(64)  # table 0, all-zero (structural only)
    comps = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(channels))
    sof_payload = struct.pack(">BHHB", 8, height, width, channels) + comps
    sof_marker = 0xC2 if progressive else 0xC0
    return (b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, dqt)
            + seg(sof_marker, sof_payload) + b"\xff\xd9")


def encode_bmp(width: int, height: int, pixel) -> bytes:
    """Minimal 24-bpp uncompressed BMP writer (bottom-up rows, 4-byte
    aligned) for synthesizing real bytes in tests."""
    fn = pixel if callable(pixel) else (lambda x, y: pixel)
    stride = ((3 * width + 3) // 4) * 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = fn(x, y)
            row.extend((b, g, r))
        row.extend(b"\x00" * (stride - len(row)))
        body.extend(row)
    data_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + bytes(body)


def decode_image_metadata(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "img_meta",
    decoder=None,
) -> DataFrame:
    """Decode image metadata from a binary column via Arrow-batched
    mapInPandas.

    ``decoder`` is the plug-in point: any ``bytes -> dict|None`` with the
    _META_FIELDS keys (missing keys → null fields). Default:
    ``auto_decode`` — real pure-Python PNG/BMP decode, PIL when importable,
    deterministic fake for non-media bytes. The chosen function is
    serialized into the task closure, so the decision is made driver-side
    and the Spark plumbing (schema, Arrow batching, narrow no-shuffle
    plan) is identical for every decoder.
    """
    return _map_binary_column(
        df, content_col, out_col, decoder or auto_decode,
        T.StructType(_META_FIELDS))


def phash_to_long(phash: Column) -> Column:
    """16-hex-char perceptual hash → signed 64-bit long, preserving the
    bit pattern (values above 2^63 wrap to negative exactly as the JVM
    long does — ``conv(hex,16,10)`` alone would overflow to NULL there).
    Two 32-bit halves recombine via shift+or; NULL/short input → NULL."""
    hi = F.conv(F.substring(phash, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(phash, 9, 8), 16, 10).cast("long")
    return F.when(
        phash.isNotNull() & (F.length(phash) == 16),
        F.shiftleft(hi, 32).bitwiseOR(lo))


def image_near_dup_pairs(
    df: DataFrame,
    phash_col: str = "phash",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bucket_cap: int = 200,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance
    (r8): the visual complement of the text dedup tiers — re-encoded,
    resized, or lightly-edited copies of one image land within a few
    pHash bit flips. ``df`` carries the 16-hex ``phash`` column that
    ``decode_image_metadata`` emits (``img_meta.phash``); candidates
    come from the shared pigeonhole chunk machinery
    (``dedup.hamming_near_dup_pairs`` — equi-joins on fingerprint
    chunks, never all-pairs), so the same plan that serves SimHash text
    near-dup serves images. Returns (id_a, id_b, hamming).

    Default ``max_hamming=6`` is the standard aHash near-dup band; at
    that radius the scheme auto-selects PAIR keys (multi-index hashing:
    8 chunks, C(8,2)=28 16-bit composite keys) — single 9-bit chunks'
    512-value bucket alphabet would overflow ``bucket_cap`` on any real
    corpus and silently lose recall (r8 review)."""
    fp = df.select(F.col(id_col).alias("id"),
                   phash_to_long(F.col(phash_col)).alias("fp"))
    from .dedup import hamming_near_dup_pairs

    return hamming_near_dup_pairs(
        fp, fp_col="fp", id_col="id", bits=64,
        max_hamming=max_hamming, bucket_cap=bucket_cap)


def frame_sample_plan(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (doc, frame_idx) with
    a deterministic byte-offset window per frame — the relational scaffold a
    real decoder plugs into. Pure columnar explode; no Python."""
    total = F.length(F.col(content_col)).cast("long")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_idx"),
            F.floor(total * i / F.lit(n_frames)).cast("long").alias("byte_offset"),
            F.floor(total / F.lit(n_frames)).cast("long").alias("byte_len"),
        ),
    )
    return (
        df.select(F.col(id_col), total.alias("total_bytes"), F.explode(frames).alias("f"))
        .select(id_col, "total_bytes", "f.frame_idx", "f.byte_offset", "f.byte_len")
    )


# ---------------------------------------------------------------------------
# JPEG codec — ITU-T T.81, pure numpy/stdlib. The DECODER is fully general
# for baseline/extended-sequential streams (r9, verdict #4: Huffman tables
# read from the file's DHT segments, any 1/2 sampling factors, restart
# intervals) AND progressive streams (r10, verdict #6: spectral selection +
# successive approximation per T.81 G.1.2, coefficients accumulated across
# scans and reconstructed at EOI). The ENCODER is the fixture generator
# (the encode_png pattern): solid colors or arbitrary small arrays, 4:4:4
# or 4:2:0, baseline or 4-pass progressive, simple uniform-length canonical
# Huffman tables (valid JPEG, fixture-grade compression — the decoder never
# assumes them). Arithmetic/lossless/hierarchical stay header-only; a
# production deployment plugs PIL/libjpeg-turbo into the same decoder slot
# (pil_decode).
# ---------------------------------------------------------------------------

def _dct8():
    import numpy as np

    n = np.arange(8, dtype=np.float64)
    d = 0.5 * np.cos((2.0 * n[None, :] + 1.0) * n[:, None] * math.pi / 16.0)
    d[0] *= 1.0 / math.sqrt(2.0)
    return d  # orthonormal: coef = D @ B @ D.T, block = D.T @ C @ D


# zigzag scan order: diagonal d = i+j; even diagonals run bottom-left to
# top-right (j ascending), odd ones top-right to bottom-left (i ascending)
_JPEG_ZZ = sorted(
    ((i, j) for i in range(8) for j in range(8)),
    key=lambda p: (p[0] + p[1],
                   p[1] if (p[0] + p[1]) % 2 == 0 else p[0]))
_JPEG_ZZ_ROWS = [p[0] for p in _JPEG_ZZ]
_JPEG_ZZ_COLS = [p[1] for p in _JPEG_ZZ]

# fixture Huffman tables: every DC category (0-11) at code length 4,
# every AC (run, size) symbol + EOB + ZRL at code length 8 — plus the
# progressive EOBn run-length symbols 0x10..0xE0 (r10: cross-block EOB
# runs, T.81 G.1.2.2) — canonical, prefix-free, no all-ones code. DHT
# carries them; the decoder rebuilds from DHT, so ANY valid table
# interoperates.
_FIX_DC_BITS = [0, 0, 0, 12] + [0] * 12
_FIX_DC_VALS = list(range(12))
_FIX_AC_VALS = [0x00, 0xF0] + [n << 4 for n in range(1, 15)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)]
_FIX_AC_BITS = [0] * 16
_FIX_AC_BITS[7] = len(_FIX_AC_VALS)  # all at length 8 (176 < 255)


def _huff_encode_map(bits: list, vals: list) -> dict:
    """symbol -> (code, length) by the T.81 canonical construction."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list, vals: list) -> dict:
    """(length, code) -> symbol for the bit-at-a-time decoder."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if not length:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


def _jpeg_cat(v: int) -> int:
    """DC/AC magnitude category: bit length of |v|."""
    return abs(v).bit_length()


def _rgb_to_ycbcr_arrays(R, G, B):
    """JFIF color transform — term order and floor(x+0.5) rounding are
    the ORACLE CONTRACT (q40 mirrors this arithmetic in SQL)."""
    import numpy as np

    y = np.floor(0.299 * R + 0.587 * G + 0.114 * B + 0.5)
    cb = np.floor(128.0 - 0.168736 * R - 0.331264 * G + 0.5 * B + 0.5)
    cr = np.floor(128.0 + 0.5 * R - 0.418688 * G - 0.081312 * B + 0.5)
    return (np.clip(y, 0, 255), np.clip(cb, 0, 255), np.clip(cr, 0, 255))


def _ycbcr_to_rgb_arrays(y, cb, cr):
    import numpy as np

    r = np.floor(y + 1.402 * (cr - 128.0) + 0.5)
    g = np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5)
    b = np.floor(y + 1.772 * (cb - 128.0) + 0.5)
    return (np.clip(r, 0, 255), np.clip(g, 0, 255), np.clip(b, 0, 255))


def _pad_to(plane, rows: int, cols: int):
    import numpy as np

    return np.pad(plane, ((0, rows - plane.shape[0]),
                          (0, cols - plane.shape[1])), mode="edge")


class _ProgAcState:
    """Scan-level cross-block EOB-run accumulator for progressive AC
    entropy coding (T.81 G.1.2.2/3 — the jcphuff EOBRUN/BE machinery,
    r10): blocks whose band holds no codeable coefficient fold into ONE
    EOBn symbol (value run = 2^n + extra-bits, n in the Huffman symbol's
    run slot), and refinement correction bits buffered across the run
    flush immediately after it — exactly where the decoder's eobrun tail
    loops consume them, block by block in order. This is what real
    encoders emit; per-block EOBs (run = 1) are just the degenerate
    case."""

    def __init__(self, bw: _JpegBitWriter, ac_map: dict):
        self.bw = bw
        self.ac_map = ac_map
        self.eobrun = 0
        self.bebits: list[int] = []

    def put(self, sym: int) -> None:
        code, length = self.ac_map[sym]
        self.bw.write(code, length)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.put(n << 4)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            for b in self.bebits:
                self.bw.write(b, 1)
            self.bebits = []
            self.eobrun = 0

    def count_eob(self, pending: list) -> None:
        self.eobrun += 1
        self.bebits.extend(pending)
        if self.eobrun == 0x7FFF:  # T.81 maximum EOB run length
            self.flush_eobrun()


def _emit_ac_first(st: _ProgAcState, zz, al: int,
                   ss: int = 1, se: int = 63) -> None:
    """Progressive AC first-pass entropy coding for one block's spectral
    band ``ss..se``; a band ending in zeros joins the scan-level EOB
    run."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        st.flush_eobrun()
        while run >= 16:
            st.put(0xF0)
            run -= 16
        s = t.bit_length()
        st.put((run << 4) | s)
        val = t if v > 0 else -t
        st.bw.write(val if val > 0 else val + (1 << s) - 1, s)
        run = 0
    if run:
        st.count_eob([])


def _emit_ac_refine(st: _ProgAcState, zz, al: int,
                    ss: int = 1, se: int = 63) -> None:
    """Progressive AC refinement entropy coding for one block's band
    ``ss..se`` (T.81 G.1.2.3 / the jcphuff shape): newly-visible
    coefficients (shifted magnitude exactly 1) emit size-1 symbols + a
    sign bit; correction bits of already-nonzero coefficients are
    buffered and flushed after the next emitted symbol — or carried
    into the scan-level EOB run when the block ends without one."""
    ts = {k: abs(int(zz[k])) >> al for k in range(ss, se + 1)}
    eob_k = ss - 1
    for k in range(ss, se + 1):
        if ts[k] == 1:
            eob_k = k
    run = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = ts[k]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob_k:
            st.flush_eobrun()
            st.put(0xF0)
            run -= 16
            for bit in pending:
                st.bw.write(bit, 1)
            pending = []
        if t > 1:
            # already nonzero at the previous precision: correction bit
            pending.append(t & 1)
            continue
        st.flush_eobrun()
        st.put((run << 4) | 1)
        st.bw.write(1 if int(zz[k]) > 0 else 0, 1)
        for bit in pending:
            st.bw.write(bit, 1)
        pending = []
        run = 0
    if run or pending:
        st.count_eob(pending)


def _encode_progressive_scans(comp_blocks: list, samp: list, mcux: int,
                              mcuy: int, w: int, h: int, dc_map: dict,
                              ac_map: dict, restart_interval: int,
                              ac_bands: tuple = ((1, 63),),
                              first_al: int = 1) -> list:
    """Build the progressive scan sequence (see
    ``encode_jpeg(progressive=True)``): returns ``(sos_payload,
    entropy_bytes)`` per scan. DC scans cover the full MCU grid in MCU
    order (interleaved when ncomp > 1); AC scans are single-component
    over the component's ceil(comp_dim/8) grid — T.81 A.2.2, matching
    the decoder. Restart units are MCUs / blocks respectively.

    ``ac_bands`` splits the AC spectrum into per-scan bands (mozjpeg
    emits e.g. (1,5),(6,63)); ``first_al`` sets the first-pass point
    transform, followed by a full refinement chain Al = first_al−1 .. 0
    — the real-world multi-level successive-approximation shape. Every
    combination decodes bit-identically to baseline (differential
    tests)."""
    ncomp = len(samp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if first_al < 0 or first_al > 13:
        raise ValueError(f"first_al must be in 0..13, got {first_al}")
    lo = min(b[0] for b in ac_bands)
    hi = max(b[1] for b in ac_bands)
    covered = sorted(k for b in ac_bands for k in range(b[0], b[1] + 1))
    if lo < 1 or hi > 63 or covered != list(range(1, 64)):
        raise ValueError(
            f"ac_bands must partition 1..63 exactly, got {ac_bands!r}")
    # the decoder refuses files with >= 64 scans as forged (its
    # O(scans x blocks) work bound); never emit a file our own decoder
    # would silently degrade to the header tier (advice r10 #1)
    total_scans = (first_al + 1) * (1 + ncomp * len(ac_bands))
    if total_scans >= 64:
        raise ValueError(
            f"scan script would emit {total_scans} scans; the decoder's "
            "forged-scan bound is 64 — reduce first_al or ac_bands")

    def sos(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            p += bytes([ci + 1, (t << 4) | t])
        return p + bytes([ss, se, (ah << 4) | al])

    def ceil_grid(ci):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        return -(-cw // 8), -(-ch // 8)

    def emit_rst(bw, rst):
        bw.align()
        bw.buf += bytes([0xFF, 0xD0 + rst % 8])

    def dc_scan(ah, al):
        # full MCU grid, interleaved component order
        bw = _JpegBitWriter()
        preds = [0] * ncomp
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                emit_rst(bw, rst)
                rst += 1
                preds = [0] * ncomp
            my, mx = divmod(m, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_blocks[ci][(my * sv + by, mx * sh + bx)]
                        if ah:
                            bw.write((int(zz[0]) >> al) & 1, 1)
                            continue
                        dc = int(zz[0]) >> al  # arithmetic shift (T.81)
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _jpeg_cat(diff)
                        code, length = dc_map[s]
                        bw.write(code, length)
                        if s:
                            bw.write(
                                diff if diff > 0 else diff + (1 << s) - 1,
                                s)
        bw.align()
        return (sos(list(range(ncomp)), 0, 0, ah, al), bytes(bw.buf))

    def ac_scan(ci, ss, se, ah, al):
        bw = _JpegBitWriter()
        st = _ProgAcState(bw, ac_map)
        bwid, bhgt = ceil_grid(ci)
        rst = 0
        for u in range(bwid * bhgt):
            if restart_interval and u and u % restart_interval == 0:
                st.flush_eobrun()  # EOB runs never span a restart
                emit_rst(bw, rst)
                rst += 1
            by, bx = divmod(u, bwid)
            zz = comp_blocks[ci][(by, bx)]
            if ah:
                _emit_ac_refine(st, zz, al, ss, se)
            else:
                _emit_ac_first(st, zz, al, ss, se)
        st.flush_eobrun()
        bw.align()
        return (sos([ci], ss, se, ah, al), bytes(bw.buf))

    scans = [dc_scan(0, first_al)]
    for ss, se in ac_bands:
        for ci in range(ncomp):
            scans.append(ac_scan(ci, ss, se, 0, first_al))
    for al in range(first_al - 1, -1, -1):
        scans.append(dc_scan(al + 1, al))
        for ss, se in ac_bands:
            for ci in range(ncomp):
                scans.append(ac_scan(ci, ss, se, al + 1, al))
    return scans


def encode_jpeg(
    width: int | None = None,
    height: int | None = None,
    pixel=None,
    *,
    image=None,
    subsampling: str = "444",
    quant: list | None = None,
    restart_interval: int = 0,
    progressive: bool = False,
    ac_bands: tuple = ((1, 63),),
    first_al: int = 1,
) -> bytes:
    """JFIF encoder (fixture generator, the ``encode_png`` pattern):
    either ``(width, height, pixel)`` for a solid color — ``pixel`` an
    (r, g, b) tuple or a single luma int for grayscale — or ``image=``
    a numpy uint8 array (h, w, 3) or (h, w). ``quant=None`` uses
    all-ones tables, which round-trips a solid color EXACTLY through
    DCT→quant→IDCT (the q40 arithmetic-oracle property); ``subsampling``
    is ``"444"`` or ``"420"`` (color only). ``restart_interval`` > 0
    emits DRI + RSTn markers every N MCUs (N blocks in non-interleaved
    progressive scans). ``progressive=True`` (r10, verdict #6) emits a
    SOF2 frame as successive-approximation passes — interleaved DC
    first, per-component AC first per spectral band, then a full
    refinement chain down to Al=0 — exercising every progressive
    decoder path; the reconstructed coefficients are bit-exact with the
    baseline encoding of the same image, so pixel output is identical.
    ``ac_bands`` (must partition 1..63; default one band) and
    ``first_al`` (default 1) shape the scan script the way real-world
    encoders do (mozjpeg band splits, deeper approximation chains)."""
    import numpy as np

    if image is None:
        if isinstance(pixel, (int, float)):
            image = np.full((height, width), int(pixel), dtype=np.uint8)
        else:
            image = np.empty((height, width, 3), dtype=np.uint8)
            image[..., 0], image[..., 1], image[..., 2] = pixel
    image = np.asarray(image, dtype=np.uint8)
    h, w = image.shape[:2]
    gray = image.ndim == 2
    if gray:
        planes = [image.astype(np.float64)]
        samp = [(1, 1)]
    else:
        planes = list(_rgb_to_ycbcr_arrays(
            image[..., 0].astype(np.float64),
            image[..., 1].astype(np.float64),
            image[..., 2].astype(np.float64)))
        if subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for c in (1, 2):
                p = planes[c]
                ph = _pad_to(p, (p.shape[0] + 1) // 2 * 2,
                             (p.shape[1] + 1) // 2 * 2)
                planes[c] = np.floor(
                    (ph[0::2, 0::2] + ph[0::2, 1::2]
                     + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0 + 0.5)
        else:
            raise ValueError(f"subsampling must be '444' or '420', got "
                             f"{subsampling!r}")
    qtab = [np.ones(64), np.ones(64)] if quant is None else [
        np.asarray(q, dtype=np.float64) for q in quant]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    D = _dct8()
    # quantized zigzag coefficients per component, indexed by block coords
    comp_blocks = []
    for ci, ((sh, sv), plane) in enumerate(zip(samp, planes)):
        rows, cols = mcuy * sv * 8, mcux * sh * 8
        p = _pad_to(plane, rows, cols) - 128.0
        q = qtab[0 if ci == 0 else 1]
        blocks = {}
        for by in range(rows // 8):
            for bx in range(cols // 8):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = D @ blk @ D.T
                zz = coef[_JPEG_ZZ_ROWS, _JPEG_ZZ_COLS] / q
                blocks[(by, bx)] = np.rint(zz).astype(np.int64)
        comp_blocks.append(blocks)

    dc_map = _huff_encode_map(_FIX_DC_BITS, _FIX_DC_VALS)
    ac_map = _huff_encode_map(_FIX_AC_BITS, _FIX_AC_VALS)
    bw = _JpegBitWriter()
    preds = [0] * len(planes)

    def put(sym_map, sym):
        code, length = sym_map[sym]
        bw.write(code, length)

    def put_block(zz, ci):
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        s = _jpeg_cat(diff)
        put(dc_map, s)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                put(ac_map, 0xF0)
                run -= 16
            s = _jpeg_cat(v)
            put(ac_map, (run << 4) | s)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            put(ac_map, 0x00)  # EOB

    prog_scans: list[tuple[bytes, bytes]] = []
    if not progressive:
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw.align()
                bw.buf += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds[:] = [0] * len(planes)
            my, mx = divmod(m, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        put_block(
                            comp_blocks[ci][(my * sv + by, mx * sh + bx)],
                            ci)
        bw.align()
    else:
        prog_scans = _encode_progressive_scans(
            comp_blocks, samp, mcux, mcuy, w, h, dc_map, ac_map,
            restart_interval, ac_bands=ac_bands, first_al=first_al)

    def seg(marker: int, payload: bytes) -> bytes:
        return (bytes([0xFF, marker])
                + struct.pack(">H", len(payload) + 2) + payload)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0])
               + struct.pack(">HH", 72, 72) + b"\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(
        int(x) & 0xFF for x in qtab[0]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(
            int(x) & 0xFF for x in qtab[1]))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2 if progressive else 0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                   + bytes(vals))

    out += dht(0, 0, _FIX_DC_BITS, _FIX_DC_VALS)
    out += dht(1, 0, _FIX_AC_BITS, _FIX_AC_VALS)
    if not gray:
        out += dht(0, 1, _FIX_DC_BITS, _FIX_DC_VALS)
        out += dht(1, 1, _FIX_AC_BITS, _FIX_AC_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if progressive:
        for sos_payload, data in prog_scans:
            out += seg(0xDA, sos_payload)
            out += data
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        out += seg(0xDA, sos)
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


class _JpegBitReader:
    """Entropy-stream bit reader: 0xFF 0x00 unstuffing; restart markers
    are consumed only via :meth:`expect_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            else:
                raise _JpegScanEnd(b, nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def expect_restart(self) -> None:
        self.acc, self.n = 0, 0  # byte-align, drop pad bits
        if (self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("missing restart marker")


class _JpegScanEnd(Exception):
    """Marker inside the entropy stream (normally EOI)."""

    def __init__(self, a, b):
        super().__init__(f"marker ff{b:02x} in scan")
        self.marker = b


def _read_huff(br: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _jpeg_ac_first_block(br: _JpegBitReader, zz, actab: dict, ss: int,
                         se: int, al: int, eobrun: int) -> int:
    """Progressive AC FIRST pass (Ah=0) for one block's zigzag
    coefficients (T.81 G.1.2.2): band ss..se, values shifted left by the
    point transform Al; EOBn symbols (size=0, run<15) start an EOB run
    covering this and the next ``2^run - 1 + bits(run)`` blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_huff(br, actab)
        run, size = sym >> 4, sym & 15
        if size == 0:
            if run != 15:
                eobrun = (1 << run) - 1
                if run:
                    eobrun += br.bits(run)
                break
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC index overrun")
        zz[k] = _extend(br.bits(size), size) << al
        k += 1
    return eobrun


def _jpeg_ac_refine_block(br: _JpegBitReader, zz, actab: dict, ss: int,
                          se: int, al: int, eobrun: int) -> int:
    """Progressive AC REFINEMENT pass (Ah=Al+1) for one block
    (T.81 G.1.2.3): newly-nonzero coefficients arrive as size-1 symbols
    with a sign bit; every already-nonzero coefficient in the path
    consumes one correction bit that may append ``1 << al`` to its
    magnitude. Two's-complement ``c & p1`` tests whether bit al is
    already set — identical semantics for Python ints and int32."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_huff(br, actab)
            run, size = sym >> 4, sym & 15
            newval = 0
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        eobrun += br.bits(run)
                    break
                # ZRL: skip 16 zero-history coefficients
            elif size == 1:
                newval = p1 if br.bit() else m1
            else:
                raise ValueError("refinement size > 1")
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if br.bit() and (c & p1) == 0:
                        zz[k] = c + (p1 if c >= 0 else m1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_planes_to_meta(planes, comps, hmax: int, vmax: int, h: int,
                         w: int, byte_len: int,
                         with_pixels: bool = False) -> dict | None:
    """Shared decode tail (baseline + progressive): level-shift the IDCT
    planes, nearest-upsample by the sampling factors, crop, YCbCr→RGB,
    channel means + average-hash. The arithmetic here is the q40 oracle
    contract — identical for both frame types."""
    import numpy as np

    full = []
    for ci, (_cid, sh, sv, _tq) in enumerate(comps):
        p = np.clip(np.floor(planes[ci] + 128.0 + 0.5), 0, 255)
        p = np.repeat(np.repeat(p, vmax // sv, axis=0),
                      hmax // sh, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 3:
        chans = _ycbcr_to_rgb_arrays(*full)
        luma = (chans[0] + chans[1] + chans[2]) / 3.0
    elif len(comps) == 1:
        chans = (full[0],)
        luma = full[0]
    else:
        return None
    out = {
        "byte_len": byte_len,
        "format": "jpeg",
        "width": int(w),
        "height": int(h),
        "channels": len(comps),
        "channel_means": [float(np.mean(c)) for c in chans],
        "phash": _avg_hash([list(map(float, row)) for row in luma]),
    }
    if with_pixels:
        # r13 differential-test seam: the exact uint8 pixels the stats
        # were computed from, as an (h, w, channels) numpy array
        out["pixels"] = np.stack(chans, axis=-1).astype(np.uint8)
    return out


def _jpeg_progressive_scan(b: bytes, pos: int, body: bytes, comps: list,
                           huff: dict, coefs: list, dims: tuple,
                           hmax: int, vmax: int, mcux: int, mcuy: int,
                           dri: int) -> int:
    """Decode ONE progressive (SOF2) scan into the per-component
    quantized-coefficient arrays (``coefs[ci]`` shaped (by, bx, 64) in
    zigzag order, int32) and return the stream position of the next
    marker. DC scans may be interleaved (MCU order, full MCU grid);
    AC scans are single-component over the component's own
    ``ceil(comp_dim/8)`` block grid (T.81 A.2.2 — MCU padding blocks are
    NOT coded in non-interleaved scans). Restart intervals reset DC
    predictors and the EOB run per T.81 (units = MCUs when interleaved,
    blocks otherwise)."""
    h, w = dims
    ns = body[0]
    scan = []  # (ci, td, ta)
    ids = {c[0]: i for i, c in enumerate(comps)}
    for si in range(ns):
        cid, tt = body[1 + si * 2], body[2 + si * 2]
        if cid not in ids:
            raise ValueError("scan references unknown component")
        scan.append((ids[cid], tt >> 4, tt & 15))
    ss, se, a = body[1 + ns * 2], body[2 + ns * 2], body[3 + ns * 2]
    ah, al = a >> 4, a & 15
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with se != 0")
    elif ns != 1:
        raise ValueError("interleaved AC scan in progressive frame")
    if se > 63 or ss > se:
        raise ValueError("bad spectral band")
    br = _JpegBitReader(b, pos)
    eobrun = 0
    preds = [0] * len(comps)

    def maybe_restart(unit: int) -> None:
        nonlocal eobrun
        if dri and unit and unit % dri == 0:
            br.expect_restart()
            preds[:] = [0] * len(comps)
            eobrun = 0

    if ss == 0 and ns > 1:
        # interleaved DC scan: MCU order over the full MCU grid
        for m in range(mcux * mcuy):
            maybe_restart(m)
            my, mx = divmod(m, mcux)
            for ci, td, _ta in scan:
                _cid, sh, sv, _tq = comps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = coefs[ci][my * sv + by, mx * sh + bx]
                        if ah == 0:
                            s = _read_huff(br, huff[(0, td)])
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            blk[0] = preds[ci] << al
                        elif br.bit():
                            blk[0] = int(blk[0]) | (1 << al)
    else:
        # non-interleaved: one component, ceil(comp_dim/8) grid
        ci, td, ta = scan[0]
        _cid, sh, sv, _tq = comps[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        bw_ = -(-cw // 8)
        bh_ = -(-ch // 8)
        for u in range(bw_ * bh_):
            maybe_restart(u)
            by, bx = divmod(u, bw_)
            blk = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    s = _read_huff(br, huff[(0, td)])
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                elif br.bit():
                    blk[0] = int(blk[0]) | (1 << al)
            elif ah == 0:
                eobrun = _jpeg_ac_first_block(
                    br, blk, huff[(1, ta)], ss, se, al, eobrun)
            else:
                eobrun = _jpeg_ac_refine_block(
                    br, blk, huff[(1, ta)], ss, se, al, eobrun)
    return br.pos


# Pixel budget for the pure-Python baseline decode (r10, ADVICE medium):
# the SOF header is attacker-controlled on crawl data — a legal header can
# claim 65500x65500 (~4.3 G pixels), and allocating full-frame planes from
# unvalidated dims would OOM-kill the executor task instead of degrading.
# Frames above the budget fall back to the header tier (dims/EXIF stay
# available; channel_means/phash are NULL — honest, never fabricated).
# 4M pixels ≈ 2048x2048: covers fixtures and thumbnails; a real cluster
# deployment doing photo-scale decode would swap in a native codec kernel.
JPEG_PIXEL_BUDGET = 4_000_000


def jpeg_pixel_decode(b: bytes, pixel_budget: int = JPEG_PIXEL_BUDGET,
                      with_pixels: bool = False) -> dict | None:
    """REAL JPEG pixel decode: marker walk → DQT/DHT/SOF/DRI/SOS parse →
    Huffman entropy decode → dequantize → IDCT → upsample (any 1/2
    sampling factors, nearest) → YCbCr→RGB → per-channel means +
    average-hash, the same meta dict shape as ``png_decode``. Huffman
    tables come from the FILE, never assumed. Baseline/extended
    sequential (SOF0/SOF1, r9 verdict #4) decode scan-interleaved;
    PROGRESSIVE (SOF2, r10 verdict #6) accumulates per-component
    quantized coefficients across spectral-selection and
    successive-approximation scans (T.81 G.1.2) and reconstructs once at
    EOI — both share the dequant/IDCT/upsample/color tail, so pixel
    arithmetic is identical. Arithmetic-coded / lossless / hierarchical
    frames return None — callers (``jpeg_decode``) fall back to the
    header-only parse, so a corrupt scan yields header metadata with
    NULL means, and corrupt magic yields a NULL row, never fabricated
    stats."""
    import numpy as np

    if not b.startswith(_JPEG_SIG):
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple, dict] = {}
        comps = None  # [(id, sh, sv, tq)]
        dims = None
        dri = 0
        progressive = False
        nscans = 0
        coefs = None  # progressive: per-comp (by, bx, 64) int32 zigzag
        hmax = vmax = mcux = mcuy = 0
        pos = 2
        while True:
            if b[pos] != 0xFF:
                return None
            while b[pos] == 0xFF:
                pos += 1
            marker = b[pos]
            pos += 1
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                continue
            if marker == 0xD9:
                if progressive and nscans:
                    break  # EOI ends the progressive scan sequence
                return None  # EOI before SOS
            (seg_len,) = struct.unpack_from(">H", b, pos)
            seg_end = pos + seg_len
            body = b[pos + 2:seg_end]
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 15
                    i += 1
                    if pq == 0:
                        vals = list(body[i:i + 64])
                        i += 64
                    else:
                        vals = [v[0] for v in struct.iter_unpack(
                            ">H", body[i:i + 128])]
                        i += 128
                    qt[tq] = np.asarray(vals, dtype=np.float64)
            elif marker == 0xC4:
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 15
                    bits = list(body[i + 1:i + 17])
                    n = sum(bits)
                    vals = list(body[i + 17:i + 17 + n])
                    huff[(tc, th)] = _huff_decode_map(bits, vals)
                    i += 17 + n
            elif marker in (0xC0, 0xC1, 0xC2):
                progressive = marker == 0xC2
                _prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
                comps = []
                for ci in range(nc):
                    cid, hv, tq = struct.unpack_from(
                        ">BBB", body, 6 + ci * 3)
                    comps.append((cid, hv >> 4, hv & 15, tq))
                dims = (hh, ww)
                if hh * ww > pixel_budget or hh == 0 or ww == 0:
                    # forged/huge SOF dims (or degenerate 0-dim frames):
                    # refuse to allocate O(pixels) planes/coefficient
                    # arrays; caller falls back to the header tier
                    return None
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                # the nearest upsample assumes integer replication
                # factors (true for the 1/2 factors of every real-world
                # file); an exotic 3:2-style ratio must fall back to the
                # header tier rather than decode wrong pixels (r9 review)
                if any(c[1] < 1 or c[2] < 1 or hmax % c[1] or vmax % c[2]
                       for c in comps):
                    return None
                mcux = -(-ww // (8 * hmax))
                mcuy = -(-hh // (8 * vmax))
            elif marker in _JPEG_SOF:
                return None  # arithmetic/lossless/hierarchical: header tier
            elif marker == 0xDD:
                (dri,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:
                if comps is None or not qt:
                    return None
                if progressive:
                    if nscans >= 64:
                        # forged scan-count bound (the pixel-budget
                        # philosophy): a real progressive file has ~10-20
                        # scans; refuse unbounded O(scans x blocks) work
                        return None
                    if coefs is None:
                        coefs = [
                            np.zeros((mcuy * c[2], mcux * c[1], 64),
                                     dtype=np.int32) for c in comps]
                    pos = _jpeg_progressive_scan(
                        b, seg_end, body, comps, huff, coefs, dims,
                        hmax, vmax, mcux, mcuy, dri)
                    nscans += 1
                    continue
                ns = body[0]
                scan = {}
                for si in range(ns):
                    cid, tt = body[1 + si * 2], body[2 + si * 2]
                    scan[cid] = (tt >> 4, tt & 15)
                if {c[0] for c in comps} != set(scan):
                    return None  # multi-scan: not baseline interleaved
                br = _JpegBitReader(b, seg_end)
                break
            pos = seg_end

        h, w = dims
        D = _dct8()
        if progressive:
            # all scans consumed: dequantize the accumulated coefficient
            # tensors, one vectorized IDCT per component, shared tail
            zz_r = np.asarray(_JPEG_ZZ_ROWS)
            zz_c = np.asarray(_JPEG_ZZ_COLS)
            planes = []
            for ci, (_cid, sh, sv, tq) in enumerate(comps):
                deq = coefs[ci].astype(np.float64) * qt[tq][None, None, :]
                nby, nbx = deq.shape[:2]
                mats = np.zeros((nby, nbx, 8, 8))
                mats[:, :, zz_r, zz_c] = deq
                blocks = np.einsum("ab,yxbc,cd->yxad", D.T, mats, D)
                planes.append(blocks.transpose(0, 2, 1, 3)
                              .reshape(nby * 8, nbx * 8))
            return _jpeg_planes_to_meta(planes, comps, hmax, vmax,
                                        h, w, len(b), with_pixels)
        planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8))
                  for c in comps]
        preds = [0] * len(comps)
        zz_r = np.asarray(_JPEG_ZZ_ROWS)
        zz_c = np.asarray(_JPEG_ZZ_COLS)

        def block(ci):
            cid, sh, sv, tq = comps[ci]
            td, ta = scan[cid]
            q = qt[tq]
            s = _read_huff(br, huff[(0, td)])
            diff = _extend(br.bits(s), s) if s else 0
            preds[ci] += diff
            zz = np.zeros(64)
            zz[0] = preds[ci] * q[0]
            k = 1
            while k < 64:
                sym = _read_huff(br, huff[(1, ta)])
                if sym == 0x00:
                    break
                run, size = sym >> 4, sym & 15
                if size == 0:
                    if run != 15:
                        break
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index overrun")
                zz[k] = _extend(br.bits(size), size) * q[k]
                k += 1
            coef = np.zeros((8, 8))
            coef[zz_r, zz_c] = zz
            return D.T @ coef @ D

        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                br.expect_restart()
                preds[:] = [0] * len(comps)
            my, mx = divmod(m, mcux)
            for ci, (_cid, sh, sv, _tq) in enumerate(comps):
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        planes[ci][r0:r0 + 8, c0:c0 + 8] = block(ci)

        return _jpeg_planes_to_meta(planes, comps, hmax, vmax,
                                    h, w, len(b), with_pixels)
    except (_JpegScanEnd, ValueError, IndexError, KeyError,
            ZeroDivisionError, struct.error, MemoryError):
        # MemoryError included (r10, ADVICE): an allocation that still
        # slips past the pixel budget degrades to the header tier rather
        # than killing the task
        return None
