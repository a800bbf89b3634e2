"""Pure-stdlib image codec: 24-bit BMP and 8-bit-RGB PNG.

The multimodal pipeline (multimodal.py) needs a REAL decoder behind
its `set_decoder` seam — the container has no PIL/ffmpeg, but BMP is
plain struct-packing and PNG is chunks + zlib, both fully in the
stdlib. The round-1/2 deterministic fake never decoded a byte; with
this module mm02 synthesizes real image files and the decode stage
parses real headers (and, in tests, real pixels).

Supported surface (deliberately the common denominator a
training-data pipeline meets):
- BMP: BITMAPINFOHEADER, 24bpp, uncompressed (BI_RGB), bottom-up rows
  with 4-byte padding — the format every encoder on earth can write.
- PNG: 8-bit/channel, color type 2 (truecolor RGB), non-interlaced;
  all five scanline filters (None/Sub/Up/Average/Paeth) on decode,
  configurable filter on encode (tests exercise every unfilter path);
  zlib level 0 (stored) on encode so the file size is a closed-form
  function of the dimensions — the DuckDB oracle for mm02 exploits
  that to hash-check the full encode→decode round trip.

Anything else (interlace, palettes, 16-bit, other color types) raises
ValueError loudly — a 100 TB pipeline must quarantine undecodable
payloads, not guess.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --------------------------------------------------------------------------
# BMP — 24bpp BI_RGB
# --------------------------------------------------------------------------


def _bmp_row_size(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP from top-down RGB triples.

    ``rgb`` is ``width*height*3`` bytes, row-major, top row first.
    File size is exactly ``54 + height * ((width*3 + 3) & ~3)``.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}"
        )
    row_size = _bmp_row_size(width)
    # BMP stores rows bottom-up and pixels as BGR; one numpy reshape +
    # two reversed views + one padded copy — zero per-row Python
    # (round 12: the row loop was the constant in every mm* entry)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, : width * 3] = arr[::-1, :, ::-1].reshape(
        height, width * 3
    )
    body = padded.tobytes()
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + info + body


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, top-down RGB bytes)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP: {bpp}bpp compression={compression}"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP geometry {width}x{height}")
    row_size = _bmp_row_size(width)
    # the LAST row's trailing pad bytes may legally be absent; every
    # pixel byte itself must be present
    if offset + (height - 1) * row_size + width * 3 > len(data):
        raise ValueError("truncated BMP pixel data")
    buf = np.frombuffer(data, dtype=np.uint8, offset=offset)
    if buf.size < height * row_size:
        buf = np.concatenate(
            [buf, np.zeros(height * row_size - buf.size, np.uint8)]
        )
    rows = buf[: height * row_size].reshape(height, row_size)[
        :, : width * 3
    ]
    if bottom_up:
        rows = rows[::-1]
    rgb = rows.reshape(height, width, 3)[:, :, ::-1]
    return width, height, rgb.tobytes()


# --------------------------------------------------------------------------
# PNG — 8-bit truecolor, non-interlaced
# --------------------------------------------------------------------------


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_all_rows(
    ftype: int, mat: "np.ndarray", bpp: int
) -> "np.ndarray":
    """Filter EVERY scanline at once: a PNG filter reads only
    ORIGINAL pixel values (own row + the row above), so encoding is
    row-parallel for all five types — pure numpy, no per-byte Python
    (round 12). uint8 subtraction wraps, matching (x - pred) & 0xFF;
    Average's (a+b)//2 needs uint16, Paeth's p = a+b-c needs int16."""
    if ftype == 0:
        return mat
    prev = np.zeros_like(mat)
    prev[1:] = mat[:-1]
    a = np.zeros_like(mat)
    a[:, bpp:] = mat[:, :-bpp]
    if ftype == 1:
        return mat - a
    if ftype == 2:
        return mat - prev
    if ftype == 3:
        return mat - (
            (a.astype(np.uint16) + prev) // 2
        ).astype(np.uint8)
    if ftype == 4:
        c = np.zeros_like(prev)
        c[:, bpp:] = prev[:, :-bpp]
        a16 = a.astype(np.int16)
        b16 = prev.astype(np.int16)
        c16 = c.astype(np.int16)
        p = a16 + b16 - c16
        pa = np.abs(p - a16)
        pb = np.abs(p - b16)
        pc = np.abs(p - c16)
        pred = np.where(
            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, c)
        )
        return mat - pred
    raise ValueError(f"bad filter type {ftype}")


def _unfilter_row(
    ftype: int, row: bytearray, prev: bytes, bpp: int
) -> None:
    if ftype == 0:
        return
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")


def encode_png(
    width: int,
    height: int,
    rgb: bytes,
    filter_type: int = 0,
    compress_level: int = 0,
) -> bytes:
    """8-bit RGB non-interlaced PNG from top-down RGB triples.

    With the defaults (filter 0, zlib level 0 = stored blocks) the
    file size is closed-form: raw = height*(1 + 3*width); for
    raw <= 65535 the file is exactly ``68 + raw`` bytes — the mm02
    oracle replays this arithmetic in SQL to hash-check real encodes.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}"
        )
    stride = width * 3
    mat = np.frombuffer(rgb, dtype=np.uint8).reshape(height, stride)
    raw = np.empty((height, 1 + stride), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = _filter_all_rows(filter_type, mat, 3)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, top-down RGB bytes). Verifies chunk CRCs."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        # the 4 CRC bytes must also be present — a payload cut at the
        # chunk boundary would otherwise escape as struct.error and
        # break the module's ValueError quarantine contract
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(ctype + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_v, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
            if (depth, ctype_v, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant: depth="
                    f"{depth} color={ctype_v} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG pixel data length mismatch")
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(
        height, 1 + stride
    )
    ftypes = mat[:, 0]
    rows = mat[:, 1:]
    if ftypes.size and int(ftypes.max()) > 4:
        raise ValueError(
            f"unsupported PNG filter type {int(ftypes.max())}"
        )
    if not ftypes.any():
        # filter 0 throughout (our own encoder's default and the mm*
        # corpus path): the pixel matrix IS the payload — zero loops
        return width, height, rows.tobytes()
    # general path: None/Up are whole-row vector ops, Sub is a
    # per-lane running sum (mod 256 survives any accumulator wrap
    # since 256 divides 2^32); Average/Paeth keep the scalar
    # fallback — their recurrences read DECODED left neighbors
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(ftypes[y])
        row = rows[y]
        if ft == 0:
            out[y] = row
        elif ft == 1:
            lanes = np.cumsum(
                row.reshape(-1, 3), axis=0, dtype=np.uint32
            )
            out[y] = (lanes & 0xFF).astype(np.uint8).reshape(-1)
        elif ft == 2:
            out[y] = row + prev
        else:
            r = bytearray(row.tobytes())
            _unfilter_row(ft, r, prev.tobytes(), 3)
            out[y] = np.frombuffer(bytes(r), dtype=np.uint8)
        prev = out[y]
    return width, height, out.tobytes()


# --------------------------------------------------------------------------
# format-sniffing entry points
# --------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[int, int, str, bytes]:
    """Sniff the magic bytes and decode. -> (w, h, format, rgb)."""
    if data.startswith(_PNG_SIG):
        w, h, rgb = decode_png(data)
        return w, h, "png", rgb
    if data[:2] == b"BM":
        w, h, rgb = decode_bmp(data)
        return w, h, "bmp", rgb
    raise ValueError(
        f"undecodable payload (magic {data[:8]!r}) — quarantine, "
        "don't guess"
    )


def decode_image_meta(data: bytes) -> tuple[int, int, str]:
    """The `set_decoder`-shaped entry: header-only metadata decode.

    Parses and VALIDATES the real header (PNG: signature + IHDR CRC +
    variant check; BMP: magic + bpp/compression fields) without
    touching pixel data — the shape a 100 TB metadata pass actually
    runs. Full pixel decode stays available via `decode_image`."""
    if data.startswith(_PNG_SIG):
        # signature(8) + length(4) + type(4) + IHDR payload(13) +
        # CRC(4): anything shorter is a truncated upload — ValueError
        # (the quarantine contract), never struct.error
        if len(data) < 33:
            raise ValueError("truncated PNG header")
        pos = len(_PNG_SIG)
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        if ctype != b"IHDR" or length != 13:
            raise ValueError("PNG missing leading IHDR")
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(ctype + payload) & 0xFFFFFFFF):
            raise ValueError("PNG IHDR CRC mismatch")
        w, h, depth, ctype_v, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", payload
        )
        if (depth, ctype_v, comp, filt, interlace) != (8, 2, 0, 0, 0):
            raise ValueError(
                f"unsupported PNG variant: depth={depth} "
                f"color={ctype_v} interlace={interlace}"
            )
        return w, h, "png"
    if data[:2] == b"BM":
        if len(data) < 54:
            raise ValueError("truncated BMP header")
        _, w, h = struct.unpack_from("<Iii", data, 14)
        _, bpp, compression = struct.unpack_from("<HHI", data, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"unsupported BMP: {bpp}bpp compression={compression}"
            )
        return w, abs(h), "bmp"
    raise ValueError(
        f"undecodable payload (magic {data[:8]!r}) — quarantine, "
        "don't guess"
    )
