"""Pure-stdlib BMP/PNG codec: known-image round trips and the mm02
closed-form file-size contract the DuckDB oracle relies on."""

from __future__ import annotations

import pytest

from flink_streaming_platform_web_spark.operators.imagecodec import (
    decode_bmp,
    decode_image,
    decode_image_meta,
    decode_png,
    encode_bmp,
    encode_png,
)

# 2x2 test image: red, green / blue, white (top-down RGB)
PIX_2X2 = bytes(
    [255, 0, 0, 0, 255, 0] + [0, 0, 255, 255, 255, 255]
)


def test_bmp_round_trip_known_pixels():
    data = encode_bmp(2, 2, PIX_2X2)
    w, h, rgb = decode_bmp(data)
    assert (w, h) == (2, 2)
    assert rgb == PIX_2X2
    # closed-form size: 54 + h * ((3w+3) & ~3) = 54 + 2*8
    assert len(data) == 70


def test_png_round_trip_known_pixels():
    data = encode_png(2, 2, PIX_2X2)
    w, h, rgb = decode_png(data)
    assert (w, h) == (2, 2)
    assert rgb == PIX_2X2
    # closed-form size with stored blocks: 68 + h*(3w+1) = 68 + 14
    assert len(data) == 82


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_decode(ftype):
    """The decoder must unfilter every PNG scanline filter, not just
    the one our encoder defaults to — real files in the wild use all
    five."""
    # 4x3 gradient-ish image so Sub/Up/Average/Paeth all differ
    rgb = bytes((x * 17 + y * 31 + c * 7) % 256
                for y in range(3) for x in range(4) for c in range(3))
    data = encode_png(4, 3, rgb, filter_type=ftype)
    w, h, out = decode_png(data)
    assert (w, h, out) == (4, 3, rgb)


def test_png_compressed_round_trip():
    rgb = bytes(range(0, 48))
    data = encode_png(4, 4, rgb, compress_level=9)
    assert decode_png(data) == (4, 4, rgb)


def test_decode_image_sniffs_format():
    assert decode_image(encode_png(2, 2, PIX_2X2))[2] == "png"
    assert decode_image(encode_bmp(2, 2, PIX_2X2))[2] == "bmp"


def test_decode_image_meta_header_only():
    assert decode_image_meta(encode_png(2, 2, PIX_2X2)) == (2, 2, "png")
    assert decode_image_meta(encode_bmp(2, 2, PIX_2X2)) == (2, 2, "bmp")


def test_undecodable_payload_raises():
    with pytest.raises(ValueError, match="undecodable"):
        decode_image_meta(b"not an image at all")
    with pytest.raises(ValueError, match="undecodable"):
        decode_image(b"JFIF-ish garbage")


def test_corrupt_png_crc_raises():
    data = bytearray(encode_png(2, 2, PIX_2X2))
    # flip a bit inside the IHDR payload (width field)
    data[18] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_image_meta(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_mm02_renders_real_decodable_files():
    """mm02's synthesis rule produces real files whose size matches
    the oracle's closed-form arithmetic."""
    from flink_streaming_platform_web_spark.operators.multimodal import (
        render_image,
    )

    for text in (b"hello world", b"x" * 200, b"ab", b""):
        n = len(text)
        w, h = n % 64 + 1, n % 48 + 1
        payload = render_image(text)
        expect = (
            68 + h * (3 * w + 1)
            if n % 2 == 0
            else 54 + h * ((3 * w + 3) & ~3)
        )
        assert len(payload) == expect, (n, len(payload), expect)
        got = decode_image_meta(payload)
        assert got == (w, h, "png" if n % 2 == 0 else "bmp")


def test_truncated_payloads_raise_value_error():
    """The quarantine contract: ANY undecodable/truncated payload
    raises ValueError (never struct.error) so pipelines can route bad
    blobs with one except clause."""
    import pytest

    from flink_streaming_platform_web_spark.operators import imagecodec

    sig = b"\x89PNG\r\n\x1a\n"
    for payload in (
        sig,  # signature only
        sig + b"\x00\x00\x00\x0dIHDR",  # length+type, no payload/CRC
        sig + b"\x00" * 20,  # garbage after signature
        b"BM\x00\x00",  # truncated BMP
    ):
        for fn in (
            imagecodec.decode_image_meta,
            imagecodec.decode_image,
        ):
            with pytest.raises(ValueError):
                fn(payload)


def test_halve_image_golden_pixels():
    """Nearest-neighbor half-size keeps exactly the even rows/cols
    (ceil geometry: 1x1 stays 1x1) — pinned on a 4x2 image whose
    pixels encode their own coordinates, through BOTH codecs."""
    from flink_streaming_platform_web_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
        encode_png,
    )
    from flink_streaming_platform_web_spark.operators.multimodal import (
        halve_image,
    )

    # pixel (x, y) = (10x, 10y, 200) — 4 wide, 2 tall
    px = bytes(
        b
        for y in range(2)
        for x in range(4)
        for b in (10 * x, 10 * y, 200)
    )
    for enc, fmt in ((encode_png, "png"), (encode_bmp, "bmp")):
        w, h, dw, dh, got_fmt, out = halve_image(enc(4, 2, px))
        assert (w, h, dw, dh, got_fmt) == (4, 2, 2, 1, fmt)
        ow, oh, ofmt, opx = decode_image(out)
        assert (ow, oh, ofmt) == (2, 1, fmt)
        # survivors are (x=0, y=0) and (x=2, y=0)
        assert opx == bytes((0, 0, 200, 20, 0, 200))
    # 1x1 stays 1x1
    one = encode_bmp(1, 1, bytes((7, 8, 9)))
    w, h, dw, dh, _, out = halve_image(one)
    assert (w, h, dw, dh) == (1, 1, 1, 1)
    assert decode_image(out)[3] == bytes((7, 8, 9))
