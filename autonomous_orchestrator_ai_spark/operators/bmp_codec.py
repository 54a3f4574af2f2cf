"""Pure-Python BMP (Windows bitmap) codec — the no-library baseline image
format for the multimodal pipeline (same vendoring strategy as
sources/avro_codec.py for the Avro wire format: implement the public spec
subset the pipeline needs so ONE real format is testable end-to-end in an
environment without PIL/ffmpeg).

Implements the uncompressed 24-bit BI_RGB subset of the public BMP file
format (BITMAPFILEHEADER + BITMAPINFOHEADER): encoder and decoder, both
bottom-up (positive height) and top-down (negative height) row orders,
4-byte row padding, BGR channel order on the wire / RGB in memory.
Palette, RLE, 16/32-bit, and V4/V5 headers are out of scope — a real
cluster wires PIL/turbojpeg into the same ``mapInPandas`` slot
(operators/multimodal.py) for everything else.

Everything here is per-blob pure CPU with no external deps, so it runs
inside Arrow-batched Python workers with memory bounded by the batch size.
"""

from __future__ import annotations

import struct

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
_BI_RGB = 0


def _row_stride(width: int) -> int:
    """Bytes per padded row: 3*width rounded up to a 4-byte boundary."""
    return (3 * width + 3) & ~3


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes (len == 3*width*height) as a
    bottom-up 24-bit uncompressed BMP file."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(rgb) != 3 * width * height:
        raise ValueError(
            f"need {3 * width * height} RGB bytes for {width}x{height}, "
            f"got {len(rgb)}"
        )
    stride = _row_stride(width)
    pad = b"\x00" * (stride - 3 * width)
    rows = []
    # BMP stores bottom row first; pixels are BGR on the wire
    for y in range(height - 1, -1, -1):
        row = bytearray()
        base = 3 * width * y
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    offset = _FILE_HEADER.size + _INFO_HEADER.size
    file_header = _FILE_HEADER.pack(
        b"BM", offset + len(pixel_data), 0, 0, offset
    )
    info_header = _INFO_HEADER.pack(
        _INFO_HEADER.size, width, height, 1, 24, _BI_RGB,
        len(pixel_data), 2835, 2835, 0, 0,
    )
    return file_header + info_header + pixel_data


def decode_bmp(blob: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP into (width, height, row-major
    top-down RGB bytes). Raises ValueError on anything outside the
    supported subset — loud, never a silent wrong image."""
    if len(blob) < _FILE_HEADER.size + _INFO_HEADER.size:
        raise ValueError("truncated BMP: missing headers")
    magic, _file_size, _r1, _r2, offset = _FILE_HEADER.unpack_from(blob, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP (magic {magic!r})")
    (
        header_size, width, height, planes, bpp, compression,
        _img_size, _xppm, _yppm, _ncolors, _nimportant,
    ) = _INFO_HEADER.unpack_from(blob, _FILE_HEADER.size)
    if header_size < _INFO_HEADER.size:
        raise ValueError(f"unsupported header size {header_size}")
    if planes != 1 or bpp != 24 or compression != _BI_RGB:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    stride = _row_stride(width)
    if len(blob) < offset + stride * height:
        raise ValueError("truncated BMP: missing pixel data")
    out = bytearray(3 * width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        src = offset + stride * src_y
        dst = 3 * width * y
        for x in range(width):
            b, g, r = blob[src + 3 * x : src + 3 * x + 3]
            out[dst + 3 * x : dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(out)


def resize_nearest(
    width: int, height: int, rgb: bytes, new_width: int, new_height: int
) -> bytes:
    """Nearest-neighbor resample of row-major RGB bytes — the minimal real
    resize kernel (a real cluster swaps in PIL's Lanczos in the same
    slot). Index mapping matches the standard floor((i + 0.5) * src/dst)
    center-aligned convention."""
    if new_width <= 0 or new_height <= 0:
        raise ValueError(f"invalid target {new_width}x{new_height}")
    out = bytearray(3 * new_width * new_height)
    for y in range(new_height):
        sy = min(int((y + 0.5) * height / new_height), height - 1)
        src_row = 3 * width * sy
        dst_row = 3 * new_width * y
        for x in range(new_width):
            sx = min(int((x + 0.5) * width / new_width), width - 1)
            out[dst_row + 3 * x : dst_row + 3 * x + 3] = rgb[
                src_row + 3 * sx : src_row + 3 * sx + 3
            ]
    return bytes(out)
