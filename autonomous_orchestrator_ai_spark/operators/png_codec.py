"""Pure-Python PNG codec (stdlib zlib only) — the second REAL image format
for the multimodal pipeline, alongside operators/bmp_codec.py (same
vendoring strategy as sources/avro_codec.py: implement the public-spec
subset the pipeline needs so real corpora formats are testable end-to-end
in an environment without PIL/ffmpeg).

Implements the PNG spec (RFC 2083 / W3C PNG) subset real corpora mostly
contain: 8-bit-per-channel truecolor (color type 2, RGB), truecolor+alpha
(color type 6, RGBA), grayscale (color type 0 — r7), and palette-indexed
(color type 3 with a PLTE lookup — r7; decode returns the EXPANDED RGB
pixels, and an index past the palette's end raises — a truncated palette
is dead-letter data, never a silently black pixel), all non-interlaced,
with ALL five per-row filter types (None/Sub/Up/Average/Paeth) on decode;
the encoder emits filter 0 rows (always legal). Chunk CRCs are verified
on decode, so truncated or bit-flipped blobs fail LOUDLY (ValueError) and
land in the dead-letter path rather than decoding to a silently wrong
image. 16-bit, 1/2/4-bit depths, gray+alpha (type 4), interlace (Adam7),
and ancillary color-management chunks are out of scope — a real cluster
wires PIL/turbojpeg into the same ``mapInPandas`` slot
(operators/multimodal.py) for those.

Decode cost is one zlib.decompress plus one defilter pass per row — pure
CPU per blob, so it runs inside Arrow-batched Python workers with memory
bounded by the batch size.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_GRAY, _RGB, _PALETTE, _RGBA = 0, 2, 3, 6
#: channels as STORED in the IDAT stream (palette rows store 1 index byte
#: per pixel; decode expands them to RGB afterwards)
_CHANNELS = {_GRAY: 1, _RGB: 3, _PALETTE: 1, _RGBA: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Encode row-major top-down grayscale (channels=1), RGB (channels=3)
    or RGBA (channels=4) bytes as a non-interlaced 8-bit PNG (filter 0 on
    every row)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"channels must be 1, 3 or 4, got {channels}")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(pixels) != channels * width * height:
        raise ValueError(
            f"need {channels * width * height} bytes for {width}x{height}"
            f"x{channels}, got {len(pixels)}"
        )
    color_type = {1: _GRAY, 3: _RGB, 4: _RGBA}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = channels * width
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    width: int, height: int, indices: bytes, palette: bytes
) -> bytes:
    """Encode a palette-indexed (color type 3) non-interlaced 8-bit PNG:
    ``indices`` is one byte per pixel (row-major top-down), ``palette``
    the PLTE payload — RGB triples, 1..256 entries."""
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(indices) != width * height:
        raise ValueError(
            f"need {width * height} index bytes for {width}x{height}, "
            f"got {len(indices)}"
        )
    if len(palette) % 3 != 0 or not (3 <= len(palette) <= 768):
        raise ValueError(
            f"palette must be 1..256 RGB triples, got {len(palette)} bytes"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _PALETTE, 0, 0, 0)
    raw = b"".join(
        b"\x00" + indices[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _defilter(
    raw: bytes, width: int, height: int, channels: int
) -> bytes:
    """Reverse the per-row PNG filters. Returns row-major pixel bytes."""
    stride = channels * width
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"decompressed size {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_start = -1  # start of previous output row, or -1 for row 0
    for y in range(height):
        f = raw[y * (stride + 1)]
        src = y * (stride + 1) + 1
        dst = y * stride
        row = raw[src : src + stride]
        if f == 0:  # None
            out[dst : dst + stride] = row
        elif f == 1:  # Sub
            for i in range(stride):
                left = out[dst + i - channels] if i >= channels else 0
                out[dst + i] = (row[i] + left) & 0xFF
        elif f == 2:  # Up
            if prev_start < 0:
                out[dst : dst + stride] = row
            else:
                for i in range(stride):
                    out[dst + i] = (row[i] + out[prev_start + i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = out[dst + i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[dst + i] = (row[i] + ((left + up) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[dst + i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = (
                    out[prev_start + i - channels]
                    if (prev_start >= 0 and i >= channels)
                    else 0
                )
                out[dst + i] = (row[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f} on row {y}")
        prev_start = dst
    return bytes(out)


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit grayscale/RGB/palette/RGBA non-interlaced PNG.

    Returns (width, height, channels, row-major top-down pixel bytes) —
    channels is 1 for grayscale, 3 for RGB AND for palette images (the
    PLTE lookup is applied here, so callers always get real pixels), 4
    for RGBA. Raises ValueError on anything outside the supported subset,
    on CRC mismatch, on truncation, and on a palette index past the
    palette's end (truncated PLTE) — loud, never a silently wrong
    image."""
    if blob[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"not a PNG (magic {blob[:8]!r})")
    pos, ihdr, plte, idat, ended = len(_MAGIC), None, None, bytearray(), False
    while pos < len(blob):
        if pos + 8 > len(blob):
            raise ValueError("truncated PNG: partial chunk header")
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(blob):
            raise ValueError(f"truncated PNG: chunk {tag!r} overruns blob")
        payload = blob[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", blob, end)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = payload
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            ended = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos = end + 4
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    if not ended:
        raise ValueError("truncated PNG: missing IEND")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG variant (bit depth {depth}, color type "
            f"{color_type}); only 8-bit gray/RGB/palette/RGBA"
        )
    if comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported compression/filter method ({comp}/{filt})"
        )
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid dimensions {width}x{height}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    channels = _CHANNELS[color_type]
    px = _defilter(raw, width, height, channels)
    if color_type == _PALETTE:
        return width, height, 3, _expand_palette(px, plte)
    return width, height, channels, px


def _expand_palette(indices: bytes, plte: bytes | None) -> bytes:
    """PLTE lookup: one index byte per pixel -> RGB triples. A missing or
    malformed palette, or an index past its end, is dead-letter data."""
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if len(plte) % 3 != 0 or not (3 <= len(plte) <= 768):
        raise ValueError(
            f"malformed PLTE: {len(plte)} bytes (need 1..256 RGB triples)"
        )
    n_entries = len(plte) // 3
    hi = max(indices) if indices else 0
    if hi >= n_entries:
        raise ValueError(
            f"palette index {hi} out of range (palette has {n_entries} "
            "entries — truncated palette)"
        )
    out = bytearray(3 * len(indices))
    for i, idx in enumerate(indices):
        out[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
    return bytes(out)


def resize_nearest_px(
    width: int,
    height: int,
    pixels: bytes,
    new_width: int,
    new_height: int,
    channels: int = 3,
) -> bytes:
    """Channel-generic nearest-neighbor resample of row-major pixel bytes
    (RGBA resamples as whole 4-byte units, so alpha survives). Same
    center-aligned floor((i + 0.5) * src/dst) mapping as
    bmp_codec.resize_nearest."""
    if new_width <= 0 or new_height <= 0:
        raise ValueError(f"invalid target {new_width}x{new_height}")
    if len(pixels) != channels * width * height:
        raise ValueError(
            f"need {channels * width * height} bytes for "
            f"{width}x{height}x{channels}, got {len(pixels)}"
        )
    out = bytearray(channels * new_width * new_height)
    for y in range(new_height):
        sy = min(int((y + 0.5) * height / new_height), height - 1)
        src_row = channels * width * sy
        dst_row = channels * new_width * y
        for x in range(new_width):
            sx = min(int((x + 0.5) * width / new_width), width - 1)
            out[dst_row + channels * x : dst_row + channels * (x + 1)] = pixels[
                src_row + channels * sx : src_row + channels * (sx + 1)
            ]
    return bytes(out)
