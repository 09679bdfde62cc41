"""Minimal pure-Python PNG codec (stdlib only: zlib/struct/binascii).

Fallback decoder behind the same interface as the Pillow path in
``operators/multimodal.py`` so the real-codec pipeline is testable in
environments without image libraries (the reference has no multimodal
surface at all — this is builder-brief scope).  Scope: non-interlaced,
8-bit-depth PNGs of color types 0 (grayscale), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA) — which covers everything the paired
:func:`encode_png` writer produces plus commonplace tool output.
Anything else (16-bit, Adam7 interlace, malformed chunks) returns
``None`` and the caller records ``decode_ok='error'``, exactly like an
undecodable payload under Pillow.

Grayscale conversion matches Pillow's ``convert("L")`` exactly
(ITU-R 601-2 luma in Pillow's fixed-point integer form,
``(19595 R + 38470 G + 7471 B + 0x8000) >> 16``) so features computed
by either decoder agree bit-for-bit on shared inputs.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_gray(payload: bytes) -> tuple[int, int, list[int]] | None:
    """Decode a PNG into ``(width, height, grayscale_pixels)`` with
    pixels row-major in [0, 255], or ``None`` when the bytes are not a
    decodable PNG in the supported subset."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(payload: bytes) -> tuple[int, int, list[int]] | None:
    if not payload or not payload.startswith(_SIGNATURE):
        return None
    pos = len(_SIGNATURE)
    width = height = None
    color_type = bit_depth = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            return None
        pos += 8 + length + 4  # skip CRC; integrity is not our concern
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0 or interlace != 0:
                return None  # Adam7 / nonstandard: unsupported
            if bit_depth != 8 or color_type not in _CHANNELS:
                return None
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        return None
    raw = zlib.decompress(bytes(idat))
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        return None
    recon = _unfilter(raw, height, stride, bpp)
    return width, height, _to_gray(recon, width, height, color_type, palette)


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filters 0-4 (None/Sub/Up/Average/Paeth)."""
    out = bytearray(stride * height)
    for row in range(height):
        ftype = raw[row * (stride + 1)]
        line = raw[row * (stride + 1) + 1:(row + 1) * (stride + 1)]
        base = row * stride
        prev = base - stride
        if ftype == 0:
            out[base:base + stride] = line
        elif ftype == 1:  # Sub
            for i, b in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                out[base + i] = (b + left) & 0xFF
        elif ftype == 2:  # Up
            for i, b in enumerate(line):
                up = out[prev + i] if row else 0
                out[base + i] = (b + up) & 0xFF
        elif ftype == 3:  # Average
            for i, b in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                up = out[prev + i] if row else 0
                out[base + i] = (b + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i, b in enumerate(line):
                left = out[base + i - bpp] if i >= bpp else 0
                up = out[prev + i] if row else 0
                ul = out[prev + i - bpp] if (row and i >= bpp) else 0
                out[base + i] = (b + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter {ftype}")
    return out


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _to_gray(
    recon: bytearray,
    width: int,
    height: int,
    color_type: int,
    palette: bytes | None,
) -> list[int]:
    n = width * height
    if color_type == 0:
        return list(recon[:n])
    if color_type == 4:  # gray + alpha: alpha ignored (no compositing)
        return [recon[2 * i] for i in range(n)]
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        return [
            _l601(
                palette[3 * recon[i]],
                palette[3 * recon[i] + 1],
                palette[3 * recon[i] + 2],
            )
            for i in range(n)
        ]
    step = _CHANNELS[color_type]  # 3 (RGB) or 4 (RGBA)
    return [
        _l601(recon[step * i], recon[step * i + 1], recon[step * i + 2])
        for i in range(n)
    ]


def _l601(r: int, g: int, b: int) -> int:
    # Pillow's exact integer form of ITU-R 601-2 luma
    # (libImaging/Convert.c L24: fixed-point with round-half-up), NOT
    # truncated //1000 — they differ by 1 on e.g. pure green (150 vs
    # 149), which would break the bit-for-bit Pillow-parity contract.
    return (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16


def encode_png(
    width: int,
    height: int,
    pixels: list,
    color_type: int = 2,
) -> bytes:
    """Write a minimal valid PNG (8-bit, filter 0, one IDAT).

    ``pixels`` is row-major: ints for grayscale (type 0), (r, g, b)
    tuples for RGB (type 2).  Used to synthesize deterministic test
    fixtures without vendoring opaque byte blobs."""
    if color_type == 0:
        raw_rows = [
            bytes([0]) + bytes(pixels[r * width:(r + 1) * width])
            for r in range(height)
        ]
    elif color_type == 2:
        raw_rows = [
            bytes([0])
            + b"".join(
                bytes(pixels[r * width + c]) for c in range(width)
            )
            for r in range(height)
        ]
    else:
        raise ValueError("encode_png supports color types 0 and 2")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(raw_rows))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
