"""GIF pixel decode (LZW) — pure stdlib + numpy, no codec library.

Completes the pixel tier over the three dominant crawl image formats:
PNG (``pixels.decode_png_pixels``), baseline JPEG (``jpeg``), and now GIF
— the whole GIF87a/89a still-image format (logical screen descriptor,
global/local color tables, variable-width LSB-first LZW with clear/EOI
codes and 4096-entry dictionary, the 4-pass interlace row order, and the
GCE transparent index) is spec-expressible without a dependency.

Scope and honest refusals, same discipline as the PNG/JPEG decoders:

* The FIRST image frame decodes (a crawl thumbnail pipeline wants the
  still; animation compositing — frame disposal, partial updates — is
  out of scope and later frames are simply not read).
* Output is (h, w, 3) RGB of the full logical screen; pixels outside the
  frame rect, or marked transparent by the GCE, take the background
  color (background color index, else black).
* Malformed files (truncated sub-blocks, out-of-range codes, missing
  color table) return None — decode-or-refuse, never wrong pixels.

The encoder (``synthesize_gif_real``) writes real decodable files for
golden tests: indexed pixels LZW-coded with a CLEAR emitted every
``2^min_code_size - 3`` literals so the code width never grows — the
classic valid-if-verbose "uncompressed GIF" trick — with optional
interlacing to exercise the decoder's row reordering.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 24  # same forged-dims cap as the JPEG decoder


def decode_gif_pixels(data: bytes) -> np.ndarray | None:
    """GIF bytes → (height, width, 3) uint8 RGB of the first frame
    composited onto the logical screen, or None if not decodable."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    data = bytes(data)
    if not (data.startswith(b"GIF87a") or data.startswith(b"GIF89a")):
        return None
    try:
        return _decode(data)
    except (ValueError, IndexError, struct.error):
        return None


def _color_table(data: bytes, i: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(field+1) entries
    table = np.frombuffer(data[i : i + 3 * n], dtype=np.uint8)
    if table.size != 3 * n:
        raise ValueError("truncated color table")
    return table.reshape(n, 3), i + 3 * n


def _sub_blocks(data: bytes, i: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if i >= len(data):
            raise ValueError("truncated sub-blocks")
        ln = data[i]
        i += 1
        if ln == 0:
            return bytes(out), i
        out += data[i : i + ln]
        if len(out) and i + ln > len(data):
            raise ValueError("truncated sub-block payload")
        i += ln


def _lzw_decode(min_code_size: int, src: bytes, n_pixels: int) -> bytearray:
    """Variable-width LSB-first LZW (GIF flavor): clear/EOI codes, dict
    capped at 4096, width grows when the next code would not fit."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    dict_base = [bytes([c]) for c in range(clear)]
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = list(dict_base) + [b"", b""]  # clear + eoi placeholders
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(src):
                return out  # tolerate a truncated tail (partial image)
            acc |= src[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _decode(data: bytes) -> np.ndarray | None:
    sw, sh, flags, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    if not sw or not sh or sw * sh > _MAX_PIXELS:
        return None
    i = 13
    gct = None
    if flags & 0x80:
        gct, i = _color_table(data, i, flags & 0x07)
    transparent = None
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[i + 1]
            i += 2
            if label == 0xF9:  # graphic control
                ln = data[i]
                if ln >= 4 and (data[i + 1] & 0x01):
                    transparent = data[i + 4]
                # skip via the generic sub-block walk below
            blk, i = _sub_blocks(data, i)
            continue
        if b == 0x2C:  # image descriptor — the first frame
            left, top, fw, fh, iflags = struct.unpack(
                "<HHHHB", data[i + 1 : i + 10]
            )
            i += 10
            lct = None
            if iflags & 0x80:
                lct, i = _color_table(data, i, iflags & 0x07)
            palette = lct if lct is not None else gct
            if palette is None or not fw or not fh:
                return None
            if fw * fh > _MAX_PIXELS:
                return None
            min_code = data[i]
            i += 1
            lzw, i = _sub_blocks(data, i)
            idx = _lzw_decode(min_code, lzw, fw * fh)
            if len(idx) < fw * fh:  # pad a truncated image with bg/0
                idx = idx + bytearray(fw * fh - len(idx))
            frame = np.frombuffer(bytes(idx[: fw * fh]), dtype=np.uint8)
            frame = frame.reshape(fh, fw)
            if iflags & 0x40:
                frame = _deinterlace(frame)
            if int(frame.max()) >= len(palette):
                return None  # out-of-palette index: refuse, never fabricate
            np_pal = palette
            # background canvas: bg color index if the GCT has it
            if gct is not None and bg_idx < len(gct):
                canvas = np.tile(gct[bg_idx], (sh, sw, 1)).astype(np.uint8)
            else:
                canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            # clamp frame rect into the screen
            fw_c = min(fw, max(0, sw - left))
            fh_c = min(fh, max(0, sh - top))
            if fw_c and fh_c:
                sub = frame[:fh_c, :fw_c]
                rgb = np_pal[sub]
                if transparent is not None:
                    keep = sub != transparent
                    region = canvas[top : top + fh_c, left : left + fw_c]
                    region[keep] = rgb[keep]
                else:
                    canvas[top : top + fh_c, left : left + fw_c] = rgb
            return canvas
        # unknown block type: refuse rather than resync blindly
        return None
    return None


def synthesize_gif_real(
    width: int,
    height: int,
    rgb: tuple = (200, 80, 30),
    interlace: bool = False,
) -> bytes:
    """Solid-color REAL decodable GIF89a (counterpart of
    ``binary_ops.synthesize_png`` / ``jpeg.synthesize_jpeg_real``)."""
    arr = np.tile(
        np.array(rgb, dtype=np.uint8)[None, None, :], (height, width, 1)
    )
    return encode_gif(arr, interlace=interlace)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 → real GIF89a. Palette = the image's distinct
    colors (≤ 256 required); LZW emitted literal-per-pixel with periodic
    CLEAR codes so the code width never grows (valid, verbose)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3 or not h or not w:
        raise ValueError("need (h, w, 3) uint8")
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors")
    # pad palette to a power of two >= 2
    n_pal = 2
    while n_pal < len(colors):
        n_pal *= 2
    size_field = n_pal.bit_length() - 2
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, n_pal.bit_length() - 1)

    pix = idx.reshape(h, w)
    if interlace:
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
        ]
        pix = pix[np.asarray(order)]
    seq = pix.reshape(-1)

    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1
    # bit writer (LSB-first)
    acc = 0
    nbits = 0
    payload = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    burst = (1 << min_code) - 3  # dict grows by burst-1 < width threshold
    for k, v in enumerate(seq):
        if k and k % burst == 0:
            emit(clear)
        emit(int(v))
    emit(eoi)
    if nbits:
        payload.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)
