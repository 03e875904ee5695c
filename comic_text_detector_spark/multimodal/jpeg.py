"""JPEG pixel codec — baseline (SOF0/SOF1 sequential DCT) AND progressive
(SOF2) Huffman decoding, pure stdlib + numpy, no codec library.

Why it exists: a real crawl's image column is overwhelmingly JPEG, so the
pixel-tier operators (F5/F6 letterbox, F25 warp — reference
utils/imgproc_utils.py:15-43,86-117) silently skipped the dominant format
while PNG decoded for real. JPEG is the same discipline as the PNG path:
the entire format (marker segments, canonical Huffman entropy coding,
dequantize + 8x8 IDCT, chroma upsample, YCbCr→RGB — and for progressive
files the T.81 G.2 machinery: spectral-selection bands, successive
approximation, end-of-band runs, AC refinement correction bits) is
spec-expressible without a codec dependency.

Scope (honest refusals, like the PNG decoder's):

* SOF0/SOF1 baseline and SOF2 progressive frames, 8-bit precision, 1 or
  3 components. Arithmetic coding, hierarchical, lossless, 12-bit, and
  baseline multi-scan non-interleaved files return ``None`` —
  decodable-or-refused, never wrong pixels.
* Restart markers (DRI/RSTn), 8- and 16-bit DQT, and between-scan DHT
  redefinition are supported.
* Integer subsampling ratios only (4:4:4, 4:2:2, 4:2:0 and friends);
  chroma upsample is nearest (pixel replication).

The encoder (``encode_jpeg_baseline``) exists to synthesize REAL decodable
golden files for tests and gate queries — deterministic output, Annex-K
quantization tables (ITU T.81, public) scaled by the libjpeg quality
curve, and custom canonical Huffman tables (flat 8-bit AC codes plus a
variable-length DC table so the decoder's canonical machinery is exercised
at several code lengths).

IDCT convention shared by encoder, decoder, and tests: the orthonormal
8-point DCT-II matrix ``M`` with ``f = M.T @ F @ M`` in float64, then
round-half-up and clip — one definition, so entropy/layout bugs can be
tested bit-exactly against an independent recomputation of the transform.

Scale shape: per-row embarrassingly parallel inside the same Arrow-batched
``mapInPandas`` kernels as the PNG path (``pixels.decode_image_pixels``
dispatches on magic bytes) — no shuffle, memory bounded by batch size x
image size.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index (ITU T.81 Figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K (ITU T.81, public) base quantization tables, raster order.
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: FDCT F = M @ f @ M.T,
    IDCT f = M.T @ F @ M (ITU T.81 A.3.3 up to the orthonormal scaling)."""
    m = np.zeros((8, 8))
    for u in range(8):
        s = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            m[u, x] = s * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_M = _dct_matrix()


def idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) uint8 samples:
    batched orthonormal IDCT, +128 level shift, round-half-up, clip."""
    spatial = np.einsum("ux,nuv,vy->nxy", _M, coeffs.astype(np.float64), _M)
    return np.clip(np.floor(spatial + 128.0 + 0.5), 0, 255).astype(np.uint8)


def fdct_blocks(samples: np.ndarray) -> np.ndarray:
    """(n, 8, 8) uint8 samples → (n, 8, 8) float64 DCT coefficients."""
    shifted = samples.astype(np.float64) - 128.0
    return np.einsum("ux,nxy,vy->nuv", _M, shifted, _M)


# ---------------------------------------------------------------------------
# Huffman tables


class _HuffDecode:
    """Canonical Huffman decoder table from a DHT (BITS, HUFFVAL) pair:
    per-length (min_code, max_code, first_value_index) — the T.81 F.2.2.3
    DECODE procedure, O(code length) per symbol."""

    __slots__ = ("min_code", "max_code", "val_ptr", "values")

    def __init__(self, bits: list[int], values: bytes):
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1] == 0:
                self.max_code[ln] = -1
            else:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1


def _canonical_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder (same canonical order)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


# Encoder-side tables (custom, canonical — decoders read them from DHT so
# nothing depends on these specific shapes; the DC table spans lengths 2-7
# to exercise variable-length canonical decode, AC is flat 8-bit over all
# 162 baseline symbols).
_ENC_DC_BITS = [0, 2, 2, 2, 2, 2, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
# 162 baseline symbols + the 14 EOBn symbols (r=1..14, s=0) progressive
# scans use for end-of-band runs — 176 flat 8-bit codes, Kraft 176/256
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = bytes(
    [0x00]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [0xF0]
    + [(r << 4) for r in range(1, 15)]
)
_ENC_DC_CODES = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC_CODES = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


# ---------------------------------------------------------------------------
# Decoder


class _BitReader:
    """MSB-first bit reader over unstuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                # past-the-end pad with zeros (T.81 tolerates a truncated
                # final byte; real tails are 1-padded by encoders)
                self.acc = (self.acc << 8) & 0xFFFFFFFFFFFF
                self.nbits += 8
            else:
                self.acc = ((self.acc << 8) | self.data[self.pos]) & 0xFFFFFFFFFFFF
                self.pos += 1
                self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def decode_huff(self, tab: _HuffDecode) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            if code <= tab.max_code[ln]:
                return tab.values[tab.val_ptr[ln] + code - tab.min_code[ln]]
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(data: bytes) -> np.ndarray | None:
    """JPEG bytes → (height, width, 1|3) uint8 array, or None when the file
    is not a decodable baseline sequential JPEG (see module docstring for
    the refusal list)."""
    if not isinstance(data, (bytes, bytearray)):
        return None
    data = bytes(data)
    if not data.startswith(b"\xff\xd8"):
        return None
    try:
        return _decode(data)
    except (ValueError, IndexError, struct.error, ZeroDivisionError,
            OverflowError):
        return None


def _decode(data: bytes) -> np.ndarray | None:
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecode] = {}
    huff_ac: dict[int, _HuffDecode] = {}
    frame = None  # (height, width, comps) comps = [(cid, h, v, tq)]
    progressive = False
    dri = 0
    # (scan_comps, ss, se, ah, al, data, dri, dc-tables, ac-tables) —
    # tables are snapshotted per scan: DHT may be redefined between the
    # scans of a progressive file
    scans: list[tuple] = []

    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            return None
        while i < n and data[i] == 0xFF:
            i += 1  # fill bytes
        if i >= n:
            return None
        marker = data[i]
        i += 1
        if marker == 0xD9 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if i + 2 > n:
            return None
        (seg_len,) = struct.unpack(">H", data[i : i + 2])
        payload = data[i + 2 : i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq == 0:
                    vals = list(payload[p : p + 64])
                    p += 64
                elif pq == 1:
                    vals = list(
                        struct.unpack(f">{64}H", payload[p : p + 128])
                    )
                    p += 128
                else:
                    return None
                t = np.zeros(64, dtype=np.int64)
                for z, v in enumerate(vals):
                    t[ZIGZAG[z]] = v
                quant[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progr.
            progressive = marker == 0xC2
            prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp not in (1, 3) or not width or not height:
                return None
            # sanity cap: a ~100-byte file with forged SOF dims and a
            # trivial DHT would otherwise decode millions of MCUs from
            # the bit reader's zero padding — unbounded CPU/memory from
            # one corrupt crawl row (same executor-OOM class the warp
            # and label-map kernels cap)
            if width * height > 1 << 24:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (height, width, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                values = payload[p + 17 : p + 17 + nv]
                p += 17 + nv
                tab = _HuffDecode(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = tab
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if frame is None or ns < 1:
                return None
            scan_comps = []
            for c in range(ns):
                cs, tdta = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            # entropy-coded data runs to the next non-RST marker
            j = i
            while j + 1 < n:
                if data[j] == 0xFF and data[j + 1] not in (0x00,) and not (
                    0xD0 <= data[j + 1] <= 0xD7
                ):
                    break
                j += 1
            scans.append(
                (scan_comps, ss, se, ahal >> 4, ahal & 0xF, data[i:j],
                 dri, dict(huff_dc), dict(huff_ac))
            )
            i = j
        # APPn / COM / others: skipped via seg_len

    if frame is None or not scans:
        return None
    if progressive:
        return _decode_progressive(frame, scans, quant)
    if len(scans) != 1 or len(scans[0][0]) != len(frame[2]):
        return None  # baseline non-interleaved multi-scan: refused
    scan_comps, _, _, _, _, scan, scan_dri, hdc, hac = scans[0]
    return _decode_scan(frame, scan_comps, scan, quant, hdc, hac, scan_dri)


def _decode_scan(frame, scan_comps, scan, quant, huff_dc, huff_ac, dri):
    height, width, comps = frame
    if len(scan_comps) == 1:
        # T.81 A.2.2: a one-component scan is NON-interleaved — one data
        # unit per MCU over the real ceil(w/8) x ceil(h/8) block grid —
        # regardless of the sampling factors declared in the SOF (some
        # transcoders keep a 2x2 luma factor on grayscale). Normalizing
        # (h,v) to (1,1) makes the interleaved walk below degenerate to
        # exactly that raster walk (hmax=vmax=1, one block per MCU).
        comps = [(cid, 1, 1, tq) for cid, _h, _v, tq in comps]
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if any(hmax % h or vmax % v for _, h, v, _ in comps):
        return None  # non-integer upsample ratio: refused
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    segments = _split_segments(scan)

    order = []  # (cid, dc_tab, ac_tab, qtab, h, v)
    for cs, td, ta in scan_comps:
        if cs not in by_id or td not in huff_dc or ta not in huff_ac:
            return None
        h, v, tq = by_id[cs]
        if tq not in quant:
            return None
        order.append((cs, huff_dc[td], huff_ac[ta], quant[tq], h, v))

    blocks: dict[int, list[np.ndarray]] = {cs: [] for cs, *_ in order}
    preds: dict[int, int] = {cs: 0 for cs, *_ in order}
    seg_idx = 0
    reader = _BitReader(segments[0])
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                return None
            reader = _BitReader(segments[seg_idx])
            preds = {cs: 0 for cs, *_ in order}
        for cs, dct, act, qtab, h, v in order:
            for _ in range(h * v):
                coeffs = np.zeros(64, dtype=np.int64)
                s = reader.decode_huff(dct)
                if s > 15:  # DC category is 0..15 by spec; larger means
                    return None  # a corrupt table/stream — refuse
                diff = _extend(reader.read(s), s) if s else 0
                preds[cs] += diff
                coeffs[0] = preds[cs]
                k = 1
                while k < 64:
                    rs = reader.decode_huff(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        return None
                    coeffs[ZIGZAG[k]] = _extend(reader.read(s), s)
                    k += 1
                blocks[cs].append(coeffs.reshape(8, 8) * qtab)

    planes = []
    for cs, _, _, _, h, v in order:
        arr = idct_blocks(np.stack(blocks[cs]))
        cols, rows = mcus_x * h, mcus_y * v  # block grid
        # blocks were emitted MCU-major: permute into raster block order
        ry = np.arange(rows * cols) // cols
        cx = np.arange(rows * cols) % cols
        mcu_major = ((ry // v) * mcus_x + cx // h) * (h * v) + (
            ry % v
        ) * h + cx % h
        planes.append(
            _assemble_plane(
                arr[mcu_major], rows, cols, v, h, vmax, hmax, height, width
            )
        )

    return _planes_to_image(planes)


def _split_segments(scan: bytes) -> list[bytes]:
    """Split entropy-coded data at restart markers, unstuffing FF 00."""
    segments: list[bytes] = []
    cur = bytearray()
    j = 0
    while j < len(scan):
        b = scan[j]
        if b == 0xFF and j + 1 < len(scan):
            nxt = scan[j + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
        cur.append(b)
        j += 1
    segments.append(bytes(cur))
    return segments


def _assemble_plane(pix, rows, cols, v, h, vmax, hmax, height, width):
    """(rows*cols, 8, 8) RASTER-ordered sample blocks → full-resolution
    cropped component plane (tile, nearest-upsample, crop) — shared by
    the baseline and progressive paths."""
    plane = (
        pix.reshape(rows, cols, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(rows * 8, cols * 8)
    )
    plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
    return plane[:height, :width]


def _planes_to_image(planes: list[np.ndarray]) -> np.ndarray:
    if len(planes) == 1:
        return planes[0][:, :, None]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive (SOF2) decoding — T.81 G.2: coefficients accumulate across
# scans (spectral selection splits the zigzag band, successive
# approximation splits bit precision); dequantize + IDCT once at the end.


def _ac_first(reader, tab, coef, ss, se, al, eobrun):
    """First AC scan for one block: G.1.2.2 run-length with EOBn runs.
    ``coef`` is the block's 64 coefficients in SPECTRAL (zigzag) order."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(reader.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine(reader, tab, coef, ss, se, al, eobrun):
    """AC refinement scan for one block: G.1.2.3 — newly-nonzero
    coefficients arrive as ±1<<al, already-nonzero ones receive one
    correction bit each as the position pointer crosses them."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k):
        if reader.read(1) and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    # the end-of-band sweep (read one correction bit per remaining
    # nonzero coefficient) runs for the block that DECODED the EOBn as
    # well as for every further block the run covers — an EOB0 still
    # sweeps its own block
    sweep = eobrun > 0
    if sweep:
        eobrun -= 1
    else:
        while k <= se:
            rs = reader.decode_huff(tab)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read(r)
                    sweep = True
                    break
                # ZRL: skip 16 zero-history positions
            elif s == 1:
                val = p1 if reader.read(1) else m1
            else:
                raise ValueError("refinement size must be 0 or 1")
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if sweep:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
    return eobrun


def _decode_progressive(frame, scans, quant):
    height, width, comps = frame
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    if any(hmax % h or vmax % v for _, h, v, _ in comps):
        return None
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    # per component: padded MCU block grid (rows, cols) of spectral-order
    # coefficient vectors; real (non-padding) block extent for
    # non-interleaved scans
    grids: dict[int, np.ndarray] = {}
    real: dict[int, tuple[int, int]] = {}
    for cid, h, v, tq in comps:
        rows, cols = mcus_y * v, mcus_x * h
        grids[cid] = np.zeros((rows, cols, 64), dtype=np.int64)
        cw = -(-(width * h) // hmax)
        chh = -(-(height * v) // vmax)
        real[cid] = (-(-chh // 8), -(-cw // 8))  # (block rows, block cols)

    for scan_comps, ss, se, ah, al, data, dri, hdc, hac in scans:
        segments = _split_segments(data)
        seg_idx = 0
        reader = _BitReader(segments[0])
        ns = len(scan_comps)
        if ss == 0:  # DC scan (se must be 0); may be interleaved
            if se != 0:
                return None
            order = []
            for cs, td, ta in scan_comps:
                if cs not in by_id or (ah == 0 and td not in hdc):
                    return None
                order.append((cs, hdc.get(td), by_id[cs][0], by_id[cs][1]))
            preds = {cs: 0 for cs, *_ in order}
            if ns > 1:
                units = mcus_x * mcus_y
            else:
                br, bc = real[order[0][0]]
                units = br * bc
            for m in range(units):
                if dri and m and m % dri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        return None
                    reader = _BitReader(segments[seg_idx])
                    preds = {cs: 0 for cs, *_ in order}
                for cs, dct, h, v in order:
                    if ns > 1:
                        my, mx = divmod(m, mcus_x)
                        cells = [
                            (my * v + by, mx * h + bx)
                            for by in range(v)
                            for bx in range(h)
                        ]
                    else:
                        br, bc = real[cs]
                        cells = [divmod(m, bc)]
                    for ry, cx in cells:
                        coef = grids[cs][ry, cx]
                        if ah == 0:
                            s = reader.decode_huff(dct)
                            if s > 15:
                                return None  # corrupt DC category
                            diff = _extend(reader.read(s), s) if s else 0
                            preds[cs] += diff
                            coef[0] = preds[cs] << al
                        else:
                            if reader.read(1):
                                coef[0] |= 1 << al
        else:  # AC scan: always single-component, real blocks only
            if ns != 1 or se > 63 or ss > se:
                return None
            cs, td, ta = scan_comps[0]
            if cs not in by_id or ta not in hac:
                return None
            act = hac[ta]
            br, bc = real[cs]
            eobrun = 0
            for m in range(br * bc):
                if dri and m and m % dri == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        return None
                    reader = _BitReader(segments[seg_idx])
                    eobrun = 0
                ry, cx = divmod(m, bc)
                coef = grids[cs][ry, cx]
                if ah == 0:
                    eobrun = _ac_first(reader, act, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(reader, act, coef, ss, se, al, eobrun)

    planes = []
    for cid, h, v, tq in comps:
        if tq not in quant:
            return None
        qtab = quant[tq].reshape(-1)  # raster order
        grid = grids[cid]
        rows, cols = grid.shape[0], grid.shape[1]
        raster = np.zeros((rows * cols, 64), dtype=np.int64)
        flat = grid.reshape(rows * cols, 64)
        for zpos, ridx in enumerate(ZIGZAG):
            raster[:, ridx] = flat[:, zpos]
        pix = idct_blocks((raster * qtab).reshape(-1, 8, 8))
        planes.append(
            _assemble_plane(pix, rows, cols, v, h, vmax, hmax, height, width)
        )
    return _planes_to_image(planes)


# ---------------------------------------------------------------------------
# Encoder (golden-file synthesis)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad the tail (T.81 F.1.2.3)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality curve over the Annex K bases (both public)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUM, QUANT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _encode_block(bw: _BitWriter, q: np.ndarray, pred: int) -> int:
    """Quantized zigzag coefficients of ONE block → entropy-coded bits.
    Returns the new DC predictor."""
    dc = int(q[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = _ENC_DC_CODES[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if q[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _ENC_AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = _ENC_AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _ENC_AC_CODES[0x00]
        bw.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, bw_blocks: int, bh_blocks: int,
                  qtab: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to the block grid, FDCT, quantize (round half
    away from zero), zigzag → (n_blocks, 64) int64 in raster block order."""
    h, w = plane.shape
    padded = np.empty((bh_blocks * 8, bw_blocks * 8), dtype=np.uint8)
    padded[:h, :w] = plane
    if w < padded.shape[1]:
        padded[:h, w:] = plane[:, -1:]
    if h < padded.shape[0]:
        padded[h:, :] = padded[h - 1 : h, :]
    blocks = (
        padded.reshape(bh_blocks, 8, bw_blocks, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coeffs = fdct_blocks(blocks) / qtab.astype(np.float64)
    q = (np.sign(coeffs) * np.floor(np.abs(coeffs) + 0.5)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _prep_planes(arr: np.ndarray, subsampling: str):
    """Shared encoder front half: (h, w, 1|3)/(h, w) uint8 →
    (h, w, comps=[(cid, h, v, tq)], planes) with RGB→YCbCr conversion and
    box-mean chroma downsampling."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3) or not h or not w:
        raise ValueError("need (h, w, 1|3) uint8 with positive dims")
    if ch == 1:
        return h, w, [(1, 1, 1, 0)], [arr[:, :, 0]]
    sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    planes = [np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
              for p in (y, cb, cr)]
    if (sh, sv) != (1, 1):
        for idx in (1, 2):
            p = planes[idx].astype(np.float64)
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            pad = np.empty((ph, pw))
            pad[:h, :w] = p
            if w < pw:
                pad[:h, w:] = p[:, -1:]
            if h < ph:
                pad[h:, :] = pad[h - 1 : h, :]
            down = pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            planes[idx] = np.clip(np.floor(down + 0.5), 0, 255).astype(
                np.uint8
            )
    return h, w, comps, planes


def encode_jpeg_baseline(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    force_16bit_dqt: bool = False,
) -> bytes:
    """(h, w, 1|3) or (h, w) uint8 → real, decodable baseline JPEG bytes.

    ``subsampling``: '444' (no chroma subsampling), '422', or '420'
    (chroma box-mean downsampled). ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs. ``force_16bit_dqt`` writes Pq=1
    quantization tables (decoder-coverage knob)."""
    h, w, comps, planes = _prep_planes(arr, subsampling)
    ch = len(comps)
    qlum, qchrom = _quality_tables(quality)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qz: list[np.ndarray] = []
    for (cid, cch, cv, tq), plane in zip(comps, planes):
        qz.append(
            _plane_blocks(plane, mcus_x * cch, mcus_y * cv,
                          qlum if tq == 0 else qchrom)
        )

    bw = _BitWriter()
    preds = [0] * len(comps)
    chunks: list[bytes] = []
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            chunks.append(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (cid, cch, cv, tq) in enumerate(comps):
            bwb = mcus_x * cch
            for by in range(cv):
                for bx in range(cch):
                    bi = (my * cv + by) * bwb + mx * cch + bx
                    preds[ci] = _encode_block(bw, qz[ci][bi], preds[ci])
    bw.flush()
    chunks.append(bytes(bw.out))
    scan = b"".join(chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 72, 72, 0, 0))
    for tq, tab in ((0, qlum),) + (((1, qchrom),) if ch == 3 else ()):
        zz = tab.reshape(-1)[ZIGZAG]
        if force_16bit_dqt:
            out += seg(0xDB, bytes([0x10 | tq]) + struct.pack(">64H", *zz))
        else:
            out += seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, cch, cv, tq in comps:
        sof += bytes([cid, (cch << 4) | cv, tq])
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
    ) + (
        ((0, 1, _ENC_DC_BITS, _ENC_DC_VALS),
         (1, 1, _ENC_AC_BITS, _ENC_AC_VALS)) if ch == 3 else ()
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci, (cid, cch, cv, tq) in enumerate(comps):
        td_ta = 0 if ci == 0 or ch == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def synthesize_jpeg_real(
    width: int, height: int, rgb: tuple = (200, 80, 30), quality: int = 90
) -> bytes:
    """Solid-color REAL decodable baseline JPEG (counterpart of
    binary_ops.synthesize_png) — DC-only blocks, so synthesis and decode
    stay cheap enough for per-row gate fixtures."""
    arr = np.tile(
        np.array(rgb, dtype=np.uint8)[None, None, :], (height, width, 1)
    )
    return encode_jpeg_baseline(arr, quality=quality)


# ---------------------------------------------------------------------------
# Progressive encoder (golden-file synthesis) — the decoder's exact mirror:
# every scan emitter walks blocks with the same pointer-advance semantics as
# the corresponding decode procedure, so correction-bit ordering is
# consistent by construction. Supports 444/422/420: interleaved DC scans
# follow the padded MCU grid, AC scans each component's REAL block grid.


class _EobRun:
    """Accumulates an end-of-band run plus the correction bits the covered
    blocks owe (refinement scans); flushes as EOBn + ext bits + bits."""

    __slots__ = ("n", "bits")

    def __init__(self):
        self.n = 0
        self.bits: list[int] = []

    def flush(self, bw: _BitWriter) -> None:
        if not self.n:
            return
        r = self.n.bit_length() - 1
        code, ln = _ENC_AC_CODES[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(self.n - (1 << r), r)
        for b in self.bits:
            bw.write(b, 1)
        self.n = 0
        self.bits = []


def _emit_ac_first(bw, band, al, eob):
    """One block of a first AC scan (T.81 G.1.2.2 encoder side)."""
    vals = [int(v) for v in band]
    sent = [(abs(v) >> al) for v in vals]
    nz = [i for i, t in enumerate(sent) if t]
    if not nz:
        eob.n += 1
        if eob.n == 0x7FFF:
            eob.flush(bw)
        return
    eob.flush(bw)
    k = 0
    for i in nz:
        r = i - k
        while r > 15:
            code, ln = _ENC_AC_CODES[0xF0]
            bw.write(code, ln)
            r -= 16
        t = sent[i]
        s = t.bit_length()
        code, ln = _ENC_AC_CODES[(r << 4) | s]
        bw.write(code, ln)
        signed = t if vals[i] > 0 else -t
        bw.write(signed if signed > 0 else signed + (1 << s) - 1, s)
        k = i + 1
    if k <= len(vals) - 1:
        eob.n += 1
        if eob.n == 0x7FFF:
            eob.flush(bw)


def _emit_ac_refine(bw, band, al, eob):
    """One block of an AC refinement scan (G.1.2.3 encoder side) —
    mirrors ``_ac_refine``'s pointer advance exactly."""
    vals = [int(v) for v in band]
    hist = [(abs(v) >> (al + 1)) != 0 for v in vals]
    corr = [(abs(v) >> al) & 1 for v in vals]
    newly = [
        i for i, v in enumerate(vals)
        if not hist[i] and (abs(v) >> al) == 1
    ]
    if not newly:
        eob.n += 1
        eob.bits.extend(corr[i] for i in range(len(vals)) if hist[i])
        if eob.n == 0x7FFF:
            eob.flush(bw)
        return
    eob.flush(bw)
    k = 0

    def advance(run, stop):
        # mirror of the decoder's inner loop: cross positions, emitting a
        # correction bit at each nonzero-history one, consuming `run`
        # remain-zero positions; stop at the `stop` target position
        nonlocal k
        while k < len(vals):
            if hist[k]:
                bw.write(corr[k], 1)
            else:
                if run == 0 and k == stop:
                    break
                run -= 1
            k += 1

    for i in newly:
        # run counts remain-zero (zero-history, not newly) positions
        r = sum(
            1 for j in range(k, i) if not hist[j]
        )
        while r > 15:
            code, ln = _ENC_AC_CODES[0xF0]
            bw.write(code, ln)
            # decoder skips 16 zero-history positions after a ZRL,
            # reading corrections as it crosses nonzero-history ones
            skipped = 0
            while k < len(vals) and skipped < 16:
                if hist[k]:
                    bw.write(corr[k], 1)
                else:
                    skipped += 1
                k += 1
            r -= 16
        code, ln = _ENC_AC_CODES[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if vals[i] > 0 else 0, 1)
        advance(r, i)
        k = i + 1
    if k <= len(vals) - 1:
        eob.n += 1
        eob.bits.extend(corr[j] for j in range(k, len(vals)) if hist[j])
        if eob.n == 0x7FFF:
            eob.flush(bw)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(h, w, 1|3) or (h, w) uint8 → progressive (SOF2) JPEG with the
    classic scan script: DC first at Al=1 (interleaved), per-component
    spectral bands 1-5 / 6-63 at Al=1, then DC and AC refinements to
    Al=0. Supports 444/422/420 — interleaved DC scans follow the padded
    MCU grid while AC scans walk each component's REAL block grid, the
    same layout split the decoder implements."""
    h, w, comps, planes = _prep_planes(arr, subsampling)
    ch = len(comps)
    qlum, qchrom = _quality_tables(quality)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = []  # (qz, padded_cols, real_rows, real_cols) per component
    for (cid, cch, cv, tq), plane in zip(comps, planes):
        pcols, prows = mcus_x * cch, mcus_y * cv
        qz = _plane_blocks(plane, pcols, prows, qlum if tq == 0 else qchrom)
        cw = -(-(w * cch) // hmax)
        chh = -(-(h * cv) // vmax)
        grids.append((qz, pcols, -(-chh // 8), -(-cw // 8)))

    def sos(scomps, ss, se, ah, al, body: bytes) -> bytes:
        payload = bytes([len(scomps)])
        for cid, td_ta in scomps:
            payload += bytes([cid, td_ta])
        payload += bytes([ss, se, (ah << 4) | al])
        return (
            b"\xff\xda" + struct.pack(">H", len(payload) + 2) + payload + body
        )

    def dc_order():
        """(component, block-index) pairs in DC-scan order — the ONE
        definition both DC scans consume: interleaved MCU order for a
        multi-component frame (per MCU, each component's cv x cch blocks
        in the padded grid), plain real-grid raster for grayscale."""
        if ch > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (_, cch, cv, _) in enumerate(comps):
                        pcols = grids[ci][1]
                        for by in range(cv):
                            for bx in range(cch):
                                yield ci, (my * cv + by) * pcols + mx * cch + bx
        else:
            _, _, br, bc = grids[0]
            for m in range(br * bc):  # pcols == bc for grayscale
                yield 0, m

    scans: list[bytes] = []
    # 1. DC first, interleaved, Al=1 (arithmetic >> matches the decoder's
    # pred << Al | refinement-bit reconstruction for negatives)
    bw = _BitWriter()
    preds = [0] * ch
    for ci, bi in dc_order():
        d = int(grids[ci][0][bi][0]) >> 1
        diff = d - preds[ci]
        preds[ci] = d
        sdc = abs(diff).bit_length()
        code, ln = _ENC_DC_CODES[sdc]
        bw.write(code, ln)
        if sdc:
            bw.write(diff if diff > 0 else diff + (1 << sdc) - 1, sdc)
    bw.flush()
    scans.append(
        sos([(cid, 0) for cid, *_ in comps], 0, 0, 0, 1, bytes(bw.out))
    )
    # 2. per-component first AC bands at Al=1 (REAL block grid)
    for ss, se in ((1, 5), (6, 63)):
        for ci, (cid, *_rest) in enumerate(comps):
            qz, pcols, br, bc = grids[ci]
            bw = _BitWriter()
            eob = _EobRun()
            for m in range(br * bc):
                ry, cx = divmod(m, bc)
                _emit_ac_first(bw, qz[ry * pcols + cx][ss : se + 1], 1, eob)
            eob.flush(bw)
            bw.flush()
            scans.append(sos([(cid, 0x01 if ci else 0x00)], ss, se, 0, 1,
                             bytes(bw.out)))
    # 3. DC refinement to Al=0: one raw bit per block, same DC order
    bw = _BitWriter()
    for ci, bi in dc_order():
        bw.write(int(grids[ci][0][bi][0]) & 1, 1)
    bw.flush()
    scans.append(sos([(cid, 0) for cid, *_ in comps], 0, 0, 1, 0,
                     bytes(bw.out)))
    # 4. per-component AC refinements to Al=0
    for ss, se in ((1, 5), (6, 63)):
        for ci, (cid, *_rest) in enumerate(comps):
            qz, pcols, br, bc = grids[ci]
            bw = _BitWriter()
            eob = _EobRun()
            for m in range(br * bc):
                ry, cx = divmod(m, bc)
                _emit_ac_refine(bw, qz[ry * pcols + cx][ss : se + 1], 0, eob)
            eob.flush(bw)
            bw.flush()
            scans.append(sos([(cid, 0x01 if ci else 0x00)], ss, se, 1, 0,
                             bytes(bw.out)))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 72, 72, 0, 0))
    for tq, tab in ((0, qlum),) + (((1, qchrom),) if ch == 3 else ()):
        zz = tab.reshape(-1)[ZIGZAG]
        out += seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for cid, cch, cv, tq in comps:
        sof += bytes([cid, (cch << 4) | cv, tq])
    out += seg(0xC2, sof)
    for tc, th, bits, vals in (
        (0, 0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, 0, _ENC_AC_BITS, _ENC_AC_VALS),
    ) + (
        ((1, 1, _ENC_AC_BITS, _ENC_AC_VALS),) if ch == 3 else ()
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)
    for sc in scans:
        out += sc
    out += b"\xff\xd9"
    return bytes(out)
