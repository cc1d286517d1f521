"""Pure-stdlib/numpy image codecs: GIF (LZW) and baseline JPEG.

Closes the last env-stub in the multimodal surface (SURVEY.md §2.11):
the reference's pipeline treats uploaded media as opaque payloads, and
round-3 review flagged JPEG/GIF pixel decode as the remaining
``NotImplementedError`` boundary. Both formats' entropy coders are
public algorithms implementable without codec libraries:

- **GIF**: LZW with variable code width (GIF89a spec / Welch 1984).
  Lossless — the encode↔decode round trip is pixel-exact, including
  palette expansion, dictionary resets at 4096 codes, the KwKwK corner
  case, and Adam-style 4-pass interlacing on decode.
- **JPEG**: baseline sequential DCT (ITU T.81): 8×8 FDCT as an
  orthonormal matrix product, uniform quantization, zigzag, DC
  differential + AC run-length categories, canonical Huffman coding
  with the tables EMBEDDED in DHT segments (any spec-compliant decoder
  reads them from the file, so the encoder is free to use a canonical
  fixed-length table; Annex K's tables would only change the
  compression ratio, not correctness). Both 4:4:4 and 4:2:0 chroma
  subsampling are encoded and decoded (MCU-interleaved per T.81
  A.2.3; 2×2 box-filter down, nearest-neighbor up — 4:2:0 is what
  real camera/tool JPEGs use). With all-ones quantization the 4:4:4
  round trip is near-lossless (|error| ≤ ~4 from coefficient rounding;
  8-bit input keeps every DC diff in category ≤ 11 and every AC
  coefficient in category ≤ 10, so baseline's symbol range suffices);
  4:2:0 additionally loses only what subsampling discards — exact-ish
  on luma and on any image whose chroma is constant per 2×2 block.

Decoders return ``None`` (never raise) for unsupported variants —
progressive JPEG, restart intervals, sampling beyond 2×2 — so the
Arrow-batched feature kernel degrades gracefully per row.

These run inside ``mapInPandas`` batches (operators/multimodal.py), so
per-executor memory is bounded by Arrow batch size regardless of table
size; per-payload work is O(pixels).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# GIF — LZW
# --------------------------------------------------------------------------


class _BitPackerLSB:
    """LSB-first bit packing (GIF's LZW bit order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: clear/EOI codes, width grows after the code that
    fills the current width, dictionary reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    packer = _BitPackerLSB()

    def reset() -> tuple[dict[bytes, int], int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    packer.put(clear, width)
    prefix = b""
    for sym in indices.tolist():
        cand = prefix + bytes([sym])
        if cand in table:
            prefix = cand
            continue
        packer.put(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        # width grows when the NEXT code to assign no longer fits
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            packer.put(clear, width)
            table, next_code, width = reset()
        prefix = bytes([sym])
    if prefix:
        packer.put(table[prefix], width)
    packer.put(eoi, width)
    return packer.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> bytes | None:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    def reset_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = reset_table()
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # tolerate missing EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        if len(table) >= (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry


def gif_bytes_with_pixels(
    indices,
    palette,
    interlace: bool = False,
) -> bytes:
    """GIF89a encoder for an ``(h, w)`` uint8 index array + ``(n, 3)``
    palette. Lossless twin of :func:`decode_gif_pixels` — together they
    give a pixel-exact round-trip witness for tests."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    # global color table size: 2^(k+1) entries, k in 0..7; >256 entries
    # would silently overflow the 3-bit GCT-size field in the packed byte
    n_needed = max(2, int(idx.max()) + 1, len(pal))
    if n_needed > 256:
        raise ValueError(
            f"GIF palette limited to 256 entries, need {n_needed}"
        )
    k = max(0, (n_needed - 1).bit_length() - 1)
    n_entries = 1 << (k + 1)
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[: len(pal)] = pal[:n_entries]
    mcs = max(2, k + 1)  # LZW minimum code size
    rows = idx
    if interlace:
        order = _gif_interlace_order(h)
        rows = idx[order]
    body = _lzw_encode(rows.reshape(-1), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | k, 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(mcs)
    for i in range(0, len(body), 255):
        block = body[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _gif_interlace_order(h: int) -> list[int]:
    """Row order of GIF's 4-pass interlace (spec appendix E)."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def decode_gif_pixels(payload: bytes | None) -> np.ndarray | None:
    """REAL GIF pixel decode (first frame): parse the logical screen
    descriptor + color tables, skip extension blocks, LZW-decompress the
    image data (variable code width, dictionary resets, KwKwK), undo
    4-pass interlacing, and expand palette indices to ``(h, w, 3)``
    uint8 RGB. Returns None for malformed payloads."""
    if not payload or len(payload) < 13:
        return None
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(b):
            return None
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(b):
        intro = b[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            return None
        if intro == 0x21:  # extension: label + data sub-blocks
            pos += 1
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if intro != 0x2C:
            return None
        if pos + 9 > len(b):
            return None
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(b):
                return None
            lct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(
                -1, 3
            )
            pos += 3 * n
        if lct is None or pos >= len(b):
            return None
        mcs = b[pos]
        pos += 1
        data = bytearray()
        while pos < len(b) and b[pos] != 0:
            blen = b[pos]
            data += b[pos + 1 : pos + 1 + blen]
            pos += 1 + blen
        raw = _lzw_decode(bytes(data), mcs)
        if raw is None or len(raw) < w * h:
            return None
        idx = np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
            out = np.empty_like(idx)
            out[_gif_interlace_order(h)] = idx
            idx = out
        if int(idx.max()) >= len(lct):
            return None
        return lct[idx]
    return None


# --------------------------------------------------------------------------
# JPEG — baseline sequential DCT (T.81), 4:4:4 / grayscale
# --------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)  # fmt: skip


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    d = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    d[0] /= np.sqrt(2)
    return d


_DCT = _dct_matrix()

# Canonical Huffman tables with full baseline symbol coverage. DC:
# categories 0..11 at 4 bits (12 of 16 codes — the all-ones code stays
# unused, as T.81 requires). AC: EOB + ZRL + (run 0..15 × size 1..10)
# = 162 symbols at 8 bits (162 of 256). Both are embedded in DHT, so
# any decoder — including this module's — reads them from the file.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 codes of length 4
_AC_BITS = [0] * 7 + [162] + [0] * 8  # 162 codes of length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical (T.81 C.2) assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriterMSB:
    """MSB-first bit writing with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _mean_downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 box-filter downsample (the standard 4:2:0 chroma reduction);
    odd edges replicate so the mean never reads past the image."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
    ) / 4.0


def _emit_block(writer: _BitWriterMSB, zz: np.ndarray, dc_prev: int) -> int:
    """Entropy-code one zigzagged quantized block; returns the new DC
    predictor."""
    diff = int(zz[0]) - dc_prev
    size = _category(diff)
    code, length = _DC_ENC[size]
    writer.put(code, length)
    if size:
        writer.put(_mag_bits(diff, size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            code, length = _AC_ENC[0x00]  # EOB
            writer.put(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_ENC[0xF0]  # ZRL
            writer.put(code, length)
            run -= 16
        size = _category(v)
        code, length = _AC_ENC[(run << 4) | size]
        writer.put(code, length)
        writer.put(_mag_bits(v, size), size)
        run = 0
    return int(zz[0])


def jpeg_bytes_with_pixels(
    pixels, quant: int = 1, subsampling: str = "444"
) -> bytes:
    """Baseline JPEG encoder for ``(h, w)`` grayscale or ``(h, w, 3)``
    RGB uint8 arrays: 4:4:4 or 4:2:0 (``subsampling="420"`` — luma at
    2×2 sampling, chroma box-filtered to half resolution, the layout
    real-world camera/tool JPEGs actually use), uniform ``quant``
    quantization (1 = near-lossless on luma), canonical Huffman tables
    embedded in DHT, MCU-interleaved entropy coding per T.81 A.2.3.
    Decode twin: :func:`decode_jpeg_pixels`."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [(px.astype(np.float64), 1, 1)]
    elif subsampling == "420":
        ycc = _rgb_to_ycbcr(px)
        comps = [
            (ycc[..., 0], 2, 2),
            (_mean_downsample2(ycc[..., 1]), 1, 1),
            (_mean_downsample2(ycc[..., 2]), 1, 1),
        ]
    elif subsampling == "444":
        ycc = _rgb_to_ycbcr(px)
        comps = [(ycc[..., c], 1, 1) for c in range(3)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ncomp = len(comps)
    qtab = np.full(64, quant, dtype=np.int64)
    hmax = max(ch for _, ch, _ in comps)
    vmax = max(cv for _, _, cv in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one table, used by all components)
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes(int(qtab[i]) for i in range(64))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_, ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    for cls, bits, syms in (
        (0x00, _DC_BITS, _DC_SYMBOLS),
        (0x10, _AC_BITS, _AC_SYMBOLS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # per-component quantized block grids on the shared MCU lattice
    # (planes pad to their own block multiple by edge replication)
    coeffs = []
    for plane, ch, cv in comps:
        ph, pw = mcuy * 8 * cv, mcux * 8 * ch
        p = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        ) - 128.0
        blocks = (
            p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        )  # (by, bx, 8, 8)
        fdct = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
        coeffs.append(np.round(fdct / qtab.reshape(8, 8)).astype(np.int64))

    writer = _BitWriterMSB()
    dc_prev = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for c, (_, ch, cv) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        zz = (
                            coeffs[c][my * cv + by, mx * ch + bx]
                            .reshape(-1)[_ZIGZAG]
                        )
                        dc_prev[c] = _emit_block(writer, zz, dc_prev[c])
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReaderMSB:
    """MSB-first bit reading with 0xFF-stuffing removal."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    return None
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    return None  # marker inside entropy data
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= width
        val = (self.acc >> self.nbits) & ((1 << width) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val


def _build_decode_table(
    bits: list[int], symbols: list[int]
) -> tuple[dict[tuple[int, int], int], int]:
    """((length, code) -> symbol, min code length). The min length lets
    the decoder read its first chunk of bits in one call instead of
    bit-by-bit — the entropy-decode hot path."""
    enc = _canonical_codes(bits, symbols)
    table = {(length, code): sym for sym, (code, length) in enc.items()}
    minlen = min((length for _, (_, length) in enc.items()), default=1)
    return table, minlen


def _huff_decode(
    reader: _BitReaderMSB, table: dict[tuple[int, int], int], minlen: int
) -> int | None:
    code = reader.read(minlen)
    if code is None:
        return None
    sym = table.get((minlen, code))
    if sym is not None:
        return sym
    for length in range(minlen + 1, 17):
        bit = reader.read(1)
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg_pixels(payload: bytes | None) -> np.ndarray | None:
    """Safe wrapper over :func:`_decode_jpeg_unchecked`: any structural
    truncation that escapes the explicit guards (short segments, bad
    lengths) degrades to None rather than raising — the per-row contract
    the Arrow feature kernel relies on."""
    try:
        return _decode_jpeg_unchecked(payload)
    except (IndexError, ValueError, struct.error):
        return None


def _decode_jpeg_unchecked(payload: bytes | None) -> np.ndarray | None:
    """REAL baseline-JPEG pixel decode: segment walk (DQT/DHT/SOF0/SOS),
    canonical-Huffman entropy decode with byte-unstuffing, DC prediction,
    dezigzag, dequantization, 8×8 IDCT, MCU-interleaved component
    placement with per-component sampling factors up to 2×2 (4:4:4,
    4:2:0, 4:2:2/4:4:0 — chroma upsampled by nearest-neighbor
    replication), level shift, and YCbCr→RGB for 3-component scans.
    Covers what :func:`jpeg_bytes_with_pixels` emits in both its 4:4:4
    and 4:2:0 modes — 4:2:0 being the layout real camera/tool output
    actually uses; returns None for progressive/restart/16-bit-table
    variants."""
    if not payload or len(payload) < 4:
        return None
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (id, ch, cv, qtab)
    scan: list[tuple[int, int, int]] = []  # (id, dc_table, ac_table)
    i, n = 2, len(b)
    data_start = None
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: not baseline
                qtabs[tq] = np.frombuffer(
                    seg[j + 1 : j + 65], dtype=np.uint8
                ).astype(np.int64)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nsym = sum(bits)
                syms = list(seg[j + 17 : j + 17 + nsym])
                huff[(cls, tid)] = _build_decode_table(bits, syms)
                j += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            if seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                ch, cv = samp >> 4, samp & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    return None  # sampling beyond 2x2: unsupported
                comps.append((cid, ch, cv, tq))
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive / other SOF: unsupported
        elif marker == 0xDD:  # DRI
            if int.from_bytes(seg[:2], "big") != 0:
                return None  # restart intervals: unsupported
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tabs = seg[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            data_start = i + 2 + seglen
            break
        i += 2 + seglen
    if data_start is None or h is None or not comps or len(scan) != len(comps):
        return None
    reader = _BitReaderMSB(b[data_start:])
    ncomp = len(comps)
    if ncomp == 1:
        # single-component scans are non-interleaved: one block per MCU
        # regardless of the declared sampling factors (T.81 A.2.2)
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_geom = {cid: (ch, cv) for cid, ch, cv, _ in comps}
    comp_q = {cid: tq for cid, _, _, tq in comps}
    planes = {
        cid: np.zeros((mcuy * 8 * cv, mcux * 8 * ch), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    dc_prev = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for c, (cid, dct, act) in enumerate(scan):
                dc_entry = huff.get((0, dct))
                ac_entry = huff.get((1, act))
                qt = qtabs.get(comp_q.get(cid, 0))
                geom = comp_geom.get(cid)
                if dc_entry is None or ac_entry is None or qt is None or geom is None:
                    return None
                ch, cv = geom
                dc_table, dc_min = dc_entry
                ac_table, ac_min = ac_entry
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dc_table, dc_min)
                        if size is None:
                            return None
                        if size:
                            v = reader.read(size)
                            if v is None:
                                return None
                            dc_prev[c] += _extend(v, size)
                        zz[0] = dc_prev[c]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_table, ac_min)
                            if sym is None:
                                return None
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k >= 64 or size == 0:
                                return None
                            v = reader.read(size)
                            if v is None:
                                return None
                            zz[k] = _extend(v, size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * qt
                        block = block.reshape(8, 8)
                        pix = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample subsampled components to full resolution (nearest), crop
    planes = [
        np.repeat(
            np.repeat(planes[cid], vmax // cv, axis=0), hmax // ch, axis=1
        )[:h, :w]
        for cid, ch, cv, _ in comps
    ]
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if ncomp != 3:
        return None
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# BMP — uncompressed 24-bit (no entropy coding at all)
# --------------------------------------------------------------------------


def bmp_bytes_with_pixels(pixels) -> bytes:
    """Uncompressed 24-bit BI_RGB bottom-up BMP for an ``(h, w, 3)``
    RGB uint8 array."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(body), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp_pixels(payload: bytes | None) -> np.ndarray | None:
    """Uncompressed 24-bit BMP decode (BI_RGB, bottom-up or top-down)."""
    if not payload or len(payload) < 54:
        return None
    b = bytes(payload)
    if b[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", b[10:14])[0]
    hdr_size = struct.unpack("<I", b[14:18])[0]
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack("<ii", b[18:26])
    planes, bpp = struct.unpack("<HH", b[26:30])
    compression = struct.unpack("<I", b[30:34])[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0:
        return None
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    if data_off + row_bytes * h > len(b):
        return None
    rows = np.frombuffer(
        b[data_off : data_off + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        px = px[::-1]
    return np.ascontiguousarray(px)
