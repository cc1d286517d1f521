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
- **Progressive JPEG** (T.81 Annex G, round 5): SOF2 multi-scan decode
  with BOTH progressive axes — spectral selection (banded AC scans
  with shared EOB runs) and successive approximation (point-transformed
  first scans + per-coefficient correction-bit refinement scans) —
  plus an encoder twin emitting a libjpeg-style scan script (DC first
  Al=1 → per-component AC first → DC refine → AC refine), so the
  refinement path is round-trip-witnessed, not just parsed.

- **Arithmetic-coded JPEG** (T.81 Annexes D + F + G, round 8): SOF9
  extended-sequential AND SOF10 progressive with the adaptive QM-coder
  — Table D.3 state machine, DAC conditioning, per-context statistics
  areas, AC signs on the fixed ~0.5 bin, progressive first/refinement
  scans with per-scan coder+statistics segments — encoder twins +
  decoders, pixel-identical to the corresponding Huffman twins on
  every fuzz case (same DCT chain and scan script, different entropy
  layer). The JPEG matrix is complete: all four {sequential,
  progressive} × {Huffman, arithmetic} combinations encode and decode,
  and the last codec ``NotImplementedError`` boundary is closed.

Baseline, progressive AND arithmetic scans honor RESTART INTERVALS
(DRI + RST0–7: byte alignment, marker consumption, DC-predictor reset,
EOB-run clear, and for arithmetic a full coder/statistics re-init —
the error-resilience feature camera firmware emits), each with an
encoder knob so all paths are round-trip-tested. Decoders return
``None`` (never raise) for the remaining unsupported variants —
hierarchical, lossless, 12-bit, sampling beyond 2×2 — so the
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

    def restart(self, m: int) -> None:
        """Byte-align (1-padding, stuffing applies) and emit RSTm."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (m & 7)])


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


def _jpeg_component_coeffs(px: np.ndarray, quant: int, subsampling: str):
    """Shared front half of every JPEG encoder in this module (baseline,
    progressive, arithmetic): color transform + optional 4:2:0 chroma
    downsample, edge-replication padding to the MCU lattice, 8×8 FDCT,
    uniform quantization. Returns ``(comps, qtab, coeffs, mcux, mcuy)``
    where ``comps`` is ``[(ch, cv), ...]`` sampling factors and
    ``coeffs[c]`` is the ``(by, bx, 8, 8)`` quantized block grid."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [(px.astype(np.float64), 1, 1)]
    elif subsampling == "420":
        ycc = _rgb_to_ycbcr(px)
        planes = [
            (ycc[..., 0], 2, 2),
            (_mean_downsample2(ycc[..., 1]), 1, 1),
            (_mean_downsample2(ycc[..., 2]), 1, 1),
        ]
    elif subsampling == "444":
        ycc = _rgb_to_ycbcr(px)
        planes = [(ycc[..., c], 1, 1) for c in range(3)]
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    qtab = np.full(64, quant, dtype=np.int64)
    hmax = max(ch for _, ch, _ in planes)
    vmax = max(cv for _, _, cv in planes)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    coeffs = []
    for plane, ch, cv in planes:
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
    comps = [(ch, cv) for _, ch, cv in planes]
    return comps, qtab, coeffs, mcux, mcuy


def jpeg_bytes_with_pixels(
    pixels,
    quant: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder for ``(h, w)`` grayscale or ``(h, w, 3)``
    RGB uint8 arrays: 4:4:4 or 4:2:0 (``subsampling="420"`` — luma at
    2×2 sampling, chroma box-filtered to half resolution, the layout
    real-world camera/tool JPEGs actually use), uniform ``quant``
    quantization (1 = near-lossless on luma), canonical Huffman tables
    embedded in DHT, MCU-interleaved entropy coding per T.81 A.2.3,
    optional restart markers every ``restart_interval`` MCUs (DRI +
    RST0–7 cycling, DC predictors reset — what camera firmware emits
    for error resilience). Decode twin: :func:`decode_jpeg_pixels`."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    comps, qtab, coeffs, mcux, mcuy = _jpeg_component_coeffs(
        px, quant, subsampling
    )
    ncomp = len(comps)

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one table, used by all components)
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes(int(qtab[i]) for i in range(64))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC class 0 id 0, AC class 1 id 0
    for cls, bits, syms in (
        (0x00, _DC_BITS, _DC_SYMBOLS),
        (0x10, _AC_BITS, _AC_SYMBOLS),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriterMSB()
    dc_prev = [0] * ncomp
    rst_m = 0
    n_mcus = mcuy * mcux
    for idx in range(n_mcus):
        my, mx = divmod(idx, mcux)
        for c, (ch, cv) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    zz = (
                        coeffs[c][my * cv + by, mx * ch + bx]
                        .reshape(-1)[_ZIGZAG]
                    )
                    dc_prev[c] = _emit_block(writer, zz, dc_prev[c])
        if (
            restart_interval
            and idx + 1 < n_mcus
            and (idx + 1) % restart_interval == 0
        ):
            writer.restart(rst_m)
            rst_m = (rst_m + 1) & 7
            dc_prev = [0] * ncomp
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# Progressive AC table: the baseline symbols plus EOB1..EOB14 (r<<4 with
# r<=14, trailed by r extension bits encoding the end-of-band run length
# — T.81 G.1.2.2). 176 symbols, all length 8 (≤255, so the all-ones code
# stays free as required).
_AC_SYMBOLS_PROG = sorted(
    {0xF0}
    | {r << 4 for r in range(15)}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_AC_BITS_PROG = [0] * 7 + [len(_AC_SYMBOLS_PROG)] + [0] * 8
_AC_ENC_PROG = _canonical_codes(_AC_BITS_PROG, _AC_SYMBOLS_PROG)


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: v / 2^al rounded TOWARD ZERO (T.81 G.1.2.2 —
    deliberately different from DC's arithmetic shift)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _emit_eobrun(writer, ac_enc, eobrun: int, pending: list[int]) -> None:
    """Write an EOBn symbol + run-length extension bits, then the
    correction bits that accumulated while the run was open."""
    if eobrun > 0:
        n = eobrun.bit_length() - 1
        code, ln = ac_enc[n << 4]
        writer.put(code, ln)
        if n:
            writer.put(eobrun - (1 << n), n)
    for bit in pending:
        writer.put(bit, 1)
    pending.clear()


def _encode_ac_first(writer, blocks, ss: int, se: int, al: int, ac_enc) -> None:
    """Progressive AC first scan (Ah=0): band run-length coding of the
    point-transformed coefficients with shared EOB runs."""
    eobrun = 0
    for zz in blocks:
        band = [_trunc_shift(int(zz[i]), al) for i in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v != 0]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(writer, ac_enc, eobrun, [])
                eobrun = 0
            continue
        if eobrun:
            _emit_eobrun(writer, ac_enc, eobrun, [])
            eobrun = 0
        run = 0
        for i in range(nz[-1] + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                writer.put(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_enc[(run << 4) | s]
            writer.put(code, ln)
            writer.put(_mag_bits(v, s), s)
            run = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(writer, ac_enc, eobrun, [])
                eobrun = 0
    if eobrun:
        _emit_eobrun(writer, ac_enc, eobrun, [])


def _encode_ac_refine(writer, blocks, ss: int, se: int, al: int, ac_enc) -> None:
    """Progressive AC refinement scan (Ah=Al+1 → Al): one correction bit
    per already-significant coefficient, (run, 1)+sign for the newly
    significant, runs counted over zero-HISTORY positions only, with
    correction bits buffered behind the next emitted symbol / EOB run
    (T.81 G.1.2.3)."""
    eobrun = 0
    pending: list[int] = []
    for zz in blocks:
        band = [int(zz[i]) for i in range(ss, se + 1)]
        hist = [_trunc_shift(v, al + 1) for v in band]  # pre-scan history
        newly = [i for i, v in enumerate(band) if hist[i] == 0 and v != 0]
        corr = lambda i: (abs(band[i]) >> al) & 1  # noqa: E731
        if not newly:
            eobrun += 1
            pending.extend(corr(i) for i in range(len(band)) if hist[i] != 0)
            if eobrun == 0x7FFF:
                _emit_eobrun(writer, ac_enc, eobrun, pending)
                eobrun = 0
            continue
        _emit_eobrun(writer, ac_enc, eobrun, pending)
        eobrun = 0
        # Emit by simulating the decoder's advance exactly: correction
        # bits for already-significant coefficients interleave
        # POSITIONALLY with the run consumption — a ZRL's trailing bits
        # are those of the significants passed within ITS 16-zero span,
        # not everything buffered so far.
        i = 0
        for p in newly:
            while True:
                zeros = sum(1 for j in range(i, p) if hist[j] == 0)
                if zeros <= 15:
                    break
                code, ln = ac_enc[0xF0]  # ZRL: next 16 zero-history slots
                writer.put(code, ln)
                cnt = 0
                j = i
                while True:
                    if hist[j] != 0:
                        writer.put(corr(j), 1)
                    else:
                        cnt += 1
                        if cnt == 16:
                            j += 1
                            break
                    j += 1
                i = j
            code, ln = ac_enc[(zeros << 4) | 1]
            writer.put(code, ln)
            writer.put(1 if band[p] > 0 else 0, 1)
            for j in range(i, p):
                if hist[j] != 0:
                    writer.put(corr(j), 1)
            i = p + 1
        if newly[-1] < len(band) - 1:
            # a placement at the band's last slot consumes the whole
            # band — the decoder exits without expecting an EOB
            eobrun += 1
            pending.extend(
                corr(j) for j in range(i, len(band)) if hist[j] != 0
            )
    _emit_eobrun(writer, ac_enc, eobrun, pending)


def jpeg_progressive_bytes_with_pixels(
    pixels, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """PROGRESSIVE JPEG encoder (T.81 Annex G) for grayscale / RGB uint8
    arrays, 4:4:4: SOF2 with a libjpeg-style scan script — interleaved
    DC first (Al=1), per-component AC 1–63 first (Al=1), DC refinement,
    per-component AC refinement — exercising spectral selection AND
    successive approximation, the two axes real progressive files use.
    ``restart_interval`` adds DRI + RST0–7 markers every that many MCUs
    (one block per component here — 4:4:4 non-interleaved AC scans use
    single-block MCUs per T.81 A.2.3): each boundary flushes the open
    EOB run and buffered correction bits, byte-aligns, and resets the
    DC predictors — exactly what the decoder's restart resync assumes.
    Decode twin: :func:`decode_jpeg_pixels` (same entry as baseline)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    planes = (
        [px.astype(np.float64)]
        if gray
        else [_rgb_to_ycbcr(px)[..., c] for c in range(3)]
    )
    ncomp = len(planes)
    qtab = np.full(64, quant, dtype=np.int64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    bh, bw = ph // 8, pw // 8
    coeffs = []  # per comp: (bh*bw, 64) zigzag-domain quantized ints
    for plane in planes:
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        fdct = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
        q = np.round(fdct / qtab.reshape(8, 8)).astype(np.int64)
        coeffs.append(q.reshape(bh * bw, 64)[:, _ZIGZAG])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes(int(qtab[i]) for i in range(64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for cls, bits, syms in (
        (0x00, _DC_BITS, _DC_SYMBOLS),
        (0x10, _AC_BITS_PROG, _AC_SYMBOLS_PROG),
    ):
        payload = bytes([cls]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    all_ids = list(range(1, ncomp + 1))
    ri = restart_interval
    # scan 1: interleaved DC first, Al=1 (DC point transform is an
    # arithmetic shift — T.81 G.1.2.1)
    out += sos(all_ids, 0, 0, 0, 1)
    writer = _BitWriterMSB()
    dc_prev = [0] * ncomp
    rst = 0
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            writer.restart(rst)
            rst = (rst + 1) & 7
            dc_prev = [0] * ncomp
        for c in range(ncomp):
            val = int(coeffs[c][bi][0]) >> 1
            diff = val - dc_prev[c]
            dc_prev[c] = val
            s = _category(diff)
            code, ln = _DC_ENC[s]
            writer.put(code, ln)
            if s:
                writer.put(_mag_bits(diff, s), s)
    out += writer.flush()
    # scans 2..: per-component AC first, Al=1. With restarts the block
    # stream chunks per interval — _encode_ac_first flushes its EOB run
    # at each chunk end, which is exactly the restart contract.
    for c in range(ncomp):
        out += sos([c + 1], 1, 63, 0, 1)
        writer = _BitWriterMSB()
        if ri:
            rst = 0
            for j in range(0, bh * bw, ri):
                if j:
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                _encode_ac_first(
                    writer, coeffs[c][j : j + ri], 1, 63, 1, _AC_ENC_PROG
                )
        else:
            _encode_ac_first(writer, coeffs[c], 1, 63, 1, _AC_ENC_PROG)
        out += writer.flush()
    # DC refinement: one raw bit per block per component, interleaved
    out += sos(all_ids, 0, 0, 1, 0)
    writer = _BitWriterMSB()
    rst = 0
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            writer.restart(rst)
            rst = (rst + 1) & 7
        for c in range(ncomp):
            writer.put(int(coeffs[c][bi][0]) & 1, 1)
    out += writer.flush()
    # per-component AC refinement, Al=0 (chunked like AC first — the
    # helper flushes eobrun + buffered correction bits per chunk)
    for c in range(ncomp):
        out += sos([c + 1], 1, 63, 1, 0)
        writer = _BitWriterMSB()
        if ri:
            rst = 0
            for j in range(0, bh * bw, ri):
                if j:
                    writer.restart(rst)
                    rst = (rst + 1) & 7
                _encode_ac_refine(
                    writer, coeffs[c][j : j + ri], 1, 63, 0, _AC_ENC_PROG
                )
        else:
            _encode_ac_refine(writer, coeffs[c], 1, 63, 0, _AC_ENC_PROG)
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

    def sync_restart(self) -> bool:
        """Drop padding bits, consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False


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


def _entropy_end(b: bytes, pos: int) -> int:
    """First position of a real marker (0xFF + non-stuffing, non-RST
    byte) at or after ``pos`` — the end of a scan's entropy data."""
    n = len(b)
    while pos + 1 < n:
        if (
            b[pos] == 0xFF
            and b[pos + 1] != 0x00
            and not (0xD0 <= b[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return n


def _prog_refine_one(coef, k: int, p1: int, reader) -> bool | None:
    """Read one correction bit for an already-significant coefficient
    (T.81 G.2): add ±2^Al when the bit says the dropped bit was set."""
    bit = reader.read(1)
    if bit is None:
        return None
    if bit and (abs(coef[k]) & p1) == 0:
        coef[k] += p1 if coef[k] > 0 else -p1
    return True


def _jpeg_progressive_scan(
    b: bytes,
    start: int,
    end: int,
    scomps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff,
    geom,
    coefs,
    dri: int = 0,
) -> bool:
    """Decode one progressive scan (T.81 G.2) into the zigzag-domain
    coefficient store. ``geom[cid] = (ch, cv, bw_mcu, bh_mcu, bw, bh)``
    (MCU-padded vs ceil block dims); ``coefs[cid]`` is a flat list of
    per-block 64-entry int lists with row stride ``bw_mcu``. With
    ``dri`` active, every ``dri`` MCUs (one block for non-interleaved
    scans) the reader byte-aligns onto an RSTn marker, DC predictors
    reset, and the EOB run clears — T.81 F.2.1.3.1 applied to the
    progressive paths."""
    reader = _BitReaderMSB(b[start:end])
    if ss == 0:  # ---- DC scan
        if se != 0:
            return False
        dc_pred = {cid: 0 for cid, _, _ in scomps}

        def dc_block(cid: int, dct: int, block) -> bool:
            if ah == 0:
                entry = huff.get((0, dct))
                if entry is None:
                    return False
                table, minlen = entry
                s = _huff_decode(reader, table, minlen)
                if s is None:
                    return False
                if s:
                    v = reader.read(s)
                    if v is None:
                        return False
                    dc_pred[cid] += _extend(v, s)
                block[0] = dc_pred[cid] << al
            else:
                bit = reader.read(1)
                if bit is None:
                    return False
                if bit:
                    block[0] |= 1 << al
            return True

        def dc_restart(unit: int) -> bool:
            if dri and unit and unit % dri == 0:
                if not reader.sync_restart():
                    return False
                for k in dc_pred:
                    dc_pred[k] = 0
            return True

        if len(scomps) == 1:  # non-interleaved: the comp's ceil grid
            cid, dct, _ = scomps[0]
            _, _, bw_mcu, _, bw, bh = geom[cid]
            unit = 0
            for row in range(bh):
                for col in range(bw):
                    if not dc_restart(unit):
                        return False
                    unit += 1
                    if not dc_block(cid, dct, coefs[cid][row * bw_mcu + col]):
                        return False
            return True
        # interleaved: shared MCU grid, sampling-ordered blocks
        any_cid = scomps[0][0]
        ch0, cv0, bw_mcu0, bh_mcu0, _, _ = geom[any_cid]
        mcux, mcuy = bw_mcu0 // ch0, bh_mcu0 // cv0
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if not dc_restart(unit):
                    return False
                unit += 1
                for cid, dct, _ in scomps:
                    ch, cv, bw_mcu, _, _, _ = geom[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            idx = (my * cv + by) * bw_mcu + mx * ch + bx
                            if not dc_block(cid, dct, coefs[cid][idx]):
                                return False
        return True
    # ---- AC scan: spec requires exactly one component, non-interleaved
    if len(scomps) != 1 or se > 63 or ss > se:
        return False
    cid, _, act = scomps[0]
    entry = huff.get((1, act))
    if entry is None:
        return False
    table, minlen = entry
    _, _, bw_mcu, _, bw, bh = geom[cid]
    eobrun = 0
    p1 = 1 << al
    unit = 0
    for row in range(bh):
        for col in range(bw):
            if dri and unit and unit % dri == 0:
                if not reader.sync_restart():
                    return False
                eobrun = 0
            unit += 1
            coef = coefs[cid][row * bw_mcu + col]
            if ah == 0:  # first scan for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _huff_decode(reader, table, minlen)
                    if sym is None:
                        return False
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = 1 << r
                        if r:
                            bits = reader.read(r)
                            if bits is None:
                                return False
                            eobrun += bits
                        eobrun -= 1  # covers this block
                        break
                    k += r
                    if k > se:
                        return False
                    v = reader.read(s)
                    if v is None:
                        return False
                    coef[k] = _extend(v, s) * p1
                    k += 1
            else:  # refinement
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _huff_decode(reader, table, minlen)
                        if sym is None:
                            return False
                        r, s = sym >> 4, sym & 15
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    bits = reader.read(r)
                                    if bits is None:
                                        return False
                                    eobrun += bits
                                break
                        elif s == 1:
                            bit = reader.read(1)
                            if bit is None:
                                return False
                            newval = p1 if bit else -p1
                        else:
                            return False
                        # advance: refine passed significants, count the
                        # run over zero-history slots, place newval
                        while k <= se:
                            if coef[k] != 0:
                                if _prog_refine_one(coef, k, p1, reader) is None:
                                    return False
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            coef[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if coef[k] != 0:
                            if _prog_refine_one(coef, k, p1, reader) is None:
                                return False
                        k += 1
                    eobrun -= 1
    return True


def decode_jpeg_pixels(payload: bytes | None) -> np.ndarray | None:
    """Safe wrapper over :func:`_decode_jpeg_unchecked`: any structural
    truncation that escapes the explicit guards (short segments, bad
    lengths) degrades to None rather than raising — the per-row contract
    the Arrow feature kernel relies on."""
    try:
        return _decode_jpeg_unchecked(payload)
    except (IndexError, KeyError, ValueError, struct.error):
        # KeyError: a corrupted scan header can name a component id
        # absent from the frame's geometry/coefficient maps
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
    actually uses — and PROGRESSIVE (SOF2) files via the multi-scan
    coefficient-domain path (:func:`_jpeg_progressive_scan`, T.81 G.2:
    spectral selection + successive approximation, EOB runs, DC/AC
    refinement), ARITHMETIC-coded files — sequential SOF9 AND
    progressive SOF10 — via the QM-coder path (Annex D coder + Annex
    F/G conditioning, DAC-parsed or default L=0/U=1/Kx=5), and restart
    intervals in ALL scan kinds (DRI/RSTn with DC reset, EOB-run
    clear, and full coder/statistics re-init for arithmetic); returns
    None for hierarchical / lossless / 16-bit-table variants."""
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
    progressive = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: table -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: table -> Kx
    prog_geom: dict[int, tuple[int, int, int, int, int, int]] = {}
    prog_coefs: dict[int, list[list[int]]] = {}
    prog_scans = 0
    dri = 0
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
        elif marker in (0xC0, 0xC2, 0xC9, 0xCA):
            # SOF0 baseline / SOF2 progressive / SOF9 sequential
            # arithmetic / SOF10 progressive arithmetic
            if seg[0] != 8:
                return None
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                ch, cv = samp >> 4, samp & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    return None  # sampling beyond 2x2: unsupported
                comps.append((cid, ch, cv, tq))
        elif marker == 0xCC:  # DAC: arithmetic conditioning values
            j = 0
            while j + 2 <= len(seg):
                tc, tb = seg[j] >> 4, seg[j] & 0x0F
                if tc == 0:
                    dc_cond[tb] = (seg[j + 1] & 0x0F, seg[j + 1] >> 4)
                else:
                    ac_cond[tb] = seg[j + 1]
                j += 2
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8):
            # remaining SOFs (hierarchical, lossless, 12-bit
            # extended): unsupported
            return None
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                tabs = seg[2 + 2 * c]
                scomps.append((cid, tabs >> 4, tabs & 0x0F))
            if not progressive:
                scan = scomps
                data_start = i + 2 + seglen
                break
            # progressive: decode this scan into the coefficient store
            # and continue the segment walk after its entropy data
            if h is None or not comps:
                return None
            if not prog_geom:
                hmax = max(ch for _, ch, _, _ in comps)
                vmax = max(cv for _, _, cv, _ in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                for cid, ch, cv, _ in comps:
                    cw = (w * ch + hmax - 1) // hmax
                    chh = (h * cv + vmax - 1) // vmax
                    bw_mcu, bh_mcu = mcux * ch, mcuy * cv
                    bw, bh = (cw + 7) // 8, (chh + 7) // 8
                    prog_geom[cid] = (ch, cv, bw_mcu, bh_mcu, bw, bh)
                    prog_coefs[cid] = [
                        [0] * 64 for _ in range(bw_mcu * bh_mcu)
                    ]
            if len(seg) < 4 + 2 * ns:
                return None
            ss_, se_ = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            start = i + 2 + seglen
            end = _entropy_end(b, start)
            if arith:
                ok = _jpeg_arith_progressive_scan(
                    b, start, end, scomps, ss_, se_, ahal >> 4,
                    ahal & 0x0F, dc_cond, ac_cond, prog_geom, prog_coefs,
                    dri,
                )
            else:
                ok = _jpeg_progressive_scan(
                    b, start, end, scomps, ss_, se_, ahal >> 4,
                    ahal & 0x0F, huff, prog_geom, prog_coefs, dri,
                )
            if not ok:
                return None
            prog_scans += 1
            i = end
            continue
        i += 2 + seglen
    if progressive:
        if prog_scans == 0 or not comps:
            return None
        hmax = max(ch for _, ch, _, _ in comps)
        vmax = max(cv for _, _, cv, _ in comps)
        planes_p: dict[int, np.ndarray] = {}
        for cid, ch, cv, tq in comps:
            qt = qtabs.get(tq)
            geom = prog_geom.get(cid)
            if qt is None or geom is None:
                return None
            _, _, bw_mcu, bh_mcu, _, _ = geom
            plane = np.zeros((bh_mcu * 8, bw_mcu * 8), dtype=np.float64)
            for row in range(bh_mcu):
                for col in range(bw_mcu):
                    zz = np.array(
                        prog_coefs[cid][row * bw_mcu + col], dtype=np.int64
                    )
                    block = np.zeros(64, dtype=np.float64)
                    block[_ZIGZAG] = zz * qt
                    block = block.reshape(8, 8)
                    plane[row * 8 : row * 8 + 8, col * 8 : col * 8 + 8] = (
                        _DCT.T @ block @ _DCT + 128.0
                    )
            planes_p[cid] = plane
        planes = [
            np.repeat(
                np.repeat(planes_p[cid], vmax // cv, axis=0),
                hmax // ch,
                axis=1,
            )[:h, :w]
            for cid, ch, cv, _ in comps
        ]
        if len(comps) == 1:
            return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        if len(comps) != 3:
            return None
        rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if data_start is None or h is None or not comps or len(scan) != len(comps):
        return None
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
    n_mcus = mcuy * mcux
    if arith:
        # SOF9 sequential arithmetic scan: same MCU walk and placement,
        # entropy decisions via the QM-coder (Annex F conditioning). A
        # restart boundary re-initializes the coder AND all statistics
        # areas, DC contexts and predictors (spec restart semantics).
        def _arith_seg_end(pos: int) -> int:
            # next marker INCLUDING RSTn (unlike _entropy_end, which
            # treats RSTs as in-scan — arithmetic restart intervals are
            # hard segment boundaries: the coder re-initializes)
            while pos + 1 < n:
                if b[pos] == 0xFF and b[pos + 1] != 0x00:
                    return pos
                pos += 1
            return n

        seg_start = data_start
        seg_end = _arith_seg_end(seg_start)
        dec = _QMDecoder(b, seg_start, seg_end)
        a_dc: dict[int, _ArithStats] = {}
        a_ac: dict[int, _ArithStats] = {}
        fixed = _fixed_stats()
        dc_ctx = [0] * ncomp
        for mcu_idx in range(n_mcus):
            if dri and mcu_idx and mcu_idx % dri == 0:
                if seg_end + 2 > n or b[seg_end] != 0xFF or not (
                    0xD0 <= b[seg_end + 1] <= 0xD7
                ):
                    return None
                seg_start = seg_end + 2
                seg_end = _arith_seg_end(seg_start)
                dec = _QMDecoder(b, seg_start, seg_end)
                a_dc.clear()
                a_ac.clear()
                fixed = _fixed_stats()
                dc_ctx = [0] * ncomp
                dc_prev = [0] * ncomp
            my, mx = divmod(mcu_idx, mcux)
            for c, (cid, dct, act) in enumerate(scan):
                qt = qtabs.get(comp_q.get(cid, 0))
                geom = comp_geom.get(cid)
                if qt is None or geom is None:
                    return None
                ch, cv = geom
                dstat = a_dc.setdefault(dct, _ArithStats(_DC_STAT_BINS))
                astat = a_ac.setdefault(act, _ArithStats(_AC_STAT_BINS))
                cl, cu = dc_cond.get(dct, (0, 1))
                kx = ac_cond.get(act, 5)
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        try:
                            diff, dc_ctx[c] = _arith_dc(
                                dec, dstat, dc_ctx[c], cl, cu, decode=True
                            )
                            dc_prev[c] += diff
                            zz[0] = dc_prev[c]
                            _arith_ac_decode(dec, astat, fixed, zz, kx)
                        except ValueError:
                            return None
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * qt
                        block = block.reshape(8, 8)
                        pix = _DCT.T @ block @ _DCT + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
        if seg_end >= n:
            # zero-feed past the segment end is LEGAL mid-stream (the
            # flush strips trailing zeros), so truncation can't be seen
            # from the decisions — but a well-formed file always closes
            # the final entropy segment with a real marker (EOI)
            return None
        n_mcus = 0  # skip the Huffman walk below
    else:
        # Huffman-only: the arith path never reads this (and the slice
        # would copy the whole remaining entropy stream for nothing)
        reader = _BitReaderMSB(b[data_start:])
    for mcu_idx in range(n_mcus):
        if dri and mcu_idx and mcu_idx % dri == 0:
            # byte-aligned RSTn between restart intervals; DC resets
            if not reader.sync_restart():
                return None
            dc_prev = [0] * ncomp
        my, mx = divmod(mcu_idx, mcux)
        if True:
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
# JPEG arithmetic entropy coding (ITU T.81 Annex D QM-coder + Annex F
# DCT-coefficient conditioning) — closes the last codec boundary: SOF9
# (extended sequential, arithmetic) now ENCODES and DECODES for real.
#
# The probability state machine is Table D.3 of the public T.81 spec
# (Qe value, Next_Index_MPS, Next_Index_LPS, Switch_MPS per state;
# index 113 is the non-adapting ~0.5 state used for AC signs). Encoder
# and decoder share this table and the exact interval/renormalization
# discipline below, so the in-repo round trip is bit-exact by
# construction; conformance to external arithmetic-JPEG streams rests
# on the table/flowchart transcription (no codec library exists in
# this environment to cross-check against — documented residual risk;
# re-evaluated round 9: libjpeg.so.62 is on disk but ships no CLI and
# its compress/decompress structs are version/build-specific, so a
# ctypes cross-check would be guessing field offsets — a known-good
# external arithmetic-JPEG byte fixture remains the right gate the
# day one can be imported).
# --------------------------------------------------------------------------

#: T.81 Table D.3: (Qe, NMPS, NLPS, SWITCH) per state; 113 = fixed bin.
_QM_TAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)

#: Annex F statistics-area sizes and layout anchors (Table F.4 / F.5).
_DC_STAT_BINS = 64
_AC_STAT_BINS = 256
_DC_X1 = 20        # DC magnitude-category chain X1..X15 start
_AC_X1_LOW = 189   # AC chain for k <= Kx
_AC_X1_HIGH = 217  # AC chain for k > Kx
_FIXED = 113       # non-adapting ~0.5 state (AC sign)


class _ArithStats:
    """One statistics area: per-cell (state index, MPS sense)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int) -> None:
        self.idx = bytearray(n)
        self.mps = bytearray(n)


class _QMEncoder:
    """T.81 Annex D arithmetic encoder core: 16-bit interval register A
    renormalized to keep A >= 0x8000, code register C with the output
    byte at bits 19..26, carry propagated into already-buffered bytes,
    and JPEG byte stuffing (0x00 after any 0xFF code byte) applied at
    flush so no marker is emulated inside entropy data."""

    __slots__ = ("a", "c", "ct", "raw")

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw: list[int] = []

    def encode(self, stats: _ArithStats, i: int, bit: int) -> None:
        sv = stats.idx[i]
        mps = stats.mps[i]
        qe, nmps, nlps, switch = _QM_TAB[sv]
        self.a -= qe
        if bit == mps:
            if self.a >= 0x8000:
                return  # no renorm -> no estimation update (D.1.5)
            if self.a < qe:  # conditional exchange: MPS takes upper part
                self.c += self.a
                self.a = qe
            stats.idx[i] = nmps
        else:
            if self.a >= qe:  # no exchange: LPS takes upper part
                self.c += self.a
                self.a = qe
            if switch:
                stats.mps[i] = 1 - mps
            stats.idx[i] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            self._carry()
            t &= 0xFF
        self.raw.append(t)
        self.c &= 0x7FFFF
        self.ct = 8

    def _carry(self) -> None:
        j = len(self.raw) - 1
        while j >= 0:
            self.raw[j] = (self.raw[j] + 1) & 0xFF
            if self.raw[j] != 0:
                break
            j -= 1

    def flush(self) -> bytes:
        """D.1.8 termination: pick the code value in the final interval
        with the most trailing zeros, emit the remaining bytes, strip
        trailing zero bytes (the decoder feeds zeros past the segment
        end), then byte-stuff."""
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c > 0x7FFFFFF:  # final carry out of bit 27
            self._carry()
            self.c &= 0x7FFFFFF
        self.raw.append((self.c >> 19) & 0xFF)
        self.raw.append((self.c >> 11) & 0xFF)
        while self.raw and self.raw[-1] == 0:
            self.raw.pop()
        out = bytearray()
        for byte in self.raw:
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


class _QMDecoder:
    """Annex D decoder mirroring :class:`_QMEncoder` exactly: the code
    stream is the MSB-first binary expansion of the encoder's C sum at
    16-bit alignment, so D holds the next 16 code bits minus the bases
    already subtracted. Byte stuffing is undone on input; hitting a
    real marker (0xFF followed by anything but 0x00) switches to
    zero-feed, the spec's end-of-segment convention."""

    __slots__ = ("data", "bp", "end", "d", "a", "bits", "nbits", "marker")

    def __init__(self, data: bytes, pos: int, end: int) -> None:
        self.data = data
        self.bp = pos
        self.end = end
        self.marker = False
        self.bits = 0
        self.nbits = 0
        self.d = (self._next_byte() << 8) | self._next_byte()
        self.a = 0x10000

    def _next_byte(self) -> int:
        if self.marker or self.bp >= self.end:
            self.marker = True
            return 0
        v = self.data[self.bp]
        if v == 0xFF:
            if self.bp + 1 < self.end and self.data[self.bp + 1] == 0x00:
                self.bp += 2  # stuffed zero: literal 0xFF data byte
                return 0xFF
            self.marker = True
            return 0
        self.bp += 1
        return v

    def _next_bit(self) -> int:
        if self.nbits == 0:
            self.bits = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def decode(self, stats: _ArithStats, i: int) -> int:
        sv = stats.idx[i]
        mps = stats.mps[i]
        qe, nmps, nlps, switch = _QM_TAB[sv]
        t = self.a - qe
        if self.d < t:
            self.a = t
            if t >= 0x8000:
                return mps  # encoder's early return: no state update
            bit = mps if t >= qe else 1 - mps
        else:
            self.d -= t
            self.a = qe
            bit = mps if t < qe else 1 - mps
        if bit == mps:
            stats.idx[i] = nmps
        else:
            if switch:
                stats.mps[i] = 1 - mps
            stats.idx[i] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.d = (self.d << 1) | self._next_bit()
        return bit


def _arith_dc(
    coder,
    stats: _ArithStats,
    ctx: int,
    L: int,
    U: int,
    diff: int | None = None,
    decode: bool = False,
):
    """DC difference coding per F.1.4.1 / F.2.4.1 (Table F.4 layout:
    S0 = context base, SS = S0+1, SP = S0+2, SN = S0+3, X1 = 20,
    magnitude bits at X-pointer+14). Returns ``(value, new_ctx)`` when
    decoding, ``new_ctx`` when encoding."""
    s0 = ctx
    if not decode:
        v = diff
        if v == 0:
            coder.encode(stats, s0, 0)
            return 0
        coder.encode(stats, s0, 1)
        if v > 0:
            coder.encode(stats, s0 + 1, 0)
            st = s0 + 2
            sign = 0
        else:
            coder.encode(stats, s0 + 1, 1)
            st = s0 + 3
            sign = 1
            v = -v
        m = 0
        v -= 1
        if v:
            coder.encode(stats, st, 1)
            m = 1
            st = _DC_X1
            v2 = v
            while v2 >> 1:
                coder.encode(stats, st, 1)
                m <<= 1
                st += 1
                v2 >>= 1
        coder.encode(stats, st, 0)
        new_ctx = _dc_ctx_after(m, sign, L, U)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            coder.encode(stats, st, 1 if (mm & v) else 0)
        return new_ctx
    # decode
    if coder.decode(stats, s0) == 0:
        return 0, 0
    sign = coder.decode(stats, s0 + 1)
    st = s0 + 2 + sign
    m = coder.decode(stats, st)
    if m:
        st = _DC_X1
        while coder.decode(stats, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith DC magnitude overflow")
            st += 1
    new_ctx = _dc_ctx_after(m, sign, L, U)
    v = m
    st += 14
    while m >> 1:
        m >>= 1
        if coder.decode(stats, st):
            v |= m
    v += 1
    return (-v if sign else v), new_ctx


def _dc_ctx_after(m: int, sign: int, L: int, U: int) -> int:
    """F.1.4.4.1.2: conditioning category for the NEXT DC decision."""
    if m < ((1 << L) >> 1):
        return 0
    if m > ((1 << U) >> 1):
        return 12 + 4 * sign
    return 4 + 4 * sign


def _trunc_al(v: int, al: int) -> int:
    """AC successive-approximation point transform: sign-preserving
    magnitude truncation by ``al`` bits (T.81 G.1.2.1 — DELIBERATELY
    different from DC's arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


def _arith_ac_encode(
    enc: _QMEncoder,
    stats: _ArithStats,
    fixed: _ArithStats,
    zz,
    K: int,
    ss: int = 1,
    se: int = 63,
    al: int = 0,
) -> None:
    """AC coefficients per F.1.4.2 (Table F.5 layout: per-k triplet
    (EOB, zero-run, mag>1) at 3*(k-1); X chains at 189/217 by k <= Kx;
    magnitude bits at X-pointer+14; sign via the fixed bin). With a
    band + ``al`` this is also the progressive AC FIRST scan (G.1.3.3)
    on point-transformed values — identical decision structure."""
    eob = se
    while eob >= ss and _trunc_al(int(zz[eob]), al) == 0:
        eob -= 1
    k = ss
    while k <= eob:
        st = 3 * (k - 1)
        enc.encode(stats, st, 0)  # not EOB
        while _trunc_al(int(zz[k]), al) == 0:
            enc.encode(stats, st + 1, 0)
            k += 1
            st += 3
        enc.encode(stats, st + 1, 1)
        v = _trunc_al(int(zz[k]), al)
        if v < 0:
            enc.encode(fixed, 0, 1)
            v = -v
        else:
            enc.encode(fixed, 0, 0)
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(stats, st, 1)
            m = 1
            if v >> 1:
                enc.encode(stats, st, 1)
                m = 2
                st = _AC_X1_LOW if k <= K else _AC_X1_HIGH
                v2 = v >> 1
                while v2 >> 1:
                    enc.encode(stats, st, 1)
                    m <<= 1
                    st += 1
                    v2 >>= 1
        enc.encode(stats, st, 0)
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(stats, st, 1 if (mm & v) else 0)
        k += 1
    if eob < se:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def _arith_ac_decode(
    dec: _QMDecoder,
    stats: _ArithStats,
    fixed: _ArithStats,
    zz,
    K: int,
    ss: int = 1,
    se: int = 63,
    al: int = 0,
) -> None:
    """Decode twin of :func:`_arith_ac_encode` (F.2.4.2 / G.2.3 AC
    first): decoded values land as ±v << al."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(stats, st):
            return  # EOB
        while dec.decode(stats, st + 1) == 0:
            k += 1
            st += 3
            if k > se:
                raise ValueError("arith AC run past block end")
        sign = dec.decode(fixed, 0)
        st += 2
        m = dec.decode(stats, st)
        if m:
            if dec.decode(stats, st):
                m = 2
                st = _AC_X1_LOW if k <= K else _AC_X1_HIGH
                while dec.decode(stats, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        while m >> 1:
            m >>= 1
            if dec.decode(stats, st):
                v |= m
        v += 1
        zz[k] = (-v if sign else v) << al
        k += 1


def jpeg_arith_bytes_with_pixels(
    pixels,
    quant: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """ARITHMETIC-coded sequential JPEG encoder (SOF9, T.81 Annexes D +
    F): same front half as the baseline encoder (shared
    :func:`_jpeg_component_coeffs`), but entropy coding is the adaptive
    QM-coder — DAC conditioning segment instead of DHT, default
    conditioning (L=0, U=1, Kx=5), MCU-interleaved, with optional
    restart intervals (each boundary flushes the coder, emits RSTn,
    and resets ALL statistics areas, DC contexts and predictors — the
    spec's restart semantics). Decode twin: :func:`decode_jpeg_pixels`
    via the SOF9 path. Round-trip-fuzzed in tests/test_codecs.py."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    comps, qtab, coeffs, mcux, mcuy = _jpeg_component_coeffs(
        px, quant, subsampling
    )
    ncomp = len(comps)
    dc_L, dc_U, ac_K = 0, 1, 5

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes(int(qtab[i]) for i in range(64))
    # SOF9: extended sequential DCT, arithmetic coding
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (ch, cv) in enumerate(comps):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc9" + struct.pack(">H", 2 + len(sof)) + sof
    # DAC: DC table 0 conditioning (U<<4|L), AC table 0 (Kx)
    dac = bytes([0x00, (dc_U << 4) | dc_L, 0x10, ac_K])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC cond table 0 / AC cond table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    def fresh():
        return (
            _QMEncoder(),
            _ArithStats(_DC_STAT_BINS),
            _ArithStats(_AC_STAT_BINS),
            _fixed_stats(),
        )

    enc, dc_stats, ac_stats, fixed = fresh()
    dc_prev = [0] * ncomp
    dc_ctx = [0] * ncomp
    rst_m = 0
    n_mcus = mcuy * mcux
    for idx in range(n_mcus):
        my, mx = divmod(idx, mcux)
        for c, (ch, cv) in enumerate(comps):
            for by in range(cv):
                for bx in range(ch):
                    zz = (
                        coeffs[c][my * cv + by, mx * ch + bx]
                        .reshape(-1)[_ZIGZAG]
                    )
                    dc = int(zz[0])
                    dc_ctx[c] = _arith_dc(
                        enc, dc_stats, dc_ctx[c], dc_L, dc_U,
                        diff=dc - dc_prev[c],
                    )
                    dc_prev[c] = dc
                    _arith_ac_encode(enc, ac_stats, fixed, zz, ac_K)
        if (
            restart_interval
            and idx + 1 < n_mcus
            and (idx + 1) % restart_interval == 0
        ):
            out += enc.flush()
            out += bytes([0xFF, 0xD0 + rst_m])
            rst_m = (rst_m + 1) & 7
            enc, dc_stats, ac_stats, fixed = fresh()
            dc_prev = [0] * ncomp
            dc_ctx = [0] * ncomp
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _fixed_stats() -> _ArithStats:
    s = _ArithStats(1)
    s.idx[0] = _FIXED
    return s


def _arith_ac_refine_encode(
    enc: _QMEncoder,
    stats: _ArithStats,
    fixed: _ArithStats,
    zz,
    ss: int,
    se: int,
    al: int,
) -> None:
    """Progressive AC REFINEMENT scan, encoder side (T.81 G.1.3.3,
    Ah = al+1 → Al = al): per coefficient, already-nonzero coefficients
    get one correction bit at st+2, newly-nonzero ones a decision at
    st+1 plus a fixed-bin sign; the EOB decision at st fires only for
    positions past the previous scan's end-of-block (kex)."""
    ah = al + 1
    ke = se  # EOB index at THIS precision
    while ke >= ss and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke  # previous-stage EOB index
    while kex >= ss and (abs(int(zz[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if k > ke:
                enc.encode(stats, st, 1)  # EOB
                return
            enc.encode(stats, st, 0)
        while True:
            full = int(zz[k])
            a = abs(full)
            if a >> ah:  # previously nonzero: one correction bit
                enc.encode(stats, st + 2, (a >> al) & 1)
                break
            if a >> al:  # newly nonzero at this precision
                enc.encode(stats, st + 1, 1)
                enc.encode(fixed, 0, 1 if full < 0 else 0)
                break
            enc.encode(stats, st + 1, 0)
            st += 3
            k += 1
        k += 1


def _arith_ac_refine_decode(
    dec: _QMDecoder,
    stats: _ArithStats,
    fixed: _ArithStats,
    zz,
    ss: int,
    se: int,
    al: int,
) -> None:
    """Decode twin of :func:`_arith_ac_refine_encode` (G.2.3): the
    stored coefficient state IS the previous-stage approximation, so
    kex is simply the highest nonzero stored position."""
    p1 = 1 << al
    kex = se
    while kex >= ss and int(zz[kex]) == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(stats, st):
            return  # EOB
        while True:
            cur = int(zz[k])
            if cur:
                if dec.decode(stats, st + 2):
                    zz[k] = cur + p1 if cur > 0 else cur - p1
                break
            if dec.decode(stats, st + 1):
                zz[k] = -p1 if dec.decode(fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arith AC refine past band end")
        k += 1


def _jpeg_arith_progressive_scan(
    b: bytes,
    start: int,
    end: int,
    scomps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    dc_cond,
    ac_cond,
    geom,
    coefs,
    dri: int = 0,
) -> bool:
    """Decode one ARITHMETIC progressive scan (SOF10, T.81 G.2 with
    Annex D entropy) into the zigzag-domain coefficient store — the
    QM twin of :func:`_jpeg_progressive_scan`, sharing its geometry
    and store layout. Each scan gets a fresh coder and statistics;
    a restart boundary re-initializes both plus the DC state."""

    class _Seg:
        """Per-scan segment state: coder + statistics, re-initialized
        at every restart marker (the arithmetic restart contract)."""

        def __init__(self, pos: int) -> None:
            self.pos = pos
            self.reset()

        def reset(self) -> None:
            n = len(b)
            p = self.pos
            while p + 1 < n:
                if b[p] == 0xFF and b[p + 1] != 0x00:
                    break
                p += 1
            else:
                p = n
            self.seg_end = p
            self.dec = _QMDecoder(b, self.pos, self.seg_end)
            self.dc_stats: dict[int, _ArithStats] = {}
            self.ac_stats: dict[int, _ArithStats] = {}
            self.fixed = _fixed_stats()
            self.dc_pred: dict[int, int] = {}
            self.dc_ctx: dict[int, int] = {}

        def restart(self) -> bool:
            if self.seg_end + 2 > len(b) or b[self.seg_end] != 0xFF or not (
                0xD0 <= b[self.seg_end + 1] <= 0xD7
            ):
                return False
            self.pos = self.seg_end + 2
            self.reset()
            return True

    seg = _Seg(start)

    def dc_block(cid: int, dct: int, block) -> bool:
        try:
            if ah == 0:
                dstat = seg.dc_stats.setdefault(
                    dct, _ArithStats(_DC_STAT_BINS)
                )
                cl, cu = dc_cond.get(dct, (0, 1))
                diff, ctx = _arith_dc(
                    seg.dec, dstat, seg.dc_ctx.get(cid, 0), cl, cu,
                    decode=True,
                )
                seg.dc_ctx[cid] = ctx
                seg.dc_pred[cid] = seg.dc_pred.get(cid, 0) + diff
                block[0] = seg.dc_pred[cid] << al
            else:
                # G.2.2: one fixed-bin bit — the next two's-complement bit
                if seg.dec.decode(seg.fixed, 0):
                    block[0] |= 1 << al
        except ValueError:
            return False
        return True

    if ss == 0:  # ---- DC scan
        if se != 0:
            return False
        if len(scomps) == 1:
            cid, dct, _ = scomps[0]
            _, _, bw_mcu, _, bw, bh = geom[cid]
            unit = 0
            for row in range(bh):
                for col in range(bw):
                    if dri and unit and unit % dri == 0:
                        if not seg.restart():
                            return False
                    unit += 1
                    if not dc_block(cid, dct, coefs[cid][row * bw_mcu + col]):
                        return False
            return seg.seg_end < len(b)
        any_cid = scomps[0][0]
        ch0, cv0, bw_mcu0, bh_mcu0, _, _ = geom[any_cid]
        mcux, mcuy = bw_mcu0 // ch0, bh_mcu0 // cv0
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and unit and unit % dri == 0:
                    if not seg.restart():
                        return False
                unit += 1
                for cid, dct, _ in scomps:
                    ch, cv, bw_mcu, _, _, _ = geom[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            idx = (my * cv + by) * bw_mcu + mx * ch + bx
                            if not dc_block(cid, dct, coefs[cid][idx]):
                                return False
        return seg.seg_end < len(b)
    # ---- AC scan: exactly one component, non-interleaved
    if len(scomps) != 1 or se > 63 or ss > se:
        return False
    cid, _, act = scomps[0]
    _, _, bw_mcu, _, bw, bh = geom[cid]
    unit = 0
    for row in range(bh):
        for col in range(bw):
            if dri and unit and unit % dri == 0:
                if not seg.restart():
                    return False
            unit += 1
            astat = seg.ac_stats.setdefault(act, _ArithStats(_AC_STAT_BINS))
            kx = ac_cond.get(act, 5)
            zz = coefs[cid][row * bw_mcu + col]
            try:
                if ah == 0:
                    _arith_ac_decode(
                        seg.dec, astat, seg.fixed, zz, kx, ss, se, al
                    )
                else:
                    _arith_ac_refine_decode(
                        seg.dec, astat, seg.fixed, zz, ss, se, al
                    )
            except ValueError:
                return False
    # zero-feed makes truncated decisions legal, so truncation is
    # detected structurally: the final segment must close with a marker
    return seg.seg_end < len(b)


def jpeg_arith_progressive_bytes_with_pixels(
    pixels, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """PROGRESSIVE ARITHMETIC JPEG encoder (SOF10 = T.81 Annex G scan
    scripting × Annex D QM entropy) for grayscale / RGB uint8 arrays,
    4:4:4 — completing the JPEG matrix: all four
    {sequential, progressive} × {Huffman, arithmetic} combinations now
    encode AND decode in this module. Same libjpeg-style scan script
    as the SOF2 twin (interleaved DC first Al=1 → per-component AC
    first Al=1 → DC refine → per-component AC refine); every scan is
    its own arithmetic segment (fresh coder + statistics, per spec),
    as is every restart interval. Decode twin:
    :func:`decode_jpeg_pixels` via the SOF10 path."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    planes = (
        [px.astype(np.float64)]
        if gray
        else [_rgb_to_ycbcr(px)[..., c] for c in range(3)]
    )
    ncomp = len(planes)
    qtab = np.full(64, quant, dtype=np.int64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    bh, bw = ph // 8, pw // 8
    coeffs = []
    for plane in planes:
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        fdct = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
        q = np.round(fdct / qtab.reshape(8, 8)).astype(np.int64)
        coeffs.append(q.reshape(bh * bw, 64)[:, _ZIGZAG])

    dc_L, dc_U, ac_K = 0, 1, 5
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00)
    out += bytes(int(qtab[i]) for i in range(64))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xca" + struct.pack(">H", 2 + len(sof)) + sof  # SOF10
    dac = bytes([0x00, (dc_U << 4) | dc_L, 0x10, ac_K])
    out += b"\xff\xcc" + struct.pack(">H", 2 + len(dac)) + dac
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    all_ids = list(range(1, ncomp + 1))
    ri = restart_interval

    class _Enc:
        """Per-scan encoder segment: coder + statistics, flushed and
        re-initialized at restarts (mirrors the decoder's _Seg)."""

        def __init__(self) -> None:
            self.reset()
            self.rst = 0
            self.data = bytearray()

        def reset(self) -> None:
            self.enc = _QMEncoder()
            self.dc_stats = _ArithStats(_DC_STAT_BINS)
            self.ac_stats = _ArithStats(_AC_STAT_BINS)
            self.fixed = _fixed_stats()
            self.dc_prev: dict[int, int] = {}
            self.dc_ctx: dict[int, int] = {}

        def restart(self) -> None:
            self.data += self.enc.flush()
            self.data += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) & 7
            self.reset()

        def finish(self) -> bytes:
            self.data += self.enc.flush()
            return bytes(self.data)

    # scan 1: interleaved DC first, Al=1 (arithmetic shift per G.1.2.1)
    e = _Enc()
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            e.restart()
        for c in range(ncomp):
            val = int(coeffs[c][bi][0]) >> 1
            diff = val - e.dc_prev.get(c, 0)
            e.dc_prev[c] = val
            e.dc_ctx[c] = _arith_dc(
                e.enc, e.dc_stats, e.dc_ctx.get(c, 0), dc_L, dc_U, diff=diff
            )
    out += sos(all_ids, 0, 0, 0, 1) + e.finish()
    # scans 2..: per-component AC first, Al=1
    for c in range(ncomp):
        e = _Enc()
        for bi in range(bh * bw):
            if ri and bi and bi % ri == 0:
                e.restart()
            _arith_ac_encode(
                e.enc, e.ac_stats, e.fixed, coeffs[c][bi], ac_K, 1, 63, 1
            )
        out += sos([c + 1], 1, 63, 0, 1) + e.finish()
    # DC refinement: one fixed-bin bit per block, interleaved
    e = _Enc()
    for bi in range(bh * bw):
        if ri and bi and bi % ri == 0:
            e.restart()
        for c in range(ncomp):
            e.enc.encode(e.fixed, 0, int(coeffs[c][bi][0]) & 1)
    out += sos(all_ids, 0, 0, 1, 0) + e.finish()
    # per-component AC refinement, Ah=1 -> Al=0
    for c in range(ncomp):
        e = _Enc()
        for bi in range(bh * bw):
            if ri and bi and bi % ri == 0:
                e.restart()
            _arith_ac_refine_encode(
                e.enc, e.ac_stats, e.fixed, coeffs[c][bi], 1, 63, 0
            )
        out += sos([c + 1], 1, 63, 1, 0) + e.finish()
    out += b"\xff\xd9"
    return bytes(out)



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
