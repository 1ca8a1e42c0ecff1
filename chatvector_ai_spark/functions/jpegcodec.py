"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT, Huffman).

Decoder: SOI → DQT/DHT/SOF0/SOF1/DRI/SOS marker walk, entropy decode of
the interleaved MCU stream (bit-unstuffing, restart markers, DC
prediction, AC run-length), dequantization, de-zigzag, separable float
IDCT, and level shift. Output is the 8-bit LUMA plane (gray = Y, the
standard grayscale reduction) cropped to the frame dimensions — chroma
blocks are entropy-decoded (the stream cannot be advanced otherwise) but
skip the IDCT. Progressive (SOF2), arithmetic-coded, 12-bit, and
lossless variants raise ``ValueError`` — the caller's dispatch degrades
those to the header-parse backend.

Encoder: single-component (grayscale) baseline writer — FDCT, uniform
quantization, the spec's example luminance Huffman tables (Annex K; any
valid tables would do since DHT rides in the file), byte stuffing. A
fixture writer like ``codecs.encode_png``: with ``quant=1`` the
quantization error is sub-LSB and round-trips land within ±2 gray
levels, which is what the tests pin.

Everything here is integer/float arithmetic over the standard library —
no libjpeg. Performance posture: this runs inside Arrow-batched
mapInPandas workers on payload bytes (multimodal stages); it is a
correctness/coverage backend, and a production deployment would register
a libjpeg-backed decoder behind the same per-row dispatch.

Reference parity note: the reference has no media decode at all
(backend/services/extraction_service.py:29-74 is PDF/TXT-only); this
module belongs to the brief's training-data-pipeline surface.
"""

from __future__ import annotations

import math
import struct

# natural-order index for each zigzag position, generated (not
# transcribed) so it cannot be mistyped
def _make_zigzag() -> list[int]:
    order = []
    r = c = 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _make_zigzag()

# orthonormal 8-point DCT-II basis: M[u][x] = c(u) cos((2x+1)uπ/16)
_DCT = [
    [
        (math.sqrt(1 / 8) if u == 0 else 0.5) * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]

# ITU T.81 Annex K example luminance Huffman tables (public spec
# constants). The encoder emits them in its DHT segment, so decode
# correctness depends only on their internal validity, which the
# canonical constructor below checks.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol map from the DHT BITS/HUFFVAL lists,
    validating that the counts describe a feasible prefix code."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("invalid Huffman table spec")
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if code >= (1 << length):
            raise ValueError("Huffman code overflow (invalid BITS)")
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with FF00
    unstuffing; hitting a real marker raises _MarkerHit."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _load(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._load()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, which: int) -> None:
        """Byte-align and consume the next RSTn marker (restart)."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1  # fill bytes
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or d[self.pos + 1] != 0xD0 + which
        ):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): s-bit magnitude to signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _idct_block(coef: list[float]) -> list[int]:
    """2-D separable orthonormal IDCT + level shift, clamped to [0,255]."""
    # rows: tmp[u][x] = Σ_v M[v][x_col]? do columns then rows explicitly
    tmp = [0.0] * 64
    for u in range(8):  # IDCT over columns: tmp[x][c] = Σ_u M[u][x] F[u][c]
        row = u * 8
        for c in range(8):
            f = coef[row + c]
            if f:
                col = _DCT[u]
                for x in range(8):
                    tmp[x * 8 + c] += col[x] * f
    out = [0] * 64
    for x in range(8):
        row = x * 8
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _DCT[v][y] * tmp[row + v]
            p = int(round(s)) + 128
            out[row + y] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def decode_jpeg_pixels(data: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, gray_pixels): full baseline decode; gray = the
    luma (Y) plane, replicated up to frame resolution if subsampled."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class, id)
    frame = None  # (w, h, comps) ; comps = [(cid, hs, vs, tq)]
    restart = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"bad marker byte at {i}")
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        if seglen < 2 or i + 2 + seglen > len(data):
            raise ValueError("bad segment length")
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq == 0:
                    qt[tq] = list(body[p : p + 64])
                    p += 64
                else:
                    qt[tq] = list(struct.unpack_from(">64H", body, p))
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            precision = body[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if w == 0 or h == 0 or ncomp == 0:
                raise ValueError("degenerate JPEG frame")
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, body[8 + 3 * c]))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("scan section with no frame header")
            return _decode_scan(data, i + 2 + seglen, body, frame, qt, huff, restart)
        i += 2 + seglen
    raise ValueError("JPEG contains no scan data")


def _decode_scan(data, pos, sos, frame, qt, huff, restart):
    w, h, comps = frame
    ns = sos[0]
    scan_tables = {}
    for c in range(ns):
        cid, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        scan_tables[cid] = (tt >> 4, tt & 15)
    order = []
    for cid, hs, vs, tq in comps:
        if cid not in scan_tables:
            raise ValueError("non-interleaved JPEG scans unsupported")
        if not (1 <= hs <= 2 and 1 <= vs <= 2):
            raise ValueError(f"unsupported sampling factors {hs}x{vs}")
        td, ta = scan_tables[cid]
        if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
            raise ValueError("JPEG scan references a missing table")
        order.append((cid, hs, vs, qt[tq], huff[(0, td)], huff[(1, ta)]))

    hmax = max(c[1] for c in order)
    vmax = max(c[2] for c in order)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)

    # luma plane buffer (component 0), at its own sampling resolution
    _, y_hs, y_vs, _, _, _ = order[0]
    yw, yh = mcx * y_hs * 8, mcy * y_vs * 8
    yplane = bytearray(yw * yh)

    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in order}
    rst_idx = 0
    n_mcu = mcx * mcy
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            r.align_and_expect_rst(rst_idx)
            rst_idx = (rst_idx + 1) % 8
            for k in pred:
                pred[k] = 0
        my, mx = divmod(m, mcx)
        for ci, (cid, hs, vs, q, dc_t, ac_t) in enumerate(order):
            for by in range(vs):
                for bx in range(hs):
                    try:
                        coef = _decode_block(r, dc_t, ac_t, q, pred, cid)
                    except _MarkerHit as e:
                        raise ValueError(
                            f"unexpected marker 0x{e.marker:02x} inside scan"
                        ) from e
                    if ci == 0:  # only the luma block is rendered
                        px = _idct_block(coef)
                        ox = (mx * hs + bx) * 8
                        oy = (my * vs + by) * 8
                        for yy in range(8):
                            dst = (oy + yy) * yw + ox
                            src = yy * 8
                            yplane[dst : dst + 8] = bytes(px[src : src + 8])
    # replicate luma up to frame resolution if it is subsampled
    fx, fy = hmax // y_hs, vmax // y_vs
    out = bytearray(w * h)
    for y in range(h):
        src_row = (y // fy) * yw
        dst_row = y * w
        if fx == 1:
            out[dst_row : dst_row + w] = yplane[src_row : src_row + w]
        else:
            for x in range(w):
                out[dst_row + x] = yplane[src_row + x // fx]
    return w, h, bytes(out)


def _decode_block(r, dc_t, ac_t, q, pred, cid):
    coef = [0.0] * 64
    s = _huff_decode(r, dc_t)
    if s > 11:
        raise ValueError("invalid DC magnitude category")
    diff = _extend(r.bits(s), s) if s else 0
    pred[cid] += diff
    coef[0] = pred[cid] * q[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_t)
        rr, ss = rs >> 4, rs & 15
        if ss == 0:
            if rr == 15:
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        coef[ZIGZAG[k]] = _extend(r.bits(ss), ss) * q[k]
        k += 1
    return coef


# ---------------------------------------------------------------------------
# Encoder — single-component grayscale baseline (fixture writer)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    inv = _canonical_codes(bits, vals)
    return {sym: (code, length) for (length, code), sym in inv.items()}


def _fdct_block(px: list[int]) -> list[float]:
    shifted = [v - 128 for v in px]
    tmp = [0.0] * 64
    for u in range(8):  # rows
        basis = _DCT[u]
        for y in range(8):
            s = 0.0
            for x in range(8):
                s += basis[x] * shifted[x * 8 + y]
            tmp[u * 8 + y] = s
    out = [0.0] * 64
    for u in range(8):
        row = u * 8
        for v in range(8):
            basis = _DCT[v]
            s = 0.0
            for y in range(8):
                s += basis[y] * tmp[row + y]
            out[row + v] = s
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit code) for a signed coefficient (F.1.2.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _emit_block(bw: _BitWriter, zz: list[int], pred: int, dc_codes, ac_codes) -> int:
    """Huffman-emit one quantized zigzag block; returns the new DC pred."""
    diff = zz[0] - pred
    s, code = _magnitude(diff)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(code, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        s, code = _magnitude(zz[k])
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(code, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        bw.put(c, ln)
    return zz[0]


def encode_jpeg(
    width: int,
    height: int,
    gray: bytes,
    quant: int = 1,
    chroma: int | None = None,
    restart: int = 0,
) -> bytes:
    """Baseline JPEG from a row-major 8-bit luma grid. ``quant`` is a
    uniform quantization step (1 = near-lossless); tables ride in the file
    so any baseline decoder reads it back. ``chroma=<0..255>`` emits a
    3-component 4:2:0 file (Y at 2×2 sampling, both chroma planes constant
    at that value) — the interleaved-MCU shape of real camera output.
    ``restart=N`` inserts a DRI segment and RSTn markers every N MCUs.
    Fixture writer, like ``codecs.encode_png``."""
    if len(gray) != width * height:
        raise ValueError(f"expected {width * height} bytes, got {len(gray)}")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    q = [quant] * 64
    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_VALS)

    def luma_zz(bx: int, by: int) -> list[int]:
        # edge blocks replicate the last row/column (standard practice)
        px = [0] * 64
        for yy in range(8):
            sy = min(by * 8 + yy, height - 1)
            for xx in range(8):
                sx = min(bx * 8 + xx, width - 1)
                px[yy * 8 + xx] = gray[sy * width + sx]
        coef = _fdct_block(px)
        return [int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)]

    bw = _BitWriter()
    rst_idx = 0

    def maybe_restart(m: int) -> None:
        nonlocal rst_idx
        if restart and m and m % restart == 0:
            bw.flush()
            bw.out.extend((0xFF, 0xD0 + rst_idx))
            rst_idx = (rst_idx + 1) % 8
            for k in pred:
                pred[k] = 0

    if chroma is None:
        pred = {1: 0}
        bx_n = (width + 7) // 8
        by_n = (height + 7) // 8
        for m in range(bx_n * by_n):
            maybe_restart(m)
            by, bx = divmod(m, bx_n)
            pred[1] = _emit_block(bw, luma_zz(bx, by), pred[1], dc_codes, ac_codes)
        ncomp, sof_comps, sos_comps = 1, bytes([1, 0x11, 0]), bytes([1, 0x00])
    else:
        # 4:2:0: MCU = 4 luma blocks (2×2) + 1 Cb + 1 Cr, chroma constant
        pred = {1: 0, 2: 0, 3: 0}
        czz = [0] * 64
        czz[0] = int(round(8 * (chroma - 128) / quant))
        mcx = (width + 15) // 16
        mcy = (height + 15) // 16
        for m in range(mcx * mcy):
            maybe_restart(m)
            my, mx = divmod(m, mcx)
            for by in range(2):
                for bx in range(2):
                    pred[1] = _emit_block(
                        bw, luma_zz(mx * 2 + bx, my * 2 + by), pred[1],
                        dc_codes, ac_codes,
                    )
            for cid in (2, 3):
                pred[cid] = _emit_block(bw, czz, pred[cid], dc_codes, ac_codes)
        ncomp = 3
        sof_comps = bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos_comps = bytes([1, 0x00, 2, 0x00, 3, 0x00])
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes(q))
    sof = seg(0xC0, bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
              + bytes([ncomp]) + sof_comps)
    dht = (
        seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    )
    dri = seg(0xDD, restart.to_bytes(2, "big")) if restart else b""
    sos = seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + bytes(bw.out) + b"\xff\xd9"
