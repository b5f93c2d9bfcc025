"""Baseline JPEG codec — pure numpy, from the public JPEG spec
(ITU-T T.81 / ISO 10918-1: baseline sequential DCT, Huffman entropy
coding, Annex K standard tables).

Like the PNG codec, this is a REAL from-scratch implementation, not a
shim: 8×8 matrix DCT/IDCT, zigzag, DC-differential + run-length AC
Huffman coding with byte stuffing, JFIF marker structure. Scope:
- encode: grayscale (1 component) or RGB (YCbCr 4:4:4), quality-scaled
  Annex K quantization tables.
- decode: baseline 8-bit Huffman, 1 or 3 components, 4:4:4 and 4:2:0
  chroma subsampling, restart markers.
Progressive/arithmetic/12-bit streams raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (T.81 Figure A.6) ---
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZZ = np.argsort(_ZZ)

# --- Annex K quantization tables ---
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# --- Annex K Huffman tables: (bits[1..16], values) ---
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
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
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits, vals):
    """(value → (code, length)) canonical Huffman assignment (T.81
    Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DCT = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_component(
    w: _BitWriter, blocks: np.ndarray, q: np.ndarray, dc_tab, ac_tab, pred: int
) -> int:
    for blk in blocks:
        coef = _DCT @ blk @ _DCT.T
        qc = np.round(coef / q).astype(np.int64).ravel()[_ZZ]
        dc = int(qc[0])
        size, bits = _magnitude(dc - pred)
        c, ln = dc_tab[size]
        w.write(c, ln)
        if size:
            w.write(bits, size)
        pred = dc
        run = 0
        for v in qc[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_tab[0xF0]
                w.write(c, ln)
                run -= 16
            size, bits = _magnitude(v)
            c, ln = ac_tab[(run << 4) | size]
            w.write(c, ln)
            w.write(bits, size)
            run = 0
        if run:
            c, ln = ac_tab[0x00]  # EOB
            w.write(c, ln)
    return pred


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.empty((H, W), dtype=np.float64)
    pad[:h, :w] = plane
    pad[h:, :w] = plane[-1:, :]
    pad[:, w:] = pad[:, w - 1 : w]
    return (
        pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _dht(cls: int, tid: int, bits, vals) -> bytes:
    body = bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt(tid: int, q: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(v) for v in q.ravel()[_ZZ])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes
    (Annex K tables scaled by the libjpeg quality curve). subsample=True
    emits 4:2:0 chroma (2×2-averaged Cb/Cr, 16×16 MCUs)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255).reshape(8, 8)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255).reshape(8, 8)
    dc_l = _huff_codes(_DC_L_BITS, _DC_L_VALS)
    ac_l = _huff_codes(_AC_L_BITS, _AC_L_VALS)
    dc_c = _huff_codes(_DC_C_BITS, _DC_C_VALS)
    ac_c = _huff_codes(_AC_C_BITS, _AC_C_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt(0, ql)
    ncomp = 1 if gray else 3
    if not gray:
        out += _dqt(1, qc)
    sub = subsample and not gray
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        samp = (0x22 if sub else 0x11) if ci == 0 else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_L_BITS, _DC_L_VALS)
    out += _dht(1, 0, _AC_L_BITS, _AC_L_VALS)
    if not gray:
        out += _dht(0, 1, _DC_C_BITS, _DC_C_VALS)
        out += _dht(1, 1, _AC_C_BITS, _AC_C_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qs, dcs, acs = [ql], [dc_l], [ac_l]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        qs, dcs, acs = [ql, qc, qc], [dc_l, dc_c, dc_c], [ac_l, ac_c, ac_c]

    wtr = _BitWriter()
    preds = [0] * ncomp
    if sub:
        # 4:2:0: chroma 2×2-averaged; MCU = 4 Y blocks + 1 Cb + 1 Cr
        y, cb, cr = planes
        H2 = (h + 1) // 2 * 2
        W2 = (w + 1) // 2 * 2
        def half(p):
            pad = np.empty((H2, W2))
            pad[:h, :w] = p
            pad[h:, :w] = p[-1:, :]
            pad[:, w:] = pad[:, w - 1 : w]
            return (
                pad.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            )
        cplanes = [y, half(cb), half(cr)]
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        yb = _blocks_of(cplanes[0])
        ynbx = (w + 7) // 8
        # pad Y block grid to an even number of blocks per axis
        ynbx_p = mcux * 2
        ynby_p = mcuy * 2
        ygrid = np.zeros((ynby_p, ynbx_p, 8, 8))
        ynby = (h + 7) // 8
        ygrid[:ynby, :ynbx] = yb.reshape(ynby, ynbx, 8, 8)
        if ynbx < ynbx_p:
            ygrid[:, ynbx:] = ygrid[:, ynbx - 1 : ynbx]
        if ynby < ynby_p:
            ygrid[ynby:, :] = ygrid[ynby - 1 : ynby, :]
        cbb = _blocks_of(cplanes[1]).reshape(mcuy, mcux, 8, 8)
        crb = _blocks_of(cplanes[2]).reshape(mcuy, mcux, 8, 8)
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_component(
                            wtr,
                            ygrid[my * 2 + by, mx * 2 + bx][None],
                            qs[0], dcs[0], acs[0], preds[0],
                        )
                preds[1] = _encode_component(
                    wtr, cbb[my, mx][None], qs[1], dcs[1], acs[1], preds[1]
                )
                preds[2] = _encode_component(
                    wtr, crb[my, mx][None], qs[2], dcs[2], acs[2], preds[2]
                )
    else:
        nbx = (w + 7) // 8
        nby = (h + 7) // 8
        comp_blocks = [_blocks_of(p) for p in planes]
        # interleaved MCU order (4:4:4: one block per component per MCU)
        for m in range(nbx * nby):
            for ci in range(ncomp):
                preds[ci] = _encode_component(
                    wtr, comp_blocks[ci][m : m + 1], qs[ci], dcs[ci],
                    acs[ci], preds[ci],
                )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                elif 0xD0 <= nxt <= 0xD7:
                    self.pos += 1  # restart marker: reset bit state
                    self.acc = 0
                    self.nbits = 0
                    continue
                else:
                    self.pos -= 1
                    b = 0  # padding at segment end
                    self.acc = (self.acc << 8) | b
                    self.nbits += 8
                    return
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            self.acc <<= n - self.nbits
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF → (h, w) or (h, w, 3) uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = []  # (cid, hsamp, vsamp, qid)
    scan_sel = []  # (comp index, dc table, ac table)
    h = w = None
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:
            off = 0
            while off < len(body):
                pq, tid = body[off] >> 4, body[off] & 15
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64)
                tbl[_ZZ] = np.frombuffer(body, np.uint8, 64, off + 1)
                qt[tid] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 15
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                # (code, length) → value map for the reader
                fwd = _huff_codes(bits, vals)
                rev = {(c, ln): v for v, (c, ln) in fwd.items()}
                (huff_dc if cls == 0 else huff_ac)[tid] = rev
                off += 17 + n
        elif marker == 0xC0:
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = [
                (body[6 + 3 * i], body[7 + 3 * i] >> 4,
                 body[7 + 3 * i] & 15, body[8 + 3 * i])
                for i in range(nc)
            ]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline (SOF0) supported"
            )
        elif marker == 0xDA:
            ns = body[0]
            for i in range(ns):
                cid = body[1 + 2 * i]
                tabs = body[2 + 2 * i]
                idx = next(
                    j for j, c in enumerate(comps) if c[0] == cid
                )
                scan_sel.append((idx, tabs >> 4, tabs & 15))
            data_start = pos + seglen
            break
        pos += seglen
    if h is None or data_start is None:
        raise ValueError("jpeg: missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c[2], mcux * 8 * c[1])) for c in comps
    ]
    rdr = _BitReader(payload[data_start:])
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for s, (ci, dct, act) in enumerate(scan_sel):
                cid, hs, vs, qid = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        size = rdr.huff(huff_dc[dct])
                        diff = _extend(rdr.bits(size), size) if size else 0
                        preds[ci] += diff
                        coef = np.zeros(64)
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(huff_ac[act])
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 15
                            coef[k] = _extend(rdr.bits(size), size)
                            k += 1
                        blk = np.zeros(64)
                        blk[_ZZ] = coef
                        sp = _DCT.T @ (blk.reshape(8, 8) * qt[qid]) @ _DCT
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
    if len(comps) == 1:
        out = np.clip(planes[0][:h, :w] + 128.0, 0, 255)
        return np.round(out).astype(np.uint8)
    # upsample chroma to luma grid, then YCbCr → RGB
    full = []
    for i, (cid, hs, vs, qid) in enumerate(comps):
        p = planes[i]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        full.append(p[:h, :w])
    y, cb, cr = full[0] + 128.0, full[1], full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.round(
        np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    ).astype(np.uint8)
