"""Baseline JPEG codec in pure numpy + stdlib — no PIL/libjpeg in this
container.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:0 / 4:2:2 subsampling, DHT Huffman tables, DRI/RSTn restart
markers. Progressive (SOF2), arithmetic coding and 12-bit raise
NotImplementedError.

Encoder (used by fixtures/tests): baseline 4:4:4 with the spec's Annex K
quantization + Huffman tables, quality-scaled with the common IJG curve.

Built from the public ITU-T T.81 spec; DCT is the exact orthonormal 8×8
DCT-II matrix (floating point, clipped) — output matches libjpeg within
normal rounding, verified by encode→decode PSNR and flat-field exactness
tests rather than bit-compares against a foreign decoder.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
_UNZIG = np.argsort(_ZIGZAG)

#: Annex K Table K.1 / K.2 (luminance / chrominance quantization)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

#: Annex K Huffman specs: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


# --------------------------------------------------------- huffman core


def _build_codes(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 C.2."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """(bits, values) → dict[(length, code)] = symbol."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos = buf, pos
        self.acc, self.nbits = 0, 0

    def _fill(self):
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read — signal via exception
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self):
        """Consume padding + the RSTn marker at a restart boundary."""
        self.acc, self.nbits = 0, 0
        while True:
            b = self.buf[self.pos]
            if b == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _RestartMarker(Exception):
    pass


def _decode_symbol(br: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read_bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude → signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category t, t-bit code)."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# -------------------------------------------------------------- encoder


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate pad a plane to (ph, pw) — keeps DCT ringing down."""
    h, w = plane.shape
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    if h < ph:
        out[h:, :w] = plane[-1:, :]
    if w < pw:
        out[:, w:] = out[:, w - 1:w]
    return out


def _encode_block(bw, blk, q, dc, ac, pred_ci):
    F = _DCT @ blk @ _DCT.T
    coef = np.round(F / q).astype(np.int64).reshape(-1)[_ZIGZAG]
    diff = int(coef[0]) - pred_ci
    t, m = _magnitude(diff)
    c, ln = dc[t]
    bw.write(c, ln)
    if t:
        bw.write(m, t)
    run = 0
    for k in range(1, 64):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac[0xF0]
            bw.write(c, ln)
            run -= 16
        t, m = _magnitude(v)
        c, ln = ac[(run << 4) | t]
        bw.write(c, ln)
        bw.write(m, t)
        run = 0
    if run:
        c, ln = ac[0x00]  # EOB
        bw.write(c, ln)
    return int(coef[0])


def encode_jpeg_baseline(pix: np.ndarray, quality: int = 85,
                         subsample: str = "444",
                         restart_interval: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray → baseline JFIF bytes.
    `subsample` ∈ {"444", "420"}; `restart_interval` emits DRI + RSTn
    markers every N MCUs (0 = none)."""
    gray = pix.ndim == 2
    h, w = pix.shape[:2]
    if gray:
        planes = [pix.astype(np.float64) - 128.0]
        sampling = [(1, 1)]
    else:
        p = pix.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = (-0.168736 * p[..., 0] - 0.331264 * p[..., 1]
              + 0.5 * p[..., 2] + 128)
        cr = (0.5 * p[..., 0] - 0.418688 * p[..., 1]
              - 0.081312 * p[..., 2] + 128)
        if subsample == "420":
            # 2×2 box-average chroma downsample (pad odd dims first)
            ph, pw = h + (h & 1), w + (w & 1)
            cbp, crp = _pad_to(cb, ph, pw), _pad_to(cr, ph, pw)
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            sampling = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "422":
            # horizontal-only 1×2 box-average chroma downsample
            pw = w + (w & 1)
            cbp, crp = _pad_to(cb, h, pw), _pad_to(cr, h, pw)
            cb = cbp.reshape(h, pw // 2, 2).mean(axis=2)
            cr = crp.reshape(h, pw // 2, 2).mean(axis=2)
            sampling = [(2, 1), (1, 1), (1, 1)]
        elif subsample == "444":
            sampling = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsample {subsample!r}")
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    qy = _quality_scale(_QY, quality)
    qc = _quality_scale(_QC, quality)
    qtabs = [qy] if gray else [qy, qc, qc]
    dc_codes = [_build_codes(*_DC_LUM), _build_codes(*_DC_CHR)]
    ac_codes = [_build_codes(*_AC_LUM), _build_codes(*_AC_CHR)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for (sh, sv), pl in zip(sampling, planes):
        padded.append(_pad_to(pl, mcuy * 8 * sv, mcux * 8 * sh))

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_count, rst = 0, 0
    out_scan = bytearray()
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out_scan += bytes(bw.out)
                out_scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                bw = _BitWriter()
                pred = [0] * len(planes)
            for ci, ((sh, sv), pl) in enumerate(zip(sampling, padded)):
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        ys = (my * sv + by) * 8
                        xs = (mx * sh + bx) * 8
                        pred[ci] = _encode_block(
                            bw, pl[ys:ys + 8, xs:xs + 8], qtabs[ci],
                            dc_codes[tsel], ac_codes[tsel], pred[ci])
            mcu_count += 1
    bw.flush()
    out_scan += bytes(bw.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xFF\xD8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(qc.reshape(-1)[_ZIGZAG]
                                         .astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, sh << 4 | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM),
                                   (0, 1, _DC_CHR), (1, 1, _AC_CHR)):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, t << 4 | t])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, sos)
    out += bytes(out_scan)
    out += b"\xFF\xD9"  # EOI
    return out


# -------------------------------------------------------------- decoder


def decode_jpeg_baseline(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w, 3) RGB (gray stacked to 3)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(buf):
        if buf[pos] != 0xFF:
            pos += 1
            continue
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack_from(">H", buf, pos)[0]
        body = buf[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int64)
                qtabs[tq] = q[_UNZIG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                htabs[(cls, tid)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker FF{marker:02X})")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_sel.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(buf, pos + ln, frame, scan_sel, qtabs,
                                htabs, restart_interval)
        pos += ln
    raise ValueError("no SOS in JPEG")


def _decode_scan(buf, pos, frame, scan_sel, qtabs, htabs, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    sel = {cid: (td, ta) for cid, td, ta in scan_sel}
    br = _BitReader(buf, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    td, ta = sel[c["id"]]
                    dct = htabs[(0, td)]
                    act = htabs[(1, ta)]
                    q = qtabs[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = np.zeros(64, dtype=np.int64)
                            t = _decode_symbol(br, dct)
                            diff = _extend(br.read_bits(t), t) if t else 0
                            pred[ci] += diff
                            coef[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _decode_symbol(br, act)
                                r, t = rs >> 4, rs & 0xF
                                if rs == 0x00:
                                    break
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += r
                                coef[k] = _extend(br.read_bits(t), t)
                                k += 1
                            F = coef[_UNZIG].reshape(8, 8) * q
                            blk = _DCT.T @ F @ _DCT + 128.0
                            ys = (my * c["v"] + by) * 8
                            xs = (mx * c["h"] + bx) * 8
                            planes[ci][ys:ys + 8, xs:xs + 8] = blk
            except _RestartMarker:
                raise ValueError("restart marker inside MCU (corrupt scan)")
            mcu_count += 1
    # upsample to full size
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
