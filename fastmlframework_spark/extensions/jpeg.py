"""Pure-Python baseline JPEG decoder (stdlib + numpy).

Closes the last multimodal decode gate (VERDICT r3 #8) without codec
libraries: baseline sequential DCT (SOF0), 8-bit samples, grayscale or
YCbCr with any sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0),
restart intervals, 16-bit quantization entries.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``NotImplementedError``
so callers can gate cleanly (the same contract as the PNG/WAV/netpbm
decoders in ``extensions/multimodal.py``).

This is executor-side code: it runs inside the ``mapInPandas`` batch
UDF on raw ``binary`` columns; nothing here touches the driver.  The
hot loop is per-coefficient Python, fine for feature-extraction of
small thumbnails; swap in PIL via the ``decode='real'`` gate when the
environment has it.

Format reference: ITU-T T.81 (public spec); layout follows the
marker-segment walk any baseline decoder performs.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: s = T.T @ F @ T with T[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with
    0xFF00 byte-unstuffing; stops at markers (0xFF D0-D7 handled by
    the caller via ``restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: pad (spec: decoder
                # only sees this on aligned restarts)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
            else:
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.bits >> self.nbits) & 1
        # truncate consumed high bits — otherwise ``bits`` accumulates
        # every byte ever read and each shift copies an ever-growing
        # integer (O(bytes²) over a large scan)
        self.bits &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_restart(self) -> None:
        """Drop buffered bits and consume an RSTn marker, skipping any
        remaining entropy bytes — including stuffed 0xFF00 pairs,
        which are DATA, not markers (an interval whose last entropy
        byte is 0xFF is stuffed and may be left unread here)."""
        self.bits = 0
        self.nbits = 0
        while True:
            if self.data[self.pos] != 0xFF:
                self.pos += 1
                continue
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed data byte
                self.pos += 2
                continue
            if nxt == 0xFF:  # fill byte before a marker
                self.pos += 1
                continue
            break
        if not 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            raise ValueError(
                f"expected RSTn marker, found 0xFF{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude to signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG → uint8 array (H, W) gray or (H, W, 3)
    RGB (JFIF YCbCr conversion)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos: pos + 2])
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg[p: p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = vals
                qt[tid] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1: p + 17])
                n = sum(counts)
                symbols = seg[p + 17: p + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _build_huffman(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 0xF)
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        pos += seglen


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w_img + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h_img + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    pred = [0] * len(comps)
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.align_to_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.zeros(64, dtype=np.float64)
                        t = _decode_symbol(r, huff_dc[td])
                        diff = _extend(r.read_bits(t), t)
                        pred[ci] += diff
                        block[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, huff_ac[ta])
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            block[ZIGZAG[k]] = _extend(r.read_bits(size), size)
                            k += 1
                        f = block.reshape(8, 8) * qt[c["tq"]]
                        s = _T.T @ f @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0: y0 + 8, x0: x0 + 8] = s
    # upsample to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h_img, :w_img])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) == 3:
        y, cb, cr = full
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        rgb = np.stack([rr, gg, bb], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(full)}-component JPEG")
