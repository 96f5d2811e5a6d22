"""Baseline JPEG (ITU T.81 / JFIF) decoder on stdlib + numpy only.

The container ships no Pillow/libjpeg, but JPEG is the most common
real-corpus image format — without a decoder the whole fingerprint /
image-stats family is gated off for the format that dominates web
corpora.  This implements the baseline sequential DCT process from the
public spec (ITU-T Rec. T.81, 1992): marker parse → Huffman-coded
entropy segment decode (DC prediction + AC run/size, byte unstuffing,
restart intervals) → dequantize → de-zigzag → 8×8 IDCT → chroma
upsample → YCbCr→RGB (JFIF/BT.601 full range).

Scope (raises an actionable ``NotImplementedError`` outside it, the
PNG-fallback convention):

* baseline sequential (SOF0) and extended sequential (SOF1) Huffman,
  8-bit precision;
* grayscale (1 component) and YCbCr (3 components), any h/v sampling
  factors up to 2 (covers 4:4:4, 4:2:2, 4:4:0, 4:2:0);
* restart intervals (DRI/RSTn);
* NOT progressive (SOF2), arithmetic coding, hierarchical, 12-bit,
  or 4-component CMYK/YCCK streams.

Decoder-defined details the tests pin down:

* IDCT is the exact float 2-D separable transform (basis-matrix
  multiply), then ``round`` (numpy half-to-even), ``+128`` level
  shift, clamp to [0, 255] — deterministic across platforms;
* chroma upsampling is NEAREST (pixel replication).  Fancy upsampling
  (libjpeg's triangle filter) changes bytes, not semantics; nearest is
  the spec-minimal choice and is what the differential tests encode.

Like the PNG path, per-image Python cost is acceptable: decode runs
once per image inside a mapInPandas Arrow batch.  The entropy decode
is the hot loop and uses a flattened-table Huffman reader over a
numpy-unstuffed byte array (no per-bit Python objects).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg_stdlib"]

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int32)

#: 8-point DCT-III basis: B[u, x] = c(u)/2 · cos((2x+1)uπ/16); the 2-D
#: IDCT of block S is Bᵀ·S·B
_C = np.array([[(np.sqrt(0.125) if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


class _Huff:
    """Canonical Huffman table as (first-code, first-value-index) per
    length + flat value array — the T.81 DECODE procedure, O(maxlen)
    per symbol with integer compares only."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, counts, vals):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _BitReader:
    """MSB-first bit reader over the UNSTUFFED entropy bytes of one
    restart segment (0xFF00 already collapsed, RSTn stripped)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                # T.81 F.2.2.5: pad with 1-bits past the segment end
                self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out

    def huff(self, tbl: _Huff) -> int:
        code = self.bits(1)
        ln = 1
        while code > tbl.maxcode[ln]:
            if ln >= 16:
                raise ValueError("corrupt JPEG: invalid Huffman code")
            code = (code << 1) | self.bits(1)
            ln += 1
        return tbl.vals[tbl.valptr[ln] + code - tbl.mincode[ln]]


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1 EXTEND: map t raw bits to the signed difference
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _unstuff(data: bytes) -> tuple[list[bytes], int]:
    """Split the entropy-coded segment at RSTn markers, collapsing
    0xFF00 stuffing; returns (segments, bytes consumed up to the next
    real marker)."""
    segs, cur = [], bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:                     # T.81 B.1.1.2 fill byte
            i += 1
        elif 0xD0 <= m <= 0xD7:             # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                               # real marker: scan over
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg_stdlib(data: bytes, meta: dict | None = None
                       ) -> np.ndarray:
    """Decode a baseline JPEG to ``uint8 (h, w)`` grayscale or
    ``(h, w, 3)`` RGB.  See module docstring for scope and the exact
    rounding/upsampling contract."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip the run so the byte after the last 0xFF is
        # read as the marker code, not as a bogus segment length
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > n:
            break
        marker = data[pos + 1]
        if marker == 0xD9:                  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:                  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i) \
                        .astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i) \
                        .astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:                # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1:i + 17])
                nv = sum(counts)
                vals = list(body[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _Huff(counts, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):        # SOF0/SOF1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG precision {prec} unsupported (8-bit "
                    "baseline only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} unsupported: only "
                "baseline/extended sequential Huffman (SOF0/SOF1); "
                "progressive and arithmetic streams need a real codec")
        elif marker == 0xDD:                # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tdta = body[1 + 2 * s], body[2 + 2 * s]
                comp = next(c for c in frame["comps"]
                            if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError(
                    "multi-scan JPEG (non-interleaved) unsupported")
            segs, used = _unstuff(data[pos:])
            return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                                restart_interval, segs)
        # APPn / COM / others: skipped
    raise ValueError("corrupt JPEG: no SOS marker found")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                 restart_interval, segs) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    nc = len(comps)
    if nc not in (1, 3):
        raise NotImplementedError(
            f"{nc}-component JPEG unsupported (grayscale or YCbCr)")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in comps):
        raise NotImplementedError(
            "sampling factors above 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes in 8x8 blocks
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                       np.float64) for c in comps]
    qtabs = [qt[c["tq"]].astype(np.float64) for c in comps]

    # T.81 interleave order follows the SOS component order; map each
    # scan entry back to its frame-component plane so an SOS that
    # reorders components still lands coefficients correctly
    plane_of = [comps.index(comp) for comp, _td, _ta in scan]

    n_mcu = mcux * mcuy
    per_seg = restart_interval if restart_interval else n_mcu
    mcu = 0
    for seg_bytes in segs:
        if mcu >= n_mcu:
            break
        rd = _BitReader(seg_bytes)
        pred = [0] * nc                     # DC prediction resets/RST
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for si, (comp, td, ta) in enumerate(scan):
                pi = plane_of[si]
                dct = huff_dc[td]
                act = huff_ac[ta]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = _decode_block(rd, dct, act, pred, si)
                        blk = (zz * qtabs[pi])[_ZIGZAG_INV] \
                            .reshape(8, 8)
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[pi][y0:y0 + 8, x0:x0 + 8] = \
                            _C.T @ blk @ _C
            mcu += 1
    if mcu < n_mcu:
        raise ValueError(
            f"corrupt JPEG: {n_mcu - mcu} MCUs missing from scan")

    out = []
    for ci, comp in enumerate(comps):
        px = np.clip(np.round(planes[ci]) + 128, 0, 255) \
            .astype(np.uint8)
        # nearest-neighbour upsample to full resolution, then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            px = px.repeat(ry, axis=0).repeat(rx, axis=1)
        out.append(px[:h, :w])
    if nc == 1:
        return out[0]
    y, cb, cr = (p.astype(np.float64) for p in out)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


_ZIGZAG_INV = np.argsort(_ZIGZAG)


def _decode_block(rd: _BitReader, dct: _Huff, act: _Huff,
                  pred: list, ci: int) -> np.ndarray:
    zz = np.zeros(64, np.float64)
    t = rd.huff(dct)
    diff = _extend(rd.bits(t), t)
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = rd.huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                     # ZRL: 16 zeros
                k += 16
                continue
            break                           # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG: AC index overflow")
        zz[k] = _extend(rd.bits(s), s)
        k += 1
    return zz
