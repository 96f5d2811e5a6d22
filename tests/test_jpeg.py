"""Differential tests for the stdlib baseline JPEG decoder.

Strategy (the _encode_png precedent): a minimal from-scratch baseline
JPEG ENCODER lives here in the tests.  It takes QUANTIZED coefficient
blocks directly — no FDCT, no lossy step — so the expected image is an
EXACT function of the chosen coefficients: expected = clamp(round(
IDCT(zz·q)) + 128), computed in this file by an independent
einsum-based IDCT.  Any disagreement is a decoder bug, not codec
noise."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators.jpeg import decode_jpeg_stdlib

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])


# --------------------------------------------------------------- #
# reference IDCT (independent shape: direct cos einsum, no basis
# matrix shared with the decoder)

def _ref_idct(block8x8):
    u = np.arange(8)
    cu = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    cos = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16)
    # f[y, x] = 1/4 sum_v sum_u c(v)c(u) S[v,u] cos_y_v cos_x_u
    return 0.25 * np.einsum("v,u,vu,yv,xu->yx", cu, cu, block8x8,
                            cos, cos)


def _expected_plane(coeff_blocks, q, bh, bw):
    """coeff_blocks: dict (by, bx) -> 64 quantized zigzag ints."""
    plane = np.zeros((bh * 8, bw * 8))
    for (by, bx), zz in coeff_blocks.items():
        nat = np.empty(64)
        nat[ZIGZAG] = np.asarray(zz, float) * q
        plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = \
            _ref_idct(nat.reshape(8, 8))
    return np.clip(np.round(plane) + 128, 0, 255).astype(np.uint8)


# --------------------------------------------------------------- #
# minimal baseline encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.out)


def _canonical(symbols, length):
    """All symbols at one code length (canonical order = symbol order);
    valid while len(symbols) < 2**length (all-ones stays unused)."""
    assert len(symbols) < (1 << length)
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    codes = {s: i for i, s in enumerate(symbols)}
    return counts, list(symbols), codes, length


def _encode_blocks(bw, blocks, dc_codes, dc_len, ac_codes, ac_len,
                   pred):
    for zz in blocks:
        diff = int(zz[0]) - pred[0]
        pred[0] = int(zz[0])
        t = int(abs(diff)).bit_length()
        bw.write(dc_codes[t], dc_len)
        if t:
            v = diff if diff >= 0 else diff + (1 << t) - 1
            bw.write(v, t)
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
        for k in range(1, 64):
            v = int(zz[k])
            if k > last_nz:
                break
            if v == 0:
                run += 1
                if run == 16:
                    bw.write(ac_codes[0xF0], ac_len)   # ZRL
                    run = 0
                continue
            s = abs(v).bit_length()
            bw.write(ac_codes[(run << 4) | s], ac_len)
            raw = v if v >= 0 else v + (1 << s) - 1
            bw.write(raw, s)
            run = 0
        if last_nz < 63:
            bw.write(ac_codes[0x00], ac_len)           # EOB


def encode_jpeg(h, w, comps, q_tables, restart=0):
    """comps: list of dicts {hs, vs, tq, blocks: {(by,bx): zz64}} in
    frame order; blocks are per-component grids covering the scaled
    MCU canvas.  Emits one interleaved baseline scan, shared Huffman
    tables sized to the emitted symbols."""
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # build Huffman alphabets from what we will actually emit
    dc_syms, ac_syms = set(), set()
    for c in comps:
        prev = 0
        order = []
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        order.append(
                            c["blocks"][(my * c["vs"] + by,
                                         mx * c["hs"] + bx)])
        c["_order"] = order
        for zz in order:
            diff = int(zz[0]) - prev
            prev = int(zz[0])
            dc_syms.add(int(abs(diff)).bit_length())
            run = 0
            last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    if run == 16:
                        ac_syms.add(0xF0)
                        run = 0
                    continue
                ac_syms.add((run << 4) | abs(v).bit_length())
                run = 0
            if last_nz < 63:
                ac_syms.add(0x00)
    # full DC size alphabet: restart intervals reset the prediction,
    # so the collection pass (which runs without resets) can miss a
    # diff size the real encoding emits
    dc_counts, dc_vals, dc_codes, dc_len = \
        _canonical(list(range(12)), 6)
    ac_counts, ac_vals, ac_codes, ac_len = \
        _canonical(sorted(ac_syms), 9)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    for tq, q in q_tables.items():
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["hs"] << 4) | c["vs"], c["tq"]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    n_mcu = mcux * mcuy
    per = restart if restart else n_mcu
    mcu = 0
    rst = 0
    while mcu < n_mcu:
        bw = _BitWriter()
        preds = {i: [0] for i in range(len(comps))}  # DC resets at RST
        for m in range(mcu, min(mcu + per, n_mcu)):
            for i, c in enumerate(comps):
                nblk = c["hs"] * c["vs"]
                blocks = c["_order"][m * nblk:(m + 1) * nblk]
                _encode_blocks(bw, blocks, dc_codes, dc_len,
                               ac_codes, ac_len, preds[i])
        out += bw.flush()
        mcu += per
        if mcu < n_mcu:
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- #
# tests

def _rand_zz(rng, n_coef=10, amp=30):
    zz = np.zeros(64, np.int64)
    zz[0] = rng.randint(-200, 200)
    idx = rng.choice(np.arange(1, 64), size=n_coef, replace=False)
    zz[idx] = rng.randint(-amp, amp + 1, size=n_coef)
    return zz


def test_gray_single_block_flat():
    q = np.ones(64, np.int64)
    zz = np.zeros(64, np.int64)
    zz[0] = 64                              # IDCT -> flat +8, +128
    data = encode_jpeg(8, 8, [{"hs": 1, "vs": 1, "tq": 0,
                               "blocks": {(0, 0): zz}}], {0: q})
    img = decode_jpeg_stdlib(data)
    assert img.shape == (8, 8)
    assert (img == 136).all()


def test_gray_multiblock_random_exact():
    rng = np.random.RandomState(8)
    q = rng.randint(1, 40, 64).astype(np.int64)
    blocks = {(by, bx): _rand_zz(rng) for by in range(3)
              for bx in range(2)}
    data = encode_jpeg(24, 16, [{"hs": 1, "vs": 1, "tq": 0,
                                 "blocks": blocks}], {0: q})
    img = decode_jpeg_stdlib(data)
    assert img.shape == (24, 16)
    assert np.array_equal(img, _expected_plane(blocks, q, 3, 2))


def test_gray_odd_size_crops_partial_mcu():
    rng = np.random.RandomState(9)
    q = np.full(64, 2, np.int64)
    blocks = {(by, bx): _rand_zz(rng) for by in range(2)
              for bx in range(2)}
    data = encode_jpeg(13, 11, [{"hs": 1, "vs": 1, "tq": 0,
                                 "blocks": blocks}], {0: q})
    img = decode_jpeg_stdlib(data)
    assert img.shape == (13, 11)
    assert np.array_equal(img,
                          _expected_plane(blocks, q, 2, 2)[:13, :11])


def test_color_420_exact():
    rng = np.random.RandomState(10)
    qy = rng.randint(1, 30, 64).astype(np.int64)
    qc = rng.randint(1, 50, 64).astype(np.int64)
    yb = {(by, bx): _rand_zz(rng) for by in range(2) for bx in range(2)}
    cb = {(0, 0): _rand_zz(rng, 5, 15)}
    cr = {(0, 0): _rand_zz(rng, 5, 15)}
    data = encode_jpeg(
        16, 16,
        [{"hs": 2, "vs": 2, "tq": 0, "blocks": yb},
         {"hs": 1, "vs": 1, "tq": 1, "blocks": cb},
         {"hs": 1, "vs": 1, "tq": 1, "blocks": cr}],
        {0: qy, 1: qc})
    img = decode_jpeg_stdlib(data)
    assert img.shape == (16, 16, 3)
    y = _expected_plane(yb, qy, 2, 2).astype(np.float64)
    cbp = _expected_plane(cb, qc, 1, 1).repeat(2, 0).repeat(2, 1) \
        .astype(np.float64)
    crp = _expected_plane(cr, qc, 1, 1).repeat(2, 0).repeat(2, 1) \
        .astype(np.float64)
    r = y + 1.402 * (crp - 128)
    g = y - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128)
    b = y + 1.772 * (cbp - 128)
    exp = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255) \
        .astype(np.uint8)
    assert np.array_equal(img, exp)


def test_color_422_exact():
    rng = np.random.RandomState(11)
    q = np.full(64, 3, np.int64)
    yb = {(0, bx): _rand_zz(rng) for bx in range(2)}
    cb = {(0, 0): _rand_zz(rng, 4)}
    cr = {(0, 0): _rand_zz(rng, 4)}
    data = encode_jpeg(
        8, 16,
        [{"hs": 2, "vs": 1, "tq": 0, "blocks": yb},
         {"hs": 1, "vs": 1, "tq": 0, "blocks": cb},
         {"hs": 1, "vs": 1, "tq": 0, "blocks": cr}],
        {0: q})
    img = decode_jpeg_stdlib(data)
    assert img.shape == (8, 16, 3)
    y = _expected_plane(yb, q, 1, 2).astype(np.float64)
    cbp = _expected_plane(cb, q, 1, 1).repeat(2, 1).astype(np.float64)
    crp = _expected_plane(cr, q, 1, 1).repeat(2, 1).astype(np.float64)
    r = y + 1.402 * (crp - 128)
    g = y - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128)
    b = y + 1.772 * (cbp - 128)
    exp = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255) \
        .astype(np.uint8)
    assert np.array_equal(img, exp)


def test_restart_intervals_reset_dc_prediction():
    rng = np.random.RandomState(12)
    q = np.ones(64, np.int64)
    blocks = {(0, bx): _rand_zz(rng) for bx in range(4)}
    one = encode_jpeg(8, 32, [{"hs": 1, "vs": 1, "tq": 0,
                               "blocks": blocks}], {0: q})
    rst = encode_jpeg(8, 32, [{"hs": 1, "vs": 1, "tq": 0,
                               "blocks": blocks}], {0: q}, restart=2)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    a, b = decode_jpeg_stdlib(one), decode_jpeg_stdlib(rst)
    assert np.array_equal(a, b)
    assert np.array_equal(a, _expected_plane(blocks, q, 1, 4))


def test_progressive_raises_actionable():
    # minimal stream with SOF2: scope gate, not a crash
    body = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    data = (b"\xff\xd8\xff\xc2" + struct.pack(">H", len(body) + 2)
            + body + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg_stdlib(data)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_stdlib(b"\x89PNG\r\n\x1a\n")


def test_truncated_scan_raises():
    q = np.ones(64, np.int64)
    zz = np.zeros(64, np.int64)
    zz[0] = 64
    blocks = {(by, bx): zz for by in range(4) for bx in range(4)}
    data = encode_jpeg(32, 32, [{"hs": 1, "vs": 1, "tq": 0,
                                 "blocks": blocks}], {0: q})
    # chop the entropy segment mid-way: the 1-padding heuristic cannot
    # invent 16 MCUs; decoder must fail loudly, not return garbage
    cut = data[: data.index(b"\xff\xda") + 20]
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg_stdlib(cut + b"\xff\xd9")


def test_decode_image_routes_jpeg_without_pillow(spark):
    """multimodal.decode_image('jpeg') must reach the stdlib decoder
    when Pillow is absent (it is, in this container) and feed the
    image operators end-to-end."""
    from xpysom_dask_spark.operators import multimodal as MM

    rng = np.random.RandomState(13)
    q = np.full(64, 2, np.int64)
    blocks = {(by, bx): _rand_zz(rng) for by in range(2)
              for bx in range(2)}
    data = encode_jpeg(16, 16, [{"hs": 1, "vs": 1, "tq": 0,
                                 "blocks": blocks}], {0: q})
    img = MM.decode_image(data, {"format": "jpeg"})
    assert img.shape == (16, 16, 1)   # (h, w, c) decoder contract
    df = spark.createDataFrame(
        [(1, bytearray(data), "jpeg")],
        "image_id bigint, data binary, format string")
    feats = MM.image_features(df).collect()
    exp = _expected_plane(blocks, q, 2, 2).astype(np.float64) / 255.0
    got = np.asarray(feats[0]["features"])
    assert abs(got[0] - exp.mean()) < 1e-6
    assert abs(got[1] - exp.std()) < 1e-6


def test_randomized_configs_exact():
    """Randomized sweep over sizes / sampling factors / quant tables /
    coefficient densities — every decode must be bit-exact against the
    independent IDCT reference (the coefficients are chosen, not
    FDCT'd, so there is no lossy step to hide behind)."""
    rng = np.random.RandomState(2024)
    for trial in range(12):
        hs, vs = int(rng.choice([1, 2])), int(rng.choice([1, 2]))
        mcux = int(rng.randint(1, 3))
        mcuy = int(rng.randint(1, 3))
        w_full, h_full = mcux * 8 * hs, mcuy * 8 * vs
        # random crop inside the MCU grid (partial-MCU edge handling)
        w = int(rng.randint(w_full - 7, w_full + 1))
        h = int(rng.randint(h_full - 7, h_full + 1))
        qy = rng.randint(1, 64, 64).astype(np.int64)
        qc = rng.randint(1, 64, 64).astype(np.int64)
        dens = int(rng.randint(1, 20))
        yb = {(by, bx): _rand_zz(rng, dens)
              for by in range(mcuy * vs) for bx in range(mcux * hs)}
        cb = {(by, bx): _rand_zz(rng, max(dens // 2, 1))
              for by in range(mcuy) for bx in range(mcux)}
        cr = {(by, bx): _rand_zz(rng, max(dens // 2, 1))
              for by in range(mcuy) for bx in range(mcux)}
        restart = int(rng.choice([0, 1, 2]))
        data = encode_jpeg(
            h, w,
            [{"hs": hs, "vs": vs, "tq": 0, "blocks": yb},
             {"hs": 1, "vs": 1, "tq": 1, "blocks": cb},
             {"hs": 1, "vs": 1, "tq": 1, "blocks": cr}],
            {0: qy, 1: qc}, restart=restart)
        img = decode_jpeg_stdlib(data)
        assert img.shape == (h, w, 3), (trial, img.shape)
        y = _expected_plane(yb, qy, mcuy * vs, mcux * hs) \
            .astype(np.float64)[:h, :w]
        cbp = _expected_plane(cb, qc, mcuy, mcux) \
            .repeat(vs, 0).repeat(hs, 1).astype(np.float64)[:h, :w]
        crp = _expected_plane(cr, qc, mcuy, mcux) \
            .repeat(vs, 0).repeat(hs, 1).astype(np.float64)[:h, :w]
        r = y + 1.402 * (crp - 128)
        g = y - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128)
        b = y + 1.772 * (cbp - 128)
        exp = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255) \
            .astype(np.uint8)
        assert np.array_equal(img, exp), trial


def test_fill_bytes_before_markers_decode_identically():
    """T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
    fill bytes — both in the header stream and inside the
    entropy-coded segment before RST/EOI (ADVICE r8: the old _unstuff
    treated 0xFF 0xFF as a real marker and the header loop read a
    bogus segment length)."""
    rng = np.random.RandomState(21)
    q = rng.randint(1, 30, 64).astype(np.int64)
    blocks = {(by, bx): _rand_zz(rng) for by in range(2)
              for bx in range(2)}
    data = encode_jpeg(16, 16, [{"hs": 1, "vs": 1, "tq": 0,
                                 "blocks": blocks}], {0: q},
                       restart=1)
    base = decode_jpeg_stdlib(data)

    # fill bytes before a header marker (SOF0)
    i = data.index(b"\xff\xc0")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    assert np.array_equal(decode_jpeg_stdlib(padded), base)

    # fill bytes before an RST marker inside the scan
    j = data.index(b"\xff\xd0")
    padded = data[:j] + b"\xff\xff" + data[j:]
    assert np.array_equal(decode_jpeg_stdlib(padded), base)

    # fill bytes before EOI (the scan's terminating real marker)
    k = data.rindex(b"\xff\xd9")
    padded = data[:k] + b"\xff" + data[k:]
    assert np.array_equal(decode_jpeg_stdlib(padded), base)
