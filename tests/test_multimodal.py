"""Multimodal binary-column operator tests (raw codec is real; the
Spark plumbing — schema, batch shape, re-encode — is what's under test)."""

import numpy as np
import pandas as pd
import pytest

from xpysom_dask_spark.operators import multimodal as M
from xpysom_dask_spark.sources import readers

from conftest import SF_TINY


@pytest.fixture(scope="module")
def images_df(spark):
    rng = np.random.RandomState(42)
    rows = []
    for i in range(20):
        h, w, c = 8, 12, 3
        img = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        rows.append((i, img.tobytes(), "raw", w, h, c))
    return spark.createDataFrame(rows, M.IMAGE_SCHEMA).repartition(3), rows


def _decode(row):
    i, data, fmt, w, h, c = row
    return np.frombuffer(data, np.uint8).reshape(h, w, c)


def test_image_features_matches_numpy(spark, images_df):
    df, rows = images_df
    out = M.image_features(df).toPandas().set_index("image_id")
    for row in rows:
        img = _decode(row) / np.float32(255.0)
        exp = np.array([img.mean(), img.std(), img.min(), img.max(),
                        np.abs(np.diff(img, axis=1)).mean()], np.float32)
        np.testing.assert_allclose(out.loc[row[0], "features"], exp,
                                   rtol=1e-6)


def test_image_stats_exact(spark, images_df):
    df, rows = images_df
    out = M.image_stats(df).toPandas().set_index("image_id")
    for row in rows:
        img = _decode(row).astype(np.int64)
        r = out.loc[row[0]]
        assert r["px_sum"] == img.sum()
        assert r["px_sumsq"] == (img * img).sum()
        assert (r["px_min"], r["px_max"]) == (img.min(), img.max())
        assert r["edge_sum"] == np.abs(np.diff(img, axis=1)).sum()


def test_resize_nearest_neighbor(spark, images_df):
    df, rows = images_df
    out = M.resize_images(df, 6, 4).toPandas().set_index("image_id")
    for row in rows:
        img = _decode(row)
        h, w, c = img.shape
        yi = np.arange(4) * h // 4
        xi = np.arange(6) * w // 6
        exp = img[yi[:, None], xi[None, :], :]
        r = out.loc[row[0]]
        assert (r["width"], r["height"], r["channels"]) == (6, 4, 3)
        got = np.frombuffer(r["data"], np.uint8).reshape(4, 6, 3)
        np.testing.assert_array_equal(got, exp)


def test_sample_frames_and_compose(spark):
    rng = np.random.RandomState(7)
    vids = []
    for v in range(2):
        frames = rng.randint(0, 256, size=(6, 4, 5, 1), dtype=np.uint8)
        vids.append((v, frames.tobytes(), "raw", 5, 4, 1, 6))
    vdf = spark.createDataFrame(vids, M.VIDEO_SCHEMA)
    out = M.sample_frames(vdf, every_n=2).toPandas()
    assert len(out) == 6  # 3 frames per video
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4]
    for _, r in out.iterrows():
        frames = np.frombuffer(vids[r["video_id"]][1], np.uint8).reshape(6, 4, 5, 1)
        got = np.frombuffer(r["data"], np.uint8).reshape(4, 5, 1)
        np.testing.assert_array_equal(got, frames[r["frame_idx"]])
    # frames compose with image_features
    feats = M.image_features(M.sample_frames(vdf, every_n=2))
    assert feats.count() == 6
    assert feats.schema["features"].dataType.simpleString() == "array<float>"


def test_audio_features(spark):
    sr = 8000
    t = np.arange(sr)  # 1 second
    pcm = (np.sin(2 * np.pi * 440 * t / sr) * 20000).astype("<i2")
    adf = spark.createDataFrame([(0, pcm.tobytes(), "pcm16", sr, sr)],
                                M.AUDIO_SCHEMA)
    out = M.audio_features(adf).toPandas().iloc[0]
    x = pcm.astype(np.float32) / 32768.0
    zc = np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / (sr - 1)
    np.testing.assert_allclose(
        out["features"],
        [np.sqrt(np.mean(x * x)), zc, np.abs(x).max(), 1.0], rtol=1e-5)


def test_unknown_format_raises(spark, images_df):
    df, _rows = images_df
    bad = df.limit(1).selectExpr("image_id", "data", "'tiff9' as format",
                                 "width", "height", "channels")
    with pytest.raises(Exception, match="no decoder registered"):
        M.image_features(bad).collect()


def test_raw_length_mismatch_raises(spark):
    df = (pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
          .createDataFrame([(0, b"\x00" * 10, "raw", 4, 4, 1)],
                           M.IMAGE_SCHEMA))
    with pytest.raises(Exception, match="byte length"):
        M.image_features(df).collect()


def test_embeddings_as_images_quantization(spark):
    emb = readers.load_table(spark, SF_TINY, "embeddings").limit(50)
    imgs = M.embeddings_as_images(emb)
    got = imgs.toPandas().set_index("image_id")
    src = emb.toPandas().set_index("vec_id")
    assert set(got.index) == set(src.index)
    for vid, row in got.iterrows():
        v = np.asarray(src.loc[vid, "embedding"], np.float64)
        exp = np.clip(np.floor((v + 1.0) * 127.5), 0, 255).astype(np.uint8)
        assert row["data"] == exp.tobytes()
        assert (row["width"], row["height"], row["channels"]) == (8, 8, 1)


def test_image_ahash_brightness_invariance(spark):
    """aHash is invariant to uniform brightness shifts: adding a
    constant to every pixel moves the mean by the same constant, so
    the (pixel > mean) pattern — and thus the signature — is
    unchanged.  This is the property that catches re-encoded copies
    byte-level dedup misses."""
    import numpy as np

    from xpysom_dask_spark.operators import multimodal as MM

    rng = np.random.default_rng(5)
    base = rng.integers(10, 200, size=(6, 64), dtype=np.int64)
    rows = []
    for i, px in enumerate(base):
        rows.append((i, px.astype(np.uint8).tobytes(), "raw", 8, 8, 1))
        shifted = np.clip(px + 30, 0, 255).astype(np.uint8)
        rows.append((100 + i, shifted.tobytes(), "raw", 8, 8, 1))
    df = spark.createDataFrame(
        rows, "image_id bigint, data binary, format string, "
              "width int, height int, channels int")
    sig = {r["image_id"]: tuple(r["bits"])
           for r in MM.image_ahash(df).collect()}
    for i in range(6):
        assert sig[i] == sig[100 + i], i
    # signatures are 2 sign-safe words covering 64 px
    assert all(len(v) == 2 and all(w >= 0 for w in v)
               for v in sig.values())


def test_audio_fingerprint_gain_invariance(spark):
    """n·|s| > Σ|s| is invariant under uniform gain (both sides scale
    by the same factor) — doubling amplitude leaves the signature
    unchanged until clipping."""
    import numpy as np

    from xpysom_dask_spark.operators import multimodal as MM

    rng = np.random.default_rng(9)
    base = rng.integers(-8000, 8000, size=(6, 64), dtype=np.int64)
    rows = []
    for i, s in enumerate(base):
        rows.append((i, s.astype("<i2").tobytes(), "pcm16", 8000, 64))
        rows.append((100 + i, (s * 2).astype("<i2").tobytes(),
                     "pcm16", 8000, 64))
    df = spark.createDataFrame(
        rows, "audio_id bigint, data binary, format string, "
              "sample_rate int, n_samples int")
    sig = {r["audio_id"]: tuple(r["bits"])
           for r in MM.audio_fingerprint(df).collect()}
    for i in range(6):
        assert sig[i] == sig[100 + i], i
    assert all(len(v) == 2 and all(w >= 0 for w in v)
               for v in sig.values())


def test_words_bits_validation(spark, images_df):
    df, _ = images_df
    for bad in (0, 64, 100):
        with pytest.raises(ValueError, match=r"words_bits"):
            M.image_ahash(df, words_bits=bad)
        with pytest.raises(ValueError, match=r"words_bits"):
            M.audio_fingerprint(df, words_bits=bad)
    # 63 is the last sign-safe width and must be accepted
    assert M.image_ahash(df, words_bits=63).count() == 20


def test_ahash_carry_columns_match_join(spark):
    """carry= must reproduce exactly what the old re-join computed,
    in one pass."""
    rng = np.random.RandomState(11)
    vids = [(v, rng.randint(0, 256, size=(4, 4, 5, 1), dtype=np.uint8)
             .tobytes(), "raw", 5, 4, 1, 4) for v in range(3)]
    frames = M.sample_frames(spark.createDataFrame(vids, M.VIDEO_SCHEMA))
    carried = M.image_ahash(frames, carry=("video_id", "frame_idx")) \
        .toPandas().sort_values("image_id").reset_index(drop=True)
    joined = M.image_ahash(frames).join(
        frames.select("image_id", "video_id", "frame_idx"),
        "image_id").toPandas().sort_values("image_id") \
        .reset_index(drop=True)
    assert list(carried["video_id"]) == list(joined["video_id"])
    assert list(carried["frame_idx"]) == list(joined["frame_idx"])
    assert [list(b) for b in carried["bits"]] == \
        [list(b) for b in joined["bits"]]


def test_video_fingerprint_plan_has_no_join(spark):
    rng = np.random.RandomState(13)
    vids = [(v, rng.randint(0, 256, size=(4, 4, 5, 1), dtype=np.uint8)
             .tobytes(), "raw", 5, 4, 1, 4) for v in range(3)]
    out = M.video_fingerprint(spark.createDataFrame(vids, M.VIDEO_SCHEMA))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    pdf = out.toPandas()
    assert len(pdf) == 3
    # 4 frames x ceil(20px / 32 bits) = 4 words per video signature
    assert all(len(b) == 4 for b in pdf["bits"])


# ---------------------------------------------------------------------- #
# PNG ingestion: pure-stdlib fallback decoder (zlib inflate + unfilter)

def _encode_png(img, filter_type=0):
    """Minimal PNG writer emitting ``filter_type`` on EVERY scanline —
    exercises each unfilter branch of the stdlib decoder; output is a
    spec-valid PNG any external tool can read."""
    import struct
    import zlib

    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    bpp = c
    for y in range(h):
        cur = flat[y]
        ft = filter_type
        if ft == 0:
            filt = cur
        elif ft == 1:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - a) & 255
        elif ft == 2:
            filt = (cur - prev) & 255
        elif ft == 3:
            a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            filt = (cur - ((a + prev) >> 1)) & 255
        elif ft == 4:
            filt = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[x] = (int(cur[x]) - pr) & 255
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_type(filter_type):
    rng = np.random.RandomState(100 + filter_type)
    img = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    data = _encode_png(img, filter_type)
    got = M.decode_image(data, {"format": "png"})
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_png_roundtrip_channel_layouts(channels):
    rng = np.random.RandomState(channels)
    img = rng.randint(0, 256, size=(6, 9, channels), dtype=np.uint8)
    got = M.decode_image(_encode_png(img, 4), {"format": "png"})
    np.testing.assert_array_equal(got, img)


def test_png_differential_vs_raw_through_image_stats(spark, images_df):
    """The SAME bitmaps, once as raw bytes, once PNG-encoded: the
    exact-integer stats operator must not see the codec at all — the
    decode step is the only thing that differs between the runs."""
    _, rows = images_df
    png_rows = [(i, _encode_png(_decode(r)), "png", r[3], r[4], r[5])
                for i, r in enumerate(rows)]
    pdf_raw = M.image_stats(
        spark.createDataFrame(rows, M.IMAGE_SCHEMA)).toPandas()
    pdf_png = M.image_stats(
        spark.createDataFrame(png_rows, M.IMAGE_SCHEMA)).toPandas()
    key = ["image_id"]
    a = pdf_raw.sort_values(key).reset_index(drop=True)
    b = pdf_png.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_png_unsupported_depth_names_the_remedy():
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)  # 16-bit RGB

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"")) + chunk(b"IEND", b""))
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present: it handles 16-bit PNGs")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_image(data, {"format": "png"})


def test_jpeg_decodes_without_pillow_webp_still_gated():
    """Round 8: baseline JPEG decodes for real via the stdlib decoder
    (tests/test_jpeg.py is the differential harness); a corrupt stream
    must fail in the DECODER (ValueError), not fall back to the PIL
    gate.  webp remains the actionable import-gated format."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed: everything decodes for real")
    except ImportError:
        pass
    with pytest.raises(ValueError, match="corrupt JPEG"):
        M.decode_image(b"\xff\xd8\xff\xe0fake", {"format": "jpeg"})
    with pytest.raises(NotImplementedError, match="[Pp]illow|PIL"):
        M.decode_image(b"RIFF....WEBP", {"format": "webp"})


def test_vectorized_fast_paths_match_per_row_fallback(spark):
    """Optimization r12: the uniform-raw / equal-length whole-batch
    vectorizations must be bit-identical to the per-row fallback loop.
    Mixed batches (two image shapes / two clip lengths in one relation)
    force the fallback; a uniform relation takes the fast path — both
    are compared against an independent per-row NumPy reference."""
    rng = np.random.RandomState(7)

    def ref_stats(img):
        m = img.astype(np.int64)
        edge = (np.abs(np.diff(m, axis=1)).sum()
                if m.shape[1] > 1 else 0)
        return (m.size, int(m.sum()), int((m * m).sum()),
                int(m.min()), int(m.max()), int(edge))

    def ref_ahash(img, words_bits=32):
        flat = img.astype(np.int64).reshape(-1)
        mean = flat.sum() / flat.size
        bit = (flat > mean).astype(np.int64)
        nw = (len(bit) + words_bits - 1) // words_bits
        return [int((bit[w * words_bits:(w + 1) * words_bits]
                     << np.arange(len(bit[w * words_bits:
                                          (w + 1) * words_bits]))).sum())
                for w in range(nw)]

    for shapes in ([(6, 9, 3)] * 12,                       # fast path
                   [(6, 9, 3)] * 6 + [(4, 4, 1)] * 6):     # fallback
        imgs = [rng.randint(0, 256, size=s, dtype=np.uint8)
                for s in shapes]
        rows = [(i, im.tobytes(), "raw", im.shape[1], im.shape[0],
                 im.shape[2]) for i, im in enumerate(imgs)]
        df = spark.createDataFrame(rows, M.IMAGE_SCHEMA).repartition(2)
        got = {r["image_id"]: r for r in M.image_stats(df).collect()}
        for i, im in enumerate(imgs):
            assert (got[i]["n_px"], got[i]["px_sum"], got[i]["px_sumsq"],
                    got[i]["px_min"], got[i]["px_max"],
                    got[i]["edge_sum"]) == ref_stats(im)
        gh = {r["image_id"]: list(r["bits"])
              for r in M.image_ahash(df).collect()}
        for i, im in enumerate(imgs):
            assert gh[i] == ref_ahash(im)

    # audio: 37 samples → a partial final 32-bit word (padding path)
    for lens in ([37] * 10, [37] * 5 + [21] * 5):
        clips = [rng.randint(-32768, 32767, size=n).astype("<i2")
                 for n in lens]
        rows = [(i, c.tobytes(), "pcm16", 8000, len(c))
                for i, c in enumerate(clips)]
        adf = spark.createDataFrame(rows, M.AUDIO_SCHEMA).repartition(2)
        got = {r["audio_id"]: r for r in M.audio_stats(adf).collect()}
        for i, c in enumerate(clips):
            x = c.astype(np.int64)
            zc = int(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0)))
            assert (got[i]["n_samples"], got[i]["s_sum"],
                    got[i]["s_sumsq"], got[i]["s_min"], got[i]["s_max"],
                    got[i]["zero_crossings"]) == (
                len(x), int(x.sum()), int((x * x).sum()),
                int(x.min()), int(x.max()), zc)
        gf = {r["audio_id"]: list(r["bits"])
              for r in M.audio_fingerprint(adf).collect()}
        for i, c in enumerate(clips):
            a = np.abs(c.astype(np.int64))
            bit = (len(a) * a > int(a.sum())).astype(np.int64)
            nw = (len(bit) + 31) // 32
            want = [int((bit[w * 32:(w + 1) * 32]
                         << np.arange(len(bit[w * 32:(w + 1) * 32])))
                        .sum()) for w in range(nw)]
            assert gf[i] == want


def test_fast_path_byte_cap_falls_back_identically(spark, monkeypatch):
    """r12 ADVICE #1: uniform batches above _FAST_PATH_MAX_BYTES must
    take the per-row path (peak O(one payload)) and produce identical
    rows — the cap changes memory shape only, never results."""
    from xpysom_dask_spark.operators import multimodal as MM

    imgs = spark.createDataFrame(
        [(i, bytes(((i + j) % 251) for j in range(48)), "raw", 4, 4, 3)
         for i in range(20)], MM.IMAGE_SCHEMA)
    clips = spark.createDataFrame(
        [(i, bytes(((i * 7 + j) % 256) for j in range(64)), "pcm16",
          8000, 32) for i in range(20)], MM.AUDIO_SCHEMA)

    fast_i = sorted(map(tuple, MM.image_stats(imgs).collect()))
    fast_h = sorted((r["image_id"], tuple(r["bits"]))
                    for r in MM.image_ahash(imgs).collect())
    fast_a = sorted(map(tuple, MM.audio_stats(clips).collect()))
    fast_f = sorted((r["audio_id"], tuple(r["bits"]))
                    for r in MM.audio_fingerprint(clips).collect())

    monkeypatch.setattr(MM, "_FAST_PATH_MAX_BYTES", 1)
    slow_i = sorted(map(tuple, MM.image_stats(imgs).collect()))
    slow_h = sorted((r["image_id"], tuple(r["bits"]))
                    for r in MM.image_ahash(imgs).collect())
    slow_a = sorted(map(tuple, MM.audio_stats(clips).collect()))
    slow_f = sorted((r["audio_id"], tuple(r["bits"]))
                    for r in MM.audio_fingerprint(clips).collect())

    assert fast_i == slow_i and fast_h == slow_h
    assert fast_a == slow_a and fast_f == slow_f
