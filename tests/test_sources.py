"""Source/reader tests (SURVEY §2.1 S1-S8 on Spark)."""

import numpy as np

from xpysom_dask_spark import SparkSom
from xpysom_dask_spark.sources import readers

from conftest import SF_TINY


def test_load_csv_and_train(spark, tmp_path):
    # iris-like CSV fixture (reference S8: examples/iris.csv)
    rng = np.random.RandomState(3)
    path = str(tmp_path / "iris.csv")
    with open(path, "w") as f:
        f.write("sl,sw,pl,pw,species\n")
        for i in range(150):
            f.write(",".join(f"{v:.2f}" for v in rng.rand(4))
                    + f",sp{i % 3}\n")
    df = readers.load_csv(spark, path)
    assert df.columns == ["sl", "sw", "pl", "pw", "species"]
    assert df.count() == 150
    feats = readers.features_from_columns(
        df, ["sl", "sw", "pl", "pw"], keep=("species",))
    som = SparkSom(4, 4, 4, random_seed=1)
    som.train(feats, 3)
    labs = som.labels_map_df(feats, "species")
    assert labs.agg({"n": "sum"}).collect()[0][0] == 150


def test_features_from_columns_width(spark):
    li = readers.load_table(spark, SF_TINY, "lineitem").limit(10)
    df = readers.features_from_columns(
        li, ["l_quantity", "l_discount"], keep=("l_orderkey",))
    row = df.first()
    assert len(row["features"]) == 2
    assert df.columns == ["l_orderkey", "features"]


def test_all_tables_load(spark):
    for t in readers.TABLES:
        df = readers.load_table(spark, SF_TINY, t)
        assert df.count() > 0, t


def test_jsonl_roundtrip(spark, tmp_path):
    """write_jsonl -> load_jsonl round-trips the documents table
    (the training-data interchange path), including partitioned layout."""
    import pandas as pd

    from xpysom_dask_spark.sources.readers import load_jsonl
    from xpysom_dask_spark.sources.writers import write_jsonl

    from conftest import SF_TINY

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, partition_by="lang")
    ddl = ("doc_id bigint, text string, source string, n_chars bigint, "
           "lang string")
    back = load_jsonl(spark, path, schema=ddl)
    a = (docs.toPandas().sort_values("doc_id").reset_index(drop=True)
         .sort_index(axis=1))
    b = (back.toPandas().sort_values("doc_id").reset_index(drop=True)
         .sort_index(axis=1))
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_no_schema_warns(spark, tmp_path):
    import warnings

    from xpysom_dask_spark.sources.readers import load_jsonl
    from xpysom_dask_spark.sources.writers import write_jsonl

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    path = str(tmp_path / "warn_jsonl")
    write_jsonl(df, path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        back = load_jsonl(spark, path)
    assert any("schema-inference" in str(x.message) for x in w)
    assert back.count() == 5


def test_som_save_table_roundtrip(spark, tmp_path):
    import numpy as np

    from xpysom_dask_spark import SparkSom

    som = SparkSom(5, 3, 4, random_seed=9, topology="hexagonal",
                   sigma=1.5, learning_rate=0.3,
                   activation_distance="norm_p_no_opt",
                   activation_distance_kwargs={"p": 2},
                   dtype=np.float64)
    X = np.random.RandomState(1).rand(100, 4)
    som.train(X, 2)
    path = str(tmp_path / "som_model")
    som.save_table(spark, path)
    back = SparkSom.load_table(spark, path)
    np.testing.assert_array_equal(som.get_weights(), back.get_weights())
    assert back.topology == "hexagonal"
    assert back._activation_distance_name == "norm_p_no_opt"
    np.testing.assert_array_equal(som.predict(X), back.predict(X))


def test_make_session_reuses_and_configures(spark):
    from xpysom_dask_spark import make_session

    s = make_session("test-app", shuffle_partitions=8,
                     extra_conf={"spark.sql.ui.retainedExecutions": "42"})
    # an active session is reused (getOrCreate contract)
    assert s is spark
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"


def test_som_load_table_rejects_partial_codebook(spark, tmp_path):
    """A filtered/partial model table must raise, not silently return
    uninitialized-memory weights (ADVICE r02)."""
    import pytest

    from xpysom_dask_spark import SparkSom

    som = SparkSom(4, 4, 3, random_seed=2)
    path = str(tmp_path / "som_partial")
    som.save_table(spark, path)
    broken = str(tmp_path / "som_broken")
    spark.read.parquet(path).where("i > 0").write.parquet(broken)
    with pytest.raises(ValueError, match="complete codebook"):
        SparkSom.load_table(spark, broken)
    # duplicated cells are rejected too, not just missing ones
    dup = str(tmp_path / "som_dup")
    full = spark.read.parquet(path)
    full.unionAll(full.limit(1)).write.parquet(dup)
    with pytest.raises(ValueError, match="complete codebook"):
        SparkSom.load_table(spark, dup)


def test_orc_roundtrip(spark, tmp_path):
    from xpysom_dask_spark.sources import readers as R, writers as W

    df = R.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "docs_orc")
    W.write_orc(df, path, partition_by="lang")
    back = R.load_orc(spark, path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
    a = sorted(r["doc_id"] for r in back.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert a == b


def test_orc_scan_prunes_partitions(spark, tmp_path):
    """Filters on the partition column prune directories at plan time."""
    from xpysom_dask_spark.sources import readers as R, writers as W

    df = R.load_table(spark, SF_TINY, "documents")
    path = str(tmp_path / "docs_orc_p")
    W.write_orc(df, path, partition_by="source")
    back = R.load_orc(spark, path).where("source = 'src1'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(source" in plan \
        or "source#" in plan
    assert back.count() == df.where("source = 'src1'").count()


def test_text_source_lines_and_wholefile(spark, tmp_path):
    from xpysom_dask_spark.sources import readers as R

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n")
    (p / "b.txt").write_text("solo\n")
    lines = R.load_text(spark, str(p))
    assert lines.columns == ["value"]
    assert sorted(r["value"] for r in lines.collect()) == \
        ["line one", "line two", "solo"]
    whole = R.load_text(spark, str(p), whole_file=True)
    assert whole.count() == 2
    assert any("line one\nline two" in r["value"]
               for r in whole.collect())


def test_avro_gate_raises_actionably(spark):
    import pytest as _pt

    from xpysom_dask_spark.sources import readers as R
    from xpysom_dask_spark.sources import writers as W

    with _pt.raises(ImportError, match="spark-avro"):
        R.load_avro(spark, "/tmp/nope.avro")
    with _pt.raises(ImportError, match="spark.jars.packages"):
        W.write_avro(spark.range(1), "/tmp/nope.avro")


# ------------------------------------------------------------ WARC source


def _mk_warc_record(rtype, uri, body, rid="<urn:uuid:1>"):
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-08-16T00:00:00Z\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body + b"\r\n\r\n"


def test_read_warc_plain_and_gzip(spark, tmp_path):
    """Both .warc and .warc.gz (concatenated members) parse to the
    same records; payload bytes exact; http headers stripped by
    payload_text; a misaligned file fails loudly."""
    import gzip

    import pytest as _pt

    from xpysom_dask_spark.sources.warc import (payload_text,
                                                read_warc)

    html = b"<html><body>Hello &amp; welcome</body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    recs = (_mk_warc_record("warcinfo", "", b"software: test\r\n")
            + _mk_warc_record("response", "http://a.example/x", http)
            + _mk_warc_record("request", "http://a.example/x",
                              b"GET /x HTTP/1.1\r\n"))
    (tmp_path / "seg0.warc").write_bytes(recs)
    # .gz variant: one gzip member per record (the crawl convention)
    gz = b"".join(gzip.compress(_mk_warc_record(
        "response", f"http://b.example/{i}",
        b"HTTP/1.1 200 OK\r\n\r\ndoc body " + str(i).encode()))
        for i in range(3))
    (tmp_path / "seg1.warc.gz").write_bytes(gz)

    out = read_warc(spark, str(tmp_path)).collect()
    assert len(out) == 6
    by_type = {}
    for r in out:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 4
    resp = [r for r in by_type["response"]
            if r["target_uri"] == "http://a.example/x"][0]
    assert bytes(resp["payload"]) == http
    assert resp["content_length"] == len(http)

    texts = {r["target_uri"]: r["text"] for r in payload_text(
        read_warc(spark, str(tmp_path))
        .where("warc_type = 'response'")).collect()}
    assert texts["http://a.example/x"] == html.decode()
    assert texts["http://b.example/1"] == "doc body 1"

    (tmp_path / "bad.warc").write_bytes(b"NOT-A-WARC\r\n\r\nxx")
    with _pt.raises(Exception, match="WARC"):
        read_warc(spark, str(tmp_path / "bad.warc")).collect()


def test_warc_to_text_pipeline_composes(spark, tmp_path):
    """The crawl front door: read_warc -> payload_text -> html_to_text
    -> canonicalize_url runs as one composed plan."""
    from xpysom_dask_spark.operators import text as T
    from xpysom_dask_spark.sources.warc import (payload_text,
                                                read_warc)

    body = (b"HTTP/1.1 200 OK\r\n\r\n<html><body><p>Alpha beta"
            b"</p><script>no()</script></body></html>")
    (tmp_path / "s.warc").write_bytes(_mk_warc_record(
        "response", "HTTP://WWW.Site.com:80/a/?utm_source=x", body))
    out = (payload_text(read_warc(spark, str(tmp_path))
                        .where("warc_type = 'response'"))
           .withColumn("clean", T.strip_html("text"))
           .withColumn("url", T.canonicalize_url("target_uri"))
           .select("url", "clean").collect())
    assert len(out) == 1
    assert out[0]["url"] == "http://site.com/a"
    assert "Alpha beta" in out[0]["clean"]
    assert "no()" not in out[0]["clean"]


def test_warc_parser_roundtrip_property():
    """Property: build records from random binary payloads (including
    payloads containing CRLFCRLF / header-lookalike bytes), parse, and
    every payload comes back byte-exact in order — plus the
    mixed-endings case: LF-only headers whose payload contains
    CRLFCRLF must split at the LF terminator, not inside the body."""
    import random

    from xpysom_dask_spark.sources.warc import _split_records

    rng = random.Random(23)
    payloads = []
    for i in range(30):
        n = rng.randint(0, 200)
        body = bytes(rng.randrange(256) for _ in range(n))
        if i % 5 == 0:
            body = b"WARC/1.0\r\n\r\n" + body      # header lookalike
        if i % 7 == 0:
            body += b"\r\n\r\nContent-Length: 9\r\n"
        payloads.append(body)
    blob = b"".join(_mk_warc_record("response", f"http://x/{i}", b)
                    for i, b in enumerate(payloads))
    got = [p for _h, p in _split_records(blob)]
    assert got == payloads

    # LF-only headers, CRLFCRLF inside the payload
    body = b"AB\r\n\r\nCD"
    rec = (b"WARC/1.0\nWARC-Type: response\n"
           b"Content-Length: %d\n\n" % len(body)) + body + b"\r\n\r\n"
    [(hdrs, payload)] = list(_split_records(rec))
    assert payload == body and hdrs["warc-type"] == "response"


def test_write_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    """write_warc -> read_warc round-trips payload bytes exactly, in
    both .warc and per-record-gzip-member .warc.gz form; the manifest
    accounts for every record; overwrite wipes stale segments."""
    from pyspark.sql import functions as F

    from xpysom_dask_spark.sources.warc import read_warc, write_warc

    rows = [(f"http://t.example/{i}",
             bytes([i % 256, 13, 10, 13, 10]) + f"body {i}".encode(),
             f"<urn:uuid:{i}>")
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "target_uri string, payload binary, rid string") \
        .repartition(4)
    out = str(tmp_path / "crawl")
    man = write_warc(df, out, record_id_col="rid")
    assert sum(r["n_records"] for r in man) == 40
    assert all(r["file"].endswith(".warc") for r in man)
    man_gz = write_warc(df, out, record_id_col="rid", compress=True,
                        mode="append")
    assert sum(r["n_records"] for r in man_gz) == 40
    assert all(r["file"].endswith(".warc.gz") for r in man_gz)

    back = read_warc(spark, out)
    got = {(r["record_id"], r["file"].endswith(".gz")):
           bytes(r["payload"]) for r in back.collect()}
    assert len(got) == 80
    for uri, payload, rid in rows:
        assert got[(rid, False)] == payload  # CRLFCRLF inside body OK
        assert got[(rid, True)] == payload
    assert back.where(F.col("warc_type") != "response").count() == 0

    # overwrite replaces the plain segments, leaves the .gz alone
    man2 = write_warc(df.limit(10), out, record_id_col="rid")
    assert sum(r["n_records"] for r in man2) == 10
    assert read_warc(spark, out).count() == 50

    with __import__("pytest").raises(ValueError, match="mode"):
        write_warc(df, out, mode="error")


def test_payload_text_lf_only_http_headers(spark, tmp_path):
    """ADVICE r10: an http response with LF-only headers (tolerated at
    the WARC layer) must ALSO have its header block stripped by
    payload_text — earlier-terminator rule, same as _split_records."""
    from xpysom_dask_spark.sources.warc import payload_text, read_warc

    lf_http = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nlf body"
    crlf_http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                 b"crlf body")
    # LF-only headers whose BODY contains CRLFCRLF: cut at the LF
    # terminator, not inside the body
    tricky = b"HTTP/1.1 200 OK\nX: y\n\nbefore\r\n\r\nafter"
    recs = (_mk_warc_record("response", "http://e/1", lf_http)
            + _mk_warc_record("response", "http://e/2", crlf_http)
            + _mk_warc_record("response", "http://e/3", tricky))
    (tmp_path / "s.warc").write_bytes(recs)
    texts = {r["target_uri"]: r["text"]
             for r in payload_text(read_warc(
                 spark, str(tmp_path))).collect()}
    assert texts["http://e/1"] == "lf body"
    assert texts["http://e/2"] == "crlf body"
    assert texts["http://e/3"] == "before\r\n\r\nafter"


def test_write_warc_same_suffix_append_keeps_both_datasets(spark,
                                                           tmp_path):
    """ADVICE r11 (medium): append with the SAME compress setting used
    to truncate the first dataset's part files (pid-only names +
    'wb').  Per-call token names make the two writes disjoint: both
    datasets must survive a same-suffix append round-trip, and no
    hidden temp files may remain after the commit renames."""
    import os

    from xpysom_dask_spark.sources.warc import read_warc, write_warc

    a = spark.createDataFrame(
        [(f"http://a.example/{i}", f"first {i}".encode(),
          f"<urn:a:{i}>") for i in range(12)],
        "target_uri string, payload binary, rid string").repartition(3)
    b = spark.createDataFrame(
        [(f"http://b.example/{i}", f"second {i}".encode(),
          f"<urn:b:{i}>") for i in range(7)],
        "target_uri string, payload binary, rid string").repartition(3)
    out = str(tmp_path / "crawl")
    man_a = write_warc(a, out, record_id_col="rid")
    man_b = write_warc(b, out, record_id_col="rid", mode="append")
    assert sum(r["n_records"] for r in man_a) == 12
    assert sum(r["n_records"] for r in man_b) == 7
    # disjoint files, nothing truncated
    assert not {r["file"] for r in man_a} & {r["file"] for r in man_b}
    got = {r["record_id"]: bytes(r["payload"])
           for r in read_warc(spark, out).collect()}
    assert len(got) == 19
    assert got["<urn:a:3>"] == b"first 3"
    assert got["<urn:b:3>"] == b"second 3"
    # task-commit protocol: no in-progress temp files left behind
    assert not [f for f in os.listdir(out) if f.startswith(".")]
    # overwrite still wipes every same-suffix segment, both tokens
    man_c = write_warc(b, out, record_id_col="rid")
    assert read_warc(spark, out).count() == 7, man_c
