#!/usr/bin/env python
"""Crawl front door, end to end: WARC segments → typed records →
http-payload text → JVM-side HTML extraction → URL canonicalization →
exact dedup on the canonical key → hashed-classifier quality scores.

The 100 TB shape at every stage: parallelism = WARC segment files
(how crawls ship), header fields are Catalyst-filterable columns, the
payload stays executor-side binary until decoded, HTML → text is one
whole-stage-codegen expression, and the classifier is a narrow
broadcast-weights scan.

Run:  python examples/crawl_ingest.py
(self-contained — synthesizes a two-segment mini-crawl in /tmp)
"""

import gzip
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import dedup  # noqa: E402
from xpysom_dask_spark.operators import models  # noqa: E402
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources.warc import payload_text, read_warc  # noqa: E402


def _record(uri, html):
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    head = ("WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{abs(hash(uri))}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-08-16T00:00:00Z\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body + b"\r\n\r\n"


def _mk_crawl(d):
    page = (b"<html><head><title>T</title><style>x{}</style></head>"
            b"<body><h1>Spark engines</h1><p>Declarative plans let the "
            b"optimizer pick the physical strategy.</p></body></html>")
    spam = (b"<html><body>click here buy now free offer limited deal "
            b"click here buy now</body></html>")
    seg0 = b"".join(_record(u, page) for u in (
        "http://www.site.com:80/a/?utm_source=f",   # dup of /a below
        "http://site.com/a",
        "http://site.com/b"))
    with open(os.path.join(d, "seg0.warc"), "wb") as fh:
        fh.write(seg0)
    seg1 = b"".join(gzip.compress(_record(f"http://junk.example/{i}",
                                          spam)) for i in range(3))
    with open(os.path.join(d, "seg1.warc.gz"), "wb") as fh:
        fh.write(seg1)


def main() -> None:
    spark = make_session("crawl-ingest", master="local[4]",
                         shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="mini_crawl_")
    _mk_crawl(d)

    print("== WARC ingest (2 segments, plain + gz) ==")
    recs = read_warc(spark, d).where("warc_type = 'response'")
    recs.select("file", "target_uri", "content_length").show(truncate=46)

    print("== payload -> text -> canonical URL ==")
    docs = (payload_text(recs)
            .withColumn("text", T.strip_html("text"))
            .withColumn("url", T.canonicalize_url("target_uri"))
            .select("url", "text"))
    docs.show(truncate=52)

    print("== exact dedup on the canonical key ==")
    kept = dedup.dedup_exact(docs.withColumn("doc_id", F.xxhash64("url")),
                             "url", "doc_id")
    print(f"{docs.count()} fetched -> {kept.count()} unique resources")

    print("== quality scores (hashed classifier, tiny pinned model) ==")
    w = models.logreg_fit_hashed(
        docs.withColumn("doc_id", F.xxhash64("url"))
            .withColumn("y", (~F.col("url").contains("junk")).cast("int")),
        "text", "doc_id", "y", n_buckets=256, n_iter=8)
    scored = models.logreg_score_hashed(
        docs.withColumn("doc_id", F.xxhash64("url")), "text",
        "doc_id", w)
    scored.orderBy("quality_p").show(truncate=40)

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
