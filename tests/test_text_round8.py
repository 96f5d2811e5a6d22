"""Round-8 text operators: readability, Naive Bayes, Jaccard top-k,
RRF fusion — vs independent Python references."""

import math
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators import text as T


def _ref_readability(text):
    words = [w for w in re.split(r"\s+", text) if w]
    nw = len(words)
    if nw == 0:
        return (0, 0, 0, None, None)
    ns = max(len(re.findall(r"[.!?]+", text)), 1)
    nsyl = max(len(re.findall(r"[aeiouy]+", text.lower())), nw)
    wps, spw = nw / ns, nsyl / nw
    fl = 206.835 - 1.015 * wps - 84.6 * spw
    fk = 0.39 * wps + 11.8 * spw - 15.59
    return (ns, nw, nsyl, math.floor(fl * 1e6 + 0.5),
            math.floor(fk * 1e6 + 0.5))


def test_readability_matches_reference(spark):
    rows = [
        (1, "The cat sat on the mat. It purred! Was it happy?"),
        (2, "Incomprehensibility notwithstanding, "
            "abstraction proliferates."),
        (3, "no punctuation here at all"),
        (4, ""),
        (5, "   "),
        (6, "xyzzy qwrt brr"),          # consonant-only: syl == words
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["id"]: (r["n_sentences"], r["n_words"], r["n_syllables"],
                     r["flesch_e6"], r["fkgl_e6"])
           for r in T.readability_scores(df, "text", "doc_id")
           .collect()}
    for i, txt in rows:
        assert got[i] == _ref_readability(txt), (i, txt)


def _ref_nb(rows, alpha=1):
    import collections
    cls_tf = collections.Counter()
    cls_tot = collections.Counter()
    vocab = set()
    n_docs = len(rows)
    n_l = collections.Counter()
    for _i, lab, txt in rows:
        n_l[lab] += 1
        for t in txt.split():
            cls_tf[(lab, t)] += 1
            cls_tot[lab] += 1
            vocab.add(t)
    V = len(vocab)
    labels = sorted(n_l)
    out = {}
    for i, lab, txt in rows:
        toks = [t for t in txt.split() if t in vocab]
        best = None
        for cl in labels:
            s = math.floor(math.log(n_l[cl] / n_docs) * 1e6 + 0.5)
            tf = collections.Counter(toks)
            for t, f in tf.items():
                lnp = math.floor(math.log(
                    (cls_tf[(cl, t)] + alpha)
                    / (cls_tot[cl] + alpha * V)) * 1e6 + 0.5)
                s += f * lnp
            if best is None or s > best[1]:
                best = (cl, s)
        out[i] = best
    return out


def test_nb_classify_matches_reference(spark):
    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog ate the bone"),
        (3, "de", "der hund frisst den knochen"),
        (4, "de", "die katze sitzt auf der matte"),
        (5, "en", "cat and dog play"),
        (6, "de", "der hund und die katze"),
        (7, "en", "der the cat"),          # mixed: exercises ties
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, "
                                     "text string")
    got = {r["id"]: (r["pred"], r["score_e6"], r["label"]) for r in
           T.nb_classify(df, "text", "doc_id", "lang").collect()}
    ref = _ref_nb(rows)
    assert set(got) == set(ref)
    for i, lab, _txt in rows:
        assert got[i][0] == ref[i][0], i
        assert got[i][1] == ref[i][1], i
        assert got[i][2] == lab
    with pytest.raises(ValueError, match="alpha"):
        T.nb_classify(df, "text", "doc_id", "lang", alpha=0)


def test_jaccard_topk_exact(spark):
    docs = [(1, "a b c d"), (2, "a b x y"), (3, "p q r"),
            (4, "a b c d e f")]
    qs = [(100, "a b c")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    qdf = spark.createDataFrame(qs, "qid bigint, qtext string")
    got = [(r["rank"], r["doc_id"], r["jaccard_e6"]) for r in
           T.jaccard_topk(df, "text", "doc_id", qdf, "qtext", "qid",
                          k=10).orderBy("rank").collect()]
    # J(q,1)=3/4, J(q,2)=2/5, J(q,4)=3/6, J(q,3)=0 (not a candidate)
    assert got == [(1, 1, 750000), (2, 4, 500000), (3, 2, 400000)]


def test_rankers_shared_doc_terms_bit_identical(spark):
    """bm25_topk/jaccard_topk fed a shared doc_term_counts relation
    must equal their self-tokenizing paths bit-for-bit (the round-10
    hybrid refactor: tokenize the corpus ONCE per query batch)."""
    docs = [(1, "a b c d"), (2, "a b x y"), (3, "p q r"),
            (4, "a b c d e f"), (5, "a a a b")]
    qs = [(100, "a b c"), (101, "x y q")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    qdf = spark.createDataFrame(qs, "qid bigint, qtext string")
    dt = T.doc_term_counts(df, "text", "doc_id").persist()
    try:
        for fn, kw in ((T.bm25_topk, dict(k=5)),
                       (T.jaccard_topk, dict(k=5))):
            solo = sorted(map(tuple, fn(
                df, "text", "doc_id", qdf, "qtext", "qid",
                **kw).collect()))
            shared = sorted(map(tuple, fn(
                df, "text", "doc_id", qdf, "qtext", "qid",
                doc_terms=dt, **kw).collect()))
            assert solo == shared and solo
    finally:
        dt.unpersist()


def test_rrf_fuse_matches_reference(spark):
    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id bigint, doc_id bigint, rank int")
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id bigint, doc_id bigint, rank int")
    got = [(r["rank"], r["doc_id"], r["rrf_e9"]) for r in
           T.rrf_fuse([r1, r2], k=10).orderBy("rank").collect()]

    def s(rank):
        return 10**9 // (60 + rank)
    exp = sorted([(10, s(1)), (11, s(2) + s(1)), (12, s(3)),
                  (13, s(2))], key=lambda t: (-t[1], t[0]))
    assert got == [(i + 1, d, v) for i, (d, v) in enumerate(exp)]
    with pytest.raises(ValueError, match="at least one"):
        T.rrf_fuse([])


def test_textrank_keywords_matches_reference(spark):
    docs = [(1, "spark shuffles data fast"),
            (2, "spark joins data"),
            (3, "fast joins win"),
            (4, "solo"),
            (5, "dup dup dup")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = [(r["rank"], r["term"], r["rank_e6"]) for r in
           T.textrank_keywords(df, "text", top_k=10).collect()]

    # reference: undirected dedup'd adjacent pairs -> integer pagerank
    pairs = set()
    for _i, txt in docs:
        ts = txt.split()
        for a, b in zip(ts, ts[1:]):
            if a != b:
                pairs.add((min(a, b), max(a, b)))
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    verts = sorted({v for e in edges for v in e})
    out = {}
    for s, _t in edges:
        out[s] = out.get(s, 0) + 1
    ranks = {v: 10**6 for v in verts}
    for _ in range(5):
        inbound = {v: 0 for v in verts}
        for s, t in edges:
            inbound[t] += ranks[s] // out[s]
        ranks = {v: 150000 + (850000 * inbound[v]) // 10**6
                 for v in verts}
    exp = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(i + 1, t, v) for i, (t, v) in enumerate(exp)]
    # 'dup dup dup' contributes no edge (self-pairs dropped); 'solo'
    # has no adjacency at all — neither may appear
    terms = {t for _r, t, _v in got}
    assert "solo" not in terms and "dup" not in terms


def test_label_purity_exact(spark):
    from xpysom_dask_spark.operators.similarity import label_purity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1), (2, 3), (3, 1), (3, 4), (4, 3)],
        "vec_id bigint, neighbor_id bigint")
    labels = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)],
        "vec_id bigint, label int")
    got = {r["vec_id"]: (r["label"], r["n_neighbors"], r["n_same"],
                         r["purity_e6"])
           for r in label_purity(edges, labels).collect()}
    assert got[1] == (10, 2, 2, 1000000)
    assert got[2] == (10, 2, 2, 1000000)
    assert got[3] == (10, 2, 1, 500000)      # nbrs 1 (same), 4 (diff)
    assert got[4] == (20, 1, 0, 0)


def test_dsir_fold_bigrams_same_feature_counts(spark):
    """VERDICT r8 #6 cost probe: fold_bigrams derives the bigram
    bucket from the two unigram hashes (one md5 per token instead of
    two).  It is a different hash family member, so BUCKETS differ,
    but per-document feature COUNTS are identical and the selection
    property (target-like docs score higher) must hold in both
    configurations."""
    from xpysom_dask_spark.operators import text as T

    rows = [(0, "alpha beta gamma alpha"),
            (1, "alpha beta"),
            (2, "delta epsilon zeta eta theta"),
            (3, "beta gamma"),
            (4, "gamma alpha beta gamma alpha")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    target = df.where("doc_id IN (0, 4)")
    a = {r["id"]: r for r in T.dsir_importance(
        df, target, "text", "doc_id", n_buckets=512).collect()}
    b = {r["id"]: r for r in T.dsir_importance(
        df, target, "text", "doc_id", n_buckets=512,
        fold_bigrams=True).collect()}
    assert set(a) == set(b) == {0, 1, 2, 3, 4}
    for i in a:
        # n_feats = unigrams + bigrams regardless of hash path
        assert a[i]["n_feats"] == b[i]["n_feats"]
    for got in (a, b):
        # the target-like docs outscore the unrelated doc per feature
        assert (got[0]["logw_e6"] / got[0]["n_feats"]
                > got[2]["logw_e6"] / got[2]["n_feats"])
        assert (got[4]["logw_e6"] / got[4]["n_feats"]
                > got[2]["logw_e6"] / got[2]["n_feats"])


def test_encoding_signals_detect_mojibake(spark):
    """The encoding-artifact leg of the quality family: U+FFFD and C0
    controls counted exactly, ASCII ratio floor-e6 — clean ASCII scores
    1e6 / 0 / 0, and each artifact class is seen."""
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators.text import encoding_signals

    rows = [
        (0, "clean ascii text, with punctuation! and digits 123"),
        (1, "broken �� decode � here"),
        (2, "binary\x00junk\x1f inside\x07text"),
        (3, "café naïve résumé"),   # non-ASCII, valid
        (4, "tabs\tand\nnewlines\rare fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    enc = encoding_signals("text")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", enc["n_replacement"].alias("nr"),
        enc["n_control"].alias("nc"),
        enc["ascii_e6"].alias("ae")).collect()}
    assert got[0]["nr"] == 0 and got[0]["nc"] == 0
    assert got[0]["ae"] == 1_000_000
    assert got[1]["nr"] == 3 and got[1]["nc"] == 0
    assert got[2]["nc"] == 3 and got[2]["nr"] == 0
    assert got[3]["nr"] == 0 and got[3]["nc"] == 0
    n3 = len(rows[3][1])
    a3 = sum(1 for ch in rows[3][1] if 0x20 <= ord(ch) <= 0x7E)
    assert got[3]["ae"] == int(a3 / n3 * 1e6 + 0.5)
    assert got[4]["nc"] == 0 and got[4]["ae"] == 1_000_000


_HTML_DOC = """<!DOCTYPE html><html><head>
<style>body { color: red; }</style>
<script type="text/javascript">var x = "<p>not text</p>";</script>
<title>Title text</title></head>
<body>
<!-- a comment with <b>markup</b> inside -->
<h1>Heading &amp; subtext</h1>
<p>First paragraph with <b>bold</b> and a &lt;tag&gt; literal.</p>
<p>Second   paragraph&nbsp;with entities: &quot;q&quot; &#39;a&#39;
&#60;x&#62; &#x3c;y&#x3e; and double-encoded &amp;lt;kept&amp;gt;.</p>
<ul><li>item one</li><li>item &#38;amp; two</li></ul>
<div>tail<br>break</div>
</body></html>"""


def _py_strip_html_jvm_contract(s):
    """Pure-Python replay of strip_html's exact pipeline (same regexes,
    same entity subset, same ordering)."""
    import re

    s = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</(script|style)\s*>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre)"
               r"\s*>", "\n", s)
    s = re.sub(r"(?i)<br\s*/?>", "\n", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    for code, rep in ((34, '"'), (39, "'"), (60, "<"), (62, ">"),
                      (160, " ")):
        s = re.sub(f"(?i)&#(0*{code}|x0*{code:x});", rep, s)
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'")):
        s = s.replace(ent, rep)
    s = re.sub(r"(?i)&(amp;|#0*38;|#x0*26;)", "&", s)
    s = re.sub(r"[ \t\x0b\f\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def test_strip_html_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from xpysom_dask_spark.operators.text import strip_html

    rows = [(0, _HTML_DOC),
            (1, "plain text, no markup at all"),
            (2, "<p>a</p><p>b</p><p>c</p>"),
            (3, "double &amp;lt;enc&amp;gt; and &#38;lt;numeric&#38;gt;"),
            (4, "<SCRIPT>alert('x')</SCRIPT>visible<BR/>line"),
            (5, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, html string")
    got = {r["doc_id"]: r["t"] for r in
           df.select("doc_id", strip_html("html").alias("t")).collect()}
    for i, h in rows:
        assert got[i] == _py_strip_html_jvm_contract(h), i
    # structural guarantees worth pinning explicitly
    assert "not text" not in got[0] and "color: red" not in got[0]
    assert "a comment" not in got[0]
    assert "Heading & subtext" in got[0]
    assert '"q" \'a\'\n<x> <y>' in got[0]
    assert "double-encoded &lt;kept&gt;" in got[0]
    assert "item &amp; two" in got[0]           # &#38;amp; single-pass
    assert got[2] == "a\nb\nc"
    assert got[4] == "visible\nline"
    assert got[5] == ""


def test_html_to_text_full_entities_long_tail(spark):
    """full_entities=True decodes the named long tail the JVM path
    deliberately leaves literal, via html.unescape in an Arrow
    kernel; other columns pass through and the schema is declared."""
    import html as _html

    from xpysom_dask_spark.operators.text import html_to_text

    rows = [(0, "caf&eacute; &hellip; &euro;42 <b>x</b>", "k0"),
            (1, _HTML_DOC, "k1")]
    df = spark.createDataFrame(rows, "doc_id bigint, html string, k string")
    out = {r["doc_id"]: r for r in
           html_to_text(df, "html", full_entities=True).collect()}
    # whitespace collapsed like the JVM path after tag removal
    assert out[0]["text"] == _html.unescape(
        "caf&eacute; &hellip; &euro;42 x").strip()
    assert out[0]["k"] == "k0"
    assert "Heading & subtext" in out[1]["text"]
    # the full path DOES resolve double-encoding one level, like
    # unescape itself: &amp;lt; -> &lt;
    assert "&lt;kept&gt;" in out[1]["text"]


def test_extract_urls_and_domain_counts(spark):
    from xpysom_dask_spark.operators.text import (domain_counts,
                                                  extract_urls)

    rows = [
        (1, "see https://Example.com/a?b=1 and http://sub.example.com/x."),
        (2, "mirror at https://news.bbc.co.uk:8080/story, plus "
            "(https://example.com/b) done"),
        (3, "no links here"),
        (4, "bare http://localhost:9000/health and https://a.b.co.jp/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [(r["id"], r["url"], r["host"], r["domain"])
           for r in extract_urls(df, "text", "doc_id")
           .orderBy("id", "url").collect()]
    assert (1, "https://Example.com/a?b=1", "example.com",
            "example.com") in got
    # trailing sentence punctuation stays OUT of the match (one page
    # cited mid-sentence vs end-of-clause must yield ONE url key)
    assert (1, "http://sub.example.com/x", "sub.example.com",
            "example.com") in got
    assert any(u == "https://news.bbc.co.uk:8080/story"
               for _i, u, _h, _d in got)
    # two-level public suffix keeps three labels; port stripped
    assert any(h == "news.bbc.co.uk" and d == "bbc.co.uk"
               for _i, _u, h, d in got)
    # closing paren excluded from the match
    assert any(u == "https://example.com/b" for _i, u, _h, _d in got)
    assert any(h == "a.b.co.jp" and d == "b.co.jp"
               for _i, _u, h, d in got)
    assert not any(i == 3 for i, _u, _h, _d in got)

    dc = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in
          domain_counts(df, "text", "doc_id").collect()}
    assert dc["example.com"] == (3, 2)
    assert dc["bbc.co.uk"] == (1, 1)
