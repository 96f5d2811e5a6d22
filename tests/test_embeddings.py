"""Embedding-column operators: int8 quantization round-trip bounds,
normalization, per-label centroid geometry, and the supporting text/
sampling/JSON operators added alongside them (PII redaction, importance
sampling, deterministic shuffle, props parsing)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_TINY

from xpysom_dask_spark.operators import embeddings as emb_ops
from xpysom_dask_spark.operators import events as ev_ops
from xpysom_dask_spark.operators import sampling
from xpysom_dask_spark.operators import text as text_ops
from xpysom_dask_spark.sources import readers


@pytest.fixture(scope="module")
def emb(spark):
    df = readers.load_table(spark, SF_TINY, "embeddings").persist()
    df.count()
    yield df
    df.unpersist()


def test_quantize_int8_roundtrip_bounds(spark, emb):
    q = emb_ops.quantization_error(emb_ops.quantize_int8(emb))
    rows = q.select("embedding", "scale", "qvec", "max_abs_err").collect()
    assert rows
    for r in rows:
        v = np.asarray(r["embedding"], np.float64)
        qv = np.asarray(r["qvec"], np.int64)
        assert qv.min() >= -127 and qv.max() <= 127
        # reconstruction error bounded by scale/2 (round-half-up rule)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        np.testing.assert_allclose(qv * r["scale"], v,
                                   atol=r["scale"] / 2 + 1e-12)


def test_quantize_zero_vector_safe(spark):
    df = spark.createDataFrame([(1, [0.0] * 4)], "id long, embedding array<float>")
    r = emb_ops.quantize_int8(df).collect()[0]
    assert r["scale"] == 1.0
    assert list(r["qvec"]) == [0, 0, 0, 0]


def test_dequantize_inverse(spark, emb):
    q = emb_ops.dequantize_int8(emb_ops.quantize_int8(emb))
    r = q.select("embedding", "vec", "scale").first()
    v = np.asarray(r["embedding"], np.float64)
    np.testing.assert_allclose(np.asarray(r["vec"]), v,
                               atol=r["scale"] / 2 + 1e-12)


def test_l2_normalize_unit_norm(spark, emb):
    u = emb_ops.l2_normalize(emb)
    norms = u.select(F.expr(
        "sqrt(aggregate(transform(unit_vec, v -> v * v), 0D, "
        "(acc, v) -> acc + v))").alias("n")).collect()
    assert all(abs(r["n"] - 1.0) < 1e-9 for r in norms)


def test_label_centroids_shape_and_range(spark, emb):
    out = emb_ops.label_centroids(emb).collect()
    n_labels = emb.select("label").distinct().count()
    assert len(out) == n_labels
    total = sum(r["n_members"] for r in out)
    assert total == emb.count()
    for r in out:
        assert -1.0 <= r["avg_cos"] <= 1.0
        assert r["centroid_norm"] >= 0


def test_props_field_stats_counts(spark):
    events = readers.load_table(spark, SF_TINY, "events")
    out = ev_ops.props_field_stats(events).collect()
    assert sum(r["n_events"] for r in out) == events.count()
    for r in out:
        assert r["min_val"] <= r["avg_val"] <= r["max_val"]


def test_parse_props_typed(spark):
    events = readers.load_table(spark, SF_TINY, "events")
    out = ev_ops.parse_props(events, "k")
    assert dict(out.dtypes)["k"] == "bigint"
    assert out.where("k IS NOT NULL").count() > 0


def test_importance_sample_tilts_toward_weight(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    kept = sampling.importance_sample(docs, "doc_id", "n_chars", 0.4)
    # kept set is deterministic
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in sampling.importance_sample(
        docs, "doc_id", "n_chars", 0.4).collect())
    assert a == b
    # mean weight of the kept set exceeds the corpus mean (the tilt)
    mw_all = docs.agg(F.avg("n_chars")).first()[0]
    mw_kept = kept.agg(F.avg("n_chars")).first()[0]
    assert mw_kept > mw_all


def test_importance_sample_fraction_expectation(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    n = docs.count()
    k = sampling.importance_sample(docs, "doc_id", "n_chars", 0.5).count()
    assert 0.3 * n < k < 0.7 * n


def test_deterministic_shuffle_is_total_permutation(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    sh = sampling.deterministic_shuffle(docs, "doc_id", seed=3,
                                        num_partitions=4)
    rows = sh.select("doc_id", "shuffle_key").collect()
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # different seed -> different leading order
    head1 = [r["doc_id"] for r in sh.orderBy("shuffle_key", "doc_id")
             .limit(20).collect()]
    sh2 = sampling.deterministic_shuffle(docs, "doc_id", seed=4,
                                         num_partitions=4)
    head2 = [r["doc_id"] for r in sh2.orderBy("shuffle_key", "doc_id")
             .limit(20).collect()]
    assert head1 != head2
    # reading range partitions in index order IS the global order
    part_rows = sh.select(F.spark_partition_id().alias("p"),
                          "shuffle_key").collect()
    by_part = {}
    for r in part_rows:
        by_part.setdefault(r["p"], []).append(r["shuffle_key"])
    bounds = [(p, min(v), max(v)) for p, v in by_part.items()]
    bounds.sort()
    for (_, _, hi), (_, lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo


def test_redact_pii_fixture_strings(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c_9@sub.example.org now"),
         (2, "server at 192.168.0.255 port"),
         (3, "call +1 555-0100-99 today"),
         (4, "clean text, nothing here"),
         (5, "two mails x@y.io and z@w.ai")],
        "id long, t string")
    out = df.select("id", *text_ops.pii_counts("t"),
                    text_ops.redact_pii("t").alias("red")).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["n_email"] == 1 and "<EMAIL>" in by_id[1]["red"]
    assert "a.b-c_9" not in by_id[1]["red"]
    assert by_id[2]["n_ipv4"] == 1 and "<IP>" in by_id[2]["red"]
    assert by_id[3]["n_phone"] == 1 and "<PHONE>" in by_id[3]["red"]
    assert by_id[4]["n_email"] == by_id[4]["n_ipv4"] == by_id[4]["n_phone"] == 0
    assert by_id[4]["red"] == "clean text, nothing here"
    assert by_id[5]["n_email"] == 2 and by_id[5]["red"].count("<EMAIL>") == 2


def test_rollup_report_levels(spark):
    ev = readers.load_table(spark, SF_TINY, "events")
    out = ev_ops.rollup_report(ev)
    rows = out.collect()
    total = [r for r in rows if r["level"] == 3]
    assert len(total) == 1 and total[0]["n_events"] == ev.count()
    per_type = [r for r in rows if r["level"] == 1]
    assert sum(r["n_events"] for r in per_type) == ev.count()
    leaf = [r for r in rows if r["level"] == 0]
    assert sum(r["n_events"] for r in leaf) == ev.count()
    assert all(0 <= r["hour_of_day"] <= 23 for r in leaf)


def test_profile_columns_exact_and_approx(spark):
    from xpysom_dask_spark.operators import profile as prof_ops

    orders = readers.load_table(spark, SF_TINY, "orders")
    out = {r["column"]: r for r in prof_ops.profile_columns(
        orders, ["o_orderkey", "o_totalprice"]).collect()}
    n = orders.count()
    assert out["o_orderkey"]["n_rows"] == n
    assert out["o_orderkey"]["n_distinct"] == \
        orders.select("o_orderkey").distinct().count()
    assert out["o_totalprice"]["min_val"] <= out["o_totalprice"]["max_val"]
    # approx mode: same shape, cardinality within HLL tolerance
    ap = {r["column"]: r for r in prof_ops.profile_columns(
        orders, ["o_orderkey"], exact=False).collect()}
    exact_nd = out["o_orderkey"]["n_distinct"]
    assert abs(ap["o_orderkey"]["n_distinct"] - exact_nd) < 0.1 * exact_nd


def test_vocab_counts_min_count(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    v1 = {r["term"]: r["n"] for r in text_ops.vocab_counts(
        docs, "text", 1).collect()}
    v5 = {r["term"]: r["n"] for r in text_ops.vocab_counts(
        docs, "text", 5).collect()}
    assert set(v5) <= set(v1)
    assert all(n >= 5 for n in v5.values())
    assert sum(v1.values()) == docs.select(
        F.sum(text_ops.token_count("text"))).first()[0]


def test_unigram_logprob_orders_quality(spark):
    """A doc of corpus-common words must outscore a doc of hapaxes."""
    rows = [(1, "the the the and and of"), (2, "the and of to in a"),
            (3, "zzqx vvbnk wwrtpl"), (4, "the of and")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in text_ops.unigram_logprob_score(
        df, "text", "doc_id").collect()}
    assert out[3]["avg_logp"] < out[4]["avg_logp"]
    assert out[3]["avg_logp"] < out[1]["avg_logp"]
    assert out[1]["n_tok"] == 6


def test_cap_per_group_quota_and_determinism(spark):
    docs = readers.load_table(spark, SF_TINY, "documents")
    capped = sampling.cap_per_group(docs, "doc_id", "source", 3)
    per = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # groups smaller than the cap keep everything
    sizes = {r["source"]: r["count"] for r in
             docs.groupBy("source").count().collect()}
    kept = {r["source"]: r["count"] for r in per}
    for s, n in sizes.items():
        assert kept.get(s, 0) == min(n, 3)
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in sampling.cap_per_group(
        docs.repartition(13), "doc_id", "source", 3).collect())
    assert a == b


def test_moving_average_window_semantics(spark):
    rows = [(i, 7, 1_000_000_000 * i, float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")
    out = {r["event_id"]: r["ma"] for r in
           ev_ops.moving_average(df, n=3).collect()}
    assert out[1] == 1.0
    assert out[2] == 1.5
    assert out[3] == 2.0          # (1+2+3)/3
    assert out[6] == 5.0          # (4+5+6)/3


def test_pivot_counts_schema_and_totals(spark):
    ev = readers.load_table(spark, SF_TINY, "events")
    ev = ev.withColumn("hod", F.expr(
        "CAST((ts DIV 3600000000000) % 24 AS BIGINT)"))
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev_ops.pivot_counts(ev, "hod", "event_type", types)
    assert out.columns == ["hod"] + [f"n_{t}" for t in types]
    total = out.select(sum(F.col(f"n_{t}") for t in types)
                       .alias("s")).agg(F.sum("s")).first()[0]
    assert total == ev.count()


def test_cap_per_group_hot_path_exact(spark):
    """The two-phase skew plan returns EXACTLY the single-window
    answer, including for a pathological hot group."""
    rows = [(i, "hot" if i < 5000 else f"g{i % 7}") for i in range(5600)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    base = sorted((r["source"], r["doc_id"]) for r in
                  sampling.cap_per_group(df, "doc_id", "source", 20)
                  .collect())
    two = sorted((r["source"], r["doc_id"]) for r in
                 sampling.cap_per_group(df, "doc_id", "source", 20,
                                        hot_threshold=200).collect())
    assert base == two
    per = {}
    for s, _ in two:
        per[s] = per.get(s, 0) + 1
    assert per["hot"] == 20


def test_cap_per_group_hot_list_bound(spark):
    rows = [(i, f"g{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hot_threshold"):
        # every group is "hot" at threshold 0 (clamped to max_rows=1)
        # with max_hot_groups tiny
        sampling.cap_per_group(
            spark.createDataFrame(
                [(i, f"g{i % 40}") for i in range(400)],
                "doc_id long, source string"),
            "doc_id", "source", 1, hot_threshold=1, max_hot_groups=5)


def test_encode_token_ids_roundtrip(spark):
    """ids decode back to the original token stream via the vocab."""
    docs = readers.load_table(spark, SF_TINY, "documents").limit(50)
    enc = {r["id"]: list(r["ids"]) for r in
           text_ops.encode_token_ids(docs, "text", "doc_id").collect()}
    vocab = text_ops.vocab_counts(docs.limit(50), "text", 1)
    # rebuild the rank table driver-side
    ranked = sorted(((r["term"], r["n"]) for r in vocab.collect()),
                    key=lambda t: (-t[1], t[0]))
    id2term = {i + 1: t for i, (t, _) in enumerate(ranked)}
    raw = {r["doc_id"]: r["text"].lower().split() for r in docs.collect()}
    for did, ids in enc.items():
        assert [id2term[i] for i in ids] == raw[did]


def test_dedup_spans_removes_later_copies(spark):
    from xpysom_dask_spark.operators import dedup

    rows = [(1, "a b c d e f g h"),
            (2, "a b c d x y z w"),
            (3, "x y z w e f g h"),
            (4, "fresh text only here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in dedup.dedup_spans(
        df, "text", "doc_id", span_tokens=4).collect()}
    assert out[1]["text_clean"] == "a b c d e f g h"
    assert out[2]["text_clean"] == "x y z w"
    assert out[3]["text_clean"] == "" and out[3]["n_kept"] == 0
    assert out[4]["text_clean"] == "fresh text only here ok"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
