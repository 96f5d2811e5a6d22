"""Round-11 PRE-STAGED gate queries vs their oracles at sf0.001
(queries_round11_staged / oracle_sql_round11_staged; SURVEY.md §8 —
rationed additions: the declared surface sits at 190 of the 200-slot
staleness cap after the round-10 promotions + merges, so new entries
should ride a merge that frees their slot).  The PREVIOUS round-11
queue (kn_bigram_score, streaming_psi) was promoted in round 10; its
invariant tests below now read the promoted entries from queries()."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

from conftest import SF_TINY

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

STAGED = entrymod.queries_round11_staged()
ORACLES = entrymod.oracle_sql_round11_staged(SF_TINY)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_every_staged_query_has_an_oracle():
    assert set(STAGED) == set(ORACLES)
    assert not set(STAGED) & set(entrymod.queries())


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_staged_query_matches_oracle(spark, name):
    sdf = STAGED[name](spark, SF_TINY)
    srows = sdf.collect()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_TINY}/{t}.parquet')")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _multiset(sdf.columns, [tuple(r) for r in srows]) == \
        _multiset(dcols, drows)


def test_kn_scores_are_log_probabilities(spark):
    """Every per-doc sum is a sum of logs of probabilities < 1, so
    sum_e6 <= 0; n_bigrams is exactly token_count - 1."""
    rows = entrymod.queries()["kn_bigram_score"](spark, SF_TINY).collect()
    assert rows and all(r["sum_e6"] <= 0 for r in rows)
    con = duckdb.connect()
    ntk = dict(con.execute(
        f"SELECT doc_id, len(list_filter(string_split_regex("
        f"lower(text), '\\s+'), x -> x <> '')) FROM read_parquet("
        f"'{SF_TINY}/documents.parquet')").fetchall())
    con.close()
    for r in rows:
        assert r["n_bigrams"] == ntk[r["id"]] - 1


def test_kn_continuation_counts_beat_raw_frequency(spark):
    """The 'francisco' property: a word frequent in ONE context gets
    a lower continuation weight than an equally frequent word with
    DIVERSE contexts — the whole point of KN over backoff/add-1."""
    from xpysom_dask_spark.operators.text import kneser_ney_bigram_score

    lm_rows = [(i, "a francisco") for i in range(10)] + \
        [(100, "b cat"), (101, "c cat"), (102, "d cat")]
    score_rows = [(200, "zz francisco"), (201, "zz cat")]
    lm = spark.createDataFrame(lm_rows, ["doc_id", "text"])
    sc = spark.createDataFrame(score_rows, ["doc_id", "text"])
    got = {r["id"]: r["sum_e6"] for r in kneser_ney_bigram_score(
        sc, "text", "doc_id", lm_df=lm).collect()}
    # 'zz' is an unseen context for both, so only the continuation
    # model votes: francisco (1 context, count 10) < cat (3 contexts)
    assert got[200] < got[201]


def test_streaming_psi_equals_batch_psi_drift(spark):
    """The drained streaming monitor (spine-completed + shared term
    arithmetic) must equal batch psi_drift row-for-row — the
    streaming_qhist twin contract."""
    from xpysom_dask_spark.operators.profile import psi_drift
    from xpysom_dask_spark.sources import readers

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = readers.load_table(spark, SF_TINY, "events")
    batch = psi_drift(ev.where("event_id % 2 = 0"),
                      ev.where("event_id % 2 = 1"), "value",
                      lo=entrymod._PSI_LO, hi=entrymod._PSI_HI,
                      bins=entrymod._PSI_BINS)
    brows = sorted(tuple(r) for r in batch.collect())
    srows = sorted(tuple(r) for r in
                   entrymod.queries()["streaming_psi"](spark, SF_TINY).collect())
    assert srows == brows and len(srows) == entrymod._PSI_BINS


@pytest.mark.parametrize("seed", [2, 13])
def test_kn_random_vs_python_reference(spark, seed):
    """Random corpora vs a pure-Python replay of the exact-integer
    KN definition (including the ln(num)-ln(den) op order the engine
    uses), held-out configuration."""
    import math
    import random

    from collections import Counter

    from xpysom_dask_spark.operators.text import kneser_ney_bigram_score

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(12)]
    rows = [(i, " ".join(rng.choices(words, k=rng.randint(0, 9))))
            for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lm_rows = [r for r in rows if r[0] % 2 == 0]
    got = {r["id"]: (r["n_bigrams"], r["sum_e6"])
           for r in kneser_ney_bigram_score(
               df, "text", "doc_id",
               lm_df=df.where("doc_id % 2 = 0")).collect()}

    nxy = Counter()
    for _, t in lm_rows:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            nxy[(a, b)] += 1
    c1, n1p, nc = Counter(), Counter(), Counter()
    for (a, b), n in nxy.items():
        c1[a] += n
        n1p[a] += 1
        nc[b] += 1
    tv = (len(nxy)
          + len({w for _, t in lm_rows for w in t.split()})) or 1
    exp = {}
    for i, t in rows:
        ws = t.split()
        if len(ws) < 2:
            continue
        s = 0
        for a, b in zip(ws, ws[1:]):
            if a in c1:
                n12 = nxy.get((a, b), 0)
                if n12 > 0:
                    num = (4 * n12 - 3) * tv \
                        + 3 * n1p[a] * (nc.get(b, 0) + 1)
                else:
                    num = 3 * n1p[a] * (nc.get(b, 0) + 1)
                den = 4 * c1[a] * tv
            else:
                num, den = nc.get(b, 0) + 1, tv
            s += math.floor((math.log(num) - math.log(den)) * 1e6
                            + 0.5)
        exp[i] = (len(ws) - 1, s)
    assert got == exp and len(exp) > 10
