"""Round-9 promoted gate queries vs their oracles at sf0.001 — same
comparison as test_oracle_parity, for the 11 entries promoted from the
round-8 staging area into the graded head-50 (SURVEY.md §8)."""

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

# hll_distinct + hll_by_type were merged into the round-10 hll_report
# gate (grouped registers + register-MAX rollup under 'ALL')
PROMOTED = ("cms_top_terms", "text_readability", "nb_lang",
            "hybrid_rrf", "pagerank_hubs", "streaming_cms",
            "knn_label_purity", "textrank_keywords",
            "unigram_segments")

STAGED = {k: v for k, v in entrymod.queries().items() if k in PROMOTED}
# SF_TINY: the unigram_segments oracle is data-dependent (vocabulary
# re-learned from the corpus it runs against — the bpe_subwords idiom)
ORACLES = {k: v for k, v in entrymod.oracle_sql(SF_TINY).items()
           if k in PROMOTED}


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def test_promoted_queries_head_until_green():
    # the driver checks queries()[:50]; a promoted entry must keep a
    # head slot until it has a fully GREEN archived row (rows AND
    # schema AND hash) — afterwards the rotation may move it out
    import glob

    from tools.rotate_gate import latest_green_rounds

    assert set(ORACLES) == set(STAGED) == set(PROMOTED)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = latest_green_rounds(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    names = list(entrymod.queries())
    for name in PROMOTED:
        if greens.get(name) is None:
            assert names.index(name) < 50, \
                f"{name} has no green row yet but sits outside the head"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_promoted_query_matches_oracle(spark, name):
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


def test_cms_gate_never_underestimates(spark):
    """The sketch's defining guarantee must hold in the gate output:
    est >= exact for every reported term."""
    rows = STAGED["cms_top_terms"](spark, SF_TINY).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est"] >= r["exact"], r


def test_hll_gate_close_to_exact_distinct(spark):
    """HLL p=9 has ~4.6% standard error; the gate estimate must land
    within 4 sigma of the true distinct user count (the merged
    hll_report gate's 'ALL' rollup row)."""
    import duckdb as dk

    row = [r for r in
           entrymod.queries()["hll_report"](spark, SF_TINY).collect()
           if r["event_type"] == "ALL"][0]
    con = dk.connect()
    exact = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"read_parquet('{SF_TINY}/events.parquet')").fetchone()[0]
    con.close()
    tol = 4 * 1.04 / math.sqrt(row["m"])
    assert abs(row["est"] - exact) <= max(tol * exact, 8), \
        (row["est"], exact)


def test_hybrid_rrf_structure(spark):
    """Fusion-score invariants that hold regardless of corpus quirks
    (the 31-term synthetic vocab makes semantic claims like
    self-retrieval-at-1 false: dozens of docs share a query's entire
    token set): ranks are dense 1..n<=10 per query, scores
    non-increasing, and every score is a possible sum of one or two
    1e9 div (60+rank) contributions with rank in [1, 20]."""
    rows = STAGED["hybrid_rrf"](spark, SF_TINY).collect()
    singles = {10**9 // (60 + r) for r in range(1, 21)}
    possible = singles | {a + b for a in singles for b in singles}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["rrf_e9"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s in possible for s in scores), (q, scores)


def test_pagerank_gate_mass_and_floor(spark):
    """Every vertex keeps >= the (1-d) base mass, and total mass stays
    <= V * scale (mass only leaks through integer floors and
    dangling-free this graph is k-out-regular)."""
    rows = STAGED["pagerank_hubs"](spark, SF_TINY).collect()
    assert len(rows) > 0
    assert all(r["rank_e6"] >= 150000 for r in rows)
    assert sum(r["rank_e6"] for r in rows) <= len(rows) * 1_000_000
