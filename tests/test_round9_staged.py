"""Round-9 STAGED gate queries vs their oracles at sf0.001 — the
promotion queue awaiting a head-50 slot at the round-9 rotation
(queries_round9_staged / oracle_sql_round9_staged; SURVEY.md §8).
Same comparison as test_oracle_parity."""

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

STAGED = entrymod.queries_round9_staged()
# SF_TINY: the unigram_segments oracle is data-dependent (vocabulary
# re-learned from the corpus it runs against — the bpe_subwords idiom)
ORACLES = entrymod.oracle_sql_round9_staged(SF_TINY)


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
    # staged names must not collide with declared queries
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


def test_cms_gate_never_underestimates(spark):
    """The sketch's defining guarantee must hold in the gate output:
    est >= exact for every reported term."""
    rows = STAGED["cms_top_terms"](spark, SF_TINY).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["est"] >= r["exact"], r


def test_hll_gate_close_to_exact_distinct(spark):
    """HLL p=9 has ~4.6% standard error; the gate estimate must land
    within 4 sigma of the true distinct user count."""
    import duckdb as dk

    row = STAGED["hll_distinct"](spark, SF_TINY).collect()[0]
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
