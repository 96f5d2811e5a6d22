"""Differential tests for ``dedup.repeated_substring_spans`` against a
generalized SUFFIX AUTOMATON reference (VERDICT r11 #4 / SURVEY par.8
round-12 candidate): the operator claims the true ExactSubstr
any-length->=L guarantee — every maximal character span covered by a
substring of length >= min_len occurring >= 2 times in the corpus —
via the union of duplicated stride-1 L-windows.  The reference derives
the same coverage from first principles (longest repeated substring
ending at every position, straight off the automaton's suffix links),
so the two paths share NO code and NO formulation; the window-union ==
any-length-coverage equivalence theorem is asserted inside the
reference itself on every corpus.
"""

import random

import pytest

from xpysom_dask_spark.operators.dedup import repeated_substring_spans


# ------------------------------------------------------------------ #
# generalized suffix automaton reference (pure Python, O(n log sigma))

def _sam_build(s):
    """Blumer et al. suffix automaton; returns (trans, link, length,
    cnt) with cnt[v] = number of end positions of v's substring class
    (clone-aware propagation)."""
    trans, link, length, cnt = [{}], [-1], [0], [0]
    last = 0
    for ch in s:
        cur = len(trans)
        trans.append({})
        length.append(length[last] + 1)
        link.append(-1)
        cnt.append(1)
        p = last
        while p != -1 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = len(trans)
                trans.append(dict(trans[q]))
                length.append(length[p] + 1)
                link.append(link[q])
                cnt.append(0)
                while p != -1 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # propagate occurrence counts up the links, longest first
    for v in sorted(range(1, len(trans)), key=lambda v: -length[v]):
        if link[v] > 0:
            cnt[link[v]] += cnt[v]
    return trans, link, length, cnt


def _maxrep(s):
    """maxrep[j] = length of the longest substring ending at j that
    occurs >= 2 times in s (overlapping occurrences count)."""
    trans, link, length, cnt = _sam_build(s)
    out = [0] * len(s)
    cur, ln = 0, 0
    for j, ch in enumerate(s):
        while cur != 0 and ch not in trans[cur]:
            cur = link[cur]
            ln = length[cur]
        if ch in trans[cur]:
            cur = trans[cur][ch]
            ln += 1
        # climb to the longest suffix whose class occurs >= 2 times
        t, m = cur, ln
        while t != 0 and cnt[t] < 2:
            t = link[t]
            m = length[t]
        out[j] = m if t != 0 else 0
    return out


def _merge(intervals):
    """Union of closed integer intervals -> sorted maximal intervals."""
    spans = []
    for a, b in sorted(intervals):
        if spans and a <= spans[-1][1] + 1:
            spans[-1][1] = max(spans[-1][1], b)
        else:
            spans.append([a, b])
    return [tuple(x) for x in spans]


def sam_reference_spans(texts, L):
    """Expected operator output from the suffix-automaton view:
    {doc_idx: [(start, length, n_windows), ...]}.  Asserts the
    window-union == any-length-coverage equivalence en route."""
    parts, offs = [], []
    for i, t in enumerate(texts):
        offs.append(sum(len(p) for p in parts))
        parts.append(t)
        parts.append(chr(0xE000 + i))      # unique, never repeats
    s = "".join(parts)
    mr = _maxrep(s)
    exp = {}
    for i, t in enumerate(texts):
        o = offs[i]
        # any-length coverage: union of [j - mr[j] + 1, j], mr >= L
        cover = _merge([(j - mr[o + j] + 1, j)
                        for j in range(len(t)) if mr[o + j] >= L])
        # duplicated L-windows: start p iff the L-gram ending at
        # p + L - 1 repeats (mr there >= L)
        dup_p = [j - L + 1 for j in range(L - 1, len(t))
                 if mr[o + j] >= L]
        wcover = _merge([(p, p + L - 1) for p in dup_p])
        assert wcover == cover, (i, wcover, cover)   # the theorem
        exp[i] = [(a, b - a + 1,
                   sum(1 for p in dup_p if a <= p <= b))
                  for a, b in cover]
    return {k: v for k, v in exp.items() if v}


def _spark_spans(spark, texts, L, verify=True):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    rows = repeated_substring_spans(df, "text", "doc_id",
                                    min_len=L, verify=verify).collect()
    out = {}
    for r in rows:
        out.setdefault(r["id"], []).append(
            (r["start"], r["length"], r["n_windows"]))
    return {k: sorted(v) for k, v in out.items()}


# ------------------------------------------------------------------ #
# adversarial fixed corpora

CORPORA = [
    # periodic self-overlap: 'aaaa...' repeats at every offset
    (["aaaaaaaaaa"], 3),
    # period-2 overlapping repeats inside one doc
    (["abababababab"], 4),
    # cross-doc repeat, interior position
    (["xx SHARED RUN OF TEXT yy", "zz SHARED RUN OF TEXT qq"], 10),
    # repeat length exactly L, and one at L-1 (must NOT match)
    (["aaQWERTYUIbb", "ccQWERTYUIdd", "eeQWERTYUff"], 8),
    # two islands in one doc separated by a unique gap
    (["PREFIXPREFIX--unique-middle--SUFFIXSUFFIX",
      "PREFIXPREFIX..another.doc..SUFFIXSUFFIX"], 6),
    # repeats straddling and abutting: merged coverage spans
    (["abcabcabcXabcabc", "abcabc"], 3),
    # short docs below L pass through silently
    (["ab", "", "abcdefabcdef"], 3),
]


@pytest.mark.parametrize("texts,L", CORPORA)
def test_spans_match_suffix_automaton_reference(spark, texts, L):
    assert _spark_spans(spark, texts, L) == \
        sam_reference_spans(texts, L)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_random_small_alphabet_corpora(spark, seed):
    """Dense-overlap fuzz: tiny alphabet makes every corpus a thicket
    of overlapping repeats at every length — the regime where a
    stride/offset bug or an off-by-one in the interval union shows."""
    rng = random.Random(seed)
    texts = ["".join(rng.choice("abc") for _ in range(rng.randint(0, 70)))
             for _ in range(8)]
    for L in (3, 5):
        assert _spark_spans(spark, texts, L) == \
            sam_reference_spans(texts, L)


def test_verify_false_md5_path_matches(spark):
    """The 16-byte-key scale path must agree with collision-free
    grouping (and with the reference) on the adversarial corpora."""
    for texts, L in CORPORA[:5]:
        assert _spark_spans(spark, texts, L, verify=False) == \
            sam_reference_spans(texts, L)


def test_min_len_validation():
    with pytest.raises(ValueError, match="min_len"):
        repeated_substring_spans(None, "text", "doc_id", min_len=0)


# ------------------------------------------------------------------ #
# the rewrite twin: char-level ExactSubstr deletion

def ref_excise(texts, L):
    """Independent replay of the deletion rule: stride-1 L-grams in
    (doc, position) order; every occurrence after the first marks its
    characters; documents re-assemble from unmarked characters."""
    first = {}
    marked = {i: set() for i in range(len(texts))}
    for i, t in enumerate(texts):
        for p in range(len(t) - L + 1):
            g = t[p:p + L]
            if g in first:
                marked[i].update(range(p, p + L))
            else:
                first[g] = (i, p)
    out = {}
    for i, t in enumerate(texts):
        keep = [c for j, c in enumerate(t) if j not in marked[i]]
        out[i] = ("".join(keep), len(t), len(marked[i]))
    return out


def _spark_excise(spark, texts, L, verify=True):
    from xpysom_dask_spark.operators.dedup import dedup_substrings_chars

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    return {r["id"]: (r["text_clean"], r["n_chars"], r["n_removed"])
            for r in dedup_substrings_chars(
                df, "text", "doc_id", min_len=L, verify=verify)
            .collect()}


@pytest.mark.parametrize("texts,L", CORPORA)
def test_excision_matches_python_reference(spark, texts, L):
    assert _spark_excise(spark, texts, L) == ref_excise(texts, L)


@pytest.mark.parametrize("seed", [3, 11])
def test_excision_random_corpora(spark, seed):
    rng = random.Random(seed)
    texts = ["".join(rng.choice("abd ") for _ in range(rng.randint(0, 80)))
             for _ in range(8)]
    for L in (4, 6):
        got = _spark_excise(spark, texts, L)
        exp = ref_excise(texts, L)
        assert got == exp
        # conservation: kept + removed == original, per doc
        for i, (clean, n, rem) in got.items():
            assert len(clean) + rem == n


def test_excision_first_occurrence_survives_byte_exact(spark):
    """The canonical copy keeps its bytes VERBATIM (no whitespace
    normalization — the differentiator vs the token-level form), and
    every later copy of the >=L run vanishes."""
    boiler = "LICENSE  HEADER\tv1.0 exactly-as-written "  # 40 chars
    texts = ["A" + boiler + "tail-one", "B" + boiler + "tail-two",
             boiler + boiler]
    got = _spark_excise(spark, texts, len(boiler))
    assert got[0][0] == texts[0]                  # first wins, intact
    assert boiler not in got[1][0]
    assert got[1][0].startswith("B")
    # doc 2 is boiler twice: both copies duplicate doc 0's window set
    assert got[2][0] == ""
    assert got[2][2] == 2 * len(boiler)


def test_excision_md5_path_and_short_docs(spark):
    texts = ["ab", "", "xyxyxyxyxyxy", "xyxyxyxyxyxy"]
    assert _spark_excise(spark, texts, 5, verify=False) == \
        ref_excise(texts, 5)


def test_results_invariant_under_repartitioning(spark):
    """Both ops are exact computations: output must be bit-identical
    whether the corpus arrives as 1 partition or 7."""
    from xpysom_dask_spark.operators.dedup import dedup_substrings_chars

    texts, L = CORPORA[5]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    exp_s = {k: sorted(v) for k, v in
             sam_reference_spans(texts, L).items()}
    exp_e = {i: (c, n, r) for i, (c, n, r)
             in ref_excise(texts, L).items()}
    for build in (lambda d: d.coalesce(1), lambda d: d.repartition(7)):
        rows = repeated_substring_spans(
            build(df), "text", "doc_id", min_len=L).collect()
        got_s = {}
        for r in rows:
            got_s.setdefault(r["id"], []).append(
                (r["start"], r["length"], r["n_windows"]))
        assert {k: sorted(v) for k, v in got_s.items()} == exp_s
        got_e = {r["id"]: (r["text_clean"], r["n_chars"],
                           r["n_removed"])
                 for r in dedup_substrings_chars(
                     build(df), "text", "doc_id", min_len=L).collect()}
        assert got_e == exp_e


def test_prebuilt_windows_relation_matches_default(spark):
    """The `windows=` fast path (scan once, reuse for spans AND
    excision) must be output-identical to the default double-build."""
    from xpysom_dask_spark.operators.dedup import (_char_windows,
                                                   dedup_substrings_chars)

    texts, L = CORPORA[5]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    base = df.selectExpr("doc_id AS id",
                         "coalesce(text, '') AS __t")
    wins = _char_windows(base, L, True).localCheckpoint(eager=True)
    got = {r["id"]: (r["text_clean"], r["n_removed"])
           for r in dedup_substrings_chars(
               df, "text", "doc_id", min_len=L,
               windows=wins).collect()}
    exp = {i: (c, r) for i, (c, n, r) in ref_excise(texts, L).items()}
    assert got == exp
    sp = _spark_spans(spark, texts, L)
    rows = repeated_substring_spans(df, "text", "doc_id", min_len=L,
                                    windows=wins).collect()
    got_s = {}
    for r in rows:
        got_s.setdefault(r["id"], []).append(
            (r["start"], r["length"], r["n_windows"]))
    assert {k: sorted(v) for k, v in got_s.items()} == sp


def test_skew_safe_plan_matches_default(spark):
    """skew_safe=True (map-side-combinable groupBy + equi-join, the
    hot-boilerplate insurance policy) must be output-identical to the
    default window-rank plan for BOTH operators."""
    from xpysom_dask_spark.operators.dedup import dedup_substrings_chars

    for texts, L in CORPORA[:6]:
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id bigint, text string")
        a = sorted(tuple(r) for r in repeated_substring_spans(
            df, "text", "doc_id", min_len=L).collect())
        b = sorted(tuple(r) for r in repeated_substring_spans(
            df, "text", "doc_id", min_len=L, skew_safe=True).collect())
        assert a == b
        c = sorted(tuple(r) for r in dedup_substrings_chars(
            df, "text", "doc_id", min_len=L).collect())
        d = sorted(tuple(r) for r in dedup_substrings_chars(
            df, "text", "doc_id", min_len=L, skew_safe=True).collect())
        assert c == d


# ------------------------------------------------------------------ #
# distributed suffix array (prefix doubling)

def ref_suffix_ranks(texts):
    """Brute force: dense lexicographic rank of every suffix of every
    doc; equal suffixes share a rank."""
    sufs = sorted((t[p:], i, p)
                  for i, t in enumerate(texts) for p in range(len(t)))
    ranks, r, prev = {}, 0, None
    for s, i, p in sufs:
        if s != prev:
            r += 1
            prev = s
        ranks[(i, p)] = r
    return ranks


def _spark_suffix_ranks(spark, texts, n_parts):
    from xpysom_dask_spark.operators.dedup import suffix_array_ranks

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    return {(r["id"], r["p"]): r["rank"]
            for r in suffix_array_ranks(df, "text", "doc_id",
                                        n_parts=n_parts).collect()}


@pytest.mark.parametrize("n_parts", [3, 16])
@pytest.mark.slow
def test_suffix_array_matches_brute_force(spark, n_parts):
    """Adversarial corpora (periodic, overlapping, cross-doc shared
    suffixes — ties must terminate the doubling at the fixed point,
    not loop) at two partition counts, so the two-pass global-rank
    boundary adjustment is exercised with keys split mid-class."""
    for texts, _L in CORPORA:
        texts = [t for t in texts if t]
        if not texts:
            continue
        assert _spark_suffix_ranks(spark, texts, n_parts) == \
            ref_suffix_ranks(texts)


@pytest.mark.slow
def test_suffix_array_fuzz(spark):
    rng = random.Random(5)
    texts = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 40)))
             for _ in range(6)]
    assert _spark_suffix_ranks(spark, texts, 8) == \
        ref_suffix_ranks(texts)


def test_suffix_array_rank_ties_are_identical_suffixes(spark):
    """The repeated-content contract: rank collisions exactly identify
    byte-identical suffixes (here the shared '...suffix' tails)."""
    texts = ["alpha common-tail", "beta common-tail", "gamma unique"]
    got = _spark_suffix_ranks(spark, texts, 4)
    exp = ref_suffix_ranks(texts)
    assert got == exp
    # the 12 suffixes of the shared tail ' common-tail' tie, PLUS
    # 'a common-tail' (alph·A common-tail == bet·A common-tail) = 13
    from collections import Counter

    tied = [rk for rk, n in Counter(got.values()).items() if n > 1]
    assert len(tied) == len(" common-tail") + 1
    # every tie class really is one byte-identical suffix string
    by_rank = {}
    for (i, p), rk in got.items():
        by_rank.setdefault(rk, set()).add(texts[i][p:])
    assert all(len(s) == 1 for s in by_rank.values())


# ------------------------------------------------------------------ #
# distributed LCP array + longest repeated substring

def ref_lcp_classes(texts):
    """Brute force: sorted distinct suffix classes with
    (rank, members {(id,p)}, lcp with next class)."""
    import os.path

    groups = {}
    for i, t in enumerate(texts):
        for p in range(len(t)):
            groups.setdefault(t[p:], set()).add((i, p))
    keys = sorted(groups)
    out = []
    for r, s in enumerate(keys, start=1):
        nxt = keys[r] if r < len(keys) else None
        lcp = (len(os.path.commonprefix([s, nxt]))
               if nxt is not None else None)
        out.append((r, groups[s], len(s), len(groups[s]), lcp))
    return out


def ref_lrs_length(texts):
    """Brute force longest-repeated-substring length (0 if none)."""
    best = 0
    for r, members, slen, n, lcp in ref_lcp_classes(texts):
        if n >= 2:
            best = max(best, slen)
        if lcp:
            best = max(best, lcp)
    return best


def _spark_lcp(spark, texts, n_parts=4):
    from xpysom_dask_spark.operators.dedup import suffix_lcp_array

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    return sorted(tuple(r) for r in suffix_lcp_array(
        df, "text", "doc_id", n_parts=n_parts).collect())


@pytest.mark.parametrize("n_parts", [3, 16])
@pytest.mark.slow
def test_lcp_array_matches_brute_force(spark, n_parts):
    for texts, _L in CORPORA:
        texts = [t for t in texts if t]
        if not texts:
            continue
        got = _spark_lcp(spark, texts, n_parts)
        exp = sorted((r, min(m)[0], min(m)[1], slen, n, lcp)
                     for r, m, slen, n, lcp in ref_lcp_classes(texts))
        assert got == exp, texts


@pytest.mark.slow
def test_lcp_array_fuzz(spark):
    rng = random.Random(11)
    texts = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 30)))
             for _ in range(5)]
    got = _spark_lcp(spark, texts, 8)
    exp = sorted((r, min(m)[0], min(m)[1], slen, n, lcp)
                 for r, m, slen, n, lcp in ref_lcp_classes(texts))
    assert got == exp, texts


def test_lcp_array_empty_corpus(spark):
    from xpysom_dask_spark.operators.dedup import suffix_lcp_array

    df = spark.createDataFrame([(1, ""), (2, None)],
                               "doc_id bigint, text string")
    out = suffix_lcp_array(df, "text", "doc_id")
    assert out.columns == ["rank", "id", "p", "suffix_len",
                           "n_members", "lcp_next"]
    assert out.count() == 0


@pytest.mark.slow
def test_longest_repeated_substring(spark):
    from xpysom_dask_spark.operators.dedup import \
        longest_repeated_substring

    for texts, _L in CORPORA:
        texts = [t for t in texts if t]
        if not texts:
            continue
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id bigint, text string")
        rows = longest_repeated_substring(df, "text", "doc_id").collect()
        exp_len = ref_lrs_length(texts)
        if exp_len == 0:
            assert rows == []
            continue
        assert len(rows) == 1
        r = rows[0]
        assert r["length"] == exp_len, texts
        # the located substring really is at (id, p) and repeats
        sub = r["substring"]
        assert len(sub) == exp_len
        assert texts[r["id"]][r["p"]:r["p"] + exp_len] == sub
        # overlapping occurrences count (str.count is non-overlapping
        # and would miss e.g. 'aaaaaaaaa' twice inside 'aaaaaaaaaa')
        occurrences = sum(
            sum(1 for j in range(len(t) - exp_len + 1)
                if t[j:j + exp_len] == sub) for t in texts)
        assert occurrences >= 2


def test_longest_repeated_substring_no_repeats(spark):
    from xpysom_dask_spark.operators.dedup import \
        longest_repeated_substring

    df = spark.createDataFrame([(0, "abcdefg")],
                               "doc_id bigint, text string")
    assert longest_repeated_substring(df, "text", "doc_id").collect() \
        == []


@pytest.mark.slow
def test_longest_repeated_substring_cross_doc(spark):
    from xpysom_dask_spark.operators.dedup import \
        longest_repeated_substring

    texts = ["intro THE COMMON RUN outro", "pre THE COMMON RUN post"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    r = longest_repeated_substring(df, "text", "doc_id").collect()[0]
    assert r["substring"] == " THE COMMON RUN "
    assert r["length"] == len(" THE COMMON RUN ")


# ------------------------------------------------------------------ #
# suffix_maxrep + suffix-array-derived spans (two-path parity)

def ref_maxrep_starting(texts):
    """Brute force: maxrep[(i, p)] = length of the longest substring
    starting at p of doc i occurring >= 2 times in the corpus
    (overlapping occurrences count)."""
    def occurs_twice(sub):
        c = 0
        for t in texts:
            for j in range(len(t) - len(sub) + 1):
                if t[j:j + len(sub)] == sub:
                    c += 1
                    if c >= 2:
                        return True
        return False

    out = {}
    for i, t in enumerate(texts):
        for p in range(len(t)):
            m = 0
            while p + m < len(t) and occurs_twice(t[p:p + m + 1]):
                m += 1
            out[(i, p)] = m
    return out


@pytest.mark.parametrize("n_parts", [3, 16])
@pytest.mark.slow
def test_suffix_maxrep_matches_brute_force(spark, n_parts):
    from xpysom_dask_spark.operators.dedup import suffix_maxrep

    for texts, _L in CORPORA[:5]:
        texts = [t for t in texts if t]
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id bigint, text string")
        got = {(r["id"], r["p"]): r["maxrep"]
               for r in suffix_maxrep(df, "text", "doc_id",
                                      n_parts=n_parts).collect()}
        assert got == ref_maxrep_starting(texts), texts


@pytest.mark.slow
def test_spans_sa_matches_windowed_path(spark):
    """THE cross-validation: the suffix-array coverage and the
    duplicated-L-window coverage are two independent implementations
    of the same ExactSubstr guarantee — byte-equal spans for every
    corpus and every L."""
    from xpysom_dask_spark.operators.dedup import \
        repeated_substring_spans_sa

    for texts, L in CORPORA:
        texts = [t for t in texts if t]
        if not texts:
            continue
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id bigint, text string")
        for LL in {L, 3}:
            sa = sorted(tuple(r) for r in repeated_substring_spans_sa(
                df, "text", "doc_id", min_len=LL).collect())
            win = sorted((r["id"], r["start"], r["length"])
                         for r in repeated_substring_spans(
                             df, "text", "doc_id", min_len=LL).collect())
            assert sa == win, (texts, LL)


@pytest.mark.slow
def test_spans_sa_fuzz(spark):
    from xpysom_dask_spark.operators.dedup import \
        repeated_substring_spans_sa

    rng = random.Random(29)
    texts = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 50)))
             for _ in range(6)]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    for LL in (2, 4, 7):
        sa = sorted(tuple(r) for r in repeated_substring_spans_sa(
            df, "text", "doc_id", min_len=LL).collect())
        win = sorted((r["id"], r["start"], r["length"])
                     for r in repeated_substring_spans(
                         df, "text", "doc_id", min_len=LL).collect())
        assert sa == win, (texts, LL)


def test_spans_sa_min_len_validation(spark):
    from xpysom_dask_spark.operators.dedup import \
        repeated_substring_spans_sa

    with pytest.raises(ValueError, match="min_len"):
        repeated_substring_spans_sa(None, "text", "doc_id", min_len=0)


@pytest.mark.slow
def test_spill_dir_path_matches_default(spark, tmp_path):
    """The parquet-spill snapshot path (the multi-10M-suffix /
    fault-tolerant variant) must produce byte-identical LCP arrays
    and spans to the localCheckpoint default."""
    from xpysom_dask_spark.operators.dedup import (
        repeated_substring_spans_sa, suffix_lcp_array)

    texts = ["abcabcabcXabcabc", "abcabc", "aaaaaaaa", "xy SHARED zz",
             "qq SHARED ww"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    base = sorted(tuple(r) for r in suffix_lcp_array(
        df, "text", "doc_id", n_parts=4).collect())
    spill = sorted(tuple(r) for r in suffix_lcp_array(
        df, "text", "doc_id", n_parts=4,
        spill_dir=str(tmp_path / "lcp")).collect())
    assert base == spill
    s1 = sorted(tuple(r) for r in repeated_substring_spans_sa(
        df, "text", "doc_id", min_len=3).collect())
    s2 = sorted(tuple(r) for r in repeated_substring_spans_sa(
        df, "text", "doc_id", min_len=3,
        spill_dir=str(tmp_path / "sp")).collect())
    assert s1 == s2
