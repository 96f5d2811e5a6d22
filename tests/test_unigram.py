"""Unigram-LM tokenizer trainer vs an independent Python reference
(same spec: occurrence-weighted candidates, hard-EM with smallest-j
Viterbi ties, Laplace e6 scores, char-preserving prune)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators import unigram as U


def _ref_learn(texts, vocab_size=16, L=4, n_iter=3, cap=None,
               max_word_len=32):
    cap = 8 * vocab_size if cap is None else cap
    wc = {}
    for t in texts:
        for w in t.lower().split():
            if w and len(w) <= max_word_len:
                wc[w] = wc.get(w, 0) + 1
    cand = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + L, len(w)) + 1):
                p = w[i:j]
                cand[p] = cand.get(p, 0) + c
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in cand.items() if len(p) > 1),
                    key=lambda pc: (-pc[1], pc[0]))[:cap]
    counts = dict(singles)
    counts.update(dict(multis))

    def smooth(cnt):
        tot, v = sum(cnt.values()), len(cnt)
        return {p: math.floor(math.log((c + 1) / (tot + v)) * 1e6)
                for p, c in cnt.items()}

    def viterbi(word, scores):
        NEG = -(10 ** 15)
        n = len(word)
        best, back = [NEG] * (n + 1), [-1] * (n + 1)
        best[0] = 0
        for i in range(1, n + 1):
            for j in range(max(0, i - L), i):
                if best[j] == NEG:
                    continue
                sc = scores.get(word[j:i])
                if sc is None:
                    continue
                if best[j] + sc > best[i]:
                    best[i], back[i] = best[j] + sc, j
        if best[n] == NEG:
            return None
        out, i = [], n
        while i > 0:
            out.append(word[back[i]:i])
            i = back[i]
        return out[::-1]

    for _ in range(n_iter):
        scores = smooth(counts)
        used = {}
        for w, c in wc.items():
            pieces = viterbi(w, scores)
            if pieces is None:
                continue
            for p in pieces:
                used[p] = used.get(p, 0) + c
        counts = {p: used.get(p, 0) for p in counts
                  if len(p) == 1 or p in used}

    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                    key=lambda pc: (-pc[1], pc[0]))
    room = max(vocab_size - len(singles), 0)
    final = dict(singles)
    final.update(dict(multis[:room]))
    scores = smooth(final)
    return sorted((p, c, scores[p]) for p, c in final.items())


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on mats",
    "thematic the theme theater",
    "concatenate the cat category",
    "mat mat mat the the the",
]


def test_learn_unigram_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id bigint, text string")
    got = [(r["piece"], r["count"], r["score_e6"]) for r in
           U.learn_unigram(df, "text", vocab_size=16, max_piece_len=4,
                           n_iter=3).orderBy("piece").collect()]
    assert got == _ref_learn(TEXTS, vocab_size=16, L=4, n_iter=3)
    # structural guarantees: every corpus character survives; common
    # multi-char pieces exist
    pieces = {p for p, _c, _s in got}
    alphabet = {ch for t in TEXTS for ch in t.lower().replace(" ", "")}
    assert alphabet <= pieces
    assert any(len(p) > 1 for p in pieces)


def test_segment_words_covers_and_scores(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id bigint, text string")
    vocab = U.learn_unigram(df, "text", vocab_size=16,
                            max_piece_len=4, n_iter=2)
    seg = {r["word"]: r for r in
           U.segment_words(df, "text", vocab,
                           max_piece_len=4).collect()}
    words = {w for t in TEXTS for w in t.lower().split()}
    assert set(seg) == words          # full coverage (chars kept)
    scores = {r["piece"]: r["score_e6"] for r in vocab.collect()}
    for w, r in seg.items():
        parts = r["encoded"].split("␟")
        assert "".join(parts) == w
        assert r["n_pieces"] == len(parts)
        assert r["score_e6"] == sum(scores[p] for p in parts)


def test_unigram_token_count(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id bigint, text string")
    vocab = U.learn_unigram(df, "text", vocab_size=16,
                            max_piece_len=4, n_iter=2)
    seg = {r["word"]: r["n_pieces"] for r in
           U.segment_words(df, "text", vocab,
                           max_piece_len=4).collect()}
    got = {r["id"]: (r["n_words"], r["n_tokens"]) for r in
           U.unigram_token_count(df, "text", "doc_id", vocab,
                                 max_piece_len=4).collect()}
    for i, t in enumerate(TEXTS):
        ws = t.lower().split()
        assert got[i] == (len(ws), sum(seg[w] for w in ws))


def test_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        U.learn_unigram(None, "text", vocab_size=1)
    with pytest.raises(ValueError, match="max_piece_len"):
        U.learn_unigram(None, "text", max_piece_len=0)


def test_unigram_encode_ids_roundtrip(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id bigint, text string")
    vocab = U.learn_unigram(df, "text", vocab_size=16,
                            max_piece_len=4, n_iter=2)
    ids = {r["id"]: r["piece"] for r in
           U.unigram_vocab_ids(vocab).collect()}
    assert sorted(ids) == list(range(len(ids)))   # dense 0..V-1
    enc = {r["id"]: list(r["ids"]) for r in
           U.unigram_encode_ids(df, "text", "doc_id", vocab,
                                max_piece_len=4).collect()}
    for i, t in enumerate(TEXTS):
        # decoding the ids reconstructs the text minus whitespace
        assert "".join(ids[j] for j in enc[i]) == \
            t.lower().replace(" ", "")


def test_viterbi_matches_bruteforce_enumeration():
    """Property check of the DP against exhaustive path enumeration
    with the same tie rule (max score, then smallest split points
    right-to-left) over randomized small vocabularies."""
    import random

    rng = random.Random(77)
    for _ in range(200):
        alpha = "abc"
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
        scores = {}
        for ch in alpha:
            scores[ch] = rng.randint(-9, -1) * 10**5
        for _k in range(rng.randint(0, 6)):
            ln = rng.randint(2, 3)
            i = rng.randint(0, max(len(word) - ln, 0))
            scores[word[i:i + ln]] = rng.randint(-9, -1) * 10**5
        L = 3

        def paths(prefix_end):
            if prefix_end == 0:
                return [([], 0)]
            out = []
            for j in range(max(0, prefix_end - L), prefix_end):
                p = word[j:prefix_end]
                if p not in scores:
                    continue
                for seq, sc in paths(j):
                    out.append((seq + [p], sc + scores[p]))
            return out
        allp = paths(len(word))
        got_pieces, got_score = U._viterbi(word, scores, L)
        assert allp, word                        # chars always present
        best_score = max(sc for _s, sc in allp)
        assert got_score == best_score
        # the DP's tie rule: among best-score paths, it picks the one
        # whose split points are smallest scanning right-to-left
        # (longest last piece first) — reconstruct that path here
        def key(seq):
            # split points from the right: longer last pieces first
            pts = []
            pos = len(word)
            for p in reversed(seq):
                pos -= len(p)
                pts.append(pos)
            return pts
        want = min((seq for seq, sc in allp if sc == best_score),
                   key=key)
        assert got_pieces == want, (word, got_pieces, want)


def test_id_column_type_carried_through_arrow_schema(spark):
    """ADVICE r8 (low): unigram_token_count / unigram_encode_ids used
    to hardcode 'id bigint' — a string doc id broke (or silently
    coerced) in the Arrow mapInPandas path.  The output id type must
    equal the input id type and values must round-trip."""
    df = spark.createDataFrame(
        [(f"doc-{i}", t) for i, t in enumerate(TEXTS)],
        "doc_id string, text string")
    vocab = U.learn_unigram(df, "text", vocab_size=16,
                            max_piece_len=4, n_iter=2)
    tc = U.unigram_token_count(df, "text", "doc_id", vocab,
                               max_piece_len=4)
    assert dict(tc.dtypes)["id"] == "string"
    got = {r["id"] for r in tc.collect()}
    assert got == {f"doc-{i}" for i in range(len(TEXTS))}
    enc = U.unigram_encode_ids(df, "text", "doc_id", vocab,
                               max_piece_len=4)
    assert dict(enc.dtypes)["id"] == "string"
    assert {r["id"] for r in enc.collect()} == got


def test_learn_unigram_two_path_parity(spark):
    """optimization r13: learn_unigram gained the driver-side EM
    fusion (the learn_bpe two-level idiom) — the fused path and the
    distributed EM rounds must produce the identical vocabulary
    relation (pieces, counts, scores)."""
    texts = ["the cattle battle rattled the little kettle",
             "seattle cattle settle battle",
             "rattle rattle little kettle kettle the the",
             "abc abd abe abf cattle"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    fused = sorted(map(tuple, U.learn_unigram(
        df, "text", vocab_size=24, max_piece_len=4,
        n_iter=2).collect()))
    dist = sorted(map(tuple, U.learn_unigram(
        df, "text", vocab_size=24, max_piece_len=4,
        n_iter=2, driver_words_limit=0).collect()))
    assert fused == dist and fused
