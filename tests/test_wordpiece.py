"""WordPiece trainer/encoder (operators/wordpiece.py): reference
differential for the likelihood-scored merge loop, two-path parity
(driver-local vs distributed DECIMAL ranking), and the greedy
longest-match / all-or-nothing-UNK encoder semantics."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xpysom_dask_spark.operators import wordpiece as WP


def _ref_learn(word_count, num_merges, min_pair_count=2):
    """Independent reference: same definition, separate code path
    (exact Fraction scores instead of the e12 floor key — on corpora
    where no two distinct scores collide within 1e-12 relative, both
    must pick identical merges)."""
    from fractions import Fraction

    vocab = {}
    for w, c in word_count.items():
        syms = tuple([w[0]] + ["##" + ch for ch in w[1:]])
        vocab[syms] = vocab.get(syms, 0) + c
    toks = sorted({s for syms in vocab for s in syms})
    for _ in range(num_merges):
        pc, sc = {}, {}
        for syms, c in vocab.items():
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = \
                    pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        best = min(pc.items(),
                   key=lambda kv: (-Fraction(kv[1],
                                             sc[kv[0][0]] * sc[kv[0][1]]),
                                   kv[0][0] + " " + kv[0][1]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        j = a + b[2:]
        toks.append(j)
        out = {}
        for syms, c in vocab.items():
            s, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    s.append(j)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + c
        vocab = out
    return toks


WC = {"the": 50, "then": 20, "than": 15, "that": 30, "cat": 12,
      "cats": 7, "dog": 9, "dogs": 4, "a": 40, "at": 18}


def test_local_trainer_matches_fraction_reference():
    got = WP._learn_local(WC, 12, 2)
    exp = _ref_learn(WC, 12, 2)
    assert got == exp
    base = {s for w in WC for s in [w[0]] + ["##" + c for c in w[1:]]}
    assert len(got) > len(base)  # merges actually happened


def test_likelihood_ranking_differs_from_raw_frequency():
    """A corpus where the most FREQUENT pair is not the best-SCORING
    pair: WordPiece must pick the rarer-but-exclusive pair."""
    # pair ('a','##b') occurs 30x but 'a' and '##b' are everywhere
    # (large denominators); ('x','##y') occurs 10x and nowhere else.
    wc = {"ab": 30, "ac": 40, "db": 35, "xy": 10}
    toks = WP._learn_local(wc, 1, 1)
    assert toks[-1] == "xy"


def test_encode_word_longest_match_and_unk():
    vocab = {"un", "##able", "##abl", "##e", "u", "##n", "a"}
    assert WP.encode_word("unable", vocab) == ["un", "##able"]
    # unmatchable position -> whole word UNK
    assert WP.encode_word("unfixable", vocab) == ["[UNK]"]
    # over the char cap -> UNK regardless of matchability
    assert WP.encode_word("unable", vocab, max_word_chars=3) == ["[UNK]"]
    assert WP.encode_word("", vocab) == []
    # word-initial candidates never use continuation tokens
    assert WP.encode_word("n", {"##n"}) == ["[UNK]"]


def test_learn_then_encode_roundtrip(spark):
    rows = [("d%d" % i, t) for i, t in enumerate(
        ["the cat sat", "the cats sat", "then the dog",
         "that dog at that", "a cat a dog a"] * 3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = WP.learn_wordpiece(df, "text", num_merges=20,
                              min_pair_count=2)
    enc = WP.wordpiece_encode(df, "text", set(toks))
    for r in enc.collect():
        words = r["text"].lower().split()
        rebuilt, cur = [], ""
        for t in r["wp_tokens"]:
            assert t != "[UNK]"
            if t.startswith("##"):
                cur += t[2:]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = t
        if cur:
            rebuilt.append(cur)
        assert rebuilt == words


def test_two_path_parity(spark):
    """Forcing the distributed merge loop (driver_vocab_limit=0) must
    produce the identical token list — DECIMAL div == Python //."""
    rows = [("d%d" % i, t) for i, t in enumerate(
        ["aa ab abc the then", "the the cat cats", "abc ab aa then"])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    local = WP.learn_wordpiece(df, "text", num_merges=8,
                               min_pair_count=1)
    dist = WP.learn_wordpiece(df, "text", num_merges=8,
                              min_pair_count=1, driver_vocab_limit=0)
    assert local == dist and len(local) > 0


def test_encode_ids_space_and_unk(spark):
    """wordpiece_encode_ids: [UNK] is id 0, learned tokens take
    1..len in learn order, ids round-trip the string encoding."""
    rows = [("d%d" % i, t) for i, t in enumerate(
        ["the cat sat on the mat", "the cats sat", "a cat a mat"])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    toks = WP.learn_wordpiece(df, "text", num_merges=10,
                              min_pair_count=1)
    ids = WP.wordpiece_vocab_ids(toks)
    assert ids["[UNK]"] == 0
    assert [ids[t] for t in toks] == list(range(1, len(toks) + 1))
    enc = {r["doc_id"]: r for r in WP.wordpiece_encode(
        df, "text", set(toks)).collect()}
    got = {r["doc_id"]: r for r in WP.wordpiece_encode_ids(
        df, "text", toks).collect()}
    for d, r in got.items():
        assert r["token_ids"] == [ids[t]
                                  for t in enc[d]["wp_tokens"]]
    # a word over the cap encodes as the single UNK id 0
    long_df = spark.createDataFrame(
        [("x", "supercalifragilistic")], ["doc_id", "text"])
    r = WP.wordpiece_encode_ids(long_df, "text", toks,
                                max_word_chars=5).collect()[0]
    assert r["token_ids"] == [0]


def test_unicode_and_quote_corpus_roundtrip(spark):
    """CJK/accented/apostrophe words: trainer, two-path parity, and
    encode roundtrip must all survive non-ASCII symbols (char-level
    splits, broadcast literals, pair keys with quotes)."""
    rows = [("d%d" % i, t) for i, t in enumerate(
        ["你好 世界 你好", "don't don't can't", "héllo héllo wörld",
         "你好 don't wörld 世界"] * 2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    local = WP.learn_wordpiece(df, "text", num_merges=5,
                               min_pair_count=1)
    dist = WP.learn_wordpiece(df, "text", num_merges=5,
                              min_pair_count=1, driver_vocab_limit=0)
    assert local == dist
    local = WP.learn_wordpiece(df, "text", num_merges=12,
                               min_pair_count=1)
    assert any("你" in t for t in local)
    enc = WP.wordpiece_encode(df, "text", set(local))
    for r in enc.collect():
        words = r["text"].lower().split()
        rebuilt, cur = [], ""
        for t in r["wp_tokens"]:
            assert t != "[UNK]"
            if t.startswith("##"):
                cur += t[2:]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = t
        if cur:
            rebuilt.append(cur)
        assert rebuilt == words


def test_wordpiece_decode_roundtrip(spark):
    """encode → decode returns the encoder's normalization for fully
    covered words; an uncovered word round-trips to [UNK] (the
    documented lossy leg); decode_ids agrees with decode."""
    texts = ["low lower lowest", "the cat sat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id bigint, text string")
    toks = WP.learn_wordpiece(df, "text", num_merges=30,
                              driver_vocab_limit=1 << 20)
    want = {i: " ".join(t.lower().split()) for i, t in enumerate(texts)}

    enc = WP.wordpiece_encode(df, "text", set(toks))
    dec = {r["id"]: r["text_decoded"]
           for r in WP.wordpiece_decode(enc, "wp_tokens").collect()}
    assert dec == want

    ids = WP.wordpiece_encode_ids(df, "text", toks)
    dec2 = {r["id"]: r["text_decoded"]
            for r in WP.wordpiece_decode_ids(ids, "token_ids",
                                             toks).collect()}
    assert dec2 == want

    oov = spark.createDataFrame([(0, "low zzqq")],
                                "id bigint, text string")
    enc3 = WP.wordpiece_encode(oov, "text", set(toks))
    got = WP.wordpiece_decode(enc3, "wp_tokens").first()["text_decoded"]
    assert got == "low [UNK]"
