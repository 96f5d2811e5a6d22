"""Distributed unigram-LM tokenizer induction (SentencePiece-style).

Completes the tokenizer family next to :mod:`bpe`: Kudo's unigram
language model (arXiv:1804.10959), shaped for Spark and made
ENGINE-EXACT by hard-EM with scaled-integer scores:

* **Corpus-sized work happens exactly once** — the same (word, count)
  vocabulary compression the BPE trainer uses: all candidate
  generation, EM segmentation, and count re-estimation run on the
  distinct-word relation weighted by multiplicity.
* **Candidates**: every substring of every word up to
  ``max_piece_len`` chars, weighted by word count per OCCURRENCE —
  one codegen'd nested-sequence explode + a combinable groupBy; kept
  set = all single characters (coverage guarantee) + the top
  ``candidate_cap`` multi-char pieces by (weight DESC, piece ASC).
* **Hard EM**, ``n_iter`` rounds: each distinct word is Viterbi-
  segmented under the current scores (ties: the SMALLEST split point
  wins, i.e. the longest last piece — a total, engine-reproducible
  rule); new piece counts are the segmentation occurrences weighted
  by word count (one Arrow kernel pass over words with the ≤
  candidate-sized score dict broadcast, one combinable groupBy);
  scores re-estimated with Laplace smoothing
  ``score = floor(ln((c + 1) / (total + |V|)) · 1e6)`` — integers
  end-to-end, so any engine replays the fit bit-for-bit.
* **Prune** to ``vocab_size``: all single characters survive, the
  remaining slots fill by (count DESC, piece ASC).

Scale shape: per EM round, O(distinct_words · len · max_piece_len)
inside Arrow batches + one piece-keyed map-side-combined aggregation;
the corpus is never re-read after the word-count pass.  The score
dict broadcast is ≤ candidate_cap + alphabet entries by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

_NEG = -(10 ** 15)


def _viterbi(word: str, scores: dict, max_len: int):
    """Best segmentation of ``word`` under ``scores`` (e6 ints):
    returns (pieces, total_score) or (None, None) if unsegmentable
    (a character outside the vocabulary).  DP maximizes the score
    sum; ties prefer the smallest split point j (longest last
    piece) — evaluated j-ascending with strict improvement, which
    implements exactly that rule."""
    n = len(word)
    best = [_NEG] * (n + 1)
    back = [-1] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        bi, bj = _NEG, -1
        for j in range(max(0, i - max_len), i):
            if best[j] == _NEG:
                continue
            sc = scores.get(word[j:i])
            if sc is None:
                continue
            cand = best[j] + sc
            if cand > bi:               # ties keep the SMALLER j
                bi, bj = cand, j
        best[i], back[i] = bi, bj
    if best[n] == _NEG:
        return None, None
    pieces = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces, best[n]


def _segment_words_kernel(scores: dict, max_len: int):
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            words, freqs, pcs, scs, nps = [], [], [], [], []
            cache = {}
            for w, c in zip(pdf["word"], pdf["count"]):
                hit = cache.get(w)
                if hit is None:
                    hit = _viterbi(w, scores, max_len)
                    cache[w] = hit
                pieces, sc = hit
                if pieces is None:
                    continue
                words.append(w)
                freqs.append(int(c))
                pcs.append(list(pieces))
                scs.append(int(sc))
                nps.append(len(pieces))
            yield pd.DataFrame({
                "word": words, "count": freqs, "pieces": pcs,
                "score_e6": scs, "n_pieces": nps})
    return fn


_SEG_SCHEMA = ("word string, count bigint, pieces array<string>, "
               "score_e6 bigint, n_pieces int")


def candidate_pieces(wc: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, weight): every substring occurrence up to
    ``max_piece_len`` chars, weighted by word count — one nested
    sequence-transform explode, no Python."""
    subs = F.expr(
        f"flatten(transform(sequence(1, length(word)), "
        f"i -> transform(sequence(i, least(i + {max_piece_len - 1}, "
        f"length(word))), j -> substring(word, i, j - i + 1))))")
    return (wc.select(F.explode(subs).alias("piece"),
                      F.col("count").alias("__c"))
            .groupBy("piece")
            .agg(F.sum("__c").cast("bigint").alias("weight")))


#: distinct-word bound for the driver-side EM loop (the learn_bpe
#: DRIVER_VOCAB_LIMIT idiom): below it the (word, count) relation
#: collects once and the candidate selection + EM rounds run in pure
#: Python — identical statistics, tie-breaks, and Laplace scores, so
#: path choice never changes the vocabulary (two-path parity test);
#: above it each EM round is one vocab-sized Spark job as before.
DRIVER_WORDS_LIMIT = 200_000


def learn_unigram(df: DataFrame, text_col: str, vocab_size: int = 256,
                  max_piece_len: int = 8, n_iter: int = 3,
                  candidate_cap: int | None = None,
                  max_word_len: int = 32,
                  driver_words_limit: int = DRIVER_WORDS_LIMIT
                  ) -> DataFrame:
    """Train the unigram vocabulary; returns the relation
    ``(piece, count, score_e6)`` (``count`` = final-round weighted
    occurrences, Laplace-smoothed scores).  Words longer than
    ``max_word_len`` are excluded from training (the documented
    bound that keeps the Viterbi kernel O(len·max_piece_len))."""
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if not 1 <= max_piece_len <= max_word_len:
        raise ValueError(
            f"need 1 <= max_piece_len <= max_word_len, got "
            f"{max_piece_len}/{max_word_len}")
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    cap = (8 * vocab_size if candidate_cap is None
           else int(candidate_cap))
    wc = (word_counts(df, text_col)
          .where(F.length("word") <= max_word_len)
          .localCheckpoint(eager=True))
    if wc.count() <= driver_words_limit:
        word_count = {r["word"]: int(r["count"]) for r in wc.collect()}
        return _learn_local(df.sparkSession, word_count, vocab_size,
                            max_piece_len, n_iter, cap)

    cand = candidate_pieces(wc, max_piece_len)
    chars = cand.where(F.length("piece") == 1)
    multi = (cand.where(F.length("piece") > 1)
             .orderBy(F.col("weight").desc(), F.col("piece").asc())
             .limit(cap))
    kept = chars.unionByName(multi)
    rows = kept.collect()           # ≤ alphabet + cap rows by bound
    counts = {r["piece"]: int(r["weight"]) for r in rows}

    for _ in range(n_iter):
        scores = _smoothed_scores(counts)
        seg = wc.mapInPandas(
            _segment_words_kernel(scores, max_piece_len), _SEG_SCHEMA)
        new_counts = (seg.select(F.explode("pieces").alias("piece"),
                                 F.col("count").alias("__c"))
                      .groupBy("piece")
                      .agg(F.sum("__c").cast("bigint").alias("c"))
                      .collect())
        used = {r["piece"]: int(r["c"]) for r in new_counts}
        # drop unused multi-char pieces; single chars always survive
        counts = {p: used.get(p, 0) for p in counts
                  if len(p) == 1 or p in used}

    # prune: all single chars + best multi-char by (count, piece)
    singles = {p: c for p, c in counts.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                    key=lambda pc: (-pc[1], pc[0]))
    room = max(vocab_size - len(singles), 0)
    final = dict(singles)
    final.update(dict(multis[:room]))
    scores = _smoothed_scores(final)
    spark = df.sparkSession
    return spark.createDataFrame(
        sorted((p, c, scores[p]) for p, c in final.items()),
        "piece string, count bigint, score_e6 bigint")


def _smoothed_scores(counts: dict) -> dict:
    total = sum(counts.values())
    v = len(counts)
    return {p: math.floor(math.log((c + 1) / (total + v)) * 1e6)
            for p, c in counts.items()}


def _learn_local(spark, word_count: dict, vocab_size: int,
                 max_piece_len: int, n_iter: int, cap: int
                 ) -> DataFrame:
    """Driver-side EM over a collected (word → count) dict — the exact
    statistics, candidate ordering (weight DESC, piece ASC), hard-EM
    Viterbi (same ``_viterbi``), drop-unused rule, prune, and Laplace
    scores as the distributed rounds (optimization r13, the learn_bpe
    two-level idiom: n_iter vocab-sized Spark jobs on a tiny relation
    are pure job latency).  Two-path parity pinned by test."""
    # candidate_pieces: every substring occurrence up to max_piece_len
    cand: dict[str, int] = {}
    for w, c in word_count.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                cand[p] = cand.get(p, 0) + c
    singles = {p: wgt for p, wgt in cand.items() if len(p) == 1}
    multis = sorted(((p, wgt) for p, wgt in cand.items()
                     if len(p) > 1), key=lambda pc: (-pc[1], pc[0]))
    counts = dict(singles)
    counts.update(dict(multis[:cap]))

    for _ in range(n_iter):
        scores = _smoothed_scores(counts)
        used: dict[str, int] = {}
        seg_cache: dict[str, list | None] = {}
        for w, c in word_count.items():
            pieces = seg_cache.get(w, False)
            if pieces is False:
                pieces, _sc = _viterbi(w, scores, max_piece_len)
                seg_cache[w] = pieces
            if pieces is None:
                continue
            for p in pieces:
                used[p] = used.get(p, 0) + c
        counts = {p: used.get(p, 0) for p in counts
                  if len(p) == 1 or p in used}

    fsingles = {p: c for p, c in counts.items() if len(p) == 1}
    fmultis = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                     key=lambda pc: (-pc[1], pc[0]))
    room = max(vocab_size - len(fsingles), 0)
    final = dict(fsingles)
    final.update(dict(fmultis[:room]))
    scores = _smoothed_scores(final)
    return spark.createDataFrame(
        sorted((p, c, scores[p]) for p, c in final.items()),
        "piece string, count bigint, score_e6 bigint")


def segment_words(df: DataFrame, text_col: str, vocab: DataFrame,
                  max_piece_len: int = 8,
                  max_word_len: int = 32) -> DataFrame:
    """Viterbi-segment every distinct word of the corpus under a
    trained vocabulary: ``(word, count, encoded, score_e6,
    n_pieces)`` with ``encoded`` = pieces joined by ``'␟'`` (U+241F) —
    the inspection/gate surface.  Unsegmentable words (characters
    outside the vocabulary) are omitted; words longer than
    ``max_word_len`` are excluded (the training bound)."""
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    rows = vocab.select("piece", "score_e6").collect()
    scores = {r["piece"]: int(r["score_e6"]) for r in rows}
    wc = (word_counts(df, text_col)
          .where(F.length("word") <= max_word_len))
    seg = wc.mapInPandas(
        _segment_words_kernel(scores, max_piece_len), _SEG_SCHEMA)
    return seg.select(
        "word", "count",
        F.array_join("pieces", "␟").alias("encoded"),
        "score_e6", "n_pieces")


def unigram_token_count(df: DataFrame, text_col: str, id_col: str,
                        vocab: DataFrame,
                        max_piece_len: int = 8) -> DataFrame:
    """Per-document unigram token counts under a trained vocabulary:
    ``(id, n_words, n_tokens)`` — the LLM-budget accounting the
    tokenizer exists for.  One word-level segmentation (cached per
    distinct word inside each Arrow batch) joined back through a
    broadcast of the per-word piece counts would re-shuffle the
    corpus; instead the kernel runs directly over the documents,
    re-using the in-batch word cache (words repeat heavily)."""
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    import pandas as pd

    rows = vocab.select("piece", "score_e6").collect()
    scores = {r["piece"]: int(r["score_e6"]) for r in rows}

    def fn(batches):
        cache = {}
        for pdf in batches:
            ids, nw, nt = [], [], []
            for i, txt in zip(pdf["__id"], pdf["__text"]):
                words = [w for w in (txt or "").lower().split() if w]
                tot = 0
                for w in words:
                    hit = cache.get(w)
                    if hit is None:
                        pieces, _sc = _viterbi(w, scores,
                                               max_piece_len)
                        hit = len(pieces) if pieces else 0
                        cache[w] = hit
                    tot += hit
                ids.append(i)
                nw.append(len(words))
                nt.append(tot)
            yield pd.DataFrame({"id": ids, "n_words": nw,
                                "n_tokens": nt})
    # carry id_col's actual type through the Arrow schema — a string
    # or decimal doc id must not silently coerce to bigint (ADVICE r8)
    id_type = df.schema[id_col].dataType.simpleString()
    return (df.select(F.col(id_col).alias("__id"),
                      F.col(text_col).alias("__text"))
            .mapInPandas(
                fn, f"id {id_type}, n_words int, n_tokens int"))


def unigram_vocab_ids(vocab: DataFrame) -> DataFrame:
    """Stable id per piece: ``(id, piece)``, ids dense 0..V−1 in piece
    order — the engine-exact id assignment (no partition dependence),
    mirroring :func:`~.bpe.bpe_vocab`."""
    from pyspark.sql import Window

    w = Window.orderBy("piece")
    return (vocab.select("piece")
            .withColumn("id", F.row_number().over(w) - 1)
            .select("id", "piece"))


def unigram_encode_ids(df: DataFrame, text_col: str, id_col: str,
                       vocab: DataFrame,
                       max_piece_len: int = 8) -> DataFrame:
    """Encode documents to unigram token-id sequences: ``(id, ids)``
    with ``ids array<int>`` — the model-input surface, mirroring
    :func:`~.bpe.bpe_encode_ids`.  Words repeat heavily, so each
    distinct word per Arrow batch is Viterbi-segmented once (in-batch
    cache); characters outside the vocabulary make a word encode to
    the empty sequence (documented: train the vocab on a corpus
    covering the alphabet, or pre-filter)."""
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    import pandas as pd

    rows = vocab.select("piece", "score_e6").collect()
    scores = {r["piece"]: int(r["score_e6"]) for r in rows}
    piece_id = {r["piece"]: i for i, r in
                enumerate(sorted(rows, key=lambda r: r["piece"]))}

    def fn(batches):
        cache = {}
        for pdf in batches:
            out_ids, out_seqs = [], []
            for i, txt in zip(pdf["__id"], pdf["__text"]):
                seq = []
                for w in (txt or "").lower().split():
                    if not w:
                        continue
                    hit = cache.get(w)
                    if hit is None:
                        pieces, _sc = _viterbi(w, scores,
                                               max_piece_len)
                        hit = ([piece_id[p] for p in pieces]
                               if pieces else [])
                        cache[w] = hit
                    seq.extend(hit)
                out_ids.append(i)
                out_seqs.append(seq)
            yield pd.DataFrame({"id": out_ids, "ids": out_seqs})
    id_type = df.schema[id_col].dataType.simpleString()
    return (df.select(F.col(id_col).alias("__id"),
                      F.col(text_col).alias("__text"))
            .mapInPandas(fn, f"id {id_type}, ids array<int>"))
