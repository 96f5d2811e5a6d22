"""Distributed WordPiece tokenizer induction and encoding.

Completes the engine's tokenizer trio (BPE: ``operators/bpe.py``,
unigram-LM: ``operators/unigram.py``) with the BERT-family scheme
(Schuster & Nakajima, ICASSP 2012; Devlin et al. 2019 §2) — the same
greedy pair-merge loop as BPE but ranked by the LIKELIHOOD gain
``score(a, b) = count(ab) / (count(a) · count(b))`` instead of raw
pair frequency, and decoded by greedy longest-match-first against the
final vocabulary instead of merge-rank replay.

Shaped for Spark exactly like ``learn_bpe``:

* **Corpus-sized work happens once**: one tokenize + groupBy builds
  the (word, count) vocabulary relation; pair statistics only depend
  on word multiplicities.
* **The merge loop never rescans the corpus.**  Each iteration counts
  adjacent pairs AND current symbol occurrences on the vocab relation
  (two map-side-combined aggregates), joins them, and takes the
  argmax to the driver — ONE row per round.
* **The score ranking is EXACT at any scale**: the selection key is
  ``floor(count(ab) · 10^12 / (count(a) · count(b)))`` computed in
  DECIMAL(38,0) arithmetic (Spark's ``div`` on decimals is an exact
  floor quotient — verified against Python ``//``), ties broken by
  the lexicographically smallest ``"a b"`` pair string.  The same
  integers come out of the driver-local path's Python bignums, so
  path choice never changes the learned vocab (asserted in tests).
  The e12 floor is the DEFINED selection rule — two pairs whose true
  rational scores differ only below 1e-12 relative tie and fall to
  the string tie-break, which keeps the rule total, deterministic,
  and replayable in SQL (the bm25/pagerank integer parity class).

Symbol convention (BERT): a word's first character is a bare symbol,
every later character carries the ``##`` continuation prefix; merging
``(a, ##b)`` yields ``a + b`` (the prefix of the RIGHT side is
consumed).  ``wordpiece_encode`` is greedy longest-match-first with
the standard all-or-nothing UNK rule: a word with any unmatchable
position — or longer than ``max_word_chars`` — encodes as the single
``[UNK]`` token (HuggingFace's ``max_input_chars_per_word``
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import DRIVER_VOCAB_LIMIT, word_counts

#: continuation prefix (BERT convention)
CONT = "##"

#: score scale: the floor of score·1e12 is the selection key
SCORE_SCALE = 10 ** 12

#: words longer than this encode as [UNK] outright (HF convention;
#: also bounds the per-word encode loop)
MAX_WORD_CHARS = 100


def _init_syms(word: str) -> list[str]:
    return [word[0]] + [CONT + c for c in word[1:]]


def learn_wordpiece(df: DataFrame, text_col: str, num_merges: int,
                    min_pair_count: int = 2,
                    driver_vocab_limit: int = DRIVER_VOCAB_LIMIT
                    ) -> list[str]:
    """Train a WordPiece vocabulary on the corpus: returns the ordered
    token list — every base symbol observed in the corpus (bare first
    chars + ``##``-prefixed continuation chars, sorted), then one
    merged token per learned merge in merge order.  Stops early when
    the best remaining pair's weighted count falls below
    ``min_pair_count`` (score alone would happily merge two hapaxes).

    Two-level execution (the learn_bpe pattern): the corpus-sized
    tokenize+count always runs distributed; the merge LOOP runs
    driver-side when the distinct-word vocabulary fits, else each
    round is two vocab-sized aggregates + a 3-way join, with the
    score key in exact DECIMAL(38,0) arithmetic."""
    import pandas as pd

    from ..plans.exchange import ship_package

    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    spark = df.sparkSession
    ship_package(spark)
    wc = word_counts(df, text_col).localCheckpoint(eager=True)
    if wc.count() <= driver_vocab_limit:
        rows = wc.collect()
        return _learn_local({r["word"]: r["count"] for r in rows},
                            num_merges, min_pair_count)

    vocab_rel = (wc.withColumn("syms", F.expr(
        "concat(array(substring(word, 1, 1)), "
        "transform(filter(split(substring(word, 2), ''), "
        f"c -> c != ''), c -> '{CONT}' || c))"))
        .select("syms", "count").localCheckpoint(eager=True))
    base = sorted({r["s"] for r in vocab_rel
                   .select(F.explode("syms").alias("s"))
                   .distinct().collect()})
    tokens = list(base)

    pairs_expr = ("CASE WHEN size(syms) < 2 THEN "
                  "CAST(array() AS ARRAY<STRING>) "
                  "ELSE transform(sequence(1, size(syms) - 1), "
                  "i -> concat(element_at(syms, i), ' ', "
                  "element_at(syms, i + 1))) END")
    for _ in range(num_merges):
        pc = (vocab_rel
              .select(F.explode(F.expr(pairs_expr)).alias("pair"),
                      "count")
              .groupBy("pair").agg(F.sum("count").alias("p")))
        sc = (vocab_rel
              .select(F.explode("syms").alias("sym"), "count")
              .groupBy("sym").agg(F.sum("count").alias("c")))
        best = (pc
                .withColumn("l", F.expr("split_part(pair, ' ', 1)"))
                .withColumn("r", F.expr("split_part(pair, ' ', 2)"))
                .join(sc.select(F.col("sym").alias("l"),
                                F.col("c").alias("cl")), "l")
                .join(sc.select(F.col("sym").alias("r"),
                                F.col("c").alias("cr")), "r")
                .withColumn("score", F.expr(
                    f"(CAST(p AS DECIMAL(38,0)) * {SCORE_SCALE}) div "
                    "(CAST(cl AS DECIMAL(38,0)) * cr)"))
                .orderBy(F.col("score").desc(), F.col("pair").asc())
                .limit(1).collect())
        if not best or best[0]["p"] < min_pair_count:
            break
        left, right = best[0]["l"], best[0]["r"]
        joined = left + right[len(CONT):]
        tokens.append(joined)
        pair_key = f"{left} {right}"

        def rewrite(batches, _l=left, _r=right, _j=joined):
            for pdf in batches:
                out = []
                for syms in pdf["syms"]:
                    s, i, n = [], 0, len(syms)
                    while i < n:
                        if (i + 1 < n and syms[i] == _l
                                and syms[i + 1] == _r):
                            s.append(_j)
                            i += 2
                        else:
                            s.append(syms[i])
                            i += 1
                    out.append(s)
                pdf = pdf.copy()
                pdf["syms"] = out
                yield pdf

        has_pair = F.array_contains(F.expr(pairs_expr), F.lit(pair_key))
        matching = vocab_rel.where(has_pair)
        untouched = vocab_rel.where(~has_pair)
        rewritten = matching.mapInPandas(
            rewrite, "syms array<string>, count bigint")
        vocab_rel = rewritten.unionByName(untouched) \
            .localCheckpoint(eager=True)
    return tokens


def _learn_local(word_count: dict, num_merges: int,
                 min_pair_count: int) -> list[str]:
    """Driver-side merge loop — same statistics, same e12-floor score
    key (Python bignums are exact at any magnitude), same (score DESC,
    pair ASC) tie-break as the distributed rounds."""
    vocab: dict[tuple, int] = {}
    for w, c in word_count.items():
        if not w:
            continue
        syms = tuple(_init_syms(w))
        vocab[syms] = vocab.get(syms, 0) + c
    base: set[str] = set()
    for syms in vocab:
        base.update(syms)
    tokens = sorted(base)

    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for syms, c in vocab.items():
            for s in syms:
                sc[s] = sc.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(),
            key=lambda kv: (
                -((kv[1] * SCORE_SCALE)
                  // (sc[kv[0][0]] * sc[kv[0][1]])),
                kv[0][0] + " " + kv[0][1]))
        if cnt < min_pair_count:
            break
        joined = a + b[len(CONT):]
        tokens.append(joined)
        out: dict[tuple, int] = {}
        for syms, c in vocab.items():
            s, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    s.append(joined)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            t = tuple(s)
            out[t] = out.get(t, 0) + c
        vocab = out
    return tokens


def encode_word(word: str, vocab: set, unk: str = "[UNK]",
                max_word_chars: int = MAX_WORD_CHARS) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word.
    Word-initial candidates are bare vocab tokens (never ``##``-
    prefixed ones); later positions match ``##`` + remaining-prefix.
    Any unmatchable position — or a word longer than
    ``max_word_chars`` — yields the single ``unk`` token."""
    n = len(word)
    if n == 0:
        return []
    if n > max_word_chars:
        return [unk]
    out: list[str] = []
    p = 0
    while p < n:
        hit = None
        for e in range(n, p, -1):
            piece = word[p:e] if p == 0 else CONT + word[p:e]
            if p == 0 and piece.startswith(CONT):
                continue
            if piece in vocab:
                hit = piece
                p = e
                break
        if hit is None:
            return [unk]
        out.append(hit)
    return out


def wordpiece_vocab_ids(tokens: list, unk: str = "[UNK]") -> dict:
    """Deterministic token → id table for a learned vocabulary: the
    ``unk`` token takes id 0 (the BERT convention of special tokens
    first), then every learned token in :func:`learn_wordpiece`'s
    order (base symbols sorted, merges in merge order) — the id space
    a model-input pipeline ships."""
    vocab: dict[str, int] = {unk: 0}
    for t in tokens:
        vocab.setdefault(t, len(vocab))
    return vocab


def wordpiece_encode_ids(df: DataFrame, text_col: str, tokens: list,
                         out_col: str = "token_ids",
                         unk: str = "[UNK]",
                         max_word_chars: int = MAX_WORD_CHARS
                         ) -> DataFrame:
    """``wordpiece_encode`` + id lookup in one pass: append
    ``out_col`` = array<int> under :func:`wordpiece_vocab_ids`'s id
    space — the model-input mirror of ``bpe_encode_ids``.  The id
    table rides the same broadcast as the vocab set; no join, no
    extra shuffle over the token stream."""
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    ids = wordpiece_vocab_ids(tokens, unk)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(ids)
    enc = wordpiece_encode(df, text_col, set(tokens),
                           out_col="__wp_syms", unk=unk,
                           max_word_chars=max_word_chars)

    def to_ids(batches):
        v = bc.value
        u = v[unk]
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__wp_syms"] = [
                [v.get(s, u) for s in syms]
                for syms in pdf["__wp_syms"]]
            yield pdf

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out = enc.mapInPandas(to_ids, schema + ", `__wp_syms` array<int>")
    return out.withColumnRenamed("__wp_syms", out_col)


def wordpiece_encode(df: DataFrame, text_col: str, vocab,
                     out_col: str = "wp_tokens", unk: str = "[UNK]",
                     max_word_chars: int = MAX_WORD_CHARS) -> DataFrame:
    """Append ``out_col``: the text's WordPiece tokens under the
    learned vocabulary (greedy longest-match-first).  The vocab set
    broadcasts; each Arrow batch encodes every DISTINCT word once
    (the bpe_encode memo pattern), then stitches documents back
    together."""
    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    bc = spark.sparkContext.broadcast((frozenset(vocab), unk,
                                       max_word_chars))

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def fn(batches):
        vs, u, mx = bc.value
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            toks_out = []
            for words in pdf["__words"]:
                doc = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, vs, u, mx)
                        memo[w] = enc
                    doc.extend(enc)
                toks_out.append(doc)
            pdf = pdf.copy()
            pdf["__words"] = toks_out
            yield pdf

    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    tagged = df.withColumn("__words", F.expr(toks))
    out = tagged.mapInPandas(fn, schema + ", `__words` array<string>")
    return out.withColumnRenamed("__words", out_col)


def wordpiece_decode(df: DataFrame, tokens_col: str,
                     out_col: str = "text_decoded") -> DataFrame:
    """Inverse of :func:`wordpiece_encode`: a ``##``-prefixed token
    glues onto the current word, anything else starts a new one — one
    whole-stage-codegen fold (``aggregate`` + CASE), no UDF, scan
    speed at any size.  Round-trips ``wordpiece_encode``'s
    normalization (lowercase, single-space words); ``[UNK]`` decodes
    to itself — the lossy-by-construction leg every real tokenizer's
    round trip has."""
    return df.withColumn(out_col, F.trim(F.expr(
        f"aggregate({tokens_col}, '', (acc, x) -> CASE "
        f"WHEN startswith(x, '##') THEN concat(acc, substring(x, 3)) "
        f"ELSE concat(acc, ' ', x) END)")))


def wordpiece_decode_ids(df: DataFrame, ids_col: str, tokens: list,
                         out_col: str = "text_decoded",
                         unk: str = "[UNK]") -> DataFrame:
    """Inverse of :func:`wordpiece_encode_ids`: ids → tokens via the
    broadcast inverse of :func:`wordpiece_vocab_ids` (dense-id list
    indexing), then the :func:`wordpiece_decode` reassembly — one
    Arrow pass."""
    import pandas as pd

    from ..plans.exchange import ship_package

    spark = df.sparkSession
    ship_package(spark)
    vocab = wordpiece_vocab_ids(tokens, unk)
    inv = [None] * (max(vocab.values()) + 1)
    for t, i in vocab.items():
        inv[i] = t
    bc = spark.sparkContext.broadcast((inv, unk))

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in df.schema.fields)

    def fn(batches):
        iv, unk_tok = bc.value
        n = len(iv)
        for pdf in batches:
            texts = []
            for ids in pdf[ids_col]:
                parts = []
                for i in (ids if ids is not None else []):
                    t = iv[i] if 0 <= i < n and iv[i] is not None \
                        else unk_tok
                    if t.startswith("##"):
                        parts.append(t[2:])
                    else:
                        parts.append(" " + t)
                texts.append("".join(parts).strip())
            out = pdf.copy()
            out["__dec"] = texts
            yield out

    return (df.mapInPandas(fn, schema + ", `__dec` string")
            .withColumnRenamed("__dec", out_col))
