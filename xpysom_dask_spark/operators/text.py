"""Text-analysis operators for large-scale training-data pipelines.

Everything here is a **pure Spark SQL column expression** (higher-order
functions over arrays — JVM-side, whole-stage-codegen'd, no Python in the
hot path), so a 100 TB documents table is processed at scan speed with
full predicate pushdown.  Each operator has an exact DuckDB-SQL twin used
by the correctness oracle (__spark_entry__.oracle_sql) — except
``compression_ratio`` (zlib has no SQL twin; Arrow-batched kernel,
behavior pinned by unit tests).

Operators: tokenization + token counting, quality scoring
(length/alpha/whitespace/avg-token-length ratios), n-gram-free stopword
language ID, document fingerprinting (normalized-text MD5 + min-shingle
winnowing fingerprint + polynomial rolling hash), 32-bit SimHash.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

#: stopword tables for the language-ID heuristic (deterministic, tiny)
LANG_STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "fr": ("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "im", "zu"),
}
#: deterministic precedence for argmax ties
LANG_ORDER = ("en", "es", "fr", "de")

HASH_PRIME = 2147483647  # 2^31 − 1, keeps the rolling hash in BIGINT range
HASH_BASE = 131


def tokens(col: str) -> Column:
    """Whitespace tokens with empties dropped (robust to leading/trailing
    and repeated whitespace)."""
    return F.expr(f"filter(split({col}, '\\\\s+'), x -> x != '')")


def token_count(col: str) -> Column:
    return F.size(tokens(col))


#: the named entities the JVM-side strip_html decodes (covers ~99% of
#: real-web occurrences; &amp; LAST so "&amp;lt;" decodes to the
#: literal "&lt;" — double-encoded text stays text, the html.unescape
#: convention)
_HTML_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                  ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                  ("&amp;", "&"))


def _strip_tags(c: Column) -> Column:
    """Steps 1-2 of the HTML pipeline (script/style/comment drop,
    block tags → newlines, remaining tags removed) — the ONE
    definition both :func:`strip_html` and
    :func:`html_to_text(full_entities=True)` build on, so the two
    paths can never diverge on tag rules."""
    c = F.regexp_replace(
        c, "(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>", " ")
    c = F.regexp_replace(c, "(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, "(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|pre)\\s*>",
        "\n")
    c = F.regexp_replace(c, "(?i)<br\\s*/?>", "\n")
    return F.regexp_replace(c, "(?s)<[^>]*>", " ")


def strip_html(col: str) -> Column:
    """HTML → text as ONE whole-stage-codegen column expression — the
    crawl pipeline's first transform, kept JVM-side so a 100 TB WARC
    extraction is a narrow scan, not a Python boundary:

    1. drop ``<script>``/``<style>`` elements wholesale (their bodies
       are code, not prose) and ``<!-- -->`` comments;
    2. block-level closing tags and ``<br>`` become newlines (so
       paragraph structure survives for the line/paragraph dedup
       operators), every remaining tag is removed;
    3. the six ubiquitous named entities + decimal/hex numeric
       references for the ASCII range decode; ``&amp;`` decodes LAST
       (double-encoded entities stay literal, matching
       ``html.unescape`` composition);
    4. horizontal whitespace collapses, ≥3 newlines collapse to 2,
       ends trim.

    Full entity coverage (the long Unicode tail: ``&eacute;``,
    ``&#x1F600;`` …) needs a real parser table — that is
    :func:`html_to_text` with ``full_entities=True`` (Arrow batch +
    ``html.unescape``).  Differential-tested against a pure-Python
    reference on crafted and double-encoded HTML."""
    c = _strip_tags(F.col(col))
    # Only the entity forms that occur in bulk web text — each chained
    # regexp_replace deepens the codegen expression tree, so the JVM
    # path stays ~20 replaces deep; the long tail is
    # full_entities=True's job.  EVERY '&'-producing decode (&amp;,
    # &#38;) runs LAST so its output is never re-scanned — the
    # html.unescape single-pass composition ("&amp;lt;" stays the
    # literal "&lt;", and so does "&#38;lt;")
    for code, rep in ((34, '"'), (39, "'"), (60, "<"), (62, ">"),
                      (160, " ")):
        c = F.regexp_replace(c, f"(?i)&#(0*{code}|x0*{code:x});", rep)
    for ent, rep in _HTML_ENTITIES:
        if rep == "&":
            continue
        c = F.regexp_replace(c, ent.replace("#", "\\#"), rep)
    c = F.regexp_replace(c, "(?i)&(amp;|#0*38;|#x0*26;)", "&")
    c = F.regexp_replace(c, "[ \\t\\x0B\\f\\r]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    # NB: F.trim strips SPACES only; python .strip() (the reference)
    # strips all whitespace including the newlines step 2 introduced
    return F.regexp_replace(F.regexp_replace(c, "^\\s+", ""),
                            "\\s+$", "")


def html_to_text(df, html_col: str, out_col: str = "text",
                 full_entities: bool = False):
    """Apply :func:`strip_html` to ``html_col`` as ``out_col``.
    ``full_entities=True`` swaps step 3 for Python's complete
    ``html.unescape`` table inside an Arrow batch kernel (still
    vectorized, but a Python boundary — use it when the corpus is
    heavy on the named-entity long tail, keep the default JVM path
    for bulk extraction)."""
    if not full_entities:
        return df.withColumn(out_col, strip_html(html_col))
    import html as _html

    import pandas as pd

    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    cols = [c for c in df.columns if c != out_col]
    tag_stripped = df.withColumn("__t", _strip_tags(F.col(html_col)))

    # out_col REPLACES an existing column of the same name (the
    # in-place text-clean case) rather than duplicating it in the
    # Arrow schema
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields
                       if f.name != out_col) + f", {out_col} string"

    def fn(batches):
        import re

        ws = re.compile(r"[ \t\x0b\f\r]+")
        nl = re.compile(r" ?\n ?")
        nls = re.compile(r"\n{3,}")
        for b in batches:
            out = [nls.sub("\n\n", nl.sub("\n", ws.sub(
                " ", _html.unescape(t or "")))).strip()
                for t in b["__t"]]
            res = b[[c for c in cols]].copy()
            res[out_col] = pd.Series(out, index=b.index)
            yield res

    return tag_stripped.mapInPandas(fn, schema)


#: GPT-2-style pre-tokenizer pattern, simplified to the regex subset that
#: Spark (Java) and DuckDB (RE2) evaluate identically: contractions,
#: space-prefixed letter runs, digit runs, punctuation runs, whitespace.
BPE_PATTERN = ("'(s|t|re|ve|m|ll|d)|"
               " ?[a-zA-Z]+|"
               " ?[0-9]+|"
               " ?[^a-zA-Z0-9 ]+|"
               " +")


def token_count_bpe(col: str) -> Column:
    """BPE-ish token count: number of matches of the GPT-style
    pre-tokenizer pattern (whitespace runs excluded) — the standard
    proxy for LLM token budgeting when no tokenizer library is present.
    """
    return F.expr(
        f"size(filter(regexp_extract_all({col}, \"{BPE_PATTERN}\", 0), "
        "t -> t != ' ' AND trim(t) != ''))")


def alpha_ratio(col: str) -> Column:
    """Share of [a-z] characters — a basic quality signal."""
    return (F.length(F.regexp_replace(F.col(col), "[^a-z]", ""))
            / F.greatest(F.length(F.col(col)), F.lit(1))).cast("double")


def avg_token_len(col: str) -> Column:
    t = tokens(col)
    return (F.expr(
        f"aggregate(filter(split({col}, '\\\\s+'), x -> x != ''), 0L, "
        "(acc, x) -> acc + length(x))")
        / F.greatest(F.size(t), F.lit(1))).cast("double")


def quality_score(col: str) -> Column:
    """Composite [0,1] quality score: favors mid-length docs with high
    alphabetic density (a simple, fully-SQL heuristic)."""
    n_tok = token_count(col)
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    return (0.5 * len_score + 0.5 * alpha_ratio(col)).cast("double")


def encoding_signals(col: str) -> dict:
    """Encoding-artifact quality signals — the mojibake leg of the
    quality family (Gopher/C4 filter terms target STRUCTURE; a
    mis-decoded crawl shard shows up here instead): three integer
    Columns, engine-portable regex counting only.

    * ``n_replacement`` — U+FFFD replacement characters (the decoder
      already gave up on those bytes);
    * ``n_control`` — C0 control characters excluding \\t \\n \\r
      (legit text never contains them; their presence means binary
      junk or a wrong charset);
    * ``ascii_e6`` — floor-scaled-e6 fraction of printable-ASCII +
      whitespace characters (a collapsing ratio on a nominally-English
      source is the classic double-encoding symptom; for non-Latin
      corpora it is a baseline to DIFF against, not a threshold).
    """
    n = F.greatest(F.length(F.col(col)), F.lit(1))
    n_repl = F.length(F.regexp_replace(
        F.col(col), "[^�]", "")).cast("int")
    n_ctl = F.length(F.regexp_replace(
        F.col(col), "[^\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")) \
        .cast("int")
    ascii_len = F.length(F.regexp_replace(
        F.col(col), "[^\\x20-\\x7E\\t\\n\\r]", ""))
    ascii_e6 = F.floor(ascii_len.cast("double") / n.cast("double")
                       * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    return {"n_replacement": n_repl, "n_control": n_ctl,
            "ascii_e6": ascii_e6}


def lang_scores(col: str):
    """One stopword-hit-count column per language."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        lit = ", ".join(f"'{w}'" for w in words)
        out[lang] = F.expr(
            f"size(filter(filter(split(lower({col}), '\\\\s+'), x -> x != ''), "
            f"t -> t IN ({lit})))")
    return out


def lang_id_case_sql(score_cols=None) -> str:
    """The shared CASE expression (identical text on Spark and DuckDB):
    first language in LANG_ORDER whose score ties-or-beats all later ones
    and is positive; 'und' otherwise."""
    score_cols = score_cols or {l: f"s_{l}" for l in LANG_ORDER}
    clauses = []
    for i, lang in enumerate(LANG_ORDER):
        conds = [f"{score_cols[lang]} > 0"]
        conds += [f"{score_cols[lang]} >= {score_cols[o]}"
                  for o in LANG_ORDER[i + 1:]]
        clauses.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def lang_id(col: str) -> Column:
    """argmax over stopword scores with fixed precedence; 'und' when no
    stopwords hit at all."""
    # inline the score expressions into the shared CASE text
    lit = {l: f"size(filter(filter(split(lower({col}), '\\\\s+'), x -> x != ''), "
              f"t -> t IN ({', '.join(repr(w) for w in LANG_STOPWORDS[l])})))"
           for l in LANG_ORDER}
    return F.expr(lang_id_case_sql(lit))


def normalized_text(col: str) -> Column:
    """Lowercase + whitespace-collapsed + trimmed canonical form."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), "\\s+", " "))


def md5_fingerprint(col: str) -> Column:
    """Exact-dup fingerprint: MD5 hex of the normalized text."""
    return F.md5(normalized_text(col))


def min_shingle_fingerprint(col: str, width: int = 8) -> Column:
    """Winnowing-lite near-dup fingerprint: lexicographic min of the MD5s
    of all ``width``-char shingles of the normalized text.

    The normalized text is bound once via a single-element-array lambda
    (``transform(array(t), tt -> ...)``) — referencing ``t`` directly at
    every shingle position would re-run the regexp normalization per
    position (O(len²) regexp work per document).

    Positional ``substring(tt, i, w)`` on a STRING is itself O(i) in
    Spark (UTF8String re-scans for char boundaries from the front), so
    a substring-per-position loop is O(len²) per document — measured
    92 s for the 50k-doc sf1 fingerprint pass vs 16 s for this form.
    Pure-ASCII text (length == octet_length, the overwhelming case
    after normalization) takes the BYTE path: ``substr`` on BINARY is
    a plain O(1) byte-offset slice and byte shingles ≡ char shingles;
    anything multi-byte falls back to an O(len) char-array slice.
    Both branches are bit-identical to the original definition
    (min of md5 over all width-CHAR shingles) — differentially tested
    in test_curation2.py, non-ASCII included.
    """
    t = f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"
    w = width
    byte_path = (f"array_min(flatten(transform(array(encode(tt, 'utf-8')), "
                 f"bs -> transform(sequence(1, greatest(length(bs) - {w - 1}, 1)), "
                 f"i -> md5(substr(bs, i, {w}))))))")
    char_path = (f"array_min(flatten(transform(array(split(tt, '')), "
                 f"cs -> transform(sequence(1, greatest(size(cs) - {w - 1}, 1)), "
                 f"i -> md5(array_join(slice(cs, i, {w}), ''))))))")
    return F.expr(
        f"flatten(transform(array({t}), tt -> array("
        f"CASE WHEN length(tt) = octet_length(tt) "
        f"THEN {byte_path} ELSE {char_path} END)))[0]")


def rolling_hash(col: str) -> Column:
    """Polynomial rolling hash of the raw text (base {base}, mod 2³¹−1);
    0 for the empty string.  Cheap 64-bit-safe content id."""
    # split-to-chars, NOT substring(col, i, 1) per position: positional
    # substring on a string is O(i) (UTF8String char-boundary rescan),
    # which turns the fold into O(len²) per document
    return F.expr(
        f"CASE WHEN length({col}) = 0 THEN 0 ELSE "
        f"aggregate(transform(split({col}, ''), c -> ascii(c)), 0L, "
        f"(acc, c) -> (acc * {HASH_BASE} + c) % {HASH_PRIME}) END")


def simhash(col: str, bits: int = 60) -> Column:
    """``bits``-bit SimHash over whitespace tokens (multiset), bits ≤ 60.

    Bit j of each token's MD5 (first bits/4 hex nibbles) votes ±1; the
    sign of the aggregate vote sets bit j of the fingerprint.  Ties
    (vote == 0) resolve to 0.  Pure nested higher-order expression — one
    narrow pass.

    Cost shape: each token is MD5'd exactly ONCE (``hs``), then a single
    aggregate folds the bit-votes as an array accumulator — O(bits·T)
    integer ops.  The naive form (one vote-aggregate per output bit,
    md5 inside) is O(bits·T) *md5 calls* — ~30× slower, same values.
    """
    if bits % 4 or not 4 <= bits <= 60:
        raise ValueError("bits must be a multiple of 4 in [4, 60]")
    nib = bits // 4
    toks = f"filter(split({col}, '\\\\s+'), x -> x != '')"
    # token → first `nib` md5 nibbles as an int (bit j of the simhash
    # reads bit bits-1-j of this int — big-endian nibble order)
    hs = (f"transform({toks}, "
          f"t -> CAST(conv(substring(md5(t), 1, {nib}), 16, 10) AS BIGINT))")
    votes = (f"aggregate({hs}, "
             f"array_repeat(0L, {bits}), "
             "(acc, h) -> zip_with(acc, "
             f"transform(sequence(0, {bits - 1}), "
             f"j -> CASE WHEN (shiftright(h, {bits - 1} - j) & 1) = 1 "
             "THEN 1L ELSE -1L END), (a, b) -> a + b))")
    collapse = (f"transform(sequence(0, {bits - 1}), "
                "j -> CASE WHEN element_at(vs, j + 1) > 0 "
                "THEN shiftleft(1L, j) ELSE 0L END)")
    return F.expr(
        f"aggregate(flatten(transform(array({votes}), vs -> {collapse})), "
        "0L, (acc, v) -> acc + v)")


def simhash_table(df, text_col: str, id_col: str, bits: int = 60):
    """(id, sh) SimHash relation — the high-throughput form.

    Same values as ``simhash(col, bits)`` but shaped for corpora: explode
    tokens (narrow) → one md5/conv hash per token (codegen) → groupBy(id)
    with ``bits`` map-side-combinable ``SUM(sign-of-bit)`` aggregates →
    codegen'd bit pack.  Everything stays in whole-stage codegen; the
    column-expression form evaluates ~2·bits interpreted lambda calls per
    token.  Token-less documents keep fingerprint 0 (LEFT JOIN back).
    """
    from pyspark.sql import DataFrame  # noqa: F401

    if bits % 4 or not 4 <= bits <= 60:
        raise ValueError("bits must be a multiple of 4 in [4, 60]")
    nib = bits // 4
    toks = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    tk = df.select(F.col(id_col).alias("id"),
                   F.explode(F.expr(toks)).alias("tok"))
    h = tk.select("id", F.expr(
        f"CAST(conv(substring(md5(tok), 1, {nib}), 16, 10) AS BIGINT)")
        .alias("h"))
    votes = h.groupBy("id").agg(*[
        F.sum(F.when(F.expr(f"(shiftright(h, {bits - 1 - j}) & 1) = 1"),
                     1).otherwise(-1)).alias(f"v{j}")
        for j in range(bits)])
    pack = " + ".join(
        f"CASE WHEN v{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END"
        for j in range(bits))
    sh = votes.select("id", F.expr(pack).alias("sh"))
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return (ids.join(sh, "id", "left")
            .select("id", F.coalesce("sh", F.lit(0)).alias("sh")))


def simhash32(col: str) -> Column:
    """32-bit SimHash (see ``simhash``)."""
    return simhash(col, 32)


def simhash60(col: str) -> Column:
    """60-bit SimHash — the near-dup default: with 4 × 15-bit LSH bands
    the chance-collision bucket space is 2¹⁵ (vs 2⁸ for 32-bit/8-bit
    bands), cutting spurious candidate pairs ~128× at equal recall for
    Hamming ≤ 3 (pigeonhole over 4 bands)."""
    return simhash(col, 60)


def corpus_report(df, text_col: str, group_cols=("lang",),
                  exact_quantiles: bool = False):
    """Per-group corpus statistics: (group..., n_docs, n_tokens,
    avg_quality, p50_chars, p90_chars) — the standard pre-training
    corpus audit, one aggregation pass.

    Counts and averages are map-side combinable everywhere.  Quantiles:
    the default ``exact_quantiles=False`` uses ``percentile_approx``
    (a mergeable sketch — constant memory per group, the 100 TB path);
    ``True`` switches to exact ``percentile`` (full value buffer per
    group) for oracle comparison and small corpora.

    The per-row signals project ONCE before the aggregate
    (optimization r13, guide §2.3 project-before-the-exchange):
    ``quality_score`` embeds its own ``token_count``, so the aggregate
    form split every document twice per row — the projection computes
    the token count once and derives the quality score from it with
    bit-identical arithmetic (same expressions, same order).
    """
    n_tok = token_count(text_col)
    length = F.length(F.col(text_col)).cast("double")
    # quality_score(text_col) ≡ 0.5·min(n_tok/100, 1) + 0.5·alpha_ratio
    # with n_tok the SAME token_count — reusing the projected column
    # keeps every double op identical
    pre = df.select(
        *[F.col(c) for c in group_cols],
        n_tok.alias("__n_tok"),
        length.alias("__len"),
        alpha_ratio(text_col).alias("__alpha"))
    quality = (0.5 * F.least(F.col("__n_tok") / F.lit(100.0), F.lit(1.0))
               + 0.5 * F.col("__alpha")).cast("double")
    if exact_quantiles:
        p50 = F.percentile(F.col("__len"), F.lit(0.5))
        p90 = F.percentile(F.col("__len"), F.lit(0.9))
    else:
        p50 = F.percentile_approx(F.col("__len"), F.lit(0.5), F.lit(10000))
        p90 = F.percentile_approx(F.col("__len"), F.lit(0.9), F.lit(10000))
    return (pre.groupBy(*[F.col(c) for c in group_cols])
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("__n_tok")).cast("bigint")
                 .alias("n_tokens"),
                 F.avg(quality).alias("avg_quality"),
                 p50.alias("p50_chars"),
                 p90.alias("p90_chars")))


def top_terms_tfidf(df, text_col: str, group_col: str, id_col: str,
                    k: int = 10, min_df: int = 2):
    """Top-k distinctive terms per group by TF-IDF:
    (group, rank, term, tf, df_docs, score).

    score = tf(term, group) · ln(N / df(term)), with tf the raw term
    count inside the group, df the number of distinct DOCUMENTS
    containing the term corpus-wide, N the corpus document count.
    ``min_df`` drops hapax noise.  Ties break by term for determinism.

    Plan shape (all shuffles on keys with bounded cardinality, every
    aggregation map-side combinable):
      1. explode lowercased tokens once → (group, doc, term);
      2. tf: groupBy (group, term); df: distinct (doc, term) → groupBy
         term; N: scalar count — three aggregates over the same cheap
         explode (re-derived per consumer: materializing the exploded
         corpus to share it costs more than the extra tokenize);
      3. join tf⋈df on term (df side is |vocab| rows — hash join),
         then one window top-k per group.
    """
    from pyspark.sql import Window

    from ..plans.exchange import ensure_min_parallelism

    n_docs = df.count()
    # no checkpoint on the exploded tokens (optimization r13): the
    # eager localCheckpoint materialized a CORPUS-sized relation (every
    # token row) to executor storage to save ONE re-tokenize between
    # the tf and df consumers — the som_anomalies rule (never
    # materialize the corpus to save a narrow pass) applies, and the
    # interleaved sf0.1 A/B agrees in sign in both sessions: none
    # med 1.55/1.45 s vs eager 1.70/1.72 (row-identical outputs).
    toks = (ensure_min_parallelism(df)
            .select(F.col(group_col).alias("grp"),
                    F.col(id_col).alias("doc"),
                    F.explode(tokens(f"lower({text_col})")).alias("term")))
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (toks.select("doc", "term").distinct()
             .groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
             .where(F.col("df_docs") >= min_df))
    scored = (tf.join(dfreq, "term")
              .withColumn("score",
                          F.col("tf")
                          * F.log(F.lit(float(n_docs)) / F.col("df_docs"))))
    w = Window.partitionBy("grp").orderBy(F.col("score").desc(),
                                          F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("grp").alias(group_col), "rank", "term",
                    "tf", "df_docs", "score"))


def ngram_repetition_ratio(col: str, n: int = 2) -> Column:
    """Share of repeated word n-grams inside one document:
    ``1 − distinct_ngrams / total_ngrams`` (0 when fewer than n tokens).

    The duplicate-n-gram signal of the Gopher/MassiveText quality rules
    — high values flag boilerplate and degenerate repetition.  Pure SQL
    over the token array (one pass, codegen'd), with an exact DuckDB
    twin.
    """
    t = f"filter(split(lower({col}), '\\\\s+'), x -> x != '')"
    gram = " || ' ' || ".join(f"element_at(t, i + {j})" for j in range(n))
    grams = (f"transform(sequence(1, size(t) - {n - 1}), i -> {gram})")
    # bind the token array once via a one-element transform (the
    # min_shingle_fingerprint trick) so the document is tokenized once,
    # not once per n-gram position
    body = (f"transform(array({t}), t -> "
            f"CASE WHEN size(t) < {n} THEN CAST(0 AS DOUBLE) "
            f"ELSE 1.0 - size(array_distinct({grams})) "
            f"/ CAST(size({grams}) AS DOUBLE) END)")
    return F.expr(f"element_at({body}, 1)")


def mean_word_length(col: str) -> Column:
    """Mean token length in characters (0 for empty docs)."""
    t = f"filter(split(lower({col}), '\\\\s+'), x -> x != '')"
    return F.expr(
        f"element_at(transform(array({t}), t -> CASE WHEN size(t) = 0 "
        "THEN CAST(0 AS DOUBLE) ELSE "
        "aggregate(t, CAST(0 AS DOUBLE), (a, x) -> a + length(x)) "
        "/ size(t) END), 1)")


def repetition_signals(df, text_col: str, id_col: str,
                       top_ns=(2, 3, 4), dup_ns=(5,)):
    """The Gopher/MassiveText REPETITION signals (Rae et al. 2021,
    §A1.1) that ``gopher_quality_flags``'s narrow per-doc expressions
    don't cover — the ones needing per-document n-gram frequency
    tables:

    * ``top{n}gram_share`` for n ∈ ``top_ns``: characters claimed by
      the single most frequent word n-gram (occurrences × n-gram
      length / space-joined doc length); Gopher filters at
      0.20/0.18/0.16 for n = 2/3/4.
    * ``dup{n}gram_share`` for n ∈ ``dup_ns``: characters claimed by
      ALL n-grams occurring more than once (every occurrence counted;
      overlapping occurrences are NOT unioned — the cheap upper bound,
      deterministic and engine-replayable, vs the position-union
      variant some filters use).  Both shares can exceed 1.0 for
      self-overlapping degenerate repetition ("a a a a …") — exactly
      the documents a threshold filter should kill, so no clamp.
    * ``dup_line_frac`` / ``dup_line_char_frac``: fraction of lines
      (and of line characters) that are copies of another line in the
      SAME document.

    Ties for "most frequent" break lexicographically (smallest
    n-gram), so every column is a pure function of the text — the
    whole report hash-matches an external SQL replay.

    Scale shape: one explode per n + one map-side-combined count keyed
    by (id, n-gram) — O(corpus tokens) shuffle traffic, the same
    asymptotics as ``word_shingles`` — then per-doc aggregates of the
    O(distinct grams) relation.  No windows, no UDFs.
    """
    if not top_ns and not dup_ns:
        raise ValueError("need at least one of top_ns/dup_ns")
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    base = df.select(F.col(id_col).alias("id"),
                     F.expr(toks).alias("t"),
                     F.split(F.col(text_col), "\n").alias("ls"))
    base = base.withColumn(
        "tlen", F.length(F.array_join("t", " "))).localCheckpoint()

    # per-n pipelines (optimization r13 adjudication): round 12 folded
    # the four n-legs into ONE tagged union + one groupBy(id, tlen,
    # gn, g) (24 -> 6 Exchanges), but the driver's r12 bench showed it
    # SLOWER in both its runs (1.31 -> 1.93 s @32c, 1.90 @8c), and a
    # 5-round interleaved same-session A/B at sf0.1 confirms: per-n
    # med 2.30 s / min 1.79 vs union med 2.64 / min 2.01, outputs
    # row-identical.  The union never reduced shuffled BYTES -- each
    # leg's grams cross an exchange either way, only the exchange
    # COUNT fell -- so at 100 TB the two forms move the same traffic
    # and the measured sf0.1 winner is the keeper.
    out = base.select("id")
    for n in sorted(set(top_ns) | set(dup_ns)):
        gram = "concat_ws(' ', " + ", ".join(
            f"element_at(t, i + {j})" for j in range(n)) + ")"
        grams = (f"CASE WHEN size(t) < {n} THEN array() ELSE "
                 f"transform(sequence(1, size(t) - {n - 1}), "
                 f"i -> {gram}) END")
        gc = (base.select("id", "tlen",
                          F.explode(F.expr(grams)).alias("g"))
              .groupBy("id", "tlen", "g")
              .agg(F.count(F.lit(1)).alias("c")))
        aggs = []
        if n in top_ns:
            # min of (-count, gram): most frequent, ties -> smallest
            aggs.append(F.min(F.struct(
                (-F.col("c")).alias("nc"), F.col("g"))).alias("top"))
        if n in dup_ns:
            aggs.append(F.sum(F.when(
                F.col("c") >= 2,
                F.col("c") * F.length("g")).otherwise(0))
                .alias("dupchars"))
        per = gc.groupBy("id", "tlen").agg(*aggs)
        cols = [F.col("id")]
        safe_len = F.when(F.col("tlen") > 0, F.col("tlen").cast("double"))
        if n in top_ns:
            cols.append(F.coalesce(
                (-F.col("top.nc")) * F.length("top.g") / safe_len,
                F.lit(0.0)).alias(f"top{n}gram_share"))
        if n in dup_ns:
            cols.append(F.coalesce(
                F.col("dupchars") / safe_len,
                F.lit(0.0)).alias(f"dup{n}gram_share"))
        out = out.join(per.select(*cols), "id", "left")

    lines = (base.select("id",
                         F.explode("ls").alias("line"))
             .groupBy("id", "line")
             .agg(F.count(F.lit(1)).alias("c"),
                  F.length("line").alias("ll")))
    lrep = (lines.groupBy("id").agg(
        (F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
         / F.sum("c")).alias("dup_line_frac"),
        (F.sum(F.when(F.col("c") >= 2, F.col("c") * F.col("ll"))
               .otherwise(0))
         / F.when(F.sum(F.col("c") * F.col("ll")) > 0,
                  F.sum(F.col("c") * F.col("ll")).cast("double")))
        .alias("dup_line_char_frac")))
    out = out.join(
        lrep.select("id", "dup_line_frac",
                    F.coalesce("dup_line_char_frac", F.lit(0.0))
                    .alias("dup_line_char_frac")), "id", "left")
    fill = {f"top{n}gram_share": 0.0 for n in top_ns}
    fill.update({f"dup{n}gram_share": 0.0 for n in dup_ns})
    return out.fillna(fill).withColumnRenamed("id", id_col)


def gopher_quality_flags(df, text_col: str,
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         min_alpha_ratio: float = 0.6,
                         max_repetition: float = 0.3):
    """Append the Gopher-rule-inspired quality columns and a combined
    ``passes_gopher`` flag: word-count bounds, mean-word-length bounds,
    alphabetic-character ratio, duplicate-bigram ratio.  All narrow
    codegen'd expressions — the 100 TB quality gate is one scan.

    These are the *document-shape* rules of the MassiveText/Gopher
    filtering recipe (Rae et al. 2021, §A1.1), restricted to the
    signals computable without a language model.

    All three token-derived stats come out of ONE tokenization: the
    token array is bound once in a struct-producing lambda (a multi-use,
    non-cheap alias blocks CollapseProject from re-inlining the split
    per field — the word_shingles lesson; verified 1 ``split()`` in the
    optimized plan).  A filter on the flag that gets pushed below the
    projection re-derives the stats from the base column, where
    whole-stage codegen's subexpression elimination dedupes the
    identical tokenizer subtrees at runtime.
    """
    t = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    gram = "element_at(t, i) || ' ' || element_at(t, i + 1)"
    grams = f"transform(sequence(1, size(t) - 1), i -> {gram})"
    stats = (
        f"element_at(transform(array({t}), t -> struct("
        "size(t) AS nw, "
        "CASE WHEN size(t) = 0 THEN CAST(0 AS DOUBLE) ELSE "
        "aggregate(t, CAST(0 AS DOUBLE), (a, x) -> a + length(x)) "
        "/ size(t) END AS mwl, "
        f"CASE WHEN size(t) < 2 THEN CAST(0 AS DOUBLE) ELSE "
        f"1.0 - size(array_distinct({grams})) "
        f"/ CAST(size({grams}) AS DOUBLE) END AS rep)), 1)")
    out = (df.withColumn("_g", F.expr(stats))
           .withColumn("_ar", alpha_ratio(text_col)))
    wc, mwl, rep = (F.col("_g")["nw"], F.col("_g")["mwl"],
                    F.col("_g")["rep"])
    ar = F.col("_ar")
    return (out
            .withColumn("n_words", wc)
            .withColumn("mean_word_len", mwl)
            .withColumn("alpha_ratio", ar)
            .withColumn("bigram_repetition", rep)
            .withColumn(
                "passes_gopher",
                (wc >= min_words) & (wc <= max_words)
                & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len)
                & (ar >= min_alpha_ratio)
                & (rep <= max_repetition))
            .drop("_g", "_ar"))


# --------------------------------------------------------------------- #
# PII redaction

#: (name, pattern, replacement) — patterns restricted to the syntax
#: subset Java regex (Spark) and RE2 (DuckDB/Go scanners) both accept:
#: no backreferences, no lookaround, only \d/\b/classes/quantifiers —
#: so one pattern table drives the engine and its oracle twin.
#: Order matters: emails before IPv4 (addresses contain dotted digit
#: runs), IPv4 before phone (both are digit runs).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(col: str) -> Column:
    """Replace every email / IPv4 / phone-shaped span with a typed
    placeholder token.  Three chained `regexp_replace` calls — JVM
    regex inside whole-stage codegen, one pass per pattern over the
    string, no Python — applied in the declared order so overlapping
    shapes resolve deterministically."""
    out = F.col(col)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


#: URL shape: scheme://host[:port][/path] — RE2-compatible (no
#: backrefs/lookarounds).  The host must END alphanumeric and the
#: path must not end in sentence punctuation, so 'see http://x.com.'
#: and 'at https://x.com/story, which' extract the URL without the
#: trailing '.'/',' — otherwise the same page cited mid-sentence vs
#: end-of-clause splits URL-level dedup keys
_URL_RE = (r"https?://[A-Za-z0-9-]([A-Za-z0-9.-]*[A-Za-z0-9])?"
           r"(:[0-9]+)?"
           r"(/([^\s\"'<>\)\]]*[^\s\"'<>\)\].,;:!?])?)?")
#: registrable-ish domain: last two labels, with the common two-level
#: public suffixes (co.uk-class) folded to three labels
_TWO_LEVEL_SUFFIXES = ("co.uk", "ac.uk", "gov.uk", "com.au", "net.au",
                       "co.jp", "or.jp", "com.br", "com.cn", "co.in",
                       "co.kr", "com.mx")


def extract_urls(df, text_col: str, id_col: str):
    """Every URL occurrence in every document — ``(id, url, host,
    domain)``, one row per occurrence: the raw relation behind link-
    spam scoring, per-domain quotas (feed ``domain`` to
    ``sampling.per_source_quota``-style caps), and URL-level dedup.

    One regex extract-all + explode (narrow, no shuffle); ``host``
    lowercases and strips the port; ``domain`` is the registrable
    approximation — last two labels, or three when the suffix is a
    common two-level public suffix (the full PSL is a data file, not
    an expression; the approximation is the standard curation trade
    and is documented at the call site)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(_URL_RE),
                                F.lit(0))
    host = F.lower(F.regexp_extract(
        F.col("url"), r"https?://([A-Za-z0-9.-]+)", 1))
    suffix_alt = "|".join(s.replace(".", "\\.")
                          for s in _TWO_LEVEL_SUFFIXES)
    domain = F.when(
        F.col("host").rlike(f"(^|\\.)[a-z0-9-]+\\.({suffix_alt})$"),
        F.regexp_extract(F.col("host"),
                         f"([a-z0-9-]+\\.({suffix_alt}))$", 1)) \
        .otherwise(F.regexp_extract(
            F.col("host"), r"([a-z0-9-]+\.[a-z0-9-]+)$", 1))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(urls).alias("url"))
            .withColumn("host", host)
            .withColumn("domain", domain))


#: query parameters that never change the resource: click/campaign
#: trackers.  The list is the common curation set; extend per corpus.
#: Deliberately NOT included: ``ref`` — despite appearing in tracker
#: lists, it is frequently semantic (git refs, forum post anchors),
#: and a canonicalizer that merges distinct resources silently drops
#: real documents at the dedup step.
#: (?i): param NAMES match case-insensitively ('?UTM_SOURCE=x' and
#: '?Fbclid=zz' are the same trackers — ADVICE r9); VALUES are never
#: touched.
_TRACKING_PARAM_RE = (r"(?i)^(utm_[a-z]+|fbclid|gclid|dclid|msclkid|"
                      r"mc_cid|mc_eid|igshid|ref_src|spm|yclid|"
                      r"_ga|mkt_tok)=")


def canonicalize_url(col) -> Column:
    """Canonical form of a URL column — the key URL-level dedup and
    per-URL frequency counting should group on (the same crawl page
    arrives as ``http://WWW.X.com/a/?utm_source=feed#top`` and
    ``https://x.com/a``):

    * scheme + host lowercased; ``www.`` and default ports
      (``:80`` http / ``:443`` https) stripped from the host;
    * fragment dropped; tracking query params
      (``utm_*``/``gclid``/...) removed; surviving params sorted
      (param ORDER is almost never semantic — the standard
      canonicalization trade, documented here);
    * trailing slashes stripped from the path, so ``/a/`` ≡ ``/a``
      and the root path ≡ no path.

    Pure codegen string/array expressions (regexp + split + filter +
    array_sort + concat) — scan-speed, no UDF, no shuffle.  Values
    that don't look like an http(s) URL pass through unchanged, so
    the function is safe on mixed columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([Hh][Tt][Tt][Pp][Ss]?)://", 1))
    # authority = everything between :// and the first /?#; userinfo
    # ends at the LAST @ inside it (RFC 3986).  Canonicalize ONLY when
    # what remains is a structurally valid host[:port] — anything else
    # (IPv6 literals, embedded spaces, junk) passes through unchanged,
    # which also makes the function a fixed point on its own output.
    auth = F.regexp_extract(u, r"^[Hh][Tt][Tt][Pp][Ss]?://([^/?#]*)", 1)
    hostport = F.lower(F.regexp_replace(auth, r"^.*@", ""))
    valid = hostport.rlike(r"^[a-z0-9.\-]+(:[0-9]+)?$")
    rest = F.regexp_extract(
        u, r"^[Hh][Tt][Tt][Pp][Ss]?://[^/?#]*(.*)$", 1)
    # strip 'www.' only when at least one more dot-separated label
    # remains: http://www.com must NOT become http://com (a host whose
    # registrable label IS 'www' — ADVICE r9); Java regex supports the
    # lookahead
    host = F.regexp_replace(hostport, r"^www\.(?=[^.:]+\.)", "")
    host = F.when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")) \
            .when(scheme == "https",
                  F.regexp_replace(host, r":443$", "")) \
            .otherwise(host)
    parts = F.split(rest, r"\?", 2)
    path = F.regexp_replace(F.element_at(parts, 1), r"/+$", "")
    query = F.when(F.size(parts) > 1, F.element_at(parts, 2)) \
             .otherwise(F.lit(""))
    kept = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE)))
    qtail = F.when(F.size(kept) > 0,
                   F.concat(F.lit("?"), F.array_join(kept, "&"))) \
             .otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, qtail)
    # not http(s), or not a well-formed host: pass through unchanged
    # rather than emit a mangled key
    return F.when((scheme == "") | ~valid, c).otherwise(canon)


def domain_blocklist_filter(df, host_col: str, blocklist_df,
                            id_col: str, mode: str = "block"):
    """Drop (``mode='block'``) or keep (``'allow'``) rows whose host
    matches a domain list by SUFFIX — ``ads.example.com`` matches a
    listed ``example.com`` — the crawl-curation blocklist gate
    (UT1/adult/malware lists are registrable domains; subdomains must
    inherit the verdict).

    Scale shape: each host explodes into its ≤ label-count dot-suffixes
    (bounded fanout, narrow), left-semi joins the blocklist (AQE
    broadcasts it while it is small — real blocklists are a few
    million rows, well inside broadcast range after dedup), and the
    matched-id set anti/semi-joins back on ``id_col``.  The corpus
    text never moves — only (id, suffix) digests.  ``blocklist_df``
    must have a ``domain`` column, already lowercased registrable
    domains."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    labels = F.split(F.lower(F.col(host_col)), r"\.")
    sufs = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(
            F.slice(labels, i, F.size(labels) - i + 1), "."))
    matched = (df.select(F.col(id_col).alias("__mid"),
                         F.explode(sufs).alias("__suf"))
               .join(blocklist_df.select(
                   F.lower(F.col("domain")).alias("__suf")),
                   "__suf", "left_semi")
               .select("__mid").distinct())
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(matched,
                   F.col(id_col) == F.col("__mid"), how)


def domain_counts(df, text_col: str, id_col: str):
    """Per-domain link statistics over the corpus: ``(domain, n_urls,
    n_docs)`` — the input to per-domain caps and link-farm detection
    (one domain dominating the corpus's links is the classic SEO-spam
    signature).  One map-side-combinable aggregation over the
    :func:`extract_urls` relation."""
    u = extract_urls(df, text_col, id_col)
    return (u.where(F.col("domain") != "")
            .groupBy("domain")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"),
                 F.countDistinct("id").cast("bigint").alias("n_docs")))


def pseudonymize(df, cols, salt: str, tag_len: int = 16):
    """Deterministic keyed tokenization of identifier columns: each
    value becomes the first ``tag_len`` hex chars of
    ``sha256(salt ':' value)`` — the privacy-safe-export companion to
    :func:`redact_pii`.  Equal values map to equal tags, so joins,
    groupBys, and dedup keyed on the column keep working across tables
    pseudonymized with the SAME salt, while the mapping is
    irreversible without it (rotate the salt per export to break
    cross-export linkage).  Pure codegen expression work — scan-speed,
    no shuffle, composes with column pruning; at 64 bits (16 hex)
    collisions are negligible below ~2^32 distinct values."""
    if not 1 <= int(tag_len) <= 64:
        raise ValueError(f"pseudonymize: tag_len must be 1..64, "
                         f"got {tag_len}")
    out = df
    for c in cols:
        tag = F.substring(
            F.sha2(F.concat(F.lit(salt), F.lit(":"),
                            F.col(c).cast("string")), 256),
            1, int(tag_len))
        out = out.withColumn(c, F.when(F.col(c).isNull(), None)
                             .otherwise(tag))
    return out


def pii_counts(col: str) -> list[Column]:
    """One ``n_<name>`` BIGINT count column per PII pattern (matches
    counted on the ORIGINAL text, before redaction)."""
    return [F.regexp_count(F.col(col), F.lit(pat)).cast("bigint")
            .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]


# --------------------------------------------------------------------- #
# corpus language-model scoring (CCNet-style quality filtering)

def vocab_counts(df, text_col: str, min_count: int = 1):
    """Corpus-wide term frequency table: ``term, n`` with n ≥
    ``min_count`` — the vocabulary/frequency artifact tokenizer
    training and LM scoring both start from.

    One explode (narrow) + one partial-aggregated shuffle keyed on the
    term; ``min_count`` prunes the long hapax tail AFTER the aggregate
    (the count isn't known before it), which is where the output — not
    the shuffle — shrinks.  Traffic is O(partitions · distinct terms)
    thanks to map-side combine, not O(total tokens).
    """
    return (df.select(F.explode(tokens(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .where(F.col("n") >= int(min_count)))


def unigram_logprob_score(df, text_col: str, id_col: str,
                          decimals: int = 6):
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM: ``id, n_tok, avg_logp`` — the cheap stand-in for the
    CCNet/KenLM perplexity filter: documents of rare, never-repeated
    junk score far below documents of common well-distributed language,
    and thresholding on ``avg_logp`` is the classic quality gate.

    Within-corpus scoring has no OOV (every token appears ≥ 1 time), so
    no smoothing term muddies the oracle.  Plan: the token explode is
    evaluated twice (once into the count aggregate, once into the
    scoring join) — two narrow scans; the vocabulary join broadcasts
    when the post-aggregate vocab is small (it is: Heaps' law keeps
    distinct terms ≪ corpus size), then one groupBy(id) closes the
    per-document mean.  The total-token count rides the vocab aggregate
    as ONE extra scalar (windowless sum), broadcast with it.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("term"))
    # materialize the vocab counts (≤ distinct-terms rows): they feed
    # both the total scalar and the scoring join — without it the
    # token explode + groupBy re-executed once per consumer, i.e. the
    # corpus was tokenized 3× per run (optimization r12, guide §1.2)
    counts = (toks.groupBy("term")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
              .localCheckpoint(eager=True))
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    scored = (toks.join(F.broadcast(counts), "term")
              .crossJoin(F.broadcast(total)))
    logp = F.log(F.col("n").cast("double") / F.col("total"))
    return (scored.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"),
                 F.round(F.sum(logp) / F.count(F.lit(1)), decimals)
                 .alias("avg_logp")))


def dictionary_coverage(df, text_col: str, id_col: str,
                        top_k: int = 1000, decimals: int = 6):
    """Per-document coverage of the corpus's own top-``top_k``
    vocabulary: ``id, n_tok, n_in_vocab, coverage`` — the
    vocabulary-free twin of a stopword-list quality gate: natural
    language sits high (most tokens are common words), while OCR
    garbage, codespill, and wrong-language text sit low because their
    tokens never make the corpus head.

    Deterministic: the vocabulary is the ``top_k`` terms by corpus
    frequency with the (count DESC, term ASC) tie-break, so the same
    corpus always yields the same dictionary and the whole signal is
    SQL-replayable.

    Scale shape: one token explode → map-side-combined ``groupBy(term)``
    (traffic = distinct terms, Heaps-law small) → exact top-k via
    ``orderBy().limit(k)`` (Spark plans TakeOrderedAndProject: partial
    per-partition top-k, no full sort) → the k-row dictionary
    broadcasts back against the token stream → one ``groupBy(id)``
    close.  Corpus text never keys a shuffle.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("term"))
    vocab = (toks.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
             .orderBy(F.col("n").desc(), F.col("term"))
             .limit(int(top_k))
             .select("term", F.lit(True).alias("__in_vocab")))
    marked = toks.join(F.broadcast(vocab), "term", "left")
    return (marked.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_tok"),
                 F.sum(F.col("__in_vocab").isNotNull().cast("bigint"))
                 .cast("bigint").alias("n_in_vocab"))
            .withColumn("coverage", F.round(
                F.col("n_in_vocab").cast("double") / F.col("n_tok"),
                decimals)))


def entropy_signals(df, text_col: str, id_col: str,
                    decimals: int = 6):
    """Per-document Shannon entropy of the character and token unigram
    distributions (bits): ``id, n_chars_e, char_entropy, n_tok,
    token_entropy``.

    The classic complementary pair to :func:`compression_ratio`'s
    gzip-redundancy signal: near-zero char entropy flags repeated-glyph
    junk, abnormally HIGH char entropy flags base64/binary spill, and
    low token entropy flags template/boilerplate text whose tokens are
    common but whose distribution is degenerate — all before any model
    touches the data.

    Uses the identity H = log2(n) − (Σ c·log2 c)/n over the per-symbol
    counts, so the only float work is log2 of INTEGER counts (the same
    engine-parity class as :func:`unigram_logprob_score`'s ln, rounded
    to ``decimals``).  Plan: two narrow explodes (chars, tokens), each
    closed by a two-level partial-agg groupBy — shuffle traffic is
    O(distinct (doc, symbol) pairs), all JVM codegen, no Python.

    Coverage contract: every document with ≥ 1 character gets a row;
    a whitespace-only document (characters but no tokens) reports
    ``n_tok``/``token_entropy`` as NULL rather than vanishing (the
    token stats LEFT-join onto the char stats).  Only the completely
    empty string — no characters at all — has no distribution to
    report and emits no row."""
    def _ent(sym_df, n_name, h_name):
        cnt = (sym_df.groupBy("id", "s")
               .agg(F.count(F.lit(1)).cast("bigint").alias("k")))
        n = F.sum("k").cast("bigint")
        h = F.round(
            F.log2(F.sum("k").cast("double"))
            - F.sum(F.col("k").cast("double")
                    * F.log2(F.col("k").cast("double"))) / F.sum("k"),
            decimals)
        return cnt.groupBy("id").agg(n.alias(n_name), h.alias(h_name))

    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(f"regexp_extract_all(lower({text_col}), "
                         "'.', 0)")).alias("s"))
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("s"))
    return (_ent(chars, "n_chars_e", "char_entropy")
            .join(_ent(toks, "n_tok", "token_entropy"), "id", "left"))


def language_consistency(df, text_col: str, id_col: str,
                         window: int = 32):
    """Mixed-language document detection: ``id, n_chunks, n_langs,
    lang_dominant, frac_dominant`` — each doc cut into ``window``-token
    chunks, language-ID'd per chunk, and summarized (how many distinct
    languages, which dominates, what fraction of chunks agree).

    A doc-level langid hides a 50/50 English/German concatenation
    behind whichever half wins the stopword count; per-chunk voting
    surfaces it — the FineWeb/CCNet-style pre-filter for
    concatenation artifacts and code-switching pages.  Dominant
    language ties break (count DESC, lang ASC); frac is an exact
    integer ratio.

    Plan: the chunk explode (narrow, no shuffle) + per-chunk langid
    (pure codegen CASE) + one groupBy(id, lang) count + a tiny window
    over the post-aggregate (id, lang) relation — the only shuffle
    carries (docs · langs-seen) rows.  The pre-shuffle chunk+langid
    chain is the CPU cost, so the scan is repartitioned up to cluster
    parallelism first (optimization r13, guide §2.5 — a single-split
    table otherwise language-IDs every chunk on one core; no-op at
    real scale)."""
    from ..plans.exchange import ensure_min_parallelism

    ch = chunk_tokens(ensure_min_parallelism(df), text_col, id_col,
                      window=window)
    per = ch.select("id", lang_id("chunk_text").alias("lg"))
    counts = per.groupBy("id", "lg") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = Window.partitionBy("id").orderBy(F.col("c").desc(), "lg")
    ranked = counts.withColumn("rn", F.row_number().over(w))
    tot = counts.groupBy("id").agg(
        F.sum("c").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"))
    dom = ranked.where("rn = 1").select(
        "id", F.col("lg").alias("lang_dominant"),
        F.col("c").alias("__dom_c"))
    return (tot.join(dom, "id")
            .withColumn("frac_dominant", F.round(
                F.col("__dom_c").cast("double") / F.col("n_chunks"), 6))
            .drop("__dom_c"))


def novelty_score(df, text_col: str, id_col: str, n: int = 3):
    """Per-document n-gram novelty: ``id, n_sh, n_unique, novelty``
    where ``novelty`` is the fraction of the doc's distinct word
    n-grams that appear in NO other document — the memorization-risk /
    contribution signal (a doc of novelty ≈ 0 adds nothing the corpus
    doesn't already say; boilerplate and template families sit at the
    bottom of the ranking long before a pairwise dedup finds them).

    Exact integer ratio (distinct-shingle counts), emitted as a
    rounded double — both counts ride along for exact downstream
    thresholds.  Plan: one distinct-shingle explode, one map-side
    combinable document-frequency aggregate keyed by the full-md5
    shingle digest (the dedup_lines rule: corpus TEXT never keys a
    shuffle), one join back, one groupBy(id) close — traffic
    O(corpus distinct shingles) digests.

    Coverage contract: a document with fewer than ``n`` tokens has no
    n-grams and therefore no novelty to measure — it emits NO row
    (there is no honest value: 0 would claim "all duplicated", 1 "all
    novel").  Callers joining back to the corpus should left-join and
    treat the NULL explicitly."""
    from .dedup import word_shingles

    # materialize the digest relation: it feeds BOTH the document-
    # frequency aggregate and the join-back — without it the
    # shingle explode + md5 executes twice (optimization r12,
    # the minhash_near_dups idiom)
    sh = word_shingles(df, text_col, id_col, n) \
        .select("id", F.md5("shingle").alias("h")) \
        .localCheckpoint(eager=True)
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (sh.join(dfreq, "h")
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"),
                 F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_unique"))
            .withColumn("novelty", F.round(
                F.col("n_unique").cast("double") / F.col("n_sh"), 6)))


def hash_embedding(df, text_col: str, id_col: str, dim: int = 32,
                   normalize: bool = True):
    """Signed feature-hashing vectorizer (Weinberger 2009, Vowpal
    Wabbit's trick; Spark MLlib's HashingTF plus the sign hash):
    ``id, vec array<double>`` — each token lands in bucket
    ``(h/2) mod dim`` with sign ``1 − 2·(h mod 2)`` off the engine-wide
    48-bit md5 fold, summed per document, optionally L2-normalized.

    This is the text → embedding bridge when no model is available:
    deterministic, vocabulary-free (no fit step, no OOV), and the
    hash-signed sums preserve inner products in expectation — good
    enough to drive the ANN/dedup stack (knn_cosine, SemDeDup, PQ) on
    raw text.  The UNNORMALIZED buckets are exact integers, so the
    whole vectorizer is replayable by an external SQL engine.

    Plan: one explode + one partial-agg groupBy(id, bucket) — traffic
    O(docs · min(dim, distinct tokens)) — then a sort-free dense
    rebuild per document (map_from_entries + one sequence transform,
    all JVM codegen; no second shuffle: the rebuild groups on the same
    ``id`` key, and AQE coalesces the two groupBys into one exchange
    when partitioning allows)."""
    h = (f"CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)")
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("s"))
    binned = toks.select(
        "id",
        F.expr(f"CAST((({h}) DIV 2) % {dim} AS INT)").alias("bucket"),
        F.expr(f"CAST(1 - 2 * (({h}) % 2) AS BIGINT)").alias("sgn"))
    agg = (binned.groupBy("id", "bucket")
           .agg(F.sum("sgn").cast("bigint").alias("v")))
    dense = (agg.groupBy("id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("bucket", "v"))).alias("m"))
             .withColumn("vec", F.expr(
                 f"transform(sequence(0, {dim - 1}), "
                 "i -> CAST(coalesce(m[i], 0) AS DOUBLE))"))
             .drop("m"))
    if normalize:
        norm = F.expr(
            "sqrt(aggregate(vec, CAST(0.0 AS DOUBLE), "
            "(a, x) -> a + x * x))")
        dense = dense.withColumn(
            "vec", F.when(norm > 0, F.expr(
                "transform(vec, x -> x / "
                "sqrt(aggregate(vec, CAST(0.0 AS DOUBLE), "
                "(a, x) -> a + x * x)))")).otherwise(F.col("vec")))
    return dense


def tfidf_vectors(df, text_col: str, id_col: str, top_k: int = 32,
                  decimals: int = 6):
    """Dense tf-idf vectors over the corpus's own top-``top_k``
    vocabulary: ``id, vec array<double>`` with
    ``vec[j] = tf(term_j, doc) · (ln((1+N)/(1+df_j)) + 1)`` — the
    smoothed-idf convention, so a term in every document still
    contributes its raw tf instead of vanishing.

    The classical IR vectorizer completing the text→vector bridge
    family: :func:`hash_embedding` is vocabulary-free (unbounded
    vocab, collision noise), this is vocabulary-BOUNDED (exact, but
    only the corpus head) — together they cover both regimes, and
    both feed the ANN/dedup stack unchanged.  Deterministic: the
    vocabulary uses the (count DESC, term ASC) tie-break and the only
    float work is one ln of an integer ratio per vocab term (the
    lm_score parity class), so the whole vectorizer is
    SQL-replayable.

    Plan: token explode → map-side-combined ``groupBy(term)`` →
    top-k via TakeOrderedAndProject (no full sort) → the k-row
    dictionary (with df counts) broadcasts against the token stream →
    one ``groupBy(id, j)`` + the engine-wide sort-free
    ``map_from_entries`` dense rebuild.  Corpus text never keys a
    shuffle; vector width is ``top_k``, fixed at plan time.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    n_docs = df.count()
    toks = df.select(F.col(id_col).alias("id"),
                     F.explode(tokens(text_col)).alias("term"))
    # ONE tokenize pass (optimization r12, guide §1.2): vocab counts,
    # document frequencies and per-doc tf all derive from the
    # materialized (id, term, tf) relation — Σ tf per term ≡ the
    # occurrence count and a row count per term ≡ the distinct-doc
    # count, exact integers, so every downstream value is unchanged;
    # before, the explode ran once per consumer (3× per run).
    dtc = (toks.groupBy("id", "term")
           .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
           .localCheckpoint(eager=True))
    vocab = (dtc.groupBy("term")
             .agg(F.sum("tf").cast("bigint").alias("n"))
             .orderBy(F.col("n").desc(), F.col("term"))
             .limit(int(top_k)))
    # j = vocabulary slot in the same deterministic order; df_j =
    # distinct docs containing the term
    w = Window.orderBy(F.col("n").desc(), F.col("term"))
    slot = vocab.withColumn("j", F.row_number().over(w) - 1)
    dfreq = (dtc.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df_t")))
    dic = slot.join(dfreq, "term").select(
        "term", "j",
        (F.log((F.lit(float(1 + n_docs))) / (F.col("df_t") + 1))
         + F.lit(1.0)).alias("idf"))
    tf = (dtc.join(F.broadcast(dic), "term")
          .groupBy("id", "j")
          .agg((F.sum("tf").cast("double") * F.first("idf"))
               .alias("v")))
    return (tf.groupBy("id")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("j", "v"))).alias("m"))
            .withColumn("vec", F.expr(
                f"transform(sequence(0, {int(top_k) - 1}), "
                f"i -> ROUND(CAST(coalesce(m[i], 0) AS DOUBLE), "
                f"{int(decimals)}))"))
            .drop("m"))


def encode_token_ids(df, text_col: str, id_col: str):
    """Encode each document as its token-id sequence: ``id,
    ids array<bigint>`` with ids = frequency rank in the corpus
    vocabulary (1 = most frequent; ties break lexicographically) —
    the tokenize-to-ids step between text curation and sequence
    packing, with the corpus's own frequency table as the vocabulary.

    Plan: token explode (narrow) → vocab aggregate (map-side combined,
    O(distinct terms)) → ONE ranking window over the post-aggregate
    vocab — a driver-scale table by Heaps' law, and the only
    single-partition sort in the pipeline, on distinct terms, never on
    the corpus — → broadcast id join → groupBy(doc) re-assembling the
    sequence by position (``array_sort`` on (pos, id) structs, no
    second window).
    """
    toks = df.select(F.col(id_col).alias("id"),
                     F.posexplode(tokens(text_col)).alias("pos", "term"))
    vocab = (toks.groupBy("term")
             .agg(F.count(F.lit(1)).alias("n")))
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    ranked = vocab.select(
        "term", F.row_number().over(w).cast("bigint").alias("token_id"))
    return (toks.join(F.broadcast(ranked), "term")
            .groupBy("id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token_id"))),
                lambda s: s.getField("token_id")).alias("ids")))


def chunk_tokens(df, text_col: str, id_col: str,
                 window: int = 128, stride: int | None = None):
    """Cut each document into fixed-size token windows — the
    context-window chunking between curation and tokenization: ``id,
    chunk_idx, chunk_text, n_tokens`` with chunk *c* covering tokens
    [c·stride, c·stride + window).  ``stride < window`` overlaps
    consecutive chunks (the sliding-window form used for long-document
    training and retrieval indexing); the default ``stride = window``
    tiles without overlap.  The final chunk per document may be short;
    empty documents produce no chunks.  Tokenization is the module-wide
    whitespace split, and re-assembly is a single-space join.

    Pure narrow expressions end-to-end: one token-array build per row,
    one explode over ceil(n/stride) chunk starts, one ``slice`` per
    chunk — no shuffle, no Python, and the fan-out is explicit in the
    plan as the explode (row count ≈ corpus tokens / stride).
    """
    window = int(window)
    stride = window if stride is None else int(stride)
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = tokens(f"coalesce({text_col}, '')")
    out = (df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
           .where(F.size("__toks") > 0)
           .select("id", "__toks",
                   F.explode(F.sequence(
                       F.lit(0), F.size("__toks") - 1,
                       F.lit(stride))).alias("__start")))
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, window)
    return out.select(
        "id",
        (F.col("__start") / F.lit(stride)).cast("bigint")
        .alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_tokens"))


def collocations(df, text_col: str, min_count: int = 5,
                 top_k: int = 50):
    """PMI-scored bigram collocations over the corpus: ``term_a,
    term_b, n_pair, pmi`` for the ``top_k`` adjacent lowercased token
    pairs with count ≥ ``min_count``, ranked by pointwise mutual
    information log(p(ab) / (p(a)·p(b))) — the phrase-mining /
    tokenizer-merge-candidate primitive (the statistic behind
    word2phrase and BPE-style merge scoring).

    Plan: per-row bigram build with ``zip_with`` over the shifted
    token array (narrow — no posexplode+window, adjacency never
    crosses rows) → two map-side-combined count aggregates (pairs and
    unigrams, both O(distinct)) → two BROADCAST joins of the unigram
    table into the pair table → one top-k sort on the post-aggregate
    pair table.  Corpus totals fold in as eager scalars, so PMI is a
    codegen'd expression.  Ties break on (term_a, term_b) so the
    report is deterministic.
    """
    min_count = int(min_count)
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    t = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    bigrams = F.expr(
        f"zip_with(slice({t}, 1, greatest(size({t}) - 1, 0)), "
        f"slice({t}, 2, greatest(size({t}) - 1, 0)), "
        "(a, b) -> struct(a, b))")
    # eager checkpoints: each relation feeds a scalar action AND the
    # scored joins below (unis twice) — without materialization the
    # corpus tokenize+explode re-executes once per consumer (~5 scans)
    pairs = (df.select(F.explode(bigrams).alias("bg"))
             .select(F.col("bg.a").alias("term_a"),
                     F.col("bg.b").alias("term_b"))
             .groupBy("term_a", "term_b")
             .agg(F.count(F.lit(1)).alias("n_pair"))
             .localCheckpoint(eager=True))
    unis = (df.select(F.explode(F.expr(t)).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
            .localCheckpoint(eager=True))
    tot_pairs, = pairs.agg(F.sum("n_pair")).first()
    tot_unis, = unis.agg(F.sum("n_term")).first()
    if not tot_pairs:
        return pairs.select(
            "term_a", "term_b", "n_pair",
            F.lit(0.0).alias("pmi")).where(F.lit(False))
    scored = (pairs.where(F.col("n_pair") >= min_count)
              .join(F.broadcast(unis.withColumnRenamed("term", "term_a")
                                .withColumnRenamed("n_term", "__na")),
                    "term_a")
              .join(F.broadcast(unis.withColumnRenamed("term", "term_b")
                                .withColumnRenamed("n_term", "__nb")),
                    "term_b")
              .withColumn("pmi", F.round(F.log(
                  (F.col("n_pair").cast("double") / F.lit(float(tot_pairs)))
                  / ((F.col("__na").cast("double") / F.lit(float(tot_unis)))
                     * (F.col("__nb").cast("double")
                        / F.lit(float(tot_unis))))), 6)))
    return (scored.orderBy(F.col("pmi").desc(), "term_a", "term_b")
            .limit(int(top_k))
            .select("term_a", "term_b", "n_pair", "pmi"))


def c4_line_filter(df, text_col: str, id_col: str,
                   min_words: int = 3):
    """C4-style line-level cleaning (the rule set of the C4 corpus
    build, applied per line): keep a line only if it (a) ends in
    terminal punctuation (. ! ? or a closing double quote), (b) has at
    least ``min_words`` whitespace tokens, (c) contains no curly brace
    (code), and (d) mentions neither "lorem ipsum" nor "javascript"
    (case-insensitive boilerplate tells).  Returns ``id, text_clean,
    n_lines, n_kept`` with surviving lines re-joined by newline —
    documents whose every line fails come back with empty text, the
    caller decides drop-vs-keep (C4 drops docs with < 3 sentences).

    Pure narrow whole-stage-codegen expressions: one line-array build,
    one ``filter`` lambda, one re-join — no shuffle, no explode, no
    Python; at 100 TB this runs entirely inside the scan stage.
    """
    min_words = int(min_words)
    if min_words < 0:
        raise ValueError(f"min_words must be >= 0, got {min_words}")
    lines = f"split(coalesce({text_col}, ''), '\\n')"
    keep = (
        "x -> trim(x) rlike '[.!?\"]$' "
        f"AND size(filter(split(trim(x), '\\\\s+'), w -> w != '')) "
        f">= {min_words} "
        "AND NOT contains(x, '{') "
        "AND NOT contains(lower(x), 'lorem ipsum') "
        "AND NOT contains(lower(x), 'javascript')")
    kept = f"filter({lines}, {keep})"
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"array_join({kept}, '\n')").alias("text_clean"),
        F.expr(f"CAST(size({lines}) AS BIGINT)").alias("n_lines"),
        F.expr(f"CAST(size({kept}) AS BIGINT)").alias("n_kept"))


def bigram_logprob_score(df, text_col: str, id_col: str,
                         lam: float = 0.7, decimals: int = 6):
    """Per-document mean INTERPOLATED bigram log-probability under the
    corpus's own LM: ``id, n_bigrams, avg_logp`` with
    p(wᵢ|wᵢ₋₁) = λ·(n(wᵢ₋₁wᵢ)/n(wᵢ₋₁)) + (1−λ)·(n(wᵢ)/N) — one rung up
    the KenLM ladder from :func:`unigram_logprob_score`: it rewards
    locally-coherent word order, not just common words, so shuffled or
    templated junk scores below natural prose with the same vocabulary.
    Within-corpus scoring keeps every count ≥ 1, so the interpolation
    (not smoothing) is the only hyper-parameter.  Documents with < 2
    tokens produce no row (no bigrams to score).

    Plan: bigrams are built per row with the shifted-array ``zip_with``
    (narrow; adjacency never crosses rows) and exploded ONCE with
    their position.  Context and unigram tables are post-aggregate
    O(distinct) and broadcast (Heaps' law); the bigram-count join is a
    hash equi-join on (a, b) — the one pair-keyed shuffle, sized by
    distinct bigrams, not corpus tokens.  One groupBy(id) closes the
    mean.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    t = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    bg = F.expr(
        f"zip_with(slice({t}, 1, greatest(size({t}) - 1, 0)), "
        f"slice({t}, 2, greatest(size({t}) - 1, 0)), "
        "(a, b) -> struct(a, b))")
    pairs_src = (df.select(F.col(id_col).alias("id"),
                           F.posexplode(bg).alias("pos", "bg"))
                 .select("id", "pos", F.col("bg.a").alias("a"),
                         F.col("bg.b").alias("b")))
    pair_counts = (pairs_src.groupBy("a", "b")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab")))
    unis = (df.select(F.explode(F.expr(t)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_t")))
    total = unis.agg(F.sum("n_t").cast("bigint").alias("total"))
    ctx = unis.select(F.col("term").alias("a"),
                      F.col("n_t").alias("n_a"))
    nxt = unis.select(F.col("term").alias("b"),
                      F.col("n_t").alias("n_b"))
    scored = (pairs_src
              .join(pair_counts, ["a", "b"])
              .join(F.broadcast(ctx), "a")
              .join(F.broadcast(nxt), "b")
              .crossJoin(F.broadcast(total)))
    p = (F.lit(float(lam)) * (F.col("n_ab").cast("double")
                              / F.col("n_a"))
         + F.lit(1.0 - float(lam)) * (F.col("n_b").cast("double")
                                      / F.col("total")))
    return (scored.groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.round(F.sum(F.log(p)) / F.count(F.lit(1)), decimals)
                 .alias("avg_logp")))


def compression_ratio(df, text_col: str, id_col: str,
                      level: int = 6, out_col: str = "compression_ratio"):
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes): the classic repetitiveness signal — templated or looping
    junk compresses far below natural prose, so a LOW ratio flags the
    documents the n-gram repetition gates (``gopher_quality_flags``)
    measure shape-by-shape, in one cheap pass.  Returns ``id,
    n_bytes, compression_ratio`` (NULL text = empty; empty documents
    report ratio 0 by convention, not the codec's 8-byte header).

    This is a Python-side signal (no SQL zlib), so it runs as ONE
    Arrow-batched ``mapInPandas`` stage — no shuffle, bytes never
    leave the executors; it is deliberately NOT in the oracle gate
    (DuckDB has no zlib) — the unit suite pins its behavior instead.
    """
    from ..plans.exchange import ship_package

    ship_package(df.sparkSession)
    lvl = int(level)
    if not 1 <= lvl <= 9:
        raise ValueError(f"level must be in [1, 9], got {lvl}")

    def fn(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ratios, sizes = [], []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                sizes.append(len(b))
                ratios.append(len(zlib.compress(b, lvl)) / len(b)
                              if b else 0.0)
            yield pd.DataFrame({"id": pdf[id_col],
                                "n_bytes": sizes, out_col: ratios})

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, f"id bigint, n_bytes bigint, {out_col} double")


def doc_term_counts(df, text_col: str, id_col: str):
    """Per-document term counts ``(id_col, term, tf)`` — the shared
    tokenized relation behind :func:`bm25_topk` and
    :func:`jaccard_topk` (round-10 hybrid-retrieval refactor): one
    token explode + ONE map-side-combined ``groupBy(id, term)`` — the
    only corpus-keyed shuffle either ranker needs.  Persist it once
    per query batch and pass it to both via ``doc_terms=`` so a
    hybrid fusion tokenizes the corpus ONCE, not once per ranker —
    at 100 TB the corpus scan dominates, so this halves the hybrid's
    cost.  dl, df and distinct doc-term pairs all derive from this
    relation without touching text again."""
    return (df.select(F.col(id_col),
                      F.explode(tokens(text_col)).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))


def bm25_topk(df, text_col: str, id_col: str, query_df,
              query_text_col: str, query_id_col: str,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              max_df: int | None = None, doc_terms=None):
    """BM25 top-``k`` retrieval of corpus documents for a bounded query
    set: ``query_id, rank, doc_id, score_e6`` — the classical
    probabilistic ranking (Robertson/Lucene form), the retrieval
    primitive curation pipelines use to pull eval-set neighbours out of
    a training corpus (contamination analysis, hard-negative mining,
    RAG source audits).

    ``score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    over the DISTINCT terms of the query (set semantics), with
    ``idf(t) = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))``.  Cross-engine
    determinism: every input to a term's score is an integer (tf, dl,
    df, N) plus the shared avgdl double, each per-term score is rounded
    to a scaled BIGINT at 1e-6, and the document score is the INTEGER
    sum of those — no float accumulation order anywhere (the zipf/
    lm_score parity class covers the single ln per term).  Ties break
    (score_e6 DESC, doc_id ASC).

    ``max_df`` optionally drops query terms with document frequency
    above the bound before the candidate join — a stop-term like "the"
    matches every document for near-zero idf, so the knob trades an
    idf-negligible score component for an O(corpus/term) candidate
    reduction (the posting-list ``max_df`` precedent; ``None`` keeps
    exact scoring and is the oracle configuration).  The ``None``
    default is the engine-wide convention (``dedup.DEFAULT_MAX_DF``
    docs): this join's df fanout is ADDITIVE (Σ df over a
    contract-bounded query set), so exactness is safe by default —
    unlike the posting-list SELF-joins, whose multiplicative Σ df²
    fanout makes the finite cutoff their default.  Operational rule
    (BASELINE.md round-8 curve): pick ``max_df`` ABOVE the df of the
    rarest term you are willing to lose — on a corpus whose df mass
    sits above the cutoff, pruning collapses the ranking (recall@10
    fell to ~0 on the 31-term synthetic corpus); absolute cutoffs in
    the low thousands are only safe on heavy-tailed real vocabularies.

    Plan shape: token explode → ONE map-side-combined
    ``groupBy(id, term)`` tf aggregation (the only corpus-keyed
    shuffle; dl and df derive from it without touching text again) →
    the query-term dictionary (queries × terms, bounded by contract)
    joins df-stats small-side and BROADCASTS against the tf relation →
    integer-sum ``groupBy(query_id, id)`` → per-query top-k window
    (WindowGroupLimit prunes below the final exchange).  Corpus text
    never keys a shuffle; candidate fanout is Σ_t df_t over query
    terms, bounded by ``max_df``.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_df is not None and max_df < 1:
        raise ValueError(f"max_df must be >= 1 or None, got {max_df}")

    # doc_terms: a pre-built doc_term_counts(df, text_col, id_col)
    # relation (persist it to share ONE corpus tokenization across
    # rankers — the hybrid-fusion shape).  When building it here,
    # localCheckpoint it (optimization r12, guide §1.2/§5): the tf
    # relation feeds FOUR consumers (the n_docs/avgdl scalar job,
    # dl_rel, dfreq, and the candidate join) and without
    # materialization the corpus tokenize+groupBy re-executed once per
    # consumer.
    if doc_terms is None:
        doc_terms = doc_term_counts(df, text_col, id_col) \
            .localCheckpoint(eager=True)
    tf_rel = doc_terms.select(F.col(id_col).alias("__id"), "term",
                              "tf")
    dl_rel = (tf_rel.groupBy("__id")
              .agg(F.sum("tf").cast("bigint").alias("dl")))
    dfreq = (tf_rel.groupBy("term")
             .agg(F.count(F.lit(1)).cast("bigint").alias("df_t")))

    # bounded by contract: N and total token count are two scalars of
    # one aggregate job (the tfidf_vectors n_docs precedent)
    stats = dl_rel.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("dl").alias("tot")).first()
    n_docs = int(stats["n"])
    avgdl = float(stats["tot"]) / n_docs if n_docs else 1.0

    qterms = query_df.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("term"))
    # qterms is the CONTRACT-bounded side (queries × terms) — pin the
    # broadcast there; dfreq is O(corpus vocabulary) and only looks
    # broadcastable at test scale.  Terms absent from the corpus drop.
    qdic = dfreq.join(F.broadcast(qterms), "term")
    if max_df is not None:
        qdic = qdic.where(F.col("df_t") <= int(max_df))
    qdic = qdic.withColumn(
        "idf", F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t")
                                   + F.lit(0.5))
                     / (F.col("df_t") + F.lit(0.5))))

    term_score = (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                  / (F.col("tf") + F.lit(float(k1))
                     * (F.lit(1.0 - b)
                        + F.lit(float(b)) * F.col("dl")
                        / F.lit(float(avgdl)))))
    scored = (tf_rel.join(F.broadcast(qdic), "term")
              .join(dl_rel, "__id")
              .select("query_id", "__id",
                      F.floor(term_score * F.lit(1000000.0)
                              + F.lit(0.5)).cast("bigint")
                      .alias("s_e6"))
              .groupBy("query_id", "__id")
              .agg(F.sum("s_e6").cast("bigint").alias("score_e6")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score_e6").desc(), F.col("__id").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("query_id", "rank", F.col("__id").alias("doc_id"),
                    "score_e6"))


def readability_scores(df, text_col: str, id_col: str):
    """Classical readability indices per document: ``id, n_sentences,
    n_words, n_syllables, flesch_e6, fkgl_e6`` — Flesch Reading Ease
    and Flesch–Kincaid Grade Level (Kincaid et al. 1975), the standard
    cheap quality/complexity signal next to the Gopher flags.

    Counting is regex-only, so the operator is one narrow codegen'd
    projection at scan speed:

    * sentences = runs of ``[.!?]`` (min 1 for non-empty text — a text
      without terminal punctuation is one sentence);
    * words = whitespace tokens;
    * syllables = vowel-group runs ``[aeiouy]+`` of the lowercased
      text, floored at one per word (the standard heuristic: every
      word has at least one syllable; non-Latin scripts degrade to
      words == syllables, keeping the indices defined).

    Scores are scaled-BIGINT e6 via ``floor(x·1e6 + 0.5)`` with the
    identical double op sequence as the DuckDB twin (the lm_score
    parity class); empty/whitespace-only documents yield NULL scores
    (0 words — the formulas are undefined, and 0 is a LEGAL score
    value so it must not be overloaded).
    """
    n_w = token_count(text_col)
    n_s = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")), F.lit(1))
    n_syl = F.greatest(
        F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+")),
        n_w)
    wps = n_w.cast("double") / n_s.cast("double")
    spw = n_syl.cast("double") / n_w.cast("double")
    flesch = (F.lit(206.835) - F.lit(1.015) * wps
              - F.lit(84.6) * spw)
    fkgl = (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
    defined = n_w > 0
    e6 = lambda c: F.when(defined, F.floor(c * F.lit(1000000.0)  # noqa: E731
                                           + F.lit(0.5))
                          .cast("bigint"))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(defined, n_s).otherwise(F.lit(0)).cast("int")
        .alias("n_sentences"),
        n_w.cast("int").alias("n_words"),
        F.when(defined, n_syl).otherwise(F.lit(0)).cast("int")
        .alias("n_syllables"),
        e6(flesch).alias("flesch_e6"),
        e6(fkgl).alias("fkgl_e6"))


def nb_classify(df, text_col: str, id_col: str, label_col: str,
                alpha: int = 1):
    """Multinomial Naive Bayes text classification, trained and
    applied on the SAME relation (the self-labelling audit: where does
    the model disagree with the recorded label?): ``id, label, pred,
    score_e6`` with ``pred`` = argmax label of ln P(label) +
    Σ_tokens ln P(token | label) under Laplace smoothing ``alpha``.

    The curation use is label-noise detection and a cheap quality/
    domain classifier bootstrap (McCallum & Nigam, AAAI-98 workshop):
    class-conditional token counts ARE the model, so training is one
    map-side-combinable ``groupBy(label, term)`` — there is no
    iterative fit, which is what makes NB the text classifier that
    actually scales to a 100 TB corpus in one pass.

    Cross-engine determinism (the bm25 integer-sum class): every
    input to a term's log-probability is an integer (class term count,
    class total, vocabulary size, doc counts), each
    ``ln((c+α)/(tot_l+α·V))`` is rounded to a scaled e6 BIGINT,
    multiplied by the integer term frequency, and INTEGER-summed —
    no float accumulation order.  Ties break label-ascending.

    Plan: tokens explode → doc term counts (one corpus-keyed shuffle)
    → class model (label×term counts + label totals + priors; a
    second combinable aggregation of the same explode) → score join
    keyed on ``term`` (labels fan out L-wide — L is small by contract)
    → integer-sum ``groupBy(id, label)`` → argmax window.
    """
    if alpha < 1:
        raise ValueError(f"alpha must be >= 1, got {alpha}")
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(label_col).alias("label"),
                     F.explode(tokens(text_col)).alias("term"))
    doc_tf = (base.groupBy("__id", "term")
              .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    # materialize the class model (≤ labels × vocab rows): it feeds
    # the vocab-size scalar job AND three subtrees of the score matrix
    # (terms, cls_tot, the left join) — without it the corpus was
    # re-tokenized once per consumer (optimization r12, guide §1.2).
    # LAZY checkpoint (optimization r13): the r12 EAGER form serialized
    # a dedicated materialization job in front of the pipeline (the
    # driver's r12 bench flagged nb_lang regressed in both runs); lazy
    # folds the materialization into the vocab_n count job — same 2
    # corpus passes at scale, one fewer blocking job.  4-round
    # interleaved A/B at sf0.1: eager med 2.29 s / lazy 2.17 / none
    # 2.08 (all within the box's noise band, row-identical); lazy is
    # kept over none because the checkpoint is what holds the final
    # plan at 2 corpus tokenizes instead of ~5 (scans 12 -> 6 in the
    # r12 plan capture) — the 100 TB story.
    cls_tf = (base.groupBy("label", "term")
              .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
              .localCheckpoint(eager=False))
    cls_tot = (cls_tf.groupBy("label")
               .agg(F.sum("c").cast("bigint").alias("tot")))
    vocab_n = cls_tf.select("term").distinct().count()
    n_docs = df.count()
    priors = (df.groupBy(F.col(label_col).alias("label"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_l")))
    prior_e6 = priors.select(
        "label",
        F.floor(F.log(F.col("n_l").cast("double")
                      / F.lit(float(n_docs))) * F.lit(1000000.0)
                + F.lit(0.5)).cast("bigint").alias("prior_e6"))

    # full label×term score matrix: ln((c+α)/(tot+α·V)) e6 — built
    # from cls_tf joined onto every label via the label totals (L
    # rows, broadcast); absent (label, term) pairs use c = 0
    terms = cls_tf.select("term").distinct()
    matrix = (terms.crossJoin(F.broadcast(cls_tot))
              .join(cls_tf, ["label", "term"], "left")
              .select(
                  "label", "term",
                  F.floor(F.log(
                      (F.coalesce(F.col("c"), F.lit(0))
                       + F.lit(alpha)).cast("double")
                      / (F.col("tot")
                         + F.lit(alpha * vocab_n)).cast("double"))
                      * F.lit(1000000.0) + F.lit(0.5))
                  .cast("bigint").alias("lnp_e6")))
    scored = (doc_tf.join(matrix, "term")
              .groupBy("__id", "label")
              .agg(F.sum(F.col("tf") * F.col("lnp_e6"))
                   .cast("bigint").alias("ll_e6"))
              .join(F.broadcast(prior_e6), "label")
              .select("__id", "label",
                      (F.col("ll_e6") + F.col("prior_e6"))
                      .cast("bigint").alias("score_e6")))
    w = (Window.partitionBy("__id")
         .orderBy(F.col("score_e6").desc(), F.col("label").asc()))
    best = (scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1))
    truth = df.select(F.col(id_col).alias("__id"),
                      F.col(label_col).alias("true_label"))
    return (best.join(truth, "__id")
            .select(F.col("__id").alias("id"),
                    F.col("true_label").alias("label"),
                    F.col("label").alias("pred"), "score_e6"))


def jaccard_topk(df, text_col: str, id_col: str, query_df,
                 query_text_col: str, query_id_col: str,
                 k: int = 10, doc_terms=None):
    """Token-SET Jaccard top-``k`` retrieval: ``query_id, rank,
    doc_id, jaccard_e6`` — the lexical-overlap ranker that complements
    :func:`bm25_topk` (bm25 weights rare terms; Jaccard rewards
    overall overlap) and the second leg of :func:`rrf_fuse`.

    ``jaccard_e6 = (1e6 · |Q ∩ D|) div (|Q| + |D| − |Q ∩ D|)`` —
    integer division, so ranking and scores are exact on any engine.
    Ties break (jaccard_e6 DESC, doc_id ASC).  Documents sharing no
    term with a query are not candidates (Jaccard 0 — unrankable
    tail by construction).

    Plan: distinct doc tokens (one corpus shuffle) → query tokens
    BROADCAST onto the posting join (additive Σ df fanout — the
    engine's query-driven join class, exact by default) → integer
    Jaccard → per-query top-k window.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # doc_terms: a shared doc_term_counts relation — its (id, term)
    # pairs are distinct by construction, so the ranker reuses the
    # one corpus shuffle instead of re-tokenizing
    if doc_terms is None:
        # materialize: dtok feeds both dsz and the posting join —
        # without it the corpus tokenize+distinct executes twice
        # (optimization r12, the bm25/doc_term_counts idiom)
        dtok = (df.select(F.col(id_col).alias("__id"),
                          F.explode(tokens(text_col)).alias("term"))
                .distinct().localCheckpoint(eager=True))
    else:
        dtok = doc_terms.select(F.col(id_col).alias("__id"), "term")
    dsz = dtok.groupBy("__id").agg(F.count(F.lit(1)).alias("nd"))
    qtok = (query_df.select(F.col(query_id_col).alias("query_id"),
                            F.explode(tokens(query_text_col))
                            .alias("term"))
            .distinct())
    qsz = qtok.groupBy("query_id").agg(F.count(F.lit(1)).alias("nq"))
    inter = (dtok.join(F.broadcast(qtok), "term")
             .groupBy("query_id", "__id")
             .agg(F.count(F.lit(1)).alias("ni")))
    j = (inter.join(F.broadcast(qsz), "query_id").join(dsz, "__id")
         .select("query_id", "__id",
                 F.expr("(1000000 * ni) div (nq + nd - ni)")
                 .cast("bigint").alias("jaccard_e6")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("jaccard_e6").desc(), F.col("__id").asc()))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("query_id", "rank", F.col("__id").alias("doc_id"),
                    "jaccard_e6"))


def rrf_fuse(rankings, k: int = 10, c: int = 60):
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of
    N rankers: ``query_id, rank, doc_id, rrf_e9`` where ``rrf_e9`` =
    Σ_rankers ``1e9 div (c + rank_i)`` (integer division — exact,
    order-free) over the rankers that surfaced the document; absent
    from a ranker contributes 0.  The hybrid-retrieval workhorse:
    fusing bm25 with an overlap or embedding ranker beats each alone
    without score calibration, BECAUSE it only consumes ranks.

    Input rankings need columns ``query_id, doc_id, rank``.  Ties
    break (rrf_e9 DESC, doc_id ASC).  Plan: union of the (already
    top-k-bounded) ranker outputs → one combinable ``groupBy(query,
    doc)`` sum → per-query window.  Everything downstream of the
    rankers is rank-arithmetic on tiny relations.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 1 or c < 0:
        raise ValueError(f"need k >= 1, c >= 0; got k={k}, c={c}")
    parts = [r.select("query_id", "doc_id",
                      F.expr(f"1000000000 div ({c} + rank)")
                      .cast("bigint").alias("s")) for r in rankings]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    fused = (allp.groupBy("query_id", "doc_id")
             .agg(F.sum("s").cast("bigint").alias("rrf_e9")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("rrf_e9").desc(), F.col("doc_id").asc()))
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select("query_id", "rank", "doc_id", "rrf_e9"))


def textrank_keywords(df, text_col: str, top_k: int = 20,
                      n_iter: int = 5):
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the corpus-level word co-occurrence graph —
    ``(rank, term, rank_e6)``, top-``top_k`` by (rank_e6 DESC, term).

    The graph: an undirected edge between every pair of ADJACENT
    tokens in any document (window 2, unweighted, deduplicated) —
    built as one narrow zip-shift expression (no self-join), then
    :func:`~.graph.pagerank`'s exact-integer power iteration ranks
    the terms.  Centrality beats raw frequency for keyword-ness
    because a term's score inherits from its neighbors' scores — a
    word glued to many well-connected words outranks an isolated
    frequent one.

    Determinism: the edge set is exact, iterations are pure int64
    (graph.pagerank), ranking ties break on the term.  Scale: edges
    ≤ Σ(doc tokens) before dedup, one distinct + the pagerank
    iterations (each one join + combinable sum on the ≤|vocab|-sized
    rank relation).
    """
    from .graph import pagerank

    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    arr = tokens(text_col)
    pairs = df.select(F.explode(F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(F.least(a, b).alias("a"),
                              F.greatest(a, b).alias("b"))))
        .alias("p")).select("p.a", "p.b") \
        .where(F.col("a") != F.col("b")).distinct()
    edges = (pairs.select(F.col("a").alias("src"),
                          F.col("b").alias("dst"))
             .unionByName(pairs.select(F.col("b").alias("src"),
                                       F.col("a").alias("dst"))))
    pr = pagerank(edges, n_iter=n_iter)
    w = Window.orderBy(F.col("rank_e6").desc(), F.col("id").asc())
    return (pr.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(top_k))
            .select("rank", F.col("id").alias("term"), "rank_e6"))


#: fold-path mixing constant: (h_a mod 2^40)·C + h_b stays < 2^63
#: (2^40·2^17 + 2^48), so the fold never overflows BIGINT on either
#: engine; 65599 is the classic sdbm odd multiplier
_BIGRAM_FOLD_MULT = 65599
_BIGRAM_FOLD_MOD = 1 << 40


def _hashed_ngram_features(df, text_col: str, id_col: str,
                           n_buckets: int, fold_bigrams: bool = False):
    """Per-document hashed unigram+bigram feature buckets
    ``(__id, bucket)`` — one row per feature OCCURRENCE.  The hash is
    the engine-wide 48-bit md5 fold (seed 0) of the token (unigram) or
    ``a || ' ' || b`` (bigram; tokens never contain whitespace, so the
    join is unambiguous), mod ``n_buckets``.  One narrow expression +
    one explode — text never keys a shuffle.

    ``fold_bigrams=True`` derives the bigram bucket from the two
    UNIGRAM hashes (``((h_a mod 2^40)·65599 + h_b) mod n_buckets``)
    instead of md5-ing the concatenated pair — one md5 per token
    instead of two (VERDICT r8 #6 cost probe; the fold is equally
    oracle-replayable since both engines already compute per-token
    h48).  Bucket VALUES differ from the md5 path, so the two
    configurations are distinct models — same statistical role
    (hashed features), different hash family member."""
    from .sketches import _h48

    arr = tokens(text_col)
    if fold_bigrams:
        harr = F.transform(arr, lambda t: _h48(t, 0))
        heads = F.slice(harr, 1,
                        F.greatest(F.size(harr) - 1, F.lit(0)))
        tails = F.slice(harr, 2,
                        F.greatest(F.size(harr) - 1, F.lit(0)))
        bg = F.zip_with(
            heads, tails,
            lambda a, b: (a % F.lit(_BIGRAM_FOLD_MOD)
                          * F.lit(_BIGRAM_FOLD_MULT) + b)
            % n_buckets)
        feats = F.concat(F.transform(harr, lambda h: h % n_buckets),
                         bg)
        return (df.select(F.col(id_col).alias("__id"),
                          F.explode(feats).alias("__b"))
                .select("__id",
                        F.col("__b").cast("int").alias("bucket")))
    bigrams = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))
    feats = F.concat(arr, bigrams)
    return (df.select(F.col(id_col).alias("__id"),
                      F.explode(feats).alias("__f"))
            .select("__id",
                    (_h48(F.col("__f"), 0) % n_buckets).cast("int")
                    .alias("bucket")))


def dsir_importance(raw_df, target_df, text_col: str, id_col: str,
                    n_buckets: int = 4096,
                    fold_bigrams: bool = False):
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023 — public
    method): score every document of ``raw_df`` by how much more
    likely its hashed n-gram bag is under a TARGET corpus's unigram
    bucket model than under the raw corpus's own:
    ``id, n_feats, logw_e6`` with

        log w(d) = Σ_b c_b(d) · [ln p_t(b) − ln q_r(b)],
        p_t(b) = (tc_b + 1) / (T + B),  q_r(b) = (rc_b + 1) / (R + B)

    (add-1 smoothed bucket models, B = ``n_buckets``; features =
    unigrams + bigrams hashed into B buckets — the paper's
    configuration).  Selecting the top-weight documents approximates
    sampling the raw corpus with target-distribution importance — the
    classical cheap proxy for "find me more data like my high-quality
    set" over a 100 TB crawl.

    Cross-engine determinism (the bm25/zipf parity class): every model
    input is an integer; each bucket's log-ratio is rounded ONCE to a
    scaled-e6 BIGINT (``ln(tc+1) − ln(T+B) − ln(rc+1) + ln(R+B)``,
    fixed operation order), and a document's weight is the INTEGER sum
    ``Σ c_b · w_e6(b)`` — no float accumulation anywhere.  Documents
    with no tokens produce no row.

    Plan shape: two bucket-count aggregations (map-side-combined,
    output bounded at ``n_buckets`` rows each) full-outer-join into a
    B-row weight table that BROADCASTS against the raw corpus's
    per-document bucket counts (one ``groupBy(id, bucket)`` — the only
    corpus-keyed shuffle) → one ``groupBy(id)`` integer sum.  The
    target corpus is typically the small curated side but may be any
    size: it only ever feeds a bounded aggregation.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    tfeats = _hashed_ngram_features(target_df, text_col, id_col,
                                    n_buckets,
                                    fold_bigrams=fold_bigrams)
    rfeats = _hashed_ngram_features(raw_df, text_col, id_col,
                                    n_buckets,
                                    fold_bigrams=fold_bigrams)
    # featurize each corpus ONCE (optimization r12, guide §1.2/§5):
    # without materialization the md5-per-token featurize expression
    # re-executed 3× over raw (r_tot scalar, the weight-table join,
    # doc_counts) and 2× over target (t_tot scalar, the join).  The
    # target folds to a ≤B-row bucket table; the raw corpus folds to
    # the integer (id, bucket, c) relation the final join needs anyway
    # — both localCheckpoint (ContextCleaner-reclaimable, no
    # cacheManager entry), and rcounts now DERIVES from doc_counts
    # (Σ_id c per bucket ≡ the per-bucket row count — exact integers),
    # so text is hashed exactly once per corpus.
    tcounts = (tfeats.groupBy("bucket")
               .agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
               .localCheckpoint(eager=True))
    doc_counts = (rfeats.groupBy("__id", "bucket")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
                  .localCheckpoint(eager=True))
    rcounts = (doc_counts.groupBy("bucket")
               .agg(F.sum("c").cast("bigint").alias("rc")))
    # two 1-row scalar aggregates (the bm25 n_docs/avgdl precedent) —
    # now over the checkpointed integer relations, not the corpus
    t_tot = int(tcounts.agg(F.sum("tc")).first()[0] or 0) + n_buckets
    r_tot = int(rcounts.agg(F.sum("rc")).first()[0] or 0) + n_buckets
    weights = (tcounts.join(rcounts, "bucket", "full_outer")
               .select("bucket",
                       F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
                       F.coalesce(F.col("rc"), F.lit(0)).alias("rc")))
    w_e6 = F.floor(
        (F.log(F.col("tc") + F.lit(1.0))
         - F.log(F.lit(float(t_tot)))
         - F.log(F.col("rc") + F.lit(1.0))
         + F.log(F.lit(float(r_tot)))) * F.lit(1000000.0)
        + F.lit(0.5)).cast("bigint")
    wtab = weights.select("bucket", w_e6.alias("w_e6"))
    return (doc_counts.join(F.broadcast(wtab), "bucket")
            .groupBy("__id")
            .agg(F.sum("c").cast("bigint").alias("n_feats"),
                 F.sum(F.col("c") * F.col("w_e6")).cast("bigint")
                 .alias("logw_e6"))
            .select(F.col("__id").alias("id"), "n_feats", "logw_e6"))


def trigram_backoff_score(df, text_col: str, id_col: str,
                          lm_df=None, alpha: float = 0.4):
    """Per-document mean-free trigram STUPID-BACKOFF score (Brants et
    al., "Large Language Models in Machine Translation", EMNLP 2007 —
    the web-scale LM smoothing that needs no discounting pass):
    ``id, n_trigrams, sum_e6`` where each trigram position (a, b, c)
    of a document contributes the 1e6-scaled log of

        s(c|ab) = n(abc)/n(ab)            if n(abc) > 0
                = α · n(bc)/n(b)          elif n(bc) > 0
                = α² · (n(c)+1)/(N+V)     otherwise (add-1 unigram
                                           floor: defined for OOV)

    with counts taken from ``lm_df`` (defaults to ``df`` itself:
    within-corpus scoring, where the first branch always fires).  The
    held-out configuration — LM on one split, scoring on another — is
    where backoff earns its keep: unseen trigrams fall to bigram and
    unigram evidence instead of zero.  Two rungs above
    :func:`unigram_logprob_score` on the KenLM ladder.

    Documents with < 3 tokens produce no row.  ``sum_e6`` is the
    INTEGER sum of per-position e6-rounded logs (the bm25 parity
    class; no mean division — Spark's ``div`` truncates while SQL
    ``//`` floors on negatives, so the ratio is left to the caller).

    Plan shape: trigram positions are one zip-of-shifts expression +
    one explode; trigram/bigram/unigram count tables are post-
    aggregate O(distinct) relations; positions hash-join trigram and
    bigram counts on their keys (the two pair-keyed shuffles, sized by
    distinct n-grams) and BROADCAST-join unigram counts (Heaps' law);
    one ``groupBy(id)`` integer sum closes it.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    lm = df if lm_df is None else lm_df

    def _tri(frame):
        arr = tokens(text_col)
        n3 = F.greatest(F.size(arr) - 2, F.lit(0))
        return frame.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.zip_with(
                F.slice(arr, 1, n3),
                F.zip_with(F.slice(arr, 2, n3), F.slice(arr, 3, n3),
                           lambda b, c: F.struct(b.alias("b"),
                                                 c.alias("c"))),
                lambda a, bc: F.struct(a.alias("a"),
                                       bc["b"].alias("b"),
                                       bc["c"].alias("c"))))
            .alias("pos", "t")) \
            .select("__id", "pos", "t.a", "t.b", "t.c")

    lm_tri = _tri(lm)
    n_abc = (lm_tri.groupBy("a", "b", "c")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_abc")))
    arr = tokens(text_col)
    n2 = F.greatest(F.size(arr) - 1, F.lit(0))
    lm_bi = (lm.select(F.explode(F.zip_with(
        F.slice(arr, 1, n2), F.slice(arr, 2, n2),
        lambda a, b: F.struct(a.alias("x"), b.alias("y"))))
        .alias("p")).select("p.x", "p.y"))
    # materialize the two multiply-consumed LM tables (optimization
    # r12, guide §1.2): n_xy feeds BOTH backoff joins (n_ab and n_bc)
    # and lm_uni feeds the V/N scalar job AND the final join — without
    # checkpoints the LM corpus was re-tokenized once per consumer
    # (3 extra full passes per run).  n_abc has exactly one consumer,
    # so it stays lazy.
    n_xy = (lm_bi.groupBy("x", "y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_xy"))
            .localCheckpoint(eager=True))
    lm_uni = (lm.select(F.explode(tokens(text_col)).alias("u"))
              .groupBy("u")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_u"))
              .localCheckpoint(eager=True))
    stats = lm_uni.agg(F.count(F.lit(1)).alias("v"),
                       F.sum("n_u").alias("n")).first()
    n_total = int(stats["n"] or 0)
    vocab = int(stats["v"])

    pos = _tri(df)
    j = (pos
         .join(n_abc, ["a", "b", "c"], "left")
         .join(n_xy.select(F.col("x").alias("a"),
                           F.col("y").alias("b"),
                           F.col("n_xy").alias("n_ab")),
               ["a", "b"], "left")
         .join(n_xy.select(F.col("x").alias("b"),
                           F.col("y").alias("c"),
                           F.col("n_xy").alias("n_bc")),
               ["b", "c"], "left")
         .join(F.broadcast(lm_uni.select(F.col("u").alias("b"),
                                         F.col("n_u").alias("n_b"))),
               ["b"], "left")
         .join(F.broadcast(lm_uni.select(F.col("u").alias("c"),
                                         F.col("n_u").alias("n_c"))),
               ["c"], "left"))
    la = F.log(F.lit(float(alpha)))
    log_s = F.when(
        F.col("n_abc").isNotNull(),
        F.log(F.col("n_abc").cast("double"))
        - F.log(F.col("n_ab").cast("double"))) \
        .when(
        F.col("n_bc").isNotNull(),
        la + F.log(F.col("n_bc").cast("double"))
        - F.log(F.col("n_b").cast("double"))) \
        .otherwise(
        la + la
        + F.log(F.coalesce(F.col("n_c"), F.lit(0)) + F.lit(1.0))
        - F.log(F.lit(float(n_total + vocab))))
    return (j.select("__id",
                     F.floor(log_s * F.lit(1000000.0)
                             + F.lit(0.5)).cast("bigint")
                     .alias("s_e6"))
            .groupBy("__id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
                 F.sum("s_e6").cast("bigint").alias("sum_e6"))
            .select(F.col("__id").alias("id"), "n_trigrams", "sum_e6"))


def kneser_ney_bigram_score(df, text_col: str, id_col: str,
                            lm_df=None):
    """Per-document interpolated Kneser-Ney bigram score (Kneser &
    Ney, ICASSP 1995; Chen & Goodman 1998 §2.7 — the canonical LM
    smoothing, one rung above stupid backoff in quality because the
    lower-order model uses CONTINUATION counts, not raw frequency:
    "francisco" is frequent but follows only "san", so it gets a
    small continuation weight where add-1/backoff overweight it):
    ``id, n_bigrams, sum_e6`` where each bigram position (w1, w2)
    contributes the 1e6-scaled log of

        P(w2|w1) = max(n(w1 w2) − D, 0)/c(w1·)
                   + (D · N1+(w1 ·)/c(w1·)) · Pc(w2)   seen context
                 = Pc(w2)                              unseen context
        Pc(w2)   = (N1+(· w2) + 1) / (N1+(· ·) + V)

    with the standard discount D = 3/4 and an add-1 smoothed
    continuation distribution (the +1/+V terms keep OOV words
    defined — our documented variant; classic KN leaves Pc
    unsmoothed and is undefined for OOV).  With D = 3/4 every branch
    is ONE ln of a ratio of exact BIGINT products (scale the
    interpolation through by 4·c(w1·)·(N1+(··)+V)):

        seen, n12 > 0:  num = (4·n12 − 3)·(Ntot + V)
                              + 3·N1p(w1)·(Nc(w2) + 1)
        seen, n12 = 0:  num = 3·N1p(w1)·(Nc(w2) + 1)
        both:           den = 4·c1(w1)·(Ntot + V)
        unseen context: num = Nc(w2) + 1,  den = Ntot + V

    so any engine replays it bit-for-bit (the trigram_backoff /
    bm25 integer parity class).  Counts are taken from ``lm_df``
    (defaults to ``df``: within-corpus scoring); the held-out
    configuration is where the continuation model earns its keep.
    Documents with < 2 tokens produce no row; ``sum_e6`` is the
    integer sum of per-position e6-floored logs (no mean division —
    the caller divides).

    Plan shape: bigram positions are one zip-of-shifts expression +
    one explode; the bigram count table is the one pair-keyed
    shuffle; the per-word context table (c1, N1+(w1·)) and
    continuation table (N1+(·w2)) derive from it by one more
    aggregation each and BROADCAST (Heaps' law); one ``groupBy(id)``
    integer sum closes it.  Integer-overflow bound: products are
    ≤ 4·c1·(Ntot+V) — raise-free below ~10^9 distinct bigram types
    with 10^9-occurrence contexts; hash-sample the LM stats beyond
    that (the wordpiece trainer convention)."""
    lm = df if lm_df is None else lm_df

    def _bi(frame, with_id):
        arr = tokens(text_col)
        n2 = F.greatest(F.size(arr) - 1, F.lit(0))
        pairs = F.zip_with(
            F.slice(arr, 1, n2), F.slice(arr, 2, n2),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")))
        cols = [F.col(id_col).alias("__id")] if with_id else []
        return frame.select(*cols, F.explode(pairs).alias("p")) \
            .select(*(["__id"] if with_id else []), "p.x", "p.y")

    # ONE tokenize pass over the LM corpus (optimization r12, guide
    # §1.2): pad the bigram explode with a NULL-successor row per
    # final token, so EVERY token occurs as ``x`` exactly once per
    # position — the grouped (x, y) relation then yields both the
    # bigram table (y IS NOT NULL rows; identical n12 counts) and the
    # vocabulary size (distinct x), where before the V scalar re-ran
    # a second full tokenize + countDistinct over ``lm``.  ntot and V
    # collapse into one scalar job over the bounded grouped relation.
    toks_arr = tokens(text_col)
    pairs_padded = F.expr(
        "transform(sequence(1, size(__t)), i -> struct("
        "element_at(__t, i) AS x, "
        "CASE WHEN i < size(__t) THEN element_at(__t, i + 1) "
        "END AS y))")
    grouped = (lm.select(toks_arr.alias("__t"))
               .where(F.size("__t") > 0)
               .select(F.explode(pairs_padded).alias("p"))
               .select("p.x", "p.y")
               .groupBy("x", "y")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n12"))
               .localCheckpoint(eager=True))
    n_xy = grouped.where(F.col("y").isNotNull())
    ctx = (n_xy.groupBy("x")
           .agg(F.sum("n12").cast("bigint").alias("c1"),
                F.count(F.lit(1)).cast("bigint").alias("n1p")))
    cont = (n_xy.groupBy("y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("nc")))
    stats = grouped.agg(
        F.count(F.when(F.col("y").isNotNull(), 1)).alias("ntot"),
        F.countDistinct("x").alias("v")).first()
    ntot = int(stats["ntot"] or 0)
    vocab = int(stats["v"] or 0)
    tv = ntot + vocab
    if tv == 0:
        # empty LM: every position is the unseen-context branch with
        # Nc = 0 -> ln(1/1) = 0; keep tv at 1 to avoid 0-division
        tv = 1

    pos = _bi(df, True)
    j = (pos
         .join(n_xy, ["x", "y"], "left")
         .join(F.broadcast(ctx), ["x"], "left")
         .join(F.broadcast(cont.select(F.col("y"),
                                       F.col("nc"))), ["y"], "left"))
    num = F.when(
        F.col("c1").isNotNull() & F.col("n12").isNotNull(),
        (F.lit(4) * F.col("n12") - F.lit(3)).cast("bigint")
        * F.lit(tv).cast("bigint")
        + F.lit(3).cast("bigint") * F.col("n1p")
        * (F.coalesce(F.col("nc"), F.lit(0)) + F.lit(1))) \
        .when(
        F.col("c1").isNotNull(),
        F.lit(3).cast("bigint") * F.col("n1p")
        * (F.coalesce(F.col("nc"), F.lit(0)) + F.lit(1))) \
        .otherwise(
        (F.coalesce(F.col("nc"), F.lit(0)) + F.lit(1)).cast("bigint"))
    den = F.when(
        F.col("c1").isNotNull(),
        F.lit(4).cast("bigint") * F.col("c1")
        * F.lit(tv).cast("bigint")) \
        .otherwise(F.lit(tv).cast("bigint"))
    log_s = F.log(num.cast("double")) - F.log(den.cast("double"))
    return (j.select("__id",
                     F.floor(log_s * F.lit(1000000.0)
                             + F.lit(0.5)).cast("bigint")
                     .alias("s_e6"))
            .groupBy("__id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
                 F.sum("s_e6").cast("bigint").alias("sum_e6"))
            .select(F.col("__id").alias("id"), "n_bigrams", "sum_e6"))
