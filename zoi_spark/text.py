"""Text analysis for training-data pipelines — pure Column expressions.

Everything here is built from ``pyspark.sql.functions`` only (JVM-side,
whole-stage codegen); no UDFs. Each operator is deliberately expressible
in ANSI SQL so the DuckDB oracle can cross-check it (driver contract).

These are the webtext counterparts of the reference's string
refinements (SURVEY §2.3): where Zoi asks "is this one string an
email?", a 100 TB corpus asks "what language / quality / token count is
every document?" — same per-value shape, table scale.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram-free heuristic
# language-ID. Deliberately small + disjoint so the SQL oracle matches
# exactly.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "por", "una"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


# BPE-ish pre-tokenization classes (the GPT-2-family pre-tokenizer
# splits on letter runs / digit runs / punctuation runs / whitespace);
# counting these runs approximates subword-token counts far better than
# whitespace words on code- or punctuation-heavy text. RE2-compatible
# (no lookahead) so the SQL oracle evaluates the identical pattern.
BPE_ISH_TOKEN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (letter runs, digit runs,
    punctuation runs) — pure expression via regexp_extract_all, no
    explode, no UDF. A deterministic training-budget proxy where true
    BPE counts would need the tokenizer model."""
    return F.coalesce(
        F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")),
                                    F.lit(BPE_ISH_TOKEN), F.lit(0))),
        F.lit(0)).cast("long")


def avg_token_length(col: Column) -> Column:
    """Mean token length = non-space chars / tokens (cheap, no explode)."""
    t = F.trim(col)
    nonspace = F.length(F.regexp_replace(t, r"\s+", ""))
    n = token_count(col)
    return F.when(n > 0, nonspace.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(
        col, r"[!-/:-@\[-`{-~]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def uppercase_ratio(col: Column) -> Column:
    total = F.length(col)
    upper = total - F.length(F.regexp_replace(col, r"[A-Z]", ""))
    return F.when(total > 0, upper.cast("double") / total).otherwise(F.lit(0.0))


def marker_hits(col: Column, words: list[str]) -> Column:
    """Occurrences of any marker word (word-bounded, case-insensitive)."""
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    return F.coalesce(
        F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(pat), F.lit(0))),
        F.lit(0))


def lang_id(col: Column, markers: dict[str, list[str]] | None = None,
            default: str = "und") -> Column:
    """Heuristic language ID: argmax of marker-stopword hits; ties and
    zero hits → ``default``. Deterministic tie-break = first language in
    dict order with the strictly-greatest count."""
    markers = markers or LANG_MARKERS
    scores = {lang: marker_hits(col, words) for lang, words in markers.items()}
    langs = list(scores)
    best = None
    for lang in langs:
        others_max = None
        for other in langs:
            if other == lang:
                continue
            others_max = scores[other] if others_max is None else \
                F.greatest(others_max, scores[other])
        cond = (scores[lang] > F.lit(0)) & (scores[lang] > others_max)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return best.otherwise(F.lit(default))


def quality_score(col: Column) -> Column:
    """Deterministic document quality score in [0,1]:

    * length component  — saturating chars/2000
    * token component   — saturating tokens/200
    * punctuation sanity — 1 - min(1, punct_ratio*5)
    * shouting sanity    — 1 - min(1, uppercase_ratio*4)

    Equal-weighted mean, rounded to 6 decimals (so the SQL oracle's
    double math matches bit-for-bit after rounding).
    """
    length_c = F.least(char_count(col).cast("double") / 2000.0, F.lit(1.0))
    token_c = F.least(token_count(col).cast("double") / 200.0, F.lit(1.0))
    punct_c = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    caps_c = F.lit(1.0) - F.least(uppercase_ratio(col) * 4.0, F.lit(1.0))
    return F.round((length_c + token_c + punct_c + caps_c) / 4.0, 6)


def stopword_ratio(col: Column,
                   markers: dict[str, list[str]] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords (any language's
    marker list) — natural prose sits well above ~5%; keyword-stuffed
    or symbol-heavy junk near zero. Word-bounded case-insensitive
    count, pure expressions."""
    markers = markers or LANG_MARKERS
    words = sorted({w for ws in markers.values() for w in ws})
    hits = marker_hits(col, words)
    n = token_count(col)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score_v2(col: Column) -> Column:
    """quality_score plus the stopword-density component the reference
    pipeline literature uses (length / punct / STOPWORD ratios):

    * stopword sanity — saturating stopword_ratio/0.05 (≥5% stopword
      density scores full marks; keyword-stuffed junk scores ~0).

    Five equal-weighted components, rounded to 6 decimals (same
    SQL-parity contract as quality_score)."""
    length_c = F.least(char_count(col).cast("double") / 2000.0, F.lit(1.0))
    token_c = F.least(token_count(col).cast("double") / 200.0, F.lit(1.0))
    punct_c = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    caps_c = F.lit(1.0) - F.least(uppercase_ratio(col) * 4.0, F.lit(1.0))
    stop_c = F.least(stopword_ratio(col) / 0.05, F.lit(1.0))
    return F.round((length_c + token_c + punct_c + caps_c + stop_c) / 5.0, 6)


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse
    whitespace, trim. NEVER applied in place — fingerprints are new
    columns; the byte-identity invariant on `text` stays intact."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (md5 exists in
    both Spark and DuckDB → oracle-checkable; xxhash64 is Spark-only)."""
    return F.md5(normalize_text(col))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Array of n-word shingles over the normalized token stream —
    expression-only, no explode, no UDF.

    Built by zip_with-chaining the token array against its shifted
    copies (position p accumulates tokens p..p+j), NOT by
    ``transform(sequence, i -> slice(tokens, i, n))``: an expression
    referenced inside a higher-order-function lambda is re-evaluated
    per element, so the slice form recomputes the normalize+split of
    the whole document at every gram position — O(len²) per doc, a
    100×-scale trap on long pages. The zip_with chain evaluates each
    array child once: O(n·len), identical output strings."""
    tokens = F.split(normalize_text(col), " ")
    k = F.size(tokens) - (n - 1)
    grams = tokens
    for j in range(1, n):
        shifted = F.slice(tokens, j + 1,
                          F.greatest(F.size(tokens) - j, F.lit(0)))
        # concat (not concat_ws) so positions past the end stay null
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(
        k <= 0,
        # degenerate short doc: single shingle = whole normalized text
        F.array(F.concat_ws(" ", tokens)),
    ).otherwise(F.slice(grams, 1, k))


def char_shingles(col: Column, n: int = 5) -> Column:
    """Array of overlapping character n-grams of the normalized text.

    Same zip_with-chain construction as :func:`word_shingles` (over the
    single-character split) — ``transform(sequence, i -> substring(t,
    i, n))`` would re-normalize the whole document at every position,
    O(len²) per doc on long pages."""
    t = normalize_text(col)
    chars = F.split(t, "")
    k = F.length(t) - (n - 1)
    grams = chars
    for j in range(1, n):
        shifted = F.slice(chars, j + 1,
                          F.greatest(F.size(chars) - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, b))
    return F.when(k <= 0, F.array(t)).otherwise(F.slice(grams, 1, k))


# Winnowing (rolling-hash) fingerprints — Schleimer/Wilkerson/Aiken's
# local document fingerprinting: polynomial rolling hash over every
# char k-gram, then the minimum hash of each sliding window of w
# consecutive k-gram hashes; the distinct set of selected hashes is a
# position-robust fingerprint (shared substrings of length ≥ w+k-1
# always share a fingerprint). Parameters sized for exact SQL parity:
# BASE^(k-1)·(maxcodepoint) stays far inside signed-64.
WINNOW_BASE = 1_000_003           # prime base for the polynomial hash
WINNOW_MOD = (1 << 31) - 1        # Mersenne 2^31-1, same domain as minhash


def winnowing_fingerprints(col: Column, *, k: int = 5, w: int = 8) -> Column:
    """array<long> of distinct winnowed k-gram hashes of the normalized
    text (docs shorter than k chars hash their whole text as one gram).

    One Arrow batch over the raw string: codepoints are decoded
    vectorized (utf-32 view — no per-char Python), the rolling hash and
    the window minima are numpy sliding-window matrix ops. The same
    polynomial over codepoints is re-derivable in ANSI SQL (generated
    k-term sum over unicode()), which is what makes the fingerprint
    oracle-checkable — xxhash-based shingles are not.
    """
    from pyspark.sql import functions as FF
    from pyspark.sql import types as T

    udf = FF.pandas_udf(_winnow_factory(k, w), T.ArrayType(T.LongType()))
    return udf(normalize_text(col))


def _winnow_factory(k: int, w: int):
    import numpy as np
    import pandas as pd

    powers = np.array([pow(WINNOW_BASE, k - 1 - j, WINNOW_MOD)
                       for j in range(k)], dtype=np.uint64)

    def batch(texts: "pd.Series") -> "pd.Series":
        out: list = []
        for s in texts:
            if s is None:
                out.append(None)
                continue
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) \
                .astype(np.uint64)
            if cp.size == 0:
                out.append([])
                continue
            if cp.size < k:
                h = int((cp * powers[-cp.size:]).sum() % WINNOW_MOD)
                out.append([h])
                continue
            grams = np.lib.stride_tricks.sliding_window_view(cp, k)
            hashes = (grams * powers).sum(axis=1) % WINNOW_MOD
            if hashes.size <= w:
                sel = np.array([hashes.min()])
            else:
                wins = np.lib.stride_tricks.sliding_window_view(hashes, w)
                sel = wins.min(axis=1)
            out.append(np.unique(sel).astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return batch


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set in one projection."""
    c = F.col(text_col)
    return df.select(
        "*",
        char_count(c).alias("n_chars_measured"),
        token_count(c).alias("n_tokens"),
        avg_token_length(c).alias("avg_token_len"),
        punct_ratio(c).alias("punct_ratio"),
        uppercase_ratio(c).alias("upper_ratio"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# grapheme-exact length (SURVEY §7 hard parts: String.length/1 counts
# GRAPHEMES; F.length counts codepoints)
# ---------------------------------------------------------------------------

def _grapheme_count_py(s: str | None) -> int | None:
    """Extended-grapheme-cluster count, approximating UAX #29 with the
    rules that matter for web text: combining marks (Mn/Me/Mc incl.
    variation selectors) attach to the previous cluster, ZWJ joins only
    when followed by an Extended_Pictographic (GB11 — ZWJ between plain
    letters does NOT join), regional-indicator pairs form one flag
    (GB12/13). Known delta vs full UAX #29: emoji skin-tone modifiers
    (Sk category) count separately; Hangul LV/LVT sequences are not
    special-cased. Matches Elixir String.length/1 and DuckDB
    length_grapheme on the documented corpus classes."""
    import unicodedata

    if s is None:
        return None
    n = 0
    prev_zwj = False
    ri_run = 0
    for ch in s:
        o = ord(ch)
        if ch == "\u200d":
            prev_zwj = True
            continue
        is_mark = unicodedata.category(ch) in ("Mn", "Me", "Mc")
        is_ext_pict = (0x1F000 <= o <= 0x1FAFF) or (0x2600 <= o <= 0x27BF)
        if is_mark or (prev_zwj and is_ext_pict):
            prev_zwj = False
            continue
        prev_zwj = False
        if 0x1F1E6 <= o <= 0x1F1FF:
            ri_run += 1
            if ri_run % 2 == 0:
                continue
        else:
            ri_run = 0
        n += 1
    return n


def grapheme_count(col: Column) -> Column:
    """Arrow-batched grapheme-cluster count — the opt-in EXACT length
    mode for string rules (``z.string(length_mode='grapheme')``). This
    is deliberately off the hot path: the default codepoint length is a
    pure JVM expression; switch modes only where grapheme-exact parity
    with the reference's String.length/1 matters."""
    udf = F.pandas_udf(
        lambda s: s.map(_grapheme_count_py), "long")
    return udf(col)


# ---------------------------------------------------------------------------
# PII pattern scan (training-data hygiene: flag documents carrying
# emails / IPs / phone-shaped strings before they enter a corpus)
# ---------------------------------------------------------------------------

# RE2-safe (no lookahead) so the DuckDB oracle evaluates the identical
# patterns. Deliberately high-recall shapes — a hygiene scan flags for
# review/scrub, it does not adjudicate.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (r"\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
               r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b")
PII_PHONE_RE = r"\+[0-9][0-9()\-\s]{7,14}[0-9]"


def _pattern_count(col: Column, pattern: str) -> Column:
    return F.coalesce(
        F.size(F.regexp_extract_all(F.coalesce(col, F.lit("")),
                                    F.lit(pattern), F.lit(0))),
        F.lit(0)).cast("long")


def pii_email_count(col: Column) -> Column:
    return _pattern_count(col, PII_EMAIL_RE)


def pii_ipv4_count(col: Column) -> Column:
    return _pattern_count(col, PII_IPV4_RE)


def pii_phone_count(col: Column) -> Column:
    return _pattern_count(col, PII_PHONE_RE)


def with_pii_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document PII match counts + an any-PII flag — one
    scan projection, pure expressions; compose with pipeline.curate's
    quality gate (``.where(~F.col("has_pii")``) to scrub at intake."""
    c = F.col(text_col)
    out = df.select(
        "*",
        pii_email_count(c).alias("n_pii_email"),
        pii_ipv4_count(c).alias("n_pii_ipv4"),
        pii_phone_count(c).alias("n_pii_phone"),
    )
    return out.withColumn(
        "has_pii",
        (F.col("n_pii_email") + F.col("n_pii_ipv4")
         + F.col("n_pii_phone")) > 0)


# ---------------------------------------------------------------------------
# decontamination + corpus n-gram stats
# ---------------------------------------------------------------------------

def contamination_check(df: DataFrame, probes: DataFrame, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        probe_id_col: str = "probe_id",
                        probe_text_col: str = "probe_text") -> DataFrame:
    """Benchmark-decontamination scan: per probe string, how many
    documents CONTAIN it (after the same whitespace/case normalization
    fingerprints use) and the smallest matching doc id.

    Plan shape: the probe set (an eval benchmark — thousands of rows,
    not billions) is BROADCAST and every document checks containment
    against each probe in one scan-projection — no shuffle of the
    corpus, cost = n_docs × n_probes substring searches, all JVM-side.
    For probe sets beyond broadcast size, pre-filter candidates with
    :func:`ngram_counts`-style gram joins before the contains pass."""
    p = F.broadcast(probes.select(
        F.col(probe_id_col),
        normalize_text(F.col(probe_text_col)).alias("__probe")))
    docs = df.select(F.col(id_col),
                     normalize_text(F.col(text_col)).alias("__t"))
    hits = docs.join(p, F.col("__t").contains(F.col("__probe")))
    return (hits.groupBy(probe_id_col)
            .agg(F.count("*").alias("n_docs"),
                 F.min(id_col).alias("first_doc_id")))


def ngram_counts(df: DataFrame, *, text_col: str = "text",
                 n: int = 2, min_count: int = 2) -> DataFrame:
    """Corpus-level word n-gram frequencies: ``(ngram, n_occurrences)``
    over the normalized token stream — one explode + one hash
    aggregation with map-side combine (the standard shape for
    contamination candidate generation, boilerplate mining and
    quality lexicons). Bigrams (the common case) build via one
    ``zip_with`` of the token array against its tail instead of the
    per-position slice+concat_ws chain — same strings, one pass."""
    if n == 2:
        tokens = F.split(normalize_text(F.col(text_col)), " ")
        sh = F.when(
            F.size(tokens) <= 1, F.array(F.concat_ws(" ", tokens))
        ).otherwise(
            F.zip_with(F.slice(tokens, 1, F.size(tokens) - 1),
                       F.slice(tokens, 2, F.size(tokens) - 1),
                       lambda a, b: F.concat(a, F.lit(" "), b)))
    else:
        sh = word_shingles(F.col(text_col), n)
    return (df.select(F.explode(sh).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count("*").alias("n_occurrences"))
            .where(F.col("n_occurrences") >= min_count))


def _bigram_array(tokens: Column) -> Column:
    """Word bigrams via one zip_with of the token array against its own
    tail (single pass; same strings as the slice+concat chain).
    Degenerate ≤1-token docs yield one "bigram" = the whole text, the
    same convention as `word_shingles`."""
    return F.when(
        F.size(tokens) <= 1, F.array(F.concat_ws(" ", tokens))
    ).otherwise(
        F.zip_with(F.slice(tokens, 1, F.size(tokens) - 1),
                   F.slice(tokens, 2, F.size(tokens) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)))


def repetition_stats(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals — the Gopher-style quality gates
    (Rae et al. 2021, "Scaling Language Models", table A1) that catch
    boilerplate and keyword-stuffed spam which per-char heuristics
    miss: ``(id, n_tokens, n_distinct, distinct_ratio,
    top_token_frac, top_bigram_frac)`` where *top_x_frac* is the share
    of the document occupied by its single most frequent token/bigram.

    Shape at 10^12 docs: explode → two-level hash aggregation, both
    keyed on (doc, gram) then (doc) — partial aggregation combines
    map-side, and because every key contains the doc id the shuffle is
    uniform regardless of corpus-level token skew ("the" being 5% of
    the corpus does not skew any partition). The unigram and bigram
    legs aggregate independently and meet in an equi-join on the doc
    id; at scale both sides arrive hash-partitioned on that same key,
    so the join is co-located (no extra exchange under AQE).
    """
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    uni = (df.select(F.col(id_col), F.explode(tokens).alias("tok"))
           .groupBy(id_col, "tok").agg(F.count("*").alias("c"))
           .groupBy(id_col)
           .agg(F.sum("c").alias("n_tokens"),
                F.count("*").alias("n_distinct"),
                F.max("c").alias("top_c")))
    bi = (df.select(F.col(id_col),
                    F.explode(_bigram_array(tokens)).alias("gram"))
          .groupBy(id_col, "gram").agg(F.count("*").alias("c"))
          .groupBy(id_col)
          .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc")))
    return (uni.join(bi, id_col)
            .select(F.col(id_col),
                    F.col("n_tokens"), F.col("n_distinct"),
                    F.round(F.col("n_distinct") / F.col("n_tokens"), 6)
                    .alias("distinct_ratio"),
                    F.round(F.col("top_c") / F.col("n_tokens"), 6)
                    .alias("top_token_frac"),
                    F.round(F.col("top_bc") / F.col("n_bigrams"), 6)
                    .alias("top_bigram_frac")))


# ---------------------------------------------------------------------------
# line-level curation (CCNet / RefinedWeb / C4-style)
# ---------------------------------------------------------------------------

def split_lines(col: Column) -> Column:
    """Document → array of lines (split on ``\\n``). Pure Column; the
    unit every line-level curation operator below works on."""
    return F.split(F.coalesce(col, F.lit("")), "\n")


def chunk_lines(col: Column, *, words_per_line: int = 8) -> Column:
    """Re-chunk a single-line token stream into fixed-width "lines" of
    *words_per_line* whitespace tokens, joined with ``\\n`` — the
    deterministic line-structure synthesizer for corpora whose
    extracted text carries no newlines (the parquet fixtures). Pure
    Column (sequence → transform → slice), identical semantics in
    DuckDB list algebra, so line-level operators stay oracle-checkable
    end to end."""
    toks = F.split(F.trim(col), r"\s+")
    k = words_per_line
    n_chunks = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.array_join(
            F.slice(toks, (i - 1) * k + 1, k), " "))
    return F.array_join(lines, "\n")


def frequent_lines(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", min_docs: int = 5,
                   max_lines: int | None = 10_000) -> DataFrame:
    """Corpus-level boilerplate mining: ``(line, n_docs)`` for every
    distinct trimmed non-empty line that appears in ≥ *min_docs*
    distinct documents (nav bars, cookie banners, footers — the CCNet
    / RefinedWeb repeated-line signal).

    Shape at 10^12 docs: explode lines → per-doc distinct (hash
    aggregation keyed on (doc, line) — uniform, the doc id is in the
    key) → count per line. The second aggregation keys on the line
    alone; a mega-frequent line is ONE hot key whose partial counts
    combine map-side, so the shuffle stays balanced. *max_lines* caps
    the result at the top-K most frequent lines (the head of the Zipf
    curve is where all the boilerplate mass lives), keeping the
    removal set broadcastable no matter the corpus size.
    """
    line = F.trim(F.col("_line"))
    per_doc = (df.select(F.col(id_col),
                         F.explode(split_lines(F.col(text_col)))
                         .alias("_line"))
               .select(F.col(id_col), line.alias("line"))
               .where(F.length("line") > 0)
               .distinct())
    freq = (per_doc.groupBy("line")
            .agg(F.count("*").alias("n_docs"))
            .where(F.col("n_docs") >= min_docs))
    if max_lines is not None:
        freq = (freq.orderBy(F.col("n_docs").desc(), F.col("line"))
                .limit(max_lines))
    return freq


def strip_boilerplate(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", min_docs: int = 5,
                      max_lines: int | None = 10_000,
                      frequent: DataFrame | None = None,
                      out_col: str = "clean_text") -> DataFrame:
    """Remove corpus-frequent lines from every document, preserving the
    order (and bytes) of the surviving lines — RefinedWeb-style
    boilerplate removal.

    Scale shape: the frequent-line set (capped at *max_lines* by
    `frequent_lines`) is collapsed to ONE row holding the line array
    and cross-joined back — a broadcast of a bounded set, after which
    the removal is a pure ``filter``/``array_join`` projection: no
    explode of the corpus, no per-doc regroup, no shuffle of document
    text. Adds ``n_lines``, ``n_kept`` and *out_col*; never rewrites
    *text_col* (byte-identity invariant).
    """
    if frequent is None:
        frequent = frequent_lines(df, text_col=text_col, id_col=id_col,
                                  min_docs=min_docs, max_lines=max_lines)
    drop_set = frequent.agg(
        F.coalesce(F.collect_set("line"), F.array().cast("array<string>"))
        .alias("_drop_lines"))
    lines = split_lines(F.col(text_col))
    kept = F.filter(
        lines,
        lambda x: (F.length(F.trim(x)) > 0)
        & ~F.array_contains(F.col("_drop_lines"), F.trim(x)))
    return (df.crossJoin(F.broadcast(drop_set))
            .withColumn("n_lines", F.size(F.filter(
                lines, lambda x: F.length(F.trim(x)) > 0)))
            .withColumn("n_kept", F.size(kept))
            .withColumn(out_col, F.array_join(kept, "\n"))
            .drop("_drop_lines"))


def c4_line_filter(df: DataFrame, *, text_col: str = "text",
                   min_words: int = 3, require_terminal: bool = True,
                   blocklist: tuple[str, ...] = ("javascript", "cookie"),
                   out_col: str = "clean_text") -> DataFrame:
    """C4-style line filtering (Raffel et al. 2020 §2.2): keep only
    lines with ≥ *min_words* words, (optionally) ending in terminal
    punctuation, and containing no blocklist marker; rebuild the
    document from the survivors. Pure Column (split → filter →
    array_join) — one codegen'd projection, zero shuffle, the ideal
    10^12-doc shape. Adds ``n_lines``, ``n_kept``, *out_col*."""
    lines = split_lines(F.col(text_col))

    def pred(x):
        t = F.trim(x)
        p = F.size(F.split(t, r"\s+")) >= F.lit(min_words)
        p = p & (F.length(t) > 0)
        if require_terminal:
            p = p & F.substring(t, -1, 1).isin(".", "!", "?")
        low = F.lower(t)
        for marker in blocklist:
            p = p & ~low.contains(marker)
        return p

    kept = F.filter(lines, pred)
    return (df.withColumn("n_lines", F.size(F.filter(
                lines, lambda x: F.length(F.trim(x)) > 0)))
            .withColumn("n_kept", F.size(kept))
            .withColumn(out_col, F.array_join(kept, "\n")))


def unigram_logprob(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document mean unigram surprisal — the CCNet-style
    perplexity proxy: with corpus MLE probabilities p(w) =
    count(w)/N, score(doc) = Σ c_w·(−log2 p(w)) / Σ c_w. Low = head
    boilerplate, high = rare-token noise; both tails are what quality
    gates trim.

    Shape at 10^12 docs: one explode → (doc, token) counts (uniform,
    doc id in the key) feeding BOTH legs: the corpus vocabulary is a
    re-aggregation of those counts by token (map-side combine absorbs
    Zipf skew), and the per-doc score joins the vocabulary back on the
    token key. The vocabulary is tiny relative to the corpus (≤ a few
    million rows for web text) → broadcast join, no shuffle of the
    exploded side beyond the first aggregation.
    """
    doc_tok = _doc_token_counts(df, text_col=text_col,
                                id_col=id_col).persist()
    vocab = (doc_tok.groupBy("tok").agg(F.sum("c").alias("cw")))
    total = vocab.agg(F.sum("cw").alias("n_total"))
    scored = (doc_tok
              .join(F.broadcast(vocab), "tok")
              .crossJoin(F.broadcast(total))
              .groupBy(id_col)
              .agg(F.sum("c").alias("n_tokens"),
                   F.sum(F.col("c") * -F.log2(F.col("cw") / F.col("n_total")))
                   .alias("_surprisal")))
    out = scored.select(
        F.col(id_col), F.col("n_tokens"),
        F.round(F.col("_surprisal") / F.col("n_tokens"), 6)
        .alias("mean_surprisal"))
    out._zoi_persisted = [doc_tok]  # release after materialization
    return out


def dup_ngram_fraction(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 5,
                       min_docs: int = 2) -> DataFrame:
    """Per-document cross-corpus duplicated n-gram fraction — the
    distributed stand-in for exact-substring dedup (Lee et al. 2022,
    arXiv:2107.06499) and Gopher's dup-n-gram repetition signals (Rae
    et al. 2021 §A1.1): the share of a document's word n-grams that
    also appear in at least ``min_docs`` DISTINCT documents. High
    fractions mark templated/boilerplate pages that survive whole-doc
    dedup because their non-shared remainder differs.

    A true suffix-array pass is a single-machine algorithm; this is the
    shuffle-native reformulation: explode positional n-grams → one hash
    aggregation for document frequency (map-side combine absorbs the
    Zipf head) → hash equi-join back on the gram → per-doc aggregate.
    Two shuffles, both on uniform hash keys, nothing quadratic. At
    10^12 docs, pre-filter the frequency table to ``df >= min_docs``
    before the join (done here) so the joined side carries only the
    duplicated tail, and shingle hashes (``dedup.hashed_shingles``)
    can replace gram strings to cut shuffle bytes.

    Returns ``(id_col, n_grams, n_dup, dup_fraction)`` — gate with
    e.g. ``dup_fraction <= 0.3``. The exploded gram table feeds BOTH
    the frequency aggregation and the join probe side, so it is
    persisted for the call (otherwise the corpus-wide explode — the
    dominant cost — runs twice); the handle rides on the result's
    ``_zoi_persisted`` for release after materialization, same
    contract as ``unigram_logprob``.
    """
    grams = (df.select(F.col(id_col),
                       F.explode(word_shingles(F.col(text_col), n))
                       .alias("gram"))).persist()
    dfreq = (grams.groupBy("gram")
             .agg(F.count_distinct(F.col(id_col)).alias("_df"))
             .where(F.col("_df") >= min_docs)
             .select("gram"))
    flagged = (grams.join(dfreq.withColumn("_dup", F.lit(1)),
                          "gram", "left"))
    out = (flagged.groupBy(id_col)
           .agg(F.count("*").alias("n_grams"),
                F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
                .alias("n_dup"))
           .select(F.col(id_col), "n_grams", "n_dup",
                   F.round(F.col("n_dup") / F.col("n_grams"), 6)
                   .alias("dup_fraction")))
    out._zoi_persisted = [grams]  # release after materialization
    return out


def gopher_quality_flags(df: DataFrame, *, text_col: str = "text",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_word_ratio: float = 0.1,
                         max_bullet_line_ratio: float = 0.1,
                         max_ellipsis_line_ratio: float = 0.3,
                         min_alpha_word_ratio: float = 0.8,
                         min_stop_hits: int = 2,
                         stopwords: tuple[str, ...] = (
                             "the", "be", "to", "of", "and",
                             "that", "have", "with")) -> DataFrame:
    """Gopher-rule document quality flags (Rae et al. 2021, Gopher
    appendix A1.1) — the standard pre-training admission battery:
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#``/ellipsis), bullet-started and ellipsis-ended line ratios,
    alphabetic-word ratio, and a minimum distinct-stopword hit count.

    Entirely expression-level (split / filter / aggregate over the
    token and line arrays — no explode, no UDF, no shuffle): the whole
    battery fuses into the scan projection, the ideal 10^12-doc shape.
    Appends one boolean per rule plus the conjunction ``gopher_pass``;
    gate with ``df.where("gopher_pass")`` or inspect per-rule drop
    rates with one aggregation.
    """
    c = F.col(text_col)
    toks = F.filter(F.split(normalize_text(c), " "),
                    lambda t: F.length(t) > 0)
    nw = F.size(toks)
    mean_wl = F.when(
        nw > 0,
        F.aggregate(toks, F.lit(0.0),
                    lambda a, t: a + F.length(t)) / nw).otherwise(F.lit(0.0))
    nsym = (F.regexp_count(c, F.lit("#"))
            + F.regexp_count(c, F.lit(r"\.\.\."))
            + F.regexp_count(c, F.lit("…")))
    lines = F.split(c, "\n")
    nl = F.size(lines)
    nbullet = F.size(F.filter(
        lines, lambda x: F.trim(x).rlike("^[-*•]")))
    nell = F.size(F.filter(
        lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
    nalpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    nstop = F.size(F.array_intersect(
        toks, F.array(*[F.lit(s) for s in stopwords])))

    flags = {
        "g_word_count": (nw >= min_words) & (nw <= max_words),
        "g_mean_word_len": (nw > 0) & (mean_wl >= min_mean_word_len)
                           & (mean_wl <= max_mean_word_len),
        "g_symbol_ratio": (nw > 0)
                          & (nsym / nw <= max_symbol_word_ratio),
        "g_bullet_ratio": (nl > 0)
                          & (nbullet / nl <= max_bullet_line_ratio),
        "g_ellipsis_ratio": (nl > 0)
                            & (nell / nl <= max_ellipsis_line_ratio),
        "g_alpha_ratio": (nw > 0)
                         & (nalpha / nw >= min_alpha_word_ratio),
        "g_stopwords": nstop >= min_stop_hits,
    }
    out = df
    for name, flag in flags.items():
        out = out.withColumn(name, flag)
    gopher_pass = None
    for name in flags:
        col = F.col(name)
        gopher_pass = col if gopher_pass is None else gopher_pass & col
    return out.withColumn("gopher_pass", gopher_pass)


def ngram_decontamination(df: DataFrame, probes: DataFrame, *,
                          text_col: str = "text", id_col: str = "doc_id",
                          probe_id_col: str = "probe_id",
                          probe_text_col: str = "probe_text",
                          n: int = 13) -> DataFrame:
    """N-gram-overlap benchmark decontamination (the GPT-3 appendix-C /
    PaLM protocol): a document is contaminated by a probe when they
    share ANY word n-gram (13-grams classically). Catches partial /
    reflowed quotations that whole-substring containment
    (:func:`contamination_check`) misses.

    Shape: both sides explode to DISTINCT (id, gram) and meet in one
    hash equi-join on the gram — corpus side shuffles once on the gram
    key; the probe side is benchmark-sized (thousands of rows), so AQE
    broadcasts it. Nothing quadratic, no UDF. Returns one row per
    contaminated (doc, probe) pair with the shared-gram count — feed
    the distinct doc ids to an anti-join to scrub.
    """
    doc_grams = (df.select(F.col(id_col),
                           F.explode(word_shingles(F.col(text_col), n))
                           .alias("gram")).distinct())
    probe_grams = (probes.select(F.col(probe_id_col),
                                 F.explode(word_shingles(
                                     F.col(probe_text_col), n))
                                 .alias("gram")).distinct())
    return (doc_grams.join(probe_grams, "gram")
            .groupBy(id_col, probe_id_col)
            .agg(F.count("*").alias("n_shared_grams")))


def strip_repeated_lines(df: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         out_col: str = "clean_text") -> DataFrame:
    """Within-document exact repeated-line removal — the in-doc
    complement of corpus-level :func:`strip_boilerplate` (Gopher's
    in-document repetition signals, Rae et al. 2021 §A1.1, applied as
    a correction instead of a drop): every NON-BLANK line keeps its
    FIRST occurrence and later byte-identical repeats are removed;
    blank/whitespace-only lines are EXEMPT — they are paragraph
    structure, not repetition, and a naive ``array_distinct`` would
    merge every paragraph after the first separator.

    Shape: posexplode → first-occurrence window on (doc, line) →
    position-ordered re-aggregation → join back. Two keyed shuffles +
    one id join — not a fused projection, because first-occurrence
    with an exemption needs per-line ordering, and the in-expression
    alternatives (array_position inside a filter lambda) re-scan the
    line array per element, O(lines²) per doc. Adds ``n_lines``,
    ``n_kept``, *out_col*; original bytes untouched.
    """
    lines = split_lines(F.col(text_col))
    base = df.withColumn("n_lines", F.size(lines))
    exploded = base.select(
        F.col(id_col), F.posexplode(lines).alias("__pos", "__line"))
    w = Window.partitionBy(id_col, "__line").orderBy("__pos")
    kept = (exploded.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) | (F.trim("__line") == "")))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count("*").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__line"))),
                            lambda s: s["__line"]),
                        "\n").alias(out_col)))
    return base.join(rebuilt, id_col)


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (broadcast-membership variant)
# ---------------------------------------------------------------------------

def _bloom_position(gram: Column, i: int, m: int) -> Column:
    """Bit position i of a Bloom filter over word n-grams: first 32
    bits of ``md5('bloom<i>:' || gram)`` mod ``m``. md5 (not
    xxhash64) so the DuckDB oracle derives identical positions."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"bloom{i}:"), gram)), 1, 8), 16, 10)
        .cast("long") % m)


def bloom_decontamination(df: DataFrame, probes: DataFrame, *,
                          text_col: str = "text", id_col: str = "doc_id",
                          probe_text_col: str = "probe_text",
                          n: int = 13, m: int = 1 << 20,
                          k: int = 4) -> DataFrame:
    """Benchmark decontamination via a Bloom filter over the probe
    side's word n-grams — the constant-memory screen that scales where
    the exact gram equi-join (:func:`ngram_decontamination`) shuffles
    the corpus's full gram stream.

    Build: every distinct probe n-gram sets ``k`` bit positions
    (``md5('bloom<i>:'||gram) mod m``); the filter is materialized as
    the DISTINCT position table — at most ``k × |probe grams|`` ints
    regardless of corpus size, broadcast to every executor. Probe: a
    document n-gram is flagged iff ALL ``k`` of its positions are set.
    The corpus side therefore never shuffles on the gram key: its only
    exchange is the final per-document aggregation.

    Bloom semantics are preserved exactly — including false positives
    (a gram whose k positions are covered by OTHER grams' bits flags
    spuriously, rate ≈ (1 - e^(-k·g/m))^k for g build grams). That is
    the operator's contract: a SCREEN whose hits feed the exact
    verifier, mirroring how the LSH candidates feed
    ``exact_jaccard_pairs``. The DuckDB twin re-derives the same bit
    positions, so the gate checks the false-positive behavior too.

    Returns ``(id_col, n_grams, n_hit_grams, bloom_contaminated)`` —
    one row per document with at least one n-gram (short docs hash
    their whole normalized text as the single gram, per
    :func:`word_shingles`).
    """
    probe_grams = (probes.select(
        F.explode(word_shingles(F.col(probe_text_col), n)).alias("gram"))
        .where(F.length("gram") > 0).distinct())
    bits = (probe_grams.select(
        F.explode(F.array(*[
            _bloom_position(F.col("gram"), i, m) for i in range(k)]))
        .alias("__pos")).distinct())

    # ONE pass over the corpus gram stream: the (doc, gram) distinct is
    # the only corpus-keyed shuffle; position probing rides on it as a
    # k-wide posexplode + broadcast left join, and BOTH the per-doc
    # totals and the hit counts come out of the same aggregation chain.
    doc_grams = (df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .where(F.length("gram") > 0).distinct())
    probed = doc_grams.select(
        F.col(id_col), F.col("gram"),
        F.posexplode(F.array(*[
            _bloom_position(F.col("gram"), i, m) for i in range(k)]))
        .alias("__i", "__pos"))
    marked = probed.join(
        F.broadcast(bits.withColumn("__set", F.lit(True))), "__pos", "left")
    per_gram = (marked.groupBy(id_col, "gram")
                .agg((F.count(F.when(F.col("__set"), True)) == k)
                     .alias("__hit")))
    return (per_gram.groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.count(F.when(F.col("__hit"), True))
                 .alias("n_hit_grams"))
            .select(F.col(id_col), F.col("n_grams"), F.col("n_hit_grams"),
                    (F.col("n_hit_grams") > 0).alias("bloom_contaminated")))


# ---------------------------------------------------------------------------
# hashed-feature linear quality classifier (fastText-style, frozen weights)
# ---------------------------------------------------------------------------

QLIN_DIM = 1024          # hashed feature buckets (the "hashing trick")
_QLIN_WSCALE = 2_000_001  # weight lattice: md5 % scale / 1e6 - 1 ∈ [-1, 1]


def _qlin_weight(tok: Column, *, dim: int = QLIN_DIM,
                 seed: str = "qlin") -> Column:
    """Weight of a token under the frozen hashed-feature linear model:
    bucket = md5(token) mod ``dim``; weight(bucket) = a deterministic
    md5-derived lattice point in [-1, 1]. Two md5 stages so tokens
    sharing a bucket share a weight — real hashing-trick collisions,
    not per-token noise."""
    bucket = (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
              .cast("long") % dim)
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{seed}#"), bucket.cast("string"))),
        1, 8), 16, 10).cast("long")
    return (h % _QLIN_WSCALE).cast("double") / 1e6 - 1.0


def linear_quality_score(df: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id", dim: int = QLIN_DIM,
                         seed: str = "qlin", bias: float = 0.0) -> DataFrame:
    """Model-based quality scoring: a linear classifier over hashed
    bag-of-words features — the plumbing of a fastText/logistic quality
    filter (the CCNet / GPT-3 "quality classifier" stage), with the
    trained weight table replaced by a FROZEN deterministic one so the
    DuckDB oracle can re-derive every score bit-for-bit. In production
    the weight vector is a broadcast array looked up by bucket; here
    the lookup is inlined as two md5 stages (bucket, then weight),
    which keeps the operator a PURE per-row projection.

    score = sigmoid(bias + mean_token(weight(bucket(token)))) — the
    mean (not sum) so score is length-invariant, matching how such
    classifiers are applied per document regardless of length.

    Plan shape: no explode, no join, no shuffle — one
    ``F.aggregate`` fold over the token array inside whole-stage
    codegen. At 10^12 docs this is scan-bound, exactly like
    ``quality_score``; swapping in genuinely trained weights means
    replacing :func:`_qlin_weight` with a broadcast map lookup and
    changes nothing else in the plan.

    Returns ``(id_col, n_tokens, qlin_score)``; empty/whitespace docs
    score NULL (no tokens to average).
    """
    tokens = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                      lambda t: F.length(t) > 0)
    n = F.size(tokens)
    total = F.aggregate(
        tokens, F.lit(0.0),
        lambda acc, t: acc + _qlin_weight(t, dim=dim, seed=seed))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(
        -(F.lit(bias) + total / n.cast("double"))))
    return df.select(
        F.col(id_col), n.cast("bigint").alias("n_tokens"),
        F.when(n > 0, F.round(score, 6)).alias("qlin_score"))


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail per language)
# ---------------------------------------------------------------------------

def perplexity_buckets(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id", lang_col: str = "lang",
                       n_buckets: int = 3) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, §4.3):
    rank every document WITHIN ITS LANGUAGE by the unigram-surprisal
    perplexity proxy (:func:`unigram_logprob`) and cut into
    ``n_buckets`` equal-count buckets — bucket 1 ("head") = most
    fluent, bucket ``n`` ("tail") = most surprising. CCNet keeps head
    +middle for LM pretraining and drops or down-weights the tail.

    Per-doc rows carry the bucket; callers gate with
    ``WHERE bucket < n`` or join the bucket as a sampling weight.
    The ntile ordering ties on (rounded score, doc id) so the split is
    deterministic and the DuckDB twin reproduces it exactly.

    Shape at 10^12 docs: the surprisal pass is the dominant cost (see
    :func:`unigram_logprob`); the ntile window shuffles the SCORED
    frame (id, lang, score — bytes-per-row tiny) once on the language
    key. Languages are few and huge → for production add a salt split
    like ``sampling.host_cap`` and cut on per-split ntiles, or replace
    ntile with approxQuantile cut points; at gate scale the exact
    window IS the oracle-checkable contract.
    """
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    withlang = scored.join(df.select(id_col, lang_col), id_col)
    w = (Window.partitionBy(lang_col)
         .orderBy(F.col("mean_surprisal"), F.col(id_col)))
    out = withlang.select(
        F.col(id_col), F.col(lang_col), F.col("n_tokens"),
        F.col("mean_surprisal"),
        F.ntile(n_buckets).over(w).alias("ppl_bucket"))
    out._zoi_persisted = getattr(scored, "_zoi_persisted", [])
    return out


# ---------------------------------------------------------------------------
# Unicode script profile (script-mix QC)
# ---------------------------------------------------------------------------

# BMP codepoint ranges per script — deliberately EXPLICIT ranges (not
# \p{Script=...} classes) so the Java-regex and RE2/DuckDB sides of the
# oracle agree byte-for-byte. Order matters: `dominant_script` breaks
# count ties by this declaration order.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "cjk": "一-鿿぀-ヿ가-힯",
    "digit": "0-9",
}


def script_count(col: Column, script: str) -> Column:
    """Number of characters of *col* inside the named script's ranges:
    ``length(col) - length(regexp_replace(col, '[ranges]', ''))`` —
    counting by deletion keeps the expression a plain JVM projection
    and is reproducible verbatim in the DuckDB oracle."""
    rng = SCRIPT_RANGES[script]
    return (F.length(col)
            - F.length(F.regexp_replace(col, f"[{rng}]", "")))


def script_profile(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document Unicode script mix — the intake QC that catches
    wrong-script-for-language pages (a `lang='en'` page that is 90%
    Cyrillic is mislabeled or spam) and mixed-script keyword-stuffing
    (CCNet and FineWeb both gate on script consistency before any
    model-based language ID is trusted).

    Emits one count column per :data:`SCRIPT_RANGES` entry plus
    ``n_chars`` (total), ``script_chars`` (sum of matched counts —
    punctuation/whitespace are in neither), ``dominant_script`` (the
    declaration-order-first script with the maximal count; NULL when
    no script character occurs) and ``latin_fraction`` (share of
    matched characters that are Latin, NULL when none matched).

    Plan shape: a pure per-row projection — one regexp_replace per
    script class, all fused into the scan's codegen stage; no explode,
    no shuffle, no UDF. At 10^12 docs this rides the same single pass
    as the other quality columns.
    """
    c = F.col(text_col)
    counts = {name: script_count(c, name) for name in SCRIPT_RANGES}
    total = None
    for expr in counts.values():
        total = expr if total is None else total + expr
    best = F.greatest(*counts.values())
    dominant = F.lit(None).cast("string")
    for name in reversed(list(SCRIPT_RANGES)):
        dominant = F.when(counts[name] == best, F.lit(name)) \
            .otherwise(dominant)
    dominant = F.when(best > 0, dominant)
    out_cols = [F.col(id_col)]
    out_cols += [counts[n].cast("bigint").alias(f"n_{n}")
                 for n in SCRIPT_RANGES]
    out_cols += [
        F.length(c).cast("bigint").alias("n_chars"),
        total.cast("bigint").alias("script_chars"),
        dominant.alias("dominant_script"),
        F.when(total > 0,
               F.round(counts["latin"].cast("double") / total, 6))
        .alias("latin_fraction"),
    ]
    return df.select(*out_cols)


# ---------------------------------------------------------------------------
# encoding-artifact (mojibake) scan
# ---------------------------------------------------------------------------

# Literal marker substrings of the two dominant web encoding failures —
# UTF-8 bytes decoded as Latin-1/Windows-1252 ("Ã", "â€", stray "Â")
# and lossy decoder substitution (U+FFFD, in-body U+FEFF BOMs). Literal
# substrings (NOT regexes) so both the Spark side and the DuckDB twin
# count them with plain `replace`, byte-for-byte.
MOJIBAKE_MARKERS: dict[str, str] = {
    "utf8_latin1": "Ã",    # Ã — UTF-8 lead byte read as Latin-1
    "win1252_punct": "â€",  # â€ — curly quote/dash via cp1252
    "nbsp_artifact": "Â",  # Â — stray NBSP lead byte
    "replacement": "�",    # � — decoder substitution
    "stray_bom": "﻿",      # in-body byte-order mark
}


def substring_count(col: Column, literal: str) -> Column:
    """Occurrences of a LITERAL substring, by replace-and-measure:
    ``(length(col) - length(replace(col, lit, ''))) / length(lit)``.
    Pure JVM projection, no regex dialect to reconcile with the
    oracle."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(literal))))
            / F.lit(len(literal))).cast("bigint")


def mojibake_stats(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_ratio: float = 0.001) -> DataFrame:
    """Per-document encoding-artifact scan — the ftfy-style intake QC
    (Speer 2019, ftfy; the fix_encoding heuristics) reduced to its
    detection half: count the marker substrings that UTF-8-as-Latin-1
    double-decoding and lossy decoders leave behind, and flag documents
    whose artifact density exceeds ``max_ratio``. Web crawls hit this
    constantly (mis-declared charsets); a page full of "â€™" poisons
    tokenizers and dedup shingles alike, so curation drops or re-decodes
    it before anything downstream.

    Emits one ``n_<marker>`` count per :data:`MOJIBAKE_MARKERS` entry
    plus ``n_chars``, ``mojibake_chars`` (sum of counts),
    ``mojibake_ratio`` (artifacts per character, NULL on empty text)
    and ``mojibake_flagged``.

    Plan shape: a pure per-row projection — one `replace` per marker,
    fused into the scan's codegen stage; no explode, no shuffle, no
    UDF, no regex. At 10^12 docs this rides the same single pass as
    the other quality columns (`script_profile`, `quality_score`).
    """
    c = F.col(text_col)
    counts = {name: substring_count(c, lit)
              for name, lit in MOJIBAKE_MARKERS.items()}
    total = None
    for expr in counts.values():
        total = expr if total is None else total + expr
    ratio = F.when(F.length(c) > 0,
                   F.round(total.cast("double") / F.length(c), 6))
    out_cols = [F.col(id_col)]
    out_cols += [counts[n].alias(f"n_{n}") for n in MOJIBAKE_MARKERS]
    out_cols += [
        F.length(c).cast("bigint").alias("n_chars"),
        total.cast("bigint").alias("mojibake_chars"),
        ratio.alias("mojibake_ratio"),
        F.coalesce(ratio > max_ratio, F.lit(False))
        .alias("mojibake_flagged"),
    ]
    return df.select(*out_cols)


def bigram_logprob(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", k: float = 0.5) -> DataFrame:
    """Per-document mean bigram surprisal under an add-k-smoothed
    corpus bigram LM — one model order up from :func:`unigram_logprob`,
    the distributed stand-in for CCNet's KenLM perplexity stage (Wenzek
    et al. 2020 §4.3; KenLM itself is a 5-gram variant of exactly this
    conditional-count construction). With corpus counts c(w1,w2) and
    context totals c(w1·) = Σ_w2 c(w1,w2) over a vocabulary of V
    distinct tokens:

        P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V)
        score(doc) = Σ occurrences −log2 P / n_bigrams

    Documents with fewer than two tokens have no bigrams and are
    excluded (the caller's length gate fires long before this anyway).

    Shape at 10^12 docs: ONE explode → (doc, bigram) counts (uniform
    keys, map-side combine), persisted because it feeds both the model
    and the scoring probe. The model side is two re-aggregations of
    that table (bigram totals, then context totals) — no second corpus
    pass. Scoring joins the bigram table back on the gram key (hash
    equi-join; the bigram vocabulary is Zipf-truncated by web text to
    ≪ corpus size but too large to broadcast — the CONTEXT table,
    one row per unigram, IS broadcast), and the vocabulary size rides
    in as a broadcast one-row cross join, never a driver collect.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    eligible = df.where(F.size(toks) >= 2)
    grams = (eligible.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), 2)).alias("gram")))
    doc_big = (grams.groupBy(id_col, "gram")
               .agg(F.count("*").alias("c"))).persist()
    big = (doc_big.groupBy("gram").agg(F.sum("c").alias("c12"))).persist()
    w1 = F.split(F.col("gram"), " ")[0]
    w2 = F.split(F.col("gram"), " ")[1]
    ctx = big.groupBy(w1.alias("w1")).agg(F.sum("c12").alias("c1"))
    vocab = (big.select(w1.alias("t")).union(big.select(w2))
             .distinct().agg(F.count("*").alias("v")))
    kk = F.lit(float(k))
    scored = (doc_big
              .join(big, "gram")
              .withColumn("w1", w1)
              .join(F.broadcast(ctx), "w1")
              .crossJoin(F.broadcast(vocab))
              .groupBy(id_col)
              .agg(F.sum("c").alias("n_bigrams"),
                   F.sum(F.col("c") * -F.log2(
                       (F.col("c12") + kk)
                       / (F.col("c1") + kk * F.col("v"))))
                   .alias("_surprisal")))
    out = scored.select(
        F.col(id_col), F.col("n_bigrams"),
        F.round(F.col("_surprisal") / F.col("n_bigrams"), 6)
        .alias("mean_bigram_surprisal"))
    out._zoi_persisted = [doc_big, big]  # release after materialization
    return out


def _doc_token_counts(df: DataFrame, *, text_col: str, id_col: str,
                      token_alias: str = "tok") -> DataFrame:
    """Shared prologue of the per-doc token statistics operators
    (tfidf / oov / entropy): (id, token, count) over the normalized
    whitespace token stream, empty tokens dropped — one explode, one
    hash aggregation with map-side combine. Persist policy stays with
    the caller (only multi-leg consumers cache it)."""
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    return (df.select(F.col(id_col),
                      F.explode(tokens).alias(token_alias))
            .where(F.length(token_alias) > 0)
            .groupBy(id_col, token_alias)
            .agg(F.count("*").alias("c")))


def tfidf_top_terms(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Per-document top-k TF-IDF terms (Salton & Buckley 1988;
    smoothed idf per scikit-learn's TfidfVectorizer default) — the
    keyword-extraction pass of a corpus indexing/clustering pipeline:

        tf(t,d) = c(t,d) / Σ_t c(t,d)
        idf(t)  = ln((1 + N) / (1 + df(t))) + 1
        rank within doc by (round(tf·idf, 6) DESC, term ASC), keep ≤ k.

    Ranking uses the ROUNDED score so the order is reproducible across
    engines (ln differs in the last ulp between libm builds; a raw
    float sort would make rank k vs k+1 platform-dependent). Documents
    with no tokens yield no rows.

    Shape at 10^12 docs: one explode → (doc, term) counts (map-side
    combine), persisted because it feeds both legs; document
    frequencies are a re-aggregation of that table (one row per term,
    Zipf-bounded ≪ corpus → broadcast back), N rides in as a broadcast
    one-row cross join, and both the doc-length sum and the top-k rank
    are windows over the SAME doc-id partitioning — one shuffle
    serves both.
    """
    doc_tok = _doc_token_counts(df, text_col=text_col, id_col=id_col,
                                token_alias="term").persist()
    dfreq = doc_tok.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = (doc_tok.select(id_col).distinct()
             .agg(F.count("*").alias("n_docs")))
    w_doc = Window.partitionBy(id_col)
    scored = (doc_tok
              .join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(ndocs))
              .withColumn("__dl", F.sum("c").over(w_doc))
              .withColumn("tfidf", F.round(
                  (F.col("c") / F.col("__dl"))
                  * (F.log((F.col("n_docs") + F.lit(1.0))
                           / (F.col("df") + F.lit(1.0))) + F.lit(1.0)),
                  6)))
    w_rank = (Window.partitionBy(id_col)
              .orderBy(F.desc("tfidf"), F.asc("term")))
    out = (scored.withColumn("rank", F.row_number().over(w_rank))
           .where(F.col("rank") <= int(k))
           .select(F.col(id_col), F.col("rank"), F.col("term"),
                   F.col("tfidf")))
    out._zoi_persisted = [doc_tok]  # release after materialization
    return out


def dedup_paragraphs(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id", sep: str = "\n",
                     out_col: str = "clean_text") -> DataFrame:
    """Corpus-level exact paragraph dedup — CCNet's sharded paragraph
    deduplication (Wenzek et al. 2020 §4.2: duplicated paragraphs are
    dropped corpus-wide, each keeps exactly its FIRST occurrence),
    where :func:`strip_repeated_lines` is the within-doc and
    :func:`strip_boilerplate` the frequency-threshold variant. The
    first occurrence of paragraph p is the globally minimal
    ``(doc_id, position)`` over every occurrence — including repeats
    inside one document. Blank/whitespace-only paragraphs are EXEMPT
    (they are layout, not content; deduping them would merge every
    paragraph break after the first). Matching is byte-exact.

    Output: every input row with ``n_paragraphs``, ``n_kept`` and the
    rebuilt *out_col* (empty string when nothing survives — the row is
    kept so the caller's length gate, not a silent inner join, decides
    the drop).

    Shape at 10^12 docs: posexplode → groupBy(paragraph) MIN-aggregate
    (map-side combine absorbs the Zipf skew of viral paragraphs — a
    window over the paragraph key would route every copy through one
    task) → hash equi-join of the occurrence table back on the
    paragraph key (linear: n_copies × 1 winner per key) → one doc-id
    re-aggregation. The winner table scales with the paragraph
    vocabulary, so it is NOT broadcast.
    """
    paras = F.split(F.col(text_col), sep)
    base = df.withColumn("n_paragraphs", F.size(paras))
    occ = base.select(
        F.col(id_col).alias("__id"),
        F.posexplode(paras).alias("__pos", "__para"))
    first = (occ.where(F.trim("__para") != "")
             .groupBy("__para")
             .agg(F.min(F.struct("__id", "__pos")).alias("__first")))
    kept = (occ.join(first, "__para", "left")
            .where((F.trim("__para") == "")
                   | ((F.col("__first.__id") == F.col("__id"))
                      & (F.col("__first.__pos") == F.col("__pos")))))
    rebuilt = (kept.groupBy("__id")
               .agg(F.count("*").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__para"))),
                            lambda s: s["__para"]),
                        sep).alias(out_col)))
    out = (base.join(rebuilt, base[id_col] == rebuilt["__id"], "left")
           .drop("__id")
           .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
           .withColumn(out_col, F.coalesce(out_col, F.lit(""))))
    return out


def pii_redact(df: DataFrame, *, text_col: str = "text",
               out_col: str = "redacted_text") -> DataFrame:
    """PII redaction — the scrub that :func:`with_pii_flags` only
    flags: emails → ``<EMAIL>``, IPv4 literals → ``<IP>``, phone
    numbers → ``<PHONE>`` (the standard pre-training anonymization
    pass, e.g. BigCode/StarCoder's PII pipeline, Li et al. 2023 §IV.C,
    reduced to the three regex classes this engine scans for).

    Counts are measured on the ORIGINAL text per class; replacements
    apply sequentially email → IPv4 → phone on the running result
    (the replacement tokens contain no digits, so later passes cannot
    re-match inside an earlier substitution). Pure projection — one
    codegen stage, no shuffle, no UDF.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return (df.withColumn("n_pii_email", pii_email_count(t))
            .withColumn("n_pii_ipv4", pii_ipv4_count(t))
            .withColumn("n_pii_phone", pii_phone_count(t))
            .withColumn(out_col, red))


def zipf_profile(df: DataFrame, *, text_col: str = "text",
                 max_rank: int = 1000) -> DataFrame:
    """Corpus Zipf-law fit — ONE summary row: the OLS slope (and r²)
    of ln(freq) on ln(rank) over the top *max_rank* terms, plus corpus
    totals. Natural web text fits slope ≈ −1 (Zipf 1949); synthetic or
    template-generated corpora flatten toward 0 and OCR noise steepens
    the tail — a cheap corpus-forensics gate next to the per-doc
    quality scores.

    Rank ties break by (count DESC, term ASC), and the fit uses exact
    integer counts, so the selected top-*max_rank* set is deterministic
    across engines.

    Shape at 10^12 docs: one explode → token counts (map-side
    combine); totals are a one-row aggregate; the top-k is
    TakeOrdered (orderBy + limit — per-partition heaps, NO global
    sort), and the row_number window that assigns ranks runs over
    max_rank ≈ 10³ rows on a single task by construction.
    """
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    vocab = (df.select(F.explode(tokens).alias("tok"))
             .where(F.length("tok") > 0)
             .groupBy("tok").agg(F.count("*").alias("cw"))).persist()
    totals = vocab.agg(F.count("*").alias("n_vocab"),
                       F.sum("cw").alias("n_tokens"))
    top = vocab.orderBy(F.desc("cw"), F.asc("tok")).limit(int(max_rank))
    w = Window.orderBy(F.desc("cw"), F.asc("tok"))
    xy = (top.withColumn("__r", F.row_number().over(w))
          .select(F.log(F.col("__r").cast("double")).alias("__x"),
                  F.log(F.col("cw").cast("double")).alias("__y")))
    fit = xy.agg(
        F.count("*").alias("n_ranks_fit"),
        (F.covar_pop("__x", "__y") / F.var_pop("__x")).alias("__slope"),
        F.corr("__x", "__y").alias("__corr"))
    out = (fit.crossJoin(F.broadcast(totals))
           .select("n_vocab", "n_tokens", "n_ranks_fit",
                   F.round("__slope", 6).alias("zipf_slope"),
                   F.round(F.pow("__corr", F.lit(2)), 6).alias("zipf_r2")))
    out._zoi_persisted = [vocab]  # release after materialization
    return out


# unicode punctuation unification: curly quotes -> ASCII, dash family ->
# hyphen, NBSP/thin space -> space; zero-width chars are DELETED (the
# trailing four entries of _PUNCT_FROM have no counterpart in _PUNCT_TO,
# which is exactly translate()'s deletion rule in both Spark and DuckDB)
_PUNCT_FROM = ("‘’‚‛"      # single quotes
               "“”„‟"      # double quotes
               "‒–—―"      # dash family
               "  "                  # nbsp, thin space
               "​‌‍﻿")     # zero-width (deleted)
_PUNCT_TO = "''''\"\"\"\"----  "


def normalize_punct(col: Column) -> Column:
    """Unicode punctuation unification — the pre-hashing normalization
    every dedup/fingerprint pass wants (curly quotes, the en/em-dash
    family, NBSP/thin space, zero-width chars and the horizontal
    ellipsis all collapse to their ASCII forms, so two crawls of the
    same page that differ only in typography fingerprint identically).
    One translate (1:1 map + zero-width deletion) + one literal
    replace ('…' → '...'), pure codegen projection — no regex, no UDF,
    no shuffle."""
    return F.replace(F.translate(col, _PUNCT_FROM, _PUNCT_TO),
                     F.lit("…"), F.lit("..."))


def oov_rate(df: DataFrame, *, text_col: str = "text",
             id_col: str = "doc_id", vocab_size: int = 1000) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-V
    vocabulary — the tokenizer-prep metric that decides V (docs whose
    tokens fall mostly outside the planned vocabulary are noise the
    tokenizer will shred into bytes; BPE papers gate on exactly this).
    The vocabulary is the top *vocab_size* tokens by corpus count,
    ties broken by token ASC so the V-th/V+1-th cut is deterministic.

    Output: one row per doc with ≥1 token — ``n_tokens``, ``n_oov``
    and ``oov_rate`` (fraction of token OCCURRENCES outside the
    vocabulary).

    Shape at 10^12 docs: one explode → (doc, token) counts with
    map-side combine; the vocabulary is a re-aggregation of that table
    cut by TakeOrdered (per-partition heaps, no global sort) and — at
    ≤10^6 entries by construction — broadcast back, so the per-doc leg
    never shuffles again: explode-agg once, broadcast-join, doc-id agg
    on the SAME key the counts already carry."""
    doc_tok = _doc_token_counts(df, text_col=text_col,
                                id_col=id_col).persist()
    vocab = (doc_tok.groupBy("tok").agg(F.sum("c").alias("cw"))
             .orderBy(F.desc("cw"), F.asc("tok"))
             .limit(int(vocab_size))
             .select("tok", F.lit(True).alias("__in_vocab")))
    out = (doc_tok.join(F.broadcast(vocab), "tok", "left")
           .groupBy(id_col)
           .agg(F.sum("c").alias("n_tokens"),
                F.sum(F.when(F.col("__in_vocab").isNull(), F.col("c"))
                      .otherwise(F.lit(0))).alias("n_oov"))
           .withColumn("oov_rate",
                       F.round(F.col("n_oov") / F.col("n_tokens"), 6)))
    out._zoi_persisted = [doc_tok]  # release after materialization
    return out


def token_windows(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", window: int = 128,
                  stride: int = 64) -> DataFrame:
    """Sliding token windows — the pretraining chunker that turns one
    long page into overlapping fixed-width training sequences (window
    W, stride S; the last window is the final ≤W tokens so no suffix
    is dropped). Complements pack_sequences (which BINS whole short
    docs); this SPLITS long docs.

    Output: one row per window — ``win_idx`` (0-based), ``win_tokens``
    (≤ window) and ``window_text``. Docs with no tokens yield no rows.

    Shape at 10^12 docs: the token array is materialized as a column
    FIRST, then the start-position sequence explodes and the window is
    a row-level ``slice`` of that column — never a slice inside a
    higher-order-function lambda, which would re-run normalize+split
    once per window (the O(len²) trap word_shingles documents). Pure
    narrow ops: no shuffle at all."""
    if window < 1 or stride < 1:
        raise ValueError("token_windows: window and stride must be ≥ 1")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = (df.select(F.col(id_col), toks.alias("__toks"))
            .withColumn("__n", F.size(F.filter(
                F.col("__toks"), lambda t: F.length(t) > 0)))
            .where(F.col("__n") > 0)
            .withColumn("__toks", F.filter(
                F.col("__toks"), lambda t: F.length(t) > 0)))
    # last full-coverage start; the stride grid may step over it, so it
    # is appended explicitly when missed — otherwise up to stride-1
    # trailing tokens would appear in no window
    last = F.greatest(F.col("__n") - F.lit(window) + 1, F.lit(1))
    grid = F.sequence(F.lit(1), last, F.lit(stride))
    starts = F.when((last - 1) % F.lit(stride) == 0, grid).otherwise(
        F.concat(grid, F.array(last)))
    win = F.slice(F.col("__toks"), F.col("__start"), window)
    return (base
            .select(F.col(id_col), F.col("__toks"),
                    F.posexplode(starts).alias("win_idx", "__start"))
            .select(F.col(id_col), "win_idx",
                    F.size(win).alias("win_tokens"),
                    F.array_join(win, " ").alias("window_text")))


def dup_paragraph_fraction(df: DataFrame, *, text_col: str = "text",
                           sep: str = "\n") -> DataFrame:
    """Within-doc duplicate-paragraph fractions — the paragraph half of
    MassiveText's repetition battery (Rae et al. 2021 Table A1:
    ``duplicate paragraphs`` and ``duplicate paragraphs chars``), next
    to the n-gram half in dup_ngram_fraction. A paragraph occurrence
    beyond the first of its byte-exact text is a duplicate; blank/
    whitespace-only paragraphs are ignored. Adds ``n_paras``,
    ``n_dup_paras``, ``dup_para_frac`` and ``dup_para_char_frac``
    (duplicate occurrences' chars / all paragraph chars).

    Pure array expressions — array_distinct against the full list
    gives both counts and char sums without explode, join or shuffle;
    one codegen projection."""
    paras = F.filter(F.split(F.col(text_col), sep),
                     lambda p: F.trim(p) != "")

    def _chars(arr):
        return F.aggregate(F.transform(arr, F.length),
                           F.lit(0).cast("long"), lambda a, x: a + x)

    out = (df.withColumn("__all", paras)
           .withColumn("n_paras", F.size("__all"))
           .withColumn("n_dup_paras",
                       F.col("n_paras")
                       - F.size(F.array_distinct(F.col("__all"))))
           .withColumn("__c_all", _chars(F.col("__all")))
           .withColumn("__c_uniq", _chars(F.array_distinct(F.col("__all"))))
           .withColumn("dup_para_frac",
                       F.when(F.col("n_paras") > 0, F.round(
                           F.col("n_dup_paras") / F.col("n_paras"), 6))
                       .otherwise(F.lit(0.0)))
           .withColumn("dup_para_char_frac",
                       F.when(F.col("__c_all") > 0, F.round(
                           (F.col("__c_all") - F.col("__c_uniq"))
                           / F.col("__c_all"), 6))
                       .otherwise(F.lit(0.0)))
           .drop("__all", "__c_all", "__c_uniq"))
    return out


def heaps_profile(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  n_points: int = 20) -> DataFrame:
    """Heaps'-law vocabulary-growth fit — the companion corpus
    forensic to :func:`zipf_profile`: V(n) ≈ K·n^β over document
    prefixes in *id_col* order (natural text: β ≈ 0.4-0.6; template
    spam saturates early, OCR noise never saturates). Returns ONE row:
    the OLS fit of ln(V) on ln(tokens) over *n_points* evenly spaced
    doc-count prefixes, plus corpus totals.

    The cumulative-distinct trick: V(prefix) = #{tokens whose FIRST
    containing doc ≤ prefix} and tokens(prefix) = Σ counts of docs ≤
    prefix — both are aggregations over small derived tables, NOT a
    running distinct-count window over the corpus (which would
    serialize through one task; likewise the prefix boundaries are
    ARITHMETIC over the id range — min/max agg plus a sequence — not a
    row_number ranking, for the same reason). Shape at 10^12 docs: one
    explode → (token, first_doc) + (doc, n_tokens) aggregations
    (map-side combine), then a broadcast of the K prefix boundaries
    crossed against those two vocab-sized tables."""
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    doc_tok = (df.select(F.col(id_col).alias("__doc"),
                         F.explode(tokens).alias("tok"))
               .where(F.length("tok") > 0))
    doc_tok = doc_tok.persist()
    first = doc_tok.groupBy("tok").agg(F.min("__doc").alias("__first"))
    per_doc = doc_tok.groupBy("__doc").agg(F.count("*").alias("__c"))
    # evenly spaced id-range prefix boundaries: lo + (hi-lo)*i/K
    rng = per_doc.agg(F.min("__doc").alias("__lo"),
                      F.max("__doc").alias("__hi"))
    bounds = (rng.select(F.explode(F.transform(
        F.sequence(F.lit(1), F.lit(int(n_points))),
        lambda i: F.col("__lo") + F.floor(
            (F.col("__hi") - F.col("__lo")) * i / F.lit(int(n_points)))
        .cast("long"))).alias("__bound"))
        .distinct())
    vocab_at = (bounds.crossJoin(first)
                .where(F.col("__first") <= F.col("__bound"))
                .groupBy("__bound")
                .agg(F.count("*").alias("__v")))
    toks_at = (bounds.crossJoin(per_doc)
               .where(F.col("__doc") <= F.col("__bound"))
               .groupBy("__bound")
               .agg(F.sum("__c").alias("__t")))
    xy = (vocab_at.join(toks_at, "__bound")
          .select(F.log(F.col("__t").cast("double")).alias("__x"),
                  F.log(F.col("__v").cast("double")).alias("__y")))
    fit = xy.agg(
        F.count("*").alias("n_points_fit"),
        (F.covar_pop("__x", "__y") / F.var_pop("__x")).alias("__beta"),
        (F.avg("__y") - (F.covar_pop("__x", "__y") / F.var_pop("__x"))
         * F.avg("__x")).alias("__lnk"))
    totals = doc_tok.agg(
        F.countDistinct("tok").alias("n_vocab"),
        F.count("*").alias("n_tokens"))
    out = (fit.crossJoin(F.broadcast(totals))
           .select("n_vocab", "n_tokens", "n_points_fit",
                   F.round("__beta", 6).alias("heaps_beta"),
                   F.round(F.exp("__lnk"), 6).alias("heaps_k")))
    out._zoi_persisted = [doc_tok]  # release after materialization
    return out


# href extraction: double-quoted, single-quoted, or bare attribute
# values — the three syntaxes HTML actually ships with
_HREF_RE = "(?i)href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>\"']+))"


def extract_links(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  out_col: str = "href",
                  carry_cols: "Sequence[str]" = ()) -> DataFrame:
    """Outlink extraction — ``href`` attribute values from HTML-ish
    text, one row per link occurrence in document order (``link_idx``).
    This is where the graph operators' edge tables come FROM: compose
    with urls.url_host + graph.pagerank/hits/degree_stats for the
    page→host→centrality pipeline every crawl ranker runs.

    Regex, not an HTML parser, by design: at 10^12 docs the intake
    pass runs before any DOM-quality guarantee exists, and href
    extraction is the one task crawl pipelines genuinely do with
    regexes (all three attribute-quoting syntaxes covered). One
    projection + one posexplode — no shuffle, no UDF."""
    links = F.regexp_extract_all(F.col(text_col), F.lit(_HREF_RE), 0)
    cleaned = F.transform(
        links,
        lambda m: F.regexp_replace(
            F.regexp_replace(m, r"(?i)^href\s*=\s*", ""),
            "^[\"']|[\"'>]+$", ""))
    return (df.select(F.col(id_col), *[F.col(c) for c in carry_cols],
                      F.posexplode(cleaned).alias("link_idx", out_col))
            .where(F.col(out_col) != ""))


def pmi_collocations(df: DataFrame, *, text_col: str = "text",
                     min_count: int = 5, top_k: int = 50) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    phrase-detection pass tokenizer pipelines run before merging
    multiword units (word2vec's phrase pass, Mikolov et al. 2013 §4):
    PMI(a,b) = log2(p(ab) / (p(a)·p(b))) over adjacent token pairs,
    floored at *min_count* occurrences (PMI is degenerate on rare
    pairs — a hapax pair of two hapax words maxes the score), top-k by
    (rounded PMI DESC, bigram ASC).

    Unigram probabilities use the BIGRAM-SLOT totals (first-word
    occurrences over total bigrams) so p(ab), p(a), p(b) share one
    denominator — the textbook estimator, and exactly re-derivable in
    SQL. Shape at scale: the bigram count table (map-side combine),
    two vocabulary-sized re-aggregations joined back (Zipf-bounded →
    broadcast), TakeOrdered for the top-k."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    pairs = F.zip_with(toks, F.slice(toks, 2, F.size(toks) - 1),
                       lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with NULL, so the last slot is a
    # bare unigram — slice it off before exploding
    pairs = F.slice(pairs, 1, F.size(toks) - 1)
    big = (df.where(F.size(toks) >= 2)
           .select(F.explode(pairs).alias("bigram"))
           .groupBy("bigram").agg(F.count("*").alias("c")))
    big = big.persist()
    w1 = (big.groupBy(F.split("bigram", " ")[0].alias("__w1"))
          .agg(F.sum("c").alias("c1")))
    w2 = (big.groupBy(F.split("bigram", " ")[1].alias("__w2"))
          .agg(F.sum("c").alias("c2")))
    tot = big.agg(F.sum("c").alias("n"))
    scored = (big.where(F.col("c") >= int(min_count))
              .join(F.broadcast(w1),
                    F.split("bigram", " ")[0] == F.col("__w1"))
              .drop("__w1")
              .join(F.broadcast(w2),
                    F.split("bigram", " ")[1] == F.col("__w2"))
              .drop("__w2")
              .crossJoin(F.broadcast(tot))
              # multiply in DOUBLE: with n ~ 10^12 slots and a common
              # bigram, c*n overflows a long — the most frequent
              # collocations are exactly where that silently corrupts
              .select("bigram", "c",
                      F.round(F.log2(
                          (F.col("c").cast("double")
                           * F.col("n").cast("double"))
                          / (F.col("c1").cast("double")
                             * F.col("c2").cast("double"))), 6)
                      .alias("pmi")))
    out = (scored.orderBy(F.desc("pmi"), F.asc("bigram"))
           .limit(int(top_k)))
    out._zoi_persisted = [big]  # release after materialization
    return out


def token_entropy(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document token-distribution entropy + type/token ratio —
    the cheap compressibility proxy (repetitive spam compresses; its
    token entropy collapses long before a human reads it): with
    per-doc counts c(t) over n tokens,

        H = −Σ_t (c/n)·log2(c/n)      (bits; 0 = one token repeated,
                                       log2(n) = all distinct)

    Adds ``n_tokens``, ``n_types``, ``type_token_ratio``,
    ``token_entropy``. Docs with no tokens yield no rows.

    Shape at 10^12 docs: one explode → (doc, token) counts with
    map-side combine, then ONE doc-keyed aggregation — the sum needs
    n first, so n rides along as sum(c) inside the same aggregate
    using the Σc·log2(c) decomposition:
    H = log2(n) − (Σ c·log2 c)/n (exact algebra, no second pass)."""
    doc_tok = _doc_token_counts(df, text_col=text_col, id_col=id_col)
    agg = (doc_tok.groupBy(id_col)
           .agg(F.sum("c").alias("n_tokens"),
                F.count("*").alias("n_types"),
                F.sum(F.col("c") * F.log2("c")).alias("__clogc")))
    return (agg.select(
        F.col(id_col), "n_tokens", "n_types",
        F.round(F.col("n_types") / F.col("n_tokens"), 6)
        .alias("type_token_ratio"),
        F.round(F.log2("n_tokens")
                - F.col("__clogc") / F.col("n_tokens"), 6)
        .alias("token_entropy")))


def sentence_stats(df: DataFrame, *, text_col: str = "text",
                   max_words: int = 40) -> DataFrame:
    """Sentence-level shape profile — the C4-adjacent signals the line
    filter does not cover when text is NOT line-structured: sentences
    are ``[.!?]+`` splits with blank fragments dropped; adds
    ``n_sentences``, ``mean_sentence_words``, ``frac_long_sentences``
    (> *max_words* words — run-on/merged-boilerplate detector) and
    ``ends_terminal`` (truncated-page detector). Pure array
    expressions, one projection — the per-sentence word count runs
    inside a transform over the SENTENCE string (a lambda variable,
    not a re-evaluated outer expression)."""
    sents = F.filter(F.split(F.col(text_col), r"[.!?]+"),
                     lambda s: F.trim(s) != "")
    wc = F.transform(
        sents,
        lambda s: F.size(F.filter(F.split(F.trim(s), r"\s+"),
                                  lambda w: F.length(w) > 0)))
    n = F.size(sents)
    total = F.aggregate(wc, F.lit(0).cast("long"), lambda a, x: a + x)
    nlong = F.aggregate(
        F.transform(wc, lambda x: F.when(x > max_words, 1).otherwise(0)
                    .cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    return (df.withColumn("n_sentences", n)
            .withColumn("mean_sentence_words",
                        F.when(n > 0, F.round(total / n, 6))
                        .otherwise(F.lit(0.0)))
            .withColumn("frac_long_sentences",
                        F.when(n > 0, F.round(nlong / n, 6))
                        .otherwise(F.lit(0.0)))
            .withColumn("ends_terminal",
                        F.regexp_count(F.rtrim(F.col(text_col)),
                                       F.lit(r"[.!?]$")) > 0))


# boilerplate phrase battery — the literal markers RefinedWeb/C4-style
# intake lists actually carry (parameterizable; this is the demo set)
BOILER_PHRASES = ("all rights reserved", "cookie", "terms of service",
                  "subscribe to our newsletter", "click here",
                  "enable javascript")


def boilerplate_phrase_flags(df: DataFrame, *, text_col: str = "text",
                             phrases: tuple[str, ...] = BOILER_PHRASES,
                             max_hits: int = 2) -> DataFrame:
    """Boilerplate phrase battery: one case-insensitive literal
    ``contains`` per phrase (``bp_0…bp_{n-1}`` in list order), the hit
    total and ``boiler_flagged`` (hits ≥ *max_hits*) — the cheap
    chrome/consent/footer detector that runs before any line-frequency
    pass exists (frequent-line mining needs a second corpus pass;
    this is a single projection fused into the scan)."""
    if not phrases:
        raise ValueError("boilerplate_phrase_flags: phrases is empty")
    low = F.lower(F.col(text_col))
    flags = [low.contains(p.lower()).alias(f"bp_{i}")
             for i, p in enumerate(phrases)]
    out = df.select("*", *flags)
    hits = sum(F.col(f"bp_{i}").cast("int") for i in range(len(phrases)))
    return (out.withColumn("n_boiler_hits", hits.cast("long"))
            .withColumn("boiler_flagged",
                        F.col("n_boiler_hits") >= int(max_hits)))


def trigram_logprob(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1)
                    ) -> DataFrame:
    """Per-document mean trigram surprisal under a Jelinek-Mercer
    interpolated LM — the next order up from :func:`bigram_logprob`
    and the closest pure-SQL-twinnable stand-in for KenLM's
    interpolated n-gram scoring (Heafield 2011 §2; JM instead of
    Kneser-Ney so every count is a plain aggregate):

        P(w3|w1w2) = λ3·c(w1w2w3)/c(w1w2·) + λ2·c(·w2w3)/c(·w2·)
                     + λ1·c(··w3)/N

    ALL counts are slot counts over the corpus TRIGRAM table (prefix-,
    middle- and suffix-marginals of one table, N = total trigram
    slots) — self-scoring a corpus on its own model means every
    denominator on the scoring path is ≥ 1, so no smoothing constant
    is needed and the estimator is exactly re-derivable in SQL.
    Documents with fewer than three tokens are excluded.

    Shape at 10^12 docs: one explode → (doc, trigram) counts
    (persisted: feeds model AND probe), three vocabulary-sized
    marginal re-aggregations of the trigram-total table (the unigram
    and middle marginals broadcast; the pair marginals hash-join on
    their gram keys), N as a broadcast one-row cross join."""
    l3, l2, l1 = (float(x) for x in lambdas)
    toks = F.split(normalize_text(F.col(text_col)), " ")
    eligible = df.where(F.size(toks) >= 3)
    grams = (eligible.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), 3)).alias("gram")))
    doc_tri = (grams.groupBy(id_col, "gram")
               .agg(F.count("*").alias("c"))).persist()
    tri = (doc_tri.groupBy("gram").agg(F.sum("c").alias("c123"))
           ).persist()
    p = F.split(F.col("gram"), " ")
    pre = tri.groupBy(F.concat_ws(" ", p[0], p[1]).alias("w12")).agg(
        F.sum("c123").alias("c12"))
    suf = tri.groupBy(F.concat_ws(" ", p[1], p[2]).alias("w23")).agg(
        F.sum("c123").alias("c23"))
    mid = tri.groupBy(p[1].alias("w2")).agg(F.sum("c123").alias("c2"))
    uni = tri.groupBy(p[2].alias("w3")).agg(F.sum("c123").alias("c3"))
    tot = tri.agg(F.sum("c123").alias("n"))
    prob = (F.lit(l3) * F.col("c123") / F.col("c12")
            + F.lit(l2) * F.col("c23") / F.col("c2")
            + F.lit(l1) * F.col("c3") / F.col("n"))
    scored = (doc_tri
              .join(tri, "gram")
              .withColumn("w12", F.concat_ws(" ", p[0], p[1]))
              .withColumn("w23", F.concat_ws(" ", p[1], p[2]))
              .join(pre, "w12")
              .join(suf, "w23")
              .join(F.broadcast(mid), p[1] == F.col("w2"))
              .join(F.broadcast(uni), p[2] == F.col("w3"))
              .crossJoin(F.broadcast(tot))
              .groupBy(id_col)
              .agg(F.sum("c").alias("n_trigrams"),
                   F.sum(F.col("c") * -F.log2(prob)).alias("__s")))
    out = scored.select(
        F.col(id_col), "n_trigrams",
        F.round(F.col("__s") / F.col("n_trigrams"), 6)
        .alias("mean_trigram_surprisal"))
    out._zoi_persisted = [doc_tri, tri]  # release after materialization
    return out


def vocab_coverage(df: DataFrame, *, text_col: str = "text",
                   thresholds: "tuple[int, ...]" = (100, 1000, 10000),
                   ) -> DataFrame:
    """Top-V vocabulary coverage curve: for each threshold V, the
    fraction of the corpus token MASS covered by the V most frequent
    tokens — the tokenizer-sizing / Zipf-companion report (English web
    text covers ~90% of mass with ~10k types; a corpus that needs far
    more is noisy or multilingual). One row per threshold:
    ``vocab_size``, ``covered_tokens``, ``total_tokens``,
    ``coverage`` (rounded to 6). Ranking ties break by token string
    ascending, so the curve is deterministic.

    Scale shape: token counts are one explode + hash aggregation; the
    top-max(V) cut is a distributed TakeOrdered (orderBy + limit — a
    per-partition heap then a merge of max(V)-row candidates), NOT a
    global row_number window, so no single task ever sorts the full
    vocabulary. Only the ≤max(V)-row survivor table is ranked and
    joined against the threshold list."""
    ts = sorted(set(int(t) for t in thresholds))
    if not ts or ts[0] <= 0:
        raise ValueError("vocab_coverage: thresholds must be positive")
    tok = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    # the vocab table feeds both the total and the top-V cut —
    # persist it so the explode+aggregate over the corpus runs once
    counts = (df.select(tok.alias("token"))
              .where(F.col("token") != "")
              .groupBy("token").agg(F.count("*").alias("n"))
              .persist())
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(ts[-1])
    ranked = top.withColumn(
        "__rank", F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("token"))))
    tdf = df.sparkSession.createDataFrame(
        [(t,) for t in ts], "vocab_size int")
    out = (ranked.join(F.broadcast(tdf),
                       F.col("__rank") <= F.col("vocab_size"))
           .groupBy("vocab_size")
           .agg(F.sum("n").cast("long").alias("covered_tokens"))
           .crossJoin(F.broadcast(total))
           .select("vocab_size", "covered_tokens",
                   F.col("total_tokens").cast("long")
                   .alias("total_tokens"),
                   F.round(F.col("covered_tokens")
                           / F.col("total_tokens"), 6)
                   .alias("coverage")))
    out._zoi_persisted = [counts]  # release after materialization
    return out


def byte_fertility(df: DataFrame, *, text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """Per-language tokenizer-fertility proxies from corpus-level
    ratios: UTF-8 bytes per character (≈1 for Latin scripts, ~3 for
    CJK — the BPE byte-fallback cost), characters per whitespace token
    and bytes per token. These are SUM-ratio statistics (Σbytes/Σchars),
    not means of per-doc ratios, so short docs don't dominate; all
    accumulators are exact integer sums, making the rounded ratios
    bit-deterministic. Docs with zero chars/tokens contribute only to
    ``n_docs``. One projection + one hash aggregation on the lang key."""
    t = F.col(text_col)
    agg = (df.groupBy(lang_col)
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum(F.octet_length(t)).alias("__b"),
                F.sum(F.length(t)).alias("__c"),
                F.sum(token_count(t)).alias("__t")))
    def ratio(num, den):
        return F.when(F.col(den) > 0,
                      F.round(F.col(num) / F.col(den), 6))
    return agg.select(
        lang_col, "n_docs",
        F.coalesce("__t", F.lit(0)).cast("long").alias("n_tokens"),
        ratio("__b", "__c").alias("bytes_per_char"),
        ratio("__c", "__t").alias("chars_per_token"),
        ratio("__b", "__t").alias("bytes_per_token"))


def gram_novelty(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """First-occurrence n-gram novelty: per document, the fraction of
    its DISTINCT word n-grams whose earliest appearance in the corpus
    (by ascending *id_col* — ingestion order) is this document. The
    marginal-contribution score behind "does this crawl snapshot add
    anything": near-dups and boilerplate mirrors score ≈ 0, fresh
    content ≈ 1. Output: (id, n_grams, n_novel, novelty round 6);
    docs whose normalized text yields no non-empty gram are omitted.

    One explode + distinct, one min-aggregation on the gram key, one
    join back on the same key — gram-key shuffles only; hot boilerplate
    grams skew the min-agg, which map-side combine absorbs (the min is
    associative), unlike a join-based first-seen lookup."""
    # the distinct gram table feeds both the min-agg and the join
    # back — persist it so the explode+distinct shuffle runs once
    grams = (df.select(F.col(id_col).alias("__id"),
                       F.explode(word_shingles(F.col(text_col), n))
                       .alias("g"))
             .where(F.col("g") != "")
             .distinct().persist())
    first = grams.groupBy("g").agg(F.min("__id").alias("__first"))
    out = (grams.join(first, "g")
            .groupBy(F.col("__id").alias(id_col))
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.sum(F.when(F.col("__first") == F.col("__id"), 1)
                       .otherwise(0)).cast("long").alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_grams"),
                                6)))
    out._zoi_persisted = [grams]  # release after materialization
    return out


def readability_profile(df: DataFrame, *, text_col: str = "text",
                        group_col: str = "lang") -> DataFrame:
    """Per-group Flesch reading-ease profile from three integer counts
    per document — words (whitespace tokens), sentences (runs of
    ``[.!?]``, floored at 1) and syllables (vowel-letter groups, the
    standard cheap proxy):

        flesch = 206.835 − 1.015·(words/sent) − 84.6·(syll/words)

    The per-doc score is a pure function of integers (identical IEEE
    doubles on any engine); group means go through micro-unit integer
    accumulation, so the report is bit-deterministic. Docs with zero
    words are excluded. ~30-50 is college prose, 90+ is child-level,
    negative is garbage/boilerplate — a QC gate next to the quality
    scores, cheaper than an LM perplexity pass. One projection + one
    hash aggregation on the group key."""
    t = F.col(text_col)
    words = token_count(t)
    sents = F.greatest(F.lit(1),
                       F.regexp_count(t, F.lit(r"[.!?]+"))).cast("long")
    syll = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    flesch = (F.lit(206.835)
              - F.lit(1.015) * (words / sents)
              - F.lit(84.6) * (syll / words))
    per = (df.select(F.col(group_col), words.alias("__w"),
                     sents.alias("__s"), syll.alias("__y"),
                     F.round(flesch * 1e6).cast("long").alias("__f6"))
           .where(F.col("__w") > 0))
    n = F.count("*")
    return (per.groupBy(group_col)
            .agg(n.cast("long").alias("n_docs"),
                 F.round(F.sum("__w") / n, 6).alias("mean_words"),
                 F.round(F.sum("__w") / F.sum("__s"), 6)
                 .alias("words_per_sentence"),
                 F.round(F.sum("__y") / F.sum("__w"), 6)
                 .alias("syllables_per_word"),
                 F.round(F.sum("__f6") / 1e6 / n, 6)
                 .alias("mean_flesch")))


def caps_profile(df: DataFrame, *, text_col: str = "text",
                 group_col: str = "source",
                 shouty_ratio: float = 0.3) -> DataFrame:
    """Per-group ALL-CAPS profile — the shoutiness QC (SEO spam, scraped
    button/nav text and ad copy are caps-heavy): a caps token is a
    whitespace token matching ``^[A-Z]{2,}$``. Emits per group:
    ``n_docs``, ``n_tokens``, ``n_caps_tokens``, ``caps_ratio``
    (sum-ratio, exact integer sums), ``n_shouty`` (docs whose OWN ratio
    exceeds *shouty_ratio*). One projection + one hash aggregation."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = token_count(F.col(text_col))
    n_caps = F.when(n_tok == 0, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Z]{2,}$"))))
    per = df.select(F.col(group_col), n_tok.alias("__t"),
                    n_caps.cast("long").alias("__c"))
    shouty = ((F.col("__t") > 0)
              & (F.col("__c") / F.col("__t") > F.lit(shouty_ratio)))
    return (per.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("__t").cast("long").alias("n_tokens"),
                 F.sum("__c").cast("long").alias("n_caps_tokens"),
                 F.when(F.sum("__t") > 0,
                        F.round(F.sum("__c") / F.sum("__t"), 6))
                 .alias("caps_ratio"),
                 F.sum(shouty.cast("long")).cast("long")
                 .alias("n_shouty")))


def html_strip(df: DataFrame, *, text_col: str = "text",
               out_col: str = "text_plain") -> DataFrame:
    """Boilerplate HTML → plain text, the first transform every web
    crawl goes through: drop <script>/<style> blocks wholesale, drop
    every remaining tag, decode the five core entities (&amp; LAST, so
    '&amp;lt;' cannot double-decode), fold &nbsp; to a space, collapse
    whitespace. Appends *out_col*; the raw column is untouched (the
    byte-identity invariant). Regexes avoid backreferences and
    lookaround on purpose — they run identically under Java regex and
    RE2, which keeps the operator oracle-checkable.

    Pure projection: stays inside whole-stage codegen, no UDF, no
    shuffle."""
    x = F.col(text_col)
    x = F.regexp_replace(x, r"(?is)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?is)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        x = F.replace(x, F.lit(ent), F.lit(rep))
    x = F.trim(F.regexp_replace(x, r"\s+", " "))
    return df.withColumn(out_col, x)


def word_len_hist(df: DataFrame, *, text_col: str = "text",
                  group_col: str = "lang",
                  max_len: int = 20) -> DataFrame:
    """Per-group word-length histogram (lengths capped at *max_len*,
    the overflow bucket) — the corpus-shape QC that separates natural
    prose (unimodal around 4-6 chars) from token salad, minified junk
    and agglutinative-language or CJK-segmentation artifacts. Output:
    (group, word_len, n_words, share round 6). One explode + one hash
    aggregation; the share denominator rides a window over the ≤max_len
    histogram rows, not the corpus."""
    tok = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    wl = F.least(F.length("token"), F.lit(int(max_len)))
    counts = (df.select(F.col(group_col), tok.alias("token"))
              .where(F.col("token") != "")
              .select(group_col, wl.alias("word_len"))
              .groupBy(group_col, "word_len")
              .agg(F.count("*").alias("n_words")))
    tot = Window.partitionBy(group_col)
    return counts.select(
        group_col, "word_len", F.col("n_words").cast("long")
        .alias("n_words"),
        F.round(F.col("n_words") / F.sum("n_words").over(tot), 6)
        .alias("share"))


def vocab_overlap(df: DataFrame, *, group_col: str = "lang",
                  text_col: str = "text") -> DataFrame:
    """Pairwise vocabulary Jaccard between groups: distinct token sets
    per group, intersection via a token-keyed self-join, union by
    inclusion-exclusion — the corpus-mix fingerprint (two "languages"
    with Jaccard 0.8 are one language mislabeled; a lang whose overlap
    with everything is ~0 is noise or a script mix-up).

    Returns ``(group_a, group_b, n_common, n_a, n_b, jaccard_micro)``
    for every pair sharing ≥1 token; jaccard is the single terminal
    division over exact distinct counts, micro-rounded.

    Plan: DISTINCT (group, token) first — one shuffle, after which
    everything is token-keyed; a token present in k groups fans out
    C(k,2) pairs, bounded by the group vocabulary (≤ #groups), never
    by corpus size. Group sizes ride in as two broadcast joins on the
    (tiny) per-group counts.
    """
    toks = (df.select(F.col(group_col).alias("__g"),
                      F.explode(F.split(normalize_text(F.col(text_col)),
                                        " ")).alias("__t"))
            .where((F.col("__t") != "") & F.col("__g").isNotNull())
            .distinct()).persist()
    sizes = toks.groupBy("__g").agg(F.count("*").alias("__n"))
    inter = (toks.alias("l")
             .join(toks.alias("r"),
                   (F.col("l.__t") == F.col("r.__t"))
                   & (F.col("l.__g") < F.col("r.__g")))
             .groupBy(F.col("l.__g").alias("group_a"),
                      F.col("r.__g").alias("group_b"))
             .agg(F.count("*").alias("n_common")))
    out = (inter
           .join(F.broadcast(sizes.select(F.col("__g").alias("group_a"),
                                          F.col("__n").alias("n_a"))),
                 "group_a")
           .join(F.broadcast(sizes.select(F.col("__g").alias("group_b"),
                                          F.col("__n").alias("n_b"))),
                 "group_b")
           .select("group_a", "group_b", "n_common", "n_a", "n_b",
                   F.round(F.lit(1e6) * F.col("n_common")
                           / (F.col("n_a") + F.col("n_b")
                              - F.col("n_common"))).cast("long")
                    .alias("jaccard_micro")))
    out._zoi_persisted = [toks]
    return out


# full <a ...>text</a> elements: attributes without '>', anchor body
# without '<' (nested markup is out of scope for the intake regex pass
# — same charter as extract_links)
_ANCHOR_RE = "(?i)<a\\b[^>]*href[^>]*>([^<]*)</a>"


def anchor_texts(df: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id",
                 min_links: int = 1) -> DataFrame:
    """Anchor-text mining per TARGET host — what the web calls a page
    is the strongest external description of it (the classic anchor
    signal from Brin & Page 1998 §2.2; modern crawl rankers still
    aggregate it): for every host linked from the corpus, the inbound
    link count, the distinct anchor-text vocabulary, and the single
    most common anchor (ties → lexicographically smallest; anchors are
    trimmed and lowercased, empties dropped).

    Output per host: ``(host, n_links, n_anchors, top_anchor,
    top_anchor_n)``.

    Same regex-not-parser charter as :func:`extract_links` (this runs
    at intake, before any DOM guarantee). Shape at 10^12 docs: one
    extraction projection + posexplode (bounded by links per doc), a
    (host, anchor) count aggregation with map-side combine, then a
    host-keyed max-struct pick — nothing wider than the (host, anchor)
    vocabulary shuffles, and the final pick is one aggregation, not a
    window."""
    els = F.regexp_extract_all(F.col(text_col), F.lit(_ANCHOR_RE), 0)
    pairs = (df.select(F.posexplode(els).alias("__i", "__el"))
             .select(
                 F.regexp_extract("__el", _HREF_RE, 0).alias("__href_m"),
                 F.trim(F.lower(F.regexp_extract("__el", _ANCHOR_RE, 1)))
                 .alias("anchor")))
    # strip the attribute prefix/quotes exactly like extract_links
    href = F.regexp_replace(
        F.regexp_replace("__href_m", r"(?i)^href\s*=\s*", ""),
        "^[\"']|[\"'>]+$", "")
    from .urls import url_host
    base = (pairs.select(url_host(href).alias("host"), "anchor")
            .where((F.col("host") != "") & (F.col("anchor") != "")))
    counts = (base.groupBy("host", "anchor")
              .agg(F.count("*").alias("__n")))
    # min of (-count, anchor): highest count first, ties break to the
    # lexicographically SMALLEST anchor — one aggregation, no window
    return (counts.groupBy("host")
            .agg(F.sum("__n").cast("long").alias("n_links"),
                 F.count("*").cast("long").alias("n_anchors"),
                 F.min(F.struct((-F.col("__n")).alias("negn"),
                                F.col("anchor").alias("a"))).alias("__t"))
            .where(F.col("n_links") >= int(min_links))
            .select("host", "n_links", "n_anchors",
                    F.col("__t.a").alias("top_anchor"),
                    (-F.col("__t.negn")).cast("long")
                    .alias("top_anchor_n")))


def quality_calibration(df: DataFrame, *, text_col: str = "text",
                        bins: int = 10) -> DataFrame:
    """Calibration of the heuristic quality score against the one
    ground-truth-ish label the corpus itself carries: exact-duplicate
    membership (a page whose fingerprint repeats is near-certainly
    boilerplate/spam mass). Buckets the round-6 score into *bins*
    deciles and reports the duplicate rate per bucket — a score that
    deserves its gate shows dup_rate falling monotonically with the
    bucket; a flat curve means the score is noise for this corpus and
    its threshold is cargo cult.

    Output per bucket: ``(bucket, n_docs, n_dup, dup_rate, avg_quality)``
    (round-6 rates).

    Shape: one fingerprint count aggregation (the exact-dedup pass —
    if exact_dedup already ran, reuse its counts), one fingerprint-
    keyed join back (hash shuffle), one bins-sized aggregation."""
    fp = fingerprint(F.col(text_col))
    base = df.select(fp.alias("__fp"),
                     quality_score(F.col(text_col)).alias("__q"))
    dups = (base.groupBy("__fp").agg(F.count("*").alias("__c")))
    bucket = F.least(F.floor(F.col("__q") * bins),
                     F.lit(bins - 1)).cast("long")
    return (base.join(dups, "__fp")
            .select(bucket.alias("bucket"), "__q",
                    (F.col("__c") > 1).cast("int").alias("__dup"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("__dup").cast("long").alias("n_dup"),
                 F.round(F.avg("__dup"), 6).alias("dup_rate"),
                 F.round(F.avg("__q"), 6).alias("avg_quality")))


# first robots meta element; directives live in its content attribute
_META_ROBOTS_RE = ("(?i)<meta\\s[^>]*name\\s*=\\s*[\"']?robots"
                   "[\"']?[^>]*>")
_META_CONTENT_RE = "(?i)content\\s*=\\s*[\"']([^\"'>]*)"


def meta_robots(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Robots-meta directive census — the compliance gate a crawl
    corpus must pass BEFORE training: pages carrying ``noindex``/
    ``noarchive`` directives asked not to be republished, and several
    public corpora now honor them at curation time (the regex-at-intake
    charter of extract_links applies — this runs before any DOM
    guarantee). Counts documents per lowercased directive from the
    FIRST robots meta element of each page.

    Output: ``(directive, n_docs)``. Pages with no robots meta emit
    nothing; an empty content attribute emits nothing.

    Shape: one regexp projection + bounded explode (directives per
    page), one vocabulary-sized aggregation."""
    tag = F.regexp_extract(F.col(text_col), _META_ROBOTS_RE, 0)
    content = F.regexp_extract(tag, _META_CONTENT_RE, 1)
    base = (df.where(tag != "")
            .select(F.explode(F.split(content, ",")).alias("__p"))
            .select(F.trim(F.lower("__p")).alias("directive")))
    return (base.where(F.col("directive") != "")
            .groupBy("directive")
            .agg(F.count("*").cast("long").alias("n_docs")))


def hashed_features(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id",
                    buckets: int = 16) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al., ICML'09): every
    token hashes into one of *buckets* slots (md5-prefix hash — the
    cross-engine-reproducible flavor token_hash60 documents), per-doc
    slot mass is L1-normalized — the text → fixed-width-vector bridge
    that feeds this module's OWN ANN/k-means/covariance operators when
    no trained encoder is available (and the baseline any learned
    embedding must beat).

    Output: ``(id, bucket, w)`` rows — sparse form; pivot to an array
    column downstream when an operator wants dense vectors.

    Shape at 10^12 docs: explode (bounded by tokens per doc) + one
    (id, bucket) aggregation that re-uses the id partitioning — no
    vocabulary table, no join, which is the entire point of feature
    hashing at scale."""
    from .dedup import token_hash60

    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                    lambda x: x != "")
    rows = (df.select(F.col(id_col), F.explode(toks).alias("__tok"))
            .select(id_col,
                    F.pmod(token_hash60(F.col("__tok"), hash="md5"),
                           F.lit(int(buckets))).alias("bucket")))
    counts = (rows.groupBy(id_col, "bucket")
              .agg(F.count("*").alias("__c")))
    tot = Window.partitionBy(id_col)
    return counts.select(
        id_col, F.col("bucket").cast("long").alias("bucket"),
        F.round(F.col("__c") / F.sum("__c").over(tot), 6).alias("w"))


def bitext_candidates(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", lang_col: str = "lang",
                      max_df: int = 3,
                      min_shared: int = 2) -> DataFrame:
    """Bitext-mining candidates: cross-LANGUAGE document pairs sharing
    RARE tokens (numbers, names, codes survive translation verbatim —
    the classic parallel-corpus signal before any embedding aligner
    runs; WikiMatrix/CCMatrix both start from cheap lexical anchors).
    A token participates only when its document frequency is ≤
    *max_df* — rare-token anchoring is what keeps the pair join from
    exploding AND what makes a match meaningful ('the' proves nothing,
    a shared invoice number does).

    Output: ``(id_a, lang_a, id_b, lang_b, n_shared)`` with
    id_a < id_b, lang_a != lang_b, n_shared ≥ *min_shared*.

    Shape at 10^12 docs: token df is a hash agg; the pair join fans
    out ≤ max_df² per anchoring token by construction — the
    quadratic-control knob is in the semantics, not a cap."""
    toks = F.array_distinct(F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda x: x != ""))
    rows = (df.select(F.col(id_col).alias("__id"),
                      F.col(lang_col).alias("__lang"),
                      F.explode(toks).alias("__tok")))
    rows = rows.persist()
    dfreq = (rows.groupBy("__tok").agg(F.count("*").alias("__df"))
             .where(F.col("__df") <= int(max_df)))
    rare = rows.join(dfreq, "__tok")
    out = (rare.alias("a")
           .join(rare.alias("b"),
                 (F.col("a.__tok") == F.col("b.__tok"))
                 & (F.col("a.__id") < F.col("b.__id"))
                 & (F.col("a.__lang") != F.col("b.__lang")))
           .groupBy(F.col("a.__id").alias("id_a"),
                    F.col("a.__lang").alias("lang_a"),
                    F.col("b.__id").alias("id_b"),
                    F.col("b.__lang").alias("lang_b"))
           .agg(F.count("*").cast("long").alias("n_shared"))
           .where(F.col("n_shared") >= int(min_shared)))
    out._zoi_persisted = [rows]
    return out


def good_turing_mass(df: DataFrame, *, text_col: str = "text",
                     lang_col: str = "lang",
                     round_to: int = 6) -> DataFrame:
    """Simple Good-Turing unseen-mass estimate per stratum: the
    probability mass a language model should reserve for tokens never
    seen in this corpus slice is P0 = N1/N (Gale & Sampson 1995's
    simple Good-Turing zeroth term), where N1 = singleton types and
    N = total tokens. High p_unseen → the slice undersamples its
    language (more crawl needed before the LM sees the tail); a
    near-zero p_unseen with tiny n_types → template spam (closed
    vocabulary). Complements heaps_fit (growth CURVE) with the
    single-number reserve estimate.

    Output: ``(lang, n_tokens, n_types, singletons, doubletons,
    p_unseen)`` — integer aggregates, so the oracle comparison is
    exact, no float-order drift.

    Shape at 10^12 docs: explode → two hash aggregations
    ((lang, token) then lang), both map-side combinable; no window,
    no join."""
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                    lambda x: x != "")
    rows = df.select(F.col(lang_col).alias("lang"),
                     F.explode(toks).alias("__tok"))
    tc = (rows.groupBy("lang", "__tok")
          .agg(F.count("*").alias("__c")))
    one = F.when(F.col("__c") == 1, 1).otherwise(0)
    two = F.when(F.col("__c") == 2, 1).otherwise(0)
    return (tc.groupBy("lang")
            .agg(F.sum("__c").cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_types"),
                 F.sum(one).cast("long").alias("singletons"),
                 F.sum(two).cast("long").alias("doubletons"))
            .withColumn("p_unseen",
                        F.round(F.col("singletons")
                                / F.col("n_tokens"), round_to)))


def hapax_rate(df: DataFrame, *, text_col: str = "text",
               by: str = "lang", round_to: int = 6) -> DataFrame:
    """Hapax-legomena profile per group: what share of each group's
    VOCABULARY occurs exactly once? Healthy natural-language corpora
    sit near the Zipf-predicted ~50%; a collapsing hapax share means
    template/boilerplate flooding, an exploding one means OCR noise /
    mojibake minting junk types. Companion to `good_turing_mass`
    (which reports the TOKEN-mass share of singletons, not the
    type share) and `heaps_fit`. Output: ``(group, vocab_size,
    n_hapax, hapax_share, n_tokens)``.

    Shape at 10^12 docs: one explode + (group, token) hash aggregation
    with map-side combine, then a group-sized re-aggregation — the
    same two shuffles every corpus-vocabulary operator here pays."""
    tok = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    counts = (df.where(F.col(by).isNotNull())
              .select(F.col(by), tok.alias("__t"))
              .where(F.col("__t") != "")
              .groupBy(by, "__t").agg(F.count("*").alias("__n")))
    return (counts.groupBy(by)
            .agg(F.count("*").cast("long").alias("vocab_size"),
                 F.sum((F.col("__n") == 1).cast("long"))
                 .cast("long").alias("n_hapax"),
                 F.sum("__n").cast("long").alias("n_tokens"))
            .select(by, "vocab_size", "n_hapax",
                    F.round(F.col("n_hapax") / F.col("vocab_size"),
                            round_to).alias("hapax_share"),
                    "n_tokens"))


def bm25_topk(df: DataFrame, query_terms: "list[str]", *,
              text_col: str = "text", id_col: str = "doc_id",
              k: int = 20, k1: float = 1.2, b: float = 0.75,
              corpus_stats: "tuple[int, float] | None" = None,
              round_to: int = 6) -> DataFrame:
    """BM25 retrieval scoring of a fixed term query against the
    corpus — the classic probabilistic ranking (Robertson/Spärck
    Jones; Lucene's ``idf = ln(1 + (N−df+0.5)/(df+0.5))`` variant so
    idf stays positive) and the natural companion to the per-doc
    `tfidf_terms` profile. Output: the top ``k`` docs as
    ``(doc_id, score)``, ranked by (rounded score desc, id asc) so the
    cut is bit-deterministic across engines.

    Scale shape: tokens are filtered to the query terms BEFORE any
    shuffle (the term set is a literal ≤ dozens), so the tf
    aggregation shuffles only matching postings, never the corpus
    vocabulary; df/avgdl/N are a term-sized frame + a 1-row broadcast;
    the final cut is a TakeOrdered top-k, not a global sort.

    ``corpus_stats``: pass the precomputed ``(n_docs, avg_doc_len)``
    (a retrieval deployment computes them ONCE per corpus snapshot,
    not per query) to skip the stats branch — per-query cost then
    touches the corpus exactly once."""
    if not query_terms:
        raise ValueError("bm25_topk: query_terms required")
    terms = sorted({t.lower() for t in query_terms})
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                    lambda x: x != "")
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.explode(toks).alias("__t"),
                    F.size(toks).cast("long").alias("__dl")))
    hits = base.where(F.col("__t").isin(terms))
    tf = (hits.groupBy("__id", "__t")
          .agg(F.count("*").alias("__tf"), F.min("__dl").alias("__dl")))
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))
    if corpus_stats is not None:
        n_docs, avgdl_v = corpus_stats
        spark = df.sparkSession
        stats = spark.range(1).select(
            F.lit(int(n_docs)).cast("long").alias("__n"),
            F.lit(float(avgdl_v)).alias("__avgdl"))
    else:
        stats = (df.where(F.col(text_col).isNotNull()
                          & F.col(id_col).isNotNull())
                 .agg(F.count("*").alias("__n"),
                      F.avg(F.size(toks)).alias("__avgdl")))
    idf = F.log(1.0 + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    norm = (F.col("__tf") * (k1 + 1.0)
            / (F.col("__tf")
               + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))))
    scored = (tf.join(F.broadcast(dfreq), "__t")
              .crossJoin(F.broadcast(stats))
              .groupBy("__id")
              .agg(F.round(F.sum(idf * norm), round_to).alias("score")))
    return (scored.select(F.col("__id").alias(id_col), "score")
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(int(k)))


def build_postings(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   max_postings: int = 8) -> DataFrame:
    """Capped inverted-index construction — the retrieval-side build
    step over a validated corpus: per token, document frequency,
    collection frequency, and the first ``max_postings`` doc ids of
    the (sorted) posting list as a bounded sample. Output:
    ``(token, df, cf, postings)``.

    One explode + (token, doc) hash aggregation (map-side combine
    collapses in-doc repeats), then a vocabulary-keyed re-aggregation.
    The posting sample is capped BEFORE any driver contact — full
    posting lists at 10^12 docs belong in a sharded sink (write the
    (token, doc) frame bucketed by token), not in a collected column;
    the capped sample is the audit/debug view."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    pairs = (df.where(F.col(text_col).isNotNull()
                      & F.col(id_col).isNotNull())
             .select(F.col(id_col).alias("__id"), toks.alias("token"))
             .where(F.col("token") != "")
             .groupBy("token", "__id").agg(F.count("*").alias("__tf")))
    return (pairs.groupBy("token")
            .agg(F.count("*").cast("long").alias("df"),
                 F.sum("__tf").cast("long").alias("cf"),
                 F.slice(F.array_sort(F.collect_list("__id")), 1,
                         int(max_postings)).alias("postings"))
            .where(F.col("df") >= int(min_df)))


def code_switch_profile(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        markers: "dict[str, list[str]] | None" = None,
                        round_to: int = 6) -> DataFrame:
    """Code-switching scan: split each doc into sentence segments
    ([.!?]+ whitespace boundaries), language-ID each segment with the
    marker heuristic, and report how many docs mix languages across
    segments — concatenation artifacts (boilerplate gluing two pages),
    template wrappers around foreign content, and genuinely
    code-switched forum text all surface here; a doc-level lang_id
    misses them because one language's markers dominate the vote.
    Output one row: ``(n_docs, n_multiseg, n_mixed, share_mixed)``
    (mixed = ≥2 distinct non-'und' segment predictions).

    One explode + per-doc aggregation (uniform doc_id key — no skew),
    then a single global rollup."""
    seg = F.explode(F.split(F.col(text_col), r"[.!?]+\s+"))
    segs = (df.where(F.col(text_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("__id"), seg.alias("__seg"))
            .where(F.trim(F.col("__seg")) != ""))
    pred = lang_id(F.col("__seg"), markers)
    per_doc = (segs.select("__id", pred.alias("__p"))
               .groupBy("__id")
               .agg(F.count("*").alias("__nseg"),
                    F.count_distinct(
                        F.when(F.col("__p") != "und", F.col("__p")))
                    .alias("__nlang")))
    return per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("__nseg") > 1).cast("long")).cast("long")
        .alias("n_multiseg"),
        F.sum((F.col("__nlang") > 1).cast("long")).cast("long")
        .alias("n_mixed"),
        F.round(F.sum((F.col("__nlang") > 1).cast("long"))
                / F.count("*"), round_to).alias("share_mixed"))


def shape_template_census(df: DataFrame, *, text_col: str = "text",
                          prefix_len: int = 40,
                          round_to: int = 6) -> DataFrame:
    """Structural-template census: collapse each doc's normalized
    prefix to a SHAPE fingerprint (letter runs → 'a', digit runs →
    '0', everything else kept) and count docs per shape — the
    cheapest boilerplate/template detector there is: machine-minted
    pages (listings, error pages, captcha walls) collapse onto a
    handful of shapes while organic prose spreads thin. Prefix-only
    (``prefix_len``) so the fingerprint cost is O(1) per doc, not
    O(doc). Output: ``(template, n_docs, share)``.

    One projection + one shape-cardinality aggregation; share via the
    1-row broadcast (AQE collapses it to a ReusedExchange)."""
    shape = F.regexp_replace(
        F.regexp_replace(
            F.substring(normalize_text(F.col(text_col)), 1,
                        int(prefix_len)),
            "[a-z]+", "a"),
        "[0-9]+", "0")
    cells = (df.where(F.col(text_col).isNotNull())
             .select(shape.alias("template"))
             .groupBy("template").agg(F.count("*").alias("n_docs")))
    tot = cells.agg(F.sum("n_docs").alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("template",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.round(F.col("n_docs") / F.col("__t"), round_to)
                    .alias("share")))


def term_burstiness(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", min_df: int = 5,
                    k: int = 15, round_to: int = 6) -> DataFrame:
    """Church–Gale term burstiness: ``cf/df`` — the mean occurrences
    per CONTAINING document. Function words sit near the Poisson
    expectation; a content term with high burst concentrates in few
    docs (topical), and an implausibly bursty "term" is usually a
    boilerplate token or spam keyword being stuffed. Output: top ``k``
    terms with df ≥ ``min_df`` as ``(token, df, cf, burst)``, ranked
    (rounded burst desc, token asc) so the cut is deterministic.

    Same two-shuffle shape as every vocabulary operator (explode +
    (token,doc) agg with map-side combine, token re-agg); the cut is
    a TakeOrdered over the vocabulary, never a corpus sort."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    pairs = (df.where(F.col(text_col).isNotNull()
                      & F.col(id_col).isNotNull())
             .select(F.col(id_col).alias("__id"), toks.alias("token"))
             .where(F.col("token") != "")
             .groupBy("token", "__id").agg(F.count("*").alias("__tf")))
    return (pairs.groupBy("token")
            .agg(F.count("*").cast("long").alias("df"),
                 F.sum("__tf").cast("long").alias("cf"))
            .where(F.col("df") >= int(min_df))
            .withColumn("burst",
                        F.round(F.col("cf") / F.col("df"), round_to))
            .orderBy(F.col("burst").desc(), F.col("token"))
            .limit(int(k)))


def lexical_concentration(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id",
                          round_to: int = 6) -> DataFrame:
    """Per-doc unigram Herfindahl concentration (HHI = Σ(tf/len)²)
    bucketed into a corpus histogram — the token-level repetitiveness
    gauge that catches "same word stuffed 500 times" pages that pass
    length and dup-n-gram gates (HHI → 1 as one type dominates;
    healthy prose sits near 1/vocab). Buckets = floor(10·HHI) capped
    at 9. Output: ``(bucket, n_docs, share)``.

    HHI derives from exact integer power sums per doc (Σtf², (Σtf)²),
    so bucketing is bit-deterministic; explode + per-doc agg + 10-row
    rollup."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    tf = (df.where(F.col(text_col).isNotNull()
                   & F.col(id_col).isNotNull())
          .select(F.col(id_col).alias("__id"), toks.alias("__t"))
          .where(F.col("__t") != "")
          .groupBy("__id", "__t").agg(F.count("*").alias("__tf")))
    per_doc = (tf.groupBy("__id")
               .agg(F.sum(F.col("__tf") * F.col("__tf")).alias("__s2"),
                    F.sum("__tf").alias("__s1")))
    hhi = F.col("__s2") / (F.col("__s1") * F.col("__s1"))
    bucket = F.least(F.floor(hhi * 10), F.lit(9)).cast("long")
    cells = (per_doc.select(bucket.alias("bucket"))
             .groupBy("bucket").agg(F.count("*").alias("n_docs")))
    tot = cells.agg(F.sum("n_docs").alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("bucket",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.round(F.col("n_docs") / F.col("__t"), round_to)
                    .alias("share")))


_BLOCK_TAG_RE = (r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|"
                 r"section|article|header|footer|nav|aside|blockquote|"
                 r"pre|br)\b[^>]*>")


def link_density_strip(df: DataFrame, *, html_col: str = "text",
                       id_col: str = "doc_id",
                       max_link_density: float = 0.5,
                       min_block_chars: int = 20,
                       out_col: str = "main_text") -> DataFrame:
    """Link-density main-content extraction — the jusText/boilerpipe
    block heuristic (Pomikálek 2011; Kohlschütter et al. WSDM 2010)
    in its expression-only form: split the page at block-level tags,
    score each block by the share of its visible characters that sit
    inside ``<a>`` anchors, and keep blocks that are long enough AND
    below the link-density cap — navigation bars, footers and related-
    links boxes are short and nearly-all-anchor, body prose is long
    and anchor-sparse. The corpus-frequency complement is
    :func:`strip_boilerplate` (which needs a corpus pass; this is
    per-document, fused into the scan).

    Keeps a block when ``len(text) ≥ min_block_chars`` and
    ``anchor_chars / text_chars ≤ max_link_density``. Emits
    ``n_blocks``, ``n_kept`` and *out_col* (kept block texts joined
    with newlines, tags stripped, whitespace collapsed); the original
    html/text bytes are untouched (byte-identity contract).

    Shape: posexplode over the tag-split blocks (bounded by page
    structure, ~10²-10³ blocks) → pure regex per block → position-
    ordered re-aggregation → id join — the same two-shuffle shape as
    strip_repeated_lines, zero Python. Nested ``<a>`` inside kept
    markup and entity decoding are out of scope (anchor contents match
    non-greedily; entities count as their literal characters).
    """
    blocks = F.split(F.col(html_col), _BLOCK_TAG_RE)
    base = df.withColumn("n_blocks",
                         F.size(blocks).cast("long"))
    ex = base.select(F.col(id_col),
                     F.posexplode(blocks).alias("__pos", "__blk"))
    visible = F.trim(F.regexp_replace(F.regexp_replace(
        "__blk", r"<[^>]*>", " "), r"\s+", " "))
    anchors = F.regexp_extract_all(
        F.col("__blk"), F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1)
    anchor_len = F.aggregate(
        F.transform(anchors, lambda s: F.length(F.trim(
            F.regexp_replace(F.regexp_replace(s, r"<[^>]*>", " "),
                             r"\s+", " ")))),
        F.lit(0), lambda acc, x: acc + x)
    scored = ex.select(
        F.col(id_col), "__pos", visible.alias("__text"),
        F.length(visible).alias("__n"), anchor_len.alias("__a"))
    kept = scored.where(
        (F.col("__n") >= int(min_block_chars))
        & (F.col("__a") <= F.lit(float(max_link_density)) * F.col("__n")))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count("*").cast("long").alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("__pos", "__text"))),
                            lambda s: s["__text"]),
                        "\n").alias(out_col)))
    return (base.join(rebuilt, id_col, "left")
            .withColumn("n_kept",
                        F.coalesce("n_kept", F.lit(0).cast("long")))
            .withColumn(out_col, F.coalesce(out_col, F.lit(""))))


def bpe_pair_counts(df: DataFrame, *, text_col: str = "text",
                    top_k: int = 20) -> DataFrame:
    """Corpus-level adjacent character-pair census — the statistic one
    BPE merge step maximizes (Sennrich et al. 2016): the pair with the
    highest corpus count becomes the next merge. Emits the ``top_k``
    pairs as ``(pair, n, rank)`` over the normalized token stream
    (pairs never cross word boundaries, matching BPE's word-internal
    merges; no end-of-word sentinel — documented simplification).

    Shape at 10^12 docs: tokenize → explode words (corpus token count,
    the irreducible cost of any tokenizer-training statistic) → an
    in-expression pair list per word → ONE hash aggregation on the
    pair (map-side combine absorbs the Zipf head) → TakeOrdered-style
    rank over the pair vocabulary (≤ alphabet², tiny)."""
    words = (df.select(F.explode(F.split(normalize_text(
        F.col(text_col)), " ")).alias("__w"))
             .where(F.length("__w") >= 2))
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("__w") - 1),
        lambda i: F.col("__w").substr(i, F.lit(2)))
    cells = (words.select(F.explode(pairs).alias("pair"))
             .groupBy("pair").agg(F.count("*").alias("n")))
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (cells.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(top_k))
            .select("pair", F.col("n").cast("long").alias("n"),
                    F.col("rank").cast("long").alias("rank")))


def structure_profile(df: DataFrame, *, text_col: str = "text",
                      min_code_signals: int = 2,
                      min_table_lines: int = 3,
                      round_to: int = 6) -> DataFrame:
    """Document structure census for training-mix routing: code, table
    and list signals that decide whether a page belongs in the prose,
    code or tabular bucket (mix ratios are a first-order training
    lever; prose-only quality gates mis-score code and tables). All
    pure line/regex expressions fused into the scan — no shuffle.

    Adds per document: ``n_lines``, ``code_fences`` (paired \\`\\`\\`
    markers), ``indent_ratio`` (lines starting with ≥4 spaces or a
    tab), ``brace_semi_density`` ({};()= chars per char),
    ``table_lines`` (lines with ≥2 pipe characters), ``bullet_ratio``
    (-/*/digit-dot list lines), and the verdicts ``is_codeish``
    (≥ ``min_code_signals`` of: a fence pair, indent_ratio ≥ 0.2,
    brace_semi_density ≥ 0.02) and ``is_tableish``
    (``table_lines ≥ min_table_lines``)."""
    lines = split_lines(F.col(text_col))
    nl = F.size(lines)
    fences = F.floor(
        F.size(F.filter(lines, lambda x: x.rlike("^```"))) / 2) \
        .cast("long")
    indent = F.size(F.filter(
        lines, lambda x: x.rlike("^(    |\t)")))
    braces = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[{};()=]", ""))
    tlines = F.size(F.filter(
        lines,
        lambda x: F.length(x) - F.length(F.regexp_replace(x, r"\|", ""))
        >= 2))
    bullets = F.size(F.filter(
        lines, lambda x: x.rlike(r"^\s*(-|\*|[0-9]+\.)\s")))
    out = (df.withColumn("n_lines", nl.cast("long"))
           .withColumn("code_fences", fences)
           .withColumn("indent_ratio",
                       F.round(indent / F.greatest(nl, F.lit(1)),
                               round_to))
           .withColumn("brace_semi_density",
                       F.round(braces / F.greatest(
                           F.length(text_col), F.lit(1)), round_to))
           .withColumn("table_lines", tlines.cast("long"))
           .withColumn("bullet_ratio",
                       F.round(bullets / F.greatest(nl, F.lit(1)),
                               round_to)))
    signals = (F.col("code_fences") >= 1).cast("int") + \
        (F.col("indent_ratio") >= 0.2).cast("int") + \
        (F.col("brace_semi_density") >= 0.02).cast("int")
    return (out.withColumn("is_codeish",
                           signals >= int(min_code_signals))
            .withColumn("is_tableish",
                        F.col("table_lines") >= int(min_table_lines)))


# lowercase confusables that survive normalize_text's lowering: the
# Cyrillic/Greek glyphs rendered identically to Latin in most fonts —
# the spammer's cheapest exact-dedup evasion (and the content-side
# complement of the IDN xn-- host census)
HOMOGLYPH_FROM = "аеорсхуіјѕԛԝο"
HOMOGLYPH_TO = "aeopcxyijsqwo"


def homoglyph_normalize(col: Column) -> Column:
    """Fold common Cyrillic/Greek→Latin confusables into their Latin
    look-alikes ON TOP of normalize_text — the dedup key that catches
    byte-different, pixel-identical copies (exact fingerprints miss
    them; MinHash mostly does too, since every containing shingle
    changes). One ``translate`` — fused into the scan, O(1) per char,
    identical builtin in DuckDB. The documented mapping is the
    conservative 13-glyph set; extend per corpus audit
    (`mojibake_scan` shows which confusables actually occur)."""
    return F.translate(normalize_text(col), HOMOGLYPH_FROM,
                       HOMOGLYPH_TO)


def homoglyph_fingerprint(col: Column) -> Column:
    """md5 over the homoglyph-folded normal form — drop-in replacement
    key for exact_dedup when the corpus is adversarial."""
    return F.md5(homoglyph_normalize(col))


def nfc_audit(df: DataFrame, *, text_col: str = "text",
              by: str | None = "lang") -> DataFrame:
    """Unicode NFC normalization QC — mixed-crawl corpora carry the
    same grapheme both precomposed (U+00E9) and decomposed
    (e + U+0301), which silently splits dedup fingerprints, vocabulary
    counts and equality joins. Per group: ``(n_docs, n_not_nfc,
    not_nfc_share)`` where a doc counts when its text is NOT already
    NFC-normal (``unicodedata.is_normalized`` — the O(1)-memory
    quick-check path of UAX #15; the DuckDB twin is
    ``nfc_normalize(text) <> text``). NULL texts are excluded from
    both counts.

    Scale shape: one Arrow-vectorized pandas_udf Project (the
    is_normalized probe has no Column-expression equivalent), then one
    group-keyed aggregation with map-side combine — the UDF adds one
    boolean per row to the scan stage, nothing corpus-quadratic."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.BooleanType())
    def _is_nfc(s: "pd.Series") -> "pd.Series":
        import unicodedata

        return s.map(lambda v: None if v is None
                     else unicodedata.is_normalized("NFC", v))

    flagged = df.where(F.col(text_col).isNotNull()).select(
        (F.col(by) if by else F.lit("all")).alias("grp"),
        (~_is_nfc(F.col(text_col))).cast("int").alias("__bad"))
    return (flagged.groupBy(F.col("grp").alias(by or "group"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("__bad").cast("long").alias("n_not_nfc"),
                 F.round(F.avg("__bad"), 6).alias("not_nfc_share")))


def vocab_prune_curve(df: DataFrame, *, text_col: str = "text",
                      thresholds: "Sequence[int]" = (1, 2, 5, 10, 20),
                      ) -> DataFrame:
    """Vocabulary-pruning tradeoff curve — the tokenizer-design
    question "what does min_count=t cost?": for each candidate
    threshold, the surviving vocabulary size and the share of token
    MASS it still covers (1 − that share = the OOV rate a model with
    this vocab would see on its own training corpus). One row per
    threshold: ``(min_count, vocab_size, covered_share)``.

    Scale shape: one normalize+split explode (the corpus-token
    stream), ONE token-keyed count (map-side combine — the only real
    shuffle), then the count table (vocabulary-sized, ≪ corpus)
    crossed with the constant threshold array and reduced. Adding a
    threshold costs nothing measurable."""
    ts = sorted({int(t) for t in thresholds})
    if not ts or ts[0] < 1:
        raise ValueError(f"thresholds must be >= 1, got {thresholds}")
    toks = (df.select(F.explode(F.split(normalize_text(F.col(text_col)),
                                        " ")).alias("tok"))
            .where(F.col("tok") != ""))
    counts = toks.groupBy("tok").agg(F.count("*").alias("__c"))
    tdf = counts.select(
        "__c", F.explode(F.array(*[F.lit(t) for t in ts]))
        .alias("min_count"))
    keep = F.col("__c") >= F.col("min_count")
    return (tdf.groupBy("min_count")
            .agg(F.sum(keep.cast("long")).alias("vocab_size"),
                 F.round(F.sum(F.when(keep, F.col("__c"))
                               .otherwise(F.lit(0)))
                         / F.sum("__c"), 6).alias("covered_share")))


def badword_rate(df: DataFrame, terms: "list[str]", *,
                 text_col: str = "text",
                 by: str | None = None) -> DataFrame:
    """Blocklist-term document gate — the C4 "bad words" filter
    (Raffel et al. 2020 drop any page containing a term from the
    List-of-Dirty-Naughty-Obscene-and-Otherwise-Bad-Words; RefinedWeb
    and FineWeb keep the same screen in their URL/content stages):
    a document is flagged iff it contains ANY blocklist term as a
    whole word, case-insensitively. Reported per group (lang, source,
    …) as ``(by, n_docs, n_flagged, flag_rate)`` so a per-language
    false-positive explosion (the classic C4 failure on medical /
    minority-dialect text) is visible before anyone drops rows.

    Terms must be plain word-characters (validated) — the single
    alternation regex then means ONE compiled JVM matcher per task,
    no per-term column, and the identical pattern runs on the RE2
    side of a SQL oracle. Scale shape: one projection + one tiny hash
    aggregation; no shuffle beyond the group key."""
    import re as _re

    if not terms:
        raise ValueError("badword_rate: empty term list")
    for t in terms:
        if not _re.fullmatch(r"\w+", t):
            raise ValueError(f"badword_rate: term {t!r} is not plain "
                             "word characters; escape/extend the "
                             "pattern builder before widening it")
    pat = r"(?i)\b(?:" + "|".join(terms) + r")\b"
    flag = F.coalesce(F.col(text_col).rlike(pat), F.lit(False))
    keys = [F.col(by)] if by else []
    return (df.groupBy(*keys)
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(flag.cast("long")).cast("long")
                 .alias("n_flagged"))
            .withColumn("flag_rate",
                        F.round(F.col("n_flagged") / F.col("n_docs"),
                                6)))


def keyness_terms(df: DataFrame, *, focus, text_col: str = "text",
                  min_count: int = 5,
                  round_to: int = 6) -> DataFrame:
    """Corpus-comparison keyness via the Dunning (1993) log-likelihood
    G² — which terms are over/under-represented in a FOCUS slice
    (one source, one language, one time window) against the rest of
    the corpus. The workhorse behind "what is this crawl slice full
    of?", boilerplate attribution, and topic drift triage; unlike
    raw frequency ratios it is well-behaved for rare terms, and
    unlike :func:`tfidf_top_terms` it is a two-corpus significance
    test, not a per-document salience score.

    For each term with total count ≥ ``min_count``:
    a = focus count, b = reference count, c/d = corpus token totals;
    E1 = c·(a+b)/(c+d), E2 = d·(a+b)/(c+d);
    G² = 2·(a·ln(a/E1) + b·ln(b/E2)) with 0·ln0 = 0, signed positive
    when the term is focus-enriched (a/c > b/d).

    Shape at 10^12 docs: one explode + one (term, side) hash
    aggregation with map-side combine, the two scalar totals
    broadcast back via a 1-row cross join (the `crossJoin`-scalar
    idiom used across this module); no window, no per-row Python."""
    fc = focus if isinstance(focus, Column) else F.col(focus)
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    lng = (df.select(fc.cast("int").alias("__f"),
                     F.explode(tokens).alias("term"))
           .where((F.col("term") != "") & F.col("__f").isNotNull()))
    counts = lng.groupBy("term").agg(
        F.sum("__f").cast("double").alias("__a"),
        F.sum(1 - F.col("__f")).cast("double").alias("__b"))
    totals = lng.groupBy().agg(
        F.sum("__f").cast("double").alias("__c"),
        F.sum(1 - F.col("__f")).cast("double").alias("__d"))
    j = counts.where(F.col("__a") + F.col("__b") >= min_count) \
        .crossJoin(F.broadcast(totals))
    e1 = F.col("__c") * (F.col("__a") + F.col("__b")) \
        / (F.col("__c") + F.col("__d"))
    e2 = F.col("__d") * (F.col("__a") + F.col("__b")) \
        / (F.col("__c") + F.col("__d"))
    xlx = (lambda x, e: F.when(x > 0, x * F.log(x / e))
           .otherwise(F.lit(0.0)))
    g2 = 2.0 * (xlx(F.col("__a"), e1) + xlx(F.col("__b"), e2))
    enriched = (F.col("__a") / F.col("__c")
                > F.col("__b") / F.col("__d"))
    return j.select(
        "term", F.col("__a").cast("long").alias("n_focus"),
        F.col("__b").cast("long").alias("n_ref"),
        F.round(F.when(enriched, g2).otherwise(-g2),
                round_to).alias("keyness"))


def vocab_richness(df: DataFrame, *, text_col: str = "text",
                   by: str | None = None,
                   round_to: int = 6) -> DataFrame:
    """Vocabulary richness per group: observed vocabulary, hapax (f1)
    and dis legomena (f2) counts, the bias-corrected Chao1 estimate
    of TRUE vocabulary size V + f1·(f1−1)/(2·(f2+1)) (Chao 1984,
    the f2=0-safe form), and Good's coverage 1 − f1/N — "how much of
    this slice's vocabulary have we actually seen?". The unseen-MASS
    companion is :func:`good_turing_mass`; this estimates unseen
    SPECIES, the number a dedup vocabulary or tokenizer training run
    still hasn't met. Chao1 is a lower bound, reported as such.

    Shape: one explode + (group, term) hash aggregation, then a
    group rollup that reuses the same hash partitioning (subset
    key) — two logical aggs, one shuffle of the exploded stream."""
    grp = F.col(by) if by else F.lit(0)
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    lng = (df.select(grp.alias("__g"), F.explode(tokens).alias("__t"))
           .where(F.col("__t") != ""))
    per_term = lng.groupBy("__g", "__t").agg(F.count("*").alias("__c"))
    g = per_term.groupBy("__g").agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab"),
        F.sum((F.col("__c") == 1).cast("int")).cast("long").alias("f1"),
        F.sum((F.col("__c") == 2).cast("int")).cast("long").alias("f2"))
    chao1 = (F.col("vocab")
             + F.col("f1") * (F.col("f1") - 1)
             / (2.0 * (F.col("f2") + 1)))
    cov = 1.0 - F.col("f1") / F.col("n_tokens")
    out = g.select(
        "__g", "n_tokens", "vocab", "f1", "f2",
        F.round(chao1, round_to).alias("chao1"),
        F.round(cov, round_to).alias("coverage"))
    if by:
        return out.withColumnRenamed("__g", by)
    return out.drop("__g")


# ---------------------------------------------------------------------------
# RAKE keyword extraction — stopword-delimited phrases, degree/freq scores
# ---------------------------------------------------------------------------

# compact deterministic stopword list for RAKE phrase delimiting —
# small and explicit so the SQL oracle twin carries the identical
# alternation (the full SMART list would bloat the regex past what a
# readable oracle should hold; callers pass their own for production)
RAKE_STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
    "or", "from", "not", "but", "have", "has")


def rake_phrases(df: DataFrame, *, text_col: str = "text",
                 top_k: int = 20,
                 stopwords: "tuple[str, ...]" = RAKE_STOPWORDS,
                 round_to: int = 6) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal token runs between stopwords/punctuation; each
    word scores degree/frequency where, over ALL phrase occurrences in
    the corpus, freq(w) = occurrences of w and deg(w) = Σ length of
    the phrases containing it (the co-occurrence-graph degree with
    self-loop, the canonical formulation); a phrase scores the sum of
    its words' scores. Returns the corpus top-*top_k* phrases by
    (score desc, phrase) as ``(phrase, n_words, n_occ, score)``.

    Delimiting is two regex replaces fused into the scan — punctuation
    runs and word-bounded stopwords both become ``|`` — then one
    explode of the split fragments. Scale shape: explode → TWO hash
    aggregations (word stats over all occurrences; then per distinct
    phrase) + one equi-join of phrase-words against the word-score
    table; every stage is map-side combinable and the final top-k is
    a TakeOrdered over |distinct phrases| aggregate rows, never a
    global sort of the corpus.
    """
    sw = "|".join(stopwords)
    delim = F.regexp_replace(
        F.regexp_replace(normalize_text(F.col(text_col)),
                         r"[^a-z0-9 ]+", "|"),
        rf"\b(?:{sw})\b", "|")
    phrases = F.filter(
        F.transform(F.split(delim, r"\|"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0)
    occ = (df.select(F.explode(phrases).alias("phrase"))
           .select("phrase",
                   F.size(F.split("phrase", " ")).alias("plen")))
    winst = occ.select("phrase", "plen",
                       F.explode(F.split("phrase", " ")).alias("word"))
    wscore = (winst.groupBy("word")
              .agg((F.sum("plen").cast("double") / F.count(F.lit(1)))
                   .alias("wscore")))
    dp = (occ.groupBy("phrase")
          .agg(F.count(F.lit(1)).alias("n_occ"),
               F.first("plen").alias("n_words")))
    dw = dp.select("phrase",
                   F.explode(F.split("phrase", " ")).alias("word"))
    ps = (dw.join(wscore, "word")
          .groupBy("phrase")
          .agg(F.round(F.sum("wscore"), round_to).alias("score")))
    return (dp.join(ps, "phrase")
            .select("phrase",
                    F.col("n_words").cast("long").alias("n_words"),
                    F.col("n_occ").cast("long").alias("n_occ"),
                    "score")
            .orderBy(F.desc("score"), "phrase")
            .limit(int(top_k)))


def kneser_ney_bigrams(df: DataFrame, *, text_col: str = "text",
                       discount: float = 0.75,
                       min_count: int = 1,
                       top_k: int | None = 50) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    1995; the Chen & Goodman 1998 interpolated form) — the standard
    smoothed n-gram LM estimator, here as a corpus-quality surface:
    a high-probability bigram under KN is "expected language", so the
    per-bigram p_kn complements raw-count surprisal (which over-ranks
    bigrams whose second word is frequent in ONE context only —
    "Francisco" appears a lot but almost only after "San"; KN's
    continuation count fixes exactly that):

        p_kn(w2|w1) = max(c(w1 w2) − d, 0) / c(w1 •)
                      + (d / c(w1 •)) · N1+(w1 •) · p_cont(w2)
        p_cont(w2)  = N1+(• w2) / N1+(• •)

    where N1+ counts DISTINCT continuations, not occurrences.

    Shape at scale: the bigram count table (map-side combine), two
    vocabulary-sized re-aggregations joined back (Zipf-bounded →
    broadcast), one scalar type total; top-k by (count desc, bigram).
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0,1), got {discount}")
    toks = F.split(normalize_text(F.col(text_col)), " ")
    pairs = F.zip_with(toks, F.slice(toks, 2, F.size(toks) - 1),
                       lambda a, b: F.concat_ws(" ", a, b))
    pairs = F.slice(pairs, 1, F.size(toks) - 1)
    big = (df.where(F.size(toks) >= 2)
           .select(F.explode(pairs).alias("bigram"))
           .groupBy("bigram").agg(F.count("*").alias("c")))
    big = big.persist()
    # c(w1 •) and N1+(w1 •): occurrence total and distinct-type count
    # of the context; N1+(• w2): distinct contexts of the continuation
    ctx = (big.groupBy(F.split("bigram", " ")[0].alias("__w1"))
           .agg(F.sum("c").alias("c_ctx"),
                F.count(F.lit(1)).alias("n1p_ctx")))
    cont = (big.groupBy(F.split("bigram", " ")[1].alias("__w2"))
            .agg(F.count(F.lit(1)).alias("n1p_cont")))
    tot = big.agg(F.count(F.lit(1)).alias("n1p_total"))
    d = float(discount)
    scored = (big.where(F.col("c") >= int(min_count))
              .join(F.broadcast(ctx),
                    F.split("bigram", " ")[0] == F.col("__w1"))
              .drop("__w1")
              .join(F.broadcast(cont),
                    F.split("bigram", " ")[1] == F.col("__w2"))
              .drop("__w2")
              .crossJoin(F.broadcast(tot))
              .select(
                  "bigram", "c",
                  F.round(
                      F.greatest(F.col("c") - F.lit(d), F.lit(0.0))
                      / F.col("c_ctx")
                      + (F.lit(d) / F.col("c_ctx"))
                      * F.col("n1p_ctx")
                      * (F.col("n1p_cont").cast("double")
                         / F.col("n1p_total")), 6).alias("p_kn")))
    # top_k=None returns the full scored table (the LM surface other
    # operators join against, e.g. kn_cross_entropy)
    out = (scored if top_k is None
           else scored.orderBy(F.desc("c"), F.asc("bigram"))
                      .limit(int(top_k)))
    out._zoi_persisted = [big]  # release after materialization
    return out


def burrows_delta(df: DataFrame, *, text_col: str = "text",
                  by: str = "source",
                  top_k_words: int = 50,
                  round_to: int = 6) -> DataFrame:
    """Burrows' Delta stylometric distance between groups (Burrows
    2002 "'Delta': a measure of stylistic difference"; Evert et al.
    2017 for the validation) — the standard authorship-attribution
    statistic, here as a cross-source style-drift audit: for the
    *top_k_words* most frequent words corpus-wide, z-score each
    group's relative frequency across groups, then

        Δ(a, b) = mean_w |z_a(w) − z_b(w)|

    A source whose Δ to every other source is large writes in a
    different register — the kind of corpus mixture a per-column
    validator cannot see.

    Shape at scale: one token explode + (group, word) hash
    aggregation; everything after runs on |groups|·top_k rows (the
    zero-filled grid is built by a broadcast cross join, tiny by
    construction). Returns ``(group_a, group_b, delta, n_words)``
    for a < b.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (df.where(F.col(text_col).isNotNull()
                      & F.col(by).isNotNull())
             .select(F.col(by).alias("g"),
                     F.explode(toks).alias("w"))
             .where(F.col("w") != ""))
    gw = words.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
    gw = gw.persist()
    top = (gw.groupBy("w").agg(F.sum("c").alias("cw"))
           .orderBy(F.desc("cw"), F.asc("w"))
           .limit(int(top_k_words)).select("w"))
    gtot = gw.groupBy("g").agg(F.sum("c").alias("gt"))
    # zero-filled group × word grid: a word a group never uses is
    # frequency 0, not a missing row — the z-scores depend on it
    grid = (gtot.crossJoin(F.broadcast(top))
            .join(gw, ["g", "w"], "left")
            .select("g", "w", "gt",
                    F.coalesce(F.col("c"), F.lit(0)).alias("c")))
    freq = grid.select("g", "w",
                       (F.col("c") / F.col("gt")).alias("f"))
    stats = (freq.groupBy("w")
             .agg(F.avg("f").alias("mu"),
                  F.stddev_pop("f").alias("sd")))
    z = (freq.join(F.broadcast(stats), "w")
         .where(F.col("sd") > 0)
         .select("g", "w",
                 ((F.col("f") - F.col("mu")) / F.col("sd"))
                 .alias("z")))
    pairs = (z.alias("a")
             .join(z.alias("b"),
                   (F.col("a.w") == F.col("b.w"))
                   & (F.col("a.g") < F.col("b.g")))
             .groupBy(F.col("a.g").alias("group_a"),
                      F.col("b.g").alias("group_b"))
             .agg(F.round(F.avg(F.abs(F.col("a.z") - F.col("b.z"))),
                          round_to).alias("delta"),
                  F.count(F.lit(1)).alias("n_words")))
    pairs._zoi_persisted = [gw]
    return pairs


def luhn_pan_scan(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Luhn-validated payment-card-number scan — the checksum gate
    every production PII scanner runs after the digit-run regex
    (ISO/IEC 7812; the Luhn mod-10 check eliminates the ~90% of
    random 13-19 digit runs that are phone numbers, ids, timestamps):
    a candidate is any contiguous 13-19 digit run; it is a PAN hit
    only if the Luhn checksum passes — doubling every second digit
    from the right, subtracting 9 above 9, total ≡ 0 (mod 10).

    Pure expressions end-to-end: regexp_extract_all for candidates,
    transform+aggregate over the reversed digit array for the
    checksum — one codegen projection, no shuffle before the caller's
    aggregation. Returns one row per document that has at least one
    candidate: ``(id, n_candidates, n_luhn_valid)``. The released
    frame deliberately excludes the matched digits (emitting them
    would BE the leak the scan exists to flag).
    """
    text = F.col(text_col)
    cands = F.regexp_extract_all(text, F.lit(r"\d{13,19}"), 0)

    def luhn_ok(run: Column) -> Column:
        digits = F.regexp_extract_all(F.reverse(run), F.lit(r"\d"), 0)
        terms = F.transform(
            digits,
            lambda d, i: F.when(
                i % 2 == 1,
                F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
                 .otherwise(d.cast("int") * 2))
            .otherwise(d.cast("int")))
        total = F.aggregate(terms, F.lit(0),
                            lambda acc, x: acc + x)
        return total % 10 == 0

    valid = F.filter(cands, luhn_ok)
    return (df.where(text.isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.size(cands).alias("n_candidates"),
                    F.size(valid).alias("n_luhn_valid"))
            .where(F.col("n_candidates") > 0))


def kn_cross_entropy(df: DataFrame, *, text_col: str = "text",
                     by: str = "source",
                     discount: float = 0.75,
                     round_to: int = 6) -> DataFrame:
    """Per-group corpus cross-entropy under the interpolated
    Kneser-Ney bigram LM (:func:`kneser_ney_bigrams`): every
    document's bigrams scored against the CORPUS-level KN table,
    then per group H = −mean log₂ p_kn and perplexity 2^H — the
    principled-smoothing upgrade of :func:`unigram_logprob`'s
    surprisal proxy: a source whose perplexity under the corpus LM is
    high writes different text (drift, spam, or another language)
    even when its length/stopword stats look normal.

    Since the LM is trained on the scored corpus itself, every doc
    bigram exists in the table — no OOV path — and the join is an
    equi-join against the Zipf-bounded bigram vocabulary (NOT
    broadcast by default: vocab² can exceed the broadcast budget at
    web scale). Returns ``(group, n_bigrams, bits, ppl)``.
    """
    lm = kneser_ney_bigrams(df, text_col=text_col,
                            discount=discount, top_k=None)
    toks = F.split(normalize_text(F.col(text_col)), " ")
    pairs = F.zip_with(toks, F.slice(toks, 2, F.size(toks) - 1),
                       lambda a, b: F.concat_ws(" ", a, b))
    pairs = F.slice(pairs, 1, F.size(toks) - 1)
    doc = (df.where((F.size(toks) >= 2) & F.col(by).isNotNull())
           .select(F.col(by).alias("group"),
                   F.explode(pairs).alias("bigram")))
    joined = doc.join(lm.select("bigram", "p_kn"), "bigram")
    out = (joined.groupBy("group")
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.round(-F.avg(F.log2("p_kn")), round_to)
                 .alias("bits"),
                F.round(F.pow(F.lit(2.0),
                              -F.avg(F.log2("p_kn"))), round_to)
                 .alias("ppl")))
    out._zoi_persisted = list(getattr(lm, "_zoi_persisted", []) or [])
    return out


def textrank_keywords(df: DataFrame, *, text_col: str = "text",
                      stopwords: "tuple[str, ...]" = RAKE_STOPWORDS,
                      iters: int = 4, damping: float = 0.85,
                      top_k: int = 25) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the word co-occurrence graph — adjacent
    content-word pairs (stopwords and non-alphabetic tokens dropped,
    self-pairs excluded) become undirected weighted edges, and a
    fixed-round power iteration scores centrality. Complements
    :func:`rake_phrases`: RAKE scores phrases by degree/frequency
    inside stopword-delimited runs; TextRank rewards words that
    co-occur with OTHER well-connected words, so a mid-frequency hub
    term can out-rank a high-frequency isolate.

    Runs on :func:`zoi_spark.graph.pagerank` (same update rule,
    dangling redistribution and per-round ``localCheckpoint`` lineage
    guard), so the plan shape per round is one shuffle of the
    vocabulary-sized edge table — corpus size only enters through the
    initial bigram aggregation. Returns top-k ``(word, rank)`` by
    (rank desc, word).
    """
    from .graph import pagerank

    toks = F.split(normalize_text(F.col(text_col)), " ")
    pairs_ab = F.zip_with(toks, F.slice(toks, 2, F.size(toks) - 1),
                          lambda a, b: F.struct(a.alias("a"),
                                                b.alias("b")))
    pairs_ab = F.slice(pairs_ab, 1, F.size(toks) - 1)
    sw = set(stopwords)
    raw = (df.where(F.size(toks) >= 2)
           .select(F.explode(pairs_ab).alias("p"))
           .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .where((F.col("a") != F.col("b"))
                  & F.col("a").rlike("^[a-z]+$")
                  & F.col("b").rlike("^[a-z]+$")
                  & ~F.col("a").isin(*sw) & ~F.col("b").isin(*sw)))
    # undirected: emit both directions, then weight by count
    edges = (raw.select("a", "b")
             .unionAll(raw.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
             .groupBy(F.col("a").alias("src"), F.col("b").alias("dst"))
             .agg(F.count(F.lit(1)).cast("double").alias("w")))
    ranks = pagerank(edges, weight_col="w", iters=iters,
                     damping=damping)
    return (ranks.select(F.col("node").alias("word"),
                         F.round("rank", 8).alias("rank"))
            .orderBy(F.desc("rank"), "word").limit(int(top_k)))


def multibyte_audit(df: DataFrame, *, text_col: str = "text",
                    by: str = "lang",
                    round_to: int = 6) -> DataFrame:
    """UTF-8 byte-density audit per group — the encoding-mix monitor
    a multilingual intake needs: characters vs encoded bytes, the
    bytes-per-char density, and the pure-ASCII document share. A
    `lang='en'` slice whose density drifts above ~1.0 is absorbing
    non-ASCII content (mojibake, copy-paste Unicode punctuation, or
    mislabeled language); a CJK slice near 1.0 is mislabeled ASCII —
    both invisible to length rules, which count CHARS on both sides.

    One fused aggregation over (chars, bytes) projections. Returns
    ``(group, n_docs, total_chars, total_bytes, bytes_per_char,
    ascii_doc_share)``.
    """
    chars = F.length(F.col(text_col))
    octets = F.octet_length(F.col(text_col))
    return (df.where(F.col(text_col).isNotNull()
                     & F.col(by).isNotNull())
            .groupBy(F.col(by).alias("group"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(chars).alias("total_chars"),
                 F.sum(octets).alias("total_bytes"),
                 F.round(F.sum(octets)
                         / F.sum(chars).cast("double"), round_to)
                  .alias("bytes_per_char"),
                 F.round(F.sum(F.when(chars == octets, 1)
                               .otherwise(0))
                         / F.count(F.lit(1)).cast("double"),
                         round_to).alias("ascii_doc_share")))


def renyi_profile(df: DataFrame, *, text_col: str = "text",
                  by: str = "source",
                  round_to: int = 6) -> DataFrame:
    """Rényi entropy spectrum of the token distribution per group —
    three points of the spectrum (Rényi 1961), in bits:

        H₀ = log₂ V            (hartley/richness: vocabulary size)
        H₁ = −Σ p log₂ p       (Shannon)
        H₂ = −log₂ Σ p²        (collision entropy)

    H₀ ≥ H₁ ≥ H₂ always; the GAPS are the signal: H₀−H₁ large means
    a long tail of rare types (natural text), H₁−H₂ large means a
    few dominant types under a broad vocabulary (template spam
    padded with noise words — exactly the profile keyword-stuffed
    pages show). One (group, token) aggregation, then per-group
    sums. Returns ``(group, n_tokens, h0, h1, h2)``.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (df.where(F.col(text_col).isNotNull()
                      & F.col(by).isNotNull())
             .select(F.col(by).alias("group"),
                     F.explode(toks).alias("w"))
             .where(F.col("w") != ""))
    gw = words.groupBy("group", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = gw.groupBy("group").agg(F.sum("c").alias("n"))
    j = gw.join(F.broadcast(tot), "group")
    p = F.col("c") / F.col("n")
    return (j.groupBy("group")
            .agg(F.first("n").alias("n_tokens"),
                 F.round(F.log2(F.count(F.lit(1)).cast("double")),
                         round_to).alias("h0"),
                 F.round(-F.sum(p * F.log2(p)), round_to).alias("h1"),
                 F.round(-F.log2(F.sum(p ** 2)), round_to)
                  .alias("h2")))


def chao_shen_entropy(df: DataFrame, *, text_col: str = "text",
                      by: str = "lang",
                      round_to: int = 6) -> DataFrame:
    """Coverage-adjusted Shannon entropy per group (Chao & Shen
    2003): the MLE entropy of a sampled vocabulary is biased LOW
    (unseen types carry no mass), so estimate sample coverage from
    singletons (Good-Turing: C = 1 − f₁/n), shrink the empirical
    probabilities to p̃ = C·p̂, and Horvitz-Thompson-weight each term
    by its detection probability 1 − (1−p̃)ⁿ:

        Ĥ_CS = −Σ p̃·log₂ p̃ / (1 − (1−p̃)ⁿ)

    The gap Ĥ_CS − Ĥ_MLE widens exactly when the vocabulary is
    undersampled — the honest comparison when sources have very
    different sizes (the smaller source's raw entropy is unfairly
    low). One (group, token) aggregation + per-group sums. Returns
    ``(group, n_tokens, n_types, f1, coverage, h_mle, h_cs)``.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (df.where(F.col(text_col).isNotNull()
                      & F.col(by).isNotNull())
             .select(F.col(by).alias("group"),
                     F.explode(toks).alias("w"))
             .where(F.col("w") != ""))
    gw = words.groupBy("group", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = gw.groupBy("group").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"))
    j = gw.join(F.broadcast(tot), "group")
    cov = 1 - F.col("f1") / F.col("n")
    pt = cov * F.col("c") / F.col("n")
    detect = 1 - (1 - pt) ** F.col("n")
    p = F.col("c") / F.col("n")
    return (j.groupBy("group")
            .agg(F.first("n").alias("n_tokens"),
                 F.first("types").alias("n_types"),
                 F.first("f1").alias("f1"),
                 F.round(F.first(cov), round_to).alias("coverage"),
                 F.round(-F.sum(p * F.log2(p)), round_to)
                  .alias("h_mle"),
                 # pt = 0 (coverage 0: every type a singleton) must
                 # contribute 0, not log2(0) — engines disagree on
                 # 0·(−inf) otherwise
                 F.round(-F.sum(F.when(pt > 0,
                                       pt * F.log2(pt) / detect)
                                .otherwise(F.lit(0.0))), round_to)
                  .alias("h_cs")))


def html_entity_audit(df: DataFrame, *, text_col: str = "text",
                      by: str = "source",
                      round_to: int = 6) -> DataFrame:
    """HTML-entity residue census per group — the tell that an
    extraction pipeline double-escaped or under-decoded: counts of
    named entities (&amp; …), numeric/hex character references
    (&#65; &#x1F600;), and BARE ampersands (an '&' that opens no
    entity). Extracted plain text should contain almost no entities;
    a group where they spike re-encoded its HTML, and the dedup
    fingerprints of those docs silently diverge from their decoded
    twins.

    Pure regexp_count projections fused into one aggregation.
    Returns ``(group, n_docs, n_named, n_numeric, n_bare_amp,
    docs_with_entities)``.
    """
    t = F.col(text_col)
    named = F.regexp_count(t, F.lit(r"&[a-zA-Z][a-zA-Z0-9]{1,31};"))
    numeric = F.regexp_count(
        t, F.lit(r"&#(?:[0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});"))
    amp = F.regexp_count(t, F.lit("&"))
    return (df.where(t.isNotNull() & F.col(by).isNotNull())
            .groupBy(F.col(by).alias("group"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(named).alias("n_named"),
                 F.sum(numeric).alias("n_numeric"),
                 F.sum(amp - named - numeric).alias("n_bare_amp"),
                 F.sum(F.when(named + numeric > 0, 1).otherwise(0))
                  .alias("docs_with_entities")))


def control_char_audit(df: DataFrame, *, text_col: str = "text",
                       by: str = "source") -> DataFrame:
    """Control-character and invisible-codepoint census per group —
    the bytes that survive a sloppy extraction: CRLF vs bare-CR line
    endings (count('\\r') − count('\\r\\n') = CRs no newline
    follows), C0 controls other than tab/LF/CR (terminal garbage,
    binary bleed-through), BOMs mid-stream (concatenated files), and
    the invisible spacing pair NBSP / zero-width-space that breaks
    whitespace tokenizers while printing as nothing.

    Pure regexp_count projections, one aggregation. Returns
    ``(group, n_docs, n_crlf, n_bare_cr, n_ctrl, n_bom, n_nbsp,
    n_zwsp)``.
    """
    t = F.col(text_col)
    crlf = F.regexp_count(t, F.lit("\r\n"))
    cr = F.regexp_count(t, F.lit("\r"))
    ctrl = F.regexp_count(
        t, F.lit("[\x00-\x08\x0b\x0c\x0e-\x1f]"))
    return (df.where(t.isNotNull() & F.col(by).isNotNull())
            .groupBy(F.col(by).alias("group"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(crlf).alias("n_crlf"),
                 F.sum(cr - crlf).alias("n_bare_cr"),
                 F.sum(ctrl).alias("n_ctrl"),
                 F.sum(F.regexp_count(t, F.lit("﻿")))
                  .alias("n_bom"),
                 F.sum(F.regexp_count(t, F.lit(" ")))
                  .alias("n_nbsp"),
                 F.sum(F.regexp_count(t, F.lit("​")))
                  .alias("n_zwsp")))


def truncation_audit(df: DataFrame, *, text_col: str = "text",
                     by: str = "source",
                     round_to: int = 6) -> DataFrame:
    """Truncation detector per group — two independent signals that
    an ingestion stage cut documents: (1) the share of docs whose
    trimmed text does NOT end in terminal punctuation (mid-sentence
    endings), and (2) a modal-length spike — when one exact length
    holds an outsized share of docs, that length is a ceiling
    (VARCHAR(n), a fixed read buffer), not a coincidence.

    One projection + two aggregations (per-(group, length) counts →
    per-group max). Returns ``(group, n_docs, no_terminal_share,
    modal_len, modal_share)``.
    """
    t = F.trim(F.col(text_col))
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("group"),
                    F.length(t).alias("ln"),
                    (~t.rlike("[.!?\"'”)]$")).cast("int")
                    .alias("no_term")))
    lens = (base.groupBy("group", "ln")
            .agg(F.count(F.lit(1)).alias("lc")))
    modal = (lens.groupBy("group")
             .agg(F.max(F.struct(F.col("lc"), (-F.col("ln"))
                                 .alias("nl"))).alias("m"))
             .select("group", F.col("m.lc").alias("modal_count"),
                     (-F.col("m.nl")).alias("modal_len")))
    g = (base.groupBy("group")
         .agg(F.count(F.lit(1)).alias("n_docs"),
              F.sum("no_term").alias("nt")))
    return (g.join(modal, "group")
            .select("group", "n_docs",
                    F.round(F.col("nt") / F.col("n_docs"), round_to)
                     .alias("no_terminal_share"),
                    F.col("modal_len").cast("long").alias("modal_len"),
                    F.round(F.col("modal_count") / F.col("n_docs"),
                            round_to).alias("modal_share")))


def shouting_audit(df: DataFrame, *, text_col: str = "text",
                   by: str = "source",
                   round_to: int = 6) -> DataFrame:
    """Shouting/exclamation spam profile per group — the stylistic
    spam tells the length/stopword quality gates don't price:
    uppercase-letter share, ALL-CAPS-word share (≥3 letters),
    exclamation density, and repeated-exclamation runs ("!!!" —
    virtually absent from edited prose, dense in clickbait). A
    group whose caps-word share jumps changed register, not topic.

    Pure regexp_count projections fused into one aggregation.
    Returns ``(group, n_docs, upper_char_share, caps_word_share,
    excl_per_kchar, n_multi_excl)``.
    """
    t = F.col(text_col)
    upper = F.regexp_count(t, F.lit("[A-Z]"))
    letters = F.regexp_count(t, F.lit("[A-Za-z]"))
    caps_words = F.regexp_count(t, F.lit(r"\b[A-Z]{3,}\b"))
    words = F.regexp_count(t, F.lit(r"\b[A-Za-z]{3,}\b"))
    excl = F.regexp_count(t, F.lit("!"))
    multi = F.regexp_count(t, F.lit("!{2,}"))
    return (df.where(t.isNotNull() & F.col(by).isNotNull())
            .groupBy(F.col(by).alias("group"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum(upper)
                         / F.sum(F.greatest(letters, F.lit(1)))
                         .cast("double"), round_to)
                  .alias("upper_char_share"),
                 F.round(F.sum(caps_words)
                         / F.sum(F.greatest(words, F.lit(1)))
                         .cast("double"), round_to)
                  .alias("caps_word_share"),
                 F.round(F.sum(excl) * 1000.0
                         / F.sum(F.greatest(F.length(t), F.lit(1))),
                         round_to).alias("excl_per_kchar"),
                 F.sum(multi).alias("n_multi_excl")))


# one class per emoji-bearing Unicode block the census counts; kept
# as explicit ranges so Java (Spark) and RE2 (DuckDB oracle) agree
EMOJI_CLASS = (r"[\x{2600}-\x{27BF}"      # misc symbols + dingbats
               r"\x{1F300}-\x{1F5FF}"     # misc symbols & pictographs
               r"\x{1F600}-\x{1F64F}"     # emoticons
               r"\x{1F680}-\x{1F6FF}"     # transport & map
               r"\x{1F900}-\x{1F9FF}"     # supplemental symbols
               r"\x{1FA70}-\x{1FAFF}]")   # symbols & pictographs ext


def emoji_profile(df: DataFrame, *, text_col: str = "text",
                  by: str = "source", chars_col: str = "n_chars",
                  round_to: int = 6) -> DataFrame:
    """Per-group emoji/pictograph census — the social-media-residue
    signal web-corpus curation gates on (emoji-dense pages are chat
    logs, comment dumps, or engagement spam, not prose; C4 and
    FineWeb both strip or downweight them). Counts MATCHES via
    regexp_count, which both engines define over codepoints — never
    string length, whose UTF-16 (Spark) vs codepoint (DuckDB)
    semantics diverge on astral-plane emoji. Normalization uses the
    stored *chars_col* for the same reason.

    Pure projection + one aggregation. Returns per-group rows
    ``(group, n_docs, docs_with_emoji, emoji_hits, emoji_per_kchar,
    docs_share)``.
    """
    hits = F.regexp_count(F.col(text_col), F.lit(EMOJI_CLASS))
    base = df.where(F.col(text_col).isNotNull()
                    & F.col(by).isNotNull()) \
             .select(F.col(by).alias("group"), hits.alias("h"),
                     F.col(chars_col).cast("double").alias("c"))
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("h") > 0).cast("long")).alias("docs_with_emoji"),
        F.sum("h").cast("long").alias("emoji_hits"),
        F.round(F.try_divide(F.sum("h") * 1000.0, F.sum("c")),
                round_to).alias("emoji_per_kchar"),
        F.round(F.try_divide(
            F.sum((F.col("h") > 0).cast("long")),
            F.count(F.lit(1))), round_to).alias("docs_share"))


def social_residue(df: DataFrame, *, text_col: str = "text",
                   by: str = "source", chars_col: str = "n_chars",
                   round_to: int = 6) -> DataFrame:
    """Per-group social-platform residue census: hashtags (#tag),
    @-mentions and bare URLs inside the extracted TEXT (markup is
    already stripped, so in-text URLs are share-bait or citation
    residue). High residue marks scraped feeds / comment sections
    masquerading as articles — a different failure mode than the PII
    scan (leakage) or the boilerplate miner (template repetition).

    One projection + one aggregation; rates per kchar use the stored
    length column. Returns per-group rows ``(group, n_docs,
    hashtag_hits, mention_hits, url_hits, docs_with_any,
    residue_per_kchar)``.
    """
    c = F.col(text_col)
    ht = F.regexp_count(c, F.lit(r"(^|\s)#\w{2,}"))
    mn = F.regexp_count(c, F.lit(r"(^|\s)@\w{2,}"))
    ur = F.regexp_count(c, F.lit(r"https?://[^\s]+"))
    base = df.where(c.isNotNull() & F.col(by).isNotNull()) \
             .select(F.col(by).alias("group"), ht.alias("ht"),
                     mn.alias("mn"), ur.alias("ur"),
                     F.col(chars_col).cast("double").alias("cc"))
    any_hit = (F.col("ht") + F.col("mn") + F.col("ur")) > 0
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ht").cast("long").alias("hashtag_hits"),
        F.sum("mn").cast("long").alias("mention_hits"),
        F.sum("ur").cast("long").alias("url_hits"),
        F.sum(any_hit.cast("long")).alias("docs_with_any"),
        F.round(F.try_divide(
            (F.sum("ht") + F.sum("mn") + F.sum("ur")) * 1000.0,
            F.sum("cc")), round_to).alias("residue_per_kchar"))


def gibberish_profile(df: DataFrame, *, text_col: str = "text",
                      by: str = "source",
                      max_consonant_run: int = 7,
                      min_vowel_share: float = 0.2,
                      round_to: int = 6) -> DataFrame:
    """Keyboard-mash / gibberish detector for Latin-script text: the
    two cheapest high-precision signals are (1) the longest
    consonant run — English tops out around 6 ("latchstring");
    "asdfghjkl" runs 9 — and (2) the vowel share among letters,
    which natural Latin-script prose keeps above ~35% and mashing
    drives toward 0. Flags docs breaching either bound; reports
    per-group rates. A different axis than the n-gram logprob
    scores (model-free, no vocabulary) and the repetition gates
    (mash isn't repetitive).

    Pure projection + one aggregation. Returns per-group rows
    ``(group, n_docs, n_flagged, flagged_share, mean_vowel_share,
    max_run_seen)``.
    """
    low = F.lower(F.col(text_col))
    cons_runs = F.regexp_extract_all(
        low, F.lit(r"[bcdfghjklmnpqrstvwxz]+"), 0)
    max_run = F.coalesce(
        F.array_max(F.transform(cons_runs, F.length)), F.lit(0))
    n_vowel = F.regexp_count(low, F.lit(r"[aeiouy]"))
    n_alpha = F.regexp_count(low, F.lit(r"[a-z]"))
    vshare = F.try_divide(n_vowel.cast("double"),
                          n_alpha.cast("double"))
    flagged = ((max_run >= int(max_consonant_run))
               | (vshare < float(min_vowel_share)))
    base = df.where(F.col(text_col).isNotNull()
                    & F.col(by).isNotNull()) \
             .select(F.col(by).alias("group"),
                     max_run.alias("mr"), vshare.alias("vs"),
                     flagged.cast("long").alias("fl"))
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("fl").alias("n_flagged"),
        F.round(F.try_divide(F.sum("fl"), F.count(F.lit(1))),
                round_to).alias("flagged_share"),
        F.round(F.avg("vs"), round_to).alias("mean_vowel_share"),
        F.max("mr").alias("max_run_seen"))


def common_prefix_profile(df: DataFrame, *, text_col: str = "text",
                          by: str = "source", cap: int = 100,
                          round_to: int = 6) -> DataFrame:
    """Per-group longest-common-prefix census — the template-head
    detector: docs scraped through one CMS share a boilerplate
    opening ("Subscribe to our newsletter…"), and the LCP of a SET
    equals the LCP of just its lexicographic MIN and MAX strings —
    so the whole group reduces to one (min, max) aggregation and a
    bounded character comparison (first *cap* chars), never a
    pairwise pass. A long shared prefix over many docs is template
    residue the line-level boilerplate miner can miss when the head
    is a single long line.

    Returns per-group rows ``(group, n_docs, lcp_len, lcp_head)``
    with lcp_len capped at *cap* and lcp_head the first 20 shared
    chars.
    """
    cp = int(cap)
    agg = (df.where(F.col(text_col).isNotNull()
                    & F.col(by).isNotNull())
           .groupBy(F.col(by).alias("group"))
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.min(F.col(text_col)).alias("lo"),
                F.max(F.col(text_col)).alias("hi")))
    pos = F.sequence(F.lit(1), F.lit(cp))
    mismatch = F.filter(
        pos, lambda p: (F.col("lo").substr(p, F.lit(1))
                        != F.col("hi").substr(p, F.lit(1))))
    # first mismatching position − 1, capped; array_min of the
    # mismatch positions (empty → NULL → full cap or shorter string)
    shortest = F.least(F.length("lo"), F.length("hi"), F.lit(cp))
    lcp = F.least(
        F.coalesce(F.array_min(mismatch) - 1, F.lit(cp)), shortest)
    return agg.select(
        "group", "n_docs", lcp.cast("long").alias("lcp_len"),
        F.col("lo").substr(F.lit(1),
                           F.least(lcp, F.lit(20)).cast("int"))
         .alias("lcp_head"))


def hyphenation_artifacts(df: DataFrame, *, text_col: str = "text",
                          by: str = "source",
                          chars_col: str = "n_chars",
                          round_to: int = 6) -> DataFrame:
    """Line-break hyphenation artifact census — the PDF/column-
    extraction fingerprint: "exam-\\nple" style breaks (a hyphen at
    end-of-line continuing into a lowercase letter), bare
    hyphen-terminated lines, and SOFT HYPHENS (U+00AD, invisible in
    most renderers, catastrophic for tokenizers). High rates mean
    the extractor never re-joined wrapped words — fix upstream or
    every affected token is out-of-vocabulary. Distinct from the
    control-character census (soft hyphen is a printable format
    char) and the mojibake stats (encoding is fine, SEGMENTATION
    broke).

    Pure projection + one aggregation; rates per kchar via the
    stored length column. Returns per-group rows ``(group, n_docs,
    hyphen_breaks, dangling_hyphen_lines, soft_hyphens,
    docs_affected, artifacts_per_kchar)``.
    """
    c = F.col(text_col)
    brk = F.regexp_count(c, F.lit(r"[a-z]-\n[a-z]"))
    dangle = F.regexp_count(c, F.lit(r"-\n"))
    soft = F.regexp_count(c, F.lit("\u00ad"))
    base = df.where(c.isNotNull() & F.col(by).isNotNull()) \
             .select(F.col(by).alias("group"), brk.alias("b"),
                     dangle.alias("d"), soft.alias("s"),
                     F.col(chars_col).cast("double").alias("cc"))
    hit = (F.col("b") + F.col("d") + F.col("s")) > 0
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("b").cast("long").alias("hyphen_breaks"),
        F.sum("d").cast("long").alias("dangling_hyphen_lines"),
        F.sum("s").cast("long").alias("soft_hyphens"),
        F.sum(hit.cast("long")).alias("docs_affected"),
        F.round(F.try_divide(
            (F.sum("b") + F.sum("d") + F.sum("s")) * 1000.0,
            F.sum("cc")), round_to).alias("artifacts_per_kchar"))


BIDI_OVERRIDES = "[\u202a-\u202e]"     # LRE RLE PDF LRO RLO
BIDI_ISOLATES = "[\u2066-\u2069]"      # LRI RLI FSI PDI


def bidi_audit(df: DataFrame, *, text_col: str = "text",
               by: str = "source",
               round_to: int = 6) -> DataFrame:
    """Bidirectional-control census - the Trojan Source vector
    (Boucher & Anderson 2021, CVE-2021-42574): RLO/LRE/... overrides
    and LRI/RLI/FSI isolates reorder what a HUMAN sees without
    changing what a parser reads, so a "benign" rendered string can
    carry a different logical payload. Any of these inside scraped
    prose is at best extraction garbage and at worst adversarial;
    UNBALANCED embeddings (an opener with no matching PDF/PDI) are
    the strongest tell and are counted separately. Extends the
    control-character census, which treats these as generic
    invisibles.

    Pure projection + one aggregation. Returns per-group rows
    ``(group, n_docs, n_overrides, n_isolates, docs_affected,
    unbalanced_docs)``.
    """
    t = F.col(text_col)
    n_ov = F.regexp_count(t, F.lit(BIDI_OVERRIDES))
    n_iso = F.regexp_count(t, F.lit(BIDI_ISOLATES))
    opens_e = F.regexp_count(t, F.lit("[\u202a\u202b\u202d\u202e]"))
    closes_e = F.regexp_count(t, F.lit("\u202c"))
    opens_i = F.regexp_count(t, F.lit("[\u2066\u2067\u2068]"))
    closes_i = F.regexp_count(t, F.lit("\u2069"))
    unbal = (opens_e != closes_e) | (opens_i != closes_i)
    base = df.where(t.isNotNull() & F.col(by).isNotNull()) \
             .select(F.col(by).alias("group"), n_ov.alias("ov"),
                     n_iso.alias("iso"), unbal.alias("ub"))
    hit = (F.col("ov") + F.col("iso")) > 0
    return base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ov").cast("long").alias("n_overrides"),
        F.sum("iso").cast("long").alias("n_isolates"),
        F.sum(hit.cast("long")).alias("docs_affected"),
        F.sum(F.col("ub").cast("long")).alias("unbalanced_docs"))


def yule_k(df: DataFrame, *, text_col: str = "text",
           by: str | None = None,
           round_to: int = 6) -> DataFrame:
    """Yule's characteristic K (Yule 1944) per group - the repeat-
    rate constant of vocabulary use:

        K = 10^4 * (sum_t n_t^2 - N) / N^2

    famously LENGTH-INVARIANT (unlike the type-token ratio), so
    sources of different sizes compare honestly: template-churned
    text pushes K up (the same tokens over and over), rich prose
    sits low. The dispersion complement of :func:`vocab_richness`
    (which counts species) and :func:`lexical_concentration` (share
    of the head). One explode + term aggregation. Returns per-group
    rows ``(group, n_tokens, n_types, yule_k)``.
    """
    grp = F.col(by) if by else F.lit("all")
    toks = (df.where(F.col(text_col).isNotNull())
            .select(grp.alias("g"),
                    F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^a-z]+")).alias("t"))
            .where(F.length("t") >= 1))
    tc = toks.groupBy("g", "t").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    a = tc.groupBy("g").agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("types"),
        F.sum(F.col("n") ** 2).alias("n2"))
    k = 1e4 * (F.col("n2") - F.col("nn")) / (F.col("nn") ** 2)
    out = a.select(
        F.col("g").alias("group"),
        F.col("nn").cast("long").alias("n_tokens"),
        F.col("types").cast("long").alias("n_types"),
        F.round(k, round_to).alias("yule_k")).orderBy("group")
    return out


def corpus_scorecard(df: DataFrame, *, text_col: str = "text",
                     id_col: str = "doc_id",
                     chars_col: str = "n_chars",
                     round_to: int = 6) -> DataFrame:
    """ONE-PASS corpus health scorecard - operator fusion as a
    feature: ten hygiene signals that would naively cost ten scans
    (emoji, social residue, gibberish, hyphenation artifacts, PII
    emails, bidi controls, caps share, exact-dup ratio, mean
    length, vowel share) fused into a single projection + a single
    aggregation, which at 10^12 rows is the difference between one
    pass over 100 TB and ten. Each signal matches its dedicated
    operator's definition (same regexes), so the scorecard is a
    cheap sentinel: a moving number says WHICH drill-down operator
    to run, on one scan's budget. Returns one row ``(n_docs,
    mean_chars, dup_fingerprint_ratio, emoji_per_kdoc,
    social_per_kdoc, gibberish_share, hyphen_per_kdoc,
    pii_email_per_kdoc, bidi_per_kdoc, caps_share,
    vowel_share)``.
    """
    t = F.col(text_col)
    low = F.lower(t)
    emoji = F.regexp_count(t, F.lit(EMOJI_CLASS))
    social = (F.regexp_count(t, F.lit(r"(^|\s)#\w{2,}"))
              + F.regexp_count(t, F.lit(r"(^|\s)@\w{2,}"))
              + F.regexp_count(t, F.lit(r"https?://[^\s]+")))
    cons = F.coalesce(F.array_max(F.transform(
        F.regexp_extract_all(low,
                             F.lit(r"[bcdfghjklmnpqrstvwxz]+"), 0),
        F.length)), F.lit(0))
    n_vowel = F.regexp_count(low, F.lit(r"[aeiouy]"))
    n_alpha = F.regexp_count(low, F.lit(r"[a-z]"))
    vshare = F.try_divide(n_vowel.cast("double"),
                          n_alpha.cast("double"))
    gib = ((cons >= 7) | (vshare < 0.2)).cast("long")
    hyph = (F.regexp_count(t, F.lit(r"-\n"))
            + F.regexp_count(t, F.lit("­")))
    pii = F.regexp_count(
        t, F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"))
    bidi = (F.regexp_count(t, F.lit(BIDI_OVERRIDES))
            + F.regexp_count(t, F.lit(BIDI_ISOLATES)))
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]"))
    caps = F.try_divide(n_upper.cast("double"),
                        (n_upper + n_alpha).cast("double"))
    fp = F.md5(t)
    base = df.where(t.isNotNull()).select(
        emoji.alias("em"), social.alias("so"), gib.alias("gb"),
        hyph.alias("hy"), pii.alias("pi"), bidi.alias("bd"),
        caps.alias("cp"), vshare.alias("vs"), fp.alias("fp"),
        F.col(chars_col).cast("double").alias("cc"))
    a = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("cc").alias("mc"),
        F.countDistinct("fp").cast("double").alias("nd"),
        F.sum("em").alias("em"), F.sum("so").alias("so"),
        F.sum("gb").alias("gb"), F.sum("hy").alias("hy"),
        F.sum("pi").alias("pi"), F.sum("bd").alias("bd"),
        F.avg("cp").alias("cp"), F.avg("vs").alias("vs"))
    per_kdoc = lambda c: F.round(F.col(c) * 1000.0 / F.col("n"),
                                 round_to)
    return a.select(
        F.col("n").cast("long").alias("n_docs"),
        F.round("mc", round_to).alias("mean_chars"),
        F.round(F.col("nd") / F.col("n"), round_to)
         .alias("dup_fingerprint_ratio"),
        per_kdoc("em").alias("emoji_per_kdoc"),
        per_kdoc("so").alias("social_per_kdoc"),
        F.round(F.col("gb") / F.col("n"), round_to)
         .alias("gibberish_share"),
        per_kdoc("hy").alias("hyphen_per_kdoc"),
        per_kdoc("pi").alias("pii_email_per_kdoc"),
        per_kdoc("bd").alias("bidi_per_kdoc"),
        F.round("cp", round_to).alias("caps_share"),
        F.round("vs", round_to).alias("vowel_share"))


def isbn13_valid(col: Column) -> Column:
    """ISBN-13 / EAN-13 checksum validator as a pure Column: digits
    weighted 1,3,1,3,... must sum to 0 mod 10. NULL-safe: non-13-
    digit strings are FALSE, not errors. The fold runs inside
    whole-stage codegen (zip_with over a position sequence +
    aggregate) - no UDF, so it validates 10^12 identifiers at scan
    speed; the checksum family sibling of the Luhn PAN scan.
    """
    digits = F.split(col, "")
    ok_shape = col.rlike("^[0-9]{13}$")
    weighted = F.zip_with(
        F.slice(digits, 1, 13),
        F.sequence(F.lit(1), F.lit(13)),
        lambda d, i: d.cast("int")
        * F.when(i % 2 == 1, 1).otherwise(3))
    total = F.aggregate(weighted, F.lit(0),
                        lambda acc, x: acc + x)
    return F.when(ok_shape, total % 10 == 0).otherwise(F.lit(False))


def iban_valid(col: Column) -> Column:
    """IBAN mod-97 checksum validator as a pure Column (ISO 13616):
    move the first 4 chars to the end, map A-Z to 10-35, and the
    resulting digit string must be 1 mod 97. The big-integer modulus
    that usually forces a UDF is a left-to-right fold instead:
    acc = (acc*10 + digit) mod 97 via aggregate over the expanded
    digit array - codegen all the way, engine-portable. Shape gate:
    2 letters + 2 digits + 11-30 alphanumerics.
    """
    up = F.upper(col)
    ok_shape = up.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}$")
    rearranged = F.concat(F.substring(up, 5, 40),
                          F.substring(up, 1, 4))
    chars = F.filter(F.split(rearranged, ""), lambda c: c != "")
    # expand each char to its digit string: '7' -> [7]; 'K' -> [2,0]
    digit_arrays = F.transform(
        chars,
        lambda c: F.when(
            c.rlike("[0-9]"), F.array(c.cast("int")))
        .otherwise(F.array(
            F.floor((F.ascii(c) - 55) / 10).cast("int"),
            F.pmod(F.ascii(c) - 55, F.lit(10)).cast("int"))))
    digits = F.flatten(digit_arrays)
    mod = F.aggregate(
        digits, F.lit(0),
        lambda acc, d: F.pmod(acc * 10 + d.cast("int"), F.lit(97)))
    return F.when(ok_shape, mod == 1).otherwise(F.lit(False))


def gries_dp(df: DataFrame, *, text_col: str = "text",
             part_col: str = "source", k: int = 15,
             min_cf: int = 10, round_to: int = 6) -> DataFrame:
    """Gries' DP (deviation of proportions, 2008): for each of the
    top-*k* corpus terms, DP = ½·Σ_parts |v_i − s_i| where s_i is the
    part's share of ALL tokens and v_i the part's share of THIS
    term's occurrences. DP ≈ 0 means the term is spread exactly like
    the corpus (function word / true boilerplate); DP → 1 means it
    lives in one part (source-specific vocabulary, template residue).
    The ACROSS-parts evenness axis that :func:`term_burstiness`
    (within-doc clumping, cf/df) doesn't see.

    Parts missing a term contribute |0 − s_i| = s_i, folded in
    closed-form as DP = ½·(Σ_present |v−s| + 1 − Σ_present s) — no
    dense term×part cross join. Plan: one (part, token) aggregation
    with map-side combine, a part-sizes broadcast, a TakeOrdered cut
    of the vocabulary. Two uniform-key shuffles.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    pt = (df.where(F.col(text_col).isNotNull()
                   & F.col(part_col).isNotNull())
          .select(F.col(part_col).alias("part"), toks.alias("token"))
          .where(F.col("token") != "")
          .groupBy("part", "token").agg(F.count(F.lit(1)).alias("c")))
    sizes = pt.groupBy("part").agg(F.sum("c").alias("tot"))
    grand = F.sum("tot").over(Window.partitionBy())
    sizes = sizes.select("part", (F.col("tot") / grand).alias("s"))
    terms = (pt.groupBy("token").agg(F.sum("c").alias("cf"))
             .where(F.col("cf") >= int(min_cf))
             .orderBy(F.col("cf").desc(), "token").limit(int(k)))
    joined = (pt.join(F.broadcast(terms), "token")
              .join(F.broadcast(sizes), "part")
              .select("token", "cf",
                      (F.col("c") / F.col("cf")).alias("v"),
                      F.col("s")))
    return (joined.groupBy("token")
            .agg(F.any_value("cf").cast("long").alias("cf"),
                 F.round(0.5 * (F.sum(F.abs(F.col("v") - F.col("s")))
                                + 1.0 - F.sum("s")), round_to)
                 .alias("dp"))
            .orderBy(F.col("cf").desc(), "token"))


# the standard Damm quasigroup (totally anti-symmetric, zero
# diagonal) — public table from Damm's 2004 dissertation
_DAMM_TABLE = [
    [0, 3, 1, 7, 5, 9, 8, 6, 4, 2],
    [7, 0, 9, 2, 1, 5, 4, 8, 6, 3],
    [4, 2, 0, 6, 8, 7, 1, 3, 5, 9],
    [1, 7, 5, 0, 9, 8, 3, 4, 2, 6],
    [6, 1, 2, 3, 0, 4, 5, 9, 7, 8],
    [3, 6, 7, 4, 2, 0, 9, 5, 8, 1],
    [5, 8, 6, 9, 7, 2, 0, 1, 3, 4],
    [8, 9, 4, 5, 3, 6, 2, 0, 1, 7],
    [9, 4, 3, 8, 6, 1, 7, 2, 0, 5],
    [2, 5, 8, 1, 4, 3, 6, 7, 9, 0],
]


def _damm_matrix() -> Column:
    return F.array(*[F.array(*[F.lit(x) for x in row])
                     for row in _DAMM_TABLE])


def damm_interim(col: Column) -> Column:
    """Final Damm interim digit of a digit string — the CHECK DIGIT
    to append (zero diagonal makes appending it close the chain to
    0). Pure codegen fold: element_at(element_at(M, acc), d)."""
    m = _damm_matrix()
    ds = F.filter(F.split(col, ""), lambda x: x != "")
    return F.aggregate(
        ds, F.lit(0),
        lambda acc, d: F.element_at(F.element_at(m, acc + 1),
                                    d.cast("int") + 1))


def damm_valid(col: Column) -> Column:
    """Damm (2004) quasigroup checksum validator as a pure Column:
    fold interim = M[interim][digit] over the digits; valid iff the
    final interim is 0. Unlike Luhn, Damm catches ALL single-digit
    errors AND all adjacent transpositions — the strongest
    single-check-digit scheme over base 10, with no weighting or
    splitting (the fold is one table lookup per digit, fully inside
    whole-stage codegen — 10^12 ids at scan speed). NULL-safe:
    non-digit or empty strings are FALSE, not errors. Family:
    :func:`isbn13_valid` (weighted mod 10), :func:`iban_valid`
    (mod 97), the Luhn PAN scan.
    """
    ok_shape = col.rlike("^[0-9]+$")
    return F.when(ok_shape, damm_interim(col) == 0) \
            .otherwise(F.lit(False))


def soundex_key(col: Column) -> Column:
    """American Soundex code (Russell/Odell, as specified by the US
    National Archives, INCLUDING the H/W rule: same-coded letters
    separated by h/w collapse) built from primitive string ops that
    exist identically in Spark and DuckDB — no engine builtin, so
    the oracle twin runs the byte-identical chain:

      strip non-letters → uppercase → drop H/W after position 1 →
      translate consonant classes to digits (vowels→0) → collapse
      digit runs → drop the first code, drop the 0 separators →
      first letter + first 3 digits padded with 0.

    Canonical vectors (Robert→R163, Ashcraft→A261, Tymczak→T522,
    Pfister→P236, Honeyman→H555) are pinned in tests. NULL/empty or
    letterless input → NULL. The phonetic blocking key for name-ish
    fields: exact-join on the key replaces a quadratic fuzzy match,
    the same blocking role md5 fingerprints play for full texts.
    """
    up = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    u2 = F.concat(F.substring(up, 1, 1),
                  F.regexp_replace(F.substring(up, 2, 1000000),
                                   "[HW]", ""))
    c = F.translate(u2, "BFPVCGJKQSXZDTLMNRAEIOUY",
                    "111122222222334556000000")
    for d in "0123456":
        c = F.regexp_replace(c, d + "+", d)
    rest = F.translate(F.substring(c, 2, 1000000), "0", "")
    key = F.concat(F.substring(u2, 1, 1),
                   F.substring(F.concat(rest, F.lit("000")), 1, 3))
    return F.when(F.length(up) > 0, key)


# per-language dominant-script expectations (letter-class regexes
# valid in BOTH Java regex and RE2 — \x{...} ranges)
SCRIPT_EXPECTATIONS = {
    "en": r"[A-Za-z]",
    "de": r"[A-Za-z]",
    "es": r"[A-Za-z]",
    "fr": r"[A-Za-z]",
    "zh": r"[\x{4E00}-\x{9FFF}]",
    "ru": r"[\x{0400}-\x{04FF}]",
    "ja": r"[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]",
    "ko": r"[\x{AC00}-\x{D7AF}]",
    "ar": r"[\x{0600}-\x{06FF}]",
}


def lang_script_agreement(df: DataFrame, *, text_col: str = "text",
                          lang_col: str = "lang",
                          min_share: float = 0.5,
                          round_to: int = 6) -> DataFrame:
    """Language↔script consistency audit: for each declared lang
    with a known dominant script (SCRIPT_EXPECTATIONS), the share
    of the document's LETTERS that belong to that script; a doc
    AGREES when the share ≥ *min_share*. A lang='zh' row whose text
    is pure Latin is a mislabeled row the referential allowed-lang
    check can't see — label vs content, the validation rule
    bridging lang-ID (text_lang_id) and the script census
    (script_mix). Langs without an expectation are reported with
    NULL shares (counted, never judged).

    Letters = [letter-ish] via the union of all expectation classes
    plus ASCII; pure regexp_count, one aggregation per lang.
    Returns ``(lang, n, n_agree, agree_share, mean_script_share)``.
    """
    letters = (r"[A-Za-z\x{4E00}-\x{9FFF}\x{0400}-\x{04FF}"
               r"\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}"
               r"\x{0600}-\x{06FF}]")
    t = F.col(text_col)
    total = F.regexp_count(t, F.lit(letters))
    expect = None
    for lang, pat in sorted(SCRIPT_EXPECTATIONS.items()):
        cnt = F.regexp_count(t, F.lit(pat))
        expect = (F.when(F.col(lang_col) == lang, cnt)
                  if expect is None
                  else expect.when(F.col(lang_col) == lang, cnt))
    share = F.when(total > 0, expect / total)
    agree = (share >= float(min_share)).cast("int")
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(lang_col).isNotNull())
            .select(F.col(lang_col).alias("lang"),
                    share.alias("sh"), agree.alias("ag")))
    return (base.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("ag").cast("long").alias("n_agree"),
                 F.round(F.avg(F.col("ag").cast("double")),
                         round_to).alias("agree_share"),
                 F.round(F.avg("sh"), round_to)
                 .alias("mean_script_share"))
            .orderBy("lang"))


def index_gap_bits(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 15,
                   min_df: int = 5,
                   round_to: int = 6) -> DataFrame:
    """Inverted-index postings-size estimate under Elias-gamma gap
    coding: per top-*k* term, postings = sorted containing doc ids,
    gaps g (first posting codes id+1), and each gap costs
    2·⌊log₂ g⌋ + 1 bits. ⌊log₂⌋ is EXACT — the length of the
    binary-string rendering minus one, never a float log — so both
    engines bill identical bits. ``bits_per_posting`` against the
    64-bit raw id shows the compression a delta-coded index buys —
    frequent terms (dense postings, tiny gaps) compress hardest,
    exactly why search engines gap-code.

    Same two-shuffle vocabulary shape as every term operator; the
    per-term lag window rides (token, doc) pairs. Returns ``(token,
    df, total_bits, bits_per_posting)`` for the top k by df.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    pairs = (df.where(F.col(text_col).isNotNull()
                      & F.col(id_col).isNotNull())
             .select(F.col(id_col).alias("id"), toks.alias("token"))
             .where(F.col("token") != "")
             .distinct())
    top = (pairs.groupBy("token")
           .agg(F.count(F.lit(1)).alias("df"))
           .where(F.col("df") >= int(min_df))
           .orderBy(F.col("df").desc(), "token").limit(int(k)))
    p = pairs.join(F.broadcast(top), "token")
    w = Window.partitionBy("token").orderBy("id")
    gap = F.coalesce(F.col("id") - F.lag("id").over(w),
                     F.col("id") + 1)
    bits = 2 * (F.length(F.bin(gap)) - 1) + 1
    return (p.select("token", "df", bits.alias("b"))
            .groupBy("token")
            .agg(F.any_value("df").cast("long").alias("df"),
                 F.sum("b").cast("long").alias("total_bits"))
            .withColumn("bits_per_posting",
                        F.round(F.col("total_bits") / F.col("df"),
                                round_to))
            .orderBy(F.col("df").desc(), "token"))


def vocab_knee(df: DataFrame, *, text_col: str = "text",
               k: int = 200, round_to: int = 6) -> DataFrame:
    """Kneedle knee of the token frequency-rank curve (Satopää
    2011, simplified for a decreasing convex curve): normalize rank
    and frequency to [0,1] over the top-*k* terms and take the
    point FURTHEST BELOW the (0,1)→(1,0) diagonal — gap
    g = (1 − x̂) − ŷ, ties to the smallest rank. The knee is where
    the head vocabulary ends: everything left of it is the
    stopword/boilerplate head a prune list should cover
    (vocab_prune's budget, made parameter-free). One vocabulary
    aggregation + windows over k rows. Returns one row
    ``(knee_rank, token, cf, gap)``.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    top = (df.where(F.col(text_col).isNotNull())
           .select(toks.alias("token"))
           .where(F.col("token") != "")
           .groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
           .orderBy(F.col("cf").desc(), "token").limit(int(k)))
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.col("cf").desc(), "token"))
    t = top.select("token", "cf", rn.alias("r"))
    wall = Window.partitionBy()
    kk = F.max("r").over(wall).cast("double")
    cmax = F.max("cf").over(wall).cast("double")
    cmin = F.min("cf").over(wall).cast("double")
    xn = (F.col("r") - 1) / (kk - 1)
    yn = (F.col("cf") - cmin) / (cmax - cmin)
    gap = (1.0 - xn) - yn
    scored = t.select("token", "cf", "r", gap.alias("gap"))
    # pick on the ROUNDED gap: an exactly-linear curve has every
    # gap 0 up to float dust, and the tie must break on rank
    pick = F.row_number().over(
        Window.partitionBy().orderBy(
            F.round(F.col("gap"), 6).desc(), "r"))
    return (scored.withColumn("__p", pick).where(F.col("__p") == 1)
            .select(F.col("r").cast("long").alias("knee_rank"),
                    "token", F.col("cf").cast("long").alias("cf"),
                    F.round("gap", round_to).alias("gap")))


def typography_census(df: DataFrame, *, text_col: str = "text",
                      by: str = "source",
                      round_to: int = 6) -> DataFrame:
    """Typography provenance census per group: rates per 1000 chars
    of straight vs curly quotes, apostrophe forms, backticks,
    ellipsis character vs three-dot runs, em/en dashes. Word
    processors emit curly+ellipsis, terminals/code straight+dots,
    OCR mixes them mid-document — so the MIX identifies the
    production pipeline behind a source and flags style-inconsistent
    (likely scraped-and-stitched) corpora; the typographic sibling
    of the mojibake/entity/control-char encoding audits.

    Pure regexp_count over one aggregation. Returns per group
    ``(group, n_docs, straight_quotes_per_kc, curly_quotes_per_kc,
    backticks_per_kc, ellipsis_char_per_kc, dot_runs_per_kc,
    dashes_per_kc)``.
    """
    t = F.col(text_col)
    counts = {
        "straight": r"""["']""",
        "curly": "[“”‘’]",
        "backtick": r"`",
        "ellipsis": "…",
        "dotrun": r"\.\.\.",
        "dash": "[–—]",
    }
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length(t)).alias("__chars")]
    for k, pat in counts.items():
        aggs.append(F.sum(F.regexp_count(t, F.lit(pat)))
                    .alias(f"__{k}"))
    g = (df.where(F.col(text_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(F.col(by).alias("group"))
         .agg(*aggs))
    per_kc = lambda c: F.round(F.col(c) * 1000.0 / F.col("__chars"),
                               round_to)
    return (g.select(
        "group", "n_docs",
        per_kc("__straight").alias("straight_quotes_per_kc"),
        per_kc("__curly").alias("curly_quotes_per_kc"),
        per_kc("__backtick").alias("backticks_per_kc"),
        per_kc("__ellipsis").alias("ellipsis_char_per_kc"),
        per_kc("__dotrun").alias("dot_runs_per_kc"),
        per_kc("__dash").alias("dashes_per_kc"))
        .orderBy("group"))


def ams_f2(df: DataFrame, *, text_col: str = "text",
           estimators: int = 16,
           round_to: int = 6) -> DataFrame:
    """AMS second-frequency-moment sketch audit (Alon–Matias–Szegedy
    1996): F2 = Σ_token count² — the self-join size / skew number —
    estimated by *estimators* independent ±1 hash projections
    (Z_k = Σ s_k(token)·count, estimate = mean of Z_k²) and compared
    against the EXACT F2 from the same pass. The classic streaming
    sketch with its error measured rather than trusted: F2 is what
    prices every token self-join (pair counts = Σc², the quantity
    the max_hash_docs/mega-bucket caps bound), and the AMS form is
    what you'd keep when the vocabulary itself no longer fits.

    Signs come from md5(k:token) parity — deterministic in both
    engines. One vocabulary aggregation; the estimator sums ride
    the vocab table. Returns ``(n_tokens, n_distinct, f2_exact,
    f2_ams, rel_error)``.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    vocab = (df.where(F.col(text_col).isNotNull())
             .select(toks.alias("token"))
             .where(F.col("token") != "")
             .groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    sign = lambda k: (
        F.when(F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{k}:"), F.col("token"))),
            1, 8), 16, 10).cast("long") % 2 == 0, 1)
        .otherwise(-1))
    aggs = [F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).cast("long")
            .alias("f2_exact")]
    for k in range(int(estimators)):
        aggs.append(F.sum(sign(k) * F.col("c")).alias(f"__z{k}"))
    wide = vocab.agg(*aggs)
    zs = F.array(*[F.col(f"__z{k}")
                   for k in range(int(estimators))])
    est = (F.aggregate(zs, F.lit(0.0),
                       lambda a, z: a + (z * z).cast("double"))
           / F.lit(float(estimators)))
    return wide.select(
        "n_tokens", "n_distinct", "f2_exact",
        F.round(est, round_to).alias("f2_ams"),
        F.round(F.abs(est - F.col("f2_exact"))
                / F.col("f2_exact"), round_to).alias("rel_error"))


def good_toulmin(df: DataFrame, *, text_col: str = "text",
                 split=None, id_col: str = "doc_id",
                 max_k: int = 12,
                 round_to: int = 6) -> DataFrame:
    """Good–Toulmin vocabulary extrapolation (1956; Efron–Thisted's
    "how many words did Shakespeare know"), SELF-VALIDATED: fit on
    the *split* half of the corpus, predict how many NEW distinct
    tokens the other half will contribute —

        Δ̂ = V₁ − V₂ + V₃ − … (alternating frequency-of-frequency
        sum, truncated at max_k)

    — and report the ACTUAL new-token count from the held-out half
    next to the prediction. The unseen-mass question behind crawl
    budgeting ("is more data buying new vocabulary or more of the
    same"), with its own error bar measured instead of assumed;
    Good-Turing (singleton mass) and Heaps (power-law fit) are the
    neighboring estimators.

    Two vocabulary aggregations + a frequency-of-frequency fold.
    Returns ``(v_fit, delta_hat, delta_actual, rel_error)``.
    """
    sp = split if split is not None \
        else F.pmod(F.col(id_col), F.lit(2)) == 0
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    base = (df.where(F.col(text_col).isNotNull())
            .select(F.when(sp, 0).otherwise(1).alias("h"),
                    toks.alias("token"))
            .where(F.col("token") != ""))
    fitv = (base.where(F.col("h") == 0)
            .groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    fof = fitv.groupBy("c").agg(F.count(F.lit(1)).alias("vk"))
    sign = F.when(F.pmod(F.col("c"), F.lit(2)) == 1, 1).otherwise(-1)
    pred = (fof.where(F.col("c") <= int(max_k))
            .agg(F.coalesce(F.sum(sign * F.col("vk")), F.lit(0))
                 .cast("long").alias("delta_hat")))
    v_fit = fitv.agg(F.count(F.lit(1)).cast("long").alias("v_fit"))
    held = (base.where(F.col("h") == 1).select("token").distinct()
            .join(fitv.select("token"), "token", "left_anti")
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("delta_actual")))
    t = v_fit.crossJoin(F.broadcast(pred)) \
             .crossJoin(F.broadcast(held))
    rel = F.when(F.col("delta_actual") > 0,
                 F.abs(F.col("delta_hat").cast("double")
                       - F.col("delta_actual"))
                 / F.col("delta_actual"))
    return t.select("v_fit", "delta_hat", "delta_actual",
                    F.round(rel, round_to).alias("rel_error"))


def greedy_source_cover(df: DataFrame, *, text_col: str = "text",
                        by: str = "source", k: int = 4,
                        round_to: int = 6) -> DataFrame:
    """Greedy maximum-coverage source selection (the classic
    (1−1/e)-approximate submodular greedy): pick *k* sources, each
    round taking the source adding the most NOT-YET-COVERED distinct
    tokens — "which crawl sources buy the most vocabulary
    diversity", the curation question temperature/DSIR weighting
    answers by reweighting and this answers by SELECTION. Ties
    break to the lexicographically smaller source.

    Coverage universe = distinct token BIGRAMS (unigram vocabularies
    saturate on template-heavy corpora; bigram sets still
    discriminate). k tiny rounds over the (source, bigram) presence
    table (the pick — one row — is collected per round; the covered
    set stays distributed as an anti-join). Returns ``(step,
    source, gain, covered_total)`` — gains are non-increasing, the
    submodularity signature.
    """
    t = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                 lambda x: x != "")
    n = F.size(t)
    bigrams = F.explode(F.zip_with(
        F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
        lambda a_, b_: F.concat(a_, F.lit(" "), b_)))
    pres = (df.where(F.col(text_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("s"), bigrams.alias("token"))
            .distinct().persist())
    covered = None
    out = []
    total = 0
    for step in range(int(k)):
        remaining = pres if covered is None else \
            pres.join(covered, "token", "left_anti")
        gains = (remaining.groupBy("s")
                 .agg(F.count(F.lit(1)).alias("g"))
                 .orderBy(F.col("g").desc(), "s").limit(1)
                 .collect())
        if not gains:
            break
        pick, gain = gains[0]["s"], int(gains[0]["g"])
        total += gain
        out.append((step, pick, gain, total))
        new_cov = pres.where(F.col("s") == pick) \
                      .select("token").distinct()
        covered = new_cov if covered is None else \
            covered.unionByName(new_cov).distinct() \
                   .localCheckpoint(eager=True)
    pres.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "step int, source string, gain long, covered_total long") \
        .select(F.col("step").cast("long").alias("step"),
                "source", "gain", "covered_total").orderBy("step")


def nb_langid_eval(df: DataFrame, *, text_col: str = "text",
                   label_col: str = "lang", split=None,
                   id_col: str = "doc_id", alpha: float = 1.0,
                   round_to: int = 6) -> DataFrame:
    """TRAIN-AND-EVALUATE naive-Bayes language ID, entirely in the
    engine: token likelihoods with add-α smoothing are fit on the
    *split* half, held-out docs are classified by
    argmax_L [ln P(L) + Σ_tokens ln P(token|L)], and the verdict is
    per-true-lang accuracy. Where text_lang_id is a fixed marker
    heuristic and lang_id_prf scores it, THIS is a trained model —
    the fit/predict/evaluate loop expressed as joins and windows,
    no ML library. Unseen tokens get the smoothed α/(N_L + αV)
    mass. Argmax ties break to the alphabetically first lang.

    Plan: one vocabulary aggregation per lang (train), one
    token-join + per-doc log-sum (score), one argmax window.
    Returns per true lang ``(lang, n_docs, n_correct, accuracy)``.
    """
    import math
    sp = split if split is not None \
        else F.pmod(F.col(id_col), F.lit(2)) == 0
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(label_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(label_col).alias("y"),
                    F.when(sp, 0).otherwise(1).alias("h"),
                    toks.alias("token"))
            .where(F.col("token") != ""))
    train = base.where(F.col("h") == 0)
    vocab_n = train.select("token").distinct().count()
    a = float(alpha)
    counts = (train.groupBy("y", "token")
              .agg(F.count(F.lit(1)).alias("c")))
    totals = (train.groupBy("y")
              .agg(F.count(F.lit(1)).alias("nl"),
                   F.count_distinct("id").alias("dl")))
    docs_total = train.select("id").distinct().count()
    langs = totals.select(
        "y", "nl",
        (F.log(F.col("dl") / F.lit(float(docs_total))))
        .alias("prior"),
        F.log(a / (F.col("nl") + a * vocab_n)).alias("unseen")) \
        .persist()
    lik = (counts.join(langs.select("y", "nl"), "y")
           .select("y", "token",
                   F.log((F.col("c") + a)
                         / (F.col("nl") + a * vocab_n))
                   .alias("lp")))
    test = base.where(F.col("h") == 1)
    # score every (doc, candidate lang): known-token mass via the
    # likelihood join, unseen mass via the per-lang constant
    cand = test.select("id", "y", "token") \
               .crossJoin(F.broadcast(langs.select(
                   F.col("y").alias("cl"), "prior", "unseen")))
    scored = (cand.join(lik.select(F.col("y").alias("cl"),
                                   "token", "lp"),
                        ["cl", "token"], "left")
              .groupBy("id", "y", "cl")
              .agg((F.any_value("prior")
                    + F.sum(F.coalesce(F.col("lp"),
                                       F.col("unseen"))))
                   .alias("score")))
    # argmax on the ROUNDED score: identical-distribution langs tie
    # up to float-sum dust, and the tie must break on `cl` the same
    # way in both engines
    pick = F.row_number().over(
        Window.partitionBy("id").orderBy(
            F.round(F.col("score"), 6).desc(), "cl"))
    pred = scored.withColumn("__p", pick).where(F.col("__p") == 1)
    out = (pred.groupBy("y")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum((F.col("cl") == F.col("y")).cast("long"))
                .alias("n_correct"))
           .withColumn("accuracy",
                       F.round(F.col("n_correct")
                               / F.col("n_docs").cast("double"),
                               round_to))
           .select(F.col("y").alias("lang"), "n_docs", "n_correct",
                   "accuracy")
           .orderBy("lang"))
    out._zoi_persisted = [langs]
    out._zoi_predictions = pred.select("id", "y", "cl")
    return out


def nb_langid_confusion(df: DataFrame, *, text_col: str = "text",
                        label_col: str = "lang", split=None,
                        id_col: str = "doc_id",
                        alpha: float = 1.0,
                        round_to: int = 6) -> DataFrame:
    """Full confusion matrix of the trained naive-Bayes language-ID
    (:func:`nb_langid_eval`'s fit/predict loop, cells instead of
    the per-lang accuracy roll-up): WHICH langs the model confuses
    — the asymmetric confusion structure (es→fr but not fr→es)
    that drives targeted training-data additions; the trained-model
    sibling of the marker-heuristic label_confusability matrix.
    Returns ``(true_lang, pred_lang, n, row_share)`` for observed
    cells, ordered by (true_lang, pred_lang).
    """
    ev = nb_langid_eval(df, text_col=text_col, label_col=label_col,
                        split=split, id_col=id_col, alpha=alpha,
                        round_to=round_to)
    pred = ev._zoi_predictions
    cells = (pred.groupBy("y", "cl")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = Window.partitionBy("y")
    out = cells.select(
        F.col("y").alias("true_lang"),
        F.col("cl").alias("pred_lang"), "n",
        F.round(F.col("n") / F.sum("n").over(tot), round_to)
        .alias("row_share")).orderBy("true_lang", "pred_lang")
    out._zoi_persisted = getattr(ev, "_zoi_persisted", [])
    return out


def rank_turbulence(df: DataFrame, *, text_col: str = "text",
                    split=None, id_col: str = "doc_id",
                    top: int = 10, min_cf: int = 5,
                    round_to: int = 6) -> DataFrame:
    """Rank-turbulence movers (the α=1 core of Dodds 2020's
    rank-turbulence divergence): rank the vocabulary by frequency
    in each *split* half and surface the terms with the largest
    |1/r₁ − 1/r₂| — the principled "what words MOVED" leaderboard
    (a term going 1→3 matters, 1000→3000 doesn't), where RBO
    (rbo_terms_halves) scores the overlap and this names the
    movers. Terms absent from a half take 1/r = 0 (rank ∞).

    Two vocabulary aggregations + doubled-rank windows on the
    frequency tables. Returns the ``top`` rows ``(token, r1, r2,
    divergence)`` by divergence desc, ties to token.
    """
    sp = split if split is not None \
        else F.pmod(F.col(id_col), F.lit(2)) == 0
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.when(sp, 0).otherwise(1).alias("h"),
                    toks.alias("token"))
            .where(F.col("token") != ""))
    def ranks(h):
        vocab = (base.where(F.col("h") == h)
                 .groupBy("token")
                 .agg(F.count(F.lit(1)).alias("cf"))
                 .where(F.col("cf") >= int(min_cf)))
        r = F.row_number().over(
            Window.partitionBy().orderBy(F.col("cf").desc(),
                                         "token"))
        return vocab.select("token", r.alias(f"r{h + 1}"))
    j = ranks(0).join(ranks(1), "token", "full_outer")
    inv = lambda c: F.when(F.col(c).isNotNull(),
                           1.0 / F.col(c)).otherwise(0.0)
    div = F.abs(inv("r1") - inv("r2"))
    return (j.select("token", "r1", "r2",
                     F.round(div, round_to).alias("divergence"))
            .orderBy(F.col("divergence").desc(), "token")
            .limit(int(top)))


def symspell_typo_pairs(df: DataFrame, *, text_col: str = "text",
                        rare_max: int = 2, freq_min: int = 50,
                        top: int = 15,
                        round_to: int = 6) -> DataFrame:
    """SymSpell-style typo detection (Garbe's delete-1 algorithm):
    a RARE token (cf ≤ rare_max) that is within edit distance 1 of
    a FREQUENT token (cf ≥ freq_min) is almost certainly its typo/
    OCR variant. The trick that makes it scale: generate each
    token's DELETE-1 variants (plus itself) and equi-join on the
    variant — two tokens are within edit distance 1 iff they share
    a variant — so the plan is explode + one hash join, never a
    pairwise edit-distance scan.

    Returns the ``top`` rows ``(rare_token, frequent_token,
    rare_cf, freq_cf, ratio)`` by freq_cf desc then names — the
    normalization map a cleanup pass applies.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    vocab = (df.where(F.col(text_col).isNotNull())
             .select(toks.alias("token"))
             .where(F.col("token") != "")
             .groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
             .persist())
    dels = lambda: F.array_union(
        F.array(F.col("token")),
        F.transform(
            F.sequence(F.lit(1), F.length("token")),
            lambda i: F.concat(
                F.col("token").substr(F.lit(1), i - 1),
                F.col("token").substr(i + 1, F.lit(1000000)))))
    rare = (vocab.where(F.col("cf") <= int(rare_max))
            .select(F.col("token").alias("rt"),
                    F.col("cf").alias("rcf"),
                    F.explode(dels()).alias("v")))
    freq = (vocab.where(F.col("cf") >= int(freq_min))
            .select(F.col("token").alias("ft"),
                    F.col("cf").alias("fcf"),
                    F.explode(dels()).alias("v")))
    pairs = (rare.join(freq, "v")
             .where(F.col("rt") != F.col("ft"))
             .groupBy("rt", "ft")
             .agg(F.any_value("rcf").alias("rcf"),
                  F.any_value("fcf").alias("fcf")))
    out = (pairs.select(
        F.col("rt").alias("rare_token"),
        F.col("ft").alias("frequent_token"),
        F.col("rcf").cast("long").alias("rare_cf"),
        F.col("fcf").cast("long").alias("freq_cf"),
        F.round(F.col("fcf") / F.col("rcf").cast("double"),
                round_to).alias("ratio"))
        .orderBy(F.col("freq_cf").desc(), "rare_token",
                 "frequent_token")
        .limit(int(top)))
    out._zoi_persisted = [vocab]
    return out


def casing_variants(df: DataFrame, *, text_col: str = "text",
                    top: int = 10, min_total: int = 5,
                    round_to: int = 6) -> DataFrame:
    """Case-normalization candidates: tokens (split on whitespace,
    case PRESERVED) whose lowercase form occurs under ≥ 2 distinct
    casings — 'Apple'/'apple'/'APPLE' — ranked by total frequency,
    reporting the dominant casing and its share. The decision input
    for whether lowercasing loses information (NER-ish corpora) or
    merges noise (shouting/OCR); the case-sensitivity sibling of
    the typography census.

    One vocabulary aggregation on the raw tokens, one re-aggregate
    on the lowercase key. Returns ``(token_lower, n_casings,
    total_cf, dominant, dominant_share)`` top rows by total desc.
    """
    raw = F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
    vocab = (df.where(F.col(text_col).isNotNull())
             .select(raw.alias("t"))
             .where(F.col("t") != "")
             .groupBy("t").agg(F.count(F.lit(1)).alias("cf")))
    low = vocab.select(F.lower("t").alias("k"), "t", "cf")
    per = (low.groupBy("k")
           .agg(F.count(F.lit(1)).cast("long").alias("n_casings"),
                F.sum("cf").cast("long").alias("total_cf"),
                F.max_by("t", F.struct(F.col("cf"), F.col("t")))
                .alias("dominant"),
                F.max("cf").alias("dom_cf")))
    return (per.where((F.col("n_casings") >= 2)
                      & (F.col("total_cf") >= int(min_total)))
            .select(F.col("k").alias("token_lower"), "n_casings",
                    "total_cf", "dominant",
                    F.round(F.col("dom_cf")
                            / F.col("total_cf").cast("double"),
                            round_to).alias("dominant_share"))
            .orderBy(F.col("total_cf").desc(), "token_lower")
            .limit(int(top)))


def richness_indices(df: DataFrame, *, text_col: str = "text",
                     by: str = "lang",
                     round_to: int = 6) -> DataFrame:
    """The classical stylometric richness battery per group —
    Sichel's S = V₂/V, Honoré's R = 100·ln N / (1 − V₁/V),
    Margalef d = (V−1)/ln N, Menhinick = V/√N, and Pielou's
    evenness J = H/ln V — five one-number vocabulary-structure
    summaries with DIFFERENT sample-size sensitivities, read as a
    panel (authorship/stylometry practice): Chao1
    (vocab_richness) asks how much is unseen, these ask how the
    SEEN vocabulary is shaped. Honoré is NULL when every type is a
    hapax, Pielou when V = 1.

    One (group, token) aggregation, one frequency fold. Returns
    ``(group, n_tokens, v, v1, v2, sichel_s, honore_r, margalef,
    menhinick, pielou_j)``.
    """
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " "))
    tt = (df.where(F.col(text_col).isNotNull()
                   & F.col(by).isNotNull())
          .select(F.col(by).alias("g"), toks.alias("token"))
          .where(F.col("token") != "")
          .groupBy("g", "token").agg(F.count(F.lit(1)).alias("c")))
    wall = Window.partitionBy("g")
    n = F.sum("c").over(wall)
    t = tt.select("g", "c", n.alias("n"))
    agg = t.groupBy("g").agg(
        F.any_value("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum((F.col("c") == 1).cast("long")).alias("v1"),
        F.sum((F.col("c") == 2).cast("long")).alias("v2"),
        (-F.sum((F.col("c") / F.col("n"))
                * F.log(F.col("c") / F.col("n")))).alias("h"))
    nn = F.col("n_tokens").cast("double")
    v = F.col("v").cast("double")
    v1 = F.col("v1").cast("double")
    return agg.select(
        F.col("g").alias("group"), "n_tokens", "v", "v1", "v2",
        F.round(F.col("v2") / v, round_to).alias("sichel_s"),
        F.round(F.when(v1 < v,
                       100.0 * F.log(nn) / (1.0 - v1 / v)),
                round_to).alias("honore_r"),
        F.round((v - 1) / F.log(nn), round_to).alias("margalef"),
        F.round(v / F.sqrt(nn), round_to).alias("menhinick"),
        F.round(F.when(F.col("v") > 1,
                       F.col("h") / F.log(v)), round_to)
         .alias("pielou_j")).orderBy("group")


def cli_ari(df: DataFrame, *, text_col: str = "text",
            by: str = "lang", round_to: int = 6) -> DataFrame:
    """Coleman–Liau and Automated Readability Index per group —
    the two SYLLABLE-FREE readability formulas (letters, words,
    sentences only), deliberately complementing Flesch
    (readability_profile), whose vowel-group syllable proxy is the
    weakest link on web text:

        CLI = 0.0588·(100L/W) − 0.296·(100S/W) − 15.8
        ARI = 4.71·(L/W) + 0.5·(W/S) − 21.43

    Per-doc scores are pure functions of three integer counts
    (sentence runs floored at 1); docs with zero words are
    excluded. Returns ``(group, n_docs, cli, ari)``.
    """
    t = F.col(text_col)
    letters = F.regexp_count(t, F.lit("[A-Za-z]"))
    words = F.size(F.filter(
        F.split(normalize_text(t), " "), lambda x: x != ""))
    sents = F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1))
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("g"),
                    letters.cast("double").alias("l"),
                    words.cast("double").alias("w"),
                    sents.cast("double").alias("s"))
            .where(F.col("w") > 0))
    cli = (0.0588 * (100.0 * F.col("l") / F.col("w"))
           - 0.296 * (100.0 * F.col("s") / F.col("w")) - 15.8)
    ari = (4.71 * (F.col("l") / F.col("w"))
           + 0.5 * (F.col("w") / F.col("s")) - 21.43)
    return (base.select("g", cli.alias("cli"), ari.alias("ari"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.round(F.avg("cli"), round_to).alias("cli"),
                 F.round(F.avg("ari"), round_to).alias("ari"))
            .select(F.col("g").alias("group"), "n_docs", "cli",
                    "ari")
            .orderBy("group"))
