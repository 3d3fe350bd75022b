"""Text analysis operators — tokenize, stopword filter, language-ID,
quality scoring, fingerprinting.

Covers the reference's word pipeline (missing ``count_words``, contract at
/root/reference/tests/scraper_test.py:21-27 + stopword filtering per
tests/worker_test.py:123-126) plus the training-data-pipeline text ops.

DESIGN RULE: every function here is a pure Catalyst column expression, and
each has an exact ANSI-SQL twin runnable by DuckDB (see __spark_entry__.py
oracle_sql) — the shared deterministic 60-bit hash is
``int(md5(s)[:15], 16)`` which both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact english stopword list (classic top-N; frozen for conformance —
# the reference used nltk's list, unavailable offline).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with", "this", "but", "they", "have",
    "had", "what", "when", "where", "who", "which", "why", "how",
)

# Frozen copy of the standard NLTK english stopword list (public corpus,
# 179 words) — the reference filtered words through nltk's list
# (tests/worker_test.py:123-126). Report queries accept stopwords="nltk"
# for byte-parity with the reference on real corpora; the compact list
# above stays the conformance default (the synthetic corpus vocab and the
# DuckDB oracles are frozen against it).
NLTK_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren",
    "weren't", "won", "won't", "wouldn", "wouldn't",
)

STOPWORD_SETS: dict[str, tuple[str, ...]] = {
    "default": STOPWORDS,
    "nltk": NLTK_STOPWORDS,
}

# tiny per-language marker lists for the n-gram/stopword lang-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es": ("el", "los", "las", "es", "una", "en", "que", "por", "para", "con"),
}

TOKEN_SPLIT_REGEX = r"[^a-z0-9]+"


def md5_int60(s: Column) -> Column:
    """Deterministic 60-bit non-negative hash shared with the DuckDB oracle:
    Spark  : cast(conv(substring(md5(s),1,15),16,10) as bigint)
    DuckDB : ('0x' || substr(md5(s),1,15))::BIGINT
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    """Lowercased alnum tokens (array<string>)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_REGEX), lambda t: t != ""
    )


def content_tokens(text: Column, stopwords: str = "default") -> Column:
    """Tokens minus stopwords — the reference's word-count input
    (tests/worker_test.py:123-126 filters nltk stopwords). Pass
    stopwords="nltk" for the frozen nltk-parity list."""
    sw = F.array(*[F.lit(w) for w in STOPWORD_SETS[stopwords]])
    return F.filter(tokens(text), lambda t: ~F.array_contains(sw, t))


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (BPE-ish proxy: alnum runs)."""
    return F.size(tokens(text))


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams (shingles) of ``toks``.

    Documents with fewer than ``n`` tokens yield an EMPTY array:
    ``sequence(1, size-n+1)`` would be descending (``[1, 0]``) there and
    ``element_at(toks, 0)`` throws under ANSI semantics, so the short
    case is gated out explicitly rather than clamped.
    """
    idx = F.when(
        F.size(toks) >= F.lit(n),
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k)) for k in range(n)]
        ),
    )


def char_shingle_fingerprint(text: Column, k: int = 8) -> Column:
    """Document fingerprint: min 60-bit hash over all k-char shingles
    (winnowing-lite / rolling-hash analog; deterministic, SQL-twinned)."""
    t = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: md5_int60(F.substring(t, i, k)))
    return F.array_min(hashes)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: most marker-word hits wins; ties and
    zero-hit rows → 'und'. Deterministic tie-break: lexicographic lang code."""
    toks = tokens(text)
    scores = []
    for code in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append((code, hits))
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # first (lexicographically) language achieving the max, scanned in
    # reverse so earlier codes override later ones in the when-chain
    for code, s in reversed(scores):
        out = F.when((best > 0) & (s == best), F.lit(code)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score (frozen formula):
    0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio),
    rounded to 6 decimals. All components SQL-twinned."""
    n_tok = token_count(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(tokens(text), lambda t: F.array_contains(sw, t)))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0)
    n_punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    punct_ratio = F.when(
        F.length(text) > 0, n_punct.cast("double") / F.length(text)
    ).otherwise(0.0)
    len_score = F.least(F.lit(1.0), n_tok.cast("double") / 100.0)
    return F.round(0.4 * len_score + 0.3 * stop_ratio + 0.3 * (1.0 - punct_ratio), 6)
