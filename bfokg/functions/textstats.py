"""Text-analysis functions for corpus pipelines — all pure built-in column
expressions (JVM-side, codegen), each designed to be exactly replicable in
ANSI SQL so the DuckDB oracle can verify them bit-for-bit.

- token counting: whitespace tokens + a BPE-ish subword estimate
- language ID: stopword-hit heuristic over small per-language wordlists
- quality scoring: length/alpha-ratio/stopword-ratio composite
- fingerprinting: md5 of normalized text (content-defined identity)
- repetition signals (Gopher-style, Rae et al. 2021 §A1.1): duplicate-line
  fraction as a pure projection; word n-grams for the top-n-gram
  aggregate in ``operators.repetition``
- boilerplate counts: URLs / e-mail addresses per document
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "für", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "para", "con", "una"],
}


def tokens_col(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    # regexp_extract_all, not split: the regexp_* expressions cache their
    # compiled pattern while StringSplit recompiles per call (round 6,
    # measured 30× on the keyword tokenizer). Identical token sequence:
    # the matches of the positive class == the non-empty split fields.
    return F.regexp_extract_all(F.lower(c), F.lit(r"[a-zA-Z0-9']+"), F.lit(0))


def token_count_col(text_col) -> Column:
    """Whitespace-ish token count."""
    return F.size(tokens_col(text_col))


def subword_estimate_col(text_col, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token estimate: ceil(chars/4) bounded below by word count —
    the standard cheap proxy when no tokenizer ships with the cluster."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.greatest(
        F.ceil(F.length(c) / chars_per_token).cast("int"), token_count_col(text_col)
    )


def stopword_hits_col(text_col, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens_col(text_col)), words))


def lang_id_col(text_col) -> Column:
    """argmax over per-language stopword hits; ties → 'en' then alphabetical.
    Unknown (zero hits anywhere) → 'unknown'."""
    langs = sorted(STOPWORDS, key=lambda l: (l != "en", l))
    scored = [(lang, stopword_hits_col(text_col, lang)) for lang in langs]
    best_score = F.greatest(*[s for _, s in scored])
    pick = F.lit("unknown")
    for lang, score in reversed(scored):
        pick = F.when(score == best_score, F.lit(lang)).otherwise(pick)
    return F.when(best_score > 0, pick).otherwise(F.lit("unknown"))


def alpha_ratio_col(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    alpha = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    return alpha / F.greatest(F.length(c), F.lit(1))


def quality_score_col(text_col) -> Column:
    """Composite in [0,1]: 0.4·alpha_ratio + 0.3·stopword signal +
    0.3·length signal (saturating at 200 tokens). Heuristic but exact and
    SQL-replicable."""
    n_tok = token_count_col(text_col)
    stop_ratio = stopword_hits_col(text_col, "en") / F.lit(10.0)
    len_signal = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    return (
        F.lit(0.4) * alpha_ratio_col(text_col)
        + F.lit(0.3) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.3) * len_signal
    )


#: portable between Java regex and DuckDB (RE2-style) — keep them simple
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def lines_col(text_col) -> Column:
    """Non-empty trimmed lines of the document. (extract_all of the
    non-newline runs ≡ split on newline minus empty fields, with the
    cached-pattern advantage — see tokens_col.)"""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.filter(
        F.transform(
            F.regexp_extract_all(c, F.lit(r"[^\n]+"), F.lit(0)),
            lambda l: F.trim(l),
        ),
        lambda l: l != "",
    )


def dup_line_fraction_col(text_col) -> Column:
    """Gopher-style duplicate-line fraction: 1 − distinct/total over
    non-empty trimmed lines (0.0 when the doc has no lines). Templated /
    boilerplate-heavy documents score high. Pure projection — per-row
    array ops, no shuffle; line count is bounded by document size, so the
    per-row cost is linear in the doc."""
    lines = lines_col(text_col)
    n = F.size(lines)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(lines)) / n
    ).otherwise(F.lit(0.0))


def url_count_col(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.regexp_count(c, F.lit(URL_RE)).cast("long")


def email_count_col(text_col) -> Column:
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    return F.regexp_count(c, F.lit(EMAIL_RE)).cast("long")


IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact_pii_col(
    text_col,
    url_token: str = "<URL>",
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
) -> Column:
    """Replace URLs, e-mail addresses, and IPv4 literals with sentinel
    tokens — the standard pre-training scrub. URL first: a URL may embed
    ``user:pass@host`` which would otherwise half-match the e-mail
    pattern. Pure chained ``regexp_replace`` (JVM, codegen); the same
    three patterns run identically under DuckDB's RE2 (pinned in
    tests/test_corpus_ops.py)."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    out = F.regexp_replace(c, URL_RE, url_token)
    out = F.regexp_replace(out, EMAIL_RE, email_token)
    return F.regexp_replace(out, IPV4_RE, ip_token)


def word_ngrams_col(text_col, n: int = 2) -> Column:
    """Word n-grams (space-joined) over ``tokens_col``; empty array when
    the doc has fewer than ``n`` tokens. The CASE guard matters: Spark's
    ``sequence(1, 0)`` counts DOWN (default step −1), so the short-doc
    branch must never evaluate the sequence."""
    toks = tokens_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def fingerprint_col(text_col) -> Column:
    """Content fingerprint: md5 of normalized text. Identical in DuckDB:
    md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')))."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), r" +", " ")
    )
    return F.md5(norm)
