"""Text analysis over document tables — all JVM-side Column expressions
(no Python UDFs in the hot path; SURVEY.md 'UDFs are the slow path').

Functions compose over a ``text`` column; see __spark_entry__.py for the
oracle-checked query forms over /root/testdata documents.
"""

from __future__ import annotations

WORD_SPLIT_RE = r"[^\p{L}\p{N}]+"  # unicode letters+digits; java regex (Spark side)

# small public stopword lists (top function words) for n-gram-free language ID
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "it", "was", "for",
           "on", "with", "as", "his", "they", "at", "be", "this", "have", "from"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "als", "auch", "es", "an", "werden", "aus",
           "er", "zu"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "en", "un", "une",
           "du", "que", "qui", "dans", "pour", "pas", "sur", "au", "avec", "ne"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "es", "del", "se", "no", "por", "con", "para", "su", "al", "lo"],
    "it": ["il", "la", "di", "che", "e", "un", "una", "per", "in", "del",
           "non", "sono", "con", "si", "da", "le", "come", "dei", "al", "più"],
}


def tokens(col):
    """Lowercased word tokens (split on non-alphanumerics, empties removed)."""
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), WORD_SPLIT_RE), lambda t: t != "")


def token_count(col):
    """Whitespace-token count (BPE-ish proxy: words + punctuation runs)."""
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+")))


def char_ngrams(col, n: int = 5):
    """Distinct character n-grams (shingles) — dedup building block."""
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    count = F.greatest(F.length(c) - F.lit(n - 1), F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), count), lambda i: c.substr(i, F.lit(n)))
    return F.when(count > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def word_ngrams(col, n: int = 3):
    """Distinct word n-grams joined by single spaces."""
    from pyspark.sql import functions as F
    toks = tokens(col)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), cnt - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), F.lit(n))))
    return F.when(cnt > 0, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def quality_score(col, round_digits=6):
    """Heuristic document quality in [0,1]: balanced length, alpha ratio,
    moderate word length, low symbol noise (C4/Gopher-style rule scoring
    re-expressed as Column arithmetic).  ``round_digits=None`` returns the
    raw double (useful when the caller needs deterministic cross-engine
    comparison: decimal ROUNDING of a knife-edge double differs between
    engines by one ulp, ``floor`` of the same product does not)."""
    from pyspark.sql import functions as F
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z\p{L}]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    spaces = F.length(F.regexp_replace(c, r"[^\s]", "")).cast("double")
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    avg_word = F.when(n_tok > 0, (length - spaces) / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(length > 0, alpha / length).otherwise(F.lit(0.0))
    digit_ratio = F.when(length > 0, digits / length).otherwise(F.lit(0.0))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(1.0)).otherwise(F.lit(0.4))
    raw = (F.lit(0.35) * alpha_ratio
           + F.lit(0.25) * len_score
           + F.lit(0.25) * word_score
           + F.lit(0.15) * (F.lit(1.0) - F.least(digit_ratio * 4, F.lit(1.0))))
    return raw if round_digits is None else F.round(raw, round_digits)


def lang_id(col, languages=None):
    """Stopword-overlap language ID: argmax over per-language distinct
    stopword hits (≥1 hit required, else 'und')."""
    from pyspark.sql import functions as F
    langs = languages or list(STOPWORDS)
    toks = tokens(col)
    scores = {lang: F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))) for lang in langs}
    best = None
    for lang in langs:
        s = scores[lang]
        cond_better = None
        for other in langs:
            if other == lang:
                continue
            # strictly-greater wins; ties resolve in `langs` order
            c = s > scores[other] if langs.index(other) < langs.index(lang) \
                else s >= scores[other]
            cond_better = c if cond_better is None else (cond_better & c)
        case = F.when((s >= 1) & cond_better, F.lit(lang))
        best = case if best is None else best.when((s >= 1) & cond_better, F.lit(lang))
    return best.otherwise(F.lit("und"))


def fingerprint(col):
    """Deterministic 64-bit document fingerprint: xxhash64 of the sorted
    distinct token set (OpenRefine-style key collision fingerprinting)."""
    from pyspark.sql import functions as F
    return F.xxhash64(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def doc_frequency(df, text_col: str = "text", id_col: str = "doc_id"):
    """(token, df) document-frequency table over the corpus — the vocab
    statistic tokenizer/stopword builders consume.  explode + distinct +
    groupBy count: one shuffle on the token, map-side combined."""
    from pyspark.sql import functions as F
    return (df.select(F.col(id_col).alias("__id"),
                      F.explode(F.array_distinct(tokens(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("doc_freq")))


def analyze(df, text_col: str = "text"):
    """One-pass text-analysis projection over a documents DataFrame."""
    from pyspark.sql import functions as F
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


# -- PII scrubbing (regex redaction, pure Column algebra) --------------------

PII_PATTERNS = {
    # ordered: emails first (their dotted hosts would otherwise be nibbled
    # by the ip pattern), then dotted quads, then long digit runs
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "longnum": r"\d{9,}",
}


def pii_scrub(df, text_col: str = "text", id_col: str = "doc_id"):
    """Redact common PII shapes (emails, dotted-quad IPs, >=9-digit
    number runs — SSNs/phones/card numbers) with ``<KIND>`` placeholders
    and count the hits per document.  Pure JVM Column algebra
    (regexp_count + chained regexp_replace): zero shuffles, zero UDFs —
    the per-row cost is the regex scan, which whole-stage codegen
    pipelines with the parquet read.  The patterns avoid lookarounds and
    backreferences so RE2-family engines (DuckDB, Trino) compute the
    identical redaction for cross-engine checks."""
    from pyspark.sql import functions as F

    scrubbed = F.col(text_col)
    counts = []
    for kind, pat in PII_PATTERNS.items():
        counts.append(
            F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return df.select(F.col(id_col), *counts,
                     scrubbed.alias("clean_text"))
