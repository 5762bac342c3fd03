"""PII detection and scrubbing for text corpora — the curation stage
between quality filtering and shard writing in a training-data
pipeline (q69 masks digit runs in structured columns; this handles
free-text documents with typed PII classes).

All detection/masking is JVM-side ``regexp_count`` /
``regexp_replace`` — no Python in the row loop — so it scans at
whole-stage-codegen speed and composes with any frame. Patterns are
intentionally high-precision (anchored formats) rather than
high-recall NER: this is the deterministic regex tier every pipeline
runs FIRST; an ML-based second tier would slot in as a Pandas-UDF
stage like operators/multimodal.py's codec seam.

The driver corpus contains no planted PII, so evidence is
fixture-based (tests/test_pii.py plants every class); the q69 family
covers the structured-column case on real driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# class -> (detection regex, replacement token). Order matters for
# scrubbing: longer/more-specific classes first so e.g. an email is
# not partially eaten by the digit-run rule.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])\b",
        "[IP]",
    ),
    # ssn/card before phone: the looser phone shape would otherwise
    # eat the front of a 16-digit card group during scrubbing
    "ssn_like": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    "card_like": (r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b", "[CARD]"),
    # no leading \b: a word boundary cannot sit between a space and
    # "(" (both non-word), which would unmatch "(020) ..." forms
    "phone": (
        r"(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{2,4}\)[-. ]?|[0-9]{2,4}[-. ])"
        r"[0-9]{3,4}[-. ][0-9]{3,4}\b",
        "[PHONE]",
    ),
    "long_digit_run": (r"[0-9]{9,}", "[NUM]"),
}


def pii_profile(
    df: DataFrame, id_col: str, text_col: str, classes: list[str] | None = None
) -> DataFrame:
    """Per-document PII hit counts: one ``n_<class>`` column per
    pattern plus ``n_pii_total`` — the report that decides whether a
    source is scrub-and-keep or drop-entirely. Single scan, all
    counts in one projection."""
    names = classes or list(PII_PATTERNS)
    for c in names:
        if c not in PII_PATTERNS:
            raise ValueError(f"unknown PII class {c!r}; known: {list(PII_PATTERNS)}")
    counts = [
        F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[c][0])).alias(f"n_{c}")
        for c in names
    ]
    out = df.select(F.col(id_col), *counts)
    total = sum((F.col(f"n_{c}") for c in names[1:]), F.col(f"n_{names[0]}"))
    return out.withColumn("n_pii_total", total.cast("long"))


def pii_scrub(
    text: Column | str, classes: list[str] | None = None
) -> Column:
    """Masked text expression: each detected span replaced by its
    class token, applied in declaration order (specific classes
    before the digit-run catch-all). Pure column expression — use in
    any select/withColumn; deterministic, idempotent (tokens contain
    no pattern characters)."""
    names = classes or list(PII_PATTERNS)
    col = F.col(text) if isinstance(text, str) else text
    for c in names:
        pat, tok = PII_PATTERNS[c]
        col = F.regexp_replace(col, pat, tok)
    return col
