"""Text-analysis column expressions for training-data pipelines.

All built from JVM-side `pyspark.sql.functions` (whole-stage codegen; no
Python in the hot path). Every expression here has a documented DuckDB-SQL
equivalent (used by the driver's oracle harness) built from the same
portable primitives: length/replace/split/md5/integer arithmetic — verified
bit-identical across engines.

These are the reference's "scalar function surface" slot (SURVEY.md §2.8 —
the reference has almost none; the north rule's training-data pipeline ops
land here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic stopword set for the language-id heuristic / quality score
STOPWORDS_EN = ["the", "a", "and", "of", "to"]


def token_count(text: Column) -> Column:
    """Number of non-empty whitespace-separated tokens (BIGINT).
    DuckDB twin: len(list_filter(string_split(text,' '), x -> x <> ''))."""
    return F.size(F.filter(F.split(text, " "), lambda x: x != "")).cast("long")


BPE_TOKEN_RE = r"\w+|[^\w\s]"  # word pieces + isolated punctuation


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: runs of word chars plus single non-space
    punctuation — the pre-tokenization split most BPE vocabularies apply.
    DuckDB twin: len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) (both
    engines treat \\w as ASCII [0-9A-Za-z_])."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def token_chars(text: Column) -> Column:
    """Total characters across tokens (= non-space characters).
    DuckDB twin: length(replace(text, ' ', ''))."""
    return F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("long")


def occurrences(text: Column, needle: str) -> Column:
    """Occurrence count of a literal substring (BIGINT), portable via
    (len(s) - len(replace(s, needle, ''))) / len(needle)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def stopword_hits(text: Column) -> Column:
    """Total count of ' <stopword> ' occurrences (space-delimited, BIGINT)."""
    total = F.lit(0).cast("long")
    for w in STOPWORDS_EN:
        total = total + occurrences(text, f" {w} ")
    return total


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: stopword density + length band.
    Deterministic double arithmetic on integer inputs (portable)."""
    toks = token_count(text)
    hits = stopword_hits(text)
    density = F.when(toks > 0, hits.cast("double") / toks.cast("double")).otherwise(F.lit(0.0))
    lengthy = F.when((toks >= 10) & (toks <= 10000), F.lit(0.5)).otherwise(F.lit(0.0))
    return F.round(F.least(F.lit(1.0), density * 5.0 + lengthy), 4)


def lang_id(text: Column) -> Column:
    """N-gram-free language heuristic: 'en' if English stopwords hit,
    else 'unknown'. (Real n-gram models need corpora not in this sandbox;
    the *operator shape* — pure column expression, no UDF — is the point.)"""
    return F.when(stopword_hits(text) > 0, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint_md5(text: Column) -> Column:
    """Exact-dup fingerprint: md5 hex of the normalized text (portable:
    Spark md5 == DuckDB md5, verified)."""
    return F.md5(F.encode(F.trim(text), "utf-8"))


def portable_token_hash(tok: Column, p: int = 2147483647) -> Column:
    """Token -> integer in [0, p): first 15 hex chars of md5, base-16 ->
    decimal, mod p. Identical in DuckDB:
    CAST(('0x' || substr(md5(tok),1,15)) AS BIGINT) % p  (verified equal)."""
    return (F.conv(F.substring(F.md5(F.encode(tok, "utf-8")), 1, 15), 16, 10).cast("long") % p)
