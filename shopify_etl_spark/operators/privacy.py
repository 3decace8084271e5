"""PII scrubbing / anonymization operators.

A corpus headed for training must not carry raw identifiers. Three
standard transforms, all pure JVM column expressions (regex + hash in
the scan stage — at 100 TB this layer is a free map-side projection, no
shuffle, no Python):

* **pseudonymize** — salted-hash pseudonyms: stable (same identifier →
  same pseudonym, so joins across scrubbed tables still work) and
  irreversible without the salt.
* **mask_pattern** — regex redaction (digits, emails, phone shapes →
  a replacement glyph/tag).
* **generalize_numeric** — k-anonymity-style banding of precise numeric
  attributes.

The reference pipeline ships raw customer identity end-to-end
(`incremental_loaders.py` keeps email/name columns); this layer is part
of the beyond-reference training-data surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Redaction patterns kept to syntax shared by Java regex (Spark) and
#: RE2 (DuckDB oracle): character classes, bounded repetition, anchors.
DIGITS = "[0-9]"
EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONEISH = "[0-9]{2,4}[- ][0-9]{2,4}[- ][0-9]{2,4}"


def pseudonym(col: Column | str, salt: str = "pii-v1", prefix: str = "anon") -> Column:
    """Salted-hash pseudonym: ``prefix-`` + first 12 hex chars of
    md5(salt || value). Deterministic per (salt, value) — referential
    integrity survives scrubbing; 48 bits keeps collisions negligible
    below ~10^6 distinct identities (use more hex chars beyond that)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.lit(prefix + "-"),
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 12),
    )


def mask_pattern(col: Column | str, pattern: str = DIGITS, repl: str = "#") -> Column:
    """Redact every match of ``pattern`` (global replace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, repl)


def generalize_numeric(col: Column | str, width: int) -> Column:
    """Band a numeric column to multiples of ``width`` (k-anonymity
    generalization). floor semantics: negatives band downward."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c / width) * width).cast("long")


def scrub(
    df: DataFrame,
    pseudonym_cols: list[str] | None = None,
    mask_cols: dict[str, str] | None = None,
    band_cols: dict[str, int] | None = None,
    salt: str = "pii-v1",
) -> DataFrame:
    """Apply the three transforms in place over named columns."""
    out = df
    for c in pseudonym_cols or []:
        out = out.withColumn(c, pseudonym(c, salt))
    for c, pat in (mask_cols or {}).items():
        out = out.withColumn(c, mask_pattern(c, pat))
    for c, w in (band_cols or {}).items():
        out = out.withColumn(c, generalize_numeric(c, w))
    return out
