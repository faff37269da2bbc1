"""Reference-parity scalar cleaning functions (SURVEY §2.8, C1-C6).

The reference cleans scraped text with pandas string ops before writing
';'-CSV.  Each helper here is a pure Column expression (JVM-side, inside
whole-stage codegen -- no Python UDFs) that reproduces the reference
semantics exactly:

- C1 ``replace_semicolons``  — ';' -> ','  (reference final DAG 322-323, 447-448)
- C2 ``strip_non_ascii``     — drop non-ASCII bytes (reference 326-328, 451-453)
- C3 ``strip_control_seqs``  — two passes: literal backslash sequences
  ("\\t" as two characters) first, then real tab/newline/CR
  (reference 327-329, 452-454 -- pandas replace with two regex patterns)
- C5 ``iso_to_slash_date``   — ISO-8601 'yyyy-MM-ddTHH:mm:ssZ' -> 'yyyy/MM/dd'
  string (reference 185-186, 310-311; the warehouse stores dates as strings)
- C6 ``run_date_key``        — file-key date 'yyyy_MM_dd' (reference 36-39)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def replace_semicolons(c: Column | str) -> Column:
    """C1: delimiter safety for the ';'-CSV sink. translate is cheaper than
    regexp for single-char substitution."""
    return F.translate(_col(c), ";", ",")


def strip_non_ascii(c: Column | str) -> Column:
    """C2: ascii-encode/ignore equivalent — remove every char > 0x7F."""
    return F.regexp_replace(_col(c), r"[^\x00-\x7F]", "")


def strip_control_seqs(c: Column | str) -> Column:
    """C3: the reference runs TWO regex passes — first removing literal
    two-character sequences ``\\t`` ``\\n`` ``\\r``, then real control chars."""
    first = F.regexp_replace(_col(c), r"\\t|\\n|\\r", "")
    return F.regexp_replace(first, r"[\t\n\r]", "")


def clean_text(c: Column | str) -> Column:
    """Full reference cleaning chain in its original order: C1 -> C2 -> C3."""
    return strip_control_seqs(strip_non_ascii(replace_semicolons(c)))


def iso_to_slash_date(c: Column | str) -> Column:
    """C5: '2021-05-07T13:00:00Z' -> '2021/05/07' (string, like the reference)."""
    ts = F.to_timestamp(_col(c), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return F.date_format(ts, "yyyy/MM/dd")


def slash_date_to_date(c: Column | str) -> Column:
    """Parse the warehouse's 'yyyy/MM/dd' string back to a DateType."""
    return F.to_date(_col(c), "yyyy/MM/dd")


def run_date_key(date_col: Column | str | None = None) -> Column:
    """C6: 'yyyy_MM_dd' partition/file key; defaults to current_date."""
    base = F.current_date() if date_col is None else _col(date_col)
    return F.date_format(base, "yyyy_MM_dd")


def demojize_udf():
    """C4: emoji -> ':name:' text (present but commented out in the
    reference, F:181-182, 305-307).  Returns an Arrow-batched pandas UDF
    when the optional ``emoji`` package is importable, else None — the
    pipeline simply skips the step, like the reference's commented code.
    (Python UDF is acceptable here: demojize has no JVM equivalent and
    it is OFF by default.)"""
    try:
        import emoji
    except ImportError:
        return None
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _demojize(s: pd.Series) -> pd.Series:
        return s.map(lambda v: emoji.demojize(v) if v is not None else None)

    return _demojize
