"""Column standardization (reference parity: SURVEY §2.2 P1–P4).

The reference cleans every string attribute with lowercase + strip
non-alphanumerics and replaces nulls with the sentinel ``"null_"`` so nulls
block together (reference: python/arc/utils/cleaning_utils.py:34-47,
python/arc/autolinker/autolinker.py:138,287). All operations here are
single-pass narrow projections — no shuffle, fully codegen'd, and the
regexp/lower expressions stay JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_SENTINEL = "null_"
_CLEAN_PATTERN = r"[^A-Za-z0-9 ]+"


def string_columns(df: DataFrame) -> list[str]:
    """Names of StringType columns (cleaning applies only to strings,
    reference cleaning_utils.py:36-37)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]


def clean_columns(
    df: DataFrame,
    attribute_columns: Sequence[str] | None = None,
    *,
    lowercase: bool = True,
    strip_non_alnum: bool = True,
) -> DataFrame:
    """Lowercase + strip non-alphanumerics on string attribute columns.

    Reference parity: cleaning_utils.py:42-45 applies
    ``lower(regexp_replace(col, '[^A-Za-z0-9 ]+', ''))`` to every string
    column. Non-string columns pass through untouched.
    """
    if attribute_columns is None:
        attribute_columns = string_columns(df)
    str_cols = set(string_columns(df))
    exprs = []
    for name in df.columns:
        if name in attribute_columns and name in str_cols:
            col = F.col(name)
            if strip_non_alnum:
                col = F.regexp_replace(col, _CLEAN_PATTERN, "")
            if lowercase:
                col = F.lower(col)
            exprs.append(col.alias(name))
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def null_sentinel(
    df: DataFrame, columns: Sequence[str] | None = None, sentinel: str = NULL_SENTINEL
) -> DataFrame:
    """Replace nulls in string columns with the blocking sentinel.

    Reference parity: autolinker.py:138/:287 ``fillna("null_")`` — only
    string columns are affected, which makes null values equi-join each
    other during blocking (an intentional recall/precision trade-off,
    SURVEY §7 watch list).
    """
    cols = list(columns) if columns is not None else string_columns(df)
    cols = [c for c in cols if c in set(string_columns(df))]
    return df.fillna(sentinel, subset=cols) if cols else df


def ensure_unique_id(
    df: DataFrame, id_column: str = "unique_id", *, deterministic: bool = False
) -> DataFrame:
    """Add a string row id if absent (reference autolinker.py:929-939).

    The reference uses ``monotonically_increasing_id()`` which is
    partition-layout dependent. Default keeps that (zero-shuffle, scales to
    any size); ``deterministic=True`` instead derives the id from a
    ``row_number`` over a whole-row hash ordering — reproducible across
    runs, at the cost of one global sort (use for tests / oracle checks,
    not for 100 TB inputs).
    """
    if id_column in df.columns:
        return df
    if not deterministic:
        return df.withColumn(id_column, F.monotonically_increasing_id().cast("string"))
    w = Window.orderBy(F.xxhash64(*[F.col(c) for c in df.columns]), *df.columns)
    return df.withColumn(id_column, F.row_number().over(w).cast("string"))
