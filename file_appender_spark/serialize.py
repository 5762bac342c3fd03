"""Record -> delimited-text-line serialization.

Reproduces the reference's ``transform()`` rules exactly
(FileAppenderSink.java:125-147, SURVEY.md §1.4):

1. fields iterate in INPUT-schema order (:127);
2. the first field is always appended (value if non-null, else
   nothing) and is NOT checked against the output schema — the
   faithful first-field quirk (:133-136);
3. later fields are skipped when an output schema is set and lacks
   the field (:139-141); otherwise separator + value, null rendered
   as empty string (:142-144);
4. values render via toString (:135,144) — here ``CAST(x AS STRING)``;
5. no quoting/escaping — naive join, not RFC-4180 CSV (§1.4.6);
6. the line terminator (\\n, UTF-8) is applied by the writer
   (AppendOutputFormat.java:217-221), not the serializer.

``concat_ws`` alone is NOT sufficient (it skips nulls instead of
rendering them empty), hence the explicit coalesce-per-field build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rendered(field: T.StructField) -> Column:
    """CAST to string with null -> '' (Java StringBuilder.append of a
    non-null value; null branch appends nothing)."""
    return F.coalesce(F.col(field.name).cast("string"), F.lit(""))


def line_expr(
    input_schema: T.StructType,
    output_schema: T.StructType | None = None,
    separator: str = ",",
    faithful_first_field: bool = True,
) -> Column:
    """Build the line expression for one record.

    ``faithful_first_field=True`` reproduces the reference quirk: the
    first input field is emitted even if the output schema omits it
    (FileAppenderSink.java:133-141 checks the output schema only for
    fields after the first). ``False`` is the sane variant: the output
    schema filters every field.
    """
    out_names = (
        None if output_schema is None else {f.name for f in output_schema.fields}
    )
    parts: list[Column] = []
    first = True
    for field in input_schema.fields:
        if first:
            include = faithful_first_field or out_names is None or field.name in out_names
            if include:
                parts.append(_rendered(field))
            first = False
            continue
        if out_names is not None and field.name not in out_names:
            continue
        if parts:
            parts.append(F.lit(separator))
        parts.append(_rendered(field))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def serialized(
    df: DataFrame,
    output_schema: T.StructType | None = None,
    separator: str = ",",
    faithful_first_field: bool = True,
    column_name: str = "line",
) -> DataFrame:
    """Project a DataFrame down to its single serialized line column."""
    return df.select(
        line_expr(df.schema, output_schema, separator, faithful_first_field).alias(
            column_name
        )
    )
