"""Line-level boilerplate removal — the CCNet/RefinedWeb-style
cleanup a web-scale training corpus runs before dedup: lines that
repeat across MANY documents (navigation chrome, cookie banners,
subscribe prompts, license footers) are stripped; document-specific
lines survive with their original order.

Semantics: a line's document frequency is the number of DISTINCT
documents containing it (within-doc repeats count once for df but
every copy is removed when the line is boilerplate). Documents whose
every line is boilerplate are emitted with empty text, never dropped
— downstream quality gates decide their fate.

Scale: one explode + one line-keyed aggregate (map-side combined;
line df is vocabulary-bounded) + one equi-join back + one per-doc
reassembly aggregate. No windows over raw rows, no driver
materialization; at 100 TB the df table is the only broadcast-or-
shuffle decision and AQE makes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def strip_boilerplate(
    docs: DataFrame,
    max_df: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Returns ``(id_col, clean_text, n_removed)``: ``text_col``
    split on ``sep``, lines with document frequency > ``max_df``
    removed, remainder rejoined in original order; ``n_removed`` is
    the count of removed line OCCURRENCES in that document."""
    if max_df < 1:
        raise ValueError(f"max_df must be >= 1, got {max_df}")
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(sep))).alias("_pos", "_line"),
    )
    df_tab = (
        lines.groupBy("_line")
        .agg(F.count_distinct(id_col).alias("_ldf"))
        .select("_line", "_ldf")
    )
    tagged = lines.join(df_tab, "_line")
    kept = tagged.filter(F.col("_ldf") <= max_df)
    # reassemble kept lines in order; docs stripped to nothing come
    # back via the join so they emit empty text rather than vanishing
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("_n_kept"),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), F.lit(sep))).alias("_n_lines"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n_lines") - F.coalesce("_n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )
