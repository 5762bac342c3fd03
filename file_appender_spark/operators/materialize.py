"""Materialization seam shared by the operators that cut lineage with
checkpoints (r12 verdict item: promote the reliable-checkpoint escape
hatch from a docstring note to a parameter).

``localCheckpoint`` stores blocks on executors: cheap (no DFS write),
but an executor loss mid-query FAILS the job instead of recomputing
lineage. That trade is right for interactive operator calls (rerun on
failure) and is every call site's default. A scheduled 100 TB pipeline
that needs within-job recovery passes ``reliable=True`` to get the
RELIABLE ``.checkpoint()`` spelling — blocks written to the
SparkContext's checkpoint directory (HDFS/DFS in production), at the
cost of that write. The checkpoint dir is deployment configuration
(``spark.sparkContext.setCheckpointDir``), so the helper refuses
loudly when it is missing rather than letting Spark raise a deep
mid-job error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_frame(
    df: DataFrame, *, eager: bool = True, reliable: bool = False
) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint(eager)`` by default,
    the reliable DFS ``checkpoint(eager)`` when ``reliable=True``
    (requires a configured checkpoint dir — raises ValueError with
    the fix otherwise). Same values either way; only the block
    placement (executor memory/disk vs checkpoint dir) and the
    fault-tolerance story differ."""
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise ValueError(
            "reliable=True needs a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<DFS path>) first "
            "(the reliable spelling writes checkpoint blocks there so "
            "an executor loss recovers instead of failing the job)"
        )
    return df.checkpoint(eager=eager)
