"""Sinks (SURVEY.md §2.1 S4, S6).

The reference persists every result as single-file JSON-lines via
``df.coalesce(1).write.json(dir, mode='overwrite')`` (identical helpers at
``spark/jobs/cases_time_analysis.py:309-314`` et al.). We keep that contract
but make the single-file squeeze explicit and optional: at 100 TB a
``coalesce(1)`` is a serial bottleneck, so the default writes partitioned
output and ``single_file=True`` is the opt-in small-result path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_json_single_file(df: DataFrame, path: str, single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
