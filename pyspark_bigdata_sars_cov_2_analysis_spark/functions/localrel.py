"""JVM-native local-literal frames (optimization r15, guide §4).

``spark.createDataFrame(rows, ddl)`` plans as a Python-RDD scan
(``Scan ExistingRDD`` over pickled/Arrow batches), NOT a LocalRelation:
every JOB that executes it — a sidecar write, a count, a join feeding a
broadcast — ships the rows through a spawned Python worker.
``collect()`` alone short-circuits, which is why the cost hides until a
tiny metadata frame sits inside a hot ingest loop. Measured on this
host at local[32]: a 1-row ``createDataFrame(...).write.parquet()`` is
5-7 s (Python worker spawn per write job) vs 0.2-0.4 s for the same
write from a JVM-literal source — and the checkpoint/sidecar writers
run one such write per micro-batch.

:func:`local_frame` builds the same frame as
``inline(array(struct(lit(..)..)..))`` over ``range(1)`` — a pure-JVM
``LocalTableScan`` with no Python boundary, on a laptop or on a
1000-executor cluster. Intended for SMALL literal frames (sidecars,
parameter rows, band/dimension tables); data-bearing frames should come
from real sources.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, _parse_datatype_string


def local_frame(
    spark: SparkSession, rows: Sequence[tuple], ddl: str
) -> DataFrame:
    """``spark.createDataFrame(rows, ddl)`` minus the Python-RDD plan:
    returns an identical-schema, identical-row DataFrame backed by a JVM
    LocalRelation. ``rows`` are tuples of plain literals (None allowed;
    each value is ``lit(v).cast(field_type)``). An empty ``rows`` yields
    the empty frame with the DDL's schema, like the original."""
    schema = _parse_datatype_string(ddl)
    fields = schema.fields
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fields]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, fields, strict=True)
            ]
        )
        for row in rows
    ]
    # cast the array to the DDL's struct type: literal-derived fields
    # would otherwise plan as non-nullable, and this helper must be a
    # schema-identical drop-in for createDataFrame (all-nullable)
    arr = F.array(*structs).cast(ArrayType(schema))
    return spark.range(1).select(F.inline(arr))
