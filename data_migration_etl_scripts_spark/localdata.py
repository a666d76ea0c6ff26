"""Driver-local rows -> DataFrame without the PythonRDD boundary.

``spark.createDataFrame(list_of_tuples, schema)`` parallelizes the
rows into ``defaultParallelism`` PythonRDD partitions: the first
action launches one Python worker PER PARTITION (serially, under the
``SparkEnv.createPythonWorker`` monitor) just to unpickle a handful
of tuples. Thread dumps of the r12 profiling sessions showed whole
32-task stages parked on that monitor with ~zero JVM CPU — ~0.6 s of
blocked wall per call site per query, multiplied across GD rounds /
codebooks / media fixtures (guide §4: eliminate the Python boundary).

:func:`local_df` routes the same rows through pandas + Arrow instead:
the conversion to Arrow batches happens once in the DRIVER Python
process and the JVM reads the batches natively — no executor-side
Python workers, ~3x faster per call even warm. Falls back to the
classic path for anything Arrow cannot represent (measured call sites
are longs/doubles/strings/binary/arrays, all supported).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession, rows: Iterable[Sequence], schema
) -> DataFrame:
    """Small driver-side relation from ``rows`` with ``schema`` (DDL
    string or StructType). Arrow-backed: no Python workers at action
    time. Semantically identical to ``spark.createDataFrame(rows,
    schema)`` for Arrow-representable types; falls back to it
    otherwise."""
    rows = list(rows)
    if not rows:
        # empty relations never hit the PythonRDD path in a costly way
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
        from pyspark.sql.types import StructType

        st = (
            schema
            if isinstance(schema, StructType)
            else StructType.fromDDL(schema)
        )
        pdf = pd.DataFrame(
            [tuple(r) for r in rows], columns=st.fieldNames(), dtype=object
        )
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, schema)
