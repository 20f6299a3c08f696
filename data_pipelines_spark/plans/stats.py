"""Table/column statistics hooks for cost-based optimization.

Path-based parquet reads give Catalyst only a size-on-disk estimate;
catalog tables with ANALYZE'd statistics give it row counts and
per-column NDV/null/min/max, which is what the cost-based optimizer
(`spark.sql.cbo.enabled`) needs to pick join orders and build sides AT
PLAN TIME — before AQE's runtime stats exist. At 100 TB that
plan-time choice matters: a wrong initial build side materializes a
huge exchange before AQE can re-plan it, while a dimension table whose
stats say "tiny" broadcasts from the first stage.

The reference pipeline re-materializes its datasets on a schedule
(`data_pipelines/jobs.py:24-29`); the natural hook is to ANALYZE right
after each materialization so downstream consumers always plan against
fresh statistics — :func:`analyze_dataset` is that hook (register the
parquet dir as an external catalog table + compute table and column
stats in one call), :func:`table_stats` reads the recorded numbers
back for assertions and monitoring.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def analyze_dataset(
    spark: SparkSession,
    path: str,
    table_name: str,
    columns: Sequence[str] | None = None,
    replace: bool = True,
) -> dict:
    """Register the parquet dataset at ``path`` as an EXTERNAL catalog
    table named ``table_name`` and compute its statistics: table-level
    (row count, size) plus per-column NDV/null/min/max for ``columns``
    (default: every top-level atomic column — nested types cannot be
    ANALYZE'd and are skipped). Returns :func:`table_stats`'s view of
    what the catalog recorded. Idempotent: ``replace=True`` re-creates
    the table definition (the data is untouched — external location).

    This is the post-materialization hook: call it after a dataset
    (re)write and every later catalog read of ``table_name`` plans
    with CBO-grade statistics instead of a size-on-disk guess."""
    q = _q(table_name)
    if replace and spark.catalog.tableExists(table_name):
        # refuse to clobber a MANAGED table: dropping one deletes its
        # DATA, and this function's contract is "data untouched"
        # (true only for external definitions)
        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {q}").collect()
        }
        if detail.get("Type", "").upper() == "MANAGED":
            raise ValueError(
                f"{table_name!r} is an existing MANAGED table — "
                f"dropping it would delete its data; pick another "
                f"name for the external stats registration"
            )
        spark.sql(f"DROP TABLE IF EXISTS {q}")
    loc = path.replace("'", "\\'")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {q} USING parquet LOCATION '{loc}'")
    spark.sql(f"ANALYZE TABLE {q} COMPUTE STATISTICS")
    if columns is None:
        # ANALYZE rejects nested/complex columns — default to atomics
        # (quoted identifier: a hyphenated name must not fail here
        # after the DDL above already ran)
        columns = [
            f.name
            for f in spark.table(q).schema.fields
            if f.dataType.typeName()
            not in ("array", "map", "struct", "binary")
        ]
    if columns:
        collist = ", ".join(_q(c) for c in columns)
        spark.sql(f"ANALYZE TABLE {q} COMPUTE STATISTICS FOR COLUMNS {collist}")
    return table_stats(spark, table_name, columns)


def table_stats(
    spark: SparkSession,
    table_name: str,
    columns: Sequence[str] | None = None,
) -> dict:
    """The catalog's recorded statistics for ``table_name``:
    ``{"row_count", "size_bytes", "columns": {name: {"ndv", "nulls",
    "min", "max"}}}`` (string-typed min/max as the catalog prints
    them; None where the catalog has no figure)."""
    q = _q(table_name)
    out: dict = {"row_count": None, "size_bytes": None, "columns": {}}
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {q}").collect():
        if row["col_name"] == "Statistics":
            m = re.search(r"(\d+)\s+bytes(?:,\s*(\d+)\s+rows)?", row["data_type"])
            if m:
                out["size_bytes"] = int(m.group(1))
                if m.group(2) is not None:
                    out["row_count"] = int(m.group(2))
    for c in columns or []:
        info = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {q} {_q(c)}"
            ).collect()
        }

        def _num(key):
            v = info.get(key)
            return int(v) if v is not None and v.isdigit() else None

        out["columns"][c] = {
            "ndv": _num("distinct_count"),
            "nulls": _num("num_nulls"),
            "min": info.get("min"),
            "max": info.get("max"),
        }
    return out


def cbo_session(spark: SparkSession, enabled: bool = True) -> None:
    """Flip the cost-based optimizer (and its join reordering) on this
    session — statistics only steer plans when CBO reads them."""
    v = "true" if enabled else "false"
    spark.conf.set("spark.sql.cbo.enabled", v)
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", v)


def explain_str(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain() only
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
