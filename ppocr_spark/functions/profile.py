"""One-pass table profiling: the ANALYZE/data-audit surface a pipeline
runs before trusting a new drop of data — per-column null counts, exact
distinct counts, and min/max, as one slim long-format table.

Scale shape: ONE aggregate over the table produces every column's stats
(count + per-column conditional aggregates), then a zero-shuffle
``stack`` unpivots the single row into (col_name, ...) rows. The exact
multi-distinct agg plans as Spark's Expand (k row-replicas through one
shuffle of partial aggregates) — the honest exact form; at 100 TB with
high-cardinality columns you swap the exact count for the per-group HLL
sketch (``sketch.hll_registers(..., group_cols=...)``) and keep this
shape. min/max are computed on the NATIVE type and cast to string only
for display — casting before the min would compare lexicographically.

Cross-engine parity note: int/string columns round-trip to identical
strings in Spark and DuckDB; float columns would not (formatting
differs) — the gate row profiles only int/string columns, and callers
profiling doubles should treat min/max as display-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    for each requested column (default: all), from one aggregate."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long"))
            .cast("long")
            .alias(f"__nn_{i}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{i}`, `__nd_{i}`, `__mn_{i}`, `__mx_{i}`"
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value",
    )
