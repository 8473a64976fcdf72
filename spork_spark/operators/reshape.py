"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

Spark-first: pivot_table is sugar over the native RelationalGroupedData
pivot — with an EXPLICIT value list, so no extra distinct-values pass
over the data and a deterministic output schema (the implicit form
scans once just to learn the columns, and its column order depends on
the data). unpivot uses the built-in melt/unpivot (stack), a map-side
row explosion with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_table(df: DataFrame, row_cols: list[str], pivot_col: str,
                pivot_values: list, agg_col: str | None = None,
                agg: str = "count", fill=None) -> DataFrame:
    """Wide table: one row per `row_cols`, one column per value in
    `pivot_values` holding agg(agg_col) of the matching slice.

    `pivot_values` is required (not inferred): at 100 TB the implicit
    pivot's distinct-values pre-pass is a full extra scan, and an
    unbounded value set would mint an unbounded schema. One shuffle on
    row_cols; per-column aggregation is map-side combined like any
    groupBy.
    """
    if not pivot_values:
        raise ValueError("pivot_table requires an explicit value list")
    g = df.groupBy(*row_cols).pivot(pivot_col, pivot_values)
    if agg == "count":
        out = g.agg(F.count(F.lit(1)))
    else:
        if agg_col is None:
            raise ValueError(f"agg={agg!r} needs agg_col")
        out = g.agg(getattr(F, agg)(F.col(agg_col)))
    if fill is not None:
        out = out.na.fill(fill, [str(v) for v in pivot_values])
    return out


def unpivot(df: DataFrame, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable",
            value_name: str = "value") -> DataFrame:
    """Long table: (id_cols, variable, value) per wide column — the
    inverse of pivot_table. Native melt: a map-side explosion, no
    shuffle, nulls dropped to mirror pivot's missing cells."""
    out = df.unpivot([F.col(c) for c in id_cols],
                     [F.col(c) for c in value_cols],
                     var_name, value_name)
    return out.where(F.col(value_name).isNotNull())
