"""Privacy / governance audits: k-anonymity and l-diversity.

Beyond-reference scope required by the north star: a corpus pipeline that
redacts PII (functions/text.py::redact_pii) also needs to MEASURE
re-identification risk before release. The standard yardsticks:

* k-anonymity (Sweeney 2002): every combination of quasi-identifier
  values (the "equivalence class") must cover at least k records;
* l-diversity (Machanavelli et al. 2007): each class must additionally
  contain at least l distinct values of the sensitive attribute —
  k-anonymity alone fails when a class is homogeneous in the secret.

Spark-first shape: ONE grouped aggregation on the quasi-identifier tuple
(map-side combinable count + count-distinct), then a single summary fold
— at 100 TB this is a plain shuffle on the QI key; no windows, no joins,
no Python. Exact integer outputs, trivially oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equivalence_classes(
    df: DataFrame, qi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """(qi..., class_size, n_sensitive) — one row per quasi-identifier
    equivalence class with its size and sensitive-value diversity."""
    return df.groupBy(*qi_cols).agg(
        F.count("*").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """One summary row: total classes/rows, how many classes (and rows)
    break k-anonymity, how many break l-diversity, and the worst case of
    each — the release-gate numbers a data steward signs off on."""
    cls = equivalence_classes(df, qi_cols, sensitive_col)
    risky_k = (F.col("class_size") < k).cast("long")
    risky_l = (F.col("n_sensitive") < l).cast("long")

    def z(c: Column) -> Column:  # empty table → 0 counts, not NULL
        return F.coalesce(c, F.lit(0)).cast("long")

    return cls.agg(
        F.count("*").cast("long").alias("n_classes"),
        z(F.sum("class_size")).alias("n_rows"),
        z(F.sum(risky_k)).alias("classes_below_k"),
        z(F.sum(F.col("class_size") * risky_k)).alias("rows_below_k"),
        z(F.sum(risky_l)).alias("classes_below_l"),
        z(F.sum(F.col("class_size") * risky_l)).alias("rows_below_l"),
        F.min("class_size").cast("long").alias("min_class_size"),
        F.min("n_sensitive").cast("long").alias("min_l"),
    )
