"""Sources & sinks (SURVEY §2.1).

The reference reads CSV (`fread(na.strings='.')`,
data_raw/traindata_graafreinet.R:20), Excel (readxl,
data_raw/data_capetown.R:14-16), and RDS checkpoints
(data_raw/pretrained.R:21-22). Spark equivalents: csv with nullValue,
an import-gated Excel path, parquet/Iceberg checkpoint tables (the RDS
analog — see pipeline.LinkagePipeline for the resumable write→reread
pattern), and plain writers for human-review exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    null_value: str = ".",
    header: bool = True,
) -> DataFrame:
    """CSV scan with the reference's missing-value convention
    (``na.strings='.'``)."""
    reader = spark.read.option("header", header).option("nullValue", null_value)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int | None = None,
    use_pandas: bool = False,
) -> DataFrame:
    """Excel scan (readxl::read_xlsx analog, data_raw/data_capetown.R:14-16).

    Default path is the dependency-free stdlib parser
    (sources_excel.read_excel_stdlib — zipfile + ElementTree, no
    openpyxl/xlrd needed). ``use_pandas=True`` routes through
    ``pd.read_excel`` when an engine is installed (for .xls or styled
    sheets the minimal parser doesn't cover). Small label spreadsheets
    only — parsed driver-side, then parallelized."""
    if use_pandas:
        import pandas as pd

        try:
            pdf = pd.read_excel(path, sheet_name=sheet or 0)
        except ImportError as e:
            raise ImportError(
                "use_pandas=True needs openpyxl/xlrd; call with "
                "use_pandas=False for the built-in .xlsx parser"
            ) from e
        return spark.createDataFrame(pdf)
    from capelinker_spark.sources_excel import read_excel_stdlib

    return read_excel_stdlib(spark, path, sheet)


def read_table(spark: SparkSession, name_or_path: str) -> DataFrame:
    """Iceberg/catalog table when a catalog is configured, parquet path
    otherwise — the single entry point pipelines use so the sandbox
    (parquet dirs) and a cluster (Iceberg warehouse) run the same code."""
    if "/" in name_or_path:
        return spark.read.parquet(name_or_path)
    return spark.read.table(name_or_path)


def write_checkpoint(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Stage checkpoint (the saveRDS analog): parquet dir in-sandbox; on a
    cluster swap for ``df.writeTo(table).createOrReplace()``."""
    df.write.mode(mode).parquet(path)


def write_review_csv(df: DataFrame, path: str) -> None:
    """Human-review export (writexl analog, data_raw/pretrained.R:345-347):
    single-file CSV with header."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
