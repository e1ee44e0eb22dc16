"""Sources & sinks (reference parity: SURVEY §2.1 S1-S7).

The reference reads CSV/catalog tables, materializes Splink intermediate
tables and drops them between trials (``show tables like '*__splink__*'``
→ ``drop table``, autolinker.py:369-379), and logs runs to MLflow. Here:

- typed readers for parquet / CSV / JSON / catalog tables (inferSchema
  avoided in the scale path — pass explicit schemas),
- temp-view lifecycle helpers with pattern-matched cleanup (no Hive
  dependency — pure session catalog),
- a JSON run-log sink standing in for the MLflow logger (params +
  metrics + artifacts per run, one JSON file each).
"""

from __future__ import annotations

import fnmatch
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: predicate pushdown + column pruning come free."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    header: bool = True,
) -> DataFrame:
    """CSV scan (S1). Schema inference triggers an extra full pass and
    guesses types from a sample — always pass ``schema`` at scale."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """JSON scan; schema is mandatory (inference reads everything twice)."""
    return spark.read.schema(schema).json(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog/temp-view scan (S2)."""
    return spark.read.table(name)


# ------------------------------------------------------------- temp views
def register_view(df: DataFrame, name: str) -> None:
    df.createOrReplaceTempView(name)


def list_views(spark: SparkSession, pattern: str = "*") -> list[str]:
    return [
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and fnmatch.fnmatch(t.name, pattern)
    ]


def drop_views(spark: SparkSession, pattern: str) -> int:
    """Drop temp views matching a glob (S4 parity: the reference drops
    ``*__splink__*`` intermediates between trials). Returns count."""
    names = list_views(spark, pattern)
    for name in names:
        spark.catalog.dropTempView(name)
    return len(names)


# ----------------------------------------------------------------- sinks
def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], *, mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink — downstream scans partition-prune on the
    partition columns for free."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: later equi-joins/aggregations on the
    bucket columns co-locate WITHOUT a shuffle — the storage-side answer
    to repeated blocking joins on the same keys. Requires a warehouse
    (session catalog); bucketing cannot target a bare path."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_by)
        .sortBy(*bucket_by)
        .saveAsTable(table)
    )


# ------------------------------------------------------------ run logging
class RunLog:
    """Minimal run logger (S5 stand-in for the MLflow sink): one JSON file
    per run under ``root``, holding params, metrics and tagged artifacts.
    Keeps the engine dependency-free; an MLflow adapter can wrap this."""

    def __init__(self, root: str, run_name: str = "run"):
        self.root = root
        self.run_name = run_name
        self.params: dict = {}
        self.metrics: dict = {}
        self.artifacts: dict = {}
        os.makedirs(root, exist_ok=True)

    def log_params(self, **params) -> None:
        self.params.update(params)

    def log_metrics(self, **metrics) -> None:
        self.metrics.update(metrics)

    def log_artifact(self, name: str, payload) -> None:
        self.artifacts[name] = payload

    def save(self) -> str:
        stamp = int(time.time() * 1000)
        path = os.path.join(self.root, f"{self.run_name}-{stamp}.json")
        with open(path, "w") as f:
            json.dump(
                {
                    "run": self.run_name,
                    "params": self.params,
                    "metrics": self.metrics,
                    "artifacts": self.artifacts,
                },
                f,
                indent=2,
                default=str,
            )
        return path

    def to_mlflow(
        self,
        *,
        experiment: str | None = None,
        tracking_uri: str | None = None,
    ) -> str:
        """Mirror this run into MLflow, if installed (reference
        splink_mlflow.py:124-173 logs the model JSON, params and metrics
        per trial; this logs the same three surfaces from the RunLog's
        buffers). The engine stays dependency-free: mlflow imports here,
        at call time, and a missing install raises ImportError with the
        remedy instead of failing at module import.

        Returns the MLflow run id."""
        try:
            import mlflow
        except ImportError as e:  # pragma: no cover - exercised via test
            raise ImportError(
                "RunLog.to_mlflow requires the optional mlflow package "
                "(pip install mlflow); the JSON RunLog.save() sink works "
                "without it"
            ) from e
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        if experiment:
            mlflow.set_experiment(experiment)
        with mlflow.start_run(run_name=self.run_name) as run:
            if self.params:
                mlflow.log_params(
                    {k: str(v) for k, v in self.params.items()}
                )
            for k, v in self.metrics.items():
                mlflow.log_metric(k, float(v))
            # artifacts (e.g. the serialized FS model dict) as JSON files,
            # the same shape splink_mlflow logs the Splink settings under
            for name, payload in self.artifacts.items():
                mlflow.log_dict(
                    json.loads(json.dumps(payload, default=str)),
                    f"{name}.json",
                )
            return run.info.run_id
