"""A minimal dbt-like model pipeline on Spark DataFrames.

The reference's "engine" is dbt rendering SQL models into a DAG of
views/tables (SURVEY.md §3.1). Here a model is a named function
``(Pipeline) -> DataFrame``; ``ref()`` resolves dependencies and the
materialization decides whether the plan stays lazy (view — Catalyst
inlines it downstream, exactly like BigQuery inlining staging views) or
is persisted to parquet (table/snapshot — cuts recomputation and gives
marts a stable scan).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    fn: Callable[["Pipeline"], DataFrame]
    materialized: str = "view"  # view | table
    partition_by: str | None = None  # table-only: partition column


@dataclass
class Pipeline:
    spark: SparkSession
    workdir: str | None = None
    sources: dict[str, DataFrame] = field(default_factory=dict)
    models: dict[str, Model] = field(default_factory=dict)
    _built: dict[str, DataFrame] = field(default_factory=dict)

    def add_source(self, name: str, df: DataFrame) -> None:
        self.sources[name] = df

    def model(self, name: str, materialized: str = "view", partition_by: str | None = None):
        def deco(fn: Callable[[Pipeline], DataFrame]):
            self.models[name] = Model(name, fn, materialized, partition_by)
            return fn

        return deco

    def source(self, name: str) -> DataFrame:
        return self.sources[name]

    def ref(self, name: str) -> DataFrame:
        """Build (once) and return a model; recursion builds the DAG in
        dependency order, like dbt's ref()."""
        if name in self._built:
            return self._built[name]
        if name not in self.models:
            raise KeyError(f"unknown model: {name}")
        m = self.models[name]
        df = m.fn(self)
        if m.materialized == "table" and self.workdir:
            path = f"{self.workdir}/{m.name}"
            writer = df.write.mode("overwrite")
            if m.partition_by:
                # Day-partitioned warehouse layout (ref: load_to_bigquery
                # TimePartitioning) -> downstream partition pruning.
                writer = writer.partitionBy(m.partition_by)
            writer.parquet(path)
            df = self.spark.read.parquet(path)
        self._built[name] = df
        df.createOrReplaceTempView(m.name)
        return df

    def run(self, names: list[str] | None = None) -> dict[str, DataFrame]:
        for n in names or list(self.models):
            self.ref(n)
        return dict(self._built)
