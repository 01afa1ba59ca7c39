"""Pipeline runner (SURVEY.md §3.4): the reference orchestrates four
notebooks as a Databricks multi-task job with linear depends_on edges
(/root/reference/RUNME.py:19-92); here the same lifecycle is a plain
DAG of named stages over one SparkSession — no platform dependency.

Each stage is ``(spark, inputs) -> DataFrame``; its result is
registered as a temp view under the stage name (mirroring the
reference's saveAsTable-then-read handoff, 01:244-245 → 03:24) and
handed to downstream stages. Stages run in dependency order
(topological); independent stages could run concurrently — Spark's
scheduler interleaves their jobs anyway, so the runner stays simple
and deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Stage", "Pipeline"]

StageFn = Callable[[SparkSession, dict[str, DataFrame]], DataFrame]


@dataclass
class Stage:
    name: str
    fn: StageFn
    depends_on: tuple[str, ...] = ()


@dataclass
class Pipeline:
    """An ordered DAG of stages. ``run`` returns {stage: DataFrame}."""

    stages: list[Stage] = field(default_factory=list)

    def stage(self, name: str, depends_on: tuple[str, ...] = ()) -> Callable[[StageFn], StageFn]:
        def deco(fn: StageFn) -> StageFn:
            self.add(Stage(name, fn, depends_on))
            return fn

        return deco

    def add(self, stage: Stage) -> None:
        if any(s.name == stage.name for s in self.stages):
            raise ValueError(f"duplicate stage: {stage.name}")
        self.stages.append(stage)

    def _topo_order(self) -> list[Stage]:
        by_name = {s.name: s for s in self.stages}
        for s in self.stages:
            missing = [d for d in s.depends_on if d not in by_name]
            if missing:
                raise ValueError(f"stage {s.name} depends on unknown stage(s) {missing}")
        done: dict[str, Stage] = {}
        order: list[Stage] = []

        def visit(s: Stage, path: tuple[str, ...]) -> None:
            if s.name in done:
                return
            if s.name in path:
                raise ValueError(f"dependency cycle: {' -> '.join((*path, s.name))}")
            for d in s.depends_on:
                visit(by_name[d], (*path, s.name))
            done[s.name] = s
            order.append(s)

        for s in self.stages:
            visit(s, ())
        return order

    def run(self, spark: SparkSession, register_views: bool = True) -> dict[str, DataFrame]:
        results: dict[str, DataFrame] = {}
        for s in self._topo_order():
            inputs = {d: results[d] for d in s.depends_on}
            df = s.fn(spark, inputs)
            if register_views:
                df.createOrReplaceTempView(s.name)
            results[s.name] = df
        return results
