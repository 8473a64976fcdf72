"""Aggregated cast-failure warning counters (SURVEY.md §1.3).

Pig counts every cast that discards a value into per-kind warning
counters aggregated at job end — ``Encountered Warning
FIELD_DISCARDED_TYPE_CONVERSION_FAILED 1234 time(s)`` (reference:
pig:src/org/apache/pig/PigWarning.java enum +
pig:…/expressionOperators/POCast.java warn() calls). The engine's
casts are correctly null-on-failure, but silently: a user migrating a
dirty-data script loses the discard signal.

Spark-first implementation: the counters ride the query itself as
``Dataset.observe`` metrics — JVM-side AggregatingAccumulator over the
exact rows the query processes, zero extra pass, zero Python in the
hot path, cluster-correct (metrics fold across executors like any
accumulator). Gated behind ``spark.spork.warnings.enabled`` (default
off: observe nodes, while cheap, are not free in plan matching).

Harvesting is NON-blocking via the JVM Observation.getRowOrEmpty():
plans that were never materialized simply report nothing (PySpark's
``Observation.get`` would block forever on them). Observation records
only the FIRST action on a plan — per-statement semantics match Pig's
per-job counters; a re-run recompiles and gets fresh observations.
"""

from __future__ import annotations

import itertools
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ids = itertools.count()

WARNING_KIND = "FIELD_DISCARDED_TYPE_CONVERSION_FAILED"


class CastWarningCollector:
    """Session-scoped (one per Engine) counter registry.

    ``attach(df, probes)`` plants one observe node; ``harvest()``
    folds every completed observation into ``counts`` and returns the
    newly-added delta; ``report()`` prints Pig-style aggregate lines
    for that delta (the per-statement surfacing PigParser.run and the
    grunt shell use).
    """

    def __init__(self):
        self._pending: list = []          # (Observation, [labels])
        self.counts: Counter = Counter()  # label -> discards so far

    def attach(self, df: DataFrame, probes: list) -> DataFrame:
        """probes: [(label, bool Column that is true on a discarded
        value)]. Same-label probes in one plan merge into one metric."""
        from pyspark.sql import Observation

        if not probes:
            return df
        by_label: dict = {}
        for label, cond in probes:
            m = F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
            by_label[label] = by_label[label] + m if label in by_label \
                else m
        obs = Observation(f"spork_cast_warnings_{next(_ids)}")
        out = df.observe(obs, *[m.alias(lbl)
                                for lbl, m in by_label.items()])
        self._pending.append((obs, list(by_label)))
        return out

    def harvest(self) -> Counter:
        """Fold completed observations into counts; non-blocking —
        unmaterialized plans stay pending. Returns the delta."""
        delta: Counter = Counter()
        still = []
        for obs, labels in self._pending:
            try:
                # PySpark-private surface (Observation._jo + the JVM
                # getRowOrEmpty) — present on classic 4.x runtimes, absent
                # under Spark Connect / subject to rename. A runtime
                # without it degrades to "still pending" (no warning
                # surface), never a harvest() crash.
                jo = obs._jo
                resolved = jo is not None and not jo.getRowOrEmpty().isEmpty()
            except Exception:
                resolved = False
            if not resolved:
                still.append((obs, labels))
                continue
            row = obs.get  # resolved — returns immediately
            for lbl in labels:
                v = row.get(lbl)
                if v:
                    delta[lbl] += int(v)
        self._pending = still
        self.counts.update(delta)
        return delta

    def report(self, out=None) -> Counter:
        """Harvest and print Pig's end-of-job aggregate warning lines
        for any NEW discards (nothing printed when clean)."""
        import sys

        delta = self.harvest()
        emit = out or (lambda s: print(s, file=sys.stderr))
        for lbl in sorted(delta):
            emit(f"Encountered Warning {WARNING_KIND} ({lbl}) "
                 f"{delta[lbl]} time(s).")
        if len(delta) > 1:
            emit(f"Encountered Warning {WARNING_KIND} "
                 f"{sum(delta.values())} time(s) total.")
        return delta

    def reset(self) -> None:
        self._pending.clear()
        self.counts.clear()
