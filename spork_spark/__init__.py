"""spork_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of sigmoidanalytics/spork (Pig on Spark).

Layers (SURVEY.md §7 architecture):
- ``spork_spark.plans``      — logical plan + expression AST + Relation builder
- ``spork_spark.compiler``   — plan/expression → DataFrame/Column (fusion rules)
- ``spork_spark.functions``  — Pig builtin translation table (JVM-side Columns)
- ``spork_spark.sources``    — Load/Store functions → Spark DataSources
- ``spork_spark.operators``  — extension operators (dedup, similarity search,
                               text analysis, multimodal) for LLM-scale pipelines
- ``spork_spark.streaming``  — event-time windows (batch + Structured Streaming)
- ``spork_spark.parser``     — Pig Latin front-end (lowering onto the builder)
"""

from .plans.expressions import (bincond, col, flatten, fn, lam, lit, pos,
                                star)
from .plans.relation import Engine, Relation
from .session import configure_session, get_spark

__all__ = [
    "Engine", "Relation", "get_spark", "configure_session",
    "col", "lit", "pos", "star", "fn", "flatten", "bincond", "lam",
]

__version__ = "0.1.0"
