"""Static gates on the driver contract (__spark_entry__.py) — the
hazards the round-5 sweeps caught, turned into permanent tests."""
import ast
import collections
import os

ENTRY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "__spark_entry__.py")
# the driver's smallest fixture scale (TESTDATA.md); skip the live
# build test when absent rather than hard-failing on another machine
SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_no_duplicate_toplevel_function_names():
    """Python's last-definition-wins silently rebinds every registry key
    pointing at an earlier same-named function (the q_fingerprint /
    q_fingerprint_table regression: a second def q_fingerprint made the
    per-doc fingerprint query return the Merkle table checksum)."""
    tree = ast.parse(open(ENTRY).read())
    names = [n.name for n in tree.body
             if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
    dupes = [n for n, c in collections.Counter(names).items() if c > 1]
    assert not dupes, f"duplicate top-level defs shadow earlier ones: {dupes}"


def test_registry_is_consistent():
    """Every oracle key has a query; every query callable is distinct-
    by-name sane (two registry keys may share a function only when one
    is an alias, which this repo does not use)."""
    import __spark_entry__ as m
    qs, oracles = m.queries(), m.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {"sample", "unique_id"}, \
        f"unexpected rows-only queries: {rows_only - {'sample', 'unique_id'}}"
    by_fn = collections.defaultdict(list)
    for k, f in qs.items():
        by_fn[f].append(k)
    shared = {f.__name__: ks for f, ks in by_fn.items() if len(ks) > 1}
    assert not shared, f"registry keys share one function: {shared}"


def test_registry_outputs_are_scalar_columns(spark):
    """Driver harness-shape gate (the r8 lesson): the driver's
    correctness gate canonicalizes each result by sorting a pandas frame
    over ALL columns before hashing — a top-level ArrayType/StructType/
    MapType column raises `TypeError: unhashable type: 'list'` and reds
    the row even when the values are correct (r8: quantize_embeddings,
    jl_sketch, multimodal_features). Every registry output must
    therefore project complex values to scalar columns (CSV-join arrays,
    dereference struct fields) in its driver-facing SELECT.

    DecimalType is banned too: the two engines' pandas pipelines
    normalize decimals differently (Spark toPandas keeps
    Decimal('179.60'); DuckDB .df() converts DECIMAL to float 179.6),
    so a decimal output column hash-diverges on correct values — the
    r3 HUGEINT lesson at the frame level (caught by
    tools/driver_gate_sim.py on time_rollup). Driver-facing
    projections cast to double when exact (magnitude-bounded sums) or
    to the digit string when not (fingerprint_table's 60-bit digest
    sums). Lazy build at sf0.001 — schemas only, nothing collected."""
    import pytest
    from pyspark.sql import types as T
    import __spark_entry__ as m

    if not os.path.isdir(SF):
        pytest.skip(f"driver fixture dir {SF} not present")
    banned = (T.ArrayType, T.StructType, T.MapType, T.DecimalType)
    bad = {}
    for name, q in m.queries().items():
        df = q(spark, SF)
        offenders = [f.name for f in df.schema.fields
                     if isinstance(f.dataType, banned)]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "driver-hazardous top-level output columns (unhashable in the "
        "driver's canonicalizer, or decimal frame-normalization "
        f"divergence): {bad}")
