"""Static gates on the driver contract (__spark_entry__.py) — the
hazards the round-5 sweeps caught, turned into permanent tests."""
import ast
import collections
import os

ENTRY = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "__spark_entry__.py")


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
    dereference struct fields) in its driver-facing SELECT. Lazy build
    at sf0.001 — schemas only, nothing is collected."""
    from pyspark.sql import types as T
    import __spark_entry__ as m

    complex_types = (T.ArrayType, T.StructType, T.MapType)
    bad = {}
    for name, q in m.queries().items():
        df = q(spark, "/root/testdata/sf0.001")
        offenders = [f.name for f in df.schema.fields
                     if isinstance(f.dataType, complex_types)]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "non-scalar top-level output columns (driver canonicalizer "
        f"cannot hash them): {bad}")
