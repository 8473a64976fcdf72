"""Pig batch (multi-query) execution semantics — SURVEY.md §4.2.

Pig parses a whole script, builds every STORE's plan, THEN executes
the stores as one batch (MultiQueryOptimizer;
pig:src/org/apache/pig/tools/pigscript/ + MultiQueryOptimizer.java).
The engine's parser previously executed each STORE at its statement,
which (a) diverged from Pig's execution model and (b) undercounted
consumers: a parent shared by two stores compiled before the second
store existed, so the persist the compiler grants multi-consumer
subplans never fired and the parent recomputed per store.

Barriers that flush the queue early mirror Pig's documented
multiquery execution points: DUMP ("disables multiquery"), grunt
fs/sh/exec commands (forgiving superset — real Pig makes the user
exec first), and a LOAD whose path overlaps a pending STORE's output
(Pig's implicit store→load dependency handling).
"""

import os

from spork_spark.caching import release_cached, tracked_count
from spork_spark.parser import run_script

SF = "/root/testdata/sf0.001"


def test_shared_parent_across_stores_persists_once(eng, tmp_path):
    release_cached(eng.spark)
    base = tracked_count(eng.spark)
    run_script(eng, f"""
        a = LOAD '{SF}/lineitem.parquet';
        b = FOREACH a GENERATE l_orderkey, l_quantity * 2 AS q2;
        STORE b INTO '{tmp_path}/x';
        c = FILTER b BY q2 > 10.0;
        STORE c INTO '{tmp_path}/y';
    """)
    # b is consumed by STORE x and by c: with both store plans built
    # before execution, the compiler sees 2 consumers and persists b
    # exactly once (the multi-query reuse Pig's optimizer provides).
    assert tracked_count(eng.spark) == base + 1
    x = eng.spark.read.parquet(f"{tmp_path}/x")
    y = eng.spark.read.parquet(f"{tmp_path}/y")
    assert x.count() == 6000              # lineitem rows at sf0.001
    assert y.count() == x.filter("q2 > 10.0").count()
    release_cached(eng.spark)


def test_store_then_load_same_path(eng, tmp_path):
    """Pig's implicit store→load dependency: the LOAD flushes the
    pending STORE that writes its path, so the classic staging idiom
    works under batching."""
    rels = run_script(eng, f"""
        a = LOAD '{SF}/nation.parquet';
        b = LIMIT a 5;
        STORE b INTO '{tmp_path}/nat5';
        c = LOAD '{tmp_path}/nat5';
        g = GROUP c ALL;
        n = FOREACH g GENERATE COUNT_STAR(c) AS n;
    """)
    assert rels["n"].df().collect()[0][0] == 5


def test_dump_is_an_execution_barrier(eng, tmp_path, capsys):
    """DUMP flushes queued stores first (Pig: dump disables multiquery
    across it) — the stored output exists by the time DUMP prints."""
    run_script(eng, f"""
        a = LOAD '{SF}/region.parquet';
        STORE a INTO '{tmp_path}/r';
        b = LIMIT a 1;
        DUMP b;
    """)
    assert os.path.isdir(f"{tmp_path}/r")
    # DUMP prints Pig TupleFormat, no header: (0,REGION_0)
    assert "(0," in capsys.readouterr().out


def test_grunt_command_flushes_pending_stores(eng, tmp_path, capsys):
    """`STORE x INTO 'out'; cat out/...;` — forgiving superset of real
    Pig (which requires an exec between): fs commands flush first."""
    run_script(eng, f"""
        a = LOAD '{SF}/region.parquet';
        b = FOREACH a GENERATE r_regionkey;
        STORE b INTO '{tmp_path}/rq' USING PigStorage(',');
        cat {tmp_path}/rq/part-*;
    """)
    out = capsys.readouterr().out
    assert set(out.split()) == {"0", "1", "2", "3", "4"}


def test_invalid_statement_fails_batch_before_any_store(eng, tmp_path):
    """Pig batch semantics: every statement's plan is validated before
    execution, so an invalid statement ANYWHERE fails the script with
    no partial output — even when a STORE precedes it."""
    import pytest
    with pytest.raises(Exception, match="no_such_col"):
        run_script(eng, f"""
            a = LOAD '{SF}/region.parquet';
            STORE a INTO '{tmp_path}/out';
            b = FILTER a BY no_such_col > 1;
        """)
    assert not os.path.exists(f"{tmp_path}/out")


def test_failed_store_does_not_abort_remaining_stores(eng, tmp_path):
    """Pig batch default: when one STORE job fails at runtime, the
    remaining stores still run and the batch reports the failure at
    the end (-F / spark.spork.stopOnFailure=true restores
    fail-fast)."""
    import pytest
    blocker = tmp_path / "blocker"
    blocker.write_text("a file where a directory is needed")
    bad = f"{blocker}/out"                 # fails at write, not analysis
    good = tmp_path / "good"
    with pytest.raises(RuntimeError, match="1 of 2 stores failed"):
        run_script(eng, f"""
            a = LOAD '{SF}/region.parquet';
            STORE a INTO '{bad}';
            STORE a INTO '{good}';
        """)
    assert good.exists()                   # the second store still ran

    eng.spark.conf.set("spark.spork.stopOnFailure", "true")
    try:
        good2 = tmp_path / "good2"
        with pytest.raises(Exception) as ei:
            run_script(eng, f"""
                a = LOAD '{SF}/region.parquet';
                STORE a INTO '{bad}';
                STORE a INTO '{good2}';
            """)
        assert not isinstance(ei.value, RuntimeError) or \
            "stores failed" not in str(ei.value)   # fail-fast: original error
        assert not good2.exists()          # second store never attempted
    finally:
        eng.spark.conf.set("spark.spork.stopOnFailure", "false")


def test_multiquery_off_restores_inline_stores(eng, tmp_path):
    """spark.spork.multiquery.enabled=false = Pig's -no_multiquery:
    every STORE executes at its statement. (The late persist upgrade
    still caches the shared parent when its SECOND consumer compiles —
    correct in both modes, it just cannot avoid the first store's
    un-cached computation inline.)"""
    release_cached(eng.spark)
    eng.spark.conf.set("spark.spork.multiquery.enabled", "false")
    try:
        run_script(eng, f"""
            a = LOAD '{SF}/region.parquet';
            b = FOREACH a GENERATE r_regionkey;
            STORE b INTO '{tmp_path}/p';
            c = FILTER b BY r_regionkey >= 0;
            STORE c INTO '{tmp_path}/q';
        """)
        assert eng.spark.read.parquet(f"{tmp_path}/p").count() == 5
        assert eng.spark.read.parquet(f"{tmp_path}/q").count() == 5
    finally:
        eng.spark.conf.set("spark.spork.multiquery.enabled", "true")
        release_cached(eng.spark)


def test_multiquery_on_off_equivalence_fuzz(eng, tmp_path):
    """Metamorphic: for generated multi-STORE scripts, batched
    (multiquery on) and inline (off) execution write byte-equal
    result sets — the optimization must never change output."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spork_spark.parser import run_script

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(c=st.integers(0, 40), k=st.sampled_from(
               ["l_returnflag", "l_linestatus", "l_suppkey"]),
           n=st.integers(1, 50))
    def check(c, k, n):
        counter[0] += 1
        base = tmp_path / f"mq{counter[0]}"
        script = f"""
            li = LOAD '{SF}/lineitem.parquet';
            f = FILTER li BY l_quantity > {c}.0;
            g = GROUP f BY {k};
            s = FOREACH g GENERATE group AS k, COUNT_STAR(f) AS n,
                                   SUM(f.l_extendedprice) AS sm;
            t = LIMIT s {n};
            STORE s INTO '{{out}}/s' USING PigStorage(',', '-schema');
            STORE t INTO '{{out}}/t' USING PigStorage(',', '-schema');
            STORE f INTO '{{out}}/f';
        """
        outs = {}
        for mode in ("true", "false"):
            eng.spark.conf.set("spark.spork.multiquery.enabled", mode)
            out = f"{base}_{mode}"
            run_script(eng, script.replace("{out}", out))
            rows = {}
            for alias in ("s", "f"):
                fmt = "csv" if alias == "s" else "parquet"
                df = (eng.spark.read.options(sep=",")
                      .format(fmt).load(f"{out}/{alias}"))
                rows[alias] = sorted(map(tuple, df.collect()))
            # t is a LIMIT without ORDER — row SET is nondeterministic,
            # but its size is not
            tdf = eng.spark.read.options(sep=",").csv(f"{base}_{mode}/t")
            rows["t_count"] = tdf.count()
            outs[mode] = rows
        assert outs["true"] == outs["false"]

    try:
        check()
    finally:
        eng.spark.conf.set("spark.spork.multiquery.enabled", "true")
