"""Launcher flag surface (pig:src/org/apache/pig/Main.java):
-param/-param_file precedence, -e(xecute), -c(heck), -r(dryrun),
-M(no_multiquery) — driven through spork_spark.__main__.main exactly
as a user would."""

import os

from spork_spark import __main__ as cli

SF = "/root/testdata/sf0.001"


def test_dryrun_writes_substituted_next_to_script(tmp_path, capsys):
    """-r/-dryrun: parameter substitution + macro expansion written to
    <script>.substituted; nothing executes (no SparkSession needed)."""
    script = tmp_path / "job.pig"
    script.write_text(
        "%default CUT 10\n"
        "DEFINE topk(rel) RETURNS out {\n"
        "  o = ORDER $rel BY v DESC;\n"
        "  $out = LIMIT o $CUT;\n"
        "};\n"
        f"a = LOAD '{SF}/nation.parquet';\n"
        "t = topk(a);\n"
        f"STORE t INTO '{tmp_path}/never';\n")
    assert cli.main(["-r", str(script), "-param", "CUT=3"]) == 0
    sub = script.with_suffix(".pig.substituted")
    assert sub.exists()
    text = sub.read_text()
    assert "LIMIT" in text and " 3;" in text         # param substituted
    assert "$CUT" not in text and "$rel" not in text  # macro expanded
    assert "RETURNS" not in text                      # definition removed
    assert not os.path.exists(f"{tmp_path}/never")    # nothing ran


def test_dryrun_execute_prints_to_stdout(capsys):
    assert cli.main(["-r", "-e", "%default N 7\nx = LIMIT a $N;"]) == 0
    assert "LIMIT a 7;" in capsys.readouterr().out


def test_param_beats_param_file_regardless_of_order(tmp_path, capsys):
    """Pig precedence: -param overrides -param_file values of the same
    name even when the file flag comes later on the command line."""
    pf = tmp_path / "env.params"
    pf.write_text("# deployment params\nN=99\nTAG='prod'\n")
    assert cli.main(["-r", "-e", "x = LIMIT a $N; -- $TAG",
                     "-param", "N=5", "-param_file", str(pf)]) == 0
    out = capsys.readouterr().out
    assert "LIMIT a 5;" in out and "prod" in out


def test_execute_flag_runs_statements(eng, tmp_path):
    """-e CMDS executes like a one-statement script file."""
    out = tmp_path / "e_out"
    assert cli.main(
        ["-e", f"a = LOAD '{SF}/region.parquet'; STORE a INTO '{out}';"]
    ) == 0
    assert out.exists()


def test_check_mode_validates_without_executing(eng, tmp_path, capsys):
    """-c/-check: a valid script (including its STORE and DUMP) passes
    with 'syntax OK' and writes/prints nothing."""
    script = tmp_path / "ok.pig"
    script.write_text(
        f"a = LOAD '{SF}/region.parquet';\n"
        "b = FILTER a BY r_regionkey > 1;\n"
        f"STORE b INTO '{tmp_path}/never';\n"
        "DUMP b;\n")
    assert cli.main(["-c", str(script)]) == 0
    cap = capsys.readouterr()
    assert "syntax OK" in cap.out
    assert "r_regionkey" not in cap.out               # DUMP suppressed
    assert not os.path.exists(f"{tmp_path}/never")


def test_check_mode_reports_schema_errors(eng, tmp_path, capsys):
    """-check exits 1 with the offending name when a statement
    references a missing column — Pig's plan-validation pass."""
    script = tmp_path / "bad.pig"
    script.write_text(
        f"a = LOAD '{SF}/region.parquet';\n"
        f"STORE a INTO '{tmp_path}/never';\n"
        "b = FILTER a BY no_such_col > 1;\n")
    assert cli.main(["-c", str(script)]) == 1
    cap = capsys.readouterr()
    assert "ERROR" in cap.err and "no_such_col" in cap.err
    assert not os.path.exists(f"{tmp_path}/never")


def test_no_multiquery_flag_sets_conf(eng, tmp_path):
    """-M/-no_multiquery maps to spark.spork.multiquery.enabled=false
    (Pig's inline-store execution)."""
    spark = eng.spark
    try:
        assert cli.main(
            ["-M", "-e",
             f"a = LOAD '{SF}/region.parquet'; "
             f"STORE a INTO '{tmp_path}/mq';"]) == 0
        assert spark.conf.get("spark.spork.multiquery.enabled") == "false"
        assert (tmp_path / "mq").exists()
    finally:
        spark.conf.set("spark.spork.multiquery.enabled", "true")


def test_script_failure_exits_2_with_error_line(eng, tmp_path, capsys):
    """Batch-mode failure prints Pig's clean ERROR line and exits 2 —
    no Python traceback."""
    script = tmp_path / "boom.pig"
    script.write_text(f"a = LOAD '{SF}/region.parquet';\n"
                      "b = FILTER a BY nope > 1;\n")
    assert cli.main([str(script)]) == 2
    err = capsys.readouterr().err
    # Spark's own structured-log lines may precede ours (and under
    # pytest capture pyspark's logging handler can emit its own
    # traceback noise) — the contract is OUR clean line + exit code
    assert "ERROR:" in err and "nope" in err


def test_property_file_sets_conf(eng, tmp_path):
    """-P FILE applies key=value properties to the session conf."""
    pf = tmp_path / "job.properties"
    pf.write_text("# job props\nspark.spork.test.flag=hello\n")
    spark = eng.spark
    try:
        assert cli.main(
            ["-P", str(pf), "-e",
             f"a = LOAD '{SF}/region.parquet'; "
             f"STORE a INTO '{tmp_path}/p_out';"]) == 0
        assert spark.conf.get("spark.spork.test.flag") == "hello"
    finally:
        spark.conf.unset("spark.spork.test.flag")


def test_check_mode_covers_nested_exec(eng, tmp_path, capsys):
    """-check follows grunt `exec child.pig` into the nested script and
    skips fs/sh side effects."""
    child = tmp_path / "child.pig"
    child.write_text(f"c = LOAD '{SF}/nation.parquet';\n"
                     "d = FILTER c BY missing_col > 0;\n")
    script = tmp_path / "parent.pig"
    script.write_text(f"a = LOAD '{SF}/region.parquet';\n"
                      f"exec {child};\n")
    assert cli.main(["-c", str(script)]) == 1
    assert "missing_col" in capsys.readouterr().err


def test_version_flag(capsys):
    """-version prints the version and exits 0 without a session."""
    assert cli.main(["-version"]) == 0
    assert "version" in capsys.readouterr().out


def test_exectype_local_runs(eng, tmp_path):
    """pig -x local script.pig — the tutorial invocation — must run
    (local exectype maps to a local master)."""
    script = tmp_path / "x.pig"
    script.write_text(f"a = LOAD '{SF}/region.parquet';\n"
                      f"STORE a INTO '{tmp_path}/xl';\n")
    assert cli.main(["-x", "local", str(script)]) == 0
    assert (tmp_path / "xl").exists()


def test_warning_flag_prints_aggregate_counts(eng, tmp_path, capsys):
    """-w turns on Pig's aggregate warning counters: a script with
    failing casts ends with the Encountered Warning total lines."""
    spark = eng.spark
    script = tmp_path / "w.pig"
    script.write_text(
        f"a = LOAD '{SF}/region.parquet';\n"
        f"b = FOREACH a GENERATE (int)r_name AS v;\n"
        f"STORE b INTO '{tmp_path}/wout';\n")
    try:
        assert cli.main(["-w", str(script)]) == 0
        err = capsys.readouterr().err
        assert "Encountered Warning" in err
        assert "FIELD_DISCARDED_TYPE_CONVERSION_FAILED" in err
    finally:
        spark.conf.set("spark.spork.warnings.enabled", "false")


def test_logfile_collects_error_lines(eng, tmp_path, capsys):
    """-l FILE appends the clean ERROR line to the logfile too."""
    script = tmp_path / "boom.pig"
    script.write_text(f"a = LOAD '{SF}/region.parquet';\n"
                      "b = FILTER a BY nope > 1;\n")
    log = tmp_path / "pig.log"
    assert cli.main(["-l", str(log), str(script)]) == 2
    assert "ERROR:" in log.read_text()
    capsys.readouterr()


def test_optimizer_off_multiquery_maps_to_no_multiquery(eng, tmp_path,
                                                        capsys):
    """-t MultiQueryOptimizer behaves like -M; other rule names warn
    and are ignored (Catalyst owns those rewrites)."""
    spark = eng.spark
    try:
        assert cli.main(
            ["-t", "MultiQueryOptimizer", "-t", "PushUpFilter", "-e",
             f"a = LOAD '{SF}/region.parquet'; "
             f"STORE a INTO '{tmp_path}/topt';"]) == 0
        assert spark.conf.get("spark.spork.multiquery.enabled") == "false"
        assert "PushUpFilter" in capsys.readouterr().err
    finally:
        spark.conf.set("spark.spork.multiquery.enabled", "true")


def test_end_to_end_user_journey(eng, tmp_path, capsys):
    """A realistic script through main(): cd + relative paths,
    set default_parallel, a join+group pipeline, DUMP in TupleFormat,
    STORE with schema sidecar, -w warning aggregation — the way a Pig
    user would actually run the engine."""
    import shutil

    spark = eng.spark
    shutil.copy(f"{SF}/nation.parquet", tmp_path / "nation.parquet")
    shutil.copy(f"{SF}/region.parquet", tmp_path / "region.parquet")
    script = tmp_path / "journey.pig"
    script.write_text(f"""
        cd {tmp_path};
        set default_parallel 4;
        n = LOAD 'nation.parquet';
        r = LOAD 'region.parquet';
        j = JOIN n BY n_regionkey, r BY r_regionkey USING 'replicated';
        g = GROUP j BY r_name;
        s = FOREACH g GENERATE group AS region, COUNT_STAR(j) AS nations,
                               (int)group AS bad_cast;
        o = ORDER s BY region;
        DUMP o;
        STORE o INTO 'out' USING PigStorage(',', '-schema');
    """)
    import os
    old_cwd = os.getcwd()
    old_par = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        assert cli.main(["-w", str(script)]) == 0
        out, err = capsys.readouterr()
        assert "(AFRICA,5,)" in out            # TupleFormat, failed cast null
        assert "Encountered Warning" in err    # -w aggregate counters
        back = eng.spark.read.options(sep=",", header="false") \
            .csv(str(tmp_path / "out"))
        assert back.count() == 5
        assert (tmp_path / "out" / ".pig_schema").exists()
    finally:
        os.chdir(old_cwd)
        spark.conf.set("spark.sql.shuffle.partitions", old_par)
        spark.conf.set("spark.spork.warnings.enabled", "false")
