"""Grunt shell (python -m spork_spark with no script): statement
accumulation, textual-state harvesting, and cross-run alias
persistence — the reference's interactive loop
(pig:src/org/apache/pig/tools/grunt/Grunt.java)."""

from spork_spark.__main__ import (_only_preproc, _statement_complete,
                                  _textual_state)
from spork_spark.parser import PigParser

SF = "/root/testdata/sf0.001"


def test_statement_complete_basic():
    assert _statement_complete("a = LOAD 'x';")
    assert _statement_complete("a = LOAD 'x';\n")
    assert not _statement_complete("a = LOAD 'x'")
    assert not _statement_complete("a = LOAD 'x'; b = FILTER a BY")


def test_statement_complete_strings_braces_comments():
    # ';' inside a string does not terminate
    assert not _statement_complete("a = FILTER x BY n == ';'")
    assert _statement_complete("a = FILTER x BY n == ';';")
    # open nested block holds the statement
    assert not _statement_complete("r = FOREACH g {\n  s = ORDER o BY k;")
    assert _statement_complete(
        "r = FOREACH g {\n  s = ORDER o BY k;\n  GENERATE group;\n};")
    # trailing comment after the ';' still counts as complete
    assert _statement_complete("a = LOAD 'x';  -- done")
    assert not _statement_complete("a = LOAD 'x' -- ; in a comment\n")


def test_only_preproc_lines():
    assert _only_preproc("%declare K 5\n")
    assert _only_preproc("%default A 1\n%declare B 2\n")
    assert not _only_preproc("%declare K 5\nc = FILTER a BY x < $K;")
    assert not _only_preproc("-- just a comment\n")


def test_textual_state_harvests_declares_and_macros():
    chunk = (
        "%declare CUT 10\n"
        "DEFINE m(rel) RETURNS out {\n"
        "  g = GROUP $rel BY k;\n"
        "  $out = FOREACH g { s = ORDER $rel BY v; t = LIMIT s 1;\n"
        "                     GENERATE group, MAX(t.v); };\n"
        "};\n"
        "x = m(a);\n")
    got = _textual_state(chunk)
    assert any(p.startswith("%declare CUT 10") for p in got)
    macro = [p for p in got if p.startswith("DEFINE")]
    # the nested FOREACH block must be scanned through, not cut at the
    # first '};'
    assert len(macro) == 1 and macro[0].rstrip().endswith("};")
    assert "GENERATE group, MAX(t.v)" in macro[0]
    # the trailing relational statement is NOT textual state
    assert not any("x = m(a)" in p for p in got)


def test_parser_state_persists_across_runs(eng):
    """The grunt loop's core contract: one PigParser, aliases from an
    earlier run() visible to later ones, and a failed run leaving the
    environment intact."""
    p = PigParser(eng)
    p.run(f"a = LOAD '{SF}/nation.parquet';")
    p.run("b = FILTER a BY n_nationkey < 3;")
    assert p.rels["b"].df().count() == 3
    try:
        p.run("c = FROB a;")
    except Exception:
        pass
    rels = p.run("d = FOREACH b GENERATE n_name;")
    assert "c" not in rels
    assert rels["d"].df().count() == 3
