"""Diagnostics crash-freedom sweep: DESCRIBE/EXPLAIN every alias of
every golden script, ILLUSTRATE a diverse subset — the Pig diagnostic
surface (SURVEY.md §2.1 #32) must never throw on a plan the engine can
execute."""

import contextlib
import io
import pathlib

import pytest

from spork_spark.parser import run_script

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
SCRIPTS = sorted(GOLDEN_DIR.glob("*.pig"))

# lineage variety: nested block, cogroup+cross, cube, join+agg, windows
ILLUSTRATE_SUBSET = {"nested_block", "cogroup_cross", "cube_mixed",
                     "analytics_mix", "macro_wordcount"}


@pytest.mark.parametrize("script", SCRIPTS, ids=[s.stem for s in SCRIPTS])
def test_describe_explain_every_alias(eng, script, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)       # STOREs in goldens write cwd-relative
    rels = run_script(eng, script.read_text(), params={"sf": SF})
    for name, rel in rels.items():
        d = rel.describe()
        assert name in d or ":" in d or "{" in d
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rel.explain("simple")
        assert buf.getvalue().strip()


@pytest.mark.parametrize(
    "script",
    [s for s in SCRIPTS if s.stem in ILLUSTRATE_SUBSET],
    ids=[s.stem for s in SCRIPTS if s.stem in ILLUSTRATE_SUBSET])
def test_illustrate_out_alias(eng, script, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rels = run_script(eng, script.read_text(), params={"sf": SF})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rels["out"].illustrate(n=2)
    assert buf.getvalue().strip()
