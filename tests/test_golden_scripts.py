"""Golden e2e script harness (SURVEY.md §5.2.3) — the reference's
test/e2e/pig nightly.conf model: each .pig script runs through the full
parse→lower→compile path at sf0.001 and its `out` alias is diffed against
a checked-in expected TSV (golden files verified against DuckDB at
creation time).

Regenerate goldens after an intentional semantic change with:
    python tests/test_golden_scripts.py --regen
"""

import pathlib

import pytest

from spork_spark.parser import run_script

SF = "/root/testdata/sf0.001"
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
SCRIPTS = sorted(GOLDEN_DIR.glob("*.pig"))


def _fmt_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.4f}"
    return str(v)


def run_golden(eng, script_path: pathlib.Path) -> list[str]:
    src = script_path.read_text()
    rels = run_script(eng, src, params={"sf": SF})
    assert "out" in rels, f"{script_path.name} must define alias 'out'"
    df = rels["out"].df()
    header = "\t".join(df.columns)
    lines = ["\t".join(_fmt_cell(v) for v in row) for row in df.collect()]
    return [header] + lines


@pytest.mark.parametrize("script", SCRIPTS, ids=[s.stem for s in SCRIPTS])
def test_golden(eng, script):
    expected_path = script.with_suffix(".expected.tsv")
    got = run_golden(eng, script)
    assert expected_path.exists(), \
        f"missing golden file {expected_path.name} — run --regen"
    expected = expected_path.read_text().rstrip("\n").split("\n")
    assert got == expected, (
        f"{script.name}: output differs from golden "
        f"({len(got)-1} vs {len(expected)-1} rows)")


if __name__ == "__main__":
    import sys
    if "--regen" in sys.argv:
        from spork_spark import Engine, get_spark
        spark = get_spark(master="local[8]")
        spark.sparkContext.setLogLevel("ERROR")
        eng = Engine(spark)
        for s in SCRIPTS:
            out = run_golden(eng, s)
            s.with_suffix(".expected.tsv").write_text("\n".join(out) + "\n")
            print(f"regenerated {s.stem}: {len(out)-1} rows")
