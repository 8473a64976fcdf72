"""Bag-pipeline fusions (compiler/bagfuse.py): the nested ORDER+LIMIT
top-k idiom and the inner-CROSS aggregate idiom compile to window/join
relational plans instead of per-group interpreted array HOFs — plan
shape AND result parity with the unfused semantics are pinned here
(the unfused path stays reachable: any off-pattern generator falls
back, asserted below)."""

import pytest

from spork_spark import col, fn
from spork_spark.parser import run_script


def plan_of(rel) -> str:
    df = rel.df() if hasattr(rel, "df") else rel
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sales(eng, spark):
    rows = [("a", 10.0), ("a", 30.0), ("a", 20.0), ("a", 40.0),
            ("b", 5.0), ("b", None), ("c", 100.0), (None, 7.0),
            (None, 3.0)]
    df = spark.createDataFrame(rows, "cust string, price double")
    return eng.from_df(df, alias="s")


def test_topk_fusion_plan_and_results(eng, sales):
    """ORDER+LIMIT+aggregate compiles to a row_number window +
    HashAggregate — no bag materialization — and matches the Pig
    semantics: per-group top-2 by price DESC (nulls last), null group
    key is a real group."""
    out = run_script(eng, """
        g = GROUP s BY cust;
        r = FOREACH g { srt = ORDER s BY price DESC;
                        top = LIMIT srt 2;
                        GENERATE group AS cust, COUNT_STAR(top) AS n,
                                 SUM(top.price) AS total; };
        out = ORDER r BY cust;
    """, relations={"s": sales})["out"]
    p = plan_of(out)
    assert "collect_list" not in p
    assert "row_number" in p
    rows = {r["cust"]: (r["n"], r["total"]) for r in out.df().collect()}
    assert rows == {"a": (2, 70.0), "b": (2, 5.0), "c": (1, 100.0),
                    None: (2, 10.0)}


def test_topk_fusion_builder_api_asc(eng, sales):
    """Builder-form SORT_BAG(bag, field, asc) + LIMIT_BAG fuses too and
    honors the asc flag (bottom-2: nulls sort first under ASC — Pig
    nulls smallest — so b's bag is [null, 5.0] and SUM skips the
    null)."""
    r = (sales.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("SUM",
                     fn("LIMIT_BAG",
                        fn("SORT_BAG", col("s"), "price", True),
                        2).get("price")).alias("low2")))
    p = plan_of(r)
    assert "collect_list" not in p and "row_number" in p
    out = {x["cust"]: x["low2"] for x in r.df().collect()}
    assert out == {"a": 30.0, "b": 5.0, "c": 100.0, None: 10.0}


def test_topk_fusion_bails_on_raw_bag_reference(eng, sales):
    """A generator over the UNlimited bag must see every row — the
    fusion declines (collect_list materializes) and the HOF path still
    answers right."""
    r = (sales.group_by(col("cust"))
         .foreach(col("group").alias("cust"),
                  fn("COUNT_STAR", col("s")).alias("n_all"),
                  fn("SUM",
                     fn("LIMIT_BAG",
                        fn("SORT_BAG", col("s"), "price", False),
                        2).get("price")).alias("top2")))
    p = plan_of(r)
    assert "collect_list" in p           # fusion correctly declined
    out = {x["cust"]: (x["n_all"], x["top2"]) for x in r.df().collect()}
    assert out == {"a": (4, 70.0), "b": (2, 5.0), "c": (1, 100.0),
                   None: (2, 10.0)}


def test_inner_cross_fusion(eng, spark):
    """Inner CROSS + aggregates compiles to a key-equi-join (no
    flattened cross arrays); a group whose cross is EMPTY still emits
    Pig's (key, 0, null) aggregate-over-empty-bag row; a null group
    key groups and joins null-safely."""
    rows = [("p1", 500.0), ("p1", 450.0), ("p1", 10.0), ("p1", 20.0),
            ("p2", 600.0), ("p2", 5.0),
            ("p3", 50.0), ("p3", 60.0),          # no hi, no lo -> empty
            (None, 700.0), (None, 1.0)]
    df = spark.createDataFrame(rows, "pri string, v double")
    rel = eng.from_df(df, alias="o")
    out = run_script(eng, """
        g = GROUP o BY pri;
        x = FOREACH g { hv0 = FOREACH o GENERATE v AS hv;
                        hi = FILTER hv0 BY hv > 400.0;
                        lv0 = FOREACH o GENERATE v AS lv;
                        lo = FILTER lv0 BY lv < 30.0;
                        c = CROSS hi, lo;
                        d = FOREACH c GENERATE (hv - lv) AS spread;
                        GENERATE group AS pri, COUNT_STAR(c) AS n,
                                 SUM(d.spread) AS total; };
        out = ORDER x BY pri;
    """, relations={"o": rel})["out"]
    p = plan_of(out)
    assert "flatten(" not in p           # no interpreted cross array
    assert "Join" in p                   # compiled as a relational join
    got = [(r["pri"], r["n"], r["total"]) for r in out.df().collect()]
    # Pig nulls-first ordering on the final ORDER BY
    assert got == [
        (None, 1, 699.0),                 # 700 x 1
        ("p1", 4, 1840.0),                # (500,450) x (10,20)
        ("p2", 1, 595.0),                 # 600 x 5
        ("p3", 0, None),                  # empty cross -> (key, 0, null)
    ]
