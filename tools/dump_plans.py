"""Dump .explain('formatted') for named registry queries to
plans/<round>/<query>_<tag>.txt (the optimization-round evidence files).

Usage: python tools/dump_plans.py before q1,q2,... [--round r10]
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    rnd = "r10"
    if "--round" in sys.argv:
        rnd = sys.argv[sys.argv.index("--round") + 1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    import __spark_entry__ as m
    from spork_spark import get_spark
    spark = get_spark(master="local[4]",
                      extra_conf={**bench.LATENCY_PROFILE,
                                  "spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    os.makedirs(f"plans/{rnd}", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/{rnd}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
