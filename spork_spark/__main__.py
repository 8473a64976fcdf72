"""CLI entry point — `python -m spork_spark script.pig [-p name=value]…`
is the engine's `pig -x spark script.pig` (SURVEY.md §3.1 entry point 1).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="spork_spark",
        description="Run a Pig Latin script on the PySpark-native engine")
    ap.add_argument("script", help="path to .pig script ('-' for stdin)")
    ap.add_argument("-p", "--param", action="append", default=[],
                    metavar="NAME=VALUE", help="parameter substitution")
    ap.add_argument("--master", default=None, help="Spark master override")
    ap.add_argument("--explain", action="store_true",
                    help="print the physical plan of every defined alias")
    args = ap.parse_args(argv)

    src = sys.stdin.read() if args.script == "-" else open(args.script).read()
    params = dict(p.split("=", 1) for p in args.param)

    from . import Engine, get_spark
    from .parser import run_script

    spark = get_spark(app_name=f"spork:{args.script}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    rels = run_script(Engine(spark), src, params=params)
    if args.explain:
        for name, rel in rels.items():
            print(f"-- {name} " + "-" * 50)
            rel.explain()
    return 0


if __name__ == "__main__":
    sys.exit(main())
