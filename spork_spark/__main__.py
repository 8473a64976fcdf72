"""CLI entry point (SURVEY.md §3.1 entry point 1, both modes):

  python -m spork_spark script.pig [-p name=value]...   # `pig script.pig`
  python -m spork_spark                                 # `pig` -> grunt>

The interactive shell is the reference's Grunt loop (pig:src/org/apache/
pig/tools/grunt/Grunt.java): statements accumulate until a terminating
';' outside strings/braces, execute against a persistent alias
environment, and errors return to the prompt instead of exiting.
"""

from __future__ import annotations

import argparse
import re
import sys


def _statement_complete(buf: str) -> bool:
    """True when the buffer holds >= 1 complete statement: every {...}
    block closed, no open string, and the last significant character is
    ';' ('--' comments ignored)."""
    depth, in_s, last_sig = 0, None, ""
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if in_s:
            if c == "\\":
                i += 2
                continue
            if c == in_s:
                in_s = None
            last_sig = c
        elif c in ("'", '"'):
            in_s = c
            last_sig = c
        elif c == "-" and buf[i:i + 2] == "--":
            j = buf.find("\n", i)
            i = n if j < 0 else j
            continue
        else:
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            if not c.isspace():
                last_sig = c
        i += 1
    return in_s is None and depth <= 0 and last_sig == ";"


_DECL_RE = re.compile(r"(?m)^[ \t]*%(?:declare|default)\b[^\n]*$")
_MACRO_START_RE = re.compile(
    r"DEFINE\s+\w+\s*\([^)]*\)\s+RETURNS\s+\S+\s*\{", re.I)


def _only_preproc(buf: str) -> bool:
    """%declare/%default are LINE-terminated (no ';' required)."""
    lines = [ln.strip() for ln in buf.splitlines()]
    lines = [ln for ln in lines if ln and not ln.startswith("--")]
    return bool(lines) and all(ln.startswith("%") for ln in lines)


def _textual_state(chunk: str) -> list[str]:
    """Extract the pieces of a chunk that exist only as TEXT — macro
    DEFINEs (brace-scanned, nested blocks included) and
    %declare/%default lines — so they can be replayed before later
    statements (macro expansion and param substitution are pure text
    passes; replaying them is idempotent)."""
    out = [m.group(0) + "\n" for m in _DECL_RE.finditer(chunk)]
    for m in _MACRO_START_RE.finditer(chunk):
        depth, i = 1, m.end()
        while i < len(chunk) and depth:
            if chunk[i] == "{":
                depth += 1
            elif chunk[i] == "}":
                depth -= 1
            i += 1
        while i < len(chunk) and chunk[i] in " \t\n;":
            i += 1
            if chunk[i - 1] == ";":
                break
        out.append(chunk[m.start():i] + "\n")
    return out


def grunt(engine, params: dict) -> int:
    """Interactive Grunt loop over ONE persistent PigParser: aliases,
    UDF DEFINEs, and set/register state carry across statements.
    Textual state (macros, %declare/%default) is harvested from each
    SUCCESSFUL chunk into a prelude that is re-prepended to later
    runs; failed chunks leave the session untouched."""
    from .parser import PigParser

    p = PigParser(engine)
    prelude: list[str] = []
    interactive = sys.stdin.isatty()
    if interactive:
        print("spork_spark grunt shell — end statements with ';', "
              "'quit;' to exit")
    buf = ""
    while True:
        try:
            line = input("grunt> " if not buf.strip() else "    >> ") \
                if interactive else input()
        except EOFError:
            return 0
        if not buf.strip() and line.strip().rstrip(";").lower() in (
                "quit", "exit"):
            return 0
        buf += line + "\n"
        if not (_statement_complete(buf) or _only_preproc(buf)):
            continue
        chunk, buf = buf, ""
        try:
            p.run("".join(prelude) + chunk, params)
        except Exception as exc:  # grunt survives bad statements
            print(f"ERROR: {exc}", file=sys.stderr)
            continue
        prelude.extend(_textual_state(chunk))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="spork_spark",
        description="Run a Pig Latin script on the PySpark-native engine "
                    "(no script -> interactive grunt shell)")
    ap.add_argument("script", nargs="?", default=None,
                    help="path to .pig script ('-' for stdin); omit for "
                         "the interactive grunt shell")
    ap.add_argument("-p", "--param", action="append", default=[],
                    metavar="NAME=VALUE", help="parameter substitution")
    ap.add_argument("--master", default=None, help="Spark master override")
    ap.add_argument("--explain", action="store_true",
                    help="print the physical plan of every defined alias")
    args = ap.parse_args(argv)

    params = dict(p.split("=", 1) for p in args.param)

    from . import Engine, get_spark
    from .parser import run_script

    spark = get_spark(app_name=f"spork:{args.script or 'grunt'}",
                      master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    engine = Engine(spark)

    if args.script is None:
        return grunt(engine, params)

    src = sys.stdin.read() if args.script == "-" else open(args.script).read()
    rels = run_script(engine, src, params=params)
    if args.explain:
        for name, rel in rels.items():
            print(f"-- {name} " + "-" * 50)
            rel.explain()
    return 0


if __name__ == "__main__":
    sys.exit(main())
