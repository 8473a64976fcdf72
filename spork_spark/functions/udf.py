"""User-defined function surface (SURVEY.md §2.10).

The reference's scripting UDFs (Jython/CPython: ``@outputSchema('t:int')``
decorated Python functions registered via REGISTER … USING jython) map
natively: plain Python functions with a declared return type. The
``output_schema`` decorator mirrors Pig's annotation; ``Engine.
register_udf`` wires the function into the expression language by name.

Builtins NEVER route through here — the translation table compiles them to
native Columns. UDFs are the explicit slow path; ``vectorized=True``
(Arrow pandas_udf) is the fast lane when Python is genuinely needed.
"""

from __future__ import annotations

import re

# Pig schema strings ('name:int') → Spark DDL types
_PIG_TYPE_MAP = {
    "int": "int", "long": "bigint", "float": "float", "double": "double",
    "chararray": "string", "bytearray": "binary", "boolean": "boolean",
    "datetime": "timestamp",
}


def pig_schema_to_ddl(s: str) -> str:
    """'x:int' → 'int'; 'b:bag{t:(v:int)}' → 'array<struct<v:int>>';
    't:(a:int,b:chararray)' → 'struct<a:int,b:string>'; map[] → map."""
    s = s.strip()
    m = re.match(r"^\w+:(.+)$", s) if ":" in s and not s.startswith(
        ("bag", "tuple", "map", "(", "{")) else None
    body = m.group(1).strip() if m else s
    if body.startswith("{") or body.startswith("bag{"):
        inner = body[body.index("{") + 1:body.rindex("}")]
        return f"array<{pig_schema_to_ddl(inner)}>"
    if body.startswith("(") or body.startswith("tuple("):
        inner = body[body.index("(") + 1:body.rindex(")")]
        fields = [f.strip() for f in _split_top(inner)]
        cols = []
        for f in fields:
            name, _, t = f.partition(":")
            cols.append(f"{name.strip()}:{pig_schema_to_ddl(t or 'bytearray')}")
        return "struct<" + ",".join(cols) + ">"
    if body.startswith("map"):
        return "map<string,string>"
    return _PIG_TYPE_MAP.get(body, body)


def _split_top(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def output_schema(schema: str):
    """Pig's @outputSchema analog: declare the UDF return type with a Pig
    schema string. Engine.register_udf reads the annotation."""
    def deco(fn):
        fn.__pig_output_schema__ = pig_schema_to_ddl(schema)
        return fn
    return deco
