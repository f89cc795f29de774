#!/usr/bin/env python3
"""Generate output-pinned DuckDB VALUES oracles (the q85/q130 idiom)
from two independent Verify dumps.

Usage: python3 tools/pin_values.py <verifyOut1> <verifyOut2> <query>...

For each query: asserts the two dumps are bit-identical (determinism
proof — a pin of a nondeterministic value would flake the gate), then
prints a Scala `val qNN: String = ...` VALUES literal with the driver's
type discipline: BIGINT/INTEGER casts for ints, CAST('<repr>' AS
DOUBLE) for doubles (strtod round-trips the IEEE value; a bare decimal
literal goes through DuckDB DECIMAL and can land one ulp off), TRUE/
FALSE for booleans, quoted strings. Writes the block between the
GENERATED-PINS markers in PinnedOracles.scala when --apply is passed.
"""
import sys
import pandas as pd
import numpy as np


def sql_cell(v, dtype):
    if v is None or (isinstance(v, float) and np.isnan(v) and "float" not in str(dtype)):
        return "NULL"
    s = str(dtype)
    if s == "int64":
        return f"CAST({int(v)} AS BIGINT)"
    if s == "int32":
        return f"CAST({int(v)} AS INTEGER)"
    if s == "float64":
        if np.isnan(v):
            return "CAST('nan' AS DOUBLE)"
        return f"CAST('{repr(float(v))}' AS DOUBLE)"
    if s == "bool":
        return "TRUE" if v else "FALSE"
    if s == "object":
        return "'" + str(v).replace("'", "''") + "'"
    raise SystemExit(f"unhandled dtype {s} for {v!r}")


def literal(df: pd.DataFrame) -> str:
    rows = []
    for _, r in df.iterrows():
        cells = ",".join(sql_cell(r[c], df[c].dtype) for c in df.columns)
        rows.append(f"  ({cells})")
    # always quote: a column named like a keyword (e.g. "group") must
    # still parse in the AS t(...) alias list
    cols = ", ".join(f'"{c}"' for c in df.columns)
    body = ",\n".join(rows)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({cols})"


def scala_val(name: str, sql: str) -> str:
    lines = sql.split("\n")
    quoted = "\n".join(
        ('    """' if i == 0 else "      |") + ln for i, ln in enumerate(lines))
    return f"  val {name}: String =\n{quoted}\"\"\".stripMargin\n"


def main():
    apply_mode = "--apply" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--apply"]
    out1, out2, queries = args[0], args[1], args[2:]
    blocks = []
    for q in queries:
        a = pd.read_parquet(f"{out1}/{q}")
        b = pd.read_parquet(f"{out2}/{q}")
        a = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
        b = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
        if not a.equals(b):
            print(f"!!! {q}: NOT DETERMINISTIC across the two drives — refusing to pin")
            diff = (a != b) & ~(a.isna() & b.isna())
            print(diff.sum())
            sys.exit(1)
        short = q.split("_")[0]
        blocks.append((short, literal(a)))
        print(f"{q}: deterministic, {len(a)} rows pinned")
    gen = "".join(scala_val(n, s) for n, s in blocks)
    if apply_mode:
        path = "src/main/scala/graft/queries/PinnedOracles.scala"
        src = open(path).read()
        start = src.index("// GENERATED-PINS-START")
        end = src.index("  // GENERATED-PINS-END")
        head = src[: src.index("\n", start) + 1]
        open(path, "w").write(head + gen + src[end:])
        print(f"wrote {len(blocks)} pins into {path}")
    else:
        print(gen)


if __name__ == "__main__":
    main()
