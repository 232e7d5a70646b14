#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r16/.

Usage: python scripts_r15_explain.py <suffix> [query ...]
Writes plans/r16/<query>_<suffix>.txt for each query (default: bench
HEADLINE list). Driver-side only — plans are built, never executed.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from harvesting_extract_to_ttl_service_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402
import bench  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    spark = get_spark("explain_r16", cpus=4)
    os.makedirs("plans/r16", exist_ok=True)
    for name in names:
        fn = bench._resolve(name)
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r16/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
