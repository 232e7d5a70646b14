"""Debug helper: python tests/compare_one.py <query_name> [sf_dir] —
prints spark vs duckdb rows side by side for one catalog query."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from harvesting_extract_to_ttl_service_spark import get_spark
from harvesting_extract_to_ttl_service_spark.plans.tables import TABLES


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("compare-one", cpus=4)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = entry_mod.queries()[name](spark, sf_dir)
    srows = sorted([tuple(r) for r in sdf.collect()], key=lambda r: tuple(map(str, r)))
    res = con.execute(entry_mod.oracle_sql()[name])
    ocols = [d[0] for d in res.description]
    orows = sorted(res.fetchall(), key=lambda r: tuple(map(str, r)))
    print("spark cols:", sdf.columns)
    print("duck  cols:", ocols)
    print(f"spark rows: {len(srows)}  duck rows: {len(orows)}")
    shown = 0
    for i in range(max(len(srows), len(orows))):
        s = srows[i] if i < len(srows) else None
        o = orows[i] if i < len(orows) else None
        if s != o and shown < 10:
            print(f"  S: {s}\n  D: {o}\n  --")
            shown += 1
    if shown == 0:
        print("rows identical (as position-sorted tuples)")


if __name__ == "__main__":
    main()
