"""Defensive fixture-shape tests for plans/tables.load.

The driver regenerates /root/testdata per round and has already shipped
``events.ts`` as both TIMESTAMP(NANOS) (long under nanosAsLong) and plain
TIMESTAMP(MICROS). ``load`` must succeed for every table at every SF dir
present, and ``events.ts`` must come back a timestamp type — so the next
fixture regeneration fails ONE obvious test instead of five opaque
catalog entries (VERDICT r03 item 4).
"""

import glob
import os

import pytest
from pyspark.sql.types import TimestampNTZType, TimestampType

from harvesting_extract_to_ttl_service_spark.plans.tables import TABLES, load

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("table", TABLES)
def test_load_succeeds(spark, sf, table):
    df = load(spark, sf, table)
    assert len(df.schema.fields) > 0
    if table == "events":
        assert isinstance(df.schema["ts"].dataType,
                          (TimestampType, TimestampNTZType)), (
            f"events.ts loaded as {df.schema['ts'].dataType} from {sf}")
        # The load must also survive analysis + execution, not just schema.
        assert df.limit(1).count() >= 0
