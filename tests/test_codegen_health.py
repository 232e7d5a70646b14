"""Codegen-health gate (round 16): every catalog entry must execute with
whole-stage codegen COMPILING.

Round 15 found the import pipeline's fused triage stage silently running
interpreted: Janino refuses generated methods over 64 KB, Spark logs
``ERROR CodeGenerator: Failed to compile`` and falls back to interpreted
evaluation for the whole fused stage — correctness is unaffected, so
nothing else notices. At 100 TB an interpreted hot stage is a silent
scale-killer. This test makes the next such fallback LOUD:
``spark.sql.codegen.fallback=false`` turns the catch-and-fall-back in
WholeStageCodegenExec into a raised exception naming the failing query.

Limitation (documented, accepted): the *hugeMethodLimit* bail-out —
generated code compiles but exceeds the JIT's 64 KB bytecode comfort
zone, so Spark falls back with only a WARN — happens after a SUCCESSFUL
compile and is not governed by ``codegen.fallback``; this gate catches
failed compiles (the r15 bug class), not JIT-pessimized ones.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_catalog_executes_with_codegen_fallback_disabled(spark):
    import __spark_entry__ as entry_mod

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name, fn in sorted(entry_mod.queries().items()):
            try:
                (fn(spark, SF_DIR)
                 .write.format("noop").mode("overwrite").save())
            except Exception as e:  # noqa: BLE001 — name the query
                pytest.fail(
                    f"catalog entry {name!r} failed with codegen fallback "
                    f"disabled — a whole-stage codegen unit no longer "
                    f"compiles (64 KB Janino limit?) and would silently "
                    f"run interpreted in production: {e}")
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
