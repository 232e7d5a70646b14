"""ngram_jaccard_pairs document-frequency cap: above-max-df caps change
nothing; a biting cap removes boilerplate shingles from intersection AND
sizes (exact Jaccard over the kept shingle sets)."""

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    ngram_jaccard_pairs,
)

# 4 docs sharing the boilerplate prefix "terms of service apply" (the
# 3-shingles of which hit df=4); docs 1/2 also share a genuine 5-word tail.
_DOCS = [
    (1, "terms of service apply unique alpha beta gamma delta one"),
    (2, "terms of service apply unique alpha beta gamma delta two"),
    (3, "terms of service apply completely different content here now three"),
    (4, "terms of service apply unrelated words in this document body four"),
]


def _pairs(spark, **kw):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    out = ngram_jaccard_pairs(df, threshold=0.01, **kw)
    return {(r.id_a, r.id_b): round(r.jaccard, 4) for r in out.collect()}


def test_cap_above_max_df_is_identity(spark):
    assert _pairs(spark, max_shingle_df=100) == _pairs(spark)


def test_biting_cap_drops_boilerplate_pairs(spark):
    uncapped = _pairs(spark)
    capped = _pairs(spark, max_shingle_df=3)
    # Boilerplate-only pairs (3&4 share only the df=4 prefix shingles)
    # disappear under the cap; the genuine 1-2 near-dup pair survives.
    assert (3, 4) in uncapped and (3, 4) not in capped
    assert (1, 2) in capped
    # With the df=4 prefix shingles gone, the 1-2 Jaccard is exact over
    # the remaining shingles: docs 1/2 have 8 distinct 3-shingles each,
    # 2 were dropped (prefix), 5 of the kept 6 agree → 5 / (6+6-5).
    assert capped[(1, 2)] == round(5 / 7, 4)


def test_simhash_bits_over_60_raises(spark):
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        simhash, simhash_table,
    )
    with pytest.raises(ValueError, match="bits"):
        simhash(F.lit("x"), bits=64)
    with pytest.raises(ValueError, match="bits"):
        simhash_table(spark.createDataFrame([(1, "x")], ["doc_id", "text"]),
                      bits=61)
