"""Scale-safety checks for the text-dedup operators: the hot-gram
document-frequency cap must bound the n-gram self-join's candidate
row count (the uncapped join is quadratic in per-gram df)."""

from pyspark.sql import functions as F

from netrunner_spark.operators import textops


def _docs(spark, n_docs=40):
    # every doc shares the stop-gram-rich prefix; each pair also shares
    # a rare suffix with its neighbor → capped join must keep real
    # pairs while dropping the hot-gram blowup
    rows = [
        (i, ("the the the the common prefix " * 3) + f"rare{i // 2}tail")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_gram_cap_bounds_join(spark):
    docs = _docs(spark)
    uncapped = textops.jaccard_pairs(docs)
    capped = textops.jaccard_pairs(docs, max_gram_df=4)
    n_unc = uncapped.count()
    n_cap = capped.count()
    # uncapped: every doc pairs with every other via the shared prefix
    assert n_unc == 40 * 39 // 2
    # capped: only the rare-suffix neighbor pairs survive as candidates
    assert n_cap < n_unc / 10
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (0, 1) in pairs and (38, 39) in pairs
    # denominators still count ALL grams (cap affects candidates only)
    row = capped.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1)).first()
    full = textops.exploded_grams(docs.filter(F.col("doc_id") == 0), 3).select(
        "gram"
    ).dropDuplicates().count()
    assert row["grams_a"] == full
