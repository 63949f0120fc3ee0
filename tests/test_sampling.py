"""Deterministic dataset splitting (operators/sampling.split_assign)."""

import numpy as np
import pandas as pd
import pytest

from eo_tools_spark.operators.sampling import _validate_fractions, split_assign

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def docs(spark, n=2000, start=0):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(start, start + n),
                      "stratum": np.arange(start, start + n) % 4}),
    )


class TestHashSplit:
    def test_deterministic_and_total(self, spark):
        d = docs(spark)
        a = split_assign(d, FRACS).toPandas().set_index("doc_id").split
        b = split_assign(d, FRACS).toPandas().set_index("doc_id").split
        assert a.equals(b)
        assert set(a.unique()) <= set(FRACS)
        # fractions hold within binomial noise at n=2000
        fr = a.value_counts(normalize=True)
        assert abs(fr["train"] - 0.8) < 0.03
        assert abs(fr["val"] - 0.1) < 0.02 and abs(fr["test"] - 0.1) < 0.02

    def test_assignment_stable_under_corpus_growth(self, spark):
        """The property that makes hash splits right for incremental
        ingestion: adding rows never reassigns existing ids."""
        small = split_assign(docs(spark, 500), FRACS).toPandas()
        big = split_assign(docs(spark, 2000), FRACS).toPandas()
        merged = small.merge(big, on="doc_id", suffixes=("_s", "_b"))
        assert (merged.split_s == merged.split_b).all()

    def test_salt_changes_assignment(self, spark):
        a = split_assign(docs(spark), FRACS, salt="s1").toPandas() \
            .set_index("doc_id").split.sort_index()
        b = split_assign(docs(spark), FRACS, salt="s2").toPandas() \
            .set_index("doc_id").split.sort_index()
        assert not a.equals(b)

    def test_quoted_salt_rejected(self, spark):
        with pytest.raises(ValueError, match="salt"):
            split_assign(docs(spark), FRACS, salt="run's-v2")

    def test_null_id_raises_not_silently_buckets(self, spark):
        """NULL ids would hash to NULL and fall through every WHEN into
        the LAST split (the eval holdout) — must raise instead."""
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": pd.array([1, None], dtype="Int64")})
        )
        with pytest.raises(Exception, match="NULL doc_id"):
            split_assign(d, FRACS).collect()

    def test_zero_shuffle_plan(self, spark):
        out = split_assign(docs(spark), FRACS)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestExactSplit:
    def test_exact_per_stratum_counts(self, spark):
        out = split_assign(
            docs(spark, 400), FRACS, strata_col="stratum", method="exact"
        ).toPandas()
        for s, g in out.groupby("stratum"):
            counts = g.split.value_counts()
            # 100 rows per stratum → exactly 80/10/10
            assert counts["train"] == 80 and counts["val"] == 10
            assert counts["test"] == 10

    def test_exact_counts_survive_float_boundaries(self, spark):
        """Regression (round-6 review): (ub/1e6)*n float arithmetic
        loses exactness — 0.58 of 50 evaluated to 28.999…, assigning
        28 rows instead of 29. Integer form must give ceil-exact
        counts at every such boundary."""
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": np.arange(50), "stratum": 0})
        )
        out = split_assign(
            d, {"a": 0.58, "b": 0.42}, strata_col="stratum", method="exact"
        ).toPandas()
        counts = out.split.value_counts()
        assert counts["a"] == 29 and counts["b"] == 21

    def test_exact_requires_strata(self, spark):
        with pytest.raises(ValueError, match="strata_col"):
            split_assign(docs(spark), FRACS, method="exact")

    def test_exact_large_stratum_no_int32_overflow(self, spark):
        """Regression (round-6 ADVICE): rn * 1e6 as int×int overflows
        int32 for any stratum > 2147 rows — ANSI crash, or silent
        wrong assignment under non-ANSI. The row_number side must be
        promoted to long. 5000-row stratum → exactly 4000/500/500."""
        d = spark.createDataFrame(
            pd.DataFrame({"doc_id": np.arange(5000), "stratum": 0})
        )
        out = split_assign(
            d, FRACS, strata_col="stratum", method="exact"
        ).toPandas()
        counts = out.split.value_counts()
        assert counts["train"] == 4000
        assert counts["val"] == 500 and counts["test"] == 500


class TestValidation:
    def test_fraction_contracts(self):
        with pytest.raises(ValueError, match="sum to 1"):
            _validate_fractions({"a": 0.5, "b": 0.4})
        with pytest.raises(ValueError, match="at least one"):
            _validate_fractions({})
        with pytest.raises(ValueError, match="non-negative"):
            _validate_fractions({"a": 1.5, "b": -0.5})
        bounds = _validate_fractions({"train": 0.9, "val": 0.05, "test": 0.05})
        assert bounds == [("train", 900000), ("val", 950000), ("test", 1000000)]

    def test_unknown_method_raises(self, spark):
        with pytest.raises(ValueError, match="method"):
            split_assign(docs(spark), FRACS, method="bogus")
