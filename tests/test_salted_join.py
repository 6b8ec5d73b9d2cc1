"""salted_join: exact parity with the plain join (multiplicity included)
on a skew-hot corpus, plus the plan evidence that the shuffle key is
widened by the salt."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from epstein_browser_spark.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=0) owns ~90% of rows; values differ so the salt spreads
    rows = [(0, i) for i in range(900)] + [(k, k * 1000) for k in range(1, 101)]
    return spark.createDataFrame(rows, ["k", "v"])


@pytest.fixture(scope="module")
def dim(spark):
    # duplicate dim keys on purpose: join multiplicity must survive salting
    rows = [(k, f"a{k}") for k in range(0, 120, 2)] + [(0, "dup0"), (4, "dup4")]
    return spark.createDataFrame(rows, ["k", "name"])


def _sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("n_salts", [1, 4, 16])
def test_salted_join_parity(spark, skewed, dim, how, n_salts):
    plain = skewed.join(dim, "k", how)
    salted = salted_join(skewed, dim, "k", n_salts=n_salts, how=how)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_join_widens_shuffle_key(spark, skewed, dim):
    df = salted_join(skewed, dim, "k", n_salts=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "_salt" in plan and "hashpartitioning(k" in plan


def test_salted_join_validates(spark, skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="right")
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", n_salts=0)
    with pytest.raises(ValueError):
        # non-key column collision must be rejected, not silently aliased
        salted_join(skewed, skewed, "k")
    with pytest.raises(ValueError):
        # a real _salt column would be clobbered then dropped — refuse
        salted_join(skewed.withColumnRenamed("v", "_salt"), dim, "k")
    with pytest.raises(ValueError):
        salted_join(skewed, dim.withColumnRenamed("name", "_salt"), "k")
