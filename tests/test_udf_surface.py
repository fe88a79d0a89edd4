"""UDF / UDAF / UDTF surface (SURVEY.md §2B.11): each Python-extension
mechanism is exercised and checked against a built-in equivalent."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from shardpack_spark.tables import load_table


def test_scalar_python_udf(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(500)

    @F.udf(returnType=DoubleType())
    def revenue(price, disc):
        return price * (1.0 - disc)

    got = li.select(F.sum(revenue("l_extendedprice", "l_discount")).alias("s")).head()["s"]
    want = li.select(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s")
    ).head()["s"]
    assert got == pytest.approx(want)


def test_pandas_udf_scalar(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(500)

    @F.pandas_udf(DoubleType())
    def revenue(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    got = li.select(F.sum(revenue("l_extendedprice", "l_discount")).alias("s")).head()["s"]
    want = li.select(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s")
    ).head()["s"]
    assert got == pytest.approx(want)


def test_pandas_udf_grouped_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")

    @F.pandas_udf(DoubleType())
    def mean_price(v: pd.Series) -> float:
        return float(v.mean())

    got = {
        r["o_orderstatus"]: r["m"]
        for r in o.groupBy("o_orderstatus").agg(mean_price("o_totalprice").alias("m")).collect()
    }
    want = {
        r["o_orderstatus"]: r["m"]
        for r in o.groupBy("o_orderstatus").agg(F.avg("o_totalprice").alias("m")).collect()
    }
    assert got.keys() == want.keys()
    for k in got:
        assert got[k] == pytest.approx(want[k])


def test_apply_in_pandas_grouped_map(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    schema = StructType(
        [StructField("o_orderstatus", StringType()), StructField("n", LongType())]
    )

    def counter(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"o_orderstatus": [pdf["o_orderstatus"].iloc[0]], "n": [len(pdf)]})

    got = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus").applyInPandas(counter, schema).collect()
    }
    want = {
        r["o_orderstatus"]: r["count"]
        for r in o.groupBy("o_orderstatus").count().collect()
    }
    assert got == want


def test_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="n: int, sq: int")
    class Squares:
        def eval(self, start: int, end: int):
            for n in range(start, end + 1):
                yield n, n * n

    Squares = spark.udtf.register("squares_udtf", Squares)
    rows = spark.sql("SELECT * FROM squares_udtf(1, 4)").collect()
    assert [(r["n"], r["sq"]) for r in rows] == [(1, 1), (2, 4), (3, 9), (4, 16)]


def test_map_in_arrow(spark, sf_dir):
    import pyarrow as pa

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity").limit(1000)

    def double_qty(batches):
        for batch in batches:
            t = batch.to_pydict()
            yield pa.RecordBatch.from_pydict(
                {"l_orderkey": t["l_orderkey"], "qty2": [q * 2 for q in t["l_quantity"]]}
            )

    out = li.mapInArrow(double_qty, "l_orderkey long, qty2 double")
    got = out.agg(F.sum("qty2").alias("s")).head()["s"]
    want = li.agg((F.sum("l_quantity") * 2).alias("s")).head()["s"]
    assert got == pytest.approx(want)
