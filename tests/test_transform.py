import pandas as pd
import pytest

from fugue_warehouses_spark.frame import assert_eq, frame_from_local
from fugue_warehouses_spark.transform import cotransform, out_transform, transform


def test_transform_explicit_schema(spark):
    wf = frame_from_local(spark, [["a", 1], ["b", 2]], "a:str,b:long")

    def double_b(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["b"] = pdf["b"] * 2
        return pdf

    out = transform(wf, double_b, schema="*")
    assert_eq(out, [["a", 2], ["b", 4]])


def test_transform_additive_schema_and_params(spark):
    wf = frame_from_local(spark, [["a", 1], ["b", 2]], "a:str,b:long")

    def with_ct(pdf: pd.DataFrame, p: int = 0) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["ct"] = len(pdf)
        pdf["p"] = p
        return pdf

    out = transform(wf, with_ct, schema="*,ct:int,p:int", params={"p": 1})
    rows = out.as_array()
    assert all(r[3] == 1 for r in rows)
    assert out.schema_str == "a:str,b:long,ct:int,p:int"


def test_transform_comment_hint(spark):
    wf = frame_from_local(spark, [["a", 1]], "a:str,b:long")

    # schema: *,ct:int
    def hinted(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["ct"] = len(pdf)
        return pdf

    out = transform(wf, hinted)
    assert out.schema_str == "a:str,b:long,ct:int"


def test_transform_partitioned_with_presort(spark):
    wf = frame_from_local(
        spark,
        [["a", 3], ["a", 1], ["b", 9], ["b", 7]],
        "k:str,v:long",
    )

    def first_row(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.head(1)

    out = transform(wf, first_row, schema="*", partition_by=["k"], presort="v asc")
    assert_eq(out, [["a", 1], ["b", 7]])


def test_transform_requires_schema(spark):
    wf = frame_from_local(spark, [["a", 1]], "a:str,b:long")
    with pytest.raises(ValueError):
        transform(wf, lambda pdf: pdf)


def test_cotransform(spark):
    d1 = frame_from_local(spark, [["a", 1], ["a", 2], ["b", 3]], "k:str,v:long")
    d2 = frame_from_local(spark, [["a", 10.0], ["c", 30.0]], "k:str,w:double")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        k = left["k"].iloc[0] if len(left) else right["k"].iloc[0]
        return pd.DataFrame(
            {"k": [k], "nl": [len(left)], "nr": [len(right)]}
        )

    out = cotransform(d1, d2, merge, on=["k"], schema="k:str,nl:long,nr:long")
    assert_eq(out, [["a", 2, 1], ["b", 1, 0], ["c", 0, 1]])


def test_out_transform_runs(spark):
    wf = frame_from_local(spark, [["a", 1], ["b", 2]], "a:str,b:long")
    out_transform(wf, lambda pdf: None)


def test_pandas_agg_custom_udaf_beside_builtin(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.transform import pandas_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def wmean(d, q):
        return float((d * q).sum() / q.sum())

    out = pandas_agg(
        li,
        ["l_returnflag"],
        {"w": (wmean, "double", ["l_discount", "l_quantity"])},
        builtin={"n": F.count(F.lit(1))},
    ).native.collect()
    expect = {
        r["l_returnflag"]: (r["w"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_discount") * F.col("l_quantity"))
             / F.sum("l_quantity")).alias("w"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert len(out) == len(expect)
    for r in out:
        w, n = expect[r["l_returnflag"]]
        assert abs(r["w"] - w) < 1e-9 and r["n"] == n


def test_pandas_agg_builtin_keeps_null_key_group(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from fugue_warehouses_spark.transform import pandas_agg

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 5.0), (None, 7.0)],
        "k string, v double",
    )

    def vmean(v: pd.Series) -> float:
        return float(v.mean())

    out = {
        r["k"]: (r["m"], r["n"])
        for r in pandas_agg(
            df,
            ["k"],
            {"m": (vmean, "double", ["v"])},
            builtin={"n": F.count(F.lit(1))},
        ).native.collect()
    }
    # the NULL-key group must survive the join with the builtin side
    assert out == {"a": (2.0, 2), None: (6.0, 2)}
