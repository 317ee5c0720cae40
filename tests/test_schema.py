import pytest
from pyspark.sql import types as T

from fugue_warehouses_spark.schema import (
    SchemaParseError,
    parse_schema,
    struct_to_schema,
)


def test_simple_roundtrip():
    s = "a:str,b:int,c:long,d:double,e:bool,f:date,g:datetime,h:bytes"
    struct = parse_schema(s)
    assert struct.fieldNames() == ["a", "b", "c", "d", "e", "f", "g", "h"]
    assert struct["a"].dataType == T.StringType()
    assert struct["b"].dataType == T.IntegerType()
    assert struct["c"].dataType == T.LongType()
    assert struct["g"].dataType == T.TimestampNTZType()
    assert struct_to_schema(struct) == s


def test_nested_types():
    struct = parse_schema("a:[int],b:<str,long>,c:{x:long,y:[double]},d:decimal(10,2)")
    assert struct["a"].dataType == T.ArrayType(T.IntegerType())
    assert struct["b"].dataType == T.MapType(T.StringType(), T.LongType())
    assert struct["c"].dataType == T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField("y", T.ArrayType(T.DoubleType())),
        ]
    )
    assert struct["d"].dataType == T.DecimalType(10, 2)
    assert (
        struct_to_schema(struct)
        == "a:[int],b:<str,long>,c:{x:long,y:[double]},d:decimal(10,2)"
    )


def test_whitespace_tolerated():
    struct = parse_schema(" a : str , b : [ int ] ")
    assert struct.fieldNames() == ["a", "b"]


def test_errors():
    with pytest.raises(SchemaParseError):
        parse_schema("a:whatisthis")
    with pytest.raises(SchemaParseError):
        parse_schema("a:")
    with pytest.raises(SchemaParseError):
        parse_schema("a:[int")


def test_geo_types_downcast_to_wkt_string():
    """SURVEY §1.3 geospatial policy: declared geo columns become WKT
    strings, with a warning (reference: _utils.py:41-43,67-68)."""
    import warnings

    from pyspark.sql import types as T

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s = parse_schema("id:long,shape:geography,g2:geometry")
    assert s["shape"].dataType == T.StringType()
    assert s["g2"].dataType == T.StringType()
    assert sum("WKT" in str(x.message) for x in w) == 2


def test_geo_cast_matrix_row(spark):
    """A WKT column round-trips through alter_columns to a geo target
    as a plain string (no-op cast)."""
    from fugue_warehouses_spark.frame import WarehouseFrame

    df = spark.createDataFrame(
        [(1, "POINT (30 10)")], "id long, shape string"
    )
    out = WarehouseFrame(df).alter_columns("shape:geography")
    assert out.schema["shape"].dataType.simpleString() == "string"
    assert out.native.collect()[0]["shape"] == "POINT (30 10)"
