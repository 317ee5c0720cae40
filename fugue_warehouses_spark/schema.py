"""Compact schema-string codec: ``"a:str,b:int"`` <-> ``StructType``.

The reference expresses every schema in Fugue/triad compact syntax
(e.g. tests/fugue_bigquery/test_execution_engine.py:41,
tests/fugue_trino/test_api.py:19). This module is a from-scratch
parser/renderer for that syntax targeting Spark types, including the
nested forms the reference declared but skipped (array/map/struct —
SURVEY.md §1.3) which we support properly.

Grammar (informal):
    schema   := field ("," field)*
    field    := name ":" type
    type     := simple | "[" type "]" | "<" type "," type ">"
              | "{" schema "}" | "decimal(p,s)"
    simple   := bool|int|long|float|double|str|date|datetime|bytes|...

Canonical timestamp is microsecond, UTC-naive (TimestampNTZ) per the
reference's TRIAD_DEFAULT_TIMESTAMP normalization
(fugue_bigquery/_utils.py:50-51,76-96).
"""

from __future__ import annotations

from pyspark.sql import types as T

_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "int8": T.ByteType(),
    "short": T.ShortType(),
    "int16": T.ShortType(),
    "int": T.IntegerType(),
    "int32": T.IntegerType(),
    "long": T.LongType(),
    "int64": T.LongType(),
    "float": T.FloatType(),
    "float32": T.FloatType(),
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
    "null": T.NullType(),
}

# Geospatial policy (SURVEY.md §1.3, mirroring the reference's lossy
# downcast at fugue_bigquery/_utils.py:41-43,67-68): Spark has no
# geography type, so geo columns are declared as WKT strings. Parsing a
# geo type name warns once per call site and yields StringType — the
# same "as_text + warning" behavior the reference applies on read.
_GEO_TYPE_NAMES = {"geography", "geometry", "geo"}

_SPARK_TO_SIMPLE: dict[type, str] = {
    T.BooleanType: "bool",
    T.ByteType: "byte",
    T.ShortType: "short",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "str",
    T.DateType: "date",
    T.TimestampNTZType: "datetime",
    T.TimestampType: "timestamptz",
    T.BinaryType: "bytes",
    T.NullType: "null",
}


class SchemaParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def error(self, msg: str) -> SchemaParseError:
        return SchemaParseError(f"{msg} at pos {self.pos} in {self.text!r}")

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def eat(self, ch: str) -> None:
        if self.peek() != ch:
            raise self.error(f"expected {ch!r}")
        self.pos += 1

    def skip_ws(self) -> None:
        while self.peek() in (" ", "\t", "\n"):
            self.pos += 1

    def ident(self) -> str:
        self.skip_ws()
        start = self.pos
        while self.peek() and (self.peek().isalnum() or self.peek() in "_"):
            self.pos += 1
        if start == self.pos:
            raise self.error("expected identifier")
        return self.text[start : self.pos]

    def parse_fields(self, terminators: str = "") -> list[T.StructField]:
        fields: list[T.StructField] = []
        while True:
            self.skip_ws()
            name = self.ident()
            self.skip_ws()
            self.eat(":")
            dtype = self.parse_type()
            fields.append(T.StructField(name, dtype, nullable=True))
            self.skip_ws()
            if self.peek() == ",":
                self.pos += 1
                continue
            if self.peek() == "" or self.peek() in terminators:
                return fields
            raise self.error(f"unexpected char {self.peek()!r}")

    def parse_type(self) -> T.DataType:
        self.skip_ws()
        ch = self.peek()
        if ch == "[":
            self.eat("[")
            elem = self.parse_type()
            self.skip_ws()
            self.eat("]")
            return T.ArrayType(elem)
        if ch == "<":
            self.eat("<")
            key = self.parse_type()
            self.skip_ws()
            self.eat(",")
            val = self.parse_type()
            self.skip_ws()
            self.eat(">")
            return T.MapType(key, val)
        if ch == "{":
            self.eat("{")
            fields = self.parse_fields(terminators="}")
            self.eat("}")
            return T.StructType(fields)
        name = self.ident()
        self.skip_ws()
        if name == "decimal":
            self.eat("(")
            p = int(self.ident())
            self.skip_ws()
            self.eat(",")
            s = int(self.ident())
            self.skip_ws()
            self.eat(")")
            return T.DecimalType(p, s)
        if name in _GEO_TYPE_NAMES:
            import warnings

            warnings.warn(
                f"geospatial type {name!r} is stored as a WKT string "
                "(lossy downcast, same policy as the reference)",
                stacklevel=4,
            )
            return T.StringType()
        if name not in _SIMPLE_TO_SPARK:
            raise self.error(f"unknown type {name!r}")
        return _SIMPLE_TO_SPARK[name]


def parse_schema(text: str) -> T.StructType:
    """``"a:str,b:[int],c:{x:long,y:double},d:<str,int>"`` -> StructType."""
    parser = _Parser(text)
    fields = parser.parse_fields()
    return T.StructType(fields)


def schema_to_struct(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return parse_schema(schema)


def _render_type(dtype: T.DataType) -> str:
    if isinstance(dtype, T.ArrayType):
        return f"[{_render_type(dtype.elementType)}]"
    if isinstance(dtype, T.MapType):
        return f"<{_render_type(dtype.keyType)},{_render_type(dtype.valueType)}>"
    if isinstance(dtype, T.StructType):
        inner = ",".join(f"{f.name}:{_render_type(f.dataType)}" for f in dtype.fields)
        return "{" + inner + "}"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    cls = type(dtype)
    if cls in _SPARK_TO_SIMPLE:
        return _SPARK_TO_SIMPLE[cls]
    raise SchemaParseError(f"unsupported Spark type {dtype}")


def struct_to_schema(struct: T.StructType) -> str:
    """StructType -> compact string (inverse of :func:`parse_schema`)."""
    return ",".join(f"{f.name}:{_render_type(f.dataType)}" for f in struct.fields)
