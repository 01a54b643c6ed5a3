"""Type-system layer: SQL keyword mapping, unsigned widening policy,
and the supertype lattice (SURVEY.md §7.3; reference
``src/logicalplan.rs:95-111,446-554``)."""

from pyspark.sql import types as T

from datafusion_archive_spark import types as ty


def test_sql_type_mapping():
    # per /root/reference/src/sqlplanner.rs:379-393
    assert ty.spark_type_for_sql("BOOLEAN") == T.BooleanType()
    assert ty.spark_type_for_sql("SMALLINT") == T.ShortType()
    assert ty.spark_type_for_sql("int") == T.IntegerType()
    assert ty.spark_type_for_sql("BIGINT") == T.LongType()
    assert ty.spark_type_for_sql("FLOAT") == T.DoubleType()
    assert ty.spark_type_for_sql("DOUBLE") == T.DoubleType()
    assert ty.spark_type_for_sql("VARCHAR(20)") == T.StringType()
    assert ty.spark_type_for_sql("CHAR") == T.StringType()


def test_unsigned_widening():
    # SURVEY.md §7.3 policy: widen to the next signed type that holds
    # the full unsigned range
    assert ty.spark_type_for_logical("uint8") == T.ShortType()
    assert ty.spark_type_for_logical("uint16") == T.IntegerType()
    assert ty.spark_type_for_logical("uint32") == T.LongType()
    assert ty.spark_type_for_logical("uint64") == T.DecimalType(20, 0)


def test_field_preserves_logical_tag():
    f = ty.field("n", "uint32", nullable=False)
    assert f.dataType == T.LongType()
    assert f.metadata["logical_type"] == "uint32"
    assert not f.nullable


def test_supertype_lattice():
    # reference /root/reference/src/logicalplan.rs:446-554
    assert ty.supertype("int32", "int32") == "int32"
    assert ty.supertype("int8", "int64") == "int64"
    assert ty.supertype("uint8", "uint32") == "uint32"
    assert ty.supertype("uint64", "int64") == "int64"  # logicalplan.rs:471
    assert ty.supertype("uint32", "int32") == "int64"
    assert ty.supertype("uint16", "int32") == "int32"
    assert ty.supertype("float32", "int64") == "float64"
    assert ty.supertype("float32", "float32") == "float32"
    assert ty.supertype("float32", "float64") == "float64"
    assert ty.supertype("utf8", "utf8") == "utf8"
    assert ty.supertype("utf8", "int32") is None
