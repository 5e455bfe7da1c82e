package graft.types

import graft.SparkSpec
import graft.storage.GraftTable
import org.apache.spark.sql.types._

/** Type-fidelity round-trips over the alltypes shape of FIXTURES.md §3
  * (mirroring binlog_replication_alltypes_test.go's type table). */
class TypeMapperSpec extends SparkSpec {
  import TypeMapper._

  test("integer family incl. unsigned widening") {
    assert(toSpark("TINYINT").dataType === ByteType)
    assert(toSpark("TINYINT UNSIGNED").dataType === ShortType)
    assert(toSpark("SMALLINT").dataType === ShortType)
    assert(toSpark("SMALLINT UNSIGNED").dataType === IntegerType)
    assert(toSpark("MEDIUMINT").dataType === IntegerType)
    assert(toSpark("INT UNSIGNED").dataType === LongType)
    assert(toSpark("BIGINT").dataType === LongType)
    assert(toSpark("BIGINT UNSIGNED").dataType === DecimalType(20, 0))
    assert(toSpark("INT UNSIGNED").metadata.getBoolean(UnsignedKey))
  }

  test("decimal precision is capped at 38 like the reference") {
    assert(toSpark("DECIMAL(10,2)").dataType === DecimalType(10, 2))
    assert(toSpark("DECIMAL(65,30)").dataType === DecimalType(38, 30))
  }

  test("temporal family: DATETIME is NTZ, TIMESTAMP is instant, TIME is interval") {
    assert(toSpark("DATE").dataType === DateType)
    assert(toSpark("DATETIME").dataType === TimestampNTZType)
    assert(toSpark("DATETIME(6)").dataType === TimestampNTZType)
    assert(toSpark("TIMESTAMP").dataType === TimestampType)
    assert(toSpark("TIME").dataType === DayTimeIntervalType())
    assert(toSpark("YEAR").dataType === ShortType)
  }

  test("string/binary tiers, enum/set values, bit, json") {
    assert(toSpark("VARCHAR(255)").dataType === StringType)
    assert(toSpark("VARCHAR(255)").metadata.getLong(DisplayWidthKey) === 255)
    assert(toSpark("LONGTEXT").dataType === StringType)
    assert(toSpark("VARBINARY(255)").dataType === BinaryType)
    assert(toSpark("BLOB").dataType === BinaryType)
    assert(toSpark("BIT(64)").dataType === BinaryType)
    assert(toSpark("JSON").dataType === StringType)
    val e = toSpark("ENUM('a','b','c')")
    assert(e.dataType === StringType)
    assert(e.metadata.getString(EnumValuesKey) === "'a','b','c'")
    assert(toSpark("SET('a','b')").dataType === StringType)
    // member value case is preserved verbatim, keyword case-insensitive
    assert(toSpark("enum('Active','inACTIVE')").metadata
      .getString(EnumValuesKey) === "'Active','inACTIVE'")
    assert(toSpark("SET('Read','Write')").metadata
      .getString(EnumValuesKey) === "'Read','Write'")
  }

  test("round-trip: original DDL type is preserved through metadata") {
    val cols = Seq("c1" -> "MEDIUMINT UNSIGNED", "c2" -> "ENUM('x','y')",
      "c3" -> "DECIMAL(10,2)", "c4" -> "DATETIME(3)")
    val schema = schemaFromMySql(cols)
    assert(schema.fields.map(toMySql).toSeq === cols.map(_._2))
  }

  test("reverse mapping without metadata takes the natural analog") {
    assert(toMySql(StructField("x", LongType)) === "BIGINT")
    assert(toMySql(StructField("x", TimestampNTZType)) === "DATETIME")
    assert(toMySql(StructField("x", DecimalType(12, 3))) === "DECIMAL(12,3)")
  }

  test("alltypes schema creates a working storage table") {
    import spark.implicits._
    val schema = schemaFromMySql(Seq(
      "pk" -> "INT", "_tinyint_" -> "TINYINT", "_int_unsigned_" -> "INT UNSIGNED",
      "_decimal_10_2_" -> "DECIMAL(10,2)", "_varchar_255_" -> "VARCHAR(255)",
      "_datetime_" -> "DATETIME", "_json_" -> "JSON"))
    val t = GraftTable.create(spark, tmpDir("alltypes"), schema, Seq("pk"))
    val df = spark.sql("""SELECT 1 AS pk, CAST(-128 AS TINYINT) AS _tinyint_,
      CAST(4294967295 AS BIGINT) AS _int_unsigned_,
      CAST(12345.67 AS DECIMAL(10,2)) AS _decimal_10_2_,
      'hello' AS _varchar_255_,
      TIMESTAMP_NTZ '2024-01-01 12:00:00' AS _datetime_,
      '{"k":1}' AS _json_""")
    t.insert(df)
    val r = t.read().collect().head
    assert(r.getAs[Byte]("_tinyint_") === -128)
    assert(r.getAs[Long]("_int_unsigned_") === 4294967295L)
    assert(r.getAs[java.math.BigDecimal]("_decimal_10_2_").toPlainString === "12345.67")
    // metadata survives the manifest round-trip
    assert(t.schema("_int_unsigned_").metadata.getBoolean(TypeMapper.UnsignedKey))
  }
}
