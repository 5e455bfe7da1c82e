package graft.types

import org.apache.spark.sql.types._

/** MySQL-type fidelity layer (SURVEY §1.2 / §7 Phase 2) — the analog of
  * the reference's bidirectional mapping
  * (`/root/reference/catalog/type_mapping.go:120-332`), which stores
  * what DuckDB can't represent in column COMMENTs. Here the original
  * logical type, display width, unsigned flag, enum/set values and
  * charset ride in Spark `Metadata` on the `StructField` (and flow into
  * the table manifest's schema JSON unchanged).
  */
object TypeMapper {

  val OriginalTypeKey = "mysql.type"
  val DisplayWidthKey = "mysql.displayWidth"
  val UnsignedKey = "mysql.unsigned"
  val EnumValuesKey = "mysql.values"

  final case class Mapped(dataType: DataType, metadata: Metadata)

  private val Paren = """([A-Z ]+?)\s*\(([^)]*)\)\s*(UNSIGNED)?""".r
  private val Plain = """([A-Z ]+?)\s*(UNSIGNED)?""".r

  /** MySQL DDL type → Spark type + fidelity metadata.
    * Follows SURVEY §1.2's table: unsigned widens to the next signed
    * type (UBIGINT → DECIMAL(20,0)), DATETIME/TIMESTAMP → TimestampNTZ/
    * Timestamp, TIME → DayTimeInterval, YEAR → Short, ENUM/SET →
    * String + recorded values, BIT(n) → Binary, JSON → String. */
  def toSpark(mysqlType: String): Mapped = {
    val norm = mysqlType.trim.toUpperCase
    val b = new MetadataBuilder().putString(OriginalTypeKey, mysqlType.trim)

    def unsignedInt(base: String): Mapped = {
      b.putBoolean(UnsignedKey, true)
      val dt = base match {
        case "TINYINT" => ShortType
        case "SMALLINT" => IntegerType
        case "MEDIUMINT" | "INT" | "INTEGER" => LongType
        case "BIGINT" => DecimalType(20, 0)
        case _ => LongType
      }
      Mapped(dt, b.build())
    }

    def signed(base: String): DataType = base match {
      case "BOOL" | "BOOLEAN" => BooleanType
      case "TINYINT" => ByteType
      case "SMALLINT" | "YEAR" => ShortType
      case "MEDIUMINT" | "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "FLOAT" => FloatType
      case "DOUBLE" | "REAL" => DoubleType
      case "DATE" => DateType
      case "DATETIME" => TimestampNTZType
      case "TIMESTAMP" => TimestampType
      case "TIME" => DayTimeIntervalType()
      case "CHAR" | "VARCHAR" | "TINYTEXT" | "TEXT" | "MEDIUMTEXT" |
           "LONGTEXT" | "JSON" | "SET" => StringType
      case "BINARY" | "VARBINARY" | "TINYBLOB" | "BLOB" | "MEDIUMBLOB" |
           "LONGBLOB" | "BIT" => BinaryType
      // PostgreSQL spellings a pg_dump can carry that Spark DDL and the
      // MySQL arms above don't cover
      case "BYTEA" => BinaryType
      case "SERIAL" | "INT4" => IntegerType
      case "BIGSERIAL" | "INT8" => LongType
      case "SMALLSERIAL" | "INT2" => ShortType
      case "FLOAT4" => FloatType
      case "FLOAT8" => DoubleType
      case "JSONB" | "UUID" | "CITEXT" | "CHARACTER" => StringType
      case "TIMESTAMPTZ" => TimestampType
      case other => throw new IllegalArgumentException(s"unsupported MySQL type $other")
    }

    norm match {
      case Paren(base, args, u) =>
        val bb = base.trim
        bb match {
          case "DECIMAL" | "NUMERIC" =>
            val parts = args.split(',').map(_.trim.toInt)
            val p = math.min(parts(0), 38)
            val s = if (parts.length > 1) parts(1) else 0
            Mapped(DecimalType(p, s), b.build())
          case "ENUM" | "SET" =>
            // member values recorded verbatim from the original DDL —
            // only the keyword is case-normalized, ENUM('active','X')
            // must not become 'ACTIVE','X' in mysql.values metadata
            val orig = mysqlType.trim
            b.putString(EnumValuesKey,
              orig.substring(orig.indexOf('(') + 1, orig.lastIndexOf(')')))
            Mapped(StringType, b.build())
          case "VARCHAR" | "CHAR" | "CHARACTER" | "BINARY" | "VARBINARY" |
               "BIT" =>
            b.putLong(DisplayWidthKey, args.trim.toLong)
            if (u != null) unsignedInt(bb) else Mapped(signed(bb), b.build())
          case "DATETIME" | "TIMESTAMP" | "TIME" =>
            b.putLong(DisplayWidthKey, args.trim.toLong) // fractional precision
            Mapped(signed(bb), b.build())
          case _ =>
            b.putLong(DisplayWidthKey, args.split(',')(0).trim.toLong)
            if (u != null) unsignedInt(bb) else Mapped(signed(bb), b.build())
        }
      case Plain(base, u) =>
        val bb = base.trim
        if (u != null) unsignedInt(bb) else Mapped(signed(bb), b.build())
      case other => throw new IllegalArgumentException(s"cannot parse $other")
    }
  }

  /** Spark field → MySQL DDL type (uses recorded original when present —
    * exact round-trip; otherwise the natural reverse mapping). */
  def toMySql(field: StructField): String = {
    if (field.metadata.contains(OriginalTypeKey))
      field.metadata.getString(OriginalTypeKey)
    else field.dataType match {
      case BooleanType => "BOOL"
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case DateType => "DATE"
      case TimestampNTZType => "DATETIME"
      case TimestampType => "TIMESTAMP"
      case _: DayTimeIntervalType => "TIME"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
      case ArrayType(e, _) => s"${toMySql(StructField("", e))}[]" // PG arrays
      case other => throw new IllegalArgumentException(s"no MySQL analog for $other")
    }
  }

  /** Parse a full MySQL column list into a Spark schema with metadata. */
  def schemaFromMySql(cols: Seq[(String, String)]): StructType =
    StructType(cols.map { case (name, t) =>
      val m = toSpark(t)
      StructField(name, m.dataType, nullable = true, m.metadata)
    })
}
