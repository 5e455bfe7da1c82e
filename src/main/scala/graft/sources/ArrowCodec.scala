package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC wire codec (reference A14/A16: `COPY TO (FORMAT arrow)` /
  * Arrow-stream `COPY FROM` —
  * `/root/reference/pgserver/arrowwriter.go:24-136`,
  * `/root/reference/pgserver/arrowloader.go:17-100`).
  *
  * Wire IO is inherently a driver/client concern (the reference streams
  * through a FIFO to one client); data stays distributed until the
  * terminal `toLocalIterator`, and batches are bounded (`batchRows` ≈
  * the reference's 128-row wire batches scaled up), so driver memory is
  * O(batch), not O(result).
  */
object ArrowCodec {

  val DefaultBatchRows = 4096

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  /** Serialize a DataFrame to one Arrow IPC stream held in memory —
    * convenience over [[encodeTo]] for wire-batch-sized results; a
    * large export should stream to the destination (the COPY TO arrow
    * path does), since a byte array is O(result) on the driver. */
  def encode(df: DataFrame, batchRows: Int = DefaultBatchRows): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    encodeTo(df, out, batchRows)
    out.toByteArray
  }

  /** Serialize a DataFrame as an Arrow IPC stream to `out` — the
    * FIFO-to-client analog: data stays distributed until the terminal
    * `toLocalIterator`, and driver memory is O(batch), not O(result). */
  def encodeTo(df: DataFrame, out: java.io.OutputStream,
      batchRows: Int = DefaultBatchRows): Unit = {
    val sparkSchema = df.schema
    val schema = new ArrowSchema(sparkSchema.fields.map(arrowField).toSeq.asJava)
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val writer = new ArrowStreamWriter(root, null, out)
    try {
      writer.start()
      val it = df.toLocalIterator()
      val buf = new scala.collection.mutable.ArrayBuffer[Row](batchRows)
      def flush(): Unit = if (buf.nonEmpty) {
        root.setRowCount(buf.length)
        sparkSchema.fields.zipWithIndex.foreach { case (f, ci) =>
          val v = root.getVector(ci)
          v.setInitialCapacity(buf.length)
          var ri = 0
          while (ri < buf.length) {
            val row = buf(ri)
            if (row.isNullAt(ci)) setNull(v, ri)
            else setValue(v, ri, row.get(ci), f.dataType)
            ri += 1
          }
          v.setValueCount(buf.length)
        }
        writer.writeBatch()
        root.clear()
        buf.clear()
      }
      while (it.hasNext) {
        buf += it.next()
        if (buf.length >= batchRows) flush()
      }
      flush()
      writer.end()
    } finally {
      writer.close(); root.close(); alloc.close()
    }
  }

  private def setNull(v: FieldVector, i: Int): Unit = v match {
    case x: BitVector => x.setNull(i)
    case x: IntVector => x.setNull(i)
    case x: BigIntVector => x.setNull(i)
    case x: Float4Vector => x.setNull(i)
    case x: Float8Vector => x.setNull(i)
    case x: VarCharVector => x.setNull(i)
    case x: VarBinaryVector => x.setNull(i)
    case other => throw new IllegalArgumentException(s"unsupported vector $other")
  }

  private def setValue(v: FieldVector, i: Int, value: Any, dt: DataType): Unit =
    (v, dt) match {
      case (x: BitVector, BooleanType) =>
        x.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (x: IntVector, IntegerType) => x.setSafe(i, value.asInstanceOf[Int])
      case (x: BigIntVector, LongType) => x.setSafe(i, value.asInstanceOf[Long])
      case (x: Float4Vector, FloatType) => x.setSafe(i, value.asInstanceOf[Float])
      case (x: Float8Vector, DoubleType) => x.setSafe(i, value.asInstanceOf[Double])
      case (x: VarCharVector, StringType) =>
        x.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case (x: VarBinaryVector, BinaryType) =>
        x.setSafe(i, value.asInstanceOf[Array[Byte]])
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  /** Deserialize an in-memory Arrow IPC stream back into a DataFrame. */
  def decode(spark: SparkSession, bytes: Array[Byte]): DataFrame =
    decodeFrom(spark, new ByteArrayInputStream(bytes))

  /** Deserialize an Arrow IPC stream read from `in`. */
  def decodeFrom(spark: SparkSession, in: java.io.InputStream): DataFrame = {
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(in, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala.toSeq
      val sparkSchema = StructType(fields.map { f =>
        val dt = f.getType match {
          case _: ArrowType.Bool => BooleanType
          // unsigned wire ints would misread through the signed
          // vectors (UInt32 3e9 → negative Int) — reject, don't garble
          case t: ArrowType.Int if t.getBitWidth == 32 && t.getIsSigned => IntegerType
          case t: ArrowType.Int if t.getBitWidth == 64 && t.getIsSigned => LongType
          case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.SINGLE => FloatType
          case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
          case _: ArrowType.Utf8 => StringType
          case _: ArrowType.Binary => BinaryType
          case other => throw new IllegalArgumentException(s"unsupported wire type $other")
        }
        StructField(f.getName, dt, f.isNullable)
      })
      val rows = new scala.collection.mutable.ArrayBuffer[Row]()
      while (reader.loadNextBatch()) {
        var i = 0
        while (i < root.getRowCount) {
          rows += Row.fromSeq(fields.indices.map { ci =>
            val v = root.getVector(ci)
            if (v.isNull(i)) null
            else v match {
              case x: BitVector => x.get(i) == 1
              case x: IntVector => x.get(i)
              case x: BigIntVector => x.get(i)
              case x: Float4Vector => x.get(i)
              case x: Float8Vector => x.get(i)
              case x: VarCharVector => new String(x.get(i), "UTF-8")
              case x: VarBinaryVector => x.get(i)
              case other => throw new IllegalArgumentException(s"$other")
            }
          })
          i += 1
        }
      }
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally {
      reader.close(); alloc.close()
    }
  }
}
