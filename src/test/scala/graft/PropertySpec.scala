package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._
import graft.storage.Manifest
import graft.functions.PolyHash

/** Property-based checks for the leaf primitives whose correctness
  * everything else leans on (raw scalacheck generators, fixed seeds for
  * reproducibility). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val nameGen = Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty)
  private val typeGen = Gen.oneOf[DataType](IntegerType, LongType, DoubleType,
    StringType, BooleanType, DateType, TimestampNTZType, DecimalType(12, 3),
    ArrayType(FloatType), BinaryType)

  test("manifest round-trips arbitrary schemas, pk, props, counters") {
    val gen = for {
      cols <- Gen.nonEmptyListOf(Gen.zip(nameGen, typeGen)).map(_.distinctBy(_._1))
      props <- Gen.mapOf(Gen.zip(nameGen, Gen.alphaNumStr.map(_.take(30))))
      autoInc <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (cols, props, autoInc)
    samples(gen, 25).foreach { case (cols, props, autoInc) =>
      val schema = StructType(cols.map { case (n, t) => StructField(n, t) })
      val dir = tmpDir("prop_manifest")
      val m = Manifest.commit(dir,
        Manifest(0L, schema, cols.take(1).map(_._1), Nil, autoInc, props))
      val back = Manifest.load(dir)
      assert(back.schema === schema)
      assert(back.props === props)
      assert(back.autoInc === autoInc)
      assert(back.version === m.version)
    }
  }

  test("poly_hash matches the reference fold for arbitrary ASCII strings") {
    def referenceFold(s: String): Long =
      s.foldLeft(7L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      assert(PolyHash.hash(s) === referenceFold(s), s"input: ${s.take(40)}")
      assert(PolyHash.hash(s) >= 0 && PolyHash.hash(s) < 1000000007L)
    }
  }

  test("sorted_intersect_count equals set intersection size") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val pairGen = Gen.zip(Gen.listOf(Gen.choose(0L, 50L)), Gen.listOf(Gen.choose(0L, 50L)))
    val cases = samples(pairGen, 40)
    val df = cases.map { case (a, b) =>
      (a.toSet.toSeq.sorted, b.toSet.toSeq.sorted,
        a.toSet.intersect(b.toSet).size.toLong)
    }.toDF("x", "y", "expected")
    val bad = df.select(expr("sorted_intersect_count(x, y)").as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).count()
    assert(bad === 0)
  }
}
