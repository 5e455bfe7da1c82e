package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  private def hof(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""

  test("vec_dot matches the sequential HOF fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0f, 2.5f, -3.25f), Seq(0.5f, 4.0f, 2.0f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.7f, 0.8f, 0.9f)))
      .toDF("a", "b")
    val rows = df.select(expr("vec_dot(a, b)").as("fast"),
      expr(hof("a", "b")).as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        === java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot on double arrays and null propagation") {
    val df = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS n,
                vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS nn""")
    val r = df.collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("sorted_intersect_count counts and rejects bad types on either side") {
    assert(spark.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 5L, 9L),
                                       array(2L, 3L, 9L, 11L))""")
      .as[Long].head() === 2L)
    // both children are type-checked: a non-array<bigint> RIGHT argument
    // must fail analysis, not ClassCastException at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array(1L), array('x'))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array('x'), array(1L))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count(array(1L), array(1.5D))").collect()
    }
  }

  test("repeated instances in one projection keep whole-stage codegen valid") {
    // fixed local identifiers in doGenCode would collide when the same
    // expression appears twice in a stage — Janino error, silent
    // interpreted fallback. fallback=false turns that into a hard fail.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.sql(
        """SELECT vec_dot(array(1.0D), array(2.0D))
                  + vec_dot(array(3.0D), array(4.0D)) AS s,
                  sorted_intersect_count(array(1L, 2L), array(2L, 3L))
                  + sorted_intersect_count(array(5L), array(5L)) AS t""")
        .collect().head
      assert(r.getDouble(0) === 14.0 && r.getLong(1) === 2L)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("vec_dot survives both codegen and interpreted paths") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      assert(df.select(expr("vec_dot(a, b)")).as[Double].head() === 11.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(df.select(expr("vec_dot(a, b)")).as[Double].head() === 11.0)
  }

  test("vec_dot: length mismatch is NULL, like the zip_with SQL") {
    // a ragged embedding must never yield a plausible partial dot
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D)) AS mm,
        vec_dot(array(1.0D), array(2.0D)) AS ok""").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 2.0)
  }

  test("sorted_intersect_count: a null ELEMENT yields null, not a phantom match") {
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(CAST(NULL AS BIGINT)), array(0L)) AS n,
        sorted_intersect_count(array(1L, 2L), array(2L, 3L)) AS ok""").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getLong(1) === 1L)
  }
}
