package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Operators.jaccardPairsAuto]] — the density-adaptive router must
  * (a) return the exact pair set on BOTH routes, (b) route dense
  * corpora (hot vocabulary → prefix-candidate mass above n²/2) to the
  * broadcast scan, sparse corpora to the prefix join, and (c) respect
  * the denseMaxDocs broadcast gate. */
class JaccardAutoSpec extends SparkSpec {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  // sorted distinct code-sets straight from a deterministic generator
  private def corpus(nDocs: Int, vocab: Int, setLen: Int): DataFrame =
    (0 until nDocs).map { i =>
      val codes = (0 until setLen * 3)
        .map(j => ((i * 131L + j * 31L + (i + j) * (i + j)) % vocab))
        .distinct.take(setLen).map(_.toLong).sorted
      (i.toLong, codes)
    }.toDF("doc_id", "cs")

  private val dense = corpus(60, vocab = 25, setLen = 8)   // hot codes
  private val sparse = corpus(60, vocab = 100000, setLen = 8) // cold codes

  private def pairsOf(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("a_id"), col("b_id"), col("inter"))
      .as[(Long, Long, Long)].collect().toSet

  test("both routes equal jaccardPairsPrefix exactly") {
    for (c <- Seq(dense, sparse); tau <- Seq(0.3, 0.6)) {
      val exact = pairsOf(Operators.jaccardPairsPrefix(c, "doc_id", "cs", tau))
      val auto = pairsOf(Operators.jaccardPairsAuto(c, "doc_id", "cs", tau))
      assert(auto === exact, s"tau=$tau")
    }
  }

  test("router picks dense for hot vocabularies, prefix for cold") {
    // dense fixture: 25 possible codes across 60 docs of 8 → every
    // prefix code is hot, mass ≫ n²/2
    val setsD = dense.select(col("doc_id").as("__id"), col("cs").as("__cs"),
      size(col("cs")).as("__len"))
    val massD = Operators.prefixCandidateMass(setsD, 0.3)
    assert(massD / 2 > 60L * 59 / 2, s"dense fixture not dense: $massD")
    val planD = Operators.jaccardPairsAuto(dense, "doc_id", "cs", 0.3)
      .queryExecution.executedPlan.toString
    assert(planD.contains("BroadcastNestedLoopJoin"), planD.take(1200))

    val setsS = sparse.select(col("doc_id").as("__id"), col("cs").as("__cs"),
      size(col("cs")).as("__len"))
    val massS = Operators.prefixCandidateMass(setsS, 0.3)
    assert(massS / 2 < 60L * 59 / 2, s"sparse fixture not sparse: $massS")
    val planS = Operators.jaccardPairsAuto(sparse, "doc_id", "cs", 0.3)
      .queryExecution.executedPlan.toString
    assert(!planS.contains("BroadcastNestedLoopJoin"), planS.take(1200))
  }

  test("denseMaxDocs gates the broadcast regardless of density") {
    val plan = Operators.jaccardPairsAuto(dense, "doc_id", "cs", 0.3,
        denseMaxDocs = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
  }

  test("prefixCandidateMass is the exact Σ df² over prefix codes") {
    // 3 docs, sets of 4, tau=0.5 → prefix keeps len−ceil(len·τ)+1 = 3
    // codes: doc a [1,2,3], doc b [1,2,5], doc c [7,8,9] →
    // df(1)=2, df(2)=2, df(3)=1, df(5)=1, df(7)=1, df(8)=1, df(9)=1 →
    // Σdf² = 4+4+1+1+1+1+1 = 13
    val sets = Seq(
      (1L, Seq(1L, 2L, 3L, 4L)), (2L, Seq(1L, 2L, 5L, 6L)),
      (3L, Seq(7L, 8L, 9L, 10L)))
      .toDF("__id", "__cs").withColumn("__len", size(col("__cs")))
    assert(Operators.prefixCandidateMass(sets, 0.5) === 13L)
  }
}
