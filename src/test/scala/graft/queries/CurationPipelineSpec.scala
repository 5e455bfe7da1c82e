package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import graft.operators.Operators
import org.apache.spark.sql.functions._

/** End-to-end library-user flow over the curation operators the
  * oracle-checked queries demo individually: raw documents → PII scrub
  * → strong near-dup clustering → keep-best canonical selection → the
  * kept corpus persisted as a GraftTable and read back. Every stage is
  * the production-path operator (piiScrub, jaccardPairsAuto,
  * connectedComponents, struct-max argmax, GraftTable) — this spec
  * proves they COMPOSE, which is what "a user of the reference could
  * switch" means for the training-data pipeline surface.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("scrub → cluster → keep-best → persisted kept corpus round-trips") {
    SparkEntry.configure(spark)
    val docs = Tables.load(spark, dir, "documents")
    val total = docs.count()

    // 1. scrub: counts + redacted text, narrow per-doc
    val scrubbed = Operators.piiScrub(docs, "text", outCol = "clean_text")
      .select(col("doc_id"), col("clean_text"),
        (col("n_emails") + col("n_phones") + col("n_ips")).as("n_pii"))

    // 2. strong near-dup clusters (τ=0.5) over shingle code sets
    val codeSets = docs
      .select(col("doc_id"), expr("shingle_code_set(text)").as("cs"))
    val pairs = Operators.jaccardPairsAuto(codeSets, "doc_id", "cs", tau = 0.5)
    val comp = Operators.connectedComponents(
      pairs.select(col("a_id"), col("b_id")), "a_id", "b_id", maxIter = 50)
      .select(col("id").as("doc_id"), col("cluster"))

    // 3. keep-best per cluster (longest doc, min-id tie-break); docs in
    // no cluster keep themselves
    val quality = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val keepers = comp.join(quality, "doc_id")
      .groupBy(col("cluster"))
      .agg(max(struct(col("n_tokens").as("t"), (-col("doc_id")).as("neg"))).as("m"))
      .select((-col("m.neg")).as("doc_id"))
    val clustered = comp.select(col("doc_id"))
    val kept = scrubbed
      .join(clustered, Seq("doc_id"), "left_anti")  // unclustered docs
      .unionByName(scrubbed.join(keepers, Seq("doc_id"), "left_semi"))

    // 4. persist as a GraftTable, read back
    val path = tmpDir("curated_corpus")
    java.nio.file.Files.delete(path) // create() wants a fresh dir
    val table = graft.storage.GraftTable.create(spark, path,
      kept.schema, pkCols = Seq("doc_id"))
    table.insert(kept)
    val back = table.read()

    // invariants: one row per kept doc; every cluster contributes
    // exactly one member; nothing re-scannable survives in clean_text
    val nClusters = comp.select("cluster").distinct().count()
    val nClustered = comp.count()
    assert(back.count() === total - nClustered + nClusters)
    val keptIds = back.select("doc_id").as[Long].collect().toSet
    val byCluster = comp.join(quality, "doc_id")
      .as[(Long, Long, Long)].collect().groupBy(_._2)
    byCluster.foreach { case (cl, members) =>
      val inKept = members.map(_._1).filter(keptIds)
      assert(inKept.length === 1, s"cluster $cl kept ${inKept.toSeq}")
      val best = members.minBy(m => (-m._3, m._1))
      assert(inKept.head === best._1, s"cluster $cl kept wrong member")
    }
    val residue = Operators.piiScrub(
      back.select(col("clean_text").as("text")), "text")
      .agg(sum(col("n_emails") + col("n_phones") + col("n_ips")))
      .as[Long].head()
    assert(residue === 0L)
    // pii accounting survived the round-trip
    assert(back.agg(sum("n_pii")).as[Long].head()
      === scrubbed.join(back.select("doc_id"), Seq("doc_id"), "left_semi")
        .agg(sum("n_pii")).as[Long].head())
  }
}
