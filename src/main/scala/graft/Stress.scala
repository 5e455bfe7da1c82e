package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import org.apache.spark.sql.SparkSession

/** Driver-faithful stress harness (round-13 verdict #1b): the driver's
  * q111 hash gate went red two rounds running while every sequential
  * local run — builder's and two judges' — stayed green, so whatever
  * diverges lives in HOW the driver executes `SparkEntry.queries`, not
  * in any single query. Its order and parallelism are unknown (the map
  * is unordered), so this main sweeps the whole suite in ONE JVM under
  * the two plausible aggressors at once: randomized order and a small
  * thread pool, rows-then-collect evaluation (the gate checks rows AND
  * hash = two evaluations), optionally under a constrained heap
  * (`SPARK_DRIVER_MEM=3g sbt "runMain graft.Stress ..."`).
  *
  * The focus query's full row rendering is diffed bit-exactly across
  * every sweep; any drift prints both renderings and exits non-zero.
  *
  * Usage: runMain graft.Stress <sfDir> [sweeps=5] [threads=3] [seed=14]
  *        [focus=q111_partitioned_merge]
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sweeps = args.lift(1).map(_.toInt).getOrElse(5)
    val threads = args.lift(2).map(_.toInt).getOrElse(3)
    val seed = args.lift(3).map(_.toLong).getOrElse(14L)
    val focus = args.lift(4).getOrElse("q111_partitioned_merge")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var focusBaseline: Option[String] = None
    var failed = false
    for (sweep <- 1 to sweeps) {
      val rng = new scala.util.Random(seed + sweep)
      val order = rng.shuffle(SparkEntry.queries.toSeq)
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futures = order.map { case (name, fn) =>
        name -> pool.submit(new Callable[Either[String, Option[String]]] {
          def call(): Either[String, Option[String]] =
            try {
              val df = fn(spark, sfDir)
              val n = df.count() // the gate's rows check: evaluation 1
              if (n < 0) throw new IllegalStateException("negative count")
              if (name == focus) {
                // the gate's hash check: evaluation 2, full values
                val cols = df.columns.sorted.map(org.apache.spark.sql.functions.col)
                Right(Some(df.select(cols.toSeq: _*).collect()
                  .map(_.toString).sorted.mkString("|")))
              } else Right(None)
            } catch {
              case e: Throwable =>
                Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}")
            }
        })
      }
      pool.shutdown()
      if (!pool.awaitTermination(90, TimeUnit.MINUTES)) {
        println(s"[stress] sweep $sweep TIMED OUT"); sys.exit(2)
      }
      var errs = 0
      futures.foreach { case (name, f) =>
        f.get() match {
          case Left(err) =>
            errs += 1; failed = true
            println(s"[stress] sweep $sweep $name ERR $err")
          case Right(Some(rendering)) =>
            focusBaseline match {
              case None =>
                focusBaseline = Some(rendering)
                println(s"[stress] sweep $sweep $focus = $rendering")
              case Some(base) if base != rendering =>
                failed = true
                println(s"[stress] sweep $sweep $focus DIVERGED\n" +
                  s"  baseline = $base\n  this     = $rendering")
              case _ =>
                println(s"[stress] sweep $sweep $focus bit-exact")
            }
          case Right(None) => ()
        }
      }
      val dt = math.round((System.nanoTime() - t0) / 1e8) / 10.0
      println(s"[stress] sweep $sweep done in ${dt}s, $errs errors")
    }
    println(if (failed) "[stress] FAIL" else "[stress] OK")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
