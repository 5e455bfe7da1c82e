package graft.streaming

/** Per-source GTID interval sets — the `gtid_executed` representation
  * (reference C8: the applier persists full GTID sets, not a single
  * high-water mark, `/root/reference/binlogreplication/
  * binlog_metadata_persistence.go`) in MySQL's canonical per-UUID text
  * form: `"1-5:7:9-12"` — sorted, disjoint, INCLUSIVE intervals joined
  * by `:`.
  *
  * Why intervals and not a high-water gno: a multi-threaded-replication
  * upstream (logical-clock parallel applier) commits gnos OUT OF ORDER
  * — gno 5 can commit before gno 3. A high-water watermark that saw 5
  * would wrongly skip a re-streamed 3 that was never applied; the
  * interval set records exactly {1-2,5} and lets 3 through once.
  *
  * The empty string is the empty set. All ops are small-vector linear
  * scans: a healthy in-order stream keeps the set at ONE interval
  * (`"1-N"`), and gaps from MTS close quickly, so per-GTID-event parse
  * cost is a few tokens — far below the row-decode work per txn. */
object GtidSet {

  /** Canonical text → sorted disjoint inclusive intervals. */
  def parse(s: String): Vector[(Long, Long)] =
    if (s == null || s.isEmpty) Vector.empty
    else s.split(':').toVector.map { part =>
      part.split('-') match {
        case Array(a) => (a.toLong, a.toLong)
        case Array(a, b) => (a.toLong, b.toLong)
        case _ => throw new IllegalArgumentException(s"bad GTID interval: $part")
      }
    }

  def format(iv: Vector[(Long, Long)]): String =
    iv.map { case (a, b) => if (a == b) a.toString else s"$a-$b" }.mkString(":")

  def contains(set: String, gno: Long): Boolean =
    parse(set).exists { case (a, b) => a <= gno && gno <= b }

  /** Add one gno, coalescing adjacent/overlapping intervals. */
  def add(set: String, gno: Long): String =
    format(merge(parse(set) :+ (gno, gno)))

  /** Union two sets (the Previous_gtids bootstrap arm). */
  def union(set: String, other: Vector[(Long, Long)]): String =
    format(merge(parse(set) ++ other))

  private def merge(iv: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    if (iv.isEmpty) return iv
    val sorted = iv.sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long)]
    var (ca, cb) = sorted.head
    sorted.tail.foreach { case (a, b) =>
      if (a <= cb + 1) cb = math.max(cb, b) // overlap or adjacency
      else { out += ((ca, cb)); ca = a; cb = b }
    }
    out += ((ca, cb))
    out.result()
  }
}
