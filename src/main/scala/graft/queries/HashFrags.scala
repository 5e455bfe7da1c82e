package graft.queries

/** SQL fragments for the shared deterministic hashing primitives.
  *
  * Both engines evaluate the same exact-BIGINT polynomial folds:
  * Spark via the `aggregate`/`transform` higher-order functions, DuckDB
  * via `list_reduce`/`list_transform` (no-init reduce → seed prepended).
  * All intermediates stay < 2^36, far from BIGINT overflow, so the
  * arithmetic is engine-independent.
  */
private[graft] object HashFrags {
  val P = 1000000007L

  /** MinHash family h_i(x) = (A(i)*x + B(i)) mod P (8 functions). */
  val A: Seq[Long] = Seq(999983L, 1999993L, 2999999L, 4000037L,
    5000011L, 6000011L, 7000003L, 8000009L)
  val B: Seq[Long] = Seq(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L)

  /** Spark SQL: polynomial char hash of word expr `w` (BIGINT mod P) —
    * the native codegen [[graft.functions.PolyHash]], bit-identical to
    * the DuckDB fold below. */
  def wordCodeSpark(w: String): String = s"poly_hash($w)"

  /** DuckDB: the same fold via list_reduce with the seed prepended. */
  def wordCodeDuck(w: String): String =
    s"""list_reduce(list_prepend(CAST(7 AS BIGINT),
        list_transform(range(1, length($w) + 1), i -> CAST(ascii(substr($w, CAST(i AS INT), 1)) AS BIGINT))),
        (acc, c) -> (acc * 31 + c) % $P)"""
}
