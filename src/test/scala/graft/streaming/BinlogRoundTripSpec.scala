package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import BinlogRowDecoder._

/** Property round-trip for the binlog RBR cell layer: random typed
  * rows → [[BinlogEncoder.rowImage]] → [[BinlogRowDecoder.decodeRow]]
  * must be identity. The r17 decode-fidelity bugs (unsigned tiers read
  * at widened signed widths, TEXT tiers reading the wrong prefix
  * bytes, TIME µs misscaled) were all of one class — a cell-width
  * mismatch that desyncs every LATER cell in the row — and golden
  * cells only pin the layouts someone thought to write down. Rows
  * here mix up to 24 random cells with random NULLs, so ANY
  * width/bitmap drift corrupts the remaining comparisons and fails
  * loudly across a far wider input space than the golden fixtures.
  * Pure byte-level (no Spark): thousands of rows in milliseconds. */
class BinlogRoundTripSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1842L + i)))

  /** Charset-representable strings: every char must survive
    * getBytes(cs) → new String(cs), or the failure would be the
    * GENERATOR's, not the codec's. */
  private def strGen(cs: String, maxChars: Int): Gen[String] = {
    val charGen = cs match {
      case "ISO-8859-1" => Gen.choose(' ', 'ÿ')
      case "GBK" => Gen.choose(' ', '~') // ascii plane of GBK
      case _ => Gen.frequency( // UTF-8: ascii + 2- and 3-byte BMP
        8 -> Gen.choose(' ', '~'),
        2 -> Gen.oneOf('é', 'ü', 'Ω', '→', '☃', '漢', '字'))
    }
    for {
      n <- Gen.choose(0, maxChars)
      chars <- Gen.listOfN(n, charGen)
    } yield chars.mkString
  }

  private val evenFsp = Gen.oneOf(0, 2, 4, 6)
  private def fracGen(fsp: Int): Gen[Long] =
    if (fsp == 0) Gen.const(0L)
    else Gen.choose(0L, math.pow(10, fsp).toLong - 1)
      .map(_ * math.pow(10, 6 - fsp).toLong) // µs, truncated to fsp

  /** One typed cell: the BinlogType plus a value the encoder accepts
    * whose decode must compare equal. */
  private val cellGen: Gen[(BinlogType, Any)] = {
    val tiny = Gen.choose(-128, 127).map(v => (TinyInt, v.toByte: Any))
    val short16 = Gen.choose(-32768, 32767)
      .map(v => (ShortInt, v.toShort: Any))
    val int24 = Gen.choose(-(1 << 23), (1 << 23) - 1)
      .map(v => (Int24, v: Any))
    val int32 = Gen.choose(Int.MinValue, Int.MaxValue)
      .map(v => (Int32, v: Any))
    val int64 = Gen.choose(Long.MinValue, Long.MaxValue)
      .map(v => (Int64, v: Any))
    val uTiny = Gen.choose(0, 255).map(v => (UTinyInt, v.toShort: Any))
    val uSmall = Gen.choose(0, 65535).map(v => (USmallInt, v: Any))
    val uInt24 = Gen.choose(0, (1 << 24) - 1).map(v => (UInt24, v: Any))
    val uInt32 = Gen.choose(0L, 0xffffffffL).map(v => (UInt32, v: Any))
    // UINT64: the unsigned reinterpretation of a random 64-bit pattern
    val uInt64 = Gen.choose(Long.MinValue, Long.MaxValue).map { l =>
      val bi = java.math.BigInteger.valueOf(l)
      val u = if (l >= 0) bi else bi.add(java.math.BigInteger.ONE.shiftLeft(64))
      (UInt64, new java.math.BigDecimal(u): Any)
    }
    val dbl = Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, 1.5e-300, Double.MaxValue, Double.MinPositiveValue))
      .map(v => (Float64, v: Any))
    val vcharSmall = for {
      cs <- Gen.oneOf("UTF-8", "ISO-8859-1", "GBK")
      s <- strGen(cs, 60) // ≤180 bytes — inside the 1-byte prefix
    } yield (Varchar(255, cs), s: Any)
    val vcharWide = for {
      cs <- Gen.oneOf("UTF-8", "ISO-8859-1")
      s <- strGen(cs, 400)
    } yield (Varchar(1024, cs), s: Any)
    val text = for {
      lenBytes <- Gen.oneOf(1, 2, 3, 4)
      cs <- Gen.oneOf("UTF-8", "ISO-8859-1")
      s <- strGen(cs, 60) // ≤180 bytes — inside even the 1-byte tier
    } yield (Text(lenBytes, cs), s: Any)
    val blob = for {
      lenBytes <- Gen.oneOf(1, 2, 3, 4)
      n <- Gen.choose(0, 200)
      bytes <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (Blob(lenBytes), bytes.toArray: Any)
    val time2 = for {
      fsp <- evenFsp
      secs <- Gen.choose(0L, 838L * 3600) // MySQL TIME range in whole hours
      fr <- fracGen(fsp)
      neg <- Gen.oneOf(true, false)
    } yield (Time2(fsp),
      (if (neg) -(secs * 1000000L + fr) else secs * 1000000L + fr): Any)
    val datetime2 = for {
      fsp <- evenFsp
      y <- Gen.choose(1, 9999); mo <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
      mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      fr <- fracGen(fsp)
    } yield (DateTime2(fsp),
      java.time.LocalDateTime.of(y, mo, d, h, mi, s, (fr * 1000).toInt): Any)
    val timestamp2 = for {
      fsp <- evenFsp
      sec <- Gen.choose(0L, 0xffffffffL)
      fr <- fracGen(fsp)
    } yield (Timestamp2(fsp), java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec, fr * 1000)): Any)
    Gen.oneOf(tiny, short16, int24, int32, int64, uTiny, uSmall, uInt24,
      uInt32, uInt64, dbl, vcharSmall, vcharWide, text, blob, time2,
      datetime2, timestamp2)
  }

  private def same(exp: Any, got: Any): Boolean = (exp, got) match {
    case (null, null) => true
    case (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.equals(a, b)
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      a.compareTo(b) == 0
    case (a: java.lang.Double, b: java.lang.Double) => // -0.0 ≠ 0.0 here
      java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(b)
    case (a, b) => a == b
  }

  test("property: random typed rows round-trip rowImage → decodeRow") {
    val rowGen = for {
      n <- Gen.choose(1, 24)
      cells <- Gen.listOfN(n, cellGen)
      nullAt <- Gen.listOfN(n, Gen.frequency(7 -> false, 1 -> true))
    } yield cells.zip(nullAt).map { case ((t, v), isNull) =>
      (t, if (isNull) null else v)
    }
    samples(rowGen, 300).foreach { row =>
      val specs = row.zipWithIndex.map { case ((t, _), i) =>
        ColSpec(s"c$i", t)
      }
      val values = row.map(_._2)
      val img = BinlogEncoder.rowImage(specs, values)
      val back = BinlogRowDecoder.decodeRow(img, specs)
      assert(back.size === values.size)
      values.zip(back).zipWithIndex.foreach { case ((exp, got), i) =>
        assert(same(exp, got),
          s"cell $i (${specs(i).tpe}): expected $exp, decoded $got — " +
            s"row types ${specs.map(_.tpe).mkString(", ")}")
      }
    }
  }

  test("property: a row of ONLY max-entropy variable cells keeps sync") {
    // the r17 failure mode in its purest form: every cell's width is
    // data-dependent, so one wrong prefix read corrupts ALL later cells
    val rowGen = for {
      n <- Gen.choose(4, 16)
      cells <- Gen.listOfN(n, Gen.oneOf(
        strGen("UTF-8", 50).map(s => (Varchar(255, "UTF-8"), s: Any)),
        strGen("UTF-8", 300).map(s => (Varchar(1024, "UTF-8"), s: Any)),
        Gen.choose(0, 120).flatMap(k =>
          Gen.listOfN(k, Gen.choose(Byte.MinValue, Byte.MaxValue))
            .map(b => (Blob(3), b.toArray: Any))),
        strGen("ISO-8859-1", 80).map(s => (Text(2, "ISO-8859-1"), s: Any))))
    } yield cells
    samples(rowGen, 200).foreach { row =>
      val specs = row.zipWithIndex.map { case ((t, _), i) =>
        ColSpec(s"v$i", t)
      }
      val back = BinlogRowDecoder.decodeRow(
        BinlogEncoder.rowImage(specs, row.map(_._2)), specs)
      row.map(_._2).zip(back).zipWithIndex.foreach { case ((exp, got), i) =>
        assert(same(exp, got), s"variable cell $i desynced")
      }
    }
  }
}
