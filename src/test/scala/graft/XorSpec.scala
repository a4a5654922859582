package graft

import graft.codec.{ByteReader, ByteWriter, Chunks, Codecs, Xor}
import org.scalatest.funsuite.AnyFunSuite

/** Gorilla-style XOR double codec: raw bits round-trip through XOR by
  * construction, so these pin the bit-stream grammar (all three
  * controls), the IEEE corners, the contiguous-prefix selector probe,
  * and the PLAIN floor on adversarial tails. */
class XorSpec extends AnyFunSuite {

  private def roundTrip(vals: Array[Double]): Array[Byte] = {
    val enc = Chunks.encodeDoubles(vals, 0, vals.length)
    val dec = Chunks.decodeDoubles(enc)
    assert(dec.length == vals.length)
    var i = 0
    while (i < vals.length) {
      assert(java.lang.Double.doubleToRawLongBits(dec(i)) ==
        java.lang.Double.doubleToRawLongBits(vals(i)),
        s"bit mismatch at $i: ${vals(i)} -> ${dec(i)}")
      i += 1
    }
    enc
  }

  private def forcedRoundTrip(vals: Array[Double]): Int = {
    val out = new ByteWriter(64)
    Xor.encodeDoubles(vals, 0, vals.length, out)
    val dec = Xor.decodeDoubles(new ByteReader(out.toArray), vals.length)
    vals.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(dec(i)) ==
        java.lang.Double.doubleToRawLongBits(vals(i)), s"at $i: ${vals(i)}")
    }
    out.length
  }

  test("smooth binary-fraction series picks XOR and beats PLAIN 4x+") {
    // multiples of 2^-20 near 1.0: identical exponent, ~6 moving
    // mantissa bits, NOT decimal (needs 10^20 > ALP's MaxExp=15)
    val vals = Array.tabulate(4096)(i => 1.0 + ((i * 37) % 51) / 1048576.0)
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.XorDouble,
      s"selector chose ${Codecs.names(enc(0) & 0xFF)}")
    assert(enc.length * 4 < 8 * vals.length, s"${enc.length}B vs ${8 * vals.length}B")
  }

  test("constant series costs ~1 bit per value") {
    // 1/3's shortest decimal is 16 digits > ALP's MaxExp=15, so the
    // selector's ALP probe fails and the XOR probe sees the constant
    // (pi itself round-trips through ALP at e=15 and ALP wins there)
    val vals = Array.fill(4096)(1.0 / 3.0)
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.XorDouble)
    assert(enc.length < 16 + 8 + 4096 / 8 + 8, s"${enc.length}B")
  }

  test("IEEE corners round-trip bit-exactly (forced XOR)") {
    forcedRoundTrip(Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 0.0, Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, java.lang.Double.MIN_NORMAL,
      1.0 / 3.0, math.Pi, -math.Pi))
  }

  test("random doubles fall back to PLAIN in auto mode") {
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(4096)(
      java.lang.Double.longBitsToDouble(rnd.nextLong()))
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.PlainDouble,
      s"selector chose ${Codecs.names(enc(0) & 0xFF)}")
  }

  test("PLAIN floor: smooth probe prefix, adversarial random tail") {
    val rnd = new scala.util.Random(13)
    val vals = Array.tabulate(8192) { i =>
      if (i < 2048) 1.0 + (i % 7) / 1048576.0
      else java.lang.Double.longBitsToDouble(rnd.nextLong())
    }
    val enc = roundTrip(vals) // whatever wins, never above PLAIN+frame
    assert(enc.length <= 10 + 8 * vals.length, s"${enc.length}B")
  }

  test("edge sizes: empty, single, two, 4095/4096/4097") {
    for (n <- Seq(0, 1, 2, 4095, 4096, 4097)) {
      val vals = Array.tabulate(n)(i => 2.5 + (i % 3) / 1048576.0)
      forcedRoundTrip(vals)
      roundTrip(vals)
    }
  }

  test("window-reuse control ('10') exercises and round-trips") {
    // alternating XOR widths: a wide '11' rewindow then narrower
    // values that fit inside it take the '10' path
    val base = java.lang.Double.doubleToRawLongBits(1.5)
    val vals = Array.tabulate(512) { i =>
      java.lang.Double.longBitsToDouble(base ^ ((i % 15).toLong << 20))
    }
    forcedRoundTrip(vals)
  }

  test("randomized fuzz: any double mix round-trips bit-exactly") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 20) {
      val n = 1 + rnd.nextInt(3000)
      val vals = Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => 1.0 + rnd.nextInt(100) / 1048576.0
          case 1 => java.lang.Double.longBitsToDouble(rnd.nextLong())
          case 2 => rnd.nextInt(10) match {
            case 0 => Double.NaN
            case 1 => Double.PositiveInfinity
            case _ => -0.0
          }
          case _ => math.Pi
        }
      }
      forcedRoundTrip(vals)
      roundTrip(vals)
    }
  }
}
