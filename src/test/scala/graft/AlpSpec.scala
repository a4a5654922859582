package graft

import graft.codec.{Alp, ByteReader, ByteWriter, Chunks, Codecs}
import org.scalatest.funsuite.AnyFunSuite

/** ALP decimal-double codec: bit-exactness is by construction (the
  * encoder replays the decode expression per value), so these pin the
  * construction — exponent choice, the exception path for every IEEE
  * corner, the selector gate, and the PLAIN floor. */
class AlpSpec extends AnyFunSuite {

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

  test("decimal columns round-trip bit-exactly and pick ALP") {
    val rnd = new scala.util.Random(7)
    for (decimals <- 0 to 4) {
      val scale = math.pow(10.0, decimals)
      val vals = Array.fill(4096)(math.round(rnd.nextDouble() * 1e4 * scale) / scale)
      val enc = roundTrip(vals)
      assert((enc(0) & 0xFF) == Codecs.AlpDouble, s"decimals=$decimals")
      assert(enc.length < 8 * vals.length / 2,
        s"decimals=$decimals: ${enc.length}B vs plain ${8 * vals.length}B")
    }
  }

  test("IEEE corners all land in the exception path, bit-exact") {
    val corners = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, Double.MinPositiveValue,
      Double.MaxValue, -Double.MaxValue, java.lang.Double.MIN_NORMAL,
      1.0 / 3.0, math.Pi)
    // alone (forced ALP: selector would choose PLAIN here)
    val out = new ByteWriter(64)
    Alp.encodeDoubles(corners, 0, corners.length, 2, out)
    val dec = Alp.decodeDoubles(new ByteReader(out.toArray), corners.length)
    corners.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(dec(i)) ==
        java.lang.Double.doubleToRawLongBits(corners(i)))
    }
    // embedded in a decimal column (auto mode keeps ALP, patches them)
    val rnd = new scala.util.Random(11)
    val vals = Array.fill(2048)(math.round(rnd.nextDouble() * 1e7) / 100.0)
    corners.indices.foreach(i => vals(i * 11 + 3) = corners(i))
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.AlpDouble)
  }

  test("continuous doubles fall back to PLAIN (selector + floor)") {
    val rnd = new scala.util.Random(13)
    val vals = Array.fill(2048)(rnd.nextDouble())
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.PlainDouble)
    assert(enc.length <= 8 * vals.length + 10)
  }

  test("mixed decimal/continuous: ALP with patched exceptions still wins") {
    val rnd = new scala.util.Random(17)
    val vals = Array.tabulate(4096) { i =>
      if (i % 8 == 7) rnd.nextDouble() * 1000 // 12.5% continuous
      else math.round(rnd.nextDouble() * 1e6) / 100.0
    }
    val enc = roundTrip(vals)
    assert((enc(0) & 0xFF) == Codecs.AlpDouble)
    assert(enc.length < (8 * vals.length * 3) / 4)
  }

  test("edge sizes: empty, single, two, 4095/4096/4097") {
    for (n <- Seq(0, 1, 2, 4095, 4096, 4097)) {
      val rnd = new scala.util.Random(n)
      roundTrip(Array.fill(n)(math.round(rnd.nextDouble() * 1e6) / 100.0))
    }
  }

  test("exponent choice prefers the smallest that fits") {
    val whole = Array.tabulate(512)(i => (i * 37 % 1000).toDouble)
    assert(Alp.chooseExponent(whole, 0, whole.length) == 0)
    val cents = Array.tabulate(512)(i => (i * 37 % 1000) / 100.0)
    assert(Alp.chooseExponent(cents, 0, cents.length) == 2)
    val rnd = new scala.util.Random(23)
    val cont = Array.fill(512)(rnd.nextDouble())
    assert(Alp.chooseExponent(cont, 0, cont.length) == -1)
  }

  test("randomized fuzz: any double mix round-trips bit-exactly") {
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 20) {
      val n = 1 + rnd.nextInt(3000)
      val vals = Array.fill(n) {
        rnd.nextInt(5) match {
          case 0 => math.round(rnd.nextDouble() * 1e8) / 1000.0
          case 1 => rnd.nextDouble() * math.pow(10, rnd.nextInt(20) - 10)
          case 2 => rnd.nextInt(100000).toDouble
          case 3 => java.lang.Double.longBitsToDouble(rnd.nextLong())
          case _ => if (rnd.nextBoolean()) Double.NaN else -0.0
        }
      }
      roundTrip(vals)
    }
  }
}
