package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashImpls
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties for the pure-JVM expression kernels (no Spark
  * session — these run in milliseconds and sweep the input space the
  * example-based specs can't).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, s"$name: $r")
  }

  private val coord = Gen.chooseNum(0L, (1L << 31) - 1)

  test("zorder is invertible: even/odd bit extraction recovers both inputs") {
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
      x
    }
    check("invertible", Prop.forAll(coord, coord) { (x, y) =>
      val z = HashImpls.zorder(x, y)
      unspread(z) == x && unspread(z >> 1) == y && z >= 0
    })
  }

  test("zorder is order-preserving in each dimension with the other fixed") {
    check("monotone", Prop.forAll(coord, coord, coord) { (a, b, y) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      (HashImpls.zorder(lo, y) <= HashImpls.zorder(hi, y)) &&
        (HashImpls.zorder(y, lo) <= HashImpls.zorder(y, hi))
    })
  }

  private def luhnCheckDigit(d15: Seq[Int]): Int = {
    // digits left to right; final number = d15 :+ c (16 digits); from
    // the right, c is position 1 (not doubled), so d15's digit i
    // (1-based) doubles iff (17 - i) is even
    val s = d15.zipWithIndex.map { case (v, i0) =>
      if ((17 - (i0 + 1)) % 2 == 0) { val d = 2 * v; if (d > 9) d - 9 else d }
      else v
    }.sum
    (10 - s % 10) % 10
  }

  private val digits15 = Gen.listOfN(15, Gen.chooseNum(0, 9))

  test("luhn: constructed check digit always validates; any single-digit error is caught") {
    check("luhn", Prop.forAll(digits15, Gen.chooseNum(0, 15), Gen.chooseNum(1, 9)) {
      (d15, errPos, delta) =>
        val full = (d15 :+ luhnCheckDigit(d15)).mkString
        val valid = HashImpls.luhnValid(UTF8String.fromString(full))
        // corrupt exactly one digit by a non-zero delta mod 10
        val corrupted = full.updated(errPos,
          (((full(errPos) - '0') + delta) % 10 + '0').toChar)
        val caught = !HashImpls.luhnValid(UTF8String.fromString(corrupted))
        valid && caught
    })
  }

  test("luhn: separators are transparent, non-separator garbage is not") {
    check("separators", Prop.forAll(digits15) { d15 =>
      val full = (d15 :+ luhnCheckDigit(d15)).mkString
      val spaced = full.grouped(4).mkString(" ")
      val dashed = full.grouped(4).mkString("-")
      HashImpls.luhnValid(UTF8String.fromString(spaced)) &&
        HashImpls.luhnValid(UTF8String.fromString(dashed)) &&
        !HashImpls.luhnValid(UTF8String.fromString(full + "x"))
    })
  }
}
