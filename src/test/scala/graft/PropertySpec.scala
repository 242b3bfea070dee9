package graft

import graft.functions.{TokenJaccardUtil, VectorKernelUtil}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** §5.3 property-based layer: algebraic laws of the custom kernels
  * over generated inputs. ScalaCheck generators are driven with fixed
  * seeds (the scalatest-scalacheck bridge is not in the offline
  * cache, so sampling is done directly — deterministic by design).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n * 3).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  private def u(s: String) = UTF8String.fromString(s)

  test("token_jaccard: symmetric, bounded, 1 on equal non-empty, 0 vs empty") {
    samples(Gen.zip(text, text)).foreach { case (a, b) =>
      val j1 = TokenJaccardUtil.compute(u(a), u(b))
      val j2 = TokenJaccardUtil.compute(u(b), u(a))
      assert(j1 === j2, s"asymmetric for '$a' / '$b'")
      assert(j1 >= 0.0 && j1 <= 1.0)
    }
    samples(text).filter(_.trim.nonEmpty).foreach { a =>
      assert(TokenJaccardUtil.compute(u(a), u(a)) === 1.0)
      assert(TokenJaccardUtil.compute(u(a), u("")) === 0.0)
    }
  }

  test("sorted_jaccard on sorted distinct arrays equals token_jaccard on joined text") {
    samples(Gen.zip(Gen.listOf(word), Gen.listOf(word))).foreach { case (as, bs) =>
      val sa = as.distinct.sorted
      val sb = bs.distinct.sorted
      val viaArrays = VectorKernelUtil.sortedJaccard(
        ArrayData.toArrayData(sa.map(u).toArray),
        ArrayData.toArrayData(sb.map(u).toArray))
      val viaText = TokenJaccardUtil.compute(u(sa.mkString(" ")), u(sb.mkString(" ")))
      assert(viaArrays === viaText, s"$sa vs $sb")
    }
  }

  test("sorted_jaccard_min: exact j above tau, abandons only provable misses") {
    for (tau <- Seq(0.3, 0.5, 0.95)) {
      samples(Gen.zip(Gen.listOf(word), Gen.listOf(word))).foreach { case (as, bs) =>
        val sa = as.distinct.sorted; val sb = bs.distinct.sorted
        val aa = ArrayData.toArrayData(sa.map(u).toArray)
        val bb = ArrayData.toArrayData(sb.map(u).toArray)
        val exact = VectorKernelUtil.sortedJaccard(aa, bb)
        val fast = VectorKernelUtil.sortedJaccardMin(aa, bb, tau)
        if (exact >= tau)
          assert(fast === exact, s"lost a true pair at tau=$tau: $sa vs $sb")
        else
          assert(fast === exact || fast === -1.0, s"wrong abandon at tau=$tau: $sa vs $sb")
      }
    }
  }

  test("vec_dot: commutative; zero annihilates; Cauchy-Schwarz holds") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
    samples(Gen.zip(vec, vec)).foreach { case (a, b) =>
      val aa = ArrayData.toArrayData(a.toArray)
      val bb = ArrayData.toArrayData(b.toArray)
      assert(VectorKernelUtil.dot(aa, bb) === VectorKernelUtil.dot(bb, aa))
      val zero = ArrayData.toArrayData(Array.fill(16)(0.0))
      assert(VectorKernelUtil.dot(aa, zero) === 0.0)
      assert(math.abs(VectorKernelUtil.dot(aa, bb)) <=
        math.sqrt(VectorKernelUtil.dot(aa, aa)) * math.sqrt(VectorKernelUtil.dot(bb, bb)) + 1e-9)
    }
  }
}
