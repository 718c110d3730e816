package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.CdcChunkUtil

/** Property checks of the O(n) incremental CDC rolling-hash scan against
  * the per-position definition (Σ c_{i−k}·B^k mod P), over random strings
  * spanning the branchy regimes: shorter than the window, exactly the
  * window, boundary-dense (tiny alphabet → frequent hash collisions with
  * the mask), and multi-byte code points. A generator-level check that
  * engine and oracle compute THE SAME FUNCTION — the fixture-based
  * ExtensionSpec tests pin behavior, this pins the algebra.
  */
class CdcPropertySpec extends SparkSpec {

  import CdcChunkUtil.{Mask, Mod, Window, powers}

  /** Reference: hash every window from scratch, no sliding. */
  private def refStarts(text: String): Seq[Int] = {
    val cps = text.codePoints().toArray
    val n = cps.length
    1 +: (Window to n).filter { i =>
      i < n && {
        val h = (0 until Window).map(k => cps(i - 1 - k).toLong * powers(k) % Mod).sum % Mod
        h % Mask == 0L
      }
    }.map(_ + 1)
  }

  private def fastStarts(text: String): Seq[Int] = {
    import org.apache.spark.unsafe.types.UTF8String
    val arr = CdcChunkUtil.starts(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getInt)
  }

  private val cp: Gen[Int] = Gen.frequency(
    8 -> Gen.choose('a'.toInt, 'd'.toInt), // tiny alphabet → dense boundaries
    1 -> Gen.oneOf(' '.toInt, 'é'.toInt, '你'.toInt, 0x1F600) // 1-4 byte UTF-8
  )
  private val textGen: Gen[String] = for {
    n <- Gen.frequency(
      2 -> Gen.choose(0, Window),          // sub-window + exact-window edge
      8 -> Gen.choose(Window + 1, 400))
    cs <- Gen.listOfN(n, cp)
  } yield cs.flatMap(Character.toChars(_).toSeq).mkString

  test("incremental starts == from-scratch definition on 500 random strings") {
    val seed0 = Seed(20260814L)
    var seed = seed0
    var checked = 0
    var boundaryful = 0
    while (checked < 500) {
      val (s, next) = {
        val r = textGen.apply(Gen.Parameters.default, seed)
        (r.getOrElse(""), seed.next)
      }
      seed = next
      val want = refStarts(s)
      val got = fastStarts(s)
      assert(got == want,
        s"starts diverge on ${s.take(60)}... got=$got want=$want")
      if (want.length > 1) boundaryful += 1
      checked += 1
    }
    // the property is vacuous if no generated string ever had a boundary
    assert(boundaryful > 50, s"only $boundaryful/500 strings hit a boundary — generator too weak")
  }

  test("starts are always sorted, distinct, in [1, n], and begin at 1") {
    var seed = Seed(77L)
    (1 to 200).foreach { _ =>
      val r = textGen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      val s = r.getOrElse("")
      val n = s.codePointCount(0, s.length)
      val st = fastStarts(s)
      assert(st.headOption.contains(1))
      assert(st == st.sorted && st.distinct.size == st.size)
      assert(st.forall(p => p >= 1 && p <= math.max(n, 1)))
    }
  }
}
