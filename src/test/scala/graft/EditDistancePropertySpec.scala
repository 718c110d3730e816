package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.EditDistanceUtil

/** Property check of the banded ed≤1 scan against a reference Levenshtein
  * DP, over random string pairs biased toward near-misses (random pairs
  * alone almost never land within distance 1, which would leave the
  * interesting branch untested).
  */
class EditDistancePropertySpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def ed1(a: String, b: String): Int = {
    import org.apache.spark.unsafe.types.UTF8String
    EditDistanceUtil.ed1(UTF8String.fromString(a), UTF8String.fromString(b))
  }

  private val alpha = Gen.oneOf('a', 'b', 'c')        // tiny alphabet → collisions
  private val strGen = for {
    n <- Gen.choose(0, 8)
    cs <- Gen.listOfN(n, alpha)
  } yield cs.mkString

  private val mutGen: Gen[(String, String)] = for {
    s <- strGen
    kind <- Gen.choose(0, 3)
    pos <- Gen.choose(0, math.max(s.length - 1, 0))
    c <- alpha
  } yield kind match {
    case 0 => (s, s)                                            // identical
    case 1 if s.nonEmpty => (s, s.take(pos) + s.drop(pos + 1))  // deletion
    case 2 => (s, s.take(pos) + c + s.drop(pos))                // insertion
    case _ if s.nonEmpty => (s, s.take(pos) + c + s.drop(pos + 1)) // substitution
    case _ => (s, c.toString)
  }

  /** Reference DP over CODE POINTS — the plane levenshtein (Spark and
    * DuckDB) actually compares on; charAt-based DP would miscount
    * supplementary-plane text.
    */
  private def levCp(a: String, b: String): Int = {
    val ca = a.codePoints().toArray
    val cb = b.codePoints().toArray
    val d = Array.tabulate(ca.length + 1, cb.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to ca.length; j <- 1 to cb.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (ca(i - 1) == cb(j - 1)) 0 else 1))
    d(ca.length)(cb.length)
  }

  test("supplementary-plane chars count as ONE edit (code-point plane, levenshtein parity)") {
    val grin = "😀"  // U+1F600, two UTF-16 units
    val beam = "😁"  // U+1F601 — differs from grin in the LOW surrogate only
    assert(ed1(grin, beam) === 1, "one supplementary substitution = one edit, not two units")
    assert(ed1(s"a${grin}b", s"a${beam}b") === 1)
    assert(ed1(s"a$grin", "a") === 1, "deleting one supplementary char = one edit")
    assert(ed1(grin, grin) === 0)
    // randomized mixed-plane pairs against the code-point DP
    val cpAlpha = Gen.oneOf("a", "b", grin, beam)
    val cpStr = for { n <- Gen.choose(0, 6); cs <- Gen.listOfN(n, cpAlpha) } yield cs.mkString
    (0 until 2000).foreach { i =>
      val (a, b) = Gen.zip(cpStr, cpStr).apply(Gen.Parameters.default, Seed(11L + i)).get
      val exact = levCp(a, b)
      val fast = ed1(a, b)
      if (exact <= 1) assert(fast === exact, s"('$a','$b'): fast=$fast exact=$exact")
      else assert(fast === -1, s"('$a','$b'): expected -1 for distance $exact, got $fast")
    }
  }

  test("ed1 equals the DP distance whenever that distance is <= 1, and is NULL (-1) beyond") {
    val pairs =
      (0 until 4000).map { i =>
        val g = if (i % 2 == 0) mutGen else Gen.zip(strGen, strGen)
        g.apply(Gen.Parameters.default, Seed(7L + i)).get
      }
    pairs.foreach { case (a, b) =>
      val exact = lev(a, b)
      val fast = ed1(a, b)
      if (exact <= 1) assert(fast === exact, s"('$a','$b'): fast=$fast exact=$exact")
      else assert(fast === -1, s"('$a','$b'): expected -1 for distance $exact, got $fast")
    }
  }
}
