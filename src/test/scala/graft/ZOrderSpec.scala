package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, ZOrder}

/** Z-order layout key contract: exact bit placement, codegen/interpreted
  * agreement, and the actual file-skipping benefit the key exists for —
  * measured on written parquet, not asserted from theory.
  */
class ZOrderSpec extends SparkSpec {

  test("interleave places bit j of dim i at position j*n+i (model check)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(4)
      val bits = 1 + rnd.nextInt(63 / n)
      val vals = Array.fill(n)(rnd.nextLong().abs)
      val key = ZOrder.interleave(vals, bits)
      for (i <- 0 until n; j <- 0 until bits) {
        val expect = (vals(i) >>> j) & 1L
        val got = (key >>> (j * n + i)) & 1L
        assert(got === expect, s"n=$n bits=$bits dim=$i bit=$j")
      }
      // positions beyond n*bits must be zero
      assert(n * bits == 63 || (key >>> (n * bits)) === 0L)
    }
  }

  test("codegen'd column agrees with the Scala model and stays in codegen") {
    val s = spark
    import s.implicits._
    val df = graft.sources.Tables(s, sf).events
      .select($"event_id", $"user_id",
        dayofmonth(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"))
      .withColumn("zkey", GraftFunctions.zorder(10, $"user_id", $"day"))
    // a `*(n)` stage prefix on the projection = inside WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("graft_zorder")).get
    assert(projLine.trim.startsWith("*("),
      s"zorder projection must stay inside whole-stage codegen: $projLine")
    df.collect().foreach { r =>
      val expect = ZOrder.interleave(Array(r.getLong(1), r.getInt(2).toLong), 10)
      assert(r.getLong(3) === expect, s"event ${r.getLong(0)}")
    }
  }

  test("null dim -> null key; int and long dims both accepted") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(3L), Some(5)), (None, Some(5)), (Some(3L), None))
      .toDF("a", "b")
      .select(GraftFunctions.zorder(4, $"a", $"b").as("z"))
    val got = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // a=3 (011), b=5 (101): bits interleave as j*2+i
    val expect = ZOrder.interleave(Array(3L, 5L), 4)
    assert(got.toList === List(Some(expect), None, None))
  }

  test("z-order layout bounds the WORST-dimension file skipping; single-dim sort does not") {
    val s = spark
    import s.implicits._
    // 10-bit user dim, day dim 1..30. A layout sorted by user alone is
    // perfect for user filters and useless for day filters; the z-order
    // layout must beat the single-sort layout's WORST case across the
    // two dimensions (the whole point of multi-dim clustering).
    val ev = graft.sources.Tables(s, sf).events
      .select($"event_id", ($"user_id" % 1024).as("u"),
        dayofmonth(graft.streaming.StreamOps.tsFromNanos($"ts")).as("day"))
      .withColumn("zkey", GraftFunctions.zorder(10, $"u", $"day"))
    val nFiles = 16

    def writeSorted(df: org.apache.spark.sql.DataFrame, by: String): String = {
      val path = Files.createTempDirectory(s"graft-zorder-$by").resolve("t").toString
      df.repartitionByRange(nFiles, col(by)).sortWithinPartitions(col(by))
        .write.parquet(path)
      path
    }

    // files whose [min,max] interval on `dim` intersects [lo,hi] — the
    // row-group-stats skipping model parquet readers actually apply
    def touched(path: String, dim: String, lo: Long, hi: Long): Int =
      s.read.parquet(path).inputFiles.count { f =>
        val r = s.read.parquet(f)
          .agg(min(col(dim)).cast("long"), max(col(dim)).cast("long")).head
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }

    val byUser = writeSorted(ev, "u")
    val byZ = writeSorted(ev, "zkey")

    // 1/8-width box on each dimension
    val uTouchedSort = touched(byUser, "u", 256, 383)
    val dTouchedSort = touched(byUser, "day", 10, 13)
    val uTouchedZ = touched(byZ, "u", 256, 383)
    val dTouchedZ = touched(byZ, "day", 10, 13)

    val worstSort = math.max(uTouchedSort, dTouchedSort)
    val worstZ = math.max(uTouchedZ, dTouchedZ)
    assert(dTouchedSort >= nFiles * 3 / 4,
      s"single-dim sort must be near-useless for the other dim, touched $dTouchedSort/$nFiles")
    assert(worstZ < worstSort,
      s"z-order worst-dim $worstZ must beat single-sort worst-dim $worstSort " +
        s"(u: $uTouchedSort->$uTouchedZ, day: $dTouchedSort->$dTouchedZ)")
  }
}
