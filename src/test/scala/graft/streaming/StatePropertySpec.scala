package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks of the state-table semantics (SURVEY.md §5):
  * upsert last-write-wins, tombstone delete, and replay idempotence — the
  * invariants the reference's `apply_changelog_batch` maintains with
  * max-offset-per-partition bookkeeping (callysto/src/stores/
  * inmemory.rs:185-226). Random op logs from ScalaCheck generators are
  * compared against an in-memory model fold.
  */
class StatePropertySpec extends SparkSpec {

  private val opGen: Gen[(String, Long, Option[Double])] = for {
    key <- Gen.oneOf((1 to 8).map(i => s"k$i"))
    seq <- Gen.choose(0L, 1000L)
    value <- Gen.option(Gen.choose(-1e6, 1e6))
  } yield (key, seq, value)

  private def logGen(n: Int): Gen[List[(String, Long, Option[Double])]] =
    Gen.listOfN(n, opGen)

  private def sample(i: Long): List[(String, Long, Option[Double])] =
    logGen(60).apply(Gen.Parameters.default, Seed(42L + i)).get

  /** Model: last (by seq, then insertion index as tiebreak) op per key;
    * None value = tombstone (key absent from the final state).
    */
  private def model(ops: List[(String, Long, Option[Double])]): Map[String, Double] =
    ops.zipWithIndex
      .groupBy(_._1._1)
      .flatMap { case (k, entries) =>
        val (op, _) = entries.maxBy { case ((_, seq, _), idx) => (seq, idx.toLong) }
        op._3.map(k -> _)
      }

  test("batch snapshot upsert: last write per key wins, tombstones delete (10 random op logs)") {
    val s = spark
    import s.implicits._
    for (i <- 0L until 10L) {
      val ops = sample(i)
      val df = ops.zipWithIndex
        .map { case ((k, seq, v), idx) => (k, seq, idx.toLong, v) }
        .toDF("key", "seq", "idx", "value")
      val snap = StateTable
        .snapshot(df, keyCols = Seq("key"), orderCols = Seq("seq", "idx"))
        .filter($"value".isNotNull) // tombstone = deleted
        .select($"key", $"value")
        .as[(String, Double)]
        .collect()
        .toMap
      assert(snap === model(ops), s"sample $i diverged from model")
    }
  }

  test("STREAMING state table matches the model fold over random op logs (3 seeded samples)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    for (i <- 20L until 23L) {
      val ops = sample(i)
      // single input partition: op order per key must be deterministic
      // through the shuffle (one map task => order-preserving)
      val input = MemoryStream[StateOp[String, Double]](numPartitions = 1)
      val collected = scala.collection.mutable.ArrayBuffer.empty[StateChange[String, Double]]
      val q = StateTable
        .changes(input.toDS())
        .writeStream
        .outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-prop-$i").toString)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[StateChange[String, Double]], _: Long) =>
            collected.synchronized { collected ++= ds.collect() }; ()
        }
        .start()
      // ops arrive in log order (seq here is just part of the payload; the
      // stream order IS the op order, so the model folds by index only)
      ops.grouped(20).foreach { batch =>
        input.addData(batch.map { case (k, _, v) =>
          v.fold(StateOp.del[String, Double](k))(x => StateOp.set(k, x))
        }: _*)
        q.processAllAvailable()
      }
      q.stop()

      val finalState = collected
        .groupBy(_.key)
        .view
        .mapValues(_.last)
        .collect { case (k, c) if !c.deleted => k -> c.value.get }
        .toMap
      val expected = ops.zipWithIndex
        .groupBy(_._1._1)
        .flatMap { case (k, entries) =>
          entries.maxBy(_._2)._1._3.map(k -> _)
        }
      assert(finalState === expected, s"sample $i: streaming state diverged from model")
    }
  }

  test("replay idempotence: applying the same log twice yields the same state") {
    val s = spark
    import s.implicits._
    for (i <- 10L until 15L) {
      val ops = sample(i)
      val once = ops.zipWithIndex.map { case ((k, seq, v), idx) => (k, seq, idx.toLong, v) }
      val twice = once ++ once // re-delivered batch, same offsets
      def state(rows: List[(String, Long, Long, Option[Double])]) = StateTable
        .snapshot(rows.toDF("key", "seq", "idx", "value"),
          keyCols = Seq("key"), orderCols = Seq("seq", "idx"))
        .filter($"value".isNotNull)
        .select($"key", $"value")
        .as[(String, Double)]
        .collect()
        .toMap
      assert(state(twice) === state(once), s"sample $i not idempotent under replay")
    }
  }
}
