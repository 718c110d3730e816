package graft

import graft.engine.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the round-6 config-chain bug: the unconditional
  * session configs (`nanosAsLong`, warehouse dir, UI off) were chained onto
  * the RocksDB-tuning else-branch, so `SPARK_GRAFT_ROCKSDB_TUNING=off`
  * built a session that could not read events.parquet (TIMESTAMP(NANOS)).
  * The config set is assembled by `Graft.sessionConfigs(tuned)` and must
  * carry the unconditional keys in BOTH lever states.
  */
class SessionConfigSpec extends AnyFunSuite {

  private val unconditional = Seq(
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.warehouse.dir",
    "spark.ui.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.adaptive.enabled",
    "spark.sql.streaming.stateStore.providerClass")

  private val tuningOnly = Seq(
    "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB",
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows")

  test("tuning-off config set keeps every unconditional key") {
    val off = Graft.sessionConfigs(tuned = false).toMap
    unconditional.foreach { k =>
      assert(off.contains(k), s"tuning-off session config set is missing $k")
    }
    assert(off("spark.sql.legacy.parquet.nanosAsLong") == "true")
    tuningOnly.foreach { k =>
      assert(!off.contains(k), s"tuning-off config set must not carry $k")
    }
  }

  test("tuning-on config set is tuning-off plus only the rocksdb tuning keys") {
    val on = Graft.sessionConfigs(tuned = true).toMap
    val off = Graft.sessionConfigs(tuned = false).toMap
    unconditional.foreach { k => assert(on.contains(k)) }
    tuningOnly.foreach { k => assert(on.contains(k)) }
    val extras = on.keySet -- off.keySet
    assert(extras.forall(_.startsWith("spark.sql.streaming.stateStore.rocksdb")),
      s"non-rocksdb keys vary with the tuning lever: ${extras.mkString(",")}")
  }

  test("a session carrying the tuning-off config set reads events.parquet") {
    // Env vars can't be flipped inside a running JVM, so the lever itself
    // can't be end-to-end tested here; instead: (a) test 1 proves the
    // tuning-off config SET carries nanosAsLong, (b) session() applies
    // sessionConfigs verbatim, and (c) a session with that key reads the
    // NANOS-timestamped events table — exactly what broke in round 6.
    val spark = SparkSpec.session
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    val n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(n > 0)
  }
}
