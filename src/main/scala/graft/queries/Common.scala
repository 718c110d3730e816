package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.sources.Tables

/** One registered engine query: a Spark definition plus (optionally) the
  * equivalent ANSI SQL that DuckDB runs on the same parquet tables as the
  * correctness oracle. Queries without SQL-expressible semantics (sketches,
  * LSH, ANN) omit the oracle and get a weaker rows-only check.
  */
final case class GQuery(
    name: String,
    oracle: Option[String]
)(val run: (SparkSession, String) => DataFrame)

trait QuerySet {
  def queries: Seq[GQuery]
}

/** Oracle-parity helpers.
  *
  * Floating-point aggregation order differs between Spark (partition-parallel
  * partial aggregates) and DuckDB, so `SUM(double)` is not bit-reproducible.
  * We aggregate through DECIMAL(38,6) — exact arithmetic, order-insensitive —
  * and cast the final value back to DOUBLE, on BOTH sides. Per-row double
  * arithmetic (e.g. price * (1 - discount)) is IEEE-deterministic and safe.
  */
object Common {
  val D: DecimalType = DecimalType(38, 6)

  /** Order-insensitive exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Order-insensitive average: exact sum / count, divided in double. */
  def davg(c: Column): Column =
    sum(c.cast(D)).cast(DoubleType) / count(c).cast(DoubleType)

  /** SQL (DuckDB) counterpart of [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE)"

  /** SQL (DuckDB) counterpart of [[davg]]. */
  def sqlAvg(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT($expr) AS DOUBLE))"

  def t(spark: SparkSession, dir: String): Tables = Tables(spark, dir)
}

/** Scratch directories for queries that round-trip through files.
  *
  * Every dir is registered for recursive deletion at JVM exit (one shutdown
  * hook, not one per dir), so a bench harness running 3+ iterations of every
  * file-writing query doesn't strand hundreds of parquet copies in /tmp.
  * Queries whose results are eagerly materialized should additionally
  * [[Scratch.purge]] as soon as the last read is done — exit-time cleanup is
  * the backstop, not the plan.
  */
object Scratch {
  import java.nio.file.{Files, Path}
  import scala.collection.mutable

  private val live = mutable.Set.empty[Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    live.synchronized { live.toList }.foreach(deleteRecursively)))

  /** Create a tracked temp directory. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    live.synchronized { live += p }
    p
  }

  /** Delete a tracked dir NOW (results must already be materialized). */
  def purge(p: Path): Unit = {
    deleteRecursively(p)
    live.synchronized { live -= p }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val all = Files.walk(p).iterator().asScala.toList.reverse
      all.foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    }
}
