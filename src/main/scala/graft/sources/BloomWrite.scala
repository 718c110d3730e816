package graft.sources

import org.apache.spark.sql.DataFrame

/** Parquet bloom-filter layout: per-column split-block bloom filters
  * written into the file footer, so a point-lookup reader can skip whole
  * row groups whose bloom says "key definitely absent" — the layout tool
  * for needle-in-haystack lookups on HIGH-CARDINALITY, UNSORTED keys,
  * where min/max statistics are useless (every row group spans nearly the
  * full key range) and Z-ordering ([[graft.functions.ZOrder]]) is the
  * heavier alternative that costs a global sort.
  *
  * At 100 TB: a doc_id/url-hash probe against an unordered corpus touches
  * every row group without blooms; with them, expected touched groups =
  * matches + fpp × groups. The filter is built at WRITE time from the
  * actual values — `expected.ndv` sizes it (bits ≈ -ndv·ln(fpp)/ln(2)²;
  * the default 1% fpp costs ~1.2 bytes/value — negligible next to the
  * data, paid once, saved every probe).
  *
  * The reference has no columnar layout at all (Kafka byte streams); this
  * is Spark-native surface. BloomLayoutSpec verifies the footer really
  * carries the filter, that absent keys probe negative (the skip
  * guarantee), and that filtered reads stay exact.
  */
object BloomWrite {

  /** Write `df` as parquet with bloom filters on `cols`.
    *
    * @param ndv expected distinct values per column — oversizing wastes
    *            footer bytes, undersizing inflates fpp; pass the real
    *            cardinality from a profiling pass when known.
    */
  def write(df: DataFrame, path: String, cols: Seq[String], ndv: Long = 1000000L): Unit =
    cols
      .foldLeft(df.write.mode("overwrite")) { (w, c) =>
        w.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
      }
      .parquet(path)
}
