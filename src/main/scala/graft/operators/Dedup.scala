package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators for document corpora. All are shuffle-based —
  * candidate generation goes through a key (content hash, LSH band, simhash
  * chunk, shingle), never a cross join, so each scales linearly with a
  * 1000-executor cluster instead of quadratically.
  *
  * At 100 TB the knobs that matter:
  *   - shingle/band keys are 64-bit hashes → fixed-width shuffle rows;
  *   - hot shingles (boilerplate) can be df-capped via `maxDocFreq`;
  *   - pair generation joins two band streams co-partitioned on the band
  *     key, so AQE's skew-join splitting handles pathological buckets.
  */
object Dedup {

  /** Exact dedup: group by content hash of the normalized text, keep the
    * smallest id. The result (hash, keep_id, n_copies) is the decision
    * table a writer left-semi joins against.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(encode(normText(col(textCol)), "UTF-8")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH banded near-dup candidate pairs.
    *
    * shingle(n) → xxhash64 → k-minhash signature → b bands of r rows →
    * explode bands → self-join on (band, key) → estimate Jaccard as the
    * fraction of agreeing signature positions → filter.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, distinct.
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sigs = docs.select(
      col(idCol).as("id"),
      minhashSignature(hashed(shingles(tokens(col(textCol)), shingleN)), k).as("sig")
    )
    val banded = sigs
      .select(col("id"), col("sig"), explode(minhashBands(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(
      b,
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.id") < col("b.id")
    ).select(
      col("a.id").as("id_a"),
      col("b.id").as("id_b"),
      (aggregate(
        zip_with(col("a.sig"), col("b.sig"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0),
        (acc, v) => acc + v
      ).cast("double") / k).as("est_jaccard")
    ).filter(col("est_jaccard") >= threshold)
      .distinct()
  }

  /** SimHash near-dup pairs: 64-bit simhash, banded into 4×16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), verified by
    * exact hamming distance.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sigs = docs
      .withColumn("__th", hashed(tokens(col(textCol))))
      .select(col(idCol).as("id"), simhashBits("__th").as("bits"))
    val chunked = sigs
      .select(col("id"), col("bits"), explode(simhashChunks(col("bits"))).as("ck"))
      .select(col("id"), col("bits"), col("ck.chunk").as("chunk"), col("ck.ckey").as("ckey"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(
      b,
      col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.id") < col("b.id")
    ).select(
      col("a.id").as("id_a"),
      col("b.id").as("id_b"),
      hamming(col("a.bits"), col("b.bits")).as("hamming_dist")
    ).filter(col("hamming_dist") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles → self-join on shingle → common-count c;
    * |A ∪ B| = |A| + |B| − c. No approximation; the shuffle key is the
    * shingle, so no cross join ever materializes.
    *
    * `maxDocFreq` drops shingles appearing in more than that many docs
    * (boilerplate guard at scale); 0 disables.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Long = 0L
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), explode(shingles(tokens(col(textCol)), shingleN)).as("s"))
    val filtered =
      if (maxDocFreq > 0) {
        val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq).select(col("s"))
        sh.join(hot, Seq("s"), "left_anti")
      } else sh
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val common = a
      .join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")).cast("double")).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }
}
