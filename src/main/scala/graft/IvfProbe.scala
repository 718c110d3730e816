import org.apache.spark.sql.functions._
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Graft.session("ivf-probe")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables(spark, dir).embeddings
    val qs = emb.filter($"vec_id" < 8)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f; println(f"PROBE $tag ${(System.nanoTime-t0)/1e9}%.2f s")
    }
    time("warmup")(emb.count())
    time("ivfTopK")(graft.operators.Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5).count())
    time("bruteForce")(graft.operators.Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5).count())
    time("ivfTopK2")(graft.operators.Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 5).count())
    spark.stop()
  }
}
