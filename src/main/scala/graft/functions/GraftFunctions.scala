package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.{array, call_function, lit}

import graft.serde.{AvroDecodeContainer, AvroDecodeDatum, AvroEncodeContainer, AvroEncodeDatum}

/** Registration of the engine's custom Catalyst expressions.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for `spark.sql.extensions` / `withExtensions`
  *     (the idiomatic plugin path on a real cluster);
  *   - [[GraftFunctions.register]] for an already-built session (the local
  *     harness and tests).
  *
  * The reference's extension surface is "any Rust closure over the message
  * stream" (reference: callysto/src/types/agent.rs:86-91); ours is typed
  * Catalyst expressions that stay inside whole-stage codegen (vector math)
  * or tight eval loops (Avro serde).
  */
object GraftFunctions {

  /** Schema arguments must be foldable strings — they determine the
    * expression's result TYPE, which analysis needs before execution.
    */
  private def litString(e: Expression, fn: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"$fn: schema argument must be a string literal, got $other")
  }

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn: argument must be an int literal, got $other")
  }

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_norm" -> (args => L2Norm(args(0))),
    "graft_cosine" -> (args => CosineSimilarity(args(0), args(1))),
    "graft_to_avro" -> (args => AvroEncodeDatum(args(0))),
    "graft_from_avro" -> (args => AvroDecodeDatum(args(0), litString(args(1), "graft_from_avro"))),
    "graft_minhash" -> (args => MinHashSig(args(0), litInt(args(1), "graft_minhash"))),
    "graft_simhash_bits" -> (args => SimHashBits(args(0))),
    "graft_shingles" -> (args => ShingleExplode(args(0), litInt(args(1), "graft_shingles"))),
    "graft_shingle_hashes" ->
      (args => ShingleHashes(args(0), litInt(args(1), "graft_shingle_hashes"))),
    "graft_token_hashes" -> (args => TokenHashes(args(0))),
    "graft_deflate_ratio" -> (args => DeflateRatio(args(0))),
    "graft_ed1" -> (args => EditDistanceAtMost1(args(0), args(1))),
    "graft_dtw" -> (args => DtwDistance(args(0), args(1))),
    "graft_to_avro_file" -> (args => AvroEncodeContainer(args(0))),
    "graft_from_avro_file" ->
      (args => AvroDecodeContainer(args(0), litString(args(1), "graft_from_avro_file"))),
    "graft_unicode_norm" ->
      (args => UnicodeNormalize(args(0), litString(args(1), "graft_unicode_norm"))),
    "graft_strip_accents" -> (args => StripAccents(args(0))),
    "graft_lsh_buckets" ->
      (args => PortableLshBuckets(args(0), litInt(args(1), "graft_lsh_buckets"),
        litInt(args(2), "graft_lsh_buckets"), litInt(args(3), "graft_lsh_buckets"))),
    "graft_rp_dots" ->
      (args => PortableSignProject(args(0), litInt(args(1), "graft_rp_dots"),
        litInt(args(2), "graft_rp_dots"))),
    "graft_zorder" ->
      (args => ZOrderKey(args.tail, litInt(args.head, "graft_zorder"))),
    "graft_hilbert" -> (args => HilbertIndex(args(0), args(1))),
    "graft_lcs" -> (args => LcsLength(args(0), args(1))),
    "graft_subword" ->
      (args => SubwordTokenize(args(0), args(1), litInt(args(2), "graft_subword"))),
    "graft_deletions" -> (args => DeletionNeighborhood(args(0))),
    "graft_html_strip" -> (args => HtmlStripText(args(0))),
    "graft_cdc_chunk_starts" -> (args => CdcChunkStarts(args(0))),
    "graft_delta_varint_enc" -> (args => DeltaVarintEncode(args(0))),
    "graft_delta_varint_dec" -> (args => DeltaVarintDecode(args(0))),
    "graft_cell_cosines" -> (args => {
      require(args(1).foldable, "graft_cell_cosines centroid matrix must be a literal")
      val arr = args(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val flat = Array.tabulate(arr.numElements())(arr.getFloat)
      CellCosines(args(0), flat,
        litInt(args(2), "graft_cell_cosines"), litInt(args(3), "graft_cell_cosines"))
    })
  )

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, name)

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name), b)
    }

  // Column-API wrappers.
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def minhash(arr: Column, k: Int): Column = call_function("graft_minhash", arr, lit(k))
  def simhashBits(arr: Column): Column = call_function("graft_simhash_bits", arr)
  def shingles(text: Column, n: Int): Column = call_function("graft_shingles", text, lit(n))
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingle_hashes", text, lit(n))
  def tokenHashes(text: Column): Column = call_function("graft_token_hashes", text)
  def deflateRatio(text: Column): Column = call_function("graft_deflate_ratio", text)
  def ed1(a: Column, b: Column): Column = call_function("graft_ed1", a, b)
  def toAvro(s: Column): Column = call_function("graft_to_avro", s)
  def fromAvro(b: Column, schemaJson: String): Column =
    call_function("graft_from_avro", b, lit(schemaJson))
  def unicodeNorm(s: Column, form: String): Column =
    call_function("graft_unicode_norm", s, lit(form))
  def lshBuckets(vec: Column, nTables: Int, planesPerTable: Int, dim: Int): Column =
    call_function("graft_lsh_buckets", vec, lit(nTables), lit(planesPerTable), lit(dim))
  def rpDots(vec: Column, outDim: Int, dim: Int): Column =
    call_function("graft_rp_dots", vec, lit(outDim), lit(dim))
  def stripAccents(s: Column): Column = call_function("graft_strip_accents", s)
  def htmlStrip(s: Column): Column = call_function("graft_html_strip", s)
  def cdcChunkStarts(s: Column): Column = call_function("graft_cdc_chunk_starts", s)
  def deltaVarintEnc(a: Column): Column = call_function("graft_delta_varint_enc", a)
  def deltaVarintDec(b: Column): Column = call_function("graft_delta_varint_dec", b)
  def zorder(bits: Int, dims: Column*): Column =
    call_function("graft_zorder", (lit(bits) +: dims): _*)
  def hilbert(x: Column, y: Column): Column = call_function("graft_hilbert", x, y)
  def lcs(a: Column, b: Column): Column = call_function("graft_lcs", a, b)
  def subword(text: Column, vocab: Seq[String], maxPieceLen: Int): Column =
    call_function("graft_subword", text,
      array(vocab.map(lit): _*), lit(maxPieceLen))
  def deletionNeighborhood(s: Column): Column = call_function("graft_deletions", s)
  def cellCosines(vec: Column, cents: Array[Seq[Float]]): Column = {
    val dim = cents.map(_.length).max
    require(cents.forall(_.length == dim), "centroid cells must share one dimension")
    call_function("graft_cell_cosines", vec,
      lit(cents.flatten.toArray), lit(cents.length), lit(dim))
  }
  def toAvroFile(s: Column): Column = call_function("graft_to_avro_file", s)
  def fromAvroFile(b: Column, schemaJson: String): Column =
    call_function("graft_from_avro_file", b, lit(schemaJson))
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(classOf[DotProduct].getName, name), b)
      )
    }
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}
