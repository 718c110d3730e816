package graft.queries

import graft.engine.PlanOnly.syntax._

import org.apache.spark.sql.functions._

import Common._
import graft.operators.TextOps._

/** Text-analysis inventory over the documents table: statistics, quality
  * scoring, language ID, token counting, fingerprinting, corpus-level
  * token frequencies. All pure column expressions (codegen'd, row-parallel,
  * no shuffle except the explicit groupBys).
  */
object TextAnalysis extends QuerySet {

  /** Per-document surface statistics. Everything is integer arithmetic or
    * a deterministic double division, so the DuckDB oracle matches exactly.
    */
  val qStats: GQuery = GQuery(
    "q_text_stats",
    Some("""
      SELECT doc_id,
             length(text) AS n_chars2,
             len(string_split(text, ' ')) AS n_tokens,
             length(replace(text, ' ', '')) AS n_nonspace,
             CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
             len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split($"text", " ")
    t(spark, dir).documents
      .select(
        $"doc_id",
        length($"text").as("n_chars2"),
        size(toks).as("n_tokens"),
        length(regexp_replace($"text", " ", "")).as("n_nonspace"),
        (length(regexp_replace($"text", " ", "")).cast("double") / size(toks)).as("avg_token_len"),
        size(array_distinct(toks)).as("n_distinct_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("distinct_ratio")
      )
      .orderBy($"doc_id")
  }

  /** Heuristic quality score in [0,1]: token volume, vocabulary diversity,
    * stopword presence — the standard cheap pre-filter in training-data
    * pipelines (cf. C4/Gopher rules), as one deterministic expression.
    */
  val qQuality: GQuery = GQuery(
    "q_text_quality",
    Some("""
      WITH s AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS diversity,
               CAST(len(list_filter(string_split(text, ' '),
                                    t -> list_contains(['the','a','and','of','to'], t))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio
        FROM documents)
      SELECT doc_id,
             0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               + 0.4 * diversity
               + 0.2 * least(stopword_ratio * 10.0, 1.0) AS quality
      FROM s
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split($"text", " ")
    val stop = Seq("the", "a", "and", "of", "to")
    val diversity = size(array_distinct(toks)).cast("double") / size(toks)
    val stopRatio = markerHits(toks, stop).cast("double") / size(toks)
    t(spark, dir).documents
      .select(
        $"doc_id",
        (lit(0.4) * least(size(toks).cast("double") / 50.0, lit(1.0))
          + lit(0.4) * diversity
          + lit(0.2) * least(stopRatio * 10.0, lit(1.0))).as("quality")
      )
      .orderBy($"doc_id")
  }

  /** N-gram-marker language ID: count marker-token hits per language,
    * argmax with deterministic tie-break (score desc, language asc).
    */
  val qLangId: GQuery = GQuery(
    "q_text_langid",
    Some("""
      WITH s AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','is','with'], t))) AS en_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist'], t))) AS de_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','est','avec'], t))) AS fr_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['el','los','y','es','con'], t))) AS es_score
        FROM documents)
      SELECT doc_id, lang AS labeled_lang,
             CASE WHEN en_score = 0 AND de_score = 0 AND fr_score = 0 AND es_score = 0 THEN 'unknown'
                  WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
                  WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
                  WHEN es_score >= fr_score THEN 'es'
                  ELSE 'fr' END AS predicted_lang,
             en_score
      FROM s
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split($"text", " ")
    val en = markerHits(toks, Seq("the", "a", "and", "is", "with"))
    val de = markerHits(toks, Seq("der", "die", "das", "und", "ist"))
    val fr = markerHits(toks, Seq("le", "la", "et", "est", "avec"))
    val es = markerHits(toks, Seq("el", "los", "y", "es", "con"))
    t(spark, dir).documents
      .select($"doc_id", $"lang".as("labeled_lang"), en.as("en_score"),
        de.as("de_score"), fr.as("fr_score"), es.as("es_score"))
      .select(
        $"doc_id",
        $"labeled_lang",
        when($"en_score" === 0 && $"de_score" === 0 && $"fr_score" === 0 && $"es_score" === 0, "unknown")
          .when($"en_score" >= $"de_score" && $"en_score" >= $"fr_score" && $"en_score" >= $"es_score", "en")
          .when($"de_score" >= $"fr_score" && $"de_score" >= $"es_score", "de")
          .when($"es_score" >= $"fr_score", "es")
          .otherwise("fr")
          .as("predicted_lang"),
        $"en_score"
      )
      .orderBy($"doc_id")
  }

  /** Blocklist screening (C4-style badwords filter): per document, how
    * many DISTINCT blocked terms appear, how many token occurrences are
    * blocked, and a flag once blocked mass exceeds 2% of the document.
    * The list rides as an array literal (broadcast-sized by definition);
    * matching is exact token equality after the corpus-wide whitespace
    * tokenization — a pure map stage, no shuffle at any scale. Real
    * pipelines swap the literal for a broadcast dimension or an
    * Aho-Corasick expression when the list grows to thousands of terms.
    */
  val qBlocklist: GQuery = GQuery(
    "q_text_blocklist",
    Some("""
      SELECT doc_id,
             len(list_intersect(list_distinct(string_split(text, ' ')),
                                ['slow', 'error', 'vector'])) AS n_blocked_terms,
             len(list_filter(string_split(text, ' '),
                             t -> list_contains(['slow', 'error', 'vector'], t)))
               AS n_blocked_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                                  t -> list_contains(['slow', 'error', 'vector'], t)))
                  AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE)
               > CAST(0.02 AS DOUBLE) AS flagged
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val blocked = array(lit("slow"), lit("error"), lit("vector"))
    val toks = split($"text", " ")
    val nBlockedTokens = size(filter(toks, tk => array_contains(blocked, tk)))
    t(spark, dir).documents
      .select(
        $"doc_id",
        size(array_intersect(array_distinct(toks), blocked)).as("n_blocked_terms"),
        nBlockedTokens.as("n_blocked_tokens"),
        (nBlockedTokens.cast("double") / size(toks).cast("double") > lit(0.02))
          .as("flagged")
      )
      .orderBy($"doc_id")
  }

  /** Token counting, whitespace + BPE-ish regex variants. */
  val qTokenCount: GQuery = GQuery(
    "q_text_token_count",
    Some("""
      SELECT doc_id,
             len(string_split(text, ' ')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
             CAST(ceil(length(text) / 4.0) AS BIGINT) AS byte_estimate
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select(
        $"doc_id",
        size(split($"text", " ")).as("ws_tokens"),
        size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .as("bpe_ish_tokens"),
        ceil(length($"text") / 4.0).cast("long").as("byte_estimate")
      )
      .orderBy($"doc_id")
  }

  /** Content fingerprints: exact (md5 of normalized text) and word-order-
    * insensitive (md5 of sorted token list) — the join keys for exact and
    * shuffled-dup detection.
    */
  val qFingerprint: GQuery = GQuery(
    "q_text_fingerprint",
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_fp,
             md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bag_fp
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select(
        $"doc_id",
        md5(encode(normText($"text"), "UTF-8")).as("content_fp"),
        md5(encode(concat_ws(" ", array_sort(split($"text", " "))), "UTF-8")).as("bag_fp")
      )
      .orderBy($"doc_id")
  }

  /** Corpus-level token frequency: explode → group → top 50. */
  val qTokenFreq: GQuery = GQuery(
    "q_text_token_freq",
    Some("""
      SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token
      ORDER BY freq DESC, token
      LIMIT 50""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"), countDistinct($"doc_id").as("doc_freq"))
      .orderBy($"freq".desc, $"token")
      .limit(50)
  }

  /** Top document-frequency shingles via the custom [[graft.functions.ShingleExplode]]
    * Generator (UDTF) — one output row per distinct 3-gram per document,
    * generated in a single pass over the text (no intermediate arrays).
    * Deterministic order: df desc, then shingle.
    */
  val qShingleExplode: GQuery = GQuery(
    "q_gen_shingles",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT doc_id, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3)
      SELECT s AS shingle, COUNT(*) AS df
      FROM sh GROUP BY s
      ORDER BY df DESC, shingle
      LIMIT 25""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select($"doc_id", graft.functions.GraftFunctions.shingles($"text", 3))
      .groupBy($"shingle")
      .agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"shingle")
      .limit(25)
  }

  /** PII / sensitive-token redaction — the scrub step every training-data
    * pipeline runs before release. Pure codegen'd regexp_replace /
    * regexp_count column expressions (row-parallel, no shuffle, scales
    * with the scan). Patterns here are digit runs and emails over the
    * events payload; real deployments swap in their phone/SSN/address
    * pattern set — the operator shape is identical.
    */
  val qRedact: GQuery = GQuery(
    "q_text_redact",
    Some("""
      SELECT event_id,
             regexp_replace(
               regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\d+', '[NUM]', 'g') AS redacted,
             CAST(len(regexp_extract_all(props, '\d+')) AS INT) AS n_redacted
      FROM events
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    t(spark, dir).events
      .select(
        $"event_id",
        regexp_replace(
          regexp_replace($"props", lit(email), lit("[EMAIL]")),
          lit("\\d+"), lit("[NUM]")).as("redacted"),
        regexp_count($"props", lit("\\d+")).as("n_redacted")
      )
      .orderBy($"event_id")
  }

  /** Document chunking: overlapping token windows (width 32, stride 24) —
    * the shaping step that turns a corpus into training sequences. One
    * narrow pass: tokenize, generate window starts with `sequence`,
    * explode, slice — rows scale with corpus size x overlap factor, no
    * shuffle until the final order. Chunks are emitted as md5 hashes
    * (training pipelines key chunks; dragging full text through the
    * result defeats the point).
    */
  val qChunk: GQuery = GQuery(
    "q_text_chunk",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      w AS (SELECT doc_id, ts,
                   unnest(generate_series(0, greatest(CAST(ceil((len(ts) - 32) / 24.0) AS BIGINT), 0))) AS i
            FROM t)
      SELECT doc_id,
             CAST(i AS INT) AS chunk_id,
             CAST(len(ts[i*24 + 1 : i*24 + 32]) AS INT) AS n_tokens,
             md5(array_to_string(ts[i*24 + 1 : i*24 + 32], ' ')) AS chunk_hash
      FROM w
      ORDER BY doc_id, chunk_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ")
    t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .select(
        $"doc_id", $"ts",
        explode(sequence(
          lit(0),
          greatest(ceil((size($"ts") - 32) / 24.0).cast("long"), lit(0L)))).as("i")
      )
      .select(
        $"doc_id",
        $"i".cast("int").as("chunk_id"),
        size(slice($"ts", ($"i" * 24 + 1).cast("int"), lit(32))).as("n_tokens"),
        md5(encode(concat_ws(" ", slice($"ts", ($"i" * 24 + 1).cast("int"), lit(32))), "UTF-8")).as("chunk_hash")
      )
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Within-document repetition score (Gopher-style quality rule): the
    * fraction of 3-gram shingles that are duplicates of an earlier one in
    * the same document. Pure per-row column math over the shingle arrays —
    * row-parallel, scales with the scan.
    */
  val qRepetition: GQuery = GQuery(
    "q_text_repetition",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      s AS (SELECT doc_id,
                   CASE WHEN len(ts) >= 3
                        THEN list_transform(generate_series(1, len(ts) - 2),
                                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])
                        ELSE [array_to_string(ts, ' ')] END AS sh
            FROM t)
      SELECT doc_id,
             CAST(len(sh) AS INT) AS n_shingles,
             CAST(len(list_distinct(sh)) AS INT) AS n_distinct,
             round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 6) AS dup_frac
      FROM s
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ")
    // 3-grams via three shifted slices zipped pairwise: each slice
    // evaluates `ts` once per ROW. (An index lambda —
    // transform(sequence(...), i -> element_at(ts, i)...) — would re-run
    // the inlined tokenize pipeline per ELEMENT: the round-1 CSE trap.)
    val sh = when(
      size($"ts") >= 3,
      zip_with(
        zip_with(
          slice($"ts", lit(1), size($"ts") - 2),
          slice($"ts", lit(2), size($"ts") - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice($"ts", lit(3), size($"ts") - 2),
        (ab, c) => concat(ab, lit(" "), c))
    ).otherwise(array(concat_ws(" ", $"ts")))
    t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .select($"doc_id", sh.as("sh"))
      .select(
        $"doc_id",
        size($"sh").as("n_shingles"),
        size(array_distinct($"sh")).as("n_distinct"),
        round(lit(1.0) - size(array_distinct($"sh")).cast("double") / size($"sh"), 6).as("dup_frac")
      )
      .orderBy($"doc_id")
  }

  /** TF-IDF top-3 characteristic terms per document
    * ([[graft.operators.TextOps.tfidfTopK]]). The idf is the log-free
    * BM25-style ratio so both engines compute bit-identical doubles
    * (see the operator's Scaladoc); the oracle mirrors the exact
    * operation order.
    */
  val qTfidf: GQuery = GQuery(
    "q_text_tfidf",
    Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
           df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
           n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
           scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                             CAST(tf.tf AS DOUBLE) *
                               ((CAST(n.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) AS score
                      FROM tf JOIN df USING (term) CROSS JOIN n),
           ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                                   ORDER BY score DESC, term) AS rk
                      FROM scored)
      SELECT doc_id, term, tf, df, score
      FROM ranked WHERE rk <= 3
      ORDER BY doc_id, score DESC, term""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TextOps
      .tfidfTopK(t(spark, dir).documents, "doc_id", "text", 3)
      .orderBy($"doc_id", $"score".desc, $"term")
  }

  /** Vocabulary build ([[graft.operators.TextOps.buildVocab]]): tokens
    * with corpus frequency ≥ 20 get contiguous frequency-ranked ids —
    * the tokenizer-training export table.
    */
  val qVocab: GQuery = GQuery(
    "q_text_vocab",
    Some("""
      WITH tf AS (
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        HAVING COUNT(*) >= 20)
      SELECT token, freq,
             CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) - 1 AS BIGINT) AS vocab_id
      FROM tf
      ORDER BY vocab_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TextOps
      .buildVocab(t(spark, dir).documents, "text", minCount = 20)
      .orderBy($"vocab_id")
  }

  /** OOV-rate quality gate ([[graft.operators.TextOps.oovScore]] composed
    * with [[graft.operators.TextOps.buildVocab]]): per document, the
    * fraction of tokens outside the corpus vocabulary (minCount = 50) —
    * the rational, engine-exact proxy for an LM-perplexity filter.
    */
  val qOov: GQuery = GQuery(
    "q_text_oov",
    Some("""
      WITH vocab AS (
        SELECT token
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        HAVING COUNT(*) >= 50),
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             COUNT(*) FILTER (WHERE v.token IS NULL) AS n_oov,
             (CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) AS oov_rate
      FROM tok t LEFT JOIN vocab v ON t.token = v.token
      GROUP BY t.doc_id
      ORDER BY t.doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val vocab = graft.operators.TextOps.buildVocab(docs, "text", minCount = 50)
    graft.operators.TextOps
      .oovScore(docs, "doc_id", "text", vocab)
      .orderBy($"doc_id")
  }

  /** Deflate compression-ratio quality signal
    * ([[graft.functions.DeflateRatio]]): per document the compressed/raw
    * byte fraction (repetitive text compresses away; near-random text
    * doesn't). DuckDB has no deflate, so this is the bound-encoded oracle
    * pattern: the output carries the exact recomputable value (n_chars)
    * plus two REAL invariants of the ratio as booleans the oracle pins
    * TRUE — (a) the ratio lies in (0.02, 1.1] (deflate's stored-block
    * ceiling plus header overhead on tiny docs), and (b) deflating
    * text||text beats 0.5·ratio + 0.2: every doc is far inside the 32 KB
    * back-reference window, so the second copy must collapse to
    * near-nothing — a self-referential compression property no constant
    * output could fake. The hash match IS the codec contract; the raw
    * per-doc ratio stays covered by ExtensionSpec (determinism, ordering,
    * direct-JVM-Deflater agreement).
    */
  val qCompress: GQuery = GQuery(
    "q_text_compress",
    Some("""
      SELECT doc_id,
             length(text) AS n_chars,
             TRUE AS ratio_in_bounds,
             TRUE AS doubling_compresses
      FROM documents
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ratio = graft.functions.GraftFunctions.deflateRatio($"text")
    val doubled = graft.functions.GraftFunctions.deflateRatio(concat($"text", $"text"))
    t(spark, dir).documents
      .select(
        $"doc_id",
        length($"text").as("n_chars"),
        (ratio > 0.02 && ratio <= 1.1).as("ratio_in_bounds"),
        (doubled < ratio * 0.5 + 0.2).as("doubling_compresses"))
      .orderBy($"doc_id")
  }

  /** Character-class composition per document — lowercase/uppercase/digit/
    * space/other counts and the printable-ASCII ratio. The cheap script /
    * charset screen that runs before language ID in corpus pipelines
    * (non-Latin or binary-garbage docs route to different handling).
    * Counting is by class-removal (`length(regexp_replace(s, cls, ''))`),
    * the one regex idiom whose semantics are identical across RE2-style
    * engines; all row-parallel codegen'd expressions, no shuffle.
    */
  val qScript: GQuery = GQuery(
    "q_text_script",
    Some("""
      SELECT doc_id,
             length(text) AS n_chars2,
             length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS n_lower,
             length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
             length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_space,
             length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_other,
             CAST(length(text) - length(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE)
               / length(text) AS ascii_ratio
      FROM documents
      WHERE length(text) > 0
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    def removed(cls: String) =
      length($"text") - length(regexp_replace($"text", cls, ""))
    t(spark, dir).documents
      .filter(length($"text") > 0)
      .select(
        $"doc_id",
        length($"text").as("n_chars2"),
        removed("[a-z]").as("n_lower"),
        removed("[A-Z]").as("n_upper"),
        removed("[0-9]").as("n_digit"),
        removed(" ").as("n_space"),
        length(regexp_replace($"text", "[a-zA-Z0-9 ]", "")).as("n_other"),
        (removed("[ -~]").cast("double") / length($"text")).as("ascii_ratio")
      )
      .orderBy($"doc_id")
  }

  /** Unicode canonicalization ([[graft.functions.UnicodeNormalize]] /
    * [[graft.functions.StripAccents]] — Spark has no built-in; DuckDB's
    * `nfc_normalize`/`strip_accents` oracle both): every doc gets a
    * DECOMPOSED-form prefix (e + U+0301, u + U+0308) so NFC genuinely
    * recomposes, then the query reports the NFC prefix, the
    * accent-stripped prefix, whether NFC changed the string, and the
    * code-point savings — the corpus-hygiene step that keeps composed
    * and decomposed spellings of the same text from defeating exact-hash
    * dedup.
    */
  val qUnicode: GQuery = GQuery(
    "q_text_unicode",
    Some("""
      WITH s AS (SELECT doc_id,
                        'Cafe' || chr(769) || ' Zu' || chr(776) || 'rich ' || text AS t
                 FROM documents)
      SELECT doc_id,
             substr(nfc_normalize(t), 1, 24) AS nfc_prefix,
             substr(strip_accents(nfc_normalize(t)), 1, 24) AS stripped_prefix,
             nfc_normalize(t) != t AS changed_by_nfc,
             CAST(length(t) - length(nfc_normalize(t)) AS BIGINT) AS composed_savings
      FROM s ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.GraftFunctions.{stripAccents, unicodeNorm}
    // decomposed on purpose: e+U+0301, u+U+0308 — NFC must recompose
    val t0 = concat(lit("Cafe\u0301 Zu\u0308rich "), $"text")
    t(spark, dir).documents
      .select(
        $"doc_id",
        substring(unicodeNorm(t0, "NFC"), 1, 24).as("nfc_prefix"),
        substring(stripAccents(unicodeNorm(t0, "NFC")), 1, 24).as("stripped_prefix"),
        (unicodeNorm(t0, "NFC") =!= t0).as("changed_by_nfc"),
        (length(t0) - length(unicodeNorm(t0, "NFC"))).cast("long").as("composed_savings")
      )
      .orderBy($"doc_id")
  }

  /** Greedy subword tokenization ([[graft.functions.SubwordTokenize]])
    * with a corpus-trained piece vocabulary: the WordPiece/BPE inference
    * step of a tokenize-and-pack pipeline. Vocab = top-500 character
    * 2..6-grams of whitespace words by (count DESC, gram ASC) — built
    * distributed, collected bounded (KBs, like the IVF codebook), and
    * shipped to executors inside the expression. Output is every piece of
    * every document in order; the DuckDB oracle retrains the identical
    * vocab and replays greedy longest-prefix matching with a recursive
    * CTE (best match per step = MAX matching gram length, else 1 char),
    * so the hash match proves training, tie-breaking, and the greedy scan
    * end-to-end. At 100 TB the per-row cost is a linear scan with ≤5 hash
    * probes per character and the vocab build is one n-gram count —
    * nothing here is corpus-quadratic.
    */
  val qSubword: GQuery = GQuery(
    "q_text_subword",
    Some("""
      WITH RECURSIVE
      parts AS (SELECT doc_id, string_split_regex(text, '\s+') AS ps FROM documents),
      widx AS (SELECT doc_id, ps, unnest(range(1, array_length(ps) + 1)) AS word_idx FROM parts),
      words AS (SELECT doc_id, word_idx, ps[word_idx] AS word FROM widx
                WHERE length(ps[word_idx]) > 0),
      gpos AS (SELECT word, unnest(range(1, length(word) + 1)) AS p FROM words),
      grams AS (SELECT substr(word, p, n.n) AS gram
                FROM gpos, (SELECT unnest(range(2, 7)) AS n) n
                WHERE p + n.n - 1 <= length(word)),
      vocab AS (SELECT gram FROM (
                  SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram
                  ORDER BY cnt DESC, gram ASC LIMIT 500)),
      tok AS (
        SELECT doc_id, word_idx, word, 1 AS pos, 0 AS pidx, CAST(NULL AS VARCHAR) AS piece
        FROM words
        UNION ALL
        SELECT doc_id, word_idx, word, pos + best_n, pidx + 1, substr(word, pos, best_n)
        FROM (
          SELECT t.doc_id, t.word_idx, t.word, t.pos, t.pidx,
                 COALESCE((SELECT MAX(length(v.gram)) FROM vocab v
                           WHERE length(v.gram) <= length(t.word) - t.pos + 1
                             AND substr(t.word, t.pos, length(v.gram)) = v.gram), 1) AS best_n
          FROM tok t WHERE t.pos <= length(t.word)))
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY word_idx, pidx) - 1 AS INT)
               AS piece_idx,
             piece
      FROM tok WHERE piece IS NOT NULL
      ORDER BY doc_id, piece_idx""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val words = docs
      .select(explode(split($"text", "\\s+")).as("word"))
      .where(length($"word") > 0)
    val grams = words
      .select($"word", explode(sequence(lit(2), lit(6))).as("n"))
      .where(length($"word") >= $"n")
      .select(explode(expr("transform(sequence(1, length(word) - n + 1), p -> substring(word, p, n))")).as("gram"))
    val vocab = grams
      .groupBy($"gram").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"gram".asc)
      .limit(500)
      .collect().map(_.getString(0)).toSeq
    docs
      .select($"doc_id",
        posexplode(graft.functions.GraftFunctions.subword($"text", vocab, 6)))
      .toDF("doc_id", "piece_idx", "piece")
      .orderBy($"doc_id", $"piece_idx")
  }

  /** Bigram language-model likelihood score — the CCNet-style "does this
    * document look like the corpus" quality gate, in exact integer
    * arithmetic so the oracle is bit-identical. Train: bigram counts
    * c(w1,w2), prefix counts c(w1), vocab size V over whitespace word
    * sequences. Score: per bigram, add-one likelihood
    * p = (c(w1,w2)+1)/(c(w1)+V), kept EXACT by scaling to
    * floor(p * 10^12) with integer division (no doubles anywhere — a
    * real log-perplexity would hash-diverge on ln rounding); per doc,
    * the integer mean of scaled likelihoods. Low scores = improbable
    * word sequences = filtration candidates. Every stage is a linear
    * count or an equi-join back on the bigram key — train and score are
    * one pass each at 100 TB, and the LM itself stays distributed (no
    * driver collect; contrast the bounded-vocab subword tokenizer).
    * Overflow bound: the scaled numerator (c12+1)*10^12 wraps past
    * ~9.2M occurrences of ONE bigram — at corpora where a single bigram
    * exceeds that, drop the scale to 10^9 (DuckDB errors loudly on
    * overflow; Spark wraps, so the scale choice is the contract).
    */
  val qLmScore: GQuery = GQuery(
    "q_text_lm_score",
    Some("""
      WITH parts AS (SELECT doc_id, string_split_regex(text, '\s+') AS ps FROM documents),
      widx AS (SELECT doc_id, ps, unnest(range(1, array_length(ps) + 1)) AS i FROM parts),
      words AS (SELECT doc_id, i, ps[i] AS w FROM widx WHERE length(ps[i]) > 0),
      seq AS (SELECT doc_id, i, w, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
              FROM words),
      big AS (SELECT doc_id, w AS w1, w2 FROM seq WHERE w2 IS NOT NULL),
      bc AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2),
      pc AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
      v AS (SELECT COUNT(DISTINCT w) AS nv FROM words),
      scored AS (SELECT b.doc_id,
                        ((bc.c12 + 1) * 1000000000000) // (pc.c1 + v.nv) AS p12
                 FROM big b
                 JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
                 JOIN pc ON b.w1 = pc.w1
                 CROSS JOIN v)
      SELECT doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(p12) // COUNT(*) AS BIGINT) AS lm_score_e12
      FROM scored GROUP BY doc_id ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = t(spark, dir).documents
      .select($"doc_id", posexplode(split($"text", "\\s+")))
      .toDF("doc_id", "i", "w")
      .where(length($"w") > 0)
    val big = words
      .withColumn("w2", lead($"w", 1).over(Window.partitionBy($"doc_id").orderBy($"i")))
      .where($"w2".isNotNull)
      .select($"doc_id", $"w".as("w1"), $"w2")
    val bc = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val pc = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val nv = words.select(countDistinct($"w").as("nv"))
    big
      .join(bc, Seq("w1", "w2"))
      .join(pc, Seq("w1"))
      .crossJoin(nv)
      .withColumn("p12", expr("((c12 + 1) * 1000000000000L) div (c1 + nv)"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p12) div count(1)").cast("long").as("lm_score_e12"))
      .orderBy($"doc_id")
  }

  /** Domain (source) similarity matrix: pairwise shingle-set Jaccard
    * between sources — the corpus-composition diagnostic ("how much does
    * src A's content overlap src B's") that decides mixing weights and
    * flags mirror domains before near-dup removal even runs.
    *
    * Scale shape: ONE corpus-scale pass reduces text to distinct
    * (source, shingle) pairs; everything after is domain-cardinality math
    * — the inverted self-join fans out at most domains² per shingle, so
    * cost is bounded by |domains|², never |docs|². (With very many
    * domains, add the df-cap used by q_dedup_ngram_jaccard.) Pairs with
    * zero shared shingles are omitted (inner join = sparse matrix).
    * Jaccard is one IEEE division of exact integers — bit-equal
    * cross-engine.
    */
  val qDomainSim: GQuery = GQuery(
    "q_text_domain_sim",
    Some("""
      WITH t AS (SELECT source,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT DISTINCT source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3
             UNION
             SELECT DISTINCT source, array_to_string(ts, ' ') AS s FROM t WHERE len(ts) < 3),
      sz AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY 1),
      cm AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
             FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
             GROUP BY 1, 2)
      SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_common,
             CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
      FROM cm
      JOIN sz sa ON sa.source = cm.source_a
      JOIN sz sb ON sb.source = cm.source_b
      ORDER BY source_a, source_b""")
  ) { (spark, dir) =>
    import spark.implicits._
    val sh = t(spark, dir).documents
      .select($"source", graft.functions.GraftFunctions.shingles($"text", 3))
      .distinct()
      .ckptLazy()
    val sz = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val cm = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_common"))
    cm
      .join(sz.select($"source".as("source_a"), $"n".as("n_a")), "source_a")
      .join(sz.select($"source".as("source_b"), $"n".as("n_b")), "source_b")
      .select(
        $"source_a", $"source_b", $"n_a", $"n_b", $"n_common",
        ($"n_common".cast("double") / ($"n_a" + $"n_b" - $"n_common").cast("double"))
          .as("jaccard"))
      .orderBy($"source_a", $"source_b")
  }

  /** BM25 ranked retrieval ([[graft.operators.TextOps.bm25TopK]]): top-10
    * documents for a three-term query. The oracle replays tokenize → dl/
    * avgdl stats → query-term tf/df → per-term Okapi score → exact
    * DECIMAL(38,6) per-doc sum → top-k, with every floating-point
    * operation in the identical order (log-free idf; tf·k1 + tf instead
    * of tf·(k1+1) so no engine constant-folds differently), so the full
    * ranking is hash-exact.
    */
  val qBm25: GQuery = GQuery(
    "q_text_bm25",
    Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      dl AS (
        SELECT doc_id, CAST(len(toks) AS INT) AS dl,
               list_filter(toks, t -> t IN ('dup', 'spark', 'window')) AS hits
        FROM d),
      stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(hits) AS term FROM dl)
        GROUP BY 1, 2, 3),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id, tf.dl,
               ((CAST(s.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
               ((CAST(tf.tf AS DOUBLE) * 1.2 + CAST(tf.tf AS DOUBLE)) /
                (CAST(tf.tf AS DOUBLE) +
                 1.2 * (1.0 - 0.75 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl)))) AS score_t
        FROM tf JOIN df USING (term) CROSS JOIN stats s)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits, dl,
             CAST(SUM(CAST(score_t AS DECIMAL(38, 6))) AS DOUBLE) AS score
      FROM scored
      GROUP BY doc_id, dl
      ORDER BY score DESC, doc_id
      LIMIT 10""")
  ) { (spark, dir) =>
    graft.operators.TextOps.bm25TopK(
      t(spark, dir).documents, "doc_id", "text",
      queryTerms = Seq("dup", "spark", "window"), k = 10)
  }

  /** Hashed-feature linear classifier inference
    * ([[graft.operators.TextOps.hashedLinearScore]]): fastText-style
    * uni+bigram hashing-trick scoring with a broadcast weight table. The
    * oracle replays feature extraction, the md5 bucket/weight derivation,
    * and the exact integer margin — model inference end-to-end under the
    * hash-exact gate.
    */
  val qClassifier: GQuery = GQuery(
    "q_text_classifier",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      feats AS (
        SELECT doc_id,
               unnest(list_concat(t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END)) AS feat
        FROM toks),
      w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('w:' ||
                 CAST(CAST(('0x' || substr(md5(feat || ':11'), 1, 8))::UBIGINT % 4096 AS BIGINT)
                   AS VARCHAR) || ':11'), 1, 8))::UBIGINT % 2001 AS BIGINT) - 1000 AS w
        FROM feats)
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_features,
             CAST(SUM(w) AS BIGINT) AS margin,
             CAST(SUM(w) AS DOUBLE) / (1000.0 * CAST(COUNT(*) AS DOUBLE)) AS score,
             (SUM(w) > 0) AS keep
      FROM w
      GROUP BY doc_id
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    graft.operators.TextOps
      .hashedLinearScore(t(spark, dir).documents, "doc_id", "text", buckets = 4096, seed = 11)
      .orderBy(col("doc_id"))
  }

  /** Threshold-sweep calibration for the quality classifier — the step
    * between [[qClassifier]] (scoring) and deployment: a confusion table
    * (tp/fp/fn/tn, precision, recall) at nine thresholds spanning the
    * exact integer margin range, against a weak label (`lang = 'en'`).
    * This is how a corpus team actually picks the keep-cutoff: read the
    * sweep, choose the precision/recall trade. Thresholds are
    * lo + (k·(hi−lo)) div 10 in INTEGER arithmetic so the grid is
    * engine-exact; ratio columns are one IEEE division on exact counts
    * with the empty-cell NULL guard on both sides. Plan: the scoring
    * aggregate (linear), a 2-row bounds aggregate broadcast back, a
    * 9-row grid broadcast cross, one final 9-group aggregate — the sweep
    * costs one extra pass over the margins table regardless of corpus
    * size.
    */
  val qClassifierSweep: GQuery = GQuery(
    "q_text_classifier_sweep",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      feats AS (
        SELECT doc_id,
               unnest(list_concat(t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END)) AS feat
        FROM toks),
      w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('w:' ||
                 CAST(CAST(('0x' || substr(md5(feat || ':11'), 1, 8))::UBIGINT % 4096 AS BIGINT)
                   AS VARCHAR) || ':11'), 1, 8))::UBIGINT % 2001 AS BIGINT) - 1000 AS w
        FROM feats),
      m AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS margin FROM w GROUP BY doc_id),
      lab AS (SELECT m.doc_id, m.margin, (d.lang = 'en') AS label
              FROM m JOIN documents d ON d.doc_id = m.doc_id),
      b AS (SELECT MIN(margin) AS lo, MAX(margin) AS hi FROM lab),
      grid AS (SELECT CAST(k AS INT) AS k FROM range(1, 10) g(k)),
      agg AS (
        SELECT k, CAST(lo + (k * (hi - lo)) // 10 AS BIGINT) AS thr,
               COUNT(*) FILTER (WHERE label AND margin >= lo + (k * (hi - lo)) // 10) AS tp,
               COUNT(*) FILTER (WHERE NOT label AND margin >= lo + (k * (hi - lo)) // 10) AS fp,
               COUNT(*) FILTER (WHERE label AND margin < lo + (k * (hi - lo)) // 10) AS fn,
               COUNT(*) FILTER (WHERE NOT label AND margin < lo + (k * (hi - lo)) // 10) AS tn
        FROM lab CROSS JOIN b CROSS JOIN grid
        GROUP BY 1, 2)
      SELECT k, thr, tp, fp, fn, tn,
             CASE WHEN tp + fp = 0 THEN NULL
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
             CASE WHEN tp + fn = 0 THEN NULL
                  ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
      FROM agg
      ORDER BY k""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val m = graft.operators.TextOps
      .hashedLinearScore(docs, "doc_id", "text", buckets = 4096, seed = 11)
      .select($"doc_id", $"margin")
      .join(docs.select($"doc_id", ($"lang" === "en").as("label")), "doc_id")
    val bounds = m.agg(min($"margin").as("lo"), max($"margin").as("hi"))
    val grid = spark.range(1, 10).select($"id".cast("int").as("k"))
    m.crossJoin(broadcast(bounds))
      .crossJoin(broadcast(grid))
      .withColumn("thr", $"lo" + expr("(k * (hi - lo)) div 10"))
      .groupBy($"k", $"thr")
      .agg(
        count(when($"label" && $"margin" >= $"thr", 1)).as("tp"),
        count(when(!$"label" && $"margin" >= $"thr", 1)).as("fp"),
        count(when($"label" && $"margin" < $"thr", 1)).as("fn"),
        count(when(!$"label" && $"margin" < $"thr", 1)).as("tn"))
      .select(
        $"k", $"thr", $"tp", $"fp", $"fn", $"tn",
        when($"tp" + $"fp" === 0, lit(null))
          .otherwise($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision"),
        when($"tp" + $"fn" === 0, lit(null))
          .otherwise($"tp".cast("double") / ($"tp" + $"fn").cast("double")).as("recall"))
      .orderBy($"k")
  }

  /** Reliability diagram + expected calibration error for the quality
    * classifier — the audit AFTER [[qClassifierSweep]] picks a cutoff:
    * does the score MEAN what it claims? Scores map to a pseudo-
    * probability p = (margin/(1000·nf) + 1)/2, bucket into 10 fixed
    * bins, and each bin's mean confidence is compared to its observed
    * positive rate (label = `lang = 'en'`, as in the sweep);
    * ECE = Σ (n_b/N)·|conf_b − acc_b|.
    *
    * Scale shape: the scoring aggregate (linear), a 10-row bin
    * aggregate, a 1-row ECE aggregate broadcast back onto the bins.
    * Per-doc p rounds to 6 decimals before the DECIMAL(38,6) bin sums
    * (the qZipf convention — bin means must not depend on engine double
    * summation order); conf/acc/ece are each one IEEE division/product
    * chain on exact-integer-derived values, rounded to 6.
    */
  val qCalibration: GQuery = GQuery(
    "q_quality_calibration",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      feats AS (
        SELECT doc_id,
               unnest(list_concat(t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END)) AS feat
        FROM toks),
      w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('w:' ||
                 CAST(CAST(('0x' || substr(md5(feat || ':11'), 1, 8))::UBIGINT % 4096 AS BIGINT)
                   AS VARCHAR) || ':11'), 1, 8))::UBIGINT % 2001 AS BIGINT) - 1000 AS w
        FROM feats),
      m AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS margin,
                   CAST(COUNT(*) AS BIGINT) AS nf
            FROM w GROUP BY doc_id),
      p AS (
        SELECT m.doc_id,
               (CAST(margin AS DOUBLE) / (1000.0 * CAST(nf AS DOUBLE)) + 1.0) / 2.0 AS p,
               (d.lang = 'en') AS label
        FROM m JOIN documents d ON d.doc_id = m.doc_id),
      b AS (
        SELECT LEAST(CAST(floor(p * 10.0) AS BIGINT), 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE label) AS BIGINT) AS n_pos,
               CAST(SUM(CAST(round(p, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sum_conf
        FROM p GROUP BY 1),
      c AS (
        SELECT bin, n, n_pos,
               round(sum_conf / CAST(n AS BIGINT), 6) AS conf,
               round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc
        FROM b),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
      e AS (
        SELECT CAST(SUM(CAST(round((CAST(n AS DOUBLE) / CAST(tot.nn AS DOUBLE))
                                    * abs(conf - acc), 6) AS DECIMAL(38,6))) AS DOUBLE) AS ece
        FROM c CROSS JOIN tot)
      SELECT bin, n, n_pos, conf, acc, round(e.ece, 6) AS ece
      FROM c CROSS JOIN e
      ORDER BY bin""")
  ) { (spark, dir) =>
    import spark.implicits._
    val docs = t(spark, dir).documents
    val p = graft.operators.TextOps
      .hashedLinearScore(docs, "doc_id", "text", buckets = 4096, seed = 11)
      .select($"doc_id",
        (($"margin".cast("double") / (lit(1000.0) * $"n_features".cast("double"))
          + lit(1.0)) / lit(2.0)).as("p"))
      .join(docs.select($"doc_id", ($"lang" === "en").as("label")), "doc_id")
    val c = p
      .groupBy(least(floor($"p" * 10.0).cast("long"), lit(9L)).as("bin"))
      .agg(
        count(lit(1)).as("n"),
        count(when($"label", 1)).as("n_pos"),
        sum(round($"p", 6).cast(D)).cast("double").as("sum_conf"))
      .select($"bin", $"n", $"n_pos",
        round($"sum_conf" / $"n".cast("bigint"), 6).as("conf"),
        round($"n_pos".cast("double") / $"n".cast("double"), 6).as("acc"))
      .ckptLazy()
    val tot = c.agg(sum($"n").as("nn"))
    val e = c.crossJoin(broadcast(tot))
      .agg(sum(round(($"n".cast("double") / $"nn".cast("double"))
        * abs($"conf" - $"acc"), 6).cast(D)).cast("double").as("ece"))
    c.crossJoin(broadcast(e))
      .select($"bin", $"n", $"n_pos", $"conf", $"acc", round($"ece", 6).as("ece"))
      .orderBy($"bin")
  }

  /** Retrieval-quality eval ([[graft.operators.TextOps.retrievalEval]]):
    * MRR@10 and NDCG@10 of the single-term BM25 rankings against
    * tf-derived relevance labels, per query term — the ranker audit a
    * RAG/search team runs before trusting retrieval at corpus scale.
    * The oracle replays candidates → df/avgdl → the exact qBm25 IEEE
    * score chain → both rank windows → gain·discount DCG sums. DCG
    * discount literals are the SAME JVM doubles on both sides
    * (Double.toString round-trip, `e0`-suffixed so DuckDB parses DOUBLE
    * not DECIMAL) — the metric is hash-exact end to end.
    */
  val qRetrievalEval: GQuery = {
    val ws = graft.operators.TextOps.ndcgWeights(10)
    val wCase = ws.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN ${w}e0" }
      .mkString(" ")
    GQuery(
      "q_text_retrieval_eval",
      Some(s"""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      dl AS (
        SELECT doc_id, CAST(len(toks) AS INT) AS dl,
               list_filter(toks, t -> t IN ('dup', 'spark', 'window')) AS hits
        FROM d),
      stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl),
      tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, dl, unnest(hits) AS term FROM dl)
        GROUP BY 1, 2, 3),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ((CAST(s.n AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
               ((CAST(tf.tf AS DOUBLE) * 1.2 + CAST(tf.tf AS DOUBLE)) /
                (CAST(tf.tf AS DOUBLE) +
                 1.2 * (1.0 - 0.75 + 0.75 * (CAST(tf.dl AS DOUBLE) / s.avgdl)))) AS score,
               LEAST(tf.tf, 4) AS rel,
               (tf.tf >= 2) AS rel_bin
        FROM tf JOIN df USING (term) CROSS JOIN stats s),
      top AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
          FROM scored)
        WHERE rnk <= 10),
      dcga AS (
        SELECT term,
               CAST(SUM(CAST(round(
                 CAST(CASE rel WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 WHEN 3 THEN 7.0
                               ELSE 15.0 END AS DOUBLE)
                 * CAST(CASE rnk $wCase END AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE) AS dcg,
               MIN(CASE WHEN rel_bin THEN rnk END) AS first_rel_rank
        FROM top GROUP BY 1),
      itop AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irnk
          FROM scored)
        WHERE irnk <= 10),
      ideala AS (
        SELECT term,
               CAST(SUM(CAST(round(
                 CAST(CASE rel WHEN 1 THEN 1.0 WHEN 2 THEN 3.0 WHEN 3 THEN 7.0
                               ELSE 15.0 END AS DOUBLE)
                 * CAST(CASE irnk $wCase END AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE) AS idcg
        FROM itop GROUP BY 1),
      cand AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(COUNT(*) FILTER (WHERE tf >= 2) AS BIGINT) AS n_rel
        FROM tf GROUP BY 1)
      SELECT term, n_candidates, n_rel,
             CAST(COALESCE(first_rel_rank, -1) AS BIGINT) AS first_rel_rank,
             round(COALESCE(1.0 / first_rel_rank, CAST(0 AS DOUBLE)), 6) AS mrr,
             round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
             round(dcg / idcg, 6) AS ndcg
      FROM cand JOIN dcga USING (term) JOIN ideala USING (term)
      ORDER BY term""")
    ) { (spark, dir) =>
      graft.operators.TextOps.retrievalEval(
        t(spark, dir).documents, "doc_id", "text",
        queryTerms = Seq("dup", "spark", "window"), k = 10, relTf = 2)
    }
  }

  /** Boilerplate-template mining: the 20 most frequent 8-token document
    * PREFIXES with doc counts, corpus share, and an example doc — the
    * "what template is flooding this crawl" report (scraper banners,
    * license headers, SEO stubs open identically; prefix grouping finds
    * them without any pair enumeration).
    *
    * Scale shape: the prefix is a row-local slice+join; one keyed count
    * aggregate; top-20 as orderBy+limit (TakeOrdered — never a global
    * sort materialization). Linear end to end.
    */
  val qTemplateMining: GQuery = GQuery(
    "q_text_template_mining",
    Some("""
      WITH tk AS (
        SELECT doc_id,
               list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                           t -> length(t) > 0) AS ts
        FROM documents),
      p AS (SELECT doc_id, array_to_string(ts[1:8], ' ') AS prefix
            FROM tk WHERE len(ts) >= 8),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
      g AS (SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(MIN(doc_id) AS BIGINT) AS example_doc
            FROM p GROUP BY prefix),
      top AS (SELECT * FROM g ORDER BY n_docs DESC, prefix LIMIT 20)
      SELECT prefix, n_docs, example_doc,
             round(CAST(n_docs AS DOUBLE) / CAST(tot.n AS DOUBLE), 6) AS share
      FROM top CROSS JOIN tot
      ORDER BY n_docs DESC, prefix""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val p = t(spark, dir).documents
      .select($"doc_id", toks.as("ts"))
      .filter(size($"ts") >= 8)
      .select($"doc_id", array_join(slice($"ts", 1, 8), " ").as("prefix"))
      .ckptLazy()
    val tot = p.agg(count(lit(1)).as("n"))
    p.groupBy($"prefix")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("example_doc"))
      .orderBy($"n_docs".desc, $"prefix")
      .limit(20)
      .crossJoin(broadcast(tot))
      .select($"prefix", $"n_docs", $"example_doc",
        round($"n_docs".cast("double") / $"n".cast("double"), 6).as("share"))
      .orderBy($"n_docs".desc, $"prefix")
  }

  /** Length-bias audit of the quality classifier: Pearson correlation
    * between the exact integer margin and the document's character
    * count — the confound check run before shipping ANY learned quality
    * gate ("is the score just measuring length?"). Both variables are
    * exact BIGINTs, so every moment sum is order-insensitive
    * DECIMAL(38,0) integer arithmetic and r is ONE fixed IEEE chain —
    * no rounding convention needed anywhere upstream of the final
    * round. Complements [[graft.queries.ProfilingQueries.qSpearman]]
    * (rank agreement between signals) with the linear-association view.
    */
  val qLengthBias: GQuery = GQuery(
    "q_quality_length_bias",
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      feats AS (
        SELECT doc_id,
               unnest(list_concat(t,
                 CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)), i -> t[i] || '_' || t[i + 1])
                      ELSE CAST([] AS VARCHAR[]) END)) AS feat
        FROM toks),
      w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('w:' ||
                 CAST(CAST(('0x' || substr(md5(feat || ':11'), 1, 8))::UBIGINT % 4096 AS BIGINT)
                   AS VARCHAR) || ':11'), 1, 8))::UBIGINT % 2001 AS BIGINT) - 1000 AS w
        FROM feats),
      m AS (SELECT doc_id, CAST(SUM(w) AS BIGINT) AS x FROM w GROUP BY doc_id),
      j AS (SELECT m.x, CAST(d.n_chars AS BIGINT) AS y
            FROM m JOIN documents d ON d.doc_id = m.doc_id),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
            FROM j)
      SELECT n AS n_docs,
             round((CAST(n AS DOUBLE) * sxy - sx * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                          * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS pearson_r
      FROM s""")
  ) { (spark, dir) =>
    import spark.implicits._
    val D0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val docs = t(spark, dir).documents
    val j = graft.operators.TextOps
      .hashedLinearScore(docs, "doc_id", "text", buckets = 4096, seed = 11)
      .select($"doc_id", $"margin".as("x"))
      .join(docs.select($"doc_id", $"n_chars".cast("long").as("y")), "doc_id")
    val s = j.agg(
      count(lit(1)).as("n"),
      sum($"x".cast(D0)).cast("double").as("sx"),
      sum($"y".cast(D0)).cast("double").as("sy"),
      sum($"x".cast(D0) * $"x".cast(D0)).cast("double").as("sxx"),
      sum($"y".cast(D0) * $"y".cast(D0)).cast("double").as("syy"),
      sum($"x".cast(D0) * $"y".cast(D0)).cast("double").as("sxy"))
    val nd = $"n".cast("double")
    s.select(
      $"n".as("n_docs"),
      round((nd * $"sxy" - $"sx" * $"sy")
        / sqrt((nd * $"sxx" - $"sx" * $"sx") * (nd * $"syy" - $"sy" * $"sy")), 6)
        .as("pearson_r"))
  }

  /** Code-vs-prose routing signal: per-doc symbol-density and
    * keyword-hit screen — mixed crawls route code to a different
    * tokenizer/mixture than prose, and this row-local pass is the
    * router. Symbol counting is the q_text_script class-removal trick
    * (length minus length-after-removal — no explode); keyword hits are
    * fixed-list containment. All ratios are exact-integer/exact-integer.
    * Oracle n_chars uses DuckDB `length` (CHARACTER count, matching
    * Spark `length`) — strlen is byte length and would diverge on any
    * multibyte document at the 0.02 sym_ratio boundary; the class-
    * removal differences stay on strlen (removed chars are ASCII, so
    * the byte difference equals the char difference).
    */
  val qCodeDetection: GQuery = GQuery(
    "q_text_code_detection",
    Some("""
      WITH s AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(strlen(text) - strlen(regexp_replace(text, '[{}()\[\];=<>]', '', 'g'))
                    AS BIGINT) AS n_sym,
               CAST((CASE WHEN position('def ' IN text) > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN position('return ' IN text) > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN position('import ' IN text) > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN position('void ' IN text) > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN position('function ' IN text) > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS kw_hits
        FROM documents WHERE length(text) > 0)
      SELECT doc_id, n_chars, n_sym, kw_hits,
             round(CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS sym_ratio,
             (CAST(n_sym AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.02 OR kw_hits >= 2)
               AS is_code
      FROM s
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    def hit(kw: String) =
      when(instr($"text", kw) > 0, 1L).otherwise(0L)
    t(spark, dir).documents
      .filter(length($"text") > 0)
      .select(
        $"doc_id",
        length($"text").cast("long").as("n_chars"),
        (length($"text") - length(regexp_replace($"text", "[{}()\\[\\];=<>]", "")))
          .cast("long").as("n_sym"),
        (hit("def ") + hit("return ") + hit("import ") + hit("void ")
          + hit("function ")).as("kw_hits"))
      .select($"doc_id", $"n_chars", $"n_sym", $"kw_hits",
        round($"n_sym".cast("double") / $"n_chars".cast("double"), 6).as("sym_ratio"),
        ($"n_sym".cast("double") / $"n_chars".cast("double") > 0.02 || $"kw_hits" >= 2)
          .as("is_code"))
      .orderBy($"doc_id")
  }

  /** Flesch reading-ease scoring with the vowel-group syllable proxy —
    * the classic readability quality signal (low scores flag legalese
    * and gibberish, implausibly high ones flag word salad). Syllables
    * per doc = vowel-group count via the class-removal trick: replacing
    * each [aeiouy]+ run with ONE marker and subtracting the
    * fully-removed length counts the RUNS, not the vowels. Sentences
    * floor at 1. Entirely row-local; the formula is one fixed IEEE
    * chain on exact integers (constants parse identically — short
    * decimals).
    */
  val qReadability: GQuery = GQuery(
    "q_text_readability",
    Some("""
      WITH s AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                                    t -> length(t) > 0)) AS BIGINT) AS n_words,
               GREATEST(CAST(strlen(text) - strlen(regexp_replace(text, '[.!?]', '', 'g'))
                             AS BIGINT), 1) AS n_sentences,
               CAST(strlen(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
                    - strlen(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
                    AS BIGINT) AS n_syllables
        FROM documents),
      f AS (SELECT * FROM s WHERE n_words > 0)
      SELECT doc_id, n_words, n_sentences, n_syllables,
             round(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
                   6) AS flesch
      FROM f
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val lo = lower($"text")
    t(spark, dir).documents
      .select(
        $"doc_id",
        size(toks).cast("long").as("n_words"),
        greatest(
          (length($"text") - length(regexp_replace($"text", "[.!?]", ""))).cast("long"),
          lit(1L)).as("n_sentences"),
        (length(regexp_replace(lo, "[aeiouy]+", "#"))
          - length(regexp_replace(lo, "[aeiouy]+", ""))).cast("long").as("n_syllables"))
      .filter($"n_words" > 0)
      .select($"doc_id", $"n_words", $"n_sentences", $"n_syllables",
        round(lit(206.835)
          - lit(1.015) * ($"n_words".cast("double") / $"n_sentences".cast("double"))
          - lit(84.6) * ($"n_syllables".cast("double") / $"n_words".cast("double")), 6)
          .as("flesch"))
      .orderBy($"doc_id")
  }

  /** Inverted-index export ([[graft.operators.TextOps.invertedIndex]]):
    * per-term posting lists (doc-id-sorted parallel arrays) with the
    * stopword df-cap. The oracle rebuilds every posting list with
    * `list(... ORDER BY doc_id)`, so the hash match covers list contents
    * AND order. Posting lists ship as comma-joined STRINGS — the harness
    * comparator hashes scalar cells only; the joined doc-id-ordered list
    * is the identical contract.
    */
  val qInvertedIndex: GQuery = GQuery(
    "q_text_inverted_index",
    Some("""
      WITH tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY 1, 2),
      idx AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), ',') AS posting_docs,
               array_to_string(list(CAST(tf AS VARCHAR) ORDER BY doc_id), ',') AS posting_tfs
        FROM tf GROUP BY term)
      SELECT term, df, posting_docs, posting_tfs
      FROM idx
      WHERE df <= 390
      ORDER BY term""")
  ) { (spark, dir) =>
    graft.operators.TextOps
      .invertedIndex(t(spark, dir).documents, "doc_id", "text", maxDf = 390L)
      .select(
        col("term"), col("df"),
        array_join(col("posting_docs").cast("array<string>"), ",").as("posting_docs"),
        array_join(col("posting_tfs").cast("array<string>"), ",").as("posting_tfs"))
      .orderBy(col("term"))
  }

  /** Posting-list compression audit
    * ([[graft.functions.DeltaVarintEncode]]): every posting list of the
    * inverted index delta-encodes to LEB128 varints (the Lucene-shape
    * gap layout: sorted doc ids → small gaps → 1-2 bytes each instead
    * of 8) — the operator that decides whether the shipped index fits
    * its storage budget. Per term: raw vs packed bytes, and a
    * round-trip-equality flag the oracle pins TRUE (so decode ∘ encode
    * = id is proven engine-side). The packed SIZE is a pure integer
    * function of the gaps — 1 byte per started 7-bit group — which
    * DuckDB replays exactly from the same posting lists; the hash match
    * therefore covers the codec's framing, not just its invertibility.
    * The oracle's CASE chain covers the FULL non-negative long range
    * (thresholds through 2^56 = 9 LEB128 bytes; round-9 advice — gaps
    * of ascending non-negative ids are never negative, so the codec's
    * 10-byte case is unreachable here). Row-local after the index
    * aggregation; no extra shuffle.
    */
  val qIndexCompress: GQuery = GQuery(
    "q_text_index_compress",
    Some("""
      WITH tf AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY 1, 2),
      idx AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               list(doc_id ORDER BY doc_id) AS pd
        FROM tf GROUP BY term),
      g AS (
        SELECT term, df,
               list_transform(generate_series(1, len(pd)),
                              i -> pd[i] - COALESCE(pd[i - 1], 0)) AS gaps
        FROM idx WHERE df <= 390)
      SELECT term, df,
             CAST(df * 8 AS BIGINT) AS bytes_raw,
             CAST(list_sum(list_transform(gaps, x ->
                    1 + CASE WHEN x >= 128 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 16384 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 2097152 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 268435456 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 34359738368 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 4398046511104 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 562949953421312 THEN 1 ELSE 0 END
                      + CASE WHEN x >= 72057594037927936 THEN 1 ELSE 0 END))
                  AS BIGINT) AS bytes_packed,
             TRUE AS roundtrip_ok
      FROM g
      ORDER BY term""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TextOps
      .invertedIndex(t(spark, dir).documents, "doc_id", "text", maxDf = 390L)
      .select($"term", $"df",
        graft.functions.GraftFunctions.deltaVarintEnc($"posting_docs").as("enc"),
        $"posting_docs")
      .select($"term", $"df",
        ($"df" * 8).as("bytes_raw"),
        length($"enc").cast("long").as("bytes_packed"),
        (graft.functions.GraftFunctions.deltaVarintDec($"enc") === $"posting_docs")
          .as("roundtrip_ok"))
      .orderBy($"term")
  }

  /** Exact phrase search ([[graft.operators.TextOps.phraseSearch]]):
    * token-boundary consecutive-match positions for a two-token phrase,
    * overlapping occurrences counted. The oracle replays the positional
    * scan with `list_filter` over the same 1-based candidate range, so
    * the hash match covers hit membership, counts, AND every position.
    * Positions ship as a comma-joined STRING (scalar-cell comparator
    * contract, same order).
    */
  val qPhrase: GQuery = GQuery(
    "q_text_phrase",
    Some("""
      WITH hits AS (
        SELECT doc_id,
               list_filter(range(1, len(t)),
                           i -> t[i] = 'window' AND t[i + 1] = 'window') AS pos
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 2)
      SELECT doc_id,
             CAST(len(pos) AS INT) AS n_hits,
             CAST(pos[1] AS INT) AS first_pos,
             array_to_string(list_transform(pos, p -> CAST(p AS VARCHAR)), ',') AS positions
      FROM hits
      WHERE len(pos) >= 1
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    graft.operators.TextOps
      .phraseSearch(t(spark, dir).documents, "doc_id", "text", Seq("window", "window"))
      .withColumn("positions", array_join(col("positions").cast("array<string>"), ","))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style quality rule bundle (Rae et al. 2021 §A1.1 shape): the
    * named repetition-free heuristics a corpus team stacks BEFORE any
    * model-based filter — word-count bounds, mean word length, fraction
    * of words with an alphabetic character, and a minimum count of
    * distinct core-vocabulary words (the stopword rule's intent — common
    * glue words must appear; list and bounds adapted to this synthetic
    * corpus, which has no English function words). One shared scan computes every per-doc signal; the
    * output is the per-rule violation table (plus the conjunctive `keep`
    * row) the gate decision reads. All signals are integer counts or one
    * IEEE division, so the oracle replays them bit-exactly.
    */
  val qGopherRules: GQuery = GQuery(
    "q_text_gopher_rules",
    Some("""
      WITH nrm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
                   FROM documents),
      tk AS (SELECT doc_id, nt, string_split(nt, ' ') AS toks,
                    len(string_split(nt, ' ')) AS n_words
             FROM nrm),
      s AS (SELECT doc_id, n_words,
                   CAST(length(nt) - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS mwl,
                   CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                     / CAST(n_words AS DOUBLE) AS alpha_frac,
                   len(list_filter(['join','hash','row','batch','scan','filter','merge','data'],
                                   w -> list_contains(toks, w))) AS stop_hits
            FROM tk),
      r AS (SELECT (n_words >= 20 AND n_words <= 100000) AS r_wc,
                   (mwl >= 3.0 AND mwl <= 10.0) AS r_mwl,
                   (alpha_frac >= 0.8) AS r_alpha,
                   (stop_hits >= 2) AS r_stop
            FROM s),
      a AS (SELECT COUNT(*) AS total,
                   SUM(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS v_wc,
                   SUM(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS v_mwl,
                   SUM(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS v_alpha,
                   SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS v_stop,
                   SUM(CASE WHEN NOT (r_wc AND r_mwl AND r_alpha AND r_stop)
                            THEN 1 ELSE 0 END) AS v_keep
            FROM r)
      SELECT rule, CAST(violations AS BIGINT) AS violations,
             CAST(total AS BIGINT) AS total,
             CAST(total - violations AS DOUBLE) / CAST(total AS DOUBLE) AS pass_frac
      FROM (SELECT 'alpha_words' AS rule, v_alpha AS violations, total FROM a
            UNION ALL SELECT 'keep', v_keep, total FROM a
            UNION ALL SELECT 'mean_word_len', v_mwl, total FROM a
            UNION ALL SELECT 'stopwords', v_stop, total FROM a
            UNION ALL SELECT 'word_count', v_wc, total FROM a)
      ORDER BY rule""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.TextOps
    val toks = TextOps.tokens($"text")
    val nt = TextOps.normText($"text")
    val nWords = size(toks)
    val mwl = (length(nt) - (nWords - 1)).cast("double") / nWords.cast("double")
    val alphaFrac =
      size(filter(toks, x => x.rlike("[a-z]"))).cast("double") / nWords.cast("double")
    val stopWords = Seq("join", "hash", "row", "batch", "scan", "filter", "merge", "data")
    val stopHits = size(filter(array(stopWords.map(lit): _*), w => array_contains(toks, w)))
    val rules = t(spark, dir).documents.select(
      (nWords >= 20 && nWords <= 100000).as("r_wc"),
      (mwl >= 3.0 && mwl <= 10.0).as("r_mwl"),
      (alphaFrac >= 0.8).as("r_alpha"),
      (stopHits >= 2).as("r_stop"))
    rules
      .agg(
        count(lit(1)).as("total"),
        sum(when(!$"r_wc", 1L).otherwise(0L)).as("v_wc"),
        sum(when(!$"r_mwl", 1L).otherwise(0L)).as("v_mwl"),
        sum(when(!$"r_alpha", 1L).otherwise(0L)).as("v_alpha"),
        sum(when(!$"r_stop", 1L).otherwise(0L)).as("v_stop"),
        sum(when(!($"r_wc" && $"r_mwl" && $"r_alpha" && $"r_stop"), 1L).otherwise(0L))
          .as("v_keep"))
      .select(
        expr("stack(5, 'alpha_words', v_alpha, 'keep', v_keep, 'mean_word_len', v_mwl, " +
          "'stopwords', v_stop, 'word_count', v_wc) AS (rule, violations)"),
        $"total")
      .withColumn("pass_frac",
        ($"total" - $"violations").cast("double") / $"total".cast("double"))
      .orderBy($"rule")
  }

  /** BPE merge training ([[graft.operators.TextOps.bpeTrain]], 6 rounds
    * over the top-200 word-frequency table): the tokenizer-training op.
    * The oracle replays every round — lead-window pair counts, fully
    * tie-broken argmax, and the left-to-right non-overlapping merge
    * application via the same run-grouping windows — so the hash match
    * proves each learned merge AND its count. Round CTEs are generated
    * programmatically (one formulation, six instantiations).
    */
  private val bpeRounds = 6

  /** Shared oracle prelude for the BPE queries: top-200 vocab, character
    * split, and `bpeRounds` merge rounds — each round's CTEs replay the
    * lead-window pair counts, fully tie-broken argmax, and the
    * left-to-right non-overlapping merge application via the same
    * run-grouping windows as the engine. Ends with `syms$bpeRounds`.
    */
  private val bpeOracleWith: String = {
    // every CTE is MATERIALIZED: each round references its predecessor
    // several times, and DuckDB's default CTE inlining would re-expand the
    // whole chain per reference — exponential in rounds (observed: the
    // un-hinted 6-round chain never finishes even at sf0.001)
    val roundCtes = (1 to bpeRounds).map { i =>
      s"""
      wn$i AS MATERIALIZED (SELECT word, freq, pos, sym,
                      lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
               FROM syms${i - 1}),
      pc$i AS MATERIALIZED (SELECT sym AS lhs, nxt AS rhs, CAST(SUM(freq) AS BIGINT) AS cnt
               FROM wn$i WHERE nxt IS NOT NULL GROUP BY sym, nxt),
      best$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM pc$i ORDER BY cnt DESC, lhs, rhs LIMIT 1),
      cand$i AS MATERIALIZED (SELECT w.word, w.pos,
                        ROW_NUMBER() OVER (PARTITION BY w.word ORDER BY w.pos) AS rn
                 FROM wn$i w, best$i b WHERE w.sym = b.lhs AND w.nxt = b.rhs),
      app$i AS MATERIALIZED (SELECT word, pos FROM (
                  SELECT word, pos,
                         ROW_NUMBER() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS k
                  FROM cand$i)
                WHERE (k - 1) % 2 = 0),
      syms$i AS MATERIALIZED (SELECT s.word, s.freq,
                        ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY s.pos) - 1 AS pos,
                        CASE WHEN a.pos IS NOT NULL THEN b.lhs || b.rhs ELSE s.sym END AS sym
                 FROM syms${i - 1} s
                 CROSS JOIN best$i b
                 LEFT JOIN app$i a ON s.word = a.word AND s.pos = a.pos
                 LEFT JOIN app$i c ON s.word = c.word AND s.pos = c.pos + 1
                 WHERE c.pos IS NULL)"""
    }.mkString(",")
    s"""
      WITH vocab AS MATERIALIZED (
        SELECT w AS word, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
              FROM documents)
        WHERE length(w) > 0
        GROUP BY w
        ORDER BY freq DESC, word
        LIMIT 200),
      widx AS MATERIALIZED (SELECT word, freq, unnest(range(1, length(word) + 1)) AS i FROM vocab),
      syms0 AS MATERIALIZED (SELECT word, freq, i - 1 AS pos, substr(word, i, 1) AS sym FROM widx),$roundCtes"""
  }

  /** The engine-side top-200 word-frequency table both BPE queries train on. */
  private def bpeVocab(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir).documents
      .select(explode(graft.operators.TextOps.tokens($"text")).as("word"))
      .where(length($"word") > 0)
      .groupBy($"word")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"word")
      .limit(200)
  }

  /** BPE merge training ([[graft.operators.TextOps.bpeTrain]], 6 rounds
    * over the top-200 word-frequency table): the tokenizer-training op.
    * The oracle replays every round — lead-window pair counts, fully
    * tie-broken argmax, and the left-to-right non-overlapping merge
    * application via the same run-grouping windows — so the hash match
    * proves each learned merge AND its count. Round CTEs are generated
    * programmatically (one formulation, six instantiations).
    */
  val qBpeTrain: GQuery = {
    val finalSelect = (1 to bpeRounds).map { i =>
      s"SELECT CAST($i AS BIGINT) AS merge_round, lhs, rhs, cnt AS pair_count FROM best$i"
    }.mkString("\n      UNION ALL ")
    GQuery(
      "q_text_bpe_train",
      Some(s"""$bpeOracleWith
      $finalSelect
      ORDER BY merge_round""")
    ) { (spark, dir) =>
      import spark.implicits._
      graft.operators.TextOps
        .bpeTrain(bpeVocab(spark, dir), "word", "freq", rounds = bpeRounds)
        .orderBy($"merge_round")
    }
  }

  /** BPE application ([[graft.operators.TextOps.bpeSegment]]): the
    * segmentation the 6 learned merges induce on the training vocabulary —
    * one row per word with its piece count and space-joined pieces,
    * emitted straight from the trainer's final symbol state so train and
    * apply cannot drift. The oracle aggregates the same replayed
    * `syms$bpeRounds` table, so the hash match proves the full segmented
    * form of every word, not just merge identities.
    */
  val qBpeApply: GQuery = GQuery(
    "q_text_bpe_apply",
    Some(s"""$bpeOracleWith
      SELECT word, CAST(MAX(freq) AS BIGINT) AS freq,
             CAST(COUNT(*) AS BIGINT) AS n_pieces,
             string_agg(sym, ' ' ORDER BY pos) AS segmented
      FROM syms$bpeRounds
      GROUP BY word
      ORDER BY word""")
  ) { (spark, dir) =>
    import spark.implicits._
    graft.operators.TextOps
      .bpeSegment(bpeVocab(spark, dir), "word", "freq", rounds = bpeRounds)
      .select($"word", $"freq", $"n_pieces", $"segmented")
      .orderBy($"word")
  }

  /** Tokenizer fertility audit: pieces-per-word by language under the
    * trained BPE — THE tokenizer-fairness number (a language whose words
    * fragment into 2× the pieces pays 2× the context budget; Ács/
    * Rust'21-style fertility comparisons decide whether a vocabulary is
    * usable across a corpus's languages before anything trains on it).
    * Corpus word occurrences pre-aggregate to (lang, word, cnt), the
    * 200-word trained segmentation table broadcast-joins on, and words
    * OUTSIDE the trained vocabulary take the character fall-back
    * (n_pieces = word length) exactly as a byte/char-fallback tokenizer
    * would. The oracle re-derives the segmentation from the same
    * replayed `syms` chain (MATERIALIZED CTEs — the DuckDB inlining trap,
    * CLAUDE.md), so train → segment → per-language weighting is
    * hash-checked end to end.
    */
  val qBpeFertility: GQuery = GQuery(
    "q_text_bpe_fertility",
    Some(s"""$bpeOracleWith,
      seg AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_pieces
        FROM syms$bpeRounds GROUP BY word),
      occ AS (
        SELECT lang, w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT lang, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
              FROM documents)
        WHERE length(w) > 0
        GROUP BY lang, w)
      SELECT lang,
             CAST(SUM(cnt) AS BIGINT) AS n_words,
             CAST(SUM(CASE WHEN s.n_pieces IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_invocab,
             CAST(SUM(cnt * COALESCE(s.n_pieces, CAST(length(o.word) AS BIGINT))) AS BIGINT) AS n_pieces,
             round(CAST(SUM(cnt * COALESCE(s.n_pieces, CAST(length(o.word) AS BIGINT))) AS DOUBLE)
                   / CAST(SUM(cnt) AS DOUBLE), 6) AS fertility
      FROM occ o LEFT JOIN seg s USING (word)
      GROUP BY lang
      ORDER BY lang""")
  ) { (spark, dir) =>
    import spark.implicits._
    val seg = graft.operators.TextOps
      .bpeSegment(bpeVocab(spark, dir), "word", "freq", rounds = bpeRounds)
      .select($"word", $"n_pieces")
    val occ = t(spark, dir).documents
      .select($"lang", explode(graft.operators.TextOps.tokens($"text")).as("word"))
      .where(length($"word") > 0)
      .groupBy($"lang", $"word")
      .agg(count(lit(1)).as("cnt"))
    val pieces = coalesce($"n_pieces", length($"word").cast("long"))
    occ.join(broadcast(seg), Seq("word"), "left")
      .groupBy($"lang")
      .agg(
        sum($"cnt").as("n_words"),
        sum(when($"n_pieces".isNotNull, $"cnt").otherwise(0L)).as("n_invocab"),
        sum($"cnt" * pieces).as("n_pieces"),
        round(sum($"cnt" * pieces).cast("double") / sum($"cnt").cast("double"), 6)
          .as("fertility"))
      .orderBy($"lang")
  }

  /** PMI collocation mining: the top-50 adjacent bigrams by pointwise
    * mutual information ln(p(ab) / (p(a)·p(b))) with support ≥ 5 — the
    * classic collocation/keyphrase detector (Church & Hanks 1990) and the
    * statistic behind phrase-aware tokenizer vocabularies. Exact integer
    * counts from one corpus pass each for unigrams and bigrams; the PMI
    * chain is fixed IEEE arithmetic on those counts; ranking ties break
    * on the bigram string, so the oracle replays counts, scores, and the
    * final ranking verbatim. Scale: two token-exploded aggregations and
    * one broadcast-joined scoring pass over the (bounded) bigram table;
    * the top-k is a global sort of scored BIGRAMS, not the corpus.
    */
  val qPmi: GQuery = GQuery(
    "q_text_pmi",
    Some("""
      WITH tk AS (
        SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
        FROM documents),
      uni AS (
        SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS cu
        FROM (SELECT unnest(ts) AS t FROM tk) WHERE length(t) > 0 GROUP BY t),
      bi AS (
        SELECT a || ' ' || b AS bigram, a, b, CAST(COUNT(*) AS BIGINT) AS cb
        FROM (SELECT ts[i] AS a, ts[i+1] AS b
              FROM tk, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i) g)
        WHERE length(a) > 0 AND length(b) > 0
        GROUP BY 1, 2, 3),
      tot AS (
        SELECT CAST((SELECT SUM(cu) FROM uni) AS BIGINT) AS tu,
               CAST((SELECT SUM(cb) FROM bi) AS BIGINT) AS tb),
      scored AS (
        SELECT bi.bigram, bi.cb, ua.cu AS c_a, ub.cu AS c_b,
               round(ln((CAST(bi.cb AS DOUBLE) / CAST(tot.tb AS DOUBLE))
                        / ((CAST(ua.cu AS DOUBLE) / CAST(tot.tu AS DOUBLE))
                           * (CAST(ub.cu AS DOUBLE) / CAST(tot.tu AS DOUBLE)))), 6) AS pmi
        FROM bi JOIN uni ua ON ua.tok = bi.a
                JOIN uni ub ON ub.tok = bi.b, tot
        WHERE bi.cb >= 5)
      SELECT bigram, cb, c_a, c_b, pmi,
             CAST(rk AS BIGINT) AS rank
      FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS rk FROM scored)
      WHERE rk <= 50
      ORDER BY rank""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = filter(graft.operators.TextOps.tokens($"text"), x => length(x) > 0)
    val docs = t(spark, dir).documents.select(toks.as("ts")).ckptLazy()
    val uni = docs.select(explode($"ts").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cu"))
    val bi = docs
      .select(explode(when(size($"ts") >= 2,
        transform(sequence(lit(1), size($"ts") - 1),
          i => struct(element_at($"ts", i).as("a"), element_at($"ts", i + 1).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("cb"))
    val tot = uni.agg(sum($"cu").as("tu")).crossJoin(bi.agg(sum($"cb").as("tb")))
    val scored = bi.filter($"cb" >= 5)
      .join(uni.select($"tok".as("a"), $"cu".as("c_a")), "a")
      .join(uni.select($"tok".as("b"), $"cu".as("c_b")), "b")
      .crossJoin(broadcast(tot))
      .select(
        concat($"a", lit(" "), $"b").as("bigram"), $"cb", $"c_a", $"c_b",
        round(log(($"cb".cast("double") / $"tb".cast("double"))
          / (($"c_a".cast("double") / $"tu".cast("double"))
            * ($"c_b".cast("double") / $"tu".cast("double")))), 6).as("pmi"))
    // Top-50 via orderBy().limit() — plans a distributed
    // TakeOrderedAndProject (per-partition top-50 + driver merge), not a
    // global row_number window over every bigram. Rank assignment over
    // the 50 survivors goes through the distributed total-order indexer
    // (no WindowExec at all — zero single-partition windows in this plan).
    val top = scored.orderBy($"pmi".desc, $"bigram").limit(50)
    graft.operators.Sampling
      .globalIndexBy(top, Seq($"pmi".desc, $"bigram"))
      .withColumn("rank", $"global_idx".cast("long"))
      .drop("global_idx")
      .orderBy($"rank")
  }

  /** Per-document token-distribution entropy (base-2 Shannon over the
    * doc's own unigram counts) — the quality signal that separates
    * natural prose from keyword-stuffed or template spam at a glance
    * (low H = few tokens dominate; H near log2(n_distinct) = flat).
    * Plan: explode → (doc, token) count → per-doc Σ −p·log2 p — two
    * linear shuffles keyed on doc_id, no per-row O(d²) HOF scans. The
    * entropy sums per doc in DECIMAL(38,6) from 6-dp-rounded terms
    * (cross-engine double sums are order-dependent; rounded-term
    * decimal sums are not — the qZipf/DSIR ln-rounding convention).
    */
  val qTokenEntropy: GQuery = GQuery(
    "q_text_token_entropy",
    Some("""
      WITH tc AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term),
      n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS nd FROM tc GROUP BY doc_id)
      SELECT tc.doc_id, n.nt AS n_tokens, n.nd AS n_distinct,
             CAST(SUM(CAST(round(
               -(CAST(tc.c AS DOUBLE) / CAST(n.nt AS DOUBLE))
                 * log2(CAST(tc.c AS DOUBLE) / CAST(n.nt AS DOUBLE)), 6)
               AS DECIMAL(38,6))) AS DOUBLE) AS entropy
      FROM tc JOIN n USING (doc_id)
      GROUP BY tc.doc_id, n.nt, n.nd
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val tc = t(spark, dir).documents
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .ckptLazy() // feeds the per-doc totals AND the entropy sum
    val n = tc.groupBy($"doc_id")
      .agg(sum($"c").as("nt"), count(lit(1)).as("nd"))
    tc.join(n, "doc_id")
      .groupBy($"doc_id", $"nt", $"nd")
      .agg(sum(
        round(-($"c".cast("double") / $"nt".cast("double"))
          * log(2.0, $"c".cast("double") / $"nt".cast("double")), 6)
          .cast(DecimalType(38, 6))).cast("double").as("entropy"))
      .select($"doc_id", $"nt".as("n_tokens"), $"nd".as("n_distinct"), $"entropy")
      .orderBy($"doc_id")
  }

  /** Marginal n-gram novelty per document (the corpus-ordering audit a
    * dedup-aware ingest keeps: how much of each doc's distinct trigram
    * mass first appears IN that doc, under the deterministic doc_id
    * order — late crawls of boilerplate score near 0, fresh content near
    * 1; the curve decides where continued crawling stops paying).
    * Plan is the linear df-join-back shape (q_dedup_shared_shingles'
    * discipline): explode DISTINCT word trigrams per doc, one groupBy
    * for the global first-occurrence table (min doc_id per trigram — a
    * partial-agg shuffle, never a pair join), join back, per-doc ratio.
    * Single-level HOF only (transform over an attribute — never nested
    * lambdas over the tokenize chain, the round-1 re-evaluation bug).
    */
  val qNgramNovelty: GQuery = GQuery(
    "q_text_ngram_novelty",
    Some("""
      WITH tk AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(t) - 2),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
          FROM tk)),
      f AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g)
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             round(CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
      FROM sh JOIN f USING (g)
      GROUP BY sh.doc_id
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val toks = t(spark, dir).documents
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    val sh = toks.select($"doc_id", explode(array_distinct(
      transform(sequence(lit(1), size($"t") - 2),
        i => concat_ws(" ",
          element_at($"t", i), element_at($"t", i + 1), element_at($"t", i + 2))))).as("g"))
      .ckptLazy() // feeds the first-occurrence pass AND the join-back
    val first = sh.groupBy($"g").agg(min($"doc_id").as("first_doc"))
    sh.join(first, "g")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      .select($"doc_id", $"n_shingles", $"n_novel",
        round($"n_novel".cast("double") / $"n_shingles".cast("double"), 6).as("novelty"))
      .orderBy($"doc_id")
  }

  /** Per-class precision / recall / F1 of the q_text_langid heuristic
    * against the labeled `lang` column — the multiclass-eval operator
    * every classifier in the quality stack needs (calibration measures
    * probability honesty, length-bias measures confounding; this is the
    * plain confusion-matrix scorecard). The class spine is the union of
    * truth and prediction labels, so never-predicted classes (zh has no
    * marker list) and never-true classes (unknown) both get honest
    * zero-precision/recall rows instead of vanishing.
    *
    * Scale shape: predictions are row-local marker counts; everything
    * downstream runs on the ≤ |classes|² confusion-cell aggregate. All
    * metrics are exact integer ratios (F1 = 2tp/(2tp+fp+fn) — a SINGLE
    * division, not the P·R composition, so no intermediate float feeds
    * a float).
    */
  val qPrf1: GQuery = GQuery(
    "q_quality_prf1",
    Some("""
      WITH s AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','is','with'], t))) AS en_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['der','die','das','und','ist'], t))) AS de_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['le','la','et','est','avec'], t))) AS fr_score,
               len(list_filter(string_split(text,' '), t -> list_contains(['el','los','y','es','con'], t))) AS es_score
        FROM documents),
      p AS (SELECT lang AS truth,
                   CASE WHEN en_score = 0 AND de_score = 0 AND fr_score = 0 AND es_score = 0 THEN 'unknown'
                        WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
                        WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
                        WHEN es_score >= fr_score THEN 'es'
                        ELSE 'fr' END AS pred
            FROM s),
      cells AS (SELECT truth, pred, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
      cls AS (SELECT DISTINCT truth AS c FROM cells UNION SELECT DISTINCT pred FROM cells),
      m AS (SELECT cls.c,
                   CAST(COALESCE(SUM(CASE WHEN cells.truth = cls.c AND cells.pred = cls.c THEN cells.n END), 0) AS BIGINT) AS tp,
                   CAST(COALESCE(SUM(CASE WHEN cells.pred = cls.c AND cells.truth <> cls.c THEN cells.n END), 0) AS BIGINT) AS fp,
                   CAST(COALESCE(SUM(CASE WHEN cells.truth = cls.c AND cells.pred <> cls.c THEN cells.n END), 0) AS BIGINT) AS fn
            FROM cls LEFT JOIN cells ON TRUE
            GROUP BY 1)
      SELECT c AS class, tp, fp, fn, tp + fn AS support,
             CASE WHEN tp + fp = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
             CASE WHEN tp + fn = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
             CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
      FROM m ORDER BY class""")
  ) { (spark, dir) =>
    import spark.implicits._
    import graft.operators.TextOps.markerHits
    val toks = split($"text", " ")
    val s = t(spark, dir).documents.select(
      $"lang",
      markerHits(toks, Seq("the", "a", "and", "is", "with")).as("en_score"),
      markerHits(toks, Seq("der", "die", "das", "und", "ist")).as("de_score"),
      markerHits(toks, Seq("le", "la", "et", "est", "avec")).as("fr_score"),
      markerHits(toks, Seq("el", "los", "y", "es", "con")).as("es_score"))
    val p = s.select($"lang".as("truth"),
      when($"en_score" === 0 && $"de_score" === 0 && $"fr_score" === 0 && $"es_score" === 0, "unknown")
        .when($"en_score" >= $"de_score" && $"en_score" >= $"fr_score" && $"en_score" >= $"es_score", "en")
        .when($"de_score" >= $"fr_score" && $"de_score" >= $"es_score", "de")
        .when($"es_score" >= $"fr_score", "es")
        .otherwise("fr").as("pred"))
    val cells = p.groupBy($"truth", $"pred").agg(count(lit(1)).as("n")).ckptLazy()
    val cls = cells.select($"truth".as("c")).union(cells.select($"pred")).distinct()
    val m = cls.crossJoin(broadcast(cells))
      .groupBy($"c")
      .agg(
        coalesce(sum(when($"truth" === $"c" && $"pred" === $"c", $"n")), lit(0L)).as("tp"),
        coalesce(sum(when($"pred" === $"c" && $"truth" =!= $"c", $"n")), lit(0L)).as("fp"),
        coalesce(sum(when($"truth" === $"c" && $"pred" =!= $"c", $"n")), lit(0L)).as("fn"))
    m.select($"c".as("class"), $"tp", $"fp", $"fn", ($"tp" + $"fn").as("support"),
      when($"tp" + $"fp" === 0, 0.0)
        .otherwise($"tp".cast("double") / ($"tp" + $"fp").cast("double")).as("precision"),
      when($"tp" + $"fn" === 0, 0.0)
        .otherwise($"tp".cast("double") / ($"tp" + $"fn").cast("double")).as("recall"),
      when(lit(2) * $"tp" + $"fp" + $"fn" === 0, 0.0)
        .otherwise((lit(2) * $"tp").cast("double") / (lit(2) * $"tp" + $"fp" + $"fn").cast("double"))
        .as("f1"))
      .orderBy($"class")
  }

  /** Luhn-validated card-number detection — the CHECKSUM tier of PII
    * scrubbing above [[qRedact]]'s regex tier: a 16-digit run is only
    * treated as a payment card if its Luhn check digit verifies, which
    * cuts the false-positive rate on order ids / phone numbers by 10×.
    * The query plants a DETERMINISTIC fixture (the augmentation-query
    * discipline) and digit-strips the text prefix it embeds into, so the
    * planted run is the only ≥13-digit candidate regardless of corpus
    * content (a corpus 13-15 digit run would otherwise win the extraction
    * and engine behavior on substr-past-end diverges): 15 payload digits from
    * translate(md5(doc_id), 'abcdef', '012345'), plus a check digit that
    * is CORRECT iff doc_id % 3 = 0 and off-by-one otherwise — planted
    * valids must verify, planted corruptions must fail, and the oracle
    * replays the construction, the \d{13,19} extraction, and the mod-10
    * sum per document.
    *
    * Entirely row-local (zero shuffle). The Luhn sums run as ONE
    * `aggregate` over a POST-PROJECTION attribute (never a lambda
    * capturing the md5 tree — the CLAUDE.md HOF-recapture trap): digit at
    * position j of a 16-char candidate is doubled iff j is odd (odd
    * left-positions are even positions from the right when length = 16).
    */
  val qLuhn: GQuery = GQuery(
    "q_text_pii_luhn",
    Some("""
      WITH b AS (
        SELECT doc_id,
               substr(translate(md5('card:' || CAST(doc_id AS VARCHAR)),
                                'abcdef', '012345'), 1, 15) AS b15
        FROM documents),
      s AS (
        SELECT doc_id, b15,
               CAST(list_sum(list_transform(generate_series(1, 15), i ->
                 CASE WHEN (i % 2) = 1 THEN
                   CASE WHEN 2 * CAST(substr(b15, i, 1) AS INT) > 9
                        THEN 2 * CAST(substr(b15, i, 1) AS INT) - 9
                        ELSE 2 * CAST(substr(b15, i, 1) AS INT) END
                 ELSE CAST(substr(b15, i, 1) AS INT) END)) AS BIGINT) AS psum
        FROM b),
      c AS (
        SELECT doc_id,
               b15 || CAST(CASE WHEN doc_id % 3 = 0
                                THEN (10 - psum % 10) % 10
                                ELSE ((10 - psum % 10) % 10 + 1) % 10
                           END AS VARCHAR) AS planted
        FROM s),
      x AS (
        SELECT c.doc_id, c.planted,
               regexp_extract(regexp_replace(substr(d.text, 1, 40), '[0-9]', '', 'g')
                                || ' ' || c.planted || ' x',
                              '[0-9]{13,19}') AS extracted
        FROM c JOIN documents d ON c.doc_id = d.doc_id),
      v AS (
        SELECT doc_id, planted, extracted,
               CAST(list_sum(list_transform(generate_series(1, 16), j ->
                 CASE WHEN (j % 2) = 1 THEN
                   CASE WHEN 2 * CAST(substr(extracted, j, 1) AS INT) > 9
                        THEN 2 * CAST(substr(extracted, j, 1) AS INT) - 9
                        ELSE 2 * CAST(substr(extracted, j, 1) AS INT) END
                 ELSE CAST(substr(extracted, j, 1) AS INT) END)) AS BIGINT) AS luhn_sum
        FROM x)
      SELECT doc_id, planted, extracted, luhn_sum,
             (luhn_sum % 10 = 0) AS is_valid_card,
             (doc_id % 3 = 0) AS expected_valid,
             ((luhn_sum % 10 = 0) = (doc_id % 3 = 0)) AS detector_correct
      FROM v ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.Column
    // Luhn mod-10 sum of an attached digit-string attribute: positions
    // double when odd (left-indexed, total length 16 incl. check digit)
    def luhnSum(cand: Column, len: Int): Column =
      aggregate(sequence(lit(1), lit(len)), lit(0L), (acc, i) => {
        val d = cand.substr(i, lit(1)).cast("int")
        acc + when(i % 2 === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d).cast("long")
      })
    val b = t(spark, dir).documents
      .select($"doc_id", $"text",
        translate(md5(concat(lit("card:"), $"doc_id".cast("string"))),
          "abcdef", "012345").substr(1, 15).as("b15"))
      .select($"doc_id", $"text", $"b15") // attribute boundary pre-HOF
    val s = b.withColumn("psum", luhnSum($"b15", 15))
    val c = s.select($"doc_id", $"text",
      concat($"b15",
        when($"doc_id" % 3 === 0, (lit(10) - $"psum" % 10) % 10)
          .otherwise(((lit(10) - $"psum" % 10) % 10 + 1) % 10)
          .cast("string")).as("planted"))
    // Digit-strip the text prefix so the planted run is the ONLY >=13-digit
    // candidate: a 13-15 digit run in the corpus would otherwise win the
    // extraction and substr-past-end diverges across engines (Spark
    // cast('' as int) is NULL, DuckDB CAST('' AS INT) errors).
    val x = c.select($"doc_id", $"planted",
      regexp_extract(
        concat(regexp_replace($"text".substr(1, 40), "[0-9]", ""),
          lit(" "), $"planted", lit(" x")),
        "[0-9]{13,19}", 0).as("extracted"))
    x.withColumn("luhn_sum", luhnSum($"extracted", 16))
      .select($"doc_id", $"planted", $"extracted", $"luhn_sum",
        ($"luhn_sum" % 10 === 0).as("is_valid_card"),
        ($"doc_id" % 3 === 0).as("expected_valid"),
        (($"luhn_sum" % 10 === 0) === ($"doc_id" % 3 === 0)).as("detector_correct"))
      .orderBy($"doc_id")
  }

  /** Good–Turing frequency-of-frequencies smoothing over the corpus
    * 3-gram counts — N_r (number of trigram TYPES seen exactly r times)
    * for r = 1..10, the adjusted count r* = (r+1)·N_{r+1}/N_r, and the
    * unseen-mass estimate p₀ = N₁/N (the missing-species probability a
    * language model reserves for unseen n-grams). Trigrams, not
    * unigrams: the synthetic corpus has a ~31-word closed vocabulary
    * (every unigram count ≫ 10 — the q_text_heaps_law saturation
    * lesson), while its trigram frequency-of-frequencies is properly
    * Zipfian (N₁ ≈ 9.4k at sf0.01), so the estimator measures something
    * real. Occurrences count with MULTIPLICITY (unlike the distinct-set
    * shingle pipeline) over docs with ≥ 3 tokens.
    *
    * Scale shape: one corpus-scale explode→groupBy to per-type counts
    * (map-side partial agg), then the frequency histogram and everything
    * after runs on ≤ max(r) rows. The shingle transform runs over a
    * POST-PROJECTION token-array attribute (the HOF-recapture
    * discipline). Portability: N_r, the numerator (r+1)·N_{r+1} and N
    * are exact BIGINTs; r* and p₀ are each ONE IEEE division of exact
    * integers (no rounding). The 1..10 spine is left-joined so missing
    * frequencies report honest zeros, and r* is NULL (not ÷0) when
    * N_r = 0.
    */
  val qGoodTuring: GQuery = GQuery(
    "q_text_good_turing",
    Some("""
      WITH d AS (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      sh AS (SELECT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
             FROM d, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i) g
             WHERE len(ts) >= 3),
      tc AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS r FROM sh GROUP BY 1),
      ff AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nr FROM tc GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM sh),
      spine AS (SELECT unnest(generate_series(1, 10)) AS r)
      SELECT s.r,
             COALESCE(f.nr, 0) AS n_types_r,
             COALESCE(f1.nr, 0) AS n_types_r_plus_1,
             (s.r + 1) * COALESCE(f1.nr, 0) AS gt_numerator,
             CASE WHEN COALESCE(f.nr, 0) > 0
                  THEN CAST((s.r + 1) * COALESCE(f1.nr, 0) AS DOUBLE)
                       / CAST(f.nr AS DOUBLE)
                  ELSE NULL END AS r_star,
             tot.n_total,
             CAST(COALESCE((SELECT nr FROM ff WHERE r = 1), 0) AS DOUBLE)
               / CAST(tot.n_total AS DOUBLE) AS p0_unseen_mass
      FROM spine s
      LEFT JOIN ff f ON f.r = s.r
      LEFT JOIN ff f1 ON f1.r = s.r + 1, tot
      ORDER BY s.r""")
  ) { (spark, dir) =>
    import spark.implicits._
    val sh = t(spark, dir).documents
      .select(graft.operators.TextOps.tokens($"text").as("ts")) // attribute boundary pre-HOF
      .filter(size($"ts") >= 3)
      .select(explode(transform(sequence(lit(1), size($"ts") - 2),
        i => concat_ws(" ",
          element_at($"ts", i), element_at($"ts", i + 1), element_at($"ts", i + 2))))
        .as("s"))
    val tc = sh.groupBy($"s").agg(count(lit(1)).as("r"))
    val ff = tc.groupBy($"r").agg(count(lit(1)).as("nr")).ckptLazy()
    val tot = sh.agg(count(lit(1)).as("n_total"))
    val n1 = ff.filter($"r" === 1)
      .agg(coalesce(sum($"nr"), lit(0L)).as("n1"))
    val spine = (1L to 10L).toDF("r")
    spine
      .join(broadcast(ff), Seq("r"), "left")
      .join(broadcast(ff.select(($"r" - 1).as("r"), $"nr".as("nr1"))), Seq("r"), "left")
      .na.fill(0L, Seq("nr", "nr1"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(n1))
      .select($"r", $"nr".as("n_types_r"), $"nr1".as("n_types_r_plus_1"),
        (($"r" + 1) * $"nr1").as("gt_numerator"),
        when($"nr" > 0,
          (($"r" + 1) * $"nr1").cast("double") / $"nr".cast("double"))
          .as("r_star"),
        $"n_total",
        ($"n1".cast("double") / $"n_total".cast("double")).as("p0_unseen_mass"))
      .orderBy($"r")
  }

  /** Trained multinomial naive Bayes (predict `lang` from unigram
    * counts; Laplace α = 1) with an 80/20 doc_id-mod split — the
    * in-engine TRAINED classifier that [[qClassifier]]'s hashed linear
    * scorer (fixed random weights) is not. Output is the test-set
    * confusion matrix with per-cell margin witnesses.
    *
    * Deterministic-serving design (the portability core): every
    * log-probability is quantized AT TRAIN TIME to integer micro-log
    * units — lp = floor(1e6·ln(c+1) + 0.5), and likewise the prior and
    * the per-class normalizer ln(n_tok + V) — so scoring is PURE INTEGER
    * arithmetic: score = prior + Σ n_t·lp(t,c) − |d|·lnZ_c. Integer sums
    * are order-insensitive and engine-exact; argmax/margins have NO
    * float boundary at all (exact integer ties break to the lower
    * class label on both engines). The only transcendental is inside
    * the quantizer, where a cross-build ln ulp (≈1e-16 relative) would
    * have to land within 1e-13 of a 0.5 micro-boundary to flip a model
    * weight (~1e-7 per weight; fixed data, ~200 weights). This mirrors
    * production serving, where the trained model ships as a quantized
    * artifact and scorers never re-derive floats.
    *
    * Scale shape: the model is a (class × vocab) table joined broadcast
    * to the test token counts; one groupBy per (doc, class) of integer
    * products; the class spine is a broadcast cross join. Sums stay
    * < 2^53 for any corpus where |d|·1e6·ln-range fits — i.e. up to
    * ~10⁹-token documents.
    */
  val qNaiveBayes: GQuery = GQuery(
    "q_text_naive_bayes",
    Some("""
      WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tk
        FROM documents),
      train AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
      v AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM train),
      cls AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
                     CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM train GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM cls),
      model AS (
        SELECT lang, tk,
               CAST(floor(ln(CAST(COUNT(*) + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lp
        FROM train GROUP BY 1, 2),
      clsq AS (
        SELECT c.lang,
               CAST(floor(ln(CAST(c.n_docs AS DOUBLE) / CAST(tot.total_docs AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS prior_micro,
               CAST(floor(ln(CAST(c.n_tok + v.v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lnz_micro
        FROM cls c, tot, v),
      testc AS (
        SELECT doc_id, MIN(lang) AS actual, tk, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE doc_id % 5 = 0 GROUP BY doc_id, tk),
      dlen AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS len FROM testc GROUP BY 1),
      hits AS (
        SELECT t.doc_id, m.lang, CAST(SUM(t.n * m.lp) AS BIGINT) AS lsum
        FROM testc t JOIN model m ON m.tk = t.tk
        GROUP BY 1, 2),
      spine AS (SELECT d.doc_id, d.len, c.lang, c.prior_micro, c.lnz_micro
                FROM dlen d CROSS JOIN clsq c),
      scores AS (
        SELECT s.doc_id, s.lang,
               s.prior_micro + COALESCE(h.lsum, 0) - s.len * s.lnz_micro AS score_micro
        FROM spine s LEFT JOIN hits h ON h.doc_id = s.doc_id AND h.lang = s.lang),
      rk AS (SELECT doc_id, lang, score_micro,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score_micro DESC, lang) AS rn
             FROM scores),
      pred AS (
        SELECT a.doc_id, a.lang AS pred, a.score_micro - b.score_micro AS margin_micro
        FROM rk a JOIN rk b ON b.doc_id = a.doc_id AND a.rn = 1 AND b.rn = 2),
      lab AS (SELECT doc_id, MIN(actual) AS actual FROM testc GROUP BY 1)
      SELECT lab.actual, p.pred,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(p.margin_micro) AS BIGINT) AS min_margin_micro,
             CAST(SUM(p.margin_micro) AS BIGINT) AS sum_margin_micro
      FROM lab JOIN pred p ON p.doc_id = lab.doc_id
      GROUP BY 1, 2 ORDER BY actual, pred""")
  ) { (spark, dir) =>
    import spark.implicits._
    val tok = t(spark, dir).documents
      .select($"doc_id", $"lang",
        explode(graft.operators.TextOps.tokens($"text")).as("tk"))
    val train = tok.filter($"doc_id" % 5 =!= 0).ckptLazy() // feeds v/cls/model
    val (model, clsq) = graft.operators.TextOps.nbQuantizedModel(train)
    val testTok = tok.filter($"doc_id" % 5 === 0).ckptLazy() // feeds score + labels
    val pred = graft.operators.TextOps
      .nbScore(testTok.select($"doc_id", $"tk"), model, clsq)
    val lab = testTok.groupBy($"doc_id").agg(min($"lang").as("actual"))
    lab.join(pred, Seq("doc_id"))
      .groupBy($"actual", $"pred")
      .agg(count(lit(1)).as("n_docs"),
        min($"margin_micro").as("min_margin_micro"),
        sum($"margin_micro").as("sum_margin_micro"))
      .orderBy($"actual", $"pred")
  }

  /** Keyword-in-context concordance (KWIC) — the corpus-inspection
    * window every curation review loop needs: pick the highest-df token
    * (ties → token ASC; fully deterministic, no configuration), emit a
    * ±3-token context window around each occurrence, capped at the
    * first 50 hits in (doc_id, position) order. Entirely row-local
    * after a broadcast of the single keyword row; the position explode
    * runs over a post-projection token array (HOF-recapture
    * discipline). At 100 TB the cap belongs in the engine (TakeOrdered),
    * not the notebook.
    */
  val qKwic: GQuery = GQuery(
    "q_text_kwic",
    Some("""
      WITH t AS (SELECT doc_id,
                        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
                 FROM documents),
      df AS (SELECT tk, COUNT(DISTINCT doc_id) AS df FROM (
               SELECT doc_id, unnest(ts) AS tk FROM t) GROUP BY 1),
      kw AS (SELECT tk FROM df ORDER BY df DESC, tk LIMIT 1),
      hits AS (
        SELECT t.doc_id, g.i AS pos,
               array_to_string(ts[greatest(1, g.i - 3):g.i - 1], ' ') AS left_ctx,
               ts[g.i] AS keyword,
               array_to_string(ts[g.i + 1:least(len(ts), g.i + 3)], ' ') AS right_ctx
        FROM t, kw, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
        WHERE ts[g.i] = kw.tk)
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             COALESCE(left_ctx, '') AS left_ctx, keyword,
             COALESCE(right_ctx, '') AS right_ctx
      FROM hits ORDER BY doc_id, pos LIMIT 50""")
  ) { (spark, dir) =>
    import spark.implicits._
    val ts = t(spark, dir).documents
      .select($"doc_id", graft.operators.TextOps.tokens($"text").as("ts"))
    val kw = ts.select($"doc_id", explode($"ts").as("tk"))
      .groupBy($"tk").agg(countDistinct($"doc_id").as("df"))
      .orderBy($"df".desc, $"tk").limit(1).select($"tk".as("kw"))
    ts.crossJoin(broadcast(kw))
      .select($"doc_id", $"ts", $"kw",
        explode(sequence(lit(1), size($"ts"))).as("pos"))
      .filter(element_at($"ts", $"pos") === $"kw")
      .select($"doc_id", $"pos".cast("long").as("pos"),
        coalesce(array_join(slice($"ts", greatest(lit(1), $"pos" - 3),
          greatest($"pos" - greatest(lit(1), $"pos" - 3), lit(0))), " "), lit(""))
          .as("left_ctx"),
        element_at($"ts", $"pos").as("keyword"),
        coalesce(array_join(slice($"ts", $"pos" + 1,
          greatest(least(size($"ts"), $"pos" + 3) - $"pos", lit(0))), " "), lit(""))
          .as("right_ctx"))
      .orderBy($"doc_id", $"pos")
      .limit(50)
  }

  /** RAKE keyword extraction (Rose et al. 2010), degree-scored variant:
    * candidate phrases are maximal stopword-delimited token runs (≤ 4
    * words), each word's corpus DEGREE is Σ over its candidate
    * occurrences of the phrase length (co-occurrence mass — words that
    * live in long phrases score high), and a phrase scores the sum of
    * its words' degrees. The canonical deg/freq ratio sum is replaced
    * by the pure-integer degree sum so every score is an exact BIGINT
    * (the deg/freq variant sums per-word ratios — an ordered-float-sum
    * portability hazard for zero analytic gain on short phrases).
    * Top-50 phrases by (score, phrase) — a deterministic total order.
    *
    * Scale shape: explode → two corpus-linear aggregations; the run
    * collect groups on (doc, run) whose size is doc-length-bounded
    * (the per-doc collect class, allowlisted like q_text_bpe_apply).
    */
  val qRake: GQuery = GQuery(
    "q_text_rake",
    Some("""
      WITH toks AS (
        SELECT doc_id, i AS pos, ts[i] AS tk,
               ts[i] IN ('the','a','an','of','and','or','in','to','is','on',
                         'for','with','by','at','as') AS stop
        FROM (SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
              FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g),
      cand AS MATERIALIZED (
        SELECT r.doc_id, r.run_id,
               string_agg(r.tk, ' ' ORDER BY r.pos) AS phrase,
               CAST(COUNT(*) AS BIGINT) AS n_words
        FROM (SELECT t.doc_id, t.pos, t.tk, t.stop,
                     SUM(CASE WHEN t.stop THEN 1 ELSE 0 END)
                       OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS run_id
              FROM toks t) r
        WHERE NOT r.stop
        GROUP BY 1, 2
        HAVING COUNT(*) <= 4),
      wdeg AS MATERIALIZED (
        SELECT w.tk, CAST(SUM(c.n_words) AS BIGINT) AS deg
        FROM cand c,
             LATERAL (SELECT unnest(string_split(c.phrase, ' ')) AS tk) w
        GROUP BY 1),
      scored AS (
        SELECT c.phrase, MIN(c.n_words) AS n_words,
               CAST(COUNT(*) AS BIGINT) AS freq_phrase,
               CAST(MIN(ps.score) AS BIGINT) AS score_deg
        FROM cand c
        JOIN (SELECT c2.doc_id, c2.run_id,
                     SUM(wd.deg) AS score
              FROM cand c2,
                   LATERAL (SELECT unnest(string_split(c2.phrase, ' ')) AS tk) w2
              JOIN wdeg wd ON wd.tk = w2.tk
              GROUP BY 1, 2) ps
          ON ps.doc_id = c.doc_id AND ps.run_id = c.run_id
        GROUP BY 1)
      SELECT phrase, CAST(n_words AS INT) AS n_words, freq_phrase, score_deg
      FROM scored
      ORDER BY score_deg DESC, phrase
      LIMIT 50""")
  ) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val stops = Seq("the", "a", "an", "of", "and", "or", "in", "to", "is", "on",
      "for", "with", "by", "at", "as")
    val toks = t(spark, dir).documents
      .select($"doc_id", posexplode(graft.operators.TextOps.tokens($"text")).as(Seq("pos0", "tk")))
      .select($"doc_id", ($"pos0" + 1).as("pos"), $"tk",
        $"tk".isInCollection(stops).as("stop"))
    val wr = Window.partitionBy($"doc_id").orderBy($"pos") // doc-length-bounded
    val runs = toks.withColumn("run_id",
      sum(when($"stop", 1L).otherwise(0L)).over(wr))
    val cand = runs.filter(!$"stop")
      .groupBy($"doc_id", $"run_id")
      .agg(
        array_join(transform(array_sort(collect_list(struct($"pos", $"tk"))),
          s => s.getField("tk")), " ").as("phrase"),
        count(lit(1)).as("n_words"))
      .filter($"n_words" <= 4)
      .ckptLazy() // feeds word degrees AND phrase scores
    val wdeg = cand
      .select($"n_words", explode(split($"phrase", " ")).as("tk"))
      .groupBy($"tk").agg(sum($"n_words").as("deg"))
    val ps = cand
      .select($"doc_id", $"run_id", explode(split($"phrase", " ")).as("tk"))
      .join(wdeg, "tk")
      .groupBy($"doc_id", $"run_id")
      .agg(sum($"deg").as("score"))
    cand.join(ps, Seq("doc_id", "run_id"))
      .groupBy($"phrase")
      .agg(min($"n_words").cast("int").as("n_words"),
        count(lit(1)).as("freq_phrase"),
        min($"score").as("score_deg"))
      .orderBy($"score_deg".desc, $"phrase")
      .limit(50)
  }

  override def queries: Seq[GQuery] =
    Seq(qStats, qQuality, qLangId, qTokenCount, qBlocklist, qFingerprint, qTokenFreq, qShingleExplode,
      qRedact, qChunk, qRepetition, qTfidf, qCompress, qVocab, qOov, qScript, qUnicode,
      qSubword, qLmScore, qDomainSim, qBm25, qClassifier, qClassifierSweep, qInvertedIndex, qPhrase,
      qGopherRules, qBpeTrain, qBpeApply, qBpeFertility, qPmi, qIndexCompress, qNgramNovelty,
      qTokenEntropy, qCalibration, qRetrievalEval, qTemplateMining, qLengthBias,
      qCodeDetection, qReadability, qPrf1, qLuhn, qGoodTuring, qNaiveBayes, qKwic, qRake)
}
