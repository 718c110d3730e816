package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import Common._

/** Scalar function library: string, date/time, math, array (higher-order),
  * and JSON functions — all codegen'd built-ins, no UDFs.
  *
  * Reference analog: payload decoding in user closures —
  * `payload_view::<str>()` (`examples/src/basic.rs:24`), `serde_json`
  * (`callysto/src/errors.rs:27-28`) — SURVEY.md §2.2 S6. The engine
  * exposes these as declarative columns so they stay inside whole-stage
  * codegen instead of opaque per-record closures.
  */
object ScalarFns extends QuerySet {

  /** String suite over part names. */
  val qString: GQuery = GQuery(
    "q_fn_string",
    Some("""
      SELECT p_partkey,
             upper(p_name) AS uname,
             lower(p_brand) AS lbrand,
             substr(p_name, 1, 4) AS prefix,
             length(p_name) AS name_len,
             replace(p_name, ' ', '_') AS snake,
             concat(p_brand, ':', p_type) AS brand_type,
             strpos(p_name, 'widget') AS widget_at,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
             reverse(p_brand) AS rbrand,
             trim(concat(' ', p_name, ' ')) AS trimmed
      FROM part
      ORDER BY p_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).part
      .select(
        $"p_partkey",
        upper($"p_name").as("uname"),
        lower($"p_brand").as("lbrand"),
        substring($"p_name", 1, 4).as("prefix"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_name", " ", "_").as("snake"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        instr($"p_name", "widget").as("widget_at"),
        lpad($"p_size".cast("string"), 4, "0").as("padded_size"),
        reverse($"p_brand").as("rbrand"),
        trim(concat(lit(" "), $"p_name", lit(" "))).as("trimmed")
      )
      .orderBy($"p_partkey")
  }

  /** Regex suite: extract, replace, match. RE2-compatible patterns only
    * (portable between Java regex and DuckDB's RE2).
    */
  val qRegex: GQuery = GQuery(
    "q_fn_regex",
    Some("""
      SELECT p_partkey,
             regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
             regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
             CASE WHEN regexp_matches(p_type, '^(ECONOMY|PROMO)') THEN 1 ELSE 0 END AS is_cheap
      FROM part
      ORDER BY p_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).part
      .select(
        $"p_partkey",
        regexp_extract($"p_brand", "[0-9]+", 0).as("brand_num"),
        regexp_replace($"p_name", "[aeiou]", "*").as("devoweled"),
        when($"p_type".rlike("^(ECONOMY|PROMO)"), 1).otherwise(0).as("is_cheap")
      )
      .orderBy($"p_partkey")
  }

  /** Date/time suite over order dates (string/epoch outputs only —
    * raw DATE/TIMESTAMP values don't hash identically across engines).
    */
  val qDate: GQuery = GQuery(
    "q_fn_date",
    Some("""
      SELECT o_orderkey,
             year(o_orderdate) AS y,
             month(o_orderdate) AS m,
             day(o_orderdate) AS d,
             quarter(o_orderdate) AS q,
             isodow(o_orderdate) - 1 AS wd,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders
      ORDER BY o_orderkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).orders
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        quarter($"o_orderdate").as("q"),
        weekday($"o_orderdate").as("wd"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        datediff($"o_orderdate", lit("1995-01-01")).as("days_since"),
        unix_timestamp($"o_orderdate").as("epoch_s")
      )
      .orderBy($"o_orderkey")
  }

  /** Math suite. IEEE-deterministic ops only: arithmetic, sqrt, abs,
    * floor, ceil, mod, sign, greatest/least — no libm transcendentals
    * (exp/ln/pow), whose last ulp differs between JVM and C.
    */
  val qMath: GQuery = GQuery(
    "q_fn_math",
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_extendedprice - 30000.0) AS dist,
             CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_bucket,
             CAST(ceil(l_discount * 100.0) AS BIGINT) AS disc_pct,
             sqrt(l_quantity) AS qty_root,
             l_orderkey % 7 AS mod7,
             CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS s,
             greatest(l_quantity, 25.0) AS hi,
             least(l_quantity, 25.0) AS lo
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .select(
        $"l_orderkey",
        $"l_linenumber",
        abs($"l_extendedprice" - 30000.0).as("dist"),
        floor($"l_extendedprice" / 100.0).as("price_bucket"),
        ceil($"l_discount" * 100.0).as("disc_pct"),
        sqrt($"l_quantity").as("qty_root"),
        ($"l_orderkey" % 7).as("mod7"),
        signum($"l_extendedprice" - 30000.0).as("s"),
        greatest($"l_quantity", lit(25.0)).as("hi"),
        least($"l_quantity", lit(25.0)).as("lo")
      )
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Array / higher-order-function suite over 64-dim embeddings:
    * size, element access, elementwise transform + fold (dot products and
    * norms run inside codegen — no UDF, no shuffle).
    */
  val qArray: GQuery = GQuery(
    "q_fn_array",
    Some("""
      SELECT vec_id,
             len(embedding) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_elem,
             list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq_norm,
             CAST(list_max(embedding) AS DOUBLE) AS max_elem,
             CAST(list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS n_pos
      FROM embeddings
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val embD = transform($"embedding", x => x.cast(DoubleType))
    t(spark, dir).embeddings
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).cast(DoubleType).as("first_elem"),
        aggregate(embD, lit(0.0), (acc, x) => acc + x * x).as("sq_norm"),
        array_max($"embedding").cast(DoubleType).as("max_elem"),
        aggregate(
          transform($"embedding", x => when(x > 0f, 1L).otherwise(0L)),
          lit(0L),
          (acc, x) => acc + x
        ).as("n_pos")
      )
      .orderBy($"vec_id")
  }

  /** Array SET operations (intersect / union / except) over per-row token
    * arrays, canonicalized by sort. Engines disagree on result ORDER and
    * duplicate handling of native set ops, so both sides pin the same
    * contract: distinct elements, membership-defined, sorted — the oracle
    * spells it out with filter/contains instead of trusting DuckDB's
    * list_intersect semantics to coincide. Result lists go out as
    * space-joined STRINGS (not arrays) — the harness comparator hashes
    * scalar cells, and a joined canonical-sorted list is the same
    * contract. Pure row-local expressions; at 100 TB this is a map stage
    * inside whole-stage codegen.
    */
  val qArraySetOps: GQuery = GQuery(
    "q_fn_array_setops",
    Some("""
      WITH t AS (SELECT p_partkey,
                        string_split(lower(p_type), ' ') AS a,
                        string_split(lower(p_name), ' ') AS b
                 FROM part)
      SELECT p_partkey,
             COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> list_contains(b, x))), ' '), '') AS common,
             COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ' '), '') AS all_tokens,
             COALESCE(array_to_string(list_sort(list_filter(list_distinct(a), x -> NOT list_contains(b, x))), ' '), '') AS only_type,
             CAST(len(list_filter(list_distinct(a), x -> list_contains(b, x))) AS INT) AS n_common
      FROM t
      ORDER BY p_partkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    val a = split(lower($"p_type"), " ")
    val b = split(lower($"p_name"), " ")
    t(spark, dir).part
      .select(
        $"p_partkey",
        array_join(array_sort(array_intersect(a, b)), " ").as("common"),
        array_join(array_sort(array_union(a, b)), " ").as("all_tokens"),
        array_join(array_sort(array_except(a, b)), " ").as("only_type"),
        size(array_intersect(a, b)).as("n_common"))
      .orderBy($"p_partkey")
  }

  /** JSON suite over the events props payload (from_json /
    * get_json_object analog of the reference's serde_json decoding).
    */
  val qJson: GQuery = GQuery(
    "q_fn_json",
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).events
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Map-function suite: construction, lookup, keys/values, concat, and
    * the from_json MapType decode path. The oracle computes each output
    * directly (map semantics are deterministic functions of the inputs),
    * so any drift in Spark's map ops breaks the hash.
    */
  val qMap: GQuery = GQuery(
    "q_fn_map",
    Some("""
      SELECT event_id,
             2 AS m_size,
             value * 2 AS b_val,
             'a,b' AS keys_sorted,
             value + value * 2 AS vals_sum,
             CAST(1.5 AS DOUBLE) AS c_val,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_map
      FROM events
      ORDER BY event_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val m = map(lit("a"), $"value", lit("b"), $"value" * 2)
    t(spark, dir).events
      .select(
        $"event_id",
        size(m).as("m_size"),
        element_at(m, "b").as("b_val"),
        concat_ws(",", array_sort(map_keys(m))).as("keys_sorted"),
        aggregate(map_values(m), lit(0.0), (acc, v) => acc + v).as("vals_sum"),
        element_at(map_concat(m, map(lit("c"), lit(1.5))), "c").as("c_val"),
        element_at(
          from_json($"props", org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)),
          "k"
        ).as("k_from_map")
      )
      .orderBy($"event_id")
  }

  /** Higher-order predicate functions over arrays: filter / exists /
    * forall / zip_with+slice composition. The oracle uses DuckDB's
    * list_filter (and derives exists/forall from its length — the
    * portable formulation).
    */
  val qHof: GQuery = GQuery(
    "q_fn_hof",
    Some("""
      SELECT vec_id,
             CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.5)) AS INT) AS n_big,
             len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.9)) > 0 AS has_huge,
             len(list_filter(embedding, x -> NOT (abs(CAST(x AS DOUBLE)) <= 2.0))) = 0 AS all_bounded,
             CAST(list_sum(list_transform(generate_series(1, 8),
                           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
                  AS DOUBLE) AS head8_sq
      FROM embeddings
      ORDER BY vec_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).embeddings
      .select(
        $"vec_id",
        // compare in DOUBLE: 0.9 is not exact in float32, so a float-side
        // comparison could flip for values at the representation boundary
        size(filter($"embedding", x => x.cast(DoubleType) > 0.5)).as("n_big"),
        exists($"embedding", x => x.cast(DoubleType) > 0.9).as("has_huge"),
        forall($"embedding", x => abs(x.cast(DoubleType)) <= 2.0).as("all_bounded"),
        aggregate(
          slice(transform($"embedding", _.cast(DoubleType)), 1, 8),
          lit(0.0),
          (acc, x) => acc + x * x
        ).as("head8_sq")
      )
      .orderBy($"vec_id")
  }

  /** URL parsing suite (`parse_url` — the web-corpus provenance toolkit:
    * host, registrable domain, path, query param, path depth). The URL is
    * constructed deterministically from document columns on BOTH sides, so
    * the oracle (which has no parse_url and uses regexes matching RFC-3986
    * generic syntax) checks Spark's extraction exactly. Per-domain corpus
    * balancing over the extracted domain is q_sample_domain_cap.
    */
  val qUrl: GQuery = GQuery(
    "q_fn_url",
    Some("""
      WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc-' ||
                 CAST(doc_id AS VARCHAR) || '?ref=' || source || '&page=' ||
                 CAST(doc_id % 10 AS VARCHAR) AS url
        FROM documents),
      p AS (
        SELECT doc_id,
               regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
               regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path,
               regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page
        FROM u)
      SELECT doc_id, host,
             regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
             path,
             page,
             CAST(length(path) - length(replace(path, '/', '')) AS INT) AS path_depth
      FROM p
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    val u = t(spark, dir).documents
      .select(
        $"doc_id",
        concat(
          lit("https://"), $"source", lit(".example.com/"), $"lang", lit("/doc-"),
          $"doc_id".cast("string"), lit("?ref="), $"source", lit("&page="),
          ($"doc_id" % 10).cast("string")
        ).as("url")
      )
    u.select(
        $"doc_id",
        parse_url($"url", lit("HOST")).as("host"),
        parse_url($"url", lit("PATH")).as("path"),
        parse_url($"url", lit("QUERY"), lit("page")).as("page")
      )
      .select(
        $"doc_id",
        $"host",
        regexp_extract($"host", "([^.]+\\.[^.]+)$", 1).as("domain"),
        $"path",
        $"page",
        (length($"path") - length(regexp_replace($"path", "/", ""))).as("path_depth")
      )
      .orderBy($"doc_id")
  }

  /** Bitwise function suite over 64-bit keys — mask/extract/pack ops used
    * for hash-bucket routing, bitmap flags, and packed-id decoding (the
    * bit-level analog of the reference's byte-level payload handling,
    * callysto/src/types/table.rs:86-88). All pure codegen'd row
    * expressions; DuckDB's `bit_count` returns TINYINT and `~`/`xor` are
    * function-vs-operator spelled, so both sides pin INT/BIGINT explicitly.
    */
  val qBitwise: GQuery = GQuery(
    "q_fn_bitwise",
    Some("""
      SELECT l_orderkey, CAST(l_linenumber AS INT) AS ln,
             l_orderkey & 255 AS band,
             l_orderkey | 4096 AS bor,
             xor(l_orderkey, l_partkey) AS bxor,
             ~l_orderkey AS bnot,
             l_orderkey << 3 AS shl,
             l_orderkey >> 2 AS shr,
             CAST(bit_count(l_orderkey) AS INT) AS popcnt,
             CAST(l_orderkey % 8 AS BIGINT) AS bucket3
      FROM lineitem
      WHERE l_linenumber = 1
      ORDER BY l_orderkey""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).lineitem
      .filter($"l_linenumber" === 1)
      .select(
        $"l_orderkey",
        $"l_linenumber".as("ln"),
        $"l_orderkey".bitwiseAND(lit(255L)).as("band"),
        $"l_orderkey".bitwiseOR(lit(4096L)).as("bor"),
        $"l_orderkey".bitwiseXOR($"l_partkey").as("bxor"),
        bitwise_not($"l_orderkey").as("bnot"),
        shiftleft($"l_orderkey", 3).as("shl"),
        shiftright($"l_orderkey", 2).as("shr"),
        bit_count($"l_orderkey").as("popcnt"),
        ($"l_orderkey" % 8).as("bucket3")
      )
      .orderBy($"l_orderkey")
  }

  /** Semi-structured VARIANT path (Spark 4): `parse_json` once into the
    * binary variant encoding, then typed `variant_get` extractions — at
    * scale this beats per-access JSON string re-parsing (the variant is
    * parsed once, shredded access is O(field)), which is why it's the
    * preferred lake representation for schema-on-read payloads. The
    * oracle replays the same extractions with DuckDB's JSON accessors.
    */
  val qVariant: GQuery = GQuery(
    "q_fn_variant",
    Some("""
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
             CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
             CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_no_field
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (spark, dir) =>
    import spark.implicits._
    val k = variant_get(parse_json($"props"), "$.k", "bigint")
    val missing = variant_get(parse_json($"props"), "$.missing", "string")
    t(spark, dir).events
      .select($"event_type", k.as("k"), missing.as("m"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        sum(when($"m".isNull, 1L).otherwise(0L)).as("n_no_field"))
      .orderBy($"event_type")
  }

  /** Error-tolerant scalar suite (`try_*`): the row-wise "never fail the
    * job" contract for arithmetic and casts — at 100 TB some shard always
    * contains a zero denominator or an unparseable string, and one bad row
    * must degrade to NULL, not kill the stage (same design rule as
    * q_source_dirty_json's PERMISSIVE parse). Inputs are derived
    * deterministically from documents so both engines see identical dirt.
    */
  val qTry: GQuery = GQuery(
    "q_fn_try",
    Some("""
      WITH d AS (
        SELECT doc_id,
               CAST(doc_id % 7 AS BIGINT) AS denom,
               CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR) || 'x'
                    ELSE CAST(doc_id AS VARCHAR) END AS numstr
        FROM documents)
      SELECT doc_id,
             CASE WHEN denom = 0 THEN NULL
                  ELSE CAST(doc_id AS DOUBLE) / denom END AS safe_div,
             TRY_CAST(numstr AS BIGINT) AS parsed,
             COALESCE(TRY_CAST(numstr AS BIGINT), -1) AS parsed_or_default
      FROM d
      ORDER BY doc_id""")
  ) { (spark, dir) =>
    import spark.implicits._
    t(spark, dir).documents
      .select(
        $"doc_id",
        ($"doc_id" % 7).as("denom"),
        when($"doc_id" % 3 === 0, concat($"doc_id".cast("string"), lit("x")))
          .otherwise($"doc_id".cast("string")).as("numstr"))
      .select(
        $"doc_id",
        try_divide($"doc_id".cast("double"), $"denom").as("safe_div"),
        $"numstr".try_cast("bigint").as("parsed"),
        coalesce($"numstr".try_cast("bigint"), lit(-1L)).as("parsed_or_default"))
      .orderBy($"doc_id")
  }

  override def queries: Seq[GQuery] =
    Seq(qString, qRegex, qDate, qMath, qArray, qArraySetOps, qJson, qMap, qHof, qUrl,
      qBitwise, qVariant, qTry)
}
