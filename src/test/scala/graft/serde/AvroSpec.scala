package graft.serde

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

/** Avro serde: datum and file-container round-trips (the two wire modes of
  * callysto-avro, avro.rs:31-198), nullable fields, nested records, arrays,
  * and decoding a multi-record container produced by the raw Avro library
  * (interop proof — not just our-encoder-to-our-decoder).
  */
class AvroSpec extends SparkSpec {

  test("datum round-trip preserves primitives, nulls, arrays, nested structs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("alpha"), 1.5, Seq(1L, 2L, 3L), ("in", 7L)),
      (2L, None, -2.25, Seq.empty[Long], ("out", 9L))
    ).toDF("id", "name", "score", "tags", "nested")

    val schemaJson = AvroConv.schemaJson(df.schema)
    val back = df
      .select(GraftFunctions.toAvro(struct(df.columns.map(col): _*)).as("bin"))
      .select(GraftFunctions.fromAvro($"bin", schemaJson).as("r"))
      .select($"r.*")

    assert(back.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq)
    val rows = back.orderBy($"id").collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "alpha")
    assert(rows(0).getDouble(2) === 1.5)
    assert(rows(0).getSeq[Long](3) === Seq(1L, 2L, 3L))
    assert(rows(0).getStruct(4) === Row("in", 7L))
    assert(rows(1).isNullAt(1)) // None survives as null through union[null,string]
    assert(rows(1).getSeq[Long](3) === Seq.empty)
  }

  test("container round-trip and schema derivation") {
    val s = spark
    import s.implicits._
    val df = Seq((10L, "x"), (20L, "y")).toDF("n", "tag")
    val schemaJson = AvroConv.schemaJson(df.schema)
    val back = df
      .select(GraftFunctions.toAvroFile(struct($"n", $"tag")).as("bin"))
      .select(explode(GraftFunctions.fromAvroFile($"bin", schemaJson)).as("r"))
      .select($"r.n", $"r.tag")
      .orderBy($"n")
      .collect()
    assert(back.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((10L, "x"), (20L, "y")))
  }

  test("decodes a multi-record container written by the plain Avro library") {
    val s = spark
    import s.implicits._
    // Build a 3-record Avro file with apache avro directly — proving wire
    // compatibility rather than encoder/decoder symmetry.
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"ev","fields":[
        |{"name":"id","type":"long"},{"name":"kind","type":"string"}]}""".stripMargin)
    val baos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, baos)
    Seq(1L -> "a", 2L -> "b", 3L -> "c").foreach { case (id, kind) =>
      val rec = new GenericData.Record(schema)
      rec.put("id", id)
      rec.put("kind", kind)
      w.append(rec)
    }
    w.close()

    val df = Seq(Tuple1(baos.toByteArray)).toDF("bin")
    val out = df
      .select(explode(GraftFunctions.fromAvroFile($"bin", schema.toString)).as("r"))
      .select($"r.id", $"r.kind")
      .orderBy($"id")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("property: random rows of a mixed-type schema survive datum round-trip (5 seeded samples)") {
    val s = spark
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed

    val rowGen = for {
      id <- Gen.choose(Long.MinValue, Long.MaxValue)
      name <- Gen.option(Gen.alphaNumStr.map(_.take(32)))
      score <- Gen.choose(-1e9, 1e9)
      flag <- Gen.oneOf(true, false)
      tags <- Gen.listOfN(5, Gen.choose(-1000L, 1000L))
    } yield (id, name, score, flag, tags)

    for (i <- 0 until 5) {
      val rows = Gen.listOfN(40, rowGen)
        .apply(Gen.Parameters.default, Seed(100L + i)).get
      val df = rows.toDF("id", "name", "score", "flag", "tags")
      val schemaJson = AvroConv.schemaJson(df.schema)
      val back = df
        .select(GraftFunctions.toAvro(struct(df.columns.map(col): _*)).as("bin"))
        .select(GraftFunctions.fromAvro($"bin", schemaJson).as("r"))
        .select($"r.*")
        .as[(Long, Option[String], Double, Boolean, Seq[Long])]
        .collect()
        .toSet
      assert(back === rows.map(t => (t._1, t._2, t._3, t._4, t._5.toSeq)).toSet,
        s"sample $i diverged after round-trip")
    }
  }

  test("catalyst/avro schema mapping is symmetric for supported types") {
    import org.apache.spark.sql.types._
    val st = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i", IntegerType, nullable = true),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("bin", BinaryType, nullable = false),
      StructField("arr", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("nested", StructType(Seq(StructField("x", StringType, nullable = true))), nullable = false)
    ))
    val avro = AvroConv.toAvroSchema(st, "row", nullable = false)
    assert(avro.getFields.asScala.map(_.name()).toSeq === st.fieldNames.toSeq)
    val round = AvroConv.toCatalyst(avro).asInstanceOf[StructType]
    assert(round === st)
  }
}
