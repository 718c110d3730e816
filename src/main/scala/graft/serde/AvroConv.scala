package graft.serde

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{JsonProperties, Schema}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst ↔ Avro conversion for the serde expressions.
  *
  * The Spark distribution here ships no spark-avro module, so the engine
  * implements the mapping directly on avro-1.12 (the library the reference
  * uses through the `apache_avro` crate — callysto-avro/src/avro.rs).
  *
  * Supported Catalyst types: boolean, int, long, float, double, string,
  * binary, array, struct (nested), with nullability as `union[null, T]`.
  * Timestamp → long (µs) and date → int (days) on encode — plain integers
  * on the wire, like the reference's `long` epoch fields
  * (examples/src/avro-stream.rs:28-37).
  */
object AvroConv {

  /** Catalyst → Avro schema. Record names are derived from field names
    * (Avro requires named records; the names don't affect the wire bytes
    * for our purposes, only resolution).
    */
  def toAvroSchema(dt: DataType, name: String, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType            => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType | DateType => Schema.create(Schema.Type.INT)
      case LongType | TimestampType | TimestampNTZType => Schema.create(Schema.Type.LONG)
      case FloatType              => Schema.create(Schema.Type.FLOAT)
      case DoubleType             => Schema.create(Schema.Type.DOUBLE)
      case StringType             => Schema.create(Schema.Type.STRING)
      case BinaryType             => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, containsNull) =>
        Schema.createArray(toAvroSchema(et, s"${name}_item", containsNull))
      case st: StructType =>
        val fields = st.fields.toSeq.map { f =>
          val fs = toAvroSchema(f.dataType, s"${name}_${f.name}", f.nullable)
          val default = if (f.nullable) JsonProperties.NULL_VALUE else null
          new Schema.Field(f.name, fs, null, default)
        }
        Schema.createRecord(s"${name}_rec", null, "graft.serde", false, fields.asJava)
      case other =>
        throw new IllegalArgumentException(s"graft avro serde: unsupported type $other")
    }
    if (nullable && base.getType != Schema.Type.UNION)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  def schemaJson(st: StructType, name: String = "row"): String =
    toAvroSchema(st, name, nullable = false).toString

  /** Avro schema → Catalyst type. Unions must be `[null, T]` (the only
    * union shape the encoder emits — same restriction as the reference's
    * typed decode mode).
    */
  def toCatalyst(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(toCatalyst(s.getElementType), containsNull = isNullable(s.getElementType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), toCatalyst(nonNull(f.schema())), nullable = isNullable(f.schema()))
      })
    case Schema.Type.UNION => toCatalyst(nonNull(s))
    case other =>
      throw new IllegalArgumentException(s"graft avro serde: unsupported avro type $other")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"graft avro serde: only [null, T] unions supported, got $s")
      branches.head
    } else s

  // ---- value conversion: Catalyst internal → Avro ----

  def rowToRecord(row: InternalRow, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val v =
        if (row.isNullAt(i)) null
        else toAvroValue(row.get(i, f.dataType), f.dataType, nonNull(schema.getFields.get(i).schema()))
      rec.put(i, v)
      i += 1
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, s: Schema): AnyRef = dt match {
    case StringType => v.asInstanceOf[UTF8String].toString
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case st: StructType => rowToRecord(v.asInstanceOf[InternalRow], st, s)
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      val out = new java.util.ArrayList[AnyRef](arr.numElements())
      val es = nonNull(s.getElementType)
      var i = 0
      while (i < arr.numElements()) {
        out.add(if (arr.isNullAt(i)) null else toAvroValue(arr.get(i, et), et, es))
        i += 1
      }
      out
    case _ => v.asInstanceOf[AnyRef] // primitives box directly
  }

  // ---- value conversion: Avro → Catalyst internal ----

  def recordToRow(rec: GenericRecord, st: StructType): InternalRow = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      vals(i) = fromAvroValue(rec.get(i), st.fields(i).dataType)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def fromAvroValue(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else
      dt match {
        case StringType => UTF8String.fromString(v.toString)
        case BinaryType =>
          val bb = v.asInstanceOf[ByteBuffer]
          val out = new Array[Byte](bb.remaining())
          bb.duplicate().get(out)
          out
        case st: StructType => recordToRow(v.asInstanceOf[GenericRecord], st)
        case ArrayType(et, _) =>
          val in = v.asInstanceOf[java.util.Collection[AnyRef]]
          val out = new Array[Any](in.size())
          var i = 0
          val it = in.iterator()
          while (it.hasNext) { out(i) = fromAvroValue(it.next(), et); i += 1 }
          new GenericArrayData(out)
        case _ => v
      }
}
