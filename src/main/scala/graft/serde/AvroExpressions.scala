package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Avro serde expressions — `from_avro`/`to_avro` parity built directly on
  * avro-1.12 (no spark-avro module ships in this build).
  *
  * Two wire modes, mirroring the reference's decode modes
  * (callysto-avro/src/avro.rs:31-198):
  *   - *datum*: raw binary-encoded record, one per value — what
  *     `from_avro`/`to_avro` and the Confluent wire format (sans header)
  *     use;
  *   - *file container*: each value is a whole Avro object-container file
  *     (magic, schema header, blocks) — the reference treats every Kafka
  *     message this way (`Reader::with_schema` per payload, avro.rs:59;
  *     SURVEY.md §7.4.3), and its sink writes one container per item
  *     (avro.rs:238-331).
  *
  * Serde cost is codec-bound, not expression-dispatch-bound, but each
  * expression still emits real generated code: a single helper call on the
  * referenced expression object (`ctx.addReferenceObj`), which keeps the
  * enclosing stage in whole-stage codegen without CodegenFallback's
  * per-row InternalRow materialization. Per-thread codec reuse via
  * ThreadLocal keeps executor threads from sharing Avro's stateful
  * readers/writers.
  */
case class AvroEncodeDatum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a struct, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro"

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val avroSchema =
    AvroConv.toAvroSchema(structType, "row", nullable = false)
  @transient private lazy val writerTL =
    ThreadLocal.withInitial[GenericDatumWriter[GenericRecord]](() =>
      new GenericDatumWriter[GenericRecord](avroSchema)
    )

  override protected def nullSafeEval(input: Any): Any = {
    val rec = AvroConv.rowToRecord(input.asInstanceOf[InternalRow], structType, avroSchema)
    val baos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(baos, null)
    writerTL.get().write(rec, enc)
    enc.flush()
    baos.toByteArray
  }

  /** Public entry for generated code. */
  def evalValue(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("avroExpr", this, classOf[AvroEncodeDatum].getName)
      s"${ev.value} = (byte[]) $ref.evalValue($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AvroDecodeDatum(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }
  override def prettyName: String = "graft_from_avro"

  @transient private lazy val avroSchema = new Schema.Parser().parse(jsonSchema)
  @transient private lazy val structType = AvroConv.toCatalyst(avroSchema).asInstanceOf[StructType]
  override def dataType: DataType = structType
  override def nullable: Boolean = true

  @transient private lazy val readerTL =
    ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](() =>
      new GenericDatumReader[GenericRecord](avroSchema)
    )

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    AvroConv.recordToRow(readerTL.get().read(null, dec), structType)
  }

  /** Public entry for generated code. */
  def evalValue(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("avroExpr", this, classOf[AvroDecodeDatum].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalValue($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct → one whole Avro object-container file per row (CAvroSink's
  * wire format).
  */
case class AvroEncodeContainer(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a struct, got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_avro_file"

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val avroSchema =
    AvroConv.toAvroSchema(structType, "row", nullable = false)

  override protected def nullSafeEval(input: Any): Any = {
    val rec = AvroConv.rowToRecord(input.asInstanceOf[InternalRow], structType, avroSchema)
    val baos = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, baos)
    w.append(rec)
    w.close()
    baos.toByteArray
  }

  /** Public entry for generated code. */
  def evalValue(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("avroExpr", this, classOf[AvroEncodeContainer].getName)
      s"${ev.value} = (byte[]) $ref.evalValue($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** binary Avro object-container file → array<struct> of ALL its records
  * (a container may hold many; explode downstream) — the reference's
  * per-message file-reader mode.
  */
case class AvroDecodeContainer(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got $t")
  }
  override def prettyName: String = "graft_from_avro_file"

  @transient private lazy val avroSchema = new Schema.Parser().parse(jsonSchema)
  @transient private lazy val structType = AvroConv.toCatalyst(avroSchema).asInstanceOf[StructType]
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val reader = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](avroSchema)
    )
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      while (reader.hasNext) out += AvroConv.recordToRow(reader.next(), structType)
      new GenericArrayData(out.toArray)
    } finally reader.close()
  }

  /** Public entry for generated code. */
  def evalValue(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("avroExpr", this, classOf[AvroDecodeContainer].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalValue($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
