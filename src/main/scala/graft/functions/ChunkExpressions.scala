package graft.functions

import graft.codec.Chunks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels callable from both interpreted eval and Janino-compiled
  * generated code (static forwarders make `ChunkExprKernels.encode(...)`
  * a plain Java static call). */
object ChunkExprKernels {
  def encode(a: ArrayData): Array[Byte] = {
    val arr = a.toIntArray()
    Chunks.encodeInts(arr, 0, arr.length)
  }
  def decode(b: Array[Byte]): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(Chunks.decodeInts(b))
  def codecName(b: Array[Byte]): UTF8String =
    UTF8String.fromString(Chunks.codecName(b))
  def bloomProbe(bloom: Array[Byte], hash: Int): Boolean =
    graft.codec.Bloom.mightContain(bloom, hash)
  def bloomMightContain(bloom: Array[Byte], streamCrcs: ArrayData, token: Int): Boolean = {
    val crc = new java.util.zip.CRC32()
    crc.update(bloom)
    require(crc.getValue == streamCrcs.getLong(4), "bloom stream CRC mismatch")
    graft.codec.Bloom.mightContain(bloom, token)
  }
}

/** SQL-visible codec surface: `encode_chunk(array<int>) -> binary`,
  * `decode_chunk(binary) -> array<int>`, `chunk_codec(binary) -> string`.
  *
  * Catalyst `Expression`s (not Scala UDFs) WITH `doGenCode`: inputs
  * arrive as `ArrayData`/byte arrays with a single bulk copy, no
  * per-element boxing, nulls short-circuit in the generated code, and
  * the surrounding stage stays inside whole-stage codegen (round 1 used
  * CodegenFallback, paying an interpreted eval per row). The kernels are
  * the same auto-selecting chunk codecs the pipeline uses
  * (SURVEY.md §2.1 E1-E9).
  */
case class EncodeChunk(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"encode_chunk needs array<int>, got $t")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_chunk"
  override protected def nullSafeEval(input: Any): Any =
    ChunkExprKernels.encode(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkExprKernels.encode($c);")
  override protected def withNewChildInternal(newChild: Expression): EncodeChunk =
    copy(child = newChild)
}

case class DecodeChunk(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"decode_chunk needs binary, got $t")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "decode_chunk"
  override protected def nullSafeEval(input: Any): Any =
    ChunkExprKernels.decode(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkExprKernels.decode($c);")
  override protected def withNewChildInternal(newChild: Expression): DecodeChunk =
    copy(child = newChild)
}

case class ChunkCodec(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"chunk_codec needs binary, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "chunk_codec"
  override protected def nullSafeEval(input: Any): Any =
    ChunkExprKernels.codecName(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkExprKernels.codecName($c);")
  override protected def withNewChildInternal(newChild: Expression): ChunkCodec =
    copy(child = newChild)
}

/** Plain bloom probe over a serialized split-block filter and a
  * pre-hashed value (generic-chunk per-column blooms; the caller hashes
  * strings/longs via Bloom.fnv1a / Bloom.foldLong). An absent filter
  * (empty/null bytes) can't prune, so Bloom.mightContain returns true. */
case class BloomProbe(bloom: Expression, hash: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = bloom
  override def right: Expression = hash
  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, hash.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"bloom_probe needs (binary, int), got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"
  override protected def nullSafeEval(b: Any, h: Any): Any =
    ChunkExprKernels.bloomProbe(b.asInstanceOf[Array[Byte]], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.ChunkExprKernels.bloomProbe($b, $h);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(bloom = newLeft, hash = newRight)
}

/** Chunk-level bloom probe used by searchToken's declarative pruning
  * scan: `BloomMightContain(tokens_bloom, stream_crcs, tokenId)` checks
  * the serialized split-block filter inside whole-stage codegen. The
  * bloom's own stream CRC is verified per probe — a corrupted bloom
  * would otherwise silently DROP hits (false negatives), the one
  * corruption mode pruning cannot tolerate. */
case class BloomMightContain(bloom: Expression, streamCrcs: Expression, token: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = bloom
  override def second: Expression = streamCrcs
  override def third: Expression = token
  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, streamCrcs.dataType, token.dataType) match {
      case (BinaryType, ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain needs (binary, array<bigint>, int), got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(b: Any, crcs: Any, t: Any): Any =
    ChunkExprKernels.bloomMightContain(
      b.asInstanceOf[Array[Byte]], crcs.asInstanceOf[ArrayData], t.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, t) =>
      s"${ev.value} = graft.functions.ChunkExprKernels.bloomMightContain($b, $c, $t);")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomMightContain =
    copy(bloom = newFirst, streamCrcs = newSecond, token = newThird)
}

object GraftFunctions {
  /** Register the codec functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("encode_chunk", es => EncodeChunk(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("decode_chunk", es => DecodeChunk(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("chunk_codec", es => ChunkCodec(es.head), "scala_udf")
  }
}

/** `SparkSessionExtensions` hook so `spark.sql.extensions=
  * graft.functions.GraftExtensions` injects the functions at session
  * build time (the spark-submit-friendly path).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("encode_chunk"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "encode_chunk"),
        (es: Seq[Expression]) => EncodeChunk(es.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("decode_chunk"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "decode_chunk"),
        (es: Seq[Expression]) => DecodeChunk(es.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("chunk_codec"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "chunk_codec"),
        (es: Seq[Expression]) => ChunkCodec(es.head)))
  }
}
