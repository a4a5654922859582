package graft.spark

import graft.codec._
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import java.nio.charset.StandardCharsets.UTF_8

/** One encoded chunk of an ARBITRARY flat schema: per-column codec
  * payloads side by side, schema recorded in the chunk row. The engine
  * analog of the reference's GenericWriter/GenericReader over any Go
  * struct (column_buffer_go18.go:241-287, convert.go:49-345) — here the
  * Catalyst schema replaces Go reflection, and every column reuses the
  * same auto-selecting codec kernels as the token pipeline.
  */
final case class GenericChunk(
    part_id: Int,
    chunk_id: Long,
    num_rows: Int,
    col_names: Seq[String],
    col_types: Seq[String],
    col_codecs: Seq[String],
    col_nulls: Seq[Int],
    enc_bytes: Long,
    crc32: Long,
    cols_bin: Seq[Array[Byte]])

/** Encode/decode ANY flat DataFrame whose columns are int / long /
  * double / string / boolean / array<int> to a chunk table and back.
  * Layout follows the input partitioning (use repartition/sort upstream
  * for range layouts); each partition cuts chunks at a row budget.
  */
object GenericEncode {

  final val DefaultRowsPerChunk: Int = 64 * 1024

  private val Supported: Set[DataType] =
    Set(IntegerType, LongType, DoubleType, FloatType, StringType, BooleanType,
      BinaryType, DateType, TimestampType, TimestampNTZType,
      ArrayType(IntegerType, containsNull = false),
      ArrayType(IntegerType, containsNull = true),
      ArrayType(FloatType, containsNull = false),
      ArrayType(FloatType, containsNull = true),
      ArrayType(StringType, containsNull = false),
      ArrayType(StringType, containsNull = true))

  private def requireNoNullElements(
      ad: org.apache.spark.sql.catalyst.util.ArrayData, name: String): Unit = {
    val n = ad.numElements()
    var k = 0
    while (k < n) {
      require(!ad.isNullAt(k),
        s"generic encode: null element in array column '$name' " +
          "(element nulls are not encodable; filter or coalesce them upstream)")
      k += 1
    }
  }

  /** Decimals up to 18 digits ride the long codec as unscaled values
    * (reference logical-type analog: FIXED/INT64 decimal, type.go:20-31). */
  private def isSupported(dt: DataType): Boolean = dt match {
    case d: DecimalType => d.precision <= 18
    case t => Supported.contains(t)
  }

  /** Leaf separator for flattened struct columns. '.' would collide with
    * user column names too easily; '' cannot appear in a sane name. */
  private final val Sep = "\u0001"
  private final val DefinedSuffix = Sep + "defined"

  /** Struct columns are handled by schema-tree flattening around the flat
    * engine (the Spark-native replacement for the reference's rep/def
    * shredding of nested schemas, node.go:149-177): each struct leaf
    * becomes a column named parentleaf, a nullable struct gains a
    * boolean presence leaf, and `decode` rebuilds the nesting from the
    * names. Arbitrary depth via recursion.
    *
    * Map leaf names carry a LEADING Sep, so a user struct whose fields
    * happen to be named "mkeys"/"mvals" can never be mistaken for an
    * encoded map on decode — user column names are rejected if they
    * contain Sep, so the double-Sep pattern is unforgeable. */
  private final val MapKeysLeaf = Sep + "mkeys"
  private final val MapValsLeaf = Sep + "mvals"

  private def validateNames(t: StructType): Unit = t.fields.foreach { f =>
    require(f.name.nonEmpty && !f.name.contains(Sep),
      s"generic encode: illegal column name '${f.name}' (empty or contains \\u0001)")
    f.dataType match {
      case st: StructType => validateNames(st)
      case _ =>
    }
  }

  private def flatten(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, map_keys, map_values}
    def mapLeaves(prefix: String, path: String, nullable: Boolean): Seq[org.apache.spark.sql.Column] = {
      val presence =
        if (nullable) Seq(c(path).isNotNull.as(prefix + DefinedSuffix)) else Seq.empty
      presence ++ Seq(
        map_keys(c(path)).as(prefix + Sep + MapKeysLeaf),
        map_values(c(path)).as(prefix + Sep + MapValsLeaf))
    }
    def expand(prefix: String, path: String, t: StructType, nullable: Boolean): Seq[org.apache.spark.sql.Column] = {
      val presence =
        if (nullable) Seq(c(path).isNotNull.as(prefix + DefinedSuffix)) else Seq.empty
      presence ++ t.fields.flatMap { f =>
        f.dataType match {
          case st: StructType =>
            expand(prefix + Sep + f.name, s"$path.`${f.name}`", st, f.nullable)
          case _: MapType =>
            mapLeaves(prefix + Sep + f.name, s"$path.`${f.name}`", f.nullable)
          case _ =>
            Seq(c(s"$path.`${f.name}`").as(prefix + Sep + f.name))
        }
      }
    }
    val cols = df.schema.fields.flatMap { f =>
      f.dataType match {
        case st: StructType => expand(f.name, s"`${f.name}`", st, f.nullable)
        case _: MapType => mapLeaves(f.name, s"`${f.name}`", f.nullable)
        case _ => Seq(c(s"`${f.name}`"))
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Rebuild nested structs and maps from flattened leaf names. */
  private def unflatten(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, struct, when, map_from_arrays}
    // group top-level: names without Sep stay; names with Sep nest
    def build(names: Seq[String], prefix: String): org.apache.spark.sql.Column = {
      val defined = names.contains(prefix + DefinedSuffix)
      val children = names.filter(n => n != prefix + DefinedSuffix)
      val colPos: String => Int = n => df.columns.indexOf(n)
      val byChild = children.groupBy(_.stripPrefix(prefix + Sep).split(Sep, 2)(0))
      val node =
        // the "" group key arises ONLY from the leading-Sep map leaves
        if (byChild.keySet == Set(""))
          map_from_arrays(
            c("`" + prefix + Sep + MapKeysLeaf + "`"),
            c("`" + prefix + Sep + MapValsLeaf + "`"))
        else {
          val fields = byChild.toSeq
            .sortBy { case (_, ns) => ns.map(colPos).min }
            .map { case (child, ns) =>
              if (ns == Seq(prefix + Sep + child))
                c("`" + prefix + Sep + child + "`").as(child)
              else build(ns, prefix + Sep + child).as(child)
            }
          struct(fields: _*)
        }
      if (defined) when(c("`" + prefix + DefinedSuffix + "`"), node) else node
    }
    val tops = df.columns.map(_.split(Sep, 2)(0)).distinct
    val cols = tops.map { top =>
      val ns = df.columns.filter(n => n == top || n.startsWith(top + Sep)).toSeq
      if (ns == Seq(top)) c("`" + top + "`")
      else build(ns, top).as(top)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def encode(df0: DataFrame, rowsPerChunk: Int = DefaultRowsPerChunk): Dataset[GenericChunk] = {
    validateNames(df0.schema)
    val df =
      if (df0.schema.fields.exists(f =>
        f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[MapType]))
        flatten(df0)
      else df0
    val spark = df.sparkSession
    import spark.implicits._
    val schema = df.schema
    schema.fields.foreach { f =>
      require(isSupported(f.dataType),
        s"generic encode: unsupported column type ${f.dataType} (${f.name})")
    }
    val names = schema.fields.map(_.name).toSeq
    val types = schema.fields.map(_.dataType.simpleString).toSeq
    val rdd = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, iter) =>
      new GenericPartitionEncoder(pid, schema, names, types, rowsPerChunk, iter)
    }
    spark.createDataset(rdd)
  }

  /** Per-partition chunk cutter: buffers each column as a typed builder,
    * flushes every `rowsPerChunk` rows. */
  private final class GenericPartitionEncoder(
      pid: Int, schema: StructType, names: Seq[String], types: Seq[String],
      rowsPerChunk: Int, iter: Iterator[InternalRow]) extends Iterator[GenericChunk] {
    private val fields = schema.fields
    private var chunkSeq = 0L
    private var done = false
    private var pending: GenericChunk = _

    override def hasNext: Boolean = {
      if (pending == null && !done) pending = readChunk()
      pending != null
    }
    override def next(): GenericChunk = {
      if (!hasNext) throw new NoSuchElementException
      val c = pending
      pending = null
      c
    }

    private def readChunk(): GenericChunk = {
      if (!iter.hasNext) { done = true; return null }
      val n = fields.length
      val bufs = Array.fill(n)(new scala.collection.mutable.ArrayBuffer[Any](1024))
      var rows = 0
      while (iter.hasNext && rows < rowsPerChunk) {
        val row = iter.next()
        var c = 0
        while (c < n) {
          val buf = bufs(c)
          if (row.isNullAt(c)) buf += null
          else fields(c).dataType match {
            case IntegerType | DateType => buf += row.getInt(c) // date = days since epoch
            case LongType | TimestampType | TimestampNTZType =>
              buf += row.getLong(c) // ts = micros
            case DoubleType => buf += row.getDouble(c)
            case FloatType => buf += row.getFloat(c)
            case d: DecimalType =>
              buf += row.getDecimal(c, d.precision, d.scale).toUnscaledLong
            case BooleanType => buf += row.getBoolean(c)
            case StringType => buf += row.getUTF8String(c).getBytes
            case BinaryType => buf += row.getBinary(c)
            case ArrayType(FloatType, cn) =>
              val ad = row.getArray(c)
              // toFloatArray bulk-copies the value region and would
              // silently unbox element nulls to 0.0f — reject them loudly
              // (same stance as array<string> below)
              if (cn) requireNoNullElements(ad, fields(c).name)
              buf += ad.toFloatArray()
            case ArrayType(StringType, _) =>
              val ad = row.getArray(c)
              val strs = new Array[Array[Byte]](ad.numElements())
              var k = 0
              while (k < strs.length) {
                require(!ad.isNullAt(k), "generic encode: null array<string> element")
                strs(k) = ad.getUTF8String(k).getBytes
                k += 1
              }
              buf += strs
            case ArrayType(_, cn) =>
              val ad = row.getArray(c)
              if (cn) requireNoNullElements(ad, fields(c).name)
              buf += ad.toIntArray()
          }
          c += 1
        }
        rows += 1
      }
      if (!iter.hasNext) done = true
      // encode each column: nullable wrap over the dense payload
      val bins = new Array[Array[Byte]](n)
      val codecs = new Array[String](n)
      val nulls = new Array[Int](n)
      var c = 0
      while (c < n) {
        val buf = bufs(c)
        val nullCount = buf.count(_ == null)
        nulls(c) = nullCount
        val dense = if (nullCount == 0) buf else buf.filter(_ != null)
        val inner = fields(c).dataType match {
          case IntegerType | DateType =>
            val a = new Array[Int](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Int]; i += 1 }
            Chunks.encodeInts(a, 0, a.length)
          case LongType | TimestampType | TimestampNTZType =>
            val a = new Array[Long](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Long]; i += 1 }
            Chunks.encodeLongs(a, 0, a.length)
          case DoubleType =>
            val a = new Array[Double](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Double]; i += 1 }
            Chunks.encodeDoubles(a, 0, a.length)
          case FloatType =>
            val a = new Array[Float](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Float]; i += 1 }
            Chunks.encodeFloats(a, 0, a.length)
          case _: DecimalType => // unscaled longs (delta packs price-like series well)
            val a = new Array[Long](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Long]; i += 1 }
            Chunks.encodeLongs(a, 0, a.length)
          case BooleanType =>
            val a = new Array[Boolean](dense.length)
            var i = 0; dense.foreach { v => a(i) = v.asInstanceOf[Boolean]; i += 1 }
            Chunks.encodeBooleans(a, 0, a.length)
          case StringType | BinaryType => // binary rides the byte-array codecs
            Chunks.encodeStrings(dense.map(_.asInstanceOf[Array[Byte]]).toArray, 0, dense.length)
          case ArrayType(FloatType, _) =>
            // flattened floats (BSS) + per-row lengths — the embedding-
            // column layout
            val arrays = dense.map(_.asInstanceOf[Array[Float]])
            val lens = arrays.map(_.length).toArray
            val total = lens.sum
            val flat = new Array[Float](total)
            var off = 0
            arrays.foreach { a => System.arraycopy(a, 0, flat, off, a.length); off += a.length }
            val w = new ByteWriter(64 + total * 4)
            val lensBin = Chunks.encodeInts(lens, 0, lens.length)
            w.writeUvarint(lensBin.length)
            w.writeBytes(lensBin)
            w.writeBytes(Chunks.encodeFloats(flat, 0, total))
            w.toArray
          case ArrayType(StringType, _) =>
            val arrays = dense.map(_.asInstanceOf[Array[Array[Byte]]])
            val lens = arrays.map(_.length).toArray
            val flat = arrays.toArray.flatten
            val w = new ByteWriter(256)
            val lensBin = Chunks.encodeInts(lens, 0, lens.length)
            w.writeUvarint(lensBin.length)
            w.writeBytes(lensBin)
            w.writeBytes(Chunks.encodeStrings(flat, 0, flat.length))
            w.toArray
          case _: ArrayType =>
            // values flattened + per-row lengths, like the token pipeline
            val arrays = dense.map(_.asInstanceOf[Array[Int]])
            val lens = arrays.map(_.length).toArray
            val total = lens.sum
            val flat = new Array[Int](total)
            var off = 0
            arrays.foreach { a => System.arraycopy(a, 0, flat, off, a.length); off += a.length }
            val w = new ByteWriter(64 + total)
            val lensBin = Chunks.encodeInts(lens, 0, lens.length)
            w.writeUvarint(lensBin.length)
            w.writeBytes(lensBin)
            w.writeBytes(StreamedTokens.encode(flat, lens, lens.length, total)._1)
            w.toArray
        }
        bins(c) =
          if (nullCount == 0) inner
          else {
            val flags = new Array[Boolean](rows)
            var i = 0
            buf.foreach { v => flags(i) = v == null; i += 1 }
            Chunks.wrapNullable(flags, rows, nullCount, inner)
          }
        codecs(c) = Chunks.codecName(bins(c))
        c += 1
      }
      val crc = new java.util.zip.CRC32()
      bins.foreach(crc.update)
      val chunk = GenericChunk(
        part_id = pid,
        chunk_id = (pid.toLong << 32) | chunkSeq,
        num_rows = rows,
        col_names = names,
        col_types = types,
        col_codecs = codecs.toSeq,
        col_nulls = nulls.toSeq,
        enc_bytes = bins.map(_.length.toLong).sum,
        crc32 = crc.getValue,
        cols_bin = bins.toSeq)
      chunkSeq += 1
      chunk
    }
  }

  /** Chunk table → rows with the original schema (schema is read from
    * the chunks themselves — the reader needs no side channel; struct
    * nesting rebuilds from the flattened leaf names). */
  def decode(spark: SparkSession, chunks: Dataset[GenericChunk]): DataFrame = {
    val head = chunks.limit(1).collect()
    if (head.isEmpty) return spark.emptyDataFrame
    val schema = StructType(head(0).col_names.zip(head(0).col_types).map {
      case (n, t) => StructField(n, parseType(t), nullable = true)
    })
    val rowRdd = chunks.rdd.flatMap(decodeChunk)
    val flat = spark.createDataFrame(rowRdd, schema)
    if (schema.fieldNames.exists(_.contains(Sep))) unflatten(flat) else flat
  }

  private def parseType(s: String): DataType = s match {
    case "int" => IntegerType
    case "bigint" => LongType
    case "double" => DoubleType
    case "float" => FloatType
    case "boolean" => BooleanType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamp" => TimestampType
    case "timestamp_ntz" => TimestampNTZType
    case "array<int>" => ArrayType(IntegerType)
    case "array<float>" => ArrayType(FloatType)
    case "array<string>" => ArrayType(StringType)
    case dec if dec.startsWith("decimal(") =>
      val Array(p, sc) = dec.stripPrefix("decimal(").stripSuffix(")").split(",")
      DecimalType(p.trim.toInt, sc.trim.toInt)
    case other => throw new IllegalArgumentException(s"generic decode: $other")
  }

  def decodeChunk(c: GenericChunk): Iterator[Row] = {
    val crc = new java.util.zip.CRC32()
    c.cols_bin.foreach(crc.update)
    require(crc.getValue == c.crc32, s"generic chunk ${c.chunk_id}: CRC mismatch")
    val n = c.col_names.length
    val cols = new Array[Array[Any]](n)
    var ci = 0
    while (ci < n) {
      val (flags, inner) = Chunks.unwrapNullable(c.cols_bin(ci))
      val dense: Array[Any] = c.col_types(ci) match {
        case "int" => Chunks.decodeInts(inner).map(v => v: Any)
        case "bigint" => Chunks.decodeLongs(inner).map(v => v: Any)
        case "double" => Chunks.decodeDoubles(inner).map(v => v: Any)
        case "float" => Chunks.decodeFloats(inner).map(v => v: Any)
        case dec if dec.startsWith("decimal(") =>
          val scale = parseType(dec).asInstanceOf[DecimalType].scale
          Chunks.decodeLongs(inner)
            .map(u => java.math.BigDecimal.valueOf(u, scale): Any)
        case "boolean" => Chunks.decodeBooleans(inner).map(v => v: Any)
        case "string" => Chunks.decodeStrings(inner).map(b => new String(b, UTF_8): Any)
        case "binary" => Chunks.decodeStrings(inner).map(b => b: Any)
        case "date" =>
          Chunks.decodeInts(inner)
            .map(d => org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(d): Any)
        case "timestamp" =>
          Chunks.decodeLongs(inner)
            .map(t => org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(t): Any)
        case "timestamp_ntz" =>
          Chunks.decodeLongs(inner)
            .map(t => org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToLocalDateTime(t): Any)
        case "array<int>" =>
          val r = new ByteReader(inner)
          val lensLen = r.readUvarint().toInt
          val lens = Chunks.decodeInts(r.readBytes(lensLen))
          val flat = StreamedTokens.decode(
            java.util.Arrays.copyOfRange(r.buf, r.pos, r.buf.length), lens)
          val out = new Array[Any](lens.length)
          var off = 0
          var i = 0
          while (i < lens.length) {
            out(i) = java.util.Arrays.copyOfRange(flat, off, off + lens(i)).toSeq
            off += lens(i)
            i += 1
          }
          out
        case "array<string>" =>
          val r = new ByteReader(inner)
          val lensLen = r.readUvarint().toInt
          val lens = Chunks.decodeInts(r.readBytes(lensLen))
          val flat = Chunks.decodeStrings(
            java.util.Arrays.copyOfRange(r.buf, r.pos, r.buf.length))
          val out = new Array[Any](lens.length)
          var off = 0
          var i = 0
          while (i < lens.length) {
            out(i) = java.util.Arrays.copyOfRange(flat, off, off + lens(i))
              .map(b => new String(b, UTF_8)).toSeq
            off += lens(i)
            i += 1
          }
          out
        case "array<float>" =>
          val r = new ByteReader(inner)
          val lensLen = r.readUvarint().toInt
          val lens = Chunks.decodeInts(r.readBytes(lensLen))
          val flat = Chunks.decodeFloats(
            java.util.Arrays.copyOfRange(r.buf, r.pos, r.buf.length))
          val out = new Array[Any](lens.length)
          var off = 0
          var i = 0
          while (i < lens.length) {
            out(i) = java.util.Arrays.copyOfRange(flat, off, off + lens(i)).toSeq
            off += lens(i)
            i += 1
          }
          out
        case other => throw new IllegalArgumentException(s"generic decode: $other")
      }
      cols(ci) =
        if (flags == null) dense
        else {
          val out = new Array[Any](c.num_rows)
          var d = 0
          var i = 0
          while (i < c.num_rows) {
            if (!flags(i)) { out(i) = dense(d); d += 1 }
            i += 1
          }
          out
        }
      ci += 1
    }
    Iterator.tabulate(c.num_rows) { r =>
      Row.fromSeq(Seq.tabulate(n)(ci => cols(ci)(r)))
    }
  }
}
