package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar (vectorized) read path of the graft-tsv connector: the same
  * byte-range split protocol as [[GraftTsvPartitionReader]], emitting
  * 4096-row [[ColumnarBatch]]es of `OnHeapColumnVector`s instead of one
  * `InternalRow` per line. Two structural wins over the row path:
  *
  *   - BATCH BOUNDARY: Spark's `ColumnarToRow` bridge iterates the batch
  *     inside whole-stage codegen (one virtual call per 4096 rows, not
  *     one `next()`/`get()` pair per row);
  *   - BYTE-LEVEL PARSING: fields are carved and parsed straight from
  *     the line's UTF-8 bytes — longs/ints/dates by a digit loop,
  *     strings copied bytes→vector — so the hot loop allocates no
  *     `String` and no `UTF8String` per cell (the row path pays both).
  *     Doubles fall back to `Double.parseDouble` (its grammar is not
  *     worth reimplementing — and exactness there is a parity
  *     requirement).
  *
  * Pushed and runtime predicates are evaluated per LINE before anything
  * is appended (same compiled tests, same Spark comparator semantics as
  * the row path — a batch never contains a dropped row), and numeric
  * parse results are bit-identical to the row path's
  * `Long.parseLong`/`LocalDate.parse` by construction: the digit loops
  * replicate their overflow/validation behavior and throw on anything
  * unusual, falling back where the fast grammar ends. Enabled by default
  * (`vectorized.read=false` reverts to the row reader); the pushed
  * COUNT(*) path stays row-based (its output is one count row per
  * split, nothing to vectorize).
  */
final class GraftTsvColumnarReader(
    split: GraftTsvInputPartition,
    fullSchema: StructType,
    required: StructType,
    pushed: Array[Filter],
    delimiter: Char,
    header: Boolean,
    hconf: SerializableHadoopConf,
    partCols: Seq[String] = Seq.empty) extends PartitionReader[ColumnarBatch] {

  private val BatchRows = 4096
  private val end = split.start + split.length
  private val delimByte: Byte = delimiter.toByte

  // ---- schema/line position mapping (identical to the row reader) ----
  private val partSchemaIdx: Array[Int] = partCols.map(fullSchema.fieldIndex).toArray
  private val isPart: Array[Boolean] = {
    val a = new Array[Boolean](fullSchema.length)
    partSchemaIdx.foreach(a(_) = true); a
  }
  private val lineFieldSchemaIdx: Array[Int] =
    fullSchema.fields.indices.filterNot(isPart).toArray
  private val schemaToLinePos: Array[Int] = {
    val a = Array.fill(fullSchema.length)(-1)
    lineFieldSchemaIdx.zipWithIndex.foreach { case (si, lp) => a(si) = lp }
    a
  }
  private val outIdx: Array[Int] =
    required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val filterCols: Array[String] = pushed.flatMap(_.references).distinct
  private val maxNeeded: Int = {
    val needed = (outIdx ++ filterCols.map(fullSchema.fieldIndex))
      .distinct.filterNot(isPart).map(schemaToLinePos)
    if (needed.isEmpty) -1 else needed.max
  }
  private val emptyLineIsRow: Boolean = lineFieldSchemaIdx.length == 1

  // partition values: split-constant, converted once
  private val partVal = new Array[Any](fullSchema.length)
  partSchemaIdx.zipWithIndex.foreach { case (si, j) =>
    val raw = split.partVals(j)
    partVal(si) =
      if (raw == null) null
      else GraftTsvPushdown.convertCell(fullSchema(si).dataType, raw)
  }

  // compiled predicates: partition-column ones are split-constant
  private val (preds, splitAlive): (Array[(Int, Any => Boolean)], Boolean) = {
    val partSet = partSchemaIdx.toSet
    val (partOnly, perLine) = pushed
      .map(GraftTsvPushdown.compile(fullSchema, _))
      .partition { case (i, _) => partSet.contains(i) }
    (perLine, partOnly.forall { case (i, test) => test(partVal(i)) })
  }

  // ---- IO (same realignment protocol as the row reader) ----
  private val fs: FileSystem = new Path(split.file).getFileSystem(hconf.value)
  private val stream: FSDataInputStream = fs.open(new Path(split.file))
  private var pos: Long = split.start
  private val lineReader: LineReader = {
    if (split.start != 0) {
      stream.seek(split.start)
      val lr = new LineReader(stream)
      pos += lr.readLine(new Text())
      lr
    } else {
      val lr = new LineReader(stream)
      if (header) pos += lr.readLine(new Text())
      lr
    }
  }
  private val text = new Text()
  private var linesRead = 0L
  private var rowsEmitted = 0L

  // ---- vectors ----
  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(BatchRows, required)
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))
  private var drained = false

  // per-line field byte offsets, indexed by line position; -1 = missing
  private val fFrom = new Array[Int](math.max(maxNeeded + 1, 1))
  private val fTo = new Array[Int](math.max(maxNeeded + 1, 1))

  // columns both FILTERED and PROJECTED would otherwise parse twice per
  // surviving row (boxed for the predicate, again from bytes in
  // appendRow) — cache the predicate's parsed value and unbox it in the
  // append instead. Numeric/date only: a string's "parse" is one
  // UTF8String wrap, and appending from a cached UTF8String would COPY
  // (getBytes on an offset view) where the direct byte append doesn't.
  private val reuseFromScratch: Array[Boolean] = {
    val out = outIdx.toSet
    val a = new Array[Boolean](fullSchema.length)
    preds.foreach { case (si, _) =>
      if (out.contains(si) && fullSchema(si).dataType != StringType) a(si) = true
    }
    a
  }
  private val scratch = new Array[Any](fullSchema.length)

  private def scanFields(b: Array[Byte], len: Int): Unit = {
    var field = 0
    var from = 0
    while (field <= maxNeeded) {
      if (from > len) { fFrom(field) = -1; fTo(field) = -1 }
      else {
        var to = from
        while (to < len && b(to) != delimByte) to += 1
        fFrom(field) = from
        fTo(field) = to
        from = to + 1
      }
      field += 1
    }
  }

  /** Internal (boxed) value of schema column `si` from the scanned
    * offsets — only used for predicate evaluation; appends go straight
    * to the vectors unboxed. */
  private def internalValue(b: Array[Byte], si: Int): Any = {
    val p = schemaToLinePos(si)
    if (p < 0) return partVal(si) // partition column
    val from = fFrom(p)
    if (from < 0) return null // line ended before this field
    val to = fTo(p)
    val dt = fullSchema(si).dataType
    if (from == to && dt != StringType) return null
    dt match {
      case StringType => UTF8String.fromBytes(b, from, to - from)
      case LongType => GraftTsvColumnarReader.parseLong(b, from, to)
      case IntegerType => GraftTsvColumnarReader.parseInt(b, from, to)
      case DateType => GraftTsvColumnarReader.parseDateDays(b, from, to)
      case DoubleType =>
        java.lang.Double.parseDouble(new String(b, from, to - from,
          java.nio.charset.StandardCharsets.US_ASCII))
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  private def appendRow(b: Array[Byte], rowId: Int): Unit = {
    var k = 0
    while (k < outIdx.length) {
      val si = outIdx(k)
      val v = vectors(k)
      val p = schemaToLinePos(si)
      if (p < 0) {
        // partition column: split-constant internal value
        val c = partVal(si)
        if (c == null) v.putNull(rowId)
        else fullSchema(si).dataType match {
          case StringType =>
            val u = c.asInstanceOf[UTF8String].getBytes
            v.putByteArray(rowId, u, 0, u.length)
          case LongType => v.putLong(rowId, c.asInstanceOf[Long])
          case IntegerType | DateType => v.putInt(rowId, c.asInstanceOf[Int])
          case DoubleType => v.putDouble(rowId, c.asInstanceOf[Double])
          case other => throw new IllegalArgumentException(s"$other")
        }
      } else if (reuseFromScratch(si)) {
        // parsed moments ago for the predicate — unbox, don't re-parse
        val c = scratch(si)
        if (c == null) v.putNull(rowId)
        else fullSchema(si).dataType match {
          case LongType => v.putLong(rowId, c.asInstanceOf[Long])
          case IntegerType | DateType => v.putInt(rowId, c.asInstanceOf[Int])
          case DoubleType => v.putDouble(rowId, c.asInstanceOf[Double])
          case other => throw new IllegalArgumentException(s"$other")
        }
      } else {
        val from = fFrom(p)
        val to = fTo(p)
        val dt = fullSchema(si).dataType
        if (from < 0 || (from == to && dt != StringType)) v.putNull(rowId)
        else dt match {
          case StringType => v.putByteArray(rowId, b, from, to - from)
          case LongType =>
            v.putLong(rowId, GraftTsvColumnarReader.parseLong(b, from, to))
          case IntegerType =>
            v.putInt(rowId, GraftTsvColumnarReader.parseInt(b, from, to))
          case DateType =>
            v.putInt(rowId, GraftTsvColumnarReader.parseDateDays(b, from, to))
          case DoubleType =>
            v.putDouble(rowId, java.lang.Double.parseDouble(
              new String(b, from, to - from,
                java.nio.charset.StandardCharsets.US_ASCII)))
          case other => throw new IllegalArgumentException(s"$other")
        }
      }
      k += 1
    }
  }

  override def next(): Boolean = {
    if (drained || !splitAlive) return false
    var n = 0
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    while (n < BatchRows && pos <= end) {
      val bytes = lineReader.readLine(text)
      if (bytes == 0) { drained = true; pos = end + 1 }
      else {
        pos += bytes
        linesRead += 1
        val len = text.getLength
        if (len > 0 || emptyLineIsRow) {
          val b = text.getBytes
          scanFields(b, len)
          var pass = true
          var j = 0
          while (pass && j < preds.length) {
            val (si, test) = preds(j)
            val v = internalValue(b, si)
            if (reuseFromScratch(si)) scratch(si) = v
            if (!test(v)) pass = false
            j += 1
          }
          if (pass) {
            appendRow(b, n)
            n += 1
            rowsEmitted += 1
          }
        }
      }
    }
    if (n == 0) false
    else { batch.setNumRows(n); true }
  }

  override def get(): ColumnarBatch = batch

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftTsvTaskMetric("linesRead", linesRead),
      GraftTsvTaskMetric("rowsEmitted", rowsEmitted))

  override def close(): Unit = {
    batch.close() // closes the vectors
    lineReader.close()
  }
}

object GraftTsvColumnarReader {

  private def nfe(b: Array[Byte], from: Int, to: Int) =
    new NumberFormatException(
      s"graft-tsv: not a number: '${new String(b, from, to - from, "UTF-8")}'")

  /** `Long.parseLong` over a byte slice: allocation-free digit loop for
    * the ASCII grammar every writer produces (same overflow checks,
    * negative accumulation so Long.MinValue parses); anything the fast
    * grammar rejects — including non-ASCII Unicode digits, which
    * `Long.parseLong` accepts via `Character.digit` — falls back to the
    * REAL `Long.parseLong`, so accepted inputs and thrown rejections
    * match the row reader's `convertCell` exactly (same pattern as
    * [[parseDateDays]]). */
  def parseLong(b: Array[Byte], from: Int, to: Int): Long = {
    if (from >= to) return parseLongSlow(b, from, to)
    var i = from
    var negative = false
    b(i) match {
      case '-' => negative = true; i += 1
      case '+' => i += 1
      case _ =>
    }
    if (i >= to) return parseLongSlow(b, from, to)
    val limit = if (negative) Long.MinValue else -Long.MaxValue
    val multmin = limit / 10
    var result = 0L
    while (i < to) {
      val d = b(i) - '0'
      if (d < 0 || d > 9) return parseLongSlow(b, from, to)
      if (result < multmin) return parseLongSlow(b, from, to)
      result *= 10
      if (result < limit + d) return parseLongSlow(b, from, to)
      result -= d
      i += 1
    }
    if (negative) result else -result
  }

  /** The row path's grammar, verbatim — the arbiter for anything the
    * byte loop declines (genuinely malformed input throws the same
    * NumberFormatException here that the row reader throws). */
  private def parseLongSlow(b: Array[Byte], from: Int, to: Int): Long =
    java.lang.Long.parseLong(
      new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8))

  /** `Integer.parseInt` over a byte slice: parseLong + range check. */
  def parseInt(b: Array[Byte], from: Int, to: Int): Int = {
    val v = parseLong(b, from, to)
    if (v < Int.MinValue || v > Int.MaxValue) throw nfe(b, from, to)
    v.toInt
  }

  /** ISO `yyyy-MM-dd` → epoch day. Fast path for the exact 10-byte
    * zero-padded form every writer produces; anything else (long years,
    * signs) falls back to `LocalDate.parse`, so accepted inputs match
    * the row reader exactly. `LocalDate.of` validates ranges the same
    * way the parser does. */
  def parseDateDays(b: Array[Byte], from: Int, to: Int): Int = {
    def digit(i: Int): Int = {
      val d = b(i) - '0'
      if (d < 0 || d > 9) -1 else d
    }
    if (to - from == 10 && b(from + 4) == '-' && b(from + 7) == '-') {
      val y3 = digit(from); val y2 = digit(from + 1)
      val y1 = digit(from + 2); val y0 = digit(from + 3)
      val m1 = digit(from + 5); val m0 = digit(from + 6)
      val d1 = digit(from + 8); val d0 = digit(from + 9)
      if (y3 >= 0 && y2 >= 0 && y1 >= 0 && y0 >= 0 &&
          m1 >= 0 && m0 >= 0 && d1 >= 0 && d0 >= 0)
        return java.time.LocalDate.of(
          y3 * 1000 + y2 * 100 + y1 * 10 + y0,
          m1 * 10 + m0, d1 * 10 + d0).toEpochDay.toInt
    }
    java.time.LocalDate.parse(
      new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8))
      .toEpochDay.toInt
  }
}
