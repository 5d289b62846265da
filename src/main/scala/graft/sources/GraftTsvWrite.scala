package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Batch WRITE path of the graft-tsv connector — the sink half of the
  * DSv2 seam, and the Spark-first restatement of the reference's only
  * output contract: tab-separated text (TextOutputFormat K\tV lines,
  * reference WordCount.java:61, TopkCommonWords.java:174). Where the
  * reference's sink is a single reducer writing one file, this one keeps
  * the write DISTRIBUTED and makes it EXACTLY-ONCE-EFFECT via the DSv2
  * two-phase commit:
  *
  *   - each task writes to a DOT-PREFIXED staging file in the target
  *     directory (`.staging-<query>-<partition>-<task>`) — invisible to
  *     the read path, which filters `_`/`.` names (GraftTsvScan), so a
  *     concurrent reader never sees a half-written file;
  *   - the task's commit MESSAGE carries the staging name; only the
  *     driver-side `BatchWrite.commit` renames staged files to visible
  *     `part-NNNNN.tsv` names — a speculative or failed duplicate task
  *     attempt is simply never renamed (its message is not in the commit
  *     set; `abort` sweeps leftovers);
  *   - overwrite (`SupportsTruncate`) deletes the PREVIOUS visible files
  *     inside `commit`, after the new generation staged successfully —
  *     the old data stays readable until the new data is complete.
  *
  * Values serialize by the connector's documented text conventions
  * (GraftTsv.scala scaladoc): NULL → empty field, dates → ISO, and the
  * writer REJECTS a string containing the delimiter or a newline rather
  * than silently corrupting the line framing (the no-embedded-delimiter
  * contract, enforced where it can first be seen).
  */
final class GraftTsvWriteBuilder(
    schema: StructType,
    path: String,
    delimiter: Char,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var truncateOnCommit = false

  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftTsvBatchWrite(schema, path, delimiter, truncateOnCommit,
        info.queryId())
  }
}

/** Driver-side job coordinator: publishes committed task files, cleans
  * up everything else. */
final class GraftTsvBatchWrite(
    schema: StructType,
    path: String,
    delimiter: Char,
    truncate: Boolean,
    queryId: String) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftTsvWriterFactory(schema, path, delimiter, queryId)

  private def fs(): FileSystem = new Path(path).getFileSystem(new Configuration())

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs()
    val dir = new Path(path)
    val staged = messages.collect {
      case GraftTsvCommitMessage(Some(name)) => name
    }
    // truncate AFTER the new generation is fully staged: old files stay
    // readable up to this point
    if (truncate && f.exists(dir))
      f.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith(".") && !n.startsWith("_"))
          f.delete(st.getPath, false)
      }
    // job-unique part names: an APPEND must never rename onto a part
    // published by an earlier job (local-FS rename onto an existing
    // target silently fails and would strand the staged file). rename's
    // Boolean is CHECKED — an unpublished staged file is data loss, the
    // one failure a commit protocol exists to prevent.
    val job = queryId.replaceAll("[^a-zA-Z0-9]", "").take(8)
    staged.zipWithIndex.foreach { case (name, i) =>
      val target = new Path(dir, f"part-$job-$i%05d.tsv")
      if (!f.rename(new Path(dir, name), target))
        throw new IllegalStateException(
          s"graft-tsv commit: failed to publish staged $name as $target")
    }
    sweep(f, dir) // staging files from failed/speculative attempts
    f.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweep(fs(), new Path(path))

  private def sweep(f: FileSystem, dir: Path): Unit =
    if (f.exists(dir))
      f.listStatus(dir).foreach { st =>
        if (st.getPath.getName.startsWith(s".staging-$queryId"))
          f.delete(st.getPath, false)
      }
}

final case class GraftTsvCommitMessage(staged: Option[String])
    extends WriterCommitMessage

final class GraftTsvWriterFactory(
    schema: StructType,
    path: String,
    delimiter: Char,
    queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftTsvDataWriter(schema, path, delimiter, queryId, partitionId, taskId)
}

/** Task-side writer: serialize to a staging file, hand the name back in
  * the commit message. An empty partition stages nothing (no empty
  * part files). */
final class GraftTsvDataWriter(
    schema: StructType,
    path: String,
    delimiter: Char,
    queryId: String,
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  // task attempt id in the name keeps concurrent speculative attempts of
  // the same partition from colliding on one staging file
  private val stagedName =
    s".staging-$queryId-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}"
  private var out: java.io.BufferedWriter = _
  private lazy val fs: FileSystem = new Path(path).getFileSystem(new Configuration())

  private def ensureOpen(): Unit = if (out == null) {
    val dir = new Path(path)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(new Path(dir, stagedName), true), "UTF-8"))
  }

  private def fieldString(row: InternalRow, i: Int): String = {
    if (row.isNullAt(i)) return ""
    schema.fields(i).dataType match {
      case StringType =>
        val s = row.getUTF8String(i).toString
        if (s.indexOf(delimiter) >= 0 || s.indexOf('\n') >= 0 || s.indexOf('\r') >= 0)
          throw new IllegalArgumentException(
            s"graft-tsv: value in column '${schema.fields(i).name}' contains " +
              "the delimiter or a newline; line-framed text cannot hold it")
        s
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case DateType => java.time.LocalDate.ofEpochDay(row.getInt(i)).toString
      case other =>
        throw new IllegalArgumentException(s"graft-tsv: unsupported write type $other")
    }
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(delimiter)
      sb.append(fieldString(row, i))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftTsvCommitMessage(if (out != null) Some(stagedName) else None)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); fs.delete(new Path(path, stagedName), false) }
  }

  override def close(): Unit = ()
}
