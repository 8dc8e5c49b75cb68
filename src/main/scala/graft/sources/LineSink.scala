package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal-but-real DataSource V2 SINK — the write half of the
  * connector story beside [[RangeSource]]'s read half. What it
  * demonstrates is the TWO-PHASE COMMIT PROTOCOL every production
  * sink implements, not a storage format (rows land as one CSV-ish
  * line each; the encoding is the pluggable part, the protocol is
  * the point):
  *
  *  - each task's [[DataWriter]] writes to a PRIVATE staging file
  *    under `_staging/<queryId>/` — concurrent tasks (and speculative
  *    retries of the same task) never collide because the file name
  *    carries (partitionId, taskId);
  *  - a task that fails calls `abort()` → its staging file is deleted
  *    and NOTHING it wrote is observable;
  *  - only the driver's `commit(messages)` publishes: every staged
  *    file named in a commit message is atomically renamed into the
  *    target directory, then a `_SUCCESS` marker lands LAST — a
  *    reader that requires the marker never sees a partial write;
  *  - a job-level `abort` deletes the whole staging directory.
  *
  * At 100 TB this is exactly the FileCommitProtocol / Iceberg-style
  * snapshot-commit shape: task isolation via staging, a single
  * driver-side publish, idempotent cleanup. Usage:
  *
  * {{{
  * df.write.format("graft.sources.LineSink")
  *   .mode("append").option("path", dir).save()
  * }}}
  *
  * DEPLOYMENT LIMITATION (stated, not hidden): staging and the commit
  * rename go through `java.io.File`/`Files.move`, so this sink is
  * correct only where driver and executors share ONE local filesystem
  * — local[*] and single-node, i.e. its role as the protocol
  * demonstrator and test sink. On a real cluster the same protocol
  * must route every path through the session's Hadoop `FileSystem`
  * (and on an object store the rename becomes a manifest/snapshot
  * commit); writing that driver was deliberately out of scope — the
  * parquet/ORC/JDBC paths in [[graft.pipeline.EtlJob]] are the
  * production sinks. Line encoding: field separators and newlines in
  * values are backslash-escaped (`\\` `\,` `\n` `\r`), so arbitrary
  * strings round-trip; [[LineSink.unescapeLine]] is the matching
  * reader used by the spec.
  */
object LineSink {
  /** Escape one field: backslash first, then the field separator and
    * line breaks — the minimal set that makes the line format
    * injective for arbitrary strings. */
  private[sources] def escapeField(v: String): String =
    v.replace("\\", "\\\\").replace(",", "\\,")
      .replace("\n", "\\n").replace("\r", "\\r")

  /** Split one encoded line back into fields, undoing [[escapeField]]
    * (shared with the spec so the contract is tested, not assumed). */
  private[graft] def unescapeLine(line: String): Seq[String] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) {
        line.charAt(i + 1) match {
          case '\\' => cur += '\\'
          case ','  => cur += ','
          case 'n'  => cur += '\n'
          case 'r'  => cur += '\r'
          case other => cur += '\\'; cur += other
        }
        i += 2
      } else if (c == ',') {
        fields += cur.result(); cur.clear(); i += 1
      } else { cur += c; i += 1 }
    }
    fields += cur.result()
    fields.toSeq
  }
}

class LineSink extends TableProvider {
  // a pure sink cannot infer a schema from storage; Spark supplies the
  // query's schema through getTable when externalMetadata is supported
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LineSinkTable(properties.get("path"), schema)
}

private[sources] class LineSinkTable(path: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "LineSink requires option(\"path\")")
  override def name(): String = s"graft_line_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LineBatchWrite(path, info.queryId(), info.schema())
      }
    }
}

private[graft] case class LineCommitMessage(stagedFile: String)
  extends WriterCommitMessage

private[graft] class LineBatchWrite(path: String, queryId: String,
    schema: StructType) extends BatchWrite {
  private def stagingDir = new java.io.File(path, s"_staging/$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    stagingDir.mkdirs()
    new LineWriterFactory(path, queryId, schema)
  }

  /** Driver-side publish: rename every staged file into the target,
    * then the `_SUCCESS` marker LAST. Rename is atomic on a posix
    * filesystem; on an object store this step becomes the manifest/
    * snapshot commit — same protocol, different primitive. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new java.io.File(path)
    target.mkdirs()
    messages.foreach { case LineCommitMessage(staged) =>
      val src = new java.io.File(staged)
      val dst = new java.io.File(target, src.getName)
      java.nio.file.Files.move(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    cleanStaging()
    java.nio.file.Files.write(new java.io.File(target, "_SUCCESS").toPath,
      Array.empty[Byte])
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanStaging()

  /** Remove this query's staging dir, and the shared `_staging` parent
    * once the last concurrent query's dir is gone. */
  private def cleanStaging(): Unit = {
    deleteRecursively(stagingDir)
    val parent = stagingDir.getParentFile
    if (parent.isDirectory && parent.listFiles().isEmpty) parent.delete()
    ()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }
}

private[sources] class LineWriterFactory(path: String, queryId: String,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LineDataWriter(path, queryId, schema, partitionId, taskId)
}

/** Task-side writer: private staging file, observable only after the
  * driver commit renames it into place. */
private[sources] class LineDataWriter(path: String, queryId: String,
    schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val staged = new java.io.File(
    new java.io.File(path, s"_staging/$queryId"),
    f"part-$partitionId%05d-$taskId.txt")
  private lazy val out = {
    staged.getParentFile.mkdirs()
    new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(staged)))
  }

  override def write(row: InternalRow): Unit = {
    val line = schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) ""
      else LineSink.escapeField(String.valueOf(row.get(i, f.dataType)))
    }.mkString(",")
    out.println(line)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    LineCommitMessage(staged.getAbsolutePath)
  }

  override def abort(): Unit = {
    out.close()
    staged.delete(); ()
  }

  override def close(): Unit = ()
}
