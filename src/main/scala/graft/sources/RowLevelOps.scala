package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{
  BatchWrite,
  DataWriter,
  DataWriterFactory,
  LogicalWriteInfo,
  PhysicalWriteInfo,
  RowLevelOperation,
  Write,
  WriteBuilder,
  WriterCommitMessage
}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `UPDATE` / `MERGE INTO` / arbitrary-predicate `DELETE` on a
  * columnar store — Spark's GROUP-BASED (copy-on-write) row-level
  * operation API wired onto the store's own replacement commit, the
  * missing DML verbs after B88's key-shaped `DELETE` landed:
  *
  *  - the engine rewrites the DML into `ReplaceData`: read every row
  *    of the AFFECTED groups (groups = the store's data files), apply
  *    the update/merge expressions, write the groups back;
  *  - the operation's scan is the table's own batch scan, so the
  *    DML's WHERE prunes groups through the `_stats` bounds at
  *    planning time exactly like a read — an UPDATE confined in the
  *    clustered key space rewrites O(covering files), not O(store);
  *    the scan records the file set it planned into the operation;
  *  - the write stages one parquet file per task DIRECTLY into
  *    `data/` (unreferenced = invisible until the manifest lands —
  *    the stageParts contract; a crashed DML leaves only vacuum-
  *    sweepable orphans) and commits through
  *    [[ParquetEpochs.commitReplacement]]: ONE manifest listing the
  *    new files, shadowing the affected manifests, carrying their
  *    untouched files — the deleteWhere commit shape, so readers see
  *    old-or-new atomically and time travel keeps the pre-DML view;
  *  - OCC: the commit refuses (retryable [[StoreCommitConflictException]])
  *    when a scanned file is no longer live — a concurrent
  *    compaction/delete/upsert shadowed it between planning and
  *    commit; replaying the whole DML re-plans and converges.
  *
  * Spark's own `OptimizeMetadataOnlyDeleteFromTable` still routes
  * key-shaped DELETEs to the [[ColumnarBatchTable]] metadata path
  * (SupportsDelete); only conditions that genuinely need a rewrite
  * land here. Pure-insert MERGE branches write rows for NO existing
  * group — the commit degenerates to a plain append (nothing
  * shadowed). At 100 TB the shape holds: groups are bounds-pruned,
  * the rewrite is one distributed stage wide as the matched data,
  * and the manifest commit stays a driver-side metadata rename.
  */
private[graft] class ColumnarCowOperation(
    path: String,
    tableSchema: StructType,
    cmd: RowLevelOperation.Command
) extends RowLevelOperation {

  /** Set by the scan at partition planning (execution happens before
    * the write's commit); the commit's replaced-group set.
    */
  @volatile private[sources] var scannedFiles: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ColumnarBatchTable.scanBuilder(path, tableSchema, pinned = None,
      onPlan = files => scannedFiles = Some(files))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // fail fast on the driver before any task writes: the DML writes
    // the table schema, which must be the store's recorded signature
    ParquetEpochs.requireWritable(path, info.schema())
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ColumnarCowBatchWrite(
          ColumnarCowOperation.this, path, info.schema())
      }
    }
  }
}

private[graft] class ColumnarCowBatchWrite(
    op: ColumnarCowOperation,
    path: String,
    writeSchema: StructType
) extends BatchWrite {

  private val conf: SerializableConfiguration = {
    val c = new Configuration(ContentStore.driverHadoopConf())
    // ParquetWriteSupport.init reads these from the task-side conf;
    // mirror the active session's values (ParquetFileFormat's
    // prepareWrite contract — API use, the reader-side Bridge's twin)
    val sql = SQLConf.get
    c.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.getConf(SQLConf.PARQUET_WRITE_LEGACY_FORMAT).toString)
    c.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.getConf(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE).toString)
    c.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    c.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    c.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    c.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    ParquetWriteSupport.setSchema(writeSchema, c)
    new SerializableConfiguration(c)
  }

  private val codec: String =
    SQLConf.get.getConf(SQLConf.PARQUET_COMPRESSION).toUpperCase(java.util.Locale.ROOT)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ColumnarCowWriterFactory(path, conf, codec, writeSchema,
      ContentStore.recordedDataShards(path, conf.value), UUID.randomUUID().toString)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.collect { case StoreFilesCommitMsg(fs, _) => fs }.flatten.toSeq
    val replaced = op.scannedFiles.getOrElse {
      if (newFiles.isEmpty) return
      throw new IllegalStateException(
        s"row-level write on $path committed before its scan planned — cannot " +
          "determine the replaced group set")
    }
    if (newFiles.isEmpty && replaced.isEmpty) return
    ParquetEpochs.commitReplacement(path, newFiles, replaced.toSet): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val files              = messages.collect { case StoreFilesCommitMsg(fs, _) => fs }.flatten
    val (filesystem, root) = ContentStore.fs(path, conf.value)
    files.foreach(f => filesystem.delete(new Path(root, s"data/$f"), false): Unit)
  }
}

private[graft] class ColumnarCowWriterFactory(
    path: String,
    conf: SerializableConfiguration,
    codec: String,
    writeSchema: StructType,
    shards: Int,
    uuid: String
) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ColumnarCowDataWriter(path, conf.value, codec, writeSchema, shards, uuid,
      partitionId, taskId)
}

/** Per-task parquet writer straight into the store's `data/` dir —
  * files are store-unique (uuid + partition + task attempt) and
  * INVISIBLE until a manifest lists them, so speculative duplicate
  * attempts and crashed tasks leave only unreferenced orphans that
  * vacuum sweeps. An empty task deletes its file and commits nothing.
  */
private[graft] class ColumnarCowDataWriter(
    path: String,
    conf: Configuration,
    codec: String,
    writeSchema: StructType,
    shards: Int,
    uuid: String,
    partitionId: Int,
    taskId: Long
) extends DataWriter[InternalRow] {

  // `ReplaceData` feeds the raw query rows, which carry a LEADING
  // `__row_operation` metrics column the engine only strips when the
  // operation requests metadata columns (the projecting write task);
  // shift past it with the engine's own projection. A plain-width row
  // (future engine change) passes through untouched.
  private val shifted = org.apache.spark.sql.catalyst.ProjectingInternalRow(
    writeSchema, (1 to writeSchema.length).toList)

  private val name =
    ContentStore.shardedName(f"pq-cow-$uuid-$partitionId%05d-$taskId.parquet", shards)
  private val file = {
    val (filesystem, root) = ContentStore.fs(path, conf)
    val p                  = new Path(root, s"data/$name")
    filesystem.mkdirs(p.getParent): Unit
    p
  }
  private var rows = 0L
  private val writer: ParquetWriter[InternalRow] =
    new ColumnarCowDataWriter.RowWriterBuilder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.valueOf(codec))
      .build()

  override def write(record: InternalRow): Unit = {
    if (record.numFields == writeSchema.length + 1) {
      shifted.project(record); writer.write(shifted)
    } else if (record.numFields == writeSchema.length) writer.write(record)
    else
      throw new IllegalStateException(
        s"row-level write on $path: row has ${record.numFields} fields for " +
          s"write schema ${writeSchema.catalogString}")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (rows == 0L) {
      val (filesystem, _) = ContentStore.fs(path, conf)
      filesystem.delete(file, false): Unit
      StoreFilesCommitMsg(Nil, 0L)
    } else StoreFilesCommitMsg(Seq(name), rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    val (filesystem, _) = ContentStore.fs(path, conf)
    filesystem.delete(file, false): Unit
  }

  override def close(): Unit = ()
}

private[graft] object ColumnarCowDataWriter {
  private class RowWriterBuilder(out: HadoopOutputFile)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](out) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}

/** K-V twin of [[ColumnarCowOperation]]: same scan-records-groups /
  * write-replaces-groups protocol, but the writers are the store's
  * OWN DSv2 line-format writers (fresh-UUID staging, key bounds in
  * the commit message) and the commit is the deleteKeys manifest
  * shape via [[ContentStoreWrite.commitReplacement]].
  */
private[graft] class KvCowOperation(
    path: String,
    cmd: RowLevelOperation.Command
) extends RowLevelOperation {

  @volatile private[sources] var scannedFiles: Option[Seq[String]] = None

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ContentStoreTable(path, bucketedRead = 0, defaultManifests = None,
      planHook = Some(files => scannedFiles = Some(files)))
      .newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val names = info.schema().fieldNames.toSeq
    require(names == Seq("result_key", "payload"),
      s"row-level write on K-V store $path: unexpected schema ${info.schema().catalogString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new KvCowBatchWrite(KvCowOperation.this, path, info.schema())
      }
    }
  }
}

private[graft] class KvCowBatchWrite(
    op: KvCowOperation,
    path: String,
    writeSchema: StructType
) extends BatchWrite {

  private val conf =
    new SerializableConfiguration(ContentStore.driverHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvCowWriterFactory(path, conf, writeSchema,
      ContentStore.recordedDataShards(path, conf.value))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.collect { case m: StoreCommitMsg if m.rows > 0 => m.file }
    val replaced = op.scannedFiles.getOrElse {
      if (newFiles.isEmpty) return
      throw new IllegalStateException(
        s"row-level write on $path committed before its scan planned — cannot " +
          "determine the replaced group set")
    }
    if (newFiles.isEmpty && replaced.isEmpty) return
    ContentStoreWrite.commitReplacement(path, messages, replaced.toSet, conf.value)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ContentStoreWrite.deleteFiles(path, messages, conf.value)
}

private[graft] class KvCowWriterFactory(
    path: String,
    conf: SerializableConfiguration,
    writeSchema: StructType,
    dataShards: Int
) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvCowDataWriter(
      new StoreDataWriter(path, 0, 1, conf.value, dataShards), writeSchema)
}

/** Shifts past `ReplaceData`'s leading `__row_operation` metrics
  * column (the same no-metadata engine channel the columnar writer
  * handles) and delegates to the store's own line-format writer with
  * (key, payload) at ordinals (0, 1).
  */
private[graft] class KvCowDataWriter(
    inner: DataWriter[InternalRow],
    writeSchema: StructType
) extends DataWriter[InternalRow] {

  private val shifted = org.apache.spark.sql.catalyst.ProjectingInternalRow(
    writeSchema, (1 to writeSchema.length).toList)

  override def write(record: InternalRow): Unit =
    if (record.numFields == writeSchema.length + 1) {
      shifted.project(record); inner.write(shifted)
    } else if (record.numFields == writeSchema.length) inner.write(record)
    else
      throw new IllegalStateException(
        s"row-level K-V write: row has ${record.numFields} fields for " +
          s"write schema ${writeSchema.catalogString}")

  override def commit(): WriterCommitMessage = inner.commit()
  override def abort(): Unit                 = inner.abort()
  override def close(): Unit                 = inner.close()
}
