package graft.sources

import java.util.Base64

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch,
  InputPartition,
  PartitionReader,
  PartitionReaderFactory,
  Scan,
  ScanBuilder,
  SupportsPushDownRequiredColumns
}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 producer twin of kinesis_stream/main.go: a bounded,
  * deterministic stream of Kinesis-style base64(JSON {Num1,Num2})
  * envelopes, generated executor-side across `numPartitions` splits.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.ProblemSource")
  *   .option("numRows", 10000).option("numPartitions", 32).load()
  * }}}
  *
  * Demonstrates the connector surface a real source needs: schema
  * inference, capability declaration, planned input partitions (rows
  * are generated where they are consumed — nothing flows through the
  * driver), and column pruning (`SupportsPushDownRequiredColumns`):
  * `select(seq)` never builds an envelope string.
  */
class ProblemSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ProblemSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table = new ProblemTable()
}

object ProblemSource {
  val Schema: StructType = StructType(
    Seq(
      StructField("seq", LongType, nullable = false),
      StructField("partition_key", StringType, nullable = false),
      StructField("data", StringType, nullable = false)
    )
  )

  /** The deterministic problem for a sequence number (rand 0..99 in
    * the reference, kinesis_stream/main.go:24-27).
    */
  def num1(seq: Long): Long = seq % 100
  def num2(seq: Long): Long = (seq * 7 + 3) % 100

  def envelope(seq: Long): String =
    Base64.getEncoder.encodeToString(
      s"""{"Num1":${num1(seq)},"Num2":${num2(seq)}}""".getBytes("UTF-8")
    )
}

private class ProblemTable extends Table with SupportsRead {
  override def name(): String          = "graft_problems"
  override def schema(): StructType    = ProblemSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ProblemScanBuilder(
      options.getLong("numRows", 1000L),
      options.getInt("numPartitions", 4)
    )
}

private class ProblemScanBuilder(numRows: Long, numPartitions: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {

  private var required: StructType = ProblemSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch           = this

    override def planInputPartitions(): Array[InputPartition] = {
      val per = math.max(1L, (numRows + numPartitions - 1) / numPartitions)
      (0L until numRows by per).map(s => ProblemRange(s, math.min(s + per, numRows)): InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new ProblemReaderFactory(required)
  }
}

private case class ProblemRange(start: Long, end: Long) extends InputPartition

private class ProblemReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[ProblemRange]
    new PartitionReader[InternalRow] {
      private var seq            = range.start - 1
      private val fields         = schema.fieldNames
      override def next(): Boolean = { seq += 1; seq < range.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "seq"           => seq
          case "partition_key" => UTF8String.fromString((seq % 16).toString)
          case "data"          => UTF8String.fromString(ProblemSource.envelope(seq))
        })
      override def close(): Unit = ()
    }
  }
}
