package graft

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Minimal DataSource V2 micro-batch source for the transport-seam test:
  * serves the lines passed in the newline-separated `lines` option as a
  * one-batch stream with a `value` string column — the same
  * registration/resolution path (format string → TableProvider →
  * MicroBatchStream) a Kafka connector takes, with none of the
  * infrastructure. Test scope only. */
class FakeLinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeLinesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FakeLinesTable(properties.getOrDefault("lines", ""))
}

object FakeLinesSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class FakeLinesTable(lines: String) extends Table with SupportsRead {
  override def name(): String = "fake_lines"
  override def schema(): StructType = FakeLinesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FakeLinesSource.schema
        override def toMicroBatchStream(loc: String): MicroBatchStream =
          new FakeLinesStream(lines.split('\n').filter(_.nonEmpty))
      }
    }
}

case class FakeLinesOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

case class FakeLinesPartition(lines: Array[String]) extends InputPartition

class FakeLinesStream(lines: Array[String]) extends MicroBatchStream {
  override def initialOffset(): Offset = FakeLinesOffset(0)
  override def latestOffset(): Offset = FakeLinesOffset(lines.length.toLong)
  override def deserializeOffset(json: String): Offset =
    FakeLinesOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeLinesOffset].n.toInt
    val e = end.asInstanceOf[FakeLinesOffset].n.toInt
    Array(FakeLinesPartition(lines.slice(s, e)))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] = {
        val ls = partition.asInstanceOf[FakeLinesPartition].lines
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < ls.length }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(ls(i)))
          override def close(): Unit = ()
        }
      }
    }
}
