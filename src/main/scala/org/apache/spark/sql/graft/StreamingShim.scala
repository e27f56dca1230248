package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The ONE internal hook a V1 streaming `Source` needs and Spark does
  * not expose publicly: `getBatch` must return a DataFrame whose
  * logical plan carries `isStreaming = true` (MicroBatchExecution
  * asserts it), and the only constructor for that is
  * `SparkSession.internalCreateDataFrame(…, isStreaming = true)`,
  * which is `private[sql]`. This object lives under
  * `org.apache.spark.sql` purely to reach it — the standard connector
  * shim (file-stream and early Delta sources use the same call); no
  * other internals are touched. */
object StreamingShim {
  def streamingDataFrame(spark: SparkSession, rows: RDD[InternalRow],
                         schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)
}
