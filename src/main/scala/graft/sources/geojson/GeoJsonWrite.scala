package graft.sources.geojson

import graft.geo.{GeoJson, GeomSerde}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** DSv2 batch WRITE for graft-geojson — `df.write.format("graft-geojson")
  * .mode("append"|"overwrite").save(dir)` emits the same NDJSON
  * feature-per-line layout as [[graft.sources.GeoJsonSource.writeFeatures]]
  * (the reference's output format, src/index.ts:323 convertRestoGeoJSON,
  * as a distributed writer): one file per partition, null properties
  * omitted (the reader's flattening answers null for a missing key, so
  * the round-trip preserves SQL NULL), WKB `geometry` → GeoJSON geometry,
  * and a `_MANIFEST.json` with the feature count. Task attempts write to
  * a dot-prefixed temp file and RENAME on commit, so a failed/speculative
  * attempt never leaves a partial file a reader would list (the reader
  * skips `_`/`.`-prefixed names). Overwrite maps to DSv2 truncate;
  * `ErrorIfExists`/`Ignore` are not supported by Spark's V2 save() path.
  */
private[geojson] class GeoJsonWriteBuilder(info: LogicalWriteInfo)
  extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = {
    val path = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-geojson write needs a path"))
    val geomCol = Option(info.options.get("geometryColumn")).getOrElse("geometry")
    val schema = info.schema()
    require(schema.fieldNames.contains(geomCol),
      s"geometry column '$geomCol' not in ${schema.fieldNames.mkString(", ")}")
    val geomOk = schema(geomCol).dataType match {
      case BinaryType => true // raw WKB (what the reader produces)
      case u: org.apache.spark.sql.types.UserDefinedType[_] =>
        u.sqlType == BinaryType // GeometryUDT stores WKB unchanged
      case _ => false
    }
    require(geomOk,
      s"geometry column '$geomCol' must be WKB binary, got ${schema(geomCol).dataType}")
    // planning-time type check: properties must be JSON-atomic (the reader
    // flattens every property to a string column; nested rows would need a
    // schema the reader does not model)
    schema.fields.filter(_.name != geomCol).foreach { f =>
      f.dataType match {
        case StringType | BooleanType | ByteType | ShortType | IntegerType |
             LongType | FloatType | DoubleType | _: DecimalType => ()
        case other => throw new IllegalArgumentException(
          s"property '${f.name}': unsupported type $other (string/numeric/boolean only)")
      }
    }
    new GeoJsonWrite(path, geomCol, schema, truncateFirst)
  }
}

private class GeoJsonWrite(path: String, geomCol: String, schema: StructType,
                           truncateFirst: Boolean) extends Write {
  override def toBatch: BatchWrite = new GeoJsonBatchWrite(path, geomCol, schema, truncateFirst)

  /** Structured Streaming sink — APPEND output mode only: each epoch's
    * partitions land as their own uuid'd part files and the manifest
    * count accumulates on epoch commit. Delivery is AT-LEAST-ONCE: a
    * replayed epoch (failure between task success and commit-log write)
    * appends its features again — the honest contract for a sink with no
    * transactional rename log; exactly-once consumers should dedup on a
    * key column downstream. Complete/Update modes (truncate-per-epoch)
    * are refused rather than silently clobbering the directory every
    * trigger. */
  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
    if (truncateFirst) throw new UnsupportedOperationException(
      "graft-geojson streaming write supports Append output mode only")
    new GeoJsonStreamingWrite(path, geomCol, schema)
  }
}

private class GeoJsonStreamingWrite(path: String, geomCol: String, schema: StructType)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  private def conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
  private val jobId = java.util.UUID.randomUUID().toString

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    GeoJsonStreamingWriterFactory(path, geomCol, schema,
      new SerializableConfiguration(conf), jobId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val written = messages.collect { case GeoJsonCommit(_, n) => n }.sum
    // every epoch accumulates (fresh never — Append is the only mode)
    GeoJsonWriteOps.accumulateManifest(dir.getFileSystem(conf), dir, written,
      geomCol, schema, fresh = false)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    GeoJsonWriteOps.deleteCommitted(dir.getFileSystem(conf), dir, messages)
  }
}

private case class GeoJsonStreamingWriterFactory(path: String, geomCol: String,
                                                 schema: StructType,
                                                 conf: SerializableConfiguration, jobId: String)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    // the epoch id lands in the file name so every trigger's files are
    // distinct even when partition/task ids repeat across epochs
    new GeoJsonDataWriter(path, geomCol, schema, conf, partitionId, taskId,
      s"$jobId-e$epochId")
}

private case class GeoJsonCommit(file: String, count: Long) extends WriterCommitMessage

/** Commit/abort logic the batch and streaming writes SHARE — one copy of
  * the manifest parse/accumulate rule and of the committed-file cleanup,
  * so the two paths cannot drift. */
private object GeoJsonWriteOps {
  /** Accumulates onto the previous manifest unless `fresh` (a truncate):
    * counts sum, property lists union. */
  def accumulateManifest(fs: org.apache.hadoop.fs.FileSystem, dir: Path, written: Long,
                         geomCol: String, schema: StructType, fresh: Boolean): Unit = {
    val manifest = new Path(dir, "_MANIFEST.json")
    val (prevCount, prevProps): (Long, Seq[String]) =
      if (fresh || !fs.exists(manifest)) (0L, Nil)
      else {
        val in = fs.open(manifest)
        val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
                   finally in.close()
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
        val ps = scala.collection.mutable.ArrayBuffer.empty[String]
        root.path("properties").forEach(n => ps += n.asText())
        (root.path("n_features").asLong(0L), ps.toSeq)
      }
    val props = (prevProps ++ schema.fieldNames.filterNot(_ == geomCol)).distinct
    graft.sources.GeoJsonSource.writeManifest(fs, dir, written + prevCount, geomCol, props)
  }

  /** Best-effort removal of the files an aborted job's tasks committed. */
  def deleteCommitted(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
                      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case GeoJsonCommit(f, _) => f }
      .foreach(f => try fs.delete(new Path(dir, f), false)
                    catch { case _: java.io.IOException => () })
}

private class GeoJsonBatchWrite(path: String, geomCol: String, schema: StructType,
                                truncateFirst: Boolean) extends BatchWrite {
  private def conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  // task ids restart at 0 per Spark application, so an append from a
  // fresh session would collide with (and on a local FS silently
  // overwrite) a previous app's part files — the per-job uuid keeps
  // names globally unique, like Spark's own file sinks
  private val jobId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncateFirst && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    GeoJsonWriterFactory(path, geomCol, schema, new SerializableConfiguration(conf), jobId)
  }

  /** One manifest for the directory: this write's committed counts plus
    * the previous manifest's on append (overwrite starts from zero), and
    * the property list UNIONED with the previous one — appended frames
    * may carry different columns, and a manifest listing only the last
    * write's schema would misdescribe the earlier features. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val written = messages.collect { case GeoJsonCommit(_, n) => n }.sum
    GeoJsonWriteOps.accumulateManifest(dir.getFileSystem(conf), dir, written,
      geomCol, schema, fresh = truncateFirst)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    GeoJsonWriteOps.deleteCommitted(dir.getFileSystem(conf), dir, messages)
  }
}

private case class GeoJsonWriterFactory(path: String, geomCol: String, schema: StructType,
                                        conf: SerializableConfiguration, jobId: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GeoJsonDataWriter(path, geomCol, schema, conf, partitionId, taskId, jobId)
}

private class GeoJsonDataWriter(path: String, geomCol: String, schema: StructType,
                                conf: SerializableConfiguration,
                                partitionId: Int, taskId: Long, jobId: String)
  extends DataWriter[InternalRow] {
  private val dir = new Path(path)
  private val fs = dir.getFileSystem(conf.value)
  // the attempt id (taskId) keeps concurrent speculative attempts apart,
  // the job uuid keeps separate applications apart; the dot prefix keeps
  // readers from listing an in-flight file
  private val name = s"part-$partitionId-$taskId-$jobId.ndjson"
  private val temp = new Path(dir, s".$name.inprogress")
  private val out = fs.create(temp, true)
  private val geomIdx = schema.fieldIndex(geomCol)
  private val fields = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
  private var count = 0L

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder("""{"type":"Feature","properties":{""")
    var emitted = 0
    fields.foreach { case (f, i) =>
      if (!row.isNullAt(i)) { // null property = omitted key (to_json parity)
        if (emitted > 0) sb.append(',')
        emitted += 1
        // extract the typed value, then render through the ONE shared
        // scalar rule (GeoJsonSource.jsonScalar) so the export formats
        // cannot drift apart
        val v: Any = f.dataType match {
          case StringType    => row.getUTF8String(i).toString
          case BooleanType   => row.getBoolean(i)
          case ByteType      => row.getByte(i)
          case ShortType     => row.getShort(i)
          case IntegerType   => row.getInt(i)
          case LongType      => row.getLong(i)
          case FloatType     => row.getFloat(i)
          case DoubleType    => row.getDouble(i)
          case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
          case other => throw new IllegalStateException(s"unreachable type $other")
        }
        sb.append(graft.JsonText.str(f.name)).append(':')
          .append(graft.sources.GeoJsonSource.jsonScalar(v))
      }
    }
    sb.append("},\"geometry\":")
    if (row.isNullAt(geomIdx)) sb.append("null")
    else sb.append(GeoJson.write(GeomSerde.fromWkb(row.getBinary(geomIdx))))
    sb.append("}\n")
    out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (!fs.rename(temp, new Path(dir, name)))
      throw new java.io.IOException(s"rename $temp -> $name failed")
    GeoJsonCommit(name, count)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: java.io.IOException => () }
    try fs.delete(temp, false) catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}
