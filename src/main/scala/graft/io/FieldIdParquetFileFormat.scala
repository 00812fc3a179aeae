package graft.io

import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A ParquetFileFormat whose WRITES always honor the `parquet.field.id`
  * metadata carried by the batch schema, regardless of the session's
  * `spark.sql.parquet.fieldId.write.enabled` setting.
  *
  * Why a subclass: the stock write path copies that SESSION flag into the
  * job configuration during setup (`ParquetUtils.prepareWrite`), clobbering
  * any per-write `.option(...)` — so an id-mapped Delta staging write would
  * otherwise have to flip the flag session-wide, leaking id-emission into
  * every unrelated parquet write on the same session (and never restoring
  * it). Re-setting the key on the job conf AFTER the stock setup — before
  * FileFormatWriter serializes it for the executors — scopes the behavior
  * to exactly this write. The executor-side consumer
  * (`SparkToParquetSchemaConverter` via `ParquetWriteSupport.init`) reads
  * the job conf, not the session, so nothing else observes the flag.
  *
  * The READ side needs no counterpart: `ParquetReadSupport` resolves the
  * read flag from the per-query hadoop conf, onto which relation/reader
  * options are overlaid last — a plain
  * `.option("spark.sql.parquet.fieldId.read.enabled", "true")` already
  * scopes id-resolution to one scan.
  *
  * Inert for schemas without field-id metadata (the flag only changes
  * behavior when ids are present), so it is safe as the staging format for
  * unmapped tables too.
  */
class FieldIdParquetFileFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory = {
    val factory = super.prepareWrite(sparkSession, job, options, dataSchema)
    job.getConfiguration.set("spark.sql.parquet.fieldId.write.enabled", "true")
    factory
  }

  override def toString: String = "ParquetFieldId"
}

object FieldIdParquetFileFormat {
  /** The fully-qualified name, for `DataFrameWriter.format(...)`. */
  val name: String = classOf[FieldIdParquetFileFormat].getName

  /** Key of the scan-scoped read-resolution option. */
  val readFlag: String = "spark.sql.parquet.fieldId.read.enabled"

  /** Whether `schema` carries parquet field ids at the top level (graft's
    * id-mode physical schemas stamp every level; the top level is the
    * cheap, sufficient indicator).
    */
  def hasIds(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains("parquet.field.id"))
}
