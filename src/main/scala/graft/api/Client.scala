package graft.api

import graft.core.flatten.BronzeSilver
import graft.core.ops.TableOps
import graft.core.payload.{NdjsonKernel, UploadBuilder}
import graft.core.schema.{ColumnValidator, ResolvedColumns, TypeEnrichment}
import graft.io.{BatchedSink, Sources, UploadTransport}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Facade mirroring the reference's public client surface
  * (labelspark/client.py) — export, import, metadata upsert, bronze→silver —
  * re-expressed as distributed DataFrame pipelines.
  */
object Client {

  // ----------------------------------------------------------- export

  /** Export (API → table), from flattened label records arriving as JSON
    * documents (one per row). Reference: client.py:38-81 builds an
    * all-string DataFrame whose schema is the union of keys across records
    * (A5), nested values pre-serialized, nulls → "" — here the union and the
    * normalization run distributed, then the default type enrichment is
    * applied (constants.py:1-7 semantics).
    */
  def exportToTable(spark: SparkSession, labelJsonLines: Dataset[String]): DataFrame = {
    val inferred = Sources.jsonLinesToDataFrame(spark, labelJsonLines)
    val allString = inferred.select(
      inferred.schema.fields.map { f =>
        val c = col(s"`${f.name}`")
        val s = f.dataType match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType => to_json(c)
          case _ => c.cast("string")
        }
        coalesce(s, lit("")).as(f.name)
      }.toIndexedSeq: _*)
    TypeEnrichment.enrich(allString)
  }

  /** Export variant writing straight to a table path (client.py:83-151). */
  def exportToTablePath(spark: SparkSession, labelJsonLines: Dataset[String],
      path: String, writeMode: String): DataFrame = {
    val df = exportToTable(spark, labelJsonLines)
    Sources.writeTable(df, path, writeMode)
    df
  }

  // ----------------------------------------------------------- import

  /** Outcome of [[createDataRowsFromTable]]. */
  final case class ImportResult(
      resolved: ResolvedColumns,
      uploads: DataFrame,
      ndjson: Dataset[NdjsonKernel.AnnotationNdjson],
      accepted: Long)

  /** Import (table → API): validate columns, build the uploads struct in one
    * codegen'd select, expand annotation ndjson, dedupe duplicate global
    * keys deterministically, and push batches through the transport.
    * Reference flow: client.py:207-339 (validate → chained-UDF payload →
    * collect → threaded upload); here no driver materialization beyond the
    * batched iterator.
    */
  def createDataRowsFromTable(
      df: DataFrame,
      cfg: UploadBuilder.Config,
      transport: UploadTransport,
      batchSize: Int = BatchedSink.DefaultBatchSize): ImportResult = {
    implicit val spark: SparkSession = df.sparkSession
    val rc = ColumnValidator.validate(df.columns.toSeq, cfg.divider) match {
      case Right(r) => r
      case Left(err) => throw new IllegalArgumentException(err)
    }
    // determine_actions contract (client.py:250-257): creating data rows
    // requires a dataset id from either a column or the call config.
    require(rc.datasetId.nonEmpty || cfg.datasetId.nonEmpty,
      "no dataset_id column and no default dataset id — cannot create data rows")

    val withUploads = UploadBuilder.withUploads(df, rc, cfg)
    // Last-write-wins on duplicate global keys, made deterministic
    // (uploader.py:99-104 overwrites in arrival order; we order explicitly).
    val deduped = TableOps.dedupeLastWins(
      withUploads.withColumn("__gk", col("uploads.data_row.global_key")),
      Seq("__gk"), Seq(col("uploads.data_row.external_id").desc)).drop("__gk")

    val ndjson = NdjsonKernel.explodeAnnotations(
      deduped.select(
        col("uploads.data_row.global_key").as("global_key"),
        explode_outer(col("uploads.annotations")).as("a"))
        .select(col("global_key"), col("a.tool_type").as("tool_type"),
          col("a.name").as("name"), col("a.cell").as("cell"))
        .filter(col("cell").isNotNull),
      cfg.maskMethod)

    val accepted = BatchedSink.uploadDriverSide(
      deduped, to_json(col("uploads")), transport, batchSize)
    ImportResult(rc, deduped.select(col("uploads")), ndjson, accepted)
  }

  /** Which upload actions a table implies (client.py:250-257 +
    * client.py:371-382 determine_actions contract): derived from the
    * resolved columns and call-level config.
    */
  final case class Actions(
      createDataRows: Boolean,
      batchToProjects: Boolean,
      annotate: Boolean,
      groundTruthToModelRun: Boolean,
      predictionsToModelRun: Boolean)

  def determineActions(rc: ResolvedColumns, cfg: UploadBuilder.Config,
      modelRunId: Option[String] = None): Actions = {
    val hasDataset = rc.datasetId.nonEmpty || cfg.datasetId.nonEmpty
    val hasProject = rc.projectId.nonEmpty || cfg.projectId.nonEmpty
    val hasModelRun = rc.modelRunId.nonEmpty || modelRunId.nonEmpty
    Actions(
      createDataRows = hasDataset,
      batchToProjects = hasProject,
      annotate = hasProject && rc.annotations.nonEmpty,
      groundTruthToModelRun = hasModelRun && rc.annotations.nonEmpty,
      predictionsToModelRun = hasModelRun && rc.predictions.nonEmpty)
  }

  /** Upsert variant (client.py:350-474): adds the model-run branches —
    * ground-truth annotations and predictions (`prediction///kind///name`
    * columns, same cell syntax → same ndjson kernel). Returns the base
    * import result, the prediction ndjson, and the per-project annotation
    * regroup (A7: client.py:308-325, as a distributed groupBy instead of a
    * driver dict).
    */
  final case class UpsertResult(
      base: ImportResult,
      actions: Actions,
      predictions: Dataset[NdjsonKernel.AnnotationNdjson],
      annotationsByProject: DataFrame)

  def upsertDataRowsFromTable(
      df: DataFrame,
      cfg: UploadBuilder.Config,
      transport: UploadTransport,
      modelRunId: Option[String] = None,
      batchSize: Int = BatchedSink.DefaultBatchSize): UpsertResult = {
    implicit val spark: SparkSession = df.sparkSession
    val rc = ColumnValidator.validate(df.columns.toSeq, cfg.divider) match {
      case Right(r) => r
      case Left(err) => throw new IllegalArgumentException(err)
    }
    val actions = determineActions(rc, cfg, modelRunId)
    val base = createDataRowsFromTable(df, cfg, transport, batchSize)

    val predictionsDs =
      if (actions.predictionsToModelRun) {
        val predCells = array(rc.predictions.map { p =>
          when(col(s"`${p.raw}`").isNotNull,
            struct(lit(p.tpe).as("tool_type"), lit(p.name).as("name"),
              col(s"`${p.raw}`").cast("string").as("cell")))
        }: _*)
        NdjsonKernel.explodeAnnotations(
          df.select(UploadBuilder.globalKeyColumn(rc).as("global_key"),
              explode(filter(predCells, _.isNotNull)).as("a"))
            .select(col("global_key"), col("a.tool_type").as("tool_type"),
              col("a.name").as("name"), col("a.cell").as("cell")),
          cfg.maskMethod)
      } else spark.emptyDataset(
        org.apache.spark.sql.Encoders.product[NdjsonKernel.AnnotationNdjson])

    // A7: regroup annotation ndjson per project id for the batched
    // annotation-import API. Derived from the DEDUPED upload frame (not the
    // raw df): duplicate global keys in the input must not multiply
    // annotation records or attach a dropped row's project_id, and
    // uploads.project_id already encodes the column/config/null precedence.
    val projectCol = base.uploads.select(
      col("uploads.data_row.global_key").as("global_key"),
      col("uploads.project_id").as("project_id"))
    val annByProject = base.ndjson.toDF()
      .join(projectCol, Seq("global_key"), "left")
      .groupBy(col("project_id"))
      .agg(collect_list(to_json(struct(
        col("global_key"), col("name"), col("kind"), col("geometry")))).as("ndjsons"))

    UpsertResult(base, actions, predictionsDs, annByProject)
  }

  // ------------------------------------------- stored-table path variants

  /** Path variant of [[createDataRowsFromTable]]
    * (client.py:341-348 create_data_rows_from_delta_table): read the stored
    * table, delegate. `Sources.readTable` serves REAL Delta tables (log
    * replay + stats skipping, `io.DeltaRead`) when the path carries a
    * `_delta_log`, plain parquet otherwise (S6).
    */
  def createDataRowsFromPath(
      spark: SparkSession, tablePath: String,
      cfg: UploadBuilder.Config, transport: UploadTransport,
      batchSize: Int = BatchedSink.DefaultBatchSize): ImportResult =
    createDataRowsFromTable(Sources.readTable(spark, tablePath), cfg, transport, batchSize)

  /** Path variant of [[upsertDataRowsFromTable]]
    * (client.py:476-483 upsert_data_rows_from_delta_table).
    */
  def upsertDataRowsFromPath(
      spark: SparkSession, tablePath: String,
      cfg: UploadBuilder.Config, transport: UploadTransport,
      modelRunId: Option[String] = None,
      batchSize: Int = BatchedSink.DefaultBatchSize): UpsertResult =
    upsertDataRowsFromTable(Sources.readTable(spark, tablePath), cfg, transport,
      modelRunId, batchSize)

  // ------------------------------------------------- metadata upsert

  /** J4 (labelspark/update_metadata.py:25-51): upsert a metadata column from
    * an updates table — left join + coalesce instead of the reference's
    * driver-dict UDF.
    */
  def upsertTableMetadata(df: DataFrame, updates: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val upd = updates.select(
      col(keyCol).as("__k"), col(valueCol).as("__v"))
    df.join(upd, col(keyCol) === col("__k"), "left")
      .withColumn(valueCol, coalesce(col("__v"), col(valueCol)))
      .drop("__k", "__v")
  }

  // --------------------------------------------------- bronze→silver

  /** Bronze→silver refinement (see BronzeSilver). */
  def bronzeToSilver(bronze: DataFrame, videoMode: Boolean = false): DataFrame =
    BronzeSilver.bronzeToSilver(bronze, videoMode)

  /** The all-string export schema for a set of observed keys
    * (client.py:71-76): union of keys, every field nullable StringType.
    */
  def exportSchema(keys: Seq[String]): StructType =
    StructType(keys.distinct.map(k => StructField(k, StringType, nullable = true)))
}
