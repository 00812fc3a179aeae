package graft.core.schema

/** Parser for the reference's name-encoded column convention
  * `kind///type///name` (divider configurable), e.g.
  * `metadata///string///labelspark-String`,
  * `attachment///image///sample_col_1`,
  * `annotation///bbox///sample_bounding_box`.
  *
  * Reference behavior: divider default at labelspark/client.py:41,209; kind
  * and type consumed at labelspark/uploader.py:179,188-190. Here the parse is
  * a pure schema-level operation (driver side, zero Spark jobs).
  */
final case class ColumnSpec(kind: String, tpe: String, name: String, raw: String)

object ColumnSpec {
  val DefaultDivider = "///"

  def parse(colName: String, divider: String = DefaultDivider): Option[ColumnSpec] =
    colName.split(java.util.regex.Pattern.quote(divider), -1) match {
      case Array(k, t, n) => Some(ColumnSpec(k, t, n, colName))
      case _              => None
    }

  /** All specs of one kind, in column order (order matters: the reference's
    * first-wins population relies on it).
    */
  def ofKind(cols: Seq[String], kind: String, divider: String = DefaultDivider): Seq[ColumnSpec] =
    cols.flatMap(parse(_, divider)).filter(_.kind == kind)
}

/** Reserved-column resolution contract (labelspark/client.py:227-235):
  * `row_data` is required; `global_key` defaults to `row_data`; `external_id`
  * defaults to `global_key`; `dataset_id`/`project_id`/`model_id`/
  * `model_run_id` are optional and may instead be supplied as literals.
  */
final case class ResolvedColumns(
    rowData: String,
    globalKey: Option[String],
    externalId: Option[String],
    datasetId: Option[String],
    projectId: Option[String],
    modelId: Option[String],
    modelRunId: Option[String],
    metadata: Seq[ColumnSpec],
    attachments: Seq[ColumnSpec],
    annotations: Seq[ColumnSpec],
    predictions: Seq[ColumnSpec])

object ColumnValidator {
  def validate(
      columns: Seq[String],
      divider: String = ColumnSpec.DefaultDivider): Either[String, ResolvedColumns] = {
    def opt(n: String) = columns.find(_ == n)
    opt("row_data") match {
      case None => Left("required column `row_data` is missing")
      case Some(rd) =>
        Right(ResolvedColumns(
          rowData = rd,
          globalKey = opt("global_key"),
          externalId = opt("external_id"),
          datasetId = opt("dataset_id"),
          projectId = opt("project_id"),
          modelId = opt("model_id"),
          modelRunId = opt("model_run_id"),
          metadata = ColumnSpec.ofKind(columns, "metadata", divider),
          attachments = ColumnSpec.ofKind(columns, "attachment", divider),
          annotations = ColumnSpec.ofKind(columns, "annotation", divider),
          predictions = ColumnSpec.ofKind(columns, "prediction", divider)))
    }
  }
}
