package graft.core.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

import scala.util.Try

/** Post-hoc type enrichment of the all-string export table.
  *
  * The reference applies a fixed column→type cast map with a per-column
  * try/except (labelspark/constants.py:1-7 LABELBOX_DEFAULT_TYPE_DICTIONARY,
  * applied by labelspark/dataframe_schema_enrichment.py:4-17). We keep those
  * semantics but use `try_cast`, so malformed cells become NULL instead of
  * failing the job — and the casts stay Catalyst-visible expressions.
  */
object TypeEnrichment {

  val LabelboxDefaultTypes: Map[String, String] = Map(
    "Agreement"           -> "INT",
    "Benchmark Agreement" -> "INT",
    "Created At"          -> "TIMESTAMP",
    "Updated At"          -> "TIMESTAMP",
    "Has Open Issues"     -> "INT",
    "Seconds to Label"    -> "FLOAT")

  def enrich(df: DataFrame, types: Map[String, String] = LabelboxDefaultTypes): DataFrame =
    types.foldLeft(df) { case (d, (c, t)) =>
      if (!d.columns.contains(c)) d
      else Try(d.withColumn(c, expr(s"try_cast(`$c` AS $t)"))).getOrElse(d)
    }
}
