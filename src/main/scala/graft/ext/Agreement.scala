package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeling-platform QA metric the
  * reference's domain (annotation pipelines) runs constantly: given two
  * categorical "rater" columns over the same items, Cohen's kappa per
  * group corrects raw percent-agreement for chance.
  *
  * Engine-exactness: kappa is computed from EXACT integer counts only —
  *   kappa = (n·agree − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k)
  * (multiply the usual po/pe form through by n²) — so the one double
  * division at the end divides identical BIGINTs on any engine; no
  * rounding, no summation-order sensitivity (the q69/q73 integer-cents
  * discipline applied to a statistic).
  *
  * Design for scale: one shuffle to the (group, a, b) confusion cells;
  * everything after runs on ≤ |labels|² rows per group. The margin
  * products join cells-to-cells on the group key — label-cardinality
  * sized, never item-sized.
  */
object Agreement {

  /** Per-group Cohen's kappa between categorical columns `aCol` and `bCol`.
    * Output: group, n_items, n_agree, chance_sum, kappa — one row per
    * group. Degenerate groups where n² == chance_sum (single label on both
    * sides) get kappa = null rather than 0/0.
    *
    * BOUND: the multiplied-through integer form computes n_items² and
    * Σ row_k·col_k in BIGINT, so a single GROUP is limited to ~3.0e9 items
    * (√Long.MaxValue) before silent wraparound — per group, not per table;
    * a 100 TB corpus sliced by source/annotator-pair stays far under it.
    * Groups beyond that need the DECIMAL(38,0) form (and an oracle-side
    * HUGEINT match); kept integer here because the gate demands bit-equal
    * cross-engine division inputs.
    */
  def cohenKappaBy(df: DataFrame, groupCol: String, aCol: String,
      bCol: String): DataFrame = {
    // Four consumers derive from the confusion cells; without truncation each
    // re-runs the item-level aggregation (and any expensive rater expression)
    // from the source — the q97 multi-consumer-subplan lesson. The cells
    // table is ≤ |groups|·|labels|² rows: localCheckpoint it once.
    val cells = df
      .groupBy(col(groupCol), col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val totals = cells.groupBy(col(groupCol))
      .agg(sum(col("__cnt")).as("n_items"),
        sum(when(col("__a") === col("__b"), col("__cnt")).otherwise(lit(0L)))
          .as("n_agree"))
    val rowTot = cells.groupBy(col(groupCol).as("__rg"), col("__a"))
      .agg(sum(col("__cnt")).as("__rt"))
    val colTot = cells.groupBy(col(groupCol).as("__cg"), col("__b"))
      .agg(sum(col("__cnt")).as("__ct"))
    // chance mass: Σ over labels present in BOTH margins of row_k · col_k
    val chance = rowTot
      .join(colTot, col("__rg") === col("__cg") && col("__a") === col("__b"))
      .groupBy(col("__rg").as("__chg"))
      .agg(sum(col("__rt") * col("__ct")).as("chance_sum"))
    totals
      .join(chance, col(groupCol) === col("__chg"), "left")
      .select(col(groupCol),
        col("n_items"), col("n_agree"),
        coalesce(col("chance_sum"), lit(0L)).as("chance_sum"),
        when(col("n_items") * col("n_items") =!= coalesce(col("chance_sum"), lit(0L)),
          (col("n_items") * col("n_agree") - coalesce(col("chance_sum"), lit(0L)))
            .cast("double") /
          (col("n_items") * col("n_items") - coalesce(col("chance_sum"), lit(0L)))
            .cast("double"))
          .as("kappa"))
  }
}
