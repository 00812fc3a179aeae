package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis

/** Misra-Gries heavy hitters ([[FreqSketch]]): exact when the vocabulary
  * fits the capacity (any partitioning), and in the approximate regime the
  * classic guarantees hold — heavy tokens retained, counts never above
  * truth and within N/capacity below it.
  */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def hh(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(TextAnalysis.heavyHitters(col("text"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exact(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val corpus = Seq(
    "a a b  c", "a b d", "e a", "b c a", "f", "a b").toDF("text")

  test("vocabulary within capacity: counts are exact under any partitioning") {
    val truth = exact(corpus)
    Seq(1, 3, 13).foreach { parts =>
      assert(hh(corpus.repartition(parts), 16) == truth, s"parts=$parts")
    }
    // empty tokens (double space) never count; nulls are skipped
    val withNull = corpus.unionByName(Seq[String](null).toDF("text"))
    assert(hh(withNull, 16) == truth)
  }

  test("approximate regime: heavy tokens retained, counts underestimate within N/capacity") {
    // 1000 occurrences of 'hot', 600 of 'warm', plus 200 singleton tokens
    val rows = Seq.fill(500)("hot hot warm") ++ Seq.fill(100)("warm") ++
      (0 until 200).map(i => s"rare$i")
    val df = rows.toDF("text").repartition(7)
    val truth = exact(df)
    val n = truth.values.sum // total tokens
    val cap = 8
    val got = hh(df, cap)
    assert(got.size <= cap)
    // retention: every token with true count > N/cap survives
    truth.filter(_._2 > n / cap).keys.foreach { t =>
      assert(got.contains(t), s"heavy token $t dropped (truth ${truth(t)})")
    }
    // one-sided error: estimate <= truth, and >= truth - N/cap
    got.foreach { case (t, c) =>
      assert(c <= truth(t), s"$t overestimated: $c > ${truth(t)}")
      assert(c >= truth(t) - n / cap, s"$t too low: $c < ${truth(t)} - ${n / cap}")
    }
  }

  test("grouped aggregation and plan shape: no explode row leaves the scan") {
    val df = Seq(("s1", "a a b"), ("s1", "a"), ("s2", "c c"), ("s2", "c d"))
      .toDF("src", "text")
    val out = df.groupBy("src")
      .agg(TextAnalysis.heavyHitters(col("text"), 8).as("hh"))
      .select(col("src"), explode(col("hh")).as("e"))
      .select(col("src"), col("e.token"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(("s1", "a", 3L), ("s1", "b", 1L),
      ("s2", "c", 3L), ("s2", "d", 1L)))
    // the aggregate runs partial+final over text rows — no Generate
    // (explode) below the aggregate in the plan
    val plan = df.groupBy("src")
      .agg(TextAnalysis.heavyHitters(col("text"), 8).as("hh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_misra_gries"), plan)
    assert(!plan.contains("Generate"), plan)
  }
}
