package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IterateSpec extends SparkSpec {
  import spark.implicits._

  test("fixpoint: min-label propagation converges, stops on metric repeat, result is correct") {
    // a path graph 0-1-2-3-4 plus an isolated pair 10-11: min-label
    // components are {0..4}->0 and {10,11}->10; the path needs several
    // propagation rounds, so convergence genuinely exercises the loop
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst").cache()
    val init = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    val r = Iterate.fixpoint(init, sum(col("lbl")), maxIters = 20) { labels =>
      edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
        .unionByName(labels)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
    }
    assert(r.converged, s"should converge, ran ${r.iterations}")
    assert(r.iterations < 20 && r.iterations >= 4, s"path depth needs rounds: ${r.iterations}")
    val got = r.df.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert((0L to 4L).forall(got(_) == 0L) && got(10L) == 10L && got(11L) == 10L, got.toString)
    // checkpointed result: reusable without replaying the loop lineage
    assert(r.df.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      r.df.queryExecution.optimizedPlan.toString)
  }

  test("times: runs exactly n checkpointed rounds") {
    val init = Seq(1L).toDF("v")
    val out = Iterate.times(init, 5)(df => df.select((col("v") * 2).as("v")))
    assert(out.head().getLong(0) == 32L)
    assert(out.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("fixpoint with maxIters 0 returns the checkpointed init unchanged") {
    val init = Seq((1L, 2L)).toDF("a", "b")
    val r = Iterate.fixpoint(init, count(lit(1)), 0)(identity)
    assert(!r.converged && r.iterations == 0)
    assert(r.df.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 2L)))
  }
}
