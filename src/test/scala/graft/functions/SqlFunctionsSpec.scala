package graft.functions

import graft.SparkSpec

/** The injected native functions must be reachable BY NAME from SQL text —
  * the notebook/SQL-surface contract (S9) for the custom expression layer,
  * not just the Column API the library itself uses.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("graft_dot and the self-dot rewrite work from plain SQL") {
    val r = spark.sql(
      """SELECT graft_dot(a, b) AS ab, graft_dot(a, a) AS aa
        |FROM VALUES (array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) t(a, b)""".stripMargin)
    val row = r.collect().head
    assert(row.getDouble(0) == 32.0 && row.getDouble(1) == 14.0)
    // the optimizer rule fires on SQL-sourced plans too (non-literal input —
    // a VALUES row constant-folds to a LocalRelation before the rule shows)
    val r2 = spark.sql(
      """SELECT graft_dot(v, v) AS aa
        |FROM (SELECT array(CAST(id AS DOUBLE), 2.0D) AS v FROM range(3))""".stripMargin)
    assert(r2.queryExecution.optimizedPlan.toString.contains("graft_self_dot"))
    assert(r2.collect().map(_.getDouble(0)).sorted.toSeq == Seq(4.0, 5.0, 8.0))
  }

  test("hash-family functions evaluate from SQL and match call_function") {
    val sql = spark.sql(
      """SELECT graft_simhash64(array('a', 'b', 'c')) AS sh,
        |       graft_minhash_sig(array('a', 'b', 'c'), 2, 4) AS sig,
        |       graft_minhash_bands(array('a', 'b', 'c'), 2, 4, 2) AS bands""".stripMargin)
      .collect().head
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = array(lit("a"), lit("b"), lit("c"))
    val api = Seq(1).toDF("x")
      .select(
        call_function("graft_simhash64", t).as("sh"),
        call_function("graft_minhash_sig", t, lit(2), lit(4)).as("sig"),
        call_function("graft_minhash_bands", t, lit(2), lit(4), lit(2)).as("bands"))
      .collect().head
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
  }

  test("wrong arity raises a clear error from SQL") {
    val e = intercept[Exception] { spark.sql("SELECT graft_dot(array(1.0D))") }
    assert(e.getMessage.contains("graft_dot"))
  }
}
