package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("Cohen's kappa matches the hand computation") {
    // confusion: (a,a)x4 (a,b)x1 (b,b)x3 (b,a)x2 → n=10, agree=7,
    // rows a=5 b=5, cols a=6 b=4, chance=5*6+5*4=50 → kappa=(70-50)/(100-50)=0.4
    val rows = Seq.fill(4)(("g", "a", "a")) ++ Seq(("g", "a", "b")) ++
      Seq.fill(3)(("g", "b", "b")) ++ Seq.fill(2)(("g", "b", "a"))
    val got = Agreement.cohenKappaBy(rows.toDF("src", "r1", "r2"), "src", "r1", "r2")
      .collect().head
    assert(got.getLong(1) == 10L && got.getLong(2) == 7L && got.getLong(3) == 50L)
    assert(math.abs(got.getDouble(4) - 0.4) < 1e-15)
  }

  test("perfect, chance-level, and degenerate agreement") {
    val perfect = Seq(("g", "a", "a"), ("g", "b", "b"), ("g", "c", "c"))
    val p = Agreement.cohenKappaBy(perfect.toDF("s", "x", "y"), "s", "x", "y").collect().head
    assert(p.getDouble(4) == 1.0)

    // independent margins at 50/50: agree = chance → kappa = 0
    val chance = Seq(("g", "a", "a"), ("g", "a", "b"), ("g", "b", "a"), ("g", "b", "b"))
    val c = Agreement.cohenKappaBy(chance.toDF("s", "x", "y"), "s", "x", "y").collect().head
    assert(c.getDouble(4) == 0.0)

    // single label on both sides: n^2 == chance_sum → null, not 0/0
    val degen = Seq(("g", "a", "a"), ("g", "a", "a"))
    val d = Agreement.cohenKappaBy(degen.toDF("s", "x", "y"), "s", "x", "y").collect().head
    assert(d.isNullAt(4))
  }

  test("groups are independent; labels missing from one margin contribute no chance") {
    val rows = Seq(
      ("g1", "a", "a"), ("g1", "b", "b"),          // g1: perfect, 2 labels
      ("g2", "a", "b"), ("g2", "b", "c"))          // g2: zero agreement, disjoint-ish margins
    val got = Agreement.cohenKappaBy(rows.toDF("s", "x", "y"), "s", "x", "y")
      .orderBy("s").collect()
    assert(got.length == 2)
    assert(got(0).getDouble(4) == 1.0)
    // g2: rows a=1 b=1; cols b=1 c=1; shared label b → chance = row_b*col_b = 1
    assert(got(1).getLong(1) == 2L && got(1).getLong(2) == 0L && got(1).getLong(3) == 1L)
    assert(math.abs(got(1).getDouble(4) - (0.0 - 1.0) / (4.0 - 1.0)) < 1e-15)
  }
}
