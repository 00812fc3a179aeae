package graft.tools

import graft.{SparkSpec, Tables}

class RecallEvalSpec extends SparkSpec {

  test("recall orderings hold: more probes never hurt; every index beats nothing") {
    val emb = Tables.embeddings(spark, sf)
    val r = RecallEval.evaluate(emb, k = 5, dim = 64).toMap
    assert(r.keySet == Set("lsh_10bit", "lsh_6bit", "ivf_probe1", "ivf_probe4"))
    r.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(r("ivf_probe4") >= r("ivf_probe1"),
      s"more probes must not lower recall: $r")
    assert(r("lsh_6bit") >= r("lsh_10bit"),
      s"bigger buckets must not lower recall: $r")
    assert(r.values.exists(_ > 0.0), s"all-zero recall means a broken index: $r")
  }
}
