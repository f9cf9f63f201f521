package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, i.toLong)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "z"))
      .toDF("k", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), factor = 8)
      .orderBy("k", "v").collect().toSeq
    val plain = big.join(small, Seq("k")).orderBy("k", "v").collect().toSeq
    assert(salted == plain)

    val saltedLeft = Skew.saltedJoin(big, small, Seq("k"), 8, "left")
      .orderBy("k", "v").collect().toSeq
    val plainLeft = big.join(small, Seq("k"), "left").orderBy("k", "v").collect().toSeq
    assert(saltedLeft == plainLeft)
  }

  test("salted aggregation equals the plain aggregation") {
    val df = ((1 to 1000).map(i => (1L, i.toLong)) ++
      (1 to 50).map(i => (2L, i.toLong))).toDF("k", "v")
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", factor = 16)
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(salted == plain)
  }
}
