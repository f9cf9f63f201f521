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

  test("AQE splits a planted hot person in the id-map join shape") {
    // the justification for NOT hand-salting the production id-map
    // join (see Skew's scaladoc): plant one person carrying ~all the
    // facts, run the exact replaceId join shape un-broadcast, and pin
    // that AQE's runtime skew handling engaged (skew=true in the
    // executed sort-merge join) while the result stays exact
    val prev = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val prevF = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevC = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try {
      // thresholds low enough that the planted skew trips them on a
      // test-sized frame (production defaults need multi-GB partitions)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hot = (1 to 60000).map(i =>
        (1L, i.toLong, "payloadpayloadpayloadpayloadpayload"))
      val tail = (1 to 200).map(i => ((i % 50 + 2).toLong, i.toLong, "x"))
      val facts = (hot ++ tail).toDF("person_id", "fact_id", "payload")
      val idMap = (1L to 60L).map(p => (p, p + 9000L))
        .toDF("site_id", "dcc_id")
      val joined = graft.operators.IdMapping.replaceId(
        facts, "person_id", idMap, nullable = false)
      // execute THIS Dataset's own plan (a count() builds a separate
      // QueryExecution and would leave this one un-adapted), then read
      // the final adaptive plan
      assert(joined.collect().length == 60200)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("skew=true"),
        s"expected AQE skew-split in the executed join:\n$executed")
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prevF)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevC)
    }
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
