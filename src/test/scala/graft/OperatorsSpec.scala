package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("Compact rewrites a fragmented parquet dir to the size target, content-identical") {
    val dir = "/tmp/graft_compact_test"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val src = spark.read.parquet(s"$sf0001/lineitem.parquet")
    src.repartition(24).write.parquet(dir)
    val r = Compact.compact(spark, dir, targetBytes = 1L << 30)
    assert(r.filesBefore == 24 && r.filesAfter == 1, r)
    val after = spark.read.parquet(dir)
    assert(after.count() == src.count())
    assert(after.except(src).isEmpty && src.except(after).isEmpty)
    // the retired file set is retained for crash fallback, swap-style
    assert(new java.io.File(dir + "__prev").exists())
  }

  test("Compact preserves a Hive-partitioned layout, one file per partition dir") {
    val dir = "/tmp/graft_compact_part_test"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val src = spark.read.parquet(s"$sf0001/orders.parquet")
    src.repartition(8).write.partitionBy("o_orderstatus").parquet(dir)
    val r = Compact.compact(spark, dir, targetBytes = 1L << 30)
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.contains("=")).toSeq
    assert(partDirs.nonEmpty, "partition layout must survive compaction")
    // nOut=1 → rows cluster into one task → one file per partition dir
    partDirs.foreach { d =>
      val files = d.listFiles().count(f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(files == 1, s"${d.getName}: $files files")
    }
    assert(r.filesBefore > r.filesAfter, r)
    val after = spark.read.parquet(dir).select(src.columns.map(col): _*)
    assert(after.count() == src.count())
    assert(after.except(src).isEmpty && src.except(after).isEmpty)
  }

  test("EraBuilder merges overlapping and within-gap intervals") {
    val df = Seq(
      // person 1, concept 10: [Jan1,Jan5], [Jan20,Jan25] (gap 15d <= 30 → merge),
      // [Mar15,Mar16] (gap 49d > 30 → new era)
      (1L, 10L, d("2020-01-01"), d("2020-01-05")),
      (1L, 10L, d("2020-01-20"), d("2020-01-25")),
      (1L, 10L, d("2020-03-15"), d("2020-03-16")),
      // person 1, concept 11: single row
      (1L, 11L, d("2020-06-01"), d("2020-06-02")),
      // person 2, concept 10: contained interval
      (2L, 10L, d("2020-01-01"), d("2020-12-31")),
      (2L, 10L, d("2020-03-01"), d("2020-03-02"))
    ).toDF("person_id", "concept_id", "start_date", "end_date")

    val eras = EraBuilder
      .eras(df, Seq("person_id", "concept_id"), "start_date", "end_date", 30)
      .orderBy("person_id", "concept_id", "era_id")
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDate(3).toString,
          r.getDate(4).toString, r.getLong(5)))

    assert(
      eras.toSeq == Seq(
        (1L, 10L, 1L, "2020-01-01", "2020-01-25", 2L),
        (1L, 10L, 2L, "2020-03-15", "2020-03-16", 1L),
        (1L, 11L, 1L, "2020-06-01", "2020-06-02", 1L),
        (2L, 10L, 1L, "2020-01-01", "2020-12-31", 2L)
      ))
  }

  test("EraBuilder boundary: start exactly gap days after running end merges") {
    val df = Seq(
      (1L, 1L, d("2020-01-01"), d("2020-01-10")),
      (1L, 1L, d("2020-02-09"), d("2020-02-10")) // Jan10+30d = Feb9 → merge
    ).toDF("p", "c", "s", "e")
    val eras = EraBuilder.eras(df, Seq("p", "c"), "s", "e", 30).collect()
    assert(eras.length == 1)
  }

  test("AssignIds numbers rows contiguously in order across partitions") {
    val df = spark.range(0, 1000).toDF("v").repartition(7)
    val out = AssignIds.assign(df, Seq("v"), "id", start = 100L)
    val rows = out.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.head == (0L, 100L))
    assert(rows.last == (999L, 1099L))
    assert(rows.forall { case (v, id) => id == v + 100L })
  }

  test("AsOfJoin picks nearest within tolerance, inner semantics") {
    val wt = Seq(
      (1L, 100L, "2020-01-10 00:00:00"),
      (1L, 101L, "2020-06-01 00:00:00"), // no height within 60d
      (2L, 102L, "2020-01-10 00:00:00")
    ).toDF("person_id", "wt_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val ht = Seq(
      (1L, 201L, "2020-01-01 00:00:00"), // 9d before
      (1L, 202L, "2020-01-25 00:00:00"), // 15d after
      (2L, 203L, "2020-01-09 00:00:00"), // 1d before → nearest
      (2L, 204L, "2020-01-11 00:00:00")  // 1d after, tie → earlier ts wins
    ).toDF("person_id", "ht_id", "ts").withColumn("ts", col("ts").cast("timestamp"))

    val paired = AsOfJoin
      .nearest(wt, ht, Seq("person_id"), "ts", "ts", 60L * 86400,
        leftUnique = Seq("wt_id"), rightTiebreak = Seq("ht_id"))
      .select("person_id", "wt_id", "r_ht_id")
      .orderBy("wt_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(paired.toSeq == Seq((1L, 100L, 201L), (2L, 102L, 203L)))
  }

  test("AsOfJoin matches a pair at exactly the tolerance across a bucket edge") {
    // tolerance 100s: left at t=150 (bucket 1), right at t=250 (bucket 2,
    // |dt| == tolerance) and t=49 (bucket 0, |dt| == 101 > tol). The
    // bucket +/-1 probe must catch the exact-boundary neighbor and the
    // residual predicate must still reject the out-of-tolerance one.
    val l = Seq((1L, 10L, 150L)).toDF("k", "lid", "ts")
    val r = Seq((1L, 20L, 250L), (1L, 21L, 49L)).toDF("k", "rid", "ts")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts",
        toleranceSec = 100L, leftUnique = Seq("lid"),
        rightTiebreak = Seq("rid"))
      .select("lid", "r_rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 20L)))
  }

  test("AsOfJoin buckets stay exact past 2^53 (nano-scale timestamps)") {
    // quotients ~1.5e18 are unrepresentable in double: the old
    // double-division bucket id could land either side of the true
    // floor. The SQL `div` path must pair the in-tolerance neighbor
    // and reject the out-of-tolerance one regardless of magnitude.
    val base = 1L << 62
    val l = Seq((1L, 10L, base)).toDF("k", "lid", "ts")
    val r = Seq((1L, 20L, base + 2L), (1L, 21L, base - 4L))
      .toDF("k", "rid", "ts")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "ts", "ts",
        toleranceSec = 3L, leftUnique = Seq("lid"),
        rightTiebreak = Seq("rid"))
      .select("lid", "r_rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 20L)))
  }

  test("IdMapping extendMap + replaceId round-trip") {
    val facts = Seq((1001L, "a"), (1002L, "b"), (1003L, "c")).toDF("mk", "payload")
    val empty = Seq.empty[(Long, Long)].toDF("site_id", "dcc_id")
    val (map1, last1) = IdMapping.extendMap(facts, "mk", empty, lastId = 0L)
    assert(last1 == 3L)
    assert(map1.orderBy("site_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1001L, 1L), (1002L, 2L), (1003L, 3L)))

    // idempotency: re-extending with the same facts adds nothing
    val (map2, last2) = IdMapping.extendMap(facts, "mk", map1, last1)
    assert(last2 == 3L && map2.count() == 3)

    val replaced = IdMapping
      .replaceId(facts, "mk", map1, nullable = false, keepSiteId = true)
      .orderBy("site_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(replaced.toSeq == Seq((1L, "a", 1001L), (2L, "b", 1002L), (3L, "c", 1003L)))
  }

  test("IdMapping polymorphic join maps per-domain, NULL for unmapped domain") {
    val fr = Seq((100, 5001L), (200, 5001L), (300, 5001L))
      .toDF("domain_concept_id_1", "fact_id_1")
    val maps = Map(
      100 -> Seq((5001L, 1L)).toDF("site_id", "dcc_id"),
      200 -> Seq((5001L, 2L)).toDF("site_id", "dcc_id"))
    val out = IdMapping
      .replacePolymorphicId(fr, "domain_concept_id_1", "fact_id_1", maps)
      .orderBy("domain_concept_id_1")
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getLong(1)))
    assert(out.toSeq == Seq((100, 1L), (200, 2L), (300, null)))
  }

  test("Checks: pk duplicates, fk orphans, not-null violations") {
    val child = Seq((1L, Some(10L)), (2L, Some(99L)), (2L, None))
      .toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pid")
    assert(Checks.pkDuplicates(child, Seq("id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(
      Checks.fkOrphans(child, Seq("fk"), parent, Seq("pid")).collect().map(_.getLong(0)).toSeq
        == Seq(2L)) // NULL fk is not an orphan
    assert(Checks.notNullViolations(child, Seq("fk")).count() == 1)
  }

  test("SetOps: mergeSites unions by fixed field list") {
    val merged = SetOps.mergeSites(spark, Seq(sf0001, sf0001), "nation",
      Seq("n_nationkey", "n_name"))
    assert(merged.count() == 50)
    assert(merged.columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("SetOps: splitByConceptSets partitions exhaustively") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "concept")
    val slices = SetOps.splitByConceptSets(df, "concept",
      Map("a" -> Set(10L), "b" -> Set(20L)))
    assert(slices("a").count() == 1 && slices("b").count() == 1 && slices("other").count() == 1)
  }

  test("SetOps: idempotentAppend skips existing keys") {
    val target = Seq((1L, "x")).toDF("id", "v")
    val incoming = Seq((1L, "x2"), (2L, "y")).toDF("id", "v")
    val out = SetOps.idempotentAppend(target, incoming, Seq("id"))
    assert(out.count() == 2)
    assert(out.filter($"id" === 1L).head().getString(1) == "x") // original kept
  }

  test("SetOps: updateJoin replaces matched, keeps unmatched") {
    val df = Seq((1L, "old1"), (2L, "old2")).toDF("id", "name")
    val src = Seq((1L, "new1")).toDF("id", "newname")
    val out = SetOps.updateJoin(df, src, Seq("id"), "name", "newname")
      .orderBy("id").collect().map(_.getString(1))
    assert(out.toSeq == Seq("new1", "old2"))
  }

  test("ObservationPeriod.sync unions domains and takes per-person extremes") {
    val d1 = Seq((1L, d("2020-01-05")), (2L, d("2020-02-01"))).toDF("person_id", "dt")
    val d2 = Seq((1L, d("2019-12-01")), (1L, d("2021-01-01"))).toDF("person_id", "dt")
    val out = ObservationPeriod
      .sync(Seq((d1, col("dt")), (d2, col("dt"))))
      .orderBy("person_id")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2019-12-01", "2021-01-01", 1L),
      (2L, "2020-02-01", "2020-02-01", 2L)))
  }

  test("Statistics.histogram bins equi-width, max value in last bin, constant column in bin 0") {
    import spark.implicits._
    val df = Seq(0.0, 1.0, 4.9, 5.0, 9.9, 10.0).toDF("x")
    val out = graft.operators.Statistics.histogram(df, "x", buckets = 2)
      .as[(Long, Long)].collect().toMap
    // width 5: [0,5) -> bin 0 has {0,1,4.9}; [5,10] -> bin 1 has {5,9.9,10}
    assert(out == Map(0L -> 3L, 1L -> 3L))
    val const = Seq(7.0, 7.0).toDF("x")
    val cOut = graft.operators.Statistics.histogram(const, "x", buckets = 4)
      .as[(Long, Long)].collect().toMap
    assert(cOut == Map(0L -> 2L))
  }

  test("Statistics.histogram drops NULLs instead of counting them in the top bucket") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(0.0), None, Some(10.0), None)
      .toDF("x")
    val out = graft.operators.Statistics.histogram(df, "x", buckets = 2)
      .as[(Long, Long)].collect().toMap
    // the two NULLs must not inflate bucket 1
    assert(out == Map(0L -> 1L, 1L -> 1L))
  }
}
