package graft

class CliSpec extends SparkSpec {

  test("CLI jobs run end-to-end on sf0.001") {
    val out = "/tmp/graft_cli_test"
    Cli.run(spark, List("transform", sf0001, "siteA", "orders", s"$out/transform"))
    assert(spark.read.parquet(s"$out/transform").columns.contains("site"))

    Cli.run(spark, List("merge", s"$out/merge", "nation", sf0001, sf0001))
    assert(spark.read.parquet(s"$out/merge").count() == 50L)

    Cli.run(spark, List("split", sf0001, "part", "p_size", s"$out/split"))
    assert(spark.read.parquet(s"$out/split/small").count() > 0)
    assert(new java.io.File(s"$out/split/other").exists())

    Cli.run(spark, List("dedup-exact", sf0001, s"$out/dedup"))
    assert(spark.read.parquet(s"$out/dedup").columns.toSet ==
      Set("fp", "keep_id", "n_copies"))
  }
}
