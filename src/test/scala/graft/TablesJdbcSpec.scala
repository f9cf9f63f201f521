package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.core.Tables

/** The S1 source's JDBC leg (SURVEY §2.1), proven against embedded
  * Derby: the same `Tables.read` namespace string resolves either a
  * parquet directory or a live database, so every operator runs
  * unchanged over both backing stores — the reference's
  * schema-qualified Postgres reads re-expressed as a Spark DataSource.
  */
class TablesJdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withTable[A](ddlName: String)(body: => A): A = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $ddlName")
      catch { case _: java.sql.SQLException => () } // didn't exist
      st.execute(
        s"CREATE TABLE $ddlName (person_id BIGINT, site VARCHAR(16))")
      val ins = conn.prepareStatement(
        s"INSERT INTO $ddlName VALUES (?, ?)")
      for (i <- 1 to 100) {
        ins.setLong(1, i.toLong)
        ins.setString(2, if (i % 2 == 0) "stlouis" else "seattle")
        ins.addBatch()
      }
      ins.executeBatch()
      body
    } finally conn.close()
  }

  test("Tables.read resolves a jdbc: namespace to a database table") {
    withTable("person") {
      val df = Tables.read(spark, url, "person")
      assert(df.columns.map(_.toLowerCase).toSeq ==
        Seq("person_id", "site"))
      assert(df.count() == 100)
      // predicate pushdown reaches the database: the JDBC relation
      // reports the filter as pushed (scan row count is the DB's
      // concern; what matters is Spark handed the WHERE down)
      val filtered = df.filter(col("person_id") <= 10)
      assert(filtered.count() == 10)
      // Derby uppercases unquoted identifiers — match case-insensitively
      val pushed = filtered.queryExecution.executedPlan.toString
      assert(pushed.contains("PushedFilters") &&
        pushed.toLowerCase.contains("lessthanorequal(person_id,10)"),
        s"filter not pushed to JDBC scan:\n$pushed")
    }
  }

  test("parquet namespaces keep resolving through the same entry") {
    val df = Tables.read(spark, sf0001, "nation")
    assert(df.count() > 0)
  }

  test("Tables.write round-trips through a jdbc: namespace") {
    // the S2 sink's database leg: write into the database, read back
    // through the same namespace string, bit-equal rows
    val df = Tables.read(spark, sf0001, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Tables.write(df, url, "nation_rt")
    val back = Tables.read(spark, url, "nation_rt")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"))
    val src = df.select(col("n_nationkey").cast("long").as("n_nationkey"),
      col("n_name"))
    assert(back.exceptAll(src).count() == 0 &&
      src.exceptAll(back).count() == 0 && back.count() == df.count())
    // overwrite mode follows the CTAS drop-and-recreate discipline: a
    // second write replaces, never duplicates
    Tables.write(df.limit(5), url, "nation_rt")
    assert(Tables.read(spark, url, "nation_rt").count() == 5)
  }

  test("transform CLI accepts a <jdbc-url>::<table> target") {
    val out = java.nio.file.Files.createTempDirectory("jdbcsink").toString
    Cli.run(spark, List("transform", sf0001, "siteA", "orders",
      s"$url::orders_tr"))
    Cli.run(spark, List("transform", sf0001, "siteA", "orders",
      s"$out/orders_tr"))
    val viaDb = Tables.read(spark, url, "orders_tr")
    val viaParquet = spark.read.parquet(s"$out/orders_tr")
    assert(viaDb.columns.map(_.toLowerCase).sorted.toSeq ==
      viaParquet.columns.map(_.toLowerCase).sorted.toSeq)
    assert(viaDb.count() == viaParquet.count() && viaDb.count() > 0)
  }

  test("readJdbcPartitioned splits the scan into range tasks") {
    withTable("facts") {
      val df = Tables.readJdbcPartitioned(spark, url, "facts",
        "person_id", lower = 1L, upper = 101L, numPartitions = 4)
      assert(df.rdd.getNumPartitions == 4)
      // every row arrives exactly once across the disjoint ranges
      assert(df.count() == 100)
      assert(df.agg(sum("person_id")).head.getLong(0) == 5050L)
    }
  }
}
