package graft

import org.apache.spark.sql.functions.col

import graft.functions.PgAge
import graft.pipeline.Similarity

/** SQL-registered native functions must match their Column-API twins
  * exactly (same Catalyst expressions underneath).
  */
class ExtensionsSpec extends SparkSpec {

  test("months_in_interval is callable from SQL and matches the Column API") {
    val sqlVal = spark.sql(
      """SELECT months_in_interval(TIMESTAMP '2019-02-20 00:00:00',
        |                          TIMESTAMP '2021-03-15 10:30:00') AS m""".stripMargin)
      .head().getDouble(0)
    import spark.implicits._
    val colVal = Seq(("2019-02-20 00:00:00", "2021-03-15 10:30:00"))
      .toDF("a", "b")
      .select(PgAge.months_in_interval(
        col("a").cast("timestamp"), col("b").cast("timestamp")).as("m"))
      .head().getDouble(0)
    assert(sqlVal == colVal)
    assert(sqlVal > 24.0 && sqlVal < 26.0, sqlVal)
  }

  test("dot_product_f / l2_norm_f are callable from SQL with casts applied") {
    val row = spark.sql(
      """SELECT dot_product_f(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       l2_norm_f(array(3.0D, 4.0D)) AS n""".stripMargin).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 5.0)
  }

  test("SQL cosine from registered kernels matches Similarity.cosine") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50)
    emb.createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      """SELECT vec_id,
        |  dot_product_f(embedding, embedding)
        |    / (l2_norm_f(embedding) * l2_norm_f(embedding)) AS c
        |FROM ext_emb""".stripMargin)
    val viaCol = emb.select(col("vec_id"),
      Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(viaSql.exceptAll(viaCol).count() == 0)
    assert(viaCol.exceptAll(viaSql).count() == 0)
  }
}
