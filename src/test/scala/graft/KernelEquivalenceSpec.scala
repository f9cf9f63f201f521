package graft

import org.apache.spark.sql.functions.col

import graft.core.Tables
import graft.functions.HashKernelFunctions
import graft.pipeline.TextFunctions

/** Native kernels must be element-for-element identical to their HOF
  * reference formulations over real corpus data (the HOF forms are
  * what the DuckDB oracles mirror).
  */
class KernelEquivalenceSpec extends SparkSpec {

  test("ShinglesK kernel equals the HOF shingles for k=3 and k=4") {
    val docs = Tables.read(spark, sf001, "documents")
    for (k <- Seq(3, 4)) {
      val toks = TextFunctions.tokens(col("text"))
      val mismatches = docs.select(
        col("doc_id"),
        HashKernelFunctions.shingles(toks, k).as("kernel"),
        TextFunctions.shingles(toks, k).as("hof"))
        .filter(!(col("kernel") <=> col("hof")))
        .count()
      assert(mismatches == 0L, s"k=$k: $mismatches docs differ")
    }
  }

  test("ShinglesK handles short and empty token arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),        // fewer tokens than k
      (2L, ""),           // empty text
      (3L, "x x x x x"),  // duplicate shingles collapse
      (4L, "a b c d")     // exact window count
    ).toDF("id", "text")
    val toks = TextFunctions.tokens(col("text"))
    val rows = df.select(
      col("id"),
      HashKernelFunctions.shingles(toks, 3).as("kernel"),
      TextFunctions.shingles(toks, 3).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
    val x = rows.find(_.getLong(0) == 3L).get.getSeq[String](1)
    assert(x == Seq("x x x"))
  }

  test("WinnowFps kernel equals the HOF winnow formulation over real docs") {
    val docs = Tables.read(spark, sf001, "documents")
    for ((k, w) <- Seq((3, 4), (2, 3))) {
      val mismatches = docs.select(
        col("doc_id"),
        HashKernelFunctions.winnowFps(
          TextFunctions.tokens(col("text")), k, w).as("kernel"),
        graft.pipeline.Curation.winnowFpsHof("text", k, w).as("hof"))
        .filter(!(col("kernel") <=> col("hof")))
        .count()
      assert(mismatches == 0L, s"k=$k w=$w: $mismatches docs differ")
    }
  }

  test("WinnowFps handles short docs: no shingle -> empty, few hashes -> distinct") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),          // < k tokens: no fingerprints
      (2L, ""),             // empty text
      (3L, "a b c d"),      // 2 hashes < w: both distinct survive
      (4L, "a b c a b c a b c")  // repeats: dedup to few fps
    ).toDF("id", "text")
    val rows = df.select(
      col("id"),
      HashKernelFunctions.winnowFps(
        TextFunctions.tokens(col("text")), 3, 4).as("kernel"),
      graft.pipeline.Curation.winnowFpsHof("text", 3, 4).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 1L).get.getSeq[Long](1).isEmpty)
    assert(rows.find(_.getLong(0) == 3L).get.getSeq[Long](1).size == 2)
  }
}
