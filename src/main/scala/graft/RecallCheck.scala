package graft

import graft.core.Tables
import graft.pipeline.Dedup

/** Diagnostic main: verifies at a given SF that the frequency-capped
  * inverted-index dedup (p04's production configuration) finds exactly
  * the pairs of the unpruned exact scan — the in-Spark recall check
  * for SFs where the exhaustive DuckDB oracle is too slow to run.
  * Usage: runMain graft.RecallCheck <sfDir>
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.core.GraftSession.build(s"local[$cpus]", cpus)
    val docs = Tables.read(spark, dir, "documents")
    val cap = math.max(20, (docs.count() / 10).toInt)
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreq = Some(cap))
    val unpruned = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 4, threshold = 0.4, maxShingleFreq = None)
    val missing = unpruned.exceptAll(capped).count()
    val extra = capped.exceptAll(unpruned).count()
    println(s"""{"recall_check":"p04","dir":"$dir","cap":$cap,""" +
      s""""missing":$missing,"extra":$extra,"ok":${missing == 0 && extra == 0}}""")
    spark.stop()
  }
}
