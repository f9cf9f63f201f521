package graft

import org.apache.spark.sql.functions._

/** Exactly-once for the self-maintaining loops (round-14 review item
  * #4): a crash injected INSIDE the foreachBatch body — in the old
  * scheme's fatal window between the verdict write and the index
  * append — must leave a restart that replays cleanly: same verdicts
  * as an uncrashed run (no duplicated rows), same index state (no
  * double admission). Both crash windows are exercised: before the
  * intent-log publish (nothing visible, full re-stage) and after it
  * (roll-forward from the staged bytes).
  */
class LoopTxnSpec extends SparkSpec {

  private def runLoop(cmd: String, out: String): Unit =
    Cli.run(spark, List(cmd, sf0001, out))

  private def crashThenRestart(cmd: String, out: String,
      window: String): Unit = {
    Cli.testFailpoint.set(window)
    try {
      val e = intercept[Exception] { runLoop(cmd, out) }
      // the injected crash is what broke the stream, not something else
      def rootOf(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootOf(t.getCause)
      assert(rootOf(e).getMessage.contains(s"injected failpoint: $window"),
        s"unexpected failure: $e")
    } finally Cli.testFailpoint.set(null)
    runLoop(cmd, out) // restart: replay must complete cleanly
  }

  private def assertSame(cleanOut: String, crashOut: String): Unit = {
    val clean = spark.read.parquet(cleanOut)
    val crashed = spark.read.parquet(crashOut)
    assert(clean.count() > 0)
    assert(crashed.exceptAll(clean).count() == 0 &&
      clean.exceptAll(crashed).count() == 0 &&
      crashed.count() == clean.count(), // exact: duplicates would differ
      s"$crashOut diverged from the uncrashed run")
  }

  test("stream-dedup-loop: crash between verdict-write and append replays exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("looptxn").toString
    runLoop("stream-dedup-loop", s"$base/clean")
    for ((window, tag) <- Seq("after_publish" -> "ap",
        "before_publish" -> "bp")) {
      val out = s"$base/crash_$tag"
      crashThenRestart("stream-dedup-loop", out, window)
      assertSame(s"$base/clean", out)
      // no duplicate ADMISSION either: the index state (row counts +
      // order-free checksums of both relations) matches the clean run
      val cert = (p: String) => graft.pipeline.Dedup
        .certifyDedupIndex(spark, s"$p/_artifacts")
        .orderBy("artifact").collect().toSeq
      assert(cert(out) == cert(s"$base/clean"),
        s"index state diverged after $window crash")
    }
  }

  test("stream-ann-loop: crash between answer-write and absorb replays exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("anntxn").toString
    runLoop("stream-ann-loop", s"$base/clean")
    val out = s"$base/crash"
    crashThenRestart("stream-ann-loop", out, "after_publish")
    assertSame(s"$base/clean", out)
    val cert = (p: String) => graft.pipeline.Similarity
      .certifyServingIndex(spark, s"$p/_artifacts")
      .orderBy("artifact").collect().toSeq
    assert(cert(out) == cert(s"$base/clean"),
      "serving index diverged after crash")
  }
}
