package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Bit-equality pins for the native argmin kernels
  * ([[graft.functions.CentroidArgminF]] / PqArgminF / PqArgminD)
  * against the formulations they replaced in the round-15
  * optimization pass:
  *
  *  - `greatest(struct(cosine(v, lit-array), -id, id), …)` — the
  *    folded-literal tree (centroid assignment / PQ code argmin);
  *  - `crossJoin(broadcast(cents)) + max(struct(sim, tie, …))` — the
  *    aggregate form (semanticCells / ivfCellIndex / lloydStep).
  *
  * The kernels must reproduce the same winner on every row, including
  * exact ties (duplicate centroids under distinct ids → smaller id)
  * and the degenerate zero-vector row (all-NaN sims → smallest id,
  * matching greatest/max's first-of-equals under Double.compare).
  */
class ArgminKernelSpec extends SparkSpec {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotF(a, b)
  private def l2(a: Column): Column =
    graft.functions.VectorExpressions.l2normF(a)
  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2(a) * l2(b))
  private def dist2(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Deterministic pseudo-random float in [-8, 8). */
  private def f(seed: Int): Float = {
    val h = (seed * 2654435761L) & 0xffffffffL
    ((h % 1600).toInt - 800) / 100.0f
  }

  private def vec(seed: Int, dim: Int): Seq[Float] =
    (0 until dim).map(d => f(seed * 131 + d))

  private val dim = 16
  // ids deliberately unsorted; one duplicate vector under two ids (a
  // forced exact tie), plus the corpus rows below include a zero vector
  private val cents: Seq[(Long, Seq[Float])] =
    Seq(7L -> vec(3, dim), 2L -> vec(1, dim), 11L -> vec(2, dim),
      5L -> vec(1, dim), 9L -> vec(4, dim))

  // NOTE no zero vector here: under ANSI mode the OLD folded form
  // throws DIVIDE_BY_ZERO on a zero-norm row (double `/` is the ANSI
  // Divide), so zero vectors were never in the operators' domain; the
  // kernel's NaN behavior is pinned separately below.
  private def corpus = {
    import spark.implicits._
    ((1 to 200).map(i => (i.toLong, vec(i + 50, dim))) :+
      (901L, vec(1, dim))              // exactly equal to two centroids
      ).toDF("vec_id", "v")
  }

  test("centroid argmin kernel == folded greatest(struct(cosine)) tree") {
    val structs = cents.sortBy(_._1).map { case (id, ce) =>
      struct(cosine(col("v"), array(ce.map(lit(_)): _*)).as("sim"),
        lit(-id).as("tie"), lit(id).as("cell"))
    }
    val folded = greatest(structs: _*)
    val got = corpus.select(col("vec_id"),
      Similarity.centroidAssignExpr(cents, col("v")).as("w"))
      .select(col("vec_id"), col("w.sim"), col("w.cell"))
    val want = corpus.select(col("vec_id"), folded.as("w"))
      .select(col("vec_id"), col("w.sim"), col("w.cell"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "kernel diverged from the folded-literal form")
    // the tie row must resolve to the smaller of the two duplicate ids
    val tieCell = got.filter(col("vec_id") === 901L)
      .select("cell").head().getLong(0)
    assert(tieCell == 2L, s"tie broke to $tieCell, expected 2")
  }

  test("centroid argmin kernel == crossJoin + max(struct) aggregate") {
    import spark.implicits._
    val centsDf = broadcast(
      cents.map { case (id, ce) => (id, ce) }.toDF("cent_id", "ce")
        .select(col("cent_id"), col("ce"), l2(col("ce")).as("ce_n")))
    val want = corpus
      .select(col("vec_id"), col("v"), l2(col("v")).as("vn"))
      .crossJoin(centsDf)
      .withColumn("__sim",
        dot(col("v"), col("ce")) / (col("vn") * col("ce_n")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("__sim"), (-col("cent_id")).as("tie"),
        col("cent_id"))).as("best"))
      .select(col("vec_id"), col("best.cent_id").as("cell"))
    val got = corpus.select(col("vec_id"),
      Similarity.centroidAssignExpr(cents, col("v")).getField("cell")
        .as("cell"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "kernel diverged from the aggregate form")
  }

  test("pq argmin kernels == folded greatest(struct(-dist2)) trees") {
    val entriesF: Seq[(Long, Array[Float])] =
      Seq(4L -> vec(21, dim).toArray, 1L -> vec(22, dim).toArray,
        8L -> vec(21, dim).toArray, 3L -> vec(23, dim).toArray)
    val foldedF = {
      val scored = entriesF.sortBy(_._1).map { case (cid, ce) =>
        struct((-dist2(col("v"), array(ce.toIndexedSeq.map(lit(_)): _*)))
          .as("negd"), lit(-cid).as("tie"), lit(cid).as("cent_id"))
      }
      greatest(scored: _*).getField("cent_id")
    }
    val gotF = corpus.select(col("vec_id"),
      graft.functions.VectorExpressions.pqArgminF(col("v"), entriesF)
        .as("code"))
    val wantF = corpus.select(col("vec_id"), foldedF.as("code"))
    assert(gotF.exceptAll(wantF).isEmpty && wantF.exceptAll(gotF).isEmpty,
      "float kernel diverged from the folded form")
    // the duplicate entry pair (4, 8) must tie to 4 whenever it wins
    val winners = gotF.select("code").distinct().collect().map(_.getLong(0))
    assert(!winners.contains(8L), "tie resolved to the larger id")

    val entriesD: Seq[(Long, Array[Double])] =
      entriesF.map { case (id, ce) => (id, ce.map(_.toDouble)) }
    val dcorpus = corpus.select(col("vec_id"),
      transform(col("v"), x => x.cast("double")).as("v"))
    val foldedD = {
      val dotD = graft.functions.VectorExpressions.dotD _
      def dist2D(a: Column, b: Column): Column =
        dotD(a, a) - lit(2.0) * dotD(a, b) + dotD(b, b)
      val scored = entriesD.sortBy(_._1).map { case (cid, ce) =>
        struct((-dist2D(col("v"), array(ce.toIndexedSeq.map(lit(_)): _*)))
          .as("negd"), lit(-cid).as("tie"), lit(cid).as("cent_id"))
      }
      greatest(scored: _*).getField("cent_id")
    }
    val gotD = dcorpus.select(col("vec_id"),
      graft.functions.VectorExpressions.pqArgminD(col("v"), entriesD)
        .as("code"))
    val wantD = dcorpus.select(col("vec_id"), foldedD.as("code"))
    assert(gotD.exceptAll(wantD).isEmpty && wantD.exceptAll(gotD).isEmpty,
      "double kernel diverged from the folded form")
  }

  test("zero-norm row: kernel yields the smallest id (all-NaN tie)") {
    import spark.implicits._
    val z = Seq((900L, Seq.fill(dim)(0.0f))).toDF("vec_id", "v")
    val cell = z.select(
      Similarity.centroidAssignExpr(cents, col("v")).getField("cell")
        .as("cell")).head().getLong(0)
    assert(cell == 2L, s"expected smallest id 2, got $cell")
  }

  test("kernels run inside whole-stage codegen over a real scan") {
    // parquet-backed so ConvertToLocalRelation can't fold the kernel
    // away driver-side
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents64 = Seq(1L -> vec(31, 64), 2L -> vec(32, 64))
    val df = emb.select(
      Similarity.centroidAssignExpr(cents64, col("embedding"))
        .getField("cell").as("cell"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("centroid_argmin_f"), p)
    assert(!p.contains("Exchange"), p)
    // formatted mode marks fused operators with `[codegen id : n]`
    assert(p.contains("[codegen id : 1]"), p)
    df.count() // and it executes
  }
}
