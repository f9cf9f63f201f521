package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.{ParityQueries, PipelineQueries}

/** Physical-plan assertions: the scale properties (filter pushdown,
  * column pruning, broadcast selection, no stray shuffles) must not
  * regress silently. These read the formatted explain output the same
  * way a reviewer would.
  */
class PlansSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter + projection reach the parquet scan (q02)") {
    val p = plan(ParityQueries.q02Filter(spark, sf0001))
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    // column pruning: the scan must not read the full 16-column lineitem
    assert(p.contains("l_quantity") && !p.contains("l_comment"), p)
  }

  test("dimension lookups are broadcast hash joins, not shuffles (q04)") {
    val p = plan(ParityQueries.q04LookupNames(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("era build shares one shuffle across its windows (q10)") {
    val p = plan(ParityQueries.q10Era(spark, sf0001))
    // lag + running-max + cumsum + final groupBy all share the
    // (person, concept) hash partitioning: expect exactly one Exchange
    val exchanges = """Exchange \(\d""".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges\n$p")
  }

  test("cosine topK broadcasts the query side and keeps scan pruned (p05)") {
    val p = plan(PipelineQueries.p05CosineTopK(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("dot_product_f"), p) // codegen kernel in the plan
  }

  test("LSH candidate generation is an equi-join on the band key (p02)") {
    val p = plan(PipelineQueries.p02MinhashLsh(spark, sf0001))
    // candidates must come from a hash-partitioned equi join, never a
    // nested-loop pair scan
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
  }
}
