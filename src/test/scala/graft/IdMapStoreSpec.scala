package graft

import org.apache.spark.sql.functions._

import graft.operators.{IdMapping, IdMapStore}

/** Id-map lifecycle across data cycles (SURVEY.md §7.4 risk 4): maps
  * and last-id counters persist, extend monotonically, and copy to the
  * next cycle's store — existing mappings never change.
  */
class IdMapStoreSpec extends SparkSpec {
  import spark.implicits._

  test("id maps persist, extend from the stored counter, and copy cycles") {
    val store = "/tmp/graft_idmap_store"
    val store2 = "/tmp/graft_idmap_store2"
    Seq(store, store2).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    new java.io.File(store).mkdirs()
    new java.io.File(store2).mkdirs()

    // cycle 1: map the customers that have orders
    val facts1 = Seq(10L, 20L, 30L).toDF("custkey")
    val (m0, l0) = IdMapStore.load(spark, store, "customer")
    assert(l0 == 0L && m0.count() == 0L)
    val (m1, l1) = IdMapping.extendMap(facts1, "custkey", m0, l0)
    IdMapStore.save(m1, l1, store, "customer")
    assert(l1 == 3L)

    // cycle 1 again (idempotent): nothing new to map
    val (m1b, l1b) = IdMapStore.load(spark, store, "customer")
    val (m1c, l1c) = IdMapping.extendMap(facts1, "custkey", m1b, l1b)
    assert(l1c == 3L && m1c.count() == 3L)

    // cycle 2: two new keys arrive; old mappings must be unchanged
    val facts2 = Seq(10L, 20L, 30L, 40L, 50L).toDF("custkey")
    val (m2, l2) = IdMapping.extendMap(facts2, "custkey", m1b, l1b)
    IdMapStore.save(m2, l2, store, "customer")
    assert(l2 == 5L)
    val (m2b, _) = IdMapStore.load(spark, store, "customer")
    val mapped = m2b.orderBy("site_id")
      .as[(Long, Long)].collect().toSeq
    assert(mapped == Seq((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L), (50L, 5L)))

    // copy into the next cycle's store (pg_dump/pg_restore parity)
    IdMapStore.copyCycle(spark, store, store2, "customer")
    val (m3, l3) = IdMapStore.load(spark, store2, "customer")
    assert(l3 == 5L && m3.count() == 5L)
  }

  test("a crash stranded between the swap renames still loads the old map") {
    val store = "/tmp/graft_idmap_store_crash"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    new java.io.File(store).mkdirs()

    val facts = Seq(10L, 20L, 30L).toDF("custkey")
    val (m0, l0) = IdMapStore.load(spark, store, "customer")
    val (m1, l1) = IdMapping.extendMap(facts, "custkey", m0, l0)
    IdMapStore.save(m1, l1, store, "customer")

    // simulate a crash between rename(live -> __prev) and
    // rename(staging -> live): live is gone, __prev holds the old state
    val live = new java.io.File(s"$store/customer_ids")
    val prev = new java.io.File(s"$store/customer_ids__prev")
    org.apache.commons.io.FileUtils.deleteQuietly(prev)
    assert(live.renameTo(prev))

    // load MUST fall back to __prev: same mappings, same counter —
    // never (empty, 0), which would reassign dcc ids from 1
    val (m2, l2) = IdMapStore.load(spark, store, "customer")
    assert(l2 == 3L, "crash recovery must preserve the last id")
    val mapped = m2.orderBy("site_id").as[(Long, Long)].collect().toSeq
    assert(mapped == Seq((10L, 1L), (20L, 2L), (30L, 3L)))

    // and the next save publishes cleanly over the recovered state
    val (m3, l3) = IdMapping.extendMap(
      Seq(10L, 20L, 30L, 40L).toDF("custkey"), "custkey", m2, l2)
    IdMapStore.save(m3, l3, store, "customer")
    val (m4, l4) = IdMapStore.load(spark, store, "customer")
    assert(l4 == 4L && m4.count() == 4L)
  }
}
