package graft

import graft.model.SchemaRegistry

class SchemaRegistrySpec extends SparkSpec {
  test("registry caches schemas with pk identity and invalidates on demand") {
    val reg = new SchemaRegistry(spark, sf)
    val li = reg.get("lineitem")
    assert(li.pkCols == Seq("l_orderkey", "l_linenumber"))
    assert(li.schema.fieldNames.contains("l_extendedprice"))
    assert(reg.cachedTables == Set("lineitem"))
    val again = reg.get("lineitem")
    assert(again eq li) // cached instance
    reg.invalidate("lineitem")
    assert(reg.cachedTables.isEmpty)
    assert(reg.get("lineitem").pkCols == li.pkCols) // refetched
  }

  test("drift detector invalidates on footer schema change (DDL analog)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    spark.range(5).select(col("id").as("event_id"), lit("a").as("v"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val reg = new SchemaRegistry(spark, dir)
    val before = reg.get("events")
    assert(reg.detectDrift("events").isEmpty) // no drift: cache stands
    assert(reg.cachedTables == Set("events"))
    // ALTER TABLE analog: the table gains a column on disk
    spark.range(5).select(col("id").as("event_id"), lit("a").as("v"),
      lit(1).as("extra"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val drift = reg.detectDrift("events")
    assert(drift.isDefined)
    val (old, neu) = drift.get
    assert(old == before.schema && neu.fieldNames.contains("extra"))
    assert(reg.cachedTables.isEmpty) // invalidated
    assert(reg.get("events").schema.fieldNames.contains("extra")) // re-read
    // untracked tables never drift (nothing cached to compare)
    assert(reg.detectDrift("nosuch").isEmpty)
  }
}
