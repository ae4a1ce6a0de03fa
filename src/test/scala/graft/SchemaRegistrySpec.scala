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
}
