package graft

/** Catalog / introspection surface (SURVEY.md §2.11): temp views, SQL over
  * views, DESCRIBE EXTENDED, session conf, collect/show/printSchema. */
class CatalogSpec extends SparkSpec {

  test("temp view + SQL + DESCRIBE EXTENDED + collect") {
    Tables.load(spark, SF, "region").createOrReplaceTempView("region_v")
    val viaSql = spark.sql("SELECT COUNT(*) AS n FROM region_v").first().getLong(0)
    assert(viaSql === 5L)
    val desc = spark.sql("DESCRIBE EXTENDED region_v").collect()
    assert(desc.exists(_.getString(0) == "r_regionkey"))
    assert(spark.catalog.tableExists("region_v"))
    val rows = spark.table("region_v").collect() // C3 + C8
    assert(rows.length === 5)
  }

  test("catalog integrity: unique names, oracle keys subset, entry works") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate catalog names: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size >= 239) // oracle coverage floor
    assert(SparkEntry.entry(spark).count() > 0) // driver smoke contract
  }

  test("session conf round-trip (C5) and schema probe (C6)") {
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    assert(spark.conf.get("spark.sql.legacy.timeParserPolicy") === "LEGACY")
    val schema = Tables.load(spark, SF, "lineitem").schema
    assert(schema.fieldNames.contains("l_orderkey"))
  }
}
