package graft

import graft.operators.Relational
import graft.sources.GraftJdbc
import org.apache.spark.sql.functions._

class JdbcSpec extends SparkSpecBase {

  test("jdbc round trip is row-exact and reads through 4 partitioned connections") {
    val back = Relational.srcJdbcRoundtrip(spark, sfDir)
    // stride read: 4 key-range partitions, each its own connection
    // (checked on the bare scan — the query's orderBy shuffles after)
    val scan = spark.read.jdbc(GraftJdbc.url(spark), "graft_supplier",
      "s_suppkey", 1L, 101L, 4, GraftJdbc.connectionProperties(spark))
    assert(scan.rdd.getNumPartitions === 4)
    val got = back.collect()
    val want = new graft.sources.GraftCatalog(spark, sfDir).table("supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey").collect()
    assert(got.length === want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("key predicates push into the database, not the Spark filter") {
    Relational.srcJdbcRoundtrip(spark, sfDir) // (re)load the table
    val url = GraftJdbc.url(spark)
    val filtered = spark.read
      .jdbc(url, "graft_supplier", GraftJdbc.connectionProperties(spark))
      .where(col("s_suppkey") <= 3)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      s"filter not pushed to JDBC:\n$plan")
    // keys start at 0, so <= 3 keeps 0,1,2,3
    assert(filtered.count() === 4)
  }

  test("the database is SQL-visible by name through a registered JDBC catalog") {
    Relational.srcJdbcRoundtrip(spark, sfDir)
    GraftJdbc.registerSqlCatalog(spark, "graftjdbc")
    // Derby upper-cases the unquoted name write.jdbc created
    val n = spark.sql(
      "SELECT count(*) AS n FROM graftjdbc.APP.GRAFT_SUPPLIER").head().getLong(0)
    val want = new graft.sources.GraftCatalog(spark, sfDir).table("supplier").count()
    assert(n === want)
  }
}
