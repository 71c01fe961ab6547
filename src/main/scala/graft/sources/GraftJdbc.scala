package graft.sources

import java.util.Properties
import org.apache.spark.sql.SparkSession

/** External-catalog JDBC entry point — the Spark-native analog of the
  * reference connecting to its metastore by URL + credentials
  * (MetaUtils.java:25-82 opens the catalog from job conf;
  * Configs.java:8-10 defines the ARGODB_JDBC_URL / USER / PASSWORD
  * keys). Graft reads the same url/user/password TRIPLE from Spark
  * conf (`spark.graft.jdbc.*`); when unset it falls back to an
  * embedded in-memory Apache Derby database (public, ships with
  * Spark), so the JDBC surface is exercisable with zero external
  * infrastructure.
  *
  * Scale shape: `spark.read.jdbc` with a partition column + stride —
  * every executor opens its OWN connection and reads its OWN key
  * range (N parallel range scans, no single-connection funnel), which
  * is the only JDBC read pattern that survives a 1000-executor
  * cluster. The SQL-by-name surface is Spark's own
  * `JDBCTableCatalog` pointed at the same triple (see
  * `registerSqlCatalog`), mirroring how the reference exposes
  * `database.table` names from its metastore.
  */
object GraftJdbc {

  val UrlKey = "spark.graft.jdbc.url"
  val UserKey = "spark.graft.jdbc.user"
  val PasswordKey = "spark.graft.jdbc.password"

  /** Derby writes derby.log (and nothing else for memory: DBs) under
    * derby.system.home — point it at the scratch dir, not the repo.
    */
  private lazy val derbyHome: String = {
    val home = GraftSink.scratchDir + "/derby"
    new java.io.File(home).mkdirs()
    System.setProperty("derby.system.home", home)
    home
  }

  private def defaultUrl: String = {
    derbyHome
    "jdbc:derby:memory:graftdb;create=true"
  }

  def url(s: SparkSession): String =
    s.conf.getOption(UrlKey).getOrElse(defaultUrl)

  /** user/password from conf (absent keys are simply not sent —
    * embedded Derby runs without authentication).
    */
  def connectionProperties(s: SparkSession): Properties = {
    val p = new Properties()
    s.conf.getOption(UserKey).foreach(p.setProperty("user", _))
    s.conf.getOption(PasswordKey).foreach(p.setProperty("password", _))
    p
  }

  /** Register Spark's DSv2 JDBC catalog under `name`, bound to the
    * configured (or embedded) database — after this,
    * `SELECT ... FROM <name>.<schema>.<table>` works directly, the
    * metastore-by-name entry point shape.
    */
  def registerSqlCatalog(s: SparkSession, name: String): Unit = {
    s.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    s.conf.set(s"spark.sql.catalog.$name.url", url(s))
    s.conf.getOption(UserKey).foreach(u => s.conf.set(s"spark.sql.catalog.$name.user", u))
    s.conf.getOption(PasswordKey).foreach(pw => s.conf.set(s"spark.sql.catalog.$name.password", pw))
  }
}
