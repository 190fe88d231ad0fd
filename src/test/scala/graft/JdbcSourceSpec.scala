package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.apache.spark.sql.functions._

/** S5: JDBC scan — the reference reads a SQLite study database with lazy
  * dbplyr SQL pushdown (ref: src/11_integrate_toxrefdb.R:3,31-33,48-52).
  * No SQLite driver ships in this container, but Derby (Spark's embedded
  * metastore DB) does, and the engine surface is identical:
  * spark.read.format("jdbc") with either a dbtable or a pushed-down
  * subquery. This spec builds a study table in embedded Derby and proves
  * both access paths plus filter pushdown into the JDBC source.
  */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private var dbDir: java.nio.file.Path = _

  private lazy val url: String = {
    dbDir = Files.createTempDirectory("graft-derby")
    val dir = dbDir.toString
    // Derby writes derby.log into user.dir (the repo root) unless told
    // otherwise — point it at the temp dir so test runs leave no
    // artifacts behind
    System.setProperty("derby.stream.error.file", s"$dir/derby.log")
    val u = s"jdbc:derby:$dir/studydb;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE study (
        |  study_id INT PRIMARY KEY,
        |  species VARCHAR(32),
        |  endpoint VARCHAR(64),
        |  dose DOUBLE)""".stripMargin)
    val rows = Seq(
      (1, "rat", "LEL", 10.0), (2, "rat", "NOEL", 25.0),
      (3, "mouse", "LEL", 5.0), (4, "rabbit", "NOEL", 50.0),
      (5, "rat", "LOAEL", 12.5))
    val ps = conn.prepareStatement("INSERT INTO study VALUES (?, ?, ?, ?)")
    rows.foreach { case (id, sp, ep, d) =>
      ps.setInt(1, id); ps.setString(2, sp)
      ps.setString(3, ep); ps.setDouble(4, d)
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
    u
  }

  private def jdbc(table: String) =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", table)
      .load()

  test("JDBC table scan reads the full study table") {
    val df = jdbc("study")
    assert(df.count() == 5)
    assert(df.columns.map(_.toLowerCase).toSet
      == Set("study_id", "species", "endpoint", "dose"))
    val rats = df.filter(lower(col("species")) === "rat")
      .select("STUDY_ID").collect().map(_.getInt(0)).sorted.toSeq
    assert(rats == Seq(1, 2, 5))
  }

  test("filter pushdown reaches the JDBC source") {
    val df = jdbc("study").filter(col("species") === "rat")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("SPECIES"),
      scan)
    assert(df.count() == 3)
  }

  test("subquery pushdown: the database evaluates the SQL (dbplyr shape)") {
    val df = jdbc(
      "(SELECT species, COUNT(*) AS n FROM study GROUP BY species) t")
    // Derby COUNT(*) maps to INTEGER through JDBC
    val got = df.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("rat" -> 3, "mouse" -> 1, "rabbit" -> 1))
  }

  override def afterAll(): Unit = {
    // shut down ONLY this spec's database (not the whole embedded
    // engine — ToxrefdbAdapter's study DB shares the engine in-JVM), so
    // its files close and the temp directory can be removed
    try DriverManager.getConnection(
      s"jdbc:derby:${dbDir.toString}/studydb;shutdown=true")
    catch { case _: java.sql.SQLException => () } // shutdown always throws
    if (dbDir != null) {
      import scala.jdk.CollectionConverters._
      Files.walk(dbDir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => p.toFile.delete())
    }
    super.afterAll()
  }
}
