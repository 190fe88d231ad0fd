package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.harmonize.Harmonize
import graft.model.Model
import graft.sources.{EventsAdapter, OrdersAdapter}

/** S2 (glob/recursive scan + path provenance), S9 (parquet sink), and the
  * typed model layer — the staging-directory round trip the reference's
  * harmonize performs (src/80_harmonize.py:20-43).
  */
class SourceSinkSpec extends SparkSpec {
  import spark.implicits._

  test("staging sink + recursive glob scan + path provenance round-trip") {
    val root = Files.createTempDirectory("graft-staging").toString
    val staged = Seq(EventsAdapter, OrdersAdapter)
      .map(a => a.name -> a.staging(spark, sf()))
    // S9: one triplet directory per source, overwrite mode
    staged.foreach { case (name, t) =>
      t.substances.write.mode("overwrite")
        .parquet(s"$root/$name/substances.parquet")
    }
    // S2+S3: recursive scan over the staging tree, source from the path
    val scanned = spark.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$root")
      .withColumn("source",
        regexp_extract(input_file_name(), s"$root/([^/]+)/", 1))
    val bySource = scanned.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = staged.map { case (n, t) =>
      n -> t.substances.count()
    }.toMap
    assert(bySource == expected)
  }

  test("typed Dataset model round-trips the brick") {
    implicit val s = spark
    val brick = Harmonize.brick(spark, sf(), Seq(EventsAdapter, OrdersAdapter))
    val acts = Model.activities(brick.activities)
    // typed ops: filter + map on case classes
    val positives = acts.filter(_.value == "positive")
      .map(a => a.source).groupByKey(identity).count()
      .collect().toMap
    val untyped = brick.activities.filter(col("value") === "positive")
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(positives == untyped)
    assert(acts.head().numvalue.isDefined)
  }

  test("parquet sink preserves schema and rows exactly (S9)") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/acts"
    implicit val s = spark
    val brick = Harmonize.brick(spark, sf(), Seq(EventsAdapter, OrdersAdapter))
    brick.activities.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet read-back is always nullable; compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == brick.activities.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(brick.activities).count() == 0)
    assert(brick.activities.exceptAll(back).count() == 0)
  }
}
