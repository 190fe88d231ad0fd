package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.WindowIndex

/** The persisted window index: write/read identity against the pure
  * windows() definition, incremental-append ≡ one-shot-build, append
  * idempotence, and the dup census staying globally correct across
  * appends (a new doc must be able to flip an OLD hash into dup
  * status without any text re-scan).
  */
class WindowIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  private def frameEq(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("write round-trips the exact windows() and dupHashesOf() frames") {
    val dir = Files.createTempDirectory("graft-winidx").toString + "/idx"
    WindowIndex.write(docs, dir)
    assert(frameEq(WindowIndex.readWindows(spark, dir),
      WindowIndex.windows(docs)))
    assert(frameEq(WindowIndex.readDup(spark, dir),
      WindowIndex.dupHashesOf(WindowIndex.windows(docs))))
  }

  test("incremental appends equal the one-shot build; re-append is a no-op") {
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val incDir = Files.createTempDirectory("graft-winidx-i").toString + "/idx"
    val oneDir = Files.createTempDirectory("graft-winidx-o").toString + "/idx"
    WindowIndex.write(a, incDir)
    WindowIndex.append(b, incDir)
    WindowIndex.write(docs, oneDir)
    assert(frameEq(WindowIndex.readWindows(spark, incDir),
      WindowIndex.readWindows(spark, oneDir)))
    assert(frameEq(WindowIndex.readDup(spark, incDir),
      WindowIndex.readDup(spark, oneDir)))
    // total redelivery of an already-appended batch changes nothing
    WindowIndex.append(b, incDir)
    assert(frameEq(WindowIndex.readWindows(spark, incDir),
      WindowIndex.readWindows(spark, oneDir)))
    assert(frameEq(WindowIndex.readDup(spark, incDir),
      WindowIndex.readDup(spark, oneDir)))
  }

  test("an appended doc flips an old hash into dup status (global census)") {
    import spark.implicits._
    val d1 = Seq((1L, "en", "s1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val d2 = Seq((2L, "en", "s2", "alpha beta gamma delta epsilon eta"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = Files.createTempDirectory("graft-winidx-f").toString + "/idx"
    WindowIndex.write(d1, dir)
    assert(WindowIndex.readDup(spark, dir).count() == 0)
    WindowIndex.append(d2, dir)
    // the shared 5-gram "alpha beta gamma delta epsilon" is now in two
    // distinct docs — the refreshed census sees it without re-reading d1
    assert(WindowIndex.readDup(spark, dir).count() == 1)
    val h = WindowIndex.readDup(spark, dir).head.getString(0)
    val ws = WindowIndex.readWindows(spark, dir)
      .filter(col("h") === h).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ws == Set(1L, 2L))
  }
}
