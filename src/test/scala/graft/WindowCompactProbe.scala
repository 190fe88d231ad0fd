package graft

import org.apache.spark.sql.functions._

/** Dev tool: the read-side payoff of [[graft.operators.WindowIndex
  * .compact]] (VERDICT r11 #3) — `sbt "Test/runMain
  * graft.WindowCompactProbe [sfDir] [nBatches]"`. A standing stream
  * commits one immutable batch dir per non-empty micro-batch, so after
  * N batches every `readWindows`/`readDup` unions N parquet dirs; the
  * stream job's `compactEvery` folds them back into one. The
  * equivalence is spec-pinned (WindowIndexStreamSpec); this probe
  * measures what compaction is FOR: the dir-fanout cost on the read
  * path (N× file listings + N× footer reads + a smaller-files scan)
  * and the append path (whose manifest anti-join unions the same N
  * dirs), before vs after one compact() call on the same data.
  */
object WindowCompactProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "wincompact-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, d).persist()
    val n = base.count()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("wincompact-probe").toString + "/idx"
    // micro-batch stand-ins: doc_id mod nBatches slices (disjoint, the
    // stream's file-per-trigger shape without the streaming runtime)
    graft.operators.WindowIndex.write(
      base.filter(pmod(col("doc_id"), lit(nBatches)) === 0), dir)
    (1 until nBatches).foreach { b =>
      graft.operators.WindowIndex.append(
        base.filter(pmod(col("doc_id"), lit(nBatches)) === b), dir)
    }
    def measure(tag: String): Unit = {
      val dirs = graft.operators.WindowIndex.batchCount(spark, dir)
      val (nw, tw) = time(
        graft.operators.WindowIndex.readWindows(spark, dir).count())
      val (nd, td) = time(
        graft.operators.WindowIndex.readDup(spark, dir).count())
      // the append path's own read-side term: a no-op re-append scans
      // the manifest dirs for the anti-join
      val batch = base.filter(pmod(col("doc_id"), lit(nBatches)) === 0)
      val (_, ta) = time(
        graft.operators.WindowIndex.append(batch, dir))
      println(f"[wincompact] $tag%-12s batchDirs=$dirs%4d  windows=$nw%9d ${tw}%6.2fs  dupHashes=$nd%9d ${td}%6.2fs  noopAppend=${ta}%6.2fs")
    }
    def treeBytes(sub: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    println(s"[wincompact] docs=$n batches=$nBatches")
    measure("fragmented")
    // SIZE-TIERED first (the standing-stream policy): merge only the
    // smallest dirs down to 8 — write volume must track the small
    // batches, not the index
    val b0 = treeBytes("batches")
    val (_, tt) = time(
      graft.operators.WindowIndex.compact(spark, dir, maxBatches = 8))
    println(f"[wincompact] compact(maxBatches=8) ${tt}%6.2fs  wroteMB=${(treeBytes("batches") - b0) / 1048576.0}%7.2f of ${b0 / 1048576.0}%7.2f referenced")
    measure("tiered(8)")
    val b1 = treeBytes("batches")
    val (_, tc) = time(graft.operators.WindowIndex.compact(spark, dir))
    println(f"[wincompact] compact() full        ${tc}%6.2fs  wroteMB=${(treeBytes("batches") - b1) / 1048576.0}%7.2f")
    measure("compacted")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir).getParentFile)

    // ---- the STANDING-STREAM policy comparison: cumulative bytes
    // written by compaction over the SAME append sequence, tiered
    // (compactEvery's maxBatches = n/2 smallest-first) vs a full
    // rewrite at the same cadence. Full rewrites copy the whole index
    // every period — O(index) each, growing with the corpus; tiered
    // merges mostly the small recent runs. This is the number that
    // decides whether a standing dedup index is maintainable.
    Seq(("tiered(n/2)", 8), ("full-rewrite", 1)).foreach {
      case (tag, mb) =>
        val d2 = java.nio.file.Files
          .createTempDirectory(s"wincompact-pol-$mb").toString + "/idx"
        def tb: Long = {
          val p = new org.apache.hadoop.fs.Path(s"$d2/batches")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
        }
        graft.operators.WindowIndex.write(
          base.filter(pmod(col("doc_id"), lit(nBatches)) === 0), d2)
        var wrote = 0L; var nComp = 0; var tComp = 0.0
        (1 until nBatches).foreach { b =>
          graft.operators.WindowIndex.append(
            base.filter(pmod(col("doc_id"), lit(nBatches)) === b), d2)
          if (graft.operators.WindowIndex.batchCount(spark, d2) >= 16) {
            val pre = tb
            val (_, t) = time(
              graft.operators.WindowIndex.compact(spark, d2, mb))
            wrote += tb - pre; nComp += 1; tComp += t
          }
        }
        val nw = graft.operators.WindowIndex.readWindows(spark, d2).count()
        println(f"[wincompact] policy $tag%-13s compactions=$nComp%2d  cumWroteMB=${wrote / 1048576.0}%7.2f  compactSec=${tComp}%6.2f  windows=$nw%9d  indexMB=${tb / 1048576.0}%7.2f")
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(d2).getParentFile)
    }
    spark.stop()
  }
}
