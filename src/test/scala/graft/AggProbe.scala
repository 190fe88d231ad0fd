package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.SourceAdapter

/** Throwaway-style probe for the acts.union+precollapse sub-stage (the
  * 44×-at-10× outlier AssemblyProfile isolated): times isolated variants
  * of the stage so the cost splits into union-scan / shuffle-agg /
  * checkpoint-write parts, and prints executor shuffle/spill totals per
  * variant from a listener. `Test/runMain graft.AggProbe [sfDir]`.
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/sf1-stretch")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "agg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit

    @volatile var spill = 0L
    @volatile var shufW = 0L
    @volatile var tasks = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            spill += m.memoryBytesSpilled + m.diskBytesSpilled
            shufW += m.shuffleWriteMetrics.bytesWritten
            tasks += 1
          }
        }
      })

    val staged = SourceAdapter.all.map(a =>
      a.name -> SourceAdapter.cachedStaging(a, spark, d))
    staged.foreach(_._2.activities.count())
    def census(tag: String): Unit = {
      val info = spark.sparkContext.getRDDStorageInfo
      println(f"[probe] storage($tag): rdds=${info.length} " +
        f"mem=${info.map(_.memSize).sum / 1e6}%9.1fMB " +
        f"disk=${info.map(_.diskSize).sum / 1e6}%9.1fMB")
    }
    println(s"[probe] stagings ready")
    census("stagings")

    def union(): DataFrame =
      staged.map { case (n, t) =>
        t.activities.withColumn("source", lit(n))
      }.reduce(_ unionByName _)

    def run(name: String)(f: => Unit): Unit = {
      spill = 0; shufW = 0; tasks = 0
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs " +
        f"spill=${spill / 1e6}%9.1fMB shufW=${shufW / 1e6}%9.1fMB tasks=$tasks")
    }

    def collapsed(): DataFrame = union()
      .groupBy(col("source"), col("sid"), col("pid"), col("inchi"),
        col("value"))
      .agg(min(col("numvalue")).as("numvalue"))
    run("union.count (scan only)") { union().count() }
    // production shape, repeated so run-order/page-cache effects show
    (1 to 3).foreach { i =>
      var c: DataFrame = null
      run(s"agg.ckptSer sp=32 pass$i (prod)") {
        c = MemoRegistry.checkpointLarge(collapsed())
      }
      census(s"after pass$i")
      MemoRegistry.release(c)
      // release is async (blocking=false); give the block manager a
      // moment so the next pass starts from a comparable storage state
      Thread.sleep(3000)
    }
    Seq("128", "256").foreach { sp =>
      spark.conf.set("spark.sql.shuffle.partitions", sp)
      run(s"agg.ckptSer sp=$sp") {
        MemoRegistry.release(MemoRegistry.checkpointLarge(collapsed()))
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
