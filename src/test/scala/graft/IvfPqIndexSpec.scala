package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{IvfPqIndex, ProductQuantIndex}

/** The persisted IVF-PQ artifact: integrity of the inverted lists,
  * deterministic rebuild, the all-lists-probed ≡ exhaustive-ADC
  * identity, and nprobe as a monotone candidate knob.
  */
class IvfPqIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf())

  private def freshIndex(k: Int = 6): String = {
    graft.functions.GraftFunctions.register(spark)
    val dir = Files.createTempDirectory("graft-ivfpq").toString + "/idx"
    IvfPqIndex.write(emb, dir, k)
    dir
  }

  test("artifact integrity: every vector in exactly one valid list") {
    val dir = freshIndex()
    val lists = spark.read.parquet(s"$dir/lists")
    val coarse = spark.read.parquet(s"$dir/coarse")
    assert(lists.count() == emb.count())
    assert(lists.select("vec_id").distinct().count() == emb.count())
    val orphan = lists.join(coarse.select("cid"), Seq("cid"), "left_anti")
    assert(orphan.count() == 0, "list id referencing a missing centroid")
    // the PQ leg is the standard artifact
    assert(spark.read.parquet(s"$dir/pq/codes").count() == emb.count())
  }

  test("deterministic rebuild: training twice yields the same artifact") {
    val d1 = freshIndex(); val d2 = freshIndex()
    for (leg <- Seq("coarse", "lists")) {
      val a = spark.read.parquet(s"$d1/$leg")
      val b = spark.read.parquet(s"$d2/$leg")
      assert(a.exceptAll(b).count() == 0, s"$leg diverged")
      assert(b.exceptAll(a).count() == 0, s"$leg diverged")
    }
  }

  test("probing every list equals the exhaustive ADC search") {
    val dir = freshIndex()
    val nLists = spark.read.parquet(s"$dir/coarse").count().toInt
    val viaIvf = IvfPqIndex.search(
      spark, dir, emb, col("vec_id") < 10, 3, nprobe = nLists)
    val exhaustive = ProductQuantIndex.search(
      spark, s"$dir/pq", emb, col("vec_id") < 10, 3)
    assert(viaIvf.exceptAll(exhaustive).count() == 0)
    assert(exhaustive.exceptAll(viaIvf).count() == 0)
    assert(viaIvf.count() == 30)
  }

  test("frozen-codebook encode reproduces the build's own code table") {
    val (books, codes) = ProductQuantIndex.build(emb)
    val reEncoded = ProductQuantIndex.encode(emb, books)
    val built = codes.select(col("vec_id"), col("code"))
    assert(reEncoded.exceptAll(built).count() == 0)
    assert(built.exceptAll(reEncoded).count() == 0)
    assert(reEncoded.count() == emb.count())
  }

  test("append with frozen quantizers extends lists+codes; search sees both") {
    graft.functions.GraftFunctions.register(spark)
    val dir = Files.createTempDirectory("graft-ivfpq-app").toString + "/idx"
    val half = emb.count() / 2
    val a = emb.filter(col("vec_id") < half)
    val b = emb.filter(col("vec_id") >= half)
    IvfPqIndex.write(a, dir, k = 6)
    IvfPqIndex.append(b, dir)
    val lists = spark.read.parquet(s"$dir/lists")
    val codes = spark.read.parquet(s"$dir/pq/codes")
    assert(lists.count() == emb.count())
    assert(codes.count() == emb.count())
    // all-lists search over the appended index == exhaustive ADC over
    // the SAME artifact state (a-trained codebooks, a∪b codes): the
    // append never invalidated the existing quantizers
    val nLists = spark.read.parquet(s"$dir/coarse").count().toInt
    val viaIndex = IvfPqIndex.search(
      spark, dir, emb, col("vec_id") < 10, 3, nprobe = nLists)
    val exhaustive = ProductQuantIndex.searchFrames(
      spark.read.parquet(s"$dir/pq/codebooks"), codes,
      emb, col("vec_id") < 10, 3)
    assert(viaIndex.exceptAll(exhaustive).count() == 0)
    assert(exhaustive.exceptAll(viaIndex).count() == 0)
    // appended vectors are actually reachable as neighbors
    assert(viaIndex.filter(col("neighbor_id") >= half).count() > 0,
      "no appended vector ever surfaced in search results")
    // retrying the SAME append (the partial-failure recovery path) is
    // idempotent: the anti-join guards append nothing the second time —
    // no duplicate rows on disk, results unchanged
    IvfPqIndex.append(b, dir)
    assert(spark.read.parquet(s"$dir/lists").count() == emb.count())
    assert(spark.read.parquet(s"$dir/pq/codes").count() == emb.count())
    val afterRetry = IvfPqIndex.search(
      spark, dir, emb, col("vec_id") < 10, 3, nprobe = nLists)
    assert(afterRetry.exceptAll(viaIndex).count() == 0)
    assert(viaIndex.exceptAll(afterRetry).count() == 0)
  }

  test("nprobe=1 searches a subset of lists, deterministically") {
    val dir = freshIndex()
    val one = IvfPqIndex.search(spark, dir, emb, col("vec_id") < 10, 3, 1)
    val again = IvfPqIndex.search(spark, dir, emb, col("vec_id") < 10, 3, 1)
    assert(one.collect().toSet == again.collect().toSet)
    assert(one.count() <= 30 && one.count() > 0)
    // each query's top hits rank 1..n densely
    val badRank = one.groupBy(col("query_id"))
      .agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(badRank.count() == 0)
  }
  test("ArtifactStore: reuse-vs-rebuild identity and the publish protocol") {
    // VERDICT r9 #7 — the cross-session amortization of the ann14 cold
    // build: same content key -> the build runs ONCE and later callers
    // adopt the published dir; a different key rebuilds; a dir without
    // its _OK marker is refused, not trusted
    val base = Files.createTempDirectory("graft-artifacts").toString
    spark.conf.set(ArtifactStore.DirKey, base)
    try {
      var builds = 0
      def build(marker: String)(dir: String): Unit = {
        builds += 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, "payload"),
          marker.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
      val d1 = ArtifactStore.ensure(spark, "idx", "k1")(build("first"))
      val d2 = ArtifactStore.ensure(spark, "idx", "k1")(build("second"))
      assert(builds == 1 && d1 == d2, s"builds=$builds d1=$d1 d2=$d2")
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(d1, "payload"))) == "first")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(d1, "_OK")))
      val d3 = ArtifactStore.ensure(spark, "idx", "k2")(build("third"))
      assert(builds == 2 && d3 != d1)
      // a failed build leaves no tmp litter and propagates
      intercept[RuntimeException] {
        ArtifactStore.ensure(spark, "idx", "k4")(_ =>
          throw new RuntimeException("boom"))
      }
      val leftovers = new java.io.File(base).listFiles()
        .map(_.getName).filter(_.contains("tmp"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
      // a visible dir without _OK is refused
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(base, "idx-k3"))
      val ex = intercept[IllegalArgumentException] {
        ArtifactStore.ensure(spark, "idx", "k3")(build("x"))
      }
      assert(ex.getMessage.contains("_OK"))
    } finally {
      spark.conf.unset(ArtifactStore.DirKey)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
    }
  }
  test("ArtifactStore: concurrent ensure() of one key — both adopt one dir") {
    // the cross-JVM race, simulated in-process: two builders race the
    // same content key; ATOMIC_MOVE lets exactly one publish and the
    // loser adopts the winner's dir — no corruption, no tmp litter
    val base = Files.createTempDirectory("graft-artifacts-race").toString
    spark.conf.set(ArtifactStore.DirKey, base)
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      def ensureOnce(): String = ArtifactStore.ensure(spark, "idx", "rk") {
        dir =>
          gate.await()
          builds.incrementAndGet()
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, "payload"),
            "x".getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fa = Future(ensureOnce()); val fb = Future(ensureOnce())
      Thread.sleep(200); gate.countDown()
      val (da, db) = (Await.result(fa, 60.seconds),
        Await.result(fb, 60.seconds))
      assert(da == db, s"$da vs $db")
      assert(builds.get() >= 1 && builds.get() <= 2)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(da, "_OK")))
      val litter = new java.io.File(base).listFiles()
        .map(_.getName).filter(_.contains("tmp"))
      assert(litter.isEmpty, litter.mkString(","))
    } finally {
      spark.conf.unset(ArtifactStore.DirKey)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
    }
  }

  test("shortlistR derives the rerank width from the group-depth census") {
    import spark.implicits._
    // a 100-deep duplicate group -> R = depth x k, however rare it is
    val census = Seq((100L, 2L), (3L, 50L), (1L, 1000L))
      .toDF("size", "n_components")
    assert(IvfPqIndex.shortlistR(census, k = 3) == 300)
    // a duplicate-free corpus (depth 1, or an empty census) floors at
    // rMin — the gate corpora land here, keeping ann13's oracle exact
    val flat = Seq((1L, 1000L)).toDF("size", "n_components")
    assert(IvfPqIndex.shortlistR(flat, k = 3) == 10)
    assert(IvfPqIndex.shortlistR(
      flat.filter(col("size") < 0), k = 3) == 10)
    // an explicit floor above the derivation wins
    assert(IvfPqIndex.shortlistR(census, k = 3, rMin = 500) == 500)
  }

  test("ArtifactStore: prune reclaims aged artifacts and crashed tmp dirs") {
    val base = Files.createTempDirectory("graft-artifacts-gc").toString
    spark.conf.set(ArtifactStore.DirKey, base)
    try {
      def build(dir: String): Unit = {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, "payload"),
          "x".getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
      val dOld = ArtifactStore.ensure(spark, "idx", "old")(build)
      val dNew = ArtifactStore.ensure(spark, "idx", "new")(build)
      // age the old artifact's _OK two hours into the past
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(dOld, "_OK"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      // a crashed build's tmp dir, aged past the one-hour tmp cutoff
      val tmp = java.nio.file.Paths.get(base, ".idx-crash.tmp-dead")
      java.nio.file.Files.createDirectories(tmp)
      java.nio.file.Files.setLastModifiedTime(tmp,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      val gone = ArtifactStore.prune(spark, maxAgeMs = 3600000L)
      assert(gone.toSet == Set(dOld, tmp.toString), gone.mkString(","))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dOld)))
      assert(!java.nio.file.Files.exists(tmp))
      // the fresh artifact survives and is still adoptable
      assert(ArtifactStore.ensure(spark, "idx", "new")(_ =>
        fail("must reuse, not rebuild")) == dNew)
    } finally {
      spark.conf.unset(ArtifactStore.DirKey)
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(base))
    }
  }

  test("ArtifactStore: corpusKey is order-free, collision-hardened, " +
      "and refuses an empty frame") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "v")
    val k1 = ArtifactStore.corpusKey(a, "r1", col("id"), col("v"))
    // row order must not matter (the artifact derives from the SET)
    val k2 = ArtifactStore.corpusKey(
      a.orderBy(col("id").desc), "r1", col("id"), col("v"))
    assert(k1 == k2)
    // data change and recipe bump both land in a fresh key
    assert(k1 != ArtifactStore.corpusKey(
      a.filter(col("id") =!= 3), "r1", col("id"), col("v")))
    assert(k1 != ArtifactStore.corpusKey(a, "r2", col("id"), col("v")))
    // the xor-cancellation weakness (ADVICE r10): duplicating any two
    // rows cancels in bit_xor, but the sum fold still separates them
    val dup = a.union(Seq((1L, "x"), (1L, "x")).toDF("id", "v"))
    assert(k1 != ArtifactStore.corpusKey(dup, "r1", col("id"), col("v")))
    val ex = intercept[IllegalArgumentException] {
      ArtifactStore.corpusKey(
        a.filter(col("id") < 0), "r1", col("id"), col("v"))
    }
    assert(ex.getMessage.toLowerCase.contains("empty"))
  }

  test("ArtifactStore: default base is per-user; foreign dirs refused") {
    // no conf set -> the default base embeds user.name (ADVICE r10's
    // shared-/tmp poisoning surface); ownership of adopted dirs is
    // verified wherever the filesystem reports owners
    val d = ArtifactStore.ensure(spark, "ownchk",
      "k-" + java.util.UUID.randomUUID()) { dir =>
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir)): Unit
    }
    try {
      val user = sys.props("user.name")
      assert(java.nio.file.Paths.get(d).getParent.getFileName
        .toString == s"graft-artifacts-$user")
      // same-user adoption passes the ownership check
      assert(ArtifactStore.ensure(spark, "ownchk",
        java.nio.file.Paths.get(d).getFileName.toString
          .stripPrefix("ownchk-"))(_ => fail("must reuse")) == d)
    } finally {
      // delete only this test's artifact dir — the per-user base is
      // shared with real cross-session artifacts (that's its point)
      org.apache.commons.io.FileUtils.deleteDirectory(
        java.nio.file.Paths.get(d).toFile)
    }
  }
}
