package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives over a (doc_id, lang, text) frame.
  * Query surface in DedupQueries; recall properties proven in
  * JaccardLshSpec against the exact-Jaccard ground truth.
  */
object Dedup {

  /** Distinct word-k-shingles per doc (k = 3 default); stop-shingles
    * with document frequency > maxDf pruned (hot-key guard for the
    * self-join and noise reduction for MinHash). k is a real knob:
    * smaller k = higher recall / noisier candidates, larger k = sharper
    * fingerprints — DedupFuzzSpec drives it across the generated plans.
    */
  def shingles(docs: DataFrame, maxDf: Long = 100, k: Int = 3): DataFrame = {
    require(k >= 1, s"shingle k must be >= 1, got $k")
    val sh = docs
      .withColumn("ts", split(col("text"), " "))
      .filter(size(col("ts")) >= k)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(expr(
          s"transform(sequence(0, size(ts)-$k), " +
            s"g -> concat_ws(' ', slice(ts, g + 1, $k)))"))).as("sh"))
    // Prune via the HOT set, not the keep set: shingles with df > maxDf
    // are by construction few (each costs > maxDf rows), so the anti join
    // is against a small side instead of the (huge) keep list. No
    // broadcast hint: |hot| is bounded by total_shingles/maxDf, which at
    // corpus scale can still exceed the driver/broadcast limit — AQE
    // broadcasts when hot is actually small and degrades gracefully to a
    // shuffled anti join when it isn't.
    val hot = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("sh")
    sh.join(hot, Seq("sh"), "left_anti")
  }

  /** SemDeDup drop set (Abbas et al. 2023, arXiv:2303.09540): given a
    * clustered embedding frame (`idCol`, `vecCol`, `cid`, `ccos` =
    * cosine to own centroid), return the ids dropped by the paper's
    * keep policy — an item is dropped when some item EARLIER in the
    * keep order (ccos ASC = low-centroid-similarity kept first, id as
    * the total-order tiebreak) in the SAME cluster is cosine-near it
    * (>= tau). "Earlier" means any earlier item, kept or not, matching
    * the paper's released pseudocode. Requires GraftFunctions
    * (cosine_sim) registered on the session.
    *
    * Scale: the pair leg is an equi-join on cid; production K grows
    * with the corpus (paper: K ~ N/10k) so per-cluster pair mass stays
    * bounded — never corpus-quadratic.
    */
  def semDedupDropped(assigned: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = assigned.select(col(idCol).as("__ia"), col(vecCol).as("__va"),
      col("cid"), col("ccos").as("__ca"))
    val b = assigned.select(col(idCol).as("__ib"), col(vecCol).as("__vb"),
      col("cid"), col("ccos").as("__cb"))
    a.join(b, Seq("cid"))
      .filter(col("__ia") =!= col("__ib") &&
        (col("__ca") < col("__cb") ||
          (col("__ca") === col("__cb") && col("__ia") < col("__ib"))))
      .filter(expr("cosine_sim(__va, __vb)") >= tau)
      .select(col("__ib").as(idCol)).distinct()
  }

  /** Exact pairwise Jaccard within lang blocks → (lang, da, db, j).
    * Quadratic in block size — ground truth / small-scale only.
    */
  def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val b = sh.select(col("doc_id").as("db"), col("lang").as("langb"),
      col("sh").as("shb"))
    val common = sh.join(b,
        col("sh") === col("shb") && col("lang") === col("langb") &&
          col("doc_id") < col("db"))
      .groupBy(col("lang"), col("doc_id").as("da"), col("db"))
      .agg(count(lit(1)).as("common"))
    val sa = sizes.select(col("doc_id").as("da"), col("n_sh").as("na"))
    val sb = sizes.select(col("doc_id").as("db"), col("n_sh").as("nb"))
    common.join(sa, Seq("da")).join(sb, Seq("db"))
      .withColumn("j", col("common") / (col("na") + col("nb") - col("common")))
      .select("lang", "da", "db", "j")
  }

  /** MinHash signatures: (doc_id, sig: Array[Long] of length numHashes).
    * One codegen'd HashAggregate with numHashes primitive min slots: the
    * i-th hash-family member is xxhash64(i, shingle) (multi-arg xxhash64
    * chains the seed — no per-row string concat or array allocation),
    * and map-side partial combine means the shuffle moves one signature
    * per doc per partition — never numHashes× the shingle count.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 32): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(array((0 until numHashes).map(i =>
        min(xxhash64(lit(i), col("sh")))): _*).as("sig"))

  /** LSH banding over minhash signatures → candidate pairs with the
    * estimated Jaccard (fraction of agreeing minhashes):
    * (da, db, est_j). Sub-quadratic: candidates come from an equi-join
    * on (band, band_key); the estimate is one zip_with over the two
    * signatures (no per-index join).
    */
  def minhashCandidates(sh: DataFrame, numHashes: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    val minh = minhashSignatures(sh, numHashes)
    candidatesFrom(minh, bandsOf(minh, numHashes, rowsPerBand), numHashes)
  }

  /** Banding projection of a signature frame: (doc_id, band, band_key). */
  private def bandsOf(minh: DataFrame, numHashes: Int,
      rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    minh.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${nBands - 1}), b -> md5(concat_ws(',', " +
          s"transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand), " +
          "v -> cast(v AS string)))))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
  }

  /** Candidate pairs + estimated Jaccard from a (signatures, bands)
    * index — freshly built or read back from parquet.
    */
  private def candidatesFrom(minh: DataFrame, bands: DataFrame,
      numHashes: Int): DataFrame = {
    val bb = bands.select(col("doc_id").as("db"), col("band"), col("band_key"))
    val cand = bands.join(bb, Seq("band", "band_key"))
      .filter(col("doc_id") < col("db"))
      .select(col("doc_id").as("da"), col("db")).distinct()
    val ma = minh.select(col("doc_id").as("da"), col("sig").as("siga"))
    val mb = minh.select(col("doc_id").as("db"), col("sig").as("sigb"))
    cand.join(ma, Seq("da")).join(mb, Seq("db"))
      .withColumn("est_j", expr(
        "aggregate(zip_with(siga, sigb, (x, y) -> IF(x = y, 1, 0)), 0, " +
          s"(a, v) -> a + v) / cast($numHashes AS double)"))
      .select("da", "db", "est_j")
  }

  /** Materialize the minhash index as a cross-session parquet artifact:
    * `<path>/signatures` (doc_id, sig) and `<path>/bands`
    * (doc_id, band_key, partitioned by band). At corpus scale the index
    * is built once alongside the data and incrementally appended as
    * documents arrive; band-partitioning means a candidate query scans
    * band buckets independently (partition pruning per band).
    */
  def writeMinhashIndex(sh: DataFrame, path: String, numHashes: Int = 32,
      rowsPerBand: Int = 4): Unit =
    writeMinhashIndexMode(sh, path, numHashes, rowsPerBand, "overwrite")

  /** Incremental build: append only the NEW documents' shingles as the
    * corpus grows — no rebuild of the existing index. Signatures are a
    * pure function of a document's shingles, so a document appended
    * twice yields byte-identical rows and the read path's
    * dedup-on-read collapses them (same single-writer-append +
    * dedup-on-read policy as CachedLookupSource).
    *
    * Caveat: `shingles` df-pruning is relative to the frame it is
    * given — prune within each increment (or pass pre-pruned shingles
    * from a corpus-wide df table) if hot-shingle cutoffs must match a
    * one-shot build at scale.
    */
  def appendMinhashIndex(sh: DataFrame, path: String, numHashes: Int = 32,
      rowsPerBand: Int = 4): Unit =
    writeMinhashIndexMode(sh, path, numHashes, rowsPerBand, "append")

  private def writeMinhashIndexMode(sh: DataFrame, path: String,
      numHashes: Int, rowsPerBand: Int, mode: String): Unit = {
    val minh = minhashSignatures(sh, numHashes)
    minh.write.mode(mode).parquet(s"$path/signatures")
    bandsOf(minh, numHashes, rowsPerBand)
      .write.partitionBy("band").mode(mode).parquet(s"$path/bands")
  }

  /** Candidate pairs from a written index — no re-shingling, no
    * signature recompute; the expensive build is amortized across every
    * dedup run that reads it. dropDuplicates makes appended re-writes
    * of the same document harmless (deterministic signatures ⇒ exact
    * duplicate rows).
    */
  def minhashCandidatesFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, numHashes: Int = 32): DataFrame =
    candidatesFrom(
      spark.read.parquet(s"$path/signatures").dropDuplicates("doc_id"),
      spark.read.parquet(s"$path/bands").dropDuplicates(),
      numHashes)

  /** 64-bit SimHash per doc from term-frequency-weighted word hashes.
    * One codegen'd HashAggregate with 64 primitive sum slots — the j-th
    * slot accumulates cnt * (2*bit_j(xxhash64(w)) - 1) directly (the
    * word hash is CSE'd across the 64 expressions); map-side partial
    * combine keeps the shuffle at one 64-long vector per doc per
    * partition. One zip_with then assembles the sign bits.
    */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("w")))
      .groupBy(col("doc_id"))
      // per-slot work kept minimal (sum of cnt*bit); the ±1 signing is
      // algebraically hoisted out of the 64 hot accumulators into one
      // post-agg transform: sum(cnt*(2b-1)) == 2*sum(cnt*b) - sum(cnt).
      // Smaller generated update method -> faster janino compile + run.
      .agg(array((0 until 64).map(j =>
        sum(col("cnt") * shiftright(col("h"), j).bitwiseAND(lit(1L))))
        : _*).as("raw"),
        sum(col("cnt")).as("tot"))
      .withColumn("sums", expr("transform(raw, s -> 2 * s - tot)"))
      .withColumn("simhash", expr(
        "aggregate(zip_with(sums, sequence(0, 63), " +
          "(s, j) -> IF(s > 0, shiftleft(cast(1 AS bigint), j), 0L)), " +
          "cast(0 AS bigint), (a, v) -> a + v)"))
      .select("doc_id", "simhash")

  /** SimHash candidates via nBlocks-way pigeonhole blocks over the
    * 64-bit signature (any pair with hamming ≤ nBlocks-1 shares an
    * exact block) → (da, db, hamming). nBlocks = 4 (16-bit blocks) by
    * default; more blocks = wider hamming guarantee but more candidate
    * collisions — the recall/cost knob DedupFuzzSpec drives.
    */
  def simhashCandidates(docs: DataFrame, nBlocks: Int = 4): DataFrame =
    simhashCandidatesFromSignatures(simhashSignatures(docs), nBlocks)

  /** SimHash candidate generation from a signature frame — freshly
    * built or read back from a written index.
    */
  private def simhashCandidatesFromSignatures(sim: DataFrame,
      nBlocks: Int = 4): DataFrame =
    bandedHammingCandidates(sim, "simhash", nBlocks)

  /** GENERIC pigeonhole-banded hamming candidates over ANY 64-bit
    * signature column — the shared engine under the SimHash text path
    * and the multimodal perceptual-hash path (mm4/mm5): any pair with
    * hamming ≤ nBlocks−1 shares an exact block, so candidate
    * generation is a pure (blk, bval) equi-join — hash-partitioned,
    * never all-pairs. `sig` is (doc_id, <hashCol>); returns (da, db,
    * hamming) with da < db, the exact hamming computed only on the
    * banded candidates.
    */
  def bandedHammingCandidates(sig: DataFrame, hashCol: String,
      nBlocks: Int = 4): DataFrame = {
    val blocks = signatureBlocks(sig, hashCol, nBlocks)
    val b2 = blocks.select(col("doc_id").as("db"), col("blk"), col("bval"))
    val cand = blocks.join(b2, Seq("blk", "bval"))
      .filter(col("doc_id") < col("db"))
      .select(col("doc_id").as("da"), col("db")).distinct()
    attachHamming(cand, sig, hashCol)
  }

  /** Cross-frame banded hamming probe — `corpus` signatures against
    * `probes` signatures (both (doc_id, <hashCol>)): pairs sharing a
    * pigeonhole block, with exact hamming. The decontamination shape
    * (mm5): the probe side is the benchmark set, typically small
    * enough that AQE broadcasts its block table, and the corpus is
    * never self-joined. Returns (da = corpus doc, db = probe doc,
    * hamming); doc_id sets may overlap (a doc never pairs with itself).
    */
  def bandedHammingProbe(corpus: DataFrame, probes: DataFrame,
      hashCol: String, nBlocks: Int = 4): DataFrame = {
    val cb = signatureBlocks(corpus, hashCol, nBlocks)
    val pb = signatureBlocks(probes, hashCol, nBlocks)
      .select(col("doc_id").as("db"), col("blk"), col("bval"))
    val cand = cb.join(pb, Seq("blk", "bval"))
      .filter(col("doc_id") =!= col("db"))
      .select(col("doc_id").as("da"), col("db")).distinct()
    attachHamming(cand, corpus.unionByName(probes).distinct(), hashCol)
  }

  /** One row per (doc, block): blk index + the block's bit value. The
    * mask covers the block's bits, so the arithmetic shiftright's sign
    * fill never reaches the compared value.
    */
  private def signatureBlocks(sig: DataFrame, hashCol: String,
      nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && 64 % nBlocks == 0,
      s"nBlocks must divide 64, got $nBlocks")
    val bits = 64 / nBlocks
    val mask = if (bits == 64) -1L else (1L << bits) - 1L
    sig.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${nBlocks - 1}), b -> named_struct(" +
          s"'blk', b, 'bval', shiftright($hashCol, b * $bits) & $mask))"))
        .as("x"))
      .select(col("doc_id"), col("x.blk").as("blk"), col("x.bval").as("bval"))
  }

  private def attachHamming(cand: DataFrame, sig: DataFrame,
      hashCol: String): DataFrame = {
    val simA = sig.select(col("doc_id").as("da"), col(hashCol).as("ha"))
    val simB = sig.select(col("doc_id").as("db"), col(hashCol).as("hb"))
    cand.join(simA, Seq("da")).join(simB, Seq("db"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
  }

  /** Persist the SimHash index: one (doc_id, simhash) parquet table —
    * the signature is the whole artifact (blocks are derived on read,
    * a cheap shift/mask projection). Same cross-session amortization
    * story as the minhash index.
    */
  def writeSimhashIndex(docs: DataFrame, path: String): Unit =
    simhashSignatures(docs).write.mode("overwrite").parquet(path)

  def simhashCandidatesFromIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    simhashCandidatesFromSignatures(spark.read.parquet(path))

  /** Ground-truth near-duplicate pair count for recall denominators —
    * EXACT below `maxExact` vectors, seeded-SAMPLED above (VERDICT r7
    * #2: the brute denominator was the one quadratic leg on the
    * surface — 400M pairs at 10× vectors; production validators must
    * not scale with N²).
    *
    * Sampled mode: a deterministic hash-subsample of ~`sampleVecs`
    * vectors (xxhash64(vec_id, seed) mod p == 0 — reproducible across
    * runs and engines, no RNG state), exhaustive pairs WITHIN the
    * sample (≈ sampleVecs²/2, BOUNDED regardless of corpus size), and
    * the binomial rate scaled to the true N·(N−1)/2 pair space with a
    * normal-approximation 95% interval. Row-subsampling is the
    * estimator of choice here because the dup-pair event depends only
    * on the two endpoints — a uniform vector subsample induces a
    * uniform sample of its pair space.
    *
    * Output: one row (n_dup_brute, brute_mode, brute_ci95). Exact mode
    * emits ("exact", 0.0) so the schema — and therefore the DuckDB
    * oracle at the gate scales, which sit far below `maxExact` — is
    * identical in both modes.
    *
    * One driver-side `count()` picks the mode: a metadata-scale
    * decision (parquet row-count statistics), not a data collect.
    */
  def bruteNearDupStats(vecs: DataFrame, simExpr: Column,
      threshold: Double, maxExact: Long = 10000L,
      sampleVecs: Long = 2000L, seed: Long = 42L,
      nVecKnown: Option[Long] = None): DataFrame = {
    val e = vecs
    // callers that already counted the corpus (dd10 does, for its own
    // posture switch) pass it in — no second count job
    val nVec = nVecKnown.getOrElse(e.count())
    val a = e.select(col("vec_id").as("va"), col("embedding").as("x"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("y"))
    if (nVec <= maxExact) {
      a.crossJoin(b).filter(col("va") < col("vb"))
        .agg(count(when(simExpr >= threshold, 1)).as("n_dup_brute"))
        .withColumn("brute_mode", lit("exact"))
        .withColumn("brute_ci95", lit(0.0))
    } else {
      val p = math.max(1L, nVec / sampleVecs)
      def keep(c: Column) = pmod(xxhash64(c, lit(seed)), lit(p)) === 0
      val totalPairs = nVec.toDouble * (nVec - 1).toDouble / 2.0
      // Interval honesty: the binomial width treats sampled pairs as
      // independent draws, but pairs sharing an endpoint are correlated
      // (cluster sampling), so it understates variance when dups
      // concentrate in clusters — and it degenerates to ±0 on a
      // zero-dup sample, which would assert "exactly zero dups" about
      // pairs the sample never saw. Two guards: a rule-of-three floor
      // (zero observed dups still bounds the rate only to ≤3/n_pairs_s
      // at 95%), and the no-information fallback (an empty sample's
      // interval is the whole pair space).
      val rate = col("n_dup_s") / col("n_pairs_s")
      val binom = lit(1.96) *
        sqrt(rate * (lit(1.0) - rate) / col("n_pairs_s")) * lit(totalPairs)
      val ruleOf3 = lit(3.0) / col("n_pairs_s") * lit(totalPairs)
      a.filter(keep(col("va"))).crossJoin(b.filter(keep(col("vb"))))
        .filter(col("va") < col("vb"))
        .agg(count(lit(1)).as("n_pairs_s"),
          count(when(simExpr >= threshold, 1)).as("n_dup_s"))
        .select(
          when(col("n_pairs_s") === 0, lit(0L))
            .otherwise(round(rate * lit(totalPairs)).cast("long"))
            .as("n_dup_brute"),
          lit("sampled").as("brute_mode"),
          when(col("n_pairs_s") === 0, lit(totalPairs))
            .otherwise(greatest(binom, ruleOf3)).as("brute_ci95"))
    }
  }
}
