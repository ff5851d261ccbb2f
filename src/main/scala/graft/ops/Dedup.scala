package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard similarity join.
  *
  * Scale design: every variant reduces to shuffles keyed on content
  * hashes/buckets — no pairwise O(N^2) stage ever materializes over the
  * full corpus. MinHash banding and the shingle-inverted-index join are
  * the standard 100 TB corpus-dedup shapes (one wide shuffle each);
  * frequency cutoffs guard hot-key skew.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on normalized content; keeps the minimal
    * id per group. One shuffle on the 128-bit content hash.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature as an array<long> column over a *materialized*
    * distinct-shingle column: sig_j = min over shingles of
    * xxhash64(shingle, j). Pure Column expressions — no UDF, no
    * ml.feature stage, deterministic across partitionings.
    *
    * The hash index is statically unrolled (k array_min expressions,
    * not transform-over-sequence) on purpose: each references the
    * shingle attribute, so CollapseProject sees k references and keeps
    * the shingle computation materialized in its own projection instead
    * of inlining it into every lambda evaluation (which costs
    * O(tokens * numHashes) splits per row in interpreted eval).
    */
  def minhashSignature(sh: org.apache.spark.sql.Column,
                       numHashes: Int): org.apache.spark.sql.Column =
    array((0 until numHashes).map(j =>
      array_min(transform(sh, s => xxhash64(s, lit(j))))): _*)

  /** MinHash-LSH candidate pairs verified by exact Jaccard.
    *
    * bands x rows = numHashes; two docs collide if any band of their
    * signatures matches exactly (P[collide] = 1-(1-s^r)^b for Jaccard
    * s). Pipeline: signature -> explode band hashes -> self-join on
    * (band, hash) -> distinct pairs -> verify Jaccard on distinct
    * shingle sets. The self-join shuffles on band buckets; identical
    * boilerplate clusters are the skew risk, bounded by verifying only
    * distinct pairs.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7): DataFrame = {
    val rows = numHashes / bands
    // staged projections: tokens -> distinct shingles -> signature; each
    // stage's column is multi-referenced downstream, so CollapseProject
    // keeps them materialized (see minhashSignature scaladoc)
    val sig = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        array_distinct(TextAnalysis.shinglesOf(col("toks"), shingleN))
          .as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .cache()
    val bandArr = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), lit(b * rows + 1), lit(rows)), lit(b))
          .as("bhash"))): _*)
    val banded = sig.select(col("id"), col("sh"), explode(bandArr).as("bb"))
      .select(col("id"), col("sh"),
        col("bb.band").as("band"), col("bb.bhash").as("bhash"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signatures (custom Catalyst
    * expression), candidates from matching any of `tables` 16-bit
    * sub-bands (pigeonhole: <= `maxHamming` differing bits guarantees a
    * clean band when maxHamming < tables), verified by Hamming distance
    * via builtin bit ops.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, tables: Int = 4,
                   maxBucket: Int = 1000): DataFrame = {
    SimHash64.register(df.sparkSession)
    val sigs = df.select(col(idCol).as("id"),
        SimHash64.simhash64(TextAnalysis.tokens(col(textCol))).as("sig"))
      .cache()
    val bandArr = array((0 until tables).map(t =>
      struct(lit(t).as("band"),
        shiftrightunsigned(col("sig"), 16 * t).bitwiseAND(lit(0xffffL))
          .as("bkey"))): _*)
    val allBanded = sigs.select(col("id"), col("sig"),
        explode(bandArr).as("bb"))
      .select(col("id"), col("sig"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    // skew guard: a band bucket of n members contributes n^2 candidate
    // pairs; on bag-similar corpora buckets go hot and the self-join
    // explodes. Cap bucket size (vocabulary-level boilerplate belongs to
    // exact dedup, which runs first in a real pipeline).
    val banded = allBanded.join(
      allBanded.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= maxBucket && col("bn") >= 2)
        .select("band", "bkey"),
      Seq("band", "bkey"), "left_semi")
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    cand.withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity join with prefix filtering (the
    * All-Pairs / PPJoin candidate scheme): order every doc's distinct
    * shingles by (global doc-frequency asc, shingle asc) — rarest
    * first — and index only the first |x| - ceil(t*|x|) + 1 of them.
    * PPJoin Lemma 1: any pair with Jaccard >= t must share at least one
    * shingle inside BOTH prefixes, so joining prefix-against-prefix is
    * candidate-complete; exact Jaccard on the candidates makes the
    * result identical to the naive all-pairs join (oracle-checked).
    *
    * Scale shape: hot boilerplate shingles have high doc-frequency, so
    * the ordering pushes them out of every prefix — the quadratic
    * blow-up on common shingles disappears structurally instead of via
    * a recall-losing frequency cutoff. Plan: one groupBy for the
    * frequency table, one window over the inverted index (keyed by
    * doc), one prefix-on-prefix shuffle join, two hash joins to bring
    * the shingle sets back for verification.
    */
  def ngramJaccardJoin(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // shingles are 64-bit-hashed immediately: every downstream shuffle
    // (inverted index, prefix join, verify) moves 8-byte longs instead
    // of ~n-word strings, and set intersection runs on longs. A within-
    // pair hash collision would need two distinct shingles of the same
    // two docs to collide in 64 bits (~1e-16 per pair) — the DuckDB
    // oracle computes on raw strings, so the gate would catch it.
    val sh = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        array_distinct(TextAnalysis.shinglesOf(col("toks"), shingleN))
          .as("shs"))
      .select(col("id"), transform(col("shs"), s => xxhash64(s)).as("sh"))
      .withColumn("setSize", size(col("sh")))
      .cache()
    val inv = sh.select(col("id"), col("setSize"),
        explode(col("sh")).as("shingle"))
    val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("dfreq"), col("shingle"))
    // Float-safety: both bounds below compare an integer against a
    // real-valued product. A double product that rounds 1 ulp ABOVE an
    // exact integer would (via ceil) shorten the prefix / over-tighten
    // the overlap bound and silently drop boundary true pairs (e.g.
    // thresholds like 0.3 where t*|A| lands on an integer). Nudging
    // each product DOWN by eps makes the boundary inclusive: at worst
    // a few extra candidates survive, and the exact verify stage
    // removes them — completeness is never at risk.
    val eps = 1e-9
    val pre = inv.join(dfreq, Seq("shingle"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <=
        col("setSize") - ceil(col("setSize") * threshold - eps) + 1)
      .select("id", "shingle", "rn", "setSize")
    // positional filter (PPJoin): at the earliest common prefix shingle
    // (position p in A, q in B) the overlap is at most
    // 1 + min(|A|-p, |B|-q); prune pairs that can't reach the overlap
    // a Jaccard >= t requires, I >= ceil(t/(1+t) * (|A|+|B|)). True
    // pairs always pass at their earliest common shingle, so this cuts
    // candidates without losing completeness. (bound+1 is an integer,
    // so int >= ceil(x) <=> int >= x; comparing against x - eps
    // directly skips the ceil and its rounding hazard.)
    val overlapFrac = threshold / (1 + threshold)
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .filter(
        least(col("a.setSize") - col("a.rn"), col("b.setSize") - col("b.rn"))
          + 1 >= (col("a.setSize") + col("b.setSize")) * overlapFrac - eps)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter",
        size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Connected components over a near-duplicate PAIR list — the
    * "pairs → clusters" closure every real dedup pipeline needs before
    * it can pick one keeper per group (pairs alone can't: near-dup is
    * not transitive, clusters are).
    *
    * Algorithm: iterative min-label propagation on the symmetrized
    * edge list — label(v) ← min(label(v), min over neighbors) until a
    * fixpoint, converging in O(cluster diameter) rounds (each a
    * key-hash shuffle; near-dup clusters have tiny diameter, and
    * `maxIter` bounds pathological chains — the large-star/small-star
    * variant that contracts in O(log n) rounds is the upgrade path for
    * long-chain graphs). Labels are materialized per round to keep the
    * plan/lineage flat; determinism: min() is partitioning-invariant.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val edges = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    // materialize BEFORE the multi-branch joins below: a not-yet-filled
    // cache is re-evaluated once per branch inside the first job, which
    // would run the (expensive) pair generation several times over
    edges.count()
    // seed with round 0 for free: label = min(self, direct neighbors)
    // — one aggregation replaces both the distinct-node build and the
    // first propagation round (diameter-1 clusters then converge with
    // a single checked iteration)
    var labels = edges.groupBy(col("a").as("id"))
      .agg(min("b").as("mb"))
      .select(col("id"), least(col("id"), col("mb")).as("comp"))
      .cache()
    var it = 0
    var changed = 1L
    while (changed > 0 && it < maxIter) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old_comp"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"))
        .cache()
      changed = next.filter(col("comp") < col("old_comp")).count()
      labels.unpersist(blocking = false)
      labels = next.select("id", "comp")
      it += 1
    }
    edges.unpersist(blocking = false)
    labels
  }
}
