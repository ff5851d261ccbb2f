package graft

import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries

/** Semantic gates for the composed corpus pipeline (p01/p02): each
  * planted fixture must be caught by the stage it was planted FOR, the
  * funnel must shrink monotonically, and the pack coordinates must be
  * internally consistent. The value-level gate (full-chain DuckDB
  * replay) is the driver's oracle pass; these specs pin the semantics
  * that a hash can't explain when it breaks.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val st = PipelineQueries.chain(spark, sf001)
  private lazy val off: Long = {
    val mx = graft.Tables(spark, sf001, "documents")
      .agg(max("doc_id")).head().getLong(0)
    (mx / 1000000L + 1L) * 1000000L
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("exact dedup collapses every planted exact copy onto its " +
    "original (no id in the copy stride survives stage 2)") {
    val s1 = ids(st.surv1)
    assert(s1.nonEmpty)
    assert(!s1.exists(id => id >= off && id < 2 * off),
      "an exact copy out-ranked its original")
    // and the originals themselves all survive (min-id keeper rule)
    val baseIds = ids(graft.Tables(spark, sf001, "documents"))
    val origSurvivors = s1.filter(_ < off)
    // an original can only be deduped into ANOTHER original (identical
    // raw text), never into a planted row (all planted ids are larger)
    assert(origSurvivors.subsetOf(baseIds))
  }

  test("fuzzy dedup merges each long doc with its drop-one-token " +
    "mutant: never both in the survivor set") {
    val longDocs = graft.Tables(spark, sf001, "documents")
      .select(col("doc_id"),
        size(graft.ops.TextAnalysis.tokens(col("text"))).as("n"))
      .filter(col("n") >= 20)
      .select("doc_id").as[Long].collect()
    val s2 = ids(st.surv2)
    val both = longDocs.filter(id => s2(id) && s2(id + 2 * off))
    assert(both.isEmpty,
      s"mutant pairs survived fuzzy dedup: ${both.take(5).mkString(",")}")
  }

  test("decontamination removes every planted benchmark leak and the " +
    "benchmark split itself") {
    val s4 = ids(st.surv4)
    assert(!s4.exists(_ >= 3 * off), "a leak reached the final corpus")
    val srcs = st.cleaned.join(st.surv4, Seq("doc_id"), "left_semi")
      .select("source").distinct().as[String].collect().toSet
    assert(!srcs.contains("src0") && !srcs.contains("leak"))
  }

  test("funnel is monotone non-increasing in docs and tokens across " +
    "stages 1-5 and every stage drops something at this fixture") {
    val f = PipelineQueries.queries("p02_pipeline_funnel")(spark, sf001)
      .collect().sortBy(_.getInt(0))
    val units = f.map(_.getLong(2))
    val toks = f.map(_.getLong(3))
    // stages 1..5 are doc counts; stage 6 is pack count
    assert(units.slice(0, 5).sliding(2).forall(p => p(1) <= p(0)))
    assert(toks.slice(0, 5).sliding(2).forall(p => p(1) <= p(0)))
    assert(units(1) < units(0), "exact dedup dropped nothing")
    assert(units(2) < units(1), "fuzzy dedup dropped nothing")
    assert(units(3) < units(2), "decontamination dropped nothing")
    // packed tokens == quality-gate tokens (packing loses nothing)
    assert(toks(5) == toks(4))
  }

  test("pack coordinates are consistent: per-shard offsets are the " +
    "running token sum in id order, pack bounds bracket the doc") {
    val rows = st.packed
      .select("shard", "doc_id", "n_tokens", "tok_offset", "pack_first",
        "pack_last")
      .as[(Int, Long, Int, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._2).foreach { case (_, id, n, offt, pf, pl) =>
        assert(offt == cum, s"doc $id offset $offt != running sum $cum")
        cum += n
        assert(pf == offt / 256, s"doc $id pack_first")
        assert(pl == (offt + math.max(n, 1) - 1) / 256 && pl >= pf)
      }
    }
  }

  test("incremental pipeline (p03): every planted re-crawl is dropped " +
    "(in-batch dedup + store probe), commits attribute correctly, the " +
    "feed is insert-only, and the corpus holds no duplicate content") {
    import graft.sources.Versioned
    val out = PipelineQueries.queries("p03_incremental_pipeline")(
      spark, sf001).collect()
    val baseMax = graft.Tables(spark, sf001, "documents")
      .agg(max("doc_id")).head().getLong(0)
    val off = (baseMax / 1000000L + 1L) * 1000000L
    // no re-crawl id (>= off) survives: the store probe or the gate
    // caught every one
    assert(out.forall(_.getLong(0) < off), "a re-crawl reached the corpus")
    // commit attribution: v1 docs are batch A (even), v2 batch B (odd)
    assert(out.forall(r =>
      if (r.getInt(4) == 1) r.getLong(0) % 2 == 0
      else r.getLong(0) % 2 == 1), "commit attribution wrong")
    assert(out.exists(_.getInt(4) == 2), "no batch-B doc committed")
    // the change feed v1->v2 is pure inserts (net-new keys only)
    val root = PipelineQueries.incrRoot(spark, sf001)
    val types = Versioned.changeFeed(spark, root, "doc_id", 1, 2)
      .select("_change_type").distinct().as[String].collect().toSet
    assert(types == Set("insert"), s"unexpected feed types: $types")
    // no duplicate content in the final corpus
    val snap = Versioned.readAsOf(spark, root, 2)
    assert(snap.select("fp").distinct().count() == snap.count(),
      "duplicate fingerprints in the curated corpus")
  }

  test("adversarial corpus: empty/one-token/unicode/identical docs " +
    "flow through the whole chain without crashes, empties collapse " +
    "to one canonical doc, and the run is deterministic") {
    // a tiny documents table of pathological shapes, written in the
    // harness layout so chain() reads it like any SF dir
    val dir = TempDirs.createCleanedAtExit("graft-pipe-adversarial")
    val rows = Seq(
      (0L, "", "en", "src0", 0L),                  // empty
      (1L, "   ", "en", "src1", 3L),               // whitespace only
      (2L, "one", "en", "src1", 3L),               // single token
      (3L, "one", "en", "src2", 3L),               // identical, other source
      (4L, "züri çà émoji 🚀 text", "de", "src1", 21L), // unicode + emoji
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
        "en", "src2", 208L),                       // long repetitive
      (6L, "The, quick; brown! fox? (jumps) over \"lazy\" dog",
        "en", "src1", 48L),                        // punctuation soup
      (7L, "the quick brown fox jumps over the lazy dog again and again",
        "en", "src0", 60L),                        // src0 benchmark doc
      (8L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN",
        "en", "src1", 60L))                        // case variant of 7
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val st1 = PipelineQueries.chain(spark, dir)
    val out1 = PipelineQueries.queries("p01_corpus_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSeq
    // empties: docs 0 and 1 (and their planted copies) clean to the
    // identical boilerplate suffix -> ONE fp group, keeper id 0
    val s1 = st1.surv1.select("doc_id").as[Long].collect().toSet
    assert(s1.contains(0L) && !s1.contains(1L),
      "empty docs did not collapse onto the min-id keeper")
    // identical cross-source docs 2/3 collapse at exact dedup
    assert(s1.contains(2L) && !s1.contains(3L))
    // case variant 8 collapses onto 7 (fingerprint lowercases) —
    // 7 is src0; the fp keeper rule is id-min regardless of source
    assert(!s1.contains(8L))
    // the pipeline produced SOMETHING and every surviving doc is
    // non-src0 (7 is the benchmark split)
    assert(out1.nonEmpty)
    // determinism: a second full run is row-identical
    val out2 = PipelineQueries.queries("p01_corpus_pipeline")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(out1 == out2, "pipeline is nondeterministic on re-run")
    // p03 also survives the adversarial corpus end to end
    val p3 = PipelineQueries.queries("p03_incremental_pipeline")(
      spark, dir).collect()
    assert(p3.nonEmpty)
    val p3ids = p3.map(_.getLong(0)).toSet
    assert(p3ids.forall(_ <= 8L), "a planted re-crawl survived p03")
  }

  test("stage handoffs are genuine subsets: surv4 ⊆ surv3 ⊆ surv2 ⊆ " +
    "surv1 ⊆ cleaned ids") {
    val c = ids(st.cleaned); val s1 = ids(st.surv1)
    val s2 = ids(st.surv2); val s3 = ids(st.surv3); val s4 = ids(st.surv4)
    assert(s1.subsetOf(c) && s2.subsetOf(s1) && s3.subsetOf(s2) &&
      s4.subsetOf(s3))
  }

  test("p04: the LSH hot-bucket budget TRIGGERS on the planted giant " +
    "cluster, the truncation is reported, and the star candidates " +
    "still collapse the component to one cluster") {
    val m = PipelineQueries.queries("p04_lsh_skew_budget")(spark, sf001)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(m("budgeted_buckets") > 0, s"budget never fired: $m")
    assert(m("budgeted_memberships") > m("budgeted_buckets"))
    // the 150-doc planted cluster survives as ONE connected component
    assert(m("max_component") == 150L, s"giant component fragmented: $m")
    // star candidates are O(cluster), not O(cluster²): verified pairs
    // stay far below the 150·149/2 = 11,175 all-pairs enumeration
    assert(m("verified_pairs") < 1000L, s"budget inert: $m")
    // the funnel's budget row is present and zero on the HONEST chain
    // (p02's corpus has no bucket near the production budget)
    val funnel = PipelineQueries.queries("p02_pipeline_funnel")(
      spark, sf001).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(funnel("lsh_budgeted_buckets") == 0L, funnel.toString)
  }
}
