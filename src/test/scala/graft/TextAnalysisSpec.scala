package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens handles empty and multi-space text") {
    val df = Seq("", "  ", "one", "a  b\tc").toDF("t")
    val n = df.select(tokenCount($"t").as("n")).as[Int].collect()
    assert(n.toSeq == Seq(0, 0, 1, 3))
  }

  test("bpeishTokenCount splits letters, digits, symbols") {
    val df = Seq("hello world42!").toDF("t")
    // hello | world | 4 | 2 | !
    assert(df.select(bpeishTokenCount($"t")).as[Int].head() == 5)
  }

  test("fingerprint is invariant to case, punctuation, extra whitespace") {
    val df = Seq(("Hello,  World!", "hello world"), ("a b", "A   B."))
      .toDF("t1", "t2")
    val r = df.select((fingerprint($"t1") === fingerprint($"t2")).as("eq"))
      .as[Boolean].collect()
    assert(r.forall(identity))
  }

  test("rollingHash is order-sensitive, fingerprint-stable") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val r = df.select((rollingHash($"t1") =!= rollingHash($"t2")).as("ne"))
      .as[Boolean].head()
    assert(r)
  }

  test("hashUniform/splitAssign are deterministic with sane fractions") {
    val ids = spark.range(0, 5000).toDF("id")
    val r = ids.select(splitAssign($"id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    // 80/10/10 within a few points on 5k draws
    assert(math.abs(r("train") / 5000.0 - 0.8) < 0.03, r.toString)
    assert(math.abs(r("val") / 5000.0 - 0.1) < 0.03, r.toString)
    assert(math.abs(r("test") / 5000.0 - 0.1) < 0.03, r.toString)
    // same id -> same draw, different salt -> different draw
    val u = ids.limit(100)
      .select(hashUniform($"id").as("a"), hashUniform($"id").as("b"),
        hashUniform($"id", "x").as("c"))
      .as[(Double, Double, Double)].collect()
    assert(u.forall { case (a, b, _) => a == b })
    assert(u.exists { case (a, _, c) => a != c })
    assert(u.forall { case (a, _, c) => a >= 0 && a < 1 && c >= 0 && c < 1 })
  }

  test("cleanText strips tags, masks URLs then emails, collapses space") {
    val dirty = "<div id=\"x\">Hello   <b>world</b></div> " +
      "mail bob.smith+x@corp.example.com or " +
      "https://u:p@site.example.org/a?b=c#d  now"
    val r = Seq(dirty).toDF("t").select(cleanText($"t")).as[String].head()
    assert(r == "Hello world mail <EMAIL> or <URL> now")
    // URL containing userinfo '@' must be masked as a URL, not an email
    assert(!r.contains("site.example.org"))
  }

  test("shingles produce n-grams with short-text fallback") {
    val df = Seq("a b c d", "a b").toDF("t")
    val r = df.select(shingles($"t", 3).as("s")).as[Seq[String]].collect()
    assert(r(0) == Seq("a b c", "b c d"))
    assert(r(1) == Seq("a b"))
  }

  test("quality components on crafted strings") {
    val clean = "the quick brown fox jumps over the lazy dog and runs far"
    val spam = "buy buy buy buy buy !!!!! buy buy buy buy buy"
    val df = Seq(clean, spam).toDF("t")
    val q = df.select(qualityScore($"t").as("q")).as[Double].collect()
    assert(q(0) > q(1), s"clean=${q(0)} spam=${q(1)}")
    val rep = df.select(repetitionRatio($"t").as("r")).as[Double].collect()
    assert(rep(1) > 0.7 && rep(0) < 0.2)
    val pr = df.select(punctRatio($"t").as("p")).as[Double].collect()
    assert(pr(1) > 0.1 && pr(0) == 0.0)
  }

  test("redactPii counts and masks emails, phones, IPs") {
    val df = Seq(
      (1L, "mail me at a.b-c@ex-ample.co.uk or x@y.io thanks"),
      (2L, "call 555-123-4567 or 555-999-0000; server at 10.0.0.255 up"),
      (3L, "no pii here, just 1234-5678 and 1.2.3 fragments"),
      (4L, "")
    ).toDF("id", "t")
    val r = redactPii(df, "id", "t")
      .orderBy("id")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(r(0) == ((1L, 2, 0, 0, "mail me at <EMAIL> or <EMAIL> thanks")))
    assert(r(1) == ((2L, 0, 2, 1,
      "call <PHONE> or <PHONE>; server at <IP> up")))
    assert(r(2)._2 == 0 && r(2)._3 == 0 && r(2)._4 == 0 &&
      r(2)._5 == "no pii here, just 1234-5678 and 1.2.3 fragments")
    assert(r(3) == ((4L, 0, 0, 0, "")))
  }

  test("tokenBudgetSelect equals the naive global running-sum cut") {
    // synthetic docs with spread-out quality; budget lands mid-corpus
    // so the boundary bin is genuinely exercised
    val rng = new scala.util.Random(3L)
    val vocab = Seq("the", "fast", "query", "table", "row", "scan", "and")
    val docsDf = (0L until 200L).map { i =>
      val n = 5 + rng.nextInt(40)
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = tokenBudgetSelect(docsDf, "doc_id", "text",
        budget = 2000L)
      .orderBy("doc_id")
      .as[(Long, Double, Long, Int)].collect()
    // naive oracle: global window in (qbin desc, doc_id) order
    val naive = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(round(col("quality"), 3).desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docsDf.select(col("doc_id"),
          round(qualityScore(col("text")), 6).as("quality"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("keep",
          (sum("n_tokens").over(w) <= 2000L).cast("int"))
        .orderBy("doc_id")
        .as[(Long, Double, Long, Int)].collect()
    }
    assert(got.toSeq == naive.toSeq)
    val kept = got.filter(_._4 == 1).map(_._3).sum
    assert(kept <= 2000L && kept > 1500L, s"kept=$kept")
    // budget >= total keeps everything
    val all = tokenBudgetSelect(docsDf, "doc_id", "text",
        budget = 1000000L).agg(min("keep")).as[Int].head()
    assert(all == 1)
  }

  test("langId identifies real-language sentences") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with this"),
      ("de", "der hund ist nicht mit der katze auf das sofa gegangen"),
      ("es", "el perro es un animal que vive en la casa por la noche"),
      ("fr", "le chien est dans la maison et les chats sont sur une table"),
      ("zh", "这是一只猫在桌子上"))
    val df = samples.toDF("expected", "text")
    val r = df.select($"expected", langId($"text").as("got"))
      .as[(String, String)].collect()
    r.foreach { case (exp, got) => assert(exp == got, s"$exp -> $got") }
  }

  test("langId falls back to und on signal-free text") {
    val df = Seq("xyzzy qwerty asdf zxcv").toDF("t")
    assert(df.select(langId($"t")).as[String].head() == "und")
  }

  test("weightedStratifiedSample: deterministic, budgeted, capped") {
    val df = spark.range(0, 3000)
      .select($"id", (concat(lit("s"), ($"id" % 3))).as("src"))
    val w = when($"src" === "s0", 1.0)
      .when($"src" === "s1", 1.0).otherwise(8.0)
    val out = weightedStratifiedSample(df.toDF(), "id", "src", w, 1200)
    val sum = out.groupBy("src").agg(
        max($"n_target").as("target"),
        org.apache.spark.sql.functions.sum(when($"keep", 1L).otherwise(0L))
          .as("kept"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    // shares 1/10, 1/10, 8/10 of 1200 -> targets 120, 120, capped 960
    assert(sum("s0")._1 == 120L && sum("s1")._1 == 120L)
    assert(sum("s2")._1 == 960L) // 8/10*1200=960 < 1000, not capped
    // realized counts concentrate near targets (binomial, n=1000)
    Seq("s0", "s1", "s2").foreach { s =>
      val (t, k) = sum(s)
      assert(math.abs(k - t) < 60, s"$s kept=$k target=$t")
    }
    // determinism: same keeps regardless of partitioning
    val a = out.filter($"keep").select("id").as[Long].collect().toSet
    val b = weightedStratifiedSample(df.repartition(13).toDF(), "id",
        "src", w, 1200)
      .filter($"keep").select("id").as[Long].collect().toSet
    assert(a == b)
    // a weight dominating the budget caps at the stratum size (rate 1)
    val capped = weightedStratifiedSample(df.toDF(), "id", "src",
        when($"src" === "s0", 1000.0).otherwise(1.0), 3000)
      .filter($"src" === "s0")
    assert(capped.filter($"keep").count() == 1000L)
  }

  test("repetitionSignals computes Gopher-style gates exactly") {
    val docs = Seq(
      (1L, "a b a b a b"),         // top bigram "a b" x3
      (2L, "x x x x y"),           // run of 4 identical tokens
      (3L, ('a' to 'y').mkString(" ")), // 25 distinct: everything low
      (4L, "")                     // empty: all-zero signals
    ).toDF("doc_id", "text")
    val r = repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Double, Long, Boolean)].collect()

    // doc 1: "a b a b a b" -> doc_chars 11; bigrams [a b, b a, a b,
    // b a, a b]: top "a b" x3 covers 9 chars -> 9/11; trigrams
    // [a b a x2, b a b x2, a b a... ] all duplicated -> dup3 = 5*5/11
    val (_, top1, dup1, run1, keep1) = r(0)
    assert(math.abs(top1 - 9.0 / 11) < 1e-6)
    assert(math.abs(dup1 - math.rint(25.0 / 11 * 1e6) / 1e6) < 1e-9 ||
      dup1 > 1.0) // duplicated char mass can exceed doc chars (overlaps)
    assert(run1 == 1L && !keep1) // top2_frac 0.818 > 0.10

    // doc 2: run of four 'x' -> max_run 4 breaches maxRun=3
    val (_, _, _, run2, keep2) = r(1)
    assert(run2 == 4L && !keep2)

    // doc 3: 25 distinct tokens -> bigrams unique (top covers 3/49),
    // no duplicate trigrams, runs of 1
    val (_, top3, dup3, run3, keep3) = r(2)
    assert(math.abs(top3 - 3.0 / 49) < 1e-6 && dup3 == 0.0 &&
      run3 == 1L && keep3)

    // doc 4: empty text -> zero signals, run 0, keep
    val (_, top4, dup4, run4, keep4) = r(3)
    assert(top4 == 0.0 && dup4 == 0.0 && run4 == 0L && keep4)
  }

  test("unigramNll matches the hand-computed smoothed model") {
    // corpus: a:2 b:2 c:1 -> T=5, V=3, p(a)=p(b)=3/8, p(c)=2/8
    val df = Seq((1L, "a A b"), (2L, "b c"), (3L, ""))
      .toDF("doc_id", "text")
    val r = unigramNll(df, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val nlA = math.log(8.0 / 3)
    assert(r(1L)._1 == 3L)
    assert(math.abs(r(1L)._2.get - nlA) < 1e-12)
    assert(r(2L)._1 == 2L)
    assert(math.abs(r(2L)._2.get - (nlA + math.log(4.0)) / 2) < 1e-12)
    // empty doc: zero tokens, null score
    assert(r(3L) == (0L, None))

    // the model is corpus-relative: rarer tokens score strictly worse
    assert(r(2L)._2.get > r(1L)._2.get)
  }

  test("bigramNll matches the hand-computed model and is order-sensitive") {
    // corpus bigrams: "a b":2 (docs 1,2), "b a":1 (doc 2 pos 2);
    // unigram context counts: a:3, b:2 (doc 2 is "a b a"), c:1; V=3
    val df = Seq((1L, "a b"), (2L, "a B a"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    val r = bigramNll(df, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    val pAB = 3.0 / 6 // (c("a b")+1) / (c1("a")+V) = (2+1)/(3+3)
    val pBA = 2.0 / 5 // (1+1) / (2+3)
    assert(r(1L)._1 == 1L)
    assert(math.abs(r(1L)._2.get + math.log(pAB)) < 1e-12)
    assert(r(2L)._1 == 2L)
    assert(math.abs(r(2L)._2.get +
      (math.log(pAB) + math.log(pBA)) / 2) < 1e-12)
    // <2 tokens -> no bigrams, null score (never the degenerate
    // whole-text shingle)
    assert(r(3L) == (0L, None))
    assert(r(4L) == (0L, None))

    // order sensitivity — the point of the second model order: the
    // same bag of words in corpus-typical vs atypical order scores
    // differently under the bigram model (unigramNll cannot separate
    // these two docs)
    val o = Seq((1L, "x y x y x y"), (2L, "y y y x x x"))
      .toDF("doc_id", "text")
    val ro = bigramNll(o, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(x => x._1 -> x._3.get).toMap
    assert(ro(1L) < ro(2L))
    val ru = unigramNll(o, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(x => x._1 -> x._3.get).toMap
    assert(math.abs(ru(1L) - ru(2L)) < 1e-12)
  }

  test("stratifiedExactK: exact counts, deterministic, prefilter-invisible") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 1000)
      .select($"id", ($"id" % 3).cast("string").as("g"))
      .unionByName(Seq((9999L, "tiny")).toDF("id", "g"))
    val got = stratifiedExactK(df, "id", "g", k = 7)
      .select("g", "rk", "id").as[(String, Int, Long)].collect().toSet
    // exactly k per full stratum, all of an under-k stratum
    assert(got.count(_._1 == "0") == 7 && got.count(_._1 == "tiny") == 1)
    // the prefilter must be invisible: plain full window is the truth
    val full = df.withColumn("u", hashUniform($"id", "exactk"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy("u", "id")))
      .filter($"rk" <= 7)
      .select("g", "rk", "id").as[(String, Int, Long)].collect().toSet
    assert(got == full)
    // deterministic under re-partitioning
    val again = stratifiedExactK(df.repartition(13), "id", "g", k = 7)
      .select("g", "rk", "id").as[(String, Int, Long)].collect().toSet
    assert(again == got)
  }

  test("packSequences: contiguous offsets, boundary and empty-doc packs") {
    // one shard -> the stream is simply id order; capacity 4 exercises
    // an exact-boundary end (id 3 ends at token 8) and a straddle
    val docs = Seq(
      (1L, "t t t"),             // off 0, packs 0..0
      (2L, "t t t t"),           // off 3, straddles into pack 1
      (3L, "t t"),               // off 7, tokens 7-8 -> packs 1..2
      (4L, "t t t t t t t t"),   // off 9, packs 2..4
      (5L, "")                   // off 17, empty: pack 4 only
    ).toDF("doc_id", "text")
    val r = packSequences(docs, "doc_id", "text", capacity = 4, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "shard", "n_tokens", "tok_offset",
        "pack_first", "pack_last")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 0, 3, 0L, 0L, 0L)))
    assert(r(1) == ((2L, 0, 4, 3L, 0L, 1L)))
    assert(r(2) == ((3L, 0, 2, 7L, 1L, 2L)))
    assert(r(3) == ((4L, 0, 8, 9L, 2L, 4L)))
    assert(r(4) == ((5L, 0, 0, 17L, 4L, 4L)))
  }

  test("packSequences: shard streams are independent and deterministic") {
    val docs = spark.range(0, 400)
      .select($"id".as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), ($"id" % 7 + 1)),
          _ => lit("w"))).as("text"))
    val a = packSequences(docs, "doc_id", "text", capacity = 16, shards = 4)
    val b = packSequences(docs.repartition(13), "doc_id", "text",
      capacity = 16, shards = 4)
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq)
    // within every shard the offsets tile the stream with no gaps:
    // sum of n_tokens == max(offset + n_tokens) per shard
    val tiles = a.groupBy("shard")
      .agg(sum("n_tokens").as("s"),
        max(col("tok_offset") + col("n_tokens")).as("m"))
      .select((col("s") === col("m")).as("ok")).as[Boolean].collect()
    assert(tiles.length == 4 && tiles.forall(identity))
  }

  test("dsirSelect prefers raw docs that look like the target and is " +
      "partitioning-invariant") {
    import spark.implicits._
    // target speaks vocab A; raw pool is half A-speakers (ids 100-149),
    // half B-speakers (ids 150-199) — selection must skew hard to A
    def sentence(v: Seq[String], seed: Int) =
      (0 until 30).map(i => v((seed * 31 + i * 7) % v.size)).mkString(" ")
    val va = Seq("apple", "pear", "plum", "grape", "fig")
    val vb = Seq("bolt", "nut", "gear", "cam", "rod")
    val rows =
      (0 until 50).map(i => (i.toLong, sentence(va, i), true)) ++
      (100 until 150).map(i => (i.toLong, sentence(va, i), false)) ++
      (150 until 200).map(i => (i.toLong, sentence(vb, i), false))
    val df = rows.toDF("doc_id", "text", "is_t")
    val sel = dsirSelect(df, "doc_id", "text",
      col("is_t"), k = 40)
    val picked = sel.select("doc_id").as[Long].collect().toSet
    assert(picked.size == 40)
    val fromA = picked.count(_ < 150)
    assert(fromA >= 35, s"only $fromA/40 picks from the target-like half")
    // content-keyed gumbel + rounded-key ranking → partitioning-invariant
    val again = dsirSelect(df.repartition(7), "doc_id",
        "text", col("is_t"), k = 40)
      .select("rk", "doc_id").as[(Int, Long)].collect().toSet
    val first = sel.select("rk", "doc_id").as[(Int, Long)].collect().toSet
    assert(again == first)
  }

  test("perplexityBuckets equals the textbook ntile window, any " +
      "partitioning, including a hot-language skew") {
    import org.apache.spark.sql.expressions.Window
    // 3 languages with skew: 'en' dominates (the case the distributed
    // rank exists for); repeated seeds produce TIED nll scores so the
    // tie-group path is exercised
    def sentence(seed: Int) = {
      val v = Seq("the", "cat", "sat", "on", "a", "mat", "dog", "ran")
      (0 until 12).map(i => v((seed + i * 3) % v.size)).mkString(" ")
    }
    val rows = (0 until 60).map(i => (i.toLong, sentence(i % 7), "en")) ++
      (100 until 110).map(i => (i.toLong, sentence(i % 3), "fr")) ++
      (200 until 204).map(i => (i.toLong, sentence(i), "de"))
    val df = rows.toDF("doc_id", "text", "lang")
    val expected = bigramNll(df, "doc_id", "text")
      .filter(col("n_bigrams") >= 1)
      .join(df.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"),
        round(col("avg_nll"), 4).as("nll"))
      .withColumn("bucket", ntile(3).over(Window.partitionBy("lang")
        .orderBy(col("nll"), col("doc_id"))).cast("int"))
      .select("doc_id", "lang", "nll", "bucket")
      .as[(Long, String, Double, Int)].collect().toSet
    for (parts <- Seq(1, 7)) {
      val got = perplexityBuckets(df.repartition(parts), "doc_id",
          "text", "lang", k = 3)
        .as[(Long, String, Double, Int)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
    // equal-split contract: per-language bucket sizes differ by <= 1
    val sizes = perplexityBuckets(df, "doc_id", "text", "lang", k = 3)
      .groupBy("lang", "bucket").count()
      .select("lang", "count").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2))
    sizes.foreach { case (lang, cs) =>
      assert(cs.max - cs.min <= 1, s"$lang buckets unbalanced: $cs")
    }
  }

  test("winnowedPrints: shared long runs guarantee a shared print; " +
    "unrelated docs share none; selection is sparse") {
    val run = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, s"aaa bbb $run ccc"),
      (2L, s"xxx yyy zzz $run qqq www"),       // shares the 30-token run
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10")   // unrelated
    ).toDF("doc_id", "text")
    val p = winnowedPrints(df, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Long)].collect()
    val byDoc = p.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    // Schleimer guarantee: a shared run of >= w+k-1 tokens yields at
    // least one shared fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run missed")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "false positive vs unrelated")
    // density: ~2/(w+1) of the ~29 windows -> far fewer prints than
    // shingles (the whole point vs hashing every shingle)
    assert(byDoc(1L).size < 20, s"selection not sparse: ${byDoc(1L).size}")
  }

  test("bpeMerges: hand-computed greedy merges, adjacent repeats fuse " +
    "non-overlapping") {
    // words: "aaaa" x2, "ab" x2
    //   step 1: (a,a) appears 3x per "aaaa" -> cnt 6; fuse must yield
    //           "aa aa" (greedy left-to-right scan), NOT "aa a a"
    //   step 2: (aa,aa) and (a,b) tie at 2 -> lexicographic pick (a,b)
    //   step 3: (aa,aa) remains -> cnt 2
    val df = Seq("aaaa aaaa", "ab ab").toDF("text")
    val got = bpeMerges(df, "text", steps = 3)
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a+a", 6L), (2, "a+b", 2L), (3, "aa+aa", 2L)),
      s"got $got")
    // fewer pairs than steps: stops early instead of emitting junk
    val tiny = Seq("xy").toDF("text")
    val g2 = bpeMerges(tiny, "text", steps = 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(g2 == Seq((1, "x+y", 1L)), s"got $g2")
  }
}
