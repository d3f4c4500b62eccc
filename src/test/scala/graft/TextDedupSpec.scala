package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.model.Tables
import graft.queries.DedupQueries

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: correct shingles, empty below n tokens") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(wordNgrams($"text", 3).as("g")).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("jaccard: identical=1, disjoint=0, empty-safe") {
    val out = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("a", "b").select(jaccard($"a", $"b")).as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("minhash similarity estimate tracks exact jaccard") {
    // near-dup pair vs unrelated pair from sf0.001 planted duplicates
    val sh = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", shingleSet($"text", 3).as("g"))
      .withColumn("sig", minhashSignature($"g", 64))
    val pairs = DedupQueries.queries("dedup_minhash_lsh")(spark, sf0001)
    // every LSH-found pair above τ must also be found by brute force & vice versa
    val brute = {
      val a = sh.select($"doc_id".as("doc_a"), $"g".as("ga"))
      val b = sh.select($"doc_id".as("doc_b"), $"g".as("gb"))
      a.join(b, $"doc_a" < $"doc_b")
        .withColumn("jac", jaccard($"ga", $"gb"))
        .filter($"jac" >= 0.8)
        .select("doc_a", "doc_b", "jac")
    }
    assert(pairs.exceptAll(brute).isEmpty && brute.exceptAll(pairs).isEmpty)
    assert(pairs.count() > 0, "sf0.001 should contain planted near-duplicates")
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val d = Seq(
      (1L, "spark window join filter table scan merge sort agg group"),
      (2L, "spark window join filter table scan merge sort agg groups"), // 1 token差
      (3L, "zebra yak xylophone walrus vulture tiger snake rabbit")
    ).toDF("doc_id", "text").select($"doc_id", simhash31($"text").as("sh"))
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("polyHash31 is order-sensitive and deterministic") {
    val out = Seq("ab", "ba", "ab").toDF("s")
      .select(polyHash31($"s")).as[Long].collect()
    assert(out(0) != out(1) && out(0) == out(2))
    assert(out(0) == ('a'.toLong * 31 + 'b'.toLong) % 2147483647L)
  }

  test("langId picks marker-majority language with deterministic ties") {
    val out = Seq(
      "the cat and the dog is in it",
      "der hund und die katze ist nicht",
      "xyzzy plugh")  // no markers anywhere → all counts 0 → first lang wins
      .toDF("text").select(langId($"text")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "en"))
  }

  test("exact dedup groups by content digest") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = d.groupBy(md5($"text".cast("binary")))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n"))
      .select("keep_id", "n").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("PPJoin prefix filter: one planted hot shingle produces zero candidates") {
    // 50 docs sharing one boilerplate 3-gram, each with 9 unique grams:
    // pairwise jac = 1/19 << 0.8, yet an unfiltered inverted index
    // would emit 50*49/2 = 1225 candidate pairs through the hot
    // shingle. The hot shingle has the highest document frequency, so
    // the (df asc, shingle) global order puts it LAST in every doc —
    // never inside a prefix — and candidates collapse to zero.
    val docs = (1 to 50).map { i =>
      (i.toLong, "common boiler plate " + (1 to 9).map(j => s"u${i}w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      graft.functions.KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    val cands = DedupQueries.ppjoinCandidates(sh, tauNum = 4, tauDen = 5)
    assert(cands.count() == 0L)
    // sanity: the same corpus with a genuine near-dup pair still recalls it
    val docs2 = docs.unionByName(
      Seq((100L, "common boiler plate " + (1 to 9).map(j => s"u1w$j").mkString(" ")))
        .toDF("doc_id", "text")) // exact copy of doc 1's text
    val sh2 = docs2.select($"doc_id",
      graft.functions.KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    val cands2 = DedupQueries.ppjoinCandidates(sh2, tauNum = 4, tauDen = 5)
      .as[(Long, Long)].collect().toSet
    assert(cands2.contains((1L, 100L)))
  }

  test("PPJoin prefix anchor cap: identical docs bound candidates to O(m·cap); uncapped below the cap") {
    // 120 byte-identical docs: every gram is in every doc, jac = 1, so
    // the prefix filter cannot help (it is boilerplate the FILTER
    // keeps, unlike the hot-shingle case above) — uncapped, each
    // prefix gram's posting list emits Θ(m²) pairs. With the anchor
    // cap, a pair survives iff its smaller doc ranks within the cap
    // smallest of the posting list: exactly the LshBucketCap contract
    // on the prefix inverted index (the τ-sweep audit's rail).
    val m = 120
    val cap = 8
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val hot = (1 to m).map(i => (i.toLong, text)).toDF("doc_id", "text")
    def shOf(df: org.apache.spark.sql.DataFrame) = df.select($"doc_id",
      graft.functions.KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    val capped = DedupQueries.ppjoinCandidates(shOf(hot), tauNum = 7, tauDen = 10,
      anchorCap = Some(cap)).as[(Long, Long)].collect().toSet
    assert(capped.size == (1 to cap).map(m - _).sum,
      s"expected O(m·cap) = ${(1 to cap).map(m - _).sum}, got ${capped.size}")
    assert(capped.forall { case (a, _) => a <= cap },
      "every pair's smaller id must be an anchor (posting-list rank ≤ cap)")
    assert(capped.flatMap { case (a, b) => Set(a, b) } == (1L to m.toLong).toSet,
      "every doc must still pair with an anchor")
    // below the cap, the capped join IS the uncapped one
    val small = (1 to cap).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val u = DedupQueries.ppjoinCandidates(shOf(small), 7, 10).as[(Long, Long)].collect().toSet
    val c = DedupQueries.ppjoinCandidates(shOf(small), 7, 10, Some(cap))
      .as[(Long, Long)].collect().toSet
    assert(u == c && u.size == cap * (cap - 1) / 2)
    // …and at τ = 0.8, the configuration dedup_ngram_jaccard and the
    // candidate audit now run CAPPED BY DEFAULT (round 12): same
    // identity below the cap, so every brute-force oracle that checks
    // them stays exact wherever posting lists are under the rail
    val u8 = DedupQueries.ppjoinCandidates(shOf(small), 4, 5).as[(Long, Long)].collect().toSet
    val c8 = DedupQueries.ppjoinCandidates(shOf(small), 4, 5, Some(cap))
      .as[(Long, Long)].collect().toSet
    assert(u8 == c8 && u8.size == cap * (cap - 1) / 2)
  }

  test("LSH hot-bucket anchor cap: planted boilerplate bounds candidates to O(m·cap), anchors keep the group connected") {
    // 200 byte-identical boilerplate docs: identical shingle sets →
    // identical signatures → the SAME bucket in all 16 bands. An
    // uncapped bucket self-join would emit 200·199/2 = 19900 candidate
    // pairs; the anchor cap keeps a pair iff its smaller id ranks
    // within the cap smallest of the bucket, so volume is Σ_{a≤cap}
    // (m−a) — O(m·cap) — while every member still pairs with anchor 1
    // (survivor components stay connected through the anchors).
    val m = 200
    val cap = 8
    val text = "common boiler plate template shared verbatim by every crawl copy"
    val hot = (1 to m).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val sh = hot.select($"doc_id",
      graft.functions.KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    val capped = DedupQueries.lshCandidates(sh, cap = cap)
      .as[(Long, Long)].collect().toSet
    assert(capped.size == (1 to cap).map(m - _).sum,
      s"expected O(m·cap) = ${(1 to cap).map(m - _).sum}, got ${capped.size}")
    assert(capped.forall { case (a, _) => a <= cap },
      "every pair's smaller id must be an anchor (rank ≤ cap)")
    val touched = capped.flatMap { case (a, b) => Set(a, b) }
    assert(touched == (1L to m.toLong).toSet,
      "every bucket member must still pair with an anchor")
    // below the cap the capped join IS the uncapped self-join
    val small = (1 to cap).map(i => (i.toLong, text)).toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    assert(DedupQueries.lshCandidates(small, cap = cap).count() ==
      cap.toLong * (cap - 1) / 2)
  }

  test("simhash block banding: anchor cap bounds a saturated pair bucket") {
    // signatures i << 13 put i into block 2 of the 7+6+6+6+6 layout
    // and ZERO into blocks 0, 1, 3, 4 — so every pair's FIRST equal
    // block pair is (0, 1), one saturated two-block bucket. Uncapped
    // candidates are all m(m-1)/2 pairs through it; the anchor cap
    // keeps a pair iff its smaller signature ranks within cap there.
    val m = 60 // block 2 is 6 bits — keep i inside one block
    val cap = 4
    val sigs = (1 to m).map(i => Tuple1(i.toLong << 13)).toDF("sh")
    val unc = DedupQueries.simhashBlockCandidates(sigs, cap = Int.MaxValue)
    assert(unc.count() == m.toLong * (m - 1) / 2)
    val capped = DedupQueries.simhashBlockCandidates(sigs, cap = cap)
      .as[(Long, Long)].collect().toSet
    assert(capped.size == (1 to cap).map(m - _).sum)
    assert(capped.subsetOf(unc.as[(Long, Long)].collect().toSet))
    // every signature still meets the bucket's anchors
    assert(capped.flatMap(p => Set(p._1, p._2)) == (1 to m).map(_.toLong << 13).toSet)
    // and the full pair operator is unchanged on realistic data where
    // nothing approaches the cap
    val d = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", simhash31($"text").as("sh"))
    val dflt = DedupQueries.simhashPairs(d).as[(Long, Long, Long)].collect().toSet
    val huge = DedupQueries.simhashPairs(d, cap = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(dflt == huge && dflt.nonEmpty)
  }

  test("wide simhash (62-bit): block plan == in-memory brute force; no looser than 31-bit") {
    val pairs = DedupQueries.queries("dedup_simhash_wide")(spark, sf0001)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val sigs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", simhash62($"text").as("sh")).as[(Long, Long)].collect()
    val brute = (for {
      (i, si) <- sigs; (j, sj) <- sigs
      if i < j && java.lang.Long.bitCount(si ^ sj) <= 3
    } yield (i, j)).toSet
    assert(pairs == brute, s"plan=${pairs.size} brute=${brute.size}")
    assert(pairs.nonEmpty, "planted near-duplicates must survive the sharper 62-bit test")
    // 62 bits separates harder: the saturated 31-bit neighborhood
    // (unrelated docs at expected ham ~15.5) cannot reappear
    val narrow = DedupQueries.queries("dedup_simhash")(spark, sf0001)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.size <= narrow.size)
  }

  test("scrub_spans: first-doc keeps text verbatim, short docs untouched, removal bounded") {
    val d = Tables.load(spark, sf0001, "documents")
    val out = graft.queries.PipelineQueries.queries("pipeline_scrub_spans")(spark, sf0001)
    val joined = out.join(d, "doc_id")
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_hash",
        md5($"text".cast("binary")).as("orig_hash"),
        size(tokens($"text")).cast("long").as("n_tok_direct"))
      .collect()
    assert(joined.length == d.count()) // every document is accounted for
    joined.foreach { r =>
      val (nTok, nRem) = (r.getLong(1), r.getLong(2))
      assert(nTok == r.getLong(5))
      assert(nRem >= 0 && nRem <= nTok)
      if (nTok < 8) assert(nRem == 0) // no spans ⇒ nothing to scrub
      // untouched documents round-trip byte-identically
      if (nRem == 0) assert(r.getString(3) == r.getString(4))
      else assert(r.getString(3) != r.getString(4))
    }
    // the planted near-duplicates guarantee the scrub actually fires
    assert(joined.map(_.getLong(2)).sum > 0)
  }

  test("containment: prefix-filtered directed pairs == brute force at τ=0.9") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.DedupQueries.queries("dedup_containment")(spark, sf0001)
    val d = graft.model.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.KernelExpressions.sortedNgramSet(split(col("text"), " "), 3).as("g"))
    val a = d.select(col("doc_id").as("doc_a"), col("g").as("ga")).filter(size(col("ga")) > 0)
    val b = d.select(col("doc_id").as("doc_b"), col("g").as("gb"))
    val bf = a.join(b, col("doc_a") =!= col("doc_b")) // BNLJ fine at test scale
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .filter(col("inter") * 10 >= size(col("ga")).cast("long") * 9)
      .select("doc_a", "doc_b")
    val got = out.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(out.filter(col("containment") < 0.9 || col("containment") > 1.0).isEmpty)
  }

  test("epoch shuffle: positions are an exact permutation that actually permutes") {
    val out = graft.queries.PipelineQueries.queries("pipeline_epoch_shuffle")(spark, sf0001)
      .collect()
    assert(out.length == 500)
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to 500L).toSeq)
    // the hash order must not degenerate to id order (it's a shuffle)
    val byPos = out.sortBy(_.getLong(2)).map(_.getLong(0))
    assert(!byPos.sameElements(byPos.sorted))
  }

  test("simpson diversity: bounds hold and repeated-token docs score higher") {
    val out = graft.queries.TextQueries.queries("text_simpson_diversity")(spark, sf0001)
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (n, d) = (r.getLong(1), r.getLong(2))
      val (simpson, ratio) = (r.getDouble(3), r.getDouble(4))
      // Σ(c/n)² ∈ [1/|W|, 1] and |W|/n ∈ (0, 1]; equalities at the
      // uniform / single-token extremes; 1e-6 absorbs the 6-dp output
      // rounding
      assert(simpson >= 1.0 / d - 1e-6 && simpson <= 1.0 + 1e-6, r)
      assert(ratio > 0.0 && ratio <= 1.0 && d <= n, r)
    }
  }

  test("DotProduct throws on dimension mismatch instead of truncating") {
    import graft.functions.KernelExpressions.dot
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] { df.select(dot($"a", $"b")).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))))
    val ok = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(dot($"a", $"b")).as[Double].head()
    assert(ok == 11.0)
  }

  test("gopher rule battery matches a driver-side reimplementation") {
    val out = graft.queries.TextQueries.queries("text_gopher_rules")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5),
          Seq(6, 7, 8, 9, 10, 11).map(r.getLong))))
      .toMap
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
    assert(docs.length == 500 && out.size == 500)
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    docs.foreach { r =>
      val text = r.getString(1)
      // Spark split(text, " ") == Java split(" ", -1): trailing empties kept
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val meanLen = toks.map(_.length.toLong).sum.toDouble / n.toDouble
      val symRatio = text.count(c => c == '#' || c == '…').toDouble / n.toDouble
      val alphaFrac = toks.count(_.exists(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toDouble / n.toDouble
      val stopHits = stops.count(toks.contains).toLong
      def flag(b: Boolean) = if (b) 1L else 0L
      val flags = Seq(
        flag(n >= 50L && n <= 100000L),
        flag(meanLen >= 3.0 && meanLen <= 10.0),
        flag(symRatio < 0.1),
        flag(alphaFrac >= 0.8),
        flag(stopHits >= 2L))
      assert(out(r.getLong(0)) ==
        ((n, meanLen, symRatio, alphaFrac, stopHits, flags :+ flag(flags.forall(_ == 1L)))),
        s"doc ${r.getLong(0)}")
    }
    // the word-count rule must actually discriminate on this corpus
    val wcPass = out.values.count(_._6.head == 1L)
    assert(wcPass > 0 && wcPass < 500, s"wcPass=$wcPass")
  }

  test("LSH decontamination equals the cross-source slice of the τ=0.8 pair graph") {
    val src = Tables.load(spark, sf0001, "documents").select("doc_id", "source")
    val pairs = DedupQueries.lshVerifiedPairs(spark, sf0001)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
    // direct each cross-source pair train → eval, either original order
    val slice = pairs.filter(col("src_a") === "src0" && col("src_b") =!= "src0")
      .select(col("doc_b").as("train_id"), col("doc_a").as("eval_id"), col("jac"))
      .union(pairs.filter(col("src_a") =!= "src0" && col("src_b") === "src0")
        .select(col("doc_a").as("train_id"), col("doc_b").as("eval_id"), col("jac")))
    val out = graft.queries.PipelineQueries
      .queries("pipeline_decontaminate_lsh")(spark, sf0001)
    assert(out.except(slice).isEmpty && slice.except(out).isEmpty)
  }

  test("candidate audit: all five generators at full recall, sane efficiency") {
    val rows = DedupQueries.queries("dedup_candidate_audit")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet ==
      Set("minhash_lsh", "ppjoin", "winnow", "snm", "snm_global"), rows.keySet)
    // boundary-free corpus: the equal-key and global-order SNM rows
    // must agree on verified recall (the straddling fixture elsewhere
    // is where they diverge); global can only ADD candidates
    assert(rows("snm_global").getLong(2) >= rows("snm").getLong(2))
    rows.foreach { case (m, r) =>
      val (nc, nv, nt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nt > 0, "empty truth set makes the audit vacuous")
      // all generators are recall-lossless on this corpus: LSH by the
      // banding guarantee at the harness similarity gap (asserted
      // against brute force above), PPJoin structurally, winnow because
      // τ=0.8 near-dups here share ≥ 8-token runs (the SWA guarantee;
      // the subset test above pins it directly), SNM because the
      // planted near-dups perturb at most one end of the doc (measured,
      // not guaranteed — that measurement being visible is the audit's
      // whole point)
      assert(r.getDouble(4) == 1.0, s"$m recall=${r.getDouble(4)}")
      assert(nv <= nc, s"$m verified $nv > candidates $nc")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, s"$m efficiency")
    }
  }

  test("PII redaction: planted emails/IPs/phones replaced once each, harness corpus untouched") {
    import graft.ops.Redact._
    val docs = Seq(
      (1L, "contact john.doe+x@example.org or admin@sub.example.co today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255."),
      (3L, "call +1 (555) 123-4567 now"),
      (4L, "clean text with no pii at all"),
      (5L, "mixed: a@b.io via 8.8.8.8 tel 555-867-5309")).toDF("doc_id", "text")
    val out = docs
      .withColumn("t1", regexp_replace($"text", emailRe, "<EMAIL>"))
      .withColumn("t2", regexp_replace($"t1", ipv4Re, "<IP>"))
      .select($"doc_id",
        regexp_replace($"t2", phoneRe, "<PHONE>").as("red"),
        (size(regexp_extract_all($"text", lit(emailRe), lit(0))) +
          size(regexp_extract_all($"t1", lit(ipv4Re), lit(0))) +
          size(regexp_extract_all($"t2", lit(phoneRe), lit(0)))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("contact <EMAIL> or <EMAIL> today", 2L)), out(1L))
    assert(out(2L) == (("server at <IP> and <IP>.", 2L)), out(2L))
    assert(out(3L) == (("call <PHONE> now", 1L)), out(3L))
    assert(out(4L) == (("clean text with no pii at all", 0L)), out(4L))
    assert(out(5L) == (("mixed: <EMAIL> via <IP> tel <PHONE>", 3L)), out(5L))
    // the harness corpus has no digits or '@': the registered query
    // must be the identity rewrite (the oracle hash-checks the same)
    val reg = graft.queries.PipelineQueries
      .queries("pipeline_redact_pii")(spark, sf0001)
    assert(reg.filter(col("n_redactions") =!= 0L).count() == 0)
  }

  test("unigram rarity matches a driver-side fixed-point reimplementation") {
    val out = graft.queries.TextQueries.queries("text_unigram_rarity")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val cw = docs.values.flatten.groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    val n = cw.values.sum
    assert(out.size == 500)
    docs.foreach { case (id, toks) =>
      val sumTerm = toks.map(t => 1000000L * n / cw(t)).sum
      val exact = sumTerm.toDouble / 1000000.0 / toks.length.toDouble
      val (nTok, rarity) = out(id)
      assert(nTok == toks.length.toLong, s"doc $id")
      // every term is ≥ 1e6 (c_w ≤ N) so the score is ≥ 1 by construction
      assert(rarity >= 1.0 - 1e-6 && math.abs(rarity - exact) <= 1e-6, s"doc $id")
    }
  }

  test("source TV divergence: exact on driver recompute, all pairs, bounds") {
    val rows = graft.queries.TextQueries.queries("text_source_divergence")(spark, sf0001)
      .collect()
    val bySrc = Tables.load(spark, sf0001, "documents")
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.flatMap(_.getString(1).split(" ", -1)).groupBy(identity)
          .map { case (t, o) => t -> o.size.toLong }
      }
    val totals = bySrc.map { case (s, m) => s -> m.values.sum }
    assert(rows.length == bySrc.keySet.toSeq.combinations(2).size)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (na, nb, tv) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(sa < sb && na == totals(sa) && nb == totals(sb))
      val keys = bySrc(sa).keySet ++ bySrc(sb).keySet
      val num = keys.toSeq
        .map(k => math.abs(bySrc(sa).getOrElse(k, 0L) * nb - bySrc(sb).getOrElse(k, 0L) * na))
        .sum
      val exact = num.toDouble / (2.0 * na * nb)
      assert(tv >= 0.0 && tv <= 1.0 && math.abs(tv - exact) <= 1e-6, s"($sa,$sb)")
    }
  }

  test("ngram novelty agrees with brute-force span document frequency") {
    val out = graft.queries.TextQueries.queries("text_ngram_novelty")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val spanSets = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).sliding(8).filter(_.length == 8)
          .map(_.mkString(" ")).toSet)
      .toMap
    val df = spanSets.values.toSeq.flatten.groupBy(identity)
      .map { case (sp, o) => sp -> o.size }
    assert(out.size == 500)
    spanSets.foreach { case (id, spans) =>
      val novel = spans.count(df(_) == 1).toLong
      val (nSpans, novelSpans, novelty) = out(id)
      assert(nSpans == spans.size.toLong && novelSpans == novel, s"doc $id")
      val exact = if (spans.isEmpty) 0.0 else novel.toDouble / spans.size.toDouble
      assert(math.abs(novelty - exact) <= 1e-6, s"doc $id")
    }
    // the planted near-duplicates must drag novelty below 1 somewhere,
    // and fully-original docs must exist too — the score discriminates
    assert(out.values.exists(_._3 < 0.999) && out.values.exists(_._3 > 0.999))
  }

  test("DSIR weights match a driver-side fixed-point reimplementation") {
    val out = graft.queries.PipelineQueries.queries("pipeline_dsir_weights")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text").collect()
    def bucket(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 2147483647L) % 1024L
    def feats(text: String): Seq[Long] = {
      val toks = text.split(" ", -1)
      (toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
        .map(bucket).toSeq
    }
    val (target, train) = docs.partition(_.getString(1) == "src0")
    val t = target.flatMap(r => feats(r.getString(2)))
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val sc = train.flatMap(r => feats(r.getString(2)))
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val (nt, ns) = (t.values.sum, sc.values.sum)
    assert(out.size == train.length && train.nonEmpty)
    train.foreach { r =>
      val fs = feats(r.getString(2))
      val sumR = fs.map(b =>
        10000L * (t.getOrElse(b, 0L) + 1L) * (ns + 1024L)
          / ((sc(b) + 1L) * (nt + 1024L))).sum
      val exact = sumR.toDouble / 10000.0 / fs.length.toDouble
      val (nf, w) = out(r.getLong(0))
      assert(nf == fs.length.toLong && math.abs(w - exact) <= 1e-6, s"doc ${r.getLong(0)}")
    }
    // the score must discriminate (src0-near-dup plants rank differently)
    assert(out.values.map(_._2).toSet.size > 1)
  }

  test("BPE encode matches a driver-side greedy merge reimplementation") {
    val out = graft.queries.TextQueries.queries("text_bpe_encode")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    val docsRaw = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    // learn the top-8 merge table exactly as the query does
    val merges = docsRaw.flatMap { case (_, toks) =>
      toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }.groupBy(identity).map { case (p, o) => p -> o.size }
      .toSeq.sortBy { case (p, f) => (-f, p) }.take(8).map(_._1)
    def applyMerge(toks: Seq[String], pair: String): Seq[String] = {
      val Array(a, b) = pair.split(" ", 2)
      val outB = scala.collection.mutable.ArrayBuffer[String]()
      var carry: String = null
      toks.foreach { t =>
        if (carry == null) carry = t
        else if (carry == a && t == b) { outB += pair; carry = null }
        else { outB += carry; carry = t }
      }
      if (carry != null) outB += carry
      outB.toSeq
    }
    assert(out.size == docsRaw.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    docsRaw.foreach { case (id, toks) =>
      val enc = merges.foldLeft(toks)(applyMerge)
      val (n, nb, ratio, dig) = out(id)
      assert(n == toks.length.toLong && nb == enc.length.toLong, s"doc $id")
      assert(math.abs(ratio - enc.length.toDouble / toks.length.toDouble) <= 1e-6, s"doc $id")
      // digest pins CONTENT, not just counts — md5 over the \u0001-joined
      // encoded stream (the separator keeps the digest injective over
      // token boundaries: "ab"+"c" must not collide with "a"+"bc")
      val expDig = md.digest(enc.mkString("\u0001").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(dig == expDig, s"doc $id digest")
    }
    // the corpus has repeated bigrams: encoding must shrink somewhere
    assert(out.values.exists { case (n, nb, _, _) => nb < n })
  }

  test("weighted systematic sample: stride coverage, positive weights, PPS bound") {
    val rows = graft.queries.PipelineQueries.queries("pipeline_weighted_sample")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = d.values.sum
    val stride = math.max(tot / 100L, 1L)
    // every pick has positive weight and matches the corpus weight
    rows.foreach { case (id, w, _, _) => assert(w > 0 && d(id) == w, s"doc $id") }
    // one pick per covered stride: pick count == distinct stride indices,
    // and equals the number of stride multiples ≤ tot (minus any multiple
    // swallowed by a same-interval predecessor)
    val picks = rows.map(_._4)
    assert(picks.distinct.length == picks.length)
    assert(picks.length <= (tot / stride).toInt && picks.length >= 50, s"n=${picks.length}")
    // picks ordered by cum have non-decreasing stride indices
    val byCum = rows.sortBy(_._3).map(_._4)
    assert(byCum.zip(byCum.tail).forall { case (a, b) => a < b })
  }

  test("cross-source matrix replays the pair set's endpoint sources") {
    val src = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (src(a), src(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val out = DedupQueries.queries("dedup_cross_source_matrix")(spark, sf0001)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getDouble(3)))
    assert(out.map(o => o._1 -> o._2).toMap == expected && out.nonEmpty)
    // shares sum to ~1 over the matrix and each is n_pairs/total
    val total = pairs.length.toDouble
    out.foreach { case (_, n, share) =>
      assert(math.abs(share - n / total) <= 1e-6)
    }
  }

  test("duplicate n-gram char coverage matches a driver-side positional replay") {
    val docsRaw = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    def expected(toks: Seq[String], n: Int): (Long, Long) = {
      val total = toks.map(_.length.toLong).sum
      if (toks.length < n) return (0L, total)
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      val dup = grams.groupBy(identity).filter(_._2.length >= 2).keySet
      val covered = grams.zipWithIndex.collect {
        case (g, i) if dup(g) => (i until i + n)
      }.flatten.toSet
      (covered.toSeq.map(p => toks(p).length.toLong).sum, total)
    }
    val out = graft.queries.TextQueries.queries("text_dup_ngram_fraction")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.size == docsRaw.length * 3)
    for ((id, toks) <- docsRaw; n <- Seq(2, 3, 4)) {
      val (dc, tc) = expected(toks, n)
      val (odc, otc, frac) = out((id, n))
      assert(odc == dc && otc == tc, s"doc $id n=$n: got ($odc,$otc) want ($dc,$tc)")
      assert(math.abs(frac - dc.toDouble / tc.toDouble) <= 1e-6, s"doc $id n=$n frac")
    }
    // the synthetic corpus repeats bigrams: the signal must fire somewhere
    assert(out.exists { case ((_, n), (dc, _, _)) => n == 2 && dc > 0 })
  }

  test("Zipf deviation matches a driver-side scaled-integer replay") {
    val toks = Tables.load(spark, sf0001, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
    val top = toks.groupBy(identity).map { case (t, o) => (t, o.length.toLong) }
      .toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
    val tot = top.map(_._2).sum
    val zws = top.indices.map(i => 1000000000000L / (i + 1))
    val hsum = zws.sum
    val expected = top.zipWithIndex.map { case ((t, f), i) =>
      val obs = f * 1000000L / tot
      val exp = zws(i) * 1000000L / hsum
      (i + 1L) -> ((t, f, obs, exp, math.abs(obs - exp)))
    }.toMap
    val out = graft.queries.TextQueries.queries("text_zipf_deviation")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out == expected && out.nonEmpty)
    // the synthetic corpus is near-uniform: rank-1 must deviate hugely
    assert(out(1L)._5 > 100000L, s"rank-1 dev ${out(1L)._5}")
  }

  test("token-budget selection equals a driver-side greedy fill") {
    val docsRaw = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val scored = docsRaw.map { case (id, toks) =>
      (id, toks.length.toLong, toks.distinct.length.toLong * 10 / toks.length)
    }
    val budget = scored.map(_._2).sum / 3
    var cum = 0L
    val expected = scored.sortBy { case (id, _, sc) => (-sc, id) }.flatMap {
      case (id, n, sc) =>
        cum += n
        if (cum <= budget) Some(id -> ((sc, n, cum))) else None
    }.toMap
    val out = graft.queries.PipelineQueries.queries("pipeline_token_budget")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == expected && out.nonEmpty)
    // greedy maximality: kept mass fits, adding any one more would not
    assert(out.values.map(_._2).sum <= budget)
  }

  test("threshold sensitivity: monotone in tau, 0.8 row equals the pair query") {
    val out = DedupQueries.queries("dedup_threshold_sensitivity")(spark, sf0001)
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(0.7, 0.8, 0.9))
    // tightening tau can only shrink the pair set and its doc support
    assert(out(0.7)._1 >= out(0.8)._1 && out(0.8)._1 >= out(0.9)._1)
    assert(out(0.7)._2 >= out(0.8)._2 && out(0.8)._2 >= out(0.9)._2)
    // the deployed tau = 0.8 row reads identically off the pair query
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs08 = pairs.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong
    assert(out(0.8) == ((pairs.length.toLong, docs08)),
      s"sweep=${out(0.8)} pairs=${pairs.length}/$docs08")
  }

  test("banding sweep's 16x4 row equals the candidate audit's minhash row") {
    val sweep = DedupQueries.queries("dedup_banding_sweep")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(sweep.keySet == Set((8, 8), (16, 4), (32, 2)))
    val audit = DedupQueries.queries("dedup_candidate_audit")(spark, sf0001)
      .collect().filter(_.getString(0) == "minhash_lsh")
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    // the deployed 16-band config must read identically off both audits
    assert(audit.length == 1 && sweep((16, 4)) == audit.head,
      s"sweep=${sweep((16, 4))} audit=${audit.head}")
    // verified never exceeds candidates, recall/efficiency in [0,1]
    sweep.values.foreach { case (c, v, r, e) =>
      assert(v <= c && r >= 0 && r <= 1 && e >= 0 && e <= 1)
    }
  }

  test("triangle census matches a driver-side brute-force replay") {
    val pairs = DedupQueries.queries("dedup_ngram_jaccard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rep = DedupQueries.queries("dedup_survivors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byComp = rep.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    val expected = byComp.map { case (r, nodes) =>
      val edges = pairs.count { case (a, b) => rep(a) == r }
      val wedges = nodes.toSeq.map { v =>
        val d = adj(v).size.toLong; d * (d - 1) / 2
      }.sum
      val triangles = pairs.collect {
        case (a, b) if rep(a) == r => (adj(a) & adj(b)).size.toLong
      }.sum / 3 // each triangle counted once per edge
      val clustering =
        if (wedges > 0) BigDecimal(3.0 * triangles / wedges)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0
      r -> ((nodes.size.toLong, edges.toLong, wedges, triangles, clustering))
    }
    val out = DedupQueries.queries("dedup_graph_triangles")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out == expected && out.nonEmpty, s"out=$out expected=$expected")
  }

  test("component-size histogram is consistent with the survivor labels") {
    val labels = DedupQueries.queries("dedup_survivors")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = labels.groupBy(_._2).map(_._2.length.toLong)
    val expected = sizes.groupBy(identity)
      .map { case (s, o) => (s, o.size.toLong, (s - 1L) * o.size.toLong) }.toSet
    val out = DedupQueries.queries("dedup_component_stats")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expected && out.nonEmpty, s"out=$out expected=$expected")
  }

  // --- winnowing fingerprints (Schleimer et al. 2003) ---

  /** Driver-side reimplementation of the winnow selection: positional
    * k-gram polyhash, per-window rightmost-min. */
  private def winnowRef(toks: Array[String], k: Int, w: Int): Set[(Long, Long)] = {
    def ph(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31L + cp) % 2147483647L)
      h
    }
    if (toks.length < k) return Set.empty
    val hs = toks.sliding(k).map(g => ph(g.mkString(" "))).toArray
    val m = hs.length
    (1 to math.max(m - w + 1, 1)).map { i =>
      val hi = math.min(i + w - 1, m)
      var bj = i; var bv = hs(i - 1)
      (i to hi).foreach { j =>
        if (hs(j - 1) <= bv) { bj = j; bv = hs(j - 1) } // <= ⇒ rightmost min
      }
      (bj.toLong, bv)
    }.toSet
  }

  test("winnowing: operator == driver-side rightmost-min reimplementation") {
    val docsDf = Tables.load(spark, sf0001, "documents")
    val expected = docsDf.select($"doc_id", $"text").collect().flatMap { r =>
      winnowRef(r.getString(1).split(" "), 5, 4)
        .map { case (p, f) => (r.getLong(0), p, f) }
    }.toSet
    val out = graft.queries.TextQueries.queries("text_winnow_fingerprint")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == expected && out.nonEmpty)
  }

  test("winnowing guarantee: any shared ≥ w+k−1 = 8-token run shares a fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 tokens
    val d = Seq(
      (1L, s"one two three $shared nine ten"),
      (2L, s"completely different preamble here $shared and another tail"))
      .toDF("doc_id", "text")
    val sel = graft.queries.TextQueries.winnowSelected(d, 5, 4)
    val byDoc = sel.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "winnow must select a common fingerprint inside the shared run")
  }

  test("winnowing density: selection compresses the gram index, covers every window") {
    val docsDf = Tables.load(spark, sf0001, "documents")
    docsDf.select($"doc_id", $"text").collect().take(20).foreach { r =>
      val toks = r.getString(1).split(" ")
      if (toks.length >= 8) {
        val m = toks.length - 4
        val sel = winnowRef(toks, 5, 4)
        assert(sel.size <= math.max(m - 3, 1), "at most one selection per window")
        assert(sel.size >= (m + 3) / 4, "each selection covers at most w windows")
        // every window of 4 consecutive grams contains a selected position
        val pos = sel.map(_._1.toInt)
        (1 to math.max(m - 3, 1)).foreach { i =>
          assert((i to math.min(i + 3, m)).exists(pos.contains),
            s"window $i of doc ${r.getLong(0)} has no selected fingerprint")
        }
      }
    }
  }

  test("dedup_winnow finds the planted near-duplicates lsh finds") {
    val winnow = DedupQueries.queries("dedup_winnow")(spark, sf0001)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.queries("dedup_minhash_lsh")(spark, sf0001)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // τ=0.8 near-dups share long verbatim runs ⇒ many shared fingerprints
    assert(lsh.subsetOf(winnow),
      s"missing=${lsh -- winnow} — winnow candidates must cover the verified near-dups")
    assert(winnow.nonEmpty)
  }

  // --- content-defined chunking ---

  test("cdc chunks exactly partition every document's token range") {
    import graft.queries.PipelineQueries
    val docsDf = Tables.load(spark, sf0001, "documents")
    val chunks = PipelineQueries.cdcChunks(docsDf)
      .collect().groupBy(_.getLong(0))
    docsDf.select($"doc_id", $"text").collect().foreach { r =>
      val n = r.getString(1).split(" ").length
      val cs = chunks(r.getLong(0)).sortBy(_.getLong(1))
      assert(cs.head.getLong(2) == 1L, "first chunk starts at token 1")
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) == a.getLong(2) + a.getLong(3),
            "chunks are consecutive: start[j+1] = start[j] + n_tokens[j]")
        case _ =>
      }
      assert(cs.map(_.getLong(3)).sum == n.toLong,
        s"chunk token mass must equal doc ${r.getLong(0)}'s $n tokens")
    }
  }

  test("cdc is shift-robust where fixed-stride chunking is not") {
    import graft.queries.PipelineQueries
    val base = (1 to 200).map(i => s"tok${i % 57}w${(i * 31) % 43}").mkString(" ")
    val edited = "INSERTED " + base // one token prepended: everything shifts
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val ch = PipelineQueries.cdcChunks(d).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(4)).toSet }
    val sharedCdc = ch(1L).intersect(ch(2L)).size
    // every boundary is content-determined, so all chunks strictly after
    // the edited first chunk carry identical text → identical hashes
    assert(sharedCdc >= ch(1L).size - 1,
      s"cdc shares $sharedCdc of ${ch(1L).size} chunks — boundaries must re-align after the edit")
    // a fixed 128/96 grid on the same pair shifts every window by one
    // token, so no window text (hence no fingerprint) survives the edit
    def fixedWindows(text: String): Set[String] = {
      val toks = text.split(" ")
      val nChunks = if (toks.length <= 128) 1 else 1 + (toks.length - 33) / 96
      (0 until nChunks).map(c => toks.slice(c * 96, c * 96 + 128).mkString(" ")).toSet
    }
    val sharedFixed = fixedWindows(base).intersect(fixedWindows(edited)).size
    assert(sharedFixed == 0 && sharedCdc > 0,
      s"fixed-stride shares $sharedFixed windows, cdc shares $sharedCdc chunks")
  }

  test("dedup_cdc_storage: ratio in (0,1], planted duplicates compress") {
    val r = DedupQueries.queries("dedup_cdc_storage")(spark, sf0001).collect().head
    val (nc, nd, tt, ts, ratio) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nd <= nc && ts <= tt && ratio > 0.0 && ratio <= 1.0)
    assert(ratio < 1.0, "planted duplicate docs must produce shared chunks")
  }

  test("prefix truncation: planted strict prefixes found, floor and cap enforced") {
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    val long = ("alpha beta gamma delta epsilon " * 6).trim // 185 chars
    val cut = long.substring(0, 80)                         // strict prefix, ≥ 32
    val tiny = long.substring(0, 20)                        // below the 32-char floor
    val other = "completely different content that shares no prefix with anything here"
    val d = Seq(doc(1, long), doc(2, cut), doc(3, tiny), doc(4, other))
      .toDF("doc_id", "text", "n_chars")
    val got = DedupQueries.prefixTruncationPairs(d)
      .select("short_id", "long_id").as[(Long, Long)].collect().toSet
    // (2,1) found; the sub-floor doc 3 is out by contract; no false pairs
    assert(got == Set((2L, 1L)), got.toString)
    // cap rail: 3 same-prefix docs, cap = 2 keeps only the 2 smallest as
    // pairable members → exactly the (short, mid) pair survives
    val hot = Seq(doc(10, cut), doc(11, cut + " tail"), doc(12, long))
      .toDF("doc_id", "text", "n_chars")
    val capped = DedupQueries.prefixTruncationPairs(hot, cap = 2)
      .select("short_id", "long_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((10L, 11L)), capped.toString)
    // doc 11 diverges from 12 after the shared cut (" tail" vs the
    // continuation), so only doc 10 is a strict prefix of both
    val uncapped = DedupQueries.prefixTruncationPairs(hot)
      .select("short_id", "long_id").as[(Long, Long)].collect().toSet
    assert(uncapped == Set((10L, 11L), (10L, 12L)), uncapped.toString)
  }

  test("SNM candidates: O(n·w) bound, head/tail passes cover single-ended edits") {
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    // cluster A: same head, perturbed tails; cluster B: same tail,
    // perturbed heads; one doc edited at BOTH ends (the documented miss)
    val d = Seq(
      doc(1, "shared head one two three four alpha"),
      doc(2, "shared head one two three four beta"),
      doc(3, "gamma one two three four shared tail"),
      doc(4, "delta one two three four shared tail"),
      doc(5, "edited start one two three four edited end"),
      doc(6, "unrelated words entirely disjoint from all others")
    ).toDF("doc_id", "text", "n_chars")
    val cands = DedupQueries.snmCandidates(d)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), s"head pass must pair the head cluster: $cands")
    assert(cands.contains((3L, 4L)), s"tail pass must pair the tail cluster: $cands")
    assert(!cands.exists(p => p._1 == 5L || p._2 == 5L),
      s"double-ended edit shares neither key — by construction out: $cands")
    // volume bound: each doc pairs with ≤ w−1 successors per pass
    val n = 6; val w = graft.queries.DedupQueries.SnmWindow
    assert(cands.size <= 2 * n * (w - 1))
    // sharper custom key (the documented hot-key mitigation): a
    // universal-opening corpus subdivides by a composed length bucket,
    // so every candidate pair stays within one 16-char band
    val boiler = (1 to 40).map(i =>
        doc(100L + i, "same opening words " + Seq.fill(i)("x").mkString(" ")))
      .toDF("doc_id", "text", "n_chars")
    val sharp = DedupQueries.snmCandidates(boiler, keys = Seq(
        "headlen" -> concat_ws("#",
          concat_ws(" ", slice(col("toks"), 1, 2)),
          floor(col("n_chars") / 16L).cast("string"))))
      .as[(Long, Long)].collect().toSet
    assert(sharp.nonEmpty)
    val lenOf = (1 to 40).map(i => 100L + i ->
      ("same opening words " + Seq.fill(i)("x").mkString(" ")).length.toLong).toMap
    assert(sharp.forall { case (a, b) => lenOf(a) / 16 == lenOf(b) / 16 },
      "composed key must confine pairs to one length band")
  }

  test("global-order SNM catches near-dups straddling adjacent distinct keys; block form misses them") {
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    val mid = (1 to 26).map(i => f"w$i%02d").mkString(" ")
    // a near-dup pair (3-gram jaccard 25/31 ≈ 0.806) perturbed in BOTH
    // sort keys: head "aaa bbb" vs "aaa bbc", tail "yya zzz" vs
    // "yyb zzz" — every (pass, skey) block is a singleton, so the
    // equal-key form cannot compare them; in the GLOBAL sort order the
    // two keys are lexicographic neighbors, so the sliding window does
    val d = Seq(
      doc(1, s"aaa bbb $mid zzz yya"),
      doc(2, s"aaa bbc $mid zzz yyb"),
      doc(3, "mmm nnn entirely different words here ooo ppp"),
      doc(4, "qqq rrr other unrelated content again sss ttt")
    ).toDF("doc_id", "text", "n_chars")
    val block = DedupQueries.snmCandidates(d).as[(Long, Long)].collect().toSet
    val global = DedupQueries.snmGlobalCandidates(d).as[(Long, Long)].collect().toSet
    assert(!block.contains((1L, 2L)),
      s"equal-key form should miss the straddling pair by construction: $block")
    assert(global.contains((1L, 2L)),
      s"global-order window must catch the straddling pair: $global")
    // the documented jac of the pair really is over the τ=0.8 bar
    def grams3(t: String) =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (ga, gb) = (grams3(s"aaa bbb $mid zzz yya"), grams3(s"aaa bbc $mid zzz yyb"))
    val jac = (ga & gb).size.toDouble / (ga | gb).size.toDouble
    assert(jac >= 0.8, s"fixture must be a genuine near-dup: jac=$jac")
    // volume bound holds for the global form too: ≤ w−1 successors per
    // row per pass
    val w = DedupQueries.SnmWindow
    assert(global.size <= 2 * 4 * (w - 1))
  }

  test("global-order SNM equals the block form when every neighborhood shares one key") {
    def doc(id: Long, text: String) = (id, text, text.length.toLong)
    // one shared head key and one shared tail key per cluster, corpus
    // small enough that each block IS the whole neighborhood — the two
    // forms must then emit identical verified-candidate sets
    val d = Seq(
      doc(1, "shared head one two three four alpha"),
      doc(2, "shared head one two three four beta"),
      doc(3, "gamma one two three four shared tail"),
      doc(4, "delta one two three four shared tail")
    ).toDF("doc_id", "text", "n_chars")
    val block = DedupQueries.snmCandidates(d).as[(Long, Long)].collect().toSet
    val global = DedupQueries.snmGlobalCandidates(d).as[(Long, Long)].collect().toSet
    assert(block.subsetOf(global), s"global order can only ADD boundary pairs: " +
      s"block=$block global=$global")
    assert(block.contains((1L, 2L)) && block.contains((3L, 4L)))
  }

  test("ExactSubstr: maximal duplicated spans found exactly, within-doc repeats included") {
    def toksOf(n: Int, tag: String) = (1 to n).map(i => s"$tag$i")
    // docs 1 and 2 share tokens 5..20 of doc 1 (a 16-token span, docs
    // otherwise disjoint); doc 3 repeats its own 8-token phrase twice;
    // doc 4 is all-unique filler
    val shared = toksOf(16, "s")
    val d1 = (toksOf(4, "a") ++ shared ++ toksOf(10, "b")).mkString(" ")
    val d2 = (shared ++ toksOf(12, "c")).mkString(" ")
    val phrase = toksOf(8, "p")
    val d3 = (phrase ++ toksOf(5, "d") ++ phrase).mkString(" ")
    val d4 = toksOf(30, "z").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    // run the registered plan body against the fixture via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("graft_exsub").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.queries("dedup_exact_substring")(spark, dir)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: shared span is tokens 5..20 → duplicated 8-gram offsets
    // 5..13 → island [5, 21); doc 2: offsets 1..9 → [1, 17)
    assert(got.contains((1L, 5L, 21L, 16L)), got.toString)
    assert(got.contains((2L, 1L, 17L, 16L)), got.toString)
    // doc 3: the phrase duplicates WITHIN the doc — both occurrences
    // surface ([1, 9) and [14, 22))
    assert(got.contains((3L, 1L, 9L, 8L)), got.toString)
    assert(got.contains((3L, 14L, 22L, 8L)), got.toString)
    // doc 4 has no duplicated 8-gram anywhere
    assert(!got.exists(_._1 == 4L), got.toString)
    assert(got.size == 4, got.toString)
  }

  test("SNM-edge survivors equal exact-edge survivors on the harness corpus") {
    // holds because SNM recall is 1.0 here (the audit test pins that);
    // on a corpus where SNM missed pairs the two would diverge — which
    // is exactly the signal the per-edge-source survivor queries exist
    // to expose
    def rows(q: String) = DedupQueries.queries(q)(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows("dedup_survivors_snm") == rows("dedup_survivors"))
  }

  test("BM25: rare-term docs outrank common-term docs; tf saturates; length penalized") {
    def doc(id: Long, text: String) = (id, text)
    val filler = (1 to 20).map(i => doc(100 + i, "alpha beta gamma delta"))
    val d = (Seq(
      doc(1, "rareterm alpha beta gamma"),          // 1× rare term
      doc(2, "rareterm rareterm alpha beta"),       // 2× rare term
      doc(3, "common alpha beta gamma"),            // 1× common term
      doc(4, "common " * 19 + "common"),            // 20× common term (saturation)
      doc(5, "rareterm " + "alpha " * 39 + "beta")  // 1× rare in a LONG doc
    ) ++ filler).toDF("doc_id", "text")
    // make 'common' genuinely common: it appears in the filler too
    val d2 = d.union(Seq(doc(200, "common words here"), doc(201, "common again")).toDF("doc_id", "text"))
    val scores = graft.queries.TextQueries
      .bm25TopK(d2, Seq("rareterm", "common"), 50)
      .as[(Long, Long)].collect().toMap
    // rare beats common at equal tf and comparable length
    assert(scores(1L) > scores(3L), scores.toString)
    // more tf scores higher, but saturation keeps 20× common below 1× rare
    assert(scores(2L) > scores(1L), scores.toString)
    assert(scores(4L) > scores(3L), scores.toString)
    assert(scores(4L) < scores(2L), scores.toString)
    // the same rare tf in a much longer doc scores lower (length norm)
    assert(scores(5L) < scores(1L), scores.toString)
  }
}
