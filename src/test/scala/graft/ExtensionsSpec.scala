package graft

/** The SQL function surface must compute EXACTLY what the DataFrame
  * kernels compute — each registered function is checked against its
  * Column-API twin on real data, and the literal-parameter contract is
  * enforced at plan time, not per row.
  */
class ExtensionsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_dot equals the DataFrame kernel on the embeddings table") {
    val v = graft.model.Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    v.createOrReplaceTempView("ext_vs")
    val sql = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS d FROM ext_vs").as[(Long, Double)].collect().toMap
    val api = v.select($"vec_id",
        graft.functions.KernelExpressions.dot($"v", $"v").as("d"))
      .as[(Long, Double)].collect().toMap
    assert(sql == api)
    assert(sql.nonEmpty)
  }

  test("graft_ngram_set + graft_intersect_count reproduce the Jaccard kernel path") {
    Seq((1L, "a b c d e"), (2L, "a b c d x")).toDF("id", "text")
      .createOrReplaceTempView("ext_docs")
    val r = spark.sql(
      """SELECT graft_intersect_count(
        |         graft_ngram_set(split(a.text, ' '), 3),
        |         graft_ngram_set(split(b.text, ' '), 3)) AS inter
        |FROM ext_docs a JOIN ext_docs b ON a.id = 1 AND b.id = 2""".stripMargin)
      .as[Long].head()
    // trigrams of 5 tokens: 3 each; 'a b c'/'b c d' shared, tails differ
    assert(r == 2L)
  }

  test("graft_simhash and graft_minhash agree with the library columns") {
    val docs = graft.model.Tables.load(spark, sf0001, "documents").limit(50)
    docs.createOrReplaceTempView("ext_sim_docs")
    val sqlSim = spark.sql(
      """SELECT doc_id, graft_simhash(transform(split(text, ' '),
        |  t -> aggregate(split(t, ''), 0L, (a, c) -> (a * 31 + ascii(c)) % 2147483647))) AS sh
        |FROM ext_sim_docs""".stripMargin).as[(Long, Long)].collect().toMap
    val apiSim = docs.select($"doc_id",
        graft.functions.TextFunctions.simhash31($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sqlSim == apiSim)

    val sqlMin = spark.sql(
      """SELECT doc_id, graft_minhash(
        |  graft_polyhash(graft_ngram_set(split(text, ' '), 3)), 64) AS sig
        |FROM ext_sim_docs""".stripMargin).as[(Long, Seq[Long])].collect().toMap
    val apiMin = docs.select($"doc_id",
        graft.functions.TextFunctions.minhashSignature(
          graft.functions.KernelExpressions.sortedNgramSet(
            split($"text", " "), 3), perms = 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sqlMin == apiMin)
  }

  test("parameter arguments must be literals — rejected at plan time") {
    Seq((1L, "a b c")).toDF("id", "text").createOrReplaceTempView("ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ngram_set(split(text, ' '), id) FROM ext_bad").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("the extensions entry point injects every builder without error, names unique") {
    // a second SparkContext can't exist in this JVM, so the
    // spark.sql.extensions config path can't be end-to-end tested here;
    // exercise the injection call itself plus the builder contracts
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    val names = GraftFunctions.all.map(_._1)
    assert(names.distinct.size == names.size)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dot = GraftFunctions.all.find(_._1 == "graft_dot").get._3
    assert(dot(Seq(Literal(1), Literal(2)))
      .isInstanceOf[graft.functions.KernelExpressions.DotProduct])
    val sql = spark.sql("SELECT graft_dot(array(1d, 2d), array(3d, 4d)) AS d")
      .collect().head.getDouble(0)
    assert(sql == 11.0)
  }

  test("LevenshteinBandRule: sound length-band conjunct, idempotent, results unchanged") {
    import graft.plans.LevenshteinBandRule
    // parquet-backed (a literal Seq would fold into a LocalRelation
    // before the rule could be observed); lengths and distances vary
    val df = graft.model.Tables.load(spark, sf0001, "part")
      .select($"p_name".as("x"),
        concat(substring($"p_name", 1, 3), lit("qq")).as("y"))
    def q = df.filter(levenshtein($"x", $"y") <= 1).select("x", "y")
    val without = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ LevenshteinBandRule
    try {
      val opt = q.queryExecution.optimizedPlan.toString
      // the band landed…
      assert(opt.contains("abs(") && opt.contains("length("), opt)
      // …exactly once (the semanticEquals guard makes the rule a
      // fixed point — the optimizer loop can't stack bands)
      assert(opt.split("abs\\(").length - 1 == 1, opt)
      // …and never changes results (soundness on a length-diverse set)
      val withRule = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(withRule == without)
      // the thresholded form returns −1 above its threshold, so it
      // must NOT be banded (≤ would select far-apart pairs the band
      // would then wrongly drop)
      val thr = df.filter(levenshtein($"x", $"y", 1) <= 1)
      assert(!thr.queryExecution.optimizedPlan.toString.contains("abs("),
        thr.queryExecution.optimizedPlan.toString)
      // -1-returning rows really are selected by ≤ and survive
      assert(thr.count() == df.count())
    } finally spark.experimental.extraOptimizations = saved
  }
}
