package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Stage-attribution probe for `dedup_containment` (the sf10 tail's
  * standing top line: 54.3 s warm, 21.8× its sf0.1 floor — round-15
  * verdict item 3). Times each stage of the current plan and the
  * candidate variants, so the next plan change is chosen by
  * measurement instead of conjecture:
  *
  *   ranked      full inverted index build (explode + df join + per-doc
  *               rank window) — the only global sort in the query
  *   cand_pos    candidate rows surviving the positional bound (pre-distinct)
  *   cand_raw    raw join emit volume (no positional bound)
  *   distinct    candidate pairs after distinct
  *   full        the production query end-to-end
  *   nopb        variant: B side unranked (no window anywhere beyond the
  *               memoizable A prefix) — trades positional pruning for
  *               skipping the global sort
  *
  * `sbt "runMain graft.queries.ContainmentProbe [sfDir] [stages]"`
  */
object ContainmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val stages = if (args.length > 1) args(1).split(",").toSet
      else Set("ranked", "cand_pos", "cand_raw", "distinct", "full", "nopb")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf, "true")
      .config(Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sh = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        graft.functions.KernelExpressions.sortedNgramSet(col("toks"), 3).as("g"))
      .persist()
    sh.count() // pay the shingle pass outside every timed stage

    def timed(name: String)(mk: => DataFrame): Unit = if (stages(name)) {
      var best = Double.MaxValue; var n = -1L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        n = mk.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"""{"stage":"$name","sec":$best%.3f,"rows":$n}""")
    }

    def ex = sh.filter(size(col("g")) > 0)
      .select(col("doc_id"), size(col("g")).as("n"), explode(col("g")).as("sgl"))
    def freq = ex.groupBy("sgl").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sgl"))
    def ranked = ex.join(freq, "sgl").withColumn("rk", row_number().over(w))
    def aPrefix(r: DataFrame) = r
      .filter(col("rk") <= col("n") - floor((col("n") * 9 + 9) / 10) + 1)
      .select(col("sgl"), col("doc_id").as("doc_a"), col("n").as("na"), col("rk").as("pa"))
    def bFull(r: DataFrame) = r
      .select(col("sgl"), col("doc_id").as("doc_b"), col("n").as("nb"), col("rk").as("pb"))
    def joined(r: DataFrame) = aPrefix(r).join(bFull(r), Seq("sgl"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("nb") * 10 >= col("na") * 9)
    def candPos(r: DataFrame) = joined(r)
      .filter((lit(1) + least(col("na") - col("pa"), col("nb") - col("pb"))) * 10 >=
        col("na") * 9)
    def verify(cand: DataFrame) = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("g").as("ga")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("g").as("gb")), "doc_b")
      .withColumn("inter",
        graft.functions.KernelExpressions.sortedIntersectCount(col("ga"), col("gb")).cast("long"))
      .filter(col("inter") * 10 >= size(col("ga")).cast("long") * 9)

    timed("ranked")(ranked)
    timed("cand_raw")(joined(ranked))
    timed("cand_pos")(candPos(ranked))
    timed("distinct")(candPos(ranked).select("doc_a", "doc_b").distinct())
    timed("full")(verify(candPos(ranked).select("doc_a", "doc_b").distinct()))

    // variant: A prefix from the memoized τ=0.7 index (a pure rk
    // filter), B side a plain explode — no df join, no rank window, no
    // positional bound
    if (stages("nopb")) {
      val pre = DedupQueries.ppjoinPrefix(sh, 9, 10)
      val a = pre.select(col("s").as("sgl"), col("doc_id").as("doc_a"), col("n").as("na"))
      val b = ex.select(col("sgl"), col("doc_id").as("doc_b"), col("n").as("nb"))
      val cand = a.join(b, Seq("sgl"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("nb") * 10 >= col("na") * 9)
        .select("doc_a", "doc_b").distinct()
      timed("nopb")(verify(cand))
    }

    // variant: MEETING-COUNT filter over the τ=0.7 prefix (the memoized
    // corpus index) — count m = |prefix07(A) ∩ B| per pair; cont ≥ 0.9
    // forces m ≥ ⌈0.9na⌉ − ⌈0.7na⌉ + 1 ≈ 0.2na because A has only
    // na − prefixLen elements OUTSIDE the indexed prefix. Lossless, and
    // far tighter than the single-row positional bound (which prunes
    // ~10%); B side needs no df join and no rank window.
    if (stages("cnt")) {
      val pre07 = DedupQueries.ppjoinPrefix(sh, 7, 10)
      val a = pre07.select(col("s").as("sgl"), col("doc_id").as("doc_a"), col("n").as("na"))
      val b = ex.select(col("sgl"), col("doc_id").as("doc_b"), col("n").as("nb"))
      def raw = a.join(b, Seq("sgl"))
        .filter(col("doc_a") =!= col("doc_b"))
        .filter(col("nb") * 10 >= col("na") * 9)
      timed("cnt_raw")(raw)
      def mMin = floor((col("na") * 9 + 9) / 10) - floor((col("na") * 7 + 9) / 10) + 1
      def cand = raw.groupBy(col("doc_a"), col("doc_b"), col("na"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= mMin)
        .select("doc_a", "doc_b")
      timed("cnt_cand")(cand)
      timed("cnt_full")(verify(cand))
    }
    spark.stop()
  }
}
