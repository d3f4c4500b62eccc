package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale a driver testdata dir by an integer factor for
  * larger-scale bench runs (`runMain graft.tools.MakeScaled <baseDir>
  * <outDir> <factor>`), e.g. sf0.1 × 10 → an sf1-equivalent corpus.
  *
  * The driver's tables stop at sf0.1; every scale claim beyond that
  * would otherwise be extrapolation. Scaling is COPY-SHIFTED so the
  * workload's asymptotics — not just its row count — survive the blow
  * up: copy 0 is the base data byte-for-byte, and each further copy is
  * key-shifted so referential integrity holds, and SIMILARITY-DISJOINT
  * so the near-duplicate structure scales linearly instead of every
  * document gaining factor−1 planted twins (which would inflate pair
  * outputs quadratically by construction and measure the generator,
  * not the engine):
  *
  *  - `documents`: doc_id shifts; each copy c > 0 prefixes every TOKEN
  *    with `c<c>` — within-copy shingle sets (and so every dedup
  *    family's candidate/pair structure) are isomorphic to the base,
  *    while cross-copy token sets are disjoint (Jaccard 0, no
  *    cross-copy candidates); n_chars is recomputed;
  *  - `embeddings`: vec_id shifts; each copy's vectors are cyclically
  *    DIMENSION-ROTATED by 7·c (mod 64) — rotation is orthogonal, so
  *    within-copy cosines are preserved (up to last-ulp fold order —
  *    the product SET is identical), while cross-copy cosines fall
  *    back to the unrelated-pair distribution;
  *  - `events`: event_id/user_id shift — 10× users over the same time
  *    range (windows carry 10× rows, the realistic scale direction);
  *  - relational tables: all foreign keys shift by the same per-table
  *    stride (max key + 1), so every join finds exactly its copy's
  *    matches; region/nation stay single (dimension tables don't
  *    scale).
  */
object MakeScaled {

  private def shifted(df: DataFrame, keyCols: Map[String, Long], copy: Int): DataFrame =
    keyCols.foldLeft(df) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + lit(stride * copy))
    }

  /** max(key)+1 per key column — the per-copy shift stride. */
  private def strides(df: DataFrame, keyCols: Seq[String]): Map[String, Long] =
    if (keyCols.isEmpty) Map.empty
    else {
      val r = df.agg(max(col(keyCols.head)), keyCols.tail.map(c => max(col(c))): _*).head()
      keyCols.zipWithIndex.map { case (c, i) => c -> (r.getLong(i) + 1L) }.toMap
    }

  def scaleTable(name: String, df: DataFrame, factor: Int): DataFrame = {
    val keyCols: Seq[String] = name match {
      case "documents" => Seq("doc_id")
      case "embeddings" => Seq("vec_id")
      case "events" => Seq("event_id", "user_id")
      case "orders" => Seq("o_orderkey", "o_custkey")
      case "lineitem" => Seq("l_orderkey", "l_partkey", "l_suppkey")
      case "customer" => Seq("c_custkey")
      case "supplier" => Seq("s_suppkey")
      case "part" => Seq("p_partkey")
      case _ => Seq.empty // region/nation: dimensions, single copy
    }
    if (keyCols.isEmpty) df
    else {
      val st = strides(df, keyCols)
      (0 until factor).map { c =>
        val base = shifted(df, st, c)
        name match {
          case "documents" if c > 0 =>
            // token prefix: within-copy shingle structure isomorphic,
            // cross-copy token sets disjoint
            base
              .withColumn("text",
                concat_ws(" ", transform(split(col("text"), " "),
                  t => concat(lit(s"c$c"), t))))
              .withColumn("n_chars", length(col("text")).cast("long"))
          case "embeddings" if c > 0 =>
            // orthogonal per-copy rotation: within-copy cosines exact,
            // cross-copy cosines decorrelated
            val k = (7 * c) % 64
            base.withColumn("embedding",
              concat(slice(col("embedding"), k + 1, 64 - k),
                slice(col("embedding"), 1, k)))
          case _ => base
        }
      }.reduce(_ unionByName _)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.model.Tables.nanosConf, "true")
      .config(graft.model.Tables.ntzConf, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = graft.model.Tables.load(spark, baseDir, t)
      scaleTable(t, df, factor)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      System.err.println(s"[make-scaled] $t done")
    }
    spark.stop()
  }
}
