package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.model.Tables

/** The end-to-end corpus-cleaning pipeline — the job a training-data
  * engine exists to run — composed from the individual operators and
  * oracled as ONE query, so the stage composition itself is
  * correctness-gated, not just each stage in isolation.
  *
  * A document survives iff it passes every stage:
  *
  *  1. exact dedup: it is the minimum doc_id of its content digest;
  *  2. near-dup dedup: it is not a non-representative member of a
  *     connected component of n-gram-Jaccard (τ = 0.8) pairs
  *     (component representative = min doc_id, the dedup_survivors
  *     policy);
  *  3. quality: ≥ 10 whitespace tokens and heuristic language ID 'en';
  *  4. decontamination: not from the held-out source (src0) and
  *     sharing no verbatim 8-token span with it.
  *
  * Every stage reuses the already-cached shared frames (shingle index,
  * verified pair frame), so the composed pipeline costs little more
  * than its most expensive stage. Output: kept (doc_id, n_tokens).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean_corpus" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val exactKeepers = d
        .groupBy(md5(col("text").cast("binary")).as("dg"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val nearDupMembers = DedupQueries.componentLabels(s, dir)
        .filter(col("rep") < col("node")) // non-representative members
        .select(col("node").as("doc_id"))
      val contaminated = TextQueries.contaminatedDocs(s, dir).select("doc_id")
      d.join(exactKeepers, Seq("doc_id"), "left_semi")
        .join(nearDupMembers, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
        .filter(col("n_tokens") >= 10)
        .filter(langId(col("text")) === "en")
        .filter(col("source") =!= "src0")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "n_tokens")
    }),

    // deterministic train/val/test split — the step between cleaning
    // and training. Assignment hashes the STABLE document id (the
    // rolling polynomial hash shared with text_fingerprint), never a
    // random() call: the split is reproducible across runs, engines,
    // and repartitions, and any engine can recompute membership from
    // the id alone. 80/10/10 by hash residue; output is the per-split
    // audit summary (pure map + one tiny map-side-combined aggregate —
    // at 100 TB the same expression feeds a partitionBy("split") write).
    "pipeline_hash_split" -> ((s, dir) => {
      val h = pmod(polyHash31(col("doc_id").cast("string")), lit(10L))
      Tables.load(s, dir, "documents")
        .select(
          when(h < 8, lit("train")).when(h === 8, lit("val"))
            .otherwise(lit("test")).as("split"),
          col("n_chars"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    })
  )

  val oracles: Map[String, String] = Map(
    // each CTE mirrors an already-validated single-stage oracle
    "pipeline_clean_corpus" ->
      s"""WITH RECURSIVE ek AS (
         |  SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)),
         |t AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
         |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) g
         |  FROM documents),
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM t a JOIN t b ON a.doc_id < b.doc_id
         |  WHERE len(a.g) > 0 AND len(b.g) > 0
         |    AND CAST(len(list_filter(a.g, x -> list_contains(b.g, x))) AS DOUBLE) /
         |        (CAST(len(a.g) + len(b.g) AS DOUBLE) - CAST(len(list_filter(a.g, x -> list_contains(b.g, x))) AS DOUBLE)) >= 0.8),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM p
         |      UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
         |members AS (
         |  SELECT src AS doc_id FROM reach GROUP BY src
         |  HAVING least(src, min(dst)) < src),
         |sp AS (
         |  SELECT doc_id, source, ${DedupQueries.spanListSql} spans FROM documents),
         |spu AS (SELECT doc_id, source, unnest(spans) AS span FROM sp),
         |ev AS (SELECT DISTINCT span FROM spu WHERE source = 'src0'),
         |contaminated AS (
         |  SELECT DISTINCT spu.doc_id FROM spu JOIN ev ON spu.span = ev.span
         |  WHERE spu.source <> 'src0'),
         |lang AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(text,' '), x -> x IN ('the','and','of','to','a','in','is','it'))) c_en,
         |    len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und','ist','nicht'))) c_de,
         |    len(list_filter(string_split(text,' '), x -> x IN ('el','la','los','las','y','es','que'))) c_es,
         |    len(list_filter(string_split(text,' '), x -> x IN ('le','les','et','est','un','une'))) c_fr
         |  FROM documents)
         |SELECT d.doc_id, CAST(len(string_split(d.text,' ')) AS BIGINT) AS n_tokens
         |FROM documents d
         |JOIN ek ON d.doc_id = ek.doc_id
         |JOIN lang l ON d.doc_id = l.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM members)
         |  AND len(string_split(d.text,' ')) >= 10
         |  AND l.c_en >= l.c_de AND l.c_en >= l.c_es AND l.c_en >= l.c_fr
         |  AND d.source <> 'src0'
         |  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)""".stripMargin,

    // same rolling polynomial hash as the text_fingerprint oracle,
    // applied to the decimal doc_id string
    "pipeline_hash_split" ->
      """WITH h AS (
        |  SELECT n_chars,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
        |             c -> CAST(ascii(c) AS BIGINT))),
        |           (h, c) -> (h * 31 + c) % 2147483647) % 10 AS b
        |  FROM documents)
        |SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM h GROUP BY 1""".stripMargin
  )
}
