package graft

import org.apache.spark.sql.functions._

import graft.functions.KernelExpressions
import graft.functions.TextFunctions._
import graft.model.Tables

/** Pins the codegen'd [[KernelExpressions.PolyHashArray]] kernel to the
  * `aggregate`-built [[polyHash31]] fold it replaces — the MinHash base
  * hash rides on this equality, and the DuckDB candidate-audit oracle
  * rides on polyHash31's already-proven cross-engine parity (simhash
  * family). Any drift between the three would silently change LSH
  * candidate sets.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private def kernelVsAggregate(df: org.apache.spark.sql.DataFrame): Long =
    df.select(
        KernelExpressions.polyHashArray($"g").as("k"),
        transform($"g", s => polyHash31(s)).as("a"))
      .filter(not($"k" <=> $"a"))
      .count()

  test("PolyHashArray == polyHash31 on synthetic strings incl. unicode") {
    val rows = Seq(
      Seq("a", "ab", "abc", "a b c", "", " ", "zz zz zz"),
      Seq("日本語 テスト 行", "café au lait", "ключ слово тест"),
      Seq("mixed 日本 ascii", "1 2 3", "!@# $%^ &*(")
    ).toDF("g")
    assert(kernelVsAggregate(rows) == 0)
  }

  test("PolyHashArray == polyHash31 on the harness corpus trigrams") {
    val sh = Tables.load(spark, sf0001, "documents")
      .select(KernelExpressions.sortedNgramSet(tokens($"text"), 3).as("g"))
    assert(kernelVsAggregate(sh) == 0)
  }

  test("graft_polyhash tolerates null elements (null→null) and rejects non-string arrays") {
    // SQL-facing inputs are not null-free like the internal split()
    // arrays: a null element must hash to a null element, not NPE
    graft.GraftFunctions.register(spark)
    val out = spark.sql("SELECT graft_polyhash(array('ab', NULL, '')) AS h")
      .as[Seq[Option[Long]]].collect().head
    assert(out.length == 3)
    assert(out(0).contains(('a'.toLong * 31 + 'b'.toLong) % 2147483647L))
    assert(out(1).isEmpty)
    assert(out(2).contains(0L))
    // and both engines' null-free fast path is unaffected
    assert(spark.sql("SELECT graft_polyhash(split('x y', ' ')) AS h").count() == 1)
    val err = intercept[Exception](
      spark.sql("SELECT graft_polyhash(array(1, 2))").collect())
    assert(err.getMessage.contains("array<string>"))
  }

  test("compositional gram hash == joined-string hash, incl. empty tokens") {
    // the identity poly31(t₁‖" "‖t₂‖…) = fold of (H·q_t + a_t) must hold
    // for EMPTY tokens too (consecutive/leading/trailing spaces in
    // arbitrary caller frames): split("","") yields [""], so without the
    // empty-token guard a_t would be 992 (≠ 32 = poly31(" ")) and q_t
    // 961 (≠ 31), silently diverging from the joined-string form the
    // oracle hashes
    val rows = Seq(
      Seq("a", "", "b"), Seq("", ""), Seq("x", "", "", "y"),
      Seq("hello", "world"), Seq("", "z"), Seq("café", "", "日本")
    ).toDF("toks")
    val bad = rows.select(
        aggregate(
          slice($"toks", lit(2), size($"toks") - 1),
          polyHash31(element_at($"toks", 1)),
          (h, t) => (h * polyShift31Spaced(t) + polyHash31Spaced(t)) % lit(2147483647L))
          .as("composed"),
        polyHash31(array_join($"toks", " ")).as("joined"))
      .filter(not($"composed" <=> $"joined"))
      .count()
    assert(bad == 0)
  }

  test("minhash signature values stay in [0, p) with p sentinel on empty") {
    val sig = Seq(Seq("a b c", "b c d"), Seq.empty[String])
      .toDF("g")
      .select(minhashSignature($"g", 64).as("sig"))
      .as[Seq[Long]].collect()
    assert(sig(0).forall(v => v >= 0L && v < 2147483647L))
    assert(sig(1).forall(_ == 2147483647L))
  }
}
