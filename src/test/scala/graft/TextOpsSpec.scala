package graft

import graft.queries.TextQ

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the trained text operators that the oracle-gated queries don't
  * cover (the driver corpus's `lang` labels are only weakly correlated with
  * its word-soup text — the q22 marker heuristic itself scores ~0.30
  * accuracy there — so LID quality must be demonstrated where trigram
  * signal actually exists).
  */
class TextOpsSpec extends AnyFunSuite {

  import SparkFixture._

  /** Three constructed "languages" with disjoint-ish syllable inventories —
    * the shape real language ID exploits (character n-gram distributions
    * differ), deterministic via the seeded RNG.
    */
  private def corpus() = {
    val s = spark
    import s.implicits._
    val inventories = Map(
      "aa" -> Seq("kalo", "miret", "tanur", "dolen", "rakim", "lunet"),
      "bb" -> Seq("zhuqi", "xieweng", "qingshu", "weilan", "shuofeng", "liuxia"),
      "cc" -> Seq("bjorn", "svengrim", "thalvik", "grimdal", "vostheim", "skjold"))
    val rnd = new scala.util.Random(7)
    val rows = for {
      (lang, words) <- inventories.toSeq
      i <- 0 until 60
    } yield {
      val text = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
      (lang.hashCode.toLong * 1000 + i, lang, text)
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("LangId: trigram-lift profiles learn constructed languages near-perfectly") {
    val docs = corpus()
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val profiles = TextQ.LangId.train(train)
    // lift weighting: every language's profile exists and is bounded
    val perLang = profiles.groupBy("p_lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.keySet == Set("aa", "bb", "cc"))
    assert(perLang.values.forall(n => n > 0 && n <= 64))
    val pred = TextQ.LangId.predict(test, profiles)
    val n = test.count()
    val ok = pred.filter(col("pred_lang") === col("lang")).count()
    assert(ok.toDouble / n >= 0.95,
      s"trained LID should be near-perfect on disjoint inventories: $ok/$n")
  }

  test("LangId: docs with no profile trigram keep a null prediction (left join contract)") {
    val s = spark
    import s.implicits._
    val profiles = TextQ.LangId.train(corpus())
    val alien = Seq((1L, "???", "0101 0101 0101 0101 0101 0101")).toDF("doc_id", "lang", "text")
    val pred = TextQ.LangId.predict(alien, profiles).collect().head
    assert(pred.isNullAt(pred.fieldIndex("pred_lang")))
  }

  test("LangId edge cases: empty training corpus, short/empty texts") {
    val s = spark
    import s.implicits._
    val docs = corpus()
    // empty training slice: an empty profile frame, not an NPE
    assert(TextQ.LangId.train(docs.filter(col("doc_id") < 0)).count() == 0)
    // texts under 3 chars emit no trigrams: they can't poison a profile...
    val withShorts = docs.union(
      Seq((9001L, "aa", ""), (9002L, "aa", "ab")).toDF("doc_id", "lang", "text"))
    val profiles = TextQ.LangId.train(withShorts)
    assert(profiles.filter(col("tri") === "" || length(col("tri")) < 3).count() == 0)
    // ...and they predict null instead of inheriting someone's empty-gram
    val shortPred = TextQ.LangId.predict(
      Seq((1L, "aa", "xy")).toDF("doc_id", "lang", "text"), profiles).collect().head
    assert(shortPred.isNullAt(shortPred.fieldIndex("pred_lang")))
  }
}
