package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native extraction expressions: values, null semantics, codegen
  * participation, and SQL registration.
  */
class SqlExprSpec extends AnyFunSuite {

  import SparkFixture._

  private val html =
    """<html><head><title>N1</title></head><body><a href="l.html" id="x">link</a></body></html>"""

  test("css_text/css_attr/json_text values and null semantics") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = Seq((html, """{"a":{"b":"deep"}}"""), (null, null)).toDF("h", "j")
    val rows = df.select(
      css_text(col("h"), lit("title")).as("t"),
      css_text(col("h"), lit("h9")).as("missing"),
      css_attr(col("h"), lit("a"), lit("href")).as("href"),
      json_text(col("j"), lit("a.b")).as("jt")
    ).collect()
    assert(rows(0).getString(0) == "N1")
    assert(rows(0).isNullAt(1)) // no match => null
    assert(rows(0).getString(2) == "l.html")
    assert(rows(0).getString(3) == "deep")
    assert((0 to 3).forall(rows(1).isNullAt)) // null input => null out
  }

  test("native expressions stay inside WholeStageCodegen (no ScalaUDF)") {
    import graft.functions._
    // non-foldable input (built from range id) so the projection must run at
    // execution time, inside codegen
    val df = spark.range(3).select(concat(
        lit("<html><head><title>doc "), col("id"),
        lit("</title></head><body/></html>")).as("h"))
      .select(css_text(col("h"), lit("title")).as("t"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(!plan.toString.contains("ScalaUDF"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("doc 0", "doc 1", "doc 2"))
  }

  test("SQL registration: css_text callable from spark.sql") {
    val spark0 = spark
    import spark0.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    Seq(html).toDF("h").createOrReplaceTempView("pages")
    val out = spark.sql(
      "SELECT css_text(h, 'title') AS t, css_attr(h, 'a', 'id') AS i FROM pages")
      .collect().head
    assert(out.getString(0) == "N1")
    assert(out.getString(1) == "x")
  }

  test("vec_dot: float/double/mixed arrays, HOF-equivalent values, null semantics") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5f, -1.5f, 2.25f), Seq(-2.0, 0.25, 8.0))
    ).toDF("f", "d")
    val rows = df.select(
      vec_dot(col("f"), col("d")).as("fd"),
      vec_dot(col("d"), col("d")).as("dd"),
      vec_dot(col("f"), col("f")).as("ff"),
      // the HOF formulation it replaces — must be bit-identical
      expr("aggregate(zip_with(cast(f AS array<double>), d, (x, y) -> x * y), " +
        "cast(0.0 AS double), (acc, v) -> acc + v)").as("hof")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(3), "vec_dot != HOF aggregate")
    }
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(0).getDouble(1) == 77.0)
    assert(rows(0).getDouble(2) == 14.0)
    // null array, length mismatch, null element => null
    val edge = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val er = edge.select(vec_dot(col("a"), col("b"))).collect()
    assert(er.forall(_.isNullAt(0)))
  }

  test("vec_dot_long: HOF-equivalent int64 values, null/mismatch semantics, codegen") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = Seq(
      (Seq(100000L, -200000L, 300000L), Seq(7L, 11L, -13L)),
      (Seq(0L, 1L, Long.MaxValue / 8), Seq(4L, 4L, 4L))
    ).toDF("a", "b")
    df.select(
      vec_dot_long(col("a"), col("b")).as("n"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), " +
        "(acc, v) -> acc + v)").as("hof")
    ).collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "vec_dot_long != HOF aggregate")
    }
    // length mismatch and null element -> null (the HOF contract)
    val edge = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
      .select(vec_dot_long(col("a"), col("b")).as("n")).collect()
    assert(edge.head.isNullAt(0))
    val nul = Seq((Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .select(vec_dot_long(col("a"), col("b")).as("n")).collect()
    assert(nul.head.isNullAt(0))
    val plan = spark.range(4)
      .select(array(col("id"), lit(2L)).as("v"))
      .select(vec_dot_long(col("v"), col("v")).as("n2"))
    assert(plan.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(plan.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L, 8L, 13L))
  }

  test("vec_dot runs inside WholeStageCodegen") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = spark.range(4)
      .select(array(col("id").cast("double"), lit(2.0)).as("v"))
      .select(vec_dot(col("v"), col("v")).as("n2"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(4.0, 5.0, 8.0, 13.0))
  }

  test("sorted_intersect_count: merge semantics match array_intersect cardinality") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),   // overlap {3,5}
      (Seq(-7L, 0L, 2L), Seq(-7L, 0L, 2L)),          // identical
      (Seq(1L, 2L), Seq(3L, 4L)),                    // disjoint
      (Seq.empty[Long], Seq(1L))                     // empty side
    ).toDF("a", "b")
    val rows = df.select(
      sorted_intersect_count(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("oracle")
    ).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 0L, 0L))
  }

  test("shingle_signature: value-equivalent to the composable HOF formulation") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox",
      "repeat repeat repeat repeat",       // duplicate shingles collapse
      "single",                            // < 2 tokens => gram = whole text
      "",                                  // empty => [""]
      "a  b",                              // empty token from double space
      "trailing space ",                   // split keeps trailing empty
      null
    ).toDF("text")
    // the exact HOF pipeline shingle_signature replaces (SimQ round-4 shape)
    val hof = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams", expr(
        """CASE WHEN size(toks) < 2 THEN array(text)
          |ELSE array_distinct(transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))
          |END""".stripMargin))
      .withColumn("hs", expr("transform(grams, g -> md5(g))"))
    val hofSigs = (1 to 6).foldLeft(hof) { (d, i) =>
      d.withColumn(s"e$i",
        expr(s"array_min(transform(hs, h -> substring(h, ${1 + (i - 1) * 5}, 5)))"))
    }
      .withColumn("e_hset", sort_array(expr("transform(grams, g -> xxhash64(g))")))
      .withColumn("e_n", size(col("grams")).cast("long"))
    val rows = hofSigs
      .withColumn("sig", shingle_signature(col("text")))
      .select(Seq(col("text"), col("sig"), col("e_hset"), col("e_n")) ++
        (1 to 6).map(i => col(s"e$i")): _*)
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "null text => null signature")
      else {
        val sig = r.getStruct(1)
        assert(sig.getSeq[Long](0) == r.getSeq[Long](2), s"hset mismatch for '${r.getString(0)}'")
        assert(sig.getLong(1) == r.getLong(3), s"n_grams mismatch for '${r.getString(0)}'")
        (1 to 6).foreach { i =>
          assert(sig.getString(1 + i) == r.getString(3 + i),
            s"s$i mismatch for '${r.getString(0)}'")
        }
      }
    }
  }

  test("anchor_grams: value-equivalent to the HOF formulation; p=1 keeps every gram") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val docs = Seq(
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14",
      "short doc",                        // < k tokens => whole text, one gram
      "a a a a a a a a a a a a a a a a",  // duplicate grams collapse
      "",                                 // empty => [""]
      "a  b c ",                          // empty tokens kept (split -1)
      null
    ).toDF("text")
    val k = 4
    val hofAll = expr(
      s"""array_distinct(transform(
         |  sequence(1, greatest(size(split(text, ' ')) - ${k - 1}, 1)),
         |  i -> array_join(slice(split(text, ' '), i, $k), ' ')))""".stripMargin)
    val hofMod4 = expr(
      s"""filter(array_distinct(transform(
         |  sequence(1, greatest(size(split(text, ' ')) - ${k - 1}, 1)),
         |  i -> array_join(slice(split(text, ' '), i, $k), ' '))),
         |  g -> substring(md5(g), 32, 1) IN ('0', '4', '8', 'c'))""".stripMargin)
    val rows = docs
      .select(col("text"),
        anchor_grams(col("text"), k, 1).as("n1"), hofAll.as("e1"),
        anchor_grams(col("text"), k, 4).as("n4"), hofMod4.as("e4"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) { assert(r.isNullAt(1) && r.isNullAt(3)) }
      else {
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"p=1 mismatch for '${r.getString(0)}'")
        assert(r.getSeq[String](3) == r.getSeq[String](4),
          s"p=4 mismatch for '${r.getString(0)}'")
      }
    }
  }

  test("anchor_grams callable from spark.sql") {
    val got = spark.sql(
      "SELECT anchor_grams('a b c d e', 2, 1) AS g").collect().head.getSeq[String](0)
    assert(got == Seq("a b", "b c", "c d", "d e"))
  }

  test("anchor_spans: positional, repeats kept, same md5 gate as anchor_grams") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val docs = Seq(
      "w1 w2 w3 w4 w5 w6 w7 w8",
      "a b a b a b",  // repeated gram => one entry PER occurrence
      "short",        // < k tokens => whole text at pos 0
      "",
      null
    ).toDF("text")
    val k = 4
    docs.select(col("text"), anchor_spans(col("text"), k, 1).as("sp"),
        anchor_spans(col("text"), k, 4).as("sp4"))
      .collect().foreach { r =>
        if (r.isNullAt(0)) assert(r.isNullAt(1))
        else {
          val toks = r.getString(0).split(" ", -1)
          val n = math.max(toks.length - k + 1, 1)
          val expAll = (0 until n).map(i =>
            (i, toks.slice(i, i + k).mkString(" ")))
          val got = r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getInt(0), x.getString(1)))
          assert(got == expAll, s"p=1 positions for '${r.getString(0)}'")
          val got4 = r.getSeq[org.apache.spark.sql.Row](2)
            .map(x => (x.getInt(0), x.getString(1)))
          val exp4 = expAll.filter { case (_, g) =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            ((d(15) & 0x0F) % 4) == 0
          }
          assert(got4 == exp4, s"p=4 gate for '${r.getString(0)}'")
        }
      }
    // SQL path registered
    val sqlGot = spark.sql("SELECT anchor_spans('a b a b a b', 4, 1) AS s")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getInt(0), x.getString(1)))
    assert(sqlGot == Seq((0, "a b a b"), (1, "b a b a"), (2, "a b a b")))
  }

  test("winnow_spans: positions' grams == winnow_grams selection; positions sorted; SQL registered") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val docs = Seq(
      "a b c d e f g h i j k l m n",
      "a b a b a b a b",  // repeated grams: positions can outnumber distinct grams
      "short",
      ""
    ).toDF("text")
    val k = 3; val w = 4
    docs.select(winnow_grams(col("text"), k, w).as("g"),
        winnow_spans(col("text"), k, w).as("sp"))
      .collect().foreach { r =>
        val grams = r.getSeq[String](0)
        val spans = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getString(1)))
        // the positional form selects the same gram SET (it may select one
        // gram at several positions — each a removable occurrence)
        assert(spans.map(_._2).toSet == grams.toSet)
        assert(spans.map(_._1) == spans.map(_._1).sorted)
        assert(spans.map(_._1).distinct == spans.map(_._1))
      }
    val sqlGot = spark.sql("SELECT winnow_spans('a b c d e', 2, 2) AS s")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(sqlGot.nonEmpty)
  }

  test("sim_hash: value-equivalent to the exploded conditional-sum formulation") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "repeat repeat repeat",            // distinct collapses
      "single",
      "",                                // empty => one "" token
      "a  b",                            // empty token from double space
      "trailing space ",
      "unicode tést 中文",  // multi-byte UTF-8 md5 input
      null
    ).toDF("text").withColumn("doc_id", monotonically_increasing_id())
    for (bits <- Seq(16, 60)) {
      // the exact pipeline sim_hash replaces: explode distinct tokens,
      // per-bit +-1 sums over md5 / md5('x'||t) hex digits, 1L<<(b-1) weights
      val tok = docs
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
        .withColumn("h1", md5(col("t")))
        .withColumn("h2", md5(concat(lit("x"), col("t"))))
      val bitSums =
        (1 to math.min(bits, 32)).map(b =>
          sum(when(substring(col("h1"), b, 1).isin(hexHigh: _*), 1).otherwise(-1)).as(s"b$b")) ++
          (33 to bits).map(b =>
            sum(when(substring(col("h2"), b - 32, 1).isin(hexHigh: _*), 1).otherwise(-1)).as(s"b$b"))
      val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      val oracle = agg.select(col("doc_id"),
        (1 to bits).map(b => when(col(s"b$b") > 0, lit(1L << (b - 1))).otherwise(lit(0L)))
          .reduce(_ + _).as("expect"))
      val got = docs.select(col("doc_id"), sim_hash(col("text"), bits).as("sim"))
        .join(oracle, Seq("doc_id"), "left").collect()
      assert(got.length == 8)
      got.foreach { r =>
        if (r.isNullAt(1)) assert(r.isNullAt(2), "null text => null simhash, absent in oracle")
        else assert(r.getLong(1) == r.getLong(2), s"bits=$bits doc=${r.getLong(0)}")
      }
    }
  }

  test("rolling_hash: value-equivalent to the guarded HOF formulation; codegen + SQL") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val docs = Seq(
      "the quick brown fox", "", " ", "a", "abc123 xyz",
      "unicode tést 日本", // multi-code-point content
      "😀 emoji",        // surrogate pair: ONE code point, two chars
      null
    ).toDF("norm")
    // the exact HOF pipeline rolling_hash replaces (q44's round-6 shape)
    val hof = when(length(col("norm")) === 0, lit(7L)).otherwise(expr(
      """aggregate(
        |  transform(sequence(1, length(norm)), i -> CAST(ascii(substr(norm, i, 1)) AS BIGINT)),
        |  7L,
        |  (a, x) -> (a * 31 + x) % 2147483647)""".stripMargin))
    val rows = docs.select(col("norm"), rolling_hash(col("norm")).as("n"), hof.as("h")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else assert(r.getLong(1) == r.getLong(2), s"mismatch for '${r.getString(0)}'")
    }
    // codegen + SQL registration
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = spark.range(1)
      .select(concat(lit("abc"), col("id").cast("string")).as("t"))
      .select(rolling_hash(col("t")).as("rh"))
    assert(df.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(df.collect().head.getLong(0) ==
      spark.sql("SELECT rolling_hash('abc0') AS rh").collect().head.getLong(0))
  }

  test("sim_hash runs inside whole-stage codegen and from spark.sql") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    // spark.range (not a local relation): ConvertToLocalRelation would fold
    // a literal-fed Project away before any codegen happens
    val df = spark.range(1)
      .select(concat(lit("a b c"), col("id").cast("string")).as("t"))
      .select(sim_hash(col("t"), 60).as("s"))
    val plan = df.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    val fromSql = spark.sql("SELECT sim_hash('a b c0', 60) AS s").collect().head.getLong(0)
    assert(df.collect().head.getLong(0) == fromSql)
  }

  test("shingle_signature callable from spark.sql") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT shingle_signature('a b c').n_grams AS n, shingle_signature('a b c').s1 AS s1")
      .collect().head
    assert(r.getLong(0) == 2L)
    assert(r.getString(1).length == 5)
  }

  test("vec_dot/sorted_intersect_count callable from spark.sql (lambda-visible)") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 7L)) AS n,
        |  aggregate(array(array(1.0d, 0.0d), array(0.0d, 1.0d)), cast(0.0 AS double),
        |    (acc, c) -> acc + vec_dot(c, array(1.0d, 1.0d))) AS in_lambda
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0)
  }

  test("ngram_rep_stats: hand-computed fixtures, brute equivalence, null/short-doc semantics, SQL") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    def stats(text: String, n: Int): (Long, Long, Long) = {
      val r = Seq(text).toDF("t")
        .select(ngram_rep_stats(col("t"), n).as("s"))
        .select("s.n_grams", "s.n_distinct", "s.top_count").collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(stats("a a a a", 2) == (3L, 1L, 3L))        // grams: "a a" x3
    assert(stats("a b a b c", 2) == (4L, 3L, 2L))      // "a b" x2, "b a", "b c"
    assert(stats("x y z", 3) == (1L, 1L, 1L))
    assert(stats("x y", 3) == (0L, 0L, 0L))            // shorter than n
    assert(stats("", 2) == (0L, 0L, 0L))               // one empty token
    // brute-force equivalence on 100 random-ish docs
    val docs = (0 until 100).map { i =>
      val rnd = new scala.util.Random(i)
      (0 until 3 + rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" ")
    }
    val got = docs.toDF("t").select(ngram_rep_stats(col("t"), 2).as("s"))
      .select("s.n_grams", "s.n_distinct", "s.top_count").collect()
    docs.zip(got).foreach { case (d, r) =>
      val grams = d.split(" ", -1).sliding(2).map(_.mkString(" ")).toSeq
      val byGram = grams.groupBy(identity)
      assert(r.getLong(0) == grams.size && r.getLong(1) == byGram.size &&
        r.getLong(2) == byGram.values.map(_.size).max)
    }
    // null in → null out; SQL registration
    assert(Seq(Option.empty[String]).toDF("t")
      .select(ngram_rep_stats(col("t"), 2)).collect().head.isNullAt(0))
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT ngram_rep_stats('a a a', 2).top_count AS tc")
      .collect().head.getLong(0)
    assert(viaSql == 2L)
  }

  test("zorder2: known interleaves, 16-bit mask, null semantics, codegen, SQL registration") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    // reference values: x occupies even bits, y odd bits
    val df = Seq(
      (3L, 1L), // 0b11 ⨉ 0b01 → 0b0111 = 7
      (0xFFFFL, 0L), // all-x → 0x55555555
      (0L, 0xFFFFL), // all-y → 0xAAAAAAAA
      (0x10000L, 0L) // 17th bit masked away → 0
    ).toDF("x", "y")
    val got = df.select(zorder2(col("x"), col("y"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 0x55555555L, 0xAAAAAAAAL, 0L))

    // null in → null out
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(zorder2(col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))

    // locality: any two points in one 64x64 tile share zkey >> 12
    val pts = for (x <- 192L to 255L; y <- 64L to 127L) yield (x, y)
    val tiles = pts.toDF("x", "y").select((zorder2(col("x"), col("y")) / 4096).cast("long"))
      .distinct().collect()
    assert(tiles.length == 1)

    // codegen participation (non-foldable input) + no UDF in the plan
    val cg = spark.range(8).select(zorder2(col("id"), col("id") + 1L).as("z"))
    val plan = cg.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(!plan.toString.contains("ScalaUDF"))
    assert(cg.collect().map(_.getLong(0)).head == graft.sql.ZOrder2.interleave(0L, 1L))

    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder2(3, 1) AS z").collect().head.getLong(0) == 7L)
  }

  test("per-thread parse cache: repeated extraction over one doc is cheap and correct") {
    val spark0 = spark
    import spark0.implicits._
    import graft.functions._
    val n = 2000
    val df = (1 to n).map(i =>
        s"""<html><head><title>doc $i</title></head><body><a href="$i.html">x</a></body></html>""")
      .toDF("h")
      .select(
        css_text(col("h"), lit("title")).as("t"),
        css_attr(col("h"), lit("a"), lit("href")).as("l"))
    val rows = df.collect()
    assert(rows.length == n)
    assert(rows.forall(r => r.getString(1) == r.getString(0).split(" ")(1) + ".html"))
  }

  test("kmv_sketch: partition-independent merge, hash-exact content, duplicates free, nulls skipped") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val n = 5000
    val df = spark.range(n.toLong).select(concat(lit("value "), col("id")).as("s"))
    def sk(d: org.apache.spark.sql.DataFrame, k: Int = 32): Seq[Long] =
      d.agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
        .collect().head.getStruct(0).getSeq[Long](1)
    // the sketch carries its k (the merge-soundness witness)
    assert(df.agg(graft.functions.kmv_sketch(col("s"), 32).as("kmv"))
      .select(col("kmv.k")).collect().head.getInt(0) == 32)
    val a = sk(df.repartition(13))
    assert(a == sk(df.coalesce(1)), "merge path must equal the single-partition path")
    assert(a.length == 32 && a == a.sorted)
    // content is EXACTLY the 32 smallest hashes (driver-side replay)
    val expected = (0 until n)
      .map(i => graft.sql.KmvFunction.hash60(UTF8String.fromString(s"value $i")))
      .sorted.take(32)
    assert(a == expected)
    // duplicates are free (set semantics)
    assert(sk(df.union(df)) == a)
    // estimator sanity: within 5 standard errors of the true distinct count
    val est = 31.0 * (1L << 60).toDouble / a.last
    assert(math.abs(est - n) < 5 * n / math.sqrt(30), s"estimate $est vs $n")
    // sub-k group returns the full (exact) hash set
    assert(sk(df.limit(10)).length == 10)
    // nulls ignored
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("s")
    assert(sk(withNulls, 8).length == 2)
    // SQL-registered
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("kmv_in")
    assert(spark.sql("SELECT size(kmv_sketch(s, 8).hs) FROM kmv_in")
      .collect().head.getInt(0) == 8)
  }

  test("kmv_merge: merge-of-sketches == sketch-of-union under any sharding; nulls; SQL") {
    val spark0 = spark
    import spark0.implicits._
    val n = 5000
    val k = 32
    val df = spark.range(n.toLong)
      .select(col("id"), concat(lit("value "), col("id")).as("s"))
    // direct sketch of the whole set
    val direct = df.agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
      .collect().head.getStruct(0).getSeq[Long](1)
    // shard → per-shard sketches → kmv_merge rollup, across several
    // shardings (including one with sub-k shards)
    for (shards <- Seq(2, 7, 64)) {
      val merged = df.groupBy((col("id") % shards).as("shard"))
        .agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
        .agg(graft.functions.kmv_merge(col("kmv"), k).as("kmv"))
        .collect().head.getStruct(0).getSeq[Long](1)
      assert(merged == direct,
        s"rollup over $shards shards must equal the direct sketch")
    }
    // merge of merges (a second rollup level) is still the same sketch
    val twoLevel = df
      .groupBy((col("id") % 16).as("shard"))
      .agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
      .groupBy((col("shard") % 4).as("coarse"))
      .agg(graft.functions.kmv_merge(col("kmv"), k).as("kmv"))
      .agg(graft.functions.kmv_merge(col("kmv"), k).as("kmv"))
      .collect().head.getStruct(0).getSeq[Long](1)
    assert(twoLevel == direct, "re-merging merged sketches must be idempotent")
    // null sketch rows are ignored (a null struct, as a missing shard is)
    val withNull = Seq(Some(Seq(1L, 5L)), None, Some(Seq(3L))).toDF("hs")
      .select(when(col("hs").isNotNull,
        struct(lit(8).as("k"), col("hs").as("hs"))).as("kmv"))
    assert(withNull.agg(graft.functions.kmv_merge(col("kmv"), 8))
      .collect().head.getStruct(0).getSeq[Long](1) == Seq(1L, 3L, 5L))
    // SQL-registered, composes with kmv_sketch in one statement
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("kmvm_in")
    val viaSql = spark.sql(
      s"""SELECT kmv_merge(kmv, $k) AS kmv FROM (
         |  SELECT id % 5 AS shard, kmv_sketch(s, $k) AS kmv
         |  FROM kmvm_in GROUP BY id % 5)""".stripMargin)
      .collect().head.getStruct(0).getSeq[Long](1)
    assert(viaSql == direct)
  }

  test("kmv sketch parquet round-trip: persisted struct sketches re-aggregate to the direct sketch") {
    val spark0 = spark
    import spark0.implicits._
    val k = 32
    val df = spark.range(3000L)
      .select(col("id"), concat(lit("value "), col("id")).as("s"))
    val direct = df.agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
      .collect().head.getStruct(0).getSeq[Long](1)
    // the archival pattern: per-shard sketches PERSISTED to parquet (the
    // between-runs storage the struct encoding exists for), read back in
    // a fresh scan, rolled up — k and hashes must survive the round-trip
    val dir = java.nio.file.Files.createTempDirectory("kmv_rt").toString
    df.groupBy((col("id") % 8).as("shard"))
      .agg(graft.functions.kmv_sketch(col("s"), k).as("kmv"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.select(col("kmv.k")).distinct().collect().map(_.getInt(0)).toSeq == Seq(k))
    val merged = back.agg(graft.functions.kmv_merge(col("kmv"), k).as("kmv"))
      .collect().head.getStruct(0).getSeq[Long](1)
    assert(merged == direct, "parquet-persisted sketches must roll up to the direct sketch")
  }

  test("kmv_merge soundness: saturated undersized sketches and null hash slots fail loudly") {
    val spark0 = spark
    import spark0.implicits._
    val df = spark.range(200L)
      .select(col("id"), concat(lit("value "), col("id")).as("s"))
    // a sketch stored with k'=8 over 200 distinct values is SATURATED:
    // merging it at k=16 would need hashes it dropped — must be detected,
    // not silently under-merged (r16 verdict #3)
    val undersized = df.groupBy((col("id") % 4).as("shard"))
      .agg(graft.functions.kmv_sketch(col("s"), 8).as("kmv"))
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse("")).mkString("; ")
    val e = intercept[Exception] {
      undersized.agg(graft.functions.kmv_merge(col("kmv"), 16)).collect()
    }
    assert(chain(e).contains("saturated"), s"unexpected error: ${chain(e)}")
    // an UNSATURATED smaller-k sketch is the exhaustive hash set — merging
    // it at a larger k is sound and must succeed
    val exhaustive = df.filter(col("id") < 5)
      .agg(graft.functions.kmv_sketch(col("s"), 8).as("kmv"))
    assert(exhaustive.agg(graft.functions.kmv_merge(col("kmv"), 16))
      .collect().head.getStruct(0).getSeq[Long](1).length == 5)
    // a null HASH SLOT (hand-built SQL struct) must fail loudly, never be
    // read as hash 0 — the global minimum would poison the sketch forever
    // (r16 verdict #1)
    val nullSlot = spark.sql(
      "SELECT named_struct('k', 8, 'hs', array(1L, CAST(NULL AS BIGINT), 5L)) AS kmv")
    val e2 = intercept[Exception] {
      nullSlot.agg(graft.functions.kmv_merge(col("kmv"), 8)).collect()
    }
    assert(chain(e2).contains("null hash"), s"unexpected error: ${chain(e2)}")
  }

  test("vec_sum_long: element-wise sums, partition-independent, nulls skipped, length mismatch fails") {
    val spark0 = spark
    import spark0.implicits._
    val n = 4000
    val d = 16
    val df = spark.range(n.toLong).select(col("id"),
      expr(s"transform(sequence(0, ${d - 1}), j -> id * j - 7)").as("v"))
    def summed(dd: org.apache.spark.sql.DataFrame): Seq[Long] =
      dd.agg(graft.functions.vec_sum_long(col("v"))).collect().head.getSeq[Long](0)
    val expected = (0 until d).map(j => (0L until n.toLong).map(i => i * j - 7).sum)
    assert(summed(df.repartition(11)) == expected)
    assert(summed(df.coalesce(1)) == expected,
      "merge path must equal the single-partition path")
    // grouped: per-cluster sums match a driver-side replay
    val byG = df.groupBy((col("id") % 3).as("g"))
      .agg(graft.functions.vec_sum_long(col("v")).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (0 until 3).foreach { g =>
      val exp = (0 until d).map(j =>
        (0L until n.toLong).filter(_ % 3 == g).map(i => i * j - 7).sum)
      assert(byG(g.toLong) == exp, s"group $g")
    }
    // nulls ignored; all-null group yields an empty array
    val withNulls = Seq(Some(Seq(1L, 2L)), None, Some(Seq(10L, 20L))).toDF("v")
    assert(withNulls.agg(graft.functions.vec_sum_long(col("v")))
      .collect().head.getSeq[Long](0) == Seq(11L, 22L))
    assert(Seq(Option.empty[Seq[Long]]).toDF("v")
      .agg(graft.functions.vec_sum_long(col("v")))
      .collect().head.getSeq[Long](0).isEmpty)
    // mismatched lengths fail loudly, never mis-sum
    val bad = Seq(Seq(1L, 2L), Seq(3L)).toDF("v").coalesce(1)
    intercept[Exception] {
      bad.agg(graft.functions.vec_sum_long(col("v"))).collect()
    }
    // ZERO-LENGTH vectors are the identity in EITHER row order — the same
    // group must never succeed or throw depending on partitioning (r16
    // verdict #2); both orderings land on the non-empty rows' sum
    def vsum(rows: Seq[Seq[Long]]): Seq[Long] =
      rows.toDF("v").coalesce(1)
        .agg(graft.functions.vec_sum_long(col("v"))).collect().head.getSeq[Long](0)
    assert(vsum(Seq(Seq.empty[Long], Seq(4L, 5L))) == Seq(4L, 5L), "empty-first")
    assert(vsum(Seq(Seq(4L, 5L), Seq.empty[Long])) == Seq(4L, 5L), "empty-after-nonempty")
    assert(vsum(Seq(Seq.empty[Long], Seq.empty[Long])).isEmpty, "all-empty group")
    // a null ELEMENT fails loudly, never sums as 0 (r16 verdict #1)
    val nullElem = spark.sql("SELECT array(1L, CAST(NULL AS BIGINT)) AS v")
    val eN = intercept[Exception] {
      nullElem.agg(graft.functions.vec_sum_long(col("v"))).collect()
    }
    val eMsg = Iterator.iterate(eN: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("; ")
    assert(eMsg.contains("null element"), s"unexpected error: $eMsg")
    // SQL-registered
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("vsum_in")
    assert(spark.sql("SELECT vec_sum_long(v) FROM vsum_in")
      .collect().head.getSeq[Long](0) == expected)
  }

  test("cm_sketch: exact replay, partition-independent, never undercounts, vec_sum_long merge == direct") {
    val spark0 = spark
    import spark0.implicits._
    val d = 4
    val w = 32
    val n = 20000
    // zipfish token stream: token j appears ~n/(j+1) times
    val df = spark.range(n.toLong).select(col("id"),
      expr("concat('tok', CAST(CAST(pow(id % 997 + 1, 0.5) AS INT) AS STRING))").as("tok"))
    def grid(dd: org.apache.spark.sql.DataFrame): Seq[Long] =
      dd.agg(graft.functions.cm_sketch(col("tok"), d, w)).collect().head.getSeq[Long](0)
    val g1 = grid(df.repartition(13))
    assert(g1 == grid(df.coalesce(1)), "merge path must equal single-partition path")
    assert(g1.length == d * w)
    // row sums are each the total count (every row counts every token once)
    (0 until d).foreach { r =>
      assert(g1.slice(r * w, (r + 1) * w).sum == n, s"row $r total")
    }
    // driver replay: same md5-60-bit bucket per (r, tok)
    val exact = df.groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val replay = new Array[Long](d * w)
    exact.foreach { case (tok, c) =>
      (0 until d).foreach { r =>
        val h = graft.sql.KmvFunction.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$r:$tok"))
        replay(r * w + (h % w).toInt) += c
      }
    }
    assert(g1 == replay.toSeq, "grid must equal the driver replay")
    // point estimates never undercount, for EVERY token
    exact.foreach { case (tok, c) =>
      val est = (0 until d).map { r =>
        val h = graft.sql.KmvFunction.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$r:$tok"))
        g1(r * w + (h % w).toInt)
      }.min
      assert(est >= c, s"$tok: est $est < exact $c")
    }
    // rollup: vec_sum_long over shard sketches == direct sketch
    val rolled = df.groupBy((col("id") % 7).as("shard"))
      .agg(graft.functions.cm_sketch(col("tok"), d, w).as("cm"))
      .agg(graft.functions.vec_sum_long(col("cm")))
      .collect().head.getSeq[Long](0)
    assert(rolled == g1, "counter addition IS the CM merge")
    // nulls ignored
    val withNulls = Seq(Some("a"), None, Some("a")).toDF("tok")
    val gN = withNulls.agg(graft.functions.cm_sketch(col("tok"), d, w))
      .collect().head.getSeq[Long](0)
    assert(gN.sum == 2 * d && gN.max == 2)
    // SQL-registered
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("cm_in")
    assert(spark.sql(s"SELECT cm_sketch(tok, $d, $w) FROM cm_in")
      .collect().head.getSeq[Long](0) == g1)
  }

  test("nfc: composes decomposed sequences, identity on normalized, SQL + codegen, nulls") {
    val spark0 = spark
    import spark0.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val cases = Seq(
      "e\u0301clair",                   // decomposed e + combining acute
      "caf\u00e9",                      // already NFC — must pass through unchanged
      "A\u030angstro\u0308m",          // decomposed ring-above + diaeresis
      "",                               // empty
      "plain ascii")
    val got = cases.toDF("s")
      .select(graft.functions.nfc(col("s")).as("n")).collect().map(_.getString(0))
    val expected = cases.map(java.text.Normalizer.normalize(_,
      java.text.Normalizer.Form.NFC))
    assert(got.toSeq == expected)
    assert(expected(0) == "\u00e9clair" && expected(2) == "\u00c5ngstr\u00f6m")
    // SQL-registered
    assert(spark.sql("SELECT nfc('e' || 'X')").collect().head.getString(0) == "eX")
    // null in, null out
    assert(Seq(Option.empty[String]).toDF("s")
      .select(graft.functions.nfc(col("s"))).collect().head.isNullAt(0))
    // codegen path, non-foldable input
    val df2 = spark.range(3)
      .select(concat(lit("e\u0301 id "), col("id")).as("s"))
      .select(graft.functions.nfc(col("s")).as("n"))
    val plan = df2.queryExecution.executedPlan
    assert(plan.find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]).isDefined)
    assert(!plan.toString.contains("ScalaUDF"))
    assert(df2.collect().forall(_.getString(0).startsWith("\u00e9 id")))
  }

  test("bottomk_pairs: k-smallest multiset, duplicates kept, shard rollup, nulls, SQL") {
    val spark0 = spark
    import spark0.implicits._
    val n = 4000L
    val k = 50
    // planted key collisions: (id*37) % 1000 cycles, so every key is hit 4
    // times with differing payloads \u2014 ties on key are broken by value
    val df = spark.range(n).select(col("id"),
      ((col("id") * 37) % 1000).as("h"), (col("id") % 7).as("v"))
    def samp(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.agg(graft.functions.bottomk_pairs(col("h"), col("v"), k).as("s"))
        .select(explode(col("s")).as("p"))
        .select(col("p.key"), col("p.val")).as[(Long, Long)].collect().toSeq
    val direct = samp(df.coalesce(1))
    val expected = (0L until n).map(i => ((i * 37) % 1000, i % 7)).sorted.take(k)
    assert(direct == expected, "content must be exactly the k smallest (key, value) pairs")
    assert(samp(df.repartition(13)) == direct,
      "merge path must equal the single-partition path")
    // exact duplicate pairs are KEPT up to multiplicity (sample members,
    // not set elements \u2014 unlike kmv_sketch's set semantics)
    assert(samp(df.union(df)) == expected.flatMap(p => Seq(p, p)).take(k))
    // archival rollup: per-shard samples explode + re-aggregate to EXACTLY
    // the sample of the union (the KMV union-trim algebra with payloads)
    val rolled = df.groupBy((col("id") % 8).as("shard"))
      .agg(graft.functions.bottomk_pairs(col("h"), col("v"), k).as("s"))
      .select(explode(col("s")).as("p"))
      .agg(graft.functions.bottomk_pairs(col("p.key"), col("p.val"), k).as("s"))
      .select(explode(col("s")).as("p"))
      .select(col("p.key"), col("p.val")).as[(Long, Long)].collect().toSeq
    assert(rolled == direct, "per-shard sample rollup must equal the direct sample")
    // sub-k group returns every pair, ascending
    assert(samp(df.limit(7)) ==
      (0L until 7L).map(i => ((i * 37) % 1000, i % 7)).sorted)
    // a row enters the sample iff key AND value are non-null
    val withNulls = Seq((Option(1L), Option.empty[Long]),
      (Option.empty[Long], Option(2L)), (Option(3L), Option(4L))).toDF("h", "v")
    assert(samp(withNulls) == Seq((3L, 4L)))
    // SQL-registered
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    df.createOrReplaceTempView("bkp_in")
    assert(spark.sql("SELECT size(bottomk_pairs(h, v, 5)) FROM bkp_in")
      .collect().head.getInt(0) == 5)
    // k outside the state budget fails at analysis, not silently
    intercept[Exception] {
      df.agg(graft.functions.bottomk_pairs(col("h"), col("v"), 0)).collect()
    }
  }
}
