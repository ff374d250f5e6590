package graft

import graft.actions._
import graft.agent.Env
import graft.api.GraftContext
import graft.cache.InMemoryDocCache
import graft.conf.{DownSampling, GraftConf}

import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, ObjectOutputStream}

/** DataView API surface + golden-output assertions (reference
  * DataViewSpec.scala style: schema treeString and sorted JSON dumps as
  * inline goldens) + serializability of everything shipped to executors
  * (reference AssertSerializable).
  */
class DataViewSpec extends AnyFunSuite with BeforeAndAfterEach {

  import SparkFixture._

  override def beforeEach(): Unit = InMemoryDocCache.clear()

  private def ctx = new GraftContext(spark, GraftConf())

  test("map/flatMap/filter/sortBy/union/intersect/except compose") {
    import spark.implicits._
    val v = ctx.create((1 to 10).toSeq)
    assert(v.map(_ * 2).filter(_ > 10).sortBy(-_).collect() == Seq(20, 18, 16, 14, 12))
    assert(v.flatMap(i => Seq(i, i)).dataset.count() == 20)
    val a = ctx.create(Seq(1, 2, 3))
    val b = ctx.create(Seq(3, 4))
    assert((a ++ b).collect().sorted == Seq(1, 2, 3, 3, 4))
    assert(a.intersect(b).collect() == Seq(3))
    assert(a.except(b).collect().sorted == Seq(1, 2))
    assert(v.coalesce(1).dataset.rdd.getNumPartitions == 1)
  }

  test("disperse widens partitions without shuffle, rows intact") {
    import spark.implicits._
    val narrow = ctx.create((1 to 40).toSeq, numSlices = 1)
    assert(narrow.dataset.rdd.getNumPartitions == 1)
    val wide = narrow.disperse(8)
    val rdd = wide.dataset.rdd
    // no ShuffleDependency between the view's top and the disperse step
    // (create(numSlices=1) legitimately shuffles UPSTREAM of it)
    def narrowDownToDisperse(r: org.apache.spark.rdd.RDD[_]): Boolean =
      r.isInstanceOf[graft.scale.NarrowDisperseRDD[_]] ||
        (r.dependencies.nonEmpty && r.dependencies.forall {
          case _: org.apache.spark.ShuffleDependency[_, _, _] => false
          case d => narrowDownToDisperse(d.rdd)
        })
    assert(narrowDownToDisperse(rdd), "disperse must reach the view top shuffle-free")
    assert(rdd.getNumPartitions == 8)
    assert(wide.collect().sorted == (1 to 40))
  }

  test("flatMap honors conf downsampling at the fan-out") {
    import spark.implicits._
    val limited = new GraftContext(spark, GraftConf(downSampling = DownSampling.FirstN(2)))
    val out = limited.create(Seq(1)).flatMap(i => Seq(i, i + 1, i + 2, i + 3)).collect()
    assert(out == Seq(1, 2))
    val ratio = DownSampling.ByRatio(0.5)
    assert(ratio((1 to 10).toSeq).size == 5)
    assert(ratio((1 to 10).toSeq) == ratio((1 to 10).toSeq)) // seeded => deterministic
    assert(DownSampling.ToSize(3)((1 to 10).toSeq).size == 3)
  }

  test("keyBy override: rows with different traces share one execution") {
    import spark.implicits._
    val u1 = writeFixture("dv1/a.html", "<p>a</p>")
    val u2 = writeFixture("dv1/b.html", "<p>b</p>")
    val c = ctx
    // two DIFFERENT uris, but keyBy collapses them => 1 fetch, first wins
    val view = c.create(Seq(s"file:$u1", s"file:$u2"))
      .fetch(u => TraceSet.one(Wget(u)), keyBy = _ => "same-group")
    assert(view.count() == 2)
    assert(c.metrics.pagesFetched.value == 1)
    assert(view.select(_.trajectory.texts("p").mkString).collect().distinct.size == 1)
  }

  test("golden: fetched export schema and JSON dump") {
    import spark.implicits._
    val uri = writeFixture("dv2/g.html",
      "<html><head><title>G</title></head><body><a href=\"x.html\">L</a></body></html>")
    val df = ctx.create(Seq(0))
      .fetchOne(_ => Trace.of(Wget(s"file:$uri")))
      .select(r => (r.trajectory.texts("title").mkString,
        r.trajectory.findAll("a").flatMap(_.href).length,
        r.trajectory.doc.get.mime))
      .asDataFrame.toDF("title", "n_links", "mime")
    val goldenSchema =
      """root
        | |-- title: string (nullable = true)
        | |-- n_links: integer (nullable = false)
        | |-- mime: string (nullable = true)
        |""".stripMargin
    assert(df.schema.treeString == goldenSchema)
    val goldenJson = Seq("""{"title":"G","n_links":1,"mime":"text/html"}""")
    assert(df.toJSON.collect().toSeq == goldenJson)
  }

  test("everything shipped to executors java-serializes (AssertSerializable)") {
    def assertSer(o: Any): Unit = {
      val oos = new ObjectOutputStream(new ByteArrayOutputStream())
      oos.writeObject(o) // throws NotSerializableException on failure
      oos.close()
    }
    assertSer(GraftConf())
    assertSer(GraftConf.preview)
    assertSer(Env(GraftConf(), ctx.metrics, Some(graft.agent.MockBrowserFactory(Map("u" -> "<p/>")))))
    assertSer(Trace.of(Visit("u"), Click("c"), Snapshot(),
      Loop(Trace.of(ClickNext("n", Seq("x")), Screenshot()), 5),
      LocalRetry(Trace.of(Wget("file:/x")), 2), Delay(5), Wpost("u", "e")))
    assertSer(TraceSet.one(Wget("file:/x")) *> TraceSet.one(Wget("file:/y")))
    assertSer(graft.doc.Trajectory(Seq(
      graft.doc.Doc(graft.doc.DocUID("k"), "u", "x".getBytes("UTF-8")),
      graft.doc.NoDoc(graft.doc.DocUID("k"), "u"),
      graft.doc.DocError(graft.doc.DocUID("k"), "u", "m"))))
    assertSer(DownSampling.ByRatio(0.5))
    assertSer(graft.exec.Locality.Wide)
  }

  test("asJSONDataset and foreach/execute") {
    import spark.implicits._
    val v = ctx.create(Seq((1, "a"), (2, "b")))
    assert(v.asJSONDataset.collect().sorted.toSeq ==
      Seq("""{"_1":1,"_2":"a"}""", """{"_1":2,"_2":"b"}"""))
    val acc = spark.sparkContext.longAccumulator("dv-exec")
    val forced = v.foreach { case (i, _) => acc.add(i) }
    assert(acc.value == 3)
    // materialization contract: downstream actions on the returned view do
    // NOT re-fire the side-effect lambda
    assert(forced.count() == 2)
    forced.collect()
    assert(acc.value == 3, "foreach lambda re-fired on a downstream action")
  }

  test("sortBy compiles standard-ordering keys to a native Catalyst sort") {
    import spark.implicits._
    val v = ctx.create(Seq(5, 3, 9, 1, 7))
    val sorted = v.sortBy(x => -x) // Ordering.Int => native path
    assert(sorted.collect() == Seq(9, 7, 5, 3, 1))
    val plan = sorted.dataset.queryExecution.executedPlan.toString
    assert(plan.contains("Sort"), s"expected a native Sort node:\n$plan")
    assert(!plan.contains("ExternalRDD"), s"native path must not round-trip through an RDD:\n$plan")
    // numPartitions respected on the native path
    assert(v.sortBy(identity[Int], ascending = false, numPartitions = 2)
      .dataset.rdd.getNumPartitions == 2)
    // custom (opaque) Ordering keeps the faithful RDD fallback, same values
    val weird: Ordering[Int] = Ordering.by((x: Int) => (x % 3, x))
    val fb = v.sortBy(identity[Int])(weird, implicitly)
    assert(fb.collect() == Seq(3, 9, 1, 7, 5))
    // fallback sorts in rdd.sortBy, so the RESULT plan is a plain scan of
    // the pre-sorted RDD — no Catalyst Sort node
    assert(!fb.dataset.queryExecution.executedPlan.toString.contains("Sort"))
  }

  test("sortBy string collation: native and fallback paths agree on every BMP string; " +
    "astral divergence is exactly the documented one") {
    import spark.implicits._
    // deterministic BMP corpus sweeping the ranges where UTF-8 byte order
    // could diverge from UTF-16 code-unit order if either side mis-handled
    // widths: ASCII incl. controls, Latin-1, 2-byte (U+0080..U+07FF),
    // 3-byte (U+0800..U+FFFF incl. U+E000 past the surrogate gap and
    // U+FFFD/U+FFFE/U+FFFF), prefix pairs, and the empty string
    val rng = new scala.util.Random(42)
    val pool: IndexedSeq[Char] =
      (0x01 to 0x7f).map(_.toChar) ++
        Seq(0x0080, 0x00e9, 0x0100, 0x07ff, 0x0800, 0x4e2d, 0xd7ff,
          0xe000, 0xfffd, 0xfffe, 0xffff).map(_.toChar)
    val bmp: Seq[String] = Seq("", "a", "ab", "b", "\u00e9", "\u00e9a", "\uffff") ++
      (0 until 400).map(_ => (0 until 1 + rng.nextInt(6)).map(_ =>
        pool(rng.nextInt(pool.length))).mkString)
    val v = ctx.create(bmp)
    val native = v.sortBy(identity[String]).collect()
    // an opaque Ordering forces the rdd.sortBy fallback (UTF-16 compareTo)
    val opaque: Ordering[String] = Ordering.by((s: String) => s)
    val fallback = v.sortBy(identity[String])(opaque, implicitly).collect()
    assert(native == fallback,
      "for BMP strings, UTF-8 binary order must equal UTF-16 code-unit order")

    // the documented divergence, pinned so it stays a KNOWN caveat: an
    // astral char (4-byte UTF-8, so binary-greater than U+FFFD\'s 3 bytes,
    // but a 0xD835 surrogate pair, code-unit-less than 0xFFFD, in UTF-16)
    // sorts AFTER U+FFFD on the native path and BEFORE it on the fallback
    val astralA = new String(Character.toChars(0x1D400)) // MATHEMATICAL BOLD CAPITAL A
    val replacement = "\ufffd"
    val a = ctx.create(Seq(astralA, replacement))
    assert(a.sortBy(identity[String]).collect() == Seq(replacement, astralA))
    assert(a.sortBy(identity[String])(opaque, implicitly).collect() ==
      Seq(astralA, replacement))
  }
}
