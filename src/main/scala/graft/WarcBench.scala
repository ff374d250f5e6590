package graft

import graft.sources.Warc

import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** WARC ingest scale-stress: synthesizes S segments × R records of
  * per-record-gzipped HTTP responses (the Common Crawl layout), then
  * measures cold ingest throughput — records/s and payload MB/s — through
  * `Warc.read` (binaryFile, one task per segment, streaming record
  * iterator) and through the extraction composition (`toDoc` → title).
  * The interesting curve: throughput should RISE with record count as
  * per-task fixed costs amortize, exactly like CrawlBench's pages/s.
  *
  * `GRAFT_WARC_SEGMENTS=32 GRAFT_WARC_RECORDS=2000 sbt "runMain graft.WarcBench"`
  */
object WarcBench {

  def main(args: Array[String]): Unit = {
    val segments = sys.env.getOrElse("GRAFT_WARC_SEGMENTS", "32").toInt
    val perSeg = sys.env.getOrElse("GRAFT_WARC_RECORDS", "2000").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dirPath = Paths.get("target", "warcbench", s"$segments-$perSeg").toAbsolutePath
    Files.createDirectories(dirPath)
    val dir = dirPath.toString
    val nSeg = segments

    // synthesize distributed: one task per segment, ~1.5 KB page per record
    spark.range(nSeg).foreachPartition { (segs: Iterator[java.lang.Long]) =>
      segs.foreach { segL =>
        val seg = segL.toLong
        val f = Paths.get(dir, f"seg_$seg%05d.warc.gz")
        if (!Files.exists(f)) {
          val out = new java.io.BufferedOutputStream(Files.newOutputStream(f), 1 << 16)
          var r = 0
          while (r < perSeg) {
            val id = seg * perSeg + r
            val body = (s"<html><head><title>doc $id</title></head><body><p>" +
              (s"filler$id " * 100) + "</p></body></html>")
              .getBytes(StandardCharsets.UTF_8)
            out.write(Warc.gzMember(Warc.writeRecord("response",
              Seq("WARC-Target-URI" -> s"http://bench.test/doc/$id",
                "WARC-Date" -> "2026-01-01T00:00:00Z",
                "Content-Type" -> "application/http; msgtype=response"),
              Warc.httpResponse(200, "text/html; charset=utf-8", body))))
            r += 1
          }
          out.close()
        }
      }
    }
    val onDiskMb = Files.list(dirPath).mapToLong(Files.size(_)).sum / 1e6

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      val s = (System.nanoTime() - t0) / 1e9
      val n = segments.toLong * perSeg
      println(f"$what%-22s $s%7.2f s   ${n / s}%9.0f rec/s   ${onDiskMb / s}%7.1f gz-MB/s")
      a
    }

    println(s"WarcBench: $segments segments x $perSeg records, ${onDiskMb.round} MB gz on disk")
    val parsed = timed("parse (metadata)") {
      Warc.read(spark, dir).select("url", "http_status").filter("http_status = 200").count()
    }
    require(parsed == segments.toLong * perSeg, s"parsed $parsed")
    val extracted = timed("parse + extract") {
      Warc.read(spark, dir)
        .map(r => Warc.toDoc(r).root.findOnly("title").text)
        .filter(_.nonEmpty).count()
    }
    require(extracted == segments.toLong * perSeg, s"extracted $extracted")
    spark.stop()
  }
}
