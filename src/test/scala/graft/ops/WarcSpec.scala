package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** WARC record walk vs the minimal writer — gzip member handling,
  * Content-Length framing, HTTP envelope split, totality. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("parseAll round-trips buildFile: warcinfo + responses, gzipped " +
    "(member per record) and plain, bodies byte-exact") {
    val docs = Seq(
      ("https://a.example/1", "id-1", "hello warc world"),
      ("https://a.example/2", "id-2", ""),
      ("https://b.example/3", "id-3", "body with\r\n\r\nCRLF pairs inside"))
    for (gz <- Seq(true, false)) {
      val recs = Warc.parseAll(Warc.buildFile(docs, gzip = gz))
      assert(recs.length == 4)
      assert(recs.head.warcType == "warcinfo")
      assert(recs.head.body.length == 33)
      val rs = recs.tail
      assert(rs.map(_.warcType).forall(_ == "response"))
      assert(rs.map(_.targetUri) == docs.map(_._1))
      assert(rs.map(_.httpStatus).forall(_ == 200))
      assert(rs.map(_.bodyText) == docs.map(_._3), s"gzip=$gz")
      // content_length covers the HTTP envelope: 62 + digits + entity
      rs.zip(docs).foreach { case (r, (_, _, t)) =>
        val n = t.getBytes("UTF-8").length
        assert(r.contentLength == 62 + n.toString.length + n)
      }
    }
  }

  test("truncated files, garbage, and non-WARC bytes parse to the " +
    "records that fit and never throw") {
    val full = Warc.buildFile(Seq(("u", "i", "x" * 100)), gzip = false)
    assert(Warc.parseAll(full).length == 2)
    // cut inside the response body: only warcinfo survives
    val cut = full.take(full.length - 60)
    assert(Warc.parseAll(cut).length == 1)
    assert(Warc.parseAll("HTTP/1.1 200 OK\r\n\r\nnot warc".getBytes).isEmpty)
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll(null).isEmpty)
    // a corrupt gzip stream must not throw either
    val gzFull = Warc.buildFile(Seq(("u", "i", "y" * 50)))
    assert(scala.util.Try(Warc.parseAll(gzFull.take(20))).isSuccess)
  }

  test("warcBuildFiles -> warcRecordsColumn Spark round-trip: every " +
    "doc comes back as a response row with its exact text") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map { i =>
      (i, s"src${i % 3}", i % 4, s"https://ex.com/$i", s"text of doc $i " * (i % 5 + 1).toInt)
    }.toDF("doc_id", "source", "shard", "uri", "text")
    val files = Multimodal.warcBuildFiles(df, Seq("source", "shard"),
      "uri", "doc_id", "text")
    assert(files.count() == df.select("source", "shard").distinct.count())
    val recs = Multimodal.warcRecordsColumn(files, "media")
    val resp = recs.where($"warc_type" === "response")
      .select("uri", "body_text").as[(String, String)].collect().toMap
    val expect = df.select("uri", "text").as[(String, String)]
      .collect().toMap
    assert(resp == expect)
    val nInfo = recs.where($"warc_type" === "warcinfo").count()
    assert(nInfo == files.count())
  }

  test("revisit records: digest-identical payloads resolve through " +
    "the reference, dangling digests surface null, storage shrinks") {
    // high-entropy body: an internally-repetitive page would gzip to
    // nothing on its own and hide the revisit layout's storage win
    val rnd = new scala.util.Random(7)
    val text = Seq.fill(120)(rnd.alphanumeric.take(5).mkString)
      .mkString(" ")
    val f = Warc.buildFileRevisit(Seq(
      ("https://x/a", "1", text, None),
      ("https://x/a?v2", "2", text, Some("1")),
      ("https://x/b", "3", "other body", None),
      // dangling: digest of a never-captured payload
      ("https://x/c?v2", "4", "never captured", Some("9"))))
    val rs = Warc.parseAll(f).filter(_.warcType != "warcinfo")
    assert(rs.map(_.warcType) ==
      List("response", "revisit", "response", "revisit"))
    val byId = rs.map(r => r.recordId -> r).toMap
    // revisit 2 carries the SAME digest as response 1 and no payload
    assert(byId("<urn:uuid:2>").payloadDigest ==
      byId("<urn:uuid:1>").payloadDigest)
    assert(byId("<urn:uuid:2>").body.isEmpty)
    assert(byId("<urn:uuid:2>").refersTo == "<urn:uuid:1>")
    // the revisit layout genuinely stores less than re-capturing
    val full = Warc.buildFile(Seq(
      ("https://x/a", "1", text), ("https://x/a?v2", "2", text),
      ("https://x/b", "3", "other body"),
      ("https://x/c?v2", "4", "never captured")))
    assert(f.length < full.length)
    // dangling digest does not match any response
    assert(!rs.exists(r => r.warcType == "response" &&
      r.payloadDigest == byId("<urn:uuid:4>").payloadDigest))
  }
}
