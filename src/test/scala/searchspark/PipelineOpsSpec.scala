package searchspark

import org.scalatest.funsuite.AnyFunSuite

import searchspark.ops.TextOps

/** PII scrub + decontamination behavior on crafted fixtures (the
  * testdata corpus contains no PII, so the driver query only pins
  * cross-engine pattern parity — this pins the semantics). */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("piiScrub redacts emails, urls, digit runs and counts per class") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+x@example.co.uk or call +1 (415) 555-0199 now"),
      (1L, "see https://example.com/a?b=c and http://foo.bar/baz too"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextOps.piiScrub(docs).collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.getString(4))).toSeq
    assert(out(0)._2 == 1 && out(0)._4 == 1, "one email + one digit run in doc 0")
    assert(out(1)._3 == 2, "two urls in doc 1")
    assert(out(2)._2 == 0 && out(2)._3 == 0 && out(2)._4 == 0)
    // the scrubbed hash equals the hash of the expected redacted string
    val expected0 = "contact <EMAIL> or call +<NUM> now" // leading + is outside the digit-run pattern
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expected0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0)._5 == md5, "redaction must produce the exact expected text")
  }

  test("decontaminate flags docs sharing a 3-gram with the eval set") {
    import spark.implicits._
    val docs = Seq(
      (0L, "clean document with its own words"),
      (1L, "prefix table scan merge suffix"), // contains an eval 3-gram
      (2L, "scan merge unrelated")).toDF("doc_id", "text")
    val out = TextOps.decontaminate(docs, TextOps.EvalFixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq((0L, 0L, false), (1L, 1L, true), (2L, 0L, false)))
  }
}
