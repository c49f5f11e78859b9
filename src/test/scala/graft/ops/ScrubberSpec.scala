package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScrubberSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String) =
    Scrubber.scrub(Seq((0L, text)).toDF("doc_id", "text")).head()

  test("redacts every category, counts each replacement") {
    val r = scrubOne(
      "mail a@b.io and c.d+x@e-f.org, see https://x.y/z?a=1 or http://q.r " +
        "ids 123456789 and 98765432101234 but keep 12345678")
    assert(r.getAs[String]("clean_text") ===
      "mail <EMAIL> and <EMAIL>, see <URL> or <URL> ids <ID> and <ID> but keep 12345678")
    assert(r.getAs[Long]("n_urls") === 2)
    assert(r.getAs[Long]("n_emails") === 2)
    assert(r.getAs[Long]("n_ids") === 2)
  }

  test("clean text is untouched; counts are zero") {
    val r = scrubOne("just ordinary words with a short 1234 number")
    assert(r.getAs[String]("clean_text") ===
      "just ordinary words with a short 1234 number")
    assert(r.getAs[Long]("n_urls") + r.getAs[Long]("n_emails") + r.getAs[Long]("n_ids") === 0)
  }

  test("scrubbing is idempotent and order is URL-first") {
    // the URL contains both an @ and a long digit run: URL-first means
    // one <URL> token, no partial email/id redaction inside it
    val once = scrubOne("go https://u.v/p@w.xy/9999999999 now")
    assert(once.getAs[String]("clean_text") === "go <URL> now")
    assert(once.getAs[Long]("n_urls") === 1)
    assert(once.getAs[Long]("n_emails") === 0)
    assert(once.getAs[Long]("n_ids") === 0)
    val twice = Scrubber.scrub(
      Seq((0L, once.getAs[String]("clean_text"))).toDF("doc_id", "text")).head()
    assert(twice.getAs[String]("clean_text") === once.getAs[String]("clean_text"))
  }
}
