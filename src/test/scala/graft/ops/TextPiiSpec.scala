package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextPiiSpec extends SparkSpec {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t"))).head.getString(0)
  }

  test("emails, IPs and phones are redacted") {
    assert(redactOne("mail a.b_c%x@foo-bar.example.com now")
      == "mail <EMAIL> now")
    assert(redactOne("ip 10.1.255.7 and 192.168.0.1.")
      == "ip <IP> and <IP>.")
    assert(redactOne("call +1 555-123-4567 or (555) 123-4567 x")
      == "call <PHONE> or <PHONE> x")
  }

  test("ordering: an email's dotted domain is not counted as an IP") {
    import spark.implicits._
    // the email's domain embeds a dotted quad ("10.2.3.44.example.com");
    // because emails redact FIRST, that quad never reaches the IPv4
    // stage — only the bare host IP counts
    val row = Seq("from u1@10.2.3.44.example.com and host 10.9.9.9").toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head
    assert(row.getAs[Int]("n_email") == 1)
    assert(row.getAs[Int]("n_ipv4") == 1)
    assert(row.getAs[Int]("n_phone") == 0)
    // a bare-IP "domain" is NOT an email (the TLD must be alphabetic),
    // so it falls through to the IPv4 stage instead
    val row2 = Seq("from u1@10.2.3.44 x").toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head
    assert(row2.getAs[Int]("n_email") == 0)
    assert(row2.getAs[Int]("n_ipv4") == 1)
  }

  test("clean text is untouched and counts are zero") {
    import spark.implicits._
    val clean = "the quick brown fox at noon"
    assert(redactOne(clean) == clean)
    val row = Seq(clean).toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .head
    assert((0 until 3).forall(row.getInt(_) == 0))
  }
}
