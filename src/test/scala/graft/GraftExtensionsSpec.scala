package graft

class GraftExtensionsSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                shingle_minhash(array('a', 'b', 'c'), 2, 2) AS mh""").head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 11.0)
    assert(r.getSeq[String](2).length === 2)
  }

  test("shingle_minhash SQL result matches the salted-md5 definition") {
    GraftExtensions.register(spark)
    // shingles of ['a','b','c'] with n=2: "a b", "b c"
    val mh = spark.sql("SELECT shingle_minhash(array('a','b','c'), 2, 1) AS mh")
      .head().getSeq[String](0)
    val expected = Seq("0|a b", "0|b c").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.min
    assert(mh.head === expected)
  }
}
