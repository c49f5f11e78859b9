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
    assert(r.getSeq[Long](2).length === 2)
  }

  test("decode_html_entities callable from SQL; pass order holds") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT decode_html_entities(
           'caf&eacute; &#8217;x&#8217; &#x27;y&#x27; &amp;lt; &unknown;') AS t""")
      .head().getString(0)
    assert(r === "café ’x’ 'y' &lt; &unknown;")
  }

  test("fp16 pack/unpack callable from SQL; round-trip is the RNE grid") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT fp16_unpack(fp16_pack(array(CAST(0.1 AS FLOAT),
                                            CAST(65504 AS FLOAT)))) AS h""").head()
    assert(r.getSeq[Double](0) === Seq(0.0999755859375, 65504.0))
  }

  test("text/hash expressions callable from SQL: shingles, jaccard, md5, rolling hash") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT word_shingles(array('a','b','c'), 2) AS ws,
                shingle_count(array('a','b','c'), 2) AS sc,
                array_jaccard(shingle_hashes(array('a','b','c'), 2),
                              shingle_hashes(array('a','b','d'), 2)) AS j,
                md5_lower64('graft|123') AS h,
                rolling_hash_min('abcdef', 3) AS rh""").head()
    assert(r.getSeq[String](0) === Seq("a b", "b c"))
    assert(r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0 / 3)   // {a b} shared of {a b, b c, b d}
    // value cross-checked against DuckDB md5_number_lower('graft|123')
    assert(r.getLong(3) === 7039385733986126920L)
    assert(r.getLong(4) > 0)
  }

  test("shingle_minhash SQL result matches the Kirsch-Mitzenmacher definition") {
    GraftExtensions.register(spark)
    // shingles of ['a','b','c'] with n=2: "a b", "b c"
    val mh = spark.sql("SELECT shingle_minhash(array('a','b','c'), 2, 3) AS mh")
      .head().getSeq[Long](0)
    val M = 2147483647L
    def hash(s: String, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      def le(off: Int): Long =
        (7 to 0 by -1).foldLeft(0L)((acc, b) => (acc << 8) | (d(off + b) & 0xffL))
      (java.lang.Long.remainderUnsigned(le(0), M) +
        i * java.lang.Long.remainderUnsigned(le(8), M)) % M
    }
    val expected = (0 until 3).map(i => Seq("a b", "b c").map(hash(_, i)).min)
    assert(mh === expected)
  }

  test("top_k_by_score usable as a SQL aggregate") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.7))
      .toDF("g", "id", "s").createOrReplaceTempView("scored")
    val rows = spark.sql(
      """SELECT g, nb.rnk, nb.id
         FROM (SELECT g, top_k_by_score(s, id, 2) AS topk FROM scored GROUP BY g),
         LATERAL explode(topk) AS t(nb)""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((1L, 1L, 11L), (1L, 2L, 12L)))
  }

  test("vector_sum_long usable as a SQL aggregate") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, Seq(1L, 2L)), (1L, Seq(3L, 4L)), (2L, Seq(7L, 7L)))
      .toDF("g", "v").createOrReplaceTempView("vecs")
    val rows = spark.sql(
      "SELECT g, vector_sum_long(v) AS s FROM vecs GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows === Map(1L -> Seq(4L, 6L), 2L -> Seq(7L, 7L)))
  }

  test("top_k_by_score coerces int scores and ids instead of crashing executors") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, 7, 30), (1, 8, 20)).toDF("g", "id", "s")
      .createOrReplaceTempView("scored_int")
    val rows = spark.sql(
      """SELECT nb.rnk, nb.id, nb.score
         FROM (SELECT g, top_k_by_score(s, id, 1) AS topk
               FROM scored_int GROUP BY g),
         LATERAL explode(topk) AS t(nb)""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows === Set((1L, 7L, 30.0)))
  }
}
