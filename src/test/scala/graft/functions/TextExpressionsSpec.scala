package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftfns.TextFunctions

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a b c d e"),
    (1L, "a b c d e"),        // identical to 0
    (2L, "a  b   c d e"),     // extra spaces: same tokens
    (3L, "x y"),              // too short for n=3 → no shingles
    (4L, "a b c a b c a b c") // repeated shingles → distinct set is small
  ).toDF("doc_id", "text")

  test("stop_hits equals the four filter(array_contains) counts on edges and the corpus") {
    // The HOF formulation langId used before the kernel.
    def hofHits(words: Seq[String]) =
      size(filter(filter(split(lower(col("text")), " "), t => t =!= ""),
        t => array_contains(lit(words.toArray), t))).cast("long")
    val hof = array(hofHits(Text.StopEn), hofHits(Text.StopEs),
      hofHits(Text.StopFr), hofHits(Text.StopDe))
    val edges = Seq(
      "The the THE of",       // case folding, duplicates counted
      "el de la un es en",    // words shared across dictionaries hit each owner
      "",                     // empty text
      "the.",                 // punctuation disqualifies the token
      "x  y the",             // empty tokens between double spaces
      "that that4 thatx la",  // digit/5-letter variants must not match
      "und la\tde den",       // tab is a token byte, not a separator
      "DES Une dU"            // fr words in mixed case
    ).toDF("text")
    val both = edges.select(TextFunctions.stopHits(col("text")).as("k"), hof.as("h"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    for (((k, h), i) <- both.zipWithIndex) assert(k == h, s"edge row $i: kernel=$k hof=$h")
    // And on every real corpus document.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.stopHits(col("text")).as("k"), hof.as("h"))
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    assert(corpus.nonEmpty && corpus.forall { case (k, h) => k == h })
  }

  test("shingleHashes distinct-set sizes match the declarative string shingles") {
    val kernel = docs.select($"doc_id", size(TextFunctions.shingleHashes($"text", 3)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val strings = Dedup.shingles(docs, 3).groupBy($"id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt)).toMap
    // doc 3 emits no shingle rows in the exploded form; kernel reports 0.
    assert(kernel(3L) == 0 && !strings.contains(3L))
    for (id <- Seq(0L, 1L, 2L, 4L)) assert(kernel(id) == strings(id), s"doc $id")
    assert(kernel(4L) == 3) // "a b c", "b c a", "c a b"
  }

  test("shingleHashes: identical token streams hash identically, null → null") {
    val hs = docs.select($"doc_id", TextFunctions.shingleHashes($"text", 3).as("hs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(hs(0L) == hs(1L) && hs(0L) == hs(2L))
    val n = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(TextFunctions.shingleHashes($"text", 3)).head()
    assert(n.isNullAt(0))
  }

  test("minhashSignature: length k, permutation-invariant, empty in → empty out") {
    val sig = docs.select($"doc_id", TextFunctions.minhashSignature(
      TextFunctions.shingleHashes($"text", 3), 16).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(sig(0L).length == 16 && sig(0L) == sig(1L))
    assert(sig(3L).isEmpty)
    // Order of the underlying set must not matter: min over a set.
    val a = Seq((0L, "p q r s t")).toDF("doc_id", "text")
    val b = Seq((0L, "r s t p q")).toDF("doc_id", "text") // different shingles!
    val sa = a.select(TextFunctions.minhashSignature(TextFunctions.shingleHashes($"text", 1), 8))
      .head().getSeq[Long](0)
    val sb = b.select(TextFunctions.minhashSignature(TextFunctions.shingleHashes($"text", 1), 8))
      .head().getSeq[Long](0)
    assert(sa == sb) // 1-gram sets are equal, so signatures must be
  }

  test("simhash64: deterministic, identical docs equal, one-word change is near") {
    val s = docs.select($"doc_id", TextFunctions.simhash64($"text").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(s(0L) == s(1L))
    val pair = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
      .select(TextFunctions.simhash64($"text")).collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(pair(0) ^ pair(1)) <= 24)
  }

  test("minhash min-stability: sig(A ∪ B) = elementwise min(sig(A), sig(B))") {
    // THE property that makes minhash estimate Jaccard: the signature of a
    // union is the elementwise min of signatures. Random fixed-seed corpora.
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 8) {
      val a = Seq.fill(rnd.between(1, 40))(rnd.between(0, 30)).map(i => s"w$i").mkString(" ")
      val b = Seq.fill(rnd.between(1, 40))(rnd.between(0, 30)).map(i => s"w$i").mkString(" ")
      val rows = Seq((0L, a), (1L, b), (2L, a + " " + b)) // 2 = union at n=1
        .toDF("doc_id", "text")
        .select($"doc_id", TextFunctions.minhashSignature(
          TextFunctions.shingleHashes($"text", 1), 12).as("sig"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      val expect = rows(0L).zip(rows(1L)).map { case (x, y) => math.min(x, y) }
      assert(rows(2L) == expect)
    }
  }

  test("bpeRunCount equals the regex formulation on edge cases and the corpus") {
    val cases = Seq(
      "", " ", "   \t\n\f\r", "hello", "Hello, world42! a-b",
      "a1b2c3", "...!!!", "MiXeD CaSe 123abc", "x" * 500,
      "tabs\tand\nnewlines\rhere", "42", "a", "ünïcödé stays öther runs",
      "end with space ", " start", "a  b   c    d"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = cases.select(
      $"doc_id",
      TextFunctions.bpeRunCount($"text").as("kernel"),
      size(Text.bpeTokens($"text")).cast("long").as("regex"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((id, k, re) <- both) assert(k == re, s"case $id: kernel=$k regex=$re")
    // And across the full sf0.001 corpus — the production parity check.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = corpus.select(
      (TextFunctions.bpeRunCount($"text") =!=
        size(Text.bpeTokens($"text")).cast("long")).as("d"))
      .filter($"d").count()
    assert(diff == 0L)
    // null in → null out
    val n = Seq((0L, null: String)).toDF("doc_id", "text")
      .select(TextFunctions.bpeRunCount($"text")).head()
    assert(n.isNullAt(0))
  }

  test("termCounts equals the explode/groupBy tf derivation on edges and the corpus") {
    def viaKernel(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", explode(TextFunctions.termCounts($"text")).as("tc"))
      .select($"doc_id", $"tc.term", $"tc.tf")
    def viaGroupBy(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", explode(Text.tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val edges = Seq(
      (0L, "a b a c a b"),   // repeats at different multiplicities
      (1L, ""),              // empty → no rows
      (2L, "  x   x  "),     // separator runs, duplicate-only doc
      (3L, "solo")           // single token
    ).toDF("doc_id", "text")
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(setOf(viaKernel(edges)) == setOf(viaGroupBy(edges)))
    // First-occurrence order within a document is deterministic.
    val ordered = edges.filter($"doc_id" === 0L)
      .select(TextFunctions.termCounts($"text").as("tc"))
      .selectExpr("transform(tc, x -> x.term) AS terms").head().getSeq[String](0)
    assert(ordered == Seq("a", "b", "c"))
    // And on the real corpus.
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(setOf(viaKernel(corpus)) == setOf(viaGroupBy(corpus)))
  }

  test("dot_product: NULL on length mismatch, matching the zip_with HOF") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val kernel = df.select(
      org.apache.spark.sql.graftfns.VectorFunctions.dot($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), _ + _)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // A truncated partial sum over min(len) would be a plausible-looking
    // WRONG similarity for mixed-dimension corpora.
    assert(kernel.toSeq == hof.toSeq && kernel.toSeq == Seq(None, Some(11.0)))
  }

  test("wordGrams kernel equals the declarative transform/slice/concat_ws chain") {
    import org.apache.spark.sql.Column
    // The formulation the kernel replaced, kept here as the reference.
    def declarative(text: Column, n: Int): Column = {
      val toks = filter(split(text, " "), t => t =!= "")
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    val edge = Seq(
      "", " ", "x", "a b", "a  b   c", "  lead and trail  ",
      "héllo wörld héllo wörld", "a b c a b c", "one"
    ).zipWithIndex.map(_.swap).toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val kernel = edge.select($"id", TextFunctions.wordGrams($"text", n).as("g"))
        .collect().map(r => (r.getInt(0), r.getSeq[String](1))).toMap
      val ref = edge.select($"id", declarative($"text", n).as("g"))
        .collect().map(r => (r.getInt(0), r.getSeq[String](1))).toMap
      assert(kernel == ref, s"n=$n")
    }
    // Duplicates preserved in order — the counting contract.
    val g = edge.filter($"text" === "a b c a b c")
      .select(TextFunctions.wordGrams($"text", 2)).head().getSeq[String](0)
    assert(g == Seq("a b", "b c", "c a", "a b", "b c"))
  }

  test("intersectCountSorted equals size(array_intersect) on sorted distinct arrays") {
    // Edges: empty vs empty, empty vs non-empty, disjoint, identical,
    // partial overlap, negative hashes (signed long order ≡ sort order).
    val rows = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(-5L, 1L, 7L), Seq(2L, 3L, 9L)),
      (Seq(-5L, 1L, 7L), Seq(-5L, 1L, 7L)),
      (Seq(-9L, -5L, 0L, 3L, 8L), Seq(-5L, 3L, 4L, 8L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
    ).toDF("a", "b")
    val both = rows.select(
      TextFunctions.intersectCountSorted($"a", $"b").as("k"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (((k, ref), i) <- both.zipWithIndex) assert(k == ref, s"row $i: kernel=$k ref=$ref")
    // And on real corpus shingle sets: every document pair of a sample.
    val hs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(30)
      .select($"doc_id".as("id"), array_sort(TextFunctions.shingleHashes($"text", 3)).as("hs"))
    val pairs = hs.as("x").crossJoin(hs.as("y")).filter($"x.id" < $"y.id")
      .select(
        TextFunctions.intersectCountSorted($"x.hs", $"y.hs").as("k"),
        size(array_intersect($"x.hs", $"y.hs")).cast("long").as("ref"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty && pairs.forall { case (k, ref) => k == ref })
  }

  test("kernels work through SQL registration and the session extension path") {
    org.apache.spark.sql.graftfns.VectorFunctions.register(spark)
    docs.createOrReplaceTempView("texpr_docs")
    val n = spark.sql(
      "SELECT size(shingle_hashes(text, 3)) FROM texpr_docs WHERE doc_id = 0").head().getInt(0)
    assert(n == 3)
    val sh = spark.sql("SELECT simhash64(text) FROM texpr_docs WHERE doc_id = 0").head().getLong(0)
    assert(sh != 0L)
    val nb = spark.sql("SELECT bpe_run_count(text) FROM texpr_docs WHERE doc_id = 0").head().getLong(0)
    assert(nb == 5L) // "a b c d e"
  }
}
