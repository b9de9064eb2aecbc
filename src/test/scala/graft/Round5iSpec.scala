package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, FuzzyMatch}

/** Part-nine operator: SymSpell deletion-neighborhood variant mining.
  * The load-bearing property is EXACT equality with the brute-force V²
  * Levenshtein scan — blocking guarantees recall at distance 1, the
  * residual filter restores precision.
  */
class Round5iSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One doc per word occurrence, so token counts are the multiplicities. */
  private def corpus(words: (String, Int)*) =
    words.toSeq.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  /** Reference Levenshtein for the differentials. */
  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("variantPairs: substitution / insertion pairs found, dist-2 killed") {
    val docs = corpus(
      ("abcd", 3), ("abed", 2), // substitution, dist 1
      ("abcde", 1), // 'e' inserted vs abcd, dist 1
      ("axyd", 1), // two substitutions vs abcd, dist 2 — excluded
      ("bacd", 1), // transposition vs abcd: SHARES deletion keys, dist 2
      ("abc", 9)) // below minLen, never in vocab
    val got = FuzzyMatch.variantPairs(docs, vocabSize = 100, minLen = 4)
      .as[(String, String, Long, Long)].collect().toSeq
    // sanity on the fixture itself: bacd is a candidate the residual kills
    assert(levDist("abcd", "bacd") == 2)
    assert(got == Seq(
      ("abcd", "abcde", 3L, 1L),
      ("abcd", "abed", 3L, 2L)))
  }

  test("variantPairs ≡ brute force on an adversarial dense vocabulary") {
    // every length-4 and length-5 word over {a,b}: deletion buckets
    // collide maximally and transposition-like dist-2 pairs abound
    val all4 = (0 until 16).map(i =>
      (0 until 4).map(j => if (((i >> j) & 1) == 1) 'b' else 'a').mkString)
    val all5 = (0 until 32).map(i =>
      (0 until 5).map(j => if (((i >> j) & 1) == 1) 'b' else 'a').mkString)
    val vocabWords = (all4 ++ all5).distinct
    val docs = corpus(vocabWords.map(w => (w, 1)): _*)
    val got = FuzzyMatch.variantPairs(docs, vocabSize = 100, minLen = 4)
      .as[(String, String, Long, Long)].collect()
      .map(p => (p._1, p._2)).toSet
    val truth = (for {
      a <- vocabWords; b <- vocabWords
      if a < b && levDist(a, b) == 1
    } yield (a, b)).toSet
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
    // both substitution and indel pairs are exercised by the truth set
    assert(truth.exists { case (a, b) => a.length == b.length })
    assert(truth.exists { case (a, b) => a.length != b.length })
  }

  test("variantPairs: canonical order, no self pairs, vocab cut respected") {
    val docs = corpus(("aaaa", 5), ("aaab", 4), ("aabb", 3), ("abbb", 2))
    // vocabSize=2 keeps only {aaaa, aaab}: the aabb/abbb pairs vanish
    val got = FuzzyMatch.variantPairs(docs, vocabSize = 2, minLen = 4)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("aaaa", "aaab", 5L, 4L)))
  }

  test("q114 plan: candidate join is broadcast, corpus never re-scanned") {
    val df = SparkEntry.queries("q114_typo_variants")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // vocab is localCheckpoint'd: the self-join reads checkpointed stat
    // rows, not two fresh corpus lineages
    assert(!p.contains("Scan parquet"),
      s"variant join re-scanned the corpus:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"key join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"key join regressed:\n$p")
  }

  test("fuzzyJoinNames: exact + distance-1 links, counts carried, exact droppable") {
    val left = corpus(("abcd", 2), ("xxxx", 1))
      .withColumnRenamed("text", "name")
    val right = corpus(("abed", 1), ("abcd", 3), ("zzzz", 1))
      .withColumnRenamed("text", "name")
    val got = FuzzyMatch.fuzzyJoinNames(left, "name", right, "name")
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(
      ("abcd", "abcd", 2L, 3L, 0),
      ("abcd", "abed", 2L, 1L, 1)))
    val noExact = FuzzyMatch.fuzzyJoinNames(left, "name", right, "name",
      includeExact = false)
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(noExact == Seq(("abcd", "abed", 2L, 1L, 1)))
  }

  test("fuzzyJoinNames ≡ brute force across a dense two-relation split") {
    val all4 = (0 until 16).map(i =>
      (0 until 4).map(j => if (((i >> j) & 1) == 1) 'b' else 'a').mkString)
    val (l, r) = all4.partition(_.count(_ == 'b') % 2 == 0)
    val left = corpus(l.map((_, 1)): _*).withColumnRenamed("text", "name")
    val right = corpus(r.map((_, 1)): _*).withColumnRenamed("text", "name")
    val got = FuzzyMatch.fuzzyJoinNames(left, "name", right, "name")
      .as[(String, String, Long, Long, Int)].collect()
      .map(p => (p._1, p._2, p._5)).toSet
    val truth = (for {
      a <- l; b <- r; d = levDist(a, b) if d <= 1
    } yield (a, b, d)).toSet
    // the parity split means no exact matches and EVERY substitution
    // crosses sides — maximal stress on the shared-deletion-key recall
    assert(truth.nonEmpty && truth.forall(_._3 == 1))
    assert(got == truth, s"missing=${truth -- got} extra=${got -- truth}")
  }


  test("q115 plan: candidate stage runs on distinct names — two scans, no product") {
    val df = SparkEntry.queries("q115_fuzzy_join")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size == 2,
      s"expected one scan per side:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate stage regressed to a product join:\n$p")
    // name column + the parity filter key only — no wide reads
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string>"),
      s"scan reads more than the parity key and the name:\n$p")
  }

  // ------------------------------------------------------------------
  // BPE vocabulary induction
  // ------------------------------------------------------------------

  /** Sequential reference BPE (Sennrich): the ground truth the
    * distributed learner must reproduce exactly.
    */
  private def refBpe(words: Map[String, Long], nMerges: Int,
      marker: Boolean): Seq[(Int, String, String, Long)] = {
    def mergeSeq(s: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += s(i); i += 1 }
      }
      out.result()
    }
    var vocab: Map[Vector[String], Long] = words.toSeq.map { case (w, n) =>
      val chars = w.map(_.toString).toVector
      val syms = if (marker) chars.init :+ (chars.last + Bpe.Eow) else chars
      syms -> n
    }.groupMapReduce(_._1)(_._2)(_ + _)
    (1 to nMerges).flatMap { rank =>
      val pairs = vocab.toSeq.flatMap { case (s, n) =>
        s.sliding(2).collect { case Vector(a, b) => (a, b) -> n }
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairs.isEmpty) None
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        vocab = vocab.toSeq.map { case (s, n) => mergeSeq(s, l, r) -> n }
          .groupMapReduce(_._1)(_._2)(_ + _)
        Some((rank, l, r, c))
      }
    }
  }

  test("learnMerges: hand-derived merge sequence, markerless") {
    val docs = corpus(("aaab", 2), ("ab", 1))
    val got = Bpe.learnMerges(docs, 3, marker = false)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    // round 1: (a,a) weight 4 beats (a,b) 3; leftmost-greedy turns
    // aaab into [aa, a, b]; round 2: (a,b) 3 beats (aa,a) 2; round 3
    // only (aa, ab) remains
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 3L),
      (3, "aa", "ab", 2L)))
  }

  test("learnMerges: end-of-word marker keeps word-final symbols distinct") {
    val docs = corpus(("ab", 2), ("cb", 1))
    val got = Bpe.learnMerges(docs, 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a", s"b${Bpe.Eow}", 2L),
      (2, "c", s"b${Bpe.Eow}", 1L)))
  }

  test("learnMerges stops early when no pair remains") {
    val docs = corpus(("ab", 3))
    val got = Bpe.learnMerges(docs, 10, marker = false)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 3L))) // "ab" is one symbol after it
  }

  test("learnMerges ≡ sequential reference BPE on the fixture corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val words = Bpe.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refBpe(words, 6, marker = true)
    val got = Bpe.learnMerges(docs, 6)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(expect.size == 6 && got == expect)
  }

  test("segment: leftmost-greedy application incl. the overlap case") {
    val docs = corpus(("aaa", 1), ("aaab", 1), ("ba", 1))
    val got = Bpe.segment(docs, Seq(("a", "a"), ("a", "b")),
      marker = false)
      .as[(String, Long, Seq[String])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("aaa") == Seq("aa", "a")) // non-overlapping, leftmost
    assert(got("aaab") == Seq("aa", "ab")) // second merge applies after
    assert(got("ba") == Seq("b", "a")) // order matters: (b,a) unmerged
  }
}
