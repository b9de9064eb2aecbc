package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions.col

import graft.operators.{Bpe, FuzzyMatch}

/** Round-5 additions, part nine — approximate string matching:
  *
  *  - q114 vocabulary typo/variant pairs at Levenshtein distance 1,
  *    SymSpell deletion-neighborhood blocking + residual exact filter
  *
  * Oracle = the brute-force V² levenshtein scan over the SAME top-V
  * vocabulary CTE (the q93 (count DESC, term ASC) total order) — the
  * blocking guarantees recall at distance 1, so the pair sets are
  * identical, not approximately so.
  */
object Round5iQueries {

  /** q114 runs over ENTITY LABELS (customer.c_name), the classic
    * entity-resolution input: the fixture's documents vocabulary is a
    * small pinned word list with zero distance-1 pairs at any cut, but
    * entity names ("Customer#000000421") are digit-substitution rich —
    * 2,980 pairs bind at sf0.01 under V=300. The length floor keeps
    * deletion keys ≥ 3 chars.
    */
  val VariantVocabV = 300
  val VariantMinLen = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q114_typo_variants" -> ((s, dir) =>
      FuzzyMatch.variantPairs(Tables.load(s, dir, "customer"),
        VariantVocabV, VariantMinLen, textCol = "c_name")),

    // q115: two-relation fuzzy entity match — link the even-custkey
    // half of the customer file against the odd half by name at
    // Levenshtein distance <= 1 (the dirty-file-vs-master-file shape;
    // the parity split makes every match non-exact: 3,750 digit-
    // substitution pairs bind at sf0.01)
    "q115_fuzzy_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      FuzzyMatch.fuzzyJoinNames(
        c.where(col("c_custkey") % 2 === 0), "c_name",
        c.where(col("c_custkey") % 2 === 1), "c_name")
    }),

    // q116: BPE tokenizer training, round-1 pair census — the
    // oracle-checkable stage of the learner (markerless so the SQL
    // mirror stays a plain substr pair explode)
    "q116_bpe_pairs" -> ((s, dir) =>
      Bpe.firstPairCounts(Tables.load(s, dir, "documents"), BpePairsTopN)),

    // q117: the learned merge table itself. The argmax-per-round loop
    // IS SQL-expressible without recursion because the merge budget is
    // a fixed constant: the oracle unrolls BpeMerges CTE stages (see
    // bpeMergesOracle). Round5iSpec additionally proves the learner
    // equal to a sequential reference implementation.
    "q117_bpe_merges" -> ((s, dir) =>
      Bpe.learnMerges(Tables.load(s, dir, "documents"), BpeMerges)))

  /** q116 census cut (binds below the fixture's distinct pair count). */
  val BpePairsTopN = 40

  /** q117 merge budget. */
  val BpeMerges = 8

  /** q117 oracle: the merge loop UNROLLED into [[BpeMerges]] plain CTE
    * stages (no recursion — recursive CTEs cannot aggregate over the
    * recursive relation, but a FIXED merge budget needs no recursion).
    *
    * Representation: each word's symbol sequence is the string
    * `' s1  s2  ...  sk '` — every symbol owns a leading and trailing
    * space, so adjacent symbols are separated by exactly two spaces and
    * a substring match of `' l  r '` can only align with a
    * token-adjacent (l, r) pair (symbols never contain spaces). SQL
    * `replace()`'s left-to-right non-overlapping input scan is then
    * EXACTLY the leftmost-greedy merge fold the Scala side runs
    * ("a a a a" under (a,a) → [aa, aa], "a a a" → [aa, a]). Each stage:
    * pair census off the split strings → 1-row argmax under the same
    * (count DESC, left, right) total order → replace-rewrite.
    */
  private def bpeMergesOracle: String = {
    val stages = (1 to BpeMerges).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS (SELECT t[i] AS l, t[i + 1] AS r,
         |    CAST(sum(n) AS BIGINT) AS c
         |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), '  ')
         |      AS t, n FROM $prev),
         |    unnest(range(1, len(t))) AS u(i)
         |  GROUP BY 1, 2),
         |m$k AS (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
         |v$k AS (SELECT replace(s, ' ' || l || '  ' || r || ' ',
         |    ' ' || l || r || ' ') AS s, n FROM $prev, m$k)""".stripMargin
    }.mkString(",\n")
    val finals = (1 to BpeMerges).map { k =>
      if (k == 1)
        """SELECT CAST(1 AS INTEGER) AS "rank", l AS "left",
          |  r AS "right", c AS n_pair FROM m1""".stripMargin
      else s"UNION ALL SELECT $k, l, r, c FROM m$k"
    }.mkString("\n")
    s"""WITH wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(${LlmQueries.tokSql}) AS w FROM documents)
       |  GROUP BY 1),
       |v0 AS (SELECT ' ' || array_to_string(list_append(
       |      cs[1:len(cs) - 1], cs[-1] || '</w>'), '  ') || ' ' AS s, n
       |  FROM (SELECT string_split(w, '') AS cs, n FROM wc)),
       |$stages
       |SELECT * FROM ($finals) ORDER BY "rank"""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q117_bpe_merges" -> bpeMergesOracle,
    "q114_typo_variants" ->
      s"""WITH tk AS (SELECT
         |    unnest(regexp_extract_all(lower(c_name), '[a-z0-9]+')) AS w
         |  FROM customer),
         |v AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tk
         |  WHERE length(w) >= $VariantMinLen
         |  GROUP BY w ORDER BY n DESC, w ASC LIMIT $VariantVocabV)
         |SELECT a.w AS term_a, b.w AS term_b, a.n AS n_a, b.n AS n_b
         |FROM v a JOIN v b
         |  ON a.w < b.w AND levenshtein(a.w, b.w) = 1
         |ORDER BY term_a, term_b""".stripMargin,

    "q115_fuzzy_join" ->
      """WITH a AS (SELECT c_name AS w, CAST(count(*) AS BIGINT) AS n
         |  FROM customer WHERE c_custkey % 2 = 0 AND c_name IS NOT NULL
         |    AND length(c_name) >= 2 GROUP BY 1),
         |b AS (SELECT c_name AS w, CAST(count(*) AS BIGINT) AS n
         |  FROM customer WHERE c_custkey % 2 = 1 AND c_name IS NOT NULL
         |    AND length(c_name) >= 2 GROUP BY 1)
         |SELECT a.w AS left_name, b.w AS right_name,
         |  a.n AS n_left, b.n AS n_right,
         |  CAST(levenshtein(a.w, b.w) AS INTEGER) AS dist
         |FROM a, b WHERE levenshtein(a.w, b.w) <= 1
         |ORDER BY left_name, right_name""".stripMargin,

    "q116_bpe_pairs" ->
      s"""WITH tk AS (SELECT unnest(${LlmQueries.tokSql}) AS w
         |  FROM documents),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tk
         |  GROUP BY 1),
         |p AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS l,
         |    substr(w, CAST(i AS INTEGER) + 1, 1) AS r, n
         |  FROM wc, unnest(range(1, length(w))) AS t(i))
         |SELECT l AS "left", r AS "right",
         |  CAST(sum(n) AS BIGINT) AS n_pair
         |FROM p GROUP BY 1, 2
         |ORDER BY n_pair DESC, l, r LIMIT $BpePairsTopN""".stripMargin)
}
