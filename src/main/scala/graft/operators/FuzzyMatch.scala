package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{TextOps => T}

/** Approximate string matching over the corpus vocabulary — the typo /
  * spelling-variant miner (entity-resolution flavored: the same
  * machinery matches "labled"/"labeled" column values or near-identical
  * catalog names, the fuzzy half the reference's schema-drift monitor
  * (`/root/reference/Snowflake/snowflake_table_monitor.py:97-113`)
  * cannot see).
  *
  * Blocking is the SymSpell deletion-neighborhood scheme (public
  * algorithm, symspell; also the basis of DuckDB's fuzzy completion):
  * two terms are within Levenshtein distance 1 only if they share a
  * member of their {self} ∪ single-deletions key sets — substitution ⇒
  * both delete the differing position; insert/delete ⇒ the shorter term
  * IS a deletion of the longer. Sharing a key does NOT imply distance 1
  * (e.g. "ab"/"ba" share "a"), so candidates pass a residual
  * `levenshtein(a, b) = 1` filter — blocking guarantees RECALL, the
  * residual restores precision, and the pair set equals the brute-force
  * V² scan exactly (the oracle).
  *
  * Scale design: the corpus reduces to its top-V vocabulary in ONE
  * token-count aggregate (the q93 (count DESC, term ASC) total order,
  * localCheckpoint'd — V stat rows; the Dedup-CC precedent — so the
  * self-join does not re-run the corpus scan per side). Deletion keys
  * explode V rows to ≤ V·(L+1); the candidate join is key-equi with a
  * broadcast build side and fan-out bounded by Σ bucket² ≤ (V·(L+1))·V
  * in the worst case — corpus-size independent. `minLen` keeps keys ≥
  * 3 chars so short-word deletion buckets cannot blow up.
  */
object FuzzyMatch {

  /** Top-V vocabulary (terms of length ≥ minLen) with counts, under the
    * deterministic (count DESC, term ASC) total order.
    */
  private[operators] def topVocab(docs: DataFrame, vocabSize: Int,
      minLen: Int, textCol: String): DataFrame =
    graft.util.Parallelism.ensure(docs)
      .select(explode(T.tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= minLen)
      .groupBy("w").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(vocabSize)

  /** `{self} ∪ single-deletions` key set of a (non-empty) string
    * column, by name: deleting 1-based position i+1 is
    * `substr(w, 1, i) || substr(w, i+2)`.
    */
  private[operators] def deletionKeys(colName: String): Column =
    array_union(
      array(col(colName)),
      expr(s"transform(sequence(0, length($colName) - 1), " +
        s"i -> concat(substr($colName, 1, i), " +
        s"substr($colName, i + 2)))"))

  /** Two-relation fuzzy name match (entity resolution proper): every
    * (left name, right name) pair within Levenshtein distance ≤ 1 —
    * `(left_name, right_name, n_left, n_right, dist)` with occurrence
    * counts from each side, ordered. `includeExact=false` drops the
    * distance-0 (identical-name) matches.
    *
    * Scale design: each side reduces to its DISTINCT-name relation
    * first (names repeat; the candidate stage must run on the value
    * domain, not the row domain — the q113 histogram move), so the
    * deletion-key join fan-out is bounded by distinct-name bucket
    * occupancy, never row counts. Recall at distance ≤ 1 is guaranteed
    * by the same key-sharing argument as [[variantPairs]] (distance 0
    * shares the self key). Row-level linkage is the caller's follow-up
    * equi-join on the name columns.
    *
    * Length floor: names SHORTER THAN 2 CHARACTERS are excluded from
    * both sides (the [[topVocab]] `minLen` convention) — a
    * single-character name is within distance 1 of every character and
    * of the empty string, so its "matches" are noise that would fan out
    * against the whole alphabet. Pairs involving 1-char names (e.g.
    * "a" ~ "ab") are therefore deliberately NOT emitted; the q115
    * oracle applies the same floor.
    */
  def fuzzyJoinNames(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      includeExact: Boolean = true): DataFrame = {
    def names(df: DataFrame, c: String, nAlias: String) = df
      .select(col(c).as("w"))
      .where(col("w").isNotNull && length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).cast("long").as(nAlias))
    val a = names(left, leftCol, "n_left")
      .select(col("w").as("left_name"), col("n_left"),
        explode(deletionKeys("w")).as("k"))
    val b = names(right, rightCol, "n_right")
      .select(col("w").as("right_name"), col("n_right"),
        explode(deletionKeys("w")).as("k"))
    val minDist = if (includeExact) 0 else 1
    a.join(b, Seq("k"))
      .withColumn("dist",
        levenshtein(col("left_name"), col("right_name")))
      .where(col("dist") <= 1 && col("dist") >= minDist)
      .select("left_name", "right_name", "n_left", "n_right", "dist")
      .distinct() // a pair can share several deletion keys
      .orderBy("left_name", "right_name")
  }

  /** Vocabulary variant pairs within Levenshtein distance exactly 1:
    * `(term_a, term_b, n_a, n_b)` with `term_a < term_b`, ordered. The
    * lower-count side of a pair is the usual typo suspect; downstream
    * normalizers join this relation back onto the token stream.
    */
  def variantPairs(docs: DataFrame, vocabSize: Int, minLen: Int = 4,
      textCol: String = "text"): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val vocab = topVocab(docs, vocabSize, minLen, textCol)
      .localCheckpoint()
    val keyed = vocab.select(col("w"), col("n"),
      explode(deletionKeys("w")).as("k"))
    val a = keyed.select(col("w").as("term_a"), col("n").as("n_a"),
      col("k"))
    val b = keyed.select(col("w").as("term_b"), col("n").as("n_b"),
      col("k"))
    a.join(broadcast(b), Seq("k"))
      .where(col("term_a") < col("term_b") &&
        levenshtein(col("term_a"), col("term_b")) === 1)
      .select("term_a", "term_b", "n_a", "n_b")
      .distinct() // a pair can share several deletion keys
      .orderBy("term_a", "term_b")
  }
}
