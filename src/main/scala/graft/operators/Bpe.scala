package graft.operators

import graft.{Q, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — the REAL merge-based tokenizer (Sennrich et
  * al. 2016, arXiv:1508.07909), replacing the t-series' "BPE-ish
  * regex" approximation with the actual algorithm: train a ranked
  * merge table from corpus word frequencies, then tokenize by applying
  * merges in rank order. Training-data pipelines live on this op —
  * token budgets (sp10's packing input), per-doc token counts, and
  * vocabulary construction are all downstream of a real BPE.
  *
  * The symbol representation is the whole trick. A word's symbol
  * sequence is one STRING with each symbol wrapped in sentinel bytes:
  * "\u001E l \u001F \u001E o \u001F \u001E w \u001F" (sentinels
  * shown spaced) for "low". One merge
  * (a,b) is then a plain `replace` of `⟨a⟩⟨b⟩` with `⟨ab⟩` —
  * and because SQL `replace` substitutes non-overlapping occurrences
  * LEFT-TO-RIGHT, one call IS the greedy single-merge pass BPE
  * specifies ("aaaa" under (a,a) → "aa","aa"; "aaa" → "aa","a").
  * The sentinels make symbol boundaries unambiguous (no substring of
  * a longer symbol can match), and the SAME rendering runs in DuckDB
  * (`replace` there is also left-to-right non-overlapping — verified
  * by the t21 oracle hash), so ENCODING is cross-engine checkable
  * even though it is 20 chained folds deep.
  *
  * Scale shape:
  *  - TRAINING never touches the corpus after one aggregation: it
  *    runs on the WORD-FREQUENCY table (distinct words + counts —
  *    Zipf-bounded, further capped to the `maxWords` most frequent),
  *    re-checkpointed per round so each of the `nMerges` rounds is
  *    one bounded groupBy + a 1-row collect. The merge table itself
  *    is tiny (`nMerges` rows) forever.
  *  - ENCODING is one map-side projection: wrap → `nMerges` chained
  *    codegen'd `replace`s → unwrap. No shuffle, no UDF, no state.
  *    That expression chain is the right form for bounded merge
  *    tables (hundreds); a production 50k-merge vocabulary instead
  *    uses [[encodeLarge]] — same semantics via per-partition rank
  *    iteration with a word memo-cache (Zipf makes the hit rate
  *    ~100%), asserted equal to the expression form in BpeSpec.
  */
object Bpe {

  private val Open = "\u001E"
  private val Close = "\u001F"
  /** End-of-word symbol (classic Sennrich): lets merges capture
    * word-final context ("w</w>" ≠ "w") and makes detokenization
    * unambiguous. */
  val EndMark = "</w>"

  private def wrapped(a: String): String = Open + a + Close

  /** One word → its wrapped initial symbol string (chars + EndMark).
    * Words containing the sentinel bytes themselves are not
    * representable; every tokenization lane (training AND encode)
    * strips the sentinels from the text first (never seen in real
    * text, but a hostile byte must not corrupt symbol boundaries). */
  def wrapWord(w: Column): Column =
    concat(regexp_replace(w, "(.)", Open + "$1" + Close),
      lit(wrapped(EndMark)))

  /** Wrapped symbol string → array of symbols. */
  def symbols(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2),
      java.util.regex.Pattern.quote(Close + Open))

  /** One BPE merge applied greedily left-to-right — see the scaladoc:
    * `replace`'s non-overlap scan is exactly the specified pass. */
  def applyMerge(s: Column, a: String, b: String): Column =
    replace(s, lit(wrapped(a) + wrapped(b)), lit(wrapped(a + b)))

  /** The shared tokenization lane: sentinel bytes stripped (so a
    * hostile / cannot fabricate a symbol boundary), then
    * lowercased whitespace words. Training, [[encode]] and
    * [[encodeLarge]] all tokenize through here so they agree on every
    * input, hostile or not. */
  private def cleanTokens(text: Column): Column =
    TextAnalysis.tokens(translate(lower(text), Open + Close, ""))

  /** (word, n) frequency table the trainer runs on: lowercased
    * whitespace words (sentinel bytes stripped), capped to the
    * `maxWords` most frequent (n DESC, word ASC — deterministic). */
  def wordFreqs(docs: DataFrame, maxWords: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(explode(cleanTokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxWords)

  /** Adjacent symbol pairs of each word, weighted by the word's
    * frequency — the per-round statistic. */
  private def pairCounts(words: DataFrame): DataFrame = {
    val sym = symbols(col("w"))
    words
      .select(col("n"), explode(arrays_zip(
        slice(sym, lit(1), size(sym) - 1),
        slice(sym, lit(2), size(sym) - 1))).as("p"))
      .select(col("p.0").as("a"), col("p.1").as("b"), col("n"))
      .groupBy("a", "b").agg(sum("n").as("c"))
  }

  /** Train `nMerges` ranked merges from the corpus: per round, count
    * adjacent pairs over the (re-checkpointed, bounded) word table,
    * pick the most frequent (c DESC, a ASC, b ASC — fully
    * deterministic), fold it into every word, repeat. Stops early
    * when no pair remains. Driver work per round: one 1-row collect. */
  def train(docs: DataFrame, nMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    var words = wordFreqs(docs, maxWords)
      .select(wrapWord(col("word")).as("w"), col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val prev = words
        words = words.select(applyMerge(col("w"), a, b).as("w"), col("n"))
          .localCheckpoint()
        prev.unpersist()
      }
      i += 1
    }
    merges.result()
  }

  /** Whole-document encode as ONE string expression: wrap every
    * word, join with spaces (a space between wraps blocks cross-word
    * merges by construction), chain the merges, unwrap. Returns the
    * space-joined subword sequence. */
  def subwordsExpr(text: Column, merges: Seq[(String, String)]): Column = {
    val doc0 = array_join(
      transform(TextAnalysis.tokens(lower(text)), wrapWord(_)), " ")
    val merged = merges.foldLeft(doc0) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }
    // ⟨x⟩⟨y⟩ → "x y": intra-word boundaries become spaces like the
    // inter-word ones, then the outer sentinels drop
    translate(regexp_replace(merged,
      java.util.regex.Pattern.quote(Close + Open), " "), Open + Close, "")
  }

  /** Per-doc BPE tokenization: (doc_id, n_subwords, subwords). */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sub = subwordsExpr(col("text"), merges)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        (size(split(sub, " "))).cast("long").as("n_subwords"),
        sub.as("subwords"))
  }

  /** The production-vocabulary encoder: same semantics as
    * [[encode]], but merges apply per WORD in rank order inside
    * `mapPartitions` — a 50k-merge table cannot be a 50k-deep
    * expression chain. The broadcast-size merge list rides the
    * closure; a per-partition word→subwords memo-cache (bounded)
    * makes the Zipf-heavy common case one lookup. */
  def encodeLarge(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("text"))).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val cache = new java.util.HashMap[String, Seq[String]]()
        it.map { case (id, ws) =>
          val subs = ws.iterator.flatMap { w =>
            var hit = cache.get(w)
            if (hit == null) {
              hit = encodeWord(w, ms)
              if (cache.size < 200000) cache.put(w, hit)
            }
            hit
          }.toSeq
          (id, subs.size.toLong, subs.mkString(" "))
        }
      }
      .toDF("doc_id", "n_subwords", "subwords")
  }

  /** Reference single-word encode: chars + EndMark, then each merge
    * in RANK order applied greedily left-to-right (equivalent to the
    * lowest-rank-present priority form — a merge is only ever enabled
    * by EARLIER-rank merges, so one ordered pass settles the word). */
  private[operators] def encodeWord(w: String,
      merges: Array[(String, String)]): Seq[String] = {
    var sym = (w.map(_.toString) :+ EndMark).toArray
    merges.foreach { case (a, b) =>
      if (sym.length > 1) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < sym.length) {
          if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
            out += (a + b); i += 2 // greedy: consume both, scan on
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
    }
    sym.toIndexedSeq
  }

  // ── fixed published-vocabulary merges for the oracle-checked encode
  // (t21): data-INdependent literals, like shipping GPT-2's frozen
  // merges.txt — training itself is t20's job. Ordered so later
  // merges compose earlier ones (table ← t+a+b+l+e ← chars).
  val fixedMerges: Seq[(String, String)] = Seq(
    ("a", EndMark), ("t", "a"), ("ta", "b"), ("tab", "l"),
    ("tabl", "e"), ("table", EndMark), ("r", "o"), ("ro", "w"),
    ("row", EndMark), ("j", "o"), ("jo", "i"), ("joi", "n"),
    ("join", EndMark), ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("scan", EndMark), ("e", "r"), ("s", "t"), ("h", "a"))

  /** DuckDB rendering of [[subwordsExpr]] under [[fixedMerges]] —
    * the same wrap → replace-chain → unwrap, `chr(30)/chr(31)`
    * sentinels, so both engines compute identical subword strings. */
  def encodeOracleSql(merges: Seq[(String, String)]): String = {
    // NB: the outer template below is ALSO stripMargin'd, so no line
    // of this inner fragment may BEGIN with `|` — a leading `||`
    // concat would lose a pipe to the second stripping pass
    def lit(s: String) = s.replace("'", "''")
    def wrapSql(s: String) = s"chr(30)||'${lit(s)}'||chr(31)"
    val doc0 =
      """array_to_string(list_transform(
        |    regexp_split_to_array(trim(lower(text)), '\s+'),
        |    w -> regexp_replace(w, '(.)', chr(30)||'\1'||chr(31), 'g') ||
        |    chr(30)||'</w>'||chr(31)), ' ')""".stripMargin
    val chained = merges.foldLeft(doc0) { case (s, (a, b)) =>
      s"replace($s,\n  ${wrapSql(a)}||${wrapSql(b)}, ${wrapSql(a + b)})"
    }
    s"""WITH enc AS (
       |  SELECT doc_id,
       |    replace(replace(replace($chained,
       |      chr(31)||chr(30), ' '), chr(30), ''), chr(31), '') AS subwords
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT doc_id,
       |  cast(len(string_split(subwords, ' ')) AS BIGINT) AS n_subwords,
       |  subwords
       |FROM enc ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // T20 — in-engine BPE TRAINING: the ranked merge table learned
    // from the corpus word frequencies. Sequential by nature (merge k
    // depends on the table after merge k-1), so not SQL-expressible as
    // one query → rows-only here; BpeSpec pins the exact merge
    // sequence on the classic hand-computable corpus and the
    // determinism of the tie-break.
    Q("t20_bpe_train", None, (s, d) => {
      import s.implicits._
      train(T.documents(s, d), nMerges = 25)
        .zipWithIndex
        .map { case ((a, b), r) => (r.toLong, a, b) }
        .toDF("rank", "a", "b")
        .orderBy("rank")
    }),

    // T21 — BPE ENCODE, oracle-checked cross-engine: the frozen
    // 20-merge vocabulary applies as a replace-chain in BOTH engines
    // (identical wrap/sentinel/unwrap rendering), so the full subword
    // STRING of every document hash-matches — not just counts.
    Q("t21_bpe_encode", Some(encodeOracleSql(fixedMerges)),
      (s, d) => encode(T.documents(s, d), fixedMerges).orderBy("doc_id"))
  )
}
