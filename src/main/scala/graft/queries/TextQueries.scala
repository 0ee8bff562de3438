package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Fingerprint

/** Text-analysis operators over the `documents` table (training-data
  * pipeline surface): token stats, quality scoring, language-ID
  * heuristic, rolling-hash fingerprinting. All per-document column
  * expressions — embarrassingly parallel, zero shuffle, fully inside
  * whole-stage codegen; at 100 TB these run at scan speed.
  *
  * Tokenization contract shared with every oracle: split on a single
  * space (the corpus is space-joined words).
  */
object TextQueries {

  private def w: Column = split(col("text"), " ")

  /** Shared BM25 derivation — the single definition of the corpus-side
    * retrieval tables (per-(doc, term) tf, doc length, document
    * frequency, corpus stats over whitespace tokens), used by BOTH
    * `tx_bm25_topk` here and `sim_rrf_fusion`'s lexical leg
    * (`SimilarityQueries.lexicalTopK`). Their DuckDB oracles share
    * [[bm25OracleCte]]/[[bm25OracleMicro]] the same way: hash parity
    * requires the two queries' float ops to match to the last bit, so
    * an edit to the formula must move Spark side and oracle side of
    * both queries together — which is now the only possibility.
    */
  private[queries] case class Bm25Corpus(toks: DataFrame, tf: DataFrame,
    dlen: DataFrame, dft: DataFrame, stats: DataFrame)

  private[queries] def bm25Corpus(docs: DataFrame): Bm25Corpus = {
    val toks = docs.select(col("doc_id"), explode(w).alias("term"))
    // r12: per-(doc, term) counts are row-local (a doc's tokens all
    // live in one input row), so the native TermCounts kernel replaces
    // the explode + groupBy(doc_id, term) spelling — the exploded
    // output IS the deduplicated tf table and the token-cardinality
    // exchange disappears (guide §2.3 "aggregate before you shuffle",
    // taken to its limit: no shuffle at all). Counts bit-identical:
    // same split(text, " ") token semantics, TermCountsSpec pins it.
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.TermCounts(col("text"))).alias("tc"))
      .select(col("doc_id"), col("tc.term").alias("term"),
        col("tc.tf").alias("tf"))
    val dlen = docs.select(col("doc_id"), size(w).cast(LongType).alias("dl"))
    val dft = tf.groupBy("term").agg(count(lit(1)).alias("df"))
    val stats = docs.agg(count(lit(1)).alias("n"),
      sum(size(w).cast(LongType)).alias("tot"))
    Bm25Corpus(toks, tf, dlen, dft, stats)
  }

  /** Per-(doc, term) BM25 score floored to integer micro-units BEFORE
    * any sum (so cross-row sums are shuffle-order-independent):
    * k1 = 1.2, b = 0.75, idf = N/df (exact-rational — BM25's ln() idf
    * is a transcendental no cross-engine oracle can replay). Expects
    * columns `tf`, `df`, `dl`, `n`, `tot` in scope.
    */
  private[queries] def bm25Micro: Column = floor(
    (col("n").cast("double") / col("df")) *
      (col("tf") * lit(2.2)) /
      (col("tf") +
        lit(1.2) * (lit(0.25) +
          lit(0.75) * col("dl") * col("n") / col("tot"))) *
      lit(1000000.0)).cast(LongType)

  /** The Gopher rule-family verdict as a pure per-row TRANSFORM over
    * any frame with (doc_id, text) — batch or streaming, the
    * expressions are identical, which `StreamingTextParitySpec` pins
    * (the dedup-at-ingest story needs the quality gate to run on the
    * change stream with bit-identical verdicts). No shuffle, no
    * state; the `tx_gopher_rules` query is this transform plus the
    * oracle's deterministic ORDER BY.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    // ONE native GopherMetrics call per row (r12) — the interpreted
    // spelling paid a per-token lambda for the char sum, a per-token
    // REGEX for the alphabetic count, and an array_sort + interpreted
    // fold for the top-word run (the r11 H60BucketSum lesson: HOF
    // lambdas evaluate interpreted per element). Values unchanged —
    // the DuckDB oracle keeps the HOF spelling and still
    // hash-matches; the metric columns are extracted in a separate
    // projection so CollapseProject leaves the kernel evaluated once.
    val metrics = docs.select(col("doc_id"),
      graft.functions.GopherMetrics(col("text")).alias("m"))
    metrics
      .select(col("doc_id"),
        col("m").getItem(0).alias("n_words"),
        col("m").getItem(1).alias("chars"),
        col("m").getItem(2).alias("alpha_n"),
        col("m").getItem(3).alias("stop_n"),
        col("m").getItem(4).alias("top_cnt"))
      .withColumn("mwl_micro", expr("chars * 1000000 div n_words"))
      .withColumn("r_words", col("n_words").between(20L, 80L))
      .withColumn("r_mwl",
        col("mwl_micro").between(3000000L, 10000000L))
      .withColumn("r_alpha", col("alpha_n") * 10L >= col("n_words") * 8L)
      .withColumn("r_stop", col("stop_n") >= 2L)
      .withColumn("r_rep", col("top_cnt") * 5L <= col("n_words"))
      .withColumn("keep", col("r_words") && col("r_mwl") &&
        col("r_alpha") && col("r_stop") && col("r_rep"))
  }

  /** Oracle twin of [[bm25Corpus]]: the DuckDB CTE block (spliced
    * right after WITH).
    */
  private[queries] val bm25OracleCte: String =
    """toks AS (
      |  SELECT doc_id, wd AS term
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |        FROM documents) t, UNNEST(ws) u(wd)),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY doc_id, term),
      |dlen AS (SELECT doc_id,
      |           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |         FROM documents),
      |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
      |        FROM tf GROUP BY term),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(len(string_split(text, ' '))) AS BIGINT)
      |              AS tot
      |          FROM documents)""".stripMargin

  /** Oracle twin of [[bm25Micro]]; `df` is the caller's alias for the
    * document-frequency column (aliases t = tf, d = dlen, s = stats
    * are fixed by convention in both consumers).
    */
  private[queries] def bm25OracleMicro(df: String): String =
    s"""CAST(floor((CAST(s.n AS DOUBLE) / $df) * (t.tf * 2.2)
       |      / (t.tf + 1.2 * (0.25 + 0.75 * d.dl * s.n / s.tot))
       |      * 1000000.0) AS BIGINT)""".stripMargin

  /** DSIR hashed-feature bucket count (Xie et al. 2023 use 10k
    * buckets; 4096 keeps the histogram a power of two).
    */
  final val DsirB = 4096

  /** Shared DSIR derivation: per-document importance score of the
    * whole corpus against the lang='en' target slice, used by BOTH
    * `tx_dsir` (top-k inspection) and `pipe_dsir` (the resampling
    * capstone); their oracles share [[dsirOracleCte]] the same way.
    *
    * Importance of a hashed-unigram bucket is the add-one-smoothed
    * target/raw probability ratio — computed as an exact
    * integer-rational ppm (floor((1e6*(ct+1)*(R+B)) /
    * ((cr+1)*(T+B)))) instead of DSIR's log-ratio, because a
    * transcendental log can't be replayed bit-exactly across engines;
    * at production scale the ratio table would carry log-space
    * doubles and the oracle discipline would relax to a tolerance.
    * Scale shape: both histogram tables are <= B=4096 rows regardless
    * of corpus size (the point of hashed features) — they aggregate
    * map-side, join each other, cross the 1-row totals scalar, and
    * broadcast back onto the token stream; the per-doc score is one
    * map-side-combined agg. The corpus is scanned twice (histogram
    * pass + scoring pass) — the two-pass shape DSIR itself has.
    * Returns (doc_id, score_ppm).
    */
  private def dsirBk(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("lang"), explode(w).alias("wd"))
    .select(col("doc_id"), col("lang"),
      pmod(DedupQueries.h60(col("wd")), lit(DsirB.toLong)).alias("bkt"))

  /** The learned half of DSIR: the (bucket -> importance ppm) ratio
    * table plus the 1-row (R, T) totals — O(B) rows no matter the
    * corpus size. `StreamingDsir` collects this as its broadcast
    * model for at-ingest scoring.
    */
  private[graft] def dsirRatio(docs: DataFrame): (DataFrame, DataFrame) = {
    val bk = dsirBk(docs)
    val raw = bk.groupBy("bkt").agg(count(lit(1)).alias("cr"))
    val tgt = bk.filter(col("lang") === "en")
      .groupBy("bkt").agg(count(lit(1)).alias("ct"))
    val tots = bk.agg(count(lit(1)).alias("r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).alias("t"))
    val ratio = raw.join(tgt, Seq("bkt"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bkt"),
        expr(s"(1000000 * (coalesce(ct, 0) + 1) * (r + $DsirB))" +
          s" div ((cr + 1) * (t + $DsirB))").cast(LongType).alias("ppm"))
    (ratio, tots)
  }

  /** Per-row DSIR score of a text column against an ALREADY-LEARNED
    * model, pre-DENSIFIED by the caller to one ppm value per bucket
    * slot (unseen buckets carry the model default): the whole
    * per-token hash→slot→sum loop runs as ONE native
    * [[graft.functions.H60BucketSum]] call per row — no shuffle, no
    * state, usable identically on a batch frame or a change stream
    * (StreamingDsir pins the parity).
    */
  private[graft] def dsirScoreExpr(text: Column,
      ppmDense: Seq[Long]): Column = {
    // native H60BucketSum loop, not aggregate(...) over a literal:
    // the HOF lambda evaluates interpreted PER TOKEN (md5 + conv +
    // boxing each time), and a literal-map element_at additionally
    // linear-scans its 4096 entries per lookup — the qualityClf
    // probe measured that defect class at 2.6-3.2k docs/s, ~20x
    // below the native rate (H60BucketSum Scaladoc has the numbers)
    require(ppmDense.length == DsirB,
      s"dense importance array must have exactly $DsirB slots")
    graft.functions.H60BucketSum(text, ppmDense, 1)
  }

  /** Staged per snapshot: the per-token hash pass behind the score
    * is the expensive half and BOTH dsir consumers (tx_dsir's top-k,
    * pipe_dsir's resampling audit) re-ran it per query. One
    * (doc_id, score_ppm) row per document — the canonical staged
    * artifact shape; the bucket count is in the name.
    */
  private[queries] def dsirScores(s: SparkSession, d: String): DataFrame =
    StagedIndex.orStage(s, s"tx_dsir_scores_v1_b$DsirB", d,
      Seq(s"$d/documents.parquet")) {
      val (ratio, _) = dsirRatio(Tables.documents(s, d))
      dsirBk(Tables.documents(s, d))
        .join(broadcast(ratio), "bkt")
        .groupBy("doc_id").agg(sum(col("ppm")).alias("score_ppm"))
    }

  /** Oracle twin of [[dsirScores]]: DuckDB CTE block (spliced right
    * after WITH) ending in `scored(doc_id, score_ppm)`.
    */
  private[queries] val dsirOracleCte: String =
    s"""b AS (
       |  SELECT doc_id, lang,
       |    ${DedupQueries.SqlH60("wd")} % $DsirB AS bkt
       |  FROM (SELECT doc_id, lang,
       |          unnest(string_split(text, ' ')) AS wd
       |        FROM documents) x),
       |raw AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr
       |        FROM b GROUP BY 1),
       |tgt AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ct
       |        FROM b WHERE lang = 'en' GROUP BY 1),
       |tots AS (SELECT CAST(count(*) AS BIGINT) AS r,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS t FROM b),
       |ratio AS (
       |  SELECT raw.bkt,
       |    CAST((1000000 * (coalesce(ct, 0) + 1) * (r + $DsirB))
       |      // ((cr + 1) * (t + $DsirB)) AS BIGINT) AS ppm
       |  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt CROSS JOIN tots),
       |scored AS (
       |  SELECT doc_id, CAST(sum(ppm) AS BIGINT) AS score_ppm
       |  FROM b JOIN ratio USING (bkt) GROUP BY 1)""".stripMargin

  /** Count-min sketch geometry: 4 hash rows × CmsWidth buckets.
    * Width is the error knob (overcount ≤ n/width per row): session-
    * configurable via `graft.cms.width` (power of two ≤ 2^15 — each
    * row slices 15 bits of the digest; default 1024 is what the
    * oracle replays). A bigger corpus wants a wider sketch, not a
    * taller one.
    */
  final val CmsDepth = 4
  final val CmsWidth = 1024

  /** Per-domain boilerplate stripping geometry (tx_boilerplate): a
    * "line" is a fixed [[BoilerplateLineWords]]-word segment of the
    * document (this corpus carries no newlines, so the segmentation
    * is the deterministic, engine-replayable stand-in for the line/
    * paragraph split a real crawl gets for free), and a line is
    * boilerplate within its domain when at least [[BoilerplateDf]]
    * distinct documents of that domain contain it — the CCNet
    * paragraph-dedup rule (Wenzek et al. 2019, arXiv:1911.00359;
    * C4's repeated-line rule in Raffel et al. 2020 is the corpus-
    * global variant).
    */
  final val BoilerplateLineWords = 5
  final val BoilerplateDf = 2L

  /** Within-domain document-frequency threshold knob
    * (`graft.text.boilerplateDf`, default [[BoilerplateDf]] — what
    * the oracle replays). A threshold of 1 would strip every line of
    * every document; fail loudly instead.
    */
  private def boilerplateDf(s: SparkSession): Long = {
    val n = s.conf.get("graft.text.boilerplateDf",
      BoilerplateDf.toString).toLong
    require(n >= 2,
      s"graft.text.boilerplateDf must be >= 2, got $n")
    n
  }

  /** Default BPE merge depth — what the oracle CTEs replay. */
  final val BpeMerges = 6

  /** Merge-depth knob (`graft.bpe.merges`, default [[BpeMerges]]).
    * The induction loop is depth-generic — each round is the same
    * vocab-sized pair count + 1-row broadcast rewrite — so depth is
    * a session knob like the CMS width: the default is what the
    * static oracle SQL unrolls; deeper runs (R=32 is spec-pinned at
    * sf0.01) verify by invariants (one rule per round, non-increasing
    * winner counts, segmentation conservation) rather than SQL
    * replay. The upper bound keeps the driver-side round loop sane;
    * a production 32k-merge run is the same loop with each round's
    * vocab table staged (PLANS.md records the measured
    * rounds-vs-wall-time curve).
    */
  private[queries] def bpeMerges(s: SparkSession): Int = {
    val n = s.conf.get("graft.bpe.merges", BpeMerges.toString).toInt
    require(n >= 1 && n <= 1024,
      s"graft.bpe.merges must be in [1, 1024], got $n")
    n
  }

  /** One derivation per (session, input, depth): both staged builders
    * below consume it — the memo keeps the first stage build from
    * running the round loop twice (frames are eagerly
    * localCheckpointed, so the second builder writes already-computed
    * partitions). Stopped sessions are evicted like QueryMemo's.
    */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int), (DataFrame, DataFrame)]

  /** Invalidate memoized BPE frames after an in-place input rewrite —
    * called by [[StagedIndex.refreshTokens]] so a restage under the new
    * content token rebuilds from the rewritten bytes, never from a
    * pre-rewrite localCheckpoint.
    */
  private[queries] def clearBpeMemo(): Unit = bpeMemo.clear()

  /** The BPE merge-learning rounds (see tx_bpe_learn's Scaladoc for
    * semantics and scale shape), STAGED per (input snapshot, depth):
    * returns the merge-rule table (round, pair, merged, cnt) and the
    * final segmented word table (wd, f, seq) — the lookup
    * tx_bpe_apply joins. Staging is what lets deep runs amortize:
    * tx_bpe_apply and tx_fertility scan the round-R segmentation
    * instead of re-learning it, and a re-run at the same depth is a
    * parquet scan. Depth is in the stage name — a tuned session can
    * never read another depth's tables.
    */
  private def bpeRounds(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val r = bpeMerges(s)
    val in = Seq(s"$d/documents.parquet")
    def derived = {
      bpeMemo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      bpeMemo.getOrElseUpdate((s, d, r), deriveBpe(s, d, r))
    }
    val merges = StagedIndex.orStage(s, s"tx_bpe_merges_v1_r$r", d, in) {
      derived._1
    }
    val seg = StagedIndex.orStage(s, s"tx_bpe_seg_v1_r$r", d, in) {
      derived._2
    }
    (merges, seg)
  }

  /** The raw depth-`r` induction loop: each round counts adjacent
    * symbol pairs over the word-frequency table, picks the
    * (cnt desc, pair asc) winner, and rewrites every word's symbol
    * sequence. Each round localCheckpoints to cut iterative lineage.
    */
  private def deriveBpe(s: SparkSession, d: String, r: Int)
      : (DataFrame, DataFrame) = {
    var wtab = Tables.documents(s, d)
      .select(explode(w).alias("wd"))
      .groupBy("wd").agg(count(lit(1)).alias("f"))
      .withColumn("seq", concat(lit(" "),
        trim(regexp_replace(col("wd"), "(.)", "$1 ")), lit(" ")))
      .localCheckpoint()
    val rounds = Seq.newBuilder[DataFrame]
    for (i <- 1 to r) {
      val pairs = wtab
        .select(col("f"), split(trim(col("seq")), " ").alias("a"))
        .filter(size(col("a")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"))
          .alias("pair"))
        .groupBy("pair").agg(sum(col("f")).alias("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(col("pair"), expr("replace(pair, ' ', '')").alias("merged"),
          col("cnt"))
        .localCheckpoint()
      rounds += top.withColumn("round", lit(i.toLong))
      wtab = wtab.crossJoin(broadcast(top))
        .select(col("wd"), col("f"), expr(
          "replace(replace(seq, concat(' ', pair, ' '), " +
            "concat(' ', merged, ' ')), concat(' ', pair, ' '), " +
            "concat(' ', merged, ' '))").alias("seq"))
        .localCheckpoint()
    }
    (rounds.result().reduce(_.unionAll(_)).localCheckpoint(), wtab)
  }

  /** The merge-learning rounds as unrolled oracle CTEs — ONE copy
    * shared by the tx_bpe_learn / tx_bpe_apply / tx_fertility oracle
    * SQL so the three replays can never drift apart (the
    * bm25OracleCte factoring discipline). Mirrors [[bpeRounds]]
    * exactly: same pair counting, same (cnt desc, pair asc) winner,
    * same double-replace rewrite — the left-to-right non-overlap
    * semantics of replace() agree between engines. Expects a `w0`
    * CTE (wd, f, seq) in scope.
    */
  private[queries] val sqlBpeRoundCtes: String = (1 to BpeMerges).map { i =>
    val prev = if (i == 1) "w0" else s"w${i - 1}"
    s"""p$i AS (
       |  SELECT arr[i] || ' ' || arr[i+1] AS pair,
       |    CAST(sum(f) AS BIGINT) AS cnt
       |  FROM (SELECT f, string_split(trim(seq), ' ') AS arr
       |        FROM $prev) t,
       |       UNNEST(range(1, len(arr))) u(i)
       |  GROUP BY 1),
       |t$i AS (SELECT pair, replace(pair, ' ', '') AS merged, cnt
       |        FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1),
       |w$i AS (SELECT wd, f,
       |  replace(replace(seq, ' '||pair||' ', ' '||merged||' '),
       |          ' '||pair||' ', ' '||merged||' ') AS seq
       |  FROM $prev CROSS JOIN t$i)""".stripMargin
  }.mkString(",\n")

  /** Per-document BPE application as oracle CTEs, ending at
    * `perdoc(doc_id, n_subwords, n_symbols, n_words)`: the doc-keyed
    * word explode, the shared rounds, the round-R segmentation
    * lookup, and the per-doc roll-up — the whole tx_bpe_apply oracle
    * body, reused by tx_fertility's per-language roll-up.
    */
  private[queries] val sqlBpePerDocCtes: String =
    s"""toksd AS (
       |  SELECT doc_id, wd FROM (SELECT doc_id,
       |        string_split(text, ' ') AS ws
       |        FROM documents) t, UNNEST(ws) u(wd)),
       |toks AS (SELECT wd FROM toksd),
       |w0 AS (SELECT wd, CAST(count(*) AS BIGINT) AS f,
       |  ' ' || trim(regexp_replace(wd, '(.)', '\\1 ', 'g')) || ' ' AS seq
       |  FROM toks GROUP BY wd),
       |$sqlBpeRoundCtes,
       |seg AS (SELECT wd,
       |  CAST(len(string_split(trim(seq), ' ')) AS BIGINT) AS n_sub,
       |  CAST(length(wd) AS BIGINT) AS n_sym
       |  FROM w$BpeMerges),
       |perdoc AS (SELECT doc_id,
       |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |  CAST(sum(n_sym) AS BIGINT) AS n_symbols,
       |  CAST(count(*) AS BIGINT) AS n_words
       |  FROM toksd JOIN seg USING (wd)
       |  GROUP BY doc_id)""".stripMargin

  /** Flesch core behind `tx_readability` — a PURE per-row transform
    * (no window, no orderBy), so it lifts onto a document stream
    * unchanged; `StreamingTextParitySpec` pins the batch/stream
    * verdict parity the way it does for gopherRules.
    */
  private[graft] def readabilityOf(docs: DataFrame): DataFrame = {
    val nWords = size(w).cast(LongType)
    val nSents = greatest(lit(1L),
      (size(split(col("text"), "[.!?]+", -1)) - 1).cast(LongType))
    val nSyll = size(expr(
      "regexp_extract_all(lower(text), '[aeiou]+', 0)")).cast(LongType)
    docs
      .select(col("doc_id"), nWords.alias("n_words"),
        nSents.alias("n_sentences"), nSyll.alias("n_syllables"))
      .withColumn("wps_milli",
        expr("n_words * 1000 div n_sentences"))
      .withColumn("spw_milli",
        expr("n_syllables * 1000 div n_words"))
      .withColumn("flesch_milli",
        lit(206835L) - expr("1015 * n_words div n_sentences")
          - expr("84600 * n_syllables div n_words"))
      .withColumn("band",
        when(col("flesch_milli") >= 70000L, "easy")
          .when(col("flesch_milli") >= 50000L, "standard")
          .otherwise("difficult"))
  }

  private def cmsWidth(s: SparkSession): Int = {
    val w = s.conf.get("graft.cms.width", CmsWidth.toString).toInt
    require(w > 0 && w <= (1 << 15) && (w & (w - 1)) == 0,
      s"graft.cms.width must be a power of two <= 32768, got $w")
    w
  }

  /** Sequence-packing context length (tokens per training row). */
  final val PackLen = 2048

  /** Per-source document cap (tx_source_cap). */
  final val SourceCap = 10

  /** Training-shard count (tx_shard). */
  final val NShards = 8

  /** Temperature-sampling target size (tx_sample_weighted). */
  final val SampleTarget = 100

  /** Per-language profile size (tx_langid_ngram): top-K trigrams. */
  final val ProfileK = 40

  /** Terms whose posting lists tx_inverted_index materializes. */
  final val TopTerms = 50

  /** PII patterns — RE2-compatible (no backrefs/lookaround) so the
    * same source strings drive Spark (java.util.regex) and the DuckDB
    * oracle identically.
    */
  final val PiiEmail = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  final val PiiPhone = "\\b[0-9]{3}-[0-9]{4}\\b"
  final val PiiIp =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Sequence-packing core behind `tx_pack` (specs drive it on
    * synthetic frames): head-to-tail layout per lang shard, PackLen-
    * token bins, per-doc (bin, offset) of its first token. The
    * running token total is two-level — a per-(range-partition, lang)
    * local cumsum lifted by a broadcast prefix-offset table
    * (GroupRank.runningSum) — because a `Window.partitionBy(lang)`
    * cumsum would funnel each whole language shard through one task.
    */
  private[queries] def packOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      size(w).cast(LongType).alias("n_tokens"))
    GroupRank.runningSum(toks, "lang", Seq(col("doc_id").asc), "n_tokens")
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"(run - n_tokens) div $PackLen").alias("bin"),
        ((col("run") - col("n_tokens")) % PackLen).alias("offset"))
      .orderBy("doc_id")
  }

  /** Composite-gate core behind `tx_filter_verdict` (specs drive it
    * on synthetic frames): all five rules, fail bitmask, keep
    * verdict. private[graft]: `StreamingStructClf.learn` derives
    * ad-hoc corpora's training verdicts through it.
    *
    * ZERO-shuffle since r12: every metric — including the top-word
    * share, whose original spelling was a corpus-wide (doc, word)
    * count aggregate joined back per doc — comes from ONE native
    * [[graft.functions.TextGateMetrics]] call per row (single token
    * pass + hash map). At 100 TB that turns the verdict derivation
    * (and the staged `tx_gate_verdict_v1` build feeding four
    * consumers) from an exploded-token-table shuffle into a pure
    * scan; values are bit-identical to the aggregate spelling (the
    * DuckDB oracle keeps the aggregate form and still hash-matches;
    * FilterVerdictSpec pins the semantics on synthetic frames). The
    * five metric columns are extracted from one array value in a
    * SEPARATE projection, and CollapseProject does not inline a
    * non-cheap expression referenced five times — so the kernel runs
    * once per row, not once per extracted field.
    */
  private[graft] def filterVerdictOf(docs: DataFrame): DataFrame = {
    // NULL-text docs never reached the old spelling's output (the
    // exploded (doc, word) aggregate had no rows for them, and the
    // inner join dropped them) — keep that contract explicit
    val metrics = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextGateMetrics(col("text")).alias("m"))
      .select(col("doc_id"),
        col("m").getItem(0).alias("n_tokens"),
        col("m").getItem(1).alias("uniq_n"),
        col("m").getItem(2).alias("stop_n"),
        col("m").getItem(3).alias("maxn"),
        col("m").getItem(4).alias("d3"),
        greatest(col("m").getItem(0) - 2L, lit(0L)).alias("tot3"))
    val ttr = col("uniq_n").cast("double") / col("n_tokens")
    val stopR = col("stop_n").cast("double") / col("n_tokens")
    // the (doc, word) aggregate's nw (Σ per-word counts) IS n_tokens
    val topFrac = col("maxn").cast("double") / col("n_tokens")
    val dupFrac = when(col("tot3") > 0,
      lit(1.0) - col("d3").cast("double") / col("tot3")).otherwise(0.0)
    val mask =
      when(col("n_tokens") < 50, 1L).otherwise(0L) +
      when(ttr < 0.3, 2L).otherwise(0L) +
      when(stopR < 0.01, 4L).otherwise(0L) +
      when(topFrac > 0.15, 8L).otherwise(0L) +
      when(dupFrac > 0.02, 16L).otherwise(0L)
    metrics
      .select(col("doc_id"), col("n_tokens"),
        ttr.alias("ttr"), stopR.alias("stop_ratio"),
        topFrac.alias("top_frac"), dupFrac.alias("dup3_frac"),
        mask.alias("fail_mask"),
        (mask === 0L).alias("keep"))
      .orderBy("doc_id")
  }

  /** The staged per-doc gate-verdict table — [[filterVerdictOf]]'s
    * output materialized once per snapshot (r11). Four consumers
    * re-derived it per query (tx_filter_verdict, tx_quality_clf's
    * labels, pipe_curate's and pipe_mm_curate's stage builds), and
    * the expensive half is the corpus-wide (doc, word) count agg.
    * Every rule is per-document, so the artifact is PER-ROW and
    * appendable: an ingest derives verdicts for the new part files
    * only — O(delta), the shingle-index contract. Rows are unordered
    * (parquet read-back); consumers re-apply their ORDER BY.
    */
  private[queries] def filterVerdicts(s: SparkSession, d: String): DataFrame =
    StagedIndex.orStageAppendable(s, "tx_gate_verdict_v1", d,
      s"$d/documents.parquet")(filterVerdictOf)

  /** Hashed-feature bucket count for the learned quality classifier
    * (the DCLM/fastText curation pass — Li et al. 2024 "DataComp-LM",
    * Joulin et al. 2016 fastText — trains exactly this shape: hashed
    * bigram features, linear weights). 1024 keeps the model
    * broadcast-trivial while the sf corpora's bigram vocabulary
    * still collides realistically.
    */
  final val QcB = 1024L

  /** Keep threshold: predicted kept when the tf-weighted mean bucket
    * keep-probability is at least even odds. Also the weight formula's
    * own value at nk=nd=0, i.e. what an unseen bucket scores.
    */
  final val QcKeepPpm = 500000L

  /** Smoothing mass for the STRUCTURAL-feature classifier
    * (tx_clf_struct): the additive constant in the likelihood-ratio
    * formula, sized to the struct feature space (5 families × ≤20
    * bins ≈ 70 ids; 64 keeps it a power of two) the way [[QcB]] sizes
    * the bigram model's.
    */
  final val QcStructB = 64L

  /** Struct-feature rows (doc_id, keep, fid) from a per-doc
    * gate-verdict frame ([[filterVerdictOf]]'s shape): five integer
    * bins per document, family-offset feature ids — a pure per-row
    * projection, shared by the `tx_clf_struct` query (over the staged
    * verdict table) and `StreamingStructClf.learn` (over an ad-hoc
    * corpus's derived verdicts).
    */
  private[graft] def structFeaturesOf(verdicts: DataFrame): DataFrame =
    verdicts.select(col("doc_id"), col("keep"),
      explode(array(
        expr("0 + least(n_tokens div 25, 19)"),
        expr("100 + least(CAST(floor(ttr * 10) AS BIGINT), 9)"),
        expr("200 + least(CAST(floor(stop_ratio * 100) AS BIGINT), 9)"),
        expr("300 + least(CAST(floor(top_frac * 20) AS BIGINT), 19)"),
        expr("400 + least(CAST(floor(dup3_frac * 50) AS BIGINT), 9)")
      )).alias("fid"))

  /** The struct classifier's learned half from a TRAINING feature
    * frame: (weights ≤ ~70 rows, 1-row class totals) — the
    * [[qualityClfParts]] ratio formula with [[QcStructB]] smoothing.
    */
  private[graft] def structClfWeights(feat: DataFrame)
      : (DataFrame, DataFrame) = {
    val counts = feat
      .groupBy("fid")
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).alias("nk"),
        sum(when(col("keep"), 0L).otherwise(1L)).alias("nd"))
    val tots = counts.agg(sum(col("nk")).alias("tnk"),
      sum(col("nd")).alias("tnd"))
    val wts = counts.crossJoin(broadcast(tots))
      .select(col("fid"),
        expr(s"(nk + 1) * (tnd + $QcStructB) * 1000000" +
          s" div ((nd + 1) * (tnk + $QcStructB))").alias("r_ppm"))
    (wts, tots)
  }

  /** Word-bigram array of a text column — the classifier's feature
    * space. Spelled slice+zip_with so a 0/1-token doc yields an EMPTY
    * array: Spark's sequence(1, 0) counts DOWN, so the naive
    * transform(sequence(1, n-1), ...) spelling would index element 0
    * on short docs and throw.
    */
  private[queries] def wordBigrams(text: Column): Column = {
    val ws = split(text, " ")
    val n1 = greatest(size(ws) - 1, lit(0))
    zip_with(slice(ws, lit(1), n1), slice(ws, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** The learned quality classifier's parts — (labels, features,
    * weights, totals) — shared by the `tx_quality_clf` query and
    * `StreamingQualityClf.learn`:
    *
    *  - labels: keep/drop DISTILLED from the oracled
    *    tx_filter_verdict gate (the DCLM recipe — train a cheap
    *    classifier on a rule-labeled set, then score everything at
    *    scan speed; here the label source is itself oracle-checked,
    *    so the classifier's whole training input is verified).
    *  - features: per-(doc, bucket) tf of hashed word bigrams
    *    (portable h60 mod [[QcB]]), map-side combined.
    *  - weights: ≤ QcB rows no matter the corpus size — the bucket's
    *    add-one-smoothed class-conditional likelihood RATIO as an
    *    exact integer ppm, floor((nk+1)·(TND+B)·1e6 / ((nd+1)·
    *    (TNK+B))), the DSIR ratio formula with keep/drop as the
    *    target/raw classes. The ratio self-normalizes for class
    *    MASS imbalance: the first cut used the raw bucket posterior
    *    (nk+1)/(nk+nd+2), and because kept docs are the long ones,
    *    nearly every bucket sat above even odds — the classifier
    *    predicted keep for all 500 sf0.01 docs (53% = base rate).
    *    Ratio-vote scoring measures 82% on the same corpus.
    *  - totals: the 1-row (TNK, TND) frame, from which the
    *    unseen-bucket default ratio derives (the nk=nd=0 value).
    *
    * Scale: the tf agg is map-side combined; the weight agg has ≤ QcB
    * groups, crosses the 1-row totals scalar, and broadcasts back;
    * the corpus shuffles only doc-keyed aggregates (the
    * tx_filter_verdict shape). The int64 ratio product carries the
    * same overflow envelope as DSIR's ((count+1)·(total+B)·1e6 —
    * fine to ~1e6 occurrences per bucket with 1e6-token classes);
    * far before that binds, production trains on a sampled labeled
    * slice — the DCLM move — with the shape unchanged.
    */
  /** The classifier's hashed-feature derivation: per-(doc, bucket)
    * bigram tf, map-side combined. The sf-query path stages it via
    * [[qcFeatures]]; ad-hoc corpora derive it inline.
    */
  private def qcFeaturesOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(wordBigrams(col("text"))).alias("g"))
    .select(col("doc_id"),
      pmod(DedupQueries.h60(col("g")), lit(QcB)).alias("bucket"))
    .groupBy("doc_id", "bucket").agg(count(lit(1)).alias("tf"))

  /** Staged hashed-feature table (doc_id, bucket, tf) — the standard
    * production artifact behind any hashed-feature model (r11). The
    * query consumed it twice per run (weight training + scoring);
    * staged it is O(docs × ≤min(59, QcB)) rows of three longs, tiny
    * next to the corpus. Per-doc rows → appendable (O(delta)
    * ingest); the stage name embeds the bucket knob.
    */
  private def qcFeatures(s: SparkSession, d: String): DataFrame =
    StagedIndex.orStageAppendable(s, s"tx_qc_feat_b${QcB}_v1", d,
      s"$d/documents.parquet")(qcFeaturesOf)

  private[graft] def qualityClfParts(docs: DataFrame,
      labelsOpt: Option[DataFrame] = None,
      featOpt: Option[DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // the Opt params let the sf-query path supply the STAGED verdict
    // and feature tables; callers with ad-hoc corpora
    // (StreamingQualityClf.learn, the probes' synthetic frames)
    // derive both from `docs`
    val labels = labelsOpt.getOrElse(
      filterVerdictOf(docs).select(col("doc_id"), col("keep")))
    val feat = featOpt.getOrElse(qcFeaturesOf(docs))
    val counts = feat.join(labels, "doc_id")
      .groupBy("bucket")
      .agg(sum(when(col("keep"), col("tf")).otherwise(0L)).alias("nk"),
        sum(when(col("keep"), 0L).otherwise(col("tf"))).alias("nd"))
    val tots = counts.agg(sum(col("nk")).alias("tnk"),
      sum(col("nd")).alias("tnd"))
    val wts = counts.crossJoin(broadcast(tots))
      .select(col("bucket"),
        expr(s"(nk + 1) * (tnd + $QcB) * 1000000" +
          s" div ((nd + 1) * (tnk + $QcB))").alias("r_ppm"))
    (labels, feat, wts, tots)
  }

  /** Per-row scorer serving the learned [[qualityClfParts]] ratio
    * weights as a DENSE per-bucket table through the native
    * [[graft.functions.H60BucketSum]] loop — `StreamingQualityClf`'s
    * inference path (the StreamingDsir broadcast-model shape). The
    * table is pre-thresholded to 0/1 votes, so the expression's sum
    * IS the keep-leaning occurrence count. Design iterated against
    * StreamProbe: a literal-MAP lookup measured 2.6k docs/s (linear
    * scan per element), a dense ARRAY literal 3.2k (O(1) fetch but
    * the HOF lambda still interprets md5 per element); the native
    * loop is one call per row (see H60BucketSum's Scaladoc for the
    * numbers). Returns the same integer vote_ppm the batch query
    * computes, spec-pinned: the fraction (ppm) of bigram OCCURRENCES
    * in keep-leaning buckets (ratio ≥ 1e6); unseen buckets carry the
    * model's own nk=nd=0 default ratio in their array slots;
    * featureless docs score [[QcKeepPpm]], matching the batch
    * left-join coalesce.
    */
  private[graft] def qualityClfScoreExpr(text: Column,
      rPpmDense: Seq[Long]): Column = {
    require(rPpmDense.length == QcB.toInt,
      s"dense weight array must have exactly $QcB slots")
    val votes01 = rPpmDense.map(r => if (r >= 1000000L) 1L else 0L)
    val votes = graft.functions.H60BucketSum(text, votes01, 2)
    val nf = greatest(size(split(text, " ")) - 1, lit(0)).cast(LongType)
    val scaled = votes * lit(1000000L)
    // exact integer division: subtract the remainder first, so the
    // double division is of an exact multiple (values < 2^53)
    when(nf > 0L, ((scaled - pmod(scaled, nf)) / nf).cast(LongType))
      .otherwise(lit(QcKeepPpm))
  }

  /** Char-bigram LM quality score behind `tx_lm_score` and
    * `tx_quality_bins`: per-(doc, bigram) counts staged once per
    * snapshot — BOTH consumers (model counts, doc scoring) want
    * exactly this table, and deriving it runs the interpreted
    * filter(transform(...)) chain plus an explode+agg — once per
    * snapshot, not twice per query (same defect class the trigram
    * staging fixed for tx_langid_ngram). Returns one row per doc with
    * ≥1 bigram: (doc_id, n_bigrams, score_micro), unordered.
    */
  private def lmScoreOf(s: SparkSession, d: String): DataFrame = {
    // per-doc term frequencies — appendable (the groupBy keys include
    // doc_id, so a file-subset build is exact)
    val occ = StagedIndex.orStageAppendable(s, "tx_bigram_tf_v1", d,
      s"$d/documents.parquet") { docs =>
      docs
        .select(col("doc_id"),
          explode(expr("filter(transform(sequence(1, length(text)), " +
            "i -> substring(text, i, 2)), x -> length(x) = 2)")).alias("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).alias("tf"))
    }
    val cnt = occ.groupBy("g").agg(sum(col("tf")).alias("cnt"))
      .withColumn("c1", substring(col("g"), 1, 1))
    val ctx = cnt.groupBy("c1").agg(sum(col("cnt")).alias("c1n"))
    val vocab = cnt.agg(countDistinct(col("c1")).alias("v"))
    val probs = cnt.join(ctx, "c1").crossJoin(broadcast(vocab))
      .select(col("g"),
        ((col("cnt") + lit(1L)).cast("double") /
          (col("c1n") + col("v")).cast("double")).alias("p"))
    occ.join(broadcast(probs), "g")
      .groupBy("doc_id")
      .agg(sum(col("tf")).alias("n_bigrams"),
        sum(floor(col("tf").cast("double") * col("p") * lit(1e6))
          .cast(LongType)).alias("score_micro"))
  }

  /** The staged quality-decile table (doc_id, avg_micro, decile) —
    * shared by tx_quality_bins and pipe_curriculum (→ pipe_manifest),
    * which re-derived the LM scoring + corpus-wide decile rank per
    * run. Deterministic from the snapshot (no session knobs), so it
    * stages like the verdict tables; rows are unordered (parquet
    * read-back) and consumers apply their own ORDER BY.
    */
  private[queries] def qualityDeciles(s: SparkSession, d: String)
      : DataFrame =
    StagedIndex.orStage(s, "tx_quality_deciles_v1", d,
      Seq(s"$d/documents.parquet")) {
      val lm = lmScoreOf(s, d)
        .select(col("doc_id"),
          expr("score_micro div n_bigrams").alias("avg_micro"))
        .withColumn("g0", lit(0))
      GroupRank.rank(lm, "g0",
          Seq(col("avg_micro").asc, col("doc_id").asc))
        .select(col("doc_id"), col("avg_micro"),
          GroupRank.ntileFromRank(10, col("rn"), col("grp_n"))
            .alias("decile"))
    }

  /** TF-IDF core behind `tx_tfidf` (specs drive it on synthetic
    * frames): per-(doc, term) counts, vocabulary-sized df table
    * broadcast back, idf as the exact rational N/df (one double
    * division — no transcendental, engines agree bit-for-bit),
    * per-doc top-3 terms by score = tf*N/df.
    */
  private[queries] def tfidfTopK(docs: DataFrame): DataFrame = {
    // r12: row-local tf via the native TermCounts kernel (see
    // bm25Corpus) — kills the token-cardinality (doc, term) exchange;
    // the only corpus-sized shuffle left is the top-3 window's doc_id
    // exchange.
    val wc = docs
      .select(col("doc_id"),
        explode(graft.functions.TermCounts(col("text"))).alias("tc"))
      .select(col("doc_id"), col("tc.term").alias("term"),
        col("tc.tf").alias("tf"))
    val df = wc.groupBy("term").agg(count(lit(1)).alias("df"))
    val n = docs.agg(count(lit(1)).alias("n"))
    val scored = wc
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n")).cast("double") / col("df"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("rk", row_number().over(win).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rk")
  }

  /** Redaction order is part of the contract: email first (its
    * char-class would otherwise eat pieces of a following tag), then
    * IPv4, then phone.
    */
  private[queries] def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, PiiEmail, "<EMAIL>"),
        PiiIp, "<IP>"),
      PiiPhone, "<PHONE>")

  /** Positional 16-gram hash index (doc_id, p, gh), staged once per
    * snapshot — the shared derivation of the span family
    * (tx_span_strip accounting, tx_span_cut rewriting). Building it
    * is the expensive half of both queries (16-word join + md5 per
    * word position); as a staged artifact it is 24 bytes/row
    * columnar and each consumer scans it instead of re-hashing the
    * corpus — the same compute-once-per-snapshot pattern as the
    * shingle/signature indexes.
    */
  private[queries] def posGrams(s: SparkSession, d: String): DataFrame =
    // per-doc positional grams — appendable (O(delta) ingest)
    StagedIndex.orStageAppendable(s, "tx_pos_grams_v1_g16", d,
      s"$d/documents.parquet") { docs =>
      // single-pass fused expression (graft.functions.PosGramHashes)
      // — hash-identical to the transform/slice/array_join/md5 HOF
      // chain it replaced (PosGramHashesSpec pins the equivalence),
      // at md5 speed instead of interpreter speed
      docs
        .select(col("doc_id"),
          explode(graft.functions.PosGramHashes(col("text"), 16))
            .alias("sg"))
        .select(col("doc_id"), col("sg.p").alias("p"),
          col("sg.gh").alias("gh"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Rolling-hash document fingerprint (custom codegen expression).
    "tx_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Fingerprint(col("text")).alias("fp"))
        .orderBy("doc_id")),

    // Corpus-level n-gram statistics: top-20 word bigrams by DOCUMENT
    // frequency (WordShingles de-dups within a doc). Scale shape: one
    // explode + a map-side-combining count on the bigram key, then a
    // global top-k — at 100 TB the agg shuffle carries one row per
    // distinct bigram, and TakeOrderedAndProject keeps the top-k
    // per-partition before the single final merge (never a full sort).
    "tx_ngram_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(graft.functions.WordShingles(col("text"), 2))
          .alias("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).alias("df"))
        .orderBy(col("df").desc, col("bigram").asc)
        .limit(20)),

    // Token counting: whitespace tokens + chars + mean token length.
    "tx_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(w).cast(LongType).alias("n_tokens"),
          length(col("text")).cast(LongType).alias("n_chars_q"),
          (length(col("text")).cast(LongType) /
            size(w).cast(LongType)).alias("chars_per_token"))
        .orderBy("doc_id")),

    // Quality scoring: stopword ratio + type-token ratio, exact-int
    // numerators so the derived doubles are bit-identical everywhere.
    "tx_quality" -> ((s, d) => {
      val nTok = size(w).cast(LongType)
      val stopN = size(filter(w, x => x.isin("the", "a"))).cast(LongType)
      val uniqN = size(array_distinct(w)).cast(LongType)
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nTok.alias("n_tokens"),
          stopN.alias("stop_n"),
          uniqN.alias("uniq_n"),
          (stopN / nTok).alias("stop_ratio"),
          (uniqN / nTok).alias("ttr"))
        .orderBy("doc_id")
    }),

    // Gopher-style quality rules (Rae et al. 2021, "Scaling Language
    // Models: ... Gopher", Table A1 — the heuristic rule family C4/
    // Gopher/FineWeb pipelines apply before any model-based filter):
    // word-count bounds, mean-word-length bounds, minimum alphabetic-
    // word share, minimum stop-word hits, and a maximum single-word
    // dominance share (the repetition gate). Every rule is exact
    // integer arithmetic (mean word length in floor-micro units, the
    // share rules as cross-multiplied inequalities), so the oracle
    // replays the verdict bit-for-bit. One row per document with each
    // rule's measurement, its boolean, and the conjunctive keep —
    // per-row expressions at scan speed, no shuffle but the output
    // ORDER BY.
    "tx_gopher_rules" -> ((s, d) =>
      gopherRules(Tables.documents(s, d)).orderBy("doc_id")),

    // BPE vocabulary INDUCTION (Sennrich, Haddow & Birch 2016,
    // "Neural Machine Translation of Rare Words with Subword Units"):
    // learn the first BpeMerges merge rules from the corpus — the
    // actual tokenizer-training step, distributed. Each round counts
    // adjacent symbol pairs over the word-frequency table (NOT the
    // corpus: BPE trains on distinct words weighted by count, so the
    // scan is vocabulary-sized), picks the most frequent pair
    // (count desc, pair asc — deterministic), and rewrites every
    // word's symbol sequence with the merged token. Sequences are
    // space-joined symbol strings with sentinel spaces, so the merge
    // IS string replace — left-to-right non-overlapping in both
    // engines, applied twice to catch the boundary-adjacent repeat
    // case, hence bit-identical cross-engine (the greedy-left quirk
    // on runs like 'a a a a' is part of the pinned contract).
    // Scale shape: per round one map-side-combined pair count over
    // O(vocab × word-length) rows, a vocab-sized TakeOrdered(1), and
    // a 1-row broadcast merge rule onto the vocab table; the corpus
    // is touched once (the initial word count). localCheckpoint cuts
    // the per-round lineage — the same iterative-algorithm discipline
    // as dd_cluster (at 100 TB each round's vocab table would stage
    // to parquet like the other iteration states).
    "tx_bpe_learn" -> ((s, d) =>
      bpeRounds(s, d)._1
        .select(col("round"), col("pair"), col("merged"), col("cnt"))
        .orderBy("round")),

    // Apply the learned vocabulary: the post-round-R word table IS
    // the segmentation lookup (wd → its subword sequence), so
    // tokenizing the corpus is one explode + one vocab-sized
    // equi-join + a per-doc agg — how a trained tokenizer actually
    // runs at scale (the merge learning cost amortizes over every
    // corpus it tokenizes). Per doc: subword count after merging,
    // raw symbol (char) count before, and word count — the
    // compression the learned vocab bought.
    "tx_bpe_apply" -> ((s, d) => {
      val seg = bpeRounds(s, d)._2
        .select(col("wd"),
          size(split(trim(col("seq")), " ")).cast(LongType).alias("n_sub"),
          length(col("wd")).cast(LongType).alias("n_sym"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(w).alias("wd"))
        .join(seg, "wd")
        .groupBy("doc_id")
        .agg(sum(col("n_sub")).alias("n_subwords"),
          sum(col("n_sym")).alias("n_symbols"),
          count(lit(1)).alias("n_words"))
        .orderBy("doc_id")
    }),

    // Tokenizer fertility per language (Petrov et al. 2023, "Language
    // Model Tokenizers Introduce Unfairness Between Languages"):
    // subwords-per-word under the LEARNED vocab, rolled up per lang —
    // the fairness/cost audit run before committing to a tokenizer
    // (a high-fertility language pays proportionally more of every
    // context window and every training FLOP). compression_micro
    // (symbols per subword) is the inverse view: how much the merges
    // actually bought for that language. Floored micro-unit ratios of
    // exact integer sums, so the oracle replays bit-for-bit. Scale
    // shape: inherits tx_bpe_apply's vocab-sized rounds + one
    // doc-keyed equi-join, then a map-side-combined roll-up to
    // O(langs) rows.
    "tx_fertility" -> ((s, d) => {
      val perDoc = queries("tx_bpe_apply")(s, d)
      val langs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      perDoc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).alias("n_docs"),
          sum(col("n_words")).alias("words"),
          sum(col("n_subwords")).alias("subwords"),
          sum(col("n_symbols")).alias("symbols"))
        .withColumn("fertility_micro",
          expr("subwords * 1000000 div words"))
        .withColumn("compression_micro",
          expr("symbols * 1000000 div subwords"))
        .orderBy("lang")
    }),

    // BPE-ish regex tokenization: letter runs, digit runs, and
    // single punctuation as separate tokens (the pre-tokenizer shape
    // GPT-style BPE vocabularies use), plus distinct-token count.
    "tx_bpe_tokens" -> ((s, d) => {
      val toks = expr(
        "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast(LongType).alias("n_bpe"),
          size(array_distinct(toks)).cast(LongType).alias("n_bpe_uniq"))
        .orderBy("doc_id")
    }),

    // Flesch reading-ease (Flesch 1948; the readability gate of
    // classic web-corpus filters) with the standard automatable
    // syllable proxy: a syllable per vowel GROUP ([aeiou]+ run),
    // sentences per terminator run ([.!?]+), words per whitespace
    // token. Score in floored milli-units from exact integer counts —
    // 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    // becomes 206835 − 1015·w//s − 84600·y//w, all integral division,
    // so both engines agree bit-for-bit (the no-transcendental
    // discipline of tx_tfidf/tx_lm_score). `band` is the coarse
    // easy/standard/difficult cut downstream mixture policies key on.
    // Scale shape: per-row regex counting at scan speed; no shuffle
    // but the output ORDER BY.
    "tx_readability" -> ((s, d) =>
      readabilityOf(Tables.documents(s, d)).orderBy("doc_id")),

    // Content novelty over corpus growth: per document, the fraction
    // of its word-3-grams whose FIRST corpus occurrence is this
    // document (doc_id = ingest order) — the redundancy curve a
    // corpus owner watches to decide when further crawling stops
    // buying new content (novelty decays toward the template/
    // boilerplate floor as a source saturates). Relational form of
    // the "how much of this shard is new text" measurement: one
    // min-agg per distinct gram hash picks the introducing doc, one
    // equi-join back, one doc-keyed roll-up — per-gram first-seen
    // needs no prefix scan, so the shape is the dd_span_dedup class:
    // O(grams) rows through map-side-combined aggs, nothing
    // quadratic. novel_ppm is a floored integer ratio, docs shorter
    // than 3 words take the zero-gram left-join branch.
    "tx_novelty" -> ((s, d) => {
      // NOT rewired to the staged shingle index: measured slower
      // (2.16 s vs 1.6 s at sf0.1) — WordShingles is a tight custom
      // expression, and scanning + exploding the staged string arrays
      // costs more than re-deriving them; the stage pays off only for
      // consumers that would otherwise run the interpreted HOF chain
      //
      // Single gram pass (r12): the first cut derived `grams` twice —
      // once under the min-agg, once under the join back — so the
      // corpus was scanned + shingled + md5-hashed TWICE, and the
      // agg side (one row per DISTINCT GRAM) came back as a
      // BroadcastHashJoin build, a corpus-vocabulary-sized broadcast
      // that cannot exist at 100 TB. Now: pre-aggregate occurrences
      // to (gh, doc_id, c) — map-side combined — and resolve the
      // introducing doc with a min-over-gh window on that REDUCED
      // table. One explode pass, no gram-table broadcast; every
      // exchange after the first carries (gh, doc, count) rows only.
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(col("text"), 3)).alias("g"))
        .select(col("doc_id"), DedupQueries.h60(col("g")).alias("gh"))
      val occ = grams.groupBy("gh", "doc_id")
        .agg(count(lit(1)).alias("c"))
      val wG = org.apache.spark.sql.expressions.Window.partitionBy("gh")
      val perDoc = occ
        .withColumn("first_doc", min(col("doc_id")).over(wG))
        .groupBy("doc_id")
        .agg(sum(col("c")).alias("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), col("c"))
            .otherwise(0L)).alias("n_new"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).alias("n_grams"),
          coalesce(col("n_new"), lit(0L)).alias("n_new"))
        .withColumn("novel_ppm",
          when(col("n_grams") > 0,
            expr("n_new * 1000000 div n_grams")).otherwise(0L))
        .orderBy("doc_id")
    }),

    // Language-ID n-gram/marker heuristic (the corpus carries no real
    // language signal — the operator demonstrates the deterministic
    // marker-scoring shape).
    "tx_langid" -> ((s, d) => {
      val cntThe = size(filter(w, x => x === "the")).cast(LongType)
      val cntA = size(filter(w, x => x === "a")).cast(LongType)
      val predicted = when(cntThe > cntA, "en")
        .when(cntThe < cntA, "la").otherwise("tie")
      Tables.documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          cntThe.alias("cnt_the"), cntA.alias("cnt_a"),
          predicted.alias("predicted"),
          when(predicted === col("lang"), 1L).otherwise(0L).alias("hit"))
        .orderBy("doc_id")
    }),

    // Language-ID the published way (Cavnar & Trenkle 1994, "N-Gram-
    // Based Text Categorization"): learn a per-language character-
    // trigram profile from the corpus (top-ProfileK trigrams by
    // occurrence), broadcast the tiny model, score every document by
    // profile overlap, predict argmax. The train/broadcast/scan-speed-
    // inference shape is how any aggregate-learned classifier deploys
    // on Spark: training is one explode + keyed agg (map-side
    // combined), the profile rank is a window over the AGGREGATED
    // (lang, trigram) table (vocabulary-sized — the plan audit's
    // aggregate exemption), and inference never shuffles the corpus —
    // just an explode + broadcast-join + per-doc argmax.
    "tx_langid_ngram" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      // per-doc trigram arrays staged once per snapshot: the
      // filter(transform(...)) chain is interpreted (outside codegen)
      // and BOTH passes (profile training, doc scoring) consume it —
      // same re-evaluation multiplier measured for the shingle index
      val tri3 = StagedIndex.orStageAppendable(s, "tx_trigrams_v1", d,
        s"$d/documents.parquet") { dsub =>
        // pure per-row map — appendable (O(delta) ingest)
        dsub.select(col("doc_id"), col("lang"),
          expr("filter(transform(sequence(1, length(text)), " +
            "i -> substring(text, i, 3)), x -> length(x) = 3)").alias("gs"))
      }
      // r13 decision: a row-local per-doc (g, tf) pre-aggregate (an
      // ArrayTermCounts kernel, the TermCounts pattern over the
      // trigram array) was built and MEASURED AGAINST this spelling —
      // and rejected. The explode below feeds a map-side-combining
      // partial aggregate, so occurrences never cross an exchange;
      // the kernel only re-implements that partial aggregate's
      // hashing in interpreted per-row code (LinkedHashMap + byte
      // clones per doc). In-session A/B over the staged ×100 replica
      // trigram table: legacy 0.54–0.55 s steady vs kernel 2.9–12 s
      // (GC-inflated); warm best at sf0.1: 1.50 vs 1.76 s. Plans:
      // plans/r13/tx_langid_ngram_{before,kernel_rejected}.txt.
      val occ = tri3.select(col("lang"), explode(col("gs")).alias("g"))
        .groupBy("lang", "g").agg(count(lit(1)).alias("n"))
      val wRank = Window.partitionBy("lang")
        .orderBy(col("n").desc, col("g").asc)
      val profile = occ.withColumn("rk", row_number().over(wRank))
        .filter(col("rk") <= ProfileK)
        .select(col("lang").alias("plang"), col("g"))
      val dtri = tri3.select(col("doc_id"),
        explode(array_distinct(col("gs"))).alias("g"))
      val scores = dtri.join(broadcast(profile), "g")
        .groupBy("doc_id", "plang").agg(count(lit(1)).alias("score"))
      val wBest = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("plang").asc)
      val best = scores.withColumn("brk", row_number().over(wBest))
        .filter(col("brk") === 1)
        .select(col("doc_id"), col("plang"), col("score"))
      docs.select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("plang"), lit("und")).alias("predicted"),
          coalesce(col("score"), lit(0L)).alias("score"),
          when(coalesce(col("plang"), lit("und")) === col("lang"), 1L)
            .otherwise(0L).alias("hit"))
        .orderBy("doc_id")
    }),

    // Language-model quality scoring, the CCNet/Wenzek et al. (2020)
    // filtering signal: train an add-one-smoothed character-bigram LM
    // on the corpus, score every document by its bigram probability
    // mass. p(c2|c1) = (count(c1c2)+1)/(count(c1·)+V) is an exact
    // rational — integers through one correctly-rounded IEEE division,
    // so both engines compute bit-identical probabilities — and each
    // doc's score sums floor(1e6·tf·p) per bigram TYPE as an int64, so
    // the cross-row sum is order-independent (a raw double log-prob
    // sum would differ run-to-run with shuffle order). In production
    // the model table comes from a trusted reference corpus; either
    // way it is vocabulary-sized (|chars|²) and broadcast, so scoring
    // is explode + broadcast-join + keyed agg — the corpus never
    // shuffles unreduced.
    "tx_lm_score" -> ((s, d) => lmScoreOf(s, d).orderBy("doc_id")),

    // Inverted-index build — the retrieval-side corpus structure
    // (term → sorted posting list + df) a search/RAG stack derives
    // from the same corpus it trains on. Scale discipline: posting
    // lists are only COLLECTED for the TopTerms selected terms — the
    // term-selection pass reduces the corpus to a vocabulary-sized df
    // table first (map-side-combined agg), picks top-K there
    // (TakeOrdered over the aggregate, never a corpus sort), and only
    // then joins back to gather postings for those K terms, so no
    // stop-word-sized list ever materializes for an unselected term;
    // the posting string for a selected term is bounded by its df.
    "tx_inverted_index" -> ((s, d) => {
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(w)).alias("term"))
      val df = pairs.groupBy("term").agg(count(lit(1)).alias("df"))
      val top = df.orderBy(col("df").desc, col("term").asc)
        .limit(TopTerms)
      pairs.join(broadcast(top), "term")
        .groupBy("term", "df")
        .agg(expr("array_join(transform(sort_array(collect_list(" +
          "doc_id)), x -> cast(x as string)), ',')").alias("postings"))
        .select(col("term"), col("df"), col("postings"))
        .orderBy(col("df").desc, col("term").asc)
    }),

    // BM25-shaped lexical retrieval (Robertson & Walker 1994; the
    // idf is the same exact-rational N/df variant tx_tfidf uses —
    // BM25's ln() idf is a transcendental no cross-engine oracle can
    // replay). Query terms are picked FROM the corpus (df ranks
    // 11-13: content words just below the stop-word plateau — same
    // terms at any SF, no hardcoded vocabulary), per-(doc, term)
    // scores floor to integer micro-units BEFORE the per-doc sum so
    // the sum is order-independent (the tx_lm_score trick: a raw
    // double sum varies with shuffle order). Scale shape: tf and
    // doc-length are corpus-keyed aggs/joins on doc_id, the query
    // table is 3 rows broadcast, corpus stats are a 1-row scalar
    // broadcast, and the top-10 is a TakeOrdered, never a global
    // sort.
    "tx_bm25_topk" -> ((s, d) => {
      val c = bm25Corpus(Tables.documents(s, d))
      val wQ = org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("term").asc)
      val qterms = c.dft.withColumn("rn", row_number().over(wQ))
        .filter(col("rn").between(11, 13))
        .select(col("term"), col("df"))
      c.tf.join(broadcast(qterms), "term")
        .join(c.dlen, "doc_id")
        .crossJoin(broadcast(c.stats))
        .select(col("doc_id"), bm25Micro.alias("sm"))
        .groupBy("doc_id")
        .agg(sum(col("sm")).alias("bm25_micro"),
          count(lit(1)).alias("n_terms"))
        .orderBy(col("bm25_micro").desc, col("doc_id").asc)
        .limit(10)
    }),

    // Quality-decile binning for curriculum / quality-bucketed
    // sampling (the FineWeb/DCLM recipe: train-time mixing keyed on a
    // model-based quality bucket, not a hard keep/drop). Per-doc
    // quality = LM score per bigram (length-normalized, exact
    // integral division); the global decile comes from the same
    // constant-group GroupRank as tx_shard — a range-partitioned
    // global rank, never an ORDER-BY-everything window — and
    // ntileFromRank turns (rank, n) into the SQL-standard ntile(10)
    // arithmetically. Scale shape: lmScoreOf's staged/broadcast plan
    // plus one balanced range shuffle of the doc-sized score table.
    "tx_quality_bins" -> ((s, d) => qualityDeciles(s, d).orderBy("doc_id")),

    // Text normalization: lowercase, strip non-alphanumerics to
    // spaces, collapse runs, trim — the canonical pre-tokenization
    // cleanup pass. Pure per-row expressions, runs at scan speed.
    // Duplicated-span REMOVAL accounting (the step after
    // dd_span_dedup's measurement — Lee et al. 2022's ExactSubstr
    // deduplicates by CUTTING the repeated spans, not dropping docs):
    // a word position is cut when any corpus-repeated 16-gram covers
    // it, so the table reports per doc how many words survive span
    // stripping and the keep ratio the cut implies. Positions come
    // from the NON-distinct positional gram list (an intra-doc repeat
    // is a repeat — dd_span_dedup's distinct-per-doc index answers a
    // different question), so coverage is exact: explode each
    // duplicated gram into its 16 positions, count distinct positions
    // per doc. Scale shape: one map-side-combined occurrence count
    // per gram hash (8-byte rows over the shuffle), one equi-join
    // back, a bounded 16× position explode ONLY for duplicated grams
    // (rare on a clean corpus), and a doc-keyed distinct count;
    // under-16-word docs take the zero-cut left-join branch.
    "tx_span_strip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val grams = posGrams(s, d)
      val dup = grams.groupBy("gh")
        .agg(count(lit(1)).alias("occ"))
        .filter(col("occ") >= 2)
        .select(col("gh"))
      val cut = grams.join(dup, "gh")
        .select(col("doc_id"),
          explode(expr("sequence(p, p + 15)")).alias("cp"))
        .groupBy("doc_id")
        .agg(countDistinct(col("cp")).alias("n_cut_words"))
      docs.select(col("doc_id"), size(w).cast(LongType).alias("n_words"))
        .join(cut, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("n_cut_words"), lit(0L)).alias("n_cut_words"))
        .withColumn("keep_ppm",
          expr("(n_words - n_cut_words) * 1000000 div n_words"))
        .orderBy("doc_id")
    }),

    // Duplicated-span CUTTING — the rewrite step tx_span_strip only
    // ACCOUNTS for (Lee et al. 2022 ExactSubstr deduplicates by
    // removing the repeated spans and keeping the document): emit
    // each doc's text with every word position covered by a
    // corpus-repeated 16-gram removed, plus the surviving word
    // count. Scale shape: tx_span_strip's linear pipeline (postings
    // joined to the DISTINCT duplicated-gram set — f rows for a gram
    // repeated f times, never f²), then one per-doc ordered
    // reassembly: collect_list is bounded by document length and
    // grouped on the doc key, the corpus's natural partitioning.
    // A fully-boilerplate doc cuts to the empty string.
    // r12 row-local reassembly (guide §8's "move heavy bytes once"):
    // the first spelling posexploded EVERY word of EVERY doc and
    // shuffled the word rows twice (the cut anti-join, then the
    // collect_list groupBy) plus a per-doc array_sort — corpus bytes
    // × 2 over the network at any scale, for a decision that only
    // needs the per-doc CUT POSITION SET (small: only docs containing
    // corpus-repeated grams have one). Now the positions aggregate
    // doc-locally (collect_set over the rare duplicated-gram rows),
    // attach to the corpus by ONE doc-keyed equi-join, and the
    // rewrite runs row-locally at scan speed through the native
    // CutWords kernel — byte-parity with the exploded spelling pinned
    // by CutWordsSpec; the interpreted-HOF row-local variant measured
    // SLOWER than the exploded baseline (1.49 vs 1.39 s sf0.1), the
    // recurring per-element-lambda finding. Corpus text crosses the
    // network exactly once; the oracle keeps the exploded spelling
    // and still hash-matches.
    "tx_span_cut" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val grams = posGrams(s, d)
      val dup = grams.groupBy("gh")
        .agg(count(lit(1)).alias("occ"))
        .filter(col("occ") >= 2)
        .select(col("gh"))
      val cutPos = grams.join(dup, "gh")
        .select(col("doc_id"),
          explode(expr("sequence(p, p + 15)")).alias("p"))
        .groupBy("doc_id")
        .agg(collect_set(col("p")).alias("cuts"))
      docs.select(col("doc_id"), col("text"))
        .join(cutPos, Seq("doc_id"), "left")
        .select(col("doc_id"), graft.functions.CutWords(col("text"),
          coalesce(col("cuts"), expr("array()").cast("array<bigint>")))
          .alias("m"))
        // NULL text nulls the whole kernel struct (nullIntolerant);
        // the legacy left-join restore mapped those docs to ("", 0)
        .select(col("doc_id"),
          coalesce(col("m").getField("kept_text"), lit(""))
            .alias("kept_text"),
          coalesce(col("m").getField("n_kept_words"), lit(0L))
            .alias("n_kept_words"))
        .orderBy("doc_id")
    }),

    // Per-domain boilerplate stripping — the CCNet/C4 curation pass
    // production crawls run that the span family doesn't cover:
    // dd_span_dedup finds corpus-WIDE repeated substrings and
    // tx_span_cut rewrites them, but nav bars / footers / cookie
    // banners are DOMAIN-scoped repeated lines, stripped by
    // within-domain line document frequency (see BoilerplateDf). A
    // line here is a fixed 5-word segment (BoilerplateLineWords —
    // the deterministic stand-in for the newline split this corpus
    // lacks). Emits per doc the line count, how many lines were
    // stripped, and the rewritten text. Scale shape (r12 row-local
    // strip, the tx_span_cut discipline): the df table is O(domains
    // × distinct lines) rows of (source, 8-byte line hash) — only
    // hashes cross the df shuffle, map-side combined after the
    // per-doc distinct. The legacy strip then shuffled one row per
    // LINE — carrying the line STRING, ~1.5× corpus bytes — twice
    // (the (source, lh) anti-join, then the reassembly
    // groupBy(doc_id)); now the per-domain boilerplate hash SET
    // (the df ≥ threshold tail, small by construction) aggregates
    // once, attaches by one dimension equi-join, and the strip +
    // reassembly run row-locally at scan speed through the native
    // StripSegments kernel (byte-parity pinned by StripSegmentsSpec;
    // the oracle keeps the exploded anti-join spelling and still
    // hash-matches). Corpus text never crosses an exchange but the
    // output ORDER BY. No corpus-wide state: a new domain only ever
    // meets its own lines.
    "tx_boilerplate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val W = BoilerplateLineWords
      val nLines = ceil(size(w) / lit(W.toDouble)).cast(LongType)
      // the line segmentation itself is NOT staged: the exploded
      // line table carries every line string (~1.5× the corpus) and
      // scanning it back costs more I/O at scale than re-splitting
      // text at scan speed (measured: ×100 steady 9.2 s staged-lines
      // vs 4.1 s inline). What IS worth staging is the per-domain
      // line-hash DF AGGREGATE — O(domains × distinct lines) rows of
      // (source, 8-byte hash, count), no strings — computed once per
      // snapshot; the threshold is applied at read, so retuning the
      // knob never restages
      def lines(in: DataFrame): DataFrame = {
        val ws = split(col("text"), " ")
        val nl = ceil(size(ws) / lit(W.toDouble)).cast(LongType)
        val segs = transform(
          sequence(lit(0L), nl - 1),
          i => struct(i.alias("line_no"),
            array_join(slice(ws, (i * W + 1).cast("int"), lit(W)), " ")
              .alias("line")))
        in.select(col("doc_id"), col("source"), explode(segs).alias("ln"))
          .select(col("doc_id"), col("source"),
            col("ln.line_no").alias("line_no"),
            col("ln.line").alias("line"))
          .withColumn("lh", DedupQueries.h60(col("line")))
      }
      // within-domain df over DISTINCT documents (a line repeated
      // inside one doc is repetition, not boilerplate — tx_repetition
      // owns that signal)
      val dfTable = StagedIndex.orStage(s, s"tx_boiler_df_v1_w$W", d,
        Seq(s"$d/documents.parquet")) {
        lines(docs).select(col("source"), col("lh"), col("doc_id"))
          .distinct()
          .groupBy("source", "lh")
          .agg(count(lit(1)).alias("df"))
      }
      val boilerSets = dfTable
        .filter(col("df") >= boilerplateDf(s))
        .groupBy("source")
        .agg(collect_set(col("lh")).alias("bhs"))
      docs.select(col("doc_id"), col("source"), col("text"),
          nLines.alias("n_lines"))
        .join(boilerSets, Seq("source"), "left")
        .select(col("doc_id"), col("n_lines"),
          graft.functions.StripSegments(col("text"),
            coalesce(col("bhs"), expr("array()").cast("array<bigint>")), W)
            .alias("m"))
        // NULL text nulls the kernel struct; the legacy exploded
        // spelling produced no line rows for those docs and the
        // left-join restore mapped them to ("", 0 kept)
        .select(col("doc_id"), col("n_lines"),
          (col("n_lines") - coalesce(col("m").getField("n_kept"), lit(0L)))
            .alias("n_stripped_lines"),
          coalesce(col("m").getField("kept_text"), lit(""))
            .alias("kept_text"))
        .orderBy("doc_id")
    }),

    "tx_normalize" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          norm.alias("norm"),
          size(split(norm, " ")).cast(LongType).alias("n_norm_tokens"))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition quality gate (Rae et al. 2021 repetition
    // rules, engine-portable): per doc the most-frequent-word mass
    // fraction and the duplicate-3-gram fraction, plus the keep/drop
    // verdict. Scale shape: one map-side-combining count on
    // (doc_id, word), a per-doc re-agg, and a doc-keyed join against a
    // scan-speed projection — no corpus-wide state anywhere.
    "tx_repetition" -> ((s, d) => {
      // r12 zero-shuffle shape: maxn (most frequent word's count) and
      // nw (token count) are row-local facts of one document, so the
      // native TermCounts kernel + array_max replace the old
      // explode → groupBy(doc_id, wd) → re-agg → self-join pipeline
      // (2 corpus exchanges + 1 join → pure per-row projection; the
      // only remaining exchange is the output ORDER BY). The
      // isNotNull filter reproduces the old inner join's implicit
      // contract: a NULL-text doc produced no exploded rows and was
      // dropped.
      val top = Tables.documents(s, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          array_max(graft.functions.TermCounts(col("text"))
            .getField("tf")).alias("maxn"),
          size(w).cast(LongType).alias("nw"),
          greatest(size(w) - 2, lit(0)).cast(LongType).alias("tot3"),
          size(graft.functions.WordShingles(col("text"), 3))
            .cast(LongType).alias("d3"))
      val topFrac = col("maxn").cast("double") / col("nw")
      val dupFrac = when(col("tot3") > 0,
        lit(1.0) - col("d3").cast("double") / col("tot3")).otherwise(0.0)
      top
        .select(col("doc_id"), col("maxn"), col("nw"),
          topFrac.alias("top_frac"), col("tot3"), col("d3"),
          dupFrac.alias("dup3_frac"),
          (topFrac <= 0.15 && dupFrac <= 0.02).alias("keep"))
        .orderBy("doc_id")
    }),

    // PII detection + redaction: email / phone / IPv4 regex hits and
    // the redacted text — the privacy-scrubbing pass every training
    // corpus gets. The synthetic corpus carries no PII, so the query
    // demonstrates the shape on a deterministically-synthesized
    // contact suffix (both engines build the same string, so the
    // regexes genuinely fire and the hash check is substantive);
    // PiiSpec pins the semantics on realistic text. Pure per-row
    // expressions — scan speed, zero shuffle.
    "tx_pii" -> ((s, d) => {
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 100).cast("string"))
      Tables.documents(s, d)
        .withColumn("pt", withPii)
        .select(
          col("doc_id"),
          regexp_count(col("pt"), lit(PiiEmail)).cast(LongType)
            .alias("n_email"),
          regexp_count(col("pt"), lit(PiiPhone)).cast(LongType)
            .alias("n_phone"),
          regexp_count(col("pt"), lit(PiiIp)).cast(LongType).alias("n_ip"),
          redact(col("pt")).alias("redacted"))
        .withColumn("has_pii",
          col("n_email") + col("n_phone") + col("n_ip") > 0)
        .orderBy("doc_id")
    }),

    // Corpus TF-IDF: document frequency per term (one map-side
    // combining agg over the (doc, term) counts), idf as the exact
    // rational N/df (single double division — no transcendental, so
    // engines agree bit-for-bit), per-doc top-3 terms by
    // score = tf*N/df. Scale shape: the df table is vocabulary-sized
    // (tiny vs the corpus) and broadcasts back onto the term counts;
    // the only corpus-scale shuffles are the (doc, term) agg and the
    // per-doc top-k window.
    "tx_tfidf" -> ((s, d) => tfidfTopK(Tables.documents(s, d))),

    // The composite quality gate a training pipeline actually runs:
    // every per-doc signal (length, type-token ratio, stopword ratio,
    // top-word mass, duplicate-3-gram mass) folded into one keep/drop
    // verdict, with a fail bitmask naming every rule a document
    // broke (bit 0 length, 1 ttr, 2 stopword, 3 repetition, 4
    // dup-3-gram). Same scale shape as tx_repetition: one
    // map-side-combining (doc, word) count, a per-doc re-agg, one
    // doc-keyed join against a scan-speed projection.
    "tx_filter_verdict" -> ((s, d) =>
      filterVerdicts(s, d).orderBy("doc_id")),

    // The classifier's GENERALIZATION calibration — train the
    // likelihood-ratio weights on even doc_ids only, score the
    // held-out odd half (unseen buckets fall back to the train
    // model's nk=nd=0 default, the same rule the streaming scorer
    // serves). The honest number next to tx_quality_clf's training
    // agreement: on THIS corpus held-out accuracy sits AT the base
    // rate (59% vs 58% at sf0.01, 50.5% vs 51.2% at sf0.1) because
    // the synthetic vocabulary is class-independent — the gate
    // labels are structural (length/ttr/stopwords), so a
    // vocabulary-feature model can only memorize doc-specific
    // bigrams, and the 82% training agreement is exactly that
    // memorization made visible. On real corpora vocabulary
    // correlates with quality and this split is the DCLM operating
    // measurement; the query exists so the pipeline MEASURES
    // generalization instead of trusting training accuracy — the
    // dd_sketch_error genre (calibration queries whose value is the
    // error they expose).
    "tx_clf_holdout" -> ((s, d) => {
      val labels = filterVerdicts(s, d).select(col("doc_id"), col("keep"))
      val feat = qcFeatures(s, d)
      val counts = feat.filter(col("doc_id") % 2 === 0)
        .join(labels, "doc_id")
        .groupBy("bucket")
        .agg(sum(when(col("keep"), col("tf")).otherwise(0L)).alias("nk"),
          sum(when(col("keep"), 0L).otherwise(col("tf"))).alias("nd"))
      val tots = counts.agg(sum(col("nk")).alias("tnk"),
        sum(col("nd")).alias("tnd"))
      val wts = counts.crossJoin(broadcast(tots))
        .select(col("bucket"),
          expr(s"(nk + 1) * (tnd + $QcB) * 1000000" +
            s" div ((nd + 1) * (tnk + $QcB))").alias("r_ppm"))
      val score = feat.filter(col("doc_id") % 2 === 1)
        .join(broadcast(wts), Seq("bucket"), "left")
        .crossJoin(broadcast(tots))
        .select(col("doc_id"), col("tf"),
          coalesce(col("r_ppm"),
            expr(s"(tnd + $QcB) * 1000000 div (tnk + $QcB)")).alias("r"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).alias("n_feats"),
          expr("sum(CASE WHEN r >= 1000000 THEN tf ELSE 0 END)" +
            " * 1000000 div sum(tf)").alias("vote_ppm"))
      labels.filter(col("doc_id") % 2 === 1)
        .join(score, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_feats"), lit(0L)).alias("n_feats"),
          coalesce(col("vote_ppm"), lit(QcKeepPpm)).alias("vote_ppm"),
          (coalesce(col("vote_ppm"), lit(QcKeepPpm)) >= QcKeepPpm)
            .alias("pred_keep"),
          col("keep"),
          when((coalesce(col("vote_ppm"), lit(QcKeepPpm)) >= QcKeepPpm)
            === col("keep"), 1L).otherwise(0L).alias("hit"))
        .orderBy("doc_id")
    }),

    // The classifier feature family that GENERALIZES on this corpus —
    // the completion of the tx_clf_holdout story (r11 verdict #3).
    // tx_clf_holdout proved the harness by exposing memorization: the
    // synthetic vocabulary carries no class signal, so hashed-bigram
    // features score base rate held out. The gate labels are
    // STRUCTURAL (length/ttr/stopword/top-word/dup-3-gram
    // thresholds), so binned structural features — length in 25-token
    // bins, ttr/stop/top/dup ratios in decile-ish integer bins, five
    // feature ids per doc, tf=1 — fed through the SAME integer-ppm
    // likelihood-ratio machinery (train on even doc_ids, score odd
    // held out, unseen ids at the train default, majority vote at
    // QcKeepPpm) MUST clear base rate if the harness measures real
    // generalization. It does: held-out accuracy 89.6% at sf0.01 /
    // 86.8% at sf0.1 vs 58%/51.2% base rates (DuckDB-prototyped
    // before committing; a 4-of-5 unanimity-leaning threshold
    // measures higher still — 94%/93% — because the gate is a
    // conjunction, but the threshold stays QcKeepPpm so the
    // bigram/struct rows differ in exactly one variable: the feature
    // family). Scale shape: the feature pass is a pure per-row
    // projection over the STAGED per-doc verdict table (one narrow
    // scan, no corpus shuffle at all); training aggregates ≤ ~70
    // feature-id groups map-side; weights broadcast back.
    "tx_clf_struct" -> ((s, d) => {
      val feat = structFeaturesOf(filterVerdicts(s, d))
      val (wts, tots) = structClfWeights(feat.filter(col("doc_id") % 2 === 0))
      feat.filter(col("doc_id") % 2 === 1)
        .join(broadcast(wts), Seq("fid"), "left")
        .crossJoin(broadcast(tots))
        .select(col("doc_id"), col("keep"),
          coalesce(col("r_ppm"),
            expr(s"(tnd + $QcStructB) * 1000000" +
              s" div (tnk + $QcStructB)")).alias("r"))
        .groupBy("doc_id", "keep")
        .agg(count(lit(1)).alias("n_feats"),
          expr("sum(CASE WHEN r >= 1000000 THEN 1 ELSE 0 END)" +
            " * 1000000 div count(*)").alias("vote_ppm"))
        .select(col("doc_id"), col("n_feats"), col("vote_ppm"),
          (col("vote_ppm") >= QcKeepPpm).alias("pred_keep"),
          col("keep"),
          when((col("vote_ppm") >= QcKeepPpm) === col("keep"), 1L)
            .otherwise(0L).alias("hit"))
        .orderBy("doc_id")
    }),

    // The LEARNED quality classifier — the DCLM/fastText production
    // curation pass (hashed word-bigram features, labels distilled
    // from the oracled tx_filter_verdict gate, per-bucket
    // likelihood-ratio weights as the "trained" model). Train = one
    // map-side-combined (bucket, label) count agg (≤ QcB rows,
    // integer-exact ratio vs the 1-row class totals); infer =
    // broadcast the weight table back and score every document at
    // scan speed — vote_ppm = the fraction of its bigram occurrences
    // in keep-leaning buckets, exact integer division; predicted
    // kept at majority. Measures 82% agreement with the gate at
    // sf0.01 (base rate 53%). Reports per doc: score, prediction,
    // the gate label it distilled from, and the agreement bit — so
    // accuracy is one sum away. See [[qualityClfParts]] for the
    // scale shape and the rejected raw-posterior first cut;
    // streaming twin `StreamingQualityClf` serves the same weights
    // densified through the native H60BucketSum loop.
    "tx_quality_clf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (labels, feat, wts, _) = qualityClfParts(docs,
        Some(filterVerdicts(s, d).select(col("doc_id"), col("keep"))),
        Some(qcFeatures(s, d)))
      val score = feat.join(broadcast(wts), "bucket")
        .groupBy("doc_id")
        .agg(sum(col("tf")).alias("n_feats"),
          expr("sum(CASE WHEN r_ppm >= 1000000 THEN tf ELSE 0 END)" +
            " * 1000000 div sum(tf)").alias("vote_ppm"))
      labels.join(score, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_feats"), lit(0L)).alias("n_feats"),
          coalesce(col("vote_ppm"), lit(QcKeepPpm)).alias("vote_ppm"),
          (coalesce(col("vote_ppm"), lit(QcKeepPpm)) >= QcKeepPpm)
            .alias("pred_keep"),
          col("keep"),
          when((coalesce(col("vote_ppm"), lit(QcKeepPpm)) >= QcKeepPpm)
            === col("keep"), 1L).otherwise(0L).alias("hit"))
        .orderBy("doc_id")
    }),

    // Count-min sketch (Cormode & Muthukrishnan 2005): estimate
    // bigram document frequencies through a 4×1024 sketch and report,
    // for the top-20 true heavy hitters, the true df, the CMS
    // estimate (min over the 4 hash rows), and the overcount — the
    // one-sided error the sketch guarantees (the ~3.6k-bigram
    // vocabulary genuinely collides in 1024 buckets, so the error is
    // visible and still oracle-exact). Row hashes: ONE 60-bit md5 per
    // occurrence, sliced into four disjoint 15-bit bucket keys — a
    // quarter of the digest work of per-row seeded hashing, which is
    // the dominant cost of a sketch build at corpus scale. Scale
    // shape: the build is one map-side-combining agg to ≤4096 rows no
    // matter the corpus size (the point of a sketch); the top-k is
    // TakeOrderedAndProject; estimates join the tiny sketch broadcast.
    "tx_cms_topk" -> ((s, d) => {
      val width = cmsWidth(s)
      val words = Tables.documents(s, d)
        .select(explode(graft.functions.WordShingles(col("text"), 2))
          .alias("wd"))
      def buckets(h: Column): Seq[Column] = (0 until CmsDepth).map(j =>
        struct(lit(j).alias("j"),
          shiftright(h, j * 15).bitwiseAND(width - 1).alias("bkt")))
      val sketch = words
        .withColumn("h", DedupQueries.h60(col("wd")))
        .select(explode(array(buckets(col("h")): _*)).alias("jb"))
        .groupBy(col("jb.j").alias("j"), col("jb.bkt").alias("bkt"))
        .agg(count(lit(1)).alias("cnt"))
      val top = words.groupBy("wd")
        .agg(count(lit(1)).alias("true_n"))
        .orderBy(col("true_n").desc, col("wd").asc)
        .limit(20)
      val est = top
        .withColumn("h", DedupQueries.h60(col("wd")))
        .select(col("wd"), col("true_n"),
          explode(array(buckets(col("h")): _*)).alias("jb"))
        .select(col("wd"), col("true_n"),
          col("jb.j").alias("j"), col("jb.bkt").alias("bkt"))
        .join(broadcast(sketch), Seq("j", "bkt"))
        .groupBy("wd", "true_n")
        .agg(min(col("cnt")).alias("est_n"))
      est.select(col("wd"), col("true_n"), col("est_n"),
          (col("est_n") - col("true_n")).alias("overcount"))
        .orderBy(col("true_n").desc, col("wd").asc)
    }),

    // Sequence packing for training batches: lay documents head-to-
    // tail inside each lang shard (deterministic doc_id order) and
    // assign every document the context-window bin its first token
    // lands in (PackLen-token bins) plus its offset in that bin — the
    // batch-prep pass that turns a filtered corpus into fixed-length
    // training rows. Scale shape: two-level cumsum (per-range-
    // partition local cumsum + broadcast chunk offsets) — never a
    // per-lang or global window, either of which would funnel a
    // corpus-sized shard through one task; see packOf/GroupRank.
    "tx_pack" -> ((s, d) => packOf(Tables.documents(s, d))),

    // Packing-efficiency report — the dataset-card table that says
    // whether the context-window layout is actually tight: per
    // language shard, document/token totals, bin count, the fill
    // rate of the allocated bins in exact floored micro-units, and
    // how many documents straddle a bin boundary (straddlers are the
    // rows a loader must split or pad around). Scale shape: rides on
    // tx_pack's GroupRank cumsum, then one map-side-combined agg to
    // O(langs) rows.
    "tx_pack_stats" -> ((s, d) => {
      packOf(Tables.documents(s, d))
        .groupBy("lang")
        .agg(count(lit(1)).alias("n_docs"),
          sum(col("n_tokens")).alias("total_tokens"),
          (max(col("bin")) + 1L).alias("n_bins"),
          sum(when(col("offset") + col("n_tokens") > PackLen, 1L)
            .otherwise(0L)).alias("straddlers"))
        .withColumn("fill_micro",
          expr(s"total_tokens * 1000000 div (n_bins * $PackLen)"))
        .orderBy("lang")
    }),

    // Deterministic stratified sampling: rank docs inside each lang
    // stratum by a content hash and keep the top ceil(10%) — the
    // reproducible downsampling a training-data pipeline needs (same
    // corpus ⇒ same sample on any engine, any partitioning). The
    // per-stratum rank and the stratum size both come scale-safe from
    // GroupRank (a lang-keyed window would be one task per language);
    // the 10% cut compares the global rank against the broadcast
    // stratum count.
    "tx_sample" -> ((s, d) => {
      val h = DedupQueries.h60(col("text"))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), h.alias("h"))
      GroupRank.rank(base, "lang", Seq(col("h").asc, col("doc_id").asc))
        .withColumnRenamed("grp_n", "stratum_n")
        .filter(col("rn") <= expr("(stratum_n + 9) div 10"))
        .select(col("doc_id"), col("lang"), col("rn"), col("stratum_n"))
        .orderBy("lang", "rn")
    }),

    // Per-source document cap — the C4/RefinedWeb-style curation rule
    // "at most K documents per domain", keeping the K longest by a
    // deterministic order. `source` is a fixed 20-value dimension, so
    // this is exactly GroupRank + localLimit territory: the
    // WindowGroupLimit bounds per-partition state at K rows per
    // (partition, source) and only ~P×20×K rows ever shuffle.
    "tx_source_cap" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      GroupRank.rank(base, "source",
          Seq(col("n_chars").desc, col("doc_id").asc),
          localLimit = Some(SourceCap))
        .filter(col("rn") <= SourceCap)
        .select(col("doc_id"), col("source"), col("rn").alias("rk"),
          col("grp_n").alias("src_n"))
        .orderBy("source", "rk")
    }),

    // Temperature-resampled multilingual mixing (the mC4/XLM-R α=0.5
    // recipe): per-language quotas proportional to sqrt(count) — low-
    // resource languages upweighted relative to their share — then a
    // deterministic hash-ranked draw of quota_l docs per language.
    // Integer-robust by construction: weights are floor(sqrt(n))
    // (sqrt is IEEE-correctly-rounded, so both engines floor the same
    // double), quotas are ceiling integer division, and the draw
    // order is the content hash — same corpus ⇒ same sample on any
    // engine. Scale shape: the counts/weights/quota tables are
    // O(languages) rows (the 1-row total is a whitelisted scalar
    // aggregate), broadcast back onto a GroupRank global rank.
    "tx_sample_weighted" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).alias("n"))
      val w = counts.select(col("lang"),
        floor(sqrt(col("n").cast("double"))).cast(LongType).alias("wt"))
      val tot = w.agg(sum(col("wt")).alias("tw"))
      val quota = w.crossJoin(broadcast(tot))
        .select(col("lang"),
          expr(s"($SampleTarget * wt + tw - 1) div tw").alias("quota"))
      val base = docs.select(col("doc_id"), col("lang"),
        DedupQueries.h60(col("text")).alias("h"))
      // quota_l = ceil(T·w_l/W) ≤ T always, so pruning local ranks
      // beyond SampleTarget is lossless and WindowGroupLimit keeps
      // per-partition state at T rows per (partition, lang)
      GroupRank.rank(base, "lang", Seq(col("h").asc, col("doc_id").asc),
          localLimit = Some(SampleTarget))
        .join(broadcast(quota), "lang")
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("rn"), col("quota"))
        .orderBy("lang", "rn")
    }),

    // Deterministic global shuffle into balanced training shards —
    // the "shuffle the corpus once, split into N shard files" step a
    // training run starts from (data order must be pseudo-random,
    // reproducible, and identical on every engine/partitioning).
    // The shuffle key is the content hash; GroupRank with a constant
    // group yields a range-partitioned GLOBAL rank over it (hashes
    // are uniform, so the range partitions are balanced by
    // construction and no task ever sorts more than one partition);
    // shard = (rank-1) mod N round-robins to exactly-balanced shards
    // and pos = (rank-1) div N is the within-shard order.
    "tx_shard" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), DedupQueries.h60(col("text")).alias("h"))
        .withColumn("g", lit(0))
      GroupRank.rank(base, "g", Seq(col("h").asc, col("doc_id").asc))
        .select(col("doc_id"),
          expr(s"(rn - 1) % $NShards").alias("shard"),
          expr(s"(rn - 1) div $NShards").alias("pos"))
        .orderBy("shard", "pos")
    }),

    // Corpus mixture planner — the per-(lang, source) sampling-weight
    // table a training run is configured from (the DoReMi/mC4 recipe's
    // input): token totals per domain, sqrt-temperature weight
    // (α = 0.5, integer-robust floor(sqrt) as in tx_sample_weighted),
    // and both the temperature share and the natural share in exact
    // ppm integer arithmetic. Scale shape: one map-side-combined agg
    // collapses the corpus to O(langs × sources) rows; the 1-row
    // grand-total scalar is broadcast back onto that tiny table —
    // nothing corpus-sized moves after the first agg.
    "tx_mixture" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).alias("n_docs"),
          sum(size(w).cast(LongType)).alias("tokens"))
        .withColumn("wt",
          floor(sqrt(col("tokens").cast("double"))).cast(LongType))
      val tot = g.agg(sum(col("wt")).alias("tw"),
        sum(col("tokens")).alias("tt"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"), col("tokens"),
          col("wt"),
          expr("(wt * 1000000) div tw").alias("share_ppm"),
          expr("(tokens * 1000000) div tt").alias("raw_ppm"))
        .orderBy("lang", "source")
    }),

    // PMI collocation mining (Church & Hanks 1990): bigrams whose
    // document co-occurrence outstrips what their parts' independent
    // document frequencies predict — the phrase-detection pass that
    // feeds tokenizer vocab curation (word2vec's phrase merging uses
    // the same ratio). Score is the exact-rational PMI argument
    // floor(1e6 · df(ab)·N / (df(a)·df(b))): log is monotone, so the
    // integer ranking IS the PMI ranking, and both engines floor the
    // same i64 products (at corpus scale the product would move to
    // log-space doubles — ordering-equivalent, documented knob).
    // Scale shape: two map-side-combined aggs collapse the corpus to
    // the vocab-/bigram-sized count tables, the two unigram joins are
    // plain equi-joins on the word key (AQE broadcasts if tiny), the
    // 1-row N scalar broadcasts, and the top-20 is TakeOrdered —
    // nothing corpus-sized survives past the first aggregation.
    "tx_collocations" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val uni = docs
        .select(explode(graft.functions.WordShingles(col("text"), 1))
          .alias("wd"))
        .groupBy("wd").agg(count(lit(1)).alias("wdf"))
      val bi = docs
        .select(explode(graft.functions.WordShingles(col("text"), 2))
          .alias("bigram"))
        .groupBy("bigram").agg(count(lit(1)).alias("pair_df"))
        .filter(col("pair_df") >= 5L)
      val n = docs.agg(count(lit(1)).alias("n"))
      bi
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.select(col("wd").alias("w1"), col("wdf").alias("w1_df")),
          "w1")
        .join(uni.select(col("wd").alias("w2"), col("wdf").alias("w2_df")),
          "w2")
        .crossJoin(broadcast(n))
        .withColumn("pmi_micro",
          expr("(1000000 * pair_df * n) div (w1_df * w2_df)"))
        .orderBy(col("pmi_micro").desc, col("bigram").asc)
        .limit(20)
        .select("bigram", "pair_df", "w1_df", "w2_df", "pmi_micro")
    }),

    // Length profile — the dataset-card histogram: per (lang,
    // 10-token length bin) document counts, token totals and bin
    // bounds. The table a mixture re-plan, a packing-efficiency
    // estimate, or a truncation-policy decision reads first. One
    // map-side-combined agg straight off the scan (the key space is
    // |lang| × ~10 bins); everything integer.
    "tx_length_profile" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), size(w).cast(LongType).alias("n_tokens"))
        .withColumn("bin", expr("n_tokens div 10"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).alias("n_docs"),
          sum(col("n_tokens")).alias("tokens"),
          min(col("n_tokens")).alias("min_tokens"),
          max(col("n_tokens")).alias("max_tokens"))
        .orderBy("lang", "bin")),

    // Class-based TF-IDF (the c-TF-IDF of BERTopic, Grootendorst
    // 2022): terms characteristic of each LANGUAGE rather than each
    // document — tf within the class, idf over classes (how many
    // languages contain the term), top-5 per language. The corpus-
    // domain analysis pass a curation run uses to see what each
    // slice is "about". Scale shape: the corpus collapses to the
    // (lang, term) tf table in one map-side-combined agg; the
    // per-term language count aggregates THAT table; the 1-row
    // class-count scalar broadcasts; and the per-lang top-5 is a
    // WindowGroupLimit-pruned rank whose window input is the
    // vocabulary-sized aggregate — a dimension-key partition over
    // reduced input, the exempt shape. Integer micro-unit scores.
    "tx_class_tfidf" -> ((s, d) => {
      val lt = Tables.documents(s, d)
        .select(col("lang"), explode(w).alias("term"))
        .groupBy("lang", "term")
        .agg(count(lit(1)).alias("tf"))
      val ldf = lt.groupBy("term")
        .agg(count(lit(1)).alias("ldf"))
      val nl = lt.select(col("lang")).distinct()
        .agg(count(lit(1)).alias("nlang"))
      val wR = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy(col("score_micro").desc, col("term").asc)
      lt.join(ldf, "term")
        .crossJoin(broadcast(nl))
        .withColumn("score_micro",
          expr("(tf * 1000000 * nlang) div ldf"))
        .withColumn("rk", row_number().over(wR).cast(LongType))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("term"), col("tf"),
          col("ldf"), col("score_micro"))
        .orderBy("lang", "rk")
    }),

    // DSIR-style importance weighting (Xie et al. 2023, "Data
    // Selection via Importance Resampling"): score every document by
    // how much its hashed-unigram profile resembles a target slice
    // (here lang='en' stands in for the high-quality reference
    // corpus), keep the top-100. See [[dsirScores]] for the
    // derivation and its scale shape; the top-100 is TakeOrdered and
    // the lang attach broadcasts the 100-row result against the dim
    // projection — the corpus-sized side never shuffles.
    "tx_dsir" -> ((s, d) => {
      val top = dsirScores(s, d)
        .orderBy(col("score_ppm").desc, col("doc_id").asc)
        .limit(100)
      Tables.documents(s, d).select("doc_id", "lang")
        .join(broadcast(top), "doc_id")
        .select(col("doc_id"), col("lang"), col("score_ppm"))
        .orderBy(col("score_ppm").desc, col("doc_id").asc)
    }),

    // The DSIR capstone — importance RESAMPLING, not just scoring:
    // rank the whole corpus by [[dsirScores]] and keep the top 20%,
    // then report the per-(lang, source) budget the selection spent —
    // the "what did importance weighting do to my mixture" audit
    // table a curation run reads before training. The global rank
    // runs on GroupRank's constant-group range partition (the corpus
    // never funnels through one task); the kept-verdict table joins
    // the dim projection id-to-id (two per-doc tables, the
    // pipe_curate join shape); sums stay integer ppm. Selection
    // fraction is exact: doc ranks rn with 5*rn <= N are kept, i.e.
    // floor(N/5) docs, deterministic under the (score desc, doc_id)
    // total order.
    "pipe_dsir" -> ((s, d) => {
      val ranked = GroupRank.rank(
        dsirScores(s, d).withColumn("g0", lit("all")),
        "g0", Seq(col("score_ppm").desc, col("doc_id").asc))
      val verdicts = ranked.select(col("doc_id"), col("score_ppm"),
        (col("rn") * 5L <= col("grp_n")).alias("keep"))
      Tables.documents(s, d).select("doc_id", "lang", "source")
        .join(verdicts, "doc_id")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).alias("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).alias("n_kept"),
          sum(when(col("keep"), col("score_ppm")).otherwise(0L))
            .alias("kept_score_sum"))
        .orderBy("lang", "source")
    }),

    // Lexical-diversity quality signal: Simpson diversity index over
    // the token multiset, 1 - sum(c_w^2)/n^2, in exact integer ppm —
    // the repetition-detecting cousin of tx_repetition that needs no
    // n-gram choice (a doc that is one word repeated scores 0; all-
    // distinct scores ~1e6). Computed per row as a single fold over
    // the SORTED token array (runs in the sorted array ARE the
    // per-word counts, so sum(run^2) needs no per-doc group-by): zero
    // shuffle, scan speed, the same sorted-run trick as gopherRules'
    // top-word count. The oracle keeps the naive unnest + group-by
    // form.
    "tx_diversity" -> ((s, d) => {
      val n = size(w).cast(LongType)
      val sumsq = aggregate(array_sort(w),
        struct(lit("").alias("prev"), lit(0L).alias("run"),
          lit(0L).alias("acc")),
        (st, x) => {
          val same = x === st.getField("prev")
          struct(x.alias("prev"),
            when(same, st.getField("run") + 1L).otherwise(lit(1L))
              .alias("run"),
            when(same, st.getField("acc"))
              .otherwise(st.getField("acc") +
                st.getField("run") * st.getField("run")).alias("acc"))
        },
        st => st.getField("acc") +
          st.getField("run") * st.getField("run"))
      Tables.documents(s, d)
        .select(col("doc_id"), n.alias("n_words"),
          size(array_distinct(w)).cast(LongType).alias("n_distinct"),
          sumsq.alias("sumsq"))
        .withColumn("div_ppm",
          expr("1000000 - (1000000 * sumsq) div (n_words * n_words)"))
        .orderBy("doc_id")
    }),

    // Heaps'-law vocabulary-growth curve — the corpus statistic that
    // answers "is more data still adding new vocabulary?" (dataset
    // scaling reports plot exactly this before paying for the next
    // crawl). The corpus is cut into 10 equal doc-id deciles; each
    // decile reports its token mass and the number of terms whose
    // FIRST occurrence falls in it, plus running totals. Scale shape:
    // the token stream is exploded ONCE into a (bucket, term) tf core
    // (map-side combined, O(vocab × 10) output — NOT the token
    // stream); both the token-mass and first-occurrence aggregations
    // read that core, so the corpus pays a single pass. The only
    // window runs over the 10-row decile table (tiny by construction
    // — the rel_cum_distinct discipline). The 1-row max-id scalar
    // broadcasts.
    "tx_vocab_growth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val mx = docs.agg(max(col("doc_id")).alias("mx"))
      // the least(9, ...) cap is deliberately defensive (doc_id <= mx
      // makes it unreachable today) and MIRRORED in the DuckDB oracle
      // — simplify both sides together or neither
      val tf = docs.crossJoin(broadcast(mx))
        .select(least(lit(9L), expr("doc_id * 10 div (mx + 1)"))
          .alias("bucket"), explode(w).alias("term"))
        .groupBy("bucket", "term").agg(count(lit(1)).alias("tf"))
      // both branches below consume the IDENTICAL (bucket, term)
      // exchange, which ReuseExchange dedupes — one explode pass
      // (pinned by the ReusedExchange assertion in PlanAuditSpec)
      val tokCounts = tf.groupBy("bucket")
        .agg(sum(col("tf")).alias("n_tokens"))
      val firstSeen = tf.groupBy("term")
        .agg(min(col("bucket")).alias("bucket"))
        .groupBy("bucket").agg(count(lit(1)).alias("n_new_terms"))
      val wc = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokCounts.join(firstSeen, Seq("bucket"), "left")
        .select(col("bucket"), col("n_tokens"),
          coalesce(col("n_new_terms"), lit(0L)).alias("n_new_terms"))
        .withColumn("tokens_cum", sum(col("n_tokens")).over(wc))
        .withColumn("vocab_cum", sum(col("n_new_terms")).over(wc))
        .orderBy("bucket")
    }))

  lazy val oracles: Map[String, String] = Map(
    "tx_shard" ->
      s"""WITH hashed AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS rn
         |  FROM hashed)
         |SELECT doc_id, (rn - 1) % $NShards AS shard,
         |  (rn - 1) // $NShards AS pos
         |FROM ranked ORDER BY shard, pos""".stripMargin,

    // Same fold, same constants: h = (h*31 + byte) % 1e9+7 over the
    // (ASCII) text. list_reduce seeds with the prepended 0.
    "tx_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''),
        |        x -> CAST(ascii(x) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_ngram_topk" ->
      """WITH bi AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t,
        |       UNNEST(range(1, len(w))) u(i))
        |SELECT bigram, CAST(count(*) AS BIGINT) AS df
        |FROM bi GROUP BY bigram
        |ORDER BY df DESC, bigram ASC LIMIT 20""".stripMargin,

    "tx_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_q,
        |  CAST(length(text) AS BIGINT) /
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_quality" ->
      """SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT) AS stop_n,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS uniq_n,
        |  CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
        |    / CAST(len(w) AS BIGINT) AS stop_ratio,
        |  CAST(len(list_distinct(w)) AS BIGINT)
        |    / CAST(len(w) AS BIGINT) AS ttr
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "tx_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n_words,
        |  CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT)
        |    AS chars,
        |  CAST(len(list_filter(w,
        |    x -> regexp_full_match(x, '[a-z]+'))) AS BIGINT) AS alpha_n,
        |  CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
        |    AS stop_n,
        |  CAST(list_max(list_transform(list_distinct(w),
        |    x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_cnt
        |  FROM t)
        |SELECT doc_id, n_words, chars, alpha_n, stop_n, top_cnt,
        |  CAST(chars * 1000000 // n_words AS BIGINT) AS mwl_micro,
        |  n_words BETWEEN 20 AND 80 AS r_words,
        |  chars * 1000000 // n_words BETWEEN 3000000 AND 10000000
        |    AS r_mwl,
        |  alpha_n * 10 >= n_words * 8 AS r_alpha,
        |  stop_n >= 2 AS r_stop,
        |  top_cnt * 5 <= n_words AS r_rep,
        |  (n_words BETWEEN 20 AND 80)
        |    AND (chars * 1000000 // n_words BETWEEN 3000000 AND 10000000)
        |    AND (alpha_n * 10 >= n_words * 8)
        |    AND (stop_n >= 2)
        |    AND (top_cnt * 5 <= n_words) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,

    // the merge-learning rounds replayed as unrolled CTEs: same pair
    // counting, same (cnt desc, pair asc) winner, same double-replace
    // rewrite — the left-to-right non-overlap semantics of replace()
    // agree between engines
    "tx_bpe_learn" -> {
      val rounds = sqlBpeRoundCtes
      val sel = (1 to BpeMerges)
        .map(i => s"SELECT CAST($i AS BIGINT) AS round, * FROM t$i")
        .mkString("\n|UNION ALL ")
      s"""WITH toks AS (
         |  SELECT wd FROM (SELECT string_split(text, ' ') AS ws
         |        FROM documents) t, UNNEST(ws) u(wd)),
         |w0 AS (SELECT wd, CAST(count(*) AS BIGINT) AS f,
         |  ' ' || trim(regexp_replace(wd, '(.)', '\\1 ', 'g')) || ' ' AS seq
         |  FROM toks GROUP BY wd),
         |$rounds
         |$sel
         |ORDER BY round""".stripMargin
    },

    // the same learned rounds, then tokenize: per-doc word explode
    // joined against the round-R segmentation table
    "tx_bpe_apply" ->
      s"""WITH $sqlBpePerDocCtes
         |SELECT doc_id, n_subwords, n_symbols, n_words
         |FROM perdoc ORDER BY doc_id""".stripMargin,

    // the per-doc BPE table again, rolled up per language: tokenizer
    // fertility (subwords per word) and the compression the vocab
    // bought (symbols per subword), floored micro-units
    "tx_fertility" ->
      s"""WITH $sqlBpePerDocCtes
         |SELECT d.lang,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(p.n_words) AS BIGINT) AS words,
         |  CAST(sum(p.n_subwords) AS BIGINT) AS subwords,
         |  CAST(sum(p.n_symbols) AS BIGINT) AS symbols,
         |  CAST(sum(p.n_subwords) * 1000000 // sum(p.n_words)
         |    AS BIGINT) AS fertility_micro,
         |  CAST(sum(p.n_symbols) * 1000000 // sum(p.n_subwords)
         |    AS BIGINT) AS compression_micro
         |FROM perdoc p JOIN documents d USING (doc_id)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "tx_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
        |  CAST(len(list_distinct(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_bpe_uniq
        |FROM documents ORDER BY doc_id""".stripMargin,

    // vowel-run syllables, terminator-run sentences, and the milli-
    // unit Flesch formula with floored integral division throughout
    "tx_readability" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(greatest(1,
        |      len(regexp_split_to_array(text, '[.!?]+')) - 1)
        |      AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
        |      AS BIGINT) AS n_syllables
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(n_words * 1000 // n_sentences AS BIGINT) AS wps_milli,
        |  CAST(n_syllables * 1000 // n_words AS BIGINT) AS spw_milli,
        |  CAST(206835 - 1015 * n_words // n_sentences
        |    - 84600 * n_syllables // n_words AS BIGINT) AS flesch_milli,
        |  CASE WHEN 206835 - 1015 * n_words // n_sentences
        |         - 84600 * n_syllables // n_words >= 70000 THEN 'easy'
        |       WHEN 206835 - 1015 * n_words // n_sentences
        |         - 84600 * n_syllables // n_words >= 50000
        |         THEN 'standard'
        |       ELSE 'difficult' END AS band
        |FROM m ORDER BY doc_id""".stripMargin,

    // distinct 3-grams per doc (the WordShingles contract), first-
    // occurrence doc per gram hash, then the per-doc roll-up
    "tx_novelty" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |gr AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ')
         |         AS g
         |       FROM docs, UNNEST(range(1, len(w) - 1)) t(i)
         |       WHERE len(w) >= 3),
         |gh AS (SELECT doc_id, ${DedupQueries.SqlH60("g")} AS gh
         |       FROM gr),
         |fst AS (SELECT gh, min(doc_id) AS first_doc
         |        FROM gh GROUP BY 1),
         |per AS (SELECT h.doc_id,
         |          CAST(count(*) AS BIGINT) AS n_grams,
         |          CAST(sum(CASE WHEN f.first_doc = h.doc_id
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         |        FROM gh h JOIN fst f ON h.gh = f.gh GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(p.n_new, 0) AS BIGINT) AS n_new,
         |  CAST(CASE WHEN coalesce(p.n_grams, 0) > 0
         |    THEN coalesce(p.n_new, 0) * 1000000 // p.n_grams
         |    ELSE 0 END AS BIGINT) AS novel_ppm
         |FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "tx_langid" ->
      """SELECT doc_id, lang,
        |  CAST(len(list_filter(w, x -> x = 'the')) AS BIGINT) AS cnt_the,
        |  CAST(len(list_filter(w, x -> x = 'a')) AS BIGINT) AS cnt_a,
        |  CASE WHEN len(list_filter(w, x -> x = 'the'))
        |         > len(list_filter(w, x -> x = 'a')) THEN 'en'
        |       WHEN len(list_filter(w, x -> x = 'the'))
        |         < len(list_filter(w, x -> x = 'a')) THEN 'la'
        |       ELSE 'tie' END AS predicted,
        |  CAST(CASE WHEN (CASE WHEN len(list_filter(w, x -> x = 'the'))
        |         > len(list_filter(w, x -> x = 'a')) THEN 'en'
        |       WHEN len(list_filter(w, x -> x = 'the'))
        |         < len(list_filter(w, x -> x = 'a')) THEN 'la'
        |       ELSE 'tie' END) = lang THEN 1 ELSE 0 END AS BIGINT) AS hit
        |FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    // the same positional gram index relationally: occurrences >= 2,
    // covered positions p..p+15 per duplicated gram, distinct per doc
    "tx_span_strip" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
         |        ${DedupQueries.SqlH60("array_to_string(w[i:i+15], ' ')")}
         |          AS gh
         |      FROM docs, UNNEST(range(1, len(w) - 14)) t(i)
         |      WHERE len(w) >= 16),
         |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
         |cov AS (
         |  SELECT doc_id,
         |    CAST(count(DISTINCT cp) AS BIGINT) AS n_cut_words
         |  FROM (SELECT g.doc_id, g.p + j AS cp
         |        FROM g JOIN dup USING (gh),
         |             UNNEST(range(0, 16)) u(j)) q
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
         |  coalesce(c.n_cut_words, 0) AS n_cut_words,
         |  CAST((CAST(len(string_split(d.text, ' ')) AS BIGINT)
         |    - coalesce(c.n_cut_words, 0)) * 1000000
         |    // len(string_split(d.text, ' ')) AS BIGINT) AS keep_ppm
         |FROM documents d LEFT JOIN cov c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "tx_span_cut" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS p,
         |        ${DedupQueries.SqlH60("array_to_string(w[i:i+15], ' ')")}
         |          AS gh
         |      FROM docs, UNNEST(range(1, len(w) - 14)) t(i)
         |      WHERE len(w) >= 16),
         |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
         |cut AS (SELECT DISTINCT g.doc_id, g.p + j AS p
         |        FROM g JOIN dup USING (gh),
         |             UNNEST(range(0, 16)) u(j)),
         |words AS (SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS wd
         |          FROM docs, UNNEST(range(1, len(w) + 1)) t(i)),
         |kept AS (SELECT wo.doc_id, wo.p, wo.wd
         |         FROM words wo LEFT JOIN cut c
         |           ON wo.doc_id = c.doc_id AND wo.p = c.p
         |         WHERE c.p IS NULL),
         |reb AS (SELECT doc_id,
         |          string_agg(wd, ' ' ORDER BY p) AS kept_text,
         |          CAST(count(*) AS BIGINT) AS n_kept_words
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(r.kept_text, '') AS kept_text,
         |  coalesce(r.n_kept_words, 0) AS n_kept_words
         |FROM documents d LEFT JOIN reb r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // lines are 1-based array slices [(i*5+1):(i*5+5)] for i in
    // 0..ceil(len/5)-1 — the same fixed segmentation the Spark side
    // builds with slice(); the strip joins on the shared h60 hash
    "tx_boilerplate" ->
      s"""WITH docs AS (SELECT doc_id, source,
         |               string_split(text, ' ') AS ws FROM documents),
         |lines AS (
         |  SELECT doc_id, source, CAST(i AS BIGINT) AS line_no,
         |    array_to_string(
         |      ws[(i*$BoilerplateLineWords+1):
         |         (i*$BoilerplateLineWords+$BoilerplateLineWords)],
         |      ' ') AS line
         |  FROM docs, UNNEST(range(0,
         |    CAST(ceil(len(ws) / $BoilerplateLineWords.0) AS BIGINT)))
         |    t(i)),
         |lh AS (SELECT doc_id, source, line_no, line,
         |         ${DedupQueries.SqlH60("line")} AS lhash FROM lines),
         |boiler AS (
         |  SELECT source, lhash FROM (
         |    SELECT source, lhash, count(DISTINCT doc_id) AS df
         |    FROM lh GROUP BY 1, 2) q
         |  WHERE df >= $BoilerplateDf),
         |kept AS (SELECT l.doc_id, l.line_no, l.line
         |         FROM lh l LEFT JOIN boiler b
         |           ON l.source = b.source AND l.lhash = b.lhash
         |         WHERE b.lhash IS NULL),
         |reb AS (SELECT doc_id,
         |          string_agg(line, ' ' ORDER BY line_no) AS kept_text,
         |          CAST(count(*) AS BIGINT) AS n_kept
         |        FROM kept GROUP BY doc_id),
         |tot AS (SELECT doc_id,
         |          CAST(ceil(len(ws) / $BoilerplateLineWords.0) AS BIGINT)
         |            AS n_lines
         |        FROM docs)
         |SELECT t.doc_id, t.n_lines,
         |  t.n_lines - coalesce(r.n_kept, 0) AS n_stripped_lines,
         |  coalesce(r.kept_text, '') AS kept_text
         |FROM tot t LEFT JOIN reb r USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,

    "tx_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS norm,
        |  CAST(len(string_split(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_norm_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_repetition" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |wc AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT doc_id, unnest(w) AS wd FROM docs) t
        |       GROUP BY doc_id, wd),
        |top AS (SELECT doc_id, max(n) AS maxn, CAST(sum(n) AS BIGINT) AS nw
        |        FROM wc GROUP BY doc_id),
        |tri AS (SELECT doc_id,
        |          CAST(greatest(len(w) - 2, 0) AS BIGINT) AS tot3,
        |          CAST(CASE WHEN len(w) >= 3 THEN
        |            len(list_distinct([array_to_string(w[i:i+2], ' ')
        |                               for i in range(1, len(w) - 1)]))
        |            ELSE 0 END AS BIGINT) AS d3
        |        FROM docs)
        |SELECT top.doc_id, maxn, nw,
        |  CAST(maxn AS DOUBLE) / nw AS top_frac, tot3, d3,
        |  CASE WHEN tot3 > 0 THEN 1.0 - CAST(d3 AS DOUBLE) / tot3
        |       ELSE 0.0 END AS dup3_frac,
        |  (CAST(maxn AS DOUBLE) / nw <= CAST(0.15 AS DOUBLE) AND
        |   (CASE WHEN tot3 > 0 THEN 1.0 - CAST(d3 AS DOUBLE) / tot3
        |         ELSE 0.0 END) <= CAST(0.02 AS DOUBLE)) AS keep
        |FROM top JOIN tri ON top.doc_id = tri.doc_id
        |ORDER BY top.doc_id""".stripMargin,

    "tx_pii" ->
      s"""WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com call 555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |    ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |    CAST(doc_id % 100 AS VARCHAR) AS pt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pt, '$PiiEmail')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(pt, '$PiiPhone')) AS BIGINT)
        |    AS n_phone,
        |  CAST(len(regexp_extract_all(pt, '$PiiIp')) AS BIGINT) AS n_ip,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(pt, '$PiiEmail', '<EMAIL>', 'g'),
        |      '$PiiIp', '<IP>', 'g'),
        |    '$PiiPhone', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(pt, '$PiiEmail')) +
        |  len(regexp_extract_all(pt, '$PiiPhone')) +
        |  len(regexp_extract_all(pt, '$PiiIp')) > 0 AS has_pii
        |FROM p ORDER BY doc_id""".stripMargin,

    "tx_tfidf" ->
      """WITH wc AS (
        |  SELECT doc_id, wd AS term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |        FROM documents) t
        |  GROUP BY doc_id, wd),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |       FROM wc GROUP BY term),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |scored AS (
        |  SELECT wc.doc_id, wc.term, wc.tf, df.df,
        |    CAST(wc.tf * n.n AS DOUBLE) / df.df AS score
        |  FROM wc JOIN df ON wc.term = df.term CROSS JOIN n)
        |SELECT doc_id, rk, term, tf, df, score FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term ASC) AS BIGINT) AS rk
        |  FROM scored) t
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "tx_cms_topk" ->
      s"""WITH words AS (
        |  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS wd
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents) t,
        |       UNNEST(range(1, len(w))) u(i)),
        |jb AS (
        |  SELECT wd, t.j,
        |    (${DedupQueries.SqlH60("wd")} >> CAST(t.j * 15 AS INTEGER))
        |      & ${CmsWidth - 1} AS bkt
        |  FROM words CROSS JOIN UNNEST(range(0, $CmsDepth)) t(j)),
        |sketch AS (
        |  SELECT j, bkt, CAST(count(*) AS BIGINT) AS cnt
        |  FROM jb GROUP BY j, bkt),
        |top AS (
        |  SELECT wd, CAST(count(*) AS BIGINT) AS true_n
        |  FROM words GROUP BY wd
        |  ORDER BY true_n DESC, wd ASC LIMIT 20),
        |probe AS (
        |  SELECT top.wd, top.true_n, t.j,
        |    (${DedupQueries.SqlH60("top.wd")} >> CAST(t.j * 15 AS INTEGER))
        |      & ${CmsWidth - 1} AS bkt
        |  FROM top CROSS JOIN UNNEST(range(0, $CmsDepth)) t(j)),
        |est AS (
        |  SELECT p.wd, p.true_n, min(s.cnt) AS est_n
        |  FROM probe p JOIN sketch s ON s.j = p.j AND s.bkt = p.bkt
        |  GROUP BY p.wd, p.true_n)
        |SELECT wd, true_n, est_n, est_n - true_n AS overcount
        |FROM est ORDER BY true_n DESC, wd ASC""".stripMargin,

    "tx_filter_verdict" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
        |             FROM documents),
        |wc AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS n
        |       FROM (SELECT doc_id, unnest(w) AS wd FROM docs) t
        |       GROUP BY doc_id, wd),
        |top AS (SELECT doc_id, max(n) AS maxn, CAST(sum(n) AS BIGINT) AS nw
        |        FROM wc GROUP BY doc_id),
        |scan AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS uniq_n,
        |    CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
        |      AS stop_n,
        |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS tot3,
        |    CAST(CASE WHEN len(w) >= 3 THEN
        |      len(list_distinct([array_to_string(w[i:i+2], ' ')
        |                         for i in range(1, len(w) - 1)]))
        |      ELSE 0 END AS BIGINT) AS d3
        |  FROM docs),
        |m AS (SELECT scan.doc_id, n_tokens,
        |    CAST(uniq_n AS DOUBLE) / n_tokens AS ttr,
        |    CAST(stop_n AS DOUBLE) / n_tokens AS stop_ratio,
        |    CAST(maxn AS DOUBLE) / nw AS top_frac,
        |    CASE WHEN tot3 > 0 THEN 1.0 - CAST(d3 AS DOUBLE) / tot3
        |         ELSE 0.0 END AS dup3_frac
        |  FROM scan JOIN top ON scan.doc_id = top.doc_id),
        |v AS (SELECT *,
        |    CAST(CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END
        |      + CASE WHEN ttr < CAST(0.3 AS DOUBLE) THEN 2 ELSE 0 END
        |      + CASE WHEN stop_ratio < CAST(0.01 AS DOUBLE) THEN 4 ELSE 0 END
        |      + CASE WHEN top_frac > CAST(0.15 AS DOUBLE) THEN 8 ELSE 0 END
        |      + CASE WHEN dup3_frac > CAST(0.02 AS DOUBLE) THEN 16 ELSE 0 END
        |      AS BIGINT) AS fail_mask
        |  FROM m)
        |SELECT doc_id, n_tokens, ttr, stop_ratio, top_frac, dup3_frac,
        |  fail_mask, fail_mask = 0 AS keep
        |FROM v ORDER BY doc_id""".stripMargin,

    // Held-out split of the classifier: weights from even doc_ids,
    // scores for odd; unseen buckets take the train model's nk=nd=0
    // default ratio.
    "tx_clf_holdout" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |wc AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS n
         |       FROM (SELECT doc_id, unnest(w) AS wd FROM docs) t
         |       GROUP BY doc_id, wd),
         |top AS (SELECT doc_id, max(n) AS maxn, CAST(sum(n) AS BIGINT) AS nw
         |        FROM wc GROUP BY doc_id),
         |scan AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(w)) AS BIGINT) AS uniq_n,
         |    CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
         |      AS stop_n,
         |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS tot3,
         |    CAST(CASE WHEN len(w) >= 3 THEN
         |      len(list_distinct([array_to_string(w[i:i+2], ' ')
         |                         for i in range(1, len(w) - 1)]))
         |      ELSE 0 END AS BIGINT) AS d3
         |  FROM docs),
         |labels AS (SELECT scan.doc_id,
         |    (CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END
         |      + CASE WHEN CAST(uniq_n AS DOUBLE) / n_tokens
         |          < CAST(0.3 AS DOUBLE) THEN 2 ELSE 0 END
         |      + CASE WHEN CAST(stop_n AS DOUBLE) / n_tokens
         |          < CAST(0.01 AS DOUBLE) THEN 4 ELSE 0 END
         |      + CASE WHEN CAST(maxn AS DOUBLE) / nw
         |          > CAST(0.15 AS DOUBLE) THEN 8 ELSE 0 END
         |      + CASE WHEN (CASE WHEN tot3 > 0 THEN
         |            1.0 - CAST(d3 AS DOUBLE) / tot3 ELSE 0.0 END)
         |          > CAST(0.02 AS DOUBLE) THEN 16 ELSE 0 END) = 0 AS keep
         |  FROM scan JOIN top ON scan.doc_id = top.doc_id),
         |feat AS (SELECT doc_id,
         |    CAST(${DedupQueries.SqlH60("g")} % $QcB AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest([w[i] || ' ' || w[i + 1]
         |          for i in range(1, len(w))]) AS g FROM docs) t
         |  GROUP BY doc_id, bucket),
         |trainc AS (SELECT bucket,
         |    CAST(sum(CASE WHEN keep THEN tf ELSE 0 END) AS BIGINT) AS nk,
         |    CAST(sum(CASE WHEN keep THEN 0 ELSE tf END) AS BIGINT) AS nd
         |  FROM feat JOIN labels USING (doc_id)
         |  WHERE doc_id % 2 = 0 GROUP BY bucket),
         |tots AS (SELECT CAST(sum(nk) AS BIGINT) AS tnk,
         |                CAST(sum(nd) AS BIGINT) AS tnd FROM trainc),
         |wts AS (SELECT bucket,
         |    CAST((nk + 1) * (tnd + $QcB) * 1000000
         |      // ((nd + 1) * (tnk + $QcB)) AS BIGINT) AS r_ppm
         |  FROM trainc, tots),
         |score AS (SELECT f.doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
         |    CAST(sum(CASE WHEN coalesce(w.r_ppm,
         |        (tots.tnd + $QcB) * 1000000 // (tots.tnk + $QcB))
         |        >= 1000000 THEN tf ELSE 0 END)
         |      * 1000000 // sum(tf) AS BIGINT) AS vote_ppm
         |  FROM feat f LEFT JOIN wts w USING (bucket), tots
         |  WHERE f.doc_id % 2 = 1 GROUP BY f.doc_id)
         |SELECT l.doc_id,
         |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(s.vote_ppm, $QcKeepPpm) AS BIGINT) AS vote_ppm,
         |  coalesce(s.vote_ppm, $QcKeepPpm) >= $QcKeepPpm AS pred_keep,
         |  l.keep,
         |  CAST(CASE WHEN (coalesce(s.vote_ppm, $QcKeepPpm) >= $QcKeepPpm)
         |       = l.keep THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM labels l LEFT JOIN score s USING (doc_id)
         |WHERE l.doc_id % 2 = 1
         |ORDER BY l.doc_id""".stripMargin,

    // Structural-feature holdout: metric CTE chain = the
    // tx_filter_verdict oracle; five binned feature ids per doc
    // through the same integer-ppm ratio machinery.
    "tx_clf_struct" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |wc AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS n
         |       FROM (SELECT doc_id, unnest(w) AS wd FROM docs) t
         |       GROUP BY doc_id, wd),
         |top AS (SELECT doc_id, max(n) AS maxn, CAST(sum(n) AS BIGINT) AS nw
         |        FROM wc GROUP BY doc_id),
         |scan AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(w)) AS BIGINT) AS uniq_n,
         |    CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
         |      AS stop_n,
         |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS tot3,
         |    CAST(CASE WHEN len(w) >= 3 THEN
         |      len(list_distinct([array_to_string(w[i:i+2], ' ')
         |                         for i in range(1, len(w) - 1)]))
         |      ELSE 0 END AS BIGINT) AS d3
         |  FROM docs),
         |m AS (SELECT scan.doc_id, n_tokens,
         |    CAST(uniq_n AS DOUBLE) / n_tokens AS ttr,
         |    CAST(stop_n AS DOUBLE) / n_tokens AS stop_ratio,
         |    CAST(maxn AS DOUBLE) / nw AS top_frac,
         |    CASE WHEN tot3 > 0 THEN 1.0 - CAST(d3 AS DOUBLE) / tot3
         |         ELSE 0.0 END AS dup3_frac
         |  FROM scan JOIN top ON scan.doc_id = top.doc_id),
         |labels AS (SELECT doc_id,
         |    (CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END
         |      + CASE WHEN ttr < CAST(0.3 AS DOUBLE) THEN 2 ELSE 0 END
         |      + CASE WHEN stop_ratio < CAST(0.01 AS DOUBLE)
         |          THEN 4 ELSE 0 END
         |      + CASE WHEN top_frac > CAST(0.15 AS DOUBLE)
         |          THEN 8 ELSE 0 END
         |      + CASE WHEN dup3_frac > CAST(0.02 AS DOUBLE)
         |          THEN 16 ELSE 0 END) = 0 AS keep
         |  FROM m),
         |feat AS (SELECT doc_id, CAST(unnest([
         |      0 + least(n_tokens // 25, 19),
         |      100 + least(CAST(floor(ttr * 10) AS BIGINT), 9),
         |      200 + least(CAST(floor(stop_ratio * 100) AS BIGINT), 9),
         |      300 + least(CAST(floor(top_frac * 20) AS BIGINT), 19),
         |      400 + least(CAST(floor(dup3_frac * 50) AS BIGINT), 9)])
         |    AS BIGINT) AS fid
         |  FROM m),
         |trainc AS (SELECT fid,
         |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS nk,
         |    CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS nd
         |  FROM feat JOIN labels USING (doc_id)
         |  WHERE doc_id % 2 = 0 GROUP BY fid),
         |tots AS (SELECT CAST(sum(nk) AS BIGINT) AS tnk,
         |                CAST(sum(nd) AS BIGINT) AS tnd FROM trainc),
         |wts AS (SELECT fid,
         |    CAST((nk + 1) * (tnd + $QcStructB) * 1000000
         |      // ((nd + 1) * (tnk + $QcStructB)) AS BIGINT) AS r_ppm
         |  FROM trainc, tots),
         |score AS (SELECT f.doc_id, l.keep,
         |    CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(CASE WHEN coalesce(w.r_ppm,
         |        (tots.tnd + $QcStructB) * 1000000
         |          // (tots.tnk + $QcStructB)) >= 1000000
         |        THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         |      AS vote_ppm
         |  FROM feat f JOIN labels l USING (doc_id)
         |    LEFT JOIN wts w USING (fid), tots
         |  WHERE f.doc_id % 2 = 1 GROUP BY f.doc_id, l.keep)
         |SELECT doc_id, n_feats, vote_ppm,
         |  vote_ppm >= $QcKeepPpm AS pred_keep, keep,
         |  CAST(CASE WHEN (vote_ppm >= $QcKeepPpm) = keep
         |       THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM score ORDER BY doc_id""".stripMargin,

    // Labels CTE chain = the tx_filter_verdict oracle verbatim;
    // features/weights/score replay the integer-exact classifier.
    "tx_quality_clf" ->
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w
         |             FROM documents),
         |wc AS (SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS n
         |       FROM (SELECT doc_id, unnest(w) AS wd FROM docs) t
         |       GROUP BY doc_id, wd),
         |top AS (SELECT doc_id, max(n) AS maxn, CAST(sum(n) AS BIGINT) AS nw
         |        FROM wc GROUP BY doc_id),
         |scan AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_tokens,
         |    CAST(len(list_distinct(w)) AS BIGINT) AS uniq_n,
         |    CAST(len(list_filter(w, x -> x IN ('the','a'))) AS BIGINT)
         |      AS stop_n,
         |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS tot3,
         |    CAST(CASE WHEN len(w) >= 3 THEN
         |      len(list_distinct([array_to_string(w[i:i+2], ' ')
         |                         for i in range(1, len(w) - 1)]))
         |      ELSE 0 END AS BIGINT) AS d3
         |  FROM docs),
         |labels AS (SELECT scan.doc_id,
         |    (CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END
         |      + CASE WHEN CAST(uniq_n AS DOUBLE) / n_tokens
         |          < CAST(0.3 AS DOUBLE) THEN 2 ELSE 0 END
         |      + CASE WHEN CAST(stop_n AS DOUBLE) / n_tokens
         |          < CAST(0.01 AS DOUBLE) THEN 4 ELSE 0 END
         |      + CASE WHEN CAST(maxn AS DOUBLE) / nw
         |          > CAST(0.15 AS DOUBLE) THEN 8 ELSE 0 END
         |      + CASE WHEN (CASE WHEN tot3 > 0 THEN
         |            1.0 - CAST(d3 AS DOUBLE) / tot3 ELSE 0.0 END)
         |          > CAST(0.02 AS DOUBLE) THEN 16 ELSE 0 END) = 0 AS keep
         |  FROM scan JOIN top ON scan.doc_id = top.doc_id),
         |feat AS (SELECT doc_id,
         |    CAST(${DedupQueries.SqlH60("g")} % $QcB AS BIGINT) AS bucket,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest([w[i] || ' ' || w[i + 1]
         |          for i in range(1, len(w))]) AS g FROM docs) t
         |  GROUP BY doc_id, bucket),
         |counts AS (SELECT bucket,
         |    CAST(sum(CASE WHEN keep THEN tf ELSE 0 END) AS BIGINT) AS nk,
         |    CAST(sum(CASE WHEN keep THEN 0 ELSE tf END) AS BIGINT) AS nd
         |  FROM feat JOIN labels USING (doc_id) GROUP BY bucket),
         |tots AS (SELECT CAST(sum(nk) AS BIGINT) AS tnk,
         |                CAST(sum(nd) AS BIGINT) AS tnd FROM counts),
         |wts AS (SELECT bucket,
         |    CAST((nk + 1) * (tnd + $QcB) * 1000000
         |      // ((nd + 1) * (tnk + $QcB)) AS BIGINT) AS r_ppm
         |  FROM counts, tots),
         |score AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
         |    CAST(sum(CASE WHEN r_ppm >= 1000000 THEN tf ELSE 0 END)
         |      * 1000000 // sum(tf) AS BIGINT) AS vote_ppm
         |  FROM feat JOIN wts USING (bucket) GROUP BY doc_id)
         |SELECT l.doc_id,
         |  CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         |  CAST(coalesce(s.vote_ppm, $QcKeepPpm) AS BIGINT) AS vote_ppm,
         |  coalesce(s.vote_ppm, $QcKeepPpm) >= $QcKeepPpm AS pred_keep,
         |  l.keep,
         |  CAST(CASE WHEN (coalesce(s.vote_ppm, $QcKeepPpm) >= $QcKeepPpm)
         |       = l.keep THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM labels l LEFT JOIN score s USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin,

    "tx_pack" ->
      s"""WITH sized AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM sized)
        |SELECT doc_id, lang, n_tokens,
        |  (cum - n_tokens) // $PackLen AS bin,
        |  (cum - n_tokens) % $PackLen AS offset
        |FROM packed ORDER BY doc_id""".stripMargin,

    "tx_pack_stats" ->
      s"""WITH sized AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM sized),
        |bins AS (
        |  SELECT doc_id, lang, n_tokens,
        |    (cum - n_tokens) // $PackLen AS bin,
        |    (cum - n_tokens) % $PackLen AS "offset"
        |  FROM packed)
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(max(bin) + 1 AS BIGINT) AS n_bins,
        |  CAST(sum(CASE WHEN "offset" + n_tokens > $PackLen
        |    THEN 1 ELSE 0 END) AS BIGINT) AS straddlers,
        |  CAST(sum(n_tokens) * 1000000
        |    // ((max(bin) + 1) * $PackLen) AS BIGINT) AS fill_micro
        |FROM bins GROUP BY lang ORDER BY lang""".stripMargin,

    "tx_sample" ->
      """WITH hashed AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
        |      AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS stratum_n
        |  FROM hashed)
        |SELECT doc_id, lang, rn, CAST(stratum_n AS BIGINT) AS stratum_n
        |FROM ranked WHERE rn <= (stratum_n + 9) // 10
        |ORDER BY lang, rn""".stripMargin,

    "tx_source_cap" ->
      s"""SELECT doc_id, source, rk, src_n FROM (
         |  SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS src_n
         |  FROM documents) t
         |WHERE rk <= $SourceCap ORDER BY source, rk""".stripMargin,

    "tx_sample_weighted" ->
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |w AS (SELECT lang,
         |  CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS wt
         |  FROM counts),
         |tot AS (SELECT sum(wt) AS tw FROM w),
         |quota AS (SELECT lang,
         |  CAST(($SampleTarget * wt + tw - 1) // tw AS BIGINT) AS quota
         |  FROM w, tot),
         |hashed AS (
         |  SELECT doc_id, lang,
         |    CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
         |      AS BIGINT) AS rn
         |  FROM hashed)
         |SELECT r.doc_id, r.lang, r.rn, q.quota
         |FROM ranked r JOIN quota q USING (lang)
         |WHERE r.rn <= q.quota ORDER BY lang, rn""".stripMargin,

    "tx_langid_ngram" ->
      s"""WITH tri AS (
         |  SELECT doc_id, lang, g
         |  FROM (SELECT doc_id, lang,
         |          list_filter(list_transform(range(1, length(text) + 1),
         |            i -> substr(text, CAST(i AS INTEGER), 3)),
         |            x -> length(x) = 3) AS gs
         |        FROM documents) t, UNNEST(gs) u(g)),
         |occ AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS n
         |        FROM tri GROUP BY 1, 2),
         |profile AS (
         |  SELECT lang AS plang, g FROM (
         |    SELECT *, row_number() OVER (PARTITION BY lang
         |      ORDER BY n DESC, g ASC) AS rk FROM occ) t
         |  WHERE rk <= $ProfileK),
         |dtri AS (SELECT DISTINCT doc_id, g FROM tri),
         |scores AS (
         |  SELECT d.doc_id, p.plang, CAST(count(*) AS BIGINT) AS score
         |  FROM dtri d JOIN profile p USING (g) GROUP BY 1, 2),
         |best AS (
         |  SELECT doc_id, plang, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, plang ASC) AS brk
         |    FROM scores) t WHERE brk = 1)
         |SELECT doc.doc_id, doc.lang,
         |  coalesce(b.plang, 'und') AS predicted,
         |  CAST(coalesce(b.score, 0) AS BIGINT) AS score,
         |  CAST(CASE WHEN coalesce(b.plang, 'und') = doc.lang
         |    THEN 1 ELSE 0 END AS BIGINT) AS hit
         |FROM documents doc LEFT JOIN best b USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "tx_mixture" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY lang, source),
        |w AS (SELECT *,
        |  CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS wt
        |  FROM g),
        |t AS (SELECT CAST(sum(wt) AS BIGINT) AS tw,
        |  CAST(sum(tokens) AS BIGINT) AS tt FROM w)
        |SELECT lang, source, n_docs, tokens, wt,
        |  CAST(wt * 1000000 // tw AS BIGINT) AS share_ppm,
        |  CAST(tokens * 1000000 // tt AS BIGINT) AS raw_ppm
        |FROM w, t ORDER BY lang, source""".stripMargin,

    // Same add-one bigram LM, recomputed from scratch: exact rational
    // probabilities and per-type floor(1e6·tf·p) contributions keep
    // every compared value integer.
    "tx_lm_score" ->
      """WITH occ AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |          list_filter(list_transform(range(1, length(text) + 1),
        |            i -> substr(text, CAST(i AS INTEGER), 2)),
        |            x -> length(x) = 2) AS gs
        |        FROM documents) t, UNNEST(gs) u(g)
        |  GROUP BY doc_id, g),
        |cnt AS (
        |  SELECT g, CAST(sum(tf) AS BIGINT) AS cnt, substr(g, 1, 1) AS c1
        |  FROM occ GROUP BY g),
        |ctx AS (SELECT c1, CAST(sum(cnt) AS BIGINT) AS c1n
        |        FROM cnt GROUP BY c1),
        |vocab AS (SELECT CAST(count(DISTINCT c1) AS BIGINT) AS v FROM cnt),
        |probs AS (
        |  SELECT g, CAST(cnt + 1 AS DOUBLE) / CAST(c1n + v AS DOUBLE) AS p
        |  FROM cnt JOIN ctx USING (c1) CROSS JOIN vocab)
        |SELECT doc_id,
        |  CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(CAST(floor(CAST(tf AS DOUBLE) * p * 1000000.0)
        |       AS BIGINT)) AS BIGINT) AS score_micro
        |FROM occ JOIN probs USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same arithmetic, same left-associative evaluation order — the
    // per-(doc, term) micro-unit floor makes the per-doc sum exact
    "tx_bm25_topk" ->
      s"""WITH $bm25OracleCte,
        |q AS (SELECT term, df FROM (
        |        SELECT *, row_number() OVER (
        |          ORDER BY df DESC, term ASC) AS rn FROM dft) t
        |      WHERE rn BETWEEN 11 AND 13),
        |scored AS (
        |  SELECT t.doc_id,
        |    ${bm25OracleMicro("q.df")} AS sm
        |  FROM tf t JOIN q USING (term) JOIN dlen d USING (doc_id)
        |       CROSS JOIN stats s)
        |SELECT doc_id, CAST(sum(sm) AS BIGINT) AS bm25_micro,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM scored GROUP BY doc_id
        |ORDER BY bm25_micro DESC, doc_id ASC LIMIT 10""".stripMargin,

    "tx_inverted_index" ->
      s"""WITH pairs AS (
         |  SELECT DISTINCT doc_id, wd AS term
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents) t, UNNEST(ws) u(wd)),
         |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df
         |        FROM pairs GROUP BY term),
         |top AS (SELECT term, df FROM dft
         |        ORDER BY df DESC, term ASC LIMIT $TopTerms)
         |SELECT t.term, t.df,
         |  string_agg(CAST(p.doc_id AS VARCHAR), ','
         |    ORDER BY p.doc_id) AS postings
         |FROM top t JOIN pairs p USING (term)
         |GROUP BY t.term, t.df
         |ORDER BY t.df DESC, t.term ASC""".stripMargin,

    // the LM-score derivation verbatim, then length-normalize and
    // ntile(10) over the deterministic (avg, doc_id) total order
    "tx_quality_bins" ->
      """WITH occ AS (
        |  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id,
        |          list_filter(list_transform(range(1, length(text) + 1),
        |            i -> substr(text, CAST(i AS INTEGER), 2)),
        |            x -> length(x) = 2) AS gs
        |        FROM documents) t, UNNEST(gs) u(g)
        |  GROUP BY doc_id, g),
        |cnt AS (
        |  SELECT g, CAST(sum(tf) AS BIGINT) AS cnt, substr(g, 1, 1) AS c1
        |  FROM occ GROUP BY g),
        |ctx AS (SELECT c1, CAST(sum(cnt) AS BIGINT) AS c1n
        |        FROM cnt GROUP BY c1),
        |vocab AS (SELECT CAST(count(DISTINCT c1) AS BIGINT) AS v FROM cnt),
        |probs AS (
        |  SELECT g, CAST(cnt + 1 AS DOUBLE) / CAST(c1n + v AS DOUBLE) AS p
        |  FROM cnt JOIN ctx USING (c1) CROSS JOIN vocab),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(sum(CAST(floor(CAST(tf AS DOUBLE) * p * 1000000.0)
        |         AS BIGINT)) AS BIGINT)
        |      // CAST(sum(tf) AS BIGINT) AS avg_micro
        |  FROM occ JOIN probs USING (g)
        |  GROUP BY doc_id)
        |SELECT doc_id, avg_micro,
        |  CAST(ntile(10) OVER (ORDER BY avg_micro, doc_id) AS BIGINT)
        |    AS decile
        |FROM scored ORDER BY doc_id""".stripMargin,

    // document frequencies via the same distinct-per-doc token/bigram
    // semantics as WordShingles; // on all-positive i64 products
    // matches Spark's div
    "tx_collocations" ->
      """WITH uni AS (
        |  SELECT wd, CAST(count(*) AS BIGINT) AS wdf FROM (
        |    SELECT DISTINCT doc_id, wd FROM (
        |      SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |      FROM documents) x) t
        |  GROUP BY wd),
        |bi AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS pair_df FROM (
        |    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bigram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |          FROM documents) t,
        |         UNNEST(range(1, len(w))) u(i)) b
        |  GROUP BY bigram
        |  HAVING count(*) >= 5),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT bigram, pair_df, u1.wdf AS w1_df, u2.wdf AS w2_df,
        |  (1000000 * pair_df * n.n) // (u1.wdf * u2.wdf) AS pmi_micro
        |FROM bi CROSS JOIN n
        |JOIN uni u1 ON string_split(bigram, ' ')[1] = u1.wd
        |JOIN uni u2 ON string_split(bigram, ' ')[2] = u2.wd
        |ORDER BY pmi_micro DESC, bigram ASC
        |LIMIT 20""".stripMargin,

    "tx_length_profile" ->
      """SELECT lang, n_tokens // 10 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens
        |FROM (SELECT lang,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tx_class_tfidf" ->
      """WITH lt AS (
        |  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS term
        |    FROM documents) x
        |  GROUP BY 1, 2),
        |ldf AS (SELECT term, CAST(count(*) AS BIGINT) AS ldf
        |        FROM lt GROUP BY 1),
        |nl AS (SELECT CAST(count(DISTINCT lang) AS BIGINT) AS nlang
        |       FROM lt)
        |SELECT lang, rk, term, tf, ldf, score_micro FROM (
        |  SELECT lang, term, tf, ldf,
        |    (tf * 1000000 * nlang) // ldf AS score_micro,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY (tf * 1000000 * nlang) // ldf DESC, term ASC)
        |      AS BIGINT) AS rk
        |  FROM lt JOIN ldf USING (term) CROSS JOIN nl) t
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    "tx_dsir" ->
      s"""WITH $dsirOracleCte,
         |top AS (
         |  SELECT doc_id, score_ppm FROM scored
         |  ORDER BY score_ppm DESC, doc_id ASC LIMIT 100)
         |SELECT d.doc_id, d.lang, t.score_ppm
         |FROM top t JOIN documents d USING (doc_id)
         |ORDER BY t.score_ppm DESC, d.doc_id ASC""".stripMargin,

    "pipe_dsir" ->
      s"""WITH $dsirOracleCte,
         |ranked AS (
         |  SELECT doc_id, score_ppm,
         |    CAST(row_number() OVER (
         |      ORDER BY score_ppm DESC, doc_id ASC) AS BIGINT) AS rn,
         |    CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM scored)
         |SELECT d.lang, d.source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN r.rn * 5 <= r.n THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN r.rn * 5 <= r.n THEN r.score_ppm
         |    ELSE 0 END) AS BIGINT) AS kept_score_sum
         |FROM ranked r JOIN documents d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "tx_diversity" ->
      """WITH cnt AS (
        |  SELECT doc_id, wd, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
        |        FROM documents) x
        |  GROUP BY 1, 2),
        |per AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq
        |  FROM cnt GROUP BY 1)
        |SELECT doc_id, n_words, n_distinct, sumsq,
        |  CAST(1000000 - (1000000 * sumsq) // (n_words * n_words)
        |    AS BIGINT) AS div_ppm
        |FROM per ORDER BY doc_id""".stripMargin,

    "tx_vocab_growth" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |toks AS (
        |  SELECT least(9, doc_id * 10 // (mx + 1)) AS bucket,
        |    t.term AS term
        |  FROM documents, mx, UNNEST(string_split(text, ' ')) t(term)),
        |tc AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY bucket),
        |fb AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_terms
        |  FROM (SELECT term, min(bucket) AS bucket FROM toks
        |        GROUP BY term) f
        |  GROUP BY bucket)
        |SELECT CAST(tc.bucket AS BIGINT) AS bucket, tc.n_tokens,
        |  CAST(coalesce(fb.n_new_terms, 0) AS BIGINT) AS n_new_terms,
        |  CAST(sum(tc.n_tokens) OVER (ORDER BY tc.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS tokens_cum,
        |  CAST(sum(coalesce(fb.n_new_terms, 0)) OVER (ORDER BY tc.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS vocab_cum
        |FROM tc LEFT JOIN fb USING (bucket)
        |ORDER BY bucket""".stripMargin)
}
