package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ votes(fid) over a document's five STRUCTURAL feature ids — the
  * whole per-row gate-metric + bin + model-lookup loop of the
  * `tx_clf_struct` classifier as ONE native call per row (the
  * H60BucketSum discipline). The interpreted spelling — per-distinct-
  * token `filter` lambdas for the top-word count plus five
  * `element_at` map lookups — measured 2.8k docs/s on StreamProbe
  * structclf; every HOF lambda evaluates interpreted per element, so
  * a 60-token doc paid ~3.6k boxed lambda calls for the top-word scan
  * alone. This expression is one token pass + one hash map.
  *
  * Metric semantics are bit-identical to
  * `TextQueries.filterVerdictOf` (the batch derivation behind the
  * staged verdict table), pinned by StreamingStructClfSpec against
  * the oracle-checked batch query:
  *  - tokens: `split(text, " ", -1)` (empty tokens kept);
  *  - n_tokens / uniq / stopword("the","a") count / max per-token
  *    occurrence count / distinct word-3-shingle count;
  *  - ratios in IEEE doubles exactly as the SQL spelling computes
  *    them (uniq/n, stop/n, maxn/n, 1 - d3/tot3), binned with the
  *    batch query's floor/least arithmetic;
  *  - feature ids family*100 + bin, looked up in the caller-provided
  *    dense 500-slot vote table (unseen ids carry the model default
  *    in their slots).
  *
  * One pass builds the per-token count map (the top-word numerator),
  * a second short pass the 3-shingle set; allocation, not virtual
  * dispatch, dominates — CodegenFallback, the WordShingles rationale.
  */
case class StructGateVotesExpr(child: Expression, votes: Seq[Long])
    extends UnaryExpression with CodegenFallback {

  require(votes.length == 500,
    s"dense vote table must have 500 slots (5 families × 100), " +
      s"got ${votes.length}")

  private lazy val voteArr: Array[Long] = votes.toArray

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length
    val counts = mutable.HashMap.empty[String, Long]
    var stopN = 0L
    var i = 0
    while (i < n) {
      val w = words(i)
      counts.update(w, counts.getOrElse(w, 0L) + 1L)
      if (w == "the" || w == "a") stopN += 1L
      i += 1
    }
    var maxN = 0L
    val it = counts.valuesIterator
    while (it.hasNext) { val v = it.next(); if (v > maxN) maxN = v }
    val uniqN = counts.size.toLong
    val tot3 = math.max(n - 2, 0).toLong
    var d3 = 0L
    if (n >= 3) {
      val seen = mutable.HashSet.empty[String]
      val sb = new java.lang.StringBuilder(64)
      i = 0
      while (i + 3 <= n) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1))
          .append(' ').append(words(i + 2))
        seen.add(sb.toString)
        i += 1
      }
      d3 = seen.size.toLong
    }
    // IEEE doubles + floors exactly as the SQL spelling computes them
    val nd = n.toDouble
    val ttr = uniqN.toDouble / nd
    val stopR = stopN.toDouble / nd
    val topFrac = maxN.toDouble / nd
    val dupFrac = if (tot3 > 0) 1.0 - d3.toDouble / tot3.toDouble else 0.0
    def bin(x: Double, scale: Int, cap: Long): Long =
      math.min(math.floor(x * scale).toLong, cap)
    var sum = 0L
    sum += voteArr(math.min(n.toLong / 25L, 19L).toInt)
    sum += voteArr(100 + bin(ttr, 10, 9L).toInt)
    sum += voteArr(200 + bin(stopR, 100, 9L).toInt)
    sum += voteArr(300 + bin(topFrac, 20, 19L).toInt)
    sum += voteArr(400 + bin(dupFrac, 50, 9L).toInt)
    sum
  }

  override protected def withNewChildInternal(c: Expression)
      : StructGateVotesExpr = copy(child = c)
}

object StructGateVotes {
  def apply(c: Column, votesDense: Seq[Long]): Column =
    toColumn(StructGateVotesExpr(toExpression(c), votesDense))
}
