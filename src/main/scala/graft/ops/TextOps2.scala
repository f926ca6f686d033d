package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second text pack — corpus-level lexical association: which word
  * pairs co-occur MORE than their individual frequencies predict
  * (collocations / multi-word expressions), the signal behind
  * tokenizer-vocabulary merges and phrase-aware indexing that the
  * per-document quality ops don't see.
  */
object TextOps2 {

  // ---------------------------------------------------------------
  // txt_collocations — top adjacent-bigram collocations by LIFT
  // (pointwise mutual information without the log): for adjacent
  // token pair (a,b),
  //   lift = P(ab) / (P(a)·P(b))
  //        = (n_ab · T_uni²) / (T_bi · n_a · n_b)
  // computed as one exact integer ppm ratio in DECIMAL(38,0) cross
  // multiplication (numerator ≈ n_ab·T_uni²·10⁶ stays well under
  // 10³⁸ through corpus scales; a log-PMI would be float and
  // hash-drift). Bigrams below MinCount occurrences are noise-floor
  // filtered (the standard PMI sparsity fix), and the top
  // TopCollocations by (lift DESC, a, b) are emitted with their
  // evidence counts.
  //
  // Plan shape: tokenization is map-only; unigram and bigram counts
  // are map-side-combined aggregates keyed by word — the bigram
  // relation joins its two unigram legs on the word key (vocab-sized
  // shuffle joins, linear, never broadcast: a 100 TB corpus vocab is
  // itself large); corpus totals ride as 1-row broadcast scalars;
  // the final rank window runs over the ≥MinCount bigram survivors,
  // a frequency-truncated (bounded) relation above an Aggregate.
  // ---------------------------------------------------------------
  private val MinCount = 5
  private val TopCollocations = 40

  private def collocations(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val tu = uni.agg(sum(col("n_w")).as("t_uni"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val tb = bi.agg(sum(col("n_ab")).as("t_bi"))
    val scored = bi.filter(col("n_ab") >= MinCount)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(tu)).crossJoin(broadcast(tb))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * t_uni * t_uni * 1000000) DIV " +
          "(CAST(t_bi AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)").as("lift_ppm"))
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("lift_ppm").desc, col("w1"), col("w2"))))
      .filter(col("rank") <= TopCollocations)
      .select(col("rank"), col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift_ppm"))
      .orderBy("rank")
  }

  private val collocationsSql =
    s"""WITH toks AS (
      |  SELECT regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
      |uni AS (
      |  SELECT w, count(*) AS n_w
      |  FROM (SELECT unnest(toks) AS w FROM toks) u GROUP BY w),
      |tu AS (SELECT sum(n_w) AS t_uni FROM uni),
      |bi AS (
      |  SELECT w1, w2, count(*) AS n_ab FROM (
      |    SELECT toks[i + 1] AS w1, toks[i + 2] AS w2
      |    FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i FROM toks
      |          WHERE len(toks) >= 2) p)
      |  GROUP BY w1, w2),
      |tb AS (SELECT sum(n_ab) AS t_bi FROM bi),
      |scored AS (
      |  SELECT b.w1, b.w2, CAST(b.n_ab AS BIGINT) AS n_ab,
      |    CAST(a.n_w AS BIGINT) AS n_a, CAST(c.n_w AS BIGINT) AS n_b,
      |    CAST(CAST(b.n_ab AS HUGEINT) * t_uni * t_uni * 1000000
      |      // (CAST(t_bi AS HUGEINT) * a.n_w * c.n_w) AS BIGINT) AS lift_ppm
      |  FROM bi b
      |  JOIN uni a ON a.w = b.w1
      |  JOIN uni c ON c.w = b.w2
      |  CROSS JOIN tu CROSS JOIN tb
      |  WHERE b.n_ab >= $MinCount),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, w1, w2) AS rank
      |  FROM scored)
      |SELECT CAST(rank AS INT) AS rank, w1, w2, n_ab, n_a, n_b, lift_ppm
      |FROM r WHERE rank <= $TopCollocations
      |ORDER BY rank""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("txt_collocations", collocations, Some(collocationsSql)))
}
