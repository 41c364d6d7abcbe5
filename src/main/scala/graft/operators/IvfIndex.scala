package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions._

/** IVF (inverted-file) coarse quantizer over an embedding corpus — the
  * operator behind the v5/v7/v8 search queries, exposed for reuse and for
  * the persisted-index path.
  *
  * `build` runs one deterministic Lloyd's iteration (see the step comments
  * below); every arithmetic choice is engine-portable so the DuckDB oracle
  * can mirror the whole model ([[graft.queries.Embeddings]] `ivfSql`).
  *
  * `persist` writes the lists table PARTITIONED BY list id — the physical
  * layout the search queries assume at scale: a probe assigned to list L
  * reads only partition L (partition pruning, pinned in IvfIndexSpec), so
  * search cost is nprobe/nlists of the corpus regardless of corpus size.
  */
object IvfIndex {

  /** `lists`: (vec_id, lid, emb, nrm) — corpus rows with their assigned
    * list; `centers`: (csid, cemb) — the updated center vectors.
    */
  final case class Model(lists: DataFrame, centers: DataFrame)

  private def roundedCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    round(cosine(a, b), 6)

  /** One deterministic Lloyd's iteration over `corpus` (columns: vec_id,
    * emb: array<double>, nrm: double):
    *
    *   1. seeds: the `nLists` vectors with the smallest `md5(vec_id)` —
    *      deterministic, engine-portable sampling planned as distributed
    *      top-k (TakeOrderedAndProject), never a global sort;
    *   2. assign: every vector to its nearest seed (`round(cos,6)` desc,
    *      seed-id tiebreak). The argmax is `max(struct(...))` under
    *      `groupBy(vec_id)`: the K candidate rows per vector sit in one
    *      partition (broadcast cross join), so the partial aggregate
    *      collapses N×K → N BEFORE the shuffle;
    *   3. update: per-list decimal-exact means (DECIMAL(28,10) sums are
    *      order-independent → bit parity with the oracle);
    *   4. re-assign the corpus to the UPDATED centers — the inverted file.
    */
  def build(corpus: DataFrame, nLists: Int): Model = {
    val c = corpus
    val skey = md5(col("vec_id").cast("string"))
    // The global window runs AFTER limit(nLists) — K rows, not the corpus —
    // so Spark's "no partition defined" warning is expected and harmless
    // here (a literal partitionBy would be constant-folded away anyway).
    val wSeed = Window.orderBy(col("skey").asc, col("vec_id").asc)
    val seeds = c.select(col("vec_id"), col("emb"), skey.as("skey"))
      .orderBy(col("skey").asc, col("vec_id").asc).limit(nLists)
      .withColumn("sid", row_number().over(wSeed))
      .select(col("sid"), col("emb").as("semb"))
    val asg = c.crossJoin(broadcast(seeds))
      .groupBy(col("vec_id"))
      .agg(max(struct(
        roundedCos(col("emb"), col("semb")).as("cs"),
        (-col("sid")).as("neg"), col("sid").as("sid"),
        col("emb").as("emb"))).as("m"))
      .select(col("vec_id"), col("m.sid").as("sid"), col("m.emb").as("emb"))
    val cents = asg
      .select(col("sid"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("sid"), col("pos"))
      .agg((sum(col("v").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1))).as("cv"))
      .groupBy(col("sid"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("cemb"))
      .select(col("sid").as("csid"), col("cemb"))
    val lists = c.crossJoin(broadcast(cents))
      .groupBy(col("vec_id"))
      .agg(max(struct(
        roundedCos(col("emb"), col("cemb")).as("cs"),
        (-col("csid")).as("neg"), col("csid").as("lid"),
        col("emb").as("emb"), col("nrm").as("nrm"))).as("m"))
      .select(col("vec_id"), col("m.lid").as("lid"),
        col("m.emb").as("emb"), col("m.nrm").as("nrm"))
    Model(lists, cents)
  }

  /** Write the inverted file partitioned by list id — the layout that
    * turns "search list L" into "read partition L".
    */
  def persist(model: Model, path: String): Unit =
    model.lists.write.mode("overwrite").partitionBy("lid").parquet(path)

  /** Read a persisted inverted file; `filter(col("lid") === n)` on the
    * result prunes to that partition (IvfIndexSpec pins the plan).
    */
  def loadLists(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Scored candidates for `probes` (qid, qe: array<double>, qnrm):
    * probes assigned to their `nprobe` nearest centers (window over the
    * broadcast K-row center table), each probed list's vectors scored
    * with precomputed-norm rounded cosine. THE single implementation the
    * oracle-gated v5/v7/v8 queries and [[search]] both run — any change
    * to tiebreaks, rounding, or self-exclusion lands everywhere at once.
    * Returns (qid, csid, vec_id, cos_sim).
    */
  def scoredCandidates(lists: DataFrame, centers: DataFrame, probes: DataFrame,
      nprobe: Int): DataFrame = {
    val wAssign = Window.partitionBy(col("qid"))
      .orderBy(roundedCos(col("qe"), col("cemb")).desc, col("csid").asc)
    val assigned = probes.crossJoin(broadcast(centers))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= nprobe)
      .select(col("qid"), col("qe"), col("qnrm"), col("csid"))
    broadcast(assigned)
      .join(lists, col("lid") === col("csid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("csid"),
        col("vec_id"),
        round(dotNative(col("qe"), col("emb")) / (col("qnrm") * col("nrm")), 6)
          .as("cos_sim"))
  }

  /** Top-k cosine search against an inverted file. `lists` is either
    * `Model.lists` or a [[loadLists]] read of a persisted index — in the
    * latter case the lid-equality join prunes to the probed partitions
    * before any dot product. Ranks [[scoredCandidates]] with the
    * deterministic rounded-cosine, id-tiebreak ordering. Returns
    * (qid, vec_id, cos_sim, rn), rn <= k.
    */
  def search(lists: DataFrame, centers: DataFrame, probes: DataFrame,
      k: Int, nprobe: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    scoredCandidates(lists, centers, probes, nprobe)
      .select(col("qid"), col("vec_id"), col("cos_sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
