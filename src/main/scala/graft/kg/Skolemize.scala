package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * E4: scoped blank-node skolemization.
 *
 * Blank-node labels are document-scoped in N-Triples (and in the
 * reference, where one parse run == one document). At corpus scale the
 * same `_:x` label in two files must NOT unify, so labels are relabeled to
 * a deterministic global id salted by the document identity:
 * `sha256(repo|commit|path|label)`.
 *
 * Implemented as pure column expressions (whole-stage codegen'd, no UDF,
 * no shuffle) over the nested RdfTerm structs.
 */
object Skolemize {

  /** The salted global label for a bnode `label` column. */
  def skolemLabel(repo: Column, commit: Column, path: Column, label: Column): Column =
    sha2(concat_ws("|", repo, commit, path, label), 256)

  private def skolemTerm(df: DataFrame, termCol: String): Column = {
    val t = col(termCol)
    when(t("kind") === lit(RdfTerm.BNODE),
      struct(
        t("kind").as("kind"),
        skolemLabel(col("repo"), col("commit"), col("path"), t("value")).as("value"),
        t("lang").as("lang"),
        t("dt").as("dt")))
      .otherwise(t)
      .as(termCol)
  }

  /**
   * Relabel bnode subjects/objects of a triples DataFrame (schema of
   * TripleRow). Narrow transform; lineage columns are required.
   */
  def apply(triples: DataFrame): DataFrame =
    triples.withColumn("subj", skolemTerm(triples, "subj"))
      .withColumn("obj", skolemTerm(triples, "obj"))
}
