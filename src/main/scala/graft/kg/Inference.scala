package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RDFS-style forward-chaining inference over the constructed KG — the
 * materialization pass a KG store runs after loading what the parser
 * produced (reference scope ends at triples; rdfs:subClassOf / rdfs9 are
 * the W3C RDF Schema entailment rules, applied here as relational ops).
 *
 * Implemented rules:
 *   - rdfs11 (transitivity): subClassOf+ via `GraphOps.transitiveClosure`
 *     (iterative doubling, O(log depth) joins);
 *   - rdfs9 (type inheritance): type(x, C) && subClassOf+(C, D) =>
 *     type(x, D), one equi-join of the instance-type frame against the
 *     closed hierarchy.
 *
 * Scale shape: the hierarchy is vocabulary-sized (thousands of classes
 * against billions of instances), so its closure is computed first and
 * BROADCAST into the rdfs9 join — the instance frame, the only big side,
 * is never shuffled. Output is deduplicated per (instance, class).
 */
object Inference {

  /** subClassOf+ (strict, irreflexive): (sub, sup) for every superclass
    * reachable in >= 1 subClassOf step. */
  def subClassClosure(subClassOf: DataFrame, sub: String, sup: String,
                      maxIter: Int = 20): DataFrame =
    GraphOps.transitiveClosure(subClassOf, sub, sup, maxIter)
      .select(col(sub).as("sub"), col(sup).as("sup"))

  /**
   * Materialized instance types under rdfs9: the asserted (instance,
   * class) rows plus one row per superclass of an asserted class.
   * `types` columns: (`inst`, `cls`); output: distinct (instance, class).
   */
  def materializeTypes(types: DataFrame, inst: String, cls: String,
                       subClassOf: DataFrame, sub: String, sup: String): DataFrame = {
    val closure = subClassClosure(subClassOf, sub, sup)
    val asserted = types.select(col(inst).as("instance"), col(cls).as("class"))
    val inherited = asserted
      .join(broadcast(closure), asserted("class") === closure("sub"))
      .select(col("instance"), col("sup").as("class"))
    asserted.union(inherited).distinct()
  }
}
