package graft.kg

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Basic-graph-pattern (BGP) matching over the materialized edges table —
 * the SPARQL query primitive a KG built by this engine is FOR (reference
 * scope ends at parsing, e.g. NtParser.scala:717-803 hands triples to the
 * caller; querying the resulting graph is the natural next stage and is
 * expressed here Spark-first instead of via a bespoke join engine).
 *
 * A pattern is a list of triple patterns whose positions are variables or
 * constants. Matching is declarative relational algebra:
 *
 *   - each triple pattern becomes a SELECT over the edges frame with its
 *     constants as equality predicates — Catalyst pushes them into the
 *     parquet scan (`PushedFilters` on pred / obj_id), so a selective
 *     pattern reads a fraction of the edge list, not all of it;
 *   - patterns are combined by equi-joins on their shared variables
 *     (hash-partitioned on sha256 node ids — uniformly distributed,
 *     skew-free keys), and AQE broadcasts whichever sides turn out
 *     runtime-small. Star patterns (shared subject) all join on subj_id,
 *     so over the E7 bucketed edges table every hop is Exchange-free.
 *
 * Disconnected patterns (no variable shared with the already-joined
 * prefix) are rejected instead of silently cross-joining: at KG scale a
 * cartesian product is always a bug, and the caller can add the linking
 *  pattern or run the components as separate queries.
 *
 * Bag semantics (standard BGP): no implicit distinct.
 */
object Bgp {

  /** One position of a triple pattern: a named variable or a constant.
    * Constants match the edges-frame columns as-is: node ids (see
    * [[iriId]]/[[litId]]) in subject/object position, the predicate IRI
    * string in predicate position. */
  sealed trait TermPat
  final case class V(name: String) extends TermPat
  final case class C(value: String) extends TermPat

  final case class TriplePattern(subj: TermPat, pred: TermPat, obj: TermPat)

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Node id of an IRI constant — same recipe as `Canonicalize.nodeId`
    * over an IRI term (canonical form, n3 `<iri>` rendering, sha256). */
  def iriId(iri: String): String =
    sha256Hex("<" + IriCanon.canonicalString(iri) + ">")

  /** Node id of a literal constant (n3 always prints the datatype,
    * reference types.scala:34-38). */
  def litId(value: String,
            dt: String = "http://www.w3.org/2001/XMLSchema#string",
            lang: Option[String] = None): String =
    sha256Hex("\"" + value + "\"" + lang.map("@" + _).getOrElse("") + "^^<" + dt + ">")

  /**
   * Match `patterns` against an edges frame with columns
   * (subj_id, pred, obj_id); extra columns are ignored. Output: one
   * column per distinct variable, one row per binding.
   */
  def matchPatterns(edges: DataFrame, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    val base = edges.select("subj_id", "pred", "obj_id")

    // one relation per triple pattern: constants -> pushed-down filters,
    // variables -> renamed columns (a variable repeated WITHIN a pattern
    // becomes an equality filter and binds once)
    val rels: Seq[DataFrame] = patterns.map { p =>
      val pos = Seq("subj_id" -> p.subj, "pred" -> p.pred, "obj_id" -> p.obj)
      require(pos.exists(_._2.isInstanceOf[V]),
        s"triple pattern $p has no variable — ASK-style existence checks " +
          "are a filter on the caller's side, not a join input")
      val filtered = pos.foldLeft(base) {
        case (df, (c, C(v))) => df.filter(col(c) === lit(v))
        case (df, _)         => df
      }
      val varCols = pos.collect { case (c, V(n)) => (c, n) }
      val dupEq = varCols.groupBy(_._2).values.collect {
        case vs if vs.size > 1 => vs.map(v => col(v._1)).reduce(_ === _)
      }
      val withEq = dupEq.foldLeft(filtered)(_ filter _)
      val firstBinding = varCols.groupBy(_._2).map { case (n, vs) => (vs.head._1, n) }
      withEq.select(firstBinding.toSeq.sortBy(_._2).map { case (c, n) => col(c).as(n) }: _*)
    }

    rels.reduceLeft { (acc, r) =>
      val shared = r.columns.toSeq.intersect(acc.columns.toSeq)
      require(shared.nonEmpty,
        "disconnected BGP: each triple pattern must share a variable with " +
          "the patterns before it (reorder, or run components separately) — " +
          "a cartesian product at KG scale is always a bug")
      acc.join(r, shared, "inner")
    }
  }
}
