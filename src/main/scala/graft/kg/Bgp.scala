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
    * reference types.scala:34-38). A language-tagged literal is typed
    * rdf:langString per RDF 1.1 — the parser always materializes that
    * pairing (terms.scala:49), so defaulting dt to xsd:string alongside
    * a lang tag would hash an id no edge can ever carry. */
  def litId(value: String,
            dt: String = RdfTerm.XsdString,
            lang: Option[String] = None): String = {
    val dtEff = if (lang.isDefined && dt == RdfTerm.XsdString) RdfTerm.RdfLangString else dt
    sha256Hex("\"" + value + "\"" + lang.map("@" + _).getOrElse("") + "^^<" + dtEff + ">")
  }

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

  /**
   * BGP with SPARQL OPTIONAL groups: `required` matches as
   * [[matchPatterns]]; each optional group is itself a BGP, matched
   * independently and LEFT-joined to the required bindings on its
   * shared variables — rows keep their required bindings and take NULL
   * for the group's new variables when the group has no match.
   *
   * Restricted to the WELL-DESIGNED case (Pérez et al., "Semantics and
   * Complexity of SPARQL", TODS'09 — the fragment where OPTIONAL is
   * exactly a left outer join): every group must share >= 1 variable
   * with `required`, and a variable bound by one optional group may not
   * appear in another (cross-group correlation reintroduces the
   * non-monotone cases that need bag-difference plans, and is almost
   * always a query bug). Each group is one equi-left-join keyed on the
   * shared variables — same shuffle shape as the inner joins.
   */
  def matchWithOptional(edges: DataFrame, required: Seq[TriplePattern],
                        optional: Seq[Seq[TriplePattern]]): DataFrame = {
    val base = matchPatterns(edges, required)
    val reqVars = base.columns.toSet
    val newVarsSeen = scala.collection.mutable.Set.empty[String]
    optional.foldLeft(base) { (acc, group) =>
      val g = matchPatterns(edges, group)
      val shared = g.columns.toSeq.filter(reqVars.contains)
      require(shared.nonEmpty,
        s"optional group ${group.mkString(", ")} shares no variable with the " +
          "required pattern — an unanchored OPTIONAL is a cartesian product")
      val fresh = g.columns.toSeq.filterNot(reqVars.contains)
      val overlap = fresh.filter(newVarsSeen.contains)
      require(overlap.isEmpty,
        s"variable(s) ${overlap.mkString(", ")} bound by two optional groups — " +
          "only well-designed patterns (each optional var bound once) are supported")
      newVarsSeen ++= fresh
      acc.join(g, shared, "left")
    }
  }
}
