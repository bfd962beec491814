package graft.kg

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
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
 *     skew-free keys), in GREEDY SELECTIVITY ORDER (below), and AQE
 *     broadcasts whichever sides turn out runtime-small. Star patterns
 *     (shared subject) all join on subj_id, so over the E7 bucketed
 *     edges table every hop is Exchange-free.
 *
 * JOIN-ORDER SELECTION: patterns are joined most-selective-first by the
 * classic BGP heuristic (the static ordering RDF-3X-style engines use):
 * start from the pattern with the most constants, then repeatedly join
 * the CONNECTED pattern with the most bound positions — a constant
 * counts double, a variable already bound by the joined prefix counts
 * once — with the caller's order as tiebreak. Equi-joins commute, so
 * ordering changes only the intermediate sizes, never the result (the
 * kg_bgp_reorder driver gate pins a deliberately worst-case-ordered
 * query hash-equal to its well-ordered twin, and PlanAuditSpec pins the
 * selective pattern at the head of the join tree).
 *
 * Disconnected patterns (>= 2 components with no shared variable) are
 * rejected instead of silently cross-joining: at KG scale a cartesian
 * product is always a bug, and the caller can add the linking pattern
 * or run the components as separate queries.
 *
 * PROPERTY PATHS: a predicate position may be [[PlusPath]] (SPARQL
 * `<p>+`): the pattern then matches the TRANSITIVE CLOSURE of that one
 * predicate's edge set, computed by `GraphOps.transitiveClosure`
 * (iterative doubling, O(log diameter) self-joins). Closure size is
 * inherently O(n * reach) — at web scale you put `+` on curated
 * hierarchy predicates (subClassOf, partOf over a vocabulary), never on
 * instance-scale predicates; transitiveClosure's maxIter bounds runaway
 * inputs. [[InvPath]] (`^<p>`) matches the inverse edge — the same
 * pushed scan with the id columns swapped; [[SeqPath]]
 * (`<p1>/<p2>/...`, steps optionally inverted) composes one edge per
 * step via equi-joins on the intermediate node ids, projecting each
 * intermediate away before the next join (bag semantics — one binding
 * row per distinct route, as SPARQL defines for `/`).
 *
 * FILTER: post-match column predicates over the binding columns (SPARQL
 * FILTER in the well-behaved fragment) — pass them via the `filters`
 * overloads; they are plain `.filter` calls, evaluated after the whole
 * group matches (so they may reference OPTIONAL-bound variables, which
 * are NULL for unmatched rows — as in SPARQL, where an error/unbound
 * comparison makes the filter drop the row; use `isNull` checks for
 * bound-ness tests).
 *
 * Bag semantics (standard BGP): no implicit distinct. Binding columns
 * are emitted in VARIABLE-NAME ORDER (so results are independent of the
 * join order the optimizer picks).
 */
object Bgp {

  /** One position of a triple pattern: a named variable or a constant.
    * Constants match the edges-frame columns as-is: node ids (see
    * [[iriId]]/[[litId]]) in subject/object position, the predicate IRI
    * string in predicate position. */
  sealed trait TermPat
  final case class V(name: String) extends TermPat
  final case class C(value: String) extends TermPat
  /** SPARQL `<p>+` — PREDICATE position only: matches pairs connected by
    * a path of 1..n `pred` edges (transitive closure of the predicate). */
  final case class PlusPath(pred: String) extends TermPat
  /** SPARQL `<p1>|<p2>` — PREDICATE position only: matches an edge whose
    * predicate is ANY of the alternatives (a pushed IN-filter on the
    * scan, same shape as a single constant). */
  final case class AltPath(preds: Seq[String]) extends TermPat
  /** SPARQL `^<p>` — PREDICATE position only: matches the INVERSE edge
    * (object-to-subject); the same pushed predicate filter with the id
    * columns swapped, zero extra cost. */
  final case class InvPath(pred: String) extends TermPat
  /** One step of a sequence path: a predicate, optionally inverted. */
  final case class PathStep(pred: String, inverse: Boolean = false)
  /** SPARQL `<p1>/<p2>/...` — PREDICATE position only: pairs connected
    * by one edge per step in order (steps may be inverted, `^<p>`).
    * k steps = k-1 equi-joins on the intermediate node ids (uniform
    * sha256 — skew-free), each hop's predicate filter pushed to its
    * scan, intermediate nodes projected away before every join. BAG
    * semantics per SPARQL path evaluation: each distinct route yields
    * one binding row. */
  final case class SeqPath(steps: Seq[PathStep]) extends TermPat
  /** SPARQL `<p>*` — PREDICATE position only: the predicate's transitive
    * closure UNION the zero-length path, which per the SPARQL spec
    * matches EVERY term of the graph ((n, n) for each distinct node).
    * The relation is therefore >= \|V\| rows — anchor it with a
    * selective co-pattern, as with any `skos:broader*`-style query. */
  final case class StarPath(pred: String) extends TermPat
  /** SPARQL `<p>?` — PREDICATE position only: the predicate's edges
    * UNION the zero-length path (identity over every graph node). */
  final case class OptPath(pred: String) extends TermPat
  /** SPARQL `!(<p1>|...)` — PREDICATE position only: matches an edge
    * whose predicate is NONE of the members (a pushed NOT-IN filter on
    * the scan); forward members only — a set with inverse members `^p`
    * lowers to [[PNegated]] inside a [[NestedPath]] instead. */
  final case class NegSet(preds: Seq[String]) extends TermPat
  /** A parenthesized path group with a closure operator applied —
    * SPARQL `(p1/p2)+`, `(a|b)*`, `(^p/q)?`: `inner` is the grouped
    * path (SeqPath / AltPath / InvPath / a plain C), and `op` is '+'
    * (transitive closure of the group's relation), '*' (closure union
    * the zero-length path) or '?' (the relation union the zero-length
    * path). The closure runs the same O(log diameter) iterative
    * doubling as `<p>+`, over the COMPOSED hop relation — size caveats
    * of [[PlusPath]]/[[StarPath]] apply unchanged. */
  final case class GroupPath(inner: TermPat, op: Char) extends TermPat

  /** The full SPARQL 1.1 property-path algebra, recursively composable
    * — the general form behind the specialized TermPats above. The
    * front end lowers every simple shape to its specialized twin (a
    * pushed IN-filter beats a union of scans), so a [[NestedPath]]
    * carries only the genuinely nested shapes: closures inside
    * sequences or alternatives (`<a>/<b>+`), inverses of groups
    * (`^(<a>/<b>)`), alternatives of non-leaves (`<a>+|<b>`), mixed
    * negated sets (`!(<a>|^<b>)`), and closures over any of those. */
  sealed trait PathAst
  /** One predicate's forward edges. */
  final case class PLeaf(pred: String) extends PathAst
  /** `^path` — the inverse relation (id columns swapped). */
  final case class PInverse(inner: PathAst) extends PathAst
  /** `p1/p2/...` — relation composition, one equi-join per boundary on
    * the intermediate node ids (uniform sha256, skew-free), nothing but
    * two id columns ever crossing a join. */
  final case class PSequence(parts: Seq[PathAst]) extends PathAst
  /** `p1|p2|...` — bag union of the branch relations (SPARQL path
    * evaluation: each distinct route yields one row). */
  final case class PAlternative(parts: Seq[PathAst]) extends PathAst
  /** `path+` / `path*` / `path?` — closure of the composed relation via
    * the same O(log diameter) iterative doubling as `<p>+`; `*`/`?`
    * union the graph-wide zero-length identity (>= \|V\| rows — anchor
    * with a selective co-pattern). */
  final case class PClosure(inner: PathAst, op: Char) extends PathAst
  /** `!(f1|...|^i1|...)` — a negated property set with forward and
    * inverse members (SPARQL 1.1 9.1): the bag union of a forward
    * NOT-IN scan over `fwd` and an id-swapped NOT-IN scan over `inv`;
    * either side may be empty (all-forward lowers to [[NegSet]]). */
  final case class PNegated(fwd: Seq[String], inv: Seq[String]) extends PathAst
  /** A genuinely nested property path (see [[PathAst]]) in predicate
    * position, compiled recursively by the pathRel case of
    * [[pathHop]]-style composition inside [[patternRel]]. */
  final case class NestedPath(path: PathAst) extends TermPat

  /** GRAPH-position scoping from a SPARQL dataset clause (13.2):
    * restrict the pattern's quads to the graph-IRI set `values` (a
    * pushed IN-filter on the raw graph column; EMPTY set = matches
    * NOTHING, the spec's empty default/named dataset), and additionally
    * bind the graph IRI to `bind` when the pattern sat inside
    * `GRAPH ?g { ... }` under FROM NAMED. */
  final case class GraphIn(values: Seq[String], bind: Option[String]) extends TermPat

  /** Whether a path's relation CONTAINS the zero-length identity over
    * every graph node — such relations are >= \|V\| rows, the weakest
    * in any query, and must never lead the join order. */
  private def pathHasIdentity(p: PathAst): Boolean = p match {
    case PClosure(_, '*') | PClosure(_, '?') => true
    case PClosure(inner, _)  => pathHasIdentity(inner)
    case PInverse(inner)     => pathHasIdentity(inner)
    case PSequence(parts)    => parts.forall(pathHasIdentity)
    case PAlternative(parts) => parts.exists(pathHasIdentity)
    case PLeaf(_) | PNegated(_, _) => false
  }

  /** A triple pattern, optionally scoped to a NAMED GRAPH (SPARQL
    * `GRAPH g { ... }`): `graph` constrains/binds the edges frame's
    * `graph` column — a RAW graph IRI derived from lineage (see
    * [[Materialize.quads]]), the same raw-IRI space as the pred column.
    * A constant graph is a pushed scan filter; a variable binds the
    * column. Path-form predicates accept a CONSTANT graph (the filter
    * applies before the closure/composition) but not a variable one —
    * a per-graph closure would need a plan this fragment doesn't build. */
  final case class TriplePattern(subj: TermPat, pred: TermPat, obj: TermPat,
                                 graph: Option[TermPat] = None)

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

  /** Variables of a pattern (subject/object, a variable predicate and a
    * variable graph). */
  private def patVars(p: TriplePattern): Set[String] =
    (Seq(p.subj, p.pred, p.obj) ++ p.graph).collect {
      case V(n)                 => n
      case GraphIn(_, Some(n))  => n
    }.toSet

  /** Constant positions of a pattern; most path forms count as a
    * constant predicate (they pin the relation to a fixed predicate
    * set / its closure / its composition) — EXCEPT the zero-length
    * forms `*`/`?`, whose relation contains identity over every graph
    * node (>= \|V\| rows, the WEAKEST relation in the query): counting
    * them selective would put them at the head of the join tree. */
  private def patConsts(p: TriplePattern): Int =
    (Seq(p.subj, p.pred, p.obj) ++ p.graph).count {
      case V(_)                     => false
      case StarPath(_) | OptPath(_) => false
      case GroupPath(_, op)         => op == '+'
      case NestedPath(ast)          => !pathHasIdentity(ast)
      case GraphIn(_, bind)         => bind.isEmpty
      case _                        => true
    }

  /** One relation per triple pattern: constants -> pushed-down filters,
    * variables -> renamed columns (a variable repeated WITHIN a pattern
    * becomes an equality filter and binds once); a PlusPath predicate
    * swaps the base edge relation for that predicate's closure; an
    * AltPath predicate is a pushed IN-filter. */
  /** The (subj_id, obj_id) relation of ONE traversal of a path form —
    * the building block [[patternRel]] scans and [[GroupPath]] closures
    * compose. Constants/alternatives/negated sets are pushed scan
    * filters; inverse swaps the id columns; a sequence composes one
    * pushed scan per step via equi-joins on the intermediate ids. */
  private def pathHop(base: DataFrame, pat: TermPat): DataFrame = pat match {
    case C(pr) =>
      base.filter(col("pred") === lit(pr)).select("subj_id", "obj_id")
    case AltPath(ps) =>
      require(ps.nonEmpty, "empty predicate alternative list")
      base.filter(col("pred").isin(ps: _*)).select("subj_id", "obj_id")
    case InvPath(pr) =>
      base.filter(col("pred") === lit(pr))
        .select(col("obj_id").as("subj_id"), col("subj_id").as("obj_id"))
    case NegSet(ps) =>
      require(ps.nonEmpty, "empty negated property set")
      base.filter(!col("pred").isin(ps: _*)).select("subj_id", "obj_id")
    case SeqPath(steps) =>
      require(steps.sizeIs >= 2, s"a sequence path needs >= 2 steps: $pat")
      // hop i carries (n{i}, n{i+1}); the fold joins on the shared
      // intermediate name, so no payload but two id columns ever
      // crosses a join
      val hops = steps.zipWithIndex.map { case (PathStep(pr, inv), i) =>
        val h = base.filter(col("pred") === lit(pr))
        val (a, b) = if (inv) ("obj_id", "subj_id") else ("subj_id", "obj_id")
        h.select(col(a).as(s"n$i"), col(b).as(s"n${i + 1}"))
      }
      val joined = hops.tail.zipWithIndex.foldLeft(hops.head) {
        case (acc, (h, i)) =>
          acc.join(h, Seq(s"n${i + 1}")).select(col("n0"), col(s"n${i + 2}"))
      }
      joined.select(col("n0").as("subj_id"), col(s"n${steps.size}").as("obj_id"))
    case other =>
      throw new IllegalArgumentException(s"not a composable path form: $other")
  }

  /** The (subj_id, obj_id) relation of a fully general [[PathAst]] —
    * recursive composition: leaves and negated sets are pushed scan
    * filters, inverse swaps columns, sequences fold equi-joins on the
    * intermediate ids, alternatives are bag unions, closures run the
    * O(log diameter) iterative doubling over the composed inner
    * relation ('*'/'?' union the zero-length identity of the SCOPED
    * graph, same semantics as [[StarPath]]/[[OptPath]]). */
  private def pathRel(base: DataFrame, p: PathAst): DataFrame = p match {
    case PLeaf(pr) =>
      base.filter(col("pred") === lit(pr)).select("subj_id", "obj_id")
    case PInverse(inner) =>
      pathRel(base, inner)
        .select(col("obj_id").as("subj_id"), col("subj_id").as("obj_id"))
    case PNegated(fwd, inv) =>
      val arms =
        (if (fwd.nonEmpty)
          Seq(base.filter(!col("pred").isin(fwd: _*))
            .select("subj_id", "obj_id"))
        else Nil) ++
        (if (inv.nonEmpty)
          Seq(base.filter(!col("pred").isin(inv: _*))
            .select(col("obj_id").as("subj_id"), col("subj_id").as("obj_id")))
        else Nil)
      require(arms.nonEmpty, "empty negated property set")
      arms.reduce(_ union _)
    case PSequence(parts) =>
      require(parts.sizeIs >= 2, s"a sequence path needs >= 2 parts: $p")
      val rels = parts.zipWithIndex.map { case (pt, i) =>
        pathRel(base, pt)
          .select(col("subj_id").as(s"n$i"), col("obj_id").as(s"n${i + 1}"))
      }
      rels.tail.zipWithIndex.foldLeft(rels.head) { case (acc, (r, i)) =>
        acc.join(r, Seq(s"n${i + 1}")).select(col("n0"), col(s"n${i + 2}"))
      }.select(col("n0").as("subj_id"), col(s"n${parts.size}").as("obj_id"))
    case PAlternative(parts) =>
      require(parts.sizeIs >= 2, s"an alternative path needs >= 2 parts: $p")
      parts.map(pathRel(base, _)).reduce(_ union _)
    case PClosure(inner, op) =>
      val rel = pathRel(base, inner)
      op match {
        case '+' => GraphOps.transitiveClosure(rel, "subj_id", "obj_id")
        case '*' => GraphOps.transitiveClosure(rel, "subj_id", "obj_id")
          .union(graphIdentity(base)).distinct()
        case '?' => rel.union(graphIdentity(base)).distinct()
        case other => throw new IllegalArgumentException(
          s"unknown path closure operator '$other'")
      }
  }

  private[kg] def patternRel(base: DataFrame, p: TriplePattern): DataFrame = {
    Seq(p.subj, p.obj).foreach(t =>
      require(t.isInstanceOf[V] || t.isInstanceOf[C],
        s"path operators are only valid in predicate position: $p"))
    p.graph.foreach(g => require(g.isInstanceOf[V] || g.isInstanceOf[C] ||
      g.isInstanceOf[GraphIn],
      s"a GRAPH term must be a variable or an IRI constant: $p"))
    val isPlainPred = p.pred match {
      case V(_) | C(_) => true
      case _           => false
    }
    // a constant graph scopes the scan BEFORE any path composition (a
    // pushed equality on the raw graph column); a variable graph binds
    // the column and is only decidable for plain predicates — a
    // per-graph closure needs a plan this fragment doesn't build
    val gbase = p.graph match {
      case Some(C(g)) => base.filter(col("graph") === lit(g))
      case Some(V(_)) =>
        require(isPlainPred,
          s"a variable GRAPH cannot scope a path-form predicate: $p")
        base
      case Some(GraphIn(vals, bind)) =>
        require(bind.isEmpty || isPlainPred,
          s"a variable GRAPH cannot scope a path-form predicate: $p")
        // an empty dataset side matches nothing (SPARQL 13.2)
        if (vals.isEmpty) base.filter(lit(false))
        else base.filter(col("graph").isin(vals: _*))
      case Some(other) => // unreachable: the require above rejects these
        throw new IllegalArgumentException(s"invalid GRAPH term: $other")
      case None => base
    }
    val pairPos = Seq("subj_id" -> p.subj, "obj_id" -> p.obj)
    val (rel, pos) = p.pred match {
      case PlusPath(pr) =>
        (GraphOps.transitiveClosure(pathHop(gbase, C(pr)), "subj_id", "obj_id"),
          pairPos)
      case StarPath(pr) =>
        (GraphOps.transitiveClosure(pathHop(gbase, C(pr)), "subj_id", "obj_id")
           .union(graphIdentity(gbase)).distinct(), pairPos)
      case OptPath(pr) =>
        (pathHop(gbase, C(pr)).union(graphIdentity(gbase)).distinct(), pairPos)
      case GroupPath(inner, op) =>
        val hop = pathHop(gbase, inner)
        val r = op match {
          case '+' => GraphOps.transitiveClosure(hop, "subj_id", "obj_id")
          case '*' => GraphOps.transitiveClosure(hop, "subj_id", "obj_id")
            .union(graphIdentity(gbase)).distinct()
          case '?' => hop.union(graphIdentity(gbase)).distinct()
          case other => throw new IllegalArgumentException(
            s"unknown path group operator '$other'")
        }
        (r, pairPos)
      case NestedPath(ast) =>
        (pathRel(gbase, ast), pairPos)
      case AltPath(_) | InvPath(_) | NegSet(_) | SeqPath(_) =>
        (pathHop(gbase, p.pred), pairPos)
      case _ =>
        val trip = Seq("subj_id" -> p.subj, "pred" -> p.pred, "obj_id" -> p.obj)
        (gbase, p.graph match {
          case Some(g @ V(_))              => trip :+ ("graph" -> (g: TermPat))
          case Some(GraphIn(_, Some(b)))   => trip :+ ("graph" -> (V(b): TermPat))
          case _                           => trip
        })
    }
    require(pos.exists(_._2.isInstanceOf[V]),
      s"triple pattern $p has no variable — ASK-style existence checks " +
        "are a filter on the caller's side, not a join input")
    val filtered = pos.foldLeft(rel) {
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

  /** The SPARQL zero-length path: (n, n) for every distinct term of the
    * graph — one distinct over the two id columns. */
  private def graphIdentity(base: DataFrame): DataFrame =
    base.select(col("subj_id").as("n"))
      .union(base.select(col("obj_id").as("n")))
      .distinct()
      .select(col("n").as("subj_id"), col("n").as("obj_id"))

  /** Greedy selectivity join order over pattern indices (see scaladoc);
    * private[kg] so the spec can pin the ordering heuristic directly. */
  private[kg] def joinOrder(patterns: Seq[TriplePattern]): Seq[Int] = {
    val idxs = patterns.indices
    val vs = patterns.map(patVars)
    val cs = patterns.map(patConsts)
    // most constants first; -i makes the EARLIEST caller index win ties
    val first = idxs.maxBy(i => (cs(i), -i))
    var order = Vector(first)
    var bound = vs(first)
    var remaining = idxs.toSet - first
    while (remaining.nonEmpty) {
      val connected = remaining.filter(i => (vs(i) & bound).nonEmpty)
      require(connected.nonEmpty,
        "disconnected BGP: the patterns form >= 2 components sharing no " +
          "variable — add a linking pattern or run the components as " +
          "separate queries; a cartesian product at KG scale is always a bug")
      val next = connected.maxBy(i => (2 * cs(i) + (vs(i) & bound).size, -i))
      order :+= next
      bound ++= vs(next)
      remaining -= next
    }
    order
  }

  /**
   * Match `patterns` against an edges frame with columns
   * (subj_id, pred, obj_id); extra columns are ignored. Output: one
   * column per distinct variable (in variable-name order), one row per
   * binding.
   */
  def matchPatterns(edges: DataFrame, patterns: Seq[TriplePattern]): DataFrame = {
    require(patterns.nonEmpty, "empty basic graph pattern")
    val base =
      if (!patterns.exists(_.graph.isDefined))
        edges.select("subj_id", "pred", "obj_id")
      else {
        require(edges.columns.contains("graph"),
          "GRAPH patterns need a 'graph' column on the edges frame — " +
            "derive one from lineage with Materialize.quads(edges)")
        edges.select("subj_id", "pred", "obj_id", "graph")
      }
    val rels: Seq[DataFrame] = patterns.map(p => patternRel(base, p))
    val joined = joinOrder(patterns).map(rels).reduceLeft { (acc, r) =>
      val shared = r.columns.toSeq.intersect(acc.columns.toSeq)
      acc.join(r, shared, "inner")
    }
    joined.select(joined.columns.sorted.map(col): _*)
  }

  /** [[matchPatterns]] + SPARQL FILTER predicates over the binding
    * columns, applied after the match. */
  def matchPatterns(edges: DataFrame, patterns: Seq[TriplePattern],
                    filters: Seq[Column]): DataFrame =
    filters.foldLeft(matchPatterns(edges, patterns))(_ filter _)

  /**
   * BGP with SPARQL OPTIONAL groups: `required` matches as
   * [[matchPatterns]]; each optional group is itself a BGP, matched
   * independently and LEFT-joined to the required bindings on its
   * shared variables — rows keep their required bindings and take NULL
   * for the group's new variables when the group has no match. `filters`
   * apply AFTER the optional joins (standard SPARQL group semantics:
   * FILTER sees the whole group's bindings, including NULLs for
   * unmatched optional variables).
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
                        optional: Seq[Seq[TriplePattern]],
                        filters: Seq[Column] = Nil,
                        optionalFilters: Seq[Seq[Column]] = Nil): DataFrame = {
    val base = matchPatterns(edges, required)
    val reqVars = base.columns.toSet
    val newVarsSeen = scala.collection.mutable.Set.empty[String]
    val joined = optional.zipWithIndex.foldLeft(base) { case (acc, (group, i)) =>
      // a FILTER inside the OPTIONAL group conditions the MATCH, not the
      // row: SPARQL's LeftJoin(required, P, C). When C reads only the
      // group's own variables (the Sparql front end enforces this),
      // pre-filtering the group side is exactly the ON-clause semantics —
      // a failing C makes the group unmatched (NULLs), never drops the row
      val g = optionalFilters.lift(i).getOrElse(Nil)
        .foldLeft(matchPatterns(edges, group))(_ filter _)
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
    filters.foldLeft(joined)(_ filter _)
  }

  /**
   * SPARQL MINUS groups over a matched binding frame: each group is
   * itself a BGP, matched independently; rows of `bindings` are removed
   * when a group solution agrees on the variables they share — one
   * LEFT-ANTI equi-join per group on the shared variables (the same
   * shuffle shape as the inner joins; the anti side is projected to its
   * shared columns and deduped first, so no group payload crosses the
   * shuffle).
   *
   * A group sharing NO variable with the bindings is rejected: SPARQL's
   * disjoint-domain MINUS removes nothing, which in practice means a
   * typo'd variable — fail loudly instead. NULL bindings (from an
   * unmatched OPTIONAL) never equal a group value under join equality,
   * so such rows SURVIVE — matching SPARQL's compatibility semantics,
   * where an unbound shared variable makes the mappings compatible only
   * on the remaining shared domain (and our well-designed fragment
   * requires at least one non-null shared var for removal).
   */
  def applyMinus(edges: DataFrame, bindings: DataFrame,
                 minus: Seq[Seq[TriplePattern]]): DataFrame =
    minus.foldLeft(bindings) { (acc, group) =>
      val g = matchPatterns(edges, group)
      val shared = g.columns.toSeq.filter(acc.columns.contains)
      require(shared.nonEmpty,
        s"MINUS group ${group.mkString(", ")} shares no variable with the " +
          "bindings — SPARQL disjoint-domain MINUS removes nothing; this is " +
          "almost always a typo'd variable")
      acc.join(g.select(shared.map(col): _*).distinct(), shared, "left_anti")
    }

  /**
   * SPARQL `FILTER EXISTS { group }` / `FILTER NOT EXISTS { group }` over
   * a matched binding frame: each group is itself a BGP, matched
   * independently; a binding row passes EXISTS when a group solution
   * agrees on the variables they share (one LEFT-SEMI equi-join per
   * group), and NOT EXISTS inverts that (LEFT-ANTI). The probe side is
   * projected to the shared columns and deduped first, so no group
   * payload crosses the shuffle, and semi/anti joins preserve the
   * binding side's bag semantics exactly.
   *
   * Fragment note: full SPARQL evaluates EXISTS by substituting the
   * outer row's bound variables and leaving the rest free; over shared
   * NON-NULL variables that is precisely this equi-semi-join. A group
   * sharing NO variable with the bindings is rejected (a constant-truth
   * probe is almost always a typo'd variable), and a NULL shared
   * binding (unmatched OPTIONAL) never equals a probe value, so such
   * rows fail EXISTS and survive NOT EXISTS — the same compatibility
   * rule [[applyMinus]] documents. Within this fragment NOT EXISTS and
   * MINUS coincide; they diverge only on the disjoint-domain and
   * correlated-FILTER cases both are rejected from.
   */
  def applyExists(edges: DataFrame, bindings: DataFrame,
                  groups: Seq[Seq[TriplePattern]],
                  negate: Boolean = false): DataFrame =
    groups.foldLeft(bindings) { (acc, group) =>
      val g = matchPatterns(edges, group)
      val shared = g.columns.toSeq.filter(acc.columns.contains)
      require(shared.nonEmpty,
        s"${if (negate) "NOT EXISTS" else "EXISTS"} group " +
          s"${group.mkString(", ")} shares no variable with the bindings — " +
          "a constant-truth probe is almost always a typo'd variable")
      acc.join(g.select(shared.map(col): _*).distinct(), shared,
        if (negate) "left_anti" else "left_semi")
    }

  /**
   * Full SPARQL group for the well-designed fragment:
   * required BGP -> OPTIONAL left-joins -> MINUS anti-joins -> FILTERs
   * (filters last: SPARQL group semantics scope FILTER over the whole
   * group's bindings, including OPTIONAL NULLs).
   */
  def matchGroup(edges: DataFrame, required: Seq[TriplePattern],
                 optional: Seq[Seq[TriplePattern]] = Nil,
                 minus: Seq[Seq[TriplePattern]] = Nil,
                 filters: Seq[Column] = Nil): DataFrame = {
    val withOpt = matchWithOptional(edges, required, optional)
    filters.foldLeft(applyMinus(edges, withOpt, minus))(_ filter _)
  }

  /**
   * VALUE-SPACE bridge for FILTER-by-value: SPARQL comparisons like
   * `FILTER(?price > 100)` are undecidable over hashed node ids — the
   * value space lives in the D2 nodes table. This joins the nodes row
   * onto each requested binding column `v`, adding one `<v>_term`
   * struct column (kind, value, lang, dt) that the [[TypedLiterals]]
   * accessors interpret:
   *
   * {{{
   *   Bgp.bindValues(bindings, nodesTable, Seq("price"))
   *     .filter(TypedLiterals.asDouble(col("price_term")) > 100.0)
   * }}}
   *
   * One equi-join per variable on the uniform sha256 id (broadcast when
   * the projected nodes side is dimension-sized); LEFT join + NULL-for-
   * non-literal accessors reproduce SPARQL's error-means-exclude FILTER
   * semantics for IRIs/bnodes in value position.
   *
   * The nodes side is projected ONCE, and the per-variable renames
   * happen ABOVE the join: every join's build side is then the
   * canonically-identical subplan, so Spark's exchange reuse
   * (ReusedExchange / ReusedSubquery under AQE) materializes the nodes
   * aggregation a single time however many variables read the value
   * space — a per-variable rename INSIDE the projection would make the
   * subtrees distinct and rebuild the nodes dedup once per variable.
   */
  def bindValues(bindings: DataFrame, nodes: DataFrame,
                 vars: Seq[String]): DataFrame = {
    require(vars.nonEmpty, "bindValues needs at least one variable")
    val missing = vars.filterNot(bindings.columns.contains)
    require(missing.isEmpty,
      s"bindValues variable(s) ${missing.mkString(", ")} are not bound")
    val proj = nodes.select(col("id").as("__term_id"),
      struct(col("kind"), col("value"), col("lang"), col("dt")).as("__term"))
    vars.foldLeft(bindings) { (df, v) =>
      df.join(proj, df(v) === proj("__term_id"), "left")
        .drop("__term_id")
        .withColumnRenamed("__term", s"${v}_term")
    }
  }

  /**
   * SPARQL VALUES over a matched binding frame: keep only rows whose
   * `vars` columns match one of the inline `rows` (SET semantics — the
   * inline data is deduped and used as a selection, never a bag
   * multiplier). A single variable compiles to an IN-filter Catalyst can
   * push toward the scan; multiple variables become a BROADCAST
   * left-semi join against the (tiny, driver-local) inline relation —
   * both shapes are shuffle-free on the bindings side at any scale.
   *
   * Restricted to the well-designed fragment: every VALUES variable
   * must be a binding column, and a NULL binding (an unmatched OPTIONAL
   * variable) never matches an inline row — callers who need SPARQL's
   * unbound-is-compatible semantics should anchor VALUES variables in
   * the required pattern (the [[Sparql]] front end enforces exactly
   * that).
   */
  def applyValues(bindings: DataFrame, vars: Seq[String],
                  rows: Seq[Seq[String]]): DataFrame = {
    require(vars.nonEmpty, "VALUES needs at least one variable")
    require(rows.nonEmpty, "VALUES needs at least one row")
    require(rows.forall(_.size == vars.size),
      s"every VALUES row must have ${vars.size} term(s) for (${vars.mkString(", ")})")
    val missing = vars.filterNot(bindings.columns.contains)
    require(missing.isEmpty,
      s"VALUES variable(s) ${missing.mkString(", ")} are not bound by the pattern")
    // UNDEF cells (null) are compatible with ANY binding (SPARQL 10.2);
    // a semi-join key cannot express that, so rows with UNDEF compile
    // to the disjunction of their defined-cell conjunctions — a pushed
    // boolean filter, still zero-shuffle (inline data is always small).
    // A row of ALL UNDEF cells is compatible with everything: no filter.
    if (rows.exists(_.contains(null))) {
      val rowPreds = rows.distinct.map { r =>
        vars.zip(r).collect { case (v, c0) if c0 != null => col(v) === lit(c0) }
          .reduceOption(_ && _)
      }
      if (rowPreds.contains(None)) bindings
      else bindings.filter(rowPreds.flatten.reduce(_ || _))
    }
    else if (vars.sizeIs == 1)
      bindings.filter(col(vars.head).isin(rows.map(_.head).distinct: _*))
    else {
      val spark = bindings.sparkSession
      val schema = org.apache.spark.sql.types.StructType(vars.map(v =>
        org.apache.spark.sql.types.StructField(v, org.apache.spark.sql.types.StringType,
          nullable = false)))
      val inline = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.distinct.map(org.apache.spark.sql.Row.fromSeq), 1), schema)
      bindings.join(broadcast(inline), vars, "left_semi")
    }
  }

  /**
   * SPARQL UNION: bag union of independently matched branches. Columns
   * align on the union of all branch variables (name order); a variable
   * unbound in a branch is NULL in that branch's rows — standard SPARQL
   * union-of-solution-mappings semantics. Each branch is a full BGP
   * (its own join order, its own pushed filters); the union itself is a
   * zero-shuffle concatenation.
   */
  def matchUnion(edges: DataFrame, branches: Seq[Seq[TriplePattern]]): DataFrame = {
    require(branches.nonEmpty, "empty UNION")
    val matched = branches.map(b => matchPatterns(edges, b))
    val allVars = matched.flatMap(_.columns).distinct.sorted
    matched.map { m =>
      val have = m.columns.toSet
      m.select(allVars.map(v =>
        (if (have(v)) col(v) else lit(null).cast("string")).as(v)): _*)
    }.reduce(_ union _)
  }
}
