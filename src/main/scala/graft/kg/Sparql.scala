package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Bgp.{AltPath, C, InvPath, NegSet, OptPath, PathStep, PlusPath, SeqPath, StarPath, TriplePattern, V}

/**
 * A tiny SPARQL front end for the [[Bgp]] layer — the string surface
 * that makes the query layer usable without constructing pattern ASTs
 * by hand. Recursive-descent over a hand-rolled tokenizer; the parsed
 * form is pinned EQUAL to the programmatic form by SparqlParserSpec and
 * the kg_sparql_parse driver gate, so the parser can never drift from
 * the engine's semantics.
 *
 * Supported fragment (deliberately the well-designed subset the Bgp
 * layer implements — a parse error beats silently wrong semantics):
 *
 * {{{
 *   query   := (PREFIX ns: <iri>)*                 (later decl wins)
 *              ( select | ASK WHERE? { group }
 *            | CONSTRUCT { triple+ } WHERE { group }
 *            | DESCRIBE (?var | <iri>)+ (WHERE? { group })? )
 *              — ns:local / :local expand to full IRIs pre-parse
 *   select  := SELECT DISTINCT? (proj+ | *) WHERE { group } modifiers
 *   proj    := ?var | ( agg ( DISTINCT? (?var | *) sepOpt ) AS ?alias )
 *   agg     := COUNT | SUM | AVG | MIN | MAX | SAMPLE | GROUP_CONCAT
 *   sepOpt  := (';' SEPARATOR = "sep")?          (GROUP_CONCAT only)
 *   group   := (triple '.'? | OPTIONAL { triples (FILTER ( expr ))* }
 *              | MINUS { triples }
 *              | FILTER ( expr ) | FILTER NOT? EXISTS { triples }
 *              | BIND ( bexpr AS ?var ) | VALUES valuesClause
 *              | { select }                    (subquery — see below)
 *              | { triples } UNION { triples } (UNION { triples })* )*
 *              (a UNION member alone is the classic pure union; next to
 *               required triples it joins the group on its shared
 *               variables, which must be bound in EVERY branch)
 *   bexpr   := nexpr | sexpr | ?var | "lit" | COALESCE(?var, ?var+)
 *            | IF ( expr , bexpr , bexpr )   (same-kind branches; a NULL
 *              condition takes the ELSE branch)
 *            | STRDT ( sexpr , <dt> ) | STRLANG ( sexpr , "tag" ) —
 *              mint a typed / language-tagged literal TERM: the node id
 *              (litId recipe, sha256 of the n3 form) computed at
 *              runtime, joinable/comparable against pattern bindings
 *              (?var alone copies the binding, COALESCE is the id-space
 *               OPTIONAL-fallback chain over pattern variables; numeric
 *               and string expressions produce PLAIN VALUE columns)
 *   nexpr   := nmul (('+' | '-') nmul)*        numeric VALUE space
 *   nmul    := natom (('*' | '/') natom)*      (x/0 = unbound, not INF)
 *   natom   := number | ?var | STRLEN ( sarg ) | ( nexpr ) | '-' natom
 *            | (ABS | CEIL | FLOOR | ROUND) ( nexpr )
 *              (ROUND = floor(x + 0.5): spec round-half-toward-+INF)
 *   sexpr   := STR(?v) | LANG(?v) | DATATYPE(?v) | CONCAT(sarg, sarg+)
 *            | LCASE(sarg) | UCASE(sarg)       string VALUE space
 *            | SUBSTR(sarg, nexpr (, nexpr)?)  1-based, like the spec
 *            | STRBEFORE(sarg, sarg) | STRAFTER(sarg, sarg)
 *            | REPLACE(sarg, "pat", "repl" (, "i")?)   all occurrences
 *   valuesClause := ?var { const+ } | ( ?var+ ) { ( const+ )+ }
 *   modifiers := (GROUP BY ?var+)? (HAVING ( hexpr ))*
 *                (ORDER BY (?var | ASC(?var) | DESC(?var))+)?
 *                (LIMIT int)? (OFFSET int)?     (LIMIT/OFFSET any order)
 *   triple  := term pred term
 *   term    := ?var | <iri> | "lit" | "lit"@lang | "lit"^^<dt>
 *            | _:label | []   (blank nodes: NON-DISTINGUISHED variables
 *              — they join across the required patterns sharing the
 *              label, never project, and are rejected outside the
 *              required group; [] takes a generated label)
 *   pred    := ?var | <iri> | <iri>+ | <iri>* | <iri>? | ^<iri>
 *            | <iri> ('|' <iri>)+ | step ('/' step)+ | a
 *            | !<iri> | !( <iri> ('|' <iri>)* )
 *            | '(' (step ('/' step)+ | <iri> ('|' <iri>)+ | step) ')'
 *              ('+' | '*' | '?')?
 *              where step := '^'? <iri>
 *              (a = rdf:type; + = transitive closure; * / ? add the
 *               zero-length path = identity over every graph node;
 *               | = alternatives; ^ = inverse; / = sequence;
 *               ! = negated property set; ONE closure operator may
 *               apply to ONE parenthesized group — (p1/p2)+, (a|b)* —
 *               deeper nesting stays out of fragment)
 *   expr    := BOUND(?v) | !expr | expr && expr | expr || expr
 *            | term (= | !=) term | ( expr )
 *            | nterm (< | <= | > | >= | = | !=) nterm
 *              where nterm := ?var | number — a comparison with a
 *              number (or an ordering operator) is VALUE-SPACE and
 *              needs the nodes table: run(edges, nodes, query)
 *            | nexpr (cmp) nexpr — arithmetic on either side selects
 *              the numeric value space (a parenthesized LEFT side is
 *              read as boolean grouping — start with the bare term)
 *            | term (cmp) "lit"^^xsd:date | "lit"^^xsd:dateTime — an
 *              xsd:date/dateTime TYPED constant selects the TEMPORAL
 *              value space (asDate/asTimestamp on both sides, compare
 *              by value; cross-type comparison rejected; nodes table
 *              required)
 *            | (YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS) ( ?v ) — datetime
 *              accessors into the NUMERIC value space (xsd:dateTime by
 *              value, xsd:date at midnight, anything else excluded);
 *              legal anywhere a numeric expression is
 *            | xsd:integer(?v) | xsd:double(?v) | xsd:string(?v) — the
 *              XPath constructor casts (17.5): numeric casts read the
 *              variable's own representation (numeric value, string
 *              lexical form via try_cast) with xsd:integer truncating
 *              toward zero; xsd:string = STR; out-of-space values are
 *              excluded, never thrown
 *            | (STRSTARTS | STRENDS | CONTAINS) ( sarg , sarg )
 *            | REGEX ( sarg , "pattern" (, "i")? )
 *            | sexpr (= | !=) (sexpr | "lit" | <iri> | ?var)
 *            | (ISIRI | ISLITERAL | ISBLANK) ( ?var )
 *            | LANGMATCHES ( sarg , "range" )   (RFC 4647 basic: "*" =
 *              any non-empty tag, else tag or tag-prefix, case-blind)
 *            | SAMETERM ( ?a , ?b )   (RDF-term identity = id equality;
 *              both variables must live in one value space)
 *            | ?var NOT? IN ( const (, const)* ) — all-number lists read
 *              the numeric value space, term lists the variable's own
 *              space (ids / raw IRIs / string BIND values)
 *              where sarg := sexpr | ?var | "lit" — all STRING-VALUE-
 *              SPACE forms, needing the nodes table like nexpr; a bare
 *              ?var arg reads string-family literals only (SPARQL type
 *              error = excluded), STR() also stringifies IRIs
 *   hexpr   := (COUNT | SUM | AVG)(...) (= | != | < | <= | > | >=) number
 *            | !hexpr | hexpr && hexpr | hexpr || hexpr | ( hexpr )
 *              (SUM/AVG in HAVING read the numeric value space like
 *               their projected forms — nodes-table overload required)
 * }}}
 *
 * Aggregation is SPARQL 1.1 GROUP BY semantics over the hashed-id
 * fragment: COUNT / COUNT DISTINCT are id-decidable; MIN / MAX over a
 * node-position variable follow SPARQL VALUE ORDERING when the nodes
 * table is attached — numeric literals compare by value, every other
 * term sorts before them by id, and the pick returns the winning
 * term's ID (render it with [[resolveTerms]]) — and fall back to the
 * documented deterministic id pick on the edges-only overload (the two
 * coincide whenever the group holds no numeric literal). ORDER BY over
 * a node-space variable upgrades the same way (one broadcast-able term
 * join per ordered column); aliases and BIND values always sort by
 * their plain column.
 * SAMPLE compiles to `min` (a deterministic pick where the spec allows
 * any) and GROUP_CONCAT concatenates in sorted order (the spec leaves
 * order undefined) so results are engine-independent; SUM/AVG read the
 * NUMERIC VALUE SPACE (one bindValues join per argument variable —
 * nodes-table overload required) with exact order-independent
 * decimal(28,10) accumulation, strict SPARQL error semantics (any
 * non-numeric/unbound value in the group makes the aggregate unbound)
 * and a single final cast to double. VALUES is a
 * set-semantics selection: one variable is a pushed IN-filter, several
 * a broadcast semi-join ([[Bgp.applyValues]]); its variables must be
 * anchored in the required pattern. ORDER BY + LIMIT plan as
 * per-partition top-k (TakeOrderedAndProject), never a global sort.
 *
 * Constants are translated with the engine's node-id recipe
 * ([[Bgp.iriId]] / [[Bgp.litId]]) so a parsed constant matches the same
 * materialized edge a programmatic one does. FILTER comparisons are
 * node-id (in)equality — the decidable fragment over hashed ids; value
 * ordering (`<`, arithmetic) needs the typed-literal columns
 * ([[TypedLiterals]]) and is out of scope here. Unbound variables make
 * a comparison NULL, which `.filter` drops — exactly SPARQL's
 * error-means-exclude FILTER semantics; test bound-ness with BOUND.
 *
 * VALUE-SPACE FILTER: a comparison against a bare number — or any `<`
 * `<=` `>` `>=` — compares in the NUMERIC value space instead. It
 * requires the D2 nodes table ([[run(edges:*,nodes:*]] overload): each
 * such variable is [[Bgp.bindValues]]-joined once, and the comparison
 * compiles to the [[TypedLiterals]] accessors with SPARQL's numeric
 * promotion (integer family and double/float/decimal both promote to
 * double — exact for |v| < 2^53). Non-numeric terms (IRIs, bnodes,
 * string literals) make the accessor NULL, so the row is excluded —
 * SPARQL's error-means-exclude, again.
 *
 * STRING VALUE-SPACE FILTER: STR / LANG / DATATYPE projections,
 * STRSTARTS / STRENDS / CONTAINS predicates and ISIRI / ISLITERAL /
 * ISBLANK kind tests ride the same bindValues join — one per distinct
 * variable regardless of how many functions read it. Same exclusion
 * rule: a function applied outside its SPARQL domain (STR of a bnode,
 * LANG of an IRI, a bare non-string-literal arg) reads NULL and the
 * row drops.
 *
 * SUBQUERIES (`{ SELECT ... }` inside a group) evaluate bottom-up and
 * inner-join the enclosing group on their shared plain variables —
 * SPARQL 1.1's join of solution mappings, restricted to the
 * never-NULL fragment: every subquery-projected plain variable must be
 * anchored in the subquery's required pattern, and at least one must
 * be shared with the outer required pattern (or an earlier subquery),
 * so the equi-join can never diverge from unbound-is-compatible
 * semantics. Aggregate aliases flow out as plain VALUE columns — outer
 * FILTERs/BINDs read them directly (a COUNT alias compares numerically
 * with no extra join), and the classic aggregate-then-join shape
 * (`{ SELECT ?g (COUNT(*) AS ?n) ... GROUP BY ?g }` joined back on
 * ?g) costs the subquery's one hash-agg shuffle plus one broadcast-able
 * equi-join.
 *
 * BIND computes a PLAIN VALUE column (double for nexpr, string for
 * sexpr) or an id-space copy (?var alone) — a pure projection, never a
 * shuffle. Bind variables can be FILTERed (numeric comparisons and the
 * string functions read them directly — no extra join), projected,
 * ORDER BY'd and used as GROUP BY keys; they are NOT RDF terms, so
 * LANG/DATATYPE/ISIRI-family tests, id-space `=` against constants,
 * SUM/AVG arguments and CONSTRUCT/DESCRIBE positions reject them at
 * parse with a pointer at the right spelling. A bind over a variable
 * the row leaves unbound (unmatched OPTIONAL) is itself unbound, per
 * SPARQL's error-propagation rule.
 *
 * DESCRIBE returns the forward description of the matched/listed
 * nodes as edges-convention rows — see [[describeEdges]].
 */
object Sparql {

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  // ---------- tokens -------------------------------------------------------

  private sealed trait Tok
  private final case class TVar(name: String) extends Tok
  private final case class TIri(iri: String) extends Tok
  private final case class TLit(v: String, lang: Option[String], dt: Option[String]) extends Tok
  private final case class TNum(v: Long) extends Tok
  private final case class TDbl(v: Double) extends Tok
  /** punctuation or UPPERCASED keyword (SELECT DISTINCT WHERE OPTIONAL
    * MINUS FILTER UNION BOUND AS GROUP BY HAVING ORDER ASC DESC LIMIT
    * OFFSET VALUES UNDEF and the aggregate names) or the bare rdf:type
    * shorthand "a". */
  private final case class TSym(s: String) extends Tok
  /** A prefixed name `ns:local` (or `ns:` in a PREFIX declaration, or
    * `:local` on the default prefix) — expanded to a [[TIri]] before
    * the body parser runs. */
  private final case class TPname(prefix: String, local: String) extends Tok
  /** A blank node in a query pattern — `_:label`, or `[]` with a
    * generated label. Compiles to a NON-DISTINGUISHED variable
    * (`_bn_label`): it joins like any variable but never projects. */
  private final case class TBnode(label: String) extends Tok

  private val Keywords = Set("PREFIX", "GRAPH",
    "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "DISTINCT", "WHERE",
    "OPTIONAL", "MINUS", "FILTER", "UNION", "BOUND", "AS", "GROUP", "BY",
    "HAVING", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET", "VALUES", "UNDEF",
    "SEPARATOR", "COUNT", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT", "SUM",
    "AVG", "EXISTS", "NOT", "STR", "LANG", "DATATYPE", "STRSTARTS",
    "STRENDS", "CONTAINS", "ISIRI", "ISLITERAL", "ISBLANK", "BIND",
    "CONCAT", "LCASE", "UCASE", "STRLEN", "REGEX", "COALESCE", "SUBSTR",
    "STRBEFORE", "STRAFTER", "REPLACE", "ABS", "CEIL", "FLOOR", "ROUND",
    "LANGMATCHES", "IF", "IN", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
    "SECONDS", "MD5", "SHA1", "SHA256", "SHA384", "SHA512",
    "ENCODE_FOR_URI", "SAMETERM", "FROM", "NAMED", "BASE", "STRDT",
    "STRLANG")

  /** XPath constructor-cast IRIs (SPARQL 17.5) the fragment supports:
    * xsd:integer / xsd:double into the numeric space, xsd:string into
    * the string space (= STR). */
  private val XsdIntegerIri = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDoubleIri = "http://www.w3.org/2001/XMLSchema#double"
  private val NumCastIris = Set(XsdIntegerIri, XsdDoubleIri)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"SPARQL parse error: $msg")

  private def tokenize(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var anonBnodes = 0
    val n = q.length
    def peek(k: Int): Char = if (i + k < n) q.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && q.charAt(i) != '\n') i += 1 }
      else if ("{}().+*;/^,-".indexOf(c) >= 0) { out += TSym(c.toString); i += 1 }
      else if (c == '=') { out += TSym("="); i += 1 }
      else if (c == '!' && peek(1) == '=') { out += TSym("!="); i += 2 }
      else if (c == '!') { out += TSym("!"); i += 1 }
      else if (c == '&' && peek(1) == '&') { out += TSym("&&"); i += 2 }
      else if (c == '|' && peek(1) == '|') { out += TSym("||"); i += 2 }
      else if (c == '|') { out += TSym("|"); i += 1 }
      else if (c == '>' && peek(1) == '=') { out += TSym(">="); i += 2 }
      else if (c == '>') { out += TSym(">"); i += 1 }
      else if (c.isDigit) {
        val s = i
        while (i < n && q.charAt(i).isDigit) i += 1
        // a '.' is the decimal point only when a digit follows — else it
        // is the triple terminator symbol
        if (i + 1 < n && q.charAt(i) == '.' && q.charAt(i + 1).isDigit) {
          i += 1
          while (i < n && q.charAt(i).isDigit) i += 1
          out += TDbl(q.substring(s, i).toDouble)
        } else out += TNum(q.substring(s, i).toLong)
      } else if (c == '?' || c == '$') {
        val s = i + 1
        i += 1
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        if (i == s) {
          // a bare '?' (no name following) is the zero-or-one path
          // operator, as in `<p>?`; a bare '$' is still an error
          if (c == '?') out += TSym("?")
          else fail(s"empty variable name at offset $s")
        } else {
          val name = q.substring(s, i)
          if (name.startsWith("_bn_"))
            fail(s"variable names starting with _bn_ are reserved for " +
              "blank-node compilation — rename ?" + name)
          out += TVar(name)
        }
      } else if (c == '_' && peek(1) == ':') {
        val s = i + 2
        i += 2
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        if (i == s) fail("empty blank node label after '_:'")
        // explicit labels live in the "u" namespace, disjoint from the
        // generated anonymous "a" namespace of []
        out += TBnode("u" + q.substring(s, i))
      } else if (c == '[') {
        var j = i + 1
        while (j < n && q.charAt(j).isWhitespace) j += 1
        if (j < n && q.charAt(j) == ']') {
          anonBnodes += 1
          // the "a" namespace is disjoint from explicit labels ("u"):
          // SPARQL's [] is a FRESH node, never joinable with _:a1
          out += TBnode(s"a$anonBnodes")
          i = j + 1
        } else fail("'[ p o ]' property lists are not in this fragment — " +
          "only the anonymous blank node [] (use an explicit _:label)")
      } else if (c == '<') {
        // '<' is an IRI opener except in a comparison position: `<= `
        // and `< 3` can only be HAVING operators (an IRI never starts
        // with '=', whitespace or a digit)
        if (peek(1) == '=') { out += TSym("<="); i += 2 }
        else if (peek(1).isWhitespace || peek(1).isDigit) { out += TSym("<"); i += 1 }
        else {
          val s = i + 1
          while (i < n && q.charAt(i) != '>') i += 1
          if (i >= n) fail("unterminated IRI")
          out += TIri(q.substring(s, i))
          i += 1
        }
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = q.charAt(i)
          if (d == '"') { closed = true; i += 1 }
          else if (d == '\\') {
            if (i + 1 >= n) fail("dangling escape in literal")
            q.charAt(i + 1) match {
              case '"'  => sb += '"'
              case '\\' => sb += '\\'
              case 'n'  => sb += '\n'
              case 't'  => sb += '\t'
              case 'r'  => sb += '\r'
              case e    => fail(s"unsupported escape \\$e in literal")
            }
            i += 2
          } else { sb += d; i += 1 }
        }
        if (!closed) fail("unterminated literal")
        // optional @lang or ^^<dt>
        if (i < n && q.charAt(i) == '@') {
          val s = i + 1
          i += 1
          while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '-')) i += 1
          out += TLit(sb.toString, Some(q.substring(s, i)), None)
        } else if (i + 1 < n && q.charAt(i) == '^' && q.charAt(i + 1) == '^') {
          i += 2
          if (i >= n || q.charAt(i) != '<') fail("^^ must be followed by <datatype-iri>")
          val s = i + 1
          while (i < n && q.charAt(i) != '>') i += 1
          if (i >= n) fail("unterminated datatype IRI")
          out += TLit(sb.toString, None, Some(q.substring(s, i)))
          i += 1
        } else out += TLit(sb.toString, None, None)
      } else if (c.isLetter || c == ':') {
        val s = i
        // digits allowed after the first character (SPARQL PN_PREFIX
        // permits them — `PREFIX p1:` is legal); keywords contain none,
        // so keyword matching is unaffected
        if (i < n && q.charAt(i).isLetter) i += 1
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
        val w = q.substring(s, i)
        if (i < n && q.charAt(i) == ':') {
          // prefixed name: ns:local, :local (default prefix) or the
          // bare ns: of a PREFIX declaration — prefix is case-sensitive
          i += 1
          val ls = i
          while (i < n && (q.charAt(i).isLetterOrDigit ||
            q.charAt(i) == '_' || q.charAt(i) == '-')) i += 1
          out += TPname(w, q.substring(ls, i))
        } else {
          val up = w.toUpperCase
          if (Keywords(up)) out += TSym(up)
          else if (w == "a") out += TSym("a")
          else if (w.isEmpty) fail(s"unexpected character ':' at offset $s")
          else fail(s"unexpected word '$w' — declare a prefix (PREFIX $w: <...>) " +
            "or use a full <iri>")
        }
      } else fail(s"unexpected character '$c' at offset $i")
    }
    out.result()
  }

  // ---------- AST ----------------------------------------------------------

  private[kg] sealed trait FTerm
  private final case class FTVar(name: String) extends FTerm
  /** A constant comparison side: `id` is the hashed node id (the form
    * node-position bindings carry); `raw` keeps the IRI's raw string for
    * comparisons against PREDICATE-position variables, which bind raw
    * predicate IRIs in the edges convention (not hashed ids). */
  private final case class FTConst(id: String, raw: Option[String] = None) extends FTerm

  private[kg] sealed trait FExpr
  private final case class FBound(v: String) extends FExpr
  private final case class FNot(e: FExpr) extends FExpr
  private final case class FAnd(a: FExpr, b: FExpr) extends FExpr
  private final case class FOr(a: FExpr, b: FExpr) extends FExpr
  private final case class FCmp(l: FTerm, op: String, r: FTerm) extends FExpr
  /** Numeric VALUE-SPACE expression: leaves are variables (read through
    * their bindValues `_term` struct, or directly for numeric BIND
    * columns), numeric constants and STRLEN projections; interior nodes
    * are `+ - * /` (IEEE double — deterministic cross-engine). */
  private[kg] sealed trait NExpr
  private final case class NVar(name: String) extends NExpr
  private final case class NNum(v: Double) extends NExpr
  private final case class NStrLen(arg: STerm) extends NExpr
  private final case class NArith(l: NExpr, op: String, r: NExpr) extends NExpr
  /** ABS / CEIL / FLOOR / ROUND — ROUND compiles to floor(x + 0.5),
    * which IS xsd/SPARQL round-half-toward-+INF (a bare engine round()
    * would be HALF_UP / HALF_EVEN depending on the engine). */
  private final case class NFn(func: String, arg: NExpr) extends NExpr
  /** YEAR / MONTH / DAY / HOURS / MINUTES / SECONDS — datetime
    * accessors into the numeric value space. The argument variable
    * reads the TEMPORAL value space: an xsd:dateTime literal through
    * [[TypedLiterals.asTimestamp]], an xsd:date through
    * [[TypedLiterals.asDate]] at midnight (a deliberate widening of the
    * spec's dateTime-only accessor domain — the common engine
    * behavior); any other term reads NULL and the row is excluded
    * (error-means-exclude). UTC sessions on both engines make the
    * field extraction deterministic. */
  private final case class NTimeFn(func: String, v: String) extends NExpr
  /** `xsd:integer(?v)` / `xsd:double(?v)` — XPath constructor casts into
    * the numeric value space (SPARQL 17.5). The argument reads its OWN
    * representation: a numeric BIND value directly, a string BIND value
    * through try_cast, a pattern variable's term through the numeric
    * families first and then the string-family lexical form. Any value
    * outside the cast's lexical space is NULL -> excluded
    * (error-means-exclude, e.g. xsd:double of an IRI). `xsd:integer`
    * truncates toward zero per XPath, via try_cast to long (NaN /
    * overflow excluded rather than thrown under ANSI). */
  private final case class NCast(v: String, toInt: Boolean) extends NExpr
  private final case class FNumCmp(l: NExpr, op: String, r: NExpr) extends FExpr
  /** STRING value-space operand: a variable read through its bindValues
    * `_term` struct (bare = string-family literal lexical form only,
    * `viaStr` = SPARQL STR(), which also stringifies IRIs — both read a
    * string BIND column directly), its LANG() or DATATYPE() projection,
    * a raw string constant, or an LCASE/UCASE/CONCAT combinator. */
  private[kg] sealed trait STerm
  private final case class SVar(name: String, viaStr: Boolean) extends STerm
  private final case class SLang(name: String) extends STerm
  private final case class SDt(name: String) extends STerm
  private final case class SConst(s: String) extends STerm
  private final case class SCase(arg: STerm, upper: Boolean) extends STerm
  private final case class SConcat(args: Seq[STerm]) extends STerm
  /** SUBSTR(arg, start[, len]) — 1-based like SPARQL/SQL; start/len are
    * numeric value-space expressions. */
  private final case class SSubstr(arg: STerm, start: NExpr, len: Option[NExpr]) extends STerm
  /** STRBEFORE / STRAFTER — '' when the needle does not occur, per spec. */
  private final case class SCut(arg: STerm, needle: STerm, before: Boolean) extends STerm
  /** REPLACE(arg, "pattern", "replacement"[, "i"]) — regex, ALL
    * occurrences (mirror with the 'g' flag in engines that default to
    * first-match). */
  private final case class SReplace(arg: STerm, pattern: String, repl: String,
                                    ci: Boolean) extends STerm
  /** MD5 / SHA1 / SHA256 / SHA384 / SHA512 — lowercase hex digest of
    * the UTF-8 bytes of a string-space operand (both engines render
    * lowercase hex, so digests are cross-engine stable). */
  private final case class SHash(algo: String, arg: STerm) extends STerm
  /** ENCODE_FOR_URI — XPath fn:encode-for-uri percent-encoding, via the
    * codegen'd [[EncodeForUri]] native expression. */
  private final case class SEncode(arg: STerm) extends STerm
  /** STRSTARTS / STRENDS / CONTAINS over a string-space operand. */
  private final case class FStrFn(func: String, arg: STerm, needle: STerm) extends FExpr
  /** REGEX(sarg, "pattern"[, "i"]) — partial match, optional
    * case-insensitive flag compiled as an inline `(?i)` (the one flag
    * both regex dialects spell identically). */
  private final case class FRegex(arg: STerm, pattern: String, ci: Boolean) extends FExpr
  /** String value-space (in)equality — `=` / `!=` only (ordering over
    * strings is collation-dependent and deliberately out of fragment). */
  private final case class FStrCmp(l: STerm, eq: Boolean, r: STerm) extends FExpr
  /** ISIRI / ISLITERAL / ISBLANK term-kind test (needs the `_term` struct). */
  private final case class FKindTest(func: String, v: String) extends FExpr
  /** SAMETERM(?a, ?b) — RDF-term identity. Distinct terms have distinct
    * ids (and predicate variables distinct raw IRIs), so this is plain
    * column equality — PROVIDED both variables live in ONE space, which
    * validate() enforces (a pred-var vs node-var compare is silently
    * constant, and BIND values are not RDF terms). */
  private final case class FSameTerm(a: String, b: String) extends FExpr
  /** TEMPORAL value-space comparison side: a variable read through its
    * `_term` struct ([[TypedLiterals.asDate]]/[[TypedLiterals.asTimestamp]])
    * or a typed constant's lexical form. */
  private[kg] sealed trait TTerm
  private final case class TTVar(name: String) extends TTerm
  private final case class TTConst(v: String) extends TTerm
  /** Temporal comparison, selected by an `xsd:date` / `xsd:dateTime`
    * TYPED-LITERAL constant on either side: both sides read that one
    * type's value space (SPARQL makes cross-type temporal comparison an
    * error — a variable holding the other type reads NULL and the row
    * drops, error-means-exclude). All six operators compare BY VALUE,
    * so lexical variants of one instant compare equal. */
  private final case class FTimeCmp(l: TTerm, op: String, r: TTerm,
                                    dateTime: Boolean) extends FExpr
  /** LANGMATCHES(sarg, "range"): RFC 4647 basic filtering — "*" matches
    * any non-empty tag, otherwise a case-insensitive tag or tag-prefix
    * ("en" matches "en" and "en-GB"). */
  private final case class FLangMatches(arg: STerm, range: String) extends FExpr
  /** `?v (NOT)? IN (const, ...)`: a pushed IN-filter. All-number lists
    * read the numeric value space; RDF-term lists compare in the
    * variable's own space (hashed ids for node variables and copies,
    * raw IRIs for predicate/graph variables, raw strings for string
    * BIND values). An unbound/other-space ?v reads NULL, so both IN and
    * NOT IN exclude the row — SPARQL error propagation. */
  private final case class FIn(v: String, items: Seq[FOperand],
                               negated: Boolean) extends FExpr

  /** A BIND(expr AS ?v) right-hand side: a numeric value expression, a
    * string value expression, or a plain id-space copy of another
    * PATTERN variable. */
  private[kg] sealed trait BExpr
  private final case class BNum(e: NExpr) extends BExpr
  private final case class BStr(e: STerm) extends BExpr
  private final case class BCopy(v: String) extends BExpr
  /** COALESCE(?a, ?b, ...) over PATTERN variables — the id-space
    * OPTIONAL-fallback chain (first bound binding wins). */
  private final case class BCoalesce(vars: Seq[String]) extends BExpr
  /** IF(cond, then, else) — the branches must live in ONE value kind
    * (both numeric, both string, or both id-space copies/coalesces); a
    * NULL condition (unbound read) yields the ELSE branch, matching
    * when/otherwise. */
  private final case class BIf(cond: FExpr, thenB: BExpr, elseB: BExpr) extends BExpr
  /** STRDT(lexical, <dt>) / STRLANG(lexical, "tag") — CONSTRUCT a typed
    * or language-tagged literal term from a string-space lexical form.
    * The result is the term's NODE ID, minted at runtime by the same
    * recipe as [[Bgp.litId]] (sha256 of the n3 rendering), so it
    * equal-compares and joins against pattern bindings in the id space
    * ('c' kind). A lexical that reads NULL (non-string input) yields
    * NULL — SPARQL error propagation. `lang = None` is STRDT;
    * `Some(tag)` is STRLANG (dt fixed to rdf:langString, per RDF 1.1). */
  private final case class BMintTerm(lex: STerm, dt: String,
                                     lang: Option[String]) extends BExpr

  /** An aggregate invocation; `arg = None` is `COUNT(*)`. SAMPLE is
    * compiled as `min` (SPARQL leaves the pick arbitrary — a
    * deterministic pick keeps results engine-independent);
    * GROUP_CONCAT concatenates in SORTED value order for the same
    * reason (SPARQL leaves the order undefined). */
  private[kg] final case class AggCall(func: String, distinct: Boolean,
                                       arg: Option[String], sep: String = " ")

  /** One SELECT projection item: a plain variable or `(AGG(...) AS ?alias)`. */
  private[kg] sealed trait Proj
  private[kg] final case class PVar(name: String) extends Proj
  private[kg] final case class PAgg(call: AggCall, alias: String) extends Proj

  private[kg] sealed trait HExpr
  private final case class HCmp(call: AggCall, op: String, n: Double) extends HExpr
  private final case class HNot(e: HExpr) extends HExpr
  private final case class HAnd(a: HExpr, b: HExpr) extends HExpr
  private final case class HOr(a: HExpr, b: HExpr) extends HExpr

  /** Parsed query. `form` is SELECT, ASK, CONSTRUCT or DESCRIBE;
    * `projection` empty means `SELECT *`; `orderBy` pairs are
    * (variable-or-alias, ascending); `values` clauses are (variables,
    * constant-id rows) selections; `template` holds CONSTRUCT's output
    * triples; `describeVars`/`describeIds` hold DESCRIBE's subject
    * terms (group variables / constant node ids). */
  final case class Query(projection: Seq[Proj],
                         distinct: Boolean,
                         required: Seq[TriplePattern],
                         optionals: Seq[Seq[TriplePattern]],
                         minuses: Seq[Seq[TriplePattern]],
                         /** UNION groups: each element is ONE group's
                           * branches. A group alone in the WHERE clause
                           * is the classic pure union; groups alongside
                           * required triples join the group result on
                           * their (every-branch-bound) shared
                           * variables. */
                         unions: Seq[Seq[Seq[TriplePattern]]],
                         private[Sparql] val filterAst: Seq[FExpr],
                         groupBy: Seq[String] = Nil,
                         private[Sparql] val havingAst: Seq[HExpr] = Nil,
                         orderBy: Seq[(String, Boolean)] = Nil,
                         limit: Option[Long] = None,
                         offset: Option[Long] = None,
                         values: Seq[(Seq[String], Seq[Seq[String]])] = Nil,
                         form: String = "SELECT",
                         template: Seq[TriplePattern] = Nil,
                         exists: Seq[Seq[TriplePattern]] = Nil,
                         notExists: Seq[Seq[TriplePattern]] = Nil,
                         describeVars: Seq[String] = Nil,
                         describeIds: Seq[String] = Nil,
                         private[Sparql] val binds: Seq[(String, BExpr)] = Nil,
                         private[Sparql] val subqueries: Seq[Query] = Nil,
                         private[Sparql] val optionalFilters: Seq[Seq[FExpr]] = Nil,
                         /** SPARQL 13.2 dataset clause: `FROM <g>`
                           * merges into the DEFAULT graph (scopes every
                           * non-GRAPH pattern), `FROM NAMED <g>` the
                           * NAMED set (scopes GRAPH patterns). Applied
                           * by pattern rewrite at run time. */
                         fromGraphs: Seq[String] = Nil,
                         fromNamed: Seq[String] = Nil,
                         /** Populated when ORDER BY contains at least
                           * one EXPRESSION key: every key in query
                           * order, Left = a plain variable/alias,
                           * Right = a numeric value expression. The
                           * plain subset still mirrors into [[orderBy]]
                           * for validation/compat. */
                         private[Sparql] val orderKeysAst:
                           Seq[(Either[String, NExpr], Boolean)] = Nil) {
    /** BIND variable -> value kind: 'n'umeric, 's'tring, 'c'opy. */
    private[Sparql] lazy val bindKinds: Map[String, Char] = {
      def kindOf(b: BExpr): Char = b match {
        case BNum(_) => 'n'
        case BStr(_) => 's'
        case BCopy(_) | BCoalesce(_) | BMintTerm(_, _, _) => 'c'
        case BIf(_, t, _) => kindOf(t) // same-kind branches (validated)
      }
      binds.map { case (n, b) => n -> kindOf(b) }.toMap
    }
    /** All computed-value columns and their kinds: BIND variables plus
      * subquery aggregate aliases (COUNT/SUM/AVG are numeric values,
      * GROUP_CONCAT strings, MIN/MAX/SAMPLE id picks -> id-space 'c'). */
    private[Sparql] lazy val valueKinds: Map[String, Char] =
      bindKinds ++ subqueries.flatMap(_.projection.collect {
        case PAgg(AggCall(f, _, _, _), alias) => alias -> (f match {
          case "COUNT" | "SUM" | "AVG" => 'n'
          case "GROUP_CONCAT"          => 's'
          case _                       => 'c'
        })
      })
    /** Result-column names each subquery contributes to the group. */
    private[Sparql] def subqueryOutputs: Seq[String] =
      subqueries.flatMap(sq =>
        sq.select ++ sq.projection.collect { case PAgg(_, a) => a })
    /** Variables bound in PREDICATE position by any pattern of the
      * group: these bind RAW predicate IRIs (the edges convention), not
      * hashed node ids — a different value space from every other
      * binding. Includes subquery-projected variables that are
      * predicate-position in the subquery, plus BIND copies/COALESCEs
      * whose sources all live in this space. */
    private[Sparql] lazy val predSpaceVars: Set[String] = {
      val pats = required ++ optionals.flatten ++ unions.flatten.flatten ++
        minuses.flatten ++ exists.flatten ++ notExists.flatten ++ template
      val own = pats.flatMap(p => (Seq(p.pred) ++ p.graph).collect {
        case V(n) => n
      }).toSet
      val sub = subqueries.flatMap(sq => sq.select.filter(sq.predSpaceVars)).toSet
      binds.foldLeft(own ++ sub) { case (acc, (n, b)) =>
        b match {
          case BCopy(src) if acc(src)         => acc + n
          case BCoalesce(vs) if vs.forall(acc) => acc + n
          case _                               => acc
        }
      }
    }
    /** Variables bound in SUBJECT/OBJECT position (hashed node ids),
      * plus DESCRIBE subjects and subquery-projected node-space
      * variables — the complement space to [[predSpaceVars]]. */
    private[Sparql] lazy val nodeSpaceVars: Set[String] = {
      val pats = required ++ optionals.flatten ++ unions.flatten.flatten ++
        minuses.flatten ++ exists.flatten ++ notExists.flatten ++ template
      pats.flatMap(p => Seq(p.subj, p.obj).collect { case V(n) => n }).toSet ++
        subqueries.flatMap(sq => sq.select.filter(sq.nodeSpaceVars)) ++
        describeVars
    }
    /** Value kinds seen by the expression compiler: BIND/subquery value
      * columns plus predicate-position variables tagged 'p' (raw-IRI
      * reads — STR(?p) is the column itself, never a nodes-table join). */
    private[Sparql] lazy val compileKinds: Map[String, Char] =
      valueKinds ++ predSpaceVars.iterator.map(_ -> 'p')
    /** Compiled FILTER predicates over the binding columns. */
    def filters: Seq[Column] = filterAst.map(compileF(_, compileKinds))
    /** Plain variables of the projection (empty for `SELECT *`). */
    def select: Seq[String] = projection.collect { case PVar(n) => n }
    /** Variables whose FILTERs read the VALUE space (numeric comparison,
      * string function, LANG/DATATYPE, kind test) — each needs one
      * [[Bgp.bindValues]] join before the FILTERs apply (BIND-produced
      * variables are plain value columns and are excluded by the
      * caller). */
    private[Sparql] def filterTermVars: Seq[String] =
      filterAst.flatMap(fTermVars).distinct
    /** Variables BIND expressions read in the VALUE space — joined like
      * [[filterTermVars]]; spent once the bind columns are computed. */
    private[Sparql] def bindTermVars: Seq[String] =
      binds.flatMap(b => bTermVars(b._2)).distinct
    /** Variables aggregated in the NUMERIC value space (SUM/AVG args,
      * projected OR in HAVING) — these need [[Bgp.bindValues]] joins
      * that must SURVIVE until the aggregation step. */
    private[Sparql] def numericAggVars: Seq[String] =
      (projection.collect { case PAgg(call, _) => call } ++
        havingAst.flatMap(havingCalls)).collect {
        case AggCall("SUM" | "AVG", _, Some(v), _) => v
      }.distinct
    /** Node-space variables picked by MIN/MAX: with the nodes overload
      * these need their `_term` struct alive at aggregation time so the
      * pick can follow SPARQL value ordering ([[termOrderKey]]). */
    private[Sparql] def minmaxAggVars: Seq[String] =
      projection.collect {
        case PAgg(AggCall("MIN" | "MAX", _, Some(v), _), _)
          if nodeSpaceVars(v) => v
      }.distinct
    private[Sparql] def isAggregate: Boolean =
      groupBy.nonEmpty || havingAst.nonEmpty ||
        projection.exists(_.isInstanceOf[PAgg])
  }

  /** Variables a FILTER expression reads through the nodes-table term
    * join (numeric/string/temporal value spaces, kind tests, numeric IN
    * lists) — BIND values and predicate-space variables are excluded by
    * the caller via the kinds map. */
  private def fTermVars(e: FExpr): Seq[String] = e match {
    case FNumCmp(l, _, r) => nvars(l) ++ nvars(r)
    case FTimeCmp(l, _, r, _) => Seq(l, r).collect { case TTVar(n) => n }
    case FStrFn(_, a, b)  => svars(a) ++ svars(b)
    case FRegex(a, _, _)  => svars(a)
    case FStrCmp(l, _, r) => svars(l) ++ svars(r)
    case FKindTest(_, v)  => Seq(v)
    case FLangMatches(a, _) => svars(a)
    case FIn(v, items, _) if items.forall(_.isInstanceOf[FONum]) => Seq(v)
    case FNot(x)    => fTermVars(x)
    case FAnd(a, b) => fTermVars(a) ++ fTermVars(b)
    case FOr(a, b)  => fTermVars(a) ++ fTermVars(b)
    case _          => Nil
  }

  /** Term-join variables a BIND body reads (IF conditions read like
    * FILTERs; branches recurse). */
  private def bTermVars(b: BExpr): Seq[String] = b match {
    case BNum(e)           => nvars(e)
    case BStr(t)           => svars(t)
    case BCopy(_)          => Nil
    case BCoalesce(_)      => Nil // id reads, no term join
    case BIf(cond, t, e2)  => fTermVars(cond) ++ bTermVars(t) ++ bTermVars(e2)
    case BMintTerm(lex, _, _) => svars(lex)
  }

  /** A comparison side; `predSide` = the OTHER side is a predicate-
    * position variable, so an IRI constant must compile to its RAW
    * string (the form the pred column carries), not the hashed id. */
  private def compileT(t: FTerm, predSide: Boolean): Column = t match {
    case FTVar(n)         => col(n)
    case FTConst(id, raw) => lit(if (predSide) raw.getOrElse(id) else id)
  }

  /** Variables a numeric expression reads (through either space). */
  private def nvars(e: NExpr): Seq[String] = e match {
    case NVar(n)         => Seq(n)
    case NNum(_)         => Nil
    case NStrLen(a)      => svars(a)
    case NArith(l, _, r) => nvars(l) ++ nvars(r)
    case NFn(_, a)       => nvars(a)
    case NTimeFn(_, v)   => Seq(v)
    case NCast(v, _)     => Seq(v)
  }

  /** Variables a string expression reads (including the numeric reads
    * of SUBSTR's position arguments — they need term joins too). */
  private def svars(t: STerm): Seq[String] = t match {
    case SVar(n, _)   => Seq(n)
    case SLang(n)     => Seq(n)
    case SDt(n)       => Seq(n)
    case SConst(_)    => Nil
    case SCase(a, _)  => svars(a)
    case SConcat(as)  => as.flatMap(svars)
    case SSubstr(a, s, l) => svars(a) ++ nvars(s) ++ l.toSeq.flatMap(nvars)
    case SCut(a, b, _)    => svars(a) ++ svars(b)
    case SReplace(a, _, _, _) => svars(a)
    case SHash(_, a)      => svars(a)
    case SEncode(a)       => svars(a)
  }

  /** A numeric expression's value with SPARQL's promotion: the integer
    * family and double/float/decimal both read as double (exact for
    * |v| < 2^53); everything else is NULL (excluded). A numeric BIND
    * variable (`k(n) == 'n'`) is already a plain double column and is
    * read directly. Arithmetic is IEEE double — bit-deterministic
    * cross-engine — EXCEPT division by zero, which is NULL -> excluded
    * (see the `/` case below), deliberately not xsd:double's INF. */
  private def numValue(t: NExpr, k: Map[String, Char]): Column = t match {
    case NVar(v) if k.get(v).contains('n') => col(v)
    case NVar(v) =>
      val term = col(s"${v}_term")
      coalesce(TypedLiterals.asLong(term).cast("double"),
        TypedLiterals.asDouble(term))
    case NNum(d)    => lit(d)
    case NStrLen(a) => length(strValue(a, k)).cast("double")
    case NArith(l, op, r) =>
      val (a, b) = (numValue(l, k), numValue(r, k))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        // division by zero is NULL -> the row is EXCLUDED (SPARQL
        // error-means-exclude), deliberately diverging from IEEE's INF:
        // NULL is deterministic cross-engine (mirror: a / nullif(b, 0))
        // where signed-infinity rendering is not, and ANSI Spark would
        // otherwise throw mid-job
        case "/" => try_divide(a, b)
      }
    case NFn(func, a) =>
      val x = numValue(a, k)
      func match {
        case "ABS"   => abs(x)
        // floor/ceil return LONG in Spark — cast back so the whole
        // numeric space stays double (exact for |v| < 2^53)
        case "CEIL"  => ceil(x).cast("double")
        case "FLOOR" => floor(x).cast("double")
        case "ROUND" => floor(x + 0.5).cast("double")
      }
    case NCast(v, toInt) =>
      val base = k.get(v) match {
        case Some('n') => col(v)
        case Some('s') => col(v).try_cast("double")
        case _ =>
          val term = col(s"${v}_term")
          coalesce(TypedLiterals.asLong(term).cast("double"),
            TypedLiterals.asDouble(term),
            when(term("kind") === RdfTerm.LITERAL &&
              term("dt").isin(RdfTerm.XsdString, RdfTerm.RdfLangString),
              term("value").try_cast("double")))
      }
      // XPath truncation toward zero; try_cast keeps NaN/overflow as
      // NULL -> excluded instead of an ANSI throw
      if (toInt) base.try_cast("long").cast("double") else base
    case NTimeFn(func, v) =>
      val term = col(s"${v}_term")
      val ts = coalesce(TypedLiterals.asTimestamp(term),
        TypedLiterals.asDate(term).cast("timestamp"))
      (func match {
        case "YEAR"    => year(ts)
        case "MONTH"   => month(ts)
        case "DAY"     => dayofmonth(ts)
        case "HOURS"   => hour(ts)
        case "MINUTES" => minute(ts)
        case "SECONDS" => second(ts)
      }).cast("double")
  }

  /** A string-space operand's value. Every non-constant case reads the
    * variable's `_term` struct and yields NULL outside its SPARQL
    * domain, so the enclosing predicate excludes the row
    * (error-means-exclude):
    *  - STR(?v): lexical form of a literal OR the IRI string (STR of a
    *    blank node is an error per SPARQL);
    *  - bare ?v: string-family literals ONLY (simple / xsd:string /
    *    rdf:langString) — applying a string function to an IRI or a
    *    number without STR() is a SPARQL type error;
    *  - LANG(?v): the tag, '' for untagged literals, error for
    *    non-literals;
    *  - DATATYPE(?v): the datatype IRI (always materialized by the
    *    parser — rdf:langString for tagged literals).
    * A string BIND variable (`k(v) == 's'`) is already a plain string
    * column — bare and STR() reads take it directly; NULL-propagation
    * through CONCAT/LCASE/UCASE keeps error-means-exclude intact. */
  private def strValue(t: STerm, k: Map[String, Char]): Column = t match {
    case SVar(v, _) if k.get(v).contains('s') => col(v)
    // a predicate-position variable IS the raw IRI string — STR(?p)
    // reads the column directly, no nodes-table join (a join on the
    // hashed-id key would silently never match); bare reads are
    // rejected at validate (string functions over an IRI are a SPARQL
    // type error)
    case SVar(v, true) if k.get(v).contains('p') => col(v)
    case SVar(v, true) =>
      val term = col(s"${v}_term")
      when(term("kind") === RdfTerm.IRI || term("kind") === RdfTerm.LITERAL,
        term("value"))
    case SVar(v, false) =>
      val term = col(s"${v}_term")
      when(term("kind") === RdfTerm.LITERAL &&
        term("dt").isin(RdfTerm.XsdString, RdfTerm.RdfLangString), term("value"))
    case SLang(v) =>
      val term = col(s"${v}_term")
      when(term("kind") === RdfTerm.LITERAL, coalesce(term("lang"), lit("")))
    case SDt(v) =>
      val term = col(s"${v}_term")
      when(term("kind") === RdfTerm.LITERAL, term("dt"))
    case SConst(s)        => lit(s)
    case SCase(a, true)   => upper(strValue(a, k))
    case SCase(a, false)  => lower(strValue(a, k))
    case SConcat(as)      => concat(as.map(strValue(_, k)): _*)
    case SSubstr(a, s, l) =>
      strValue(a, k).substr(numValue(s, k).cast("int"),
        l.map(numValue(_, k).cast("int")).getOrElse(lit(Int.MaxValue)))
    case SCut(a, b, before) =>
      val (h, n) = (strValue(a, k), strValue(b, k))
      val pos = instr(h, n)
      // instr(h, "") = 1, so the spec's empty-needle cases fall out:
      // STRBEFORE(x, "") = "" (substr len 0), STRAFTER(x, "") = x
      if (before) when(pos > 0, h.substr(lit(1), pos - 1)).otherwise(
        when(h.isNotNull && n.isNotNull, lit("")))
      else when(pos > 0, h.substr(pos + length(n), lit(Int.MaxValue))).otherwise(
        when(h.isNotNull && n.isNotNull, lit("")))
    case SReplace(a, pattern, repl, ci) =>
      regexp_replace(strValue(a, k),
        lit(if (ci) "(?i)" + pattern else pattern), lit(repl))
    case SHash(algo, a) =>
      val x = strValue(a, k)
      algo match {
        case "MD5"    => md5(x.cast("binary"))
        case "SHA1"   => sha1(x.cast("binary"))
        case "SHA256" => sha2(x.cast("binary"), 256)
        case "SHA384" => sha2(x.cast("binary"), 384)
        case "SHA512" => sha2(x.cast("binary"), 512)
      }
    case SEncode(a) => EncodeForUri(strValue(a, k))
  }

  private def compileF(e: FExpr, k: Map[String, Char]): Column = e match {
    case FBound(v)         => col(v).isNotNull
    case FNot(x)           => !compileF(x, k)
    case FAnd(a, b)        => compileF(a, k) && compileF(b, k)
    case FOr(a, b)         => compileF(a, k) || compileF(b, k)
    case FCmp(l, op, r)    =>
      def isPred(t: FTerm): Boolean = t match {
        case FTVar(n) => k.get(n).contains('p')
        case _        => false
      }
      val (lc, rc) = (compileT(l, isPred(r)), compileT(r, isPred(l)))
      if (op == "=") lc === rc else lc =!= rc
    case FNumCmp(l, op, r) =>
      val (a, b) = (numValue(l, k), numValue(r, k))
      op match {
        case "="  => a === b
        case "!=" => a =!= b
        case "<"  => a < b
        case "<=" => a <= b
        case ">"  => a > b
        case ">=" => a >= b
      }
    case FStrFn(func, a, n) =>
      val (h, needle) = (strValue(a, k), strValue(n, k))
      func match {
        case "STRSTARTS" => h.startsWith(needle)
        case "STRENDS"   => h.endsWith(needle)
        case "CONTAINS"  => h.contains(needle)
      }
    case FRegex(a, pattern, ci) =>
      strValue(a, k).rlike(if (ci) "(?i)" + pattern else pattern)
    case FStrCmp(l, eq, r) =>
      if (eq) strValue(l, k) === strValue(r, k)
      else strValue(l, k) =!= strValue(r, k)
    case FTimeCmp(l, op, r, isDt) =>
      def side(t: TTerm): Column = t match {
        case TTVar(n) =>
          val term = col(s"${n}_term")
          if (isDt) TypedLiterals.asTimestamp(term) else TypedLiterals.asDate(term)
        case TTConst(v) =>
          if (isDt) lit(v).try_cast("timestamp") else lit(v).try_cast("date")
      }
      val (a, b) = (side(l), side(r))
      op match {
        case "="  => a === b
        case "!=" => a =!= b
        case "<"  => a < b
        case "<=" => a <= b
        case ">"  => a > b
        case ">=" => a >= b
      }
    case FLangMatches(a, range) =>
      val tag = strValue(a, k)
      if (range == "*") tag.isNotNull && tag =!= ""
      else {
        val lt = lower(tag)
        // Locale.ROOT: the tag side uses Spark's locale-independent
        // lower(); a default-locale toLowerCase would fold 'I' wrongly
        // under e.g. a Turkish JVM locale (ADVICE r6)
        val r = range.toLowerCase(java.util.Locale.ROOT)
        lt === r || lt.startsWith(r + "-")
      }
    case FIn(v, items, neg) =>
      val base =
        if (items.forall(_.isInstanceOf[FONum]))
          numValue(NVar(v), k).isin(items.collect { case FONum(d) => d }: _*)
        else if (k.get(v).contains('s'))
          col(v).isin(items.map {
            case FOLit(s2, None, None) => s2
            case other => fail(s"a string BIND IN-list takes plain string " +
              s"literals, found $other")
          }: _*)
        else if (k.get(v).contains('p'))
          col(v).isin(items.collect { case FOIri(iri) => iri }: _*)
        else
          col(v).isin(items.map {
            case FOIri(iri)          => Bgp.iriId(iri)
            case FOLit(lv, lang, dt) =>
              Bgp.litId(lv, dt.getOrElse(RdfTerm.XsdString), lang)
            case other => fail(s"unexpected IN item $other")
          }: _*)
      if (neg) !base else base
    case FSameTerm(a, b) => col(a) === col(b)
    case FKindTest(func, v) =>
      val kind = col(s"${v}_term")("kind")
      func match {
        case "ISIRI"     => kind === RdfTerm.IRI
        case "ISLITERAL" => kind === RdfTerm.LITERAL
        case "ISBLANK"   => kind === RdfTerm.BNODE
      }
  }

  /** A BIND right-hand side's value column. */
  private def compileB(b: BExpr, k: Map[String, Char]): Column = b match {
    case BNum(e)        => numValue(e, k)
    case BStr(t)        => strValue(t, k)
    case BCopy(v)       => col(v)
    case BCoalesce(vs)  => coalesce(vs.map(col): _*)
    case BIf(cond, t, e) =>
      when(compileF(cond, k), compileB(t, k)).otherwise(compileB(e, k))
    case BMintTerm(lex, dt, lang) =>
      // runtime twin of Bgp.litId: sha256 of `"value"[@lang]^^<dt>`
      val suffix = lang.map("@" + _).getOrElse("") + "^^<" + dt + ">"
      sha2(concat(lit("\""), strValue(lex, k), lit("\"" + suffix))
        .cast("binary"), 256)
  }

  // ---------- parser -------------------------------------------------------

  private final class Cursor(toks: Vector[Tok]) {
    private var i = 0
    def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    def peek2: Option[Tok] = if (i + 1 < toks.length) Some(toks(i + 1)) else None
    def next(): Tok = { val t = peekOrFail; i += 1; t }
    def peekOrFail: Tok = peek.getOrElse(fail("unexpected end of query"))
    def takeSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case t         => fail(s"expected '$s', found $t")
    }
    def atSym(s: String): Boolean = peek.contains(TSym(s))
    def done: Boolean = i >= toks.length
  }

  /** Node-level term (subject/object position). A blank node compiles
    * to a NON-DISTINGUISHED variable (prefix `_bn_`, reserved): it
    * joins across the patterns that share its label but is excluded
    * from `SELECT *` and rejected in FILTER/BIND/projection (SPARQL
    * bnodes are not referenceable outside the pattern). */
  private def nodeTerm(c: Cursor): Bgp.TermPat = c.next() match {
    case TVar(n)           => V(n)
    case TBnode(l)         => V("_bn_" + l)
    case TIri(iri)         => C(Bgp.iriId(iri))
    case TLit(v, lang, dt) => C(Bgp.litId(v, dt.getOrElse(RdfTerm.XsdString), lang))
    case t                 => fail(s"expected a variable, IRI or literal, found $t")
  }

  /** Full SPARQL 1.1 property-path grammar (recursive):
    *   path    := pathSeq ('|' pathSeq)*          -- alternatives
    *   pathSeq := pathInv ('/' pathInv)*          -- sequence
    *   pathInv := '^'? pathElt                    -- inverse
    *   pathElt := pathPrim ('+'|'*'|'?')?         -- at most ONE mod
    *   pathPrim:= 'a' | <iri> | '!' negset | '(' path ')'
    *   negset  := '^'? <iri> | '(' '^'? <iri> ('|' '^'? <iri>)* ')'
    * Operator CHAINING without parens (`<p>*+`) stays rejected per the
    * W3C grammar — parenthesize to nest: `(<p>*)+`. The parsed AST is
    * then LOWERED: every shape the specialized TermPats carry (a plain
    * predicate, an IN-filter alternative, a step sequence, one closure
    * over one simple group, an all-forward negated set) compiles to its
    * optimized twin, so existing plans are byte-identical; only
    * genuinely nested shapes ride [[Bgp.NestedPath]]'s recursive
    * composition. */
  private def pathExpr(c: Cursor): Bgp.PathAst = {
    val parts = Seq.newBuilder[Bgp.PathAst]
    parts += pathSeqExpr(c)
    while (c.atSym("|")) { c.takeSym("|"); parts += pathSeqExpr(c) }
    val ps = parts.result()
    if (ps.sizeIs == 1) ps.head else Bgp.PAlternative(ps)
  }

  private def pathSeqExpr(c: Cursor): Bgp.PathAst = {
    val parts = Seq.newBuilder[Bgp.PathAst]
    parts += pathInvExpr(c)
    while (c.atSym("/")) { c.takeSym("/"); parts += pathInvExpr(c) }
    val ps = parts.result()
    if (ps.sizeIs == 1) ps.head else Bgp.PSequence(ps)
  }

  private def pathInvExpr(c: Cursor): Bgp.PathAst =
    if (c.atSym("^")) { c.takeSym("^"); Bgp.PInverse(pathEltExpr(c)) }
    else pathEltExpr(c)

  private def pathEltExpr(c: Cursor): Bgp.PathAst = {
    val prim = pathPrimExpr(c)
    val withOp =
      if (c.atSym("+")) { c.takeSym("+"); Bgp.PClosure(prim, '+') }
      else if (c.atSym("*")) { c.takeSym("*"); Bgp.PClosure(prim, '*') }
      else if (c.atSym("?")) { c.takeSym("?"); Bgp.PClosure(prim, '?') }
      else prim
    if (c.atSym("+") || c.atSym("*") || c.atSym("?"))
      fail("path closure operators cannot combine unparenthesized " +
        "(e.g. <p>*+) — parenthesize to nest: (<p>*)+")
    withOp
  }

  private def pathPrimExpr(c: Cursor): Bgp.PathAst = c.peekOrFail match {
    case TSym("a") => c.next(); Bgp.PLeaf(RdfType)
    case TIri(iri) => c.next(); Bgp.PLeaf(iri)
    case TSym("(") =>
      c.takeSym("(")
      val p = pathExpr(c)
      c.takeSym(")")
      p
    case TSym("!") =>
      // negated property set: !<p>, !^<p> or !(^?<p1>|^?<p2>|...) —
      // forward and inverse members split per SPARQL 1.1 9.1 into a
      // forward NOT-IN arm and an id-swapped NOT-IN arm
      c.takeSym("!")
      val fwd = Seq.newBuilder[String]
      val inv = Seq.newBuilder[String]
      def member(): Unit = {
        val isInv = c.atSym("^")
        if (isInv) c.takeSym("^")
        c.next() match {
          case TIri(iri)  => if (isInv) inv += iri else fwd += iri
          case TSym("a")  => if (isInv) inv += RdfType else fwd += RdfType
          case t => fail(s"negated property set members must be <iri>s or " +
            s"'a' (optionally ^-inverted), found $t")
        }
      }
      if (c.atSym("(")) {
        c.takeSym("(")
        member()
        while (c.atSym("|")) { c.takeSym("|"); member() }
        c.takeSym(")")
      } else member()
      Bgp.PNegated(fwd.result(), inv.result())
    case t => fail(s"expected a path (<iri>, ^path, path/path, path|path, " +
      s"path+/*/?, !negset, '(' path ')' or 'a'), found $t")
  }

  /** A PathAst part that is one sequence STEP: a leaf or its inverse. */
  private def asStep(p: Bgp.PathAst): Option[PathStep] = p match {
    case Bgp.PLeaf(pr)                 => Some(PathStep(pr))
    case Bgp.PInverse(Bgp.PLeaf(pr))   => Some(PathStep(pr, inverse = true))
    case _                             => None
  }

  /** Lower a parsed path to the most specialized TermPat that carries
    * it (see [[pathExpr]]); genuinely nested shapes stay general. */
  private def lowerPath(p: Bgp.PathAst): Bgp.TermPat = p match {
    case Bgp.PLeaf(pr)               => C(pr)
    case Bgp.PInverse(Bgp.PLeaf(pr)) => InvPath(pr)
    case Bgp.PAlternative(ps) if ps.forall(_.isInstanceOf[Bgp.PLeaf]) =>
      AltPath(ps.collect { case Bgp.PLeaf(pr) => pr })
    case Bgp.PSequence(ps) if ps.forall(asStep(_).isDefined) =>
      SeqPath(ps.flatMap(asStep))
    case Bgp.PClosure(Bgp.PLeaf(pr), '+') => PlusPath(pr)
    case Bgp.PClosure(Bgp.PLeaf(pr), '*') => StarPath(pr)
    case Bgp.PClosure(Bgp.PLeaf(pr), '?') => OptPath(pr)
    case Bgp.PClosure(inner, op) =>
      lowerPath(inner) match {
        case t @ (C(_) | AltPath(_) | InvPath(_) | SeqPath(_)) =>
          Bgp.GroupPath(t, op)
        case _ => Bgp.NestedPath(p)
      }
    case Bgp.PNegated(fwd, Seq()) if fwd.nonEmpty => NegSet(fwd)
    case other => Bgp.NestedPath(other)
  }

  /** Predicate-position term: a ?variable, or a property path lowered
    * to its most specialized TermPat (see [[pathExpr]]/[[lowerPath]]). */
  private def predTerm(c: Cursor): Bgp.TermPat = c.peekOrFail match {
    case TVar(n) => c.next(); V(n)
    case _       => lowerPath(pathExpr(c))
  }

  private def triple(c: Cursor): TriplePattern = {
    val t = TriplePattern(nodeTerm(c), predTerm(c), nodeTerm(c))
    if (c.atSym(".")) c.takeSym(".")
    t
  }

  /** Triples until the closing brace (consumed). */
  private def triplesBlock(c: Cursor): Seq[TriplePattern] = {
    val out = Seq.newBuilder[TriplePattern]
    while (!c.atSym("}")) out += triple(c)
    c.takeSym("}")
    val r = out.result()
    if (r.isEmpty) fail("empty triples block")
    r
  }

  /** A comparison operand: variable, IRI/literal constant (kept raw —
    * the SPACE the comparison lives in decides between the hashed node
    * id and the raw string), numeric constant, or a string-space
    * function projection. The operator and operand kinds decide the
    * space — see [[filterExpr]]. */
  private sealed trait FOperand
  private final case class FOVar(n: String) extends FOperand
  private final case class FOIri(iri: String) extends FOperand
  private final case class FOLit(v: String, lang: Option[String], dt: Option[String]) extends FOperand
  private final case class FONum(d: Double) extends FOperand
  private final case class FOStrFn(t: STerm) extends FOperand

  /** `STR(?v)` / `LANG(?v)` / `DATATYPE(?v)` / `CONCAT(sarg, ...)` /
    * `LCASE(sarg)` / `UCASE(sarg)` — the string-space expressions usable
    * as comparison sides, string-function args and BIND bodies. */
  private def strFnOperand(c: Cursor): Option[STerm] = c.peekOrFail match {
    case TSym(s @ ("STR" | "LANG" | "DATATYPE")) =>
      c.next(); c.takeSym("(")
      val v = varName(c)
      c.takeSym(")")
      Some(s match {
        case "STR"      => SVar(v, viaStr = true)
        case "LANG"     => SLang(v)
        case "DATATYPE" => SDt(v)
      })
    case TSym(s @ ("LCASE" | "UCASE")) =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(")")
      Some(SCase(a, upper = s == "UCASE"))
    case TSym(s @ ("MD5" | "SHA1" | "SHA256" | "SHA384" | "SHA512")) =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(")")
      Some(SHash(s, a))
    case TSym("ENCODE_FOR_URI") =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(")")
      Some(SEncode(a))
    // xsd:string(?v) — the constructor cast into the string space, the
    // same read as STR(?v) (lexical form of a literal / the IRI string)
    case TIri(RdfTerm.XsdString) if c.peek2.contains(TSym("(")) =>
      c.next(); c.takeSym("(")
      val v = varName(c)
      c.takeSym(")")
      Some(SVar(v, viaStr = true))
    case TSym("CONCAT") =>
      c.next(); c.takeSym("(")
      val args = Seq.newBuilder[STerm]
      args += strArg(c)
      while (c.atSym(",")) { c.takeSym(","); args += strArg(c) }
      c.takeSym(")")
      val as = args.result()
      if (as.sizeIs < 2) fail("CONCAT takes at least two arguments")
      Some(SConcat(as))
    case TSym("SUBSTR") =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(",")
      val start = nexpr(c)
      val len = if (c.atSym(",")) { c.takeSym(","); Some(nexpr(c)) } else None
      c.takeSym(")")
      Some(SSubstr(a, start, len))
    case TSym(s @ ("STRBEFORE" | "STRAFTER")) =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(",")
      val b = strArg(c)
      c.takeSym(")")
      Some(SCut(a, b, before = s == "STRBEFORE"))
    case TSym("REPLACE") =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(",")
      val pat = c.next() match {
        case TLit(v, None, None) => v
        case t => fail(s"REPLACE takes a plain string literal pattern, found $t")
      }
      c.takeSym(",")
      val repl = c.next() match {
        case TLit(v, None, None) => v
        case t => fail(s"REPLACE takes a plain string literal replacement, found $t")
      }
      val ci = if (c.atSym(",")) {
        c.takeSym(",")
        c.next() match {
          case TLit("i", None, None) => true
          case TLit(f, _, _) => fail(s"unsupported REPLACE flags '$f' — only " +
            "\"i\" (case-insensitive) is in this fragment")
          case t => fail(s"REPLACE flags must be a plain string literal, found $t")
        }
      } else false
      c.takeSym(")")
      Some(SReplace(a, pat, repl, ci))
    case _ => None
  }

  /** A string-space argument: a string expression, a bare variable
    * (string-family literal read — or a string BIND column) or a plain
    * string constant. */
  private def strArg(c: Cursor): STerm = strFnOperand(c).getOrElse(c.next() match {
    case TVar(n)             => SVar(n, viaStr = false)
    case TLit(v, None, None) => SConst(v)
    case TLit(_, _, _)       => fail("string functions take PLAIN string " +
      "literals (no @lang / ^^dt) in this fragment")
    case t => fail(s"expected ?var, STR/LANG/DATATYPE/CONCAT/LCASE/UCASE(...) " +
      s"or a plain string literal, found $t")
  })

  /** Numeric value-space expression parsing — the usual two precedence
    * levels (`* /` over `+ -`), parentheses, unary minus and STRLEN. */
  private def natom(c: Cursor): NExpr = c.peekOrFail match {
    case TSym("(") => c.takeSym("("); val e = nexpr(c); c.takeSym(")"); e
    case TSym("-") => c.takeSym("-"); NArith(NNum(0), "-", natom(c))
    case TSym("STRLEN") =>
      c.next(); c.takeSym("(")
      val a = strArg(c)
      c.takeSym(")")
      NStrLen(a)
    case TSym(f @ ("ABS" | "CEIL" | "FLOOR" | "ROUND")) =>
      c.next(); c.takeSym("(")
      val a = nexpr(c)
      c.takeSym(")")
      NFn(f, a)
    case TSym(f @ ("YEAR" | "MONTH" | "DAY" | "HOURS" | "MINUTES" |
                   "SECONDS")) =>
      c.next(); c.takeSym("(")
      val v = varName(c)
      c.takeSym(")")
      NTimeFn(f, v)
    case TIri(iri) if NumCastIris.contains(iri) =>
      c.next(); c.takeSym("(")
      val v = varName(c)
      c.takeSym(")")
      NCast(v, toInt = iri == XsdIntegerIri)
    case TNum(v) => c.next(); NNum(v.toDouble)
    case TDbl(v) => c.next(); NNum(v)
    case TVar(n) => c.next(); NVar(n)
    case t => fail(s"expected a number, ?var, STRLEN(...), '(' or unary '-' " +
      s"in a numeric expression, found $t")
  }

  private def isArithSym(c: Cursor): Boolean =
    c.atSym("+") || c.atSym("-") || c.atSym("*") || c.atSym("/")

  /** Continues a `* /` chain from an already-parsed atom. */
  private def nmulFrom(c: Cursor, first: NExpr): NExpr = {
    var l = first
    while (c.atSym("*") || c.atSym("/")) {
      val op = c.next() match { case TSym(s) => s; case t => fail(s"unexpected $t") }
      l = NArith(l, op, natom(c))
    }
    l
  }

  /** Continues a full additive expression from an already-parsed atom. */
  private def nexprFrom(c: Cursor, first: NExpr): NExpr = {
    var l = nmulFrom(c, first)
    while (c.atSym("+") || c.atSym("-")) {
      val op = c.next() match { case TSym(s) => s; case t => fail(s"unexpected $t") }
      l = NArith(l, op, nmulFrom(c, natom(c)))
    }
    l
  }

  private def nexpr(c: Cursor): NExpr = nexprFrom(c, natom(c))

  private def filterOperand(c: Cursor): FOperand =
    strFnOperand(c).map(FOStrFn).getOrElse(c.next() match {
      case TVar(n)           => FOVar(n)
      case TIri(iri)         => FOIri(iri)
      case TLit(v, lang, dt) => FOLit(v, lang, dt)
      case TNum(v)           => FONum(v.toDouble)
      case TDbl(v)           => FONum(v)
      case t => fail(s"expected a variable, IRI, literal or number in FILTER, found $t")
    })

  // precedence: || < && < ! < atom
  private def filterExpr(c: Cursor): FExpr = {
    def cmpOp(): String = c.next() match {
      case TSym(s) if Set("=", "!=", "<", "<=", ">", ">=")(s) => s
      case t => fail(s"expected a comparison (= != < <= > >=) in FILTER, found $t")
    }
    // a typed temporal literal selects the TEMPORAL value space:
    // Some(false) = xsd:date, Some(true) = xsd:dateTime
    def temporalDt(o: FOperand): Option[Boolean] = o match {
      case FOLit(_, None, Some(TypedLiterals.dateType))     => Some(false)
      case FOLit(_, None, Some(TypedLiterals.dateTimeType)) => Some(true)
      case _                                                => None
    }
    // an operand pulled into arithmetic must be a numeric leaf
    def toN(o: FOperand): NExpr = o match {
      case FOVar(n) => NVar(n)
      case FONum(d) => NNum(d)
      case _ => fail("arithmetic takes ?vars and numbers — use STRLEN(...) " +
        "for string lengths; STR/LANG/DATATYPE values are strings")
    }
    def atom(): FExpr = c.peekOrFail match {
      case TSym("(") => c.takeSym("("); val e = orExpr(); c.takeSym(")"); e
      case TSym("!") => c.takeSym("!"); FNot(atom())
      case TSym("BOUND") =>
        c.takeSym("BOUND"); c.takeSym("(")
        val v = c.next() match {
          case TVar(n) => n
          case t       => fail(s"BOUND takes a variable, found $t")
        }
        c.takeSym(")")
        FBound(v)
      case TSym("SAMETERM") =>
        c.takeSym("SAMETERM"); c.takeSym("(")
        val a = varName(c)
        c.takeSym(",")
        val b = varName(c)
        c.takeSym(")")
        FSameTerm(a, b)
      case TSym(f @ ("STRSTARTS" | "STRENDS" | "CONTAINS")) =>
        c.next(); c.takeSym("(")
        val a = strArg(c)
        c.takeSym(",")
        val n = strArg(c)
        c.takeSym(")")
        FStrFn(f, a, n)
      case TSym("REGEX") =>
        c.next(); c.takeSym("(")
        val a = strArg(c)
        c.takeSym(",")
        val pat = c.next() match {
          case TLit(v, None, None) => v
          case t => fail(s"REGEX takes a plain string literal pattern, found $t")
        }
        val ci = if (c.atSym(",")) {
          c.takeSym(",")
          c.next() match {
            case TLit("i", None, None) => true
            case TLit(f, _, _) => fail(s"unsupported REGEX flags '$f' — only " +
              "\"i\" (case-insensitive) is in this fragment")
            case t => fail(s"REGEX flags must be a plain string literal, found $t")
          }
        } else false
        c.takeSym(")")
        FRegex(a, pat, ci)
      case TSym(f @ ("ISIRI" | "ISLITERAL" | "ISBLANK")) =>
        c.next(); c.takeSym("(")
        val v = varName(c)
        c.takeSym(")")
        FKindTest(f, v)
      case TSym("LANGMATCHES") =>
        c.next(); c.takeSym("(")
        val a = strArg(c)
        c.takeSym(",")
        val r = c.next() match {
          case TLit(v, None, None) => v
          case t => fail(s"LANGMATCHES takes a plain string literal range, found $t")
        }
        c.takeSym(")")
        FLangMatches(a, r)
      // an unambiguous numeric-expression opener: the whole comparison
      // lives in the numeric value space
      case TSym("STRLEN") | TSym("-") | TSym("ABS") | TSym("CEIL") |
           TSym("FLOOR") | TSym("ROUND") | TSym("YEAR") | TSym("MONTH") |
           TSym("DAY") | TSym("HOURS") | TSym("MINUTES") | TSym("SECONDS") =>
        val l = nexpr(c)
        FNumCmp(l, cmpOp(), nexpr(c))
      case TIri(iri) if NumCastIris.contains(iri) &&
          c.peek2.contains(TSym("(")) =>
        val l = nexpr(c)
        FNumCmp(l, cmpOp(), nexpr(c))
      case _ =>
        val l = filterOperand(c)
        if (c.atSym("IN") || (c.atSym("NOT") && c.peek2.contains(TSym("IN")))) {
          val neg = c.atSym("NOT")
          if (neg) c.takeSym("NOT")
          c.takeSym("IN")
          val v = l match {
            case FOVar(n) => n
            case other    => fail(s"IN takes a ?variable on the left, found $other")
          }
          c.takeSym("(")
          val items = Seq.newBuilder[FOperand]
          def item(): Unit = filterOperand(c) match {
            case FOVar(_) | FOStrFn(_) =>
              fail("IN lists take constants (IRIs, literals, numbers)")
            case o => items += o
          }
          item()
          while (c.atSym(",")) { c.takeSym(","); item() }
          c.takeSym(")")
          val its = items.result()
          val numCount = its.count(_.isInstanceOf[FONum])
          if (numCount != 0 && numCount != its.size)
            fail("an IN list mixes numbers with RDF terms — use one value space")
          FIn(v, its, neg)
        } else if (isArithSym(c)) {
          // left side continues arithmetically -> numeric value space
          val lfull = nexprFrom(c, toN(l))
          FNumCmp(lfull, cmpOp(), nexpr(c))
        } else {
        val op = cmpOp()
        // a right side opening with '-' or STRLEN is unambiguously a
        // numeric expression; '(' is numeric too but ONLY under an
        // ordering operator — `?x = (?y)` would otherwise silently turn
        // an id-space equality into a value-space one
        if (c.atSym("-") || c.atSym("STRLEN") || c.atSym("ABS") ||
            c.atSym("CEIL") || c.atSym("FLOOR") || c.atSym("ROUND") ||
            (c.atSym("(") && Set("<", "<=", ">", ">=")(op)))
          FNumCmp(toN(l), op, nexpr(c))
        else if (c.atSym("("))
          fail("a parenthesized operand after = / != is ambiguous between " +
            "the id and numeric spaces — drop the parentheses for id " +
            "equality, or start the arithmetic unparenthesized " +
            "(`?x = ?y + 1`) for the numeric space")
        else {
        val r = filterOperand(c)
        if (isArithSym(c)) {
          // right side continues arithmetically -> numeric value space
          FNumCmp(toN(l), op, nexprFrom(c, toN(r)))
        }
        // space selection: a STR/LANG/DATATYPE/CONCAT/LCASE/UCASE side
        // puts the comparison in the STRING value space (= / != only —
        // string ordering is collation-dependent and out of fragment);
        // an ordering operator or a bare-number side selects the NUMERIC
        // value space; = / != between vars/IRIs/literals stays node-id
        // (in)equality (decidable without the nodes table)
        else if (temporalDt(l).isDefined || temporalDt(r).isDefined) {
          val kinds = (temporalDt(l) ++ temporalDt(r)).toSeq
          if (kinds.distinct.sizeIs > 1)
            fail("xsd:date and xsd:dateTime do not compare in SPARQL — " +
              "use one type on both sides")
          val isDt = kinds.head
          def tt(o: FOperand): TTerm = o match {
            case FOVar(n) => TTVar(n)
            case FOLit(v, None, Some(_)) => TTConst(v)
            case _ => fail("temporal comparisons take ?vars and " +
              "xsd:date/xsd:dateTime typed literals")
          }
          FTimeCmp(tt(l), op, tt(r), isDt)
        }
        else if (l.isInstanceOf[FOStrFn] || r.isInstanceOf[FOStrFn]) {
          if (Set("<", "<=", ">", ">=")(op))
            fail("string value-space comparisons support = / != only — " +
              "string ordering is collation-dependent and out of this fragment")
          def st(o: FOperand): STerm = o match {
            case FOStrFn(t)           => t
            case FOVar(n)             => SVar(n, viaStr = false)
            case FOLit(v, None, None) => SConst(v)
            case FOIri(iri)           => SConst(iri)
            case FOLit(_, _, _) => fail("string-space comparisons take plain " +
              "string literals (no @lang / ^^dt)")
            case FONum(_) => fail("a string-space side cannot compare to a " +
              "number — wrap the variable (not the function) for numeric space")
          }
          FStrCmp(st(l), op == "=", st(r))
        } else if (Set("<", "<=", ">", ">=")(op) ||
            l.isInstanceOf[FONum] || r.isInstanceOf[FONum]) {
          def nt(o: FOperand): NExpr = o match {
            case FOVar(n) => NVar(n)
            case FONum(d) => NNum(d)
            case _ => fail("value-space comparisons take ?vars or " +
              "numbers — IRI/literal constants compare by node id with = / != only")
          }
          FNumCmp(nt(l), op, nt(r))
        } else {
          def ft(o: FOperand): FTerm = o match {
            case FOVar(n)           => FTVar(n)
            case FOIri(iri)         => FTConst(Bgp.iriId(iri), Some(iri))
            case FOLit(v, lang, dt) =>
              FTConst(Bgp.litId(v, dt.getOrElse(RdfTerm.XsdString), lang))
            case _ => fail("unreachable: numeric/string operand in id comparison")
          }
          FCmp(ft(l), op, ft(r))
        }
        }
        }
    }
    def andExpr(): FExpr = {
      var e = atom()
      while (c.atSym("&&")) { c.takeSym("&&"); e = FAnd(e, atom()) }
      e
    }
    def orExpr(): FExpr = {
      var e = andExpr()
      while (c.atSym("||")) { c.takeSym("||"); e = FOr(e, andExpr()) }
      e
    }
    orExpr()
  }

  private def varName(c: Cursor): String = c.next() match {
    case TVar(n) => n
    case t       => fail(s"expected a ?variable, found $t")
  }

  /** BIND(expr AS ?v) right-hand side — shared by BIND clauses and
    * `GROUP BY (expr AS ?v)` keys: a string expression, IF, COALESCE,
    * a bare ?var copy, or a numeric expression. */
  private def bindBody(c: Cursor): BExpr = strFnOperand(c) match {
      case Some(st) => BStr(st)
      case None => c.peekOrFail match {
        case TSym("IF") =>
          // IF(cond, then, else): the condition is a full FILTER
          // expression; the branches recurse through this same body
          // grammar and must share one value kind (validated)
          c.next(); c.takeSym("(")
          val cond = filterExpr(c)
          c.takeSym(",")
          val t = bindBody(c)
          c.takeSym(",")
          val e = bindBody(c)
          c.takeSym(")")
          BIf(cond, t, e)
        case TSym("COALESCE") =>
          c.next(); c.takeSym("(")
          val vs = Seq.newBuilder[String]
          vs += varName(c)
          while (c.atSym(",")) { c.takeSym(","); vs += varName(c) }
          c.takeSym(")")
          val r = vs.result()
          if (r.sizeIs < 2) fail("COALESCE takes at least two ?variables")
          BCoalesce(r)
        case TSym(f @ ("STRDT" | "STRLANG")) =>
          c.next(); c.takeSym("(")
          val lex = strArg(c)
          c.takeSym(",")
          val minted = f match {
            case "STRDT" =>
              val dt = c.next() match {
                case TIri(iri) => iri
                case t => fail(s"STRDT takes a datatype <iri>, found $t")
              }
              if (dt == RdfTerm.RdfLangString)
                fail("STRDT cannot mint rdf:langString — a language-tagged " +
                  "literal needs a tag; use STRLANG")
              BMintTerm(lex, dt, None)
            case _ =>
              val tag = c.next() match {
                case TLit(v, None, None) => v
                case t => fail(s"STRLANG takes a plain string literal tag, found $t")
              }
              BMintTerm(lex, RdfTerm.RdfLangString, Some(tag))
          }
          c.takeSym(")")
          minted
        case TVar(n) =>
          c.next()
          if (isArithSym(c)) BNum(nexprFrom(c, NVar(n))) else BCopy(n)
        case TLit(v, None, None) => c.next(); BStr(SConst(v))
        case TLit(_, _, _) =>
          fail("BIND string constants must be plain (no @lang / ^^dt)")
        case TNum(_) | TDbl(_) | TSym("(") | TSym("-") | TSym("STRLEN") |
             TSym("ABS") | TSym("CEIL") | TSym("FLOOR") | TSym("ROUND") |
             TSym("YEAR") | TSym("MONTH") | TSym("DAY") | TSym("HOURS") |
             TSym("MINUTES") | TSym("SECONDS") =>
          BNum(nexpr(c))
        case TIri(iri) if NumCastIris.contains(iri) &&
            c.peek2.contains(TSym("(")) =>
          BNum(nexpr(c))
        case t => fail(s"expected a numeric/string expression, IF(...), " +
          s"COALESCE(...), ?var or a plain string literal in BIND, found $t")
      }
    }

  private def aggCall(c: Cursor): AggCall = {
    val f = c.next() match {
      case TSym(s) if Set("COUNT", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT",
        "SUM", "AVG")(s) => s
      case t => fail(s"expected an aggregate (COUNT/SUM/AVG/MIN/MAX/SAMPLE/" +
        s"GROUP_CONCAT), found $t")
    }
    c.takeSym("(")
    val dist = c.atSym("DISTINCT")
    if (dist) c.takeSym("DISTINCT")
    val arg = c.next() match {
      case TVar(n)                   => Some(n)
      case TSym("*") if f == "COUNT" => None
      case t => fail(s"$f takes a ?variable${if (f == "COUNT") " or *" else ""}, found $t")
    }
    if (dist && arg.isEmpty)
      fail("COUNT(DISTINCT *) is not supported — SELECT DISTINCT the " +
        "variables instead, or COUNT(DISTINCT ?v) one of them")
    var sep = " "
    if (c.atSym(";")) {
      if (f != "GROUP_CONCAT") fail("SEPARATOR is only valid in GROUP_CONCAT")
      c.takeSym(";"); c.takeSym("SEPARATOR"); c.takeSym("=")
      sep = c.next() match {
        case TLit(v, None, None) => v
        case t                   => fail(s"SEPARATOR takes a plain string literal, found $t")
      }
    }
    c.takeSym(")")
    AggCall(f, dist, arg, sep)
  }

  // HAVING: aggregate-to-number comparisons under !/&&/||; COUNT (any
  // comparison) and SUM/AVG (numeric value space — the nodes-table
  // overload is required, exactly as for projected SUM/AVG).
  // MIN/MAX/SAMPLE/GROUP_CONCAT yield id/string values a numeric
  // comparison cannot mean anything against.
  private def havingExpr(c: Cursor): HExpr = {
    def atom(): HExpr = c.peekOrFail match {
      case TSym("(") => c.takeSym("("); val e = orE(); c.takeSym(")"); e
      case TSym("!") => c.takeSym("!"); HNot(atom())
      case _ =>
        val call = aggCall(c)
        if (call.func != "COUNT" && call.func != "SUM" && call.func != "AVG")
          fail(s"HAVING supports COUNT/SUM/AVG comparisons only — ${call.func} " +
            "yields an id/string value; filter those with FILTER before aggregation")
        val op = c.next() match {
          case TSym(s) if Set("=", "!=", "<", "<=", ">", ">=")(s) => s
          case t => fail(s"expected a comparison after the HAVING aggregate, found $t")
        }
        val neg = c.atSym("-")
        if (neg) c.takeSym("-")
        val n = c.next() match {
          case TNum(v) => v.toDouble
          case TDbl(v) => v
          case t       => fail(s"HAVING compares an aggregate to a number, found $t")
        }
        HCmp(call, op, if (neg) -n else n)
    }
    def andE(): HExpr = {
      var e = atom()
      while (c.atSym("&&")) { c.takeSym("&&"); e = HAnd(e, atom()) }
      e
    }
    def orE(): HExpr = {
      var e = andE()
      while (c.atSym("||")) { c.takeSym("||"); e = HOr(e, andE()) }
      e
    }
    orE()
  }

  /** One VALUES cell: a constant's node id, or null for UNDEF (the
    * cell is compatible with ANY binding — [[Bgp.applyValues]] switches
    * to its disjunctive-filter compilation when any row has one). */
  private def valuesConst(c: Cursor): String = c.next() match {
    case TIri(iri)         => Bgp.iriId(iri)
    case TLit(v, lang, dt) => Bgp.litId(v, dt.getOrElse(RdfTerm.XsdString), lang)
    case TSym("UNDEF")     => null
    case t => fail(s"VALUES rows take IRI/literal constants or UNDEF, found $t")
  }

  private def valuesClause(c: Cursor): (Seq[String], Seq[Seq[String]]) =
    c.peekOrFail match {
      case TVar(n) =>
        c.next()
        c.takeSym("{")
        val rows = Seq.newBuilder[Seq[String]]
        while (!c.atSym("}")) rows += Seq(valuesConst(c))
        c.takeSym("}")
        val r = rows.result()
        if (r.isEmpty) fail("empty VALUES block")
        (Seq(n), r)
      case TSym("(") =>
        c.takeSym("(")
        val vars = Seq.newBuilder[String]
        while (!c.atSym(")")) vars += varName(c)
        c.takeSym(")")
        val vs = vars.result()
        if (vs.isEmpty) fail("empty VALUES variable list")
        c.takeSym("{")
        val rows = Seq.newBuilder[Seq[String]]
        while (c.atSym("(")) {
          c.takeSym("(")
          rows += vs.map(_ => valuesConst(c))
          c.takeSym(")")
        }
        c.takeSym("}")
        val r = rows.result()
        if (r.isEmpty) fail("empty VALUES block")
        (vs, r)
      case t => fail(s"VALUES takes ?var or (?var ...), found $t")
    }

  /** The parsed WHERE-group pieces (shared by SELECT, ASK and
    * CONSTRUCT). */
  private final case class GroupAst(required: Seq[TriplePattern],
                                    optionals: Seq[Seq[TriplePattern]],
                                    minuses: Seq[Seq[TriplePattern]],
                                    unions: Seq[Seq[Seq[TriplePattern]]],
                                    filters: Seq[FExpr],
                                    values: Seq[(Seq[String], Seq[Seq[String]])],
                                    exists: Seq[Seq[TriplePattern]],
                                    notExists: Seq[Seq[TriplePattern]],
                                    binds: Seq[(String, BExpr)],
                                    subqueries: Seq[Query],
                                    optionalFilters: Seq[Seq[FExpr]])

  /** Parses a group after its opening '{' (consumes the closing '}'). */
  private def parseGroupBody(c: Cursor): GroupAst = {
    val required = Seq.newBuilder[TriplePattern]
    val optionals = Seq.newBuilder[Seq[TriplePattern]]
    val minuses = Seq.newBuilder[Seq[TriplePattern]]
    val unions = Seq.newBuilder[Seq[Seq[TriplePattern]]]
    val filters = Seq.newBuilder[FExpr]
    val values = Seq.newBuilder[(Seq[String], Seq[Seq[String]])]
    val exists = Seq.newBuilder[Seq[TriplePattern]]
    val notExists = Seq.newBuilder[Seq[TriplePattern]]
    val binds = Seq.newBuilder[(String, BExpr)]
    val subqueries = Seq.newBuilder[Query]
    val optionalFilters = Seq.newBuilder[Seq[FExpr]]
    // BIND ( bexpr AS ?var ) — the body's kind is decided by its first
    // token: a string function opens the string space, STRLEN/number/
    // paren/unary-minus the numeric space, a bare ?var (no arithmetic
    // following) is an id-space copy, a plain "lit" a string constant
    def bindBody(): BExpr = Sparql.bindBody(c)
    def bindClause(): Unit = {
      c.takeSym("BIND"); c.takeSym("(")
      val b = bindBody()
      c.takeSym("AS")
      val v = varName(c)
      c.takeSym(")")
      binds += ((v, b))
    }
    // FILTER ( expr ) | FILTER EXISTS { .. } | FILTER NOT EXISTS { .. }
    def filterClause(): Unit = {
      c.takeSym("FILTER")
      if (c.atSym("EXISTS")) {
        c.takeSym("EXISTS"); c.takeSym("{")
        exists += triplesBlock(c)
      } else if (c.atSym("NOT")) {
        c.takeSym("NOT"); c.takeSym("EXISTS"); c.takeSym("{")
        notExists += triplesBlock(c)
      } else {
        c.takeSym("(")
        filters += filterExpr(c)
        c.takeSym(")")
      }
    }
    locally {
      while (!c.atSym("}")) c.peekOrFail match {
        case TSym("UNION") =>
          fail("UNION branches must be plain { triples } blocks — start " +
            "the group with '{ triples } UNION { triples }'")
        case TSym("OPTIONAL") =>
          // OPTIONAL { triples (FILTER(expr))* } — the filters CONDITION
          // the match (SPARQL LeftJoin's third argument), restricted to
          // the group's own variables (validated)
          c.takeSym("OPTIONAL"); c.takeSym("{")
          val pats = Seq.newBuilder[TriplePattern]
          val ofs = Seq.newBuilder[FExpr]
          while (!c.atSym("}")) {
            if (c.atSym("FILTER")) {
              c.takeSym("FILTER"); c.takeSym("(")
              ofs += filterExpr(c)
              c.takeSym(")")
            } else pats += triple(c)
          }
          c.takeSym("}")
          val ps = pats.result()
          if (ps.isEmpty) fail("empty OPTIONAL group")
          optionals += ps
          optionalFilters += ofs.result()
        case TSym("GRAPH") =>
          // GRAPH (?g | <iri>) { triples } — scopes/binds the quad
          // view's raw graph column; the scoped triples are ordinary
          // required patterns for the join-order machinery
          c.takeSym("GRAPH")
          val g: Bgp.TermPat = c.next() match {
            case TVar(n)   => V(n)
            case TIri(iri) => C(iri) // RAW graph IRI, like the pred column
            case t => fail(s"GRAPH takes a ?variable or an <iri>, found $t")
          }
          c.takeSym("{")
          required ++= triplesBlock(c).map { t =>
            if (t.graph.isDefined) fail("nested GRAPH scopes are not supported")
            t.copy(graph = Some(g))
          }
        case TSym("MINUS") =>
          c.takeSym("MINUS"); c.takeSym("{")
          minuses += triplesBlock(c)
        case TSym("FILTER") =>
          filterClause()
        case TSym("BIND") =>
          bindClause()
        case TSym("VALUES") =>
          c.takeSym("VALUES")
          values += valuesClause(c)
        case TSym("{") =>
          // nested group: a SPARQL 1.1 subquery ({ SELECT ... }) or a
          // UNION group ({ triples } UNION { triples } ...) — both are
          // group members joining the rest of the group on their shared
          // variables (a union member's join variables must be bound in
          // EVERY branch; validated)
          c.takeSym("{")
          if (c.atSym("SELECT")) {
            c.takeSym("SELECT")
            subqueries += parseSelect(c, nested = true)
          } else {
            val branches = Seq.newBuilder[Seq[TriplePattern]]
            branches += triplesBlock(c)
            c.takeSym("UNION")
            c.takeSym("{")
            branches += triplesBlock(c)
            while (c.atSym("UNION")) {
              c.takeSym("UNION"); c.takeSym("{")
              branches += triplesBlock(c)
            }
            unions += branches.result()
          }
        case _ => required += triple(c)
      }
      c.takeSym("}")
    }
    GroupAst(required.result(), optionals.result(), minuses.result(),
      unions.result(), filters.result(), values.result(),
      exists.result(), notExists.result(), binds.result(),
      subqueries.result(), optionalFilters.result())
  }

  /** A token-level absoluteness test: an IRI with an RFC 3986 scheme is
    * left byte-untouched (no URI round-trip — RDF IRIs legal here may
    * not survive java.net.URI re-rendering); only scheme-less ones are
    * BASE-resolved. */
  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*:".r

  def parse(q: String): Query = {
    val toks0 = tokenize(q)
    // Prologue: PREFIX ns: <iri> and BASE <iri> headers, interleaved,
    // later declaration wins (as in SPARQL). Prefixed names are
    // expanded and relative IRIs BASE-resolved (RFC 3986, via
    // java.net.URI) HERE, so the body parser and the engine's node-id
    // hashing only ever see absolute <iri>s.
    var i = 0
    val prefixes = scala.collection.mutable.Map.empty[String, String]
    var base: Option[java.net.URI] = None
    def resolve(iri: String, what: String): String =
      if (SchemePrefix.findPrefixOf(iri).isDefined) iri
      else base match {
        // no BASE declared: a scheme-less <name> stays the opaque name,
        // the engine's long-standing convention (edges carry arbitrary
        // IRI strings) — resolution only ever applies under an explicit
        // BASE, so declaring one cannot change absolute-IRI queries
        case None => iri
        case Some(b) =>
          try b.resolve(iri).toString
          catch { case _: IllegalArgumentException =>
            fail(s"relative IRI <$iri> in $what does not resolve against " +
              s"BASE <$b>") }
      }
    var prologue = true
    while (prologue && i < toks0.length) toks0(i) match {
      case TSym("PREFIX") =>
        (toks0.lift(i + 1), toks0.lift(i + 2)) match {
          case (Some(TPname(p, "")), Some(TIri(iri))) =>
            prefixes(p) = resolve(iri, s"PREFIX $p:")
            i += 3
          case _ => fail("a PREFIX declaration is `PREFIX ns: <iri>`")
        }
      case TSym("BASE") =>
        toks0.lift(i + 1) match {
          case Some(TIri(iri)) =>
            val next =
              try base.map(_.resolve(iri)).getOrElse(java.net.URI.create(iri))
              catch { case _: IllegalArgumentException =>
                fail(s"BASE <$iri> is not a valid IRI") }
            if (!next.isAbsolute) fail(s"BASE <$iri> must be absolute " +
              "(or resolve absolutely against an earlier BASE)")
            base = Some(next)
            i += 2
          case _ => fail("a BASE declaration is `BASE <iri>`")
        }
      case _ => prologue = false
    }
    val toks = toks0.drop(i).map {
      case TPname(p, l) => TIri(prefixes.getOrElse(p,
        fail(s"undeclared prefix '$p:' — add `PREFIX $p: <...>` before the query")) + l)
      case TIri(iri) => TIri(resolve(iri, "the query body"))
      case TSym("PREFIX") =>
        fail("PREFIX declarations must precede the query form")
      case TSym("BASE") =>
        fail("BASE declarations must precede the query form")
      case t => t
    }
    val c = new Cursor(toks)
    c.peekOrFail match {
      case TSym("ASK")       => c.takeSym("ASK"); parseAsk(c)
      case TSym("CONSTRUCT") => c.takeSym("CONSTRUCT"); parseConstruct(c)
      case TSym("DESCRIBE")  => c.takeSym("DESCRIBE"); parseDescribe(c)
      case _                 => c.takeSym("SELECT"); parseSelect(c)
    }
  }

  /** `FROM <g>` / `FROM NAMED <g>` dataset clauses (repeatable, SPARQL
    * 13.2) between the query form and WHERE. */
  private def datasetClauses(c: Cursor): (Seq[String], Seq[String]) = {
    val from = Seq.newBuilder[String]
    val named = Seq.newBuilder[String]
    while (c.atSym("FROM")) {
      c.takeSym("FROM")
      val isNamed = c.atSym("NAMED")
      if (isNamed) c.takeSym("NAMED")
      c.next() match {
        case TIri(iri) => if (isNamed) named += iri else from += iri
        case t => fail(s"FROM${if (isNamed) " NAMED" else ""} takes an <iri>, found $t")
      }
    }
    (from.result().distinct, named.result().distinct)
  }

  /** `DESCRIBE (?var | <iri>)+ [WHERE { group }]` — variables need the
    * group to bind them; constants alone need no WHERE at all. */
  private def parseDescribe(c: Cursor): Query = {
    val vars = Seq.newBuilder[String]
    val ids = Seq.newBuilder[String]
    var more = true
    while (more) c.peek match {
      case Some(TVar(n))   => c.next(); vars += n
      case Some(TIri(iri)) => c.next(); ids += Bgp.iriId(iri)
      case _               => more = false
    }
    val (vs, is) = (vars.result().distinct, ids.result().distinct)
    if (vs.isEmpty && is.isEmpty)
      fail("DESCRIBE needs at least one ?var or <iri>")
    val (from, named) = datasetClauses(c)
    val g =
      if (c.atSym("WHERE") || c.atSym("{")) {
        if (c.atSym("WHERE")) c.takeSym("WHERE")
        c.takeSym("{")
        parseGroupBody(c)
      } else {
        if (vs.nonEmpty)
          fail(s"DESCRIBE ?${vs.head} needs a WHERE group to bind the variable")
        GroupAst(Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil, Nil)
      }
    if (!c.done) fail(s"trailing tokens after the DESCRIBE query: ${c.peekOrFail}")
    val qy = Query(Nil, distinct = false, g.required, g.optionals, g.minuses,
      g.unions, g.filters, values = g.values, form = "DESCRIBE",
      exists = g.exists, notExists = g.notExists,
      describeVars = vs, describeIds = is, binds = g.binds,
      subqueries = g.subqueries, optionalFilters = g.optionalFilters,
      fromGraphs = from, fromNamed = named)
    validate(qy)
    qy
  }

  /** `ASK [FROM ...] [WHERE] { group }` — no projection, no solution
    * modifiers. */
  private def parseAsk(c: Cursor): Query = {
    val (from, named) = datasetClauses(c)
    if (c.atSym("WHERE")) c.takeSym("WHERE")
    c.takeSym("{")
    val g = parseGroupBody(c)
    if (!c.done) fail(s"trailing tokens after the ASK group: ${c.peekOrFail}")
    val qy = Query(Nil, distinct = false, g.required, g.optionals, g.minuses,
      g.unions, g.filters, values = g.values, form = "ASK",
      exists = g.exists, notExists = g.notExists, binds = g.binds,
      subqueries = g.subqueries, optionalFilters = g.optionalFilters,
      fromGraphs = from, fromNamed = named)
    validate(qy)
    qy
  }

  /** `CONSTRUCT { template } WHERE { group }` — the template's variables
    * must be bound by the group; property paths are not allowed in the
    * template (it names OUTPUT edges, not matches). */
  private def parseConstruct(c: Cursor): Query = {
    c.takeSym("{")
    val template = triplesBlock(c)
    val (from, named) = datasetClauses(c)
    c.takeSym("WHERE")
    c.takeSym("{")
    val g = parseGroupBody(c)
    if (!c.done) fail(s"trailing tokens after the CONSTRUCT group: ${c.peekOrFail}")
    val qy = Query(Nil, distinct = false, g.required, g.optionals, g.minuses,
      g.unions, g.filters, values = g.values, form = "CONSTRUCT",
      template = template, exists = g.exists, notExists = g.notExists,
      binds = g.binds, subqueries = g.subqueries,
      optionalFilters = g.optionalFilters,
      fromGraphs = from, fromNamed = named)
    validate(qy)
    qy
  }

  /** SELECT body; `nested = true` parses a subquery, which ends at its
    * closing '}' (consumed) instead of at end-of-input. */
  private def parseSelect(c: Cursor, nested: Boolean = false): Query = {
    val distinct = c.atSym("DISTINCT")
    if (distinct) c.takeSym("DISTINCT")
    val projection = Seq.newBuilder[Proj]
    if (c.atSym("*")) c.takeSym("*")
    else {
      var more = true
      while (more) c.peek match {
        case Some(TVar(n)) => c.next(); projection += PVar(n)
        case Some(TSym("(")) =>
          c.takeSym("(")
          val call = aggCall(c)
          c.takeSym("AS")
          val alias = varName(c)
          c.takeSym(")")
          projection += PAgg(call, alias)
        case _ => more = false
      }
      if (projection.result().isEmpty)
        fail("SELECT needs ?vars, (AGG(...) AS ?alias) items or *")
    }
    val (from, named) = datasetClauses(c)
    if (nested && (from.nonEmpty || named.nonEmpty))
      fail("FROM / FROM NAMED is a top-level dataset clause — subqueries " +
        "inherit the outer query's dataset (SPARQL 13.2)")
    c.takeSym("WHERE")
    c.takeSym("{")
    val g = parseGroupBody(c)
    // ---- solution modifiers (SPARQL order: GROUP BY, HAVING, ORDER BY,
    // LIMIT/OFFSET in either order) --------------------------------------
    var groupBy = Seq.empty[String]
    var groupBinds = Seq.empty[(String, BExpr)]
    if (c.atSym("GROUP")) {
      c.takeSym("GROUP"); c.takeSym("BY")
      val gs = Seq.newBuilder[String]
      var more = true
      while (more) c.peek match {
        case Some(TVar(n)) => c.next(); gs += n
        case Some(TSym("(")) =>
          // GROUP BY (expr AS ?v) — sugar for BIND(expr AS ?v) before
          // the grouping: the key is computed per row in the same
          // projection pass, then grouped like any BIND variable
          c.takeSym("(")
          val b = bindBody(c)
          c.takeSym("AS")
          val v = varName(c)
          c.takeSym(")")
          groupBinds :+= ((v, b))
          gs += v
        case _ => more = false
      }
      groupBy = gs.result()
      if (groupBy.isEmpty) fail("GROUP BY needs ?vars or (expr AS ?v) keys")
    }
    val having = Seq.newBuilder[HExpr]
    while (c.atSym("HAVING")) {
      c.takeSym("HAVING"); c.takeSym("(")
      having += havingExpr(c)
      c.takeSym(")")
    }
    var orderBy = Seq.empty[(String, Boolean)]
    var orderKeys = Seq.empty[(Either[String, NExpr], Boolean)]
    if (c.atSym("ORDER")) {
      c.takeSym("ORDER"); c.takeSym("BY")
      val os = Seq.newBuilder[(Either[String, NExpr], Boolean)]
      // ASC/DESC take a plain ?var — or any NUMERIC value expression
      // (SPARQL OrderCondition's bracketted expression), compiled like
      // a FILTER's numeric side at sort time
      def key(asc: Boolean): Unit = {
        c.takeSym(if (asc) "ASC" else "DESC"); c.takeSym("(")
        val k: Either[String, NExpr] = c.peekOrFail match {
          case TVar(n) if c.peek2.contains(TSym(")")) => c.next(); Left(n)
          case _ => Right(nexpr(c))
        }
        c.takeSym(")")
        os += ((k, asc))
      }
      var more = true
      while (more) c.peek match {
        case Some(TVar(n))      => c.next(); os += ((Left(n), true))
        case Some(TSym("ASC"))  => key(asc = true)
        case Some(TSym("DESC")) => key(asc = false)
        case _ => more = false
      }
      val keys = os.result()
      if (keys.isEmpty)
        fail("ORDER BY needs ?vars or ASC(expr)/DESC(expr)")
      orderBy = keys.collect { case (Left(v), asc) => (v, asc) }
      if (keys.exists(_._1.isRight)) orderKeys = keys
    }
    var limit: Option[Long] = None
    var offset: Option[Long] = None
    while (c.atSym("LIMIT") || c.atSym("OFFSET")) {
      val kw = c.next() match { case TSym(s) => s; case t => fail(s"unexpected $t") }
      val n = c.next() match {
        case TNum(v) => v
        case t       => fail(s"$kw takes a non-negative integer, found $t")
      }
      if (kw == "LIMIT") {
        if (limit.isDefined) fail("duplicate LIMIT")
        limit = Some(n)
      } else {
        if (offset.isDefined) fail("duplicate OFFSET")
        offset = Some(n)
      }
    }
    if (nested) c.takeSym("}")
    else if (!c.done) fail(s"trailing tokens after the query: ${c.peekOrFail}")
    val qy = Query(projection.result(), distinct, g.required, g.optionals,
      g.minuses, g.unions, g.filters, groupBy, having.result(), orderBy,
      limit, offset, g.values, exists = g.exists, notExists = g.notExists,
      binds = g.binds ++ groupBinds, subqueries = g.subqueries,
      optionalFilters = g.optionalFilters,
      fromGraphs = from, fromNamed = named, orderKeysAst = orderKeys)
    if (nested && qy.projection.isEmpty)
      fail("subqueries must project explicitly (?vars / aggregates) — " +
        "SELECT * has no statically-known output to join on")
    validate(qy)
    qy
  }

  /** Parse-time semantic checks — every rejection here is a query that
    * would otherwise run with silently-surprising semantics. */
  private def validate(qy: Query): Unit = {
    if (qy.unions.isEmpty && qy.required.isEmpty && qy.subqueries.isEmpty &&
        !(qy.form == "DESCRIBE" && qy.describeVars.isEmpty))
      fail("WHERE group has no required triple patterns or subqueries")
    if (qy.required.isEmpty &&
        (qy.optionals.nonEmpty || qy.minuses.nonEmpty))
      fail("OPTIONAL/MINUS need required triple patterns to anchor on — a " +
        "union- or subquery-only group supports FILTER/BIND/VALUES only")
    if (qy.required.isEmpty && qy.unions.nonEmpty && qy.subqueries.nonEmpty)
      fail("a group whose only required member is a UNION cannot also " +
        "carry subqueries in this fragment — the join keys would not be " +
        "anchored (NULL-padded branch variables); add a required triple " +
        "pattern to anchor them")
    def varsOf(ps: Seq[TriplePattern]): Set[String] =
      ps.flatMap(p => (Seq(p.subj, p.pred, p.obj) ++ p.graph)
        .collect { case V(n) => n }).toSet
    val reqVars = varsOf(qy.required)
    // ---- blank-node scope. A query bnode is a non-distinguished
    // variable of ONE basic graph pattern (SPARQL scopes labels to the
    // BGP); allowing a label to span OPTIONAL/UNION/MINUS/EXISTS groups
    // or the CONSTRUCT template would silently join what the spec keeps
    // separate — restricted to the required patterns, loudly.
    val bnOutside = varsOf(qy.optionals.flatten ++ qy.minuses.flatten ++
      qy.unions.flatten.flatten ++ qy.exists.flatten ++
      qy.notExists.flatten ++ qy.template).filter(_.startsWith("_bn_"))
    if (bnOutside.nonEmpty)
      fail(s"blank nodes (${bnOutside.toSeq.sorted.mkString(", ")}) are " +
        "only supported in the required triple patterns in this fragment " +
        "— OPTIONAL/UNION/MINUS/EXISTS groups and CONSTRUCT templates " +
        "take explicit ?variables")
    if (qy.form == "SELECT" && qy.projection.isEmpty &&
        reqVars.nonEmpty && reqVars.forall(_.startsWith("_bn_")) &&
        qy.binds.isEmpty && qy.subqueries.isEmpty)
      fail("SELECT * over patterns binding only blank nodes has no " +
        "projectable result — name at least one ?variable")
    // ---- UNION group checks. A lone UNION group IS the group (the
    // classic pure union); alongside required triples each group joins
    // the group result on its shared variables, and that equi-join is
    // sound only when every join variable is bound in EVERY branch (a
    // partial-branch binding is NULL in the other branches' rows, and a
    // NULL key silently drops them where SPARQL's join compatibility
    // keeps them). Cross-group / OPTIONAL-fresh overlap reintroduces
    // the non-well-designed cases and is rejected like the two-OPTIONAL
    // overlap rule.
    if (qy.unions.nonEmpty && qy.required.isEmpty && qy.unions.sizeIs > 1)
      fail("several UNION groups need a required pattern to anchor their join")
    if (qy.unions.nonEmpty && qy.required.nonEmpty) {
      val optFresh = qy.optionals.flatMap(varsOf).toSet -- reqVars
      val unionVarSets = qy.unions.map(_.flatMap(varsOf).toSet)
      qy.unions.zipWithIndex.foreach { case (branches, i) =>
        val allVars = unionVarSets(i)
        val everyBranch = branches.map(varsOf).reduce(_ & _)
        val sharedReq = allVars & reqVars
        if (sharedReq.isEmpty)
          fail(s"UNION group ${i + 1} shares no variable with the required " +
            "pattern — an unjoined union would be a cartesian product")
        val partial = (sharedReq -- everyBranch).toSeq.sorted
        if (partial.nonEmpty)
          fail(s"variable(s) ${partial.map("?" + _).mkString(", ")} join the " +
            "UNION group to the required pattern but are bound in only some " +
            "branches — a branch row's NULL key would silently drop it; " +
            "bind them in every branch")
        val optClash = (allVars & optFresh).toSeq.sorted
        if (optClash.nonEmpty)
          fail(s"variable(s) ${optClash.map("?" + _).mkString(", ")} are " +
            "bound both by an OPTIONAL group and a UNION group — only " +
            "well-designed patterns are supported")
        unionVarSets.drop(i + 1).zipWithIndex.foreach { case (other, j) =>
          val clash = ((allVars & other) -- reqVars).toSeq.sorted
          if (clash.nonEmpty)
            fail(s"variable(s) ${clash.map("?" + _).mkString(", ")} are " +
              s"bound by UNION groups ${i + 1} and ${i + j + 2} but not by " +
              "the required pattern — join them through a required binding")
        }
      }
    }
    // VALUES variables must be anchored in the REQUIRED pattern: a NULL
    // binding (unmatched OPTIONAL) never equals an inline value, which
    // would silently diverge from SPARQL's unbound-is-compatible rule
    qy.values.foreach { case (vs, _) =>
      val unanchored = vs.filterNot(reqVars.contains)
      if (unanchored.nonEmpty)
        fail(s"VALUES variable(s) ${unanchored.mkString(", ")} must be bound " +
          "by the required pattern (not only by OPTIONAL) in this fragment")
    }
    // ---- BIND checks: freshness, read availability and value-space
    // kinds. Every rejection here is a query that would otherwise run
    // with a silently-wrong space (e.g. a raw string compared to a
    // hashed node id). Reads are tagged by HOW the variable is used:
    // 'n' numeric value, 's' string value, 't' RDF-term structure,
    // 'c' id-space comparison.
    val kinds = qy.valueKinds
    def readsN(e: NExpr): Seq[(String, Char)] = e match {
      case NVar(n)         => Seq((n, 'n'))
      case NNum(_)         => Nil
      case NStrLen(a)      => readsS(a)
      case NArith(l, _, r) => readsN(l) ++ readsN(r)
      case NFn(_, a)       => readsN(a)
      case NTimeFn(_, v)   => Seq((v, 'd'))
      case NCast(v, _)     => Seq((v, 'x'))
    }
    def readsS(t: STerm): Seq[(String, Char)] = t match {
      // 'S' = a STR(?v) read (defined on IRIs too), 's' = a bare
      // string-literal read — the distinction matters for predicate-
      // position variables, whose raw IRI STR() reads directly
      case SVar(n, viaStr) => Seq((n, if (viaStr) 'S' else 's'))
      case SLang(n)    => Seq((n, 't'))
      case SDt(n)      => Seq((n, 't'))
      case SConst(_)   => Nil
      case SCase(a, _) => readsS(a)
      case SConcat(as) => as.flatMap(readsS)
      case SSubstr(a, s, l) =>
        readsS(a) ++ readsN(s) ++ l.toSeq.flatMap(readsN)
      case SCut(a, b, _)        => readsS(a) ++ readsS(b)
      case SReplace(a, _, _, _) => readsS(a)
      case SHash(_, a)          => readsS(a)
      case SEncode(a)           => readsS(a)
    }
    def readsF(e: FExpr): Seq[(String, Char)] = e match {
      case FBound(_)        => Nil
      case FNot(x)          => readsF(x)
      case FAnd(a, b)       => readsF(a) ++ readsF(b)
      case FOr(a, b)        => readsF(a) ++ readsF(b)
      case FCmp(l, _, r)    => Seq(l, r).collect { case FTVar(n) => (n, 'c') }
      case FNumCmp(l, _, r) => readsN(l) ++ readsN(r)
      case FStrFn(_, a, b)  => readsS(a) ++ readsS(b)
      case FRegex(a, _, _)  => readsS(a)
      case FStrCmp(l, _, r) => readsS(l) ++ readsS(r)
      case FKindTest(_, v)  => Seq((v, 't'))
      case FTimeCmp(l, _, r, _) =>
        Seq(l, r).collect { case TTVar(n) => (n, 'd') }
      case FLangMatches(a, _) => readsS(a)
      case FIn(v, items, _) =>
        Seq((v, if (items.forall(_.isInstanceOf[FONum])) 'n' else 'i'))
      case FSameTerm(a, b) => Seq((a, 'c'), (b, 'c'))
    }
    def checkRead(v: String, how0: Char, ctx: String): Unit =
      kinds.get(v).foreach { k =>
        val how = if (how0 == 'S') 's' else how0
        how match {
          case 't' => fail(s"$ctx: ?$v is a BIND value, not an RDF term — " +
            "LANG/DATATYPE/ISIRI-family tests cannot apply to it")
          case 'c' if k != 'c' => fail(s"$ctx: ?$v is a BIND value — compare " +
            s"it in its value space (a numeric comparison, or STR(?$v) = " +
            "\"...\" for strings), not by node id")
          case 'n' if k != 'n' =>
            fail(s"$ctx: ?$v is not a numeric BIND value")
          case 'd' => fail(s"$ctx: ?$v is a computed value, not an RDF " +
            "term — temporal comparisons read xsd:date/xsd:dateTime literals")
          case 'i' if k == 'n' => fail(s"$ctx: ?$v is a numeric BIND " +
            "value — an RDF-term IN list cannot match it; use numbers")
          case 'x' if k == 'c' => fail(s"$ctx: ?$v is an id-space BIND " +
            "copy — cast the original pattern variable instead")
          case 's' if k != 's' =>
            fail(s"$ctx: ?$v is not a string BIND value")
          case _ => ()
        }
      }
    // ---- predicate-position space checks. The edges convention stores
    // RAW predicate IRIs in the pred column and hashed node ids
    // everywhere else, so a variable bound in predicate position lives
    // in a different value space from every other binding: joining or
    // comparing across the two spaces is silently constant (a raw IRI
    // never equals a sha256 hash). Everything cross-space is rejected
    // here; the compiler handles the sound cases (IRI constants compile
    // raw against pred variables, STR(?p) reads the column directly).
    val predSpace = qy.predSpaceVars
    val mixedSpace = (predSpace & qy.nodeSpaceVars).toSeq.sorted
    if (mixedSpace.nonEmpty)
      fail(s"variable(s) ${mixedSpace.map("?" + _).mkString(", ")} are bound " +
        "in predicate/GRAPH position (raw IRIs) but also used where hashed node " +
        "ids live (subject/object position, DESCRIBE, CONSTRUCT node slots) " +
        "— the two spaces never compare equal; rename one of the uses")
    def checkPredRead(v: String, how: Char, ctx: String): Unit =
      if (predSpace(v)) how match {
        case 'n' => fail(s"$ctx reads ?$v numerically, but ?$v binds " +
          "raw predicate/graph IRIs")
        case 's' => fail(s"$ctx reads ?$v as a string literal, but ?$v " +
          s"binds predicate IRIs — wrap it: STR(?$v)")
        case 't' => fail(s"$ctx applies an RDF-term test to ?$v, which " +
          "binds predicate IRIs directly (ISIRI would be vacuously true; " +
          "LANG/DATATYPE are type errors on IRIs)")
        case 'd' => fail(s"$ctx compares ?$v temporally, but ?$v binds " +
          "raw predicate/graph IRIs")
        case 'x' => fail(s"$ctx casts ?$v, but ?$v binds raw " +
          "predicate/graph IRIs — an xsd constructor cast of an IRI is " +
          "a SPARQL type error")
        // 'S' (STR) reads the raw IRI; 'c' and 'i' (RDF-term =/IN) are
        // space-checked by checkPredCmp, which compiles raw IRIs
        case _ => ()
      }
    def checkPredCmp(e: FExpr, pv: Set[String], ctx: String): Unit = e match {
      case FCmp(l, _, r) =>
        def isPred(t: FTerm): Boolean = t match {
          case FTVar(n) => pv(n)
          case _        => false
        }
        (l, r) match {
          case _ if !isPred(l) && !isPred(r) => ()
          case (FTVar(a), FTVar(b)) =>
            if (isPred(l) != isPred(r))
              fail(s"$ctx compares ?$a with ?$b across value spaces — one " +
                "binds raw predicate IRIs, the other hashed node ids, so " +
                "the comparison is silently constant")
          case (FTVar(n), FTConst(_, None)) =>
            fail(s"$ctx compares predicate variable ?$n with a literal — " +
              "predicates are IRIs; compare against an <iri>")
          case (FTConst(_, None), FTVar(n)) =>
            fail(s"$ctx compares predicate variable ?$n with a literal — " +
              "predicates are IRIs; compare against an <iri>")
          case _ => () // pred variable vs IRI constant: compiled raw
        }
      case FIn(v, items, _) if pv(v) =>
        if (!items.forall(_.isInstanceOf[FOIri]))
          fail(s"$ctx: ?$v binds raw predicate/graph IRIs — its IN list " +
            "must contain <iri>s only")
      case FSameTerm(a, b) =>
        if (pv(a) != pv(b))
          fail(s"$ctx: SAMETERM(?$a, ?$b) compares across value spaces — " +
            "one binds raw predicate IRIs, the other hashed node ids, so " +
            "the test is silently constant")
      case FNot(x)    => checkPredCmp(x, pv, ctx)
      case FAnd(a, b) => checkPredCmp(a, pv, ctx); checkPredCmp(b, pv, ctx)
      case FOr(a, b)  => checkPredCmp(a, pv, ctx); checkPredCmp(b, pv, ctx)
      case _          => ()
    }
    qy.filterAst.foreach(checkPredCmp(_, predSpace, "FILTER"))
    qy.optionalFilters.zip(qy.optionals).foreach { case (fs, group) =>
      val gp = group.flatMap(p => p.pred match {
        case V(n) => Seq(n); case _ => Nil
      }).toSet
      fs.foreach(checkPredCmp(_, gp, "a FILTER inside OPTIONAL"))
    }
    qy.values.foreach { case (vs, _) =>
      val pv = vs.filter(predSpace)
      if (pv.nonEmpty)
        fail(s"VALUES over predicate-position variable(s) " +
          s"${pv.map("?" + _).mkString(", ")} — inline rows hash to node " +
          "ids, which never match raw predicate IRIs; use a predicate " +
          "alternative (<a>|<b>) or FILTER(?p = <a> || ?p = <b>)")
    }
    (qy.projection.collect { case PAgg(call, _) => call } ++
      qy.havingAst.flatMap(havingCalls)).foreach {
      case AggCall(f @ ("SUM" | "AVG"), _, Some(v), _) if predSpace(v) =>
        fail(s"$f(?$v) aggregates numeric values, but ?$v binds predicate IRIs")
      case _ => ()
    }
    val bindNames = qy.binds.map(_._1)
    val dupBind = bindNames.diff(bindNames.distinct)
    if (dupBind.nonEmpty)
      fail(s"duplicate BIND variable(s): ${dupBind.distinct.mkString(", ")}")
    val patternVarsAll = varsOf(qy.required) ++ qy.optionals.flatMap(varsOf) ++
      qy.unions.flatten.flatMap(varsOf)
    qy.binds.zipWithIndex.foreach { case ((name, b), i) =>
      if (patternVarsAll.contains(name))
        fail(s"BIND variable ?$name is already bound by the pattern group")
      val earlier = bindNames.take(i).toSet
      def readsB(bx: BExpr): Seq[(String, Char)] = bx match {
        case BCopy(src) =>
          if (!patternVarsAll.contains(src))
            fail(s"BIND(?$src AS ?$name): a bare-?var BIND copies a PATTERN " +
              s"binding — ?$src is not one (computed values need an expression)")
          Nil
        case BCoalesce(vs) =>
          // id-space fallback over pattern bindings (OPTIONAL vars are
          // the point); value columns would mix spaces — rejected
          val notPattern = vs.filterNot(patternVarsAll.contains)
          if (notPattern.nonEmpty)
            fail(s"COALESCE takes PATTERN variables — ${notPattern.map("?" + _).mkString(", ")} " +
              "are not pattern bindings (coalescing ids with computed values mixes spaces)")
          val ps = vs.filter(predSpace)
          if (ps.nonEmpty && ps.size != vs.size)
            fail(s"COALESCE in BIND ?$name mixes predicate-position (raw " +
              "IRI) and node-position (hashed id) variables — the two " +
              "spaces cannot share a column")
          Nil
        case BNum(e) => readsN(e)
        case BStr(t) => readsS(t)
        case BMintTerm(lex, _, _) => readsS(lex)
        case BIf(cond, t, e2) =>
          checkPredCmp(cond, predSpace, s"BIND ?$name")
          readsF(cond) ++ readsB(t) ++ readsB(e2)
      }
      // IF branches must live in ONE value kind — mixing a numeric and
      // a string (or id) branch would give the column no coherent space
      def kindOfB(bx: BExpr): Char = bx match {
        case BNum(_)                 => 'n'
        case BStr(_)                 => 's'
        case BCopy(_) | BCoalesce(_) | BMintTerm(_, _, _) => 'c'
        case BIf(_, t, e2) =>
          val (kt, ke) = (kindOfB(t), kindOfB(e2))
          if (kt != ke)
            fail(s"IF branches in BIND ?$name mix value kinds — both must " +
              "be numeric, both string, or both id-space bindings")
          kt
      }
      kindOfB(b): Unit
      readsB(b).foreach { case (v, how) =>
        if (!patternVarsAll.contains(v) && !earlier.contains(v) &&
            !qy.subqueryOutputs.contains(v))
          fail(s"BIND ?$name reads ?$v, which is bound neither by the " +
            "patterns, a subquery, nor an earlier BIND")
        checkRead(v, how, s"BIND ?$name")
        checkPredRead(v, how, s"BIND ?$name")
      }
    }
    qy.filterAst.flatMap(readsF).foreach { case (v, how) =>
      checkRead(v, how, "FILTER")
      checkPredRead(v, how, "FILTER")
    }
    // every variable a FILTER reads must be bound by the patterns, a
    // BIND or a subquery — a typo'd FILTER variable would otherwise
    // surface as an opaque unresolved-column AnalysisException at run
    // time instead of a parse error (the same check BIND gets above)
    def fReadVars(e: FExpr): Seq[String] = e match {
      case FBound(v) => Seq(v)
      case FNot(x)   => fReadVars(x)
      case FAnd(a, b) => fReadVars(a) ++ fReadVars(b)
      case FOr(a, b)  => fReadVars(a) ++ fReadVars(b)
      case other      => readsF(other).map(_._1)
    }
    val filterBound = patternVarsAll ++ bindNames ++ qy.subqueryOutputs
    qy.filterAst.flatMap(fReadVars).distinct.filterNot(filterBound.contains)
      .foreach(v => fail(s"FILTER reads ?$v, which is bound neither by " +
        "the patterns, a BIND, nor a subquery"))
    // ---- subquery checks: result-name hygiene and join anchoring.
    // Every subquery-projected PLAIN variable must be bound by the
    // subquery's own REQUIRED pattern and the join must share at least
    // one such variable with the outer required pattern (or an earlier
    // subquery) — anchored keys are never NULL, so the inner equi-join
    // cannot silently diverge from SPARQL's unbound-is-compatible rule.
    if (qy.subqueries.nonEmpty) {
      val allOut = qy.subqueryOutputs
      val dupOut = allOut.diff(allOut.distinct)
      if (dupOut.nonEmpty)
        fail(s"subqueries expose duplicate result name(s): " +
          s"${dupOut.distinct.mkString(", ")}")
      val bindClash = allOut.filter(bindNames.contains)
      if (bindClash.nonEmpty)
        fail(s"subquery result name(s) ${bindClash.mkString(", ")} collide " +
          "with BIND variables")
      qy.subqueries.zipWithIndex.foreach { case (sq, i) =>
        // aggregate aliases are plain VALUES; an outer pattern variable
        // of the same name would join an id column against them
        val aliasClash = sq.projection.collect { case PAgg(_, a) => a }
          .filter(patternVarsAll.contains)
        if (aliasClash.nonEmpty)
          fail(s"subquery aggregate alias(es) ${aliasClash.mkString(", ")} " +
            "collide with outer pattern variables — rename the alias")
        val subReq = varsOf(sq.required)
        val unanchored = sq.select.filterNot(subReq.contains)
        if (unanchored.nonEmpty)
          fail(s"subquery-projected variable(s) ${unanchored.mkString(", ")} " +
            "must be bound by the subquery's required pattern (not only " +
            "OPTIONAL/UNION) in this fragment")
        // the OUTER side of the join must be never-NULL too: a shared
        // variable bound only by an outer OPTIONAL is NULL on unmatched
        // rows, and the inner equi-join would drop them where SPARQL's
        // unbound-is-compatible rule keeps them
        val optOnly = sq.select.filter(v =>
          !reqVars.contains(v) && qy.optionals.exists(o => varsOf(o).contains(v)))
        if (optOnly.nonEmpty)
          fail(s"subquery variable(s) ${optOnly.mkString(", ")} are bound " +
            "only by an outer OPTIONAL — an unmatched row's NULL key would " +
            "silently drop it from the join; anchor the variable in the " +
            "required pattern or rename the subquery projection")
        // same NULL-key hazard against a partial-branch UNION binding
        val unionPartial = sq.select.filter(v =>
          !reqVars.contains(v) && qy.unions.exists(g =>
            g.flatMap(varsOf).toSet.contains(v) &&
              !g.map(varsOf).reduce(_ & _).contains(v)))
        if (unionPartial.nonEmpty)
          fail(s"subquery variable(s) ${unionPartial.mkString(", ")} are " +
            "bound in only some UNION branches — a branch row's NULL key " +
            "would silently drop it from the join; bind them in every " +
            "branch or rename the subquery projection")
        if (qy.required.nonEmpty || i > 0) {
          val prior = qy.subqueries.take(i).flatMap(_.select).toSet
          val shared = sq.select.filter(v => reqVars.contains(v) || prior.contains(v))
          if (shared.isEmpty)
            fail(s"subquery ${i + 1} shares no plain variable with the " +
              "group's required pattern — an unjoined subquery would be a " +
              "cross product")
        }
      }
    }
    // ---- OPTIONAL-group FILTER checks: pre-filtering the group side
    // is exactly SPARQL's LeftJoin condition ONLY when the expression
    // reads the group's OWN variables, in the id space
    qy.optionalFilters.zip(qy.optionals).foreach { case (fs, group) =>
      val gVars = varsOf(group)
      def own(v: String, what: String): Unit =
        if (!gVars.contains(v))
          fail(s"a FILTER inside an OPTIONAL group may only read the " +
            s"group's own variables — $what ?$v is bound elsewhere; " +
            "move the condition to the outer group to filter ROWS instead " +
            "of conditioning the match")
      def checkIdSpace(e: FExpr): Unit = e match {
        case FBound(v)     => own(v, "BOUND over")
        case FCmp(l, _, r) =>
          Seq(l, r).foreach {
            case FTVar(n) => own(n, "operand")
            case _        => ()
          }
        case FNot(x)    => checkIdSpace(x)
        case FAnd(a, b) => checkIdSpace(a); checkIdSpace(b)
        case FOr(a, b)  => checkIdSpace(a); checkIdSpace(b)
        case _ => fail("FILTERs inside OPTIONAL are id-space only in this " +
          "fragment (= / != / BOUND over the group's variables) — " +
          "value-space conditions belong in a subquery or the outer group")
      }
      fs.foreach(checkIdSpace)
    }
    // the EXISTS/NOT EXISTS probes join BEFORE binds compute — a probe
    // naming a bind variable (or a subquery VALUE alias) would silently
    // not join / join nonsense
    val probeVars = (qy.exists ++ qy.notExists).flatMap(varsOf).toSet
    val valueAliases = qy.subqueryOutputs.filter(v =>
      kinds.get(v).exists(k => k == 'n' || k == 's'))
    val probeClash = (bindNames ++ valueAliases).filter(probeVars.contains)
    if (probeClash.nonEmpty)
      fail(s"FILTER EXISTS patterns cannot reference computed variable(s) " +
        s"${probeClash.mkString(", ")} — the probes join on node-id columns")
    // EXISTS / NOT EXISTS / MINUS compile to equi-semi/anti-joins on the
    // shared variables, and a NULL key (a shared variable bound only by
    // an OPTIONAL, or by only SOME union branches) never matches — where
    // SPARQL's substitution/compatibility semantics leave the variable
    // FREE: EXISTS would drop rows SPARQL keeps, NOT EXISTS keep rows
    // SPARQL removes. Require every shared variable to be never-NULL:
    // required-pattern-bound, bound by EVERY union branch, or a subquery
    // plain output (validated never-NULL). Exception: a MINUS group whose
    // ONLY shared variable may be NULL is exactly SPARQL's
    // disjoint-domain rule (the row survives), so single-shared-variable
    // MINUS stays accepted.
    val neverNull: Set[String] =
      reqVars ++ qy.subqueries.flatMap(_.select) ++
        qy.unions.flatMap(g => g.map(varsOf).reduce(_ & _))
    def checkProbeAnchors(groups: Seq[Seq[TriplePattern]], what: String,
                          minShared: Int): Unit =
      groups.foreach { g =>
        val shared = (varsOf(g) & (patternVarsAll ++ qy.subqueryOutputs)).toSeq.sorted
        val nullable = shared.filterNot(neverNull)
        if (shared.size >= minShared && nullable.nonEmpty)
          fail(s"$what shares variable(s) ${nullable.map("?" + _).mkString(", ")} " +
            "that may be unbound (OPTIONAL-only or partial-union binding) — " +
            "a NULL join key silently diverges from SPARQL's semantics; " +
            "anchor the variable in the required pattern")
      }
    checkProbeAnchors(qy.exists, "FILTER EXISTS", minShared = 1)
    checkProbeAnchors(qy.notExists, "FILTER NOT EXISTS", minShared = 1)
    checkProbeAnchors(qy.minuses, "MINUS", minShared = 2)
    (qy.projection.collect { case PAgg(call, _) => call } ++
      qy.havingAst.flatMap(havingCalls)).foreach {
      case AggCall(f @ ("SUM" | "AVG"), _, Some(v), _) if kinds.contains(v) =>
        fail(s"$f(?$v) aggregates the numeric VALUE space of RDF terms — " +
          "aggregate the base variable instead of the computed value")
      case AggCall("GROUP_CONCAT", _, Some(v), _) if kinds.get(v).contains('n') =>
        fail(s"GROUP_CONCAT(?$v) over a numeric computed value is not " +
          "supported — concatenation needs strings")
      case _ => ()
    }
    if (qy.form == "DESCRIBE") {
      val groupVars = varsOf(qy.required) ++ qy.optionals.flatMap(varsOf) ++
        qy.unions.flatten.flatMap(varsOf) ++ qy.subqueries.flatMap(_.select)
      val unbound = qy.describeVars.filterNot(groupVars.contains)
      if (unbound.nonEmpty)
        fail(s"DESCRIBE variable(s) ${unbound.mkString(", ")} are not bound " +
          "by the WHERE group")
    }
    if (qy.form == "CONSTRUCT") {
      qy.template.foreach(t => t.pred match {
        case V(_) | C(_) => ()
        case other => fail(s"property paths are not allowed in a CONSTRUCT " +
          s"template (it names OUTPUT edges, not matches): $other")
      })
      val groupVars = varsOf(qy.required) ++ qy.optionals.flatMap(varsOf) ++
        qy.unions.flatten.flatMap(varsOf) ++ qy.subqueries.flatMap(_.select)
      val unbound = varsOf(qy.template) -- groupVars
      if (unbound.nonEmpty)
        fail(s"CONSTRUCT template variable(s) ${unbound.mkString(", ")} are " +
          "not bound by the WHERE group")
    }
    val aliases = qy.projection.collect { case PAgg(_, a) => a }
    val dupAlias = (aliases ++ qy.select).groupBy(identity).collect {
      case (n, vs) if vs.sizeIs > 1 => n
    }
    if (dupAlias.nonEmpty)
      fail(s"duplicate SELECT name(s): ${dupAlias.mkString(", ")}")
    if (qy.isAggregate) {
      if (qy.projection.isEmpty)
        fail("SELECT * cannot be combined with GROUP BY / aggregates — " +
          "project the grouped variables explicitly")
      val bad = qy.select.filterNot(qy.groupBy.contains)
      if (bad.nonEmpty)
        fail(s"non-aggregate SELECT variable(s) ${bad.mkString(", ")} must " +
          "appear in GROUP BY")
    }
    // ORDER BY applies to the PROJECTED result (after DISTINCT, as in
    // SPARQL's modifier order); restrict it to result columns
    val outNames: Set[String] =
      if (qy.projection.isEmpty)
        varsOf(qy.required) ++ qy.optionals.flatMap(varsOf) ++
          qy.unions.flatten.flatMap(varsOf) ++ bindNames ++ qy.subqueryOutputs
      else qy.select.toSet ++ aliases
    qy.orderBy.foreach { case (v, _) =>
      if (!outNames.contains(v))
        fail(s"ORDER BY variable ?$v is not a result column — order by a " +
          "projected variable or aggregate alias")
    }
    val nonNumAgg = qy.projection.collect {
      case PAgg(AggCall(f, _, _, _), alias)
        if f != "COUNT" && f != "SUM" && f != "AVG" => alias
    }.toSet
    qy.orderKeysAst.foreach {
      case (Right(e), _) =>
        nvars(e).foreach { v =>
          if (!outNames.contains(v))
            fail(s"ORDER BY expression reads ?$v, which is not a result " +
              "column — order by projected variables or aggregate aliases")
          if (nonNumAgg(v))
            fail(s"ORDER BY expression reads ?$v, a non-numeric aggregate " +
              "alias — only COUNT/SUM/AVG aliases are numeric keys")
        }
        readsN(e).foreach { case (v, how) =>
          checkRead(v, how, "ORDER BY")
          checkPredRead(v, how, "an ORDER BY expression")
        }
      case _ => ()
    }
  }

  // ---------- execution ----------------------------------------------------

  /** A SUM/AVG argument's numeric value space at decimal(28,10):
    * integer-family and double/float/decimal literals both read as
    * decimal, so the ACCUMULATION is exact and ORDER-INDEPENDENT —
    * float sums differ run-to-run under parallel reduction; decimal
    * sums cannot. The single rounding happens once, at the end, when
    * the total is cast to double. Non-numeric terms read NULL. */
  private def numDecValue(v: String): Column = {
    val term = col(s"${v}_term")
    // try_cast, not cast: a long with >= 19 integral digits overflows
    // decimal(28,10), and under ANSI a plain cast would throw mid-job —
    // try_cast reads NULL, so the strict-error guard makes the GROUP's
    // aggregate unbound instead (error-means-unbound, same rule as any
    // non-numeric term)
    coalesce(TypedLiterals.asLong(term).try_cast("decimal(28,10)"),
      TypedLiterals.asDecimal(term, 28, 10))
  }

  /** SPARQL value-ordering key over a bound `${v}_term` struct: rank 0
    * = non-numeric terms (IRIs/bnodes/other literals — the kinds W3C
    * ordering puts BEFORE numeric literals), ordered among themselves
    * by id (deterministic where the spec leaves sub-ordering open);
    * rank 1 = numeric literals, ordered BY VALUE. MIN over an
    * all-numeric group is the numerically smallest term, MAX the
    * largest; all-IRI groups keep the id-pick exactly. The key is
    * NULL-free (rank disambiguates before the coalesced value), so
    * struct comparison is total. */
  private def termOrderKey(v: String): Column = {
    val term = col(s"${v}_term")
    val num = coalesce(TypedLiterals.asLong(term).cast("double"),
      TypedLiterals.asDouble(term))
    struct(when(num.isNotNull, 1).otherwise(0).as("r"),
      coalesce(num, lit(0.0)).as("n"), col(v).as("i"))
  }

  /** Aggregate compilation. COUNT family is codegen'd partial-agg
    * (map-side combine before the one group-key shuffle); GROUP_CONCAT
    * is collect_list/set — per-group state is O(group payload), so at
    * scale put it behind selective patterns, as with any SQL
    * string_agg. SAMPLE compiles to `min` and GROUP_CONCAT sorts — both
    * deliberate determinism choices where SPARQL leaves the result
    * engine-defined.
    *
    * MIN/MAX over a node-position pattern variable compile per the
    * overload: with the nodes table attached (`hybrid` contains the
    * variable), they pick by SPARQL VALUE ORDERING ([[termOrderKey]] —
    * numeric literals by value, everything else before them by id) and
    * return the winning term's ID (resolveTerms renders it); without
    * it, the documented id-space pick. The two coincide on any group
    * with no numeric literals, so attaching the nodes table never
    * changes a non-numeric result.
    *
    * SUM/AVG aggregate the NUMERIC VALUE SPACE via the bindValues
    * `_term` struct ([[numDecValue]]): exact decimal(28,10)
    * accumulation (order-independent, so engine- and
    * parallelism-reproducible), one final cast to double. SPARQL error
    * semantics are STRICT per the spec: a group containing any unbound
    * or non-numeric value yields NULL (unbound) for the whole
    * aggregate — the `count(num) = count(*)` guard — and the empty
    * global group sums to 0 (Sum({}) = 0, Avg({}) = 0). */
  private def compileAgg(a: AggCall, hybrid: Set[String] = Set.empty): Column = a match {
    case AggCall("COUNT", false, None, _)    => count(lit(1))
    case AggCall("COUNT", false, Some(v), _) => count(col(v))
    case AggCall("COUNT", true, Some(v), _)  => countDistinct(col(v))
    // a NULL binding (unmatched OPTIONAL) gets a NULL ordering key,
    // which min_by/max_by skip — the same NULL-ignoring contract as the
    // plain min/max picks
    case AggCall("MIN", _, Some(v), _) =>
      if (hybrid(v)) min_by(col(v), when(col(v).isNotNull, termOrderKey(v)))
      else min(col(v))
    case AggCall("MAX", _, Some(v), _) =>
      if (hybrid(v)) max_by(col(v), when(col(v).isNotNull, termOrderKey(v)))
      else max(col(v))
    case AggCall("SAMPLE", _, Some(v), _)    => min(col(v))
    case AggCall("GROUP_CONCAT", false, Some(v), sep) =>
      array_join(sort_array(collect_list(col(v))), sep)
    case AggCall("GROUP_CONCAT", true, Some(v), sep) =>
      array_join(sort_array(collect_set(col(v))), sep)
    case AggCall("SUM", dist, Some(v), _) =>
      val num = numDecValue(v)
      val s = if (dist) sum_distinct(num) else sum(num)
      when(count(num) === count(lit(1)),
        coalesce(s, lit(0).cast("decimal(38,10)"))).cast("double")
    case AggCall("AVG", dist, Some(v), _) =>
      val num = numDecValue(v)
      val s = if (dist) sum_distinct(num) else sum(num)
      val n = if (dist) countDistinct(num) else count(num)
      when(count(num) === count(lit(1)),
        when(n === 0, lit(0.0)).otherwise(s.cast("double") / n))
    case other => fail(s"unsupported aggregate $other")
  }

  private def havingCalls(e: HExpr): Seq[AggCall] = e match {
    case HCmp(call, _, _) => Seq(call)
    case HNot(x)          => havingCalls(x)
    case HAnd(a, b)       => havingCalls(a) ++ havingCalls(b)
    case HOr(a, b)        => havingCalls(a) ++ havingCalls(b)
  }

  private def compileH(e: HExpr, alias: Map[AggCall, String]): Column = e match {
    case HCmp(call, op, n) =>
      val c = col(alias(call))
      op match {
        case "="  => c === n
        case "!=" => c =!= n
        case "<"  => c < n
        case "<=" => c <= n
        case ">"  => c > n
        case ">=" => c >= n
      }
    case HNot(x)    => !compileH(x, alias)
    case HAnd(a, b) => compileH(a, alias) && compileH(b, alias)
    case HOr(a, b)  => compileH(a, alias) || compileH(b, alias)
  }

  /** GROUP BY + aggregates + HAVING over the matched bindings: ONE
    * hash-aggregate shuffle on the group variables (or a global
    * aggregate when GROUP BY is absent — SPARQL's implicit single
    * group); HAVING aggregates not already projected are computed in
    * the same pass under internal aliases and dropped after the
    * filter. */
  private def aggregate(matched: DataFrame, q: Query,
                        hybrid: Set[String] = Set.empty): DataFrame = {
    val projAggs = q.projection.collect { case PAgg(call, alias) => (call, alias) }
    val extra = q.havingAst.flatMap(havingCalls).distinct
      .filterNot(projAggs.map(_._1).contains)
      .zipWithIndex.map { case (call, i) => (call, s"_having_$i") }
    val all = projAggs ++ extra
    val agged =
      if (all.isEmpty)
        // SELECT ?g ... GROUP BY ?g with no aggregate calls: grouping
        // alone, i.e. the distinct group keys
        matched.select(q.groupBy.map(col): _*).distinct()
      else {
        val aggCols = all.map { case (call, alias) => compileAgg(call, hybrid).as(alias) }
        val grouped =
          if (q.groupBy.nonEmpty) matched.groupBy(q.groupBy.map(col): _*)
          else matched.groupBy()
        grouped.agg(aggCols.head, aggCols.tail: _*)
      }
    val aliasMap = all.toMap
    val hav = q.havingAst.foldLeft(agged)((df, h) => df.filter(compileH(h, aliasMap)))
    hav.select(q.projection.map {
      case PVar(n)        => col(n)
      case PAgg(_, alias) => col(alias)
    }: _*)
  }

  /** CONSTRUCT template instantiation: one projection of the bindings
    * per template triple (rows with an unbound template variable are
    * skipped, per SPARQL), unioned and DISTINCT'd — a CONSTRUCT result
    * is a GRAPH (a set of edges), and the distinct is the single
    * shuffle that makes it one. Output matches the engine's edges
    * convention: hashed node ids, raw predicate IRIs. */
  private def construct(matched: DataFrame, template: Seq[TriplePattern]): DataFrame = {
    def nodeCol(t: Bgp.TermPat): Column = t match {
      case V(n)  => col(n)
      case C(v)  => lit(v)
      case other => fail(s"unexpected template term $other")
    }
    val parts = template.map { t =>
      val varCols = Seq(t.subj, t.pred, t.obj).collect { case V(n) => col(n) }
      val kept = varCols.foldLeft(matched)((df, vc) => df.filter(vc.isNotNull))
      kept.select(nodeCol(t.subj).as("subj_id"), nodeCol(t.pred).as("pred"),
        nodeCol(t.obj).as("obj_id"))
    }
    parts.reduce(_ union _).distinct()
  }

  /** DESCRIBE evaluation. SPARQL leaves the description shape to the
    * implementation; this engine describes a node as ITS OUTGOING EDGES
    * — the forward Concise Bounded Description, whose bnode-closure
    * step is vacuous here because skolemization (E4) already promoted
    * every blank node to an IRI. The described-id set is the union of
    * the group bindings of each DESCRIBE variable (NULL bindings from
    * unmatched OPTIONALs are skipped — there is no term to describe)
    * and the constant ids; it is deduped to a dimension-sized relation,
    * then ONE left-semi equi-join selects the edges (AQE broadcasts the
    * id side when small), and the graph-set distinct makes the result a
    * graph. Output is the engine's edges convention
    * (subj_id, pred, obj_id). */
  private def describeEdges(edges: DataFrame, matched: Option[DataFrame],
                            q: Query): DataFrame = {
    val base = edges.select("subj_id", "pred", "obj_id")
    val varIds = matched.toSeq.flatMap(m => q.describeVars.map(v =>
      m.select(col(v).as("id")).filter(col("id").isNotNull)))
    val constIds =
      if (q.describeIds.isEmpty) Nil
      else {
        val spark = edges.sparkSession
        import spark.implicits._
        Seq(q.describeIds.toDF("id"))
      }
    val ids = (varIds ++ constIds).reduce(_ union _).distinct()
    base.join(ids, base("subj_id") === ids("id"), "left_semi").distinct()
  }

  /** Joins the N3 lexical form of each listed id column back onto a
    * query result — the human-readable exit from the hashed-id plane.
    * One LEFT equi-join per column against the dimension-sized nodes
    * projection (AQE broadcasts it); ids with no nodes row (computed
    * value columns, NULL unmatched-OPTIONAL bindings) pass through
    * unchanged. Each id column is REPLACED by its n3 rendering under
    * the same name, so the frame stays drop-in for downstream code. */
  def resolveTerms(result: DataFrame, nodes: DataFrame,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "resolveTerms needs at least one column")
    val missing = cols.filterNot(result.columns.contains)
    require(missing.isEmpty,
      s"resolveTerms column(s) ${missing.mkString(", ")} are not in the result")
    cols.foldLeft(result) { (df, v) =>
      val n3c = nodes.select(col("id").as(s"${v}__id"),
        Canonicalize.n3(struct(col("kind"), col("value"), col("lang"),
          col("dt"))).as(s"${v}__n3"))
      df.join(n3c, df(v) === n3c(s"${v}__id"), "left")
        .withColumn(v, coalesce(col(s"${v}__n3"), col(v)))
        .drop(s"${v}__id", s"${v}__n3")
    }
  }

  /** [[run]] for ASK queries, evaluated: true iff the group matches. */
  def ask(edges: DataFrame, queryString: String): Boolean = {
    val q = parse(queryString)
    require(q.form == "ASK", s"ask() takes an ASK query, got ${q.form}")
    run(edges, queryString).collect()(0).getBoolean(0)
  }

  /**
   * Parse and execute against an edges frame (subj_id, pred, obj_id).
   * Pipeline order follows SPARQL's algebra: pattern group -> EXISTS /
   * NOT EXISTS semi/anti-joins -> FILTERs -> VALUES selections ->
   * GROUP BY/aggregates -> HAVING -> projection -> DISTINCT ->
   * ORDER BY -> OFFSET -> LIMIT. An ORDER BY + LIMIT pair plans as
   * TakeOrderedAndProject — per-partition top-k then a single merge,
   * never a global sort.
   */
  def run(edges: DataFrame, queryString: String): DataFrame =
    runWith(edges, None, queryString)

  /** [[run]] with the D2 nodes table attached, enabling the VALUE-SPACE
    * surface: numeric FILTER comparisons (`FILTER(?n > 100)`), string
    * functions (STR/LANG/DATATYPE/STRSTARTS/STRENDS/CONTAINS, kind
    * tests) and SUM/AVG aggregation. Each such variable is
    * [[Bgp.bindValues]]-joined once before the filters apply (AQE
    * broadcasts the projected nodes side when it is dimension-sized);
    * the term columns are dropped again before projection. */
  def run(edges: DataFrame, nodes: DataFrame, queryString: String): DataFrame =
    runWith(edges, Some(nodes), queryString)

  private def runWith(edges: DataFrame, nodes: Option[DataFrame],
                      queryString: String): DataFrame = {
    val q = parse(queryString)
    if (q.fromGraphs.nonEmpty || q.fromNamed.nonEmpty)
      require(edges.columns.contains("graph"),
        "FROM / FROM NAMED need a 'graph' column on the edges frame — " +
          "derive one from lineage with Materialize.quads(edges)")
    runParsed(edges, nodes, applyDataset(q))
  }

  /** The CBD expansion of a DESCRIBE reads the DEFAULT graph — under a
    * dataset clause, the FROM merge (SPARQL 13.2). */
  private def describeScope(edges: DataFrame, q: Query): DataFrame =
    if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) edges
    else if (q.fromGraphs.isEmpty) edges.filter(lit(false))
    else edges.filter(col("graph").isin(q.fromGraphs: _*))

  /** Apply the SPARQL 13.2 dataset clause by PATTERN REWRITE: every
    * non-GRAPH pattern scopes to the FROM merge (the query's default
    * graph), every GRAPH pattern to the FROM NAMED set — each a pushed
    * IN-filter on the raw graph column ([[Bgp.GraphIn]]); an empty side
    * matches nothing, and a constant `GRAPH <g>` outside the named set
    * is statically empty. Subqueries inherit the outer dataset. */
  private def applyDataset(q: Query): Query = {
    if (q.fromGraphs.isEmpty && q.fromNamed.isEmpty) return q
    def scope(p: TriplePattern): TriplePattern = p.graph match {
      case None => p.copy(graph = Some(Bgp.GraphIn(q.fromGraphs, None)))
      case Some(C(g)) =>
        if (q.fromNamed.contains(g)) p
        else p.copy(graph = Some(Bgp.GraphIn(Nil, None)))
      case Some(V(n)) => p.copy(graph = Some(Bgp.GraphIn(q.fromNamed, Some(n))))
      case Some(_)    => p // unreachable: parse produces V/C graphs only
    }
    def sq(ps: Seq[TriplePattern]) = ps.map(scope)
    q.copy(required = sq(q.required), optionals = q.optionals.map(sq),
      minuses = q.minuses.map(sq), unions = q.unions.map(_.map(sq)),
      exists = q.exists.map(sq), notExists = q.notExists.map(sq),
      subqueries = q.subqueries.map(s => applyDataset(
        s.copy(fromGraphs = q.fromGraphs, fromNamed = q.fromNamed))))
  }

  private def runParsed(edges: DataFrame, nodes: Option[DataFrame],
                        q: Query): DataFrame = {
    if (q.form == "DESCRIBE" && q.required.isEmpty && q.unions.isEmpty &&
        q.subqueries.isEmpty)
      return describeEdges(describeScope(edges, q), None, q) // constant-only
    // subqueries evaluate bottom-up (recursively through this same
    // pipeline), then inner-join the group on their shared plain
    // variables — validated non-NULL anchors, so bag semantics match
    // SPARQL's join of solution mappings
    val subDfs = q.subqueries.map(sq => runParsed(edges, nodes, sq))
    def joinSubs(base: DataFrame, subs: Seq[DataFrame]): DataFrame =
      subs.foldLeft(base) { (df, sdf) =>
        val shared = sdf.columns.filter(df.columns.contains).toSeq
        df.join(sdf, shared, "inner")
      }
    // a UNION group joins the required bindings on its shared variables
    // (validated every-branch-bound, so the equi-join keys are never
    // NULL); in the well-designed fragment the join commutes with the
    // OPTIONAL left-joins (each multiplies rows by a factor of the
    // required-side variables only), so it composes after them
    def joinUnions(base: DataFrame): DataFrame =
      q.unions.foldLeft(base) { (df, branches) =>
        val r = Bgp.matchUnion(edges, branches)
        val shared = r.columns.filter(df.columns.contains).toSeq
        df.join(r, shared, "inner")
      }
    val grouped =
      if (q.required.isEmpty && q.unions.nonEmpty)
        Bgp.matchUnion(edges, q.unions.head) // pure union group
      else if (q.required.isEmpty && q.subqueries.nonEmpty)
        joinSubs(subDfs.head, subDfs.tail) // subquery-only group
      else joinSubs(Bgp.applyMinus(edges,
        joinUnions(Bgp.matchWithOptional(edges, q.required, q.optionals, Nil,
          q.optionalFilters.zip(q.optionals).map { case (fs, group) =>
            // an OPTIONAL group's own predicate-position variables bind
            // raw IRIs — their constants must compile raw, like any
            // pred-space comparison
            val gk = group.flatMap(p => p.pred match {
              case V(n) => Seq(n -> 'p'); case _ => Nil
            }).toMap
            fs.map(compileF(_, gk))
          })), q.minuses),
        subDfs)
    val probed = Bgp.applyExists(edges,
      Bgp.applyExists(edges, grouped, q.exists), q.notExists, negate = true)
    val kinds = q.compileKinds
    // BIND columns are plain values, and predicate-position variables
    // carry their raw IRI directly — only NODE-position pattern
    // variables read in a value space need the nodes-table term join
    val filterVars = q.filterTermVars.filterNot(kinds.contains)
    val bindInVars = q.bindTermVars.filterNot(kinds.contains)
    // MIN/MAX picks upgrade to SPARQL value ordering when the nodes
    // table is attached — their term structs must reach the aggregation
    val hybridVars = if (nodes.isDefined) q.minmaxAggVars else Nil
    val aggVars = (q.numericAggVars ++ hybridVars).distinct
    val termVars = (filterVars ++ bindInVars ++ aggVars).distinct
    val bound =
      if (termVars.isEmpty) probed
      else Bgp.bindValues(probed, nodes.getOrElse(fail(
        "value-space FILTERs, BIND expressions and SUM/AVG read the value " +
          "space — pass the nodes table: Sparql.run(edges, nodes, query)")),
        termVars)
    // BINDs compute after the value joins and before the FILTERs (FILTER
    // is group-scoped in SPARQL — its position inside the group is
    // irrelevant), in declaration order so later binds read earlier ones
    val withBinds = q.binds.foldLeft(bound) { case (df, (n, b)) =>
      df.withColumn(n, compileB(b, kinds))
    }
    val filtered = q.filters.foldLeft(withBinds)(_ filter _)
    // filter- and bind-input term structs are spent; SUM/AVG structs
    // must survive until the aggregation step reads them
    val matched0 = (filterVars ++ bindInVars).distinct.filterNot(aggVars.contains)
      .foldLeft(filtered)((df, v) => df.drop(s"${v}_term"))
    val matched = q.values.foldLeft(matched0) { case (df, (vs, rows)) =>
      Bgp.applyValues(df, vs, rows)
    }
    if (q.form == "ASK")
      // one boolean row; limit(1) keeps the plan a first-match probe —
      // Spark stops scanning partitions once a row surfaces
      return matched.limit(1).agg((count(lit(1)) === 1).as("ask"))
    if (q.form == "CONSTRUCT") return construct(matched, q.template)
    if (q.form == "DESCRIBE")
      return describeEdges(describeScope(edges, q), Some(matched), q)
    val projected =
      if (q.isAggregate) aggregate(matched, q, hybridVars.toSet)
      else if (q.projection.isEmpty) {
        // SELECT *: blank-node bindings are non-distinguished — they
        // join, but never project (SPARQL 16.2)
        val keep = matched.columns.filterNot(_.startsWith("_bn_"))
        if (keep.length == matched.columns.length) matched
        else matched.select(keep.map(col).toIndexedSeq: _*)
      }
      else matched.select(q.select.distinct.map(col): _*)
    val dist = if (q.distinct) projected.distinct() else projected
    // ORDER BY over a node-space variable with the nodes table attached
    // sorts by SPARQL value ordering (termOrderKey: numeric literals by
    // value, other terms before them by id) — one broadcast-able term
    // join per such column, dropped after the sort; everything else
    // (aliases, computed values, pred-space raw IRIs) sorts as-is
    val keySpecs: Seq[(Either[String, NExpr], Boolean)] =
      if (q.orderKeysAst.nonEmpty) q.orderKeysAst
      else q.orderBy.map { case (v, asc) => (Left(v), asc) }
    val ordered =
      if (keySpecs.isEmpty) dist
      else {
        // expression keys read pattern variables through their _term
        // structs — the value read is only decidable with the nodes
        // table (an id-sort fallback would be meaningless for a
        // computed key, unlike a plain variable's documented id order)
        val exprNodeVars = keySpecs.collect { case (Right(e), _) => nvars(e) }
          .flatten.filter(v => q.nodeSpaceVars(v) && dist.columns.contains(v))
        require(exprNodeVars.isEmpty || nodes.isDefined,
          "ORDER BY expressions over pattern variables need the nodes " +
            "table — use run(edges, nodes, query)")
        val hybridOrd = nodes match {
          case Some(_) => (keySpecs.collect { case (Left(v), _) => v }
            .filter(v => q.nodeSpaceVars(v) && dist.columns.contains(v)) ++
            exprNodeVars).distinct
          case None => Nil
        }
        val base =
          if (hybridOrd.isEmpty) dist
          else Bgp.bindValues(dist, nodes.get, hybridOrd)
        val keys = keySpecs.map {
          case (Left(v), asc) =>
            val k = if (hybridOrd.contains(v)) termOrderKey(v) else col(v)
            if (asc) k.asc else k.desc
          case (Right(e), asc) =>
            // the query's OWN aggregate aliases are plain numeric
            // columns by the time the sort runs (post-aggregation)
            val ownAgg = q.projection.collect {
              case PAgg(AggCall("COUNT" | "SUM" | "AVG", _, _, _), alias) =>
                alias -> 'n'
            }.toMap
            val k = numValue(e, q.valueKinds ++ ownAgg)
            if (asc) k.asc else k.desc
        }
        hybridOrd.foldLeft(base.orderBy(keys: _*))((df, v) => df.drop(s"${v}_term"))
      }
    val off = q.offset.fold(ordered)(o => ordered.offset(o.toInt))
    q.limit.fold(off)(l => off.limit(l.toInt))
  }
}
