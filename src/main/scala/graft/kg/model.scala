package graft.kg

/**
 * Row models for the KG-construction pipeline.
 *
 * Input contract (BASELINE.json input_hint): a table of source files
 * `(repo, path, commit, lang, content)`. `lang` selects the parse mode:
 * "nt" = strict, "nt-lenient" = lenient (log-and-skip + Turtle long
 * literals), mirroring the reference's StrictNtParser / NonStrictNtParser
 * companions (NtParser.scala:824-897).
 */
final case class CorpusRow(repo: String, path: String, commit: String, lang: String, content: String)

/** One emitted triple with full lineage back to its source line. */
final case class TripleRow(
    subj: RdfTerm,
    pred: String,
    obj: RdfTerm,
    repo: String,
    path: String,
    commit: String,
    line: Int)

/**
 * One parse failure with lineage; `message` is the first line of the
 * reference-format error text, `charPos` the 1-based char position.
 */
final case class ParseErrorRow(
    repo: String,
    path: String,
    commit: String,
    line: Int,
    charPos: Int,
    message: String)

/**
 * Flat union row emitted by the parse kernel so triples AND errors come
 * out of a single pass over the corpus. Flat (no nested structs) because
 * the nested case-class encoder allocates an InternalRow per term; the
 * nested TripleRow shape is assembled afterwards with codegen'd
 * `struct()` (TripleExtract.assembleTriples). At scale the staging write
 * partitions on `err` so the two sides land in separate parquet
 * directories without a second scan.
 */
final case class ParsedLine(
    err: Boolean,
    repo: String,
    path: String,
    commit: String,
    line: Int,
    skind: Byte,
    subj: String,
    pred: String,
    okind: Byte,
    obj: String,
    lang: String,
    dt: String,
    charPos: Int,
    message: String)
