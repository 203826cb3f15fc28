package graft.core

import java.sql.Timestamp

/**
 * Typed row schemas for the KG-construction pipeline.
 *
 * The input table shape follows BASELINE.json `input_hint`: an Iceberg-style
 * table of Common-Crawl-like web pages. Downstream rows are the typed
 * Datasets the stages exchange (pages -> sentences -> tagged tokens ->
 * mentions -> link edges -> triples), mirroring the reference dataflow
 * (NeuralNERMono/NeuralNER.py:314-335 reads sentences, tags tokens, emits
 * CoNLL rows; we add the KG stages mandated by the north_star).
 */

/** One web page. `text` is the extraction target: extractText(html) == text
  * byte-identically per url (the per-row invariant). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One sentence of one page, whitespace-tokenized
  * (reference: utilsLocal.py:184-220 readUnlabeledData semantics). */
final case class Sentence(
    url: String,
    lang: String,
    sentIdx: Int,
    tokens: Seq[String]
)

/** One token with its predicted (and optionally gold) tag — the analog of a
  * CoNLL output line `token gold PRED` (NeuralNERMono/NeuralNER.py:325-333). */
final case class TaggedToken(
    url: String,
    lang: String,
    sentIdx: Int,
    tokIdx: Int,
    token: String,
    gold: String,
    pred: String
)

/** A BIOES-assembled entity mention span. */
final case class Mention(
    url: String,
    lang: String,
    sentIdx: Int,
    begin: Int, // token index, inclusive
    end: Int,   // token index, exclusive
    surface: String,
    entityType: String
)

/** Candidate/selected link: mention surface -> entity id with a score. */
final case class LinkEdge(
    url: String,
    lang: String,
    sentIdx: Int,
    begin: Int,
    surface: String,
    entityId: Long,
    score: Double
)

/** A knowledge-graph triple; subj/obj are canonical entity ids. */
final case class Triple(
    subj: Long,
    pred: String,
    obj: Long,
    lang: String,
    url: String,
    sentIdx: Int
)

/** Per-partition lineage/metrics row (north_rule: "per-partition lineage +
  * metrics"). One row per (stage, partition) describing what was processed. */
final case class LineageRow(
    stage: String,
    partitionId: Int,
    rowsIn: Long,
    rowsOut: Long,
    wallMs: Long,
    detail: String
)
