package graft.golden

import graft.functions.Xxh64
import graft.core.{LinkEdge, Mention, Triple}
import graft.gen.CorpusGen
import graft.ner.{Models, NerStage}
import graft.ops.{Multimodal, TextStats}

/**
 * Sequential, single-threaded oracle twins of the distributed queries — the
 * independent goldens behind the driver's DuckDB compare for the operators
 * no SQL can express (LSH families over Spark's hash space, the NER
 * pipeline). Everything here is plain driver-side Scala: a straight
 * scan-order loop per document, NaiveKernel (the dense-math kernel twin)
 * for inference, a recursive union-find for canonicalization, and Xxh64
 * (an independent XXH64 implementation, property-tested equal to Spark's
 * xxhash64) for the hash families. No Spark execution happens here; Spark
 * is used only by GoldenGen to read/write parquet.
 *
 * Output row shapes mirror the SparkEntry queries exactly (same column
 * names and value semantics) so the driver's sorted-row hash compare is
 * meaningful.
 */
object SequentialTwin {

  final case class Doc(docId: Long, text: String, lang: String, source: String)

  def url(d: Doc): String = s"https://crawl.example.org/${d.lang}/${d.source}/doc${d.docId}"

  /** Spark's split(text, " ") keeps trailing empties — so must the twin. */
  def splitKeepAll(text: String): Array[String] = text.split(" ", -1)

  /** Spark Round(double, scale) semantics (HALF_UP over the decimal form). */
  def sparkRound(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------- sentences

  /**
   * INDEPENDENT minimal HTML -> text extraction for the generated corpus
   * pages — a different decomposition than the production single-scan state
   * machine (`TextExtract.extractTextStr`): locate the body, cut the
   * trailer comment, split on the `</p>` block structure, invert
   * `escapeHtml` entity-by-entity (lt/gt first, amp LAST — the inverse of
   * the escape order), then per line collapse whitespace runs and drop
   * blanks. GoldenTwinSpec proves it byte-equal to the production extractor
   * over the full corpus and on adversarial strings, so the golden
   * sentence/mention/triple fixtures no longer share the production
   * extractor code path.
   */
  def extractGeneratedPage(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val bodyAt = s.indexOf("<body>")
    require(bodyAt >= 0, "generated page without <body>")
    val afterBody = s.substring(bodyAt + "<body>".length)
    val commentAt = afterBody.indexOf("<!--") // raw '<' cannot occur in escaped text
    val endAt = if (commentAt >= 0) commentAt else afterBody.indexOf("</body>")
    val body = afterBody.substring(0, endAt)
    def unescape(x: String): String =
      x.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    body.split("</p>", -1).iterator
      .map(_.stripPrefix("<p>"))
      .map(unescape)
      .flatMap(_.split("[\n\r]", -1).iterator
        .map(_.split("[ \t\u00A0]+", -1).filter(_.nonEmpty).mkString(" ")))  // space/tab/NBSP, as production
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /**
   * INDEPENDENT sentence splitter — the production rules re-derived from
   * `TextExtract.sentences`' SPEC, not its code: a newline always ends a
   * sentence; within a line, a token ending in '.', '!', '?' or the
   * devanagari danda ends the sentence; tokens come from splitting on
   * single spaces with empties dropped; blank lines contribute nothing.
   * Implemented as regex split + terminator-regex fold (vs production's
   * allocation-light char scans); GoldenTwinSpec proves equality on the
   * full corpus and adversarial strings, closing the last golden-twin
   * circularity (the NER fixtures no longer touch production splitting).
   */
  def twinSentences(text: String): Seq[Seq[String]] =
    if (text.isEmpty) Nil
    else {
      val term = java.util.regex.Pattern.compile(".*[.!?।]$")
      text.split("\n", -1).toSeq.filter(_.nonEmpty).flatMap { line =>
        val out = Vector.newBuilder[Vector[String]]
        var cur = Vector.empty[String]
        line.split(" ", -1).iterator.filter(_.nonEmpty).foreach { t =>
          cur = cur :+ t
          if (term.matcher(t).matches()) { out += cur; cur = Vector.empty }
        }
        if (cur.nonEmpty) out += cur
        out.result()
      }
    }

  /** (url, lang, sentIdx, tokens) per sentence, full extraction chain —
    * twin extractor + twin splitter (no production code on this path). */
  def sentences(docs: Seq[Doc]): Seq[(String, String, Int, IndexedSeq[String])] =
    docs.flatMap { d =>
      val text = extractGeneratedPage(CorpusGen.htmlFor(d.docId, d.text, d.lang, d.source))
      twinSentences(text).zipWithIndex.map { case (toks, i) =>
        (url(d), d.lang, i, toks.toIndexedSeq)
      }
    }

  /** q41 rows: (url, sentIdx, n_tokens). */
  def q41Sentences(docs: Seq[Doc]): Seq[(String, Int, Int)] =
    sentences(docs).map { case (u, _, i, toks) => (u, i, toks.length) }

  // ------------------------------------------------------------------- NER

  final case class TaggedSent(url: String, lang: String, sentIdx: Int,
                              tokens: IndexedSeq[String], preds: IndexedSeq[String])

  /** Greedy and Viterbi taggings in one pass (one BiLSTM per sentence). */
  def tagBoth(docs: Seq[Doc], models: Map[String, Models.LangModel]): (Seq[TaggedSent], Seq[TaggedSent]) = {
    val both = sentences(docs).map { case (u, lang, i, toks) =>
      val m = models.getOrElse(lang, models.getOrElse("*", models.head._2))
      def toTags(ids: Array[Int]): IndexedSeq[String] = ids.toIndexedSeq.map(id =>
        m.tagVocab.getIndex(id).getOrElse("o").toUpperCase(java.util.Locale.ROOT))
      if (toks.isEmpty) {
        val t = TaggedSent(u, lang, i, toks, IndexedSeq.empty)
        (t, t)
      } else {
        val hidden = NaiveKernel.hiddenStates(toks, m.inputVocab, m.charVocab, m.weights)
        val g = NaiveKernel.greedyFromHidden(hidden, m.weights)._1
        val v = NaiveKernel.viterbiFromHidden(hidden, m.weights)
        (TaggedSent(u, lang, i, toks, toTags(g)), TaggedSent(u, lang, i, toks, toTags(v)))
      }
    }
    (both.map(_._1), both.map(_._2))
  }

  def mentions(tagged: Seq[TaggedSent]): Seq[Mention] =
    tagged.flatMap { s =>
      // PerlChunker: the perl scorer's literal transition tables, not the
      // production Bioes condensation (GoldenTwinSpec proves them equal)
      PerlChunker.spans(s.preds).map { sp =>
        Mention(s.url, s.lang, s.sentIdx, sp.begin, sp.end,
          s.tokens.slice(sp.begin, sp.end).mkString(" "), sp.tpe)
      }
    }

  /** q43 rows: (lang, pred, n) over per-token tag counts. */
  def q43TagCounts(tagged: Seq[TaggedSent]): Seq[(String, String, Long)] =
    tagged.flatMap(s => s.preds.map(p => (s.lang, p)))
      .groupBy(identity).map { case ((lang, pred), xs) => (lang, pred, xs.size.toLong) }
      .toSeq

  // ------------------------------------------------- alias dict / link / KG

  /** The twin's OWN alias machinery, re-derived from the documented spec
    * rather than shared with `link.EntityLink` (equality proven in
    * GoldenTwinSpec): plural stem drops a trailing 's' from words longer
    * than 4; prefix stem is the first 4 code units; entity id is standard
    * FNV-1a 64 (offset 0xcbf29ce484222325, prime 0x100000001b3) over the
    * UTF-16 units of "ent:" + candidate, sign-masked. */
  def twinStem(s: String): String =
    if (s.length > 4 && s.endsWith("s")) s.dropRight(1) else s

  def twinPrefixStem(s: String): String = s.take(4)

  def twinEntityId(surface: String): Long = {
    var h = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
    ("ent:" + surface).foreach { c => h ^= c; h *= 0x100000001b3L }
    h & Long.MaxValue
  }

  /** Alias dictionary twin of EntityLink.aliasDict: per distinct lowercased
    * corpus token, candidates (self 1.0, stem 0.5, prefix-stem 0.25). */
  def aliasDict(docs: Seq[Doc]): scala.collection.SeqMap[String, Seq[(Long, Double)]] = {
    val aliases = scala.collection.mutable.LinkedHashSet.empty[String]
    sentences(docs).foreach { case (_, _, _, toks) =>
      toks.foreach(t => aliases += t.toLowerCase(java.util.Locale.ROOT))
    }
    val b = scala.collection.immutable.VectorMap.newBuilder[String, Seq[(Long, Double)]]
    aliases.foreach { a =>
      val cands = scala.collection.mutable.LinkedHashMap(a -> 1.0)
      val st = twinStem(a)
      if (!cands.contains(st)) cands(st) = 0.5
      val pf = twinPrefixStem(a)
      if (!cands.contains(pf)) cands(pf) = 0.25
      b += a -> cands.iterator.map { case (c, p) => (twinEntityId(c), p) }.toSeq
    }
    b.result()
  }

  /** Best entity per alias: max prior, then min entity id. */
  def bestEntity(cands: Seq[(Long, Double)]): Long =
    cands.maxBy { case (id, p) => (p, -id) }._1

  def q44Linked(tagged: Seq[TaggedSent], dict: scala.collection.SeqMap[String, Seq[(Long, Double)]]): Seq[LinkEdge] =
    mentions(tagged).flatMap { m =>
      val alias = splitKeepAll(m.surface)(0).toLowerCase(java.util.Locale.ROOT)
      dict.get(alias).map { cands =>
        val (id, prior) = cands.maxBy { case (cid, p) => (p, -cid) }
        LinkEdge(m.url, m.lang, m.sentIdx, m.begin, m.surface, id, prior)
      }
    }

  /** Union-find canonicalization over the dict's alias-merge edges
    * (min-id <-> max-id per alias with >1 distinct candidate id). Returns
    * (canonOf, nNodes, nComponents). */
  final class Canon(dict: scala.collection.SeqMap[String, Seq[(Long, Double)]]) {
    private val parent = scala.collection.mutable.Map.empty[Long, Long]
    private def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val edges: Seq[(Long, Long)] = dict.valuesIterator.flatMap { cands =>
      val ids = cands.map(_._1)
      if (ids.min != ids.max) Some((ids.min, ids.max)) else None
    }.toSeq
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes: Seq[Long] = edges.flatMap(e => Seq(e._1, e._2)).distinct
    private val compMin: Map[Long, Long] =
      nodes.groupBy(find).map { case (root, ns) => root -> ns.min }
    private val nodeSet = nodes.toSet
    def canon(id: Long): Long = if (nodeSet.contains(id)) compMin(find(id)) else id
    def nNodes: Long = nodes.size.toLong
    def nComponents: Long = nodes.map(find).distinct.size.toLong
  }

  /** q47 rows (a MULTISET — duplicates preserved, unlike a Set compare). */
  def q47Triples(tagged: Seq[TaggedSent],
                 dict: scala.collection.SeqMap[String, Seq[(Long, Double)]],
                 canon: Canon): Seq[Triple] = {
    val lex = NerStage.defaultPredicateLexicon
    val best = dict.map { case (a, cands) => a -> bestEntity(cands) }
    tagged.flatMap { s =>
      val sps = PerlChunker.spans(s.preds)
      val toks = s.tokens
      (0 until math.max(0, sps.length - 1)).flatMap { i =>
        val a = sps(i); val b = sps(i + 1)
        if (b.begin - a.end > 10) None
        else {
          val between = toks.slice(a.end, b.begin)
          val pred = between.find(t => lex.contains(t.toLowerCase(java.util.Locale.ROOT)))
            .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("related_to")
          val subjAlias = toks.slice(a.begin, a.end).head.toLowerCase(java.util.Locale.ROOT)
          val objAlias = toks.slice(b.begin, b.end).head.toLowerCase(java.util.Locale.ROOT)
          for (sId <- best.get(subjAlias); oId <- best.get(objAlias))
            yield Triple(canon.canon(sId), pred, canon.canon(oId), s.lang, s.url, s.sentIdx)
        }
      }
    }
  }

  /** q151: coherence-reranked collective linking — per mention the
    * candidate elected by (KG-coherence DESC, prior DESC, entity_id ASC),
    * where coherence counts the page's distinct canonical exact-match
    * entities (own canon excluded) sharing an undirected edge with the
    * candidate's canon in the pass-1 triple graph. Straight nested loops
    * over driver maps — no shared code with EntityLink.linkCoherent. */
  def q151CoherentLinking(tagged: Seq[TaggedSent],
      dict: scala.collection.SeqMap[String, Seq[(Long, Double)]],
      canon: Canon): Seq[(String, String, Int, Int, String, Long, Double, Long)] = {
    val edges: Set[(Long, Long)] = q47Triples(tagged, dict, canon).iterator
      .filter(t => t.subj != t.obj)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj))).toSet
    val ms = mentions(tagged)
    def aliasOf(m: Mention): String =
      splitKeepAll(m.surface)(0).toLowerCase(java.util.Locale.ROOT)
    // page context: canonical exact-match entity per distinct dict alias
    // flatMap over the exact-match lookup: an alias whose candidate list
    // has no prior-1.0 entry contributes no context entity (mirrors
    // production linkCoherent instead of throwing NoSuchElementException)
    val ctxByUrl: Map[String, Set[Long]] = ms.groupBy(_.url).map { case (u, mm) =>
      u -> mm.iterator.map(aliasOf).flatMap(a =>
        dict.get(a).toSeq.flatMap(cands =>
          cands.find(_._2 == 1.0).map(c => canon.canon(c._1)))).toSet
    }
    ms.flatMap { m =>
      dict.get(aliasOf(m)).map { cands =>
        val ctx = ctxByUrl(m.url)
        val best = cands.map { case (id, p) =>
          val c = canon.canon(id)
          val coh = ctx.count(e =>
            e != c && edges.contains((math.min(e, c), math.max(e, c)))).toLong
          (id, p, coh)
        }.maxBy { case (id, p, coh) => (coh, p, -id) }
        (m.url, m.lang, m.sentIdx, m.begin, m.surface, best._1, best._2, best._3)
      }
    }
  }

  /** q160: fuzzy-candidate char-CNN cosine rerank — brute-force bigram
    * Jaccard blocking (>= pct) between the deterministic perturbations of
    * the mention head-aliases and the dictionary keys, then NaiveKernel
    * DENSE char-CNN features + double cosine, electing
    * (cosine DESC, candidate ASC) per query. Same model weights as the
    * production operator; entirely different math path (dense one-hot
    * convolution vs production's bit-addressed kernel). */
  def q160CharCosineRerank(tagged: Seq[TaggedSent],
      dict: scala.collection.SeqMap[String, Seq[(Long, Double)]],
      model: graft.ner.Models.LangModel,
      minJaccardPct: Int = 60): Seq[(String, String, Double)] = {
    def bigrams(s: String): Set[String] =
      if (s.length < 2) Set.empty else s.sliding(2).toSet
    val perturbed = mentions(tagged)
      .map(m => splitKeepAll(m.surface)(0).toLowerCase(java.util.Locale.ROOT))
      .distinct
      .map(a => if (a.length > 3) a.dropRight(1) else a + "x")
      .distinct
    val aliases = dict.keys.toSeq
    // dense one-hot char matrix + double convolution (the NaiveKernel
    // decomposition, in double): scanning j ascending IS the canonical
    // (position, vocab-index) term order, so the sums are bit-identical
    // to production's sorted-bit accumulation
    val w = model.weights
    val memo = scala.collection.mutable.HashMap.empty[String, Array[Double]]
    def vec(s: String): Array[Double] = memo.getOrElseUpdate(s, {
      val V = w.charVocabSize
      val cps = {
        val n = s.codePointCount(0, s.length)
        val out = new Array[String](n)
        var i = 0; var k = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          out(k) = new String(Character.toChars(cp))
          k += 1; i += Character.charCount(cp)
        }
        out
      }
      val cMax = math.max(cps.length, w.maxWidth)
      val dense = new Array[Double](cMax * V)
      model.charVocab.getWord("<S>").foreach(id => dense(id) = 1.0)
      var k = 0
      while (k < cps.length) {
        if (k < cMax - 1)
          model.charVocab.tokToInd.get(cps(k))
            .foreach(id => dense((k + 1) * V + id) = 1.0)
        k += 1
      }
      if (cps.length < cMax)
        model.charVocab.getWord("</S>").foreach(id =>
          dense(cps.length * V + id) = 1.0)
      val out = new Array[Double](w.nWidths * w.numFilters)
      for (wi <- 0 until w.nWidths) {
        val n = w.minWidth + wi
        val kernelLen = n * V
        val nPos = cMax - n + 1
        for (f <- 0 until w.numFilters) {
          var best = Double.NegativeInfinity
          for (p <- 0 until nPos) {
            var acc = w.convB(wi)(f).toDouble
            var j = 0
            while (j < kernelLen) {
              acc += w.convW(wi)(f)(j).toDouble * dense(p * V + j)
              j += 1
            }
            if (acc > best) best = acc
          }
          out(wi * w.numFilters + f) = best
        }
      }
      out
    })
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    perturbed.flatMap { q =>
      val gq = bigrams(q)
      val cands = aliases.filter { c =>
        val gc = bigrams(c)
        gq.nonEmpty && gc.nonEmpty && {
          val inter = (gq & gc).size
          val uni = (gq | gc).size
          inter * 100 >= uni * minJaccardPct
        }
      }
      if (cands.isEmpty) None
      else {
        val best = cands.map(c => (c, cosine(vec(q), vec(c))))
          .minBy { case (c, cos) => (-cos, c) }
        Some((q, best._1, best._2))
      }
    }
  }

  /** q165: truss decomposition twin — the k-LEVEL peel straight from the
    * definition (for k = 3, 4, ... repeatedly delete every edge closing
    * fewer than k−2 triangles among survivors; deleted edges take
    * trussness k−1), recomputing neighbor sets from scratch each round.
    * A genuinely different algorithm from BOTH production paths (the
    * distributed level-peel shares the schedule but not the code; the
    * driver fallback is the min-support bucket-queue peel). */
  def q165Trussness(tagged: Seq[TaggedSent],
      dict: scala.collection.SeqMap[String, Seq[(Long, Double)]],
      canon: Canon): Seq[(Long, Long, Long)] = {
    val edges = q47Triples(tagged, dict, canon).iterator
      .filter(t => t.subj != t.obj)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj)))
      .toSet
    var alive = edges
    val truss = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var k = 3
    while (alive.nonEmpty) {
      var changed = true
      while (changed && alive.nonEmpty) {
        val nbrMap = alive.toSeq
          .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
          .groupBy(_._1).map { case (n, vs) => n -> vs.map(_._2).toSet }
        val drops = alive.filter { case (a, b) =>
          (nbrMap(a) & nbrMap(b)).size < k - 2 }
        if (drops.isEmpty) changed = false
        else { drops.foreach(e => truss(e) = (k - 1).toLong); alive --= drops }
      }
      k += 1
    }
    truss.iterator.map { case ((a, b), t) => (a, b, t) }.toSeq
  }

  /** q48 rows: conlleval-style P/R/F of `pred` mentions vs `gold` mentions —
    * per entityType plus the ALL row, SpanEval.prf arithmetic. */
  def q48Prf(pred: Seq[Mention], gold: Seq[Mention]): Seq[(String, Long, Long, Long, Double, Double, Double)] = {
    def key(m: Mention) = (m.url, m.sentIdx, m.begin, m.end, m.entityType)
    val pKeys = pred.map(key).toSet
    val gKeys = gold.map(key).toSet
    val types = (pred.map(_.entityType) ++ gold.map(_.entityType)).distinct
    def row(tpe: String, correct: Long, guessed: Long, gold0: Long) = {
      val p = if (guessed > 0) correct.toDouble / guessed else 0.0
      val r = if (gold0 > 0) correct.toDouble / gold0 else 0.0
      val f = if (p + r > 0) 2 * p * r / (p + r) else 0.0
      (tpe, correct, guessed, gold0, sparkRound(p, 6), sparkRound(r, 6), sparkRound(f, 6))
    }
    val perType = types.map { t =>
      val c = pKeys.count(k => k._5 == t && gKeys.contains(k)).toLong
      val gu = pred.count(_.entityType == t).toLong
      val go = gold.count(_.entityType == t).toLong
      (t, c, gu, go)
    }
    val all = ("ALL", perType.map(_._2).sum, perType.map(_._3).sum, perType.map(_._4).sum)
    (perType :+ all).map { case (t, c, gu, go) => row(t, c, gu, go) }
  }

  /** q79: sequential fixed-point PageRank twin over the KG's (subj, obj)
    * edge set — the identical integer recurrence as kg.PageRank.run
    * (rank_0 = scale; rank' = 15*scale/100 + Σ (rank*85) / (outdeg*100),
    * floor division, self-loops and duplicate edges dropped), so the
    * distributed result must match BIT-FOR-BIT: every term is a long and
    * long addition is order-free. */
  def q79PageRank(triples: Seq[Triple], iterations: Int = 10,
                  scale: Long = 1000000000L): Seq[(Long, Long)] = {
    val edges = triples.map(t => (t.subj, t.obj)).filter(e => e._1 != e._2).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = 15L * scale / 100L
    var ranks = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iterations) {
      val in = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (u, v) =>
        in(v) = in.getOrElse(v, 0L) + (ranks(u) * 85L) / (outdeg(u) * 100L)
      }
      ranks = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    nodes.map(v => (v, ranks(v)))
  }

  /** q171: WEIGHTED-PageRank twin — edge weight = the triple table's
    * (subj, obj) mention multiplicity, rank mass split proportionally:
    * contrib = (rank·85·w) div (wout·100), the same all-integer fixed
    * point, sequential HashMap loop. */
  def q171WeightedPagerank(triples: Seq[Triple], iterations: Int = 10,
                           scale: Long = 1000000000L): Seq[(Long, Long)] = {
    val edges = triples.filter(t => t.subj != t.obj)
      .groupBy(t => (t.subj, t.obj))
      .map { case ((s, o), ts) => (s, o, ts.size.toLong) }.toSeq
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = 15L * scale / 100L
    var ranks = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iterations) {
      val in = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (u, v, w) =>
        in(v) = in.getOrElse(v, 0L) + (ranks(u) * 85L * w) / (wout(u) * 100L)
      }
      ranks = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    nodes.map(v => (v, ranks(v)))
  }

  /** q82: personalized-PageRank twin. Seeds = the 3 entities with the most
    * out-TRIPLES (multigraph count, ties by min id — the degreeProfile
    * ordering); teleport base and initial mass land only on seeds, same
    * integer recurrence as q79 otherwise. */
  def q82PersonalizedPagerank(triples: Seq[Triple], iterations: Int = 10,
                              scale: Long = 1000000000L): Seq[(Long, Long)] = {
    val seeds = triples.groupBy(_.subj).map { case (s, ts) => (s, ts.size) }
      .toSeq.sortBy { case (s, n) => (-n, s) }.take(3).map(_._1).toSet
    val edges = triples.map(t => (t.subj, t.obj)).filter(e => e._1 != e._2).distinct
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    def base(v: Long) = if (seeds(v)) 15L * scale / 100L else 0L
    var ranks = nodes.map(v => v -> (if (seeds(v)) scale else 0L)).toMap
    for (_ <- 0 until iterations) {
      val in = scala.collection.mutable.HashMap.empty[Long, Long]
      edges.foreach { case (u, v) =>
        in(v) = in.getOrElse(v, 0L) + (ranks(u) * 85L) / (outdeg(u) * 100L)
      }
      ranks = nodes.map(v => v -> (base(v) + in.getOrElse(v, 0L))).toMap
    }
    nodes.map(v => (v, ranks(v)))
  }

  /** q94: filtered negative-sampling twin — restates the production rule
    * (kg.Embedding.negativeSamples) sequentially: candidate for
    * (triple, slot) = id-sorted entity at floorMod(xxhash64 chain, |E|);
    * corruptions that are true triples are filtered. Shares only the Xxh64
    * primitive with production (the hash IS the spec). */
  def q94NegativeSamples(triples: Seq[Triple], k: Int = 4,
                         seed: Long = 0L): Seq[(Long, String, Long, Int, Long)] = {
    val t = triples.map(x => (x.subj, x.pred, x.obj)).distinct
    val truth = t.toSet
    val ents = t.flatMap(x => Seq(x._1, x._3)).distinct.sorted
    val n = ents.length.toLong
    for {
      (s, p, o) <- t
      slot <- 0 until k
      neg = ents(Math.floorMod(
        Xxh64.sparkChain(Seq[Any](s, p, o, slot, seed)), n).toInt)
      if !truth((s, p, neg))
    } yield (s, p, o, slot, neg)
  }

  /** q95: coreness twin — INDEPENDENT algorithm: naive repeated minimum-
    * degree peeling over mutable adjacency sets (production runs either
    * level-synchronous distributed peeling or the O(m) Batagelj–Zaveršnik
    * bucket peel; this twin is the textbook O(n·m) definition-chaser). */
  def q95Coreness(triples: Seq[Triple]): Seq[(Long, Long)] = {
    val e = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.HashSet[Long]]
    e.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
    }
    val core = scala.collection.mutable.HashMap.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size).min.toLong
      k = math.max(k, minDeg)
      val v = adj.iterator.filter(_._2.size.toLong == minDeg).map(_._1).min
      core(v) = k
      adj(v).foreach { u => adj(u) -= v; if (adj(u).isEmpty && !core.contains(u)) { core(u) = k; adj.remove(u) } }
      adj.remove(v)
    }
    core.toSeq
  }

  /** q177: minimum spanning forest twin — PRIM's algorithm (grow each
    * component from its smallest unvisited node, always taking the
    * (w, a, b)-minimal edge crossing the visited cut), a genuinely
    * different algorithm from BOTH production paths (distributed Borůvka
    * rounds, driver Kruskal): under the strict total edge order (w, a, b)
    * the minimum spanning forest is UNIQUE (cut property with a linear
    * order — no distinct-weights assumption needed), so all three agree
    * by uniqueness, not by replaying one another's traversal. Edges = the
    * q97/q171 weighted co-mention relation made undirected: unordered
    * entity pairs, w = 6 - min(distinct urls, 5). */
  def q177Msf(triples: Seq[Triple]): Seq[(Long, Long, Long)] = {
    val e = triples.filter(t => t.subj != t.obj)
      .map(t => ((math.min(t.subj, t.obj), math.max(t.subj, t.obj)), t.url))
      .distinct.groupBy(_._1)
      .map { case ((a, b), xs) =>
        (a, b, 6L - math.min(xs.map(_._2).distinct.size.toLong, 5L)) }
      .toSeq
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]]
    e.foreach { edge =>
      adj.getOrElseUpdate(edge._1, scala.collection.mutable.ArrayBuffer.empty) += edge
      adj.getOrElseUpdate(edge._2, scala.collection.mutable.ArrayBuffer.empty) += edge
    }
    val visited = scala.collection.mutable.HashSet.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!visited.contains(start)) {
        visited += start
        val pq = scala.collection.mutable.PriorityQueue
          .empty[(Long, Long, Long)](
            Ordering.by[(Long, Long, Long), (Long, Long, Long)] {
              case (a, b, w) => (w, a, b) }(Ordering.Tuple3[Long, Long, Long])
              .reverse)
        adj(start).foreach(pq.enqueue(_))
        while (pq.nonEmpty) {
          val (a, b, w) = pq.dequeue()
          val next = if (!visited.contains(a)) a
                     else if (!visited.contains(b)) b else -1L
          if (next >= 0L) {
            visited += next
            out += ((a, b, w))
            adj(next).foreach(pq.enqueue(_))
          }
        }
      }
    }
    out.toSeq
  }

  /** q183: Count-Min error-profile twin — exact token counts via one
    * HashMap pass, the CM sketch replayed cell-for-cell with the same
    * Xxh64 chain (hash(token, d) mod width), probes = exact top-topK by
    * (count desc, token asc). Asserts the overestimate invariant the
    * production spec also asserts. */
  def q183CountMin(docs: Seq[Doc], depth: Int = 4, width: Int = 512,
                   topK: Int = 50): Seq[(String, Long, Long)] = {
    val toks = docs.flatMap(d =>
      splitKeepAll(d.text.toLowerCase(java.util.Locale.ROOT)))
    val exact = scala.collection.mutable.HashMap.empty[String, Long]
    val cells = new Array[Long](depth * width)
    toks.foreach { t =>
      exact(t) = exact.getOrElse(t, 0L) + 1L
      var d = 0
      while (d < depth) {
        cells(d * width + java.lang.Math.floorMod(
          Xxh64.sparkChain(Seq[Any](t, d)), width.toLong).toInt) += 1L
        d += 1
      }
    }
    exact.toSeq.sortBy { case (t, c) => (-c, t) }.take(topK).map { case (t, c) =>
      val est = (0 until depth).map(d => cells(d * width +
        java.lang.Math.floorMod(
          Xxh64.sparkChain(Seq[Any](t, d)), width.toLong).toInt)).min
      require(est >= c, s"CM underestimated '$t': $est < $c — impossible")
      (t, c, est)
    }
  }

  /** q198: AMS/CountSketch F2 profile twin — per lang, the exact second
    * moment via one HashMap pass and the CountSketch cells replayed
    * cell-for-cell (h from the Xxh64 chain seed d, the ±1 sign from the
    * independent chain seed d + depth, lowest bit), median of the depth
    * row estimates in BigInt, err_permille by truncating integer
    * division. exact/est emitted as STRINGS (the oracle casts to
    * DECIMAL(38,0)) so no Long ceiling enters the fixture. */
  def q198F2Profile(docs: Seq[Doc], depth: Int = 5,
                    width: Int = 256): Seq[(String, Long, String, String, Long)] = {
    require(depth % 2 == 1)
    docs.groupBy(_.lang).toSeq.sortBy(_._1).map { case (lang, ds) =>
      val toks = ds.sortBy(_.docId).flatMap(d =>
        splitKeepAll(d.text.toLowerCase(java.util.Locale.ROOT)))
      val exact = scala.collection.mutable.HashMap.empty[String, Long]
      val cells = new Array[Long](depth * width)
      toks.foreach { t =>
        exact(t) = exact.getOrElse(t, 0L) + 1L
        var d = 0
        while (d < depth) {
          val idx = java.lang.Math.floorMod(
            Xxh64.sparkChain(Seq[Any](t, d)), width.toLong).toInt
          val sign =
            if ((Xxh64.sparkChain(Seq[Any](t, d + depth)) & 1L) == 0L) 1L else -1L
          cells(d * width + idx) += sign
          d += 1
        }
      }
      val exactF2 = exact.valuesIterator.map(c => BigInt(c) * BigInt(c)).sum
      val ests = (0 until depth).map { d =>
        var s = BigInt(0); var c = 0
        while (c < width) { val v = BigInt(cells(d * width + c)); s += v * v; c += 1 }
        s
      }.sorted
      val est = ests(depth / 2)
      val err = ((est - exactF2).abs * 1000) / exactF2
      (lang, toks.size.toLong, exactF2.toString, est.toString, err.toLong)
    }
  }

  /** q199: compression-ratio twin — its OWN java.util.zip.Deflater walk
    * (level 6, raw) over each doc's UTF-8 bytes; shares only the JDK
    * codec with production (the javax.imageio precedent), the ratio and
    * keep rule re-derived in BigInt-free integer math. */
  def q199CompressionProfile(docs: Seq[Doc], minRatioPermille: Long = 300L)
      : Seq[(Long, Long, Long, Long, Boolean)] =
    docs.sortBy(_.docId).map { d =>
      val bytes = d.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val defl = new java.util.zip.Deflater(6, true)
      val dl = try {
        defl.setInput(bytes); defl.finish()
        val buf = new Array[Byte](4096)
        var t = 0L
        while (!defl.finished()) t += defl.deflate(buf)
        t
      } finally defl.end()
      val ratio = if (bytes.isEmpty) 1000L else dl * 1000L / bytes.length
      (d.docId, bytes.length.toLong, dl, ratio, ratio >= minRatioPermille)
    }

  /** q184: densest-subgraph twin — the Bahmani–Kumar–Vazirani batch
    * peel replayed sequentially over an immutable edge set: per round,
    * remove EVERY node with degree·|V|·epsDen <= 2·|E|·(epsDen+epsNum)
    * (the (1+eps)-average-degree rule, cross-multiplied in BigInt —
    * never a float division), tracking the max-density survivor set.
    * The rule is the spec, so production, driver fallback and this twin
    * must agree bit-for-bit on membership AND the (v_cnt, e_cnt) pair. */
  def q184Densest(triples: Seq[Triple], epsNum: Long = 1L,
                  epsDen: Long = 10L): Seq[(Long, Long, Long)] = {
    var g = triples.filter(t => t.subj != t.obj)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj))).toSet
    var nodes = g.flatMap(p => Seq(p._1, p._2))
    var best = nodes
    var bestE = BigInt(g.size); var bestV = BigInt(nodes.size)
    while (nodes.nonEmpty) {
      val (e, v) = (BigInt(g.size), BigInt(nodes.size))
      if (e * bestV > bestE * v) { best = nodes; bestE = e; bestV = v }
      val deg = scala.collection.mutable.HashMap.empty[Long, Long]
      g.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1; deg(b) = deg.getOrElse(b, 0L) + 1
      }
      val rhs = 2 * e * (epsDen + epsNum)
      val doomed = nodes.filter(n =>
        BigInt(deg.getOrElse(n, 0L)) * v * epsDen <= rhs)
      require(doomed.nonEmpty, "twin batch peel removed nothing — impossible")
      nodes = nodes -- doomed
      g = g.filter { case (a, b) => !doomed(a) && !doomed(b) }
    }
    best.toSeq.sorted.map(id => (id, bestV.toLong, bestE.toLong))
  }

  /** q179: maximal-independent-set twin — the deterministic Luby
    * recurrence replayed sequentially over mutable adjacency sets:
    * per round, every remaining node whose (xxhash64(id, seed), id)
    * priority is a strict local minimum among REMAINING neighbors (or
    * with no remaining neighbor) is selected; selected nodes and their
    * neighbors leave. Shares only the Xxh64 primitive with production
    * (the priority IS the spec, like q94/q99). */
  def q179Mis(triples: Seq[Triple], seed: Long = 0L): Seq[(Long, Long)] = {
    val e = triples.filter(t => t.subj != t.obj)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj))).distinct
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashSet[Long]]
    e.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
    }
    def prio(v: Long): (Long, Long) = (Xxh64.sparkChain(Seq[Any](v, seed)), v)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var round = 0L
    while (adj.nonEmpty) {
      round += 1
      val selected = adj.keysIterator.filter { v =>
        adj(v).isEmpty || adj(v).forall(u =>
          implicitly[Ordering[(Long, Long)]].lt(prio(v), prio(u)))
      }.toSeq
      require(selected.nonEmpty, "Luby round selected nothing — impossible " +
        "under a strict total order (the global minimum always wins)")
      selected.foreach(v => out += ((v, round)))
      val removed = (selected ++ selected.flatMap(adj(_))).toSet
      removed.foreach(adj.remove)
      adj.valuesIterator.foreach(_ --= removed)
    }
    out.toSeq
  }

  /** q180: Jones–Plassmann coloring twin — same deterministic priorities:
    * per round every uncolored strict-local-minimum (among UNCOLORED
    * neighbors) takes the smallest color absent from its colored
    * neighborhood. */
  def q180Coloring(triples: Seq[Triple], seed: Long = 0L): Seq[(Long, Long)] = {
    val e = triples.filter(t => t.subj != t.obj)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj))).distinct
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.HashSet[Long]]
    e.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.HashSet.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.HashSet.empty) += a
    }
    def prio(v: Long): (Long, Long) = (Xxh64.sparkChain(Seq[Any](v, seed)), v)
    val color = scala.collection.mutable.HashMap.empty[Long, Long]
    val uncolored = scala.collection.mutable.HashSet.empty[Long] ++ adj.keys
    while (uncolored.nonEmpty) {
      val ready = uncolored.iterator.filter { v =>
        adj(v).iterator.filter(uncolored.contains).forall(u =>
          implicitly[Ordering[(Long, Long)]].lt(prio(v), prio(u)))
      }.toSeq
      require(ready.nonEmpty, "Jones–Plassmann round selected nothing — " +
        "impossible under a strict total order")
      ready.foreach { v =>
        val used = adj(v).iterator.flatMap(color.get).toSet
        color(v) = Iterator.from(0).map(_.toLong).find(!used(_)).get
      }
      uncolored --= ready
    }
    color.toSeq
  }

  /** q187: time-respecting earliest-arrival twin — hop-bounded relaxation
    * replayed sequentially (arrival_h(v) = min ts of an edge u->v with
    * ts >= arrival_{h-1}(u), h <= maxHops — the recurrence IS the spec,
    * shared with production and its driver fallback). Edge timestamps are
    * re-derived analytically from the url's doc id (CorpusGen's
    * warc_ts = BaseEpochMs + id*1000 ms), never read back from Spark, so
    * any timestamp-conversion drift in the engine breaks the fixture.
    * Seeds = top-3 subjects by (triple count desc, id asc), the q87 rule. */
  def q187TemporalReach(triples: Seq[Triple], maxHops: Int = 12,
                        startTs: Long = 0L): Seq[(Long, Long)] = {
    def tsOf(url: String): Long = {
      val id = url.substring(url.lastIndexOf("doc") + 3).toLong
      (graft.gen.CorpusGen.BaseEpochMs + id * 1000L) * 1000L
    }
    val seeds = triples.groupBy(_.subj).toSeq
      .map { case (s, ts) => (s, ts.size.toLong) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
    val edges = triples.filter(t => t.subj != t.obj)
      .map(t => (t.subj, t.obj, tsOf(t.url))).filter(_._3 >= startTs).distinct
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(e => (e._2, e._3)) }
    val arr = scala.collection.mutable.HashMap.empty[Long, Long]
    var frontier = seeds.distinct
    frontier.foreach(arr(_) = startTs)
    var h = 0
    while (h < maxHops && frontier.nonEmpty) {
      h += 1
      val improved = scala.collection.mutable.HashMap.empty[Long, Long]
      frontier.foreach { u =>
        adj.getOrElse(u, Seq.empty).foreach { case (v, ts) =>
          if (ts >= arr(u) && ts < arr.getOrElse(v, Long.MaxValue) &&
              ts < improved.getOrElse(v, Long.MaxValue)) improved(v) = ts
        }
      }
      val real = improved.filter { case (v, t) => t < arr.getOrElse(v, Long.MaxValue) }
      real.foreach { case (v, t) => arr(v) = t }
      frontier = real.keys.toSeq
    }
    arr.toSeq.sortBy(_._1)
  }

  /** q188: cross-corpus KMV overlap twin — per source, the word-3-shingle
    * set (Spark-identical n-token concat shingles), its k smallest
    * xxhash64 values by unsigned order, then per pair the identical
    * integer sketch math: k-smallest-of-union, common membership count,
    * permille Jaccard, the BigInt bottom-k estimator, and the
    * inclusion-exclusion intersection estimate (unclamped). */
  def q188CorpusOverlap(docs: Seq[Doc], k: Int = 256)
      : Seq[(String, String, Long, Long, Long, Long, Long, Long, Long)] = {
    val mask = (BigInt(1) << 64) - 1
    def unsig(h: Long): BigInt = BigInt(h) & mask
    def est(kept: Array[Long]): Long =
      if (kept.length < k) kept.length.toLong
      else ((BigInt(k - 1) << 64) / unsig(kept(k - 1)).max(BigInt(1)))
        .min(BigInt(Long.MaxValue)).toLong
    val bySource: Seq[(String, Array[Long])] =
      docs.groupBy(_.source).toSeq.sortBy(_._1).map { case (src, ds) =>
        val hs = ds.iterator.flatMap { d =>
          val toks = splitKeepAll(d.text)
          if (toks.length < 3) Iterator.empty
          else (0 to toks.length - 3).iterator
            .map(i => toks.slice(i, i + 3).mkString(""))
        }.toSet.toArray.map((s: String) => Xxh64.hashString(s, Xxh64.SparkSeed))
        src -> hs.distinct.sortBy(unsig).take(k)
      }
    for {
      i <- bySource.indices
      j <- (i + 1) until bySource.length
    } yield {
      val (g1, sa) = bySource(i)
      val (g2, sb) = bySource(j)
      val union = (sa ++ sb).distinct.sortBy(unsig).take(k)
      val aSet = sa.toSet; val bSet = sb.toSet
      val nCommon = union.count(h => aSet(h) && bSet(h)).toLong
      val estU = est(union)
      val jacPm = if (union.isEmpty) 0L else nCommon * 1000L / union.length
      (g1, g2, est(sa), est(sb), estU, union.length.toLong, nCommon, jacPm,
        est(sa) + est(sb) - estU)
    }
  }

  /** q99: deterministic random-walk twin — restates the production rule
    * (kg.Graphs.randomWalks) sequentially: step t's neighbor at node cur
    * for walk (start, w) = dst-sorted out-neighbor at
    * floorMod(xxhash64(start, w, t, cur, seed), outdeg(cur)); walks end
    * early at sinks. Shares only the Xxh64 primitive (the hash IS the
    * spec). */
  def q99RandomWalks(triples: Seq[Triple], walksPerNode: Int = 2,
                     maxLen: Int = 4, seed: Long = 0L): Seq[(Long, Long, Long, Long)] = {
    val adj = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2)
      .distinct.groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(_._2).sorted.toVector }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (start <- adj.keys.toSeq.sorted; w <- 0L until walksPerNode.toLong) {
      var cur = start
      out += ((start, w, 0L, start))
      var t = 1L
      var alive = true
      while (t <= maxLen && alive) {
        adj.get(cur) match {
          case Some(nbrs) =>
            val idx = Math.floorMod(
              Xxh64.sparkChain(Seq[Any](start, w, t, cur, seed)),
              nbrs.length.toLong).toInt
            cur = nbrs(idx)
            out += ((start, w, t, cur))
            t += 1
          case None => alive = false
        }
      }
    }
    out.toSeq
  }

  /** q109: filtered link-prediction holdout twin — replays the hash tag
    * (floorMod(xxhash64(s, p, o, seed), den) < num) and the one-pass
    * demotion (test rows whose subj/obj/pred never appear in train fall
    * back to train) with plain Scala sets. */
  def q109LinkSplit(triples: Seq[Triple], testNum: Long = 1L,
                    testDen: Long = 5L, seed: Long = 0L): Seq[(Long, String, Long, String)] = {
    val t = triples.map(tr => (tr.subj, tr.pred, tr.obj)).distinct
    def isTest(x: (Long, String, Long)): Boolean = Math.floorMod(
      Xxh64.sparkChain(Seq[Any](x._1, x._2, x._3, seed)), testDen) < testNum
    val train0 = t.filterNot(isTest)
    val ents = train0.flatMap(x => Seq(x._1, x._3)).toSet
    val preds = train0.map(_._2).toSet
    t.map { case tr @ (s, p, o) =>
      val split =
        if (isTest(tr) && ents(s) && ents(o) && preds(p)) "test" else "train"
      (s, p, o, split)
    }
  }

  /** q110: Weisfeiler–Lehman refinement twin — the same recurrence
    * (color' = xxhash64 folded over own color then the SORTED neighbor
    * colors; Spark's array hashing IS that flat fold) with HashMaps over
    * the undirected simple graph. */
  def q110WlColors(triples: Seq[Triple], rounds: Int = 3): Seq[(Long, Long)] = {
    val e = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct
    val nbrs = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var colors: Map[Long, Long] = nbrs.keys.map(_ -> 1L).toMap
    for (_ <- 1 to rounds) {
      colors = nbrs.map { case (node, ns) =>
        val ncs = ns.map(colors).sorted
        node -> Xxh64.sparkChain(colors(node) +: ncs.map(x => x: Any))
      }
    }
    colors.toSeq
  }

  /** q118: HITS twin — the same all-integer recurrence (in-sum / out-sum
    * with per-half-round bitshift renormalization to `bits` bits)
    * replayed with HashMaps; shift amount derives from the max over ALL
    * nodes including the zero-score ones, like the engine's coalesce. */
  def q118Hits(triples: Seq[Triple], iters: Int = 5,
               bits: Int = 20): Seq[(Long, Long, Long)] = {
    val e = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2).distinct
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val outAdj = e.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val inAdj = e.groupBy(_._2).map { case (d, xs) => d -> xs.map(_._1) }
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = if (m.isEmpty) 0L else m.values.max
      val shift =
        math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(mx) - bits)
      m.map { case (k, v) => k -> (v >> shift) }
    }
    var hub = nodes.map(_ -> (1L << (bits - 1))).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      auth = rescale(nodes.map(v =>
        v -> inAdj.getOrElse(v, Nil).map(hub).sum).toMap)
      hub = rescale(nodes.map(v =>
        v -> outAdj.getOrElse(v, Nil).map(auth).sum).toMap)
    }
    nodes.map(n => (n, hub(n), auth(n)))
  }

  /** q115: per-component canonical-digest twin — the q88 sparsification
    * rule, a sequential min-id union-find, the q110 WL recurrence over
    * the sparse undirected simple graph, and the digest as the Spark
    * array-hash fold (independent Xxh64) over each component's SORTED
    * final color multiset. */
  def q115GraphDigest(triples: Seq[Triple],
                      rounds: Int = 3): Seq[(Long, Long, Long)] = {
    val e = triples
      .filter(t => t.subj != t.obj && (t.subj % 13 + t.obj % 13) % 13 == 0)
      .map(t => (math.min(t.subj, t.obj), math.max(t.subj, t.obj))).distinct
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- e) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.distinct
    val comp = nodes.map(n => n -> find(n)).toMap // min-id labeling
    val nbrs = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var colors: Map[Long, Long] = nodes.map(_ -> 1L).toMap
    for (_ <- 1 to rounds) {
      colors = nbrs.map { case (node, ns) =>
        val ncs = ns.map(colors).sorted
        node -> Xxh64.sparkChain(colors(node) +: ncs.map(x => x: Any))
      }
    }
    nodes.groupBy(comp).toSeq.map { case (root, members) =>
      val cs = members.map(colors).sorted
      (root, members.size.toLong, Xxh64.sparkChain(cs.map(x => x: Any)))
    }
  }

  /** q111: fixed-fanout neighbor-sampling twin — per node, out-neighbors
    * ordered by (xxhash64(src, dst, seed), dst), top fanouts(h-1) kept at
    * hop h; hops chain through the sampled frontier. */
  def q111SampleNeighbors(triples: Seq[Triple], fanouts: Seq[Int] = Seq(3, 2),
                          seed: Long = 0L): Seq[(Long, Long, Long, Long)] = {
    val pairs = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2).distinct
    val ranked = pairs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2)
        .sortBy(d => (Xxh64.sparkChain(Seq[Any](s, d, seed)), d))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var frontier: Seq[(Long, Long)] = Seq.empty // (root, node)
    for (root <- ranked.keys.toSeq.sorted; d <- ranked(root).take(fanouts.head)) {
      out += ((root, 1L, root, d))
    }
    frontier = out.map(x => (x._1, x._4)).toSeq
    for ((f, i) <- fanouts.zipWithIndex.drop(1)) {
      val srcs = frontier.distinct
      val next = for ((root, s) <- srcs; d <- ranked.getOrElse(s, Vector.empty).take(f))
        yield (root, (i + 1).toLong, s, d)
      out ++= next
      frontier = next.map(x => (x._1, x._4))
    }
    out.toSeq.distinct
  }

  /** q107: node2vec biased-walk twin — restates kg.Graphs.node2vecWalks
    * sequentially: step 1 is the q99 uniform rule; step t >= 2 weights
    * each dst-sorted out-neighbor x of cur by wBack (x == prev), wCommon
    * (directed edge prev->x exists) or wFar, and picks the neighbor whose
    * cumulative-weight interval contains
    * floorMod(xxhash64(start, walk, t, cur, seed), total); total == 0 or
    * a sink ends the walk. Shares only the Xxh64 primitive. */
  def q107Node2vecWalks(triples: Seq[Triple], walksPerNode: Int = 2,
                        maxLen: Int = 4, wBack: Long = 2L, wCommon: Long = 6L,
                        wFar: Long = 3L, seed: Long = 0L): Seq[(Long, Long, Long, Long)] = {
    val pairs = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2).distinct
    val edgeSet = pairs.toSet
    val adj = pairs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted.toVector }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (start <- adj.keys.toSeq.sorted; w <- 0L until walksPerNode.toLong) {
      out += ((start, w, 0L, start))
      if (maxLen >= 1) {
        val nbrs = adj(start)
        val idx = Math.floorMod(
          Xxh64.sparkChain(Seq[Any](start, w, 1L, start, seed)),
          nbrs.length.toLong).toInt
        var prev = start
        var cur = nbrs(idx)
        out += ((start, w, 1L, cur))
        var t = 2L
        var alive = true
        while (t <= maxLen && alive) {
          adj.get(cur) match {
            case Some(ns) =>
              val wgts = ns.map(x =>
                if (x == prev) wBack
                else if (edgeSet((prev, x))) wCommon
                else wFar)
              val tot = wgts.sum
              if (tot == 0L) alive = false
              else {
                val r = Math.floorMod(
                  Xxh64.sparkChain(Seq[Any](start, w, t, cur, seed)), tot)
                var i = 0
                var acc = wgts(0)
                while (r >= acc) { i += 1; acc += wgts(i) }
                prev = cur
                cur = ns(i)
                out += ((start, w, t, cur))
                t += 1
              }
            case None => alive = false
          }
        }
      }
    }
    out.toSeq
  }

  /** q100: synchronous label-propagation twin — the same deterministic
    * recurrence (all nodes update together; new label = most frequent
    * neighbor label, ties to the SMALLEST label) restated with plain
    * HashMaps over the undirected simple graph. */
  def q100LabelPropagation(triples: Seq[Triple], iters: Int = 5): Seq[(Long, Long)] = {
    val e = triples.map(t => (t.subj, t.obj)).filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct
    val sym = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nbrs = sym.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = nbrs.map { case (node, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => (l, xs.size.toLong) }
        node -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels.toSeq
  }

  // -------------------------------------------------------- hash-family ops

  /** q81: KMV distinct-count sketch twin — INDEPENDENT algorithm: the twin
    * materializes each group's FULL distinct-hash set, sorts it by BigInt
    * unsigned value and takes the k smallest, and the "ALL" row re-derives
    * from the union of the raw sets; production (ops.Sketches) maintains
    * bounded flipped-long buffers and builds "ALL" by MERGING the per-group
    * sketches. Equality therefore proves both the bounded insertion and the
    * sketch-merge algebra. Estimator restated from Bar-Yossef et al. 2002:
    * exact below saturation, else floor((k-1) * 2^64 / kth_min_unsigned). */
  def q81DistinctSketch(docs: Seq[Doc], k: Int = 64): Seq[(String, Long, Long, Int, Long)] = {
    val mask = (BigInt(1) << 64) - 1
    def row(group: String, nRows: Long, hs: Set[Long]): (String, Long, Long, Int, Long) = {
      val kept = hs.toArray.sortBy(h => BigInt(h) & mask).take(k)
      val est =
        if (kept.length < k) kept.length.toLong
        else ((BigInt(k - 1) << 64) / (BigInt(kept(k - 1)) & mask).max(BigInt(1)))
          .min(BigInt(Long.MaxValue)).toLong
      (group, nRows, est, kept.length, kept.last)
    }
    val byLang = docs.groupBy(_.lang).toSeq.sortBy(_._1).map { case (lang, ds) =>
      row(lang, ds.size.toLong,
        ds.map(d => Xxh64.hashString(d.text, Xxh64.SparkSeed)).toSet)
    }
    byLang :+ row("ALL", docs.size.toLong,
      docs.map(d => Xxh64.hashString(d.text, Xxh64.SparkSeed)).toSet)
  }

  /** q28: 64-bit SimHash per doc, Spark-identical token hashing. */
  def simhash(text: String): Long = {
    val hs = splitKeepAll(text).map(t => Xxh64.hashString(t, Xxh64.SparkSeed))
    var sim = 0L
    var b = 0
    while (b < 64) {
      var vote = 0L
      hs.foreach(h => vote += (if (((h >> b) & 1L) == 1L) 1L else -1L))
      if (vote > 0) sim |= (1L << b)
      b += 1
    }
    sim
  }

  /** Candidate pairs from (id, band, bucket) rows with the hot-bucket cap
    * (size 2..maxBucket), a<b, distinct — idPairsFromBuckets' semantics. */
  def pairsFromBuckets(rows: Seq[(Long, Int, Long)], maxBucket: Int): Seq[(Long, Long)] =
    rows.groupBy(r => (r._2, r._3)).valuesIterator
      .filter(g => g.size >= 2 && g.size <= maxBucket)
      .flatMap { g =>
        val ids = g.map(_._1)
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSeq.distinct

  /** q29 rows: (doc1, doc2, hamming). */
  def q29SimhashNearDup(docs: Seq[Doc], maxHamming: Int = 3, maxBucket: Int = 64): Seq[(Long, Long, Int)] = {
    val sims = docs.map(d => d.docId -> simhash(d.text)).toMap
    val banded = docs.flatMap { d =>
      (0 until 4).map(c => (d.docId, c, (sims(d.docId) >> (c * 16)) & 65535L))
    }
    pairsFromBuckets(banded, maxBucket).flatMap { case (a, b) =>
      val hamming = java.lang.Long.bitCount(sims(a) ^ sims(b))
      if (hamming <= maxHamming) Some((a, b, hamming)) else None
    }
  }

  /** MinHash+banded-LSH twin — Spark-identical shingles (n-token concat, no
    * separator, first-occurrence-distinct), seeded-hash signature, band
    * bucketing, hot-bucket cap, exact-Jaccard verify. Returns verified
    * pairs (doc1 < doc2). */
  def minhashPairs(docs: Seq[Doc], shingleSize: Int = 3, numHashes: Int = 32,
                   bands: Int = 8, threshold: Double = 0.5,
                   maxBucket: Int = 64): Seq[(Long, Long)] = {
    val rows = numHashes / bands
    val sh: Map[Long, IndexedSeq[String]] = docs.map { d =>
      val toks = splitKeepAll(d.text)
      val grams =
        if (toks.length < shingleSize) IndexedSeq.empty[String]
        else (0 to toks.length - shingleSize)
          .map(i => toks.slice(i, i + shingleSize).mkString("")).distinct.toIndexedSeq
      d.docId -> grams
    }.toMap
    val banded = docs.filter(d => sh(d.docId).nonEmpty).flatMap { d =>
      val grams = sh(d.docId)
      val sig = (0 until numHashes).map(i =>
        grams.map(g => Xxh64.sparkChain(Seq[Any](i, g))).min)
      (0 until bands).map { b =>
        val bucket = Xxh64.hashString(
          "band_" + b + "_" + sig.slice(b * rows, b * rows + rows).mkString(","),
          Xxh64.SparkSeed)
        (d.docId, b, bucket)
      }
    }
    pairsFromBuckets(banded, maxBucket).filter { case (a, b) =>
      val (s1, s2) = (sh(a).toSet, sh(b).toSet)
      val inter = s1.intersect(s2).size
      val uni = s1.union(s2).size
      uni > 0 && inter.toDouble / uni >= threshold
    }
  }

  /** q36 rows: (doc_id, keep_id) — union-find over the LSH pairs; keep_id =
    * min doc of the cluster, self when unclustered. */
  def q36DedupClusters(docs: Seq[Doc]): Seq[(Long, Long)] = {
    val pairs = minhashPairs(docs)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val clusteredSet = clustered.toSet
    val compMin = clustered.groupBy(find).map { case (root, ns) => root -> ns.min }
    docs.map { d =>
      val keep = if (clusteredSet.contains(d.docId)) compMin(find(d.docId)) else d.docId
      (d.docId, keep)
    }
  }

  /** q38 rows: doc_ids kept by deterministic hash sampling
    * (pmod(xxhash64(doc_id), 100) < pctKeep). */
  def q38HashSample(docs: Seq[Doc], pctKeep: Int): Seq[Long] =
    docs.map(_.docId).filter { id =>
      val h = Xxh64.hashLong(id, Xxh64.SparkSeed)
      ((h % 100) + 100) % 100 < pctKeep
    }

  // ------------------------------------------------------- embedding ops

  /** Spark cosine() twin: per-element double products, summed in order;
    * norms likewise; dot / (sqrt * sqrt). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sign bit of embedding vs pseudo-plane p — Spark-identical arithmetic:
    * weight from xxhash64("plane<p>:<i>") parity, float product, double
    * accumulation in array order. */
  def planeBit(emb: Array[Float], p: Int): Int = {
    var acc = 0.0
    var i = 0
    while (i < emb.length) {
      val h = Xxh64.hashString(s"plane$p:$i", Xxh64.SparkSeed)
      val w = (((h % 2 + 2) % 2) * 2 - 1).toFloat
      acc += (emb(i) * w).toDouble
      i += 1
    }
    if (acc > 0) 1 else 0
  }

  /** q32 rows: (v1, v2, cosine rounded 6) via 64-plane / 4-band sign-LSH
    * (the production default — 16-bit buckets per band). */
  def q32EmbeddingNearDup(vecs: Seq[(Long, Array[Float])], threshold: Double = 0.5,
                          planes: Int = 64, bands: Int = 4, maxBucket: Int = 256): Seq[(Long, Long, Double)] = {
    val rows = planes / bands
    val byId = vecs.toMap
    val banded = vecs.flatMap { case (id, v) =>
      val bits = (0 until planes).map(p => planeBit(v, p))
      (0 until bands).map { b =>
        val bucket = bits.slice(b * rows, b * rows + rows).foldLeft(0L)((a, bit) => a * 2 + bit)
        (id, b, bucket)
      }
    }
    pairsFromBuckets(banded, maxBucket).flatMap { case (a, b) =>
      val c = cosine(byId(a), byId(b))
      if (c >= threshold) Some((a, b, sparkRound(c, 6))) else None
    }
  }

  /** q66 rows: IVF top-k under a TRAINED coarse quantizer — independent
    * sequential k-means to the same spec as `Similarity.kmeansCodebook`
    * (stride init, cosine assignment with first-max tie-break, centroid
    * mean folded in the FIXED hierarchical order: per id-mod-fanout salt
    * group ascending by vec_id, then salt groups ascending; empty clusters
    * keep their centroid), then the assignment/probe/rank replication. */
  /** First-max nearest centroid over an id-ascending codebook: (cid, sim). */
  private def twinNearest(v: Array[Float],
                          cents: Seq[(Long, Array[Float])]): (Long, Double) = {
    var bestId = cents.head._1
    var best = Double.NegativeInfinity
    for ((cid, cv) <- cents) {
      val s = cosine(v, cv)
      if (s > best) { best = s; bestId = cid }
    }
    (bestId, best)
  }

  /** Sequential k-means to the `Similarity.kmeansCodebook` spec (stride
    * init, cosine assignment with first-max tie-break, centroid mean
    * folded in the FIXED hierarchical order: per id-mod-fanout salt group
    * ascending by vec_id, then salt groups ascending; empty clusters keep
    * their centroid) — shared by the q66 and q67 twins. */
  def twinKmeans(vecs: Seq[(Long, Array[Float])], nList: Int, iters: Int,
                 fanout: Int): Seq[(Long, Array[Float])] = {
    val maxId = vecs.map(_._1).max
    val stride = math.max(1L, (maxId + 1) / nList)
    var cents: Seq[(Long, Array[Float])] =
      vecs.filter(_._1 % stride == 0).sortBy(_._1).take(nList)
    for (_ <- 1 to iters) {
      val assign = vecs.map { case (id, v) => (id, v, twinNearest(v, cents)._1) }
      cents = cents.map { case (cid, cv) =>
        val members = assign.filter(_._3 == cid)
        if (members.isEmpty) (cid, cv)
        else {
          val dim = cv.length
          val total = new Array[Double](dim)
          for (salt <- members.map(_._1 % fanout).distinct.sorted) {
            val part = new Array[Double](dim)
            for ((_, v, _) <- members.filter(_._1 % fanout == salt).sortBy(_._1)) {
              var i = 0
              while (i < dim) { part(i) += v(i).toDouble; i += 1 }
            }
            var i = 0
            while (i < dim) { total(i) += part(i); i += 1 }
          }
          (cid, total.map(x => (x / members.length).toFloat))
        }
      }
    }
    cents
  }

  /** Squared-L2 nearest (PQ metric): index-ascending accumulation, strict
    * < keeps the first (smallest-id) centroid — the documented
    * `nearestListL2` formula, re-derived. */
  private def twinNearestL2(v: Array[Float],
                            cents: Seq[(Long, Array[Float])]): Long = {
    var bestId = cents.head._1
    var best = Double.PositiveInfinity
    for ((cid, cv) <- cents) {
      var d = 0.0; var i = 0
      while (i < v.length) {
        val t = v(i).toDouble - cv(i).toDouble
        d += t * t; i += 1
      }
      if (d < best) { best = d; bestId = cid }
    }
    bestId
  }

  /** twinKmeans under squared L2 (the PQ sub-quantizer training). */
  def twinKmeansL2(vecs: Seq[(Long, Array[Float])], nList: Int, iters: Int,
                   fanout: Int): Seq[(Long, Array[Float])] = {
    val maxId = vecs.map(_._1).max
    val stride = math.max(1L, (maxId + 1) / nList)
    var cents: Seq[(Long, Array[Float])] =
      vecs.filter(_._1 % stride == 0).sortBy(_._1).take(nList)
    for (_ <- 1 to iters) {
      val assign = vecs.map { case (id, v) => (id, v, twinNearestL2(v, cents)) }
      cents = cents.map { case (cid, cv) =>
        val members = assign.filter(_._3 == cid)
        if (members.isEmpty) (cid, cv)
        else {
          val dim = cv.length
          val total = new Array[Double](dim)
          for (salt <- members.map(_._1 % fanout).distinct.sorted) {
            val part = new Array[Double](dim)
            for ((_, v, _) <- members.filter(_._1 % fanout == salt).sortBy(_._1)) {
              var i = 0
              while (i < dim) { part(i) += v(i).toDouble; i += 1 }
            }
            var i = 0
            while (i < dim) { total(i) += part(i); i += 1 }
          }
          (cid, total.map(x => (x / members.length).toFloat))
        }
      }
    }
    cents
  }

  /** q78 rows: product-quantization ADC top-k, re-derived from the
    * documented pipeline — per-subspace L2 k-means books (code = position
    * in the id-ascending array), one-byte codes by squared-L2 argmin,
    * approximate cosine = (sum of <q_m, book_m[code_m]>/|q|) /
    * sqrt(sum |book_m[code_m]|^2), ranking by (round(score, 9) desc,
    * id asc), self excluded. Subspace/index-ascending double accumulation
    * everywhere — bit-identical operand order to production. */
  def q78PqTopK(vecs: Seq[(Long, Array[Float])], queryMax: Long = 20L,
                k: Int = 10, m: Int = 8, nCodes: Int = 16,
                iters: Int = 3, fanout: Int = 16): Seq[(Long, Long, Int)] =
    twinPqAdc(vecs, queryMax, k, m, nCodes, iters, fanout, (_, _) => true)

  /** The PQ ADC pipeline with a per-(query, neighbor) admission predicate —
    * `keep = always` is the flat q78 scan; the q173 IVF-PQ twin admits only
    * neighbors whose coarse list the query probes. Scores and ordering are
    * byte-for-byte those of the flat scan for every admitted pair. */
  private def twinPqAdc(vecs: Seq[(Long, Array[Float])], queryMax: Long,
                        k: Int, m: Int, nCodes: Int,
                        iters: Int, fanout: Int,
                        keep: (Long, Long) => Boolean): Seq[(Long, Long, Int)] = {
    if (vecs.isEmpty) return Nil
    val dim = vecs.head._2.length
    require(dim % m == 0)
    val ds = dim / m
    val books: IndexedSeq[IndexedSeq[Array[Float]]] = (0 until m).map { s =>
      val sub = vecs.map { case (id, v) =>
        (id, java.util.Arrays.copyOfRange(v, s * ds, (s + 1) * ds))
      }
      twinKmeansL2(sub, nCodes, iters, fanout).map(_._2).toIndexedSeq
    }
    val normSq: IndexedSeq[IndexedSeq[Double]] = books.map(_.map { cent =>
      var ns = 0.0; var i = 0
      while (i < cent.length) { ns += cent(i).toDouble * cent(i).toDouble; i += 1 }
      ns
    })
    def encode(v: Array[Float]): Array[Int] = Array.tabulate(m) { s =>
      var best = 0
      var bestD = Double.PositiveInfinity
      for (c <- books(s).indices) {
        var d = 0.0; var i = 0
        while (i < ds) {
          val t = v(s * ds + i).toDouble - books(s)(c)(i).toDouble
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val codes = vecs.map { case (id, v) => (id, encode(v)) }
    vecs.filter(_._1 < queryMax).flatMap { case (qid, qv) =>
      var qn = 0.0
      for (x <- qv) qn += x.toDouble * x.toDouble
      val qnorm = math.sqrt(qn)
      val lut: IndexedSeq[IndexedSeq[Double]] = (0 until m).map { s =>
        books(s).map { cent =>
          var ip = 0.0; var i = 0
          while (i < ds) { ip += qv(s * ds + i).toDouble * cent(i).toDouble; i += 1 }
          ip / qnorm
        }
      }
      codes.iterator
        .filter { case (nid, _) => nid != qid && keep(qid, nid) }
        .map { case (nid, code) =>
          var ip = 0.0; var ns = 0.0
          for (s <- 0 until m) { ip += lut(s)(code(s)); ns += normSq(s)(code(s)) }
          (sparkRound(ip / math.sqrt(ns), 9), nid)
        }
        .toSeq
        .sortBy { case (s, nid) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((_, nid), r) => (qid, nid, r + 1) }
    }
  }

  /** q173 rows: composed IVF-PQ — independent sequential coarse k-means
    * (twinKmeans, cosine) assigns every vector to one list; each query
    * probes its nProbe best lists (cosine desc, cid asc) and the flat PQ
    * ADC scan (twinPqAdc, the q78 machinery verbatim) admits only
    * neighbors in probed lists. */
  def q173IvfPqTopK(vecs: Seq[(Long, Array[Float])], queryMax: Long = 20L,
                    k: Int = 10, nList: Int = 16, nProbe: Int = 4,
                    m: Int = 8, nCodes: Int = 16,
                    iters: Int = 3, fanout: Int = 16): Seq[(Long, Long, Int)] = {
    if (vecs.isEmpty) return Nil
    val coarse = twinKmeans(vecs, nList, iters, fanout)
    val assign: Map[Long, Long] =
      vecs.map { case (id, v) => id -> twinNearest(v, coarse)._1 }.toMap
    val probed: Map[Long, Set[Long]] = vecs.filter(_._1 < queryMax).map { case (qid, qv) =>
      qid -> coarse.map { case (cid, cv) => (cosine(qv, cv), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(nProbe).map(_._2).toSet
    }.toMap
    twinPqAdc(vecs, queryMax, k, m, nCodes, iters, fanout,
      (qid, nid) => probed(qid).contains(assign(nid)))
  }

  /** q196 rows: RESIDUAL IVF-PQ — independent sequential coarse k-means
    * (twinKmeans, cosine) assigns lists; residuals r = v − c in FLOAT
    * index order; per-subspace L2 k-means books over the RESIDUAL slices;
    * each query probes nProbe lists (cosine desc, cid asc) and scores
    * admitted neighbors by the residual ADC identity
    * (dot(q,c)/|q| + Σ lut[code]) / sqrt(|c|² + Σ (2·<c_s, book> + |book|²)[code])
    * — every accumulation subspace/index-ascending, matching production's
    * operand order bit-for-bit. */
  def q196IvfPqResidual(vecs: Seq[(Long, Array[Float])], queryMax: Long = 20L,
                        k: Int = 10, nList: Int = 16, nProbe: Int = 4,
                        m: Int = 8, nCodes: Int = 16,
                        iters: Int = 3, fanout: Int = 16): Seq[(Long, Long, Int)] = {
    if (vecs.isEmpty) return Nil
    val dim = vecs.head._2.length
    require(dim % m == 0)
    val ds = dim / m
    val coarse = twinKmeans(vecs, nList, iters, fanout)
    val cById: Map[Long, Array[Float]] = coarse.toMap
    val assign: Map[Long, Long] =
      vecs.map { case (id, v) => id -> twinNearest(v, coarse)._1 }.toMap
    val resids: Seq[(Long, Array[Float])] = vecs.map { case (id, v) =>
      val cv = cById(assign(id))
      val r = new Array[Float](dim)
      var i = 0
      while (i < dim) { r(i) = v(i) - cv(i); i += 1 }
      (id, r)
    }
    val books: IndexedSeq[IndexedSeq[Array[Float]]] = (0 until m).map { s =>
      val sub = resids.map { case (id, r) =>
        (id, java.util.Arrays.copyOfRange(r, s * ds, (s + 1) * ds))
      }
      twinKmeansL2(sub, nCodes, iters, fanout).map(_._2).toIndexedSeq
    }
    val normSq: IndexedSeq[IndexedSeq[Double]] = books.map(_.map { cent =>
      var ns = 0.0; var i = 0
      while (i < cent.length) { ns += cent(i).toDouble * cent(i).toDouble; i += 1 }
      ns
    })
    def encode(r: Array[Float]): Array[Int] = Array.tabulate(m) { s =>
      var best = 0
      var bestD = Double.PositiveInfinity
      for (c <- books(s).indices) {
        var d = 0.0; var i = 0
        while (i < ds) {
          val t = r(s * ds + i).toDouble - books(s)(c)(i).toDouble
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val codes = resids.map { case (id, r) => (id, encode(r)) }.toMap
    // per-list denominator tables
    val denByList: Map[Long, IndexedSeq[IndexedSeq[Double]]] = coarse.map {
      case (cid, cv) =>
        cid -> (0 until m).map { s =>
          books(s).indices.map { j =>
            val b = books(s)(j)
            var dp = 0.0; var i = 0
            while (i < ds) { dp += cv(s * ds + i).toDouble * b(i).toDouble; i += 1 }
            2.0 * dp + normSq(s)(j)
          }
        }
    }.toMap
    vecs.filter(_._1 < queryMax).flatMap { case (qid, qv) =>
      var qn = 0.0
      var i = 0
      while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
      val qnorm = math.sqrt(qn)
      val lut: IndexedSeq[IndexedSeq[Double]] = (0 until m).map { s =>
        books(s).map { cent =>
          var ip = 0.0; var t = 0
          while (t < ds) { ip += qv(s * ds + t).toDouble * cent(t).toDouble; t += 1 }
          ip / qnorm
        }
      }
      val probed: Seq[Long] = coarse.map { case (cid, cv) => (cosine(qv, cv), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(nProbe).map(_._2)
      val probedSet = probed.toSet
      // per probed list: dqc and |c|² with index-ascending accumulation
      val listConst: Map[Long, (Double, Double)] = probed.map { lid =>
        val cv = cById(lid)
        var dq = 0.0; var c2 = 0.0; var x = 0
        while (x < cv.length) {
          dq += qv(x).toDouble * cv(x).toDouble
          c2 += cv(x).toDouble * cv(x).toDouble
          x += 1
        }
        lid -> ((dq / qnorm, c2))
      }.toMap
      vecs.iterator
        .filter { case (nid, _) => nid != qid && probedSet.contains(assign(nid)) }
        .map { case (nid, _) =>
          val lid = assign(nid)
          val (dqc, c2) = listConst(lid)
          val code = codes(nid)
          val den = denByList(lid)
          var ip = 0.0; var ns = 0.0
          for (s <- 0 until m) { ip += lut(s)(code(s)); ns += den(s)(code(s)) }
          (sparkRound((dqc + ip) / math.sqrt(c2 + ns), 9), nid)
        }
        .toSeq
        .sortBy { case (s, nid) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((_, nid), r) => (qid, nid, r + 1) }
    }
  }

  def q66IvfTrained(vecs: Seq[(Long, Array[Float])], queryMax: Long = 20L,
                    k: Int = 10, nList: Int = 16, nProbe: Int = 4,
                    iters: Int = 3, fanout: Int = 16): Seq[(Long, Long, Int)] = {
    if (vecs.isEmpty) return Nil
    val cents = twinKmeans(vecs, nList, iters, fanout)
    val assigned = vecs.map { case (id, v) => (id, v, twinNearest(v, cents)._1) }
    vecs.filter(_._1 < queryMax).flatMap { case (qid, qv) =>
      val probes = cents.map { case (cid, cv) => (cosine(qv, cv), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(nProbe).map(_._2).toSet
      assigned.iterator
        .filter(a => probes.contains(a._3) && a._1 != qid)
        .map { case (nid, nv, _) => (cosine(qv, nv), nid) }
        .toSeq
        .sortBy { case (s, nid) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((_, nid), r) => (qid, nid, r + 1) }
    }
  }

  /** q67 rows: SemDeDup — k-means clusters (twinKmeans), exact all-pairs
    * cosine >= threshold WITHIN each cluster (plain O(c^2) scan — no
    * blocking; the production triangle-blocked join is the part under
    * test), duplicate groups = union-find components of the pair graph,
    * keeper = the member LEAST similar to its cluster centroid (ties to
    * min vec_id). Output (vec_id, group_id = component min id, keep). */
  def q67SemDedup(vecs: Seq[(Long, Array[Float])], threshold: Double = 0.4,
                  nList: Int = 16, iters: Int = 3,
                  fanout: Int = 16): Seq[(Long, Long, Boolean)] = {
    if (vecs.isEmpty) return Nil
    val cents = twinKmeans(vecs, nList, iters, fanout)
    val assign = vecs.map { case (id, v) =>
      val (cid, sim) = twinNearest(v, cents); (id, v, cid, sim)
    }
    val edges = assign.groupBy(_._3).valuesIterator.flatMap { members =>
      val m = members.sortBy(_._1).toIndexedSeq
      for {
        i <- m.indices.iterator
        j <- (i + 1 until m.length).iterator
        if cosine(m(i)._2, m(j)._2) >= threshold
      } yield (m(i)._1, m(j)._1)
    }.toSeq
    // union-find, min-id component labels
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val label = byRoot.flatMap { case (_, ms) =>
      val g = ms.min; ms.map(_ -> g)
    }
    val centCos = assign.map(a => a._1 -> a._4).toMap
    val keeper = byRoot.values.map { ms =>
      ms.minBy(id => (centCos(id), id))
    }.toSet
    assign.sortBy(_._1).map { case (id, _, _, _) =>
      label.get(id) match {
        case Some(g) => (id, g, keeper.contains(id))
        case None    => (id, id, true)
      }
    }
  }

  /** q68 rows: CCNet-style paragraph dedup over the synthetic paragraph
    * enrichment — both re-derived from spec: paragraphs = chunks of
    * `4 + docId % 5` tokens space-joined; the corpus-wide FIRST occurrence
    * of each distinct paragraph (by doc_id, then position) survives, every
    * other occurrence (including later ones in the same doc) is excised.
    * Independent two-pass HashMap algorithm (no shared production code). */
  def q68ParagraphDedup(docs: Seq[Doc]): Seq[(Long, Long, Long, String)] = {
    val enriched = docs.sortBy(_.docId).map { d =>
      val cs = (4 + (d.docId % 5)).toInt
      (d.docId, splitKeepAll(d.text).grouped(cs).map(_.mkString(" ")).toVector)
    }
    val first = scala.collection.mutable.HashMap[String, (Long, Int)]()
    enriched.foreach { case (id, ps) =>
      ps.zipWithIndex.foreach { case (p, i) =>
        if (!first.contains(p)) first(p) = (id, i)
      }
    }
    enriched.map { case (id, ps) =>
      val kept = ps.zipWithIndex.collect { case (p, i) if first(p) == ((id, i)) => p }
      (id, ps.length.toLong, (ps.length - kept.length).toLong, kept.mkString("\n"))
    }
  }

  /** q76 rows: Bloom-filter dedup of the incoming snapshot (docId % 3 == 0)
    * against the base corpus (docId % 3 != 0), paragraphs re-derived from
    * the q68 enrichment spec. The filter is re-implemented from the
    * documented formula alone — Kirsch–Mitzenmacher double hashing,
    * pos_i = floorMod(xxhash64(p, seed) + i * xxhash64(p, seed+1), m) —
    * over a plain long-array bitset; shares only the Xxh64 primitive with
    * production. An incoming paragraph is excised iff all k bits are set
    * (false positives and all). */
  def q76BloomDedup(docs: Seq[Doc], mBits: Int = 1 << 22, k: Int = 7,
                    seed: Long = 42L): Seq[(Long, Long, Long, String)] = {
    def paras(d: Doc): Vector[String] =
      splitKeepAll(d.text).grouped((4 + (d.docId % 5)).toInt).map(_.mkString(" ")).toVector
    def positions(p: String): IndexedSeq[Long] = {
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h1 = Xxh64.hashBytes(b, seed)
      val h2 = Xxh64.hashBytes(b, seed + 1L)
      (0 until k).map(i => java.lang.Math.floorMod(h1 + i.toLong * h2, mBits.toLong))
    }
    val bits = new Array[Long](mBits / 64)
    docs.filter(_.docId % 3 != 0).foreach(d => paras(d).foreach(p =>
      positions(p).foreach(pos => bits((pos >>> 6).toInt) |= 1L << (pos & 63L))))
    docs.filter(_.docId % 3 == 0).sortBy(_.docId).map { d =>
      val ps = paras(d)
      val kept = ps.filterNot(p =>
        positions(p).forall(pos => (bits((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L))
      (d.docId, ps.length.toLong, (ps.length - kept.length).toLong, kept.mkString("\n"))
    }
  }

  /** q77 rows: hashed-gram linear quality classifier, re-derived from the
    * documented formula (single-space tokens; every unigram and space-
    * joined bigram occurrence; bucket = floorMod(xxhash64(gram), F);
    * weight = floorMod(xxhash64("w", bucket-as-long... ) — see
    * TextStats.classifierWeights), independent per-doc gram loop over
    * materialized gram STRINGS (production hashes byte spans in place). */
  def q77QualityClassifier(docs: Seq[Doc], numBuckets: Int = 1 << 18)
      : Seq[(Long, Long, Long, Boolean)] = {
    val wBase = Xxh64.hashString("w", Xxh64.SparkSeed)
    def weight(bucket: Long): Long =
      Math.floorMod(Xxh64.hashLong(bucket, wBase), 2001L) - 1000L
    docs.sortBy(_.docId).map { d =>
      val ts = splitKeepAll(d.text)
      val grams = ts.toIndexedSeq ++
        (0 until ts.length - 1).map(i => ts(i) + " " + ts(i + 1))
      val logit = grams.foldLeft(0L) { (acc, g) =>
        acc + weight(Math.floorMod(Xxh64.hashString(g, Xxh64.SparkSeed), numBuckets.toLong))
      }
      (d.docId, (2L * ts.length - 1L), logit, logit > 0L)
    }
  }

  /** q69 rows: DSIR gumbel top-k selection. Char-n-gram models re-derived
    * from the expression spec (code-point windows); counts/totals per the
    * lmTrain contract (total counted BEFORE min-count flooring; unseen
    * grams take floor count 1); mean logprob rounded to 6 decimals — the
    * rounding absorbs summation-order differences, and every downstream
    * number (`log_w = (lp_t - lp_r) * n_grams`, the gumbel key) is then
    * bit-deterministic from the rounded values. Gumbel noise re-derives
    * the production xxhash64(doc_id, seed) -> uniform -> -ln(-ln(u))
    * chain with StrictMath (Spark's Log uses StrictMath.log). */
  def q69Dsir(docs: Seq[Doc], targetLang: String = "en", k: Int = 100,
              n: Int = 3, minCount: Long = 1L,
              seed: Long = 7L): Seq[(Long, Double, Int)] = {
    def grams(t: String): IndexedSeq[String] = {
      val cps = t.codePoints.toArray
      if (cps.length < n) IndexedSeq.empty
      else (0 to cps.length - n).map(i => new String(cps, i, n))
    }
    def model(ds: Seq[Doc]): (Map[String, Long], Double) = {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
      ds.foreach(d => grams(d.text).foreach(g => cnt(g) += 1))
      val tot = cnt.valuesIterator.sum.toDouble
      (cnt.filter(_._2 >= minCount).toMap, tot)
    }
    val (mT, totT) = model(docs.filter(_.lang == targetLang))
    val (mR, totR) = model(docs)
    def lp(gs: IndexedSeq[String], m: Map[String, Long], tot: Double): Double =
      sparkRound(gs.iterator.map(g =>
        StrictMath.log(m.getOrElse(g, 1L).toDouble / tot)).sum / gs.length, 6)
    val scored = docs.iterator
      .map(d => (d, grams(d.text))).filter(_._2.nonEmpty)
      .map { case (d, gs) =>
        val logW = (lp(gs, mT, totT) - lp(gs, mR, totR)) * gs.length
        val pm = {
          val h = Xxh64.sparkChain(Seq[Any](d.docId, seed))
          ((h % 1000000000L) + 1000000000L) % 1000000000L
        }
        val u = (pm.toDouble + 0.5) / 1.0e9
        (d.docId, logW, logW - StrictMath.log(-StrictMath.log(u)))
      }.toVector
    scored.sortBy { case (id, _, gk) => (-gk, id) }.take(k).zipWithIndex
      .map { case ((id, w, _), i) => (id, sparkRound(w, 6), i + 1) }
  }

  // --------------------------------------------------------- scalar ops

  /** Independent fingerprint twin: the documented polynomial
    * h' = (h*257 + c + 1) mod 2^61-1 in plain BigInt modular arithmetic —
    * no 64-bit folding tricks shared with `TextStats.fingerprint64`
    * (building this twin exposed a lost-carry edge case in the production
    * fold, fixed in round 3; equality is property- and wrap-state-tested
    * in GoldenTwinSpec). */
  def fingerprintBigInt(text: String): Long = {
    val M = BigInt(2).pow(61) - 1
    var h = BigInt(0)
    var i = 0
    while (i < text.length) { h = (h * 257 + text.charAt(i).toInt + 1) % M; i += 1 }
    h.toLong
  }

  /** q33 rows: (doc_id, fingerprint). */
  def q33Fingerprints(docs: Seq[Doc]): Seq[(Long, Long)] =
    docs.map(d => (d.docId, fingerprintBigInt(d.text)))

  /** Generic packing twin over (doc_id, count) pairs: hash buckets,
    * per-bucket doc_id order, cumulative budget. */
  def packCounts(idCounts: Seq[(Long, Long)], budget: Long,
                 buckets: Int = 64): Seq[(Long, Long, Int, Long)] =
    idCounts.map { case (id, n) =>
      val h = Xxh64.hashLong(id, Xxh64.SparkSeed)
      (id, n, (((h % buckets) + buckets) % buckets).toInt)
    }
      .groupBy(_._3).valuesIterator.flatMap { group =>
        var before = 0L
        group.sortBy(_._1).map { case (id, n, b) =>
          val row = (id, n, b, before / budget)
          before += n
          row
        }
      }.toSeq

  /** q51 rows: whitespace-token packing. */
  def q51Pack(docs: Seq[Doc], budget: Long, buckets: Int = 64): Seq[(Long, Long, Int, Long)] =
    packCounts(docs.map(d => d.docId -> splitKeepAll(d.text).length.toLong), budget, buckets)

  /** q65 rows: packs budgeted in BPE SUBWORD units (the twin's own
    * 20-merge segmentation supplies the counts). */
  def q65PackBySubwords(docs: Seq[Doc], numMerges: Int = 20,
                        budget: Long = 512L): Seq[(Long, Long, Int, Long)] =
    packCounts(q61BpeSegment(docs, numMerges).map(r => r._1 -> r._3), budget)

  /** q74 rows: temperature-scaled source mixing — per-source counts,
    * pct = max(1, HALF_UP(100 * (n/n_min)^(alpha-1))) (Math.pow on the
    * same JVM, sparkRound-style HALF_UP over the decimal form), then the
    * q38 hash-keep rule. (doc_id, source, pct). */
  def q74TemperatureMixture(docs: Seq[Doc],
                            alpha: Double = 0.3): Seq[(Long, String, Int)] = {
    val counts = docs.groupBy(_.source).view.mapValues(_.size.toLong).toMap
    val nMin = counts.values.min.toDouble
    val rates = counts.map { case (s, n0) =>
      s -> math.max(1L,
        java.math.BigDecimal.valueOf(100.0 * math.pow(n0 / nMin, alpha - 1))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).toInt
    }
    docs.filter { d =>
      ((Xxh64.hashLong(d.docId, Xxh64.SparkSeed) % 100) + 100) % 100 < rates(d.source)
    }.map(d => (d.docId, d.source, rates(d.source)))
  }

  /** q54 rows: (doc_id, source) kept by deterministic source-mixture
    * sampling — per-source percent rates, `defaultPct` for unlisted
    * sources, the q38 hash-keep rule per row. */
  def q54MixtureSample(docs: Seq[Doc], rates: Map[String, Int],
                       defaultPct: Int): Seq[(Long, String)] =
    docs.filter { d =>
      val pct = rates.getOrElse(d.source, defaultPct)
      ((Xxh64.hashLong(d.docId, Xxh64.SparkSeed) % 100) + 100) % 100 < pct
    }.map(d => (d.docId, d.source))

  // ---- synthetic-image twin: the PNG spec re-derived ANALYTICALLY --------
  // (dims + pixel formula written independently of Multimodal.synthPixelRgb;
  // the twin never decodes a PNG — it knows the source pixels in closed
  // form, so agreement exercises production's real ImageIO decode path.
  // The PNG container encoding itself is the JDK's ImageIO on both sides.)

  def twinImageDims(docId: Long): (Int, Int) =
    ((16L + docId % 48L).toInt, (16L + docId % 32L).toInt) // corpus ids >= 0

  /** q170: aHash predicted ANALYTICALLY from the closed-form pixel spec —
    * 8×8 nearest-neighbor grayscale, bit = gray > floor(mean) — without
    * ever decoding a PNG, so the golden certifies production's real
    * ImageIO decode + integer hash end to end. */
  def q170ImageHashes(docs: Seq[Doc]): Seq[(Long, Long)] =
    docs.filter(_.docId % 3 == 0).map { d =>
      val (w, h) = twinImageDims(d.docId)
      val g = Array.tabulate(64) { i =>
        val px = twinPixel(d.docId, (i % 8) * w / 8, (i / 8) * h / 8)
        ((((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)) / 3).toLong
      }
      val mean = g.sum / 64
      var bits = 0L
      for (i <- 0 until 64) if (g(i) > mean) bits |= (1L << i)
      (d.docId, bits)
    }

  def twinPixel(docId: Long, x: Int, y: Int): Int = {
    val r = ((7L * x + 13L * y + docId) % 256L).toInt
    val g = ((3L * x + 5L * y + 2L * docId) % 256L).toInt
    val b = ((x.toLong + y.toLong + 3L * docId) % 256L).toInt
    (r << 16) | (g << 8) | b
  }

  private def pngEncode(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def twinPngBytes(docId: Long): Array[Byte] = {
    val (w, h) = twinImageDims(docId)
    pngEncode(w, h, (x, y) => twinPixel(docId, x, y))
  }

  /** The twin's OWN re-derivation of the synthetic-audio spec (the
    * `Multimodal.synthAudioSpec` scaladoc contract — no shared code):
    * rate = 8000·(1 + id mod 3) Hz, channels = 1 + id mod 2,
    * frames = 256 + id mod 512. Returns (rate, channels, frames). */
  def twinAudioSpec(docId: Long): (Int, Int, Int) = {
    val rate = 8000 * (1 + (((docId % 3) + 3) % 3)).toInt
    val channels = 1 + (((docId % 2) + 2) % 2).toInt
    val frames = 256 + (((docId % 512) + 512) % 512).toInt
    (rate, channels, frames)
  }

  /** Canonical RIFF PCM size the codec must emit for that spec: a
    * 44-byte header + 16-bit samples — predicted WITHOUT the codec. */
  def twinWavBytes(docId: Long): Long = {
    val (_, channels, frames) = twinAudioSpec(docId)
    44L + frames.toLong * channels * 2
  }

  /** The documented amp formula, re-derived: ((31·id + 7·i + 13·c) mod
    * 65536) − 32768. */
  def twinAmp(docId: Long, frame: Int, channel: Int): Int =
    ((((31L * docId + 7L * frame + 13L * channel) % 65536L) + 65536L) % 65536L).toInt - 32768

  /** The 8-dim audio feature predicted analytically: mean |amp| of
    * channel 0 over 8 equal frame segments, Long sum then one double
    * division per segment (/32768) — the decode scaladoc's contract. */
  def twinAudioFeature(docId: Long): Array[Float] = {
    val (_, _, frames) = twinAudioSpec(docId)
    Array.tabulate(8) { s =>
      val lo = s * frames / 8; val hi = (s + 1) * frames / 8
      var sum = 0L
      var j = lo
      while (j < hi) { sum += math.abs(twinAmp(docId, j, 0).toLong); j += 1 }
      if (hi > lo) (sum.toDouble / ((hi - lo) * 32768.0)).toFloat else 0f
    }
  }

  /** q174 rows: (doc_id, sample_rate, channels, n_frames, n_bytes) for
    * audio docs (doc_id % 3 == 1) — every field analytic, no codec. */
  def q174AudioMeta(docs: Seq[Doc]): Seq[(Long, Long, Long, Long, Long)] =
    docs.filter(d => d.docId % 3 == 1).map { d =>
      val (rate, channels, frames) = twinAudioSpec(d.docId)
      (d.docId, rate.toLong, channels.toLong, frames.toLong, twinWavBytes(d.docId))
    }

  /** The twin's OWN re-derivation of the synthetic-video spec (the
    * `Multimodal.synthVideoSpec` scaladoc contract — no shared code):
    * w = 16 + id mod 24, h = 16 + id mod 16, frames = 4 + id mod 12;
    * frame f pixel (x, y) = gray (5x + 11y + 17f + id) mod 256. */
  def twinVideoSpec(docId: Long): (Int, Int, Int) =
    ((16L + docId % 24L).toInt, (16L + docId % 16L).toInt,
      (4L + docId % 12L).toInt) // corpus ids >= 0

  def twinVideoGray(docId: Long, f: Int, x: Int, y: Int): Int =
    (((5L * x + 11L * y + 17L * f + docId) % 256L + 256L) % 256L).toInt

  /** The twin's OWN animated-GIF construction from its own pixel spec
    * (the GIF container encoding itself is the JDK's ImageIO on both
    * sides, as with PNG — the twin never DECODES a GIF, so agreement
    * certifies production's real ImageReader sequence path). */
  def twinGifBytes(docId: Long): Array[Byte] = {
    val (w, h, nf) = twinVideoSpec(docId)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until nf) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        for (y <- 0 until h; x <- 0 until w)
          img.getRaster.setSample(x, y, 0, twinVideoGray(docId, f, x, y))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** The decode feature predicted analytically: mean gray of frame s·n/8
    * per segment s (Long pixel sum, one double division, /255) — the
    * `decodeGif` scaladoc contract, no codec anywhere. */
  def twinVideoFeature(docId: Long): Array[Float] = {
    val (w, h, nf) = twinVideoSpec(docId)
    Array.tabulate(8) { s =>
      val fi = s * nf / 8
      var sum = 0L
      for (y <- 0 until h; x <- 0 until w) sum += twinVideoGray(docId, fi, x, y).toLong
      (sum.toDouble / (w.toLong * h * 255.0)).toFloat
    }
  }

  /** q175 rows: (doc_id, frame_idx, ahash) for video docs — the aHash of
    * every `stride`-th frame predicted ANALYTICALLY from the closed-form
    * gray spec (8×8 nearest-neighbor sample, bit = gray > floor(mean)),
    * never decoding a GIF — certifying production's real per-frame
    * ImageReader decode + integer hash end to end. */
  /** One frame's aHash predicted analytically (8×8 NN sample of the
    * closed-form gray, bit = gray > floor(mean)) — never decodes a GIF. */
  def twinFrameHash(docId: Long, fi: Int): Long = {
    val (w, h, _) = twinVideoSpec(docId)
    val g = Array.tabulate(64) { i =>
      twinVideoGray(docId, fi, (i % 8) * w / 8, (i / 8) * h / 8).toLong
    }
    val mean = g.sum / 64
    var bits = 0L
    for (i <- 0 until 64) if (g(i) > mean) bits |= (1L << i)
    bits
  }

  def q175VideoFrameHashes(docs: Seq[Doc], stride: Int = 4): Seq[(Long, Long, Long)] =
    docs.filter(_.docId % 3 == 2).flatMap { d =>
      val (_, _, nf) = twinVideoSpec(d.docId)
      (0 until nf by stride).map(fi => (d.docId, fi.toLong, twinFrameHash(d.docId, fi)))
    }

  /** q176 rows: (doc1, doc2, matched1, matched2, n1, n2) — the
    * DEFINITIONAL video near-dup semantics computed quadratically over
    * every cross-video sampled-frame pair (no banding, no caps): a frame
    * matches when the analytic aHashes are within `maxHamming`, a pair
    * survives when >= `minMatchPct`% of EACH side's sampled frames match
    * (integer cross-multiplication, like production). Pigeonhole makes
    * production's 4×16-band join lossless at maxHamming <= 3, so the two
    * computations must agree exactly while sharing no plan. Mirrors the
    * query's planted +768 union: by the synthetic-video spec all of
    * dims (mod 24/16), gray (mod 256) and frame count (mod 12) align at
    * id + 768 (and 768 ≡ 0 mod 3 keeps the row a video), so every
    * planted copy is a bit-identical GIF — guaranteed recall targets. */
  def q176VideoNearDup(docs: Seq[Doc], stride: Int = 4, maxHamming: Int = 3,
                       minMatchPct: Int = 50): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val base = docs.map(_.docId).filter(_ % 3 == 2)
    val ids = (base ++ base.map(_ + 768L)).distinct.sorted
    val fh: Array[(Long, Int, Long)] = ids.toArray.flatMap { id =>
      val (_, _, nf) = twinVideoSpec(id)
      (0 until nf by stride).map(fi => (id, fi, twinFrameHash(id, fi)))
    }
    val n: Map[Long, Long] =
      fh.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val m1 = scala.collection.mutable.Map.empty[(Long, Long), scala.collection.mutable.Set[Int]]
    val m2 = scala.collection.mutable.Map.empty[(Long, Long), scala.collection.mutable.Set[Int]]
    var i = 0
    while (i < fh.length) {
      var j = i + 1
      while (j < fh.length) {
        val (id1, f1, h1) = fh(i); val (id2, f2, h2) = fh(j)
        if (id1 != id2 && java.lang.Long.bitCount(h1 ^ h2) <= maxHamming) {
          val key = if (id1 < id2) (id1, id2) else (id2, id1)
          val (fa, fb) = if (id1 < id2) (f1, f2) else (f2, f1)
          m1.getOrElseUpdate(key, scala.collection.mutable.Set.empty) += fa
          m2.getOrElseUpdate(key, scala.collection.mutable.Set.empty) += fb
        }
        j += 1
      }
      i += 1
    }
    m1.keys.toSeq.sorted.flatMap { case (d1, d2) =>
      val (c1, c2) = (m1((d1, d2)).size.toLong, m2((d1, d2)).size.toLong)
      val (n1, n2) = (n(d1), n(d2))
      if (c1 * 100 >= minMatchPct.toLong * n1 && c2 * 100 >= minMatchPct.toLong * n2)
        Some((d1, d2, c1, c2, n1, n2))
      else None
    }
  }

  /** q34 rows: (doc_id, media_type, n_bytes) — image/video rows sized by
    * the twin's own PNG/GIF construction from its own pixel specs, audio
    * rows by the analytic RIFF size prediction (real codecs decode all
    * three downstream). */
  def q34MultimodalMeta(docs: Seq[Doc]): Seq[(Long, String, Long)] =
    docs.map { d =>
      (d.docId % 3) match {
        case 0 => (d.docId, "image/png", twinPngBytes(d.docId).length.toLong)
        case 1 => (d.docId, "audio/wav", twinWavBytes(d.docId))
        case _ => (d.docId, "video/gif", twinGifBytes(d.docId).length.toLong)
      }
    }

  /** q49 rows: the batched resize twin — image rows via the ANALYTIC
    * pixel spec (own aspect-fit + nearest-neighbor sampling of the closed-
    * form source, no decode anywhere); video rows the same move over the
    * closed-form FRAME-0 gray spec (the poster-frame PNG thumbnail
    * production re-encodes after its real GIF decode). */
  def q49Resize(docs: Seq[Doc], box: Int = 256): Seq[Multimodal.Resized] =
    docs.flatMap { d =>
      val mt = (d.docId % 3) match {
        case 0 => "image/png"
        case 1 => "audio/wav"
        case _ => "video/gif"
      }
      if (mt.startsWith("audio")) None
      else if (mt == "image/png") {
        val (w, h) = twinImageDims(d.docId)
        val scale = math.min(1.0, box.toDouble / math.max(w, h))
        val ow = math.max(1, math.round(w * scale).toInt)
        val oh = math.max(1, math.round(h * scale).toInt)
        val thumb = pngEncode(ow, oh,
          (ox, oy) => twinPixel(d.docId, ox * w / ow, oy * h / oh))
        Some(Multimodal.Resized(d.docId, mt, w, h, ow, oh, thumb))
      } else {
        val (w, h, _) = twinVideoSpec(d.docId)
        val scale = math.min(1.0, box.toDouble / math.max(w, h))
        val ow = math.max(1, math.round(w * scale).toInt)
        val oh = math.max(1, math.round(h * scale).toInt)
        val thumb = pngEncode(ow, oh, (ox, oy) => {
          val g = twinVideoGray(d.docId, 0, (ox.toLong * w / ow).toInt, (oy.toLong * h / oh).toInt)
          (g << 16) | (g << 8) | g
        })
        Some(Multimodal.Resized(d.docId, mt, w, h, ow, oh, thumb))
      }
    }

  /** The twin's OWN re-derivation of the DISCLOSED stub codec spec
    * (`Multimodal.decodeStub`/`resizeStub` scaladoc) — no shared code
    * (equality proven in GoldenTwinSpec): standard FNV-1a 64 over the
    * blob bytes (sign-extended, per the spec), width/height = 64 + 10-bit
    * hash windows, video frames = 1 + floorMod(h >>> 20, 240); rendition
    * bytes from the documented xorshift64 (13/7/17, zero-guarded) seeded
    * by hash XOR packed output dims; aspect fit = round(min(1, box/max)
    * scale), floored at 1. */
  def twinStubDims(mt: String, blob: Array[Byte]): (Int, Int, Int) = {
    val h = twinFnvBytes(blob)
    (64 + Math.floorMod(h, 1024L).toInt,
      64 + Math.floorMod(h >>> 10, 1024L).toInt,
      if (mt.startsWith("video")) 1 + Math.floorMod(h >>> 20, 240L).toInt else 1)
  }

  def twinStubResize(blob: Array[Byte], w: Int, h: Int, box: Int): (Int, Int, Array[Byte]) = {
    val scale = math.min(1.0, box.toDouble / math.max(w, h))
    val ow = math.max(1, math.round(w * scale).toInt)
    val oh = math.max(1, math.round(h * scale).toInt)
    var s = twinFnvBytes(blob) ^ ((ow.toLong << 32) | (oh.toLong & 0xffffffffL))
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) { s = twinXorshift(s); out(k) = (s >>> 56).toByte; k += 1 }
    (ow, oh, out)
  }

  private def twinFnvBytes(blob: Array[Byte]): Long = {
    var h = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
    blob.foreach { b => h ^= b; h *= 0x100000001b3L }
    h
  }

  private def twinXorshift(x0: Long): Long = {
    var x = if (x0 == 0L) java.lang.Long.parseUnsignedLong("9e3779b97f4a7c15", 16) else x0
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    x
  }

  /** q35 rows: (doc_id, n_sampled) for video docs (doc_id % 3 == 2) —
    * the real frame count from the ANALYTIC video spec (production reads
    * it from the actual GIF bitstream). */
  def q35FrameSamples(docs: Seq[Doc], stride: Int = 10): Seq[(Long, Long)] =
    docs.filter(d => d.docId % 3 == 2).map { d =>
      val (_, _, nFrames) = twinVideoSpec(d.docId)
      (d.docId, ((nFrames - 1) / stride + 1).toLong)
    }

  /** q63 rows: (doc_id, n_tokens, n_removed, text_clean) — duplicated-span
    * removal twin. Independent shape: two sequential passes with a HashMap
    * (first-occurrence wins under ascending (doc_id, pos) iteration order,
    * which equals the production min-struct aggregate), position marking
    * with a boolean array. */
  def q63RemoveDupSpans(docs: Seq[Doc], k: Int): Seq[(Long, Long, Long, String)] = {
    val sorted = docs.sortBy(_.docId)
    val firstAt = collection.mutable.HashMap.empty[String, (Long, Int)]
    val occs = collection.mutable.HashMap.empty[String, Long]
    def windows(toks: Array[String]): Iterator[(Int, String)] =
      (0 to toks.length - k).iterator.map(p => p -> toks.slice(p, p + k).mkString("\u0001"))  // escape, not a literal control char: round-3 reviews misread the (invisible) literal as an empty-string join
    for (d <- sorted; (p, w) <- windows(splitKeepAll(d.text))) {
      occs(w) = occs.getOrElse(w, 0L) + 1L
      if (!firstAt.contains(w)) firstAt(w) = (d.docId, p)
    }
    sorted.map { d =>
      val toks = splitKeepAll(d.text)
      val removed = new Array[Boolean](toks.length)
      for ((p, w) <- windows(toks)
           if occs(w) > 1L && firstAt(w) != ((d.docId, p));
           i <- p until p + k) removed(i) = true
      val kept = toks.indices.filterNot(removed).map(toks)
      (d.docId, toks.length.toLong, removed.count(identity).toLong,
        if (removed.exists(identity)) kept.mkString(" ") else d.text)
    }
  }

  /** CODE-POINT lexicographic string order — equals UTF-8 byte order (the
    * tie-break the distributed argmax uses via Spark's string sort), but
    * derived independently: code points compared numerically, not bytes. */
  private val cpOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.codePoints().toArray
      val y = b.codePoints().toArray
      var i = 0
      while (i < x.length && i < y.length) {
        if (x(i) != y(i)) return Integer.compare(x(i), y(i))
        i += 1
      }
      Integer.compare(x.length, y.length)
    }
  }

  /** q60 rows: textbook sequential BPE (Sennrich et al. get_stats /
    * merge_vocab structure — INDEPENDENT of ops.Bpe: string-keyed word
    * table, space-joined symbol strings, regex-free split merge), same
    * deterministic tie-break (max freq, then smallest (left, right)). */
  def q60BpeMerges(docs: Seq[Doc], numMerges: Int,
                   minPairFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    // vocab: word -> count, words represented as space-joined char symbols
    var vocab = collection.mutable.HashMap.empty[String, Long]
    for (d <- docs; w <- d.text.split(' ') if w.nonEmpty) {
      // independent code-point split (surrogate-pair walk, not codePoints())
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        if (i > 0) sb.append(' ')
        if (Character.isHighSurrogate(w.charAt(i)) && i + 1 < w.length &&
            Character.isLowSurrogate(w.charAt(i + 1))) {
          sb.append(w.charAt(i)).append(w.charAt(i + 1)); i += 2
        } else { sb.append(w.charAt(i)); i += 1 }
      }
      val key = sb.toString
      vocab(key) = vocab.getOrElse(key, 0L) + 1L
    }
    val out = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val stats = collection.mutable.HashMap.empty[(String, String), Long]
      for ((word, c) <- vocab) {
        val syms = word.split(' ')
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          stats(p) = stats.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (stats.isEmpty) done = true
      else {
        val ((l, r), f) = stats.minBy { case ((a, b), n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, cpOrdering, cpOrdering))
        if (f < minPairFreq) done = true
        else {
          out += ((rank, l, r, f))
          val next = collection.mutable.HashMap.empty[String, Long]
          for ((word, c) <- vocab) {
            val syms = word.split(' ')
            val merged = collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                merged += l + r; i += 2
              } else { merged += syms(i); i += 1 }
            }
            val key = merged.mkString(" ")
            next(key) = next.getOrElse(key, 0L) + c
          }
          vocab = next
          rank += 1
        }
      }
    }
    out.toSeq
  }

  /** Greedy rank-indexed BPE apply — the same spec as production
    * `Bpe.segmentWordGreedy` (merge the present pair with the SMALLEST
    * learned rank, all non-overlapping occurrences leftmost-first; repeat
    * until no adjacent pair has a rank), implemented independently:
    * immutable List + a full min-scan per pass, no memoization, no
    * rank-array indexing. */
  private def greedyApplyBpe(w: String, rank: Map[(String, String), Int]): List[String] = {
    var syms: List[String] = {
      val b = List.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = if (Character.isHighSurrogate(w.charAt(i)) && i + 1 < w.length &&
          Character.isLowSurrogate(w.charAt(i + 1))) 2 else 1
        b += w.substring(i, i + n); i += n
      }
      b.result()
    }
    var continue = syms.lengthCompare(1) > 0
    while (continue) {
      val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (present.isEmpty) continue = false
      else {
        val (_, (l, r)) = present.minBy(_._1)
        val b = List.newBuilder[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: bb :: tail if a == l && bb == r => b += (l + r); rest = tail
          case a :: tail => b += a; rest = tail
          case Nil => ()
        }
        syms = b.result()
        continue = syms.lengthCompare(1) > 0
      }
    }
    syms
  }

  /** q61/q64 rows: (doc_id, n_tokens, n_subwords, subword_str) after
    * segmenting with the twin's OWN merge list (q60BpeMerges) via the
    * greedy apply above. */
  def q61BpeSegment(docs: Seq[Doc], numMerges: Int,
                    minPairFreq: Long = 2L): Seq[(Long, Long, Long, String)] = {
    val merges = q60BpeMerges(docs, numMerges, minPairFreq).map { case (_, l, r, _) => (l, r) }
    val rank = merges.zipWithIndex.toMap
    docs.map { d =>
      val words = d.text.split(' ').filter(_.nonEmpty)
      val segs = words.map(w => greedyApplyBpe(w, rank))
      (d.docId, words.length.toLong, segs.iterator.map(_.length.toLong).sum,
        segs.iterator.flatten.mkString(" "))
    }
  }

  /** Vocabulary-enrichment twin of `Bpe.syntheticRichText`: every token
    * occurrence (INCLUDING empties from repeated spaces — Spark's transform
    * runs over split's keep-all output) gains the 1-2 hex-char suffix
    * hex(pmod(xxhash64(doc_id, i), 256)). */
  def enrichRichText(d: Doc): Doc = {
    val toks = splitKeepAll(d.text)
    val out = toks.zipWithIndex.map { case (t, i) =>
      val h = Xxh64.sparkChain(Seq[Any](d.docId, i))
      t + java.lang.Long.toHexString(((h % 256L) + 256L) % 256L)
        .toUpperCase(java.util.Locale.ROOT)
    }
    d.copy(text = out.mkString(" "))
  }

  /** q64 rows: the 2,000-merge production-scale tokenizer apply over the
    * enriched corpus (minPairFreq = 1 so the merge list reaches tokenizer
    * depth on the bounded synthetic vocabulary). */
  def q64BpeSegment2k(docs: Seq[Doc], numMerges: Int = 2000): Seq[(Long, Long, Long, String)] =
    q61BpeSegment(docs.map(enrichRichText), numMerges, minPairFreq = 1L)

  /** q70 rows: tokenizer ENCODE — the twin derives its OWN vocabulary
    * (base code points of the corpus minus the space separator, in
    * code-point order = UTF-8 byte order; then merge outputs by rank,
    * first occurrence keeps the id) and maps its own greedy segmentation
    * to ids. Returns (doc_id, n_subwords, ids_str space-joined). */
  def q70BpeEncode(docs: Seq[Doc], numMerges: Int = 20,
                   minPairFreq: Long = 2L): Seq[(Long, Long, String)] = {
    val merges = q60BpeMerges(docs, numMerges, minPairFreq)
      .map { case (_, l, r, _) => (l, r) }
    val rank = merges.zipWithIndex.toMap
    val base = scala.collection.mutable.SortedSet.empty[String](cpOrdering)
    docs.foreach(_.text.codePoints().forEach { cp =>
      if (cp != ' ') base += new String(Character.toChars(cp))
    })
    val vocab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    (base.toSeq ++ merges.map { case (l, r) => l + r })
      .foreach(s => if (!vocab.contains(s)) vocab(s) = vocab.size)
    docs.map { d =>
      val segs = d.text.split(' ').filter(_.nonEmpty)
        .flatMap(w => greedyApplyBpe(w, rank))
      (d.docId, segs.length.toLong,
        segs.map(s => vocab.getOrElse(s, -1)).mkString(" "))
    }
  }

  /** q71 rows: pretraining pack assembly — the twin composes its OWN
    * encode (q70BpeEncode) and packing (packCounts) and concatenates each
    * pack's ids in ascending doc_id order. Returns
    * (bucket, pack_id, n_docs, n_subwords, ids_str). */
  def q71PackedIds(docs: Seq[Doc], numMerges: Int = 20, budget: Long = 512L,
                   buckets: Int = 64): Seq[(Int, Long, Long, Long, String)] = {
    val enc = q70BpeEncode(docs, numMerges)
    val byId = enc.map(e => e._1 -> e._3).toMap
    packCounts(enc.map(e => e._1 -> e._2), budget, buckets)
      .groupBy(r => (r._3, r._4)).toSeq
      .map { case ((bucket, pack), rows) =>
        val sorted = rows.sortBy(_._1)
        (bucket, pack, rows.size.toLong, rows.iterator.map(_._2).sum,
          sorted.map(r => byId(r._1)).filter(_.nonEmpty).mkString(" "))
      }
  }
}
