package graft.kg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * RDFS (ρdf-fragment) entailment materialization over the triple table:
 * given the ontology axioms subPropertyOf / subClassOf / domain / range,
 * emit the DEDUCTIVE CLOSURE of the instance triples under the standard
 * rules (Muñoz, Pérez & Gutierrez 2009, "Simple and Efficient Minimal
 * RDFS"):
 *
 *   sp:  (s, p, o) ∧ subPropertyOf⁺(p, q)  ⇒ (s, q, o)
 *   dom: (s, p, o) ∧ domain(p, c)           ⇒ (s, type, c)
 *   rng: (s, p, o) ∧ range(p, c)            ⇒ (o, type, c)
 *   sc:  (s, type, c) ∧ subClassOf⁺(c, d)   ⇒ (s, type, d)
 *
 * The fragment is STRATIFIED — no joint fixpoint: close subPropertyOf
 * and subClassOf transitively first (schema-only work), then one pass of
 * sp over the instances, then dom/rng over the sp-closed instances
 * (domain axioms on INFERRED predicates fire correctly because sp runs
 * first), then sc over the resulting type triples. `type` itself may not
 * appear in subPropertyOf (that re-entangles the strata; rejected
 * loudly).
 *
 * 100 TB shape: an ontology is KB-sized by definition, so the schema is
 * collected under a LOUD bound (`maxAxioms`), transitively closed ON THE
 * DRIVER (axiom-count work), and every instance-side rule is ONE
 * broadcast-joinable keyed equi-join over the triple scan — the corpus
 * is never joined against itself and never iterated; the only shuffle is
 * the final DISTINCT. Cycles in the schema DAGs are legal (mutually
 * sub-* terms entail each other's extensions); the closure is
 * irreflexive so sp/sc never emit the row they started from (the
 * original is already in the output by union).
 *
 * No reference analog: the reference stops at per-sentence NER output
 * (`NeuralNERMono/NeuralNER.py:352-381`); ontology entailment is part of
 * this engine's KG surface.
 */
object Rdfs {

  /** Transitive (irreflexive) closure of a driver-sized edge list. */
  private def close[A](edges: Seq[(A, A)]): Set[(A, A)] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val out = scala.collection.mutable.Set.empty[(A, A)]
    for (start <- adj.keys) {
      val seen = scala.collection.mutable.Set.empty[A]
      var frontier = adj(start)
      while (frontier.nonEmpty) {
        val fresh = frontier.diff(seen)
        seen ++= fresh
        frontier = fresh.flatMap(adj.getOrElse(_, Set.empty[A]))
      }
      out ++= (seen - start).map(start -> _)
    }
    out.toSet
  }

  private def collectBounded(df: DataFrame, what: String,
                             maxAxioms: Long): Array[Row] = {
    val rows = df.limit((maxAxioms + 1).toInt).collect()
    require(rows.length <= maxAxioms,
      s"$what has more than $maxAxioms axioms — not a driver-sized ontology; " +
        "raise maxAxioms deliberately if that is intended")
    rows
  }

  /**
   * Materialize the RDFS closure of `triples` (columns subj, pred, obj;
   * extra columns are dropped — entailment is set semantics).
   *
   * @param subProp  (sub: string, sup: string) subPropertyOf axioms
   * @param subClass (sub: long, sup: long) subClassOf axioms over class ids
   * @param domain   (pred: string, cls: long) domain axioms
   * @param range    (pred: string, cls: long) range axioms
   * @param typePred the rdf:type predicate name in this KG's vocabulary
   * @return DISTINCT (subj, pred, obj) — originals plus every entailment
   */
  def materialize(triples: DataFrame, subProp: DataFrame, subClass: DataFrame,
                  domain: DataFrame, range: DataFrame,
                  typePred: String = "type",
                  maxAxioms: Long = 100000L): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._

    val spAxioms = collectBounded(subProp.select(col("sub").cast("string"),
      col("sup").cast("string")), "subPropertyOf", maxAxioms)
      .map(r => (r.getString(0), r.getString(1)))
    require(!spAxioms.exists(a => a._1 == typePred || a._2 == typePred),
      s"'$typePred' may not appear in subPropertyOf (re-entangles the strata)")
    val scAxioms = collectBounded(subClass.select(col("sub").cast("long"),
      col("sup").cast("long")), "subClassOf", maxAxioms)
      .map(r => (r.getLong(0), r.getLong(1)))
    val spClosed = close(spAxioms.toSeq).toSeq
    val scClosed = close(scAxioms.toSeq).toSeq

    // the instance table feeds FIVE rule branches below; materialize once
    // so an expensive upstream plan (the NER pipeline) never re-runs
    val base = triples.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long")).localCheckpoint(true)

    // sp: one broadcast equi-join on the predicate name
    val spDf = spClosed.toDF("pred", "sup")
    val inferredSp = base.join(broadcast(spDf), Seq("pred"))
      .select(col("subj"), col("sup").as("pred"), col("obj"))
    val allProps = base.unionAll(inferredSp)

    // dom/rng over the sp-closed instance triples
    val domDf = domain.select(col("pred").cast("string"), col("cls").cast("long"))
    val rngDf = range.select(col("pred").cast("string"), col("cls").cast("long"))
    val domTypes = allProps.join(broadcast(domDf), Seq("pred"))
      .select(col("subj"), lit(typePred).as("pred"), col("cls").as("obj"))
    val rngTypes = allProps.join(broadcast(rngDf), Seq("pred"))
      .select(col("obj").as("subj"), lit(typePred).as("pred"),
        col("cls").as("obj"))

    // sc over every type triple (asserted or just inferred)
    val types = allProps.filter(col("pred") === lit(typePred))
      .unionAll(domTypes).unionAll(rngTypes)
    val scDf = scClosed.toDF("obj", "sup")
    val inferredSc = types.join(broadcast(scDf), Seq("obj"))
      .select(col("subj"), col("pred"), col("sup").as("obj"))

    allProps.unionAll(domTypes).unionAll(rngTypes).unionAll(inferredSc)
      .select(col("subj"), col("pred"), col("obj")).distinct()
  }

  /**
   * OWL-lite PROPERTY-RULE materialization — the owl:inverseOf /
   * owl:SymmetricProperty / owl:TransitiveProperty fragment, the three
   * property axioms a web-extracted KG actually ships (hasPart/partOf,
   * spouseOf, locatedIn):
   *
   *   inv: (s, p, o) ∧ inverseOf(p, q)       ⇒ (o, q, s)
   *   sym: (s, p, o) ∧ symmetric(p)           ⇒ (o, p, s)
   *   trn: (s, p, o) ∧ (o, p, w) ∧ trans(p)   ⇒ (s, p, w)
   *
   * symmetric(p) is exactly inverseOf(p, p), so both collapse into one
   * MAPPING alphabet {(src, dst, flip)} that is driver-closed to
   * fixpoint under composition — (p, q, f1) ∘ (q, r, f2) = (p, r,
   * f1 xor f2) — the same schema-on-the-driver discipline as
   * [[materialize]] (an ontology is KB-sized by definition; the bound
   * is LOUD). Instance derivation is then STRATIFIED, no joint
   * fixpoint:
   *
   *   1. ONE broadcast mapping pass over the triples,
   *   2. [[Graphs.transitiveClosure]] per transitive predicate on its
   *      AUGMENTED slice (semi-naive delta joins; the operator's
   *      hierarchy-slice contract applies — closing a dense relational
   *      predicate is a modeling error this engine surfaces),
   *   3. ONE more mapping pass over the closure output.
   *
   * Step 3 suffices because closure and inversion COMMUTE: if p maps to
   * q, then q's closure is exactly p's closure flipped, and p's step-2
   * input already contained every flipped q edge from step 1 — so no
   * derivation chain needs a second closure round (RdfsSpec proves this
   * against a naive run-all-rules-to-fixpoint twin). Result is the
   * DISTINCT union with the originals; closure inherits irreflexivity
   * (an original self-loop survives via the base union, but no rule
   * re-derives one).
   *
   * @param triples    rows with (subj, pred, obj); extra columns dropped
   * @param inverseOf  predicate pairs (p, q) — each implies the other
   * @param symmetric  predicates equal to their own inverse
   * @param transitive predicates to close (hierarchy-shaped slices only)
   * @param maxAxioms  loud bound on the derived mapping alphabet
   * @return DISTINCT (subj, pred, obj) — originals plus every entailment
   */
  def materializeOwl(triples: DataFrame, inverseOf: Seq[(String, String)],
                     symmetric: Seq[String], transitive: Seq[String],
                     maxAxioms: Long = 100000L): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val base = triples.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long")).distinct().localCheckpoint(true)

    // driver-closed mapping alphabet: (src, dst, flip)
    val seeds: Set[(String, String, Boolean)] =
      inverseOf.flatMap { case (p, q) => Seq((p, q, true), (q, p, true)) }.toSet ++
        symmetric.map(p => (p, p, true)).toSet
    var mappings = seeds
    require(mappings.size <= maxAxioms,
      s"mapping alphabet exceeds $maxAxioms seed axioms — not a " +
        "driver-sized ontology; raise maxAxioms deliberately if intended")
    var grew = true
    while (grew) {
      val composed = for {
        (a, b, f1) <- mappings
        (b2, c, f2) <- mappings if b2 == b
        m = (a, c, f1 ^ f2) if m._1 != m._2 || m._3 // drop identities
      } yield m
      val next = mappings ++ composed
      require(next.size <= maxAxioms,
        s"derived mapping alphabet exceeds $maxAxioms — not a driver-sized " +
          "ontology; raise maxAxioms deliberately if that is intended")
      grew = next.size > mappings.size
      mappings = next
    }

    def mapPass(t: DataFrame): DataFrame =
      if (mappings.isEmpty) t.limit(0)
      else {
        val mapDf = broadcast(
          mappings.toSeq.toDF("src_pred", "dst_pred", "flip"))
        t.join(mapDf, col("pred") === col("src_pred"))
          .select(
            when(col("flip"), col("obj")).otherwise(col("subj")).as("subj"),
            col("dst_pred").as("pred"),
            when(col("flip"), col("subj")).otherwise(col("obj")).as("obj"))
      }

    val augmented = base.unionAll(mapPass(base)).distinct().localCheckpoint(true)
    val closed = transitive.foldLeft(augmented) { (acc, p) =>
      val slice = augmented.filter(col("pred") === lit(p))
        .select(col("subj").as("src"), col("obj").as("dst"))
      acc.unionAll(Graphs.transitiveClosure(slice)
        .select(col("src").as("subj"), lit(p).as("pred"),
          col("dst").as("obj")))
    }
    closed.unionAll(mapPass(closed))
      .select(col("subj"), col("pred"), col("obj")).distinct()
  }
}
