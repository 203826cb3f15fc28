package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SPARQL-style basic-graph-pattern (BGP) matching over the materialized
 * triple table — the QUERY side of the KG: a conjunction of triple
 * patterns with shared variables compiles to a chain of equi-joins, the
 * classic SPARQL-to-relational lowering (each pattern is a filtered scan
 * of the triple table; a shared variable between two patterns is a join
 * key). Results are DISTINCT variable bindings (SPARQL set semantics —
 * the triple table is a mention-level bag, so each pattern scan
 * de-duplicates its projected binding columns first, on the narrow
 * projection, never the full row).
 *
 * Catalyst does the heavy lifting: the constant predicate/subject/object
 * filters reach the parquet scan (predicate pushdown + partition pruning
 * when the table is partitioned), every join is a keyed equi-join on
 * 8-byte entity ids (broadcast when a selective pattern makes one side
 * tiny, AQE otherwise), and column pruning keeps only bound variables
 * moving. Patterns must be CONNECTED (each pattern after the first shares
 * >= 1 variable with the patterns before it) — a disconnected pattern
 * would be a cartesian product, which is never what you want at 10^12
 * triples, so it throws instead of silently exploding.
 */
object Bgp {

  /** A term of a triple pattern: a named variable or an entity constant. */
  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(id: Long) extends Term

  /** One triple pattern: subject/object are variables or entity
    * constants; the predicate is always a constant (the common SPARQL
    * case, and the one that keeps every scan selective). */
  final case class Pattern(s: Term, p: String, o: Term)

  /** A SPARQL FILTER comparison over bound terms: `a op b` where `a` is
    * a variable and `b` a variable or constant. */
  sealed trait Cmp
  case object Lt extends Cmp; case object Le extends Cmp
  case object Gt extends Cmp; case object Ge extends Cmp
  case object EqTo extends Cmp; case object Ne extends Cmp
  final case class Filter(a: String, op: Cmp, b: Term)

  /**
   * Match a connected BGP; returns one column per distinct variable name.
   *
   * @param triples rows with (subj, pred, obj)
   * @param patterns the conjunctive pattern list
   */
  def matchBgp(triples: DataFrame, patterns: Seq[Pattern]): DataFrame = {
    val (joined, allVars) = joinRequired(triples, patterns)
    require(allVars.nonEmpty, "BGP binds no variables (all patterns constant)")
    joined.select(allVars.toSeq.sorted.map(col): _*).distinct()
  }

  /**
   * SPARQL `GRAPH ?g { ... }` — the BGP evaluated WITHIN each named
   * graph: every pattern must match in the same graph, and the graph term
   * binds as the output variable `g`. Over the mention-level triple table
   * the natural named graph is the provenance page (`url` — exactly
   * [[Rdf.toNQuads]]' graph position), making this the provenance query
   * the KG exists to answer: which pages assert this whole pattern.
   *
   * Lowering: identical to [[matchBgp]] except every pattern scan carries
   * the graph column and every join adds it to the equi-join key set —
   * the plan stays keyed equi-joins, now co-grouped by graph, and a
   * pattern with no shared variable is still connected THROUGH the graph
   * key (a per-graph existence guard, never a cartesian product).
   */
  def matchBgpGraphs(triples: DataFrame, patterns: Seq[Pattern],
                     graphCol: String = "url"): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    def scanG(p: Pattern): (DataFrame, Set[String]) = {
      var df = triples.select(col(graphCol).as("g"),
          col("subj").cast("long").as("subj"), col("pred"),
          col("obj").cast("long").as("obj"))
        .filter(col("pred") === lit(p.p))
      val vars = scala.collection.mutable.LinkedHashSet.empty[String]
      p.s match {
        case C(id) => df = df.filter(col("subj") === lit(id))
        case V(n)  => vars += n
      }
      p.o match {
        case C(id) => df = df.filter(col("obj") === lit(id))
        case V(n)  =>
          if (vars.contains(n)) df = df.filter(col("subj") === col("obj"))
          vars += n
      }
      val cols = col("g") +: ((p.s, p.o) match {
        case (V(a), V(b)) if a != b => Seq(col("subj").as(a), col("obj").as(b))
        case (V(a), _)              => Seq(col("subj").as(a))
        case (_, V(b))              => Seq(col("obj").as(b))
        case _                      => Seq.empty
      })
      (df.select(cols: _*).distinct(), vars.toSet)
    }
    val (first, firstVars) = scanG(patterns.head)
    val (joined, allVars) = patterns.tail.foldLeft((first, firstVars)) {
      case ((acc, bound), p) =>
        val (df, vars) = scanG(p)
        val keys = "g" +: (bound intersect vars).toSeq.sorted
        (acc.join(df, keys), bound union vars)
    }
    joined.select((col("g") +: allVars.toSeq.sorted.map(col)): _*).distinct()
  }

  /**
   * BGP with SPARQL `OPTIONAL` groups: the required conjunction matches
   * as [[matchBgp]]; each optional pattern then LEFT-joins on its shared
   * variables — bindings that have no optional match keep their row with
   * the optional's new variables NULL (the SPARQL left-outer semantics).
   * Each optional pattern must share >= 1 variable with the REQUIRED
   * bindings (an optional joined only through another optional's new
   * variable has order-dependent semantics, so it is rejected), and each
   * must introduce >= 1 new variable (a new-variable-free optional
   * filters nothing under left-join semantics — a no-op that almost
   * always means the caller wanted a required pattern).
   *
   * Same physical shape as the required side: filtered pushdown scans,
   * 8-byte-key equi-joins (left outer), DISTINCT on narrow projections.
   */
  def matchBgpOptional(triples: DataFrame, patterns: Seq[Pattern],
                       optionals: Seq[Pattern]): DataFrame = {
    val (req, reqVars) = joinRequired(triples, patterns)
    require(reqVars.nonEmpty, "BGP binds no variables (all patterns constant)")
    val (joined, allVars) = optionals.foldLeft(
      (req.select(reqVars.toSeq.sorted.map(col): _*).distinct(), reqVars)) {
      case ((acc, bound), p) =>
        val (df, vars) = scan(triples, p)
        val shared = (reqVars intersect vars).toSeq.sorted
        val fresh = vars diff bound
        require(shared.nonEmpty,
          s"optional pattern $p shares no variable with the required patterns")
        require(fresh.nonEmpty,
          s"optional pattern $p introduces no new variable (make it required)")
        require((vars diff reqVars) subsetOf (vars diff bound),
          s"optional pattern $p reuses another optional's variable " +
            "(order-dependent; join it to required variables instead)")
        (acc.join(df, shared, "left"), bound union vars)
    }
    joined.select(allVars.toSeq.sorted.map(col): _*).distinct()
  }

  /**
   * BGP with SPARQL `FILTER` comparisons: the conjunction matches as
   * [[matchBgp]], then each filter restricts the bindings BEFORE the
   * distinct projection. Every filter variable must be bound by the
   * required patterns (SPARQL says an unbound filter variable makes the
   * filter error -> row dropped; silently dropping everything is never
   * what the caller wants, so it throws instead). Filters are plain
   * Catalyst comparisons — Catalyst pushes them below the joins when a
   * filter touches one pattern's variables only.
   */
  def matchBgpWhere(triples: DataFrame, patterns: Seq[Pattern],
                    filters: Seq[Filter]): DataFrame = {
    val (joined, allVars) = joinRequired(triples, patterns)
    require(allVars.nonEmpty, "BGP binds no variables (all patterns constant)")
    val filtered = filters.foldLeft(joined) { (acc, f) =>
      require(allVars.contains(f.a), s"filter variable ?${f.a} is unbound")
      val rhs = f.b match {
        case V(n) =>
          require(allVars.contains(n), s"filter variable ?$n is unbound")
          col(n)
        case C(v) => lit(v)
      }
      acc.filter(f.op match {
        case Lt => col(f.a) < rhs;  case Le => col(f.a) <= rhs
        case Gt => col(f.a) > rhs;  case Ge => col(f.a) >= rhs
        case EqTo => col(f.a) === rhs; case Ne => col(f.a) =!= rhs
      })
    }
    filtered.select(allVars.toSeq.sorted.map(col): _*).distinct()
  }

  /**
   * SPARQL `UNION` of filtered BGP branches. Relational union needs one
   * schema, so every branch must bind the SAME variable set (the common
   * query shape; a ragged union — SPARQL's null-padding semantics —
   * is rejected loudly rather than silently widened). Result is the
   * DISTINCT union of the branch bindings: each branch plans
   * independently (its own pushed-down scans and joins), the union is
   * partial-aggregated by the final distinct.
   */
  def matchBgpUnion(triples: DataFrame,
                    branches: Seq[(Seq[Pattern], Seq[Filter])]): DataFrame = {
    require(branches.nonEmpty, "need at least one UNION branch")
    val dfs = branches.map { case (ps, fs) => matchBgpWhere(triples, ps, fs) }
    val schemas = dfs.map(_.columns.toSeq)
    require(schemas.distinct.size == 1,
      s"UNION branches bind different variable sets: $schemas")
    dfs.reduce(_ unionAll _).distinct()
  }

  /**
   * SPARQL negation — `FILTER NOT EXISTS` / `MINUS`: the required
   * conjunction matches as [[matchBgp]]; each NEGATIVE group then
   * REMOVES every binding for which the group matches under the shared
   * variables (one anti-join per group — the relational lowering both
   * SPARQL forms share when the groups are connected). Each negative
   * group must share >= 1 variable with the required bindings: for a
   * disjoint group SPARQL's two forms diverge into their most
   * surprising behaviors (MINUS keeps everything, NOT EXISTS drops
   * everything whenever the group matches at all), so the ambiguous
   * shape is rejected loudly rather than silently picking one.
   *
   * Physical shape: the required side plans as usual; each negative
   * group plans independently (its own pushed-down scans) and probes as
   * a LEFT ANTI join on the shared variables — Catalyst broadcasts the
   * negative side when it is selective, exactly what you want: negation
   * against a small exclusion pattern never reshuffles the main
   * bindings.
   */
  def matchBgpMinus(triples: DataFrame, patterns: Seq[Pattern],
                    negatives: Seq[Seq[Pattern]]): DataFrame = {
    require(negatives.nonEmpty, "need at least one negative group")
    val (req, reqVars) = joinRequired(triples, patterns)
    require(reqVars.nonEmpty, "BGP binds no variables (all patterns constant)")
    val base = req.select(reqVars.toSeq.sorted.map(col): _*).distinct()
    negatives.foldLeft(base) { (acc, group) =>
      val (neg, negVars) = joinRequired(triples, group)
      val shared = (reqVars intersect negVars).toSeq.sorted
      require(shared.nonEmpty,
        s"negative group $group shares no variable with the required " +
          "patterns (MINUS and NOT EXISTS diverge on disjoint groups; " +
          "bind a shared variable)")
      acc.join(neg.select(shared.map(col): _*).distinct(),
        shared, "left_anti")
    }.select(reqVars.toSeq.sorted.map(col): _*) // using-join moved keys first
  }

  /**
   * SPARQL solution modifiers — `ORDER BY ?v [DESC] LIMIT k` over the
   * BGP's DISTINCT bindings. The ordering key is TOTAL: (?v, then every
   * other variable ascending), so the k-row result is unique — a LIMIT
   * after a partial order returns an engine-dependent row set, which is
   * never acceptable when results feed a diffable artifact or an oracle.
   *
   * Physical shape: Spark lowers sort+limit to TakeOrderedAndProject —
   * each partition keeps a k-row heap and the driver merges heaps; no
   * global sort ever materializes (the same discipline as the BPE
   * trainer's argmax). k is bounded loudly: a million-row "top-k" is a
   * sort in disguise.
   */
  def matchBgpTopK(triples: DataFrame, patterns: Seq[Pattern],
                   orderVar: String, k: Int,
                   descending: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 100000,
      s"k = $k out of [1, 100000] — a huge top-k is a global sort in " +
        "disguise; materialize and sort deliberately instead")
    val b = matchBgp(triples, patterns)
    require(b.columns.contains(orderVar), s"order variable ?$orderVar is unbound")
    val head = if (descending) col(orderVar).desc else col(orderVar).asc
    val tieBreak = b.columns.toSeq.filter(_ != orderVar).sorted.map(col(_).asc)
    b.orderBy(head +: tieBreak: _*).limit(k)
  }

  /** One element of a SPARQL property path: predicate `p` — or the
    * ALTERNATION `(p|alts...)` when `alts` is non-empty — traversed once
    * (`plus = false`) or one-or-more times (`plus = true`, SPARQL `p+`),
    * in edge direction or INVERTED (`inverse = true`, SPARQL `^p`).
    * Compositions nest the SPARQL way: `Step(p, plus = true,
    * inverse = true)` is `(^p)+` — the closure of the REVERSED slice.
    *
    * NEGATED PROPERTY SET (SPARQL `!(p1|p2|...)`): [[Step.notIn]] — the
    * step traverses every edge whose predicate is NOT in the set (one
    * NOT-IN-filtered scan; `p` itself is unused). ZERO-OR-ONE
    * (`opt = true`, SPARQL `p?`): the step may also be skipped — in a
    * sequence the fold keeps the incoming endpoint alongside the
    * traversal; as the FIRST step the zero-length side ranges over every
    * node of the graph (the SPARQL zero-length-path semantics).
    * `opt = true, plus = true` composes to `p*` (zero-or-more).
    *
    * BOUNDED REPETITION (`plus = true, maxHops = n`, the SPARQL 1.0
    * property-path `p{1,n}` — dropped from 1.1 but ubiquitous in
    * practice because unbounded closure over a dense predicate is the
    * modeling error this engine refuses to absorb): the closure stops
    * after n hops — n−1 delta-joins against the one-hop slice, each
    * round's frontier deduped, never the full-closure fixpoint.
    * `maxHops = 0` (default) keeps the unbounded `p+` fixpoint. */
  final case class Step(p: String, plus: Boolean = false,
                        inverse: Boolean = false,
                        alts: Seq[String] = Nil,
                        negated: Seq[String] = Nil,
                        opt: Boolean = false,
                        maxHops: Int = 0)

  object Step {
    /** SPARQL negated property set `!(preds...)`. */
    def notIn(preds: String*): Step = Step("", negated = preds)
  }

  /**
   * SPARQL property-path matching `?x  p1[/p2+/...]  ?y`: the path is a
   * SEQUENCE of steps, each a single predicate traversed once or
   * transitively (`p+`). Returns the DISTINCT (x, y) endpoint pairs.
   *
   * Lowering: each step becomes a deduped (s, o) relation — the
   * predicate slice itself, or its [[Graphs.transitiveClosure]] for
   * `p+` (semi-naive datalog; 1..n hops) — and the sequence folds as
   * keyed equi-joins on the shared endpoint, exactly the BGP join shape
   * with system-generated mid variables. The closure inherits its
   * operator's contract: run `p+` on hierarchy-shaped predicate slices
   * (isA, partOf, subdivisionOf), never on a dense relational predicate
   * whose closure is quadratic — that is a modeling error this engine
   * surfaces rather than absorbs.
   */
  def matchPath(triples: DataFrame, steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "need at least one path step")
    foldSteps(triples, steps)
      .select(col("x"), col("cur").as("y")).distinct()
  }

  /** The shared step-sequence fold: (x, cur) pairs, bag semantics (the
    * callers dedup or count). A zero-or-one step unions the untraversed
    * endpoints through; as the first step its zero-length side is the
    * identity over ALL graph nodes. */
  private def foldSteps(triples: DataFrame, steps: Seq[Step]): DataFrame = {
    val rel0 = relOf(triples, steps.head)
      .select(col("s").as("x"), col("o").as("cur"))
    val first =
      if (!steps.head.opt) rel0
      else rel0.unionAll(
        triples.select(col("subj").cast("long").as("x"))
          .unionAll(triples.select(col("obj").cast("long").as("x")))
          .distinct().withColumn("cur", col("x")))
    steps.tail.foldLeft(first) { (acc, st) =>
      val stepped = acc.join(relOf(triples, st).select(col("s").as("cur"),
          col("o").as("nxt")), Seq("cur"))
        .select(col("x"), col("nxt").as("cur"))
      if (st.opt) stepped.unionAll(acc) else stepped
    }
  }

  /** One path step as a deduped (s, o) relation. Alternation = ONE
    * IN-filtered scan (a union of slices would scan the triple table once
    * per alternative); inversion is a free column swap BEFORE the
    * distinct/closure, so `(^p)+` closes the reversed relation, the
    * SPARQL semantics. */
  private def relOf(triples: DataFrame, st: Step): DataFrame = {
    require(st.maxHops == 0 || st.plus,
      s"maxHops=${st.maxHops} requires plus=true (p{1,n} is bounded " +
        "REPETITION; without plus the step would silently degrade to one hop)")
    val preds = st.p +: st.alts
    val base =
      if (st.negated.nonEmpty) {
        require(st.p.isEmpty && st.alts.isEmpty,
          "a step is a predicate set OR a negated set, not both")
        triples.filter(!col("pred").isin(st.negated: _*))
      }
      else if (preds.size == 1) triples.filter(col("pred") === lit(st.p))
      else triples.filter(col("pred").isin(preds: _*))
    val (sCol, oCol) =
      if (st.inverse) (col("obj"), col("subj")) else (col("subj"), col("obj"))
    val slice = base.select(sCol.cast("long").as("s"),
      oCol.cast("long").as("o")).distinct()
    if (!st.plus) slice
    else if (st.maxHops > 0) {
      // p{1,n}: n-1 frontier joins, each deduped; the accumulated pair
      // set unions once at the end (semi-naive without the fixpoint)
      val one = slice.localCheckpoint(true)
      var frontier = one
      var acc = one
      for (_ <- 2 to st.maxHops) {
        frontier = frontier
          .join(one.select(col("s").as("o"), col("o").as("o2")), Seq("o"))
          .select(col("s"), col("o2").as("o")).distinct()
          .localCheckpoint(true)
        acc = acc.unionAll(frontier)
      }
      acc.distinct()
    }
    else Graphs.transitiveClosure(
      slice.select(col("s").as("src"), col("o").as("dst")))
      .select(col("src").as("s"), col("dst").as("o"))
  }

  /**
   * METAPATH INSTANCE COUNTS — [[matchPath]] with multiplicity instead of
   * set semantics: for each endpoint pair, HOW MANY distinct step-instance
   * chains connect them. The metapath2vec / heterogeneous-GNN edge-weight
   * primitive (a pair connected by 40 p1/p2 chains is 40× the training
   * signal of a pair connected by one) and the schema-level join-fan-out
   * audit. Each step relation is still DEDUPED (a triple asserted by many
   * pages is ONE edge — multiplicity comes from distinct intermediate
   * nodes, never from extraction redundancy); `plus`/`inverse`/`alts`
   * compose exactly as in [[matchPath]].
   *
   * Shape: the same keyed equi-join fold, then ONE partial-aggregated
   * groupBy(x, y) count — the count combines map-side, so the shuffle
   * carries (x, y, partial) rows, never the enumerated chains.
   *
   * @return (x, y, n_paths) — n_paths ≥ 1
   */
  def countPaths(triples: DataFrame, steps: Seq[Step]): DataFrame = {
    require(steps.nonEmpty, "need at least one path step")
    foldSteps(triples, steps)
      .groupBy(col("x"), col("cur").as("y"))
      .agg(count(lit(1)).as("n_paths"))
  }

  /**
   * SPARQL aggregate SELECT over a BGP:
   * `SELECT ?g1 ... (COUNT(*) AS n_bindings) (COUNT(DISTINCT ?v) AS
   * n_distinct) WHERE { ... } GROUP BY ?g1 ...` — the analytics entry
   * point of the KG query surface (per-entity fan-out profiles, relation
   * cardinality audits). Aggregation is over the DISTINCT binding set
   * ([[matchBgp]]'s SPARQL set semantics — the mention-level triple bag
   * never inflates counts), so `n_bindings` counts distinct solutions
   * per group and `n_distinct` the distinct values one variable takes.
   *
   * Physical shape: the BGP's pushed-down scans and keyed equi-joins,
   * then ONE partial-aggregated groupBy on the grouping variables — the
   * binding distinct and the aggregation both combine map-side; nothing
   * wider than the grouped counters shuffles.
   */
  def matchBgpAgg(triples: DataFrame, patterns: Seq[Pattern],
                  groupVars: Seq[String], countVar: String): DataFrame = {
    require(groupVars.nonEmpty, "need at least one grouping variable")
    val b = matchBgp(triples, patterns)
    val bound = b.columns.toSet
    (groupVars :+ countVar).foreach { v =>
      require(bound.contains(v), s"aggregate variable ?$v is unbound") }
    require(!groupVars.contains(countVar),
      s"?$countVar is a grouping variable (its per-group distinct count is 1)")
    b.groupBy(groupVars.map(col): _*)
      .agg(count(lit(1)).as("n_bindings"),
        countDistinct(col(countVar)).as("n_distinct"))
  }

  /**
   * SPARQL `CONSTRUCT`: instantiate template triple patterns over the
   * WHERE clause's distinct bindings — the graph-to-graph mapping that
   * turns query results back into triples (view materialization, edge
   * derivation, KG reshaping). Template subject/object terms are
   * variables bound by the WHERE patterns or entity constants; template
   * predicates are constant strings (the [[Pattern]] grammar). The
   * result is the DISTINCT union of the instantiated triples — RDF
   * graphs are sets, so duplicate instantiations collapse.
   *
   * Physical shape: the BGP plans once; each template is a zero-cost
   * projection of the SAME binding relation (Spark reuses the cached
   * exchange under AQE), and the union's distinct partial-aggregates.
   * Output schema matches the triple table core: (subj, pred, obj).
   */
  def construct(triples: DataFrame, patterns: Seq[Pattern],
                templates: Seq[Pattern]): DataFrame = {
    require(templates.nonEmpty, "need at least one CONSTRUCT template")
    val b = matchBgp(triples, patterns)
    val bound = b.columns.toSet
    def term(t: Term): org.apache.spark.sql.Column = t match {
      case V(n) =>
        require(bound.contains(n), s"template variable ?$n is unbound")
        col(n).cast("long")
      case C(id) => lit(id)
    }
    templates.map { tp =>
      b.select(term(tp.s).as("subj"), lit(tp.p).as("pred"),
        term(tp.o).as("obj"))
    }.reduce(_ unionAll _).distinct()
  }

  /**
   * SPARQL `VALUES` inline-data block over one variable:
   * `SELECT ... WHERE { ... VALUES ?x { <id1> <id2> ... } }` — the
   * parameterized-query workhorse (score THESE entities, expand THIS
   * watchlist). Lowered to an `IN` predicate on the binding relation,
   * which Catalyst pushes through the BGP's joins INTO the pattern
   * scans — the inline table never materializes, never joins, and the
   * constrained variable's selectivity prunes every upstream pattern
   * (the plan a hand-written broadcast join of a literal table only
   * approaches). Multi-row single-variable VALUES is the SPARQL-common
   * case; a multi-variable block is a broadcast join by construction
   * and composes from this + [[matchBgpWhere]].
   */
  def matchBgpValues(triples: DataFrame, patterns: Seq[Pattern],
                     valuesVar: String, values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "VALUES block must be non-empty")
    val b = matchBgp(triples, patterns)
    require(b.columns.contains(valuesVar), s"VALUES variable ?$valuesVar is unbound")
    b.filter(col(valuesVar).isin(values: _*))
  }

  /**
   * SPARQL `GROUP_CONCAT(?v ORDER BY ?v; separator=sep)` per group —
   * the label/alias-list assembler of KG export queries. SPARQL leaves
   * unordered GROUP_CONCAT implementation-defined; this one mandates the
   * ORDER BY so the output is a pure function of the group's binding SET
   * (numeric sort on the long ids BEFORE stringification — "2" < "10" —
   * then one join) and therefore bit-identical at any partitioning and
   * engine-comparable (DuckDB: `string_agg(CAST(v AS VARCHAR), sep ORDER
   * BY v)`). Duplicate ?v across different residual bindings concatenate
   * per SPARQL solution semantics.
   *
   * Shape: the BGP's distinct bindings, then ONE groupBy whose
   * collect_list state is bounded by group fan-out — the inherent cost
   * of an ordered concatenation; counts partial-aggregate map-side.
   */
  def matchBgpGroupConcat(triples: DataFrame, patterns: Seq[Pattern],
                          groupVars: Seq[String], concatVar: String,
                          sep: String = ",",
                          values: Map[String, Seq[Long]] = Map.empty)
      : DataFrame = {
    require(groupVars.nonEmpty, "need at least one grouping variable")
    val b0 = matchBgp(triples, patterns)
    val bound = b0.columns.toSet
    (groupVars :+ concatVar).foreach { v =>
      require(bound.contains(v), s"aggregate variable ?$v is unbound") }
    values.keys.foreach { v =>
      require(bound.contains(v), s"VALUES variable ?$v is unbound") }
    // VALUES blocks lower to IN predicates, pushed into the pattern scans
    val b = values.foldLeft(b0) { case (acc, (v, ids)) =>
      acc.filter(col(v).isin(ids: _*)) }
    b.groupBy(groupVars.map(col): _*)
      .agg(count(lit(1)).as("n_bindings"),
        array_join(
          transform(array_sort(collect_list(col(concatVar))),
            x => x.cast("string")),
          sep).as("group_concat"))
  }

  /**
   * SPARQL `ASK { ... }`: does the BGP have at least one solution? One
   * boolean row — the existence probe of KG monitoring ("is there any
   * entity that merges into a stream?"). The binding relation is
   * `limit(1)`-ed BEFORE the aggregation, so execution short-circuits:
   * Spark plans a CollectLimit whose partial limits stop each scan/join
   * task at its first surviving row — the probe never materializes the
   * full solution set (the difference between ASK and COUNT > 0 run
   * naively).
   */
  def ask(triples: DataFrame, patterns: Seq[Pattern]): DataFrame =
    matchBgp(triples, patterns).limit(1)
      .agg((count(lit(1)) > 0).as("ask"))

  /**
   * SPARQL `DESCRIBE <id> ...`: the concise-bounded-description slice —
   * every triple in which a described resource appears as subject or
   * object, as a SET (SPARQL graphs are sets). Completes the query-verb
   * family: SELECT ([[matchBgp]]), ASK ([[ask]]), CONSTRUCT
   * ([[construct]]), DESCRIBE.
   *
   * The id list is query text (like a SPARQL query's IRIs), so it lowers
   * to ONE `IN`-filtered scan — an OR of two pushed-down predicates, no
   * join, no broadcast; the only shuffle is the set-semantics distinct.
   * At 10^12 triples a DESCRIBE therefore costs one pruned pass, exactly
   * what a KG serving layer wants for an entity page.
   */
  def describe(triples: DataFrame, ids: Seq[Long]): DataFrame = {
    require(ids.nonEmpty, "DESCRIBE needs at least one resource id")
    triples
      .select(col("subj").cast("long"), col("pred"), col("obj").cast("long"))
      .filter(col("subj").isin(ids: _*) || col("obj").isin(ids: _*))
      .distinct()
  }

  private def scan(triples: DataFrame, p: Pattern): (DataFrame, Set[String]) = {
      var df = triples.select(col("subj").cast("long"), col("pred"),
        col("obj").cast("long")).filter(col("pred") === lit(p.p))
      val vars = scala.collection.mutable.LinkedHashSet.empty[String]
      p.s match {
        case C(id) => df = df.filter(col("subj") === lit(id))
        case V(n)  => vars += n
      }
      p.o match {
        case C(id) => df = df.filter(col("obj") === lit(id))
        case V(n)  =>
          // same variable in both positions = a self-loop constraint
          if (vars.contains(n)) df = df.filter(col("subj") === col("obj"))
          vars += n
      }
      val cols = (p.s, p.o) match {
        case (V(a), V(b)) if a != b => Seq(col("subj").as(a), col("obj").as(b))
        case (V(a), _)              => Seq(col("subj").as(a))
        case (_, V(b))              => Seq(col("obj").as(b))
        case _                      => Seq(lit(1L).as("__match"))
      }
      (df.select(cols: _*).distinct(), vars.toSet)
  }

  /** The required-conjunction join chain shared by [[matchBgp]] and
    * [[matchBgpOptional]]: returns the joined bindings (pre-projection)
    * and the bound variable set. */
  private def joinRequired(triples: DataFrame,
                           patterns: Seq[Pattern]): (DataFrame, Set[String]) = {
    require(patterns.nonEmpty, "need at least one pattern")
    val (first, firstVars) = scan(triples, patterns.head)
    patterns.tail.foldLeft((first, firstVars)) {
      case ((acc, bound), p) =>
        val (df, vars) = scan(triples, p)
        val shared = (bound intersect vars).toSeq.sorted
        require(shared.nonEmpty || vars.isEmpty || bound.isEmpty,
          s"pattern $p shares no variable with the patterns before it " +
            "(disconnected BGP = cartesian product; reorder or split the query)")
        val next =
          // a fully-constant side is an existence guard: cross-join a
          // broadcast <=1-row side (keeps everything or nothing; never a
          // real cartesian product)
          if (vars.isEmpty) acc.crossJoin(broadcast(df.limit(1))).drop("__match")
          else if (bound.isEmpty) df.crossJoin(broadcast(acc.limit(1))).drop("__match")
          else acc.join(df, shared)
        (next, bound union vars)
    }
  }
}
