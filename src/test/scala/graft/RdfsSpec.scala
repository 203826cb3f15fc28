package graft

import graft.kg.Rdfs

class RdfsSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj").repartition(3)
  }
  private def schema2(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("sub", "sup")
  }
  private def schemaL(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("sub", "sup")
  }
  private def schemaPC(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("pred", "cls")
  }

  test("sp/dom/rng/sc rules fire in strata, incl. domain on an INFERRED predicate") {
    // p -> q -> r (sp chain); dom(q) = 10 fires on the INFERRED (1,q,2);
    // rng(r) = 20; sc 10 -> 11 -> 12
    val got = Rdfs.materialize(
      df(Seq((1L, "p", 2L))),
      subProp = schema2(Seq(("p", "q"), ("q", "r"))),
      subClass = schemaL(Seq((10L, 11L), (11L, 12L))),
      domain = schemaPC(Seq(("q", 10L))),
      range = schemaPC(Seq(("r", 20L))))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, "p", 2L), (1L, "q", 2L), (1L, "r", 2L), // sp closure
      (1L, "type", 10L),                           // dom on inferred q
      (2L, "type", 20L),                           // rng on inferred r
      (1L, "type", 11L), (1L, "type", 12L)))       // sc closure of dom type
  }

  test("asserted type triples take the subClassOf closure; output is DISTINCT") {
    val got = Rdfs.materialize(
      df(Seq((5L, "type", 10L), (5L, "type", 10L), (6L, "type", 11L))),
      subProp = schema2(Seq.empty),
      subClass = schemaL(Seq((10L, 11L), (11L, 12L))),
      domain = schemaPC(Seq.empty), range = schemaPC(Seq.empty))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (5L, "type", 10L), (5L, "type", 11L), (5L, "type", 12L),
      (6L, "type", 11L), (6L, "type", 12L)))
  }

  test("schema cycles entail both directions and terminate") {
    // p <-> q mutually sub-properties; classes 10 <-> 11
    val got = Rdfs.materialize(
      df(Seq((1L, "p", 2L), (3L, "type", 10L))),
      subProp = schema2(Seq(("p", "q"), ("q", "p"))),
      subClass = schemaL(Seq((10L, 11L), (11L, 10L))),
      domain = schemaPC(Seq.empty), range = schemaPC(Seq.empty))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, "p", 2L), (1L, "q", 2L),
      (3L, "type", 10L), (3L, "type", 11L)))
  }

  test("typePred in subPropertyOf and oversize ontologies are rejected loudly") {
    intercept[IllegalArgumentException] {
      Rdfs.materialize(df(Seq((1L, "p", 2L))),
        subProp = schema2(Seq(("type", "q"))),
        subClass = schemaL(Seq.empty),
        domain = schemaPC(Seq.empty), range = schemaPC(Seq.empty))
    }
    intercept[IllegalArgumentException] {
      Rdfs.materialize(df(Seq((1L, "p", 2L))),
        subProp = schema2((0 until 20).map(i => (s"p$i", s"q$i"))),
        subClass = schemaL(Seq.empty),
        domain = schemaPC(Seq.empty), range = schemaPC(Seq.empty),
        maxAxioms = 10L)
    }
  }

  test("brute-force fixpoint twin equality on a random-ish instance set") {
    val inst = (0 until 200).map { i =>
      (i.toLong % 17, Seq("p", "q", "s", "type")(i % 4), (i.toLong * 7) % 23)
    }
    val sp = Seq(("p", "q"), ("s", "q"))
    val sc = Seq((3L, 5L), (5L, 9L), (4L, 9L))
    val dom = Seq(("q", 3L))
    val rng = Seq(("s", 4L))
    // naive fixpoint: apply all four rules until nothing new appears
    var facts = inst.toSet
    val spc = Map("p" -> Set("q"), "s" -> Set("q"))
    val scc = Map(3L -> Set(5L, 9L), 5L -> Set(9L), 4L -> Set(9L))
    var grew = true
    while (grew) {
      val next = facts ++
        facts.flatMap { case (s, p, o) =>
          spc.getOrElse(p, Set.empty[String]).map(q => (s, q, o)) } ++
        facts.flatMap { case (s, p, o) =>
          dom.filter(_._1 == p).map { case (_, c) => (s, "type", c) } } ++
        facts.flatMap { case (s, p, o) =>
          rng.filter(_._1 == p).map { case (_, c) => (o, "type", c) } } ++
        facts.collect { case (s, "type", c) if scc.contains(c) =>
          scc(c).map(d => (s, "type", d)) }.flatten
      grew = next.size > facts.size
      facts = next
    }
    val got = Rdfs.materialize(df(inst),
      subProp = schema2(sp), subClass = schemaL(sc),
      domain = schemaPC(dom), range = schemaPC(rng))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === facts)
  }

  // ---- OWL-lite property rules ----

  private def collectOwl(got: org.apache.spark.sql.DataFrame) =
    got.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  /** naive twin: apply inv/sym/trans rules pointwise until stable */
  private def owlFixpoint(inst: Set[(Long, String, Long)],
                          inverseOf: Seq[(String, String)],
                          symmetric: Seq[String],
                          transitive: Seq[String]): Set[(Long, String, Long)] = {
    val invMap = inverseOf.flatMap { case (p, q) => Seq(p -> q, q -> p) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    var facts = inst
    var grew = true
    while (grew) {
      val next = facts ++
        facts.flatMap { case (s, p, o) =>
          invMap.getOrElse(p, Set.empty[String]).map(q => (o, q, s)) } ++
        facts.collect { case (s, p, o) if symmetric.contains(p) => (o, p, s) } ++
        (for {
          (s, p, o) <- facts if transitive.contains(p)
          (o2, p2, w) <- facts if p2 == p && o2 == o && s != w
        } yield (s, p, w))
      grew = next.size > facts.size
      facts = next
    }
    facts
  }

  test("materializeOwl: inverse, symmetric and transitive rules fire") {
    val inst = Seq(
      (1L, "partOf", 2L), (2L, "partOf", 3L), (3L, "partOf", 4L),
      (10L, "spouseOf", 11L),
      (20L, "knows", 21L)) // untouched predicate passes through
    val got = collectOwl(Rdfs.materializeOwl(df(inst),
      inverseOf = Seq(("partOf", "hasPart")),
      symmetric = Seq("spouseOf"),
      transitive = Seq("partOf")))
    val want = owlFixpoint(inst.toSet,
      Seq(("partOf", "hasPart")), Seq("spouseOf"), Seq("partOf"))
    assert(got === want)
    // spot checks: the closure fired (1 partOf 3/4), its inverse image
    // exists (4 hasPart 1 — an edge only step 3 can emit), spouse flipped
    assert(got.contains((1L, "partOf", 4L)))
    assert(got.contains((4L, "hasPart", 1L)))
    assert(got.contains((11L, "spouseOf", 10L)))
    assert(got.contains((20L, "knows", 21L)))
  }

  test("materializeOwl: inverse CHAINS compose on the driver (p inv q, q inv r)") {
    // inverseOf(p, q) and inverseOf(q, r): composition makes p and r
    // aliases (flip xor flip = copy), so (s, p, o) entails (s, r, o)
    val inst = Seq((1L, "p", 2L))
    val got = collectOwl(Rdfs.materializeOwl(df(inst),
      inverseOf = Seq(("p", "q"), ("q", "r")),
      symmetric = Seq.empty, transitive = Seq.empty))
    val want = owlFixpoint(inst.toSet,
      Seq(("p", "q"), ("q", "r")), Seq.empty, Seq.empty)
    assert(got === want)
    assert(got.contains((2L, "q", 1L)) && got.contains((1L, "r", 2L)))
  }

  test("materializeOwl: symmetric + transitive predicate closes both ways") {
    // a symmetric transitive chain floods its connected set in both
    // directions — the equivalence-style closure
    val inst = Seq((1L, "near", 2L), (2L, "near", 3L))
    val got = collectOwl(Rdfs.materializeOwl(df(inst),
      inverseOf = Seq.empty, symmetric = Seq("near"),
      transitive = Seq("near")))
    val want = owlFixpoint(inst.toSet, Seq.empty, Seq("near"), Seq("near"))
    assert(got === want)
    assert(got.contains((3L, "near", 1L)))
  }

  test("materializeOwl: fixpoint twin equality on a random-ish instance set") {
    val inst = (0 until 150).map { i =>
      ((i * 13L) % 11, Seq("p", "up", "sym", "other")(i % 4), (i * 7L) % 13)
    }.filter(t => t._1 != t._3).toSet
    val got = collectOwl(Rdfs.materializeOwl(df(inst.toSeq),
      inverseOf = Seq(("up", "down")), symmetric = Seq("sym"),
      transitive = Seq("up", "sym")))
    val want = owlFixpoint(inst, Seq(("up", "down")), Seq("sym"),
      Seq("up", "sym"))
    assert(got === want)
  }

  test("materializeOwl: an exploding mapping alphabet is rejected loudly") {
    intercept[IllegalArgumentException] {
      Rdfs.materializeOwl(df(Seq((1L, "p0", 2L))),
        inverseOf = (0 until 40).map(i => (s"p$i", s"p${i + 1}")),
        symmetric = Seq.empty, transitive = Seq.empty, maxAxioms = 10L)
    }
  }
}
