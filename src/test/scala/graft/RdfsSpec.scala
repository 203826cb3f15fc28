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
}
