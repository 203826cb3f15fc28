package graft

import graft.kg.Shacl

class ShaclSpec extends SparkSpec {

  private def t(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("subj", "pred", "obj").repartition(3)
  }

  private def noCard = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("pred", "min_count", "max_count")
  }
  private def noAllowed = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("pred", "obj")
  }

  test("cardinality: min/max over DISTINCT objects; absent predicate counts 0") {
    import spark.implicits._
    val triples = t(
      (1L, "p", 100L), (1L, "p", 100L), // duplicate mention: 1 distinct obj
      (1L, "q", 5L),
      (2L, "p", 100L), (2L, "p", 101L), (2L, "p", 102L), // 3 distinct
      (3L, "q", 6L)) // subject 3 lacks p entirely -> counts 0
    val card = Seq(("p", 1L, 2L)).toDF("pred", "min_count", "max_count")
    val got = Shacl.validate(triples, card, noAllowed).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set(
      (2L, "p", "maxCount", 3L, 2L),
      (3L, "p", "minCount", 0L, 1L)))
  }

  test("value set: sh:in flags only constrained predicates; bag dedups") {
    import spark.implicits._
    val triples = t(
      (1L, "s", 10L), (1L, "s", 10L), (1L, "s", 11L), (1L, "s", 11L),
      (2L, "s", 12L),
      (2L, "z", 999L)) // z unconstrained -> never reported
    val allowed = Seq(("s", 10L), ("s", 12L)).toDF("pred", "obj")
    val rows = Shacl.validate(triples, noCard, allowed).collect()
    assert(rows.forall(_.isNullAt(4))) // bound is null for value shapes
    val got = rows.map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got === Set((1L, "s", "valueNotAllowed", 11L)))
  }

  test("both families together; a compliant graph reports nothing") {
    import spark.implicits._
    val triples = t(
      (1L, "p", 100L), (1L, "s", 10L),
      (2L, "p", 101L), (2L, "s", 10L))
    val card = Seq(("p", 1L, 1L)).toDF("pred", "min_count", "max_count")
    val allowed = Seq(("s", 10L)).toDF("pred", "obj")
    assert(Shacl.validate(triples, card, allowed).count() === 0L)

    // break each family once
    val broken = t(
      (1L, "p", 100L), (1L, "p", 101L), (1L, "s", 10L), // maxCount p
      (2L, "p", 102L), (2L, "s", 77L)) // s value not allowed
    val got = Shacl.validate(broken, card, allowed).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "p", "maxCount"),
      (2L, "s", "valueNotAllowed")))
  }
}
