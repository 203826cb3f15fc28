package graft

import graft.kg.Bgp
import graft.kg.Bgp._

class BgpSpec extends SparkSpec {

  // mention-level bag: duplicate rows must NOT duplicate bindings
  private def triplesDf = {
    import spark.implicits._
    Seq(
      (1L, "likes", 2L), (1L, "likes", 2L), (1L, "likes", 3L),
      (4L, "likes", 2L),
      (2L, "in", 10L), (3L, "in", 11L), (2L, "in", 10L),
      (2L, "self", 2L), (5L, "self", 6L),
      (9L, "alone", 9L)
    ).toDF("subj", "pred", "obj").repartition(3)
  }

  test("var-var chain: ?x likes ?z . ?z in ?y — distinct bindings") {
    val got = Bgp.matchBgp(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "in", V("y"))))
    assert(got.columns.toSeq === Seq("x", "y", "z"))
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((1L, 10L, 2L), (1L, 11L, 3L), (4L, 10L, 2L)))
  }

  test("constant subject narrows the scan") {
    val got = Bgp.matchBgp(triplesDf, Seq(Pattern(C(1L), "likes", V("z"))))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L))
  }

  test("same variable in both positions = self-loop constraint") {
    val got = Bgp.matchBgp(triplesDf, Seq(Pattern(V("x"), "self", V("x"))))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L)) // (5, self, 6) is not a self-loop
  }

  test("fully-constant pattern acts as an existence guard") {
    val keep = Bgp.matchBgp(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(C(2L), "self", C(2L))))
    assert(keep.count() === 3)
    val drop = Bgp.matchBgp(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(C(2L), "self", C(6L))))
    assert(drop.count() === 0)
    // guard-first order works too (bound set starts empty)
    val guardFirst = Bgp.matchBgp(triplesDf, Seq(
      Pattern(C(2L), "self", C(2L)), Pattern(V("x"), "likes", V("z"))))
    assert(guardFirst.count() === 3)
  }

  test("disconnected BGP throws instead of exploding into a cartesian product") {
    val ex = intercept[IllegalArgumentException] {
      Bgp.matchBgp(triplesDf, Seq(
        Pattern(V("x"), "likes", V("z")), Pattern(V("a"), "in", V("b"))))
    }
    assert(ex.getMessage.contains("cartesian"))
  }

  test("all-constant BGP throws (binds no variables)") {
    intercept[IllegalArgumentException] {
      Bgp.matchBgp(triplesDf, Seq(Pattern(C(2L), "self", C(2L))))
    }
  }

  test("OPTIONAL: unmatched bindings keep their row with nulls") {
    // required ?x likes ?z; optional ?z in ?y — z=2,3 have in-rows, so
    // every required binding matches here except none; add z=2 twice to
    // prove distinctness under the left join too
    val got = Bgp.matchBgpOptional(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq(Pattern(V("z"), "in", V("y"))))
    assert(got.columns.toSeq === Seq("x", "y", "z"))
    val rows = got.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((1L, 10L, 2L), (1L, 11L, 3L), (4L, 10L, 2L)))
    // required ?a in ?b; optional ?b likes ?c — 10/11 have no likes-rows:
    // the optional column is null, the required rows survive
    val got2 = Bgp.matchBgpOptional(triplesDf,
      Seq(Pattern(V("a"), "in", V("b"))),
      Seq(Pattern(V("b"), "likes", V("c"))))
    val rows2 = got2.collect().map(r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows2 === Set((2L, 10L, -1L), (3L, 11L, -1L)))
  }

  test("OPTIONAL: two independent groups, each nullable on its own") {
    // required ?x likes ?z; optional ?x self ?s (only x=nothing matches —
    // self rows are (2,2),(5,6); x values are 1,4 -> all null); optional
    // ?z in ?y (matches everywhere)
    val got = Bgp.matchBgpOptional(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq(Pattern(V("x"), "self", V("s")), Pattern(V("z"), "in", V("y"))))
    assert(got.columns.toSeq === Seq("s", "x", "y", "z"))
    val rows = got.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
       if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set((-1L, 1L, 10L, 2L), (-1L, 1L, 11L, 3L), (-1L, 4L, 10L, 2L)))
  }

  test("FILTER: var-var and var-constant comparisons restrict bindings") {
    // ?x likes ?z with ?x < ?z: (1,2),(1,3),(4,2) -> drops (4,2)
    val got = Bgp.matchBgpWhere(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))), Seq(Filter("x", Lt, V("z"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L)))
    // ?x likes ?z with ?z != 2
    val got2 = Bgp.matchBgpWhere(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))), Seq(Filter("z", Ne, C(2L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === Set((1L, 3L)))
    // conjunction of filters; Ge/Le/EqTo paths
    val got3 = Bgp.matchBgpWhere(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq(Filter("x", Ge, C(1L)), Filter("x", Le, C(1L)), Filter("z", EqTo, C(3L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 === Set((1L, 3L)))
    // unbound filter variable throws
    intercept[IllegalArgumentException] {
      Bgp.matchBgpWhere(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))), Seq(Filter("nope", Lt, C(0L))))
    }
  }

  test("UNION: aligned branches dedupe across branches; ragged branches throw") {
    // branch1: ?a likes ?b (a<b); branch2: ?a in ?b — aligned on {a,b}
    val got = Bgp.matchBgpUnion(triplesDf, Seq(
      (Seq(Pattern(V("a"), "likes", V("b"))), Seq(Filter("a", Lt, V("b")))),
      (Seq(Pattern(V("a"), "in", V("b"))), Seq.empty)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 10L), (3L, 11L)))
    // overlapping branches produce DISTINCT rows
    val dup = Bgp.matchBgpUnion(triplesDf, Seq(
      (Seq(Pattern(V("a"), "in", V("b"))), Seq.empty),
      (Seq(Pattern(V("a"), "in", V("b"))), Seq.empty)))
    assert(dup.count() === 2)
    intercept[IllegalArgumentException] {
      Bgp.matchBgpUnion(triplesDf, Seq(
        (Seq(Pattern(V("a"), "likes", V("b"))), Seq.empty),
        (Seq(Pattern(V("a"), "in", V("c"))), Seq.empty)))
    }
  }

  test("property path: sequence and p+ compose; plus is the irreflexive closure") {
    import spark.implicits._
    // likes: 1->2; ord-chain: 2->3->4->5 (as pred "in" here reused)
    val t = Seq(
      (1L, "likes", 2L), (7L, "likes", 3L),
      (2L, "in", 3L), (3L, "in", 4L), (4L, "in", 5L)
    ).toDF("subj", "pred", "obj").repartition(3)
    // ?x likes/in+ ?y
    val got = Bgp.matchPath(t, Seq(Step("likes"), Step("in", plus = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L), (1L, 4L), (1L, 5L), (7L, 4L), (7L, 5L)))
    // single one-step path = the predicate slice, deduped
    val one = Bgp.matchPath(t, Seq(Step("in")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one === Set((2L, 3L), (3L, 4L), (4L, 5L)))
    // plus over a cycle never emits (a, a) but crosses it
    val cyc = Seq((1L, "c", 2L), (2L, "c", 1L), (2L, "c", 3L))
      .toDF("subj", "pred", "obj")
    val p = Bgp.matchPath(cyc, Seq(Step("c", plus = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p === Set((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L)))
  }

  test("OPTIONAL: rejected shapes throw loudly") {
    // shares no variable with required
    intercept[IllegalArgumentException] {
      Bgp.matchBgpOptional(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))),
        Seq(Pattern(V("a"), "in", V("b"))))
    }
    // introduces no new variable
    intercept[IllegalArgumentException] {
      Bgp.matchBgpOptional(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))),
        Seq(Pattern(V("x"), "in", V("z"))))
    }
    // reuses another optional's fresh variable
    intercept[IllegalArgumentException] {
      Bgp.matchBgpOptional(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))),
        Seq(Pattern(V("z"), "in", V("y")), Pattern(V("x"), "self", V("y"))))
    }
  }

  test("matchBgpAgg: counts over DISTINCT bindings, never the mention bag") {
    // bindings of ?x likes ?z . ?z in ?y (set semantics, see first test):
    // {(1,10,2),(1,11,3),(4,10,2)} -> grouped by x
    val got = Bgp.matchBgpAgg(triplesDf, Seq(
        Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "in", V("y"))),
      groupVars = Seq("x"), countVar = "y")
    assert(got.columns.toSeq === Seq("x", "n_bindings", "n_distinct"))
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // x=1: two bindings, y in {10, 11}; x=4: one binding, y = 10 —
    // the duplicated (1, likes, 2) and (2, in, 10) mentions add nothing
    assert(rows === Set((1L, 2L, 2L), (4L, 1L, 1L)))
  }

  test("matchBgpAgg rejects unbound and degenerate variables") {
    intercept[IllegalArgumentException] {
      Bgp.matchBgpAgg(triplesDf, Seq(Pattern(V("x"), "likes", V("z"))),
        groupVars = Seq("x"), countVar = "nope")
    }
    intercept[IllegalArgumentException] {
      Bgp.matchBgpAgg(triplesDf, Seq(Pattern(V("x"), "likes", V("z"))),
        groupVars = Seq("x"), countVar = "x") // countVar grouped
    }
    intercept[IllegalArgumentException] {
      Bgp.matchBgpAgg(triplesDf, Seq(Pattern(V("x"), "likes", V("z"))),
        groupVars = Seq.empty, countVar = "z")
    }
  }

  test("construct: template instantiation, constants, RDF set semantics") {
    // WHERE { ?x likes ?z . ?z in ?y } CONSTRUCT { ?x near ?y . ?y has 7 }
    val got = Bgp.construct(triplesDf, Seq(
        Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "in", V("y"))),
      Seq(Pattern(V("x"), "near", V("y")), Pattern(V("y"), "has", C(7L))))
    assert(got.columns.toSeq === Seq("subj", "pred", "obj"))
    val rows = got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // bindings {(1,10),(1,11),(4,10)} on (x,y); (4,near,10) and (1,near,10)
    // stay distinct triples, but the two y=10 bindings collapse in 'has'
    assert(rows === Set(
      (1L, "near", 10L), (1L, "near", 11L), (4L, "near", 10L),
      (10L, "has", 7L), (11L, "has", 7L)))
  }

  test("matchBgpMinus: each negative group anti-joins on its shared variables") {
    // required: ?x likes ?z -> {(1,2),(1,3),(4,2)}
    // minus { ?z in ?y }: z=2 and z=3 both have 'in' rows -> all dropped?
    // no — use 'self' as the negative: only z=2 has a self row
    val got = Bgp.matchBgpMinus(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq(Seq(Pattern(V("z"), "self", V("w")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (2, self, 2) matches z=2 -> (1,2) and (4,2) removed; (1,3) survives
    assert(got === Set((1L, 3L)))
  }

  test("matchBgpMinus: two negative groups compose; disjoint groups rejected") {
    // remove z with a self row AND x with an 'in' row (x=1..4: none have
    // 'in' as subject except 2,3 — not bound as x here, so no-op group)
    val got = Bgp.matchBgpMinus(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq(Seq(Pattern(V("z"), "self", V("w"))),
        Seq(Pattern(V("x"), "in", V("y")))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L)))
    intercept[IllegalArgumentException] {
      Bgp.matchBgpMinus(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))),
        Seq(Seq(Pattern(V("a"), "in", V("b"))))) // no shared variable
    }
  }

  test("matchBgpTopK: total order makes the k-row set unique; bounds enforced") {
    // bindings of ?x likes ?z: {(1,2),(1,3),(4,2)}; order by z desc with
    // x as the tie-break -> (1,3), (1,2), (4,2)
    val got = Bgp.matchBgpTopK(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      orderVar = "z", k = 2, descending = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (1L, 2L)))
    val asc = Bgp.matchBgpTopK(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))), orderVar = "z", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(asc === Seq((1L, 2L), (4L, 2L), (1L, 3L))) // x breaks the z tie
    intercept[IllegalArgumentException] {
      Bgp.matchBgpTopK(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))), orderVar = "nope", k = 2)
    }
    intercept[IllegalArgumentException] {
      Bgp.matchBgpTopK(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))), orderVar = "z", k = 0)
    }
  }

  test("construct rejects unbound template variables and empty templates") {
    intercept[IllegalArgumentException] {
      Bgp.construct(triplesDf, Seq(Pattern(V("x"), "likes", V("z"))),
        Seq(Pattern(V("x"), "near", V("nope"))))
    }
    intercept[IllegalArgumentException] {
      Bgp.construct(triplesDf, Seq(Pattern(V("x"), "likes", V("z"))), Seq.empty)
    }
  }

  test("ASK: true on satisfiable BGP, false on unsatisfiable; one row") {
    val yes = Bgp.ask(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "in", V("y"))))
      .collect()
    assert(yes.length === 1 && yes.head.getBoolean(0))
    val no = Bgp.ask(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "alone", V("y"))))
      .collect()
    assert(no.length === 1 && !no.head.getBoolean(0))
  }

  test("DESCRIBE: subject-or-object slice, set semantics, empty rejected") {
    val got = Bgp.describe(triplesDf, Seq(2L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // (1,likes,2) duplicated in the input -> once; both roles matched
    assert(got === Set((1L, "likes", 2L), (4L, "likes", 2L),
      (2L, "in", 10L), (2L, "self", 2L)))
    val two = Bgp.describe(triplesDf, Seq(10L, 11L)).count()
    assert(two === 2L) // (2,in,10) and (3,in,11)
    intercept[IllegalArgumentException] { Bgp.describe(triplesDf, Seq.empty) }
  }

  test("VALUES: inline block restricts a bound variable; unbound rejected") {
    val got = Bgp.matchBgpValues(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))), "x", Seq(1L, 99L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L))) // 99 matches nothing; 4 excluded
    intercept[IllegalArgumentException] {
      Bgp.matchBgpValues(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))), "nope", Seq(1L))
    }
    intercept[IllegalArgumentException] {
      Bgp.matchBgpValues(triplesDf,
        Seq(Pattern(V("x"), "likes", V("z"))), "x", Seq.empty)
    }
  }

  test("GROUP_CONCAT: numeric sort before stringify; duplicates kept; VALUES composes") {
    // ?x likes ?z: x=1 -> z in {2,3}; x=4 -> z in {2}
    val got = Bgp.matchBgpGroupConcat(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      groupVars = Seq("x"), concatVar = "z")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 2L, "2,3"), (4L, 1L, "2")))
    // numeric order: ids 2 and 10 must concat "2,10", not "10,2"
    import spark.implicits._
    val big = Seq((7L, "p", 10L), (7L, "p", 2L)).toDF("subj", "pred", "obj")
    val one = Bgp.matchBgpGroupConcat(big, Seq(Pattern(V("x"), "p", V("z"))),
      Seq("x"), "z").head()
    assert(one.getString(2) === "2,10")
    // VALUES block composes: restrict to x=4 only
    val vals = Bgp.matchBgpGroupConcat(triplesDf,
      Seq(Pattern(V("x"), "likes", V("z"))),
      Seq("x"), "z", values = Map("x" -> Seq(4L)))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(vals === Set((4L, "2")))
    // duplicate ?z across residual bindings concatenates per solution:
    // ?x likes ?z . ?z in ?y gives x=1 solutions (z=2,y=10),(z=3,y=11)
    // grouping by x concatenating z keeps both
    val multi = Bgp.matchBgpGroupConcat(triplesDf, Seq(
      Pattern(V("x"), "likes", V("z")), Pattern(V("z"), "in", V("y"))),
      Seq("x"), "z").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(multi(1L) === "2,3" && multi(4L) === "2")
  }

  test("property paths: alternation and inverse steps") {
    import spark.implicits._
    val t = Seq(
      (1L, "a", 2L), (1L, "b", 3L), (1L, "c", 4L), // c NOT in (a|b)
      (9L, "d", 2L), (8L, "d", 3L)                 // inverted second step
    ).toDF("subj", "pred", "obj").repartition(3)
    // ?x (a|b) ?m . ?m ^d ?y  ==  x -(a|b)-> m <-d- y
    val got = Bgp.matchPath(t, Seq(
        Step("a", alts = Seq("b")), Step("d", inverse = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 9L), (1L, 8L)))
    // inverse alone == the flipped slice
    val inv = Bgp.matchPath(t, Seq(Step("d", inverse = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inv === Set((2L, 9L), (3L, 8L)))
  }

  test("countPaths: metapath multiplicities; endpoint set == matchPath") {
    import spark.implicits._
    val t = Seq(
      (1L, "a", 2L), (1L, "a", 3L), (2L, "b", 4L), (3L, "b", 4L),
      (3L, "b", 5L),
      (1L, "a", 2L) // extraction redundancy: still ONE edge
    ).toDF("subj", "pred", "obj").repartition(3)
    val steps = Seq(Step("a"), Step("b"))
    val got = Bgp.countPaths(t, steps).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((1L, 4L) -> 2L, (1L, 5L) -> 1L))
    // projection to endpoints == matchPath's set semantics
    val pairs = Bgp.matchPath(t, steps).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.keySet === pairs)
    assert(got.values.forall(_ >= 1L))
  }

  test("property paths: (^p)+ closes the REVERSED relation") {
    import spark.implicits._
    // chain 1 -p-> 2 -p-> 3: reversed closure from 3 reaches {2, 1}
    val chain = Seq((1L, "p", 2L), (2L, "p", 3L))
      .toDF("subj", "pred", "obj").repartition(2)
    val got = Bgp.matchPath(chain,
        Seq(Step("p", plus = true, inverse = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 2L), (3L, 1L), (2L, 1L)))
    // equivalence: (^p)+ on edges == p+ on the pre-reversed edge table
    val rev = Seq((2L, "p", 1L), (3L, "p", 2L))
      .toDF("subj", "pred", "obj").repartition(2)
    val viaRev = Bgp.matchPath(rev, Seq(Step("p", plus = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === viaRev)
  }

  test("property paths: negated property set !(a|b) and zero-or-one p?") {
    import spark.implicits._
    import Bgp._
    val t = Seq((1L, "a", 2L), (1L, "b", 3L), (1L, "c", 4L), (4L, "d", 5L),
      (2L, "q", 6L)).toDF("subj", "pred", "obj").repartition(2)
    def pairs(steps: Seq[Step]) = matchPath(t, steps).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // !(a|b) keeps the c, d and q edges
    assert(pairs(Seq(Step.notIn("a", "b"))) ===
      Set((1L, 4L), (4L, 5L), (2L, 6L)))
    // c/d? — the optional tail keeps (1,4) alongside the traversal (1,5)
    assert(pairs(Seq(Step("c"), Step("d", opt = true))) ===
      Set((1L, 4L), (1L, 5L)))
    // a FIRST optional step: zero-length side is the identity over ALL
    // graph nodes, plus the a-edge traversals continued by q
    assert(pairs(Seq(Step("a", opt = true), Step("q", opt = true))) ===
      Set(1L, 2L, 3L, 4L, 5L, 6L).map(n => (n, n)) ++
        Set((1L, 2L), (1L, 6L), (2L, 6L)))
    // p* = plus + opt: closure unioned with the identity
    val chain = Seq((1L, "p", 2L), (2L, "p", 3L)).toDF("subj", "pred", "obj")
    assert(Bgp.matchPath(chain, Seq(Step("p", plus = true, opt = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 2L), (3L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    // countPaths multiplicity: skip and traverse are DISTINCT chains
    val dbl = Seq((1L, "p", 2L), (2L, "r", 2L)).toDF("subj", "pred", "obj")
    val got = Bgp.countPaths(dbl, Seq(Step("p"), Step("r", opt = true)))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === Map((1L, 2L) -> 2L)) // 1-p->2 (skip r) and 1-p->2-r->2
  }

  test("property paths: bounded repetition p{1,n}") {
    import spark.implicits._
    import Bgp._
    // chain 1->2->3->4->5
    val chain = (1L to 4L).map(i => (i, "p", i + 1))
      .toDF("subj", "pred", "obj").repartition(3)
    def pairs(n: Int) = matchPath(chain,
        Seq(Step("p", plus = true, maxHops = n)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(1) === Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(pairs(2) === pairs(1) ++ Set((1L, 3L), (2L, 4L), (3L, 5L)))
    // maxHops >= diameter == the unbounded closure
    val full = matchPath(chain, Seq(Step("p", plus = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(4) === full && pairs(9) === full)
    // a 2-cycle reached within bounds yields the (x, x) pair
    val cyc = Seq((1L, "p", 2L), (2L, "p", 1L)).toDF("subj", "pred", "obj")
    assert(matchPath(cyc, Seq(Step("p", plus = true, maxHops = 2)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L)))
    // flags compose: ^!(a) — negated set inverted; and p{0,2} via
    // opt + plus + maxHops (bounded closure unioned with the identity)
    val mix = Seq((1L, "a", 2L), (1L, "b", 3L)).toDF("subj", "pred", "obj")
    assert(matchPath(mix, Seq(Step("", negated = Seq("a"), inverse = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((3L, 1L)))
    val zeroTwo = matchPath(chain,
        Seq(Step("p", plus = true, maxHops = 2, opt = true)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zeroTwo === pairs(2) ++ (1L to 5L).map(n => (n, n)).toSet)
  }

  test("matchBgpGraphs: the BGP matches WITHIN each named graph") {
    import spark.implicits._
    import Bgp._
    // g1 asserts the whole pattern; g2 has the pieces split across graphs
    val t = Seq(
      ("g1", 1L, "m", 2L), ("g1", 2L, "r", 3L),
      ("g2", 1L, "m", 2L), ("g3", 2L, "r", 3L),
      ("g1", 1L, "m", 2L) // duplicate assertion — set semantics
    ).toDF("url", "subj", "pred", "obj").repartition(3)
    val got = matchBgpGraphs(t, Seq(
        Pattern(V("x"), "m", V("y")), Pattern(V("y"), "r", V("z"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set(("g1", 1L, 2L, 3L)))
    // constant existence guard joins through the graph key: only graphs
    // asserting BOTH the constant fact and the variable pattern survive
    val guarded = matchBgpGraphs(t, Seq(
        Pattern(V("x"), "m", V("y")), Pattern(C(2L), "r", C(3L))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(guarded === Set(("g1", 1L, 2L)))
  }
}
