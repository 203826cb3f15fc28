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

  /**
   * Match a connected BGP; returns one column per distinct variable name.
   *
   * @param triples rows with (subj, pred, obj)
   * @param patterns the conjunctive pattern list
   */
  def matchBgp(triples: DataFrame, patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    def scan(p: Pattern): (DataFrame, Set[String]) = {
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
    val (first, firstVars) = scan(patterns.head)
    val (joined, allVars) = patterns.tail.foldLeft((first, firstVars)) {
      case ((acc, bound), p) =>
        val (df, vars) = scan(p)
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
    require(allVars.nonEmpty, "BGP binds no variables (all patterns constant)")
    joined.select(allVars.toSeq.sorted.map(col): _*).distinct()
  }
}
