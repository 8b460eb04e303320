package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def closure(edges: Seq[(Long, Option[Long])]): Map[Long, Seq[Long]] = {
    val df = edges.toDF("id", "parent")
    Hierarchy.ancestorPaths(df, "id", "parent")
      .as[(Long, Seq[Long], Int)].collect()
      .map(t => t._1 -> t._2).toMap
  }

  test("ancestors are nearest-first along a chain") {
    val anc = closure(Seq(1L -> None, 2L -> Some(1L), 3L -> Some(2L), 4L -> Some(3L)))
    assert(anc(4L) == Seq(3L, 2L, 1L))
    assert(anc(2L) == Seq(1L))
    assert(!anc.contains(1L)) // roots have no closure rows
  }

  test("forest: paths stay within each tree") {
    val anc = closure(Seq(
      1L -> None, 2L -> Some(1L),
      10L -> None, 11L -> Some(10L), 12L -> Some(11L)))
    assert(anc(12L) == Seq(11L, 10L))
    assert(anc(2L) == Seq(1L))
  }

  test("property (seeded random forests): ancestors(c) = parent +: ancestors(parent)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      // node i's parent is a smaller id (acyclic by construction) or a root
      val n = 2 + rnd.nextInt(30)
      val edges: Seq[(Long, Option[Long])] = (0L, None) +: (1 until n).map { i =>
        val p = if (rnd.nextDouble() < 0.2) None else Some(rnd.nextInt(i).toLong)
        (i.toLong, p)
      }
      val anc = closure(edges).withDefaultValue(Seq.empty)
      edges.foreach {
        case (id, Some(p)) => assert(anc(id) == p +: anc(p),
          s"node $id of forest $edges")
        case (id, None) => assert(anc(id).isEmpty)
      }
    }
  }

  test("recursive-CTE closure agrees with the iterative closure") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (0L, Option.empty[Long]) +: (1 until n).map { i =>
      (i.toLong, if (rnd.nextDouble() < 0.15) None else Some(rnd.nextInt(i).toLong))
    }
    val df = edges.toDF("id", "parent")
    val iter = Hierarchy.ancestorClosure(df, "id", "parent")
      .as[(Long, Long, Int)].collect().toSet
    val cte = Hierarchy.ancestorClosureSql(df, "id", "parent")
      .as[(Long, Long, Int)].collect().toSet
    assert(iter == cte)
    assert(iter.nonEmpty)
  }

  test("ancestorClosureSql leaves the session catalog view-free") {
    val df = Seq((1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(2L)))
      .toDF("id", "parent")
    val out = Hierarchy.ancestorClosureSql(df, "id", "parent")
    // the temp view is inlined at analysis and dropped before return:
    // repeated calls in a long-lived session must not accrete catalog
    // entries, and the returned (lazy) frame must still compute
    Hierarchy.ancestorClosureSql(df, "id", "parent")
    val leaked = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("__hier_nodes_"))
    assert(leaked.isEmpty, s"temp views leaked: ${leaked.map(_.name).toSeq}")
    assert(out.count() == 3) // usable after its view is gone
  }

  test("depth cap truncates runaway chains") {
    val deep = (0 until 40).map(i =>
      (i.toLong, if (i == 0) None else Some((i - 1).toLong)))
    val anc = closure(deep) // default maxDepth 32
    assert(anc(39L).length == 32)
    assert(anc(39L).take(3) == Seq(38L, 37L, 36L))
  }
}
