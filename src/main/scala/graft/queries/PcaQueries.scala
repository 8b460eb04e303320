package graft.queries

import graft.Tables
import graft.operators.Pca
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over the embeddings table with the TRAINING replayed in the
  * oracle, not just the projection: the exact fixed-point Gram pass,
  * the covariance descale, the deterministic-start power iteration
  * (unrolled, one CTE block per iteration), the first-max sign fix,
  * the Rayleigh eigenvalue and the rank-1 deflation are all mirrored
  * op-for-op in DuckDB list algebra (`list_dot_product` is the same
  * left-to-right fold as [[graft.functions.VectorDot]], so every
  * float op sequence is bit-identical — the q149 GD-replay pattern).
  */
object PcaQueries {

  private val Dim = 64
  private val Iters = 12
  private val NComp = 2

  /** q171: top-2 principal-component projection of the first 100
    * embeddings. [[Pca.fit]] runs its one distributed Gram pass at
    * query build; projection is model-literal scan-side math. */
  def pcaProject(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val emb = Tables.embeddings(s, d)
    val model = Pca.fit(emb, "embedding", Dim, NComp, iters = Iters)
    emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("label"),
        Pca.project(col("embedding"), model, 0).as("pc1"),
        Pca.project(col("embedding"), model, 1).as("pc2"))
  }

  /** One unrolled power-iteration block over matrix CTE `a` (rows
    * (r, row:DOUBLE[64])), reading vector CTE `vin`, defining `vout`.
    * Zero-norm guard matches [[Pca.fit]]: keep the previous vector. */
  private def iterCtes(a: String, vin: String, vout: String): String =
    s"""w_$vout AS MATERIALIZED (SELECT r, list_dot_product($a.row, v.v) AS w
       |  FROM $a, $vin v),
       |wl_$vout AS MATERIALIZED (SELECT list(w ORDER BY r) AS wl FROM w_$vout),
       |$vout AS MATERIALIZED (SELECT CASE
       |    WHEN sqrt(list_dot_product(wl, wl)) = 0
       |      THEN (SELECT v FROM $vin)
       |    ELSE list_transform(wl, x -> x / sqrt(list_dot_product(wl, wl)))
       |  END AS v FROM wl_$vout)""".stripMargin

  /** Sign fix + converged vector for one component: first-max-|coord|
    * index, negate if that coordinate is negative. */
  private def signCtes(vin: String, vout: String): String =
    s"""mx_$vout AS MATERIALIZED (SELECT i FROM $vin, unnest(range(1, ${Dim + 1})) t(i)
       |  ORDER BY abs(v[i]) DESC, i LIMIT 1),
       |$vout AS MATERIALIZED (SELECT list_transform(v, x -> x * sg) AS v
       |  FROM $vin, (SELECT CASE WHEN v[(SELECT i FROM mx_$vout)] < 0
       |                THEN -1.0 ELSE 1.0 END AS sg FROM $vin) s)""".stripMargin

  val pcaProjectSql: String = {
    val iters1 = (1 to Iters)
      .map(k => iterCtes("a1", if (k == 1) "v1_0" else s"v1_${k - 1}", s"v1_$k"))
      .mkString(",\n")
    val iters2 = (1 to Iters)
      .map(k => iterCtes("a2", if (k == 1) "v2_0" else s"v2_${k - 1}", s"v2_$k"))
      .mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] AS x,
       |    list_transform(embedding::DOUBLE[],
       |      x -> round(x * ${Pca.Scale})::BIGINT) AS q
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM e),
       |sums AS MATERIALIZED (SELECT i, (sum(q[i]))::BIGINT AS s
       |  FROM e, unnest(range(1, ${Dim + 1})) t(i) GROUP BY i),
       |prods AS MATERIALIZED (SELECT i, j, (sum(q[i] * q[j]))::BIGINT AS p
       |  FROM e, unnest(range(1, ${Dim + 1})) t(i),
       |       unnest(range(1, ${Dim + 1})) u(j)
       |  WHERE j >= i GROUP BY i, j),
       |means AS MATERIALIZED (SELECT i, s::DOUBLE / n / ${Pca.Scale}.0 AS m
       |  FROM sums, nn),
       |meanv AS MATERIALIZED (SELECT list(m ORDER BY i) AS mv FROM means),
       |cove AS MATERIALIZED (SELECT p.i, p.j,
       |    p.p::DOUBLE / nn.n / ${Pca.Scale * Pca.Scale}.0 - mi.m * mj.m AS c
       |  FROM prods p
       |  JOIN means mi ON mi.i = p.i
       |  JOIN means mj ON mj.i = p.j, nn),
       |covf AS MATERIALIZED (SELECT i, j, c FROM cove
       |  UNION ALL SELECT j, i, c FROM cove WHERE i <> j),
       |a1 AS MATERIALIZED (SELECT i AS r, list(c ORDER BY j) AS row
       |  FROM covf GROUP BY i),
       |best1 AS MATERIALIZED (SELECT i FROM cove WHERE i = j ORDER BY c DESC, i LIMIT 1),
       |v1_0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dim + 1}),
       |    x -> CASE WHEN x = b.i THEN 1.0 ELSE 0.0 END) AS v FROM best1 b),
       |$iters1,
       |${signCtes(s"v1_$Iters", "v1f")},
       |av1 AS MATERIALIZED (SELECT r, list_dot_product(a1.row, f.v) AS w FROM a1, v1f f),
       |ev1 AS MATERIALIZED (SELECT list_dot_product(f.v,
       |    (SELECT list(w ORDER BY r) FROM av1)) AS ev FROM v1f f),
       |a2 AS MATERIALIZED (SELECT a1.r,
       |    list_transform(range(1, ${Dim + 1}),
       |      c -> a1.row[c] - e2.ev * f.v[a1.r] * f.v[c]) AS row
       |  FROM a1, ev1 e2, v1f f),
       |best2 AS MATERIALIZED (SELECT r AS i FROM a2 ORDER BY row[r] DESC, r LIMIT 1),
       |v2_0 AS MATERIALIZED (SELECT list_transform(range(1, ${Dim + 1}),
       |    x -> CASE WHEN x = b.i THEN 1.0 ELSE 0.0 END) AS v FROM best2 b),
       |$iters2,
       |${signCtes(s"v2_$Iters", "v2f")}
       |SELECT vec_id, label,
       |  round(list_dot_product(x, (SELECT v FROM v1f)) -
       |    list_dot_product((SELECT mv FROM meanv), (SELECT v FROM v1f)), 6)
       |    AS pc1,
       |  round(list_dot_product(x, (SELECT v FROM v2f)) -
       |    list_dot_product((SELECT mv FROM meanv), (SELECT v FROM v2f)), 6)
       |    AS pc2
       |FROM e WHERE vec_id < 100""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q171_pca_project", pcaProject, Some(pcaProjectSql)))
}
