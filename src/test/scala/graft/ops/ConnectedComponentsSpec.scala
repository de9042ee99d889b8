package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components vs a brute-force
  * union-find oracle, across graph shapes that stress the algorithm
  * differently: long chains (worst case for plain label propagation),
  * cliques, stars, isolated edges, and random sparse graphs. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force oracle: path-compressed union-find over the edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)], parts: Int = 5): Map[Long, Long] = {
    val df = spark.createDataset(edges).repartition(parts).toDF("src", "dst")
    ConnectedComponents.labels(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain of 60 nodes collapses to one component rooted at the min") {
    val edges = (1L until 60L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got === (1L to 60L).map(_ -> 1L).toMap)
  }

  test("random sparse graph matches union-find (every node labeled, same partition)") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    val want = unionFind(edges)
    assert(got === want)
  }

  test("cliques, stars, isolated edges, duplicate + reversed edges") {
    val clique = for (a <- 100L to 104L; b <- 100L to 104L if a < b) yield (a, b)
    val star = (1L to 8L).map(i => (50L, 50L + i))
    val iso = Seq((900L, 901L), (901L, 900L), (900L, 901L)) // dup + reversed
    val edges = clique ++ star ++ iso
    val got = run(edges)
    assert(got === unionFind(edges))
    assert(got(104L) === 100L && got(58L) === 50L && got(901L) === 900L)
  }

  test("self-loops tolerated; empty edge set yields empty labeling") {
    assert(run(Seq((7L, 7L), (7L, 8L))) === Map(7L -> 7L, 8L -> 7L))
    assert(ConnectedComponents.labels(
      spark.createDataset(Seq.empty[(Long, Long)]).toDF("src", "dst")).isEmpty)
  }

  test("a node appearing ONLY in self-loops is labeled as its own singleton") {
    assert(run(Seq((9L, 9L))) === Map(9L -> 9L))
    assert(run(Seq((9L, 9L), (1L, 2L))) === Map(9L -> 9L, 1L -> 1L, 2L -> 1L))
  }
}
