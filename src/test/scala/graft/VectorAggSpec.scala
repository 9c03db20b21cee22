package graft

import graft.functions.VectorAgg
import graft.operators.Similarity

class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  test("vectorAvg Aggregator matches the exploded centroid within float tolerance") {
    val rows = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 10.0f)), (1, Array(20.0f, 30.0f)))
    val df = rows.toDF("label", "embedding")

    val typed = df.as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAgg.vectorAvg.toColumn.name("centroid"))
      .collect().toMap

    assert(typed(0).toSeq == Seq(2.0, 4.0))
    assert(typed(1).toSeq == Seq(15.0, 20.0))

    val exploded = Similarity.centroids(df, "label", "embedding")
      .orderBy("label", "d")
      .collect()
      .groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getDouble(2)).toSeq).toMap
    rows.map(_._1).distinct.foreach { l =>
      typed(l).toSeq.zip(exploded(l)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }

  test("vectorAvg handles empty and null-safe groups") {
    val df = Seq((0, Array(2.0f, 4.0f)), (0, null.asInstanceOf[Array[Float]]))
      .toDF("label", "embedding")
    val got = df.as[(Int, Array[Float])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(VectorAgg.vectorAvg.toColumn.name("centroid"))
      .collect().toMap
    assert(got(0).toSeq == Seq(2.0, 4.0)) // null vector ignored
  }
}
