package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asOf attaches the most recent prior right value per key") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq(
      (1L, 5L, "e1"), (1L, 15L, "e2"), (1L, 25L, "e3"),
      (2L, 10L, "e4"), // key with no right rows at all
      (3L, 1L, "e5") // before any right row for key 3
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0),
      (3L, 50L, 900.0)
    ).toDF("k", "rts", "price")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rts", Seq("price"))
      .select("name", "asof_price").as[(String, Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Array(
      ("e1", None), // ts=5 before first right ts=10
      ("e2", Some(100.0)), // latest right <= 15 is ts=10
      ("e3", Some(200.0)),
      ("e4", None),
      ("e5", None)))
  }

  test("asOf never mixes value columns across different right rows") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 30L, "e")).toDF("k", "ts", "name")
    // later right row has a null price — the earlier price must NOT leak in
    val right = Seq(
      (1L, 10L, Some(10.0), Option.empty[Long]),
      (1L, 20L, Option.empty[Double], Some(5L))
    ).toDF("k", "rts", "price", "qty")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rts", Seq("price", "qty"))
      .select("asof_price", "asof_qty").as[(Option[Double], Option[Long])].head()
    assert(out === ((None, Some(5L))))
  }

  test("asOf is inclusive at equal timestamps") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 10L, "e")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "rts", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", "rts", Seq("v"))
      .select("asof_v").as[Option[Double]].head()
    assert(out === Some(7.0))
  }
}
