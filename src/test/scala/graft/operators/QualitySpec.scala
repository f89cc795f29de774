package graft.operators

import graft.SparkSpec
import graft.operators.Quality._

/** The constraint compiler must report exact violation counts —
  * checked on data engineered to violate every family. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (1L, Some("a@x.com"), 5L),
    (2L, None, 15L),          // null email, out-of-bounds v
    (2L, Some("b@y.org"), 7L), // duplicate id
    (4L, Some("not-an-email"), 9L)
  ).toDF("id", "email", "v")

  private def refKeys = Seq(1L, 2L, 3L).toDF("k")

  test("every constraint family reports exact num/den and verdict") {
    val out = check(dirty, Seq(
      Complete("email"),
      Unique(Seq("id")),
      Bounds("v", 0, 10),
      Matches("email", "^[^@]+@[^@]+\\.[a-z]+$", minNum = 1, minDen = 2),
      ContainedIn("id", refKeys, "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("complete(email)") == ((3L, 4L, false)))
    assert(out("unique(id)") == ((3L, 4L, false)))
    assert(out("bounds(v,0,10)") == ((3L, 4L, false)))
    // 2 well-formed of 4 → exactly the 1/2 minimum → passes
    assert(out("matches(email)") == ((2L, 4L, true)))
    // distinct ids {1,2,4}; 4 is an orphan
    assert(out("contained(id)") == ((2L, 3L, false)))
  }

  test("a clean table passes everything") {
    val clean = Seq((1L, Some("a@x.com"), 5L), (2L, Some("b@y.io"), 9L))
      .toDF("id", "email", "v")
    val out = check(clean, Seq(Complete("email"), Unique(Seq("id")),
      Bounds("v", 0, 10), Matches("email", "@"),
      ContainedIn("id", refKeys, "k")))
      .collect()
    assert(out.length == 5 && out.forall(_.getBoolean(3)), out.mkString("; "))
  }
}
