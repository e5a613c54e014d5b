package graft

import org.apache.spark.sql.functions._
import graft.dsl.{PigFunctions => PF}

/** Pig-exact semantics of the function adapters (SURVEY.md §7.4 #2: each
  * offset/rounding/null divergence is a silent hash-miss if wrong).
  * Expected values follow the reference's documented behavior
  * [R: src/org/apache/pig/builtin/].
  */
class PigFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("INDEXOF is 0-based with -1 for absent") {
    val df = Seq(("hello world", "o"), ("hello", "z"), ("abc", "a")).toDF("s", "sub")
    val got = df.select(PF.indexOf($"s", $"sub")).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(4, -1, 0))
  }

  test("LAST_INDEX_OF is 0-based from the right") {
    val df = Seq("abcabc").toDF("s")
    assert(col0(df.select(PF.lastIndexOf($"s", "bc"))) == Seq(4))
    assert(col0(df.select(PF.lastIndexOf($"s", "zz"))) == Seq(-1))
  }

  test("SUBSTRING is 0-based half-open like java substring") {
    val df = Seq("hello world").toDF("s")
    assert(col0(df.select(PF.substringPig($"s", 0, 5))) == Seq("hello"))
    assert(col0(df.select(PF.substringPig($"s", 6, 11))) == Seq("world"))
    assert(col0(df.select(PF.substringPig($"s", 3, 3))) == Seq(""))
  }

  test("MATCHES anchors the whole string (PORegexp semantics)") {
    val df = Seq("hello").toDF("s")
    assert(col0(df.select(PF.matches($"s", "hell"))) == Seq(false))
    assert(col0(df.select(PF.matches($"s", "hell.*"))) == Seq(true))
    assert(col0(df.select(PF.matches($"s", ".*ell.*"))) == Seq(true))
  }

  test("REGEX_EXTRACT returns null (not empty string) on no match") {
    val df = Seq("abc123").toDF("s")
    assert(col0(df.select(PF.regexExtract($"s", "([0-9]+)", 1))) == Seq("123"))
    assert(col0(df.select(PF.regexExtract($"s", "(xyz)", 1))) == Seq(null))
  }

  test("REGEX_EXTRACT_ALL anchors the whole string and returns all groups, null on no match") {
    val df = Seq("192.168.1.5:8080").toDF("s")
    assert(col0(df.select(PF.regexExtractAll($"s", "([0-9.]+):([0-9]+)")))
      == Seq(Seq("192.168.1.5", "8080")))
    // find()-style partial match is NOT enough: the whole string must match
    assert(col0(df.select(PF.regexExtractAll($"s", "([0-9.]+):"))) == Seq(null))
    assert(col0(df.select(PF.regexExtractAll($"s", "(xyz)(q)"))) == Seq(null))
  }

  test("TOKENIZE splits on pig default delims and drops empties") {
    val df = Seq("""a b,c(d)e"f**g""").toDF("s")
    assert(col0(df.select(PF.tokenize($"s"))) ==
      Seq(Seq("a", "b", "c", "d", "e", "f", "g")))
  }

  test("division by zero yields null, not Infinity or error") {
    val df = Seq((1.0, 0.0), (10.0, 2.0)).toDF("a", "b")
    assert(col0(df.select(PF.divide($"a", $"b"))) == Seq(null, 5.0))
    val di = Seq((7, 0), (7, 3)).toDF("a", "b")
    assert(col0(di.select(PF.mod($"a", $"b"))) == Seq(null, 1))
  }

  test("ROUND is half-away-from-zero to long") {
    val df = Seq(2.5, -2.5, 2.4, -2.4, 0.0).toDF("d")
    assert(col0(df.select(PF.roundPig($"d"))) == Seq(3L, -3L, 2L, -2L, 0L))
  }

  test("roundCompat matches the floor(x*10^d+0.5) formula exactly") {
    val df = Seq(0.123456789, 1.0000005).toDF("d")
    val got = col0(df.select(PF.roundCompat($"d", 6)))
    assert(got == Seq(math.floor(0.123456789 * 1e6 + 0.5) / 1e6,
      math.floor(1.0000005 * 1e6 + 0.5) / 1e6))
  }

  test("xBetween truncates whole units toward zero (joda semantics)") {
    val df = Seq(("2024-01-03 11:59:59", "2024-01-01 12:00:00")).toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    assert(col0(df.select(PF.daysBetween($"a", $"b"))) == Seq(1L)) // 47:59:59 → 1 day
    assert(col0(df.select(PF.hoursBetween($"a", $"b"))) == Seq(47L))
  }

  test("AddDuration applies ISO-8601 time durations") {
    val df = Seq("2024-01-01 00:00:00").toDF("s").select(to_timestamp($"s").as("t"))
    val got = col0(df.select(PF.addDuration($"t", "P1DT2H30M").cast("string")))
    assert(got == Seq("2024-01-02 02:30:00"))
  }

  test("AddDuration handles weeks as exact 7-day spans") {
    val df = Seq("2024-01-01 06:00:00").toDF("s").select(to_timestamp($"s").as("t"))
    assert(col0(df.select(PF.addDuration($"t", "P2W").cast("string"))) ==
      Seq("2024-01-15 06:00:00"))
  }

  test("AddDuration months/years are calendar-relative with day clamping (joda)") {
    val df = Seq("2024-01-31 12:00:00").toDF("s").select(to_timestamp($"s").as("t"))
    // Jan 31 + 1 month → Feb 29 (leap year, day clamps like joda plusMonths)
    assert(col0(df.select(PF.addDuration($"t", "P1M").cast("string"))) ==
      Seq("2024-02-29 12:00:00"))
    val leap = Seq("2024-02-29 00:00:00").toDF("s").select(to_timestamp($"s").as("t"))
    assert(col0(leap.select(PF.addDuration($"t", "P1Y").cast("string"))) ==
      Seq("2025-02-28 00:00:00"))
    // combined calendar + exact parts
    assert(col0(df.select(PF.addDuration($"t", "P1Y1M1DT1H").cast("string"))) ==
      Seq("2025-03-01 13:00:00"))
  }

  test("SubtractDuration inverts calendar and exact parts") {
    val df = Seq("2024-03-31 12:00:00").toDF("s").select(to_timestamp($"s").as("t"))
    assert(col0(df.select(PF.subtractDuration($"t", "P1M").cast("string"))) ==
      Seq("2024-02-29 12:00:00"))
    assert(col0(df.select(PF.subtractDuration($"t", "P1W").cast("string"))) ==
      Seq("2024-03-24 12:00:00"))
  }

  test("parseIsoDuration rejects garbage loudly") {
    intercept[Exception](PF.parseIsoDuration("2 weeks"))
  }

  test("extended datetime surface: weekyear, millis, weeks/months/years between") {
    val df = Seq(("2024-01-01 12:00:00.250", "2022-06-15 12:00:00"))
      .toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    assert(col0(df.select(PF.getWeekYear($"a"))) == Seq(2024))
    assert(col0(df.select(PF.getMilliSecond($"a"))) == Seq(250))
    assert(col0(df.select(PF.toMilliSeconds($"b"))) == Seq(1655294400000L))
    assert(col0(df.select(PF.weeksBetween($"a", $"b"))) == Seq(80L))
    assert(col0(df.select(PF.monthsBetweenPig($"a", $"b"))) == Seq(18L))
    assert(col0(df.select(PF.yearsBetweenPig($"a", $"b"))) == Seq(1L))
  }

  test("SIZE: string length vs bag size") {
    val df = Seq((Seq(1, 2, 3), "abcd")).toDF("bag", "s")
    assert(col0(df.select(PF.sizeOfBag($"bag"))) == Seq(3L))
    assert(col0(df.select(PF.sizeOfString($"s"))) == Seq(4L))
  }

  test("DIFF is the symmetric bag difference") {
    val df = Seq((Seq(1, 2, 3), Seq(2, 3, 4))).toDF("a", "b")
    assert(col0(df.select(PF.diff($"a", $"b"))) == Seq(Seq(1, 4)))
  }

  test("TOP keeps n largest by field") {
    val df = Seq(Seq((1, "a"), (5, "b"), (3, "c")))
      .toDF("bag")
      .select($"bag".cast("array<struct<score:int,name:string>>").as("bag"))
    val got = df.select(PF.topN($"bag", 2, "score")).collect()(0).getSeq[Any](0)
    assert(got.map(_.asInstanceOf[org.apache.spark.sql.Row].getInt(0)) == Seq(5, 3))
  }

  test("property sweep: INDEXOF/SUBSTRING agree with java semantics on random inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcxy "
    val cases = (1 to 300).map { _ =>
      val s = (0 until 1 + rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val sub = (0 until 1 + rnd.nextInt(3)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val a = rnd.nextInt(s.length + 1); val b = a + rnd.nextInt(s.length - a + 1)
      (s, sub, a, b)
    }
    val df = cases.toDF("s", "sub", "a", "b")
    val got = df.select(PF.indexOf($"s", $"sub"),
      PF.substringPig($"s", $"a", $"b")).collect().toSeq
    cases.zip(got).foreach { case ((s, sub, a, b), row) =>
      assert(row.getInt(0) == s.indexOf(sub), s"indexOf($s, $sub)")
      assert(row.getString(1) == s.substring(a, b), s"substring($s, $a, $b)")
    }
  }
}
