package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's builtin function surface re-expressed over Catalyst
  * columns (SURVEY.md §2.4, [R: src/org/apache/pig/builtin/]).
  *
  * Everything here is a pure composition of codegen'd built-in
  * functions — no UDFs — so expressions stay inside whole-stage codegen
  * and predicates containing them remain pushdown-eligible.
  *
  * Where the reference's semantics differ from Spark's (0-based offsets,
  * anchored regex match, null on division by zero, …) the adapter encodes
  * the reference behavior; each such divergence is unit-tested.
  */
object PigFunctions {

  // ---------------------------------------------------------------- strings

  /** INDEXOF(str, sub[, from]) — 0-based first occurrence, -1 if absent
    * [R: src/org/apache/pig/builtin/INDEXOF.java]. Spark `locate` is
    * 1-based with 0 for absent, hence the -1 shift.
    */
  def indexOf(str: Column, sub: Column): Column =
    (locate_col(sub, str) - 1).cast(IntegerType)

  def indexOf(str: Column, sub: String): Column = indexOf(str, lit(sub))

  /** 3-arg INDEXOF(str, sub, from) — java String.indexOf(sub, from):
    * search starts at the 0-based `from` (negative clamps to 0), -1 if
    * absent. locate's 1-based pos form maps directly. */
  def indexOf(str: Column, sub: Column, from: Column): Column =
    (call_function("locate", sub, str,
      (greatest(from.cast(IntegerType), lit(0)) + 1)) - 1).cast(IntegerType)

  /** LAST_INDEX_OF(str, sub) — 0-based, -1 if absent
    * [R: src/org/apache/pig/builtin/LAST_INDEX_OF.java]. Implemented by
    * locating the reversed needle in the reversed haystack.
    */
  def lastIndexOf(str: Column, sub: String): Column = {
    val posFromEnd = locate_col(reverse(lit(sub)), reverse(str)) // 1-based, 0 = absent
    when(posFromEnd === 0, lit(-1))
      .otherwise(length(str) - posFromEnd - lit(sub.length) + 1)
      .cast(IntegerType)
  }

  // locate(substr: String, col) exists; we need column substr — use expr.
  private def locate_col(sub: Column, str: Column): Column =
    call_function("locate", sub, str)

  /** SUBSTRING(str, start, stop) — 0-based, half-open [start, stop)
    * [R: src/org/apache/pig/builtin/SUBSTRING.java]. Spark substring is
    * 1-based with a length argument.
    */
  def substringPig(str: Column, start: Int, stop: Int): Column =
    substring(str, start + 1, math.max(stop - start, 0))

  def substringPig(str: Column, start: Column, stop: Column): Column =
    str.substr(start + 1, greatest(stop - start, lit(0)))

  /** MATCHES — whole-string anchored regex, unlike rlike's find()
    * semantics [R: src/org/apache/pig/backend/hadoop/executionengine/physicalLayer/expressionOperators/PORegexp.java].
    */
  def matches(str: Column, pattern: String): Column =
    str.rlike("\\A(?:" + pattern + ")\\z")

  /** REGEX_EXTRACT(str, pattern, idx) — null (not "") when no match
    * [R: src/org/apache/pig/builtin/REGEX_EXTRACT.java].
    */
  def regexExtract(str: Column, pattern: String, idx: Int): Column =
    when(str.rlike(pattern), regexp_extract(str, pattern, idx))

  /** REGEX_EXTRACT_ALL(str, pattern) — whole-string anchored match
    * returning every captured group as an array (Pig returns a tuple;
    * positional access maps to array indexing), null when the string
    * does not match [R: src/org/apache/pig/builtin/REGEX_EXTRACT_ALL.java].
    * The group count comes from compiling the literal pattern, so the
    * expression stays a codegen'd regexp_extract chain — no UDF. A
    * non-participating optional group yields "" (Spark regexp_extract
    * semantics; Pig yields null there — documented deviation).
    */
  def regexExtractAll(str: Column, pattern: String): Column = {
    val g = java.util.regex.Pattern.compile(pattern).matcher("").groupCount()
    val anchored = "\\A(?:" + pattern + ")\\z"
    when(str.rlike(anchored),
      array((1 to g).map(i => regexp_extract(str, anchored, i)): _*))
  }

  /** STRSPLIT → array of tokens (Pig returns a tuple; positional access
    * maps to array indexing) [R: src/org/apache/pig/builtin/STRSPLIT.java]. */
  /** STRSPLIT — java String.split(regex) semantics: trailing empty
    * strings are DROPPED (Spark's split keeps them regardless of the
    * limit argument, so the trim is explicit: slice up to the last
    * non-empty element; java's one edge, "" -> [""], is special-cased).
    * [R: src/org/apache/pig/builtin/STRSPLIT.java] */
  def strSplit(str: Column, regex: String): Column = {
    val a = split(str, regex, -1)
    val lastNonEmpty = aggregate(
      zip_with(a, sequence(lit(1), size(a)),
        (x, i) => when(length(x) > 0, i).otherwise(0)),
      lit(0), (acc, v) => greatest(acc, v))
    when(length(str) === 0, array(lit("")))
      .otherwise(slice(a, lit(1), lastNonEmpty))
  }

  /** TOKENIZE(str[,delims]) — bag of words; default delimiters are
    * space, double-quote, comma, parens, star
    * [R: src/org/apache/pig/builtin/TOKENIZE.java]. Empty tokens are not
    * emitted (java StringTokenizer semantics).
    */
  def tokenize(str: Column, delimRegex: String = "[ \",()*]"): Column =
    filter(split(str, delimRegex), t => length(t) > 0)

  /** 2-arg TOKENIZE: every CHARACTER of `delims` is a delimiter
    * (StringTokenizer semantics) — quoted into a regex char class. */
  def tokenizeChars(str: Column, delims: String): Column = {
    require(delims.nonEmpty, "TOKENIZE delimiter chars must be non-empty")
    tokenize(str, "[\\Q" + delims + "\\E]")
  }

  /** SPRINTF [R: src/org/apache/pig/builtin/SPRINTF.java]. */
  def sprintf(fmt: String, args: Column*): Column = format_string(fmt, args: _*)

  def startsWith(str: Column, prefix: Column): Column = str.startsWith(prefix)
  def endsWith(str: Column, suffix: Column): Column = str.endsWith(suffix)
  def equalsIgnoreCase(a: Column, b: Column): Column = lower(a) === lower(b)
  def lcfirst(s: Column): Column = concat(lower(substring(s, 1, 1)), expr_drop1(s))
  def ucfirst(s: Column): Column = concat(upper(substring(s, 1, 1)), expr_drop1(s))
  private def expr_drop1(s: Column): Column = s.substr(lit(2), length(s))

  // ---------------------------------------------------------------- numeric

  /** Pig division: x/0 → null for ALL numeric types (Java double would
    * give Infinity; Pig returns null) — SURVEY.md §2.1 gotchas
    * [R: src/org/apache/pig/backend/hadoop/executionengine/physicalLayer/expressionOperators/Divide.java].
    */
  def divide(a: Column, b: Column): Column =
    when(b === lit(0), lit(null)).otherwise(a / b)

  /** Pig MOD with 0 divisor → null. */
  def mod(a: Column, b: Column): Column =
    when(b === lit(0), lit(null)).otherwise(a % b)

  /** ROUND(double) → long, half-away-from-zero
    * [R: src/org/apache/pig/builtin/ROUND.java] (Math.round on the
    * magnitude with sign restored).
    */
  def roundPig(d: Column): Column =
    (when(d >= 0, floor(d + 0.5)).otherwise(ceil(d - 0.5))).cast(LongType)

  /** Cross-engine-exact rounding: floor(x*10^d + 0.5)/10^d computed in
    * plain double arithmetic — the same formula any SQL oracle can run,
    * so differential tests are bit-exact (library `round` differs between
    * engines on shortest-repr ties).
    */
  def roundCompat(c: Column, digits: Int): Column = {
    val m = math.pow(10, digits)
    floor(c * m + 0.5) / m
  }

  /** ROUND_TO(double, digits) — half-even in Pig 0.13+? No: Pig ROUND_TO
    * uses BigDecimal.ROUND_HALF_EVEN. We keep Spark `bround` (half-even)
    * [R: src/org/apache/pig/builtin/ROUND_TO.java].
    */
  def roundTo(d: Column, digits: Int): Column = bround(d, digits)

  // ------------------------------------------------------------- bag / size

  /** SIZE — element count for bags/maps/tuples, char count for
    * chararray [R: src/org/apache/pig/builtin/SIZE.java family]. The
    * caller picks the overload via the column type.
    */
  def sizeOfString(s: Column): Column = length(s).cast(LongType)
  def sizeOfBag(b: Column): Column = size(b).cast(LongType)

  def isEmpty(bag: Column): Column = size(bag) === 0

  /** BagToString(bag_of_scalars, delim)
    * [R: src/org/apache/pig/builtin/BagToString.java]. */
  def bagToString(bag: Column, delim: String): Column =
    array_join(bag.cast(ArrayType(StringType)), delim)

  /** DIFF(bag1, bag2) — symmetric difference as a bag
    * [R: src/org/apache/pig/builtin/DIFF.java]. */
  def diff(a: Column, b: Column): Column =
    array_union(array_except(a, b), array_except(b, a))

  /** TOP(n, sortIndexAsc?, bag) — top-n elements of a bag of structs by
    * one field [R: src/org/apache/pig/builtin/TOP.java]. `fieldOrd`
    * selects the struct field; descending like Pig TOP.
    */
  def topN(bag: Column, n: Int, field: String): Column =
    slice(array_sort(bag, (l, r) =>
      when(l.getField(field) > r.getField(field), -1)
        .when(l.getField(field) < r.getField(field), 1)
        .otherwise(0)), 1, n)

  // ---------------------------------------------------------------- datetime

  /** DaysBetween/HoursBetween/… — joda-style: whole units, truncating
    * toward zero [R: src/org/apache/pig/builtin/DaysBetween.java etc].
    */
  private def between(a: Column, b: Column, unitSeconds: Long): Column = {
    val diff = unix_micros(a) - unix_micros(b)
    (diff / (unitSeconds * 1000000L)).cast(LongType)
  }
  def daysBetween(a: Column, b: Column): Column = between(a, b, 86400L)
  def hoursBetween(a: Column, b: Column): Column = between(a, b, 3600L)
  def minutesBetween(a: Column, b: Column): Column = between(a, b, 60L)
  def secondsBetween(a: Column, b: Column): Column = between(a, b, 1L)
  def milliSecondsBetween(a: Column, b: Column): Column =
    ((unix_micros(a) - unix_micros(b)) / 1000L).cast(LongType)

  /** AddDuration(dt, 'ISO-8601 duration') — e.g. P1Y2M3DT4H5M6S
    * [R: src/org/apache/pig/builtin/AddDuration.java]. The duration is a
    * literal, so we parse it driver-side: the calendar part (years /
    * months, joda Period semantics — month arithmetic clamps the
    * day-of-month) becomes a year-month INTERVAL, the exact part
    * (weeks / days / time) a day-time INTERVAL. Both stay codegen'd
    * timestamp + interval additions.
    */
  def addDuration(dt: Column, iso: String): Column = shiftByDuration(dt, iso, 1)
  def subtractDuration(dt: Column, iso: String): Column = shiftByDuration(dt, iso, -1)

  private def shiftByDuration(dt: Column, iso: String, sign: Int): Column = {
    val (months, exact) = parseIsoDuration(iso)
    var c = dt
    if (months != 0)
      c = c + expr(s"INTERVAL '${sign * months}' MONTH")
    if (!exact.isZero)
      c = if (sign > 0) c + lit(exact) else c - lit(exact)
    c
  }

  /** ISO-8601 duration → (calendar months, exact java.time.Duration).
    * Handles the full PnYnMnWnDTnHnMnS form: the date part parses as a
    * java.time.Period (weeks normalize to days), the time part as a
    * Duration. Y/M are calendar-relative so they must be applied as a
    * month interval, not a fixed number of seconds.
    */
  private[graft] def parseIsoDuration(iso: String): (Int, java.time.Duration) = {
    val neg = iso.startsWith("-")
    val body = if (neg) iso.substring(1) else iso
    require(body.startsWith("P") || body.startsWith("p"), s"not an ISO-8601 duration: $iso")
    val t = body.indexOf('T')
    val datePart = if (t >= 0) body.substring(0, t) else body
    val period =
      if (datePart.length > 1) java.time.Period.parse(datePart) else java.time.Period.ZERO
    val time =
      if (t >= 0) java.time.Duration.parse("P" + body.substring(t)) else java.time.Duration.ZERO
    val months = period.getYears * 12 + period.getMonths
    val exact = time.plusDays(period.getDays.toLong)
    if (neg) (-months, exact.negated()) else (months, exact)
  }

  def weeksBetween(a: Column, b: Column): Column = between(a, b, 604800L)

  /** MonthsBetween/YearsBetween — joda counts whole calendar months
    * truncating toward zero; Spark months_between yields fractional
    * months on a 31-day basis, so whole-month truncation matches joda
    * for the whole part [R: src/org/apache/pig/builtin/MonthsBetween.java]. */
  def monthsBetweenPig(a: Column, b: Column): Column =
    months_between(a, b).cast(LongType)
  def yearsBetweenPig(a: Column, b: Column): Column =
    (months_between(a, b) / 12.0).cast(LongType)

  def getYear(dt: Column): Column = year(dt)
  def getMonth(dt: Column): Column = month(dt)
  def getDay(dt: Column): Column = dayofmonth(dt)
  def getHour(dt: Column): Column = hour(dt)
  def getMinute(dt: Column): Column = minute(dt)
  def getSecond(dt: Column): Column = second(dt)
  def getWeek(dt: Column): Column = weekofyear(dt)
  def getWeekYear(dt: Column): Column = call_function("extract", lit("YEAROFWEEK"), dt)
  def getMilliSecond(dt: Column): Column = (unix_micros(dt) % 1000000L / 1000L).cast(IntegerType)
  def toMilliSeconds(dt: Column): Column = (unix_micros(dt) / 1000L).cast(LongType)
  def currentTime(): Column = current_timestamp()
  def toUnixTime(dt: Column): Column = unix_timestamp(dt)
  def toDate(s: Column, fmt: String): Column = to_timestamp(s, fmt)
  def toStringDt(dt: Column, fmt: String): Column = date_format(dt, fmt)

  // ------------------------------------------------------------------- misc

  /** Pig CONCAT — null if any input null (Spark concat matches). */
  def concatPig(cols: Column*): Column = concat(cols: _*)

  /** UniqueID — per-row unique id (task id + sequence in the reference)
    * [R: src/org/apache/pig/builtin/UniqueID.java]. */
  def uniqueId(): Column = monotonically_increasing_id()

  /** VAR / STDEV (piggybank stats) → sample variance/stddev. */
  def variance(c: Column): Column = var_samp(c)
  def stdev(c: Column): Column = stddev_samp(c)

  /** STRSPLITTOBAG — like STRSPLIT but a bag (array) result; identical
    * here since bags of single-field tuples map to plain arrays. */
  def strSplitToBag(str: Column, regex: String): Column = strSplit(str, regex)

  /** PluckTuple: project columns by prefix. */
  def pluck(cols: Seq[String], prefix: String): Seq[Column] =
    cols.filter(_.startsWith(prefix)).map(col)
}
