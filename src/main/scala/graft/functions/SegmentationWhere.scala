package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for Mixpanel segmentation-expression `where` strings (SURVEY §2.3
  * F4; reference pushes the raw string to the /export API —
  * connectors/mixpanelETL.js:80-82). Our engine parses the same expression
  * into a Catalyst `Column`, so one predicate string works both locally
  * (Catalyst pushes it into the scan) and at a pushdown-capable source.
  *
  * Grammar (the commonly-used subset):
  *   expr     := term (('and'|'or') term)*
  *   term     := 'not'? atom
  *   atom     := '(' expr ')' | 'defined(' prop ')'
  *             | 'contains(' prop ',' literal ')'
  *             | literal 'in' prop          -- substring containment
  *             | prop 'in' list             -- membership
  *             | prop op literal
  *   prop     := 'properties["<key>"]'
  *   op       := '==' | '!=' | '>' | '>=' | '<' | '<='
  *   literal  := "string" | number
  *   list     := '[' literal (',' literal)* ']'
  *
  * `in` follows Mixpanel's dual meaning: string-in-string is substring
  * containment, value-in-list is membership.
  */
object SegmentationWhere {

  /** Parse `where` into a predicate over `propsCol` (a map<string,string>
    * column). Throws IllegalArgumentException on syntax errors.
    */
  def parse(where: String, propsCol: Column): Column =
    new P(where, propsCol).parseExpr(0)._1

  private class P(s: String, props: Column) {
    private def ws(i: Int): Int = { var j = i; while (j < s.length && s(j).isWhitespace) j += 1; j }
    private def kw(i: Int, w: String): Option[Int] = {
      val j = ws(i)
      if (s.regionMatches(true, j, w, 0, w.length)) Some(j + w.length) else None
    }

    def parseExpr(i0: Int): (Column, Int) = {
      var (acc, i) = parseTerm(i0)
      var done = false
      while (!done) {
        kw(i, "and") match {
          case Some(j) =>
            val (rhs, k) = parseTerm(j); acc = acc && rhs; i = k
          case None => kw(i, "or") match {
            case Some(j) =>
              val (rhs, k) = parseTerm(j); acc = acc || rhs; i = k
            case None => done = true
          }
        }
      }
      (acc, i)
    }

    private def parseTerm(i0: Int): (Column, Int) =
      kw(i0, "not") match {
        case Some(j) => val (c, k) = parseAtom(j); (!c, k)
        case None => parseAtom(i0)
      }

    private def parseAtom(i0: Int): (Column, Int) = {
      val i = ws(i0)
      if (i < s.length && s(i) == '(') {
        val (c, j) = parseExpr(i + 1)
        val k = ws(j)
        require(k < s.length && s(k) == ')', s"expected ) at $k in: $s")
        (c, k + 1)
      } else kw(i, "defined(") match {
        case Some(j) =>
          val (key, k) = parseProp(j) // j is just past "defined("
          val k3 = ws(k)
          require(k3 < s.length && s(k3) == ')', s"expected ) at $k3 in: $s")
          (props.getItem(key).isNotNull, k3 + 1)
        case None => kw(i, "contains(") match {
          case Some(j) =>
            // contains(prop, literal) → substring containment
            val (key, j1) = parseProp(j)
            val j2 = ws(j1)
            require(j2 < s.length && s(j2) == ',', s"expected , at $j2 in: $s")
            val (litC, j3) = parseLiteral(j2 + 1)
            val j4 = ws(j3)
            require(j4 < s.length && s(j4) == ')', s"expected ) at $j4 in: $s")
            val needle = litC.fold(identity, n => fmtNum(n))
            (props.getItem(key).contains(needle), j4 + 1)
          case None if startsLiteral(i) =>
            // literal in prop → substring containment (Mixpanel semantics)
            val (litC, j) = parseLiteral(i)
            val j2 = kw(j, "in").getOrElse(
              throw new IllegalArgumentException(s"expected 'in' at $j in: $s"))
            val (key, m) = parseProp(j2)
            val needle = litC.fold(identity, n => fmtNum(n))
            (props.getItem(key).contains(needle), m)
          case None =>
            parsePropComparison(i)
        }
      }
    }

    private def fmtNum(n: Double): String =
      if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString

    private def startsLiteral(i0: Int): Boolean = {
      val i = ws(i0)
      i < s.length && (s(i) == '"' || s(i).isDigit || s(i) == '-')
    }

    private def parsePropComparison(i0: Int): (Column, Int) = {
      val i = ws(i0)
      val (key, j) = parseProp(i)
      val k = ws(j)
      kw(k, "in") match {
        case Some(j2) =>
          // prop in [literal, ...] → membership
          val (lits, m) = parseList(j2)
          if (lits.forall(_.isLeft))
            (props.getItem(key).isin(lits.collect { case Left(v) => v }: _*), m)
          else
            (props.getItem(key).cast("double")
              .isin(lits.map(_.fold(_.toDouble, identity)): _*), m)
        case None =>
          val ops = Seq("==", "!=", ">=", "<=", ">", "<")
          val op = ops.find(o => s.regionMatches(false, k, o, 0, o.length))
            .getOrElse(throw new IllegalArgumentException(s"expected operator at $k in: $s"))
          val (litC, m) = parseLiteral(k + op.length)
          val lhs = litC match {
            case Left(_) => props.getItem(key)
            case Right(_) => props.getItem(key).cast("double")
          }
          val rhs: Column = litC match {
            case Left(str) => lit(str)
            case Right(num) => lit(num)
          }
          val c = op match {
            case "==" => lhs === rhs
            case "!=" => lhs =!= rhs
            case ">" => lhs > rhs
            case ">=" => lhs >= rhs
            case "<" => lhs < rhs
            case "<=" => lhs <= rhs
          }
          (c, m)
      }
    }

    private def parseList(i0: Int): (Seq[Either[String, Double]], Int) = {
      val i = ws(i0)
      require(i < s.length && s(i) == '[', s"expected [ at $i in: $s")
      var j = i + 1
      val acc = scala.collection.mutable.ArrayBuffer[Either[String, Double]]()
      var done = false
      while (!done) {
        val (l, j2) = parseLiteral(j)
        acc += l
        val j3 = ws(j2)
        require(j3 < s.length, s"unterminated list in: $s")
        s(j3) match {
          case ',' => j = j3 + 1
          case ']' => j = j3 + 1; done = true
          case _ => throw new IllegalArgumentException(s"expected , or ] at $j3 in: $s")
        }
      }
      (acc.toSeq, j)
    }

    private def parseProp(i0: Int): (String, Int) = {
      val i = ws(i0)
      val prefix = "properties[\""
      require(s.regionMatches(false, i, prefix, 0, prefix.length),
        s"expected properties[\"...\"] at $i in: $s")
      val start = i + prefix.length
      val end = s.indexOf("\"]", start)
      require(end > start, s"unterminated property key in: $s")
      (s.substring(start, end), end + 2)
    }

    private def parseLiteral(i0: Int): (Either[String, Double], Int) = {
      val i = ws(i0)
      if (i < s.length && s(i) == '"') {
        val end = s.indexOf('"', i + 1)
        require(end > i, s"unterminated string literal in: $s")
        (Left(s.substring(i + 1, end)), end + 1)
      } else {
        var j = i
        while (j < s.length && (s(j).isDigit || s(j) == '.' || s(j) == '-')) j += 1
        require(j > i, s"expected literal at $i in: $s")
        (Right(s.substring(i, j).toDouble), j)
      }
    }
  }
}
