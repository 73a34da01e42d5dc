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
  *   atom     := '(' expr ')' | 'defined(' prop ')' | prop op literal
  *   prop     := 'properties["<key>"]'
  *   op       := '==' | '!=' | '>' | '>=' | '<' | '<='
  *   literal  := "string" | number
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
        case None =>
          val (key, j) = parseProp(i)
          val k = ws(j)
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
