package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for Mixpanel segmentation-expression `where` strings (SURVEY §2.3
  * F4; reference pushes the raw string to the /export API —
  * connectors/mixpanelETL.js:80-82). Our engine parses the same expression
  * into a Catalyst `Column`, so one predicate string works both locally
  * (Catalyst pushes it into the scan) and at a pushdown-capable source.
  *
  * Grammar (the commonly-used subset; `and` binds tighter than `or`):
  *   expr     := andExpr ('or' andExpr)*
  *   andExpr  := term ('and' term)*
  *   term     := 'not'? atom
  *   atom     := '(' expr ')' | 'defined(' prop ')'
  *             | 'contains(' prop ',' literal ')'
  *             | 'has_prefix(' prop ',' literal ')'
  *             | literal 'in' prop          -- substring containment
  *             | operand 'in' list          -- membership
  *             | operand op literal
  *   operand  := prop | 'number(' prop ')' | 'string(' prop ')'
  *             | 'boolean(' prop ')'
  *   prop     := 'properties["<key>"]'
  *   op       := '==' | '!=' | '>' | '>=' | '<' | '<='
  *   literal  := "string" | number | 'true' | 'false'
  *   list     := '[' literal (',' literal)* ']'
  *
  * `in` follows Mixpanel's dual meaning: string-in-string is substring
  * containment, value-in-list is membership. `number()` forces a numeric
  * comparison regardless of literal type; `boolean()` compares the
  * property's string form against true/false literals (property bags are
  * map<string,string> — the typed form a Mixpanel profile would carry is
  * stringified by the export shape).
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

    // standard precedence: `and` binds tighter than `or`
    // (a or b and c ⇒ a or (b and c))
    def parseExpr(i0: Int): (Column, Int) = {
      var (acc, i) = parseAnd(i0)
      var done = false
      while (!done) {
        kw(i, "or") match {
          case Some(j) =>
            val (rhs, k) = parseAnd(j); acc = acc || rhs; i = k
          case None => done = true
        }
      }
      (acc, i)
    }

    private def parseAnd(i0: Int): (Column, Int) = {
      var (acc, i) = parseTerm(i0)
      var done = false
      while (!done) {
        kw(i, "and") match {
          case Some(j) =>
            val (rhs, k) = parseTerm(j); acc = acc && rhs; i = k
          case None => done = true
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
            val (c, m) = parsePropLitFn(j, (p, n) => p.contains(n))
            (c, m)
          case None => kw(i, "has_prefix(") match {
            case Some(j) =>
              val (c, m) = parsePropLitFn(j, (p, n) => p.startsWith(n))
              (c, m)
            case None if startsLiteral(i) =>
              // literal in prop → substring containment (Mixpanel semantics)
              val (litC, j) = parseLiteral(i)
              val j2 = kw(j, "in").getOrElse(
                throw new IllegalArgumentException(s"expected 'in' at $j in: $s"))
              val (key, m) = parseProp(j2)
              (props.getItem(key).contains(litC.fold(identity, fmtNum)), m)
            case None =>
              parsePropComparison(i)
          }
        }
      }
    }

    /** fn(prop, literal) forms: parse "prop, literal)" after the opening
      * paren and apply `build` to the prop column + stringified literal.
      */
    private def parsePropLitFn(i0: Int,
        build: (Column, String) => Column): (Column, Int) = {
      val (key, j1) = parseProp(i0)
      val j2 = ws(j1)
      require(j2 < s.length && s(j2) == ',', s"expected , at $j2 in: $s")
      val (litC, j3) = parseLiteral(j2 + 1)
      val j4 = ws(j3)
      require(j4 < s.length && s(j4) == ')', s"expected ) at $j4 in: $s")
      (build(props.getItem(key), litC.fold(identity, fmtNum)), j4 + 1)
    }

    private def fmtNum(n: Double): String =
      if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString

    private def startsLiteral(i0: Int): Boolean = {
      val i = ws(i0)
      i < s.length && (s(i) == '"' || s(i).isDigit || s(i) == '-')
    }

    /** operand := prop | number(prop) | string(prop) | boolean(prop).
      * Returns (prop column, forced-cast marker, next index).
      */
    private def parseOperand(i0: Int): (Column, Option[String], Int) = {
      val casts = Seq("number(", "string(", "boolean(")
      casts.flatMap(c => kw(i0, c).map(c -> _)).headOption match {
        case Some((cast, j)) =>
          val (key, j1) = parseProp(j)
          val j2 = ws(j1)
          require(j2 < s.length && s(j2) == ')', s"expected ) at $j2 in: $s")
          (props.getItem(key), Some(cast.dropRight(1)), j2 + 1)
        case None =>
          val (key, j) = parseProp(i0)
          (props.getItem(key), None, j)
      }
    }

    private def parsePropComparison(i0: Int): (Column, Int) = {
      val i = ws(i0)
      val (prop, cast, j) = parseOperand(i)
      val k = ws(j)
      kw(k, "in") match {
        case Some(j2) =>
          // operand in [literal, ...] → membership
          val (lits, m) = parseList(j2)
          if (cast.contains("number") || !lits.forall(_.isLeft))
            (prop.cast("double")
              .isin(lits.map(_.fold(_.toDouble, identity)): _*), m)
          else
            (prop.isin(lits.collect { case Left(v) => v }: _*), m)
        case None =>
          val ops = Seq("==", "!=", ">=", "<=", ">", "<")
          val op = ops.find(o => s.regionMatches(false, k, o, 0, o.length))
            .getOrElse(throw new IllegalArgumentException(s"expected operator at $k in: $s"))
          val (litC, m) = parseLiteral(k + op.length)
          // number() forces numeric comparison; string()/boolean() force
          // string comparison (property bags are string maps; boolean
          // literals parse to "true"/"false" strings)
          val numeric = cast match {
            case Some("number") => true
            case Some(_) => false
            case None => litC.isRight
          }
          val lhs = if (numeric) prop.cast("double") else prop
          val rhs: Column = litC match {
            case Left(str) if numeric => lit(str.toDouble)
            case Left(str) => lit(str)
            case Right(num) if numeric => lit(num)
            case Right(num) => lit(fmtNum(num))
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
      // boolean literals arrive as strings — property bags are string maps
      val boolLit = kw(i, "true").map(j => (Left("true"): Either[String, Double], j))
        .orElse(kw(i, "false").map(j => (Left("false"): Either[String, Double], j)))
      if (boolLit.isDefined) boolLit.get
      else if (i < s.length && s(i) == '"') {
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
