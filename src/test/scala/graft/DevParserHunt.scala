package graft

import graft.query.Query
import graft.query.Query._
import scala.util.Random

/** One-off QueryParser hunt (dev main, not part of the suite):
  *  1. round-trip — render random CANONICAL query trees (the subset the
  *     parser provably preserves: groups with >= 2 clauses, multi-term
  *     phrases, analyzed-form lowercase vocab) to classic syntax, parse,
  *     require EXACT tree equality;
  *  2. robustness — feed random char soup, require parse() to terminate
  *     (accept or throw), never hang or loop.
  */
object DevParserHunt {
  private val vocab = Vector("time", "person", "year", "way", "day", "world",
    "life", "hand", "part", "people", "spark", "index", "merge", "table")

  def main(args: Array[String]): Unit = {
    val rnd = new Random(if (args.nonEmpty) args(0).toLong else 20260819L)
    def term(): String = vocab(rnd.nextInt(vocab.size))
    def boost(): Float = Vector(1.0f, 1.0f, 0.5f, 2.0f, 4.0f)(rnd.nextInt(5))

    def leaf(): Query = rnd.nextInt(10) match {
      case 0 =>
        val ts = Seq.fill(2 + rnd.nextInt(3))(term()).distinct match {
          case s if s.size >= 2 => s
          case s                => s :+ (if (s.head == "spark") "index" else "spark")
        }
        Phrase(ts, rnd.nextInt(4), boost())
      case 1 => Prefix(term().take(3), boost())
      case 2 => Wildcard(term().take(2) + "?" + (if (rnd.nextBoolean()) "*" else "x"), boost())
      case 3 => Fuzzy(term(), 1 + rnd.nextInt(2), boost())
      case 4 =>
        val a = term(); val b = term()
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        TermRange(lo, hi, rnd.nextBoolean(), rnd.nextBoolean(), boost())
      case _ => Term(term(), boost())
    }
    def occ(): Occur = rnd.nextInt(6) match {
      case 0 => Must
      case 5 => MustNot
      case _ => Should
    }
    def group(depth: Int): BoolQ = {
      val n = 2 + rnd.nextInt(3)
      BoolQ(Seq.fill(n)((occ(),
        if (depth > 0 && rnd.nextInt(3) == 0) group(depth - 1) else leaf())),
        0, if (rnd.nextInt(4) == 0) 2.0f else 1.0f)
    }

    def b(x: Float): String = if (x == 1.0f) "" else s"^$x"
    def render(q: Query): String = q match {
      case Term(t, bo)   => t + b(bo)
      case Phrase(ts, s, bo) =>
        "\"" + ts.mkString(" ") + "\"" + (if (s > 0) s"~$s" else "") + b(bo)
      case Prefix(p, bo)   => p + "*" + b(bo)
      case Wildcard(w, bo) => w + b(bo)
      case Fuzzy(t, e, bo, _) => s"$t~$e" + b(bo)
      case TermRange(lo, hi, il, ih, bo) =>
        (if (il) "[" else "{") + lo + " TO " + hi + (if (ih) "]" else "}") + b(bo)
      case BoolQ(cs, _, bo) =>
        val body = cs.map { case (o, c) =>
          val p = o match { case Must => "+"; case MustNot => "-"; case _ => "" }
          val r = c match {
            case g: BoolQ => "(" + renderBare(g) + ")" + b(g.boost)
            case l        => render(l)
          }
          p + r
        }.mkString(" ")
        if (bo == 1.0f) body else "(" + body + ")" + b(bo)
      case other => sys.error(s"generator emitted unrenderable $other")
    }
    def renderBare(g: BoolQ): String = g.clauses.map { case (o, c) =>
      val p = o match { case Must => "+"; case MustNot => "-"; case _ => "" }
      p + (c match {
        case sub: BoolQ => "(" + renderBare(sub) + ")" + b(sub.boost)
        case l          => render(l)
      })
    }.mkString(" ")

    var fails = 0
    val shapes = if (args.length > 1) args(1).toInt else 400
    (1 to shapes).foreach { i =>
      val q = group(2)
      // top-level: boosted groups round-trip as the group itself
      val s = render(q)
      val parsed =
        try Query.parse(s)
        catch { case e: Exception => fails += 1
          println(s"PARSER-REJECT $i: <$s> from $q -> $e"); null }
      if (parsed != null && parsed != q) {
        fails += 1
        println(s"PARSER-DIVERGE $i: <$s>\n want: $q\n got:  $parsed")
      }
    }
    println(s"round-trip: $shapes trees, fails=$fails")

    // robustness: char soup must terminate (accept or throw), never hang
    val soup = "+-!\"()[]{}~^*? :ANDORNOTtimeperson0123.\t "
    var accepted = 0
    (1 to 3000).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(24))(soup(rnd.nextInt(soup.length))).mkString
      try { Query.parse(s); accepted += 1 }
      catch { case _: Exception => () }
    }
    println(s"soup: 3000 strings, accepted=$accepted (rest threw, none hung)")
    println(s"PARSER_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}
