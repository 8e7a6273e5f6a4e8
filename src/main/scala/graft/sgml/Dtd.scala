package graft.sgml

import scala.collection.mutable

/** DTD data structures + content-model DFA.
  *
  * Reference: `dtd.h` — struct dtd / dtd_element / dtd_edef / dtd_attr /
  * dtd_entity, modelcard/modeltype enums, omit flags [V]; `model.c` —
  * make_state_engine: content-model group → finite-state engine, compiled
  * lazily once per element and cached [V]. We compile with the Glushkov
  * construction and cache it on the element definition; the `Dtd` value is
  * immutable and broadcast-friendly (built once per executor, never per
  * doc — SURVEY.md §4).
  */

/** Content-model expression (`dtd.h — model groups with , & | connectors
  * and ? * + cardinality` [V]). */
sealed trait Model
object Model {
  case object PcData extends Model                      // #PCDATA
  final case class Ref(name: String) extends Model      // element name
  final case class MSeq(ms: List[Model]) extends Model  // a , b
  final case class Alt(ms: List[Model]) extends Model   // a | b
  /** SGML AND-group `a & b` — accepted leniently as `(a|b)*` with the
    * member set preserved for containability (documented approximation;
    * HTML's DTD barely uses `&` and span output is unaffected). */
  final case class All(ms: List[Model]) extends Model
  final case class Opt(m: Model) extends Model          // m?
  final case class Star(m: Model) extends Model         // m*
  final case class Plus(m: Model) extends Model         // m+
}

/** Declared content kind (`dtd.h — content types C_EMPTY/C_CDATA/C_RCDATA/
  * C_ANY` [V]). */
sealed trait ContentKind
object ContentKind {
  case object Empty extends ContentKind
  case object Cdata extends ContentKind   // literal until matching end tag
  case object Rcdata extends ContentKind  // literal but entities expand
  case object Any extends ContentKind
  final case class Modelled(model: Model) extends ContentKind
}

/** Attribute type (`dtd.h — attrtype enum AT_*` [V]). */
sealed trait AttrType { def tokenized: Boolean = true }
object AttrType {
  case object TCdata extends AttrType { override def tokenized = false }
  case object TId extends AttrType
  case object TIdRef extends AttrType
  case object TIdRefs extends AttrType
  case object TName extends AttrType
  case object TNames extends AttrType
  case object TNmToken extends AttrType
  case object TNmTokens extends AttrType
  case object TNumber extends AttrType
  case object TNumbers extends AttrType
  case object TNuToken extends AttrType
  case object TNuTokens extends AttrType
  final case class TNotation(values: Set[String]) extends AttrType
  final case class TEnum(values: Set[String]) extends AttrType

  def isList(t: AttrType): Boolean = t match {
    case TIdRefs | TNames | TNmTokens | TNumbers | TNuTokens => true
    case _ => false
  }
}

/** Attribute default (`dtd.h — attrdef enum: #REQUIRED #IMPLIED #FIXED
  * #CURRENT #CONREF / literal` [V]). */
sealed trait AttrDefault
object AttrDefault {
  case object Required extends AttrDefault
  case object Implied extends AttrDefault
  case object Current extends AttrDefault
  case object Conref extends AttrDefault
  final case class Fixed(v: String) extends AttrDefault
  final case class Value(v: String) extends AttrDefault
}

final case class AttrDecl(name: String, tpe: AttrType, default: AttrDefault)

/** Element definition with SGML omission flags (`dtd.h — dtd_edef omit
  * flags` [V]) and inclusion/exclusion exceptions (`+(X)` / `-(X)`). */
final case class ElementDef(
    name: String,
    omitStart: Boolean,
    omitEnd: Boolean,
    content: ContentKind,
    inclusions: Set[String] = Set.empty,
    exclusions: Set[String] = Set.empty,
    attrs: Map[String, AttrDecl] = Map.empty) {

  /** Compiled once and cached — mirrors `model.c`'s per-element state-engine
    * cache [V]. @transient: recompiled lazily per JVM rather than shipped
    * (a ParserConfig carrying a catalog Resolver closes over Dtd values). */
  @transient lazy val dfa: Option[Dfa] = content match {
    case ContentKind.Modelled(m) => Some(Dfa.compile(m))
    case _                       => None
  }

  /** Names this element's model can ever contain (omitted-tag repair). */
  lazy val containable: Set[String] = content match {
    case ContentKind.Modelled(m) => Dfa.symbols(m)
    case ContentKind.Any         => Set.empty // ANY: handled as accept-all
    case _                       => Set.empty
  }

  /** Does the content model admit character data? */
  lazy val mixed: Boolean = content match {
    case ContentKind.Modelled(m) => Dfa.hasPcData(m)
    case ContentKind.Empty       => false
    case _                       => true
  }

  /** Declarations that require ACTION when the attribute is absent
    * (#FIXED / literal default → inject; #REQUIRED → error; #CURRENT →
    * inject the most recently specified value or error). Pre-split so
    * the per-start-tag defaulting pass skips elements whose attlist is
    * all-#IMPLIED (the common case once core attrs are declared on every
    * element) — the hot path stays allocation-free for attr-less tags. */
  @transient lazy val actionAttrs: Array[AttrDecl] =
    attrs.valuesIterator.filter(d => d.default match {
      case AttrDefault.Fixed(_) | AttrDefault.Value(_) | AttrDefault.Required |
           AttrDefault.Current => true
      case _ => false
    }).toArray

  /** Names of #CONREF attributes (ISO 8879 content-reference: when one is
    * SPECIFIED the element's content is empty — no end tag expected).
    * Empty for every HTML/XML element, so the open path pays one length
    * check. */
  @transient lazy val conrefAttrs: Array[String] =
    attrs.valuesIterator.collect {
      case d if d.default == AttrDefault.Conref => d.name
    }.toArray
}

object ElementDef {
  /** Shared empty action list for undeclared elements (hot path). */
  val noActions: Array[AttrDecl] = Array.empty
}

/** Immutable DTD — element map + entity tables (`dtd.h — struct dtd` [V]).
  * `shortrefs`/`useMaps` carry the SHORTREF feature (T14): map name →
  * ordered (delimiter, entity) pairs, and element name → map name (""
  * encodes `#EMPTY` = deactivate). */
final case class Dtd(
    doctype: Option[String],
    elements: Map[String, ElementDef],
    entities: Map[String, String],       // general entities → replacement text
    paramEntities: Map[String, String],
    shortrefs: Map[String, List[(String, String)]] = Map.empty,
    useMaps: Map[String, String] = Map.empty) {

  /** Hot-path lookup: null-returning Java map avoids the per-call `Some`
    * allocation of immutable `Map.get` (measured hotspot; `util.c`'s
    * interned-symbol table plays the same role in the reference [V]). */
  @transient private lazy val elemIndex: java.util.HashMap[String, ElementDef] = {
    val m = new java.util.HashMap[String, ElementDef](elements.size * 2)
    elements.foreach { case (k, v) => m.put(k, v) }
    m
  }
  def elementOrNull(name: String): ElementDef = elemIndex.get(name)
  def element(name: String): Option[ElementDef] = Option(elemIndex.get(name))

  /** Elements whose start tag is omissible (HTML4: html/head/body/tbody),
    * in stable name order. The omitted-tag repair search iterates these
    * FEW and probes the DFA per candidate — instead of scanning every
    * enabled symbol of the failing model and hash-looking-up each
    * (measured at ~23% of kernel CPU on the old path: a failed `<p>`
    * inside `<p>` scanned the ~40-symbol inline group twice per doc). */
  @transient lazy val omitStartElems: Array[ElementDef] =
    // Tie-break contract: candidates are probed in ALPHABETICAL name
    // order, not content-model order. When several omissible-start
    // elements are simultaneously steppable from the same DFA state the
    // inserted element is the alphabetically first — deterministic, and
    // indistinguishable for the bundled HTML4 DTD (its candidates —
    // tbody/head/body — are never steppable from the same state). A
    // custom DTD needing strict content-model-order repair should not
    // declare multiple concurrently-steppable omissible starts.
    elements.valuesIterator.filter(_.omitStart).toArray.sortBy(_.name)
  /** Fully omissible (start+end) — the one-shot relaxed repair step. */
  @transient lazy val omitStartEndElems: Array[ElementDef] =
    omitStartElems.filter(_.omitEnd)
  /** Omissible-start elements that admit #PCDATA — text repair. */
  @transient lazy val omitStartMixedElems: Array[ElementDef] =
    omitStartElems.filter(_.mixed)

  /** Compiled SHORTREF maps, invalid (unmatchable) delimiters dropped. */
  @transient lazy val compiledShortrefs: Map[String, Array[Shortref.Rule]] =
    shortrefs.map { case (m, prs) =>
      m -> prs.iterator.flatMap { case (d, e) => Shortref.compile(d, e) }.toArray
    }

  /** Merge: `this` takes priority for doctype; for declarations SGML keeps
    * the FIRST declaration seen, so existing entries in `this` win. */
  def merge(other: Dtd): Dtd = Dtd(
    doctype.orElse(other.doctype),
    other.elements ++ elements,
    other.entities ++ entities,
    other.paramEntities ++ paramEntities,
    other.shortrefs ++ shortrefs,
    other.useMaps ++ useMaps)
}

object Dtd {
  val empty: Dtd = Dtd(None, Map.empty, Map.empty, Map.empty)
}

/** Mutable holder shared by Tokenizer and TreeBuilder: a `<!DOCTYPE … [ … ]>`
  * internal subset updates the DTD mid-parse (`sgml.pl — dtd/2`;
  * `parser.c — declaration mode` [V]). `activeShortrefs` is the SHORTREF
  * map in effect at the current element-stack top (null = none) —
  * maintained by TreeBuilder, read by the Tokenizer's PCDATA path; events
  * flow synchronously, so the read is always consistent. */
final class DtdHolder(var dtd: Dtd) {
  var activeShortrefs: Array[Shortref.Rule] = null
}

/** Glushkov automaton over child-element names. Immutable; per-element
  * runs live in [[DfaRun]]. Spark-side analogue of `model.c —
  * make_state_engine` [V]. */
final class Dfa private[sgml] (
    val nullable: Boolean,
    val first: Array[Int],
    private val lastBits: Array[Boolean],
    val follow: Array[Array[Int]],
    val symOf: Array[String]) extends Serializable {

  def isLast(p: Int): Boolean = lastBits(p)
  def size: Int = symOf.length

  /** Positions per symbol name — one hash probe per step instead of a
    * string-compare scan over all candidates (hot path). */
  @transient lazy val posOfSym: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    var p = 0
    while (p < symOf.length) {
      val prev = m.get(symOf(p))
      m.put(symOf(p), if (prev == null) Array(p) else prev :+ p)
      p += 1
    }
    m
  }
}

object Dfa {
  import Model._

  /** All element names mentioned in a model. (RefP positions exist only
    * inside compile(), after these helpers run — the @unchecked matches
    * record that invariant instead of warning.) */
  def symbols(m: Model): Set[String] = (m: @unchecked) match {
    case PcData   => Set.empty
    case Ref(n)   => Set(n)
    case MSeq(ms) => ms.flatMap(symbols).toSet
    case Alt(ms)  => ms.flatMap(symbols).toSet
    case All(ms)  => ms.flatMap(symbols).toSet
    case Opt(x)   => symbols(x)
    case Star(x)  => symbols(x)
    case Plus(x)  => symbols(x)
  }

  def hasPcData(m: Model): Boolean = (m: @unchecked) match {
    case PcData   => true
    case Ref(_)   => false
    case MSeq(ms) => ms.exists(hasPcData)
    case Alt(ms)  => ms.exists(hasPcData)
    case All(ms)  => ms.exists(hasPcData)
    case Opt(x)   => hasPcData(x)
    case Star(x)  => hasPcData(x)
    case Plus(x)  => hasPcData(x)
  }

  private final case class RefP(name: String, pos: Int) extends Model

  /** Glushkov construction: positions / nullable / first / last / follow.
    * `&`-groups normalize to `(a|b|…)*`; #PCDATA leaves are dropped (text
    * admission is checked via `ElementDef.mixed`). */
  def compile(model: Model): Dfa = {
    def norm(m: Model): Option[Model] = (m: @unchecked) match {
      case PcData  => None
      case r: Ref  => Some(r)
      case MSeq(ms) =>
        val ns = ms.flatMap(norm)
        if (ns.isEmpty) None
        else if (ns.size == 1) Some(ns.head) else Some(MSeq(ns))
      case Alt(ms) =>
        val ns = ms.flatMap(norm)
        val hadPc = ms.exists { case PcData => true; case _ => false }
        if (ns.isEmpty) None
        else {
          val alt = if (ns.size == 1) ns.head else Alt(ns)
          // mixed groups (#PCDATA|a|b) are inherently repeatable in SGML
          if (hadPc) Some(Star(alt)) else Some(alt)
        }
      case All(ms) =>
        val ns = ms.flatMap(norm)
        if (ns.isEmpty) None
        else Some(Star(if (ns.size == 1) ns.head else Alt(ns)))
      case Opt(x)  => norm(x).map(Opt(_))
      case Star(x) => norm(x).map(Star(_))
      case Plus(x) => norm(x).map(Plus(_))
    }

    norm(model) match {
      case None =>
        new Dfa(true, Array.empty, Array.empty, Array.empty, Array.empty)
      case Some(m0) =>
        val syms = mutable.ArrayBuffer.empty[String]
        def number(mm: Model): Model = mm match {
          case Ref(n)   => syms += n; RefP(n, syms.size - 1)
          case MSeq(ms) => MSeq(ms.map(number))
          case Alt(ms)  => Alt(ms.map(number))
          case Opt(x)   => Opt(number(x))
          case Star(x)  => Star(number(x))
          case Plus(x)  => Plus(number(x))
          case other    => other
        }
        val nm = number(m0)
        val n = syms.size
        val follow = Array.fill(n)(mutable.LinkedHashSet.empty[Int])

        final case class G(nullable: Boolean, first: Set[Int], last: Set[Int])
        def go(mm: Model): G = mm match {
          case RefP(_, p) => G(nullable = false, Set(p), Set(p))
          case MSeq(ms) =>
            ms.map(go).reduceLeft { (a, b) =>
              a.last.foreach(p => follow(p) ++= b.first)
              G(a.nullable && b.nullable,
                if (a.nullable) a.first ++ b.first else a.first,
                if (b.nullable) a.last ++ b.last else b.last)
            }
          case Alt(ms) =>
            ms.map(go).reduceLeft { (a, b) =>
              G(a.nullable || b.nullable, a.first ++ b.first, a.last ++ b.last)
            }
          case Opt(x) => val g = go(x); G(nullable = true, g.first, g.last)
          case Star(x) =>
            val g = go(x)
            g.last.foreach(p => follow(p) ++= g.first)
            G(nullable = true, g.first, g.last)
          case Plus(x) =>
            val g = go(x)
            g.last.foreach(p => follow(p) ++= g.first)
            G(g.nullable, g.first, g.last)
          case _ => throw new IllegalStateException("normalized away: " + mm)
        }
        val g = go(nm)
        val lastBits = Array.fill(n)(false)
        g.last.foreach(p => lastBits(p) = true)
        new Dfa(g.nullable, g.first.toArray.sorted, lastBits,
          follow.map(_.toArray.sorted), syms.toArray)
    }
  }
}

/** A running automaton for one open element: tracks candidate positions and
  * completeness. One per TreeBuilder stack frame.
  *
  * Allocation-free stepping (hot path at 100 TB): candidate sets are kept
  * in two flipping int arrays with a boolean de-dup mark — no per-step
  * collections (mirrors `model.c`'s array-walk state engine [V]). */
final class DfaRun(val dfa: Dfa) {
  // Candidate set = candList[0..nCand) + membership mark array. Stepping
  // is one hash probe (posOfSym) + int ops; zero allocation after the two
  // lazily-created scratch arrays.
  private var candList: Array[Int] = dfa.first
  private var nCand: Int = dfa.first.length
  private var candMark: Array[Boolean] = null // membership of candList
  private var nextList: Array[Int] = null
  private var nextMark: Array[Boolean] = null
  private var complete: Boolean = dfa.nullable

  private def ensure(): Unit = if (candMark == null) {
    candMark = new Array[Boolean](dfa.size)
    nextMark = new Array[Boolean](dfa.size)
    nextList = new Array[Int](dfa.size)
    val init = candList
    candList = new Array[Int](dfa.size)
    System.arraycopy(init, 0, candList, 0, nCand)
    var i = 0; while (i < nCand) { candMark(candList(i)) = true; i += 1 }
  }

  /** Try to consume a child element name; false = not allowed here. */
  def step(sym: String): Boolean = {
    val ps = dfa.posOfSym.get(sym)
    if (ps == null) return false
    ensure()
    var matchedLast = false
    var any = false
    var cnt = 0
    var i = 0
    while (i < ps.length) {
      val p = ps(i)
      if (candMark(p)) {
        any = true
        if (dfa.isLast(p)) matchedLast = true
        val fs = dfa.follow(p)
        var j = 0
        while (j < fs.length) {
          val q = fs(j)
          if (!nextMark(q)) { nextMark(q) = true; nextList(cnt) = q; cnt += 1 }
          j += 1
        }
      }
      i += 1
    }
    if (!any) {
      var k = 0; while (k < cnt) { nextMark(nextList(k)) = false; k += 1 }
      return false
    }
    // clear old membership, then swap current ↔ next (arrays reused)
    var k = 0; while (k < nCand) { candMark(candList(k)) = false; k += 1 }
    val tl = candList; candList = nextList; nextList = tl
    val tm = candMark; candMark = nextMark; nextMark = tm
    nCand = cnt
    complete = matchedLast
    true
  }

  /** Would `step(sym)` succeed, without consuming? */
  def canStep(sym: String): Boolean = {
    val ps = dfa.posOfSym.get(sym)
    if (ps == null) return false
    if (candMark == null) { // still on the initial `first` set
      var i = 0
      while (i < ps.length) {
        var j = 0
        while (j < nCand) { if (candList(j) == ps(i)) return true; j += 1 }
        i += 1
      }
      false
    } else {
      var i = 0
      while (i < ps.length) { if (candMark(ps(i))) return true; i += 1 }
      false
    }
  }

  /** Names currently enabled (for omitted-open-tag insertion search).
    * May repeat a name (candidate positions of the same symbol); callers
    * only `find` over it, so duplicates are harmless and the de-dup set
    * allocation is saved. */
  def enabledSymbols: Iterator[String] = new Iterator[String] {
    private var i = 0
    def hasNext: Boolean = i < nCand
    def next(): String = { val s = dfa.symOf(candList(i)); i += 1; s }
  }

  def isComplete: Boolean = complete
}
