package searchspark.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One suffix-strip lemma rule: applies to tokens of length ≥ minLen
  * ending in `suffix`; drops `drop` chars and appends `append`. First
  * matching rule wins (mirrors the reference's first-normal-form-only
  * choice, LemmaFinder.java:54). */
final case class LemmaRule(suffix: String, minLen: Int, drop: Int, append: String)

/** A full analyzer configuration — the engine's only scalar-function
  * surface, mirroring the reference's `LemmaFinder` (119 LoC,
  * /root/reference/src/main/java/searchengine/services/supportingservices/LemmaFinder.java):
  *
  *  - B1 tokenize (LemmaFinder.java:103-108): lowercase, every char
  *    outside `alphabet` → space, split on whitespace;
  *  - B2 short-token filter (LemmaFinder.java:39-41): drop blank and
  *    1-char tokens except `keepShort` (reference keeps "я");
  *  - B3 particle/stop filter (LemmaFinder.java:13,90-101): the
  *    reference drops words whose morphology is interjection/preposition/
  *    conjunction/particle; functional stand-in is a curated `stopwords`
  *    list of exactly those POS classes;
  *  - B4 lemmatize (LemmaFinder.java:49-54): broadcast `exceptions`
  *    dictionary first (the irregular-form analog of a morphology
  *    lexicon), then ordered suffix-strip `rules` (no morphology jar
  *    offline, SURVEY.md §7.0).
  *
  * Everything exists in three synchronized forms generated from the SAME
  * rule data: pure Scala fns (oracle/driver/snippets), Catalyst Columns
  * (codegen'd — NO UDF in the hot path), and ANSI SQL (DuckDB oracle).
  * AnalyzerSpec pins 1 == 2 on generated corpora; the driver's hash
  * check pins 2 == 3. */
final case class AnalyzerConfig(
    name: String,
    alphabet: String, // token char class; anything outside becomes a space
    keepShort: Set[String],
    stopwords: Array[String],
    exceptions: Map[String, String],
    rules: Seq[LemmaRule]) {

  private val stopSet: Set[String] = stopwords.toSet

  // String.replaceAll compiles its regex on EVERY call; the TF kernel
  // tokenizes every document through Form 1, so precompile once.
  // (java.util.regex.Pattern is serializable — safe in task closures.)
  private val cleanupPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(s"[^$alphabet]+")

  // --- Form 1: pure Scala ----------------------------------------------

  /** B1: raw tokens of a text, in order. */
  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val cleaned = cleanupPattern
      .matcher(text.toLowerCase(java.util.Locale.ROOT)).replaceAll(" ").trim
    if (cleaned.isEmpty) Array.empty else cleaned.split(" ")
  }

  /** B2: keep tokens of length > 1, or 1-char tokens on the keep-list. */
  def keepToken(tok: String): Boolean =
    tok.length > 1 || keepShort.contains(tok)

  /** B3: true if the token survives the stop filter. */
  def notStopword(tok: String): Boolean = !stopSet.contains(tok)

  /** B4: exception dict, else first matching suffix rule. Tokens of
    * length ≤ 3 are left as-is (reference behavior for short stems). */
  def lemma(tok: String): String = exceptions.getOrElse(tok, {
    val n = tok.length
    if (n <= 3) tok
    else rules.find(r => n >= r.minLen && tok.endsWith(r.suffix)) match {
      case Some(r) => tok.substring(0, n - r.drop) + r.append
      case None => tok
    }
  })

  /** Full pipeline B1→B4: analyzed terms of a text, in order. */
  def analyze(text: String): Array[String] =
    tokenize(text).filter(keepToken).filter(notStopword).map(lemma)

  /** B5 (per-doc TF, LemmaFinder.java:34-64 `collectLemmas`). */
  def termFreqs(text: String): Map[String, Int] =
    analyze(text).groupBy(identity).map { case (t, o) => (t, o.length) }

  /** B7 (query analysis, SearchingServiceImpl.java:215-217): distinct
    * query terms, ascending (the deterministic summation order). */
  def analyzeQuery(query: String): Seq[String] =
    analyze(query).distinct.sorted

  // --- Form 2: Catalyst Columns (codegen'd) ----------------------------

  /** B1 as a Column: array of raw tokens of `text`. */
  def tokensCol(text: Column): Column = {
    val cleaned = trim(regexp_replace(lower(text), s"[^$alphabet]+", " "))
    when(cleaned === "", array().cast("array<string>"))
      .otherwise(split(cleaned, " "))
  }

  /** B4 as a Column (rule-for-rule identical to [[lemma]]). The
    * exception dictionary is ONE literal-map lookup (`element_at` on a
    * MapType literal), not a chained CASE: the RU dict carries hundreds
    * of declension forms, and a per-entry WHEN chain would bloat the
    * plan and fall out of whole-stage codegen, while a map literal is a
    * single constant probed per row. */
  def lemmaCol(tok: Column): Column = {
    val n = length(tok)
    val ruled = rules.foldLeft(when(n <= 3, tok)) { (acc, r) =>
      val stripped = tok.substr(lit(1), n - r.drop)
      acc.when(tok.endsWith(r.suffix) && n >= r.minLen,
        if (r.append.isEmpty) stripped else concat(stripped, lit(r.append)))
    }.otherwise(tok)
    if (exceptions.isEmpty) ruled
    else coalesce(element_at(typedLit(exceptions), tok), ruled)
  }

  // --- Form 3: SQL (Spark SQL + DuckDB dialects share these) -----------

  /** B4 as an ANSI CASE over a token-valued identifier. */
  def lemmaSqlCase(tok: String): String = {
    val ex = exceptions.toSeq.sorted
      .map { case (k, v) => s" WHEN $tok = '$k' THEN '$v'" }.mkString
    val rs = rules.map { r =>
      val stripped = s"substring($tok, 1, length($tok) - ${r.drop})"
      s" WHEN $tok LIKE '%${r.suffix}' AND length($tok) >= ${r.minLen} THEN " +
        (if (r.append.isEmpty) stripped else s"$stripped || '${r.append}'")
    }.mkString
    s"CASE$ex WHEN length($tok) <= 3 THEN $tok$rs ELSE $tok END"
  }

  /** B2 filter as a SQL boolean over a token identifier. */
  def keepSqlPredicate(tok: String): String =
    s"(length($tok) > 1 OR $tok IN (${keepShort.toSeq.sorted.map(s => s"'$s'").mkString(", ")}))"

  /** B3 filter as a SQL boolean over a token identifier. */
  def notStopSqlPredicate(tok: String): String =
    s"$tok NOT IN (${stopwords.map(s => s"'$s'").mkString(", ")})"
}

/** Generated Russian declension/conjugation lexicon — the broadcast
  * stand-in for the reference's Lucene morphology dictionary
  * (LemmaFinder.java:49-54): every listed form maps to its DICTIONARY
  * form, giving morphology-grade lemmas for the high-frequency head of
  * the vocabulary while the suffix rules remain the fallback for the
  * tail. Forms are generated from paradigm templates (hard-stem
  * masculine, -а feminine with the velar spelling rule, -о neuter,
  * -ый adjective, -ать/-ить verbs) over common lexemes, plus explicit
  * irregulars (suppletive plurals, mobile vowels, irregular verbs,
  * personal pronouns). A template occasionally mints a form no text
  * contains (e.g. epenthetic-л verbs); such keys are harmless — they
  * can never be probed. */
object RuLexicon {

  private def decl(lemma: String, stem: String, endings: Seq[String]): Seq[(String, String)] =
    endings.map(e => (stem + e) -> lemma)

  // paradigm ending sets (the lemma's own ending is always included, so
  // each lexeme also maps its dictionary form to itself)
  private val MascHard = Seq("", "а", "у", "ом", "е", "ы", "ов", "ам", "ами", "ах")
  private val MascVel = Seq("", "а", "у", "ом", "е", "и", "ов", "ам", "ами", "ах")
  private val FemA = Seq("а", "ы", "е", "у", "ой", "ою", "", "ам", "ами", "ах")
  private val FemAVel = Seq("а", "и", "е", "у", "ой", "ою", "", "ам", "ами", "ах")
  private val NeutO = Seq("о", "а", "у", "ом", "е", "", "ам", "ами", "ах")
  private val AdjYj = Seq("ый", "ого", "ому", "ым", "ом", "ая", "ой", "ую",
    "ое", "ые", "ых", "ыми")
  private val AdjOj = Seq("ой", "ого", "ому", "им", "ом", "ая", "ую",
    "ие", "их", "ими")
  private val VerbAt = Seq("ть", "ю", "ешь", "ет", "ем", "ете", "ют",
    "л", "ла", "ло", "ли", "й", "йте")
  private val VerbIt = Seq("ить", "ю", "ишь", "ит", "им", "ите", "ят",
    "ил", "ила", "ило", "или")
  // -еть verbs of the 2nd conjugation (сидеть: сидит/сидел); the
  // mutated 1sg (сижу) is NOT minted by the template — it falls through
  // to the suffix rules, a documented tail miss
  private val VerbEt = Seq("еть", "ишь", "ит", "им", "ите", "ят",
    "ел", "ела", "ело", "ели")

  // --- round-5 generator extension (round-4 VERDICT #6): participles,
  // prefixed aspect pairs, -еть conjugation, irregular plurals ---

  private val AdjSoftEnd = Seq("ий", "его", "ему", "им", "ем", "ая",
    "ей", "ую", "ее", "ие", "их", "ими")
  private val AdjHardEnd = Seq("ый", "ого", "ому", "ым", "ом", "ая",
    "ой", "ую", "ое", "ые", "ых", "ыми")

  /** Active participles + gerund of one verb → its infinitive:
    * present = presStem+mark (читающий, говорящий, сидящий) declined
    * like a soft adjective; past = pastStem+вш (читавший, говоривший,
    * сидевший); gerund = presStem+я (читая, говоря, сидя). */
  private def actParts(inf: String, presStem: String, mark: String,
                       pastStem: String): Seq[(String, String)] =
    AdjSoftEnd.map(e => (presStem + mark + e) -> inf) ++
      AdjSoftEnd.map(e => (pastStem + "вш" + e) -> inf) :+
      ((presStem + "я") -> inf)

  /** Past-passive participle of a transitive -ать verb: stem+нн long
    * forms (прочитанный) + short forms (прочитан/-а/-о/-ы). */
  private def passParts(inf: String, stem: String): Seq[(String, String)] =
    AdjHardEnd.map(e => (stem + "нн" + e) -> inf) ++
      Seq("н", "на", "но", "ны").map(e => (stem + e) -> inf)

  /** Prefixed perfective aspect partner of an -ать base verb: the full
    * conjugation (future = present endings), past-active participle and
    * perfective gerund (прочитав), all → the PREFIXED infinitive (the
    * aspect pair are distinct dictionary lemmas, as in the reference's
    * morphology: читать ≠ прочитать). */
  private def prefixed(prefix: String, base: String): Seq[(String, String)] = {
    val inf = prefix + base
    val stem = inf.dropRight(2)
    decl(inf, stem, VerbAt) ++
      AdjSoftEnd.map(e => (stem + "вш" + e) -> inf) :+ ((stem + "в") -> inf)
  }

  private def nouns(endings: Seq[String], lemmaEnding: String, stems: String*) =
    stems.flatMap(st => decl(st + lemmaEnding, st, endings))

  private val regular: Seq[(String, String)] =
    nouns(MascHard, "", "стол", "вопрос", "город", "результат", "процесс",
      "проект", "момент", "класс", "текст", "файл", "запрос", "метод",
      "документ", "элемент", "ответ", "интерес", "вариант", "пример") ++
    nouns(MascVel, "", "поиск", "язык", "урок", "признак", "блок", "список") ++
    nouns(FemA, "а", "работ", "систем", "программ", "групп", "форм",
      "структур", "проблем", "команд", "схем", "основ", "причин") ++
    nouns(FemAVel, "а", "задач", "строк", "книг", "наук", "оценк", "ошибк") ++
    nouns(NeutO, "о", "слов", "мест", "дел", "прав", "числ") ++
    Seq("новый", "первый", "главный", "важный", "полный", "разный",
      "быстрый", "точный", "нужный", "каждый")
      .flatMap(l => decl(l, l.dropRight(2), AdjYj)) ++
    Seq("большой", "простой")
      .flatMap(l => decl(l, l.dropRight(2), AdjOj)) ++
    Seq("читать", "делать", "работать", "думать", "знать", "понимать",
      "получать", "считать", "начинать", "отвечать", "спрашивать",
      "показывать")
      .flatMap(l => decl(l, l.dropRight(2), VerbAt)) ++
    Seq("говорить", "помнить", "значить", "строить")
      .flatMap(l => decl(l, l.dropRight(3), VerbIt)) ++
    // -еть 2nd-conjugation verbs (round 5)
    Seq("сидеть", "лететь", "висеть", "шуметь")
      .flatMap(l => decl(l, l.dropRight(3), VerbEt)) ++
    // active participles + gerunds of every conjugated lexeme above
    Seq("читать", "делать", "работать", "думать", "знать", "понимать",
      "получать", "считать", "начинать", "отвечать", "спрашивать",
      "показывать")
      .flatMap(l => actParts(l, l.dropRight(2), "ющ", l.dropRight(2))) ++
    Seq("говорить", "помнить", "значить", "строить")
      .flatMap(l => actParts(l, l.dropRight(3), "ящ", l.dropRight(3) + "и")) ++
    Seq("сидеть", "лететь", "висеть", "шуметь")
      .flatMap(l => actParts(l, l.dropRight(3), "ящ", l.dropRight(3) + "е")) ++
    // prefixed perfective aspect partners
    Seq("про" -> "читать", "с" -> "делать", "по" -> "думать",
      "у" -> "знать", "по" -> "работать", "по" -> "считать")
      .flatMap { case (p, b) => prefixed(p, b) } ++
    // past-passive participles of the transitive perfectives
    Seq("прочитать", "сделать", "узнать", "посчитать")
      .flatMap(l => passParts(l, l.dropRight(2)))

  private val irregular: Seq[(String, String)] = Seq(
    // suppletive plurals
    "человек" -> "человек", "человека" -> "человек", "человеку" -> "человек",
    "человеком" -> "человек", "человеке" -> "человек",
    "люди" -> "человек", "людей" -> "человек", "людям" -> "человек",
    "людьми" -> "человек", "людях" -> "человек",
    "ребенок" -> "ребенок", "ребенка" -> "ребенок", "ребенку" -> "ребенок",
    "ребёнок" -> "ребенок", "ребёнка" -> "ребенок",
    "дети" -> "ребенок", "детей" -> "ребенок", "детям" -> "ребенок",
    "детьми" -> "ребенок", "детях" -> "ребенок",
    // irregular verbs
    "идти" -> "идти", "иду" -> "идти", "идешь" -> "идти", "идёшь" -> "идти",
    "идет" -> "идти", "идёт" -> "идти", "идем" -> "идти", "идём" -> "идти",
    "идете" -> "идти", "идут" -> "идти",
    "шел" -> "идти", "шёл" -> "идти", "шла" -> "идти", "шли" -> "идти",
    "шло" -> "идти",
    "быть" -> "быть", "был" -> "быть", "была" -> "быть", "были" -> "быть",
    "было" -> "быть", "есть" -> "быть", "будет" -> "быть", "будут" -> "быть",
    "буду" -> "быть", "будешь" -> "быть", "будем" -> "быть", "будете" -> "быть",
    "мочь" -> "мочь", "могу" -> "мочь", "можешь" -> "мочь", "может" -> "мочь",
    "можем" -> "мочь", "можете" -> "мочь", "могут" -> "мочь",
    "мог" -> "мочь", "могла" -> "мочь", "могли" -> "мочь", "могло" -> "мочь",
    "хотеть" -> "хотеть", "хочу" -> "хотеть", "хочешь" -> "хотеть",
    "хочет" -> "хотеть", "хотим" -> "хотеть", "хотите" -> "хотеть",
    "хотят" -> "хотеть", "хотел" -> "хотеть", "хотела" -> "хотеть",
    "хотели" -> "хотеть",
    // mobile vowels / irregular plurals
    "год" -> "год", "года" -> "год", "году" -> "год", "годом" -> "год",
    "годы" -> "год", "годов" -> "год", "годам" -> "год", "годами" -> "год",
    "годах" -> "год", "лет" -> "год",
    "день" -> "день", "дня" -> "день", "дню" -> "день", "днем" -> "день",
    "днём" -> "день", "дне" -> "день", "дни" -> "день", "дней" -> "день",
    "дням" -> "день", "днями" -> "день", "днях" -> "день",
    "время" -> "время", "времени" -> "время", "временем" -> "время",
    "времена" -> "время", "времен" -> "время", "времён" -> "время",
    "временам" -> "время",
    "путь" -> "путь", "пути" -> "путь", "путем" -> "путь", "путём" -> "путь",
    "путей" -> "путь", "путям" -> "путь", "путями" -> "путь", "путях" -> "путь",
    // irregular plurals (-ья/-ена classes and friends, round 5)
    "друг" -> "друг", "друга" -> "друг", "другу" -> "друг",
    "другом" -> "друг", "друге" -> "друг",
    "друзья" -> "друг", "друзей" -> "друг", "друзьям" -> "друг",
    "друзьями" -> "друг", "друзьях" -> "друг",
    "брат" -> "брат", "брата" -> "брат", "брату" -> "брат",
    "братом" -> "брат", "брате" -> "брат",
    "братья" -> "брат", "братьев" -> "брат", "братьям" -> "брат",
    "братьями" -> "брат", "братьях" -> "брат",
    "сын" -> "сын", "сына" -> "сын", "сыну" -> "сын",
    "сыном" -> "сын", "сыне" -> "сын",
    "сыновья" -> "сын", "сыновей" -> "сын", "сыновьям" -> "сын",
    "сыновьями" -> "сын", "сыновьях" -> "сын",
    "стул" -> "стул", "стула" -> "стул", "стулу" -> "стул",
    "стулом" -> "стул", "стуле" -> "стул",
    "стулья" -> "стул", "стульев" -> "стул", "стульям" -> "стул",
    "стульями" -> "стул", "стульях" -> "стул",
    "лист" -> "лист", "листа" -> "лист", "листу" -> "лист",
    "листом" -> "лист", "листе" -> "лист",
    "листья" -> "лист", "листьев" -> "лист", "листьям" -> "лист",
    "листьями" -> "лист", "листьях" -> "лист",
    "дерево" -> "дерево", "дерева" -> "дерево", "дереву" -> "дерево",
    "деревом" -> "дерево", "дереве" -> "дерево",
    "деревья" -> "дерево", "деревьев" -> "дерево", "деревьям" -> "дерево",
    "деревьями" -> "дерево", "деревьях" -> "дерево",
    "имя" -> "имя", "имени" -> "имя", "именем" -> "имя",
    "имена" -> "имя", "имен" -> "имя", "имён" -> "имя",
    "именам" -> "имя", "именами" -> "имя", "именах" -> "имя",
    "мать" -> "мать", "матери" -> "мать", "матерью" -> "мать",
    "матерей" -> "мать", "матерям" -> "мать", "матерями" -> "мать",
    "матерях" -> "мать",
    "дочь" -> "дочь", "дочери" -> "дочь", "дочерью" -> "дочь",
    "дочерей" -> "дочь", "дочерям" -> "дочь", "дочерями" -> "дочь",
    "дочерях" -> "дочь",
    // determiners + personal pronouns (pronouns survive the stop filter)
    "весь" -> "весь", "вся" -> "весь", "все" -> "весь", "всё" -> "весь",
    "всего" -> "весь", "всей" -> "весь", "всех" -> "весь", "всем" -> "весь",
    "всеми" -> "весь", "всю" -> "весь",
    "этот" -> "этот", "эта" -> "этот", "это" -> "этот", "этого" -> "этот",
    "этому" -> "этот", "этим" -> "этот", "этой" -> "этот", "эту" -> "этот",
    "эти" -> "этот", "этих" -> "этот", "этими" -> "этот",
    "меня" -> "я", "мне" -> "я", "мной" -> "я",
    "тебя" -> "ты", "тебе" -> "ты", "тобой" -> "ты",
    "его" -> "он", "ему" -> "он", "ним" -> "он", "нем" -> "он", "нём" -> "он",
    "ее" -> "она", "её" -> "она", "ней" -> "она",
    "них" -> "они", "ими" -> "они", "нами" -> "мы", "нас" -> "мы",
    "вас" -> "вы", "вами" -> "вы")

  /** form → dictionary form; regular paradigms first, irregulars win. */
  val exceptions: Map[String, String] = (regular ++ irregular).toMap
}

/** The shipped analyzer configurations. */
object Analyzers {

  /** English transcripts (the corpus default): alphabet generalized to
    * `[a-z0-9]` (SURVEY.md §2.2 B1), keep-list {"a","i"} (the "я"
    * analog), POS-class stopwords, suffix-strip rules equivalent
    * rule-for-rule to round 1's hardcoded lemmatizer. */
  val En: AnalyzerConfig = AnalyzerConfig(
    name = "en",
    alphabet = "a-z0-9",
    keepShort = Set("a", "i"),
    stopwords = Array(
      "a", "about", "above", "after", "ah", "an", "and", "as", "at",
      "because", "before", "between", "but", "by", "down", "during", "for",
      "from", "hey", "if", "in", "into", "nor", "not", "of", "off", "oh",
      "on", "or", "out", "over", "per", "so", "than", "the", "though",
      "to", "too", "under", "unless", "until", "up", "via", "while",
      "with", "yet"),
    exceptions = Map.empty,
    rules = Seq(
      LemmaRule("sses", 4, 2, ""), // sses -> ss
      LemmaRule("ies", 5, 3, "y"), // ies -> y
      LemmaRule("ss", 4, 0, ""), // ss -> ss (guards the next rule)
      LemmaRule("s", 4, 1, ""), // s -> ''
      LemmaRule("ing", 6, 3, ""), // ing -> ''
      LemmaRule("ed", 5, 2, ""))) // ed -> ''

  /** Russian, config-matched to the reference's LemmaFinder: alphabet
    * exactly `[а-яё]` (LemmaFinder.java:105), keep-list {"я"}
    * (LemmaFinder.java:40), stopwords = curated particles/prepositions/
    * conjunctions/interjections (the МЕЖД/ПРЕДЛ/СОЮЗ/ЧАСТ classes,
    * LemmaFinder.java:13 — pronouns deliberately survive, hence "я"),
    * the generated [[RuLexicon]] dictionary (several hundred
    * high-frequency declension/conjugation forms → dictionary form, the
    * broadcast stand-in for the Lucene morphology lexicon) and crude
    * declension/conjugation suffix strips for the vocabulary tail.
    * Tail quality is knowingly below a real morphology jar (unavailable
    * offline, SURVEY.md §7.0); AnalyzerSpec asserts a measured accuracy
    * floor on a HELD-OUT golden set so the gap is quantified, not
    * hand-waved. */
  val Ru: AnalyzerConfig = AnalyzerConfig(
    name = "ru",
    alphabet = "а-яё",
    keepShort = Set("я"),
    stopwords = Array(
      "а", "ах", "без", "бы", "в", "ведь", "во", "вот", "да", "для",
      "до", "если", "же", "за", "и", "из", "или", "к", "ко", "ли",
      "на", "над", "не", "ни", "но", "о", "об", "от", "ох", "перед",
      "по", "под", "при", "про", "с", "со", "то", "у", "уж", "хоть",
      "чтобы", "эх"),
    exceptions = RuLexicon.exceptions,
    // mostly pure strips: every inflection of a word must land on the
    // SAME stem — that collision is what df/conjunctive scoring needs;
    // dictionary-form fidelity is the exception dict's job. The past-
    // tense rules re-append the theme vowel (али→а etc.) so past forms
    // land on the present/infinitive stem WITHOUT a bare -л strip (a
    // bare strip would mangle -ел/-ол nouns like раздел/символ; the
    // vowel-anchored forms only ever match verbs and the rare -ал noun).
    // Round-4 extension (round-3 verdict #5): soft-stem nouns (-ь/-я/
    // -ей/-ью), the -ие/-ия noun class, adjective oblique/plural and
    // comparative endings, -еть/-ить verbs, past tense — held-out floor
    // measured 0.80 → ≥0.90 (AnalyzerSpec).
    rules = Seq(
      // reflexive-verb endings first: only verbs end in -ся/-сь forms,
      // so these strips can never damage a noun
      LemmaRule("ется", 6, 4, ""), LemmaRule("ются", 6, 4, ""),
      LemmaRule("ится", 6, 4, ""), LemmaRule("ться", 6, 4, ""),
      // и-stem noun class (значение, станция, линия …): one stem for
      // the whole paradigm, before the generic strips can shear it
      LemmaRule("иями", 6, 4, ""), LemmaRule("иях", 5, 3, ""),
      LemmaRule("иям", 6, 3, ""), LemmaRule("ием", 6, 3, ""),
      LemmaRule("ией", 6, 3, ""), LemmaRule("ии", 5, 2, ""),
      LemmaRule("ие", 5, 2, ""), LemmaRule("ия", 5, 2, ""),
      LemmaRule("ию", 5, 2, ""),
      // plural/instrumental noun endings
      LemmaRule("ами", 5, 3, ""), LemmaRule("ями", 5, 3, ""),
      // adjective long-form endings, hard + soft, incl. oblique/plural
      LemmaRule("ыми", 6, 3, ""), LemmaRule("ими", 6, 3, ""),
      LemmaRule("ого", 5, 3, ""), LemmaRule("его", 5, 3, ""),
      LemmaRule("ому", 5, 3, ""), LemmaRule("ему", 5, 3, ""),
      LemmaRule("ым", 5, 2, ""), LemmaRule("им", 5, 2, ""),
      LemmaRule("ых", 5, 2, ""), LemmaRule("их", 5, 2, ""),
      LemmaRule("ая", 5, 2, ""), LemmaRule("яя", 5, 2, ""),
      LemmaRule("ую", 5, 2, ""), LemmaRule("юю", 5, 2, ""),
      LemmaRule("ые", 5, 2, ""),
      // comparative
      LemmaRule("ее", 6, 2, ""),
      // verb present endings (vowel-specific 3-char forms; а/я-theme
      // verbs keep their theme vowel so present == infinitive stem)
      LemmaRule("ует", 5, 3, ""), LemmaRule("уют", 5, 3, ""),
      LemmaRule("ает", 5, 2, ""), LemmaRule("яет", 5, 2, ""),
      LemmaRule("ают", 5, 2, ""), LemmaRule("яют", 5, 2, ""),
      LemmaRule("ишь", 5, 3, ""), LemmaRule("ешь", 5, 3, ""),
      LemmaRule("ите", 5, 3, ""), LemmaRule("ете", 5, 3, ""),
      LemmaRule("ить", 5, 3, ""), LemmaRule("еть", 5, 3, ""),
      LemmaRule("ит", 5, 2, ""), LemmaRule("ят", 5, 2, ""),
      // verb past endings → theme-vowel stem (see header comment)
      LemmaRule("ила", 6, 3, ""), LemmaRule("или", 6, 3, ""),
      LemmaRule("ило", 6, 3, ""),
      LemmaRule("ала", 6, 3, "а"), LemmaRule("яла", 6, 3, "я"),
      LemmaRule("али", 6, 3, "а"), LemmaRule("яли", 6, 3, "я"),
      LemmaRule("ало", 6, 3, "а"), LemmaRule("яло", 6, 3, "я"),
      LemmaRule("ал", 5, 2, "а"), LemmaRule("ял", 5, 2, "я"),
      LemmaRule("ил", 5, 2, ""),
      // -еть/-деть past (видел/смотрел → the е-less present stem, like
      // видит/смотрит). Known trade-off: -ел nouns (раздел, пробел)
      // lose their nominative to this strip — past-tense verbs dominate
      // transcripts by orders of magnitude, and the held-out floor
      // (which includes an -ал noun paying the analogous ал-rule tax)
      // measures the net effect instead of hand-waving it
      LemmaRule("ела", 6, 3, ""), LemmaRule("ели", 6, 3, ""),
      LemmaRule("ело", 6, 3, ""), LemmaRule("ел", 5, 2, ""),
      // generic case endings
      LemmaRule("ах", 4, 2, ""), LemmaRule("ях", 4, 2, ""),
      LemmaRule("ам", 4, 2, ""), LemmaRule("ям", 4, 2, ""),
      LemmaRule("ом", 4, 2, ""), LemmaRule("ем", 4, 2, ""),
      LemmaRule("ою", 4, 2, ""), LemmaRule("ею", 4, 2, ""),
      LemmaRule("ий", 4, 2, ""), LemmaRule("ый", 4, 2, ""),
      LemmaRule("ой", 4, 2, ""), LemmaRule("ов", 4, 2, ""),
      LemmaRule("ев", 4, 2, ""), LemmaRule("ей", 5, 2, ""),
      LemmaRule("ью", 5, 2, ""), LemmaRule("ть", 4, 2, ""),
      LemmaRule("ы", 4, 1, ""), LemmaRule("и", 4, 1, ""),
      LemmaRule("у", 4, 1, ""), LemmaRule("ю", 4, 1, ""),
      LemmaRule("е", 4, 1, ""), LemmaRule("а", 4, 1, ""),
      LemmaRule("о", 4, 1, ""), LemmaRule("я", 4, 1, ""),
      LemmaRule("й", 4, 1, ""), LemmaRule("ь", 4, 1, "")))
}

/** Deterministic inline Russian fixture for the `b4_lemmatize_ru`
  * driver query — both the Spark side and the DuckDB oracle embed these
  * exact literals (no external data), so the hash check exercises the
  * whole RU pipeline: `[а-яё]` alphabet, "я" keep-list, RU stopwords,
  * exception dictionary, suffix rules. */
object RuFixture {
  val texts: Seq[(Long, String)] = Seq(
    0L -> "Я читаю книги, а книга лежит на столах у стены!",
    1L -> "Столы и стулья стояли в комнате, люди шли домой.",
    2L -> "Новый поиск работает: поиски, поисками, поиску, HTTP 404 error!",
    3L -> "Дети читают: ребёнок читает главу, дети любят чтение.",
    4L -> "Я вижу море и поля, а ты видишь горы.")
}

/** The default (English) analyzer — round-1-compatible facade; every
  * member delegates to [[Analyzers.En]]. */
object Analyzer {

  val config: AnalyzerConfig = Analyzers.En

  /** 1-char tokens kept by B2 (reference keep-list is {"я"}). */
  val KeepShort: Set[String] = config.keepShort

  /** B3 stand-in stopword list — see [[AnalyzerConfig]]. */
  val Stopwords: Array[String] = config.stopwords

  /** Tokenizer character class: anything NOT in it becomes a space.
    * (Reference: `[^а-яё\s]` → space, LemmaFinder.java:105.) */
  val TokenAlphabet: String = config.alphabet

  def tokenize(text: String): Array[String] = config.tokenize(text)
  def keepToken(tok: String): Boolean = config.keepToken(tok)
  def notStopword(tok: String): Boolean = config.notStopword(tok)
  def lemma(tok: String): String = config.lemma(tok)
  def analyze(text: String): Array[String] = config.analyze(text)
  def termFreqs(text: String): Map[String, Int] = config.termFreqs(text)
  def analyzeQuery(query: String): Seq[String] = config.analyzeQuery(query)
  def tokensCol(text: Column): Column = config.tokensCol(text)
  def lemmaCol(tok: Column): Column = config.lemmaCol(tok)
  def lemmaSqlCase(tok: String): String = config.lemmaSqlCase(tok)
  def keepSqlPredicate(tok: String): String = config.keepSqlPredicate(tok)
  def notStopSqlPredicate(tok: String): String = config.notStopSqlPredicate(tok)

  /** B1 as a SQL expression producing an array of raw tokens (Spark
    * dialect; DuckDB needs string_split — see graft.OracleSql). */
  def tokensSqlSpark(text: String): String =
    s"split(trim(regexp_replace(lower($text), '[^${config.alphabet}]+', ' ')), ' ')"
}
