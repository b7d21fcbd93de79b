package graft

import graft.analysis.TokenFilters
import org.scalatest.funsuite.AnyFunSuite

/** Soundex golden vectors from the commons-codec/reference documentation
  * (Soundex.cs wraps the same US_ENGLISH mapping; the H-W merge rule and
  * vowel reset are the differentiators vs naive soundex).
  */
class PhoneticSpec extends AnyFunSuite {

  test("soundex golden vectors incl. H-W rule and vowel reset") {
    val golden = Map(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // H-W rule
      "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Hanna" -> "H500",
      "Washington" -> "W252", "Lee" -> "L000",
      "Gutierrez" -> "G362", "Jackson" -> "J250", "Williams" -> "W452",
      "o'brien" -> "O165", // non-letters transparent
      "a" -> "A000", "w" -> "W000")
    golden.foreach { case (in, want) =>
      assert(TokenFilters.soundex(in) == want, s"soundex($in)")
      assert(TokenFilters.soundex(in.toLowerCase) == want, s"soundex(lower $in)")
    }
    assert(TokenFilters.soundex("3.14") == "")
    assert(TokenFilters.soundex("") == "")
  }

  test("double metaphone: all 1221 reference surname vectors (primary+alternate)") {
    // Vector set extracted from the reference's own test data
    // (Lucene.Net.Tests.Analysis.Phonetic/Language/DoubleMetaphone2Test.cs,
    // originally Stephen Woodbridge's surnames.txt): word, primary, alternate.
    val in = getClass.getResourceAsStream("/double_metaphone_vectors.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(lines.size >= 1200)
    val bad = lines.flatMap { l =>
      val Array(w, p, a) = l.split('\t')
      val (gp, ga) = graft.analysis.DoubleMetaphone.encode(w)
      if (gp == p && ga == a) None else Some(s"$w: got ($gp,$ga) want ($p,$a)")
    }
    assert(bad.isEmpty, s"${bad.size} mismatches, first 20:\n${bad.take(20).mkString("\n")}")
  }

  test("double metaphone: edge inputs") {
    assert(graft.analysis.DoubleMetaphone.encode("") == ("", ""))
    assert(graft.analysis.DoubleMetaphone.encode("   ") == ("", ""))
    assert(graft.analysis.DoubleMetaphone.encode(null) == ("", ""))
    // lowercase input equals uppercase input
    assert(graft.analysis.DoubleMetaphone.encode("smith") ==
      graft.analysis.DoubleMetaphone.encode("SMITH"))
  }

  test("phonetic filter: inject vs replace") {
    val terms = Array("robert", "3.14")
    assert(TokenFilters.phonetic(terms, inject = true).toSeq ==
      Seq("robert", "R163", "3.14"))
    assert(TokenFilters.phonetic(terms, inject = false).toSeq ==
      Seq("R163", "3.14"))
  }

  test("nysiis: reference vectors (relaxed mode, NysiisTest.cs dropby + rule tables)") {
    import graft.analysis.PhoneticEncoders.nysiis
    val golden = Seq(
      // dropby.com table as carried by the reference's NysiisTest.TestDropBy
      "MACINTOSH" -> "MCANT", "KNUTH" -> "NAT", "KOEHN" -> "CAN",
      "PHILLIPSON" -> "FALAPSAN", "PFEISTER" -> "FASTAR",
      "SCHOENHOEFT" -> "SANAFT", "MCKEE" -> "MCY", "MACKIE" -> "MCY",
      "HEITSCHMIDT" -> "HATSNAD", "BART" -> "BAD", "HURD" -> "HAD",
      "HUNT" -> "HAD", "WESTERLUND" -> "WASTARLAD", "CASSTEVENS" -> "CASTAFAN",
      "VASQUEZ" -> "VASG", "FRAZIER" -> "FRASAR", "BOWMAN" -> "BANAN",
      "MCKNIGHT" -> "MCNAGT", "RICKERT" -> "RACAD", "DEUTSCH" -> "DAT",
      "WESTPHAL" -> "WASTFAL", "SHRIVER" -> "SRAVAR", "KUHL" -> "CAL",
      "RAWSON" -> "RASAN", "JILES" -> "JAL", "CARRAWAY" -> "CARY",
      "YAMADA" -> "YANAD", "O'Daniel" -> "ODANAL", "O'Donnel" -> "ODANAL",
      "Cory" -> "CARY", "Corey" -> "CARY", "Kory" -> "CARY", "FUZZY" -> "FASY",
      // per-rule tables (TestRule1/2/4/5/6)
      "MACX" -> "MCX", "KNX" -> "NX", "KX" -> "CX", "PHX" -> "FX",
      "PFX" -> "FX", "SCHX" -> "SX", "XEE" -> "XY", "XIE" -> "XY",
      "XDT" -> "XD", "XRT" -> "XD", "XRD" -> "XD", "XNT" -> "XD",
      "XND" -> "XD", "XEV" -> "XAF", "XAX" -> "XAX", "XEX" -> "XAX",
      "XIX" -> "XAX", "XOX" -> "XAX", "XUX" -> "XAX", "XQ" -> "XG",
      "XZ" -> "X", "XM" -> "XN", "XS" -> "X", "XSS" -> "X")
    golden.foreach { case (in, want) =>
      assert(nysiis(in, strict = false) == want, s"nysiis($in)")
    }
    // strict mode caps at 6 (the 1970 scheme); EncodeAll vectors are strict
    Seq("Brian", "Brown", "Brun").foreach(w => assert(nysiis(w) == "BRAN", w))
    Seq("Capp", "Cope", "Copp", "Kipp").foreach(w => assert(nysiis(w) == "CAP", w))
    Seq("Dane", "Dean", "Dionne").foreach(w => assert(nysiis(w) == "DAN", w))
    assert(nysiis("Dent") == "DAD")
    assert(nysiis("Phil") == "FAL")
    assert(nysiis("WESTERLUND") == "WASTAR") // 6-char cap of WASTARLAD
    assert(nysiis("") == "" && nysiis(null) == "" && nysiis("1234") == "")
  }

  test("refined soundex: reference vectors (RefinedSoundexTest.cs)") {
    import graft.analysis.PhoneticEncoders.refinedSoundex
    val golden = Map(
      "testing" -> "T6036084", "TESTING" -> "T6036084", "The" -> "T60",
      "quick" -> "Q503", "brown" -> "B1908", "fox" -> "F205",
      "jumped" -> "J408106", "over" -> "O0209", "the" -> "T60",
      "lazy" -> "L7050", "dogs" -> "D6043")
    golden.foreach { case (in, want) =>
      assert(refinedSoundex(in) == want, s"refinedSoundex($in)")
    }
    assert(refinedSoundex("") == "" && refinedSoundex(null) == "")
  }

  test("caverphone2: reference vectors (Caverphone2Test.cs)") {
    import graft.analysis.PhoneticEncoders.caverphone2
    // encoding-variation groups + examples from the reference test suite
    Seq("add", "aid", "at", "art", "eat", "earth", "head", "hit", "hot",
      "hold", "hard", "heart", "it", "out", "old")
      .foreach(w => assert(caverphone2(w) == "AT11111111", w))
    Seq("Karleen", "Glenn", "Cline", "Klein", "Colleen", "Xylon")
      .foreach(w => assert(caverphone2(w) == "KLN1111111", w))
    Seq("Dan", "Dane", "Dawn", "Dean", "Dyun")
      .foreach(w => assert(caverphone2(w) == "TN11111111", w))
    val golden = Map(
      "Stevenson" -> "STFNSN1111", "Peter" -> "PTA1111111",
      "Tedder" -> "TTA1111111", "ready" -> "RTA1111111",
      "social" -> "SSA1111111", "able" -> "APA1111111",
      "mb" -> "M111111111", "mbmb" -> "MPM1111111")
    golden.foreach { case (in, want) =>
      assert(caverphone2(in) == want, s"caverphone2($in)")
    }
    assert(caverphone2("") == "1111111111" && caverphone2(null) == "1111111111")
    // case-insensitive
    assert(caverphone2("STEVENSON") == caverphone2("stevenson"))
  }

  test("cologne phonetic: reference vectors (ColognePhoneticTest.cs)") {
    import graft.analysis.PhoneticEncoders.cologne
    val edge = Seq(
      "a" -> "0", "e" -> "0", "i" -> "0", "o" -> "0", "u" -> "0",
      "ä" -> "0", "ö" -> "0", "ü" -> "0", // ä ö ü
      "aa" -> "0", "ha" -> "0", "h" -> "", "aha" -> "0",
      "b" -> "1", "p" -> "1", "ph" -> "3", "f" -> "3", "v" -> "3", "w" -> "3",
      "g" -> "4", "k" -> "4", "q" -> "4", "x" -> "48", "ax" -> "048",
      "cx" -> "48", "l" -> "5", "cl" -> "45", "acl" -> "085", "mn" -> "6",
      "r" -> "7")
    val examples = Seq(
      "Aabjoe" -> "01", "Aaclan" -> "0856", "Aychlmajr" -> "04567",
      "mÜller" -> "657", "schmidt" -> "862", "schneider" -> "8627",
      "fischer" -> "387", "weber" -> "317", "wagner" -> "3467",
      "becker" -> "147", "hoffmann" -> "0366", "schÄfer" -> "837",
      "Breschnew" -> "17863", "Wikipedia" -> "3412", "peter" -> "127",
      "pharma" -> "376", "mönchengladbach" -> "664645214",
      "deutsch" -> "28", "deutz" -> "28", "hamburg" -> "06174",
      "hannover" -> "0637", "christstollen" -> "478256",
      "Xanthippe" -> "48621", "Zacharias" -> "8478", "Holzbau" -> "0581",
      "matsch" -> "68", "matz" -> "68", "Arbeitsamt" -> "071862",
      "Eberhard" -> "01772", "Eberhardt" -> "01772", "heithabu" -> "021",
      "bergisch-gladbach" -> "174845214",
      "Müller-Lüdenscheidt" -> "65752682")
    (edge ++ examples).foreach { case (in, want) =>
      assert(cologne(in) == want, s"cologne($in)")
    }
    assert(cologne(null) == "" && cologne("") == "")
  }

  test("match rating approach: reference vectors (MatchRatingApproachEncoderTest.cs)") {
    import graft.analysis.PhoneticEncoders._
    assert(mra("HARPER") == "HRPR" && mra("Smith") == "SMTH" &&
      mra("Smyth") == "SMYTH")
    assert(mra(" ") == "" && mra("") == "" && mra(null) == "" && mra("E") == "")
    // internals pinned by the reference suite
    assert(mraRemoveAccents("áéíóú") == "aeiou")
    assert(mraRemoveAccents("Colorless green ideas sleep furiously") ==
      "Colorless green ideas sleep furiously")
    assert(mraRemoveVowels("ALESSANDRA") == "ALSSNDR")
    assert(mraRemoveVowels("AIDAN") == "ADN")
    assert(mraRemoveVowels("DECLAN") == "DCLN")
    assert(mraRemoveDoubleConsonants("BUBBLE") == "BUBLE")
    assert(mraRemoveDoubleConsonants("MISSISSIPPI") == "MISISIPI")
    assert(mraRemoveDoubleConsonants("BEETLE") == "BEETLE")
    assert(mraFirst3Last3("Alexzander") == "Aleder")
    assert(mraFirst3Last3("PETE") == "PETE")
    assert(mraCount("ALEXANDER", "ALEXANDRA") == 4)
    assert(mraCount("EINSTEIN", "MICHAELA") == 0)
    Seq(1 -> 5, 2 -> 5, 4 -> 5, 5 -> 4, 6 -> 4, 7 -> 4, 8 -> 3, 10 -> 3,
      11 -> 3, 12 -> 2, 13 -> 1).foreach { case (n, want) =>
      assert(mraMinRating(n) == want, s"minRating($n)")
    }
    val yes = Seq("John" -> "John", "smith" -> "smyth", "Burns" -> "Bourne",
      "Catherine" -> "Kathryn", "Brian" -> "Bryan", "Séan" -> "Shaun",
      "Stephen" -> "Steven", "Steven" -> "Stefan", "Stephen" -> "Stefan",
      "Sam" -> "Samuel", "Micky" -> "Michael", "Oona" -> "Oonagh",
      "Sophie" -> "Sofia", "Franciszek" -> "Frances", "Tomasz" -> "tom",
      "Kl" -> "Karl", "Zach" -> "Zacharia",
      "O'Sullivan" -> "Ó ' Súilleabháin",
      "Cooper-Flynn" -> "Super-Lyn", "Hailey" -> "Halley",
      "Auerbach" -> "Uhrbach", "Moskowitz" -> "Moskovitz",
      "LIPSHITZ" -> "LIPPSZYC", "LEWINSKY" -> "LEVINSKI",
      "SZLAMAWICZ" -> "SHLAMOVITZ", "Peterson" -> "Peters",
      "McGowan" -> "Mc Geoghegan")
    yes.foreach { case (a, b) => assert(mraEquals(a, b), s"$a ~ $b") }
    val no = Seq("Al" -> "Ed", "Karl" -> "C", "Karl" -> "Alessandro",
      "Úna" -> "Oonagh", "Moriarty" -> "OMuircheartaigh",
      "test" -> "", "" -> "test", "test" -> " ", " " -> "test",
      "t" -> "test", "test" -> "t", "Murphy" -> " ")
    no.foreach { case (a, b) => assert(!mraEquals(a, b), s"$a !~ $b") }
    assert(!mraEquals(null, "test") && !mraEquals("test", null) &&
      !mraEquals(null, " "))
  }

  test("daitch-mokotoff: reference vectors (DaitchMokotoffSoundexTest.cs)") {
    import graft.analysis.PhoneticEncoders.{daitchMokotoff => dm, daitchMokotoffEncode => dmEnc}
    // accented / special characters fold
    assert(dm("Straßburg") == "294795" && dm("Strasburg") == "294795")
    assert(dm("Éregon") == "095600" && dm("Eregon") == "095600")
    assert(dm("AKSSOL") == "054800")
    assert(dm("GERSCHFELD") == "547830|545783|594783|594578")
    // non-branching Encode takes the first alternative everywhere
    assert(dmEnc("AUERBACH") == "097400" && dmEnc("OHRBACH") == "097400")
    assert(dmEnc("LIPSHITZ") == "874400" && dmEnc("LIPPSZYC") == "874400")
    assert(dmEnc("LEWINSKY") == "876450" && dmEnc("LEVINSKI") == "876450")
    assert(dmEnc("SZLAMAWICZ") == "486740" && dmEnc("SHLAMOVITZ") == "486740")
    assert(dmEnc(" \t\n\r Washington \t\n\r ") == "746536" &&
      dmEnc("Washington") == "746536")
    // branching examples from the published D-M description
    assert(dm("GOLDEN") == "583600" && dm("Alpert") == "087930")
    assert(dm("Breuer") == "791900" && dm("Haber") == "579000")
    assert(dm("Mannheim") == "665600" && dm("Mintz") == "664000")
    assert(dm("Topf") == "370000" && dm("Kleinmann") == "586660")
    assert(dm("Ben Aron") == "769600")
    assert(dm("AUERBACH") == "097400|097500")
    assert(dm("OHRBACH") == "097400|097500")
    assert(dm("LIPSHITZ") == "874400")
    assert(dm("LIPPSZYC") == "874400|874500")
    assert(dm("LEWINSKY") == "876450" && dm("LEVINSKI") == "876450")
    assert(dm("SZLAMAWICZ") == "486740" && dm("SHLAMOVITZ") == "486740")
    assert(dm("Ceniow") == "467000|567000" && dm("Tsenyuv") == "467000")
    assert(dm("Holubica") == "587400|587500" && dm("Golubitsa") == "587400")
    assert(dm("Przemysl") == "746480|794648" && dm("Pshemeshil") == "746480")
    assert(dm("Rosochowaciec") ==
      "944744|944745|944754|944755|945744|945745|945754|945755")
    assert(dm("Rosokhovatsets") == "945744")
    assert(dm("Peters") == "734000|739400" && dm("Peterson") == "734600|739460")
    assert(dm("Moskowitz") == "645740" && dm("Moskovitz") == "645740")
    assert(dm("Jackson") == "154600|145460|454600|445460")
    assert(dm("Jackson-Jackson") ==
      "154654|154645|154644|145465|145464|454654|454645|454644|445465|445464")
    assert(dm("ţamas") == "364000|464000") // Romanian t-cedilla branches
    assert(dm(null) == "" && dmEnc(null) == "" && dm("") == "000000")
  }

  test("metaphone: reference vectors (MetaphoneTest.cs)") {
    import graft.analysis.PhoneticEncoders.metaphone
    // word slate (TestMetaphone)
    assert(metaphone("howl") == "HL" && metaphone("testing") == "TSTN")
    assert(metaphone("The") == "0" && metaphone("quick") == "KK")
    assert(metaphone("brown") == "BRN" && metaphone("fox") == "FKS")
    assert(metaphone("jumped") == "JMPT" && metaphone("over") == "OFR")
    assert(metaphone("the") == "0" && metaphone("lazy") == "LS")
    assert(metaphone("dogs") == "TKS")
    // consonant special cases
    assert(metaphone("COMB") == "KM" && metaphone("TOMB") == "TM" &&
      metaphone("WOMB") == "WM") // silent MB$
    assert(metaphone("SCIENCE") == "SNS" && metaphone("SCENE") == "SN" &&
      metaphone("SCY") == "S") // SCI/SCE/SCY discard C
    assert(metaphone("WHY") == "") // WH -> W, Y silent before non-vowel
    assert(metaphone("CIAPO") == "XP") // CIA -> X
    assert(metaphone("SCHEDULE") == "SKTL" && metaphone("SCHEMATIC") == "SKMT") // SCH -> SK
    assert(metaphone("CHARACTER") == "KRKT" && metaphone("TEACH") == "TX") // CH
    assert(metaphone("DODGY") == "TJ" && metaphone("DODGE") == "TJ" &&
      metaphone("ADGIEMTI") == "AJMT") // DGE/DGI/DGY -> J
    assert(metaphone("GHENT") == "KNT" && metaphone("BAUGH") == "B") // GH
    assert(metaphone("GNU") == "N" && metaphone("SIGNED") == "SNT") // silent GN
    assert(metaphone("PHISH") == "FX") // PH -> F
    assert(metaphone("SHOT") == "XT" && metaphone("ODSIAN") == "OTXN" &&
      metaphone("PULSION") == "PLXN") // SH/SIO/SIA -> X
    assert(metaphone("OTIA") == "OX" && metaphone("PORTION") == "PRXN") // TIA/TIO -> X
    assert(metaphone("RETCH") == "RX" && metaphone("WATCH") == "WX") // silent TCH-T
    assert(metaphone("AXEAXE") == "AKSK") // X -> KS, 4-char cap
    assert(metaphone("AXEAXEAXE", maxCodeLen = 6) == "AKSKSK") // SetMaxLengthWithTruncation
    // IsMetaphoneEqual slates (equal codes)
    def eq(a: String, b: String) = metaphone(a) == metaphone(b)
    assert(eq("Case", "case") && eq("CASE", "Case") && eq("caSe", "cAsE") &&
      eq("quick", "cookie") && eq("Lawrence", "Lorenza") && eq("Gary", "Cahra"))
    assert(Seq("Eure").forall(eq("Aero", _))) // initial AE
    assert(Seq("Wade", "Wait", "Waite", "Wat", "Whit", "Wiatt", "Wit", "Wittie",
      "Witty", "Wood", "Woodie", "Woody").forall(eq("White", _))) // initial WH
    assert(Seq("Ailbert", "Alberik", "Albert", "Alberto", "Albrecht")
      .forall(eq("Albert", _)))
    assert(Seq("Cahra", "Cara", "Carey", "Cari", "Caria", "Carie", "Caro",
      "Carree", "Carri", "Carrie", "Carry", "Cary", "Cora", "Corey", "Cori",
      "Corie", "Correy", "Corri", "Corrie", "Corry", "Cory", "Gray", "Kara",
      "Kare", "Karee", "Kari", "Karia", "Karie", "Karrah", "Karrie", "Karry",
      "Kary", "Keri", "Kerri", "Kerrie", "Kerry", "Kira", "Kiri", "Kora",
      "Kore", "Kori", "Korie", "Korrie", "Korry").forall(eq("Gary", _)))
    assert(metaphone(null) == "" && metaphone("") == "" && metaphone("a") == "A")
  }

  test("caverphone 1.0: reference vectors (Caverphone1Test.cs)") {
    import graft.analysis.PhoneticEncoders.caverphone1
    // common-code AT1111 slate
    Seq("add", "aid", "at", "art", "eat", "earth", "head", "hit", "hot",
      "hold", "hard", "heart", "it", "out", "old").foreach { w =>
      assert(caverphone1(w) == "AT1111", s"caverphone1($w)")
    }
    assert(caverphone1("mb") == "M11111" && caverphone1("mbmb") == "MPM111")
    assert(caverphone1("David") == "TFT111" && caverphone1("Whittle") == "WTL111")
    assert(caverphone1("Lee") == "L11111" && caverphone1("Thompson") == "TMPSN1")
    // IsEncodeEqual pairs
    assert(caverphone1("Peter") == caverphone1("Peady"))
    assert(caverphone1("Peter") != caverphone1("Stevenson"))
    assert(caverphone1(null) == "111111" && caverphone1("") == "111111")
  }

  test("phonetic filter: pluggable encoder seam") {
    import graft.analysis.PhoneticEncoders
    val terms = Array("Stevenson", "Peter")
    assert(TokenFilters.phonetic(terms, inject = false, PhoneticEncoders.caverphone2).toSeq ==
      Seq("STFNSN1111", "PTA1111111"))
    assert(TokenFilters.phonetic(terms, inject = true, PhoneticEncoders.nysiis(_)).toSeq ==
      Seq("Stevenson", "STAFAN", "Peter", "PATAR"))
  }
}
