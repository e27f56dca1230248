package graft.functions

/** Character-n-gram Naive Bayes language identifier — the real-model
  * upgrade over the 5-language stopword heuristic (`lang_id`), exposed
  * as `lang_id_nb`. fastText-style shape (Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification"): character 1–4-grams
  * hashed into a fixed bucket table, multinomial NB with add-one
  * smoothing, argmax over per-language log-likelihoods (uniform prior).
  *
  * The training corpus is BUNDLED and DETERMINISTIC: a few sentences of
  * ordinary text plus a function-word line per language (written for
  * this file — common vocabulary, not quoted from any source), so the
  * model trains bit-identically at class load on every JVM in well under
  * a millisecond — no files ship, no network, and every executor
  * materializes the identical table (the static-kernel convention of
  * [[TextOps]]: the expression codegen calls a static method, so the
  * "broadcast" is the JVM-wide lazy val).
  *
  * 28 languages across 9 scripts: en de fr es pt it nl sv da no fi pl
  * cs ro hu tr id vi ru uk el ar he hi ja zh ko th. Non-Latin scripts
  * separate on unigrams alone; the Latin pack leans on the function-word
  * lines. Short or mixed inputs return the best guess; empty/whitespace
  * input returns "und". This is a lightweight heuristic model for
  * pipeline routing, not a fastText replacement — swap in an external
  * model's scores upstream when per-document confidence matters.
  */
object LangNb {

  /** (language code, training snippet). Each snippet: a few natural
    * sentences + a function-word line. */
  private[functions] val corpus: Seq[(String, String)] = Seq(
    "en" -> ("the quick brown fox jumps over the lazy dog. this is a short example of english text about the weather and the world. people often write about science, history, and everyday life. " +
      "i you he she it we they this that and or but not with from for are is was were be have had will would can could about when where because"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund. dies ist ein kurzes beispiel für deutschen text über das wetter und die welt. die menschen schreiben oft über wissenschaft und geschichte. " +
      "ich du er sie es wir ihr und oder aber nicht mit von für sind ist war waren sein haben hatte wird würde kann könnte über wenn wo weil"),
    "fr" -> ("le renard brun rapide saute par-dessus le chien paresseux. ceci est un court exemple de texte français sur le temps et le monde. les gens écrivent souvent sur la science et l'histoire. " +
      "je tu il elle nous vous ils et ou mais pas avec de pour sont est était étaient être avoir avait sera serait peut pourrait quand où parce que"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso. este es un breve ejemplo de texto en español sobre el tiempo y el mundo. la gente escribe a menudo sobre la ciencia y la historia. " +
      "yo tú él ella nosotros vosotros ellos y o pero no con de para son es era eran ser haber había será sería puede podría cuando donde porque"),
    "pt" -> ("a rápida raposa marrom salta sobre o cão preguiçoso. este é um breve exemplo de texto em português sobre o tempo e o mundo. as pessoas escrevem frequentemente sobre ciência e história. " +
      "eu tu ele ela nós vós eles e ou mas não com de para são é era eram ser ter tinha será seria pode poderia quando onde porque você"),
    "it" -> ("la veloce volpe marrone salta sopra il cane pigro. questo è un breve esempio di testo italiano sul tempo e sul mondo. le persone scrivono spesso di scienza e di storia. " +
      "lei è andata a scuola ieri mattina e poi è tornata a casa sua. gli studenti hanno letto molti libri nella biblioteca della città. " +
      "io tu lui lei noi voi loro e o ma non con di per sono è era erano essere avere aveva sarà sarebbe può potrebbe quando dove perché anche più tutto questa"),
    "nl" -> ("de snelle bruine vos springt over de luie hond. dit is een kort voorbeeld van nederlandse tekst over het weer en de wereld. mensen schrijven vaak over wetenschap en geschiedenis. " +
      "ik jij hij zij wij jullie en of maar niet met van voor zijn is was waren hebben had zal zou kan kon over wanneer waar omdat"),
    "sv" -> ("den snabba bruna räven hoppar över den lata hunden. detta är ett kort exempel på svensk text om vädret och världen. människor skriver ofta om vetenskap och historia. " +
      "jag du han hon vi ni de och eller men inte med från för är var vara ha hade ska skulle kan kunde om när eftersom också mycket"),
    "da" -> ("den hurtige brune ræv springer over den dovne hund. dette er et kort eksempel på dansk tekst om vejret og verden. folk skriver ofte om videnskab og historie. " +
      "jeg du han hun vi i de og eller men ikke med af efter til for er var være have havde vil ville kan kunne om hvornår hvad hvor fordi måske øjeblik"),
    "no" -> ("den raske brune reven hopper over den late hunden. dette er et kort eksempel på norsk tekst om været og verden. folk skriver ofte om vitenskap og historie. " +
      "jeg du han hun vi dere de og eller men ikke med av etter til for er var være ha hadde vil ville kan kunne om når hva hvor fordi kanskje"),
    "fi" -> ("nopea ruskea kettu hyppää laiskan koiran yli. tämä on lyhyt esimerkki suomenkielisestä tekstistä säästä ja maailmasta. ihmiset kirjoittavat usein tieteestä ja historiasta. " +
      "minä sinä hän me te he ja tai mutta ei kanssa jossa koska on oli olla olleet ollut voi voisi kun missä miksi mitä kuka myös paljon"),
    "pl" -> ("szybki brązowy lis przeskakuje nad leniwym psem. to jest krótki przykład polskiego tekstu o pogodzie i świecie. ludzie często piszą o nauce i historii. " +
      "ja ty on ona my wy oni i lub ale nie z od dla są jest był były być mieć miał będzie może kiedy gdzie ponieważ także bardzo"),
    "cs" -> ("rychlá hnědá liška skáče přes líného psa. toto je krátký příklad českého textu o počasí a světě. lidé často píší o vědě a historii. " +
      "včera jsme šli do města a koupili jsme si nové boty. moje sestra bydlí ve starém domě a každé ráno chodí pěšky do práce. na podzim hodně prší a děti si hrají doma u stolu. " +
      "já ty on ona my vy oni a nebo ale ne s od pro jsou je byl byly být mít měl bude může mohl kdy kde protože také velmi"),
    "ro" -> ("vulpea maro rapidă sare peste câinele leneș. acesta este un scurt exemplu de text românesc despre vreme și lume. oamenii scriu adesea despre știință și istorie. " +
      "eu tu el ea noi voi ei și sau dar nu cu de pentru sunt este era erau fi avea va fi ar fi poate când unde pentru că foarte"),
    "hu" -> ("a gyors barna róka átugorja a lusta kutyát. ez egy rövid példa a magyar szövegre az időjárásról és a világról. az emberek gyakran írnak a tudományról és a történelemről. " +
      "én te ő mi ti ők és vagy de nem val vel től ért vannak van volt voltak lenni volna lesz lehet amikor ahol mert hogy ez az nagyon"),
    "tr" -> ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar. bu, hava ve dünya hakkında kısa bir türkçe metin örneğidir. insanlar genellikle bilim ve tarih hakkında yazarlar. " +
      "ben sen o biz siz onlar ve veya ama değil ile den için var yok idi olmak vardı olacak olabilir ne zaman nerede çünkü bu şu çok"),
    "id" -> ("rubah coklat yang cepat melompati anjing yang malas. ini adalah contoh singkat teks bahasa indonesia tentang cuaca dan dunia. orang sering menulis tentang ilmu pengetahuan dan sejarah. " +
      "saya kamu dia kami kalian mereka dan atau tetapi tidak dengan dari untuk adalah ada sudah akan bisa dapat kapan di mana karena ini itu yang sangat"),
    "vi" -> ("con cáo nâu nhanh nhẹn nhảy qua con chó lười biếng. đây là một ví dụ ngắn về văn bản tiếng việt về thời tiết và thế giới. mọi người thường viết về khoa học và lịch sử. " +
      "tôi bạn anh ấy cô ấy chúng tôi họ và hoặc nhưng không với từ cho là có đã sẽ có thể khi nào ở đâu bởi vì cái này cái đó rất"),
    "ru" -> ("быстрая коричневая лиса перепрыгивает через ленивую собаку. это короткий пример русского текста о погоде и мире. люди часто пишут о науке и истории. " +
      "утром он идёт на работу и читает новую книгу в поезде. эта большая жёлтая машина стоит около нашего дома уже несколько дней. " +
      "я ты он она мы вы они и или но не с от для есть был были быть иметь имел будет может когда где потому что это тот очень уже свой"),
    "uk" -> ("швидка коричнева лисиця перестрибує через ледачого собаку. це короткий приклад українського тексту про погоду та світ. люди часто пишуть про науку та історію. " +
      "я ти він вона ми ви вони і або але не з від для є був були бути мати мав буде може коли де тому що це той дуже"),
    "el" -> ("η γρήγορη καφέ αλεπού πηδάει πάνω από το τεμπέλικο σκυλί. αυτό είναι ένα σύντομο παράδειγμα ελληνικού κειμένου για τον καιρό και τον κόσμο. οι άνθρωποι γράφουν συχνά για την επιστήμη και την ιστορία. " +
      "εγώ εσύ αυτός αυτή εμείς εσείς αυτοί και ή αλλά δεν με από για είναι ήταν είμαι έχω είχε θα μπορεί όταν πού επειδή αυτό εκείνο πολύ"),
    "ar" -> ("الثعلب البني السريع يقفز فوق الكلب الكسول. هذا مثال قصير على نص عربي عن الطقس والعالم. يكتب الناس غالبا عن العلم والتاريخ. " +
      "أنا أنت هو هي نحن أنتم هم و أو لكن لا مع من إلى في على كان كانت يكون سوف يمكن متى أين لأن هذا ذلك التي الذي جدا"),
    "he" -> ("השועל החום המהיר קופץ מעל הכלב העצלן. זוהי דוגמה קצרה לטקסט בעברית על מזג האוויר והעולם. אנשים כותבים לעתים קרובות על מדע והיסטוריה. " +
      "אני אתה הוא היא אנחנו אתם הם או אבל לא עם מן אל על היה הייתה להיות יש אין יהיה יכול מתי איפה כי זה ההוא אשר מאוד"),
    "hi" -> ("तेज़ भूरी लोमड़ी आलसी कुत्ते के ऊपर से कूदती है। यह मौसम और दुनिया के बारे में हिंदी पाठ का एक छोटा उदाहरण है। लोग अक्सर विज्ञान और इतिहास के बारे में लिखते हैं। " +
      "मैं तुम वह हम आप वे और या लेकिन नहीं के साथ से के लिए है था थे होना होगा सकता जब कहाँ क्योंकि यह वह जो की का बहुत"),
    "ja" -> ("素早い茶色の狐はのろまな犬を飛び越えます。これは天気と世界についての日本語の短い例文です。人々はよく科学や歴史について書きます。 " +
      "これは それは あれは です ます でした ありました いません ください そして しかし また ので から まで とき どこ なぜ わたし あなた かれ かのじょ とても"),
    "zh" -> ("敏捷的棕色狐狸跳过了懒狗。这是一段关于天气和世界的简短中文示例文本。人们经常写关于科学和历史的文章。 " +
      "她每天早上坐火车去城市工作，晚上在家里看书。我们住在小镇上，周末喜欢去山里散步。学生们在教室里学习数学和语文。 " +
      "我 你 他 她 我们 你们 他们 和 或者 但是 不 与 从 为了 是 有 了 会 能 可以 什么时候 哪里 因为 这个 那个 的 在 非常"),
    "ko" -> ("빠른 갈색 여우가 게으른 개를 뛰어넘습니다. 이것은 날씨와 세계에 관한 짧은 한국어 예문입니다. 사람들은 종종 과학과 역사에 대해 씁니다. " +
      "나는 너는 그는 그녀는 우리는 그들은 그리고 또는 하지만 아니다 와 과 부터 위해 이다 있다 없다 했다 할 것이다 수 있다 언제 어디 왜냐하면 이것 그것 매우"),
    "th" -> ("สุนัขจิ้งจอกสีน้ำตาลที่ว่องไวกระโดดข้ามสุนัขขี้เกียจ นี่คือตัวอย่างข้อความภาษาไทยสั้น ๆ เกี่ยวกับสภาพอากาศและโลก ผู้คนมักเขียนเกี่ยวกับวิทยาศาสตร์และประวัติศาสตร์ " +
      "ฉัน คุณ เขา เธอ เรา พวกเขา และ หรือ แต่ ไม่ กับ จาก เพื่อ เป็น คือ มี ได้ จะ สามารถ เมื่อไหร่ ที่ไหน เพราะ นี้ นั้น ใน ของ มาก"))

  val languages: Array[String] = corpus.map(_._1).toArray

  private val Buckets = 1 << 15 // 32768: 28 langs × 32k floats ≈ 3.7 MB

  /** Normalized form n-grams are drawn from: lowercase, every run of
    * non-letter characters collapsed to one space, leading/trailing
    * space kept as a word-boundary marker. */
  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append(' ')
    var lastSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(Character.toLowerCase(c)); lastSpace = false
      } else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    if (!lastSpace) sb.append(' ')
    sb.toString
  }

  /** Deterministic 31-hash of s[from, until) into [0, Buckets). */
  private def bucket(s: CharSequence, from: Int, until: Int): Int = {
    var h = 17
    var i = from
    while (i < until) { h = h * 31 + s.charAt(i); i += 1 }
    h & (Buckets - 1)
  }

  private def grams(s: String)(f: Int => Unit): Unit = {
    var n = 1
    while (n <= 4) {
      var i = 0
      while (i + n <= s.length) { f(bucket(s, i, i + n)); i += 1 }
      n += 1
    }
  }

  /** `weight(bucket)(lang)` — bucket-major for scoring cache locality.
    * Trained once per JVM from [[corpus]]. The raw multinomial NB form
    * `log((c+1)/(total+B))` carries a per-language size bias: with tiny
    * training totals the smoothing denominator dominates, so a document
    * whose grams are unseen everywhere drifts toward the SMALLEST
    * training corpus (observed on held-out fixtures: it→es, zh→nl).
    * Normalizing each language's counts to a fixed mass M cancels the
    * denominator across languages (argmax-invariant), leaving
    * `log1p(c·M/total)` — an unseen gram then scores exactly 0 for
    * every language, and only MATCHED evidence discriminates. */
  private lazy val weight: Array[Array[Float]] = {
    val counts = Array.ofDim[Int](languages.length, Buckets)
    val totals = new Array[Long](languages.length)
    corpus.zipWithIndex.foreach { case ((_, text), l) =>
      grams(normalize(text)) { b => counts(l)(b) += 1; totals(l) += 1 }
    }
    val M = 4096.0
    val table = Array.ofDim[Float](Buckets, languages.length)
    var l = 0
    while (l < languages.length) {
      val w = M / totals(l)
      var b = 0
      while (b < Buckets) {
        if (counts(l)(b) > 0)
          table(b)(l) = math.log1p(counts(l)(b) * w).toFloat
        b += 1
      }
      l += 1
    }
    table
  }

  /** Best language for `text`; "und" when it has no letters or when no
    * n-gram matched any training language (score 0 everywhere). Ties
    * break toward the earlier [[languages]] entry — deterministic. */
  def predict(text: String): String = {
    val s = normalize(text)
    if (s.length <= 2) return "und" // just the boundary spaces
    val nLang = languages.length
    val scores = new Array[Double](nLang)
    val table = weight
    grams(s) { b =>
      val row = table(b)
      var l = 0
      while (l < nLang) { scores(l) += row(l); l += 1 }
    }
    var best = 0
    var l = 1
    while (l < nLang) { if (scores(l) > scores(best)) best = l; l += 1 }
    if (scores(best) <= 0.0) "und" else languages(best)
  }
}
