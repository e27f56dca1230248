package graft.functions

/** Held-out accuracy evaluation for the bundled char-n-gram language
  * identifier — 10 self-written sentences per language (280 total; none
  * shares vocabulary-by-construction with [[LangNb.corpus]] beyond
  * ordinary function words), a per-language confusion table, and pinned
  * floors: every language ≥ 8/10 except the da/no pair (two written
  * standards close enough that single sentences are routinely ambiguous
  * even for full-size models) which is pinned ≥ 6/10 each with all
  * misses landing on its twin. Overall floor: ≥ 93% across the 280.
  * Plus the mixed-script and short-input edges the model documents as
  * best-guess. */
class LangNbAccuracySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val fixtures: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(
      "the children played in the garden until the sun went down behind the hills",
      "he could not remember where he had left his keys yesterday evening",
      "our train leaves early so we should pack our bags tonight",
      "the old library on the corner keeps rare books about local history",
      "she teaches mathematics at the small school near the river",
      "it rained all week but the weekend promises clear skies",
      "they cooked soup and baked fish for the whole village festival",
      "my brother works in a factory that builds engines for ships",
      "the doctor told him to rest and drink plenty of water",
      "every winter the lake freezes and people skate across it"),
    "de" -> Seq(
      "die kinder spielten im garten bis die sonne hinter den hügeln verschwand",
      "er konnte sich nicht erinnern wo er gestern abend seine schlüssel gelassen hatte",
      "unser zug fährt früh ab also sollten wir heute abend unsere koffer packen",
      "die alte bibliothek an der ecke bewahrt seltene bücher über die geschichte der stadt",
      "sie unterrichtet mathematik an der kleinen schule am fluss",
      "es regnete die ganze woche aber am wochenende soll der himmel klar sein",
      "sie kochten suppe und backten fisch für das fest im dorf",
      "mein bruder arbeitet in einer fabrik die motoren für schiffe baut",
      "der arzt sagte ihm er solle sich ausruhen und viel wasser trinken",
      "jeden winter friert der see zu und die leute laufen darüber schlittschuh"),
    "fr" -> Seq(
      "les enfants jouaient dans le jardin jusqu'à ce que le soleil disparaisse derrière les collines",
      "il ne se souvenait plus où il avait laissé ses clés hier soir",
      "notre train part tôt donc nous devrions faire nos valises ce soir",
      "la vieille bibliothèque au coin de la rue garde des livres rares sur l'histoire de la ville",
      "elle enseigne les mathématiques dans la petite école près de la rivière",
      "il a plu toute la semaine mais le week-end promet un ciel clair",
      "ils ont préparé de la soupe et du poisson pour la fête du village",
      "mon frère travaille dans une usine qui fabrique des moteurs pour les bateaux",
      "le médecin lui a dit de se reposer et de boire beaucoup d'eau",
      "chaque hiver le lac gèle et les gens patinent dessus"),
    "es" -> Seq(
      "los niños jugaban en el jardín hasta que el sol se escondió detrás de las colinas",
      "no podía recordar dónde había dejado sus llaves anoche",
      "nuestro tren sale temprano así que deberíamos hacer las maletas esta noche",
      "la vieja biblioteca de la esquina guarda libros raros sobre la historia de la ciudad",
      "ella enseña matemáticas en la pequeña escuela cerca del río",
      "llovió toda la semana pero el fin de semana promete cielos despejados",
      "cocinaron sopa y pescado para la fiesta del pueblo",
      "mi hermano trabaja en una fábrica que construye motores para barcos",
      "el médico le dijo que descansara y bebiera mucha agua",
      "cada invierno el lago se congela y la gente patina sobre él"),
    "pt" -> Seq(
      "as crianças brincavam no jardim até o sol desaparecer atrás das colinas",
      "ele não conseguia lembrar onde tinha deixado as chaves ontem à noite",
      "nosso trem parte cedo então devemos arrumar as malas hoje à noite",
      "a velha biblioteca da esquina guarda livros raros sobre a história da cidade",
      "ela ensina matemática na pequena escola perto do rio",
      "choveu a semana toda mas o fim de semana promete céu limpo",
      "cozinharam sopa e assaram peixe para a festa da aldeia",
      "meu irmão trabalha numa fábrica que constrói motores para navios",
      "o médico disse que ele deveria descansar e beber bastante água",
      "todo inverno o lago congela e as pessoas patinam sobre ele"),
    "it" -> Seq(
      "i bambini giocavano in giardino finché il sole non scomparve dietro le colline",
      "non riusciva a ricordare dove avesse lasciato le chiavi ieri sera",
      "il nostro treno parte presto quindi dovremmo preparare le valigie stasera",
      "la vecchia biblioteca all'angolo conserva libri rari sulla storia della città",
      "lei insegna matematica nella piccola scuola vicino al fiume",
      "è piovuto tutta la settimana ma il fine settimana promette cielo sereno",
      "hanno cucinato la zuppa e il pesce per la festa del paese",
      "mio fratello lavora in una fabbrica che costruisce motori per le navi",
      "il medico gli ha detto di riposare e di bere molta acqua",
      "ogni inverno il lago si ghiaccia e la gente ci pattina sopra"),
    "nl" -> Seq(
      "de kinderen speelden in de tuin totdat de zon achter de heuvels verdween",
      "hij kon zich niet herinneren waar hij gisteravond zijn sleutels had gelaten",
      "onze trein vertrekt vroeg dus we moeten vanavond onze koffers pakken",
      "de oude bibliotheek op de hoek bewaart zeldzame boeken over de geschiedenis van de stad",
      "zij geeft wiskunde op de kleine school bij de rivier",
      "het regende de hele week maar het weekend belooft heldere luchten",
      "ze kookten soep en bakten vis voor het feest in het dorp",
      "mijn broer werkt in een fabriek die motoren voor schepen bouwt",
      "de dokter zei dat hij moest rusten en veel water drinken",
      "elke winter bevriest het meer en schaatsen de mensen eroverheen"),
    "sv" -> Seq(
      "barnen lekte i trädgården tills solen försvann bakom kullarna",
      "han kunde inte minnas var han hade lagt sina nycklar igår kväll",
      "vårt tåg går tidigt så vi borde packa våra väskor ikväll",
      "det gamla biblioteket på hörnet har sällsynta böcker om stadens historia",
      "hon undervisar i matematik på den lilla skolan vid floden",
      "det regnade hela veckan men helgen lovar klar himmel",
      "de lagade soppa och stekte fisk till festen i byn",
      "min bror arbetar på en fabrik som bygger motorer till fartyg",
      "läkaren sa åt honom att vila och dricka mycket vatten",
      "varje vinter fryser sjön och folk åker skridskor över den"),
    "da" -> Seq(
      "børnene legede i haven indtil solen forsvandt bag bakkerne",
      "han kunne ikke huske hvor han havde lagt sine nøgler i går aftes",
      "vores tog kører tidligt så vi bør pakke vores tasker i aften",
      "det gamle bibliotek på hjørnet har sjældne bøger om byens historie",
      "hun underviser i matematik på den lille skole ved floden",
      "det regnede hele ugen men weekenden lover klar himmel",
      "de lavede suppe og stegte fisk til festen i landsbyen",
      "min bror arbejder på en fabrik der bygger motorer til skibe",
      "lægen sagde at han skulle hvile sig og drikke rigeligt vand",
      "hver vinter fryser søen til og folk løber på skøjter hen over den"),
    "no" -> Seq(
      "barna lekte i hagen til solen forsvant bak åsene",
      "han kunne ikke huske hvor han hadde lagt nøklene sine i går kveld",
      "toget vårt går tidlig så vi bør pakke veskene våre i kveld",
      "det gamle biblioteket på hjørnet har sjeldne bøker om byens historie",
      "hun underviser i matematikk på den lille skolen ved elva",
      "det regnet hele uka men helgen lover klar himmel",
      "de lagde suppe og stekte fisk til festen i bygda",
      "broren min jobber på en fabrikk som bygger motorer til skip",
      "legen sa at han måtte hvile seg og drikke mye vann",
      "hver vinter fryser innsjøen til og folk går på skøyter over den"),
    "fi" -> Seq(
      "lapset leikkivät puutarhassa kunnes aurinko katosi kukkuloiden taakse",
      "hän ei muistanut minne oli jättänyt avaimensa eilen illalla",
      "junamme lähtee aikaisin joten meidän pitäisi pakata laukkumme tänä iltana",
      "kulman vanhassa kirjastossa on harvinaisia kirjoja kaupungin historiasta",
      "hän opettaa matematiikkaa pienessä koulussa joen lähellä",
      "satoi koko viikon mutta viikonloppuna luvataan selkeää taivasta",
      "he keittivät keittoa ja paistoivat kalaa kylän juhliin",
      "veljeni työskentelee tehtaassa joka rakentaa moottoreita laivoihin",
      "lääkäri käski hänen levätä ja juoda paljon vettä",
      "joka talvi järvi jäätyy ja ihmiset luistelevat sen yli"),
    "pl" -> Seq(
      "dzieci bawiły się w ogrodzie dopóki słońce nie schowało się za wzgórzami",
      "nie mógł sobie przypomnieć gdzie wczoraj wieczorem zostawił klucze",
      "nasz pociąg odjeżdża wcześnie więc powinniśmy spakować torby dziś wieczorem",
      "stara biblioteka na rogu przechowuje rzadkie książki o historii miasta",
      "ona uczy matematyki w małej szkole nad rzeką",
      "padało cały tydzień ale weekend zapowiada się pogodny",
      "ugotowali zupę i upiekli rybę na wiejskie święto",
      "mój brat pracuje w fabryce która buduje silniki do statków",
      "lekarz kazał mu odpoczywać i pić dużo wody",
      "każdej zimy jezioro zamarza i ludzie jeżdżą po nim na łyżwach"),
    "cs" -> Seq(
      "děti si hrály na zahradě dokud slunce nezmizelo za kopci",
      "nemohl si vzpomenout kde včera večer nechal své klíče",
      "náš vlak odjíždí brzy takže bychom si měli dnes večer sbalit tašky",
      "stará knihovna na rohu uchovává vzácné knihy o historii města",
      "učí matematiku v malé škole u řeky",
      "celý týden pršelo ale o víkendu má být jasno",
      "uvařili polévku a upekli rybu na vesnickou slavnost",
      "můj bratr pracuje v továrně která staví motory pro lodě",
      "lékař mu řekl aby odpočíval a pil hodně vody",
      "každou zimu jezero zamrzne a lidé po něm bruslí"),
    "ro" -> Seq(
      "copiii se jucau în grădină până când soarele a dispărut după dealuri",
      "nu își putea aminti unde își lăsase cheile aseară",
      "trenul nostru pleacă devreme așa că ar trebui să ne facem bagajele diseară",
      "biblioteca veche de la colț păstrează cărți rare despre istoria orașului",
      "ea predă matematică la școala mică de lângă râu",
      "a plouat toată săptămâna dar weekendul promite cer senin",
      "au gătit supă și au copt pește pentru sărbătoarea satului",
      "fratele meu lucrează într-o fabrică ce construiește motoare pentru nave",
      "doctorul i-a spus să se odihnească și să bea multă apă",
      "în fiecare iarnă lacul îngheață și oamenii patinează pe el"),
    "hu" -> Seq(
      "a gyerekek a kertben játszottak amíg a nap el nem tűnt a dombok mögött",
      "nem emlékezett hova tette a kulcsait tegnap este",
      "a vonatunk korán indul ezért ma este össze kellene csomagolnunk",
      "a sarki régi könyvtár ritka könyveket őriz a város történetéről",
      "matematikát tanít a folyó melletti kis iskolában",
      "egész héten esett de hétvégére tiszta eget ígérnek",
      "levest főztek és halat sütöttek a falu ünnepére",
      "a bátyám egy gyárban dolgozik amely hajómotorokat épít",
      "az orvos azt mondta neki hogy pihenjen és igyon sok vizet",
      "minden télen befagy a tó és az emberek korcsolyáznak rajta"),
    "tr" -> Seq(
      "çocuklar güneş tepelerin ardında kaybolana kadar bahçede oynadılar",
      "dün akşam anahtarlarını nereye bıraktığını hatırlayamıyordu",
      "trenimiz erken kalkıyor bu yüzden çantalarımızı bu akşam toplamalıyız",
      "köşedeki eski kütüphane şehrin tarihi hakkında nadir kitaplar saklıyor",
      "nehrin yanındaki küçük okulda matematik öğretiyor",
      "bütün hafta yağmur yağdı ama hafta sonu açık hava bekleniyor",
      "köy şenliği için çorba pişirdiler ve balık kızarttılar",
      "kardeşim gemiler için motor üreten bir fabrikada çalışıyor",
      "doktor ona dinlenmesini ve bol su içmesini söyledi",
      "her kış göl donar ve insanlar üzerinde paten kayar"),
    "id" -> Seq(
      "anak anak bermain di kebun sampai matahari menghilang di balik bukit",
      "dia tidak ingat di mana dia meninggalkan kuncinya tadi malam",
      "kereta kami berangkat pagi jadi kita harus mengemas tas malam ini",
      "perpustakaan tua di sudut jalan menyimpan buku langka tentang sejarah kota",
      "dia mengajar matematika di sekolah kecil dekat sungai",
      "hujan turun sepanjang minggu tetapi akhir pekan diperkirakan cerah",
      "mereka memasak sup dan memanggang ikan untuk pesta desa",
      "kakak saya bekerja di pabrik yang membuat mesin untuk kapal",
      "dokter menyuruhnya beristirahat dan minum banyak air",
      "setiap musim dingin danau membeku dan orang orang berseluncur di atasnya"),
    "vi" -> Seq(
      "bọn trẻ chơi trong vườn cho đến khi mặt trời khuất sau những ngọn đồi",
      "anh ấy không nhớ đã để chìa khóa ở đâu tối hôm qua",
      "chuyến tàu của chúng tôi khởi hành sớm nên tối nay chúng ta phải xếp hành lý",
      "thư viện cũ ở góc phố lưu giữ những cuốn sách quý về lịch sử thành phố",
      "cô ấy dạy toán ở ngôi trường nhỏ gần con sông",
      "trời mưa cả tuần nhưng cuối tuần hứa hẹn bầu trời trong xanh",
      "họ nấu súp và nướng cá cho lễ hội của làng",
      "anh trai tôi làm việc trong một nhà máy sản xuất động cơ cho tàu thủy",
      "bác sĩ bảo anh ấy nghỉ ngơi và uống nhiều nước",
      "mỗi mùa đông hồ nước đóng băng và mọi người trượt băng trên đó"),
    "ru" -> Seq(
      "дети играли в саду пока солнце не скрылось за холмами",
      "он не мог вспомнить где вчера вечером оставил свои ключи",
      "наш поезд отправляется рано поэтому нам стоит собрать вещи сегодня вечером",
      "старая библиотека на углу хранит редкие книги об истории города",
      "она преподает математику в маленькой школе у реки",
      "всю неделю шел дождь но в выходные обещают ясное небо",
      "они сварили суп и запекли рыбу для деревенского праздника",
      "мой брат работает на заводе который строит двигатели для кораблей",
      "врач сказал ему отдыхать и пить побольше воды",
      "каждую зиму озеро замерзает и люди катаются по нему на коньках"),
    "uk" -> Seq(
      "діти гралися в саду поки сонце не сховалося за пагорбами",
      "він не міг згадати де вчора ввечері залишив свої ключі",
      "наш потяг відправляється рано тому нам варто зібрати речі сьогодні ввечері",
      "стара бібліотека на розі зберігає рідкісні книги про історію міста",
      "вона викладає математику в маленькій школі біля річки",
      "цілий тиждень ішов дощ але на вихідних обіцяють ясне небо",
      "вони зварили суп і запекли рибу для сільського свята",
      "мій брат працює на заводі який будує двигуни для кораблів",
      "лікар сказав йому відпочивати і пити багато води",
      "щозими озеро замерзає і люди катаються по ньому на ковзанах"),
    "el" -> Seq(
      "τα παιδιά έπαιζαν στον κήπο μέχρι να κρυφτεί ο ήλιος πίσω από τους λόφους",
      "δεν μπορούσε να θυμηθεί πού είχε αφήσει τα κλειδιά του χθες το βράδυ",
      "το τρένο μας φεύγει νωρίς οπότε πρέπει να ετοιμάσουμε τις βαλίτσες απόψε",
      "η παλιά βιβλιοθήκη στη γωνία φυλάει σπάνια βιβλία για την ιστορία της πόλης",
      "διδάσκει μαθηματικά στο μικρό σχολείο κοντά στο ποτάμι",
      "έβρεχε όλη την εβδομάδα αλλά το σαββατοκύριακο υπόσχεται καθαρό ουρανό",
      "μαγείρεψαν σούπα και έψησαν ψάρι για τη γιορτή του χωριού",
      "ο αδερφός μου δουλεύει σε ένα εργοστάσιο που φτιάχνει μηχανές για πλοία",
      "ο γιατρός του είπε να ξεκουραστεί και να πίνει πολύ νερό",
      "κάθε χειμώνα η λίμνη παγώνει και ο κόσμος κάνει πατινάζ πάνω της"),
    "ar" -> Seq(
      "لعب الأطفال في الحديقة حتى اختفت الشمس خلف التلال",
      "لم يستطع أن يتذكر أين ترك مفاتيحه مساء أمس",
      "قطارنا يغادر مبكرا لذلك يجب أن نحزم حقائبنا الليلة",
      "المكتبة القديمة في الزاوية تحتفظ بكتب نادرة عن تاريخ المدينة",
      "هي تدرس الرياضيات في المدرسة الصغيرة قرب النهر",
      "أمطرت طوال الأسبوع لكن عطلة نهاية الأسبوع تعد بسماء صافية",
      "طبخوا الحساء وشووا السمك لعيد القرية",
      "أخي يعمل في مصنع يبني محركات للسفن",
      "قال له الطبيب أن يرتاح ويشرب كثيرا من الماء",
      "في كل شتاء تتجمد البحيرة ويتزلج الناس عليها"),
    "he" -> Seq(
      "הילדים שיחקו בגינה עד שהשמש נעלמה מאחורי הגבעות",
      "הוא לא הצליח להיזכר איפה השאיר את המפתחות שלו אתמול בערב",
      "הרכבת שלנו יוצאת מוקדם אז כדאי שנארוז את התיקים הערב",
      "הספרייה הישנה בפינה שומרת ספרים נדירים על תולדות העיר",
      "היא מלמדת מתמטיקה בבית הספר הקטן ליד הנהר",
      "ירד גשם כל השבוע אבל בסוף השבוע צפויים שמיים בהירים",
      "הם בישלו מרק ואפו דג לחגיגת הכפר",
      "אחי עובד במפעל שבונה מנועים לאוניות",
      "הרופא אמר לו לנוח ולשתות הרבה מים",
      "בכל חורף האגם קופא ואנשים מחליקים עליו"),
    "hi" -> Seq(
      "बच्चे बगीचे में खेलते रहे जब तक सूरज पहाड़ियों के पीछे छिप नहीं गया",
      "उसे याद नहीं आ रहा था कि कल शाम उसने अपनी चाबियां कहां छोड़ी थीं",
      "हमारी ट्रेन जल्दी निकलती है इसलिए हमें आज रात अपना सामान बांध लेना चाहिए",
      "कोने की पुरानी लाइब्रेरी में शहर के इतिहास की दुर्लभ किताबें रखी हैं",
      "वह नदी के पास के छोटे स्कूल में गणित पढ़ाती है",
      "पूरे हफ्ते बारिश हुई लेकिन सप्ताहांत में आसमान साफ रहने की उम्मीद है",
      "उन्होंने गांव के त्योहार के लिए सूप बनाया और मछली पकाई",
      "मेरा भाई एक कारखाने में काम करता है जो जहाजों के इंजन बनाता है",
      "डॉक्टर ने उसे आराम करने और खूब पानी पीने को कहा",
      "हर सर्दी में झील जम जाती है और लोग उस पर स्केटिंग करते हैं"),
    "ja" -> Seq(
      "子どもたちは太陽が丘の向こうに沈むまで庭で遊んでいました",
      "彼は昨夜どこに鍵を置いたのか思い出せませんでした",
      "私たちの列車は早く出発するので今夜荷物をまとめるべきです",
      "角の古い図書館には町の歴史に関する珍しい本があります",
      "彼女は川の近くの小さな学校で数学を教えています",
      "一週間ずっと雨でしたが週末は晴れる予報です",
      "村の祭りのためにスープを作り魚を焼きました",
      "兄は船のエンジンを作る工場で働いています",
      "医者は彼に休んで水をたくさん飲むように言いました",
      "毎年冬になると湖が凍って人々がその上でスケートをします"),
    "zh" -> Seq(
      "孩子们在花园里玩耍直到太阳落到山丘后面",
      "他想不起来昨天晚上把钥匙放在哪里了",
      "我们的火车很早出发所以今晚应该收拾行李",
      "街角的老图书馆保存着关于城市历史的珍贵书籍",
      "她在河边的小学校教数学",
      "下了一个星期的雨但周末天气预报说是晴天",
      "他们为村里的节日煮了汤还烤了鱼",
      "我哥哥在一家为轮船制造发动机的工厂工作",
      "医生让他好好休息多喝水",
      "每年冬天湖面结冰人们在上面滑冰"),
    "ko" -> Seq(
      "아이들은 해가 언덕 뒤로 사라질 때까지 정원에서 놀았습니다",
      "그는 어젯밤에 열쇠를 어디에 두었는지 기억하지 못했습니다",
      "우리 기차는 일찍 출발하니까 오늘 밤에 짐을 싸야 합니다",
      "모퉁이의 오래된 도서관에는 도시 역사에 관한 희귀한 책들이 있습니다",
      "그녀는 강 근처의 작은 학교에서 수학을 가르칩니다",
      "일주일 내내 비가 왔지만 주말에는 맑을 예정입니다",
      "마을 축제를 위해 수프를 끓이고 생선을 구웠습니다",
      "우리 형은 배의 엔진을 만드는 공장에서 일합니다",
      "의사는 그에게 쉬면서 물을 많이 마시라고 말했습니다",
      "겨울마다 호수가 얼어서 사람들이 그 위에서 스케이트를 탑니다"),
    "th" -> Seq(
      "เด็ก ๆ เล่นในสวนจนกระทั่งดวงอาทิตย์ลับหายไปหลังเนินเขา",
      "เขาจำไม่ได้ว่าเมื่อคืนวางกุญแจไว้ที่ไหน",
      "รถไฟของเราออกเช้าดังนั้นเราควรเก็บกระเป๋าคืนนี้",
      "ห้องสมุดเก่าตรงหัวมุมเก็บหนังสือหายากเกี่ยวกับประวัติศาสตร์ของเมือง",
      "เธอสอนคณิตศาสตร์ที่โรงเรียนเล็ก ๆ ใกล้แม่น้ำ",
      "ฝนตกทั้งสัปดาห์แต่สุดสัปดาห์คาดว่าท้องฟ้าจะแจ่มใส",
      "พวกเขาทำซุปและย่างปลาสำหรับงานเทศกาลหมู่บ้าน",
      "พี่ชายของฉันทำงานในโรงงานที่สร้างเครื่องยนต์สำหรับเรือ",
      "หมอบอกให้เขาพักผ่อนและดื่มน้ำมาก ๆ",
      "ทุกฤดูหนาวทะเลสาบจะกลายเป็นน้ำแข็งและผู้คนเล่นสเก็ตบนนั้น"))

  test("280-sentence held-out set: per-language accuracy meets the documented floors") {
    assert(fixtures.size == 28 && fixtures.forall(_._2.size == 10))
    assert(fixtures.map(_._1).toSet == LangNb.languages.toSet)
    val confusion = fixtures.map { case (lang, sents) =>
      val preds = sents.map(LangNb.predict)
      lang -> preds.groupBy(identity).view.mapValues(_.size).toMap
    }.toMap
    // readable confusion table for the round record
    val lines = confusion.toSeq.sortBy(_._1).map { case (lang, preds) =>
      val acc = preds.getOrElse(lang, 0)
      val wrong = (preds - lang).toSeq.sortBy(-_._2)
        .map { case (l, n) => s"$l=$n" }.mkString(" ")
      f"$lang: $acc%2d/10${if (wrong.nonEmpty) s"  miss: $wrong" else ""}"
    }
    info(lines.mkString("\n"))
    // floors: >= 8/10 everywhere except the da/no written-standard pair
    // (>= 6/10 each; misses must land on the twin)
    val failures = confusion.flatMap { case (lang, preds) =>
      val acc = preds.getOrElse(lang, 0)
      val floor = if (lang == "da" || lang == "no") 6 else 8
      val twinOk = lang match {
        case "da" => (preds - lang).keySet.subsetOf(Set("no"))
        case "no" => (preds - lang).keySet.subsetOf(Set("da"))
        case _    => true
      }
      if (acc < floor || !twinOk) Some(s"$lang acc=$acc preds=$preds") else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    val overall = confusion.map { case (l, p) => p.getOrElse(l, 0) }.sum
    assert(overall >= 260, s"overall $overall/280 below the 93% floor") // 93%
  }

  test("mixed-script input resolves to one of the constituent languages, deterministically") {
    val mixed = Seq(
      ("hello world this is mostly english こんにちは", Set("en", "ja")),
      ("彼は毎朝コーヒーを飲みます and then reads the news", Set("ja", "en")),
      ("el informe está listo пожалуйста проверьте его сегодня", Set("es", "ru")))
    mixed.foreach { case (text, expected) =>
      val p = LangNb.predict(text)
      assert(expected.contains(p), s"'$text' -> $p not in $expected")
      assert(LangNb.predict(text) == p) // stable
    }
  }

  test("short inputs return a best guess, never crash, and scale down gracefully") {
    // single function words: the model documents best-guess behavior —
    // assert only that SOME known language comes back (not und) and the
    // obviously-scripted ones route by script
    val script = Seq("привет" -> Set("ru", "uk"), "γεια" -> Set("el"),
      "שלום" -> Set("he"), "สวัสดี" -> Set("th"), "नमस्ते" -> Set("hi"))
    script.foreach { case (w, ok) =>
      val p = LangNb.predict(w)
      assert(ok.contains(p), s"'$w' -> $p not in $ok")
    }
    Seq("the", "der", "le", "og", "и").foreach { w =>
      assert(LangNb.languages.contains(LangNb.predict(w)), s"'$w' fell to und")
    }
  }
}
