package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Char-n-gram NB language ID: held-out fixtures across all 28 bundled
  * languages (sentences NOT in the training corpus), determinism, the
  * SQL surface, and the map-only plan shape. */
class LangNbSpec extends SparkTestBase {
  import spark.implicits._

  // held-out sentences — different vocabulary than LangNb.corpus
  private val heldOut: Seq[(String, String)] = Seq(
    "en" -> "she walked to the market in the morning and bought some fresh bread for her family",
    "de" -> "am nächsten morgen ging sie zum markt und kaufte frisches brot für ihre ganze familie",
    "fr" -> "le lendemain matin elle est allée au marché et a acheté du pain frais pour toute sa famille",
    "es" -> "a la mañana siguiente fue al mercado y compró pan fresco para toda su familia",
    "pt" -> "na manhã seguinte ela foi ao mercado e comprou pão fresco para toda a sua família",
    "it" -> "la mattina seguente è andata al mercato e ha comprato del pane fresco per tutta la famiglia",
    "nl" -> "de volgende ochtend ging ze naar de markt en kocht vers brood voor haar hele gezin",
    "sv" -> "nästa morgon gick hon till marknaden och köpte färskt bröd till hela sin familj",
    "da" -> "næste morgen gik hun på markedet og købte frisk brød til hele sin familie og måske lidt mælk",
    "no" -> "neste morgen gikk hun til markedet og kjøpte ferskt brød til hele familien sin og kanskje litt melk",
    "fi" -> "seuraavana aamuna hän meni torille ja osti tuoretta leipää koko perheelleen",
    "pl" -> "następnego ranka poszła na targ i kupiła świeży chleb dla całej swojej rodziny",
    "cs" -> "další ráno šla na trh a koupila čerstvý chléb pro celou svou rodinu",
    "ro" -> "în dimineața următoare a mers la piață și a cumpărat pâine proaspătă pentru toată familia ei",
    "hu" -> "másnap reggel elment a piacra és friss kenyeret vett az egész családjának",
    "tr" -> "ertesi sabah pazara gitti ve bütün ailesi için taze ekmek aldı",
    "id" -> "keesokan paginya dia pergi ke pasar dan membeli roti segar untuk seluruh keluarganya",
    "vi" -> "sáng hôm sau cô ấy đi chợ và mua bánh mì tươi cho cả gia đình mình",
    "ru" -> "на следующее утро она пошла на рынок и купила свежий хлеб для всей своей семьи",
    "uk" -> "наступного ранку вона пішла на ринок і купила свіжий хліб для всієї своєї родини",
    "el" -> "το επόμενο πρωί πήγε στην αγορά και αγόρασε φρέσκο ψωμί για όλη την οικογένειά της",
    "ar" -> "في صباح اليوم التالي ذهبت إلى السوق واشترت خبزا طازجا لجميع أفراد أسرتها",
    "he" -> "למחרת בבוקר היא הלכה לשוק וקנתה לחם טרי לכל המשפחה שלה",
    "hi" -> "अगली सुबह वह बाजार गई और अपने पूरे परिवार के लिए ताजी रोटी खरीदी",
    "ja" -> "翌朝、彼女は市場へ行って家族のために新しいパンを買いました",
    "zh" -> "第二天早上她去市场给全家买了新鲜的面包",
    "ko" -> "다음 날 아침 그녀는 시장에 가서 온 가족을 위해 신선한 빵을 샀습니다",
    "th" -> "เช้าวันรุ่งขึ้นเธอไปตลาดและซื้อขนมปังสดใหม่ให้ทั้งครอบครัว")

  test("held-out sentences classify correctly in all 28 languages") {
    assert(LangNb.languages.length == 28)
    assert(heldOut.map(_._1).toSet == LangNb.languages.toSet)
    val wrong = heldOut.flatMap { case (lang, text) =>
      val got = LangNb.predict(text)
      if (got != lang) Some(s"$lang -> $got : $text") else None
    }
    assert(wrong.isEmpty, wrong.mkString("\n"))
  }

  test("edge inputs: empty, whitespace, digits-only are und; determinism") {
    assert(LangNb.predict("") == "und")
    assert(LangNb.predict("   \t\n") == "und")
    assert(LangNb.predict("12345 67 89 ... !!") == "und")
    val s = heldOut.toMap.apply("de")
    assert(LangNb.predict(s) == LangNb.predict(s))
  }

  test("lang_id_nb SQL surface scores map-only (no shuffle, no UDF)") {
    graft.Graft.register(spark)
    val df = heldOut.toDF("lang", "text")
    val pred = df.select($"lang", expr("lang_id_nb(text)").as("pred"))
    val plan = pred.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("BatchEvalPython"), plan)
    // codegen'd static call, not an interpreted ScalaUDF
    assert(!plan.contains("UDF"), plan)
    val rows = pred.collect()
    assert(rows.count(r => r.getString(0) == r.getString(1)) == heldOut.size)
    // NULL in -> NULL out (GeoUnary null-intolerance)
    assert(spark.sql("SELECT lang_id_nb(CAST(NULL AS STRING))").head.isNullAt(0))
  }
}
