package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Accuracy of the n-gram-profile language ID on REAL multilingual text.
  * The driver's `documents.lang` is a synthetic label on English-vocab text
  * (no detector can recover it — see TextOps scaladoc), so accuracy is
  * measured here against a labeled fixture set of ordinary sentences; the
  * p42 oracle gates the exact scores/decisions engine-for-engine. */
class LangIdNgramSpec extends SparkSpecBase {
  import spark.implicits._

  // plain everyday sentences, 10 per language — deliberately short (the
  // regime where the old stopword heuristic fails)
  private val fixtures: Seq[(String, String)] = Seq(
    "en" -> "The weather is nice today and we are going to the park.",
    "en" -> "She finished reading the book before dinner was ready.",
    "en" -> "This is the best coffee I have had in a long time.",
    "en" -> "They are planning a trip to the mountains next spring.",
    "en" -> "The meeting was moved to Thursday morning at ten.",
    "en" -> "He wants to learn how to play the guitar this year.",
    "en" -> "Our team is working on an interesting new project.",
    "en" -> "The train to London leaves in about twenty minutes.",
    "en" -> "I think the answer depends on what you are asking for.",
    "en" -> "Being on time is important for the whole group.",
    "de" -> "Das Wetter ist heute schön und wir gehen in den Park.",
    "de" -> "Sie hat das Buch vor dem Abendessen fertig gelesen.",
    "de" -> "Die Besprechung wurde auf Donnerstagmorgen verschoben.",
    "de" -> "Er möchte dieses Jahr Gitarre spielen lernen.",
    "de" -> "Unser Team arbeitet an einem interessanten neuen Projekt.",
    "de" -> "Der Zug nach Berlin fährt in etwa zwanzig Minuten ab.",
    "de" -> "Ich glaube, die Antwort hängt von der Frage ab.",
    "de" -> "Pünktlichkeit ist für die ganze Gruppe wichtig.",
    "de" -> "Die Kinder spielen nach der Schule gern im Garten.",
    "de" -> "Wir haben gestern einen schönen Ausflug gemacht.",
    "fr" -> "Le temps est beau aujourd'hui et nous allons au parc.",
    "fr" -> "Elle a fini de lire le livre avant le dîner.",
    "fr" -> "La réunion a été déplacée à jeudi matin.",
    "fr" -> "Il veut apprendre à jouer de la guitare cette année.",
    "fr" -> "Notre équipe travaille sur un nouveau projet intéressant.",
    "fr" -> "Le train pour Paris part dans une vingtaine de minutes.",
    "fr" -> "Je pense que la réponse dépend de la question posée.",
    "fr" -> "Être à l'heure est important pour tout le groupe.",
    "fr" -> "Les enfants aiment jouer dans le jardin après l'école.",
    "fr" -> "Nous avons fait une belle promenade hier après-midi.",
    "es" -> "El tiempo está agradable hoy y vamos a ir al parque.",
    "es" -> "Ella terminó de leer el libro antes de la cena.",
    "es" -> "La reunión fue movida al jueves por la mañana.",
    "es" -> "Él quiere aprender a tocar la guitarra este año.",
    "es" -> "Nuestro equipo trabaja en un nuevo proyecto interesante.",
    "es" -> "El tren para Madrid sale en unos veinte minutos.",
    "es" -> "Creo que la respuesta depende de la pregunta.",
    "es" -> "Llegar a tiempo es importante para todo el grupo.",
    "es" -> "A los niños les gusta jugar en el jardín después de clase.",
    "es" -> "Hicimos un bonito paseo ayer por la tarde.",
    "zh" -> "今天天气很好，我们打算去公园散步。",
    "zh" -> "她在晚饭前把那本书读完了。",
    "zh" -> "会议改到了星期四上午十点。",
    "zh" -> "他今年想学弹吉他。",
    "zh" -> "我们的团队正在做一个有趣的新项目。",
    "zh" -> "去北京的火车大约二十分钟后出发。",
    "zh" -> "我觉得答案取决于你问的问题。",
    "zh" -> "准时对整个团队都很重要。",
    "zh" -> "孩子们放学后喜欢在花园里玩。",
    "zh" -> "我们昨天下午散了一次很愉快的步。")

  private lazy val predicted = fixtures.toDF("lang", "text")
    .withColumn("pred", TextOps.langIdNgramPredict(col("text")))
    .select("lang", "pred").collect().map(r => (r.getString(0), r.getString(1)))

  test("n-gram profiles: >= 90% accuracy on real short sentences, 5 languages") {
    val correct = predicted.count { case (l, p) => l == p }
    val acc = correct.toDouble / predicted.length
    val confusions = predicted.filter { case (l, p) => l != p }
    info(f"accuracy: $acc%.3f ($correct/${predicted.length}); confusions: ${confusions.mkString(", ")}")
    assert(acc >= 0.9, f"accuracy $acc%.3f below 0.9; confusions: ${confusions.mkString(", ")}")
  }

  test("the old stopword heuristic cannot do this (recorded for contrast)") {
    val old = fixtures.toDF("lang", "text")
      .withColumn("pred", TextOps.langIdPredict(col("text")))
      .select("lang", "pred").collect().map(r => (r.getString(0), r.getString(1)))
    val oldAcc = old.count { case (l, p) => l == p }.toDouble / old.length
    val newAcc = predicted.count { case (l, p) => l == p }.toDouble / predicted.length
    info(f"stopword heuristic: $oldAcc%.3f vs n-gram profiles: $newAcc%.3f")
    assert(newAcc > oldAcc)
  }

  test("degenerate inputs: empty and symbol-only text predict unk, never error") {
    val r = Seq("", "12345 67890", "!!! ??? ...").toDF("text")
      .select(TextOps.langIdNgramPredict(col("text"))).collect().map(_.getString(0))
    assert(r.forall(_ == "unk"), r.mkString(","))
  }
}
