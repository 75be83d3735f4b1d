"""Tiny embedded per-language seed corpora for deterministic kernel fitting.

The sandbox has no network (no fastText/KenLM model downloads — SURVEY §0),
so the langid and perplexity kernels are *fitted* from these embedded
samples at import time: pure data, written for this repo, a few hundred
words per language. Real deployments swap in Wikipedia/CC samples through
the same fitting functions.
"""

SEED_CORPORA: dict[str, str] = {
    "en": (
        "The quick brown fox jumps over the lazy dog while the morning sun "
        "rises over the quiet village. Every day the people walk to the "
        "market to buy bread, cheese, and fresh fruit from the farmers. "
        "Science and technology have changed the way we live and work, and "
        "the internet connects people across the entire world. Children "
        "learn to read and write in school, and teachers help them discover "
        "the history of their country. The weather in autumn is often cold "
        "and wet, but the forests turn beautiful shades of red and gold. "
        "Music brings people together, and stories told around the fire "
        "have always been part of human culture. The government announced "
        "new plans to improve public transport in the capital city next "
        "year. Many families enjoy spending their holidays near the sea, "
        "where they can swim and rest on the warm sand."
    ),
    "de": (
        "Der schnelle braune Fuchs springt über den faulen Hund, während "
        "die Morgensonne über dem stillen Dorf aufgeht. Jeden Tag gehen die "
        "Menschen zum Markt, um Brot, Käse und frisches Obst von den Bauern "
        "zu kaufen. Wissenschaft und Technik haben die Art verändert, wie "
        "wir leben und arbeiten, und das Internet verbindet Menschen auf "
        "der ganzen Welt. Kinder lernen in der Schule lesen und schreiben, "
        "und die Lehrer helfen ihnen, die Geschichte ihres Landes zu "
        "entdecken. Das Wetter im Herbst ist oft kalt und nass, aber die "
        "Wälder färben sich wunderschön rot und golden. Die Regierung "
        "kündigte neue Pläne an, um den öffentlichen Verkehr in der "
        "Hauptstadt im nächsten Jahr zu verbessern. Viele Familien "
        "verbringen ihren Urlaub gern am Meer, wo sie schwimmen und sich "
        "im warmen Sand erholen können."
    ),
    "es": (
        "El rápido zorro marrón salta sobre el perro perezoso mientras el "
        "sol de la mañana se levanta sobre el pueblo tranquilo. Cada día la "
        "gente camina al mercado para comprar pan, queso y fruta fresca de "
        "los agricultores. La ciencia y la tecnología han cambiado la forma "
        "en que vivimos y trabajamos, y el internet conecta a las personas "
        "de todo el mundo. Los niños aprenden a leer y escribir en la "
        "escuela, y los maestros les ayudan a descubrir la historia de su "
        "país. El tiempo en otoño es a menudo frío y húmedo, pero los "
        "bosques se vuelven de hermosos tonos rojos y dorados. El gobierno "
        "anunció nuevos planes para mejorar el transporte público en la "
        "capital el próximo año. Muchas familias disfrutan de pasar sus "
        "vacaciones cerca del mar, donde pueden nadar y descansar sobre la "
        "arena cálida."
    ),
    "fr": (
        "Le rapide renard brun saute par-dessus le chien paresseux pendant "
        "que le soleil du matin se lève sur le village tranquille. Chaque "
        "jour, les gens marchent au marché pour acheter du pain, du fromage "
        "et des fruits frais chez les fermiers. La science et la "
        "technologie ont changé notre façon de vivre et de travailler, et "
        "l'internet relie les personnes du monde entier. Les enfants "
        "apprennent à lire et à écrire à l'école, et les professeurs les "
        "aident à découvrir l'histoire de leur pays. Le temps en automne "
        "est souvent froid et humide, mais les forêts prennent de belles "
        "couleurs rouges et dorées. Le gouvernement a annoncé de nouveaux "
        "projets pour améliorer les transports publics dans la capitale "
        "l'année prochaine. Beaucoup de familles aiment passer leurs "
        "vacances près de la mer, où elles peuvent nager et se reposer sur "
        "le sable chaud."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过懒惰的狗，清晨的太阳在安静的村庄上升起。"
        "每天人们走到市场去买面包、奶酪和农民的新鲜水果。"
        "科学和技术改变了我们生活和工作的方式，互联网把全世界的人连接在一起。"
        "孩子们在学校学习读书和写字，老师帮助他们了解自己国家的历史。"
        "秋天的天气常常又冷又湿，但是森林变成美丽的红色和金色。"
        "政府宣布了新的计划，要在明年改善首都的公共交通。"
        "许多家庭喜欢在海边度假，他们可以游泳，也可以在温暖的沙滩上休息。"
        "音乐把人们聚在一起，围着火讲故事一直是人类文化的一部分。"
    ),
}
