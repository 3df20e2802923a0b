"""Late-r10 langid tier: da/no/fi/cs/ro/hu appended to the base
stopword table — same contract as the nl/sv/pl/tr/id/vi extension
(one bitmask bit each on the existing token probe, ascii-pure lists,
every prior tie-break preserved). da vs no separates on the spelling
axis (hvad/efter/nogle vs hva/etter/noen) the way real classifiers
distinguish the pair.
"""
import re

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


FIXTURES = {
    "da": "hvad skal jeg med nogle af dem hvis det ikke bliver meget",
    "no": "hva noe dette bare alle sammen uten noen mellom andre etter ble",
    "fi": "ja se on mutta kun niin joka jos vain kaikki voi nyt",
    "cs": "jsem jsou je pro jako byl kdo mezi bez pod nebo tento",
    "ro": "este sunt pentru care din mai pe cu dar cum acest unde",
    "hu": "nem hogy egy csak azt volt van mint mert vagy minden lehet",
}


class TestSecondCrawlTier:
    def test_new_languages_argmax(self, spark):
        from aggo_spark.operators import text

        rows = [(i, t) for i, t in enumerate(FIXTURES.values())]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [r["pred_lang"] for r in
               text.language_id_table(df).orderBy("doc_id").collect()]
        assert got == list(FIXTURES)

    def test_danish_norwegian_separate(self, spark):
        # the famously-close pair: spelling-axis discriminators decide
        from aggo_spark.operators import text

        df = spark.createDataFrame(
            [(1, "hvad sker der efter at nogle af dem ikke kan"),
             (2, "hva skjer etter at noen av dem ble med inn")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(df).collect()}
        assert got[1] == "da" and got[2] == "no"

    def test_prior_tier_preserved(self, spark):
        from aggo_spark.operators import text

        rows = [
            (1, "the cat and the dog are in the house"),
            (2, "het is een goed boek en ook niet te duur voor de mensen"),
            (3, "det var en bok som har och att den inte kan om man vid"),
            (4, "bu bir kitap ve daha ne gibi ama her sonra kadar olan"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(df).collect()}
        assert got == {1: "en", 2: "nl", 3: "sv", 4: "tr"}

    def test_lists_ascii_pure(self):
        from aggo_spark.operators.text import LANG_STOPWORDS

        for lang in ("da", "no", "fi", "cs", "ro", "hu"):
            for w in LANG_STOPWORDS[lang]:
                assert re.fullmatch(r"[a-z0-9]+", w), (lang, w)
