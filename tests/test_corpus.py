"""End-to-end corpus preparation pipeline."""

from grafink_spark.llm.corpus import prepare_corpus


def test_prepare_corpus_stages(spark):
    rows = [
        # en, good quality, near-dup pair -> keep min id (1)
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        # exact duplicate of 1 -> dropped at stage 1
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        # fr, good quality
        (4, "le chat est sur la table et le chien est dans le jardin pour un moment"),
        # de -> dropped by lang filter (langs=en,fr)
        (5, "der hund ist ein guter freund und die katze ist auch nicht schlecht"),
        # junk: too few tokens -> quality drop
        (6, "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = prepare_corpus(df, langs=("en", "fr"), min_quality=0.75)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {1, 4}
    assert got[1].lang_pred == "en" and got[4].lang_pred == "fr"
    assert got[1].n_tokens == 12
    assert got[1].quality_score >= 0.75
