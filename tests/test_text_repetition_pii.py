"""Unit tests for intra-document repetition signals, consecutive-line
collapse, top-token stats, and PII scrub (operators/text.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from jsons_to_schema_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta\nalpha beta\ngamma\nalpha beta"),  # consec dup + far dup
        (2, "one line only"),
        (3, ""),  # no lines at all
        (4, "x\n\n\nx"),  # empty lines dropped, then consecutive dup
        (5, "a\nb\nc"),  # no dups
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_features(spark, docs):
    out = {r.doc_id: r for r in text.repetition_features(docs, "text", "doc_id").collect()}
    r1 = out[1]
    assert r1.n_lines == 4 and r1.n_dup_lines == 2
    # line chars: 3*len('alpha beta') + len('gamma'); distinct: one of each
    tot = 3 * 10 + 5
    assert r1.dup_line_char_frac == round((tot - 15) / tot, 6)
    # consecutive collapse removes exactly the second 'alpha beta'
    assert r1.n_consecutive_removed == 1
    assert r1.fp_line_dedup == hashlib.md5(b"alpha beta\ngamma\nalpha beta").hexdigest()

    assert out[2].n_lines == 1 and out[2].n_dup_lines == 0
    assert out[2].dup_line_char_frac == 0.0

    r3 = out[3]
    assert r3.n_lines == 0 and r3.n_dup_lines == 0 and r3.n_consecutive_removed == 0
    assert r3.fp_line_dedup == hashlib.md5(b"").hexdigest()

    r4 = out[4]  # empties removed FIRST, so the two x lines become consecutive
    assert r4.n_lines == 2 and r4.n_dup_lines == 1 and r4.n_consecutive_removed == 1

    assert out[5].n_dup_lines == 0 and out[5].n_consecutive_removed == 0


def test_top_token_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a c a"),  # clear winner a (3/5)
            (2, "z y z y"),  # tie 2-2 -> lexicographically greatest token: z
            (3, ""),  # zero tokens -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.top_token_stats(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2}
    assert out[1].top_token == "a" and out[1].top_token_count == 3
    assert out[1].top_token_frac == 0.6
    assert out[2].top_token == "z" and out[2].top_token_frac == 0.5


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.io now"),
            (2, "srv 192.168.0.17 and 10.0.0.1 up"),
            (3, "call 555-123-4567 today"),
            (4, "none here"),
            (5, "a@b.co at 1.2.3.4 tel 555-000-1111"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.pii_scrub(df, "text", "doc_id").collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 0, 0)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 2, 0)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 1)
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)
    assert (out[5].n_email, out[5].n_ipv4, out[5].n_phone) == (1, 1, 1)

    red = {
        r.doc_id: r.red
        for r in df.select("doc_id", text.redact_pii("text").alias("red")).collect()
    }
    assert red[1] == "mail <EMAIL> now"
    assert red[2] == "srv <IPV4> and <IPV4> up"
    assert red[3] == "call <PHONE> today"
    assert red[4] == "none here"
    assert red[5] == "<EMAIL> at <IPV4> tel <PHONE>"
    # redaction is a fixpoint: tags contain no PII shapes
    again = (
        spark.createDataFrame([(k, v) for k, v in red.items()], "doc_id long, text string")
        .select("doc_id", text.redact_pii("text").alias("red"))
        .collect()
    )
    assert {r.doc_id: r.red for r in again} == red


def test_repetition_is_narrow_and_jvm_side(spark, docs):
    """Higher-order array functions drop out of whole-stage codegen (they
    are CodegenFallback), but the plan must stay a narrow JVM projection:
    no shuffle, no Python workers."""
    plan = (
        text.repetition_features(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # narrow projection: no shuffle
    assert "EvalPython" not in plan  # no Python in the hot path


def test_top_token_is_two_stage_aggregate(spark, docs):
    plan = (
        text.top_token_stats(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial+final pairs around each exchange (map-side combine); the
    # max(struct) stage compiles to SortAggregate (structs aren't
    # hash-aggregable), the count stage to HashAggregate
    assert plan.count("Aggregate") >= 4
    assert "partial_max" in plan and "partial_count" in plan


def test_curation_repetition_gate_and_transforms(spark):
    from jsons_to_schema_spark.operators.curate import curate_documents

    en = "the cat and the dog of the house went to the market for the day"
    rows = [
        (1, "boiler\nboiler\nboiler\nboiler\n" + en),  # high dup-line frac
        (2, en + "\nfoot\nfoot\nmail a@b.co end"),     # survives; collapse+scrub
        (3, "too short"),                               # quality gate
        (4, en + "\nfoot\nfoot\nmail a@b.co end"),     # exact dup of 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = curate_documents(
        df, "text", "doc_id", min_tokens=5, allowed_langs=["en"],
        max_dup_line_frac=0.15, collapse_repeated_lines=True, scrub_pii=True,
    ).collect()
    assert [r.doc_id for r in kept] == [2]
    assert kept[0].text == en + "\nfoot\nmail <EMAIL> end"


def test_top_ngram_stats_bigrams(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b c"),   # bigrams: ab, ba, ab, bc -> 'a b' x2 of 4
            (2, "one"),         # < 2 tokens -> absent
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.top_ngram_stats(df, "text", "doc_id", n=2).collect()}
    assert set(out) == {1}
    assert out[1].top_token == "a b" and out[1].top_token_count == 2
    assert out[1].top_token_frac == 0.5


def test_corpus_line_dedup(spark):
    boiler = "visit our amazing website now"
    rows = [
        (1, boiler + "\nunique one here"),
        (2, boiler + "\nanother body line"),
        (3, boiler + "\nthird unique content"),
        (4, "no boiler at all\nshort"),       # 'short' < 10 chars: never removed
        (5, boiler),                           # becomes empty after removal
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.corpus_line_dedup(
        df, "text", "doc_id", min_doc_freq=3, min_line_chars=10
    ).collect()}
    assert out[1].text_dedup == "unique one here"
    assert out[1].n_lines == 2 and out[1].n_removed_lines == 1
    assert out[2].text_dedup == "another body line"
    assert out[4].text_dedup == "no boiler at all\nshort"
    assert out[4].n_removed_lines == 0
    assert out[5].text_dedup == "" and out[5].n_removed_lines == 1


def test_c4_clean_line_and_doc_rules(spark):
    from jsons_to_schema_spark.operators import text as T

    good = "Here is a perfectly ordinary sentence."
    docs = [
        # kept: 3 qualifying lines
        (1, good + "\nAnother proper sentence sits right here.\n"
            "A third complete sentence finishes things off."),
        # line drops: no terminal punct / too few words / javascript
        (2, good + "\nno terminal punctuation here\nToo few.\n"
            "Please enable javascript to continue browsing now.\n"
            "Second proper sentence stays in the document.\n"
            "Third proper sentence stays in the document too."),
        # doc drops
        (3, good + "\nlorem ipsum dolor sit amet consectetur adipiscing."),
        (4, good + "\nfunction f() { return 1; } is code."),
        (5, "Only one good line survives in this page."),
        (6, None),
    ]
    df = spark.createDataFrame(docs, "id long, t string")
    out = {r.id: r for r in T.c4_clean(df, "id", "t").collect()}
    assert out[1].doc_kept and out[1].n_kept_lines == 3
    assert out[1].clean_text.count("\n") == 2
    r2 = out[2]
    assert (r2.n_lines, r2.n_kept_lines) == (6, 3)
    assert r2.doc_kept and "javascript" not in r2.clean_text
    assert (out[3].doc_kept, out[3].drop_reason) == (False, "lorem_ipsum")
    assert (out[4].doc_kept, out[4].drop_reason) == (False, "brace")
    assert (out[5].doc_kept, out[5].drop_reason) == (False, "too_few_lines")
    assert (out[6].n_lines, out[6].drop_reason) == (0, "too_few_lines")
    assert out[3].clean_text is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="thresholds"):
        T.c4_clean(df, "id", "t", min_words_per_line=0)


def test_c4_clean_whitespace_word_count_parity(spark):
    from jsons_to_schema_spark.operators import text as T

    # leading/trailing/multiple whitespace must not inflate word counts
    df = spark.createDataFrame(
        [(1, "   one  two\tthree   four five.   \n"
             "Second proper sentence sits right here.\n"
             "Third proper sentence finishes the page.")],
        "id long, t string",
    )
    r = T.c4_clean(df, "id", "t").collect()[0]
    assert r.n_kept_lines == 3  # 5 words exactly after trim/collapse
    assert r.clean_text.startswith("one  two")


def test_gopher_quality_filter_rule_arms(spark):
    from jsons_to_schema_spark.operators import text as T

    good_words = ("the cat and the dog have fun with that ball of yarn "
                  "to be sure " * 5)  # 65 words, stop words present
    docs = [
        (1, good_words),                                    # keep
        (2, "short doc with few words."),                   # word_count
        (3, " ".join(["a"] * 60)),                          # mean_word_length (1.0)
        (4, good_words + " " + "#" * 1 + " #### ## # " * 3),  # symbol_ratio
        (5, "\n".join(["- bullet item number %d listed" % i for i in range(20)])
            + "\nplain trailing sentence words here"),      # bullet_lines
        (6, good_words.replace(" ", "... ", 25)),           # ellipsis? words keep alpha
        (7, " ".join(["123456"] * 60)),                     # alpha_words (digits)
        (8, " ".join(["giraffe elephant zebra lion tiger"] * 13)),  # stop_words
        (9, None),                                          # NULL -> word_count
    ]
    df = spark.createDataFrame(docs, "id long, t string")
    out = {r.id: r for r in T.gopher_quality_filter(df, "id", "t").collect()}
    assert out[1].keep and out[1].drop_reason is None
    assert out[1].n_stop_hits >= 2
    assert out[2].drop_reason == "word_count"
    assert out[3].drop_reason == "mean_word_length"
    assert out[4].drop_reason == "symbol_ratio"
    assert out[7].drop_reason == "alpha_words"
    assert out[8].drop_reason == "stop_words"
    assert out[9].drop_reason == "word_count" and out[9].n_words == 0
    # doc 5: 20 of 21 lines are bullets (0.952 > 0.9) but word_count fires
    # first if < 50 words — it has 80 words, so bullet_lines is the verdict
    assert out[5].drop_reason == "bullet_lines"
    # doc 6: 25 ellipsis insertions inside ONE line -> line fraction is 0;
    # the '...' tokens raise the symbol ratio instead
    assert out[6].drop_reason == "symbol_ratio"


def test_gopher_ellipsis_lines_arm(spark):
    from jsons_to_schema_spark.operators import text as T

    body = "the cat and the dog have fun with that ball here now "
    lines = [body + "more words..." for _ in range(4)] + [body + "clean tail"]
    df = spark.createDataFrame([(1, "\n".join(lines))], "id long, t string")
    r = T.gopher_quality_filter(df, "id", "t").collect()[0]
    assert r.frac_ellipsis_lines == 0.8
    assert r.drop_reason == "ellipsis_lines"


def test_excise_repeated_spans_geometry(spark):
    """Shared 5-token spans excise with island merging; unique content and
    clean docs survive; the rebuild normalization is single-space."""
    from jsons_to_schema_spark.operators.text import excise_repeated_spans

    shared = "alpha beta gamma delta epsilon"          # 5 tokens, in 2 docs
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} zz yy xx ww vv"),
        (3, "totally unique words only here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r
        for r in excise_repeated_spans(df, "text", "doc_id", window=5).collect()
    }
    assert out[1].text == "one two three four"
    assert out[1].n_tokens_removed == 5 and out[1].n_spans_excised == 1
    assert out[2].text == "zz yy xx ww vv"
    assert out[3].text == "totally unique words only here now"
    assert out[3].n_tokens_removed == 0 and out[3].n_spans_excised == 0


def test_excise_repeated_spans_overlap_merge_and_invariance(spark):
    """Overlapping hot windows merge into ONE excised range (no double
    counting), and the result is partition-invariant."""
    from jsons_to_schema_spark.operators.text import excise_repeated_spans

    # 7 shared tokens -> three overlapping hot 5-windows in both docs;
    # they must merge to one 7-token range
    shared = "a1 a2 a3 a4 a5 a6 a7"
    rows = [
        (1, f"pre {shared} post"),
        (2, f"{shared} tail1 tail2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: r
        for r in excise_repeated_spans(df, "text", "doc_id", window=5).collect()
    }
    assert out[1].text == "pre post"
    assert out[1].n_tokens_removed == 7 and out[1].n_spans_excised == 1
    a = excise_repeated_spans(df, "text", "doc_id", window=5).collect()
    b = excise_repeated_spans(
        df.repartition(6), "text", "doc_id", window=5
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
