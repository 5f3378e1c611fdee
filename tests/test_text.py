"""Text-analysis edge cases the sf fixtures never exercise: the driver's
documents corpus has a 10-token minimum, so short documents (the ANSI
element_at out-of-bounds class) get their own planted parquet fixture,
checked with FULL Spark-vs-DuckDB parity, not just "doesn't crash".
"""

from __future__ import annotations

import pandas as pd
import pytest

from tdk_apache_log_etl_spark.operators import ORACLES, QUERIES

from .parity import compare


@pytest.fixture(scope="module")
def short_doc_dir(tmp_path_factory):
    texts = [
        "single",
        "two words",
        "now three tokens",
        "a a a",
        "w x y z w x y z",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("shortdocs")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "doc_repetition_scores",
        "text_quality_scores",
        "bpe_token_stats",
        "top_tokens_global",
    ],
)
def test_text_queries_short_doc_parity(spark, short_doc_dir, name):
    ok, detail = compare(spark, name, QUERIES[name], ORACLES[name], short_doc_dir)
    assert ok, f"{name} on short docs: {detail}"


@pytest.fixture(scope="module")
def noise_doc_dir(tmp_path_factory):
    # 20 clean docs sharing one common-trigram vocabulary, one planted
    # mojibake doc whose trigrams nothing else shares, one doc too short
    # to have any trigram (must be absent from the output entirely).
    clean = "the quick brown fox jumps over the lazy dog near the river"
    texts = [clean] * 20 + ["q7#xZ@9!vK%pW&mJ*rT^bN$yH", "ab"]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = tmp_path_factory.mktemp("noisedocs")
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def test_char_trigram_noise_flags_planted_mojibake(spark, noise_doc_dir):
    # Full cross-engine parity on the planted fixture first …
    ok, detail = compare(
        spark,
        "char_trigram_noise",
        QUERIES["char_trigram_noise"],
        ORACLES["char_trigram_noise"],
        noise_doc_dir,
    )
    assert ok, f"char_trigram_noise planted parity: {detail}"
    # … then the semantics: every trigram of the mojibake doc is unique
    # to it (df=1 < the df≥2 floor ⇒ rare), while clean docs are built
    # from trigrams all 20 share (df=20, common at any threshold).
    rows = {
        r["doc_id"]: r
        for r in QUERIES["char_trigram_noise"](spark, noise_doc_dir).collect()
    }
    assert 21 not in rows  # 2-char doc has no trigrams
    assert rows[20]["noisy"] and rows[20]["rare_frac"] == 1.0
    for i in range(20):
        assert not rows[i]["noisy"]
        assert rows[i]["rare_frac"] == 0.0


def test_corpus_coverage_hand_computed(spark, tmp_path):
    # Tokens: a a a b b c -> N=6, V=3, n1=1 (c), n2=1 (b);
    # missing mass = 1/6, Chao1 = 3 + 1*1/(2*1) = 3.5.
    pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a a a b", "b c"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [7, 3],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    [r] = QUERIES["corpus_coverage_estimates"](spark, str(tmp_path)).collect()
    assert (r.n_tokens, r.vocab_size, r.n_singletons, r.n_doubletons) == (
        6, 3, 1, 1,
    )
    assert r.missing_mass == 1.0 / 6
    assert r.chao1_vocab == 3.5
    ok, detail = compare(
        spark,
        "corpus_coverage_estimates",
        QUERIES["corpus_coverage_estimates"],
        ORACLES["corpus_coverage_estimates"],
        str(tmp_path),
    )
    assert ok, detail


def test_corpus_coverage_no_doubletons_null_chao1(spark, tmp_path):
    # every token unique -> n2=0: Chao1 must be NULL, not a div-by-zero
    pd.DataFrame(
        {
            "doc_id": [0],
            "text": ["p q r"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [5],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    [r] = QUERIES["corpus_coverage_estimates"](spark, str(tmp_path)).collect()
    assert r.chao1_vocab is None and r.missing_mass == 1.0
    ok, detail = compare(
        spark,
        "corpus_coverage_estimates",
        QUERIES["corpus_coverage_estimates"],
        ORACLES["corpus_coverage_estimates"],
        str(tmp_path),
    )
    assert ok, detail


def test_tf_cosine_planted_pair(spark, tmp_path):
    # docs 0/1 share rare tokens x,y with tf vectors (2,1) and (1,2):
    # cos = (2*1 + 1*2) / (sqrt(5)*sqrt(5)) = 0.8 exactly. 38 filler docs
    # of singleton junk tokens keep the df cap satisfied (df=2 needs
    # n_docs >= 40) while contributing no kept postings themselves.
    rows = [
        (0, "x x y", "en", "s", 5),
        (1, "x y y", "en", "s", 5),
    ] + [(i, f"junk{i}a junk{i}b", "en", "s", 12) for i in range(2, 40)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = QUERIES["doc_tf_cosine_pairs"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    [r] = out
    assert (r.doc_a, r.doc_b, r.dot_tf, r.cos_sim) == (0, 1, 4, 0.8)
    ok, detail = compare(
        spark,
        "doc_tf_cosine_pairs",
        QUERIES["doc_tf_cosine_pairs"],
        ORACLES["doc_tf_cosine_pairs"],
        str(tmp_path),
    )
    assert ok, detail


def test_tf_cosine_df_cap_drops_ubiquitous_token(spark, tmp_path):
    # The token "omni" appears in every doc: with df*20 > n_docs it is
    # excluded from the vector space, so the only similarity left between
    # docs 0/1 is via the rare shared token "r" — and docs 2..39, which
    # share ONLY "omni", produce no pair at all.
    rows = [
        (0, "omni r", "en", "s", 6),
        (1, "omni r", "en", "s", 6),
    ] + [(i, "omni", "en", "s", 4) for i in range(2, 40)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = QUERIES["doc_tf_cosine_pairs"](spark, str(tmp_path)).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(0, 1)]
    assert out[0].cos_sim == 1.0  # identical single-token rare vectors


def test_bigram_lm_planted_counts(spark, tmp_path):
    # "the cat" x5 in one doc: bigrams the->cat (5) and cat->the (4);
    # only the former clears the min count. V=2, c1(the)=5 ->
    # p = (5+1)/(5+2) = 6/7 exactly.
    text = " ".join(["the", "cat"] * 5)
    pd.DataFrame(
        [(0, text, "en", "s", len(text))],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    out = QUERIES["token_bigram_lm"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    [r] = out
    assert (r.w1, r.w2, r.c, r.c1) == ("the", "cat", 5, 5)
    assert r.p_smoothed == 6 / 7
    ok, detail = compare(
        spark,
        "token_bigram_lm",
        QUERIES["token_bigram_lm"],
        ORACLES["token_bigram_lm"],
        str(tmp_path),
    )
    assert ok, detail


def test_langid_confusion_planted(spark, tmp_path):
    # Doc 0: English markers, labeled en -> diagonal. Doc 1: English
    # markers but labeled fr -> off-diagonal (en predicted). Doc 2: no
    # markers at all, labeled en -> predicted 'de' never happens ('de'
    # wins 0-0 ties alphabetically per the declared tie-break).
    rows = [
        (0, "the cat of the house and a dog", "en", "s", 30),
        (1, "the the and of to", "fr", "s", 17),
        (2, "xyzzy plugh quux", "en", "s", 16),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        (r.true_lang, r.predicted_lang): (r.n_docs, r.cell_rate)
        for r in QUERIES["langid_confusion_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("fr", "en")] == (1, 1.0)
    assert out[("en", "en")][0] == 1
    # rates are per TRUE class: the two en-labeled docs split 0.5/0.5
    assert out[("en", "en")][1] == 0.5
    ok, detail = compare(
        spark,
        "langid_confusion_matrix",
        QUERIES["langid_confusion_matrix"],
        ORACLES["langid_confusion_matrix"],
        str(tmp_path),
    )
    assert ok, detail


def test_first_seen_curve_planted_decay(spark, tmp_path):
    # Docs 0-99 (bucket 0) introduce a,b; docs 100-199 (bucket 1) reuse
    # a,b and introduce c; bucket 2 introduces nothing new. New-token
    # counts decay 2,1,0 and the cumulative vocab is 2,3,3 — buckets
    # with zero new tokens are absent (no first-seen rows land there).
    rows = []
    for d in range(100):
        rows.append((d, "a b", "en", "s", 3))
    for d in range(100, 200):
        rows.append((d, "a b c", "en", "s", 5))
    for d in range(200, 300):
        rows.append((d, "c a", "en", "s", 3))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.doc_bucket: (r.n_new_tokens, r.cum_vocab)
        for r in QUERIES["token_first_seen_curve"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {0: (2, 2), 1: (1, 3)}
    ok, detail = compare(
        spark,
        "token_first_seen_curve",
        QUERIES["token_first_seen_curve"],
        ORACLES["token_first_seen_curve"],
        str(tmp_path),
    )
    assert ok, detail


def _surprisal_mirror(num: int, den: int) -> int:
    # pure-Python mirror of the E223 quarter-bit lattice
    m = max((num * 2_147_483_648) // den, 1)
    e = m.bit_length() - 1
    mm = m >> (e - 16) if e >= 16 else m << (16 - e)
    b1 = 1 if mm * mm >= 8_589_934_592 else 0
    mm2 = (mm * mm) >> (16 + b1)
    b2 = 1 if mm2 * mm2 >= 8_589_934_592 else 0
    return 4 * (31 - e) - (2 * b1 + b2)


def test_surprisal_lattice_accuracy_bound():
    # quarter-bit lattice: |qbits/4 - (-log2(num/den))| < 0.25 + 2^-14
    # for every probability down to the 2^-31 clip.
    import math
    import random

    rng = random.Random(42)
    for _ in range(2000):
        den = rng.randrange(1, 10**12)
        num = rng.randrange(1, den + 1)
        if num * 2_147_483_648 < den:
            continue  # clip region, checked separately
        qb = _surprisal_mirror(num, den)
        true_bits = -math.log2(num / den)
        assert abs(qb / 4.0 - true_bits) < 0.25 + 2 ** -14, (num, den)
    # clip region: p < 2^-31 -> capped at 31 bits (q = 124)
    assert _surprisal_mirror(1, 10**12) == 124


def test_doc_surprisal_planted(spark, tmp_path):
    # corpus: doc1 "a a a" (bigram (a,a) x2), doc2 "a b" ((a,b) x1)
    # model: c(a,a)=2, c(a,b)=1, c1(a)=3, V=2
    # p(a,a) = 3/5, p(a,b) = 2/5 -> doc2 is the more surprising doc
    docs = [(1, "a a a", "en", "s1"), (2, "a b", "en", "s1")]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.doc_id: r
        for r in QUERIES["doc_bigram_surprisal"](spark, str(tmp_path)).collect()
    }
    q_aa = _surprisal_mirror(3, 5)
    q_ab = _surprisal_mirror(2, 5)
    assert rows[1].n_bigrams == 2
    assert rows[1].surprisal_qbits == 2 * q_aa
    assert rows[2].surprisal_qbits == q_ab
    assert rows[2].bits_per_token > rows[1].bits_per_token
    ok, detail = compare(
        spark,
        "doc_bigram_surprisal",
        QUERIES["doc_bigram_surprisal"],
        ORACLES["doc_bigram_surprisal"],
        str(tmp_path),
    )
    assert ok, detail


# ---------------------------------------------------------------------------
# E237 RAKE keyphrases: hand-computed degree/frequency pin + chunk cap
# ---------------------------------------------------------------------------


def test_rake_hand_computed(spark, tmp_path):
    # stopwords include 'of' and 'and'. islands: [deep learning],
    # [deep systems], [learning]. freq deep=2 learning=2 systems=1;
    # deg deep=2+2=4, learning=2+1=3, systems=2; scores 2.0/1.5/2.0.
    # phrases: 'deep systems'=4.0 > 'deep learning'=3.5 > 'learning'=1.5
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["deep learning of deep systems and learning"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [43],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["rake_keyphrases"](spark, str(tmp_path)).collect()
    assert [(r.phrase, r.rake_score, r.n_occurrences) for r in rows] == [
        ("deep systems", 4.0, 1),
        ("deep learning", 3.5, 1),
        ("learning", 1.5, 1),
    ]
    ok, detail = compare(
        spark,
        "rake_keyphrases",
        QUERIES["rake_keyphrases"],
        ORACLES["rake_keyphrases"],
        str(tmp_path),
    )
    assert ok, detail


def test_rake_caps_runaway_islands(spark, tmp_path):
    # six consecutive non-stopwords -> chunks of 4 + 2, never one
    # 6-word phrase
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["alpha beta gamma delta epsilon zeta"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [35],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["rake_keyphrases"](spark, str(tmp_path)).collect()
    phrases = {r.phrase: r.n_words for r in rows}
    assert phrases == {"alpha beta gamma delta": 4, "epsilon zeta": 2}
    ok, detail = compare(
        spark,
        "rake_keyphrases",
        QUERIES["rake_keyphrases"],
        ORACLES["rake_keyphrases"],
        str(tmp_path),
    )
    assert ok, detail
