"""Randomized differential test for ``repeated_passages``: the Spark
operator vs a brute-force word-tuple oracle on small synthetic corpora.

The driver oracle (`q_repeated_passages`) pins ONE injected constant
passage; this suite covers the general contract — arbitrary overlapping
repeats, within-doc repetition, run collapsing, the ``max_gram_df``
cap — by enumerating every window tuple in plain Python. Window
equality in the operator is 64-bit-hash equality; with an 8-word vocab
and a few hundred windows the collision odds are ~2⁻⁵⁰ per corpus, so
tuple equality is the correct reference."""

import random
from collections import defaultdict

import pytest

from sketchlib.spark.dedup import repeated_passages


def _brute(docs, window_words, min_docs, max_gram_df):
    """All maximal repeated spans, by literal word-tuple enumeration."""
    win_docs = defaultdict(set)  # tuple -> distinct doc ids
    win_count = defaultdict(int)  # tuple -> total occurrences (gram_df)
    pos_map = {}
    for did, text in docs:
        words = text.split()
        lst = []
        for p in range(len(words) - window_words + 1):
            t = tuple(words[p : p + window_words])
            win_docs[t].add(did)
            win_count[t] += 1
            lst.append((p, t))
        pos_map[did] = lst
    keep = {
        t
        for t in win_docs
        if len(win_docs[t]) >= min_docs
        and (max_gram_df is None or win_count[t] <= max_gram_df)
    }
    spans = []
    for did, lst in pos_map.items():
        hit = sorted(p for p, t in lst if t in keep)
        i = 0
        while i < len(hit):
            j = i
            while j + 1 < len(hit) and hit[j + 1] == hit[j] + 1:
                j += 1
            spans.append((did, hit[i], hit[j] + window_words - 1, j - i + 1))
            i = j + 1
    return sorted(spans)


def _spark_spans(spark, docs, window_words, min_docs, max_gram_df):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = repeated_passages(
        df,
        text_col="text",
        id_col="doc_id",
        window_words=window_words,
        min_docs=min_docs,
        max_gram_df=max_gram_df,
    )
    return sorted(
        (r.doc_id, r.start_word, r.end_word, r.n_windows) for r in out.collect()
    )


def _corpus(rng, n_docs, vocab, max_len):
    """Random docs over a tiny vocab (dense window collisions), with a
    few doc-to-doc copied tails so long shared runs exist too."""
    docs = []
    for i in range(n_docs):
        n = rng.randint(0, max_len)
        words = [rng.choice(vocab) for _ in range(n)]
        docs.append([f"d{i}", " ".join(words)])
    # copy a random slice of one doc into another (shared passage)
    for _ in range(max(1, n_docs // 6)):
        src, dst = rng.sample(range(n_docs), 2)
        sw = docs[src][1].split()
        if len(sw) >= 4:
            a = rng.randint(0, len(sw) - 4)
            b = rng.randint(a + 3, len(sw) - 1)
            docs[dst][1] = docs[dst][1] + " " + " ".join(sw[a : b + 1])
    return [tuple(d) for d in docs]


SCENARIOS = [
    # (seed, n_docs, vocab_size, max_len, window_words, min_docs, max_gram_df)
    (11, 24, 4, 24, 2, 2, None),
    (12, 30, 6, 30, 3, 2, None),
    (13, 18, 3, 20, 2, 3, None),  # tiny vocab: dense within-doc repeats
    (14, 40, 8, 36, 5, 2, None),  # longer windows, sparser hits
    (15, 24, 4, 24, 2, 2, 6),  # df cap engages on hot grams
    (16, 20, 5, 12, 5, 2, None),  # many docs shorter than the window
]


@pytest.mark.parametrize(
    "seed,n_docs,vsize,max_len,window_words,min_docs,max_gram_df", SCENARIOS
)
def test_repeated_passages_equals_brute_force(
    spark, seed, n_docs, vsize, max_len, window_words, min_docs, max_gram_df
):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vsize)]
    docs = _corpus(rng, n_docs, vocab, max_len)
    want = _brute(docs, window_words, min_docs, max_gram_df)
    got = _spark_spans(spark, docs, window_words, min_docs, max_gram_df)
    assert got == want


def test_repeated_passages_empty_and_whitespace_docs(spark):
    """Degenerate rows must emit nothing and crash nothing."""
    docs = [
        ("a", ""),
        ("b", "   "),
        ("c", "x y z x y z"),
        ("d", "x y z q"),
    ]
    got = _spark_spans(spark, docs, 3, 2, None)
    # "x y z" appears in c (twice, pos 0 and 3) and d (pos 0)
    assert got == [("c", 0, 2, 1), ("c", 3, 5, 1), ("d", 0, 2, 1)]


def test_repeated_passages_plan_no_self_join(spark, monkeypatch):
    """Pin the scale shape structurally (SURVEY: 'NO self-join anywhere
    — everything that shuffles is (8 B hash, id, pos)'): the executed
    plan must contain no cartesian/nested-loop join and every Join
    must be the one LeftSemi of gram rows against the kept gram keys.
    materialize() is patched to identity because the production path
    eagerly localCheckpoints (which would hide the join shape)."""
    from sketchlib.spark import dedup

    monkeypatch.setattr(dedup, "materialize", lambda df, _dir=None: df)
    docs = spark.createDataFrame(
        [(f"d{i}", "a b c d e f g h i j") for i in range(12)],
        "doc_id string, text string",
    )
    out = dedup.repeated_passages(docs, window_words=3, min_docs=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE: final section first
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoopJoin" not in final
    joins = [ln for ln in final.splitlines() if "Join" in ln]
    assert joins, final  # the semi-join is there...
    for ln in joins:
        assert "LeftSemi" in ln, ln  # ...and nothing else joins
