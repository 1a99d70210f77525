"""Hand-computed tests for the corpus-curation operators added in round
5: unigram LM scoring, quality-aware cluster representatives, domain
mixing, and sequence packing."""

import hashlib
import math

from feature_engineering_spark.operators.graph import cluster_representatives
from feature_engineering_spark.operators.lm_score import filter_by_nll, unigram_nll
from feature_engineering_spark.operators.packing import pack_chunks
from feature_engineering_spark.operators.split import domain_mix_sample


def _bucket(salt: str, key: int, mod: int = 1_000_000) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:15], 16) % mod


def test_unigram_nll_hand(spark):
    # corpus tokens: a:2 b:2 c:1 -> T=5, V=3, denominator 8
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
    # doc1: every token has p=3/8 -> nll = ln(8/3)
    exp1 = -math.log(3.0 / 8.0)
    # doc2: -(ln(3/8) + ln(2/8)) / 2
    exp2 = -(math.log(3.0 / 8.0) + math.log(2.0 / 8.0)) / 2.0
    assert got[1]["n_tok"] == 3 and got[2]["n_tok"] == 2
    assert abs(got[1]["avg_nll"] - round(exp1, 6)) < 1e-12
    assert abs(got[2]["avg_nll"] - round(exp2, 6)) < 1e-12
    assert got[2]["avg_nll"] > got[1]["avg_nll"]  # rarer tokens score worse

    kept = [r["doc_id"] for r in filter_by_nll(docs, max_nll=exp1 + 1e-6).collect()]
    assert kept == [1]

    # separate reference LM: doc term unseen in reference -> p = 1/(T+V)
    ref = spark.createDataFrame([(9, "a a a")], "doc_id long, text string")
    r = unigram_nll(docs.where("doc_id = 2"), reference=ref).collect()[0]
    # ref: a:3 -> T=3, V=1, denom 4; b and c unseen: p = 1/4 each
    assert abs(r["avg_nll"] - round(-math.log(1.0 / 4.0), 6)) < 1e-12


def test_unigram_nll_self_scoring_equals_explicit_reference(spark):
    """r6: self-scoring derives the LM counts from the tf roll-up instead
    of a second tokenization pass — must be value-identical to passing the
    corpus as an explicit reference (which still takes the two-pass path)."""
    docs = spark.createDataFrame(
        [(1, "a a b x"), (2, "b c c"), (3, "d"), (4, "a b c d e e")],
        "doc_id long, text string",
    )
    self_scored = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
    two_pass = {
        r["doc_id"]: r for r in unigram_nll(docs, reference=docs).collect()
    }
    assert set(self_scored) == set(two_pass)
    for k in self_scored:
        assert self_scored[k]["n_tok"] == two_pass[k]["n_tok"]
        assert self_scored[k]["avg_nll"] == two_pass[k]["avg_nll"]


def test_cluster_representatives_hand(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
        "doc_id long, canonical_id long",
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 7), (4, 7), (5, 2)], "doc_id long, q long"
    )
    got = {
        r["canonical_id"]: r
        for r in cluster_representatives(clusters, docs, "q").collect()
    }
    assert got[1]["rep_doc_id"] == 2 and got[1]["rep_quality"] == 9
    assert got[1]["n_members"] == 2
    # tie on q=7 -> smallest doc id wins
    assert got[3]["rep_doc_id"] == 3 and got[3]["n_members"] == 2
    assert got[5]["rep_doc_id"] == 5 and got[5]["n_members"] == 1


def test_domain_mix_sample_hand(spark):
    # en:40 rows, de:10 rows; targets en .5 / de .5
    # S = min(40/.5, 10/.5) = 20 -> en rate .25, de rate 1.0 (exact FP)
    rows = [(i, "en") for i in range(40)] + [(100 + i, "de") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = domain_mix_sample(df, {"en": 0.5, "de": 0.5}, domain_col="lang")
    got = sorted((r["doc_id"], r["lang"]) for r in out.collect())
    exp_en = [(i, "en") for i in range(40) if _bucket("mix0", i) < 250_000]
    exp_de = [(100 + i, "de") for i in range(10)]  # rate exactly 1.0
    assert got == sorted(exp_en + exp_de)

    # determinism + domains outside the weight dict are dropped
    again = sorted((r["doc_id"], r["lang"]) for r in out.collect())
    assert again == got
    out2 = domain_mix_sample(df, {"de": 1.0}, domain_col="lang")
    assert sorted(r["doc_id"] for r in out2.collect()) == [100 + i for i in range(10)]


def test_pack_chunks_hand(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 5))) for i in range(50)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pack_chunks(docs, max_tokens=10, n_shards=4).collect()}

    # replicate: order docs per shard by (md5 60-bit value, id), cumsum
    per_shard: dict[int, list[tuple[int, int]]] = {}
    for i in range(50):
        hv = int(hashlib.md5(f"pack0:{i}".encode()).hexdigest()[:15], 16)
        per_shard.setdefault(hv % 4, []).append((hv, i))
    for shard, members in per_shard.items():
        cum = 0
        for hv, i in sorted(members):
            n_tok = 3 + i % 5
            r = got[i]
            assert r["shard"] == shard
            assert r["n_tok"] == n_tok
            assert r["chunk_id"] == shard * 2**32 + cum // 10
            assert r["chunk_offset"] == cum % 10
            cum += n_tok
    assert len(got) == 50
