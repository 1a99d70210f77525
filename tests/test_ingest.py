"""Continuous-ingest dedup job (jobs/ingest_increment.py): every drop
path exercised, corpus accounting exact, resume replays nothing."""

from __future__ import annotations


def _strip_reasons(stats: dict) -> dict:
    """Drop the keys only derivable on a FRESH run (drop reasons + cap
    audits) so fresh-vs-resume stats can be compared."""
    out = dict(stats, batches=[
        {k: v for k, v in b.items()
         if k in ("batch", "arrivals", "survivors", "dropped_total")}
        for b in stats["batches"]
    ])
    return out


def test_ingest_increment_end_to_end(spark, tmp_path):
    from jobs.ingest_increment import run

    root = str(tmp_path / "ingest")
    stats = run(spark, root, n_rows=3000, n_batches=2)

    assert stats["corpus_initial"] > 0
    assert len(stats["batches"]) == 2
    for b in stats["batches"]:
        # planted exact/near copies of committed rows must be caught via
        # the index probe, planted in-batch copies via the self-join
        assert b["dropped_vs_corpus"] > 0, b
        assert b["dropped_in_batch"] > 0, b
        assert b["dropped_total"] >= b["dropped_vs_corpus"] + b["dropped_in_batch"] - 1
        assert 0 < b["survivors"] < b["arrivals"]
        # no-silent-caps: cap audits for BOTH signals are emitted on
        # fresh runs
        assert "lsh_batch_dropped_buckets" in b
        assert "lsh_index_hit_dropped_buckets" in b
        assert "lsh_embed_batch_dropped_buckets" in b
        assert "lsh_embed_index_hit_dropped_buckets" in b
        # planted paraphrase dups (MinHash-blind) flow through the SRP
        # index probe
        assert b["pairs_embed"] > 0, b
        # planted scraper boilerplate crossed the cumulative line-count
        # threshold and was stripped before signing
        assert b["boiler_lines_removed"] > 0, b
        # planted quote docs (corpus text inside fresh soup) pass BOTH
        # dedup signals by construction and surface as CROSS pairs in
        # the winnow partial-overlap report
        assert b["overlap_pairs_cross"] > 0, b
        assert b["overlap_pairs"] >= b["overlap_pairs_cross"], b
        # ...and the excision stage removed their quoted runs
        assert b["tokens_trimmed"] > 0, b
    # the committed cleaned tables carry no exact boilerplate line
    # anywhere (the ' qq'-mutated variant is a DIFFERENT line and may
    # legitimately sit under the count threshold)
    from pyspark.sql import functions as F

    from jobs.ingest_increment import BOILER

    for k in (1, 2):
        cleaned = spark.read.parquet(f"{root}/cleaned_{k:03d}")
        assert cleaned.where(
            F.array_contains(F.split("text", "\n"), BOILER)
        ).count() == 0
    # the publish view covers every survivor; every flagged doc with at
    # least one UNFLAGGED partner lost >= k tokens (a shared winnow
    # fingerprint IS a shared k-gram, so excision against a real partner
    # is never vacuous), and NO flagged doc was fully self-excised while
    # keeping tokens to lose (r6 advice fix: a doc in both pair roles is
    # excluded from the partner set, so a chain A<B<C no longer destroys
    # B's entire text; members of all-flagged partner sets may now
    # legitimately lose 0 tokens)
    for k in (1, 2):
        surv_n = spark.read.parquet(f"{root}/survivors_{k:03d}").count()
        trimmed = spark.read.parquet(f"{root}/trimmed_{k:03d}")
        assert trimmed.count() == surv_n
        pairs = spark.read.parquet(f"{root}/overlap_{k:03d}")
        b_ids = pairs.select(F.col("b").alias("doc_id")).distinct()
        true_partner_pairs = pairs.join(
            b_ids.withColumnRenamed("doc_id", "a"), "a", "left_anti"
        )
        flagged_with_partner = trimmed.join(
            true_partner_pairs.select(F.col("b").alias("doc_id")).distinct(),
            "doc_id",
        )
        assert flagged_with_partner.count() > 0
        assert (
            flagged_with_partner.where(F.col("n_tokens_removed") < 5).count()
            == 0
        )
    # corpus accounting is exact: initial + all survivors
    assert stats["corpus_final"] == stats["corpus_initial"] + sum(
        b["survivors"] for b in stats["batches"]
    )

    # resume: a second run over the same root loads every committed stage
    # (counts identical; drop reasons are only derivable on a fresh run)
    again = run(spark, root, n_rows=3000, n_batches=2)
    assert _strip_reasons(again) == _strip_reasons(stats)


def test_ingest_batch2_sees_batch1_survivors(spark, tmp_path):
    """A doc arriving in batch 2 that duplicates a batch-1 SURVIVOR (not
    the initial corpus) must be dropped as corpus_dup — the index grows
    with every committed batch."""
    import pandas as pd
    from pyspark.sql import functions as F

    from feature_engineering_spark.operators.dedup import minhash_banded
    from jobs.ingest_increment import dedup_batch

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    vocab = [f"w{i}" for i in range(30)]
    t1 = " ".join(vocab)
    t2 = " ".join(reversed(vocab))
    corpus0 = mk([(1, t1)])
    b1 = mk([(100, t2)])  # unrelated -> survives batch 1
    s1, d1 = dedup_batch(b1, corpus0, minhash_banded(corpus0))
    assert [r["doc_id"] for r in s1.collect()] == [100]

    corpus = corpus0.unionByName(s1)
    index = minhash_banded(corpus0).unionByName(minhash_banded(s1))
    b2 = mk([(200, t2 + " zz"), (201, " ".join(vocab[:15]) + " q r s t u v w x y z a b c d e")])
    s2, d2 = dedup_batch(b2, corpus, index)
    drops = {r["doc_id"]: r["reason"] for r in d2.collect()}
    assert drops.get(200) == "corpus_dup"  # near-dup of the batch-1 survivor
    assert 201 in {r["doc_id"] for r in s2.collect()}
    assert s2.where(F.col("doc_id") == 200).count() == 0


def test_exact_resend_same_doc_id_drops(spark):
    """With content-derived ids, re-ingesting identical content carries
    the SAME doc_id as its committed corpus row. Pre-fix, such a row
    became a self-loop in the pair graph (cluster looked batch-only) and
    the duplicate re-committed, yielding two corpus rows under one id;
    now it drops up front as corpus_dup. Same-id copies WITHIN a batch
    collapse to one survivor (no drop row — identical ids are identical
    content, nothing distinguishes the twins)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from feature_engineering_spark.operators.dedup import (
        dedup_batch_against_corpus,
        minhash_banded,
    )

    vocab = [f"w{i}" for i in range(30)]
    t_corp = " ".join(vocab)
    t_fresh = " ".join(reversed(vocab)) + " q1 q2 q3"
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": [t_corp]})
    )
    index = minhash_banded(corpus)
    batch = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [7, 50, 50],
            # id 7 = byte-identical re-send; the two id-50 rows are
            # in-batch identical twins
            "text": [t_corp, t_fresh, t_fresh],
        })
    )
    survivors, drops = dedup_batch_against_corpus(
        batch, corpus, index, threshold=0.5
    )
    got_drops = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert got_drops == {7: "corpus_dup"}
    surv = survivors.select("doc_id").collect()
    assert sorted(r["doc_id"] for r in surv) == [50]  # twins collapsed
    # corpus ∪ survivors stays id-unique — the invariant the fix restores
    union_ids = corpus.select("doc_id").unionByName(
        survivors.select("doc_id")
    )
    assert union_ids.count() == union_ids.distinct().count()


def test_multi_signal_dedup_catches_paraphrase(spark):
    """A paraphrase dup (text fully rewritten, embedding unchanged) is
    invisible to the MinHash signal — text-only dedup keeps it — but the
    SRP index probe catches it and the merged graph drops it as
    corpus_dup. Fresh rows with independent embeddings survive."""
    import pandas as pd
    from pyspark.sql import functions as F

    from feature_engineering_spark.operators.dedup import (
        dedup_batch_against_corpus,
        minhash_banded,
        srp_banded,
    )

    vocab = [f"w{i}" for i in range(30)]
    t_corp = " ".join(vocab)
    t_para = " ".join(f"tok{i}" for i in range(30))     # zero shared shingles
    t_fresh = " ".join(f"new{i}" for i in range(30))
    v_corp = [1.0, 0.2, -0.5, 0.8] * 4
    v_fresh = [-0.7, 0.9, 0.1, -0.3] * 4
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [t_corp],
                      "embedding": [v_corp]})
    )
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101],
                      "text": [t_para, t_fresh],
                      "embedding": [v_corp, v_fresh]})
    )
    index = minhash_banded(corpus)
    eindex = srp_banded(corpus, 16, emb="embedding", id_col="doc_id")

    # text-only: MinHash is blind to the paraphrase
    surv_text, drops_text = dedup_batch_against_corpus(
        batch, corpus, index, threshold=0.5
    )
    assert drops_text.count() == 0 and surv_text.count() == 2

    surv, drops = dedup_batch_against_corpus(
        batch, corpus, index, threshold=0.5,
        emb="embedding", emb_banded=eindex, emb_dim=16, emb_threshold=0.9,
    )
    got = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert got == {100: "corpus_dup"}
    assert [r["doc_id"] for r in surv.select("doc_id").collect()] == [101]

    # misuse guard: emb without its index/dim fails loudly
    import pytest
    with pytest.raises(ValueError, match="emb_banded"):
        dedup_batch_against_corpus(batch, corpus, index, emb="embedding")
