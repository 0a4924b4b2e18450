"""Tests for the training-data pipeline operators (dedup, similarity,
text, multimodal plumbing)."""

import pytest
import numpy as np

from pyspark.sql import functions as F

from clickhouse_core_spark.pipeline import (
    exact_dedup, minhash_lsh_dedup, simhash_dedup, ngram_jaccard_pairs,
    cosine_topk, lsh_ann_topk,
    with_token_count, with_quality_score, with_language_id, with_fingerprint,
)
from clickhouse_core_spark.pipeline.multimodal import (
    decode_images, extract_features, sample_frames,
)

DOC = ("the quick brown fox jumps over the lazy dog and then runs far away "
       "into the deep green forest to find some food for the long cold winter")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalized(spark):
    df = _docs(spark, [(1, "Hello,  World!"), (2, "hello world"), (3, "other")])
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    assert kept == [1, 3]


def test_minhash_lsh_dedup_finds_near_dups(spark):
    near = DOC.replace("quick", "fast")  # 1-word change = high jaccard
    df = _docs(spark, [(1, DOC), (2, near), (3, "completely different text "
                                                "about spark query engines and joins")])
    kept = sorted(r.doc_id for r in
                  minhash_lsh_dedup(df, num_hashes=32, bands=16,
                                    jaccard_threshold=0.5).collect())
    assert kept == [1, 3]


def test_simhash_dedup_finds_near_dups(spark):
    near = DOC.replace("quick", "fast")
    df = _docs(spark, [(1, DOC), (2, near),
                       (3, "completely different text about query engines")])
    kept = sorted(r.doc_id for r in
                  simhash_dedup(df, hamming_threshold=10).collect())
    assert 2 not in kept and 1 in kept and 3 in kept


def test_ngram_jaccard_pairs(spark):
    df = _docs(spark, [(1, DOC), (2, DOC + " extra"), (3, "zzz qqq xxx")])
    pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    assert all(0.5 <= p.jaccard <= 1.0 for p in pairs)


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>")
    q = [float(x) for x in rng.standard_normal(8)]
    got = [r.vec_id for r in cosine_topk(df, q, 5).collect()]
    sims = vecs @ np.array(q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = list(np.argsort(-sims)[:5])
    assert got == want


def test_lsh_ann_returns_bucket_subset(spark):
    rng = np.random.RandomState(1)
    vecs = rng.standard_normal((100, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<double>")
    q = [float(x) for x in vecs[7]]  # query = an existing vector
    got = [r.vec_id for r in lsh_ann_topk(df, q, 5, bits=4).collect()]
    assert 7 in got  # identical vector always lands in the query's bucket


def test_lsh_ann_multiprobe_recall(spark):
    # 30 near-neighbors of the query inside 470 background vectors: the
    # true top-10 are the planted ones, and hamming-1 multi-probe must
    # recover >= 90% of what exact search finds.
    rng = np.random.RandomState(3)
    q = rng.standard_normal(16)
    near = q + 0.15 * rng.standard_normal((30, 16))
    far = rng.standard_normal((470, 16))
    vecs = np.vstack([near, far])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")
    qf = [float(x) for x in q]
    exact = {r.vec_id for r in cosine_topk(df, qf, 10).collect()}
    approx = {r.vec_id
              for r in lsh_ann_topk(df, qf, 10, bits=8, multiprobe=1).collect()}
    assert len(exact & approx) >= 9


def test_token_count(spark):
    df = _docs(spark, [(1, "one two  three"), (2, ""), (3, "  ")])
    out = {r.doc_id: r.token_count for r in with_token_count(df).collect()}
    assert out == {1: 3, 2: 0, 3: 0}


def test_quality_score_range_and_ordering(spark):
    df = _docs(spark, [(1, DOC), (2, "x@@@@ ###")])
    out = {r.doc_id: r.quality for r in with_quality_score(df).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_language_id(spark):
    df = _docs(spark, [
        (1, "the cat and the dog sat in the garden with it"),
        (2, "el perro y la casa de la madre en los campos"),
        (3, "der hund und die katze ist von den bergen"),
        (4, "zzz qqq"),
    ])
    out = {r.doc_id: r.lang_pred for r in with_language_id(df).collect()}
    assert out[1] == "en" and out[2] == "es" and out[3] == "de" and out[4] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = _docs(spark, [(1, "Hello,  World!"), (2, "hello world"), (3, "bye")])
    out = {r.doc_id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_multimodal_decode_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x01\x02\x03\x04\x05\x06\x07\x08payload")),
         (2, bytearray(b"\xff" * 32))],
        "id long, content binary")
    out = {r.id: (r.img_width, r.img_height, r.img_pixels)
           for r in decode_images(df).collect()}
    assert all(w >= 16 and h >= 16 and p == w * h for (w, h, p) in out.values())
    # deterministic: same content -> same dims
    again = {r.id: (r.img_width, r.img_height, r.img_pixels)
             for r in decode_images(df).collect()}
    assert out == again


def test_multimodal_features_and_frames(spark):
    df = spark.createDataFrame([(1, bytearray(b"abcdefgh" * 10))],
                               "id long, content binary")
    feats = extract_features(df, dim=4).collect()[0].features
    assert len(feats) == 4
    frames = sample_frames(df, every_ms=100).collect()[0].frame_offsets_ms
    assert frames[0] == 0 and len(frames) > 1


def test_pii_redaction(spark):
    from clickhouse_core_spark.pipeline import with_pii_redacted
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org now"),
         (2, "server at 10.0.255.7 port 80"),
         (3, "call +1-800-555-0199 today"),
         (4, "clean text, nothing to scrub 1.2 3.4")],
        "doc_id int, text string")
    out = {r["doc_id"]: r["text_redacted"]
           for r in with_pii_redacted(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> port 80"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text, nothing to scrub 1.2 3.4"


def test_gopher_signals(spark):
    from clickhouse_core_spark.pipeline import with_gopher_signals
    text = "- alpha beta\n- alpha beta\ngamma ### ...\n"
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id int, text string")
    rows = {r["doc_id"]: r for r in with_gopher_signals(df).collect()}
    r = rows[1]
    assert r["gq_n_words"] == 9                           # bullets/symbols count as tokens
    assert r["gq_dup_line_frac"] == pytest.approx(0.25)   # 4 lines (incl trailing ''), 3 distinct
    assert r["gq_bullet_line_frac"] == pytest.approx(0.5)
    assert r["gq_symbol_ratio"] == pytest.approx(4 / 9)   # 3 hashes + 1 ellipsis
    assert r["gq_alpha_word_frac"] == pytest.approx(5 / 9)
    assert rows[2]["gq_n_words"] == 0
    assert rows[2]["gq_mean_word_len"] == 0.0


def test_benchmark_contamination(spark):
    from clickhouse_core_spark.pipeline import benchmark_contamination
    docs = spark.createDataFrame(
        [(1, "a b c d e f"),      # shares shingles with bench
         (2, "x y z w q r")],     # disjoint
        "doc_id int, text string")
    bench = spark.createDataFrame([("a b c d e",)], "text string")
    out = {r["doc_id"]: r["contamination"]
           for r in benchmark_contamination(docs, bench, shingle_k=4).collect()}
    # doc1 shingles: abcd bcde cdef; bench: abcd bcde -> 2/3
    assert out[1] == pytest.approx(2 / 3)
    assert out[2] == 0.0


def test_ivf_topk_exhaustive_equals_bruteforce(spark):
    import random
    from clickhouse_core_spark.pipeline import cosine_topk, ivf_topk
    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [rnd.uniform(-1, 1) for _ in range(8)]
    exact = [r.vec_id for r in cosine_topk(df, q, 10).collect()]
    # n_probe == n_centroids: IVF becomes exhaustive => identical result
    full = [r.vec_id for r in
            ivf_topk(df, q, 10, n_centroids=8, n_probe=8).collect()]
    assert full == exact


def test_ivf_topk_probe_recall(spark):
    import random
    from clickhouse_core_spark.pipeline import cosine_topk, ivf_topk
    rnd = random.Random(5)
    # planted cluster near the query + background noise
    q = [1.0] * 8
    rows = [(i, [1.0 + rnd.uniform(-0.05, 0.05) for _ in range(8)])
            for i in range(20)]
    rows += [(100 + i, [rnd.uniform(-1, 1) for _ in range(8)])
             for i in range(180)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {r.vec_id for r in cosine_topk(df, q, 10).collect()}
    approx = {r.vec_id for r in
              ivf_topk(df, q, 10, n_centroids=8, n_probe=2).collect()}
    assert len(exact & approx) >= 9  # >=0.9 recall on the planted cluster


def test_quality_classifier_train_score(spark, catalog):
    from pyspark.sql import functions as F

    from clickhouse_core_spark.pipeline.text import (
        train_quality_classifier, score_quality_classifier,
        with_gopher_signals)
    docs = catalog.documents
    lab = (with_gopher_signals(docs)
           .withColumn("label", (F.col("gq_mean_word_len") > 4.5).cast("int"))
           .select("doc_id", "text", "label"))
    assert lab.filter("label = 1").count() > 0
    assert lab.filter("label = 0").count() > 0
    model = train_quality_classifier(lab).first()
    # mean-word-len weight must be positive (it defines the label)
    assert model["w0"] > 0
    scored = score_quality_classifier(docs, model)
    assert scored.columns == docs.columns + ["quality_prob"]
    j = scored.join(lab.select("doc_id", "label"), "doc_id")
    by = {r["label"]: r["p"] for r in
          j.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()}
    assert by[1] > by[0]
    # explicit-weights path matches the row path
    w = [model[f"w{i}_raw"] for i in range(5)]
    s2 = score_quality_classifier(docs, w, model["bias_raw"])
    assert s2.orderBy("doc_id").first()["quality_prob"] == \
        scored.orderBy("doc_id").first()["quality_prob"]


def test_chunk_documents_windows(spark):
    from clickhouse_core_spark.pipeline import chunk_documents
    import pytest as _pt
    from pyspark.sql import functions as F
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words), (2, "short text")],
                               "doc_id long, text string")
    out = chunk_documents(df, max_tokens=4, overlap=1).collect()
    d1 = sorted([(r.chunk_id, r.chunk_text, r.chunk_tokens)
                 for r in out if r.doc_id == 1])
    # starts at 0,3,6 — ceil((10-1)/3) = 3 windows fully cover the
    # 10 tokens with 1-token overlap
    assert d1 == [(0, "w0 w1 w2 w3", 4), (1, "w3 w4 w5 w6", 4),
                  (2, "w6 w7 w8 w9", 4)]
    d2 = [(r.chunk_id, r.chunk_text) for r in out if r.doc_id == 2]
    assert d2 == [(0, "short text")]
    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)


def test_ngram_lm_unigram_scores(spark):
    import math
    from clickhouse_core_spark.pipeline import score_ngram_lm, train_ngram_lm
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the the the the"),
         (3, "zyx qwv jkl")],
        "doc_id long, text string")
    uni, tot = train_ngram_lm(docs, order=1, alpha=1.0)
    counts = {r.tok: r.c for r in uni.collect()}
    assert counts["the"] == 6 and counts["cat"] == 1
    assert tot["n"] == sum(counts.values()) and tot["v"] == len(counts)
    scored = {r.doc_id: r.nll
              for r in score_ngram_lm(docs, uni, tot).collect()}
    # doc 2 is all high-frequency tokens -> most fluent (lowest nll)
    assert scored[2] < scored[1] < scored[3]
    # exact value check for doc 2: all tokens 'the' (c=6)
    expect = -math.log((6 + 1.0) / (tot["n"] + tot["v"]))
    assert abs(scored[2] - expect) < 1e-12


def test_ngram_lm_bigram_conditions_on_prev(spark):
    from clickhouse_core_spark.pipeline import score_ngram_lm, train_ngram_lm
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "b a b a b a"), (3, "a a a b b b")],
        "doc_id long, text string")
    (uni, bi), tot = train_ngram_lm(docs, order=2, alpha=0.5)
    c2 = {(r.prev, r.tok): r.c2 for r in bi.collect()}
    assert c2[("a", "b")] == 6 and c2[("b", "a")] == 5
    assert c2.get(("a", "a")) == 2 and c2.get(("b", "b")) == 2
    scored = {r.doc_id: r.nll
              for r in score_ngram_lm(docs, (uni, bi), tot).collect()}
    # alternating docs follow the dominant bigrams -> lower nll than
    # the run-structured doc
    assert scored[1] < scored[3] and scored[2] < scored[3]


def test_paragraph_dedup_first_occurrence_wins(spark):
    from clickhouse_core_spark.pipeline import paragraph_dedup
    docs = spark.createDataFrame(
        [(1, "intro\n\nboilerplate\n\nbody one"),
         (2, "boilerplate\n\nbody two"),
         (3, "boilerplate"),
         (4, "intro\n\nfresh")],
        "doc_id long, text string")
    out = {r.doc_id: r.text_deduped
           for r in paragraph_dedup(docs).collect()}
    # doc 1 owns 'intro' and 'boilerplate' (first occurrence)
    assert out[1] == "intro\n\nboilerplate\n\nbody one"
    # later docs lose the repeated paragraphs, keep their own
    assert out[2] == "body two"
    assert out[3] == ""                # lost everything
    assert out[4] == "fresh"
    # original columns survive
    cols = paragraph_dedup(docs).columns
    assert "text" in cols and "doc_id" in cols


def test_paragraph_dedup_order_and_custom_sep(spark):
    from clickhouse_core_spark.pipeline import paragraph_dedup
    docs = spark.createDataFrame(
        [(1, "c|a|b"), (2, "b|x|a")], "doc_id long, text string")
    out = {r.doc_id: r.text_deduped
           for r in paragraph_dedup(docs, sep="|").collect()}
    assert out[1] == "c|a|b"           # original order preserved
    assert out[2] == "x"


def test_paragraph_dedup_string_doc_ids(spark):
    """String doc ids must work: the old arithmetic first-occurrence key
    (id * 1e6 + pos) cast string ids to NULL and silently emptied every
    document; the struct-ordered key handles any orderable id type."""
    from clickhouse_core_spark.pipeline import paragraph_dedup
    docs = spark.createDataFrame(
        [("docA", "intro\n\nshared\n\nbody one"),
         ("docB", "shared\n\nbody two")],
        "doc_id string, text string")
    out = {r.doc_id: r.text_deduped
           for r in paragraph_dedup(docs).collect()}
    assert out["docA"] == "intro\n\nshared\n\nbody one"
    assert out["docB"] == "body two"


def test_paragraph_dedup_idempotent(spark):
    from clickhouse_core_spark.pipeline import paragraph_dedup
    docs = spark.createDataFrame(
        [(1, "a\n\nb\n\nc"), (2, "b\n\nd"), (3, "c\n\nd\n\na")],
        "doc_id long, text string")
    once = paragraph_dedup(docs).select(
        "doc_id", F.col("text_deduped").alias("text"))
    twice = paragraph_dedup(once).select("doc_id", "text_deduped")
    a = {r.doc_id: r.text for r in once.collect()}
    b = {r.doc_id: r.text_deduped for r in twice.collect()}
    assert a == b                     # dedup of deduped output is a no-op


def test_ivf_index_partition_pruned_search(spark, tmp_path):
    """The persisted IVF index: exhaustive probe equals brute force,
    and a partial probe's physical plan carries a PartitionFilters
    entry on __centroid — partition pruning IS the inverted-file
    lookup."""
    from clickhouse_core_spark.pipeline import (
        build_ivf_index, cosine_topk, ivf_index_search)
    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((300, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(df, path, n_centroids=8, iterations=3, seed=7)
    q = [float(x) for x in rng.standard_normal(8)]
    exact = [(r.vec_id, round(r.score, 9)) for r in
             cosine_topk(df, q, 10).collect()]
    full = [(r.vec_id, round(r.score, 9)) for r in
            ivf_index_search(spark, path, q, 10, n_probe=8).collect()]
    assert full == exact                       # exhaustive == brute force
    probed = ivf_index_search(spark, path, q, 10, n_probe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__centroid" in plan
    got = {r.vec_id for r in probed.collect()}
    assert len(got & {v for v, _ in exact}) >= 5   # decent recall at 2/8


def _make_wav(freq_hz, n_samples, rate=8000, channels=1):
    import io
    import math
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = bytearray()
        for i in range(n_samples):
            v = int(10000 * math.sin(2 * math.pi * freq_hz * i / rate))
            for _ in range(channels):
                frames += v.to_bytes(2, "little", signed=True)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_wav_real_pcm(spark):
    from clickhouse_core_spark.pipeline.multimodal import decode_wav
    wav_a = _make_wav(440, 8000)          # 1 s of A440 mono
    wav_b = _make_wav(100, 4000, channels=2)
    df = spark.createDataFrame(
        [(1, bytearray(wav_a)), (2, bytearray(wav_b)),
         (3, bytearray(b"not a wav")), (4, None)],
        "id long, content binary")
    out = {r.id: r for r in decode_wav(df).collect()}
    a = out[1]
    assert (a.wav_sample_rate, a.wav_channels, a.wav_bits,
            a.wav_n_samples, a.wav_duration_ms) == (8000, 1, 16, 8000, 1000)
    # A440 for 1 s at 8 kHz: ~880 zero crossings, RMS ~ 10000/sqrt(2)
    assert abs(a.wav_zero_crossings - 880) <= 2
    assert abs(a.wav_rms - 10000 / 2 ** 0.5) < 100
    b = out[2]
    assert (b.wav_sample_rate, b.wav_channels,
            b.wav_duration_ms) == (8000, 2, 500)
    assert abs(b.wav_zero_crossings - 100) <= 2   # 100 Hz for 0.5 s
    # malformed and NULL payloads degrade to NULLs, not failures
    assert out[3].wav_sample_rate is None and out[4].wav_rms is None
