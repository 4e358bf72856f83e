"""Data-pipeline operator tests on sf0.001 testdata: planted near-dups are
found, fingerprints behave, ANN ranks correctly, multimodal stubs keep
their plumbing contracts."""

import pytest
from pyspark.sql import functions as F

from ringo_spark.operators.dedup import (
    dedup_exact_df, dedup_minhash_lsh_df, dedup_ngram_jaccard_df,
    dedup_simhash_df,
)
from ringo_spark.operators.multimodal import (
    media_table, multimodal_features_df, resize_media,
)
from ringo_spark.operators.similarity import ann_cosine_topk_df
from ringo_spark.operators.text import doc_fingerprint_df, text_quality_df

SF = "/root/testdata/sf0.001"


def test_exact_dedup_groups(spark):
    out = dedup_exact_df(spark, SF)
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.agg(F.sum("dup_count")).collect()[0][0] == total


def test_minhash_lsh_finds_planted_near_dups(spark):
    pairs = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh_df(spark, SF).collect()}
    exact = {(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard_df(spark, SF).collect()}
    assert exact, "testdata should contain planted near-duplicate pairs"
    # LSH candidates are a subset of exact pairs after verification...
    assert pairs <= exact
    # ...and with 6 bands x 2 rows recall at j>=0.5 is high: expect most found
    assert len(pairs) >= len(exact) * 0.8


def test_simhash_near_dups_have_small_hamming_distance(spark):
    sim = {r.doc_id: r.simhash for r in dedup_simhash_df(spark, SF).collect()}
    exact = [(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard_df(spark, SF).collect()]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    near = [hamming(sim[a], sim[b]) for a, b in exact]
    ids = sorted(sim)
    far = [hamming(sim[ids[i]], sim[ids[i + 50]]) for i in range(0, 100, 10)]
    # Docs share a tiny vocabulary (~31 words), so even unrelated docs'
    # simhashes correlate (far-avg ~18, not the ~30 of independent bits);
    # near-dups must still sit well below the background distance.
    near_avg, far_avg = sum(near) / len(near), sum(far) / len(far)
    assert near_avg < far_avg - 5, (near, far)
    assert max(near) < 18, near


def test_ann_topk_rank1_is_best(spark):
    rows = ann_cosine_topk_df(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert len(rs) == 10
        assert all(rs[i].cosine >= rs[i + 1].cosine for i in range(9))


def test_fingerprint_is_token_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha beta")],
        "doc_id long, text string")
    df.createOrReplaceTempView("ignored")
    from ringo_spark.operators.textfn import tokens

    fp = df.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text"))))))
        .alias("fingerprint")).collect()
    assert fp[0].fingerprint == fp[1].fingerprint


def test_quality_metrics_ranges(spark):
    rows = text_quality_df(spark, SF).collect()
    for r in rows:
        assert r.n_words > 0 and 0 <= r.punct_ratio <= 1
        assert 0 <= r.stopword_ratio <= 1 and 0 <= r.quality_score <= 1


def test_multimodal_features_real_png_decode(spark):
    """The registered pipeline round-trips real PNG bytes: the builder
    embeds width/height in the IHDR, the parser reads them back."""
    rows = multimodal_features_df(spark, SF).collect()
    for r in rows[:20]:
        body = r.n_bytes - 33  # signature + IHDR chunk overhead
        assert r.width == body % 640 + 1
        assert r.height == (body * 7) % 480 + 1
        assert r.n_frames == 1


def test_png_parser_on_real_and_garbage_bytes(spark):
    from ringo_spark.operators.multimodal import (
        _decode_fake, media_table, parse_png_header,
    )

    payload = bytes(media_table(spark, SF).limit(1).collect()[0].payload)
    assert payload[:8] == bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
    wh = parse_png_header(payload)
    assert wh is not None and wh[0] >= 1 and wh[1] >= 1
    # non-PNG bytes fall through to the labeled fake
    assert parse_png_header(b"not a png at all, sorry") is None
    assert len(_decode_fake(b"xyz")) == 3


def test_wav_parser_round_trip(spark):
    from ringo_spark.operators.multimodal import (
        multimodal_wav_df, parse_wav_header, wav_table,
    )

    raw = wav_table(spark, SF).limit(5).collect()
    for r in raw:
        rate, ch, data_len = parse_wav_header(bytes(r.payload))
        assert rate == 8000 + r.doc_id % 8 * 1000
        assert ch == r.doc_id % 2 + 1
        assert data_len == len(bytes(r.payload)) - 44
    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    rows = multimodal_wav_df(spark, SF).limit(5).collect()
    for r in rows:
        assert r.n_samples == (r.n_bytes - 44) // (r.n_channels * 2)


def test_multimodal_resize_real_roundtrip(spark):
    from ringo_spark.operators.multimodal import (
        _PAYLOAD_SCHEMA, _encode_kernel, _png_pixel, decode_png_pixels,
    )
    import pandas as pd

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id").limit(10))
    media = (docs.mapInPandas(_encode_kernel, _PAYLOAD_SCHEMA)
             .withColumn("media_type", F.lit("image/png")))
    rows = resize_media(media, 5, 3).collect()
    assert rows
    for r in rows:
        assert (r.resized_width, r.resized_height) == (5, 3)
        w2, h2, px2 = decode_png_pixels(bytes(r.payload))
        assert (w2, h2) == (5, 3)
        # corner pixel (0,0) samples source pixel (0,0): closed form
        assert px2[0] == _png_pixel(r.doc_id, 0)
    # non-PNG payloads pass through with nulled dims, payload untouched
    junk = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not a png"]}))
    jr = resize_media(junk, 5, 3).collect()[0]
    assert jr.resized_width is None and bytes(jr.payload) == b"not a png"


def test_multimodal_frame_sampling_real_decode(spark):
    """The video lane decodes ONLY sampled frames from the container and
    its per-frame stats match the closed-form pixel function."""
    from ringo_spark.operators.multimodal import (
        FRAME_EVERY_N, _frame_pixel, _video_n_frames, encode_video,
        multimodal_frames_df, sample_video_frames,
    )

    # pure round trip first: every sampled frame decodes to the closed form
    payload = encode_video(7)
    frames = sample_video_frames(payload, FRAME_EVERY_N)
    assert [f for f, *_ in frames] == list(range(0, _video_n_frames(7),
                                                 FRAME_EVERY_N))
    for f, w, h, mean_px, p00 in frames:
        assert (w, h) == (4, 3)
        assert p00 == _frame_pixel(7, f, 0)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_video_frames(b"nope", 2)

    rows = multimodal_frames_df(spark, SF).collect()
    assert rows and all(r.frame_idx % FRAME_EVERY_N == 0 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in list(by_doc.items())[:10]:
        assert len(rs) == len(range(0, _video_n_frames(doc_id), FRAME_EVERY_N))


def test_arrow_ann_matches_jvm_within_tolerance(spark):
    from ringo_spark.operators.similarity import ann_cosine_topk_arrow_df

    jvm = {(r.q_id, r.n_id): (r.rank, r.cosine)
           for r in ann_cosine_topk_df(spark, SF).collect()}
    arrow = {(r.q_id, r.n_id): (r.rank, r.cosine)
             for r in ann_cosine_topk_arrow_df(spark, SF).collect()}
    assert set(jvm) == set(arrow)
    for k, (rk, cos) in jvm.items():
        ark, acos = arrow[k]
        assert rk == ark and abs(cos - acos) < 1e-9, (k, cos, acos)


def test_sampling_operators_semantics(spark):
    from ringo_spark.operators.sampling import (
        MIXTURE_RATES, QUOTA_PER_SOURCE, sample_hash_split_df,
        sample_mixture_df, sample_per_source_quota_df,
    )

    split = sample_hash_split_df(spark, SF)
    total = split.count()
    by_split = dict(split.groupBy("split").count().collect())
    # every doc gets exactly one split; proportions near 80/10/10
    assert sum(by_split.values()) == total
    assert 0.7 < by_split["train"] / total < 0.9
    # determinism: re-evaluation yields the identical assignment
    again = {r.doc_id: r.split for r in sample_hash_split_df(spark, SF).collect()}
    assert all(again[r.doc_id] == r.split for r in split.collect())

    quota = sample_per_source_quota_df(spark, SF)
    per_src = quota.groupBy("source").count().collect()
    assert all(r["count"] <= QUOTA_PER_SOURCE for r in per_src)

    mix = sample_mixture_df(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_en = docs.where(F.col("lang") == "en").count()
    kept_en = mix.where(F.col("lang") == "en").count()
    assert kept_en == n_en  # rate 1.0 keeps everything
    for lang, rate in MIXTURE_RATES.items():
        n = docs.where(F.col("lang") == lang).count()
        kept = mix.where(F.col("lang") == lang).count()
        if n >= 20:  # enough mass for the rate to be visible
            assert abs(kept / n - rate) < 0.25, (lang, kept, n)


def test_segmented_ema_handles_hot_user(spark, tmp_path):
    """One user with 1e5 events (every other user ~10): the segmented fold
    must agree with the monolithic fold without any row holding the hot
    user's full history."""
    import datetime as dt

    from ringo_spark.operators.tpch import (
        user_value_ema_df, user_value_ema_segmented_df,
    )

    t0 = dt.datetime(2024, 1, 1)
    n_hot = 100_000
    hot = spark.range(n_hot).select(
        F.lit(7).cast("long").alias("user_id"),
        F.col("id").alias("event_id"),
        (F.lit(t0) + F.make_interval(secs=F.col("id") * 10)).alias("ts"),
        (F.pmod(F.col("id"), 100) / 10.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
        F.lit("CLICK").alias("event_type"))
    cold = spark.range(10).select(
        F.lit(8).cast("long").alias("user_id"),
        (F.col("id") + n_hot).alias("event_id"),
        (F.lit(t0) + F.make_interval(secs=F.col("id") * 60)).alias("ts"),
        F.lit(2.5).alias("value"),
        F.lit('{"k": 2}').alias("props"),
        F.lit("VIEW").alias("event_type"))
    sf = str(tmp_path / "skewed_sf")
    import os

    os.makedirs(sf, exist_ok=True)
    hot.unionByName(cold).select(
        "event_id", "ts", "user_id", "event_type", "value", "props") \
        .write.parquet(f"{sf}/events.parquet")

    plain = {r.user_id: (r.n_events, r.ema)
             for r in user_value_ema_df(spark, sf).collect()}
    segmented = {r.user_id: (r.n_events, r.ema)
                 for r in user_value_ema_segmented_df(spark, sf).collect()}
    assert set(plain) == set(segmented) == {7, 8}
    for uid in plain:
        assert plain[uid][0] == segmented[uid][0]
        assert abs(plain[uid][1] - segmented[uid][1]) < 1e-6, uid
    # the segmented plan's widest row is one (user, day) segment, not the
    # full 1e5-event history: 10s cadence -> 8640 events/day max
    seg_rows = user_value_ema_segmented_df(spark, sf)
    # reach into the first-level aggregation to check segment sizes
    from ringo_spark.catalog import load_catalog
    from ringo_spark.testbed import EVENTS

    ev = (load_catalog(spark, sf, [EVENTS])["events"]
          .select("user_id", F.unix_timestamp("ts").alias("sec")))
    max_seg = (ev.groupBy("user_id", F.floor(F.col("sec") / 86400))
               .count().agg(F.max("count")).collect()[0][0])
    assert max_seg <= 8640
    assert seg_rows.count() == 2


def test_hash_split_invariant_to_partitioning(spark, tmp_path):
    """The split is a pure function of doc_id: physically re-partitioning
    the input must not move any document between splits (the property that
    makes the split leak-proof across reruns and layouts)."""
    src = spark.read.parquet(f"{SF}/documents.parquet")
    sf1 = str(tmp_path / "p1"); sf17 = str(tmp_path / "p17")
    import os

    for d, n in ((sf1, 1), (sf17, 17)):
        os.makedirs(d, exist_ok=True)
        src.repartition(n).write.parquet(f"{d}/documents.parquet")
    from ringo_spark.operators.sampling import sample_hash_split_df

    a = {r.doc_id: r.split for r in sample_hash_split_df(spark, sf1).collect()}
    b = {r.doc_id: r.split for r in sample_hash_split_df(spark, sf17).collect()}
    assert a == b


def test_ann_recall_ordering(spark):
    """Index quality: multi-probe recall >= single-bucket recall, and both
    find a sane fraction of the exact top-5 (the buckets carry signal)."""
    from ringo_spark.operators.similarity import (
        LSH_N_QUERIES, ann_lsh_bucketed_df, ann_lsh_multiprobe_df,
    )

    exact = {}
    for r in ann_cosine_topk_df(spark, SF).collect():
        if r.rank <= 5 and r.q_id < LSH_N_QUERIES:
            exact.setdefault(r.q_id, set()).add(r.n_id)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.q_id, set()).add(r.n_id)
        hits = sum(len(got.get(q, set()) & n) for q, n in exact.items())
        return hits / sum(len(n) for n in exact.values())

    # bucket width sized to the tiny corpus (2^3 buckets over ~100
    # vectors) — the same 2^bits ≈ N/bucket_size rule the docstring
    # prescribes for real corpora
    r_single = recall(ann_lsh_bucketed_df(spark, SF, bits=3))
    r_multi = recall(ann_lsh_multiprobe_df(spark, SF, bits=3))
    assert r_multi >= r_single
    assert r_multi > 0.4, (r_single, r_multi)


def test_png_decoder_reconstructs_average_and_paeth_filters():
    """The pixel decoder implements all five PNG filter types; the encode
    kernel only emits 0-2, so Average and Paeth are exercised here with a
    hand-filtered image (filter application is the inverse of
    reconstruction)."""
    import struct
    import zlib

    from ringo_spark.operators.multimodal import (
        PNG_SIGNATURE, _chunk, decode_png_pixels,
    )

    w, h, bpp = 5, 4, 3
    orig = [bytes((17 * (y * w * bpp + i) + 3) % 256 for i in range(w * bpp))
            for y in range(h)]
    raw = bytearray()
    prior = bytes(w * bpp)
    for y, line in enumerate(orig):
        ftype = 3 if y % 2 == 0 else 4          # Average, Paeth
        raw.append(ftype)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((line[i] - pred) % 256)
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    dw, dh, px = decode_png_pixels(png)
    assert (dw, dh) == (w, h)
    assert px == b"".join(orig)


def test_png_decoder_rejects_corrupt_crc():
    import pytest as _pytest

    from ringo_spark.operators.multimodal import decode_png_pixels, encode_png

    png = bytearray(encode_png(42))
    png[-5] ^= 0xFF       # flip a byte inside IEND's CRC
    with _pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(bytes(png))


def test_winnowing_guarantee_shared_passage_shares_fingerprint(spark):
    """The winnowing theorem: any common substring of length >= k + w - 1
    characters yields at least one common fingerprint (window minima are
    position-independent values).  Planted shared passages of exactly the
    guarantee length must collide; disjoint texts must not."""
    import ringo_spark.operators.dedup as D
    from pyspark.sql import functions as F

    shared = "the quick brown fox jumps over the lazy dog again"
    assert len(shared) >= D.WINNOW_K + D.WINNOW_W - 1
    rows = [
        (1, f"alpha beta gamma delta {shared} epsilon zeta"),
        (2, f"one two three four five six {shared} seven"),
        (3, "completely different words without any overlap here at all"),
        (4, "yet another unrelated document text goes right here instead"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_grams = F.length("text") - D.WINNOW_K + 1
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: D.phash(F.col("text").substr(i, F.lit(D.WINNOW_K)))
        % D.MINHASH_P)
    fps = {r.doc_id: set(r.fp) for r in (
        docs.withColumn("gh", grams)
        .select("doc_id", F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("gh") - D.WINNOW_W),
            lambda i: F.array_min(F.slice("gh", i + 1, D.WINNOW_W))))
            .alias("fp"))).collect()}
    assert fps[1] & fps[2], "shared passage must share a fingerprint"
    assert not (fps[3] & fps[4]), "disjoint texts should not collide"


def test_quadratic_baseline_guard(spark, monkeypatch, tmp_path):
    from ringo_spark.operators import dedup as D
    from ringo_spark.operators.dedup import (
        QUADRATIC_BASELINE_MAX_ROWS, _assert_small_scale,
    )

    # range frames carry an optimizer rowCount -> both directions decide
    # with NO job (VERDICT r11 item 5)
    small = spark.range(10)
    assert _assert_small_scale(small, "x", "y") is small
    big = spark.range(QUADRATIC_BASELINE_MAX_ROWS + 1)
    with pytest.raises(ValueError, match="quadratic exact baseline"):
        _assert_small_scale(big, "dedup_ngram_jaccard", "dedup_minhash_lsh")
    # parquet scans decide from FOOTER rows (exact upper bound, no job)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert _assert_small_scale(docs, "x", "y") is docs
    # a mass-duplicated over-bound corpus sits FAR below 64 B/row on
    # disk (dictionary + RLE) — bytes alone would wave it through; the
    # footer row count must still raise (r12 review finding)
    dup = str(tmp_path / "dup.parquet")
    (spark.range(QUADRATIC_BASELINE_MAX_ROWS + 1)
     .selectExpr("'the same boilerplate text repeated verbatim' AS text")
     .coalesce(1).write.parquet(dup))
    import os as _os
    on_disk = sum(_os.path.getsize(_os.path.join(dup, f))
                  for f in _os.listdir(dup) if f.endswith(".parquet"))
    assert on_disk < D.QUADRATIC_BASELINE_FREE_PASS_BYTES
    with pytest.raises(ValueError, match="quadratic exact baseline"):
        _assert_small_scale(spark.read.parquet(dup), "x", "y")
    # a MULTIPLYING plan over small files (ADVICE r12): a self-join or
    # explode can exceed the input-file row sum, so the footer shortcut
    # must not decide — the count() fallback sees the true size and
    # raises.  documents sf0.001 has ~600 rows; exploding a 200-wide
    # array takes the frame past the bound while the footers stay tiny.
    exploded = docs.select(
        F.explode(F.sequence(F.lit(1), F.lit(2000))).alias("i"))
    assert exploded.count() > QUADRATIC_BASELINE_MAX_ROWS
    with pytest.raises(ValueError, match="quadratic exact baseline"):
        _assert_small_scale(exploded, "x", "y")
    joined = docs.crossJoin(spark.range(300))
    with pytest.raises(ValueError, match="quadratic exact baseline"):
        _assert_small_scale(joined, "x", "y")
    # with the footer path forced off, the free pass / count() fallback
    # chain still decides correctly
    monkeypatch.setattr(D.DataFrame, "inputFiles",
                        lambda self: (_ for _ in ()).throw(RuntimeError()))
    assert _assert_small_scale(docs, "x", "y") is docs
    monkeypatch.setattr(D, "QUADRATIC_BASELINE_FREE_PASS_BYTES", -1)
    assert _assert_small_scale(docs, "x", "y") is docs


def test_scd2_fact_incremental_nondegenerate(spark):
    """The composition must actually exercise 'dim keys change mid-window':
    status intervals begin on both sides of the split watermark, so the
    incremental batch re-buckets shipments under statuses the initial
    load never saw."""
    from ringo_spark.operators.relational import (
        SCD2_SPLIT_DATE, scd2_dim_df, scd2_fact_incremental_df,
    )

    w = F.lit(SCD2_SPLIT_DATE).cast("timestamp")
    hist = scd2_dim_df(spark, SF)
    assert hist.where(F.col("valid_from") < w).count() > 0
    assert hist.where(F.col("valid_from") >= w).count() > 0
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert li.where(F.col("l_shipdate") < w).count() > 0
    assert li.where(F.col("l_shipdate") >= w).count() > 0
    out = scd2_fact_incremental_df(spark, SF)
    rows = out.collect()
    assert rows and {r.status for r in rows} >= {"F", "O"}
    total = li.join(
        spark.read.parquet(f"{SF}/orders.parquet"),
        li.l_orderkey == F.col("o_orderkey")).count()
    assert sum(r.n_items for r in rows) == total


def test_nearest_resize_identity_and_downsample():
    """Same-size resize is the identity (sx = x*w//w = x exactly); a 2x
    downsample picks every other pixel."""
    from ringo_spark.operators.multimodal import nearest_resize

    w, h = 6, 4
    px = bytes(range(w * h * 3))
    assert nearest_resize(px, w, h, w, h) == px
    half = nearest_resize(px, w, h, 3, 2)
    for y in range(2):
        for x in range(3):
            src = ((y * 2) * w + x * 2) * 3
            tgt = (y * 3 + x) * 3
            assert half[tgt:tgt + 3] == px[src:src + 3]


def test_minhash_indexed_matches_live(spark):
    """The persisted-index dedup serves the identical verified pairs as
    the recompute path, and the index is reused across calls."""
    import os

    from ringo_spark.operators.dedup import (
        build_minhash_index, dedup_minhash_lsh_indexed_df,
    )

    live = {tuple(r) for r in dedup_minhash_lsh_df(spark, SF).collect()}
    idx = {tuple(r) for r in dedup_minhash_lsh_indexed_df(spark, SF).collect()}
    assert idx == live and live
    p1 = build_minhash_index(spark, SF)
    p2 = build_minhash_index(spark, SF)
    assert p1 == p2 and os.path.exists(os.path.join(p1, "_INDEX_OK"))


def test_clusters_accept_precomputed_pairs(spark):
    """dedup_clusters chains from persisted-index pairs without
    recomputing signatures, with identical cluster output."""
    from ringo_spark.operators.dedup import (
        dedup_clusters_df, dedup_minhash_lsh_indexed_df,
    )

    live = {tuple(r) for r in dedup_clusters_df(spark, SF).collect()}
    reused = {tuple(r) for r in dedup_clusters_df(
        spark, SF, pairs_df=dedup_minhash_lsh_indexed_df(spark, SF)).collect()}
    assert reused == live and live


def test_capped_lsh_mass_duplication_cannot_go_quadratic(spark, tmp_path):
    """The production scale hole the cap closes: 10k byte-identical docs
    would put 10k rows in every band bucket and make candidate generation
    emit C(10k,2) ~ 5e7 pairs.  Exact-collapse-first reduces the family
    to ONE representative, so the candidate set stays O(distinct texts)."""
    import os

    from ringo_spark.operators.dedup import dedup_minhash_lsh_capped_df

    n_dup = 10_000
    boiler = ("this content is licensed under the creative commons "
              "attribution share alike license version four point oh "
              "see the terms page for details " * 2)
    near_a = " ".join(f"tok{i}" for i in range(40))
    near_b = " ".join(f"tok{i}" for i in range(39)) + " tokX"
    rows = [(i, boiler) for i in range(n_dup)]
    rows += [(n_dup + 1, near_a), (n_dup + 2, near_b)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")

    cand = dedup_minhash_lsh_capped_df(spark, d, return_candidates=True)
    assert cand.count() < 50  # not ~5e7
    # recall survives the collapse: the distinct near-dup pair is found
    out = {(r.doc_a, r.doc_b)
           for r in dedup_minhash_lsh_capped_df(spark, d).collect()}
    assert (n_dup + 1, n_dup + 2) in out


def test_capped_lsh_drops_oversized_band_buckets(spark, tmp_path):
    """DISTINCT near-identical texts (a giant near-dup clique) exceed the
    band-bucket cap and are dropped from candidate generation instead of
    exploding into C(k,2) pairs."""
    import os

    from ringo_spark.operators.dedup import (
        BAND_BUCKET_CAP, dedup_minhash_lsh_capped_df, dedup_minhash_lsh_df,
    )

    k = BAND_BUCKET_CAP + 8  # one clique just over the cap
    shared = " ".join(f"w{i}" for i in range(60))
    rows = [(i, f"{shared} unique{i}") for i in range(k)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")

    uncapped = dedup_minhash_lsh_df(spark, d).count()
    capped = dedup_minhash_lsh_capped_df(
        spark, d, return_candidates=True).count()
    assert uncapped == k * (k - 1) // 2  # the quadratic blowup, live path
    assert capped < uncapped / 4        # clique buckets dropped


def test_capped_lsh_is_subset_of_live_on_real_corpus(spark):
    """On the real testdata the capped output is a subset of the live
    pairs (collapse + cap only ever REMOVE candidates) and stays
    non-trivially large — the guards don't gut recall on normal data."""
    from ringo_spark.operators.dedup import (
        dedup_minhash_lsh_capped_df, dedup_minhash_lsh_df,
    )

    live = {tuple(r) for r in dedup_minhash_lsh_df(spark, SF).collect()}
    capped = {tuple(r) for r in dedup_minhash_lsh_capped_df(spark, SF).collect()}
    assert capped and capped <= live
    assert len(capped) >= len(live) * 0.5


def test_index_gc_keeps_last_n_and_protects_fresh_build(tmp_path):
    """Stale fingerprint dirs are swept keep-last-N by LRU; the
    just-built (protected) dir and the N most-recently-used survive."""
    import os
    import time

    from ringo_spark.operators.similarity import gc_index_root

    root = str(tmp_path / "idx")
    os.makedirs(root)
    dirs = []
    for i in range(6):
        d = os.path.join(root, f"k4-fp{i}")
        os.makedirs(d)
        t = 1_000_000 + i * 100  # strictly increasing "last used" times
        os.utime(d, (t, t))
        dirs.append(d)
    fresh = os.path.join(root, "k4-fresh")
    os.makedirs(fresh)
    os.utime(fresh, (999, 999))  # oldest mtime, but protected

    removed = gc_index_root(root, keep=3, protect=fresh)
    left = set(os.listdir(root))
    assert set(removed) == set(dirs[:3])
    assert left == {"k4-fresh", "k4-fp3", "k4-fp4", "k4-fp5"}
    # idempotent: nothing further to collect
    assert gc_index_root(root, keep=3, protect=fresh) == []


def test_gc_never_removes_recently_used_index(tmp_path):
    """Min-age shield (r06 ADVICE): with more than keep-last-N corpora in
    rotation or concurrent sessions sharing the root, a recently-USED
    index may have live frames over it — LRU must not rmtree it even
    past the keep count.  Only dirs idle past min_age_seconds are
    eligible."""
    import os
    import time

    from ringo_spark.operators.similarity import gc_index_root

    root = str(tmp_path / "idx")
    os.makedirs(root)
    now = time.time()
    for i in range(6):
        d = os.path.join(root, f"k4-busy{i}")
        os.makedirs(d)
        os.utime(d, (now - i, now - i))       # all used seconds ago
    stale = os.path.join(root, "k4-stale")
    os.makedirs(stale)
    os.utime(stale, (now - 7 * 3600,) * 2)    # idle past the shield

    removed = gc_index_root(root, keep=3, min_age_seconds=6 * 3600)
    assert removed == []                      # stale is within keep=3 of
                                              # eligible dirs (it's alone)
    removed = gc_index_root(root, keep=0, min_age_seconds=6 * 3600)
    assert removed == [stale]                 # only the idle dir ever goes
    assert len(os.listdir(root)) == 6


def test_index_builders_gc_stale_fingerprints(spark, tmp_path, monkeypatch):
    """End-to-end through a real builder: regenerating the source corpus
    changes the fingerprint, and stale-fingerprint index dirs beyond
    keep-last-N are removed by the next build."""
    import os
    import shutil

    from ringo_spark import index_lifecycle as ilc
    from ringo_spark.operators import similarity as sim

    root = str(tmp_path / "lsh_root")
    monkeypatch.setattr(sim, "LSH_INDEX_ROOT", root)
    # ported to the shared kernel (VERDICT r14 item 3): the GC policy
    # knobs live in index_lifecycle now
    monkeypatch.setattr(ilc, "INDEX_KEEP_LAST", 1)
    # the dirs this test makes stale are seconds old; disable the
    # min-age live-index shield to exercise the LRU policy itself
    monkeypatch.setattr(ilc, "GC_MIN_AGE_SECONDS", 0)

    src = str(tmp_path / "sf")
    os.makedirs(src)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    built = []
    for i in range(3):  # regenerate the corpus -> new fingerprint each time
        shutil.rmtree(f"{src}/embeddings.parquet", ignore_errors=True)
        emb.limit(40 + i).write.parquet(f"{src}/embeddings.parquet")
        built.append(sim.build_lsh_index(spark, src))
    assert len(set(built)) == 3
    left = {os.path.join(root, d) for d in os.listdir(root)}
    # only keep-last-N (=1) plus the fresh build survive
    assert built[-1] in left and len(left) <= 2
    # cache hit on the survivor still serves (marker touched, not rebuilt)
    assert sim.build_lsh_index(spark, src) == built[-1]


def test_capped_indexed_matches_live_capped(spark):
    """The collapsed persisted index serves the identical capped pairs as
    the live collapse+cap recompute — the proof that lets the indexed
    variant share the capped oracle."""
    from ringo_spark.operators.dedup import (
        dedup_minhash_lsh_capped_df, dedup_minhash_lsh_capped_indexed_df,
    )

    live = {tuple(r) for r in dedup_minhash_lsh_capped_df(spark, SF).collect()}
    idx = {tuple(r)
           for r in dedup_minhash_lsh_capped_indexed_df(spark, SF).collect()}
    assert idx == live and live


def test_minhash_index_append_equals_full_rebuild(spark, tmp_path):
    """Index lifecycle: corpus index + appended batch == index built from
    the full corpus (per-doc signatures are independent), so admission
    cost stays O(batch) while queries see the same candidate space."""
    import os

    from ringo_spark.operators.dedup import (
        append_to_minhash_index, build_minhash_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_dir = str(tmp_path / "corpus")
    full_dir = str(tmp_path / "full")
    os.makedirs(corpus_dir)
    os.makedirs(full_dir)
    docs.where(F.col("doc_id") < 300).write.parquet(
        f"{corpus_dir}/documents.parquet")
    docs.write.parquet(f"{full_dir}/documents.parquet")

    grown = build_minhash_index(spark, corpus_dir)
    append_to_minhash_index(spark, grown,
                            docs.where(F.col("doc_id") >= 300))
    full = build_minhash_index(spark, full_dir)

    for part in ("bands", "shingles"):
        a = {tuple(map(str, r))
             for r in spark.read.parquet(os.path.join(grown, part)).collect()}
        b = {tuple(map(str, r))
             for r in spark.read.parquet(os.path.join(full, part)).collect()}
        assert a == b and a, part


def test_ivf_index_append_equals_full_rebuild(spark, tmp_path):
    """IVF lifecycle twin of the minhash append test: corpus index +
    appended batch routes every vector to the same cell as a full
    rebuild, because appends assign with the index's stored centroids."""
    import os

    from ringo_spark.operators.similarity import (
        IVF_K, append_to_ivf_index, build_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus_dir = str(tmp_path / "corpus")
    full_dir = str(tmp_path / "full")
    os.makedirs(corpus_dir)
    os.makedirs(full_dir)
    # corpus holds vec_id < 400 (⊇ the centroid seeds vec_id < IVF_K),
    # so the full rebuild derives the identical centroid set
    assert 400 > IVF_K
    emb.where(F.col("vec_id") < 400).write.parquet(
        f"{corpus_dir}/embeddings.parquet")
    emb.write.parquet(f"{full_dir}/embeddings.parquet")

    grown = build_ivf_index(spark, corpus_dir)
    append_to_ivf_index(spark, grown, emb.where(F.col("vec_id") >= 400))
    full = build_ivf_index(spark, full_dir)

    a = {(r.vec_id, r.cell) for r in spark.read.parquet(grown).collect()}
    b = {(r.vec_id, r.cell) for r in spark.read.parquet(full).collect()}
    assert a == b and a


def test_ivf_staleness_flags_drift_and_skew(spark, tmp_path):
    """VERDICT r14 item 4 falsifiability: same-distribution halves
    report stale=false (the registered row's pinned verdict); injected
    DRIFTED appends flip the flag through the qerr-ratio clause, and
    injected HOT-CELL appends flip it through the skew clause — both
    trip wires are live, neither fires on honest data."""
    from ringo_spark.operators.similarity import (
        IVF_STALE_QERR_RATIO, IVF_STALE_SKEW, ann_index_staleness_df,
        auto_ivf_k, build_ivf_index, ivf_staleness_report,
    )

    df = ann_index_staleness_df(spark, SF)
    row = df.first()
    assert row.stale is False
    assert row.qerr_ratio < IVF_STALE_QERR_RATIO   # headroom visible
    assert row.skew_append < IVF_STALE_SKEW
    assert row.n_build > 0 and row.n_append > 0
    # report-shaped plan: pure JVM, and the only hashpartitioning
    # exchanges are the two map-side-combining aggregate phases
    # (epoch-cell stats, then per-vector argmax) — nothing corpus-sized
    # beyond them, no Python evaluators
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    p = build_ivf_index(
        spark, SF, k=auto_ivf_k(spark, half),
        index_path=str(tmp_path / "stale-idx"),
        emb=emb.where(F.col("vec_id") < half))
    upper = emb.where(F.col("vec_id") >= half)

    # drift: every appended vector points AWAY from the stored centroid
    # set (the negated mean of the normalized centroids — best cosine
    # goes negative, qerr ratio trips); a tiny per-row wiggle keeps
    # vec rows distinct
    import numpy as np

    import os as _o
    cent = spark.read.parquet(_o.path.join(p, "_centroids")).collect()
    C = np.array([r.cvec for r in cent])
    v = -(C / np.linalg.norm(C, axis=1, keepdims=True)).mean(axis=0)
    vlit = F.array(*[F.lit(float(x)) for x in v])
    drifted = upper.select(
        "vec_id",
        F.transform(vlit, lambda x, i: x + F.when(
            i == 0, F.col("vec_id") * 1e-9).otherwise(F.lit(0.0)))
        .alias("embedding"))
    rep = ivf_staleness_report(spark, p, drifted).first()
    assert rep.stale is True
    assert rep.qerr_ratio > IVF_STALE_QERR_RATIO

    # skew: every appended vector is a perturbed copy of centroid 0 —
    # all land in one cell, the load factor trips (qerr stays tiny, so
    # ONLY the skew clause can be firing)
    # centroid-0 literal + a tiny vec_id-dependent wiggle on one dim
    # keeps rows distinct but co-celled
    c0 = emb.where(F.col("vec_id") == 0).first().embedding
    base = F.array(*[F.lit(float(v)) for v in c0])
    hot = upper.select(
        "vec_id",
        F.transform(base, lambda v, i: v + F.when(
            i == 0, F.col("vec_id") * 1e-9).otherwise(F.lit(0.0)))
        .alias("embedding"))
    rep2 = ivf_staleness_report(spark, p, hot).first()
    assert rep2.stale is True
    assert rep2.skew_append > IVF_STALE_SKEW
    assert rep2.qerr_ratio <= IVF_STALE_QERR_RATIO


def test_index_stats_sidecar_matches_rescan_exactly(spark, tmp_path):
    """The r16 stats sidecars are a pure cost optimization: the
    staleness/width reports must be CELL-IDENTICAL whether the stored
    side comes from the sidecar or from a full rescan, and a torn
    append (data landed, stats write crashed) must be detected by the
    row-count validity check and fall back to the rescan."""
    import os
    import shutil

    from ringo_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    p = sim.build_ivf_index(
        spark, SF, k=sim.auto_ivf_k(spark, half),
        index_path=str(tmp_path / "idx"),
        emb=emb.where(F.col("vec_id") < half))
    batch = emb.where(F.col("vec_id") >= half)

    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    via_sidecar = sim.ivf_staleness_report(spark, p, batch).first()
    shutil.rmtree(os.path.join(p, "_stats"))
    via_rescan = sim.ivf_staleness_report(spark, p, batch).first()
    assert via_sidecar == via_rescan

    # torn append: admit a batch with the stats write crashed away —
    # the sidecar (restored by backfill below) must NOT be trusted
    sim._backfill_ivf_stats(spark, p)
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    real_write = sim._write_ivf_stats
    sim._write_ivf_stats = lambda *a, **k: None
    try:
        sim.append_to_ivf_index(spark, p, batch)
    finally:
        sim._write_ivf_stats = real_write
    torn = sim.ivf_staleness_report(spark, p, batch).first()
    shutil.rmtree(os.path.join(p, "_stats"))
    full_rescan = sim.ivf_staleness_report(spark, p, batch).first()
    assert torn == full_rescan
    assert torn.n_build == 2 * half + (n - 2 * half)  # appended rows seen

    # LSH twin: sidecar report == rescan report
    lp = sim.build_lsh_index(spark, SF, bits=sim.LSH_BITS,
                             index_path=str(tmp_path / "lsh"))
    assert os.path.exists(os.path.join(lp, "_stats", "_SUCCESS"))
    l_sidecar = sim.lsh_width_report(spark, lp, sim.LSH_BITS,
                                     sim.LSH_BITS).first()
    shutil.rmtree(os.path.join(lp, "_stats"))
    l_rescan = sim.lsh_width_report(spark, lp, sim.LSH_BITS,
                                    sim.LSH_BITS).first()
    assert l_sidecar == l_rescan


def test_ivf_build_gate_requires_sidecars(spark, tmp_path):
    """ADVICE r15: the cached-serve gate must not accept an index whose
    ``_centroids`` sub-write crashed away (the root ``_SUCCESS`` lands
    during the MAIN write, before the sidecars) — the append and
    staleness paths hard-depend on it.  A missing sidecar must rebuild;
    a missing stats log alone is backfilled, not rebuilt."""
    import os
    import shutil

    from ringo_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sub = emb.where(F.col("vec_id") < 300)
    p = str(tmp_path / "idx")
    sim.build_ivf_index(spark, SF, k=16, index_path=p, emb=sub)

    # crash window: _centroids never landed => the gate misses, rebuild
    shutil.rmtree(os.path.join(p, "_centroids"))
    sim.build_ivf_index(spark, SF, k=16, index_path=p, emb=sub)
    assert os.path.exists(os.path.join(p, "_centroids", "_SUCCESS"))

    # pre-sidecar cache dir: stats missing alone => served + backfilled
    shutil.rmtree(os.path.join(p, "_stats"))
    before = os.stat(os.path.join(p, "_centroids", "_SUCCESS")).st_mtime_ns
    sim.build_ivf_index(spark, SF, k=16, index_path=p, emb=sub)
    after = os.stat(os.path.join(p, "_centroids", "_SUCCESS")).st_mtime_ns
    assert before == after                      # no rebuild happened
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))


def test_ivf_staleness_detect_retrain_clear(spark, tmp_path):
    """The IVF remediation lifecycle end-to-end (r16, VERDICT r15 item
    3 — the exact twin of the LSH detect→rebucket→clear pin below): a
    half-corpus index sees a structurally drifted batch (7 sub-modes
    around the anti-aligned direction — a multi-domain distribution
    shift), the report flags it; the batch is admitted, the index is
    retrained IN PLACE through the kernel's crash-safe swap; re-running
    the report over the same arrivals goes quiet on BOTH clauses."""
    import os

    import numpy as np

    from ringo_spark import index_lifecycle as ilc
    from ringo_spark.operators.similarity import (
        IVF_STALE_QERR_RATIO, IVF_STALE_SKEW, append_to_ivf_index,
        auto_ivf_k, build_ivf_index, ivf_staleness_report,
        retrain_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    p = build_ivf_index(
        spark, SF, k=auto_ivf_k(spark, half),
        index_path=str(tmp_path / "idx"),
        emb=emb.where(F.col("vec_id") < half))

    cent = spark.read.parquet(os.path.join(p, "_centroids")).collect()
    C = np.array([r.cvec for r in cent])
    v = -(C / np.linalg.norm(C, axis=1, keepdims=True)).mean(axis=0)
    vhat = v / np.linalg.norm(v)
    vlit = F.array(*[F.lit(float(x)) for x in vhat])
    # 7 structured sub-modes (%7 is coprime with any power-of-two id
    # pattern): anti-aligned core + a one-hot offset per mode + tiny
    # per-row noise — drifted enough to trip qerr, structured enough
    # that a retrain can actually partition it
    mode = F.col("vec_id") % 7
    drifted = emb.where(F.col("vec_id") >= half).select(
        "vec_id",
        F.zip_with(
            F.zip_with(vlit, F.col("embedding"),
                       lambda a, b: a + F.lit(0.05) * b.cast("double")),
            F.sequence(F.lit(0), F.lit(63)),
            lambda x, i: x + F.when(i == (F.lit(8) + mode), F.lit(0.6))
                              .otherwise(F.lit(0.0)))
        .cast("array<float>").alias("embedding"))

    before = ivf_staleness_report(spark, p, drifted).first()
    assert before.stale is True
    assert before.qerr_ratio > IVF_STALE_QERR_RATIO

    append_to_ivf_index(spark, p, drifted)
    out = retrain_ivf_index(spark, p, iters=4)
    # in-place through the kernel swap: same live path, no leftovers,
    # rebuilt sidecars complete
    assert out == p
    tmp_sib, old_sib = ilc.swap_paths(p)
    assert not os.path.exists(tmp_sib) and not os.path.exists(old_sib)
    for sidecar in ("_centroids", "_stats"):
        assert os.path.exists(os.path.join(p, sidecar, "_SUCCESS"))

    after = ivf_staleness_report(spark, p, drifted).first()
    assert after.stale is False
    assert after.qerr_ratio < IVF_STALE_QERR_RATIO
    assert after.skew_append < IVF_STALE_SKEW
    # the retrain admitted the batch into the build epoch
    assert after.n_build == before.n_build + before.n_append


def test_lsh_width_staleness_detect_rebucket_clear(spark, tmp_path):
    """The LSH width trigger's full lifecycle (r15, the LSH twin of the
    IVF staleness falsifiability pin): the registered row at the auto
    width reports stale=false; an index BUILT NARROW (the corpus
    outgrew it) flips the flag with visibly inflated bucket occupancy;
    rebucketing at the gate width clears it and deflates the buckets."""
    from ringo_spark.operators.similarity import (
        _auto_ann_bits, build_lsh_index, lsh_width_report,
        lsh_width_staleness_df, rebucket_lsh_index,
    )

    row = lsh_width_staleness_df(spark, SF).first()
    assert row.stale is False and row.built_bits == row.auto_bits
    assert row.n_vectors > 0 and row.n_buckets > 1

    auto = _auto_ann_bits(spark, SF)
    assert auto >= 2
    narrow = build_lsh_index(spark, SF, bits=auto - 2,
                             index_path=str(tmp_path / "narrow"))
    rep = lsh_width_report(spark, narrow, auto - 2, auto).first()
    assert rep.stale is True
    assert rep.n_buckets < row.n_buckets          # coarser partitioning
    assert rep.mean_bucket_rows > row.mean_bucket_rows

    fixed = rebucket_lsh_index(spark, narrow, auto)
    rep2 = lsh_width_report(spark, fixed, auto, auto).first()
    assert rep2.stale is False
    assert rep2.n_vectors == rep.n_vectors        # nothing lost
    assert rep2.max_bucket_rows <= rep.max_bucket_rows
    assert rep2.n_buckets > rep.n_buckets


def test_lsh_index_append_equals_full_rebuild(spark, tmp_path):
    """LSH lifecycle: bucket assignment is stateless, so corpus index +
    appended batch is file-for-file equivalent to a full rebuild."""
    import os

    from ringo_spark.operators.similarity import (
        append_to_lsh_index, build_lsh_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus_dir = str(tmp_path / "corpus")
    full_dir = str(tmp_path / "full")
    os.makedirs(corpus_dir)
    os.makedirs(full_dir)
    emb.where(F.col("vec_id") < 400).write.parquet(
        f"{corpus_dir}/embeddings.parquet")
    emb.write.parquet(f"{full_dir}/embeddings.parquet")

    grown = build_lsh_index(spark, corpus_dir)
    append_to_lsh_index(spark, grown, emb.where(F.col("vec_id") >= 400))
    full = build_lsh_index(spark, full_dir)

    a = {(r.vec_id, r.bucket) for r in spark.read.parquet(grown).collect()}
    b = {(r.vec_id, r.bucket) for r in spark.read.parquet(full).collect()}
    assert a == b and a


def test_benchmark_contamination_flags_planted_overlap(spark, tmp_path):
    """A train doc that quotes a benchmark passage verbatim is flagged;
    an unrelated doc scores zero."""
    import os

    from ringo_spark.operators.text import (
        BENCHMARK_BELOW, benchmark_contamination_df,
    )

    bench_text = " ".join(f"bench{i}" for i in range(30))
    quoting = " ".join(f"bench{i}" for i in range(25)) + " extra tail words"
    clean = " ".join(f"clean{i}" for i in range(30))
    rows = [(0, bench_text),
            (BENCHMARK_BELOW + 1, quoting),
            (BENCHMARK_BELOW + 2, clean)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")

    out = {r.doc_id: r for r in benchmark_contamination_df(spark, d).collect()}
    assert out[BENCHMARK_BELOW + 1].is_contaminated
    assert out[BENCHMARK_BELOW + 1].contamination > 0.7
    assert out[BENCHMARK_BELOW + 2].n_hit == 0
    assert not out[BENCHMARK_BELOW + 2].is_contaminated


def test_training_prep_composition_invariants(spark):
    """The end-to-end prep pipeline: all three splits populated, chunks
    dominate docs, every chunk non-empty, and the guards (decon + dedup)
    actually remove documents relative to the raw quality-passing set."""
    from ringo_spark.operators.pipeline import (
        KEEP_LANGS, MIN_QUALITY, MIN_WORDS, training_prep_df,
    )
    from ringo_spark.operators.text import BENCHMARK_BELOW
    from ringo_spark.operators.text import quality_score_expr
    from ringo_spark.operators.textfn import tokens

    out = {r.split: r for r in training_prep_df(spark, SF).collect()}
    assert set(out) == {"train", "val", "test"}
    for r in out.values():
        assert r.n_chunks >= r.n_docs > 0
        assert r.total_chunk_tokens >= r.n_chunks

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    candidates = (docs.where(F.col("doc_id") >= BENCHMARK_BELOW)
                  .where((F.size(tokens(F.col("text"))) >= MIN_WORDS)
                         & (F.round(quality_score_expr(), 6) >= MIN_QUALITY)
                         & F.col("lang").isin(*KEEP_LANGS))
                  .count())
    assert sum(r.n_docs for r in out.values()) < candidates


def test_cluster_split_is_leak_proof(spark):
    """The near-dup-aware split's defining invariant: for every verified
    near-dup pair, both docs land in the SAME split — and the split
    disagrees with the naive per-doc hash split for at least one
    clustered doc (i.e. the operator actually changes assignments)."""
    from ringo_spark.operators.dedup import dedup_minhash_lsh_indexed_df
    from ringo_spark.operators.sampling import (
        sample_cluster_split_df, sample_hash_split_df,
    )

    split = {r.doc_id: r.split
             for r in sample_cluster_split_df(spark, SF).collect()}
    pairs = [(r.doc_a, r.doc_b)
             for r in dedup_minhash_lsh_indexed_df(spark, SF).collect()]
    assert pairs
    for a, b in pairs:
        assert split[a] == split[b], (a, b)
    naive = {r.doc_id: r.split
             for r in sample_hash_split_df(spark, SF).collect()}
    clustered = {d for p in pairs for d in p}
    assert any(split[d] != naive[d] for d in clustered)

    # the persisted-cluster-table variant serves the IDENTICAL split
    # (clustering amortized to build time), so the invariant and the
    # shared oracle both carry over
    from ringo_spark.operators.sampling import sample_cluster_split_indexed_df

    indexed = {r.doc_id: r.split
               for r in sample_cluster_split_indexed_df(spark, SF).collect()}
    assert indexed == split


def test_repetition_metrics_on_synthetic_docs(spark, tmp_path):
    """A looping doc is flagged on both signals; varied text on neither;
    a 2-token doc exercises the short-doc guards (no trigram, no crash)."""
    import os

    from ringo_spark.operators.text import text_repetition_df

    loop = "spam ham " * 30
    varied = " ".join(f"w{i}" for i in range(60))
    rows = [(1, loop.strip()), (2, varied), (3, "just two")]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")

    out = {r.doc_id: r for r in text_repetition_df(spark, d).collect()}
    assert out[1].is_repetitive
    assert out[1].top_bigram_frac > 0.4 and out[1].dup_trigram_frac > 0.9
    assert not out[2].is_repetitive
    assert out[2].top_bigram_frac < 0.05 and out[2].dup_trigram_frac == 0.0
    assert out[3].dup_trigram_frac == 0.0 and not out[3].is_repetitive


def test_average_hash_properties():
    """aHash unit semantics: a constant image hashes to 0 (no cell is
    strictly above the mean); a hard left/right split sets exactly the
    bright half's bits; a re-encode round trip never changes the hash."""
    from ringo_spark.operators.multimodal import (
        PHASH_GW, average_hash, decode_png_pixels, encode_png,
    )

    w, h = 8, 6
    flat = bytes([100] * (w * h * 3))
    assert average_hash(flat, w, h) == 0

    split = bytearray()
    for y in range(h):
        for x in range(w):
            v = 255 if x >= w // 2 else 0
            split += bytes([v, v, v])
    a = average_hash(bytes(split), w, h)
    for k in range(12):
        assert bool(a >> k & 1) == (k % PHASH_GW >= PHASH_GW // 2)

    # synthetic corpus round trip: decode(encode(id)) is deterministic
    w2, h2, px = decode_png_pixels(encode_png(7))
    assert average_hash(px, w2, h2) == average_hash(px, w2, h2)


def test_with_cell_matches_cell_expr(spark):
    """_with_cell's hoisted-norm restructuring is a pure cost rewrite:
    the assignment it produces must be bit-identical to the reference
    single-Column argmax (_cell_expr) for the same centroids."""
    from ringo_spark.operators import similarity as sim

    emb = sim._emb(spark, "/root/testdata/sf0.001")
    cent = [(int(r.cid), [float(x) for x in r.cvec])
            for r in sim._ivf_centroid_rows(emb)]
    a = {r.vec_id: r.cell for r in
         emb.select("vec_id", sim._cell_expr(cent).alias("cell")).collect()}
    b = {r.vec_id: r.cell for r in
         sim._with_cell(emb, cent).select("vec_id", "cell").collect()}
    assert a == b and a

    # the large-K join form is the same assignment (r09 VERDICT item 4:
    # the literal tree is gated; this is what runs above the gate)
    c = {r.vec_id: r.cell for r in
         sim._with_cell_join(emb, cent).select("vec_id", "cell").collect()}
    assert a == c


def test_cell_assignment_literal_k_gate(spark):
    """r09 VERDICT item 4: the literal-expression assignment forms are
    gated at CELL_ASSIGN_LITERAL_MAX_K.  _cell_expr (no id column to
    join on) raises past the gate; _with_cell transparently switches to
    the broadcast centroid-join argmax and still assigns every row."""
    import pytest as _pytest

    from ringo_spark.operators import similarity as sim

    emb = sim._emb(spark, "/root/testdata/sf0.001")
    k_over = sim.CELL_ASSIGN_LITERAL_MAX_K + 1
    # synthetic centroid set one past the gate (unit basis vectors,
    # cycled) — content is irrelevant to the gate itself
    cent = [(i, [1.0 if j == i % sim.EMB_DIM else 0.0
                 for j in range(sim.EMB_DIM)]) for i in range(k_over)]

    with _pytest.raises(ValueError, match="gated at K="):
        sim._cell_expr(cent)

    assigned = sim._with_cell(emb.limit(50), cent)
    rows = assigned.select("vec_id", "cell").collect()
    assert len(rows) == 50
    assert all(r.cell is not None for r in rows)


def test_embedding_lsh_pairs_are_subset_of_exact(spark):
    """dedup_embedding_lsh's contract: every pair it emits is a pair the
    exact quadratic baseline emits (same threshold, same cosine), and
    bucket recall is non-trivial (finds a meaningful fraction)."""
    from ringo_spark.operators.dedup import (
        dedup_embedding_df, dedup_embedding_lsh_df,
    )

    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in dedup_embedding_df(spark, SF).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine
           for r in dedup_embedding_lsh_df(spark, SF).collect()}
    assert exact and lsh
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # 16 buckets single-probe at p~0.63/bit: expect ~p^4 of true pairs
    assert len(lsh) >= 0.1 * len(exact)
    # the Hamming-1 probing knob buys the predicted extra recall
    from ringo_spark.operators.dedup import dedup_embedding_lsh_df as _f

    probed = {(r.vec_a, r.vec_b)
              for r in _f(spark, SF, probe_hamming1=True).collect()}
    assert set(lsh) <= probed <= set(exact)
    assert len(probed) > len(lsh)


def test_doc_logprob_orders_rare_above_common(spark, tmp_path):
    """Unigram LM scoring sanity: a document of corpus-rare tokens must
    score more surprising than one of corpus-common tokens, and the mean
    equals the hand-computed value on a closed vocabulary."""
    import math
    import os

    from ringo_spark.operators.text import doc_logprob_df

    rows = [(1, "common common common common"),
            (2, "common common common rare")]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")
    out = {r.doc_id: r for r in doc_logprob_df(spark, d).collect()}
    assert out[2].mean_neg_logprob > out[1].mean_neg_logprob
    # hand-check doc 1: all tokens 'common' (7 of 8 corpus tokens)
    expect = round(round(-math.log(7 / 8), 6), 6)
    assert abs(out[1].mean_neg_logprob - expect) < 1e-9


def test_gapfill_output_is_dense_and_carries_forward(spark):
    """timeseries_gapfill invariants: per series the minute axis is
    gap-free from first to last observation, filled values never null,
    and each gap row carries exactly the previous non-gap value."""
    from ringo_spark.operators.relational import timeseries_gapfill_df

    rows = timeseries_gapfill_df(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    saw_gap = False
    for et, rs in by_series.items():
        rs.sort(key=lambda r: r.m)
        ms = [r.m for r in rs]
        assert ms == list(range(ms[0], ms[-1] + 1)), et
        last_obs = None
        for r in rs:
            assert r.v_filled is not None
            if r.is_gap:
                saw_gap = True
                assert r.v_filled == last_obs
            else:
                last_obs = r.v_filled
    assert saw_gap, "testdata should contain minute gaps"


def test_sample_temperature_flattens_mixture(spark):
    """Temperature sampling invariants: the smallest language keeps
    rate 1.0 (down-sampling only — no document is ever duplicated), and
    the realized distribution is FLATTER than the input (max/min count
    ratio shrinks toward n^alpha)."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.sampling import (
        TEMP_ALPHA, sample_temperature_df,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    before = {r.lang: r.n for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = sample_temperature_df(spark, sf)
    rates = {r.lang: r.keep_rate for r in
             out.select("lang", "keep_rate").distinct().collect()}
    smallest = min(before, key=before.get)
    assert rates[smallest] == 1.0
    assert all(0 < r <= 1.0 for r in rates.values())
    after = {r.lang: r.n for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # every language survives, none grows
    assert set(after) == set(before)
    assert all(after[l] <= before[l] for l in before)
    ratio_before = max(before.values()) / min(before.values())
    ratio_after = max(after.values()) / min(after.values())
    assert ratio_after < ratio_before
    # α=0.5 halves the log-spread: realized ratio ≈ sqrt(input ratio)
    assert ratio_after < ratio_before ** (TEMP_ALPHA + 0.25)


def test_dedup_containment_catches_subset_jaccard_misses(spark, tmp_path):
    """The capability claim itself: a short document wholly embedded in
    a much longer one must be flagged by the containment detector with
    containment ≈ 1 while its Jaccard sits BELOW the Jaccard dedup
    threshold — i.e. the pair is invisible to dedup_minhash_lsh and
    visible to dedup_containment."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.dedup import (
        JACCARD_THRESHOLD, dedup_containment_df, dedup_minhash_lsh_df,
    )

    quote = " ".join(f"tok{i} word{i} item{i}" for i in range(12))
    host = quote + " " + " ".join(
        f"filler{i} extra{i} pad{i} more{i}" for i in range(60))
    other = " ".join(f"unrelated{i} noise{i}" for i in range(30))
    rows = [(0, quote, "en", "src0", len(quote)),
            (1, host, "en", "src0", len(host)),
            (2, other, "en", "src1", len(other))]
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .coalesce(1).write.parquet(str(tmp_path / "documents.parquet")))

    got = {(r.doc_a, r.doc_b): r
           for r in dedup_containment_df(spark, str(tmp_path)).collect()}
    assert (0, 1) in got, "embedded quote pair not flagged"
    pair = got[(0, 1)]
    assert pair.containment_a_in_b >= 0.95      # quote ⊂ host
    assert pair.jaccard < JACCARD_THRESHOLD     # invisible to Jaccard
    jac_pairs = {(r.doc_a, r.doc_b)
                 for r in dedup_minhash_lsh_df(spark, str(tmp_path)).collect()}
    assert (0, 1) not in jac_pairs


def test_anomaly_zscore_degenerate_groups_guarded(spark, tmp_path):
    """Post-review hardening: singleton groups (variance divides by
    zero — an ANSI error in Spark even for doubles) and constant-valued
    groups (one-pass variance lands ULPs below zero from double
    cancellation — DuckDB's sqrt raises) must yield NULL zscore in BOTH
    engines instead of an error or a NaN-flagged false anomaly."""
    import datetime as dt

    import duckdb
    from pyspark.sql import Row

    from ringo_spark.operators.relational import (
        ANOMALY_ZSCORE_SQL, anomaly_zscore_df,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for et, vals in [("solo", [0.1]), ("const", [0.1] * 50),
                     ("norm", [float(i) for i in range(40)])]:
        for v in vals:
            rows.append(Row(event_id=eid, ts=t0, user_id=1,
                            event_type=et, value=v, props="{}"))
            eid += 1
    (spark.createDataFrame(rows).coalesce(1)
     .write.parquet(str(tmp_path / "events.parquet")))

    out = anomaly_zscore_df(spark, str(tmp_path)).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    assert all(r.zscore is None and r.is_anomaly is None
               for r in by_type["solo"] + by_type["const"])
    assert any(r.zscore is not None for r in by_type["norm"])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet/*.parquet'")
    got = con.execute(ANOMALY_ZSCORE_SQL).fetchall()   # must not raise
    assert len(got) == len(out)


def test_dup_chunk_fraction_catches_near_dup_docs(spark):
    """doc_dup_chunk_fraction (the cross-doc copy-fraction gate): every
    doc that minhash-LSH identifies as a near-duplicate (jaccard >= 0.5
    — on this corpus, near-identical clones sharing aligned verbatim
    10-token chunks) must be flagged keep=False, while the bulk of the
    corpus passes.  Definitional invariants ride along: dup_fraction in
    [0,1], keep <=> fraction under the threshold."""
    from ringo_spark.operators.dedup import (
        DUP_CHUNK_MAX_FRACTION, dedup_minhash_lsh_df,
        doc_dup_chunk_fraction_df,
    )

    sf = "/root/testdata/sf0.001"
    rows = doc_dup_chunk_fraction_df(spark, sf).collect()
    assert rows
    flagged = {r.doc_id for r in rows if not r.keep}
    for r in rows:
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.keep == (r.dup_fraction < DUP_CHUNK_MAX_FRACTION)
        assert r.n_dup_chunks <= r.n_chunks

    lsh_docs = set()
    for p in dedup_minhash_lsh_df(spark, sf).collect():
        lsh_docs.add(p.doc_a)
        lsh_docs.add(p.doc_b)
    assert lsh_docs, "fixture corpus lost its near-dup clones"
    assert lsh_docs <= flagged
    # the gate is selective, not a blanket drop
    assert len(flagged) < len(rows) / 2


def test_hard_negatives_exclude_near_dup_band(spark):
    """ann_hard_negatives: (a) no emitted negative sits in the near-dup
    band; (b) for at least one fixture query the exclusion actually
    changes the result vs plain top-k (the operator is not vacuous);
    (c) the per-query excluded count matches the exact count of
    near-dup neighbors."""
    from ringo_spark.operators.similarity import (
        HARD_NEG_CEIL, LSH_N_QUERIES, ann_hard_negatives_df,
    )
    from ringo_spark.operators.textfn import cosine as _cos

    sf = "/root/testdata/sf0.001"
    rows = ann_hard_negatives_df(spark, sf).collect()
    assert rows and all(r.cosine < HARD_NEG_CEIL for r in rows)

    excluded = {r.q_id: r.n_near_dup_excluded for r in rows}
    assert any(v > 0 for v in excluded.values()), \
        "fixture corpus lost its planted near-dup embeddings"

    # cross-check the excluded counts against a direct computation
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < LSH_N_QUERIES) \
           .select(F.col("vec_id").alias("q_id"),
                   F.col("embedding").alias("q_emb"))
    direct = {r.q_id: r.n for r in
              (emb.join(q, F.col("q_id") != F.col("vec_id"))
               .where(F.round(_cos(F.col("q_emb"), F.col("embedding")), 6)
                      >= HARD_NEG_CEIL)
               .groupBy("q_id").agg(F.count(F.lit(1)).alias("n"))).collect()}
    for qid, n in direct.items():
        assert excluded[qid] == n


def test_contract_queries_replication_invariant(spark, tmp_path):
    """Probe-backed scale bound for the r10 contract queries (VERDICT
    r10 item 6; wall-clock table in SCALE.md via `tools/scale_probe.py
    contracts`).  Under 3x salted replication (per-copy alphabet
    permutation — no shingle/chunk survives across copies):

    - dedup_lsh_recall_bounds emits the IDENTICAL row: its ground truth
      is audit-restricted, so appended non-audit docs change nothing —
      any drift means cross-copy contamination or a lost audit
      restriction (the quadratic cliff);
    - doc_dup_chunk_fraction is per-doc replication-invariant (copy-0
      rows equal the unreplicated run) and its shuffle payload — the
      chunk table, Σ n_chunks rows — grows exactly 3x, i.e. linearly
      with corpus tokens / W, never quadratically."""
    import random

    from ringo_spark.operators.dedup import (
        dedup_lsh_recall_bounds_df, doc_dup_chunk_fraction_df,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def salt(c):
        if c == 0:
            return alpha
        letters = list(alpha)
        random.Random(c).shuffle(letters)
        return "".join(letters)

    parts = [
        docs.select((F.col("doc_id") + c * n_docs).alias("doc_id"),
                    F.translate("text", alpha, salt(c)).alias("text"),
                    *[col for col in docs.columns
                      if col not in ("doc_id", "text")])
        for c in range(3)]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    rep = str(tmp_path / "x3")
    big.write.parquet(f"{rep}/documents.parquet")

    r1 = dedup_lsh_recall_bounds_df(spark, sf).collect()[0].asDict()
    r3 = dedup_lsh_recall_bounds_df(spark, rep).collect()[0].asDict()
    assert r1 == r3 and r1["n_true"] > 0

    f1 = {r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_fraction, r.keep)
          for r in doc_dup_chunk_fraction_df(spark, sf).collect()}
    rows3 = doc_dup_chunk_fraction_df(spark, rep).collect()
    assert len(rows3) == 3 * len(f1)
    copy0 = {r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_fraction, r.keep)
             for r in rows3 if r.doc_id < n_docs}
    assert copy0 == f1
    assert (sum(r.n_chunks for r in rows3)
            == 3 * sum(v[0] for v in f1.values()))


def test_dup_chunk_incremental_equals_batch_restriction(spark):
    """doc_dup_chunk_fraction_incremental: a batch doc's chunk is
    duplicated iff it occurs in the ingested corpus's index (disjoint
    doc ids) or in another batch doc — together exactly the batch
    operator's "occurs in any OTHER doc" criterion.  So the incremental
    output must EQUAL the batch gate restricted to the incoming docs
    (and be non-vacuous at this sf)."""
    from ringo_spark.operators.dedup import (
        INGESTED_BELOW, doc_dup_chunk_fraction_df,
        doc_dup_chunk_fraction_incremental_df,
    )

    sf = "/root/testdata/sf0.01"
    inc = {tuple(r) for r in
           doc_dup_chunk_fraction_incremental_df(spark, sf).collect()}
    batch = {tuple(r) for r in doc_dup_chunk_fraction_df(spark, sf).collect()
             if r.doc_id >= INGESTED_BELOW}
    assert inc == batch and len(inc) > 0
    assert any(not keep for (_, _, _, _, keep) in inc)   # gate bites


def test_embedding_incremental_equals_lsh_restriction(spark):
    """dedup_embedding_incremental: probing the ingested corpus's
    buckets with the batch vectors is exactly the batch LSH pair set
    restricted to pairs with ONE endpoint in the modulo batch split
    (batch-batch pairs are the batch operators' concern) — and
    non-vacuous."""
    from ringo_spark.operators.dedup import (
        EMB_INGEST_MOD, dedup_embedding_incremental_df,
        dedup_embedding_lsh_df,
    )

    sf = "/root/testdata/sf0.01"
    inc = {(r.vec_seen, r.vec_new, r.cosine)
           for r in dedup_embedding_incremental_df(spark, sf).collect()}

    def is_batch(v):
        return v % EMB_INGEST_MOD == 0

    lsh = set()
    for r in dedup_embedding_lsh_df(spark, sf).collect():
        if is_batch(r.vec_a) != is_batch(r.vec_b):
            seen, new_ = ((r.vec_b, r.vec_a) if is_batch(r.vec_a)
                          else (r.vec_a, r.vec_b))
            lsh.add((seen, new_, r.cosine))
    assert inc == lsh and len(inc) > 0


def test_quality_drift_flags_injected_drift(spark, tmp_path):
    """text_quality_drift falsifiability: truncating ONE source's batch
    documents to their first few tokens must flip that source's verdict
    to drifted while unmodified sources stay undrifted — the gate
    constrains the data, not a tautology."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.text import (
        DRIFT_BASELINE_BELOW, text_quality_drift_df,
    )

    sf = "/root/testdata/sf0.01"
    base_rows = {r.source: r for r in
                 text_quality_drift_df(spark, sf).collect()}
    assert base_rows and any(r.drift_z is not None
                             for r in base_rows.values())

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    # victim must have a non-degenerate baseline (n_base > 1, var > 0),
    # or truncation cannot move a NULL verdict
    victim = sorted(s for s, r in base_rows.items()
                    if r.drift_z is not None)[0]
    truncate = (F.col("source") == victim) \
        & (F.col("doc_id") >= DRIFT_BASELINE_BELOW)
    mutated = docs.withColumn(
        "text", F.when(truncate,
                       F.array_join(F.slice(F.split("text", "\\s+"), 1, 3),
                                    " "))
        .otherwise(F.col("text")))
    d = str(tmp_path / "drifted")
    mutated.write.parquet(f"{d}/documents.parquet")

    got = {r.source: r for r in text_quality_drift_df(spark, d).collect()}
    assert got[victim].drifted is True
    others_defined = [r for s, r in got.items()
                      if s != victim and r.drifted is not None]
    assert others_defined and not all(r.drifted for r in others_defined)
    # unmodified sources keep their original verdicts
    for s, r in got.items():
        if s != victim and base_rows[s].drift_z is not None:
            assert r.drift_z == base_rows[s].drift_z


def test_doc_dedup_spans_policy(spark):
    """Span-removal invariants: (1) exactly one canonical occurrence of
    every duplicated chunk survives corpus-wide — total removals equal
    total occurrences minus distinct hashes over the duplicated set;
    (2) a doc with no removals reconstructs to its whitespace-normalized
    token stream; (3) a doc with removals loses exactly W tokens per
    removed chunk."""
    from ringo_spark.operators.dedup import (
        DUP_CHUNK_TOKENS, _chunk_hashes, doc_dedup_spans_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = {r.doc_id: r for r in doc_dedup_spans_df(spark, SF).collect()}
    assert len(out) == docs.count()

    counts = (_chunk_hashes(docs).groupBy("h")
              .agg(F.count(F.lit(1)).alias("c")).collect())
    expected_removed = sum(r.c - 1 for r in counts if r.c > 1)
    assert expected_removed > 0, "testdata should contain duplicated chunks"
    assert sum(r.n_removed for r in out.values()) == expected_removed

    texts = {r.doc_id: r.text for r in docs.collect()}
    touched = 0
    for doc_id, r in out.items():
        norm = " ".join(texts[doc_id].split())
        if r.n_removed == 0:
            assert r.cleaned_text == norm
        else:
            touched += 1
            lost = len(norm.split()) - len(r.cleaned_text.split())
            assert lost == r.n_removed * DUP_CHUNK_TOKENS
    assert touched > 0


def test_rebucket_lsh_index_equals_fresh_build(spark, tmp_path):
    """Re-bucketing a persisted LSH index at a wider width (the
    auto-bits lifecycle step) is bit-identical to a fresh build at that
    width: same (vec_id -> bucket) assignment, same per-bucket vector
    sets — so probes keep exact ann_lsh_bucketed semantics."""
    from ringo_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.001"
    old = sim.build_lsh_index(spark, sf, bits=4,
                              index_path=str(tmp_path / "idx4"))
    rb = sim.rebucket_lsh_index(spark, old, 6,
                                out_path=str(tmp_path / "idx6rb"))
    fresh = sim.build_lsh_index(spark, sf, bits=6,
                                index_path=str(tmp_path / "idx6"))

    def load(p):
        return {(r.vec_id, int(r.bucket), tuple(r.embedding))
                for r in spark.read.parquet(p).collect()}

    got, want = load(rb), load(fresh)
    assert got == want and len(got) == 500
    # genuinely re-bucketed, not a copy: widths differ
    assert {b for _, b, _ in load(old)} != {b for _, b, _ in got}


def test_doc_dedup_spans_incremental_equals_batch_restriction(spark):
    """The ingestion twin's contract: corpus ids precede batch ids, so
    probing the corpus chunk index + in-batch least-owner IS the global
    least-(doc_id, i) rule restricted to batch docs — row-identical to
    the batch operator's batch-doc rows, non-vacuously (some batch doc
    must lose chunks to a CORPUS owner, not just to in-batch dups)."""
    from ringo_spark.operators.dedup import (
        INGESTED_BELOW, _chunk_hashes, doc_dedup_spans_df,
        doc_dedup_spans_incremental_df,
    )

    inc = sorted(tuple(r) for r in
                 doc_dedup_spans_incremental_df(spark, SF).collect())
    batch = sorted(tuple(r) for r in doc_dedup_spans_df(spark, SF).collect()
                   if r[0] >= INGESTED_BELOW)
    assert inc == batch and inc

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_h = {r.h for r in _chunk_hashes(
        docs.where(F.col("doc_id") < INGESTED_BELOW)).collect()}
    batch_hits = (_chunk_hashes(docs.where(F.col("doc_id") >= INGESTED_BELOW))
                  .collect())
    assert any(r.h in corpus_h for r in batch_hits), \
        "fixture must exercise the corpus-owner removal path"


def test_sample_weighted_is_deterministic_weighted_wor(spark):
    """A-ES weighted sampling invariants: exactly K rows with dense
    unique ranks, reruns bit-identical, and inclusion probability really
    is proportional-to-size — the selected docs' mean weight must sit
    clearly above the corpus mean (longer docs likelier), which a
    uniform sampler would violate."""
    from ringo_spark.operators.sampling import (
        WEIGHTED_K, sample_weighted_df,
    )

    out = sample_weighted_df(spark, SF).collect()
    assert len(out) == WEIGHTED_K
    assert sorted(r.sel_rank for r in out) == list(range(1, WEIGHTED_K + 1))
    again = sample_weighted_df(spark, SF).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sel_mean = sum(r.weight for r in out) / len(out)
    assert sel_mean > corpus_mean * 1.05, \
        f"weighted draw should skew long: {sel_mean} vs {corpus_mean}"
    # sanity on the weight column itself: it is the clamped n_chars
    n_chars = {r.doc_id: max(r.n_chars, 1) for r in docs.collect()}
    assert all(r.weight == n_chars[r.doc_id] for r in out)


def test_quality_source_percentile_keeps_top_tail_per_source(spark):
    """Per-source gate invariants: within EVERY source the kept set is
    exactly the top (1 - floor) of the (quality, doc_id) order — no
    dropped doc outranks a kept one — and the kept fraction matches the
    percent_rank cut, per source, not just globally."""
    from ringo_spark.operators.text import (
        QUALITY_PCT_FLOOR, quality_source_percentile_df, quality_score_expr,
    )

    kept = quality_source_percentile_df(spark, SF).collect()
    assert kept
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source",
                    F.round(quality_score_expr(), 6).alias("q")).collect())
    kept_ids = {r.doc_id for r in kept}
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r.q, r.doc_id))
        n = len(rows)
        # percent_rank = (rank-1)/(n-1); kept iff >= floor
        cut = [(i / (n - 1)) >= QUALITY_PCT_FLOOR for i in range(n)] \
            if n > 1 else [True]
        for r, keep in zip(rows, cut):
            assert (r.doc_id in kept_ids) == keep, (src, r.doc_id)
        frac = sum(cut) / n
        assert 0.7 <= frac <= 0.8 or n < 10, (src, frac)


def test_zorder_layout_bounds_both_dimensions(spark):
    """The data-skipping property itself: every Morton range fixes the
    top 4 bits of BOTH dimension buckets, so each range's user span AND
    hour span are <= 15 out of 255 — a single-column sort would show
    the full span on the other dimension.  Also pins the Morton kernel
    against a pure-Python bit interleave."""
    from ringo_spark.operators.layout import (
        Z_BITS, morton_key, zorder_layout_df,
    )

    out = zorder_layout_df(spark, SF).collect()
    assert out
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n_rows for r in out) == total
    for r in out:
        assert 0 <= r.z_range < 256
        assert r.max_user_bucket - r.min_user_bucket <= 15, r
        assert r.max_hour_bucket - r.min_hour_bucket <= 15, r

    def py_morton(a, b, bits=Z_BITS):
        z = 0
        for i in range(bits):           # column 0 at even positions —
            z |= ((a >> i) & 1) << (2 * i)      # the zorder_key layout
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (37, 201)]
    df = spark.createDataFrame(pairs, "a INT, b INT").select(
        "a", "b", morton_key(F.col("a"), F.col("b")).alias("z"))
    for r in df.collect():
        assert r.z == py_morton(r.a, r.b), (r.a, r.b)


def test_quality_gate_approx_bounds_contract_and_falsifiable(spark):
    """The GK-threshold scale path's contract: every source's sketch
    threshold sits inside the ±3ε rank bracket (pinned TRUE), kept_exact
    equals the registered exact gate's per-source count, and the bracket
    is FALSIFIABLE — probing the sketch at p=0.75 while bracketing at
    0.25 must flip the boolean on every source big enough that the
    brackets cannot overlap."""
    from ringo_spark.operators.text import (
        quality_gate_approx_bounds_df, quality_source_percentile_df,
    )

    out = {r.source: r for r in
           quality_gate_approx_bounds_df(spark, SF).collect()}
    assert out and all(r.within_rank_bounds for r in out.values())

    kept = quality_source_percentile_df(spark, SF).groupBy("source") \
        .agg(F.count(F.lit(1)).alias("k")).collect()
    for r in kept:
        assert out[r.source].kept_exact == r.k, r.source
    # t_exact is the lowest kept quality per source
    low = quality_source_percentile_df(spark, SF).groupBy("source") \
        .agg(F.min("quality_score").alias("m")).collect()
    for r in low:
        assert out[r.source].t_exact == r.m, r.source

    wrong = quality_gate_approx_bounds_df(spark, SF, probe_p=0.75).collect()
    big = [r for r in wrong if r.n >= 20]
    assert big and all(not r.within_rank_bounds for r in big), \
        "a wrong threshold must fall outside the rank bracket"


def test_bpe_pair_counts_matches_python_recount(spark):
    """Pin the BPE merge-pair counting against a pure-Python recount of
    the same corpus: identical pairs, counts, and tie ordering."""
    from collections import Counter

    from ringo_spark.operators.text import BPE_TOP_PAIRS, bpe_pair_counts_df

    texts = [r.text for r in
             spark.read.parquet(f"{SF}/documents.parquet").collect()]
    words = Counter()
    for t in texts:
        import re
        words.update(re.split(r"\s+", t))
    pairs = Counter()
    for w, c in words.items():
        for i in range(len(w) - 1):
            pairs[w[i:i + 2]] += c
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_PAIRS]

    got = [(r.pair, r.pair_count)
           for r in bpe_pair_counts_df(spark, SF).collect()]
    assert got == want


def test_sample_weighted_stratified_per_source_topk(spark):
    """Per-stratum draw invariants: every source contributes at most K
    docs with dense 1..K ranks, and each source's selected set is
    exactly the K smallest exponential keys within that source (checked
    against the full key table, no re-derivation drift)."""
    from ringo_spark.operators.sampling import (
        WEIGHTED_K_PER_SOURCE, _U_DENOM, WEIGHT_SEED,
        sample_weighted_stratified_df,
    )
    from ringo_spark.operators.textfn import phash

    out = sample_weighted_stratified_df(spark, SF).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)

    u = (phash(F.col("doc_id").cast("string"), WEIGHT_SEED) + 1) / _U_DENOM
    key = -F.ln(u) / F.greatest(F.col("n_chars"), F.lit(1))
    all_keys = (spark.read.parquet(f"{SF}/documents.parquet")
                .select("doc_id", "source", key.alias("k")).collect())
    keys_by_src = {}
    for r in all_keys:
        keys_by_src.setdefault(r.source, []).append((r.k, r.doc_id))
    for src, rows in by_src.items():
        n_src = len(keys_by_src[src])
        k_eff = min(WEIGHTED_K_PER_SOURCE, n_src)
        assert sorted(r.sel_rank for r in rows) == list(range(1, k_eff + 1))
        want = {d for _, d in sorted(keys_by_src[src])[:k_eff]}
        assert {r.doc_id for r in rows} == want, src
    assert set(by_src) == set(keys_by_src)


def test_quality_gate_gk_production_form_agreement(spark):
    """The production GK gate vs the exact percent-rank gate: below the
    sketch's accuracy the GK sketch is exact, so the value-cut keeps a
    SUPERSET of the exact rank-cut differing only by docs TIED with the
    threshold element below the cut rank — pinned exactly, per source."""
    from ringo_spark.operators.text import (
        quality_score_expr, quality_source_gate_gk_df,
        quality_source_percentile_df,
    )

    exact = {r.doc_id for r in quality_source_percentile_df(spark, SF)
             .collect()}
    gk_rows = quality_source_gate_gk_df(spark, SF).collect()
    gk = {r.doc_id for r in gk_rows}
    assert exact <= gk

    # the surplus is exactly the sub-cut docs tied with each source's
    # threshold element
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source",
                    F.round(quality_score_expr(), 6).alias("q")).collect())
    t_by_src = {}
    for r in sorted(docs, key=lambda r: (r.source, r.q, r.doc_id)):
        t_by_src.setdefault(r.source, []).append(r)
    surplus_want = set()
    for src, rows in t_by_src.items():
        import math
        cut = math.ceil(0.25 * (len(rows) - 1))
        t = rows[cut].q
        surplus_want |= {r.doc_id for r in rows[:cut] if r.q == t}
    assert gk - exact == surplus_want


def test_embedding_clusters_partition_the_pair_graph(spark):
    """The semantic-cluster twin: every embedding-LSH pair is
    co-clustered, every cluster label is the min member id, and only
    vectors that appear in some pair carry a row (singletons are
    implicitly their own cluster, matching the lexical operator)."""
    from ringo_spark.operators.dedup import (
        dedup_embedding_clusters_df, dedup_embedding_lsh_df,
    )

    pairs = [(r.vec_a, r.vec_b)
             for r in dedup_embedding_lsh_df(spark, SF).collect()]
    assert pairs, "fixture must contain embedding near-dup pairs"
    label = {r.vec_id: r.cluster_id
             for r in dedup_embedding_clusters_df(spark, SF).collect()}
    assert set(label) == {v for p in pairs for v in p}
    for a, b in pairs:
        assert label[a] == label[b], (a, b)
    members = {}
    for v, c in label.items():
        members.setdefault(c, []).append(v)
    for c, vs in members.items():
        assert c == min(vs)


def test_quality_gate_keeps_singleton_source(spark, tmp_path):
    """ADVICE r13: percent_rank over an n=1 window is 0 in every
    engine, so a bare `0 >= floor` gate would drop a source's ONLY
    document — contradicting the "keeps every source's best 75%"
    contract and the kept_exact closed form (1 at n=1).  A singleton
    source keeps its doc; every multi-doc source's kept set is
    unchanged; the GK production gate agrees on the singleton."""
    from ringo_spark.operators.text import (
        quality_gate_approx_bounds_df, quality_source_gate_gk_df,
        quality_source_percentile_df,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lone = docs.limit(1).select(
        (F.col("doc_id") + 10**9).alias("doc_id"), "text", "lang",
        F.lit("singleton_src").alias("source"), "n_chars")
    import os
    sf2 = str(tmp_path / "sf-singleton")
    os.makedirs(sf2)
    docs.unionByName(lone).write.parquet(f"{sf2}/documents.parquet")

    base = {r.doc_id for r in
            quality_source_percentile_df(spark, SF).collect()}
    kept = {r.doc_id: r for r in
            quality_source_percentile_df(spark, sf2).collect()}
    lone_id = lone.first().doc_id
    assert lone_id in kept                       # the n=1 doc survives
    assert set(kept) - {lone_id} == base         # others unchanged

    bounds = {r.source: r for r in
              quality_gate_approx_bounds_df(spark, sf2).collect()}
    assert bounds["singleton_src"].kept_exact == 1   # gate == closed form

    gk = {r.doc_id for r in
          quality_source_gate_gk_df(spark, sf2).collect()}
    assert lone_id in gk                         # production form agrees


def test_bpe_train_matches_pure_python_and_evolves(spark):
    """The merge list equals a pure-Python BPE trainer's on the same
    word counts (greedy left-to-right non-overlapping merges, count
    desc / pair asc ties) and is NON-VACUOUS: some later merge
    consumes a symbol produced by an earlier one, proving the state
    actually evolves (a static recount would never produce it)."""
    from ringo_spark.operators.text import BPE_MERGES, bpe_train_df

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    vocab = {}
    for r in docs:
        for w in r.text.split():
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    state = {w: list(w) for w in vocab}

    def merge(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    want = []
    for rank in range(1, BPE_MERGES + 1):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + vocab[w]
        (a, b), c = min(counts.items(),
                        key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        want.append((rank, a, b, c))
        state = {w: merge(s, a, b) for w, s in state.items()}

    got = [tuple(r) for r in bpe_train_df(spark, SF).collect()]
    assert got == want
    merged_syms = {a + b for _, a, b, _ in got}
    assert any(a in merged_syms or b in merged_syms
               for _, a, b, _ in got), \
        "no merge consumed an earlier merge's output symbol"


def test_bpe_apply_invariants_and_falsifiability(spark):
    """Tokenization with the learned merges: per doc the BPE length is
    at most the character count of its words and strictly less for
    docs containing merged pairs; zero merges reproduces pure
    character segmentation (different hash and longer stream), so the
    row actually pins the merge application."""
    from ringo_spark.operators.text import bpe_apply_df

    got = {r.doc_id: r for r in bpe_apply_df(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert set(got) == {r.doc_id for r in docs}
    chars = {r.doc_id: sum(len(w) for w in r.text.split() if w)
             for r in docs}
    assert all(got[d].bpe_len <= chars[d] for d in got)
    assert sum(got[d].bpe_len for d in got) < sum(chars.values())

    nomerge = {r.doc_id: r for r in
               bpe_apply_df(spark, SF, n_merges=0).collect()}
    assert all(nomerge[d].bpe_len == chars[d] for d in nomerge)
    assert any(nomerge[d].syms_hash != got[d].syms_hash for d in got)


def test_quality_gate_gk_contract_falsifiable(spark):
    """The GK gate contract row: both booleans TRUE at the registered
    probe (the oracle pins them), and probing the sketch at p=0.75
    while the brackets check p=0.25 flips gk_within_bracket on every
    non-trivial source AND breaks the exact-subset claim somewhere —
    i.e. the contract actually constrains the gate."""
    from ringo_spark.operators.text import (
        quality_source_gate_gk_contract_df,
    )

    ok = quality_source_gate_gk_contract_df(spark, SF).collect()
    assert ok and all(r.exact_subset_of_gk for r in ok)
    assert all(r.gk_within_bracket for r in ok)

    wrong = quality_source_gate_gk_contract_df(spark, SF,
                                               probe_p=0.75).collect()
    flipped = [r for r in wrong if not r.gk_within_bracket]
    assert len(flipped) >= sum(1 for r in wrong if r.n >= 10) * 0.9
    assert any(not r.exact_subset_of_gk for r in wrong)


def test_bpe_fertility_consistency(spark):
    """The per-source efficiency rollup is consistent with bpe_apply's
    per-doc totals (sum of bpe_len matches), fertility >= 1 everywhere
    (a merge can only shorten a word's segmentation, never below one
    token per word... floor is 1.0 at full merging), and a source
    whose docs contain merged pairs shows fertility strictly below the
    character baseline chars_per_token > 1."""
    from ringo_spark.operators.text import bpe_apply_df, bpe_fertility_df

    fert = bpe_fertility_df(spark, SF).collect()
    assert fert
    per_doc = bpe_apply_df(spark, SF).agg(F.sum("bpe_len")).first()[0]
    assert sum(r.bpe_len for r in fert) == per_doc
    for r in fert:
        assert r.fertility >= 1.0, r
        assert r.chars_per_token > 1.0, r    # merges actually applied
        assert r.n_words >= r.n_docs


def test_bpe_local_trainer_equals_distributed_loop(spark):
    """The production driver-local trainer (distributed counting,
    vocab-sized incremental-delta training — the real-merge-budget cost
    model) produces the IDENTICAL merge list as the distributed loop,
    beyond the registered N (16 merges), so a deployment can switch
    paths without retokenizing."""
    from ringo_spark.operators.text import (
        _bpe_train_state, _bpe_vocab_state, bpe_train_merges_local,
    )

    wc = {r.w: r.c for r in
          _bpe_vocab_state(spark, SF).select("w", "c").collect()}
    local, lstate = bpe_train_merges_local(wc, 16, return_state=True)
    dist, dstate = _bpe_train_state(spark, SF, 16)
    assert local == dist
    assert len(local) == 16
    # the word->symbols FINAL STATES agree too (the word_map artifact
    # both gate paths persist must be path-invariant)
    dmap = {r.w: tuple(r.syms) for r in dstate.collect()}
    assert lstate == dmap


def test_bpe_merge_budget_gate_falls_back_to_distributed(
        spark, tmp_path, monkeypatch):
    """VERDICT r14 item 8: past BPE_LOCAL_MAX_VOCAB_ROWS the gated
    trainer must NOT collect the vocabulary (a 1M-row vocab would OOM
    the driver) — it degrades to the distributed pair-count kernel and
    produces byte-identical artifacts.  Injected large vocab: drop the
    gate below the real vocab size and prove (a) the local trainer is
    never invoked, (b) merges and word_map equal the under-gate
    build."""
    import ringo_spark.operators.text as txt

    under_m, under_w = txt.train_bpe_merges(spark, SF, 8)
    under_map = {(r.w, r.sym_str, r.ns) for r in under_w.collect()}

    monkeypatch.setattr(txt, "BPE_LOCAL_MAX_VOCAB_ROWS", 1)

    def boom(*a, **k):
        raise AssertionError("local trainer ran past the vocab gate")

    monkeypatch.setattr(txt, "bpe_train_merges_local", boom)
    over_m, over_w = txt.train_bpe_merges(spark, SF, 8)
    assert over_m == under_m
    assert {(r.w, r.sym_str, r.ns) for r in over_w.collect()} == under_map


def test_stats_sidecar_lifecycle_after_compaction(spark, tmp_path):
    """r16 found compaction must drop the pre-compaction ``_stats``
    sidecar (its counts include the deleted rows); ADVICE r16 then
    found the read-path self-heal that replaced it RACED in-flight
    appends (data files land before their stats epoch — a concurrent
    report's rmtree+rewrite interleaved with the epoch write).  The
    r17 contract, pinned here: the production compaction wrapper
    (``compact_ivf_index``) rebuilds the sidecar INSIDE the
    replacement tree (no missing window at all); raw compaction ships
    sidecar-less and every report falls back to a READ-ONLY rescan —
    never writing — until the explicit ``repair_ivf_stats``
    maintenance op runs."""
    import os

    from ringo_spark.operators import similarity as sim
    from ringo_spark.operators.deletion import (
        apply_tombstones_partitioned, tombstone_docs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    p = sim.build_ivf_index(
        spark, SF, k=sim.auto_ivf_k(spark, half),
        index_path=str(tmp_path / "idx"),
        emb=emb.where(F.col("vec_id") < half))
    batch = emb.where(F.col("vec_id") >= half)
    before = sim.ivf_staleness_report(spark, p, batch).first()

    loud = lambda *a, **k: (_ for _ in ()).throw(       # noqa: E731
        AssertionError("sidecar written on the read path"))

    # production path: wrapper compaction leaves a COMPLETE sidecar
    tombstone_docs(spark, p, [0, 1, 2], id_col="vec_id")
    sim.compact_ivf_index(spark, p, id_col="vec_id")
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == sim._data_meta_rows(p)
    real = sim._write_ivf_stats
    sim._write_ivf_stats = loud
    try:
        after = sim.ivf_staleness_report(spark, p, batch).first()
    finally:
        sim._write_ivf_stats = real
    assert after.n_build == before.n_build - 3

    # raw path: sidecar dropped, reports rescan READ-ONLY
    tombstone_docs(spark, p, [3, 4], id_col="vec_id")
    apply_tombstones_partitioned(spark, p, "cell", id_col="vec_id")
    assert not os.path.exists(os.path.join(p, "_stats"))
    sim._write_ivf_stats = loud
    try:
        raw = sim.ivf_staleness_report(spark, p, batch).first()
    finally:
        sim._write_ivf_stats = real
    assert raw.n_build == before.n_build - 5
    assert not os.path.exists(os.path.join(p, "_stats"))   # still absent

    # explicit maintenance repair restores the sidecar exactly, and a
    # repaired sidecar is trusted from here on (no rescan, no rewrite)
    sim.repair_ivf_stats(spark, p)
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == sim._data_meta_rows(p)
    sim._write_ivf_stats = loud
    try:
        again = sim.ivf_staleness_report(spark, p, batch).first()
    finally:
        sim._write_ivf_stats = real
    assert again == raw


def test_report_is_readonly_during_inflight_append(spark, tmp_path):
    """The ADVICE r16 race, pinned end-to-end: an append has landed its
    data files but not yet its stats epoch (the in-flight window every
    admit opens).  A concurrent staleness report must (a) not trust the
    now-undercounting sidecar, (b) not WRITE anything (the old
    destructive heal deleted the sidecar here and re-counted the
    in-flight batch, double-counting it once the epoch landed), and
    (c) the maintenance repair must REFUSE while the admission is in
    flight.  After the append completes, the sidecar is exact and
    trusted again."""
    import os

    from ringo_spark import index_lifecycle as _ilc
    from ringo_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    half = n // 2
    p = sim.build_ivf_index(
        spark, SF, k=sim.auto_ivf_k(spark, half),
        index_path=str(tmp_path / "idx"),
        emb=emb.where(F.col("vec_id") < half))
    batch = emb.where(F.col("vec_id") >= half)

    # freeze the append mid-flight: data landed, epoch + commit not yet
    real_write = sim._write_ivf_stats

    class _Freeze(Exception):
        pass

    def crash_epoch(path, assigned, cent_rows, mode):
        if mode == "append":
            raise _Freeze()
        return real_write(path, assigned, cent_rows, mode)

    sim._write_ivf_stats = crash_epoch
    try:
        with pytest.raises(_Freeze):
            sim.append_to_ivf_index(spark, p, batch)
    finally:
        sim._write_ivf_stats = real_write
    assert _ilc.admits_in_flight(p)

    # (a)+(b): concurrent report is correct (sees the landed rows via
    # the rescan) and writes nothing
    loud = lambda *a, **k: (_ for _ in ()).throw(       # noqa: E731
        AssertionError("sidecar written during in-flight append"))
    sim._write_ivf_stats = loud
    try:
        rep = sim.ivf_staleness_report(spark, p, batch).first()
    finally:
        sim._write_ivf_stats = real_write
    assert rep.n_build == n        # build half + fully-landed batch
    # the undercounting sidecar was left byte-untouched
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == half

    # (c): maintenance repair refuses mid-flight
    with pytest.raises(RuntimeError, match="in flight"):
        sim.repair_ivf_stats(spark, p)

    # the retry completes the admission: no duplicate rows, sidecar
    # exact, ledger committed
    assert sim.append_to_ivf_index(spark, p, batch) is True
    assert not _ilc.admits_in_flight(p)
    assert spark.read.parquet(p).count() == n
    assert (spark.read.parquet(p).select("vec_id").distinct().count()
            == n)
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == n

    # and a LOST-ACK replay of the committed batch is a no-op
    assert sim.append_to_ivf_index(spark, p, batch) is False
    assert spark.read.parquet(p).count() == n


def test_salt_expressions_stay_in_bucket_range(spark):
    """r16 review finding: abs(hash) % n sends a row whose murmur3 hash
    is Integer.MIN_VALUE outside [0, n) for non-power-of-two n (abs
    overflows; under ANSI it even throws) — a salted JOIN would then
    silently lose that row's match.  The helpers use pmod; pin pmod's
    INT_MIN behavior and the join's row-preservation at a
    non-power-of-two bucket count."""
    from pyspark.sql import functions as F

    from ringo_spark.functions.skew import salted_broadcast_left_join

    r = spark.range(1).select(
        F.pmod(F.lit(-2147483648), F.lit(12)).alias("p")).first()
    assert 0 <= r.p < 12

    big = spark.range(5000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v"))
    medium = spark.range(37).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr"))
    got = salted_broadcast_left_join(big, medium, on=["k"], buckets=12)
    assert got.where(F.col("attr").isNull()).count() == 0
    assert got.count() == 5000


def test_lsh_append_ledger_torn_retry_and_no_resurrection(spark, tmp_path):
    """The LSH side of the r17 admission ledger (VERDICT r16 item 2):
    lost-ack replay is a no-op; a torn retry (data landed, stats epoch
    crashed) completes without duplicating rows and leaves the sidecar
    exact; and — because the ledger rides compaction's sidecar
    carry-over — a replay AFTER its rows were tombstoned and compacted
    away is still refused (deletes never resurrect)."""
    import os

    from ringo_spark import index_lifecycle as _ilc
    from ringo_spark.operators import similarity as sim
    from ringo_spark.operators.deletion import tombstone_docs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    emb.where(F.col("vec_id") < 400).write.parquet(
        f"{corpus_dir}/embeddings.parquet")
    p = sim.build_lsh_index(spark, corpus_dir, bits=sim.LSH_BITS,
                            index_path=str(tmp_path / "lsh"))
    batch = emb.where(F.col("vec_id") >= 400)

    # torn first attempt: stats epoch crashes after the data lands
    real = sim._write_lsh_stats

    class _Freeze(Exception):
        pass

    def crash_epoch(path, assigned, mode):
        if mode == "append":
            raise _Freeze()
        return real(path, assigned, mode)

    sim._write_lsh_stats = crash_epoch
    try:
        with pytest.raises(_Freeze):
            sim.append_to_lsh_index(spark, p, batch)
    finally:
        sim._write_lsh_stats = real
    assert _ilc.admits_in_flight(p)

    # retry completes: exact rows, exact sidecar, ledger committed
    assert sim.append_to_lsh_index(spark, p, batch) is True
    assert not _ilc.admits_in_flight(p)
    assert spark.read.parquet(p).count() == n
    assert spark.read.parquet(p).select("vec_id").distinct().count() == n
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == n

    # lost-ack replay: refused
    assert sim.append_to_lsh_index(spark, p, batch) is False
    assert spark.read.parquet(p).count() == n

    # delete three appended rows, compact through the wrapper (sidecar
    # rebuilt inside the replacement), then replay the batch: STILL
    # refused -- the ledger survived the swap, so the tombstoned rows
    # stay dead instead of riding back in on a retry
    dead = [r.vec_id for r in batch.select("vec_id").limit(3).collect()]
    tombstone_docs(spark, p, dead, id_col="vec_id")
    sim.compact_lsh_index(spark, p, id_col="vec_id")
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    tbl = sim._read_stats_log(os.path.join(p, "_stats"))
    assert sum(tbl.column("c").to_pylist()) == n - 3
    assert sim.append_to_lsh_index(spark, p, batch) is False
    assert spark.read.parquet(p).count() == n - 3


def _write_docs(spark, tmp_path, rows):
    """documents.parquet fixture dir for null-handling pins (r17
    review): (doc_id, source, lang, text) with nullable source/lang."""
    import os

    d = str(tmp_path / "sfnull")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet")
    return d


def test_quality_gate_keeps_null_source_docs(spark, tmp_path):
    """r17 review finding 1: a NULL source forms its own group in the
    exact percent-rank gate and in every per-source aggregate, but the
    GK production gate's threshold equi-join silently dropped those
    docs and flipped the contract row red.  Null-safe joins pin the
    Spark side; the DuckDB oracle (GROUP BY keeps NULL) agrees."""
    import duckdb

    from ringo_spark.operators import text as txt

    rows = [(i, None if i % 3 == 0 else f"src{i % 2}", "en",
             f"doc text number {i} " + "filler " * (i % 7))
            for i in range(60)]
    d = _write_docs(spark, tmp_path, rows)

    gate = txt.quality_source_gate_gk_df(spark, d).collect()
    assert sum(1 for r in gate if r.source is None) > 0, \
        "GK gate dropped every NULL-source doc"

    got = [(r.source, r.n, r.kept_exact, r.exact_subset_of_gk,
            r.gk_within_bracket)
           for r in txt.quality_source_gate_gk_contract_df(spark, d)
           .collect()]
    assert any(r[0] is None for r in got)
    assert all(r[3] and r[4] for r in got), got

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = con.execute(txt.QUALITY_SOURCE_GATE_GK_SQL).fetchall()
    assert sorted(got, key=lambda r: (r[0] is not None, r[0] or "")) == \
        sorted([tuple(r) for r in want],
               key=lambda r: (r[0] is not None, r[0] or ""))


def test_sample_temperature_keeps_null_lang_group(spark, tmp_path):
    """r17 review finding 6: docs with NULL lang got a computed keep
    rate that was unreachable through the plain equi-join — they were
    excluded outright, violating the down-sampling-only contract for
    the null group.  Null-safe join on both engines, cell-compared."""
    import duckdb

    from ringo_spark.operators import sampling as smp

    rows = [(i, "web", None if i % 4 == 0 else f"l{i % 3}", f"text {i}")
            for i in range(80)]
    d = _write_docs(spark, tmp_path, rows)
    got = {(r.doc_id, r.lang, r.keep_rate)
           for r in smp.sample_temperature_df(spark, d).collect()}
    assert any(lang is None for _, lang, _ in got), \
        "temperature sampler dropped the whole NULL-lang group"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = {tuple(r) for r in
            con.execute(smp.SAMPLE_TEMPERATURE_SQL).fetchall()}
    assert got == want


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """r17 review finding 2: a corpus whose pair supply runs dry before
    n_merges empties the oracle's m{k} CTE — the old cross join then
    emptied every later state and the apply/fertility oracles returned
    zero rows, while the trainers break and keep the final state.  The
    LEFT JOIN pass-through must keep both engines cell-identical."""
    import duckdb

    from ringo_spark.operators import text as txt

    # two distinct words, one merge possible ("a b"), ask for 6
    rows = [(i, "s", "en", "ab ab cd") for i in range(8)]
    d = _write_docs(spark, tmp_path, rows)
    n_merges = 6
    merges, word_map = txt.train_bpe_merges(spark, d, n_merges)
    assert 0 < len(merges) < n_merges        # exhaustion actually hit

    got = sorted(
        (r.doc_id, r.bpe_len, r.syms_hash)
        for r in txt.bpe_apply_df(spark, d, n_merges).collect())
    assert got, "Spark apply lost the corpus"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(txt._bpe_apply_sql(n_merges)).fetchall())
    assert got == want


def test_wav_parsers_reject_truncated_chunks():
    """r17 review finding 3: WAV chunk length fields are untrusted
    input (the PNG walk's rule) — a payload truncated mid-fmt or a
    data length past the end must hit the documented skip/ValueError
    path, never struct.error (which kills the whole Arrow batch)."""
    import struct

    import pytest as _pytest

    from ringo_spark.operators.multimodal import (
        decode_wav_samples, encode_wav_pcm, parse_wav_header,
    )

    whole = encode_wav_pcm(3)
    assert parse_wav_header(whole) is not None
    # cut mid-fmt: header walk must return None, not raise
    cut = whole[:12 + 8 + 10]           # RIFF+WAVE + fmt hdr + 10 bytes
    assert parse_wav_header(cut) is None
    # data chunk declaring more bytes than exist: clamp, never
    # over-report samples
    hdr = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
           + b"data" + struct.pack("<I", 1 << 20) + b"\x00\x00" * 4)
    rate, ch, data_len = parse_wav_header(hdr)
    assert data_len == 8
    # sample decode: ValueError (the PNG contract), not struct.error
    with _pytest.raises(ValueError, match="exceeds payload"):
        decode_wav_samples(hdr)


def test_kept_exact_closed_form_matches_rounded_gate_at_scale(spark):
    """r17 review finding 4: the exact gate keeps
    round(percent_rank, 6) >= FLOOR, so for n-1 >= 2e6 some rank lands
    inside the HALF_UP rounding window and the un-rounded closed form
    n - ceil(FLOOR*(n-1)) under-counts.  Pin the rounding-aware form
    against Spark's own round() semantics at a divergent n, and that
    the old form really did diverge (the bug was real)."""
    import math

    n = 4_000_001                       # n-1 = 4e6: window width 2 ranks
    df = spark.range(n).selectExpr(
        f"round(id / CAST({n - 1} AS DOUBLE), 6) AS pr")
    kept_gate = df.where("pr >= 0.25").count()
    from ringo_spark.operators.text import (
        QUALITY_PCT_FLOOR, QUALITY_PCT_FLOOR_RND,
    )

    kept_new = n - math.ceil(QUALITY_PCT_FLOOR_RND * (n - 1))
    kept_old = n - math.ceil(QUALITY_PCT_FLOOR * (n - 1))
    assert kept_gate == kept_new
    assert kept_gate != kept_old        # the divergence the fix closes


def test_tokenizer_whitespace_class_is_engine_portable(spark, tmp_path):
    """r17 review finding: Java regex reads \\s as including vertical
    tab, RE2 (DuckDB) does not — a \\x0B in crawled text tokenized
    differently per engine, silently breaking every dedup/text oracle.
    Both sides now use one explicit class; pin with a VT document."""
    import duckdb

    from ringo_spark.operators.textfn import sql_tokens, tokens

    rows = [(1, "web", "en", "a\x0bb c d e"),
            (2, "web", "en", "plain text only")]
    d = _write_docs(spark, tmp_path, rows)
    got = {r.doc_id: list(r.t) for r in
           spark.read.parquet(f"{d}/documents.parquet")
           .select("doc_id", tokens(F.col("text")).alias("t")).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    want = {r[0]: list(r[1]) for r in con.execute(
        f"SELECT doc_id, {sql_tokens('text')} FROM documents").fetchall()}
    assert got == want
    assert got[1] == ["a", "b", "c", "d", "e"]   # VT splits on BOTH


def test_spread_never_finalizes_multi_stage_plans(spark):
    """r17 review finding: spread()'s partition probe (df.rdd) forces
    AQE's final plan, EXECUTING the frame's shuffle stages as a
    throwaway job.  Multi-stage frames must pass through untouched —
    their parallelism comes from shuffle.partitions anyway."""
    from ringo_spark.functions.spread import spread

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    collapsed = (docs.groupBy(F.md5("text").alias("h"))
                 .agg(F.min("doc_id").alias("doc_id")))
    assert spread(collapsed) is collapsed        # untouched, unprobed
    joined = docs.join(collapsed.select("doc_id"), "doc_id")
    assert spread(joined) is joined
    # a bare scan still spreads (the single-file local corpus case)
    assert spread(docs) is not None              # probe path still works


def test_spread_matches_plan_nodes_not_substrings(spark):
    """ADVICE r17: the multi-stage check matched node names as
    substrings anywhere in the optimized plan's treeString, so CamelCase
    column/relation names containing 'Sort'/'Join'/'Window' etc.
    false-positived and silently skipped the up-repartition on a
    genuinely bare scan.  The match is now anchored to the node-name
    position (first token of each tree line)."""
    from ringo_spark.functions.spread import _is_multi_stage, spread

    target = spark.sparkContext.defaultParallelism
    # a bare scan whose COLUMN names contain every trigger word: must
    # still spread (the local corpus arrives as one row group)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select(F.col("text").alias("SortKeyJoinWindowDistinct"),
                    F.col("doc_id").alias("AggregateCoGroupDeduplicate")))
    out = spread(docs)
    assert out is not docs                      # not skipped
    assert out.rdd.getNumPartitions() == target
    # plan-level check, both directions, straight off treeStrings
    bare = docs._jdf.queryExecution().optimizedPlan().treeString()
    assert not _is_multi_stage(bare)
    agged = (docs.groupBy("AggregateCoGroupDeduplicate")
             .count()._jdf.queryExecution().optimizedPlan().treeString())
    assert _is_multi_stage(agged)


# --- r19 review fixes: serve-path artifacts + deterministic layout ----------


def test_ivf_indexed_serves_retrained_geometry(spark, tmp_path):
    """r19 similarity review: ann_ivf_indexed_df's probes previously
    recomputed the first-k corpus vectors as centroids instead of
    reading the index's stored _centroids — identical on a fresh build,
    silently WRONG after retrain_ivf_index rewrites the geometry (the
    data is partitioned by retrained cells; first-k probes prune to
    cells the neighbors are no longer in).  The serve path must route
    with the index's own stored artifacts."""
    import os

    from ringo_spark.operators.similarity import (
        LSH_N_QUERIES, LSH_TOP_K, ann_ivf_indexed_df, build_ivf_index,
        retrain_ivf_index,
    )
    from ringo_spark.operators.textfn import cosine
    from pyspark.sql import Window

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    (spark.read.parquet(f"{SF}/embeddings.parquet")
     .write.parquet(f"{corpus}/embeddings.parquet"))

    p = build_ivf_index(spark, corpus, k=8)
    retrain_ivf_index(spark, p, k=8)

    cent = spark.read.parquet(os.path.join(p, "_centroids"))
    emb = spark.read.parquet(f"{corpus}/embeddings.parquet")
    first_k = {tuple(r.embedding) for r in
               emb.where(F.col("vec_id") < 8).collect()}
    stored = {tuple(r.cvec) for r in cent.collect()}
    assert stored != first_k, "retrain must have moved the centroids"

    got = ann_ivf_indexed_df(spark, corpus, k=8).collect()

    # expected: the same probe+search algorithm run explicitly with the
    # STORED centroids against the STORED (retrained) index layout
    q = emb.where(F.col("vec_id") < LSH_N_QUERIES) \
           .select(F.col("vec_id").alias("q_id"),
                   F.col("embedding").alias("q_emb"))
    qsim = F.round(cosine(F.col("q_emb"), F.col("cvec")), 6)
    qw = Window.partitionBy("q_id").orderBy(F.desc("qs"), F.desc("cell"))
    probes = (q.crossJoin(F.broadcast(cent))
              .select("q_id", "q_emb", F.col("cid").alias("cell"),
                      qsim.alias("qs"))
              .withColumn("pr", F.row_number().over(qw))
              .where(F.col("pr") <= 2)
              .select("q_id", "q_emb", "cell"))
    idx = (spark.read.parquet(p)
           .select(F.col("vec_id").alias("n_id"),
                   F.col("embedding").alias("n_emb"),
                   F.col("cell").cast("long").alias("cell")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    want = (idx.join(F.broadcast(probes), "cell")
            .where(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id",
                    F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
                    .alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= LSH_TOP_K)
            .select("q_id", "n_id", "rank", "cosine")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_lsh_append_width_defaults_to_stored_and_mismatch_raises(
        spark, tmp_path):
    """r19 similarity review: append_to_lsh_index defaulted to the
    pinned LSH_BITS regardless of the built width — a 12-bit index
    appended at the default 8 routed every appended vector to buckets
    no probe reads.  The build now persists its width (_WIDTH);
    append defaults to it and a contradicting explicit width raises."""
    import os

    from ringo_spark.operators.similarity import (
        _bucket_expr, append_to_lsh_index, build_lsh_index,
        stored_lsh_bits,
    )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.where(F.col("vec_id") < 400).write.parquet(
        f"{corpus}/embeddings.parquet")

    p = build_lsh_index(spark, corpus, bits=12)
    assert stored_lsh_bits(p) == 12

    batch = emb.where(F.col("vec_id") >= 400)
    with pytest.raises(ValueError, match="built at bits=12"):
        append_to_lsh_index(spark, p, batch, bits=8)

    assert append_to_lsh_index(spark, p, batch) is True   # stored width
    want = {(r.vec_id, r.bucket) for r in
            emb.withColumn("bucket",
                           _bucket_expr(F.col("embedding"), 12)).collect()}
    got = {(r.vec_id, r.bucket) for r in spark.read.parquet(p).collect()}
    assert got == want


def test_minhash_index_layout_is_deterministic(spark, tmp_path):
    """r19 bench adjudication (ROUND19_NOTES.md): the index build used
    to write bands/shingles with whatever partitioning AQE left on the
    build plan — two builds of the same code+data differed 32x in file
    count and ~10x in warm-serve CPU.  File count is now a pure
    function of the corpus footer estimate."""
    import os

    from ringo_spark.operators.dedup import (
        BAND_ROWS_PER_FILE, BANDS, SHINGLE_ROWS_PER_FILE, _layout_files,
        build_minhash_index,
    )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.write.parquet(f"{corpus}/documents.parquet")

    p = build_minhash_index(spark, corpus)
    n_docs = docs.count()

    def files(sub):
        return [f for r, _d, fs in os.walk(os.path.join(p, sub))
                for f in fs if f.endswith(".parquet")]

    assert len(files("bands")) == _layout_files(n_docs * BANDS,
                                                BAND_ROWS_PER_FILE) == 1
    assert len(files("shingles")) == _layout_files(
        n_docs, SHINGLE_ROWS_PER_FILE) == 1
    # sanity on the helper's scaling rule itself
    assert _layout_files(2_000_001, 2_000_000) == 2
    assert _layout_files(None, 100) == 1


# --- r19 similarity full-module review: lifecycle/serve fixes ----------------


def _tmp_emb_corpus(spark, tmp_path, n_build=400):
    """tmp-dir corpus split (build rows < n_build, batch rows >=) —
    isolates the tag-derived index caches per test."""
    import os

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.where(F.col("vec_id") < n_build).write.parquet(
        f"{corpus}/embeddings.parquet")
    return corpus, emb.where(F.col("vec_id") >= n_build)


def test_retrain_carries_admission_ledger(spark, tmp_path):
    """r19 similarity review: retrain_ivf_index shipped its replacement
    tree without the _admitted batch ledger (publish_swap rmtree'd the
    old tree holding it), so a lost-ack replay of an already-admitted
    batch against the retrained index re-landed every row — breaking
    the exactly-once contract compaction explicitly preserves."""
    from ringo_spark.operators.similarity import (
        append_to_ivf_index, build_ivf_index, retrain_ivf_index,
    )

    corpus, batch = _tmp_emb_corpus(spark, tmp_path)
    p = build_ivf_index(spark, corpus, k=4)
    assert append_to_ivf_index(spark, p, batch) is True
    n_before = spark.read.parquet(p).count()

    retrain_ivf_index(spark, p, k=4)
    # the replay of the admitted batch must STAY refused after retrain
    assert append_to_ivf_index(spark, p, batch) is False
    assert spark.read.parquet(p).count() == n_before


def test_rebucket_carries_admission_ledger(spark, tmp_path):
    """r19 similarity review: the rebucketed successor index shipped
    ledger-less, so a checkpoint replay of a batch admitted to the OLD
    index duplicated its rows in the new one."""
    from ringo_spark.operators.similarity import (
        append_to_lsh_index, build_lsh_index, rebucket_lsh_index,
    )

    corpus, batch = _tmp_emb_corpus(spark, tmp_path)
    p = build_lsh_index(spark, corpus, bits=8)
    assert append_to_lsh_index(spark, p, batch) is True
    n = spark.read.parquet(p).count()

    p2 = rebucket_lsh_index(spark, p, 10)
    assert append_to_lsh_index(spark, p2, batch) is False   # replay refused
    assert spark.read.parquet(p2).count() == n


def test_retrain_and_rebucket_refuse_inflight_admission(spark, tmp_path):
    """r19 similarity review: destructive index maintenance honors the
    admission guard (archive_admissions / repair_*_stats precedent) —
    a half-landed batch must not be snapshotted or raced."""
    import ringo_spark.index_lifecycle as ilc
    from ringo_spark.operators.similarity import (
        build_ivf_index, build_lsh_index, rebucket_lsh_index,
        retrain_ivf_index,
    )

    corpus, _batch = _tmp_emb_corpus(spark, tmp_path)
    p = build_ivf_index(spark, corpus, k=4)
    ilc.admit_intent(p, "deadbeef")
    with pytest.raises(RuntimeError, match="in flight"):
        retrain_ivf_index(spark, p, k=4)
    ilc.admit_commit(p, "deadbeef")
    retrain_ivf_index(spark, p, k=4)   # clears once committed

    q = build_lsh_index(spark, corpus, bits=8)
    ilc.admit_intent(q, "deadbeef")
    with pytest.raises(RuntimeError, match="in flight"):
        rebucket_lsh_index(spark, q, 10)
    ilc.admit_commit(q, "deadbeef")
    rebucket_lsh_index(spark, q, 10)


def test_ivf_indexed_nprobe_follows_stored_centroid_count(spark, tmp_path):
    """r19 similarity review: ann_ivf_indexed_df derived its default
    nprobe from the REQUESTED k — after a k-resizing retrain the index
    holds more cells and a request-derived nprobe probes a collapsing
    fraction of them (silent recall decay).  The default now resolves
    against the stored centroid count."""
    import ringo_spark.operators.similarity as sim

    corpus, _batch = _tmp_emb_corpus(spark, tmp_path)
    p = sim.build_ivf_index(spark, corpus, k=4)
    sim.retrain_ivf_index(spark, p, k=64)
    assert spark.read.parquet(
        f"{p}/_centroids").count() == 64

    calls = []
    real = sim._auto_nprobe

    def spy(k, base):
        calls.append((k, base))
        return real(k, base)

    sim._auto_nprobe = spy
    try:
        got = sim.ann_ivf_indexed_df(spark, corpus, k=4).collect()
    finally:
        sim._auto_nprobe = real
    assert calls == [(64, sim.IVF_NPROBE)]   # stored count, not k=4
    # behaviorally: equals an explicit serve at the stored-count nprobe
    want = sim.ann_ivf_indexed_df(
        spark, corpus, k=4, nprobe=real(64, sim.IVF_NPROBE)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_lsh_width_backfill_only_on_tag_path(spark, tmp_path):
    """r19 similarity review: the cached-serve branch stamped the
    CALLER's bits as _WIDTH on a pre-r19 dir even for an explicit
    index_path, where bits are a claim, not evidence — re-introducing
    the silent wrong-width routing with a trusted signature.  Explicit
    paths now stay unstamped (append keeps demanding the width), and a
    cached explicit-path serve at a contradicting width raises."""
    import os

    from ringo_spark.operators.similarity import (
        append_to_lsh_index, build_lsh_index, stored_lsh_bits,
    )

    corpus, batch = _tmp_emb_corpus(spark, tmp_path)
    p = str(tmp_path / "explicit_idx")
    build_lsh_index(spark, corpus, bits=12, index_path=p)
    os.remove(os.path.join(p, "_WIDTH"))   # simulate a pre-r19 dir

    # cached serve with a DIFFERENT claimed width: must not stamp it
    assert build_lsh_index(spark, corpus, bits=8, index_path=p) == p
    assert stored_lsh_bits(p) is None
    with pytest.raises(ValueError, match="no _WIDTH sidecar"):
        append_to_lsh_index(spark, p, batch)       # still demands bits
    assert append_to_lsh_index(spark, p, batch, bits=12) is True

    # a stamped explicit-path index + contradicting request: loud error
    p2 = str(tmp_path / "explicit_idx2")
    build_lsh_index(spark, corpus, bits=12, index_path=p2)
    with pytest.raises(ValueError, match="built at bits=12"):
        build_lsh_index(spark, corpus, bits=8, index_path=p2)

    # the tag path still backfills (bits are part of the dir tag)
    pt = build_lsh_index(spark, corpus, bits=9)
    os.remove(os.path.join(pt, "_WIDTH"))
    assert build_lsh_index(spark, corpus, bits=9) == pt
    assert stored_lsh_bits(pt) == 9


def test_lsh_width_write_is_atomic(tmp_path, monkeypatch):
    """r19 similarity review: _write_lsh_width truncated the sidecar in
    place — a crash mid-write left an EMPTY file that reads as
    'pre-r19 index', permanently for a rebucketed index.  The write now
    goes through the kernel's flip_pointer (tmp + rename): a crash
    leaves the old value, never a torn file."""
    import os

    import ringo_spark.index_lifecycle as ilc
    from ringo_spark.operators import similarity as sim

    p = str(tmp_path)
    sim._write_lsh_width(p, 12)
    assert sim.stored_lsh_bits(p) == 12

    def crash(_a, _b):
        raise OSError("crash mid-publish")

    monkeypatch.setattr(ilc.os, "replace", crash)
    with pytest.raises(OSError):
        sim._write_lsh_width(p, 8)
    monkeypatch.undo()
    assert sim.stored_lsh_bits(p) == 12   # old width intact, never torn
    assert os.path.exists(os.path.join(p, "_WIDTH"))


def test_auto_ivf_k_exact_ignores_corpus_rows_override(spark):
    """r19 similarity review: the ringo.lshCorpusRows estimate override
    beat callers passing MEASURED counts (retrain's live-row count, the
    staleness row's exact half) — an external-pipeline override of 1e9
    re-sized a 10k-row retrain into a degenerate one-row-per-cell index
    and desynced the staleness row from its count(*)-derived oracle."""
    import math

    from ringo_spark.operators.similarity import (
        IVF_MAX_AUTO_K, LSH_CORPUS_ROWS_CONF_KEY, auto_ivf_k,
    )

    spark.conf.set(LSH_CORPUS_ROWS_CONF_KEY, "1000000000")
    try:
        assert auto_ivf_k(spark, 800, exact=True) == 20   # sqrt(800/2)
        assert auto_ivf_k(spark, 800) == min(
            IVF_MAX_AUTO_K, round(math.sqrt(500000000)))  # estimate path
    finally:
        spark.conf.unset(LSH_CORPUS_ROWS_CONF_KEY)


def test_ivf_append_assigns_cells_once(spark, tmp_path):
    """r19 similarity review: append_to_ivf_index ran the batch's
    K-argmax cell assignment twice (land_data + stats_epoch), doubling
    per-batch ingest CPU at the production ~sqrt(N) K.  The assignment
    is now cached across the two."""
    import ringo_spark.operators.similarity as sim

    corpus, batch = _tmp_emb_corpus(spark, tmp_path)
    p = sim.build_ivf_index(spark, corpus, k=4)

    calls = []
    real = sim._with_cell

    def spy(df, cent_rows, out="cell"):
        calls.append(1)
        return real(df, cent_rows, out)

    sim._with_cell = spy
    try:
        assert sim.append_to_ivf_index(spark, p, batch) is True
    finally:
        sim._with_cell = real
    assert len(calls) == 1
    # and the stats sidecar still covers the data exactly
    from ringo_spark.operators.similarity import _data_meta_rows, _read_stats_log
    tbl = _read_stats_log(f"{p}/_stats")
    assert sum(tbl.column("c").to_pylist()) == _data_meta_rows(p)


def test_serve_backfill_skips_inflight_admission(spark, tmp_path):
    """r19 similarity review: the cached-serve stats backfill is a
    destructive sidecar write and ran with no admits_in_flight guard —
    rewriting from data files that include an in-flight batch's landed
    rows, which its pending stats epoch then counts AGAIN (the ADVICE
    r16 double-count race, re-entered through the serve path).  The
    serve-path heal now silently defers while an admission is in
    flight; the torn-retry repair (which IS the writer) still runs."""
    import os
    import shutil

    import ringo_spark.index_lifecycle as ilc
    from ringo_spark.operators.similarity import (
        build_ivf_index, build_lsh_index,
    )

    corpus, _batch = _tmp_emb_corpus(spark, tmp_path)
    p = build_ivf_index(spark, corpus, k=4)
    shutil.rmtree(os.path.join(p, "_stats"))
    ilc.admit_intent(p, "feedface")
    assert build_ivf_index(spark, corpus, k=4) == p        # cached serve
    assert not os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))
    ilc.admit_commit(p, "feedface")
    build_ivf_index(spark, corpus, k=4)
    assert os.path.exists(os.path.join(p, "_stats", "_SUCCESS"))

    q = build_lsh_index(spark, corpus, bits=8)
    shutil.rmtree(os.path.join(q, "_stats"))
    ilc.admit_intent(q, "feedface")
    build_lsh_index(spark, corpus, bits=8)
    assert not os.path.exists(os.path.join(q, "_stats", "_SUCCESS"))
    ilc.admit_commit(q, "feedface")
    build_lsh_index(spark, corpus, bits=8)
    assert os.path.exists(os.path.join(q, "_stats", "_SUCCESS"))


def test_corpus_curation_avg_rounds_ties_half_up(spark):
    """r19 null sweep: avg_quality's old round(double_sum/n, 6) could
    land the quotient exactly on a 7th-digit tie, where Spark rounds
    the decimal repr (half-up) and DuckDB the binary double — a 1-ulp
    hash split.  The average is now computed as round-half-up in exact
    integer micro-units: floor((2a+n)/(2n)).  Pin the tie case."""
    df = spark.createDataFrame(
        [(0.000001,), (0.000002,)], "q double")
    got = (df.agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(F.round(F.col("q") * 1000000).cast("long"))
                  .alias("__q_micro"))
           .withColumn("avg",
                       F.expr("(2 * __q_micro + n_docs) div (2 * n_docs)")
                       / F.lit(1000000.0))
           .collect()[0])
    assert got.avg == 0.000002          # half-up of the exact 1.5 micro
    import duckdb
    want = duckdb.sql(
        "SELECT CAST((2 * 3 + 2) // (2 * 2) AS DOUBLE) / 1000000"
    ).fetchone()[0]
    assert got.avg == want              # engine-identical integer path


def test_quality_gate_bounds_population_is_scorable_docs(spark, tmp_path):
    """r19 null sweep: quality_gate_approx_bounds counted ALL docs in n
    (and derived every rank index from it) while approx_percentile and
    collect_list silently drop null scores — a null-text doc shifted
    the bracket indices and flipped within_rank_bounds with no real
    sketch drift.  The population is now scorable docs only (the
    fail-closed rule the percentile/GK siblings adopted in r18)."""
    import os

    from ringo_spark.operators.text import quality_gate_approx_bounds_df

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    (docs.withColumn("text",
                     F.when(F.col("doc_id") % 7 == 0, F.lit(None))
                     .otherwise(F.col("text")))
     .write.parquet(f"{corpus}/documents.parquet"))

    out = quality_gate_approx_bounds_df(spark, corpus).collect()
    scorable = (spark.read.parquet(f"{corpus}/documents.parquet")
                .where(F.col("text").isNotNull())
                .groupBy("source").count())
    want_n = {r.source: r["count"] for r in scorable.collect()}
    assert {r.source: r.n for r in out} == want_n
    assert all(r.within_rank_bounds for r in out)


# --- r19 dedup.py full-module review: lifecycle/guard fixes ------------------


def _tmp_doc_corpus(spark, tmp_path, n_build=400):
    """tmp-dir documents corpus split for index lifecycle tests."""
    import os

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") < n_build).write.parquet(
        f"{corpus}/documents.parquet")
    return corpus, docs.where(F.col("doc_id") >= n_build)


def test_minhash_force_rebuild_crash_leaves_no_stale_marker(
        spark, tmp_path, monkeypatch):
    """r19 dedup review: build_minhash_index(force=True) left the old
    _INDEX_OK in place during the overwrite — a crash between the bands
    and shingles writes served the torn index as complete forever.  The
    marker is now unlinked before the rewrite (the r17 streaming
    chunk-index rule)."""
    import os

    import ringo_spark.operators.dedup as dd

    corpus, _batch = _tmp_doc_corpus(spark, tmp_path)
    p = dd.build_minhash_index(spark, corpus)
    assert os.path.exists(os.path.join(p, "_INDEX_OK"))

    def boom(*_a, **_k):
        raise RuntimeError("crash mid-rebuild")

    monkeypatch.setattr(dd, "_shingled", boom)
    with pytest.raises(RuntimeError, match="crash mid-rebuild"):
        dd.build_minhash_index(spark, corpus, force=True)
    # the torn rebuild must NOT look complete
    assert not os.path.exists(os.path.join(p, "_INDEX_OK"))
    monkeypatch.undo()
    assert dd.build_minhash_index(spark, corpus) == p   # rebuilds clean
    assert os.path.exists(os.path.join(p, "_INDEX_OK"))


def test_cluster_force_rebuild_crash_and_ledger_scope(
        spark, tmp_path, monkeypatch):
    """r19 dedup review, two findings: (a) build_cluster_table's force
    rebuild left _CLUSTERS_OK during the clusters overwrite — a crash
    served the stale pre-delete table as complete (the documented GDPR
    propagation path); (b) the force went through
    serve_cached(force=True), which archives the INDEX's batch-
    admission ledger even though bands/shingles are untouched."""
    import os

    import ringo_spark.index_lifecycle as ilc
    import ringo_spark.operators.dedup as dd

    corpus, _batch = _tmp_doc_corpus(spark, tmp_path)
    cpath = dd.build_cluster_table(spark, corpus)
    p = os.path.dirname(cpath)
    assert os.path.exists(os.path.join(p, "_CLUSTERS_OK"))

    # an admitted batch recorded against the INDEX must survive a
    # forced CLUSTER rebuild (the ledger describes bands/shingles)
    ilc.admit_intent(p, "cafebabe")
    ilc.admit_commit(p, "cafebabe")

    def boom(*_a, **_k):
        raise RuntimeError("crash mid-cluster-rebuild")

    monkeypatch.setattr(dd, "dedup_clusters_indexed_df", boom)
    with pytest.raises(RuntimeError, match="crash mid-cluster-rebuild"):
        dd.build_cluster_table(spark, corpus, force=True)
    assert not os.path.exists(os.path.join(p, "_CLUSTERS_OK"))
    monkeypatch.undo()
    assert dd.build_cluster_table(spark, corpus) == cpath
    assert os.path.exists(os.path.join(p, "_CLUSTERS_OK"))
    # (b): the admission ledger was NOT archived by the cluster force
    assert ilc.admit_state(p, "cafebabe") == "done"


def test_minhash_append_is_exactly_once(spark, tmp_path):
    """r19 dedup review: append_to_minhash_index was the one index
    append path without the kernel's admission ledger — a lost-ack
    retry of the same batch double-appended, and duplicate shingle rows
    made _verify_pairs emit duplicated pairs.  A retry is now a refused
    no-op and a torn retry lands only the missing rows."""
    import os

    import ringo_spark.index_lifecycle as ilc
    import ringo_spark.operators.dedup as dd

    corpus, batch = _tmp_doc_corpus(spark, tmp_path)
    p = dd.build_minhash_index(spark, corpus)
    nb = spark.read.parquet(os.path.join(p, "bands")).count()
    ns = spark.read.parquet(os.path.join(p, "shingles")).count()

    assert dd.append_to_minhash_index(spark, p, batch) is True
    nb2 = spark.read.parquet(os.path.join(p, "bands")).count()
    ns2 = spark.read.parquet(os.path.join(p, "shingles")).count()
    assert nb2 > nb and ns2 > ns

    # lost-ack retry: refused, nothing lands twice
    assert dd.append_to_minhash_index(spark, p, batch) is False
    assert spark.read.parquet(os.path.join(p, "bands")).count() == nb2
    assert spark.read.parquet(os.path.join(p, "shingles")).count() == ns2

    # torn retry (dangling intent, rows already landed): completes
    # without duplicating — anti-join per side finds nothing missing
    fp = ilc.batch_fingerprint(batch, ["doc_id", "text"])
    ilc.archive_admissions(p)
    ilc.admit_intent(p, fp)
    assert dd.append_to_minhash_index(spark, p, batch) is True
    assert spark.read.parquet(os.path.join(p, "bands")).count() == nb2
    assert spark.read.parquet(os.path.join(p, "shingles")).count() == ns2
    assert ilc.admit_state(p, fp) == "done"


def test_deleted_index_tag_carries_layout_version(spark, tmp_path):
    """r19 dedup review: the dedicated del-index tag omitted
    INDEX_LAYOUT_VERSION, so a stale-layout del index would serve
    forever while the default path rebuilt — the deleted-path bench
    would keep measuring the machine-weather file layout the r19
    deterministic-layout fix eliminated."""
    import ringo_spark.operators.dedup as dd

    corpus, _batch = _tmp_doc_corpus(spark, tmp_path)
    import os

    import ringo_spark.index_lifecycle as ilc

    out = dd.dedup_minhash_lsh_deleted_df(spark, corpus)
    assert out.count() >= 0   # builds + serves
    # the served del dir's tag must be the layout-versioned one
    fp = ilc.source_fingerprint(corpus, "documents.parquet")
    base = (f"{os.path.abspath(corpus)}|{dd.NUM_PERM}|{dd.BANDS}|"
            f"{dd.SHINGLE_N}|{fp}|del")
    versioned = ilc.index_tag(base + f"|{dd.INDEX_LAYOUT_VERSION}")
    assert os.path.isdir(os.path.join(dd.MINHASH_INDEX_ROOT,
                                      f"del-{versioned}"))
    # and it moves when the layout version does (stale layouts rebuild)
    assert versioned != ilc.index_tag(base + "|L1")


def test_assert_small_scale_self_union_is_not_footer_counted(
        spark, tmp_path):
    """r19 dedup review: Union was missing from the multiplying-node
    list while df.inputFiles() deduplicates paths — a self-union's
    footer sum under-counted the frame 2x and could admit an over-bound
    frame to a quadratic baseline.  The union now routes to the
    count() path, which rejects it."""
    import ringo_spark.operators.dedup as dd

    p = str(tmp_path / "wide.parquet")
    # 60k rows x ~300 B of text: footer sum 60k (under the 100k cap),
    # true union count 120k (over); wide rows keep the sizeInBytes
    # free pass (64 B/row floor) from short-circuiting the count
    (spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x" * 290), F.col("id").cast("string"))
        .alias("text"))
     .write.parquet(p))
    df = spark.read.parquet(p)
    dd._assert_small_scale(df, "t", "alt")            # single scan: fine
    u = df.union(df)                                   # 120k true rows
    with pytest.raises(ValueError, match="quadratic exact baseline"):
        dd._assert_small_scale(u, "t", "alt")


def test_cc_local_gate_path_invariance(spark):
    """r19 opt: the size-gated driver-local union-find in
    dedup_clusters_df returns EXACTLY the distributed pointer-jumping
    kernel's labels (min doc_id per component) — the gate changes the
    execution venue, never the result."""
    import ringo_spark.operators.dedup as dd

    SF = "/root/testdata/sf0.001"
    pairs = dd.dedup_minhash_lsh_df(spark, SF)
    local = {tuple(r) for r in
             dd.dedup_clusters_df(spark, SF, pairs_df=pairs).collect()}
    old = dd.CC_LOCAL_MAX_PAIRS
    dd.CC_LOCAL_MAX_PAIRS = 0          # force the distributed kernel
    try:
        dist = {tuple(r) for r in
                dd.dedup_clusters_df(spark, SF, pairs_df=pairs).collect()}
    finally:
        dd.CC_LOCAL_MAX_PAIRS = old
    assert local == dist and local
